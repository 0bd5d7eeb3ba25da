from .lake import LakeTable, Snapshot

__all__ = ["LakeTable", "Snapshot"]
