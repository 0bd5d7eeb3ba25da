from .changelog import synth_transcripts_changelog, events_as_changelog
from .incremental import version_chunks, incremental_read
from .mssql import MsSqlSource, to_changelog

__all__ = [
    "synth_transcripts_changelog",
    "events_as_changelog",
    "version_chunks",
    "incremental_read",
    "MsSqlSource",
    "to_changelog",
]
