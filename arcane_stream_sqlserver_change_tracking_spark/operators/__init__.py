from .dedup import latest_change_per_key
from .fields import FieldFilter

__all__ = ["latest_change_per_key", "FieldFilter"]
