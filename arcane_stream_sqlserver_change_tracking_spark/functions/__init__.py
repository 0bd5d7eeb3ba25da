from .keys import merge_key_expr, bucket_expr, normalize_column_name, normalize_column_names
from .text import normalize_text

__all__ = [
    "merge_key_expr",
    "bucket_expr",
    "normalize_column_name",
    "normalize_column_names",
    "normalize_text",
]
