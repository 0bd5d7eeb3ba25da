"""Shared type-aware epoch-seconds conversion for temporal operators.

Spark 4 refuses ``CAST(timestamp AS double)`` for TIMESTAMP_NTZ (the
type parquet timestamps load as), so temporal comparisons go through
``unix_micros`` after an NTZ→LTZ relabel (the session timezone is UTC
— see operators/sessions.py, same rationale). Plain numerics cast
straight to double, so version-valued "timestamps" work unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T

_TS_TYPES = (T.TimestampType, T.TimestampNTZType, T.DateType)


def epoch_seconds(col: Column, dtype: T.DataType) -> Column:
    """``col`` as fractional epoch seconds (µs precision preserved)."""
    if isinstance(dtype, _TS_TYPES):
        return F.unix_micros(col.cast("timestamp")) / F.lit(1_000_000.0)
    return col.cast("double")
