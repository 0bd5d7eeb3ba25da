"""Deterministic corpus splitting for training pipelines.

A train/val/test split over 100 TB must be (a) reproducible across
runs and engines, (b) stable under re-partitioning and row order, and
(c) computable without a shuffle. ``rand()``-based sampling fails all
three; hashing the document id passes all three: the split is a pure
projection evaluated inside the scan stage, so it costs nothing and
pushes through to any downstream filter.

The bucket function is engine-portable on purpose — SHA-256 of the
id's decimal string, first 8 hex chars as an integer, mod ``buckets``
— so the exact same assignment is expressible in DuckDB/Trino for
cross-engine verification (see the driver oracle in entry_queries.py).
Cryptographic-hash uniformity keeps per-split sizes within sampling
noise of the requested fractions at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def split_bucket(id_col: Column, buckets: int = 10_000) -> Column:
    """Stable bucket in [0, buckets): int(sha256(str(id))[:8], 16) % buckets."""
    return (
        F.conv(F.substring(F.sha2(id_col.cast("string"), 256), 1, 8), 16, 10)
        .cast("bigint")
        % F.lit(buckets)
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    buckets: int = 10_000,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label.

    ``fractions`` maps label -> fraction (must sum to 1.0); boundaries
    are cumulative bucket thresholds, so a row's label never changes
    when other fractions are re-balanced downward/upward around it only
    insofar as its own bucket crosses a boundary. Adds ``out_col``.
    """
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    bucket = split_bucket(F.col(id_col), buckets)
    expr: Column | None = None
    cum = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        cum += frac
        bound = int(round(cum * buckets))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)
