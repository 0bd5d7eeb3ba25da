"""Data-distribution diagnostics for shuffle planning.

Every shuffle-keyed operator in this engine (W1 dedup's salted
strategy, the centroid-bucketed joins, the merge path) has a skew
mitigation whose USE is a judgment call — ``num_salts``, centroid
count, bucket layout. This module computes the evidence for that call:

* :func:`skew_report` — the top-N hottest keys with exact row counts
  and integer ppm shares, plus nothing else: ONE map-side-combined
  aggregate over the keys, then a ``TakeOrderedAndProject`` top-N (no
  global sort shuffle — Spark rewrites ``orderBy().limit()`` into a
  per-partition heap + driver merge). At 100 TB the aggregate output is
  bounded by key cardinality and the result by ``top_n``.

Workflow: run ``skew_report(df, ["user_id"])`` before keying a big
join on ``user_id``; a top key holding >1% of rows (share_ppm >
10_000) is the signal to salt or broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skew_report(df: DataFrame, key_cols: list[str], top_n: int = 20) -> DataFrame:
    """Top-``top_n`` hottest key values: (rank, keys..., cnt,
    share_ppm). ``share_ppm`` is exact integer parts-per-million
    (``cnt * 1_000_000 div total``) so the report is bit-identical
    across engines — no float in the output.

    Plan: one Exchange (map-side-combined count per key) →
    TakeOrderedAndProject (per-partition top-N heap, no global sort) →
    a window over ≤ top_n rows for the rank. Ties break on the key
    columns ascending, so the output is deterministic."""
    if not key_cols:
        raise ValueError("skew_report: key_cols must be non-empty")
    if top_n <= 0:
        raise ValueError(f"skew_report: top_n must be ≥1, got {top_n}")
    counts = df.groupBy(*key_cols).agg(F.count("*").cast("long").alias("cnt"))
    # total = plain row count over df (partial-agg, one 1-row Exchange) —
    # NOT counts.agg(sum), which would re-run the keyed aggregate subtree
    total = df.agg(F.count("*").cast("long").alias("total"))
    order = [F.desc("cnt")] + [F.asc(c) for c in key_cols]
    top = counts.orderBy(*order).limit(top_n)
    w = Window.orderBy(*order)  # ≤ top_n rows: single tiny partition is fine
    return (
        top.join(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank", *key_cols, "cnt",
            F.expr("cnt * 1000000L div total").cast("long").alias("share_ppm"),
        )
    )
