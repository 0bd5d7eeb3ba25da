"""S2/P3 — incremental read: version-range predicate + count-balanced
chunking into micro-batches.

Reference: each poll fetches changes with version > watermark (inherent
to ``CHANGETABLE(CHANGES t, @ver)``; resume contract pinned by
StreamRunner.scala:250-258) and chunks them into groups of
``rowsPerGroup`` rows before staging (docs/quickstart.md:65-66,
advisedChunkSize CRD:338-341).

Spark-first: the predicate is a plain ``filter`` so Catalyst pushes it
into the parquet scan (min/max row-group skipping); chunk boundaries are
computed with ONE pass of ``approx_percentile`` over the version column
— count-balanced batches without collecting data to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.keys import VERSION_COL


def incremental_read(changelog: DataFrame, watermark_version: int) -> DataFrame:
    """Changes strictly after the watermark (P3). Predicate is pushed to
    the scan by Catalyst (verify: PushedFilters in .explain)."""
    return changelog.filter(F.col(VERSION_COL) > F.lit(watermark_version))


def version_chunks(
    pending: DataFrame,
    max_events_per_batch: int,
    accuracy: int = 10_000,
) -> list[tuple[int, int]]:
    """Split the pending version range into half-open chunks
    ``(lo, hi]`` of ≈ ``max_events_per_batch`` rows each.

    ONE aggregation job: count + min + max + a fixed grid of interior
    quantiles of ``sys_change_version`` (the grid is sliced down to the
    k-1 boundaries actually needed, avoiding a second scan). Zero data
    collected beyond the boundary list.
    """
    grid = 64  # quantile grid resolution; supports up to 64 chunks/scan
    stats = pending.agg(
        F.count("*").alias("n"),
        F.min(VERSION_COL).alias("lo"),
        F.max(VERSION_COL).alias("hi"),
        F.percentile_approx(
            VERSION_COL, [i / grid for i in range(1, grid)], accuracy
        ).alias("q"),
    ).collect()[0]
    n = stats["n"]
    if n == 0:
        return []
    if n <= max_events_per_batch:
        return [(int(stats["lo"]) - 1, int(stats["hi"]))]
    k = int(-(-n // max_events_per_batch))  # ceil
    if k <= grid:
        # pick the grid quantiles closest to the k-1 ideal split points
        qs = [stats["q"][round(i * grid / k) - 1] for i in range(1, k)]
    else:  # >64 chunks: fall back to an exact-resolution second pass
        probs = [i / k for i in range(1, k)]
        qs = pending.agg(
            F.percentile_approx(VERSION_COL, probs, accuracy).alias("q")
        ).collect()[0]["q"]
    bounds = sorted(set(int(q) for q in qs))
    lo = int(stats["lo"]) - 1
    hi = int(stats["hi"])
    edges = [lo] + [b for b in bounds if lo < b < hi] + [hi]
    return [(edges[i], edges[i + 1]) for i in range(len(edges) - 1)]


def chunk_filter(pending: DataFrame, lo: int, hi: int) -> DataFrame:
    return pending.filter(
        (F.col(VERSION_COL) > F.lit(lo)) & (F.col(VERSION_COL) <= F.lit(hi))
    )
