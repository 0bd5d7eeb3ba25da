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

from pyspark.sql import Column, DataFrame, Window, functions as F


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


def _floor_bound(rate: float, buckets: int) -> int:
    """floor(rate × buckets) — floor (not round) on BOTH engines so the
    SQL oracle can recompute the bound from data with ``floor()``."""
    import math

    return min(buckets, int(math.floor(rate * buckets)))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff its
    sha256 id-bucket falls below floor(rate[stratum] × buckets).

    Same three scale properties as :func:`hash_split` — reproducible
    across runs/engines, order- and partitioning-stable, and evaluated
    as a pure filter inside the scan stage (zero shuffle; at 100 TB
    this is the only admissible sampling plan). Strata absent from
    ``rates`` get ``default_rate`` (0.0 = dropped).
    """
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {k!r} must be in [0,1], got {r}")
    bucket = split_bucket(F.col(id_col), buckets)
    bound: Column | None = None
    for k, r in rates.items():
        b = F.lit(_floor_bound(r, buckets))
        cond = F.col(strata_col) == F.lit(k)
        bound = F.when(cond, b) if bound is None else bound.when(cond, b)
    default = F.lit(_floor_bound(default_rate, buckets))
    bound = default if bound is None else bound.otherwise(default)
    return df.filter(bucket < bound)


def stratified_sample_exact(
    df: DataFrame,
    counts: dict[str, int],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_count: int = 0,
) -> DataFrame:
    """Exact-N per-stratum sample: keep the ``counts[stratum]`` rows
    whose sha256(id) ranks lowest within the stratum — exact sizes
    where :func:`stratified_sample` gives expected sizes (eval sets,
    fixed-size benchmarks, per-source quotas).

    Deterministic and engine-reproducible (the order key is the same
    sha256 hex both engines compute; ties impossible — ids are unique
    per stratum). Cost: ONE Exchange keyed by the stratum column for
    the per-stratum rank — unavoidable for exact counts, which need
    cross-partition coordination per stratum; at 100 TB prefer the
    rate-based scan-stage filter unless the count contract is hard.
    Strata absent from ``counts`` get ``default_count`` (0 = dropped)."""
    for k, n in counts.items():
        if n < 0:
            raise ValueError(f"count for stratum {k!r} must be ≥0, got {n}")
    order = F.sha2(F.concat_ws("|", F.col(id_col).cast("string")), 256)
    w = Window.partitionBy(strata_col).orderBy(order)
    quota: Column | None = None
    for k, n in counts.items():
        cond = F.col(strata_col) == F.lit(k)
        quota = F.when(cond, n) if quota is None else quota.when(cond, n)
    quota = F.lit(default_count) if quota is None else quota.otherwise(
        F.lit(default_count))
    # the FOLDABLE max-quota conjunct is the scale guard: Catalyst's
    # InferWindowGroupLimit only fires on a literal rank bound, and with
    # it each map task pre-prunes to max_quota rows per stratum BEFORE
    # the Exchange — without it, a stratum's entire 100 TB rowset lands
    # in one shuffle partition (plan-pinned in tests)
    max_quota = max(list(counts.values()) + [default_count])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") <= F.lit(max_quota))
                & (F.col("__rn") <= quota))
        .drop("__rn")
    )


def mix_corpus(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
) -> tuple[DataFrame, dict[str, float]]:
    """Token-budget data mixing: sample each source so the expected
    kept token mass is ≈ ``token_budget × weight[source]``.

    The mixing weights of a training run (e.g. 50% web, 30% code, 20%
    reference) rarely match the raw corpus proportions; this computes
    per-source keep rates ``min(1, budget·w / source_tokens)`` and
    applies :func:`stratified_sample`. The per-source token totals are
    ONE map-side-combined aggregate whose result is bounded by the
    number of sources (a driver-safe collect — same class as the
    engine's per-bucket stats); the sample itself stays a scan-stage
    filter. Sources without a weight are dropped (rate 0). A source
    whose raw tokens undershoot its target keeps everything (rate
    capped at 1) — upsampling/repetition is a training-loader concern,
    not a corpus operator.

    Returns (sampled DataFrame, the per-source rates actually applied).
    """
    from .analysis import ws_token_count

    totals = {
        row[0]: row[1]
        for row in df.groupBy(strata_col)
        .agg(F.sum(ws_token_count(F.col(text_col))).alias("toks"))
        .collect()
    }
    rates = {
        s: min(1.0, token_budget * w / totals[s]) for s, w in weights.items() if totals.get(s)
    }
    return stratified_sample(df, rates, strata_col, id_col, buckets), rates


def pack_sequences(
    df: DataFrame,
    seq_tokens: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> DataFrame:
    """Deterministic document→training-sequence packing plan.

    Training loaders concatenate documents and cut fixed
    ``seq_tokens``-token sequences; this computes, ahead of time and
    reproducibly, WHICH sequence each document starts in: documents are
    streamed in ``id_col`` order within their sha256 bucket, and a
    document belongs to pack ``floor(preceding_token_sum / seq_tokens)``
    — i.e. the sequence its first token lands in under pure
    concatenation. Returns (id, n_tokens, pack_bucket, pack_idx).

    100 TB shape: the running sum is a window WITHIN each hash bucket
    (one Exchange on the bucket; parallelism = ``buckets``), never a
    global single-partition ordering. Assignment is a pure function of
    (id, token count), so it is stable across runs, partitionings, and
    engines — the DuckDB oracle reproduces it bit-for-bit.
    """
    from pyspark.sql.window import Window
    from .analysis import ws_token_count

    if seq_tokens < 1:
        raise ValueError(f"seq_tokens must be >= 1, got {seq_tokens}")
    d = df.select(
        F.col(id_col),
        ws_token_count(F.col(text_col)).alias("n_tokens"),
        split_bucket(F.col(id_col), buckets).alias("pack_bucket"),
    )
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return d.withColumn(
        "pack_idx",
        F.floor(prev / F.lit(seq_tokens)).cast("long"),
    )
