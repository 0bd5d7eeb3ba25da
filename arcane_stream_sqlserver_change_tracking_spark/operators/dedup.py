"""W1 — net-change dedup: at most one change row per ``arcane_merge_key``
per applied batch, keeping the row with the highest ``sys_change_version``.

Reference semantics: SQL Server ``CHANGETABLE(CHANGES)`` returns net
change per key per poll, and the engine must preserve that across chunk
boundaries because the downstream (Trino) MERGE aborts on duplicate
source keys (SURVEY.md §2.3; behavior pinned by
src/test/scala/tests/integration/StreamRunner.scala:155-161,254-258).

Three strategies (all measured in BENCH.md on the same feeds):

* ``strategy="agg"`` (engine default) — ONE shuffle:
  ``groupBy(mk).agg(max_by(struct(all_cols), order))``. Skew-safe by
  construction: hash aggregation's map-side partial agg collapses a hot
  key to ≤1 row per map task *before* the shuffle, so the hot key's
  reducer receives ≤ num_map_tasks rows regardless of how many changes
  hit that key — the same bound salting buys, with one fewer shuffle.
  Measured: 1.2s vs 6.9s (salted) vs 1.8s (window) on a 200k-row
  unique-key feed; 0.5s vs 1.8s under extreme skew (local[32]).

* ``strategy="salted"`` — explicit two-phase salted mitigation (the
  BASELINE.json north_star technique, kept as an explicit operator and
  for feeds where map-side combine is defeated, e.g. agg spill to
  sort-based fallback with adversarial orderings):

  1. ``groupBy(mk, salt)`` with ``max_by`` — the salt splits a hot key
     over ``num_salts`` reducers;
  2. ``groupBy(mk)`` over the ≤ num_salts survivors per key.

* ``strategy="window"`` — the textbook
  ``row_number() OVER (PARTITION BY mk ORDER BY version DESC) = 1``.
  One shuffle on the merge key, but the window sort cannot map-side
  combine and a hot key lands entirely on one task.

Determinism under version ties: ordered by
``struct(sys_change_version, sys_change_operation, xxhash64(row))`` so
equal versions resolve identically everywhere (the generator contract
makes versions unique per key; this is belt-and-braces). The tiebreak is
a fixed-width hash, NOT the row struct itself — comparing long text
payloads in the aggregation buffer would dominate batch cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.keys import MERGE_KEY_COL, OPERATION_COL, VERSION_COL

_ROW = "__row"
_SALT = "__salt"
_ORD = "__ord"


def _order_struct(df: DataFrame):
    # total order: version, then operation, then a fixed-width row hash
    # for absolute determinism — comparisons are cheap (two longs + a
    # short string) and short-circuit on the version
    return F.struct(
        F.col(VERSION_COL),
        F.col(OPERATION_COL),
        F.xxhash64(*[F.col(c) for c in df.columns]),
    )


def latest_change_per_key(
    df: DataFrame,
    key_col: str = MERGE_KEY_COL,
    version_col: str = VERSION_COL,
    strategy: str = "agg",
    num_salts: int = 16,
) -> DataFrame:
    """Return one row per ``key_col`` — the one with max ``version_col``."""
    if strategy == "agg":
        cols = df.columns
        ordered = _order_struct(df)
        return (
            df.groupBy(key_col)
            .agg(F.max_by(F.struct(*cols), ordered).alias(_ROW))
            .select([F.col(f"{_ROW}.{c}").alias(c) for c in cols])
        )

    if strategy == "window":
        w = Window.partitionBy(key_col).orderBy(
            F.col(version_col).desc(), F.col(OPERATION_COL).desc()
        )
        return (
            df.withColumn(_ROW, F.row_number().over(w))
            .filter(F.col(_ROW) == 1)
            .drop(_ROW)
        )

    if strategy != "salted":
        raise ValueError(f"unknown dedup strategy: {strategy!r}")

    cols = df.columns
    ordered = _order_struct(df)
    # salt from the version: deterministic, spreads a hot key's rows
    # uniformly over num_salts reducers
    salted = df.withColumn(_SALT, F.pmod(F.xxhash64(F.col(version_col)), F.lit(num_salts)))
    phase1 = (
        salted.groupBy(key_col, _SALT)
        .agg(F.max_by(F.struct(*cols), ordered).alias(_ROW), F.max(ordered).alias(_ORD))
    )
    phase2 = (
        phase1.groupBy(key_col)
        .agg(F.max_by(F.col(_ROW), F.col(_ORD)).alias(_ROW))
        .select([F.col(f"{_ROW}.{c}").alias(c) for c in cols])
    )
    return phase2


def top_k_per_key(
    df: DataFrame,
    keys,
    order_by,
    k: int,
    *,
    descending: bool = True,
    tiebreak: str | None = None,
    rank_col: str | None = None,
) -> DataFrame:
    """Generic k>1 generalization of the top-1 family: the k best rows
    per key by ``order_by`` (first k per ordering). Top-N products per
    category, k freshest versions per entity, k best-scoring documents
    per cluster — the everyday group-limit query.

    Plan shape: row_number over (keys, ordering) then ``<= k`` — which
    Spark 4 rewrites with ``WindowGroupLimit``: each MAP task keeps
    only its local top-k per key BEFORE the Exchange, so a hot key
    ships ≤ k·num_map_tasks rows instead of its full history, and the
    reducer-side sort is over pre-pruned data. That optimizer rewrite
    (plan-pinned in tests) is why this beats collecting per-key arrays
    or a self-join at 100 TB.

    ``tiebreak`` (strongly recommended) makes the ordering total —
    equal ``order_by`` values otherwise rank arbitrarily per engine.
    ``rank_col`` optionally exposes the 1-based rank in the output.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if isinstance(keys, str):
        keys = [keys]
    from ._join_common import check_reserved_names

    # _ROW would silently overwrite a same-named input column, and a
    # rank_col colliding with an existing column would emit duplicates
    reserved = [_ROW] + ([rank_col] if rank_col is not None else [])
    check_reserved_names(reserved, ("input", df.columns))
    order = [F.col(order_by).desc() if descending
             else F.col(order_by).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(*order)
    out = (df.withColumn(_ROW, F.row_number().over(w))
           .filter(F.col(_ROW) <= k))
    if rank_col is not None:
        return out.withColumnRenamed(_ROW, rank_col)
    return out.drop(_ROW)
