"""W1 — net-change dedup: at most one change row per ``arcane_merge_key``
per applied batch, keeping the row with the highest ``sys_change_version``.

Reference semantics: SQL Server ``CHANGETABLE(CHANGES)`` returns net
change per key per poll, and the engine must preserve that across chunk
boundaries because the downstream (Trino) MERGE aborts on duplicate
source keys (SURVEY.md §2.3; behavior pinned by
src/test/scala/tests/integration/StreamRunner.scala:155-161,254-258).

Two strategies:

* ``strategy="window"`` — the textbook
  ``row_number() OVER (PARTITION BY mk ORDER BY version DESC) = 1``.
  One shuffle on the merge key; a single hot key lands on one task.

* ``strategy="salted"`` (default) — explicit skew mitigation required by
  BASELINE.json ``north_rule``: two-phase top-1 as *aggregations* so the
  map side combines before any shuffle:

  1. ``groupBy(mk, salt)`` with ``max_by(struct(all_cols), order)`` —
     partial aggregation collapses duplicates per task *before* the
     shuffle, and the salt splits a hot key over ``num_salts`` reducers;
  2. ``groupBy(mk)`` over the ≤ num_salts survivors per key — trivially
     small.

  Hash aggregation beats the window approach even without skew because
  the window operator must sort and cannot map-side combine.

Determinism under version ties: ordered by
``struct(sys_change_version, sys_change_operation, __all_cols_struct)``
so equal versions resolve identically everywhere (the generator contract
makes versions unique per key; this is belt-and-braces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.keys import MERGE_KEY_COL, OPERATION_COL, VERSION_COL

_ROW = "__row"
_SALT = "__salt"
_ORD = "__ord"


def _order_struct(df: DataFrame):
    # total order: version, then operation, then full row for absolute determinism
    return F.struct(
        F.col(VERSION_COL),
        F.col(OPERATION_COL),
        *[F.col(c) for c in df.columns if c not in (VERSION_COL, OPERATION_COL)],
    )


def latest_change_per_key(
    df: DataFrame,
    key_col: str = MERGE_KEY_COL,
    version_col: str = VERSION_COL,
    strategy: str = "salted",
    num_salts: int = 16,
) -> DataFrame:
    """Return one row per ``key_col`` — the one with max ``version_col``."""
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
