"""Per-key rolling window features for training-data pipelines: lags,
row-frame rolling aggregates, and time-range aggregates in one pass.

The feature-backfill counterpart of the as-of join (operators/asof.py):
where as-of ENRICHES a row with another table's latest state, this
derives features from the row's OWN key history — previous value,
rolling mean over the last N observations, activity volume in the last
S seconds. The standard input to gradient-boosted / sequence models
trained off an event lake.

Plan shape (the part that matters at 100 TB): every feature is an
expression over the SAME (partitionBy keys, orderBy ts) window
ordering, so Catalyst plans ONE hash Exchange on the keys and ONE sort
per partition; features sharing a frame collapse into a single Window
operator, and additional frames (rows vs range) stack extra Window
nodes WITHOUT re-shuffling or re-sorting. Never one shuffle per
feature — the naive per-feature self-join approach is O(features)
shuffles and row blowup.

Determinism: ties in the order column make frame contents ambiguous
(both engines pick arbitrarily), so a ``tiebreak`` column is part of
the ordering contract — pass the event id. Range frames order by epoch
seconds (a numeric), which both Spark and the SQL oracle can state
identically.

Exactly SQL-expressible (ANSI window functions), so every feature
oracles directly against DuckDB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from ._join_common import check_reserved_names, qcol
from ._time import epoch_seconds


def rolling_features(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    *,
    tiebreak: str,
    lags: Sequence[int] = (1,),
    row_windows: Sequence[int] = (3,),
    range_windows_seconds: Sequence[int] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """``df`` plus, per key ordered by (ts, tiebreak):

    * ``lag_{n}`` — the value n observations back (null at the head);
    * ``roll_sum_{n}`` / ``roll_mean_{n}`` — sum/mean over the last n
      observations including the current row;
    * ``range_sum_{s}s`` / ``range_count_{s}s`` — sum/count of
      observations in the last s seconds including the current row
      (event-time volume features);
    * ``cum_count`` — how many observations this key has produced so
      far (1-based).

    ``round_to`` rounds the floating aggregates (mean, range sums) for
    cross-engine comparability; pass None to keep full precision.
    """
    if not keys:
        raise ValueError("rolling_features needs at least one key column")
    feature_names = (
        [f"lag_{n}" for n in lags]
        + [f"roll_{agg}_{n}" for n in row_windows for agg in ("sum", "mean")]
        + [f"range_{agg}_{s}s" for s in range_windows_seconds
           for agg in ("sum", "count")]
        + ["cum_count"])
    # silent duplicate output columns otherwise — fail fast like the
    # temporal joins do
    check_reserved_names(feature_names, ("input", df.columns))
    ts = epoch_seconds(qcol(ts_col), df.schema[ts_col].dataType)
    order = [ts.asc(), qcol(tiebreak).asc()]
    base = Window.partitionBy(*[qcol(k) for k in keys]).orderBy(*order)
    val = qcol(value_col)

    def _rounded(c: Column) -> Column:
        return F.round(c, round_to) if round_to is not None else c

    feats: list[Column] = []
    for n in lags:
        feats.append(F.lag(val, n).over(base).alias(f"lag_{n}"))
    for n in row_windows:
        fr = base.rowsBetween(-(n - 1), Window.currentRow)
        feats.append(_rounded(F.sum(val).over(fr)).alias(f"roll_sum_{n}"))
        feats.append(_rounded(F.avg(val).over(fr)).alias(f"roll_mean_{n}"))
    for s in range_windows_seconds:
        # range frame over the NUMERIC epoch ordering (ties share a
        # frame, so the tiebreak is irrelevant here — both engines
        # agree by construction)
        rw = (Window.partitionBy(*[qcol(k) for k in keys])
              .orderBy(ts.asc()).rangeBetween(-s, 0))
        feats.append(_rounded(F.sum(val).over(rw)).alias(f"range_sum_{s}s"))
        feats.append(F.count(F.lit(1)).over(rw).alias(f"range_count_{s}s"))
    feats.append(
        F.count(F.lit(1)).over(
            base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum_count"))

    return df.select(*[qcol(c).alias(c) for c in df.columns], *feats)
