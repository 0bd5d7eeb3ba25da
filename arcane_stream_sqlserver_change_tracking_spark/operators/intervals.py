"""Distributed interval (range-containment) join via time binning.

Complement of the as-of join (operators/asof.py): instead of "the one
nearest right row", answer "which interval contains this point" —
events into sessions, changes into maintenance windows, facts into
SCD2-style validity ranges keyed by time rather than version.

Why not the naive spelling: ``p JOIN i ON p.k = i.k AND i.s <= p.ts
AND p.ts < i.e`` gives Catalyst no equi-condition on the range, so the
range predicate runs as a post-filter over every same-key pair —
O(|points|·|intervals|) per key, a skewed key becomes a cartesian
bomb. The bucketed rewrite (same idea as Databricks' range-join
optimization and the banded LSH join in operators/corpus.py) restores
an equi-join:

* pick a bin width ``w`` (seconds); a point belongs to exactly ONE bin
  ``floor(ts/w)``; an interval is exploded map-side to the bins it
  covers — ``sequence(floor(s/w), floor(e/w))``, an expansion factor
  of ~``len/w + 1`` that the CALLER controls by choosing ``w`` near
  the typical interval length;
* equi-join on (key…, bin) — a plain shuffled (or AQE-broadcast) hash
  join, never BroadcastNestedLoop — then re-check the exact bounds.

Each (point, interval) pair can meet in at most one bin (the point's),
so the join produces no duplicates and needs no post-dedup. Degenerate
intervals (end < start) and null key/bound rows are dropped map-side.

Exactly SQL-expressible (the small-scale oracle is the naive
inequality join), so the operator oracles directly against DuckDB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ._join_common import (
    all_not_null,
    qcol,
    quote_name,
    check_payload_collisions,
    check_reserved_names,
    default_payload,
    normalize_keys,
)
from ._time import epoch_seconds

_BIN = "__iv_bin"
_IV_S = "__iv_s"
_IV_E = "__iv_e"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str | tuple[str, str]],
    point_ts: str,
    start_col: str,
    end_col: str,
    *,
    bin_width_seconds: float,
    bounds: str = "[)",
    payload: Sequence[str] | None = None,
) -> DataFrame:
    """Inner join of each ``points`` row to every ``intervals`` row
    (same key) whose [start, end) — or [start, end] with
    ``bounds="[]"`` — contains the point's timestamp.

    ``on`` lists equi-key columns (string when shared, ``(point_name,
    interval_name)`` pair otherwise); it may be empty, in which case
    the bin itself is the only equi-key (fine when the interval side is
    broadcast-small). ``payload`` selects interval columns to carry
    (default: everything except the interval's keys and bounds); names
    must not collide with point columns. Timestamps or plain numerics
    both work — bounds are compared in epoch seconds.
    """
    if bounds not in ("[)", "[]"):
        raise ValueError(f"bounds must be '[)' or '[]', got {bounds!r}")
    if bin_width_seconds <= 0:
        raise ValueError("bin_width_seconds must be positive")
    keys = normalize_keys(on)
    ikey_names = [ik for _, ik in keys]
    if payload is None:
        payload = default_payload(intervals.columns,
                                  [*ikey_names, start_col, end_col])
    payload = list(payload)
    check_payload_collisions(payload, points.columns, "point")
    # The bin/bound working names must not shadow user columns: a
    # points column named __iv_bin would be silently overwritten by
    # withColumn below; a payload named __iv_s/__iv_e would make the
    # exact-bounds recheck ambiguous.
    reserved = [_BIN, _IV_S, _IV_E,
                *[f"__iv_k{i}" for i in range(len(keys))]]
    check_reserved_names(reserved, ("points", points.columns),
                         ("payload", payload))

    w = float(bin_width_seconds)
    s = epoch_seconds(qcol(start_col), intervals.schema[start_col].dataType)
    e = epoch_seconds(qcol(end_col), intervals.schema[end_col].dataType)
    right = (
        intervals
        .where(s.isNotNull() & e.isNotNull() & (s <= e)
               & all_not_null(ikey_names))
        .select(
            *[qcol(ik).alias(f"__iv_k{i}")
              for i, (_, ik) in enumerate(keys)],
            F.explode(F.sequence(F.floor(s / w), F.floor(e / w)))
            .alias(_BIN),
            s.alias(_IV_S),
            e.alias(_IV_E),
            *[qcol(c).alias(c) for c in payload],
        )
    )
    pt_dtype = points.schema[point_ts].dataType
    left = points.withColumn(
        _BIN, F.floor(epoch_seconds(qcol(point_ts), pt_dtype) / w))

    join_cond = (left[_BIN] == right[_BIN])
    for i, (pk, _) in enumerate(keys):
        join_cond = join_cond & (left[quote_name(pk)] == right[f"__iv_k{i}"])

    pts = epoch_seconds(left[quote_name(point_ts)], pt_dtype)
    lo_ok = F.col(_IV_S) <= pts
    hi_ok = (pts < F.col(_IV_E) if bounds == "[)"
             else pts <= F.col(_IV_E))
    return (
        left.join(right, join_cond, "inner")
        .where(lo_ok & hi_ok)
        .select(*[left[quote_name(c)] for c in points.columns],
                *[qcol(c).alias(c) for c in payload])
    )


def interval_join_broadcast(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str | tuple[str, str]],
    point_ts: str,
    start_col: str,
    end_col: str,
    *,
    bounds: str = "[)",
    payload: Sequence[str] | None = None,
) -> DataFrame:
    """``interval_join`` for a SMALL interval side — identical output
    contract, different physical plan (the companion of
    asof.py ``asof_join_broadcast``).

    The binned rewrite shuffles the point side on (key, bin); when the
    points are the 100 TB fact table and the intervals are a bounded
    window table (maintenance windows, per-entity validity ranges),
    that Exchange is the whole cost. Here the intervals pack into ONE
    array row per key and broadcast; each point filters the array for
    its containing intervals and explodes the hits — BroadcastHashJoin
    plus an in-row probe, the fact side never shuffled, row
    multiplication exactly the match count (``explode`` of the hit
    array preserves the inner-join contract: zero hits → row dropped).
    No bin width to tune, either — exact bounds are checked directly.

    Bounds: the packed interval side must fit in a broadcast and a
    single key's intervals in one row.
    """
    if bounds not in ("[)", "[]"):
        raise ValueError(f"bounds must be '[)' or '[]', got {bounds!r}")
    keys = normalize_keys(on)
    ikey_names = [ik for _, ik in keys]
    if payload is None:
        payload = default_payload(intervals.columns,
                                  [*ikey_names, start_col, end_col])
    payload = list(payload)
    check_payload_collisions(payload, points.columns, "point")
    key_aliases = [f"__iv_k{i}" for i in range(len(keys))]
    arr, hit = "__iv_arr", "__iv_hit"
    # _IV_S/_IV_E become FIELD names inside the packed struct, so a
    # payload (or points) column with those names makes the contains
    # lambda's field access ambiguous — same reservation as the binned
    # variant
    check_reserved_names([arr, hit, _IV_S, _IV_E, *key_aliases],
                         ("points", points.columns), ("payload", payload))

    s = epoch_seconds(qcol(start_col), intervals.schema[start_col].dataType)
    e = epoch_seconds(qcol(end_col), intervals.schema[end_col].dataType)
    packed = (
        intervals
        .where(s.isNotNull() & e.isNotNull() & (s <= e)
               & all_not_null(ikey_names))
        .groupBy(*[qcol(ik).alias(a)
                   for (_, ik), a in zip(keys, key_aliases)])
        .agg(F.collect_list(F.struct(
            s.alias(_IV_S), e.alias(_IV_E),
            *[qcol(c).alias(c) for c in payload])).alias(arr))
    )

    join_cond = None
    for (pk, _), a in zip(keys, key_aliases):
        c = points[quote_name(pk)] == packed[a]
        join_cond = c if join_cond is None else (join_cond & c)
    joined = (points.join(F.broadcast(packed), join_cond, "inner")
              if join_cond is not None
              else points.crossJoin(F.broadcast(packed)))

    pts = epoch_seconds(points[quote_name(point_ts)],
                        points.schema[point_ts].dataType)
    if bounds == "[)":
        contains = lambda x: (x[_IV_S] <= pts) & (pts < x[_IV_E])  # noqa: E731
    else:
        contains = lambda x: (x[_IV_S] <= pts) & (pts <= x[_IV_E])  # noqa: E731
    return (
        joined
        .withColumn(hit, F.explode(F.filter(F.col(arr), contains)))
        .select(*[points[quote_name(c)].alias(c) for c in points.columns],
                *[F.col(hit).getField(c).alias(c) for c in payload])
    )
