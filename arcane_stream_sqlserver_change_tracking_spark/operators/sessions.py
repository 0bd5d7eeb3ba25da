"""Sessionization + windowed aggregation — the streaming-analytics
operators a transcript/event pipeline needs beyond the reference's
flat replication (reference is flat-relational, SURVEY.md §1.2; this is
part of the training-data-pipeline extension surface).

Three forms, one semantics:

* :func:`sessionize` — batch: gap-based session assignment as pure
  window functions (lag → gap flag → running sum). One shuffle on the
  user key; oracle-able (classic SQL sessionization).
* :func:`session_stats` — per-session rollup on top of it.
* :func:`sessionize_stream` — streaming: the same gap semantics as a
  custom stateful operator over ``applyInPandasWithState`` (Arrow
  batches + explicit GroupState), the Spark-native form of "operator
  the engine lacks": state = the open session per key, carried across
  micro-batches; closed sessions emit as soon as a later event proves
  the gap, and — with ``watermark_delay`` set — when the event-time
  watermark passes the gap window (``EventTimeTimeout``), so state for
  quiet keys is reclaimed instead of growing with the key space.

* :func:`windowed_event_counts` — tumbling event-time windows
  (``F.window``) with per-window aggregates; in streaming mode pair
  with ``withWatermark`` for bounded state + late-data drop
  (tests/test_sessions.py exercises the watermark behavior).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign a per-user session index: a new session starts when the
    gap since the user's previous event exceeds ``gap_seconds``.

    Plan shape: ONE Exchange on the user key; both window functions
    (lag + running count) share it. Ties on ``ts`` break by
    ``order_tiebreak`` for full determinism."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # exact microsecond arithmetic (the source timestamps carry µs;
    # truncating to seconds would flip gap decisions at the boundary
    # and diverge from the DuckDB oracle's epoch_us)
    # cast covers TIMESTAMP_NTZ parquet columns (session tz is UTC, so
    # NTZ→LTZ is a relabel, not a shift)
    as_ltz = F.col(ts_col).cast("timestamp")
    gap_us = F.unix_micros(as_ltz) - F.unix_micros(F.lag(as_ltz).over(w))
    new_session = F.when(
        prev_ts.isNull() | (gap_us > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_idx",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Per-session rollup: (user, session_idx, start, end, n_events).
    The groupBy re-uses the sessionize shuffle partitioning (same key
    prefix), so Catalyst plans no second Exchange."""
    s = sessionize(events, gap_seconds, user_col, ts_col, order_tiebreak)
    return s.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time windows × group: (window_start, group, n,
    sum_value). Works identically on a batch DataFrame and a streaming
    one (add ``withWatermark(ts_col, ...)`` upstream in streaming mode
    for late-data bounds)."""
    return (
        events.groupBy(F.window(F.col(ts_col), window_duration), F.col(group_col))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            group_col,
            "n",
            "sum_value",
        )
    )


#: output of sessionize_stream: closed sessions only
SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

#: GroupState layout: open session of the key (timestamps in µs)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _closed_sessions_frame(closed: list[tuple[int, int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": pd.Series([c[0] for c in closed], dtype="int64"),
            "session_start": pd.to_datetime([c[1] for c in closed], unit="us"),
            "session_end": pd.to_datetime([c[2] for c in closed], unit="us"),
            "n_events": pd.Series([c[3] for c in closed], dtype="int64"),
        }
    )


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark_delay: str | None = None,
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization with
    ``applyInPandasWithState``. State (one open session per key: start,
    last-seen, count) survives across micro-batches; a batch's events
    are processed in event-time order, closing and emitting a session
    whenever the next event is more than ``gap_seconds`` later.

    **State lifecycle**: pass ``watermark_delay`` (e.g. ``"10 minutes"``)
    in production — the operator then applies ``withWatermark`` on
    ``ts_col`` and runs with ``EventTimeTimeout``: a key whose open
    session the watermark has passed by more than the gap is *timed
    out* — the session is closed, emitted, and its state removed, so
    quiet keys on an unbounded key space do not accumulate state
    forever. ``watermark_delay=None`` keeps ``NoTimeout`` (open sessions
    held indefinitely) for bounded-key / test scenarios where the caller
    manages the stream's lifetime.

    Late-but-in-watermark events (cross-batch out-of-order) are merged
    with the open session by interval union: an event within
    ``gap_seconds`` of the open session's span joins it (extending
    either end), while an event more than a gap EARLIER than the open
    session's start is emitted as its own separate earlier session —
    exactly what the batch :func:`sessionize` twin's global sort
    produces. The twins can still diverge in one scoped case: a late
    event belonging to a session this operator already emitted in a
    PRIOR micro-batch starts a new session here (the emitted interval
    is gone from state), whereas the batch twin would have folded it
    in. Within a watermark chosen ≥ the true out-of-orderness, the
    outputs are identical.

    This is the (c)-tier custom-operator pattern: Arrow-batched per-key
    state transition, no per-row Python beyond the per-event fold the
    semantics require, and the only shuffle is the groupBy on the key."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    evict = watermark_delay is not None

    def _fold(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if evict and state.hasTimedOut:
            # quiet key: the watermark passed last_event + gap with no
            # new events, so the open session can never grow — close,
            # emit, and reclaim its state
            start_us, last_us, n = state.get
            state.remove()
            yield _closed_sessions_frame([(uid, start_us, last_us, n)])
            return
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        gap_us = gap_seconds * 1_000_000
        closed: list[tuple[int, int, int, int]] = []
        # the group's micro-batch rows arrive as MULTIPLE Arrow chunks
        # in shuffle order — gather them all, sort ONCE in event time,
        # then fold (sorting per chunk would fold across chunk
        # boundaries out of order and corrupt sessions for any key with
        # more rows than arrow.maxRecordsPerBatch)
        chunks = [
            pd.to_datetime(pdf[ts_col]).astype("int64") // 1_000 for pdf in pdfs
        ]
        ts_us = (
            pd.concat(chunks).sort_values() if chunks else pd.Series([], dtype="int64")
        )
        # interval union of (open session ∪ batch events), replaying the
        # batch twin's sorted fold: adjacent intervals closer than the
        # gap merge; everything but the LAST interval is definitively
        # closed (the next interval sits > gap away). An event that
        # lands inside or within a gap of the open span extends it; one
        # more than a gap EARLIER becomes its own earlier session, as
        # the batch twin's global sort would emit it.
        items: list[list[int]] = [[int(t), int(t), 1] for t in ts_us]
        if last_us is not None:
            items.append([start_us, last_us, n])
        items.sort(key=lambda iv: (iv[0], iv[1]))
        intervals: list[list[int]] = []  # [start_us, last_us, n]
        for iv in items:
            if intervals and iv[0] - intervals[-1][1] <= gap_us:
                intervals[-1][1] = max(intervals[-1][1], iv[1])
                intervals[-1][2] += iv[2]
            else:
                intervals.append(iv)
        if intervals:
            closed.extend(
                (uid, s, e, c) for s, e, c in intervals[:-1]
            )
            start_us, last_us, n = intervals[-1]
        if last_us is None:
            # a group can be invoked with zero rows (empty Arrow chunk)
            # before any state exists; storing (None, None, 0) would
            # poison the timeout arithmetic below
            if closed:
                yield _closed_sessions_frame(closed)
            return
        state.update((start_us, last_us, n))
        if evict:
            # close the session when the watermark passes its gap window;
            # Spark requires the timeout to sit above the current watermark
            timeout_ms = last_us // 1_000 + gap_seconds * 1_000
            state.setTimeoutTimestamp(
                max(timeout_ms, state.getCurrentWatermarkMs() + 1)
            )
        if closed:
            yield _closed_sessions_frame(closed)

    if evict:
        # watermarks need TIMESTAMP (ltz); parquet sources land NTZ — a
        # relabel under the UTC session tz
        events = events.withColumn(
            ts_col, F.col(ts_col).cast("timestamp")
        ).withWatermark(ts_col, watermark_delay)
    return events.groupBy(user_col).applyInPandasWithState(
        _fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if evict
            else GroupStateTimeout.NoTimeout
        ),
    )
