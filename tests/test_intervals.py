"""Interval (range-containment) join: bounds semantics, multi-bin
spans, overlap multiplicity, degenerate/null hygiene, numeric axes,
and the no-BNLJ plan pin."""

import datetime as dt

import pytest
from pyspark.sql import Row

from arcane_stream_sqlserver_change_tracking_spark.operators.intervals import (
    interval_join,
)


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


@pytest.fixture(scope="module")
def windows(spark):
    return spark.createDataFrame(
        [
            Row(wk="a", ws=_ts(1), we=_ts(3), wid=1),
            Row(wk="a", ws=_ts(2), we=_ts(10), wid=2),   # overlaps wid=1, spans many bins
            Row(wk="b", ws=_ts(1), we=_ts(2), wid=3),
            Row(wk="a", ws=_ts(9), we=_ts(5), wid=4),    # degenerate: dropped
            Row(wk=None, ws=_ts(1), we=_ts(9), wid=5),   # null key: dropped
        ]
    )


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(
        [
            Row(pid=1, k="a", ts=_ts(2, 12)),  # inside wid 1 and 2
            Row(pid=2, k="a", ts=_ts(3)),      # boundary: end of 1, inside 2
            Row(pid=3, k="a", ts=_ts(7)),      # middle bin of wid 2 only
            Row(pid=4, k="b", ts=_ts(5)),      # after b's window
            Row(pid=5, k=None, ts=_ts(2)),     # null key: no match
        ]
    )


def _wids(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.pid, set()).add(r.wid)
    return out


def test_half_open_bounds(pts, windows):
    out = interval_join(pts, windows, [("k", "wk")], "ts", "ws", "we",
                        bin_width_seconds=86400.0, payload=["wid"])
    assert _wids(out) == {1: {1, 2}, 2: {2}, 3: {2}}


def test_closed_bounds_include_end(pts, windows):
    out = interval_join(pts, windows, [("k", "wk")], "ts", "ws", "we",
                        bin_width_seconds=86400.0, bounds="[]",
                        payload=["wid"])
    assert _wids(out)[2] == {1, 2}  # end of wid 1 now included


def test_bin_width_invariance(pts, windows):
    for w in (3600.0, 6 * 3600.0, 7 * 86400.0):
        out = interval_join(pts, windows, [("k", "wk")], "ts", "ws", "we",
                            bin_width_seconds=w, payload=["wid"])
        assert _wids(out) == {1: {1, 2}, 2: {2}, 3: {2}}


def test_numeric_axis(spark):
    p = spark.createDataFrame([Row(pid=1, v=5.0), Row(pid=2, v=50.0)])
    iv = spark.createDataFrame([Row(lo=0.0, hi=10.0, band="low"),
                                Row(lo=10.0, hi=100.0, band="high")])
    out = interval_join(p, iv, [], "v", "lo", "hi",
                        bin_width_seconds=10.0, payload=["band"])
    assert {r.pid: r.band for r in out.collect()} == {1: "low", 2: "high"}


def test_payload_collision_and_bad_args(pts, windows):
    with pytest.raises(ValueError, match="collide"):
        interval_join(pts, windows.withColumnRenamed("wid", "ts"),
                      [("k", "wk")], "ts", "ws", "we",
                      bin_width_seconds=60.0, payload=["ts"])
    with pytest.raises(ValueError, match="bounds"):
        interval_join(pts, windows, [("k", "wk")], "ts", "ws", "we",
                      bin_width_seconds=60.0, bounds="()")
    with pytest.raises(ValueError, match="positive"):
        interval_join(pts, windows, [("k", "wk")], "ts", "ws", "we",
                      bin_width_seconds=0)


def test_plan_equi_join_never_bnlj(pts, windows):
    out = interval_join(pts, windows, [("k", "wk")], "ts", "ws", "we",
                        bin_width_seconds=86400.0, payload=["wid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "Cartesian" not in plan


def test_events_land_in_their_own_session(spark, sf_dir):
    from arcane_stream_sqlserver_change_tracking_spark.operators.sessions import (
        session_stats,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sess = session_stats(ev, gap_seconds=1800).withColumnRenamed(
        "user_id", "s_user")
    out = interval_join(ev, sess, [("user_id", "s_user")], "ts",
                        "session_start", "session_end",
                        bin_width_seconds=1800.0, bounds="[]",
                        payload=["session_idx"])
    # sessions partition a user's events: every event in exactly one
    assert out.count() == ev.count()
    assert out.select("event_id").distinct().count() == ev.count()


def test_reserved_internal_names_rejected(spark):
    pts = spark.createDataFrame([(1, 12.0)], ["k", "ts"])
    iv = spark.createDataFrame([(1, 10.0, 20.0, "w")], ["k", "s", "e", "nm"])
    # points column shadowing the internal bin column would be
    # silently overwritten — must fail fast instead
    bad_pts = pts.withColumnRenamed("ts", "__iv_bin")
    with pytest.raises(ValueError, match="internal working names"):
        interval_join(bad_pts, iv, ["k"], "__iv_bin", "s", "e",
                      bin_width_seconds=5.0)
    # payload shadowing the internal bound columns would make the
    # exact-bounds recheck ambiguous
    bad_iv = iv.withColumnRenamed("nm", "__iv_s")
    with pytest.raises(ValueError, match="internal working names"):
        interval_join(pts, bad_iv, ["k"], "ts", "s", "e",
                      bin_width_seconds=5.0, payload=["__iv_s"])


def test_special_character_column_names(spark):
    pts = spark.createDataFrame([(1, 12.0), (1, 99.0)], ["k`1", "t.s"])
    iv = spark.createDataFrame([(1, 10.0, 20.0, "w1")],
                               ["k", "s.s", "e`e", "na me"])
    out = interval_join(pts, iv, [("k`1", "k")], "t.s", "s.s", "e`e",
                        bin_width_seconds=5.0).collect()
    assert [(r["k`1"], r["na me"]) for r in out] == [(1, "w1")]


# ------------------------------------------------- broadcast variant

from arcane_stream_sqlserver_change_tracking_spark.operators.intervals import (  # noqa: E402
    interval_join_broadcast,
)


@pytest.mark.parametrize("seed", [3, 4])
@pytest.mark.parametrize("bounds", ["[)", "[]"])
def test_broadcast_variant_equals_binned_variant(spark, seed, bounds):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    pp = pd.DataFrame({"k": rng.integers(0, 3, 50),
                       "ts": rng.integers(0, 40, 50).astype("float64"),
                       "pid": np.arange(50)})
    s = rng.integers(0, 35, 20).astype("float64")
    ip = pd.DataFrame({"k": rng.integers(0, 3, 20), "s": s,
                       "e": s + rng.integers(0, 10, 20),
                       "w": np.arange(20)})
    P, I = spark.createDataFrame(pp), spark.createDataFrame(ip)
    a = interval_join(P, I, ["k"], "ts", "s", "e",
                      bin_width_seconds=7.0, bounds=bounds
                      ).toPandas().sort_values(["pid", "w"]).reset_index(
                          drop=True)
    b = interval_join_broadcast(P, I, ["k"], "ts", "s", "e",
                                bounds=bounds
                                ).toPandas().sort_values(
                                    ["pid", "w"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_broadcast_variant_plan_never_shuffles_the_point_side(spark,
                                                              sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    win = spark.createDataFrame(
        [(u, float(h * 3600), float(h * 3600 + 1800), h)
         for u in range(4) for h in range(3)],
        "w_user long, w_s double, w_e double, w_idx int")
    # point side keeps its TIMESTAMP_NTZ column — epoch conversion is
    # the operator's job (mixed ts/numeric axes supported)
    out = interval_join_broadcast(
        ev, win, [("user_id", "w_user")], "ts", "w_s", "w_e",
        payload=["w_idx"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
    # only the small side's pack aggregate shuffles
    assert plan.count("Exchange hashpartitioning") == 1


def test_broadcast_variant_reserved_names(spark):
    pts = spark.createDataFrame([(1, 5.0)], ["k", "__iv_arr"])
    iv = spark.createDataFrame([(1, 0.0, 9.0, "w")], ["k", "s", "e", "n"])
    with pytest.raises(ValueError, match="internal working names"):
        interval_join_broadcast(pts, iv, ["k"], "__iv_arr", "s", "e")


def test_broadcast_variant_reserves_bound_field_names(spark):
    pts = spark.createDataFrame([(1, 5.0)], ["k", "ts"])
    iv = spark.createDataFrame([(1, 0.0, 9.0, "w")],
                               ["k", "s", "e", "__iv_s"])
    with pytest.raises(ValueError, match="internal working names"):
        interval_join_broadcast(pts, iv, ["k"], "ts", "s", "e",
                                payload=["__iv_s"])
