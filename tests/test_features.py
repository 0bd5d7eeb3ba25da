"""Rolling window features: hand-computed values, tie determinism via
the tiebreak column, range-frame semantics, and the one-Exchange
shared-window plan shape."""

import datetime as dt

import pytest
from pyspark.sql import Row

from arcane_stream_sqlserver_change_tracking_spark.operators.features import (
    rolling_features,
)


def _t(sec):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def obs(spark):
    return spark.createDataFrame(
        [
            Row(eid=1, k="a", ts=_t(0), v=10.0),
            Row(eid=2, k="a", ts=_t(100), v=20.0),
            Row(eid=3, k="a", ts=_t(200), v=30.0),
            Row(eid=4, k="a", ts=_t(5000), v=40.0),  # outside 1h? no; outside 300s
            Row(eid=5, k="b", ts=_t(0), v=7.0),
        ]
    )


def test_hand_computed_values(obs):
    out = {
        r.eid: r
        for r in rolling_features(
            obs, ["k"], "ts", "v", tiebreak="eid",
            lags=(1,), row_windows=(2,), range_windows_seconds=(300,),
        ).collect()
    }
    assert out[1].lag_1 is None and out[2].lag_1 == 10.0
    assert out[3].lag_1 == 20.0 and out[5].lag_1 is None
    assert out[3].roll_sum_2 == 50.0 and out[3].roll_mean_2 == 25.0
    assert out[1].roll_mean_2 == 10.0  # head frame is just itself
    # range 300s: eid 3 sees 0,100,200 => 60; eid 4 sees only itself
    assert out[3].range_sum_300s == 60.0
    assert out[4].range_sum_300s == 40.0 and out[4].range_count_300s == 1
    assert [out[i].cum_count for i in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert out[5].cum_count == 1


def test_tiebreak_orders_equal_timestamps(spark):
    df = spark.createDataFrame(
        [Row(eid=2, k="a", ts=_t(0), v=200.0),
         Row(eid=1, k="a", ts=_t(0), v=100.0)])
    out = {r.eid: r for r in rolling_features(
        df, ["k"], "ts", "v", tiebreak="eid").collect()}
    # eid asc breaks the tie: 1 first (no lag), 2 second (lag=100)
    assert out[1].lag_1 is None and out[2].lag_1 == 100.0
    # cum_count uses a ROWS frame, so the tiebreak splits the tie:
    # counts 1 then 2 (a RANGE frame would give both rows 2)
    assert out[1].cum_count == 1 and out[2].cum_count == 2


def test_plan_one_exchange_shared_windows(obs):
    out = rolling_features(obs, ["k"], "ts", "v", tiebreak="eid",
                           lags=(1, 2), row_windows=(3, 5),
                           range_windows_seconds=(300,))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one hash Exchange on the key feeds every feature; extra frames
    # stack Window nodes, never extra shuffles
    assert plan.count("Exchange hashpartitioning") == 1


def test_needs_keys(obs):
    with pytest.raises(ValueError, match="at least one key"):
        rolling_features(obs, [], "ts", "v", tiebreak="eid")


def test_feature_name_collision_fails_fast(obs):
    with pytest.raises(ValueError, match="internal working names"):
        rolling_features(obs.withColumnRenamed("v", "cum_count"),
                         ["k"], "ts", "cum_count", tiebreak="eid")
