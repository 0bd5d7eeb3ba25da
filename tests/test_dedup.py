"""W1 — net-change dedup: window vs salted two-phase, including hot-key
skew and intra-batch multi-change keys (reference contract: MERGE source
must have at most one row per key, SURVEY.md §2.3)."""

import pytest
from pyspark.sql import functions as F

from arcane_stream_sqlserver_change_tracking_spark.functions.keys import (
    MERGE_KEY_COL,
    OPERATION_COL,
    VERSION_COL,
)
from arcane_stream_sqlserver_change_tracking_spark.operators.dedup import latest_change_per_key


def _changelog(spark, rows):
    return spark.createDataFrame(
        rows, f"{MERGE_KEY_COL} string, {VERSION_COL} long, {OPERATION_COL} string, payload string"
    )


ROWS = [
    ("k1", 1, "I", "a"),
    ("k1", 5, "U", "b"),
    ("k1", 3, "U", "c"),
    ("k2", 2, "I", "d"),
    ("k3", 4, "I", "e"),
    ("k3", 6, "D", None),
]


@pytest.mark.parametrize("strategy", ["agg", "window", "salted"])
def test_latest_per_key(spark, strategy):
    df = _changelog(spark, ROWS)
    got = {
        r[MERGE_KEY_COL]: (r[VERSION_COL], r[OPERATION_COL], r["payload"])
        for r in latest_change_per_key(df, strategy=strategy).collect()
    }
    assert got == {"k1": (5, "U", "b"), "k2": (2, "I", "d"), "k3": (6, "D", None)}


@pytest.mark.parametrize("strategy", ["agg", "window", "salted"])
def test_hot_key_skew(spark, strategy):
    # one key holds 90% of a 50k-row batch — the salted path splits it
    n = 50_000
    df = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
                F.concat(F.lit("k"), (F.col("id") % 1000).cast("string"))
            ).alias(MERGE_KEY_COL),
            (F.col("id") + 1).alias(VERSION_COL),
            F.lit("U").alias(OPERATION_COL),
            F.col("id").cast("string").alias("payload"),
        )
    )
    out = latest_change_per_key(df, strategy=strategy)
    rows = {r[MERGE_KEY_COL]: r[VERSION_COL] for r in out.collect()}
    # max hot id is 49998 (49999 % 10 == 9 is non-hot) -> version 49999
    assert rows["hot"] == n - 1
    # exactly one row per key
    assert out.groupBy(MERGE_KEY_COL).count().filter("count > 1").count() == 0


def test_strategies_agree(spark):
    df = _changelog(spark, ROWS)
    a = sorted(map(tuple, latest_change_per_key(df, strategy="window").collect()))
    b = sorted(map(tuple, latest_change_per_key(df, strategy="salted").collect()))
    c = sorted(map(tuple, latest_change_per_key(df, strategy="agg").collect()))
    assert a == b == c


def test_unknown_strategy(spark):
    with pytest.raises(ValueError):
        latest_change_per_key(_changelog(spark, ROWS), strategy="nope")
