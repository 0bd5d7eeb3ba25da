"""Skew diagnostics (operators/diagnostics.py): exact top-N hot keys,
deterministic ties, plan shape (TakeOrdered, no global sort shuffle)."""

import pytest
from pyspark.sql import functions as F

from arcane_stream_sqlserver_change_tracking_spark.operators.diagnostics import (
    skew_report,
)


def test_skew_report_exact_counts_and_ties(spark):
    # key 7 → 50 rows, key 3 → 30, keys 100..119 → 1 each (ties)
    rows = [(7,)] * 50 + [(3,)] * 30 + [(k,) for k in range(100, 120)]
    df = spark.createDataFrame(rows, "user_id long")
    out = skew_report(df, ["user_id"], top_n=5).collect()
    assert [(r["rank"], r["user_id"], r["cnt"]) for r in out] == [
        (1, 7, 50), (2, 3, 30), (3, 100, 1), (4, 101, 1), (5, 102, 1)]
    total = 100
    assert out[0]["share_ppm"] == 50 * 1_000_000 // total
    assert out[2]["share_ppm"] == 1_000_000 // total


def test_skew_report_plan_has_no_global_sort(spark):
    """orderBy().limit() must plan as TakeOrderedAndProject — a
    per-partition heap, not a full-corpus sort Exchange."""
    df = spark.range(10_000).select((F.col("id") % 97).alias("k"))
    plan = skew_report(df, ["k"], top_n=10)._jdf.queryExecution(
        ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_skew_report_validates_args(spark):
    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="non-empty"):
        skew_report(df, [])
    with pytest.raises(ValueError, match="top_n"):
        skew_report(df, ["k"], top_n=0)


def test_skew_report_multi_key(spark):
    rows = [("a", 1)] * 4 + [("a", 2)] * 2 + [("b", 1)]
    df = spark.createDataFrame(rows, "s string, k long")
    out = skew_report(df, ["s", "k"], top_n=10).collect()
    assert [(r["s"], r["k"], r["cnt"]) for r in out] == [
        ("a", 1, 4), ("a", 2, 2), ("b", 1, 1)]
