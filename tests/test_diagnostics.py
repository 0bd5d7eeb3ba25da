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


# ------------------------------------------------- column profile (r5)

def test_column_profile_values(spark):
    from arcane_stream_sqlserver_change_tracking_spark.operators.diagnostics import (
        column_profile,
    )

    df = spark.createDataFrame(
        [(1.0, 10), (2.0, None), (3.0, 30), (4.0, 40)],
        "a double, b int")
    got = {r.column: r for r in column_profile(df).collect()}
    a = got["a"]
    assert (a.n, a.n_null, a.min_v, a.max_v, a.mean_v) == (4, 0, 1.0, 4.0, 2.5)
    assert (a.p25, a.p50, a.p75) == (1.75, 2.5, 3.25)  # linear interp
    b = got["b"]
    assert (b.n, b.n_null, b.min_v, b.max_v) == (4, 1, 10.0, 40.0)
    assert b.p50 == 30.0  # nulls excluded from quantiles


def test_column_profile_one_scan_no_expand(spark, sf_dir):
    from arcane_stream_sqlserver_change_tracking_spark.operators.diagnostics import (
        column_profile,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = column_profile(li, ["l_quantity", "l_extendedprice",
                              "l_discount", "l_tax"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # all stats for all columns in one aggregate: no Expand (the
    # multi-count_distinct trap), exactly one Exchange (of ONE row)
    assert "Expand" not in plan
    assert plan.count("Exchange") == 1
    assert plan.count("FileScan") == 1


def test_column_profile_rejects_non_numeric(spark):
    from arcane_stream_sqlserver_change_tracking_spark.operators.diagnostics import (
        column_profile,
    )

    df = spark.createDataFrame([("x", 1)], "s string, v int")
    with pytest.raises(ValueError, match="not numeric"):
        column_profile(df, ["s"])
    with pytest.raises(ValueError, match="no numeric"):
        column_profile(df.select("s"))


def test_column_profile_empty_frame_and_weird_names(spark):
    from pyspark.sql import functions as F2
    from arcane_stream_sqlserver_change_tracking_spark.operators.diagnostics import (
        column_profile,
    )

    df = spark.createDataFrame([(1.0,)], ["price.usd"])
    # dotted name profiles via literal quoting
    row = column_profile(df).collect()[0]
    assert row.column == "price.usd" and row.n == 1
    # empty frame: n_null is 0, not NULL
    empty = column_profile(df.where(F2.lit(False))).collect()[0]
    assert (empty.n, empty.n_null) == (0, 0)
    assert empty.min_v is None and empty.p50 is None
    with pytest.raises(ValueError, match="duplicate"):
        column_profile(df, ["price.usd", "price.usd"])


def test_column_profile_approx_quantiles_scale_path(spark):
    from arcane_stream_sqlserver_change_tracking_spark.operators.diagnostics import (
        column_profile,
    )

    df = spark.range(1000).selectExpr("cast(id as double) as x")
    exact = column_profile(df).collect()[0]
    approx = column_profile(df, exact_quantiles=False).collect()[0]
    # approx returns actual data values within rank error; at accuracy
    # 10k over 1k rows the picked ranks are exact, so quartiles land
    # within one interpolation step of the exact variant
    for p_ex, p_ap in [(exact.p25, approx.p25), (exact.p50, approx.p50),
                       (exact.p75, approx.p75)]:
        assert abs(p_ex - p_ap) <= 1.0
    # everything non-quantile is identical, and the plan shape holds
    assert (exact.n, exact.n_null, exact.min_v, exact.max_v,
            exact.mean_v) == (approx.n, approx.n_null, approx.min_v,
                              approx.max_v, approx.mean_v)
    plan = column_profile(df, exact_quantiles=False)\
        ._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan and plan.count("Exchange") == 1
