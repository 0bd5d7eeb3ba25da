"""Data-quality expectation gates (operators/quality_gate.py):
per-check violation accounting, single-pass plan, and the enforcing
raise."""

import pytest

from arcane_stream_sqlserver_change_tracking_spark.operators.quality_gate import (
    ExpectationError,
    enforce_expectations,
    expectation_report,
)


@pytest.fixture()
def df(spark):
    rows = [
        (1, "en", 10),
        (2, "en", 5),
        (2, "de", -3),     # duplicate id, negative n
        (None, "xx", 7),   # null id, lang outside set
        (4, None, 99),     # null lang: not an in_set violation
    ]
    return spark.createDataFrame(rows, "id long, lang string, n long")


def test_violation_accounting(spark, df):
    out = {(r["column"], r["check"]): r for r in expectation_report(df, [
        {"column": "id", "check": "not_null"},
        {"column": "id", "check": "unique"},
        {"column": "n", "check": "min", "value": 0},
        {"column": "n", "check": "max", "value": 50},
        {"column": "lang", "check": "in_set", "values": ["en", "de"]},
        {"column": "lang", "check": "matches", "pattern": "[a-z]{2}"},
    ]).collect()}
    assert out[("id", "not_null")]["violations"] == 1
    assert out[("id", "unique")]["violations"] == 1   # one dup, one null (first free)
    assert out[("n", "min")]["violations"] == 1       # -3
    assert out[("n", "max")]["violations"] == 1       # 99
    assert out[("lang", "in_set")]["violations"] == 1  # xx; null ignored
    assert out[("lang", "matches")]["violations"] == 0  # xx matches [a-z]{2}
    assert all(r["n_rows"] == 5 for r in out.values())
    assert not out[("id", "unique")]["passed"]


def test_unique_counts_extra_nulls(spark):
    d = spark.createDataFrame([(None,), (None,), (1,)], "id long")
    r = expectation_report(d, [{"column": "id", "check": "unique"}]).collect()[0]
    assert r["violations"] == 1  # second null is the duplicate


def test_single_pass_plan(spark, df):
    """Six rules, one aggregate: the plan contains exactly one pair of
    HashAggregates (partial+final) over the input — rule count does not
    multiply scans. (countDistinct adds its expand/agg pair; the SCAN
    still happens once.)"""
    rep = expectation_report(df, [
        {"column": "id", "check": "not_null"},
        {"column": "n", "check": "min", "value": 0},
        {"column": "n", "check": "max", "value": 50},
        {"column": "lang", "check": "in_set", "values": ["en"]},
    ])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1, plan


def test_enforce_raises_with_named_rules(spark, df):
    with pytest.raises(ExpectationError, match="not_null on id"):
        enforce_expectations(df, [{"column": "id", "check": "not_null"}])
    clean = df.filter("id IS NOT NULL")
    assert enforce_expectations(
        clean, [{"column": "id", "check": "not_null"}]) is clean


def test_rule_validation(spark, df):
    with pytest.raises(ValueError, match="non-empty"):
        expectation_report(df, [])
    with pytest.raises(ValueError, match="unknown column"):
        expectation_report(df, [{"column": "zz", "check": "not_null"}])
    with pytest.raises(ValueError, match="unknown check"):
        expectation_report(df, [{"column": "id", "check": "median"}])
    with pytest.raises(ValueError, match="needs 'column'"):
        expectation_report(df, [{"check": "not_null"}])


def test_empty_input_passes_bounds(spark):
    d = spark.createDataFrame([], "id long")
    rows = expectation_report(d, [
        {"column": "id", "check": "not_null"},
        {"column": "id", "check": "min", "value": 0},
    ]).collect()
    assert all(r["violations"] == 0 and r["passed"] for r in rows)
    assert all(r["n_rows"] == 0 for r in rows)


def test_engine_expectation_gate_blocks_batch_atomically(spark, tmp_path):
    """EngineOptions.expectations = per-batch admission control: a
    violating batch raises BEFORE the write — table rows and watermark
    unchanged — and a clean batch then applies normally. Same fail-fast
    philosophy as the watermark contract."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from arcane_stream_sqlserver_change_tracking_spark.plans.lake import LakeTable
    from arcane_stream_sqlserver_change_tracking_spark.streaming.runner import (
        CdcEngine,
        EngineOptions,
    )

    payload = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    eng = CdcEngine(
        spark, LakeTable(spark, str(tmp_path / "gated")),
        EngineOptions(key_columns=("doc_id",), num_buckets=4,
                      expectations=({"column": "text", "check": "not_null"},)))
    eng.bootstrap(payload)

    def log(rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, sys_change_version long, "
                  "sys_change_operation string")

    eng.run_incremental(log([(1, "ok", 1, "I"), (2, "fine", 2, "I")]))
    assert eng.current_state().count() == 2
    wm = eng.current_watermark()

    with pytest.raises(ExpectationError, match="not_null on text"):
        eng.run_incremental(log([(3, "good", 3, "I"), (4, None, 4, "I")]))
    assert eng.current_state().count() == 2  # nothing landed
    assert eng.current_watermark() == wm     # watermark untouched

    eng.run_incremental(log([(3, "good", 5, "I")]))
    assert eng.current_state().count() == 3


def test_engine_gate_ignores_delete_tombstones(spark, tmp_path):
    """Review regression: D rows carry NULL payload columns by
    CHANGETABLE contract and never land — a not_null rule must not
    block a batch for its tombstones, and the delete must still apply."""
    from pyspark.sql import types as T

    from arcane_stream_sqlserver_change_tracking_spark.plans.lake import LakeTable
    from arcane_stream_sqlserver_change_tracking_spark.streaming.runner import (
        CdcEngine,
        EngineOptions,
    )

    payload = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    eng = CdcEngine(
        spark, LakeTable(spark, str(tmp_path / "tomb")),
        EngineOptions(key_columns=("doc_id",), num_buckets=4,
                      expectations=({"column": "text", "check": "not_null"},)))
    eng.bootstrap(payload)

    def log(rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, sys_change_version long, "
                  "sys_change_operation string")

    eng.run_incremental(log([(1, "a", 1, "I"), (2, "b", 2, "I")]))
    # the delete's NULL text must pass the gate; the live row is checked
    eng.run_incremental(log([(1, None, 3, "D"), (3, "c", 4, "I")]))
    state = {r["doc_id"] for r in eng.current_state().collect()}
    assert state == {2, 3}  # delete applied, insert landed
