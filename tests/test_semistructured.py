"""Semi-structured JSON column operators
(operators/semistructured.py): Catalyst-native parse with corrupt
tolerance, struct flattening, and bounded-sample schema inference."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arcane_stream_sqlserver_change_tracking_spark.operators.semistructured import (
    flatten_struct,
    infer_json_schema,
    parse_json_column,
)


@pytest.fixture()
def events(spark):
    rows = [
        (1, '{"k": 10, "tag": "a"}'),
        (2, '{"k": 20, "tag": "b", "extra": true}'),
        (3, "not json at all"),
        (4, None),
        (5, '{"k": 2.5}'),
    ]
    return spark.createDataFrame(rows, "id long, props string")


def test_parse_json_permissive_nulls(spark, events):
    out = parse_json_column(events, "props", "k double, tag string")
    got = {r["id"]: r["props_parsed"] for r in out.collect()}
    assert got[1]["k"] == 10.0 and got[1]["tag"] == "a"
    assert got[2]["k"] == 20.0  # extra field ignored by the pinned schema
    assert got[3] is None or got[3]["k"] is None  # corrupt → null, not a crash
    assert got[4] is None
    assert got[5]["k"] == 2.5

    dropped = parse_json_column(events, "props", "k double", drop_source=True)
    assert "props" not in dropped.columns


def test_parse_and_flatten_plan_zero_exchange(spark, events):
    """Parse + flatten is a scan-stage projection — JsonToStructs in
    the plan, no Exchange (the 100 TB shape: per-row work only)."""
    flat = flatten_struct(
        parse_json_column(events, "props", "k double, tag string"),
        "props_parsed", prefix="")
    plan = flat._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "from_json" in plan or "JsonToStructs" in plan, plan
    assert {"id", "props", "k", "tag"} <= set(flat.columns)
    assert "props_parsed" not in flat.columns


def test_flatten_prefix_and_errors(spark, events):
    parsed = parse_json_column(events, "props", "k double")
    flat = flatten_struct(parsed, "props_parsed")  # default prefix
    assert "props_parsed_k" in flat.columns
    kept = flatten_struct(parsed, "props_parsed", drop_source=False)
    assert "props_parsed" in kept.columns
    with pytest.raises(ValueError, match="not a struct"):
        flatten_struct(events, "props")


def test_infer_json_schema_widening(spark):
    rows = [
        ('{"a": 1, "b": "x"}',),
        ('{"a": 2.5, "c": {"d": 7}}',),      # a: long ⊔ double → double
        ('{"b": 3}',),                        # b: string ⊔ long → string
        ('{"c": {"d": 1.5, "e": [1, 2]}}',),  # struct union; array of longs
        ("garbage",),                          # skipped
        (None,),                               # skipped
        ("[1, 2]",),                           # non-object: skipped
    ]
    df = spark.createDataFrame(rows, "props string")
    schema = infer_json_schema(df, "props")
    by_name = {f.name: f.dataType for f in schema.fields}
    assert by_name["a"] == T.DoubleType()
    assert by_name["b"] == T.StringType()
    c = by_name["c"]
    assert isinstance(c, T.StructType)
    c_fields = {f.name: f.dataType for f in c.fields}
    assert c_fields["d"] == T.DoubleType()
    assert c_fields["e"] == T.ArrayType(T.LongType())

    # inferred schema round-trips through the parser
    parsed = parse_json_column(df, "props", schema)
    vals = [r["props_parsed"] for r in parsed.collect()]
    assert vals[0]["a"] == 1.0 and vals[2]["b"] == "3"


def test_infer_json_schema_no_objects_raises(spark):
    df = spark.createDataFrame([("junk",), (None,)], "props string")
    with pytest.raises(ValueError, match="no parseable JSON objects"):
        infer_json_schema(df, "props")


def test_infer_sample_is_bounded(spark):
    """The driver collect is capped by sample_rows — the inference
    never scans beyond the declared bound."""
    df = spark.range(10_000).select(
        F.concat(F.lit('{"n": '), F.col("id"), F.lit("}")).alias("props"))
    schema = infer_json_schema(df, "props", sample_rows=50)
    assert {f.name for f in schema.fields} == {"n"}
