"""Unit tests: merge key (F1), column normalization (P4/F2), text
normalization (Arrow pandas UDF), field filtering (P1)."""

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from arcane_stream_sqlserver_change_tracking_spark.functions.keys import (
    KEY_SEP,
    MERGE_KEY_COL,
    merge_key_expr,
    normalize_column_name,
    normalize_column_names,
    with_merge_key,
)
from arcane_stream_sqlserver_change_tracking_spark.functions.text import (
    normalize_text,
    normalize_text_pandas,
)
from arcane_stream_sqlserver_change_tracking_spark.operators.fields import FieldFilter


def test_merge_key_matches_sha256(spark):
    df = spark.createDataFrame([("conv-1", 3)], "conv_id string, turn_idx int")
    got = df.select(merge_key_expr(["conv_id", "turn_idx"]).alias("k")).collect()[0]["k"]
    want = hashlib.sha256(f"conv-1{KEY_SEP}3".encode()).hexdigest()
    assert got == want


def test_merge_key_null_key_part(spark):
    # concat_ws skips nulls — key is still synthesized deterministically
    df = spark.createDataFrame([(None, 3)], "conv_id string, turn_idx int")
    got = df.select(merge_key_expr(["conv_id", "turn_idx"]).alias("k")).collect()[0]["k"]
    assert got == hashlib.sha256(b"3").hexdigest()


def test_with_merge_key_idempotent(spark):
    df = spark.createDataFrame([("a", 1)], "conv_id string, turn_idx int")
    once = with_merge_key(df, ["conv_id", "turn_idx"])
    twice = with_merge_key(once, ["conv_id", "turn_idx"])
    assert once.columns == twice.columns
    assert MERGE_KEY_COL in once.columns


def test_normalize_column_name():
    # special chars stripped (docs/crd.md:226-228), metadata lowercased
    assert normalize_column_name("Cost$Center") == "CostCenter"
    assert normalize_column_name("a/b\\c") == "abc"
    assert normalize_column_name("SYS_CHANGE_VERSION") == "sys_change_version"
    assert normalize_column_name("ARCANE_MERGE_KEY") == "arcane_merge_key"
    assert normalize_column_name("ChangeTrackingVersion") == "changetrackingversion"
    assert normalize_column_name("Name") == "Name"  # payload case preserved


def test_normalize_column_names_df(spark):
    df = spark.createDataFrame([(1, "x")], ["Id$", "SYS_CHANGE_OPERATION"])
    out = normalize_column_names(df)
    assert out.columns == ["Id", "sys_change_operation"]


def test_normalize_text_pandas_and_udf(spark):
    raw = ["  a\t\tb\x00c  ", "e\u0301", None, "x \n y"]
    pdf = pd.Series(raw)
    normalized = normalize_text_pandas(pdf)
    assert normalized[0] == "a bc"  # NUL stripped, whitespace collapsed
    assert normalized[1] == "\u00e9"  # NFC composes e + combining accent
    assert normalized[2] is None
    assert normalized[3] == "x y"
    df = spark.createDataFrame([(s,) for s in raw], "text string")
    got = [r["t"] for r in df.select(normalize_text(F.col("text")).alias("t")).collect()]
    assert got == list(normalized.where(pd.notna(normalized), None))


def test_field_filter_rules(spark):
    df = spark.createDataFrame(
        [(1, "a", "b", 10, "U", "k")],
        ["Id", "Name", "Extra", "sys_change_version", "sys_change_operation", "arcane_merge_key"],
    )
    assert FieldFilter("all").apply(df).columns == df.columns
    inc = FieldFilter("include", ("id",)).apply(df)
    assert set(inc.columns) == {"Id", "sys_change_version", "sys_change_operation", "arcane_merge_key"}
    exc = FieldFilter("exclude", ("extra", "sys_change_version")).apply(df)
    # essential fields can never be dropped (CRD:413-421)
    assert set(exc.columns) == {"Id", "Name", "sys_change_version", "sys_change_operation", "arcane_merge_key"}


def test_normalize_expr_matches_pandas_on_ascii(spark):
    from arcane_stream_sqlserver_change_tracking_spark.functions.text import (
        normalize_text_expr,
    )

    rows = [
        ("  a \t b\n\nc  ",),
        ("x\x00y\x07z",),
        ("already clean",),
        ("\t\t  \t",),
        ("",),
    ]
    df = spark.createDataFrame(rows, "text string")
    via_expr = [r["t"] for r in df.select(normalize_text_expr("text").alias("t")).collect()]
    via_udf = [r["t"] for r in df.select(normalize_text(F.col("text")).alias("t")).collect()]
    via_pd = normalize_text_pandas(pd.Series([r[0] for r in rows])).tolist()
    assert via_expr == via_udf == via_pd
