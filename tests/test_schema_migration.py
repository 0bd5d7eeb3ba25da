"""K6 — schema evolution parity with the reference
(SchemaMigrationTests.scala:160-251):

* add-column: rows applied BEFORE the column existed read NULL in it
  (:163-166,199-206)
* drop-column: the column is RETAINED in the target; rows applied AFTER
  the drop read NULL in it (:208-250)
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from arcane_stream_sqlserver_change_tracking_spark.operators.schema_evolution import (
    SchemaEvolutionError,
    diff_schemas,
)
from arcane_stream_sqlserver_change_tracking_spark.plans.lake import LakeTable
from arcane_stream_sqlserver_change_tracking_spark.sources.changelog import (
    synth_transcripts_changelog,
)
from arcane_stream_sqlserver_change_tracking_spark.streaming.runner import CdcEngine, EngineOptions

from helpers import TRANSCRIPTS_SCHEMA, assert_tables_equal, oracle_final_state, sorted_pdf

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "ts"]


def test_add_column_mid_stream(spark, lake_root):
    eng = CdcEngine(
        spark, LakeTable(spark, lake_root),
        EngineOptions(num_buckets=8, max_events_per_batch=3000),
    )
    eng.bootstrap(TRANSCRIPTS_SCHEMA)

    # epoch 1: no `tool` column
    epoch1 = synth_transcripts_changelog(spark, 3000, num_convs=60, seed=5)
    eng.run_incremental(epoch1)
    assert "tool" not in [f.name for f in eng.table.schema().fields]

    # epoch 2: `tool` appears (source ALTER TABLE ADD COLUMN analog)
    epoch2 = synth_transcripts_changelog(
        spark, 3000, num_convs=60, seed=5, version_offset=3000, with_tool=True
    )
    eng.run_incremental(epoch2)

    schema_names = [f.name for f in eng.table.schema().fields]
    assert "tool" in schema_names
    state = eng.current_state()
    # rows never touched in epoch 2 must read tool = NULL
    untouched = state.filter(F.col("sys_change_version") <= 3000)
    assert untouched.count() > 0
    assert untouched.filter(F.col("tool").isNotNull()).count() == 0

    # full-state equality vs oracle over the union log
    log_pdf = pd.concat(
        [epoch1.withColumn("tool", F.lit(None).cast("string")).toPandas(), epoch2.toPandas()],
        ignore_index=True,
    )
    want = oracle_final_state(log_pdf, PAYLOAD + ["tool"])
    got = sorted_pdf(state, PAYLOAD + ["tool", "sys_change_version"])
    assert_tables_equal(got, want)

    # field ids: appended column got a fresh id (Iceberg-style evolution)
    props = eng.table.current_snapshot().properties
    assert props["field_ids"]["tool"] == props["max_field_id"]


def test_drop_column_retained(spark, lake_root):
    eng = CdcEngine(
        spark, LakeTable(spark, lake_root),
        EngineOptions(num_buckets=8, max_events_per_batch=3000),
    )
    eng.bootstrap(TRANSCRIPTS_SCHEMA)

    # epoch 1 carries all payload columns
    epoch1 = synth_transcripts_changelog(spark, 2000, num_convs=50, seed=6)
    eng.run_incremental(epoch1)

    # epoch 2: source dropped `role` — feed no longer carries it
    epoch2 = synth_transcripts_changelog(
        spark, 2000, num_convs=50, seed=6, version_offset=2000
    ).drop("role")
    eng.run_incremental(epoch2)

    schema_names = [f.name for f in eng.table.schema().fields]
    assert "role" in schema_names  # retained, never dropped
    state = eng.current_state()
    # rows upserted after the drop read role = NULL
    after = state.filter((F.col("sys_change_version") > 2000))
    assert after.count() > 0
    assert after.filter(F.col("role").isNotNull()).count() == 0
    # rows untouched since epoch 1 keep their role values
    before = state.filter(F.col("sys_change_version") <= 2000)
    assert before.filter(F.col("role").isNull()).count() == 0


def test_type_change_rejected(spark):
    import pyspark.sql.types as T

    a = T.StructType([T.StructField("x", T.IntegerType())])
    b = T.StructType([T.StructField("x", T.StringType())])
    with pytest.raises(SchemaEvolutionError):
        diff_schemas(a, b)


def test_diff_schemas_additive(spark):
    import pyspark.sql.types as T

    target = T.StructType([T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())])
    batch = T.StructType([T.StructField("a", T.IntegerType()), T.StructField("c", T.DoubleType())])
    d = diff_schemas(target, batch)
    assert [f.name for f in d.added] == ["c"]
    assert d.missing == ["b"]
    assert [f.name for f in d.evolved.fields] == ["a", "b", "c"]
