"""Crash-window recovery: the commit protocol guarantees readers see
old-or-new state, never torn; uncommitted data files are invisible
garbage swept by remove_orphan_files; replay after any crash converges
to the oracle state (reference exactly-once contract,
StreamRunner.scala:250-258 + staging sweep docs/crd.md:45-48)."""

import os

from pyspark.sql import functions as F

from arcane_stream_sqlserver_change_tracking_spark.plans.lake import LakeTable
from arcane_stream_sqlserver_change_tracking_spark.sources.changelog import (
    synth_transcripts_changelog,
)
from arcane_stream_sqlserver_change_tracking_spark.streaming.runner import (
    CdcEngine,
    EngineOptions,
)

from helpers import TRANSCRIPTS_SCHEMA, assert_tables_equal, oracle_final_state, sorted_pdf

PAYLOAD_COLS = ["conv_id", "turn_idx", "role", "text", "ts"]
OUT_COLS = PAYLOAD_COLS + ["sys_change_version"]


def _engine(spark, root):
    eng = CdcEngine(
        spark, LakeTable(spark, root), EngineOptions(num_buckets=8)
    )
    eng.bootstrap(TRANSCRIPTS_SCHEMA)
    return eng


def test_crash_between_write_and_commit(spark, lake_root):
    eng = _engine(spark, lake_root)
    table = eng.table
    log = synth_transcripts_changelog(spark, 4000, num_convs=60, seed=5)
    eng.run_incremental(log.filter(F.col("sys_change_version") <= 2000))
    snap_before = table.current_snapshot()
    state_before = sorted_pdf(eng.current_state(), OUT_COLS)
    n_files_before = len(os.listdir(table.data_dir))

    # simulate a crash DURING batch 2: data files land in data/ but the
    # manifest pointer is never swung
    batch2 = eng._prepare(
        log.filter(F.col("sys_change_version") > 2000), watermark_version=2000
    ).drop("__b")
    orphan_entries = table._write_data_files(batch2, snapshot_id=999)
    assert orphan_entries and len(os.listdir(table.data_dir)) > n_files_before

    # readers are unaffected: current snapshot and state are unchanged
    assert table.current_snapshot().snapshot_id == snap_before.snapshot_id
    assert_tables_equal(sorted_pdf(eng.current_state(), OUT_COLS), state_before)

    # startup sweep removes exactly the garbage
    deleted = table.remove_orphan_files(older_than_seconds=0)
    assert sorted(deleted) == sorted(e["path"] for e in orphan_entries)

    # resume: re-drain from the committed watermark converges to oracle
    eng.run_incremental(log)
    want = oracle_final_state(log.toPandas(), PAYLOAD_COLS)
    assert_tables_equal(sorted_pdf(eng.current_state(), OUT_COLS), want)
    assert eng.table.watermark()["version"] == 4000


def test_resume_is_noop_when_fully_applied(spark, lake_root):
    eng = _engine(spark, lake_root)
    log = synth_transcripts_changelog(spark, 3000, num_convs=50, seed=6)
    eng.run_incremental(log)
    sid = eng.table.current_snapshot().snapshot_id
    # a second engine instance (fresh process analog) resumes: nothing
    # pending, no new snapshot
    eng2 = CdcEngine(eng.spark, LakeTable(eng.spark, eng.table.root),
                     EngineOptions(num_buckets=8))
    results = eng2.run_incremental(log)
    assert results == []
    assert eng2.table.current_snapshot().snapshot_id == sid
