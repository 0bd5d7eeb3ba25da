"""End-to-end replay correctness — port of the reference's integration
test strategy (StreamRunner.scala:166-259): golden final-state equality
after insert / backfill / update / delete sequences, watermark resume
contract, exactly-once re-drain.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arcane_stream_sqlserver_change_tracking_spark.plans.lake import LakeTable
from arcane_stream_sqlserver_change_tracking_spark.sources.changelog import (
    synth_transcripts_changelog,
)
from arcane_stream_sqlserver_change_tracking_spark.streaming.runner import (
    CdcEngine,
    EngineOptions,
    WatermarkNotSetError,
)

from helpers import TRANSCRIPTS_SCHEMA, assert_tables_equal, oracle_final_state, sorted_pdf

PAYLOAD_COLS = ["conv_id", "turn_idx", "role", "text", "ts"]
OUT_COLS = PAYLOAD_COLS + ["sys_change_version"]


def make_engine(spark, lake_root, **opt_kwargs) -> CdcEngine:
    defaults = dict(num_buckets=16, max_events_per_batch=4000)
    defaults.update(opt_kwargs)
    eng = CdcEngine(spark, LakeTable(spark, lake_root), EngineOptions(**defaults))
    eng.bootstrap(TRANSCRIPTS_SCHEMA)
    return eng


def test_fail_when_watermark_not_set(spark, lake_root):
    """Reference: 'fail stream when watermark is not set'
    (StreamRunner.scala:167-185)."""
    table = LakeTable(spark, lake_root)
    schema = T.StructType(
        TRANSCRIPTS_SCHEMA.fields
        + [
            T.StructField("arcane_merge_key", T.StringType()),
            T.StructField("sys_change_version", T.LongType()),
        ]
    )
    table.create(schema, num_buckets=8, watermark=None)
    eng = CdcEngine(spark, table)
    with pytest.raises(WatermarkNotSetError, match="Invalid watermark value: 'null'"):
        eng.run_incremental(synth_transcripts_changelog(spark, 10))


def test_full_replay_matches_oracle(spark, lake_root):
    eng = make_engine(spark, lake_root)
    log = synth_transcripts_changelog(spark, 12_000, num_convs=200, seed=7)
    results = eng.run_incremental(log)
    assert len(results) == 3
    got = sorted_pdf(eng.current_state(), OUT_COLS)
    want = oracle_final_state(log.toPandas(), PAYLOAD_COLS)
    assert_tables_equal(got, want)
    # watermark equals the feed's current version after drain
    # (reference: CHANGE_TRACKING_CURRENT_VERSION equality,
    # StreamRunner.scala:250-258)
    assert eng.table.watermark()["version"] == 12_000
    # per-partition lineage recorded
    parts = eng.table.watermark()["partitions"]
    assert parts and all(
        {"partition_id", "last_version", "rows_applied", "apply_latency_ms"} <= set(p)
        for p in parts
    )


def test_stream_backfill_stream(spark, lake_root):
    """Reference golden sequence 'stream, backfill and stream again'
    (StreamRunner.scala:196-258): stream inserts -> backfill snapshot ->
    stream updates+delete -> final == stream ∪ updated − deleted."""
    eng = make_engine(spark, lake_root)

    # phase 1: stream an initial changelog
    phase1 = synth_transcripts_changelog(spark, 3000, num_convs=80, seed=1)
    eng.run_incremental(phase1)

    # phase 2: backfill (overwrite) with a full snapshot = oracle state of
    # phase1 PLUS extra rows (mirrors the reference's backfill adding keys
    # 4-6 alongside streamed 1-2)
    snapshot_extra = synth_transcripts_changelog(
        spark, 1500, num_convs=40, seed=2
    ).filter(F.col("sys_change_operation") != "D").withColumn(
        "conv_id", F.concat(F.lit("bf-"), F.col("conv_id"))
    )
    snapshot = eng.current_state().select(
        *PAYLOAD_COLS, "sys_change_version",
        F.lit("I").alias("sys_change_operation"),
    ).unionByName(
        snapshot_extra.select(*PAYLOAD_COLS, "sys_change_version", "sys_change_operation")
    )
    eng.backfill(snapshot, behavior="overwrite", capture_version=3000)

    n_after_backfill = eng.current_state().count()
    assert n_after_backfill > 0
    # backfilled keys present
    assert eng.current_state().filter(F.col("conv_id").startswith("bf-")).count() > 0

    # phase 3: stream more changes (updates + deletes over the same keyspace)
    phase3 = synth_transcripts_changelog(
        spark, 3000, num_convs=80, seed=1, version_offset=3000
    )
    eng.run_incremental(phase3)

    # oracle: backfill snapshot (as I-events at their versions, capped to
    # <= 3000) + phase3 changes replayed on top
    import pandas as pd

    snap_pdf = snapshot.toPandas()
    snap_pdf["sys_change_operation"] = "I"
    log_pdf = pd.concat([snap_pdf, phase3.toPandas()], ignore_index=True)
    want = oracle_final_state(log_pdf, PAYLOAD_COLS)
    got = sorted_pdf(eng.current_state(), OUT_COLS)
    assert_tables_equal(got, want)
    assert eng.table.watermark()["version"] == 6000


def test_exactly_once_redrain(spark, lake_root):
    eng = make_engine(spark, lake_root)
    log = synth_transcripts_changelog(spark, 5000, num_convs=100, seed=3)
    r1 = eng.run_incremental(log)
    state1 = sorted_pdf(eng.current_state(), OUT_COLS)
    r2 = eng.run_incremental(log)  # same feed again — nothing pending
    assert len(r1) >= 1 and len(r2) == 0
    state2 = sorted_pdf(eng.current_state(), OUT_COLS)
    assert_tables_equal(state2, state1)


def test_resume_after_partial_drain(spark, lake_root):
    """Kill-mid-run analog: drain only the first batch, then resume with
    a fresh engine instance — final state equals a one-shot replay."""
    eng = make_engine(spark, lake_root, max_events_per_batch=2000)
    log = synth_transcripts_changelog(spark, 8000, num_convs=150, seed=4)
    eng.run_incremental(log, max_batches=1)
    assert eng.table.watermark()["version"] < 8000

    # new engine over the same table dir (process restart)
    eng2 = CdcEngine(
        spark, LakeTable(spark, eng.table.root),
        EngineOptions(num_buckets=16, max_events_per_batch=2000),
    )
    eng2.run_incremental(log)
    assert eng2.table.watermark()["version"] == 8000
    got = sorted_pdf(eng2.current_state(), OUT_COLS)
    want = oracle_final_state(log.toPandas(), PAYLOAD_COLS)
    assert_tables_equal(got, want)


def test_delete_of_never_inserted_key_is_noop(spark, lake_root):
    """Retention-cleanup scenario (SURVEY.md §7.4): a D for a key the
    target never saw must not fail or create rows."""
    eng = make_engine(spark, lake_root)
    rows = [
        (1, "I", "c1", 0, "user", "hello", None),
        (2, "D", "ghost", 9, None, None, None),
    ]
    log = spark.createDataFrame(
        rows,
        "sys_change_version long, sys_change_operation string, conv_id string, "
        "turn_idx int, role string, text string, ts timestamp",
    )
    eng.run_incremental(log)
    state = eng.current_state()
    assert state.count() == 1
    assert state.collect()[0]["conv_id"] == "c1"


def test_reference_minimal_fixture_parity(spark, lake_root):
    """FIXTURES.md §4: replay the reference's own sequence on its 2-column
    shape — insert {1,2} -> backfill {4,5,6} -> update {4,5,6} -> delete 5
    (StreamRunner.scala:196-258). Final = {1,2} ∪ updated{4,6}."""
    schema = T.StructType([
        T.StructField("Id", T.IntegerType()),
        T.StructField("Name", T.StringType()),
    ])
    table = LakeTable(spark, lake_root)
    eng = CdcEngine(spark, table, EngineOptions(key_columns=("Id",), num_buckets=4))
    eng.bootstrap(schema)

    def log_of(rows):
        return spark.createDataFrame(
            rows, "sys_change_version long, sys_change_operation string, Id int, Name string"
        )

    # stream inserts 1,2
    eng.run_incremental(log_of([(1, "I", 1, "Tom"), (2, "I", 2, "Jerry")]))
    # backfill with current ∪ {4,5,6}
    snapshot = spark.createDataFrame(
        [(1, "Tom"), (2, "Jerry"), (4, "Spike"), (5, "Tyke"), (6, "Quacker")],
        "Id int, Name string",
    )
    eng.backfill(snapshot, behavior="overwrite", capture_version=2)
    # stream updates to 4-6 then delete 5
    eng.run_incremental(log_of([
        (3, "U", 4, "Spike2"), (4, "U", 5, "Tyke2"), (5, "U", 6, "Quacker2"),
        (6, "D", 5, None),
    ]))
    got = sorted(
        (r["Id"], r["Name"]) for r in eng.current_state().select("Id", "Name").collect()
    )
    assert got == [(1, "Tom"), (2, "Jerry"), (4, "Spike2"), (6, "Quacker2")]
    assert table.watermark()["version"] == 6


def test_partial_overlap_redelivery_cannot_regress(spark, lake_root):
    """A redelivered batch whose version range PARTIALLY overlaps the
    committed watermark (shifted boundaries after a crash) must not let
    a stale change overwrite a newer table row — the per-row stale
    guard (version > watermark) inside apply_batch, not just the
    batch-level skip."""
    eng = make_engine(spark, lake_root, max_events_per_batch=10**9)
    log = synth_transcripts_changelog(spark, 1000, num_convs=30, seed=11)
    eng.run_incremental(log)
    wm = eng.table.watermark()["version"]
    assert wm == 1000
    before = sorted_pdf(eng.current_state(), OUT_COLS)

    # adversarial redelivery: the first 800 versions again (all stale)
    # PLUS fresh events 1001-1100 — batch max > wm, so the batch itself
    # is applied; every stale row must be dropped row-wise
    stale = log.filter(F.col("sys_change_version") <= 800)
    fresh = synth_transcripts_changelog(spark, 100, num_convs=30, seed=11,
                                        version_offset=1000)
    res = eng.apply_batch(stale.unionByName(fresh))
    assert not res.skipped and res.max_version == 1100

    # oracle: original 1000 + the 100 fresh events — the stale rows are
    # already part of history; replaying them changes nothing
    import pandas as pd
    want = oracle_final_state(
        pd.concat([log.toPandas(), fresh.toPandas()], ignore_index=True),
        PAYLOAD_COLS,
    )
    got = sorted_pdf(eng.current_state(), OUT_COLS)
    assert_tables_equal(got, want)
    # sanity: no key regressed below its pre-redelivery version
    merged = before.merge(got, on=["conv_id", "turn_idx"], how="inner",
                          suffixes=("_old", "_new"))
    assert (merged["sys_change_version_new"] >= merged["sys_change_version_old"]).all()


def test_maintenance_cadence_and_time_travel(spark, lake_root):
    """K7 cadence wired into the loop (every N batches) + snapshot time
    travel through the engine API."""
    eng = make_engine(spark, lake_root, max_events_per_batch=1000,
                      maintenance_interval_batches=2)
    log = synth_transcripts_changelog(spark, 4000, num_convs=50, seed=21)
    results = eng.run_incremental(log)   # 4 batches -> 2 maintenance passes
    assert len(results) == 4
    files = len(eng.table.current_snapshot().files)
    # compaction keeps file count at ~one per touched bucket
    assert files <= 16 * 2

    lin = eng.lineage()
    assert lin["version"] == 4000
    assert lin["partitions"] and all("last_version" in p for p in lin["partitions"])

    # time travel: state at the first commit has only batch-1 data
    first_commit = next(sid for sid in eng.table.snapshot_log() if sid > 0
                        and eng.table.snapshot(sid).watermark.get("version", 0) > 0)
    old = eng.state_at(first_commit)
    assert old.agg(F.max("sys_change_version")).collect()[0][0] <= 1100


def test_metrics_jsonl_emitted(spark, lake_root):
    """A2: one JSON line per batch (applied AND skipped) under the
    table root with rows/versions/latency fields."""
    import json, os

    eng = make_engine(spark, lake_root, max_events_per_batch=1000)
    log = synth_transcripts_changelog(spark, 2000, num_convs=30, seed=17)
    eng.run_incremental(log)
    eng.run_incremental(log)  # re-drain: no-op, no extra lines
    path = os.path.join(eng.table.root, "metrics.jsonl")
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    for rec in lines:
        assert rec["event"] == "batch_applied"
        assert {"batch_seq", "rows_deduped", "max_version",
                "prepare_seconds", "commit_seconds", "skipped"} <= set(rec)
    assert lines[-1]["max_version"] == 2000
