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


def test_sharded_backfill_resumes_without_redoing_shards(spark, lake_root, monkeypatch):
    """Kill a sharded backfill mid-flight: re-invoking it stages only the
    missing shards (completed ones are served from the persisted backfill
    state), the staged files survive the startup orphan sweep, and the
    final state equals an uninterrupted single-shot backfill."""
    from arcane_stream_sqlserver_change_tracking_spark.plans.lake import (
        BackfillStateError,
    )

    # uninterrupted reference run
    eng_ref = _engine(spark, lake_root + "_ref")
    snap_src = synth_transcripts_changelog(spark, 3000, num_convs=50, seed=7)
    eng_ref.backfill(snap_src, capture_version=3000)
    want = sorted_pdf(eng_ref.current_state(), OUT_COLS)

    eng = _engine(spark, lake_root)
    table = eng.table

    # crash after 2 of 4 shards: make the 3rd staged write raise
    calls = {"n": 0}
    real_stage = LakeTable.stage_backfill_shard

    def flaky_stage(self, df, bid, shard, total, **kw):
        if calls["n"] == 2:
            raise RuntimeError("simulated crash mid-backfill")
        calls["n"] += 1
        return real_stage(self, df, bid, shard, total, **kw)

    monkeypatch.setattr(LakeTable, "stage_backfill_shard", flaky_stage)
    try:
        eng.backfill(snap_src, capture_version=3000, shards=4)
        raise AssertionError("expected simulated crash")
    except RuntimeError as e:
        assert "simulated crash" in str(e)
    state = table.backfill_state()
    assert sorted(state["completed"]) == ["0", "1"]
    # nothing visible yet; startup sweep spares the staged shards
    assert table.read().count() == 0
    table.remove_orphan_files(older_than_seconds=0)
    assert sorted(table.backfill_state()["completed"]) == ["0", "1"]

    # resume (fresh engine = restarted process): completed shards are not
    # re-staged — count actual write jobs
    monkeypatch.setattr(LakeTable, "stage_backfill_shard", real_stage)
    writes = {"n": 0}
    real_write = LakeTable._write_parts

    def counting_write(self, *a, **kw):
        writes["n"] += 1
        return real_write(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "_write_parts", counting_write)
    eng2 = CdcEngine(spark, LakeTable(spark, lake_root), EngineOptions(num_buckets=8))
    eng2.backfill(snap_src, capture_version=3000, shards=4)
    assert writes["n"] == 2  # only shards 2 and 3
    assert eng2.table.backfill_state() is None  # state cleared on commit
    assert eng2.table.watermark()["version"] == 3000
    assert_tables_equal(sorted_pdf(eng2.current_state(), OUT_COLS), want)

    # change capture resumes from the captured version with no gap
    more = synth_transcripts_changelog(spark, 4000, num_convs=50, seed=7)
    eng2.run_incremental(more)
    eng_ref.run_incremental(more)
    assert_tables_equal(
        sorted_pdf(eng2.current_state(), OUT_COLS),
        sorted_pdf(eng_ref.current_state(), OUT_COLS),
    )

    # a different shard geometry against leftover state fails fast
    eng3 = _engine(spark, lake_root + "_geom")
    monkeypatch.setattr(LakeTable, "_write_parts", real_write)
    t3 = eng3.table
    t3.stage_backfill_shard(
        eng3.table.read(), "bf-a", 0, 2
    )
    try:
        t3.stage_backfill_shard(eng3.table.read(), "bf-b", 0, 3)
        raise AssertionError("expected BackfillStateError")
    except BackfillStateError:
        pass


def test_racing_writers_replan_and_converge(spark, lake_root, monkeypatch):
    """Two engines race on one table (reference queryRetryMode, CRD
    crd-microsoft-sql-server-stream.yaml:181-211). Writer B plans its
    merge against the pre-race snapshot; writer A lands a full commit
    inside B's plan-to-commit window. The base-snapshot validation must
    turn B's commit into a CommitConflictError (NOT a silent lost
    update), and with retry_mode="always" B re-plans against A's commit
    so the final state equals sequential application. With the default
    retry_mode="never" the loser raises."""
    import pytest

    from arcane_stream_sqlserver_change_tracking_spark.plans.lake import (
        CommitConflictError,
    )

    log = synth_transcripts_changelog(spark, 4000, num_convs=60, seed=9)
    b1 = log.filter(F.col("sys_change_version") <= 2000)
    b2 = log.filter(F.col("sys_change_version") > 2000)

    # sequential oracle
    eng_seq = _engine(spark, lake_root + "_seq")
    eng_seq.run_incremental(log)
    want = sorted_pdf(eng_seq.current_state(), OUT_COLS)

    eng_a = _engine(spark, lake_root)
    eng_b = CdcEngine(
        spark, LakeTable(spark, lake_root),
        EngineOptions(num_buckets=8, retry_mode="always",
                      retry_base_seconds=0.01),
    )

    # interpose: the first commit attempt from B's table triggers A's
    # full apply of b1 — A commits inside B's plan→commit window
    fired = {"x": False}
    real_rb = LakeTable.replace_buckets

    def racing_rb(self, *a, **kw):
        if self is eng_b.table and not fired["x"]:
            fired["x"] = True
            eng_a.apply_batch(b1)
        return real_rb(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "replace_buckets", racing_rb)
    res = eng_b.apply_batch(b2)
    assert not res.skipped and res.max_version == 4000

    # both batches landed; final state equals sequential application
    assert eng_b.table.watermark()["version"] == 4000
    assert_tables_equal(sorted_pdf(eng_b.current_state(), OUT_COLS), want)

    # default retry_mode="never": the loser of the same race raises
    eng_c = _engine(spark, lake_root + "_never")
    eng_d = CdcEngine(
        spark, LakeTable(spark, lake_root + "_never"),
        EngineOptions(num_buckets=8),
    )
    fired["x"] = False

    def racing_rb2(self, *a, **kw):
        if self is eng_d.table and not fired["x"]:
            fired["x"] = True
            eng_c.apply_batch(b1)
        return real_rb(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "replace_buckets", racing_rb2)
    with pytest.raises(CommitConflictError):
        eng_d.apply_batch(b2)


def test_caller_sharded_backfill_parts(spark, lake_root, monkeypatch):
    """shard_parts (source-pushable slices, e.g. read_backfill_shards):
    crash mid-flight, resume stages only the missing parts, final state
    equals the uninterrupted internal-sharding run — the two sharding
    modes are interchangeable in outcome."""
    snap_src = synth_transcripts_changelog(spark, 3000, num_convs=50, seed=9)

    eng_ref = _engine(spark, lake_root + "_ref")
    eng_ref.backfill(snap_src, capture_version=3000, shards=3)
    want = sorted_pdf(eng_ref.current_state(), OUT_COLS)

    # caller-side key-disjoint slices (range slices of conv_id's hash
    # stand in for pk-range JDBC reads; any key-disjoint cover works)
    parts = [
        snap_src.filter(F.abs(F.xxhash64("conv_id", "turn_idx")) % 3 == i)
        for i in range(3)
    ]

    eng = _engine(spark, lake_root)
    calls = {"n": 0}
    real_stage = LakeTable.stage_backfill_shard

    def flaky_stage(self, df, bid, shard, total, **kw):
        if calls["n"] == 2:
            raise RuntimeError("simulated crash mid-backfill")
        calls["n"] += 1
        return real_stage(self, df, bid, shard, total, **kw)

    monkeypatch.setattr(LakeTable, "stage_backfill_shard", flaky_stage)
    try:
        eng.backfill(None, capture_version=3000, shard_parts=parts)
        raise AssertionError("expected simulated crash")
    except RuntimeError as e:
        assert "simulated crash" in str(e)
    assert sorted(eng.table.backfill_state()["completed"]) == ["0", "1"]

    monkeypatch.setattr(LakeTable, "stage_backfill_shard", real_stage)
    writes = {"n": 0}
    real_write = LakeTable._write_parts

    def counting_write(self, *a, **kw):
        writes["n"] += 1
        return real_write(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "_write_parts", counting_write)
    eng2 = CdcEngine(spark, LakeTable(spark, lake_root), EngineOptions(num_buckets=8))
    eng2.backfill(None, capture_version=3000, shard_parts=parts)
    assert writes["n"] == 1  # only the missing third part
    assert eng2.table.backfill_state() is None
    assert_tables_equal(sorted_pdf(eng2.current_state(), OUT_COLS), want)


def test_shard_parts_requires_overwrite(spark, lake_root):
    eng = _engine(spark, lake_root)
    snap = synth_transcripts_changelog(spark, 100, num_convs=5, seed=1)
    try:
        eng.backfill(snap, behavior="merge", shard_parts=[snap])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "overwrite" in str(e)


def test_sigkill_mid_replay_resumes_via_spec_cli(spark, tmp_path):
    """VERDICT r5 ask 7: the watermark contract at PROCESS granularity.
    A real ``python -m <pkg> --mode replay --spec`` subprocess is
    SIGKILLed mid-drain (after >=1 committed batch, before the last),
    then re-launched with the identical command line; the resumed run
    must land exactly the state an uninterrupted library replay of the
    same deterministic feed produces, with no duplicated or lost
    versions (StreamRunner.scala:167-185 exactly-once semantics)."""
    import json
    import signal
    import subprocess
    import sys
    import time

    events = 20_000
    root = str(tmp_path / "t")
    spec = {
        "sink": {"targetTableFullName": "kill.test.table"},
        # 10 chunks of 2000 -> a wide mid-drain kill window
        "throughput": {"advisedChunkSize": 2_000},
    }
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps(spec))
    cmd = [
        sys.executable, "-m", "arcane_stream_sqlserver_change_tracking_spark",
        "--mode", "replay", "--table", root, "--events", str(events),
        "--bootstrap", "--spec", str(spec_path), "--num-buckets", "4",
    ]
    env = {**os.environ, "SPARK_GRAFT_SHUFFLE_PARTITIONS": "8"}

    current = os.path.join(root, "metadata", "_current")

    def read_current():
        try:
            with open(current) as f:
                return f.read()
        except OSError:
            return None

    proc = subprocess.Popen(cmd, cwd="/root/repo", env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        # wait for bootstrap commit, then for the FIRST batch commit,
        # then SIGKILL while later batches are still in flight
        deadline = time.monotonic() + 300
        boot = None
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"process exited rc={proc.returncode} before kill window")
            cur = read_current()
            if boot is None:
                boot = cur  # first observed pointer = bootstrap snapshot
            elif cur is not None and cur != boot:
                break  # a batch committed - mid-drain
            time.sleep(0.05)
        else:
            raise AssertionError("no batch commit observed within 300s")
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    killed_wm = LakeTable(spark, root).watermark()["version"]
    assert 0 < killed_wm < events, (
        f"kill landed outside the drain window (wm={killed_wm})")

    # resume: the IDENTICAL command line (reference restart semantics -
    # same CRD spec, same env; --bootstrap no-ops on an existing table)
    rc = subprocess.run(cmd, cwd="/root/repo", env=env,
                        stdout=subprocess.DEVNULL).returncode
    assert rc == 0

    resumed = LakeTable(spark, root)
    assert resumed.watermark()["version"] == events

    # oracle: uninterrupted library replay of the same deterministic feed
    clean_root = str(tmp_path / "clean")
    eng = CdcEngine(spark, LakeTable(spark, clean_root),
                    EngineOptions(num_buckets=4, max_events_per_batch=events,
                                  normalize_text_columns=("text",)))
    log = synth_transcripts_changelog(spark, events, with_tool=True)
    eng.bootstrap(log.drop("sys_change_version", "sys_change_operation").schema)
    eng.run_incremental(log)

    cols = sorted(c for c in resumed.read().columns if not c.startswith("_"))
    got = {tuple(r) for r in resumed.read().select(*cols).collect()}
    want = {tuple(r) for r in LakeTable(spark, clean_root).read().select(*cols).collect()}
    assert got == want and len(got) > 0
