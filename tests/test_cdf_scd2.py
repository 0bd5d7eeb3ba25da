"""Change Data Feed (snapshot diff) and SCD2 history operators."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arcane_stream_sqlserver_change_tracking_spark.functions.keys import (
    MERGE_KEY_COL,
    OPERATION_COL,
    VERSION_COL,
    bucket_expr,
    merge_key_expr,
)
from arcane_stream_sqlserver_change_tracking_spark.operators.cdf import (
    CHANGE_TYPE_COL,
    CT_DELETE,
    CT_INSERT,
    CT_UPDATE,
    snapshot_diff,
)
from arcane_stream_sqlserver_change_tracking_spark.operators.scd2 import (
    scd2_history,
)
from arcane_stream_sqlserver_change_tracking_spark.plans.lake import LakeTable
from arcane_stream_sqlserver_change_tracking_spark.streaming.runner import (
    CdcEngine,
    EngineOptions,
)


# ---------------------------------------------------------------------------
# snapshot_diff (pure DataFrame layer)
# ---------------------------------------------------------------------------

def _state(spark, rows):
    return spark.createDataFrame(rows, "k string, v long, txt string")


def test_snapshot_diff_classifies_all_three(spark):
    old = _state(spark, [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z")])
    new = _state(spark, [("a", 1, "x"), ("b", 20, "y"), ("d", 4, "w")])
    got = {
        r["k"]: (r[CHANGE_TYPE_COL], r["v"], r["txt"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        "b": (CT_UPDATE, 20, "y"),   # post-image
        "c": (CT_DELETE, 3, "z"),    # pre-image
        "d": (CT_INSERT, 4, "w"),
    }
    # unchanged key "a" emits nothing


def test_snapshot_diff_identical_states_empty(spark):
    s = _state(spark, [("a", 1, None), ("b", None, "y")])
    assert snapshot_diff(s, s, ["k"]).count() == 0


def test_snapshot_diff_null_safe_compare(spark):
    old = _state(spark, [("a", 1, None)])
    new = _state(spark, [("a", 1, "now-set")])
    rows = snapshot_diff(old, new, ["k"]).collect()
    assert len(rows) == 1 and rows[0][CHANGE_TYPE_COL] == CT_UPDATE


def test_snapshot_diff_all_null_key_rows(spark):
    """Rows whose key columns are ALL NULL still join across sides
    under eqNullSafe; presence must come from a per-side marker, not
    key nullability — otherwise a matched null-key row reads "absent
    on both sides" and is mislabeled an insert with a null-padded old
    side (ADVICE r3)."""
    old = _state(spark, [(None, 1, "x"), ("b", 2, "y")])
    # null key updated 1→10; "b" unchanged
    new = _state(spark, [(None, 10, "x"), ("b", 2, "y")])
    got = snapshot_diff(old, new, ["k"]).collect()
    assert len(got) == 1
    r = got[0]
    assert r["k"] is None
    assert r[CHANGE_TYPE_COL] == CT_UPDATE
    assert r["v"] == 10 and r["txt"] == "x"
    # identical null-key rows emit nothing (not phantom inserts)
    same = _state(spark, [(None, 1, "x")])
    assert snapshot_diff(same, same, ["k"]).count() == 0


def test_snapshot_diff_schema_evolution_added_column(spark):
    old = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    new = spark.createDataFrame(
        [("a", 1, "t1"), ("b", 2, None)], "k string, v long, tool string"
    )
    got = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
    # "a" gained a tool value → update; "b"'s tool is null both sides → silent
    assert set(got) == {"a"}
    assert got["a"][CHANGE_TYPE_COL] == CT_UPDATE and got["a"]["tool"] == "t1"


# ---------------------------------------------------------------------------
# LakeTable.changes_between (manifest-delta planning)
# ---------------------------------------------------------------------------

def _changelog(spark, rows):
    """rows: (version, op, k, v)"""
    df = spark.createDataFrame(
        rows, f"{VERSION_COL} long, {OPERATION_COL} string, k string, v long"
    )
    return df


def test_changes_between_prunes_untouched_buckets(spark, lake_root):
    payload = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    table = LakeTable(spark, os.path.join(lake_root, "t"))
    eng = CdcEngine(
        spark,
        table,
        EngineOptions(key_columns=("k",), num_buckets=8, max_events_per_batch=10_000),
    )
    eng.bootstrap(payload)
    base = [(i + 1, "U", f"key{i}", i) for i in range(64)]
    eng.run_incremental(_changelog(spark, base))
    s1 = table.current_snapshot()
    # second batch touches exactly 3 keys: update, delete, insert
    second = [(100, "U", "key1", 111), (101, "D", "key2", 0), (102, "U", "key999", 999)]
    eng.run_incremental(_changelog(spark, second))
    s2 = table.current_snapshot()

    diff = table.changes_between(s1.snapshot_id, s2.snapshot_id)
    got = {r["k"]: (r[CHANGE_TYPE_COL], r["v"]) for r in diff.collect()}
    assert got == {
        "key1": (CT_UPDATE, 111),
        "key2": (CT_DELETE, 2),
        "key999": (CT_INSERT, 999),
    }

    # manifest-delta planning: only the buckets the 3 keys hash to were
    # rewritten; every other bucket's manifest entry is the same object
    touched = {
        b
        for b in set(s1.bucket_manifests) | set(s2.bucket_manifests)
        if s1.bucket_manifests.get(b, {}).get("path")
        != s2.bucket_manifests.get(b, {}).get("path")
    }
    expect = {
        r["b"]
        for r in spark.createDataFrame([("key1",), ("key2",), ("key999",)], "k string")
        .withColumn(MERGE_KEY_COL, merge_key_expr(["k"]))
        .select(bucket_expr(MERGE_KEY_COL, 8).alias("b"))
        .collect()
    }
    assert touched == expect
    assert len(touched) < 8  # the diff scan skipped untouched buckets


def test_snapshot_as_of_version_cdf_cursor(spark, lake_root):
    payload = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    table = LakeTable(spark, os.path.join(lake_root, "v"))
    eng = CdcEngine(
        spark,
        table,
        EngineOptions(key_columns=("k",), num_buckets=4, max_events_per_batch=4),
    )
    eng.bootstrap(payload)
    # 12 changes in ~3 count-balanced micro-batches; read the actual
    # committed watermark sequence back rather than assuming boundaries
    eng.run_incremental(
        _changelog(spark, [(v, "U", f"k{v % 3}", v) for v in range(1, 13)])
    )
    wms = [
        (table.snapshot(sid).watermark or {}).get("version")
        for sid in table.snapshot_log()
    ]
    w1, w2 = [w for w in wms if w][0:2]  # first two batch watermarks
    assert table.snapshot_as_of_version(w1).watermark["version"] == w1
    # a cursor BETWEEN two watermarks resolves down to the earlier one
    assert table.snapshot_as_of_version(w2 - 1).watermark["version"] == w1
    assert table.snapshot_as_of_version(99).watermark["version"] == max(wms)
    with pytest.raises(ValueError, match="no snapshot"):
        table.snapshot_as_of_version(-1)
    # CDF between two change-version cursors: versions w1+1..w2 touch
    # all three keys (batches are ≥4 changes over a 3-key space)
    a = table.snapshot_as_of_version(w1).snapshot_id
    b = table.snapshot_as_of_version(w2).snapshot_id
    diff = table.changes_between(a, b)
    assert diff.count() == 3
    assert {r["_change_type"] for r in diff.collect()} == {"update_postimage"}


def test_cdf_cursor_drain_resume_and_retention(spark, lake_root, tmp_path):
    """CdfCursor consumer loop: initial load as inserts, incremental
    tail, crash-resume (poll without commit replays the identical
    increment), caught-up -> None, and a fail-fast when maintenance
    expires the cursor's base snapshot (the lake-side twin of the
    source's CHANGE_TRACKING_MIN_VALID_VERSION guard)."""
    from arcane_stream_sqlserver_change_tracking_spark.operators.cdf import (
        CdfCursor,
        CursorBehindRetentionError,
    )

    payload = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    table = LakeTable(spark, os.path.join(lake_root, "cur"))
    eng = CdcEngine(
        spark,
        table,
        EngineOptions(key_columns=("k",), num_buckets=4, max_events_per_batch=1000),
    )
    eng.bootstrap(payload)
    ckpt = str(tmp_path / "cursor.json")
    cursor = CdfCursor(table, ckpt)

    # increment 1: initial load = every live row as insert
    eng.run_incremental(
        _changelog(spark, [(i + 1, "U", f"k{i}", i) for i in range(8)])
    )
    df, upto = cursor.poll()
    rows = {(r["k"], r["v"], r[CHANGE_TYPE_COL]) for r in df.collect()}
    assert rows == {(f"k{i}", i, CT_INSERT) for i in range(8)}

    # crash before commit: a NEW cursor on the same checkpoint replays
    # the identical increment
    again, upto2 = CdfCursor(table, ckpt).poll()
    assert upto2 == upto
    assert {(r["k"], r["v"], r[CHANGE_TYPE_COL]) for r in again.collect()} == rows

    cursor.commit(upto)
    assert cursor.poll() is None  # caught up
    assert cursor.position() == upto

    # increment 2: one update, one delete
    eng.run_incremental(
        _changelog(spark, [(100, "U", "k1", 111), (101, "D", "k2", 0)])
    )
    df2, upto2 = cursor.poll()
    assert {(r["k"], r[CHANGE_TYPE_COL]) for r in df2.collect()} == {
        ("k1", CT_UPDATE),
        ("k2", CT_DELETE),
    }
    with pytest.raises(ValueError, match="backwards"):
        cursor.commit(0)
    cursor.commit(upto2)

    # churn + retention: expire everything but the latest snapshots
    for seq in range(3):
        eng.run_incremental(_changelog(spark, [(200 + seq, "U", "k1", 200 + seq)]))
    stale = CdfCursor(table, str(tmp_path / "stale.json"))
    df0, up0 = stale.poll()  # plans from snapshot 0
    df0.collect()
    table.expire_snapshots(keep_last=2)
    # a FRESH consumer whose base (the created snapshot) was expired
    # must still be able to attach: bootstrap = full current state as
    # inserts (changes_between from nothing), then tail normally
    dfb, upb = stale.poll()
    got = {(r["k"], r["v"], r[CHANGE_TYPE_COL]) for r in dfb.collect()}
    live = {(r["k"], r["v"], CT_INSERT) for r in table.read().select("k", "v").collect()}
    assert got == live and upb == table.current_snapshot().snapshot_id
    # a consumer stranded at an expired MID snapshot still fails fast —
    # its increments are unrecoverable, unlike the fresh-bootstrap case
    assert cursor.position() not in set(table.snapshot_log())
    with pytest.raises(CursorBehindRetentionError, match="re-bootstrap"):
        cursor.poll()


def test_changes_between_requires_keys(spark, lake_root):
    t = LakeTable(spark, os.path.join(lake_root, "nk"))
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField(MERGE_KEY_COL, T.StringType())]
    )
    t.create(schema, num_buckets=2)  # no key_columns recorded
    with pytest.raises(ValueError, match="key columns"):
        t.changes_between(0, 0)


# ---------------------------------------------------------------------------
# scd2_history
# ---------------------------------------------------------------------------

def test_scd2_intervals_tile_and_delete_closes(spark):
    log = _changelog(
        spark,
        [
            (1, "U", "a", 10),
            (3, "U", "a", 30),
            (5, "D", "a", 0),
            (7, "U", "a", 70),
            (2, "U", "b", 20),
            (4, "D", "c", 0),
        ],
    )
    hist = scd2_history(log, ["k"], VERSION_COL, OPERATION_COL, ["v"])
    rows = {
        (r["k"], r["valid_from_version"]): (r["valid_to_version"], r["is_current"], r["v"])
        for r in hist.collect()
    }
    assert rows == {
        ("a", 1): (3, False, 10),
        ("a", 3): (5, False, 30),   # closed by the delete
        ("a", 7): (None, True, 70),  # reborn after delete
        ("b", 2): (None, True, 20),
    }
    # key "c": delete-only → no history row
    assert not any(k == "c" for k, _ in rows)


def test_scd2_point_in_time_matches_replay(spark):
    log = _changelog(
        spark,
        [(v, "D" if (v % 5 == 0) else "U", f"k{v % 7}", v * 10) for v in range(1, 40)],
    )
    hist = scd2_history(log, ["k"], VERSION_COL, OPERATION_COL, ["v"])
    asof = 23
    pit = hist.filter(
        (F.col("valid_from_version") <= asof)
        & (F.col("valid_to_version").isNull() | (F.col("valid_to_version") > asof))
    ).select("k", "v")
    # oracle: latest change per key at version <= asof, drop deletes
    from arcane_stream_sqlserver_change_tracking_spark.operators.dedup import (
        latest_change_per_key,
    )
    from arcane_stream_sqlserver_change_tracking_spark.functions.keys import (
        with_merge_key,
    )

    replay = (
        latest_change_per_key(
            with_merge_key(log.filter(F.col(VERSION_COL) <= asof), ["k"])
        )
        .filter(F.col(OPERATION_COL) != "D")
        .select("k", "v")
    )
    assert {tuple(r) for r in pit.collect()} == {tuple(r) for r in replay.collect()}


# ---------------------------------------------------------------------------
# Scd2Table — maintained incremental SCD2
# ---------------------------------------------------------------------------

def _scd2_rows(df):
    return {
        (r["k"], r["v"], r["valid_from_version"], r["valid_to_version"], r["is_current"])
        for r in df.collect()
    }


def test_scd2_table_incremental_equals_one_shot(spark, lake_root, tmp_path):
    """The maintained SCD2 table must equal the one-shot scd2_history
    derivation after EVERY batch, across inserts, updates, deletes and
    a delete→re-insert of the same key (the case that forces the
    interval→event reconstruction to re-synthesize the delete)."""
    from arcane_stream_sqlserver_change_tracking_spark.operators.scd2_table import Scd2Table

    payload = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    events = [
        # batch 1: three inserts + an update
        [(1, "U", "a", 10), (2, "U", "b", 20), (3, "U", "c", 30), (4, "U", "a", 11)],
        # batch 2: delete b, update c, insert d
        [(5, "D", "b", 0), (6, "U", "c", 31), (7, "U", "d", 40)],
        # batch 3: re-insert b after its delete, delete a
        [(8, "U", "b", 21), (9, "D", "a", 0)],
    ]
    hist = Scd2Table(
        LakeTable(spark, os.path.join(lake_root, "scd2t")),
        key_columns=["k"],
        num_buckets=4,
    )
    hist.bootstrap(payload)
    seen: list[tuple] = []
    for batch in events:
        seen.extend(batch)
        res = hist.apply_batch(_changelog(spark, batch))
        assert not res.skipped and res.rows_in == len(batch)
        expect = scd2_history(
            _changelog(spark, seen),
            key_columns=["k"],
            version_col=VERSION_COL,
            op_col=OPERATION_COL,
            payload_columns=["v"],
        )
        assert _scd2_rows(hist.history()) == _scd2_rows(expect)

    # replaying an already-applied batch is a skipped no-op (watermark)
    res = hist.apply_batch(_changelog(spark, events[-1]))
    assert res.skipped
    assert _scd2_rows(hist.history()) == _scd2_rows(expect)

    # point-in-time: at v=5, b is deleted, a=11, c=30, d absent
    at5 = {(r["k"], r["v"]) for r in hist.as_of(5).collect()}
    assert at5 == {("a", 11), ("c", 30)}
    # current state matches the replayed Type-1 semantics
    cur = {(r["k"], r["v"]) for r in hist.history().filter("is_current").collect()}
    assert cur == {("b", 21), ("c", 31), ("d", 40)}


def test_scd2_table_touched_buckets_only(spark, lake_root):
    """A batch touching one key must rewrite only that key's bucket —
    the CoW manifest delta is the witness (same invariant as the
    Type-1 merge)."""
    from arcane_stream_sqlserver_change_tracking_spark.operators.scd2_table import Scd2Table

    payload = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    table = LakeTable(spark, os.path.join(lake_root, "scd2b"))
    hist = Scd2Table(table, key_columns=["k"], num_buckets=8)
    hist.bootstrap(payload)
    hist.apply_batch(
        _changelog(spark, [(i + 1, "U", f"key{i}", i) for i in range(32)])
    )
    s1 = table.current_snapshot()
    res = hist.apply_batch(_changelog(spark, [(100, "U", "key7", 777)]))
    s2 = table.current_snapshot()
    changed = {
        b
        for b in set(s1.bucket_manifests) | set(s2.bucket_manifests)
        if s1.bucket_manifests.get(b, {}).get("path")
        != s2.bucket_manifests.get(b, {}).get("path")
    }
    assert res.touched_buckets == 1 and len(changed) == 1
    # both intervals of key7 exist, old one closed at v=100
    k7 = _scd2_rows(hist.history().filter(F.col("k") == "key7"))
    assert k7 == {("key7", 7, 8, 100, False), ("key7", 777, 100, None, True)}


def test_cdf_cursor_feeds_scd2_consumer(spark, lake_root, tmp_path):
    """Composition: a downstream consumer tails the replica's change
    feed with CdfCursor, adapts each increment via
    cdf_increment_to_changes, and maintains its own SCD2 history table.
    Point-in-time reads of the consumer table must equal the replica's
    time-travel state at every drained snapshot — the full
    source → engine → replica → CDF → derived-table loop."""
    from arcane_stream_sqlserver_change_tracking_spark.operators.cdf import (
        CdfCursor,
        cdf_increment_to_changes,
    )
    from arcane_stream_sqlserver_change_tracking_spark.operators.scd2_table import (
        Scd2Table,
    )

    payload = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    table = LakeTable(spark, os.path.join(lake_root, "rep"))
    eng = CdcEngine(
        spark,
        table,
        EngineOptions(key_columns=("k",), num_buckets=4, max_events_per_batch=1000),
    )
    eng.bootstrap(payload)
    hist = Scd2Table(
        LakeTable(spark, os.path.join(lake_root, "hist")),
        key_columns=["k"],
        num_buckets=4,
    )
    hist.bootstrap(payload)
    cursor = CdfCursor(table, str(tmp_path / "consumer.json"))

    batches = [
        [(i + 1, "U", f"k{i}", i) for i in range(6)],          # initial load
        [(10, "U", "k1", 111), (11, "D", "k2", 0), (12, "U", "k9", 99)],
        [(20, "U", "k1", 222), (21, "U", "k2", 7)],            # re-insert k2
    ]
    drained = []
    for b in batches:
        eng.run_incremental(_changelog(spark, b))
        df, upto = cursor.poll()
        hist.apply_batch(cdf_increment_to_changes(df, ["k"], upto))
        cursor.commit(upto)
        drained.append(upto)
    assert cursor.poll() is None

    for sid in drained:
        replica = {
            (r["k"], r["v"]) for r in table.read(snapshot_id=sid).select("k", "v").collect()
        }
        consumer = {
            (r["k"], r["v"]) for r in hist.as_of(sid).select("k", "v").collect()
        }
        assert consumer == replica, f"snapshot {sid}"
    # history depth: k1 has three intervals (two closed), k2 delete+re-insert
    k1 = hist.history().filter(F.col("k") == "k1").collect()
    assert len(k1) == 3 and sum(r["valid_to_version"] is None for r in k1) == 1
