"""LakeTable format: atomic commits, bucket pruning, time travel,
maintenance (compaction / expiry / orphan sweep) — the K1/K2/K5/K7
surface of the reference (SURVEY.md §2.9)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arcane_stream_sqlserver_change_tracking_spark.functions.keys import (
    MERGE_KEY_COL,
    bucket_expr,
    merge_key_expr,
)
from arcane_stream_sqlserver_change_tracking_spark.plans.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField(MERGE_KEY_COL, T.StringType()),
    ]
)


def _df(spark, n, tag=0):
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("key"), F.col("id").cast("string")).alias("k"),
            (F.col("id") + tag).alias("v"),
        )
        .withColumn(MERGE_KEY_COL, merge_key_expr(["k"]))
    )


def test_create_read_append(spark, lake_root):
    t = LakeTable(spark, lake_root)
    t.create(SCHEMA, num_buckets=8)
    assert t.exists()
    assert t.read().count() == 0  # empty table readable
    t.append(_df(spark, 100))
    assert t.read().count() == 100
    with pytest.raises(FileExistsError):
        t.create(SCHEMA, num_buckets=8)


def test_bucket_pruning_reads_only_touched_files(spark, lake_root):
    t = LakeTable(spark, lake_root)
    t.create(SCHEMA, num_buckets=8)
    t.append(_df(spark, 1000))
    snap = t.current_snapshot()
    all_buckets = {f["bucket"] for f in snap.files}
    assert all_buckets == set(range(8))
    one = t.read(buckets=[3])
    # every row in bucket 3 hashes there; no rows from other buckets
    check = one.withColumn("b", bucket_expr(MERGE_KEY_COL, 8)).filter("b <> 3")
    assert check.count() == 0
    assert 0 < one.count() < 1000


def test_atomic_commit_and_time_travel(spark, lake_root):
    t = LakeTable(spark, lake_root)
    t.create(SCHEMA, num_buckets=4)
    t.append(_df(spark, 10))
    s1 = t.current_snapshot().snapshot_id
    t.overwrite(_df(spark, 20, tag=1000))
    assert t.read().count() == 20
    # old snapshot still readable (time travel) until expiry
    assert t.read(snapshot_id=s1).count() == 10
    assert t.snapshot_log() == [0, 1, 2]


def test_replace_buckets_cow(spark, lake_root):
    t = LakeTable(spark, lake_root)
    t.create(SCHEMA, num_buckets=8)
    t.append(_df(spark, 800))
    before = {f["path"]: f for f in t.current_snapshot().files}
    # rewrite only bucket 2 with empty content -> rows of bucket 2 vanish
    empty = spark.createDataFrame([], SCHEMA)
    t.replace_buckets(empty, buckets=[2])
    after = t.current_snapshot().files
    # untouched buckets kept identical file entries
    kept = [f for f in after if f["bucket"] != 2]
    assert all(f["path"] in before for f in kept)
    assert not [f for f in after if f["bucket"] == 2]
    got = t.read().withColumn("b", bucket_expr(MERGE_KEY_COL, 8))
    assert got.filter("b = 2").count() == 0
    assert got.count() == sum(f["rows"] for f in kept)


def test_watermark_metadata_commit(spark, lake_root):
    t = LakeTable(spark, lake_root)
    t.create(SCHEMA, num_buckets=4, watermark=None)
    assert t.watermark() is None
    t.set_watermark({"version": 42, "batch_seq": 1, "partitions": []})
    assert t.watermark()["version"] == 42
    # data untouched by metadata commit
    assert t.read().count() == 0


def test_expire_snapshots_and_orphans(spark, lake_root):
    t = LakeTable(spark, lake_root)
    t.create(SCHEMA, num_buckets=4)
    for i in range(4):
        t.overwrite(_df(spark, 50, tag=i))
    assert len(t.snapshot_log()) == 5
    deleted = t.expire_snapshots(keep_last=2)
    assert deleted  # old overwritten files physically removed
    assert len(t.snapshot_log()) == 2
    assert t.read().count() == 50  # current state intact

    # orphan: drop a file into data/ that no manifest references
    orphan = os.path.join(t.data_dir, "part-bogus-b00000-orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    removed = t.remove_orphan_files()
    assert "data/part-bogus-b00000-orphan.parquet" in removed
    assert not os.path.exists(orphan)
    assert t.read().count() == 50


def test_compaction_reduces_files(spark, lake_root):
    t = LakeTable(spark, lake_root)
    t.create(SCHEMA, num_buckets=2)
    for i in range(3):
        t.append(_df(spark, 40, tag=i * 1000))
    files_before = len(t.current_snapshot().files)
    assert files_before >= 6  # 2 buckets x 3 appends
    t.rewrite_data_files(min_files_per_bucket=2)
    files_after = len(t.current_snapshot().files)
    assert files_after < files_before
    assert t.read().count() == 120


def test_analyze_stats(spark, lake_root):
    t = LakeTable(spark, lake_root)
    t.create(SCHEMA, num_buckets=4)
    t.append(_df(spark, 77))
    stats = t.analyze()
    assert stats["rows"] == 77
    assert stats["files"] >= 1
    assert t.current_snapshot().properties["stats"]["rows"] == 77


def test_bucket_hash_mismatch_fails_fast(spark, lake_root):
    """A table bucketed under a different hash function must refuse to
    open: touched-bucket pruning under the wrong hash would silently
    accumulate duplicate keys (ADVICE r1)."""
    import json

    from arcane_stream_sqlserver_change_tracking_spark.plans.lake import (
        BucketHashMismatchError,
    )

    t = LakeTable(spark, lake_root)
    t.create(SCHEMA, num_buckets=4)
    assert t.current_snapshot().properties["bucket_hash"] == "murmur3"
    # simulate a table written by a hypothetical xxhash64-bucketing build
    with open(os.path.join(t.meta_dir, "_current")) as f:
        name = f.read().strip()
    mpath = os.path.join(t.meta_dir, name)
    with open(mpath) as f:
        manifest = json.load(f)
    manifest["properties"]["bucket_hash"] = "xxhash64"
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    with pytest.raises(BucketHashMismatchError, match="xxhash64"):
        t.read()
