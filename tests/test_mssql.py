"""S3/S4 — the SQL Server CHANGETABLE/JDBC source adapter: generated
SQL, JDBC option dicts (fetchSize, sharded-read partitioning), raw-feed
normalization, and the adapter feeding the real engine end-to-end.

No live SQL Server runs in this sandbox, so the network boundary is the
seam: builders are asserted against exact SQL/option expectations
(pinned by the reference CRD fetchSize contract and SQL Server's public
CHANGETABLE semantics), and everything downstream of the boundary runs
for real against a simulated CHANGETABLE result set."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arcane_stream_sqlserver_change_tracking_spark.functions.keys import (
    OPERATION_COL,
    VERSION_COL,
    with_merge_key,
)
from arcane_stream_sqlserver_change_tracking_spark.operators.dedup import (
    latest_change_per_key,
)
from arcane_stream_sqlserver_change_tracking_spark.plans.lake import LakeTable
from arcane_stream_sqlserver_change_tracking_spark.sources.mssql import (
    MsSqlSource,
    simulate_changetable_result,
    to_changelog,
)
from arcane_stream_sqlserver_change_tracking_spark.streaming.runner import (
    CdcEngine,
    EngineOptions,
)

SRC = MsSqlSource(
    url="jdbc:sqlserver://localhost:1433;databaseName=StreamRunnerTests;encrypt=false",
    schema_name="dbo",
    table_name="TestTable",
    pk_columns=("Id",),
    payload_columns=("Name",),
)


def test_changes_query_shape():
    sql = SRC.changes_query(from_version=42)
    assert sql == (
        "SELECT ct.[SYS_CHANGE_VERSION], ct.[SYS_CHANGE_OPERATION], "
        "ct.[Id], t.[Name], "
        "CHANGE_TRACKING_CURRENT_VERSION() AS [ChangeTrackingVersion] "
        "FROM CHANGETABLE(CHANGES [dbo].[TestTable], 42) AS ct "
        "LEFT JOIN [dbo].[TestTable] AS t ON ct.[Id] = t.[Id]"
    )


def test_changes_query_composite_pk():
    src = MsSqlSource(
        url="jdbc:x", schema_name="dbo", table_name="T",
        pk_columns=("A", "B"), payload_columns=("C",),
    )
    sql = src.changes_query(0)
    assert "ct.[A], ct.[B], t.[C]" in sql
    assert "ON ct.[A] = t.[A] AND ct.[B] = t.[B]" in sql


def test_version_queries():
    assert SRC.current_version_query() == (
        "SELECT CHANGE_TRACKING_CURRENT_VERSION() AS VALUE"
    )
    assert SRC.min_valid_version_query() == (
        "SELECT CHANGE_TRACKING_MIN_VALID_VERSION("
        "OBJECT_ID('dbo.TestTable')) AS VALUE"
    )


def test_backfill_query():
    assert SRC.backfill_query() == "SELECT [Id], [Name] FROM [dbo].[TestTable]"


def test_jdbc_options_fetchsize_default():
    opts = SRC.jdbc_options("SELECT 1")
    # CRD default fetchSize=256 (crd-microsoft-sql-server-stream.yaml:500-504)
    assert opts["fetchsize"] == "256"
    assert opts["dbtable"] == "(SELECT 1) AS arcane_src"
    assert opts["url"].startswith("jdbc:sqlserver://")


def test_jdbc_options_sharded_backfill():
    """S4: the sharded parallel reload is Spark JDBC range partitioning —
    each of numPartitions tasks opens its own cursor over a PK slice
    (the declarative twin of the reference's shard tables,
    integration-tests.sql:8-24)."""
    opts = SRC.jdbc_options(
        SRC.backfill_query(),
        partition_column="Id", lower_bound=0, upper_bound=1_000_000,
        num_partitions=16,
    )
    assert opts["partitionColumn"] == "Id"
    assert opts["lowerBound"] == "0"
    assert opts["upperBound"] == "1000000"
    assert opts["numPartitions"] == "16"


def test_jdbc_options_partial_partitioning_rejected():
    with pytest.raises(ValueError, match="partitioned read requires"):
        SRC.jdbc_options("SELECT 1", partition_column="Id")


def test_to_changelog_normalizes_raw_feed(spark):
    raw = spark.createDataFrame(
        [(5, "U", 1, "alice"), (6, "D", 2, None)],
        T.StructType([
            T.StructField("SYS_CHANGE_VERSION", T.IntegerType()),
            T.StructField("SYS_CHANGE_OPERATION", T.StringType()),
            T.StructField("Id", T.IntegerType()),
            T.StructField("Name$", T.StringType()),
        ]),
    )
    log = to_changelog(raw)
    assert log.columns == [VERSION_COL, OPERATION_COL, "Id", "Name"]
    assert dict(log.dtypes)[VERSION_COL] == "bigint"
    rows = {r["Id"]: r for r in log.collect()}
    assert rows[1][VERSION_COL] == 5 and rows[1]["Name"] == "alice"
    assert rows[2][OPERATION_COL] == "D" and rows[2]["Name"] is None


def test_to_changelog_rejects_feed_without_metadata(spark):
    raw = spark.createDataFrame([(1,)], "Id int")
    with pytest.raises(ValueError, match="SYS_CHANGE_VERSION"):
        to_changelog(raw)


def test_adapter_feeds_engine_end_to_end(spark, lake_root, sf_dir):
    """Simulated CHANGETABLE result set → to_changelog → the real engine
    (bootstrap, micro-batches, merge commits) — final state must equal
    the one-shot net-change replay of the same feed."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    log = to_changelog(simulate_changetable_result(events))

    table = LakeTable(spark, f"{lake_root}/t")
    eng = CdcEngine(
        spark, table,
        EngineOptions(key_columns=("Id",), num_buckets=8,
                      max_events_per_batch=400),
    )
    payload = T.StructType([
        T.StructField("Id", T.LongType()),
        T.StructField("Name", T.StringType()),
        T.StructField("Value", T.DoubleType()),
        T.StructField("changetrackingversion", T.LongType()),
    ])
    eng.bootstrap(payload)
    results = eng.run_incremental(log)
    assert len(results) > 1  # multi-batch replay actually exercised

    expected = (
        latest_change_per_key(with_merge_key(log, ["Id"]))
        .filter(F.col(OPERATION_COL) != "D")
        .select("Id", "Name", "Value")
    )
    got = eng.current_state().select("Id", "Name", "Value")
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_retention_guard():
    """Watermark below CHANGE_TRACKING_MIN_VALID_VERSION (or CT disabled
    → NULL) must fail fast instead of silently applying an incomplete
    CHANGETABLE feed."""
    from arcane_stream_sqlserver_change_tracking_spark.sources.mssql import (
        ChangeTrackingRetentionError,
        validate_watermark_retention,
    )

    validate_watermark_retention(100, 100)   # exactly at the edge: ok
    validate_watermark_retention(101, 100)
    with pytest.raises(ChangeTrackingRetentionError, match="truncated"):
        validate_watermark_retention(99, 100)
    with pytest.raises(ChangeTrackingRetentionError, match="not enabled"):
        validate_watermark_retention(99, None)


def test_backfill_shard_query_range_predicate():
    src = SRC
    sql = src.backfill_shard_query("id", 100, 200)
    assert sql.endswith('WHERE [id] >= 100 AND [id] < 200')
    last = src.backfill_shard_query("id", 200, 300, last_shard=True)
    assert last.endswith('WHERE [id] >= 200 AND [id] <= 300')
    # the range predicate composes onto the full projection
    assert sql.startswith(src.backfill_query())


def test_backfill_shard_plan_slices_cover_range_disjointly():
    src = SRC
    plans = src.backfill_shard_plan(4, (0, 1003), partitions_per_shard=8)
    assert len(plans) == 4
    # adjacent half-open slices: shard i's hi == shard i+1's lo; last
    # shard inclusive of the upper bound
    bounds = []
    for i, p in enumerate(plans):
        sql = p["dbtable"]
        assert p["numPartitions"] == "8"
        assert f">= {p['lowerBound']}" in sql
        bounds.append((int(p["lowerBound"]), int(p["upperBound"])))
    assert bounds[0][0] == 0
    for (lo_a, _), (lo_b, _) in zip(bounds, bounds[1:]):
        assert lo_a < lo_b
    assert "<= 1003" in plans[-1]["dbtable"]
    assert "< 1003" not in plans[-1]["dbtable"]
