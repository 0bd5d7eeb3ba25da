"""S3/S4 — the SQL Server Change Tracking source adapter: CHANGETABLE
query generation + partitioned JDBC reads + raw-feed normalization.

This is the surface the reference exists for: tailing SQL Server's
``CHANGETABLE(CHANGES schema.table, @version)`` over JDBC with a
fetch-size cursor and sharded full reloads for backfill. Reference
behavior pinned by:

* source table + PK + ``enable change_tracking`` DDL —
  src/test/scala/tests/integration/Fixtures.scala:28-40;
* ``CHANGE_TRACKING_CURRENT_VERSION()`` as the watermark source —
  src/test/scala/tests/common/Common.scala:110-119;
* essential metadata fields ``sys_change_version, sys_change_operation,
  changetrackingversion`` — .helm/templates/crd-microsoft-sql-server-stream.yaml:417-421;
* ``fetchSize`` (default 256) for cursor advancement —
  crd-microsoft-sql-server-stream.yaml:500-504;
* sharded backfill (parallel shard reads of the base table) —
  integration-tests.sql:8-24, main.scala:95-98.

Spark-first mapping: the reference's hand-rolled cursor/shard machinery
becomes declarative ``spark.read.format("jdbc")`` options — ``fetchSize``
for the cursor, ``partitionColumn/lowerBound/upperBound/numPartitions``
for parallel sharded reads (each Spark task opens its own cursor over a
range slice — the idiomatic form of the reference's shard tables).

No live SQL Server (or JDBC driver jar) ships in this sandbox, so the
layer is split for testability exactly at the network boundary:

* query/option **builders** are pure functions (unit-tested against the
  expected SQL and option dicts);
* :func:`to_changelog` adapts a raw CHANGETABLE result set — however it
  arrives (live JDBC or a parquet fixture in the same shape) — to the
  engine's changelog contract, and is correctness-gated end-to-end by
  the ``mssql_changetable_feed`` driver query against a DuckDB oracle;
* :func:`read_changes` / :func:`read_backfill` compose the two and are
  the thin, config-translation-only live path.

CHANGETABLE semantics worth pinning (public SQL Server CT contract):
the feed is already NET per key since ``@from_version`` (at most one row
per PK), the PK columns come from ``ct`` (present even for deletes), and
payload columns come from the LEFT JOIN against the base table — NULL
for deleted keys. That is precisely the engine's changelog shape
(sources/changelog.py), so downstream dedup handles the multi-poll
overlap case and MERGE branches only on D.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.keys import (
    OPERATION_COL,
    VERSION_COL,
    normalize_column_names,
)

#: raw metadata column names as SQL Server returns them
RAW_VERSION_COL = "SYS_CHANGE_VERSION"
RAW_OPERATION_COL = "SYS_CHANGE_OPERATION"
RAW_CT_CURRENT_COL = "ChangeTrackingVersion"


def _bq(name: str) -> str:
    """Bracket-quote a SQL Server identifier."""
    return f"[{name}]"


class ChangeTrackingRetentionError(RuntimeError):
    """The stored watermark predates CHANGE_TRACKING_MIN_VALID_VERSION:
    SQL Server's CT retention has truncated change rows the stream never
    consumed, so CHANGETABLE(CHANGES …, @watermark) would silently
    return an INCOMPLETE feed and the replica would diverge. The only
    correct recovery is a full backfill (S4), which re-reads the base
    table and re-captures the version."""


def validate_watermark_retention(
    from_version: int, min_valid_version: Any
) -> None:
    """Pure retention guard (unit-testable without a live server).
    ``min_valid_version`` is NULL when change tracking is not enabled on
    the table — also fatal, since the feed query would fail anyway."""
    if min_valid_version is None:
        raise ChangeTrackingRetentionError(
            "CHANGE_TRACKING_MIN_VALID_VERSION returned NULL — change "
            "tracking is not enabled on the source table"
        )
    if int(from_version) < int(min_valid_version):
        raise ChangeTrackingRetentionError(
            f"stored watermark {int(from_version)} is below the server's "
            f"min valid version {int(min_valid_version)}: the change log "
            f"was truncated by CT retention; run a backfill "
            f"(--mode backfill) to resynchronize"
        )


@dataclass
class MsSqlSource:
    """Connection + entity config for one change-tracked source table
    (CRD ``spec.source``: connection url, schemaName, tableName,
    fetchSize — crd-microsoft-sql-server-stream.yaml:480-504)."""

    url: str                      # jdbc:sqlserver://host:1433;...
    schema_name: str              # e.g. "dbo"
    table_name: str
    pk_columns: tuple[str, ...]   # change-tracking requires a PK
    payload_columns: tuple[str, ...] = ()  # non-PK columns to project
    fetch_size: int = 256         # CRD default, crd yaml:500-504
    command_timeout_seconds: int = 3600
    extra_jdbc_options: dict[str, str] = field(default_factory=dict)

    # ------------------------------------------------------------------
    # SQL generation (pure, unit-testable)
    # ------------------------------------------------------------------
    @property
    def qualified_table(self) -> str:
        return f"{_bq(self.schema_name)}.{_bq(self.table_name)}"

    def changes_query(self, from_version: int) -> str:
        """The incremental poll: net changes per key since
        ``from_version``, PK from CHANGETABLE, payload LEFT-JOINed from
        the base table (NULL for deletes), plus the server's current CT
        version stamped on every row (the ``changetrackingversion``
        essential field, crd yaml:417-421)."""
        pk_sel = ", ".join(f"ct.{_bq(c)}" for c in self.pk_columns)
        payload_sel = ", ".join(f"t.{_bq(c)}" for c in self.payload_columns)
        cols = ", ".join(x for x in (
            f"ct.{_bq(RAW_VERSION_COL)}",
            f"ct.{_bq(RAW_OPERATION_COL)}",
            pk_sel,
            payload_sel,
            f"CHANGE_TRACKING_CURRENT_VERSION() AS {_bq(RAW_CT_CURRENT_COL)}",
        ) if x)
        on = " AND ".join(
            f"ct.{_bq(c)} = t.{_bq(c)}" for c in self.pk_columns
        )
        return (
            f"SELECT {cols} "
            f"FROM CHANGETABLE(CHANGES {self.qualified_table}, {int(from_version)}) AS ct "
            f"LEFT JOIN {self.qualified_table} AS t ON {on}"
        )

    def current_version_query(self) -> str:
        """Watermark source — Common.scala:110-119."""
        return "SELECT CHANGE_TRACKING_CURRENT_VERSION() AS VALUE"

    def min_valid_version_query(self) -> str:
        """Retention guard: a stored watermark below this means the
        change log was truncated and a backfill is required (SQL Server
        CT retention, integration-tests.sql:4 ``CHANGE_RETENTION``)."""
        return (
            "SELECT CHANGE_TRACKING_MIN_VALID_VERSION("
            f"OBJECT_ID('{self.schema_name}.{self.table_name}')) AS VALUE"
        )

    def backfill_query(self) -> str:
        """Full-reload projection of the base table (S4). The capture
        version is read BEFORE this scan starts (current_version_query)
        so change capture resumes without a gap."""
        cols = ", ".join(
            _bq(c) for c in (*self.pk_columns, *self.payload_columns)
        )
        return f"SELECT {cols} FROM {self.qualified_table}"

    def backfill_shard_query(
        self,
        partition_column: str,
        lo: int,
        hi: int,
        last_shard: bool = False,
    ) -> str:
        """Range-sliced full-reload query for ONE restartable shard:
        ``WHERE pcol >= lo AND pcol < hi`` (``<=`` on the last shard).
        A plain index-range predicate the server can seek — unlike a
        hash-of-key shard filter, which would force a full table scan
        PER SHARD. Resuming a crashed reload therefore re-reads only
        the unfinished slices, never the whole table."""
        op_hi = "<=" if last_shard else "<"
        return (
            f"{self.backfill_query()} "
            f"WHERE {_bq(partition_column)} >= {int(lo)} "
            f"AND {_bq(partition_column)} {op_hi} {int(hi)}"
        )

    def backfill_shard_plan(
        self,
        shards: int,
        bounds: tuple[int, int],
        partition_column: str | None = None,
        partitions_per_shard: int = 8,
    ) -> list[dict[str, str]]:
        """Pure planning half of :meth:`read_backfill_shards` (unit-
        testable without a server): one JDBC option dict per shard.
        ``shards`` disjoint range slices of ``partition_column``
        (default: first PK column), each itself a
        ``partitions_per_shard``-way parallel range read."""
        pcol = partition_column or self.pk_columns[0]
        lo, hi = int(bounds[0]), int(bounds[1])
        span = hi - lo + 1
        edges = [lo + (span * i) // shards for i in range(shards)] + [hi]
        plans: list[dict[str, str]] = []
        for i in range(shards):
            last = i == shards - 1
            s_lo, s_hi = edges[i], edges[i + 1]
            sql = self.backfill_shard_query(pcol, s_lo, s_hi, last_shard=last)
            plans.append(
                self.jdbc_options(
                    sql,
                    partition_column=pcol,
                    lower_bound=s_lo,
                    upper_bound=max(s_lo + 1, s_hi),
                    num_partitions=partitions_per_shard,
                )
            )
        return plans

    def read_backfill_shards(
        self,
        spark: SparkSession,
        shards: int,
        bounds: tuple[int, int],
        partition_column: str | None = None,
        partitions_per_shard: int = 8,
    ) -> list[DataFrame]:
        """The source side of a RESTARTABLE 100 TB reload. Feed the list
        to ``CdcEngine.backfill(..., shard_parts=...)`` — shard k's
        completion is persisted, so a crash resumes at the first
        unfinished slice and re-issues ONLY that slice's server-side
        range query (see :meth:`backfill_shard_query`).

        Keys never span shards: the slice column is part of the PK, so
        every key's rows live in exactly one slice and per-shard
        staging/dedup is globally correct."""
        return [
            spark.read.format("jdbc").options(**opts).load()
            for opts in self.backfill_shard_plan(
                shards, bounds, partition_column, partitions_per_shard
            )
        ]

    # ------------------------------------------------------------------
    # JDBC option construction (pure, unit-testable)
    # ------------------------------------------------------------------
    def jdbc_options(
        self,
        sql: str,
        partition_column: str | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
        num_partitions: int | None = None,
    ) -> dict[str, str]:
        """The exact option dict handed to ``spark.read.format("jdbc")``.

        ``fetchSize`` maps the reference's cursor advancement size (crd
        yaml:500-504). When partitioning bounds are given, Spark opens
        ``numPartitions`` parallel cursors over disjoint range slices —
        the declarative form of the reference's shard tables
        (integration-tests.sql:8-24)."""
        opts: dict[str, str] = {
            "url": self.url,
            "dbtable": f"({sql}) AS arcane_src",
            "fetchsize": str(self.fetch_size),
            "queryTimeout": str(self.command_timeout_seconds),
        }
        if partition_column is not None:
            if lower_bound is None or upper_bound is None or not num_partitions:
                raise ValueError(
                    "partitioned read requires lower_bound, upper_bound "
                    "and num_partitions"
                )
            opts.update(
                partitionColumn=partition_column,
                lowerBound=str(int(lower_bound)),
                upperBound=str(int(upper_bound)),
                numPartitions=str(int(num_partitions)),
            )
        opts.update(self.extra_jdbc_options)
        return opts

    # ------------------------------------------------------------------
    # live read paths (thin composition over the builders)
    # ------------------------------------------------------------------
    def read_changes(
        self,
        spark: SparkSession,
        from_version: int,
        num_partitions: int | None = None,
        version_bounds: tuple[int, int] | None = None,
    ) -> DataFrame:
        """Poll the change feed since ``from_version`` → engine
        changelog shape. Single-cursor by default (a poll batch is small
        relative to the table); pass ``num_partitions`` + the version
        bounds from the previous watermark / current version to shard a
        large catch-up read over SYS_CHANGE_VERSION ranges."""
        sql = self.changes_query(from_version)
        if num_partitions and version_bounds:
            opts = self.jdbc_options(
                sql,
                partition_column=RAW_VERSION_COL,
                lower_bound=version_bounds[0],
                upper_bound=version_bounds[1],
                num_partitions=num_partitions,
            )
        else:
            opts = self.jdbc_options(sql)
        raw = spark.read.format("jdbc").options(**opts).load()
        return to_changelog(raw)

    def read_backfill(
        self,
        spark: SparkSession,
        partition_column: str | None = None,
        bounds: tuple[int, int] | None = None,
        num_partitions: int = 16,
    ) -> DataFrame:
        """S4 sharded full reload: numPartitions parallel cursors over
        ``partition_column`` range slices (defaults to the first PK
        column). Feed the result to ``CdcEngine.backfill`` with the
        capture version read before this scan."""
        pcol = partition_column or self.pk_columns[0]
        sql = self.backfill_query()
        if bounds is None:
            opts = self.jdbc_options(sql)
        else:
            opts = self.jdbc_options(
                sql,
                partition_column=pcol,
                lower_bound=bounds[0],
                upper_bound=bounds[1],
                num_partitions=num_partitions,
            )
        return spark.read.format("jdbc").options(**opts).load()

    def scalar_query(self, spark: SparkSession, sql: str) -> Any:
        """Run a single-value query (current/min-valid version) through
        the same JDBC channel."""
        opts = self.jdbc_options(sql)
        row = spark.read.format("jdbc").options(**opts).load().collect()[0]
        return row[0]

    def check_retention(self, spark: SparkSession, from_version: int) -> None:
        """Fail fast before polling when CT retention has truncated past
        ``from_version`` (see :class:`ChangeTrackingRetentionError`) —
        without this guard CHANGETABLE silently under-reports and the
        replica diverges undetectably."""
        validate_watermark_retention(
            from_version,
            self.scalar_query(spark, self.min_valid_version_query()),
        )


def to_changelog(raw: DataFrame) -> DataFrame:
    """Adapt a raw CHANGETABLE(CHANGES) result set — live JDBC read or a
    fixture in the same shape — to the engine changelog contract:

    * column names normalized (``SYS_CHANGE_VERSION`` →
      ``sys_change_version``, special chars stripped — docs/crd.md:126-128,
      226-228, via functions/keys.normalize_column_names);
    * ``sys_change_version`` cast to long, operation uppercased to
      one of I/U/D;
    * the per-row ``changetrackingversion`` stamp retained if present
      (essential field) — it rides as an ordinary payload column.
    """
    df = normalize_column_names(raw)
    if VERSION_COL not in df.columns or OPERATION_COL not in df.columns:
        raise ValueError(
            f"raw change feed must carry {RAW_VERSION_COL} and "
            f"{RAW_OPERATION_COL}; got {raw.columns}"
        )
    return df.withColumn(
        VERSION_COL, F.col(VERSION_COL).cast("long")
    ).withColumn(OPERATION_COL, F.upper(F.col(OPERATION_COL)))


def simulate_changetable_result(
    events: DataFrame, num_keys_mod: int = 40
) -> DataFrame:
    """Deterministically derive a *raw* CHANGETABLE(CHANGES)-shaped
    result set from the driver ``events`` table — uppercase SYS_CHANGE_*
    metadata, bracket-unfriendly source column names (``Id``, ``Name$``),
    NULL payload for deletes, per-row ChangeTrackingVersion stamp. This
    is the parquet-fixture stand-in for a live cursor: everything
    downstream of the network boundary (to_changelog → dedup → replay)
    runs exactly as it would against SQL Server, and a DuckDB oracle
    reproduces it (entry_queries.SQL_MSSQL_FEED)."""
    op = (
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U"))
    )
    not_del = op != "D"
    rows = events.select(
        (F.col("event_id") + F.lit(1)).alias(RAW_VERSION_COL),
        op.alias(RAW_OPERATION_COL),
        F.pmod(F.col("user_id"), F.lit(num_keys_mod)).alias("Id"),
        F.when(not_del, F.concat(F.lit("name-"), F.col("event_type"))).alias("Name$"),
        F.when(not_del, F.col("value")).alias("Value"),
    )
    # per-row current-version stamp: 1-row aggregate broadcast onto every
    # row (no global window — that would collapse to a single partition)
    cur = events.agg((F.max("event_id") + F.lit(1)).alias(RAW_CT_CURRENT_COL))
    return rows.crossJoin(F.broadcast(cur))
