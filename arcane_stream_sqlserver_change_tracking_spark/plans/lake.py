"""LakeTable — a minimal transactional, snapshot-based table format on
parquet, playing the role Iceberg plays for the reference (K1/K2 sinks,
main.scala:75,80-84). No Iceberg runtime jar ships in this sandbox, so
the engine provides the same guarantees itself:

* **atomic commits** — a snapshot is a JSON manifest listing immutable
  parquet data files; the table's current state is a single pointer file
  replaced with ``os.replace`` (atomic on POSIX). Readers see either the
  old or the new snapshot, never a torn state. Mirrors Iceberg's
  metadata-pointer swap.
* **bucket partitioning on the merge key** — every data file belongs to
  one bucket of ``pmod(murmur3(arcane_merge_key), num_buckets)`` (Spark's
  ``F.hash``, the same function hashpartitioning uses — see
  functions/keys.bucket_expr for why that alignment matters); the hash
  function NAME is recorded in table properties and validated on open,
  so a table written under a different bucketing can never be silently
  merged into (see ``BucketHashMismatchError``);
  mirrors the reference target's ``partitionExpressions:
  [bucket(arcane_merge_key, 10)]`` (docs/crd.md:115). A MERGE batch
  touching k buckets reads and rewrites ONLY those buckets — per-batch
  cost scales with batch locality, not table size. This is the property
  that keeps copy-on-write viable at 100 TB.
* **schema evolution with field ids** — additive-only, like the
  reference (SchemaMigrationTests.scala:160-251): added columns get new
  field ids; old data files simply lack the column and the reader
  null-pads them by applying the current schema to every file
  (``spark.read.schema(current).parquet(...)``).
* **snapshot log / time travel / expiry** — old snapshots stay readable
  until ``expire_snapshots``; orphan data files from crashed writes are
  swept by ``remove_orphan_files`` (reference K5/K7 semantics,
  docs/crd.md:45-48,136-172).
* **watermark in the commit** — the CDC version watermark and
  per-partition lineage are properties of the snapshot, so
  "merge applied" and "watermark advanced" are one atomic event; this
  is what makes replay-after-crash exactly-once (reference commits the
  watermark *after* the merge and relies on MERGE idempotence for the
  crash window, StreamRunner.scala:250-258 — we strengthen it to a
  single atomic commit).

Layout::

    <root>/metadata/v00000042.json   # snapshot manifests
    <root>/metadata/_current         # pointer: name of current manifest
    <root>/data/part-s42-b0007-*.parquet
    <root>/.staging/...              # in-flight writes (never referenced)
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.keys import BUCKET_HASH_NAME, MERGE_KEY_COL, bucket_expr

_BUCKET = "__bucket"


class BucketHashMismatchError(RuntimeError):
    """The table on disk was bucketed with a different hash function than
    this engine version writes — merging would silently duplicate keys
    (touched-bucket pruning would miss their existing rows)."""


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    schema: T.StructType
    files: list[dict[str, Any]]  # {"path": rel, "bucket": int, "rows": int, "bytes": int}
    properties: dict[str, Any] = field(default_factory=dict)
    watermark: dict[str, Any] | None = None
    lineage: list[dict[str, Any]] = field(default_factory=list)
    timestamp_ms: int = 0

    def to_json(self) -> str:
        return json.dumps(
            {
                "format_version": 1,
                "snapshot_id": self.snapshot_id,
                "parent_id": self.parent_id,
                "schema": json.loads(self.schema.json()),
                "files": self.files,
                "properties": self.properties,
                "watermark": self.watermark,
                "lineage": self.lineage,
                "timestamp_ms": self.timestamp_ms,
            },
            indent=1,
        )

    @staticmethod
    def from_json(text: str) -> "Snapshot":
        d = json.loads(text)
        return Snapshot(
            snapshot_id=d["snapshot_id"],
            parent_id=d.get("parent_id"),
            schema=T.StructType.fromJson(d["schema"]),
            files=d["files"],
            properties=d.get("properties", {}),
            watermark=d.get("watermark"),
            lineage=d.get("lineage", []),
            timestamp_ms=d.get("timestamp_ms", 0),
        )


class LakeTable:
    """One transactional bucket-partitioned table rooted at ``root``."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)
        self.meta_dir = os.path.join(self.root, "metadata")
        self.data_dir = os.path.join(self.root, "data")
        self.staging_dir = os.path.join(self.root, ".staging")

    # ------------------------------------------------------------------
    # metadata plumbing
    # ------------------------------------------------------------------
    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.meta_dir, "_current"))

    def _manifest_name(self, snapshot_id: int) -> str:
        return f"v{snapshot_id:08d}.json"

    def current_snapshot(self) -> Snapshot | None:
        pointer = os.path.join(self.meta_dir, "_current")
        if not os.path.exists(pointer):
            return None
        with open(pointer) as f:
            name = f.read().strip()
        with open(os.path.join(self.meta_dir, name)) as f:
            return Snapshot.from_json(f.read())

    def snapshot(self, snapshot_id: int) -> Snapshot:
        with open(os.path.join(self.meta_dir, self._manifest_name(snapshot_id))) as f:
            return Snapshot.from_json(f.read())

    def snapshot_log(self) -> list[int]:
        if not os.path.isdir(self.meta_dir):
            return []
        ids = []
        for name in os.listdir(self.meta_dir):
            if name.startswith("v") and name.endswith(".json"):
                ids.append(int(name[1:-5]))
        return sorted(ids)

    def _commit(self, snap: Snapshot) -> Snapshot:
        """Write manifest then atomically swing the pointer."""
        os.makedirs(self.meta_dir, exist_ok=True)
        snap.timestamp_ms = int(time.time() * 1000)
        name = self._manifest_name(snap.snapshot_id)
        path = os.path.join(self.meta_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(snap.to_json())
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        ptmp = os.path.join(self.meta_dir, "_current.tmp")
        with open(ptmp, "w") as f:
            f.write(name)
            f.flush()
            os.fsync(f.fileno())
        os.replace(ptmp, os.path.join(self.meta_dir, "_current"))
        return snap

    # ------------------------------------------------------------------
    # table lifecycle
    # ------------------------------------------------------------------
    def create(
        self,
        schema: T.StructType,
        num_buckets: int = 32,
        key_columns: list[str] | None = None,
        properties: dict[str, Any] | None = None,
        watermark: dict[str, Any] | None = None,
    ) -> Snapshot:
        if self.exists():
            raise FileExistsError(f"table already exists at {self.root}")
        if MERGE_KEY_COL not in schema.fieldNames():
            raise ValueError(f"schema must contain {MERGE_KEY_COL}")
        props = {
            "num_buckets": num_buckets,
            "bucket_hash": BUCKET_HASH_NAME,
            "key_columns": key_columns or [],
            "max_field_id": len(schema.fields),
            "field_ids": {f.name: i + 1 for i, f in enumerate(schema.fields)},
        }
        props.update(properties or {})
        os.makedirs(self.data_dir, exist_ok=True)
        snap = Snapshot(
            snapshot_id=0, parent_id=None, schema=schema, files=[],
            properties=props, watermark=watermark,
        )
        return self._commit(snap)

    @property
    def num_buckets(self) -> int:
        return int(self._require().properties["num_buckets"])

    def _require(self) -> Snapshot:
        snap = self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"no such table: {self.root}")
        recorded = snap.properties.get("bucket_hash", BUCKET_HASH_NAME)
        if recorded != BUCKET_HASH_NAME:
            raise BucketHashMismatchError(
                f"table {self.root} was bucketed with {recorded!r} but this "
                f"engine writes {BUCKET_HASH_NAME!r}; rewrite the table "
                f"(backfill overwrite) before merging into it"
            )
        return snap

    def schema(self) -> T.StructType:
        return self._require().schema

    def watermark(self) -> dict[str, Any] | None:
        return self._require().watermark

    # ------------------------------------------------------------------
    # read path
    # ------------------------------------------------------------------
    def read(
        self,
        buckets: list[int] | None = None,
        snapshot_id: int | None = None,
    ) -> DataFrame:
        """Scan the table (optionally bucket-pruned / time-travel).

        Every file is read with the *current* snapshot schema applied, so
        files written before a column was added null-pad it — the same
        read-time evolution Iceberg performs via field ids.
        """
        snap = self._require() if snapshot_id is None else self.snapshot(snapshot_id)
        files = snap.files
        if buckets is not None:
            wanted = set(buckets)
            files = [f for f in files if f["bucket"] in wanted]
        if not files:
            return self.spark.createDataFrame([], snap.schema)
        paths = [os.path.join(self.root, f["path"]) for f in files]
        return self.spark.read.schema(snap.schema).parquet(*paths)

    # ------------------------------------------------------------------
    # write path
    # ------------------------------------------------------------------
    def _write_data_files(
        self,
        df: DataFrame,
        snapshot_id: int,
        max_rows_per_file: int | None = None,
        sort_within: list[str] | None = None,
        shuffle: bool = True,
    ) -> list[dict[str, Any]]:
        """Write ``df`` (must match the table schema) into per-bucket
        parquet files under ``.staging``, then move them into ``data/``.
        Returns manifest file entries. Nothing is visible until commit.

        ``shuffle=True``: hash-repartition by bucket first (one shuffle)
        — for new/incoming rows whose partitioning is unrelated to the
        bucket layout. ``shuffle=False``: rows that came FROM per-bucket
        table files are already bucket-clustered, so we only sort within
        partitions and let the partitioned writer fan out — rewriting a
        bucket during MERGE then moves ZERO table data across the
        network (the difference between shuffling MBs and TBs per batch
        at 100 TB). Optionally sorted within partitions (reference
        ``sortedBy`` write order, docs/crd.md:117-119) and capped at
        ``max_rows_per_file`` rows (reference staging ``maxRowsPerFile``,
        CRD:72-75).
        """
        return self._write_parts(
            [(df, not shuffle)], snapshot_id, max_rows_per_file, sort_within
        )

    def _write_parts(
        self,
        parts: list[tuple[DataFrame, bool]],
        snapshot_id: int,
        max_rows_per_file: int | None = None,
        sort_within: list[str] | None = None,
    ) -> list[dict[str, Any]]:
        """One write job for any mix of aligned/unaligned parts: each
        unaligned part is bucket-repartitioned, aligned parts pass
        through, and the union (a narrow op — partitions concatenate)
        feeds a single partitioned write."""
        nb = self.num_buckets
        shaped = []
        for df, aligned in parts:
            d = df.withColumn(_BUCKET, bucket_expr(MERGE_KEY_COL, nb))
            if not aligned:
                d = d.repartition(F.col(_BUCKET))
            shaped.append(d)
        out = shaped[0]
        for d in shaped[1:]:
            out = out.unionByName(d)
        # cluster by bucket inside each task so the partitioned writer
        # keeps one open file at a time
        out = out.sortWithinPartitions(_BUCKET, *(sort_within or []))
        stage = os.path.join(self.staging_dir, f"s{snapshot_id:08d}-{uuid.uuid4().hex[:8]}")
        writer = out.write.mode("overwrite")
        if max_rows_per_file:
            writer = writer.option("maxRecordsPerFile", str(max_rows_per_file))
        writer.partitionBy(_BUCKET).parquet(stage)

        entries: list[dict[str, Any]] = []
        os.makedirs(self.data_dir, exist_ok=True)
        for dirname in sorted(os.listdir(stage)):
            if not dirname.startswith(f"{_BUCKET}="):
                continue
            bucket = int(dirname.split("=", 1)[1])
            bdir = os.path.join(stage, dirname)
            for i, fname in enumerate(sorted(os.listdir(bdir))):
                if not fname.endswith(".parquet"):
                    continue
                src = os.path.join(bdir, fname)
                new_name = (
                    f"part-s{snapshot_id:08d}-b{bucket:05d}-"
                    f"{uuid.uuid4().hex[:12]}-{i:04d}.parquet"
                )
                dst = os.path.join(self.data_dir, new_name)
                nbytes = os.path.getsize(src)
                os.replace(src, dst)
                entries.append(
                    {"path": f"data/{new_name}", "bucket": bucket, "bytes": nbytes}
                )
        shutil.rmtree(stage, ignore_errors=True)
        # row counts from parquet footers — cheap, no data scan
        self._attach_row_counts(entries)
        return entries

    def _attach_row_counts(self, entries: list[dict[str, Any]]) -> None:
        import pyarrow.parquet as pq

        for e in entries:
            e["rows"] = pq.ParquetFile(os.path.join(self.root, e["path"])).metadata.num_rows

    def overwrite(
        self,
        df: DataFrame,
        watermark: dict[str, Any] | None = None,
        lineage: list[dict[str, Any]] | None = None,
        max_rows_per_file: int | None = None,
        sort_within: list[str] | None = None,
    ) -> Snapshot:
        """Replace the entire table content atomically (backfill
        ``backfillBehavior: Overwrite``, CRD:116-118)."""
        snap = self._require()
        new_id = snap.snapshot_id + 1
        entries = self._write_data_files(df, new_id, max_rows_per_file, sort_within)
        new = Snapshot(
            snapshot_id=new_id, parent_id=snap.snapshot_id, schema=snap.schema,
            files=entries, properties=dict(snap.properties),
            watermark=watermark if watermark is not None else snap.watermark,
            lineage=lineage or [],
        )
        return self._commit(new)

    def replace_buckets(
        self,
        df: DataFrame | None = None,
        buckets: list[int] | None = None,
        watermark: dict[str, Any] | None = None,
        lineage: list[dict[str, Any]] | None = None,
        schema: T.StructType | None = None,
        properties_update: dict[str, Any] | None = None,
        max_rows_per_file: int | None = None,
        sort_within: list[str] | None = None,
        parts: list[tuple[DataFrame, bool]] | None = None,
    ) -> Snapshot:
        """Commit a copy-on-write replacement of the given buckets:
        keep every file outside ``buckets``, swap in the new files for
        the touched ones. This is the physical form of MERGE.

        Content comes either from ``df`` (shuffled by bucket) or from
        ``parts`` — a list of ``(dataframe, aligned)`` pairs written
        into the same snapshot; ``aligned=True`` parts (rows re-read
        from this table's own per-bucket files, e.g. the retained side
        of a MERGE) skip the bucket shuffle entirely."""
        snap = self._require()
        new_id = snap.snapshot_id + 1
        props = dict(snap.properties)
        new_schema = snap.schema
        if schema is not None and schema.json() != snap.schema.json():
            # additive evolution: assign field ids to new columns
            field_ids = dict(props.get("field_ids", {}))
            max_id = int(props.get("max_field_id", len(field_ids)))
            for f in schema.fields:
                if f.name not in field_ids:
                    max_id += 1
                    field_ids[f.name] = max_id
            props["field_ids"] = field_ids
            props["max_field_id"] = max_id
            new_schema = schema
        if properties_update:
            props.update(properties_update)
        entries = self._write_parts(
            parts if parts is not None else [(df, False)],
            new_id, max_rows_per_file, sort_within,
        )
        touched = set(buckets or [])
        kept = [f for f in snap.files if f["bucket"] not in touched]
        new = Snapshot(
            snapshot_id=new_id, parent_id=snap.snapshot_id,
            schema=new_schema, files=kept + entries, properties=props,
            watermark=watermark if watermark is not None else snap.watermark,
            lineage=lineage or [],
        )
        return self._commit(new)

    def append(
        self,
        df: DataFrame,
        watermark: dict[str, Any] | None = None,
        lineage: list[dict[str, Any]] | None = None,
        max_rows_per_file: int | None = None,
        sort_within: list[str] | None = None,
    ) -> Snapshot:
        snap = self._require()
        new_id = snap.snapshot_id + 1
        entries = self._write_data_files(df, new_id, max_rows_per_file, sort_within)
        new = Snapshot(
            snapshot_id=new_id, parent_id=snap.snapshot_id, schema=snap.schema,
            files=snap.files + entries, properties=dict(snap.properties),
            watermark=watermark if watermark is not None else snap.watermark,
            lineage=lineage or [],
        )
        return self._commit(new)

    def set_watermark(self, watermark: dict[str, Any]) -> Snapshot:
        """Metadata-only commit that (re)sets the watermark — used to
        prepare the epoch watermark, mirroring ``MsSqlWatermark.epoch``
        preparation in StreamRunner.scala:188-192."""
        snap = self._require()
        new = Snapshot(
            snapshot_id=snap.snapshot_id + 1, parent_id=snap.snapshot_id,
            schema=snap.schema, files=snap.files, properties=dict(snap.properties),
            watermark=watermark, lineage=snap.lineage,
        )
        return self._commit(new)

    # ------------------------------------------------------------------
    # maintenance (reference K7: OPTIMIZE / expire_snapshots /
    # remove_orphan_files, docs/crd.md:136-172)
    # ------------------------------------------------------------------
    def rewrite_data_files(
        self, file_size_threshold_bytes: int = 512 * 1024 * 1024,
        min_files_per_bucket: int = 2,
    ) -> Snapshot | None:
        """Compact buckets that have ≥ min_files_per_bucket files below
        the size threshold (reference OPTIMIZE, 512MB default,
        stream-context-yaml-example.yaml:49-52)."""
        snap = self._require()
        by_bucket: dict[int, list[dict[str, Any]]] = {}
        for f in snap.files:
            by_bucket.setdefault(f["bucket"], []).append(f)
        targets = [
            b for b, fs in by_bucket.items()
            if len([f for f in fs if f.get("bytes", 0) < file_size_threshold_bytes])
            >= min_files_per_bucket
        ]
        if not targets:
            return None
        compacted = self.read(buckets=targets)
        return self.replace_buckets(compacted, targets, lineage=[
            {"maintenance": "rewrite_data_files", "buckets": sorted(targets)}
        ])

    def expire_snapshots(self, keep_last: int = 5) -> list[str]:
        """Drop old snapshot manifests and delete data files only
        referenced by them. Returns deleted file paths."""
        log = self.snapshot_log()
        keep = set(log[-keep_last:]) if keep_last else set(log)
        cur = self._require().snapshot_id
        keep.add(cur)
        live: set[str] = set()
        for sid in keep:
            for f in self.snapshot(sid).files:
                live.add(f["path"])
        deleted: list[str] = []
        for sid in log:
            if sid in keep:
                continue
            for f in self.snapshot(sid).files:
                if f["path"] not in live:
                    p = os.path.join(self.root, f["path"])
                    if os.path.exists(p):
                        os.remove(p)
                        deleted.append(f["path"])
            os.remove(os.path.join(self.meta_dir, self._manifest_name(sid)))
        return deleted

    def remove_orphan_files(self) -> list[str]:
        """Delete data files not referenced by any retained snapshot
        (e.g. left by a crash between write and commit) and stale
        staging dirs — the reference sweeps stale staging tables at
        stream start (docs/crd.md:45-48)."""
        live: set[str] = set()
        for sid in self.snapshot_log():
            for f in self.snapshot(sid).files:
                live.add(f["path"])
        deleted: list[str] = []
        if os.path.isdir(self.data_dir):
            for name in os.listdir(self.data_dir):
                rel = f"data/{name}"
                if rel not in live:
                    os.remove(os.path.join(self.data_dir, name))
                    deleted.append(rel)
        shutil.rmtree(self.staging_dir, ignore_errors=True)
        return deleted

    def analyze(self) -> dict[str, Any]:
        """Table statistics (reference ANALYZE, docs/crd.md:168-172):
        row/byte/file counts per bucket from manifest metadata — no scan."""
        snap = self._require()
        stats = {
            "snapshot_id": snap.snapshot_id,
            "files": len(snap.files),
            "rows": sum(f.get("rows", 0) for f in snap.files),
            "bytes": sum(f.get("bytes", 0) for f in snap.files),
            "buckets": len({f["bucket"] for f in snap.files}),
        }
        new = Snapshot(
            snapshot_id=snap.snapshot_id + 1, parent_id=snap.snapshot_id,
            schema=snap.schema, files=snap.files,
            properties={**snap.properties, "stats": stats},
            watermark=snap.watermark, lineage=snap.lineage,
        )
        self._commit(new)
        return stats
