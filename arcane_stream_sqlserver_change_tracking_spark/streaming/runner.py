"""T5/T4/K3/K4 — the stream runner: bootstrap → resume → per-batch apply
→ commit(watermark+lineage), plus backfill and maintenance cadence.

Mirrors the reference graph (main.scala:69-117; SURVEY.md §3.1):

    source poll (version > watermark)            -> sources/incremental.py
    -> throughput shaping (max_events_per_batch) -> version_chunks
    -> field filtering                            -> operators/fields.py
    -> text normalization (Arrow pandas UDF)      -> functions/text.py
    -> merge-key synthesis + salted dedup         -> functions/keys.py, operators/dedup.py
    -> schema migration (additive)                -> operators/schema_evolution.py
    -> MERGE (bucket-pruned copy-on-write)        -> operators/merge.py + plans/lake.py
    -> watermark + per-partition lineage COMMIT   -> plans/lake.py (atomic)
    -> maintenance every N batches                -> plans/lake.py

Exactly-once: the watermark is a property of the same atomic snapshot
commit that publishes the merged files, so a crash at any point leaves
either (old files, old watermark) or (new files, new watermark) — a
re-run re-selects `version > watermark` and cannot double-apply. The
reference gets the same end state via idempotent MERGE + post-commit
watermark write (StreamRunner.scala:250-258); we strengthen the window.

Fail-fast resume contract: running against a table whose watermark was
never prepared raises ``WatermarkNotSetError("Invalid watermark value:
'null'")`` exactly like the reference (StreamRunner.scala:167-185);
``bootstrap()`` prepares the epoch watermark like ``MsSqlWatermark.epoch``
(StreamRunner.scala:188-192).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.keys import (
    MERGE_KEY_COL,
    OPERATION_COL,
    VERSION_COL,
    bucket_expr,
    normalize_column_names,
    with_merge_key,
)
from ..functions.text import normalize_text, normalize_text_expr
from ..operators.dedup import latest_change_per_key
from ..operators.fields import FieldFilter
from ..operators.merge import plan_merge
from ..operators.schema_evolution import diff_schemas
from ..plans.lake import CommitConflictError, LakeTable
from ..sources.incremental import chunk_filter, incremental_read, version_chunks

_BUCKET = "__b"

#: system columns never promoted into the evolving payload schema
SYSTEM_COLS = (VERSION_COL, OPERATION_COL, MERGE_KEY_COL, _BUCKET)


class WatermarkNotSetError(RuntimeError):
    pass


@dataclass
class EngineOptions:
    key_columns: tuple[str, ...] = ("conv_id", "turn_idx")
    num_buckets: int = 32
    max_events_per_batch: int = 500_000          # rowsPerGroup analog (quickstart.md:66)
    dedup_strategy: str = "agg"   # see operators/dedup.py — partial agg
                                  # gives the salted bound with 1 shuffle
    num_salts: int = 16
    normalize_text_columns: tuple[str, ...] = ()  # e.g. ("text",)
    normalize_impl: str = "expr"  # "expr" (JVM codegen) | "pandas" (Arrow UDF, adds NFC)
    field_filter: FieldFilter = field(default_factory=FieldFilter)
    broadcast_threshold_rows: int = 2_000_000     # batch keys broadcast below this
    merge_join: str = "auto"      # "auto": broadcast the batch key set
                                  # below broadcast_threshold_rows, else
                                  # shuffle; "broadcast"/"shuffle" force.
                                  # Broadcast keeps the touched-bucket
                                  # rewrite shuffle-free (table data
                                  # never crosses the network — the
                                  # 100 TB default); shuffle avoids
                                  # shipping a large key set to every
                                  # executor but Exchanges the touched
                                  # buckets' full content per batch —
                                  # only sensible when batches are huge
                                  # relative to the table
    max_rows_per_file: int = 1_000_000            # maxRowsPerFile analog (CRD:72-75)
    sort_within: tuple[str, ...] = ()             # sortedBy analog (docs/crd.md:117-119)
    maintenance_interval_batches: int = 60        # reference default (yaml-example:49-52)
    # targetAnalyzeSettings parity: run ANALYZE every N applied batches
    # ([] = all schema columns, None = manifest counts only — lake.analyze)
    analyze_interval_batches: "int | None" = None
    analyze_included_columns: "list | None" = None
    compact_file_threshold_bytes: int = 512 * 1024 * 1024
    expire_keep_last: int = 20
    # K3 retry policy (CRD:181-211): retry merge on transient errors
    retry_max_attempts: int = 3
    retry_base_seconds: float = 0.1
    retry_scale_factor: float = 2.0
    retry_on_message_contents: tuple[str, ...] = ()
    retry_mode: str = "never"     # reference queryRetryMode (CRD:195-210,
                                  # default never): "never" | "always" |
                                  # "backfillOnly". Gates the COMMIT-
                                  # CONFLICT re-plan loop: a loser of an
                                  # optimistic-concurrency race re-reads
                                  # the table and re-applies the staged
                                  # batch (dedup result stays cached —
                                  # only the anti-join + write re-run)
                                  # up to retry_max_attempts
    orphan_min_age_seconds: float = 3600.0  # in-flight guard for the
                                  # orphan sweep: rename-free writes put
                                  # uncommitted files on disk, so only
                                  # old ones are sweep-eligible
    cache_batches: bool = True    # persist() each deduped batch: the
                                  # stats job and the merge-write job
                                  # share it (measured ~20% faster than
                                  # recompute-with-shuffle-reuse)
    shaper_impl: str = "static"   # T2 throughput.shaperImpl (CRD beta:433-470):
                                  # "static" (chunk = max_events_per_batch,
                                  # the advised baseline) | "memoryBound"
                                  # (sigmoid chunk-cost vs free memory,
                                  # streaming/shaper.py)
    shaper_params: "dict | None" = None  # memoryBound body (chunkCostMax,
                                  # tableSizeWeight, ... — spec_to_config
                                  # maps CRD camelCase to shaper kwargs);
                                  # None/{} = CRD defaults
    cache_serialized: bool = False  # serialized (lz4) cache blocks:
                                  # ~5-10x smaller heap footprint per
                                  # batch, pays ser/deser CPU — for
                                  # memory-pressured executors
    pipeline_batches: bool = True  # overlap batch k+1 staging with
                                   # batch k's commit (run_incremental)
    expectations: tuple = ()       # data-quality admission control
                                   # (operators/quality_gate.py rule
                                   # dicts): evaluated per batch on the
                                   # PREPARED rows (post-filter/dedup —
                                   # the gate guards what would LAND);
                                   # any violation raises
                                   # ExpectationError BEFORE the write,
                                   # table + watermark untouched — the
                                   # same fail-fast philosophy as K4's
                                   # watermark contract. One extra agg
                                   # over the cached batch when set.


@dataclass
class BatchResult:
    batch_seq: int
    rows_in: int
    rows_deduped: int
    max_version: int
    touched_buckets: int
    apply_seconds: float
    skipped: bool = False
    prepare_seconds: float = 0.0   # dedup/normalize + bucket stats job
    commit_seconds: float = 0.0    # merge write + atomic commit


class CdcEngine:
    def __init__(self, spark: SparkSession, table: LakeTable,
                 options: EngineOptions | None = None,
                 emitters: "list | None" = None):
        self.spark = spark
        self.table = table
        self.opts = options or EngineOptions()
        self.metrics: list[BatchResult] = []
        #: pluggable metric sinks (streaming/metrics.py) — statsd
        #: UDP/UDS, jsonl, callback; reference DeclaredMetrics →
        #: DataDog.UdsPublisher (main.scala:111,115-116)
        self.emitters = list(emitters or [])

    def _emit_metrics(self, result: BatchResult) -> None:
        """A2 parity (DeclaredMetrics/statsd publisher, main.scala:111,
        115-116): one JSON line per applied batch under the table root
        (the always-on local record), plus a fan-out to any configured
        emitters — statsd counters/gauges/timers with metricTags
        (docs/crd.md:33-37), see streaming/metrics.py."""
        path = os.path.join(self.table.root, "metrics.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps({"event": "batch_applied", **vars(result)}) + "\n")
        if self.emitters:
            from .metrics import emit_batch_result

            emit_batch_result(self.emitters, result)

    # ------------------------------------------------------------------
    # bootstrap (T5 DefaultStreamBootstrapper: ensure target + epoch wm)
    # ------------------------------------------------------------------
    def bootstrap(self, payload_schema: T.StructType, epoch_version: int = 0,
                  properties: "dict | None" = None) -> None:
        fields = list(payload_schema.fields)
        names = {f.name for f in fields}
        if MERGE_KEY_COL not in names:
            fields.append(T.StructField(MERGE_KEY_COL, T.StringType(), False))
        if VERSION_COL not in names:
            fields.append(T.StructField(VERSION_COL, T.LongType(), True))
        schema = T.StructType(fields)
        self.table.create(
            schema,
            num_buckets=self.opts.num_buckets,
            key_columns=list(self.opts.key_columns),
            properties=properties,
            watermark={"version": epoch_version, "batch_seq": 0, "partitions": []},
        )

    def current_watermark(self) -> int:
        wm = self.table.watermark()
        if wm is None or wm.get("version") is None:
            # exact reference failure message, StreamRunner.scala:183
            raise WatermarkNotSetError("Invalid watermark value: 'null'")
        return int(wm["version"])

    # ------------------------------------------------------------------
    # per-batch apply
    # ------------------------------------------------------------------
    def _prepare(self, batch: DataFrame, watermark_version: int = 0) -> DataFrame:
        """normalize names -> field filter -> merge key -> salted dedup
        -> text normalize -> bucket id. All lazily declared; one cached
        result per batch.

        Text normalization runs AFTER dedup on purpose: it is per-row
        deterministic, so normalizing only the surviving row per key is
        semantically identical and the Arrow batches (and the dedup
        shuffles before them) carry ~dup-factor× fewer rows."""
        df = normalize_column_names(batch)
        # stale-row guard: rows at or below the committed watermark are
        # already reflected in the table (batches apply in version
        # order), so a redelivered batch with PARTIAL overlap (shifted
        # boundaries after a crash) must not let an old version regress
        # a newer table row — batch-level skip alone can't catch that
        df = df.filter(F.col(VERSION_COL) > F.lit(watermark_version))
        df = self.opts.field_filter.apply(df)
        df = with_merge_key(df, list(self.opts.key_columns))
        df = latest_change_per_key(
            df,
            strategy=self.opts.dedup_strategy,
            num_salts=self.opts.num_salts,
        )
        norm = normalize_text if self.opts.normalize_impl == "pandas" else normalize_text_expr
        for c in self.opts.normalize_text_columns:
            if c in df.columns:
                df = df.withColumn(c, norm(F.col(c)))
        return df.withColumn(_BUCKET, bucket_expr(MERGE_KEY_COL, self.table.num_buckets))

    def _stage(self, batch: DataFrame, watermark_version: int):
        """Prepare a batch (dedup/normalize/bucket), cache it, and run
        the ONE stats job (touched buckets, per-bucket lineage, max
        version). Independent of table mutations, so the next batch can
        stage while the previous one commits (pipelined loop)."""
        deduped = self._prepare(batch, watermark_version=watermark_version)
        if self.opts.cache_batches:
            if self.opts.cache_serialized:
                from pyspark import StorageLevel

                deduped = deduped.persist(StorageLevel.MEMORY_AND_DISK)
            else:
                deduped = deduped.persist()
        try:
            if self.opts.expectations:
                from ..operators.quality_gate import enforce_expectations

                # tombstones never LAND (they delete), and the
                # CHANGETABLE contract nulls a D row's payload columns —
                # gating them would fail valid batches on not_null rules
                enforce_expectations(
                    deduped.filter(F.col(OPERATION_COL) != "D"),
                    list(self.opts.expectations))
            bucket_stats = (
                deduped.groupBy(_BUCKET)
                .agg(F.count("*").alias("rows"),
                     F.max(VERSION_COL).alias("last_version"))
                .collect()
            )
        except Exception:
            if self.opts.cache_batches:  # don't leak the cached batch
                deduped.unpersist()
            raise
        return deduped, bucket_stats

    def apply_batch(
        self,
        batch: DataFrame,
        batch_seq: int | None = None,
        in_backfill: bool = False,
    ) -> BatchResult:
        """Apply one micro-batch (the foreachBatch body)."""
        t0 = time.monotonic()
        wm = self.current_watermark()
        deduped, bucket_stats = self._stage(batch, wm)
        try:
            return self._apply_staged(deduped, bucket_stats, t0, batch_seq,
                                      staged_wm=wm, in_backfill=in_backfill)
        finally:
            if self.opts.cache_batches:
                deduped.unpersist()

    def _apply_staged(
        self,
        deduped: DataFrame,
        bucket_stats,
        t0: float,
        batch_seq: int | None = None,
        staged_wm: int | None = None,
        in_backfill: bool = False,
    ) -> BatchResult:
        """Apply a staged batch, re-planning on optimistic-concurrency
        conflicts when ``retry_mode`` allows: the loser of a commit race
        re-reads the table (fresh watermark, fresh touched-bucket
        content) and re-runs only the anti-join + write — the expensive
        dedup result is the cached ``deduped``. Mirrors the reference's
        queryRetryMode gating of merge retries (CRD:195-210)."""
        attempts = 0
        delay = self.opts.retry_base_seconds
        while True:
            try:
                return self._apply_staged_once(
                    deduped, bucket_stats, t0, batch_seq,
                    # first attempt trusts the staging-time stale-row
                    # guard (chunks are disjoint ascending ranges);
                    # a conflict means another writer advanced the
                    # table mid-flight, so retries re-guard
                    staged_wm if attempts else None,
                )
            except CommitConflictError:
                attempts += 1
                mode = self.opts.retry_mode
                retriable = mode == "always" or (
                    mode == "backfillOnly" and in_backfill
                )
                if not retriable or attempts >= self.opts.retry_max_attempts:
                    raise
                time.sleep(delay)
                delay *= self.opts.retry_scale_factor

    def _apply_staged_once(
        self,
        deduped: DataFrame,
        bucket_stats,
        t0: float,
        batch_seq: int | None = None,
        staged_wm: int | None = None,
    ) -> BatchResult:
        """``staged_wm`` non-None marks a conflict retry: the stale-row
        guard re-applies against the advanced watermark before
        re-planning.

        The whole plan (watermark, stale guard, anti-join read) is
        pinned to ONE base snapshot, and the commit validates against
        that same base — a concurrent writer landing anywhere between
        plan and commit turns this attempt into a CommitConflictError
        (handled by the ``_apply_staged`` re-plan loop) instead of a
        silent lost update."""
        base = self.table.current_snapshot()
        wm_rec = (base.watermark if base is not None else None) or {}
        if wm_rec.get("version") is None:
            # exact reference failure message, StreamRunner.scala:183
            raise WatermarkNotSetError("Invalid watermark value: 'null'")
        wm = int(wm_rec["version"])
        if staged_wm is not None and wm > staged_wm:
            # another writer advanced the table since this batch was
            # staged: rows now at or below the committed watermark are
            # already reflected and must not regress newer table rows —
            # re-apply the stale-row guard and refresh the bucket stats
            # (a cache-hit aggregation, not a recompute of the dedup)
            deduped = deduped.filter(F.col(VERSION_COL) > F.lit(wm))
            bucket_stats = (
                deduped.groupBy(_BUCKET)
                .agg(F.count("*").alias("rows"),
                     F.max(VERSION_COL).alias("last_version"))
                .collect()
            )
        seq = batch_seq if batch_seq is not None else int(wm_rec.get("batch_seq", 0)) + 1
        if not bucket_stats:
            result = BatchResult(seq, 0, 0, wm, 0, time.monotonic() - t0, skipped=True)
            self.metrics.append(result)
            self._emit_metrics(result)
            return result
        max_version = max(int(r["last_version"]) for r in bucket_stats)
        rows_deduped = sum(int(r["rows"]) for r in bucket_stats)
        if max_version <= wm:
            # idempotence guard: already applied (crash-replay window)
            result = BatchResult(seq, rows_deduped, rows_deduped, max_version, 0,
                                 time.monotonic() - t0, skipped=True)
            self.metrics.append(result)
            self._emit_metrics(result)
            return result
        touched = sorted(int(r[_BUCKET]) for r in bucket_stats)

        # schema migration (K6): diff batch payload vs table schema
        target_schema = self.table.schema()
        diff = diff_schemas(target_schema, deduped.schema, system_columns=SYSTEM_COLS)
        evolved = diff.evolved
        target_cols = [f.name for f in evolved.fields]

        existing = self.table.read(buckets=touched, snapshot_id=base.snapshot_id)
        if self.opts.merge_join == "auto":
            broadcast = rows_deduped <= self.opts.broadcast_threshold_rows
        else:
            broadcast = self.opts.merge_join == "broadcast"
        plan = plan_merge(existing, deduped, target_cols, broadcast_keys=broadcast)
        # enforce exact evolved types (lit(None) columns are NullType);
        # keep retained and upserts separate: retained rows come from
        # this table's own per-bucket files, so their write skips the
        # bucket shuffle (plans/lake.py _write_data_files aligned path)
        def _cast(df: DataFrame) -> DataFrame:
            return df.select(
                *[F.col(f.name).cast(f.dataType).alias(f.name) for f in evolved.fields]
            )
        retained_cast = _cast(plan.retained)
        upserts_cast = _cast(plan.upserts)

        # per-partition lineage (FIXTURES.md §3): bucket = the stable
        # partition identity; latency measured up to commit start
        pre_commit_ms = int((time.monotonic() - t0) * 1000)
        lineage = [
            {
                "partition_id": int(r[_BUCKET]),
                "last_version": int(r["last_version"]),
                "rows_applied": int(r["rows"]),
                "apply_latency_ms": pre_commit_ms,
            }
            for r in bucket_stats
        ]
        # upserts are ALSO bucket-aligned: the dedup shuffle hash-
        # partitioned them by merge key with Spark's murmur3 — the
        # same function bucket_expr uses — so each shuffle partition
        # holds whole buckets and the partitioned writer fans out
        # without another Exchange. Zero shuffles in the merge write.
        def do_commit():
            return self.table.replace_buckets(
                parts=[(retained_cast, True), (upserts_cast, True)],
                buckets=touched,
                schema=evolved if diff.changed else None,
                watermark={
                    "version": max_version,
                    "batch_seq": seq,
                    "partitions": lineage,
                },
                lineage=lineage,
                max_rows_per_file=self.opts.max_rows_per_file,
                sort_within=list(self.opts.sort_within) or None,
                base=base,
            )

        t_commit = time.monotonic()
        self._with_retry(do_commit)
        dt = time.monotonic() - t0
        result = BatchResult(
            batch_seq=seq, rows_in=rows_deduped, rows_deduped=rows_deduped,
            max_version=max_version, touched_buckets=len(touched), apply_seconds=dt,
            prepare_seconds=round(pre_commit_ms / 1000.0, 3),
            commit_seconds=round(time.monotonic() - t_commit, 3),
        )
        self.metrics.append(result)
        self._emit_metrics(result)
        return result

    def _with_retry(self, fn: Callable[[], Any]) -> Any:
        """K3 retry semantics: exponential backoff, retry only when the
        error message contains a configured substring (CRD:195-211)."""
        attempt = 0
        delay = self.opts.retry_base_seconds
        while True:
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 - policy-driven retry
                attempt += 1
                retriable = any(s in str(e) for s in self.opts.retry_on_message_contents)
                if not retriable or attempt >= self.opts.retry_max_attempts:
                    raise
                time.sleep(delay)
                delay *= self.opts.retry_scale_factor

    # ------------------------------------------------------------------
    # the loop (streaming replay mode)
    # ------------------------------------------------------------------
    def run_incremental(
        self,
        changelog: DataFrame,
        max_batches: int | None = None,
        maintenance: bool = True,
    ) -> list[BatchResult]:
        """Drain all pending changes (version > watermark) in
        count-balanced micro-batches. This is the batch-replay twin of
        the polling loop; call it per poll tick for continuous mode.

        The loop is PIPELINED when ``opts.pipeline_batches``: batch
        k+1's staging (dedup shuffle + cache + stats job — pure reads,
        independent of table state) runs on a helper thread while batch
        k's merge-write commits. Correct because chunks are disjoint
        ascending version ranges: every row of chunk k+1 is above any
        watermark chunk k can commit, so staging early with the
        pre-loop watermark filters identically. Commits stay strictly
        serial — the watermark sequence is untouched."""
        from concurrent.futures import ThreadPoolExecutor

        from .shaper import build_shaper

        wm = self.current_watermark()
        pending = incremental_read(normalize_column_names(changelog), wm)
        # T2 throughput shaper: static returns the advised baseline;
        # memoryBound scales it by schema-estimated row size vs free
        # memory, with the spec's memoryBound body as tuning (CRD
        # beta:446-478 via EngineOptions.shaper_params)
        shaper = build_shaper(
            self.opts.shaper_impl,
            self.opts.max_events_per_batch,
            **(self.opts.shaper_params or {}),
        )
        chunk_size = shaper.advise(pending.schema)
        chunks = version_chunks(pending, chunk_size)
        if max_batches is not None:
            chunks = chunks[:max_batches]
        results: list[BatchResult] = []
        if not chunks:
            return results

        def _rechunk(chunks: list, next_i: int, cur_size: int):
            """CRD contract: memoryBound "UPDATES throughput based on
            available free memory" — re-advise before each subsequent
            batch and re-plan the remaining backlog when the advised
            size moves materially (≥20% — chunk cost is a small
            integer, so real pressure changes are discrete jumps; the
            guard keeps stable-memory drains at zero extra agg jobs).
            Static shaper advises a constant: never re-plans."""
            if self.opts.shaper_impl == "static" or next_i >= len(chunks):
                return chunks, cur_size
            new_size = shaper.advise(pending.schema)
            if max(new_size, cur_size) < 1.2 * min(new_size, cur_size):
                return chunks, cur_size
            remaining = version_chunks(
                incremental_read(pending, chunks[next_i - 1][1]), new_size)
            chunks = chunks[:next_i] + remaining
            if max_batches is not None:
                chunks = chunks[:max_batches]
            return chunks, new_size

        if not self.opts.pipeline_batches or len(chunks) == 1:
            i = 0
            while i < len(chunks):
                res = self.apply_batch(chunk_filter(pending, *chunks[i]))
                results.append(res)
                if maintenance and res.batch_seq % self.opts.maintenance_interval_batches == 0:
                    self.run_maintenance()
                self._maybe_analyze(res)
                i += 1
                chunks, chunk_size = _rechunk(chunks, i, chunk_size)
            return results

        with ThreadPoolExecutor(max_workers=1) as ex:
            t0 = time.monotonic()
            fut = ex.submit(self._stage, chunk_filter(pending, *chunks[0]), wm)
            staged_pending = [fut]
            try:
                i = 0
                while i < len(chunks):
                    deduped, stats = staged_pending.pop(0).result()
                    t_batch = time.monotonic() if i else t0
                    # re-advise between batch i's staging and batch
                    # i+1's submit — the only point where the next
                    # chunk's bounds are still re-plannable
                    chunks, chunk_size = _rechunk(chunks, i + 1, chunk_size)
                    if i + 1 < len(chunks):
                        nxt = ex.submit(
                            self._stage, chunk_filter(pending, *chunks[i + 1]), wm
                        )
                        staged_pending.append(nxt)
                    try:
                        res = self._apply_staged(deduped, stats, t_batch,
                                                 staged_wm=wm)
                    finally:
                        if self.opts.cache_batches:
                            deduped.unpersist()
                    results.append(res)
                    if maintenance and res.batch_seq % self.opts.maintenance_interval_batches == 0:
                        self.run_maintenance()
                    self._maybe_analyze(res)
                    i += 1
            finally:
                for f in staged_pending:
                    try:
                        d, _ = f.result()
                        if self.opts.cache_batches:
                            d.unpersist()
                    except Exception:
                        pass
        return results

    # ------------------------------------------------------------------
    # backfill (T4)
    # ------------------------------------------------------------------
    def backfill(
        self,
        snapshot: DataFrame,
        behavior: str = "overwrite",
        capture_version: int | None = None,
        shards: int = 1,
        backfill_id: str | None = None,
        shard_parts: list[DataFrame] | None = None,
    ) -> None:
        """Full reload. ``overwrite`` replaces the table content
        (backfillBehavior: Overwrite, CRD:116-118); ``merge`` upserts the
        snapshot (Merge). The watermark is set to ``capture_version``
        (the source version captured before the backfill started) so
        change capture resumes without a gap — reference sequence
        stream→backfill→stream, StreamRunner.scala:196-258.

        ``shards > 1`` makes the overwrite RESTARTABLE (reference
        ShardStagingProcessor + DefaultBackfillStateManager,
        main.scala:94-101): the key space is split into ``shards``
        disjoint bucket slices, each staged as its own write job whose
        completion is persisted in the table's backfill state file. A
        crashed reload re-invoked with the same snapshot and shard count
        skips every completed shard — a 100 TB reload that dies at 99%
        redoes one shard, not the world — and the final publish is still
        ONE atomic commit, so readers never see a partial backfill.
        ``backfill_id`` defaults to a deterministic id derived from
        (capture_version, shards); pass an explicit id to disambiguate
        retries with a different source snapshot.

        ``shard_parts`` replaces the internal bucket-slice sharding with
        CALLER-provided shard DataFrames (one per shard, e.g.
        ``MsSqlSource.read_backfill_shards`` range slices). The internal
        slicing filters by a hash of the merge key — correct anywhere,
        but not pushable to a JDBC source, so each shard re-scans the
        whole source table server-side. Caller parts carry their own
        (range) predicates, which the source CAN seek — resuming a
        crashed 100 TB reload then re-reads only unfinished slices.
        Caller contract: parts are key-disjoint (every merge key's rows
        in exactly one part) and together cover the snapshot;
        ``snapshot`` is ignored when parts are given (pass any part).
        Only ``overwrite`` behavior supports parts."""

        def _prep(sdf: DataFrame) -> DataFrame:
            sdf = normalize_column_names(sdf)
            if OPERATION_COL not in sdf.columns:
                sdf = sdf.withColumn(OPERATION_COL, F.lit("I"))
            if VERSION_COL not in sdf.columns:
                sdf = sdf.withColumn(VERSION_COL, F.lit(0).cast("long"))
            return sdf

        if shard_parts is not None and behavior != "overwrite":
            raise ValueError("shard_parts requires behavior='overwrite'")
        df = _prep(shard_parts[0] if shard_parts else snapshot)
        if behavior == "merge":
            self.apply_batch(df, in_backfill=True)
            return
        if behavior != "overwrite":
            raise ValueError(f"unknown backfill behavior: {behavior!r}")
        wm_before = self.table.watermark() or {}
        df = with_merge_key(df, list(self.opts.key_columns))
        version = capture_version if capture_version is not None else int(wm_before.get("version", 0))
        watermark = {"version": version,
                     "batch_seq": int(wm_before.get("batch_seq", 0)) + 1,
                     "partitions": []}
        target_schema = self.table.schema()
        diff = diff_schemas(target_schema, df.schema, system_columns=SYSTEM_COLS)

        def _finalize(part: DataFrame) -> DataFrame:
            part = latest_change_per_key(part, strategy=self.opts.dedup_strategy,
                                         num_salts=self.opts.num_salts)
            part = part.filter(F.col(OPERATION_COL) != "D")
            return part.select(
                *[
                    (F.col(f.name) if f.name in part.columns else F.lit(None))
                    .cast(f.dataType).alias(f.name)
                    for f in diff.evolved.fields
                ]
            )

        if shard_parts is not None:
            # caller-sharded restartable reload: each part staged as its
            # own shard; source-pushable predicates make the resume path
            # re-read only unfinished slices (read_backfill_shards)
            bid = backfill_id or f"v{version}x{len(shard_parts)}"
            for shard, raw in enumerate(shard_parts):
                part = with_merge_key(_prep(raw), list(self.opts.key_columns))
                self.table.stage_backfill_shard(
                    _finalize(part), bid, shard, len(shard_parts),
                    max_rows_per_file=self.opts.max_rows_per_file,
                    sort_within=list(self.opts.sort_within) or None,
                )
            self.table.commit_backfill(
                bid, watermark=watermark,
                schema=diff.evolved if diff.changed else None,
            )
            return

        if shards <= 1:
            self.table.overwrite(
                _finalize(df),
                watermark=watermark,
                max_rows_per_file=self.opts.max_rows_per_file,
                sort_within=list(self.opts.sort_within) or None,
            )
            return

        # deterministic resume identity: same capture version + shard
        # count = same backfill. Shard i owns buckets ≡ i (mod shards) —
        # bucket slices partition the key space, so per-shard dedup is
        # globally correct and every staged file lands in a bucket the
        # final commit expects.
        bid = backfill_id or f"v{version}x{shards}"
        bucket = bucket_expr(MERGE_KEY_COL, self.table.num_buckets)
        for shard in range(shards):
            part = df.filter(F.pmod(bucket, F.lit(shards)) == F.lit(shard))
            self.table.stage_backfill_shard(
                _finalize(part), bid, shard, shards,
                max_rows_per_file=self.opts.max_rows_per_file,
                sort_within=list(self.opts.sort_within) or None,
            )
        self.table.commit_backfill(
            bid, watermark=watermark,
            schema=diff.evolved if diff.changed else None,
        )

    # ------------------------------------------------------------------
    # maintenance cadence (K7)
    # ------------------------------------------------------------------
    def run_maintenance(self) -> None:
        self.table.rewrite_data_files(
            file_size_threshold_bytes=self.opts.compact_file_threshold_bytes
        )
        self.table.expire_snapshots(keep_last=self.opts.expire_keep_last)
        self.table.remove_orphan_files(
            older_than_seconds=self.opts.orphan_min_age_seconds
        )

    def _maybe_analyze(self, res: BatchResult) -> None:
        """targetAnalyzeSettings cadence: ANALYZE every
        ``analyze_interval_batches`` applied batches (reference
        batchThreshold; docs/crd.md targetAnalyzeSettings)."""
        it = self.opts.analyze_interval_batches
        if it and not res.skipped and res.batch_seq % it == 0:
            self.table.analyze(
                included_columns=self.opts.analyze_included_columns
            )

    # ------------------------------------------------------------------
    # reading the replicated state
    # ------------------------------------------------------------------
    def current_state(self) -> DataFrame:
        return self.table.read()

    def state_at(self, snapshot_id: int) -> DataFrame:
        """Time travel: the replicated state as of an earlier commit."""
        return self.table.read(snapshot_id=snapshot_id)

    def lineage(self) -> dict[str, Any]:
        """Committed per-partition lineage (A2/K4): last applied
        version, row counts and apply latency per bucket, as persisted
        in the current snapshot's watermark."""
        wm = self.table.watermark() or {}
        return {
            "version": wm.get("version"),
            "batch_seq": wm.get("batch_seq"),
            "partitions": wm.get("partitions", []),
        }
