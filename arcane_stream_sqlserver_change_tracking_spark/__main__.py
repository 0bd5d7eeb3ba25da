"""CLI entry point — the ``spark-submit`` surface.

Production launch (multi-executor cluster)::

    spark-submit --master <cluster> \\
        --py-files arcane_stream_sqlserver_change_tracking_spark.zip \\
        -m arcane_stream_sqlserver_change_tracking_spark \\
        --mode stream --table /lake/transcripts --landing /lake/changelog

Local replay of a synthetic feed::

    python -m arcane_stream_sqlserver_change_tracking_spark \\
        --mode replay --table /tmp/t --events 1000000 --bootstrap

Modes (reference graph modes, SURVEY.md §3):

* ``replay``   — drain a changelog (synthetic or parquet path) in
  micro-batches until caught up, then exit (batch-replay twin of the
  poll loop).
* ``stream``   — continuous Structured-Streaming tail of a landing
  directory of parquet change files (``--trigger-seconds`` cadence,
  checkpointed, exactly-once).
* ``backfill`` — full-reload snapshot apply (``--behavior
  overwrite|merge``), then exit (STREAMCONTEXT__BACKFILL analog).
* ``maintain`` — one maintenance pass (compact / expire / orphans).
* ``poll``     — one CHANGETABLE poll tick over live JDBC
  (``--jdbc-url --source-schema --source-table --pk``): read net
  changes since the committed watermark through ``sources.mssql`` and
  apply them; run under cron/k8s at the reference's
  ``changeCaptureInterval`` cadence.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import types as T


def _payload_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )


def main(argv: list[str] | None = None) -> int:
    from .plans.lake import LakeTable
    from .sources.changelog import synth_transcripts_changelog
    from .streaming.runner import CdcEngine, EngineOptions
    from .streaming.stream import changelog_file_stream, run_stream

    ap = argparse.ArgumentParser(prog="arcane_stream_sqlserver_change_tracking_spark")
    ap.add_argument("--mode",
                    choices=["replay", "stream", "backfill", "maintain", "poll"],
                    required=True)
    ap.add_argument("--table", required=True, help="lake table root path")
    ap.add_argument("--changelog", help="parquet path of the changelog (replay/backfill)")
    ap.add_argument("--landing", help="landing dir tailed in stream mode")
    ap.add_argument("--checkpoint", help="stream checkpoint dir (default <table>/_stream_ckpt)")
    ap.add_argument("--events", type=int, default=0,
                    help="replay a synthetic feed of this many events instead of --changelog")
    ap.add_argument("--bootstrap", action="store_true",
                    help="create the table + epoch watermark if absent")
    # spec-overridable knobs default to None (= "not given"): an explicit
    # CLI flag always wins, the spec fills the rest, hard defaults last.
    # (Presence tests on raw argv break on '--behavior=merge' and argparse
    # prefix abbreviation — sentinel defaults are the reliable signal.)
    ap.add_argument("--num-buckets", type=int, default=None)
    ap.add_argument("--max-events-per-batch", type=int, default=None)
    ap.add_argument("--behavior", choices=["overwrite", "merge"], default=None)
    ap.add_argument("--shards", type=int, default=1,
                    help="backfill mode: >1 stages the reload as this many "
                         "restartable bucket-sliced shards (resume skips "
                         "completed shards)")
    ap.add_argument("--trigger-seconds", type=int, default=None,
                    help="changeCaptureInterval analog (stream mode)")
    ap.add_argument("--available-now", action="store_true",
                    help="stream mode: drain available input then stop")
    ap.add_argument("--jdbc-url", help="poll mode: SQL Server JDBC url")
    ap.add_argument("--source-schema", default=None,
                    help="poll mode source schema (default: spec's "
                         "schemaName, else dbo)")
    ap.add_argument("--source-table")
    ap.add_argument("--pk", default="conv_id,turn_idx",
                    help="poll mode: comma-separated PK columns")
    ap.add_argument("--payload-columns", default="role,text,tool,ts",
                    help="poll mode: comma-separated non-PK columns")
    ap.add_argument("--fetch-size", type=int, default=None)
    ap.add_argument("--spec", help="path to a reference-shaped stream spec "
                                   "JSON (the STREAMCONTEXT__SPEC body); "
                                   "engine options derive from it")
    ap.add_argument("--spec-env", action="store_true",
                    help="read the spec from $STREAMCONTEXT__SPEC (+ "
                         "STREAMCONTEXT__STREAM_ID / __BACKFILL), the "
                         "reference's boot path")
    ap.add_argument("--statsd", help="statsd collector: host:port or "
                                     "unix:///path (DogStatsD datagrams, "
                                     "tagged with the spec's metricTags)")
    args = ap.parse_args(argv)

    import dataclasses
    import os

    from .session import build_session

    # spec problems are operator input errors: exit 2 with the CRD path
    # (SpecError message) or the IO/JSON failure, never a stack trace
    from .config import SpecError

    cfg = None
    try:
        if args.spec_env:
            from .config import load_spec_from_env

            cfg = load_spec_from_env()
        elif args.spec:
            from .config import spec_to_config

            with open(args.spec) as f:
                cfg = spec_to_config(json.load(f))
    except SpecError as e:
        ap.error(f"invalid spec: {e}")
    except OSError as e:
        ap.error(f"cannot read spec file {args.spec!r}: {e}")
    except json.JSONDecodeError as e:
        ap.error(f"spec file {args.spec!r} is not valid JSON: {e}")

    # launcher-owned session: spark-submit's master/parallelism/local
    # dirs are untouched (standalone=False); engine confs + the hadoop
    # side-car fixes come from the shared factory — one conf list, no
    # drift between CLI and library sessions
    spark = build_session(
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "96")
        ),
        standalone=False,
    )
    table = LakeTable(spark, args.table)
    if cfg is not None:
        # spec-derived options; explicit CLI flags win over the spec
        overrides: dict = {"normalize_text_columns": ("text",)}
        if args.num_buckets is not None:
            overrides["num_buckets"] = args.num_buckets
        if args.max_events_per_batch is not None:
            overrides["max_events_per_batch"] = args.max_events_per_batch
        options = dataclasses.replace(cfg.options, **overrides)
    else:
        options = EngineOptions(
            num_buckets=args.num_buckets or 32,
            max_events_per_batch=args.max_events_per_batch or 500_000,
            normalize_text_columns=("text",),
        )
    emitters = []
    if args.statsd:
        from .streaming.metrics import StatsdEmitter

        emitters.append(StatsdEmitter(
            args.statsd,
            global_tags=cfg.metric_tags if cfg is not None else {},
        ))
    eng = CdcEngine(spark, table, options, emitters=emitters)
    if args.bootstrap and not table.exists():
        # spec's targetTableProperties reach the created table; the
        # merge key's bloom filter is an engine invariant (merge probes
        # key it), so spec columns ADD to it rather than replace it
        props = None
        if cfg is not None and cfg.parquet_bloom_filter_columns:
            from .functions.keys import MERGE_KEY_COL, normalize_column_name

            # spec names are SOURCE column names; the lake stores
            # normalized names (every batch runs normalize_column_names),
            # and create() validates the property against the schema
            props = {
                "parquet_bloom_filter_columns": sorted(
                    {normalize_column_name(c)
                     for c in cfg.parquet_bloom_filter_columns}
                    | {MERGE_KEY_COL}
                )
            }
        eng.bootstrap(_payload_schema(), properties=props)

    mode = args.mode
    if cfg is not None and cfg.backfill and mode in ("replay", "stream"):
        # STREAMCONTEXT__BACKFILL=true turns the same launch into a
        # backfill run (reference justfile:46-49: the env flag, not the
        # command, selects the mode)
        print(json.dumps({"notice": "STREAMCONTEXT__BACKFILL=true -> backfill mode"}))
        mode = "backfill"

    def _changelog():
        if args.events:
            return synth_transcripts_changelog(spark, args.events, with_tool=True)
        if not args.changelog:
            ap.error("--changelog or --events required")
        return spark.read.parquet(args.changelog)

    if mode == "replay":
        results = eng.run_incremental(_changelog())
        for r in results:
            print(json.dumps(vars(r)))
    elif mode == "backfill":
        behavior = args.behavior  # explicit flag wins (sentinel default)
        if behavior is None:
            behavior = cfg.backfill_behavior if cfg is not None else "overwrite"
        eng.backfill(_changelog(), behavior=behavior, shards=args.shards)
        print(json.dumps({"backfill": behavior,
                          "watermark": table.watermark()}))
    elif mode == "stream":
        if not args.landing:
            ap.error("--landing required in stream mode")
        schema = spark.read.parquet(args.landing).schema
        stream = changelog_file_stream(spark, args.landing, schema)
        ckpt = args.checkpoint or f"{args.table}/_stream_ckpt"
        if cfg is not None:
            # spec-driven streaming: changeCaptureInterval + per-stream
            # seeded jitter become the processingTime trigger (an
            # explicit --trigger-seconds still overrides the interval)
            from .streaming.stream import run_stream_from_spec

            q = run_stream_from_spec(
                eng, stream, ckpt, cfg,
                available_now=args.available_now,
                trigger_override_seconds=args.trigger_seconds,
            )
        else:
            trigger = 15 if args.trigger_seconds is None else args.trigger_seconds
            q = run_stream(
                eng, stream, ckpt,
                processing_time=None if args.available_now else f"{trigger} seconds",
                available_now=args.available_now,
            )
        q.awaitTermination()
    elif mode == "maintain":
        eng.run_maintenance()
        print(json.dumps(table.analyze(
            included_columns=cfg.analyze_included_columns if cfg is not None else None
        )))
    elif mode == "poll":
        from .sources.mssql import MsSqlSource

        # spec's source block fills anything the CLI left out
        source_table = args.source_table or (
            cfg.source.table_name if cfg is not None else None
        )
        source_schema = args.source_schema  # explicit flag wins
        if source_schema is None:
            source_schema = (
                cfg.source.schema_name if cfg is not None else None
            ) or "dbo"
        fetch = args.fetch_size
        if fetch is None:
            fetch = cfg.source.fetch_size if cfg is not None else 256
        if not (args.jdbc_url and source_table):
            ap.error("--jdbc-url and --source-table (or a spec with "
                     "source.table) required in poll mode")
        src = MsSqlSource(
            url=args.jdbc_url,
            schema_name=source_schema,
            table_name=source_table,
            pk_columns=tuple(c for c in args.pk.split(",") if c),
            payload_columns=tuple(c for c in args.payload_columns.split(",") if c),
            fetch_size=fetch,
        )
        wm = eng.current_watermark()
        # retention guard: a watermark older than the server's min valid
        # version means truncated change rows — fail (route to backfill)
        # instead of silently applying an incomplete feed
        src.check_retention(spark, wm)
        log = src.read_changes(spark, from_version=wm)
        results = eng.run_incremental(log)
        for r in results:
            print(json.dumps(vars(r)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
