"""T2 throughput shapers: schema-driven row-size estimate, sigmoid
chunk cost vs free memory, CRD variant selection, and the engine wiring
(memoryBound shaper shrinks the chunk size under memory pressure)."""

import pytest
from pyspark.sql import types as T

from arcane_stream_sqlserver_change_tracking_spark.streaming.shaper import (
    MemoryBoundShaper,
    StaticShaper,
    build_shaper,
    estimate_row_bytes,
)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("blob", T.BinaryType()),
    ]
)


def test_row_bytes_schema_estimate():
    # 50 + 4 + 50 + 8 + 4096 — CRD fallback/object estimates, no scan
    assert estimate_row_bytes(SCHEMA) == 50 + 4 + 50 + 8 + 4096
    assert estimate_row_bytes(SCHEMA, fallback_string_size=500,
                              object_size=10) == 500 + 4 + 500 + 8 + 10


def test_static_shaper_is_identity():
    assert StaticShaper(123_456).advise(SCHEMA) == 123_456


def test_memory_bound_cost_monotone_and_capped():
    sh = MemoryBoundShaper(advised_chunk_size=10_000, chunk_cost_max=10,
                           chunk_cost_scale=4.0)
    row = 1000
    free = 1 * 1024**3
    costs = [sh.chunk_cost(rows, row, free)
             for rows in (1_000, 100_000, 1_000_000, 10_000_000)]
    assert costs == sorted(costs)          # monotone in chunk size
    assert 1 <= costs[0] and costs[-1] <= 10
    # overrunning free memory saturates at the cap
    assert sh.chunk_cost(10**9, row, free) == 10
    assert sh.chunk_cost(10, row, 0) == 10  # no budget → max cost


def test_memory_bound_advise_shrinks_under_pressure():
    plenty = MemoryBoundShaper(advised_chunk_size=100_000,
                               free_bytes_fn=lambda: 64 * 1024**3)
    tight = MemoryBoundShaper(advised_chunk_size=100_000, chunk_cost_scale=4.0,
                              free_bytes_fn=lambda: 8 * 1024**2)
    assert plenty.advise(SCHEMA) == 100_000  # cost 1: advised passes through
    shaped = tight.advise(SCHEMA)
    assert 1 <= shaped < 100_000             # shrunk, never zero


def test_build_shaper_variants():
    assert isinstance(build_shaper("static", 10), StaticShaper)
    assert isinstance(build_shaper("memoryBound", 10), MemoryBoundShaper)
    with pytest.raises(ValueError, match="unknown shaper"):
        build_shaper("adaptive", 10)


def test_spec_selects_shaper_variant():
    from arcane_stream_sqlserver_change_tracking_spark.config import (
        SpecError,
        spec_to_config,
    )

    cfg = spec_to_config({"throughput": {
        "advisedChunkSize": 5000,
        "shaperImpl": {"static": None, "memoryBound": {"chunkCostMax": 10}},
    }})
    assert cfg.options.shaper_impl == "memoryBound"  # the non-null variant
    cfg = spec_to_config({"throughput": {"advisedChunkSize": 5000}})
    assert cfg.options.shaper_impl == "static"
    with pytest.raises(SpecError, match=r"throughput\.shaperImpl"):
        spec_to_config({"throughput": {
            "advisedChunkSize": 5000,
            "shaperImpl": {"warp": {}},
        }})


def test_engine_memory_bound_wiring(spark, lake_root, monkeypatch):
    """run_incremental under shaper_impl=memoryBound: with a tiny free-
    memory budget the advised chunk is divided by the sigmoid cost, so
    the same feed lands in MORE batches — and the final state is
    identical (chunking never changes semantics)."""
    import os

    import arcane_stream_sqlserver_change_tracking_spark.streaming.shaper as shaper_mod
    from arcane_stream_sqlserver_change_tracking_spark.functions.keys import (
        OPERATION_COL,
        VERSION_COL,
    )
    from arcane_stream_sqlserver_change_tracking_spark.plans.lake import LakeTable
    from arcane_stream_sqlserver_change_tracking_spark.streaming.runner import (
        CdcEngine,
        EngineOptions,
    )

    monkeypatch.setattr(shaper_mod, "proc_mem_available", lambda: 1024)

    payload = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    log = spark.createDataFrame(
        [(i + 1, "U", f"k{i % 40}", i) for i in range(400)],
        f"{VERSION_COL} long, {OPERATION_COL} string, k string, v long",
    )

    def run(impl, sub):
        t = LakeTable(spark, os.path.join(lake_root, sub))
        eng = CdcEngine(
            spark, t,
            EngineOptions(key_columns=("k",), num_buckets=4,
                          max_events_per_batch=400, shaper_impl=impl),
        )
        eng.bootstrap(payload)
        results = eng.run_incremental(log)
        return t, results

    t_static, r_static = run("static", "st")
    t_shaped, r_shaped = run("memoryBound", "mb")
    assert len(r_static) == 1                  # advised chunk swallows all
    assert len(r_shaped) > len(r_static)       # pressure → smaller chunks
    final = lambda t: {(r["k"], r["v"]) for r in t.read().select("k", "v").collect()}
    assert final(t_static) == final(t_shaped)


def test_engine_rechunks_when_memory_frees_mid_drain(spark, lake_root):
    """ADVICE r4: the CRD contract is that memoryBound UPDATES
    throughput with available memory — not a one-shot sizing before the
    whole backlog is planned. Free memory starts tight (small chunks),
    then frees right after the plan: the engine re-advises between
    batches and re-plans the remaining backlog into bigger chunks, so
    the drain finishes in far fewer batches — with identical final
    state (chunking never changes semantics)."""
    import os

    from arcane_stream_sqlserver_change_tracking_spark.functions.keys import (
        OPERATION_COL,
        VERSION_COL,
    )
    from arcane_stream_sqlserver_change_tracking_spark.plans.lake import LakeTable
    from arcane_stream_sqlserver_change_tracking_spark.streaming.runner import (
        CdcEngine,
        EngineOptions,
    )

    payload = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    log = spark.createDataFrame(
        [(i + 1, "U", f"k{i % 40}", i) for i in range(400)],
        f"{VERSION_COL} long, {OPERATION_COL} string, k string, v long",
    )

    calls = {"n": 0}

    def free_bytes():  # tight at plan time, plentiful from then on
        calls["n"] += 1
        return 1024 if calls["n"] == 1 else 64 * 1024**3

    def run(params, sub):
        t = LakeTable(spark, os.path.join(lake_root, sub))
        eng = CdcEngine(
            spark, t,
            EngineOptions(key_columns=("k",), num_buckets=4,
                          max_events_per_batch=400,
                          shaper_impl="memoryBound", shaper_params=params),
        )
        eng.bootstrap(payload)
        return t, eng.run_incremental(log)

    t_tight, r_tight = run({"free_bytes_fn": lambda: 1024}, "tight")
    calls["n"] = 0
    t_freed, r_freed = run({"free_bytes_fn": free_bytes}, "freed")
    assert len(r_tight) >= 4                  # sustained pressure: many chunks
    assert 1 < len(r_freed) < len(r_tight)    # re-advise merged the tail
    final = lambda t: {(r["k"], r["v"]) for r in t.read().select("k", "v").collect()}
    assert final(t_tight) == final(t_freed)
