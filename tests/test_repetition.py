"""Repetition-quality statistics + stratified sampling / corpus mixing.

Hand-computed expectations on tiny literal documents, plan-shape
assertions (zero Exchange for the per-row statistics), and a DuckDB
cross-check of the sampling bucket function.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from arcane_stream_sqlserver_change_tracking_spark.functions.repetition import repetition_stats
from arcane_stream_sqlserver_change_tracking_spark.functions.sampling import (
    mix_corpus,
    split_bucket,
    stratified_sample,
)


def _stats(spark, text: str) -> dict:
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return repetition_stats(df).collect()[0].asDict()


def test_duplicate_lines_and_words(spark):
    # lines [a, a, b]: dup fraction 1/3; dup chars 2 of 3
    # words [a, a, b]: top word 'a' 2*1=2 of 3
    # 2-grams ['a a', 'a b']: best 3 of 6
    r = _stats(spark, "a\na\nb")
    assert r["dup_line_fraction"] == pytest.approx(0.333333)
    assert r["dup_line_char_fraction"] == pytest.approx(0.666667)
    assert r["top_word_char_fraction"] == pytest.approx(0.666667)
    assert r["top_2gram_char_fraction"] == pytest.approx(0.5)
    assert r["keep"] is False


def test_clean_document_keeps(spark):
    r = _stats(spark, "the quick brown fox\njumps over lazy dogs today")
    assert r["dup_line_fraction"] == 0.0
    assert r["dup_line_char_fraction"] == 0.0
    assert r["keep"] is True


def test_empty_and_whitespace_documents_are_zero(spark):
    for t in ("", "   \n \n  "):
        r = _stats(spark, t)
        assert r["dup_line_fraction"] == 0.0
        assert r["dup_line_char_fraction"] == 0.0
        assert r["top_word_char_fraction"] == 0.0
        assert r["top_2gram_char_fraction"] == 0.0
        assert r["keep"] is True


def test_repeated_ngram_boilerplate_flagged(spark):
    # 'click here' repeated dominates the 2-gram mass
    r = _stats(spark, "click here " * 20 + "unique tail words")
    assert r["top_2gram_char_fraction"] > 0.2
    assert r["keep"] is False


def test_case_folding_in_words(spark):
    r = _stats(spark, "Spam SPAM spam spAm")
    assert r["top_word_char_fraction"] == 1.0


def test_repetition_stats_is_zero_exchange(spark):
    df = spark.createDataFrame(
        [(i, f"line a\nline b {i}") for i in range(50)], "doc_id long, text string"
    )
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_sample_deterministic_and_exact(spark):
    rows = [(i, f"s{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"s0": 0.5, "s1": 1.0, "s2": 0.0}
    got = stratified_sample(df, rates).collect()
    # exact expectation recomputed with the documented bucket function
    bucket = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", split_bucket(F.col("doc_id")).alias("b")).collect()
    }
    expected = {
        i
        for i, s in rows
        if bucket[i] < {"s0": 5000, "s1": 10000, "s2": 0}.get(s, 0)
    }
    assert {r["doc_id"] for r in got} == expected
    # s1 kept whole, s2 dropped, unlisted s3 dropped (default rate 0)
    srcs = {r["source"] for r in got}
    assert "s2" not in srcs and "s3" not in srcs
    assert sum(1 for r in got if r["source"] == "s1") == 100
    # deterministic under re-partitioning
    again = stratified_sample(df.repartition(13), rates).collect()
    assert {r["doc_id"] for r in again} == expected


def test_stratified_sample_rejects_bad_rate(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        stratified_sample(df, {"a": 1.5})


def test_split_bucket_matches_duckdb(spark):
    ids = list(range(0, 2000, 7))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = dict(
        df.select("doc_id", split_bucket(F.col("doc_id")).alias("b")).collect()
    )
    want = dict(
        duckdb.sql(
            "SELECT i, ('0x' || substr(sha256(i::varchar), 1, 8))::bigint % 10000 "
            f"FROM (SELECT unnest({ids}) AS i)"
        ).fetchall()
    )
    assert got == want


def test_mix_corpus_hits_token_budget(spark):
    # source 'big' has ~10x the tokens of its target share -> rate ~0.1;
    # source 'small' undershoots -> rate capped at 1.0 (keep all)
    rows = [(i, "big", "w " * 50) for i in range(400)] + [
        (1000 + i, "small", "w " * 10) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    sampled, rates = mix_corpus(df, {"big": 0.5, "small": 0.5}, token_budget=4000)
    assert rates["small"] == 1.0
    assert rates["big"] == pytest.approx(2000 / 20000)
    got = sampled.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert counts["small"] == 20
    # expected kept 'big' docs ~= rate * 400 = 40, within hash noise
    assert 20 <= counts.get("big", 0) <= 60


def test_mix_corpus_drops_unweighted_sources(spark):
    rows = [(1, "a", "x y z"), (2, "b", "x y z")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    sampled, rates = mix_corpus(df, {"a": 1.0}, token_budget=100)
    assert {r["source"] for r in sampled.collect()} == {"a"}
    assert set(rates) == {"a"}


def test_pack_sequences_running_assignment(spark):
    from arcane_stream_sqlserver_change_tracking_spark.functions.sampling import (
        pack_sequences,
        split_bucket,
    )

    docs = spark.createDataFrame(
        [(i, "w " * 10) for i in range(50)], "doc_id long, text string"
    )
    got = pack_sequences(docs, seq_tokens=25, buckets=4).collect()
    # recompute expectation in python: per bucket, id order, 10 tokens each
    buckets = dict(
        docs.select("doc_id", split_bucket(F.col("doc_id"), 4).alias("b")).collect()
    )
    expect = {}
    running: dict = {}
    for i in sorted(buckets):
        b = buckets[i]
        prev = running.get(b, 0)
        expect[i] = prev // 25
        running[b] = prev + 10
    assert {r["doc_id"]: r["pack_idx"] for r in got} == expect
    assert all(r["pack_bucket"] == buckets[r["doc_id"]] for r in got)
    # stable under re-partitioning
    again = pack_sequences(docs.repartition(7), seq_tokens=25, buckets=4).collect()
    assert {r["doc_id"]: r["pack_idx"] for r in again} == expect


def test_pack_sequences_rejects_bad_seq(spark):
    from arcane_stream_sqlserver_change_tracking_spark.functions.sampling import pack_sequences

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_sequences(docs, seq_tokens=0)


def test_pack_sequences_single_bucket_exchange(spark):
    from arcane_stream_sqlserver_change_tracking_spark.functions.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(i, "w " * 5) for i in range(100)], "doc_id long, text string"
    )
    plan = pack_sequences(docs)._jdf.queryExecution().executedPlan().toString()
    # one hash Exchange on the pack bucket; never a global (single
    # partition) ordering
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(pack_bucket" in plan
    assert "SinglePartition" not in plan


def test_stratified_sample_exact_counts_and_determinism(spark):
    from arcane_stream_sqlserver_change_tracking_spark.functions.sampling import (
        stratified_sample_exact,
    )

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    out = stratified_sample_exact(df, {"a": 7, "b": 3}).collect()
    by = {}
    for r in out:
        by.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by["a"]) == 7 and len(by["b"]) == 3  # EXACT, not expected

    # deterministic: same rows every run, and a is a superset when its
    # quota grows (hash-rank prefix property — stable eval sets)
    again = {r["doc_id"] for r in
             stratified_sample_exact(df, {"a": 7, "b": 3}).collect()}
    assert again == by["a"] | by["b"]
    bigger = {r["doc_id"] for r in stratified_sample_exact(
        df, {"a": 12}).collect() if r["source"] == "a"}
    assert by["a"] <= bigger and len(bigger) == 12

    # quota above stratum size keeps the whole stratum; unlisted drops
    assert stratified_sample_exact(df, {"a": 999}).count() == 50
    # default_count keeps N of every unlisted stratum
    assert stratified_sample_exact(df, {}, default_count=4).count() == 8
    with pytest.raises(ValueError, match="must be ≥0"):
        stratified_sample_exact(df, {"a": -1})


def test_stratified_sample_exact_plan_pre_prunes_before_shuffle(spark):
    """100 TB shape pin: the foldable max-quota conjunct must trigger
    InferWindowGroupLimit so each map task keeps ≤max_quota rows per
    stratum BEFORE the Exchange — otherwise a stratum's whole rowset
    lands in one shuffle partition."""
    from arcane_stream_sqlserver_change_tracking_spark.functions.sampling import (
        stratified_sample_exact,
    )

    df = spark.range(10_000).selectExpr(
        "id as doc_id", "concat('s', id % 4) as source")
    plan = stratified_sample_exact(df, {"s0": 5, "s1": 10})._jdf\
        .queryExecution().executedPlan().toString()
    head, _, tail = plan.partition("Exchange")
    assert "WindowGroupLimit" in head and "WindowGroupLimit" in tail, plan
