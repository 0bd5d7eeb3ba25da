"""Corpus dedup operators: n-gram Jaccard df-cap skew guard (VERDICT r1
item 5) and cap-transparency on benign corpora."""

import pytest
from pyspark.sql import functions as F

from arcane_stream_sqlserver_change_tracking_spark.operators.corpus import (
    char_shingles,
    ngram_jaccard_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_cap_transparent_when_above_corpus_df(spark):
    """With the cap above the corpus's max shingle document frequency the
    capped operator equals the uncapped one (the driver-query regime)."""
    rows = [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown fox leaps"),
        (3, "a completely different doc"),
    ]
    d = _docs(spark, rows)
    capped = {
        (r["a"], r["b"], r["jaccard"])
        for r in ngram_jaccard_pairs(d, threshold=0.1, max_shingle_doc_freq=1000).collect()
    }
    uncapped = {
        (r["a"], r["b"], r["jaccard"])
        for r in ngram_jaccard_pairs(d, threshold=0.1, max_shingle_doc_freq=None).collect()
    }
    assert capped == uncapped and capped


def test_jaccard_df_cap_bounds_adversarial_stop_shingle(spark):
    """An adversarial shingle shared by every document must not create a
    quadratic candidate bucket: with the df-cap, the intersection join's
    row count is bounded by the rare shingles only."""
    # 40 docs, all sharing one long common prefix (a stop shingle
    # factory) plus a unique tail; pairwise they share ONLY the prefix
    # (md5-hex tails share no 8-shingles, unlike e.g. zero-padded
    # numbers whose decade digits alias)
    import hashlib

    common = "zzzzzzzzzzzzzzzz"  # 16 chars -> 9 shared 8-shingles
    rows = [
        (i, common + " " + hashlib.md5(f"tail{i}".encode()).hexdigest())
        for i in range(40)
    ]
    d = _docs(spark, rows)

    sh = char_shingles(d)
    max_df = (
        sh.groupBy("shingle").count().agg(F.max("count").alias("m")).collect()[0]["m"]
    )
    assert max_df == 40  # the prefix shingles hit every doc

    # cap below the stop-shingle df: the 40*39/2 = 780 prefix-driven
    # pairs collapse to only those sharing some sub-cap shingle (small
    # prefix/tail boundary groups) — candidate growth is bounded by
    # bucket widths, not corpus²
    capped = ngram_jaccard_pairs(d, threshold=0.0, max_shingle_doc_freq=10)
    uncapped = ngram_jaccard_pairs(d, threshold=0.0, max_shingle_doc_freq=None)
    n_capped, n_uncapped = capped.count(), uncapped.count()
    assert n_uncapped == 780
    assert n_capped < n_uncapped / 10

    # and reported jaccard never inflates: every capped pair's jaccard
    # is <= its uncapped (exact) value — the cap only removes
    # intersection evidence, never adds it
    exact = {(r["a"], r["b"]): r["jaccard"] for r in uncapped.collect()}
    for r in capped.collect():
        assert r["jaccard"] <= exact[(r["a"], r["b"])]


def test_decontaminate_drops_overlapping_docs(spark):
    from arcane_stream_sqlserver_change_tracking_spark.operators.corpus import (
        decontaminate,
    )

    leak = "the quick brown fox jumps over the lazy dog"  # >16 chars shared
    train = _docs(
        spark,
        [
            (1, f"intro {leak} outro"),          # contaminated
            (2, "completely unrelated content about spark plans"),
            (3, leak),                            # contaminated, exact
        ],
    )
    eval_docs = _docs(spark, [(100, f"benchmark question: {leak}?")])
    clean, report = decontaminate(train, eval_docs, k=16)
    flagged = {r["doc_id"]: r["eval_overlap"] for r in report.collect()}
    assert set(flagged) == {1, 3}
    assert all(v >= 1 for v in flagged.values())
    assert {r["doc_id"] for r in clean.collect()} == {2}
    # plan shape: eval side broadcast — the corpus never shuffles for
    # the contamination join
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_redact_pii_expr_scrubs_both_patterns(spark):
    from arcane_stream_sqlserver_change_tracking_spark.functions.text import (
        redact_pii_expr,
    )

    df = _docs(
        spark,
        [
            (1, "mail me at jane.doe+spam@sub.example.co.uk thanks"),
            (2, "call +1 (555) 010-4242 today"),
            (3, "no pii here"),
            (4, "two: a@b.io and 555 123 4567 done"),
        ],
    )
    got = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", redact_pii_expr("text").alias("t")).collect()
    }
    assert got[1] == "mail me at [EMAIL] thanks"
    assert got[2] == "call [PHONE] today"
    assert got[3] == "no pii here"
    assert got[4] == "two: [EMAIL] and [PHONE] done"


def test_token_vocab_approx_doc_freq_single_shuffle(spark):
    """VERDICT r3 nit: exact countDistinct forces Spark's distinct-agg
    rewrite — measured on Spark 4.1: FOUR HashAggregate stages over TWO
    Exchanges (partial/merge keyed by (token, doc_id), then
    partial/final by token; no Expand for a single distinct agg). The
    approx path (HLL++ sketch, mergeable) must plan the plain map-side-
    combined shape — ONE Exchange — and stay within HLL error of the
    exact counts. Exact remains the oracle default."""
    from arcane_stream_sqlserver_change_tracking_spark.operators.corpus import (
        token_vocab,
    )

    rows = [(i, "alpha beta " + ("gamma " * (i % 3))) for i in range(200)]
    d = _docs(spark, [(i, t.strip()) for i, t in rows])

    exact = token_vocab(d, top_k=5)
    approx = token_vocab(d, top_k=5, exact_doc_freq=False)
    exact_plan = exact._jdf.queryExecution().executedPlan().toString()
    approx_plan = approx._jdf.queryExecution().executedPlan().toString()
    assert exact_plan.count("Exchange") == 2
    assert approx_plan.count("Exchange") == 1
    assert approx_plan.count("HashAggregate") < exact_plan.count("HashAggregate")

    e = {r["token"]: (r["total_count"], r["doc_freq"]) for r in exact.collect()}
    a = {r["token"]: (r["total_count"], r["doc_freq"]) for r in approx.collect()}
    assert set(e) == set(a)
    for tok, (cnt, df_exact) in e.items():
        cnt_a, df_approx = a[tok]
        assert cnt_a == cnt  # total counts identical
        assert abs(df_approx - df_exact) <= max(2, 0.05 * df_exact)


def test_line_dedup_keeps_first_occurrence(spark):
    from arcane_stream_sqlserver_change_tracking_spark.operators.corpus import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "unique one\nBOILER\nunique two"),
            (2, "BOILER\nother text\nBOILER"),   # BOILER dup twice (once in-doc)
            (3, ""),                              # empty doc survives
            (4, "other text"),                    # dup of doc 2's line
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert got[1]["clean_text"] == "unique one\nBOILER\nunique two"
    assert (got[1]["kept_lines"], got[1]["dropped_lines"]) == (3, 0)
    # doc 2 loses both BOILER copies (first occurrence is doc 1 pos 1)
    assert got[2]["clean_text"] == "other text"
    assert (got[2]["kept_lines"], got[2]["dropped_lines"]) == (1, 2)
    assert got[3]["clean_text"] == "" and got[3]["kept_lines"] == 0
    assert got[4]["clean_text"] == "" and got[4]["dropped_lines"] == 1


def test_line_dedup_in_doc_duplicates_and_order(spark):
    from arcane_stream_sqlserver_change_tracking_spark.operators.corpus import line_dedup

    docs = spark.createDataFrame(
        [(7, "a\nb\na\nc\nb\nd")], "doc_id long, text string"
    )
    r = line_dedup(docs).collect()[0]
    # repeats within one doc collapse to the first position; order kept
    assert r["clean_text"] == "a\nb\nc\nd"
    assert (r["kept_lines"], r["dropped_lines"]) == (4, 2)


def test_line_dedup_single_line_exchange(spark):
    from arcane_stream_sqlserver_change_tracking_spark.operators.corpus import line_dedup

    docs = spark.createDataFrame(
        [(i, f"common header\nbody {i}") for i in range(40)], "doc_id long, text string"
    )
    out = line_dedup(docs)
    rows = out.collect()
    assert sum(r["dropped_lines"] for r in rows) == 39
    # shuffle key is the md5 digest, never the raw line text
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(h" in plan or "hashpartitioning(doc_id" in plan


def test_chunk_documents_windows_and_overlap(spark):
    from arcane_stream_sqlserver_change_tracking_spark.operators.corpus import chunk_documents

    # 10 tokens, max=4, overlap=2 -> stride 2 -> starts 0,2,4,6,8
    toks = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame([(1, toks), (2, ""), (3, "a b")], "doc_id long, text string")
    got = chunk_documents(docs, max_tokens=4, overlap=2).collect()
    by = {}
    for r in got:
        by.setdefault(r["doc_id"], []).append(r)
    one = sorted(by[1], key=lambda r: r["chunk_idx"])
    assert [r["chunk_idx"] for r in one] == [0, 1, 2, 3, 4]
    assert one[0]["chunk_text"] == "t0 t1 t2 t3"
    assert one[1]["chunk_text"] == "t2 t3 t4 t5"      # 2-token overlap
    assert one[4]["chunk_text"] == "t8 t9"            # short tail
    assert one[4]["chunk_tokens"] == 2
    # empty doc -> exactly one empty chunk, never dropped
    assert len(by[2]) == 1 and by[2][0]["chunk_text"] == "" and by[2][0]["chunk_tokens"] == 0
    # doc shorter than one window -> single chunk
    assert len(by[3]) == 1 and by[3][0]["chunk_text"] == "a b"


def test_chunk_documents_rejects_bad_overlap(spark):
    from arcane_stream_sqlserver_change_tracking_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=4, overlap=4)


def test_chunk_documents_zero_exchange(spark):
    from arcane_stream_sqlserver_change_tracking_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame(
        [(i, "w " * 200) for i in range(20)], "doc_id long, text string"
    )
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_token_commonness_exact_values(spark):
    from arcane_stream_sqlserver_change_tracking_spark.operators.corpus import token_commonness

    docs = spark.createDataFrame(
        [
            (1, "the the cat"),   # corpus tf: the=4, cat=2 -> (4+4+2)/3
            (2, "the cat zzz"),   # (4+2+1)/3
            (3, "THE"),           # case-folds into 'the' -> 4/1
            (4, ""),              # empty -> zeros
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in token_commonness(docs).collect()}
    assert got[1]["n_tokens"] == 3
    assert got[1]["mean_token_tf"] == pytest.approx(10 / 3, abs=1e-6)
    # df: the appears in docs {1,2,3}=3, cat in {1,2}=2 -> (3+3+2)/3
    assert got[1]["mean_token_df"] == pytest.approx(8 / 3, abs=1e-6)
    assert got[2]["mean_token_tf"] == pytest.approx(7 / 3, abs=1e-6)
    assert got[3]["mean_token_tf"] == 4.0 and got[3]["mean_token_df"] == 3.0
    assert got[4]["n_tokens"] == 0 and got[4]["mean_token_tf"] == 0.0


def test_token_commonness_approx_doc_freq_drops_one_exchange(spark):
    """VERDICT r5 ask: token_vocab's approx treatment applied to
    token_commonness. The vocabulary aggregate's exact countDistinct
    costs a distinct-rewrite (two Exchanges); the HLL++ path must plan
    exactly one fewer Exchange overall — everything else in the plan
    (join + per-doc agg + reattach join) is unchanged — and stay within
    sketch error on mean_token_df while n_tokens/mean_token_tf remain
    bit-exact."""
    from arcane_stream_sqlserver_change_tracking_spark.operators.corpus import (
        token_commonness,
    )

    rows = [(i, ("common " * 5 + f"rare{i} " * (i % 2)).strip())
            for i in range(120)]
    d = _docs(spark, rows)

    exact = token_commonness(d)
    approx = token_commonness(d, exact_doc_freq=False)
    exact_plan = exact._jdf.queryExecution().executedPlan().toString()
    approx_plan = approx._jdf.queryExecution().executedPlan().toString()
    assert approx_plan.count("Exchange") == exact_plan.count("Exchange") - 1
    assert approx_plan.count("HashAggregate") < exact_plan.count("HashAggregate")

    e = {r["doc_id"]: r for r in exact.collect()}
    a = {r["doc_id"]: r for r in approx.collect()}
    assert set(e) == set(a)
    for i in e:
        assert a[i]["n_tokens"] == e[i]["n_tokens"]
        assert a[i]["mean_token_tf"] == e[i]["mean_token_tf"]
        ref = e[i]["mean_token_df"]
        assert abs(a[i]["mean_token_df"] - ref) <= max(2.0, 0.05 * ref)


def test_content_hash_key_turns_upsert_into_incremental_dedup(spark, tmp_path):
    """Composition: the CDC lake's keyed upsert IS incremental exact
    dedup when the merge key is the content hash — each new batch
    anti-joins existing hashes (bucket-pruned), duplicate content
    upserts in place, and the table never grows past the distinct-text
    count. This is how a 100 TB corpus ingests continuously without a
    periodic full-corpus dedup job."""
    from pyspark.sql import types as T

    from arcane_stream_sqlserver_change_tracking_spark.plans.lake import LakeTable
    from arcane_stream_sqlserver_change_tracking_spark.streaming.runner import (
        CdcEngine,
        EngineOptions,
    )

    payload_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("content_hash", T.StringType()),
    ])

    def log(rows):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, sys_change_version long, "
                  "sys_change_operation string")
        return df.withColumn("content_hash", F.sha2(F.col("text"), 256))

    eng = CdcEngine(
        spark, LakeTable(spark, str(tmp_path / "corpus")),
        EngineOptions(key_columns=("content_hash",), num_buckets=8,
                      max_events_per_batch=1000))
    eng.bootstrap(payload_schema)

    # batch 1: 100 docs, every text duplicated once → 50 distinct
    b1 = [(i, f"doc text {i // 2}", i + 1, "I") for i in range(100)]
    eng.run_incremental(log(b1))
    assert eng.current_state().count() == 50

    # batch 2: 25 repeats of batch-1 texts + 25 fresh → +25 only
    b2 = [(100 + j, f"doc text {j}" if j < 25 else f"fresh {j}", 101 + j, "I")
          for j in range(50)]
    eng.run_incremental(log(b2))
    state = eng.current_state()
    assert state.count() == 75

    # the repeated texts were UPSERTED: their surviving doc_id/version
    # is the latest ingest, not the original
    survivors = {r["text"]: (r["doc_id"], r["sys_change_version"])
                 for r in state.collect()}
    for j in range(25):
        assert survivors[f"doc text {j}"] == (100 + j, 101 + j)

    # re-ingesting pure duplicates leaves the count fixed
    b3 = [(200 + j, f"doc text {j}", 151 + j, "I") for j in range(10)]
    eng.run_incremental(log(b3))
    assert eng.current_state().count() == 75


def test_conversation_docs_orders_turns_and_counts(spark):
    from arcane_stream_sqlserver_change_tracking_spark.operators.transcripts import (
        conversation_docs,
    )

    rows = [
        ("c1", 2, "assistant", "second"),
        ("c1", 1, "user", "first"),
        ("c1", 10, "user", "tenth"),   # numeric order, not lexicographic
        ("c2", 1, "system", "solo"),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    out = {r["conv_id"]: r for r in conversation_docs(turns).collect()}
    assert out["c1"]["text"] == "user: first\nassistant: second\nuser: tenth"
    assert out["c1"]["n_turns"] == 3
    assert out["c2"]["text"] == "system: solo" and out["c2"]["n_turns"] == 1

    sep = conversation_docs(turns, sep=" | ").collect()
    assert all(" | " in r["text"] for r in sep if r["n_turns"] > 1)

    plan = conversation_docs(turns)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan  # one conv-keyed shuffle
