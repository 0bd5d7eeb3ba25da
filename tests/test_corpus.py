"""Corpus dedup operators: n-gram Jaccard df-cap skew guard (VERDICT r1
item 5) and cap-transparency on benign corpora."""

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
