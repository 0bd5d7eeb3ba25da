"""Connected-components cluster resolution + deterministic hash split."""

import pytest
from pyspark.sql import functions as F

from arcane_stream_sqlserver_change_tracking_spark.functions.sampling import hash_split
from arcane_stream_sqlserver_change_tracking_spark.operators.clusters import (
    ComponentsNotConverged,
    connected_components,
    near_dup_clusters,
)
from arcane_stream_sqlserver_change_tracking_spark.operators.corpus import (
    minhash_lsh_dedup,
)


def _cc_map(spark, edges):
    df = spark.createDataFrame(edges, "a int, b int")
    rows = connected_components(df).collect()
    return {r["doc_id"]: r["cluster_id"] for r in rows}


def test_two_components(spark):
    got = _cc_map(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # path graph 0-1-2-...-14: worst case for plain neighbor-min
    # (diameter rounds); pointer jumping must still converge within the
    # default budget
    edges = [(i, i + 1) for i in range(14)]
    got = _cc_map(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 15


def test_duplicate_and_reversed_edges(spark):
    got = _cc_map(spark, [(2, 1), (1, 2), (2, 3), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_string_ids(spark):
    df = spark.createDataFrame([("b", "c"), ("a", "b")], "a string, b string")
    rows = connected_components(df).collect()
    assert {r["doc_id"]: r["cluster_id"] for r in rows} == {
        "a": "a", "b": "a", "c": "a"
    }


def test_max_rounds_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(200)], "a int, b int")
    with pytest.raises(ComponentsNotConverged):
        connected_components(df, max_rounds=1)


def test_near_dup_clusters_includes_singletons(spark):
    pairs = spark.createDataFrame([(1, 2)], "a int, b int")
    ids = spark.createDataFrame([(1,), (2,), (3,)], "doc_id int")
    rows = {r["doc_id"]: r for r in near_dup_clusters(pairs, ids).collect()}
    assert rows[1]["cluster_id"] == 1 and rows[1]["is_representative"]
    assert rows[2]["cluster_id"] == 1 and not rows[2]["is_representative"]
    assert rows[3]["cluster_id"] == 3 and rows[3]["is_representative"]


def test_clusters_agree_with_lsh_pairs_transitive_closure(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_dedup(docs, num_perms=16, num_bands=4)
    out = near_dup_clusters(pairs, docs, id_col="doc_id")
    # python-side transitive closure oracle over the same pairs
    import collections

    adj = collections.defaultdict(set)
    for r in pairs.collect():
        adj[r["a"]].add(r["b"])
        adj[r["b"]].add(r["a"])
    want = {}
    for r in docs.select("doc_id").collect():
        want[r["doc_id"]] = r["doc_id"]
    for start in sorted(want):
        if want[start] != start:
            continue
        stack, seen = [start], {start}
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        rep = min(seen)
        for v in seen:
            want[v] = min(want[v], rep)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == want
    # representatives = exactly one per cluster
    reps = out.filter("is_representative").count()
    assert reps == len(set(want.values()))


def test_hash_split_deterministic_and_complete(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = hash_split(docs, "doc_id").select("doc_id", "split").collect()
    b = hash_split(docs.repartition(7), "doc_id").select("doc_id", "split").collect()
    assert sorted((r["doc_id"], r["split"]) for r in a) == sorted(
        (r["doc_id"], r["split"]) for r in b
    )
    counts = {
        r["split"]: r["n"]
        for r in hash_split(docs, "doc_id").groupBy("split").agg(
            F.count("*").alias("n")
        ).collect()
    }
    n = sum(counts.values())
    assert n == docs.count()
    # 90/5/5 within generous sampling slack on a small corpus
    assert counts.get("train", 0) > 0.8 * n
    assert 0 < counts.get("val", 0) < 0.15 * n
    assert 0 < counts.get("test", 0) < 0.15 * n


def test_hash_split_fraction_validation(spark):
    df = spark.range(5)
    with pytest.raises(ValueError):
        hash_split(df, "id", fractions={"train": 0.5, "val": 0.4})


def test_token_vocab_topk_deterministic(spark, sf_dir):
    from arcane_stream_sqlserver_change_tracking_spark.operators.corpus import token_vocab

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    top = token_vocab(docs, top_k=5).collect()
    assert len(top) <= 5
    counts = [r["total_count"] for r in top]
    assert counts == sorted(counts, reverse=True)
    again = token_vocab(docs.repartition(13), top_k=5).collect()
    assert [(r["token"], r["total_count"], r["doc_freq"]) for r in top] == [
        (r["token"], r["total_count"], r["doc_freq"]) for r in again
    ]
    # global top-k compiles to per-partition heaps, not a global sort
    plan = token_vocab(docs, top_k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_select_representatives_quality_and_tiebreak(spark):
    from arcane_stream_sqlserver_change_tracking_spark.operators.clusters import select_representatives

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1), (5, 0.1), (6, 0.7)],
        "doc_id long, quality double",
    )
    got = {r["cluster_id"]: r for r in select_representatives(clusters, scores).collect()}
    assert got[1]["rep_id"] == 2 and got[1]["quality"] == 0.9  # best score, tie -> lowest id
    assert got[4]["rep_id"] == 4                                # tie -> lowest id
    assert got[6]["rep_id"] == 6                                # singleton
    assert len(got) == 3


def test_select_representatives_string_ids(spark):
    from arcane_stream_sqlserver_change_tracking_spark.operators.clusters import select_representatives

    clusters = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("z", "c2")], "doc_id string, cluster_id string"
    )
    scores = spark.createDataFrame(
        [("a", 0.9), ("b", 0.9), ("z", 0.1)], "doc_id string, quality double"
    )
    got = {r["cluster_id"]: r["rep_id"] for r in select_representatives(clusters, scores).collect()}
    assert got == {"c1": "a", "c2": "z"}  # tie -> lowest id; no NULLs
