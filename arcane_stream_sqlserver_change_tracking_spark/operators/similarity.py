"""Similarity search over embedding columns (array<float>).

* :func:`brute_force_topk` — exact cosine top-k: query set × corpus
  with all arithmetic in Catalyst array expressions (zip_with +
  aggregate — JVM-side, no Python). Baseline and oracle-verifiable.
* :func:`ivf_assign` / :func:`ivf_topk` — the scale path: IVF-style
  coarse quantization. Centroids here are a deterministic sample
  (``vec_id % centroid_stride == 0``) so the oracle can reproduce them;
  swap in k-means centroids for production. Search probes only the
  ``nprobe`` nearest centroid buckets → corpus-side work drops from
  O(n) to O(n·nprobe/k) per query, and the join is an equi-join on
  centroid id (bucketable, broadcastable).

At 100 TB the corpus side stays partitioned by centroid id (bucket
layout), queries broadcast, and the per-bucket top-k is a partial
aggregation — no global shuffle of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_double_vec(df: DataFrame, col: str = "embedding", out: str = "vec") -> DataFrame:
    """float[] → double[] once, up front — keeps all downstream
    arithmetic in float64 (matches the DuckDB oracle exactly)."""
    return df.withColumn(out, F.transform(F.col(col), lambda x: x.cast("double")))


def cosine_sim(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_filter,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding
    self). Returns (query_id, neighbor_id, rank, sim). Ties broken by
    neighbor id for full determinism."""
    corpus = with_double_vec(embeddings, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("vec").alias("nvec")
    )
    queries = with_double_vec(embeddings.filter(query_filter), vec_col).select(
        F.col(id_col).alias("query_id"), F.col("vec").alias("qvec")
    )
    scored = (
        F.broadcast(queries)
        .join(corpus, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim(F.col("qvec"), F.col("nvec")), 9).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup-family member):
    all (a, b), a < b, with cosine >= threshold. Exact — the LSH/IVF
    bucketing path (``ivf_assign`` + within-bucket pairs) is the 100 TB
    variant; this is its oracle-verifiable ground truth."""
    a = with_double_vec(embeddings, vec_col).select(
        F.col(id_col).alias("a"), F.col("vec").alias("avec")
    )
    b = with_double_vec(embeddings, vec_col).select(
        F.col(id_col).alias("b"), F.col("vec").alias("bvec")
    )
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.round(cosine_sim(F.col("avec"), F.col("bvec")), 9).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def ivf_assign(
    embeddings: DataFrame,
    centroid_stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine.
    Returns (vec_id, centroid_id). Centroids broadcast."""
    vecs = with_double_vec(embeddings, vec_col).select(id_col, "vec")
    centroids = vecs.filter(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("centroid_id"), F.col("vec").alias("cvec")
    )
    scored = vecs.join(F.broadcast(centroids)).select(
        id_col,
        "centroid_id",
        F.round(cosine_sim(F.col("vec"), F.col("cvec")), 9).alias("sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "centroid_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_filter,
    k: int = 5,
    nprobe: int = 3,
    centroid_stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the nprobe nearest centroid
    buckets per query. Returns (query_id, neighbor_id, rank, sim)."""
    assign = ivf_assign(embeddings, centroid_stride, id_col, vec_col)
    corpus = (
        with_double_vec(embeddings, vec_col)
        .select(F.col(id_col).alias("neighbor_id"), F.col("vec").alias("nvec"))
        .join(assign.select(F.col(id_col).alias("neighbor_id"), "centroid_id"), "neighbor_id")
    )
    vecs = with_double_vec(embeddings, vec_col)
    queries = vecs.filter(query_filter).select(F.col(id_col).alias("query_id"), F.col("vec").alias("qvec"))
    centroids = vecs.filter(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("centroid_id"), F.col("vec").alias("cvec")
    )
    qc = queries.join(F.broadcast(centroids)).select(
        "query_id", "qvec", "centroid_id",
        F.round(cosine_sim(F.col("qvec"), F.col("cvec")), 9).alias("csim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("centroid_id"))
    probes = qc.withColumn("rn", F.row_number().over(wq)).filter(F.col("rn") <= nprobe).select(
        "query_id", "qvec", "centroid_id"
    )
    scored = (
        F.broadcast(probes)
        .join(corpus, "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine_sim(F.col("qvec"), F.col("nvec")), 9).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
