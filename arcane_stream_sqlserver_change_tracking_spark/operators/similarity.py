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

import hashlib

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


def hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is
    md5-derived and mapped to [-0.5, 0.5). Every value is an exact
    dyadic (h/2^32 - 0.5), so the decimal literals embedded in both the
    Spark plan and the DuckDB oracle parse to bit-identical doubles —
    signature bits agree across engines by construction."""
    return [
        [
            int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16) / 2**32 - 0.5
            for d in range(dim)
        ]
        for p in range(num_planes)
    ]


def lsh_signature_bands(
    vecs: DataFrame,
    num_planes: int,
    num_bands: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> DataFrame:
    """Random-hyperplane (SimHash-for-cosine) signature, banded:
    (id, band_idx, band_val) where band_val packs ``num_planes //
    num_bands`` sign bits. Docs agreeing on ALL bits of any band share a
    bucket. Pure Catalyst: the dots are ``aggregate(zip_with(...))``
    against literal plane arrays — JVM codegen, no Python."""
    if num_planes % num_bands != 0:
        raise ValueError(
            f"num_planes ({num_planes}) must be divisible by num_bands "
            f"({num_bands}) — trailing planes would be silently dropped "
            f"and the signature would use fewer bits than requested"
        )
    planes = hyperplanes(num_planes, dim)
    bits_per = num_planes // num_bands
    # The planes ride as DATA (a broadcast one-row frame), not as plan
    # literals: the naive build embeds num_planes×dim literal nodes in
    # the expression tree — thousands of py4j calls to construct and a
    # ~78 KB plan that analysis, AQE re-planning, and task serialization
    # all chew on repeatedly (measured: seconds of driver overhead, vs
    # milliseconds of actual execution at sf0.1). One transform computes
    # every sign bit once per row; bit semantics are unchanged (bit j of
    # band b = sign of dot with plane b·bits_per+j), so the DuckDB
    # oracle's signatures still match exactly.
    planes_df = vecs.sparkSession.createDataFrame(
        [(planes,)], "__planes array<array<double>>"
    )
    sig = F.transform(
        F.col("__planes"),
        lambda p: F.when(_dot(F.col(vec_col), p) > 0, F.lit(1)).otherwise(F.lit(0)),
    )
    # the attach is a broadcast of exactly ONE row — the only nested-loop
    # join in the operator family, and it is O(n·1), not O(n²)
    with_sig = vecs.crossJoin(F.broadcast(planes_df)).select(id_col, sig.alias("__sig"))
    band_structs = []
    for band in range(num_bands):
        val = F.lit(0)
        for j in range(bits_per):
            val = val + F.get(F.col("__sig"), band * bits_per + j) * F.lit(1 << j)
        band_structs.append(
            F.struct(
                F.lit(band).alias("band_idx"), val.cast("int").alias("band_val")
            )
        )
    return with_sig.select(
        id_col, F.explode(F.array(*band_structs)).alias("b")
    ).select(id_col, F.col("b.band_idx").alias("band_idx"), F.col("b.band_val").alias("band_val"))


def embedding_near_dup_lsh(
    embeddings: DataFrame,
    threshold: float = 0.45,
    num_planes: int = 48,
    num_bands: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed embedding near-dup — the 100 TB path for
    :func:`embedding_near_dup_pairs`. Three stages, all shuffle-bounded:

    1. signature: each vector → ``num_bands`` (band_idx, band_val)
       rows (narrow, no shuffle);
    2. candidates: self-equi-join on (band_idx, band_val) — pair count
       scales with bucket widths, never corpus²;
    3. verify: exact cosine on candidates only, filter ≥ threshold.

    Output (a, b, sim) is a SUBSET of the exact operator's (LSH can
    miss); with the defaults it is a verified superset→equal on the test
    corpus (tests/test_dedup.py asserts recall == 1.0 there). Parameter
    regimes: this corpus's near-dups sit at cosine 0.3-0.6, so the
    defaults use narrow 3-bit bands × 16 for recall; a production corpus
    deduped at threshold ~0.9 wants 8-bit bands (256 buckets per band,
    e.g. num_planes=64, num_bands=8) — recall at 0.9 is then ~0.93 with
    far tighter buckets. Measured honestly: at threshold 0.45 (pair
    angle ≈63°, per-bit collision 0.65 vs 0.5 random) hyperplane bands
    are weakly selective — the default parameters admit ~87% of all
    pairs as candidates on this corpus, so the verify stage dominates
    and the operator approaches the exact baseline's cost. That is a
    property of the low-threshold regime, not the plan: for thresholds
    ≤~0.7 prefer the IVF family (:func:`ivf_assign` buckets by data-
    derived centroids, giving candidate sets O(n²/k) regardless of
    threshold); hyperplane LSH is the right tool from ~0.8 up. The DuckDB
    oracle reproduces the identical signatures (deterministic plane
    literals), so CORRECTNESS equality is exact, not statistical."""
    v = with_double_vec(embeddings, vec_col).select(id_col, "vec")
    bands = lsh_signature_bands(v, num_planes, num_bands, dim, id_col)
    a = bands.select(F.col(id_col).alias("a"), "band_idx", "band_val")
    b = bands.select(F.col(id_col).alias("b"), "band_idx", "band_val")
    cand = (
        a.join(b, on=["band_idx", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    # Norms are per-VECTOR, so compute them on the (small) vector side
    # before the candidate join — the verify expression over the (large)
    # candidate set then runs one dot instead of one dot + two norm
    # passes per pair (each HOF pass allocates an intermediate array;
    # at low thresholds the candidate set is the dominant cost).
    vn = v.select(id_col, "vec", _norm(F.col("vec")).alias("nrm"))
    va = vn.select(
        F.col(id_col).alias("a"), F.col("vec").alias("avec"), F.col("nrm").alias("anrm")
    )
    vb = vn.select(
        F.col(id_col).alias("b"), F.col("vec").alias("bvec"), F.col("nrm").alias("bnrm")
    )
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .select(
            "a", "b",
            F.round(
                _dot(F.col("avec"), F.col("bvec")) / (F.col("anrm") * F.col("bnrm")), 9
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def _nearest_centroid(vecs: DataFrame, centroids: DataFrame, id_col: str) -> DataFrame:
    """(id, centroid_id): argmax cosine against broadcast centroids."""
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


def kmeans_centroids(
    vecs: DataFrame,
    centroid_stride: int = 50,
    iters: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd's k-means refinement of the stride-sample centroids.

    Per iteration: broadcast-join assignment (argmax cosine) → new
    centroid = element-wise mean of members (posexplode → partial-agg
    avg per (centroid, dim) → re-assembled array). Centroid sets are
    tiny (k ≪ n), so each round materializes them to the driver —
    bounded metadata, keeps the iterative plan shallow instead of
    stacking k joins into one lazy tree. Centroid ids are re-labeled to
    the stride ids for stability. Float summation order across
    partitions makes the means deterministic only to the last ulp —
    which is why the oracle-verified queries stay on the stride default
    and this is the behind-the-flag production option."""
    spark = vecs.sparkSession
    cent = vecs.filter(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("centroid_id"), F.col("vec").alias("cvec")
    )
    for _ in range(iters):
        assign = _nearest_centroid(vecs, cent, id_col)
        members = vecs.join(assign, id_col)
        dims = members.select(
            "centroid_id", F.posexplode("vec").alias("pos", "x")
        )
        means = (
            dims.groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cvec")
            )
        )
        rows = means.collect()  # k rows of dim doubles — bounded
        cent = F.broadcast(
            spark.createDataFrame(
                [(int(r["centroid_id"]), list(r["cvec"])) for r in rows],
                "centroid_id long, cvec array<double>",
            )
        )
    return cent


def ivf_assign(
    embeddings: DataFrame,
    centroid_stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids_mode: str = "stride",
    kmeans_iters: int = 5,
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine.
    Returns (vec_id, centroid_id). Centroids broadcast.

    ``centroids_mode="stride"`` (default): deterministic sample — the
    DuckDB oracle reproduces it exactly. ``"kmeans"``: Lloyd-refined
    centroids (tighter buckets → better ANN recall per probe) — the
    production option, verified by a recall harness rather than an
    equality oracle (float mean order sensitivity)."""
    vecs = with_double_vec(embeddings, vec_col).select(id_col, "vec")
    if centroids_mode == "kmeans":
        centroids = kmeans_centroids(vecs, centroid_stride, kmeans_iters, id_col)
    elif centroids_mode == "stride":
        centroids = vecs.filter(F.col(id_col) % centroid_stride == 0).select(
            F.col(id_col).alias("centroid_id"), F.col("vec").alias("cvec")
        )
    else:
        raise ValueError(f"unknown centroids_mode: {centroids_mode!r}")
    return _nearest_centroid(vecs, centroids, id_col)


def ivf_topk(
    embeddings: DataFrame,
    query_filter,
    k: int = 5,
    nprobe: int = 3,
    centroid_stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: DataFrame | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the nprobe nearest centroid
    buckets per query. Returns (query_id, neighbor_id, rank, sim).

    ``assign`` lets callers pass a PRE-COMPUTED (vec_id, centroid_id)
    table — at scale assignments are materialized once (e.g. a
    LakeTable bucketed by centroid_id) and probed by many queries,
    instead of re-deriving them per search. When the assignment was
    built from non-default centroids (``centroids_mode="kmeans"``),
    pass the SAME ``centroids`` (centroid_id, cvec) here: probe
    selection must rank against the geometry that built the buckets, or
    queries probe the wrong buckets and recall silently degrades."""
    if assign is None:
        assign = ivf_assign(embeddings, centroid_stride, id_col, vec_col)
    corpus = (
        with_double_vec(embeddings, vec_col)
        .select(F.col(id_col).alias("neighbor_id"), F.col("vec").alias("nvec"))
        .join(assign.select(F.col(id_col).alias("neighbor_id"), "centroid_id"), "neighbor_id")
    )
    vecs = with_double_vec(embeddings, vec_col)
    queries = vecs.filter(query_filter).select(F.col(id_col).alias("query_id"), F.col("vec").alias("qvec"))
    if centroids is None:
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


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.8,
    centroid_stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids_mode: str = "stride",
    assign: DataFrame | None = None,
    keep: str = "lowest_id",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space coarsely, then
    remove near-duplicates WITHIN each cluster only. Returns the
    surviving (id, centroid_id) rows.

    Pipeline: :func:`ivf_assign` buckets every vector by nearest
    centroid; within a bucket, all pairs with cosine >= ``threshold``
    are computed via a self-equi-join on ``centroid_id``; a vector is
    dropped when it is near-duplicate to ANY higher-priority vector in
    its cluster — a pairwise DOMINANCE rule (deterministic, order-free,
    exactly expressible in SQL for the oracle). Note this is more
    aggressive than per-group keep-one: in a chain a~b, b~c (a!~c)
    with a highest-priority, b AND c are both dropped (c is dominated
    by b even though b itself goes) — one join pass, no iteration. For
    exact keep-one-per-connected-group semantics, feed the pair list
    through :mod:`..operators.clusters` ``connected_components`` +
    ``cluster_representatives`` instead. ``keep`` sets the priority:

    * ``"lowest_id"`` (default, the oracled path): smaller id wins —
      the cheapest deterministic rule;
    * ``"min_centroid_sim"``: the paper's rule — LOWER cosine to the
      cluster centroid wins (ties by id), so each duplicate group keeps
      its most "edge" example, preserving diversity. Costs one extra
      broadcast join against the (k-row) centroid table to score
      members.

    The 100 TB shape: candidate generation is an equi-join keyed by
    centroid_id — pair work is bounded by the largest cluster, never
    corpus × corpus (k clusters shrink it ~k-fold); the drop set comes
    back as one anti-join on id. Cluster sizes are operator-tunable via
    ``centroid_stride``; skewed clusters are visible in the assign
    output and can be split by raising k (or switching
    ``centroids_mode="kmeans"`` for tighter, more even buckets).

    ``assign`` takes a PRE-COMPUTED (id, centroid_id) table — same
    contract as :func:`ivf_topk`. Without it the lazy DAG recomputes
    the assignment subtree three times (survivor output + both pair
    sides); at scale materialize the assignment once (e.g. a LakeTable
    bucketed by centroid_id) and pass it in."""
    if keep not in ("lowest_id", "min_centroid_sim"):
        raise ValueError(f"semantic_dedup: unknown keep rule {keep!r}")
    if assign is None:
        assign = ivf_assign(embeddings, centroid_stride, id_col, vec_col,
                            centroids_mode)
    vecs = with_double_vec(embeddings, vec_col).select(id_col, "vec")
    member = assign.join(vecs, id_col)
    if keep == "min_centroid_sim":
        if centroids_mode != "stride":
            raise ValueError(
                "semantic_dedup: keep='min_centroid_sim' scores members "
                "against the stride centroid table; for kmeans pass the "
                "materialized assignment and use lowest_id, or extend "
                "with an explicit centroids param")
        centroids = vecs.filter(F.col(id_col) % centroid_stride == 0).select(
            F.col(id_col).alias("centroid_id"), F.col("vec").alias("cvec"))
        member = member.join(F.broadcast(centroids), "centroid_id").select(
            id_col, "centroid_id", "vec",
            F.round(cosine_sim(F.col("vec"), F.col("cvec")), 9).alias("csim"))
        # priority = (csim asc, id asc): a struct compare gives the
        # lexicographic order directly in the pair filter
        prio = lambda side: F.struct(F.col(f"{side}csim"), F.col(side))  # noqa: E731
    else:
        member = member.withColumn("csim", F.lit(0.0))
        prio = lambda side: F.col(side)  # noqa: E731
    a = member.select(F.col(id_col).alias("a"), F.col("centroid_id"),
                      F.col("vec").alias("avec"), F.col("csim").alias("acsim"))
    b = member.select(F.col(id_col).alias("b"), F.col("centroid_id"),
                      F.col("vec").alias("bvec"), F.col("csim").alias("bcsim"))
    dropped = (
        a.join(b, "centroid_id")
        .filter(prio("a") < prio("b"))
        .filter(F.round(cosine_sim(F.col("avec"), F.col("bvec")), 9)
                >= threshold)
        .select(F.col("b").alias(id_col))
        .distinct()
    )
    return assign.join(dropped, id_col, "left_anti").select(id_col, "centroid_id")
