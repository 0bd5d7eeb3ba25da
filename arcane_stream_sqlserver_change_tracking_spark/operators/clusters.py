"""Near-duplicate cluster resolution: connected components over
candidate pairs.

LSH (`operators/corpus.py` / `operators/similarity.py`) emits candidate
PAIRS; a real training-data dedup pipeline needs one more step — resolve
the pair graph into clusters and keep one representative per cluster.
Pairs alone under-deduplicate: if A~B and B~C share a band but A,C don't,
dropping only pair-partners keeps two of the three near-identical docs.

The resolver is min-label propagation with pointer jumping:

* each node starts labeled with itself;
* per round, every node takes the min of its own label and its
  neighbors' labels (one shuffle join + partial-agg min — map-side
  combined), then *jumps*: label(x) := min(label(x), label(label(x))).
  The jump halves chain depth per round, so rounds grow with
  log(component diameter), not diameter.
* convergence is detected with a single `isEmpty()` on the changed-rows
  diff; lineage is truncated every round with `localCheckpoint` so the
  plan does not grow across iterations.

At 100 TB the cost profile is: E edges shuffled per round on the join
key (node id), V labels shuffled for the jump, O(log d) rounds. The
candidate graphs LSH produces are unions of band-bucket cliques, so
diameters are small (a component's diameter is bounded by the number of
chained buckets); `max_rounds` fail-fasts on pathological inputs rather
than looping forever. Components here are near-dup groups — orders of
magnitude smaller than the corpus — so per-round state is tiny relative
to the input scan that produced the pairs.

Reference parity: the reference engine stops at per-key dedup
(`arcane-stream-sqlserver-change-tracking` merges on arcane_merge_key);
cluster resolution is part of this repo's LLM-pipeline surface (round
brief), modeled on the MapReduce connected-components literature
(Kiveris et al., SoCC'14; Rastogi et al., ICDE'13 Hash-Min) rather than
any reference code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class ComponentsNotConverged(RuntimeError):
    """Raised when label propagation hits ``max_rounds`` while labels
    are still changing — a sign the candidate graph has a pathological
    long-chain structure that needs a bigger budget."""


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    out_id: str = "doc_id",
    out_label: str = "cluster_id",
    max_rounds: int = 25,
) -> DataFrame:
    """Resolve an undirected edge list into components.

    Returns one row per node that appears in ``pairs``:
    ``(out_id, out_label)`` where the label is the component-minimum
    node id (a deterministic representative). Nodes must be orderable
    (int or string ids both work). The result is materialized via
    ``localCheckpoint`` — iteration count does not leak into the
    consumer's plan.
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .union(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("lab"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        nbr_min = (
            edges.join(labels.select(F.col("id").alias("v"), "lab"), "v")
            .groupBy("u")
            .agg(F.min("lab").alias("nbr_lab"))
        )
        stepped = (
            labels.join(nbr_min, labels.id == nbr_min.u, "left")
            .select(
                "id",
                F.least(
                    F.col("lab"), F.coalesce(F.col("nbr_lab"), F.col("lab"))
                ).alias("lab"),
            )
        )
        # pointer jump: follow the label one hop through the label table
        parent = stepped.select(
            F.col("id").alias("p_id"), F.col("lab").alias("p_lab")
        )
        jumped = (
            stepped.join(parent, stepped.lab == parent.p_id, "left")
            .select(
                "id",
                F.least(
                    F.col("lab"), F.coalesce(F.col("p_lab"), F.col("lab"))
                ).alias("lab"),
            )
            .localCheckpoint()
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lab") != F.col("o.lab"))
        )
        labels = jumped
        if changed.isEmpty():
            return labels.select(
                F.col("id").alias(out_id), F.col("lab").alias(out_label)
            )
    raise ComponentsNotConverged(
        f"connected_components: still changing after {max_rounds} rounds"
    )


def near_dup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Cluster assignment for EVERY document: members of a candidate
    component share its min-id label; untouched docs are singleton
    clusters of themselves. ``(id_col, cluster_id, is_representative)``
    — filtering ``is_representative`` yields the deduplicated corpus
    (deterministic keep-lowest-id policy)."""
    cc = connected_components(pairs, a_col, b_col, out_id=id_col)
    ids = all_ids.select(id_col).distinct()
    return (
        # no broadcast hint: cc is usually small (docs-in-pairs only) and
        # AQE will broadcast it; on a dup-heavy corpus it can approach
        # corpus size and must be allowed to shuffle-join
        ids.join(cc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn(
            "is_representative", (F.col(id_col) == F.col("cluster_id"))
        )
    )


def select_representatives(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "quality",
) -> DataFrame:
    """Quality-based near-dup retention: per cluster keep the member
    with the HIGHEST score (ties broken by lowest id) — the policy a
    production curation pipeline actually wants, vs. the structural
    keep-lowest-id default of :func:`near_dup_clusters`.

    Returns (cluster_id, rep_id, score_col). One Exchange on
    ``cluster_col`` (a top-1 window — works for ANY orderable id type;
    a max(struct(score, −id)) aggregate would be map-side combined but
    silently yields NULLs for string ids, so correctness wins here).
    ``scores`` is (id, score), e.g. ``quality_score_expr`` output.
    """
    from pyspark.sql.window import Window

    joined = clusters.join(scores, id_col)
    w = Window.partitionBy(cluster_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            cluster_col,
            F.col(id_col).alias("rep_id"),
            F.col(score_col),
        )
    )
