"""Corpus-scale deduplication operators for training-data pipelines:
exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB:

* everything is explode → hash → groupBy with map-side partial
  aggregation (Catalyst collapses per-task before shuffling);
* candidate generation is always *bucketed* (LSH band / simhash band /
  shared shingle) so the pair join is an equi-join on a bucket key —
  never an O(n²) cross join;
* hash functions are md5-derived so they are engine-independent — the
  DuckDB oracle computes the identical signatures (no Spark-private
  hash in any data path that needs cross-engine verification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: one surviving (min id) row per
    distinct text. Returns (text_hash, keep_id, n_dups)."""
    return (
        df.select(F.md5(F.col(text_col).cast("binary")).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").cast("long").alias("n_dups"))
    )


def char_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """Distinct character k-gram shingles per document: (id, shingle)."""
    pos = F.explode(
        F.sequence(F.lit(1), F.greatest(F.length(F.col(text_col)) - (k - 1), F.lit(1)))
    ).alias("g")
    return (
        df.select(F.col(id_col), F.col(text_col).alias("__t"), pos)
        .select(id_col, F.substring(F.col("__t"), F.col("g"), k).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame, num_perms: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash signature per doc: perm i = min over shingles of
    md5(i || ':' || shingle). One groupBy, num_perms mins — map-side
    combined, engine-independent (md5)."""
    aggs = [
        F.min(
            F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")).cast("binary"))
        ).alias(f"mh{i}")
        for i in range(num_perms)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_bands(
    signatures: DataFrame, num_perms: int = 16, num_bands: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Band table: (id, band_idx, band_hash) — docs agreeing on all rows
    of any band share a bucket."""
    rows_per_band = num_perms // num_bands
    bands = []
    for b in range(num_bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(
            F.struct(F.lit(b).alias("band_idx"), F.md5(F.concat_ws("|", *cols).cast("binary")).alias("band_hash"))
        )
    return signatures.select(
        id_col, F.explode(F.array(*bands)).alias("band")
    ).select(id_col, F.col("band.band_idx").alias("band_idx"), F.col("band.band_hash").alias("band_hash"))


def lsh_candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct candidate pairs (a < b) sharing any LSH band bucket.
    Equi-join on (band_idx, band_hash): shuffle scales with bucket
    sizes, not corpus²."""
    a = bands.select(F.col(id_col).alias("a"), "band_idx", "band_hash")
    b = bands.select(F.col(id_col).alias("b"), "band_idx", "band_hash")
    return (
        a.join(b, on=["band_idx", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    num_perms: int = 16,
    num_bands: int = 4,
) -> DataFrame:
    """Full MinHash-LSH near-dup candidate pipeline → (a, b) pairs."""
    sh = char_shingles(df, text_col, id_col, k)
    sig = minhash_signatures(sh, num_perms, id_col)
    bands = lsh_bands(sig, num_perms, num_bands, id_col)
    return lsh_candidate_pairs(bands, id_col)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    threshold: float = 0.5,
    max_shingle_doc_freq: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle:
    |A∩B| / |A∪B| ≥ threshold → (a, b, jaccard rounded to 6).

    The shingle self-join is the candidate generator (equi-join on the
    shingle value), so pair counts are bounded by shingle bucket widths.
    ``max_shingle_doc_freq`` is the skew guard: a "stop shingle" shared
    by d documents would alone contribute d² join rows, so shingles with
    document frequency above the cap are dropped from the candidate
    join (one extra groupBy — the standard df-cap). Union sizes (the
    jaccard denominator) still use the FULL shingle sets, so for pairs
    that survive, the reported jaccard is exact when their shared
    shingles are all under the cap and a strict lower bound otherwise —
    a dropped ultra-common shingle can only remove candidates, never
    inflate similarity. With the cap above the corpus's max df (as in
    the driver query) results are identical to the uncapped operator."""
    sh = char_shingles(df, text_col, id_col, k)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    if max_shingle_doc_freq is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_shingle_doc_freq)
            .select("shingle")
        )
        sh_join = sh.join(keep, "shingle")
    else:
        sh_join = sh
    a = sh_join.select(F.col(id_col).alias("a"), "shingle")
    b = sh_join.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("a", "b", "jaccard")
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """SimHash per document over whitespace tokens.

    Token hash = first 8 hex chars of md5 (32 bits, engine-independent).
    Bit j of the simhash is set iff sum over tokens of (2·bit_j − 1) > 0,
    i.e. iff 2·(count of tokens with bit j set) > token count.
    Returns (id, simhash:long).

    One aggregation pass: each bit is its own ``sum`` column over the
    token rows (``bits`` agg expressions in a single groupBy — all
    whole-stage codegen, map-side combined, ONE shuffle keyed by doc),
    then the final select folds the per-bit counts into the hash. No
    tokens×bits row explosion — the intermediate is |tokens| rows wide,
    not 32·|tokens| tall."""
    tokens = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).select(
        id_col,
        F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    )
    sums = tokens.groupBy(id_col).agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.expr(f"shiftright(h, {j}) & 1")).alias(f"b{j}")
            for j in range(bits)
        ],
    )
    folded = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") * 2 > F.col("n"), F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        folded = term if folded is None else folded + term
    return sums.select(id_col, folded.cast("long").alias("simhash"))


def token_vocab(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 100,
    exact_doc_freq: bool = True,
) -> DataFrame:
    """Corpus vocabulary: the ``top_k`` whitespace tokens by total
    count, with document frequency — the first step of BPE training /
    stop-list construction over a corpus.

    Plan shape at 100 TB: explode → ONE hash aggregate keyed by token
    (map-side combined, so the shuffle carries distinct tokens per
    partition, not token occurrences) → global top-k via
    ``orderBy().limit()``, which Spark compiles to
    TakeOrderedAndProject: each partition keeps its local top-k heap
    and only k rows per partition reach the driver-side merge — never
    a global sort. Ties broken by token text so the result set is
    deterministic across engines and partitionings.

    ``exact_doc_freq``: exact ``countDistinct`` triggers Spark's
    distinct-aggregate rewrite — measured on Spark 4.1: four
    HashAggregate stages over TWO Exchanges (partial/merge keyed by
    (token, doc_id), then partial/final by token) — exact is the
    oracle default and fine to sf-scale, but at corpus scale pass
    ``False`` to use ``approx_count_distinct`` (HyperLogLog++, ~2%
    relative error): the sketch is mergeable, so the plan collapses to
    the ordinary map-side-combined shape — ONE Exchange carrying one
    sketch per (partition, token). Plan shapes pinned by
    tests/test_corpus.py."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).filter(F.col("token") != "")
    doc_freq = (
        F.countDistinct(id_col) if exact_doc_freq
        else F.approx_count_distinct(id_col)
    )
    agg = toks.groupBy("token").agg(
        F.count("*").alias("total_count"),
        doc_freq.alias("doc_freq"),
    )
    return agg.orderBy(F.col("total_count").desc(), F.col("token")).limit(top_k)


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    min_overlap: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Eval-set decontamination: drop training documents that share
    character ``k``-gram shingles with a held-out benchmark corpus
    (the standard guard against test-set leakage in LLM training data —
    Brown et al. 2020 §C use 13-gram overlap; same shape here).

    Returns ``(clean_docs, report)`` where ``report`` is
    ``(id, eval_overlap)`` for every contaminated document.

    100 TB shape: the eval side is a benchmark suite — thousands of
    documents, not billions — so its distinct shingle set is explicitly
    ``broadcast()``: the training corpus is scanned ONCE, each task
    probes the in-memory eval-shingle hash table (no shuffle of the
    corpus for the join), and only (id, overlap) pairs — bounded by
    contaminated-doc count — reach the map-side-combined groupBy. The
    final drop is a broadcast LEFT ANTI join on the (small) report.
    """
    doc_sh = char_shingles(docs, text_col, id_col, k)
    eval_sh = char_shingles(eval_docs, text_col, id_col, k).select("shingle").distinct()
    report = (
        doc_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("eval_overlap"))
        .filter(F.col("eval_overlap") >= min_overlap)
    )
    clean = docs.join(F.broadcast(report.select(id_col)), id_col, "left_anti")
    return clean, report


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document LINE-level exact dedup (the C4-style sub-document
    cleaning step): every non-empty line that appears more than once in
    the corpus survives only at its FIRST occurrence — lowest
    (doc id, line position) — and is removed everywhere else. Documents
    are reassembled from their surviving lines in original order.

    Returns (id, clean_text, kept_lines, dropped_lines) for EVERY input
    document (a document whose lines were all boilerplate comes back
    with clean_text = '' rather than vanishing, so downstream length
    filters see it).

    100 TB shape: posexplode → ONE hash Exchange on the line's md5 (the
    128-bit digest is the shuffle key, not the line text), map-side
    combined min(struct(id, pos)) picks winners, and the occurrence→
    winner equi-join reuses the same hash partitioning (no extra
    Exchange under AQE). Reassembly is one groupBy(id) whose state is
    bounded by a single document's lines. Nothing in the plan is
    quadratic and no driver-side work exists.
    """
    base = df.select(F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias("__t"))
    lines = base.select(
        id_col, F.posexplode(F.split(F.col("__t"), "\n")).alias("pos", "line")
    ).filter(F.col("line") != "")
    occ = lines.select(id_col, "pos", "line", F.md5(F.col("line").cast("binary")).alias("h"))
    winners = occ.groupBy("h").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias("w")
    )
    flagged = occ.join(winners, "h").select(
        id_col,
        "pos",
        "line",
        ((F.col("w")["i"] == F.col(id_col)) & (F.col("w")["p"] == F.col("pos"))).alias("keep"),
    )
    rebuilt = flagged.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct(F.col("pos"), F.col("line")))
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
        F.sum(F.col("keep").cast("long")).alias("kept_lines"),
        F.sum((~F.col("keep")).cast("long")).alias("dropped_lines"),
    )
    return (
        base.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("kept_lines", F.lit(0).cast("long")).alias("kept_lines"),
            F.coalesce("dropped_lines", F.lit(0).cast("long")).alias("dropped_lines"),
        )
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Fixed-token-window document chunking with overlap — the
    context-window preparation step of embedding / retrieval / training
    pipelines (long documents become overlapping ``max_tokens``-token
    chunks; the overlap preserves cross-boundary context).

    Chunk starts are 0, stride, 2·stride, … while start < n_tokens
    (stride = max_tokens − overlap); every document yields chunk 0, so
    empty documents produce one empty chunk rather than vanishing.
    Chunk text re-joins tokens with single spaces (whitespace
    normalization, as tokenizers do). Returns
    (id, chunk_idx, chunk_text, chunk_tokens).

    100 TB shape: a pure per-row explode in the scan stage — zero
    shuffle, output bounded by n_tokens/stride rows per document; the
    token array is materialized once per row and shared by the slice
    and the count.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap < max_tokens, got {overlap}/{max_tokens}")
    stride = max_tokens - overlap
    tokens = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    d = df.select(F.col(id_col), tokens.alias("__w"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("__w") - 1, F.lit(0)), F.lit(stride)
    )
    e = d.select(id_col, "__w", F.posexplode(starts).alias("__i", "__s"))
    chunk = F.slice(F.col("__w"), F.col("__s") + 1, max_tokens)
    return e.select(
        id_col,
        F.col("__i").cast("long").alias("chunk_idx"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
    )


def token_commonness(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    exact_doc_freq: bool = True,
) -> DataFrame:
    """Corpus-frequency document scoring (the CCNet-style signal):
    per document, the mean corpus term-frequency and mean document-
    frequency of its tokens. Rare-token-heavy documents (gibberish,
    OCR noise, wrong-language fragments) score LOW; boilerplate and
    stop-word soup score HIGH — both tails are filter candidates, and
    the middle band is what LM-quality bucketing keeps.

    Returns (id, n_tokens, mean_token_tf, mean_token_df). All sums are
    exact bigints with ONE final division per document, so the score is
    bit-identical across engines (no transcendental functions — a
    deliberate substitute for log-probability LM scoring, which is not
    reproducible bit-for-bit across libm implementations).

    100 TB shape: one map-side-combined vocabulary aggregate (tf = total
    occurrences, df = distinct docs per token), then the token
    stream joins the (vocab-sized, corpus-independent) counts table —
    AQE broadcasts it when small; at web scale cap it to the top-K
    vocabulary plus a floor for the tail, as CCNet does — and one
    per-document aggregate. Nothing is quadratic.

    ``exact_doc_freq``: same treatment as :func:`token_vocab` — exact
    ``countDistinct`` (the oracle default; bit-exact cross-engine)
    triggers Spark's distinct-aggregate rewrite, TWO Exchanges for the
    vocabulary aggregate; at corpus scale pass ``False`` for
    ``approx_count_distinct`` (HLL++, mergeable sketch → ONE map-side-
    combined Exchange). The approx path changes only ``mean_token_df``
    (a ~2%-error quality SIGNAL used for band thresholds, where HLL
    error is immaterial); ``n_tokens`` and ``mean_token_tf`` stay
    exact. Plan shapes pinned by tests/test_corpus.py.
    """
    base = df.select(F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias("__t"))
    tok = base.select(
        id_col,
        F.explode(F.split(F.lower(F.col("__t")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    doc_freq = (
        F.countDistinct(id_col) if exact_doc_freq
        else F.approx_count_distinct(id_col)
    )
    counts = tok.groupBy("token").agg(
        F.count("*").cast("long").alias("tf"),
        doc_freq.cast("long").alias("dfreq"),
    )
    per_doc = (
        tok.join(counts, "token")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("tf").alias("__sum_tf"),
            F.sum("dfreq").alias("__sum_df"),
        )
    )
    def _mean(col: str):
        return F.round(
            F.col(col).cast("double") / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"), 6
        )
    return (
        base.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce(_mean("__sum_tf"), F.lit(0.0)).alias("mean_token_tf"),
            F.coalesce(_mean("__sum_df"), F.lit(0.0)).alias("mean_token_df"),
        )
    )
