"""Text-analysis expressions for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All pure Catalyst column expressions (JVM-side, whole-stage codegen) —
no UDFs. Each has an exact ANSI-SQL twin in ``entry_queries.py`` so the
driver's DuckDB oracle can verify it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: BPE-ish tokenizer regex: letter runs, digit runs, single punctuation
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^A-Za-z0-9\s]"

#: marker stopwords per language for the n-gram/marker-word heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "de", "y", "es"],
}
CJK_RE = r"[一-鿿]"


def ws_token_count(text: str | Column = "text") -> Column:
    """Whitespace token count."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(F.trim(c), r"\s+")).cast("long")


def bpe_token_count(text: str | Column = "text") -> Column:
    """BPE-ish token count: letter runs + digit runs + punctuation marks."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), F.lit(0))).cast("long")


def punct_count(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(PUNCT_RE), F.lit(0))).cast("long")


def marker_count(text: Column, word: str) -> Column:
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit(rf"\b{word}\b"), F.lit(0))
    ).cast("long")


def lang_score(text: Column, lang: str) -> Column:
    total = F.lit(0).cast("long")
    for w in LANG_MARKERS[lang]:
        total = total + marker_count(text, w)
    return total


def lang_id_expr(text: str | Column = "text") -> Column:
    """Marker-word language ID with a fixed tie-break order
    (zh by CJK presence, then en >= de >= fr >= es)."""
    c = F.col(text) if isinstance(text, str) else text
    en, de, fr, es = (lang_score(c, l) for l in ("en", "de", "fr", "es"))
    has_cjk = F.size(F.regexp_extract_all(c, F.lit(CJK_RE), F.lit(0))) > 0
    return (
        F.when(has_cjk, F.lit("zh"))
        .when((en >= de) & (en >= fr) & (en >= es), F.lit("en"))
        .when((de >= fr) & (de >= es), F.lit("de"))
        .when(fr >= es, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def quality_score_expr(text: str | Column = "text") -> Column:
    """Deterministic quality heuristic in [0,1]:
    length factor × (1 − punct ratio) × (0.25 + 0.75·stopword presence).
    Rounded to 6 decimals so engine/oracle hashes agree."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = ws_token_count(c)
    n_chars = F.length(c).cast("long")
    punct = punct_count(c)
    stop = lang_score(c, "en")
    len_factor = F.least(F.lit(1.0), n_tok.cast("double") / F.lit(100.0))
    punct_ratio = punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    stop_ratio = F.least(
        F.lit(1.0), stop.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double") * F.lit(10.0)
    )
    return F.round(
        len_factor * (F.lit(1.0) - punct_ratio) * (F.lit(0.25) + F.lit(0.75) * stop_ratio), 6
    )


def fingerprint_expr(df: DataFrame, text_col: str = "text", window: int = 16) -> DataFrame:
    """Winnowing-style document fingerprint: the minimum md5 over all
    ``window``-char substrings (rolling windows). Returns
    (doc_id, fingerprint). Explode + min — fully distributed, map-side
    partial agg collapses before any shuffle."""
    g = F.explode(
        F.sequence(F.lit(1), F.greatest(F.length(F.col(text_col)) - (window - 1), F.lit(1)))
    ).alias("g")
    shingled = df.select("doc_id", F.col(text_col).alias("__t"), g)
    return (
        shingled.select(
            "doc_id", F.md5(F.substring(F.col("__t"), F.col("g"), window).cast("binary")).alias("h")
        )
        .groupBy("doc_id")
        .agg(F.min("h").alias("fingerprint"))
    )
