"""Repetition-based document quality statistics (Gopher/C4-style rules).

Web-scale corpus curation drops documents dominated by repeated lines
or repeated n-grams (boilerplate, navigation chrome, generated spam).
The classic signals — popularized by the Gopher and C4 cleaning rules —
are per-document fractions:

* ``dup_line_fraction``       — lines that are repeats of another line
* ``dup_line_char_fraction``  — characters inside such repeated lines
* ``top_word_char_fraction``  — characters claimed by the single most
  frequent word (count × length / total word characters)
* ``top_{n}gram_char_fraction`` — same for the most frequent word n-gram

At 100 TB the wrong plan is explode-words → groupBy(doc, word): that
shuffles the entire tokenized corpus. Every statistic here is computed
INSIDE the row with higher-order array functions (``sort_array`` + a
run-length ``aggregate``), so the whole operator is a projection in the
scan stage: zero Exchange, no UDF, JVM-evaluated. The per-row state is
one 5-field struct regardless of document size.

Exact definitions (shared with the DuckDB oracle in entry_queries.py):
lines = non-empty elements of split(text, '\\n'); words = non-empty
elements of regex-split(lower(text), '\\s+'); n-grams join consecutive
words with a single space. All fractions are round(x, 6) with a
max(denominator, 1) guard so empty documents yield 0.0.

Reference behavioral contract: the reference engine ships rows to a
warehouse where this cleaning runs as downstream SQL; here it is a
first-class operator of the curation pipeline (SURVEY.md §2,
LLM-data-pipeline section).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Gopher-ish default thresholds for the composite keep flag.
DEFAULT_THRESHOLDS = {
    "dup_line_fraction": 0.30,
    "dup_line_char_fraction": 0.20,
    "top_word_char_fraction": 0.20,
    "top_ngram_char_fraction": 0.20,
}


def _nonempty(arr: Column) -> Column:
    return F.filter(arr, lambda x: x != F.lit(""))


def lines_array(text: Column) -> Column:
    """Non-empty lines of the document."""
    return _nonempty(F.split(F.coalesce(text, F.lit("")), "\n"))


def words_array(text: Column) -> Column:
    """Non-empty lowercase whitespace-delimited words."""
    return _nonempty(F.split(F.lower(F.coalesce(text, F.lit(""))), r"\s+"))


def word_ngrams(words: Column, n: int) -> Column:
    """Consecutive word ``n``-grams joined by a single space.

    Pure array transform (no explode): position i contributes
    words[i..i+n-1] when the window fits, else null (filtered).
    """
    return F.filter(
        F.transform(
            words,
            lambda x, i: F.when(
                i + F.lit(n) <= F.size(words), F.concat_ws(" ", F.slice(words, i + 1, n))
            ),
        ),
        lambda x: x.isNotNull(),
    )


def run_length_stats(sorted_arr: Column) -> Column:
    """One-pass run-length scan over a SORTED string array.

    Returns struct(best, dup, total):
      best  = max over distinct values of count × length
      dup   = Σ length over every occurrence of values with count ≥ 2
      total = Σ length over all occurrences
    The "" sentinel for ``prev`` is safe because inputs are pre-filtered
    to non-empty strings.
    """
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("total"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + F.lit(1).cast("long")).otherwise(
            F.lit(1).cast("long")
        )
        ln = F.length(x).cast("long")
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run * ln).alias("best"),
            (
                acc["dup"]
                + F.when(run == 2, F.lit(2).cast("long") * ln)
                .when(run > 2, ln)
                .otherwise(F.lit(0).cast("long"))
            ).alias("dup"),
            (acc["total"] + ln).alias("total"),
        )

    return F.aggregate(
        sorted_arr,
        init,
        step,
        lambda acc: F.struct(
            acc["best"].alias("best"), acc["dup"].alias("dup"), acc["total"].alias("total")
        ),
    )


def _frac(num: Column, den: Column) -> Column:
    return F.round(num.cast("double") / F.greatest(den, F.lit(1)).cast("double"), 6)


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 2,
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Per-document repetition statistics plus a composite ``keep`` flag.

    Output: (id, dup_line_fraction, dup_line_char_fraction,
    top_word_char_fraction, top_{n}gram_char_fraction, keep). ``keep``
    is true when every statistic is ≤ its threshold (compared on the
    rounded values, so the oracle's CASE agrees bit-for-bit).

    Plan shape: two stacked projections, no Exchange — the expensive
    higher-order aggregates are named once in the first projection and
    consumed by cheap arithmetic in the second (CollapseProject leaves
    non-cheap expressions un-inlined, so each scan value is computed
    once).
    """
    th = dict(DEFAULT_THRESHOLDS, **(thresholds or {}))
    text = F.col(text_col)
    ngram_col = f"top_{ngram_n}gram_char_fraction"

    arrays = df.select(
        F.col(id_col),
        lines_array(text).alias("__lines"),
        words_array(text).alias("__words"),
    ).select(
        id_col,
        "__lines",
        "__words",
        word_ngrams(F.col("__words"), ngram_n).alias("__ngrams"),
    )
    scans = arrays.select(
        id_col,
        F.size("__lines").alias("__n_lines"),
        F.size(F.array_distinct("__lines")).alias("__n_uniq"),
        run_length_stats(F.sort_array(F.col("__lines"))).alias("__ls"),
        run_length_stats(F.sort_array(F.col("__words"))).alias("__ws"),
        run_length_stats(F.sort_array(F.col("__ngrams"))).alias("__ns"),
    )
    stats = scans.select(
        id_col,
        _frac(F.col("__n_lines") - F.col("__n_uniq"), F.col("__n_lines")).alias(
            "dup_line_fraction"
        ),
        _frac(F.col("__ls")["dup"], F.col("__ls")["total"]).alias("dup_line_char_fraction"),
        _frac(F.col("__ws")["best"], F.col("__ws")["total"]).alias("top_word_char_fraction"),
        _frac(F.col("__ns")["best"], F.col("__ns")["total"]).alias(ngram_col),
    )
    keep = (
        (F.col("dup_line_fraction") <= F.lit(th["dup_line_fraction"]))
        & (F.col("dup_line_char_fraction") <= F.lit(th["dup_line_char_fraction"]))
        & (F.col("top_word_char_fraction") <= F.lit(th["top_word_char_fraction"]))
        & (F.col(ngram_col) <= F.lit(th["top_ngram_char_fraction"]))
    )
    return stats.withColumn("keep", keep)
