"""Data-quality expectation gates: declarative checks, one pass.

The ingestion-side complement of the engine's ANALYZE statistics
(plans/lake.py): before (or after) a batch lands, assert what the data
MUST look like — and get the violation counts, not just a boolean.
Checks are declarative rules; evaluation is a SINGLE aggregate pass
over the input regardless of rule count (every rule compiles to a
conditional sum / distinct count inside one ``agg``), so at 100 TB a
ten-rule gate costs the same scan as a one-rule gate.

Supported checks (``rule = {"column", "check", ...}``):

* ``not_null`` — violations = rows where the column is null
* ``unique`` — violations = rows beyond the first per distinct value
  (exact ``count - countDistinct``, counting nulls as one value)
* ``min`` / ``max`` — ``{"value": bound}``; violations = rows outside
  the closed bound (nulls are NOT violations here; add ``not_null``)
* ``in_set`` — ``{"values": [...]}``; violations = non-null rows
  outside the set
* ``matches`` — ``{"pattern": regex}``; violations = non-null rows not
  fully matching (Java regex via ``rlike`` anchored)

Output: one row per rule — (rule_idx, column, check, n_rows,
violations, passed) — built by exploding an array of structs out of
the single aggregate row: still a DataFrame, no driver reshaping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

_CHECKS = ("not_null", "unique", "min", "max", "in_set", "matches")


def _violations(rule: dict, idx: int) -> Column:
    col = F.col(rule["column"])
    check = rule["check"]
    if check == "not_null":
        return F.sum(col.isNull().cast("long"))
    if check == "unique":
        dups = F.count(col) - F.countDistinct(col)
        extra_null = F.greatest(
            F.sum(col.isNull().cast("long")) - F.lit(1), F.lit(0))
        return dups + extra_null
    if check == "min":
        return F.sum((col < F.lit(rule["value"])).cast("long"))
    if check == "max":
        return F.sum((col > F.lit(rule["value"])).cast("long"))
    if check == "in_set":
        return F.sum((~col.isin(list(rule["values"])) & col.isNotNull())
                     .cast("long"))
    if check == "matches":
        pat = f"^(?:{rule['pattern']})$"
        return F.sum((~col.rlike(pat) & col.isNotNull()).cast("long"))
    raise ValueError(
        f"rule {idx}: unknown check {check!r} (one of {_CHECKS})")


def expectation_report(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate every rule in one aggregate pass; returns a DataFrame
    of (rule_idx, column, check, n_rows, violations, passed), one row
    per rule, ordered by rule_idx."""
    if not rules:
        raise ValueError("expectation_report: rules must be non-empty")
    for i, r in enumerate(rules):
        if "column" not in r or "check" not in r:
            raise ValueError(f"rule {i}: needs 'column' and 'check'")
        if r["column"] not in df.columns:
            raise ValueError(f"rule {i}: unknown column {r['column']!r}")
    aggs = [F.count("*").cast("long").alias("n_rows")] + [
        F.coalesce(_violations(r, i), F.lit(0)).cast("long").alias(f"v{i}")
        for i, r in enumerate(rules)
    ]
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(i).cast("int").alias("rule_idx"),
            F.lit(r["column"]).alias("column"),
            F.lit(r["check"]).alias("check"),
            F.col("n_rows"),
            F.col(f"v{i}").alias("violations"),
            (F.col(f"v{i}") == 0).alias("passed"),
        )
        for i, r in enumerate(rules)
    ])
    return one.select(F.explode(rows).alias("r")).select("r.*")


def enforce_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Gate form: return ``df`` unchanged if every rule passes, raise
    ``ExpectationError`` naming each failed rule and its violation
    count otherwise. The report is one job (a 1-row collect of bounded
    size — #rules structs)."""
    failed = [
        f"rule {r['rule_idx']} ({r['check']} on {r['column']}): "
        f"{r['violations']} violations"
        for r in expectation_report(df, rules).collect()
        if not r["passed"]
    ]
    if failed:
        raise ExpectationError("; ".join(failed))
    return df


class ExpectationError(ValueError):
    """One or more data-quality expectations failed."""
