"""Arrow-vectorized text normalization (pandas UDF — the only Python
touching data in the hot path; everything else is Catalyst expressions).

The reference applies no scalar transforms to user data (SURVEY.md §2.8),
but our transcript payload requires normalization per BASELINE.json
``input_hint`` ("vectorized pandas/Arrow UDFs (no per-row Python)").
Pattern: Series→Series ``pandas_udf`` so Spark ships Arrow batches and
pandas executes the whole batch vectorized.

``normalize_text_pandas`` is the exact same function applied to a plain
pandas Series — tests use it as the oracle so engine and oracle share
one definition.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def normalize_text_pandas(s: pd.Series) -> pd.Series:
    """NFC-normalize, strip C0 control chars (except \\t\\n), collapse
    whitespace runs, trim. Vectorized pandas string ops throughout."""
    out = s.str.normalize("NFC")
    out = out.str.replace(_CTRL_RE, "", regex=True)
    out = out.str.replace(r"\s+", " ", regex=True)
    return out.str.strip()


def normalize_text_expr(col: Column | str) -> Column:
    """The same normalization as a pure Catalyst expression chain —
    whole-stage codegen, zero Arrow serialization. This is the engine's
    default hot path: shipping the text column to Python workers and
    back costs ~2× the column's bytes in socket traffic per batch, which
    dominates batch time at scale, while regexp_replace runs inside the
    JVM scan-project pipeline for free.

    Identical to :func:`normalize_text_pandas` on ASCII text; the
    pandas path additionally applies unicode NFC (Catalyst has no NFC
    builtin), so corpora needing true NFC select
    ``normalize_impl="pandas"`` (EngineOptions)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(F.regexp_replace(c, _CTRL_RE, ""), r"\s+", " ")
    )


# DataType instance (not DDL string) so the UDF can be declared without
# an active SparkSession at import time
normalize_text = F.pandas_udf(normalize_text_pandas, T.StringType())


# --- PII redaction (training-data scrubbing) -------------------------------
# Patterns deliberately use only regex constructs with identical semantics
# in java.util.regex (Spark codegen) and RE2 (DuckDB oracle): character
# classes, bounded/greedy quantifiers, no backreferences or lookarounds.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def redact_pii_expr(col: Column | str) -> Column:
    """Scrub emails/phone numbers from a text column — pure Catalyst
    ``regexp_replace`` chain (whole-stage codegen, no UDF), the hot-path
    shape for corpus-wide scrubbing: one pass over the bytes per
    pattern, zero shuffles, fully pushdown-compatible."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, PII_EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(c, PII_PHONE_RE, "[PHONE]")
