"""Semi-structured (JSON string) columns: parse, flatten, and infer.

CDC feeds routinely carry a JSON payload column (this repo's synthetic
``events.props`` mirrors that); the reference engine forwards such
columns opaquely (SURVEY.md §1.2 — flat relational model), and so does
our CDC path. This module adds the extraction layer a training-data /
analytics pipeline needs on top:

* :func:`parse_json_column` — ``F.from_json`` with an explicit schema:
  the parse runs INSIDE Catalyst (JsonToStructs — JVM, no Python, no
  shuffle; a scan-stage projection), malformed documents become null
  structs instead of failed tasks.
* :func:`flatten_struct` — promote struct fields to prefixed top-level
  columns (pure projection).
* :func:`infer_json_schema` — merge the schemas of a BOUNDED sample of
  documents into one Spark StructType. The sample is collected to the
  driver (same bounded-metadata class as k-means centroids: explicitly
  capped by ``sample_rows``, never the corpus). Inference is for
  exploration — production pipelines pin the inferred schema in config
  so a drifting upstream fails loudly in the parse, not silently in
  the consumer.

100 TB shape: parse + flatten are zero-Exchange row projections;
schema inference scans one bounded ``limit()`` slice. Nothing here
depends on document count.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_json_column(
    df: DataFrame,
    col: str,
    schema: T.StructType | str,
    out: str | None = None,
    drop_source: bool = False,
) -> DataFrame:
    """Parse a JSON string column with an explicit schema (DDL string
    or StructType). Malformed rows yield a null struct (Spark's
    PERMISSIVE mode) — the 100 TB-safe default, where one bad document
    must not kill a task. The parsed struct lands in ``out``
    (default ``{col}_parsed``)."""
    out = out or f"{col}_parsed"
    parsed = df.withColumn(out, F.from_json(F.col(col), schema))
    return parsed.drop(col) if drop_source else parsed


def flatten_struct(df: DataFrame, col: str, prefix: str | None = None,
                   drop_source: bool = True) -> DataFrame:
    """Promote every field of a struct column to a top-level column
    named ``{prefix}{field}`` (prefix defaults to ``{col}_``). Pure
    projection — zero shuffle, fully prunable by Catalyst."""
    field_type = df.schema[col].dataType
    if not isinstance(field_type, T.StructType):
        raise ValueError(f"flatten_struct: {col!r} is {field_type}, not a struct")
    prefix = f"{col}_" if prefix is None else prefix
    cols = [c for c in df.columns if c != col or not drop_source]
    return df.select(
        *cols,
        *[F.col(f"{col}.{f.name}").alias(f"{prefix}{f.name}")
          for f in field_type.fields],
    )


def _merge_types(a: T.DataType, b: T.DataType) -> T.DataType:
    """Widen two observed JSON types: long ⊔ double → double, struct ⊔
    struct → field-union, conflicting scalars → string (the JSON
    reader's own fallback)."""
    if a == b:
        return a
    numeric = (T.LongType(), T.DoubleType())
    if a in numeric and b in numeric:
        return T.DoubleType()
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        fields = {f.name: f.dataType for f in a.fields}
        for f in b.fields:
            fields[f.name] = (_merge_types(fields[f.name], f.dataType)
                              if f.name in fields else f.dataType)
        return T.StructType([T.StructField(n, t) for n, t in
                             sorted(fields.items())])
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(_merge_types(a.elementType, b.elementType))
    return T.StringType()


def _type_of(value) -> T.DataType:
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, dict):
        return T.StructType(
            [T.StructField(k, _type_of(v)) for k, v in sorted(value.items())])
    if isinstance(value, list):
        if not value:
            return T.ArrayType(T.StringType())
        t = _type_of(value[0])
        for v in value[1:]:
            t = _merge_types(t, _type_of(v))
        return T.ArrayType(t)
    return T.StringType()  # str and null both land here


def infer_json_schema(df: DataFrame, col: str,
                      sample_rows: int = 1000) -> T.StructType:
    """Infer a StructType from a bounded sample of a JSON string
    column. Collects at most ``sample_rows`` documents to the driver
    (bounded metadata — the cap IS the contract; raise it consciously)
    and unions their shapes: conflicting scalar types widen to string,
    long/double widen to double, structs union their fields.
    Documents that fail to parse as JSON objects are skipped — they
    surface later as null structs in :func:`parse_json_column`."""
    sample = df.select(col).filter(F.col(col).isNotNull()).limit(sample_rows)
    merged: T.DataType | None = None
    for row in sample.collect():
        try:
            doc = json.loads(row[0])
        except (TypeError, ValueError):
            continue
        if not isinstance(doc, dict):
            continue
        t = _type_of(doc)
        merged = t if merged is None else _merge_types(merged, t)
    if not isinstance(merged, T.StructType):
        raise ValueError(
            f"infer_json_schema: no parseable JSON objects in the first "
            f"{sample_rows} rows of {col!r}")
    return merged
