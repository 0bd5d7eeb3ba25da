"""K6 — additive-only schema evolution.

Reference contract (SchemaMigrationProcessor, main.scala:104; pinned by
SchemaMigrationTests.scala:160-251):

* columns **added** at the source appear in the target; rows written
  before the addition read as NULL in the new column (:163-166);
* columns **dropped** at the source are **retained** in the target;
  rows written after the drop read as NULL there (:209-212) — evolution
  is never destructive, schemas are merged, not synced.

We diff the incoming batch schema against the table schema and produce
the evolved target schema (target fields first — stable field order —
then new fields in batch order). Type changes are rejected: the
reference has no type-widening path either.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T


class SchemaEvolutionError(ValueError):
    pass


@dataclass
class SchemaDiff:
    added: list[T.StructField]
    missing: list[str]          # present in target, absent in batch (retained)
    evolved: T.StructType       # target schema after merge

    @property
    def changed(self) -> bool:
        return bool(self.added)


def _compatible(a: T.DataType, b: T.DataType) -> bool:
    if a == b:
        return True
    # timestamp (ltz) vs timestamp_ntz: value-identical under a UTC
    # session; the merge path casts to the target type anyway
    ts_types = (T.TimestampType(), T.TimestampNTZType())
    return a in ts_types and b in ts_types


def diff_schemas(
    target: T.StructType,
    batch: T.StructType,
    system_columns: tuple[str, ...] = (),
) -> SchemaDiff:
    target_by_name = {f.name: f for f in target.fields}
    added: list[T.StructField] = []
    for f in batch.fields:
        if f.name in system_columns:
            continue
        existing = target_by_name.get(f.name)
        if existing is None:
            added.append(T.StructField(f.name, f.dataType, nullable=True))
        elif not _compatible(existing.dataType, f.dataType):
            raise SchemaEvolutionError(
                f"type change for column {f.name!r}: "
                f"{existing.dataType.simpleString()} -> {f.dataType.simpleString()} "
                "(only additive evolution is supported, like the reference)"
            )
    batch_names = {f.name for f in batch.fields}
    missing = [
        f.name
        for f in target.fields
        if f.name not in batch_names and f.name not in system_columns
    ]
    evolved = T.StructType(list(target.fields) + added)
    return SchemaDiff(added=added, missing=missing, evolved=evolved)
