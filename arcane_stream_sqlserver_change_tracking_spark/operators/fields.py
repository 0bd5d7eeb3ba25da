"""P1/P2 — field filtering (column projection) with essential-field guard.

Reference: ``FieldsFilteringService`` + ``FieldFilteringTransformer``
(main.scala:73,76) project columns by rule ``all`` / ``include(fields)``
/ ``exclude(fields)``; the CDC metadata columns (``essentialFields``,
CRD:413-421) can never be dropped (docs/crd.md:224-241).

Server-side selection (P2, ``isServerSide: true``) is Catalyst column
pruning: because this operator is a plain ``select``, the projection
reaches the parquet scan (``ReadSchema`` in ``.explain``) for free.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Sequence

from pyspark.sql import DataFrame

from ..functions.keys import ESSENTIAL_FIELDS


@dataclass(frozen=True)
class FieldFilter:
    """rule: ``all`` | ``include`` | ``exclude`` (docs/crd.md:229-239)."""

    rule: str = "all"
    fields: Sequence[str] = field(default_factory=tuple)
    essential: Sequence[str] = ESSENTIAL_FIELDS

    def __post_init__(self) -> None:
        if self.rule not in ("all", "include", "exclude"):
            raise ValueError(f"unknown field filter rule: {self.rule!r}")

    def apply(self, df: DataFrame) -> DataFrame:
        if self.rule == "all":
            return df
        present = list(df.columns)
        essential = [c for c in present if c.lower() in {e.lower() for e in self.essential}]
        wanted = {f.lower() for f in self.fields}
        if self.rule == "include":
            keep = [c for c in present if c.lower() in wanted or c in essential]
        else:  # exclude
            keep = [c for c in present if c.lower() not in wanted or c in essential]
        return df.select(*keep)
