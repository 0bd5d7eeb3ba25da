"""SCD Type-2 history from a change feed.

The reference replays net changes into a Type-1 replica (latest row per
``arcane_merge_key`` wins — Fixtures.scala's change-replay contract);
the other standard shape a warehouse consumer asks of the SAME feed is
Type-2: keep every version of a key as a row with a validity interval,
so point-in-time queries (`AS OF` version v) work without snapshot
storage. This operator derives the full SCD2 history in one pass over
the changelog — no iterative merge, no state store.

Plan shape (the 100 TB story): a single hash Exchange on the key
columns feeds one window (``lead(version)`` over key, ordered by
version) — the same one-Exchange profile as the engine's net-change
dedup, with map-side projection before the shuffle. No UDF, no
self-join: the interval close is the next change's open, which `lead`
reads from the already-sorted partition run.

Semantics:

* every non-delete change opens an interval at its own version;
* the interval closes at the key's NEXT change version (whatever its
  operation) — exclusive bound, so intervals for a key tile the version
  axis without overlap;
* a delete closes the prior interval and opens none, so a key whose
  last change is a delete has no current row;
* ``is_current`` marks the one open interval (valid_to null and not a
  delete).

Point-in-time read: ``valid_from <= v AND (valid_to IS NULL OR
valid_to > v)``. Exactly SQL-expressible (window + lead), so the
operator oracles directly against DuckDB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.keys import OP_DELETE

VALID_FROM_COL = "valid_from_version"
VALID_TO_COL = "valid_to_version"
IS_CURRENT_COL = "is_current"


def scd2_history(
    changes: DataFrame,
    key_columns: Sequence[str],
    version_col: str,
    op_col: str,
    payload_columns: Sequence[str] | None = None,
) -> DataFrame:
    """Type-2 dimension history of ``changes``.

    One row per non-delete change event, carrying the key columns, the
    payload columns (default: everything except version/op), and
    ``valid_from_version`` / ``valid_to_version`` (exclusive, null =
    open) / ``is_current``.

    ``changes`` must hold at most one event per (key, version) — the
    raw feed shape the engine's sources guarantee (SYS_CHANGE_VERSION
    is per-row unique in CHANGETABLE output; ties would make "next
    change" ambiguous in any engine).
    """
    keys = list(key_columns)
    if payload_columns is None:
        payload_columns = [
            c for c in changes.columns if c not in keys and c not in (version_col, op_col)
        ]
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).asc())
    return (
        changes.select(*keys, version_col, op_col, *payload_columns)
        .withColumn(VALID_TO_COL, F.lead(F.col(version_col)).over(w))
        .filter(F.col(op_col) != OP_DELETE)
        .select(
            *keys,
            *payload_columns,
            F.col(version_col).alias(VALID_FROM_COL),
            F.col(VALID_TO_COL),
            (F.col(VALID_TO_COL).isNull()).alias(IS_CURRENT_COL),
        )
    )
