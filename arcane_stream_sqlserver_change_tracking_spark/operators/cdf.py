"""Change Data Feed: row-level diff between two committed table states.

The reference engine consumes SQL Server's change feed; the natural
downstream counterpart is *producing* one — "what changed between
snapshot A and snapshot B of the replicated table" — so a consumer can
incrementally sync from the lake without re-reading the full table
(Iceberg's `create_changelog_view` / Delta's CDF serve the same need;
the reference targets exactly such engines via its Iceberg sink,
/root/reference/src/main/scala/main.scala:80-84).

Two layers:

* :func:`snapshot_diff` — a pure DataFrame operator: FULL OUTER join of
  the two states on the key columns, null-safe per-column comparison,
  `_change_type ∈ {insert, update_postimage, delete}`. Post-image for
  inserts/updates, pre-image for deletes (the row a consumer must
  retract). One shuffle per side (hash exchange on the key), then a
  single-pass whole-stage-codegen projection — no UDF, no collect.

* ``LakeTable.changes_between`` (plans/lake.py) — the scale layer: this
  engine's tables are copy-on-write with per-bucket manifests, so a
  bucket whose manifest file is the SAME object in both snapshots
  cannot contain a changed row. The diff therefore plans from the
  manifest delta and scans ONLY touched buckets on both sides —
  metadata-bounded IO, the same trick merge uses for its bucket-pruned
  anti-join. On a 10k-bucket 100 TB table where a batch touched 3
  buckets, the CDF reads 3 buckets twice instead of the table twice.

Determinism: the diff is a set operation over committed states — no
ordering sensitivity, so it oracles exactly against a SQL FULL OUTER
JOIN replay.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

CHANGE_TYPE_COL = "_change_type"

CT_INSERT = "insert"
CT_UPDATE = "update_postimage"
CT_DELETE = "delete"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_columns: Sequence[str],
    compare_columns: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level changes that turn ``old`` into ``new``.

    Returns one row per changed key with the table's columns
    (post-image for insert/update, pre-image for delete) plus
    ``_change_type``. Keys whose compared columns are all null-safe
    equal are dropped — an idempotent re-apply produces an empty feed.

    ``compare_columns`` defaults to every non-key column the two inputs
    share; columns present on only one side (schema evolution between
    the snapshots) are compared as null on the missing side and
    null-padded in the output, mirroring the lake's read-time
    evolution.
    """
    keys = list(key_columns)
    old_cols = [c for c in old.columns if c not in keys]
    new_cols = [c for c in new.columns if c not in keys]
    # evolved union, new side's order first — the output schema
    payload = list(dict.fromkeys(new_cols + old_cols))
    if compare_columns is None:
        compare_columns = payload

    def _pad(df: DataFrame, have: list[str]) -> DataFrame:
        missing = [c for c in payload if c not in have]
        return df.select(
            *keys,
            *[F.col(c) for c in payload if c in have],
            *[F.lit(None).alias(c) for c in missing],
        )

    o = _pad(old, old_cols).alias("o")
    n = _pad(new, new_cols).alias("n")
    on = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys]
    joined = o.join(n, on, "full_outer")

    # presence probes: a key's side "exists" iff the join found a row
    # there. NULL key columns never match across sides under eqNullSafe
    # semantics here (both sides' keys come from the same merge-key
    # domain, which the engine never leaves null), so first(keys) works.
    o_present = F.col(f"o.{keys[0]}").isNotNull()
    for k in keys[1:]:
        o_present = o_present | F.col(f"o.{k}").isNotNull()
    n_present = F.col(f"n.{keys[0]}").isNotNull()
    for k in keys[1:]:
        n_present = n_present | F.col(f"n.{k}").isNotNull()

    same = F.lit(True)
    for c in compare_columns:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))

    change = (
        F.when(~o_present, F.lit(CT_INSERT))
        .when(~n_present, F.lit(CT_DELETE))
        .when(~same, F.lit(CT_UPDATE))
    )  # NULL → unchanged, filtered below

    side = F.when(F.col(CHANGE_TYPE_COL) == CT_DELETE, F.lit("o")).otherwise(F.lit("n"))
    out = (
        joined.withColumn(CHANGE_TYPE_COL, change)
        .filter(F.col(CHANGE_TYPE_COL).isNotNull())
        .select(
            *[
                F.when(side == "o", F.col(f"o.{k}")).otherwise(F.col(f"n.{k}")).alias(k)
                for k in keys
            ],
            *[
                F.when(side == "o", F.col(f"o.{c}")).otherwise(F.col(f"n.{c}")).alias(c)
                for c in payload
            ],
            CHANGE_TYPE_COL,
        )
    )
    return out
