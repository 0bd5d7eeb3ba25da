"""J2 — the MERGE upsert join, expressed as DataFrame operations.

Reference semantics (MergeBatchProcessor → Trino ``MERGE INTO``,
main.scala:74,85; behavior pinned by StreamRunner.scala:254-258 and the
null-padding assertions in SchemaMigrationTests.scala:163-166,209-212)::

    MERGE INTO target t USING batch s ON t.arcane_merge_key = s.arcane_merge_key
    WHEN MATCHED AND s.sys_change_operation = 'D' THEN DELETE
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED AND s.sys_change_operation <> 'D' THEN INSERT *

Because the batch is deduped to one row per key (operators/dedup.py),
the merge is equivalent to::

    retained = target ⟕anti batch.keys        -- rows whose key didn't change
    upserts  = batch WHERE op <> 'D'          -- new current row per changed key
    result   = retained ∪ upserts

which is how we compute the new content of the *touched buckets only*
(plans/lake.py prunes the scan and the rewrite to those buckets).

Physical strategy at scale: the batch (and its key set) is tiny relative
to the table, so both the anti-join and nothing else need a table-side
shuffle — we broadcast the batch keys when the deduped batch is under
``broadcast_threshold`` rows, giving a broadcast-hash anti-join against
a bucket-pruned scan: zero shuffle of table data. Delete events for
never-inserted keys are naturally no-ops (they only appear in the anti
key set). Duplicate-key safety and D-row null payloads are handled
upstream exactly as the reference requires (SURVEY.md §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.keys import MERGE_KEY_COL, OPERATION_COL, OP_DELETE


@dataclass
class MergePlan:
    new_state: DataFrame   # content for the touched buckets after merge
    upserts: DataFrame
    retained: DataFrame


def plan_merge(
    existing: DataFrame,
    deduped_batch: DataFrame,
    target_columns: list[str],
    broadcast_keys: bool = True,
) -> MergePlan:
    """Compute the post-merge content of the touched buckets.

    ``existing``       — current rows of the touched buckets (table schema).
    ``deduped_batch``  — exactly one row per merge key, with
                         ``sys_change_operation`` and all payload columns
                         (missing payload columns allowed — null-padded,
                         mirroring drop-column retention semantics).
    ``target_columns`` — the (possibly evolved) target schema column order.
    """
    keys = deduped_batch.select(MERGE_KEY_COL)
    if broadcast_keys:
        keys = F.broadcast(keys)

    upserts = deduped_batch.filter(F.col(OPERATION_COL) != F.lit(OP_DELETE))
    # project to target schema; columns the batch lacks (dropped at the
    # source but retained in the target) become NULL — reference
    # SchemaMigrationTests.scala:209-212
    projected = upserts.select(
        *[
            (F.col(c) if c in upserts.columns else F.lit(None)).alias(c)
            for c in target_columns
        ]
    )
    existing_proj = existing.select(
        *[
            (F.col(c) if c in existing.columns else F.lit(None)).alias(c)
            for c in target_columns
        ]
    )
    retained = existing_proj.join(keys, on=MERGE_KEY_COL, how="left_anti")
    new_state = retained.unionByName(projected)
    return MergePlan(new_state=new_state, upserts=projected, retained=retained)
