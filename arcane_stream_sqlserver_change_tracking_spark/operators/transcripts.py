"""Transcript-shaped corpus operators: turns → training documents.

The engine's flagship feed is conversation transcripts keyed by
(conv_id, turn_idx) — the CDC path maintains the turn-level table.
Training pipelines consume CONVERSATIONS, not turns: this module
reassembles the per-turn state into one document per conversation, the
bridge from the CDC-replicated table to every document-level corpus
operator (chunking, dedup, packing, quality gates).

Plan shape: ONE Exchange keyed by ``conv_id`` — ``collect_list`` is a
map-side-combinable aggregate and a conversation's turns are the unit
of work, so state per group is bounded by one conversation's text (the
same bound the reassembly in line_dedup relies on). At 100 TB the
conversation is the natural partitioning unit; nothing here is
corpus-global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conversation_docs(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """One document per conversation: turns sorted by ``idx_col`` and
    rendered as ``role: text`` lines joined with ``sep``; plus
    ``n_turns``. Deterministic — ``array_sort`` on (idx, role, text)
    structs orders by the unique turn index first."""
    parts = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(idx_col).alias("i"),
                F.col(role_col).alias("r"),
                F.col(text_col).alias("t"),
            )
        )
    )
    return turns.groupBy(conv_col).agg(
        F.array_join(
            F.transform(parts, lambda s: F.concat(s["r"], F.lit(": "), s["t"])),
            sep,
        ).alias("text"),
        F.count("*").cast("long").alias("n_turns"),
    )
