"""Shared key/payload plumbing for the temporal joins (asof.py,
intervals.py): key-spec normalization, payload-collision checks, and a
null-key filter built from Column expressions (no SQL string assembly,
so column names containing backticks or other specials are safe).
"""

from __future__ import annotations

import operator
from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, functions as F


def quote_name(name: str) -> str:
    """Quote a column name so Spark's attribute parser treats it as one
    literal name part: double embedded backticks, wrap in backticks.
    Plain ``F.col(name)``/``df[name]`` PARSE the name (dots split into
    nested access, a stray backtick is a syntax error); quoting makes
    any legal schema name referenceable."""
    return "`" + name.replace("`", "``") + "`"


def qcol(name: str) -> Column:
    """``F.col`` over the literally-quoted name (see quote_name)."""
    return F.col(quote_name(name))


def normalize_keys(
    on: Sequence[str | tuple[str, str]],
) -> list[tuple[str, str]]:
    """``on`` entries to (left_name, right_name) pairs — a plain string
    means the name is shared by both sides."""
    return [(k, k) if isinstance(k, str) else (k[0], k[1]) for k in on]


def default_payload(
    columns: Sequence[str], exclude: Sequence[str],
) -> list[str]:
    """Right-side payload default: every column except the listed
    key/bound/timestamp columns."""
    drop = set(exclude)
    return [c for c in columns if c not in drop]


def check_payload_collisions(
    payload: Sequence[str], left_columns: Sequence[str], left_desc: str,
) -> None:
    collisions = set(payload) & set(left_columns)
    if collisions:
        raise ValueError(
            f"payload columns collide with {left_desc} columns: "
            f"{sorted(collisions)}; rename them on the right side first")


def check_reserved_names(
    reserved: Sequence[str], *column_sets: tuple[str, Sequence[str]],
) -> None:
    """Fail fast when user columns collide with an operator's internal
    working-column names (silent-overwrite / ambiguous-reference
    hazards otherwise)."""
    res = set(reserved)
    for desc, cols in column_sets:
        hit = res & set(cols)
        if hit:
            raise ValueError(
                f"{desc} columns {sorted(hit)} collide with internal "
                f"working names {sorted(res)}; rename them first")


def all_not_null(names: Sequence[str]) -> Column:
    """AND of ``col IS NOT NULL`` over the names, as Column algebra."""
    if not names:
        return F.lit(True)
    return reduce(operator.and_, [qcol(n).isNotNull() for n in names])
