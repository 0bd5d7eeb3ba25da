"""Z-order (Morton) clustering key for multi-column file skipping.

``sort_within`` + ``stats_columns`` gives Iceberg-style plan-time file
pruning on the LEADING sort column only: a table sorted by ``x`` prunes
point reads on ``x`` to one file but reads every file for a point on
``y``. Z-ordering interleaves the bits of several columns' quantized
values so that files (which the writer cuts along the sort order) cover
small HYPER-RECTANGLES of the combined space — every z-ordered column's
per-file [min, max] is narrow, and the same manifest-stats pruning then
works on all of them (the technique Delta's OPTIMIZE ZORDER BY and
Iceberg's z-ordered rewrites use).

Mechanics: each column is min-max quantized to ``bits`` buckets against
CALLER-DECLARED bounds (at 100 TB the bounds come from ANALYZE output
or domain knowledge — a per-batch min/max would make file layout drift
batch to batch); out-of-range values clamp, nulls pin to the low edge.
The interleaved key is a pure Catalyst expression (floor/shift/mask —
whole-stage codegen, zero shuffle beyond the bucket clustering that
already happens) consumed by ``sortWithinPartitions``, so it never
lands in the data files.

Declared per table as a property::

    properties={"zorder": {"bounds": {"x": [0, 100], "y": [0, 100]},
                           "bits": 16}}

and applied by every write (append, merge rewrite, OPTIMIZE compaction)
— clustering survives maintenance because the property rides the
snapshot, mirroring how the reference pins its write sort order in the
table spec (docs/crd.md:117-119 ``sortedBy``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_expr(bounds: dict[str, tuple[float, float]], bits: int = 16) -> Column:
    """Morton key over ``bounds``' columns: bit ``b`` of column ``i``
    lands at interleaved position ``b·ncols + i``. Total width must fit
    a signed 64-bit long."""
    items = list(bounds.items())
    if not items:
        raise ValueError("zorder needs at least one column")
    if bits < 1 or bits * len(items) > 63:
        raise ValueError(
            f"{len(items)} columns x {bits} bits = {bits * len(items)} "
            "interleaved bits; must be within 1..63"
        )
    top = (1 << bits) - 1
    quantized: list[Column] = []
    for name, (lo, hi) in items:
        lo, hi = float(lo), float(hi)
        if not hi > lo:
            raise ValueError(f"bounds for {name!r} must satisfy hi > lo, got [{lo}, {hi}]")
        c = F.coalesce(F.col(name).cast("double"), F.lit(lo))
        scale = top / (hi - lo)
        q = F.least(
            F.lit(top).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                F.floor((c - F.lit(lo)) * F.lit(scale)).cast("long"),
            ),
        )
        quantized.append(q)
    z = F.lit(0).cast("long")
    n = len(quantized)
    for b in range(bits):
        for i, q in enumerate(quantized):
            z = z + F.shiftright(q, b).bitwiseAND(F.lit(1)) * F.lit(1 << (b * n + i))
    return z
