"""T2 — throughput shapers: static and memory-bound chunk sizing.

Reference ``ThroughputShaperBuilder`` (main.scala:114) with two
implementations selected by ``throughput.shaperImpl``
(crd-microsoft-sql-server-stream-beta.yaml:433-470):

* **StaticShaper** — "fixed throughput according to advised values":
  the chunk size IS ``advisedChunkSize``. This has been the engine's
  behavior since round 1 (``EngineOptions.max_events_per_batch``).
* **MemoryBoundShaper** — "updates throughput based on available free
  memory vs chunk size, using sigmoid function for cost estimation.
  Advised values are used as a fallback and computation baseline."
  Parameters per the CRD: ``fallbackStringTypeSizeEstimate`` (50),
  ``objectTypeSizeEstimate`` (4096), ``chunkCostScale``,
  ``chunkCostMax``, ``tableRowCountWeight``, ``tableSizeWeight``,
  ``tableSizeScaleFactor``.

The exact cost arithmetic lives in the un-vendored
``arcane-framework-scala``; this is a behavioral analog implementing
the CRD's documented contract — cost grows sigmoidally with the
chunk's estimated memory footprint relative to free memory, is capped
at ``chunkCostMax``, and divides the advised chunk size — with each
knob doing what its CRD description says:

* row bytes are estimated from the SCHEMA (strings →
  ``fallback_string_size``, binary/nested → ``object_size``, numerics
  → their width) — no data scan;
* ``pressure = (row_weight · rows + size_weight · size_scale · rows ·
  row_bytes / free_bytes)``: the weighted row-count and
  size-vs-memory terms from the CRD;
* ``cost = clamp(round(cost_max · sigmoid(scale · (pressure − 1))),
  1, cost_max)`` — ≈1 while the chunk is well inside the budget,
  →``cost_max`` as it overruns it (``chunkCostScale``: "higher values
  → more significant slowdown of larger chunks");
* ``shaped_chunk = max(1, advised // cost)``.

Spark context: executor memory is Spark-managed (COVERAGE.md T2's
original rationale stands — spill, not OOM, is the failure mode), so
the shaper's real job here is protecting the PYTHON driver loop and
bounding per-batch cache/shuffle footprints. Free memory defaults to
/proc/meminfo MemAvailable and is injectable for tests and for
cluster managers that export a cgroup budget instead.
"""

from __future__ import annotations

import math
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import types as T

_FIXED_WIDTH: dict[type, int] = {
    T.BooleanType: 1,
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 4,
    T.FloatType: 4,
    T.DateType: 4,
    T.LongType: 8,
    T.DoubleType: 8,
    T.TimestampType: 8,
    T.TimestampNTZType: 8,
    T.DecimalType: 16,
}


def estimate_row_bytes(
    schema: T.StructType,
    fallback_string_size: int = 50,
    object_size: int = 4096,
) -> int:
    """Schema-driven per-row size estimate (CRD
    fallbackStringTypeSizeEstimate / objectTypeSizeEstimate): fixed
    widths for numerics, the string fallback for text, the object
    estimate for binary and nested types. Pure metadata — no scan."""
    total = 0
    for f in schema.fields:
        dt = type(f.dataType)
        if dt in (T.StringType, T.VarcharType, T.CharType):
            total += fallback_string_size
        elif dt in _FIXED_WIDTH:
            total += _FIXED_WIDTH[dt]
        else:  # binary, array, map, struct — "object" types
            total += object_size
    return max(total, 1)


def proc_mem_available() -> int:
    """MemAvailable from /proc/meminfo in bytes (Linux)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 8 * 1024**3  # conservative fallback budget


@dataclass
class StaticShaper:
    """Fixed throughput according to advised values (CRD static)."""

    advised_chunk_size: int = 500_000

    def advise(self, schema: T.StructType | None = None) -> int:
        return self.advised_chunk_size


@dataclass
class MemoryBoundShaper:
    """Sigmoid chunk-cost shaper (CRD memoryBound)."""

    advised_chunk_size: int = 500_000
    fallback_string_size: int = 50          # fallbackStringTypeSizeEstimate
    object_size: int = 4096                 # objectTypeSizeEstimate
    chunk_cost_scale: float = 1.0           # chunkCostScale
    chunk_cost_max: int = 10                # chunkCostMax
    table_row_count_weight: float = 0.02    # tableRowCountWeight
    table_size_weight: float = 0.02         # tableSizeWeight
    table_size_scale_factor: float = 2.0    # tableSizeScaleFactor
    #: None → /proc/meminfo MemAvailable, resolved at call time
    free_bytes_fn: Callable[[], int] | None = None

    def chunk_cost(self, rows: int, row_bytes: int, free_bytes: int) -> int:
        """1..chunk_cost_max; ≈1 well inside the memory budget,
        saturating at the cap as the chunk's estimated footprint
        overruns free memory. The sigmoid is rescaled so zero pressure
        maps to cost 1 exactly (sigmoid(-scale) is its floor), keeping
        small chunks unthrottled at any chunkCostScale."""
        if free_bytes <= 0:
            return self.chunk_cost_max
        pressure = (
            self.table_row_count_weight * rows / max(self.advised_chunk_size, 1)
            + self.table_size_weight
            * self.table_size_scale_factor
            * rows
            * row_bytes
            / free_bytes
        )
        sig = 1.0 / (1.0 + math.exp(-self.chunk_cost_scale * (pressure - 1.0)))
        floor = 1.0 / (1.0 + math.exp(self.chunk_cost_scale))
        scaled = (sig - floor) / (1.0 - floor)
        return min(self.chunk_cost_max, max(1, round(self.chunk_cost_max * scaled)))

    def advise(self, schema: T.StructType | None = None) -> int:
        """Shaped chunk size: the advised baseline divided by the cost
        of a baseline-sized chunk at current free memory."""
        row_bytes = (
            estimate_row_bytes(schema, self.fallback_string_size, self.object_size)
            if schema is not None
            else self.object_size
        )
        free = (self.free_bytes_fn or proc_mem_available)()
        cost = self.chunk_cost(self.advised_chunk_size, row_bytes, free)
        return max(1, self.advised_chunk_size // cost)


def build_shaper(kind: str, advised_chunk_size: int, **kwargs):
    """ThroughputShaperBuilder analog: ``static`` | ``memoryBound``."""
    if kind == "static":
        return StaticShaper(advised_chunk_size)
    if kind == "memoryBound":
        return MemoryBoundShaper(advised_chunk_size=advised_chunk_size, **kwargs)
    raise ValueError(f"unknown shaper {kind!r} (static|memoryBound)")
