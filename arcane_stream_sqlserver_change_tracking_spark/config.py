"""Spec-driven launch configuration — the ``STREAMCONTEXT__SPEC`` surface.

The reference boots from environment variables: ``STREAMCONTEXT__SPEC``
holds the stream's full JSON spec (the CRD ``spec`` body — shape pinned
by /root/reference/dev.env.example and
.helm/templates/crd-microsoft-sql-server-stream.yaml), with
``STREAMCONTEXT__STREAM_ID``, ``STREAMCONTEXT__STREAM_KIND`` and
``STREAMCONTEXT__BACKFILL`` alongside
(MicrosoftSqlServerPluginStreamContext.scala:33-38). This module maps
that spec onto the Spark engine's own knobs so a deployment written
for the reference launches this engine unchanged::

    STREAMCONTEXT__SPEC='{"sink": {...}, "source": {...}}' \
        python -m arcane_stream_sqlserver_change_tracking_spark \
        --mode replay --table /lake/t --spec-env

Validation errors name the offending CRD field path
(``sink.mergeServiceClient.queryRetryMode``), not a Python attribute,
so a platform operator can fix the manifest without reading this code.

Unmapped spec sections are deliberate, documented drops: Iceberg REST
catalog coordinates (``sink.icebergCatalog`` / ``staging.icebergCatalog``
— this engine's lake IS the table format; the Iceberg metadata export
seam is plans/iceberg_export.py) and Trino connection parameters
(``mergeServiceClient.connectionUrl`` etc. — MERGE runs in-engine, not
on a remote SQL engine). The memory-bound throughput shaper IS mapped:
``throughput.shaperImpl.memoryBound`` selects streaming/shaper.py's
MemoryBoundShaper and its seven CRD parameters ride through as
``EngineOptions.shaper_params`` (unknown keys are rejected by CRD
path). ``throughput.advisedRate`` / ``advisedBurst`` are deliberate
drops: they tune the reference's in-process poll rate-limiter
(ZStream throttling), whose two jobs — poll cadence and per-tick
volume — map here to the trigger interval
(``streamMode.changeCapture.changeCaptureInterval``, already mapped)
and the chunk planner (``advisedChunkSize`` → count-balanced
``version_chunks``), so a second rate knob would be a conflicting
duplicate, not added fidelity.
"""

from __future__ import annotations

import json
import os
import re
import dataclasses
from dataclasses import dataclass, field
from typing import Any

from .functions.keys import normalize_column_name
from .operators.fields import FieldFilter
from .streaming.runner import EngineOptions

SPEC_ENV = "STREAMCONTEXT__SPEC"
STREAM_ID_ENV = "STREAMCONTEXT__STREAM_ID"
BACKFILL_ENV = "STREAMCONTEXT__BACKFILL"


class SpecError(ValueError):
    """A spec field is missing or malformed; message names the CRD path."""


_DURATION_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(ms|s|second|seconds|m|minute|minutes|h|hour|hours)\s*$")
_DURATION_UNITS = {"ms": 0.001, "s": 1, "second": 1, "seconds": 1,
                   "m": 60, "minute": 60, "minutes": 60,
                   "h": 3600, "hour": 3600, "hours": 3600}

_SIZE_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(B|KB|MB|GB|TB)\s*$", re.IGNORECASE)
_SIZE_UNITS = {"b": 1, "kb": 1024, "mb": 1024**2, "gb": 1024**3, "tb": 1024**4}


def parse_duration_seconds(text: str, path: str) -> float:
    """``"60 second"`` / ``"6h"`` → seconds (reference duration strings)."""
    m = _DURATION_RE.match(str(text))
    if not m:
        raise SpecError(f"{path}: not a duration: {text!r} (want e.g. '60 second', '6h')")
    return float(m.group(1)) * _DURATION_UNITS[m.group(2)]


def parse_size_bytes(text: str, path: str) -> int:
    """``"512MB"`` → bytes (reference fileSizeThreshold strings)."""
    m = _SIZE_RE.match(str(text))
    if not m:
        raise SpecError(f"{path}: not a size: {text!r} (want e.g. '512MB')")
    return int(float(m.group(1)) * _SIZE_UNITS[m.group(2).lower()])


# throughput.shaperImpl.memoryBound body (CRD beta:446-478, dev.env.example
# throughput block): CRD camelCase key -> (MemoryBoundShaper kwarg, coercion)
_SHAPER_PARAM_KEYS: dict[str, tuple[str, type]] = {
    "fallbackStringTypeSizeEstimate": ("fallback_string_size", int),
    "objectTypeSizeEstimate": ("object_size", int),
    "chunkCostScale": ("chunk_cost_scale", float),
    "chunkCostMax": ("chunk_cost_max", int),
    "tableRowCountWeight": ("table_row_count_weight", float),
    "tableSizeWeight": ("table_size_weight", float),
    "tableSizeScaleFactor": ("table_size_scale_factor", float),
}


def _get(spec: Any, path: str, default: Any = ...) -> Any:
    node = spec
    for part in path.split("."):
        if not isinstance(node, dict) or part not in node:
            if default is ...:
                raise SpecError(f"{path}: required field missing")
            return default
        node = node[part]
    return node


def _as_obj(value: Any, path: str) -> dict:
    """Block-or-error: None/absent → {}, non-object → SpecError. Keeps
    a junk value at a BLOCK position (e.g. a string where
    maintenanceSettings should be) from escaping as AttributeError."""
    if value is None:
        return {}
    if not isinstance(value, dict):
        raise SpecError(f"{path}: expected an object, got {value!r}")
    return value


def _as_int(value: Any, path: str) -> int:
    if isinstance(value, bool) or not isinstance(value, (int, float, str)):
        raise SpecError(f"{path}: expected an integer, got {value!r}")
    try:
        return int(value)
    except (ValueError, OverflowError):  # json.loads admits Infinity
        raise SpecError(f"{path}: expected an integer, got {value!r}") from None


def _as_float(value: Any, path: str) -> float:
    if isinstance(value, bool) or not isinstance(value, (int, float, str)):
        raise SpecError(f"{path}: expected a number, got {value!r}")
    try:
        return float(value)
    except ValueError:
        raise SpecError(f"{path}: expected a number, got {value!r}") from None


def _as_str_list(value: Any, path: str) -> list[str]:
    if value is None:
        return []
    if not isinstance(value, list) or not all(isinstance(x, str) for x in value):
        raise SpecError(f"{path}: expected a list of strings, got {value!r}")
    return value


def _variant(node: Any, path: str, allowed: dict[str, str],
             default: str) -> str:
    """The reference encodes enums as single-key objects
    (``"queryRetryMode": {"always": {}}``); map the key through
    ``allowed`` (spec key → engine value)."""
    if node is None or node == {}:
        return default
    if not isinstance(node, dict) or len(node) != 1:
        raise SpecError(f"{path}: expected a single-variant object, got {node!r}")
    key = next(iter(node))
    if key not in allowed:
        raise SpecError(f"{path}: unknown variant {key!r} (one of {sorted(allowed)})")
    return allowed[key]


@dataclass
class SourceSpec:
    schema_name: str = "dbo"
    table_name: str | None = None
    fetch_size: int = 256


@dataclass
class SpecConfig:
    """Everything the launcher needs, derived from one spec JSON."""

    options: EngineOptions
    source: SourceSpec
    stream_id: str = ""
    backfill: bool = False
    backfill_behavior: str = "overwrite"      # streamMode.backfill.backfillBehavior
    trigger_seconds: float = 15.0             # changeCaptureInterval
    jitter_seed: int = 0
    jitter_variance_seconds: float = 0.0
    metric_tags: dict[str, str] = field(default_factory=dict)
    analyze_included_columns: list[str] | None = None
    analyze_interval_batches: int | None = None
    parquet_bloom_filter_columns: list[str] = field(default_factory=list)
    target_table: str = ""


def spec_to_config(spec: dict[str, Any], stream_id: str = "",
                   backfill: bool = False) -> SpecConfig:
    """Map a reference-shaped spec JSON to engine configuration.

    Raises :class:`SpecError` naming the CRD field path on anything
    missing or malformed."""
    if not isinstance(spec, dict):
        raise SpecError("spec: expected a JSON object")

    merge = _as_obj(_get(spec, "sink.mergeServiceClient", {}),
                    "sink.mergeServiceClient")
    retry_mode = _variant(
        merge.get("queryRetryMode"),
        "sink.mergeServiceClient.queryRetryMode",
        {"always": "always", "never": "never", "backfillOnly": "backfillOnly"},
        default="never",
    )
    retry_base = merge.get("queryRetryBaseDuration", "1 second")
    retry_contents = _as_str_list(
        merge.get("queryRetryOnMessageContents", []),
        "sink.mergeServiceClient.queryRetryOnMessageContents")

    sorted_by = _as_str_list(
        _get(spec, "sink.targetTableProperties.sortedBy", []),
        "sink.targetTableProperties.sortedBy")
    bloom = _as_str_list(
        _get(spec, "sink.targetTableProperties.parquetBloomFilterColumns", []),
        "sink.targetTableProperties.parquetBloomFilterColumns")

    maint = _as_obj(_get(spec, "sink.maintenanceSettings", {}),
                    "sink.maintenanceSettings")
    optimize = _as_obj(maint.get("targetOptimizeSettings"),
                       "sink.maintenanceSettings.targetOptimizeSettings")
    orphans = _as_obj(
        maint.get("targetOrphanFilesExpirationSettings"),
        "sink.maintenanceSettings.targetOrphanFilesExpirationSettings")
    analyze = _as_obj(maint.get("targetAnalyzeSettings"),
                      "sink.maintenanceSettings.targetAnalyzeSettings")

    rule_node = _get(spec, "source.fieldSelectionRule.rule", {"all": {}})
    rule = _variant(
        rule_node, "source.fieldSelectionRule.rule",
        {"all": "all", "include": "include", "exclude": "exclude"},
        default="all",
    )
    rule_fields: tuple[str, ...] = ()
    if isinstance(rule_node, dict) and rule_node:
        body = _as_obj(rule_node.get(next(iter(rule_node))),
                       f"source.fieldSelectionRule.rule.{next(iter(rule_node))}")
        rule_fields = tuple(_as_str_list(
            body.get("fields", []), "source.fieldSelectionRule.rule fields"))
    essential = _as_str_list(
        _get(spec, "source.fieldSelectionRule.essentialFields", []),
        "source.fieldSelectionRule.essentialFields")
    ff_kwargs: dict[str, Any] = {"rule": rule, "fields": rule_fields}
    if essential:
        ff_kwargs["essential"] = tuple(essential)

    chunk = _get(spec, "throughput.advisedChunkSize", 500_000)
    if not isinstance(chunk, int) or chunk <= 0:
        raise SpecError("throughput.advisedChunkSize: expected a positive integer")

    # shaperImpl: the CRD allows both variants present with null bodies
    # (crd beta default); the ACTIVE one is the non-null object, static
    # when none is
    shaper_node = _get(spec, "throughput.shaperImpl", {}) or {}
    if not isinstance(shaper_node, dict):
        raise SpecError("throughput.shaperImpl: expected an object")
    for k, v in shaper_node.items():
        if v is not None and not isinstance(v, dict):
            # a truthy non-object body (YAML artifact like `memoryBound:
            # true`) must not silently fall back to the static shaper
            raise SpecError(
                f"throughput.shaperImpl.{k}: expected an object or null, "
                f"got {v!r}")
    active = [k for k, v in shaper_node.items() if isinstance(v, dict)]
    if len(active) > 1:
        raise SpecError(
            f"throughput.shaperImpl: multiple active variants {sorted(active)}")
    shaper_impl = active[0] if active else "static"
    if shaper_impl not in ("static", "memoryBound"):
        raise SpecError(
            f"throughput.shaperImpl: unknown variant {shaper_impl!r} "
            "(static|memoryBound)")
    # The ACTIVE variant's body carries the shaper's tuning (a deployment
    # tuned for e.g. tableSizeWeight 0.05 must not silently run with the
    # 0.02 default); unknown keys fail by CRD path rather than vanish
    shaper_params: dict[str, Any] = {}
    if shaper_impl == "memoryBound":
        body = shaper_node.get("memoryBound") or {}
        for key, value in body.items():
            if key not in _SHAPER_PARAM_KEYS:
                raise SpecError(
                    f"throughput.shaperImpl.memoryBound.{key}: unknown "
                    f"parameter (one of {sorted(_SHAPER_PARAM_KEYS)})")
            kwarg, coerce = _SHAPER_PARAM_KEYS[key]
            try:
                shaper_params[kwarg] = coerce(value)
            except (TypeError, ValueError, OverflowError):
                raise SpecError(
                    f"throughput.shaperImpl.memoryBound.{key}: expected "
                    f"{coerce.__name__}, got {value!r}") from None

    options = EngineOptions(
        max_events_per_batch=chunk,
        shaper_impl=shaper_impl,
        shaper_params=shaper_params,
        max_rows_per_file=_as_int(
            _get(spec, "staging.table.maxRowsPerFile", 1_000_000),
            "staging.table.maxRowsPerFile"),
        # the lake stores NORMALIZED names (normalize_column_names runs on
        # every batch), so sortedBy must be normalized too — mirroring the
        # parquetBloomFilterColumns handling — or sortWithinPartitions
        # fails unresolved on any special-character source column
        sort_within=tuple(normalize_column_name(c) for c in sorted_by),
        retry_max_attempts=_as_int(merge.get("queryRetryMaxAttempts", 3),
                                   "sink.mergeServiceClient.queryRetryMaxAttempts"),
        retry_base_seconds=parse_duration_seconds(
            retry_base, "sink.mergeServiceClient.queryRetryBaseDuration"),
        retry_scale_factor=_as_float(merge.get("queryRetryScaleFactor", 2.0),
                                     "sink.mergeServiceClient.queryRetryScaleFactor"),
        retry_on_message_contents=tuple(retry_contents),
        retry_mode=retry_mode,
        maintenance_interval_batches=_as_int(
            optimize.get("batchThreshold", 60),
            "sink.maintenanceSettings.targetOptimizeSettings.batchThreshold"),
        compact_file_threshold_bytes=parse_size_bytes(
            optimize.get("fileSizeThreshold", "512MB"),
            "sink.maintenanceSettings.targetOptimizeSettings.fileSizeThreshold"),
        orphan_min_age_seconds=parse_duration_seconds(
            orphans.get("retentionThreshold", "6h"),
            "sink.maintenanceSettings.targetOrphanFilesExpirationSettings.retentionThreshold"),
        field_filter=FieldFilter(**ff_kwargs),
    )

    cc = _as_obj(_get(spec, "streamMode.changeCapture", {}),
                 "streamMode.changeCapture")
    variance = _as_float(cc.get("changeCaptureJitterVariance", 0.0),
                         "streamMode.changeCapture.changeCaptureJitterVariance")
    interval = parse_duration_seconds(
        cc.get("changeCaptureInterval", "15 second"),
        "streamMode.changeCapture.changeCaptureInterval")

    tags = _get(spec, "observability.metricTags", {}) or {}
    if not isinstance(tags, dict):
        raise SpecError("observability.metricTags: expected an object")
    if stream_id:
        tags = {"stream_id": stream_id, **tags}

    behavior = str(_get(spec, "streamMode.backfill.backfillBehavior", "Overwrite"))
    if behavior.lower() not in ("overwrite", "merge"):
        raise SpecError(
            "streamMode.backfill.backfillBehavior: expected Overwrite|Merge, "
            f"got {behavior!r}")

    # Reference docs: absent/empty includedColumns means "ALL columns will
    # be included" — so a PRESENT targetAnalyzeSettings block without the
    # key defaults to [] (all columns), not None (manifest counts only)
    included = analyze.get("includedColumns", [] if analyze else None)
    analyze_included = (
        _as_str_list(
            included,
            "sink.maintenanceSettings.targetAnalyzeSettings.includedColumns")
        if included is not None else None)
    analyze_interval = (
        _as_int(analyze["batchThreshold"],
                "sink.maintenanceSettings.targetAnalyzeSettings.batchThreshold")
        if "batchThreshold" in analyze else None
    )
    # ANALYZE settings ride the engine options (the cadence runs inside
    # run_incremental); SpecConfig mirrors them for launcher modes that
    # have no engine loop (maintain) — computed ONCE, two views
    options = dataclasses.replace(
        options,
        analyze_interval_batches=analyze_interval,
        analyze_included_columns=analyze_included,
    )

    return SpecConfig(
        options=options,
        source=SourceSpec(
            schema_name=str(_get(spec, "source.configuration.schemaName", "dbo")),
            table_name=_get(spec, "source.configuration.tableName", None),
            fetch_size=_as_int(_get(spec, "source.configuration.fetchSize", 256),
                               "source.configuration.fetchSize"),
        ),
        stream_id=stream_id,
        backfill=backfill,
        backfill_behavior=behavior.lower(),
        trigger_seconds=interval,
        jitter_seed=_as_int(cc.get("changeCaptureJitterSeed", 0),
                            "streamMode.changeCapture.changeCaptureJitterSeed"),
        jitter_variance_seconds=interval * variance,
        metric_tags={str(k): str(v) for k, v in tags.items()},
        analyze_included_columns=analyze_included,
        analyze_interval_batches=analyze_interval,
        parquet_bloom_filter_columns=list(bloom),
        target_table=str(_get(spec, "sink.targetTableFullName", "")),
    )


def jittered_trigger_seconds(trigger_seconds: float, jitter_seed: int,
                             jitter_variance_seconds: float,
                             stream_id: str = "") -> float:
    """changeCaptureJitterVariance parity: one seeded uniform draw in
    ``[0, variance)`` offsets this stream's fixed trigger period so many
    streams sharing a server don't poll on the same instant.

    The stream id is MIXED into the seed: the CRD default
    ``changeCaptureJitterSeed=0`` is shared by every stream, and
    identical seeds would give identical offsets — exactly the
    synchronized polling the jitter exists to break. sha256 of the id,
    not ``hash()``: PYTHONHASHSEED must not change a stream's cadence
    across restarts. Rounded to ms — Spark's interval parser rejects
    the >9 fractional digits a raw ``uniform()`` draw carries."""
    import hashlib
    import random

    if not jitter_variance_seconds:
        return float(trigger_seconds)
    stream_mix = int.from_bytes(
        hashlib.sha256(stream_id.encode()).digest()[:8], "big")
    return round(
        trigger_seconds
        + random.Random(jitter_seed ^ stream_mix).uniform(
            0, jitter_variance_seconds),
        3,
    )


def load_spec_from_env(env: dict[str, str] | None = None) -> SpecConfig:
    """Read ``STREAMCONTEXT__SPEC`` (+ stream id and backfill flag)
    from the environment — the reference's boot path."""
    env = dict(os.environ if env is None else env)
    raw = env.get(SPEC_ENV)
    if not raw:
        raise SpecError(f"{SPEC_ENV}: environment variable not set or empty")
    try:
        spec = json.loads(raw)
    except json.JSONDecodeError as e:
        raise SpecError(f"{SPEC_ENV}: invalid JSON: {e}") from None
    return spec_to_config(
        spec,
        stream_id=env.get(STREAM_ID_ENV, ""),
        backfill=env.get(BACKFILL_ENV, "false").strip().lower() in ("1", "true", "yes"),
    )
