"""Independent Iceberg format-version-2 table-metadata validator.

Purpose: the sandbox ships no Iceberg runtime (no iceberg-spark-runtime
jar, no pyiceberg), so `plans/iceberg_export.py`'s output cannot be
round-tripped through a real reader here. This validator is the
substitute evidence: an INDEPENDENT implementation of the reader-side
requirements of the public Iceberg Table Spec (format version 2,
https://iceberg.apache.org/spec/ — "Table Metadata" and "Schemas"
sections), written from the spec text, not from the exporter — so a
bug the exporter and its unit tests share is still caught here.

Checks implemented (spec requirement in parentheses):

 1. format-version == 2 (v2 writers MUST write 2).
 2. table-uuid is a valid RFC-4122 UUID string.
 3. location is a non-empty string.
 4. last-sequence-number >= every snapshot's sequence-number
    (v2: "highest assigned sequence number").
 5. last-updated-ms integer; >= every snapshot timestamp.
 6. last-column-id >= every field id reachable in every schema,
    including nested struct/list/map element ids ("highest assigned
    column ID").
 7. schemas: non-empty list of {"type":"struct"} with unique
    schema-id; current-schema-id present among them.
 8. every schema field: unique non-zero id within the schema,
    name, required bool, and a valid type (primitive from the spec's
    closed set, or struct/list/map with element ids).
 9. partition-specs: unique spec-id; default-spec-id present;
    every partition field's source-id is a field id of the current
    schema; transform matches the spec grammar
    (identity|bucket[N]|truncate[W]|year|month|day|hour|void);
    partition field-id >= 1000 (the spec's convention start).
10. last-partition-id >= every partition field-id.
11. sort-orders: default-sort-order-id present among order-ids
    (order 0 = unsorted must exist if referenced).
12. snapshots: unique snapshot-id; every parent-snapshot-id is an
    earlier snapshot's id; sequence-numbers non-decreasing along the
    parent chain; each snapshot names a manifest-list path and a
    schema-id that exists; summary.operation ∈
    {append, replace, overwrite, delete}.
13. current-snapshot-id ∈ snapshots (when any snapshots exist).
14. snapshot-log: ascending timestamp-ms; every entry's snapshot-id
    exists.
15. properties: string -> string map.

Exit code 0 = valid; 1 = violations (one line each). Usable as a CLI
(``python scripts/validate_iceberg_metadata.py v3.metadata.json``) and
as a library (``validate(doc) -> list[str]``).
"""

from __future__ import annotations

import json
import re
import sys
import uuid as _uuid

_PRIMITIVE_RE = re.compile(
    r"^(boolean|int|long|float|double|date|time|timestamp|timestamptz|"
    r"string|uuid|binary|fixed\[\d+\]|decimal\(\s*\d+\s*,\s*\d+\s*\))$"
)
_TRANSFORM_RE = re.compile(
    r"^(identity|void|year|month|day|hour|bucket\[\d+\]|truncate\[\d+\])$"
)
_SNAPSHOT_OPS = {"append", "replace", "overwrite", "delete"}


def _collect_field_ids(t, out: list[int], errs: list[str], where: str) -> None:
    """Walk a schema type, collecting every assigned field id."""
    if isinstance(t, str):
        if not _PRIMITIVE_RE.match(t):
            errs.append(f"{where}: unknown primitive type {t!r}")
        return
    if not isinstance(t, dict):
        errs.append(f"{where}: type must be string or object, got {type(t).__name__}")
        return
    kind = t.get("type")
    if kind == "struct":
        for f in t.get("fields", []):
            fid = f.get("id")
            if not isinstance(fid, int) or fid <= 0:
                errs.append(f"{where}.{f.get('name')}: field id must be a positive int")
            else:
                out.append(fid)
            if not isinstance(f.get("name"), str) or not f.get("name"):
                errs.append(f"{where}: field {fid} missing name")
            if not isinstance(f.get("required"), bool):
                errs.append(f"{where}.{f.get('name')}: 'required' must be a bool")
            _collect_field_ids(f.get("type"), out, errs, f"{where}.{f.get('name')}")
    elif kind == "list":
        eid = t.get("element-id")
        if not isinstance(eid, int):
            errs.append(f"{where}: list missing element-id")
        else:
            out.append(eid)
        _collect_field_ids(t.get("element"), out, errs, f"{where}.element")
    elif kind == "map":
        for part in ("key-id", "value-id"):
            pid = t.get(part)
            if not isinstance(pid, int):
                errs.append(f"{where}: map missing {part}")
            else:
                out.append(pid)
        _collect_field_ids(t.get("key"), out, errs, f"{where}.key")
        _collect_field_ids(t.get("value"), out, errs, f"{where}.value")
    else:
        errs.append(f"{where}: unknown nested type {kind!r}")


def validate(doc: dict) -> list[str]:
    errs: list[str] = []

    def req(key: str, typ) -> object:
        if key not in doc:
            errs.append(f"missing required field {key!r}")
            return None
        if typ is not None and not isinstance(doc[key], typ):
            errs.append(f"{key}: expected {typ.__name__ if not isinstance(typ, tuple) else typ}, "
                        f"got {type(doc[key]).__name__}")
            return None
        return doc[key]

    if req("format-version", int) != 2:
        errs.append("format-version: must be 2 for a v2 writer")
    tu = req("table-uuid", str)
    if tu is not None:
        try:
            _uuid.UUID(tu)
        except ValueError:
            errs.append(f"table-uuid: not a valid UUID: {tu!r}")
    loc = req("location", str)
    if loc is not None and not loc:
        errs.append("location: must be non-empty")
    last_seq = req("last-sequence-number", int)
    last_updated = req("last-updated-ms", int)
    last_col = req("last-column-id", int)

    # --- schemas -------------------------------------------------------
    schemas = req("schemas", list) or []
    schema_ids: dict[int, dict] = {}
    all_field_ids: dict[int, list[int]] = {}
    for i, sch in enumerate(schemas):
        if not isinstance(sch, dict) or sch.get("type") != "struct":
            errs.append(f"schemas[{i}]: must be a struct schema object")
            continue
        sid = sch.get("schema-id")
        if not isinstance(sid, int):
            errs.append(f"schemas[{i}]: missing schema-id")
            continue
        if sid in schema_ids:
            errs.append(f"schemas[{i}]: duplicate schema-id {sid}")
        schema_ids[sid] = sch
        ids: list[int] = []
        _collect_field_ids(sch, ids, errs, f"schemas[{i}]")
        if len(ids) != len(set(ids)):
            errs.append(f"schemas[{i}]: duplicate field ids {sorted(set(x for x in ids if ids.count(x) > 1))}")
        all_field_ids[sid] = ids
    if not schemas:
        errs.append("schemas: must be non-empty")
    cur_schema = req("current-schema-id", int)
    if cur_schema is not None and cur_schema not in schema_ids:
        errs.append(f"current-schema-id: {cur_schema} not in schemas")
    if last_col is not None:
        high = max((max(ids) for ids in all_field_ids.values() if ids), default=0)
        if last_col < high:
            errs.append(f"last-column-id: {last_col} < highest assigned field id {high}")

    # --- partition specs -----------------------------------------------
    specs = req("partition-specs", list) or []
    spec_ids = set()
    current_fields = set(all_field_ids.get(cur_schema, []))
    max_pfid = 0
    for i, spec in enumerate(specs):
        sid = spec.get("spec-id")
        if not isinstance(sid, int):
            errs.append(f"partition-specs[{i}]: missing spec-id")
            continue
        if sid in spec_ids:
            errs.append(f"partition-specs[{i}]: duplicate spec-id {sid}")
        spec_ids.add(sid)
        for pf in spec.get("fields", []):
            if not _TRANSFORM_RE.match(str(pf.get("transform", ""))):
                errs.append(f"partition-specs[{i}]: bad transform {pf.get('transform')!r}")
            if pf.get("source-id") not in current_fields:
                errs.append(
                    f"partition-specs[{i}]: source-id {pf.get('source-id')} "
                    f"is not a field id of the current schema")
            fid = pf.get("field-id")
            if not isinstance(fid, int) or fid < 1000:
                errs.append(f"partition-specs[{i}]: partition field-id must be >= 1000")
            else:
                max_pfid = max(max_pfid, fid)
    if req("default-spec-id", int) not in spec_ids:
        errs.append("default-spec-id: not among partition-specs")
    lpid = req("last-partition-id", int)
    if lpid is not None and lpid < max_pfid:
        errs.append(f"last-partition-id: {lpid} < highest partition field-id {max_pfid}")

    # --- sort orders -----------------------------------------------------
    orders = req("sort-orders", list) or []
    order_ids = {o.get("order-id") for o in orders if isinstance(o, dict)}
    if req("default-sort-order-id", int) not in order_ids:
        errs.append("default-sort-order-id: not among sort-orders")

    # --- snapshots -------------------------------------------------------
    snapshots = doc.get("snapshots", [])
    snap_ids: dict[int, dict] = {}
    for i, s in enumerate(snapshots):
        sid = s.get("snapshot-id")
        if not isinstance(sid, int):
            errs.append(f"snapshots[{i}]: missing snapshot-id")
            continue
        if sid in snap_ids:
            errs.append(f"snapshots[{i}]: duplicate snapshot-id {sid}")
        parent = s.get("parent-snapshot-id")
        if parent is not None:
            if parent not in snap_ids:
                errs.append(f"snapshots[{i}]: parent {parent} not an earlier snapshot")
            elif s.get("sequence-number", 0) < snap_ids[parent].get("sequence-number", 0):
                errs.append(f"snapshots[{i}]: sequence-number regresses vs parent")
        if last_seq is not None and s.get("sequence-number", 0) > last_seq:
            errs.append(f"snapshots[{i}]: sequence-number above last-sequence-number")
        if last_updated is not None and s.get("timestamp-ms", 0) > last_updated:
            errs.append(f"snapshots[{i}]: timestamp-ms after last-updated-ms")
        if not s.get("manifest-list"):
            errs.append(f"snapshots[{i}]: missing manifest-list path")
        if "schema-id" in s and s["schema-id"] not in schema_ids:
            errs.append(f"snapshots[{i}]: schema-id {s['schema-id']} not in schemas")
        op = (s.get("summary") or {}).get("operation")
        if op not in _SNAPSHOT_OPS:
            errs.append(f"snapshots[{i}]: summary.operation {op!r} not in {sorted(_SNAPSHOT_OPS)}")
        snap_ids[sid] = s
    cur_snap = doc.get("current-snapshot-id")
    if snapshots and cur_snap not in snap_ids:
        errs.append(f"current-snapshot-id: {cur_snap} not among snapshots")

    # --- snapshot log ------------------------------------------------------
    prev_ts = None
    for i, entry in enumerate(doc.get("snapshot-log", [])):
        if entry.get("snapshot-id") not in snap_ids:
            errs.append(f"snapshot-log[{i}]: unknown snapshot-id {entry.get('snapshot-id')}")
        ts = entry.get("timestamp-ms", 0)
        if prev_ts is not None and ts < prev_ts:
            errs.append(f"snapshot-log[{i}]: timestamps must be ascending")
        prev_ts = ts

    props = doc.get("properties", {})
    if not isinstance(props, dict) or not all(
        isinstance(k, str) and isinstance(v, str) for k, v in props.items()
    ):
        errs.append("properties: must be a string -> string map")

    return errs


def main() -> int:
    if len(sys.argv) != 2:
        print("usage: validate_iceberg_metadata.py <metadata.json>", file=sys.stderr)
        return 2
    with open(sys.argv[1]) as f:
        doc = json.load(f)
    errs = validate(doc)
    for e in errs:
        print(f"VIOLATION: {e}")
    print(f"{'INVALID' if errs else 'VALID'}: {len(errs)} violation(s)")
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
