"""Write-side Apache Iceberg v2 metadata emitter (r10 verdict task 6).

icelite's own snapshot/manifest JSON is NOT the Iceberg spec — offline,
no Iceberg runtime jar exists to write the real thing (SURVEY §0), so a
user pointing DuckDB/Trino/Spark-with-Iceberg at the warehouse would
find nothing they can open.  This module closes the WRITE half of that
interop gap from public spec knowledge alone
(https://iceberg.apache.org/spec/): `export_iceberg_metadata(table)`
emits, alongside icelite's own format,

  metadata/v{N}.metadata.json      — spec TableMetadata (format-version
                                     2, table-uuid, schemas with unique
                                     field-ids, partition-specs with
                                     transform names, snapshots +
                                     snapshot-log, refs/main)
  metadata/version-hint.text       — HadoopTableOperations' pointer
  metadata/snap-{id}-*.avro        — one manifest LIST per snapshot
                                     (real Avro object-container files
                                     written by the pure-stdlib codec in
                                     sources/avro_py.py, spec field
                                     names + field-id annotations)
  metadata/manifest-{id}-*.avro    — one data manifest per snapshot
                                     (manifest_entry records with the
                                     nested data_file struct), plus a
                                     content=1 delete manifest when the
                                     snapshot carries position deletes

Layout follows HadoopCatalog conventions (version-hint + sequential
vN.metadata.json).  Sequence numbers reuse icelite's monotonically
increasing snapshot ids — valid per spec, which only requires
monotonicity.  Data/delete-file paths are re-rooted to the table
location so a reader resolves them without icelite knowledge.

Scope of the emitter: statistics maps (column sizes, value-counts,
bounds) are optional per spec and omitted; the required fields —
content, file_path, file_format, partition, record_count,
file_size_in_bytes — are all populated, with partition values in the
spec's PHYSICAL types (day/month/year/hour/bucket -> int ordinals,
truncate -> source type).  Partition-spec EVOLUTION exports spec-
correctly (r13): set_partition retains replaced spec definitions in
partition_spec_history, and the emitter writes one partition-specs
entry per spec the table ever used (ids 1..N, per-spec partition field
ids 1000+sid-1), bucketing each snapshot's files into one manifest PER
SPEC with that spec's typed partition struct; pre-spec unpartitioned
files export under the always-present empty spec 0.  Only a pre-r13
table whose replaced spec definition was genuinely lost still raises
(loudly, never mis-stamping).

The companion reader (`read_iceberg_table`) accepts FOREIGN-written
metadata too, not just this emitter's output: format-version 1 and 2,
position (content=1) and equality (content=2) deletes with spec
sequence-number semantics, sequence inheritance, file: URIs, missing
version-hint, arbitrary field-id orders, and manifests carrying the
optional stats fields (the Avro codec decodes bytes/array/map shapes).
Tests pin the structure against the spec's required keys, roundtrip
every Avro file through the codec's own reader, and replay synthesized
foreign-writer fixtures (tests/test_iceberg_export.py).
"""

from __future__ import annotations

import datetime
import json
import os
import uuid

from ..sources.avro_py import (block_index, read_block, read_header,
                               write_avro)

# --- spec type mapping ------------------------------------------------------

_PRIMITIVES = {
    "string": "string", "bigint": "long", "int": "int", "smallint": "int",
    "tinyint": "int", "double": "double", "float": "float",
    "boolean": "boolean", "binary": "binary", "date": "date",
    # icelite timestamps are session-UTC instants -> timestamptz
    "timestamp": "timestamptz", "timestamp_ntz": "timestamp",
}


def _iceberg_type(simple: str, next_id: list[int]):
    """Spark ``simpleString`` -> Iceberg type JSON.  Nested types consume
    fresh field ids from the shared counter (spec: every field id unique
    within a schema)."""
    s = simple.strip()
    if s in _PRIMITIVES:
        return _PRIMITIVES[s]
    if s.startswith("decimal(") and s.endswith(")"):
        p, sc = s[len("decimal("):-1].split(",")
        return f"decimal({int(p)}, {int(sc)})"
    if s.startswith("array<") and s.endswith(">"):
        eid = next_id[0]
        next_id[0] += 1
        return {"type": "list", "element-id": eid,
                "element": _iceberg_type(s[len("array<"):-1], next_id),
                "element-required": False}
    raise ValueError(f"no Iceberg mapping for Spark type {simple!r}")


_TRANSFORMS = {"days": "day", "months": "month", "years": "year",
               "hours": "hour"}


def _spec_fields(spec: dict | None, field_id: int = 1000) -> list[dict]:
    if spec is None:
        return []
    t = spec["transform"]
    if t in _TRANSFORMS:
        transform = _TRANSFORMS[t]
    elif t in ("bucket", "truncate"):
        transform = f"{t}[{spec['param']}]"
    else:
        transform = t
    return [{"source-id": spec["source_id"], "field-id": field_id,
             "transform": transform, "name": spec["name"]}]


_OPERATION = {"append": "append", "delete": "delete", "overwrite": "overwrite",
              "update": "overwrite", "merge": "overwrite",
              "compaction": "replace", "replace": "replace",
              "insert_overwrite": "overwrite"}

# --- Avro schemas (spec field names + field-id annotations) -----------------

_MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}


def _manifest_entry_schema(partition_fields: list[dict]) -> dict:
    """manifest_entry with the nested data_file record; the partition
    struct mirrors the table's partition spec (empty for unpartitioned
    tables — spec: r102 has one field per partition field)."""
    return {
        "type": "record", "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"],
             "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "field-id": 4},
            {"name": "data_file", "field-id": 2, "type": {
                "type": "record", "name": "r2",
                "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string",
                     "field-id": 101},
                    {"name": "partition", "field-id": 102, "type": {
                        "type": "record", "name": "r102",
                        "fields": partition_fields}},
                    {"name": "record_count", "type": "long",
                     "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long",
                     "field-id": 104},
                ]}},
        ],
    }


def _partition_avro_fields(spec: dict | None, source_type: str | None,
                           field_id: int = 1000) -> list[dict]:
    """Spec PHYSICAL types for partition values (r11 advice): time
    transforms and bucket produce int ordinals, truncate keeps the
    source type — a real external reader (Trino/Spark+Iceberg) type-
    checks the partition struct against the spec and rejects strings."""
    if spec is None:
        return []
    t = spec["transform"]
    if t in ("days", "months", "years", "hours", "bucket"):
        avro_t = "int"
    elif t == "truncate":
        avro_t = ("string" if source_type in ("string", "varchar")
                  else "long")
    else:
        avro_t = "string"
    return [{"name": spec["name"], "type": ["null", avro_t],
             "field-id": field_id}]


_EPOCH = datetime.date(1970, 1, 1)


def _typed_partition_value(spec: dict, source_type: str | None, part):
    """icelite partition STRING -> the spec's typed partition value.
    days 'YYYY-MM-DD' -> days since epoch (date physical = int);
    months 'YYYY-MM' -> months since 1970-01; years 'YYYY' -> years
    since 1970; hours 'YYYY-MM-DD-HH' -> hours since epoch; bucket /
    integer-truncate ordinals -> int; string-truncate -> string."""
    _dt = datetime

    if part is None:
        return None
    t = spec["transform"]
    if t == "days":
        return (_dt.date.fromisoformat(part) - _EPOCH).days
    if t == "months":
        y, m = part.split("-")
        return (int(y) - 1970) * 12 + int(m) - 1
    if t == "years":
        return int(part) - 1970
    if t == "hours":
        d, hh = part[:10], part[11:]
        return ((_dt.date.fromisoformat(d) - _EPOCH).days * 24 + int(hh))
    if t == "bucket":
        return int(part)
    if t == "truncate":
        return part if source_type in ("string", "varchar") else int(part)
    return part


def export_iceberg_metadata(table) -> str:
    """Emit Iceberg-v2-shaped metadata for an icelite table.  Returns
    the path of the current vN.metadata.json.  Idempotent per call —
    re-export overwrites the same version files (icelite stays the
    source of truth; this is a projection of its state)."""
    meta = table.meta
    tdir = os.path.abspath(table.tdir)
    mdir = os.path.join(tdir, "metadata")
    os.makedirs(mdir, exist_ok=True)

    # ---- schemas: top-level ids come from icelite; nested ids follow
    top_ids = [f["id"] for sv in meta["schema_versions"] for f in sv["fields"]]
    next_id = [max(top_ids, default=0) + 1]
    schemas = []
    for sv in meta["schema_versions"]:
        schemas.append({
            "type": "struct", "schema-id": sv["version"],
            "fields": [{"id": f["id"], "name": f["name"], "required": False,
                        "type": _iceberg_type(f["type"], next_id)}
                       for f in sv["fields"]],
        })

    spec = meta.get("partition_spec")

    def _source_type(source_id: int) -> str | None:
        # field ids are stable across add/rename, so the newest schema
        # version that knows the id wins (a renamed source keeps type)
        for sv in reversed(meta["schema_versions"]):
            for f in sv["fields"]:
                if f["id"] == source_id:
                    return f["type"]
        return None

    # spec catalog (r13, multi-spec export): every partition spec the
    # table EVER used, in adoption order — replaced specs retained by
    # set_partition in partition_spec_history plus the current one.
    # spec-id 0 is the always-present empty spec (pre-evolution files);
    # historical/current specs get ids 1..N with per-spec partition
    # field ids 1000+sid-1 (unique table-wide, as Iceberg assigns them).
    # The spec forbids mixing files of different specs in one manifest,
    # so each spec id gets its own manifest entry schema and bucket.
    all_specs = list(meta.get("partition_spec_history", []))
    if spec is not None and table._spec_key(spec) not in {
            table._spec_key(s) for s in all_specs}:
        all_specs.append(spec)
    key_to_sid: dict[str, int] = {}
    spec_by_sid: dict[int, dict] = {}
    src_type_by_sid: dict[int, str | None] = {}
    part_avro_by_sid: dict[int, list] = {}
    entry_schemas = {0: _manifest_entry_schema([])}
    for i, s2 in enumerate(all_specs):
        sid2 = i + 1
        key_to_sid[table._spec_key(s2)] = sid2
        spec_by_sid[sid2] = s2
        src_type_by_sid[sid2] = _source_type(s2["source_id"])
        part_avro_by_sid[sid2] = _partition_avro_fields(
            s2, src_type_by_sid[sid2], 1000 + sid2 - 1)
        entry_schemas[sid2] = _manifest_entry_schema(part_avro_by_sid[sid2])

    def _spec_bucket(e) -> int:
        k = e.get("spec_key")
        if k is None:
            return 0
        sid2 = key_to_sid.get(k)
        if sid2 is None:
            # pre-r13 tables replaced specs without retaining them; a
            # file keyed to a LOST spec cannot be exported with
            # spec-correct partition metadata — fail loudly, never
            # mis-stamp (r11 advice)
            raise ValueError(
                f"file {e['path']!r} was written under a historical "
                f"partition spec ({k!r}) whose definition icelite no "
                "longer retains; spec-correct export is impossible — "
                "rewrite_data_files first")
        return sid2

    snaps = sorted(meta.get("snapshots", []), key=lambda s: s["id"])
    by_id = {s["id"]: s for s in snaps}
    spec_id = key_to_sid.get(table._spec_key(spec), 0) if spec else 0
    # spec: EXISTING (status=0) entries must carry explicit snapshot/
    # sequence numbers — null inheritance is only legal for ADDED — so
    # remember which snapshot first added each path
    first_added: dict[str, int] = {}
    for s in snaps:
        for e in s["files"] + s.get("delete_files", []):
            first_added.setdefault(e["path"], s["id"])
    snapshots_json, snapshot_log = [], []
    for s in snaps:
        sid, seq = s["id"], s["id"]
        parent = by_id.get(s.get("parent")) if s.get("parent") else None
        parent_paths = {f["path"] for f in parent["files"]} if parent else set()

        def _rows(entries):
            return sum(e.get("record_count") or 0 for e in entries)

        def _entries(e, status, content, bucket):
            # icelite delete entries point at the staging DIRECTORY of a
            # coalesce(1) write; the spec's data_file.file_path must be a
            # physical file — resolve to the contained parquet part(s)
            full = os.path.join(tdir, e["path"])
            if os.path.isdir(full):
                parts = sorted(
                    os.path.join(r, n) for r, _d, ns in os.walk(full)
                    for n in ns if n.endswith(".parquet"))
            else:
                parts = [full]
            part_val = {}
            if bucket > 0:
                pav = part_avro_by_sid[bucket]
                part_val = {pav[0]["name"]: _typed_partition_value(
                    spec_by_sid[bucket], src_type_by_sid[bucket],
                    e.get("partition"))}
            origin = sid if status == 1 else first_added[e["path"]]
            out = []
            for i, p in enumerate(parts):
                try:
                    size = os.path.getsize(p)
                except OSError:
                    size = 0
                # a multi-part directory can't split the entry's total
                # row count without reading footers; coalesce(1) makes
                # this a single file in practice — attribute to part 0
                rc = (e.get("record_count") or 0) if i == 0 else 0
                out.append((status, origin, origin, origin,
                            {"content": content, "file_path": p,
                             "file_format": "PARQUET",
                             "partition": part_val, "record_count": rc,
                             "file_size_in_bytes": size}))
            return out

        # schema in force when this snapshot committed: the newest
        # schema any of its files was written under (icelite records
        # schema_version per file; a constant current-schema stamp
        # would make external time travel project post-evolution
        # columns onto pre-evolution files)
        snap_schema_id = max(
            (f.get("schema_version", 0)
             for f in s["files"] + s.get("delete_files", [])),
            default=meta["current_schema"])
        snap_schema = next(sc for sc in schemas
                           if sc["schema-id"] == snap_schema_id)
        # spec: real readers require these key-value properties to open
        # a manifest (ManifestReader fails without them); partition-spec
        # and spec-id vary per manifest BUCKET — a manifest holds files
        # of exactly one spec
        def _mf_meta(bucket):
            return {
                "schema": json.dumps(snap_schema),
                "schema-id": str(snap_schema_id),
                "partition-spec": json.dumps(
                    _spec_fields(spec_by_sid[bucket], 1000 + bucket - 1)
                    if bucket else []),
                "partition-spec-id": str(bucket),
                "format-version": "2",
            }

        manifests = []  # (path, content, mf_spec_id, min_seq, counts...)

        def _emit_manifest(entries_by_status, content, tag):
            """entries_by_status: [(icelite_entry, status), ...] — split
            by spec bucket, one manifest avro per non-empty bucket."""
            by_bucket: dict[int, list] = {}
            for e, status in entries_by_status:
                b = _spec_bucket(e)
                by_bucket.setdefault(b, []).append((e, status))
            for b, pairs in sorted(by_bucket.items()):
                rows = [t for e, st in pairs
                        for t in _entries(e, st, content, b)]
                n_add = sum(1 for _e, st in pairs if st == 1)
                n_exist = len(pairs) - n_add
                r_add = _rows([e for e, st in pairs if st == 1])
                r_exist = _rows([e for e, st in pairs if st == 0])
                mf = os.path.join(
                    mdir, f"manifest-{sid}-{uuid.uuid5(uuid.NAMESPACE_URL, f'{tdir}:{sid}:{tag}:{b}').hex[:12]}.avro")
                write_avro(mf, rows, entry_schemas[b], codec="deflate",
                           extra_meta={**_mf_meta(b), "content":
                                       "data" if content == 0 else "deletes"})
                # spec: min_sequence_number = minimum data sequence of all
                # live entries (EXISTING entries carry their ORIGIN
                # sequence; writing the current one would let readers
                # wrongly prune older deletes)
                min_seq = min((t[2] for t in rows), default=seq)
                manifests.append((mf, content, b, min_seq, n_add, n_exist,
                                  0, r_add, r_exist, 0))

        added = [f for f in s["files"] if f["path"] not in parent_paths]
        existing = [f for f in s["files"] if f["path"] in parent_paths]
        _emit_manifest([(e, 1) for e in added]
                       + [(e, 0) for e in existing], 0, "data")
        dels = s.get("delete_files", [])
        if dels:
            parent_dels = ({f["path"] for f in parent.get("delete_files", [])}
                           if parent else set())
            _emit_manifest(
                [(e, 1) for e in dels if e["path"] not in parent_dels]
                + [(e, 0) for e in dels if e["path"] in parent_dels],
                1, "deletes")

        ml_path = os.path.join(
            mdir, f"snap-{sid}-{uuid.uuid5(uuid.NAMESPACE_URL, f'{tdir}:{sid}:list').hex[:12]}.avro")
        ml_meta = {"format-version": "2", "snapshot-id": str(sid),
                   "sequence-number": str(seq)}
        if s.get("parent") is not None:
            ml_meta["parent-snapshot-id"] = str(s["parent"])
        write_avro(ml_path,
                   [(p, os.path.getsize(p), mf_sid, content,
                     seq, mseq, sid, a, ex, de, ra, rex, rde)
                    for (p, content, mf_sid, mseq, a, ex, de, ra, rex, rde)
                    in manifests],
                   _MANIFEST_FILE_SCHEMA, codec="deflate",
                   extra_meta=ml_meta)

        ts_ms = int(s["ts"] * 1000)
        snap_json = {
            "snapshot-id": sid,
            "sequence-number": seq,
            "timestamp-ms": ts_ms,
            "manifest-list": ml_path,
            "summary": {"operation": _OPERATION.get(s["operation"],
                                                    "overwrite")},
            "schema-id": snap_schema_id,
        }
        if s.get("parent") is not None:
            snap_json["parent-snapshot-id"] = s["parent"]
        snapshots_json.append(snap_json)
        snapshot_log.append({"timestamp-ms": ts_ms, "snapshot-id": sid})

    version = len(snaps) + 1
    md = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL,
                                     f"icelite:{meta['table']}")),
        "location": tdir,
        "last-sequence-number": max((s["id"] for s in snaps), default=0),
        "last-updated-ms": max((s["timestamp-ms"] for s in snapshots_json),
                               default=0),
        "last-column-id": next_id[0] - 1,
        "schemas": schemas,
        "current-schema-id": meta["current_schema"],
        "partition-specs": [{"spec-id": 0, "fields": []}] + [
            {"spec-id": sid2,
             "fields": _spec_fields(spec_by_sid[sid2], 1000 + sid2 - 1)}
            for sid2 in sorted(spec_by_sid)],
        "default-spec-id": spec_id,
        "last-partition-id": 999 + len(spec_by_sid),
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "properties": {k: str(v)
                       for k, v in meta.get("properties", {}).items()},
        "current-snapshot-id": meta["current_snapshot"] or -1,
        "snapshots": snapshots_json,
        "snapshot-log": snapshot_log,
        "metadata-log": [],
        "refs": ({"main": {"snapshot-id": meta["current_snapshot"],
                           "type": "branch"}}
                 if meta["current_snapshot"] else {}),
    }
    md_path = os.path.join(mdir, f"v{version}.metadata.json")
    tmp = md_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(md, f, indent=1)
    os.replace(tmp, md_path)
    with open(os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write(str(version))
    # version = len(snaps)+1 can REGRESS after expire_snapshots shrinks
    # the list (r11 advice): a reader that picks max-N when the hint is
    # missing would then open a stale higher-numbered file from an
    # earlier export — delete superseded versions on re-export
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".metadata.json"):
            try:
                n = int(name[1:-len(".metadata.json")])
            except ValueError:
                continue
            if n > version:
                os.unlink(os.path.join(mdir, name))
    return md_path


# --- spec-side reader (the interop proof) -----------------------------------

def _avro_rows(path: str) -> list[dict]:
    schema, codec, _sync, _pos = read_header(path)
    cols = [f["name"] for f in schema["fields"]]
    out = []
    for off, _n, _nb in block_index(path):
        out += [dict(zip(cols, r))
                for r in read_block(path, off, schema, codec)]
    return out


def _local_path(p: str) -> str:
    """Strip a file: URI scheme for local opens — foreign writers store
    fully-qualified URIs in manifest_path/file_path (the spec requires
    full URIs); icelite's own export writes bare absolute paths."""
    if p.startswith("file:"):
        rest = p[len("file:"):]
        while rest.startswith("//"):
            rest = rest[1:]
        return rest
    return p


def _current_metadata_path(mdir: str) -> str:
    """version-hint.text when present, else max-N v*.metadata.json —
    the same fallback HadoopTableOperations performs when the hint is
    missing or unreadable."""
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            return os.path.join(mdir, f"v{int(f.read().strip())}.metadata.json")
    best, best_n = None, -1
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".metadata.json"):
            try:
                n = int(name[1:-len(".metadata.json")])
            except ValueError:
                continue
            if n > best_n:
                best, best_n = name, n
    if best is None:
        raise FileNotFoundError(f"no v*.metadata.json under {mdir}")
    return os.path.join(mdir, best)


def read_iceberg_table(spark, table_location: str,
                       partition_filter=None,
                       planned_files: list | None = None):
    """Read a table from spec metadata alone — no icelite involvement:
    version-hint.text (or max-N fallback) -> vN.metadata.json ->
    current-snapshot-id -> manifest-list Avro -> manifest Avro ->
    parquet data files, minus position-delete (content=1) and
    equality-delete (content=2) rows.  This is the planning walk any
    spec reader (Trino/DuckDB/Spark+Iceberg) performs, so a hash match
    against the table's expected content is the end-to-end interop
    proof — and the reader accepts FOREIGN-written metadata, not just
    this module's own export (r11 verdict task 1): format-version 1
    (single top-level ``schema``, entries without ``content`` or
    sequence-number fields, snapshots carrying an inline ``manifests``
    list), v2 sequence-number inheritance (ADDED entries with null
    sequence inherit the manifest's), file: URIs, and arbitrary
    field-id orders (projection is by name; equality_ids resolve
    through the metadata schema's id->name map).

    Delete semantics per spec: a position delete applies to data files
    with data sequence number <= the delete's; an equality delete
    applies STRICTLY BEFORE (data seq < delete seq), matching on the
    equality_ids columns with null-safe equality.

    Scale shape: the metadata walk is a driver-side O(#files) manifest
    decode (exactly Iceberg's own planning cost); data and delete files
    are handed to ONE distributed parquet scan each.  Per-file sequence
    numbers ride a broadcast O(#files) map joined on
    ``_metadata.file_path`` — planning metadata, never a data shuffle —
    and each delete class is subtracted by one anti-join.

    ``partition_filter``: optional predicate over a data file's
    partition record (a dict like {'p_day': 19750}) evaluated during
    the manifest walk — Iceberg's partition pruning: non-qualifying
    DATA files never reach the scan (delete files are never pruned;
    their targets may survive).  The caller owns the residual row
    filter, exactly as a spec reader's engine does.  Pass a list as
    ``planned_files`` to receive the planned data-file paths (the
    files-read observability hook the pruning pytest pins)."""
    import pyspark.sql.functions as F

    mdir = os.path.join(table_location, "metadata")
    md = json.load(open(_current_metadata_path(mdir)))
    if "schemas" in md:
        schema = next(s for s in md["schemas"]
                      if s["schema-id"] == md["current-schema-id"])
    else:  # v1: a single top-level schema
        schema = md["schema"]
    id_to_name = {f["id"]: f["name"] for f in schema["fields"]}
    cur = md["current-snapshot-id"]
    snap = next(s for s in md["snapshots"] if s["snapshot-id"] == cur)

    if "manifest-list" in snap:
        manifests = _avro_rows(_local_path(snap["manifest-list"]))
    else:  # v1 alternative: inline manifest list
        manifests = [{"manifest_path": p} for p in snap["manifests"]]

    data, pos_dels, eq_dels = [], [], []  # (path, seq[, eq_ids])
    for mf in manifests:
        mseq = mf.get("sequence_number") or 0
        for e in _avro_rows(_local_path(mf["manifest_path"])):
            if e["status"] == 2:  # DELETED entries no longer contribute
                continue
            dfile = e["data_file"]
            seq = e.get("sequence_number")
            if seq is None:  # v2 inheritance (ADDED rows) / v1 (no seqs)
                seq = mseq
            path = _local_path(dfile["file_path"])
            content = dfile.get("content", 0)  # v1 data_file: data only
            if content == 0:
                if (partition_filter is not None
                        and not partition_filter(
                            dfile.get("partition") or {})):
                    continue  # partition-pruned: file never scanned
                data.append((path, seq))
            elif content == 1:
                pos_dels.append((path, seq))
            elif content == 2:
                ids = tuple(dfile.get("equality_ids") or ())
                if not ids:
                    raise ValueError(
                        f"equality-delete file {path} carries no "
                        "equality_ids")
                eq_dels.append((path, seq, ids))
            else:
                raise ValueError(f"unknown content={content} for {path}")

    if len({p for p, _ in data}) != len(data):
        # a path live in two manifests would double rows AND make the
        # sequence map ambiguous — corrupt metadata, fail loudly
        raise ValueError("duplicate data file path across live manifests")
    if planned_files is not None:
        planned_files.extend(p for p, _ in data)
    df = spark.read.parquet(*[p for p, _ in data])
    if not pos_dels and not eq_dels:
        return df

    def _norm(col):
        # _metadata.file_path is a file: URI; normalize to a bare path
        return F.regexp_replace(col, "^file:/+", "/")

    def _seq_map(path_seq, file_col, seq_col):
        """Broadcast O(#files) planning map: file path -> data sequence
        number, joined on the parquet _metadata file path."""
        m = spark.createDataFrame(
            list(path_seq), f"{file_col} string, {seq_col} long")
        return F.broadcast(m)

    def _with_seq(frame, path_seq, file_col, seq_col):
        """LEFT join + loud guard, never inner: a path-normalization
        mismatch between the metadata and _metadata.file_path must
        raise, not silently drop every row of the affected file."""
        joined = frame.join(_seq_map(path_seq, file_col, seq_col),
                            file_col, "left")
        return joined.withColumn(
            seq_col,
            F.when(F.col(seq_col).isNull(), F.raise_error(F.concat(
                F.lit("data file not in metadata sequence map: "),
                F.col(file_col)))).otherwise(F.col(seq_col)))

    staged = _with_seq(
        df.select("*", _norm(F.col("_metadata.file_path")).alias("__file"),
                  F.col("_metadata.row_index").alias("__pos")),
        data, "__file", "__seq")

    if pos_dels:
        dels = (_with_seq(
            spark.read.parquet(*[p for p, _ in pos_dels])
            .select(_norm(F.col("file_path")).alias("__dfile"),
                    F.col("pos").alias("__dpos"),
                    _norm(F.col("_metadata.file_path")).alias("__dsrc")),
            pos_dels, "__dsrc", "__dseq")
            .drop("__dsrc"))
        cond = ((staged["__file"] == dels["__dfile"])
                & (staged["__pos"] == dels["__dpos"])
                & (staged["__seq"] <= dels["__dseq"]))
        staged = staged.join(dels, cond, "left_anti")

    # one anti-join per distinct equality-ids set (each set names its
    # own match columns); files sharing a set are scanned together
    by_ids: dict[tuple, list] = {}
    for p, s, ids in eq_dels:
        by_ids.setdefault(ids, []).append((p, s))
    for ids, files in sorted(by_ids.items()):
        cols = [id_to_name[i] for i in ids]
        dels = (_with_seq(
            spark.read.parquet(*[p for p, _ in files])
            .select(*cols,
                    _norm(F.col("_metadata.file_path")).alias("__dsrc")),
            files, "__dsrc", "__dseq")
            .drop("__dsrc"))
        cond = staged["__seq"] < dels["__dseq"]
        for c in cols:
            cond = cond & staged[c].eqNullSafe(dels[c])
        staged = staged.join(dels, cond, "left_anti")

    return staged.drop("__file", "__pos", "__seq")


_SPEC_TO_SPARK = {
    "boolean": "boolean", "int": "int", "long": "bigint",
    "float": "float", "double": "double", "string": "string",
    "date": "date", "timestamp": "timestamp", "timestamptz": "timestamp",
    "binary": "binary",
}


def _spark_type_of(spec_type) -> str:
    """Iceberg spec primitive -> Spark SQL type string.  Nested types
    (struct/list/map) are out of adoption scope — fail loudly."""
    if isinstance(spec_type, str):
        if spec_type in _SPEC_TO_SPARK:
            return _SPEC_TO_SPARK[spec_type]
        if spec_type.startswith("decimal("):
            return spec_type  # decimal(p, s) spells identically
    raise ValueError(f"cannot adopt Iceberg type {spec_type!r}")


def register_iceberg_table(spark, table_location: str, catalog, name: str):
    """Iceberg ``snapshot``/``register_table`` analog (r12): adopt a
    table that exists ONLY as spec metadata — vN.metadata.json +
    manifest Avro + parquet files written by any engine — into an
    icelite table, zero bytes copied.  The walk is read_iceberg_table's
    (version hint -> metadata -> manifest list -> manifests), v1 and v2
    both accepted; the adopted table then supports the FULL icelite
    surface (DELETE, MERGE, time travel, compaction...) because
    add_files registers the foreign parquet by absolute path with
    footer stats, exactly like a hand-run ``CALL system.add_files``.

    Refuses a current snapshot carrying delete files (content != 0):
    adopting those would need delete-aware rewrite first — the same
    restriction Iceberg's snapshot procedure effectively has, stated
    loudly instead of silently resurrecting deleted rows."""
    from pyspark.sql.types import StructType

    mdir = os.path.join(table_location, "metadata")
    md = json.load(open(_current_metadata_path(mdir)))
    if "schemas" in md:
        schema = next(s for s in md["schemas"]
                      if s["schema-id"] == md["current-schema-id"])
    else:
        schema = md["schema"]
    cur = md["current-snapshot-id"]
    snap = next((s for s in md["snapshots"] if s["snapshot-id"] == cur),
                None)
    if snap is None:
        raise ValueError(
            f"cannot adopt {table_location}: no current snapshot "
            f"(current-snapshot-id={cur}) — an empty table has nothing "
            "to register")
    if "manifest-list" in snap:
        manifests = _avro_rows(_local_path(snap["manifest-list"]))
    else:
        manifests = [{"manifest_path": p} for p in snap["manifests"]]
    paths = []
    for mf in manifests:
        for e in _avro_rows(_local_path(mf["manifest_path"])):
            if e["status"] == 2:
                continue
            dfile = e["data_file"]
            if dfile.get("content", 0) != 0:
                raise ValueError(
                    "cannot adopt a snapshot with pending delete files "
                    f"({dfile['file_path']}): compact the source table "
                    "first (rewrite_data_files folds deletes away)")
            paths.append(_local_path(dfile["file_path"]))
    if len(set(paths)) != len(paths):
        # same guard as read_iceberg_table: a path live in two manifests
        # would double every row of that file, hash-silently
        raise ValueError("duplicate data file path across live manifests")
    fields = ", ".join(
        f"`{f['name']}` {_spark_type_of(f['type'])}"
        for f in schema["fields"])
    t = catalog.create_table(name, StructType.fromDDL(fields))
    t.add_files(sorted(paths))
    return t
