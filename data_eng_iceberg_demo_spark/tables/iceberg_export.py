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

Scope: a WRITE-ONLY emitter.  Statistics maps (column sizes,
value-counts, bounds) are optional per spec and omitted; the required
fields — content, file_path, file_format, partition, record_count,
file_size_in_bytes — are all populated.  Tests pin the structure
against the spec's required keys and roundtrip every Avro file through
the codec's own reader (tests/test_iceberg_export.py).
"""

from __future__ import annotations

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


def _spec_fields(spec: dict | None) -> list[dict]:
    if spec is None:
        return []
    t = spec["transform"]
    if t in _TRANSFORMS:
        transform = _TRANSFORMS[t]
    elif t in ("bucket", "truncate"):
        transform = f"{t}[{spec['param']}]"
    else:
        transform = t
    return [{"source-id": spec["source_id"], "field-id": 1000,
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


def _partition_avro_fields(spec: dict | None) -> list[dict]:
    if spec is None:
        return []
    # every icelite transform value serializes losslessly as a string
    # partition value (day strings, bucket ordinals, truncate prefixes);
    # a spec-exact emitter would use date/int physical types, noted in
    # the module docstring as out of scope
    return [{"name": spec["name"], "type": ["null", "string"],
             "field-id": 1000}]


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
    part_avro = _partition_avro_fields(spec)
    entry_schema = _manifest_entry_schema(part_avro)

    snaps = sorted(meta.get("snapshots", []), key=lambda s: s["id"])
    by_id = {s["id"]: s for s in snaps}
    spec_id = 0 if spec is None else 1
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

        def _entries(e, status, content):
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
            if part_avro:
                part_val = {part_avro[0]["name"]: e.get("partition")}
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
        # a manifest (ManifestReader fails without them)
        mf_meta = {
            "schema": json.dumps(snap_schema),
            "schema-id": str(snap_schema_id),
            "partition-spec": json.dumps(
                _spec_fields(spec) if spec else []),
            "partition-spec-id": str(spec_id),
            "format-version": "2",
        }

        manifests = []
        added = [f for f in s["files"] if f["path"] not in parent_paths]
        existing = [f for f in s["files"] if f["path"] in parent_paths]
        data_entries = ([t for e in added for t in _entries(e, 1, 0)]
                        + [t for e in existing for t in _entries(e, 0, 0)])
        data_mf = os.path.join(
            mdir, f"manifest-{sid}-{uuid.uuid5(uuid.NAMESPACE_URL, f'{tdir}:{sid}:data').hex[:12]}.avro")
        write_avro(data_mf, data_entries, entry_schema, codec="deflate",
                   extra_meta={**mf_meta, "content": "data"})
        # spec: min_sequence_number = minimum data sequence of all live
        # entries (EXISTING entries carry their ORIGIN sequence; writing
        # the current one would let readers wrongly prune older deletes)
        min_seq = min((t[2] for t in data_entries), default=seq)
        manifests.append((data_mf, 0, min_seq, len(added), len(existing), 0,
                          _rows(added), _rows(existing), 0))
        dels = s.get("delete_files", [])
        if dels:
            parent_dels = ({f["path"] for f in parent.get("delete_files", [])}
                           if parent else set())
            d_add = [e for e in dels if e["path"] not in parent_dels]
            d_exist = [e for e in dels if e["path"] in parent_dels]
            del_entries = ([t for e in d_add for t in _entries(e, 1, 1)]
                           + [t for e in d_exist for t in _entries(e, 0, 1)])
            del_mf = os.path.join(
                mdir, f"manifest-{sid}-{uuid.uuid5(uuid.NAMESPACE_URL, f'{tdir}:{sid}:deletes').hex[:12]}.avro")
            write_avro(del_mf, del_entries, entry_schema, codec="deflate",
                       extra_meta={**mf_meta, "content": "deletes"})
            d_min = min((t[2] for t in del_entries), default=seq)
            manifests.append((del_mf, 1, d_min, len(d_add), len(d_exist), 0,
                              _rows(d_add), _rows(d_exist), 0))

        ml_path = os.path.join(
            mdir, f"snap-{sid}-{uuid.uuid5(uuid.NAMESPACE_URL, f'{tdir}:{sid}:list').hex[:12]}.avro")
        ml_meta = {"format-version": "2", "snapshot-id": str(sid),
                   "sequence-number": str(seq)}
        if s.get("parent") is not None:
            ml_meta["parent-snapshot-id"] = str(s["parent"])
        write_avro(ml_path,
                   [(p, os.path.getsize(p), spec_id if spec else 0, content,
                     seq, mseq, sid, a, ex, de, ra, rex, rde)
                    for (p, content, mseq, a, ex, de, ra, rex, rde)
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
        "partition-specs": [{"spec-id": 0, "fields": []}] + (
            [{"spec-id": 1, "fields": _spec_fields(spec)}] if spec else []),
        "default-spec-id": spec_id,
        "last-partition-id": 1000 if spec else 999,
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


def read_iceberg_table(spark, table_location: str):
    """Read a table from the EXPORTED spec metadata alone — no icelite
    involvement: version-hint.text -> vN.metadata.json ->
    current-snapshot-id -> manifest-list Avro -> manifest Avro ->
    parquet data files, minus position-delete (content=1) rows.  This
    is the planning walk any spec reader (Trino/DuckDB/Spark+Iceberg)
    performs, so a hash match against the table's expected content is
    the write-side emitter's end-to-end interop proof.  Scope matches
    the emitter: parquet files, position deletes, current snapshot.

    Scale shape: the metadata walk is a driver-side O(#files) manifest
    decode (exactly Iceberg's own planning cost); data and delete files
    are handed to ONE distributed parquet scan each, deletes subtracted
    by a (file, pos) anti-join that Spark broadcasts at runtime when
    small (no hint: delete volume is unbounded by policy)."""
    import pyspark.sql.functions as F

    mdir = os.path.join(table_location, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as f:
        version = int(f.read().strip())
    md = json.load(open(os.path.join(mdir, f"v{version}.metadata.json")))
    cur = md["current-snapshot-id"]
    snap = next(s for s in md["snapshots"] if s["snapshot-id"] == cur)

    data_files, delete_files = [], []
    for mf in _avro_rows(snap["manifest-list"]):
        for e in _avro_rows(mf["manifest_path"]):
            if e["status"] == 2:  # DELETED entries no longer contribute
                continue
            dfile = e["data_file"]
            (delete_files if dfile["content"] == 1
             else data_files).append(dfile["file_path"])

    df = spark.read.parquet(*data_files)
    if not delete_files:
        return df

    def _norm(col):
        # _metadata.file_path is a file: URI; position-delete files
        # store the same URI form, but normalize both sides anyway
        return F.regexp_replace(col, "^file:/+", "/")

    staged = df.select(
        "*", _norm(F.col("_metadata.file_path")).alias("__file"),
        F.col("_metadata.row_index").alias("__pos"))
    dels = (spark.read.parquet(*delete_files)
            .select(_norm(F.col("file_path")).alias("__dfile"),
                    F.col("pos").alias("__dpos")))
    cond = ((staged["__file"] == dels["__dfile"])
            & (staged["__pos"] == dels["__dpos"]))
    return staged.join(dels, cond, "left_anti").drop("__file", "__pos")
