"""Foreign-written Iceberg metadata fixtures (r11 verdict task 1).

`read_iceberg_table` previously only ever saw metadata produced by this
repo's own emitter — a roundtrip proves the emitter and reader agree,
not that the reader speaks the SPEC.  These tests synthesize a *foreign
writer*: hand-authored vN.metadata.json + manifest-list/manifest Avro
with everything another engine would produce and icelite never does —

  - format-version 1 (single top-level ``schema``, snapshots carrying
    an inline ``manifests`` list, data_file without ``content``,
    entries without sequence-number fields)
  - format-version 2 with EQUALITY deletes (content=2, equality_ids),
    sequence-number inheritance (ADDED entries with null seq), and the
    spec's strict/inclusive sequence application rules
  - non-icelite field-id orders (ids 11/4/7, not 1..n)
  - fully-qualified ``file:`` URIs in every path
  - optional stats fields (split_offsets arrays, bounds as bytes k/v
    record arrays, null key_metadata) that the Avro codec must decode
    past without understanding
  - a missing version-hint.text (reader falls back to max-N metadata)

Expected row sets are computed from the spec's delete semantics by
hand, so a reader bug in sequence comparison or equality matching
fails on VALUES, not just structure.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_eng_iceberg_demo_spark.sources.avro_py import write_avro
from data_eng_iceberg_demo_spark.tables.iceberg_export import (
    read_iceberg_table)

# --- the foreign writer's schemas (field ids deliberately non-sequential)

_SCHEMA_FIELDS = [
    {"id": 11, "name": "id", "required": False, "type": "long"},
    {"id": 4, "name": "category", "required": False, "type": "string"},
    {"id": 7, "name": "val", "required": False, "type": "double"},
]

# v2 manifest entry with the OPTIONAL stats fields a real writer emits
_KV_BYTES = {"type": "record", "name": "kv", "fields": [
    {"name": "key", "type": "int", "field-id": 117},
    {"name": "value", "type": "bytes", "field-id": 118},
]}
_FOREIGN_ENTRY_SCHEMA_V2 = {
    "type": "record", "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"],
         "field-id": 4},
        {"name": "data_file", "field-id": 2, "type": {
            "type": "record", "name": "r2",
            "fields": [
                {"name": "content", "type": "int", "field-id": 134},
                {"name": "file_path", "type": "string", "field-id": 100},
                {"name": "file_format", "type": "string", "field-id": 101},
                {"name": "partition", "field-id": 102, "type": {
                    "type": "record", "name": "r102", "fields": []}},
                {"name": "record_count", "type": "long", "field-id": 103},
                {"name": "file_size_in_bytes", "type": "long",
                 "field-id": 104},
                # optional stats a foreign writer includes and ours never
                {"name": "lower_bounds", "field-id": 125,
                 "type": ["null", {"type": "array", "items": _KV_BYTES}]},
                {"name": "split_offsets", "field-id": 132,
                 "type": ["null", {"type": "array", "items": "long"}]},
                {"name": "equality_ids", "field-id": 135,
                 "type": ["null", {"type": "array", "items": "int"}]},
                {"name": "sort_order_id", "type": ["null", "int"],
                 "field-id": 140},
            ]}},
    ],
}

# v1 shape: no content, no sequence numbers anywhere
_FOREIGN_ENTRY_SCHEMA_V1 = {
    "type": "record", "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
        {"name": "data_file", "field-id": 2, "type": {
            "type": "record", "name": "r2",
            "fields": [
                {"name": "file_path", "type": "string", "field-id": 100},
                {"name": "file_format", "type": "string", "field-id": 101},
                {"name": "partition", "field-id": 102, "type": {
                    "type": "record", "name": "r102", "fields": []}},
                {"name": "record_count", "type": "long", "field-id": 103},
                {"name": "file_size_in_bytes", "type": "long",
                 "field-id": 104},
            ]}},
    ],
}

_FIELD_SUMMARY = {"type": "record", "name": "field_summary", "fields": [
    {"name": "contains_null", "type": "boolean", "field-id": 509},
    {"name": "lower_bound", "type": ["null", "bytes"], "field-id": 510},
    {"name": "upper_bound", "type": ["null", "bytes"], "field-id": 511},
]}
_FOREIGN_MANIFEST_FILE_SCHEMA = {
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
        # optional fields ours omits — the reader must skip past them
        {"name": "partitions", "field-id": 507,
         "type": ["null", {"type": "array", "items": _FIELD_SUMMARY}]},
        {"name": "key_metadata", "type": ["null", "bytes"], "field-id": 519},
    ],
}


def _uri(p: str) -> str:
    return "file://" + os.path.abspath(p)


def _write_parquet(path: str, ids, cats, vals):
    pq.write_table(pa.table({"id": pa.array(ids, pa.int64()),
                             "category": pa.array(cats, pa.string()),
                             "val": pa.array(vals, pa.float64())}), path)


def _base_metadata(loc: str, fmt: int) -> dict:
    md = {
        "format-version": fmt,
        "table-uuid": "0f000000-0000-0000-0000-00000000beef",
        "location": loc,
        "last-updated-ms": 1700000000000,
        "last-column-id": 11,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "last-partition-id": 999,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "properties": {},
        "snapshot-log": [], "metadata-log": [], "refs": {},
    }
    schema = {"type": "struct", "schema-id": 3, "fields": _SCHEMA_FIELDS}
    if fmt == 1:
        md["schema"] = schema
    else:
        md["schemas"] = [schema]
        md["current-schema-id"] = 3
        md["last-sequence-number"] = 3
    return md


def _entry_v2(status, seq, path, n_rows, content=0, eq_ids=None,
              with_stats=True):
    return (status, 77 if status == 1 else None, seq, seq, {
        "content": content, "file_path": _uri(path),
        "file_format": "PARQUET", "partition": {},
        "record_count": n_rows, "file_size_in_bytes": os.path.getsize(path),
        "lower_bounds": ([{"key": 11, "value": b"\x01\x00"}]
                         if with_stats else None),
        "split_offsets": [4] if with_stats else None,
        "equality_ids": list(eq_ids) if eq_ids else None,
        "sort_order_id": 0 if with_stats else None,
    })


@pytest.fixture()
def foreign_v2(tmp_path):
    """Foreign v2 table: two seq-1 data files, one equality delete at
    seq 2 (category='b'), one seq-3 data file (NOT covered by the
    equality delete: spec says strictly-older only), and a seq-3
    position-delete file hitting one row in a seq-1 file and one row in
    the seq-3 file (inclusive <= applies to both)."""
    loc = str(tmp_path / "ftab")
    mdir = os.path.join(loc, "metadata")
    ddir = os.path.join(loc, "data")
    os.makedirs(mdir)
    os.makedirs(ddir)

    fa = os.path.join(ddir, "a.parquet")   # seq 1
    fb = os.path.join(ddir, "b.parquet")   # seq 1
    fc = os.path.join(ddir, "c.parquet")   # seq 3
    _write_parquet(fa, [1, 2, 3, 4], ["a", "b", "a", "b"],
                   [1.0, 2.0, 3.0, 4.0])
    _write_parquet(fb, [5, 6, 7, 8], ["b", "a", "a", "b"],
                   [5.0, 6.0, 7.0, 8.0])
    _write_parquet(fc, [9, 10], ["b", "a"], [9.0, 10.0])

    # equality delete at seq 2: kills category='b' rows in seq-1 files
    fe = os.path.join(ddir, "eq-del.parquet")
    pq.write_table(pa.table({"category": pa.array(["b"], pa.string())}), fe)
    # position delete at seq 3: (a.parquet, pos 0) and (c.parquet, pos 0)
    fp = os.path.join(ddir, "pos-del.parquet")
    pq.write_table(pa.table({"file_path": pa.array([_uri(fa), _uri(fc)]),
                             "pos": pa.array([0, 0], pa.int64())}), fp)

    # manifests: ADDED entries with NULL sequence (inheritance) except
    # the equality delete, which carries an explicit older sequence
    m1 = os.path.join(mdir, "m1.avro")   # data, seq 1 (inherited)
    write_avro(m1, [_entry_v2(1, None, fa, 4), _entry_v2(1, None, fb, 4)],
               _FOREIGN_ENTRY_SCHEMA_V2)
    m2 = os.path.join(mdir, "m2.avro")   # data, seq 3 (inherited)
    write_avro(m2, [_entry_v2(1, None, fc, 2, with_stats=False)],
               _FOREIGN_ENTRY_SCHEMA_V2)
    me = os.path.join(mdir, "me.avro")   # equality deletes, seq 2
    write_avro(me, [_entry_v2(1, None, fe, 1, content=2, eq_ids=[4])],
               _FOREIGN_ENTRY_SCHEMA_V2)
    mp = os.path.join(mdir, "mp.avro")   # position deletes, seq 3
    write_avro(mp, [_entry_v2(1, None, fp, 2, content=1)],
               _FOREIGN_ENTRY_SCHEMA_V2)

    def _mf(path, content, seq, n_added, n_rows):
        return (_uri(path), os.path.getsize(path), 0, content, seq, seq,
                77, n_added, 0, 0, n_rows, 0, 0,
                [{"contains_null": False, "lower_bound": b"\x00",
                  "upper_bound": None}], None)

    ml = os.path.join(mdir, "snap-77-list.avro")
    write_avro(ml, [_mf(m1, 0, 1, 2, 8), _mf(m2, 0, 3, 1, 2),
                    _mf(me, 1, 2, 1, 1), _mf(mp, 1, 3, 1, 2)],
               _FOREIGN_MANIFEST_FILE_SCHEMA)

    md = _base_metadata(loc, 2)
    md["current-snapshot-id"] = 77
    md["snapshots"] = [{
        "snapshot-id": 77, "sequence-number": 3,
        "timestamp-ms": 1700000000000, "manifest-list": _uri(ml),
        "summary": {"operation": "overwrite"}, "schema-id": 3,
    }]
    # no version-hint.text, and a stale-looking gap in version numbers:
    # the reader must pick max-N
    with open(os.path.join(mdir, "v2.metadata.json"), "w") as f:
        json.dump({**md, "current-snapshot-id": -1, "snapshots": []}, f)
    with open(os.path.join(mdir, "v5.metadata.json"), "w") as f:
        json.dump(md, f)
    return loc


def test_foreign_v2_equality_and_position_deletes(spark, foreign_v2):
    got = sorted(map(tuple, read_iceberg_table(spark, foreign_v2)
                     .select("id", "category", "val").collect()))
    # seq-1 files minus category='b' (eq delete seq 2 > 1) minus
    # (a.parquet, pos 0) (pos delete seq 3 >= 1); seq-3 file keeps its
    # 'b' row (3 !< 2) but loses pos 0 (3 <= 3)
    assert got == [
        (3, "a", 3.0),            # a.parquet: 1 killed by pos, 2/4 by eq
        (6, "a", 6.0), (7, "a", 7.0),   # b.parquet: 5/8 killed by eq
        (10, "a", 10.0),          # c.parquet: 9 ('b'!) killed by pos only
    ]


def test_foreign_v2_schema_and_columns(spark, foreign_v2):
    df = read_iceberg_table(spark, foreign_v2)
    assert df.columns == ["id", "category", "val"]  # helpers dropped


@pytest.fixture()
def foreign_v1(tmp_path):
    """Foreign v1 table: inline ``manifests`` list on the snapshot, v1
    entry shape (no content / sequence fields anywhere), single
    top-level ``schema`` key, file: URIs, WITH a version-hint."""
    loc = str(tmp_path / "ftab1")
    mdir = os.path.join(loc, "metadata")
    ddir = os.path.join(loc, "data")
    os.makedirs(mdir)
    os.makedirs(ddir)
    fa = os.path.join(ddir, "a.parquet")
    fb = os.path.join(ddir, "b.parquet")
    _write_parquet(fa, [1, 2], ["x", "y"], [0.5, 1.5])
    _write_parquet(fb, [3], ["z"], [2.5])

    def _e(path, n):
        return (1, 5, {"file_path": _uri(path), "file_format": "PARQUET",
                       "partition": {}, "record_count": n,
                       "file_size_in_bytes": os.path.getsize(path)})

    m1 = os.path.join(mdir, "m1.avro")
    write_avro(m1, [_e(fa, 2), _e(fb, 1)], _FOREIGN_ENTRY_SCHEMA_V1)

    md = _base_metadata(loc, 1)
    md["current-snapshot-id"] = 5
    md["snapshots"] = [{"snapshot-id": 5, "timestamp-ms": 1690000000000,
                        "manifests": [_uri(m1)],
                        "summary": {"operation": "append"}}]
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as f:
        json.dump(md, f)
    with open(os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write("1")
    return loc


def test_foreign_v1_inline_manifests(spark, foreign_v1):
    got = sorted(map(tuple, read_iceberg_table(spark, foreign_v1)
                     .select("id", "category", "val").collect()))
    assert got == [(1, "x", 0.5), (2, "y", 1.5), (3, "z", 2.5)]


def test_duplicate_live_path_is_rejected(spark, foreign_v1, tmp_path):
    """Corrupt metadata — the same data file live in two manifests —
    must fail loudly, not silently double rows."""
    mdir = os.path.join(foreign_v1, "metadata")
    md = json.load(open(os.path.join(mdir, "v1.metadata.json")))
    m1 = md["snapshots"][0]["manifests"][0]
    md["snapshots"][0]["manifests"] = [m1, m1]
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as f:
        json.dump(md, f)
    with pytest.raises(ValueError, match="duplicate data file path"):
        read_iceberg_table(spark, foreign_v1)


def test_equality_delete_without_ids_is_rejected(spark, foreign_v2):
    """An equality-delete entry with no equality_ids is unplannable —
    the reader must raise, not drop the delete."""
    mdir = os.path.join(foreign_v2, "metadata")
    me = os.path.join(mdir, "me.avro")
    fe = os.path.join(foreign_v2, "data", "eq-del.parquet")
    write_avro(me, [_entry_v2(1, 2, fe, 1, content=2, eq_ids=None)],
               _FOREIGN_ENTRY_SCHEMA_V2)
    with pytest.raises(ValueError, match="equality_ids"):
        read_iceberg_table(spark, foreign_v2)


def test_register_foreign_v1_adopts_full_icelite_surface(spark, foreign_v1,
                                                         tmp_path):
    """register_iceberg_table (r12): a v1 spec-metadata table adopts
    into icelite with zero bytes copied (absolute-path add_files), and
    the adopted table supports the full surface — metadata-only count,
    DELETE with time travel back to the adopted snapshot."""
    from data_eng_iceberg_demo_spark.tables.iceberg_export import (
        register_iceberg_table)
    from data_eng_iceberg_demo_spark.tables.icelite import IceliteCatalog

    cat = IceliteCatalog(spark, str(tmp_path / "adopted"))
    cat.create_namespace("db")
    t = register_iceberg_table(spark, foreign_v1, cat, "db.adopted")
    got = sorted(map(tuple, t.read().select("id", "category", "val")
                     .collect()))
    assert got == [(1, "x", 0.5), (2, "y", 1.5), (3, "z", 2.5)]
    assert t.metadata_count() == 3  # footer stats harvested on adopt
    # the foreign parquet was NOT copied: entries reference it in place
    snap = t._snapshot(t.meta, None)
    assert all(p["path"].startswith("/") for p in snap["files"])
    # full icelite surface post-adoption
    t.delete_where("category = 'y'")
    assert t.read().count() == 2
    assert t.read(version=1).count() == 3  # time travel to adoption


def test_register_refuses_pending_deletes(spark, foreign_v2, tmp_path):
    from data_eng_iceberg_demo_spark.tables.iceberg_export import (
        register_iceberg_table)
    from data_eng_iceberg_demo_spark.tables.icelite import IceliteCatalog

    cat = IceliteCatalog(spark, str(tmp_path / "adopted"))
    cat.create_namespace("db")
    with pytest.raises(ValueError, match="pending delete files"):
        register_iceberg_table(spark, foreign_v2, cat, "db.adopted")
