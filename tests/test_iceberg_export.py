"""Write-side Iceberg v2 metadata emitter (r10 verdict task 6).

The interop gap: icelite's own snapshot JSON is not the Iceberg spec,
and offline no Iceberg runtime jar exists to write the real thing
(SURVEY §0).  `export_iceberg_metadata` emits spec-shaped
vN.metadata.json + manifest-list/manifest Avro files alongside.  These
tests pin the STRUCTURE against the spec's required keys — every Avro
file also roundtrips through the stdlib codec's own reader, and
file/row accounting is cross-checked against icelite's ground truth.
"""

from __future__ import annotations

import json
import os

import pytest

from data_eng_iceberg_demo_spark.sources.avro_py import (block_index,
                                                         read_block,
                                                         read_header)
from data_eng_iceberg_demo_spark.tables.iceberg_export import (
    export_iceberg_metadata)
from data_eng_iceberg_demo_spark.tables.icelite import IceliteCatalog
from data_eng_iceberg_demo_spark.tables.queries import (PEDIDOS_SCHEMA,
                                                        _typed_pedidos)

# spec: required TableMetadata fields for format-version 2
_REQUIRED_V2_KEYS = {
    "format-version", "table-uuid", "location", "last-sequence-number",
    "last-updated-ms", "last-column-id", "schemas", "current-schema-id",
    "partition-specs", "default-spec-id", "last-partition-id",
    "sort-orders", "default-sort-order-id", "snapshots", "snapshot-log",
    "current-snapshot-id", "refs",
}

_DATA_FILE_REQUIRED = {"content", "file_path", "file_format", "partition",
                       "record_count", "file_size_in_bytes"}


def _read_avro_rows(path):
    schema, codec, _sync, _pos = read_header(path)
    rows = []
    for off, _n, _nb in block_index(path):
        rows.extend(read_block(path, off, schema, codec))
    return schema, rows


@pytest.fixture()
def table(spark, tmp_path):
    cat = IceliteCatalog(spark, str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.pedidos", PEDIDOS_SCHEMA)
    t.insert(_typed_pedidos(spark))
    t.insert(_typed_pedidos(spark).limit(3))
    return t


def test_metadata_json_required_keys_and_pointer(table):
    md_path = export_iceberg_metadata(table)
    with open(md_path) as f:
        md = json.load(f)
    assert _REQUIRED_V2_KEYS <= set(md)
    assert md["format-version"] == 2
    # HadoopTableOperations pointer agrees with the version file name
    hint = open(os.path.join(os.path.dirname(md_path),
                             "version-hint.text")).read().strip()
    assert md_path.endswith(f"v{hint}.metadata.json")
    # refs/main and current-snapshot-id point at icelite's current
    assert md["refs"]["main"]["snapshot-id"] == md["current-snapshot-id"]
    assert md["current-snapshot-id"] == table.meta["current_snapshot"]
    # snapshot-log is time-ordered and 1:1 with snapshots
    log = md["snapshot-log"]
    assert [e["snapshot-id"] for e in log] == \
        [s["snapshot-id"] for s in md["snapshots"]]
    assert all(a["timestamp-ms"] <= b["timestamp-ms"]
               for a, b in zip(log, log[1:]))


def test_schema_field_ids_unique_and_complete(table):
    md_path = export_iceberg_metadata(table)
    md = json.load(open(md_path))
    cur = [s for s in md["schemas"]
           if s["schema-id"] == md["current-schema-id"]]
    assert len(cur) == 1
    ids = [f["id"] for f in cur[0]["fields"]]
    assert len(ids) == len(set(ids))  # spec: unique within a schema
    assert md["last-column-id"] >= max(ids)
    names = [f["name"] for f in cur[0]["fields"]]
    assert names == [f.name for f in PEDIDOS_SCHEMA.fields]
    # decimal / timestamptz mappings survive
    types = {f["name"]: f["type"] for f in cur[0]["fields"]}
    assert types["valor_unitario"] == "decimal(10, 2)"
    assert types["data_criacao"] == "timestamptz"


def test_manifest_list_roundtrips_and_accounts(table):
    md_path = export_iceberg_metadata(table)
    md = json.load(open(md_path))
    assert len(md["snapshots"]) == 2
    for snap in md["snapshots"]:
        schema, rows = _read_avro_rows(snap["manifest-list"])
        assert schema["name"] == "manifest_file"
        cols = [f["name"] for f in schema["fields"]]
        assert {"manifest_path", "manifest_length", "content",
                "sequence_number", "added_snapshot_id"} <= set(cols)
        for row in rows:
            mf = dict(zip(cols, row))
            assert os.path.getsize(mf["manifest_path"]) == \
                mf["manifest_length"]
            assert mf["added_snapshot_id"] == snap["snapshot-id"]
            assert mf["sequence_number"] == snap["sequence-number"]


def test_manifest_entries_match_icelite_ground_truth(table):
    md_path = export_iceberg_metadata(table)
    md = json.load(open(md_path))
    meta = table.meta
    truth = {s["id"]: s for s in meta["snapshots"]}
    for snap in md["snapshots"]:
        _schema, mrows = _read_avro_rows(snap["manifest-list"])
        live_paths, live_rows = set(), 0
        for (mf_path, *_rest) in mrows:
            eschema, erows = _read_avro_rows(mf_path)
            cols = [f["name"] for f in eschema["fields"]]
            for row in erows:
                e = dict(zip(cols, row))
                assert e["status"] in (0, 1, 2)
                df = e["data_file"]
                assert _DATA_FILE_REQUIRED <= set(df)
                assert os.path.isfile(df["file_path"])
                assert df["file_size_in_bytes"] == \
                    os.path.getsize(df["file_path"])
                # EXISTING entries carry explicit origin numbers (spec:
                # null inheritance is only legal for ADDED)
                assert e["snapshot_id"] is not None
                if e["status"] == 0:
                    assert e["snapshot_id"] < snap["snapshot-id"]
                if df["content"] == 0 and e["status"] != 2:
                    live_paths.add(df["file_path"])
                    live_rows += df["record_count"]
        s = truth[snap["snapshot-id"]]
        tdir = os.path.abspath(table.tdir)
        assert live_paths == {os.path.join(tdir, f["path"])
                              for f in s["files"]}
        assert live_rows == sum(f["record_count"] for f in s["files"])


def test_mor_delete_manifest_content_flag(spark, tmp_path):
    cat = IceliteCatalog(spark, str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.mor", PEDIDOS_SCHEMA)
    t.insert(_typed_pedidos(spark))
    t.delete_where("uf = 'SP'", mode="merge-on-read")
    md = json.load(open(export_iceberg_metadata(t)))
    last = md["snapshots"][-1]
    assert last["summary"]["operation"] == "delete"
    _schema, mrows = _read_avro_rows(last["manifest-list"])
    contents = sorted(r[3] for r in mrows)  # manifest_file.content
    assert contents == [0, 1]  # one data + one deletes manifest
    del_mf = next(r[0] for r in mrows if r[3] == 1)
    eschema, erows = _read_avro_rows(del_mf)
    cols = [f["name"] for f in eschema["fields"]]
    for row in erows:
        e = dict(zip(cols, row))
        assert e["data_file"]["content"] == 1  # position deletes
        assert os.path.isfile(e["data_file"]["file_path"])


def test_partitioned_table_spec_and_values(spark, tmp_path):
    cat = IceliteCatalog(spark, str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.part", PEDIDOS_SCHEMA)
    t.set_partition_days("data_criacao")
    t.insert(_typed_pedidos(spark))
    md = json.load(open(export_iceberg_metadata(t)))
    assert md["default-spec-id"] == 1
    spec = next(s for s in md["partition-specs"] if s["spec-id"] == 1)
    [field] = spec["fields"]
    assert field["transform"] == "day"  # spec name, not Spark's days()
    assert field["field-id"] == 1000
    src = next(f for f in md["schemas"][0]["fields"]
               if f["name"] == "data_criacao")
    assert field["source-id"] == src["id"]
    # partition struct r102 carries the day value per data file
    snap = md["snapshots"][-1]
    _s, mrows = _read_avro_rows(snap["manifest-list"])
    eschema, erows = _read_avro_rows(mrows[0][0])
    part_field = next(f for f in eschema["fields"]
                      if f["name"] == "data_file")
    r102 = next(f for f in part_field["type"]["fields"]
                if f["name"] == "partition")
    assert [f["name"] for f in r102["type"]["fields"]] == ["p_day"]
    # spec PHYSICAL type: the day transform produces int days since
    # epoch (r11 advice) — a typed external reader rejects strings
    assert r102["type"]["fields"][0]["type"] == ["null", "int"]
    cols = [f["name"] for f in eschema["fields"]]
    vals = {dict(zip(cols, r))["data_file"]["partition"]["p_day"]
            for r in erows}
    assert vals
    import datetime
    epoch = datetime.date(1970, 1, 1)
    for v in vals:
        assert isinstance(v, int)
        # fixture dates are all in 2024 — ordinal maps back to a 2024 day
        assert (epoch + datetime.timedelta(days=v)).year == 2024


def test_reexport_is_idempotent_projection(table):
    p1 = export_iceberg_metadata(table)
    md1 = json.load(open(p1))
    p2 = export_iceberg_metadata(table)
    md2 = json.load(open(p2))
    assert p1 == p2  # same version file — icelite is the source of truth
    assert md1 == md2  # deterministic (uuid5 names, no wall clock)


def test_spec_reader_roundtrips_table_content(spark, tmp_path):
    """read_iceberg_table consumes ONLY the exported spec artifacts and
    must reproduce the table: appends, MoR position deletes, and the
    partitioned layout all come back equal to icelite's own read."""
    from data_eng_iceberg_demo_spark.tables.iceberg_export import (
        read_iceberg_table)

    cat = IceliteCatalog(spark, str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.rt", PEDIDOS_SCHEMA)
    t.set_partition_days("data_criacao")
    t.insert(_typed_pedidos(spark))
    t.insert(_typed_pedidos(spark).limit(7))
    t.delete_where("uf = 'SP'", mode="merge-on-read")
    export_iceberg_metadata(t)

    def rows(df):
        return sorted(map(tuple, df.select("id_pedido", "uf", "quantidade")
                          .collect()))

    got = read_iceberg_table(spark, t.tdir)
    assert rows(got) == rows(t.read())


def test_manifest_avro_carries_spec_key_value_metadata(table):
    """Real spec readers (ManifestReader) refuse manifests without the
    key-value properties; pin their presence and content (r11 review —
    the in-repo roundtrip reader never looked at them, masking the
    gap)."""
    import io as _io

    from data_eng_iceberg_demo_spark.sources import avro_py

    def _kv(path):
        with open(path, "rb") as f:
            head = f.read(1 << 16)
        meta, _sync = avro_py._parse_header(_io.BytesIO(head[4:]))
        return {k if isinstance(k, str) else k.decode(): v
                for k, v in meta.items()}

    md = json.load(open(export_iceberg_metadata(table)))
    for snap in md["snapshots"]:
        # manifest list: format-version + snapshot identity
        kv = _kv(snap["manifest-list"])
        assert kv["format-version"] == b"2"
        assert kv["snapshot-id"] == str(snap["snapshot-id"]).encode()
        # each manifest: schema/spec/format-version/content
        _s, mrows = _read_avro_rows(snap["manifest-list"])
        for (mf_path, *_rest) in mrows:
            kv = _kv(mf_path)
            assert {"schema", "schema-id", "partition-spec",
                    "partition-spec-id", "format-version",
                    "content"} <= set(kv)
            assert kv["content"] in (b"data", b"deletes")
            schema_json = json.loads(kv["schema"])
            assert schema_json["type"] == "struct"
            assert int(kv["schema-id"]) == snap["schema-id"]


def test_manifest_list_min_sequence_number_spans_existing(table):
    """min_sequence_number must be the minimum ORIGIN sequence of live
    entries: snapshot 2 carries snapshot 1's file as EXISTING, so its
    data manifest reports min seq 1, not 2 (r11 review — a current-seq
    stamp lets real readers wrongly prune older delete files)."""
    md = json.load(open(export_iceberg_metadata(table)))
    snap2 = md["snapshots"][-1]
    assert snap2["sequence-number"] == 2
    _s, mrows = _read_avro_rows(snap2["manifest-list"])
    data_row = next(r for r in mrows if r[3] == 0)  # content=0
    assert data_row[5] == 1  # min_sequence_number spans the EXISTING file
    assert data_row[4] == 2  # sequence_number is the current snapshot's


def test_prespec_files_export_under_spec0(spark, tmp_path):
    """Partition-spec evolution (r11 advice): files written BEFORE the
    spec was added carry no partition values and must land in their own
    spec-0 manifest — the spec forbids mixing specs inside a manifest,
    and stamping pre-spec files with spec 1 would corrupt pruning."""
    from data_eng_iceberg_demo_spark.tables.iceberg_export import (
        read_iceberg_table)

    cat = IceliteCatalog(spark, str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.evo", PEDIDOS_SCHEMA)
    t.insert(_typed_pedidos(spark).limit(5))      # pre-spec files
    t.set_partition_days("data_criacao")
    t.insert(_typed_pedidos(spark).limit(3))      # spec-1 files
    md = json.load(open(export_iceberg_metadata(t)))
    snap = md["snapshots"][-1]
    _s, mrows = _read_avro_rows(snap["manifest-list"])
    # data manifests: one per spec bucket, stamped with ITS spec id
    data_specs = sorted(r[2] for r in mrows if r[3] == 0)
    assert data_specs == [0, 1]
    for r in mrows:
        eschema, erows = _read_avro_rows(r[0])
        part_field = next(f for f in eschema["fields"]
                          if f["name"] == "data_file")
        r102 = next(f for f in part_field["type"]["fields"]
                    if f["name"] == "partition")
        n_part_fields = len(r102["type"]["fields"])
        assert n_part_fields == (1 if r[2] == 1 else 0)
    # and the reader reassembles the full table across both specs
    got = sorted(map(tuple, read_iceberg_table(spark, t.tdir)
                     .select("id_pedido", "uf").collect()))
    exp = sorted(map(tuple, t.read().select("id_pedido", "uf").collect()))
    assert got == exp


def test_multi_spec_export_roundtrips_three_spec_table(spark, tmp_path):
    """Partition-spec evolution exports spec-correctly (r12 verdict
    task 4): a table that lived through unpartitioned -> bucket(4) ->
    days() emits one partition-specs entry per spec (ids 1..N, unique
    partition field ids 1000+sid-1), one manifest per spec bucket with
    that spec's typed partition struct, and read_iceberg_table
    reassembles the full content across all three layouts."""
    from data_eng_iceberg_demo_spark.tables.iceberg_export import (
        read_iceberg_table)

    cat = IceliteCatalog(spark, str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.respec", PEDIDOS_SCHEMA)
    df = _typed_pedidos(spark)
    t.insert(df.filter("id_cliente % 3 = 0"))          # spec 0 (none)
    t.set_partition("bucket", "id_cliente", param=4)
    t.insert(df.filter("id_cliente % 3 = 1"))          # spec 1 (bucket)
    t.set_partition_days("data_criacao")
    t.insert(df.filter("id_cliente % 3 = 2"))          # spec 2 (days)
    md = json.load(open(export_iceberg_metadata(t)))

    specs = {s["spec-id"]: s for s in md["partition-specs"]}
    assert set(specs) == {0, 1, 2}
    assert specs[0]["fields"] == []
    assert specs[1]["fields"][0]["transform"] == "bucket[4]"
    assert specs[1]["fields"][0]["field-id"] == 1000
    assert specs[2]["fields"][0]["transform"] == "day"
    assert specs[2]["fields"][0]["field-id"] == 1001
    assert md["default-spec-id"] == 2
    assert md["last-partition-id"] == 1001

    # the LAST snapshot carries files of all three specs: its manifest
    # list must hold one data manifest per spec, each stamped with ITS
    # spec id and carrying ITS partition struct (bucket -> int ordinal,
    # days -> int days-since-epoch)
    snap = md["snapshots"][-1]
    _s, mrows = _read_avro_rows(snap["manifest-list"])
    data_specs = sorted(r[2] for r in mrows if r[3] == 0)
    assert data_specs == [0, 1, 2]
    for r in mrows:
        eschema, erows = _read_avro_rows(r[0])
        part_field = next(f for f in eschema["fields"]
                          if f["name"] == "data_file")
        r102 = next(f for f in part_field["type"]["fields"]
                    if f["name"] == "partition")
        pf = r102["type"]["fields"]
        if r[2] == 0:
            assert pf == []
        else:
            assert len(pf) == 1
            for row in erows:
                val = row[4]["partition"][pf[0]["name"]]
                assert isinstance(val, int), (r[2], val)
                if r[2] == 1:
                    assert 0 <= val <= 3          # bucket ordinal
                else:
                    assert val > 19000            # days since epoch

    got = sorted(map(tuple, read_iceberg_table(spark, t.tdir)
                     .select("id_pedido", "uf").collect()))
    exp = sorted(map(tuple, t.read().select("id_pedido", "uf").collect()))
    assert got == exp and got


def test_lost_historical_spec_still_rejected(spark, tmp_path):
    """A pre-r13 table whose replaced spec definition was never retained
    (no partition_spec_history) must still fail LOUDLY: mis-stamping a
    file with the wrong spec corrupts external pruning."""
    cat = IceliteCatalog(spark, str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.lostspec", PEDIDOS_SCHEMA)
    t.set_partition_days("data_criacao")
    t.insert(_typed_pedidos(spark).limit(4))
    t.set_partition("bucket", "id_cliente", param=4)   # replace the spec
    t.insert(_typed_pedidos(spark).limit(2))
    # simulate the pre-r13 metadata shape: history entry dropped
    meta = t.meta
    meta.pop("partition_spec_history", None)
    from data_eng_iceberg_demo_spark.tables.icelite import _write_meta
    _write_meta(t.tdir, meta)
    with pytest.raises(ValueError, match="historical partition spec"):
        export_iceberg_metadata(t)


def test_reexport_after_expire_prunes_stale_versions(spark, tmp_path):
    """version = len(snaps)+1 regresses after expire_snapshots; the
    re-export must leave NO higher-numbered stale metadata behind, so a
    hintless max-N reader can never resolve to a dead file (r11
    advice)."""
    from data_eng_iceberg_demo_spark.tables.iceberg_export import (
        read_iceberg_table)

    cat = IceliteCatalog(spark, str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.exp", PEDIDOS_SCHEMA)
    t.insert(_typed_pedidos(spark).limit(2))
    t.insert(_typed_pedidos(spark).limit(3))
    t.insert(_typed_pedidos(spark).limit(4))
    export_iceberg_metadata(t)          # v4 (3 snapshots)
    t.expire_snapshots(retain_last=1)
    p = export_iceberg_metadata(t)      # v2 now — v4 must be gone
    mdir = os.path.join(t.tdir, "metadata")
    versions = sorted(n for n in os.listdir(mdir)
                      if n.startswith("v") and n.endswith(".metadata.json"))
    assert versions == ["v2.metadata.json"] or versions == [
        "v1.metadata.json", "v2.metadata.json"]
    assert p.endswith("v2.metadata.json")
    # hint removed -> max-N fallback finds the LIVE file
    os.remove(os.path.join(mdir, "version-hint.text"))
    got = read_iceberg_table(spark, t.tdir)
    assert got.count() == t.read().count()


def test_partition_filter_prunes_planned_files(spark, tmp_path):
    """read_iceberg_table's partition_filter must cut the PLANNED data
    file list (Iceberg partition pruning), not just filter rows: on the
    days-partitioned table a 10-day window plans strictly fewer files
    than the full read, the planned set is exactly the in-range day
    ordinals, and delete files are never pruned (the MoR position
    deletes still apply inside the window — checked by value)."""
    import datetime as dt

    from data_eng_iceberg_demo_spark.tables.iceberg_export import (
        read_iceberg_table)
    from data_eng_iceberg_demo_spark.tables.queries import _typed_pedidos

    cat = IceliteCatalog(spark, str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.pruned", PEDIDOS_SCHEMA)
    t.set_partition_days("data_criacao")
    t.insert(_typed_pedidos(spark))
    t.delete_where("uf = 'SP'", mode="merge-on-read")
    export_iceberg_metadata(t)

    epoch = dt.date(1970, 1, 1)
    lo = (dt.date(2024, 1, 10) - epoch).days
    hi = (dt.date(2024, 1, 20) - epoch).days

    all_files, kept_files = [], []
    read_iceberg_table(spark, t.tdir, planned_files=all_files).collect()
    got = read_iceberg_table(
        spark, t.tdir,
        partition_filter=lambda p: (p.get("p_day") is not None
                                    and lo <= p["p_day"] < hi),
        planned_files=kept_files)
    assert 0 < len(kept_files) < len(all_files)
    assert set(kept_files) <= set(all_files)
    # pruned read == full read filtered to the window (deletes applied)
    full = read_iceberg_table(spark, t.tdir)
    want = sorted(map(tuple, full.filter(
        (full.data_criacao >= "2024-01-10")
        & (full.data_criacao < "2024-01-20"))
        .select("id_pedido", "uf").collect()))
    have = sorted(map(tuple, got.select("id_pedido", "uf").collect()))
    assert have == want and all(uf != "SP" for _i, uf in have)
