"""The pure-stdlib Avro container codec (sources/avro_py.py): spec
shapes the oracle comparison cannot cover — arbitrary records through
the writer/reader pair, block independence, codec variants, and the
block→InputPartition planning the Spark source relies on."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_eng_iceberg_demo_spark.sources.avro_py import (block_index,
                                                         read_block,
                                                         read_header,
                                                         write_avro)

SCHEMA = {"type": "record", "name": "t", "fields": [
    {"name": "k", "type": "long"},
    {"name": "s", "type": "string"},
    {"name": "x", "type": ["null", "double"]},
    {"name": "b", "type": "boolean"},
]}


def _read_all(path):
    schema, codec, _sync, _ = read_header(path)
    out = []
    for off, n, _size in block_index(path):
        rows = read_block(path, off, schema, codec)
        assert len(rows) == n
        out += rows
    return out


rec = st.tuples(
    st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
    st.text(max_size=12),  # includes non-ASCII + surrogate-free unicode
    st.one_of(st.none(), st.floats(allow_nan=False)),
    st.booleans(),
)


@given(recs=st.lists(rec, max_size=40),
       codec=st.sampled_from(["null", "deflate"]),
       block_rows=st.integers(min_value=1, max_value=7))
@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_roundtrip_any_records(tmp_path_factory, recs, codec, block_rows):
    p = str(tmp_path_factory.mktemp("avro") / "t.avro")
    write_avro(p, recs, SCHEMA, codec=codec, block_rows=block_rows)
    got = _read_all(p)
    assert len(got) == len(recs)
    for g, w in zip(got, recs):
        assert g[0] == w[0] and g[1] == w[1] and g[3] == w[3]
        if w[2] is None:
            assert g[2] is None
        else:
            assert g[2] == w[2] or (math.isinf(w[2]) and g[2] == w[2])


def test_block_layout_and_header(tmp_path):
    p = str(tmp_path / "t.avro")
    rows = [(i, f"s{i}", None if i % 3 == 0 else i / 2.0, i % 2 == 0)
            for i in range(250)]
    write_avro(p, rows, SCHEMA, codec="deflate", block_rows=100)
    schema, codec, sync, _ = read_header(p)
    assert codec == "deflate" and len(sync) == 16
    assert [f["name"] for f in schema["fields"]] == ["k", "s", "x", "b"]
    idx = block_index(p)
    assert [n for _o, n, _s in idx] == [100, 100, 50]
    # blocks decode independently and in any order
    last = read_block(p, idx[2][0], schema, codec)
    assert last == rows[200:]
    first = read_block(p, idx[0][0], schema, codec)
    assert first == rows[:100]


def test_rejects_non_avro_file(tmp_path):
    p = str(tmp_path / "bad.avro")
    with open(p, "wb") as f:
        f.write(b"PAR1 definitely not avro")
    with pytest.raises(ValueError, match="not an avro container"):
        read_header(p)


def test_rejects_unknown_codec(tmp_path):
    with pytest.raises(ValueError, match="unsupported codec"):
        write_avro(str(tmp_path / "x.avro"), [], SCHEMA, codec="snappy")


def test_spark_scan_partitions_per_block(spark):
    """The registered query's plan must carry one InputPartition per
    container block (6 x 100-row blocks), the row-group parallelism
    discipline that makes the scan distribute."""
    from data_eng_iceberg_demo_spark.plans.registry import (REGISTRY,
                                                            _load_all_modules)

    _load_all_modules()
    df = REGISTRY["scan_avro_python"].fn(spark, "/root/testdata/sf0.001")
    assert df.rdd.getNumPartitions() == 6
    assert df.count() == 600
    # the ["null","double"] union surfaces as a nullable column with
    # every 7th row NULL
    assert df.filter("amount IS NULL").count() == len(range(0, 600, 7))


def test_empty_container_reads_as_empty_relation(spark):
    """A zero-row write produces a header-only container (no blocks);
    the scan source must return an empty relation with the header's
    schema, not crash (Spark hands read() a None partition when
    partitions() is empty)."""
    import os
    import tempfile

    from data_eng_iceberg_demo_spark.sources.avro_py import (make_source,
                                                             write_avro)
    from data_eng_iceberg_demo_spark.sources.pysource import (_PYAVRO_CLS,
                                                              _pinned_session)

    if not _PYAVRO_CLS:
        _PYAVRO_CLS.append(make_source())
    p = os.path.join(tempfile.mkdtemp(), "empty.avro")
    write_avro(p, [], SCHEMA)
    with _pinned_session(spark, _PYAVRO_CLS[0]) as sess:
        df = sess.read.format("pyavro").option("path", p).load()
        assert df.count() == 0
        assert [f.name for f in df.schema.fields] == ["k", "s", "x", "b"]


def test_header_with_negative_map_block_count():
    """Spec shape a foreign writer may use: a NEGATIVE metadata
    map-block count means abs(count) pairs PRECEDED by a long
    byte-size.  Hand-build such a header and assert it parses."""
    import io
    import tempfile

    from data_eng_iceberg_demo_spark.sources.avro_py import (_MAGIC,
                                                             _zigzag_encode,
                                                             read_header)

    schema_json = b'{"type":"record","name":"t","fields":[{"name":"k","type":"long"}]}'
    pairs = b"".join(
        _zigzag_encode(len(k)) + k + _zigzag_encode(len(v)) + v
        for k, v in [(b"avro.schema", schema_json), (b"avro.codec", b"null")])
    head = (_MAGIC + _zigzag_encode(-2) + _zigzag_encode(len(pairs)) + pairs
            + _zigzag_encode(0) + b"S" * 16)
    p = tempfile.mktemp(suffix=".avro")
    with open(p, "wb") as f:
        f.write(head)
    schema, codec, sync, end = read_header(p)
    assert schema["name"] == "t" and codec == "null" and sync == b"S" * 16
    assert end == len(head)


def test_header_parse_is_bounded_even_for_large_files(tmp_path):
    """read_header must not slurp the file: a container with a large
    body parses its header from a bounded prefix (asserted by byte
    accounting: header_end is tiny while the file is big)."""
    p = str(tmp_path / "big.avro")
    rows = [(i, "x" * 100, float(i), True) for i in range(20000)]
    write_avro(p, rows, SCHEMA, codec="null", block_rows=5000)
    import os

    _schema, _codec, _sync, end = read_header(p)
    assert end < 1024
    assert os.path.getsize(p) > 2_000_000


def test_bad_sync_length_raises_value_error(tmp_path):
    """A wrong-length sync marker must raise even under ``python -O``
    (r9: was a bare assert — stripped asserts would misalign every
    block offset downstream)."""
    with pytest.raises(ValueError, match="sync marker"):
        write_avro(str(tmp_path / "x.avro"), [], SCHEMA, sync=b"short")


def test_truncated_boolean_raises_not_false(tmp_path):
    """A buffer that ends where a boolean byte should be must raise
    like the varint/struct paths, not silently decode False (r9)."""
    import io

    from data_eng_iceberg_demo_spark.sources.avro_py import _dec_value

    with pytest.raises(ValueError, match="truncated"):
        _dec_value(io.BytesIO(b""), "boolean")


def test_stream_reader_follows_growing_container(tmp_path):
    """The streaming face re-skims the block index when its snapshot
    is exhausted, so blocks appended after stream start are observed
    without a restart (r9 advice).  Exercised at the reader-class
    level: appending blocks via a second write_avro of the full record
    set simulates a growing container."""
    from data_eng_iceberg_demo_spark.sources.avro_py import make_source

    p = str(tmp_path / "grow.avro")
    first = [(1, "a", 1.0, True), (2, "b", None, False)]
    write_avro(p, first, SCHEMA, codec="null", block_rows=1)
    src = make_source()
    reader = src({"path": p}).simpleStreamReader(None)
    off = reader.initialOffset()
    seen = []
    for _ in range(3):  # drain the two initial blocks + one empty poll
        rows, off = reader.read(off)
        seen += list(rows)
    assert off == {"b": 2} and len(seen) == 2
    # writer appends: rewrite the container with one more block
    grown = first + [(3, "c", 3.0, True)]
    write_avro(p, grown, SCHEMA, codec="null", block_rows=1)
    rows, off = reader.read(off)  # stale snapshot → re-skim → new block
    assert list(rows) == [(3, "c", 3.0, True)] and off == {"b": 3}
    # readBetweenOffsets replay across the re-skimmed range
    replay = list(reader.readBetweenOffsets({"b": 0}, {"b": 3}))
    assert replay == grown


def test_stream_caught_up_poll_skips_reskim(tmp_path, monkeypatch):
    """Steady-state caught-up polls must NOT pay the O(#blocks) header
    re-skim (r9 advice): with the file size unchanged, block_index is
    never called again; once the file grows it is called exactly
    once."""
    from data_eng_iceberg_demo_spark.sources import avro_py

    p = str(tmp_path / "poll.avro")
    first = [(1, "a", 1.0, True)]
    write_avro(p, first, SCHEMA, codec="null", block_rows=1)
    reader = avro_py.make_source()({"path": p}).simpleStreamReader(None)
    rows, off = reader.read(reader.initialOffset())
    assert list(rows) == first
    calls = []
    real = avro_py.block_index
    monkeypatch.setattr(avro_py, "block_index",
                        lambda path: calls.append(path) or real(path))
    for _ in range(5):  # caught up, size unchanged: no index walk
        rows, off = reader.read(off)
        assert list(rows) == []
    assert calls == []
    write_avro(p, first + [(2, "b", None, False)], SCHEMA,
               codec="null", block_rows=1)
    rows, off = reader.read(off)
    assert list(rows) == [(2, "b", None, False)] and len(calls) == 1


def test_stream_half_flushed_tail_reads_as_no_new_data(tmp_path):
    """Racing a writer mid-append leaves a truncated tail block whose
    varints fail to parse; the poll must report 'no new data' on the
    existing snapshot instead of failing the stream, then deliver the
    block once the writer completes it (r9 advice)."""
    p = str(tmp_path / "race.avro")
    first = [(1, "a", 1.0, True)]
    write_avro(p, first, SCHEMA, codec="null", block_rows=1)
    reader = make_source_reader(p)
    rows, off = reader.read(reader.initialOffset())
    assert list(rows) == first and off == {"b": 1}
    # a half-flushed tail: size grows but the appended bytes are not a
    # complete block — the re-skim's varint parse raises internally
    with open(p, "ab") as f:
        f.write(b"\xff" * 7)
    rows, off2 = reader.read(off)
    assert list(rows) == [] and off2 == off
    # writer completes: rewrite the container with the full second block
    write_avro(p, first + [(2, "b", 2.0, False)], SCHEMA,
               codec="null", block_rows=1)
    rows, off3 = reader.read(off2)
    assert list(rows) == [(2, "b", 2.0, False)] and off3 == {"b": 2}


def make_source_reader(path):
    from data_eng_iceberg_demo_spark.sources.avro_py import make_source

    return make_source()({"path": path}).simpleStreamReader(None)


# ---- nested records (the Iceberg manifest shape: manifest_entry holds
# a data_file record which itself holds a partition record) -----------

NESTED_SCHEMA = {"type": "record", "name": "entry", "fields": [
    {"name": "status", "type": "int"},
    {"name": "snap", "type": ["null", "long"]},
    {"name": "data_file", "type": {
        "type": "record", "name": "df", "fields": [
            {"name": "path", "type": "string"},
            {"name": "part", "type": {
                "type": "record", "name": "p", "fields": [
                    {"name": "day", "type": ["null", "string"]}]}},
            {"name": "rows", "type": "long"},
        ]}},
]}

nested_rec = st.tuples(
    st.integers(min_value=0, max_value=2),
    st.one_of(st.none(), st.integers(min_value=0, max_value=2 ** 40)),
    st.fixed_dictionaries({
        "path": st.text(max_size=20),
        "part": st.fixed_dictionaries(
            {"day": st.one_of(st.none(), st.text(max_size=10))}),
        "rows": st.integers(min_value=0, max_value=2 ** 40),
    }),
)


@given(recs=st.lists(nested_rec, max_size=25),
       codec=st.sampled_from(["null", "deflate"]))
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_roundtrip_nested_records(tmp_path_factory, recs, codec):
    """Nested records roundtrip exactly through BOTH codec paths (the
    container uses the compiled closures; the reference _enc/_dec pair
    must agree byte-for-byte)."""
    p = str(tmp_path_factory.mktemp("avro") / "n.avro")
    write_avro(p, recs, NESTED_SCHEMA, codec=codec, block_rows=5)
    assert _read_all(p) == list(recs)


def test_nested_record_reference_codec_agrees():
    import io

    from data_eng_iceberg_demo_spark.sources.avro_py import (
        _compile_field_decoder, _compile_field_encoder, _dec_value,
        _enc_value)

    typ = NESTED_SCHEMA["fields"][2]["type"]
    v = {"path": "data/a.parquet", "part": {"day": "2024-01-01"},
         "rows": 42}
    ref = _enc_value(v, typ)
    out = bytearray()
    _compile_field_encoder(typ)(out, v)
    assert bytes(out) == ref
    assert _dec_value(io.BytesIO(ref), typ) == v
    got, pos = _compile_field_decoder(typ)(ref, 0)
    assert got == v and pos == len(ref)


def test_stream_reader_max_blocks_per_trigger(tmp_path):
    """Pacing contract: unset, one poll drains every available block;
    maxBlocksPerTrigger=N consumes at most N per poll with the offset
    advancing exactly to the consumed boundary (no gap, no overlap)."""
    from data_eng_iceberg_demo_spark.sources.avro_py import make_source

    p = str(tmp_path / "pace.avro")
    recs = [(i, f"r{i}", float(i), i % 2 == 0) for i in range(6)]
    write_avro(p, recs, SCHEMA, codec="null", block_rows=2)  # 3 blocks

    src = make_source()
    greedy = src({"path": p}).simpleStreamReader(None)
    rows, off = greedy.read(greedy.initialOffset())
    assert list(rows) == recs and off == {"b": 3}  # all blocks, one poll

    paced = src({"path": p, "maxBlocksPerTrigger": "1"}) \
        .simpleStreamReader(None)
    off, seen = paced.initialOffset(), []
    for expect in (1, 2, 3):  # one block per poll
        rows, off = paced.read(off)
        rows = list(rows)
        assert len(rows) == 2 and off == {"b": expect}
        seen += rows
    assert seen == recs
    rows, off = paced.read(off)  # caught up: start offset unchanged
    assert list(rows) == [] and off == {"b": 3}


def test_array_bytes_map_roundtrip_and_negative_count_blocks(tmp_path):
    """r12: the codec grew bytes/array/map for foreign Iceberg
    manifests.  Roundtrip the new shapes through write_avro, then
    decode a HAND-ENCODED negative-count array block (spec: a negative
    item count is followed by the block's byte size — writers like
    Java Avro emit it for skippability; ours never writes it, so the
    read path must be pinned separately)."""
    import io

    from data_eng_iceberg_demo_spark.sources.avro_py import (_dec_value,
                                                             _enc_value,
                                                             _zigzag_encode)

    schema = {"type": "record", "name": "t", "fields": [
        {"name": "ids", "type": {"type": "array", "items": "int"}},
        {"name": "blob", "type": ["null", "bytes"]},
        {"name": "kv", "type": {"type": "array", "items": {
            "type": "record", "name": "p", "fields": [
                {"name": "key", "type": "int"},
                {"name": "value", "type": "bytes"}]}}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
    ]}
    rows = [([1, -2, 3], b"\x00\xff", [{"key": 9, "value": b"z"}],
             {"a": 7, "b": -1}),
            ([], None, [], {})]
    p = str(tmp_path / "shapes.avro")
    write_avro(p, rows, schema)
    sch, codec, _sync, _pos = read_header(p)
    got = []
    for off, _n, _nb in block_index(p):
        got.extend(read_block(p, off, sch, codec))
    assert [tuple(r) for r in got] == rows

    # negative-count array block: count=-2, byte size, 2 items, 0 end
    items = _enc_value(5, "int") + _enc_value(6, "int")
    buf = (_zigzag_encode(-2) + _zigzag_encode(len(items)) + items
           + _zigzag_encode(0))
    arr_t = {"type": "array", "items": "int"}
    assert _dec_value(io.BytesIO(buf), arr_t) == [5, 6]
    # compiled decoder path too
    from data_eng_iceberg_demo_spark.sources.avro_py import \
        _compile_field_decoder
    dec = _compile_field_decoder(arr_t)
    v, pos = dec(bytes(buf), 0)
    assert v == [5, 6] and pos == len(buf)


@given(recs=st.lists(st.tuples(
    st.dates(min_value=__import__("datetime").date(1900, 1, 1),
             max_value=__import__("datetime").date(2100, 1, 1)),
    st.datetimes(min_value=__import__("datetime").datetime(1900, 1, 1),
                 max_value=__import__("datetime").datetime(2100, 1, 1)),
    st.decimals(min_value=-10**9, max_value=10**9, places=2)),
    min_size=1, max_size=40))
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_logical_types_roundtrip(tmp_path_factory, recs):
    """r12 logical types: date (int days), timestamp-micros (long µs)
    and decimal (two's-complement unscaled bytes) must roundtrip
    value-exact — pre-epoch dates (negative days), negative decimals
    (sign extension) and µs precision all inside the sweep."""
    import os

    from data_eng_iceberg_demo_spark.sources.avro_py import write_avro
    from data_eng_iceberg_demo_spark.tables.iceberg_export import _avro_rows

    schema = {"type": "record", "name": "t", "fields": [
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts",
         "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "amt",
         "type": ["null", {"type": "bytes", "logicalType": "decimal",
                           "precision": 18, "scale": 2}]},
    ]}
    p = os.path.join(str(tmp_path_factory.mktemp("lgl")), "t.avro")
    write_avro(p, recs, schema)
    out = _avro_rows(p)
    assert [(r["d"], r["ts"], r["amt"]) for r in out] == [
        (d, ts, amt) for d, ts, amt in recs]


def test_unknown_logical_annotation_falls_back_to_physical(tmp_path):
    """Spec behavior: an unrecognized logicalType reads as the bare
    physical type instead of failing."""
    import os

    from data_eng_iceberg_demo_spark.sources.avro_py import write_avro
    from data_eng_iceberg_demo_spark.tables.iceberg_export import _avro_rows

    schema = {"type": "record", "name": "t", "fields": [
        {"name": "x",
         "type": {"type": "long", "logicalType": "time-weird"}}]}
    p = os.path.join(str(tmp_path), "t.avro")
    write_avro(p, [(42,)], schema)
    assert _avro_rows(p)[0]["x"] == 42


# --------------------------------------------------- corruption contract (r14)
# The container SCAN's failure contract differs from the multimodal
# payload codecs: a corrupt FILE fails the read (spark-avro FAILFAST, the
# parquet norm) — but it must fail in BOUNDED time with a classified
# error, never hang the driver's planning loop or decode phantom rows.
# Two repro'd hazards guarded in avro_py: a negative block byte-size
# moved block_index's cursor BACKWARD (infinite driver loop), and an
# attacker-controlled row count over a zero-width schema decoded 50M
# phantom rows from an EMPTY payload.

_DECODE_ERRORS = (ValueError, KeyError, IndexError, OverflowError)


def _zz(n: int) -> bytes:
    u = ((n << 1) ^ (n >> 63)) & ((1 << 70) - 1) if n < 0 else (n << 1)
    out = bytearray()
    while u > 0x7F:
        out.append((u & 0x7F) | 0x80)
        u >>= 7
    out.append(u)
    return bytes(out)


def _craft(schema: dict, blocks: list[bytes]) -> bytes:
    import json as _json
    sync = b"pyavro-sync-16bb"
    hdr = b"Obj\x01" + _zz(2)
    for k, v in (("avro.schema", _json.dumps(schema).encode()),
                 ("avro.codec", b"null")):
        hdr += _zz(len(k)) + k.encode() + _zz(len(v)) + v
    hdr += _zz(0) + sync
    return hdr + b"".join(b + sync for b in blocks)


def test_negative_block_size_fails_fast_not_forever(tmp_path):
    p = str(tmp_path / "neg.avro")
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "k", "type": "long"}]}
    with open(p, "wb") as f:
        f.write(_craft(schema, [_zz(1) + _zz(-36)]))
    with pytest.raises(ValueError, match="corrupt avro block header"):
        block_index(p)


def test_phantom_row_count_on_zero_width_schema_rejected(tmp_path):
    p = str(tmp_path / "phantom.avro")
    schema = {"type": "record", "name": "r", "fields": []}
    body = _craft(schema, [_zz(50_000_000) + _zz(0)])
    with open(p, "wb") as f:
        f.write(body)
    schema_r, codec, _sync, hdr_end = read_header(p)
    with pytest.raises(ValueError, match="implausible avro block"):
        read_block(p, hdr_end, schema_r, codec)


def test_oversized_count_on_real_schema_fails_on_payload_bounds(tmp_path):
    """Any count above the payload length on a nonzero-width schema is
    the CLASSIFIED implausible-block error (r15): the r14 guard's
    `and n > 2^24` conjunction let a mid-range corrupt count (payload
    < n <= 2^24) escape to die as a raw struct.error mid-decode — the
    advisor find; every field consumes >= 1 byte, so the bound is
    exact, not heuristic."""
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "k", "type": "long"}]}
    # 1000 declared rows, 2 bytes of payload: well under the old 2^24
    # absolute cap — must still raise the classified error
    p = str(tmp_path / "overcount.avro")
    with open(p, "wb") as f:
        f.write(_craft(schema, [_zz(1000) + _zz(2) + _zz(7)]))
    schema_r, codec, _sync, hdr_end = read_header(p)
    with pytest.raises(ValueError, match="implausible avro block"):
        read_block(p, hdr_end, schema_r, codec)


def test_zero_width_schema_within_cap_still_decodes(tmp_path):
    """The zero-width arm's absolute cap must not reject LEGITIMATE
    fieldless blocks: a row of a fieldless record consumes zero bytes
    by spec, so a modest count over an empty payload is valid data."""
    p = str(tmp_path / "fieldless.avro")
    schema = {"type": "record", "name": "r", "fields": []}
    with open(p, "wb") as f:
        f.write(_craft(schema, [_zz(3) + _zz(0)]))
    schema_r, codec, _sync, hdr_end = read_header(p)
    assert read_block(p, hdr_end, schema_r, codec) == [(), (), ()]


def test_nested_zero_width_record_field_still_decodes(tmp_path):
    """Zero-width detection must recurse (r15 review): a field whose
    type is a fieldless NESTED record also consumes zero bytes per
    row, so the strict count-vs-payload arm must not classify a valid
    file of such rows as implausible."""
    p = str(tmp_path / "nestedzero.avro")
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "sub",
                          "type": {"type": "record", "name": "n",
                                   "fields": []}}]}
    with open(p, "wb") as f:
        f.write(_craft(schema, [_zz(3) + _zz(0)]))
    schema_r, codec, _sync, hdr_end = read_header(p)
    assert read_block(p, hdr_end, schema_r, codec) == [({},)] * 3
    # and a nested record with a REAL field keeps the strict bound
    p2 = str(tmp_path / "nestedreal.avro")
    schema2 = {"type": "record", "name": "r",
               "fields": [{"name": "sub",
                           "type": {"type": "record", "name": "n",
                                    "fields": [{"name": "k",
                                                "type": "long"}]}}]}
    with open(p2, "wb") as f:
        f.write(_craft(schema2, [_zz(1000) + _zz(2) + _zz(7)]))
    schema_r2, codec2, _sync2, hdr_end2 = read_header(p2)
    with pytest.raises(ValueError, match="implausible avro block"):
        read_block(p2, hdr_end2, schema_r2, codec2)


@given(data=st.data())
@settings(max_examples=150, deadline=2000,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_container_corruption_classified_and_bounded(tmp_path_factory, data):
    """Truncations and bit flips anywhere in a VALID container must
    either still read (flips in string bodies are silent data
    corruption — the documented limit, same as the multimodal codecs)
    or raise a classified decode error in bounded time (hypothesis's
    deadline): never an exotic exception class, never a hang."""
    import zlib

    d = tmp_path_factory.mktemp("avrocorrupt")
    p = str(d / "t.avro")
    recs = [(i, f"s{i}", float(i) if i % 3 else None, bool(i % 2))
            for i in range(17)]
    write_avro(p, recs, SCHEMA, block_rows=5,
               codec=data.draw(st.sampled_from(["null", "deflate"])))
    buf = bytearray(open(p, "rb").read())
    if data.draw(st.booleans()):
        cut = data.draw(st.integers(4, len(buf) - 1))
        buf = buf[:cut]
    else:
        for _ in range(data.draw(st.integers(1, 4))):
            pos = data.draw(st.integers(4, len(buf) - 1))
            buf[pos] ^= 1 << data.draw(st.integers(0, 7))
    with open(p, "wb") as f:
        f.write(bytes(buf))
    try:
        out = _read_all(p)
        assert isinstance(out, list)  # survived: silent-bit-flip class
    except (_DECODE_ERRORS + (zlib.error, UnicodeDecodeError,
                              EOFError, struct_error)):
        pass  # classified, bounded


from struct import error as struct_error  # noqa: E402  (used above)
