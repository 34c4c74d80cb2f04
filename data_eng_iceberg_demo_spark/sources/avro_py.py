"""Pure-stdlib Avro Object Container File codec + a block-parallel
Spark Python DataSource ("pyavro").

The environment ships Avro's core Java libs but NOT the spark-avro
datasource jar, so ``spark.read.format("avro")`` is unavailable
(SURVEY.md §2 end — the one declared format-surface gap).  The Avro
container format is publicly specified (magic ``Obj\\x01``, a metadata
map carrying the JSON schema and codec, a 16-byte sync marker, then
blocks of ``<count varint><byte-size varint><payload><sync>``), and the
binary encoding of primitives is zigzag varints / IEEE little-endian
doubles / length-prefixed UTF-8 — all implementable with the stdlib
(``zlib`` with negative wbits gives Avro's raw-DEFLATE codec).  This
module closes the gap the Spark-idiomatic way: the container's OWN
block structure becomes the unit of parallelism, exactly how the
parquet reader splits on row groups — the driver skims block offsets
from the header (O(#blocks), no payload decode), each Spark task seeks
to its block and decodes independently, and the declared schema comes
from the file header so pruning/codegen see an ordinary relation.

Supported schema surface: a record of primitives (``long``, ``int``,
``double``, ``float``, ``string``, ``boolean``, ``bytes``), nested
records, ``array`` of any supported type, ``["null", T]`` unions —
the tabular subset a DataFrame round-trips, plus the shapes Iceberg
manifests need (``equality_ids``/``split_offsets`` arrays, bound maps
encoded as arrays of key/value records, ``bytes`` stat values) — and
(r12) the three ubiquitous LOGICAL types per the Avro spec:
``date`` (int days), ``timestamp-micros`` (long µs), and ``decimal``
(bytes holding the two's-complement big-endian unscaled integer) —
encoded/decoded as Python ``date``/``datetime``/``Decimal``.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)


def _logical_converters(typ: dict):
    """(to_physical, from_physical) for an annotated primitive, or None
    when `typ` carries no (supported) logicalType.  Unknown logical
    types on a supported physical type fall back to the bare physical
    coding, exactly what the Avro spec prescribes for readers that
    don't know an annotation."""
    lt, pt = typ.get("logicalType"), typ.get("type")
    if lt == "date" and pt == "int":
        def to_p(v):
            return ((v - _EPOCH_DATE).days
                    if isinstance(v, _dt.date) else int(v))

        def from_p(n):
            return _EPOCH_DATE + _dt.timedelta(days=n)
        return to_p, from_p
    if lt == "timestamp-micros" and pt == "long":
        def to_p(v):
            if isinstance(v, _dt.datetime):
                base = (_EPOCH_DT.replace(tzinfo=v.tzinfo)
                        if v.tzinfo else _EPOCH_DT)
                delta = v - base
                return delta.days * 86_400_000_000 + delta.seconds * 1_000_000 \
                    + delta.microseconds
            return int(v)

        def from_p(n):
            return _EPOCH_DT + _dt.timedelta(microseconds=n)
        return to_p, from_p
    if lt == "decimal" and pt == "bytes":
        scale = int(typ.get("scale", 0))

        def to_p(v):
            unscaled = int(_decimal.Decimal(v).scaleb(scale)
                           .to_integral_value())
            length = max(1, (unscaled.bit_length() + 8) // 8)
            return unscaled.to_bytes(length, "big", signed=True)

        def from_p(b):
            return _decimal.Decimal(
                int.from_bytes(b, "big", signed=True)).scaleb(-scale)
        return to_p, from_p
    return None


# --------------------------------------------------------------- binary codec
def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = u = 0
    while True:
        (b,) = buf.read(1)
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _enc_value(v, typ):
    if isinstance(typ, dict) and "logicalType" in typ:
        conv = _logical_converters(typ)
        if conv is not None:
            return _enc_value(conv[0](v), typ["type"])
        return _enc_value(v, typ["type"])  # unknown annotation: bare
    if isinstance(typ, list):  # ["null", T]
        if v is None:
            return _zigzag_encode(typ.index("null"))
        t = next(t for t in typ if t != "null")
        return _zigzag_encode(typ.index(t)) + _enc_value(v, t)
    if isinstance(typ, dict) and typ.get("type") == "record":
        # nested record: concatenation of its fields in declared order
        # (the Iceberg manifest shape — data_file inside manifest_entry);
        # v is a dict keyed by field name
        return b"".join(_enc_value(v[f["name"]], f["type"])
                        for f in typ["fields"])
    if typ in ("long", "int"):
        return _zigzag_encode(int(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "float":
        return struct.pack("<f", float(v))
    if typ == "string":
        b = str(v).encode("utf-8")
        return _zigzag_encode(len(b)) + b
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ == "bytes":
        b = bytes(v)
        return _zigzag_encode(len(b)) + b
    if isinstance(typ, dict) and typ.get("type") == "array":
        # one block: count, items, 0 terminator (spec allows many blocks;
        # a single block is always a valid encoding)
        items = list(v)
        if not items:
            return _zigzag_encode(0)
        body = b"".join(_enc_value(it, typ["items"]) for it in items)
        return _zigzag_encode(len(items)) + body + _zigzag_encode(0)
    if isinstance(typ, dict) and typ.get("type") == "map":
        pairs = list(v.items())
        if not pairs:
            return _zigzag_encode(0)
        body = b"".join(_enc_value(k, "string") + _enc_value(x, typ["values"])
                        for k, x in pairs)
        return _zigzag_encode(len(pairs)) + body + _zigzag_encode(0)
    raise ValueError(f"unsupported avro type: {typ!r}")


def _dec_value(buf: io.BytesIO, typ):
    if isinstance(typ, dict) and "logicalType" in typ:
        conv = _logical_converters(typ)
        raw = _dec_value(buf, typ["type"])
        return conv[1](raw) if conv is not None else raw
    if isinstance(typ, list):
        branch = typ[_zigzag_decode(buf)]
        return None if branch == "null" else _dec_value(buf, branch)
    if isinstance(typ, dict) and typ.get("type") == "record":
        return {f["name"]: _dec_value(buf, f["type"])
                for f in typ["fields"]}
    if typ in ("long", "int"):
        return _zigzag_decode(buf)
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if typ == "string":
        return buf.read(_zigzag_decode(buf)).decode("utf-8")
    if typ == "boolean":
        b = buf.read(1)
        if not b:
            # read(1) == b'\x01' would decode a truncated buffer as a
            # silent False; error like the varint/struct paths (r8 advice)
            raise ValueError("truncated avro data: expected boolean byte")
        return b == b"\x01"
    if typ == "bytes":
        n = _zigzag_decode(buf)
        body = buf.read(n)
        if len(body) != n:
            raise ValueError("truncated avro data: bytes body")
        return body
    if isinstance(typ, dict) and typ.get("type") == "array":
        out = []
        while True:
            n = _zigzag_decode(buf)
            if n == 0:
                return out
            if n < 0:  # negative count: a block byte-size follows (spec)
                n = -n
                _zigzag_decode(buf)
            out += [_dec_value(buf, typ["items"]) for _ in range(n)]
    if isinstance(typ, dict) and typ.get("type") == "map":
        out = {}
        while True:
            n = _zigzag_decode(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _zigzag_decode(buf)
            for _ in range(n):
                k = _dec_value(buf, "string")
                out[k] = _dec_value(buf, typ["values"])
    raise ValueError(f"unsupported avro type: {typ!r}")


def _field_types(schema: dict) -> list[tuple[str, object]]:
    if schema.get("type") != "record":
        raise ValueError("top-level avro schema must be a record")
    return [(f["name"], f["type"]) for f in schema["fields"]]


# ----------------------------------------------- compiled row codec (hot path)
# _enc_value/_dec_value stay as the readable spec reference (and handle
# any nesting), but per-row they cost a recursive call + a bytes
# allocation per value.  The container writer/reader instead compile the
# schema ONCE into a flat list of per-field closures appending into a
# shared bytearray / reading from the payload bytes with an integer
# cursor — ~2.5x on the 100k-row sink profile (r9).

def _zz_append(out: bytearray, n: int) -> None:
    u = (n << 1) ^ (n >> 63)
    while u > 0x7F:
        out.append((u & 0x7F) | 0x80)
        u >>= 7
    out.append(u)


def _compile_field_encoder(typ):
    """field value -> closure(out: bytearray, v)."""
    if isinstance(typ, dict) and "logicalType" in typ:
        conv = _logical_converters(typ)
        inner = _compile_field_encoder(typ["type"])
        if conv is None:
            return inner
        to_p = conv[0]

        def enc(out, v):
            inner(out, to_p(v))
        return enc
    if isinstance(typ, list):  # ["null", T]
        null_ix = typ.index("null")
        t = next(x for x in typ if x != "null")
        null_b = bytes(_zigzag_encode(null_ix))
        val_b = bytes(_zigzag_encode(typ.index(t)))
        inner = _compile_field_encoder(t)

        def enc(out, v):
            if v is None:
                out += null_b
            else:
                out += val_b
                inner(out, v)
        return enc
    if typ in ("long", "int"):
        def enc(out, v):
            _zz_append(out, int(v))
        return enc
    if typ == "double":
        pack = struct.Struct("<d").pack

        def enc(out, v):
            out += pack(float(v))
        return enc
    if typ == "float":
        pack = struct.Struct("<f").pack

        def enc(out, v):
            out += pack(float(v))
        return enc
    if typ == "string":
        def enc(out, v):
            b = str(v).encode("utf-8")
            _zz_append(out, len(b))
            out += b
        return enc
    if typ == "boolean":
        def enc(out, v):
            out.append(1 if v else 0)
        return enc
    if typ == "bytes":
        def enc(out, v):
            b = bytes(v)
            _zz_append(out, len(b))
            out += b
        return enc
    if isinstance(typ, dict) and typ.get("type") == "array":
        inner = _compile_field_encoder(typ["items"])

        def enc(out, v):
            items = list(v)
            if items:
                _zz_append(out, len(items))
                for it in items:
                    inner(out, it)
            _zz_append(out, 0)
        return enc
    if isinstance(typ, dict) and typ.get("type") == "map":
        kenc = _compile_field_encoder("string")
        venc = _compile_field_encoder(typ["values"])

        def enc(out, v):
            pairs = list(v.items())
            if pairs:
                _zz_append(out, len(pairs))
                for k, x in pairs:
                    kenc(out, k)
                    venc(out, x)
            _zz_append(out, 0)
        return enc
    if isinstance(typ, dict) and typ.get("type") == "record":
        names = [f["name"] for f in typ["fields"]]
        encs = [_compile_field_encoder(f["type"]) for f in typ["fields"]]

        def enc(out, v):
            for name, e in zip(names, encs):
                e(out, v[name])
        return enc
    raise ValueError(f"unsupported avro type: {typ!r}")


def _compile_field_decoder(typ):
    """field -> closure(payload: bytes, pos) -> (value, new_pos)."""
    if isinstance(typ, dict) and "logicalType" in typ:
        conv = _logical_converters(typ)
        inner = _compile_field_decoder(typ["type"])
        if conv is None:
            return inner
        from_p = conv[1]

        def dec(pl, pos):
            raw, pos = inner(pl, pos)
            return from_p(raw), pos
        return dec
    if isinstance(typ, list):
        branches = [None if t == "null" else _compile_field_decoder(t)
                    for t in typ]

        def dec(pl, pos):
            ix, pos = _zz_read(pl, pos)
            inner = branches[ix]
            return (None, pos) if inner is None else inner(pl, pos)
        return dec
    if typ in ("long", "int"):
        return _zz_read
    if typ == "double":
        unpack = struct.Struct("<d").unpack_from

        def dec(pl, pos):
            return unpack(pl, pos)[0], pos + 8
        return dec
    if typ == "float":
        unpack = struct.Struct("<f").unpack_from

        def dec(pl, pos):
            return unpack(pl, pos)[0], pos + 4
        return dec
    if typ == "string":
        def dec(pl, pos):
            n, pos = _zz_read(pl, pos)
            end = pos + n
            if end > len(pl):
                raise ValueError("truncated avro data: string body")
            return pl[pos:end].decode("utf-8"), end
        return dec
    if typ == "boolean":
        def dec(pl, pos):
            if pos >= len(pl):
                raise ValueError("truncated avro data: expected boolean byte")
            return pl[pos] == 1, pos + 1
        return dec
    if typ == "bytes":
        def dec(pl, pos):
            n, pos = _zz_read(pl, pos)
            end = pos + n
            if end > len(pl):
                raise ValueError("truncated avro data: bytes body")
            return pl[pos:end], end
        return dec
    if isinstance(typ, dict) and typ.get("type") == "array":
        inner = _compile_field_decoder(typ["items"])

        def dec(pl, pos):
            out = []
            while True:
                n, pos = _zz_read(pl, pos)
                if n == 0:
                    return out, pos
                if n < 0:  # negative count: block byte-size follows (spec)
                    n = -n
                    _, pos = _zz_read(pl, pos)
                for _ in range(n):
                    v, pos = inner(pl, pos)
                    out.append(v)
        return dec
    if isinstance(typ, dict) and typ.get("type") == "map":
        kdec = _compile_field_decoder("string")
        vdec = _compile_field_decoder(typ["values"])

        def dec(pl, pos):
            out = {}
            while True:
                n, pos = _zz_read(pl, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    n = -n
                    _, pos = _zz_read(pl, pos)
                for _ in range(n):
                    k, pos = kdec(pl, pos)
                    out[k], pos = vdec(pl, pos)
        return dec
    if isinstance(typ, dict) and typ.get("type") == "record":
        names = [f["name"] for f in typ["fields"]]
        decs = [_compile_field_decoder(f["type"]) for f in typ["fields"]]

        def dec(pl, pos):
            v = {}
            for name, d in zip(names, decs):
                v[name], pos = d(pl, pos)
            return v, pos
        return dec
    raise ValueError(f"unsupported avro type: {typ!r}")


def _zz_read(pl: bytes, pos: int):
    shift = u = 0
    n = len(pl)
    while True:
        if pos >= n:
            raise ValueError("truncated avro data: varint")
        b = pl[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


# ------------------------------------------------------------ container file
def write_avro(path: str, records, schema: dict, codec: str = "deflate",
               block_rows: int = 100, sync: bytes | None = None,
               extra_meta: dict | None = None) -> None:
    """Write an Avro Object Container File (codec ``null`` or
    ``deflate``).  ``sync`` defaults to a deterministic marker so the
    same records produce the same bytes.  ``extra_meta`` adds key-value
    pairs to the container's metadata map (str -> str/bytes) — Iceberg
    manifests carry their table schema/partition-spec/format-version
    there, required by real spec readers."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec: {codec}")
    sync = sync or b"pyavro-sync-16bb"
    if len(sync) != 16:
        # Not an assert: under ``python -O`` a stripped assert would let a
        # wrong-length sync through, and every block offset (payload+16)
        # downstream would silently misalign (r8 advice).
        raise ValueError(f"sync marker must be 16 bytes, got {len(sync)}")
    fields = _field_types(schema)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    for k, v in (extra_meta or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(_zigzag_encode(len(meta)))
        for k, v in sorted(meta.items()):
            kb = k.encode()
            f.write(_zigzag_encode(len(kb)) + kb)
            f.write(_zigzag_encode(len(v)) + v)
        f.write(_zigzag_encode(0))  # end of metadata map
        f.write(sync)
        recs = list(records)
        encoders = [_compile_field_encoder(t) for _n, t in fields]
        for a in range(0, len(recs), block_rows):
            chunk = recs[a:a + block_rows]
            out = bytearray()
            for r in chunk:
                for i, enc in enumerate(encoders):
                    enc(out, r[i])
            payload = bytes(out)
            if codec == "deflate":
                co = zlib.compressobj(6, zlib.DEFLATED, -15)
                payload = co.compress(payload) + co.flush()
            f.write(_zigzag_encode(len(chunk)))
            f.write(_zigzag_encode(len(payload)))
            f.write(payload)
            f.write(sync)


def _parse_header(buf: io.BytesIO) -> tuple[dict, bytes]:
    """Metadata map + sync from a buffer positioned after the magic.
    Raises ValueError if the buffer ends mid-header (caller grows it).
    Spec shape honored: a NEGATIVE map-block count means abs(count)
    pairs preceded by a long byte-size (foreign writers use it)."""
    meta = {}
    n = _zigzag_decode(buf)
    while n:
        if n < 0:
            _zigzag_decode(buf)  # block byte-size; unused when parsing
        for _ in range(abs(n)):
            k = _read_exact(buf, _zigzag_decode(buf)).decode()
            meta[k] = _read_exact(buf, _zigzag_decode(buf))
        n = _zigzag_decode(buf)
    return meta, _read_exact(buf, 16)


def _read_exact(buf: io.BytesIO, n: int) -> bytes:
    b = buf.read(n)
    if len(b) != n:
        raise ValueError("truncated header")
    return b


def read_header(path: str) -> tuple[dict, str, bytes, int]:
    """(schema, codec, sync, header_end_offset) from the container
    header — BOUNDED reads (64 KiB prefix, grown geometrically for
    huge embedded schemas), never the whole file: this runs on the
    driver during planning, where a multi-GB container must not be
    slurped into memory (r8 review finding)."""
    size = os.path.getsize(path)
    prefix = 1 << 16
    while True:
        with open(path, "rb") as f:
            head = f.read(min(prefix, size))
        if head[:4] != _MAGIC:
            raise ValueError(f"not an avro container file: {path}")
        buf = io.BytesIO(head[4:])
        try:
            meta, sync = _parse_header(buf)
            break
        except ValueError:
            if prefix >= size:
                raise ValueError(f"truncated avro header: {path}")
            prefix *= 4
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync, 4 + buf.tell()


def block_index(path: str) -> list[tuple[int, int, int]]:
    """[(offset, n_records, byte_size)] for every block — an O(#blocks)
    skim that never decodes payloads; this is the driver-side planning
    step (the parquet-footer analog)."""
    _schema, _codec, _sync, pos = read_header(path)
    size = os.path.getsize(path)
    out = []
    with open(path, "rb") as f:
        while pos < size:
            f.seek(pos)
            head = io.BytesIO(f.read(20))
            n = _zigzag_decode(head)
            nbytes = _zigzag_decode(head)
            # corruption guard (r14): a negative byte-size would move
            # pos BACKWARD and wedge the DRIVER in an infinite planning
            # loop; a negative count is equally impossible per spec
            if n < 0 or nbytes < 0:
                raise ValueError(
                    f"corrupt avro block header at offset {pos}: "
                    f"count={n} byte_size={nbytes}")
            out.append((pos, n, nbytes))
            pos += head.tell() + nbytes + 16  # payload + sync marker
    return out


def read_block(path: str, offset: int, schema: dict, codec: str):
    """Decode one block into a list of tuples."""
    fields = _field_types(schema)
    with open(path, "rb") as f:
        f.seek(offset)
        head = io.BytesIO(f.read(20))
        n = _zigzag_decode(head)
        nbytes = _zigzag_decode(head)
        f.seek(offset + head.tell())
        payload = f.read(nbytes)
    if codec == "deflate":
        payload = zlib.decompress(payload, -15)
    decoders = [_compile_field_decoder(t) for _n, t in fields]
    # corruption guards (r14, tightened r15): the row count comes
    # straight from the (possibly corrupted) block header, and rows of
    # a zero-width schema consume ZERO payload bytes — an attacker-
    # controlled count over an empty payload decoded 50M phantom rows
    # in the repro (executor OOM at container scale).  Any real row
    # with >= 1 decoding field consumes >= 1 byte (every non-null leaf
    # reads bytes and a union reads its branch index), so for a
    # nonzero-width schema ANY count above the payload length is a
    # classified corruption — the r14 `and n > 2^24` conjunction let a
    # mid-range corrupt count escape to die as a raw struct.error
    # mid-decode (r14 advisor).  Zero-width (fieldless-record) schemas
    # have no per-row byte floor, so they keep the absolute
    # plausibility cap.
    if n < 0 or nbytes < 0:
        raise ValueError(
            f"corrupt avro block header at offset {offset}: "
            f"count={n} byte_size={nbytes}")

    def _zero_width(t):
        # a field decodes zero bytes iff it is a record of only
        # zero-width fields — vacuously, a fieldless record (possibly
        # nested: records of fieldless records).  A bare "null" field
        # never reaches here (_compile_field_decoder rejects the plain
        # "null" type before any block is decoded — r15 advisor: the
        # old `t == "null"` leaf arm was dead code), arrays/maps always
        # read their terminating 0 block count and unions their branch
        # index, so every other shape is >= 1 byte per row
        if isinstance(t, dict) and "logicalType" in t:
            return _zero_width(t["type"])
        if isinstance(t, dict) and t.get("type") == "record":
            return all(_zero_width(f["type"]) for f in t.get("fields", []))
        return False

    if all(_zero_width(t) for _n, t in fields):
        if n > (1 << 24):
            raise ValueError(
                f"implausible avro block at offset {offset}: count={n} "
                f"phantom rows of a zero-width schema")
    elif n > len(payload):
        raise ValueError(
            f"implausible avro block at offset {offset}: count={n} "
            f"exceeds payload capacity ({len(payload)} bytes)")
    pos, rows = 0, []
    for _ in range(n):
        vals = []
        for dec in decoders:
            v, pos = dec(payload, pos)
            vals.append(v)
        rows.append(tuple(vals))
    return rows


# --------------------------------------------------------------- spark source
def _spark_type(t):
    from pyspark.sql import types as T

    if isinstance(t, list):
        return _spark_type(next(x for x in t if x != "null"))
    return {"long": T.LongType(), "int": T.IntegerType(),
            "double": T.DoubleType(), "float": T.FloatType(),
            "string": T.StringType(), "boolean": T.BooleanType()}[t]


def make_source():
    """Build the DataSource class lazily (pyspark import kept out of
    module import time for the pure-codec consumers/tests)."""
    from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                        InputPartition,
                                        SimpleDataSourceStreamReader)
    from pyspark.sql.types import StructField, StructType

    class _Block(InputPartition):
        def __init__(self, path, offset):
            self.path, self.offset = path, offset

    class PyAvroReader(DataSourceReader):
        def __init__(self, options):
            self.path = options["path"]
            self.schema_json, self.codec, _sync, _ = read_header(self.path)

        def partitions(self):
            # one Spark task per container block — the row-group split
            return [_Block(self.path, off)
                    for off, _n, _s in block_index(self.path)]

        def read(self, partition):
            # a zero-block container (empty write) plans no partitions;
            # Spark still schedules one task handing read() None
            if partition is None:
                return
            yield from read_block(partition.path, partition.offset,
                                  self.schema_json, self.codec)

    class PyAvroStreamReader(SimpleDataSourceStreamReader):
        """Streaming face of the container: the offset is the next
        BLOCK index; each micro-batch consumes every block available
        at poll time (the file source's maxFilesPerTrigger-unset
        analogue), or at most ``maxBlocksPerTrigger`` when set — paced
        replay for backpressure without changing the offset algebra.
        End-of-data is reported by returning the start offset
        unchanged.  Because a block's rows are a pure function of
        (file, block offset), replaying a batch after failure yields
        identical rows — exactly-once without source-side state, the
        same contract as the synthetic stream source."""

        def __init__(self, options):
            self.path = options["path"]
            # 0 = unbounded (consume everything available per trigger)
            self.max_blocks = int(options.get("maxBlocksPerTrigger",
                                              options.get(
                                                  "maxblockspertrigger", 0)))
            self.schema_json, self.codec, _sync, _ = read_header(self.path)
            # size BEFORE index: if a writer appends between the two
            # calls, the recorded size is stale-LOW, so the next poll's
            # getsize() differs and _refresh re-skims.  The opposite
            # order would record the grown size against the pre-growth
            # index and freeze the stream at the stale snapshot.
            self._size = os.path.getsize(self.path)
            self.blocks = block_index(self.path)

        def initialOffset(self):
            return {"b": 0}

        def _refresh(self):
            """Re-skim the block index ONLY when the file grew (r9
            advice: the caught-up steady state otherwise pays an
            O(#blocks) header walk on every trigger), and treat a
            parse failure as 'no new data': racing a writer mid-append
            exposes a half-flushed tail block whose truncated varints
            raise ValueError — the next trigger sees it completed.
            The stale snapshot stays valid either way because blocks
            are append-only."""
            try:
                size = os.path.getsize(self.path)
                if size != self._size:
                    self.blocks = block_index(self.path)
                    self._size = size
            except (OSError, ValueError):
                pass

        def read(self, start):
            b = int(start["b"])
            if b >= len(self.blocks):
                # The init-time snapshot is stale once a writer
                # appends: follow the growing container (r8 advice)
                self._refresh()
            if b >= len(self.blocks):
                return iter([]), start
            hi = len(self.blocks)
            if self.max_blocks:
                hi = min(hi, b + self.max_blocks)
            rows = []
            for i in range(b, hi):
                rows += read_block(self.path, self.blocks[i][0],
                                   self.schema_json, self.codec)
            return iter(rows), {"b": hi}

        def readBetweenOffsets(self, start, end):
            if int(end["b"]) > len(self.blocks):
                self._refresh()
            if int(end["b"]) > len(self.blocks):
                # r10 advice: _refresh() treats a racing/truncated file
                # as 'no new data', so a committed end offset can still
                # point past the re-skimmed index — fail the replay
                # loudly instead of leaking a bare IndexError
                raise ValueError(
                    f"avro replay offset {int(end['b'])} beyond the "
                    f"{len(self.blocks)} indexed blocks of {self.path}; "
                    "file truncated or index refresh failed")
            out = []
            for b in range(int(start["b"]), int(end["b"])):
                out += read_block(self.path, self.blocks[b][0],
                                  self.schema_json, self.codec)
            return iter(out)

    class PyAvroSource(DataSource):
        @classmethod
        def name(cls):
            return "pyavro"

        def schema(self):
            schema, _codec, _sync, _ = read_header(self.options["path"])
            return StructType([
                StructField(n, _spark_type(t),
                            nullable=isinstance(t, list))
                for n, t in _field_types(schema)])

        def reader(self, schema):
            return PyAvroReader(self.options)

        def simpleStreamReader(self, schema):
            return PyAvroStreamReader(self.options)

    return PyAvroSource
