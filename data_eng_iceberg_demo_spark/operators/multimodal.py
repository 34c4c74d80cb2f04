"""B-llm multimodal-column operators (task mandate): image/audio/video as
opaque ``binary`` columns with typed metadata, decoded / feature-extracted
through Arrow-batched pandas transforms.

Offline constraint: no image/audio LIBRARIES exist in this container, so
the PIL/libvips hook (``decode_image``) stays gated — but the codec path
itself is no longer only a stub: ``encode_bmp``/``decode_bmp`` implement a
real 24-bit BMP container codec in pure stdlib (magic, BITMAPINFOHEADER,
4-byte row stride, bottom-up BGR rows), exercised end-to-end by
``llm_multimodal_decode_bmp`` whose oracle recomputes every decoded
statistic in closed form — stride, row-order or channel-order bugs fail
the hash.  The remaining queries keep the byte-level feature path; all
Spark-side plumbing (binary payload column, metadata struct, mapInPandas
batch iterator with typed output schema) is real and oracle-checked.

Scale notes: media bytes stay in one opaque column — Spark shuffles them
only when the user repartitions; mapInPandas streams Arrow batches, so
executor memory is bounded by batch size (spark.sql.execution.arrow.
maxRecordsPerBatch), not partition size.  Metadata lives beside the blob,
so pruning/filtering happens on cheap typed columns without touching bytes.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from ..plans.registry import register
from ._util import T


def decode_image(payload: bytes):
    """Real codec hook (PIL/libvips at deployment).  Offline container has
    no image libs — callers use the deterministic byte-level fake below."""
    raise NotImplementedError("image codecs unavailable offline; "
                              "use the byte-level feature path")


class BadMagic(ValueError):
    """Payload's container signature check failed — not this format at
    all.  A dedicated type (r14 review): try_decode's quarantine classes
    are part of the hash-certified contract, and classifying by message
    prefix collided with Python's own wording by one character ("not a
    BMP payload" vs "not enough values to unpack")."""


class UnsupportedEncoding(ValueError):
    """Recognized container, but an encoding variant this codec does not
    handle (bpp != 24, non-PCM WAV, zero channels, ...)."""


def _media(spark, d):
    """Synthesize the multimodal table: documents with the text payload as
    an opaque binary 'media' column + typed metadata struct."""
    docs = T(spark, d, "documents").filter(F.col("text").isNotNull())
    # NULL payloads are dropped at the boundary: every downstream decode
    # / frame / resize kernel indexes into the byte buffer, and a navy
    # of None checks in each kernel is worse than one typed contract
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.col("lang").alias("lang"),
            F.col("n_chars").alias("n_bytes_meta"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


@register(
    "llm_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           lang AS meta_lang,
           'text/plain' AS mime,
           upper(substring(md5(text), 1, 8)) AS payload_sig
    FROM documents WHERE text IS NOT NULL
    """,
)
def llm_multimodal_meta(spark, d):
    """Binary payload + metadata struct: size, typed metadata readout, and
    a content signature — all without decoding the payload (the cheap
    side of a multimodal scan: filters run on metadata, bytes untouched)."""
    m = _media(spark, d)
    return m.select(
        "doc_id",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.col("meta.lang").alias("meta_lang"),
        F.col("meta.mime").alias("mime"),
        F.upper(F.substring(F.md5("payload"), 1, 8)).alias("payload_sig"),
    )


@register(
    "llm_multimodal_decode",
    oracle="""
    WITH b AS (
        SELECT doc_id, encode(text) AS payload,
               octet_length(encode(text)) AS n
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte,
           CAST((SELECT sum(ascii(substring(text, g.i, 1)))
                 FROM generate_series(1, 16) g(i)) AS BIGINT) AS header_sum,
           CAST(n // 64 AS BIGINT) AS n_frames
    FROM b JOIN documents USING (doc_id)
    """,
)
def llm_multimodal_decode(spark, d):
    """'Decode'/feature-extract via mapInPandas over Arrow batches: byte
    count, first byte, a 16-byte header checksum, and a frame-sample count
    (every 64 bytes = one 'frame').  The deterministic byte-level stand-in
    for decode_image — identical plumbing: iterator of pandas batches in,
    typed rows out."""

    def extract(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                # b[0] of an EMPTY payload is an IndexError; 0 matches
                # the oracle's ascii('') convention
                "first_byte": payloads.map(
                    lambda b: b[0] if len(b) else 0).astype("int64"),
                "header_sum": payloads.map(
                    lambda b: int(sum(b[:16]))).astype("int64"),
                "n_frames": payloads.map(lambda b: len(b) // 64).astype("int64"),
            })

    m = _media(spark, d).select("doc_id", "payload")
    return m.mapInPandas(
        extract,
        "doc_id bigint, n_bytes bigint, first_byte bigint, "
        "header_sum bigint, n_frames bigint")


@register(
    "llm_multimodal_route",
    oracle="""
    SELECT CASE WHEN n_chars < 200 THEN 'small'
                WHEN n_chars < 400 THEN 'medium'
                ELSE 'large' END AS size_class,
           count(*) AS n_docs,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents WHERE text IS NOT NULL
    GROUP BY 1
    """,
)
def llm_multimodal_route(spark, d):
    """Route media by size class (the partition key a real pipeline would
    write by) and aggregate byte budgets per class — metadata-only plan,
    payload bytes never shuffle."""
    m = _media(spark, d)
    sized = m.select(
        F.when(F.col("meta.n_bytes_meta") < 200, "small")
        .when(F.col("meta.n_bytes_meta") < 400, "medium")
        .otherwise("large").alias("size_class"),
        F.octet_length("payload").cast("bigint").alias("nb"),
    )
    return sized.groupBy("size_class").agg(
        F.count("*").alias("n_docs"),
        F.sum("nb").alias("total_bytes"),
        F.max("nb").alias("max_bytes"),
    )


@register(
    "llm_multimodal_frames",
    oracle="""
    WITH b AS (
        SELECT doc_id, text, octet_length(encode(text)) // 64 AS n_frames
        FROM documents WHERE text IS NOT NULL
    ), e AS (
        SELECT doc_id, text,
               unnest(generate_series(0, n_frames - 1)) AS i
        FROM b WHERE n_frames > 0
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS frame_idx,
           md5(substring(text, CAST(i * 64 + 1 AS INTEGER), 64)) AS frame_sig
    FROM e
    WHERE i % 4 = 0
    """,
)
def llm_multimodal_frames(spark, d):
    """Frame sampling: explode the payload into fixed 64-byte 'frames'
    and keep every 4th (the video-keyframe shape: 1 row in -> k rows
    out).  mapInPandas streams Arrow batches, so a huge payload never
    materializes per-row Python objects beyond its own frames; output
    rows carry only the 32-byte signature, not the frame bytes."""

    def sample_frames(batches):
        import hashlib
        for pdf in batches:
            ids, idxs, sigs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(0, len(payload) // 64, 4):
                    frame = payload[i * 64:(i + 1) * 64]
                    ids.append(doc_id)
                    idxs.append(i)
                    sigs.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int64"),
                                "frame_sig": pd.Series(sigs, dtype="object")})

    m = _media(spark, d).select("doc_id", "payload")
    return m.mapInPandas(
        sample_frames, "doc_id bigint, frame_idx bigint, frame_sig string")


@register(
    "llm_multimodal_resize",
    oracle="""
    SELECT doc_id,
           CAST(128 AS BIGINT) AS resized_bytes,
           md5(rpad(substring(text, 1, 128), 128, ' ')) AS resized_sig
    FROM documents WHERE text IS NOT NULL
    """,
)
def llm_multimodal_resize(spark, d):
    """'Resize' to a fixed byte budget (truncate-or-pad to 128 bytes) —
    the byte-level stand-in for image resize; a real deployment swaps the
    kernel for PIL.thumbnail inside the same mapInPandas signature
    (binary in, binary out, bounded batch memory).  Emits the size and a
    content signature rather than raw bytes so downstream compares stay
    cheap."""

    def resize(batches):
        import hashlib
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda b: (b[:128] + b" " * max(0, 128 - len(b))))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "resized_bytes": resized.map(len).astype("int64"),
                "resized_sig": resized.map(
                    lambda b: hashlib.md5(b).hexdigest()),
            })

    m = _media(spark, d).select("doc_id", "payload")
    return m.mapInPandas(
        resize, "doc_id bigint, resized_bytes bigint, resized_sig string")


def encode_bmp(doc_id: int, width: int = 6, height: int = 4) -> bytes:
    """A REAL image codec, pure stdlib: write a 24-bit uncompressed BMP
    (BITMAPINFOHEADER) whose pixels derive deterministically from doc_id.
    Width 6 makes the row stride (18 bytes) pad to 20 — so a decoder
    that ignores BMP's 4-byte row alignment reads garbage."""

    stride = (width * 3 + 3) // 4 * 4
    header = struct.pack("<2sIHHI", b"BM", 54 + stride * height, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      stride * height, 2835, 2835, 0, 0)
    rows = []
    for yy in range(height - 1, -1, -1):      # BMP stores rows bottom-up
        row = bytearray()
        for x in range(width):
            i = yy * width + x
            row += bytes((((doc_id * 31 + i * 7) % 256),    # B
                          ((doc_id * 17 + i * 11) % 256),   # G
                          ((doc_id * 13 + i * 5) % 256)))   # R
        row += b"\x00" * (stride - width * 3)
        rows.append(bytes(row))
    return header + dib + b"".join(rows)


def decode_bmp(buf: bytes):
    """Parse the BMP container for real: magic, pixel-array offset,
    dimensions, bpp, 4-byte row stride, bottom-up row order, BGR channel
    order.  Returns (width, height, bpp, sum_r, sum_g, sum_b,
    top_left_b)."""

    if buf[:2] != b"BM":
        raise BadMagic("not a BMP payload")
    (off,) = struct.unpack_from("<I", buf, 10)
    _hdrsz, width, height, _planes, bpp = struct.unpack_from("<IiiHH", buf, 14)
    if bpp != 24:
        raise UnsupportedEncoding(f"unsupported bpp {bpp}")
    stride = (width * 3 + 3) // 4 * 4
    # the declared pixel array (stride padding included) must fit the
    # payload: rejects truncated downloads whose missing bytes are only
    # trailing padding (r14 corruption-sweep catch) and bounds the read
    # before a corrupted dimension field is trusted
    if width < 0 or off + stride * abs(height) > len(buf):
        raise ValueError("truncated BMP pixel array")
    # vectorized pixel plane (r15; r14 verdict task 3): the per-pixel
    # Python walk was interpreter-speed — at an image-corpus scale the
    # decode kernel IS the bottleneck, and np.frombuffer + a stride
    # reshape computes the identical sums (stride padding sliced off
    # BEFORE summing, exactly like the walk skipped it).  int64
    # accumulators: a 2^31-pixel image would overflow int32 sums.

    ah = abs(height)
    if width == 0 or ah == 0:
        return width, ah, bpp, 0, 0, 0, None
    plane = (np.frombuffer(buf, dtype=np.uint8, count=stride * ah,
                           offset=off)
             .reshape(ah, stride)[:, :width * 3]
             .reshape(ah, width, 3))          # stored rows x px x BGR
    sums = plane.reshape(-1, 3).sum(axis=0, dtype=np.int64)
    # logical row 0 (top) is the LAST stored row when height > 0
    # (bottom-up), the first when negative (top-down)
    top_left_b = int(plane[ah - 1 if height > 0 else 0, 0, 0])
    return (width, ah, bpp,
            int(sums[2]), int(sums[1]), int(sums[0]), top_left_b)


@register(
    "llm_multimodal_decode_bmp",
    oracle="""
    WITH px AS (
        SELECT doc_id, i
        FROM documents CROSS JOIN range(0, 24) t(i)
    )
    SELECT doc_id, 6 AS width, 4 AS height, 24 AS bpp,
           CAST(sum((doc_id * 13 + i * 5) % 256) AS BIGINT) AS sum_r,
           CAST(sum((doc_id * 17 + i * 11) % 256) AS BIGINT) AS sum_g,
           CAST(sum((doc_id * 31 + i * 7) % 256) AS BIGINT) AS sum_b,
           CAST(doc_id * 31 % 256 AS BIGINT) AS top_left_b
    FROM px GROUP BY doc_id
    """,
)
def llm_multimodal_decode_bmp(spark, d):
    """End-to-end REAL image codec over the binary column — no stub: an
    encode mapInPandas stage writes each doc a 24-bit BMP (actual
    container: magic, BITMAPINFOHEADER, 4-byte row stride, bottom-up BGR
    rows), a decode stage parses the container back and extracts
    dimensions, bpp, exact per-channel pixel sums and the top-left blue
    value.  The oracle recomputes every statistic in closed form from
    doc_id, so a decoder that mishandles stride padding, row order or
    channel order fails the hash — this is the roundtrip proof the
    PIL-gated decode_image stub cannot give.  Integer pixel sums: no
    float anywhere.

    Scale shape: two chained mapInPandas stages, zero shuffle — encode
    and decode fuse into one Arrow-batched pass over the corpus; bytes
    never leave the executor."""

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": pdf["doc_id"].map(lambda i: encode_bmp(int(i))),
            })

    def decode(batches):
        for pdf in batches:
            decoded = pdf["payload"].map(decode_bmp)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": decoded.map(lambda t: t[0]).astype("int32"),
                "height": decoded.map(lambda t: t[1]).astype("int32"),
                "bpp": decoded.map(lambda t: t[2]).astype("int32"),
                "sum_r": decoded.map(lambda t: t[3]).astype("int64"),
                "sum_g": decoded.map(lambda t: t[4]).astype("int64"),
                "sum_b": decoded.map(lambda t: t[5]).astype("int64"),
                "top_left_b": decoded.map(lambda t: t[6]).astype("int64"),
            })

    docs = T(spark, d, "documents").select("doc_id")
    media = docs.mapInPandas(encode, "doc_id bigint, payload binary")
    return media.mapInPandas(
        decode,
        "doc_id bigint, width int, height int, bpp int, "
        "sum_r bigint, sum_g bigint, sum_b bigint, top_left_b bigint")


@register(
    "llm_multimodal_dedup",
    oracle="""
    WITH sigs AS (
        SELECT doc_id, md5(text) AS payload_sig,
               octet_length(encode(text)) AS n_bytes
        FROM documents WHERE text IS NOT NULL
    )
    SELECT payload_sig,
           CAST(min(doc_id) AS BIGINT) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST(sum(n_bytes) - min(n_bytes) AS BIGINT)
               AS bytes_reclaimable,
           count(*) > 1 AS is_dup
    FROM sigs GROUP BY payload_sig
    """,
)
def llm_multimodal_dedup(spark, d):
    """Exact dedup over the opaque media column: group by a content
    digest of the payload BYTES (never the bytes themselves — the
    shuffle carries 32-hex-char keys, the blobs stay where they were
    scanned), keep the lowest doc_id as canonical, and report how many
    bytes deleting the copies reclaims.  This is the media-lake analog
    of llm_dedup_exact: at 100 TB of images the digest groupBy is the
    only shuffle, and it moves ~50 bytes per object regardless of object
    size.  The dedup decision never decodes the payload — byte-identical
    is the contract (perceptual near-dup is the separate resize/feature
    path)."""
    m = _media(spark, d)
    return (m.groupBy(F.md5("payload").alias("payload_sig"))
            .agg(F.min("doc_id").cast("bigint").alias("canonical_id"),
                 F.count("*").cast("bigint").alias("n_copies"),
                 (F.sum(F.octet_length("payload"))
                  - F.min(F.octet_length("payload"))).cast("bigint")
                 .alias("bytes_reclaimable"),
                 (F.count("*") > 1).alias("is_dup")))


def encode_wav(doc_id: int, n_samples: int = 64, rate: int = 8000) -> bytes:
    """A REAL audio codec, pure stdlib: write a 16-bit mono PCM WAV
    (RIFF/WAVE container via the ``wave`` module) whose samples derive
    deterministically from doc_id.  Samples span the signed range
    (-2048..2047), so a decoder that reads them unsigned or big-endian
    gets wildly different sums."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(
            struct.pack("<h", ((doc_id * 37 + i * 19) % 4096) - 2048)
            for i in range(n_samples)))
    return buf.getvalue()


def decode_wav(buf: bytes):
    """Parse the RIFF/WAVE container for real — by hand, not through the
    ``wave`` module that wrote it, so the roundtrip actually proves the
    container layout: RIFF magic, chunk walk, fmt (PCM tag, channels,
    rate, bits), data chunk of little-endian int16 frames.  Returns
    (n_channels, rate, bits, n_samples, sum_samples, sum_abs, peak,
    first_sample)."""

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise BadMagic("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos:pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8:pos + 8 + size]
        if len(body) < size:
            # a chunk shorter than its declared size is a truncated
            # download — without this check an even-length cut inside
            # the data chunk decoded 'ok' with silently wrong sums
            # (r14 review catch, the fail-the-row contract's one hole)
            raise ValueError(f"truncated {cid!r} chunk: "
                             f"{len(body)} of {size} bytes")
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)          # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, n_channels, rate, _byte_rate, _align, bits = fmt
    # n_channels < 1 guards the frame-count division below: a bit flip
    # zeroing the channel field otherwise escapes the per-row decode
    # contract as ZeroDivisionError (r14 corruption-sweep catch)
    if tag != 1 or bits != 16 or n_channels < 1:
        raise UnsupportedEncoding(
            f"unsupported WAV encoding tag={tag} bits={bits} "
            f"channels={n_channels}")
    # vectorized sample stats (r15; r14 verdict task 3): the generator
    # sums over a struct.unpack tuple were interpreter-speed; one
    # np.frombuffer view computes identical integer stats.  int64
    # BEFORE abs: |int16 -32768| overflows int16, and a long capture's
    # sum overflows int32.

    if len(data) % 2:
        # the replaced struct.unpack(f"<{n}h") raised on an odd-length
        # data chunk (a corrupt size field); frombuffer(count=n) would
        # silently drop the trailing byte and decode 'ok' with wrong
        # stats — keep the fail-the-row contract explicit (r15 review)
        raise ValueError("odd-length WAV data chunk for 16-bit samples")
    v = np.frombuffer(data, dtype="<i2").astype(np.int64)
    a = np.abs(v)
    return (n_channels, rate, bits, len(v) // n_channels,
            int(v.sum()), int(a.sum()),
            int(a.max()) if len(v) else 0,
            int(v[0]) if len(v) else 0)


@register(
    "llm_multimodal_decode_wav",
    oracle="""
    WITH s AS (
        SELECT doc_id, ((doc_id * 37 + i * 19) % 4096) - 2048 AS v
        FROM documents CROSS JOIN range(0, 64) t(i)
    )
    SELECT doc_id, 1 AS n_channels, 8000 AS sample_rate, 16 AS bits,
           64 AS n_samples,
           CAST(8000 AS BIGINT) AS duration_us,
           CAST(sum(v) AS BIGINT) AS sum_samples,
           CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
           CAST(max(abs(v)) AS BIGINT) AS peak,
           CAST((doc_id * 37) % 4096 - 2048 AS BIGINT) AS first_sample
    FROM s GROUP BY doc_id
    """,
)
def llm_multimodal_decode_wav(spark, d):
    """End-to-end REAL audio codec over the binary column (the BMP
    discipline extended to audio, r10 verdict task 5): an encode
    mapInPandas stage writes each doc a 16-bit mono PCM WAV through the
    stdlib ``wave`` writer, a decode stage re-parses the RIFF container
    BY HAND (magic, chunk walk, fmt tag, LE int16 data frames) and
    extracts format fields, exact integer sample statistics and the
    µs duration.  The oracle recomputes every statistic in closed form
    from doc_id, so endianness, signedness, chunk-offset or
    frame-count bugs fail the hash.  Integer sums only — no float.

    Scale shape: two chained mapInPandas stages, zero shuffle — encode
    and decode fuse into one Arrow-batched pass; audio bytes never
    leave the executor (same contract as llm_multimodal_decode_bmp)."""

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": pdf["doc_id"].map(lambda i: encode_wav(int(i))),
            })

    def decode(batches):
        for pdf in batches:
            dec = pdf["payload"].map(decode_wav)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_channels": dec.map(lambda t: t[0]).astype("int32"),
                "sample_rate": dec.map(lambda t: t[1]).astype("int32"),
                "bits": dec.map(lambda t: t[2]).astype("int32"),
                "n_samples": dec.map(lambda t: t[3]).astype("int32"),
                "duration_us": dec.map(
                    lambda t: t[3] * 1_000_000 // t[1]).astype("int64"),
                "sum_samples": dec.map(lambda t: t[4]).astype("int64"),
                "sum_abs": dec.map(lambda t: t[5]).astype("int64"),
                "peak": dec.map(lambda t: t[6]).astype("int64"),
                "first_sample": dec.map(lambda t: t[7]).astype("int64"),
            })

    docs = T(spark, d, "documents").select("doc_id")
    media = docs.mapInPandas(encode, "doc_id bigint, payload binary")
    return media.mapInPandas(
        decode,
        "doc_id bigint, n_channels int, sample_rate int, bits int, "
        "n_samples int, duration_us bigint, sum_samples bigint, "
        "sum_abs bigint, peak bigint, first_sample bigint")


def encode_ppm(doc_id: int, width: int = 5, height: int = 3) -> bytes:
    """A third REAL codec, pure stdlib: binary PPM (P6).  The container
    is trivially simple — the TRAP is the header grammar: any whitespace
    separates the magic / width / height / maxval tokens, and '#'
    comments run to end-of-line anywhere between them.  The encoder
    varies the layout deterministically per doc (space vs newline
    separators; a comment line for doc_id % 3 == 0), so a decoder that
    pattern-matches one fixed header layout fails the oracle."""
    sep = b" " if doc_id % 2 else b"\n"
    comment = b"# synthetic fixture\n" if doc_id % 3 == 0 else b""
    header = (b"P6\n" + comment + str(width).encode() + sep
              + str(height).encode() + b"\n255\n")
    px = bytearray()
    for i in range(width * height):
        px += bytes((((doc_id * 7 + i * 3) % 256),     # R
                     ((doc_id * 11 + i * 13) % 256),   # G
                     ((doc_id * 19 + i * 17) % 256)))  # B
    return header + bytes(px)


def decode_ppm(buf: bytes):
    """Parse P6 for real: tokenizer over the header (whitespace-
    separated tokens, '#' comments to end-of-line), then exactly
    width*height*3 raw bytes after the single whitespace that
    terminates maxval.  Returns (width, height, maxval, sum_r, sum_g,
    sum_b, top_left_r)."""
    if buf[:2] != b"P6":
        raise BadMagic("not a P6 PPM payload")
    pos, toks = 2, []
    while len(toks) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        toks.append(int(buf[start:pos]))
    pos += 1  # the single whitespace byte terminating maxval
    width, height, maxval = toks
    need = width * height * 3
    px = buf[pos:pos + need]
    if len(px) != need:
        raise ValueError("truncated PPM pixel array")
    sum_r = sum(px[0::3])
    sum_g = sum(px[1::3])
    sum_b = sum(px[2::3])
    return width, height, maxval, sum_r, sum_g, sum_b, px[0]


@register(
    "llm_multimodal_decode_ppm",
    oracle="""
    WITH px AS (
        SELECT doc_id, i
        FROM documents CROSS JOIN range(0, 15) t(i)
    )
    SELECT doc_id, 5 AS width, 3 AS height, 255 AS maxval,
           CAST(sum((doc_id * 7 + i * 3) % 256) AS BIGINT) AS sum_r,
           CAST(sum((doc_id * 11 + i * 13) % 256) AS BIGINT) AS sum_g,
           CAST(sum((doc_id * 19 + i * 17) % 256) AS BIGINT) AS sum_b,
           CAST(doc_id * 7 % 256 AS BIGINT) AS top_left_r
    FROM px GROUP BY doc_id
    """,
)
def llm_multimodal_decode_ppm(spark, d):
    """Third REAL codec roundtrip (r12, joining BMP and WAV): binary
    PPM (P6) over the media column.  Where BMP pins stride/row-order
    bugs and WAV pins chunk-offset/endianness bugs, PPM pins the HEADER
    GRAMMAR — the encoder varies token separators and injects comment
    lines deterministically per doc, and the decode tokenizes the
    header properly (any whitespace, '#' comments) before reading the
    raw RGB plane.  The oracle recomputes every channel sum in closed
    form from doc_id; hypothesis sweeps the grammar corners in
    tests/test_codec_properties.py.

    Scale shape: two chained mapInPandas stages, zero shuffle — bytes
    never leave the executor (same as the BMP/WAV arms)."""

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": pdf["doc_id"].map(lambda i: encode_ppm(int(i))),
            })

    def decode(batches):
        for pdf in batches:
            decoded = pdf["payload"].map(decode_ppm)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": decoded.map(lambda t: t[0]).astype("int32"),
                "height": decoded.map(lambda t: t[1]).astype("int32"),
                "maxval": decoded.map(lambda t: t[2]).astype("int32"),
                "sum_r": decoded.map(lambda t: t[3]).astype("int64"),
                "sum_g": decoded.map(lambda t: t[4]).astype("int64"),
                "sum_b": decoded.map(lambda t: t[5]).astype("int64"),
                "top_left_r": decoded.map(lambda t: t[6]).astype("int64"),
            })

    docs = T(spark, d, "documents").select("doc_id")
    media = docs.mapInPandas(encode, "doc_id bigint, payload binary")
    return media.mapInPandas(
        decode,
        "doc_id bigint, width int, height int, maxval int, "
        "sum_r bigint, sum_g bigint, sum_b bigint, top_left_r bigint")


def _qoi_hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(pixels, width: int, height: int) -> bytes:
    """Fourth REAL codec, pure stdlib: QOI (the public "Quite OK Image"
    spec, qoiformat.org).  Unlike the container formats (BMP stride,
    WAV chunks, PPM grammar), QOI is an actual compression STREAM with
    decoder state: a 64-slot color index keyed by (3r+5g+7b+11a)%64,
    wrapping 2-bit diffs, luma diffs, and 1..62 run-length ops — so the
    traps are stateful (a stale index slot, a mod-256 wrap, a run that
    crosses the 62 cap) rather than positional.  RGB-only encoder
    (channels=3, alpha pinned 255), byte-compatible with the reference
    qoi.c op selection order: run > index > diff > luma > rgb."""
    out = bytearray(b"qoif")
    out += width.to_bytes(4, "big") + height.to_bytes(4, "big") + bytes((3, 0))
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    for (r, g, b) in pixels:
        px = (r, g, b, 255)
        if px == prev:
            run += 1
            if run == 62:  # 63/64 reserved: they collide with RGB/RGBA tags
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        h = _qoi_hash(*px)
        if index[h] == px:
            out.append(h)  # QOI_OP_INDEX
        else:
            index[h] = px
            dr = (r - prev[0] + 128) % 256 - 128  # signed wrap, per spec
            dg = (g - prev[1] + 128) % 256 - 128
            db = (b - prev[2] + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7:
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes((0xFE, r, g, b))
        prev = px
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def decode_qoi(buf: bytes):
    """Full QOI decode: header, all six op types, the per-chunk color
    index update (the reference decoder stores px into the index after
    every CHUNK, not after every pixel — run pixels reuse the slot),
    and the 7x00+01 end marker.  Returns (width, height, channels,
    pixels) with pixels a list of (r, g, b, a)."""
    if buf[:4] != b"qoif":
        raise BadMagic("not a QOI payload")
    width = int.from_bytes(buf[4:8], "big")
    height = int.from_bytes(buf[8:12], "big")
    channels, _colorspace = buf[12], buf[13]
    px = (0, 0, 0, 255)
    index = [(0, 0, 0, 0)] * 64
    pixels = []
    p, run, n = 14, 0, width * height
    end = len(buf) - 8  # last chunk byte before the 7x00+01 end marker
    while len(pixels) < n:
        if run > 0:
            run -= 1
        else:
            if p >= end:
                raise ValueError("truncated QOI stream")
            b1 = buf[p]
            p += 1
            if b1 == 0xFE:  # QOI_OP_RGB
                px = (buf[p], buf[p + 1], buf[p + 2], px[3])
                p += 3
            elif b1 == 0xFF:  # QOI_OP_RGBA
                px = (buf[p], buf[p + 1], buf[p + 2], buf[p + 3])
                p += 4
            elif b1 >> 6 == 0:  # QOI_OP_INDEX
                px = index[b1]
            elif b1 >> 6 == 1:  # QOI_OP_DIFF
                px = ((px[0] + ((b1 >> 4) & 3) - 2) % 256,
                      (px[1] + ((b1 >> 2) & 3) - 2) % 256,
                      (px[2] + (b1 & 3) - 2) % 256, px[3])
            elif b1 >> 6 == 2:  # QOI_OP_LUMA
                dg = (b1 & 0x3F) - 32
                b2 = buf[p]
                p += 1
                px = ((px[0] + dg + ((b2 >> 4) & 0xF) - 8) % 256,
                      (px[1] + dg) % 256,
                      (px[2] + dg + (b2 & 0xF) - 8) % 256, px[3])
            else:  # QOI_OP_RUN
                run = b1 & 0x3F
            index[_qoi_hash(*px)] = px
        pixels.append(px)
    if buf[p:p + 8] != b"\x00" * 7 + b"\x01":
        raise ValueError("bad QOI end marker")
    return width, height, channels, pixels


def _qoi_doc_pixels(doc_id: int, width: int = 8, height: int = 4):
    """Deterministic 8x4 RGB image per doc, mixing the op types: r is
    row-constant, g steps by 2 mid-row (DIFF), b jumps by 40 within
    even rows (RGB/LUMA) but is row-constant on odd rows (RUNs)."""
    px = []
    for i in range(width * height):
        row, col = i // width, i % width
        r = (doc_id * 5 + row * 7) % 256
        g = (doc_id * 3 + (col // 4) * 2) % 256
        b = (doc_id * 7 + col * 40 * (1 - row % 2)) % 256
        px.append((r, g, b))
    return px


@register(
    "llm_multimodal_decode_qoi",
    oracle="""
    WITH px AS (
        SELECT doc_id, i // 8 AS row, i % 8 AS col
        FROM documents CROSS JOIN range(0, 32) t(i)
    )
    SELECT doc_id, 8 AS width, 4 AS height, 3 AS channels,
           CAST(sum((doc_id * 5 + row * 7) % 256) AS BIGINT) AS sum_r,
           CAST(sum((doc_id * 3 + (col // 4) * 2) % 256) AS BIGINT) AS sum_g,
           CAST(sum((doc_id * 7 + col * 40 * (1 - row % 2)) % 256)
               AS BIGINT) AS sum_b,
           CAST(count(*) FILTER (WHERE (doc_id * 7 + col * 40 * (1 - row % 2))
                                       % 256 >= 128) AS BIGINT) AS n_blue_hi,
           CAST((doc_id * 5) % 256 AS BIGINT) AS first_r,
           CAST((doc_id * 5 + 21) % 256 AS BIGINT) AS last_r
    FROM px GROUP BY doc_id
    """,
)
def llm_multimodal_decode_qoi(spark, d):
    """Fourth REAL codec roundtrip (r12, joining BMP/WAV/PPM): QOI —
    the first codec in the family with decoder STATE (64-slot color
    index, wrapping diff/luma deltas, run-length ops), so the pinned
    bugs are stateful: a stale index slot, a missed mod-256 wrap, a
    run crossing the 62 cap, index updated per-pixel instead of
    per-chunk.  The per-doc fixture image deliberately mixes runs
    (odd rows), small diffs (mid-row g step), and large jumps (b
    +40 on even rows); the oracle recomputes every decoded statistic
    in closed form from doc_id, and a byte-level spec vector plus a
    hypothesis encode/decode roundtrip live in
    tests/test_codec_properties.py.

    Scale shape: two chained mapInPandas stages, zero shuffle — the
    compressed payloads never leave the executor (the BMP/WAV/PPM
    discipline)."""

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": pdf["doc_id"].map(
                    lambda i: encode_qoi(_qoi_doc_pixels(int(i)), 8, 4)),
            })

    def decode(batches):
        for pdf in batches:
            decoded = pdf["payload"].map(decode_qoi)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": decoded.map(lambda t: t[0]).astype("int32"),
                "height": decoded.map(lambda t: t[1]).astype("int32"),
                "channels": decoded.map(lambda t: t[2]).astype("int32"),
                "sum_r": decoded.map(
                    lambda t: sum(p[0] for p in t[3])).astype("int64"),
                "sum_g": decoded.map(
                    lambda t: sum(p[1] for p in t[3])).astype("int64"),
                "sum_b": decoded.map(
                    lambda t: sum(p[2] for p in t[3])).astype("int64"),
                "n_blue_hi": decoded.map(
                    lambda t: sum(1 for p in t[3] if p[2] >= 128))
                    .astype("int64"),
                "first_r": decoded.map(lambda t: t[3][0][0]).astype("int64"),
                "last_r": decoded.map(lambda t: t[3][-1][0]).astype("int64"),
            })

    docs = T(spark, d, "documents").select("doc_id")
    media = docs.mapInPandas(encode, "doc_id bigint, payload binary")
    return media.mapInPandas(
        decode,
        "doc_id bigint, width int, height int, channels int, "
        "sum_r bigint, sum_g bigint, sum_b bigint, n_blue_hi bigint, "
        "first_r bigint, last_r bigint")


def encode_wav_gained(doc_id: int, n_windows: int = 8,
                      win: int = 16, rate: int = 8000) -> bytes:
    """WAV with per-window gain: window w of doc d is scaled by
    ``(d*7 + w*13) % 4`` — gain 0 windows are true digital silence, so
    an energy detector has real speech/silence structure to find."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = bytearray()
        for i in range(n_windows * win):
            g = (doc_id * 7 + (i // win) * 13) % 4
            v = (((doc_id * 37 + i * 19) % 256) - 128) * g
            frames += struct.pack("<h", v)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def _riff_data_chunk(raw: bytes) -> bytes:
    """Hand chunk-walk to a RIFF container's data payload — the ONE
    definition the audio kernels share (r16 review: llm_audio_vad and
    llm_audio_fingerprint_dedup carried verbatim copies of this walk,
    so a bounds fix would have had to land twice).  Raises the
    classified ValueError when no data chunk exists OR a chunk is
    shorter than its declared size (decode_wav's truncation rule —
    without it an even-length cut inside the data chunk fingerprints
    'ok' with silently wrong bits): unreachable from the stdlib wave
    writer, but a generator change must fail typed, not as
    frombuffer(None)'s TypeError (r15 advisor; r16 review unified the
    truncation semantics across both walks).  struct comes from module
    scope — this runs per document inside the hot mapInPandas loops, so
    a per-call import would be a per-row sys.modules lookup."""
    pos, data = 12, None
    while pos + 8 <= len(raw):
        cid = raw[pos:pos + 4]
        size = struct.unpack_from("<I", raw, pos + 4)[0]
        body = raw[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk: "
                             f"{len(body)} of {size} bytes")
        if cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if data is None:
        raise ValueError("RIFF payload has no data chunk")
    return data


@register(
    "llm_audio_vad",
    oracle="""
    WITH s AS (
        SELECT doc_id, i // 16 AS win,
               (((doc_id * 37 + i * 19) % 256) - 128)
                   * ((doc_id * 7 + (i // 16) * 13) % 4) AS v
        FROM documents CROSS JOIN range(0, 128) t(i)
    )
    SELECT doc_id, CAST(win AS BIGINT) AS win,
           CAST(sum(v * v) AS BIGINT) AS energy,
           sum(v * v) >= 100000 AS active
    FROM s GROUP BY doc_id, win
    """,
)
def llm_audio_vad(spark, d):
    """Energy-based voice-activity detection (r12): decode each doc's
    PCM WAV (the REAL stdlib codec of llm_multimodal_decode_wav, with
    per-window gain so true silence exists), then report per 16-sample
    window the exact integer energy Σv² and the active/silent verdict
    at a fixed threshold — the first stage of every speech-data
    pipeline (silence trimming, segment extraction) expressed over the
    binary column.  The oracle recomputes energies in closed form from
    doc_id, so a decoder that mis-frames windows, drops the gain, or
    reads samples unsigned fails on values.  Integer math only.

    Scale shape: encode + decode + window fold are one fused
    mapInPandas pass (audio bytes never leave the executor); the
    output is docs x windows rows with zero shuffle — the groupBy in
    the ORACLE is replaced Spark-side by an in-kernel numpy reshape,
    because the window boundary is a byte offset, not a join key."""
    docs = T(spark, d, "documents").select("doc_id")

    def vad(batches):
        import numpy as np

        for pdf in batches:
            out_doc, out_win, out_e = [], [], []
            for did in pdf["doc_id"]:
                buf = encode_wav_gained(int(did))
                (_ch, _rate, _bits, _n, _s, _sa, _pk, _f0) = decode_wav(buf)
                # re-extract raw samples via the hand parser's walk
                data = _riff_data_chunk(buf)
                v = np.frombuffer(data, dtype="<i2").astype(np.int64)
                e = (v.reshape(-1, 16) ** 2).sum(axis=1)
                out_doc += [int(did)] * len(e)
                out_win += list(range(len(e)))
                out_e += [int(x) for x in e]
            yield pd.DataFrame({"doc_id": out_doc, "win": out_win,
                                "energy": out_e})

    res = docs.mapInPandas(vad, "doc_id long, win long, energy long")
    return res.select("doc_id", "win", "energy",
                      (F.col("energy") >= 100000).alias("active"))


def phash_bands(h, n_bands: int, band_bits: int, col: str = "phash"):
    """Explode a (doc_id, <hash>) frame into its LSH band rows with the
    ENGINE-computed band value ``bv`` — shared by the pHash queries,
    the audio-fingerprint dedup, and the bucket-bound test (which must
    measure the join keys Spark actually used, not a Python
    re-derivation).

    The band value is ``(hash >> (band_bits * b)) % 2^band_bits`` via
    ``shiftrightunsigned``: a plain ``1 << (band_bits * b)`` divisor
    wraps — Spark masks an INT left-shift count mod 32 (``1 << 54`` =
    ``1 << 22``), so any band starting at bit >= 32 (exactly the wide
    forms the scale knob exists for) would silently read the wrong
    bits: high hash bits never reach candidate generation and high
    bands alias low bits, INFLATING buckets instead of bounding them.
    The hash is always < 2^63 here (the 63-pixel / 31-window caps keep
    the sign bit clear), so the unsigned right shift is the plain bit
    window."""
    return (h.select(
                "doc_id", col,
                F.explode(F.array(*[F.lit(b) for b in range(n_bands)]))
                .alias("b"))
            .withColumn(
                "bv", F.expr(f"shiftrightunsigned({col}, {band_bits} * b)"
                             f" % {1 << band_bits}")))


def banded_near_dup(h, n_bands: int, band_bits: int, col: str = "phash",
                    max_hamming: int = 2):
    """The shared banded-LSH near-dup tail (r15 review: one copy, not
    two): candidates from a (band, value) equi-self-join over
    :func:`phash_bands`, Hamming verify via popcount(xor), then the
    per-doc canonical/is_dup roll-up (canonical = smallest matching
    doc id, LEFT join so non-dups keep themselves).  Used by
    llm_image_phash_dedup (+ wide form) and
    llm_audio_fingerprint_dedup — their oracles replay this tail
    verbatim in SQL, so a future fix here (e.g. a band-arithmetic or
    hot-bucket change) reaches every banded hash dedup at once."""
    bands = phash_bands(h, n_bands, band_bits, col=col)
    a = bands.select(F.col("doc_id").alias("lo"),
                     F.col(col).alias("h_a"), "b", "bv")
    c = bands.select(F.col("doc_id").alias("hi"),
                     F.col(col).alias("h_b"), "b", "bv")
    pairs = (a.join(c, ["b", "bv"])
             .filter((F.col("lo") < F.col("hi"))
                     & (F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
                        <= max_hamming))
             .select("lo", "hi").distinct())
    return (h.join(pairs, h.doc_id == pairs.hi, "left")
            .groupBy("doc_id", col)
            .agg(F.min("lo").alias("m"))
            .select("doc_id", col,
                    F.coalesce(F.col("m"), F.col("doc_id")).alias("canonical"),
                    F.col("m").isNotNull().alias("is_dup")))


def _phash_oracle(n_pix: int, n_bands: int, band_bits: int,
                  one: str = "1") -> str:
    """DuckDB replay of llm_image_phash_dedup at a given hash geometry.
    ``one`` is the band-divisor shift base: the default 24-bit form
    keeps the historically-certified text (``1 <<`` — max shift 18,
    INT-safe), while wide forms pass ``1::BIGINT`` because a band
    starting at bit >= 31 needs a 64-bit divisor (the same wrap class
    the Spark side fixed with shiftrightunsigned)."""
    return f"""
    WITH seed AS (
        -- re-encoded variant plant: every 5th doc's image is its
        -- neighbor's image with pixel 0 brightened by +8 on one
        -- channel (the near-dup a byte-digest dedup cannot see)
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN doc_id + 1
                    ELSE doc_id END AS s,
               doc_id % 5 = 0 AS variant
        FROM documents
    ), px AS (
        SELECT doc_id, i,
               (CASE WHEN variant AND i = 0
                     THEN (CAST(concat('0x', substring(md5(s || ':' || i),
                                1, 2)) AS BIGINT) + 8) % 256
                     ELSE CAST(concat('0x', substring(md5(s || ':' || i),
                               1, 2)) AS BIGINT) END
                + CAST(concat('0x', substring(md5(s || ':' || i), 3, 2))
                       AS BIGINT)
                + CAST(concat('0x', substring(md5(s || ':' || i), 5, 2))
                       AS BIGINT)) AS gray
        FROM seed CROSS JOIN range(0, {n_pix}) t(i)
    ), tot AS (SELECT doc_id, sum(gray) AS sg FROM px GROUP BY doc_id),
    h AS (
        SELECT px.doc_id,
               CAST(sum(CASE WHEN {n_pix} * gray >= sg THEN 1::BIGINT << i
                             ELSE 0 END) AS BIGINT) AS phash
        FROM px JOIN tot USING (doc_id) GROUP BY px.doc_id
    ), bands AS (
        SELECT doc_id, phash, b, (phash // ({one} << ({band_bits} * b))) % {1 << band_bits} AS bv
        FROM h CROSS JOIN range(0, {n_bands}) t(b)
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS lo, c.doc_id AS hi
        FROM bands a JOIN bands c ON a.b = c.b AND a.bv = c.bv
                                 AND a.doc_id < c.doc_id
        WHERE bit_count(xor(a.phash, c.phash)) <= 2
    )
    SELECT h.doc_id, h.phash,
           coalesce(min(p.lo), h.doc_id) AS canonical,
           min(p.lo) IS NOT NULL AS is_dup
    FROM h LEFT JOIN pairs p ON p.hi = h.doc_id
    GROUP BY h.doc_id, h.phash
    """


@register("llm_image_phash_dedup", oracle=_phash_oracle(24, 4, 6))
def llm_image_phash_dedup(spark, d, width: int = 6, height: int = 4,
                          band_bits: int = 6):
    """Perceptual-hash image dedup (r12): the near-dup detector a
    byte-digest dedup (llm_multimodal_dedup) cannot be — a re-encoded
    or slightly-retouched image hashes to a DIFFERENT md5 but an
    almost-identical perceptual hash.  Each doc gets a REAL 24-bit BMP
    (pixels md5-derived, so the image space is uniform; every 5th doc
    is its neighbor's image with one pixel brightened — the planted
    retouch); the kernel decodes the actual bytes (stride, bottom-up
    rows, BGR — the decode_bmp contract), builds the threshold pHash
    (bit = pixel gray above image mean, the aHash construction), and
    near-dups are found by 4x6-bit LSH banding + Hamming<=2 verify
    with popcount(xor) — never all-pairs.  Verdict per image: its
    canonical (smallest matching doc id) and the drop flag.  Probed at
    sf0.01: 100/100 planted pairs found, 3 incidental — both arms
    populated.

    Scale shape: hash = one fused mapInPandas pass (image bytes never
    leave the executor); banding explodes hash_bits/band_bits rows per
    image; candidates come from a (band, value) equi-self-join; the
    verify is two integer ops.  With a FIXED hash/band width the
    candidate volume is O(n^2 / 2^band_bits) — measured 12.9x at the
    r14 10x rehearsal — so the 100 TB knob is DIMENSIONAL (the
    ivfadc-centroids pattern): width/height/band_bits parameters grow
    the hash (<= 63 pixels, the sign bit of a Spark long is off
    limits) and the band width ~log2(n/target_bucket), keeping buckets
    bounded under the SAME plan shape; the declared query keeps the
    6x4/6-bit form its hash oracle replays verbatim, and the wide form
    is pinned by test_phash_wide_band_bounds_buckets (7x9 image,
    9-bit bands: max bucket collapses ~30x, planted recall holds).  A
    hot-bucket star cap is deliberately NOT applied here: unlike the
    embedding-LSH mass-dup buckets, narrow pHash buckets are mostly
    RANDOM collisions, so a star representative usually fails the
    Hamming verify and genuine pairs would be lost."""
    n_pix = width * height
    if n_pix > 63:
        raise ValueError("phash width*height must be <= 63 (Spark long)")
    n_bands = (n_pix + band_bits - 1) // band_bits
    docs = T(spark, d, "documents").select("doc_id")

    def phash(batches):
        import hashlib
        import struct

        for pdf in batches:
            out_doc, out_h = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                s = did + 1 if did % 5 == 0 else did
                pixels = []
                for i in range(n_pix):
                    hx = hashlib.md5(f"{s}:{i}".encode()).hexdigest()
                    r, g, b = (int(hx[0:2], 16), int(hx[2:4], 16),
                               int(hx[4:6], 16))
                    if did % 5 == 0 and i == 0:
                        r = (r + 8) % 256
                    pixels.append((r, g, b))
                # REAL encode: 24-bit BMP, 4-byte stride, bottom-up rows
                stride = (width * 3 + 3) // 4 * 4
                header = struct.pack("<2sIHHI", b"BM",
                                     54 + stride * height, 0, 0, 54)
                dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24,
                                  0, stride * height, 2835, 2835, 0, 0)
                rows = []
                for yy in range(height - 1, -1, -1):
                    row = bytearray()
                    for x in range(width):
                        r, g, b = pixels[yy * width + x]
                        row += bytes((b, g, r))
                    row += b"\x00" * (stride - width * 3)
                    rows.append(bytes(row))
                buf = header + dib + b"".join(rows)
                # REAL decode: pixel walk via the BMP layout
                (off,) = struct.unpack_from("<I", buf, 10)
                _hs, w_, h_, _pl, bpp = struct.unpack_from("<IiiHH", buf, 14)
                grays = [0] * (w_ * h_)
                for yy in range(h_):
                    y = h_ - 1 - yy
                    rowoff = off + yy * stride
                    for x in range(w_):
                        b_, g_, r_ = buf[rowoff + 3 * x: rowoff + 3 * x + 3]
                        grays[y * w_ + x] = r_ + g_ + b_
                sg = sum(grays)
                hv = 0
                for i, gr in enumerate(grays):
                    if n_pix * gr >= sg:
                        hv |= 1 << i
                out_doc.append(did)
                out_h.append(hv)
            yield pd.DataFrame({"doc_id": out_doc, "phash": out_h})

    h = docs.mapInPandas(phash, "doc_id long, phash long")
    return banded_near_dup(h, n_bands, band_bits)


@register("llm_image_phash_dedup_wide",
          oracle=_phash_oracle(63, 4, 16, one="1::BIGINT"))
def llm_image_phash_dedup_wide(spark, d):
    """The pHash dedup's SCALE form, declared (r15; r14 verdict task 2):
    llm_image_phash_dedup at 7x9 pixels — 63 hash bits (the full
    Spark-long budget below the sign bit) — split into 4 bands of 16
    bits.  The r14 10x rehearsal measured the 24-bit demo width at
    O(n^2/2^bits) candidate growth because a FIXED hash space
    saturates; the r15 candidate-count sweep showed even 9-bit bands
    saturating at 50k docs (17.2M candidates, 97x per 10x).  The
    4x16-bit split is the geometry with a RECALL THEOREM: a Hamming<=2
    pair leaves at least 4-2=2 bands untouched (pigeonhole), so
    candidate generation catches EVERY pair the verify would accept —
    banding recall is exactly 1.0 at the verify threshold, not
    probabilistic — while buckets shrink 2^7x vs 9-bit bands (136k
    candidates at 50k docs; measured planted-retouch recall 0.995 at
    both 1x and 10x, the misses being pairs whose mean-shift pushed
    them past Hamming 2, which NO band split can admit).  Same plan
    shape as the demo form: mapInPandas hash, one band-value
    equi-self-join (64-bit divisors — a 32-bit `1 <<` wraps at band
    >= 2 of this width, the r14 advisor find class), popcount verify;
    oracle replays generator, threshold hash, band split and verify in
    SQL, so the driver certifies the production geometry every
    rotation.  The dimensional knob stays open for 100 TB: >63-bit
    hashes need a second long column, and band_bits grows with
    log2(corpus/target_bucket)."""
    return llm_image_phash_dedup(spark, d, width=7, height=9, band_bits=16)


@register(
    "llm_audio_fingerprint_dedup",
    oracle="""
    WITH seed AS (
        -- transcode plant: every 5th doc's audio is its neighbor's
        -- samples with sample 0 shifted +400 (a re-encode/gain wobble
        -- a byte digest cannot see)
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN doc_id + 1
                    ELSE doc_id END AS s,
               doc_id % 5 = 0 AS variant
        FROM documents
    ), smp AS (
        SELECT doc_id, i,
               (CASE WHEN variant AND i = 0 THEN 400 ELSE 0 END
                + CAST(concat('0x', substring(md5(s || ':' || i), 1, 3))
                       AS BIGINT) - 2048) AS v
        FROM seed CROSS JOIN range(0, 64) t(i)
    ), win AS (
        SELECT doc_id, i // 2 AS w, sum(v * v) AS e
        FROM smp GROUP BY doc_id, i // 2
    ), fp AS (
        SELECT a.doc_id,
               CAST(sum(CASE WHEN b.e > a.e THEN 1::BIGINT << a.w
                             ELSE 0 END) AS BIGINT) AS fingerprint
        FROM win a JOIN win b ON a.doc_id = b.doc_id AND b.w = a.w + 1
        GROUP BY a.doc_id
    ), bands AS (
        SELECT doc_id, fingerprint, b,
               (fingerprint // (1::BIGINT << (8 * b))) % 256 AS bv
        FROM fp CROSS JOIN range(0, 4) t(b)
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS lo, c.doc_id AS hi
        FROM bands a JOIN bands c ON a.b = c.b AND a.bv = c.bv
                                 AND a.doc_id < c.doc_id
        WHERE bit_count(xor(a.fingerprint, c.fingerprint)) <= 2
    )
    SELECT f.doc_id, f.fingerprint,
           coalesce(min(p.lo), f.doc_id) AS canonical,
           min(p.lo) IS NOT NULL AS is_dup
    FROM fp f LEFT JOIN pairs p ON p.hi = f.doc_id
    GROUP BY f.doc_id, f.fingerprint
    """,
)
def llm_audio_fingerprint_dedup(spark, d):
    """Audio near-dup dedup by energy-envelope fingerprint (r15) — the
    AUDIO sibling of llm_image_phash_dedup: a re-encoded or
    gain-wobbled recording hashes to a different md5 but an almost
    identical acoustic fingerprint.  Each doc gets a REAL 16-bit mono
    PCM WAV (samples md5-derived, so the signal space is diverse;
    every 5th doc is its neighbor's audio with one sample shifted +400
    — the transcode wobble); the kernel writes the actual RIFF bytes
    through the stdlib ``wave`` writer and re-extracts the samples by
    the hand chunk-walk (the decode_wav contract), then builds the
    classic envelope fingerprint (chromaprint's construction,
    simplified): 32 two-sample energy windows, bit k = e[k+1] > e[k] —
    a 31-bit signature invariant to small amplitude noise.  Near-dups
    via 4x8-bit LSH banding + Hamming<=2 popcount verify; banding
    recall is EXACT by pigeonhole (<=2 flips leave >=2 of 4 bands
    clean).  Fixture plant: 886/1000 planted pairs land
    fingerprint-identical and 114 at Hamming 1 (the wobble flips the
    first envelope comparison when sample 0 sits near its window
    boundary) — both arms of the verify populated; incidental
    Hamming<=2 collisions are ~4 per 2000 docs (31-bit space).

    Scale shape: fingerprint = one fused mapInPandas pass (audio bytes
    never leave the executor); banding explodes 4 rows per doc;
    candidates come from a (band, value) equi-self-join; the verify is
    two integer ops.  Real audio is seconds long, so production
    fingerprints are hundreds of bits (more windows) and band_bits
    grows with log2(corpus/target_bucket) — the llm_image_phash_dedup
    dimensional knob; the 64-sample fixture geometry bounds this demo
    at 31 bits."""
    import numpy as np

    docs = T(spark, d, "documents").select("doc_id")

    def fingerprint(batches):
        import hashlib
        import io
        import wave

        def synth(s, cache):
            # md5-derived 12-bit samples, vectorized (r15 verdict
            # task 4): the 64 digests land in ONE joined byte matrix
            # and np.frombuffer + two integer ops replace the
            # per-sample hexdigest slicing / int(_, 16) parse —
            # int(hexdigest[:3], 16) == (digest[0] << 4) |
            # (digest[1] >> 4), so the samples are bit-identical to
            # the scalar form (fingerprint equality pinned in
            # tests/test_multimodal_corruption.py).  The per-batch
            # cache also halves the md5 work: every 5th doc reuses
            # its neighbor's source signal (the transcode plant).
            a = cache.get(s)
            if a is None:
                buf = b"".join(hashlib.md5(b"%d:%d" % (s, i)).digest()
                               for i in range(64))
                m = np.frombuffer(buf, dtype=np.uint8).reshape(64, 16)
                a = (((m[:, 0].astype(np.int64) << 4) | (m[:, 1] >> 4))
                     - 2048)
                cache[s] = a
            return a

        for pdf in batches:
            out_doc, out_fp = [], []
            cache = {}
            for did in pdf["doc_id"]:
                did = int(did)
                s = did + 1 if did % 5 == 0 else did
                vals = synth(s, cache)
                if did % 5 == 0:
                    vals = vals.copy()
                    vals[0] += 400
                # REAL encode: RIFF/WAVE via the stdlib writer
                bio = io.BytesIO()
                with wave.open(bio, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(vals.astype("<i2").tobytes())
                raw = bio.getvalue()
                # REAL decode: hand chunk-walk to the data frames
                # (shared typed-failure walk — see _riff_data_chunk)
                data = _riff_data_chunk(raw)
                v = np.frombuffer(data, dtype="<i2").astype(np.int64)
                e = (v.reshape(-1, 2) ** 2).sum(axis=1)
                bits = (e[1:] > e[:-1]).astype(np.int64)
                out_doc.append(did)
                out_fp.append(int((bits << np.arange(31)).sum()))
            yield pd.DataFrame({"doc_id": out_doc, "fingerprint": out_fp})

    fpdf = docs.mapInPandas(fingerprint, "doc_id long, fingerprint long")
    return banded_near_dup(fpdf, 4, 8, col="fingerprint")


def try_decode(decoder, buf: bytes):
    """Fail-the-ROW decode contract (r14; r13 verdict task 3 — the
    fn_try_family discipline applied to binary payloads): run a codec
    over one payload, mapping every decode failure to a quarantine
    class instead of letting it kill the job.  Classes:

      * ``bad_magic``   — the container signature check rejected the
        payload (the typed :class:`BadMagic` from any of the four
        codecs);
      * ``unsupported`` — a recognized container with an encoding this
        codec does not handle (:class:`UnsupportedEncoding`: bpp != 24,
        non-PCM WAV, zero channels, ...);
      * ``corrupt``     — everything else: truncation, bad end markers,
        short structs, out-of-range reads (plain ValueError /
        struct.error / IndexError from anywhere inside the parse).

    Returns ``(result_tuple, None)`` on success, ``(None, err_class)``
    on failure.  All four stdlib codecs do bounded work under ARBITRARY
    corruption — each parse loop either advances through the payload or
    fails on an out-of-bounds read, so a bit-flipped dimension field
    costs O(payload), never O(declared dims) — which is what makes the
    per-row catch safe at scale (one poison row quarantines itself in
    microseconds instead of stalling an executor); the hypothesis sweep
    in tests/test_multimodal_corruption.py drives random truncations
    and bit flips through every codec to hold exactly this contract."""

    try:
        return decoder(buf), None
    except BadMagic:
        return None, "bad_magic"
    except UnsupportedEncoding:
        return None, "unsupported"
    except (ValueError, struct.error, IndexError):
        # truncation, bad end markers, short structs, out-of-range reads
        # — classified by TYPE, not message prefix (r14 review: "not a
        # BMP payload" vs Python's own "not enough values to unpack"
        # differ at one character)
        return None, "corrupt"


@register(
    "llm_multimodal_decode_quarantine",
    oracle="""
    WITH cls AS (
        SELECT doc_id,
               CASE WHEN doc_id % 11 = 0 THEN 'bad_magic'
                    WHEN doc_id % 7 = 0 THEN 'corrupt'
                    WHEN doc_id % 5 = 0 THEN 'unsupported'
                    ELSE 'ok' END AS status
        FROM documents
    ), px AS (
        SELECT doc_id, i FROM documents CROSS JOIN range(0, 24) t(i)
    ), st AS (
        SELECT doc_id,
               CAST(sum((doc_id * 13 + i * 5) % 256) AS BIGINT) AS sum_r,
               CAST(sum((doc_id * 17 + i * 11) % 256) AS BIGINT) AS sum_g,
               CAST(sum((doc_id * 31 + i * 7) % 256) AS BIGINT) AS sum_b
        FROM px GROUP BY doc_id
    )
    SELECT c.doc_id, c.status,
           CASE WHEN c.status = 'ok' THEN 6 END AS width,
           CASE WHEN c.status = 'ok' THEN 4 END AS height,
           CASE WHEN c.status = 'ok' THEN 24 END AS bpp,
           CASE WHEN c.status = 'ok' THEN st.sum_r END AS sum_r,
           CASE WHEN c.status = 'ok' THEN st.sum_g END AS sum_g,
           CASE WHEN c.status = 'ok' THEN st.sum_b END AS sum_b,
           CASE WHEN c.status = 'ok'
                THEN CAST(doc_id * 31 % 256 AS BIGINT) END AS top_left_b
    FROM cls c JOIN st USING (doc_id)
    """,
)
def llm_multimodal_decode_quarantine(spark, d):
    """Corrupt-payload quarantine over the binary decode path (r14; r13
    verdict task 3): every payload decodes under the fail-the-ROW
    contract — a valid BMP yields its exact container stats, a corrupted
    one yields NULL stats plus a quarantine class, and NO payload can
    fail the job.  The fixture corpus is all-valid, so the encode stage
    injects the three failure classes deterministically (doc_id % 11 ->
    magic bytes zeroed, % 7 -> payload truncated mid-pixel-array, % 5 ->
    bpp field flipped to an unsupported 8 — the dq_constraint_check
    fails-by-design discipline), and the oracle replays both the class
    arithmetic and the closed-form pixel sums for the surviving rows, so
    the hash certifies the happy path AND the quarantine routing in one
    result.

    Scale shape: identical to llm_multimodal_decode_bmp — two fused
    mapInPandas stages over Arrow batches, zero shuffle, payload bytes
    never leave the executor; the try/except adds nothing to the plan.
    At 100 TB this is THE ingest posture: real corpora always carry
    truncated downloads and mislabeled containers, and one uncaught
    ValueError in a million-row batch would otherwise retry-loop the
    whole task (4 attempts, then job death) — the quarantine column
    turns poison rows into a filterable audit trail instead."""

    def encode_and_corrupt(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                p = encode_bmp(i)
                if i % 11 == 0:
                    p = b"XX" + p[2:]                       # magic gone
                elif i % 7 == 0:
                    p = p[:60]                  # truncated mid-pixel-array
                elif i % 5 == 0:
                    p = p[:28] + struct.pack("<H", 8) + p[30:]  # bpp -> 8
                payloads.append(p)
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    def decode(batches):
        for pdf in batches:
            rows = [try_decode(decode_bmp, b) for b in pdf["payload"]]
            stats = [r[0] if r[0] is not None else (None,) * 7
                     for r in rows]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "status": ["ok" if r[1] is None else r[1] for r in rows],
                "width": pd.array([s[0] for s in stats], dtype="Int32"),
                "height": pd.array([s[1] for s in stats], dtype="Int32"),
                "bpp": pd.array([s[2] for s in stats], dtype="Int32"),
                "sum_r": pd.array([s[3] for s in stats], dtype="Int64"),
                "sum_g": pd.array([s[4] for s in stats], dtype="Int64"),
                "sum_b": pd.array([s[5] for s in stats], dtype="Int64"),
                "top_left_b": pd.array([s[6] for s in stats],
                                       dtype="Int64"),
            })

    docs = T(spark, d, "documents").select("doc_id")
    media = docs.mapInPandas(encode_and_corrupt,
                             "doc_id bigint, payload binary")
    return media.mapInPandas(
        decode,
        "doc_id bigint, status string, width int, height int, bpp int, "
        "sum_r bigint, sum_g bigint, sum_b bigint, top_left_b bigint")
