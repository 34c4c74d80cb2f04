"""Corrupt-payload contract for the multimodal codecs (r14; r13 verdict
task 3): arbitrary truncations and bit flips through every stdlib codec
must land in try_decode's fail-the-ROW contract — a classified
quarantine result, never an uncaught exception class and never unbounded
work (a bit-flipped dimension field must cost O(payload), not
O(declared dims); hypothesis's per-example deadline enforces the bound).

The declared query llm_multimodal_decode_quarantine pins the routing
end-to-end under the driver's hash; this sweep is the adversarial
breadth behind it."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from data_eng_iceberg_demo_spark.operators.multimodal import (
    _qoi_doc_pixels, decode_bmp, decode_ppm, decode_qoi, decode_wav,
    encode_bmp, encode_ppm, encode_qoi, encode_wav, try_decode)

_CLASSES = {None, "bad_magic", "unsupported", "corrupt"}


def _payload(codec: str, doc_id: int) -> bytes:
    if codec == "bmp":
        return encode_bmp(doc_id)
    if codec == "wav":
        return encode_wav(doc_id)
    if codec == "ppm":
        return encode_ppm(doc_id)
    return encode_qoi(_qoi_doc_pixels(doc_id), 8, 4)


_DECODER = {"bmp": decode_bmp, "wav": decode_wav,
            "ppm": decode_ppm, "qoi": decode_qoi}

CODECS = sorted(_DECODER)


@pytest.mark.parametrize("codec", CODECS)
def test_valid_payload_decodes_clean(codec):
    for doc_id in (0, 1, 7, 255, 4999):
        res, err = try_decode(_DECODER[codec], _payload(codec, doc_id))
        assert err is None and res is not None


@pytest.mark.parametrize("codec", CODECS)
@settings(max_examples=200, deadline=1000)
@given(doc_id=st.integers(0, 4999), data=st.data())
def test_truncation_is_classified(codec, doc_id, data):
    buf = _payload(codec, doc_id)
    cut = data.draw(st.integers(0, len(buf) - 1))
    res, err = try_decode(_DECODER[codec], buf[:cut])
    # a STRICT PREFIX of a valid container must NEVER decode 'ok': every
    # codec validates payload length against its declared structure
    # (r14 review catch: WAV's chunk walk didn't — an even-length cut
    # inside the data chunk decoded clean with silently wrong sums)
    assert err in _CLASSES and err is not None, (cut, res)


@pytest.mark.parametrize("codec", CODECS)
@settings(max_examples=300, deadline=1000)
@given(doc_id=st.integers(0, 4999), data=st.data())
def test_bitflip_is_classified(codec, doc_id, data):
    buf = bytearray(_payload(codec, doc_id))
    n_flips = data.draw(st.integers(1, 4))
    for _ in range(n_flips):
        pos = data.draw(st.integers(0, len(buf) - 1))
        bit = data.draw(st.integers(0, 7))
        buf[pos] ^= 1 << bit
    res, err = try_decode(_DECODER[codec], bytes(buf))
    assert err in _CLASSES
    if err is None:
        assert res is not None  # silent data corruption may decode "ok"
        # — that is the stated limit: container checks catch structure,
        # not payload bits (a checksum column is the upstream answer)


@pytest.mark.parametrize("codec", CODECS)
@settings(max_examples=100, deadline=1000)
@given(data=st.binary(min_size=0, max_size=256))
def test_garbage_is_classified(codec, data):
    res, err = try_decode(_DECODER[codec], data)
    assert err in _CLASSES


def test_audio_fingerprint_planted_recall_and_hamming_arms(spark, sf_dir):
    """r15: the audio dedup's measured claims, pinned (the hash oracle
    certifies exact output equality, but a band-width edit that stays
    SQL-consistent could still collapse the detection arm): planted
    +400-wobble pairs are found at >= 0.99 recall, every planted pair
    sits within the Hamming<=2 verify budget (the pigeonhole guarantee
    makes banding recall exact there), and the fingerprint-identical
    arm is populated (the wobble usually does NOT flip an envelope
    bit — invariance is the fingerprint's point)."""
    from data_eng_iceberg_demo_spark.plans.registry import (REGISTRY,
                                                            _load_all_modules)
    _load_all_modules()
    rows = REGISTRY["llm_audio_fingerprint_dedup"].fn(
        spark, sf_dir).collect()
    fps = {r["doc_id"]: r["fingerprint"] for r in rows}
    planted = [r for r in rows if r["doc_id"] % 5 == 1 and r["doc_id"] > 0]
    found = [r for r in planted
             if r["is_dup"] and r["canonical"] == r["doc_id"] - 1]
    assert planted and len(found) / len(planted) >= 0.99, (
        len(found), len(planted))
    hams = [bin(fps[r["doc_id"]] ^ fps[r["doc_id"] - 1]).count("1")
            for r in planted]
    assert max(hams) <= 2, max(hams)      # wobble stays in verify budget
    assert hams.count(0) >= len(hams) // 2  # invariance arm populated


def test_wav_odd_length_data_chunk_is_classified_corrupt():
    """r15 review: the vectorized decode must keep the old unpack
    contract — a data chunk whose declared size is ODD (a corrupt size
    field; 16-bit PCM data is always even) previously died in
    struct.unpack as a classified struct.error, and
    np.frombuffer(count=n//2) would instead silently drop the trailing
    byte and decode 'ok' with wrong stats."""
    import struct

    buf = bytearray(_payload("wav", 3))
    # find the data chunk and shrink its declared size by 1 (odd),
    # keeping the body — the truncation guard passes, the odd-length
    # check must fire
    pos = 12
    while pos + 8 <= len(buf):
        cid = bytes(buf[pos:pos + 4])
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        if cid == b"data":
            struct.pack_into("<I", buf, pos + 4, size - 1)
            break
        pos += 8 + size + (size & 1)
    res, err = try_decode(decode_wav, bytes(buf))
    assert err == "corrupt", (res, err)


def test_riff_data_chunk_walk_fails_typed():
    """r16 review: the shared audio-kernel chunk walk
    (_riff_data_chunk) must keep BOTH typed-failure arms — missing
    data chunk AND decode_wav's truncated-chunk rule (a data chunk
    sliced short on a 4-byte boundary would otherwise fingerprint
    'ok' with silently wrong bits)."""
    import struct

    from data_eng_iceberg_demo_spark.operators.multimodal import (
        _riff_data_chunk, encode_wav_gained)

    good = encode_wav_gained(7)
    data = _riff_data_chunk(good)
    assert len(data) >= 2 and len(data) % 2 == 0
    # arm 1: data chunk renamed away -> "no data chunk"
    renamed = good.replace(b"data", b"datx", 1)
    with pytest.raises(ValueError, match="no data chunk"):
        _riff_data_chunk(renamed)
    # arm 2: buffer cut INSIDE the data chunk (4-byte-aligned cut so
    # a reshape(-1, 2) downstream would succeed) -> "truncated"
    with pytest.raises(ValueError, match="truncated"):
        _riff_data_chunk(good[:len(good) - 4])
    # arm 3: declared size inflated past the buffer -> "truncated"
    buf = bytearray(good)
    pos = 12
    while pos + 8 <= len(buf):
        cid = bytes(buf[pos:pos + 4])
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        if cid == b"data":
            struct.pack_into("<I", buf, pos + 4, size + 8)
            break
        pos += 8 + size + (size & 1)
    with pytest.raises(ValueError, match="truncated"):
        _riff_data_chunk(bytes(buf))


def test_audio_sample_synthesis_matches_scalar_reference():
    """r16 (r15 verdict task 4): the audio kernel's vectorized md5
    sample synthesis (one joined digest matrix + np.frombuffer) must
    stay bit-identical to the scalar reference form
    ``int(md5(f"{s}:{i}").hexdigest()[:3], 16) - 2048`` — the exact
    arithmetic the hash oracle replays in SQL.  The identity:
    int(hexdigest[:3], 16) == (digest[0] << 4) | (digest[1] >> 4)."""
    import hashlib

    import numpy as np

    for s in (0, 1, 7, 999, 54321):
        ref = [int(hashlib.md5(f"{s}:{i}".encode()).hexdigest()[:3], 16)
               - 2048 for i in range(64)]
        buf = b"".join(hashlib.md5(b"%d:%d" % (s, i)).digest()
                       for i in range(64))
        m = np.frombuffer(buf, dtype=np.uint8).reshape(64, 16)
        vec = ((m[:, 0].astype(np.int64) << 4) | (m[:, 1] >> 4)) - 2048
        assert vec.tolist() == ref


def test_phash_wide_band_bounds_buckets(spark, sf_dir):
    """r14: the pHash dedup scale knob is DIMENSIONAL (the
    ivfadc-centroids pattern) — the 10x rehearsal measured the fixed
    24-bit/6-bit-band form at O(n^2/2^bits) candidate growth (12.9x),
    and the fix is a wider hash + wider bands, NOT a hot-bucket star
    cap (narrow pHash buckets are random collisions; a star rep
    usually fails the Hamming verify, losing genuine pairs).  The
    7x9-pixel / 9-bit-band form must keep every planted retouch pair
    while collapsing the max band bucket."""
    from collections import Counter

    from data_eng_iceberg_demo_spark.operators import multimodal as mm

    rows = mm.llm_image_phash_dedup(
        spark, sf_dir, width=7, height=9, band_bits=9).collect()
    planted = [r for r in rows if r["doc_id"] % 5 == 1 and r["doc_id"] > 0]
    found = [r for r in planted
             if r["is_dup"] and r["canonical"] == r["doc_id"] - 1]
    assert planted and len(found) / len(planted) >= 0.95, (
        len(found), len(planted))

    def max_bucket(width, height, band_bits):
        # bucket sizes from the ENGINE-computed bv (phash_bands is the
        # very frame the dedup joins on) — a Python >> re-derivation
        # would mask a Spark band-arithmetic bug (the r14 advisor found
        # exactly that: Spark wraps an INT shift count mod 32, so
        # bands starting at bit >= 32 silently aliased low bits while
        # this test's native-int recount looked healthy)
        n_pix = width * height
        n_bands = (n_pix + band_bits - 1) // band_bits
        h = (mm.llm_image_phash_dedup(
                spark, sf_dir, width=width, height=height,
                band_bits=band_bits).select("doc_id", "phash"))
        bands = mm.phash_bands(h, n_bands, band_bits).collect()
        c = Counter()
        expect = Counter()
        for r in bands:
            c[(r["b"], r["bv"])] += 1
            expect[(r["b"], (r["phash"] >> (band_bits * r["b"]))
                    % (1 << band_bits))] += 1
        # the engine's band keys must BE the intended bit windows —
        # fails if Spark's shift arithmetic ever diverges again
        assert c == expect
        return max(c.values())

    wide, narrow = max_bucket(7, 9, 9), max_bucket(6, 4, 6)
    # wider bands bound the buckets: candidates/bucket shrink ~2^3
    assert wide < narrow, (wide, narrow)

    # the Spark-long sign bit is off limits: >63 pixels must refuse
    import pytest as _pytest
    with _pytest.raises(ValueError, match="63"):
        mm.llm_image_phash_dedup(spark, sf_dir, width=8, height=8)
