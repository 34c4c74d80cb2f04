"""Property tests for the pure-stdlib BMP codec and the SCD2 merge —
invariants that the example-based oracle queries cannot cover (arbitrary
dimensions for the codec; per-key structural invariants for SCD2)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_eng_iceberg_demo_spark.operators.multimodal import (decode_bmp,
                                                              encode_bmp)


@given(doc_id=st.integers(min_value=0, max_value=2**31 - 1),
       width=st.integers(min_value=1, max_value=17),
       height=st.integers(min_value=1, max_value=9))
@settings(max_examples=200, deadline=None)
def test_bmp_roundtrip_any_dimensions(doc_id, width, height):
    """decode(encode(x)) must recover dimensions, bpp and the exact
    channel sums/top-left pixel for EVERY width (odd widths exercise
    every stride-padding remainder, 1..3 bytes)."""
    buf = encode_bmp(doc_id, width, height)
    w, h, bpp, sum_r, sum_g, sum_b, tl_b = decode_bmp(buf)
    n = width * height
    assert (w, h, bpp) == (width, height, 24)
    assert sum_r == sum((doc_id * 13 + i * 5) % 256 for i in range(n))
    assert sum_g == sum((doc_id * 17 + i * 11) % 256 for i in range(n))
    assert sum_b == sum((doc_id * 31 + i * 7) % 256 for i in range(n))
    assert tl_b == (doc_id * 31) % 256
    # container size: 54-byte headers + stride*height pixel array
    stride = (width * 3 + 3) // 4 * 4
    assert len(buf) == 54 + stride * height


def test_bmp_decoder_rejects_non_bmp():
    import pytest

    with pytest.raises(ValueError):
        decode_bmp(b"PNG not a bmp")


def test_scd2_structural_invariants(spark, sf_dir):
    """Every key keeps exactly ONE current row; closed rows all carry the
    effective date; row count = keys + changed keys (each changed key
    contributes a closed AND an opened row); no-op update keys
    (custkey % 14 == 7) must NOT have gained history."""
    from data_eng_iceberg_demo_spark.plans.registry import (REGISTRY,
                                                            _load_all_modules)

    _load_all_modules()
    rows = REGISTRY["scd2_dimension_merge"].fn(spark, sf_dir).collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.c_custkey, []).append(r)
    assert by_key
    n_changed = 0
    for key, krows in by_key.items():
        current = [r for r in krows if r.is_current]
        assert len(current) == 1, (key, krows)
        closed = [r for r in krows if not r.is_current]
        assert all(r.valid_to == "2024-01-01" for r in closed)
        if key % 14 == 0:
            assert len(krows) == 2, (key, krows)  # closed + opened
            n_changed += 1
        else:
            assert len(krows) == 1, (key, krows)  # untouched or no-op
    assert n_changed > 0
    assert len(rows) == len(by_key) + n_changed


def test_mode_deterministic_tie_break_lowest(spark):
    """agg_mode_median leans on Spark 4's mode(col, deterministic=true)
    returning the LOWEST value on frequency ties — the property that
    makes its cross-engine oracle possible.  The fixture may not contain
    a tie, so pin the contract directly on a constructed one."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "b"), (1, "b"), (1, "a"), (1, "a"), (1, "c")], "k int, v string")
    out = df.groupBy("k").agg(F.mode("v", True).alias("m")).collect()
    assert out[0].m == "a"  # 'a' and 'b' tie at 2; lowest wins


def test_bucketed_interval_join_equals_brute_force_on_boundaries(spark):
    """The bucketized interval join must equal the brute-force range
    join EXACTLY, including on adversarial inputs: points sitting
    precisely on bucket edges and interval starts/ends, intervals
    starting exactly on the hour, and duplicate timestamps.  The classic
    bucketing bugs (off-by-one bucket coverage, >= vs > at either end,
    double-counting a pair that meets in two buckets) all surface
    here."""
    import pyspark.sql.functions as F

    from data_eng_iceberg_demo_spark.operators.joins import (
        bucketed_interval_join)

    base = "2024-03-01 00:00:00"
    # points at exact hour boundaries, interval ends, and interior
    point_offsets_s = [0, 1, 3599, 3600, 7199, 7200, 7201, 10800,
                       3600, 5400, 0]  # includes duplicates
    interval_offsets_s = [0, 1, 3599, 3600, 5400]  # starts ON boundaries too
    pts = spark.createDataFrame(
        [(i, o) for i, o in enumerate(point_offsets_s)], "pid int, off int"
    ).select("pid", F.expr(f"timestamp'{base}' + make_interval(0,0,0,0,0,0,off)").alias("tss"))
    ivs = spark.createDataFrame(
        [(i, o) for i, o in enumerate(interval_offsets_s)], "iid int, off int"
    ).select("iid", F.expr(f"timestamp'{base}' + make_interval(0,0,0,0,0,0,off)").alias("i_tss"))

    got = (bucketed_interval_join(pts, ivs)
           .select("pid", "iid").orderBy("pid", "iid").collect())
    brute = (pts.crossJoin(ivs)
             .filter((F.col("tss") >= F.col("i_tss"))
                     & (F.col("tss") < F.col("i_tss")
                        + F.expr("INTERVAL 2 HOURS")))
             .select("pid", "iid").orderBy("pid", "iid").collect())
    assert got == brute
    assert len(got) > 0  # the grid genuinely produces matches


def test_asof_union_window_matches_brute_force(spark):
    """Both as-of directions vs a pure-Python brute force on randomized
    tiny inputs (hypothesis): a 3-user x 6-instant grid forces heavy
    time ties (events exactly ON order instants exercise the backward
    <= vs forward > bound), same-instant order pairs exercise the
    max-key (backward) / min-key (forward) tie resolution, and users
    existing on only one side exercise the no-match drop."""
    import datetime as dt

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from data_eng_iceberg_demo_spark.operators.joins import (
        _asof_nearest_kernel, _asof_union_window)

    base = dt.datetime(2024, 3, 1)
    row = st.tuples(st.integers(min_value=0, max_value=2),
                    st.integers(min_value=0, max_value=5))

    def brute(events, orders, direction):
        out = set()
        for eid, (u, et) in enumerate(events):
            if direction == "backward":
                cand = [(ot, k) for k, (ou, ot) in enumerate(orders)
                        if ou == u and ot <= et]
                pick = max(cand) if cand else None
            else:
                cand = [(-ot, -k) for k, (ou, ot) in enumerate(orders)
                        if ou == u and ot > et]
                pick = max(cand) if cand else None
            if pick is not None:
                out.add((eid, u, abs(pick[1])))
        return out

    def brute_nearest(events, orders):
        # min |dt|, then earlier order time, then min key — the oracle's
        # ORDER BY abs(dt), t, key
        out = set()
        for eid, (u, et) in enumerate(events):
            cand = [(abs(ot - et), ot, k, ot - et if ot > et else et - ot)
                    for k, (ou, ot) in enumerate(orders) if ou == u]
            if cand:
                d, _ot, k, dt = min(cand)
                out.add((eid, u, k, d))
        return out

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(events=st.lists(row, min_size=1, max_size=8),
           orders=st.lists(row, min_size=0, max_size=8))
    def check(events, orders):
        e = spark.createDataFrame(
            [(eid, u, base + dt.timedelta(seconds=t))
             for eid, (u, t) in enumerate(events)],
            "event_id long, user_id long, t timestamp")
        o = spark.createDataFrame(
            [(u, base + dt.timedelta(seconds=t), k, float(k))
             for k, (u, t) in enumerate(orders)],
            "user_id long, t timestamp, o_orderkey long, o_totalprice double",
        )
        for direction in ("backward", "forward"):
            got = {(r.event_id, r.user_id, r.o_orderkey)
                   for r in _asof_union_window(e, o, direction).collect()}
            assert got == brute(events, orders, direction), direction
        got_n = {(r.event_id, r.user_id, r.o_orderkey, r.dt_s)
                 for r in _asof_nearest_kernel(e, o).collect()}
        assert got_n == brute_nearest(events, orders), "nearest"

    check()


@given(doc_id=st.integers(min_value=0, max_value=2**31 - 1),
       n_samples=st.integers(min_value=1, max_value=257),
       rate=st.sampled_from([8000, 16000, 22050, 44100]))
@settings(max_examples=200, deadline=None)
def test_wav_roundtrip_any_shape(doc_id, n_samples, rate):
    """decode(encode(x)) must recover the format fields and the exact
    integer sample statistics for every sample count and common rate —
    the hand-written RIFF parser against the stdlib wave writer."""
    from data_eng_iceberg_demo_spark.operators.multimodal import (decode_wav,
                                                                  encode_wav)

    buf = encode_wav(doc_id, n_samples, rate)
    ch, r, bits, n, s_sum, s_abs, peak, first = decode_wav(buf)
    ref = [((doc_id * 37 + i * 19) % 4096) - 2048 for i in range(n_samples)]
    assert (ch, r, bits, n) == (1, rate, 16, n_samples)
    assert s_sum == sum(ref)
    assert s_abs == sum(abs(v) for v in ref)
    assert peak == max(abs(v) for v in ref)
    assert first == ref[0]
    # container size: 44-byte canonical RIFF/fmt/data headers + frames
    assert len(buf) == 44 + 2 * n_samples


def test_wav_decoder_rejects_non_wav():
    import pytest

    from data_eng_iceberg_demo_spark.operators.multimodal import decode_wav

    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxJUNK")
    with pytest.raises(ValueError):
        decode_wav(b"not audio at all")


@given(doc_id=st.integers(min_value=0, max_value=2**31 - 1),
       width=st.integers(min_value=1, max_value=12),
       height=st.integers(min_value=1, max_value=9))
@settings(max_examples=120, deadline=None)
def test_ppm_roundtrip_any_dimensions(doc_id, width, height):
    """P6 roundtrip across the header-grammar variants the encoder
    emits (space vs newline separators, comment injection) and
    arbitrary dimensions: decoded stats must equal the closed form."""
    from data_eng_iceberg_demo_spark.operators.multimodal import (decode_ppm,
                                                                  encode_ppm)

    buf = encode_ppm(doc_id, width, height)
    w, h, maxval, sr, sg, sb, tl_r = decode_ppm(buf)
    n = width * height
    assert (w, h, maxval) == (width, height, 255)
    assert sr == sum((doc_id * 7 + i * 3) % 256 for i in range(n))
    assert sg == sum((doc_id * 11 + i * 13) % 256 for i in range(n))
    assert sb == sum((doc_id * 19 + i * 17) % 256 for i in range(n))
    assert tl_r == doc_id * 7 % 256


def test_ppm_decoder_handles_adversarial_headers_and_rejects_garbage():
    import pytest

    from data_eng_iceberg_demo_spark.operators.multimodal import decode_ppm

    # multi-comment, tabs/CRs as separators — all legal P6
    buf = (b"P6\n# a\n# b\n\t2 \r1\n# c\n255\n"
           + bytes([1, 2, 3, 4, 5, 6]))
    assert decode_ppm(buf) == (2, 1, 255, 1 + 4, 2 + 5, 3 + 6, 1)
    with pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n2 2\n255\n\x00\x01")


# ----------------------------------------------------------------- QOI
@given(pixels=st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255),
                                 st.integers(0, 255)),
                       min_size=1, max_size=300))
@settings(max_examples=120, deadline=None)
def test_qoi_roundtrip_any_pixels(pixels):
    """decode(encode(px)) == px EXACTLY for arbitrary pixel streams —
    stronger than the statistic sums under the declared query's hash;
    random streams hit INDEX collisions, wrap-around diffs and the
    62-run cap that structured fixtures can miss."""
    from data_eng_iceberg_demo_spark.operators.multimodal import (
        decode_qoi, encode_qoi)

    buf = encode_qoi(pixels, len(pixels), 1)
    w, h, channels, out = decode_qoi(buf)
    assert (w, h, channels) == (len(pixels), 1, 3)
    assert [(r, g, b) for (r, g, b, _a) in out] == pixels
    assert all(a == 255 for (_r, _g, _b, a) in out)


def test_qoi_long_run_crosses_62_cap():
    from data_eng_iceberg_demo_spark.operators.multimodal import (
        decode_qoi, encode_qoi)

    px = [(10, 20, 30)] * 200  # needs 62+62+62+14 run chunks
    _w, _h, _c, out = decode_qoi(encode_qoi(px, 200, 1))
    assert [(r, g, b) for (r, g, b, _a) in out] == px


def test_qoi_spec_byte_vector():
    """Hand-derived byte-level vector pins SPEC conformance (a codec
    whose encoder and decoder share the same bug still roundtrips):
    RGB op for an out-of-range jump, a run, a DIFF with mod-256 wrap,
    and an INDEX hit re-referencing the first color."""
    from data_eng_iceberg_demo_spark.operators.multimodal import (
        decode_qoi, encode_qoi)

    px = [(128, 0, 0), (128, 0, 0), (126, 254, 255), (128, 0, 0)]
    buf = encode_qoi(px, 4, 1)
    want = (b"qoif" + (4).to_bytes(4, "big") + (1).to_bytes(4, "big")
            + bytes((3, 0))
            + bytes((0xFE, 128, 0, 0))   # RGB (diff from seed wraps)
            + bytes((0xC0 | 0,))          # run of 1
            + bytes((0x41,))              # DIFF dr=-2 dg=-2 db=-1 (wraps)
            + bytes((53,))                # INDEX hash(128,0,0,255) = 53
            + b"\x00" * 7 + b"\x01")
    assert buf == want
    _w, _h, _c, out = decode_qoi(buf)
    assert [(r, g, b) for (r, g, b, _a) in out] == px


def test_qoi_decoder_rejects_garbage():
    import pytest as _pytest

    from data_eng_iceberg_demo_spark.operators.multimodal import decode_qoi

    with _pytest.raises(ValueError):
        decode_qoi(b"nope" + b"\x00" * 20)
    # valid stream with a corrupted end marker must raise, not return
    from data_eng_iceberg_demo_spark.operators.multimodal import encode_qoi
    buf = bytearray(encode_qoi([(1, 2, 3)], 1, 1))
    buf[-1] = 0x02
    with _pytest.raises(ValueError):
        decode_qoi(bytes(buf))
    # truncation raises the codec family's ValueError, never IndexError
    full = encode_qoi([(i % 256, 7, 9) for i in range(50)], 50, 1)
    with _pytest.raises(ValueError):
        decode_qoi(full[:-12])
