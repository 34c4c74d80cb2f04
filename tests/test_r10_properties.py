"""Round-10 property checks: brute-force reference implementations for
the queries whose algebra is easy to get subtly wrong — the chunked
two-pass concurrency sweep (its whole point is equivalence to the
global sweep), the literal-inlined nearest-centroid assignment, and the
windowed funnel's attribution bound.  The DuckDB oracle already checks
cross-engine agreement; these check both engines against a third,
dumb-but-obviously-right computation."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from data_eng_iceberg_demo_spark.plans.registry import (REGISTRY,
                                                        _load_all_modules)

_load_all_modules()


# --- events_max_concurrency: chunked two-pass == naive global sweep --

@st.composite
def _sessions(draw):
    n = draw(st.integers(1, 40))
    out = []
    for i in range(n):
        typ = draw(st.sampled_from(["a", "b"]))
        start = draw(st.integers(0, 500))       # seconds from epoch0
        dur = draw(st.integers(0, 120))
        out.append((i, typ, start, start + dur))
    return out


def _naive_peak(sessions):
    peaks = {}
    for typ in {s[1] for s in sessions}:
        # half-open [s, e): ends process before starts at the same t
        pts = []
        for _i, t, s, e in sessions:
            if t != typ:
                continue
            pts.append((s, 1))
            pts.append((e, -1))
        pts.sort()                     # (-1) sorts before (+1) at ties
        live = peak = 0
        for _t, d in pts:
            live += d
            peak = max(peak, live)
        peaks[typ] = peak
    return peaks


def _chunked_peak(sessions, chunk_s=60):
    """The production algebra under test, in pure Python: per-chunk
    running max + prefix of chunk totals, mirroring
    operators/analytics.py's two-pass plan shape."""
    peaks = {}
    for typ in {s[1] for s in sessions}:
        pts = []
        for i, t, s, e in sessions:
            if t != typ:
                continue
            pts.append((s, 1, i))
            pts.append((e, -1, i))
        chunks: dict[int, list] = {}
        for t, d, i in pts:
            chunks.setdefault(t // chunk_s, []).append((t, d, i))
        base = 0
        peak = -math.inf
        for c in sorted(chunks):
            rows = sorted(chunks[c])   # (t, delta, id) — delta -1 first
            live = 0
            cmax = -math.inf
            for _t, d, _i in rows:
                live += d
                cmax = max(cmax, live)
            peak = max(peak, base + cmax)
            base += live
        peaks[typ] = peak
    return peaks


@settings(max_examples=300, deadline=None)
@given(_sessions())
def test_chunked_sweep_equals_global_sweep(sessions):
    assert _chunked_peak(sessions) == _naive_peak(sessions)
    # chunk width must not matter (monotone chunk key is the only
    # requirement the proof uses)
    assert _chunked_peak(sessions, chunk_s=7) == _naive_peak(sessions)


def test_max_concurrency_query_matches_naive_sweep(spark, sf_dir):
    """The registered query itself vs the naive sweep over the real
    fixture (ts/value pulled out through the same second-trunc +
    floor(value*10) sessionization the query uses)."""
    import pyspark.sql.functions as F

    from data_eng_iceberg_demo_spark.operators._util import T

    sess = (T(spark, sf_dir, "events")
            .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
            .select("event_id", "event_type",
                    F.unix_timestamp(F.date_trunc("second", "ts"))
                    .alias("s"),
                    (F.unix_timestamp(F.date_trunc("second", "ts"))
                     + F.floor(F.col("value") * 10)).alias("e"))
            .collect())
    naive = _naive_peak([(r.event_id, r.event_type, r.s, r.e)
                         for r in sess])
    got = {r.event_type: r.max_concurrent for r in
           REGISTRY["events_max_concurrency"].fn(spark, sf_dir).collect()}
    assert got == naive


# --- llm_semantic_cluster_assign vs numpy argmin -----------------------

def test_cluster_assign_matches_numpy_argmin(spark, sf_dir):
    import numpy as np
    import pyspark.sql.functions as F

    from data_eng_iceberg_demo_spark.operators._util import T

    rows = (T(spark, sf_dir, "embeddings")
            .filter(F.col("embedding").isNotNull())
            .select("vec_id", "embedding").collect())
    ids = np.array([r.vec_id for r in rows])
    Q = np.floor(np.array([r.embedding for r in rows], dtype=np.float64)
                 * 64).astype(np.int64)
    order = np.argsort(ids)
    cents = Q[order[:4]]
    cids = ids[order[:4]]
    # dist to each centroid; argmin with ties to the LOWEST cid —
    # cids are ascending by construction, so argmin's first-hit rule
    # already picks it
    d2 = ((Q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    pick = d2.argmin(axis=1)
    want = {int(i): (int(cids[p]), int(d2[k, p]))
            for k, (i, p) in enumerate(zip(ids, pick))}
    got = {r.vec_id: (r.cluster, r.dist2) for r in
           REGISTRY["llm_semantic_cluster_assign"].fn(
               spark, sf_dir).collect()}
    assert got == want


# --- events_funnel_windowed vs naive per-user scan --------------------

def test_funnel_windowed_matches_naive(spark, sf_dir):
    import pyspark.sql.functions as F

    from data_eng_iceberg_demo_spark.operators._util import T

    ev = (T(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
          .select("user_id", "event_type",
                  F.unix_timestamp(F.date_trunc("second", "ts"))
                  .alias("t")).collect())
    first_signup: dict[int, int] = {}
    for r in ev:
        if r.event_type == "signup":
            first_signup[r.user_id] = min(
                first_signup.get(r.user_id, r.t), r.t)
    want = {}
    for u, t0 in first_signup.items():
        cand = [r.t for r in ev
                if r.user_id == u and r.event_type == "purchase"
                and t0 < r.t <= t0 + 7200]
        want[u] = ((min(cand) - t0) // 60) if cand else None
    got = {r.user_id: r.mins_to_convert for r in
           REGISTRY["events_funnel_windowed"].fn(spark, sf_dir).collect()}
    assert got == want
