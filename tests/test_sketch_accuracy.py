"""Accuracy-band assertions for the approximate (rows-only) operators:
their contract is 'close to exact', which the hash oracle can't check,
so pytest pins the band."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_eng_iceberg_demo_spark.plans.registry import (REGISTRY,
                                                        _load_all_modules)
from data_eng_iceberg_demo_spark.sources.readers import load

_load_all_modules()


def test_hll_sketch_merge_within_2pct(spark, sf_dir):
    """Fixture band tighter than the declared 3% (sf0.1 measured worst
    rel 0.0201, so the DECLARED within_band is 3%): the sketch itself
    stays within 2% on the local fixture, asserted from an independent
    estimate recomputation; the declared query's rows must carry the
    matching exact counts with every within_band TRUE, and the plan
    must still contain the HLL union aggregate (the band boolean can
    never degenerate into a constant that skips the sketch)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    per_nation = (c.groupBy("c_nationkey")
                  .agg(F.hll_sketch_agg("c_custkey").alias("sk")))
    est = {r[0]: r[1] for r in
           (per_nation.join(n, per_nation.c_nationkey == n.n_nationkey)
            .groupBy("n_regionkey")
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))).collect())}
    exact = {r[0]: r[1] for r in
             (c.join(n, c.c_nationkey == n.n_nationkey)
              .groupBy("n_regionkey")
              .agg(F.countDistinct("c_custkey")).collect())}
    assert set(est) == set(exact)
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(1, 0.02 * e), (k, est[k], e)

    df = REGISTRY["agg_hll_sketch_merge"].fn(spark, sf_dir)
    assert "hll_union_agg" in df._jdf.queryExecution().optimizedPlan().toString()
    rows = df.collect()
    assert {r["n_regionkey"]: r["exact_distinct_customers"]
            for r in rows} == exact
    assert all(r["within_band"] for r in rows)


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """Independent sketch recomputation within 5% of the interpolated
    exact percentile; the declared query's p50_exact must equal the
    engine's percentile_disc and every within_band must be TRUE with
    the sketch still in the plan."""
    li = load(spark, sf_dir, "lineitem")
    both = {r["l_returnflag"]: r for r in
            li.groupBy("l_returnflag").agg(
                F.approx_percentile("l_extendedprice", 0.5, 1000)
                .alias("ap"),
                F.expr("percentile(l_extendedprice, 0.5)").alias("ex"),
                F.expr("percentile_disc(0.5) WITHIN GROUP "
                       "(ORDER BY l_extendedprice)").alias("exd"),
            ).collect()}
    for k, r in both.items():
        assert abs(r["ap"] - r["ex"]) / r["ex"] < 0.05, (k, r)

    df = REGISTRY["agg_approx_percentile"].fn(spark, sf_dir)
    assert "approx_percentile" in df._jdf.queryExecution().optimizedPlan().toString()
    rows = df.collect()
    assert {r["l_returnflag"]: r["p50_exact"] for r in rows} \
        == {k: r["exd"] for k, r in both.items()}
    assert all(r["within_band"] for r in rows)


def test_approx_count_distinct_within_5pct(spark, sf_dir):
    """The declared query's exact_parts must equal an independent exact
    count-distinct, every within_band TRUE, and BOTH certification
    arms still in the plan (r16: the exact arm rides the mergeable
    bitmap kernel and the estimate the explicit hll_union_agg — no
    Expand, no countDistinct; either aggregate vanishing means the
    boolean degenerated to a constant)."""
    li = load(spark, sf_dir, "lineitem")
    exact = {r[0]: r[1] for r in
             li.groupBy("l_returnflag")
             .agg(F.countDistinct("l_partkey")).collect()}
    cnt = {r[0]: r[1] for r in
           li.groupBy("l_returnflag").agg(F.count("*")).collect()}
    df = REGISTRY["agg_approx_count_distinct"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "hll_union_agg" in plan
    assert "bitmap_construct_agg" in plan
    assert "Expand" not in plan
    rows = df.collect()
    assert {r["l_returnflag"]: r["exact_parts"] for r in rows} == exact
    assert {r["l_returnflag"]: r["cnt"] for r in rows} == cnt
    assert all(r["within_band"] for r in rows)


def test_kmv_estimate_within_band(spark, sf_dir):
    """KMV at k=256: relative error ~ 1/sqrt(k) ≈ 6%; allow 3 sigma.
    Small regions (< k distinct) must be EXACT (the sketch keeps every
    hash)."""
    from data_eng_iceberg_demo_spark.plans.registry import (REGISTRY,
                                                            _load_all_modules)
    _load_all_modules()
    import pyspark.sql.functions as F

    from data_eng_iceberg_demo_spark.operators.advanced import _KMV_K
    from data_eng_iceberg_demo_spark.sources import load

    est = {r["n_regionkey"]: r["kmv_distinct_customers"]
           for r in REGISTRY["agg_kmv_distinct"].fn(spark, sf_dir).collect()}
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    exact = {r["n_regionkey"]: r["ex"] for r in
             (c.join(n, c.c_nationkey == n.n_nationkey)
              .groupBy("n_regionkey")
              .agg(F.count_distinct("c_custkey").alias("ex")).collect())}
    assert set(est) == set(exact)
    for region, ex in exact.items():
        if ex < _KMV_K:
            assert est[region] == ex, (region, est[region], ex)
        else:
            assert abs(est[region] - ex) / ex < 0.18, (region, est[region], ex)


def test_bitmap_distinct_merges_incrementally(spark, sf_dir):
    """The property agg_bitmap_distinct's docstring claims: per-bucket
    bitmaps built on two DISJOINT loads OR-merge (bitmap_or_agg) into
    the exact distinct count of the union — keys appearing in both
    loads collapse in the OR, so an incremental re-count never rescans
    history and never double-counts."""
    o = load(spark, sf_dir, "orders")
    b1 = o.filter("o_orderkey % 2 = 0")
    b2 = o.filter("o_orderkey % 2 = 1")  # custkeys overlap across halves

    def bitmaps(df):
        return (df.select(
            F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
            F.expr("bitmap_bit_position(o_custkey)").alias("pos"))
            .groupBy("bkt")
            .agg(F.expr("bitmap_construct_agg(pos)").alias("bm")))

    merged_total = (bitmaps(b1).unionByName(bitmaps(b2))
                    .groupBy("bkt")
                    .agg(F.expr("bitmap_count(bitmap_or_agg(bm))").alias("c"))
                    .agg(F.sum("c")).collect()[0][0])
    exact = o.agg(F.countDistinct("o_custkey")).collect()[0][0]
    assert merged_total == exact


def test_count_min_sketch_overestimates_and_finds_heavy_hitter(spark, sf_dir):
    """The CMS guarantee the cell-parity oracle cannot express: for
    every user, min over the 4 rows of its cells is >= its true count
    (CMS never underestimates), and the argmax estimate recovers the
    true heaviest user on the fixture."""
    import hashlib
    from collections import Counter

    import duckdb

    from data_eng_iceberg_demo_spark.plans.registry import REGISTRY

    cells = {(r.row_id, r.col_id): r.cnt
             for r in REGISTRY["events_count_min_sketch"]
             .fn(spark, sf_dir).collect()}
    con = duckdb.connect()
    truth = dict(con.execute(
        f"SELECT user_id, count(*) FROM read_parquet('{sf_dir}/events.parquet') "
        "WHERE user_id IS NOT NULL GROUP BY user_id").fetchall())

    def est(uid):
        mins = []
        for row in range(4):
            h = int(hashlib.md5(f"{row}:{uid}".encode()).hexdigest()[:8], 16)
            mins.append(cells.get((row, h % 32), 0))
        return min(mins)

    assert all(est(u) >= c for u, c in truth.items())  # no underestimate
    # CMS error bound: with width 32, the expected per-row inflation is
    # N/32 colliding mass; the min over 4 independent rows keeps every
    # estimate within 2N/32 of truth on this fixture (classic Markov
    # bound gives P(err_row > 2N/w) <= 1/2, so all-4-rows-bad is rare;
    # deterministic hashes make this a fixed property of the fixture)
    n = sum(truth.values())
    bound = 2 * n / 32
    assert all(est(u) - c <= bound for u, c in truth.items()), (
        max((est(u) - c, u) for u, c in truth.items()), bound)


def test_power_iteration_is_exact_dense_gram_square(spark, sf_dir):
    """The distributed result must equal the DENSE numpy computation
    G²·1 EXACTLY (integer arithmetic — zero tolerance), and each
    applied multiplication must raise the Rayleigh quotient (the
    power-iteration convergence theorem for PSD matrices; full
    eigenvector alignment is a spectral-GAP property the isotropic
    random fixture deliberately lacks — top eigenvalues within ~5% —
    so exactness + monotone convergence are the testable claims)."""
    import numpy as np
    import pyarrow.parquet as pq

    from data_eng_iceberg_demo_spark.plans.registry import REGISTRY

    u = (REGISTRY["llm_embedding_power_iteration"].fn(spark, sf_dir)
         .orderBy("dim").toPandas()["u"].to_numpy().astype(float))
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    q = np.stack([np.floor(np.asarray(e, dtype=np.float64) * 64)
                  for e in emb["embedding"].dropna()])
    g = q.T @ q
    ones = np.ones(64)
    assert np.array_equal(u, g @ (g @ ones))  # exact, not allclose

    def rayleigh(x):
        return (x @ g @ x) / (x @ x)

    r0, r1, r2 = rayleigh(ones), rayleigh(g @ ones), rayleigh(u)
    assert r0 < r1 < r2, (r0, r1, r2)
