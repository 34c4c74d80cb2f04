"""Round-12 second-continuation properties the oracle comparison can't
express: brute-force cross-checks for the bucketed/oriented/banded scale
plans (grid spatial join, degree-oriented triangles, banded pHash), the
Markov fixed-point's stationarity, and the weighted median's defining
inequality.  Each pins that the SCALE plan computes the same answer as
the naive plan it replaces."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_eng_iceberg_demo_spark.plans.registry import (REGISTRY,
                                                        _load_all_modules)

_load_all_modules()

SF = "/root/testdata/sf0.001"


def test_spatial_grid_equals_brute_force(spark):
    """The 3x3-cell candidate generation must lose NO pair: compare
    against the O(n^2) cross join at fixture scale."""
    got = {(r["key_a"], r["key_b"])
           for r in REGISTRY["join_spatial_grid"].fn(spark, SF).collect()}
    pts = (spark.read.parquet(f"{SF}/customer.parquet")
           .select(
               F.col("c_custkey").alias("k"),
               ((F.conv(F.substring(F.md5(F.concat(
                   F.col("c_custkey").cast("string"), F.lit("x"))), 1, 8),
                   16, 10).cast("bigint") % 100000) / 1000.0).alias("x"),
               ((F.conv(F.substring(F.md5(F.concat(
                   F.col("c_custkey").cast("string"), F.lit("y"))), 1, 8),
                   16, 10).cast("bigint") % 100000) / 1000.0).alias("y")))
    rows = pts.collect()
    brute = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1:]:
            lo, hi = sorted((a["k"], b["k"]))
            if (a["x"] - b["x"]) ** 2 + (a["y"] - b["y"]) ** 2 <= 1.0:
                brute.add((lo, hi))
    assert got == brute and len(brute) > 0


def test_triangles_equal_brute_force(spark):
    """Degree orientation must count every triangle exactly once:
    rebuild the edge set and count naively."""
    out = REGISTRY["events_graph_triangles"].fn(spark, SF).first()
    e = (spark.read.parquet(f"{SF}/events.parquet")
         .filter("event_type = 'purchase' AND ts IS NOT NULL"
                 " AND user_id IS NOT NULL")
         .select("user_id", F.date_trunc("hour", "ts").alias("h"))
         .distinct())
    a = e.select(F.col("user_id").alias("u"), "h")
    b = e.select(F.col("user_id").alias("v"), "h")
    edges = {(r["u"], r["v"]) for r in
             (a.join(b, "h").filter("u < v").groupBy("u", "v")
              .agg(F.count("*").alias("k")).filter("k >= 2")).collect()}
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = sum(1 for (u, v) in edges
              for w in adj[u] & adj[v] if u < v < w)
    assert out["n_triangles"] == tri
    assert out["n_edges"] == len(edges)


def test_phash_dedup_finds_every_planted_variant(spark):
    """Every 5th doc is a one-pixel retouch of its neighbor: banding +
    Hamming<=2 must flag ALL of them as dups with the neighbor (or an
    even smaller match) as canonical."""
    res = {r["doc_id"]: r for r in
           REGISTRY["llm_image_phash_dedup"].fn(spark, SF).collect()}
    planted = [d for d in res if d % 5 == 0 and d + 1 in res]
    assert planted
    for d in planted:
        assert res[d + 1]["is_dup"] or res[d]["is_dup"], d


def test_markov_stationary_is_stationary(spark):
    """The fixed-point vector must (a) nearly sum to 1 (floor sheds
    <= k parts-per-1e9 per iteration) and (b) satisfy v ~= vP against
    the transition matrix."""
    rows = REGISTRY["events_markov_stationary"].fn(spark, SF).collect()
    v = {r["event_type"]: r["stationary"] for r in rows}
    assert abs(sum(v.values()) - 1.0) < 1e-6
    tm = REGISTRY["events_transition_matrix"].fn(spark, SF).collect()
    import collections
    nxt: dict = collections.defaultdict(float)
    for r in tm:
        if r["prev_type"] in v:
            nxt[r["event_type"]] += v[r["prev_type"]] * r["p"]
    for t, val in v.items():
        assert abs(nxt[t] - val) < 5e-3, (t, nxt[t], val)


def test_weighted_median_defining_inequality(spark):
    """For each group: weight at or below the reported median >= half
    the total, and weight strictly below < half (the defining pair)."""
    med = {r["l_returnflag"]: r for r in
           REGISTRY["agg_weighted_median"].fn(spark, SF).collect()}
    li = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .filter("l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL")
          .select("l_returnflag", "l_extendedprice",
                  F.col("l_quantity").cast("bigint").alias("wt")).collect())
    import collections
    by: dict = collections.defaultdict(list)
    for r in li:
        by[r["l_returnflag"]].append((r["l_extendedprice"], r["wt"]))
    for flag, rows in by.items():
        m = med[flag]["weighted_median"]
        tot = sum(w for _p, w in rows)
        at_or_below = sum(w for p, w in rows if p <= m)
        below = sum(w for p, w in rows if p < m)
        assert 2 * at_or_below >= tot >= 1, flag
        assert 2 * below < tot, flag
