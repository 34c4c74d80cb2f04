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


def test_uuid_deterministic_matches_rfc_library(spark):
    """The in-plan v3-style construction must agree with CPython's
    uuid module given the same md5 input bytes: same hex, version
    nibble 3, RFC variant — checked for a sample of keys."""
    import hashlib
    import uuid as _uuid

    import duckdb

    con = duckdb.connect()
    for key in (1, 42, 99999):
        x = hashlib.md5(f"orders.icelite:{key}".encode()).hexdigest()
        got = con.execute("""
            SELECT substring($1, 1, 8) || '-' || substring($1, 9, 4)
                || '-3' || substring($1, 14, 3) || '-'
                || CASE CAST(concat('0x', substring($1, 17, 1)) AS BIGINT)
                        % 4 WHEN 0 THEN '8' WHEN 1 THEN '9'
                        WHEN 2 THEN 'a' ELSE 'b' END
                || substring($1, 18, 3) || '-' || substring($1, 21, 12)
        """, [x]).fetchone()[0]
        u = _uuid.UUID(got)
        assert u.version == 3
        assert u.variant == _uuid.RFC_4122
        # all non-patched nibbles carry the md5 verbatim
        plain = got.replace("-", "")
        assert plain[:12] == x[:12] and plain[13:16] == x[13:16]
        assert plain[17:] == x[17:]


def test_spatial_grid_boundary_pairs_not_lost(spark):
    """A pair at Euclidean distance exactly 1.0 (cell-diagonal
    neighbors) must be found: plant two synthetic points in adjacent
    cells at unit distance and run the same candidate generation."""
    import pyspark.sql.functions as F

    pts = spark.createDataFrame(
        [(1, 0.6, 0.8), (2, 1.2, 1.6)], "k long, x double, y double")
    cells = pts.select(
        "k", "x", "y", F.floor("x").cast("bigint").alias("cx"),
        F.floor("y").cast("bigint").alias("cy"))
    a = (cells
         .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
         .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
         .select(F.col("k").alias("ka"), F.col("x").alias("xa"),
                 F.col("y").alias("ya"),
                 (F.col("cx") + F.col("dx")).alias("jx"),
                 (F.col("cy") + F.col("dy")).alias("jy")))
    b = cells.select(F.col("k").alias("kb"), F.col("x").alias("xb"),
                     F.col("y").alias("yb"), F.col("cx").alias("jx"),
                     F.col("cy").alias("jy"))
    d2 = ((F.col("xa") - F.col("xb")) ** 2 + (F.col("ya") - F.col("yb")) ** 2)
    got = (a.join(b, ["jx", "jy"])
           .filter((F.col("ka") < F.col("kb")) & (d2 <= 1.0 + 1e-12))
           .count())
    assert got == 1


def test_safety_filter_fold_table(spark):
    """Every leet substitution the filter claims must fold to its
    letter: the translate map is the contract."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("UnS4f3_T3rm",), ("un5af3_term",), ("uns4fe_t3rm",)], "s string")
    folded = [r[0] for r in df.select(
        F.translate(F.lower("s"), "013457", "oieast")).collect()]
    assert folded == ["unsafe_term"] * 3


def test_replication_checksum_flips_on_single_row_change(spark):
    """The xor fold's whole job: one changed row must flip its
    bucket's checksum and leave the other 15 untouched."""
    import duckdb

    import pyspark.sql.functions as F
    from data_eng_iceberg_demo_spark.plans.registry import REGISTRY

    base = {r["bucket"]: r["checksum"]
            for r in REGISTRY["dq_replication_checksum"]
            .fn(spark, SF).collect()}
    # recompute the oracle with ONE order's status flipped
    con = duckdb.connect()
    con.sql(f"""CREATE VIEW orders AS
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey = 7 THEN 'X' ELSE o_orderstatus END
                   AS o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM '{SF}/orders.parquet'""")
    mutated = {r[0]: r[2] for r in con.execute(
        REGISTRY["dq_replication_checksum"].oracle).fetchall()}
    changed = [b for b in base if base[b] != mutated[b]]
    assert changed == [7 % 16]


def test_ip_cidr_dotted_quad_inverts(spark):
    """dotted-quad render must invert back to the integer for every
    produced row (sampled): ip_int is not projected by fn_ip_cidr, so
    recompute it from k via the SAME md5 derivation the operator uses
    and assert the big-endian octet recomposition equals it — a
    renderer that permuted or truncated octets fails (r13 fix per
    advice: the old form only range-checked octets)."""
    import hashlib

    from data_eng_iceberg_demo_spark.plans.registry import REGISTRY

    rows = (REGISTRY["fn_ip_cidr"].fn(spark, SF).limit(50).collect())
    assert rows
    for r in rows:
        o = [int(p) for p in r["dotted"].split(".")]
        assert len(o) == 4 and all(0 <= x <= 255 for x in o)
        ip_int = int(hashlib.md5(
            f"{r['k']}:ip".encode()).hexdigest()[:8], 16) % 4294967296
        assert (o[0] * 2**24 + o[1] * 2**16 + o[2] * 2**8 + o[3]
                == ip_int), (r["k"], r["dotted"], ip_int)
