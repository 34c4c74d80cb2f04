"""B-sort queries (SURVEY.md §2): multi-key sorts with NULL placement,
LIMIT, global and per-group top-k.

Because the driver's value-hash is order-insensitive, ordered results embed
their rank (row_number with a unique tiebreaker) so the ordering itself is
verified, not just the row set.

Scale notes: global ORDER BY is a range-partitioned sort (sampled
boundaries) — fine; ORDER BY + LIMIT compiles to TakeOrderedAndProject
(per-partition top-k, then k·partitions merged on the driver) — the only
safe global-sort at 100 TB.  Per-group top-k is a windowed row_number:
one shuffle on the group key, no global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..plans.registry import register
from ..scratch import scratch_dir
from ._util import T


@register(
    "sort_multikey_nulls",
    oracle="""
    SELECT o_orderkey, pri_or_null, o_totalprice,
           row_number() OVER (
               ORDER BY pri_or_null DESC NULLS LAST, o_totalprice ASC, o_orderkey ASC
           ) AS rk
    FROM (
        SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') AS pri_or_null,
               o_totalprice
        FROM orders WHERE o_totalprice > 350000
    )
    """,
)
def sort_multikey_nulls(spark, d):
    """Multi-key sort, DESC NULLS LAST + ASC, with embedded verification
    rank (unique tiebreak o_orderkey).

    The global rank is computed distributed (the zipWithIndex pattern),
    never with an un-partitioned row_number window: range-partition on
    the sort key, rank within each partition (the WindowExec partitions
    by _pid), then offset by the total count of all preceding range
    partitions.  The range-partitioned frame is materialized once to a
    scratch parquet with its _pid column frozen in the data: range
    boundaries come from sampling, so the count job and the output job
    would otherwise see different partition assignments (and a persist()
    would pin cache for the session's lifetime).  The driver only ever
    holds one count per partition — a bounded scalar per the number of
    range partitions, independent of data volume."""
    o = (T(spark, d, "orders").filter(F.col("o_totalprice") > 350000)
         .select("o_orderkey",
                 F.nullif("o_orderpriority", F.lit("1-URGENT")).alias("pri_or_null"),
                 "o_totalprice"))
    order = [F.col("pri_or_null").desc_nulls_last(), F.col("o_totalprice").asc(),
             F.col("o_orderkey").asc()]
    n_parts = 16  # at 100 TB: size so each range partition fits an executor
    staged = scratch_dir("sortrank_")
    (o.repartitionByRange(n_parts, *order)
      .withColumn("_pid", F.spark_partition_id())
      .write.mode("overwrite").parquet(staged))
    part = spark.read.parquet(staged)
    w = Window.partitionBy("_pid").orderBy(*order)
    local = part.withColumn("_lrn", F.row_number().over(w))
    counts = {r["_pid"]: r["cnt"] for r in
              local.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off bigint")
    # no trailing global orderBy: rk embeds the full ordering (verified by
    # the oracle's row_number), and re-sorting would add one more range
    # shuffle for presentation only
    return (local.join(F.broadcast(off), "_pid")
            .withColumn("rk", (F.col("_lrn") + F.col("_off")).cast("bigint"))
            .select("o_orderkey", "pri_or_null", "o_totalprice", "rk"))


@register(
    "limit_k",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10
    """,
)
def limit_k(spark, d):
    """LIMIT over a deterministic pre-sort (README.md:216 analog —
    the tutorial's bare LIMIT 5 is nondeterministic; hash-checking
    requires the sort)."""
    return (T(spark, d, "orders").select("o_orderkey", "o_totalprice")
            .orderBy("o_orderkey").limit(10))


@register(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
    """,
)
def topk_global(spark, d):
    """Global top-k → TakeOrderedAndProject (never a full global sort)."""
    return (T(spark, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
            .limit(20))


@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark, d):
    """Top-3 orders per customer: windowed row_number + filter — one
    shuffle on the group key.  AQE handles skewed customers."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (T(spark, d, "orders")
            .select("o_custkey", "o_orderkey", "o_totalprice")
            .withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= 3))
