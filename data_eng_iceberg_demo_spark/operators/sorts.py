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
from ._util import T

# One persisted range-partitioned stage per (application, sf_dir), replaced
# (and the predecessor unpersisted) on the next invocation for the same key
# — bounded by the handful of fixture dirs a session touches, so the cache
# never pins more than a few small filtered frames.
_RANK_STAGE_CACHE: dict[tuple[str, str], object] = {}


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
    partitions.  Range boundaries come from sampling, so every consumer
    of the partition ids must see ONE materialization of the exchange:
    the range-partitioned frame is persisted (memory-and-disk) and the
    whole computation — per-partition ranks, per-partition counts, the
    cumulative offsets — runs on that single cached lineage inside ONE
    action (r04 froze the ids with a parquet write+read round trip
    instead and benched 3.4x its r01 figure).  The offsets are derived
    in-plan: counts per _pid (n_parts rows) feed an unbounded-preceding
    running sum whose window, though unpartitioned, only ever sees
    n_parts rows — then broadcast back onto the ranked rows.  No
    data-sized state ever reaches the driver.  Under storage loss a
    block respills from the cached exchange output, not a re-sample; a
    production run on unreliable storage would swap the persist for
    reliable checkpointing, same plan shape."""
    from pyspark import StorageLevel

    o = (T(spark, d, "orders").filter(F.col("o_totalprice") > 350000)
         .select("o_orderkey",
                 F.nullif("o_orderpriority", F.lit("1-URGENT")).alias("pri_or_null"),
                 "o_totalprice"))
    order = [F.col("pri_or_null").desc_nulls_last(), F.col("o_totalprice").asc(),
             F.col("o_orderkey").asc()]
    n_parts = 8  # at 100 TB: size so each range partition fits an executor
    part = (o.repartitionByRange(n_parts, *order)
             .withColumn("_pid", F.spark_partition_id())
             .persist(StorageLevel.MEMORY_AND_DISK))
    key = (spark.sparkContext.applicationId, d)
    prev = _RANK_STAGE_CACHE.pop(key, None)
    if prev is not None:
        prev.unpersist(False)
    _RANK_STAGE_CACHE[key] = part
    w = Window.partitionBy("_pid").orderBy(*order)
    local = part.withColumn("_lrn", F.row_number().over(w))
    counts = part.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"))
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
