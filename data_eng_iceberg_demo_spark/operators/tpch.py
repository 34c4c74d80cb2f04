"""TPC-H headline queries (Q1/Q3/Q5/Q10 shapes, adapted to the fixture
schema — orders has no o_shippriority, lineitem no l_commitdate, so those
columns are omitted; the join/agg structure is the standard one).

These are the queries the 100 TB design story hangs on:
  * Q1  — full-scan partial+final aggregate, one exchange of partials
    (declared as agg_groupby_basic in aggregates.py; not repeated here);
  * Q3  — selective dimension filters reaching both scans, broadcast of
    the filtered customer side, top-k without a global sort;
  * Q5  — 6-table star: every dimension broadcasts, the only exchange is
    the final group-by on n_name;
  * Q10 — returned-items revenue per customer: the group-by key is the
    high-cardinality side, so partial aggregation carries the shuffle.

Numeric discipline (SURVEY.md §5.3): revenue terms are cast to DECIMAL
per row BEFORE summing on BOTH engines — decimal addition is exact and
order-insensitive, so the hash never sees float reassociation noise.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..plans.registry import register
from ._util import T

# per-row decimal revenue term, identical in Spark and DuckDB
_REV_SQL = ("CAST(l_extendedprice AS DECIMAL(18,2)) "
            "* (1 - CAST(l_discount AS DECIMAL(18,2)))")


def _rev_col():
    return (F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)")))


@register(
    "tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate_s
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark, d):
    """Q3 shipping-priority shape: both dimension filters reach their
    scans, the filtered customer side broadcasts, and the final top-10
    is TakeOrderedAndProject — no global sort of the aggregate."""
    c = T(spark, d, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, d, "orders").filter(
        F.col("o_orderdate") < "1996-03-15 00:00:00")
    li = T(spark, d, "lineitem").filter(
        F.col("l_shipdate") > "1996-03-15 00:00:00")
    return (li.join(F.broadcast(o.join(F.broadcast(c),
                                       o.o_custkey == c.c_custkey)),
                    li.l_orderkey == o.o_orderkey)
            .groupBy("l_orderkey", "o_orderdate")
            .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
            .select("l_orderkey", "revenue",
                    F.col("o_orderdate").cast("string").alias("o_orderdate_s"))
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
            .limit(10))


@register(
    "tpch_q5",
    oracle=f"""
    SELECT n.n_name,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
)
def tpch_q5(spark, d):
    """Q5 local-supplier-volume shape: 6-table star join where every
    dimension side broadcasts; the lone exchange is the 5-group final
    aggregate on n_name."""
    r = T(spark, d, "region").filter(F.col("r_name") == "ASIA")
    n = T(spark, d, "nation")
    c = T(spark, d, "customer")
    o = T(spark, d, "orders")
    li = T(spark, d, "lineitem")
    s = T(spark, d, "supplier")
    dim = (c.join(F.broadcast(n.join(F.broadcast(r),
                                     n.n_regionkey == r.r_regionkey)),
                  c.c_nationkey == n.n_nationkey)
           .select("c_custkey", "c_nationkey", "n_name"))
    return (li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(dim), o.o_custkey == F.col("c_custkey"))
            .join(F.broadcast(s),
                  (li.l_suppkey == s.s_suppkey)
                  & (s.s_nationkey == F.col("c_nationkey")))
            .groupBy("n_name")
            .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
            .orderBy(F.col("revenue").desc()))


@register(
    "tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue,
           CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
           n.n_name
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-02-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-05-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark, d):
    """Q10 returned-items shape: the aggregate key is the customer (the
    big side), so partials flow through one exchange; nation broadcasts
    onto the aggregate output, not the fact table."""
    c = T(spark, d, "customer")
    o = T(spark, d, "orders").filter(
        (F.col("o_orderdate") >= "1996-02-01 00:00:00")
        & (F.col("o_orderdate") < "1996-05-01 00:00:00"))
    li = T(spark, d, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, d, "nation")
    return (li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
            .select("c_custkey", "c_name", "revenue",
                    F.col("c_acctbal").cast("double").alias("c_acctbal"),
                    "n_name")
            .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
            .limit(20))
