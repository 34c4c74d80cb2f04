"""TPC-H headline queries (Q1/Q3/Q5/Q10 shapes, adapted to the fixture
schema — orders has no o_shippriority, lineitem no l_commitdate, so those
columns are omitted; the join/agg structure is the standard one).

These are the queries the 100 TB design story hangs on:
  * Q1  — full-scan partial+final aggregate, one exchange of partials
    (declared as agg_groupby_basic in aggregates.py; not repeated here);
  * Q3  — selective dimension filters reaching both scans, top-k
    without a global sort;
  * Q5  — 6-table star: bounded dims (nation/region) broadcast, the
    final group-by on n_name is the only hinted-plan exchange;
  * Q10 — returned-items revenue per customer: the group-by key is the
    high-cardinality side, so partial aggregation carries the shuffle.

Broadcast-hint policy (enforced by tests/test_plans.py): an explicit
F.broadcast() is a plan shape AQE can never demote, so hints appear ONLY
on relations whose size is bounded by SCHEMA or by construction — nation
(25), region (5), 1-row scalar aggregates, and selective HAVING
keep-lists.  Everything that grows linearly with the corpus (orders,
customer, part, supplier, per-key aggregates) is left unhinted: at test
scale AQE broadcasts it at runtime anyway, and at 100 TB the same plan
degrades gracefully to a shuffled hash join instead of a driver OOM.

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
    scans, join strategy is left to AQE (customer and orders scale with
    the corpus, so a hardcoded broadcast would be a forced OOM at 100x;
    at runtime AQE still broadcasts whichever filtered side fits), and
    the final top-10 is TakeOrderedAndProject — no global sort of the
    aggregate."""
    c = T(spark, d, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, d, "orders").filter(
        F.col("o_orderdate") < "1996-03-15 00:00:00")
    li = T(spark, d, "lineitem").filter(
        F.col("l_shipdate") > "1996-03-15 00:00:00")
    return (li.join(o.join(c, o.o_custkey == c.c_custkey),
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
    """Q5 local-supplier-volume shape: nation x region (both bounded —
    25 and 5 rows by schema, not by data volume) broadcast onto customer;
    the fact-sized joins (orders, customer-dim, supplier) carry no hints
    — they scale with the corpus, so the strategy is AQE's call: at
    sf0.1 they broadcast at runtime, at 100 TB they shuffle on their
    equi keys."""
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
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(dim, o.o_custkey == F.col("c_custkey"))
            .join(s,
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
    big side), so partials flow through one exchange; nation (25 rows,
    bounded) is the only hinted broadcast — orders and customer scale
    with the corpus, so their join strategy is AQE's runtime call."""
    c = T(spark, d, "customer")
    o = T(spark, d, "orders").filter(
        (F.col("o_orderdate") >= "1996-02-01 00:00:00")
        & (F.col("o_orderdate") < "1996-05-01 00:00:00"))
    li = T(spark, d, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, d, "nation")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
            .select("c_custkey", "c_name", "revenue",
                    F.col("c_acctbal").cast("double").alias("c_acctbal"),
                    "n_name")
            .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
            .limit(20))


@register(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
               AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 / count(*), 2) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 2) AS avg_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, d):
    """Q1 pricing-summary shape: one full scan, eight aggregates computed
    in a single partial+final hash aggregate — the exchange carries ~6
    partial rows per task regardless of fact-table size.  All money sums
    are exact decimal per row (order-insensitive), converted to DOUBLE
    only at the very end."""
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    li = T(spark, d, "lineitem").filter(
        F.col("l_shipdate") <= "2000-12-01 00:00:00")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(qty).cast("double").alias("sum_qty"),
                 F.sum(price).cast("double").alias("sum_base_price"),
                 F.sum(price * (F.lit(1) - disc)).cast("double")
                  .alias("sum_disc_price"),
                 F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
                  .cast("double").alias("sum_charge"),
                 F.round(F.sum(qty).cast("double") / F.count("*"), 2)
                  .alias("avg_qty"),
                 F.round(F.sum(price).cast("double") / F.count("*"), 2)
                  .alias("avg_price"),
                 F.count("*").alias("count_order")))


@register(
    "tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4(spark, d):
    """Q4 order-priority shape (adapted: the fixture has no
    l_commitdate/l_receiptdate, so "late" means shipped >= 60 days after
    the order date).  The EXISTS becomes a left-semi join — the probe
    side never widens, and lineitem is reduced to (orderkey, shipdate)
    before the shuffle."""
    o = T(spark, d, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1996-04-01 00:00:00"))
    li = T(spark, d, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count")))


@register(
    "tpch_q6",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark, d):
    """Q6 forecasting-revenue shape: every predicate reaches the parquet
    scan (PushedFilters on shipdate/discount/quantity), so row groups
    outside the year are never decoded; the plan is scan -> one partial
    sum per task -> single-row exchange."""
    li = T(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-01-01 00:00:00")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24))
    return li.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")
              * F.col("l_discount").cast("decimal(4,2)"))
        .cast("double").alias("revenue"))


@register(
    "tpch_q12",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def tpch_q12(spark, d):
    """Q12 shipping-mode shape (adapted: the fixture has no l_shipmode,
    so lines group by l_linestatus).  Conditional counting folds into the
    aggregate — no separate filter passes.  Orders is a full fact table
    (grows with the corpus), so it carries no broadcast hint: the
    orderkey equi-join shuffles both sides at scale, and AQE broadcasts
    at runtime when the projection actually fits."""
    o = T(spark, d, "orders").select("o_orderkey", "o_orderpriority")
    li = T(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-01-01 00:00:00"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count")))


@register(
    "tpch_q14",
    oracle=f"""
    SELECT round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
                 / CAST(sum({_REV_SQL}) AS DOUBLE), 4) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def tpch_q14(spark, d):
    """Q14 promotion-effect shape: both branches of the ratio come out
    of ONE aggregate over one scan (exact decimal sums; the division
    happens once, on two exact values).  Part scales with the corpus, so
    the partkey join carries no hint — AQE broadcasts the 2-column
    projection when it fits and shuffles when it doesn't."""
    p = T(spark, d, "part").select("p_partkey", "p_type")
    li = T(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01 00:00:00")
        & (F.col("l_shipdate") < "1996-04-01 00:00:00"))
    rev = _rev_col()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,2)"))
    return (li.join(p, li.l_partkey == p.p_partkey)
            .agg(F.round(F.lit(100.0) * F.sum(promo).cast("double")
                         / F.sum(rev).cast("double"), 4)
                 .alias("promo_revenue")))


@register(
    "tpch_q18",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate_s,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(b.total_qty AS DOUBLE) AS total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark, d):
    """Q18 large-volume-customer shape: the HAVING aggregate shrinks
    lineitem to a tiny keep-list FIRST, and that keep-list broadcasts
    into orders — the expensive table is never joined at full width (the
    HAVING output is a sub-percent slice of orders, the one aggregate
    whose broadcast is justified).  Customer is corpus-sized, so its
    join carries no hint — after the keep-list join the probe side is
    tiny and AQE broadcasts IT at runtime, which is the direction that
    stays valid at 100 TB."""
    li = T(spark, d, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)"))
                .alias("total_qty"))
           .filter(F.col("total_qty") > 300))
    o = T(spark, d, "orders")
    c = T(spark, d, "customer")
    return (o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .select("c_name", "c_custkey", "o_orderkey",
                    F.col("o_orderdate").cast("string").alias("o_orderdate_s"),
                    F.col("o_totalprice").cast("double").alias("o_totalprice"),
                    F.col("total_qty").cast("double").alias("total_qty"))
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(100))


@register(
    "tpch_q19",
    oracle=f"""
    SELECT CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark, d):
    """Q19 discounted-revenue shape (adapted: no p_container in the
    fixture): a disjunction of conjunctive band predicates spanning BOTH
    join sides.  The single-side implications ARE pushed manually —
    part is pre-filtered to the three brands and lineitem to the
    quantity hull — so the residual OR only runs on join survivors.
    The brand slice of part still scales with the corpus, so no
    broadcast hint: AQE decides at runtime."""
    p = T(spark, d, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & F.col("p_size").between(1, 15))
    li = T(spark, d, "lineitem").filter(F.col("l_quantity").between(1, 30))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30)))
    return (li.join(p, li.l_partkey == p.p_partkey)
            .filter(cond)
            .agg(F.sum(_rev_col()).cast("double").alias("revenue")))


@register(
    "tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
        OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark, d):
    """Q7 volume-shipping shape: revenue between two trading nations per
    shipment year.  Both nation joins broadcast (25 rows, bounded); the
    cross-side nation-pair disjunction cannot be pushed to either scan,
    but each single-side implication CAN — supplier and customer are
    pre-restricted to the two nations, so the fact rows surviving the
    joins are already the ~2/25 nation slice before the residual OR
    runs.  The 2/25 slices are still linear in the corpus, so the
    supplier/orders/customer joins carry no hints — AQE's runtime call."""
    pair = ("NATION_12", "NATION_10")
    n = T(spark, d, "nation").filter(F.col("n_name").isin(*pair))
    s = (T(spark, d, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    c = (T(spark, d, "customer")
         .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
         .select("c_custkey", F.col("n_name").alias("cust_nation")))
    o = T(spark, d, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00"))
    return (li.join(s, li.l_suppkey == s.s_suppkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .filter(((F.col("supp_nation") == pair[0])
                     & (F.col("cust_nation") == pair[1]))
                    | ((F.col("supp_nation") == pair[1])
                       & (F.col("cust_nation") == pair[0])))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("int").alias("l_year"))
            .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


@register(
    "tpch_q8",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           round(CAST(sum(CASE WHEN n2.n_name = 'NATION_12'
                          THEN {_REV_SQL}
                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum({_REV_SQL}) AS DOUBLE), 4) AS mkt_share
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n1.n_regionkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'EUROPE'
      AND p.p_type = 'STANDARD'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8(spark, d):
    """Q8 national-market-share shape: the supplier nation's share of
    regional revenue for one part type, per order year.  Nation and
    region broadcast inside the dimension prep (bounded); the four
    fact-sized joins (part, supplier, orders, customer — all linear in
    the corpus) carry no hints.  Numerator and denominator come out of
    ONE aggregate (conditional decimal sum), so the fact table is
    scanned exactly once."""
    p = T(spark, d, "part").filter(F.col("p_type") == "STANDARD") \
        .select("p_partkey")
    r = T(spark, d, "region").filter(F.col("r_name") == "EUROPE")
    n = T(spark, d, "nation")
    c = (T(spark, d, "customer")
         .join(F.broadcast(
             n.join(F.broadcast(r), n.n_regionkey == F.col("r_regionkey"))),
             F.col("c_nationkey") == F.col("n_nationkey"))
         .select("c_custkey"))
    s = (T(spark, d, "supplier")
         .join(F.broadcast(T(spark, d, "nation")
                           .select(F.col("n_nationkey").alias("sn_key"),
                                   F.col("n_name").alias("supp_nation"))),
               F.col("s_nationkey") == F.col("sn_key"))
         .select("s_suppkey", "supp_nation"))
    o = T(spark, d, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1998-01-01 00:00:00")) \
        .select("o_orderkey", "o_custkey", "o_orderdate")
    li = T(spark, d, "lineitem")
    rev = _rev_col()
    nat = F.when(F.col("supp_nation") == "NATION_12", rev) \
        .otherwise(F.lit(0).cast("decimal(18,2)"))
    return (li.join(p, li.l_partkey == p.p_partkey)
            .join(s, li.l_suppkey == s.s_suppkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(F.round(F.sum(nat).cast("double")
                         / F.sum(rev).cast("double"), 4).alias("mkt_share"))
            .orderBy("o_year"))


@register(
    "tpch_q13",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey,
               CAST(coalesce(cnt.c_count, 0) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN (
            SELECT o_custkey, count(*) AS c_count
            FROM orders
            WHERE o_orderpriority <> '1-URGENT'
            GROUP BY o_custkey
        ) cnt ON cnt.o_custkey = c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark, d):
    """Q13 customer-distribution shape (adapted: no o_comment in the
    fixture, so the exclusion predicate is on o_orderpriority).  Orders
    are aggregated DOWN to one row per customer before any join — the
    join input is |customers|, not |orders| — preserving customers with
    zero qualifying orders via the outer side.  The count table is
    per-customer (billions of rows at 100 TB), so no broadcast hint:
    both sides hash-shuffle on custkey, or AQE broadcasts at runtime
    when the count table actually fits.  Two aggregates, each
    partial+final."""
    o = T(spark, d, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    cnt = o.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    c = T(spark, d, "customer").select("c_custkey")
    return (c.join(cnt, c.c_custkey == cnt.o_custkey, "left")
            .select(F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint")
                    .alias("c_count"))
            .groupBy("c_count")
            .agg(F.count("*").alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


@register(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum({_REV_SQL}) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(rv.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue rv ON rv.supplier_no = s.s_suppkey
    WHERE rv.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15(spark, d):
    """Q15 top-supplier shape: quarterly revenue per supplier, keep the
    max.  The per-supplier aggregate is computed once and reused for both
    the ranking and the scalar max (Spark reuses the exchange); the max
    is a 1-row broadcast, and the equality comparison is on EXACT decimal
    sums, so cross-engine float ties cannot split the answer.  The
    winners table (revenue == scalar max, so #ties rows, ~1) broadcasts
    onto supplier — NOT the other way around: supplier is corpus-sized."""
    li = T(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1996-04-01 00:00:00"))
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(F.sum(_rev_col()).alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = T(spark, d, "supplier")
    winners = rev.join(F.broadcast(mx), rev.total_revenue == mx.mx)
    return (s.join(F.broadcast(winners),
                   s.s_suppkey == winners.supplier_no)
            .select("s_suppkey", "s_name",
                    F.col("total_revenue").cast("double")
                    .alias("total_revenue"))
            .orderBy("s_suppkey"))


@register(
    "tpch_q17",
    oracle="""
    WITH thresh AS (
        SELECT l_partkey,
               0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
                           AS DOUBLE) / count(*)) AS max_qty
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                 AS DOUBLE) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN thresh t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12'
      AND l.l_quantity < t.max_qty
    """,
)
def tpch_q17(spark, d):
    """Q17 small-quantity-order shape (adapted: no p_container, brand
    filter only).  The correlated per-part average is decorrelated into
    one aggregate over lineitem grouped by partkey, joined back onto
    the brand-restricted fact rows.  Both the brand slice of part and
    the per-partkey threshold table are linear in the corpus, so neither
    carries a broadcast hint — the partkey equi-joins shuffle (or AQE
    broadcasts at runtime when they fit).  The threshold is derived from
    an EXACT decimal sum divided by an exact count with the identical
    expression tree on both engines, so the boundary comparison is
    bit-deterministic."""
    li = T(spark, d, "lineitem")
    thresh = (li.groupBy("l_partkey")
              .agg((F.lit(0.2)
                    * (F.sum(F.col("l_quantity").cast("decimal(12,2)"))
                       .cast("double") / F.count("*"))).alias("max_qty"))
              .withColumnRenamed("l_partkey", "t_partkey"))
    p = T(spark, d, "part").filter(F.col("p_brand") == "Brand#12") \
        .select("p_partkey")
    return (li.join(p, li.l_partkey == p.p_partkey)
            .join(thresh, li.l_partkey == F.col("t_partkey"))
            .filter(F.col("l_quantity") < F.col("max_qty"))
            .agg(F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                         .cast("double") / 7.0, 2).alias("avg_yearly")))


@register(
    "tpch_q22",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS a
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
)
def tpch_q22(spark, d):
    """Q22 global-sales-opportunity shape (adapted: the fixture has no
    c_phone, so grouping is by nation and "inactive" means no orders
    since 2000 — every customer has SOME order in this data).  The
    scalar average is an exact-decimal-sum-over-count 1-row broadcast;
    the NOT EXISTS is a left-anti join against the date-restricted
    orders projection, which at 100 TB is the only shuffle in the plan
    (anti-join on o_custkey); the average itself never shuffles
    customer twice thanks to exchange reuse."""
    c = T(spark, d, "customer")
    avg_bal = (c.filter(F.col("c_acctbal") > 0.0)
               .agg((F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                     .cast("double") / F.count("*")).alias("a")))
    recent = T(spark, d, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01 00:00:00") \
        .select("o_custkey")
    return (c.join(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("a"))
            .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("numcust"),
                 F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                 .cast("double").alias("totacctbal"))
            .orderBy("c_nationkey"))


# ---------------------------------------------------------------------------
# Derived partsupp: the fixture set has no partsupp.parquet, so the table is
# DERIVED deterministically from part x supplier with a dbgen-style supplier
# assignment (4 suppliers per part, spread across the supplier keyspace) and
# integer-arithmetic availqty/supplycost — identical formulas on both
# engines, so the driver's hash comparison covers the derivation itself.
# All cost math stays in integer CENTS until the final output cast: integer
# (and decimal) arithmetic is exact and order-insensitive on both engines.
# ---------------------------------------------------------------------------

_PS_CTE = """
    s_cnt AS (SELECT count(*) AS sc FROM supplier),
    partsupp AS (
        SELECT p_partkey AS ps_partkey,
               (p_partkey + t.i * (sc // 4) + p_partkey // sc) % sc
                   AS ps_suppkey,
               CAST((p_partkey * 7 + t.i * 13) % 9999 + 1 AS BIGINT)
                   AS ps_availqty,
               10000 + (p_partkey * 31
                        + ((p_partkey + t.i * (sc // 4) + p_partkey // sc)
                           % sc) * 17) % 80000 AS ps_cost_cents
        FROM part, s_cnt, (SELECT unnest([0, 1, 2, 3]) AS i) t
    )
"""

# exact decimal supplycost (dollars) from integer cents — same text on both
# engines; DECIMAL x DECIMAL is exact, cast to DOUBLE only at output
_PS_COST_DEC = ("CAST(ps_cost_cents AS DECIMAL(18,2)) "
                "* CAST(0.01 AS DECIMAL(4,2))")


def partsupp(spark, d):
    """The derived partsupp relation (see module comment above).  The
    1-row supplier count broadcasts onto part; the 4-way explode is a
    narrow map — the whole derivation adds zero shuffles, so at 100 TB
    it streams with the part scan."""
    sc_ = T(spark, d, "supplier").agg(F.count("*").alias("sc"))
    return (T(spark, d, "part").select("p_partkey")
            .crossJoin(F.broadcast(sc_))
            .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(3))))
            .selectExpr(
                "p_partkey AS ps_partkey",
                "(p_partkey + i * (sc DIV 4) + p_partkey DIV sc) % sc"
                "    AS ps_suppkey",
                "CAST((p_partkey * 7 + i * 13) % 9999 + 1 AS BIGINT)"
                "    AS ps_availqty",
                "10000 + (p_partkey * 31"
                "         + ((p_partkey + i * (sc DIV 4) + p_partkey DIV sc)"
                "            % sc) * 17) % 80000 AS ps_cost_cents"))


@register(
    "tpch_q2",
    oracle=f"""
    WITH {_PS_CTE},
    eu AS (
        SELECT ps_partkey, ps_cost_cents, s_name, s_acctbal, n_name
        FROM partsupp
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
    ),
    mincost AS (
        SELECT ps_partkey, min(ps_cost_cents) AS mc FROM eu GROUP BY ps_partkey
    )
    SELECT CAST(eu.s_acctbal AS DOUBLE) AS s_acctbal, eu.s_name, eu.n_name,
           p.p_partkey, CAST(eu.ps_cost_cents AS DOUBLE) / 100 AS ps_supplycost
    FROM part p
    JOIN eu ON eu.ps_partkey = p.p_partkey
    JOIN mincost m ON m.ps_partkey = p.p_partkey
                  AND eu.ps_cost_cents = m.mc
    WHERE p.p_size <= 15 AND p.p_type = 'ECONOMY'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark, d):
    """Q2 minimum-cost-supplier shape (adapted: no p_mfgr/s_address/
    s_phone in the fixture, so the output carries acctbal/name/nation/
    part/cost).  The correlated MIN subquery is decorrelated into a
    per-part minimum over the region-restricted partsupp, joined back on
    (partkey, exact integer cost) — the classic decorrelation, and the
    min compare is on integer cents so no float tie can split engines.
    nation x region are schema-bounded broadcasts; partsupp and supplier
    scale with the corpus and stay unhinted."""
    ps = partsupp(spark, d)
    s = T(spark, d, "supplier")
    n = T(spark, d, "nation")
    r = T(spark, d, "region").filter(F.col("r_name") == "EUROPE")
    eu = (ps.join(s, ps.ps_suppkey == s.s_suppkey)
          .join(F.broadcast(n.join(F.broadcast(r),
                                   n.n_regionkey == r.r_regionkey)),
                s.s_nationkey == n.n_nationkey)
          .select("ps_partkey", "ps_cost_cents", "s_name", "s_acctbal",
                  "n_name"))
    mincost = (eu.groupBy(F.col("ps_partkey").alias("mc_partkey"))
               .agg(F.min("ps_cost_cents").alias("mc")))
    p = (T(spark, d, "part")
         .filter((F.col("p_size") <= 15) & (F.col("p_type") == "ECONOMY"))
         .select("p_partkey"))
    return (p.join(eu, eu.ps_partkey == p.p_partkey)
            .join(mincost, (F.col("mc_partkey") == p.p_partkey)
                  & (eu.ps_cost_cents == F.col("mc")))
            .select(F.col("s_acctbal").cast("double").alias("s_acctbal"),
                    "s_name", "n_name", "p_partkey",
                    (F.col("ps_cost_cents").cast("double") / 100)
                    .alias("ps_supplycost"))
            .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                     "p_partkey")
            .limit(100))


@register(
    "tpch_q9",
    oracle=f"""
    WITH {_PS_CTE}
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    - {_PS_COST_DEC}
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey AND p_name LIKE 'red%'
    JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9(spark, d):
    """Q9 product-type-profit shape: profit = revenue - supplycost x qty
    per line, aggregated by supplier nation and order year.  Every money
    term is exact decimal per row before the sum (order-insensitive);
    nation is the only hinted broadcast.  The partsupp join keys are
    (partkey, suppkey) — both fixed-width; the derived partsupp streams
    with the part scan, so the join adds one shuffle at most (AQE
    broadcasts it at fixture scale)."""
    li = T(spark, d, "lineitem")
    p = (T(spark, d, "part").filter(F.col("p_name").like("red%"))
         .select("p_partkey"))
    ps = partsupp(spark, d)
    s = T(spark, d, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, d, "nation")
    o = T(spark, d, "orders").select("o_orderkey", "o_orderdate")
    amount = (F.col("l_extendedprice").cast("decimal(18,2)")
              * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
              - F.expr(_PS_COST_DEC)
              * F.col("l_quantity").cast("decimal(12,2)"))
    return (li.join(p, li.l_partkey == p.p_partkey)
            .join(ps, (li.l_partkey == ps.ps_partkey)
                  & (li.l_suppkey == ps.ps_suppkey))
            .join(s, li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(F.sum(amount).cast("double").alias("sum_profit"))
            .orderBy("nation", F.col("o_year").desc()))


@register(
    "tpch_q11",
    oracle=f"""
    WITH {_PS_CTE},
    de AS (
        SELECT ps_partkey, ps_availqty * ps_cost_cents AS val_cents
        FROM partsupp
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_12'
    ),
    tot AS (SELECT sum(val_cents) AS t FROM de)
    SELECT ps_partkey,
           CAST(sum(val_cents) AS DOUBLE) / 100 AS part_value
    FROM de, tot
    GROUP BY ps_partkey, t
    HAVING sum(val_cents) * 1000 > t
    ORDER BY part_value DESC, ps_partkey
    """,
)
def tpch_q11(spark, d):
    """Q11 important-stock shape: per-part inventory value for one
    nation's suppliers, kept when above 0.1% of that nation's total.
    The threshold compare is integer-exact (sum_cents * 1000 > total
    cents — no float fraction), the grand total is a 1-row broadcast,
    and exchange reuse computes the per-part aggregate once for both
    branches."""
    ps = partsupp(spark, d)
    s = T(spark, d, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, d, "nation").filter(F.col("n_name") == "NATION_12")
    de = (ps.join(s, ps.ps_suppkey == s.s_suppkey)
          .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
          .select("ps_partkey",
                  (F.col("ps_availqty") * F.col("ps_cost_cents"))
                  .alias("val_cents")))
    per_part = de.groupBy("ps_partkey").agg(
        F.sum("val_cents").alias("v"))
    tot = de.agg(F.sum("val_cents").alias("t"))
    return (per_part.join(F.broadcast(tot))
            .filter(F.col("v") * 1000 > F.col("t"))
            .select("ps_partkey",
                    (F.col("v").cast("double") / 100).alias("part_value"))
            .orderBy(F.col("part_value").desc(), "ps_partkey"))


@register(
    "tpch_q16",
    oracle=f"""
    WITH {_PS_CTE}
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    JOIN supplier ON s_suppkey = ps_suppkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (5, 11, 17, 23, 29, 35, 41, 47)
      AND s_acctbal >= 0
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16(spark, d):
    """Q16 parts/supplier-relationship shape (adapted: the fixture has
    no s_comment, so the 'complaints' supplier exclusion becomes a
    negative-acctbal exclusion; same anti-pattern position in the plan).
    count(DISTINCT supplier) per (brand, type, size) — the distinct
    dedups inside the aggregate exchange; the supplier filter is a
    semi-join-shaped equi join on the fixed-width key."""
    ps = partsupp(spark, d)
    p = (T(spark, d, "part")
         .filter((F.col("p_brand") != "Brand#1")
                 & (F.col("p_type") != "PROMO")
                 & F.col("p_size").isin(5, 11, 17, 23, 29, 35, 41, 47)))
    ok = T(spark, d, "supplier").filter(F.col("s_acctbal") >= 0) \
        .select("s_suppkey")
    return (ps.join(p, ps.ps_partkey == p.p_partkey)
            .join(ok, ps.ps_suppkey == ok.s_suppkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type",
                     "p_size"))


@register(
    "tpch_q20",
    oracle=f"""
    WITH {_PS_CTE},
    shipped AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%') rp
          ON rp.p_partkey = ps_partkey
        JOIN shipped sh ON sh.l_partkey = ps_partkey
                       AND sh.l_suppkey = ps_suppkey
        WHERE CAST(ps_availqty AS DECIMAL(12,2)) * 2 > sh.qty
    )
    ORDER BY s.s_suppkey
    """,
)
def tpch_q20(spark, d):
    """Q20 potential-part-promotion shape (adapted: no nation filter —
    the fixture's 4-suppliers-per-nation makes a single-nation answer
    degenerate).  'Has excess stock of a promoted part': availqty more
    than half the year's shipped quantity for that (part, supplier).
    The IN becomes a left-semi join; the compare is decimal-exact
    (availqty * 2 > qty, no 0.5 float factor)."""
    ps = partsupp(spark, d)
    rp = (T(spark, d, "part").filter(F.col("p_name").like("red%"))
          .select("p_partkey"))
    li = T(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-01-01 00:00:00"))
    shipped = (li.groupBy("l_partkey", "l_suppkey")
               .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)"))
                    .alias("qty")))
    excess = (ps.join(rp, ps.ps_partkey == rp.p_partkey)
              .join(shipped, (shipped.l_partkey == ps.ps_partkey)
                    & (shipped.l_suppkey == ps.ps_suppkey))
              .filter(F.col("ps_availqty").cast("decimal(12,2)") * 2
                      > F.col("qty"))
              .select("ps_suppkey"))
    s = T(spark, d, "supplier")
    return (s.join(excess, s.s_suppkey == excess.ps_suppkey, "left_semi")
            .select("s_suppkey", "s_name")
            .orderBy("s_suppkey"))


@register(
    "tpch_q21",
    oracle="""
    WITH fo AS (
        SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
    ),
    li AS (
        SELECT l_orderkey, l_suppkey,
               CAST(l_shipdate >= o_orderdate + INTERVAL 60 DAY AS INT)
                   AS is_late
        FROM lineitem JOIN fo ON o_orderkey = l_orderkey
    ),
    per_supp AS (
        SELECT l_orderkey, l_suppkey, max(is_late) AS supp_late
        FROM li GROUP BY 1, 2
    ),
    per_order AS (
        SELECT l_orderkey, count(*) AS n_supp, sum(supp_late) AS n_late
        FROM per_supp GROUP BY 1
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM per_supp ps
    JOIN per_order po ON po.l_orderkey = ps.l_orderkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE ps.supp_late = 1 AND po.n_supp >= 2 AND po.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def tpch_q21(spark, d):
    """Q21 suppliers-who-kept-orders-waiting shape (adapted: 'late' is
    shipped >= 60 days after order date as in Q4, and waits are counted
    per (order, supplier) rather than per line — the fixture has no
    l_commitdate/l_receiptdate).  The EXISTS / NOT EXISTS pair is
    decorrelated into ONE per-(order, supplier) aggregate followed by a
    per-order WINDOW rollup (count/sum over the order partition) —
    windowing instead of a groupBy+self-join keeps the plan a single
    branch, so lineitem is scanned exactly once (asserted in
    tests/test_plans.py).  Two shuffles total (both on fixed-width
    keys), no correlated re-scans — the decorrelation that matters at
    100 TB."""
    from pyspark.sql import Window
    fo = (T(spark, d, "orders").filter(F.col("o_orderstatus") == "F")
          .select("o_orderkey", "o_orderdate"))
    li = T(spark, d, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    lines = (li.join(fo, li.l_orderkey == fo.o_orderkey)
             .select("l_orderkey", "l_suppkey",
                     (F.col("l_shipdate")
                      >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
                     .cast("int").alias("is_late")))
    per_supp = (lines.groupBy("l_orderkey", "l_suppkey")
                .agg(F.max("is_late").alias("supp_late")))
    w = Window.partitionBy("l_orderkey")
    stats = (per_supp
             .withColumn("n_supp", F.count("*").over(w))
             .withColumn("n_late", F.sum("supp_late").over(w)))
    s = T(spark, d, "supplier").select("s_suppkey", "s_name")
    return (stats.filter((F.col("supp_late") == 1)
                         & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
            .join(s, stats.l_suppkey == s.s_suppkey)
            .groupBy("s_name")
            .agg(F.count("*").alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name"))
