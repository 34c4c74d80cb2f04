"""B-win queries (SURVEY.md §2): ranking, lag/lead, running and range
frames, analytic functions.

Determinism discipline: every window ORDER BY carries a unique tiebreaker
(custkey/orderkey/event_id); events.ts is second-truncated in-plan so both
engines order identical values (ns-vs-µs, SURVEY.md §5.3).

Scale notes: a window over partitionBy(k) is one shuffle on k + a
per-partition sort; nothing here uses a global (unpartitioned) window
except via explicit top-level queries in sorts.py.  Frames are streaming
(running) or bounded — no whole-partition buffering beyond the sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..plans.registry import register
from ._util import T


@register(
    "window_ranking",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           row_number()  OVER w AS rn,
           rank()        OVER w AS rnk,
           dense_rank()  OVER w AS drnk,
           ntile(4)      OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def window_ranking(spark, d):
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return T(spark, d, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value, 1)  OVER w AS prev_value,
           lead(value, 1) OVER w AS next_value,
           lag(value, 2, -1.0) OVER w AS prev2_or_default
    FROM (SELECT event_id, user_id, value, date_trunc('second', ts) AS tss
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY tss ASC, event_id ASC)
    """,
)
def window_lag_lead(spark, d):
    e = T(spark, d, "events").select(
        "event_id", "user_id", "value", F.date_trunc("second", "ts").alias("tss"))
    w = Window.partitionBy("user_id").orderBy(F.col("tss").asc(), F.col("event_id").asc())
    return e.select(
        "event_id", "user_id", "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_or_default"),
    )


@register(
    "window_running_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           round(avg(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
    FROM orders
    """,
)
def window_running_frame(spark, d):
    """Running sum + 3-row moving average — streaming frames, O(1) state
    per row after the partition sort.  asc_nulls_last pins the order of
    NULL dates to DuckDB's ASC default (NULLS LAST) — Spark defaults to
    NULLS FIRST, which shifts every running value in a partition with a
    NULL date (r10 TPC-H null-mirror finding; ROWS frames are
    position-sensitive, unlike the RANGE frame next door)."""
    order = [F.col("o_orderdate").asc_nulls_last(),
             F.col("o_orderkey").asc()]
    w_run = (Window.partitionBy("o_custkey").orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_mov = (Window.partitionBy("o_custkey").orderBy(*order)
             .rowsBetween(-2, Window.currentRow))
    return T(spark, d, "orders").select(
        "o_orderkey", "o_custkey",
        F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(w_mov), 4).alias("moving_avg3"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           count(*) OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal
               RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS peers_within_500,
           round(sum(c_acctbal) OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal
               RANGE BETWEEN 500 PRECEDING AND CURRENT ROW), 2) AS bal_within_500
    FROM customer
    """,
)
def window_range_frame(spark, d):
    """Value-based (RANGE) frame: all peers whose acctbal is within 500
    below the current row's."""
    w = (Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal"))
         .rangeBetween(-500, Window.currentRow))
    return T(spark, d, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal",
        F.count("*").over(w).alias("peers_within_500"),
        F.round(F.sum("c_acctbal").over(w), 2).alias("bal_within_500"),
    )


@register(
    "window_analytic",
    # ppm integers, not round(x, 6): percent_rank/cume_dist are ratios of
    # small ints, which terminate in decimal (k/640) or are exactly dyadic
    # (k/1024) — both land EXACT .5 rounding ties where Spark (half-up)
    # and DuckDB (half-even) disagree.  floor has no tie rule: identical
    # doubles floor identically at every scale factor.
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT)
               AS pct_rank_ppm,
           CAST(floor(cume_dist()    OVER w * 1000000) AS BIGINT) AS cume_ppm,
           first_value(c_name)  OVER w AS richest,
           last_value(c_name)   OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND UNBOUNDED FOLLOWING) AS poorest
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def window_analytic(spark, d):
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return T(spark, d, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal",
        F.floor(F.percent_rank().over(w) * 1000000).cast("bigint")
        .alias("pct_rank_ppm"),
        F.floor(F.cume_dist().over(w) * 1000000).cast("bigint")
        .alias("cume_ppm"),
        F.first("c_name").over(w).alias("richest"),
        F.last("c_name").over(w_full).alias("poorest"),
    )


@register(
    "window_sessionize_batch",
    oracle="""
    WITH e AS (
        SELECT user_id, date_trunc('second', ts) AS tss FROM events
    ), flagged AS (
        SELECT user_id, tss,
               CASE WHEN tss - lag(tss) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tss)
    ), sess AS (
        SELECT user_id, tss,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY tss
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(date_diff('second', min(tss), max(tss)) AS BIGINT)
               AS duration_s
    FROM sess GROUP BY user_id, session_id
    """,
)
def window_sessionize_batch(spark, d):
    """Batch sessionization (gaps-and-islands): a session breaks after a
    30-minute silence; session ids come from a running sum of
    break-flags.  One shuffle on user_id serves both window passes and
    the final aggregate — the same partitioning is reused across all
    three operators."""
    from pyspark.sql import Window

    e = T(spark, d, "events").select(
        "user_id", F.date_trunc("second", "ts").alias("tss"))
    w = Window.partitionBy("user_id").orderBy("tss")
    flagged = e.withColumn(
        "new_session",
        F.when(F.unix_timestamp("tss")
               - F.unix_timestamp(F.lag("tss").over(w)) <= 1800, 0)
        .otherwise(1))
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (sess.groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n_events"),
                 (F.unix_timestamp(F.max("tss"))
                  - F.unix_timestamp(F.min("tss"))).alias("duration_s")))


@register(
    "window_time_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderpriority, CAST(o_orderdate AS VARCHAR) AS od,
           CAST(count(*) OVER w AS BIGINT) AS n_trailing_30d,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS sum_trailing_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
    """,
)
def window_time_range_frame(spark, d):
    """TIME-based RANGE frame: a trailing 30-day count and sum per
    priority class ordered by order date — the moving-window-over-time
    shape (rolling revenue, trailing error rates) that a numeric
    rangeBetween cannot express directly.  RANGE frames are value-based,
    so same-date peers share a frame and no tiebreak is needed for
    determinism; the windowed sum aggregates EXACT decimals and casts to
    double at the edge (the float-summation-order rule).  One shuffle on
    the partition key; the frame scan is the window sort both engines
    share."""
    T(spark, d, "orders").createOrReplaceTempView("orders_trf")
    return spark.sql("""
        SELECT o_orderkey, o_orderpriority,
               CAST(o_orderdate AS STRING) AS od,
               count(*) OVER w AS n_trailing_30d,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                    AS DOUBLE) AS sum_trailing_30d
        FROM orders_trf
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 30 DAYS PRECEDING
                               AND CURRENT ROW)
    """)


@register(
    "window_count_distinct",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(count(DISTINCT o_orderpriority) OVER
                (PARTITION BY o_custkey) AS BIGINT) AS n_distinct_prios
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def window_count_distinct(spark, d):
    """COUNT(DISTINCT) OVER a window — Spark refuses it natively
    (DISTINCT_WINDOW_FUNCTION_UNSUPPORTED), so this is the canonical
    composition: dense_rank the value within the partition and take the
    per-partition MAX of the rank, which equals the distinct count.
    DuckDB DOES support the native form, making it an exact oracle for
    the workaround.  Costs one extra window pass over the same
    partitioning (both windows share the shuffle); at 100 TB this is
    the difference between a supported plan and no plan at all."""
    from pyspark.sql import Window

    o = T(spark, d, "orders").filter(F.col("o_orderkey") <= 2000)
    w_rank = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    w_all = (Window.partitionBy("o_custkey")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    return (o.withColumn("_dr", F.dense_rank().over(w_rank))
            .withColumn("n_distinct_prios",
                        F.max("_dr").over(w_all))
            .select("o_custkey", "o_orderkey", "n_distinct_prios"))


@register(
    "window_distribution",
    oracle="""
    SELECT c_custkey, c_nationkey,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume,
           CAST(ntile(10) OVER w AS BIGINT) AS decile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def window_distribution(spark, d):
    """Distribution window functions (r12 — the last uncovered ranking
    family): percent_rank (rank-1)/(n-1), cume_dist rows<=current/n,
    and decile ntile over per-nation account balances.  ORDER BY
    carries the unique custkey tiebreaker so ntile's row-order
    dependence is deterministic on both engines (§5.3 discipline);
    percent_rank/cume_dist are tie-stable by definition but inherit
    the same ordering.  Emitted UNROUNDED: each value is one exact
    integer division, bit-identical IEEE cross-engine — the r12 sf0.1
    sweep caught round(...,6) flipping on exact binary halves (41/640
    = .0640625: Spark HALF_UP vs DuckDB half-even), the §5.3
    round-boundary class, and the single division needs no rounding at
    all.  One shuffle on the partition key + a per-partition sort —
    the canonical window scale shape."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return T(spark, d, "customer").select(
        "c_custkey", "c_nationkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(10).over(w).cast("bigint").alias("decile"),
    )
