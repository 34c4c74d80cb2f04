"""B-join queries (SURVEY.md §2): equi/outer/semi/anti/cross joins, the
flagship multiway star join, and the composed range / as-of / interval joins.

Scale notes (100 TB design point):
  * Dimension tables (region/nation/customer at warehouse scale: region and
    nation always, customer usually) are broadcast — no shuffle of the fact
    side.  `F.broadcast` is explicit where the optimizer's size estimate
    might miss; elsewhere AQE converts sort-merge → broadcast at runtime.
  * The as-of join avoids a per-key row explosion at scale by being
    expressible as the union/last-value window trick; at fixture scale the
    join+row_number form is used because it is oracle-checkable row for row.
    Both forms shuffle once on the join key.
  * Range/theta joins restrict the non-equi condition to a banded predicate
    so a real deployment can bucketize the band into an equi prefix
    (bucket join) instead of a nested-loop cross product.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..plans.registry import register
from ._util import T


@register(
    "join_inner_equi",
    oracle="""
    SELECT o.o_orderkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 100000
    """,
)
def join_inner_equi(spark, d):
    o = T(spark, d, "orders").filter(F.col("o_totalprice") > 100000)
    c = T(spark, d, "customer")
    return (o.join(c, o.o_custkey == c.c_custkey, "inner")
            .select("o_orderkey", "c_name", "o_totalprice"))


@register(
    "join_broadcast",
    oracle="""
    SELECT p.p_brand, count(*) AS cnt,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size < 15
    GROUP BY p.p_brand
    """,
)
def join_broadcast(spark, d):
    """Explicit broadcast-hash join: the part dimension ships to every
    executor; the lineitem fact side never shuffles for the join."""
    li = T(spark, d, "lineitem")
    p = T(spark, d, "part").filter(F.col("p_size") < 15)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("cnt"),
             F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("revenue"))
    )


@register(
    "join_multiway",
    oracle="""
    SELECT r.r_name, count(*) AS order_cnt,
           round(sum(o.o_totalprice), 2) AS total_price
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey   = c.c_custkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
)
def join_multiway(spark, d):
    """Flagship (t1 smoke, SURVEY.md §7.2): 4-table star join + hash agg +
    sort.  nation/region broadcast (25 and 5 rows — bounded by SCHEMA,
    not data volume, so the hint survives any scale-up); customer grows
    with the corpus, so its join carries no hint — AQE broadcasts it at
    runtime while it fits and switches to a custkey shuffle when it
    doesn't."""
    r = T(spark, d, "region")
    n = T(spark, d, "nation")
    c = T(spark, d, "customer")
    o = T(spark, d, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("order_cnt"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .orderBy("r_name")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    """,
)
def join_left_outer(spark, d):
    c = T(spark, d, "customer")
    o = T(spark, d, "orders")
    cond = (o.o_custkey == c.c_custkey) & (o.o_totalprice > 400000)
    return c.join(o, cond, "left").select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_right_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey
    FROM orders o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    """,
)
def join_right_outer(spark, d):
    c = T(spark, d, "customer")
    o = T(spark, d, "orders")
    cond = (o.o_custkey == c.c_custkey) & (o.o_orderpriority == "1-URGENT")
    return o.join(c, cond, "right").select("c_custkey", "c_name", "o_orderkey")


@register(
    "join_full_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM (SELECT * FROM customer WHERE c_nationkey < 8) c
    FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 250000) o
      ON o.o_custkey = c.c_custkey
    """,
)
def join_full_outer(spark, d):
    c = T(spark, d, "customer").filter(F.col("c_nationkey") < 8)
    o = T(spark, d, "orders").filter(F.col("o_totalprice") > 250000)
    return (c.join(o, o.o_custkey == c.c_custkey, "full")
            .select("c_custkey", "c_name", "o_orderkey", "o_totalprice"))


@register(
    "join_left_semi",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_left_semi(spark, d):
    c = T(spark, d, "customer")
    o = T(spark, d, "orders").filter(F.col("o_totalprice") > 300000)
    return (c.join(o, o.o_custkey == c.c_custkey, "left_semi")
            .select("c_custkey", "c_name"))


@register(
    "join_left_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_left_anti(spark, d):
    c = T(spark, d, "customer")
    o = T(spark, d, "orders").filter(F.col("o_totalprice") > 300000)
    return (c.join(o, o.o_custkey == c.c_custkey, "left_anti")
            .select("c_custkey", "c_name"))


@register(
    "join_cross_limited",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def join_cross_limited(spark, d):
    """Bounded cartesian product (5 × 25). At scale a cross join is only
    ever valid against a broadcast-sized side — same shape as here."""
    r = T(spark, d, "region").select("r_name")
    n = T(spark, d, "nation").select("n_name")
    return r.crossJoin(F.broadcast(n))


@register(
    "join_range_theta",
    oracle="""
    SELECT a.p_partkey AS pk_a, b.p_partkey AS pk_b, a.p_size AS size_a, b.p_size AS size_b
    FROM part a JOIN part b
      ON a.p_size BETWEEN b.p_size - 1 AND b.p_size
     AND a.p_partkey < b.p_partkey
     AND a.p_brand = b.p_brand
    """,
)
def join_range_theta(spark, d):
    """Banded non-equi join.  The equi component (p_brand) becomes the
    shuffle key so Spark plans a sort-merge/hash join with the band as a
    post-join filter — not a nested loop.  At 100 TB the band would instead
    be bucketized ((size div band) equi key) to keep the prefix equi."""
    p = T(spark, d, "part")
    a = p.alias("a")
    b = p.alias("b")
    cond = (
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & F.col("a.p_size").between(F.col("b.p_size") - 1, F.col("b.p_size"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey"))
    )
    return a.join(b, cond).select(
        F.col("a.p_partkey").alias("pk_a"), F.col("b.p_partkey").alias("pk_b"),
        F.col("a.p_size").alias("size_a"), F.col("b.p_size").alias("size_b"),
    )


# --- as-of join family -----------------------------------------------------
#
# The fixtures place all orders in 1995-2001 and all events in Jan-2024, so
# comparing the raw timelines is vacuous (r7 judge: the forward join's green
# row was 0 rows on both engines, and the backward join's time cut never
# discriminated).  Both directions therefore PROJECT the order timeline onto
# the events epoch with deterministic, timezone-free integer arithmetic that
# DuckDB replays verbatim:
#
#   day_off = datediff(day, 1995-01-01, o_orderdate)          -- 0..2404
#   t       = 2024-01-01 + (day_off % 30) days
#                        + ((day_off * 977) % 86400) seconds
#
# Distinct order DATES map to distinct instants (day_off collisions need
# day_off deltas of 30*2880 days — far outside the fixture range, since
# gcd(977, 2880) = 1) while same-date orders collide exactly, so the
# o_orderkey tie-break is genuinely exercised; the projected instants spread
# uniformly across the events month, so each event's match varies with its
# timestamp in both directions.  Event times are second-truncated (parquet
# ns vs Spark µs, SURVEY.md §5.3), which also lets events land exactly ON
# projected order instants and exercise the inclusive-vs-strict bound.
#
# NULL discipline (r7 advice): rows with a NULL join key or NULL time are
# filtered explicitly on BOTH inputs — SQL's inner-join comparison semantics
# drop them in the oracle, and without the filter the union/window trick
# would mis-handle them (a NULL-t order sorts to the frame edge where
# first/last ignorenulls can still pick it up; NULL user_ids from the two
# inputs would share a window partition and wrongly match each other).

_ASOF_ORACLE_INPUTS = """
    WITH e AS (
        SELECT event_id, user_id, date_trunc('second', ts) AS t
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), o AS (
        SELECT o_custkey AS user_id,
               TIMESTAMP '2024-01-01 00:00:00'
                 + (datediff('day', DATE '1995-01-01', o_orderdate) % 30)
                   * INTERVAL 1 DAY
                 + ((datediff('day', DATE '1995-01-01', o_orderdate) * 977) % 86400)
                   * INTERVAL 1 SECOND AS t,
               o_orderkey, o_totalprice
        FROM orders WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    )
"""

_ASOF_PROJ_EXPR = (
    "timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, "
    "datediff(o_orderdate, date'1995-01-01') % 30, 0, 0, "
    "(datediff(o_orderdate, date'1995-01-01') * 977) % 86400)")


def _asof_inputs(spark, d):
    """(events, orders) inputs shared by both as-of directions: null-safe,
    second-truncated event times, orders projected onto the events epoch."""
    e = (T(spark, d, "events")
         .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
         .select("event_id", "user_id",
                 F.date_trunc("second", "ts").alias("t")))
    o = (T(spark, d, "orders")
         .filter(F.col("o_custkey").isNotNull()
                 & F.col("o_orderdate").isNotNull())
         .select(F.col("o_custkey").alias("user_id"),
                 F.expr(_ASOF_PROJ_EXPR).alias("t"),
                 "o_orderkey", "o_totalprice"))
    return e, o


def _asof_tagged_union(e, o, ord_cols):
    """Shared union encoding for the as-of family: orders tagged 0 with
    an ``ord`` struct of ``ord_cols``, events tagged 1 with a null
    struct — ONE relation a per-user window can sweep.  Kept in one
    place so the encoding (tag ordering, null casts) cannot diverge
    across the three as-of queries (r8 review)."""
    tagged_o = o.select(
        "user_id", "t", F.lit(0).alias("tag"),
        F.lit(None).cast(dict(e.dtypes)["event_id"]).alias("event_id"),
        F.struct(*ord_cols).alias("ord"))
    ord_type = tagged_o.schema["ord"].dataType.simpleString()
    tagged_e = e.select(
        "user_id", "t", F.lit(1).alias("tag"), "event_id",
        F.lit(None).cast(ord_type).alias("ord"))
    return tagged_o.unionByName(tagged_e)


def _asof_union_window(e, o, direction):
    """The union/edge-value window trick shared by both directions.
    ``direction`` is "backward" (latest order at-or-before, max-key ties)
    or "forward" (earliest order strictly-after, min-key ties)."""
    u = _asof_tagged_union(e, o, ["o_orderkey", "o_totalprice"])
    # Orders sort before events at equal t (tag 0 < 1): the backward
    # preceding frame thereby INCLUDES same-instant orders (<= bound) and
    # the forward following frame EXCLUDES them (strict > bound).
    w = Window.partitionBy("user_id").orderBy(
        "t", "tag", F.col("ord.o_orderkey").asc_nulls_first())
    if direction == "backward":
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = F.last("ord", ignorenulls=True)
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = F.first("ord", ignorenulls=True)
    return (u.withColumn("m", pick.over(w))
            .filter((F.col("tag") == 1) & F.col("m").isNotNull())
            .select("event_id", "user_id",
                    F.col("m.o_orderkey").alias("o_orderkey"),
                    F.col("m.o_totalprice").alias("o_totalprice")))


@register(
    "join_asof",
    oracle=_ASOF_ORACLE_INPUTS + """
    SELECT event_id, user_id, o_orderkey, o_totalprice FROM (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.t DESC, o.o_orderkey DESC) AS rn
        FROM e JOIN o ON o.user_id = e.user_id AND o.t <= e.t
    ) WHERE rn = 1
    """,
)
def join_asof(spark, d):
    """As-of join: each event matched to the latest order of its user at or
    before the event time (ties on the instant resolve to the MAX order
    key, which the ascending key order + last() delivers).  Spark has no
    native DataFrame as-of join; this uses the union/last-value window
    trick — ONE shuffle on the user key and no event x candidate-orders
    pair explosion, unlike the join+row_number composition the oracle
    uses (fine at oracle scale only).  DuckDB's native ASOF JOIN leaves
    timestamp ties ambiguous, hence the row_number oracle.  See the
    timeline-projection note above ``_ASOF_ORACLE_INPUTS``."""
    e, o = _asof_inputs(spark, d)
    return _asof_union_window(e, o, "backward")


@register(
    "join_interval",
    oracle="""
    SELECT a.event_id AS eid_a, b.event_id AS eid_b
    FROM (SELECT event_id, user_id, date_trunc('second', ts) AS tss FROM events) a
    JOIN (SELECT event_id, user_id, date_trunc('second', ts) AS tss FROM events) b
      ON a.user_id = b.user_id
     AND b.tss > a.tss
     AND b.tss <= a.tss + INTERVAL 1 HOUR
    """,
)
def join_interval(spark, d):
    """Interval join: pairs of same-user events within a 1-hour window.
    Equi key (user_id) drives the shuffle; the time band is a residual
    predicate, so the plan stays a hash/sort-merge join at scale (the band
    can be bucketized into the equi key for very hot users).  Timestamps are
    second-truncated in-plan: events.ts is ns in parquet, µs in Spark
    (SURVEY.md §5.3), and truncation makes both engines see equal values."""
    e = T(spark, d, "events").select(
        "event_id", "user_id", F.date_trunc("second", "ts").alias("tss"))
    a, b = e.alias("a"), e.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.tss") > F.col("a.tss"))
        & (F.col("b.tss") <= F.col("a.tss") + F.expr("INTERVAL 1 HOUR"))
    )
    return a.join(b, cond).select(
        F.col("a.event_id").alias("eid_a"), F.col("b.event_id").alias("eid_b"))


def bucketed_interval_join(points, intervals, p_ts="tss", i_lo="i_tss",
                           i_len_expr="INTERVAL 2 HOURS",
                           bucket="hour"):
    """Generic no-equi-key point-in-interval join as a hash EQUI-join:
    intervals explode to every `bucket`-granularity bucket they cover,
    points map to their single bucket, equi-join on the bucket, exact
    residual filter.  Each qualifying pair meets in exactly one bucket
    (the point's), so the result needs no dedup.  Returns the joined
    frame with all point and interval columns."""
    ilen = F.expr(i_len_expr)
    iv = intervals.withColumn("bkt", F.explode(F.sequence(
        F.date_trunc(bucket, F.col(i_lo)),
        F.date_trunc(bucket, F.col(i_lo) + ilen),
        F.expr(f"INTERVAL 1 {bucket.upper()}"))))
    pt = points.withColumn("bkt", F.date_trunc(bucket, F.col(p_ts)))
    return (pt.join(iv, "bkt")
            .filter((F.col(p_ts) >= F.col(i_lo))
                    & (F.col(p_ts) < F.col(i_lo) + ilen))
            .drop("bkt"))



@register(
    "join_interval_bucketed",
    oracle="""
    WITH e AS (SELECT event_id, user_id, event_type, value,
                      date_trunc('second', ts) AS tss FROM events),
    inc AS (SELECT event_id AS incident_id, tss AS i_tss
            FROM e WHERE event_type = 'error' AND value >= 150)
    SELECT incident_id, CAST(i_tss AS VARCHAR) AS window_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM e JOIN inc
      ON e.tss >= i_tss AND e.tss < i_tss + INTERVAL 2 HOUR
    GROUP BY 1, 2
    """,
)
def join_interval_bucketed(spark, d):
    """Point-in-interval join with NO equi key, in its 100 TB-safe
    bucketized form — the pattern join_range_theta's docstring promises:
    every incident window ([error ts, +2h)) explodes to the hour buckets
    it covers, every event maps to its single hour bucket, and the join
    becomes a plain hash EQUI-join on the bucket with the exact interval
    predicate as a residual filter.  Each qualifying (event, incident)
    pair meets in exactly one bucket — the event's own hour — so no
    post-join dedup is needed.  A naive formulation of the same query is
    a BroadcastNestedLoopJoin: O(events x incidents) compared
    everywhere; bucketing makes the cost sum-per-bucket(|points| x
    |intervals|), tunable by bucket width.  Output aggregates per
    incident (blast-radius report: events + distinct users inside each
    window), keeping result size O(incidents)."""
    e = T(spark, d, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.date_trunc("second", "ts").alias("tss"))
    inc = (e.filter((F.col("event_type") == "error") & (F.col("value") >= 150))
           .select(F.col("event_id").alias("incident_id"),
                   F.col("tss").alias("i_tss")))
    j = bucketed_interval_join(e.select("event_id", "user_id", "tss"), inc)
    return (j.groupBy("incident_id",
                      F.col("i_tss").cast("string").alias("window_start"))
            .agg(F.count("*").alias("n_events"),
                 F.countDistinct("user_id").alias("n_users")))


@register(
    "join_asof_forward",
    oracle=_ASOF_ORACLE_INPUTS + """
    SELECT event_id, user_id, o_orderkey, o_totalprice FROM (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.t ASC, o.o_orderkey ASC) AS rn
        FROM e JOIN o ON o.user_id = e.user_id AND o.t > e.t
    ) WHERE rn = 1
    """,
)
def join_asof_forward(spark, d):
    """Forward as-of join — each event matched to the EARLIEST order of
    its user STRICTLY AFTER the event time (the "next scheduled thing"
    direction; join_asof is the backward at-or-before twin).  Same
    union/first-value window trick, mirrored: orders sort BEFORE events
    at equal time so the strict > bound excludes same-instant orders
    from the forward frame, and o_orderkey ascending resolves
    same-instant ties to the MIN key.  ONE shuffle on the user key, no
    event x candidate-orders explosion — the oracle's join+row_number
    formulation IS exploding, fine at oracle scale only.  See the
    timeline-projection note above ``_ASOF_ORACLE_INPUTS``."""
    e, o = _asof_inputs(spark, d)
    return _asof_union_window(e, o, "forward")


@register(
    "join_asof_nearest",
    oracle=_ASOF_ORACLE_INPUTS + """
    SELECT event_id, user_id, o_orderkey, o_totalprice,
           CAST(dt AS BIGINT) AS dt_s
    FROM (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
               abs(datediff('second', e.t, o.t)) AS dt,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY abs(datediff('second', e.t, o.t)) ASC,
                            o.t ASC, o.o_orderkey ASC) AS rn
        FROM e JOIN o ON o.user_id = e.user_id
    ) WHERE rn = 1
    """,
)
def join_asof_nearest(spark, d):
    """Nearest as-of join — each event matched to its user's order
    CLOSEST in time, either direction (ties: the earlier order, then
    the MIN key).  Composition of the two directional window tricks in
    ONE shuffle: the tagged union is sorted once per user and two
    window frames over that single sort pick the backward (latest <=,
    min key among same-instant ties via key-descending order + last)
    and forward (earliest >, min key via key-ascending + first)
    candidates; a scalar comparison then keeps the closer.  The oracle
    is the exploding join+row_number form, fine at oracle scale only.
    Second-granularity times on both engines make the |dt| comparison
    integer-exact.  See the projection note above
    ``_ASOF_ORACLE_INPUTS``."""
    e, o = _asof_inputs(spark, d)
    return _asof_nearest_kernel(e, o)


def _asof_nearest_kernel(e, o):
    """Single-shuffle nearest-in-time pick (see join_asof_nearest)."""
    u = _asof_tagged_union(e, o, ["t", "o_orderkey", "o_totalprice"])
    # one sort serves both frames; backward orders key-DESC inside a
    # timestamp so last() lands on the MIN key (matching the oracle's
    # o_orderkey ASC tie-break), forward orders key-ASC for first()
    wb = (Window.partitionBy("user_id")
          .orderBy("t", "tag", F.col("ord.o_orderkey").desc_nulls_last())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy("user_id")
          .orderBy("t", "tag", F.col("ord.o_orderkey").asc_nulls_first())
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    ev = (u.withColumn("b", F.last("ord", ignorenulls=True).over(wb))
          .withColumn("f", F.first("ord", ignorenulls=True).over(wf))
          .filter(F.col("tag") == 1)
          .filter(F.col("b").isNotNull() | F.col("f").isNotNull()))
    ts = F.col("t").cast("long")
    db = ts - F.col("b.t").cast("long")
    df_ = F.col("f.t").cast("long") - ts
    take_b = F.col("f").isNull() | (F.col("b").isNotNull() & (db <= df_))
    pick = F.when(take_b, F.col("b")).otherwise(F.col("f"))
    return ev.select(
        "event_id", "user_id",
        pick["o_orderkey"].alias("o_orderkey"),
        pick["o_totalprice"].alias("o_totalprice"),
        F.when(take_b, db).otherwise(df_).cast("bigint").alias("dt_s"))


@register(
    "join_null_safe",
    oracle="""
    WITH c AS (SELECT c_custkey, c_nationkey,
                      nullif(c_custkey % 50, 7) AS k
               FROM customer),
         o AS (SELECT o_orderkey, nullif(o_custkey % 50, 7) AS k
               FROM orders)
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_matches,
           CAST(sum(CASE WHEN c.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_matches
    FROM c JOIN o ON c.k IS NOT DISTINCT FROM o.k
    GROUP BY c.c_nationkey
    """,
)
def join_null_safe(spark, d):
    """NULL-safe equi-join (r12; the <=> / IS NOT DISTINCT FROM
    semantics the join family still lacked): both sides derive a key
    that is NULL for one residue class, and the join must match
    NULL-to-NULL — a plain equality would silently drop exactly those
    rows, which is the classic bug when a nullable business key feeds
    a join.  The per-nation match counts split out how many matches
    came through the NULL channel, so a wrong NULL semantics fails on
    values, not just totals.

    Scale shape: Spark plans <=> as an ordinary hash join (EqualNullSafe
    is a deterministic key expression — NULL hashes like any value), so
    this shuffles once on the key like join_inner_equi; the NULL class
    is one hash bucket, a documented skew risk when NULLs dominate —
    the salting of join_skew_salted applies unchanged."""
    c = T(spark, d, "customer").select(
        "c_custkey", "c_nationkey",
        F.nullif(F.col("c_custkey") % 50, F.lit(7)).alias("ck"))
    o = T(spark, d, "orders").select(
        "o_orderkey", F.nullif(F.col("o_custkey") % 50, F.lit(7)).alias("ok"))
    return (c.join(o, c["ck"].eqNullSafe(o["ok"]))
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("n_matches"),
                 F.sum(F.when(F.col("ck").isNull(), 1).otherwise(0))
                 .cast("bigint").alias("n_null_matches")))


@register(
    "join_spatial_grid",
    oracle="""
    WITH pts AS (
        SELECT c_custkey AS k,
               (CAST(concat('0x', substring(md5(concat(CAST(c_custkey AS
                    VARCHAR), 'x')), 1, 8)) AS BIGINT) % 100000) / 1000.0
                   AS x,
               (CAST(concat('0x', substring(md5(concat(CAST(c_custkey AS
                    VARCHAR), 'y')), 1, 8)) AS BIGINT) % 100000) / 1000.0
                   AS y
        FROM customer
    ), cells AS (
        SELECT k, x, y,
               CAST(floor(x) AS BIGINT) AS cx, CAST(floor(y) AS BIGINT) AS cy
        FROM pts
    )
    SELECT a.k AS key_a, b.k AS key_b,
           round(sqrt((a.x - b.x) * (a.x - b.x)
                      + (a.y - b.y) * (a.y - b.y)), 4) + 0 AS dist
    FROM cells a, (SELECT unnest([-1, 0, 1]) AS dx) dxs,
         (SELECT unnest([-1, 0, 1]) AS dy) dys, cells b
    WHERE b.cx = a.cx + dxs.dx AND b.cy = a.cy + dys.dy
      AND a.k < b.k
      AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 1.0
    """,
)
def join_spatial_grid(spark, d):
    """Grid-bucketed spatial radius self-join (r12): all customer pairs
    within Euclidean distance 1.0 on a synthetic 100x100 plane (coords
    md5-derived from the key — deterministic, uniform, replayable on
    any engine).  The scale pattern every geo engine uses: bucket
    points into r-sized grid cells, replicate ONE side to its 3x3
    neighbor cells, hash-join on cell id, then exact-distance filter —
    candidate volume is n * (local density), never the n^2 cross
    product, and the join is a plain shuffled equi-join on (cx, cy).
    The a.k < b.k guard dedups: a replica lands in exactly one target
    cell, so each pair is tested once.  Coordinates and squared
    distances are identical IEEE expressions on both engines; the
    (0, 1] rounding guard applies only to the reported sqrt.

    100 TB: same plan — cell ids partition-prune, the 9x replication
    is of the smaller/denser-filtered side, skewed megacells fall to
    the salted-join recipe."""
    pts = T(spark, d, "customer").select(
        F.col("c_custkey").alias("k"),
        ((F.conv(F.substring(F.md5(F.concat(F.col("c_custkey").cast("string"),
                                            F.lit("x"))), 1, 8), 16, 10)
          .cast("bigint") % 100000) / 1000.0).alias("x"),
        ((F.conv(F.substring(F.md5(F.concat(F.col("c_custkey").cast("string"),
                                            F.lit("y"))), 1, 8), 16, 10)
          .cast("bigint") % 100000) / 1000.0).alias("y"))
    cells = pts.select(
        "k", "x", "y",
        F.floor("x").cast("bigint").alias("cx"),
        F.floor("y").cast("bigint").alias("cy"))
    a = (cells
         .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
         .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
         .select(F.col("k").alias("key_a"), F.col("x").alias("xa"),
                 F.col("y").alias("ya"),
                 (F.col("cx") + F.col("dx")).alias("jx"),
                 (F.col("cy") + F.col("dy")).alias("jy")))
    b = cells.select(F.col("k").alias("key_b"), F.col("x").alias("xb"),
                     F.col("y").alias("yb"), F.col("cx").alias("jx"),
                     F.col("cy").alias("jy"))
    d2 = ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
          + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
    return (a.join(b, ["jx", "jy"])
            .filter((F.col("key_a") < F.col("key_b")) & (d2 <= 1.0))
            .select("key_a", "key_b",
                    (F.round(F.sqrt(d2), 4) + F.lit(0.0)).alias("dist")))


@register(
    "join_asof_tolerance",
    oracle=_ASOF_ORACLE_INPUTS + """
    SELECT event_id, user_id,
           CASE WHEN ok THEN o_orderkey END AS o_orderkey,
           CASE WHEN ok THEN gap_s END AS gap_s
    FROM (
        SELECT e.event_id, e.user_id, o.o_orderkey,
               CAST(date_diff('second', o.t, e.t) AS BIGINT) AS gap_s,
               o.t >= e.t - INTERVAL 2 DAY AS ok,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.t DESC, o.o_orderkey DESC) AS rn
        FROM e LEFT JOIN o ON o.user_id = e.user_id AND o.t <= e.t
    ) WHERE rn = 1
    """,
)
def join_asof_tolerance(spark, d):
    """As-of join with a match tolerance (r12; pandas
    ``merge_asof(tolerance=...)``): each event takes its user's latest
    order at-or-before the event time ONLY if that order is within 2
    days — a staler match is worse than none (the feature-freshness
    rule every point-in-time feature store enforces).  LEFT semantics:
    every event emits exactly one row; out-of-tolerance and unmatched
    events carry NULLs.  Completes the as-of family
    (backward/forward/nearest/tolerance).

    Same single-shuffle union/last-value window plan as join_asof (the
    matched order's own timestamp rides inside the picked struct, so
    the tolerance check is a post-window narrow map — no second join);
    the oracle is the exploding LEFT join + row_number form."""
    e, o = _asof_inputs(spark, d)
    u = _asof_tagged_union(e, o, ["o_orderkey", "o_totalprice", "t"])
    w = (Window.partitionBy("user_id")
         .orderBy("t", "tag", F.col("ord.o_orderkey").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    picked = (u.withColumn("m", F.last("ord", ignorenulls=True).over(w))
              .filter(F.col("tag") == 1))
    ok = F.col("m.t") >= F.col("t") - F.expr("INTERVAL 2 DAYS")
    return picked.select(
        "event_id", "user_id",
        F.when(ok, F.col("m.o_orderkey")).alias("o_orderkey"),
        F.when(ok, (F.unix_timestamp("t") - F.unix_timestamp("m.t"))
               .cast("bigint")).alias("gap_s"))
