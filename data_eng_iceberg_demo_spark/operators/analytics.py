"""Event-analytics operators over the `events` stream fixture: ordered
funnel conversion and cohort retention — the two classic product-analytics
shapes a warehouse engine is asked for at scale.

Scale notes: every stage keys on user_id, so ONE hash partitioning is
reused across all joins and aggregates (no re-shuffle between stages);
funnel stages shrink monotonically, and the cohort matrix output is
O(days²) regardless of event volume.  events.ts is date_trunc'd per the
registry discipline (parquet ns vs Spark µs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..plans.registry import register
from ._util import T

# Heavy-hour guard for events_graph_triangles (r13): hours with more
# co-active purchasers than this keep a deterministic hash-threshold
# sample of ~this many participants before the pair-building self-join,
# bounding per-hour pair expansion at ~CAP^2 (the llm_dedup_minhash
# hot-band discipline applied to the co-occurrence edge build).  The
# oracle mirrors the rule bit-for-bit; on driver fixtures no hour comes
# within 20x of the cap, so fixture hashes are unchanged (pytest-pinned
# by test_triangle_hour_cap_is_noop_on_fixtures).
TRI_HOUR_CAP = 1024


def _events(spark, d):
    return T(spark, d, "events").select(
        "user_id", "event_type",
        F.date_trunc("second", "ts").alias("tss"))


@register(
    "events_funnel",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, date_trunc('second', ts) AS tss
        FROM events
    ), v AS (
        SELECT user_id, min(tss) AS t_view FROM e
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.tss) AS t_click
        FROM e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.tss > v.t_view
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.tss) AS t_purchase
        FROM e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.tss > c.t_click
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS stage_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS stage_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS stage_purchase
    """,
)
def events_funnel(spark, d):
    """Ordered funnel view -> click -> purchase: a user converts a stage
    only with an event strictly AFTER their previous-stage time.  Each
    stage is min-timestamp aggregate + equi-join on user_id; the user
    set shrinks at every stage, and all stages share one user_id
    partitioning — no re-shuffle between them."""
    e = _events(spark, d)
    v = (e.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("tss").alias("t_view")))
    c = (e.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(F.col("tss") > F.col("t_view"))
         .groupBy("user_id").agg(F.min("tss").alias("t_click")))
    p = (e.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(F.col("tss") > F.col("t_click"))
         .groupBy("user_id").agg(F.min("tss").alias("t_purchase")))
    counts = [df.agg(F.count("*").alias(alias))
              for df, alias in ((v, "stage_view"), (c, "stage_click"),
                                (p, "stage_purchase"))]
    return counts[0].crossJoin(counts[1]).crossJoin(counts[2])


@register(
    "events_cohort_retention",
    oracle="""
    WITH e AS (
        SELECT user_id, CAST(date_trunc('second', ts) AS DATE) AS d
        FROM events
    ), first AS (
        SELECT user_id, min(d) AS cohort_day FROM e GROUP BY user_id
    )
    SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
           CAST(date_diff('day', f.cohort_day, e.d) AS BIGINT) AS day_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM e JOIN first f ON e.user_id = f.user_id
    GROUP BY f.cohort_day, date_diff('day', f.cohort_day, e.d)
    """,
)
def events_cohort_retention(spark, d):
    """Cohort retention matrix: users grouped by their first-activity
    day, counted distinct on each later day offset.  The first-touch
    aggregate and the retention count share the user_id partitioning;
    the output is bounded by days x days however large the event log —
    the shape that stays cheap at 100 TB."""
    e = T(spark, d, "events").select(
        "user_id", F.date_trunc("second", "ts").cast("date").alias("day"))
    first = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (e.join(first, "user_id")
            .groupBy(F.col("cohort_day"),
                     F.datediff("day", "cohort_day").alias("day_offset"))
            .agg(F.count_distinct("user_id").alias("n_users"))
            .select(F.col("cohort_day").cast("string").alias("cohort_day"),
                    F.col("day_offset").cast("bigint").alias("day_offset"),
                    "n_users"))


@register(
    "events_top_paths",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, date_trunc('second', ts) AS tss,
               event_id
        FROM events
    ), seq AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id)
    )
    SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 10
    """,
)
def events_top_paths(spark, d):
    """Path mining: the 10 most common 3-step event sequences.  lead()
    windows over the per-user timeline (event_id tiebreak keeps ties
    deterministic), then a count per trigram — one user_id shuffle for
    the window, one tiny aggregate, top-10 without a global sort."""
    from pyspark.sql import Window

    e = T(spark, d, "events").select(
        "user_id", "event_type",
        F.date_trunc("second", "ts").alias("tss"), "event_id")
    w = Window.partitionBy("user_id").orderBy("tss", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"))
    return (seq.filter(F.col("e3").isNotNull())
            .select(F.concat_ws(" > ", "event_type", "e2", "e3").alias("path"))
            .groupBy("path").agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), F.col("path"))
            .limit(10))


@register(
    "events_anomaly",
    oracle="""
    WITH stats AS (
        SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round(CAST(e.value AS DOUBLE), 2) AS value,
           round((e.value - s.mu) / s.sd, 2) AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs(e.value - s.mu) > 3 * s.sd
    """,
)
def events_anomaly(spark, d):
    """Z-score outlier detection per event type: one tiny per-type
    moments aggregate (5 rows) broadcast back onto the stream — the full
    scan is filtered in place, and only outliers survive.  At 100 TB the
    stats side is always broadcastable (one row per event type) so the
    event log never shuffles."""
    e = T(spark, d, "events")
    stats = (e.groupBy("event_type")
             .agg(F.avg("value").alias("mu"),
                  F.stddev_samp("value").alias("sd")))
    return (e.join(F.broadcast(stats), "event_type")
            .filter(F.abs(F.col("value") - F.col("mu")) > 3 * F.col("sd"))
            .select("event_id", "event_type",
                    F.round(F.col("value").cast("double"), 2).alias("value"),
                    F.round((F.col("value") - F.col("mu")) / F.col("sd"), 2)
                    .alias("zscore")))


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY date_trunc('second', ts),
                                              event_id) AS prev_type
        FROM events
    ), cnt AS (
        SELECT prev_type, event_type, count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ), tot AS (
        SELECT prev_type, sum(n) AS t FROM cnt GROUP BY prev_type
    )
    SELECT cnt.prev_type, cnt.event_type, CAST(n AS BIGINT) AS n,
           round(n * 1.0 / t, 4) AS p
    FROM cnt JOIN tot USING (prev_type)
    """,
)
def events_transition_matrix(spark, d):
    """First-order Markov transition matrix over per-user event
    timelines: P(next event type | current) with observation counts —
    the journey model behind next-action prediction and anomaly scoring
    on clickstreams.  One user_id shuffle for the lag window (event_id
    tiebreak keeps same-second orderings deterministic), one tiny
    (prev, next) aggregate, and the per-row totals join runs over at
    most |event_types|^2 rows — nothing downstream of the window scales
    with the corpus.  Probabilities are identically-rounded ratios of
    small integers on both engines."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.date_trunc("second", "ts"), "event_id")
    seq = (T(spark, d, "events")
           .select("user_id", "event_type",
                   F.lag("event_type").over(w).alias("prev_type"))
           .filter(F.col("prev_type").isNotNull()))
    cnt = seq.groupBy("prev_type", "event_type").agg(F.count("*").alias("n"))
    tot = cnt.groupBy("prev_type").agg(F.sum("n").alias("t"))
    return (cnt.join(tot, "prev_type")
            .select("prev_type", "event_type", "n",
                    F.round(F.col("n") * 1.0 / F.col("t"), 4).alias("p")))


@register(
    "events_attribution",
    oracle="""
    WITH e AS (SELECT event_id, user_id, event_type,
                      date_trunc('second', ts) AS tss FROM events),
    p AS (SELECT event_id AS pe, user_id, tss AS pts
          FROM e WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS ce, user_id, tss AS cts
          FROM e WHERE event_type = 'click'),
    pairs AS (
        SELECT pe, ce, cts,
               row_number() OVER (PARTITION BY pe
                                  ORDER BY cts, ce) AS rn_first,
               row_number() OVER (PARTITION BY pe
                                  ORDER BY cts DESC, ce DESC) AS rn_last,
               count(*) OVER (PARTITION BY pe) AS n_clicks
        FROM p JOIN c USING (user_id)
        WHERE cts <= pts AND cts > pts - INTERVAL 3 DAY
    )
    SELECT f.pe AS purchase_id,
           f.ce AS first_touch_click, l.ce AS last_touch_click,
           CAST(f.n_clicks AS BIGINT) AS n_clicks_3d
    FROM (SELECT * FROM pairs WHERE rn_first = 1) f
    JOIN (SELECT * FROM pairs WHERE rn_last = 1) l USING (pe)
    """,
)
def events_attribution(spark, d):
    """Marketing attribution: each purchase credited to the user's FIRST
    and LAST click inside a 3-day lookback, plus the click count — the
    first-touch/last-touch pair every attribution model starts from.

    Scale shape: clicks and purchases co-partition on user_id, the
    lookback is an equi-join with a range residual (at 100 TB the
    residual join would ride bucketed_interval_join's hour buckets),
    and first/last resolve as min/max over (tss, event_id) STRUCTS in
    one aggregation — no row_number re-shuffle, and the struct ordering
    gives both engines the same tiebreak on same-second clicks."""
    e = T(spark, d, "events").select(
        "event_id", "user_id", "event_type",
        F.date_trunc("second", "ts").alias("tss"))
    p = (e.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("pe"), "user_id",
                 F.col("tss").alias("pts")))
    c = (e.filter(F.col("event_type") == "click")
         .select(F.col("event_id").alias("ce"), "user_id",
                 F.col("tss").alias("cts")))
    pairs = (p.join(c, "user_id")
             .filter((F.col("cts") <= F.col("pts"))
                     & (F.col("cts") > F.col("pts")
                        - F.expr("INTERVAL 3 DAYS"))))
    touch = F.struct("cts", "ce")
    return (pairs.groupBy("pe")
            .agg(F.min(touch).alias("ft"), F.max(touch).alias("lt"),
                 F.count("*").alias("n_clicks_3d"))
            .select(F.col("pe").alias("purchase_id"),
                    F.col("ft.ce").alias("first_touch_click"),
                    F.col("lt.ce").alias("last_touch_click"),
                    "n_clicks_3d"))


@register(
    "events_rolling_dau",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        FROM events
    ), days AS (SELECT DISTINCT day FROM du)
    SELECT CAST(d.day AS VARCHAR) AS day,
           CAST(count(DISTINCT u.user_id) AS BIGINT) AS rolling_7d_users
    FROM days d JOIN du u
      ON u.day <= d.day AND u.day > d.day - 7
    GROUP BY d.day
    """,
)
def events_rolling_dau(spark, d):
    """Rolling 7-day distinct active users per day — the windowed
    DISTINCT aggregation that does NOT decompose into a running frame
    (yesterday's window shares users with today's).  The scalable form:
    reduce to distinct (day, user) pairs first (one shuffle, corpus
    collapses to activity pairs), EXPLODE each pair onto the <=7 report
    days it contributes to (a bounded fan-out map, day+0..day+6), and
    count distinct users per report day — cost is O(pairs x 7), never a
    per-day rescan, and no state grows with history.  Report days are
    restricted to observed activity days (join semantics in both
    engines)."""
    du = (T(spark, d, "events")
          .select(F.to_date(F.date_trunc("day", "ts")).alias("day"),
                  "user_id")
          .distinct())
    # rename before the derived self-join so lineage stays unambiguous
    days = du.select(F.col("day").alias("report_day")).distinct()
    contrib = du.select(
        "user_id",
        F.explode(F.sequence(F.col("day"),
                             F.date_add(F.col("day"), 6))).alias("rday"))
    return (contrib.join(days, contrib.rday == days.report_day)
            .groupBy(F.col("report_day").cast("string").alias("day"))
            .agg(F.countDistinct("user_id").alias("rolling_7d_users")))


@register(
    "events_streaks",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, event_type,
               date_trunc('second', ts) AS tss
        FROM events
    ), marked AS (
        SELECT user_id, event_id, event_type, tss,
               CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id)
    ), ids AS (
        SELECT user_id, event_type,
               sum(chg) OVER (PARTITION BY user_id ORDER BY tss, event_id
                              ROWS UNBOUNDED PRECEDING) AS streak_id
        FROM marked
    ), streaks AS (
        SELECT user_id, event_type, streak_id,
               count(*) AS len
        FROM ids GROUP BY user_id, event_type, streak_id
    ), ranked AS (
        SELECT user_id, event_type, len,
               count(*) OVER (PARTITION BY user_id) AS n_streaks,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY len DESC, streak_id ASC,
                                           event_type ASC) AS rn
        FROM streaks
    )
    SELECT user_id, CAST(n_streaks AS BIGINT) AS n_streaks,
           CAST(len AS BIGINT) AS max_streak_len,
           event_type AS top_streak_type
    FROM ranked WHERE rn = 1
    """,
)
def events_streaks(spark, d):
    """Gaps-and-islands: per user, maximal runs ("streaks") of
    consecutive same-type events in timeline order, reporting streak
    count, longest streak and its type (ties: earliest streak, then
    type).  The island id is a running SUM of type-change indicators
    over ONE user_id window — not the classic rn-minus-rn trick, which
    needs a second (user, type) partitioning and therefore a second
    shuffle; this form keeps the whole detection on a single user_id
    exchange, with the streak rollup and the per-user pick riding the
    same partitioning.  Timeline order is (tss, event_id) — the
    truncated-second tiebreak discipline of SURVEY.md §5.3."""
    from pyspark.sql import Window

    e = T(spark, d, "events").select(
        "user_id", "event_id", "event_type",
        F.date_trunc("second", "ts").alias("tss"))
    w = Window.partitionBy("user_id").orderBy("tss", "event_id")
    # eqNullSafe mirrors the oracle's IS DISTINCT FROM exactly: a NULL
    # type following a non-NULL one is a change, NULL-after-NULL is not
    # (the null-unsafe != plus isNull form got both wrong — r6 ADVICE).
    marked = e.withColumn(
        "chg", F.when(~F.lag("event_type").over(w)
                      .eqNullSafe(F.col("event_type")), 1).otherwise(0))
    ids = marked.withColumn(
        "streak_id", F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    streaks = (ids.groupBy("user_id", "event_type", "streak_id")
               .agg(F.count("*").alias("len")))
    wu = Window.partitionBy("user_id")
    ranked = (streaks
              .withColumn("n_streaks", F.count("*").over(wu))
              .withColumn("rn", F.row_number().over(
                  wu.orderBy(F.col("len").desc(), F.col("streak_id").asc(),
                             F.col("event_type").asc()))))
    return (ranked.filter(F.col("rn") == 1)
            .select("user_id", "n_streaks",
                    F.col("len").alias("max_streak_len"),
                    F.col("event_type").alias("top_streak_type")))


@register(
    "events_rollup_ohlc",
    oracle="""
    WITH e AS (
        SELECT event_id, event_type, value,
               date_trunc('second', ts) AS tss,
               date_trunc('hour', date_trunc('second', ts)) AS bucket
        FROM events
    ), marked AS (
        SELECT event_type, bucket, value,
               CAST(round(value * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY tss ASC, event_id ASC) AS ra,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY tss DESC, event_id DESC) AS rd
        FROM e
    )
    SELECT event_type, CAST(bucket AS VARCHAR) AS bucket_s,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents) AS DOUBLE) / (100.0 * count(*)) AS avg_value,
           round(min(value), 4) AS min_value,
           round(max(value), 4) AS max_value,
           round(max(CASE WHEN ra = 1 THEN value END), 4) AS open_value,
           round(max(CASE WHEN rd = 1 THEN value END), 4) AS close_value
    FROM marked GROUP BY 1, 2
    """,
)
def events_rollup_ohlc(spark, d):
    """Hypertable-style time-bucket rollup: per (event_type, 1-hour
    bucket) the count / avg / min / max plus OPEN and CLOSE values —
    the OHLC downsampling a timeseries store precomputes as a
    continuous aggregate.  Open/close resolve through the (tss,
    event_id) total order (the truncated-second tiebreak discipline,
    SURVEY §5.3) as two row_number marks folded into the SAME
    group-by — one window partitioning and one aggregation, both on
    (event_type, bucket), so the whole rollup rides a single exchange.
    At 100 TB this is the incremental-rollup shape: buckets are
    disjoint, so new data only touches its own (type, hour) groups."""
    from pyspark.sql import Window

    e = (T(spark, d, "events")
         .select("event_id", "event_type", "value",
                 F.date_trunc("second", "ts").alias("tss"))
         .withColumn("bucket", F.date_trunc("hour", "tss")))
    wa = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("tss").asc(), F.col("event_id").asc())
    wd = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("tss").desc(), F.col("event_id").desc())
    marked = (e.withColumn("ra", F.row_number().over(wa))
              .withColumn("rd", F.row_number().over(wd))
              # fixed-point BIGINT cents, and NO rounding of the mean:
              # exact integer operands make the IEEE division
              # bit-identical across engines, while round(_, 4) on it
              # is NOT engine-stable — cents/(100n) lands on REAL 4dp
              # midpoints (e.g. 151212/3200 = 47.25375), where Spark's
              # BigDecimal HALF_UP and DuckDB's scaled-multiply
              # rounding disagree (caught by the sf0.1 sweep; §5.3:
              # never round at a boundary the true value can sit on)
              .withColumn("cents",
                          F.round(F.col("value") * 100).cast("bigint")))
    return (marked.groupBy("event_type",
                           F.col("bucket").cast("string").alias("bucket_s"))
            .agg(F.count("*").alias("n_events"),
                 (F.sum("cents").cast("double")
                  / (100.0 * F.count("*"))).alias("avg_value"),
                 F.round(F.min("value"), 4).alias("min_value"),
                 F.round(F.max("value"), 4).alias("max_value"),
                 F.round(F.max(F.when(F.col("ra") == 1, F.col("value"))), 4)
                 .alias("open_value"),
                 F.round(F.max(F.when(F.col("rd") == 1, F.col("value"))), 4)
                 .alias("close_value")))


@register(
    "events_gap_fill",
    oracle="""
    WITH spine AS (
        SELECT u.u AS user_id,
               TIMESTAMP '2024-01-01 00:00:00'
                   + INTERVAL (m.m) MINUTE AS minute
        FROM (SELECT unnest(generate_series(0, 9)) AS u) u
        CROSS JOIN (SELECT unnest(generate_series(0, 179)) AS m) m
    ),
    obs AS (
        SELECT user_id, date_trunc('minute', ts) AS minute,
               round(sum(value), 2) AS minute_value
        FROM events
        WHERE user_id BETWEEN 0 AND 9
          AND ts < TIMESTAMP '2024-01-01 03:00:00'
        GROUP BY 1, 2
    )
    SELECT s.user_id, CAST(s.minute AS STRING) AS minute_s,
           o.minute_value,
           last_value(o.minute_value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.minute
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM spine s LEFT JOIN obs o
      ON s.user_id = o.user_id AND s.minute = o.minute
    """,
)
def events_gap_fill(spark, d):
    """Time-series gap fill: a dense calendar spine (user x minute over a
    fixed 3-hour window) left-joined to observed per-minute sums, missing
    minutes filled by last-observation-carried-forward.  The spine is
    generated with sequence()+explode — pure metadata, no data shuffle to
    build it — and LOCF is last(ignorenulls) over a ROWS frame, one
    window pass per user partition.  At 100 TB the spine stays tiny
    (users x buckets), the events side is pre-aggregated BEFORE the join,
    and the fill never widens state beyond one value per partition."""
    spine = (spark.range(0, 10).withColumnRenamed("id", "user_id")
             .select("user_id",
                     F.explode(F.sequence(F.lit(0), F.lit(179)))
                     .alias("m"))
             .select("user_id",
                     (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                      + F.make_interval(mins=F.col("m").cast("int")))
                     .alias("minute")))
    obs = (T(spark, d, "events")
           .filter((F.col("user_id").between(0, 9))
                   & (F.col("ts")
                      < F.to_timestamp(F.lit("2024-01-01 03:00:00"))))
           .groupBy("user_id", F.date_trunc("minute", "ts").alias("minute"))
           .agg(F.round(F.sum("value"), 2).alias("minute_value")))
    w = (Window.partitionBy("user_id").orderBy("minute")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (spine.join(obs, ["user_id", "minute"], "left")
            .select("user_id",
                    F.col("minute").cast("string").alias("minute_s"),
                    "minute_value",
                    F.last("minute_value", ignorenulls=True).over(w)
                    .alias("filled_value")))


@register(
    "events_funnel_windowed",
    oracle="""
    WITH s AS (
        SELECT user_id, min(date_trunc('second', ts)) AS t_signup
        FROM events
        WHERE event_type = 'signup'
          AND user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY user_id
    ), p AS (
        SELECT e.user_id, min(date_trunc('second', e.ts)) AS t_purchase
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND e.ts IS NOT NULL
          AND date_trunc('second', e.ts) > s.t_signup
          AND date_trunc('second', e.ts)
              <= s.t_signup + INTERVAL 120 MINUTE
        GROUP BY e.user_id
    )
    SELECT s.user_id, CAST(s.t_signup AS STRING) AS t_signup_s,
           p.user_id IS NOT NULL AS converted,
           CAST(floor(date_diff('second', s.t_signup, p.t_purchase)
                      / 60.0) AS BIGINT) AS mins_to_convert
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
)
def events_funnel_windowed(spark, d):
    """Time-bound conversion funnel — signup followed by a purchase
    within a 2-hour attribution window of the FIRST signup: the form
    product analytics actually ships (events_funnel is the unbounded
    ordered variant).  120 minutes, not the classic 30: the synthetic
    event stream's inter-purchase gaps make a 30-minute window
    vacuous at sf0.01 (zero conversions — the arm the driver hashes
    would never exercise); 2 h converts 2/3/52 users at the three SFs
    while staying selective.  Emits per-user conversion detail
    (flag + whole-minute latency) rather than bare stage counts, so
    downstream latency histograms need no second scan.

    Shape: both stages are min-aggregates keyed on user_id and every
    join shares that one partitioning — the window bound is a residual
    filter on the already-joined rows, adding no extra shuffle.  At
    100 TB the purchase side is pre-filtered by event_type before the
    join, so the shuffle carries only the funnel-relevant slice."""
    e = (T(spark, d, "events")
         .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
         .select("user_id", "event_type",
                 F.date_trunc("second", "ts").alias("tss")))
    s = (e.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("tss").alias("t_signup")))
    p = (e.filter(F.col("event_type") == "purchase")
         .join(s, "user_id")
         .filter((F.col("tss") > F.col("t_signup"))
                 & (F.col("tss") <= F.col("t_signup")
                    + F.make_interval(mins=F.lit(120))))
         .groupBy("user_id").agg(F.min("tss").alias("t_purchase")))
    return (s.join(p, "user_id", "left")
            .select("user_id",
                    F.col("t_signup").cast("string").alias("t_signup_s"),
                    F.col("t_purchase").isNotNull().alias("converted"),
                    F.floor((F.unix_timestamp("t_purchase")
                             - F.unix_timestamp("t_signup")) / 60)
                    .cast("bigint").alias("mins_to_convert")))


@register(
    "events_inactivity_churn",
    oracle="""
    WITH u AS (
        SELECT user_id, max(date_trunc('second', ts)) AS last_ts,
               count(*) AS n_events
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY user_id
    ), g AS (SELECT max(last_ts) AS gmax FROM u)
    SELECT user_id, CAST(last_ts AS STRING) AS last_seen_s,
           CAST(floor(date_diff('second', last_ts, gmax) / 3600.0)
                AS BIGINT) AS hours_inactive,
           floor(date_diff('second', last_ts, gmax) / 3600.0) >= 24
               AS churned,
           CAST(n_events AS BIGINT) AS n_events
    FROM u CROSS JOIN g
    """,
)
def events_inactivity_churn(spark, d):
    """Per-user inactivity / churn flag: each user's last event time
    vs the newest event anywhere, bucketed to whole hours, churned
    when >= 24 h silent — the user-grained sibling of dq_freshness's
    per-feed lag (same scalar-broadcast shape at a much higher key
    cardinality).  NULL user_id/ts rows are excluded on both sides.

    Shape: one groupBy(user_id) (partial max/count combine map-side,
    the shuffle carries one row per user), then a 1-row global-max
    cross join (whitelisted BNLJ scalar class).  At 100 TB the
    per-user relation is the thing retention dashboards materialize
    anyway; the lag projection adds no extra pass."""
    u = (T(spark, d, "events")
         .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
         .groupBy("user_id")
         .agg(F.max(F.date_trunc("second", "ts")).alias("last_ts"),
              F.count("*").cast("bigint").alias("n_events")))
    g = u.agg(F.max("last_ts").alias("gmax"))
    hours = F.floor((F.unix_timestamp("gmax")
                     - F.unix_timestamp("last_ts")) / 3600)
    return (u.crossJoin(F.broadcast(g))
            .select("user_id",
                    F.col("last_ts").cast("string").alias("last_seen_s"),
                    hours.cast("bigint").alias("hours_inactive"),
                    (hours >= 24).alias("churned"),
                    "n_events"))


@register(
    "events_max_concurrency",
    oracle="""
    WITH sess AS (
        SELECT event_id, event_type, date_trunc('second', ts) AS s,
               date_trunc('second', ts)
                   + INTERVAL (CAST(floor(value * 10) AS INTEGER)) SECOND
                   AS e
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    pts AS (
        SELECT event_type, s AS t, 1 AS delta, event_id FROM sess
        UNION ALL
        SELECT event_type, e AS t, -1 AS delta, event_id FROM sess
    ),
    run AS (
        SELECT event_type,
               sum(delta) OVER (
                   PARTITION BY event_type
                   ORDER BY t, delta, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS live
        FROM pts
    )
    SELECT event_type, CAST(max(live) AS BIGINT) AS max_concurrent
    FROM run GROUP BY event_type
    """,
)
def events_max_concurrency(spark, d):
    """Sweep-line max concurrency, chunked two-pass form: each event
    opens a session lasting value*10 seconds; +1/-1 boundary points,
    and the max of the running delta sum per event_type is the peak
    number of simultaneously open sessions.  NULL ts/value rows are
    filtered explicitly on BOTH sides — Spark windows order NULLS FIRST
    while DuckDB orders NULLS LAST, so an unguarded NULL boundary point
    diverges the two sweeps (r9 verdict finding #1).

    Scale design: a single running sum partitioned only by event_type
    is one sequential task per series (~5 tasks over 100 TB).  Instead
    the sweep runs in two passes: (1) within each (event_type,
    minute-chunk) a parallel running sum + chunk max + chunk delta
    total; (2) a prefix sum of chunk totals over the TINY chunk-level
    relation (#types x #minutes rows) gives the live count entering
    each chunk, and max(entering + within-chunk max) is exactly the
    global sweep max because the chunk key floor(epoch/60) is monotone
    in t and within-chunk order matches the global (t, delta, event_id)
    order.  Ends sort before starts at the same instant (delta ASC —
    half-open intervals)."""
    sess = (T(spark, d, "events")
            .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
            .select("event_id", "event_type",
                    F.date_trunc("second", "ts").alias("s"),
                    (F.date_trunc("second", "ts")
                     + F.make_interval(
                         secs=F.floor(F.col("value") * 10).cast("int")))
                    .alias("e")))
    pts = (sess.select("event_type", F.col("s").alias("t"),
                       F.lit(1).alias("delta"), "event_id")
           .unionAll(sess.select("event_type", F.col("e").alias("t"),
                                 F.lit(-1).alias("delta"), "event_id"))
           .withColumn("chunk",
                       F.floor(F.unix_timestamp("t") / F.lit(60))))
    w_in = (Window.partitionBy("event_type", "chunk")
            .orderBy("t", "delta", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    chunks = (pts.withColumn("live_in", F.sum("delta").over(w_in))
              .groupBy("event_type", "chunk")
              .agg(F.max("live_in").alias("chunk_max"),
                   F.sum("delta").alias("chunk_total")))
    w_base = (Window.partitionBy("event_type").orderBy("chunk")
              .rowsBetween(Window.unboundedPreceding, -1))
    return (chunks
            .withColumn("base", F.coalesce(
                F.sum("chunk_total").over(w_base), F.lit(0)))
            .groupBy("event_type")
            .agg(F.max(F.col("base") + F.col("chunk_max"))
                 .cast("bigint").alias("max_concurrent")))


@register(
    "events_pattern_match",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, event_type,
               date_trunc('second', ts) AS tss
        FROM events
        WHERE ts IS NOT NULL
    ), m AS (
        SELECT user_id, event_type, tss,
               lead(event_type, 1) OVER w AS e1,
               lead(event_type, 2) OVER w AS e2,
               lead(tss, 2) OVER w AS t2
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id)
    )
    SELECT user_id, tss AS match_start,
           CAST(epoch(t2) - epoch(tss) AS BIGINT) AS secs_to_convert
    FROM m
    WHERE event_type = 'view' AND e1 = 'click' AND e2 = 'purchase'
    """,
)
def events_pattern_match(spark, d):
    """Sequence-pattern detection (r12; the MATCH_RECOGNIZE shape):
    find every IMMEDIATELY-consecutive view -> click -> purchase run
    in a user's event stream — the strict-contiguity pattern funnels
    can't express (events_funnel allows arbitrary gaps; this demands
    adjacency, the ``PATTERN (A B C)`` of SQL row pattern matching) —
    and report when it started and how long the user took to convert.
    Ordering carries the event_id tiebreak so same-second events
    sequence identically cross-engine; NULL ts filtered on both sides
    (the events_max_concurrency NULLS FIRST/LAST lesson).

    Scale shape: one shuffle on user_id, then two leads over the same
    window spec — Spark evaluates both in a single WindowExec pass, so
    pattern length k costs k lead columns, not k self-joins.  This is
    the standard distributed NFA-free compilation for fixed
    strict-contiguity patterns."""
    e = (T(spark, d, "events")
         .filter(F.col("ts").isNotNull())
         .select("user_id", "event_id", "event_type",
                 F.date_trunc("second", "ts").alias("tss")))
    w = Window.partitionBy("user_id").orderBy("tss", "event_id")
    m = (e.withColumn("e1", F.lead("event_type", 1).over(w))
         .withColumn("e2", F.lead("event_type", 2).over(w))
         .withColumn("t2", F.lead("tss", 2).over(w)))
    return (m.filter((F.col("event_type") == "view")
                     & (F.col("e1") == "click")
                     & (F.col("e2") == "purchase"))
            .select("user_id",
                    F.col("tss").alias("match_start"),
                    (F.unix_timestamp("t2") - F.unix_timestamp("tss"))
                    .cast("bigint").alias("secs_to_convert")))


@register(
    "events_exp_smoothing",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               sum(value) AS x
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2
    ), horizon AS (
        SELECT event_type, day, x,
               date_diff('day', day, max(day) OVER (PARTITION BY event_type))
                   AS k
        FROM daily
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(sum(x * pow(0.5, k)) / sum(pow(0.5, k)), 4) + 0 AS ewma,
           round(max(CASE WHEN k = 0 THEN x END), 4) + 0 AS last_day_value
    FROM horizon
    GROUP BY event_type
    """,
)
def events_exp_smoothing(spark, d):
    """Exponentially-weighted smoothing (r12): the normalized EWMA of
    each event_type's daily value series at the final observed day —
    weight 0.5^(age in days), the closed form of simple exponential
    smoothing that every monitoring stack renders as "the smoothed
    trend".  Sequential-looking but NOT sequential: the recursion
    unrolls to one weighted sum, so the whole smoother is a single
    partial-aggregated pass (the window only supplies each type's
    horizon day).  pow(0.5, k) is exact in binary floating point, so
    cross-engine agreement reduces to the summation rounding the
    round-4 guard absorbs.

    Scale shape: daily pre-aggregation collapses the corpus to
    O(types x days) rows BEFORE any window; the EWMA shuffles bytes
    proportional to series points, never events."""
    daily = (T(spark, d, "events")
             .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
             .groupBy("event_type",
                      F.to_date(F.date_trunc("day", "ts")).alias("day"))
             .agg(F.sum("value").alias("x")))
    k = F.datediff(F.max("day").over(
        Window.partitionBy("event_type")), F.col("day"))
    h = daily.withColumn("k", k)
    w = F.pow(F.lit(0.5), F.col("k"))
    return (h.groupBy("event_type")
            .agg(F.count("*").alias("n_days"),
                 (F.round(F.sum(F.col("x") * w) / F.sum(w), 4)
                  + F.lit(0.0)).alias("ewma"),
                 (F.round(F.max(F.when(F.col("k") == 0, F.col("x"))), 4)
                  + F.lit(0.0)).alias("last_day_value")))


@register(
    "events_changepoint_cusum",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               sum(value) AS x
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2
    ), c AS (
        SELECT event_type, day,
               sum(x - mu) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cusum
        FROM (SELECT event_type, day, x,
                     avg(x) OVER (PARTITION BY event_type) AS mu
              FROM daily)
    ), r AS (
        SELECT event_type, day, cusum,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY round(abs(cusum), 4) DESC,
                                           day) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n_days
        FROM c
    )
    SELECT event_type, CAST(day AS VARCHAR) AS changepoint_day,
           round(cusum, 4) + 0 AS peak_cusum,
           CAST(n_days AS BIGINT) AS n_days
    FROM r WHERE rn = 1
    """,
)
def events_changepoint_cusum(spark, d):
    """CUSUM change-point detection (r12): per event_type, the running
    sum of (daily value - series mean) peaks in magnitude exactly where
    the series' level shifts — the classic offline CUSUM estimator for
    "when did this metric change".  The argmax day is made
    deterministic cross-engine by the (|cusum| DESC, day) tiebreak.

    Scale shape: daily pre-aggregation first (corpus -> O(types x days)
    rows), then one mean window + one running-sum window over the same
    partitioning — a single shuffle on event_type; the detector never
    touches raw events after the first pass."""
    daily = (T(spark, d, "events")
             .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
             .groupBy("event_type",
                      F.to_date(F.date_trunc("day", "ts")).alias("day"))
             .agg(F.sum("value").alias("x")))
    mu = F.avg("x").over(Window.partitionBy("event_type"))
    run = (Window.partitionBy("event_type").orderBy("day")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = (daily.withColumn("mu", mu)
         .withColumn("cusum", F.sum(F.col("x") - F.col("mu")).over(run)))
    # rank on the ROUNDED magnitude: the running float sums differ in
    # last ulps across engines, and an unrounded argmax would flip the
    # winning day on a near-symmetric shift (the round-before-rank
    # discipline of llm_weighted_sample / the RRF semantic arm)
    w_rank = Window.partitionBy("event_type").orderBy(
        F.round(F.abs("cusum"), 4).desc(), "day")
    r = (c.withColumn("rn", F.row_number().over(w_rank))
         .withColumn("n_days", F.count("*").over(
             Window.partitionBy("event_type"))))
    return (r.filter(F.col("rn") == 1)
            .select("event_type",
                    F.col("day").cast("string").alias("changepoint_day"),
                    (F.round("cusum", 4) + F.lit(0.0)).alias("peak_cusum"),
                    F.col("n_days").cast("bigint").alias("n_days")))


@register(
    "events_seasonality",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               sum(value) AS x
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2
    ), dw AS (
        SELECT event_type, dayofweek(day) AS dow, avg(x) AS dow_avg,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1, 2
    ), o AS (
        SELECT event_type, avg(x) AS overall FROM daily GROUP BY 1
    )
    SELECT dw.event_type, CAST(dow AS BIGINT) AS dow, n_days,
           round(dow_avg, 4) + 0 AS dow_avg,
           round(dow_avg / overall, 4) + 0 AS seasonal_index
    FROM dw JOIN o USING (event_type)
    """,
)
def events_seasonality(spark, d):
    """Day-of-week seasonality profile (r12): per event_type, the mean
    daily value by weekday and its seasonal index (weekday mean /
    overall mean) — the multiplicative decomposition every capacity
    planner and anomaly detector normalizes by before comparing a
    Monday to a Sunday.  DuckDB's dayofweek((Sunday=0..Saturday=6)
    equals Spark's dayofweek()-1, aligned explicitly.

    Scale shape: daily pre-aggregation first (corpus -> types x days),
    then a 7-row-per-type partial agg and a types-sized join — the
    profile for a 100 TB stream shuffles series points, never events."""
    daily = (T(spark, d, "events")
             .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
             .groupBy("event_type",
                      F.to_date(F.date_trunc("day", "ts")).alias("day"))
             .agg(F.sum("value").alias("x")))
    dw = (daily.groupBy("event_type",
                        (F.dayofweek("day") - 1).cast("bigint").alias("dow"))
          .agg(F.avg("x").alias("dow_avg"),
               F.count("*").alias("n_days")))
    o = daily.groupBy("event_type").agg(F.avg("x").alias("overall"))
    return (dw.join(F.broadcast(o), "event_type")
            .select("event_type", "dow", "n_days",
                    (F.round("dow_avg", 4) + F.lit(0.0)).alias("dow_avg"),
                    (F.round(F.col("dow_avg") / F.col("overall"), 4)
                     + F.lit(0.0)).alias("seasonal_index")))


@register(
    "events_bot_regularity",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, date_trunc('second', ts) AS tss
        FROM events WHERE ts IS NOT NULL
    ), g AS (
        SELECT user_id,
               epoch(tss) - epoch(lag(tss) OVER w) AS gap
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id)
    ), s AS (
        SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps,
               avg(gap) AS mean_gap, stddev_samp(gap) AS sd_gap
        FROM g WHERE gap IS NOT NULL
        GROUP BY user_id HAVING count(gap) >= 5 AND avg(gap) > 0
    )
    SELECT user_id, n_gaps,
           round(mean_gap, 4) + 0 AS mean_gap,
           round(sd_gap / mean_gap, 4) + 0 AS gap_cv,
           round(sd_gap / mean_gap, 4) < 0.3 AS bot_like
    FROM s
    """,
)
def events_bot_regularity(spark, d):
    """Bot/automation detection by inter-event regularity (r12): human
    traffic has bursty, high-variance gaps; schedulers and scrapers
    tick — so a LOW coefficient of variation (stddev/mean of the
    inter-event seconds, here < 0.3 over >= 5 gaps) is the classic
    automation flag every counter-abuse and data-quality pipeline
    computes before corpus ingestion trusts engagement signals.
    (event_id tiebreak orders same-second events; zero-mean users are
    excluded on both sides — a CV needs a positive mean.)

    Scale shape: one shuffle on user_id shared by the lag window and
    the per-user moments; output is O(users).  CV from single-pass
    sufficient statistics — no second scan."""
    e = (T(spark, d, "events").filter(F.col("ts").isNotNull())
         .select("user_id", "event_id",
                 F.date_trunc("second", "ts").alias("tss")))
    w = Window.partitionBy("user_id").orderBy("tss", "event_id")
    g = e.select(
        "user_id",
        (F.unix_timestamp("tss")
         - F.unix_timestamp(F.lag("tss").over(w))).alias("gap"))
    s = (g.filter(F.col("gap").isNotNull())
         .groupBy("user_id")
         .agg(F.count("gap").alias("n_gaps"),
              F.avg("gap").alias("mean_gap"),
              F.stddev_samp("gap").alias("sd_gap"))
         .filter((F.col("n_gaps") >= 5) & (F.col("mean_gap") > 0)))
    # the flag compares the ROUNDED CV: stddev accumulation differs in
    # last ulps across engines, and an unrounded 0.3 boundary would
    # flip bot_like while the emitted gap_cv agrees
    return s.select(
        "user_id", "n_gaps",
        (F.round("mean_gap", 4) + F.lit(0.0)).alias("mean_gap"),
        (F.round(F.col("sd_gap") / F.col("mean_gap"), 4) + F.lit(0.0))
            .alias("gap_cv"),
        (F.round(F.col("sd_gap") / F.col("mean_gap"), 4) < 0.3)
            .alias("bot_like"))


@register(
    "events_forecast_linear",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               sum(value) AS x
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2
    ), idx AS (
        SELECT event_type, x,
               date_diff('day', min(day) OVER (PARTITION BY event_type),
                         day) AS t,
               date_diff('day', min(day) OVER (PARTITION BY event_type),
                         max(day) OVER (PARTITION BY event_type)) AS t_max
        FROM daily
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(regr_slope(x, t), 4) + 0 AS slope,
           round(regr_intercept(x, t), 4) + 0 AS intercept,
           round(regr_intercept(x, t)
                 + regr_slope(x, t) * (any_value(t_max) + 1), 4) + 0
               AS forecast_next
    FROM idx GROUP BY event_type
    """,
)
def events_forecast_linear(spark, d):
    """Linear trend + one-step forecast per event_type (r12): OLS of
    the daily value series on its day index via the REGR_* aggregate
    family — slope (trend per day), intercept, and the next-day
    point forecast intercept + slope·(t_max+1) — the capacity-planning
    baseline every dashboard fits before anything fancier.  The
    regression runs on an EXPLICIT day index (days since the series'
    first day), so gaps in the calendar weight correctly rather than
    collapsing.

    Scale shape: daily pre-aggregation first (corpus -> types x days),
    then regr_slope/regr_intercept as single-pass moment aggregates on
    the same event_type shuffle — the fit never materializes a matrix
    or a second scan."""
    daily = (T(spark, d, "events")
             .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
             .groupBy("event_type",
                      F.to_date(F.date_trunc("day", "ts")).alias("day"))
             .agg(F.sum("value").alias("x")))
    wt = Window.partitionBy("event_type")
    idx = (daily
           .withColumn("t", F.datediff("day", F.min("day").over(wt)))
           .withColumn("t_max", F.datediff(F.max("day").over(wt),
                                           F.min("day").over(wt))))
    return (idx.groupBy("event_type")
            .agg(F.count("*").alias("n_days"),
                 (F.round(F.regr_slope("x", "t"), 4) + F.lit(0.0))
                 .alias("slope"),
                 (F.round(F.regr_intercept("x", "t"), 4) + F.lit(0.0))
                 .alias("intercept"),
                 (F.round(F.regr_intercept("x", "t")
                          + F.regr_slope("x", "t")
                          * (F.any_value("t_max") + 1), 4) + F.lit(0.0))
                 .alias("forecast_next")))


@register(
    "events_rfm_segments",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               max(CAST(date_trunc('day', ts) AS DATE)) AS last_day,
               count(*) AS freq,
               coalesce(CAST(sum(CAST(value AS DECIMAL(18,6)))
                             AS DOUBLE), 0.0) AS money
        FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL
        GROUP BY user_id
    ), rec AS (
        SELECT user_id, freq, money,
               date_diff('day', last_day, max(last_day) OVER ()) AS rec_days
        FROM per_user
    ), q AS (
        SELECT user_id, freq, money,
               ntile(4) OVER (ORDER BY rec_days, user_id) AS r_q,
               ntile(4) OVER (ORDER BY freq DESC, user_id) AS f_q,
               ntile(4) OVER (ORDER BY money DESC, user_id) AS m_q
        FROM rec
    )
    SELECT r_q, f_q, m_q,
           CASE WHEN r_q = 1 AND f_q <= 2 AND m_q <= 2 THEN 'champion'
                WHEN r_q >= 3 AND (f_q >= 3 OR m_q >= 3) THEN 'at_risk'
                ELSE 'mid' END AS segment,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CAST(money AS DECIMAL(18,6))) AS DOUBLE) / count(*)
               AS avg_monetary
    FROM q GROUP BY r_q, f_q, m_q
    """,
)
def events_rfm_segments(spark, d):
    """RFM segmentation (r12): per-user Recency (days since the user's
    last event, against the corpus' latest day), Frequency (event
    count) and Monetary (exact decimal value sum), each cut into
    quartiles by ``ntile(4)`` with a user_id tiebreak (ntile is
    row-order dependent — the unique key pins it cross-engine), then
    the classic champion / at-risk / mid marketing segments per RFM
    cell.  Monetary sums ride DECIMAL so no float accumulation order
    can leak into the quartile ordering; the cell average is ONE
    division of exact values, emitted unrounded per the §5.3
    only-round-what-accumulates rule.

    Scale shape: the corpus collapses to one row per user in a single
    partial-agg shuffle; the ntile windows run over the users-sized
    relation (100 TB path: approx_percentile cutoffs broadcast back
    instead of a global sort); the output is O(4^3) cells."""
    per_user = (T(spark, d, "events")
                .filter(F.col("ts").isNotNull()
                        & F.col("user_id").isNotNull())
                .groupBy("user_id")
                .agg(F.max(F.to_date(F.date_trunc("day", "ts")))
                     .alias("last_day"),
                     F.count("*").alias("freq"),
                     # coalesce: a user whose every value is NULL has
                     # monetary 0, not NULL — an unguarded nullable
                     # ORDER BY would shift ntile buckets per engine
                     # null-ordering defaults (§5.2)
                     F.coalesce(
                         F.sum(F.col("value").cast("decimal(18,6)"))
                         .cast("double"), F.lit(0.0)).alias("money")))
    w_all = Window.partitionBy()
    rec = F.datediff(F.max("last_day").over(w_all), F.col("last_day"))
    q = (per_user
         .withColumn("rec_days", rec)
         .withColumn("r_q", F.ntile(4).over(
             Window.orderBy("rec_days", "user_id")))
         .withColumn("f_q", F.ntile(4).over(
             Window.orderBy(F.col("freq").desc(), "user_id")))
         .withColumn("m_q", F.ntile(4).over(
             Window.orderBy(F.col("money").desc(), "user_id"))))
    seg = (F.when((F.col("r_q") == 1) & (F.col("f_q") <= 2)
                  & (F.col("m_q") <= 2), "champion")
           .when((F.col("r_q") >= 3) & ((F.col("f_q") >= 3)
                                        | (F.col("m_q") >= 3)), "at_risk")
           .otherwise("mid"))
    return (q.groupBy("r_q", "f_q", "m_q")
            .agg(F.any_value(seg).alias("segment"),
                 F.count("*").alias("n_users"),
                 (F.sum(F.col("money").cast("decimal(18,6)")).cast("double")
                  / F.count("*")).alias("avg_monetary")))


@register(
    "events_ab_test",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS cohort,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ), c AS (
        SELECT count(*) FILTER (cohort = 'A') AS n_a,
               count(*) FILTER (cohort = 'B') AS n_b,
               sum(converted) FILTER (cohort = 'A') AS conv_a,
               sum(converted) FILTER (cohort = 'B') AS conv_b
        FROM per_user
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
           CAST(conv_a AS DOUBLE) / n_a AS rate_a,
           CAST(conv_b AS DOUBLE) / n_b AS rate_b,
           round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                 / nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 0.0), 4) + 0 AS z_score,
           abs(round((CAST(conv_a AS DOUBLE) / n_a
                      - CAST(conv_b AS DOUBLE) / n_b)
                 / nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 0.0), 4)) >= 1.96
               AS significant
    FROM c
    """,
)
def events_ab_test(spark, d):
    """Two-proportion z-test between experiment cohorts (r12): cohort =
    ``user_id % 2`` (the deterministic assignment an experimentation
    platform would hash), conversion = the user ever fired a
    ``purchase`` event; pooled standard error, z-score and the
    |z| >= 1.96 significance verdict — the first readout every A/B
    dashboard computes.  Every input to the statistic is an integer
    count, so rates are exact single divisions (unrounded per §5.3);
    only the z-score, which passes through ``sqrt``, is rounded (4dp)
    and the significance flag reads the ROUNDED z so both engines
    decide from the same number.

    Scale shape: corpus -> one row per user (partial-agg shuffle) ->
    four global counters (map-side combine into a 1-row frame); the
    statistic itself is driver-free scalar arithmetic in the plan."""
    per_user = (T(spark, d, "events")
                .groupBy("user_id")
                .agg(F.max(F.when(F.col("event_type") == "purchase", 1)
                           .otherwise(0)).alias("converted"))
                .withColumn("cohort",
                            F.when(F.col("user_id") % 2 == 0, "A")
                            .otherwise("B")))
    c = per_user.agg(
        F.count(F.when(F.col("cohort") == "A", 1)).alias("n_a"),
        F.count(F.when(F.col("cohort") == "B", 1)).alias("n_b"),
        F.sum(F.when(F.col("cohort") == "A", F.col("converted"))).alias("conv_a"),
        F.sum(F.when(F.col("cohort") == "B", F.col("converted"))).alias("conv_b"))
    rate_a = F.col("conv_a").cast("double") / F.col("n_a")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b")
    pooled = ((F.col("conv_a") + F.col("conv_b")).cast("double")
              / (F.col("n_a") + F.col("n_b")))
    # nullif guard: a degenerate cohort pair (everyone or no one
    # converted -> pooled variance 0) has no defined z; emit NULL
    # rather than divide by zero (hit at sf0.001 where every user buys)
    z = F.round((rate_a - rate_b)
                / F.nullif(F.sqrt(pooled * (F.lit(1.0) - pooled)
                                  * (F.lit(1.0) / F.col("n_a")
                                     + F.lit(1.0) / F.col("n_b"))),
                           F.lit(0.0)), 4)
    return c.select(
        "n_a", "n_b", "conv_a", "conv_b",
        rate_a.alias("rate_a"), rate_b.alias("rate_b"),
        (z + F.lit(0.0)).alias("z_score"),
        (F.abs(z) >= 1.96).alias("significant"))


@register(
    "events_mann_whitney",
    oracle="""
    WITH v AS (
        SELECT event_type AS grp, value
        FROM events
        WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
    ), ranked AS (
        SELECT grp,
               rank() OVER (ORDER BY value)
                 + (count(*) OVER (PARTITION BY value) - 1) / 2.0 AS avg_rank
        FROM v
    ), s AS (
        SELECT count(*) FILTER (grp = 'purchase') AS n1,
               count(*) FILTER (grp = 'view') AS n2,
               sum(avg_rank) FILTER (grp = 'purchase') AS r1
        FROM ranked
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           r1 - n1 * (n1 + 1) / 2.0 AS u_stat,
           round((r1 - n1 * (n1 + 1) / 2.0 - CAST(n1 AS DOUBLE) * n2 / 2.0)
                 / sqrt(CAST(n1 AS DOUBLE) * n2 * (n1 + n2 + 1) / 12.0), 4)
               + 0 AS z_score
    FROM s
    """,
)
def events_mann_whitney(spark, d):
    """Mann-Whitney U test (r12): are ``purchase`` event values
    stochastically larger than ``view`` values?  The nonparametric
    two-sample test — rank the pooled values (average ranks on ties:
    ``rank() + (tied-1)/2``, both terms exact), U = R1 - n1(n1+1)/2,
    normal approximation z (no tie-correction term: the fixture values
    are continuous doubles, stated).  Ranks are integers-plus-halves —
    exactly representable, so R1 and U are order-independent exact sums
    (emitted unrounded); only z, which divides by a sqrt, is rounded.

    Scale shape: the filter keeps two cohorts, then ONE global sort
    assigns ranks (the 100 TB form replaces it with fixed-bin histogram
    ranks: bin counts partial-aggregate, rank = cumulative offset);
    everything after is a 1-row reduction."""
    v = (T(spark, d, "events")
         .filter(F.col("event_type").isin("purchase", "view")
                 & F.col("value").isNotNull())
         .select(F.col("event_type").alias("grp"), "value"))
    ranked = v.select(
        "grp",
        (F.rank().over(Window.orderBy("value"))
         + (F.count("*").over(Window.partitionBy("value")) - 1) / 2.0)
        .alias("avg_rank"))
    s = ranked.agg(
        F.count(F.when(F.col("grp") == "purchase", 1)).alias("n1"),
        F.count(F.when(F.col("grp") == "view", 1)).alias("n2"),
        F.sum(F.when(F.col("grp") == "purchase", F.col("avg_rank")))
        .alias("r1"))
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    mu = F.col("n1").cast("double") * F.col("n2") / 2.0
    sigma = F.sqrt(F.col("n1").cast("double") * F.col("n2")
                   * (F.col("n1") + F.col("n2") + 1) / 12.0)
    return s.select(
        "n1", "n2", u.alias("u_stat"),
        (F.round((u - mu) / sigma, 4) + F.lit(0.0)).alias("z_score"))


def _markov_oracle() -> str:
    """Unrolled 12-step power iteration (DuckDB forbids aggregates in a
    recursive CTE's recursive term, so the fixed iteration count is
    expanded into chained CTEs at import time — still one static SQL
    string)."""
    steps = "".join(
        f""", v{i + 1} AS (
        SELECT t.next_type AS event_type,
               CAST(sum((v.v * t.n) // t.t) AS BIGINT) AS v
        FROM v{i} v JOIN trans t ON t.prev_type = v.event_type
        GROUP BY t.next_type
    )""" for i in range(12))
    return f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY date_trunc('second', ts),
                                              event_id) AS prev_type
        FROM events
    ), cnt AS (
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ), tot AS (
        SELECT prev_type, sum(n) AS t FROM cnt GROUP BY 1
    ), trans AS (
        SELECT c.prev_type, c.next_type, c.n, t.t
        FROM cnt c JOIN tot t USING (prev_type)
    ), v0 AS (
        SELECT prev_type AS event_type,
               CAST(1000000000 AS BIGINT) // (SELECT count(*) FROM tot) AS v
        FROM tot
    ){steps}
    SELECT event_type, v / 1000000000.0 AS stationary FROM v12
    """


@register("events_markov_stationary", oracle=_markov_oracle())
def events_markov_stationary(spark, d):
    """Stationary distribution of the event-type Markov chain (r12):
    where does a user's session settle in the long run?  Power
    iteration (12 steps from uniform) over the first-order transition
    matrix — the PageRank-shaped iterative algorithm, made bit-exact
    cross-engine by FIXED-POINT arithmetic: the probability vector is
    integers scaled 1e9 and each step's contribution is the exact
    integer ``(v_i * n_ij) // tot_i``, floored PER TERM so the sum is
    order-independent (float power iteration would accumulate
    engine-specific ulps; the tiny mass the floor sheds per step is
    identical on both sides by construction).  The final value is one
    exact int-to-double division, emitted unrounded (§5.3).

    Scale shape: the transition counts are ONE user_id-shuffled lag
    window + a |types|^2 aggregate — that tiny matrix is then driver
    math (bounded metadata, the k-means-centroid precedent: k event
    types, not corpus rows).  At a 100 TB 10^9-node graph the same
    iteration runs as k joins on a distributed edge frame (the
    llm_dedup_clusters shape); for a types x types chain the driver
    loop IS the right plan."""
    w = Window.partitionBy("user_id").orderBy(
        F.date_trunc("second", "ts"), "event_id")
    seq = (T(spark, d, "events")
           .select("user_id", "event_type",
                   F.lag("event_type").over(w).alias("prev_type"))
           .filter(F.col("prev_type").isNotNull()))
    cnt = (seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
           .agg(F.count("*").alias("n")))
    wt = Window.partitionBy("prev_type")
    trans = cnt.withColumn("t", F.sum("n").over(wt))
    rows = trans.collect()  # bounded: |event_types|^2 rows of metadata
    tot_by_prev = {}
    for r in rows:
        tot_by_prev[r["prev_type"]] = r["t"]
    k = len(tot_by_prev)
    if k == 0:  # empty chain (zero-row slice): no stationary state
        return spark.createDataFrame(
            [], "event_type string, stationary double")
    v = {p: 1_000_000_000 // k for p in sorted(tot_by_prev)}
    for _ in range(12):
        nxt: dict[str, int] = {}
        for r in rows:
            vi = v.get(r["prev_type"], 0)
            nxt[r["next_type"]] = (nxt.get(r["next_type"], 0)
                                   + (vi * r["n"]) // r["t"])
        v = nxt
    out = [(t, val / 1e9) for t, val in sorted(v.items())]
    return spark.createDataFrame(out, "event_type string, stationary double")


@register(
    "events_moving_regression",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               sum(CAST(value AS DECIMAL(18,6))) AS y_dec
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2
    ), idx AS (
        SELECT event_type, day,
               date_diff('day', min(day) OVER (PARTITION BY event_type),
                         day) AS x,
               CAST(y_dec AS DOUBLE) AS y
        FROM daily
    ), m AS (
        SELECT event_type, day, x,
               count(*) OVER w AS n,
               sum(x) OVER w AS sx,
               sum(y) OVER w AS sy,
               sum(x * x) OVER w AS sxx,
               sum(x * y) OVER w AS sxy
        FROM idx
        WINDOW w AS (PARTITION BY event_type ORDER BY x
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day, CAST(n AS BIGINT) AS n,
           round((n * sxy - sx * sy) * 1.0
                 / nullif(n * sxx - sx * sx, 0), 4) + 0 AS slope_7d
    FROM m WHERE n >= 3
    """,
)
def events_moving_regression(spark, d):
    """Rolling 7-day OLS trend per event_type (r12): the regression
    slope of daily value on the day index over a RANGE frame of the
    trailing week — 'what is the trend RIGHT NOW', recomputed at every
    day, the moving companion of events_forecast_linear's whole-series
    fit.  The slope comes from the classic moment identity
    (n·Σxy − Σx·Σy) / (n·Σxx − Σx²), so ONE window pass accumulates
    five running moments instead of re-fitting per day; windows with
    fewer than 3 points are suppressed and a zero denominator (degener-
    ate single-x window) yields NULL via nullif on both engines.  Daily
    values pre-aggregate through DECIMAL so float order can't enter
    the moments; x is an exact integer day index; the slope rounds 4dp
    (the only accumulated-float quotient).

    Scale shape: corpus collapses to types x days in one partial-agg
    shuffle; the RANGE frame runs per type over that daily relation.
    At 100 TB the daily pre-agg IS the heavy step and it is one
    exchange; the window is days-sized."""
    daily = (T(spark, d, "events")
             .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
             .groupBy("event_type",
                      F.to_date(F.date_trunc("day", "ts")).alias("day"))
             .agg(F.sum(F.col("value").cast("decimal(18,6)"))
                  .alias("y_dec")))
    wt = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type", "day",
        # long x: Spark's datediff is int32 (DuckDB's date_diff is
        # BIGINT) and x*x overflows ANSI int32 once a series spans
        # ~46k+ days — caught by the r13 timestamp-adversarial sweep
        F.datediff("day", F.min("day").over(wt)).cast("long").alias("x"),
        F.col("y_dec").cast("double").alias("y"))
    w = (Window.partitionBy("event_type").orderBy("x")
         .rangeBetween(-6, 0))
    m = idx.select(
        "event_type", "day", "x",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"))
    slope = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) * 1.0
        / F.nullif(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"),
                   F.lit(0)), 4)
    return (m.filter(F.col("n") >= 3)
            .select("event_type", F.col("day").cast("string").alias("day"),
                    F.col("n").cast("bigint").alias("n"),
                    (slope + F.lit(0.0)).alias("slope_7d")))


@register(
    "events_graph_triangles",
    oracle=f"""
    WITH act AS (
        SELECT DISTINCT user_id, date_trunc('hour', ts) AS h
        FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
                      AND user_id IS NOT NULL
    ), hn AS (
        SELECT h, count(*) AS n_h FROM act GROUP BY h
    ), capped AS (
        -- heavy-hour guard (r13): hours over TRI_HOUR_CAP co-active
        -- purchasers keep a deterministic ~CAP-user hash sample (the
        -- constant is interpolated so Spark and oracle share ONE
        -- source of truth for the cap)
        SELECT user_id, h
        FROM act JOIN hn USING (h)
        WHERE n_h <= {TRI_HOUR_CAP}
           OR (CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)
                  || '@' || CAST(CAST(epoch(h) AS BIGINT) AS VARCHAR)),
                  1, 8)) AS BIGINT) % 1000000) * n_h
              <= {TRI_HOUR_CAP} * 1000000
    ), edges AS (
        SELECT x.user_id AS u, y.user_id AS v
        FROM capped x JOIN capped y ON x.h = y.h AND x.user_id < y.user_id
        GROUP BY 1, 2 HAVING count(*) >= 2
    ), deg AS (
        SELECT node, count(*) AS dg FROM (
            SELECT u AS node FROM edges
            UNION ALL SELECT v FROM edges
        ) GROUP BY node
    ), oriented AS (
        -- orient each edge from the (degree, id)-smaller endpoint: the
        -- degree-ordered DAG in which every triangle a<b<c appears as
        -- exactly the edge set {{a->b, a->c, b->c}}
        SELECT CASE WHEN (du.dg, u) < (dv.dg, v) THEN u ELSE v END AS s,
               CASE WHEN (du.dg, u) < (dv.dg, v) THEN v ELSE u END AS t,
               CASE WHEN (du.dg, u) < (dv.dg, v) THEN dv.dg ELSE du.dg
                   END AS t_dg
        FROM edges
        JOIN deg du ON du.node = u
        JOIN deg dv ON dv.node = v
    ), wedges AS (
        SELECT e1.t AS b, e2.t AS c
        FROM oriented e1 JOIN oriented e2 ON e1.s = e2.s
        WHERE (e1.t_dg, e1.t) < (e2.t_dg, e2.t)
    ), tri AS (
        SELECT count(*) AS n_tri
        FROM wedges w JOIN oriented e ON e.s = w.b AND e.t = w.c
    ), wn AS (SELECT count(*) AS n_wedges FROM wedges),
    base AS (
        SELECT (SELECT count(*) FROM deg) AS n_nodes,
               (SELECT count(*) FROM edges) AS n_edges
    )
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_edges AS BIGINT) AS n_edges,
           CAST(n_tri AS BIGINT) AS n_triangles,
           CAST(n_wedges AS BIGINT) AS n_wedges,
           CAST(n_tri AS DOUBLE) / nullif(n_wedges, 0)
               AS closure_rate
    FROM base, tri, wn
    """,
)
def events_graph_triangles(spark, d):
    """Triangle count on the user co-purchase graph (r12): edges join
    users who purchased in the same hour at least twice; triangles are
    counted on the DEGREE-ORIENTED DAG — each edge points from its
    (degree, id)-smaller endpoint, so every triangle a<b<c materializes
    exactly once as the wedge (a->b, a->c) closed by (b->c).  That
    orientation is THE distributed-triangle trick (node-iterator++/
    Cohen): wedge fan-out per node is bounded by out-degree, which the
    orientation caps near the graph's arboricity — a hub with degree
    10^6 contributes its wedges as the SMALLER endpoint of almost no
    edge, instead of exploding 10^12 pairs.  Output: node/edge/wedge/
    triangle counts and the global closure rate (exact integer division,
    unrounded; NULL when wedge-free).

    Heavy-hour guard (r13, closing the r12 verdict's one scale defect):
    the orientation bounds the WEDGE stage, but the EDGE-BUILD self-join
    materializes sum(n_h^2) co-occurrence pairs per hour BEFORE the
    k>=2 filter prunes anything — one hot hour with 10^6 purchasers is
    10^12 pairs and the stage never finishes.  Hours over
    TRI_HOUR_CAP=1024 participants therefore keep a deterministic
    ~CAP-user sample chosen by hash threshold — keep user iff
    frac(md5(user@hour)) * n_h <= CAP — the same heavy-bucket
    discipline llm_dedup_minhash applies to hot LSH bands, mirrored
    verbatim in the oracle so both engines replay the identical capped
    graph at ANY scale.  The threshold form (no rank, no sort) keeps
    the hot hour fully parallel instead of funneling it through one
    row_number reducer; sample size concentrates at CAP +- O(sqrt(CAP))
    by Chernoff, so per-hour pair expansion is bounded ~CAP^2 ~= 10^6
    regardless of n_h.  On the driver fixtures every hour is under the
    cap (max 43 purchasers at sf0.1; pytest-pinned) so the guard is a
    no-op and the hash contract is unchanged; in a genuinely dense hour
    the co-purchase graph itself is quadratic, so sampling participants
    is the honest semantics, not a shortcut.

    Scale shape: edges = one hour-bucket equi-self-join + partial-agg
    with per-hour expansion capped at ~CAP^2; degrees = one aggregate;
    wedges + closure = two equi-joins keyed on node then (b, c).  Every
    stage is a keyed hash join — no cross product anywhere."""
    act = (T(spark, d, "events")
           .filter((F.col("event_type") == "purchase")
                   & F.col("ts").isNotNull() & F.col("user_id").isNotNull())
           .select("user_id", F.date_trunc("hour", "ts").alias("h"))
           .distinct())
    hn = act.groupBy("h").agg(F.count("*").alias("n_h"))
    ufrac = (F.conv(F.substring(F.md5(F.concat(
        F.col("user_id").cast("string"), F.lit("@"),
        F.col("h").cast("long").cast("string"))), 1, 8), 16, 10)
        .cast("bigint") % 1000000)
    capped = (act.join(F.broadcast(hn), "h")
              .filter((F.col("n_h") <= TRI_HOUR_CAP)
                      | (ufrac * F.col("n_h")
                         <= TRI_HOUR_CAP * 1000000))
              .select("user_id", "h"))
    x = capped.select(F.col("user_id").alias("u"), "h")
    y = capped.select(F.col("user_id").alias("v"), "h")
    # localCheckpoint materializes the edge set ONCE for the four
    # consumers below (two counter aggs, the wedge-closure join's two
    # scans) — measured 5.1 -> 2.8 s at sf0.1.  r12 tried .cache() and
    # measured it WORSE than recompute (the extra materialization pass
    # plus its optimization barrier); checkpoint differs: it truncates
    # lineage, so consumers plan against a short in-storage scan
    # instead of re-optimizing the full join tree per job.  This is
    # the "checkpoint the edge frame once" shape the 100 TB plan
    # always called for; blocks free when the frame goes out of scope.
    edges = (x.join(y, "h")
             .filter(F.col("u") < F.col("v"))
             .groupBy("u", "v").agg(F.count("*").alias("k"))
             .filter(F.col("k") >= 2).drop("k")
             .localCheckpoint(eager=True))
    deg = (edges.select(F.col("u").alias("node"))
           .unionAll(edges.select("v"))
           .groupBy("node").agg(F.count("*").alias("dg")))
    du = deg.select(F.col("node").alias("u"), F.col("dg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("dg").alias("dv"))
    ann = edges.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | \
        ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oriented = ann.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("t_dg"))
    e1 = oriented.select("s", F.col("t").alias("b"),
                         F.col("t_dg").alias("b_dg"))
    e2 = oriented.select("s", F.col("t").alias("c"),
                         F.col("t_dg").alias("c_dg"))
    wedges = (e1.join(e2, "s")
              .filter((F.col("b_dg") < F.col("c_dg"))
                      | ((F.col("b_dg") == F.col("c_dg"))
                         & (F.col("b") < F.col("c"))))
              .select("b", "c"))
    closing = oriented.select(F.col("s").alias("b"), F.col("t").alias("c"))
    # THREE scalar-counter jobs over the ONE checkpointed edge frame
    # (r13; was four jobs x full recompute):
    #   1. n_nodes AND n_edges from ONE deg aggregate (each edge is
    #      counted at both endpoints, so n_edges = sum(dg)/2 exactly);
    #   2. n_wedges WITHOUT materializing a single wedge — the oriented
    #      DAG emits C(out_degree, 2) wedges per source, so one
    #      groupBy(s) + sum(c*(c-1)/2) replaces the second full wedge
    #      join (at the r12 inflated density that join was 162M rows
    #      materialized twice; the count is now an O(sources) agg);
    #   3. n_tri from the wedge-closure join (the only consumer that
    #      genuinely needs wedge rows).
    nn = deg.agg(F.count("*").alias("n"),
                 (F.sum("dg") / 2).cast("bigint").alias("e")).first()
    n_nodes, n_edges = (nn["n"], nn["e"]) if nn["e"] is not None else (0, 0)
    n_wedges = (oriented.groupBy("s").agg(F.count("*").alias("c"))
                .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2)
                     .cast("bigint").alias("w")).first()["w"]) or 0
    n_tri = wedges.join(closing, ["b", "c"]).count()
    out = [(n_nodes, n_edges, n_tri, n_wedges,
            (n_tri / n_wedges) if n_wedges else None)]
    return spark.createDataFrame(
        out, "n_nodes bigint, n_edges bigint, n_triangles bigint, "
             "n_wedges bigint, closure_rate double")


@register(
    "orders_market_basket",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey % 50 AS item
        FROM lineitem WHERE l_partkey IS NOT NULL
    ), n AS (SELECT count(DISTINCT ok) AS n_orders FROM items),
    supp AS (
        SELECT item, count(*) AS s FROM items GROUP BY item
    ), pairs_all AS (
        SELECT a.item AS item_a, b.item AS item_b, count(*) AS co
        FROM items a JOIN items b
          ON a.ok = b.ok AND a.item < b.item
        GROUP BY 1, 2
    ), tot AS (
        SELECT sum(co) AS s, count(*) AS m FROM pairs_all
    ), pairs AS (
        SELECT item_a, item_b, co FROM pairs_all, tot
        WHERE co * m >= s
    )
    SELECT item_a, item_b,
           CAST(co AS BIGINT) AS together,
           CAST(sa.s AS BIGINT) AS n_a, CAST(sb.s AS BIGINT) AS n_b,
           CAST(co AS DOUBLE) / sa.s AS confidence,
           co * 1.0 * (SELECT n_orders FROM n) / (sa.s * sb.s) AS lift
    FROM pairs
    JOIN supp sa ON sa.item = item_a
    JOIN supp sb ON sb.item = item_b
    """,
)
def orders_market_basket(spark, d):
    """Market-basket association rules (r12): for item pairs bought in
    the same order (items = part classes, l_partkey % 50), support,
    confidence P(b|a) and lift co·N/(s_a·s_b) — the co-purchase signal
    behind "frequently bought together".  Pair generation is the
    WITHIN-BASKET self-join: fan-out per order is (lines choose 2),
    bounded by basket size (~7), never corpus²; a min-support HAVING
    of 20 prunes the long tail before the stats joins.  Confidence is
    an exact integer division and lift one fixed mult/div tree of
    exact integers — both emitted unrounded (§5.3).

    Scale shape: one orderkey shuffle for the basket join (baskets are
    co-located by key), one partial-agg per pair, support joins are
    item-domain sized; the 1-row order count broadcasts.  At 100 TB
    this is FP-Growth's candidate-pair base case, and min-support
    pruning is what keeps it tractable there too."""
    # the distinct basket frame feeds FOUR consumers (the order count
    # below, per-item support, and both self-join arms) — without the
    # checkpoint each re-ran the scan + distinct exchange (plan read 12
    # scans / 32 exchanges; guide §2.4/§5), and the count pass is
    # forced anyway, so materializing it here is strictly cheaper.
    items = (T(spark, d, "lineitem")
             .filter(F.col("l_partkey").isNotNull())
             .select(F.col("l_orderkey").alias("ok"),
                     (F.col("l_partkey") % 50).alias("item"))
             .distinct()
             .localCheckpoint(eager=True))
    n_orders = items.select("ok").distinct().count()
    supp = items.groupBy("item").agg(F.count("*").alias("s"))
    a = items.select("ok", F.col("item").alias("item_a"))
    b = items.select("ok", F.col("item").alias("item_b"))
    pairs_all = (a.join(b, "ok")
                 .filter(F.col("item_a") < F.col("item_b"))
                 .groupBy("item_a", "item_b").agg(F.count("*").alias("co")))
    tot = pairs_all.agg(F.sum("co").alias("s"), F.count("*").alias("m"))
    pairs = (pairs_all.join(F.broadcast(tot))
             .filter(F.col("co") * F.col("m") >= F.col("s"))
             .select("item_a", "item_b", "co"))
    sa = supp.select(F.col("item").alias("item_a"), F.col("s").alias("n_a"))
    sb = supp.select(F.col("item").alias("item_b"), F.col("s").alias("n_b"))
    return (pairs.join(sa, "item_a").join(sb, "item_b")
            .select("item_a", "item_b",
                    F.col("co").cast("bigint").alias("together"),
                    F.col("n_a").cast("bigint").alias("n_a"),
                    F.col("n_b").cast("bigint").alias("n_b"),
                    (F.col("co").cast("double") / F.col("n_a"))
                    .alias("confidence"),
                    (F.col("co") * 1.0 * F.lit(n_orders)
                     / (F.col("n_a") * F.col("n_b"))).alias("lift")))


@register(
    "events_survival_km",
    oracle="""
    WITH span AS (
        SELECT user_id,
               CAST(min(date_trunc('day', ts)) AS DATE) AS first_day,
               CAST(max(date_trunc('day', ts)) AS DATE) AS last_day
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        GROUP BY user_id
    ), horizon AS (SELECT max(last_day) AS h FROM span),
    obs AS (
        SELECT date_diff('day', first_day, last_day) AS t,
               last_day < (SELECT h FROM horizon) AS churned
        FROM span
    ), risk AS (
        SELECT t,
               CAST(count(*) FILTER (churned) AS BIGINT) AS d,
               CAST((SELECT count(*) FROM obs) -
                    sum(count(*)) OVER (ORDER BY t
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS BIGINT) AS n
        FROM obs GROUP BY t
    ), km AS (
        -- a time point where EVERY remaining at-risk user churns
        -- (d = n) zeroes the product-limit factor: ln(0) raises in
        -- DuckDB and NULLs in Spark, but the estimator itself is
        -- defined — S hits 0 and stays 0.  Zero factors are counted
        -- in a running flag and excluded from the log sum (r13
        -- timestamp-adversarial sweep).
        SELECT t, d, n_risk,
               round(CASE WHEN sum(CASE WHEN d >= n_risk THEN 1
                                        ELSE 0 END)
                              OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                              > 0 THEN 0.0
                          ELSE exp(sum(CASE WHEN d < n_risk
                                            THEN ln(1.0 - CAST(d AS DOUBLE)
                                                      / n_risk) END)
                                   OVER (ORDER BY t
                                         ROWS UNBOUNDED PRECEDING))
                     END, 4) AS survival
        FROM (SELECT t, d,
                     coalesce(n, (SELECT count(*) FROM obs)) AS n_risk
              FROM risk WHERE d > 0)
    )
    SELECT CAST(t AS BIGINT) AS t_days, d AS churned, n_risk,
           survival + 0 AS survival
    FROM km
    """,
)
def events_survival_km(spark, d):
    """Kaplan-Meier churn survival curve (r12): time-to-churn per user
    (days between first and last activity; users still active on the
    corpus' final day are CENSORED — the estimator's whole point), the
    at-risk count n(t) from a running frame, and the product-limit
    estimate S(t) = Π(1 - d_i/n_i) — computed as exp of a RUNNING sum
    of logs, whose addition order is pinned by the window frame on
    both engines (a plain aggregate product would be order-free only
    by luck); 4dp rounding guards libm's last ulp.  d and n are exact
    integers.  This is the retention readout growth teams fit before
    any parametric model.

    Scale shape: corpus collapses to one (first, last) row per user in
    one shuffle; everything after runs on the days-sized event-time
    relation; the running frames order by t within ONE partition of
    observed durations (bounded by the calendar, not users)."""
    span = (T(spark, d, "events")
            .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
            .groupBy("user_id")
            .agg(F.min(F.to_date(F.date_trunc("day", "ts")))
                 .alias("first_day"),
                 F.max(F.to_date(F.date_trunc("day", "ts")))
                 .alias("last_day")))
    w_all = Window.partitionBy()
    obs = span.select(
        F.datediff("last_day", "first_day").alias("t"),
        (F.col("last_day") < F.max("last_day").over(w_all))
        .alias("churned"))
    total = obs.count()  # 1-row scalar: the initial at-risk cohort
    risk = (obs.groupBy("t")
            .agg(F.count(F.when(F.col("churned"), 1)).alias("d"),
                 F.count("*").alias("all_t")))
    w_ord = Window.orderBy("t")
    prev = F.sum("all_t").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1))
    risk = risk.withColumn(
        "n_risk", (F.lit(total) - F.coalesce(prev, F.lit(0))).cast("bigint"))
    # d = n_risk zeroes the factor: S hits 0 and stays 0 (ln(0) would
    # NULL here and raise in DuckDB) — running zero-flag + filtered
    # log sum, mirrored in the oracle
    wrun = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    run_zero = F.sum(F.when(F.col("d") >= F.col("n_risk"), 1)
                     .otherwise(0)).over(wrun)
    run_log = F.sum(F.when(
        F.col("d") < F.col("n_risk"),
        F.log(1.0 - F.col("d").cast("double") / F.col("n_risk")))).over(wrun)
    km = (risk.filter(F.col("d") > 0)
          .withColumn(
              "survival",
              F.round(F.when(run_zero > 0, F.lit(0.0))
                      .otherwise(F.exp(run_log)), 4)))
    return km.select(F.col("t").cast("bigint").alias("t_days"),
                     F.col("d").cast("bigint").alias("churned"),
                     "n_risk",
                     (F.col("survival") + F.lit(0.0)).alias("survival"))


@register(
    "orders_abc_pareto",
    oracle="""
    WITH rev AS (
        SELECT l_partkey % 50 AS item,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS r
        FROM lineitem WHERE l_partkey IS NOT NULL
        GROUP BY 1
    ), ranked AS (
        SELECT item, r,
               sum(r) OVER (ORDER BY r DESC, item
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(r) OVER () AS tot
        FROM rev
    ), classed AS (
        SELECT item, r,
               CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                    WHEN cum * 100 <= tot * 95 THEN 'B'
                    ELSE 'C' END AS cls
        FROM ranked
    )
    SELECT cls, CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(r) AS DOUBLE) AS revenue,
           CAST(sum(r) AS DOUBLE) / (SELECT CAST(sum(r) AS DOUBLE) FROM rev)
               AS revenue_share
    FROM classed GROUP BY cls
    """,
)
def orders_abc_pareto(spark, d):
    """ABC / Pareto inventory classification (r12): item classes (part
    % 50) ranked by DECIMAL-exact revenue, cumulative-share cut at
    80% (A) and 95% (B) — the 80/20 analysis every supply-chain and
    storage-tiering review starts from.  The class boundary is an
    integer-cross-multiplied DECIMAL comparison (cum*100 <= tot*80),
    so no float ever decides a class; the share is one exact-decimal
    to double division per class row (unrounded, §5.3); the
    cumulative window carries an item tiebreak.

    Scale shape: corpus -> item-domain rows in one partial-agg
    shuffle; the ranking window runs over the bounded item domain."""
    rev = (T(spark, d, "lineitem")
           .filter(F.col("l_partkey").isNotNull())
           .groupBy((F.col("l_partkey") % 50).alias("item"))
           .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .alias("r")))
    w_ord = Window.orderBy(F.col("r").desc(), "item").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    ranked = (rev.withColumn("cum", F.sum("r").over(w_ord))
              .withColumn("tot", F.sum("r").over(w_all)))
    cls = (F.when(F.col("cum") * 100 <= F.col("tot") * 80, "A")
           .when(F.col("cum") * 100 <= F.col("tot") * 95, "B")
           .otherwise("C"))
    classed = ranked.select("item", "r", cls.alias("cls"))
    tot_d = rev.agg(F.sum("r").cast("double").alias("t"))
    return (classed.groupBy("cls")
            .agg(F.count("*").alias("n_items"),
                 F.sum("r").cast("double").alias("revenue"))
            .join(F.broadcast(tot_d))
            .select("cls", "n_items", "revenue",
                    (F.col("revenue") / F.col("t")).alias("revenue_share")))


@register(
    "events_next_event_eval",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY date_trunc('second', ts),
                                              event_id) AS prev_type
        FROM events
    ), cnt AS (
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ), pred AS (
        SELECT prev_type, next_type AS predicted FROM (
            SELECT prev_type, next_type,
                   row_number() OVER (PARTITION BY prev_type
                                      ORDER BY n DESC, next_type) AS rn
            FROM cnt
        ) WHERE rn = 1
    )
    SELECT c.prev_type, p.predicted,
           CAST(sum(c.n) AS BIGINT) AS n_transitions,
           CAST(sum(CASE WHEN c.next_type = p.predicted
                         THEN c.n ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(sum(CASE WHEN c.next_type = p.predicted
                         THEN c.n ELSE 0 END) AS DOUBLE) / sum(c.n)
               AS accuracy
    FROM cnt c JOIN pred p USING (prev_type)
    GROUP BY c.prev_type, p.predicted
    """,
)
def events_next_event_eval(spark, d):
    """Next-event predictor evaluation (r12): the majority-class
    baseline every sequence model must beat — predict the most likely
    next event type per current type (argmax of the transition counts,
    ties by name) and score it against ALL observed transitions,
    reporting per-state prediction, support and accuracy.  Counts are
    exact integers; accuracy is one exact division (unrounded, §5.3).
    The honest-evaluation shape: the model (argmax) and the eval join
    both derive from the same deterministic count matrix, so the
    oracle replays training AND scoring.

    Scale shape: one user_id-shuffled lag window builds transitions;
    everything after runs on the |types|^2 count matrix."""
    w = Window.partitionBy("user_id").orderBy(
        F.date_trunc("second", "ts"), "event_id")
    seq = (T(spark, d, "events")
           .select("user_id", "event_type",
                   F.lag("event_type").over(w).alias("prev_type"))
           .filter(F.col("prev_type").isNotNull()))
    cnt = (seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
           .agg(F.count("*").alias("n")))
    wp = Window.partitionBy("prev_type").orderBy(
        F.col("n").desc(), "next_type")
    pred = (cnt.withColumn("rn", F.row_number().over(wp))
            .filter("rn = 1")
            .select("prev_type", F.col("next_type").alias("predicted")))
    correct = F.when(F.col("next_type") == F.col("predicted"),
                     F.col("n")).otherwise(F.lit(0))
    return (cnt.join(pred, "prev_type")
            .groupBy("prev_type", "predicted")
            .agg(F.sum("n").cast("bigint").alias("n_transitions"),
                 F.sum(correct).cast("bigint").alias("n_correct"),
                 (F.sum(correct).cast("double") / F.sum("n"))
                 .alias("accuracy")))


@register(
    "events_gini_concentration",
    oracle="""
    WITH x AS (
        SELECT user_id, count(*) AS c FROM events
        WHERE user_id IS NOT NULL GROUP BY user_id
    ), ranked AS (
        SELECT c, row_number() OVER (ORDER BY c, user_id) AS i FROM x
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS tot,
               CAST(sum(i * c) AS BIGINT) AS weighted
        FROM ranked
    )
    SELECT n, tot,
           CAST(2 * weighted - (n + 1) * tot AS DOUBLE) / (n * tot) AS gini
    FROM s
    """,
)
def events_gini_concentration(spark, d):
    """Gini coefficient of activity concentration (r12): how unequal
    is event volume across users — the whale/abuse concentration
    readout (0 = uniform, ->1 = one user is the corpus).  The exact
    rank formulation G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over
    ascending-sorted counts with a user tiebreak: every term is an
    exact integer, the coefficient ONE exact division (unrounded,
    §5.3) — no trapezoid float accumulation.

    Scale shape: corpus -> per-user counts (one partial-agg shuffle);
    the rank runs over the users-sized relation (100 TB: histogram
    ranks, same formula on bin midpoints)."""
    x = (T(spark, d, "events")
         .filter(F.col("user_id").isNotNull())
         .groupBy("user_id").agg(F.count("*").alias("c")))
    ranked = x.select(
        "c", F.row_number().over(Window.orderBy("c", "user_id")).alias("i"))
    s = ranked.agg(F.count("*").alias("n"),
                   F.sum("c").alias("tot"),
                   F.sum(F.col("i") * F.col("c")).alias("weighted"))
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("tot").cast("bigint").alias("tot"),
        ((2 * F.col("weighted") - (F.col("n") + 1) * F.col("tot"))
         .cast("double") / (F.col("n") * F.col("tot"))).alias("gini"))


@register(
    "events_bounce_rate",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, date_trunc('second', ts) AS tss
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ), flagged AS (
        SELECT user_id, event_id, tss,
               CASE WHEN tss - lag(tss) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id)
    ), sess AS (
        SELECT user_id, tss,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY tss, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ), per_session AS (
        SELECT user_id, sid,
               CAST(min(tss) AS DATE) AS day,
               count(*) AS n_events
        FROM sess GROUP BY user_id, sid
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(*) FILTER (n_events = 1) AS BIGINT) AS n_bounces,
           CAST(count(*) FILTER (n_events = 1) AS DOUBLE) / count(*)
               AS bounce_rate
    FROM per_session GROUP BY day
    """,
)
def events_bounce_rate(spark, d):
    """Daily bounce rate (r12): 30-minute-gap sessionization (the
    window_sessionize_batch construction with an event_id tiebreak on
    BOTH windows — the gap lag AND the running session counter share
    the total (tss, event_id) order, so per-row session assignment is
    deterministic even with same-second per-user ties; r13 fix per
    advice), sessions attributed to the day of their FIRST event,
    bounce = a single-event session — the engagement headline every
    web-analytics dashboard leads with.  The rate is an exact integer
    division (unrounded, §5.3).

    Scale shape: ONE user_id shuffle shared by the gap lag and the
    running session counter, then a partial-agg collapse to sessions
    and a days-sized aggregate; nothing re-shuffles after the first
    exchange."""
    e = (T(spark, d, "events")
         .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
         .select("user_id", "event_id",
                 F.date_trunc("second", "ts").alias("tss")))
    w = Window.partitionBy("user_id").orderBy("tss", "event_id")
    flagged = e.withColumn(
        "new_session",
        F.when(F.col("tss").cast("long")
               - F.lag(F.col("tss").cast("long")).over(w) <= 1800, 0)
        .otherwise(1))
    sess = flagged.withColumn(
        "sid", F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("tss", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    per_session = (sess.groupBy("user_id", "sid")
                   .agg(F.to_date(F.min("tss")).alias("day"),
                        F.count("*").alias("n_events")))
    return (per_session.groupBy(F.col("day").cast("string").alias("day"))
            .agg(F.count("*").alias("n_sessions"),
                 F.count(F.when(F.col("n_events") == 1, 1))
                 .alias("n_bounces"),
                 (F.count(F.when(F.col("n_events") == 1, 1)).cast("double")
                  / F.count("*")).alias("bounce_rate")))
