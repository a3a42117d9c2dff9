"""Event-time windowed aggregations over `events` (Phase 5).

The reference has zero streaming (SURVEY.md §2.11) — these implement
the incremental-pipeline semantics the north star asks for, using the
same `window()` / `session_window()` expressions that run under
Structured Streaming. Batch and streaming share the expression, so the
oracle-checked batch results ARE the streaming semantics; the
stream-vs-batch equivalence itself is asserted in
tests/test_streaming.py with an availableNow file stream + memory sink
(plus watermark late-data handling).

Scale: windowed aggs shuffle on (window, key) — time-bucketed keys are
naturally balanced; watermarks bound state size in true streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loaders import load_table


@register(
    "tumbling_daily_counts",
    oracle="""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
    doc="Tumbling 1-day event-time window per event_type — window('ts','1 day') "
    "start equals the calendar day under UTC.",
)
def tumbling_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "streaming_dedup_events",
    oracle="""
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_unique
        FROM (SELECT DISTINCT event_id, event_type
              FROM (SELECT event_id, event_type FROM events
                    UNION ALL
                    SELECT event_id, event_type FROM events))
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("streaming", "dedup", "exact"),
    doc="At-least-once-delivery dedup semantics, batch-checked: the event "
    "feed unioned with itself (every row re-delivered once) collapses back "
    "to unique event_ids before counting. The true streaming twin is "
    "dedup_event_stream (dropDuplicatesWithinWatermark, state bounded by "
    "the watermark horizon) — stream-equals-batch is asserted in "
    "tests/test_streaming.py; this entry gives the semantics a DuckDB "
    "oracle. Dedup-then-aggregate shuffles ids once; the re-aggregation "
    "input is already unique per id.",
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    redelivered = ev.unionAll(ev)
    return (
        redelivered.dropDuplicates(["event_id", "event_type"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_unique"))
        .orderBy("event_type")
    )


@register(
    "stream_stream_join_events",
    oracle="""
        -- CAST to µs TIMESTAMP first: Spark's loader truncates the
        -- ns-precision fixture ts to microseconds, so comparing raw ns
        -- values here could disagree at window boundaries
        SELECT c.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM events c
        JOIN events e
          ON c.user_id = e.user_id
         AND CAST(e.ts AS TIMESTAMP)
             BETWEEN CAST(c.ts AS TIMESTAMP) - INTERVAL 10 MINUTE
                 AND CAST(c.ts AS TIMESTAMP)
        WHERE c.event_type = 'click' AND e.event_type = 'error'
        GROUP BY c.user_id
        ORDER BY c.user_id
    """,
    tags=("streaming", "join", "interval"),
    doc="Interval (stream-stream) join semantics, batch-checked: clicks "
    "paired with same-user errors in the preceding 10 minutes. The "
    "equi-key (user_id) carries the shuffle; the time bound is the "
    "residual — exactly the condition that lets Structured Streaming "
    "expire join state (a row older than the bound + watermark can never "
    "match again). The true streaming twin is clicks_with_recent_errors "
    "in stream_runner.py, asserted stream-equals-batch in "
    "tests/test_streaming.py.",
)
def stream_stream_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    return (
        clicks.join(
            errors,
            (F.col("c_user") == F.col("e_user"))
            & (F.col("e_ts") >= F.col("c_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("e_ts") <= F.col("c_ts")),
        )
        .groupBy(F.col("c_user").alias("user_id"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("user_id")
    )


@register(
    "sliding_window_traffic",
    oracle="""
        SELECT CAST(date_trunc('day', ts) - k.k * INTERVAL 1 DAY AS DATE) AS window_start,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users
        FROM events CROSS JOIN (VALUES (0), (1)) AS k(k)
        GROUP BY 1
    """,
    tags=("streaming", "window"),
    doc="Sliding window (2-day length, 1-day slide): each event lands in two "
    "windows. Oracle replicates Spark's window() bucketing by unioning the two "
    "shifted day-truncations.",
)
def sliding_window_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .select(F.col("w.start").cast("date").alias("window_start"), "n_events", "n_users")
    )


@register(
    "session_window_activity",
    oracle="""
        WITH cast_events AS (
            -- CAST to µs FIRST (in a subselect so the LAG below sees
            -- the cast value, not the raw ns column): same boundary-
            -- precision guard as above
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id FROM events
        ), flagged AS (
            SELECT user_id, ts, value, event_id,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
            FROM cast_events
        ), numbered AS (
            -- the running sum must order by the SAME (ts, event_id) key
            -- as the LAG: ordering peers by ts alone would let a
            -- same-timestamp boundary row fold into the wrong session
            SELECT user_id, ts, value,
                   CAST(SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
            FROM flagged
        )
        SELECT user_id, session_no, COUNT(*) AS n_events,
               CAST(MIN(ts) AS TIMESTAMP) AS session_start,
               ROUND(SUM(value), 2) AS sum_value
        FROM numbered
        WHERE user_id % 20 = 0
        GROUP BY user_id, session_no
    """,
    tags=("streaming", "session"),
    doc="Session windows (30-min gap) per user. Spark: native session_window(); "
    "oracle: classic gaps-and-islands (lag + running sum). Session numbering is "
    "per-user chronological so the two formulations align.",
)
def session_window_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    sessions = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
    w = W.partitionBy("user_id").orderBy("session_start")
    return sessions.withColumn("session_no", F.row_number().over(w)).select(
        "user_id",
        F.col("session_no").cast("bigint").alias("session_no"),
        "n_events",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        "sum_value",
    )


@register(
    "hourly_rollup_hypertable",
    oracle="""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
               event_type,
               COUNT(*) AS n_events,
               ROUND(AVG(value), 6) AS avg_value,
               ROUND(MAX(value), 2) AS max_value
        FROM events
        WHERE event_type IN ('purchase', 'error')
        GROUP BY 1, 2
    """,
    tags=("streaming", "rollup"),
    doc="Continuous-aggregate-style hourly rollup (hypertable pattern): the "
    "materialization query a streaming job would maintain incrementally.",
)
def hourly_rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .select(
            F.col("hour_start").cast("timestamp_ntz").alias("hour_start"),
            "event_type",
            "n_events",
            "avg_value",
            "max_value",
        )
    )


@register(
    "funnel_conversion",
    oracle="""
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN s1 USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > s1.t1
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN s2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY e.user_id
        )
        SELECT
            (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events) AS users_total,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS users_viewed,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS users_clicked_after,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS users_purchased_after,
            ROUND((SELECT COUNT(*) FROM s3) * 1.0
                  / (SELECT COUNT(*) FROM s1), 6) AS view_to_purchase_rate,
            -- Stage-time sums make the oracle ORDER-DISCRIMINATING: on
            -- the synthetic events table every user reaches every
            -- stage (all the counts above are |users| under ANY gate
            -- semantics — the r7 vacuous-funnel episode), but each
            -- user's first-click-after-first-view time shifts when a
            -- gate is dropped or weakened, so these sums catch it.
            (SELECT CAST(SUM(epoch_us(t2) // 1000000) AS BIGINT) FROM s2)
                AS sum_t2_s,
            (SELECT CAST(SUM(epoch_us(t3) // 1000000) AS BIGINT) FROM s3)
                AS sum_t3_s
    """,
    tags=("events", "funnel", "analytics"),
    doc="Ordered funnel conversion (view -> click -> purchase, each "
    "step strictly AFTER the previous): three per-user conditional-min "
    "aggregations chained by equi-joins on user_id — every stage hash-"
    "shuffles on the SAME key, so Catalyst reuses the partitioning and "
    "the funnel costs ~one shuffle of the events table regardless of "
    "depth. The product-analytics primitive (sequence matching without "
    "a per-user sort or any UDF).",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter("event_type = 'view'")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter("event_type = 'click'")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter("event_type = 'purchase'")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    # ONE driver action for the whole funnel: left-join the step frames
    # onto the user universe and count non-nulls in a single aggregate.
    # Every join keys on user_id, so each stage reuses the same hash
    # partitioning, and the s1/s2 subtrees shared between branches
    # collapse via ReuseExchange — versus four separate .count()
    # actions, which re-executed the chain's upstream stages (~6 scans
    # of the events table for one output row; invisible at sf0.1,
    # ruinous at 100 TB).
    return (
        ev.select("user_id")
        .distinct()
        .join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("users_total"),
            F.count("t1").alias("users_viewed"),
            F.count("t2").alias("users_clicked_after"),
            F.count("t3").alias("users_purchased_after"),
            F.when(
                F.count("t1") > 0,
                F.round(F.count("t3") * F.lit(1.0) / F.count("t1"), 6),
            ).alias("view_to_purchase_rate"),
            # epoch-second stage-time sums: the order-discriminating
            # outputs (see oracle comment). unix_timestamp over the NTZ
            # column resolves via the session timezone, pinned UTC in
            # session.py, so it equals DuckDB's naive epoch_us // 1e6.
            F.sum(F.unix_timestamp(F.col("t2"))).alias("sum_t2_s"),
            F.sum(F.unix_timestamp(F.col("t3"))).alias("sum_t3_s"),
        )
    )


@register(
    "retention_cohorts",
    oracle="""
        WITH cohorts AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT e.user_id, c.cohort_day,
                   datediff('day', c.cohort_day, CAST(e.ts AS DATE)) AS day_offset
            FROM events e JOIN cohorts c USING (user_id)
            WHERE CAST(e.ts AS DATE) >= c.cohort_day
        )
        SELECT CAST(cohort_day AS DATE) AS cohort_day,
               CAST(day_offset AS BIGINT) AS day_offset,
               CAST(COUNT(*) AS BIGINT) AS active_users
        FROM activity
        WHERE day_offset <= 3
        GROUP BY cohort_day, day_offset
        ORDER BY cohort_day, day_offset
    """,
    tags=("events", "retention", "analytics"),
    doc="Cohort retention: users bucketed by signup day, activity "
    "counted per (cohort, days-since-signup) offset — one broadcast-"
    "able cohort map joined to one distinct-per-day scan, the "
    "engagement-analytics primitive. Offsets capped at 3 days to keep "
    "the relation driver-small; the shape is offset-count-independent.",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    cohorts = (
        ev.filter("event_type = 'signup'")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("cohort_day"))
    )
    activity = (
        ev.join(cohorts, "user_id")
        .filter(F.col("ts").cast("date") >= F.col("cohort_day"))
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    return (
        activity.filter("day_offset <= 3")
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("active_users"))
        .select(
            "cohort_day",
            F.col("day_offset").cast("bigint").alias("day_offset"),
            "active_users",
        )
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "gapfill_forward",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d, ROUND(SUM(value), 2) AS v
            FROM events WHERE event_type IN ('view', 'purchase')
            GROUP BY event_type, CAST(ts AS DATE)
        ),
        days AS (
            SELECT CAST(unnest(generate_series(
                       (SELECT MIN(d) FROM daily),
                       (SELECT MAX(d) FROM daily),
                       INTERVAL 1 DAY)) AS DATE) AS d
        ),
        calendar AS (
            SELECT t.event_type, days.d
            FROM (SELECT DISTINCT event_type FROM daily) t, days
        ),
        joined AS (
            SELECT c.event_type, c.d, daily.v,
                   CASE WHEN daily.v IS NULL THEN 0 ELSE 1 END AS observed
            FROM calendar c LEFT JOIN daily
              ON daily.event_type = c.event_type AND daily.d = c.d
        )
        SELECT event_type, d,
               LAST_VALUE(v IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
               CAST(observed AS BIGINT) AS observed
        FROM joined
        ORDER BY event_type, d
    """,
    tags=("events", "timeseries", "analytics"),
    doc="Time-series gap filling with forward fill: a dense per-series "
    "calendar (sequence + explode) left-joins the observed daily sums, "
    "then last-non-null-value-wins per series (window IGNORE NULLS) — "
    "the standard dashboard/feature-engineering densification. Series "
    "count bounds the calendar explode; the window partitions per "
    "series so nothing funnels through one task.",
)
def gapfill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.round(F.sum("value"), 2).alias("v"))
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi")).first()
    calendar = (
        daily.select("event_type")
        .distinct()
        .crossJoin(
            spark.sql(
                f"SELECT explode(sequence(DATE'{bounds.lo}', DATE'{bounds.hi}', "
                "interval 1 day)) AS d"
            )
        )
    )
    joined = calendar.join(daily, ["event_type", "d"], "left").select(
        "event_type",
        "d",
        "v",
        F.when(F.col("v").isNull(), 0).otherwise(1).cast("bigint").alias("observed"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        joined.withColumn("v_filled", F.last("v", ignorenulls=True).over(w))
        .select("event_type", "d", "v_filled", "observed")
        .orderBy("event_type", "d")
    )
