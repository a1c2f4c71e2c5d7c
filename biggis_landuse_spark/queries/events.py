"""Streaming-surface operators in batch-parity form over `events`.

The reference only sketched its streaming path (commented Kafka plans,
TilePixelingExample.scala:74-94; UtilsKafka.scala:18-34). The engine
realizes it with Structured Streaming (biggis_landuse_spark.streaming);
these queries are the batch twins the DuckDB oracle can check — the
actual streaming execution of the same logic is tested in
tests/test_streaming.py (same operator library, readStream source).

Window starts are returned as epoch seconds (BIGINT) so hashing is
immune to timestamp-precision differences between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from biggis_landuse_spark.queries import load_tables, register


@register(
    "tumbling_window",
    oracle="""
    SELECT CAST(epoch(time_bucket(INTERVAL '5 minutes', ts)) AS BIGINT)
             AS window_start,
           event_type,
           CAST(count(*) AS BIGINT)  AS n,
           round(sum(value), 2)      AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="""Tumbling 5-minute window × event_type aggregate — batch parity of
    the Structured Streaming groupBy(window(ts,'5 minutes')) path
    (SURVEY.md §2.9).""",
    tags=("STREAM", "A6"),
    bench=True,
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "sliding_window",
    oracle="""
    SELECT window_start, CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
    FROM (
      SELECT CAST(epoch(time_bucket(INTERVAL '5 minutes', ts)) AS BIGINT)
               AS window_start, value FROM events
      UNION ALL
      SELECT CAST(epoch(time_bucket(INTERVAL '5 minutes', ts)) AS BIGINT) - 300
               AS window_start, value FROM events
    )
    GROUP BY 1
    """,
    doc="""Sliding window (10-minute width, 5-minute slide): each event lands
    in two windows. Oracle expands the window membership explicitly —
    exactly what Spark's window() explode does under the hood.""",
    tags=("STREAM",),
)
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "n",
            "sum_value",
        )
    )


@register(
    "sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id,
           CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT)                   AS n_events
    FROM sessions
    GROUP BY user_id
    """,
    doc="""Sessionization (30-min inactivity gap) via lag + running sum —
    batch twin of streaming session_window(ts, '30 minutes')
    (SURVEY.md §2.9). Ordering tie-broken by event_id.""",
    tags=("STREAM", "W"),
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    w_lag = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    marked = events.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w_lag).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w_lag))
                > 1800_000_000
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    sessions = marked.select(
        "user_id", F.sum("new_session").over(w_run).alias("session_id")
    )
    return sessions.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "dedup_in_window",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_distinct
    FROM (
      SELECT DISTINCT user_id, event_type,
             time_bucket(INTERVAL '1 minute', ts) AS minute_bucket
      FROM events
    )
    GROUP BY event_type
    """,
    doc="""Watermark-scoped dedup, batch twin: distinct (user, type, minute)
    — streaming form is dropDuplicates within watermark
    (SURVEY.md §2.9 late-data handling).""",
    tags=("STREAM", "P9"),
)
def dedup_in_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    return (
        events.select(
            "user_id",
            "event_type",
            F.window("ts", "1 minute").alias("w"),
        )
        .dropDuplicates(["user_id", "event_type", "w"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )


@register(
    "late_data_policy",
    oracle="""
    WITH horizon AS (
      SELECT max(ts) - INTERVAL '1 day' AS wm FROM events
    )
    SELECT CAST(count(*) FILTER (WHERE ts >= wm) AS BIGINT)  AS n_on_time,
           CAST(count(*) FILTER (WHERE ts <  wm) AS BIGINT)  AS n_late
    FROM events, horizon
    """,
    doc="""Late-data accounting relative to a watermark horizon (max(ts) -
    1 day) — the admission rule applied by withWatermark
    (SURVEY.md §2.9).""",
    tags=("STREAM",),
)
def late_data_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    wm = events.agg(
        (F.max("ts") - F.expr("INTERVAL 1 DAY")).alias("wm")
    )
    return events.crossJoin(F.broadcast(wm)).agg(
        F.count(F.when(F.col("ts") >= F.col("wm"), 1)).alias("n_on_time"),
        F.count(F.when(F.col("ts") < F.col("wm"), 1)).alias("n_late"),
    )


@register(
    "json_props_extract",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INT) % 10  AS k_mod,
           CAST(count(*) AS BIGINT)                      AS n,
           round(sum(value), 2)                          AS sum_value
    FROM events
    GROUP BY 1
    """,
    doc="""JSON attribute extraction + aggregate — the engine's JSON surface
    (reference stores JSON metadata via json4s, UtilsSVM.scala:215-220;
    attribute store S19).""",
    tags=("JSON", "S19"),
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    return (
        events.select(
            (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_mod"),
            "value",
        )
        .groupBy("k_mod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "asof_last_click",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    c AS (SELECT * FROM events WHERE event_type = 'click'),
    j AS (
      SELECT p.user_id, p.ts AS pts, c.ts AS cts
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT)   AS n_purchases,
           CAST(count(cts) AS BIGINT) AS n_matched,
           CAST(sum(epoch_us(pts) - epoch_us(cts)) AS BIGINT) AS sum_gap_us
    FROM j
    GROUP BY user_id
    """,
    doc="""As-of join: each purchase attaches the most recent prior click of
    the same user (operators.temporal.asof_join — union + one window
    sort per key, never a per-row inequality join), then per-user match
    stats. Oracle: DuckDB's native ASOF JOIN.""",
    tags=("ASOF", "W"),
    bench=True,
)
def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biggis_landuse_spark.operators.temporal import asof_join

    (events,) = load_tables(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts"
    )
    joined = asof_join(purchases, clicks, on="user_id", right_payload=[])
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("asof_ts_us").alias("n_matched"),
        F.sum(F.unix_micros("ts") - F.col("asof_ts_us"))
        .cast("long")
        .alias("sum_gap_us"),
    )


@register(
    "range_join_cooccur",
    oracle="""
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL '60 seconds'
    GROUP BY 1, 2
    """,
    doc="""Bounded range join: event pairs of the same user within 60s,
    cross-tabbed by type pair (operators.temporal.range_join — the
    two-bucket equi-join formulation; the inequality is only a residual
    filter, so the plan is a hash join, never nested-loop).""",
    tags=("RANGE", "J"),
    bench=True,
)
def range_join_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biggis_landuse_spark.operators.temporal import range_join

    (events,) = load_tables(spark, sf_dir, "events")
    e = events.select("user_id", "ts", "event_type")
    pairs = range_join(e, e, on="user_id", band_us=60_000_000)
    return (
        pairs.groupBy(
            F.col("l_event_type").alias("type_a"),
            F.col("r_event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "event_gaps",
    oracle="""
    WITH g AS (
      SELECT event_type,
             (epoch_us(ts) - epoch_us(lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts))) / 1e6 AS gap_s
      FROM events
    )
    SELECT event_type,
           CAST(count(gap_s) AS BIGINT) AS n_gaps,
           round(avg(gap_s), 6)         AS avg_gap_s,
           round(max(gap_s), 6)         AS max_gap_s
    FROM g
    GROUP BY event_type
    """,
    doc="""lag/lead surface: per-user inter-arrival gap (lag window),
    aggregated by the later event's type — the ranking/offset window
    family the reference lacks entirely (SURVEY.md §2.5).""",
    tags=("W",),
)
def event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    g = events.select(
        "event_type",
        (
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) / 1e6
        ).alias("gap_s"),
    )
    return g.groupBy("event_type").agg(
        F.count("gap_s").alias("n_gaps"),
        F.round(F.avg("gap_s"), 6).alias("avg_gap_s"),
        F.round(F.max("gap_s"), 6).alias("max_gap_s"),
    )


@register(
    "stream_enrich_segment",
    oracle="""
    SELECT c.c_mktsegment,
           e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(e.value), 2)   AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment, e.event_type
    """,
    doc="""Stream-static enrichment join (streaming/windows.py::
    enrich_with_dim): events pick up the customer dimension via a
    broadcast join — the stream side never shuffles for the join; only
    the tiny post-enrichment aggregate state shuffles. Batch twin of
    the Structured Streaming stream⋈static path; parity with the live
    readStream execution is asserted in tests/test_streaming.py.""",
    tags=("STREAM", "J"),
)
def stream_enrich_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biggis_landuse_spark.streaming.windows import enrich_with_dim

    events, customer = load_tables(spark, sf_dir, "events", "customer")
    enriched = enrich_with_dim(
        events,
        customer.select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        ),
        on=["user_id"],
    )
    return enriched.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "latest_event_per_user",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_users,
           round(sum(last_value), 2) AS sum_last_value
    FROM (
      SELECT user_id,
             arg_max(event_type, epoch_us(ts)) AS event_type,
             arg_max(value, epoch_us(ts))      AS last_value
      FROM events
      GROUP BY user_id
    )
    GROUP BY event_type
    """,
    doc="""Argmax aggregation (max_by): each user's LATEST event,
    summarized by its type — the "current state per key" pattern of a
    CDC/state snapshot. One partial-aggregated shuffle (max_by
    combines map-side); no ranking window, no self-join. (user_id, ts)
    is unique in the data, so the epoch ordering is deterministic.""",
    tags=("A", "W"),
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    order = F.unix_micros("ts")
    latest = events.groupBy("user_id").agg(
        F.max_by("event_type", order).alias("event_type"),
        F.max_by("value", order).alias("last_value"),
    )
    return latest.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.sum("last_value"), 2).alias("sum_last_value"),
    )


@register(
    "scd2_state_history",
    oracle="""
    WITH hist AS (
      SELECT user_id, event_type,
             epoch_us(ts) AS vf,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS vt
      FROM events
    )
    SELECT event_type,
           CAST(count(*) FILTER (WHERE vt IS NOT NULL) AS BIGINT)
             AS n_closed,
           CAST(count(*) FILTER (WHERE vt IS NULL) AS BIGINT)
             AS n_open,
           CAST(coalesce(sum(vt - vf), 0) AS BIGINT) AS total_us
    FROM hist
    GROUP BY event_type
    """,
    doc="""SCD2 / state-history build: each event opens a validity
    interval [ts, next event's ts) for its user — the change-data-
    capture "history table" derived from an append-only event log with
    ONE lead() window per user partition (no self-join). Durations
    summed in exact integer microseconds; the still-open current state
    is counted separately (its NULL end is the SCD2 open row). The
    ordering tie-breaks on event_id so the history is deterministic
    under concurrent timestamps.""",
    tags=("W", "STREAM"),
)
def scd2_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    vf = F.unix_micros("ts")
    vt = F.lead(vf).over(
        W.partitionBy("user_id").orderBy(vf, F.col("event_id"))
    )
    hist = events.select(
        "event_type", vf.alias("vf"), vt.alias("vt")
    )
    return hist.groupBy("event_type").agg(
        F.count(F.when(F.col("vt").isNotNull(), 1)).alias("n_closed"),
        F.count(F.when(F.col("vt").isNull(), 1)).alias("n_open"),
        F.coalesce(F.sum(F.col("vt") - F.col("vf")), F.lit(0))
        .cast("long")
        .alias("total_us"),
    )


@register(
    "funnel_stages",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_click_after,
           CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_purchase_after
    """,
    doc="""Ordered funnel (view → later click → later purchase): each
    stage is a per-user min-timestamp aggregate conditioned on the
    previous stage's time. Scale shape: every aggregate AND every join
    keys on user_id, so the whole funnel is ONE hash-partitioning by
    user reused across stages (co-partitioned joins, no re-shuffle of
    the event log per stage) — never a per-user sort of all events or
    a sequential scan. The behavioral-analytics companion of
    sessionize/scd2 on the streaming surface.""",
    tags=("STREAM", "J", "A"),
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    s1 = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        events.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        events.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_click_after")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchase_after")))
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH days AS (
      SELECT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
      FROM events
    ),
    firsts AS (
      SELECT user_id, min(d) // 7 AS cohort_week FROM days GROUP BY user_id
    ),
    weekly AS (
      SELECT DISTINCT user_id, d // 7 AS wk FROM days
    )
    SELECT CAST(cohort_week AS BIGINT)      AS cohort_week,
           CAST(wk - cohort_week AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT)         AS n_active
    FROM weekly JOIN firsts USING (user_id)
    GROUP BY 1, 2
    """,
    doc="""Weekly cohort retention: users bucketed by first-activity
    week, counted in each later activity week. All keys are integer
    epoch-day arithmetic (no timezone-dependent truncation), the
    cohort assignment and the activity dedup both hash-partition on
    user_id (one exchange family, co-partitioned join), and the final
    matrix is |cohorts| × |offsets| — tiny. The standard
    growth-analytics rollup over an append-only event log.""",
    tags=("STREAM", "A"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    days = events.select(
        "user_id", F.unix_date(F.to_date("ts")).alias("d")
    )
    firsts = days.groupBy("user_id").agg(
        F.expr("min(d) div 7").alias("cohort_week")
    )
    weekly = days.select(
        "user_id", F.expr("d div 7").alias("wk")
    ).distinct()
    return (
        weekly.join(firsts, "user_id")
        .groupBy(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            (F.col("wk") - F.col("cohort_week")).cast("long").alias(
                "week_offset"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "asof_next_purchase",
    oracle="""
    WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
    p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    j AS (
      SELECT c.user_id, c.ts AS cts, p.ts AS pts, p.value AS pv
      FROM c ASOF LEFT JOIN p
        ON c.user_id = p.user_id AND c.ts <= p.ts
    ),
    tol AS (
      SELECT user_id,
             CASE WHEN epoch_us(pts) - epoch_us(cts) <= 3600000000
                  THEN pv END AS pv,
             CASE WHEN epoch_us(pts) - epoch_us(cts) <= 3600000000
                  THEN epoch_us(pts) - epoch_us(cts) END AS gap_us
      FROM j
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT)    AS n_clicks,
           CAST(count(pv) AS BIGINT)   AS n_converted,
           round(sum(pv), 2)           AS sum_next_value,
           CAST(sum(gap_us) AS BIGINT) AS sum_gap_us
    FROM tol GROUP BY user_id
    """,
    doc="""FORWARD as-of join (pandas merge_asof direction='forward'):
    each click attaches the next purchase of the same user within one
    hour — the click-to-conversion attribution shape. Same single-
    shuffle union+window plan as the backward as-of, on the negated
    epoch (operators.temporal.asof_join); per-user conversion stats.
    Oracle: DuckDB's native ASOF JOIN with the <= direction.""",
    tags=("ASOF", "W"),
)
def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biggis_landuse_spark.operators.temporal import asof_join

    (events,) = load_tables(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts"
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    j = asof_join(
        clicks,
        purchases,
        on="user_id",
        right_payload=["value"],
        direction="forward",
        tolerance_us=3_600_000_000,
        tiebreak="event_id",
    )
    gap = F.col("asof_ts_us") - F.unix_micros(F.col("ts"))
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count("asof_value").alias("n_converted"),
        F.round(F.sum("asof_value"), 2).alias("sum_next_value"),
        F.sum(gap).cast("long").alias("sum_gap_us"),
    )


@register(
    "concurrent_events",
    oracle="""
    WITH b AS (
      SELECT event_type, epoch_us(ts)               AS t,  1 AS delta
      FROM events
      UNION ALL
      SELECT event_type, epoch_us(ts) + 300000000   AS t, -1 AS delta
      FROM events
    ), c AS (
      SELECT event_type,
             sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta)
               AS conc
      FROM b
    )
    SELECT event_type,
           CAST(max(conc) AS BIGINT) AS max_concurrent
    FROM c GROUP BY event_type
    """,
    doc="""Sweep-line interval concurrency: every event opens a 5-min
    activity interval [ts, ts+300s); per event_type, the peak number
    of simultaneously-open intervals. Classic +1/-1 boundary explode
    followed by a running sum — but routed through
    operators.ranking.grouped_cumsum (range-partition on (type, t),
    partition-local window, broadcast per-group predecessor offsets)
    so a hot event_type never serializes into one task. The default
    RANGE window frame makes ties (equal (t, delta)) collapse to the
    same running value on both engines, so ends at t close before
    starts at t open (half-open intervals, delta sorts -1 first).""",
    tags=("STREAM", "W"),
    bench=True,
)
def concurrent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biggis_landuse_spark.operators.ranking import grouped_cumsum

    (events,) = load_tables(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    starts = events.select(
        "event_type", us.alias("t"), F.lit(1).alias("delta")
    )
    ends = events.select(
        "event_type", (us + 300_000_000).alias("t"), F.lit(-1).alias("delta")
    )
    conc = grouped_cumsum(
        starts.unionByName(ends),
        group_cols=["event_type"],
        order_cols=["t", "delta"],
        value_col="delta",
        out_col="conc",
    )
    return conc.groupBy("event_type").agg(
        F.max("conc").cast("long").alias("max_concurrent")
    )


@register(
    "trending_event_types",
    oracle="""
    WITH c AS (
      SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT)
               AS window_start,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, CAST(n AS BIGINT) AS n,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY window_start ORDER BY n DESC, event_type) AS rank
      FROM c
    ) WHERE rank <= 3
    """,
    doc="""Windowed trending top-k: per tumbling hour, the 3 most
    frequent event types (count desc, name tiebreak). The streaming
    realization is the same groupBy(window(ts)) count with the rank
    applied on the complete-mode sink; in batch the ranking window
    partitions by window_start, so parallelism scales with the number
    of hours, and the count aggregate partial-aggregates map-side —
    two narrow-keyed shuffles, no global sort.""",
    tags=("STREAM", "W"),
)
def trending_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    counts = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
        )
    )
    w = W.partitionBy("window_start").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
    )


@register(
    "value_outliers",
    oracle="""
    WITH stats AS (
      SELECT event_type, round(avg(value), 6) AS mu,
             round(stddev_samp(value), 6) AS sd
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (abs(e.value - s.mu) > 3 * s.sd)
                AS BIGINT)          AS n_outliers,
           round(max(abs(e.value - s.mu) / s.sd), 4) AS max_abs_z
    FROM events e JOIN stats s USING (event_type)
    GROUP BY e.event_type
    """,
    doc="""Per-group z-score outlier detection on the event stream: the
    two-pass grouped-stats shape (pass 1 reduces each event_type to
    (mu, sd) — a tiny relation broadcast back; pass 2 flags outliers
    scan-locally and re-aggregates). The fact table is scanned twice
    but shuffled only for the two partial-aggregated groupBys; the
    stats join is a broadcast, so at 100 TB nothing wide moves.
    Determinism: mu and sd are 6dp-rounded at the broadcast sync point
    (a boundary value must not flip the exact-integer n_outliers
    across engines or partition orders), and the outlier test is the
    SAME IEEE expression the oracle evaluates —
    abs(v - mu) > 3*sd, not a division-form rearrangement. The
    sqrt-bearing max_abs_z rounds at 4dp per the float discipline.""",
    tags=("A2", "STREAM"),
)
def value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_samp("value"), 6).alias("sd"),
    )
    dev = F.abs(F.col("value") - F.col("mu"))
    # try_divide only in the reported z (a constant-valued event_type,
    # sd = 0, yields NULL instead of an ANSI DIVIDE_BY_ZERO job kill);
    # the count compares multiplication-form exactly like the oracle
    z = F.try_divide(dev, F.col("sd"))
    return (
        events.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # count(when(...)) not sum(cast): a single-row event_type
            # has NULL stddev_samp, and summing only NULLs would yield
            # NULL where the oracle's count(*) FILTER yields 0
            F.count(F.when(dev > 3 * F.col("sd"), 1)).alias("n_outliers"),
            F.round(F.max(z), 4).alias("max_abs_z"),
        )
    )


@register(
    "events_resample_dense",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS h,
             count(*) AS n, sum(value) AS sv
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT min(h) AS h0, max(h) AS h1 FROM b),
    types AS (SELECT DISTINCT event_type FROM b),
    grid AS (
      SELECT event_type, unnest(range(h0, h1 + 3600, 3600)) AS h
      FROM types, span
    )
    SELECT g.event_type, g.h AS bucket_start,
           CAST(COALESCE(b.n, 0) AS BIGINT) AS n,
           round(COALESCE(b.sv, 0), 2)      AS sum_value
    FROM grid g LEFT JOIN b USING (event_type, h)
    """,
    doc="""Dense time-series resample (gap filling): hourly buckets per
    event_type with EXPLICIT zero rows for silent hours — the shape
    every downstream forecasting/charting consumer needs. The sparse
    aggregate reduces the fact table first (partial-aggregated, tiny
    result); the dense grid is synthesized from a 1-row global span ×
    the distinct type list (|types| × |hours| rows — metadata-sized,
    never fact-sized) and left-joins the sparse counts. At 100 TB the
    only fact-side cost is the one groupBy; densification never
    touches the raw events.""",
    tags=("STREAM", "A"),
)
def events_resample_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    b = (
        events.groupBy(
            "event_type",
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("h"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    )
    span = b.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    types = b.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("h0"), F.col("h1"), F.lit(3600))
            ).alias("h"),
        )
    )
    return grid.join(b, ["event_type", "h"], "left").select(
        "event_type",
        F.col("h").alias("bucket_start"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        F.round(F.coalesce("sv", F.lit(0)), 2).alias("sum_value"),
    )


@register(
    "skew_safe_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY event_type
    """,
    doc="""Exact per-type distinct-user count through the skew-safe
    two-phase operator (operators/skew.py salted_distinct_count):
    phase 1 counts distinct within (key, hash(value) % 32) so a hot
    event_type fans across 32 reducers instead of one; the value-hash
    salt guarantees no user spans two salts, so phase-2 sums are
    exact — same answer as a naive COUNT(DISTINCT), which is exactly
    what the oracle runs. This is the query shape where a single
    viral key melts an unsalted reducer at 100 TB.""",
    tags=("A", "SKEW"),
)
def skew_safe_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biggis_landuse_spark.operators.skew import salted_distinct_count

    (events,) = load_tables(spark, sf_dir, "events")
    return salted_distinct_count(events, "event_type", "user_id")


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM events
    ),
    cnt AS (
      SELECT src, dst, count(*) AS c FROM seq
      WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    tot AS (SELECT src, sum(c) AS t FROM cnt GROUP BY src)
    SELECT cnt.src, cnt.dst,
           CAST(c AS BIGINT)                      AS n,
           round(c / CAST(t AS DOUBLE), 6)        AS p
    FROM cnt JOIN tot USING (src)
    """,
    doc="""First-order Markov transition matrix over per-user event
    sequences: P(next = dst | current = src) with exact counts — the
    behavioral-model shape behind next-event prediction and anomaly
    scoring. One window (partitioned by user_id, co-partitioned with
    every other per-user analytic) pairs consecutive events; the
    count and row-normalization aggregates run over the tiny
    |types|² relation. Ordering ties break on event_id so the
    sequence is identical on both engines.""",
    tags=("STREAM", "W"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    cnt = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("src").agg(F.sum("c").alias("t"))
    return cnt.join(tot, "src").select(
        "src",
        "dst",
        F.col("c").cast("long").alias("n"),
        F.round(F.col("c") / F.col("t").cast("double"), 6).alias("p"),
    )


@register(
    "value_outliers_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS m
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, m, median(abs(e.value - m)) AS mad
      FROM events e JOIN med USING (event_type)
      GROUP BY e.event_type, m
    )
    SELECT e.event_type,
           round(m, 6)   AS med,
           round(mad, 6) AS mad,
           CAST(count(*) FILTER (abs(e.value - m) > 3 * 1.4826 * mad)
                AS BIGINT) AS n_outliers
    FROM events e JOIN mad USING (event_type)
    GROUP BY e.event_type, m, mad
    """,
    doc="""Robust outlier detection via median absolute deviation:
    |x − median| > 3·1.4826·MAD per event_type — the heavy-tail-safe
    companion to the z-score pass (value_outliers), immune to the
    outliers it hunts. Two grouped exact medians (each one
    partial-pass percentile shuffle over the fact) reduce to a
    per-type stats row that broadcasts back for the scan-local flag
    pass; the 1.4826 factor rescales MAD to σ under normality.""",
    tags=("A2", "STREAM"),
)
def value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(F.median("value").alias("m"))
    mad = (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "m")
        .agg(F.median(F.abs(F.col("value") - F.col("m"))).alias("mad"))
    )
    return (
        events.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "m", "mad")
        .agg(
            F.sum(
                (
                    F.abs(F.col("value") - F.col("m"))
                    > 3 * 1.4826 * F.col("mad")
                ).cast("long")
            ).alias("n_outliers")
        )
        .select(
            "event_type",
            F.round("m", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n_outliers",
        )
    )


@register(
    "linear_attribution",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    ),
    m AS (
      SELECT p.event_id, p.value, c.ts AS cts,
             count(*) OVER (PARTITION BY p.event_id) AS nc
      FROM p JOIN c ON p.user_id = c.user_id
        AND epoch_us(c.ts) >  epoch_us(p.ts) - 3600000000
        AND epoch_us(c.ts) <= epoch_us(p.ts)
    )
    SELECT CAST(hour(cts) AS BIGINT)   AS click_hour,
           CAST(count(*) AS BIGINT)    AS n_touches,
           round(sum(value / nc), 2)   AS credit
    FROM m GROUP BY 1
    """,
    doc="""Linear multi-touch attribution: every click in the hour
    before a purchase splits that purchase's value equally
    (value / n_touches), reported by click hour-of-day — the
    marketing-credit shape. Candidate (purchase, click) pairs come
    from operators.temporal.range_join's bucketed-band equi-join
    (backward 1-hour band — never an inequality nested loop); the
    per-purchase touch count is a window over the purchase id
    (co-partitioned with the join output), and the credit rollup is
    one tiny groupBy. The oracle brute-forces the same band with a
    DuckDB inequality join.""",
    tags=("ASOF", "W"),
)
def linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biggis_landuse_spark.operators.temporal import range_join

    (events,) = load_tables(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts"
    )
    pairs = range_join(
        purchases,
        clicks,
        on="user_id",
        band_us=0,
        band_before_us=3_600_000_000,
    )
    w = W.partitionBy("l_event_id")
    m = pairs.select(
        "l_event_id",
        "l_value",
        F.col("r_ts").alias("cts"),
        F.count(F.lit(1)).over(w).alias("nc"),
    )
    return m.groupBy(F.hour("cts").cast("long").alias("click_hour")).agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.round(F.sum(F.col("l_value") / F.col("nc")), 2).alias("credit"),
    )


@register(
    "event_path_trigrams",
    oracle="""
    WITH seq AS (
      SELECT event_type AS a,
             lead(event_type, 1) OVER w AS b,
             lead(event_type, 2) OVER w AS c
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT a || '>' || b || '>' || c AS path,
           CAST(n AS BIGINT) AS n
    FROM (
      SELECT a, b, c, count(*) AS n,
             row_number() OVER (
               ORDER BY count(*) DESC, a || '>' || b || '>' || c) AS rn
      FROM seq WHERE b IS NOT NULL AND c IS NOT NULL
      GROUP BY a, b, c
    ) WHERE rn <= 10
    """,
    doc="""Behavioral path mining: the 10 most frequent 3-step
    event-type sequences across all user journeys — the "common
    paths" report behind funnel design. One user-partitioned window
    produces the trigrams (two leads over the same sort — a single
    exchange, co-partitioned with every per-user analytic), the count
    is a partial-aggregated shuffle over the tiny |types|³ keyspace,
    and the top-10 cut ranks that keyspace-sized relation, not the
    event log.""",
    tags=("STREAM", "W"),
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    ).where(F.col("b").isNotNull() & F.col("c").isNotNull())
    path = F.concat_ws(">", "a", "b", "c")
    counts = seq.groupBy("a", "b", "c").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.select(path.alias("path"), "n")
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(10)
    )


@register(
    "longest_event_streak",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id)
           - row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS island
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type, count(*) AS run_len
      FROM seq GROUP BY user_id, event_type, island
    )
    SELECT event_type,
           CAST(max(run_len) AS BIGINT)              AS longest_run,
           CAST(count(*) FILTER (run_len >= 3) AS BIGINT) AS n_runs_3plus
    FROM runs GROUP BY event_type
    """,
    doc="""Gaps-and-islands: the longest run of consecutive same-type
    events per user, aggregated per type — the streak/retention-run
    shape (also the classic interview pattern, done distributed). The
    two row_numbers share ONE user-partitioned exchange (same
    partition key, Spark reuses it), the island difference is
    scan-local, and run lengths reduce with exact integer counts.
    Ordering tie-broken by event_id so islands are engine-identical.""",
    tags=("STREAM", "W"),
)
def longest_event_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias(
            "island"
        ),
    )
    runs = seq.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.groupBy("event_type").agg(
        F.max("run_len").cast("long").alias("longest_run"),
        F.sum((F.col("run_len") >= 3).cast("long")).alias("n_runs_3plus"),
    )


@register(
    "cusum_drift",
    oracle="""
    WITH med AS (
      SELECT event_type,
             CAST(round(median(value) * 100) AS BIGINT) AS med_c
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.ts, e.event_id,
             CAST(round(e.value * 100) AS BIGINT) - med_c AS d
      FROM events e JOIN med USING (event_type)
    ),
    cs AS (
      SELECT event_type,
             sum(d) OVER (PARTITION BY event_type
                          ORDER BY ts, event_id) AS c
      FROM dev
    )
    SELECT event_type,
           CAST(max(c) AS BIGINT) AS max_cusum_cents,
           CAST(min(c) AS BIGINT) AS min_cusum_cents
    FROM cs GROUP BY event_type
    """,
    doc="""CUSUM drift detection: per event_type, the running sum of
    deviations from the type median, whose max/min excursions locate
    upward/downward level shifts (Page 1954). Values are 2dp, so
    cents-vs-median-cents deviations are exact integers and the
    prefix sums — routed through operators/ranking.py grouped_cumsum
    (range-partitioned, hot types never serialize) — are whole-number
    arithmetic, invariant to partitioning. The (ts, event_id) order
    ties the sequence down on both engines.""",
    tags=("STREAM", "W"),
)
def cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biggis_landuse_spark.operators.ranking import grouped_cumsum

    (events,) = load_tables(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.round(F.median("value") * 100).cast("long").alias("med_c")
    )
    dev = events.join(F.broadcast(med), "event_type").select(
        "event_type",
        "ts",
        "event_id",
        (F.round(F.col("value") * 100).cast("long") - F.col("med_c")).alias(
            "d"
        ),
    )
    cs = grouped_cumsum(
        dev,
        group_cols=["event_type"],
        order_cols=["ts", "event_id"],
        value_col="d",
        out_col="c",
    )
    return cs.groupBy("event_type").agg(
        F.max("c").cast("long").alias("max_cusum_cents"),
        F.min("c").cast("long").alias("min_cusum_cents"),
    )


_T0_HOURS = 473352  # 2024-01-01 00:00 UTC in whole hours (1704067200/3600)


@register(
    "ols_trend",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) - {_T0_HOURS} AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS DOUBLE)   AS n,
             CAST(sum(x) AS DOUBLE)     AS sx,
             CAST(sum(y) AS DOUBLE)     AS sy,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(x * y) AS DOUBLE) AS sxy
      FROM b GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS slope_cents_per_hour,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
             AS intercept_cents
    FROM s
    """,
    doc="""Per-group OLS trend line over the event stream: value (in
    exact integer cents) regressed on event hour. One partial-aggregated
    groupBy reduces the fact table to five EXACT integer sums per group
    (x in whole hours since 2024-01-01 keeps x*x and x*y far inside
    BIGINT; y in cents); the normal-equation slope/intercept then
    combine those sums with a fixed scalar float expression — identical
    inputs and identical IEEE op order on both engines, so the 6dp
    rounding is stable (the SCALING.md exact-integer-sums rule applied
    to regression). At 100 TB this is one map-side-combined shuffle of
    5 numbers per group — the cheapest possible trend computation.""",
    tags=("A2", "ML", "STREAM"),
)
def ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    b = events.select(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600) - _T0_HOURS).alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    s = b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.try_divide(num, den)
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope_cents_per_hour"),
        F.round(
            F.try_divide(F.col("sy") - slope * F.col("sx"), F.col("n")), 6
        ).alias("intercept_cents"),
    )


@register(
    "interval_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id,
             epoch_us(ts) // 1000000                        AS s,
             epoch_us(ts) // 1000000 + 1 + (event_id % 300) AS e
      FROM events
    ),
    marked AS (
      SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_e
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             sum(CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM marked
    ),
    spans AS (
      SELECT user_id, island, max(e) - min(s) AS covered
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT)     AS n_islands,
           CAST(sum(covered) AS BIGINT) AS covered_seconds
    FROM spans GROUP BY user_id
    """,
    doc="""Interval-union coverage per user (total seconds covered by
    overlapping activity intervals, merged): the classic sweep-line —
    running max-end window detects island starts, a running sum
    numbers islands, one aggregate per island, one per user. Intervals
    synthesized deterministically from the event stream (duration =
    1 + event_id % 300 s). Everything is exact integer seconds — no
    float anywhere. Scale: windows hash-partition by user (the
    gaps-and-islands shape longest_event_streak already carries); a
    pathologically hot user routes through grouped_cumsum
    (operators/ranking.py) with the same semantics.""",
    tags=("STREAM", "W"),
)
def interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    # integer microsecond floor-division on BOTH engines: DuckDB's
    # epoch() is fractional DOUBLE seconds and CAST rounds, which
    # flips interval boundaries by one second vs Spark's truncation
    sec = F.expr("unix_micros(ts) div 1000000")
    iv = events.select(
        "user_id",
        sec.alias("s"),
        (sec + 1 + (F.col("event_id") % 300)).alias("e"),
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    marked = iv.withColumn("prev_max_e", F.max("e").over(w_prev))
    islands = marked.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_max_e").isNull()
                | (F.col("s") > F.col("prev_max_e")),
                1,
            ).otherwise(0)
        ).over(w_run),
    )
    spans = islands.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("covered")
    )
    return spans.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("covered").cast("long").alias("covered_seconds"),
    )


@register(
    "seasonal_naive_backtest",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             epoch_us(ts) // 3600000000 AS h,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           round(avg(abs(a.cents - b.cents)) / 100.0, 6) AS mae,
           round(avg(a.cents - b.cents) / 100.0, 6)      AS bias
    FROM hourly a JOIN hourly b
      ON a.event_type = b.event_type AND a.h = b.h + 24
    GROUP BY a.event_type
    """,
    doc="""Seasonal-naive forecast backtest: predict each hour's total
    value with the same hour one day earlier and report MAE/bias per
    event_type — the baseline every forecasting pipeline must beat,
    and the cheapest possible backtest plan: one partial-aggregated
    hourly rollup (fact table touched once), a self-equi-join on the
    shifted hour key over the |hours × types| relation (tiny), and a
    per-type aggregate. Hourly sums are EXACT integer cents, so the
    error aggregates are ratios of exact integers — 6dp rounding is
    deterministic on both engines (SCALING.md exact-integer rule).""",
    tags=("STREAM", "A2", "ML"),
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("h"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    a = hourly.select(
        "event_type", "h", F.col("cents").alias("actual")
    )
    b = hourly.select(
        "event_type",
        (F.col("h") + 24).alias("h"),
        F.col("cents").alias("pred"),
    )
    joined = a.join(b, ["event_type", "h"])
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.round(
            F.avg(F.abs(F.col("actual") - F.col("pred"))) / 100.0, 6
        ).alias("mae"),
        F.round(F.avg(F.col("actual") - F.col("pred")) / 100.0, 6).alias(
            "bias"
        ),
    )


_SEQ_LEN = 20


@register(
    "user_event_sequences",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS seq_len,
           string_agg(event_type, '>' ORDER BY rn) AS seq
    FROM ranked WHERE rn <= {_SEQ_LEN}
    GROUP BY user_id
    """,
    doc="""Per-user behavioral sequences (the feature a sequence/
    recommendation model trains on): each user's first {n} events in
    deterministic (ts, event_id) order joined into one string. Scale
    contract: the ranking window TRUNCATES to {n} BEFORE the
    collect, so per-user aggregation state is bounded by the sequence
    cap — a hot user never accumulates an unbounded list (the
    difference between this and a naive collect_list-then-slice). One
    user-keyed window pass + one bounded aggregate.""",
    tags=("STREAM", "PIPELINE", "ML"),
)
def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = events.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= _SEQ_LEN)
    return ranked.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("seq_len"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("seq"),
    )


@register(
    "funnel_time_to_convert",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, s1.t1, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id, s1.t1
    ),
    s3 AS (
      SELECT e.user_id, s2.t1, s2.t2, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id, s2.t1, s2.t2
    ),
    deltas AS (
      SELECT 'view_to_click' AS hop,
             (epoch_us(t2) - epoch_us(t1)) // 1000000 AS secs
      FROM s2
      UNION ALL
      SELECT 'click_to_purchase',
             (epoch_us(t3) - epoch_us(t2)) // 1000000
      FROM s3
    ),
    ranked AS (
      SELECT hop, secs,
             row_number() OVER (PARTITION BY hop ORDER BY secs) AS rn,
             count(*) OVER (PARTITION BY hop) AS n
      FROM deltas
    )
    SELECT hop,
           CAST(max(n) AS BIGINT) AS n_users,
           CAST(min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                         THEN secs END) AS BIGINT) AS p50_secs,
           CAST(min(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                         THEN secs END) AS BIGINT) AS p90_secs,
           CAST(max(secs) AS BIGINT) AS max_secs
    FROM ranked GROUP BY hop
    """,
    doc="""Funnel latency: per-hop time-to-convert percentiles (p50 /
    p90 / max of the view→click and click→purchase deltas in exact
    integer seconds). Same user-co-partitioned stage aggregates as
    funnel_stages, then two tiny per-hop percentile selections — the
    deltas relation is converted-user-sized, far below the fact
    table. Percentiles are EXPLICIT rank-at-ceil(q*n) selections
    (engine builtins disagree at even counts: Spark percentile_disc
    vs DuckDB quantile_disc pick different elements), so both engines
    select the identical exact-integer element.""",
    tags=("STREAM", "A2", "W"),
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    s1 = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        events.join(s1, "user_id")
        .where((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id", "t1")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        events.join(s2, "user_id")
        .where(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2"))
        )
        .groupBy("user_id", "t1", "t2")
        .agg(F.min("ts").alias("t3"))
    )
    d1 = s2.select(
        F.lit("view_to_click").alias("hop"),
        F.expr("(unix_micros(t2) - unix_micros(t1)) div 1000000").alias(
            "secs"
        ),
    )
    d2 = s3.select(
        F.lit("click_to_purchase").alias("hop"),
        F.expr("(unix_micros(t3) - unix_micros(t2)) div 1000000").alias(
            "secs"
        ),
    )
    deltas = d1.unionByName(d2)
    w_rank = W.partitionBy("hop").orderBy("secs")
    w_all = W.partitionBy("hop")
    ranked = deltas.select(
        "hop",
        "secs",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )

    def at_q(q: float):
        return F.min(
            F.when(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("long"),
                F.col("secs"),
            )
        ).cast("long")

    return ranked.groupBy("hop").agg(
        F.max("n").cast("long").alias("n_users"),
        at_q(0.5).alias("p50_secs"),
        at_q(0.9).alias("p90_secs"),
        F.max("secs").cast("long").alias("max_secs"),
    )


@register(
    "ewma_event_rate",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             epoch_us(ts) // 3600000000 AS h,
             CAST(count(*) AS BIGINT)   AS n
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type,
             list(CAST(n AS DOUBLE) ORDER BY h) AS xs,
             CAST(count(*) AS BIGINT)           AS n_hours,
             CAST(sum(n) AS BIGINT)             AS total_events
      FROM hourly GROUP BY event_type
    )
    SELECT event_type,
           n_hours,
           total_events,
           round(CASE WHEN len(xs) = 1 THEN xs[1]
                      ELSE list_reduce(xs, (a, b) -> (b + a) / 2.0)
                 END, 6) AS ewma_rate
    FROM series
    """,
    doc="""Exponentially weighted (alpha=0.5) hourly event-rate
    smoothing per event type — the load-forecast signal next to
    cusum_drift/ols_trend. The hourly series is folded in hour order
    with s_t = (x_t + s_{t-1}) / 2; counts are integers and the
    halving chain is the SAME IEEE op sequence in both engines
    (Spark aggregate over the sorted array, DuckDB list_reduce), so
    the result is bit-identical before the 6dp sync.

    Scale shape: ONE partial-aggregated shuffle to hourly counts
    (types x hours rows — time-bounded, sublinear in events), then a
    per-type fold over an array bounded by the time horizon; no
    window over raw events, no driver state. At 100 TB the fold
    array is hours-long (a retention horizon, not data-sized);
    longer horizons chunk by day and fold the per-chunk tails.""",
    tags=("EVENTS", "TS"),
)
def ewma_event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    hourly = (
        events.select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    series = hourly.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(h, n))), "
            "p -> cast(p.n as double))"
        ).alias("xs"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("n").cast("long").alias("total_events"),
    )
    ewma = F.when(
        F.size("xs") == 1, F.element_at("xs", 1)
    ).otherwise(
        F.expr(
            "aggregate(slice(xs, 2, size(xs) - 1), element_at(xs, 1), "
            "(a, x) -> (x + a) / 2.0D)"
        )
    )
    return series.select(
        "event_type",
        "n_hours",
        "total_events",
        F.round(ewma, 6).alias("ewma_rate"),
    )
