"""I: event-time streaming semantics, verified in batch-equivalence mode.

Each query runs the SAME event-time logic Structured Streaming would apply
(tumbling/sliding/session windows, watermark lateness, dedup, stateful
folds, stream-static joins) as a batch plan over the ``events`` fixture, so
it is DuckDB-oracle-hashable (SURVEY §2.2 I). The live ``readStream``/
``writeStream``/``applyInPandasWithState`` path runs in
:mod:`daas_apps_spark.streaming.live`, smoke-tested (not hashed) per the
declared contract — batch/stream equivalence itself is asserted in
tests/test_streaming_live.py.

Windows align to the epoch, exactly like ``F.window``'s default; the oracle
reproduces bucket edges with integer epoch arithmetic (truncation, UTC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.functions.discipline import dsum, sql_dsum
from daas_apps_spark.registry import register

_DUCK_BUCKET_10M = "CAST(to_timestamp((epoch_us(ts) // 600000000) * 600) AS TIMESTAMP)"


@register(
    "i1_tumbling_window",
    oracle=f"""
    SELECT {_DUCK_BUCKET_10M} AS window_start,
           CAST({_DUCK_BUCKET_10M} + INTERVAL 10 MINUTE AS TIMESTAMP) AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("I1",),
    bench=True,
)
def i1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time window aggregate."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "i2_sliding_window",
    oracle=f"""
    WITH expanded AS (
        SELECT unnest([
                   CAST(to_timestamp((epoch_us(ts) // 300000000) * 300) AS TIMESTAMP),
                   CAST(to_timestamp((epoch_us(ts) // 300000000) * 300 - 300) AS TIMESTAMP)
               ]) AS window_start,
               user_id, value
        FROM events
    )
    SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM expanded GROUP BY window_start
    """,
    tags=("I2",),
)
def i2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 10-minute length, 5-minute slide (2 windows/event)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@register(
    "i3_session_window",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
    ),
    sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS session_value
    FROM sessions GROUP BY user_id, session_id
    """,
    tags=("I3",),
    bench=True,
)
def i3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user — F.session_window.

    The oracle is the classic gaps-and-islands rewrite; Spark's session
    window end = last event + gap, matching MAX(ts)+30min exactly. Events
    with identical (user_id, ts) merge into one session row on both sides.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@register(
    "i4_watermark_lateness",
    oracle="""
    WITH marked AS (
        SELECT event_type, ts,
               MAX(ts) OVER (ORDER BY event_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS arrival_max
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE ts < arrival_max - INTERVAL 1 HOUR) AS BIGINT)
               AS n_late,
           CAST(COUNT(*) FILTER (WHERE ts >= arrival_max - INTERVAL 1 HOUR) AS BIGINT)
               AS n_on_time
    FROM marked GROUP BY event_type
    """,
    tags=("I4",),
)
def i4_watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics in batch: a record is late iff its event time
    trails the running max event time (arrival order = event_id) by more
    than the 1-hour watermark delay — exactly what
    ``withWatermark(ts, '1 hour')`` drops in a stream."""
    e = table(spark, sf_dir, "events")
    w = Window.orderBy(F.col("event_id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marked = e.withColumn("arrival_max", F.max("ts").over(w))
    late = F.col("ts") < F.col("arrival_max") - F.expr("INTERVAL 1 HOUR")
    return marked.groupBy("event_type").agg(
        F.count(F.when(late, 1)).alias("n_late"),
        F.count(F.when(~late, 1)).alias("n_on_time"),
    )


@register(
    "i5_streaming_dedup",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id,
           CAST(ts AS TIMESTAMP) AS first_ts
    FROM (
        SELECT user_id, event_type, event_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts ASC, event_id ASC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("I5", "E1"),
)
def i5_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates((user,type)) ≡ batch keep-earliest-by-time."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )


@register(
    "i6_stateful_running",
    oracle="""
    SELECT event_id, user_id,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS events_so_far,
           CAST(MAX(value) OVER w AS DOUBLE) AS max_value_so_far,
           (value >= MAX(value) OVER w) AS is_new_peak
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("I6",),
)
def i6_stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key running state (count + peak) in event order — the batch
    equivalent of ``applyInPandasWithState`` keyed state (live version in
    streaming/live.py, equivalence asserted in tests)."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
        )
        .cast("long")
        .alias("events_so_far"),
        F.max("value").over(w).alias("max_value_so_far"),
        (F.col("value") >= F.max("value").over(w)).alias("is_new_peak"),
    )


@register(
    "i7_stream_static_join",
    oracle=f"""
    WITH weights(event_type, weight) AS (
        VALUES ('click', 1.0), ('view', 0.5), ('purchase', 10.0),
               ('signup', 5.0), ('error', 0.0)
    )
    SELECT e.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('e.value * w.weight')} AS weighted_value
    FROM events e JOIN weights w ON e.event_type = w.event_type
    GROUP BY e.user_id
    """,
    tags=("I7", "C5"),
)
def i7_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join shape: events ⋈ broadcast dimension → keyed agg.

    In a live stream the dim side is a static broadcast rebuilt per trigger;
    the batch plan is identical (C5), which is why this is hashable.
    """
    e = table(spark, sf_dir, "events")
    weights = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 10.0), ("signup", 5.0), ("error", 0.0)],
        "event_type string, weight double",
    )
    return (
        e.join(F.broadcast(weights), "event_type")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value") * F.col("weight")).alias("weighted_value"),
        )
    )


@register(
    "i8_stream_stream_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS secs_to_purchase
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
    tags=("I8", "C9"),
)
def i8_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (click → purchase attribution within
    30 minutes), batch-equivalence form.

    The live twin (streaming/live.py::click_purchase_join, equivalence
    asserted in tests/test_streaming_live.py) watermarks BOTH sides and
    joins on key + time interval — the condition that lets the engine
    expire join state; state per key is bounded by the interval width.
    The batch plan is the same key-partitioned join with the interval as a
    post-join predicate: one shuffle per side on user_id, never a range
    cross product.
    """
    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            F.col("c_user").alias("user_id"),
            "click_id",
            "purchase_id",
            (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts"))
            .cast("long")
            .alias("secs_to_purchase"),
        )
    )


@register(
    "i11_stream_left_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS secs_to_purchase,
           (p.event_id IS NOT NULL) AS converted
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
    tags=("I11", "I8", "C2"),
)
def i11_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join, batch-equivalence form:
    every click appears — matched to each purchase within 30 minutes, or
    once with nulls if none came. The outer side is what turns the i8
    attribution join into a funnel-with-dropouts report.

    The live twin (streaming/live.py::click_purchase_left_join) is the
    genuinely-streaming capability: Spark emits the null row for a click
    only when the watermark passes click.ts + interval (proof no match can
    still arrive), so state AND result-completeness are bounded by
    watermark delay + interval width. The live test asserts exactly that
    boundary: matched rows always equal the batch inner join; null rows
    appear precisely for clicks old enough that the final watermark closed
    their window.

    Scale: identical to i8 — one shuffle per side on user_id, interval as
    a post-join predicate, state (live) bounded per key.
    """
    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
            "left",
        )
        .select(
            F.col("c_user").alias("user_id"),
            "click_id",
            "purchase_id",
            (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts"))
            .cast("long")
            .alias("secs_to_purchase"),
            F.col("purchase_id").isNotNull().alias("converted"),
        )
    )


@register(
    "i14_dynamic_session_window",
    oracle=f"""
    WITH g AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN event_type IN ('click', 'view')
                    THEN INTERVAL 10 MINUTE ELSE INTERVAL 45 MINUTE END AS gap
        FROM events
    ),
    m AS (
        SELECT user_id, ts, event_id, value, ts + gap AS this_end,
               MAX(ts + gap) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_max_end
        FROM g
    ),
    flagged AS (
        SELECT *, CASE WHEN prev_max_end IS NULL OR ts > prev_max_end
                       THEN 1 ELSE 0 END AS new_session
        FROM m
    ),
    sessions AS (
        SELECT *, SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(this_end) AS TIMESTAMP) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS session_value
    FROM sessions GROUP BY user_id, sid
    """,
    tags=("I14", "I3"),
)
def i14_dynamic_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a DYNAMIC, per-event gap: engaged interactions
    (click/view) time out after 10 minutes, passive event types hold the
    session for 45 — the gap duration is an expression over the row, not
    a constant. Spark's native `session_window` accepts the conditional
    gap column directly; the batch-equivalence oracle generalizes the I3
    gaps-and-islands SQL from "lag + constant" to a RUNNING MAX of
    per-event window ends (a session continues while the next event
    starts before the furthest end any member has reached).

    Scale: same as I3 — state per key is the open session interval; in
    live streaming the dynamic gap changes only the state's end
    timestamp arithmetic, not the state size.
    """
    e = table(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type").isin("click", "view"), F.lit("10 minutes")
    ).otherwise(F.lit("45 minutes"))
    return (
        e.groupBy(F.session_window(F.col("ts"), gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )
