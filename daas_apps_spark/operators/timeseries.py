"""T: time-series operators — gap-fill with LOCF, OHLC downsampling,
rolling-window anomaly scoring.

The reference's closest analog is its per-window coverage/summary passes
(genomics pipelines emit per-region depth summaries over a sorted genome
axis); re-expressed Spark-first these are the standard warehouse time-series
primitives over the ``events`` stream table: a generated time spine with
last-observation-carried-forward, bar/candle downsampling, and rolling
z-scores. Everything is built-in expressions — window functions over
(series-key, time) partitions, one hash exchange per query — no UDFs, no
driver loops.

Scale: every operator partitions by the series key (event_type / user_id)
and sorts within partition by time; the spine cross-join is
|keys| x |buckets| (tiny vs the fact table) and broadcasts. Skewed series
would salt the window partitions; the LOCF scan is one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.functions.discipline import davg, dsum, r4, sql_davg, sql_dsum
from daas_apps_spark.registry import register

ZSCORE_FRAME = 19  # rolling frame: current row + 19 preceding = 20 rows


@register(
    "t1_gapfill_locf",
    oracle=f"""
    WITH obs AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               {sql_davg('value')} AS avg_value,
               COUNT(*) AS n_obs
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    bounds AS (
        SELECT MIN(date_trunc('hour', ts)) AS lo,
               MAX(date_trunc('hour', ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT t.event_type, g.bucket
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                    AS bucket FROM bounds) g
    ),
    j AS (
        SELECT s.event_type, s.bucket, o.avg_value,
               COALESCE(o.n_obs, 0) AS n_obs
        FROM spine s LEFT JOIN obs o USING (event_type, bucket)
    )
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
           CAST(n_obs AS BIGINT) AS n_obs,
           (n_obs = 0) AS is_gap,
           ROUND(LAST_VALUE(avg_value IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS locf_value
    FROM j
    """,
    tags=("T1", "E6", "C8"),
)
def t1_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill a per-(event_type, hour) series onto a dense generated time
    spine, carrying the last observation forward across empty buckets.

    Shape: aggregate observations per (key, hour); build the spine as
    distinct-keys x ``sequence(min, max, 1 hour)`` (both sides tiny — the
    exploded spine broadcasts onto the observation agg); left-join; then
    one ordered window per key propagates the last non-null average
    (``last(..., ignorenulls=True)``, frame = unbounded preceding).

    Scale: the observation agg is the only fact-table shuffle; the spine is
    |keys| x |hours| rows (5 x 720 here; even 1e6 keys x 10 years of hours
    is ~1e11 — at that point range-partition the spine by key and generate
    it with the same expression, no driver materialization). LOCF is one
    sort per key partition, no self-join, no driver iteration.
    avg_value goes through the decimal-sum discipline (davg) so the filled
    values are bit-identical on both engines.
    """
    e = table(spark, sf_dir, "events")
    obs = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket")).agg(
        davg("value").alias("avg_value"), F.count(F.lit(1)).alias("n_obs")
    )
    bounds = e.agg(
        F.min(F.date_trunc("hour", "ts")).alias("lo"),
        F.max(F.date_trunc("hour", "ts")).alias("hi"),
    )
    spine = (
        e.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                bounds.select(
                    F.explode(
                        F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
                    ).alias("bucket")
                )
            )
        )
    )
    joined = spine.join(F.broadcast(obs), ["event_type", "bucket"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
        (F.coalesce("n_obs", F.lit(0)) == 0).alias("is_gap"),
        F.round(F.last("avg_value", ignorenulls=True).over(w), 4).alias(
            "locf_value"
        ),
    )


@register(
    "t2_ohlc_downsample",
    oracle=f"""
    WITH t AS (
        SELECT event_type, date_trunc('day', ts) AS d, value,
               FIRST_VALUE(value) OVER (
                   PARTITION BY event_type, date_trunc('day', ts)
                   ORDER BY ts, event_id) AS open,
               FIRST_VALUE(value) OVER (
                   PARTITION BY event_type, date_trunc('day', ts)
                   ORDER BY ts DESC, event_id DESC) AS close
        FROM events
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
           CAST(MIN(open) AS DOUBLE) AS open,
           CAST(MAX(value) AS DOUBLE) AS high,
           CAST(MIN(value) AS DOUBLE) AS low,
           CAST(MIN(close) AS DOUBLE) AS close,
           {sql_dsum('value')} AS volume,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM t GROUP BY event_type, d
    """,
    tags=("T2", "D8", "D1"),
)
def t2_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the event stream into daily OHLC (open/high/low/close)
    bars per event_type — the classic resample-to-candles operator.

    Open/close are exact picks via ``min_by``/``max_by`` on the composite
    (ts, event_id) order (struct ordering; event_id breaks same-timestamp
    ties), so the whole bar is ONE hash aggregate over one scan — no
    window, no self-join. The oracle can't arg_min on a struct, so it
    derives open/close with first_value windows instead; results are
    identical because the tie-break order is the same.

    Scale: single partial+final aggregate on (event_type, day) — the
    min_by/max_by accumulators are constant-size, map-side combine applies,
    and AQE handles skewed days. Volume uses the decimal-sum discipline.
    """
    e = table(spark, sf_dir, "events")
    ord_ = F.struct("ts", "event_id")
    return (
        e.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("d")
        )
        .agg(
            F.min_by("value", ord_).cast("double").alias("open"),
            F.max("value").cast("double").alias("high"),
            F.min("value").cast("double").alias("low"),
            F.max_by("value", ord_).cast("double").alias("close"),
            dsum("value").alias("volume"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n_events",
        )
    )


@register(
    "t3_rolling_zscore",
    oracle=f"""
    WITH w AS (
        SELECT event_id, user_id, ts, value,
               AVG(value) OVER frame AS roll_mean,
               STDDEV_SAMP(value) OVER frame AS roll_std,
               COUNT(*) OVER frame AS n_frame
        FROM events
        WINDOW frame AS (PARTITION BY event_type ORDER BY ts, event_id
                         ROWS BETWEEN {ZSCORE_FRAME} PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(event_id AS BIGINT) AS event_id, user_id,
           ROUND((value - roll_mean) / roll_std, 4) AS zscore
    FROM w
    WHERE n_frame > {ZSCORE_FRAME} AND roll_std > 1e-9
      AND ABS((value - roll_mean) / roll_std) > 2.5
    """,
    tags=("T3", "E5", "D7"),
)
def t3_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window anomaly detection: flag events whose value deviates
    more than 2.5 sample standard deviations from the trailing-20 mean of
    their event_type series.

    One ordered window per series key computes the trailing mean/stddev
    (ROWS 19 PRECEDING..CURRENT); rows with an incomplete frame are
    excluded so every score is over exactly 20 observations. The (ts,
    event_id) ordering is total, so frame contents — and therefore the
    float accumulation order inside each frame — are identical on both
    engines; ROUND(.,4) absorbs the remaining Welford-vs-naive ulps.

    Scale: one hash exchange on event_type + in-partition sort; the frame
    is O(1) state per row (sliding sum-of-squares), no self-join. A series
    key with billions of rows still streams through one sorted partition —
    range-partition by (key, coarse time) and re-seed frames at range
    boundaries if a single key exceeds a partition.
    """
    e = table(spark, sf_dir, "events")
    frame = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZSCORE_FRAME, Window.currentRow)
    )
    scored = e.select(
        "event_id",
        "user_id",
        F.avg("value").over(frame).alias("roll_mean"),
        F.stddev_samp("value").over(frame).alias("roll_std"),
        F.count(F.lit(1)).over(frame).alias("n_frame"),
        "value",
    )
    z = (F.col("value") - F.col("roll_mean")) / F.col("roll_std")
    return scored.filter(
        (F.col("n_frame") > ZSCORE_FRAME)
        & (F.col("roll_std") > 1e-9)
        & (F.abs(z) > 2.5)
    ).select("event_id", "user_id", F.round(z, 4).alias("zscore"))


def funnel_stage_times(
    df: DataFrame,
    stages: "list[str]",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user first-attainment timestamp of each ordered funnel stage.

    Stage k counts only at-or-after the user's first attainment of stage
    k-1 (inclusive: a stage reached at the SAME instant as its predecessor
    qualifies). Implemented as chained RANGE-frame running-min windows over
    ONE (user, ts) sort — each stage adds an O(1)-state pass over the same
    sorted partition, never a join — then a per-user aggregate that reuses
    the window's hash partitioning. Returns one row per user with columns
    ``stage_0_ts .. stage_{n-1}_ts``.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = df.select(user_col, ts_col, type_col)
    prev = None
    qual_cols = []
    for k, stage in enumerate(stages):
        qual = F.col(type_col) == stage
        if prev is not None:
            qual = qual & F.col(prev).isNotNull()
        name = f"__q{k}"
        staged = staged.withColumn(
            name, F.min(F.when(qual, F.col(ts_col))).over(w)
        )
        qual_cols.append(name)
        prev = name
    return staged.groupBy(user_col).agg(
        *[F.min(q).alias(f"stage_{k}_ts") for k, q in enumerate(qual_cols)]
    )


@register(
    "t4_funnel_analysis",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v AS (
        SELECT user_id, MIN(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS c_ts
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts >= v.v_ts
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS p_ts
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
        GROUP BY e.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(v.v_ts) AS BIGINT) AS n_viewed,
           CAST(COUNT(c.c_ts) AS BIGINT) AS n_clicked,
           CAST(COUNT(p.p_ts) AS BIGINT) AS n_purchased,
           ROUND(AVG(CAST(date_diff('second', v.v_ts, c.c_ts) AS DOUBLE)), 4)
               AS avg_view_to_click_secs,
           ROUND(AVG(CAST(date_diff('second', c.c_ts, p.p_ts) AS DOUBLE)), 4)
               AS avg_click_to_purchase_secs
    FROM u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    """,
    tags=("T4", "E4", "D9"),
)
def t4_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion census: view → click → purchase, each stage
    strictly at-or-after the user's first attainment of the previous stage.

    The oracle needs three aggregate+join rounds (first view per user, first
    click after that view, first purchase after that click). The Spark plan
    does it in ONE shuffle: chained RANGE-frame running windows over the
    same (user_id, ts) sort —

        first_view(t)  = min view ts seen up to t   (range frame ⇒ a stage
                         reached at the SAME instant as its predecessor
                         counts, matching the oracle's inclusive >=)
        qual_click(t)  = t if this row is a click and first_view(t) exists
        first_qclick   = running min of qual_click
        qual_purchase  = t if purchase and first_qclick(t) exists

    — then a per-user aggregate (which reuses the window's hash
    partitioning: no second exchange) and a single global census row.

    Scale: one hash exchange on user_id + one in-partition sort, O(1)
    window state per row, 1-row output. No join, no per-user collect —
    a billion-user funnel is the same plan at any scale.
    """
    e = table(spark, sf_dir, "events")
    per_user = funnel_stage_times(e, ["view", "click", "purchase"]).select(
        "user_id",
        F.col("stage_0_ts").alias("v_ts"),
        F.col("stage_1_ts").alias("c_ts"),
        F.col("stage_2_ts").alias("p_ts"),
    )
    secs = lambda a, b: F.unix_timestamp(b) - F.unix_timestamp(a)  # noqa: E731
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("v_ts").alias("n_viewed"),
        F.count("c_ts").alias("n_clicked"),
        F.count("p_ts").alias("n_purchased"),
        F.round(
            F.avg(secs(F.col("v_ts"), F.col("c_ts")).cast("double")), 4
        ).alias("avg_view_to_click_secs"),
        F.round(
            F.avg(secs(F.col("c_ts"), F.col("p_ts")).cast("double")), 4
        ).alias("avg_click_to_purchase_secs"),
    )


@register(
    "t5_cohort_retention",
    oracle="""
    WITH uw AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    ),
    cohort AS (
        SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY user_id
    )
    SELECT strftime(c.cohort_wk, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('week', c.cohort_wk, uw.wk) AS BIGINT) AS weeks_since,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM uw JOIN cohort c ON uw.user_id = c.user_id
    GROUP BY 1, 2
    """,
    tags=("T5", "D1", "D6"),
)
def t5_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active week, counted
    in every week they return — the standard growth-analytics report.

    The oracle takes the textbook route (distinct user-weeks → min-per-user
    cohort → join back → count distinct). The Spark plan needs no join and
    no distinct pass: ONE per-user aggregate carrying `min(wk)` AND
    `collect_set(wk)` (both partially aggregated map-side, so duplicate
    user-weeks collapse before the shuffle), then an explode of the
    bounded set and a second small aggregate over (cohort, weeks_since).
    After the explode every (user, week) is unique, so `count(*)` IS the
    distinct-user count.

    Scale: shuffle #1 carries one row per user with O(active weeks) set
    state (bounded by the calendar: ≤52/year — NOT by event volume);
    shuffle #2 carries cohort×week cells. A billion users × a year of
    events never materializes a user-week fact join.
    """
    e = table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    per_user = (
        e.select("user_id", wk.alias("wk"))
        .groupBy("user_id")
        .agg(F.min("wk").alias("cohort_wk"), F.collect_set("wk").alias("wks"))
    )
    return (
        per_user.select(
            "cohort_wk", F.explode("wks").alias("wk")
        )
        .groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("wk"), F.col("cohort_wk")) / 7)
            .cast("long")
            .alias("weeks_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "t6_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           ROUND(COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY prev_type), 6)
               AS p_next
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    tags=("T6", "E3", "D1"),
)
def t6_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: for each consecutive event pair in a
    user's totally-ordered history, count (prev → next) transitions and the
    empirical next-event probability — the first-order Markov summary under
    next-event-prediction / session-path analytics.

    One lag window over (user_id, ts, event_id) — the event_id tie-break
    makes the ordering total, so equal-timestamp neighbors produce the
    same transitions on both engines — then a tiny (prev, next) aggregate;
    the probability normalizes over a 25-cell result with a second window
    that never touches the fact table. No self-join (contrast: the oracle
    could also be written as the C11 self-join — this form shuffles the
    events table once instead of twice).

    Scale: shuffle #1 on user_id (the window), shuffle #2 carries
    |event_types|² rows. Transition matrices over billions of events are
    exactly this plan; higher-order chains add lag(k) columns to the same
    window pass, not new shuffles.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wnorm = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wnorm), 6
        ).alias("p_next"),
    )


@register(
    "t7_seasonal_profile",
    oracle=f"""
    WITH prof AS (
        SELECT event_type,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day,
               {sql_davg('value')} AS hour_mean,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY event_type, EXTRACT(hour FROM ts)
    )
    SELECT event_type, hour_of_day, hour_mean, n_events,
           ROUND(hour_mean - AVG(hour_mean) OVER (PARTITION BY event_type), 4)
               AS dev_from_type_mean,
           (ABS(hour_mean - AVG(hour_mean) OVER (PARTITION BY event_type))
            > 1.5 * STDDEV_SAMP(hour_mean) OVER (PARTITION BY event_type))
               AS is_unusual_hour
    FROM prof
    """,
    tags=("T7", "T3", "D1"),
)
def t7_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal (hour-of-day) activity profile with deviation flags: per
    event type, each hour's mean value and event count, the deviation from
    the type's across-hours mean, and an unusual-hour flag at 1.5σ — the
    baseline-and-residual decomposition behind seasonality-aware anomaly
    detection (T3 scores points against a rolling window; this scores
    HOURS against the diurnal profile).

    One fact-table aggregate builds the 24-row-per-type profile; the
    normalizing window runs over that tiny profile, never the events.
    Means use the decimal-sum discipline; the σ comparison rounds only at
    the report edge.

    Scale: the only corpus-sized stage is the (type, hour) aggregate with
    map-side partials — 120 output rows at any input size; the profile
    window is driver-trivial. Extending to (day-of-week × hour) or
    per-tenant profiles multiplies the tiny side only.
    """
    e = table(spark, sf_dir, "events")
    prof = e.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour_of_day")
    ).agg(
        davg("value").alias("hour_mean"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.partitionBy("event_type")
    dev = F.col("hour_mean") - F.avg("hour_mean").over(w)
    return prof.select(
        "event_type",
        "hour_of_day",
        "hour_mean",
        "n_events",
        F.round(dev, 4).alias("dev_from_type_mean"),
        (F.abs(dev) > 1.5 * F.stddev_samp("hour_mean").over(w)).alias(
            "is_unusual_hour"
        ),
    )


CUSUM_SCALE = 10_000  # 4-decimal fixed-point for the exact running sum
CUSUM_H = 10.0  # absolute drift threshold (units·days); see docstring


@register(
    "t8_cusum_changepoint",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               CAST(SUM(CAST(value AS DECIMAL(18,4)) * {CUSUM_SCALE}) AS BIGINT)
                   AS sv,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    m AS (
        SELECT *, (sv / {CUSUM_SCALE}.0) / n AS day_mean,
               (SUM(sv) OVER (PARTITION BY event_type) / {CUSUM_SCALE}.0)
               / SUM(n) OVER (PARTITION BY event_type) AS type_mean
        FROM daily
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n AS n_events,
           ROUND(day_mean, 4) AS day_mean,
           ROUND(type_mean, 4) AS type_mean,
           SUM(CAST(CAST(day_mean - type_mean AS DECIMAL(18,4))
                    * {CUSUM_SCALE} AS BIGINT))
               OVER (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / {CUSUM_SCALE}.0 AS cusum,
           (ABS(SUM(CAST(CAST(day_mean - type_mean AS DECIMAL(18,4))
                         * {CUSUM_SCALE} AS BIGINT))
                OVER (PARTITION BY event_type ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                / {CUSUM_SCALE}.0) > {CUSUM_H}) AS is_shift
    FROM m
    """,
    tags=("T8", "T3", "E4"),
)
def t8_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection (Page 1954): per event type, the
    cumulative sum of each day's deviation from the type's overall mean,
    flagging days where the accumulated drift |CUSUM| exceeds a threshold
    — the classic sequential detector for small persistent mean shifts
    that T3's pointwise z-score cannot see.

    Determinism is the interesting part: a naive running SUM of double
    deviations is association-order-dependent (Spark's window accumulates
    sequentially, DuckDB's uses a segment tree), so the deviations are
    fixed-pointed to 4 decimals (the dsum discipline) and the running sum
    runs on exact BIGINTs — the CUSUM series is bit-identical on both
    engines at any partition count. Day and type means come from scaled-
    long sums, so they too are exact; the only rounding is at the report
    edge. The threshold is a fixed literal; production would set
    h = k·σ_series per key (the σ estimate is where engines may diverge
    in ulps, which is why the declared query pins a constant).

    Scale: one fact aggregate (map-side partials) down to |types|×|days|
    rows; both windows run over that tiny series, partitioned by type —
    same shape as T7. A billion-day series per key would motivate the
    streaming CUSUM (I6 stateful fold) instead of a batch window.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.sum((F.col("value").cast("decimal(18,4)") * CUSUM_SCALE).cast("long"))
        .alias("sv"),
        F.count(F.lit(1)).alias("n"),
    )
    w_t = Window.partitionBy("event_type")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = daily.select(
        "event_type",
        "d",
        "n",
        ((F.col("sv") / float(CUSUM_SCALE)) / F.col("n")).alias("day_mean"),
        (
            (F.sum("sv").over(w_t) / float(CUSUM_SCALE)) / F.sum("n").over(w_t)
        ).alias("type_mean"),
    )
    dev_fp = (
        (F.col("day_mean") - F.col("type_mean")).cast("decimal(18,4)")
        * CUSUM_SCALE
    ).cast("long")
    cusum = F.sum(dev_fp).over(w_run) / float(CUSUM_SCALE)
    return m.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").alias("n_events"),
        F.round("day_mean", 4).alias("day_mean"),
        F.round("type_mean", 4).alias("type_mean"),
        cusum.alias("cusum"),
        (F.abs(cusum) > CUSUM_H).alias("is_shift"),
    )


RESIDUAL_THRESHOLD = 100  # fixed absolute residual flag bound (integer units)


@register(
    "t9_seasonal_residuals",
    oracle=f"""
    WITH prof AS (
        SELECT event_type,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day,
               CAST(SUM(CAST(value AS DECIMAL(18,4)) * 10000) AS BIGINT) AS s_fp,
               CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM events
        GROUP BY event_type, EXTRACT(hour FROM ts)
    )
    SELECT e.event_id, e.event_type,
           CAST(EXTRACT(hour FROM e.ts) AS BIGINT) AS hour_of_day,
           e.value,
           CAST(CAST(CAST(e.value AS DECIMAL(18,4)) * 10000 AS BIGINT) * p.n_obs
                - p.s_fp AS DOUBLE)
           / CAST(10000 * p.n_obs AS DOUBLE) AS residual,
           (ABS(CAST(CAST(e.value AS DECIMAL(18,4)) * 10000 AS BIGINT) * p.n_obs
                - p.s_fp)
            > {RESIDUAL_THRESHOLD} * 10000 * p.n_obs) AS is_anomalous
    FROM events e
    JOIN prof p ON p.event_type = e.event_type
               AND p.hour_of_day = CAST(EXTRACT(hour FROM e.ts) AS BIGINT)
    """,
    tags=("T9", "T7", "C5"),
)
def t9_seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level seasonal residual scoring — the operational complement of
    T7: the diurnal (type, hour) profile is built once, broadcast back
    onto the event stream, and every event is scored by its deviation
    from the seasonal baseline. T7 answers "which HOURS are unusual";
    this answers "which EVENTS are unusual given their hour" — the
    deseasonalized anomaly feed an alerting pipeline consumes.

    Determinism WITHOUT any ROUND: v − S/(10⁴·n) is algebraically
    (v_fp·n − S) / (10⁴·n) with an exact BIGINT numerator (v_fp = the
    4-decimal fixed-pointed value, S/n = the profile's scaled sum/count),
    so the residual is ONE IEEE division of exact integers — bit-identical
    across engines — and the anomaly flag is a pure integer comparison.
    ROUND is avoided deliberately: residuals land on exact .xxxx5
    midpoints often enough that Spark's half-even vs DuckDB's
    half-away-from-zero rounding of doubles WILL diverge (observed on
    this very query; the fixed-point form is the fix, not a bigger
    epsilon).

    Scale: the profile is |types|×24 rows — broadcast at any corpus
    size; the fact table is touched twice (profile build + scoring),
    which beats any windowed alternative that would shuffle all events
    by (type, hour). In streaming, yesterday's profile joins today's
    stream (I7 stream-static shape) — same plan, incremental input.
    Overflow bound: |v_fp·n| ≈ 5·10⁶·n stays under 2⁶³ for n up to
    ~10¹² observations per (type, hour) cell.
    """
    e = table(spark, sf_dir, "events")
    v_fp = (F.col("value").cast("decimal(18,4)") * 10000).cast("long")
    prof = e.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour_of_day")
    ).agg(
        F.sum(v_fp).alias("s_fp"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    scored = e.select(
        "event_id",
        "event_type",
        F.hour("ts").cast("long").alias("hour_of_day"),
        "value",
        v_fp.alias("v_fp"),
    ).join(F.broadcast(prof), ["event_type", "hour_of_day"])
    numer = F.col("v_fp") * F.col("n_obs") - F.col("s_fp")
    return scored.select(
        "event_id",
        "event_type",
        "hour_of_day",
        "value",
        (
            numer.cast("double")
            / (F.lit(10000).cast("long") * F.col("n_obs")).cast("double")
        ).alias("residual"),
        (
            F.abs(numer)
            > F.lit(RESIDUAL_THRESHOLD) * F.lit(10000) * F.col("n_obs")
        ).alias("is_anomalous"),
    )


TWAP_SCALE = 10_000


@register(
    "t10_time_weighted_avg",
    oracle=f"""
    WITH w AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               CAST(CAST(value AS DECIMAL(18,4)) * {TWAP_SCALE} AS BIGINT) AS v_fp,
               COALESCE(
                   LEAD(epoch_us(ts)) OVER (
                       PARTITION BY event_type, date_trunc('day', ts)
                       ORDER BY ts, event_id),
                   epoch_us(date_trunc('day', ts) + INTERVAL 1 DAY)
               ) - epoch_us(ts) AS wt_us
        FROM events
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(wt_us) AS BIGINT) AS covered_us,
           CAST(SUM(v_fp * wt_us) AS DOUBLE)
           / (CAST({TWAP_SCALE} AS DOUBLE) * SUM(wt_us)) AS twap
    FROM w
    GROUP BY event_type, d
    """,
    tags=("T10", "T2", "E3"),
)
def t10_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): per (type, day), each observation's
    value weighted by how long it remained the latest observation (LOCF
    integral from the observation to its successor, the day's last one
    carrying to midnight) — the correct daily mean for irregularly
    sampled series, where the arithmetic mean (T2's close/volume view)
    over-weights bursts.

    Exact by construction: weights are integer microseconds, values are
    4-decimal fixed-point BIGINTs, and Σ(v_fp·w) is bounded by
    max(v_fp)·86400·10⁶ ≈ 4·10¹⁷ per day-group REGARDLESS of event count
    (the weights partition the day), so the int64 sums never overflow and
    the TWAP is one IEEE division — no ROUND, engine-bit-identical (the
    T9 midpoint rule applied to a weighted mean).

    Scale: one window (lead) and one aggregate, both keyed on
    (type, day) — embarrassingly parallel across days; day boundaries
    are exact cut points, so the operator is partition-stable under any
    date-range sharding.
    """
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    w_seq = Window.partitionBy("event_type", "d").orderBy("ts", "event_id")
    base = e.select(
        "event_type",
        day.alias("d"),
        "ts",
        "event_id",
        (F.col("value").cast("decimal(18,4)") * TWAP_SCALE)
        .cast("long")
        .alias("v_fp"),
    )
    day_end_us = F.unix_micros(F.col("d") + F.expr("INTERVAL 1 DAY"))
    wt = (
        F.coalesce(F.lead(F.unix_micros(F.col("ts"))).over(w_seq), day_end_us)
        - F.unix_micros(F.col("ts"))
    ).alias("wt_us")
    return (
        base.select("event_type", "d", "v_fp", wt)
        .groupBy("event_type", "d")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("wt_us").alias("covered_us"),
            (
                F.sum(F.col("v_fp") * F.col("wt_us")).cast("double")
                / (F.lit(float(TWAP_SCALE)) * F.sum("wt_us"))
            ).alias("twap"),
        )
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n_events",
            "covered_us",
            "twap",
        )
    )


@register(
    "t11_interval_coverage",
    oracle="""
    WITH iv AS (
        SELECT user_id % 25 AS key,
               epoch_us(ts) AS s,
               epoch_us(ts)
                 + 60000000 * (1 + CAST(FLOOR(value) AS BIGINT)) AS e,
               event_id
        FROM events
    ),
    flagged AS (
        SELECT key, s, e, event_id,
               CASE WHEN MAX(e) OVER (
                        PARTITION BY key ORDER BY s, e, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                    OR s > MAX(e) OVER (
                        PARTITION BY key ORDER BY s, e, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    )
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    islands AS (
        SELECT key, s, e,
               SUM(new_island) OVER (
                   PARTITION BY key ORDER BY s, e, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island
        FROM flagged
    ),
    merged AS (
        SELECT key, island, MIN(s) AS m_start, MAX(e) AS m_end,
               CAST(COUNT(*) AS BIGINT) AS n_members
        FROM islands GROUP BY key, island
    ),
    cov AS (
        SELECT key,
               CAST(SUM(n_members) AS BIGINT) AS n_intervals,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(m_end - m_start) AS BIGINT) AS covered_us,
               CAST(MAX(m_end - m_start) AS BIGINT) AS widest_island_us
        FROM merged GROUP BY key
    ),
    pts AS (
        SELECT key, s AS pos, 1 AS delta FROM iv
        UNION ALL
        SELECT key, e AS pos, -1 AS delta FROM iv
    ),
    dep AS (
        SELECT key, CAST(MAX(running) AS BIGINT) AS max_depth
        FROM (
            SELECT key, SUM(delta) OVER (
                       PARTITION BY key ORDER BY pos, delta
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS running
            FROM pts
        ) t GROUP BY key
    )
    SELECT cov.key, cov.n_intervals, cov.n_islands, cov.covered_us,
           cov.widest_island_us, dep.max_depth
    FROM cov JOIN dep ON dep.key = cov.key
    """,
    tags=("T11", "C9", "E4"),
)
def t11_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union + coverage depth — the genomics ``bedtools merge`` /
    ``genomecov`` pair done relationally (the reference's interval-list
    world: per-region BED windows drive every pipeline stage, e.g.
    SparkCaller.java's per-interval scatter; here the intervals come from
    the event stream: each event opens a [ts, ts + (1+floor(value)) min)
    window keyed by user_id % 25).

    Two classic sweep-line computations, both as ordered windows — never a
    self-join:

    - **Merge (union)**: sort intervals per key by start; an interval
      starts a new island iff its start exceeds the running max of all
      previous ends (ROWS UNBOUNDED PRECEDING .. 1 PRECEDING); the running
      sum of that flag is the island id; per-island MIN(start)/MAX(end)
      gives the merged spans, summed into total covered time.
    - **Depth (coverage)**: explode each interval into (+1 at start, -1 at
      end) deltas; the running sum ordered by (pos, delta) — ends before
      starts at ties, i.e. half-open [s, e) — is the concurrent-interval
      depth; MAX per key is the peak.

    All arithmetic is integer microseconds (``unix_micros`` /
    ``epoch_us``), so both engines agree bit-for-bit with no rounding
    discipline.

    Scale: both sweeps are one hash exchange on the series key followed by
    an in-partition sort — the plan shape survives any corpus size as long
    as one key's intervals fit a partition (they're time-series per entity;
    a hot key would be salted by time-range first, merging islands across
    salt boundaries in a second tiny pass). The ±1 point exchange is 2
    rows per interval, narrow (key, pos, delta) columns only.
    """
    e = table(spark, sf_dir, "events")
    iv = e.select(
        (F.col("user_id") % 25).alias("key"),
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.lit(60_000_000) * (F.floor("value").cast("long") + 1)
        ).alias("e"),
        "event_id",
    )
    return interval_coverage(iv)


def interval_coverage(iv: DataFrame) -> DataFrame:
    """Core of t11 over any (key, s, e, event_id) interval frame — split
    out so property tests can drive it with adversarial intervals."""
    w_seq = Window.partitionBy("key").orderBy("s", "e", "event_id")
    prev_max_end = F.max("e").over(
        w_seq.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "key",
        "s",
        "e",
        "event_id",
        F.when(
            prev_max_end.isNull() | (F.col("s") > prev_max_end), 1
        )
        .otherwise(0)
        .alias("new_island"),
    )
    islands = flagged.select(
        "key",
        "s",
        "e",
        F.sum("new_island")
        .over(w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island"),
    )
    merged = islands.groupBy("key", "island").agg(
        F.min("s").alias("m_start"),
        F.max("e").alias("m_end"),
        F.count(F.lit(1)).alias("n_members"),
    )
    cov = merged.groupBy("key").agg(
        F.sum("n_members").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("m_end") - F.col("m_start")).alias("covered_us"),
        F.max(F.col("m_end") - F.col("m_start")).alias("widest_island_us"),
    )
    pts = iv.select("key", F.col("s").alias("pos"), F.lit(1).alias("delta")).unionAll(
        iv.select("key", F.col("e").alias("pos"), F.lit(-1).alias("delta"))
    )
    w_sweep = Window.partitionBy("key").orderBy("pos", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dep = (
        pts.select("key", F.sum("delta").over(w_sweep).alias("running"))
        .groupBy("key")
        .agg(F.max("running").alias("max_depth"))
    )
    return cov.join(dep, "key").select(
        "key", "n_intervals", "n_islands", "covered_us",
        "widest_island_us", "max_depth",
    )


EWMA_ALPHA = 0.5  # power-of-two decay: every weight 0.5^(j+1) is IEEE-exact
EWMA_TAPS = 20  # bounded memory: rows beyond 20 lags carry weight < 1e-6


def _ewma_sql(table_name: str) -> str:
    """EWMA as one window pass — IDENTICAL SQL text for both engines.

    Weights are exact binary fractions (0.5^(j+1)); every product is a
    single correctly-rounded IEEE multiply and the numerator/denominator
    additions are written in one fixed left-associative order, so Spark
    and DuckDB produce bit-identical doubles with no rounding discipline.
    """
    num_terms = []
    den_terms = []
    for j in range(EWMA_TAPS):
        c = repr(EWMA_ALPHA * (1.0 - EWMA_ALPHA) ** j)
        lag = "value" if j == 0 else f"LAG(value, {j}) OVER w"
        num_terms.append(f"COALESCE({lag}, 0.0) * {c}")
        den_terms.append(f"(CASE WHEN {lag} IS NOT NULL THEN {c} ELSE 0.0 END)")
    num = " + ".join(num_terms)
    den = " + ".join(den_terms)
    return f"""
    SELECT event_type, event_id, value,
           ({num}) / ({den}) AS ewma
    FROM {table_name}
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    """


@register(
    "t12_ewma_smoothing",
    oracle=_ewma_sql("events"),
    tags=("T12", "T3", "E5"),
)
def t12_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per event-type series — the
    streaming-telemetry smoother (pandas ``ewm(adjust=True)`` semantics,
    truncated to a bounded 20-tap memory so state is O(1) per series).

    α = 1/2 is deliberate: every weight 0.5^(j+1) is an exact binary
    fraction, so each tap is one correctly-rounded multiply and the fixed
    left-associative sum is bit-identical across engines AND across
    partitionings — the usual float-window nondeterminism is gone by
    construction, and the oracle runs the VERY SAME SQL text.

    Scale: one hash exchange on the series key, one in-partition sort;
    the 20 LAG taps share a single window frame pass (both engines
    evaluate all lags over one sorted scan). 20 taps bound the error vs
    the infinite EWMA at 2^-20 of the value scale — below any telemetry
    noise floor; a longer memory is a constant change.
    """
    e = table(spark, sf_dir, "events")
    e.createOrReplaceTempView("t12_events")
    return spark.sql(_ewma_sql("t12_events"))


ATTR_WINDOW_US = 3_600_000_000  # last-touch lookback: 1 hour in microseconds


@register(
    "t13_touch_attribution",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, event_type,
               epoch_us(ts) AS t,
               MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
                   OVER w AS last_click_t,
               MAX(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
                   OVER w AS last_view_t
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    purchases AS (
        SELECT user_id, event_id,
               CASE
                   WHEN last_click_t IS NOT NULL
                        AND t - last_click_t <= {ATTR_WINDOW_US}
                       THEN 'click'
                   WHEN last_view_t IS NOT NULL
                        AND t - last_view_t <= {ATTR_WINDOW_US}
                       THEN 'view'
                   ELSE 'organic'
               END AS channel,
               CASE
                   WHEN last_click_t IS NOT NULL
                        AND t - last_click_t <= {ATTR_WINDOW_US}
                       THEN t - last_click_t
                   WHEN last_view_t IS NOT NULL
                        AND t - last_view_t <= {ATTR_WINDOW_US}
                       THEN t - last_view_t
               END AS lag_us
        FROM seq WHERE event_type = 'purchase'
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(lag_us) AS BIGINT) AS total_lag_us,
           CAST(MAX(lag_us) AS BIGINT) AS max_lag_us
    FROM purchases
    GROUP BY channel
    """,
    tags=("T13", "T4", "C10", "E3"),
)
def t13_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase is credited to the
    most recent prior click (else view) by the same user within a 1-hour
    lookback, else counted organic — the marketing-analytics workhorse,
    and the per-key as-of-join (C10) re-expressed as ONE ordered window
    pass: a conditional running MAX over prior rows carries the latest
    touch timestamp per channel, and the purchase row reads it — no join,
    no per-purchase probe.

    All arithmetic is integer microseconds; the channel precedence
    (click beats view) is a fixed CASE ladder, so both engines credit
    identically. The report is the attribution census: purchases, unique
    converters, and touch-to-purchase lag mass per channel.

    Scale: one hash exchange on user_id + in-partition sort serves every
    channel's running max simultaneously; the census aggregate runs on
    purchase rows only. At 100 TB this is the same single-shuffle shape
    as the as-of family (SCALING.md §2), with the watermark/lookback
    bounding how far state reaches back.
    """
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = F.unix_micros("ts")
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.unix_micros("ts"))
    ).over(w)
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.unix_micros("ts"))
    ).over(w)
    seq = e.select(
        "user_id",
        "event_id",
        "event_type",
        t.alias("t"),
        last_click.alias("last_click_t"),
        last_view.alias("last_view_t"),
    )
    click_ok = F.col("last_click_t").isNotNull() & (
        F.col("t") - F.col("last_click_t") <= ATTR_WINDOW_US
    )
    view_ok = F.col("last_view_t").isNotNull() & (
        F.col("t") - F.col("last_view_t") <= ATTR_WINDOW_US
    )
    purchases = seq.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.when(click_ok, "click")
        .when(view_ok, "view")
        .otherwise("organic")
        .alias("channel"),
        F.when(click_ok, F.col("t") - F.col("last_click_t"))
        .when(view_ok, F.col("t") - F.col("last_view_t"))
        .alias("lag_us"),
    )
    return purchases.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("lag_us").alias("total_lag_us"),
        F.max("lag_us").alias("max_lag_us"),
    )


T14_HORIZON = 3  # forecast this many days past the series end


@register(
    "t14_trend_forecast",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    sums AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx,
               MAX(x) AS x_max
        FROM daily GROUP BY event_type
    )
    SELECT event_type, n AS n_days, x_max,
           CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
           (CAST(sy AS DOUBLE)
            - (CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS intercept,
           (CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE))
               * CAST(x_max + {T14_HORIZON} AS DOUBLE)
           + (CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) AS forecast
    FROM sums
    """,
    tags=("T14", "D7", "K22"),
)
def t14_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend + short-horizon forecast: OLS slope and
    intercept of the daily event-count series against the epoch-day
    index, extrapolated T14_HORIZON days past the series end — the
    capacity-planning regression behind "are errors trending up".

    Determinism without regr_* aggregates: x (epoch day) and y (daily
    count) are exact BIGINTs, so n, Σx, Σy, Σxy, Σx² are exact integer
    sums in any association order; slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)
    converts two exact sub-2⁵³ integers to doubles and divides ONCE.
    Intercept and forecast reuse that slope through an identical
    expression tree on both engines, so every float op sees the same bit
    patterns in the same order — bit-exact with no rounding discipline.
    (regr_slope itself float-accumulates per row, which is
    association-order-dependent — the reason it's avoided here.)

    Scale: the fact collapses to |types|×|days| rows map-side (partial
    counts), then five integer sums per type — the same two-level
    rollup as T8; the regression math is a per-group projection.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.expr("cast(unix_timestamp(date_trunc('day', ts)) as bigint) div 86400").alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    sums = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.max("x").alias("x_max"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return sums.select(
        "event_type",
        F.col("n").alias("n_days"),
        "x_max",
        slope.alias("slope"),
        intercept.alias("intercept"),
        (
            slope * (F.col("x_max") + T14_HORIZON).cast("double") + intercept
        ).alias("forecast"),
    )


@register(
    "t15_series_correlation",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS d,
               CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END)
                    AS BIGINT) AS x,
               CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                    AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    sums AS (
        SELECT date_trunc('week', d) AS wk,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM daily GROUP BY 1
    )
    SELECT wk, n, sx AS clicks, sy AS purchases,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                ELSE NULL END AS pearson_r
    FROM sums WHERE n >= 3
    """,
    tags=("T15", "T14", "D7"),
)
def t15_series_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-week Pearson correlation between the daily click and purchase
    count series — "do clicks co-move with purchases this week", the
    leading-indicator check behind funnel-health dashboards. Like T14,
    the estimator is computed from exact BIGINT sums (n, Σx, Σy, Σxy,
    Σx², Σy² over integer daily counts) with the final r assembled in
    one pinned float expression — `corr()` itself float-accumulates
    per row (association-order-dependent), so it is deliberately
    avoided; degenerate weeks (zero variance on either side) return
    NULL rather than a 0/0 NaN.

    Scale: the fact collapses to |days| rows map-side; the weekly
    regression sums and the r-expression run over that tiny rollup —
    two cheap aggregates after one fact pass.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("y"),
    )
    sums = daily.groupBy(F.date_trunc("week", "d").alias("wk")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.when(
        (var_x > 0) & (var_y > 0),
        cov_n.cast("double")
        / (F.sqrt(var_x.cast("double")) * F.sqrt(var_y.cast("double"))),
    )
    return (
        sums.filter(F.col("n") >= 3)
        .select(
            "wk",
            "n",
            F.col("sx").alias("clicks"),
            F.col("sy").alias("purchases"),
            r.alias("pearson_r"),
        )
    )


@register(
    "t16_stl_decompose",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS d,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    tr AS (
        SELECT d, y,
               CASE WHEN COUNT(*) OVER w = 7
                    THEN CAST(SUM(y) OVER w AS DOUBLE) / 7.0 END AS trend,
               dayofweek(d) AS dow
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    seas AS (
        SELECT dow,
               CAST(SUM(CAST(FLOOR((CAST(y AS DOUBLE) - trend) * 10000)
                             AS BIGINT)) AS DOUBLE)
                   / (10000.0 * COUNT(*)) AS seasonal
        FROM tr WHERE trend IS NOT NULL
        GROUP BY dow
    )
    SELECT t.d, t.y, t.trend, s.seasonal,
           CAST(t.y AS DOUBLE) - t.trend - s.seasonal AS residual
    FROM tr t JOIN seas s ON s.dow = t.dow
    WHERE t.trend IS NOT NULL
    """,
    tags=("T16", "T7", "T3", "E5"),
)
def t16_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic additive seasonal decomposition (the moving-average core
    of STL, Cleveland et al. 1990): daily counts split into trend
    (centered 7-day moving average, complete windows only), weekly
    seasonal (per-weekday mean of the detrended series), and residual —
    the decomposition T7's diurnal profile performs on the
    hour-of-day axis, here on the day-of-week axis with an explicit
    trend term so level shifts don't contaminate the seasonal.

    Determinism: the trend is an exact-integer sum / 7.0 (one IEEE
    division); the seasonal mean fixed-points the detrended values to
    1e-4 BIGINT units before averaging (floor — no midpoint semantics),
    so its sum is association-free; the residual subtracts through an
    identical expression tree on both engines. No ROUND anywhere.

    Scale: the fact collapses to |days| rows map-side; both windows and
    the weekday census run over that tiny series — the T8 shape. A
    per-key variant adds the key to every PARTITION BY/GROUP BY.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "y",
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.sum("y").over(w).cast("double") / 7.0,
        ).alias("trend"),
        F.dayofweek("d").alias("dow"),
    )
    seas = (
        tr.filter(F.col("trend").isNotNull())
        .groupBy("dow")
        .agg(
            (
                F.sum(
                    F.floor(
                        (F.col("y").cast("double") - F.col("trend")) * 10000
                    ).cast("long")
                ).cast("double")
                / (10000.0 * F.count(F.lit(1)))
            ).alias("seasonal")
        )
    )
    return (
        tr.filter(F.col("trend").isNotNull())
        .join(seas, "dow")
        .select(
            "d",
            "y",
            "trend",
            "seasonal",
            (
                F.col("y").cast("double") - F.col("trend") - F.col("seasonal")
            ).alias("residual"),
        )
    )



@register(
    "t18_period_growth",
    oracle="""
    WITH weekly AS (
        SELECT date_trunc('week', o_orderdate) AS wk,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS revenue
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        GROUP BY 1
    )
    SELECT wk, n_orders, revenue,
           revenue - LAG(revenue) OVER (ORDER BY wk) AS wow_delta,
           CASE WHEN LAG(revenue) OVER (ORDER BY wk) > 0.0
                THEN ROUND((revenue - LAG(revenue) OVER (ORDER BY wk))
                           / LAG(revenue) OVER (ORDER BY wk), 6) END
               AS wow_pct,
           CAST(n_orders - LAG(n_orders) OVER (ORDER BY wk) AS BIGINT)
               AS order_delta
    FROM weekly
    """,
    tags=("T18", "E3", "D1"),
)
def t18_period_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth — the universal BI report shape: weekly
    revenue/order rollup with week-over-week absolute and percentage
    deltas via LAG over the period spine. Deltas subtract two exact
    decimal-disciplined sums (bit-identical on both engines); the pct is
    one division of those exact values, rounded at the report edge;
    the first week's deltas are NULL by construction, not zero — a
    missing baseline is not a 0% change.

    Scale: fact collapses to |weeks| rows map-side; the LAG window runs
    over that tiny spine (T8's shape). Month/quarter variants change one
    date_trunc literal.
    """
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    weekly = o.groupBy(F.date_trunc("week", "o_orderdate").alias("wk")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )
    w = Window.orderBy("wk")
    prev_rev = F.lag("revenue").over(w)
    return weekly.select(
        "wk",
        "n_orders",
        "revenue",
        (F.col("revenue") - prev_rev).alias("wow_delta"),
        F.when(
            prev_rev > 0.0,
            F.round((F.col("revenue") - prev_rev) / prev_rev, 6),
        ).alias("wow_pct"),
        (F.col("n_orders") - F.lag("n_orders").over(w)).alias("order_delta"),
    )
