"""Window functions (E) and the R5-style dedup-keep-best pattern.

Reference parity: DuplicateMarker (preprocessing/DuplicateMarker.java:21-53)
flags duplicate reads keeping the best-quality copy — the engine expresses
that as ``row_number() OVER (PARTITION BY dup_key ORDER BY quality DESC)``
and filters/flags on the rank (E1 / k1 in dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.registry import register


@register(
    "e1_dedup_keep_best",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
    tags=("E1",),
)
def e1_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-keep-best (R5 MarkDuplicates analog): best order per (cust, priority)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "e2_ranking_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(RANK() OVER w AS BIGINT) AS price_rank,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS price_dense_rank,
           CAST(NTILE(4) OVER w AS INTEGER) AS price_quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
    tags=("E2",),
)
def e2_ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over a priority-partitioned price ordering."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        F.rank().over(w).cast("long").alias("price_rank"),
        F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
    )


@register(
    "e3_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           COALESCE(CAST(date_diff('second', LAG(ts) OVER w, ts) AS BIGINT), -1)
               AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    tags=("E3",),
)
def e3_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead event deltas per user (event-sequence analysis)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_ts = F.lag("ts").over(w)
    return e.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.coalesce(
            (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)).cast("long"),
            F.lit(-1).cast("long"),
        ).alias("secs_since_prev"),
    )


@register(
    "e4_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS orders_so_far
    FROM orders
    """,
    tags=("E4",),
)
def e4_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals with an unbounded-preceding row frame."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
        F.count(F.lit(1)).over(w).cast("long").alias("orders_so_far"),
    )


@register(
    "e5_sliding_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS last3_spend
    FROM orders
    """,
    tags=("E5",),
)
def e5_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 3-row frame (moving sum of the customer's last three orders)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-2, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("last3_spend"),
    )


@register(
    "e6_first_last_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order_key,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate ASC, o_orderkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    tags=("E6",),
)
def e6_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value over an explicit full-partition frame."""
    o = table(spark, sf_dir, "orders")
    w_ord = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    w_full = w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w_ord).alias("first_order_key"),
        F.last("o_orderkey").over(w_full).alias("last_order_key"),
    )


@register(
    "e7_percentiles",
    oracle="""
    SELECT o_orderkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS price_pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS price_cume_dist
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
    tags=("E7",),
)
def e7_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist over a global price ordering.

    Scale note: an unpartitioned window forces a single-partition sort; at
    100 TB this query would be re-keyed (e.g. per-segment percentiles) or
    approximated with approxQuantile. Declared here for semantic coverage.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return o.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
    )


@register(
    "e8_time_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
               AS rolling_1h_sum,
           CAST(COUNT(*) OVER w AS BIGINT) AS rolling_1h_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    tags=("E8", "E5", "I1"),
)
def e8_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per-user rolling 1-hour sum/count.

    ``rangeBetween`` on microsecond epoch — the frame is defined by a TIME
    span, not a row count, so bursts widen the frame and quiet periods
    shrink it (what E5's ROWS frame can't express). Rows with equal
    timestamps are frame peers on both engines, and the summed value is
    decimal-cast, so the result is order-independent. This is the batch
    twin of a sliding stream aggregation keyed to each event's own
    timestamp rather than to fixed buckets (I2).
    """
    e = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("rolling_1h_sum"),
        F.count(F.lit(1)).over(w).alias("rolling_1h_events"),
    )


@register(
    "e9_windowed_distinct",
    oracle="""
    SELECT event_id, user_id, event_type,
           COUNT(DISTINCT event_type) OVER (PARTITION BY user_id)
               AS n_types_user,
           COUNT(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_types_so_far
    FROM events
    """,
    tags=("E9", "E2", "E4", "D3"),
)
def e9_windowed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count window aggregates — the per-row "how many distinct X
    has this key produced (ever / so far)" enrichment. Spark's window
    functions don't accept DISTINCT, so the engine derives both forms with
    rank arithmetic while the oracle runs DuckDB's NATIVE
    COUNT(DISTINCT) OVER — an asymmetric check that pins the rewrite's
    semantics, not just its self-consistency:

    - total per key: dense_rank over (key ORDER BY value), then MAX over
      the key partition — the max dense rank IS the distinct count;
    - running per key: flag each value's first occurrence (row_number = 1
      over (key, value) in time order), then a running SUM of flags over
      the time-ordered key partition.

    Scale: both forms sort (user_id, ...) once each — two window sorts
    over the same key partitioning, one hash exchange (Spark reuses the
    partitioning across the windows; integer arithmetic only, no distinct
    state object per row like a naive collect_set approach would build —
    that is the trap at 100 TB, O(distinct) state PER ROW).
    """
    e = table(spark, sf_dir, "events")
    w_rank = Window.partitionBy("user_id").orderBy("event_type")
    w_user = Window.partitionBy("user_id")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.select("event_id", "user_id", "event_type", "ts")
        .withColumn("dr", F.dense_rank().over(w_rank))
        .withColumn("n_types_user", F.max("dr").over(w_user).cast("long"))
        .withColumn(
            "first_seen",
            (F.row_number().over(w_first) == 1).cast("long"),
        )
        .withColumn("n_types_so_far", F.sum("first_seen").over(w_run))
        .select(
            "event_id", "user_id", "event_type", "n_types_user", "n_types_so_far"
        )
    )


@register(
    "e10_distribution_ranks",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WHERE o_orderstatus = 'F'
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("E10", "E2", "E7"),
)
def e10_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank battery: PERCENT_RANK / CUME_DIST / NTILE(4) of
    order value within each priority class — the relative-standing
    functions E2's rank/dense_rank battery doesn't cover (used for
    percentile bucketing, spend-tier assignment, monotone calibration).

    percent_rank and cume_dist are exact integer ratios ((rank−1)/(n−1),
    rows≤current/n) evaluated as one IEEE division — identical across
    engines with no rounding discipline. NTILE requires a TOTAL order to
    be well-defined, so the window orders by (value, unique key); without
    the tie-break, tied rows could legally land in different tiles on
    different engines/partitionings — the same total-order rule the F1
    sort contract pins.

    Scale: one hash exchange on the partition key + in-partition sort;
    all three functions share the single window pass. The status filter
    pushes to the parquet scan.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "e11_rolling_median",
    oracle="""
    SELECT event_id, user_id, value,
           ROUND(median(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
           ), 4) AS med5
    FROM events
    """,
    tags=("E11", "E5", "D16"),
)
def e11_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling trailing-5 median per user — the robust moving-location
    estimator T3's mean/stddev z-score is sensitive to outliers on; the
    order-statistic window aggregate (median over a ROWS frame) that
    cheap running-sum tricks can't express, so the engine re-sorts each
    frame (Spark evaluates the aggregate per frame; DuckDB keeps an
    ordered structure — same values either way).

    Determinism: frames are pinned by the (ts, event_id) total order;
    odd frames pick an exact element, even (warm-up) frames average the
    two middle doubles — (a+b)/2 is exactly DuckDB's even-count median
    rule, and the 2-decimal inputs make ROUND(,4) a representation no-op
    (the D16 discipline). Spark refuses order-statistic aggregates over a
    frame (median/percentile are WITHIN-GROUP-only), so the engine
    collects the ≤5-element frame, sorts it, and applies the order
    statistic as an expression — the interpolation rule is pinned in the
    plan instead of trusted to the engine.

    Scale: one hash shuffle on user_id + per-partition sort — identical
    exchange shape to E5's sliding sum; the collected frame is bounded at
    5 elements by construction, so per-row state is O(frame), never
    O(partition).
    """
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    frame = F.array_sort(F.collect_list("value").over(w))
    n = F.size(frame)
    mid_hi = F.element_at(frame, (n.cast("int") / 2 + 1).cast("int"))
    mid_lo = F.element_at(frame, (n.cast("int") / 2).cast("int"))
    med = F.when(n % 2 == 1, F.element_at(frame, ((n + 1) / 2).cast("int"))).otherwise(
        (mid_lo + mid_hi) / 2
    )
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.round(med, 4).alias("med5"),
    )


@register(
    "e12_nth_value",
    oracle="""
    SELECT event_id, user_id,
           nth_value(value, 3) OVER w AS third_val,
           first_value(CASE WHEN event_type = 'purchase' THEN value END
                       IGNORE NULLS) OVER w AS first_purchase_val,
           last_value(CASE WHEN event_type = 'error' THEN value END
                      IGNORE NULLS) OVER w AS last_error_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("E12", "E6", "E3"),
)
def e12_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window values beyond first/last (E6): `nth_value` (the
    k-th row of the frame — NULL until the frame is k deep) and
    IGNORE NULLS variants of first/last over conditional expressions —
    "the user's first purchase amount so far" / "their most recent
    error value", the as-of-current-row state lookups dashboards join
    for. IGNORE NULLS is the load-bearing part: with nulls respected,
    the conditional CASE would poison first/last at almost every row.

    Same window spec text on both engines; frames are pinned by the
    (ts, event_id) total order so every positional lookup is exact.
    """
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    error_val = F.when(F.col("event_type") == "error", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        F.nth_value("value", 3).over(w).alias("third_val"),
        F.first(purchase_val, ignorenulls=True).over(w).alias(
            "first_purchase_val"
        ),
        F.last(error_val, ignorenulls=True).over(w).alias("last_error_val"),
    )
