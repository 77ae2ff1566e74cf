"""C10: as-of join (nearest earlier match) — SURVEY.md §4.3#2.

Spark has no native ASOF JOIN; the engine implements it as a union + ordered
window scan, which is a single shuffle on (keys, time) — no range-join blowup,
no per-key driver loop. This is the classic "piecewise-constant fill" trick:

    1. tag right rows, union them with left rows on the shared key/time axis;
    2. sort within each key partition by (time, right-before-left on ties);
    3. ``last(right_payload, ignorenulls=True)`` over an unbounded-preceding
       frame propagates the most recent right row to every left row.

Scale: one hash-partition shuffle by key + in-partition sort; at 100 TB this
beats a range self-join (quadratic per key) and never materializes per-key
state. Matches DuckDB ``ASOF JOIN`` (greatest right.ts <= left.ts) including
the equal-timestamp case.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_payload: Sequence[str],
    how: str = "inner",
    right_order: Sequence[str] = (),
    direction: str = "backward",
    tolerance_secs: float | None = None,
) -> DataFrame:
    """Join each left row to the matching right row along the time axis.

    ``direction`` (pandas ``merge_asof`` parity):
      - ``'backward'`` (default): latest right with right.ts <= left.ts;
      - ``'forward'``: earliest right with right.ts >= left.ts;
      - ``'nearest'``: the closer of the two (ties -> backward). The
        forward arm of 'nearest' is strict (right.ts > left.ts), since an
        equal-timestamp match is already the backward arm at distance 0.

    ``tolerance_secs``: maximum |left.ts - right.ts| in seconds; matches
    farther away count as no-match (dropped under 'inner', null under
    'left'). Exact at microsecond resolution (epoch doubles are integral
    multiples of 1e-6 within the float53 mantissa through year ~2255).

    ``right`` must be unique per (on..., right_time) — either pre-deduped, or
    disambiguated by ``right_order``: payload columns used as a tie-break
    among right rows sharing (key, ts), of which the LARGEST wins in every
    direction. Folding the tie-break into the window ordering instead of
    pre-aggregating saves a whole shuffle+aggregate stage over the right
    side ('nearest' pre-dedups instead: its two fills share one ordering,
    which cannot encode both arms' tie-breaks — callers pass unique rights).
    Returns all left columns plus ``right_payload`` columns and
    ``asof_<right_time>`` (the matched right timestamp). ``how``: 'inner'
    drops unmatched left rows, 'left' keeps them with nulls.
    """
    on = list(on)

    def _tolerance(secs: float) -> Column:
        """Tolerance literal matching the time axis: a DayTimeInterval for
        timestamp columns (TZ and NTZ — a double cast is illegal on NTZ, and
        interval comparison is exact at microsecond resolution), the plain
        number for numeric axes (units = the column's own units)."""
        from pyspark.sql.types import TimestampNTZType, TimestampType

        ts_type = right.schema[right_time].dataType
        if isinstance(ts_type, (TimestampType, TimestampNTZType)):
            return F.make_dt_interval(secs=F.lit(float(secs)))
        return F.lit(secs)

    # The implementation owns these working names; a caller frame already
    # using one would produce ambiguous/corrupt columns, so fail loudly.
    reserved = {"__ts", "__is_right", "__payload", "__match"}
    for side, df in (("left", left), ("right", right)):
        clash = reserved & set(df.columns)
        if clash:
            raise ValueError(f"asof_join: {side} frame uses reserved column(s) {sorted(clash)}")
    if "__t" in right_payload:
        raise ValueError("asof_join: right_payload may not contain reserved name '__t'")
    payload_struct = F.struct(
        F.col(right_time).alias("__t"), *[F.col(c) for c in right_payload]
    )
    r = right.select(
        *on,
        F.col(right_time).alias("__ts"),
        F.lit(1).alias("__is_right"),
        payload_struct.alias("__payload"),
    )
    l = left.select(
        "*",
        F.col(left_time).alias("__ts"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    if direction == "backward":
        # Right rows sort before left rows at equal timestamps so ties match;
        # right_order columns (nulls on left rows, irrelevant there) pick the
        # winning right row among equal (key, ts) — last in frame = largest.
        order = [F.col("__ts").asc(), F.col("__is_right").desc()]
        order += [F.col(f"__payload.{c}").asc_nulls_first() for c in right_order]
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        match = F.last("__payload", ignorenulls=True).over(w)
    elif direction == "forward":
        # Left rows sort before right rows at equal timestamps, so the
        # following frame still sees an equal-ts right (>= is inclusive);
        # right_order DESCENDS so first-in-frame = largest, matching the
        # backward tie-break.
        order = [F.col("__ts").asc(), F.col("__is_right").asc()]
        order += [F.col(f"__payload.{c}").desc_nulls_last() for c in right_order]
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        match = F.first("__payload", ignorenulls=True).over(w)
    elif direction == "nearest":
        if right_order:
            raise ValueError(
                "asof_join: direction='nearest' requires a pre-deduped right "
                "side (right_order cannot serve both fill arms)"
            )
        # ONE ordering, two frames over it: the backward fill includes
        # equal-ts rights (sorted before the left row); the forward fill's
        # following frame therefore only sees strictly-later rights — which
        # is exactly the strict forward arm 'nearest' needs.
        order = [F.col("__ts").asc(), F.col("__is_right").desc()]
        wb = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        mb = F.last("__payload", ignorenulls=True).over(wb)
        mf = F.first("__payload", ignorenulls=True).over(wf)
        if tolerance_secs is not None:
            tol = _tolerance(tolerance_secs)
            mb = F.when(F.col("__ts") - mb["__t"] <= tol, mb)
            mf = F.when(mf["__t"] - F.col("__ts") <= tol, mf)
        d_back = F.col("__ts") - mb["__t"]
        d_fwd = mf["__t"] - F.col("__ts")
        match = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(d_fwd < d_back, mf)
            .otherwise(mb)  # ties -> backward
        )
    else:
        raise ValueError(
            f"asof_join: direction must be 'backward', 'forward' or 'nearest',"
            f" got {direction!r}"
        )
    if tolerance_secs is not None and direction != "nearest":
        # The matched timestamp is on the known side of __ts per direction,
        # so the signed difference is always non-negative.
        tol = _tolerance(tolerance_secs)
        if direction == "backward":
            diff = F.col("__ts") - match["__t"]
        else:
            diff = match["__t"] - F.col("__ts")
        match = F.when(diff <= tol, match)
    filled = unioned.withColumn("__match", match)
    out = filled.filter(F.col("__is_right") == 0)
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join: how must be 'inner' or 'left', got {how!r}")
    cols = [c for c in left.columns] + [
        F.col(f"__match.{c}").alias(c) for c in right_payload
    ] + [F.col("__match.__t").alias(f"asof_{right_time}")]
    return out.select(*cols)


@register(
    "c10_asof_join",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, MAX(event_id) AS click_event_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    purchases AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           CAST(p.value AS DOUBLE) AS purchase_value,
           c.click_event_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS secs_after_click
    FROM purchases p ASOF JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("C10",),
    bench=True,
)
def c10_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's nearest earlier click."""
    e = table(spark, sf_dir, "events")
    # No pre-aggregation: equal-(user, ts) clicks are disambiguated by the
    # right_order tie-break inside the window (max event_id wins), saving a
    # shuffle+aggregate over the click side.
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        right_payload=["click_event_id"],
        how="inner",
        right_order=["click_event_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "purchase_value",
        "click_event_id",
        (F.unix_timestamp("ts") - F.unix_timestamp("asof_ts")).cast("long").alias(
            "secs_after_click"
        ),
    )


@register(
    "c10_asof_forward",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, MAX(event_id) AS click_event_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    purchases AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ),
    m AS (
        SELECT p.event_id, p.user_id, p.value, p.ts AS p_ts,
               c.click_event_id, c.ts AS c_ts
        FROM purchases p ASOF JOIN clicks c
          ON p.user_id = c.user_id AND p.ts <= c.ts
    )
    SELECT event_id, user_id, CAST(value AS DOUBLE) AS purchase_value,
           click_event_id,
           CAST(date_diff('second', p_ts, c_ts) AS BIGINT) AS secs_until_click
    FROM m
    WHERE epoch_us(c_ts) - epoch_us(p_ts) <= CAST(14400 AS BIGINT) * 1000000
    """,
    tags=("C10",),
)
def c10_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: each purchase matched to the
    user's EARLIEST click at-or-after the purchase, but only within 4
    hours — the "did the purchase trigger a follow-up?" attribution
    query. Same single-shuffle union+window plan as the backward join,
    with the fill scanning the following frame instead.
    """
    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        right_payload=["click_event_id"],
        how="inner",
        right_order=["click_event_id"],
        direction="forward",
        tolerance_secs=14400,
    )
    return joined.select(
        "event_id",
        "user_id",
        "purchase_value",
        "click_event_id",
        (F.unix_timestamp("asof_ts") - F.unix_timestamp("ts")).cast("long").alias(
            "secs_until_click"
        ),
    )


@register(
    "c10_asof_nearest",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, MAX(event_id) AS click_event_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    purchases AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ),
    b AS (
        SELECT p.event_id, c.click_event_id AS b_id, c.ts AS b_ts
        FROM purchases p ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    ),
    f AS (
        SELECT p.event_id, c.click_event_id AS f_id, c.ts AS f_ts
        FROM purchases p ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts < c.ts
    ),
    chosen AS (
        SELECT p.event_id, p.user_id, p.value, p.ts,
               CASE WHEN b_id IS NULL THEN f_ts
                    WHEN f_id IS NULL THEN b_ts
                    WHEN epoch_us(f_ts) - epoch_us(p.ts)
                         < epoch_us(p.ts) - epoch_us(b_ts) THEN f_ts
                    ELSE b_ts END AS m_ts,
               CASE WHEN b_id IS NULL THEN f_id
                    WHEN f_id IS NULL THEN b_id
                    WHEN epoch_us(f_ts) - epoch_us(p.ts)
                         < epoch_us(p.ts) - epoch_us(b_ts) THEN f_id
                    ELSE b_id END AS click_event_id
        FROM purchases p
        LEFT JOIN b ON p.event_id = b.event_id
        LEFT JOIN f ON p.event_id = f.event_id
    )
    SELECT event_id, user_id, CAST(value AS DOUBLE) AS purchase_value,
           click_event_id,
           CAST(ABS(date_diff('second', m_ts, ts)) AS BIGINT) AS secs_to_click,
           CASE WHEN m_ts IS NULL THEN NULL
                WHEN m_ts <= ts THEN 'backward' ELSE 'forward' END
               AS matched_direction
    FROM chosen
    """,
    tags=("C10",),
)
def c10_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: each purchase matched to the user's closest
    click in EITHER direction (ties prefer the earlier click), plus which
    arm won. Still one shuffle: both fills are frames over the same
    (user, time) sort — the oracle needs two ASOF joins plus two hash
    joins to express the same thing.

    The click side is pre-deduped per (user_id, ts) because 'nearest'
    shares one window ordering between its two fill arms (see asof_join).
    """
    e = table(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        right_payload=["click_event_id"],
        how="left",
        direction="nearest",
    )
    return joined.select(
        "event_id",
        "user_id",
        "purchase_value",
        "click_event_id",
        F.abs(F.unix_timestamp("asof_ts") - F.unix_timestamp("ts"))
        .cast("long")
        .alias("secs_to_click"),
        F.when(F.col("asof_ts").isNull(), F.lit(None).cast("string"))
        .when(F.col("asof_ts") <= F.col("ts"), F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("matched_direction"),
    )
