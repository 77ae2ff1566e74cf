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
) -> DataFrame:
    """Join each left row to the latest right row with right.ts <= left.ts.

    ``right`` must be unique per (on..., right_time) — either pre-deduped, or
    disambiguated by ``right_order``: payload columns used as an ascending
    tie-break among right rows sharing (key, ts), of which the LAST wins.
    Folding the tie-break into the window ordering instead of pre-aggregating
    saves a whole shuffle+aggregate stage over the right side.
    Returns all left columns plus ``right_payload`` columns and
    ``asof_<right_time>`` (the matched right timestamp). ``how``: 'inner'
    drops unmatched left rows, 'left' keeps them with nulls.
    """
    on = list(on)
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
    # Right rows sort before left rows at equal timestamps so ties match;
    # right_order columns (nulls on left rows, irrelevant there) pick the
    # winning right row among equal (key, ts).
    order = [F.col("__ts").asc(), F.col("__is_right").desc()]
    order += [F.col(f"__payload.{c}").asc_nulls_first() for c in right_order]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
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
