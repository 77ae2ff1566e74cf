"""Live Structured Streaming pipelines (SURVEY §2.2 I8 + stateful I6).

Batch-equivalence mode (operators/streaming_batch.py) proves the event-time
*semantics* against the DuckDB oracle; this module runs the same logic
through the real streaming engine — ``readStream`` file source → event-time
transforms → ``writeStream`` sinks with checkpointing — and
tests/test_streaming_live.py asserts stream output == batch output
(SURVEY §5.2#3 batch-vs-stream equivalence property).

Scale notes: file-source streams list directories each trigger — at 100 TB
use ``maxFilesPerTrigger`` to bound micro-batch size; watermarks bound the
window/dedup state store; ``applyInPandasWithState`` state must stay small
per key (a struct, never a buffer of events).

API boundary: Spark 4's ``transformWithStateInPandas`` (StatefulProcessor,
RocksDB-backed composite state) is the successor API for arbitrary state;
its Python runner requires protobuf, which this container lacks, so the
stateful surface here is the fully-supported ``applyInPandasWithState``
(verified live in tests/test_streaming_live.py) — same keyed-state model,
swap-in upgrade where protobuf is available.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def events_file_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source event stream (schema pinned — no inference mid-stream)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(src_dir)


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """I1 live: watermarked tumbling 10-minute window aggregate."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """I5 live: first event per (user_id, event_type) within the watermark."""
    return events.withWatermark("ts", watermark).dropDuplicates(
        ["user_id", "event_type"]
    )


def streaming_dedup_within_watermark(
    events: DataFrame, watermark: str = "45 days"
) -> DataFrame:
    """I5 live, state-bounded variant: ``dropDuplicatesWithinWatermark``
    (Spark 3.5+) — unlike plain streaming ``dropDuplicates`` (whose key
    state never expires without an event-time column in the key), the
    within-watermark form evicts each key's dedup state once the
    watermark passes it, which is the ONLY sustainable contract for an
    unbounded high-cardinality key stream (exact global dedup forever vs
    bounded-window dedup is precisely the K1-vs-K17 batch distinction).
    With a watermark wider than the fixture's event span the result
    coincides with global dedup, which is what the live test pins.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def stateful_user_peaks(events: DataFrame) -> DataFrame:
    """I6 live: per-user running (count, peak value) via keyed state.

    State = one (count, max) struct per user — O(1) per key, the only shape
    that survives unbounded streams. Emits the refreshed state each batch.
    """
    out_schema = "user_id long, events_so_far long, max_value double"
    state_schema = "count long, mx double"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        count, mx = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            count += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((count, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "events_so_far": [count], "max_value": [mx]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "update",
) -> Any:
    """Drain all available input into an in-memory table (test harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_stream_to_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> Any:
    """I8: append-mode parquet sink with exactly-once checkpointing."""
    q = (
        stream_df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def sliding_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """I2 live: watermarked sliding window (10 min length, 5 min slide)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_values(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "1 hour") -> DataFrame:
    """I3 live: session windows per user (gap-based merge in the state store)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def click_purchase_join(
    clicks: DataFrame, purchases: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """I8 live: stream-stream interval join (click → purchase within 30 min).

    Both sides are watermarked — the interval condition plus the watermarks
    is what lets the engine expire buffered join state (state per user is
    bounded by interval width + watermark delay, independent of stream
    length). Inner join ⇒ append-mode output.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts"))
        .cast("long")
        .alias("secs_to_purchase"),
    )


def click_purchase_left_join(
    clicks: DataFrame, purchases: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """I11 live: LEFT OUTER stream-stream interval join.

    Same key + interval condition as the inner join, but unmatched clicks
    are emitted WITH NULLS once the watermark passes click.ts + interval —
    the engine's proof that no qualifying purchase can still arrive. Two
    consequences the live test pins:

    - matched rows stream out exactly like the inner join;
    - a finite replay can only emit the null row for clicks whose
      30-minute window the FINAL watermark closed; younger unmatched
      clicks stay buffered in state. The final watermark is the MIN of
      the two sides' own (max event time - delay) marks
      (multipleWatermarkPolicy=min), so a quiet click stream holds back
      null emission even when purchases run far ahead.

    State per key is bounded by interval width + watermark delay, same as
    the inner form.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts"))
        .cast("long")
        .alias("secs_to_purchase"),
        F.col("c_ts").alias("click_ts"),
    )


def run_stream_upsert_counts(
    spark: SparkSession, src_dir: str, state_dir: str, checkpoint_dir: str
) -> None:
    """I8 ``foreachBatch`` upsert sink: each micro-batch's per-user counts
    MERGE into a parquet state table (insert new keys, add to matched) —
    the streaming CDC-apply pattern.

    Each batch: aggregate the delta → full-outer merge with current state
    → write to a scratch dir → swap (the reference's R16 write-then-move
    commit, FileMover.java:9-27 — required here because parquet cannot be
    overwritten while it is also the read source). The two-rename swap
    has a crash window, so apply_batch leads with RECOVERY: a ``.next``
    dir carrying its ``_applied_batch`` marker is a complete post-state
    (finish the swap); otherwise a stranded ``.old`` is the intact
    pre-state (roll back). The marker also upgrades replay handling to
    exactly-once: a batch replayed after its swap completed (crash before
    the checkpoint advanced) is recognized and skipped instead of
    re-merged into post-swap state.
    """
    import os
    import shutil

    from pyspark.sql.utils import AnalysisException

    def recover_state() -> None:
        # crash recovery: the marker is written only after the next
        # state's parquet completes, so its presence proves ``.next``
        # is whole (finish the swap); without it, a stranded ``.old``
        # is the intact pre-state (roll back). Runs at stream start —
        # a drained checkpoint fires no batches — and before each batch.
        nxt, old = state_dir + ".next", state_dir + ".old"
        if not os.path.exists(state_dir):
            if os.path.exists(os.path.join(nxt, "_applied_batch")):
                os.rename(nxt, state_dir)
            elif os.path.exists(old):
                os.rename(old, state_dir)

    recover_state()
    stream = events_file_stream(spark, src_dir, max_files_per_trigger=2)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        nxt = state_dir + ".next"
        old = state_dir + ".old"
        recover_state()
        marker = os.path.join(state_dir, "_applied_batch")
        if os.path.exists(marker):
            with open(marker) as f:
                if f.read().strip() == str(batch_id):
                    return  # replay after a completed swap — exactly-once
        inc = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("total_value"),
        )
        try:
            state = spark.read.parquet(state_dir).select(
                F.col("user_id").alias("s_user"),
                F.col("n_events").alias("s_n"),
                F.col("total_value").cast("decimal(18,4)").alias("s_total"),
            )
        except AnalysisException:
            state = None
        if state is None:
            merged = inc.select(
                "user_id", "n_events", F.col("total_value").cast("double")
                .alias("total_value")
            )
        else:
            merged = (
                # eqNullSafe: a NULL user_id is a real group on both
                # sides — a plain equality would emit both halves every
                # batch and the NULL key's counts would never consolidate
                inc.join(
                    state, inc.user_id.eqNullSafe(state.s_user), "full_outer"
                )
                .select(
                    F.coalesce("user_id", "s_user").alias("user_id"),
                    (
                        F.coalesce("n_events", F.lit(0))
                        + F.coalesce("s_n", F.lit(0))
                    ).alias("n_events"),
                    (
                        F.coalesce(F.col("total_value"), F.lit(0).cast("decimal(18,4)"))
                        + F.coalesce("s_total", F.lit(0).cast("decimal(18,4)"))
                    ).cast("double").alias("total_value"),
                )
            )
        merged.write.mode("overwrite").parquet(nxt)
        with open(os.path.join(nxt, "_applied_batch"), "w") as f:
            f.write(str(batch_id))
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(state_dir):
            os.rename(state_dir, old)
        os.rename(nxt, state_dir)
        shutil.rmtree(old, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def checkpoint_stream_id(checkpoint_dir: str) -> str:
    """The streaming query id Spark persists in the checkpoint's metadata
    file — stable across restarts of the SAME checkpoint, regenerated on a
    checkpoint reset: exactly Delta's `txn` appId semantics. By the time
    any foreachBatch batch runs, the file exists. Shared by every
    exactly-once sink (this module and plans/pipeline_spec.py)."""
    import json

    with open(os.path.join(checkpoint_dir, "metadata")) as f:
        return json.load(f)["id"]


def applied_batch_keys(
    history: list[dict], stream_id: str, legacy_is_mine: bool = False
) -> set:
    """The exactly-once idempotence set for the versioned-table sink:
    (stream_id, batch_id) pairs already committed.

    A LEGACY commit written by the pre-pair code carries only
    ``batch_id`` metadata, which is genuinely ambiguous: if the calling
    stream is the upgraded continuation of the writer that produced it,
    the batch was already applied (replaying it would double-apply); if
    the caller is a NEW stream (checkpoint reset, second writer), the
    colliding batch id is fresh data (skipping it would silently drop
    rows). No log-side evidence distinguishes the two, so the caller
    must say which: ``legacy_is_mine=True`` claims legacy commits for
    the calling stream (set it ONLY when resuming a checkpoint that
    predates the upgrade); the default False preserves the documented
    checkpoint-reset contract — new streams always apply. Commits
    written by current code always carry the full pair, so the
    ambiguity dies out with the migration."""
    applied = set()
    for c in history:
        md = c.get("metadata", {})
        if "batch_id" not in md:
            continue
        if "stream_id" in md:
            applied.add((md["stream_id"], md["batch_id"]))
        elif legacy_is_mine:
            applied.add((stream_id, md["batch_id"]))
    return applied


def run_stream_to_versioned_table(
    spark: SparkSession,
    src_dir: str,
    table_path: str,
    checkpoint_dir: str,
    legacy_batch_ids_are_mine: bool = False,
) -> None:
    """Streaming sink into the versioned table format (sources/
    table_format.py): each micro-batch's per-user counts merge with the
    table's current snapshot and commit as a NEW VERSION, with the
    stream's ``batch_id`` recorded in the commit metadata.

    The metadata is what upgrades foreachBatch's at-least-once replay to
    EXACTLY-ONCE application: a replayed batch (crash between the table
    commit and the stream checkpoint advance) finds its (stream_id,
    batch_id) PAIR already in the log and skips — the transactional-sink
    idempotence contract of Delta's `txn` (appId, version) pair. The
    stream id is the streaming query id Spark persists in the
    checkpoint's metadata file: stable across restarts of the SAME
    checkpoint, regenerated when the checkpoint is reset — so after a
    reset, new source data replaying with batch ids restarting at 0 is
    correctly applied (a bare-batch_id guard would silently drop it),
    and two distinct streams writing one table never collide.
    run_stream_upsert_counts gets effectively-once from re-merging
    against pre-swap state; this sink gets it from the commit log, and
    keeps every batch boundary time-travelable as a bonus.

    ``legacy_batch_ids_are_mine=True`` is the one-time migration switch
    for resuming a checkpoint that predates the (stream_id, batch_id)
    pair: it claims bare-batch_id commits for this stream so a batch
    committed pre-upgrade and replayed post-upgrade isn't applied twice.
    Leave it False (default) everywhere else — see applied_batch_keys.
    """
    from daas_apps_spark.sources.table_format import VersionedTable

    stream = events_file_stream(spark, src_dir, max_files_per_trigger=2)
    vt = VersionedTable(spark, table_path)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        sid = checkpoint_stream_id(checkpoint_dir)
        applied = applied_batch_keys(
            vt.history(), sid, legacy_is_mine=legacy_batch_ids_are_mine
        )
        if (sid, batch_id) in applied:  # replayed batch — already committed
            return
        inc = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("inc_value"),
        )
        try:
            state = vt.read().select(
                F.col("user_id").alias("s_user"),
                F.col("n_events").alias("s_n"),
                F.col("total_value").cast("decimal(18,4)").alias("s_total"),
            )
        except ValueError:  # no snapshot yet
            state = None
        if state is None:
            merged = inc.select(
                "user_id",
                "n_events",
                F.col("inc_value").cast("double").alias("total_value"),
            )
        else:
            merged = inc.join(
                state, inc.user_id.eqNullSafe(state.s_user), "full_outer"
            ).select(
                F.coalesce("user_id", "s_user").alias("user_id"),
                (
                    F.coalesce("n_events", F.lit(0))
                    + F.coalesce("s_n", F.lit(0))
                ).alias("n_events"),
                (
                    F.coalesce(
                        F.col("inc_value"), F.lit(0).cast("decimal(18,4)")
                    )
                    + F.coalesce("s_total", F.lit(0).cast("decimal(18,4)"))
                )
                .cast("double")
                .alias("total_value"),
            )
        vt.overwrite(
            merged, metadata={"stream_id": sid, "batch_id": batch_id}
        )

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


CUSUM_STATE_SCALE = 10_000  # 4-decimal fixed point — matches batch T8


def stateful_cusum(events: DataFrame, ref_means: dict[str, float]) -> DataFrame:
    """Streaming CUSUM (the live twin of batch T8): per event type, the
    running fixed-point sum of deviations from a pinned reference mean.

    A stream cannot two-pass for the series mean, so the reference mean is
    a PARAMETER (in production: yesterday's batch profile, exactly the
    baseline-vs-residual split of T7). State per key is two integers
    (event count, scaled value sum) — O(1), unbounded-stream-safe — and
    the CUSUM is derived at emit time as
    ``(sv - ref_fp * n) / SCALE`` ≡ Σ(v - ref), so the fold is exact
    integer arithmetic: replaying the same events in ANY micro-batch
    split yields bit-identical output (asserted live in
    tests/test_streaming_live.py).
    """
    out_schema = "event_type string, n_events long, cusum double"
    state_schema = "n long, sv long"
    scale = CUSUM_STATE_SCALE
    ref_fp = {k: round(v * scale) for k, v in ref_means.items()}

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, sv = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # int-rounding per value mirrors the batch decimal cast; the
            # sum of exact ints is association-free
            sv += int((pdf["value"] * scale).round().astype("int64").sum())
        state.update((n, sv))
        rf = ref_fp.get(key[0], 0)
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_events": [n],
                "cusum": [(sv - rf * n) / scale],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def click_purchase_hourly_counts(
    clicks: DataFrame, purchases: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Chained stateful operators in ONE streaming query (Spark 4 lifts
    the old one-stateful-op limit): the I9 stream-stream interval join
    feeds a tumbling-window aggregate of attributed purchases per hour —
    join state AND window state coexist, each bounded by its own
    watermark arithmetic (the join emits with a delayed watermark; the
    downstream window closes against that delayed clock, so no
    correctness race between the two state stores).

    Append-only: a window emits exactly once, when the post-join
    watermark passes its end — the live test pins stream output ==
    batch twin restricted to watermark-closed windows.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    return joined.groupBy(F.window("p_ts", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).alias("n_attributed"),
        F.max("purchase_id").alias("max_purchase_id"),
    ).select(
        F.col("w.start").alias("window_start"),
        "n_attributed",
        "max_purchase_id",
    )


def register_python_stream_source(spark: SparkSession) -> None:
    """A23: a STREAMING Python Data Source (Spark 4's
    ``SimpleDataSourceStreamReader``) — a deterministic synthetic tick
    stream whose offset is just an integer row counter. Each micro-batch
    reads the next slice of rows generated from the offset arithmetic
    alone (pure function of the counter, the A11 rule for batch
    sources), so any trigger pacing replays to the identical table —
    asserted live in tests/test_streaming_live.py.

    This is the R21-style "custom ingest dispatch" surface on the
    streaming side: a production analog would wrap a REST/queue poller
    the same way, with `initialOffset`/`read`/`commit` mapping to
    cursor-init / fetch-since / ack.
    """
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    class TickStreamReader(SimpleDataSourceStreamReader):
        ROWS_PER_BATCH = 25
        MAX_ROWS = 100

        def initialOffset(self):
            return {"n": 0}

        def read(self, start):
            n = start["n"]
            if n >= self.MAX_ROWS:
                return iter([]), {"n": n}
            end = min(n + self.ROWS_PER_BATCH, self.MAX_ROWS)
            rows = [(i, i % 7, float(i) * 1.5) for i in range(n, end)]
            return iter(rows), {"n": end}

        def readBetweenOffsets(self, start, end):
            return iter(
                [(i, i % 7, float(i) * 1.5) for i in range(start["n"], end["n"])]
            )

        def commit(self, end):
            pass

    class TickStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "synthetic_ticks"

        def schema(self) -> str:
            return "tick_id long, shard int, value double"

        def simpleStreamReader(self, schema) -> TickStreamReader:
            return TickStreamReader()

    spark.dataSource.register(TickStreamSource)


def ddl_field_names(schema_str: str) -> list[str]:
    """Top-level field names of a DDL schema string, split on commas at
    NESTING DEPTH ZERO only — ``decimal(18,4)``, ``map<string,int>``,
    ``struct<a:int,b:decimal(10,2)>`` and their nestings all carry
    commas that a bare ``split(',')`` would turn into phantom columns
    (and mis-sized output tuples). Backquoted names are opaque: a
    column literally named ``a,b`` (`` `a,b` int ``) is ONE field, not
    two. Pure Python (no SparkSession) because the data-source worker
    parses schemas outside the driver's JVM."""
    names: list[str] = []
    depth = 0
    in_bq = False  # inside `backquotes`: commas/brackets are name chars
    field = ""
    for ch in schema_str + ",":
        if ch == "`":
            in_bq = not in_bq
        if not in_bq:
            if ch in "<(":
                depth += 1
            elif ch in ">)":
                depth -= 1
        if ch == "," and depth == 0 and not in_bq:
            part = field.strip()
            if part.startswith("`"):
                # backquoted names may contain spaces: `weird col` int
                names.append(part[1 : part.index("`", 1)])
            elif part:
                # "name type ..." or "name: type" (struct-ish)
                names.append(part.split()[0].rstrip(":"))
            field = ""
        else:
            field += ch
    if depth != 0:
        raise ValueError(f"unbalanced brackets in DDL schema: {schema_str!r}")
    if in_bq:
        raise ValueError(
            f"unbalanced backquotes in DDL schema: {schema_str!r}"
        )
    return names


class _TableStreamReaderCore:
    """Shared offset arithmetic for the versioned-table stream sources
    (both the partition-planned full readers and the Simple fallbacks):
    the stream OFFSET is the table VERSION; ``maxVersionsPerTrigger``
    (Delta's maxFilesPerTrigger analog) caps each micro-batch at N
    commits so a cold start over a long log drains in bounded batches.
    Exactly-once is unaffected — the offset advances only to the capped
    version, and replay between committed offsets is exact because the
    commit log is immutable."""

    def __init__(
        self,
        path: str,
        max_versions_per_trigger: int | None,
        start_floor: int = 0,
    ):
        self.path = path
        self.max_versions = max_versions_per_trigger
        # startingVersion support: commits AT OR BELOW the floor are
        # never planned or delivered (floor = startingVersion - 1).
        # Numeric only — deterministic across checkpoint restarts, where
        # the reader is reconstructed from the same options; a "latest"
        # form would re-resolve to a newer floor after a crash and drop
        # rows from replayed batches
        self.start_floor = start_floor
        self._last: int | None = None  # newest version already planned

    def _capped_latest(self) -> int:
        from daas_apps_spark.sources.table_format import read_log

        if self._last is None:
            # latestOffset can be the engine's FIRST call (it does not
            # always call initialOffset first — same contract the
            # built-in _SimpleStreamReaderWrapper codes to); on a
            # checkpoint restart the engine replans the offset log's
            # last batch via partitions() before this, which seeds
            # _last with the true resume point
            self._last = self.start_floor
        commits = read_log(self.path)
        latest = (commits or [{"version": 0}])[-1]["version"]
        for c in commits:
            if c.get("_txn_pending"):
                # stall BEFORE the first unresolved multi-table txn:
                # advancing past a staged commit that later becomes
                # visible would silently skip its rows
                latest = min(latest, c["version"] - 1)
                break
        end = latest
        if self.max_versions is not None:
            end = min(latest, self._last + self.max_versions)
        end = max(end, self._last)  # offsets never regress
        self._last = end
        return end


def _make_table_stream_source(
    source_name: str,
    mode: str,
    schema_suffix: str,
):
    """Build the DataSource class for one of the two versioned-table
    stream sources (``table_changes`` = append-only row stream,
    ``table_cdf`` = change-data-feed with MOR deletes). Both resolve
    table state from FILES alone (commit-log replay + pyarrow, no
    SparkSession) because data-source workers run outside the driver's
    session.

    The default reader is a full ``DataSourceStreamReader``: offset
    planning (``latestOffset``/``partitions``) runs driver-side over the
    MANIFEST only, and each planned (file [, positions]) unit becomes
    one ``InputPartition`` read by an EXECUTOR
    (``read_change_unit``) — a multi-file commit scans in parallel and
    no row ever funnels through a single process, the same
    partition-planning contract as the A11 batch source
    (python_datasource.py). ``option("simplereader", "true")`` falls
    back to the prefetching ``SimpleDataSourceStreamReader`` (rows read
    in the driver-side source worker at latestOffset time) — kept as
    the documented degraded mode and for comparison tests.

    Rate limiting across restarts: the Python stream API gives
    ``latestOffset`` no start offset, so the reader tracks its own
    resume point — seeded 0 on a fresh start and re-seeded by the
    engine's replay of the offset log's last batch through
    ``partitions()`` on a checkpoint restart (the same engine contract
    the built-in Simple-reader wrapper codes to).

    Trigger semantics with a cap (measured, pinned in tests): a
    ``processingTime`` query polls ``latestOffset`` per trigger, so one
    running query drains a long log in capped steps — the steady-state
    catch-up shape. An ``availableNow`` run consults ``latestOffset``
    exactly ONCE (the engine fixes the run's target there), so it
    delivers one capped batch per run and a cold-start drain needs
    repeated runs (``drain_table_stream`` is that loop) — an
    engine-side limit of the Python stream API, not of this reader.

    Three composable rate limits on the full reader:
    ``maxVersionsPerTrigger`` bounds COMMITS per batch (Delta's analog
    for commit-sized ingests); ``maxFilesPerTrigger`` bounds planned
    READ UNITS (files / deletion-vector slices) per batch via
    unit-granular offsets, so even a single bulk-append commit of
    thousands of files drains in bounded batches; and
    ``maxBytesPerTrigger`` bounds the BYTES those units will read
    (each planned unit carries its manifest-recorded file size), the
    budget that actually holds under skew — a 10-file commit of 1 GB
    files and one of 1 KB files must not plan identical batches. Byte
    batching is soft-max: a single file over the budget still ships
    alone rather than wedging the stream.

    ``startingVersion`` (Delta's, inclusive, numeric only) floors the
    stream: commits below it are never planned OR delivered, so a
    stream can start past an un-replayable rewrite (the overwrite that
    seeded the table) instead of raising on it. Numeric only by
    design — the reader is rebuilt from the same options on a
    checkpoint restart, so the floor re-derives identically; a
    "latest" form would re-resolve post-crash and lose replayed rows.
    """
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    tag = mode == "cdf"

    class _ChangeUnitPartition(InputPartition):
        def __init__(
            self,
            unit: dict | None,
            columns: list[str],
            colmap: dict | None = None,
        ):
            self.unit = unit
            self.columns = columns
            # {lower logical: physical} — resolves the declared stream
            # schema's names to what files store when the table has an
            # active column mapping (rename/drop without rewrite)
            self.colmap = colmap or {}

    class _FullReader(_TableStreamReaderCore, DataSourceStreamReader):
        """Offsets are (version, units-delivered-within-version): the
        version-complete form serializes as ``{"version": v}`` (the
        original format — old checkpoints resume unchanged) and a
        mid-commit position as ``{"version": v, "unit": u}``. Unit
        granularity is what lets ``maxFilesPerTrigger`` bound a batch
        BELOW one commit: a 10k-file bulk append drains as many bounded
        micro-batches instead of one giant one (Delta's
        maxFilesPerTrigger/maxBytesPerTrigger concern —
        maxVersionsPerTrigger alone bounds commits, not bytes). Replay
        is exact at any split point because a commit's unit list is a
        pure function of the immutable log."""

        def __init__(
            self,
            path,
            columns,
            cap,
            arrow_schema=None,
            max_files=None,
            max_bytes=None,
            start_floor=0,
        ):
            _TableStreamReaderCore.__init__(
                self, path, cap, start_floor=start_floor
            )
            self.columns = columns
            self.arrow_schema = arrow_schema
            self.max_files = max_files
            self.max_bytes = max_bytes
            self._pos: tuple[int, int] | None = None
            self._plan_cache: dict[int, list] = {}
            self._log_snapshot: list | None = None

        def _units(self, v: int) -> list:
            from daas_apps_spark.sources.table_format import (
                change_plan_between,
                read_log,
            )

            if v <= 0 or v <= self.start_floor:
                # pre-floor commits are never delivered, so they are
                # never PLANNED either — starting past an overwrite (a
                # commit the change stream cannot replay) must not raise
                return []
            if v not in self._plan_cache:
                # plan against ONE log snapshot per engine call instead
                # of re-reading every commit JSON per version — planning
                # a K-commit batch over a V-commit log costs O(V), not
                # O(K*V). Commits are immutable, so a snapshot covering
                # version v is always sufficient; refresh only when it
                # does not reach v (restart replay before latestOffset)
                commits = self._log_snapshot
                if not commits or commits[-1]["version"] < v:
                    commits = read_log(self.path)
                    self._log_snapshot = commits
                units, _ = change_plan_between(
                    self.path, v - 1, v, mode=mode, commits=commits
                )
                self._plan_cache[v] = units
            return self._plan_cache[v]

        def _to_offset(self, pos: tuple[int, int]) -> dict:
            v, u = pos
            if u >= len(self._units(v)):
                return {"version": v}
            return {"version": v, "unit": u}

        def _from_offset(self, d: dict) -> tuple[int, int]:
            v = d["version"]
            u = d.get("unit")
            return (v, len(self._units(v)) if u is None else u)

        def initialOffset(self):
            self._pos = (self.start_floor, 0)
            return {"version": self.start_floor}

        def latestOffset(self):
            from daas_apps_spark.sources.table_format import read_log

            if self._pos is None:
                # latestOffset can be the engine's FIRST call; on a
                # checkpoint restart the engine replans the offset
                # log's last batch via partitions() before this, which
                # seeds _pos with the true resume point
                self._pos = (self.start_floor, 0)
            self._log_snapshot = read_log(self.path)
            latest = (self._log_snapshot or [{"version": 0}])[-1]["version"]
            for c in self._log_snapshot:
                if c.get("_txn_pending"):
                    # stall BEFORE the first unresolved multi-table txn
                    # (see _capped_latest): a staged commit that later
                    # becomes visible must not be skipped
                    latest = min(latest, c["version"] - 1)
                    break
            v, u = self._pos
            vcap = latest
            if self.max_versions is not None:
                vcap = min(latest, v + self.max_versions)
            files_left = self.max_files
            bytes_left = self.max_bytes
            took_any = False

            def _exhausted(next_size: int) -> bool:
                # stop BEFORE the unit that would blow either budget, but
                # always take at least one unit per batch (a single file
                # larger than maxBytesPerTrigger must still progress —
                # Delta's soft-max rule)
                if not took_any:
                    return False
                if files_left is not None and files_left < 1:
                    return True
                return bytes_left is not None and bytes_left < next_size

            while v < vcap or u < len(self._units(v)):
                plan = self._units(v)
                if u >= len(plan):
                    if v >= vcap:
                        break
                    nxt = self._units(v + 1)
                    if nxt and _exhausted(nxt[0].get("size") or 0):
                        # never advance the version counter past the
                        # last delivered unit: maxVersionsPerTrigger
                        # accounting stays exact (empty data_change=False
                        # versions still pass through freely)
                        break
                    v, u = v + 1, 0
                    continue
                if files_left is None and bytes_left is None:
                    u = len(plan)
                    continue
                size = plan[u].get("size") or 0
                if _exhausted(size):
                    break
                u += 1
                took_any = True
                if files_left is not None:
                    files_left -= 1
                if bytes_left is not None:
                    bytes_left -= size
            if (v, u) > self._pos:
                self._pos = (v, u)
            return self._to_offset(self._pos)

        def _current_colmap(self) -> dict:
            from daas_apps_spark.sources.table_format import (
                read_log,
                resolve_stream_colmap,
            )

            commits = self._log_snapshot
            if commits is None:
                commits = read_log(self.path)
                self._log_snapshot = commits
            # the LATEST mapping resolves every planned unit (physical
            # names are immutable); declared names that VANISHED from
            # the mapping mid-stream raise at plan time instead of
            # null-filling (see resolve_stream_colmap)
            return resolve_stream_colmap(
                self.path, self.columns, commits=commits, where=source_name
            )

        def partitions(self, start, end):
            vs, us = self._from_offset(start)
            ve, ue = self._from_offset(end)
            if self._pos is None or (ve, ue) > self._pos:
                self._pos = (ve, ue)
            units = []
            for v in range(vs, ve + 1):
                plan = self._units(v)
                lo = us if v == vs else 0
                hi = ue if v == ve else len(plan)
                units.extend(plan[lo:hi])
            # memory hygiene: plans behind the batch start can only be
            # needed again after a process restart (fresh cache anyway)
            for old in [k for k in self._plan_cache if k < vs]:
                del self._plan_cache[old]
            if not units:
                # versions advanced on data_change=False commits only;
                # Spark requires >= 1 partition per planned batch
                return [_ChangeUnitPartition(None, self.columns)]
            colmap = self._current_colmap()
            return [
                _ChangeUnitPartition(u, self.columns, colmap) for u in units
            ]

        def read(self, partition):
            from daas_apps_spark.sources.table_format import (
                read_change_batches,
                read_change_unit,
            )

            if partition.unit is None:
                return iter([])
            if self.arrow_schema is not None:
                import pyarrow as pa

                try:
                    # Arrow fast path: ship columnar buffers straight
                    # through (no per-row Python objects) — the shape
                    # that keeps a wide multi-GB commit executor-bound
                    # instead of serializer-bound
                    return iter(
                        read_change_batches(
                            partition.unit,
                            self.arrow_schema,
                            tag=tag,
                            colmap=getattr(partition, "colmap", None),
                        )
                    )
                except (pa.lib.ArrowException, TypeError, KeyError) as e:
                    # ONLY arrow-level type/conversion gaps downgrade to
                    # the tuple path (always correct, just slower); any
                    # other exception — genuine data corruption, a bug —
                    # must surface, not silently take the slow path
                    if not getattr(self, "_warned_fallback", False):
                        self._warned_fallback = True
                        import warnings

                        warnings.warn(
                            f"{source_name}: arrow fast path disabled for "
                            f"this reader ({type(e).__name__}: {e}); "
                            "falling back to tuple rows",
                            RuntimeWarning,
                            stacklevel=2,
                        )
            return iter(
                read_change_unit(
                    partition.unit,
                    columns=partition.columns,
                    tag=tag,
                    colmap=getattr(partition, "colmap", None),
                )
            )

        def commit(self, end):
            pos = self._from_offset(end)
            if self._pos is None or pos > self._pos:
                self._pos = pos

    class _SimpleReader(_TableStreamReaderCore, SimpleDataSourceStreamReader):
        def __init__(self, path, columns, cap, start_floor=0):
            _TableStreamReaderCore.__init__(
                self, path, cap, start_floor=start_floor
            )
            self.columns = columns

        def _rows(self, v_from: int, v_to: int | None):
            from daas_apps_spark.sources.table_format import (
                change_plan_between,
                read_change_unit,
                resolve_stream_colmap,
            )

            units, resolved = change_plan_between(
                self.path, v_from, v_to, mode=mode
            )
            colmap = resolve_stream_colmap(
                self.path, self.columns, where=source_name
            )
            rows: list[tuple] = []
            for u in units:
                rows.extend(
                    read_change_unit(
                        u, columns=self.columns, tag=tag, colmap=colmap
                    )
                )
            return rows, resolved

        def initialOffset(self):
            return {"version": self.start_floor}

        def read(self, start):
            self._last = start["version"]
            end = self._capped_latest()
            if end <= start["version"]:
                return iter([]), start
            rows, _ = self._rows(start["version"], end)
            return iter(rows), {"version": end}

        def readBetweenOffsets(self, start, end):
            rows, _ = self._rows(start["version"], end["version"])
            return iter(rows)

        def commit(self, end):
            pass

    class _TableStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return source_name

        def schema(self) -> str:
            return self.options["tableschema"] + schema_suffix

        def _args(self):
            cap = self.options.get("maxversionspertrigger")
            # column NAMES from the declared schema (depth-aware parse:
            # decimal(18,4)/map<,>/struct<,> commas are NOT separators):
            # emit values by name so file column order / schema
            # evolution can't mis-slot them
            cols = ddl_field_names(self.options["tableschema"])
            return (
                self.options["path"],
                cols,
                int(cap) if cap is not None else None,
            )

        def _start_floor(self) -> int:
            # Delta's startingVersion (INCLUSIVE, numeric only): deliver
            # commits >= N. Numeric keeps restarts exact — the reader is
            # rebuilt from the same options, so the floor re-derives
            # identically; a "latest" form would re-resolve post-crash
            # and silently skip replayed rows, so it is refused
            sv = self.options.get("startingversion")
            if sv is None:
                return 0
            if str(sv).lower() == "latest":
                raise ValueError(
                    "startingVersion must be a version number; 'latest' "
                    "would re-resolve after a restart and lose replayed "
                    "rows — pass table.latest_version() + 1 instead"
                )
            sv = int(sv)
            if sv < 1:
                raise ValueError(
                    f"startingVersion must be >= 1, got {sv}"
                )
            return sv - 1

        def streamReader(self, schema) -> "_FullReader":
            if self.options.get("simplereader", "").lower() == "true":
                # raising the not-implemented error is the documented
                # signal for Spark to fall back to simpleStreamReader()
                from pyspark.errors import PySparkNotImplementedError

                raise PySparkNotImplementedError(
                    errorClass="NOT_IMPLEMENTED",
                    messageParameters={"feature": "streamReader"},
                )
            arrow_schema = None
            if self.options.get("arrowbatches", "true").lower() != "false":
                try:
                    # the same declared-schema → arrow derivation the
                    # data-source worker applies to the tuple path, so a
                    # RecordBatch we emit is byte-compatible with what
                    # the worker would have built row-by-row
                    from pyspark.sql.pandas.types import to_arrow_schema

                    arrow_schema = to_arrow_schema(schema)
                except Exception:
                    arrow_schema = None  # tuple path still correct
            mft = self.options.get("maxfilespertrigger")
            max_files = int(mft) if mft is not None else None
            if max_files is not None and max_files < 1:
                raise ValueError(
                    f"maxFilesPerTrigger must be >= 1, got {max_files}"
                )
            mbt = self.options.get("maxbytespertrigger")
            max_bytes = int(mbt) if mbt is not None else None
            if max_bytes is not None and max_bytes < 1:
                raise ValueError(
                    f"maxBytesPerTrigger must be >= 1, got {max_bytes}"
                )
            return _FullReader(
                *self._args(),
                arrow_schema=arrow_schema,
                max_files=max_files,
                max_bytes=max_bytes,
                start_floor=self._start_floor(),
            )

        def simpleStreamReader(self, schema) -> "_SimpleReader":
            return _SimpleReader(
                *self._args(), start_floor=self._start_floor()
            )

    return _TableStreamSource


def register_table_change_stream_source(spark: SparkSession) -> None:
    """The versioned table (sources/table_format.py) as a STREAMING
    SOURCE — Delta's table-as-a-stream: each micro-batch is the rows
    the commits in (start, end] ADDED. Rewriting or row-deleting
    commits (overwrite/merge/MOR delete) in the range raise — the
    append-only contract every version-offset change stream requires
    (data_change=False compactions are skipped). Usage::

        spark.readStream.format("table_changes")
             .option("path", table_path)
             .option("tableschema", "k long, v string").load()

    Planning/parallelism/rate-limit/fallback contract:
    ``_make_table_stream_source``."""
    spark.dataSource.register(
        _make_table_stream_source("table_changes", "append", "")
    )


def drain_table_stream(
    spark: SparkSession,
    fmt: str,
    path: str,
    tableschema: str,
    checkpoint_dir: str,
    apply_batch,
    max_versions_per_trigger: int | None = None,
    max_runs: int = 1000,
) -> int:
    """Fully drain a versioned-table stream (``table_changes`` or
    ``table_cdf``) through ``apply_batch(df, batch_id)`` with bounded
    micro-batches, by looping availableNow runs until an entire run
    delivers nothing new. One availableNow run fixes its target at its
    single ``latestOffset`` call (engine contract for Python stream
    sources), so with ``maxVersionsPerTrigger`` set each run advances
    at most that many commits — this helper is the operational
    "catch up a long log in bounded steps" loop the engine cannot
    express as one run. Exactly-once holds across the loop: every run
    shares ``checkpoint_dir``, so replays skip and the offset only
    advances on committed batches. Returns the number of non-empty
    batches applied.

    Progress detection: a caught-up availableNow run executes ZERO
    batches (measured — the engine compares latestOffset with the
    checkpoint before planning), so ANY foreachBatch invocation means
    the offset advanced. Row counts are deliberately NOT the signal: a
    capped batch can legitimately deliver zero rows (an empty part
    file, a data_change=False commit inside the range) while still
    moving the offset."""
    applied = 0

    def counting(df, batch_id):
        nonlocal progressed, applied
        progressed = True  # invoked at all == offset advanced
        if not df.isEmpty():
            applied += 1
        apply_batch(df, batch_id)

    for _ in range(max_runs):
        progressed = False
        reader = (
            spark.readStream.format(fmt)
            .option("path", path)
            .option("tableschema", tableschema)
        )
        if max_versions_per_trigger is not None:
            reader = reader.option(
                "maxVersionsPerTrigger", str(max_versions_per_trigger)
            )
        q = (
            reader.load()
            .writeStream.foreachBatch(counting)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if not progressed:
            return applied
    raise RuntimeError(
        f"drain_table_stream: still progressing after {max_runs} runs — "
        "either the table is being appended faster than the drain or "
        "max_runs is too small for the log length / trigger cap"
    )


def register_table_cdf_stream_source(spark: SparkSession) -> None:
    """The versioned table's CHANGE-DATA-FEED as a streaming source —
    Delta's ``readChangeFeed`` streaming analog on the A23 machinery.
    Unlike the ``table_changes`` source (append-only rows), this one
    also replays MERGE-ON-READ deletes and updates: each micro-batch is
    the commits' row-level changes tagged ``_change_type`` ('insert' /
    'delete'; a MOR update arrives as its delete-preimage +
    insert-postimage pair), resolved PURELY from the manifest and the
    vector-referenced files (``cdf_rows_between`` — cost ∝ |delta|,
    pyarrow in the source worker, no SparkSession). Commits that REMOVE
    dirs (overwrite / COW merge / restore) still raise: their row delta
    needs a snapshot diff, which the offset log cannot replay exactly.

    Usage::

        spark.readStream.format("table_cdf")
             .option("path", table_path)
             .option("tableschema", "k long, v string").load()
        # output schema: tableschema + (_change_type string)

    ``maxVersionsPerTrigger`` rate-limits exactly like the
    ``table_changes`` source; planning/parallelism/fallback contract:
    ``_make_table_stream_source`` (delete preimages are planned
    driver-side from the |delta|-sized vectors, then each referenced
    file is position-``take``n by its own executor partition).
    Downstream, the signed rows drive streaming IVM: +1 for insert, −1
    for delete, the same algebra ``maintain_additive_aggregate`` runs
    in batch."""
    spark.dataSource.register(
        _make_table_stream_source("table_cdf", "cdf", ", _change_type string")
    )


def cdf_running_aggregate(
    changes: DataFrame,
    group_by: list[str],
    count_col: str = "n",
    sums: dict[str, str] | None = None,
) -> DataFrame:
    """Streaming materialized view over a change-data-feed stream: the
    signed-delta IVM algebra (insert +1 / delete −1) as a streaming
    aggregation, so the maintained counts/sums advance with every
    micro-batch — the live twin of the batch
    ``maintain_additive_aggregate`` (table_format.py). Groups whose
    count telescopes to zero surface with ``count_col = 0`` (streaming
    state cannot drop rows); readers filter ``> 0``. Use with
    ``outputMode("complete")`` (or update + an upsert sink): the state
    is |groups|-sized, never |table|-sized, and each micro-batch costs
    the delta — the 100 TB story is identical to the batch IVM's."""
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    return changes.groupBy(*group_by).agg(
        F.sum(sign).cast("long").alias(count_col),
        *[
            F.sum(sign * F.expr(e)).alias(name)
            for name, e in (sums or {}).items()
        ],
    )


def run_cdf_to_materialized_view(
    spark: SparkSession,
    src_table: str,
    view_table: str,
    checkpoint_dir: str,
    tableschema: str,
    group_by: list[str],
    count_col: str = "n",
    sums: dict[str, str] | None = None,
    max_versions_per_trigger: int | None = None,
) -> None:
    """The COMPLETE CDC loop: source versioned table → ``table_cdf``
    stream (versions as offsets, MOR deletes/updates replayed as signed
    rows) → per-batch signed-delta view maintenance → EXACTLY-ONCE
    commit into a second versioned table. Each micro-batch costs the
    delta; the maintained view is |groups|-sized; a replayed batch
    (crash between the view commit and the checkpoint advance) finds its
    (stream_id, batch_id) pair in the view table's log and skips — the
    same Delta-`txn` idempotence contract as
    ``run_stream_to_versioned_table``. Every refresh is itself a
    time-travelable version of the view table.

    This is the 100 TB materialized-view architecture end-to-end: base
    table mutates via appends and merge-on-read DML, the view advances
    incrementally off the manifest, and neither side ever rescans the
    corpus.

    ``max_versions_per_trigger`` bounds each refresh to N source
    commits and LOOPS availableNow runs until caught up (an availableNow
    run fixes its target at its single latestOffset call), so a view
    rebuilt against a month-old checkpoint advances in bounded,
    individually-committed steps — each one idempotent under replay —
    instead of one unbounded batch."""
    from daas_apps_spark.sources.table_format import VersionedTable

    register_table_cdf_stream_source(spark)
    vt = VersionedTable(spark, view_table)
    sums = sums or {}

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        sid = checkpoint_stream_id(checkpoint_dir)
        _apply_view_delta_exactly_once(
            vt, batch_df, sid, batch_id, group_by, count_col, sums
        )

    drain_table_stream(
        spark,
        "table_cdf",
        src_table,
        tableschema,
        checkpoint_dir,
        apply_batch,
        max_versions_per_trigger=max_versions_per_trigger,
    )


def _apply_view_delta_exactly_once(
    vt,
    batch_df: DataFrame,
    sid: str,
    batch_id: int,
    group_by: list[str],
    count_col: str,
    sums: dict[str, str],
    extra_metadata: dict | None = None,
    finalize=None,
) -> None:
    """One micro-batch of signed-delta view maintenance committed
    EXACTLY-ONCE into a versioned table: skip if the (stream_id,
    batch_id) pair is already in the log, else merge the batch's signed
    aggregate into the current view state and overwrite with the pair
    recorded — the per-destination idempotence unit both the single-view
    CDC loop and the multi-table fan-out build on. ``extra_metadata``
    rides in the same commit (the SQL continuous-refresh surface stamps
    the covered source version there so manual REFRESH interoperates);
    ``finalize`` maps the merged state before it commits (the SQL
    surface pins column order + decimal types to the batch REFRESH's
    canonical state schema, so the two maintainers never ping-pong the
    state table through schema-evolution commits)."""
    if (sid, batch_id) in applied_batch_keys(vt.history(), sid):
        return  # replayed batch — already committed
    md = {"stream_id": sid, "batch_id": batch_id}
    md.update(extra_metadata or {})
    state = _merged_view_state(vt, batch_df, group_by, count_col, sums)
    if finalize is not None:
        state = finalize(state)
    vt.overwrite(state, metadata=md)


def committed_offset_version(checkpoint_dir: str, batch_id: int):
    """The source VERSION a micro-batch's end offset covers, parsed
    from the checkpoint's offset log (``offsets/<batch_id>`` is written
    before the batch runs; its last line is the python source's offset
    JSON). Returns None when the offset is unit-granular (a
    file/byte-capped batch stopped mid-commit — no clean version
    boundary to stamp). The continuous MV surface runs uncapped or
    version-capped only, so its offsets are always clean."""
    import json

    p = os.path.join(checkpoint_dir, "offsets", str(batch_id))
    with open(p) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    off = json.loads(lines[-1])
    if off.get("unit"):
        return None
    return off.get("version")


def start_continuous_mv_refresh(
    spark: SparkSession,
    src_path: str,
    view_path: str,
    checkpoint_dir: str,
    tableschema: str,
    group_by: list[str],
    count_col: str,
    sums: dict[str, str] | None = None,
    where: str | None = None,
    starting_version: int | None = None,
    watermark_metadata=None,
    finalize=None,
    trigger_seconds: float = 0.5,
    max_versions_per_trigger: int | None = None,
):
    """The ALWAYS-ON form of ``run_cdf_to_materialized_view``: a live
    ``table_cdf`` → signed-delta IVM → exactly-once versioned-table
    loop on a processingTime trigger, returning the running
    StreamingQuery handle (the SQL surface's ``REFRESH MATERIALIZED
    VIEW … CONTINUOUS`` owns it; ``STOP REFRESH`` stops it; the
    checkpoint makes a restart resume exactly where it left off).

    Interop with manual REFRESH is by WATERMARK, not by luck: every
    batch's end offset is a whole source version (this surface never
    sets file/byte caps), ``committed_offset_version`` reads it from
    the offset log, and ``watermark_metadata(version)`` stamps the
    same ``mv_source_versions`` dict the batch refresh writes — so
    after STOP, a manual ``REFRESH`` folds exactly (covered, head] and
    neither path ever double-applies a delta. ``starting_version``
    floors a FRESH stream at the view's current watermark + 1 (the
    CREATE already materialized everything below it); on a checkpoint
    resume the engine's replayed offsets win and the floor is inert.

    Cost contract is the drain loop's: each micro-batch reads only its
    window's change units off the manifest, the maintained state is
    |groups|-sized, and a crash between the view commit and the
    checkpoint advance replays into the (stream_id, batch_id) skip."""
    from daas_apps_spark.sources.table_format import VersionedTable

    register_table_cdf_stream_source(spark)
    vt = VersionedTable(spark, view_path)
    sums = sums or {}

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        sid = checkpoint_stream_id(checkpoint_dir)
        if where is not None:
            batch_df = batch_df.filter(where)
        extra = None
        if watermark_metadata is not None:
            v = committed_offset_version(checkpoint_dir, batch_id)
            if v is not None:
                extra = watermark_metadata(v)
        _apply_view_delta_exactly_once(
            vt, batch_df, sid, batch_id, group_by, count_col, sums,
            extra_metadata=extra, finalize=finalize,
        )

    reader = (
        spark.readStream.format("table_cdf")
        .option("path", src_path)
        .option("tableschema", tableschema)
    )
    if starting_version is not None:
        reader = reader.option("startingVersion", str(starting_version))
    if max_versions_per_trigger is not None:
        reader = reader.option(
            "maxVersionsPerTrigger", str(max_versions_per_trigger)
        )
    return (
        reader.load()
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def _merged_view_state(
    vt,
    batch_df: DataFrame,
    group_by: list[str],
    count_col: str,
    sums: dict[str, str],
) -> DataFrame:
    """The signed-delta view-maintenance merge: fold one CDF micro-batch
    into the table's current VISIBLE state and return the next full
    view (groups whose count drops to zero vanish). Pure plan
    construction — the caller decides how the result commits (plain
    overwrite, or staged under a multi-table txn)."""
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta = batch_df.groupBy(*group_by).agg(
        F.sum(sign).cast("long").alias(count_col),
        *[
            F.sum(sign * F.expr(e)).alias(name)
            for name, e in sums.items()
        ],
    )
    try:
        state = vt.read()
    except ValueError:  # first batch: no view snapshot yet
        state = None
    if state is not None:
        s = state.select(
            *[F.col(k).alias(f"__s_{k}") for k in group_by],
            *[F.col(c).alias(f"__s_{c}") for c in [count_col, *sums]],
        )
        # eqNullSafe: a NULL group key is one group on both sides
        cond = [delta[k].eqNullSafe(s[f"__s_{k}"]) for k in group_by]
        delta = delta.join(s, cond, "full_outer").select(
            *[
                F.coalesce(delta[k], s[f"__s_{k}"]).alias(k)
                for k in group_by
            ],
            *[
                (
                    F.coalesce(delta[c], F.lit(0))
                    + F.coalesce(s[f"__s_{c}"], F.lit(0))
                ).alias(c)
                for c in [count_col, *sums]
            ],
        )
    return delta.filter(F.col(count_col) > 0)


def run_cdf_index_maintenance(
    spark: SparkSession,
    src_table: str,
    index_table: str,
    checkpoint_dir: str,
    tableschema: str,
    centroids: DataFrame,
    max_versions_per_trigger: int | None = None,
) -> int:
    """K69's CDC index maintenance as a LIVE stream: source versioned
    table → ``table_cdf`` stream (versions as offsets, MOR deletes/
    updates as signed rows) → per-micro-batch net-delta assignment →
    EXACTLY-ONCE conditional-merge commit into the index table. The
    batch netting is the SAME ``net_index_delta`` the batch maintainer
    runs (ambiguous churned ids resolve against the source's current
    snapshot, manifest-pruned to the churned range — eventually
    consistent: a later batch re-applies whatever a head-resolution
    anticipated); idempotence is the (stream_id, batch_id) pair in the
    merge commit's metadata, the same Delta-``txn`` contract as every
    other streaming sink here. Each refresh costs the delta and is
    itself a time-travelable index version — at 100 TB the index never
    rebuilds AND never falls behind by more than a trigger."""
    from daas_apps_spark.operators.ann_index import (
        apply_index_delta,
        net_index_delta,
    )
    from daas_apps_spark.sources.table_format import VersionedTable

    register_table_cdf_stream_source(spark)
    idx = VersionedTable(spark, index_table)
    src = VersionedTable(spark, src_table)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        sid = checkpoint_stream_id(checkpoint_dir)
        if (sid, batch_id) in applied_batch_keys(idx.history(), sid):
            return  # replayed batch — already merged
        net = net_index_delta(
            batch_df,
            centroids,
            head_ids=lambda lo, hi: src.read(
                prune=("vec_id", lo, hi)
            ).select("vec_id"),
        )
        apply_index_delta(
            idx, net, commit_metadata={"stream_id": sid, "batch_id": batch_id}
        )

    return drain_table_stream(
        spark,
        "table_cdf",
        src_table,
        tableschema,
        checkpoint_dir,
        apply_batch,
        max_versions_per_trigger=max_versions_per_trigger,
    )


def run_cdf_fanout_exactly_once(
    spark: SparkSession,
    src_table: str,
    view_table: str,
    audit_table: str,
    checkpoint_dir: str,
    tableschema: str,
    group_by: list[str],
    count_col: str = "n",
    sums: dict[str, str] | None = None,
    max_versions_per_trigger: int | None = None,
) -> None:
    """MULTI-TABLE exactly-once: ONE change-data-feed stream maintaining
    TWO versioned tables per micro-batch — a signed-delta materialized
    view (``view_table``) and an append-only change-audit log
    (``audit_table``, every CDF row stamped with its batch) — the CDC
    fan-out shape (serve the aggregate, keep the evidence).

    There is no cross-table transaction manager; instead EACH
    destination enforces its own (stream_id, batch_id) idempotence key
    against its own commit log (Delta's `txn` pair, per table). The
    failure matrix that makes this exactly-once:

    - crash BEFORE the view commit → batch replays, both tables apply;
    - crash BETWEEN the two commits → batch replays, the view finds its
      pair in the log and SKIPS, the audit table applies — no double
      count, no lost audit rows (pinned by a fault-injection test);
    - crash AFTER both commits but before the checkpoint advances →
      batch replays, both tables skip.

    Commit order is therefore significant only in that it is FIXED
    (view first, audit second); any fixed order works because each
    side's skip decision is independent. Empty batches commit nothing
    anywhere (no version churn). At 100 TB each batch costs the delta
    on both sides: the view is |groups|-sized, the audit append is
    |batch|-sized, and neither ever rescans the corpus."""
    from daas_apps_spark.sources.table_format import VersionedTable

    register_table_cdf_stream_source(spark)
    view_vt = VersionedTable(spark, view_table)
    audit_vt = VersionedTable(spark, audit_table)
    sums = sums or {}

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        sid = checkpoint_stream_id(checkpoint_dir)
        if not batch_df.isEmpty():
            _apply_view_delta_exactly_once(
                view_vt, batch_df, sid, batch_id, group_by, count_col, sums
            )
            if (sid, batch_id) not in applied_batch_keys(
                audit_vt.history(), sid
            ):
                audit_vt.append(
                    batch_df.withColumn("_batch_id", F.lit(batch_id)),
                    metadata={"stream_id": sid, "batch_id": batch_id},
                )

    drain_table_stream(
        spark,
        "table_cdf",
        src_table,
        tableschema,
        checkpoint_dir,
        apply_batch,
        max_versions_per_trigger=max_versions_per_trigger,
    )


def run_cdf_fanout_atomic(
    spark: SparkSession,
    src_table: str,
    view_table: str,
    audit_table: str,
    checkpoint_dir: str,
    coordinator_dir: str,
    tableschema: str,
    group_by: list[str],
    count_col: str = "n",
    sums: dict[str, str] | None = None,
    max_versions_per_trigger: int | None = None,
) -> None:
    """CROSS-TABLE ATOMIC CDC fan-out — the last step past
    ``run_cdf_fanout_exactly_once``: that loop guarantees each
    destination applies exactly once, but a reader BETWEEN its two
    commits can observe the view updated while the audit log still
    lacks the batch. Here both destinations' commits are STAGED under
    one ``MultiTableTxn`` and become visible together at the
    coordinator's single atomic marker — or never (presumed abort):

    - crash before/between the staged commits → nothing visible
      anywhere, the dead txn is aborted at restart, the batch replays
      under a fresh txn (a staged-only commit is a consumed-invisible
      version slot, never state);
    - crash AFTER the coordinator marker but before the checkpoint
      advances → the replayed batch finds its (stream_id, batch_id)
      pair in the now-visible metadata and skips BOTH tables — the
      atomicity makes one check sufficient;
    - a reader at ANY point observes either {old view, old audit} or
      {new view, new audit}, never the half-state (fault-injection
      pinned in tests/test_streaming_live.py).

    The versioned tables' own machinery closes the remaining holes:
    further commits to a table refuse while its txn is unresolved (no
    retroactive visibility flip), auto-checkpoints defer past pending
    txns, and the table stream sources stall their offsets BEFORE the
    first pending version so a late flip can't be skipped."""
    from daas_apps_spark.sources.table_format import (
        MultiTableTxn,
        VersionedTable,
    )

    register_table_cdf_stream_source(spark)
    view_vt = VersionedTable(spark, view_table)
    audit_vt = VersionedTable(spark, audit_table)
    coord = MultiTableTxn(coordinator_dir)
    # presumed abort: anything pending at (re)start is a dead txn from a
    # crashed run — mark it aborted so the tables accept commits again
    coord.abort_abandoned()
    sums = sums or {}

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        sid = checkpoint_stream_id(checkpoint_dir)
        if batch_df.isEmpty():
            return
        if (sid, batch_id) in applied_batch_keys(view_vt.history(), sid):
            return  # atomic: view committed ⇔ audit committed
        txn = coord.begin()
        merged = _merged_view_state(
            view_vt, batch_df, group_by, count_col, sums
        )
        view_vt.overwrite(
            merged,
            metadata={"stream_id": sid, "batch_id": batch_id},
            txn=txn,
        )
        audit_vt.append(
            batch_df.withColumn("_batch_id", F.lit(batch_id)),
            metadata={"stream_id": sid, "batch_id": batch_id},
            txn=txn,
        )
        coord.commit(txn)  # THE atomic visibility point

    drain_table_stream(
        spark,
        "table_cdf",
        src_table,
        tableschema,
        checkpoint_dir,
        apply_batch,
        max_versions_per_trigger=max_versions_per_trigger,
    )


def hourly_then_daily_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Chained windowed AGGREGATES in one streaming query (the second
    multiple-stateful-operator shape after the I15 join→window chain):
    events roll up to hourly counts, and the hourly rows roll up again
    to per-day hour-bucket statistics — the streaming materialized-
    rollup pattern (raw → hourly → daily) expressed as ONE query instead
    of two jobs wired through a sink.

    The second aggregate windows over the FIRST window STRUCT itself
    (the `window(window_col, ...)` overload, which is what propagates
    the event-time watermark through the intermediate relation —
    windowing over `hw.end` as a plain timestamp severs it), so each
    level closes against the same advancing clock; append mode emits
    each day exactly once.
    """
    hourly = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("hw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        hourly.groupBy(F.window(F.col("hw"), "1 day").alias("dw"))
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("peak_hour_events"),
        )
        .select(
            F.col("dw.start").alias("day_start"),
            "n_hours",
            "n_events",
            "peak_hour_events",
        )
    )


SESSION_GAP_MIN = 30  # inactivity gap that closes a session


def session_close_on_timeout(events: DataFrame) -> DataFrame:
    """I17: event-time TIMEOUT-driven session emission — sessions close
    and EMIT when the watermark passes last_event + gap, not when the
    next event happens to arrive (the difference matters for "user went
    away" analytics: I3's session_window emits on the next batch's
    evidence; a timeout emits on the CLOCK). State per key is one open
    session struct; ``GroupStateTimeout.EventTimeTimeout`` fires the
    flush callback when the watermark crosses the registered timestamp.

    Requires in-order-per-key delivery to keep in-batch sessionization
    exact (the test feeds time-range-ordered files); out-of-order
    arrival within the watermark would need a per-key buffer — the
    trade the reference's sorted-BAM requirement (R3) makes for the
    same reason.
    """
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    out_schema = (
        "event_type string, session_start timestamp, session_end timestamp, "
        "n_events long"
    )
    state_schema = "start long, last long, n long"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(start_us: int, last_us: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "session_start": [pd.to_datetime(start_us, unit="us")],
                    "session_end": [pd.to_datetime(last_us, unit="us")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield emit(start_us, last_us, n)
            return
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = -1
            n = 0
        rows = []
        for pdf in pdfs:
            rows.append(pdf[["ts"]])
        # exact epoch-microseconds (the fixture carries sub-ms precision)
        ts_us = (pd.concat(rows)["ts"].astype("int64") // 1_000).sort_values()
        for t in ts_us:
            t = int(t)
            if n == 0:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                yield emit(start_us, last_us, n)
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = t, n + 1
        state.update((start_us, last_us, n))
        # setTimeoutTimestamp takes epoch-ms; round UP so the timeout
        # never fires a hair before last + gap
        state.setTimeoutTimestamp((last_us + gap_us + 999) // 1000)

    return (
        events.withWatermark("ts", "0 seconds")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
