"""Live Structured Streaming smoke + batch/stream equivalence (I6, I8).

Mirrors the reference's scatter-gather invariant check (per-chunk tool ≡
whole-file tool, SURVEY §5.1): the streamed micro-batch computation must
equal the one-shot batch computation over the same events.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.streaming.live import (
    events_file_stream,
    run_stream_to_memory,
    run_stream_to_parquet,
    stateful_user_peaks,
    streaming_dedup,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_json_dir(spark, tmp_path_factory):
    """sf0.001 events as JSONL files (4 files → multiple input splits)."""
    path = str(tmp_path_factory.mktemp("events_json"))
    table(spark, SF_SMOKE, "events").repartition(4).write.mode("overwrite").json(path)
    return path


def test_stream_tumbling_equals_batch(spark, events_json_dir, tmp_path):
    stream = tumbling_counts(events_file_stream(spark, events_json_dir))
    run_stream_to_memory(stream, "t_tumbling", str(tmp_path / "ck"), "complete")
    got = spark.table("t_tumbling").toPandas()

    batch_src = spark.read.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).json(events_json_dir)
    want = (
        batch_src.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
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
        .toPandas()
    )
    key = ["window_start", "event_type"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert got_s.equals(want_s[got_s.columns])


def test_stream_dedup_counts(spark, events_json_dir, tmp_path):
    stream = streaming_dedup(events_file_stream(spark, events_json_dir))
    run_stream_to_memory(stream, "t_dedup", str(tmp_path / "ck"), "append")
    got = spark.table("t_dedup")
    batch = table(spark, SF_SMOKE, "events").dropDuplicates(["user_id", "event_type"])
    assert got.count() == batch.count()
    assert got.select("user_id", "event_type").distinct().count() == got.count()


def test_stateful_peaks_equal_batch(spark, events_json_dir, tmp_path):
    stream = stateful_user_peaks(events_file_stream(spark, events_json_dir))
    run_stream_to_memory(stream, "t_peaks", str(tmp_path / "ck"), "update")
    # update mode re-emits per batch; availableNow drains in ONE batch here,
    # but take the final row per user regardless to stay trigger-agnostic.
    got = (
        spark.table("t_peaks")
        .groupBy("user_id")
        .agg(
            F.max("events_so_far").alias("events_so_far"),
            F.max("max_value").alias("max_value"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("events_so_far"),
            F.max("value").alias("max_value"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got.equals(want[got.columns])


def test_parquet_sink_checkpoint_exactly_once(spark, events_json_dir, tmp_path):
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    src = events_file_stream(spark, events_json_dir)
    run_stream_to_parquet(src.filter(F.col("event_type") == "purchase"), out, ck)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0
    # Re-run with the same checkpoint: no new input → no duplicate rows.
    run_stream_to_parquet(
        events_file_stream(spark, events_json_dir).filter(
            F.col("event_type") == "purchase"
        ),
        out,
        ck,
    )
    assert spark.read.parquet(out).count() == n1


def test_stream_sliding_equals_batch(spark, events_json_dir, tmp_path):
    from daas_apps_spark.streaming.live import sliding_counts

    stream = sliding_counts(events_file_stream(spark, events_json_dir))
    run_stream_to_memory(stream, "t_sliding", str(tmp_path / "ck"), "complete")
    got = spark.table("t_sliding").toPandas()
    batch = (
        table(spark, SF_SMOKE, "events")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        .toPandas()
    )
    key = ["window_start", "event_type"]
    assert got.sort_values(key).reset_index(drop=True).equals(
        batch.sort_values(key).reset_index(drop=True)[got.columns]
    )


def test_stream_session_equals_batch(spark, events_json_dir, tmp_path):
    from daas_apps_spark.streaming.live import session_values

    stream = session_values(events_file_stream(spark, events_json_dir))
    run_stream_to_memory(stream, "t_session", str(tmp_path / "ck"), "complete")
    got = spark.table("t_session").toPandas()
    # batch side reads the SAME json files: the json sink stores ms-precision
    # timestamps, so session bounds (raw event times, not bucket-aligned)
    # would differ from the µs parquet source in the sub-ms digits.
    batch_src = spark.read.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).json(events_json_dir)
    batch = (
        batch_src
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id", "n_events", "session_value",
        )
        .toPandas()
    )
    key = ["session_start", "user_id"]
    assert got.sort_values(key).reset_index(drop=True).equals(
        batch.sort_values(key).reset_index(drop=True)[got.columns]
    )


def test_stream_static_join_equals_batch(spark, events_json_dir, tmp_path):
    """I7 live: stream ⋈ static dimension (broadcast on the stream side)."""
    static_dim = (
        table(spark, SF_SMOKE, "events")
        .select("user_id").distinct()
        .withColumn("segment", (F.col("user_id") % 5).cast("int"))
    )
    stream = (
        events_file_stream(spark, events_json_dir)
        .join(F.broadcast(static_dim), "user_id")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    run_stream_to_memory(stream, "t_static_join", str(tmp_path / "ck"), "complete")
    got = {r.segment: r.n_events for r in spark.table("t_static_join").collect()}
    want = {
        r.segment: r.n_events
        for r in table(spark, SF_SMOKE, "events")
        .join(static_dim, "user_id")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert got == want


def test_stream_stream_join_equals_batch(spark, events_json_dir, tmp_path):
    """I8 live: the watermarked stream-stream interval join must produce
    exactly the batch i8 result over the same inputs (availableNow drains
    everything, and the 1h watermark on a finite replay drops nothing
    that the 30-min interval admits)."""
    from daas_apps_spark.streaming.live import click_purchase_join

    src = events_file_stream(spark, events_json_dir)
    clicks = src.filter(F.col("event_type") == "click")
    purchases = src.filter(F.col("event_type") == "purchase")
    stream = click_purchase_join(clicks, purchases)
    run_stream_to_memory(stream, "t_ss_join", str(tmp_path / "ck"), "append")
    got = spark.table("t_ss_join").toPandas()

    from daas_apps_spark.registry import get_queries

    want = get_queries()["i8_stream_stream_join"](spark, SF_SMOKE).toPandas()
    key = ["user_id", "click_id", "purchase_id"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert got_s[sorted(got.columns)].equals(want_s[sorted(got.columns)])


def test_foreachbatch_upsert_equals_batch(spark, events_json_dir, tmp_path):
    """I8 foreachBatch upsert: replaying the corpus as MULTIPLE micro-batches
    (maxFilesPerTrigger=2 over 4 files) through the merge-into-state sink
    must converge to exactly the one-shot batch aggregate."""
    from daas_apps_spark.streaming.live import run_stream_upsert_counts

    state = str(tmp_path / "state")
    run_stream_upsert_counts(spark, events_json_dir, state, str(tmp_path / "ck"))
    got = spark.read.parquet(state).toPandas()

    src = spark.read.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).json(events_json_dir)
    want = (
        src.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .toPandas()
    )
    got_s = got.sort_values("user_id").reset_index(drop=True)
    want_s = want.sort_values("user_id").reset_index(drop=True)
    assert len(got_s) == len(want_s)
    assert (got_s.n_events.values == want_s.n_events.values).all()
    assert (abs(got_s.total_value.values - want_s.total_value.values) < 1e-9).all()


def test_stream_to_versioned_table_exactly_once(spark, events_json_dir, tmp_path):
    """Streaming sink into the versioned table format: (a) the final
    snapshot equals the one-shot batch aggregate, (b) each micro-batch's
    commit records its (stream_id, batch_id) pair (the idempotence key),
    (c) re-running the drained stream on the SAME checkpoint commits
    nothing new, and (d) a second stream with colliding batch ids is
    APPLIED, not skipped — the pair, not the bare id, is the key."""
    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import run_stream_to_versioned_table

    tbl = str(tmp_path / "vt")
    ck = str(tmp_path / "ck")
    run_stream_to_versioned_table(spark, events_json_dir, tbl, ck)
    vt = VersionedTable(spark, tbl)
    got = vt.read().toPandas()

    src = spark.read.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).json(events_json_dir)
    want = (
        src.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .toPandas()
    )
    got_s = got.sort_values("user_id").reset_index(drop=True)
    want_s = want.sort_values("user_id").reset_index(drop=True)
    assert len(got_s) == len(want_s)
    assert (got_s.n_events.values == want_s.n_events.values).all()
    assert (abs(got_s.total_value.values - want_s.total_value.values) < 1e-9).all()

    hist = vt.history()
    batch_ids = [c["metadata"].get("batch_id") for c in hist]
    assert batch_ids == sorted(batch_ids) and None not in batch_ids
    n_versions = vt.latest_version()
    assert n_versions >= 2  # maxFilesPerTrigger=2 over >2 files → >1 batch

    # (c) drained stream, same checkpoint: no new commits
    run_stream_to_versioned_table(spark, events_json_dir, tbl, ck)
    assert vt.latest_version() == n_versions

    # (d) replay-within-a-checkpoint is keyed on the (stream_id, batch_id)
    # PAIR — Delta's `txn` (appId, version) contract: manually re-invoking
    # the drained stream's own pairs is skipped (covered by (c)), while a
    # SECOND stream (fresh checkpoint, new source dir) writing the same
    # table restarts batch ids at 0 — already present in the log from the
    # first stream — and must NOT be skipped: the bare-batch_id guard this
    # replaces silently dropped such data (data loss after checkpoint
    # reset, and cross-stream collisions).
    assert 0 in batch_ids
    import json as _json

    src2 = tmp_path / "src2"
    src2.mkdir()
    rows = [
        {
            "event_id": 10_000 + i,
            "ts": f"2024-01-01T00:0{i}:00.000Z",
            "user_id": 999_999,
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }
        for i in range(3)
    ]
    (src2 / "part-0.json").write_text(
        "\n".join(_json.dumps(r) for r in rows)
    )
    run_stream_to_versioned_table(spark, str(src2), tbl, str(tmp_path / "ck2"))
    assert vt.latest_version() == n_versions + 1
    after = vt.read().toPandas()
    new_user = after[after.user_id == 999_999]
    assert len(new_user) == 1 and int(new_user.n_events.iloc[0]) == 3
    # prior users unchanged — the second stream merged, not clobbered
    assert (
        after[after.user_id != 999_999].n_events.sum() == got.n_events.sum()
    )
    # both streams' ids are recorded; the pairs never collide
    pairs = [
        (c["metadata"].get("stream_id"), c["metadata"].get("batch_id"))
        for c in vt.history()
    ]
    assert len(pairs) == len(set(pairs))
    assert len({s for s, _ in pairs}) == 2


def test_table_change_stream_source_versions_as_offsets(spark, tmp_path):
    """The versioned table as a streaming source: (a) an availableNow run
    drains every appended version, (b) a rerun on the same checkpoint
    picks up ONLY versions committed after the last offset, (c) a
    rewriting commit in the range raises (append-only contract)."""
    import pytest as _pytest

    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        register_table_change_stream_source,
    )

    register_table_change_stream_source(spark)
    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    vt.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    vt.append(spark.createDataFrame([(2, "b")], "k long, v string"))

    out = str(tmp_path / "out")

    def drain():
        stream = (
            spark.readStream.format("table_changes")
            .option("path", tbl)
            .option("tableschema", "k long, v string")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    got = sorted((r.k, r.v) for r in spark.read.parquet(out).collect())
    assert got == [(1, "a"), (2, "b")]

    # new commit, same checkpoint: only version 3 arrives (no re-emit of 1-2)
    vt.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    drain()
    got2 = sorted((r.k, r.v) for r in spark.read.parquet(out).collect())
    assert got2 == [(1, "a"), (2, "b"), (3, "c")]

    # a rewrite breaks the append-only contract
    vt.overwrite(spark.createDataFrame([(9, "z")], "k long, v string"))
    from daas_apps_spark.sources.table_format import added_dirs_between

    with _pytest.raises(ValueError):
        added_dirs_between(tbl, 3)


def test_stream_left_join_matched_and_watermark_closed_nulls(
    spark, events_json_dir, tmp_path
):
    """I11 live: the LEFT OUTER interval join must (a) emit exactly the
    batch inner-join rows for matches, and (b) emit null rows precisely
    for unmatched clicks whose 30-min window the final watermark closed —
    younger unmatched clicks stay in state on a finite replay."""
    from daas_apps_spark.streaming.live import click_purchase_left_join

    src = events_file_stream(spark, events_json_dir)
    clicks = src.filter(F.col("event_type") == "click")
    purchases = src.filter(F.col("event_type") == "purchase")
    stream = click_purchase_left_join(clicks, purchases)
    run_stream_to_memory(stream, "t_ss_left", str(tmp_path / "ck"), "append")
    got = spark.table("t_ss_left").toPandas()

    matched = got[got.purchase_id.notna()]
    from daas_apps_spark.registry import get_queries

    want_inner = get_queries()["i8_stream_stream_join"](spark, SF_SMOKE).toPandas()
    key = ["user_id", "click_id", "purchase_id"]
    assert (
        matched[key].astype("int64").sort_values(key).values.tolist()
        == want_inner[key].astype("int64").sort_values(key).values.tolist()
    )

    # Null rows: exactly the unmatched clicks whose window closed before the
    # final watermark = max(event ts) - 1h delay.
    ev = table(spark, SF_SMOKE, "events").toPandas()
    import pandas as pd

    # Each withWatermark node tracks its OWN max event time and the global
    # watermark is the MIN across them (multipleWatermarkPolicy=min): the
    # click side's and the purchase side's — not the unified stream's max.
    # Spark also tracks watermarks in epoch MILLIseconds, so floor the µs
    # event times to ms.
    clicks_pd = ev[ev.event_type == "click"]
    purch_pd = ev[ev.event_type == "purchase"]
    max_ts = min(clicks_pd.ts.max(), purch_pd.ts.max()).floor("ms")
    final_wm = max_ts - pd.Timedelta(hours=1)
    inner_click_ids = set(want_inner.click_id)
    expect_null_ids = set()
    for r in clicks_pd.itertuples():
        if r.event_id in inner_click_ids:
            continue
        if r.ts + pd.Timedelta(minutes=30) < final_wm:
            expect_null_ids.add(r.event_id)
    got_null_ids = set(got[got.purchase_id.isna()].click_id.astype("int64"))
    assert got_null_ids == expect_null_ids


def test_streaming_progress_metrics_surface(spark, events_json_dir, tmp_path):
    """I12 observability: a drained stateful stream must report its work in
    the progress API — input rows across batches equal the source rows,
    and the aggregation's state operator reports keyed state — the
    metrics a production monitor alerts on (zero rows, runaway state)."""
    stream = tumbling_counts(events_file_stream(spark, events_json_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_progress")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progs = [p for p in q.recentProgress if p is not None]
    assert progs, "no progress events recorded"
    total_in = sum(p["numInputRows"] for p in progs)
    n_src = table(spark, SF_SMOKE, "events").count()
    assert total_in == n_src
    state_ops = [op for p in progs for op in p.get("stateOperators", [])]
    assert state_ops and any(op["numRowsTotal"] > 0 for op in state_ops)


def test_stateful_cusum_equals_batch_fold(spark, events_json_dir, tmp_path):
    """I6/T8 live: the streaming CUSUM state fold converges to the exact
    batch fixed-point fold of the same events against the same pinned
    reference means — integer state makes the equality exact, not
    approximate."""
    from daas_apps_spark.streaming.live import (
        CUSUM_STATE_SCALE,
        stateful_cusum,
    )

    e = table(spark, SF_SMOKE, "events")
    ref_rows = (
        e.groupBy("event_type")
        .agg((F.sum((F.col("value") * CUSUM_STATE_SCALE).cast("decimal(18,0)"))
              / F.count(F.lit(1)) / CUSUM_STATE_SCALE).alias("m"))
        .collect()
    )
    ref_means = {r.event_type: float(r.m) for r in ref_rows}

    stream = stateful_cusum(
        events_file_stream(spark, events_json_dir, max_files_per_trigger=2),
        ref_means,
    )
    run_stream_to_memory(stream, "t_cusum", str(tmp_path / "ck"), "update")
    got = (
        spark.table("t_cusum")
        .groupBy("event_type")
        .agg(F.max("n_events").alias("n_events"))
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    final = (
        spark.table("t_cusum").toPandas()
        .sort_values(["event_type", "n_events"])
        .groupby("event_type", as_index=False)
        .last()[["event_type", "n_events", "cusum"]]
        .sort_values("event_type")
        .reset_index(drop=True)
    )

    import pandas as pd

    batch = e.toPandas()
    want_rows = []
    for et, grp in batch.groupby("event_type"):
        sv = int((grp["value"] * CUSUM_STATE_SCALE).round().astype("int64").sum())
        n = len(grp)
        rf = round(ref_means[et] * CUSUM_STATE_SCALE)
        want_rows.append(
            {"event_type": et, "n_events": n,
             "cusum": (sv - rf * n) / CUSUM_STATE_SCALE}
        )
    want = (
        pd.DataFrame(want_rows).sort_values("event_type").reset_index(drop=True)
    )
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert final["cusum"].tolist() == want["cusum"].tolist()


def test_stream_dedup_within_watermark_counts(spark, events_json_dir, tmp_path):
    # Watermark wider than the fixture's whole event span → the
    # state-bounded dedup coincides with global dedup; keys stay unique.
    from daas_apps_spark.streaming.live import streaming_dedup_within_watermark

    stream = streaming_dedup_within_watermark(
        events_file_stream(spark, events_json_dir)
    )
    run_stream_to_memory(stream, "t_dedup_wm", str(tmp_path / "ck"), "append")
    got = spark.table("t_dedup_wm")
    batch = table(spark, SF_SMOKE, "events").dropDuplicates(
        ["user_id", "event_type"]
    )
    assert got.count() == batch.count()
    assert got.select("user_id", "event_type").distinct().count() == got.count()


def test_chained_stateful_join_then_window_equals_batch(
    spark, events_json_dir, tmp_path
):
    """I15 live: TWO stateful operators in one streaming query — the
    watermarked stream-stream interval join feeding a tumbling-window
    aggregate. Append mode emits a window exactly once, when the
    post-join (delayed) watermark passes its end, so the batch twin is
    restricted to windows the final watermark closed; every emitted
    window must match the batch computation exactly."""
    from daas_apps_spark.streaming.live import click_purchase_hourly_counts

    src = events_file_stream(spark, events_json_dir, max_files_per_trigger=2)
    clicks = src.filter(F.col("event_type") == "click")
    purchases = src.filter(F.col("event_type") == "purchase")
    stream = click_purchase_hourly_counts(clicks, purchases)
    run_stream_to_memory(stream, "t_chained", str(tmp_path / "ck"), "append")
    got = spark.table("t_chained").toPandas()

    batch = spark.read.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).json(events_json_dir)
    c = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    p = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    want_all = (
        c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .groupBy(F.window("p_ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_attributed"),
            F.max("purchase_id").alias("max_purchase_id"),
        )
        .select(F.col("w.start").alias("window_start"), "n_attributed", "max_purchase_id")
        .toPandas()
    )
    # every window the stream emitted must match its batch twin exactly
    assert len(got) > 0, "chained stateful query emitted nothing"
    merged = got.merge(want_all, on="window_start", suffixes=("_got", "_want"))
    assert len(merged) == len(got), "stream emitted a window batch doesn't have"
    assert (merged.n_attributed_got == merged.n_attributed_want).all()
    assert (merged.max_purchase_id_got == merged.max_purchase_id_want).all()


def test_python_stream_source_replays_deterministically(spark, tmp_path):
    """A23 live: the Python streaming data source drains its synthetic
    offset range through availableNow micro-batches and lands exactly the
    deterministic table its offset arithmetic defines — the cursor-based
    custom-ingest surface (initialOffset/read/commit)."""
    from daas_apps_spark.streaming.live import register_python_stream_source

    register_python_stream_source(spark)
    # availableNow snapshots ONE read() slice per run, so drain the
    # 100-row offset range by re-running against the SAME checkpoint —
    # each run resumes from the committed cursor, which is exactly the
    # initialOffset/read/commit contract the test exists to pin.
    out_dir = str(tmp_path / "out")
    for _ in range(6):
        stream = spark.readStream.format("synthetic_ticks").load()
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = spark.read.parquet(out_dir).toPandas().sort_values("tick_id")
    assert len(got) == 100
    assert got.tick_id.tolist() == list(range(100))
    assert (got.shard == got.tick_id % 7).all()
    assert (got.value == got.tick_id * 1.5).all()


def test_chained_window_aggregates_equal_batch(spark, events_json_dir, tmp_path):
    """I16 live: two chained windowed aggregates (hourly → daily rollup)
    in ONE streaming query. Every emitted day must equal the batch twin;
    append mode means only watermark-closed days emit, so the comparison
    is subset-exact rather than set-equal."""
    from daas_apps_spark.streaming.live import hourly_then_daily_counts

    src = events_file_stream(spark, events_json_dir, max_files_per_trigger=2)
    stream = hourly_then_daily_counts(src)
    run_stream_to_memory(stream, "t_two_level", str(tmp_path / "ck"), "append")
    got = spark.table("t_two_level").toPandas()

    batch = spark.read.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).json(events_json_dir)
    want = (
        batch.groupBy(F.window("ts", "1 hour").alias("hw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .groupBy(F.window(F.col("hw"), "1 day").alias("dw"))
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
        .toPandas()
    )
    assert len(got) > 0, "no day closed — watermark never advanced?"
    merged = got.merge(want, on="day_start", suffixes=("_got", "_want"))
    assert len(merged) == len(got)
    for col in ("n_hours", "n_events", "peak_hour_events"):
        assert (merged[f"{col}_got"] == merged[f"{col}_want"]).all(), col


def test_session_close_on_event_time_timeout(spark, tmp_path):
    """I17 live: sessions EMIT when the advancing watermark crosses
    last_event + gap (EventTimeTimeout), with in-batch gap closures for
    sessions fully contained in one micro-batch. Files are written in
    time-range order (one per quarter of the span) so per-key arrival is
    monotonic; every emitted session must match the batch gaps-and-
    islands sessionization, and sessions whose close the final watermark
    proved must ALL be present."""
    import time as _time

    from daas_apps_spark.catalog import table
    from daas_apps_spark.streaming.live import (
        EVENTS_SCHEMA,
        SESSION_GAP_MIN,
        session_close_on_timeout,
    )

    e = table(spark, SF_SMOKE, "events")
    # four time-ordered slices -> four monotonic micro-batches
    src_dir = str(tmp_path / "slices")
    bounds = e.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    lo, hi = bounds.lo, bounds.hi
    span = (hi - lo) / 4
    for i in range(4):
        cut_lo = lo + i * span
        cut_hi = lo + (i + 1) * span
        cond = (F.col("ts") >= cut_lo) & (
            F.col("ts") < cut_hi if i < 3 else F.col("ts") <= hi
        )
        e.filter(cond).coalesce(1).write.mode("append").json(src_dir)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src_dir)
    )
    q = (
        session_close_on_timeout(stream)
        .writeStream.format("memory")
        .queryName("t_timeout_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_timeout_sessions").toPandas()

    gap_s = SESSION_GAP_MIN * 60
    # batch twin reads the SAME JSON slices (JSON serializes ts at ms
    # precision; comparing against the parquet fixture would diff by µs)
    e_json = spark.read.schema(EVENTS_SCHEMA).json(src_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    batch = (
        e_json.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (
                F.col("prev_ts").isNull()
                | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > gap_s)
            ).cast("int"),
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("event_type", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .toPandas()
    )
    assert len(got) > 0, "no session emitted — timeouts never fired?"
    key = ["event_type", "session_start"]
    merged = got.merge(batch, on=key, suffixes=("_got", "_want"))
    # every emitted session is a true batch session, byte-for-byte
    assert len(merged) == len(got)
    assert (merged.n_events_got == merged.n_events_want).all()
    assert (merged.session_end_got == merged.session_end_want).all()
    # and coverage: every session the final watermark (max ts) closed —
    # i.e. ended more than gap before the stream's max event time and
    # not still open at end-of-stream — must have been emitted
    final_wm = batch.session_end.max()
    closed = batch[
        (batch.session_end + pd.Timedelta(seconds=gap_s)) < final_wm
    ]
    have = set(zip(got.event_type, got.session_start))
    missing = [
        (r.event_type, r.session_start)
        for r in closed.itertuples()
        if (r.event_type, r.session_start) not in have
    ]
    assert not missing, f"watermark-closed sessions never emitted: {missing[:5]}"


def test_applied_batch_keys_legacy_commit_migration():
    """A bare-batch_id commit (pre-pair code) is ambiguous: the caller
    must opt in with legacy_is_mine to claim it (upgrade-in-place
    migration, no double-apply on replay); by DEFAULT it is unclaimed,
    preserving the checkpoint-reset contract — a NEW stream's colliding
    batch ids are applied, never silently dropped."""
    from daas_apps_spark.streaming.live import applied_batch_keys

    history = [
        {"metadata": {"batch_id": 0}},                          # legacy
        {"metadata": {"stream_id": "s1", "batch_id": 1}},       # upgraded
        {"metadata": {}},                                       # non-stream commit
    ]
    # default: legacy commit claims nothing — a reset/new stream applies
    # its own batch 0 instead of dropping it
    default = applied_batch_keys(history, "s2")
    assert ("s2", 0) not in default
    assert ("s1", 1) in default
    # migration opt-in: the upgraded continuation claims legacy batch 0
    mine = applied_batch_keys(history, "s1", legacy_is_mine=True)
    assert ("s1", 0) in mine and ("s1", 1) in mine
    # and the claim is scoped to the caller, not to other streams' pairs
    other = applied_batch_keys(history, "s2", legacy_is_mine=True)
    assert ("s2", 0) in other and ("s2", 1) not in other


def _drain_table_changes(
    spark, tbl, out, ck, seen_batches, cap="2", simple=False
):
    stream = (
        spark.readStream.format("table_changes")
        .option("path", tbl)
        .option("tableschema", "k long, v string")
        .option("maxVersionsPerTrigger", cap)
        .option("simplereader", "true" if simple else "false")
        .load()
    )

    def sink(batch_df, batch_id):
        rows = sorted(r.k for r in batch_df.collect())
        if rows:
            seen_batches.append(rows)
        batch_df.write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_table_change_stream_rate_limit_bounds_batches(spark, tmp_path):
    """maxVersionsPerTrigger caps each micro-batch at N commits (Delta's
    maxFilesPerTrigger analog). An availableNow run consults
    latestOffset ONCE (engine contract for Python stream sources), so a
    cold start over a 4-commit log drains in ceil(4/2)=2 capped runs,
    exactly-once."""
    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        register_table_change_stream_source,
    )

    register_table_change_stream_source(spark)
    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    for k in range(1, 5):
        vt.append(
            spark.createDataFrame([(k, f"v{k}")], "k long, v string")
        )

    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    seen_batches: list[list[int]] = []

    _drain_table_changes(spark, tbl, out, ck, seen_batches)
    got1 = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got1 == [1, 2]  # capped: NOT the whole table in one batch
    _drain_table_changes(spark, tbl, out, ck, seen_batches)
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4]
    assert all(len(b) <= 2 for b in seen_batches), seen_batches
    assert len(seen_batches) == 2
    # a rerun on the drained checkpoint delivers nothing new
    _drain_table_changes(spark, tbl, out, ck, seen_batches)
    assert len(seen_batches) == 2
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == got


def test_table_change_stream_rate_limit_continuous_drain(spark, tmp_path):
    """Under a processingTime trigger the engine polls latestOffset per
    trigger, so ONE running query drains a 6-commit log in three capped
    batches (2 versions each) — the steady-state rate-limit shape a
    long-log catch-up runs at scale."""
    import time as _time

    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        register_table_change_stream_source,
    )

    register_table_change_stream_source(spark)
    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    for k in range(1, 7):
        vt.append(
            spark.createDataFrame([(k, f"v{k}")], "k long, v string")
        )

    seen_batches: list[list[int]] = []

    def sink(batch_df, batch_id):
        rows = sorted(r.k for r in batch_df.collect())
        if rows:
            seen_batches.append(rows)

    q = (
        spark.readStream.format("table_changes")
        .option("path", tbl)
        .option("tableschema", "k long, v string")
        .option("maxVersionsPerTrigger", "2")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    deadline = _time.time() + 120
    while (
        _time.time() < deadline
        and sum(len(b) for b in seen_batches) < 6
    ):
        _time.sleep(0.5)
    q.stop()
    assert sorted(k for b in seen_batches for k in b) == [1, 2, 3, 4, 5, 6]
    assert all(len(b) <= 2 for b in seen_batches), seen_batches
    assert len(seen_batches) == 3


@pytest.mark.parametrize(
    "ops,cap,files_cap",
    [
        # mixed DML with per-version rate limit
        (
            [
                ("append", [(1, "a"), (2, "b"), (3, "c")]),
                ("delete_mor", 2, 2),
                ("append", [(4, "d")]),
                ("update_mor", 3, 4),
            ],
            1,
            None,
        ),
        # compaction interleaved (data_change=False commits are skipped
        # by the planner, never raise), unit-level cap
        (
            [
                ("append", [(1, "a"), (2, "b")]),
                ("delete_mor", 1, 1),
                ("compact_after_second_delete_prep", 0, 0),
                ("delete_mor", 2, 2),
                ("compact_vectors", 0, 0),
                ("append", [(5, "e"), (6, "f")]),
                ("optimize", 0, 0),
                ("append", [(7, "g")]),
            ],
            None,
            1,
        ),
        # uncapped single drain
        (
            [
                ("append", [(i, f"v{i}") for i in range(6)]),
                ("update_mor", 0, 2),
                ("delete_mor", 4, 5),
            ],
            None,
            None,
        ),
    ],
)
def test_cdf_stream_signed_sum_matches_snapshot(
    spark, tmp_path, ops, cap, files_cap
):
    """Whole-surface invariant for the partition-planned CDF stream:
    for ANY commit sequence of appends, MOR deletes/updates, vector
    compaction and OPTIMIZE, draining table_cdf under ANY rate-limit
    combination must yield signed rows (insert +1 / delete −1) whose
    net-positive set equals the final snapshot exactly — batching,
    unit-granular offsets and mid-commit resumes can't lose, duplicate
    or mis-tag a change."""
    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        drain_table_stream,
        register_table_cdf_stream_source,
    )

    register_table_cdf_stream_source(spark)
    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    vt.append(spark.createDataFrame([(0, "seed")], "k long, v string"))
    for op in ops:
        kind = op[0]
        if kind == "append":
            vt.append(spark.createDataFrame(op[1], "k long, v string"))
        elif kind == "delete_mor":
            vt.delete(f"k BETWEEN {op[1]} AND {op[2]}", mode="mor")
        elif kind == "update_mor":
            vt.update(
                f"k BETWEEN {op[1]} AND {op[2]}",
                {"v": "concat(v, '+')"},
                mode="mor",
            )
        elif kind == "compact_vectors":
            vt.compact_vectors()
        elif kind == "optimize":
            vt.optimize(target_partitions=1)
        # compact_after_second_delete_prep is a no-op marker

    net: dict[tuple, int] = {}

    def apply(df, batch_id):
        for r in df.collect():
            key = (r.k, r.v)
            net[key] = net.get(key, 0) + (
                1 if r._change_type == "insert" else -1
            )

    stream_opts = {}
    if files_cap is not None:
        stream_opts["maxFilesPerTrigger"] = str(files_cap)

    # drain_table_stream covers version caps; wire files_cap manually
    def drain():
        import time as _time

        reader = (
            spark.readStream.format("table_cdf")
            .option("path", tbl)
            .option("tableschema", "k long, v string")
        )
        if cap is not None:
            reader = reader.option("maxVersionsPerTrigger", str(cap))
        for k, v in stream_opts.items():
            reader = reader.option(k, v)
        ran = [False]

        def counting(df, bid):
            ran[0] = True  # any batch == offset advanced (see
            # drain_table_stream: a caught-up run executes zero batches;
            # a capped batch can be 0 rows yet still move the offset)
            apply(df, bid)

        for _ in range(50):
            ran[0] = False
            q = (
                reader.load()
                .writeStream.foreachBatch(counting)
                .option("checkpointLocation", str(tmp_path / "ck"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            if not ran[0]:
                return
        raise AssertionError("drain did not converge in 50 runs")

    drain()
    live = {(r.k, r.v) for r in vt.read().collect()}
    assert {kv for kv, n in net.items() if n > 0} == live
    assert all(n in (0, 1) for n in net.values()), net


def test_max_files_per_trigger_splits_one_commit(spark, tmp_path):
    """maxFilesPerTrigger bounds a batch BELOW one commit via
    unit-granular offsets: a single 6-file append drains in 3 batches of
    ≤ 2 files each (repeated availableNow runs on one checkpoint —
    mid-commit offsets {"version","unit"} resume exactly), every row
    exactly once, and each micro-batch carries ≤ 2 input partitions."""
    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        register_table_change_stream_source,
    )

    register_table_change_stream_source(spark)
    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    vt.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(30)], "k long, v string"
        ).repartition(6)
    )
    import glob as _glob

    assert len(_glob.glob(f"{tbl}/data/*/*.parquet")) == 6

    out = str(tmp_path / "out")
    batch_stats: list[tuple[int, int]] = []  # (n_partitions, n_rows)

    def drain_once():
        def sink(batch_df, batch_id):
            n = batch_df.count()
            if n:
                batch_stats.append((batch_df.rdd.getNumPartitions(), n))
            batch_df.write.mode("append").parquet(out)

        q = (
            spark.readStream.format("table_changes")
            .option("path", tbl)
            .option("tableschema", "k long, v string")
            .option("maxFilesPerTrigger", "2")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain_once()
    # the restart-mid-commit pin: the DURABLE checkpoint offset after the
    # first run is a {"version", "unit"} position INSIDE commit 1 — the
    # next drain is a brand-new query (process-level restart semantics)
    # that resumes exactly from it
    import json as _json

    off_dir = os.path.join(str(tmp_path / "ck"), "offsets")
    latest = sorted(
        (n for n in os.listdir(off_dir) if n.isdigit()), key=int
    )[-1]
    with open(os.path.join(off_dir, latest)) as f:
        offset_line = f.readlines()[-1].strip()
    off = _json.loads(offset_line)
    if isinstance(off, str):  # python-source offsets may double-encode
        off = _json.loads(off)
    assert off == {"version": 1, "unit": 2}, off
    for _ in range(2):
        drain_once()
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == list(range(30))  # exactly once, fully drained
    assert len(batch_stats) == 3
    assert all(p <= 2 for p, _ in batch_stats), batch_stats
    # a further run delivers nothing (offset parked at version-complete)
    drain_once()
    assert len(batch_stats) == 3
    assert sorted(
        r.k for r in spark.read.parquet(out).collect()
    ) == list(range(30))


def test_starting_version_floors_the_stream(spark, tmp_path):
    """startingVersion starts the stream at a chosen commit (inclusive):
    commits below the floor are never planned OR delivered — so a
    stream can start past the un-replayable OVERWRITE that seeded the
    table, which a floor-less stream correctly raises on. Later commits
    keep flowing on the same checkpoint, and 'latest' is refused
    (it would re-resolve after a restart and drop replayed rows)."""
    from pyspark.errors import StreamingQueryException

    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        register_table_change_stream_source,
    )

    register_table_change_stream_source(spark)
    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    vt.append(spark.createDataFrame([(1, "a")], "k long, v string"))  # v1
    vt.overwrite(
        spark.createDataFrame([(10, "x"), (11, "y")], "k long, v string")
    )  # v2: un-replayable rewrite
    vt.append(spark.createDataFrame([(20, "z")], "k long, v string"))  # v3

    def drain(name, starting=None):
        reader = (
            spark.readStream.format("table_changes")
            .option("path", tbl)
            .option("tableschema", "k long, v string")
        )
        if starting is not None:
            reader = reader.option("startingVersion", str(starting))
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / f"out_{name}"))
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def rows(name):
        return sorted(
            (r.k, r.v)
            for r in spark.read.parquet(
                str(tmp_path / f"out_{name}")
            ).collect()
        )

    # floor-less: the overwrite in range raises (append-only contract)
    with pytest.raises(StreamingQueryException, match="rewrites"):
        drain("sv_none")
    # startingVersion=3 skips v1/v2 entirely — no planning, no raise
    drain("sv3", starting=3)
    assert rows("sv3") == [(20, "z")]
    # later commits keep flowing on the same checkpoint
    vt.append(spark.createDataFrame([(30, "w")], "k long, v string"))  # v4
    drain("sv3", starting=3)
    assert rows("sv3") == [(20, "z"), (30, "w")]
    # 'latest' is refused with guidance
    with pytest.raises(Exception, match="startingVersion"):
        drain("sv_latest", starting="latest")


def test_files_and_snapshots_metadata_tables(spark, tmp_path):
    """files()/snapshots(): the manifest as DataFrames — one row per
    live file with size + stats JSON, one row per commit — pure
    manifest arithmetic, no data file opened."""
    import json as _json

    from daas_apps_spark.sources.table_format import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt"))
    vt.append(
        spark.createDataFrame(
            [(i, "x") for i in range(40)], "k long, v string"
        ).repartitionByRange(2, "k")
    )
    vt.delete("k = 0", mode="mor")
    files = vt.files().collect()
    assert len(files) == 2
    for r in files:
        assert r.size_bytes > 0
        st = _json.loads(r.stats)
        assert "k" in st and st["k"][0] <= st["k"][1]
    snaps = vt.snapshots().collect()
    assert [(s.version, s.operation) for s in snaps] == [
        (1, "append"),
        (2, "delete"),
    ]
    assert snaps[1].n_dv_add == 1
    assert snaps[1].reader_features == "deletion-vectors"


def test_table_stream_resolves_renamed_columns(spark, tmp_path):
    """A stream declared with the CURRENT (post-rename) logical schema
    reads files written BEFORE the rename correctly: the planned
    partitions carry the column mapping, and both the arrow and tuple
    executor paths resolve logical → physical names. Without the
    mapping the old files' column would silently NULL-fill."""
    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        register_table_cdf_stream_source,
    )

    register_table_cdf_stream_source(spark)
    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    vt.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    )  # v1: physical name "v"
    vt.delete("k = 2", mode="mor")  # v2: pre-rename preimage
    vt.rename_column("v", "label")  # v3
    vt.append(
        spark.createDataFrame([(3, "c")], "k long, label string")
    )  # v4: physical still "v"

    for arrow in ("true", "false"):
        q = (
            spark.readStream.format("table_cdf")
            .option("path", tbl)
            .option("tableschema", "k long, label string")
            .option("arrowbatches", arrow)
            .load()
            .writeStream.format("memory")
            .queryName(f"renamed_{arrow}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(
            (r.k, r.label, r._change_type)
            for r in spark.table(f"renamed_{arrow}").collect()
        )
        assert got == [
            (1, "a", "insert"),
            (2, "b", "delete"),
            (2, "b", "insert"),
            (3, "c", "insert"),
        ], (arrow, got)


def test_max_bytes_per_trigger_budgets_skewed_commit(spark, tmp_path):
    """maxBytesPerTrigger bounds each micro-batch by the BYTES its
    planned units will read (manifest per-file sizes): a single bulk
    commit of skewed file sizes — one big file, several small — drains
    in byte-bounded batches (the big file alone, then the small tail),
    every row exactly once. File-count budgeting would have shipped
    big+small together."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        register_table_change_stream_source,
    )

    register_table_change_stream_source(spark)
    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    # one commit, hand-written skewed files: big (5000 rows) + 3 small
    rel = "v1-skewed"
    d = os.path.join(tbl, "data", rel)
    os.makedirs(d)
    pq.write_table(
        pa.table({"k": list(range(5000)), "v": ["x" * 40] * 5000}),
        os.path.join(d, "part-big.parquet"),
        compression="none",
    )
    for i in range(3):
        pq.write_table(
            pa.table({"k": [10000 + i], "v": ["s"]}),
            os.path.join(d, f"part-s{i}.parquet"),
            compression="none",
        )
    vt._commit("append", add=[rel], remove=[])
    sizes = vt._commits()[-1]["file_sizes"][rel]
    big = sizes["part-big.parquet"]
    small_total = sum(v for f, v in sizes.items() if f != "part-big.parquet")
    assert big > small_total * 3  # genuinely skewed
    budget = big  # fits the big file alone, or the whole small tail

    out = str(tmp_path / "out")
    batch_rows: list[int] = []

    def drain_once():
        def sink(batch_df, batch_id):
            n = batch_df.count()
            if n:
                batch_rows.append(n)
            batch_df.write.mode("append").parquet(out)

        q = (
            spark.readStream.format("table_changes")
            .option("path", tbl)
            .option("tableschema", "k long, v string")
            .option("maxBytesPerTrigger", str(budget))
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for _ in range(3):
        drain_once()
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == list(range(5000)) + [10000, 10001, 10002]
    # byte budget split the ONE commit: big file alone, then the tail
    assert batch_rows == [5000, 3], batch_rows


def test_drain_table_stream_catches_up_in_bounded_runs(spark, tmp_path):
    """drain_table_stream loops availableNow runs until a run delivers
    nothing: a 5-commit log with a 2-version cap drains in ceil(5/2)=3
    applied batches, each ≤ 2 versions, every row exactly once."""
    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        drain_table_stream,
        register_table_change_stream_source,
    )

    register_table_change_stream_source(spark)
    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    for k in range(1, 6):
        vt.append(
            spark.createDataFrame([(k, f"v{k}")], "k long, v string")
        )
    seen: list[list[int]] = []

    def apply(df, batch_id):
        rows = sorted(r.k for r in df.collect())
        if rows:
            seen.append(rows)

    applied = drain_table_stream(
        spark,
        "table_changes",
        tbl,
        "k long, v string",
        str(tmp_path / "ck"),
        apply,
        max_versions_per_trigger=2,
    )
    assert applied == 3
    assert [k for b in seen for k in b] == [1, 2, 3, 4, 5]
    assert all(len(b) <= 2 for b in seen), seen


def test_table_change_stream_simple_fallback_rate_limit(spark, tmp_path):
    """option("simplereader","true") selects the prefetching
    SimpleDataSourceStreamReader fallback, whose availableNow run stops
    at the FIRST capped offset — a cold start over a 4-commit log needs
    ceil(4/2)=2 runs to drain, still exactly-once."""
    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        register_table_change_stream_source,
    )

    register_table_change_stream_source(spark)
    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    for k in range(1, 5):
        vt.append(
            spark.createDataFrame([(k, f"v{k}")], "k long, v string")
        )

    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    seen_batches: list[list[int]] = []

    _drain_table_changes(spark, tbl, out, ck, seen_batches, simple=True)
    got1 = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got1 == [1, 2]  # capped: NOT the whole table in one batch
    _drain_table_changes(spark, tbl, out, ck, seen_batches, simple=True)
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4]
    assert all(len(b) <= 2 for b in seen_batches), seen_batches
    assert len(seen_batches) == 2


def test_upsert_counts_consolidates_null_user_and_skips_completed_replay(
    spark, tmp_path
):
    """I8 upsert sink hardening: (a) NULL user_id rows consolidate into
    ONE state row across batches (eqNullSafe merge), (b) the
    _applied_batch marker makes a replay after a completed swap a no-op,
    (c) a stranded .next with its marker is recovered as the new state."""
    import json as _json
    import os as _os

    from daas_apps_spark.streaming.live import run_stream_upsert_counts

    src = tmp_path / "src"
    src.mkdir()
    for i in range(4):  # 4 files, maxFilesPerTrigger=2 -> 2 batches
        rows = [
            {
                "event_id": 100 * i + j,
                "ts": f"2024-01-01T0{i}:0{j}:00.000Z",
                "user_id": None if j == 0 else 7,
                "event_type": "click",
                "value": 1.0,
                "props": "{}",
            }
            for j in range(3)
        ]
        (src / f"part-{i}.json").write_text(
            "\n".join(_json.dumps(r) for r in rows)
        )
    state = str(tmp_path / "state")
    run_stream_upsert_counts(spark, str(src), state, str(tmp_path / "ck"))
    out = spark.read.parquet(state).collect()
    by_user = {r.user_id: r.n_events for r in out}
    assert by_user == {None: 4, 7: 8}  # ONE consolidated NULL row

    # (b) replay of the last completed batch is skipped via the marker
    marker = _os.path.join(state, "_applied_batch")
    assert _os.path.exists(marker)
    # (c) crash-window recovery: simulate rename(state->old) done but
    # rename(next->state) lost — next (with marker) must be adopted
    _os.rename(state, state + ".next_backup")
    _os.rename(state + ".next_backup", state + ".next")
    run_stream_upsert_counts(spark, str(src), state, str(tmp_path / "ck"))
    got = {r.user_id: r.n_events for r in spark.read.parquet(state).collect()}
    assert got == {None: 4, 7: 8}  # recovered, not reset, not doubled


def test_table_change_stream_multifile_commit_parallel_partitions(
    spark, tmp_path
):
    """The partition-planned reader ships ONE InputPartition per planned
    file: a commit written as 3 parquet files arrives as a 3-partition
    micro-batch (executors read the files in parallel — no single-process
    row funnel), and the rows match a batch read of the table exactly."""
    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        register_table_change_stream_source,
    )

    register_table_change_stream_source(spark)
    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(30)], "k long, v string"
    ).repartition(3)
    vt.append(df)
    import glob as _glob

    n_files = len(_glob.glob(f"{tbl}/data/*/*.parquet"))
    assert n_files == 3  # precondition: a genuinely multi-file commit

    batch_parts: list[int] = []

    def sink(batch_df, batch_id):
        batch_parts.append(batch_df.rdd.getNumPartitions())
        batch_df.write.mode("append").parquet(str(tmp_path / "out"))

    q = (
        spark.readStream.format("table_changes")
        .option("path", tbl)
        .option("tableschema", "k long, v string")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert batch_parts == [3], batch_parts  # one partition per file
    got = sorted(
        (r.k, r.v) for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    want = sorted((r.k, r.v) for r in vt.read().collect())
    assert got == want


def test_ddl_field_names_depth_aware():
    """Comma-bearing types (decimal(18,4), map<k,v>, struct<...>) must
    not split into phantom columns; backquoted names keep their spaces."""
    import pytest as _pytest

    from daas_apps_spark.streaming.live import ddl_field_names

    assert ddl_field_names("k long, v string") == ["k", "v"]
    assert ddl_field_names(
        "a decimal(18,4), m map<string,int>, "
        "s struct<x:int,y:decimal(10,2)>, "
        "arr array<struct<p:int,q:map<string,array<int>>>>"
    ) == ["a", "m", "s", "arr"]
    assert ddl_field_names("`weird col` int, b: string") == ["weird col", "b"]
    # a backquoted name may itself contain commas (and brackets): the
    # scanner must treat everything inside backquotes as name characters
    assert ddl_field_names("`a,b` int, c string") == ["a,b", "c"]
    assert ddl_field_names("`x<y,z)` int") == ["x<y,z)"]
    with _pytest.raises(ValueError, match="unbalanced"):
        ddl_field_names("a map<string,int")
    with _pytest.raises(ValueError, match="backquote"):
        ddl_field_names("`oops int, b string")


def test_arrow_fallback_is_narrow(spark, tmp_path, monkeypatch):
    """The full reader's arrow fast path downgrades to the tuple path
    ONLY on arrow-level type/conversion errors (warning once); any other
    exception — data corruption, a code bug — surfaces instead of
    silently taking the slow path."""
    import warnings

    import pyarrow as pa
    import pytest as _pytest

    import daas_apps_spark.sources.table_format as tf
    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import _make_table_stream_source

    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    vt.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))

    cls = _make_table_stream_source("x_fallback_probe", "append", "")
    ds = cls(options={"path": tbl, "tableschema": "k long, v string"})
    schema = spark.createDataFrame([], "k long, v string").schema
    reader = ds.streamReader(schema)
    assert reader.arrow_schema is not None
    reader.initialOffset()
    end = reader.latestOffset()
    parts = reader.partitions({"version": 0}, end)
    assert parts and parts[0].unit is not None

    def boom_arrow(*a, **k):
        raise pa.lib.ArrowInvalid("schema-incompatible batch")

    monkeypatch.setattr(tf, "read_change_batches", boom_arrow)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rows = [r for p in parts for r in reader.read(p)]
    assert sorted(rows) == [(1, "a"), (2, "b")]  # exact tuple fallback
    assert any("arrow fast path disabled" in str(x.message) for x in w)

    def boom_bug(*a, **k):
        raise RuntimeError("genuine corruption")

    monkeypatch.setattr(tf, "read_change_batches", boom_bug)
    reader2 = ds.streamReader(schema)
    reader2.initialOffset()
    end2 = reader2.latestOffset()
    parts2 = reader2.partitions({"version": 0}, end2)
    with _pytest.raises(RuntimeError, match="genuine corruption"):
        [r for p in parts2 for r in reader2.read(p)]


def test_table_cdf_stream_handles_comma_bearing_types(spark, tmp_path):
    """A table whose schema carries commas inside types (decimal(18,4),
    map<string,int>) must stream through table_cdf with correct arity
    and value slotting — the naive split-on-comma schema parse produced
    phantom columns here."""
    from decimal import Decimal

    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        register_table_cdf_stream_source,
    )

    register_table_cdf_stream_source(spark)
    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    schema = "k long, amt decimal(18,4), m map<string,int>"
    vt.append(
        spark.createDataFrame(
            [(1, Decimal("10.5000"), {"a": 1}), (2, Decimal("2.2500"), {"b": 2})],
            schema,
        )
    )
    vt.delete("k = 1", mode="mor")
    q = (
        spark.readStream.format("table_cdf")
        .option("path", tbl)
        .option("tableschema", schema)
        .load()
        .writeStream.format("memory")
        .queryName("cdf_commas")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.k, str(r.amt), dict(r.m), r._change_type)
        for r in spark.table("cdf_commas").collect()
    )
    assert got == [
        (1, "10.5000", {"a": 1}, "delete"),
        (1, "10.5000", {"a": 1}, "insert"),
        (2, "2.2500", {"b": 2}, "insert"),
    ]


def test_table_change_stream_schema_evolution_null_fill(spark, tmp_path):
    """Streaming a table whose early commits PREDATE an evolved column:
    with the union schema declared, rows from old files surface the new
    column as NULL (by-name emission — file column order can't mis-slot),
    on both the arrow and tuple read paths."""
    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        register_table_change_stream_source,
    )

    register_table_change_stream_source(spark)
    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    vt.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    vt.append(
        spark.createDataFrame(
            [(2, "b", 7.5)], "k long, v string, score double"
        )
    )

    for arrow in ("true", "false"):
        q = (
            spark.readStream.format("table_changes")
            .option("path", tbl)
            .option("tableschema", "k long, v string, score double")
            .option("arrowbatches", arrow)
            .load()
            .writeStream.format("memory")
            .queryName(f"evo_{arrow}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(
            (r.k, r.v, r.score)
            for r in spark.table(f"evo_{arrow}").collect()
        )
        assert got == [(1, "a", None), (2, "b", 7.5)], (arrow, got)


def test_table_cdf_stream_replays_mor_deletes_and_updates(spark, tmp_path):
    """The change-data-feed streaming source: appends arrive as inserts,
    a MOR delete as delete rows, a MOR update as its delete+insert pair;
    a rerun on the same checkpoint picks up only newer commits; a
    rewriting commit still raises."""
    import pytest as _pytest

    from daas_apps_spark.sources.table_format import (
        VersionedTable,
        cdf_rows_between,
    )
    from daas_apps_spark.streaming.live import (
        register_table_cdf_stream_source,
    )

    register_table_cdf_stream_source(spark)
    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    vt.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    vt.delete("k = 1", mode="mor")  # v2

    out = str(tmp_path / "out")

    def drain():
        stream = (
            spark.readStream.format("table_cdf")
            .option("path", tbl)
            .option("tableschema", "k long, v string")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    got = sorted(
        (r.k, r.v, r._change_type) for r in spark.read.parquet(out).collect()
    )
    assert got == [
        (1, "a", "delete"),
        (1, "a", "insert"),
        (2, "b", "insert"),
    ]
    # a MOR update on the same checkpoint: ONLY the pair arrives
    vt.update("k = 2", {"v": "'B'"}, mode="mor")
    drain()
    got2 = sorted(
        (r.k, r.v, r._change_type) for r in spark.read.parquet(out).collect()
    )
    assert got2 == sorted(got + [(2, "B", "insert"), (2, "b", "delete")])
    # signed-sum sanity: the net state the feed implies == the table
    net = {}
    for k, v, t in got2:
        net[(k, v)] = net.get((k, v), 0) + (1 if t == "insert" else -1)
    live = {(r.k, r.v) for r in vt.read().collect()}
    assert {kv for kv, n in net.items() if n > 0} == live
    # rewrites still raise (their delta needs a snapshot diff)
    vt.overwrite(spark.createDataFrame([(9, "z")], "k long, v string"))
    with _pytest.raises(ValueError, match="rewrites data"):
        cdf_rows_between(tbl, 3)


def test_cdf_streaming_materialized_view_equals_batch(spark, tmp_path):
    """The CDF stream driving the signed-delta IVM aggregation lands
    exactly where a batch recompute of the final snapshot does — the
    streaming materialized-view loop closed end-to-end (append + MOR
    delete + MOR update replayed through versions-as-offsets)."""
    from pyspark.sql import functions as F

    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        cdf_running_aggregate,
        register_table_cdf_stream_source,
    )

    register_table_cdf_stream_source(spark)
    tbl = str(tmp_path / "vt")
    vt = VersionedTable(spark, tbl)
    vt.append(
        spark.createDataFrame(
            [(i, "g%d" % (i % 3), i * 10) for i in range(12)],
            "k long, g string, x long",
        )
    )
    vt.delete("k in (1, 4, 7)", mode="mor")  # drops three g1 rows
    vt.update("k = 2", {"x": "x + 1000"}, mode="mor")

    stream = (
        spark.readStream.format("table_cdf")
        .option("path", tbl)
        .option("tableschema", "k long, g string, x long")
        .load()
    )
    view = cdf_running_aggregate(
        stream, group_by=["g"], count_col="n", sums={"sx": "x"}
    )
    q = (
        view.writeStream.format("memory")
        .queryName("cdf_mv")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.g, r.n, r.sx)
        for r in spark.sql("SELECT * FROM cdf_mv WHERE n > 0").collect()
    }
    expect = {
        (r.g, r.n, r.sx)
        for r in vt.read()
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sx"),
        )
        .collect()
    }
    assert got == expect


def test_cdf_to_materialized_view_rate_limited_catchup(spark, tmp_path):
    """A view rebuilt against a long-uncaught-up checkpoint with
    max_versions_per_trigger advances in bounded, individually-committed
    refreshes (one view version per applied batch), and the final state
    equals a batch recompute of the source head."""
    from pyspark.sql import functions as F

    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        run_cdf_to_materialized_view,
    )

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    vt = VersionedTable(spark, src)
    for i in range(4):
        vt.append(
            spark.createDataFrame(
                [(i * 10 + j, "g%d" % (j % 2), j) for j in range(6)],
                "k long, g string, x long",
            )
        )
    vt.delete("k < 3", mode="mor")  # 5 source commits total

    run_cdf_to_materialized_view(
        spark,
        src,
        view,
        str(tmp_path / "ck"),
        tableschema="k long, g string, x long",
        group_by=["g"],
        count_col="n",
        sums={"sx": "x"},
        max_versions_per_trigger=1,
    )
    mv = VersionedTable(spark, view)
    got = {(r.g, r.n, r.sx) for r in mv.read().collect()}
    want = {
        (r.g, r.n, r.sx)
        for r in vt.read()
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sx"),
        )
        .collect()
    }
    assert got == want
    # one view commit per applied batch: 5 data commits, cap 1 → 5
    # refreshes, each a time-travelable version
    assert mv.latest_version() == 5
    # intermediate version equals the recompute at the matching source
    # version (batch i covers source commit i)
    mid = {(r.g, r.n, r.sx) for r in mv.read(version=2).collect()}
    mid_want = {
        (r.g, r.n, r.sx)
        for r in vt.read(version=2)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sx"),
        )
        .collect()
    }
    assert mid == mid_want


def test_stream_sink_refuses_unknown_writer_feature(spark, tmp_path):
    """The exactly-once streaming sink is a write path like any other:
    a destination table whose log requires a writer feature this code
    lacks fails the stream LOUDLY (batch error -> query error) instead
    of publishing commits that bypass the requirement."""
    import json as _json

    from pyspark.errors import StreamingQueryException

    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        run_cdf_to_materialized_view,
    )

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    vt = VersionedTable(spark, src)
    vt.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    # the DESTINATION table was touched by a NEWER writer that declared
    # a feature this code does not implement
    view_vt = VersionedTable(spark, view)
    entry = {
        "version": 1,
        "operation": "frobnicate",
        "add": [],
        "remove": [],
        "data_change": False,
        "ts": 0.0,
        "metadata": {},
        "stats": {},
        "file_stats": {},
        "dv_add": [],
        "dv_remove": [],
        "features": [],
        "writer_features": ["fancy-future-thing"],
    }
    with open(os.path.join(view, "_log", "00000001.json"), "w") as f:
        _json.dump(entry, f)
    with pytest.raises(StreamingQueryException, match="writer feature"):
        run_cdf_to_materialized_view(
            spark,
            src,
            view,
            str(tmp_path / "ck"),
            "k long, v string",
            group_by=["v"],
        )
    # no commit landed on the destination
    assert view_vt.latest_version() == 1


def test_cdf_fanout_two_tables_exactly_once(spark, tmp_path, monkeypatch):
    """Multi-table exactly-once: one CDF stream maintains a signed-delta
    view AND an append-only audit log, each guarded by its own
    (stream_id, batch_id) key. Fault injection crashes the batch BETWEEN
    the two commits; on resume the batch replays, the view SKIPS (its
    pair is in the log) and the audit applies — no double count, no lost
    audit rows. A caught-up rerun is a no-op on both tables."""
    from pyspark.errors import StreamingQueryException

    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import run_cdf_fanout_exactly_once

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    audit = str(tmp_path / "audit")
    ck = str(tmp_path / "ck")
    vt = VersionedTable(spark, src)
    vt.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
            "k long, grp string, val double",
        )
    )  # v1
    vt.delete("k = 2", mode="mor")  # v2
    vt.update("k = 3", {"val": "val + 5"}, mode="mor")  # v3

    # crash INJECTION: the first audit append dies AFTER the view commit
    orig_append = VersionedTable.append
    state = {"failed": False}

    def flaky_append(self, df, metadata=None):
        if self.path == audit and not state["failed"]:
            state["failed"] = True
            raise RuntimeError("injected crash between the two commits")
        return orig_append(self, df, metadata)

    monkeypatch.setattr(VersionedTable, "append", flaky_append)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        run_cdf_fanout_exactly_once(
            spark, src, view, audit, ck,
            "k long, grp string, val double",
            group_by=["grp"], sums={"total": "val"},
        )
    # the view committed batch 0 before the crash; the audit did not
    assert VersionedTable(spark, view).latest_version() >= 1
    with pytest.raises(ValueError, match="no snapshot"):
        VersionedTable(spark, audit).read()

    monkeypatch.setattr(VersionedTable, "append", orig_append)
    run_cdf_fanout_exactly_once(  # resume: replayed batch, view skips
        spark, src, view, audit, ck,
        "k long, grp string, val double",
        group_by=["grp"], sums={"total": "val"},
    )
    view_rows = sorted(
        (r.grp, r.n, round(r.total, 4))
        for r in VersionedTable(spark, view).read().collect()
    )
    # recompute check: head state is (1,a,10.0) and (3,b,35.0)
    assert view_rows == [("a", 1, 10.0), ("b", 1, 35.0)]
    audit_rows = sorted(
        (r.k, r._change_type)
        for r in VersionedTable(spark, audit).read().collect()
    )
    # every CDF row exactly once: 3 inserts, delete k=2, update pair k=3
    assert audit_rows == [
        (1, "insert"),
        (2, "delete"),
        (2, "insert"),
        (3, "delete"),
        (3, "insert"),
        (3, "insert"),
    ]
    # caught-up rerun: no new versions anywhere
    v_view = VersionedTable(spark, view).latest_version()
    v_audit = VersionedTable(spark, audit).latest_version()
    run_cdf_fanout_exactly_once(
        spark, src, view, audit, ck,
        "k long, grp string, val double",
        group_by=["grp"], sums={"total": "val"},
    )
    assert VersionedTable(spark, view).latest_version() == v_view
    assert VersionedTable(spark, audit).latest_version() == v_audit


def test_cdf_to_materialized_view_table_end_to_end(spark, tmp_path):
    """The complete CDC loop: base versioned table → CDF stream →
    signed-delta maintenance → exactly-once versioned VIEW table. The
    view must equal a batch recompute after each drain (appends, then
    MOR delete + update on the SAME checkpoint), a no-new-commit rerun
    must change nothing, and every refresh is a time-travelable view
    version."""
    from pyspark.sql import functions as F

    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        run_cdf_to_materialized_view,
    )

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    ck = str(tmp_path / "ck")
    vt = VersionedTable(spark, src)
    vt.append(
        spark.createDataFrame(
            [(i, "g%d" % (i % 3), i * 10) for i in range(12)],
            "k long, g string, x long",
        )
    )

    def drain():
        run_cdf_to_materialized_view(
            spark,
            src,
            view,
            ck,
            tableschema="k long, g string, x long",
            group_by=["g"],
            count_col="n",
            sums={"sx": "x"},
        )

    def batch_expect():
        return {
            (r.g, r.n, r.sx)
            for r in vt.read()
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("x").alias("sx"),
            )
            .collect()
        }

    vv = VersionedTable(spark, view)
    drain()
    assert {(r.g, r.n, r.sx) for r in vv.read().collect()} == batch_expect()

    # MOR DML on the same checkpoint: the view advances by the delta only
    vt.delete("k in (1, 4, 7)", mode="mor")
    vt.update("k = 2", {"x": "x + 1000"}, mode="mor")
    drain()
    assert {(r.g, r.n, r.sx) for r in vv.read().collect()} == batch_expect()

    # no new commits: rerun is a no-op (exactly-once, no phantom version)
    v_before = vv.latest_version()
    drain()
    assert vv.latest_version() == v_before
    # each refresh is a time-travelable view version
    assert vv.read(version=1).count() > 0


def test_cdf_fanout_atomic_crash_between_stages_no_half_state(
    spark, tmp_path, monkeypatch
):
    """Fault injection for the ATOMIC fan-out: the audit stage dies
    AFTER the view's staged commit. Where the exactly-once loop leaves
    the view already updated (the documented half-state), here a reader
    sees NOTHING on either table — the view's staged commit is an
    invisible consumed slot until the coordinator marker that never
    came. Resume aborts the dead txn, replays under a fresh one, and
    both tables flip visible TOGETHER with exactly-once content."""
    from pyspark.errors import StreamingQueryException

    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import run_cdf_fanout_atomic

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    audit = str(tmp_path / "audit")
    ck = str(tmp_path / "ck")
    coord_dir = str(tmp_path / "coord")
    vt = VersionedTable(spark, src)
    vt.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
            "k long, grp string, val double",
        )
    )  # v1
    vt.delete("k = 2", mode="mor")  # v2
    vt.update("k = 3", {"val": "val + 5"}, mode="mor")  # v3

    orig_append = VersionedTable.append
    state = {"failed": False}

    def flaky_append(self, df, metadata=None, txn=None):
        if self.path == audit and not state["failed"]:
            state["failed"] = True
            raise RuntimeError("injected crash between the two stages")
        return orig_append(self, df, metadata=metadata, txn=txn)

    monkeypatch.setattr(VersionedTable, "append", flaky_append)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        run_cdf_fanout_atomic(
            spark, src, view, audit, ck, coord_dir,
            "k long, grp string, val double",
            group_by=["grp"], sums={"total": "val"},
        )
    # NO HALF-STATE: the view staged a commit (slot consumed) but a
    # reader sees nothing on EITHER table — the exactly-once loop's
    # observable half-state is impossible here
    view_vt = VersionedTable(spark, view)
    assert view_vt.latest_version() >= 1  # staged slot exists...
    with pytest.raises(ValueError, match="no snapshot"):
        view_vt.read()  # ...but is invisible
    with pytest.raises(ValueError, match="no snapshot"):
        VersionedTable(spark, audit).read()

    monkeypatch.setattr(VersionedTable, "append", orig_append)
    run_cdf_fanout_atomic(  # resume: dead txn aborted, batch replays
        spark, src, view, audit, ck, coord_dir,
        "k long, grp string, val double",
        group_by=["grp"], sums={"total": "val"},
    )
    view_rows = sorted(
        (r.grp, r.n, round(r.total, 4))
        for r in VersionedTable(spark, view).read().collect()
    )
    assert view_rows == [("a", 1, 10.0), ("b", 1, 35.0)]
    audit_rows = sorted(
        (r.k, r._change_type)
        for r in VersionedTable(spark, audit).read().collect()
    )
    assert audit_rows == [
        (1, "insert"),
        (2, "delete"),
        (2, "insert"),
        (3, "delete"),
        (3, "insert"),
        (3, "insert"),
    ]
    # caught-up rerun: no new versions anywhere
    v_view = VersionedTable(spark, view).latest_version()
    v_audit = VersionedTable(spark, audit).latest_version()
    run_cdf_fanout_atomic(
        spark, src, view, audit, ck, coord_dir,
        "k long, grp string, val double",
        group_by=["grp"], sums={"total": "val"},
    )
    assert VersionedTable(spark, view).latest_version() == v_view
    assert VersionedTable(spark, audit).latest_version() == v_audit


def test_cdf_fanout_atomic_crash_before_coordinator_marker(
    spark, tmp_path, monkeypatch
):
    """Fault injection at the WORST point: both tables staged, crash
    right before the coordinator's committed marker. Both staged
    commits are invisible (a reader observes the pre-batch state on
    both tables); resume presumes abort and re-applies exactly once."""
    from pyspark.errors import StreamingQueryException

    from daas_apps_spark.sources.table_format import (
        MultiTableTxn,
        VersionedTable,
    )
    from daas_apps_spark.streaming.live import run_cdf_fanout_atomic

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    audit = str(tmp_path / "audit")
    ck = str(tmp_path / "ck")
    coord_dir = str(tmp_path / "coord")
    vt = VersionedTable(spark, src)
    vt.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (3, "b", 30.0)], "k long, grp string, val double"
        )
    )

    orig_commit = MultiTableTxn.commit
    state = {"failed": False}

    def flaky_commit(self, txn):
        if not state["failed"]:
            state["failed"] = True
            raise RuntimeError("injected crash before the marker")
        return orig_commit(self, txn)

    monkeypatch.setattr(MultiTableTxn, "commit", flaky_commit)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        run_cdf_fanout_atomic(
            spark, src, view, audit, ck, coord_dir,
            "k long, grp string, val double",
            group_by=["grp"], sums={"total": "val"},
        )
    # both tables staged a commit; NEITHER is visible
    assert VersionedTable(spark, view).latest_version() >= 1
    assert VersionedTable(spark, audit).latest_version() >= 1
    with pytest.raises(ValueError, match="no snapshot"):
        VersionedTable(spark, view).read()
    with pytest.raises(ValueError, match="no snapshot"):
        VersionedTable(spark, audit).read()

    monkeypatch.setattr(MultiTableTxn, "commit", orig_commit)
    run_cdf_fanout_atomic(
        spark, src, view, audit, ck, coord_dir,
        "k long, grp string, val double",
        group_by=["grp"], sums={"total": "val"},
    )
    view_rows = sorted(
        (r.grp, r.n, round(r.total, 4))
        for r in VersionedTable(spark, view).read().collect()
    )
    assert view_rows == [("a", 1, 10.0), ("b", 1, 30.0)]
    assert VersionedTable(spark, audit).read().count() == 2


def test_table_stream_on_row_tracked_table_ids_opt_in(spark, tmp_path):
    """Row tracking (A43) and the table stream sources compose: the
    stream's DECLARED schema decides whether the hidden id ships —
    omitted, rows arrive id-free exactly as on an untracked table;
    declared, every row carries its stable id (so a downstream
    consumer can key its own state by row lineage)."""
    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import (
        drain_table_stream,
        register_table_change_stream_source,
    )

    register_table_change_stream_source(spark)

    tbl = str(tmp_path / "t")
    vt = VersionedTable(spark, tbl)
    vt.enable_row_tracking()
    for k in range(1, 4):
        vt.append(
            spark.createDataFrame([(k, f"v{k}")], "k long, v string")
        )
    plain: list[tuple] = []
    drain_table_stream(
        spark,
        "table_changes",
        tbl,
        "k long, v string",
        str(tmp_path / "ck1"),
        lambda df, _b: plain.extend(
            sorted((r["k"], r["v"]) for r in df.collect())
        ),
    )
    assert plain == [(1, "v1"), (2, "v2"), (3, "v3")]
    with_ids: list[tuple] = []
    drain_table_stream(
        spark,
        "table_changes",
        tbl,
        "k long, v string, __row_id long",
        str(tmp_path / "ck2"),
        lambda df, _b: with_ids.extend(
            (r["k"], r["__row_id"]) for r in df.collect()
        ),
    )
    assert sorted(k for k, _ in with_ids) == [1, 2, 3]
    ids = [i for _, i in with_ids]
    assert None not in ids and len(set(ids)) == 3
    # the streamed ids are exactly the table's stable ids
    table_ids = {
        r["k"]: r["__row_id"]
        for r in vt.read(with_row_ids=True).collect()
    }
    assert dict(with_ids) == table_ids


def test_cdf_streaming_index_maintenance_equals_rebuild(spark, tmp_path):
    """K69 live twin: the table_cdf stream maintains the IVF index per
    micro-batch (exactly-once conditional merges keyed on (stream_id,
    batch_id)); after append + MOR delete + MOR update the maintained
    index is row-identical to a from-scratch rebuild on the source
    head, and a second drain applies nothing."""
    from pyspark.sql import functions as F

    from daas_apps_spark.operators.ann_index import build_ivf_index
    from daas_apps_spark.sources.table_format import VersionedTable
    from daas_apps_spark.streaming.live import run_cdf_index_maintenance

    def vec(i):
        return [float((i * 7 + d * 3) % 13 - 6) for d in range(8)]

    cent = spark.createDataFrame(
        [(c, vec(c)) for c in (0, 5, 9)],
        "cent_id long, cv array<double>",
    )
    src_path = str(tmp_path / "vectors")
    src = VersionedTable(spark, src_path)
    src.append(
        spark.createDataFrame(
            [(i, vec(i)) for i in range(20)],
            "vec_id long, embedding array<double>",
        )
    )  # v1
    src.append(
        spark.createDataFrame(
            [(i, vec(i)) for i in range(20, 28)],
            "vec_id long, embedding array<double>",
        )
    )  # v2
    src.delete("vec_id % 4 = 1", mode="mor")  # v3: signed deletes
    src.update(
        "vec_id = 6", {"embedding": "array(9.0D, 1.0D, 1.0D, 1.0D, "
        "1.0D, 1.0D, 1.0D, 1.0D)"}, mode="mor",
    )  # v4: delete-preimage + insert-postimage pair
    idx_path = str(tmp_path / "index")
    applied = run_cdf_index_maintenance(
        spark,
        src_path,
        idx_path,
        str(tmp_path / "ck"),
        "vec_id long, embedding array<double>",
        cent,
        max_versions_per_trigger=1,  # one commit per refresh
    )
    assert applied >= 3  # v1/v2 inserts, v3 deletes, v4 update
    idx = VersionedTable(spark, idx_path)
    rebuilt = build_ivf_index(spark, src, str(tmp_path / "rb"), cent)
    a = idx.read().select("vec_id", "cent_id")
    b = rebuilt.read().select("vec_id", "cent_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # the updated vector moved lists if its nearest centroid changed;
    # either way its stored embedding is the postimage
    got = idx.read().filter(F.col("vec_id") == 6).first()
    assert got.v[0] == 9.0
    # exactly-once: a second drain against the same checkpoint applies 0
    again = run_cdf_index_maintenance(
        spark,
        src_path,
        idx_path,
        str(tmp_path / "ck"),
        "vec_id long, embedding array<double>",
        cent,
    )
    assert again == 0
    assert a.exceptAll(
        VersionedTable(spark, idx_path).read().select("vec_id", "cent_id")
    ).count() == 0
