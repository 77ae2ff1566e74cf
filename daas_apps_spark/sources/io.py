"""Sources & sinks: CSV/JSON scans with explicit schemas, write modes,
partitioned & single-file sinks, provenance columns (SURVEY §2.2 A2-A7).

The reference's I/O model is whole-file scatter-gather over a shared POSIX
tree (R1 scan MiscUtils.java:15-38, R16 move-commit FileMover.java:9-27);
the engine's is format-aware DataFrame readers/writers with Spark's
FileOutputCommitter giving the same write-then-rename no-overwrite
semantics. Round-trip queries write to a scratch dir under the repo and
read back through the declared scan path, proving scan+sink together.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.functions.discipline import dsum, sql_dsum
from daas_apps_spark.registry import register

SCRATCH_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")

LINEITEM_CSV_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate timestamp"
)

EVENTS_JSON_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def scratch_dir(name: str) -> str:
    """Fresh per-query scratch directory (inside the repo tree)."""
    path = os.path.join(SCRATCH_ROOT, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(SCRATCH_ROOT, exist_ok=True)
    return path


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """A2: schema-given CSV scan (no inference — schema-on-read is pinned)."""
    return spark.read.schema(schema).option("header", "true").csv(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """A3: schema-given JSONL scan."""
    return spark.read.schema(schema).json(path)


@register(
    "a2_csv_roundtrip",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_dsum('l_extendedprice')} AS total_price,
           CAST(MIN(l_shipdate) AS TIMESTAMP) AS first_ship
    FROM lineitem WHERE l_linenumber = 1
    GROUP BY l_returnflag
    """,
    tags=("A2", "A5"),
)
def a2_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → CSV sink → schema-given CSV scan → aggregate.

    Timestamps survive via the default ISO format; the oracle aggregates the
    original parquet, so any serialization loss would hash-mismatch.
    """
    path = scratch_dir("a2_csv_roundtrip")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    li.write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv(spark, path, LINEITEM_CSV_SCHEMA)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice").alias("total_price"),
        F.min("l_shipdate").alias("first_ship"),
    )


@register(
    "a3_json_roundtrip",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS total_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
    tags=("A3", "A5"),
)
def a3_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → JSONL sink → schema-given JSON scan → aggregate.

    ``props`` holds a JSON object *string* — the writer escapes it as a JSON
    string value and the schema-given reader recovers it verbatim (schema
    pins it to STRING, so no inference can turn it into a struct).
    """
    path = scratch_dir("a3_json_roundtrip")
    e = table(spark, sf_dir, "events")
    e.write.mode("overwrite").json(path)
    back = read_json(spark, path, EVENTS_JSON_SCHEMA)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "a6_partitioned_sink_prune",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice')} AS revenue
    FROM orders WHERE o_orderstatus IN ('F', 'O')
    GROUP BY o_orderstatus
    """,
    tags=("A6", "B8", "A4"),
)
def a6_partitioned_sink_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned sink + partition-pruned scan (R11/R19 layout analog).

    Writes orders hive-partitioned by status, reads back with a partition
    predicate — only the F/O directories are scanned (the R19 ``-L contig``
    pruning, done by layout instead of tool flag). tests/test_sources.py
    asserts the pruning in the physical plan.
    """
    path = scratch_dir("a6_partitioned_sink")
    o = table(spark, sf_dir, "orders")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path).filter(F.col("o_orderstatus").isin("F", "O"))
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


@register(
    "a7_single_file_merge",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_dsum('s_acctbal')} AS total_bal
    FROM supplier
    """,
    tags=("A7",),
)
def a7_single_file_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce(1) single-file sink (R14/R15 n-way merge analog) + re-scan.

    The reference merges per-dataset outputs into one BAM/VCF driver-side
    (BAMMerger.java:10-41); the engine's merge is a coalesce(1) write — only
    sane for small outputs, which is why the query uses the supplier dim.
    """
    path = scratch_dir("a7_single_file")
    s = table(spark, sf_dir, "supplier")
    s.coalesce(1).write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"), dsum("s_acctbal").alias("total_bal")
    )


@register(
    "a9_orc_roundtrip",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice')} AS revenue,
           CAST(MAX(o_orderdate) AS TIMESTAMP) AS last_order
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("A9", "A5"),
)
def a9_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → ORC sink → ORC scan → aggregate (third columnar format).

    ORC is Spark-native (vectorized reader, predicate pushdown) but DuckDB
    cannot read it — so like A2/A3 the oracle aggregates the ORIGINAL
    parquet: any type loss through the ORC writer/reader round-trip
    (timestamps are the usual casualty) hash-mismatches.
    """
    path = scratch_dir("a9_orc_roundtrip")
    o = table(spark, sf_dir, "orders")
    o.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
        F.max("o_orderdate").alias("last_order"),
    )


@register(
    "a10_binaryfile_scan",
    oracle="""
    SELECT doc_id,
           md5(text || chr(10)) AS digest,
           CAST(length(text) + 1 AS BIGINT) AS n_bytes
    FROM documents WHERE doc_id % 25 = 0
    """,
    tags=("A10", "K7"),
)
def a10_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-file ingestion: distributed text sink → `binaryFile` scan →
    per-file digest (the multimodal raw-asset ingest path).

    A corpus of image/audio/raw assets lands as *files*, not rows;
    Spark's `binaryFile` source turns each file into (path, content) with
    no decode — exactly how the K7 multimodal pipeline ingests payloads at
    scale (one task per file group, no driver involvement). Here each
    sampled document is written as its own file via a hive-partitioned
    text sink (executor-side, no driver loop), read back as binary, and
    digest-verified: the text writer appends one '\\n' per line, so the
    oracle hashes `text || chr(10)` over the original table.
    """
    path = scratch_dir("a10_binaryfile")
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    d.select("doc_id", "text").write.mode("overwrite").partitionBy(
        "doc_id"
    ).text(path)
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    return back.select(
        F.regexp_extract(F.col("path"), r"doc_id=(\d+)", 1)
        .cast("long")
        .alias("doc_id"),
        F.md5("content").alias("digest"),
        F.col("length").cast("long").alias("n_bytes"),
    )


@register(
    "a12_schema_evolution",
    oracle=f"""
    WITH v1 AS (
        SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 0
    ),
    v2 AS (
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 1
    ),
    unioned AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_orderpriority) AS BIGINT) AS n_with_priority,
           {sql_dsum('o_totalprice')} AS revenue
    FROM unioned
    """,
    tags=("A12", "A5", "G1"),
)
def a12_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across file batches: an old batch written WITHOUT a
    column, a new batch WITH it, read together via ``mergeSchema`` — rows
    from the old batch surface the added column as NULL.

    The ingest reality of any long-lived dataset: producers add columns
    over time. ``mergeSchema`` reconciles footers at planning time (pay it
    on demand, not per scan — at 100 TB set it per-read, not globally).
    """
    path = scratch_dir("a12_schema_evolution")
    o = table(spark, sf_dir, "orders")
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(path + "/batch=v1")
    o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).write.mode("overwrite").parquet(path + "/batch=v2")
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderpriority").alias("n_with_priority"),
        dsum("o_totalprice").alias("revenue"),
    )


@register(
    "a17_gzip_roundtrip",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderstatus
    """,
    tags=("A17", "A3", "A5"),
)
def a17_gzip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-codec ingestion: parquet → gzip JSONL sink → scan of the
    ``.json.gz`` files → aggregate, checked against the uncompressed
    original. Landing zones deliver gzipped JSON/CSV as a matter of
    course; the codec path matters at 100 TB because gzip is NOT
    splittable — each .gz file is one task, so the writer must control
    file count/size (here: Spark's per-partition files), and a
    production layout would re-shard to a splittable format (parquet,
    zstd-framed) at ingest — exactly what this round-trip does in
    reverse.
    """
    path = scratch_dir("a17_gzip_roundtrip")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    o.write.mode("overwrite").option("compression", "gzip").json(path)
    back = spark.read.schema(
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ).json(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice").alias("total_price"),
    )


@register(
    "a19_xml_roundtrip",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_text_len,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM documents GROUP BY lang
    """,
    tags=("A19", "A5", "A3"),
)
def a19_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → XML sink → schema-given XML scan → aggregate (Spark 4's
    built-in XML source — the fourth interchange format after CSV/JSON/ORC,
    and the one that exercises entity escaping: document text containing
    ``<``/``&`` must survive writer escaping and parser unescaping
    byte-exactly, which the length/checksum aggregate would catch).

    Same contract as a2/a3/a9: the oracle aggregates the ORIGINAL table,
    so any row lost, duplicated, or corrupted in the round-trip
    hash-mismatches. The scan is schema-given (no inference pass over the
    files — at 100 TB schema inference is a full extra read).
    """
    path = scratch_dir("a19_xml_roundtrip")
    d = table(spark, sf_dir, "documents")
    d.select("doc_id", "text", "lang", "n_chars").write.mode(
        "overwrite"
    ).format("xml").option("rootTag", "docs").option("rowTag", "doc").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        # Spark's XML reader trims element whitespace by default — the
        # byte-exact contract requires keeping surrounding spaces.
        .option("ignoreSurroundingSpaces", "false")
        .schema("doc_id long, text string, lang string, n_chars long")
        .load(path)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.length("text")).alias("total_text_len"),
        F.sum("doc_id").alias("id_checksum"),
    )


@register(
    "a21_dynamic_partition_overwrite",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F'
                              THEN o_totalprice * 2
                              ELSE o_totalprice END
                    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(MAX(CASE WHEN o_orderstatus = 'F' THEN 2 ELSE 1 END) AS INTEGER)
               AS batch_id
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("A21", "A6", "A5"),
)
def a21_dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dynamic partition overwrite — the incremental-refresh sink: a
    second batch containing ONLY partition F's (recomputed) rows
    overwrites JUST that partition directory, leaving O/P untouched —
    `partitionOverwriteMode=dynamic`, pinned per-writer via `.option()`
    so no session state leaks. Static mode (the default) would have
    deleted the whole table root first; the census proves O/P survived
    batch 1 while F carries batch 2's doubled prices — the lakehouse
    partition-level upsert that G5's row-level MERGE complements.

    Reference analogy: the per-dataset output directories the reference
    move-commits into (`FileMover.java:9-27`) are partition directories;
    re-running one dataset must not clobber its siblings.

    Scale: the overwrite cost is proportional to the REWRITTEN
    partitions, not the table; at 100 TB daily refreshes rewrite only
    touched date partitions. Concurrent writers to the SAME partition
    still race (no table format here) — that is the jump to
    Iceberg/Delta commit protocols, out of scope by declaration.
    """
    path = scratch_dir("a21_dyn_overwrite")
    o = table(spark, sf_dir, "orders")
    batch1 = o.withColumn("batch_id", F.lit(1))
    batch1.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    batch2 = (
        o.filter(F.col("o_orderstatus") == "F")
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("batch_id", F.lit(2))
    )
    (
        batch2.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderstatus")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
        F.max("batch_id").cast("int").alias("batch_id"),
    )


@register(
    "a22_csv_quoted_roundtrip",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(length(text)) AS BIGINT) AS total_len,
           CAST(SUM(('0x' || substring(md5(text), 1, 7))::BIGINT) AS BIGINT)
               AS content_digest
    FROM documents GROUP BY lang
    """,
    tags=("A22", "A2", "A15", "K7"),
)
def a22_csv_quoted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-safe CSV round-trip: the DOCUMENTS table — free text with
    commas, quotes, arbitrary unicode — written to CSV with explicit
    quoting/escaping (`quoteAll`, doubled-quote escape) and read back
    with `multiLine` (a quoted field may span physical lines), then
    censused per language with a content digest (sum of md5-prefix ints
    of the text). The digest hash-matching the ORIGINAL table proves the
    round-trip byte-lossless — the failure mode this guards is silent:
    naive CSV handling truncates at embedded delimiters/newlines and
    still produces plausible-looking rows.

    Scale note: `multiLine` CSV is NOT splittable (a record boundary
    can't be found mid-file), so the writer controls parallelism via
    file count — the same writer-sizes-the-read contract as gzip (A17).
    """
    path = scratch_dir("a22_csv_quoted")
    d = table(spark, sf_dir, "documents")
    # emptyValue/nullValue are pinned DISTINCT on both writer and reader:
    # by default Spark's reader maps a quoted empty string back to NULL,
    # so an empty text field would silently drop from the length/digest
    # sums — the round-trip must hold for '' and NULL separately, not
    # just for the fixture's non-empty rows.
    (
        d.write.mode("overwrite")
        .option("header", "true")
        .option("quoteAll", "true")
        .option("escape", '"')
        .option("emptyValue", "")
        .option("nullValue", "\\N")
        .csv(path)
    )
    back = (
        spark.read.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .option("emptyValue", "")
        .option("nullValue", "\\N")
        .csv(path)
    )
    digest = "cast(conv(substring(md5(text), 1, 7), 16, 10) as bigint)"
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.length("text")).alias("total_len"),
        F.sum(F.expr(digest)).alias("content_digest"),
    )


@register(
    "a24_parquet_codecs",
    oracle="""
    SELECT 'zstd' AS codec,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders
    UNION ALL
    SELECT 'snappy', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
    FROM orders
    """,
    tags=("A24", "A5", "A17"),
)
def a24_parquet_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet compression-codec round-trips: the same table written with
    zstd and snappy, re-read, and censused — both must reproduce the
    source exactly (codec choice is a storage knob, never a semantics
    knob). Unlike gzip text (A17), parquet pages stay independently
    decodable under every codec, so scans remain splittable — the reason
    columnar-plus-codec is the 100 TB default while compressed text is
    the ingest-only exception. zstd trades ~2x tighter files for ~1.2x
    write cost vs snappy; read cost is usually scan-bound either way —
    the knob to revisit when storage, not CPU, is the budget.
    """
    o = table(spark, sf_dir, "orders")
    out = None
    for codec in ("zstd", "snappy"):
        path = scratch_dir(f"a24_{codec}")
        o.write.mode("overwrite").option("compression", codec).parquet(path)
        back = (
            spark.read.parquet(path)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                dsum("o_totalprice").alias("revenue"),
            )
            .select(F.lit(codec).alias("codec"), "n_rows", "revenue")
        )
        out = back if out is None else out.unionAll(back)
    return out


@register(
    "a25_table_format_timetravel",
    oracle="""
    SELECT CAST(1 AS INTEGER) AS version, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(1 AS INTEGER) AS batch_id
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT CAST(2 AS INTEGER), o_orderstatus,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F'
                              THEN o_totalprice * 2
                              ELSE o_totalprice END
                    AS DECIMAL(18,4))) AS DOUBLE),
           CAST(CASE WHEN o_orderstatus = 'F' THEN 2 ELSE 1 END AS INTEGER)
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("A25", "A21", "G5"),
)
def a25_table_format_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned-table-format round-trip (sources/table_format.py): orders
    appended as commit v1, then a MERGE upsert (partition F's rows with
    doubled prices, batch 2) as commit v2 — and BOTH snapshots read back
    through the commit log: the latest state AND the time-traveled v1,
    censused side by side. v1 must still census to the original table
    even though v2 retired its data files — immutable data + replayable
    log is the property under test, the thing A21's in-place dynamic
    overwrite cannot give (its old partition is gone after the second
    batch).

    Scale: a snapshot read is a plain multi-dir parquet scan (pruning
    and pushdown apply per normal); the commit log is O(versions) tiny
    JSON files, folded into a checkpoint snapshot every
    CHECKPOINT_EVERY commits (replay cost stays O(N mod CHECKPOINT_
    EVERY); pre-checkpoint commit files become droppable — log
    retention, tested in test_log_checkpoint_written_and_equivalent).
    """
    from daas_apps_spark.sources.table_format import VersionedTable

    path = scratch_dir("a25_table_format")
    vt = VersionedTable(spark, path)
    o = table(spark, sf_dir, "orders")
    vt.append(o.withColumn("batch_id", F.lit(1)))
    updates = (
        o.filter(F.col("o_orderstatus") == "F")
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("batch_id", F.lit(2))
    )
    vt.merge(updates, ["o_orderkey"])

    def census(df: DataFrame, version: int) -> DataFrame:
        return (
            df.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                dsum("o_totalprice").alias("revenue"),
                F.max("batch_id").cast("int").alias("batch_id"),
            )
            .select(F.lit(version).alias("version"), "*")
        )

    return census(vt.read(version=1), 1).unionByName(census(vt.read(), 2))


@register(
    "a25_temporal_prune",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY o_orderpriority
    """,
    tags=("A25", "A14", "B2"),
)
def a25_temporal_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-keyed manifest pruning on the versioned table format: orders
    land as THREE commits split on o_orderdate (1995 / 1996 / 1997+ —
    the time-partitioned ingest every event table has), and
    the 1996 census reads with ``prune=("o_orderdate", ...)`` — the
    commit-recorded DATE [min, max] stats (normalized to ISO strings,
    lexicographic == chronological) exclude the other two commits' dirs
    from the scan ENTIRELY, before Spark lists a single file. The filter
    is still applied, so semantics equal the oracle's plain WHERE; the
    pruning only shrinks the scan — pinned structurally in
    tests/test_table_format.py::test_stats_prune_and_merge_on_date_keys
    and end-to-end here by the hash match.

    At 100 TB this is the access path for "last month over a ten-year
    table": manifest stats cut the scan to the intersecting commits at
    O(#dirs) driver cost, then parquet row-group pruning and predicate
    pushdown take over inside the survivors.
    """
    from daas_apps_spark.sources.table_format import VersionedTable

    path = scratch_dir("a25_temporal")
    vt = VersionedTable(spark, path)
    o = table(spark, sf_dir, "orders")
    for lo, hi in (
        ("1995-01-01", "1996-01-01"),
        ("1996-01-01", "1997-01-01"),
        ("1997-01-01", "2002-01-01"),
    ):
        vt.append(
            o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        )
    snap = vt.read(prune=("o_orderdate", "1996-01-01", "1996-12-31"))
    return (
        snap.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


@register(
    "a25_incremental_view",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F'
                              THEN o_totalprice * 2
                              ELSE o_totalprice END
                    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderdate < DATE '1998-01-01'
    GROUP BY o_orderpriority
    """,
    tags=("A25", "D1", "G5"),
)
def a25_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance over the change feed: a grouped
    count+sum aggregate is advanced from its version-1 state to the
    table head by the IVM algebra (insert +1 / delete −1 signed deltas,
    ``maintain_additive_aggregate``) — the table meanwhile takes an
    append (1997 orders) AND a merge (F-status prices doubled, which
    the feed surfaces as delete+insert pairs). The oracle recomputes
    the FINAL state directly from orders, so the hash match proves the
    incremental path lands exactly where the full recompute does —
    updates included, not just appends.

    At 100 TB this is the materialized-view refresh pattern: the nightly
    delta is read off the manifest (or a snapshot diff priced by the
    smaller side when a rewrite intervened), the maintained aggregate is
    |groups|-sized, and the base table is never rescanned. Sums ride the
    engine's exact-decimal discipline so +delta/−delta cancel
    bit-for-bit.
    """
    from daas_apps_spark.sources.table_format import (
        VersionedTable,
        maintain_additive_aggregate,
    )

    path = scratch_dir("a25_incr_view")
    vt = VersionedTable(spark, path)
    o = table(spark, sf_dir, "orders")
    vt.append(o.filter(F.col("o_orderdate") < "1997-01-01"))  # v1
    vt.append(
        o.filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
    )  # v2
    updates = (
        o.filter(
            (F.col("o_orderdate") < "1998-01-01")
            & (F.col("o_orderstatus") == "F")
        ).withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    vt.merge(updates, ["o_orderkey"])  # v3: feed shows delete+insert pairs
    view = maintain_additive_aggregate(
        vt,
        v_from=1,
        v_to=None,
        group_by=["o_orderpriority"],
        count_col="n_orders",
        sums={"rev_dec": "CAST(o_totalprice AS DECIMAL(18,4))"},
    )
    return view.select(
        "o_orderpriority",
        "n_orders",
        F.col("rev_dec").cast("double").alias("revenue"),
    )


@register(
    "a27_shallow_clone",
    oracle="""
    SELECT 'source' AS branch,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders
    UNION ALL
    SELECT 'clone',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
    FROM orders
    WHERE o_orderdate < DATE '1996-01-01'
       OR o_orderdate >= DATE '1997-01-01'
    """,
    tags=("A27", "A25", "G6"),
)
def a27_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE divergence (table_format.py::clone_to): orders land
    in the source as two commits (pre-1996 = v1, the rest = v2); the
    clone forks at v1 — zero bytes copied, every live file HARD-LINKED,
    stats carried from the source manifest — then takes its own append
    (the 1997+ slice). The two tables are then censused side by side:
    the source must still hold ALL orders (the clone's append is
    invisible to it) and the clone exactly pre-1996 + 1997+ (the
    source's v2 is invisible to it). Delta/Iceberg's CLONE/branching
    surface, with one upgrade: shared inodes survive a source VACUUM,
    so the fork cannot be broken by the parent's retention (pinned in
    tests/test_table_format.py::test_clone_survives_source_vacuum).

    At 100 TB this is the dev/staging-fork pattern: a full-table copy
    costs days of I/O; a manifest fork costs O(files) metadata ops and
    each branch pays only for the data it diverges by.
    """
    from daas_apps_spark.sources.table_format import VersionedTable

    src_path = scratch_dir("a27_clone_src")
    clone_path = scratch_dir("a27_clone_dst")
    vt = VersionedTable(spark, src_path)
    o = table(spark, sf_dir, "orders")
    vt.append(o.filter(F.col("o_orderdate") < "1996-01-01"))  # v1
    vt.append(o.filter(F.col("o_orderdate") >= "1996-01-01"))  # v2
    clone = vt.clone_to(clone_path, version=1)
    clone.append(o.filter(F.col("o_orderdate") >= "1997-01-01"))

    def census(t, branch: str) -> DataFrame:
        return t.read().agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        ).select(F.lit(branch).alias("branch"), "n_orders", "revenue")

    return census(vt, "source").unionAll(census(clone, "clone"))


@register(
    "a28_check_constraints",
    oracle="""
    SELECT 'price_positive' AS constraint_name,
           'o_totalprice > 0' AS expr,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
             WHERE o_orderkey % 97 = 0
               AND NOT (-o_totalprice > 0)) AS n_rejected
    UNION ALL
    SELECT 'date_floor',
           'o_orderdate >= DATE ''1990-01-01''',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
             WHERE o_orderkey % 97 = 0
               AND NOT (o_orderdate >= DATE '1990-01-01'))
    """,
    tags=("A28", "A25", "DQ4"),
)
def a28_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK constraints enforced AT THE WRITE (table_format.py::
    add_constraint / _validate — Delta's ALTER TABLE ADD CONSTRAINT +
    write invariants): two constraints go on an empty table, the full
    orders batch passes them, then a poisoned batch (every 97th key
    with its price negated) is REJECTED whole — the table keeps exactly
    the valid rows, proven by censusing it after the failed write. The
    output reports, per constraint, the table's row count and how many
    rows of the poisoned batch violated it (price_positive: all of
    them; date_floor: none — but the batch fails atomically on ANY
    violation). SQL CHECK semantics: NULL passes, only FALSE rejects.

    DQ4 audits constraint violations after the fact; A28 is the other
    discipline — stop them at the boundary, where one column-pruned
    pass over the incoming batch (not the 100 TB table) pays for the
    guarantee every downstream reader then inherits.
    """
    from daas_apps_spark.sources.table_format import (
        ConstraintViolationError,
        VersionedTable,
    )

    path = scratch_dir("a28_constraints")
    vt = VersionedTable(spark, path)
    vt.add_constraint("price_positive", "o_totalprice > 0")
    vt.add_constraint("date_floor", "o_orderdate >= DATE '1990-01-01'")
    o = table(spark, sf_dir, "orders")
    vt.append(o)  # valid: commits
    bad = o.filter(F.col("o_orderkey") % 97 == 0).withColumn(
        "o_totalprice", -F.col("o_totalprice")
    )
    try:
        vt.append(bad)
        raise RuntimeError("constraint violation did not reject the batch")
    except ConstraintViolationError:
        pass
    total = vt.read().agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    out = None
    for name, expr in vt.constraints().items():
        rejected = bad.agg(
            F.sum(
                F.when(~F.coalesce(F.expr(expr), F.lit(True)), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_rejected")
        )
        row = total.crossJoin(rejected).select(
            F.lit(name).alias("constraint_name"),
            F.lit(expr).alias("expr"),
            "n_rows",
            "n_rejected",
        )
        out = row if out is None else out.unionAll(row)
    return out


@register(
    "a29_deletion_vectors",
    oracle="""
    SELECT CAST(1 AS INTEGER) AS version, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT CAST(3 AS INTEGER), o_orderstatus,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
    FROM orders
    WHERE NOT (o_orderpriority = '1-URGENT')
      AND NOT (o_orderstatus = 'F' AND o_orderpriority = '2-HIGH')
    GROUP BY o_orderstatus
    """,
    tags=("A29", "A25", "B2"),
)
def a29_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE via deletion vectors (table_format.py::
    delete(mode="mor")): orders land as commit v1, then TWO overlapping
    predicate deletes run as MOR commits — each records a tiny parquet
    of (file basename, row position) pairs under ``_dv/`` and touches
    ZERO data files (asserted structurally below). The head census must
    equal the oracle's double-WHERE recompute (vectors compose without
    double-counting: the second delete's matching scan is itself
    DV-applied), and the time-traveled v1 census must still see every
    row — vectors are versioned table state, not mutations.

    At 100 TB this is the delete path that makes GDPR-style point
    deletes affordable: COW rewrites a gigabyte file to drop three rows;
    a vector writes kilobytes, and reads pay one broadcast anti-join on
    (file, position) until OPTIMIZE purges physically. Delta's deletion
    vectors / Iceberg's position deletes, reduced to a manifest entry
    plus ``_metadata.row_index``.
    """
    import os as _os

    from daas_apps_spark.sources.table_format import VersionedTable

    path = scratch_dir("a29_dv")
    vt = VersionedTable(spark, path)
    o = table(spark, sf_dir, "orders")
    vt.append(o)  # v1
    data_root = _os.path.join(path, "data")
    dirs_before = sorted(_os.listdir(data_root))
    vt.delete("o_orderpriority = '1-URGENT'", mode="mor")  # v2
    vt.delete(
        "o_orderstatus = 'F' AND o_orderpriority IN ('1-URGENT', '2-HIGH')",
        mode="mor",
    )  # v3 — overlaps v2's range; only the NEW positions are recorded
    assert sorted(_os.listdir(data_root)) == dirs_before, (
        "merge-on-read delete must not add or rewrite data dirs"
    )

    def census(df: DataFrame, version: int) -> DataFrame:
        return (
            df.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                dsum("o_totalprice").alias("revenue"),
            )
            .select(F.lit(version).alias("version"), "*")
        )

    return census(vt.read(version=1), 1).unionByName(census(vt.read(), 3))


@register(
    "a30_mor_update",
    oracle="""
    SELECT CAST(1 AS INTEGER) AS version, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT CAST(2 AS INTEGER), o_orderpriority,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F'
                              THEN o_totalprice * 2
                              ELSE o_totalprice END
                    AS DECIMAL(18,4))) AS DOUBLE)
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("A30", "A29", "A25"),
)
def a30_mor_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE (table_format.py::update(mode="mor")): orders
    land as commit v1, then ``UPDATE ... SET o_totalprice = o_totalprice
    * 2 WHERE o_orderstatus = 'F'`` runs as ONE commit pairing a deletion
    vector (the old rows' positions) with one new data dir (the updated
    rows) — no existing file rewritten, and readers see old-rows-out /
    new-rows-in atomically because both land in the same commit. The
    head census must match the oracle's CASE WHEN recompute; the
    time-traveled v1 census must still see the original prices (row
    counts equal across versions — UPDATE never changes cardinality).

    This completes the DML triple (MERGE upsert / DELETE / UPDATE) on
    the versioned table. At 100 TB the MOR form is the only affordable
    wide-predicate update: COW rewrites every touched file; this writes
    |matched| rows plus a kilobyte vector, and OPTIMIZE later folds the
    update into the base files off the hot path.
    """
    from daas_apps_spark.sources.table_format import VersionedTable

    path = scratch_dir("a30_mor_update")
    vt = VersionedTable(spark, path)
    o = table(spark, sf_dir, "orders")
    vt.append(o)  # v1
    vt.update(
        "o_orderstatus = 'F'",
        {"o_totalprice": "o_totalprice * 2"},
        mode="mor",
    )  # v2: one deletion vector + one dir of updated rows

    def census(df: DataFrame, version: int) -> DataFrame:
        return (
            df.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                dsum("o_totalprice").alias("revenue"),
            )
            .select(F.lit(version).alias("version"), "*")
        )

    return census(vt.read(version=1), 1).unionByName(census(vt.read(), 2))


@register(
    "a31_mor_feed_ivm",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F'
                              THEN o_totalprice * 2
                              ELSE o_totalprice END
                    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderpriority <> '1-URGENT'
    GROUP BY o_orderpriority
    """,
    tags=("A31", "A29", "A30", "A25"),
)
def a31_mor_feed_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance over MERGE-ON-READ commits via the
    change feed's MOR delta fast path: orders land as v1, a MOR DELETE
    drops every 1-URGENT row (that whole group must VANISH from the
    maintained view — its count telescopes to zero), and a MOR UPDATE
    doubles F-status prices; the grouped count+sum view is then advanced
    from its v1 state by ``maintain_additive_aggregate``. The feed range
    contains only vector commits, so the delta is resolved from the
    MANIFEST — deletes read ONLY the vector-referenced files and
    semi-join the positions; no snapshot diff, cost ∝ |delta| — and the
    oracle recomputes the final state directly, so the hash match proves
    the fast path is exactly diff-equivalent.

    At 100 TB this is the nightly-refresh shape after a compliance
    sweep: the view advances at the price of the deleted/updated rows,
    while the COW alternative would rewrite files AND diff snapshots.
    """
    from daas_apps_spark.sources.table_format import (
        VersionedTable,
        maintain_additive_aggregate,
    )

    path = scratch_dir("a31_mor_ivm")
    vt = VersionedTable(spark, path)
    o = table(spark, sf_dir, "orders")
    vt.append(o)  # v1
    vt.delete("o_orderpriority = '1-URGENT'", mode="mor")  # v2
    vt.update(
        "o_orderstatus = 'F'",
        {"o_totalprice": "o_totalprice * 2"},
        mode="mor",
    )  # v3
    view = maintain_additive_aggregate(
        vt,
        v_from=1,
        v_to=None,
        group_by=["o_orderpriority"],
        count_col="n_orders",
        sums={"rev_dec": "CAST(o_totalprice AS DECIMAL(18,4))"},
    )
    return view.select(
        "o_orderpriority",
        "n_orders",
        F.col("rev_dec").cast("double").alias("revenue"),
    )


@register(
    "a32_restore_rollback",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_at_bad_version
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("A32", "A27", "A25"),
)
def a32_restore_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE as the operational rollback (table_format.py::restore):
    orders land as v1, a CORRUPTED batch (every price negated — the
    classic bad-upstream-load) overwrites as v2, and restore(1) rolls
    back as commit v3 — pure manifest arithmetic over dirs still on
    disk, zero bytes copied. The head census must equal the oracle's
    clean recompute, and the BAD version must remain time-travelable
    (its per-status row count is reported alongside — a log rewind
    would have destroyed the evidence an incident review needs).

    At 100 TB this is the five-second undo for a bad load: COW-copying
    the prior snapshot back would rewrite the table; restore writes one
    JSON commit.
    """
    from daas_apps_spark.sources.table_format import VersionedTable

    path = scratch_dir("a32_restore")
    vt = VersionedTable(spark, path)
    o = table(spark, sf_dir, "orders")
    vt.append(o)  # v1 — good
    vt.overwrite(o.withColumn("o_totalprice", -F.col("o_totalprice")))  # v2
    vt.restore(version=1)  # v3 — rollback, history intact
    good = vt.read().groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )
    bad = vt.read(version=2).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_at_bad_version")
    )
    return good.join(bad, "o_orderstatus").select(
        "o_orderstatus", "n_orders", "revenue", "n_at_bad_version"
    )


@register(
    "a33_column_mapping",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders
    ), extra AS (
        SELECT o_orderkey + 100000000 AS o_orderkey, o_orderstatus,
               o_totalprice * 2 AS price_usd
        FROM orders WHERE o_orderpriority = '1-URGENT'
    ), head AS (
        SELECT o_orderstatus, o_totalprice AS price_usd FROM base
        UNION ALL
        SELECT o_orderstatus, price_usd FROM extra
    )
    SELECT 'head:' || o_orderstatus AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(price_usd AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM head GROUP BY 1
    UNION ALL
    SELECT 'v1:' || o_orderstatus,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
    FROM base GROUP BY 1
    """,
    tags=("A33", "A25"),
)
def a33_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column mapping: RENAME + DROP as METADATA-ONLY commits
    (table_format.py::rename_column/drop_column — Delta's column
    mapping / Iceberg field-id resolution). orders lands as v1;
    ``o_totalprice`` is renamed to ``price_usd`` (v2) and ``o_custkey``
    dropped (v3) — zero data files rewritten, one JSON commit each; a
    post-rename batch (urgent orders, doubled price, shifted keys) is
    appended UNDER THE NEW LOGICAL NAME (v4) and lands with the
    immutable physical name, keeping files homogeneous. The head census
    groups by status over ``price_usd`` spanning pre- and post-rename
    files; the v1 time-travel census proves the OLD name still resolves
    before the rename (the mapping is versioned state).

    At 100 TB the claim is the commit cost: renaming a column on a
    10k-file table writes one JSON object, not 100 TB of parquet; old
    readers refuse via the ``column-mapping`` reader feature instead of
    mis-projecting physical names.
    """
    from daas_apps_spark.sources.table_format import VersionedTable

    # pid-scoped like a25_mor_sweep: a concurrent session (parallel
    # plan lint) must never observe this table mid-mutation
    path = scratch_dir(f"a33_colmap_{os.getpid()}")
    vt = VersionedTable(spark, path)
    o = table(spark, sf_dir, "orders")
    vt.append(
        o.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )  # v1
    vt.rename_column("o_totalprice", "price_usd")  # v2: metadata only
    vt.drop_column("o_custkey")  # v3: metadata only
    vt.append(
        o.filter(F.col("o_orderpriority") == "1-URGENT").select(
            (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
            "o_orderstatus",
            (F.col("o_totalprice") * 2).alias("price_usd"),
        )
    )  # v4: new logical schema
    head = vt.read().groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("price_usd").alias("revenue"),
    ).select(
        F.concat(F.lit("head:"), F.col("o_orderstatus")).alias("grp"),
        "n_rows",
        F.col("revenue").cast("double").alias("revenue"),
    )
    v1 = vt.read(version=1).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice").alias("revenue"),
    ).select(
        F.concat(F.lit("v1:"), F.col("o_orderstatus")).alias("grp"),
        "n_rows",
        F.col("revenue").cast("double").alias("revenue"),
    )
    return head.unionByName(v1)


@register(
    "a34_partition_evolution",
    oracle="""
    SELECT 'census:' || o_orderstatus AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
    UNION ALL
    SELECT 'prune:window',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
    FROM orders WHERE o_custkey BETWEEN 100 AND 500
    """,
    tags=("A34", "A25", "A13"),
)
def a34_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition evolution (table_format.py::set_layout — Iceberg's
    partition-spec evolution / Delta clustered tables): even orders
    land UNCLUSTERED (v1), the layout is re-declared to cluster by
    ``o_custkey`` as a METADATA commit (v2), and the odd half lands
    range-clustered under the new spec (v3) — old dirs untouched and
    still readable, so the head census spans both eras as one table.
    The second leg aggregates a customer-key window through
    ``read(prune=...)``: manifest file-skipping on the NEW axis over
    the mixed-era snapshot (era-2 files prune tightly, era-1 files are
    kept conservatively), hash-checked against the oracle's plain
    WHERE.

    At 100 TB: re-layout on a new key is one JSON commit now and
    per-write clustering from then on — never a stop-the-world table
    rewrite; the old era re-clusters organically at the next OPTIMIZE.
    """
    from daas_apps_spark.sources.table_format import VersionedTable

    path = scratch_dir(f"a34_layout_{os.getpid()}")
    vt = VersionedTable(spark, path)
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    vt.append(o.filter(F.col("o_orderkey") % 2 == 0))  # v1: old era
    vt.set_layout(["o_custkey"], target_files=8)  # v2: metadata only
    vt.append(o.filter(F.col("o_orderkey") % 2 == 1))  # v3: clustered
    census = vt.read().groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice").alias("revenue"),
    ).select(
        F.concat(F.lit("census:"), F.col("o_orderstatus")).alias("grp"),
        "n_rows",
        F.col("revenue").cast("double").alias("revenue"),
    )
    pruned = (
        vt.read(prune=("o_custkey", 100, 500))
        .filter(F.col("o_custkey").between(100, 500))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("o_totalprice").alias("revenue"),
        )
        .select(
            F.lit("prune:window").alias("grp"),
            "n_rows",
            F.col("revenue").cast("double").alias("revenue"),
        )
    )
    return census.unionByName(pruned)


@register(
    "a35_manifest_census",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM orders
                 WHERE o_orderkey NOT BETWEEN 1000 AND 2000) AS BIGINT)
               AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS v1_min,
           CAST(MAX(o_orderkey) AS BIGINT) AS v1_max,
           CAST((SELECT MIN(o_orderkey) FROM orders
                 WHERE o_orderkey NOT BETWEEN 1000 AND 2000) AS BIGINT)
               AS head_min,
           CAST((SELECT MAX(o_orderkey) FROM orders
                 WHERE o_orderkey NOT BETWEEN 1000 AND 2000) AS BIGINT)
               AS head_max
    FROM orders
    """,
    tags=("A35", "A25", "A14"),
)
def a35_manifest_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-only aggregates (table_format.py::manifest_count /
    manifest_min_max): COUNT(*) and MIN/MAX answered from the commit
    log + checkpoint (+ parquet manifest sidecar) with ZERO data-file
    opens — the A14 footer-aggregate-pushdown idea applied to the
    versioned table's own manifest. orders lands as v1; a MOR delete
    hides the interior key band [1000, 2000] as a deletion vector (v2).
    ``n_rows`` is the DV-subtracted head count (each live (file, pos)
    pair hides exactly one row); ``v1_min``/``v1_max`` time-travel the
    pre-delete snapshot (provably exact: no vectors at v1); OPTIMIZE
    then purges the vectors so ``head_min``/``head_max`` are provable
    at head. Inexact cases REFUSE loudly (tests/test_table_format.py::
    test_manifest_min_max_refuses_when_inexact) instead of guessing.

    At 100 TB: "how many rows is this table" costs one manifest read,
    not a 1000-executor scan — the same per-interval record accounting
    the reference tracks per scatter bin (SparkCaller.java:79-126,
    BinPartitioner.java:8-27), lifted to manifest arithmetic.
    """
    from daas_apps_spark.sources.table_format import VersionedTable

    path = scratch_dir(f"a35_census_{os.getpid()}")
    vt = VersionedTable(spark, path)
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    vt.append(o)  # v1
    vt.delete("o_orderkey between 1000 and 2000", mode="mor")  # v2: DV
    n_rows = vt.manifest_count()
    v1_min, v1_max = vt.manifest_min_max("o_orderkey", version=1)
    vt.optimize()  # purge the vectors -> head extremes provable again
    head_min, head_max = vt.manifest_min_max("o_orderkey")
    return spark.createDataFrame(
        [(n_rows, v1_min, v1_max, head_min, head_max)],
        "n_rows long, v1_min long, v1_max long, head_min long, "
        "head_max long",
    )


@register(
    "a36_type_widening",
    oracle="""
    WITH era1 AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
    ), era2 AS (
        SELECT o_orderkey + 4000000000 AS o_orderkey, o_totalprice
        FROM orders WHERE o_orderkey % 2 = 1
    ), t AS (
        SELECT * FROM era1 UNION ALL SELECT * FROM era2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue
    FROM t
    """,
    tags=("A36", "A25", "A12"),
)
def a36_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type widening (table_format.py::widen_column — Delta's type
    widening; the third leg of the evolution triad after add=a12 and
    rename/drop=a33): the even orders land with ``o_orderkey`` as
    INT32 (v1), the column is widened to BIGINT in ONE metadata commit
    (v2 — zero files rewritten), and the odd half lands with keys
    shifted past the int32 ceiling (v3) — exactly the overflow that
    forces the widen in production. The census aggregates ACROSS both
    eras through one scan: old files upcast via the explicit widened
    schema (Spark's parquet reader promotes int32→int64 natively), new
    files store int64 physically (write-funnel cast). Old readers and
    writers refuse via the ``type-widening`` feature; time travel at
    v1 still reads INT (tests/test_table_format.py::
    test_type_widening_is_metadata_only_and_reads_mixed_eras).

    At 100 TB: the first overflowing id costs one JSON commit, never a
    stop-the-world rewrite; bytes converge to int64 organically at the
    next OPTIMIZE.
    """
    from daas_apps_spark.sources.table_format import VersionedTable

    path = scratch_dir(f"a36_widen_{os.getpid()}")
    vt = VersionedTable(spark, path)
    o = table(spark, sf_dir, "orders")
    vt.append(
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            F.col("o_orderkey").cast("int").alias("o_orderkey"),
            "o_totalprice",
        )
    )  # v1: narrow era
    vt.widen_column("o_orderkey", "bigint")  # v2: metadata only
    vt.append(
        o.filter(F.col("o_orderkey") % 2 == 1).select(
            (F.col("o_orderkey") + F.lit(4_000_000_000)).alias(
                "o_orderkey"
            ),
            "o_totalprice",
        )
    )  # v3: wide era (keys past the int32 ceiling)
    return (
        vt.read()
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            dsum("o_totalprice").alias("revenue"),
        )
        .select(
            "n_rows",
            "min_key",
            "max_key",
            F.col("revenue").cast("double").alias("revenue"),
        )
    )


@register(
    "a37_sql_dml",
    oracle="""
    WITH m AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderpriority = '1-URGENT'
                    THEN o_totalprice * 2 ELSE o_totalprice END AS p
        FROM orders
    ), u AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderstatus = 'F' THEN p + 1 ELSE p END AS p
        FROM m
    ), d AS (
        SELECT * FROM u WHERE o_orderkey NOT BETWEEN 100 AND 199
    )
    SELECT 'head:' || o_orderstatus AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(p AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM d GROUP BY 1
    UNION ALL
    SELECT 'v1:' || o_orderstatus,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
    FROM orders GROUP BY 1
    """,
    tags=("A37", "A25", "A30"),
)
def a37_sql_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL DML front-end (sources/sql_dml.py::run_sql): the whole
    lakehouse lifecycle driven by DML TEXT instead of Python calls —
    the reference's "the Properties file IS the plan" idea
    (MiscUtils.java:44-64) applied to the four statements every
    Delta/Iceberg operator types daily. orders lands as v1; a
    ``MERGE INTO ... USING (subquery)`` doubles urgent orders' prices
    (v2, file-level COW upsert); ``UPDATE ... SET ... WHERE`` adds 1 to
    finished orders (v3); ``DELETE FROM ... WHERE`` drops a key band
    (v4); and the returned census is TWO ``SELECT``s — the head state
    and a ``VERSION AS OF 1`` time travel — both run through the same
    translator. Translation is commit-for-commit identical to the
    Python API (tests/test_sql_dml.py parity suite); unsupported
    shapes refuse loudly rather than guess.
    """
    from daas_apps_spark.sources.sql_dml import run_sql
    from daas_apps_spark.sources.table_format import VersionedTable

    path = scratch_dir(f"a37_dml_{os.getpid()}")
    vt = VersionedTable(spark, path)
    o = table(spark, sf_dir, "orders")
    vt.append(
        o.select("o_orderkey", "o_orderstatus", "o_totalprice")
    )  # v1
    o.createOrReplaceTempView("a37_orders_src")
    t = {"t": vt}
    run_sql(
        spark,
        "MERGE INTO t USING (SELECT o_orderkey, o_orderstatus, "
        "o_totalprice * 2 AS o_totalprice FROM a37_orders_src "
        "WHERE o_orderpriority = '1-URGENT') AS s "
        "ON t.o_orderkey = s.o_orderkey "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        t,
    )  # v2
    run_sql(
        spark,
        "UPDATE t SET o_totalprice = o_totalprice + 1 "
        "WHERE o_orderstatus = 'F'",
        t,
    )  # v3
    run_sql(spark, "DELETE FROM t WHERE o_orderkey BETWEEN 100 AND 199", t)
    head = run_sql(
        spark,
        "SELECT 'head:' || o_orderstatus AS grp, count(*) AS n_rows, "
        "CAST(sum(CAST(o_totalprice AS decimal(18,4))) AS double) "
        "AS revenue FROM t GROUP BY o_orderstatus",
        t,
    )
    v1 = run_sql(
        spark,
        "SELECT 'v1:' || o_orderstatus AS grp, count(*) AS n_rows, "
        "CAST(sum(CAST(o_totalprice AS decimal(18,4))) AS double) "
        "AS revenue FROM t VERSION AS OF 1 GROUP BY o_orderstatus",
        t,
    )
    return head.unionByName(v1)


@register(
    "a38_multi_table_txn",
    oracle="""
    SELECT o_orderstatus AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue
    FROM orders GROUP BY 1
    """,
    tags=("A38", "A25", "I9"),
)
def a38_multi_table_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table ATOMIC commit (table_format.py::MultiTableTxn —
    presumed-abort 2PC with one coordinator marker file; the
    catalog-level multi-table atomicity Iceberg's REST catalog
    provides). The even orders stage into table A and the odd orders
    into table B under ONE transaction — invisible on both until the
    coordinator's single committed marker flips them visible together
    (the mid-stage census below MUST see zero rows). A second
    transaction stages a duplicate batch into both tables and ABORTS:
    its slots are consumed but its rows are permanently invisible, so
    the final A∪B census equals plain ``orders`` exactly — any
    half-applied or resurrected-after-abort row breaks the hash. The
    streaming CDC fan-out builds on this (live.py::
    run_cdf_fanout_atomic, crash-injection tested): both destinations
    of a micro-batch become visible together or not at all.
    """
    from daas_apps_spark.sources.table_format import (
        MultiTableTxn,
        VersionedTable,
    )

    base = scratch_dir(f"a38_txn_{os.getpid()}")
    va = VersionedTable(spark, os.path.join(base, "a"))
    vb = VersionedTable(spark, os.path.join(base, "b"))
    coord = MultiTableTxn(os.path.join(base, "coord"))
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    txn = coord.begin()
    va.append(o.filter(F.col("o_orderkey") % 2 == 0), txn=txn)
    # BETWEEN the staged commits: a reader of A must see NOTHING —
    # the atomicity claim, asserted in-line (slot exists, zero state)
    assert va.latest_version() == 1
    try:
        va.read()
        raise AssertionError("staged txn state leaked before commit")
    except ValueError:
        pass  # no visible snapshot: correct
    vb.append(o.filter(F.col("o_orderkey") % 2 == 1), txn=txn)
    coord.commit(txn)  # both flip visible together
    dead = coord.begin()  # a second txn stages duplicates... and dies
    va.append(o.limit(100), txn=dead)
    vb.append(o.limit(50), txn=dead)
    coord.abort(dead)  # consumed slots, permanently invisible
    return (
        va.read()
        .unionByName(vb.read())
        .groupBy(F.col("o_orderstatus").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("o_totalprice").alias("revenue"),
        )
        .select(
            "grp",
            "n_rows",
            F.col("revenue").cast("double").alias("revenue"),
        )
    )


@register(
    "a39_snapshot_isolation",
    oracle="""
    SELECT o_orderstatus AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue
    FROM orders
    WHERE NOT (o_totalprice < 50000)
    GROUP BY 1
    """,
    tags=("A39", "A25"),
)
def a39_snapshot_isolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-isolation conflict detection (table_format.py::
    _check_snapshot_conflict — Delta's conflict-resolution matrix).
    The CAS commit alone only catches two writers racing for the SAME
    version; here a concurrent append lands BETWEEN a COW DELETE's plan
    and its commit, so the delete would mint the next version number
    with a plan that never saw the new rows — the classic lost update
    (the raced-in rows would silently survive the predicate). The
    commit detects that its read snapshot went stale, raises a
    retriable conflict, and ``retry_on_conflict`` replans: the final
    state is exactly "append, then delete" — serialized — which the
    oracle recomputes as one WHERE over all of ``orders``. The query
    asserts the interleaving really happened (exactly one injected
    race, exactly two delete attempts); a silently-lost update would
    also break the hash, since half the orders would dodge the delete.

    At 100 TB this is what makes multi-writer ingest safe: blind
    appends rebase lock-free, compactions rebase past disjoint ingest,
    and every read-write plan that a concurrent commit invalidated
    replans instead of corrupting (tests/test_concurrency.py pins the
    full matrix).
    """
    from daas_apps_spark.sources.table_format import (
        VersionedTable,
        retry_on_conflict,
    )

    path = scratch_dir(f"a39_si_{os.getpid()}")
    writer1 = VersionedTable(spark, path)
    writer2 = VersionedTable(spark, path)
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    writer1.append(o.filter(F.col("o_orderkey") % 2 == 0))  # v1
    odd = o.filter(F.col("o_orderkey") % 2 == 1)
    orig = writer1._write_data_dir
    fired = {"n": 0}

    def interleaved(df, vhint):
        # one-shot: writer2's append lands AFTER writer1's delete read
        # the log, BEFORE its commit — the race the CAS cannot see
        if not fired["n"]:
            fired["n"] = 1
            writer2.append(odd)  # v2
        return orig(df, vhint)

    writer1._write_data_dir = interleaved
    attempts = {"n": 0}

    def op():
        attempts["n"] += 1
        return writer1.delete("o_totalprice < 50000")

    retry_on_conflict(op)
    if fired["n"] != 1 or attempts["n"] != 2:
        raise AssertionError(
            f"interleaving did not happen as designed: fired={fired['n']} "
            f"attempts={attempts['n']} (expected 1 and 2)"
        )
    return (
        writer1.read()
        .groupBy(F.col("o_orderstatus").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("o_totalprice").alias("revenue"),
        )
        .select(
            "grp",
            "n_rows",
            F.col("revenue").cast("double").alias("revenue"),
        )
    )


@register(
    "a40_generated_columns",
    oracle="""
    SELECT substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS o_month,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue
    FROM orders
    GROUP BY 1
    """,
    tags=("A40", "A25", "A34"),
)
def a40_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated columns (table_format.py::set_generated_column — Delta's
    GENERATED ALWAYS AS): ``o_month`` is declared as
    ``substring(cast(o_orderdate as string), 1, 7)`` on the empty table;
    the even orders then land WITHOUT the column (the write funnel
    computes it) and the odd orders land WITH it precomputed (the write
    validates null-safe equality and would refuse a mismatch — pinned by
    test). The census groups by the stored column; the oracle recomputes
    the expression from scratch, so any silently-skipped computation or
    unvalidated drift breaks the hash.

    At 100 TB this is the partition-column pattern: declare
    ``day = date(ts)`` generated + ``set_layout(["day"])`` and every
    file carries tight manifest stats on the derived axis — predicates
    on the generated column prune files with zero expression rewriting
    (tests/test_table_format.py::
    test_generated_column_prunes_as_clustering_axis).
    """
    from daas_apps_spark.sources.table_format import VersionedTable

    path = scratch_dir(f"a40_gen_{os.getpid()}")
    vt = VersionedTable(spark, path)
    vt.set_generated_column(
        "o_month", "substring(cast(o_orderdate as string), 1, 7)"
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    vt.append(o.filter(F.col("o_orderkey") % 2 == 0))  # computed
    vt.append(
        o.filter(F.col("o_orderkey") % 2 == 1).withColumn(
            "o_month", F.date_format("o_orderdate", "yyyy-MM")
        )
    )  # provided — validated against the expression at the write
    return (
        vt.read()
        .groupBy("o_month")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("o_totalprice").alias("revenue"),
        )
        .select(
            "o_month",
            "n_rows",
            F.col("revenue").cast("double").alias("revenue"),
        )
    )


@register(
    "a41_identity_columns",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_ids,
           CAST(1 AS BIGINT) AS ids_at_or_above_start,
           CAST(1 AS BIGINT) AS batches_monotone
    FROM orders
    """,
    tags=("A41", "A25", "A39"),
)
def a41_identity_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identity columns (table_format.py::set_identity_column — Delta's
    GENERATED ALWAYS AS IDENTITY): ``rid`` is engine-assigned as a pure
    per-row JVM expression over the batch watermark (no shuffle, no
    driver loop, gaps allowed — Delta's documented contract), and each
    commit records the high watermark harvested from the WRITTEN files'
    footers, so the next batch allocates strictly past it. The orders
    land in two appends; the oracle states the INVARIANTS the values
    must satisfy as constants — every row got an id
    (n_distinct_ids == n_rows proves uniqueness across batches), no id
    is below START WITH, and batch 2's lowest id clears batch 1's
    recorded high (monotone watermark). Engine-assigned values are
    partition-dependent, so the invariants — not the raw ids — are the
    deterministic surface.

    Two writers allocating from one watermark would collide; identity
    allocation therefore disqualifies the blind-append rebase in the
    A39 conflict matrix (tests/test_concurrency.py::
    test_identity_allocation_conflicts_between_concurrent_appends).
    """
    from daas_apps_spark.sources.table_format import VersionedTable

    path = scratch_dir(f"a41_id_{os.getpid()}")
    vt = VersionedTable(spark, path)
    vt.set_identity_column("rid", start=1000, step=1)
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    vt.append(o.filter(F.col("o_orderkey") % 2 == 0))  # batch 1
    high1 = vt.identity_columns()["rid"]["high"]
    vt.append(o.filter(F.col("o_orderkey") % 2 == 1))  # batch 2
    batch2_min = (
        vt.changes_between(2, 3).agg(F.min("rid")).first()[0]
    )
    return vt.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("rid").alias("n_distinct_ids"),
        F.min(F.col("rid") >= 1000)
        .cast("long")
        .alias("ids_at_or_above_start"),
        F.lit(1 if batch2_min > high1 else 0)
        .cast("long")
        .alias("batches_monotone"),
    )


@register(
    "a42_bloom_index",
    oracle="""
    WITH probe AS (
        SELECT o_custkey FROM orders
        GROUP BY o_custkey
        ORDER BY COUNT(*), o_custkey LIMIT 1
    )
    SELECT CAST(o.o_custkey AS BIGINT) AS o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue
    FROM orders o, probe p
    WHERE o.o_custkey = p.o_custkey
    GROUP BY 1
    """,
    tags=("A42", "A25", "A18"),
)
def a42_bloom_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter file skipping (table_format.py::set_bloom_columns —
    Delta's bloom filter index as manifest-adjacent sidecars): orders
    land in four hash-sliced batches, so every file's [min, max] range
    on ``o_clerk`` spans nearly the whole clerk space — min/max stats
    cannot prune a POINT probe. Each write built one small parquet
    sidecar of per-file bitmaps (one extra column-pruned pass, the
    writer-side price Delta also pays); the equality prune consults
    them and drops every file whose bitmap proves the clerk absent.
    The query asserts the scan actually shrank (fewer input files than
    the full read) and hash-checks the probed customer's census against
    DuckDB's full-scan recompute — a false positive only widens the
    scan; a false negative would lose rows and break the hash.

    At 100 TB this is the needle lookup: find one customer/document id
    in an unsorted corpus by opening only the files that might hold it.
    """
    from daas_apps_spark.sources.table_format import VersionedTable

    path = scratch_dir(f"a42_bloom_{os.getpid()}")
    vt = VersionedTable(spark, path)
    vt.set_bloom_columns(["o_custkey"])
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    for i in range(4):
        vt.append(
            o.filter(F.col("o_orderkey") % 4 == i).coalesce(1)
        )
    # the RAREST customer (fewest orders, tie-broken by key): its rows
    # span the fewest slices, so at least one slice's bloom must prove
    # it absent (a busy customer could legitimately span every file)
    probe = (
        vt.read()
        .groupBy("o_custkey")
        .count()
        .orderBy("count", "o_custkey")
        .first()
        .o_custkey
    )
    pruned = vt.read(prune=("o_custkey", probe, probe))
    if not len(pruned.inputFiles()) < len(vt.read().inputFiles()):
        raise AssertionError(
            "bloom index failed to shrink the point-probe scan"
        )
    return (
        pruned.filter(F.col("o_custkey") == probe)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("o_totalprice").alias("revenue"),
        )
        .select(
            "o_custkey",
            "n_rows",
            F.col("revenue").cast("double").alias("revenue"),
        )
    )


@register(
    "a43_row_tracking",
    oracle="""
    WITH band1 AS (
        SELECT * FROM orders WHERE o_orderkey BETWEEN 100 AND 999
    ), band2 AS (
        SELECT * FROM orders WHERE o_orderkey BETWEEN 2000 AND 2999
    ), ins AS (
        SELECT * FROM orders WHERE o_orderkey <= 64
    )
    SELECT 'delete' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM band2
    UNION ALL
    SELECT 'insert',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
    FROM ins
    UNION ALL
    SELECT 'update_preimage',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
    FROM band1
    UNION ALL
    SELECT 'update_postimage',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(o_totalprice * 2 AS DECIMAL(18,4))) AS DOUBLE)
    FROM band1
    """,
    tags=("A43", "A25", "A41"),
)
def a43_row_tracking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row tracking (table_format.py::enable_row_tracking — Delta's row
    tracking): every row carries a hidden stable id assigned at first
    write and PRESERVED across COW rewrites (the id is internally an
    A41 identity column, so watermark, checkpoint fold, clone carry,
    and the A39 concurrent-allocation conflict are shared machinery).
    The change feed on a tracked table surfaces all FOUR Delta CDF
    change types: an id present on both sides of the snapshot diff IS
    an update, paired as update_preimage/update_postimage with no key
    declaration needed. The scenario: orders land (v2), one key band is
    COW-updated ×2 (v3 — the whole-table rewrite carries every
    surviving id), a second band is deleted (v4), and a shifted copy of
    the head keys is appended (v5); the feed over (v2, v5] must net to
    exactly the four change-type groups DuckDB recomputes from first
    principles. Any id lost in the rewrite would surface as a phantom
    insert+delete pair and break the hash.
    """
    from daas_apps_spark.sources.table_format import VersionedTable

    path = scratch_dir(f"a43_rt_{os.getpid()}")
    vt = VersionedTable(spark, path)
    vt.enable_row_tracking()  # v1
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    vt.append(o)  # v2
    vt.update(
        "o_orderkey between 100 and 999", {"o_totalprice": "o_totalprice * 2"}
    )  # v3: COW rewrite
    vt.delete("o_orderkey between 2000 and 2999")  # v4
    vt.append(
        o.filter(F.col("o_orderkey") <= 64).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
        )
    )  # v5: fresh rows
    return (
        vt.changes_between(2, 5)
        .groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("o_totalprice").alias("revenue"),
        )
        .select(
            "change_type",
            "n_rows",
            F.col("revenue").cast("double").alias("revenue"),
        )
    )


@register(
    "a44_conditional_merge",
    oracle="""
    WITH t AS (
        SELECT o_orderkey k, o_orderstatus st, o_totalprice pr,
               o_orderpriority up
        FROM orders WHERE o_orderkey % 3 <> 0
    ), s AS (
        SELECT o_orderkey k, o_totalprice * 2 pr, o_orderpriority up
        FROM orders WHERE o_orderkey % 2 = 0
    ), m AS (
        SELECT t.k, t.st, t.pr tpr, s.pr spr, s.up sup
        FROM t JOIN s ON t.k = s.k
    ), m_res AS (
        SELECT k, st,
               CASE WHEN sup = '1-URGENT' THEN spr + tpr ELSE tpr END AS pr
        FROM m WHERE sup = '1-URGENT' OR st <> 'F'
    ), t_only AS (
        SELECT k, st, pr FROM t WHERE k NOT IN (SELECT k FROM s)
    ), bs_res AS (
        SELECT k, st, CASE WHEN st = 'O' THEN 0 ELSE pr END AS pr
        FROM t_only WHERE st = 'O' OR st <> 'F'
    ), ins AS (
        SELECT k, 'N' AS st, pr FROM s
        WHERE k NOT IN (SELECT k FROM t) AND pr > 50000
    ), final AS (
        SELECT * FROM m_res
        UNION ALL SELECT * FROM bs_res
        UNION ALL SELECT * FROM ins
    )
    SELECT st AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(pr AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(MIN(k) AS BIGINT) AS min_key,
           CAST(MAX(k) AS BIGINT) AS max_key
    FROM final GROUP BY st
    """,
    tags=("A44", "A37", "A25", "A30"),
)
def a44_conditional_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional MERGE (table_format.py::merge_into + the sql_dml.py
    grammar) — the full ANSI/Delta clause set in ONE statement and ONE
    copy-on-write commit: WHEN MATCHED AND <cond> THEN UPDATE SET
    <partial assignments>, a second WHEN MATCHED THEN DELETE (first-
    match-in-order), WHEN NOT MATCHED AND <cond> THEN INSERT
    (cols) VALUES (exprs), and both NOT MATCHED BY SOURCE forms. The
    result is a single generated Catalyst plan: the bounded rewrite set
    full-outer-joins the source and every output column is a first-match
    CASE over the clause conditions — no per-clause passes, no Python in
    the row path. The DuckDB oracle recomputes the same five-clause
    semantics from first principles as compositional SQL; the grouped
    census (count / exact-decimal revenue / key extremes per status)
    breaks if any clause fires on the wrong rows, in the wrong order,
    or double-applies.

    Scale shape: BY SOURCE clauses force the full rewrite by necessity
    (unmatched target rows live anywhere); without them the rewrite set
    is file-stats-bounded exactly like merge() — a 1-row conditional
    merge rewrites one file at 100 TB (tests/test_merge_into.py pins
    both behaviors).
    """
    from daas_apps_spark.sources.sql_dml import run_sql
    from daas_apps_spark.sources.table_format import VersionedTable

    path = scratch_dir(f"a44_cmerge_{os.getpid()}")
    vt = VersionedTable(spark, path)
    o = table(spark, sf_dir, "orders")
    vt.append(
        o.filter(F.col("o_orderkey") % 3 != 0).select(
            "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
        )
    )  # v1
    o.createOrReplaceTempView("a44_orders_src")
    t = {"t": vt}
    run_sql(
        spark,
        "MERGE INTO t USING (SELECT o_orderkey, o_totalprice * 2 AS "
        "o_totalprice, o_orderpriority FROM a44_orders_src "
        "WHERE o_orderkey % 2 = 0) AS s "
        "ON t.o_orderkey = s.o_orderkey "
        "WHEN MATCHED AND s.o_orderpriority = '1-URGENT' THEN UPDATE SET "
        "o_totalprice = s.o_totalprice + t.o_totalprice "
        "WHEN MATCHED AND t.o_orderstatus = 'F' THEN DELETE "
        "WHEN NOT MATCHED AND s.o_totalprice > 50000 THEN INSERT "
        "(o_orderkey, o_orderstatus, o_totalprice, o_orderpriority) "
        "VALUES (s.o_orderkey, 'N', s.o_totalprice, s.o_orderpriority) "
        "WHEN NOT MATCHED BY SOURCE AND t.o_orderstatus = 'O' THEN "
        "UPDATE SET o_totalprice = 0 "
        "WHEN NOT MATCHED BY SOURCE AND t.o_orderstatus = 'F' THEN DELETE",
        t,
    )  # v2: one commit, five clauses
    return run_sql(
        spark,
        "SELECT o_orderstatus AS grp, count(*) AS n_rows, "
        "CAST(sum(CAST(o_totalprice AS decimal(18,4))) AS double) "
        "AS revenue, CAST(min(o_orderkey) AS bigint) AS min_key, "
        "CAST(max(o_orderkey) AS bigint) AS max_key "
        "FROM t GROUP BY o_orderstatus",
        t,
    )


@register(
    "a45_sql_catalog",
    oracle="""
    WITH u AS (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_orderpriority = '1-URGENT'
    ), final AS (
        SELECT o.o_orderstatus,
               CASE WHEN u.o_orderkey IS NOT NULL
                         AND o.o_orderstatus <> 'F'
                    THEN o.o_totalprice + u.o_totalprice
                    ELSE o.o_totalprice END AS pr,
               CASE WHEN u.o_orderkey IS NOT NULL
                         AND o.o_orderstatus = 'F'
                    THEN 1 ELSE 0 END AS del
        FROM orders o LEFT JOIN u ON o.o_orderkey = u.o_orderkey
    )
    SELECT 'head:' || o_orderstatus AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(pr AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM final WHERE del = 0 GROUP BY 1
    UNION ALL
    SELECT 'v2:' || o_orderstatus,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
    FROM orders GROUP BY 1
    """,
    tags=("A45", "A37", "A44", "A25"),
)
def a45_sql_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL catalog / named tables (sources/sql_catalog.py): the whole
    lakehouse lifecycle as a PURE-SQL session — zero Python table
    handles. A persistent name→path catalog (one atomic hard-link-
    claimed JSON entry per table, managed data under the catalog root)
    resolves every statement's names: CREATE TABLE (schema) commits an
    empty dir carrying the declared schema so the empty table is
    immediately a first-class target, INSERT INTO ... SELECT lands the
    orders (v2), CREATE TABLE ... AS SELECT materializes the urgent
    slice as a second managed table, a CONDITIONAL MERGE (A44 grammar)
    adds each urgent order's price onto its non-finished target row and
    deletes finished matches, DROP TABLE removes the staging table and
    its managed data, and the returned census is two SELECTs through
    the same session — head state and a VERSION AS OF 2 time travel.
    The DuckDB oracle recomputes both from first principles.
    """
    from daas_apps_spark.sources.sql_catalog import SqlSession

    base = scratch_dir(f"a45_catalog_{os.getpid()}")
    s = SqlSession(spark, base)
    table(spark, sf_dir, "orders").createOrReplaceTempView("a45_orders_src")
    s.sql(
        "CREATE TABLE ord (o_orderkey bigint, o_orderstatus string, "
        "o_totalprice double)"
    )  # v1: empty, declared schema
    s.sql(
        "INSERT INTO ord SELECT o_orderkey, o_orderstatus, o_totalprice "
        "FROM a45_orders_src"
    )  # v2
    s.sql(
        "CREATE TABLE urgent AS SELECT o_orderkey, o_totalprice "
        "FROM a45_orders_src WHERE o_orderpriority = '1-URGENT'"
    )
    s.sql(
        "MERGE INTO ord AS t USING urgent AS s "
        "ON t.o_orderkey = s.o_orderkey "
        "WHEN MATCHED AND t.o_orderstatus <> 'F' THEN UPDATE SET "
        "o_totalprice = t.o_totalprice + s.o_totalprice "
        "WHEN MATCHED THEN DELETE"
    )  # v3: conditional merge through catalog names
    s.sql("DROP TABLE urgent")
    head = s.sql(
        "SELECT 'head:' || o_orderstatus AS grp, count(*) AS n_rows, "
        "CAST(sum(CAST(o_totalprice AS decimal(18,4))) AS double) "
        "AS revenue FROM ord GROUP BY o_orderstatus"
    )
    v2 = s.sql(
        "SELECT 'v2:' || o_orderstatus AS grp, count(*) AS n_rows, "
        "CAST(sum(CAST(o_totalprice AS decimal(18,4))) AS double) "
        "AS revenue FROM ord VERSION AS OF 2 GROUP BY o_orderstatus"
    )
    return head.unionByName(v2)


@register(
    "a46_copy_into",
    oracle="""
    SELECT o_orderstatus AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue
    FROM orders GROUP BY 1
    """,
    tags=("A46", "A25", "A45"),
)
def a46_copy_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY INTO (table_format.py::copy_into + the SQL verb): idempotent
    batch file ingestion, exactly-once by file identity (absolute path +
    size + mtime_ns) recorded in commit metadata and folded into
    checkpoints. The orders table is split into a 4-file landing
    directory; COPY runs THREE times — the first ingests all four files
    in one append commit, the second is a provable no-op (0 loaded, 4
    skipped, no new commit), and after a VACUUM-style re-listing the
    third still skips. The returned census must equal plain ``orders``
    exactly: any re-ingested file doubles its slice and breaks the
    hash; the in-function assertions additionally pin the loaded/
    skipped counts and that the no-op minted NO version. Composes with
    K68: COPY is the file-level ingestion screen, the CDC anti-join the
    row-level one.

    At 100 TB this is the nightly-landing-zone shape: re-running a
    partially-observed load costs one directory listing plus the not-
    yet-loaded files — never a re-scan of what already landed, and a
    crash before the single commit records nothing (exactly-once with
    no completion logic; tests/test_copy_into.py crashes it mid-flight).
    """
    from daas_apps_spark.sources.sql_catalog import SqlSession

    base = scratch_dir(f"a46_copy_{os.getpid()}")
    landing = os.path.join(base, "landing")
    table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).repartition(4).write.parquet(landing)
    s = SqlSession(spark, os.path.join(base, "cat"))
    s.sql(
        "CREATE TABLE ord (o_orderkey bigint, o_orderstatus string, "
        "o_totalprice double)"
    )
    r1 = s.sql(f"COPY INTO ord FROM '{landing}'").first()
    v1 = s.sql("DESCRIBE HISTORY ord").count()
    r2 = s.sql(f"COPY INTO ord FROM '{landing}'").first()
    v2 = s.sql("DESCRIBE HISTORY ord").count()
    r3 = s.sql(f"COPY INTO ord FROM '{landing}' FILEFORMAT = PARQUET").first()
    if not (
        r1.num_loaded_files == 4
        and (r2.num_loaded_files, r2.num_skipped_files) == (0, 4)
        and (r3.num_loaded_files, r3.num_skipped_files) == (0, 4)
        and v1 == v2  # the no-op minted no version
    ):
        raise AssertionError(
            f"COPY INTO idempotence violated: {r1} / {r2} / {r3}, "
            f"history {v1} -> {v2}"
        )
    return s.sql(
        "SELECT o_orderstatus AS grp, count(*) AS n_rows, "
        "CAST(sum(CAST(o_totalprice AS decimal(18,4))) AS double) "
        "AS revenue FROM ord GROUP BY o_orderstatus"
    )


@register(
    "a47_sql_surface_r9",
    oracle="""
    WITH src AS (
        SELECT o_orderkey k, o_orderstatus st, o_totalprice pr FROM orders
    ), base AS (
        SELECT k, st,
               CASE WHEN k % 2 = 0 AND pr > 100000
                    THEN pr + pr ELSE pr END AS pr,
               CAST(NULL AS VARCHAR) AS flag
        FROM src
    ), newrows AS (
        SELECT k + 20000000 AS k, st, CAST(NULL AS DOUBLE) AS pr,
               'new' AS flag
        FROM src WHERE k % 100 = 0
    ), demat AS (
        SELECT k + 40000000 AS k, CAST(NULL AS VARCHAR) AS st, pr,
               'demat' AS flag
        FROM src WHERE k % 2 = 0 AND pr <= 100000
    ), final AS (
        SELECT * FROM base
        UNION ALL SELECT * FROM newrows
        UNION ALL SELECT * FROM demat
    )
    SELECT COALESCE(flag, 'base:' || st) AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(pr AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM final GROUP BY 1
    """,
    tags=("A37", "A44", "A45", "A30"),
)
def a47_sql_surface_r9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-9 SQL-surface additions composed in ONE scripted
    session (sql_dml.py::run_sql_script via SqlSession.script): a
    multi-statement script CREATEs the table, loads it, ADD COLUMNs a
    flag (schema evolution, zero data bytes — old rows read NULL), runs
    a NAMED-COLUMN INSERT (unnamed plain columns land NULL), and a
    THETA-ON MERGE — ``ON t.k = s.k AND s.pr > 100000`` — whose
    key-matched-but-residual-failed pairs de-match on BOTH sides: the
    target row passes through and the source row INSERTs (shifted key,
    'demat' flag), the standard ANSI MERGE ON semantics. TRUNCATE
    TABLE's contract (all rows gone in one manifest commit, schema and
    history intact, still a first-class INSERT target) is asserted
    in-function on a scratch CTAS table. The DuckDB oracle recomputes
    the final three-way census — base rows (doubled where the residual
    held), NULL-priced named-insert rows, and the de-matched inserts —
    from first principles.
    """
    from daas_apps_spark.sources.sql_catalog import SqlSession

    base = scratch_dir(f"a47_sql_r9_{os.getpid()}")
    s = SqlSession(spark, base)
    table(spark, sf_dir, "orders").createOrReplaceTempView("a47_orders_src")
    s.script(
        """
        CREATE TABLE ord (o_orderkey bigint, o_orderstatus string,
                          o_totalprice double);
        INSERT INTO ord SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM a47_orders_src;
        ALTER TABLE ord ADD COLUMN flag string;
        INSERT INTO ord (o_orderkey, o_orderstatus, flag)
            SELECT o_orderkey + 20000000, o_orderstatus, 'new'
            FROM a47_orders_src WHERE o_orderkey % 100 = 0;
        MERGE INTO ord AS t USING (SELECT o_orderkey, o_totalprice
                FROM a47_orders_src WHERE o_orderkey % 2 = 0) AS s
            ON t.o_orderkey = s.o_orderkey AND s.o_totalprice > 100000
            WHEN MATCHED THEN UPDATE SET
                o_totalprice = t.o_totalprice + s.o_totalprice
            WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice, flag)
                VALUES (s.o_orderkey + 40000000, s.o_totalprice, 'demat')
        """
    )
    # TRUNCATE contract on a scratch CTAS fork (in-function assertions;
    # the oracle censuses ord, which truncate never touches)
    s.sql("CREATE TABLE scratch AS SELECT * FROM ord")
    s.sql("TRUNCATE TABLE scratch")
    n = s.sql("SELECT count(*) AS n FROM scratch").first().n
    s.sql(
        "INSERT INTO scratch (o_orderkey) "
        "SELECT o_orderkey FROM ord VERSION AS OF 2"
    )
    n2 = s.sql("SELECT count(*) AS n FROM scratch").first().n
    if n != 0 or n2 == 0:
        raise AssertionError(
            f"TRUNCATE contract violated: post-truncate={n}, "
            f"post-reinsert={n2}"
        )
    return s.sql(
        "SELECT COALESCE(flag, 'base:' || o_orderstatus) AS grp, "
        "count(*) AS n_rows, "
        "CAST(sum(CAST(o_totalprice AS decimal(18,4))) AS double) "
        "AS revenue FROM ord GROUP BY COALESCE(flag, 'base:' || "
        "o_orderstatus)"
    )


@register(
    "a48_materialized_view",
    oracle="""
    WITH src AS (
        SELECT o_orderkey k, o_orderstatus st, o_totalprice pr FROM orders
    ), plus AS (
        SELECT k, st, pr FROM src
        UNION ALL
        SELECT k + 20000000, 'X', pr * 2 FROM src WHERE k % 50 = 0
    ), afterdel AS (
        SELECT * FROM plus WHERE st <> 'P'
    ), final AS (
        SELECT k, st, CASE WHEN k % 7 = 0 THEN pr + 10 ELSE pr END AS pr
        FROM afterdel
    )
    SELECT st AS grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(pr AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM final GROUP BY st
    """,
    tags=("A48", "A45", "A25", "A31", "A37"),
)
def a48_materialized_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL materialized views (sql_dml.py::_run_create_view/
    _run_refresh_mv): the A25/A31 IVM machinery surfaced as the feature
    users ask for. One pure-SQL session loads orders, declares
    ``CREATE MATERIALIZED VIEW mv AS SELECT <status>, COUNT(*),
    SUM(decimal) ... GROUP BY`` (materialized into a managed versioned
    state table, covered source version in the commit metadata), then
    mutates the base through every DML family — append INSERT, MOR
    DELETE (the whole 'P' group vanishes), MOR UPDATE — and ONE
    ``REFRESH MATERIALIZED VIEW`` advances the state from the change
    feed: cost ∝ |delta| (maintain_additive_aggregate's signed-count
    algebra), never a rescan; the vanished group leaves the state
    table; the watermark makes a second REFRESH a no-op (asserted
    in-function). The result is read through a plain ``CREATE VIEW``
    (stored SQL text, inlined at reference) so both view kinds compose.
    The DuckDB oracle recomputes the final census from first
    principles — any group the IVM fold drifted from a full recompute
    breaks the hash.

    At 100 TB this is the standing-dashboard architecture: the base
    table takes appends and merge-on-read DML, the |groups|-sized view
    advances off the manifest per refresh, and neither side rescans
    the corpus.
    """
    from daas_apps_spark.sources.sql_catalog import SqlSession

    base = scratch_dir(f"a48_mv_{os.getpid()}")
    s = SqlSession(spark, base)
    table(spark, sf_dir, "orders").createOrReplaceTempView("a48_orders_src")
    s.script(
        """
        CREATE TABLE ord (o_orderkey bigint, o_orderstatus string,
                          o_totalprice double);
        INSERT INTO ord SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM a48_orders_src;
        CREATE MATERIALIZED VIEW mv AS
            SELECT o_orderstatus, COUNT(*) AS n_rows,
                   SUM(CAST(o_totalprice AS decimal(18,4))) AS revenue
            FROM ord GROUP BY o_orderstatus;
        INSERT INTO ord SELECT o_orderkey + 20000000, 'X',
            o_totalprice * 2 FROM a48_orders_src WHERE o_orderkey % 50 = 0
        """
    )
    s.sql("/*+ MOR */ DELETE FROM ord WHERE o_orderstatus = 'P'")
    s.sql(
        "/*+ MOR */ UPDATE ord SET o_totalprice = o_totalprice + 10 "
        "WHERE o_orderkey % 7 = 0"
    )
    v1 = s.sql("REFRESH MATERIALIZED VIEW mv")
    v2 = s.sql("REFRESH MATERIALIZED VIEW mv")
    if v2 != v1:
        raise AssertionError(
            f"watermark violated: a no-delta REFRESH committed "
            f"(v{v1} -> v{v2})"
        )
    s.sql(
        "CREATE VIEW mv_census AS SELECT o_orderstatus AS grp, n_rows, "
        "CAST(revenue AS double) AS revenue FROM mv"
    )
    return s.sql("SELECT grp, n_rows, revenue FROM mv_census")


@register(
    "a49_sql_transaction",
    oracle="""
    WITH u AS (
        SELECT o_orderkey k, o_totalprice pr FROM orders
        WHERE o_orderpriority = '1-URGENT'
    ), lo AS (
        SELECT o_orderkey k, o_totalprice pr FROM orders
        WHERE o_orderpriority = '5-LOW' AND o_orderkey % 3 = 0
    ), debit AS (
        SELECT k, pr FROM u UNION ALL SELECT k + 30000000, pr * 3 FROM lo
    ), credit AS (
        SELECT k, -pr AS pr FROM u
        UNION ALL SELECT k + 30000000, -pr * 3 FROM lo
    )
    SELECT 'debit' AS side, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(pr AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM debit
    UNION ALL
    SELECT 'credit', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(pr AS DECIMAL(18,4))) AS DOUBLE)
    FROM credit
    """,
    tags=("A49", "A38", "A45", "A37"),
)
def a49_sql_transaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-level multi-table transactions (sql_dml.py BEGIN/COMMIT/
    ROLLBACK → the A38 MultiTableTxn 2PC coordinator, one per catalog):
    a double-entry ledger where each posting MUST hit debit and credit
    together or not at all. Three transaction twins run as pure SQL:
    (1) urgent orders posted to both sides and COMMITted — the single
    coordinator-marker swap makes both tables' staged commits visible
    at once; (2) a doubling posting ROLLBACKed — its staged commits are
    invisible forever (presumed abort), their version slots consumed;
    (3) a low-priority posting COMMITted across both sides from a
    second session sharing the same coordinator. A fourth, ABANDONED
    twin (a session that staged one side and died) is swept by
    ``abort_abandoned()`` — the crash-recovery contract — before the
    census. The DuckDB oracle recomputes both sides from the committed
    postings only: one leaked rolled-back/abandoned row, or one
    half-visible posting, breaks the hash.
    """
    from daas_apps_spark.sources.sql_catalog import SqlSession
    from daas_apps_spark.sources.sql_dml import txn_coordinator

    base = scratch_dir(f"a49_txn_{os.getpid()}")
    s = SqlSession(spark, base)
    table(spark, sf_dir, "orders").createOrReplaceTempView("a49_orders_src")
    s.script(
        """
        CREATE TABLE debit (k bigint, pr double);
        CREATE TABLE credit (k bigint, pr double);
        BEGIN;
        INSERT INTO debit SELECT o_orderkey, o_totalprice
            FROM a49_orders_src WHERE o_orderpriority = '1-URGENT';
        INSERT INTO credit SELECT o_orderkey, -o_totalprice
            FROM a49_orders_src WHERE o_orderpriority = '1-URGENT';
        COMMIT;
        BEGIN;
        INSERT INTO debit SELECT k + 90000000, pr * 2 FROM debit;
        INSERT INTO credit SELECT k + 90000000, pr * 2 FROM credit;
        ROLLBACK
        """
    )
    # a second session on the same catalog shares the coordinator
    s2 = SqlSession(spark, base)
    s2.script(
        """
        BEGIN;
        INSERT INTO debit SELECT o_orderkey + 30000000, o_totalprice * 3
            FROM a49_orders_src
            WHERE o_orderpriority = '5-LOW' AND o_orderkey % 3 = 0;
        INSERT INTO credit SELECT o_orderkey + 30000000, -o_totalprice * 3
            FROM a49_orders_src
            WHERE o_orderpriority = '5-LOW' AND o_orderkey % 3 = 0;
        COMMIT
        """
    )
    # the abandoned twin: stages one side, never resolves — swept
    dead = SqlSession(spark, base)
    dead.sql("BEGIN")
    dead.sql("INSERT INTO debit VALUES (999999999, 1.0)")
    swept = txn_coordinator(s.catalog).abort_abandoned()
    if len(swept) != 1:
        raise AssertionError(f"expected 1 abandoned txn, swept {swept}")
    return s.sql(
        "SELECT 'debit' AS side, count(*) AS n_rows, "
        "CAST(sum(CAST(pr AS decimal(18,4))) AS double) AS total "
        "FROM debit "
        "UNION ALL "
        "SELECT 'credit' AS side, count(*) AS n_rows, "
        "CAST(sum(CAST(pr AS decimal(18,4))) AS double) AS total "
        "FROM credit"
    )


@register(
    "a50_create_table_clauses",
    oracle="""
    SELECT o_orderkey % 8 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue,
           CAST(1 AS BIGINT) AS ids_ok
    FROM orders GROUP BY 1
    """,
    tags=("A50", "A28", "A34", "A40", "A41", "A45"),
)
def a50_create_table_clauses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE clause parity (sql_dml.py::_run_create): a
    migrating user's ONE-SHOT DDL — identity column, generated column,
    CHECK constraint, and CLUSTER BY declared inside CREATE TABLE —
    lowers to the existing post-create ALTER calls in one
    script-visible sequence (commit-for-commit parity with the
    incremental path is pinned in tests/test_sql_dml.py). The orders
    then land through the write funnel, which assigns the identity
    (start 500 step 2 — every id even and ≥ 500), computes the
    generated bucket (o_orderkey % 8, the declared clustering axis, so
    the very first write range-partitions on it), and validates the
    constraint (a negative-price insert is REFUSED in-function). The
    census groups by the generated bucket; identity values are
    partition-dependent, so their invariants — uniqueness, floor,
    parity — fold into a constant flag, the a41 discipline.
    """
    from daas_apps_spark.sources.sql_catalog import SqlSession

    base = scratch_dir(f"a50_ddl_{os.getpid()}")
    s = SqlSession(spark, base)
    table(spark, sf_dir, "orders").createOrReplaceTempView("a50_orders_src")
    s.sql(
        """CREATE TABLE fact (
            o_orderkey bigint, o_orderstatus string, o_totalprice double,
            rid BIGINT GENERATED ALWAYS AS IDENTITY
                (START WITH 500 INCREMENT BY 2),
            bucket BIGINT GENERATED ALWAYS AS (o_orderkey % 8),
            CONSTRAINT nonneg CHECK (o_totalprice >= 0)
        ) CLUSTER BY (bucket)"""
    )
    s.sql(
        "INSERT INTO fact SELECT o_orderkey, o_orderstatus, o_totalprice "
        "FROM a50_orders_src"
    )
    from daas_apps_spark.sources.table_format import (
        ConstraintViolationError,
    )

    try:
        s.sql("INSERT INTO fact VALUES (999999999, 'X', -1.0)")
        raise AssertionError("CHECK constraint from CREATE did not hold")
    except ConstraintViolationError:
        pass
    return s.sql(
        "SELECT bucket, count(*) AS n_rows, "
        "CAST(sum(CAST(o_totalprice AS decimal(18,4))) AS double) "
        "AS revenue, "
        "CAST(count(DISTINCT rid) = count(*) "
        "AND min(rid) >= 500 AND max(rid % 2) = 0 AS bigint) AS ids_ok "
        "FROM fact GROUP BY bucket"
    )


@register(
    "a51_join_mv",
    oracle="""
    WITH fact0 AS (
        SELECT o_custkey k, o_totalprice pr FROM orders
    ), fact1 AS (
        SELECT k, pr FROM fact0
        UNION ALL SELECT k, pr * 2 FROM fact0 WHERE k % 5 = 0
    ), fact AS (
        SELECT * FROM fact1 WHERE NOT (pr > 400000)
    ), dim AS (
        SELECT c_custkey k,
               CASE WHEN c_custkey % 10 = 0 THEN 'MOVED'
                    ELSE c_mktsegment END AS seg
        FROM customer
    )
    SELECT seg AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(pr AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           ROUND(CAST(SUM(CAST(pr AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_price
    FROM fact JOIN dim ON fact.k = dim.k
    GROUP BY seg
    """,
    tags=("A51", "A48", "A25", "A31", "C5"),
)
def a51_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized views over a JOIN (sql_dml.py join-MV arm +
    table_format.py::maintain_join_additive_aggregate): the classic
    fact ⋈ dim dashboard — revenue by market segment — maintained by
    the signed delta-join algebra Δ(A⋈B) = ΔA⋈B_old ∪ A_new⋈ΔB, with
    the old/new snapshots taken by TIME TRAVEL on each source's own
    commit log (the versioned table hands the maintenance rule its
    consistent frames for free). The session loads orders as the fact
    and customer as the dim — deliberately WITHOUT every 7th customer,
    so their fact rows are dark to the inner join — then: appends a
    doubled fact slice, MOR-deletes the high-price tail, INSERTs the
    late-arriving dim rows (their old fact rows must light up via
    A_new⋈ΔB), and MOR-updates a dim stripe to a new segment (rows
    must MIGRATE between groups: the update's delete+insert feed pair
    subtracts from the old group and adds to the new). ONE REFRESH
    folds all four; the DuckDB oracle recomputes the final census from
    first principles. AVG derives from the hidden maintained sum.

    At 100 TB this is the maintenance rule every star-schema dashboard
    needs: each refresh costs |Δfact|⋈dim + fact⋈|Δdim| (delta-joins,
    manifest-prunable on the key), never a recompute of fact⋈dim.
    """
    from daas_apps_spark.sources.sql_catalog import SqlSession

    base = scratch_dir(f"a51_jmv_{os.getpid()}")
    s = SqlSession(spark, base)
    table(spark, sf_dir, "orders").createOrReplaceTempView("a51_orders_src")
    table(spark, sf_dir, "customer").createOrReplaceTempView(
        "a51_customer_src"
    )
    s.script(
        """
        CREATE TABLE fact (custkey bigint, price double);
        CREATE TABLE dim (custkey bigint, seg string);
        INSERT INTO fact SELECT o_custkey, o_totalprice
            FROM a51_orders_src;
        INSERT INTO dim SELECT c_custkey, c_mktsegment
            FROM a51_customer_src WHERE c_custkey % 7 <> 3;
        CREATE MATERIALIZED VIEW rev AS
            SELECT seg, COUNT(*) AS n_orders,
                   SUM(CAST(price AS decimal(18,4))) AS revenue,
                   AVG(CAST(price AS decimal(18,4))) AS avg_price
            FROM fact JOIN dim ON fact.custkey = dim.custkey
            GROUP BY seg;
        INSERT INTO fact SELECT o_custkey, o_totalprice * 2
            FROM a51_orders_src WHERE o_custkey % 5 = 0
        """
    )
    s.sql("/*+ MOR */ DELETE FROM fact WHERE price > 400000")
    s.sql(
        "INSERT INTO dim SELECT c_custkey, c_mktsegment "
        "FROM a51_customer_src WHERE c_custkey % 7 = 3"
    )
    s.sql("/*+ MOR */ UPDATE dim SET seg = 'MOVED' WHERE custkey % 10 = 0")
    s.sql("REFRESH MATERIALIZED VIEW rev")
    return s.sql(
        "SELECT seg AS grp, n_orders, CAST(revenue AS double) AS revenue, "
        "ROUND(avg_price, 6) AS avg_price FROM rev"
    )


@register(
    "a52_star_mv",
    oracle="""
    WITH line0 AS (
        SELECT l_orderkey k, l_extendedprice * (1 - l_discount) AS pr
        FROM lineitem
    ), line1 AS (
        SELECT k, pr FROM line0
        UNION ALL SELECT k, pr FROM line0 WHERE k % 7 = 0
    ), line AS (
        SELECT * FROM line1 WHERE NOT (pr > 80000)
    ), ord AS (
        SELECT o_orderkey k, o_custkey ck FROM orders
        WHERE NOT (o_orderkey % 11 = 0)
    ), cus AS (
        SELECT c_custkey ck,
               CASE WHEN c_custkey % 10 = 0 THEN 'MOVED'
                    ELSE c_mktsegment END AS seg
        FROM customer
    )
    SELECT seg AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(pr AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM line JOIN ord ON line.k = ord.k JOIN cus ON ord.ck = cus.ck
    GROUP BY seg
    """,
    tags=("A52", "A51", "A48", "A25", "A31", "C6"),
)
def a52_star_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-way chain-join materialized views (sql_dml.py FROM-chain
    grammar + table_format.py::maintain_join_additive_aggregate's
    telescoping rule): the three-table STAR dashboard — line items ⋈
    orders ⋈ customers, revenue by segment — maintained incrementally
    under mutations at EVERY chain position: a doubled fact slice
    appends, a fact MOR delete prunes the high-price tail, a
    MIDDLE-table MOR delete cuts every 11th order (its delta term
    joins NEW neighbors to the left and OLD to the right — the case a
    two-sided rule cannot express), and a dim MOR update migrates a
    customer stripe between segments. ONE REFRESH folds all four feeds
    via Δ(T0⋈T1⋈T2) = ΔT0⋈T1_old⋈T2_old ∪ T0_new⋈ΔT1⋈T2_old ∪
    T0_new⋈T1_new⋈ΔT2, with every snapshot time-traveled from its
    table's own commit log and per-source watermarks riding as one
    dict in the refresh commit. The DuckDB oracle recomputes the final
    census from first principles.

    At 100 TB this is the star-schema answer: each refresh costs three
    delta-joins against the neighbors (manifest-prunable, tiny deltas
    AQE-broadcast), never a recompute of the three-way join.
    """
    from daas_apps_spark.sources.sql_catalog import SqlSession

    base = scratch_dir(f"a52_star_{os.getpid()}")
    s = SqlSession(spark, base)
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("a52_line_src")
    table(spark, sf_dir, "orders").createOrReplaceTempView("a52_ord_src")
    table(spark, sf_dir, "customer").createOrReplaceTempView("a52_cus_src")
    s.script(
        """
        CREATE TABLE line (okey bigint, pr double);
        CREATE TABLE ord (okey bigint, ckey bigint);
        CREATE TABLE cus (ckey bigint, seg string);
        INSERT INTO line SELECT l_orderkey,
            l_extendedprice * (1 - l_discount) FROM a52_line_src;
        INSERT INTO ord SELECT o_orderkey, o_custkey FROM a52_ord_src;
        INSERT INTO cus SELECT c_custkey, c_mktsegment FROM a52_cus_src;
        CREATE MATERIALIZED VIEW rev AS
            SELECT seg, COUNT(*) AS n_items,
                   SUM(CAST(pr AS decimal(18,4))) AS revenue
            FROM line JOIN ord ON line.okey = ord.okey
                      JOIN cus ON ord.ckey = cus.ckey
            GROUP BY seg;
        INSERT INTO line SELECT l_orderkey,
            l_extendedprice * (1 - l_discount) FROM a52_line_src
            WHERE l_orderkey % 7 = 0
        """
    )
    s.sql("/*+ MOR */ DELETE FROM line WHERE pr > 80000")
    s.sql("/*+ MOR */ DELETE FROM ord WHERE okey % 11 = 0")
    s.sql("/*+ MOR */ UPDATE cus SET seg = 'MOVED' WHERE ckey % 10 = 0")
    s.sql("REFRESH MATERIALIZED VIEW rev")
    return s.sql(
        "SELECT seg AS grp, n_items, CAST(revenue AS double) AS revenue "
        "FROM rev"
    )


@register(
    "a53_aliased_join_mv",
    oracle="""
    WITH ord0 AS (
        SELECT o_custkey ck, o_totalprice pr FROM orders
    ), ord1 AS (
        SELECT ck, pr FROM ord0
        UNION ALL SELECT ck, pr * 2 FROM ord0 WHERE ck % 5 = 0
    ), ordf AS (
        SELECT * FROM ord1 WHERE NOT (pr > 400000)
    ), cus AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 10 = 0
                    THEN (c_nationkey + 1) % 25
                    ELSE c_nationkey END AS c_nationkey
        FROM customer WHERE NOT (c_custkey % 13 = 0)
    )
    SELECT n_name AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(pr AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM nation JOIN cus ON cus.c_nationkey = nation.n_nationkey
                JOIN ordf ON ordf.ck = cus.c_custkey
    GROUP BY n_name
    """,
    tags=("A53", "A51", "A52", "A48", "A25", "A31", "C6"),
)
def a53_aliased_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join MVs over DIFFERENTLY-NAMED key columns — the real star
    schema, no pre-renaming (sql_dml.py::_parse_mv_join_keys oriented
    pairs + table_format.py::_join_adjacent): nation ⋈ customer ⋈
    orders keyed ``c_nationkey = n_nationkey`` and ``o_custkey =
    c_custkey`` exactly as TPC-H spells them, revenue by nation,
    maintained by the telescoping signed delta-join rule. The sweep
    mutates every chain position: a doubled fact slice appends, a fact
    MOR delete prunes the high-price tail, the late-arriving customer
    stripe lights up its dark orders, a MIDDLE-table MOR delete cuts
    every 13th customer, and a customer MOR update REWRITES THE JOIN
    KEY ITSELF (c_nationkey), migrating whole customers between nation
    groups — the aliased-key case where the delete+insert feed pair
    must subtract under the old key value and add under the new. ONE
    REFRESH folds all five; the DuckDB oracle recomputes from first
    principles.

    At 100 TB nothing changes vs a51/a52 — each refresh is still
    |delta|-priced delta-joins — but the schema no longer has to bend:
    the ON clause accepts each table's own key spelling."""
    from daas_apps_spark.sources.sql_catalog import SqlSession

    base = scratch_dir(f"a53_ajmv_{os.getpid()}")
    s = SqlSession(spark, base)
    table(spark, sf_dir, "nation").createOrReplaceTempView("a53_nat_src")
    table(spark, sf_dir, "customer").createOrReplaceTempView("a53_cus_src")
    table(spark, sf_dir, "orders").createOrReplaceTempView("a53_ord_src")
    s.script(
        """
        CREATE TABLE nat (n_nationkey bigint, n_name string);
        CREATE TABLE cus (c_custkey bigint, c_nationkey bigint);
        CREATE TABLE ord (o_custkey bigint, o_totalprice double);
        INSERT INTO nat SELECT n_nationkey, n_name FROM a53_nat_src;
        INSERT INTO cus SELECT c_custkey, c_nationkey
            FROM a53_cus_src WHERE c_custkey % 7 <> 3;
        INSERT INTO ord SELECT o_custkey, o_totalprice FROM a53_ord_src;
        CREATE MATERIALIZED VIEW rev AS
            SELECT n_name, COUNT(*) AS n_orders,
                   SUM(CAST(o_totalprice AS decimal(18,4))) AS revenue
            FROM nat JOIN cus ON cus.c_nationkey = nat.n_nationkey
                     JOIN ord ON ord.o_custkey = cus.c_custkey
            GROUP BY n_name;
        INSERT INTO ord SELECT o_custkey, o_totalprice * 2
            FROM a53_ord_src WHERE o_custkey % 5 = 0
        """
    )
    s.sql("/*+ MOR */ DELETE FROM ord WHERE o_totalprice > 400000")
    s.sql(
        "INSERT INTO cus SELECT c_custkey, c_nationkey "
        "FROM a53_cus_src WHERE c_custkey % 7 = 3"
    )
    s.sql("/*+ MOR */ DELETE FROM cus WHERE c_custkey % 13 = 0")
    s.sql(
        "/*+ MOR */ UPDATE cus SET c_nationkey = (c_nationkey + 1) % 25 "
        "WHERE c_custkey % 10 = 0"
    )
    s.sql("REFRESH MATERIALIZED VIEW rev")
    return s.sql(
        "SELECT n_name AS grp, n_orders, "
        "CAST(revenue AS double) AS revenue FROM rev"
    )


@register(
    "a54_minmax_mv",
    oracle="""
    WITH o0 AS (
        SELECT o_orderkey k, o_orderpriority pri, o_totalprice pr
        FROM orders
    ), o1 AS (
        SELECT k, pri, pr FROM o0
        UNION ALL SELECT k, pri, pr * 0.5 FROM o0 WHERE k % 5 = 0
    ), o2 AS (
        SELECT k, pri,
               CASE WHEN k % 11 = 0 THEN pr * 0.9 ELSE pr END AS pr
        FROM o1
    ), ofin AS (
        SELECT * FROM o2 WHERE NOT (pr > 300000)
    )
    SELECT pri AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(pr AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           MIN(pr) AS lo,
           MAX(pr) AS hi
    FROM ofin
    GROUP BY pri
    """,
    tags=("A54", "A48", "A25", "A31", "D1"),
)
def a54_minmax_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX in materialized views via the AFFECTED-GROUP RECOMPUTE
    rule (table_format.py::_maintain_extrema): extrema are not
    distributive under deletes, so the classic IVM refusal leaves any
    dashboard with a MAX(ts)/MIN(price) column unmaterializable. The
    engine maintains them anyway: inserts FOLD (least/greatest against
    the stored value — extrema are insert-monotone), and a delete only
    costs when it could have CARRIED a group's extremum, in which case
    JUST that group recomputes from the base behind a semi-join on its
    keys. The sweep forces both paths at once: a half-price doubled
    slice appends (new lo carriers fold in), a price rewrite moves a
    stripe, and a MOR delete prunes everything above 300k — removing
    the hi carrier of EVERY group, so the stored MAX must DROP, the
    thing folding can never do. ONE REFRESH lands both; the DuckDB
    oracle recomputes the final census from first principles.

    At 100 TB: refresh stays |delta| + |affected groups| — the
    recompute term semi-joins the base on affected group keys (here
    5 priorities), never rescans groups whose carriers survived."""
    from daas_apps_spark.sources.sql_catalog import SqlSession

    base = scratch_dir(f"a54_mmv_{os.getpid()}")
    s = SqlSession(spark, base)
    table(spark, sf_dir, "orders").createOrReplaceTempView("a54_ord_src")
    s.script(
        """
        CREATE TABLE ord (okey bigint, pri string, price double);
        INSERT INTO ord SELECT o_orderkey, o_orderpriority, o_totalprice
            FROM a54_ord_src;
        CREATE MATERIALIZED VIEW stats AS
            SELECT pri, COUNT(*) AS n_orders,
                   SUM(CAST(price AS decimal(18,4))) AS revenue,
                   MIN(price) AS lo, MAX(price) AS hi
            FROM ord GROUP BY pri;
        INSERT INTO ord SELECT o_orderkey, o_orderpriority,
            o_totalprice * 0.5 FROM a54_ord_src WHERE o_orderkey % 5 = 0
        """
    )
    s.sql("/*+ MOR */ UPDATE ord SET price = price * 0.9 WHERE okey % 11 = 0")
    s.sql("/*+ MOR */ DELETE FROM ord WHERE price > 300000")
    s.sql("REFRESH MATERIALIZED VIEW stats")
    return s.sql(
        "SELECT pri AS grp, n_orders, CAST(revenue AS double) AS revenue, "
        "lo, hi FROM stats"
    )


@register(
    "a55_continuous_mv_refresh",
    oracle="""
    WITH o0 AS (
        SELECT o_orderkey k, o_orderpriority pri, o_totalprice pr
        FROM orders WHERE o_orderkey % 10 = 0
    ), o1 AS (
        SELECT k, pri, pr FROM o0
        UNION ALL
        SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        WHERE o_orderkey % 10 = 5
    ), o2 AS (
        SELECT * FROM o1 WHERE NOT (pr > 250000)
    ), ofin AS (
        SELECT k, pri,
               CASE WHEN k % 3 = 0 THEN pr + 10.0 ELSE pr END AS pr
        FROM o2
    )
    SELECT pri AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(pr AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           ROUND(CAST(SUM(CAST(pr AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_price
    FROM ofin GROUP BY pri
    """,
    tags=("A55", "A48", "A25", "A31", "I10"),
)
def a55_continuous_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``REFRESH MATERIALIZED VIEW … CONTINUOUS`` end-to-end
    (sql_catalog.py::_start_continuous_refresh → streaming/live.py::
    start_continuous_mv_refresh): the MV stops being a thing you
    refresh and becomes a STANDING stream — base-table commits flow
    through the table_cdf source (versions as offsets, MOR deletes
    replayed as signed rows planned off the manifest), each micro-batch
    folds the signed-delta IVM algebra into the state table
    EXACTLY-ONCE ((stream_id, batch_id) skip on replay), and every
    streaming commit stamps the SAME mv_source_versions watermark the
    batch REFRESH writes — so the two maintainers hand over cleanly in
    either direction. The query drives three live windows (append, MOR
    delete, MOR update) under the running stream, polls the maintained
    state to the recompute fixpoint after each, STOPs the stream, and
    proves the handover by running a manual REFRESH over the final
    no-delta window (a no-op — the watermark is already at head). The
    DuckDB oracle recomputes the final census from first principles.

    At 100 TB this is the freshness dial with no new cost model: the
    stream reads each window's change units off the manifest exactly
    like batch REFRESH, state stays |groups|-sized, and the checkpoint
    resumes a stopped stream where it left off."""
    import time as _time

    from daas_apps_spark.sources.sql_catalog import SqlSession

    base = scratch_dir(f"a55_cmv_{os.getpid()}")
    s = SqlSession(spark, base)
    table(spark, sf_dir, "orders").createOrReplaceTempView("a55_ord_src")
    s.script(
        """
        CREATE TABLE ord (k bigint, pri string, price double);
        INSERT INTO ord SELECT o_orderkey, o_orderpriority, o_totalprice
            FROM a55_ord_src WHERE o_orderkey % 10 = 0;
        CREATE MATERIALIZED VIEW stats AS
            SELECT pri, COUNT(*) AS n_orders,
                   SUM(CAST(price AS decimal(18,4))) AS revenue,
                   AVG(CAST(price AS decimal(18,4))) AS avg_price
            FROM ord GROUP BY pri
        """
    )

    def recompute():
        return sorted(
            tuple(r)
            for r in s.sql(
                "SELECT pri, COUNT(*) AS n, "
                "CAST(SUM(CAST(price AS decimal(18,4))) AS double) AS t "
                "FROM ord GROUP BY pri"
            ).collect()
        )

    def state():
        return sorted(
            tuple(r)
            for r in s.sql(
                "SELECT pri, n_orders, CAST(revenue AS double) FROM stats"
            ).collect()
        )

    def wait_caught_up():
        deadline = _time.time() + 120
        while _time.time() < deadline:
            if state() == recompute():
                return
            _time.sleep(0.4)
        raise AssertionError("continuous MV state never caught up")

    q = s.sql("REFRESH MATERIALIZED VIEW stats CONTINUOUS")
    try:
        for stmt in (
            "INSERT INTO ord SELECT o_orderkey, o_orderpriority, "
            "o_totalprice FROM a55_ord_src WHERE o_orderkey % 10 = 5",
            "/*+ MOR */ DELETE FROM ord WHERE price > 250000",
            "/*+ MOR */ UPDATE ord SET price = price + 10.0 "
            "WHERE k % 3 = 0",
        ):
            s.sql(stmt)
            wait_caught_up()
    finally:
        if q.isActive:
            s.sql("STOP REFRESH stats")
        else:
            s._streams.pop("stats", None)
    # handover: the stream's per-batch watermarks mean this manual
    # refresh sees a no-delta window and commits NOTHING
    v = s.sql("REFRESH MATERIALIZED VIEW stats")
    if v != s.sql("REFRESH MATERIALIZED VIEW stats"):
        raise AssertionError("post-stream manual refresh was not a no-op")
    return s.sql(
        "SELECT pri AS grp, n_orders, CAST(revenue AS double) AS revenue, "
        "ROUND(avg_price, 6) AS avg_price FROM stats"
    )


def _mv_refresh_base(spark: SparkSession, sf_dir: str):
    """Shared prebuilt MV state for the a48_mv_refresh_sweep bench row:
    the aggregate over the full orders base is materialized ONCE per
    fixture dir (paid in bench.py's untimed warm pass, exactly like
    ``_orders_base_table``), so the timed runs price what the row is
    ABOUT — the |delta| DML + REFRESH — not the unavoidable one-time
    CREATE-side full aggregate. Unique-tmp + atomic-rename build, same
    concurrent-session safety argument as the base-table helper."""
    import hashlib
    import uuid as _uuid

    from daas_apps_spark.sources.sql_dml import _canonical_mv_state
    from daas_apps_spark.sources.table_format import (
        VersionedTable,
        additive_aggregate_state,
        read_log,
    )

    base = _orders_base_table(spark, sf_dir)
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join(SCRATCH_ROOT, f"a48_mv_state_{key}")

    def ready(p: str) -> bool:
        try:
            log = read_log(p)
        except Exception:  # noqa: BLE001 — torn/partial dir: rebuild
            return False
        return bool(log) and log[-1]["version"] >= 1

    if ready(path):
        return base, VersionedTable(spark, path)
    state = _canonical_mv_state(
        additive_aggregate_state(
            base.read(),
            ["o_orderpriority"],
            "n_orders",
            {"revenue": "CAST(o_totalprice AS decimal(18,4))"},
        ).select("o_orderpriority", "n_orders", "revenue")
    )
    tmp = f"{path}.build-{_uuid.uuid4().hex[:8]}"
    vt_tmp = VersionedTable(spark, tmp)
    vt_tmp.append(state)
    if ready(path):
        shutil.rmtree(tmp, ignore_errors=True)
        return base, VersionedTable(spark, path)
    shutil.rmtree(path, ignore_errors=True)
    os.rename(tmp, path)
    return base, VersionedTable(spark, path)


_A48_SWEEP_MVDEF = {
    "sources": ["ord"],
    "chain_keys": [],
    "group_by": ["o_orderpriority"],
    "count_col": "n_orders",
    "sums": {"revenue": "CAST(o_totalprice AS decimal(18,4))"},
    "mins": {},
    "maxs": {},
    "derived": {},
    "where": None,
    "order": ["o_orderpriority", "n_orders", "revenue"],
    "sql": "SELECT o_orderpriority, COUNT(*) AS n_orders, "
    "SUM(CAST(o_totalprice AS decimal(18,4))) AS revenue "
    "FROM ord GROUP BY o_orderpriority",
}


@register(
    "a48_mv_refresh_sweep",
    oracle="""
    WITH kept AS (
        SELECT o_orderpriority pri, o_totalprice pr FROM orders
        WHERE o_orderkey >= 3000
        UNION ALL
        SELECT o_orderpriority, o_totalprice FROM orders
        WHERE o_orderkey >= 3000 AND o_orderkey < 6000
    )
    SELECT pri AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(pr AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM kept GROUP BY pri
    """,
    tags=("A48", "A25", "A31"),
    bench=True,
)
def a48_mv_refresh_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MV REFRESH path as a TIMED row — the ∝|delta| claim priced,
    not just hash-checked: fork the shared orders base and its prebuilt
    MV state (both shallow clones, metadata-cost), run a FIXED-SIZE DML
    window — INSERT the o_orderkey < 6000 slice, MOR-DELETE everything
    under 3000; both ~constant row counts at EVERY sf because the key
    range is absolute — then ONE incremental REFRESH folds the window
    into the maintained state, and the final census reads the state
    table. The DuckDB twin recomputes the same census from the raw
    corpus — what a system without IVM pays per refresh.

    The SCALING_CURVE row is the proof the prescription asked for:
    because the delta is absolute-sized, a refresh priced ∝|delta|
    stays ~FLAT across the sf0.001→0.1 decades while the base grows
    100× — any table-size term in the refresh would surface as
    per-decade growth. (The one-time CREATE-side full aggregate is
    prebuilt per fixture like _orders_base_table and excluded, exactly
    as one-time ingest is excluded from per-query latency.)

    At 100 TB this is the dashboard freshness cost: each refresh reads
    the window's change units off the manifest (append fast path + DV
    delta), folds a |delta|-sized signed aggregate, and overwrites a
    |groups|-sized state."""
    from daas_apps_spark.sources.sql_catalog import SqlSession, TableCatalog
    from daas_apps_spark.sources.sql_dml import _MV_VERS_KEY
    from daas_apps_spark.sources.table_format import VersionedTable

    base, prebuilt_state = _mv_refresh_base(spark, sf_dir)
    root = scratch_dir(f"a48_rs_{os.getpid()}")
    fork = base.clone_to(os.path.join(root, "ord"), version=1)
    state = prebuilt_state.clone_to(os.path.join(root, "stats"))
    # a clone's first commit is its OWN log entry — the watermark does
    # not carry; re-stamp it with a metadata-only commit (a zero-row
    # append would pay a full Spark write job for an empty dir)
    state.commit_metadata({_MV_VERS_KEY: {"ord": 1}})
    cat = TableCatalog(os.path.join(root, "cat"))
    cat.create("ord", location=fork.path)
    cat.create(
        "stats",
        location=state.path,
        extra={"kind": "materialized_view", "mv": _A48_SWEEP_MVDEF},
    )
    s = SqlSession(spark, cat)
    table(spark, sf_dir, "orders").createOrReplaceTempView("a48rs_src")
    s.sql(
        "INSERT INTO ord SELECT * FROM a48rs_src WHERE o_orderkey < 6000"
    )
    s.sql("/*+ MOR */ DELETE FROM ord WHERE o_orderkey < 3000")
    s.sql("REFRESH MATERIALIZED VIEW stats")
    return s.sql(
        "SELECT o_orderpriority AS grp, n_orders, "
        "CAST(revenue AS double) AS revenue FROM stats"
    )


@register(
    "a56_mv_query_rewrite",
    oracle="""
    WITH o0 AS (
        SELECT o_orderkey k, o_orderpriority pri, o_totalprice pr
        FROM orders
    ), o1 AS (
        SELECT k, pri, pr FROM o0
        UNION ALL SELECT k, pri, pr * 2 FROM o0 WHERE k % 7 = 0
    ), ofin AS (
        SELECT * FROM o1 WHERE NOT (pr > 350000)
    )
    SELECT pri AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(pr AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           ROUND(CAST(SUM(CAST(pr AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_price
    FROM ofin GROUP BY pri
    """,
    tags=("A56", "A48", "A25", "B1"),
)
def a56_mv_query_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-to-MV QUERY REWRITE (sql_dml.py::_try_mv_rewrite):
    the user never names the MV — they write the aggregate over the
    BASE table, and when a registered materialized view has the same
    sources / join keys / WHERE / GROUP BY, every select item maps
    onto a maintained column, and the watermark is CURRENT at the
    source's head, the SELECT is served from the |groups|-sized
    maintained state instead of scanning the base. EXPLAIN surfaces
    the decision as a ``== Materialized View Rewrite ==`` header.
    The query pins all three legs in-function: (1) fresh MV → EXPLAIN
    shows the rewrite and rewritten ≡ the WITH-wrapped direct twin
    row-for-row; (2) after DML with NO refresh the gate must CLOSE
    (EXPLAIN clean — a stale MV can never serve stale rows) and the
    direct path sees the new data; (3) REFRESH re-opens it. The
    returned census comes through the rewrite; DuckDB recomputes it
    from first principles.

    At 100 TB this is the point of maintaining MVs at all: the
    dashboard query that would scan the fact table answers from
    |groups| rows, and freshness is a watermark comparison against
    the commit log — zero data reads to decide."""
    from daas_apps_spark.sources.sql_catalog import SqlSession

    base = scratch_dir(f"a56_qrw_{os.getpid()}")
    s = SqlSession(spark, base)
    table(spark, sf_dir, "orders").createOrReplaceTempView("a56_ord_src")
    s.script(
        """
        CREATE TABLE ord (k bigint, pri string, price double);
        INSERT INTO ord SELECT o_orderkey, o_orderpriority, o_totalprice
            FROM a56_ord_src;
        CREATE MATERIALIZED VIEW stats AS
            SELECT pri, COUNT(*) AS n,
                   SUM(CAST(price AS decimal(18,4))) AS total,
                   AVG(CAST(price AS decimal(18,4))) AS mean
            FROM ord GROUP BY pri
        """
    )
    user_q = (
        "SELECT pri, COUNT(*) AS n_orders, "
        "SUM(CAST(price AS decimal(18,4))) AS revenue, "
        "AVG(CAST(price AS decimal(18,4))) AS avg_price "
        "FROM ord GROUP BY pri"
    )
    twin_q = (
        "WITH b AS (SELECT * FROM ord) "
        "SELECT pri, COUNT(*) AS n_orders, "
        "SUM(CAST(price AS decimal(18,4))) AS revenue, "
        "AVG(CAST(price AS decimal(18,4))) AS avg_price "
        "FROM b GROUP BY pri"
    )

    def plan() -> str:
        return s.sql("EXPLAIN " + user_q).first().plan

    def rows(q):
        # dtype-normalized: the MV derives AVG as double (hidden
        # sum/count pair) where direct SQL yields decimal — same value,
        # different representation; compare on rounded floats
        return sorted(
            tuple(
                round(float(v), 6) if isinstance(v, (int, float)) or
                hasattr(v, "as_tuple") else v
                for v in r
            )
            for r in s.sql(q).collect()
        )

    if "Materialized View Rewrite" not in plan():
        raise AssertionError("fresh MV did not capture the aggregate")
    if rows(user_q) != rows(twin_q):
        raise AssertionError("rewritten result != direct recompute")
    # stale gate: DML with no refresh must CLOSE the rewrite
    s.sql(
        "INSERT INTO ord SELECT o_orderkey, o_orderpriority, "
        "o_totalprice * 2 FROM a56_ord_src WHERE o_orderkey % 7 = 0"
    )
    s.sql("/*+ MOR */ DELETE FROM ord WHERE price > 350000")
    if "Materialized View Rewrite" in plan():
        raise AssertionError("stale MV served a rewrite")
    if rows(user_q) != rows(twin_q):
        raise AssertionError("stale-path direct result diverged")
    s.sql("REFRESH MATERIALIZED VIEW stats")
    if "Materialized View Rewrite" not in plan():
        raise AssertionError("refreshed MV did not re-open the rewrite")
    out = s.sql(user_q)  # served from maintained state
    return out.select(
        F.col("pri").alias("grp"),
        F.col("n_orders"),
        F.col("revenue").cast("double").alias("revenue"),
        F.round(F.col("avg_price"), 6).alias("avg_price"),
    )


@register(
    "k70_lakehouse_corpus_ingest",
    oracle="""
    WITH b1 AS (
        SELECT * FROM documents WHERE doc_id % 3 <> 0
    ), b2 AS (
        SELECT doc_id, text, lang, source, n_chars FROM documents
        WHERE doc_id % 3 = 0
        UNION ALL
        SELECT doc_id + 10000, text, lang, source, n_chars
        FROM documents WHERE doc_id % 7 = 1 AND doc_id % 3 <> 0
    ), accepted AS (
        SELECT * FROM b2
        WHERE text NOT IN (SELECT text FROM b1)
    ), final AS (
        SELECT * FROM b1 UNION ALL SELECT * FROM accepted
    )
    SELECT lang AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM final GROUP BY lang
    """,
    tags=("K70", "K17", "K68", "A44", "A45", "A46", "A40"),
)
def k70_lakehouse_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lakehouse and the LLM pipeline COMPOSED: a training-corpus
    ingestion loop built entirely from this round's lakehouse verbs, as
    one pure-SQL session. Batch 1 of documents lands via COPY INTO
    (idempotence asserted in-function — the re-run loads 0 files and
    mints no version); the corpus table carries a GENERATED content
    digest (`sha2(text, 256)` — A40, computed by the write funnel for
    every ingest path); batch 2 (fresh docs PLUS re-crawled duplicates
    of batch-1 content under new doc_ids) lands in a staging table via
    COPY INTO, and the K17 dedup screen is ONE conditional MERGE —
    ``ON t.digest = s.digest WHEN NOT MATCHED THEN INSERT`` — the
    anti-join ingest as a single A44 statement over the generated
    digest. The DuckDB oracle recomputes the accepted set from first
    principles (batch-2 rows whose text batch 1 never saw) and the
    per-language census (doc count, distinct texts, total chars) must
    hash-match; any duplicate that slipped through, or any true arrival
    that the screen dropped, breaks it.

    At 100 TB this is the nightly corpus loop: file-level exactly-once
    (COPY identity registry), row-level dedup ∝ |batch| (digest-keyed
    merge against the corpus, file-bounded), digests maintained by
    declaration rather than by every ingest path remembering to compute
    them, and every stage a time-travelable commit.
    """
    from daas_apps_spark.sources.sql_catalog import SqlSession

    base = scratch_dir(f"k70_corpus_{os.getpid()}")
    d = table(spark, sf_dir, "documents")
    d.filter(F.col("doc_id") % 3 != 0).repartition(4).write.parquet(
        os.path.join(base, "landing1")
    )
    d.filter(F.col("doc_id") % 3 == 0).unionByName(
        d.filter((F.col("doc_id") % 7 == 1) & (F.col("doc_id") % 3 != 0))
        .withColumn("doc_id", F.col("doc_id") + F.lit(10_000))
    ).repartition(3).write.parquet(os.path.join(base, "landing2"))
    s = SqlSession(spark, os.path.join(base, "cat"))
    s.script(
        f"""
        CREATE TABLE corpus (doc_id bigint, text string, lang string,
                             source string, n_chars bigint);
        ALTER TABLE corpus ADD COLUMN digest GENERATED ALWAYS AS
            (sha2(text, 256));
        CREATE TABLE staging (doc_id bigint, text string, lang string,
                              source string, n_chars bigint);
        COPY INTO corpus FROM '{base}/landing1';
        COPY INTO staging FROM '{base}/landing2'
        """
    )
    rerun = s.sql(f"COPY INTO corpus FROM '{base}/landing1'").first()
    v_before = s.sql("DESCRIBE HISTORY corpus").count()
    if rerun.num_loaded_files != 0 or rerun.num_skipped_files == 0:
        raise AssertionError(f"COPY idempotence violated: {rerun}")
    s.sql(
        "MERGE INTO corpus AS t USING (SELECT *, sha2(text, 256) AS "
        "digest FROM staging) AS s ON t.digest = s.digest "
        "WHEN NOT MATCHED THEN INSERT (doc_id, text, lang, source, "
        "n_chars) VALUES (s.doc_id, s.text, s.lang, s.source, s.n_chars)"
    )
    if s.sql("DESCRIBE HISTORY corpus").count() != v_before + 1:
        raise AssertionError("dedup-screen merge was not ONE commit")
    return s.sql(
        "SELECT lang AS grp, count(*) AS n_docs, "
        "count(DISTINCT text) AS n_unique, "
        "CAST(sum(n_chars) AS bigint) AS total_chars "
        "FROM corpus GROUP BY lang"
    )


@register(
    "k71_corpus_stats_mv",
    oracle="""
    WITH b1 AS (
        SELECT * FROM documents WHERE doc_id % 3 <> 0
    ), b2 AS (
        SELECT * FROM documents WHERE doc_id % 3 = 0
    ), corpus AS (
        SELECT * FROM b1 UNION ALL SELECT * FROM b2
    ), curated AS (
        SELECT * FROM corpus WHERE n_chars >= 120
    )
    SELECT lang AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM curated GROUP BY lang
    """,
    tags=("K71", "K56", "K6", "A48", "A46", "A45", "A31"),
)
def k71_corpus_stats_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus dataset-card statistics (K56's per-language census) as
    a STANDING MATERIALIZED VIEW maintained across the ingest loop —
    the round-10 lakehouse × LLM composition: COPY INTO lands batch 1
    exactly-once (A46), ``CREATE MATERIALIZED VIEW`` declares the
    per-language doc/char census over the corpus (A48 — materialized
    into a managed versioned state table), batch 2 lands via a second
    COPY INTO, a curation pass MOR-DELETEs the short-document tail
    (K6's length screen as lakehouse DML — deletion vectors, no file
    rewritten), and ONE ``REFRESH MATERIALIZED VIEW`` folds both the
    arrivals and the deletes into the census from the change feed:
    cost ∝ |batch| + |deleted|, never a corpus rescan. The DuckDB
    oracle recomputes the curated census from first principles; a
    group the signed-count algebra drifted on breaks the hash.

    At 100 TB this is how a corpus team keeps its dataset card live:
    the stats a K56 report reads are maintained, not recomputed —
    every nightly ingest ends with one |delta|-cost REFRESH instead of
    a full-corpus aggregation, and the census history is itself
    time-travelable (the card for any past corpus version is a
    VERSION AS OF read of the state table).
    """
    from daas_apps_spark.sources.sql_catalog import SqlSession

    base = scratch_dir(f"k71_stats_{os.getpid()}")
    d = table(spark, sf_dir, "documents")
    d.filter(F.col("doc_id") % 3 != 0).repartition(4).write.parquet(
        os.path.join(base, "landing1")
    )
    d.filter(F.col("doc_id") % 3 == 0).repartition(3).write.parquet(
        os.path.join(base, "landing2")
    )
    s = SqlSession(spark, os.path.join(base, "cat"))
    s.script(
        f"""
        CREATE TABLE corpus (doc_id bigint, text string, lang string,
                             source string, n_chars bigint);
        COPY INTO corpus FROM '{base}/landing1';
        CREATE MATERIALIZED VIEW lang_stats AS
            SELECT lang, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
            FROM corpus GROUP BY lang;
        COPY INTO corpus FROM '{base}/landing2'
        """
    )
    s.sql("/*+ MOR */ DELETE FROM corpus WHERE n_chars < 120")
    s.sql("REFRESH MATERIALIZED VIEW lang_stats")
    return s.sql(
        "SELECT lang AS grp, CAST(n_docs AS bigint) AS n_docs, "
        "CAST(total_chars AS bigint) AS total_chars FROM lang_stats"
    )


def _orders_base_table(spark: SparkSession, sf_dir: str):
    """Shared one-commit versioned table of ``orders`` for the lakehouse
    bench rows, built ONCE per fixture dir and reused: bench.py's
    untimed warm pass pays the build, so the timed runs price the
    lakehouse OPERATIONS (clone / DV delete / MOR update / CDF /
    restore), not the unavoidable parquet re-ingest — each timed run
    forks this base with a shallow clone (metadata-cost) and mutates
    the fork.

    Concurrent-session-safe: the base is built in a UNIQUE tmp dir and
    atomically renamed into place, never wiped-and-rebuilt in situ — a
    second Spark session (the judge's parallel plan lint was exactly
    this in round 5) can at worst build a redundant copy and discard
    it, never observe a half-built table."""
    import hashlib
    import uuid as _uuid

    from daas_apps_spark.sources.table_format import (
        VersionedTable,
        read_log,
    )

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join(SCRATCH_ROOT, f"a25_orders_base_{key}")

    def ready(p: str) -> bool:
        try:
            log = read_log(p)
        except Exception:  # noqa: BLE001 — torn/partial dir: rebuild
            return False
        return bool(log) and log[-1]["version"] == 1

    if ready(path):
        return VersionedTable(spark, path)
    tmp = f"{path}.build-{_uuid.uuid4().hex[:8]}"
    vt_tmp = VersionedTable(spark, tmp)
    # Right-size the ingest (guide §6 — small files hurt twice): the raw
    # scan arrives in one partition per split, and writing a file per
    # partition leaves ~32 tiny files that every timed scan of this base
    # (census, CDF, matched-set, clone reads) then pays one task launch
    # and one file open EACH for. Coalesce to one output file per scan
    # split — bytes / maxPartitionBytes — so the file layout matches how
    # scans will re-split it (locally ~7 files; at cluster defaults this
    # is the guide's 128 MB-per-file target).
    src_bytes = os.path.getsize(os.path.join(sf_dir, "orders.parquet"))
    try:
        raw = spark.conf.get("spark.sql.files.maxPartitionBytes")
        split = int(raw.rstrip("bB"))  # Spark reports e.g. "134217728b"
    except (TypeError, ValueError, AttributeError):
        split = 128 * 1024 * 1024
    n_files = max(1, -(-src_bytes // split))
    vt_tmp.append(table(spark, sf_dir, "orders").coalesce(n_files))  # v1
    if ready(path):  # a concurrent builder finished first — use theirs
        shutil.rmtree(tmp, ignore_errors=True)
        return VersionedTable(spark, path)
    # Only clear a CONFIRMED-torn leftover (exists but fails ready()).
    # Never rmtree a ready dir: a concurrent session that already passed
    # its own ready(path) check may be mid-scan, and deleting a valid
    # base under it would turn a benign race into FileNotFound failures.
    if os.path.exists(path) and not ready(path):
        shutil.rmtree(path, ignore_errors=True)
    try:
        os.rename(tmp, path)
    except OSError:
        # lost the publish race (or a winner appeared between the torn
        # check and the rename) — adopt the existing dir, content is
        # deterministic so any completed build is equivalent
        shutil.rmtree(tmp, ignore_errors=True)
    return VersionedTable(spark, path)



@register(
    "a25_mor_sweep",
    oracle="""
    WITH kept AS (
        SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT'
    )
    SELECT o_orderstatus AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F'
                              THEN o_totalprice * 2
                              ELSE o_totalprice END
                    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM kept GROUP BY 1
    UNION ALL
    SELECT 'cdf:delete',
           (SELECT COUNT(*) FROM orders WHERE o_orderpriority = '1-URGENT')
           + (SELECT COUNT(*) FROM kept WHERE o_orderstatus = 'F'),
           CAST(NULL AS DOUBLE)
    UNION ALL
    SELECT 'cdf:insert',
           (SELECT COUNT(*) FROM kept WHERE o_orderstatus = 'F'),
           CAST(NULL AS DOUBLE)
    """,
    tags=("A25", "A29", "A30", "A31"),
    bench=True,
)
def a25_mor_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full merge-on-read LIFECYCLE as one timed row — the flagship
    lakehouse feature priced end-to-end instead of per-piece: shallow
    clone of the prebuilt base (v1) → DV DELETE (v2) → MOR UPDATE (v3)
    → distributed CDF read of (1, 3] → vector compaction → final
    snapshot census. The DuckDB twin is the full recompute of the same
    net state plus the change-feed cardinalities — what a system
    WITHOUT a manifest/DV path would pay every time.

    At 100 TB the timing story this row tracks: the clone is O(files)
    metadata, the delete and update commits cost |matched| (vector
    parquet + one dir of updated rows, zero rewrites of the base
    files), the CDF read costs |delta| (only vector-referenced files +
    added dirs are opened), and only the final census scans the table.
    SCALING_CURVE.md records the sf0.001→0.1 growth of exactly this
    composition.
    """
    base = _orders_base_table(spark, sf_dir)
    # pid-scoped fork dir: same-process reruns reuse (and wipe) it, a
    # concurrent session cannot collide on it
    path = scratch_dir(f"a25_mor_sweep_{os.getpid()}")
    vt = base.clone_to(path, version=1)  # hard links, zero data bytes
    vt.delete("o_orderpriority = '1-URGENT'", mode="mor")  # v2: DV only
    vt.update(
        "o_orderstatus = 'F'",
        {"o_totalprice": "o_totalprice * 2"},
        mode="mor",
    )  # v3: DV + one dir of updated rows
    # The vector compaction (one small write job, data_change=False) and
    # the CDF plan build (driver-side manifest arithmetic + py4j, no job)
    # are independent: changes_between(1, 3) is pinned to the explicit
    # version range, so the v4 compaction commit can land while the feed
    # plan is being built (guide §2.6 — overlap work the driver would
    # otherwise serialize; py4j waits release the GIL, so the compaction
    # job really does run under the plan build). The final census below
    # is built AFTER the join, i.e. over the post-compaction snapshot,
    # exactly as in the sequential order.
    from threading import Thread

    compact_err: list[BaseException] = []

    def _compact() -> None:  # v4 (data_change=False)
        try:
            vt.compact_vectors()
        except BaseException as e:  # noqa: BLE001 — re-raised after join
            compact_err.append(e)

    compact_t = Thread(target=_compact)
    compact_t.start()
    cdf = (
        vt.changes_between(1, 3)
        .groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.concat(F.lit("cdf:"), F.col("_change_type")).alias("grp"),
            "n_rows",
            F.lit(None).cast("double").alias("revenue"),
        )
    )
    compact_t.join()
    if compact_err:
        raise compact_err[0]
    final = vt.read().groupBy(
        F.col("o_orderstatus").alias("grp")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice").alias("revenue"),
    )
    return final.unionByName(cdf)


@register(
    "a27_clone_restore_cycle",
    oracle="""
    SELECT 'source' AS branch,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders
    UNION ALL
    SELECT 'clone',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
    FROM orders
    """,
    tags=("A27", "A32", "A25"),
    bench=True,
)
def a27_clone_restore_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clone + restore as one timed row: orders land in the source (v1),
    a SHALLOW CLONE forks it (hard links, zero data bytes), the clone
    takes a corrupted overwrite (the small 1-URGENT slice, negated) and
    RESTOREs back to v1 — one JSON commit, zero bytes copied. Both
    branches are then censused; each must equal the oracle's full-orders
    recompute (the clone's incident never reached the source, and its
    own rollback is exact).

    The timed cost is METADATA plus the small bad batch: clone =
    O(live files) link ops, restore = one commit write — versus the
    full-table copy-back a copy-on-write-only system would run. That
    gap is the 100 TB story this row tracks (the base build itself is
    paid once in the untimed warm pass — see _orders_base_table).
    """
    o = table(spark, sf_dir, "orders")
    vt = _orders_base_table(spark, sf_dir)
    clone_path = scratch_dir(f"a27_cycle_dst_{os.getpid()}")
    clone = vt.clone_to(clone_path, version=1)
    clone.overwrite(
        o.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
            "o_totalprice", -F.col("o_totalprice")
        )
    )  # v2 on the clone only — the bad load
    clone.restore(version=1)  # v3 — manifest-only rollback

    def census(t, branch: str) -> DataFrame:
        return t.read().agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        ).select(F.lit(branch).alias("branch"), "n_orders", "revenue")

    return census(vt, "source").unionAll(census(clone, "clone"))
