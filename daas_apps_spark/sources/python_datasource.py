"""A11: custom source via the Python Data Source API (Spark 4).

The reference's only extension point is "shell out to a tool over files"
(BaseGATKProgram.java:12-21); Spark's is a first-class pluggable source —
`spark.dataSource.register` + a `DataSource`/`DataSourceReader` pair whose
`partitions()` declares the parallel split set and whose `read(partition)`
yields rows for one split on an executor. This module implements a
deterministic synthetic telemetry source (pure function of row id — no RNG,
no state) so the scan is oracle-checkable: DuckDB re-derives the identical
rows from `range()`.

Scale notes: `partitions()` is the parallelism contract — one `read()` call
per split on executors, driver never sees rows. Generation cost is O(rows /
splits) per task with zero shuffle; a real implementation (API-backed
source, message-bus snapshot) keeps the same shape and adds per-partition
offsets. Python-source rows cross into the JVM via Arrow batches — the J8
path — so throughput is batch-bounded, not row-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.registry import register

N_PARTS = 8
ROWS_PER_PART = 1000
N_BUCKETS = 7

try:  # Python Data Source API requires pyspark >= 4
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class SyntheticTelemetrySource(DataSource):
        """Deterministic synthetic rows: row_id ∈ [0, parts × rows)."""

        @classmethod
        def name(cls) -> str:
            return "synthetic_telemetry"

        def schema(self) -> str:
            return "row_id bigint, bucket int, score int"

        def reader(self, schema) -> "SyntheticTelemetryReader":
            return SyntheticTelemetryReader(self.options)

    class SyntheticTelemetryReader(DataSourceReader):
        def __init__(self, options) -> None:
            self.n_parts = int(options.get("parts", N_PARTS))
            self.rows_per_part = int(options.get("rowsPerPartition", ROWS_PER_PART))

        def partitions(self):
            return [InputPartition(i) for i in range(self.n_parts)]

        def read(self, partition):
            base = partition.value * self.rows_per_part
            for i in range(self.rows_per_part):
                row_id = base + i
                yield (row_id, row_id % N_BUCKETS, (row_id * 31) % 1000)

    _HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover — pyspark < 4
    _HAVE_DATASOURCE_API = False


@register(
    "a11_python_datasource",
    oracle=f"""
    SELECT CAST(id % {N_BUCKETS} AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM((id * 31) % 1000) AS BIGINT) AS total_score,
           CAST(MIN(id) AS BIGINT) AS min_row_id,
           CAST(MAX(id) AS BIGINT) AS max_row_id
    FROM range(0, {N_PARTS * ROWS_PER_PART}) t(id)
    GROUP BY 1
    """,
    tags=("A11", "J8"),
)
def a11_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan a registered Python Data Source (8 parallel partitions) and
    aggregate per bucket; DuckDB re-derives the same rows from range().

    The aggregate proves the full surface: registration, schema, the
    partition set (min/max row ids per bucket cover every split), and
    executor-side row generation.
    """
    if not _HAVE_DATASOURCE_API:  # pragma: no cover
        raise NotImplementedError("Python Data Source API requires pyspark >= 4")
    # idempotent per session; re-registering the same class is harmless
    spark.dataSource.register(SyntheticTelemetrySource)
    src = spark.read.format("synthetic_telemetry").load()
    return src.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("score").cast("long").alias("total_score"),
        F.min("row_id").alias("min_row_id"),
        F.max("row_id").alias("max_row_id"),
    )


try:  # write-side API, pyspark >= 4
    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    class JsonlSinkDataSource(DataSource):
        """Custom Python sink: partition-parallel JSONL files + commit."""

        @classmethod
        def name(cls) -> str:
            return "jsonl_sink"

        def writer(self, schema, overwrite: bool) -> "JsonlSinkWriter":
            return JsonlSinkWriter(self.options)

    from dataclasses import dataclass

    @dataclass
    class JsonlCommit(WriterCommitMessage):
        """Per-task commit message: temp file to promote + row count."""

        tmp_name: str
        final_name: str
        n_rows: int

    class JsonlSinkWriter(DataSourceWriter):
        """Two-phase commit: tasks write attempt-unique TEMP files; only
        the driver-side commit() renames the winning attempt of each
        partition to its final name and drops _SUCCESS — so concurrent
        speculative attempts never share a file handle and an aborted job
        leaves no visible part files."""

        def __init__(self, options) -> None:
            self.path = options.get("path")

        def write(self, iterator):
            import json
            import os
            import uuid

            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            os.makedirs(self.path, exist_ok=True)
            final = f"part-{pid:05d}.jsonl"
            tmp = f"_tmp-{final}-{uuid.uuid4().hex}"
            n = 0
            with open(os.path.join(self.path, tmp), "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
                    n += 1
            return JsonlCommit(tmp_name=tmp, final_name=final, n_rows=n)

        def commit(self, messages) -> None:
            import os

            total = 0
            for m in messages:
                os.replace(
                    os.path.join(self.path, m.tmp_name),
                    os.path.join(self.path, m.final_name),
                )
                total += m.n_rows
            with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
                f.write(f"tasks={len(messages)} rows={total}\n")

        def abort(self, messages) -> None:  # pragma: no cover — error path
            import os

            for m in messages:
                try:
                    os.remove(os.path.join(self.path, m.tmp_name))
                except OSError:
                    pass

    _HAVE_DATASINK_API = True
except ImportError:  # pragma: no cover — pyspark < 4
    _HAVE_DATASINK_API = False


@register(
    "a20_python_datasink",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM documents GROUP BY lang
    """,
    tags=("A20", "A11", "A5"),
)
def a20_python_datasink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom SINK via the Python Data Source write API — the write-side
    complement of a11: each task's ``write(iterator)`` lands one JSONL
    file named by partition id, the driver-side ``commit(messages)``
    drops a ``_SUCCESS`` marker only after every task reports in (the
    standard two-phase file-sink commit contract — readers gate on the
    marker, so a half-written job is invisible).

    The round-trip proves the sink loses nothing: documents → custom sink
    → schema-given JSON scan → per-language aggregate, hash-matched
    against the ORIGINAL table (any dropped/duplicated/corrupted row
    breaks the count/char/id checksums).

    Scale: rows never visit the driver — the writer runs per-task with
    Arrow-batched handoff into Python; commit messages are the only
    driver traffic (one tiny message per task, same as Spark's own
    FileCommitProtocol).
    """
    from daas_apps_spark.sources.io import scratch_dir

    if not _HAVE_DATASINK_API:  # pragma: no cover
        raise NotImplementedError("Python Data Source write API unavailable")
    try:
        spark.dataSource.register(JsonlSinkDataSource)
    except Exception:
        pass  # already registered in this session
    path = scratch_dir("a20_python_datasink")
    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    d.write.format("jsonl_sink").option("path", path).mode("append").save()
    import os

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise RuntimeError("jsonl_sink commit marker missing — job not committed")
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(
        path + "/part-*.jsonl"
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("doc_id").alias("id_checksum"),
    )
