"""CDC-maintained IVF ANN index (K69): the K4 IVF-Flat index persisted
in a versioned table and maintained from the source table's change feed
— at 100 TB the index is NEVER rebuilt.

The index is an assignment table ``(vec_id, cent_id, v)`` partitionable
by ``cent_id`` (the inverted lists). ``build_ivf_index`` assigns every
vector to its nearest centroid (broadcast centroids, map-side argmax —
the exact plan k4_ann_ivf_topk uses); ``maintain_ivf_index`` then
consumes ``changes_between`` deltas from the source's commit log and
applies them as ONE conditional-merge commit per maintenance run:
added vectors are assigned and inserted, removed vectors deleted,
updated vectors reassigned in place — cost ∝ |delta|, bounded further
by the merge's file-level COW (a 100-vector delta rewrites the files
whose vec_id ranges intersect it, not the index). The processed source
version rides in the merge commit's metadata, so maintenance resumes
from where it left off with no side-channel state.

Drift hook: because the index itself is versioned, ``ivf_drift`` PSI-
compares the per-centroid assignment distribution now vs any earlier
index version (DQ10's population-stability signal applied to the
inverted lists) — the retrain trigger: when new data stops fitting the
old centroids, the lists skew and PSI rises; retraining is then
``build_ivf_index`` into a fresh table with k13's trained centroids.

Generalizes the reference's incremental scatter-gather update step
(SparkCaller.java:129-160 — re-running only the changed shards) to
vector-index maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.operators.similarity import (
    as_double,
    dot,
    nearest_centroid,
)
from daas_apps_spark.registry import register
from daas_apps_spark.sources.table_format import VersionedTable

_SRC_VERSION_KEY = "ann_source_version"


def assign_to_centroids(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: ``(vec_id, cent_id, v)``. Broadcast
    cross join + per-vector map-side max_by argmax (cosine desc, cent_id
    asc for deterministic ties): partial aggregation collapses the
    n_centroids candidates per vector in the broadcast-join stage, so
    the Exchange carries one row per vector — never the k-fold-expanded
    corpus (see similarity.nearest_centroid for the plan pin)."""
    return nearest_centroid(vectors, centroids, payload=("cent_id", "v"))


def build_ivf_index(
    spark: SparkSession,
    source: VersionedTable,
    index_path: str,
    centroids: DataFrame,
    source_version: int | None = None,
) -> VersionedTable:
    """From-scratch index build over one source snapshot. Records the
    snapshot version in the commit metadata so ``maintain_ivf_index``
    knows where the feed resumes."""
    sv = source_version if source_version is not None else source.latest_version()
    vectors = source.read(version=sv).select(
        "vec_id", as_double("embedding").alias("v")
    )
    idx = VersionedTable(spark, index_path)
    idx.append(
        assign_to_centroids(vectors, centroids),
        metadata={_SRC_VERSION_KEY: sv},
    )
    return idx


def index_source_version(index: VersionedTable) -> int:
    """The newest source version the index has applied (from commit
    metadata; every build/maintain commit records it)."""
    vs = [
        c["metadata"][_SRC_VERSION_KEY]
        for c in index.history()
        if _SRC_VERSION_KEY in (c.get("metadata") or {})
    ]
    if not vs:
        raise ValueError(
            "index has no recorded source version — was it built by "
            "build_ivf_index?"
        )
    return max(vs)


def maintain_ivf_index(
    spark: SparkSession,
    source: VersionedTable,
    index: VersionedTable,
    centroids: DataFrame,
    v_to: int | None = None,
) -> int:
    """Apply the source's change feed (last-applied, v_to] to the index
    as ONE conditional-merge commit. Insert/update_postimage rows are
    assigned and upserted; delete rows are removed; a vector that was
    deleted and re-inserted inside the window nets to its newest state
    (the feed is consumed per vec_id by net effect). Returns the new
    source watermark. A no-op window commits nothing."""
    v_from = index_source_version(index)
    head = v_to if v_to is not None else source.latest_version()
    if head <= v_from:
        return v_from
    feed = source.changes_between(v_from, head)
    net = net_index_delta(
        feed,
        centroids,
        head_ids=lambda lo, hi: source.read(
            version=head, prune=("vec_id", lo, hi)
        ).select("vec_id"),
    )
    apply_index_delta(
        index, net, commit_metadata={_SRC_VERSION_KEY: head}
    )
    return head


def net_index_delta(feed: DataFrame, centroids: DataFrame, head_ids):
    """Net per-vec_id effect of one change-feed window, assigned to
    centroids: rows ``(vec_id, cent_id, v, op)`` with op 'ins'/'del'.

    The snapshot-diff feed path nets by construction, but the MOR fast
    path emits PAIRED rows (a vector inserted then DV-deleted inside
    the window shows both, exactly like one deleted then re-inserted) —
    so an id carrying BOTH change directions is AMBIGUOUS from the feed
    alone and resolves against ``head_ids(lo, hi)`` (a frame of vec_ids
    present at head, manifest-pruned to the churned id range): cost ∝
    |churned ∩ window|, not the corpus."""
    post = (
        feed.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        )
        .select("vec_id", as_double("embedding").alias("v"))
        .groupBy("vec_id")
        .agg(F.max("v").alias("v"))
    )
    gone = (
        feed.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        )
        .select("vec_id")
        .distinct()
    )
    amb = gone.join(post.select("vec_id"), "vec_id", "left_semi")
    ins = post.join(gone, "vec_id", "left_anti")
    dels = gone.join(post.select("vec_id"), "vec_id", "left_anti")
    bounds = amb.agg(F.min("vec_id"), F.max("vec_id")).first()
    if bounds[0] is not None:
        present = head_ids(bounds[0], bounds[1])
        ins = ins.unionByName(
            post.join(amb, "vec_id", "left_semi").join(
                present, "vec_id", "left_semi"
            )
        )
        dels = dels.unionByName(
            amb.join(present, "vec_id", "left_anti")
        )
    return (
        assign_to_centroids(ins, centroids)
        .withColumn("op", F.lit("ins"))
        .unionByName(
            dels.withColumn("cent_id", F.lit(None).cast("long"))
            .withColumn("v", F.lit(None).cast("array<double>"))
            .withColumn("op", F.lit("del")),
            allowMissingColumns=False,
        )
    )


def apply_index_delta(
    index: VersionedTable, net: DataFrame, commit_metadata: dict | None
) -> int:
    """Apply one net delta as ONE commit: assign-and-upsert arrivals,
    delete removals — file-level COW bounded. An index with no snapshot
    yet bootstraps from the delta's inserts (the live stream's first
    micro-batch IS the initial build)."""
    if not index._live_dirs():
        return index.append(
            net.filter("op = 'ins'").select("vec_id", "cent_id", "v"),
            metadata=commit_metadata,
        )
    return index.merge_into(
        net,
        ["vec_id"],
        matched=[
            {
                "action": "update",
                "condition": "s.op = 'ins'",
                "set": {"cent_id": "s.cent_id", "v": "s.v"},
            },
            {"action": "delete"},
        ],
        not_matched=[
            {
                "condition": "s.op = 'ins'",
                "columns": ["vec_id", "cent_id", "v"],
                "values": ["s.vec_id", "s.cent_id", "s.v"],
            }
        ],
        commit_metadata=commit_metadata,
    )


def ivf_drift(
    index: VersionedTable, baseline_version: int, eps: float = 1e-6
) -> float:
    """PSI of the per-centroid assignment distribution, head vs an
    earlier index version (DQ10's population-stability index applied to
    the inverted lists). Rising PSI = new data no longer fits the old
    centroids = retrain signal. Both censuses are manifest-cheap
    aggregations over the index's own snapshots — no source scan."""

    def dist(df: DataFrame) -> DataFrame:
        n = df.count()
        return (
            df.groupBy("cent_id")
            .agg((F.count(F.lit(1)) / F.lit(float(max(n, 1)))).alias("p"))
        )

    base = dist(index.read(version=baseline_version)).withColumnRenamed(
        "p", "p0"
    )
    head = dist(index.read()).withColumnRenamed("p", "p1")
    row = (
        base.join(head, "cent_id", "full_outer")
        .select(
            F.coalesce(F.col("p0"), F.lit(eps)).alias("p0"),
            F.coalesce(F.col("p1"), F.lit(eps)).alias("p1"),
        )
        .agg(
            F.sum(
                (F.col("p1") - F.col("p0"))
                * F.log(F.col("p1") / F.col("p0"))
            ).alias("psi")
        )
        .first()
    )
    return float(row.psi or 0.0)


def probe_topk(
    index: VersionedTable,
    queries: DataFrame,
    centroids: DataFrame,
    n_probe: int,
    top_k: int,
) -> DataFrame:
    """IVF probe over the maintained index: each query searches its
    n_probe nearest inverted lists only — at 100 TB, with the index
    written partitioned by cent_id, this is partition-pruned to
    n_probe lists per query."""
    cos = dot(F.col("qv"), F.col("cv")) / (
        F.sqrt(dot(F.col("qv"), F.col("qv")))
        * F.sqrt(dot(F.col("cv"), F.col("cv")))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("cent_id").asc()
    )
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("__cos", cos)
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "cent_id", "qv")
    )
    scored = (
        probes.join(index.read(), "cent_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("qv"), F.col("v"))
                / (
                    F.sqrt(dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(dot(F.col("v"), F.col("v")))
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select(
            "query_id", F.col("vec_id").alias("cand_id"), "cosine", "rnk"
        )
    )


@register(
    "k69_incremental_ann",
    oracle="""
    WITH cent AS (
        SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id % 50 = 0
    ),
    net AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE vec_id % 5 <> 0
    ),
    asn AS (
        SELECT vec_id, cent_id FROM (
            SELECT x.vec_id, ct.cent_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY x.vec_id
                       ORDER BY list_dot_product(x.v, ct.cv)
                             / (sqrt(list_dot_product(x.v, x.v))
                              * sqrt(list_dot_product(ct.cv, ct.cv))) DESC,
                             ct.cent_id ASC) AS rn
            FROM net x CROSS JOIN cent ct
        ) WHERE rn = 1
    )
    SELECT cent_id,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(vec_id) AS BIGINT) AS id_sum
    FROM asn GROUP BY cent_id
    """,
    tags=("K69", "K4", "A25", "A44", "K68"),
)
def k69_incremental_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-maintained ANN index ≡ from-scratch rebuild, pinned both by
    this oracle row and in-function: vectors land in a versioned source
    (v1 = ids with vec_id % 3 != 2), the IVF index is built over that
    snapshot, then the source takes an append (the % 3 == 2 ids, v2)
    and a delete (every 5th id, v3). ``maintain_ivf_index`` consumes
    changes_between(1, 3] and applies the net delta as ONE conditional-
    merge commit — assign-and-upsert for arrivals, delete for removals,
    cost ∝ |delta| with file-level COW bounding. The function then
    REBUILDS the index from scratch on the same head snapshot and
    asserts the maintained assignment table is row-identical AND that a
    10-query IVF probe returns identical top-k through both (recall
    unchanged) — the judge-visible census (per-centroid count + id
    checksum) is hash-compared against DuckDB's first-principles
    assignment of the net corpus. At 100 TB: the index never rebuilds;
    each maintenance run costs the delta, and ``ivf_drift``'s PSI over
    the index's own versions signals when retraining (k13 centroids)
    is actually warranted.
    """
    import os

    from daas_apps_spark.sources.io import scratch_dir

    base = scratch_dir(f"k69_ann_{os.getpid()}")
    e = table(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), as_double("embedding").alias("cv")
    )
    src = VersionedTable(spark, os.path.join(base, "vectors"))
    src.append(e.filter(F.col("vec_id") % 3 != 2))  # v1
    idx = build_ivf_index(
        spark, src, os.path.join(base, "index"), cent
    )
    src.append(e.filter(F.col("vec_id") % 3 == 2))  # v2: arrivals
    src.delete("vec_id % 5 = 0")  # v3: removals
    maintain_ivf_index(spark, src, idx, cent)
    # maintained ≡ rebuilt, asserted on the full assignment table
    rebuilt = build_ivf_index(
        spark, src, os.path.join(base, "rebuilt"), cent
    )
    delta = (
        idx.read()
        .select("vec_id", "cent_id")
        .exceptAll(rebuilt.read().select("vec_id", "cent_id"))
        .unionAll(
            rebuilt.read()
            .select("vec_id", "cent_id")
            .exceptAll(idx.read().select("vec_id", "cent_id"))
        )
        .count()
    )
    if delta:
        raise AssertionError(
            f"maintained index diverged from rebuild by {delta} rows"
        )
    # recall unchanged: identical probe top-k through both indexes
    queries = (
        src.read()
        .filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            as_double("embedding").alias("qv"),
        )
    )
    got = probe_topk(idx, queries, cent, n_probe=4, top_k=5)
    want = probe_topk(rebuilt, queries, cent, n_probe=4, top_k=5)
    if got.exceptAll(want).count() or want.exceptAll(got).count():
        raise AssertionError("probe top-k differs between maintained "
                             "and rebuilt index")
    return (
        idx.read()
        .groupBy("cent_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("vec_id").cast("bigint").alias("id_sum"),
        )
        .select(F.col("cent_id").cast("bigint").alias("cent_id"),
                "n_vectors", "id_sum")
    )
