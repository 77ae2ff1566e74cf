"""K15/K16: cross-document chunk dedup (reassembly) and semantic dedup.

- **K15 chunk dedup** (`k15_chunk_dedup`): the FineWeb/CCNet-style
  line-level dedup — split every document into disjoint chunks, drop every
  chunk whose exact content already appeared in an earlier document, and
  reassemble the surviving chunks in order. Boilerplate (headers, nav
  bars, license blocks) disappears corpus-wide while unique prose
  survives.
- **K16 semantic dedup** (`k16_semantic_dedup`): the SemDeDup recipe
  (Abbas et al. 2023, published) — cluster embeddings first (K13 k-means),
  then search for near-duplicate pairs ONLY within each cluster. The
  cluster assignment is the blocking key that keeps the pair space linear:
  no cross-cluster pair is ever materialized.

Scale design:

- K15: chunk fan-out is map-side ``explode``; the dedup decision is a
  rank-1 window partitioned by chunk content (high-cardinality key — the
  same single-shuffle shape as K1 exact dedup, pinned there as
  window-not-self-join); reassembly is one shuffle keyed by doc_id with an
  order-pinned ``collect_list`` whose size is bounded by the document
  itself.
- K16: the pairwise stage is a self-join ON the cluster id — worst-case
  cost Σ|cluster|², never N². At 100 TB, k scales with corpus size
  (SemDeDup uses ~100k clusters for web scale) to hold cluster sizes
  bounded; skewed clusters split by a salt on the blocking key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.operators.clustering import _assign, K
from daas_apps_spark.operators.similarity import as_double, dot
from daas_apps_spark.registry import register

CHUNK = 80  # disjoint chunk width (chars) — stride == width, so
# reassembly of all kept chunks reproduces the original text exactly


@register(
    "k15_chunk_dedup",
    oracle=f"""
    WITH chunks AS (
        SELECT doc_id,
               CAST(i AS INTEGER) AS chunk_id,
               substring(text, CAST(i * {CHUNK} + 1 AS INTEGER), {CHUNK}) AS chunk
        FROM documents,
             unnest(range(((length(text) - 1) // {CHUNK}) + 1)) AS t(i)
        WHERE length(text) > 0
    ),
    ranked AS (
        SELECT doc_id, chunk_id, chunk,
               ROW_NUMBER() OVER (PARTITION BY chunk
                                  ORDER BY doc_id, chunk_id) AS rn
        FROM chunks
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ''
                               ORDER BY chunk_id), '') AS cleaned_text
    FROM ranked
    GROUP BY doc_id
    """,
    tags=("K15", "K1", "E1"),
)
def k15_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact chunk dedup with in-order document reassembly.

    A chunk survives only in the FIRST document (lowest doc_id, then
    chunk_id) that contains it; each document is then rebuilt from its
    surviving chunks in chunk order. One window shuffle keyed by chunk
    content + one reassembly shuffle keyed by doc_id — no self-join, no
    pair space.
    """
    d = table(spark, sf_dir, "documents")
    n_chunks = (F.floor((F.length("text") - 1) / CHUNK) + 1).cast("int")
    chunk = F.substring(F.col("text"), F.col("i") * CHUNK + 1, CHUNK)
    w = Window.partitionBy("chunk").orderBy("doc_id", "chunk_id")
    exploded = (
        d.filter(F.length("text") > 0)
        .select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("int").alias("chunk_id"),
            chunk.alias("chunk"),
        )
        .withColumn("rn", F.row_number().over(w))
    )
    kept_chunks = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(F.col("rn") == 1, F.struct("chunk_id", "chunk"))
            )
        ),
        lambda s: s.chunk,
    )
    return exploded.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.array_join(kept_chunks, "").alias("cleaned_text"),
    )


SEM_THRESHOLD = 0.30  # cosine above this within a cluster = near-duplicate
# (fixture embeddings are well-spread: within-cluster cosine p99 ≈ 0.33,
# max ≈ 0.49 — 0.30 flags the top ~1% of in-cluster pairs)


@register(
    "k16_semantic_dedup",
    oracle=f"""
    WITH emb AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    init AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
        FROM emb ORDER BY vec_id LIMIT {K}
    ),
    a1 AS (
        SELECT vec_id, label, v, cid
        FROM (
            SELECT e.vec_id, e.label, e.v, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_dot_product(e.v, e.v)
                                + list_dot_product(c.c, c.c)
                                - 2 * list_dot_product(e.v, c.c),
                                c.cid
                   ) AS rn
            FROM emb e CROSS JOIN init c
        ) WHERE rn = 1
    ),
    pairs AS (
        SELECT a.cid,
               a.vec_id AS keep_id,
               b.vec_id AS dup_id,
               ROUND(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
        FROM a1 a JOIN a1 b
          ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))) > {SEM_THRESHOLD}
    )
    SELECT cid AS cluster_id, keep_id, dup_id, cosine FROM pairs
    """,
    tags=("K16", "K13", "K4"),
)
def k16_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: one k-means assign step blocks the corpus into clusters;
    near-duplicate pairs (cosine > threshold) are searched within each
    cluster only.

    The cluster id is the join key of the pairwise self-join, so the pair
    space is Σ|cluster|² instead of N² — the published recipe's exact
    shape. Emits (cluster, kept, duplicate, cosine) with the kept side
    always the lower vec_id.
    """
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    w_init = Window.orderBy("vec_id")
    centroids = (
        e.orderBy("vec_id")
        .limit(K)
        .select((F.row_number().over(w_init) - 1).alias("cid"), F.col("v").alias("c"))
    )
    assigned = _assign(e, centroids)
    # per-vector norm precompute: the pair loop runs ONE interpreted HOF
    # fold (a·b) instead of three — sqrt(dot(v,v)) is the same float64
    # value wherever computed, so the oracle is unchanged
    a = assigned.select(
        F.col("cid"), F.col("vec_id").alias("keep_id"), F.col("v").alias("va")
    ).withColumn("na", F.sqrt(dot(F.col("va"), F.col("va"))))
    b = assigned.select(
        F.col("cid").alias("cid_b"),
        F.col("vec_id").alias("dup_id"),
        F.col("v").alias("vb"),
    ).withColumn("nb", F.sqrt(dot(F.col("vb"), F.col("vb"))))
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(
            b,
            (a.cid == b.cid_b) & (a.keep_id < b.dup_id),
        )
        .filter(cos > SEM_THRESHOLD)
        .select(
            F.col("cid").cast("long").alias("cluster_id"),
            "keep_id",
            "dup_id",
            F.round(cos, 6).alias("cosine"),
        )
    )


CDC_W = 4  # rolling-window width (chars) for the boundary fingerprint
CDC_DIV = 16  # boundary probability 1/16 → expected chunk length ~16 chars


@register(
    "k51_cdc_chunking",
    oracle=f"""
    WITH cp AS (
        SELECT doc_id, lang, text,
               list_transform(range(1, LENGTH(text) + 1),
                   i -> CAST(unicode(substring(text, CAST(i AS INTEGER), 1)) AS BIGINT)
               ) AS cps
        FROM documents WHERE LENGTH(text) >= {CDC_W}
    ),
    b AS (
        SELECT doc_id, lang, text,
               list_filter(
                   range({CDC_W}, len(cps) + 1),
                   i -> (cps[CAST(i - 3 AS INTEGER)] * 29791
                         + cps[CAST(i - 2 AS INTEGER)] * 961
                         + cps[CAST(i - 1 AS INTEGER)] * 31
                         + cps[CAST(i AS INTEGER)]) % {CDC_DIV} = 0
               ) AS bnd
        FROM cp
    ),
    se AS (
        SELECT doc_id, lang, text,
               [1] || list_transform(bnd, x -> CAST(x + 1 AS BIGINT)) AS starts,
               list_transform(bnd, x -> CAST(x AS BIGINT))
                   || [CAST(LENGTH(text) AS BIGINT)] AS ends
        FROM b
    ),
    ch AS (
        SELECT doc_id, lang,
               UNNEST(list_transform(
                   range(1, len(starts) + 1),
                   j -> substring(text, CAST(starts[j] AS INTEGER),
                                  CAST(ends[j] - starts[j] + 1 AS INTEGER))
               )) AS chunk
        FROM se
    ),
    nz AS (
        SELECT * FROM ch WHERE LENGTH(chunk) > 0
    )
    SELECT lang,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS total_chunks,
           CAST(COUNT(DISTINCT md5(chunk)) AS BIGINT) AS distinct_chunks,
           CAST(COUNT(DISTINCT md5(chunk)) AS DOUBLE) / COUNT(*)
               AS unique_ratio,
           CAST(SUM(LENGTH(chunk)) AS DOUBLE) / COUNT(*) AS avg_chunk_len
    FROM nz
    GROUP BY lang
    """,
    tags=("K51", "K15", "K18"),
    bench=True,
)
def k51_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS rolling-hash trick —
    Muthitacharoen et al. 2001): chunk boundaries land wherever a
    4-char polynomial fingerprint over code points hits 0 mod 16, so boundaries are a pure
    function of LOCAL content. Insert one word into a document and only
    the chunks touching the edit change — every downstream chunk digest
    stays stable — which is why CDC, not fixed-width chunking (K15's
    CHUNK=80 stride), is the dedup-stable choice for storage dedup and
    near-identical-document corpora at 100 TB.

    The boundary scan is the documented exception to the stay-JVM-side
    rule: Spark's higher-order-function lambdas evaluate INTERPRETED per
    element, and the per-character scan measured 2.6 s at sf0.1 as a
    transform/filter pipeline vs 0.27 s as this Arrow-batched pandas UDF
    (numpy rolling dot over code points) — a 10× win that also beats the
    DuckDB oracle's vectorized list kernels (0.48 s). Per-row work never
    leaves the document; the only shuffle is the (lang, digest) census.
    """
    d = table(spark, sf_dir, "documents").filter(F.length("text") >= CDC_W)

    @F.pandas_udf("array<string>")
    def cdc_chunks(texts):
        import numpy as np
        import pandas as pd

        out = []
        for t in texts:
            n = len(t)
            arr = np.fromiter(map(ord, t), dtype=np.int64, count=n)
            h = (
                arr[:-3] * 29791 + arr[1:-2] * 961 + arr[2:-1] * 31 + arr[3:]
            )
            bnd = np.nonzero(h % CDC_DIV == 0)[0] + CDC_W
            starts = np.concatenate(([1], bnd + 1))
            ends = np.concatenate((bnd, [n]))
            out.append(
                [t[s - 1 : e] for s, e in zip(starts, ends) if e >= s]
            )
        return pd.Series(out)

    ch = d.select(
        "doc_id", "lang", F.explode(cdc_chunks("text")).alias("chunk")
    ).filter(F.length("chunk") > 0)
    return ch.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("total_chunks"),
        F.countDistinct(F.md5("chunk")).alias("distinct_chunks"),
        (
            F.countDistinct(F.md5("chunk")).cast("double") / F.count(F.lit(1))
        ).alias("unique_ratio"),
        (
            F.sum(F.length("chunk")).cast("double") / F.count(F.lit(1))
        ).alias("avg_chunk_len"),
    )
