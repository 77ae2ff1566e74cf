"""K4: similarity search over embeddings — brute-force top-k (baseline) and
multi-probe random-hyperplane LSH (the 100 TB scale path).

Dot products run as Catalyst higher-order functions (`zip_with` +
`aggregate`) so the hot loop stays in whole-stage codegen — no Python UDF.
The fold is strictly left-to-right in both Spark and DuckDB, making the
float64 result bit-identical across engines; ranking still rounds to 6
decimals before ordering (FIXTURES.md rule 2) with vec_id tie-breaks.

Scale design:
- Brute force: queries are broadcast (tiny side), candidates stream through
  map-side; the only shuffle is the per-query top-k aggregation. Good to
  ~10⁴ queries × any corpus size; cost is linear scans.
- LSH/IVF path: bucket the corpus once by hyperplane-sign signature (a
  narrow column), join queries on bucket keys (multi-probe: the query also
  probes all 1-bit-flip buckets), rank only within probed buckets. Corpus
  re-partitioning by bucket makes the probe join shuffle-free on re-use.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.registry import register

N_QUERY = 10  # vec_id < 10 are the query vectors
TOP_K = 5
N_PLANES = 6  # LSH hyperplanes → 64 buckets
DIMS = 64
COSINE_NEARDUP_THRESHOLD = 0.4


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays (codegen, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def nearest_centroid(
    corpus: DataFrame, cent: DataFrame, payload: tuple[str, ...] = ("cent_id",)
) -> DataFrame:
    """Nearest-centroid assignment as a map-side aggregate:
    ``(vec_id, *payload)`` with payload taken from the winning
    (corpus × centroid) candidate. ``corpus`` must carry
    (vec_id, v array<double>), ``cent`` (cent_id, cv array<double>).

    Plan shape (pinned in tests/test_plans.py): the naive argmax —
    ``row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC)`` over
    ``crossJoin(broadcast(cent))`` — forces an Exchange of the
    k-fold-expanded corpus (|corpus| × n_centroids rows) into the window
    sort; at 100 TB with nlist in the thousands that is a thousands-fold
    shuffle expansion. Here the argmax is
    ``groupBy(vec_id).agg(max_by(payload, (cos, -cent_id)))``: partial
    aggregation collapses each vector's n_centroids candidates in the
    same stage as the broadcast join, so the Exchange carries ONE row
    per vector. The (cos, -cent_id) max key replicates the window
    form's (cos DESC, cent_id ASC) order exactly — ties break to the
    lowest cent_id, so results stay bit-identical to the DuckDB
    ROW_NUMBER oracles."""
    cos_vc = dot(F.col("v"), F.col("cv")) / (
        F.sqrt(dot(F.col("v"), F.col("v")))
        * F.sqrt(dot(F.col("cv"), F.col("cv")))
    )
    return (
        corpus.crossJoin(F.broadcast(cent))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload]),
                F.struct(
                    cos_vc.alias("s"), (-F.col("cent_id")).alias("t")
                ),
            ).alias("__best")
        )
        .select("vec_id", "__best.*")
    )


_DUCK_COS = (
    "ROUND(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))), 6)"
)


@register(
    "k4_cosine_topk",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               {_DUCK_COS} AS cosine
        FROM embeddings q CROSS JOIN embeddings c
        WHERE q.vec_id < {N_QUERY} AND q.vec_id <> c.vec_id
    )
    SELECT query_id, cand_id, cosine, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, cand_id ASC) AS rnk
        FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
    tags=("K4", "F5"),
    bench=True,
)
def k4_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast queries × streamed candidates."""
    e = table(spark, sf_dir, "embeddings")
    # Norms are precomputed per VECTOR, not per pair: higher-order-function
    # folds evaluate interpreted (outside codegen), so the pair loop should
    # run exactly ONE fold (q·c), not three. sqrt(dot(v,v)) is the same
    # float64 value wherever it is computed, so the oracle is unchanged.
    q = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"), as_double("embedding").alias("qv")
    ).withColumn("qn", F.sqrt(dot(F.col("qv"), F.col("qv"))))
    c = e.select(
        F.col("vec_id").alias("cand_id"), as_double("embedding").alias("cv")
    ).withColumn("cn", F.sqrt(dot(F.col("cv"), F.col("cv"))))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", "cosine", "rnk")
    )


@register(
    "k4_embedding_neardup",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
           ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 4)
               AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
          / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
           * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
          >= {COSINE_NEARDUP_THRESHOLD}
    """,
    tags=("K4", "K3", "C11"),
)
def k4_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label.

    Label-blocking stands in for the cluster/bucket blocking a 100 TB
    pipeline would use (LSH bucket or IVF centroid): the O(n²) pair space
    is only ever materialized within a block.
    """
    e = table(spark, sf_dir, "embeddings")
    # per-vector norm precompute — one interpreted HOF fold per PAIR, not
    # three (same float64 values, oracle unchanged; see k4_cosine_topk)
    a = e.select(
        "label", F.col("vec_id").alias("vec_a"), as_double("embedding").alias("va")
    ).withColumn("na", F.sqrt(dot(F.col("va"), F.col("va"))))
    b = e.select(
        F.col("label").alias("label_b"), F.col("vec_id").alias("vec_b"),
        as_double("embedding").alias("vb"),
    ).withColumn("nb", F.sqrt(dot(F.col("vb"), F.col("vb"))))
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= COSINE_NEARDUP_THRESHOLD)
        .select("vec_a", "vec_b", "label", F.round("cos_raw", 4).alias("cosine"))
    )


def hyperplanes(n_planes: int = N_PLANES, dims: int = DIMS) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 nibbles (seeded,
    partition-independent — SURVEY.md §7 determinism discipline)."""
    planes = []
    for j in range(n_planes):
        comps = []
        for d in range(dims):
            h = hashlib.md5(f"plane{j}:dim{d}".encode()).hexdigest()
            comps.append((int(h[0], 16) - 7.5) / 7.5)
        planes.append(comps)
    return planes


def bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Hyperplane-sign bit-string bucket key for a double-array column."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(c) for c in p])) > 0, "1").otherwise("0")
        for p in planes
    ]
    return F.concat(*bits)


@register(
    "k4_ann_lsh_topk",
    oracle=None,  # approximate by construction; recall vs brute force asserted in tests/test_similarity.py
    tags=("K4", "K3"),
)
def k4_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via multi-probe random-hyperplane LSH.

    Corpus vectors hash to one bucket each; every query probes its own
    bucket plus all 1-bit-flip neighbors (multi-probe), then ranks exact
    cosine only within probed buckets. At 100 TB: bucket once, partition the
    corpus by bucket key, and the probe join becomes a co-located lookup.
    """
    planes = hyperplanes()
    e = table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", as_double("embedding").alias("v")).withColumn(
        "bucket", bucket_col(F.col("v"), planes)
    )
    cands = base.select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"), "bucket"
    )
    q = base.filter(F.col("vec_id") < N_QUERY)
    # Multi-probe: own bucket + each single-bit flip.
    probe_cols = [F.col("bucket")]
    for i in range(N_PLANES):
        flipped = F.concat(
            F.substring("bucket", 1, i),
            F.when(F.substring("bucket", i + 1, 1) == "1", "0").otherwise("1"),
            F.substring("bucket", i + 2, N_PLANES - i - 1),
        )
        probe_cols.append(flipped)
    probes = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.explode(F.array(*probe_cols)).alias("bucket"),
    )
    scored = (
        probes.join(cands, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (
                    F.sqrt(dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(dot(F.col("cv"), F.col("cv")))
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", "cosine", "rnk")
    )


CENT_MOD = 50  # vec_id % 50 == 0 → centroids (40 at sf0.01's 2000 vectors)
N_PROBE = 4  # inverted lists probed per query


_DUCK_COS_VC = (
    "list_dot_product(x.v, ct.cv)"
    " / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(ct.cv, ct.cv)))"
)


@register(
    "k4_ann_ivf_topk",
    oracle=f"""
    WITH cent AS (
        SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id % {CENT_MOD} = 0
    ),
    corpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    asn AS (
        SELECT vec_id, cent_id, v FROM (
            SELECT x.vec_id, ct.cent_id, x.v,
                   ROW_NUMBER() OVER (PARTITION BY x.vec_id
                                      ORDER BY {_DUCK_COS_VC} DESC, ct.cent_id ASC) AS rn
            FROM corpus x CROSS JOIN cent ct
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id AS query_id, cent_id, v AS qv FROM (
            SELECT x.vec_id, ct.cent_id, x.v,
                   ROW_NUMBER() OVER (PARTITION BY x.vec_id
                                      ORDER BY {_DUCK_COS_VC} DESC, ct.cent_id ASC) AS rn
            FROM corpus x CROSS JOIN cent ct
            WHERE x.vec_id < {N_QUERY}
        ) WHERE rn <= {N_PROBE}
    ),
    scored AS (
        SELECT p.query_id, a.vec_id AS cand_id,
               ROUND(list_dot_product(p.qv, a.v)
                     / (sqrt(list_dot_product(p.qv, p.qv))
                      * sqrt(list_dot_product(a.v, a.v))), 6) AS cosine
        FROM probes p JOIN asn a ON p.cent_id = a.cent_id AND p.query_id <> a.vec_id
    )
    SELECT query_id, cand_id, cosine, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, cand_id ASC) AS rnk
        FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
    tags=("K4", "F5", "C5"),
)
def k4_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via IVF-Flat: centroid assignment → inverted lists → probe.

    Centroids here are a deterministic coreset (every CENT_MOD-th vector) so
    the result is exactly reproducible and oracle-checkable; swapping in
    trained centroids is exactly the Lloyd iteration implemented (and
    oracle-verified) in operators/clustering.py (k13) — k16's SemDeDup
    blocking already composes it. The Spark plumbing here (broadcast
    centroids, map-side nearest-centroid assignment, partition-by-centroid
    inverted lists, N_PROBE-bounded probe join) is identical either way. Unlike brute force the
    probe cost is |probed lists|, not |corpus|: at 100 TB the corpus is
    written partitioned by cent_id and each query touches N_PROBE
    partitions (partition pruning on the probe join key).
    """
    e = table(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") % CENT_MOD == 0).select(
        F.col("vec_id").alias("cent_id"), as_double("embedding").alias("cv")
    )
    corpus = e.select("vec_id", as_double("embedding").alias("v"))
    cos_vc = dot(F.col("v"), F.col("cv")) / (
        F.sqrt(dot(F.col("v"), F.col("v"))) * F.sqrt(dot(F.col("cv"), F.col("cv")))
    )
    asn = nearest_centroid(corpus, cent, payload=("cent_id", "v"))
    w_asn = Window.partitionBy("vec_id").orderBy(
        F.col("cos_vc").desc(), F.col("cent_id").asc()
    )
    probes = (
        corpus.filter(F.col("vec_id") < N_QUERY)
        .crossJoin(F.broadcast(cent))
        .withColumn("cos_vc", cos_vc)
        .withColumn("rn", F.row_number().over(w_asn))
        .filter(F.col("rn") <= N_PROBE)
        .select(F.col("vec_id").alias("query_id"), "cent_id", F.col("v").alias("qv"))
    )
    scored = (
        probes.join(asn, "cent_id")
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
        .select("query_id", F.col("vec_id").alias("cand_id"), "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", "cosine", "rnk")
    )


# Tuned on the synthetic fixtures (i.i.d. random embeddings — PQ's WORST
# case, no cluster structure to exploit): 16 subspaces × 4 dims at 125
# codewords holds recall ≈ 0.52 vs the IVF-Flat probe ceiling of 0.64;
# coarser grids (4×16 @ 63 words) collapse to ≈ 0.18. Real embedding
# corpora cluster, so production would use FEWER subspaces for the same
# recall — the knob trades code bytes (PQ_M per vector) against error.
PQ_M = 16  # product-quantization subspaces (64 dims → 16 × 4)
PQ_SUB = DIMS // PQ_M
PQ_MOD = 4  # vec_id % 4 == 0 → codebook coreset (~125 entries per subspace)


def pq_reconstructions(corpus: DataFrame) -> DataFrame:
    """(vec_id, rv): each corpus vector PQ-encoded then decoded — every
    sub-vector snapped to its nearest coreset codeword (argmin of
    ||e||² − 2·x·e, code-id tie-breaks), codewords concatenated back in
    subspace order. ``corpus`` must have (vec_id long, v array<double>).
    All distances are left-to-right `dot` folds so the argmin decisions
    are bit-stable across engines."""
    spark = corpus.sparkSession
    sub = spark.createDataFrame(
        [(m, m * PQ_SUB + 1) for m in range(PQ_M)], "m int, lo int"
    )
    # codebook: coreset sub-vectors per subspace (broadcast both ways)
    cb = (
        corpus.filter(F.col("vec_id") % PQ_MOD == 0)
        .crossJoin(F.broadcast(sub))
        .select(
            "m",
            F.col("vec_id").alias("code_id"),
            F.expr(f"slice(v, lo, {PQ_SUB})").alias("ev"),
        )
    )
    xsub = corpus.crossJoin(F.broadcast(sub)).select(
        "vec_id", "m", F.expr(f"slice(v, lo, {PQ_SUB})").alias("xm")
    )
    # per-(vector, subspace) argmin as a map-side min_by aggregate — the
    # codeword fan-out (|corpus| × PQ_M × |codebook|) collapses to PQ_M
    # rows per vector BEFORE the Exchange (same plan discipline as
    # nearest_centroid; a row_number window here would shuffle the full
    # fan-out). min key (d2, code_id) ≡ ORDER BY d2 ASC, code_id ASC.
    d2 = dot(F.col("ev"), F.col("ev")) - F.lit(2) * dot(
        F.col("xm"), F.col("ev")
    )
    enc = (
        xsub.join(F.broadcast(cb), "m")
        .groupBy("vec_id", "m")
        .agg(
            F.min_by(
                F.col("ev"),
                F.struct(d2.alias("d2"), F.col("code_id").alias("c")),
            ).alias("ev")
        )
    )
    # decode once per corpus vector: subspace codewords concatenated in
    # subspace order (array_sort on (m, ev) structs orders by m first)
    return enc.groupBy("vec_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "ev"))),
                lambda s: s["ev"],
            )
        ).alias("rv")
    )


@register(
    "k4_ann_ivf_pq_topk",
    oracle=f"""
    WITH corpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    sub AS (
        SELECT * FROM (VALUES
            {", ".join(f"({m}, {m * (DIMS // PQ_M) + 1}, {(m + 1) * (DIMS // PQ_M)})" for m in range(PQ_M))}
        ) t(m, lo, hi)
    ),
    cb AS (
        SELECT x.vec_id AS code_id, s.m, x.v[s.lo:s.hi] AS ev
        FROM corpus x CROSS JOIN sub s WHERE x.vec_id % {PQ_MOD} = 0
    ),
    enc AS (
        SELECT vec_id, m, ev FROM (
            SELECT x.vec_id, s.m, cb.ev,
                   ROW_NUMBER() OVER (
                       PARTITION BY x.vec_id, s.m
                       ORDER BY list_dot_product(cb.ev, cb.ev)
                                - 2 * list_dot_product(x.v[s.lo:s.hi], cb.ev) ASC,
                                cb.code_id ASC) AS rn
            FROM corpus x CROSS JOIN sub s
            JOIN cb ON cb.m = s.m
        ) WHERE rn = 1
    ),
    rvs AS (
        SELECT vec_id, flatten(list(ev ORDER BY m)) AS rv
        FROM enc GROUP BY vec_id
    ),
    cent AS (
        SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id % {CENT_MOD} = 0
    ),
    asn AS (
        SELECT vec_id, cent_id FROM (
            SELECT x.vec_id, ct.cent_id,
                   ROW_NUMBER() OVER (PARTITION BY x.vec_id
                                      ORDER BY {_DUCK_COS_VC} DESC, ct.cent_id ASC) AS rn
            FROM corpus x CROSS JOIN cent ct
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id AS query_id, cent_id, v AS qv FROM (
            SELECT x.vec_id, ct.cent_id, x.v,
                   ROW_NUMBER() OVER (PARTITION BY x.vec_id
                                      ORDER BY {_DUCK_COS_VC} DESC, ct.cent_id ASC) AS rn
            FROM corpus x CROSS JOIN cent ct
            WHERE x.vec_id < {N_QUERY}
        ) WHERE rn <= {N_PROBE}
    ),
    scored AS (
        SELECT p.query_id, a.vec_id AS cand_id,
               ROUND(list_dot_product(p.qv, r.rv)
                     / (sqrt(list_dot_product(p.qv, p.qv))
                      * sqrt(list_dot_product(r.rv, r.rv))), 6) AS cosine_pq
        FROM probes p
        JOIN asn a ON a.cent_id = p.cent_id AND a.vec_id <> p.query_id
        JOIN rvs r ON r.vec_id = a.vec_id
    )
    SELECT query_id, cand_id, cosine_pq, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine_pq DESC, cand_id ASC) AS rnk
        FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
    tags=("K4", "K25", "F5"),
)
def k4_ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via IVF-PQ: inverted-list pruning (IVF) + product
    quantization (PQ) scoring — the memory-bounded ANN shape for a
    100 TB embedding corpus, where even the probed lists are too large
    to hold raw float vectors in RAM.

    PQ splits each vector into PQ_M subspaces and snaps each sub-vector
    to its nearest codebook entry (argmin of ||e||² − 2·x·e, the
    norm-expanded L2, with code-id tie-breaks); a candidate is then
    scored against the query via its RECONSTRUCTED vector — the
    relational equivalent of ADC table lookups (the packed-uint8-codes +
    lookup-table form is the storage optimization of exactly this
    algebra; per-subspace code rows are its join-friendly form). A
    packed corpus stores PQ_M bytes per vector instead of 8·DIMS —
    32× smaller here, which is what lets a probed list live in memory.

    Codebooks and coarse centroids are deterministic coresets (every
    PQ_MOD-th / CENT_MOD-th vector) so the whole path — encode, probe,
    reconstruct, rank — is exactly reproducible and ORACLE-CHECKABLE
    (unlike the recall-checked LSH arm); swapping in trained codebooks
    is the k13 Lloyd iteration per subspace, plumbing unchanged. Every
    distance is a left-to-right `dot` fold, bit-identical to DuckDB's
    list_dot_product, so argmin encode decisions cannot drift between
    engines; scoring reconstructs ONE 64-dim fold per (query, candidate)
    rather than summing per-subspace partials (float-sum order across a
    groupBy would not be engine-stable).
    """
    e = table(spark, sf_dir, "embeddings")
    corpus = e.select("vec_id", as_double("embedding").alias("v"))
    rvs = pq_reconstructions(corpus)
    cent = e.filter(F.col("vec_id") % CENT_MOD == 0).select(
        F.col("vec_id").alias("cent_id"), as_double("embedding").alias("cv")
    )
    cos_vc = dot(F.col("v"), F.col("cv")) / (
        F.sqrt(dot(F.col("v"), F.col("v")))
        * F.sqrt(dot(F.col("cv"), F.col("cv")))
    )
    asn = nearest_centroid(corpus, cent, payload=("cent_id",))
    w_asn = Window.partitionBy("vec_id").orderBy(
        F.col("cos_vc").desc(), F.col("cent_id").asc()
    )
    probes = (
        corpus.filter(F.col("vec_id") < N_QUERY)
        .crossJoin(F.broadcast(cent))
        .withColumn("cos_vc", cos_vc)
        .withColumn("rn", F.row_number().over(w_asn))
        .filter(F.col("rn") <= N_PROBE)
        .select(
            F.col("vec_id").alias("query_id"), "cent_id", F.col("v").alias("qv")
        )
    )
    scored = (
        probes.join(asn, "cent_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .join(rvs, "vec_id")
        .withColumn(
            "cosine_pq",
            F.round(
                dot(F.col("qv"), F.col("rv"))
                / (
                    F.sqrt(dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(dot(F.col("rv"), F.col("rv")))
                ),
                6,
            ),
        )
        .select("query_id", F.col("vec_id").alias("cand_id"), "cosine_pq")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_pq").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", "cosine_pq", "rnk")
    )


PQ_RERANK = 3 * TOP_K  # PQ shortlist width fed to the exact re-rank


@register(
    "k4_ann_ivf_pq_rerank",
    oracle=f"""
    WITH corpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    sub AS (
        SELECT * FROM (VALUES
            {", ".join(f"({m}, {m * (DIMS // PQ_M) + 1}, {(m + 1) * (DIMS // PQ_M)})" for m in range(PQ_M))}
        ) t(m, lo, hi)
    ),
    cb AS (
        SELECT x.vec_id AS code_id, s.m, x.v[s.lo:s.hi] AS ev
        FROM corpus x CROSS JOIN sub s WHERE x.vec_id % {PQ_MOD} = 0
    ),
    enc AS (
        SELECT vec_id, m, ev FROM (
            SELECT x.vec_id, s.m, cb.ev,
                   ROW_NUMBER() OVER (
                       PARTITION BY x.vec_id, s.m
                       ORDER BY list_dot_product(cb.ev, cb.ev)
                                - 2 * list_dot_product(x.v[s.lo:s.hi], cb.ev) ASC,
                                cb.code_id ASC) AS rn
            FROM corpus x CROSS JOIN sub s
            JOIN cb ON cb.m = s.m
        ) WHERE rn = 1
    ),
    rvs AS (
        SELECT vec_id, flatten(list(ev ORDER BY m)) AS rv
        FROM enc GROUP BY vec_id
    ),
    cent AS (
        SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id % {CENT_MOD} = 0
    ),
    asn AS (
        SELECT vec_id, cent_id FROM (
            SELECT x.vec_id, ct.cent_id,
                   ROW_NUMBER() OVER (PARTITION BY x.vec_id
                                      ORDER BY {_DUCK_COS_VC} DESC, ct.cent_id ASC) AS rn
            FROM corpus x CROSS JOIN cent ct
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id AS query_id, cent_id, v AS qv FROM (
            SELECT x.vec_id, ct.cent_id, x.v,
                   ROW_NUMBER() OVER (PARTITION BY x.vec_id
                                      ORDER BY {_DUCK_COS_VC} DESC, ct.cent_id ASC) AS rn
            FROM corpus x CROSS JOIN cent ct
            WHERE x.vec_id < {N_QUERY}
        ) WHERE rn <= {N_PROBE}
    ),
    shortlist AS (
        SELECT query_id, cand_id, qv FROM (
            SELECT p.query_id, a.vec_id AS cand_id, p.qv,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.query_id
                       ORDER BY ROUND(list_dot_product(p.qv, r.rv)
                                / (sqrt(list_dot_product(p.qv, p.qv))
                                 * sqrt(list_dot_product(r.rv, r.rv))), 6) DESC,
                                a.vec_id ASC) AS prnk
            FROM probes p
            JOIN asn a ON a.cent_id = p.cent_id AND a.vec_id <> p.query_id
            JOIN rvs r ON r.vec_id = a.vec_id
        ) WHERE prnk <= {PQ_RERANK}
    ),
    rescored AS (
        SELECT s.query_id, s.cand_id,
               ROUND(list_dot_product(s.qv, c.v)
                     / (sqrt(list_dot_product(s.qv, s.qv))
                      * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
        FROM shortlist s JOIN corpus c ON c.vec_id = s.cand_id
    )
    SELECT query_id, cand_id, cosine, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, cand_id ASC) AS rnk
        FROM rescored
    ) WHERE rnk <= {TOP_K}
    """,
    tags=("K4", "K25", "F5"),
)
def k4_ann_ivf_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with exact re-rank — the production ANN pipeline: IVF
    prunes the corpus to N_PROBE inverted lists, PQ scores the survivors
    from compressed codes (RAM-resident at 100 TB), and only the
    PQ_RERANK-deep shortlist pays an exact-cosine rescore against raw
    vectors (a point-lookup join: |queries|·PQ_RERANK rows fetched, not
    a scan). Quantization error then only costs recall when the true
    neighbor falls OUT of the shortlist, not when PQ merely misorders it
    — on the i.i.d. worst-case fixtures this lifts recall from the pure
    PQ ranking to the IVF probe ceiling (pinned in
    tests/test_similarity.py). Deterministic coresets keep all three
    stages hash-checkable; same bit-stable `dot` fold discipline as
    k4_ann_ivf_pq_topk.
    """
    e = table(spark, sf_dir, "embeddings")
    corpus = e.select("vec_id", as_double("embedding").alias("v"))
    rvs = pq_reconstructions(corpus)
    cent = e.filter(F.col("vec_id") % CENT_MOD == 0).select(
        F.col("vec_id").alias("cent_id"), as_double("embedding").alias("cv")
    )
    cos_vc = dot(F.col("v"), F.col("cv")) / (
        F.sqrt(dot(F.col("v"), F.col("v")))
        * F.sqrt(dot(F.col("cv"), F.col("cv")))
    )
    asn = nearest_centroid(corpus, cent, payload=("cent_id",))
    w_asn = Window.partitionBy("vec_id").orderBy(
        F.col("cos_vc").desc(), F.col("cent_id").asc()
    )
    probes = (
        corpus.filter(F.col("vec_id") < N_QUERY)
        .crossJoin(F.broadcast(cent))
        .withColumn("cos_vc", cos_vc)
        .withColumn("rn", F.row_number().over(w_asn))
        .filter(F.col("rn") <= N_PROBE)
        .select(
            F.col("vec_id").alias("query_id"), "cent_id", F.col("v").alias("qv")
        )
    )
    w_pq = Window.partitionBy("query_id").orderBy(
        F.col("cosine_pq").desc(), F.col("cand_id").asc()
    )
    shortlist = (
        probes.join(asn, "cent_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .join(rvs, "vec_id")
        .withColumn(
            "cosine_pq",
            F.round(
                dot(F.col("qv"), F.col("rv"))
                / (
                    F.sqrt(dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(dot(F.col("rv"), F.col("rv")))
                ),
                6,
            ),
        )
        .select("query_id", F.col("vec_id").alias("cand_id"), "qv", "cosine_pq")
        .withColumn("prnk", F.row_number().over(w_pq))
        .filter(F.col("prnk") <= PQ_RERANK)
    )
    rescored = (
        shortlist.join(
            corpus.select(F.col("vec_id").alias("cand_id"), "v"), "cand_id"
        )
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
        .select("query_id", "cand_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        rescored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", "cosine", "rnk")
    )


@register(
    "k4_label_centroids",
    oracle="""
    WITH ex AS (
        SELECT vec_id, label, i AS pos, CAST(embedding[i + 1] AS DOUBLE) AS val
        FROM embeddings, unnest(range(len(embedding))) AS t(i)
    ),
    cent AS (
        SELECT label, pos, SUM(val) / COUNT(*) AS c FROM ex GROUP BY label, pos
    ),
    cn AS (
        SELECT label, sqrt(SUM(c * c)) AS cnorm FROM cent GROUP BY label
    ),
    pv AS (
        SELECT ex.vec_id, ex.label,
               SUM(ex.val * cent.c) AS dotc,
               sqrt(SUM(ex.val * ex.val)) AS vnorm
        FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
        GROUP BY ex.vec_id, ex.label
    )
    SELECT pv.label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(MAX(cn.cnorm), 4) AS centroid_norm,
           ROUND(AVG(pv.vnorm), 4) AS avg_vec_norm,
           ROUND(AVG(pv.dotc / (pv.vnorm * cn.cnorm)), 4) AS avg_cos_to_centroid
    FROM pv JOIN cn ON pv.label = cn.label
    GROUP BY pv.label
    """,
    tags=("K4", "K11", "D1"),
)
def k4_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroids + intra-class coherence report.

    The corpus-quality signal for labeled embedding collections: a class
    whose members barely point at their own centroid (low
    ``avg_cos_to_centroid``) is mislabeled or incoherent — the standard
    pre-training triage before class-balanced sampling.

    Shape: posexplode → (label, pos) mean → join back → per-vec dot — two
    aggregation shuffles and one join, all on narrow (id, pos, val) rows;
    no array ever crosses a shuffle, so at 100 TB the shuffle volume is
    dims × rows scalars, and skew is impossible (pos is uniform). Sums are
    rounded to 4 decimals at the report edge only (double addition order
    differs between engines at ~1e-16 relative — same discipline as the
    D7 statistical aggregates).
    """
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.posexplode(as_double("embedding")).alias("pos", "val")
    )
    cent = e.groupBy("label", "pos").agg(
        (F.sum("val") / F.count(F.lit(1))).alias("c")
    )
    cn = cent.groupBy("label").agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cnorm"))
    pv = (
        e.join(cent, ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("val") * F.col("c")).alias("dotc"),
            F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("vnorm"),
        )
    )
    return (
        pv.join(cn, "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.max("cnorm"), 4).alias("centroid_norm"),
            F.round(F.avg("vnorm"), 4).alias("avg_vec_norm"),
            F.round(F.avg(F.col("dotc") / (F.col("vnorm") * F.col("cnorm"))), 4).alias(
                "avg_cos_to_centroid"
            ),
        )
    )


_DUCK_Q_PREP = f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    q8 AS (
        SELECT vec_id, e,
               list_min(e) AS mn,
               (list_max(e) - list_min(e)) / 255.0 AS scale
        FROM v
    ),
    dq AS (
        SELECT vec_id, e,
               CASE WHEN scale = 0 THEN list_transform(e, x -> mn)
                    ELSE list_transform(e, x -> mn + round((x - mn) / scale) * scale)
               END AS d
        FROM q8
    ),
    exact AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_dot_product(q.e, c.e)
                       / (sqrt(list_dot_product(q.e, q.e))
                        * sqrt(list_dot_product(c.e, c.e))), 6) DESC,
                       c.vec_id ASC) AS rnk
        FROM v q CROSS JOIN v c
        WHERE q.vec_id < {N_QUERY} AND q.vec_id <> c.vec_id
        QUALIFY rnk <= {TOP_K}
    ),
    quant AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_dot_product(q.d, c.d)
                       / (sqrt(list_dot_product(q.d, q.d))
                        * sqrt(list_dot_product(c.d, c.d))), 6) DESC,
                       c.vec_id ASC) AS rnk
        FROM dq q CROSS JOIN dq c
        WHERE q.vec_id < {N_QUERY} AND q.vec_id <> c.vec_id
        QUALIFY rnk <= {TOP_K}
    )
"""


@register(
    "k25_quantized_recall",
    oracle=_DUCK_Q_PREP
    + f"""
    SELECT e.query_id,
           CAST(COUNT(qt.cand_id) AS BIGINT) AS n_overlap,
           ROUND(COUNT(qt.cand_id) / {TOP_K}.0, 4) AS recall_at_{TOP_K}
    FROM exact e
    LEFT JOIN quant qt ON e.query_id = qt.query_id AND e.cand_id = qt.cand_id
    GROUP BY e.query_id
    """,
    tags=("K25", "K4"),
)
def k25_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization with top-k recall audit: per-vector
    min/max affine quantization to 256 levels (4× memory cut at 100 TB —
    the difference between an in-memory and a spilled ANN corpus), then
    recall@k of quantized-cosine top-k against the exact float top-k.

    The audit IS the operator's acceptance test: ship the quantized
    representation only where measured recall holds. Both rankings run the
    same broadcast-queries × streamed-candidates plan as k4_cosine_topk;
    dequantized values (mn + q·scale) are reconstructed with the same
    arithmetic on both engines, so the report hash-matches bit-for-bit.

    Scale: quantization is a map-side per-row transform (no shuffle); the
    recall join touches only 2·|queries|·k rows. At corpus scale the
    quantized table is what K4's ANN paths (LSH/IVF) would index —
    re-ranking the shortlist with full-precision vectors restores exact
    ordering at the end, the standard two-stage retrieval design.
    """
    e = table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id").isNotNull()).select(
        "vec_id", as_double("embedding").alias("e")
    )
    mn = F.array_min("e")
    scale = (F.array_max("e") - F.array_min("e")) / F.lit(255.0)
    dq = base.select(
        "vec_id",
        "e",
        F.when(
            scale == 0, F.transform("e", lambda x: mn)
        )
        .otherwise(
            F.transform("e", lambda x: mn + F.round((x - mn) / scale, 0) * scale)
        )
        .alias("d"),
    )

    def topk(df: DataFrame, col: str) -> DataFrame:
        q = df.filter(F.col("vec_id") < N_QUERY).select(
            F.col("vec_id").alias("query_id"), F.col(col).alias("qv")
        ).withColumn("qn", F.sqrt(dot(F.col("qv"), F.col("qv"))))
        c = df.select(
            F.col("vec_id").alias("cand_id"), F.col(col).alias("cv")
        ).withColumn("cn", F.sqrt(dot(F.col("cv"), F.col("cv"))))
        scored = (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("query_id") != F.col("cand_id"))
            .withColumn(
                "cosine",
                F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("cand_id").asc()
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= TOP_K)
            .select("query_id", "cand_id")
        )

    exact = topk(dq, "e")
    quant = topk(dq, "d").withColumnRenamed("cand_id", "q_cand")
    return (
        exact.join(
            quant,
            (exact.query_id == quant.query_id) & (exact.cand_id == quant.q_cand),
            "left",
        )
        .groupBy(exact.query_id)
        .agg(
            F.count("q_cand").alias("n_overlap"),
            F.round(F.count("q_cand") / F.lit(float(TOP_K)), 4).alias(
                f"recall_at_{TOP_K}"
            ),
        )
    )


NEG_K = 5  # negatives sampled per query vector


@register(
    "k44_negative_sampling",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, label AS q_label, embedding AS qe
        FROM embeddings WHERE vec_id < {N_QUERY}
    ),
    cand AS (
        SELECT q.query_id, q.q_label, c.vec_id AS cand_id,
               c.label AS cand_label,
               substring(md5(q.query_id || '_' || c.vec_id), 1, 16) AS h,
               ROUND(list_dot_product(CAST(q.qe AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]),
                                              CAST(q.qe AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                              CAST(c.embedding AS DOUBLE[])))),
                     6) AS cosine
        FROM q JOIN embeddings c ON c.label <> q.q_label
    )
    SELECT query_id, q_label, cand_id, cand_label, cosine,
           CAST(rnk AS INTEGER) AS neg_rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY h, cand_id) AS rnk
        FROM cand
    ) WHERE rnk <= {NEG_K}
    """,
    tags=("K44", "K4", "K9"),
)
def k44_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    each query vector draws {NEG_K} pseudo-random negatives from OTHER
    label classes, selected by md5(query, candidate) hash order — the K9
    hash-not-rand sampling rule applied to pair construction, so the
    sample is reproducible across partitionings, engines, and re-runs
    (seeded RNG sampling is not, under Spark's split-by-partition RNG).
    The cosine of each sampled pair is reported as the hardness signal a
    curriculum would bucket on.

    Scale: queries broadcast (the K4 pattern); candidates stream map-side
    through the hash projection; the only shuffle is the per-query
    top-{NEG_K} rank — with millions of queries, swap the window for the
    F4 TakeOrderedAndProject-per-group form or pre-filter on a hash
    threshold (keep h < p) to bound the ranked set.
    """
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        as_double("embedding").alias("qv"),
    ).withColumn("qn", F.sqrt(dot(F.col("qv"), F.col("qv"))))
    c = e.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cand_label"),
        as_double("embedding").alias("cv"),
    ).withColumn("cn", F.sqrt(dot(F.col("cv"), F.col("cv"))))
    cand = (
        c.join(F.broadcast(q), F.col("cand_label") != F.col("q_label"))
        .withColumn(
            "h",
            F.substring(
                F.md5(
                    F.concat(
                        F.col("query_id").cast("string"),
                        F.lit("_"),
                        F.col("cand_id").cast("string"),
                    )
                ),
                1,
                16,
            ),
        )
        .withColumn(
            "cosine",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("h").asc(), F.col("cand_id").asc())
    return (
        cand.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= NEG_K)
        .select("query_id", "q_label", "cand_id", "cand_label", "cosine", "neg_rank")
    )


TRUNC_DIM = 16  # matryoshka prefix: keep the first 16 of 64 dims (4x cut)


@register(
    "k49_truncation_recall",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    tr AS (
        SELECT vec_id, e, (e)[1:{TRUNC_DIM}] AS t FROM v
    ),
    exact AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_dot_product(q.e, c.e)
                       / (sqrt(list_dot_product(q.e, q.e))
                        * sqrt(list_dot_product(c.e, c.e))), 6) DESC,
                       c.vec_id ASC) AS rnk
        FROM v q CROSS JOIN v c
        WHERE q.vec_id < {N_QUERY} AND q.vec_id <> c.vec_id
        QUALIFY rnk <= {TOP_K}
    ),
    trunc AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_dot_product(q.t, c.t)
                       / (sqrt(list_dot_product(q.t, q.t))
                        * sqrt(list_dot_product(c.t, c.t))), 6) DESC,
                       c.vec_id ASC) AS rnk
        FROM tr q CROSS JOIN tr c
        WHERE q.vec_id < {N_QUERY} AND q.vec_id <> c.vec_id
        QUALIFY rnk <= {TOP_K}
    )
    SELECT e.query_id,
           CAST(COUNT(t.cand_id) AS BIGINT) AS n_overlap,
           ROUND(COUNT(t.cand_id) / {TOP_K}.0, 4) AS recall_at_{TOP_K}
    FROM exact e
    LEFT JOIN trunc t ON e.query_id = t.query_id AND e.cand_id = t.cand_id
    GROUP BY e.query_id
    """,
    tags=("K49", "K25", "K4"),
)
def k49_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-truncation recall audit (matryoshka retrieval — Kusupati
    et al. 2022): rank with only the first TRUNC_DIM=16 of 64 dimensions
    (4× memory/compute cut) and measure top-k recall against full-
    precision cosine — k25's audit-the-compression contract applied to
    the OTHER production shrink axis. MRL-style prefixes are the standard
    two-stage design: shortlist on the truncated prefix, re-rank the
    shortlist with full vectors.

    Truncation is ``slice(...)`` — a per-row projection, no shuffle, and
    the prefix slice of an existing column (unlike quantization, no
    arithmetic to reconcile: the sliced values are bit-identical on both
    engines by construction). Both rankings run the broadcast-queries ×
    streamed-candidates plan of k4_cosine_topk; the recall join touches
    2·|queries|·k rows.
    """
    e = table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id").isNotNull()).select(
        "vec_id", as_double("embedding").alias("e")
    )
    tr = base.withColumn("t", F.slice("e", 1, TRUNC_DIM))

    def topk(df: DataFrame, col: str) -> DataFrame:
        q = df.filter(F.col("vec_id") < N_QUERY).select(
            F.col("vec_id").alias("query_id"), F.col(col).alias("qv")
        ).withColumn("qn", F.sqrt(dot(F.col("qv"), F.col("qv"))))
        c = df.select(
            F.col("vec_id").alias("cand_id"), F.col(col).alias("cv")
        ).withColumn("cn", F.sqrt(dot(F.col("cv"), F.col("cv"))))
        scored = (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("query_id") != F.col("cand_id"))
            .withColumn(
                "cosine",
                F.round(
                    dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                    6,
                ),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("cand_id").asc()
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= TOP_K)
            .select("query_id", "cand_id")
        )

    exact = topk(tr, "e")
    trunc = topk(tr, "t").withColumnRenamed("cand_id", "t_cand")
    return (
        exact.join(
            trunc,
            (exact.query_id == trunc.query_id)
            & (F.col("cand_id") == F.col("t_cand")),
            "left",
        )
        .drop(trunc.query_id)
        .groupBy("query_id")
        .agg(
            F.count("t_cand").alias("n_overlap"),
            F.round(F.count("t_cand") / float(TOP_K), 4).alias(
                f"recall_at_{TOP_K}"
            ),
        )
    )


@register(
    "dq9_embedding_audit",
    oracle=f"""
    WITH base AS (
        SELECT label, len(embedding) AS dim,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS norm,
               len(list_filter(CAST(embedding AS DOUBLE[]),
                               x -> x = 0.0)) = len(embedding) AS is_zero,
               len(list_filter(CAST(embedding AS DOUBLE[]),
                               x -> isnan(x) OR NOT isfinite(x))) > 0
                   AS has_nonfinite
        FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(COUNT(CASE WHEN dim = {DIMS} THEN 1 END) AS BIGINT) AS n_dim_ok,
           CAST(COUNT(CASE WHEN is_zero THEN 1 END) AS BIGINT) AS n_zero,
           CAST(COUNT(CASE WHEN has_nonfinite THEN 1 END) AS BIGINT)
               AS n_nonfinite,
           ROUND(MIN(norm), 4) AS min_norm,
           ROUND(MAX(norm), 4) AS max_norm
    FROM base GROUP BY label
    """,
    tags=("DQ9", "K4", "DQ2"),
)
def dq9_embedding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality audit: per label, dimension-consistency count,
    zero-vector and non-finite detection, and the norm range — the
    ingest gate an ANN index needs BEFORE the K4 family touches the
    corpus (a zero vector makes cosine undefined; a NaN poisons every
    distance it meets; a dimension mismatch crashes the index build at
    the worst possible time). The DQ2/DQ4 audit discipline applied to
    the vector column: report, never enforce.

    Determinism: norms come from the same sequential-fold Σx² both
    engines use for the K4 dot products (identical bits), min/max are
    order statistics, every count is exact; ROUND(,4) absorbs nothing —
    it is presentation only.

    Scale: one map-side projection per vector + a |labels|-row
    aggregate; the scan reads two columns. At 100 TB this runs as the
    validation pass of the embedding-ingest job, sharing its scan.
    """
    e = table(spark, sf_dir, "embeddings")
    emb = as_double("embedding")
    base = e.select(
        "label",
        F.size("embedding").alias("dim"),
        F.sqrt(dot(emb, emb)).alias("norm"),
        (
            F.size(F.filter(emb, lambda x: x == 0.0)) == F.size("embedding")
        ).alias("is_zero"),
        (
            F.size(F.filter(emb, lambda x: F.isnan(x) | (F.abs(x) == float("inf"))))
            > 0
        ).alias("has_nonfinite"),
    )
    return base.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.count(F.when(F.col("dim") == DIMS, 1)).alias("n_dim_ok"),
        F.count(F.when(F.col("is_zero"), 1)).alias("n_zero"),
        F.count(F.when(F.col("has_nonfinite"), 1)).alias("n_nonfinite"),
        F.round(F.min("norm"), 4).alias("min_norm"),
        F.round(F.max("norm"), 4).alias("max_norm"),
    )


DRIFT_FP = 1_000_000_000  # 1e-9 fixed-point units for centroid sums


@register(
    "dq10_embedding_drift",
    oracle=f"""
    WITH ex AS (
        SELECT label, vec_id % 2 AS half, CAST(t.i AS INTEGER) AS dim,
               CAST(FLOOR(CAST(embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE)
                          * {DRIFT_FP}) AS BIGINT) AS xf
        FROM embeddings, unnest(range(len(embedding))) AS t(i)
    ),
    coords AS (
        SELECT label, half, dim,
               CAST(SUM(xf) AS DOUBLE)
                   / ({DRIFT_FP}.0 * COUNT(*)) AS coord
        FROM ex GROUP BY label, half, dim
    ),
    cents AS (
        SELECT label, half,
               list_transform(
                   list_sort(list_zip(list(dim), list(coord))),
                   p -> p[2]) AS c
        FROM coords GROUP BY label, half
    ),
    pairs AS (
        SELECT a.label, a.c AS ca, b.c AS cb
        FROM cents a JOIN cents b
          ON a.label = b.label AND a.half = 0 AND b.half = 1
    ),
    sizes AS (
        SELECT label,
               CAST(COUNT(CASE WHEN vec_id % 2 = 0 THEN 1 END) AS BIGINT)
                   AS n_a,
               CAST(COUNT(CASE WHEN vec_id % 2 = 1 THEN 1 END) AS BIGINT)
                   AS n_b
        FROM embeddings GROUP BY label
    )
    SELECT p.label, s.n_a, s.n_b,
           ROUND(list_dot_product(ca, cb)
                 / (sqrt(list_dot_product(ca, ca))
                    * sqrt(list_dot_product(cb, cb))), 6) AS centroid_cosine
    FROM pairs p JOIN sizes s ON s.label = p.label
    """,
    tags=("DQ10", "DQ9", "K13", "K4"),
)
def dq10_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift audit: per label, the cosine between
    the centroids of two deterministic halves of the data (vec_id
    parity) — the self-consistency baseline for "did my embedding model
    or upstream corpus shift" monitoring (in production the two halves
    are yesterday's batch vs today's; a healthy stable distribution
    keeps split-half centroid cosine ≈ 1).

    Determinism where K13's `avg` precedent relies on small groups, this
    audit is exact by construction: coordinates are floor-fixed-pointed
    to 1e-9 BIGINT units (floor, not decimal rounding — no midpoint
    semantics to disagree on), summed exactly in any order, and divided
    once; the cosine then runs the shared sequential-fold dot product.

    Scale: posexplode fans each vector to |dims| narrow rows, aggregated
    map-side by (label, half, dim) — the K13 update-step shape; the
    centroid relation is |labels|×2 rows of dims-length arrays.
    """
    e = table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(as_double("embedding")).alias("dim", "x"),
    ).select(
        "label",
        "half",
        "dim",
        F.floor(F.col("x") * DRIFT_FP).cast("long").alias("xf"),
    )
    coords = ex.groupBy("label", "half", "dim").agg(
        (
            F.sum("xf").cast("double")
            / (F.lit(float(DRIFT_FP)) * F.count(F.lit(1)))
        ).alias("coord")
    )
    cents = coords.groupBy("label", "half").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "coord"))),
            lambda p: p["coord"],
        ).alias("c")
    )
    a = cents.filter(F.col("half") == 0).select("label", F.col("c").alias("ca"))
    b = cents.filter(F.col("half") == 1).select("label", F.col("c").alias("cb"))
    sizes = e.groupBy("label").agg(
        F.count(F.when(F.col("vec_id") % 2 == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("vec_id") % 2 == 1, 1)).alias("n_b"),
    )
    cos = dot(F.col("ca"), F.col("cb")) / (
        F.sqrt(dot(F.col("ca"), F.col("ca")))
        * F.sqrt(dot(F.col("cb"), F.col("cb")))
    )
    return (
        a.join(b, "label")
        .join(sizes, "label")
        .select("label", "n_a", "n_b", F.round(cos, 6).alias("centroid_cosine"))
    )


def _k59_oracle() -> str:
    from daas_apps_spark.registry import REGISTRY

    topk_sql = REGISTRY["k4_cosine_topk"].oracle
    return f"""
    WITH topk AS ({topk_sql}),
    labeled AS (
        SELECT t.query_id, t.rnk,
               (q.label = c.label) AS is_rel
        FROM topk t
        JOIN embeddings q ON q.vec_id = t.query_id
        JOIN embeddings c ON c.vec_id = t.cand_id
    ),
    totals AS (
        SELECT q.vec_id AS query_id,
               CAST(COUNT(*) AS BIGINT) AS n_rel_corpus
        FROM embeddings q JOIN embeddings c
          ON c.label = q.label AND c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERY}
        GROUP BY q.vec_id
    )
    SELECT l.query_id,
           CAST(COUNT(CASE WHEN is_rel THEN 1 END) AS BIGINT) AS n_rel_at_k,
           t.n_rel_corpus,
           CAST(COUNT(CASE WHEN is_rel THEN 1 END) AS DOUBLE) / {TOP_K}
               AS precision_at_k,
           CAST(COUNT(CASE WHEN is_rel THEN 1 END) AS DOUBLE)
               / CAST(LEAST(t.n_rel_corpus, {TOP_K}) AS DOUBLE)
               AS recall_at_k,
           COALESCE(1.0 / CAST(MIN(CASE WHEN is_rel THEN rnk END) AS DOUBLE),
                    0.0) AS mrr_at_k
    FROM labeled l JOIN totals t ON t.query_id = l.query_id
    GROUP BY l.query_id, t.n_rel_corpus
    """


@register(
    "k59_retrieval_eval",
    oracle=_k59_oracle(),
    tags=("K59", "K4", "K28", "D9"),
)
def k59_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IR-metrics evaluation of the dense retriever: the K4 cosine top-k
    ranking scored against label-match relevance (same embedding label =
    relevant, the standard proxy-qrels trick when no human judgments
    exist) — per query, Precision@k, Recall@k (capped-denominator
    variant: |relevant ∧ top-k| / min(|relevant|, k)), and MRR@k. This
    is the acceptance harness every retrieval change runs against; the
    K25/K49 audits measure self-consistency of compressed indexes, this
    measures retrieval QUALITY against ground truth.

    Determinism: ranks are integers from the k4 total-order window;
    every metric is an exact-integer IEEE ratio; ties cannot occur.

    Scale: the ranking inherits k4's broadcast-queries shape; the qrels
    join touches |queries|·k rows plus one |queries|-row relevant-count
    census (label-keyed aggregate, never the corpus pair space).
    """
    topk = k4_cosine_topk(spark, sf_dir)
    lab = table(spark, sf_dir, "embeddings").select("vec_id", "label")
    labeled = (
        topk.join(
            lab.select(F.col("vec_id").alias("query_id"), F.col("label").alias("ql")),
            "query_id",
        )
        .join(
            lab.select(F.col("vec_id").alias("cand_id"), F.col("label").alias("cl")),
            "cand_id",
        )
        .select("query_id", "rnk", (F.col("ql") == F.col("cl")).alias("is_rel"))
    )
    q = lab.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("ql")
    )
    totals = (
        q.join(
            lab.select(F.col("vec_id").alias("cid"), F.col("label").alias("cl")),
            (F.col("ql") == F.col("cl")) & (F.col("cid") != F.col("query_id")),
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_rel_corpus"))
    )
    hits = F.count(F.when(F.col("is_rel"), 1))
    return (
        labeled.groupBy("query_id")
        .agg(
            hits.alias("n_rel_at_k"),
            F.min(F.when(F.col("is_rel"), F.col("rnk"))).alias("first_rel"),
        )
        .join(totals, "query_id")
        .select(
            "query_id",
            "n_rel_at_k",
            "n_rel_corpus",
            (F.col("n_rel_at_k").cast("double") / TOP_K).alias("precision_at_k"),
            (
                F.col("n_rel_at_k").cast("double")
                / F.least(F.col("n_rel_corpus"), F.lit(TOP_K)).cast("double")
            ).alias("recall_at_k"),
            F.coalesce(
                1.0 / F.col("first_rel").cast("double"), F.lit(0.0)
            ).alias("mrr_at_k"),
        )
    )
