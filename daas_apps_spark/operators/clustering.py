"""K13: distributed k-means over the `embeddings` table (Lloyd's algorithm,
fixed deterministic initialization, fixed iteration count).

The clustering step every embedding-based corpus pipeline runs — topic
bucketing, domain mixing, semantic dedup prep (the published D4 /
SemDeDup-style recipes cluster first, then dedup within clusters). Spark's
MLlib has KMeans, but its seeded sampling init is partition-dependent and
cannot be oracle-checked; this implementation is the same Lloyd iteration
expressed as pure DataFrame algebra with content-deterministic init, so
DuckDB reproduces it bit-for-bit.

Construction (all built-in expressions, no UDFs, no driver-side data):

- **Init**: the k centroids are the embeddings of the k smallest vec_ids —
  deterministic, engine-independent (quality is irrelevant for the
  contract; Lloyd fixes geometry in two steps on well-separated data).
- **Assign**: cross join of N vectors × broadcast k centroids, squared
  distance via the norm identity ‖v−c‖² = v·v + c·c − 2·v·c with every dot
  product a strict left-to-right fold (`zip_with` + `aggregate`) — the
  identical float64 arithmetic DuckDB's `list_dot_product` performs.
  argmin per vector = ROW_NUMBER over (d2, cid) — ties break to the lowest
  centroid id on both engines.
- **Update**: per-(cluster, dimension) mean via `posexplode`, re-assembled
  into centroid arrays with an order-pinned `array_sort(collect_list(...))`.

Scale design: the only broadcast is k×dims model state (bytes); each
iteration is one narrow fan-out (N×k score rows) + one aggregation shuffle
keyed by (cid, dim) — no all-pairs, no skew (cluster sizes bound the
(cid,dim) groups, and dims spreads each cluster over 64 keys). The
iteration count is a compile-time constant here; a production loop swaps
the fixed range for a convergence test on centroid drift with the same
per-iteration plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.operators.similarity import as_double, dot
from daas_apps_spark.registry import register

K = 10
ITERS = 2
DIMS = 64

# DuckDB twin of one assign step: vectors ⨯ centroids → argmin by (d2, cid).
_DUCK_ASSIGN = """
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
        FROM {vectors} e CROSS JOIN {centroids} c
    ) WHERE rn = 1
"""

_DUCK_UPDATE = """
    SELECT cid, list(coord ORDER BY i) AS c
    FROM (
        SELECT cid, i, AVG(v[CAST(i + 1 AS INTEGER)]) AS coord
        FROM {assigned}, unnest(range({dims})) AS t(i)
        GROUP BY cid, i
    ) GROUP BY cid
"""


def _assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """One Lloyd assign step: nearest centroid per vector (broadcast
    k×dims model state). The argmin is a map-side min_by aggregate keyed
    on (d2, cid) — ≡ ORDER BY d2 ASC, cid ASC but the N×k scoring
    fan-out collapses to one row per vector before the Exchange (see
    similarity.nearest_centroid for the plan rationale)."""
    d2 = (
        dot(F.col("v"), F.col("v"))
        + dot(F.col("c"), F.col("c"))
        - 2 * dot(F.col("v"), F.col("c"))
    )
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .groupBy("vec_id")
        .agg(
            F.min_by(
                F.struct("label", "v", "cid"),
                F.struct(d2.alias("d2"), F.col("cid").alias("c")),
            ).alias("__best")
        )
        .select("vec_id", "__best.label", "__best.v", "__best.cid")
    )


def _update(assigned: DataFrame) -> DataFrame:
    """One Lloyd update step: per-(cluster, dim) means → centroid arrays."""
    return (
        assigned.select("cid", F.posexplode("v").alias("i", "x"))
        .groupBy("cid", "i")
        .agg(F.avg("x").alias("coord"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "coord"))),
                lambda s: s.coord,
            ).alias("c")
        )
    )


@register(
    "k13_kmeans_embed",
    oracle=f"""
    WITH emb AS (
        SELECT vec_id, label,
               CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    init AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
        FROM emb ORDER BY vec_id LIMIT {K}
    ),
    a1 AS ({_DUCK_ASSIGN.format(vectors='emb', centroids='init')}),
    c1 AS ({_DUCK_UPDATE.format(assigned='a1', dims=DIMS)}),
    a2 AS ({_DUCK_ASSIGN.format(vectors='emb', centroids='c1')})
    SELECT CAST(cid AS INTEGER) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels,
           CAST(MIN(vec_id) AS BIGINT) AS min_vec_id,
           CAST(MAX(vec_id) AS BIGINT) AS max_vec_id
    FROM a2 GROUP BY cid
    """,
    tags=("K13", "K4", "C8"),
)
def k13_kmeans_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of k-means (k=10) over the embedding vectors;
    returns the final per-cluster census (size, label diversity, id range).

    Assignments after two steps must match DuckDB's recursive-CTE-free
    re-derivation exactly — the strongest oracle an iterative algorithm
    admits. Cluster sizes/labels are exact integers, so the hash only
    depends on the (deterministic) argmin assignments, not on float
    formatting.
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
    for _ in range(ITERS - 1):
        centroids = _update(assigned)
        assigned = _assign(e, centroids)
    return assigned.groupBy(F.col("cid").cast("int").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.countDistinct("label").alias("n_labels"),
        F.min("vec_id").cast("long").alias("min_vec_id"),
        F.max("vec_id").cast("long").alias("max_vec_id"),
    )
