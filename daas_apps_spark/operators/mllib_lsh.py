"""K55: the MLlib alternative path for near-dup candidate generation.

The engine's primary near-dedup is the hand-rolled, oracle-verified
minhash/LSH in operators/dedup.py (pure SQL expressions, engine-portable,
bit-deterministic). Spark also ships a library implementation —
``pyspark.ml.feature.MinHashLSH`` — and a production shop will reasonably
ask "why not just use MLlib?". This module answers by RUNNING it: the same
3-token shingles, hashed into a fixed feature space (``HashingTF``,
binary, no fitted vocabulary so the pipeline stays deterministic under a
pinned seed), through ``MinHashLSH.approxSimilarityJoin`` at the same
Jaccard threshold. tests/test_dedup.py asserts the MLlib candidate set
recalls the hand-rolled verified pair set — the two paths cross-validate.

Declared rows-only: the LSH hash family lives inside MLlib (MurmurHash3
over sampled coefficients), so no DuckDB twin can exist by construction —
exactly the "library operator without an oracle" case SURVEY §2.2 reserves
rows-only checks for. Trade-offs vs the hand-rolled path, measured here:
MLlib carries a fit step (coefficient sampling), per-row sparse vectors,
and a distCol recomputed from the vectors; the SQL path keeps everything
in codegen and hash-matches a second engine. At 100 TB both scale the same
way — band-bucket shuffles, never N² — but only the SQL path is
cross-engine verifiable, which is why it stays primary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    shingles_col,
    tokens_col,
)
from daas_apps_spark.registry import register

HTF_FEATURES = 1 << 18  # fixed hash space — no fitted vocabulary, no tie-order
LSH_TABLES = 6  # == N_BANDS of the hand-rolled path, comparable recall
LSH_SEED = 8211947  # pinned: coefficient sampling is a function of this


@register(
    "k55_mllib_minhash_lsh",
    oracle=None,  # MLlib-internal hash family; recall-vs-exact in test_dedup
    tags=("K55", "K3", "K2"),
)
def k55_mllib_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHashLSH candidate pairs over 3-token shingles: HashingTF
    (binary, 2^18 features) → MinHashLSH(numHashTables=6, pinned seed)
    → approxSimilarityJoin at Jaccard distance ≤ 1 − threshold, ordered
    pairs with the library's exact-on-vectors Jaccard distance.

    The feature step is HashingTF rather than CountVectorizer
    deliberately: no fit over the corpus, so the only model state is the
    seeded coefficient table and the output is reproducible run-to-run —
    the K9 hash-not-rand rule applied to a library pipeline.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col().alias("tokens")
    )
    sh = d.select(
        "doc_id", F.array_distinct(shingles_col(F.col("tokens"))).alias("sh")
    ).filter(F.size("sh") > 0)
    htf = HashingTF(
        inputCol="sh", outputCol="features", numFeatures=HTF_FEATURES, binary=True
    )
    feats = htf.transform(sh).select("doc_id", "features")
    lsh = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=LSH_TABLES,
        seed=LSH_SEED,
    )
    model = lsh.fit(feats)
    # approxSimilarityJoin keeps pairs with distance STRICTLY below the
    # bound; the hand-rolled k3 path keeps Jaccard >= threshold
    # (inclusive), and small shingle sets routinely land on exact ratios
    # like 2/4 — so the bound gets an epsilon to make the boundary
    # inclusive, or every exactly-at-threshold truth pair is missed with
    # probability 1 (not a hash-table miss).
    pairs = model.approxSimilarityJoin(
        feats, feats, (1.0 - JACCARD_THRESHOLD) + 1e-9, distCol="jaccard_dist"
    )
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1.0 - F.col("jaccard_dist"), 4).alias("jaccard"),
        )
    )
