"""K27/K28: retrieval ranking over the corpus — BM25 lexical scoring and
reciprocal-rank fusion of lexical + embedding rankings (hybrid search).

The retrieval side of the LLM-data pipeline: K8 already derives TF/DF/IDF
statistics; these operators turn them into the two rankings a retrieval
stack actually serves — Okapi BM25 (the default lexical scorer in Lucene/
Elasticsearch, published in Robertson & Walker, SIGIR 1994) and RRF fusion
(Cormack, Clarke & Buettcher, SIGIR 2009) combining BM25 with the K4
embedding cosine ranking. Everything is built-in-function Spark: tokenize /
explode / two hash aggregates / broadcast joins; no UDF anywhere.

Determinism: BM25 term contributions are computed with an expression tree
written identically on both engines (FP mult/div are deterministic given
operand order; only ln() may differ in the last ulp, absorbed by the
ROUND(.,4) output discipline). RRF scores are derived purely from integer
ranks (1.0/(k + rank)), so they are bit-identical across engines.

Reference analogy: the broadcast score/model join mirrors the reference's
broadcast side-table pattern (SparkCaller.java:276-283, the per-dataset
target map shipped to every task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.operators.dedup import tokens_col
from daas_apps_spark.operators.similarity import as_double, dot
from daas_apps_spark.registry import register

# A fixed keyword query over the fixture vocabulary. Literals below are
# written as exact decimal literals on BOTH engines (never re-derived as
# k1 + 1 etc.) so the parsed doubles are identical.
QUERY_TERMS = ("spark", "window", "merge")
BM25_K1 = "1.2"
BM25_K1_PLUS_1 = "2.2"
BM25_ONE_MINUS_B = "0.25"
BM25_B = "0.75"
RRF_K = 60  # the standard RRF constant from the published formula
RRF_TOP = 50
_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

# Shared CTE chain: per-doc BM25 over QUERY_TERMS (DuckDB side). The Spark
# side mirrors this expression tree token for token in _bm25_over().
# ``docs_cte`` supplies the scored unit relation (doc_id, t token-array) —
# whole documents for K27/K28, fixed-width chunks for K39.


def _bm25_ctes(docs_cte: str) -> str:
    return f"""
    docs AS (
        {docs_cte}
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(len(t)) AS avgdl
        FROM docs
    ),
    tok AS (
        SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS term
        FROM docs
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf, MAX(dl) AS dl
        FROM tok WHERE term IN ({_TERMS_SQL})
        GROUP BY doc_id, term
    ),
    dft AS (
        SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
    ),
    contrib AS (
        SELECT f.doc_id, f.term,
               ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
               * (f.tf * {BM25_K1_PLUS_1})
               / (f.tf + {BM25_K1} * ({BM25_ONE_MINUS_B} + {BM25_B} * f.dl / s.avgdl))
                   AS c
        FROM tf f CROSS JOIN stats s JOIN dft d ON f.term = d.term
    ),
    perdoc AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
               ROUND({" + ".join(
                   f"COALESCE(SUM(CASE WHEN term = '{t}' THEN c END), 0.0)"
                   for t in QUERY_TERMS
               )}, 4) AS bm25
        FROM contrib GROUP BY doc_id
    ),
    bm25r AS (
        SELECT doc_id, n_terms_hit, bm25,
               CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER)
                   AS rnk
        FROM perdoc
    )
"""


_BM25_CTES = _bm25_ctes(
    "SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents"
)


def _bm25_over(docs: DataFrame) -> DataFrame:
    """Per-unit BM25 over QUERY_TERMS: (doc_id, n_terms_hit, bm25, rnk).
    ``docs`` carries (doc_id, t) — any unit relation (documents, chunks).

    Shape: one tokenized scan feeds the hit stream; the corpus stats row
    (N, avgdl) and the per-term DF table are tiny 1-row/|terms|-row
    aggregates broadcast back onto it. The per-doc score sums each term's
    contribution through an EXPLICIT left-to-right coalesce chain (not an
    unordered SUM over terms) so the float addition order matches the
    oracle bit for bit.
    """
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size("t")).alias("avgdl"),
    )
    tok = docs.select(
        "doc_id",
        F.size("t").cast("long").alias("dl"),
        F.explode("t").alias("term"),
    ).filter(F.col("term").isin(*QUERY_TERMS))
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    k1 = F.lit(float(BM25_K1))
    k1p1 = F.lit(float(BM25_K1_PLUS_1))
    one_minus_b = F.lit(float(BM25_ONE_MINUS_B))
    b = F.lit(float(BM25_B))
    contrib = (
        tf.crossJoin(F.broadcast(stats))
        .join(F.broadcast(dft), "term")
        .withColumn(
            "c",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
            * (F.col("tf") * k1p1)
            / (F.col("tf") + k1 * (one_minus_b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    score = None
    for t in QUERY_TERMS:
        piece = F.coalesce(
            F.sum(F.when(F.col("term") == t, F.col("c"))), F.lit(0.0)
        )
        score = piece if score is None else score + piece
    perdoc = contrib.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.round(score, 4).alias("bm25"),
    )
    w = Window.partitionBy().orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return perdoc.withColumn("rnk", F.row_number().over(w))


@register(
    "k27_bm25_rank",
    oracle=f"""
    WITH {_BM25_CTES}
    SELECT doc_id, n_terms_hit, bm25, rnk FROM bm25r
    """,
    tags=("K27", "K8", "E2"),
)
def k27_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranking of the corpus against a fixed keyword query.

    k1=1.2, b=0.75, Lucene's idf = ln((N - df + 0.5)/(df + 0.5) + 1).
    Result set = only documents containing ≥1 query term, so the final
    global rank window runs over the hit set, not the corpus.

    Scale: the corpus-sized stages are the tokenized scan and the
    (doc, term) count — one shuffle keyed by doc_id x |query| terms. The
    stats and DF sides are 1-row / |terms|-row broadcasts. At 100 TB the
    global rank over all hits would be replaced by a top-k
    (TakeOrderedAndProject) exactly like F4; kept total here so the oracle
    checks every scored document, not just the head.
    """
    d = table(spark, sf_dir, "documents")
    return _bm25_over(d.select("doc_id", tokens_col().alias("t")))


@register(
    "k28_hybrid_rrf",
    oracle=f"""
    WITH {_BM25_CTES},
    qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    cosr AS (
        SELECT c.vec_id AS doc_id,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY ROUND(
                       list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                        CAST(c.embedding AS DOUBLE[]))
                       / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                                CAST(q.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                                CAST(c.embedding AS DOUBLE[])))),
                       6) DESC, c.vec_id ASC) AS INTEGER) AS rn_cos
        FROM embeddings c CROSS JOIN qv q
        WHERE c.vec_id <> 0
    ),
    fused AS (
        SELECT COALESCE(b.doc_id, cr.doc_id) AS doc_id,
               b.rnk AS rn_bm25, cr.rn_cos,
               COALESCE(1.0 / ({RRF_K} + b.rnk), 0.0)
               + COALESCE(1.0 / ({RRF_K} + cr.rn_cos), 0.0) AS rrf
        FROM bm25r b FULL OUTER JOIN cosr cr ON b.doc_id = cr.doc_id
    )
    SELECT doc_id, rn_bm25, rn_cos, ROUND(rrf, 6) AS rrf_score,
           CAST(fused_rank AS INTEGER) AS fused_rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS fused_rank
        FROM fused
    ) WHERE fused_rank <= {RRF_TOP}
    """,
    tags=("K28", "K27", "K4", "C2"),
)
def k28_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: reciprocal-rank fusion of the BM25 keyword ranking
    and the K4 embedding-cosine ranking (query = vector 0), the standard
    score-free way to merge lexical and semantic retrieval:
    RRF(d) = Σ_lists 1/(60 + rank_list(d)).

    Ranks are integers, so the fused score is bit-identical across engines
    (no rounding discipline needed before the fused ordering); docs missing
    from one list contribute 0 from it. Top-50 by fused score.

    Scale: both input rankings reduce to compact (doc_id, rank) relations
    before the fusion join — the full-outer join runs on |hits| + |corpus|
    rank rows, never on text or vectors. At 100 TB each side would be
    top-k-cut (rank lists are served truncated anyway); the fusion plan is
    unchanged.
    """
    d = table(spark, sf_dir, "documents")
    bm = _bm25_over(d.select("doc_id", tokens_col().alias("t"))).select(
        "doc_id", F.col("rnk").alias("rn_bm25")
    )
    e = table(spark, sf_dir, "embeddings")
    q = (
        e.filter(F.col("vec_id") == 0)
        .select(as_double("embedding").alias("qv"))
        .withColumn("qn", F.sqrt(dot(F.col("qv"), F.col("qv"))))
    )
    c = e.filter(F.col("vec_id") != 0).select(
        F.col("vec_id").alias("doc_id"), as_double("embedding").alias("cv")
    ).withColumn("cn", F.sqrt(dot(F.col("cv"), F.col("cv"))))
    w_cos = Window.partitionBy().orderBy(
        F.col("cosine").desc(), F.col("doc_id").asc()
    )
    cosr = (
        c.crossJoin(F.broadcast(q))
        .withColumn(
            "cosine",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
        )
        .select("doc_id", F.row_number().over(w_cos).alias("rn_cos"))
    )
    rrf = F.coalesce(1.0 / (RRF_K + F.col("rn_bm25")), F.lit(0.0)) + F.coalesce(
        1.0 / (RRF_K + F.col("rn_cos")), F.lit(0.0)
    )
    fused = bm.join(cosr, "doc_id", "full_outer").select(
        "doc_id", "rn_bm25", "rn_cos", rrf.alias("rrf")
    )
    w_f = Window.partitionBy().orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_f))
        .filter(F.col("fused_rank") <= RRF_TOP)
        .select(
            "doc_id",
            "rn_bm25",
            "rn_cos",
            F.round("rrf", 6).alias("rrf_score"),
            "fused_rank",
        )
    )


CHUNK_TOKENS = 32  # disjoint passage width, in tokens
PASSAGE_TOP = 20
# Composite passage key: doc_id * CHUNK_KEY_BASE + chunk_index. Documents
# are far below CHUNK_KEY_BASE chunks, pinned in tests.
CHUNK_KEY_BASE = 1000


@register(
    "k39_passage_retrieval",
    oracle=f"""
    WITH {_bm25_ctes(f'''
        SELECT d.doc_id * {CHUNK_KEY_BASE} + i AS doc_id,
               t[i * {CHUNK_TOKENS} + 1 : (i + 1) * {CHUNK_TOKENS}] AS t
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
              FROM documents) d,
             unnest(range(CAST(ceil(len(t) / {CHUNK_TOKENS}.0) AS BIGINT)))
                 AS u(i)
    ''')}
    SELECT doc_id AS chunk_key,
           doc_id // {CHUNK_KEY_BASE} AS parent_doc,
           doc_id % {CHUNK_KEY_BASE} AS chunk_index,
           n_terms_hit, bm25, rnk
    FROM bm25r WHERE rnk <= {PASSAGE_TOP}
    """,
    tags=("K39", "K27", "K10", "F4"),
)
def k39_passage_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage retrieval (the RAG serving shape): documents split into
    disjoint {CHUNK_TOKENS}-token passages map-side (K10's chunker), the
    SAME BM25 core ranks passages instead of documents, and the top
    passages return with their parent doc — retrieval granularity is a
    parameter of the unit relation, not a different algorithm.

    Chunk statistics differ from document statistics by design (shorter
    dl, per-chunk df): the scorer is reused verbatim over the chunk
    relation, which is exactly why `_bm25_over` takes a unit relation
    rather than a table name.

    Scale: chunk expansion is a map-side explode (no shuffle added); the
    rest inherits K27's shape — (unit, term) aggregate + broadcast model.
    The composite BIGINT key avoids carrying a struct key through the
    rank window.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens_col().alias("t"))
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(t) / {CHUNK_TOKENS}.0)"
                f" as int) - 1), i -> struct(i,"
                f" slice(t, i * {CHUNK_TOKENS} + 1, {CHUNK_TOKENS}) AS ct))"
            )
        ).alias("c"),
    ).select(
        (F.col("doc_id") * CHUNK_KEY_BASE + F.col("c.i")).alias("doc_id"),
        F.col("c.ct").alias("t"),
    )
    ranked = _bm25_over(chunks).filter(F.col("rnk") <= PASSAGE_TOP)
    return ranked.select(
        F.col("doc_id").alias("chunk_key"),
        (F.col("doc_id") / CHUNK_KEY_BASE).cast("long").alias("parent_doc"),
        (F.col("doc_id") % CHUNK_KEY_BASE).alias("chunk_index"),
        "n_terms_hit",
        "bm25",
        "rnk",
    )
