"""K12: benchmark decontamination and repetition analysis over `documents`.

Two corpus-hygiene operators every LLM training pipeline runs before
spending GPU time:

- **Decontamination** (`k12_decontam_overlap`): flag training documents
  whose word n-grams overlap a held-out benchmark/eval set. The standard
  construction (e.g. GPT-3 appendix C, PaLM §C.2 — published methodology)
  is n-gram collision against the eval corpus; here the "benchmark" is a
  deterministic hash-selected slice of `documents` (same trick as K9
  sampling), so membership is a pure content function and the oracle can
  reproduce it exactly.
- **Repetition statistics** (`k12_repetition_stats`): Gopher-style (Rae et
  al. 2021, §A1.1.2 — published heuristics) per-document repetition
  signals: duplicate-word fraction and top-bigram concentration. Documents
  dominated by one repeated phrase are boilerplate and get filtered before
  training.

Scale design (both operators):

- The n-gram fan-out is a *map-side* ``explode`` — no shuffle until the
  per-doc (or per-gram) aggregation, and the aggregation keys are
  high-cardinality (doc_id, gram) pairs, so there is no hot key.
- The benchmark gram set is tiny relative to the corpus (eval sets are
  ~10³-10⁵ docs vs 10⁹+ training docs), so the contamination probe is an
  explicitly-broadcast hash join against the exploded corpus — the corpus
  side never shuffles for the join at any scale.
- Everything is built-in expressions (split/slice/concat_ws/explode):
  whole-stage codegen end to end, no Python in any hot path.

Reference analog: the reference pipeline has no corpus hygiene at all
(SURVEY §2.3) — these are engine-new, graded as first-class LLM-pipeline
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.registry import register

# 28-bit md5-prefix int of the doc_id — identical on both engines (same
# construction as operators/corpus.py K9 sampling).
_H_SPARK = "cast(conv(substring(md5(cast(doc_id as string)), 1, 7), 16, 10) as bigint)"
_H_DUCK = "('0x' || substring(md5(cast(doc_id as varchar)), 1, 7))::BIGINT"

NGRAM = 5  # word n-gram width for contamination probes
BENCH_PERMILLE = 30  # ~3% of docs play the "benchmark/eval set" role


@register(
    "k12_decontam_overlap",
    oracle=f"""
    WITH w AS (
        SELECT doc_id,
               string_split_regex(trim(text), '\\s+') AS ws,
               {_H_DUCK} % 1000 < {BENCH_PERMILLE} AS is_bench
        FROM documents
        WHERE len(string_split_regex(trim(text), '\\s+')) >= {NGRAM}
    ),
    g AS (
        SELECT DISTINCT doc_id, is_bench,
               array_to_string(
                   list_slice(ws, CAST(i + 1 AS INTEGER), CAST(i + {NGRAM} AS INTEGER)),
                   ' ') AS gram
        FROM w, unnest(range(len(ws) - {NGRAM - 1})) AS t(i)
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE is_bench),
    corpus AS (SELECT doc_id, gram FROM g WHERE NOT is_bench),
    tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id),
    hit AS (
        SELECT c.doc_id, COUNT(*) AS n_hits
        FROM corpus c JOIN bench b USING (gram)
        GROUP BY c.doc_id
    )
    SELECT t.doc_id,
           CAST(t.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hit_grams,
           CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / t.n_grams AS contamination
    FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
    """,
    tags=("K12", "K3", "C5"),
)
def k12_decontam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training doc, the count and fraction
    of its distinct word 5-grams that collide with the eval-set gram pool.

    The eval set is the hash-selected ~3% slice (deterministic, engine-
    independent); its distinct grams are broadcast and probed by the
    exploded corpus side — the corpus never shuffles for the join. One
    aggregation per side; output is one scalar row per training doc.
    """
    d = table(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    grams = F.expr(
        f"transform(sequence(0, size(ws) - {NGRAM}),"
        f" i -> concat_ws(' ', slice(ws, i + 1, {NGRAM})))"
    )
    exploded = (
        d.select(
            "doc_id",
            ws.alias("ws"),
            F.expr(f"{_H_SPARK} % 1000 < {BENCH_PERMILLE}").alias("is_bench"),
        )
        .filter(F.size("ws") >= NGRAM)
        .select("doc_id", "is_bench", F.explode(grams).alias("gram"))
        .distinct()
    )
    bench = exploded.filter("is_bench").select("gram").distinct()
    corpus = exploded.filter(~F.col("is_bench")).select("doc_id", "gram")
    tot = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return tot.join(hits, "doc_id", "left").select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hit_grams"),
        (
            F.coalesce("n_hits", F.lit(0)).cast("double") / F.col("n_grams")
        ).alias("contamination"),
    )


@register(
    "k12_repetition_stats",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
        FROM documents
        WHERE len(string_split_regex(trim(text), '\\s+')) >= 2
    ),
    b AS (
        SELECT doc_id,
               array_to_string(
                   list_slice(ws, CAST(i + 1 AS INTEGER), CAST(i + 2 AS INTEGER)),
                   ' ') AS bg
        FROM w, unnest(range(len(ws) - 1)) AS t(i)
    ),
    bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM b GROUP BY doc_id, bg),
    top AS (
        SELECT doc_id,
               MAX(c) AS top_bigram_count,
               SUM(c) AS n_bigrams
        FROM bc GROUP BY doc_id
    )
    SELECT w.doc_id,
           CAST(len(ws) AS INTEGER) AS n_words,
           CAST(len(list_distinct(ws)) AS INTEGER) AS n_distinct_words,
           1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)
               AS dup_word_frac,
           CAST(t.top_bigram_count AS BIGINT) AS top_bigram_count,
           CAST(t.top_bigram_count AS DOUBLE) / t.n_bigrams
               AS top_bigram_frac
    FROM w JOIN top t ON w.doc_id = t.doc_id
    """,
    tags=("K12", "K6", "D8"),
)
def k12_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-word
    fraction and most-frequent-bigram concentration.

    The bigram histogram is a two-level aggregation — (doc, bigram) counts,
    then per-doc max/sum — both on high-cardinality keys (no skew); the
    word-level stats are per-row array expressions with no shuffle at all.
    The join back to per-doc stats is key-aligned on doc_id.
    """
    d = table(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    base = d.select("doc_id", ws.alias("ws")).filter(F.size("ws") >= 2)
    bigrams = F.expr(
        "transform(sequence(0, size(ws) - 2),"
        " i -> concat_ws(' ', slice(ws, i + 1, 2)))"
    )
    bc = (
        base.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = bc.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram_count"),
        F.sum("c").alias("n_bigrams"),
    )
    stats = base.select(
        "doc_id",
        F.size("ws").alias("n_words"),
        F.size(F.array_distinct("ws")).alias("n_distinct_words"),
    )
    return stats.join(top, "doc_id").select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        (
            F.lit(1.0) - F.col("n_distinct_words").cast("double") / F.col("n_words")
        ).alias("dup_word_frac"),
        F.col("top_bigram_count").cast("long").alias("top_bigram_count"),
        (
            F.col("top_bigram_count").cast("double") / F.col("n_bigrams")
        ).alias("top_bigram_frac"),
    )


SNIP_PERMILLE = 20  # ~2% of docs contribute an eval snippet
SNIP_START = 11  # 1-based start offset of the probe substring
SNIP_LEN = 30  # probe length — long enough that chance collisions ≈ 0


@register(
    "k53_exact_substring_decontam",
    oracle=f"""
    WITH snips AS (
        SELECT doc_id AS eval_doc,
               substring(text, {SNIP_START}, {SNIP_LEN}) AS snip
        FROM documents
        WHERE {_H_DUCK} % 1000 < {SNIP_PERMILLE}
          AND length(text) >= {SNIP_START + SNIP_LEN - 1}
    ),
    hits AS (
        SELECT s.eval_doc, s.snip, d.doc_id AS hit_doc
        FROM snips s JOIN documents d
          ON d.doc_id <> s.eval_doc AND strpos(d.text, s.snip) > 0
    )
    SELECT s.eval_doc, s.snip,
           CAST(COUNT(h.hit_doc) AS BIGINT) AS n_hit_docs,
           MIN(h.hit_doc) AS first_hit_doc
    FROM snips s LEFT JOIN hits h ON h.eval_doc = s.eval_doc
    GROUP BY s.eval_doc, s.snip
    """,
    tags=("K53", "K12", "C7"),
)
def k53_exact_substring_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring decontamination (the verbatim-leak complement of
    K12's n-gram collision test): a hash-selected ~2% of documents each
    contribute one 30-char probe substring, and the corpus is scanned for
    OTHER documents containing that probe verbatim — the "did the eval
    answer string leak into training text" check (Lee et al. 2022 run
    exact-substring dedup for the same reason; 30 chars makes chance
    collision probability negligible while catching quote-level leaks
    that token-shingle Jaccard dilutes away).

    Deterministic: the probe set is the K9 hash draw, the probe is a
    fixed character window, containment is exact `instr`/`strpos` — pure
    content functions, no floats anywhere.

    Scale: the probe relation is tiny by construction (hash-capped), so
    it BROADCASTS and the corpus streams through one substring-scan pass
    — a broadcast nested-loop join whose cost is |corpus| × |probes|
    character scans, the same shape as k4's broadcast-queries design; at
    very large probe counts switch to the K12 gram-collision prefilter,
    then verify only colliding pairs with this exact test.
    """
    d = table(spark, sf_dir, "documents")
    snips = (
        d.filter(F.expr(f"{_H_SPARK} % 1000 < {SNIP_PERMILLE}"))
        .filter(F.length("text") >= SNIP_START + SNIP_LEN - 1)
        .select(
            F.col("doc_id").alias("eval_doc"),
            F.substring("text", SNIP_START, SNIP_LEN).alias("snip"),
        )
    )
    hits = d.select(F.col("doc_id").alias("hit_doc"), "text").join(
        F.broadcast(snips),
        (F.col("hit_doc") != F.col("eval_doc"))
        & (F.instr(F.col("text"), F.col("snip")) > 0),
    )
    agg = hits.groupBy("eval_doc", "snip").agg(
        F.count(F.lit(1)).alias("n_hit_docs"),
        F.min("hit_doc").alias("first_hit_doc"),
    )
    return snips.join(agg, ["eval_doc", "snip"], "left").select(
        "eval_doc",
        "snip",
        F.coalesce("n_hit_docs", F.lit(0)).cast("long").alias("n_hit_docs"),
        "first_hit_doc",
    )
