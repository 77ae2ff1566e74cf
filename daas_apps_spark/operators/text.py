"""K5/K6/K8: text analysis for LLM-data pipelines — tokenization & counts,
n-gram language ID, quality heuristics, TF/DF stats, document fingerprints.

Everything is built-in-function Spark (split / regexp / higher-order
functions / explode + groupBy): the hot path stays JVM-side, and every
operator has an exact DuckDB twin for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.operators.dedup import (
    _DUCK_BANDS,
    _DUCK_BASE_HASH,
    _DUCK_SHINGLES,
    _minhash_sig_duck,
    JACCARD_THRESHOLD,
    N_PERM,
    tokens_col,
)
from daas_apps_spark.registry import register

# No backslash classes: Spark SQL string literals consume backslash escapes
# while DuckDB's do not — an explicit space keeps the pattern byte-identical
# in both dialects (fixture text is single-space tokenized).
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")
PROFILE_TOP_N = 15
DF_MIN = 5
FINGERPRINT_GRAM = 8
FINGERPRINT_K = 5


@register(
    "k5_text_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           (CAST(length(text) AS BIGINT) = n_chars) AS n_chars_agrees,
           ROUND(list_sum(list_transform(string_split(lower(text), ' '),
                                         t -> CAST(length(t) AS DOUBLE)))
                 / len(string_split(lower(text), ' ')), 4) AS avg_token_len,
           CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS INTEGER)
               AS n_bpeish_tokens,
           CAST(len(list_distinct(string_split(lower(text), ' '))) AS INTEGER)
               AS n_distinct_tokens
    FROM documents
    """,
    tags=("K5",),
)
def k5_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token / char counts (whitespace + BPE-ish regex)."""
    d = table(spark, sf_dir, "documents")
    toks = tokens_col()
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        (F.length("text").cast("long") == F.col("n_chars")).alias("n_chars_agrees"),
        F.round(
            F.aggregate(
                toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
            )
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
        F.size(F.expr(f"regexp_extract_all(text, '{BPE_ISH_PATTERN}', 0)")).alias(
            "n_bpeish_tokens"
        ),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


@register(
    "k5_language_id",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    profile AS (
        SELECT lang, token FROM (
            SELECT lang, token, COUNT(*) AS freq,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY COUNT(*) DESC, token ASC) AS rn
            FROM tok GROUP BY lang, token
        ) WHERE rn <= {PROFILE_TOP_N}
    ),
    scores AS (
        SELECT t.doc_id, p.lang AS cand_lang, CAST(COUNT(*) AS BIGINT) AS hits
        FROM tok t JOIN profile p ON t.token = p.token
        GROUP BY t.doc_id, p.lang
    )
    SELECT s.doc_id, s.cand_lang AS predicted_lang, s.hits,
           (s.cand_lang = d.lang) AS is_correct
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY hits DESC, cand_lang ASC) AS rn
        FROM scores
    ) s JOIN documents d ON s.doc_id = d.doc_id
    WHERE s.rn = 1
    """,
    tags=("K5", "K8"),
)
def k5_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by token-profile voting (n-gram heuristic, corpus-derived).

    Two-stage relational plan (profile build → score join), the same shape a
    real fastText-style LID would take with a broadcast model table.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(tokens_col()).alias("token"))
    w_prof = Window.partitionBy("lang").orderBy(
        F.col("freq").desc(), F.col("token").asc()
    )
    profile = (
        tok.groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("rn", F.row_number().over(w_prof))
        .filter(F.col("rn") <= PROFILE_TOP_N)
        .select(F.col("lang").alias("cand_lang"), "token")
    )
    scores = (
        tok.select("doc_id", "token")
        .join(F.broadcast(profile), "token")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    w_best = Window.partitionBy("doc_id").orderBy(
        F.col("hits").desc(), F.col("cand_lang").asc()
    )
    best = scores.withColumn("rn", F.row_number().over(w_best)).filter(F.col("rn") == 1)
    return (
        best.join(d.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            F.col("cand_lang").alias("predicted_lang"),
            "hits",
            (F.col("cand_lang") == F.col("lang")).alias("is_correct"),
        )
    )


@register(
    "k6_quality_heuristics",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, length(text) AS n_ch,
               string_split(lower(text), ' ') AS toks
        FROM documents
    )
    SELECT doc_id,
           (n_ch BETWEEN 50 AND 5000) AS len_ok,
           ROUND(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE
                 / n_ch, 4) AS symbol_ratio,
           ROUND(1.0 - len(list_distinct(toks))::DOUBLE / len(toks), 4)
               AS dup_token_ratio,
           ROUND(len(list_filter(toks, x -> list_contains({list(STOPWORDS)}, x)))::DOUBLE
                 / len(toks), 4) AS stopword_ratio,
           ((n_ch BETWEEN 50 AND 5000)
            AND 1.0 - len(list_distinct(toks))::DOUBLE / len(toks) < 0.7) AS passes
    FROM t
    """,
    tags=("K6",),
    bench=True,
)
def k6_quality_heuristics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length bounds, symbol ratio, repetition, stopwords."""
    d = table(spark, sf_dir, "documents")
    toks = tokens_col()
    n_ch = F.length("text")
    symbols = F.length(F.regexp_replace("text", "[A-Za-z0-9 ]", ""))
    dup_ratio = 1.0 - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return d.select(
        "doc_id",
        n_ch.between(50, 5000).alias("len_ok"),
        F.round(symbols.cast("double") / n_ch, 4).alias("symbol_ratio"),
        F.round(dup_ratio, 4).alias("dup_token_ratio"),
        F.round(
            F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast(
                "double"
            )
            / F.size(toks),
            4,
        ).alias("stopword_ratio"),
        (n_ch.between(50, 5000) & (dup_ratio < 0.7)).alias("passes"),
    )


@register(
    "k8_tf_df",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS tf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
           ROUND(ln(n.n_docs / COUNT(DISTINCT doc_id)), 6) AS idf
    FROM tok, n
    GROUP BY term, n.n_docs
    HAVING COUNT(DISTINCT doc_id) >= {DF_MIN}
    """,
    tags=("K8", "D1", "D3"),
)
def k8_tf_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-frequency / document-frequency / idf over the corpus."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col()).alias("term"))
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    return (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .filter(F.col("df") >= DF_MIN)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term", "tf", "df",
            F.round(F.log(F.col("n_docs") / F.col("df")), 6).alias("idf"),
        )
    )


@register(
    "k_fingerprint",
    oracle=f"""
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(
               list_transform(range(length(text) - {FINGERPRINT_GRAM - 1}),
                   i -> substring(md5(substring(text, i + 1, {FINGERPRINT_GRAM})), 1, 16))
           ))[1:{FINGERPRINT_K}], ',') AS fingerprint
    FROM documents
    WHERE length(text) >= {FINGERPRINT_GRAM}
    """,
    tags=("K2", "K7"),
)
def k_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k sketch of rolling 8-char-gram hashes (document fingerprint).

    Bottom-k over a content-defined gram hash ≈ winnowing: stable under
    small edits, pure function of content, and O(len) per doc.
    """
    d = table(spark, sf_dir, "documents")
    grams = F.expr(
        f"transform(sequence(1, length(text) - {FINGERPRINT_GRAM - 1}), "
        f"i -> substring(md5(substring(text, i, {FINGERPRINT_GRAM})), 1, 16))"
    )
    return (
        d.filter(F.length("text") >= FINGERPRINT_GRAM)
        .select(
            "doc_id",
            # Comma-joined scalar so the driver canonicalizer can hash it.
            F.array_join(
                F.slice(F.sort_array(F.array_distinct(grams)), 1, FINGERPRINT_K), ","
            ).alias("fingerprint"),
        )
    )


WINNOW_GRAM = 8  # char k-gram width
WINNOW_W = 4  # winnowing window: guarantee = one fingerprint per
# WINNOW_W + WINNOW_GRAM - 1 = 11 consecutive chars of any match


@register(
    "k18_winnowing",
    oracle=f"""
    WITH hashes AS (
        SELECT doc_id,
               list_transform(
                   range(length(lower(text)) - {WINNOW_GRAM - 1}),
                   i -> ('0x' || substring(
                            md5(substring(lower(text), CAST(i + 1 AS INTEGER),
                                          {WINNOW_GRAM})), 1, 7))::BIGINT
               ) AS hs
        FROM documents WHERE length(text) >= {WINNOW_GRAM + WINNOW_W - 1}
    )
    SELECT DISTINCT doc_id,
           list_min(hs[CAST(j + 1 AS INTEGER):CAST(j + {WINNOW_W} AS INTEGER)])
               AS fingerprint
    FROM hashes, unnest(range(len(hs) - {WINNOW_W - 1})) AS t(j)
    """,
    tags=("K18", "K2", "K8"),
)
def k18_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    published): hash every 8-char gram, slide a 4-hash window, keep each
    window's minimum; the distinct minima are the fingerprint set.

    Unlike the bottom-k sketch (`k_fingerprint`, global minima), winnowing
    guarantees a fingerprint inside EVERY 11-char stretch — the property
    plagiarism/overlap detectors rely on to localize matches. Pure
    per-row higher-order expressions (no UDF, no shuffle before the
    distinct), and the hash is the engine-shared md5-prefix int so the
    fingerprint SET is engine-reproducible.
    """
    d = table(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    # lt materialized before the transform: an inline lower(text) in the
    # interpreted lambda re-lowercases the doc per element (O(len²)).
    hashes = F.expr(
        f"transform(sequence(0, length(lt) - {WINNOW_GRAM}),"
        f" i -> cast(conv(substring(md5(substring(lt, i + 1,"
        f" {WINNOW_GRAM})), 1, 7), 16, 10) as bigint))"
    )
    return (
        d.filter(F.length(lower) >= WINNOW_GRAM + WINNOW_W - 1)
        .select("doc_id", lower.alias("lt"))
        .select("doc_id", hashes.alias("hs"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(hs) - {WINNOW_W}),"
                    f" j -> array_min(slice(hs, j + 1, {WINNOW_W})))"
                )
            ).alias("fingerprint"),
        )
        .distinct()
    )


@register(
    "k21_token_surprisal",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    vocab AS (
        SELECT token, CAST(COUNT(*) AS DOUBLE) AS freq FROM tok GROUP BY token
    ),
    scored AS (
        SELECT t.doc_id,
               -log2(v.freq / (SELECT SUM(freq) FROM vocab)) AS surprisal
        FROM tok t JOIN vocab v USING (token)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_scored_tokens,
           ROUND(AVG(surprisal), 4) AS avg_surprisal_bits,
           ROUND(MAX(surprisal), 4) AS max_surprisal_bits
    FROM scored
    GROUP BY doc_id
    """,
    tags=("K21", "K6", "K8"),
)
def k21_token_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency surprisal scoring: per-document mean/max
    -log2 P(token) under the corpus's own unigram distribution.

    The standard cheap "perplexity-ish" quality filter for LLM corpus
    curation (boilerplate scores low, gibberish scores high) without any
    external model: the unigram table IS the model. Two aggregations over
    one tokenized scan: build the vocab (token -> corpus frequency), turn
    it into a surprisal lookup with a single partition-all window over the
    (small) vocab, broadcast it back onto the token stream, and aggregate
    per document.

    Scale: the vocab of whitespace tokens grows ~O(sqrt(corpus)) (Heaps'
    law) and broadcasts comfortably at 100 TB corpus scale; if a tokenizer
    with an unbounded key space were used instead, drop the broadcast hint
    and let AQE pick a shuffle join on token.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col()).alias("token"))
    w_all = Window.partitionBy()
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).cast("double").alias("freq"))
        .withColumn(
            "surprisal", -F.log2(F.col("freq") / F.sum("freq").over(w_all))
        )
        .select("token", "surprisal")
    )
    return (
        tok.join(F.broadcast(vocab), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_scored_tokens"),
            F.round(F.avg("surprisal"), 4).alias("avg_surprisal_bits"),
            F.round(F.max("surprisal"), 4).alias("max_surprisal_bits"),
        )
    )


@register(
    "k22_zipf_slope",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    freq AS (
        SELECT token, CAST(COUNT(*) AS DOUBLE) AS freq FROM tok GROUP BY token
    ),
    ranked AS (
        SELECT freq,
               ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rnk
        FROM freq
        QUALIFY rnk <= 100
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_top,
           ROUND(regr_slope(ln(freq), ln(rnk)), 4) AS zipf_slope,
           ROUND(regr_intercept(ln(freq), ln(rnk)), 4) AS zipf_intercept,
           ROUND(regr_r2(ln(freq), ln(rnk)), 4) AS r_squared
    FROM ranked
    """,
    tags=("K22", "K8", "D7"),
)
def k22_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus: OLS slope of log-frequency vs
    log-rank for the top-100 tokens. Natural language sits near slope -1;
    a flat slope flags boilerplate/template corpora, a cliff flags
    gibberish — a one-number corpus-health check used alongside K6.

    Tokenize -> count (one shuffle on token) -> global top-100 via
    row_number (vocab is small after the aggregate; the global sort is
    over |vocab| rows, not the corpus) -> single-row regression aggregate
    via built-in regr_slope/intercept/r2. Ranking ties break on the token
    string so both engines rank identically; ROUND(.,4) absorbs
    sum-order float ulps in the regression sums.

    Scale: the only corpus-sized stage is the token count; at 100 TB the
    top-100 cut runs on the aggregated vocab (~sqrt-corpus by Heaps' law)
    and everything after is a few hundred rows on one task.
    """
    d = table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(tokens_col()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("double").alias("freq"))
    )
    w = Window.partitionBy().orderBy(F.col("freq").desc(), F.col("token").asc())
    ranked = (
        freq.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 100)
        .select(F.log(F.col("freq")).alias("lf"), F.log(F.col("rnk")).alias("lr"))
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_top"),
        F.round(F.regr_slope("lf", "lr"), 4).alias("zipf_slope"),
        F.round(F.regr_intercept("lf", "lr"), 4).alias("zipf_intercept"),
        F.round(F.regr_r2("lf", "lr"), 4).alias("r_squared"),
    )


@register(
    "k23_token_entropy",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS c
        FROM tok GROUP BY doc_id, token
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
           ROUND(log2(SUM(c)) - SUM(c * log2(c)) / SUM(c), 4) AS entropy_bits
    FROM tf
    GROUP BY doc_id
    """,
    tags=("K23", "K6", "K8"),
)
def k23_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution, in bits —
    the repetition-aware quality signal (low entropy = template/boilerplate
    text, complements K12's repetition stats).

    Uses the identity H = log2(n) - (1/n)*SUM(c*log2 c) so the whole thing
    is ONE aggregation over the (doc, token) counts — no join back to a
    totals table, no window. Two shuffles total (doc+token count, then
    doc rollup), both keyed on doc_id prefixes so they colocate.

    Scale: state per group is three floats; skew only if one document has
    a pathological token count, which K6's length bounds already filter.
    """
    d = table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens_col()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    return tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        F.round(
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"), 4
        ).alias("entropy_bits"),
    )


@register(
    "k24_bigram_surprisal",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    bg AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM toks, UNNEST(range(1, len(t))) AS u(i)
    ),
    bgc AS (
        SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c FROM bg GROUP BY w1, w2
    ),
    model AS (
        SELECT w1, w2,
               -log2(c / SUM(c) OVER (PARTITION BY w1)) AS surprisal
        FROM bgc
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(m.surprisal), 4) AS avg_surprisal_bits,
           ROUND(MAX(m.surprisal), 4) AS max_surprisal_bits
    FROM bg b JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
    GROUP BY b.doc_id
    """,
    tags=("K24", "K21", "K8"),
)
def k24_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM surprisal scoring: per-document mean/max -log2 P(w2|w1)
    under the corpus's own bigram model — one order up from K21's unigram
    filter, and the difference matters for curation: templated boilerplate
    has LOW bigram surprisal (predictable transitions) even when its
    unigram surprisal looks healthy, while shuffled/garbled text scores
    HIGH on bigrams but normal on unigrams.

    The conditional model needs no probability join: bigram counts get
    their context totals from one window over the (small) bigram vocab —
    P(w2|w1) = c(w1,w2) / Σ_w c(w1,w), computed in place. The bigram
    stream is derived map-side (an index-range transform over the token
    array — no window, no self-join), aggregated once for the model, and
    the broadcast model joins back for per-doc scoring.

    Scale: bigram vocab grows faster than unigram (still far below corpus
    size); if it outgrows the broadcast threshold drop the hint and AQE
    shuffles the score join on (w1, w2) — the per-doc aggregate is
    unchanged. Exactly K21's scale story, one n-gram order up.
    """
    d = table(spark, sf_dir, "documents")
    # Materialize the token array BEFORE the index transform: higher-order
    # lambdas evaluate interpreted, so an inline `split(...)[i]` re-splits
    # the document per element — O(len²) per doc (measured 2.1s → 1.1s at
    # sf0.1 from this projection alone).
    bg = (
        d.select("doc_id", tokens_col().alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(t[i - 1] AS w1, t[i] AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    w_ctx = Window.partitionBy("w1")
    model = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .withColumn(
            "surprisal", -F.log2(F.col("c") / F.sum("c").over(w_ctx))
        )
        .select("w1", "w2", "surprisal")
    )
    return (
        bg.join(F.broadcast(model), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("surprisal"), 4).alias("avg_surprisal_bits"),
            F.round(F.max("surprisal"), 4).alias("max_surprisal_bits"),
        )
    )


# Fixed logistic-model weights for K41 (deterministic stand-in for a
# trained fastText/regression quality classifier; same literals on both
# engines). Feature order: bias, len_norm, symbol_ratio, dup_ratio,
# stopword_ratio.
QUALITY_W = ("1.0", "2.0", "-8.0", "-4.0", "2.0")
LEN_NORM_CAP = "2000.0"


@register(
    "k41_quality_classifier",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id,
               LEAST(length(text) / {LEN_NORM_CAP}, 1.0) AS len_norm,
               length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE
                   / length(text) AS symbol_ratio,
               1.0 - len(list_distinct(string_split(lower(text), ' ')))::DOUBLE
                   / len(string_split(lower(text), ' ')) AS dup_ratio,
               len(list_filter(string_split(lower(text), ' '),
                               x -> list_contains({list(STOPWORDS)}, x)))::DOUBLE
                   / len(string_split(lower(text), ' ')) AS stopword_ratio
        FROM documents
    )
    SELECT doc_id,
           ROUND(len_norm, 4) AS len_norm,
           ROUND(1.0 / (1.0 + exp(-({QUALITY_W[0]}
                 + {QUALITY_W[1]} * len_norm
                 + {QUALITY_W[2]} * symbol_ratio
                 + {QUALITY_W[3]} * dup_ratio
                 + {QUALITY_W[4]} * stopword_ratio))), 4) AS quality_score,
           (1.0 / (1.0 + exp(-({QUALITY_W[0]}
                 + {QUALITY_W[1]} * len_norm
                 + {QUALITY_W[2]} * symbol_ratio
                 + {QUALITY_W[3]} * dup_ratio
                 + {QUALITY_W[4]} * stopword_ratio))) >= 0.5) AS keep
    FROM feats
    """,
    tags=("K41", "K6", "K5"),
)
def k41_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring: the K6 heuristic features pushed
    through a fixed-weight logistic model — the plumbing of a trained
    quality classifier (fastText/regression style) with the training
    replaced by pinned literals, so the score is a pure deterministic
    function of content. Every feature is an exact integer ratio; the
    weights are identical decimal literals on both engines; only exp()
    can differ in the last ulp (absorbed by ROUND, and the 0.5 keep
    threshold compares the unrounded score on both engines).

    Scale: pure per-row expressions over one scan — the cheapest
    possible "model" inference path. A real model swaps the expression
    for a broadcast weight table (K21's shape) or an Arrow UDF batch
    (J8/J9) — the pipeline position and output contract stay identical.
    """
    d = table(spark, sf_dir, "documents")
    toks = tokens_col()
    n_ch = F.length("text")
    len_norm = F.least(n_ch / float(LEN_NORM_CAP), F.lit(1.0))
    symbol_ratio = (
        F.length(F.regexp_replace("text", "[A-Za-z0-9 ]", "")).cast("double") / n_ch
    )
    dup_ratio = 1.0 - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stopword_ratio = (
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast(
            "double"
        )
        / F.size(toks)
    )
    w = [F.lit(float(x)) for x in QUALITY_W]
    logit = (
        w[0]
        + w[1] * F.col("len_norm")
        + w[2] * F.col("symbol_ratio")
        + w[3] * F.col("dup_ratio")
        + w[4] * F.col("stopword_ratio")
    )
    score = 1.0 / (1.0 + F.exp(-logit))
    return (
        d.select(
            "doc_id",
            len_norm.alias("len_norm"),
            symbol_ratio.alias("symbol_ratio"),
            dup_ratio.alias("dup_ratio"),
            stopword_ratio.alias("stopword_ratio"),
        )
        .select(
            "doc_id",
            F.round("len_norm", 4).alias("len_norm"),
            F.round(score, 4).alias("quality_score"),
            (score >= 0.5).alias("keep"),
        )
    )


def _k42_oracle() -> str:
    """DuckDB twin of k42: K3's verified-pair chain + K18's winnowing
    fingerprints composed in one CTE pipeline."""
    return (
        _DUCK_SHINGLES
        + f"""
    , hsh AS (
        SELECT doc_id, {_DUCK_BASE_HASH} FROM sh
    ),
    sigs AS (
        SELECT doc_id,
               {', '.join(_minhash_sig_duck(i) for i in range(N_PERM))}
        FROM hsh
    ),
    bands AS (
        SELECT doc_id, unnest([{_DUCK_BANDS}]) AS band_key FROM sigs
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    pairs AS (
        SELECT c.doc_a, c.doc_b,
               ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                     / len(list_distinct(sa.shingles || sb.shingles)), 4)
                   AS jaccard
        FROM cands c
        JOIN sh sa ON c.doc_a = sa.doc_id
        JOIN sh sb ON c.doc_b = sb.doc_id
        WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
              / len(list_distinct(sa.shingles || sb.shingles))
              >= {JACCARD_THRESHOLD}
    ),
    hashes AS (
        SELECT doc_id,
               list_transform(
                   range(length(lower(text)) - {WINNOW_GRAM - 1}),
                   i -> ('0x' || substring(
                            md5(substring(lower(text), CAST(i + 1 AS INTEGER),
                                          {WINNOW_GRAM})), 1, 7))::BIGINT
               ) AS hs
        FROM documents WHERE length(text) >= {WINNOW_GRAM + WINNOW_W - 1}
    ),
    fps AS (
        SELECT DISTINCT doc_id,
               list_min(hs[CAST(j + 1 AS INTEGER):CAST(j + {WINNOW_W} AS INTEGER)])
                   AS fingerprint
        FROM hashes, unnest(range(len(hs) - {WINNOW_W - 1})) AS t(j)
    ),
    nfp AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp FROM fps GROUP BY doc_id
    ),
    shared AS (
        SELECT p.doc_a, p.doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM pairs p
        JOIN fps a ON a.doc_id = p.doc_a
        JOIN fps b ON b.doc_id = p.doc_b AND b.fingerprint = a.fingerprint
        GROUP BY p.doc_a, p.doc_b
    )
    SELECT p.doc_a, p.doc_b, p.jaccard,
           COALESCE(s.n_shared, 0) AS n_shared,
           na.n_fp AS n_fp_a, nb.n_fp AS n_fp_b,
           ROUND(COALESCE(s.n_shared, 0)
                 / CAST(LEAST(na.n_fp, nb.n_fp) AS DOUBLE), 4) AS containment
    FROM pairs p
    LEFT JOIN shared s ON s.doc_a = p.doc_a AND s.doc_b = p.doc_b
    JOIN nfp na ON na.doc_id = p.doc_a
    JOIN nfp nb ON nb.doc_id = p.doc_b
    """
    )


@register(
    "k42_overlap_localization",
    oracle=_k42_oracle(),
    tags=("K42", "K18", "K3"),
)
def k42_overlap_localization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap localization for near-dup pairs: every LSH-verified pair
    (K3) is re-examined through its winnowing fingerprint sets (K18) --
    shared fingerprints approximate shared 11-char stretches, so
    ``containment = |shared| / min(|fp_a|, |fp_b|)`` localizes HOW MUCH
    of the smaller document the overlap covers, which the shingle
    Jaccard alone cannot say (a contained quote scores low Jaccard but
    high containment). This is the winnowing guarantee (Schleimer et
    al. 2003) doing the job it was designed for, composed from two
    operators already in the registry.

    Scale: pairs come from band collisions (never N squared); fingerprint
    sets join pair-side by doc_id then match on the fingerprint value --
    the fingerprint relation is ~|corpus chars|/WINNOW_W rows, shuffled
    once on doc_id. Counts and ratios are exact integers.
    """
    from daas_apps_spark.operators.dedup import k3_lsh_near_dedup

    pairs = k3_lsh_near_dedup(spark, sf_dir).select("doc_a", "doc_b", "jaccard")
    fps = k18_winnowing(spark, sf_dir)
    n_fp = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    fa = fps.select(F.col("doc_id").alias("doc_a"), "fingerprint")
    fb = fps.select(F.col("doc_id").alias("doc_b"), "fingerprint")
    shared = (
        pairs.join(fa, "doc_a")
        .join(fb, ["doc_b", "fingerprint"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = n_fp.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_fp_a"))
    nb = n_fp.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_fp_b"))
    return (
        pairs.join(shared, ["doc_a", "doc_b"], "left")
        .join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            "n_fp_a",
            "n_fp_b",
            F.round(
                F.coalesce("n_shared", F.lit(0))
                / F.least("n_fp_a", "n_fp_b").cast("double"),
                4,
            ).alias("containment"),
        )
    )


@register(
    "k46_bpe_pair_counts",
    oracle="""
    WITH words AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS wf
        FROM (
            SELECT UNNEST(string_split_regex(TRIM(text), ' +')) AS w
            FROM documents
        ) t
        WHERE LENGTH(w) >= 2
        GROUP BY w
    ),
    pairs AS (
        SELECT SUBSTRING(w.w, CAST(i AS INTEGER), 2) AS pair,
               w.w AS word, w.wf
        FROM words w, UNNEST(GENERATE_SERIES(1, LENGTH(w.w) - 1)) AS g(i)
    )
    SELECT pair,
           CAST(SUM(wf) AS BIGINT) AS pair_count,
           CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct_words
    FROM pairs
    GROUP BY pair
    """,
    tags=("K46", "K10", "K8"),
)
def k46_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-candidate induction: the first iteration of byte-pair
    encoding vocabulary learning (Sennrich et al. 2016) — count every
    adjacent symbol pair inside each distinct word, weighted by corpus
    word frequency. The argmax pair of this table is the first BPE merge;
    a trainer loops this table → merge → recount.

    Spark shape: word-frequency aggregate (one shuffle on the word), then
    per-word pair explosion via ``transform(sequence(...))`` — a pure
    per-row higher-order function over the DISTINCT word list, which is
    the crucial scale move: pair explosion runs over |vocab| rows, not
    |corpus| tokens (the fixture has ~60 distinct words carrying ~30k
    token occurrences; a web corpus has ~10^7 distinct words vs ~10^12
    tokens — five orders of magnitude less explode fan-out), exactly how
    production BPE trainers (SentencePiece, HuggingFace tokenizers)
    structure the count. Final aggregate shuffles on the pair key.
    """
    d = table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.trim(F.col("text")), " +")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    pair_arr = F.expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"
    )
    pairs = words.select(
        F.col("w").alias("word"), "wf", F.explode(pair_arr).alias("pair")
    )
    return pairs.groupBy("pair").agg(
        F.sum("wf").alias("pair_count"),
        F.countDistinct("word").alias("n_distinct_words"),
    )


@register(
    "k48_heaps_law",
    oracle="""
    WITH occ AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    per_doc AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens
        FROM occ GROUP BY doc_id
    ),
    first_seen AS (
        SELECT token, MIN(doc_id) AS first_doc FROM occ GROUP BY token
    ),
    novel AS (
        SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
        FROM first_seen GROUP BY first_doc
    ),
    series AS (
        SELECT p.doc_id,
               SUM(p.n_tokens) OVER (
                   ORDER BY p.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_tokens,
               SUM(COALESCE(v.n_novel, 0)) OVER (
                   ORDER BY p.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_vocab
        FROM per_doc p LEFT JOIN novel v ON v.doc_id = p.doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(cum_tokens) AS BIGINT) AS total_tokens,
           CAST(MAX(cum_vocab) AS BIGINT) AS vocab_size,
           ROUND(regr_slope(ln(CAST(cum_vocab AS DOUBLE)),
                            ln(CAST(cum_tokens AS DOUBLE))), 4) AS heaps_beta,
           ROUND(regr_intercept(ln(CAST(cum_vocab AS DOUBLE)),
                                ln(CAST(cum_tokens AS DOUBLE))), 4)
               AS heaps_logk,
           ROUND(regr_r2(ln(CAST(cum_vocab AS DOUBLE)),
                         ln(CAST(cum_tokens AS DOUBLE))), 4) AS r_squared
    FROM series
    """,
    tags=("K48", "K22", "E4"),
)
def k48_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit: vocabulary growth V = K·N^β estimated by OLS of
    ln(cumulative vocab) on ln(cumulative tokens) over the doc_id-ordered
    corpus prefix — k22's companion diagnostic (Zipf measures the
    frequency head, Heaps the novelty tail). β far below the natural-
    language ~0.5 flags a templated/closed-vocabulary corpus; β near 1
    flags id/gibberish floods. Sub-linear vocab growth is also THE
    capacity-planning number for tokenizer training at 100 TB.

    The novelty trick keeps everything one-pass relational: a token's
    novelty events are exactly its FIRST document (MIN(doc_id) per
    token), so cumulative vocabulary is a running sum of per-doc
    first-occurrence counts — never a cumulative COUNT(DISTINCT).

    Scale: token occurrence agg (shuffle on token) + per-doc agg (shuffle
    on doc) are the corpus-sized stages; the cumulative window then runs
    over |docs| rows. The single-partition prefix sum is fine to ~1e8
    docs; beyond that it becomes the classic two-pass distributed prefix
    sum (per-range partials + broadcast offsets) with identical output.
    ROUND(.,4) absorbs regression sum-order ulps, as in k22.
    """
    d = table(spark, sf_dir, "documents")
    occ = d.select("doc_id", F.explode(tokens_col()).alias("token"))
    per_doc = occ.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    first_seen = occ.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    novel = first_seen.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_novel")
    )
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    series = (
        per_doc.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            F.sum("n_tokens").over(w).alias("cum_tokens"),
            F.sum(F.coalesce("n_novel", F.lit(0))).over(w).alias("cum_vocab"),
        )
    )
    ln_v = F.log(F.col("cum_vocab").cast("double"))
    ln_n = F.log(F.col("cum_tokens").cast("double"))
    return series.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("cum_tokens").alias("total_tokens"),
        F.max("cum_vocab").alias("vocab_size"),
        F.round(F.regr_slope(ln_v, ln_n), 4).alias("heaps_beta"),
        F.round(F.regr_intercept(ln_v, ln_n), 4).alias("heaps_logk"),
        F.round(F.regr_r2(ln_v, ln_n), 4).alias("r_squared"),
    )


def _k50_oracle() -> str:
    from daas_apps_spark.registry import REGISTRY

    o41 = REGISTRY["k41_quality_classifier"].oracle
    o6 = REGISTRY["k6_quality_heuristics"].oracle
    return f"""
    SELECT LEAST(CAST(FLOOR(s.quality_score * 10) AS INTEGER), 9) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(s.quality_score AS DECIMAL(18,4))) AS DOUBLE)
               / COUNT(*) AS mean_predicted,
           CAST(COUNT(CASE WHEN l.passes THEN 1 END) AS DOUBLE)
               / COUNT(*) AS observed_rate,
           ABS(CAST(SUM(CAST(s.quality_score AS DECIMAL(18,4))) AS DOUBLE)
               / COUNT(*)
               - CAST(COUNT(CASE WHEN l.passes THEN 1 END) AS DOUBLE)
                 / COUNT(*)) AS calibration_gap
    FROM ({o41}) s JOIN ({o6}) l ON l.doc_id = s.doc_id
    GROUP BY 1
    """


@register(
    "k50_calibration_audit",
    oracle=_k50_oracle(),
    tags=("K50", "K41", "K6", "DQ4"),
)
def k50_calibration_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier calibration audit (reliability diagram): K41's logistic
    quality scores bucketed into score deciles, each bucket's mean
    predicted probability compared with the observed rate of K6's
    rule-based pass label — the per-bucket terms of Expected Calibration
    Error (Guo et al. 2017). A quality classifier that gates a 100 TB
    curation run must be calibrated against the rules it's replacing
    before its threshold means anything; this is that acceptance report.

    Determinism: bucket ids floor an exp-derived score (midpoints
    measure-zero); mean predicted goes through the decimal-sum discipline
    (scores are 4-decimal by construction); observed rate is an exact
    integer ratio; the gap is one IEEE subtraction of the two.

    Scale: both inputs are per-row projections over the same scan —
    Catalyst collapses the join of the two derivations into one pass in
    the common case; the report is a 10-row aggregate. With a real model
    the score side becomes a broadcast-weights or Arrow-UDF stage and the
    audit query is unchanged.
    """
    scores = k41_quality_classifier(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    labels = k6_quality_heuristics(spark, sf_dir).select("doc_id", "passes")
    j = scores.join(labels, "doc_id")
    bucket = F.least(
        F.floor(F.col("quality_score") * 10).cast("int"), F.lit(9)
    )
    mean_pred = (
        F.sum(F.col("quality_score").cast("decimal(18,4)")).cast("double")
        / F.count(F.lit(1))
    )
    obs = (
        F.count(F.when(F.col("passes"), 1)).cast("double") / F.count(F.lit(1))
    )
    return j.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        mean_pred.alias("mean_predicted"),
        obs.alias("observed_rate"),
        F.abs(mean_pred - obs).alias("calibration_gap"),
    )


def _k52_oracle() -> str:
    from daas_apps_spark.registry import REGISTRY

    o41 = REGISTRY["k41_quality_classifier"].oracle
    duck_h = "('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT"
    return f"""
    WITH s AS (
        SELECT doc_id, quality_score FROM ({o41}) t
    ),
    m AS (
        SELECT MAX(quality_score) AS mx FROM s
    ),
    rated AS (
        SELECT s.doc_id, s.quality_score,
               (s.quality_score / m.mx) * (s.quality_score / m.mx) AS rate
        FROM s, m
    ),
    tagged AS (
        SELECT doc_id, quality_score, rate,
               LEAST(CAST(FLOOR(quality_score * 10) AS INTEGER), 9) AS bucket,
               ({duck_h} % 1000000
                < CAST(FLOOR(rate * 1000000) AS BIGINT)) AS kept
        FROM rated
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN kept THEN 1 END) AS BIGINT) AS n_sampled,
           MIN(rate) AS min_rate,
           MAX(rate) AS max_rate
    FROM tagged
    GROUP BY bucket
    """


@register(
    "k52_importance_sampling",
    oracle=_k52_oracle(),
    tags=("K52", "K45", "K41", "K9"),
)
def k52_importance_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level quality-weighted importance sampling (the
    DataComp-LM / quality-curriculum recipe): each document's acceptance
    probability is (score / max_score)² of its K41 classifier score —
    squaring sharpens toward high quality without a hard threshold — and
    membership is the K9 deterministic content-hash draw. K45 rebalances
    GROUPS by observed mass; this weights each INDIVIDUAL document by model
    score, the other production mixing axis.

    Determinism: scores are 4-decimal by construction, the corpus max is
    exact, the rate is a pinned two-multiply IEEE tree, and the draw
    compares integer hash residues to the floored rate — both engines
    keep the identical sample. Per-decile census (population, kept,
    rate bounds) is the tuning report: it shows the acceptance curve a
    data-mixing engineer bends.

    Scale: the score subtree is pure per-row projections with no
    exchange, so the corpus is scanned+featurized TWICE — once under the
    max aggregate, once for the draw (no shuffle exists for AQE to
    reuse); at production scale persist the scored relation once between
    the passes. The 1-row max broadcasts; only the 10-row census
    shuffles.
    """
    scores = k41_quality_classifier(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    mx = scores.agg(F.max("quality_score").alias("mx"))
    rated = scores.crossJoin(F.broadcast(mx)).select(
        "doc_id",
        "quality_score",
        (
            (F.col("quality_score") / F.col("mx"))
            * (F.col("quality_score") / F.col("mx"))
        ).alias("rate"),
    )
    h = "cast(conv(substring(md5(cast(doc_id as string)), 1, 7), 16, 10) as bigint)"
    tagged = rated.select(
        "doc_id",
        "quality_score",
        "rate",
        F.least(
            F.floor(F.col("quality_score") * 10).cast("int"), F.lit(9)
        ).alias("bucket"),
        (
            F.expr(f"{h} % 1000000")
            < F.floor(F.col("rate") * 1000000).cast("long")
        ).alias("kept"),
    )
    return tagged.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("kept"), 1)).alias("n_sampled"),
        F.min("rate").alias("min_rate"),
        F.max("rate").alias("max_rate"),
    )


@register(
    "k56_dataset_card",
    oracle="""
    WITH base AS (
        SELECT doc_id, text, lang, source, n_chars,
               md5(text) AS digest
        FROM documents
    ),
    core AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_distinct,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)
                    AS BIGINT) AS p50_len,
               CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars)
                    AS BIGINT) AS p90_len,
               CAST(COUNT(CASE WHEN n_chars < 100 THEN 1 END) AS BIGINT)
                   AS n_short
        FROM base
    ),
    toplang AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM base GROUP BY lang
        ORDER BY n DESC, lang LIMIT 1
    )
    SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM core
    UNION ALL SELECT 'n_langs', CAST(n_langs AS DOUBLE) FROM core
    UNION ALL SELECT 'n_sources', CAST(n_sources AS DOUBLE) FROM core
    UNION ALL SELECT 'total_chars', CAST(total_chars AS DOUBLE) FROM core
    UNION ALL SELECT 'mean_doc_chars',
        CAST(total_chars AS DOUBLE) / CAST(n_docs AS DOUBLE) FROM core
    UNION ALL SELECT 'p50_doc_chars', CAST(p50_len AS DOUBLE) FROM core
    UNION ALL SELECT 'p90_doc_chars', CAST(p90_len AS DOUBLE) FROM core
    UNION ALL SELECT 'exact_dup_rate',
        CAST(n_docs - n_distinct AS DOUBLE) / CAST(n_docs AS DOUBLE) FROM core
    UNION ALL SELECT 'short_doc_rate',
        CAST(n_short AS DOUBLE) / CAST(n_docs AS DOUBLE) FROM core
    UNION ALL SELECT 'top_lang_share',
        CAST((SELECT n FROM toplang) AS DOUBLE)
            / CAST(n_docs AS DOUBLE) FROM core
    """,
    tags=("K56", "K11", "D13", "D16"),
)
def k56_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary (the Datasheets-for-Datasets / HF dataset
    card quantitative block as ONE query): corpus size, language/source
    breadth, length distribution (exact discrete percentiles), exact-dup
    rate from content digests, short-doc share, and top-language
    concentration — long-form (metric, value) so downstream tooling
    renders it directly. This is the governance deliverable the K-surface
    exists to feed; every number is an exact count, an actual data point
    (percentile_disc), or an exact-integer IEEE ratio, so the card
    hash-matches with no rounding discipline.

    Scale: one wide aggregate over the corpus (digest + lang + source
    distincts share the scan via Expand) plus a |langs|-row census for
    the concentration metric — two fact passes, no joins of fact scale.
    """
    d = table(spark, sf_dir, "documents").select(
        "lang", "source", "n_chars", F.md5("text").alias("digest")
    )
    core = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("digest").alias("n_distinct"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)")
        .cast("long")
        .alias("p50_len"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars)")
        .cast("long")
        .alias("p90_len"),
        F.count(F.when(F.col("n_chars") < 100, 1)).alias("n_short"),
    )
    toplang = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("lang").asc())
        .limit(1)
        .select(F.col("n").alias("top_n"))
    )
    c = core.crossJoin(F.broadcast(toplang))
    # ONE stack() unpivot of the single wide row (the d13 pattern) — a
    # unionAll-of-selects here would re-execute the corpus aggregate once
    # per metric row (10 scans for a 10-row report).
    nd = "cast(n_docs as double)"
    return c.select(
        F.expr(
            f"""stack(10,
            'n_docs', {nd},
            'n_langs', cast(n_langs as double),
            'n_sources', cast(n_sources as double),
            'total_chars', cast(total_chars as double),
            'mean_doc_chars', cast(total_chars as double) / {nd},
            'p50_doc_chars', cast(p50_len as double),
            'p90_doc_chars', cast(p90_len as double),
            'exact_dup_rate', cast(n_docs - n_distinct as double) / {nd},
            'short_doc_rate', cast(n_short as double) / {nd},
            'top_lang_share', cast(top_n as double) / {nd}
            ) as (metric, value)"""
        )
    )


K57_VOCAB = 12  # tokenizer vocabulary budget — the fixture's synthetic
# whitespace vocabulary is ~31 tokens, so a 12-token budget produces a real
# OOV spread (deciles 2-8); production would use 32k-128k over a BPE alphabet


@register(
    "k57_oov_rate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+'))
               AS tok
        FROM documents
    ),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, ROW_NUMBER() OVER (
                ORDER BY COUNT(*) DESC, tok ASC) AS rnk
            FROM toks GROUP BY tok
        ) WHERE rnk <= {K57_VOCAB}
    ),
    per_doc AS (
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_toks,
               CAST(COUNT(CASE WHEN v.tok IS NULL THEN 1 END) AS BIGINT)
                   AS n_oov
        FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
        GROUP BY t.doc_id
    )
    SELECT CAST(FLOOR(CAST(n_oov AS DOUBLE) / CAST(n_toks AS DOUBLE) * 10)
                AS INTEGER) AS oov_decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_toks,
           CAST(SUM(n_oov) AS BIGINT) AS total_oov
    FROM per_doc GROUP BY oov_decile
    """,
    tags=("K57", "K5", "K8", "K46"),
)
def k57_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary-coverage audit: fit a top-K57_VOCAB
    frequency vocabulary on the corpus (count-desc, token-asc ties —
    deterministic), then census each document's out-of-vocabulary token
    rate into deciles — the "will my tokenizer shatter this corpus into
    UNK/bytes" check run before committing a vocab budget (the
    acceptance test for K46's BPE induction, at the whole-corpus grain).
    High-OOV deciles localize exactly which documents a bigger vocab
    would help.

    Determinism: the vocab is a rank-window under a total order; OOV
    membership is a left join; the decile is floor of an exact-integer
    IEEE ratio.

    Scale: token explode is map-side; the vocab fits in a broadcast by
    construction (top-K), so the membership probe never shuffles the
    token stream; per-doc aggregation shuffles on doc_id once. Same
    shape as K21's surprisal join.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    )
    w = Window.partitionBy().orderBy(F.col("cnt").desc(), F.col("tok").asc())
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("tok", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= K57_VOCAB)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        )
    )
    decile = F.floor(
        F.col("n_oov").cast("double") / F.col("n_toks").cast("double") * 10
    ).cast("int")
    return per_doc.groupBy(decile.alias("oov_decile")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_toks"),
        F.sum("n_oov").alias("total_oov"),
    )


# K58 ablation rules: (name, duck_predicate). Thresholds chosen so each
# rule genuinely bites on the fixture (len: 37 docs, dup: 9, stop: ~50).
K58_MIN_LEN = 100
K58_DUP_MAX = 0.7
K58_STOP_MIN = 0.01


@register(
    "k58_filter_ablation",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               length(text) >= {K58_MIN_LEN} AS r_len,
               1.0 - len(list_distinct(string_split(lower(text), ' ')))::DOUBLE
                   / len(string_split(lower(text), ' ')) < {K58_DUP_MAX} AS r_dup,
               len(list_filter(string_split(lower(text), ' '),
                               x -> list_contains({list(STOPWORDS)}, x)))::DOUBLE
                   / len(string_split(lower(text), ' ')) >= {K58_STOP_MIN}
                   AS r_stop
        FROM documents
    ),
    flags AS (
        SELECT doc_id, r_len, r_dup, r_stop,
               CAST(NOT r_len AS INTEGER) + CAST(NOT r_dup AS INTEGER)
                   + CAST(NOT r_stop AS INTEGER) AS n_failed
        FROM t
    )
    SELECT rule,
           CAST(n_fail AS BIGINT) AS n_fail,
           CAST(n_fail_only AS BIGINT) AS n_fail_only,
           CAST((SELECT COUNT(*) FROM flags WHERE n_failed = 0) AS BIGINT)
               AS n_pass_all
    FROM (
        SELECT 'min_len' AS rule,
               COUNT(CASE WHEN NOT r_len THEN 1 END) AS n_fail,
               COUNT(CASE WHEN NOT r_len AND n_failed = 1 THEN 1 END)
                   AS n_fail_only
        FROM flags
        UNION ALL
        SELECT 'dup_ratio',
               COUNT(CASE WHEN NOT r_dup THEN 1 END),
               COUNT(CASE WHEN NOT r_dup AND n_failed = 1 THEN 1 END)
        FROM flags
        UNION ALL
        SELECT 'stopword_floor',
               COUNT(CASE WHEN NOT r_stop THEN 1 END),
               COUNT(CASE WHEN NOT r_stop AND n_failed = 1 THEN 1 END)
        FROM flags
    )
    """,
    tags=("K58", "K6", "D9"),
)
def k58_filter_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter ablation report: for each K6-style rule (length
    floor, repetition ceiling, stopword floor), how many documents fail
    it at all and how many fail ONLY it — the marginal-impact census a
    curation review reads before shipping a filter stack (a rule whose
    kills are all shared with other rules is redundant; one with many
    sole kills deserves a manual sample). Same decision-support shape as
    K43's survivor census, on the filter axis.

    Determinism: each rule is an exact-ratio threshold compare (the K6
    discipline); the report is three filtered counts per rule over one
    boolean projection.

    Scale: ONE corpus pass computes all rule flags map-side; the report
    is a 3-row aggregate — adding a rule adds a column, not a pass.
    """
    d = table(spark, sf_dir, "documents")
    toks = tokens_col()
    n_ch = F.length("text")
    dup = 1.0 - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop = (
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast(
            "double"
        )
        / F.size(toks)
    )
    flags = d.select(
        (n_ch >= K58_MIN_LEN).alias("r_len"),
        (dup < K58_DUP_MAX).alias("r_dup"),
        (stop >= K58_STOP_MIN).alias("r_stop"),
    ).select(
        "r_len",
        "r_dup",
        "r_stop",
        (
            (~F.col("r_len")).cast("int")
            + (~F.col("r_dup")).cast("int")
            + (~F.col("r_stop")).cast("int")
        ).alias("n_failed"),
    )
    agg = flags.agg(
        F.count(F.when(~F.col("r_len"), 1)).alias("f_len"),
        F.count(F.when(~F.col("r_len") & (F.col("n_failed") == 1), 1)).alias(
            "fo_len"
        ),
        F.count(F.when(~F.col("r_dup"), 1)).alias("f_dup"),
        F.count(F.when(~F.col("r_dup") & (F.col("n_failed") == 1), 1)).alias(
            "fo_dup"
        ),
        F.count(F.when(~F.col("r_stop"), 1)).alias("f_stop"),
        F.count(F.when(~F.col("r_stop") & (F.col("n_failed") == 1), 1)).alias(
            "fo_stop"
        ),
        F.count(F.when(F.col("n_failed") == 0, 1)).alias("n_pass_all"),
    )
    # stack() the single wide row (the d13 pattern): a unionAll of selects
    # would re-run the corpus aggregate once per rule row.
    return agg.select(
        F.expr(
            """stack(3,
            'min_len', f_len, fo_len,
            'dup_ratio', f_dup, fo_dup,
            'stopword_floor', f_stop, fo_stop
            ) as (rule, n_fail, n_fail_only)"""
        ),
        "n_pass_all",
    )


def _k61_oracle() -> str:
    from daas_apps_spark.registry import REGISTRY

    k41 = REGISTRY["k41_quality_classifier"].oracle
    return f"""
    WITH scored AS (
        SELECT s.doc_id, s.quality_score, d.source
        FROM ({k41}) s JOIN documents d ON d.doc_id = s.doc_id
        WHERE d.source IN ('src0', 'src1')
    ),
    counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM scored GROUP BY source
    ),
    steps AS (
        SELECT quality_score, doc_id, source,
               CAST(COUNT(CASE WHEN source = 'src0' THEN 1 END)
                    OVER (ORDER BY quality_score, doc_id) AS DOUBLE)
                   / (SELECT CAST(n AS DOUBLE) FROM counts WHERE source='src0')
                 - CAST(COUNT(CASE WHEN source = 'src1' THEN 1 END)
                    OVER (ORDER BY quality_score, doc_id) AS DOUBLE)
                   / (SELECT CAST(n AS DOUBLE) FROM counts WHERE source='src1')
               AS cdf_gap
        FROM scored
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM counts WHERE source = 'src0') AS n_a,
           (SELECT CAST(n AS BIGINT) FROM counts WHERE source = 'src1') AS n_b,
           MAX(abs(cdf_gap)) AS ks_stat
    FROM steps
    """


@register(
    "k61_score_ks_test",
    oracle=_k61_oracle(),
    tags=("K61", "K41", "DQ3", "E4"),
)
def k61_score_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the K41 quality
    scores of two sources: max |CDF_a − CDF_b| over the pooled ordered
    scores — the distribution-equality test behind "is the new scrape's
    quality profile the same as the old one" (DQ3's PSI bins the same
    question coarsely; KS is bin-free and sensitive anywhere along the
    distribution).

    Exact by construction: both empirical CDFs are running counts under
    the pooled (score, doc_id) total order divided by exact group sizes
    — integer ratios, so the max gap hash-matches with no ε.

    Scale: one pooled sort (a global window here; per the e7 rule, at
    100 TB the pooled order would be range-partitioned and the running
    counts composed per range — same two-pass trick as K48's prefix
    window); everything else is two scalar counts.
    """
    from daas_apps_spark.operators.text import k41_quality_classifier

    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    scored = (
        k41_quality_classifier(spark, sf_dir)
        .select("doc_id", "quality_score")
        .join(d, "doc_id")
        .filter(F.col("source").isin("src0", "src1"))
    )
    counts = scored.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    n_a = counts.filter("source = 'src0'").select(F.col("n").alias("n_a"))
    n_b = counts.filter("source = 'src1'").select(F.col("n").alias("n_b"))
    w = Window.orderBy("quality_score", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    steps = (
        scored.crossJoin(F.broadcast(n_a))
        .crossJoin(F.broadcast(n_b))
        .select(
            (
                F.count(F.when(F.col("source") == "src0", 1)).over(w).cast("double")
                / F.col("n_a").cast("double")
                - F.count(F.when(F.col("source") == "src1", 1)).over(w).cast("double")
                / F.col("n_b").cast("double")
            ).alias("cdf_gap"),
            "n_a",
            "n_b",
        )
    )
    return steps.groupBy("n_a", "n_b").agg(
        F.max(F.abs("cdf_gap")).alias("ks_stat")
    ).select(F.col("n_a").cast("long"), F.col("n_b").cast("long"), "ks_stat")


K62_PREFIX_LEN = 16
K62_TOP = 10


@register(
    "k62_template_prefixes",
    oracle=f"""
    WITH pref AS (
        SELECT substring(text, 1, {K62_PREFIX_LEN}) AS prefix,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1
    ),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents)
    SELECT prefix, n_docs,
           CAST(n_docs AS DOUBLE) / (SELECT n FROM tot) AS share,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY n_docs DESC, prefix) AS rnk
        FROM pref
    )
    WHERE rnk <= {K62_TOP}
    """,
    tags=("K62", "K12", "K6"),
)
def k62_template_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-prefix census: the top shared {K62_PREFIX_LEN}-char
    document prefixes with their corpus share — boilerplate/prompt
    templates ("Subject: ", "<!DOCTYPE html>", scaffold headers) surface
    as high-share prefixes long before full near-dup analysis runs, and
    the census is ~free (one aggregate) where K3 costs signatures and
    joins. The curation move it feeds: inspect the top prefixes, then
    strip or downweight the matched cohorts.

    Scale: map-side prefix projection + one aggregate; the top-k rank
    runs over the distinct-prefix relation, and a production variant
    caps it with TakeOrderedAndProject exactly like F4.
    """
    d = table(spark, sf_dir, "documents")
    pref = d.groupBy(
        F.substring("text", 1, K62_PREFIX_LEN).alias("prefix")
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = d.agg(F.count(F.lit(1)).cast("double").alias("n"))
    w = Window.partitionBy().orderBy(F.col("n_docs").desc(), F.col("prefix"))
    return (
        pref.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= K62_TOP)
        .crossJoin(F.broadcast(tot))
        .select(
            "prefix",
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("n")).alias("share"),
            "rnk",
        )
    )


# K64 release thresholds: metric -> (op, bound). The gate READS the K56
# card; changing a threshold is a config edit, not an operator change.
K64_GATES = (
    ("exact_dup_rate", "max", 0.05),
    ("short_doc_rate", "max", 0.25),
    ("top_lang_share", "max", 0.60),
    ("p50_doc_chars", "min", 120.0),
    ("n_docs", "min", 100.0),
)


def _k64_oracle() -> str:
    from daas_apps_spark.registry import REGISTRY

    card = REGISTRY["k56_dataset_card"].oracle
    rows = ", ".join(
        f"('{m}', '{op}', CAST({b} AS DOUBLE))" for m, op, b in K64_GATES
    )
    return f"""
    WITH card AS ({card}),
    gates(metric, op, bound) AS (VALUES {rows})
    SELECT g.metric, c.value, g.op, g.bound,
           CASE WHEN g.op = 'max' THEN c.value <= g.bound
                ELSE c.value >= g.bound END AS passes
    FROM gates g JOIN card c ON c.metric = g.metric
    """


@register(
    "k64_release_gate",
    oracle=_k64_oracle(),
    tags=("K64", "K56", "DQ4", "B19"),
)
def k64_release_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset release gate: the K56 card joined against a declared
    threshold table (dup-rate ceiling, short-doc ceiling, language-
    concentration ceiling, length and size floors) emitting per-check
    pass/fail — the ship/don't-ship artifact a data-release process
    signs off on, closing the governance arc (card → gate → release).
    DQ4's rule: the gate REPORTS; enforcement is the caller's decision.

    Thresholds live in one literal table (B19's parameter-table idiom),
    so tuning the gate is a config edit; the comparison directions are
    data ('max'/'min'), not code branches.

    Scale: inherits K56's two fact passes; the gate itself joins two
    tiny relations.
    """
    card = k56_dataset_card(spark, sf_dir)
    gates = spark.createDataFrame(
        [(m, op, float(b)) for m, op, b in K64_GATES],
        "metric string, op string, bound double",
    )
    return (
        card.join(F.broadcast(gates), "metric")
        .select(
            "metric",
            "value",
            "op",
            "bound",
            F.when(F.col("op") == "max", F.col("value") <= F.col("bound"))
            .otherwise(F.col("value") >= F.col("bound"))
            .alias("passes"),
        )
    )


K67_TOP_TERMS = 3


@register(
    "k67_keyword_extraction",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY 1, 2
    ),
    df AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok GROUP BY term
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
        SELECT t.doc_id, t.term,
               ROUND(t.tf * ln((SELECT n_docs FROM n) / d.df), 6) AS tfidf
        FROM tf t JOIN df d ON d.term = t.term
    )
    SELECT doc_id, term, tfidf, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term) AS rnk
        FROM scored
    ) WHERE rnk <= {K67_TOP_TERMS}
    """,
    tags=("K67", "K8", "F5"),
)
def k67_keyword_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: each document's top-{K67_TOP_TERMS}
    terms by tf·ln(N/df) — the zero-dependency tagger behind search
    facets, dataset browsing, and topic labels (K8 publishes the model
    tables; this applies them back per document). The tfidf float is one
    multiply of an exact count by one log evaluation — the same
    single-expression shape the K21 surprisal scorer pins — rounded at
    the report edge, and the per-doc rank breaks ties by term so top-k
    is total-ordered.

    Scale: (doc, term) tf and term df are the K8 aggregates; the score
    join broadcasts the |vocab|-row df side onto the tf stream, and the
    top-k window partitions by doc — one shuffle each, no corpus-sized
    sort.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col()).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df.crossJoin(F.broadcast(n))), "term")
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= K67_TOP_TERMS)
    )
