"""K9-K11: training-corpus construction operators — deterministic sampling,
train/test splitting, token counting, chunking, PII redaction, quality
reporting, and an end-to-end corpus pipeline.

These are the operations a 100 TB LLM-data pipeline runs between "raw
documents" and "training shards". Design rules shared by every operator:

- **Sampling is a pure content function, never RNG.** Sample membership is
  decided by an md5-derived integer of the stable key (same trick as the
  minhash base hash, operators/dedup.py) — partition-independent,
  re-runnable, and exactly reproducible in the DuckDB oracle. Spark's
  ``df.sample()`` is seed+partition dependent and cannot be oracle-checked.
- **Everything stays in whole-stage codegen.** Per-row expressions only
  (regexp/substring/conv), plus at most one aggregation shuffle; no Python
  in any hot path.
- **Counts over payloads.** Operators that *measure* text (token counts,
  redaction spans) return scalar counts/lengths so the driver canonicalizer
  hashes them; chunk/redact operators that return text return plain string
  columns.

Reference analog: the reference's pipeline selects/splits inputs by naming
convention before the heavy stages (MiscUtils.getFilesInFolder,
MiscUtils.java:15-38); here selection is content-hash-driven so it survives
re-partitioning and re-runs at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.registry import register

# 28-bit md5-prefix int of the doc_id — identical on both engines.
_H_SPARK = "cast(conv(substring(md5(cast(doc_id as string)), 1, 7), 16, 10) as bigint)"
_H_DUCK = "('0x' || substring(md5(cast(doc_id as varchar)), 1, 7))::BIGINT"

# BPE-ish pre-tokenizer: letter runs, single digits, single punctuation —
# the shape (not the vocab) of a GPT-2-style pre-tokenization pass.
_BPE_PAT = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


@register(
    "k9_hash_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {_H_DUCK} % 1000 < 80
    """,
    tags=("K9", "K1"),
)
def k9_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~8% Bernoulli sample by content-hash threshold.

    ``hash(doc_id) % 1000 < 80`` — membership is a property of the row, not
    of the partitioning or a seed, so the sample is identical across
    cluster sizes, retries, and engines. This is the only sampling
    construction that can be oracle-verified exactly.
    """
    d = table(spark, sf_dir, "documents")
    return d.filter(F.expr(f"{_H_SPARK} % 1000 < 80")).select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "k9_train_test_split",
    oracle=f"""
    SELECT CASE WHEN {_H_DUCK} % 100 < 80 THEN 'train'
                WHEN {_H_DUCK} % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
    tags=("K9",),
)
def k9_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/valid/test assignment by stable hash.

    Hash-based splitting keeps a document in the same split forever — the
    property that prevents train/test leakage when the corpus is rebuilt
    incrementally. Emits the split × language census (a skewed language
    balance in 'test' is the classic silent eval bug).
    """
    d = table(spark, sf_dir, "documents")
    h = F.expr(f"{_H_SPARK} % 100")
    split = (
        F.when(h < 80, "train").when(h < 90, "valid").otherwise("test")
    ).alias("split")
    return d.groupBy(split, "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@register(
    "k9_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_H_DUCK} % 1000 <
          CASE WHEN lang IN ('en', 'es') THEN 50 ELSE 200 END
    """,
    tags=("K9",),
)
def k9_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: per-language rates (downsample high-resource,
    upsample low-resource) via group-dependent hash thresholds.

    The rate lives in the threshold, so stratification needs NO shuffle and
    no per-group state — at 100 TB this is a pure scan-side filter, unlike
    ``sampleBy`` which is seeded per partition and not reproducible.
    """
    d = table(spark, sf_dir, "documents")
    threshold = F.when(F.col("lang").isin("en", "es"), 50).otherwise(200)
    return d.filter(F.expr(f"{_H_SPARK} % 1000") < threshold).select(
        "doc_id", "lang", "source"
    )


@register(
    "k10_token_count",
    oracle=f"""
    SELECT doc_id, lang,
           CAST(length(text) AS BIGINT) AS n_chars_exact,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER)
               AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) AS INTEGER)
               AS n_bpe_tokens
    FROM documents
    WHERE length(text) > 0
    """,
    tags=("K10", "K5"),
)
def k10_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace words + BPE-ish pre-tokenizer regex.

    The BPE-ish pattern (letter runs | single digits | single punctuation)
    is the standard pre-tokenization shape; its count is the budget estimate
    training pipelines bill by. Both counts are single-pass regexp
    expressions — no UDF, fully codegen'd.
    """
    d = table(spark, sf_dir, "documents")
    return d.filter(F.length("text") > 0).select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("n_chars_exact"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
    )


_CHUNK_SIZE = 80
_CHUNK_STRIDE = 40


@register(
    "k10_chunk_documents",
    oracle=f"""
    SELECT doc_id,
           CAST(i AS INTEGER) AS chunk_id,
           substring(text, CAST(i * {_CHUNK_STRIDE} + 1 AS INTEGER),
                     {_CHUNK_SIZE}) AS chunk,
           CAST(length(substring(text, CAST(i * {_CHUNK_STRIDE} + 1 AS INTEGER),
                                 {_CHUNK_SIZE})) AS INTEGER) AS chunk_len
    FROM documents,
         unnest(range(((length(text) - 1) // {_CHUNK_STRIDE}) + 1)) AS t(i)
    WHERE doc_id % 20 = 0 AND length(text) > 0
    """,
    tags=("K10",),
)
def k10_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: 80-char windows, 40-char stride.

    ``explode(sequence(...))`` fans each document into its chunk index space
    JVM-side; the chunk text is a ``substring`` per row. The fan-out factor
    is len/stride ≈ 2× rows — bounded and shuffle-free (chunking is a map
    stage; the downstream shard-writer does the one repartition). The demo
    subsets doc_id % 20 to keep the oracle result compact.
    """
    d = table(spark, sf_dir, "documents")
    n_chunks = (F.floor((F.length("text") - 1) / _CHUNK_STRIDE) + 1).cast("int")
    chunk = F.substring(
        F.col("text"), F.col("i") * _CHUNK_STRIDE + 1, _CHUNK_SIZE
    )
    return (
        d.filter((F.col("doc_id") % 20 == 0) & (F.length("text") > 0))
        .select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("int").alias("chunk_id"),
            chunk.alias("chunk"),
            F.length(chunk).cast("int").alias("chunk_len"),
        )
    )


@register(
    "k10_pii_redact",
    oracle="""
    WITH enriched AS (
        SELECT doc_id,
               text || ' contact: user' || CAST(doc_id AS VARCHAR)
                    || '@example.com id:' || CAST(doc_id * 7919 AS VARCHAR)
                   AS raw
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(
               regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+',
                              '<EMAIL>', 'g'),
               '[0-9]{3,}')) AS INTEGER) AS n_num_spans,
           CAST(length(regexp_replace(
               regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+',
                              '<EMAIL>', 'g'),
               '[0-9]{3,}', '<NUM>', 'g')) AS BIGINT) AS redacted_len
    FROM enriched
    """,
    tags=("K10", "K6"),
)
def k10_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: e-mail and long-digit-run redaction with span counts.

    The fixture text is synthetic words, so a deterministic contact line is
    appended first (same construction in the oracle) to give the patterns
    real matches; the operator itself — regexp_replace chains + span counts
    — is exactly the production shape. Spark's ``regexp_replace`` replaces
    all occurrences; the DuckDB twin needs the explicit ``'g'`` flag.
    Order matters and is pinned: e-mails are redacted BEFORE digit runs so
    a numeric local-part isn't double-counted.
    """
    email_pat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    num_pat = "[0-9]{3,}"
    d = table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com id:"),
        (F.col("doc_id") * 7919).cast("string"),
    )
    no_email = F.regexp_replace(raw, email_pat, "<EMAIL>")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(raw, F.lit(email_pat), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(no_email, F.lit(num_pat), F.lit(0))).alias(
            "n_num_spans"
        ),
        F.length(F.regexp_replace(no_email, num_pat, "<NUM>"))
        .cast("long")
        .alias("redacted_len"),
    )


@register(
    "k11_quality_report",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_short,
           CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_blank
    FROM documents
    GROUP BY lang
    """,
    tags=("K11", "D1"),
)
def k11_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus data-quality census per language: volume, source diversity,
    length distribution, short/blank pathology counts.

    The pre-training gate every corpus build runs before spending GPU time.
    One aggregation shuffle; the integer sums are exact, and avg is the
    same double division on both engines (bit-identical).
    """
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.sum(F.when(F.col("n_chars") < 100, 1).otherwise(0))
        .cast("long")
        .alias("n_short"),
        F.sum(F.when(F.length(F.trim(F.col("text"))) == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_blank"),
    )


@register(
    "k11_corpus_pipeline",
    oracle=f"""
    WITH hashed AS (
        SELECT doc_id, lang, text, sha256(text) AS digest
        FROM documents
    ),
    deduped AS (
        SELECT doc_id, lang, text,
               ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id ASC) AS rn
        FROM hashed
    ),
    sampled AS (
        SELECT doc_id, lang, text FROM deduped
        WHERE rn = 1 AND {_H_DUCK} % 100 < 50
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS total_ws_tokens,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
               / COUNT(*) AS avg_ws_tokens
    FROM sampled
    GROUP BY lang
    """,
    tags=("K11", "K1", "K9", "K5"),
    bench=True,
)
def k11_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end mini corpus build: exact-dedup → hash-sample 50% → token
    census per language.

    The composition is the point: dedup's window, the sampling filter, and
    the final aggregation all land in ONE DataFrame plan — Catalyst pushes
    the sampling filter below the dedup window's shuffle partner where legal
    and prunes text columns it never needs. Three stages total at any scale:
    scan → digest-window shuffle → aggregate shuffle.
    """
    d = table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("digest").orderBy(F.col("doc_id").asc())
    ws_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        d.select("doc_id", "lang", "text", F.sha2("text", 256).alias("digest"))
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.expr(f"{_H_SPARK} % 100 < 50")))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(ws_tokens).cast("long").alias("total_ws_tokens"),
            (F.sum(ws_tokens).cast("double") / F.count(F.lit(1))).alias(
                "avg_ws_tokens"
            ),
        )
    )


# Domain assignment: sources map deterministically onto three "domains"
# (web/books/code) by source number — a stand-in for the real domain
# taxonomy a corpus build carries in metadata.
_DOM_SPARK = (
    "CASE CAST(substring(source, 4, 10) AS INT) % 3 "
    "WHEN 0 THEN 'web' WHEN 1 THEN 'books' ELSE 'code' END"
)
_DOM_DUCK = (
    "CASE CAST(substring(source, 4) AS INT) % 3 "
    "WHEN 0 THEN 'web' WHEN 1 THEN 'books' ELSE 'code' END"
)
# Target mixture weights (sum to 1) and overall sampling budget: the mixed
# corpus targets 50% of the raw corpus size. The rate expression is ONE
# shared SQL text evaluated by both engines in float64 (the CAST keeps the
# decimal literals out of DECIMAL arithmetic, which would round differently
# than Spark's double path and flip the hash on target_rate).
_MIX_RATE = (
    "LEAST(CAST(1.0 AS DOUBLE), "
    "CAST(CASE domain WHEN 'web' THEN 0.6 WHEN 'books' THEN 0.3 "
    "ELSE 0.1 END AS DOUBLE) * 0.5 * n_total / n_dom)"
)


@register(
    "k14_domain_mix",
    oracle=f"""
    WITH tagged AS (
        SELECT doc_id, {_DOM_DUCK} AS domain FROM documents
    ),
    counts AS (
        SELECT domain, COUNT(*) AS n_dom,
               (SELECT COUNT(*) FROM tagged) AS n_total
        FROM tagged GROUP BY domain
    ),
    rates AS (
        SELECT domain, n_dom, {_MIX_RATE} AS rate
        FROM counts
    ),
    sampled AS (
        SELECT t.doc_id, t.domain, r.n_dom, r.rate
        FROM tagged t JOIN rates r ON t.domain = r.domain
        WHERE {_H_DUCK} % 1000000 <
              CAST(FLOOR(r.rate * 1000000) AS BIGINT)
    )
    SELECT domain,
           CAST(MAX(n_dom) AS BIGINT) AS n_candidates,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(COUNT(*) AS DOUBLE) / MAX(n_dom) AS realized_rate,
           CAST(MAX(rate) AS DOUBLE) AS target_rate
    FROM sampled GROUP BY domain
    """,
    tags=("K14", "K9", "C5"),
)
def k14_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixture sampling: hit target mixture weights (web 60% /
    books 30% / code 10%) within an overall 50%-of-corpus budget by
    computing per-domain acceptance rates from the domain census, then
    hash-thresholding each document against its domain's rate.

    The published recipe (The Pile, ROOTS, Dolma — domain-weighted corpus
    mixing) done Spark-shaped: the census is a tiny aggregate, the rates
    relation is BROADCAST back onto the corpus, and membership is the K9
    content-hash threshold — so the mix is one metadata aggregation plus
    one scan-side filtered pass at any corpus size, and every engine
    re-derives the identical sample.
    """
    d = table(spark, sf_dir, "documents")
    tagged = d.select("doc_id", F.expr(_DOM_SPARK).alias("domain"))
    total = tagged.agg(F.count(F.lit(1)).alias("n_total"))  # 1-row census
    counts = tagged.groupBy("domain").agg(F.count(F.lit(1)).alias("n_dom"))
    rates = counts.crossJoin(F.broadcast(total)).select(
        "domain",
        "n_dom",
        F.expr(_MIX_RATE).alias("rate"),
    )
    sampled = tagged.join(F.broadcast(rates), "domain").filter(
        F.expr(f"{_H_SPARK} % 1000000")
        < F.floor(F.col("rate") * 1000000).cast("long")
    )
    return sampled.groupBy("domain").agg(
        F.max("n_dom").cast("long").alias("n_candidates"),
        F.count(F.lit(1)).alias("n_sampled"),
        (F.count(F.lit(1)).cast("double") / F.max("n_dom")).alias("realized_rate"),
        F.max("rate").cast("double").alias("target_rate"),
    )


N_SHARDS = 8


@register(
    "k19_shard_manifest",
    oracle=f"""
    SELECT CAST({_H_DUCK} % {N_SHARDS} AS INTEGER) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM({_H_DUCK}) AS BIGINT) AS id_checksum,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM documents
    GROUP BY 1
    """,
    tags=("K19", "A6", "K9"),
)
def k19_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard writer + manifest: the corpus lands hive-partitioned
    into content-hash shards, and the returned manifest (per-shard counts,
    char volume, order-independent id checksum, id range) is what a
    training loader validates before consuming.

    Shard assignment is the K9 content hash — independent of partitioning
    and re-runs, so rebuilding the corpus reproduces byte-identical shard
    membership (the property that makes resumable multi-epoch training
    sane). The checksum is a SUM of per-doc hashes: order-independent, so
    any engine — and any shard reader — re-derives it without a sort. The
    sink is a real partitioned parquet write; the manifest is computed
    from the written files, so a lost or duplicated row surfaces as a
    checksum mismatch against the oracle.
    """
    from daas_apps_spark.sources.io import scratch_dir

    path = scratch_dir("k19_shards")
    d = table(spark, sf_dir, "documents")
    sharded = d.withColumn(
        "shard", F.expr(f"cast({_H_SPARK} % {N_SHARDS} as int)")
    )
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.expr(_H_SPARK)).cast("long").alias("id_checksum"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
    )


_PACK_BUDGET = 2048


@register(
    "k20_sequence_pack",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents WHERE length(text) > 0
    ),
    packed AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM toks
    )
    SELECT source,
           CAST((cum_tokens - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM packed
    GROUP BY source, 2
    """,
    tags=("K20", "K10", "E4"),
)
def k20_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: fill fixed token-budget packs per source shard.

    Training loaders don't consume ragged documents — they consume packed
    context windows. This is next-fit packing in one window pass: docs are
    laid out in deterministic (source, doc_id) order, the running token
    total is a cumulative-sum window, and a doc belongs to the pack where
    its first token lands (``(cum - n_tokens) // budget``). No self-join,
    no iteration — one shuffle by source, then map-side arithmetic; at
    100 TB the partition key becomes (source, day-bucket) so no single
    source serializes the window. Integer token counts make every column
    exact.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.filter(F.length("text") > 0).select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias(
            "n_tokens"
        ),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return (
        packed.withColumn(
            "pack_id",
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / _PACK_BUDGET),
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@register(
    "k26_curation_pipeline",
    oracle=f"""
    WITH gated AS (
        SELECT doc_id, lang, text, sha256(text) AS digest,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
        WHERE length(text) >= 100
          AND len(string_split_regex(trim(text), '\\s+')) >= 20
    ),
    deduped AS (
        SELECT doc_id, lang, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
        FROM gated
    ),
    sampled AS (
        SELECT doc_id, lang, n_tokens FROM deduped
        WHERE rn = 1 AND {{h}} % 100 < 80
    ),
    packed AS (
        SELECT lang, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM sampled
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT (cum_tokens - n_tokens) // {_PACK_BUDGET})
                AS BIGINT) AS n_packs,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE)
                 / (COUNT(DISTINCT (cum_tokens - n_tokens) // {_PACK_BUDGET})
                    * {_PACK_BUDGET}), 4) AS avg_pack_fill
    FROM packed
    GROUP BY lang
    """.replace("{h}", _H_DUCK),
    tags=("K26", "K11", "K6", "K1", "K9", "K20"),
)
def k26_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation arc in ONE DataFrame DAG: quality gate → exact
    dedup keep-first → deterministic 80% hash sample → per-language
    next-fit sequence packing → per-language shard report (doc/token
    counts, pack count, pack-fill utilization).

    k11 demonstrated dedup→sample→census; this adds the quality gate at
    the head and the K20 packing pass at the tail — the whole pipeline a
    training-data build actually runs, expressed as one lazy plan that
    Catalyst schedules end to end (scan predicates pushed, text dropped
    right after hashing/counting, three hash exchanges total: digest
    window, lang packing window — whose partitioning the final per-lang
    aggregate then reuses — and the 1-row-per-lang report).

    Scale: every stage is a window or aggregate on a key with bounded
    state; nothing iterates, nothing joins, nothing collects. The
    lang-packing window serializes per language — at 100 TB partition by
    (lang, day-bucket) exactly as k20 documents for source shards.
    """
    d = table(spark, sf_dir, "documents")
    ws_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    gated = (
        d.filter(F.length("text") >= 100)
        .select(
            "doc_id", "lang",
            F.sha2("text", 256).alias("digest"),
            ws_tokens.alias("n_tokens"),
        )
        .filter(F.col("n_tokens") >= 20)
    )
    w_dup = Window.partitionBy("digest").orderBy("doc_id")
    sampled = (
        gated.withColumn("rn", F.row_number().over(w_dup))
        .filter((F.col("rn") == 1) & (F.expr(_H_SPARK) % 100 < 80))
        .select("doc_id", "lang", "n_tokens")
    )
    w_pack = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = sampled.withColumn(
        "pack_id",
        F.floor(
            (F.sum("n_tokens").over(w_pack) - F.col("n_tokens")) / _PACK_BUDGET
        ),
    )
    return packed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.countDistinct("pack_id").alias("n_packs"),
        F.round(
            F.sum("n_tokens").cast("double")
            / (F.countDistinct("pack_id") * F.lit(float(_PACK_BUDGET))),
            4,
        ).alias("avg_pack_fill"),
    )


@register(
    "k45_temperature_mix",
    oracle=f"""
    WITH census AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang
    ),
    weighted AS (
        SELECT lang, n_docs,
               CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)
                   AS w_fp,
               SUM(n_docs) OVER () AS n_total,
               SUM(CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1000000)
                        AS BIGINT)) OVER () AS w_total
        FROM census
    ),
    rates AS (
        SELECT lang, n_docs,
               CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE) AS share_raw,
               CAST(w_fp AS DOUBLE) / CAST(w_total AS DOUBLE) AS share_temp,
               (CAST(w_fp AS DOUBLE) / CAST(w_total AS DOUBLE))
                   * CAST(n_total AS DOUBLE)
                   / CAST(n_docs AS DOUBLE) AS resample_factor
        FROM weighted
    ),
    sampled AS (
        SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_sampled
        FROM documents d JOIN rates r ON r.lang = d.lang
        WHERE {_H_DUCK} % 1000000 <
              CAST(FLOOR(LEAST(1.0, r.resample_factor) * 1000000) AS BIGINT)
        GROUP BY d.lang
    )
    SELECT r.lang, r.n_docs, r.share_raw, r.share_temp, r.resample_factor,
           COALESCE(s.n_sampled, 0) AS n_sampled
    FROM rates r LEFT JOIN sampled s ON s.lang = r.lang
    """,
    tags=("K45", "K14", "K9"),
)
def k45_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing (the multilingual-pretraining
    recipe: sample languages ∝ p^α with α < 1 so head languages shrink and
    tail languages grow — XLM-R / mT5 style, here α = 1/2 so the power is
    an IEEE-exact ``sqrt``).

    Complements k14_domain_mix (explicit target weights) with the
    OBSERVED-distribution power transform: per-language weights are derived
    from the census itself. Determinism: sqrt is correctly rounded in
    IEEE 754, the weight is floored to integer millionths, and the weight
    SUM is integer — so shares and resample factors are identical double
    expressions on both engines with no rounding discipline. Languages with
    resample_factor < 1 are downsampled by the K9 content-hash threshold;
    factors > 1 report the upsampling epochs a training loader would apply
    (you can't hash-sample MORE rows than exist — the factor IS the
    contract).

    Scale: the census is a tiny aggregate; rates broadcast back onto the
    corpus; the sampled census is one scan-side filtered aggregate. Two
    passes over documents total, both narrow projections.
    """
    d = table(spark, sf_dir, "documents")
    census = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w_all = Window.partitionBy()
    w_fp = F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000000).cast(
        "long"
    )
    weighted = census.select(
        "lang",
        "n_docs",
        w_fp.alias("w_fp"),
        F.sum("n_docs").over(w_all).alias("n_total"),
        F.sum(w_fp).over(w_all).alias("w_total"),
    )
    rates = weighted.select(
        "lang",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("n_total").cast("double"))
        .alias("share_raw"),
        (F.col("w_fp").cast("double") / F.col("w_total").cast("double"))
        .alias("share_temp"),
        (
            (F.col("w_fp").cast("double") / F.col("w_total").cast("double"))
            * F.col("n_total").cast("double")
            / F.col("n_docs").cast("double")
        ).alias("resample_factor"),
    )
    accept = F.expr(f"{_H_SPARK} % 1000000") < F.floor(
        F.least(F.lit(1.0), F.col("resample_factor")) * 1000000
    ).cast("long")
    sampled = (
        d.join(F.broadcast(rates.select("lang", "resample_factor")), "lang")
        .filter(accept)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return rates.join(sampled, "lang", "left").select(
        "lang",
        "n_docs",
        "share_raw",
        "share_temp",
        "resample_factor",
        F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
    )


K60_EPOCHS = 3


@register(
    "k60_epoch_shuffle",
    oracle=f"""
    WITH ordered AS (
        SELECT e.epoch, d.doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY e.epoch
                   ORDER BY md5(e.epoch || ':' || d.doc_id), d.doc_id
               ) AS pos
        FROM documents d,
             unnest(range({K60_EPOCHS})) AS e(epoch)
    )
    SELECT CAST(epoch AS INTEGER) AS epoch,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(CASE WHEN pos = 1 THEN doc_id END) AS first_doc,
           MIN(CASE WHEN pos = 2 THEN doc_id END) AS second_doc,
           CAST(SUM(pos * (doc_id + 7)) AS BIGINT) AS order_checksum
    FROM ordered GROUP BY epoch
    """,
    tags=("K60", "K9", "E1"),
)
def k60_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch data-loader shuffle: each training epoch
    orders the corpus by md5(epoch ‖ doc_id) — a different but fully
    reproducible permutation per epoch, the property that makes
    training runs resumable and bug reports replayable (seeded RNG
    shuffles break under repartitioning; a content-hash order cannot,
    K9's hash-not-rand rule applied to ordering). The census carries an
    order-sensitive checksum Σ pos·(doc_id+7) — any transposition
    anywhere in any epoch's permutation changes it.

    Scale: one rank window per epoch partition (epoch count is tiny, so
    the fan-out is |docs|×epochs narrow rows); a real loader materializes
    the (epoch, pos, doc_id) manifest once and range-reads it — this
    query IS that manifest build plus its validation checksum.
    """
    d = table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(K60_EPOCHS).select(
        F.col("id").cast("int").alias("epoch")
    )
    fanned = d.crossJoin(F.broadcast(epochs))
    w = Window.partitionBy("epoch").orderBy(
        F.md5(F.concat_ws(":", F.col("epoch"), F.col("doc_id"))),
        F.col("doc_id"),
    )
    ordered = fanned.select("epoch", "doc_id", F.row_number().over(w).alias("pos"))
    return ordered.groupBy("epoch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.when(F.col("pos") == 1, F.col("doc_id"))).alias("first_doc"),
        F.min(F.when(F.col("pos") == 2, F.col("doc_id"))).alias("second_doc"),
        F.sum(F.col("pos") * (F.col("doc_id") + 7)).alias("order_checksum"),
    )


K63_BATCH = 32  # sequences per training batch


def _k63_oracle() -> str:
    arms = {
        "hash_order": "md5('b:' || CAST(doc_id AS VARCHAR)), doc_id",
        "length_sorted": "n_tokens, doc_id",
    }
    branches = []
    for name, order in arms.items():
        branches.append(f"""
    SELECT '{name}' AS ordering,
           CAST(COUNT(*) AS BIGINT) AS n_batches,
           CAST(SUM(batch_tokens) AS BIGINT) AS real_tokens,
           CAST(SUM(CAST(batch_max AS BIGINT) * n_in_batch) AS BIGINT)
               AS padded_tokens,
           CAST(SUM(CAST(batch_max AS BIGINT) * n_in_batch - batch_tokens)
                AS DOUBLE)
               / CAST(SUM(CAST(batch_max AS BIGINT) * n_in_batch) AS DOUBLE)
               AS waste_rate
    FROM (
        SELECT CAST((rn - 1) // {K63_BATCH} AS BIGINT) AS batch_id,
               MAX(n_tokens) AS batch_max,
               SUM(n_tokens) AS batch_tokens,
               COUNT(*) AS n_in_batch
        FROM (
            SELECT doc_id, n_tokens,
                   ROW_NUMBER() OVER (ORDER BY {order}) AS rn
            FROM lens
        ) GROUP BY 1
    )""")
    return f"""
    WITH lens AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    )
    {" UNION ALL ".join(branches)}
    """


@register(
    "k63_batch_padding_waste",
    oracle=_k63_oracle(),
    tags=("K63", "K20", "K60", "F1"),
)
def k63_batch_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste comparison between batching orders: documents packed
    into fixed-size batches of {K63_BATCH} under (a) the K60 hash
    shuffle order and (b) length-sorted order; per arm, the padded token
    count (Σ batch_max·batch_size — every sequence pads to its batch
    max) vs real tokens, and the waste rate. This is the measured ROI of
    length-bucketed batching (the dynamic-batching argument every
    training/serving stack makes) — on mixed-length corpora the sorted
    arm's waste collapses because batch peers share lengths.

    Determinism: lengths are integers, orderings are total (hash or
    (length, id)), batch assignment is integer division of the rank —
    every quantity is exact; the waste rate is one exact-integer IEEE
    division per arm.

    Scale: each arm is a rank window over (doc, length) rows — the K48
    prefix-window note applies (range-partitioned composition at 100 TB)
    — followed by a |batches|-row aggregate; the real packer (K20) then
    consumes the chosen ordering.
    """
    d = table(spark, sf_dir, "documents")
    lens = d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    # both arms' ranks in ONE corpus pass (two window sorts over the same
    # scan), stacked to (ordering, rn) rows — a per-arm unionAll of
    # pipelines would re-scan documents per arm (the k56 rule)
    w_hash = Window.partitionBy().orderBy(
        F.md5(F.concat(F.lit("b:"), F.col("doc_id").cast("string"))),
        F.col("doc_id"),
    )
    w_len = Window.partitionBy().orderBy(F.col("n_tokens"), F.col("doc_id"))
    ranked = lens.select(
        "n_tokens",
        F.row_number().over(w_hash).alias("rn_hash"),
        F.row_number().over(w_len).alias("rn_len"),
    ).select(
        F.expr(
            "stack(2, 'hash_order', rn_hash, 'length_sorted', rn_len)"
            " as (ordering, rn)"
        ),
        "n_tokens",
    )
    batches = ranked.groupBy(
        "ordering", ((F.col("rn") - 1) / K63_BATCH).cast("long").alias("batch_id")
    ).agg(
        F.max("n_tokens").alias("batch_max"),
        F.sum("n_tokens").alias("batch_tokens"),
        F.count(F.lit(1)).alias("n_in_batch"),
    )
    padded = F.sum(F.col("batch_max") * F.col("n_in_batch"))
    return batches.groupBy("ordering").agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("batch_tokens").alias("real_tokens"),
        padded.alias("padded_tokens"),
        (
            (padded - F.sum("batch_tokens")).cast("double")
            / padded.cast("double")
        ).alias("waste_rate"),
    )


K65_LENGTHS = (64, 128, 256, 512)  # candidate context budgets (tokens)


@register(
    "k65_context_fit",
    oracle=f"""
    WITH lens AS (
        SELECT CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
        FROM documents
    ),
    cands(ctx) AS (VALUES {", ".join(f"({c})" for c in K65_LENGTHS)})
    SELECT CAST(c.ctx AS INTEGER) AS ctx,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN n_tokens <= c.ctx THEN 1 END) AS BIGINT)
               AS n_fit,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN n_tokens > c.ctx THEN n_tokens - c.ctx
                         ELSE 0 END) AS BIGINT) AS truncated_tokens,
           CAST(SUM(CASE WHEN n_tokens > c.ctx THEN n_tokens - c.ctx
                         ELSE 0 END) AS DOUBLE)
               / CAST(SUM(n_tokens) AS DOUBLE) AS truncated_share
    FROM lens, cands c
    GROUP BY c.ctx
    """,
    tags=("K65", "K20", "K63", "D10"),
)
def k65_context_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length fit census — the `max_seq_len` decision input: for
    each candidate context budget, how many documents fit whole and what
    fraction of the corpus's TOKEN MASS a hard truncation at that budget
    would discard. Doc-count percentiles (K56) understate the damage
    because long documents carry disproportionate tokens; this report
    weights by tokens, which is what the training loss actually sees.
    K20's packer and K10's chunker are the mitigations once a budget is
    chosen — this is the report that chooses it.

    Exact: token counts are integers, the candidate fan-out is a literal
    table (B19 idiom), the share is one exact-integer division per row.

    Scale: one corpus pass computes lengths; the |candidates|-way
    fan-out multiplies the tiny length relation, not the text; aggregate
    is map-side partial. Adding a candidate budget edits the literal.
    """
    d = table(spark, sf_dir, "documents")
    lens = d.select(
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens")
    )
    cands = spark.createDataFrame(
        [(c,) for c in K65_LENGTHS], "ctx int"
    )
    trunc = F.when(
        F.col("n_tokens") > F.col("ctx"), F.col("n_tokens") - F.col("ctx")
    ).otherwise(F.lit(0))
    return (
        lens.crossJoin(F.broadcast(cands))
        .groupBy("ctx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("n_tokens") <= F.col("ctx"), 1)).alias(
                "n_fit"
            ),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(trunc).alias("truncated_tokens"),
            (
                F.sum(trunc).cast("double")
                / F.sum("n_tokens").cast("double")
            ).alias("truncated_share"),
        )
    )
