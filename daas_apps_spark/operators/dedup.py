"""K1-K3: document deduplication — exact, minhash/LSH, simhash.

Generalizes R5 (DuplicateMarker.java:21-53, dedup-keep-best by rank) from
"same genomic position" to content-defined duplicate keys, and adds the
near-duplicate family a 100 TB LLM-data pipeline needs.

Determinism discipline (SURVEY.md §7): every hash is a pure function of
content — md5-derived integers, never partition-dependent and never
`rand()`. Minhash uses the standard universal-hashing construction: ONE
base hash per shingle (first 7 md5 hex chars → 28-bit int, identical in
Spark `conv(...,16,10)` and DuckDB `('0x'||...)::BIGINT`), then N_PERM
affine permutations `(a_i*h + b_i) mod P` with fixed constants — 12×
fewer digest computations than hashing per-permutation, same Jaccard
estimator. All arithmetic stays below 2^59, so BIGINT never overflows in
either engine.

Scale notes:
- Exact dedup: hash-partition shuffle on the 16-byte digest; at 100 TB use
  sha256 (collision-safe) and write survivors partitioned by digest prefix.
- MinHash/LSH: signatures are a narrow projection (doc_id + k×16 bytes);
  the band self-join shuffles only band keys, and candidate verification
  touches only colliding pairs — never the O(n²) cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.registry import register

N_PERM = 12  # minhash permutations
BAND_SIZE = 2  # signatures per LSH band → 6 bands
N_BANDS = N_PERM // BAND_SIZE
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 16

MINHASH_P = 2147483647  # 2^31 - 1 (prime)
# Fixed affine-permutation constants (a_i, b_i), i = 0..N_PERM-1.
MINHASH_AB = [
    ((1000003 * i + 12345) % MINHASH_P, (786433 * i + 290797) % MINHASH_P)
    for i in range(N_PERM)
]


def tokens_col(text_col: str = "text"):
    """Lowercased whitespace tokens (shared by dedup + text analysis)."""
    return F.split(F.lower(F.col(text_col)), " ")


def shingles_col(toks):
    """Distinct 3-token shingles of a token array (R5's dup-key analog)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
        )
    )


_DUCK_SHINGLES = """
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS tokens FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(tokens) - 2),
                             i -> array_to_string(tokens[i+1:i+3], ' '))) AS shingles
        FROM toks WHERE len(tokens) >= 3
    )
"""


def base_hash_spark():
    """28-bit base hash per shingle: one md5 per shingle, computed once."""
    return F.expr(
        "transform(shingles, s -> cast(conv(substring(md5(s), 1, 7), 16, 10) as bigint))"
    ).alias("hs")


_DUCK_BASE_HASH = (
    "list_transform(shingles, s -> ('0x' || substring(md5(s), 1, 7))::BIGINT) AS hs"
)


def _minhash_sig_spark(i: int):
    a, b = MINHASH_AB[i]
    return F.expr(
        f"array_min(transform(hs, x -> ({a} * x + {b}) % {MINHASH_P}))"
    ).alias(f"sig_{i}")


def minhash_sig_cols() -> list:
    """All N_PERM signature columns from ONE fold over the base hashes.

    Higher-order functions evaluate interpreted, so 12 separate
    ``array_min(transform(...))`` passes re-walk the hash array 12 times;
    a single ``aggregate`` fold carries a 12-slot minima accumulator and
    walks it once (measured 15% on k2 at sf0.1). Values are identical to
    the per-permutation form — same affine arithmetic, same minima — so
    the DuckDB oracle (12 list_min expressions) is unchanged.
    """
    init = "array(" + ", ".join([f"{MINHASH_P}L"] * N_PERM) + ")"
    upd = "array(" + ", ".join(
        f"least(acc[{i}], ({MINHASH_AB[i][0]} * x + {MINHASH_AB[i][1]})"
        f" % {MINHASH_P})"
        for i in range(N_PERM)
    ) + ")"
    sig = F.expr(f"aggregate(hs, {init}, (acc, x) -> {upd})")
    return [sig[i].alias(f"sig_{i}") for i in range(N_PERM)]


def _minhash_sig_duck(i: int) -> str:
    a, b = MINHASH_AB[i]
    return (
        f"list_min(list_transform(hs, x -> ({a} * x + {b}) % {MINHASH_P})) AS sig_{i}"
    )


@register(
    "k1_exact_dedup",
    oracle="""
    SELECT doc_id, content_hash, CAST(n_copies AS BIGINT) AS n_copies
    FROM (
        SELECT doc_id, sha256(text) AS content_hash,
               ROW_NUMBER() OVER (PARTITION BY sha256(text) ORDER BY doc_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY sha256(text)) AS n_copies
        FROM documents
    ) WHERE rn = 1
    """,
    tags=("K1", "E1"),
    bench=True,
)
def k1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: sha256 content hash, keep lowest doc_id per hash (R5)."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("content_hash").orderBy(F.col("doc_id").asc())
    return (
        d.withColumn("content_hash", F.sha2("text", 256))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(Window.partitionBy("content_hash")))
        .filter(F.col("rn") == 1)
        .select("doc_id", "content_hash", F.col("n_copies").cast("long"))
    )


@register(
    "k2_minhash_signatures",
    oracle=_DUCK_SHINGLES
    + f", hsh AS (SELECT doc_id, {_DUCK_BASE_HASH} FROM sh)\n"
    + "SELECT doc_id, "
    + ", ".join(_minhash_sig_duck(i) for i in range(N_PERM))
    + " FROM hsh",
    tags=("K2",),
    bench=True,
)
def k2_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded minhash signatures over 3-token shingles (pure content fn)."""
    d = table(spark, sf_dir, "documents")
    toks = tokens_col()
    return (
        d.withColumn("tokens", toks)
        .filter(F.size("tokens") >= 3)
        .withColumn("shingles", shingles_col(F.col("tokens")))
        .select("doc_id", base_hash_spark())
        .select("doc_id", *minhash_sig_cols())
    )


def _band_key_spark(b: int):
    parts = [F.col(f"sig_{i}").cast("string") for i in range(b * BAND_SIZE, (b + 1) * BAND_SIZE)]
    return F.concat_ws("|", *parts).alias("band_key")


def band_candidate_pairs(sigs: DataFrame, band_cap: int | None = None) -> DataFrame:
    """Distinct LSH candidate pairs ``(doc_a, doc_b)``, doc_a < doc_b,
    from a signature frame — shared by the K3 family and K31.

    Per-band doc sets via ONE groupBy, then MAP-SIDE pair generation
    from the sorted array — the _backbone_edges shape. This replaces
    the band-key SELF-JOIN (two shuffles of the band relation + the
    join) and, with ``band_cap``, the separate band-frequency
    aggregate + semi-join (the row count rides the same groupBy).
    The pair set is identical: docs sharing a band key, doc_a < doc_b
    pinned by sort_array; a band's pairs were colocated on one task
    under the hash join too, so skew is no worse, and the capped form
    bounds every group at cap² pairs before the explode.
    """
    bands = sigs.select(
        "doc_id",
        F.explode(F.array(*[_band_key_spark(b) for b in range(N_BANDS)])).alias(
            "band_key"
        ),
    )
    per_band = bands.groupBy("band_key").agg(
        F.sort_array(F.collect_set("doc_id")).alias("docs"),
        F.count(F.lit(1)).alias("band_n"),
    )
    if band_cap is not None:
        # row count (not distinct docs) — the oracle's HAVING COUNT(*)
        per_band = per_band.filter(F.col("band_n") <= band_cap)
    return (
        per_band.select(
            F.explode(
                F.expr(
                    "flatten(transform(docs, (x, i) -> transform("
                    "slice(docs, i + 2, size(docs)), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("e")
        )
        .select(F.col("e.doc_a").alias("doc_a"), F.col("e.doc_b").alias("doc_b"))
        .distinct()
    )


_DUCK_BANDS = ", ".join(
    "("
    + " || '|' || ".join(
        f"sig_{i}::VARCHAR" for i in range(b * BAND_SIZE, (b + 1) * BAND_SIZE)
    )
    + ")"
    for b in range(N_BANDS)
)


@register(
    "k3_lsh_near_dedup",
    oracle=_DUCK_SHINGLES
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
        FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                 / len(list_distinct(sa.shingles || sb.shingles)), 4) AS jaccard
    FROM cands c
    JOIN sh sa ON c.doc_a = sa.doc_id
    JOIN sh sb ON c.doc_b = sb.doc_id
    WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
          / len(list_distinct(sa.shingles || sb.shingles)) >= {JACCARD_THRESHOLD}
    """,
    tags=("K3", "K2"),
    bench=True,
)
def k3_lsh_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dedup: minhash → LSH banding → candidate join → Jaccard verify.

    The self-join is on band keys only (6 narrow shuffles of doc_id+key);
    exact Jaccard runs solely on colliding candidates, so the O(n²)
    comparison never materializes — the property that makes this the scale
    path at 100 TB.

    ``localCheckpoint`` materializes the multiply-consumed shingle
    relation: Spark has no cross-branch common-subexpression reuse, so
    without it the tokenize→shingle stage (the CPU-heaviest step — HOFs run
    interpreted per element) executes THREE times (the signature build +
    both candidate-verify joins). Checkpointed, it runs once per query
    execution — repaid every run, no cross-run caching. At 100 TB use a
    checkpoint dir (survives executor loss); the stored shingle relation is
    ~2× corpus size, the standard space-for-CPU trade of every LSH build.
    Candidate pairs come from per-band doc sets (one groupBy) with
    map-side pair generation, not a band-key self-join — the band
    relation is shuffled once and consumed once.

    Hot bands (boilerplate that hashes thousands of docs into one band)
    are the skew risk: ``band_cap`` is the declared escape valve — drop
    band keys with more than cap colliding docs BEFORE the self-join
    (a band that degenerate carries no near-dup signal, only quadratic
    cost; the standard band-frequency cap). None (the oracle-checked
    default) is exact; ``test_k3_band_cap_*`` pins that a cap at/above
    the max band frequency is a no-op and that capping only shrinks the
    candidate set.
    """
    return _k3_impl(spark, sf_dir, band_cap=None)


K3_BAND_CAP = 4


@register(
    "k3_lsh_capped",
    oracle=_DUCK_SHINGLES
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
    cool AS (
        SELECT band_key FROM bands
        GROUP BY band_key HAVING COUNT(*) <= {K3_BAND_CAP}
    ),
    bands2 AS (
        SELECT bands.doc_id, bands.band_key
        FROM bands JOIN cool USING (band_key)
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands2 a JOIN bands2 b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                 / len(list_distinct(sa.shingles || sb.shingles)), 4) AS jaccard
    FROM cands c
    JOIN sh sa ON c.doc_a = sa.doc_id
    JOIN sh sb ON c.doc_b = sb.doc_id
    WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
          / len(list_distinct(sa.shingles || sb.shingles)) >= {JACCARD_THRESHOLD}
    """,
    tags=("K3", "K2"),
    bench=True,
)
def k3_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k3_lsh_near_dedup with the ``band_cap`` escape valve ON — the form
    you'd actually run at 100 TB, registered first-class so the oracle
    checks the capped plan, not just the exact one.

    A hot band (boilerplate hashing thousands of docs into one key) costs
    O(n²) candidate pairs while carrying no near-dup signal; dropping
    band keys with more than K3_BAND_CAP colliding docs BEFORE the
    self-join bounds every band's contribution at cap² pairs — the
    standard band-frequency cap. Pairs may still surface through any of
    their other 5 bands, so only documents degenerate in EVERY band lose
    candidates. The DuckDB oracle mirrors the cap with the same HAVING
    filter on the band-frequency CTE, so the capped result is
    hash-matchable — "the form you run at scale is the form the oracle
    checks"."""
    return _k3_impl(spark, sf_dir, band_cap=K3_BAND_CAP)


def _k3_impl(
    spark: SparkSession, sf_dir: str, band_cap: int | None
) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    sh = (
        d.withColumn("tokens", tokens_col())
        .filter(F.size("tokens") >= 3)
        .withColumn("shingles", shingles_col(F.col("tokens")))
        .select("doc_id", "shingles")
        .localCheckpoint()
    )
    sigs = sh.select("doc_id", base_hash_spark()).select(
        "doc_id", *minhash_sig_cols()
    )
    cands = band_candidate_pairs(sigs, band_cap=band_cap)
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


NGRAM_N = 8  # character n-gram width
ANCHOR_MOD = 8  # keep ~1/8 of grams as inverted-index anchors
ANCHOR_MAX_DF = 20  # drop anchors appearing in more docs (hot-key cap)
NGRAM_JACCARD_THRESHOLD = 0.35


@register(
    "k3_ngram_jaccard",
    oracle=f"""
    WITH grams AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(length(lower(text)) - {NGRAM_N - 1}),
                   i -> substring(lower(text), i + 1, {NGRAM_N}))) AS gs
        FROM documents WHERE length(text) >= {NGRAM_N}
    ),
    anchors AS (
        SELECT doc_id, g FROM (SELECT doc_id, unnest(gs) AS g FROM grams)
        WHERE ('0x' || substring(md5(g), 1, 7))::BIGINT % {ANCHOR_MOD} = 0
    ),
    rare AS (
        SELECT g FROM anchors GROUP BY g HAVING COUNT(*) <= {ANCHOR_MAX_DF}
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM anchors a JOIN rare r ON a.g = r.g
        JOIN anchors b ON a.g = b.g AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(len(list_intersect(ga.gs, gb.gs))::DOUBLE
                 / len(list_distinct(ga.gs || gb.gs)), 4) AS jaccard
    FROM cands c
    JOIN grams ga ON c.doc_a = ga.doc_id
    JOIN grams gb ON c.doc_b = gb.doc_id
    WHERE len(list_intersect(ga.gs, gb.gs))::DOUBLE
          / len(list_distinct(ga.gs || gb.gs)) >= {NGRAM_JACCARD_THRESHOLD}
    """,
    tags=("K2", "K3"),
)
def k3_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup by character 8-gram Jaccard with an inverted-index probe.

    Candidate generation: each doc contributes a deterministic ~1/8 sample
    of its grams as anchors (md5-derived int mod 8 == 0 — a pure content
    function, like minhash); docs sharing an anchor are candidates. Anchors
    seen in more than ANCHOR_MAX_DF docs are dropped before the self-join —
    the hot-key cap from SCALING.md §6: boilerplate grams would otherwise
    create quadratic candidate blowup, and a gram that common cannot signal
    near-duplication anyway. Exact Jaccard runs only on candidates.

    ``localCheckpoint`` materializes the two multiply-consumed
    intermediates, same rationale as k3_lsh_near_dedup: grams feeds both
    verify sides and the anchor derivation, anchors feeds both self-join
    sides and the df-cap — uncheckpointed, the interpreted gram transform
    + per-gram md5 re-ran once per consumer (measured: candidate
    generation 24s → 1.5s at sf0.1).
    """
    d = table(spark, sf_dir, "documents")
    # `lt` is materialized BEFORE the gram transform: the higher-order
    # lambda evaluates interpreted, so an inline `substring(lower(text), i,
    # n)` re-lowercases the whole document per element — O(len²) per doc
    # (measured 11.7s → 9.5s end-to-end at sf0.1; the remaining cost is the
    # gram materialization itself, which DuckDB's identical oracle spends
    # 29s on — Spark is 3× ahead on this query).
    grams = (
        d.filter(F.length("text") >= NGRAM_N)
        .select("doc_id", F.lower("text").alias("lt"))
        .select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, length(lt) - {NGRAM_N - 1}),"
                    f" i -> substring(lt, i, {NGRAM_N}))"
                )
            ).alias("gs"),
        )
        .localCheckpoint()
    )
    anchors = grams.select("doc_id", F.explode("gs").alias("g")).filter(
        F.expr(f"cast(conv(substring(md5(g), 1, 7), 16, 10) as bigint) % {ANCHOR_MOD} = 0")
    ).localCheckpoint()
    rare = anchors.groupBy("g").count().filter(F.col("count") <= ANCHOR_MAX_DF).select("g")
    pruned = anchors.join(rare, "g")
    a = pruned.select(F.col("g"), F.col("doc_id").alias("doc_a"))
    b = anchors.select(F.col("g"), F.col("doc_id").alias("doc_b"))
    cands = (
        a.join(b, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("gs").alias("gs_a"))
    gb = grams.select(F.col("doc_id").alias("doc_b"), F.col("gs").alias("gs_b"))
    jac = F.size(F.array_intersect("gs_a", "gs_b")).cast("double") / F.size(
        F.array_union("gs_a", "gs_b")
    )
    return (
        cands.join(ga, "doc_a")
        .join(gb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= NGRAM_JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def _simhash_exprs(dialect: str) -> list[str]:
    """Per-bit vote expressions, generated once for both dialects.

    bit j lives in hex nibble k=j//4 (md5 chars 1-4), sub-bit m=j%4.
    Vote = Σ over tokens of ±1; simhash bit = vote > 0 (tie → 0).
    """
    intdiv = "//" if dialect == "duck" else "div"
    votes = []
    for j in range(SIMHASH_BITS):
        k, m = divmod(j, 4)
        nib = f"(instr('0123456789abcdef', substring(md5(t), {k + 1}, 1)) - 1)"
        bit = f"(({nib} {intdiv} {2 ** m}) % 2)"
        pm = f"(2 * {bit} - 1)"
        if dialect == "duck":
            votes.append(f"list_sum(list_transform(tokens, t -> {pm}))")
        else:
            # init must be BIGINT: Spark's `div` yields BIGINT and aggregate()
            # requires the accumulator type to match the merge result exactly.
            votes.append(f"aggregate(tokens, CAST(0 AS BIGINT), (acc, t) -> acc + {pm})")
    return votes


@register(
    "k2_simhash",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS tokens
        FROM documents
    )
    SELECT doc_id, """
    + " || ".join(
        f"(CASE WHEN ({v}) > 0 THEN '1' ELSE '0' END)"
        for v in reversed(_simhash_exprs("duck"))
    )
    + " AS simhash FROM toks",
    tags=("K2",),
)
def k2_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over distinct tokens, emitted as a bit-string.

    Bit votes are computed with Catalyst higher-order functions (aggregate
    over the token array) — no Python UDF, so the whole signature stays in
    whole-stage codegen.
    """
    d = table(spark, sf_dir, "documents")
    bit_cases = " , ".join(
        f"CASE WHEN ({v}) > 0 THEN '1' ELSE '0' END"
        for v in reversed(_simhash_exprs("spark"))
    )
    return (
        d.withColumn("tokens", F.array_distinct(tokens_col()))
        .select("doc_id", F.expr(f"concat({bit_cases})").alias("simhash"))
    )


# Fixed round count for connected-components label propagation. Each round
# combines neighbor-min with pointer jumping (lbl ← lbl[lbl]), so reachable
# label distance grows exponentially: 6 rounds cover component diameters
# into the hundreds — far beyond any near-dup cluster (their diameter is
# small by construction: every member shares bands with a hub). Convergence
# is VERIFIED after the loop in one job (see k3_dedup_clusters) — never
# assumed — and non-convergence raises rather than returning wrong labels.
CC_ROUNDS = 6


@register(
    "k3_dedup_clusters",
    # WITH RECURSIVE must head the whole CTE chain for the reach() closure
    oracle=_DUCK_SHINGLES.replace("WITH toks", "WITH RECURSIVE toks", 1)
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
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    verified AS (
        SELECT c.doc_a, c.doc_b FROM pairs c
        JOIN sh sa ON c.doc_a = sa.doc_id
        JOIN sh sb ON c.doc_b = sb.doc_id
        WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
              / len(list_distinct(sa.shingles || sb.shingles)) >= {JACCARD_THRESHOLD}
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM verified
        UNION ALL SELECT doc_b, doc_a FROM verified
    ),
    members AS (SELECT DISTINCT src AS doc_id FROM edges),
    reach(node, lbl) AS (
        SELECT doc_id, doc_id FROM members
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    clusters AS (
        SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
    )
    SELECT doc_id, cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
    FROM clusters
    """,
    tags=("K3", "K2", "K1"),
)
def k3_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignment over verified near-dup pairs (connected components).

    Pairs alone don't dedupe a corpus — survivors come from *clusters*
    (keep min doc_id per component, drop the rest). Components are computed
    by min-label propagation WITH POINTER JUMPING: every member starts
    labeled with its own id; each round takes the min over (own label,
    neighbors' labels, label-of-own-label). The jumping term doubles the
    label-propagation distance per round, so ``CC_ROUNDS`` fixed rounds
    cover exponentially-deep components — and, unlike a convergence test
    per round, the driver never blocks on a ``count()`` inside the loop
    (one scheduling round-trip per iteration saved; the loop is pure job
    submission). Convergence is then VERIFIED in a single final job — every
    edge must connect same-labeled nodes — and failure raises instead of
    silently returning partial clusters. All steps are joins/aggregations
    (order- and partition-independent), so the result is deterministic and
    matches DuckDB's recursive transitive closure. ``localCheckpoint``
    truncates lineage each round — the standard Spark pattern for iterative
    algorithms (at 100 TB use a checkpoint dir or GraphFrames).
    """
    pairs = k3_lsh_near_dedup(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).toDF("src", "dst").localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(CC_ROUNDS):
        nmin = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        jump = (
            labels.alias("a")
            .join(labels.alias("b"), F.col("a.lbl") == F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_id"), F.col("b.lbl").alias("jlbl"))
        )
        labels = (
            labels.join(nmin, "doc_id", "left")
            .join(jump, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("lbl"),
                    F.coalesce("nlbl", "lbl"),
                    F.coalesce("jlbl", "lbl"),
                ).alias("lbl"),
            )
            .localCheckpoint()
        )
    # Single post-loop verification job (the only driver-side count):
    # converged ⇔ no edge crosses two labels.
    crossing = (
        edges.join(labels.toDF("doc_id", "src_lbl"), edges.src == F.col("doc_id"))
        .drop("doc_id")
        .join(labels.toDF("doc_id", "dst_lbl"), edges.dst == F.col("doc_id"))
        .filter(F.col("src_lbl") != F.col("dst_lbl"))
        .limit(1)
        .count()
    )
    if crossing:
        raise RuntimeError(
            f"k3_dedup_clusters: label propagation not converged after "
            f"{CC_ROUNDS} pointer-jumping rounds — component diameter "
            "exceeds design bounds; raise CC_ROUNDS (log2(diameter) rounds "
            "suffice) or use a dedicated CC implementation"
        )
    w = Window.partitionBy("cluster_id")
    return (
        labels.select("doc_id", F.col("lbl").alias("cluster_id"))
        .withColumn("cluster_size", F.count(F.lit(1)).over(w).cast("long"))
    )


@register(
    "k17_incremental_dedup",
    oracle="""
    WITH existing AS (
        SELECT DISTINCT sha256(text) AS digest
        FROM documents WHERE doc_id % 10 <> 0
    ),
    batch AS (
        SELECT doc_id, lang, sha256(text) AS digest,
               ROW_NUMBER() OVER (PARTITION BY sha256(text)
                                  ORDER BY doc_id ASC) AS rn
        FROM documents WHERE doc_id % 10 = 0
    )
    SELECT b.doc_id, b.lang, b.digest
    FROM batch b
    WHERE b.rn = 1
      AND NOT EXISTS (SELECT 1 FROM existing e WHERE e.digest = b.digest)
    """,
    tags=("K17", "K1", "C4"),
)
def k17_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: a new document batch is deduped within
    itself (keep-first window, the K1 shape) and then anti-joined against
    the EXISTING corpus's digest index — only genuinely new content
    survives.

    This is how a continuously-growing corpus stays deduplicated without
    ever re-hashing history: the existing side is a narrow (digest) column
    — at 100 TB a pre-built, bucketed-by-digest index table, so the
    anti-join co-partitions without shuffling the index; the batch side
    (orders of magnitude smaller than the corpus) shuffles once on digest
    for both the window and the join, and Catalyst shares that exchange.
    The demo splits the fixture by doc_id % 10 into 90% "existing" / 10%
    "arriving batch".
    """
    d = table(spark, sf_dir, "documents")
    existing = (
        d.filter(F.col("doc_id") % 10 != 0)
        .select(F.sha2("text", 256).alias("digest"))
        .distinct()
    )
    w = Window.partitionBy("digest").orderBy(F.col("doc_id").asc())
    batch = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "lang", F.sha2("text", 256).alias("digest"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return batch.join(existing, "digest", "left_anti").select(
        "doc_id", "lang", "digest"
    )


@register(
    "k68_incremental_ingest_cdc",
    oracle="""
    WITH arriving AS (
        SELECT doc_id, lang, sha256(text) AS digest,
               ROW_NUMBER() OVER (PARTITION BY sha256(text)
                                  ORDER BY doc_id ASC) AS rn
        FROM documents WHERE doc_id % 3 = 0
    ),
    corpus AS (
        SELECT DISTINCT sha256(text) AS digest
        FROM documents WHERE doc_id % 3 <> 0
    )
    SELECT a.lang,
           CAST(COUNT(*) AS BIGINT) AS n_arrived,
           CAST(SUM(CASE WHEN a.rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_in_batch,
           CAST(SUM(CASE WHEN a.rn = 1 AND c.digest IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_vs_corpus,
           CAST(SUM(CASE WHEN a.rn = 1 AND c.digest IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted
    FROM arriving a LEFT JOIN corpus c ON c.digest = a.digest
    GROUP BY a.lang
    """,
    tags=("K68", "K17", "A25", "K1"),
)
def k68_incremental_ingest_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus ingestion driven by the versioned table's change
    feed: the corpus lives in a VersionedTable (sources/table_format.py),
    a new document batch arrives as an append commit, and the DELTA to
    dedup is read off ``changes_between`` — the manifest fast path, so
    the dedup pass scans ONLY the new batch's files no matter how large
    the corpus has grown. The feed is deduped within itself (keep-first,
    K1) and screened against the prior snapshot's digest index (K17's
    anti-join), and the outcome is censused per language: arrived,
    batch-internal dups, corpus dups, accepted.

    This is the K17 operator upgraded with real ingest plumbing: K17
    *simulates* the existing/arriving split with a modulus filter over
    one table; here the split IS the commit history, the arriving set is
    discovered from the log (not assumed), and a replayed ingest batch
    would be invisible (same version range → same feed). At 100 TB the
    digest index is the bucketed-by-digest table SCALING.md describes;
    the feed side stays batch-sized forever.
    """
    from daas_apps_spark.sources.io import scratch_dir
    from daas_apps_spark.sources.table_format import VersionedTable

    d = table(spark, sf_dir, "documents")
    vt = VersionedTable(spark, scratch_dir("k68_corpus"))
    vt.append(d.filter(F.col("doc_id") % 3 != 0))  # the standing corpus
    vt.append(d.filter(F.col("doc_id") % 3 == 0))  # the arriving batch
    feed = vt.changes_between(1, 2).drop("_change_type")
    corpus_digests = (
        vt.read(version=1)
        .select(F.sha2("text", 256).alias("digest"))
        .distinct()
    )
    w = Window.partitionBy("digest").orderBy(F.col("doc_id").asc())
    arriving = (
        feed.select("doc_id", "lang", F.sha2("text", 256).alias("digest"))
        .withColumn("rn", F.row_number().over(w))
    )
    screened = arriving.join(
        corpus_digests.withColumn("in_corpus", F.lit(1)), "digest", "left"
    )
    return screened.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_arrived"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_dup_in_batch"),
        F.sum(
            F.when((F.col("rn") == 1) & F.col("in_corpus").isNotNull(), 1)
            .otherwise(0)
        ).alias("n_dup_vs_corpus"),
        F.sum(
            F.when((F.col("rn") == 1) & F.col("in_corpus").isNull(), 1)
            .otherwise(0)
        ).alias("n_accepted"),
    )


FUZZY_LEV_MAX = 3  # max edit distance for a candidate name match


@register(
    "c17_fuzzy_name_match",
    oracle=f"""
    WITH names AS (
        SELECT p_name, split_part(p_name, ' ', 2) AS noun,
               CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS distance,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b
      ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_LEV_MAX}
    """,
    tags=("C17", "K3", "C7"),
)
def c17_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join (entity resolution): part names within Levenshtein
    distance {FUZZY_LEV_MAX}, blocked by the name's noun token.

    The scale-critical move happens BEFORE any pairing: the fact table is
    collapsed to its distinct name vocabulary (name -> part count) first, so
    the quadratic fuzzy comparison runs on |vocab|² within a block — never
    on row pairs. That is the canonical entity-resolution shape at 100 TB:
    dedupe to a vocabulary, block it (here: shared noun; in production a
    phonetic key / q-gram prefix), compare within blocks only, and broadcast
    the small match table back onto the facts if row-level links are needed.
    The blocked join is an equi-join on the block key (hash-joinable), with
    the edit-distance predicate applied as a post-join filter; `a < b`
    halves the pair space and keeps the output canonical.

    Reference analogy: the block key plays the role of the reference's
    per-contig keying (SparkCaller.java:245-248) — equality on a cheap
    partition key bounds the expensive within-group work.
    """
    p = table(spark, sf_dir, "part")
    names = (
        p.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("noun", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)))
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("noun").alias("noun_a"),
        F.col("n_parts").alias("n_parts_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("noun").alias("noun_b"),
        F.col("n_parts").alias("n_parts_b"),
    )
    return (
        a.join(
            b,
            (F.col("noun_a") == F.col("noun_b"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= FUZZY_LEV_MAX)
        .select("name_a", "name_b", "distance", "n_parts_a", "n_parts_b")
    )


@register(
    "k31_minhash_estimator_audit",
    oracle=_DUCK_SHINGLES
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
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    est AS (
        SELECT p.doc_a, p.doc_b,
               ({' + '.join(
                   f'(CASE WHEN sa.sig_{i} = sb.sig_{i} THEN 1 ELSE 0 END)'
                   for i in range(N_PERM)
               )}) / {N_PERM}.0 AS est
        FROM pairs p
        JOIN sigs sa ON sa.doc_id = p.doc_a
        JOIN sigs sb ON sb.doc_id = p.doc_b
    )
    SELECT e.doc_a, e.doc_b,
           ROUND(e.est, 4) AS est_jaccard,
           ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                 / len(list_distinct(sa.shingles || sb.shingles)), 4)
               AS exact_jaccard,
           ROUND(ABS(e.est
                     - len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                       / len(list_distinct(sa.shingles || sb.shingles))), 4)
               AS abs_error
    FROM est e
    JOIN sh sa ON sa.doc_id = e.doc_a
    JOIN sh sb ON sb.doc_id = e.doc_b
    """,
    tags=("K31", "K2", "K3"),
)
def k31_minhash_estimator_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-quality audit for the minhash family: on every LSH
    candidate pair, the signature-agreement Jaccard estimate
    (matching slots / {N_PERM}) next to the exact shingle Jaccard and the
    absolute error — "measure, don't guess" applied to the engine's own
    sketch. The audit is how a production pipeline tunes N_PERM/band
    shape before trusting the sketch at 100 TB: run it on a sampled
    slice, check the error distribution, then dedup the corpus.

    Same scale shape as K3: candidates come only from band collisions
    (never O(n²)), signatures and shingles join back by doc_id, and both
    the estimate (an exact rational k/{N_PERM}) and the exact Jaccard
    (int/int) are deterministic — ROUND only serializes them.
    """
    d = table(spark, sf_dir, "documents")
    sh = (
        d.withColumn("tokens", tokens_col())
        .filter(F.size("tokens") >= 3)
        .withColumn("shingles", shingles_col(F.col("tokens")))
        .select("doc_id", "shingles")
        .localCheckpoint()
    )
    sigs = (
        sh.select("doc_id", base_hash_spark())
        .select("doc_id", *minhash_sig_cols())
        .localCheckpoint()
    )
    pairs = band_candidate_pairs(sigs)
    sig_a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"sig_{i}").alias(f"sa_{i}") for i in range(N_PERM)],
    )
    sig_b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"sig_{i}").alias(f"sb_{i}") for i in range(N_PERM)],
    )
    matches = None
    for i in range(N_PERM):
        ind = F.when(F.col(f"sa_{i}") == F.col(f"sb_{i}"), 1).otherwise(0)
        matches = ind if matches is None else matches + ind
    est = matches / float(N_PERM)
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    exact = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        pairs.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .withColumn("est", est)
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round("est", 4).alias("est_jaccard"),
            F.round(exact, 4).alias("exact_jaccard"),
            F.round(F.abs(F.col("est") - exact), 4).alias("abs_error"),
        )
    )


def _k43_oracle() -> str:
    from daas_apps_spark.registry import REGISTRY

    clusters_sql = REGISTRY["k3_dedup_clusters"].oracle
    return f"""
    WITH members AS (
        SELECT c.cluster_id, c.doc_id, d.n_chars,
               len(list_distinct(string_split(lower(d.text), ' '))) AS richness
        FROM ({clusters_sql}) c JOIN documents d ON d.doc_id = c.doc_id
    ),
    ranked AS (
        SELECT cluster_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                                  ORDER BY doc_id ASC) AS rn_first,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                                  ORDER BY n_chars DESC, doc_id ASC) AS rn_long,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                                  ORDER BY richness DESC, doc_id ASC) AS rn_rich
        FROM members
    )
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS cluster_size,
           MIN(CASE WHEN rn_first = 1 THEN doc_id END) AS keep_first,
           MIN(CASE WHEN rn_long = 1 THEN doc_id END) AS keep_longest,
           MIN(CASE WHEN rn_rich = 1 THEN doc_id END) AS keep_richest,
           (MIN(CASE WHEN rn_first = 1 THEN doc_id END)
            = MIN(CASE WHEN rn_long = 1 THEN doc_id END)
            AND MIN(CASE WHEN rn_first = 1 THEN doc_id END)
            = MIN(CASE WHEN rn_rich = 1 THEN doc_id END)) AS policies_agree
    FROM ranked
    GROUP BY cluster_id
    """


@register(
    "k43_survivor_policies",
    oracle=_k43_oracle(),
    tags=("K43", "K3", "K1", "E1"),
)
def k43_survivor_policies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup survivor-policy comparison: for every near-dup cluster (K3
    connected components), the document each of three policies would
    keep — first-by-id (the reproducible default), longest (keep the
    superset text), richest vocabulary (keep the least-templated
    member) — and whether they agree. Disagreement rate is the number a
    curation review actually wants before committing to a policy: when
    policies diverge, the cluster contains asymmetric near-dups
    (containment, boilerplate variants), exactly the cases K42
    localizes.

    One membership join + three rank windows over the same cluster
    partitioning (one shuffle), collapsed per cluster. Scale follows K3:
    cluster count ≪ corpus, members join by doc_id.
    """
    clusters = k3_dedup_clusters(spark, sf_dir).select("cluster_id", "doc_id")
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(F.array_distinct(tokens_col())).alias("richness"),
    )
    m = clusters.join(d, "doc_id")
    w_first = Window.partitionBy("cluster_id").orderBy(F.col("doc_id").asc())
    w_long = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    w_rich = Window.partitionBy("cluster_id").orderBy(
        F.col("richness").desc(), F.col("doc_id").asc()
    )
    ranked = (
        m.withColumn("rn_first", F.row_number().over(w_first))
        .withColumn("rn_long", F.row_number().over(w_long))
        .withColumn("rn_rich", F.row_number().over(w_rich))
    )
    first = F.min(F.when(F.col("rn_first") == 1, F.col("doc_id")))
    longest = F.min(F.when(F.col("rn_long") == 1, F.col("doc_id")))
    richest = F.min(F.when(F.col("rn_rich") == 1, F.col("doc_id")))
    return ranked.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        first.alias("keep_first"),
        longest.alias("keep_longest"),
        richest.alias("keep_richest"),
        ((first == longest) & (first == richest)).alias("policies_agree"),
    )


def _k47_oracle() -> str:
    from daas_apps_spark.registry import REGISTRY

    clusters_sql = REGISTRY["k3_dedup_clusters"].oracle

    def duck_h(x: str) -> str:
        return f"('0x' || substring(md5(CAST({x} AS VARCHAR)), 1, 7))::BIGINT"

    return f"""
    WITH assigned AS (
        SELECT d.doc_id, c.cluster_id,
               CASE WHEN {duck_h('d.doc_id')} % 100 < 90
                    THEN 'train' ELSE 'test' END AS split_naive,
               CASE WHEN {duck_h('COALESCE(c.cluster_id, d.doc_id)')} % 100 < 90
                    THEN 'train' ELSE 'test' END AS split_safe
        FROM documents d
        LEFT JOIN ({clusters_sql}) c ON c.doc_id = d.doc_id
    ),
    straddle AS (
        SELECT method, CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(COUNT(CASE WHEN nd > 1 THEN 1 END) AS BIGINT)
                   AS n_straddling
        FROM (
            SELECT 'doc_hash' AS method, cluster_id,
                   COUNT(DISTINCT split_naive) AS nd
            FROM assigned WHERE cluster_id IS NOT NULL GROUP BY cluster_id
            UNION ALL
            SELECT 'cluster_hash', cluster_id,
                   COUNT(DISTINCT split_safe) AS nd
            FROM assigned WHERE cluster_id IS NOT NULL GROUP BY cluster_id
        ) t GROUP BY method
    ),
    counts AS (
        SELECT 'doc_hash' AS method,
               CAST(COUNT(CASE WHEN split_naive = 'train' THEN 1 END)
                    AS BIGINT) AS n_train,
               CAST(COUNT(CASE WHEN split_naive = 'test' THEN 1 END)
                    AS BIGINT) AS n_test
        FROM assigned
        UNION ALL
        SELECT 'cluster_hash',
               CAST(COUNT(CASE WHEN split_safe = 'train' THEN 1 END)
                    AS BIGINT),
               CAST(COUNT(CASE WHEN split_safe = 'test' THEN 1 END)
                    AS BIGINT)
        FROM assigned
    )
    SELECT c.method, c.n_train, c.n_test, s.n_clusters, s.n_straddling
    FROM counts c JOIN straddle s ON s.method = c.method
    """


@register(
    "k47_leakage_safe_split",
    oracle=_k47_oracle(),
    tags=("K47", "K9", "K3", "K12"),
)
def k47_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/test splitting: assign splits by NEAR-DUP
    CLUSTER, not by document, so no near-duplicate pair ever straddles
    train and test (the dedup-leakage failure mode measured by Dodge et
    al. 2021 / Lee et al. 2022 — eval contamination via near-dups of
    training docs).

    The split unit is ``coalesce(cluster_id, doc_id)`` — K3's connected-
    component label for clustered docs, the document itself for
    singletons — hashed through the K9 deterministic content-hash
    threshold. The report compares the naive doc-hash split against the
    cluster-hash split on two axes: train/test sizes (both ≈ 90/10) and
    the straddling-cluster census, where doc_hash shows real leakage and
    cluster_hash is structurally zero (every member inherits the same
    unit hash).

    Scale: cluster labels come from the K3 pipeline (LSH-bounded, never
    all-pairs); the label relation is tiny vs the corpus and joins by
    doc_id; split assignment is a per-row hash; the two census aggregates
    are one shuffle each over narrow columns. At 100 TB the assigned
    relation would be persisted once and both reports share the scan.
    """
    clusters = k3_dedup_clusters(spark, sf_dir).select("cluster_id", "doc_id")
    d = table(spark, sf_dir, "documents").select("doc_id")

    def spark_h(x: str) -> str:
        return (
            f"cast(conv(substring(md5(cast({x} as string)), 1, 7), 16, 10) "
            "as bigint)"
        )

    m = d.join(clusters, "doc_id", "left")
    assigned = m.select(
        "doc_id",
        "cluster_id",
        F.when(F.expr(f"{spark_h('doc_id')} % 100") < 90, "train")
        .otherwise("test")
        .alias("split_naive"),
        F.when(
            F.expr(f"{spark_h('coalesce(cluster_id, doc_id)')} % 100") < 90,
            "train",
        )
        .otherwise("test")
        .alias("split_safe"),
    )
    clustered = assigned.filter(F.col("cluster_id").isNotNull())
    per_cluster = (
        clustered.select(
            F.lit("doc_hash").alias("method"),
            "cluster_id",
            F.col("split_naive").alias("split"),
        )
        .unionAll(
            clustered.select(
                F.lit("cluster_hash"),
                "cluster_id",
                F.col("split_safe"),
            )
        )
        .groupBy("method", "cluster_id")
        .agg(F.countDistinct("split").alias("nd"))
    )
    straddle = per_cluster.groupBy("method").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.count(F.when(F.col("nd") > 1, 1)).alias("n_straddling"),
    )
    counts = assigned.agg(
        F.lit("doc_hash").alias("method"),
        F.count(F.when(F.col("split_naive") == "train", 1)).alias("n_train"),
        F.count(F.when(F.col("split_naive") == "test", 1)).alias("n_test"),
    ).unionAll(
        assigned.agg(
            F.lit("cluster_hash").alias("method"),
            F.count(F.when(F.col("split_safe") == "train", 1)).alias("n_train"),
            F.count(F.when(F.col("split_safe") == "test", 1)).alias("n_test"),
        )
    )
    return counts.join(straddle, "method").select(
        "method", "n_train", "n_test", "n_clusters", "n_straddling"
    )


def _k54_oracle() -> str:
    from daas_apps_spark.registry import REGISTRY

    pairs_sql = REGISTRY["k3_lsh_near_dedup"].oracle
    return f"""
    WITH pairs AS ({pairs_sql}),
    tagged AS (
        SELECT LEAST(da.source, db.source) AS src_lo,
               GREATEST(da.source, db.source) AS src_hi,
               (da.source <> db.source) AS cross_source
        FROM pairs p
        JOIN documents da ON da.doc_id = p.doc_a
        JOIN documents db ON db.doc_id = p.doc_b
    )
    SELECT src_lo, src_hi, cross_source,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM tagged GROUP BY src_lo, src_hi, cross_source
    """


@register(
    "k54_cross_source_dup_matrix",
    oracle=_k54_oracle(),
    tags=("K54", "K3", "C1", "D1"),
)
def k54_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: every verified near-dup pair (K3
    LSH candidates that clear the Jaccard bar) tagged with the ordered
    (source, source) pair it straddles — the provenance-overlap census a
    corpus curator reads before ingesting a new scrape ("how much of
    dump B is already in dump A"). Within-source pairs quantify internal
    redundancy; cross-source pairs drive ingest-ordering and survivor
    policy (keep the copy from the higher-trust source — K43's policy
    question at the source grain).

    One small join of the (already tiny) verified-pair relation against
    the doc→source projection on each endpoint, then a census over the
    |sources|² matrix. Scale follows K3: the pair relation is the
    LSH-bounded candidate set, never N²; the doc→source side prunes to
    two columns and shuffles by doc_id.
    """
    pairs = k3_lsh_near_dedup(spark, sf_dir).select("doc_a", "doc_b")
    src = table(spark, sf_dir, "documents").select("doc_id", "source")
    tagged = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")),
            "doc_b",
        )
        .select(
            F.least("sa", "sb").alias("src_lo"),
            F.greatest("sa", "sb").alias("src_hi"),
            (F.col("sa") != F.col("sb")).alias("cross_source"),
        )
    )
    return tagged.groupBy("src_lo", "src_hi", "cross_source").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


def _k66_oracle() -> str:
    from daas_apps_spark.registry import REGISTRY

    pairs_sql = REGISTRY["k3_lsh_near_dedup"].oracle
    return f"""
    WITH pairs AS ({pairs_sql}),
    und AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    wedges AS (
        SELECT x.u AS a, x.v AS b, y.v AS c
        FROM und x JOIN und y ON y.u = x.v AND x.u < y.v
    ),
    tagged AS (
        SELECT w.a, w.c,
               (p.doc_a IS NOT NULL) AS closed
        FROM wedges w
        LEFT JOIN pairs p ON p.doc_a = w.a AND p.doc_b = w.c
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_wedges,
           CAST(COUNT(CASE WHEN closed THEN 1 END) AS BIGINT)
               AS n_closed,
           CAST(COUNT(CASE WHEN NOT closed THEN 1 END) AS BIGINT)
               AS n_open,
           CAST(COUNT(CASE WHEN closed THEN 1 END) AS DOUBLE)
               / COUNT(*) AS transitivity
    FROM tagged
    """


@register(
    "k66_neardup_transitivity",
    oracle=_k66_oracle(),
    tags=("K66", "K3", "GR2", "K43"),
)
def k66_neardup_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup transitivity audit: over the verified K3 pair graph, how
    many two-hop wedges A~B~C are CLOSED by a verified A~C pair vs left
    open — the number that justifies (or indicts) clustering by
    connected components: high transitivity means CC clusters are tight
    near-dup families; low transitivity means chains of pairwise-similar
    documents whose ends differ, where keep-one-per-component (K43)
    over-deletes. The GR2 wedge-counting kernel applied to the dedup
    graph instead of the co-supply graph.

    Scale: the pair relation is LSH-bounded (never N²), so the wedge
    join is tiny; the closure probe is a left join on the ordered pair.
    """
    pairs = k3_lsh_near_dedup(spark, sf_dir).select("doc_a", "doc_b").localCheckpoint()
    und = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).union(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    x = und.select(F.col("u").alias("a"), F.col("v").alias("mid"))
    y = und.select(F.col("u").alias("mid"), F.col("v").alias("c"))
    wedges = x.join(y, "mid").filter(F.col("a") < F.col("c"))
    tagged = wedges.join(
        pairs.select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("c"),
            F.lit(True).alias("closed"),
        ),
        ["a", "c"],
        "left",
    ).select(F.coalesce("closed", F.lit(False)).alias("closed"))
    return tagged.agg(
        F.count(F.lit(1)).alias("n_wedges"),
        F.count(F.when(F.col("closed"), 1)).alias("n_closed"),
        F.count(F.when(~F.col("closed"), 1)).alias("n_open"),
        (
            F.count(F.when(F.col("closed"), 1)).cast("double")
            / F.count(F.lit(1))
        ).alias("transitivity"),
    )
