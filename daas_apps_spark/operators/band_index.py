"""K72: CDC-maintained LSH band index — incremental NEAR-dedup.

k17/k68 made exact dedup incremental (cost ∝ |delta| via the change
feed); near-dedup still re-ran the full k3 band self-join every time a
crawl landed. This module closes that gap the k69 way: the K3 banding
state is persisted in versioned tables and maintained from the source
documents table's change feed — at 100 TB the band index is NEVER
rebuilt, and a nightly crawl near-dedups against ALL of history by
probing only its own arrivals' bands.

The index is two versioned tables maintained under one watermark:

- ``bands``   — ``(doc_id, band_key)``, the K3 LSH banding rows
  (distinct per doc; 6 bands of 2 minhash signatures, identical
  constants to k3_lsh_near_dedup so maintained state ≡ rebuild is
  well-defined row-for-row);
- ``shingles`` — ``(doc_id, shingles)``, the verify-side shingle sets,
  so candidate Jaccard never re-tokenizes history.

``maintain_band_index`` consumes ``changes_between`` windows and
applies each as ONE conditional-merge commit per table: churned doc
ids come from the feed (|delta|-sized), their head text is read back
manifest-PRUNED to the churned id range (the k69 head_ids pattern),
only those docs re-tokenize, and the per-(doc_id, band_key) net —
new-minus-old / old-minus-new — merges in. The processed source
version rides in the merge commit's metadata, so maintenance resumes
from where it left off with no side-channel state. ``docs_scanned``
in the returned stats is the tokenize-input row count — the cost
guard tests pin it to the churned-doc count, never the corpus.

``probe_near_dups`` is the incremental query: bands of the NEW docs
only, joined against the full maintained band table, Jaccard-verified
from the shingle store — pair census ∝ arrivals × collisions.
``near_dup_pairs_from_index`` is the full-census form (both sides the
index), which equals k3_lsh_near_dedup recomputed from scratch on the
head corpus — the k72 oracle row pins exactly that after an
append + MOR-delete + MOR-update sweep.

Generalizes the reference's incremental update step
(SparkCaller.java:129-160 — re-running only the changed shards) from
shard recompute to LSH-index maintenance.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.operators.dedup import (
    _DUCK_BANDS,
    JACCARD_THRESHOLD,
    N_BANDS,
    N_PERM,
    _band_key_spark,
    _minhash_sig_duck,
    base_hash_spark,
    minhash_sig_cols,
    shingles_col,
    tokens_col,
)
from daas_apps_spark.registry import register
from daas_apps_spark.sources.table_format import VersionedTable

_SRC_VERSION_KEY = "band_source_version"


def doc_shingles(docs: DataFrame) -> DataFrame:
    """``(doc_id, shingles)`` — k3's tokenize→shingle stage verbatim
    (docs under 3 tokens carry no shingles and no bands, as in k3)."""
    return (
        docs.withColumn("tokens", tokens_col())
        .filter(F.size("tokens") >= 3)
        .withColumn("shingles", shingles_col(F.col("tokens")))
        .select("doc_id", "shingles")
    )


def doc_bands(sh: DataFrame) -> DataFrame:
    """``(doc_id, band_key)`` from a shingle frame — k3's minhash +
    banding, DISTINCT per doc so (doc_id, band_key) is a merge key
    (a doc whose two bands collide on one key stores one row; the
    candidate PAIR set is unchanged, pairs were already distinct)."""
    sigs = sh.select("doc_id", base_hash_spark()).select(
        "doc_id", *minhash_sig_cols()
    )
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(*[_band_key_spark(b) for b in range(N_BANDS)])
        ).alias("band_key"),
    ).distinct()


def build_band_index(
    spark: SparkSession,
    source: VersionedTable,
    base_path: str,
    source_version: int | None = None,
) -> tuple[VersionedTable, VersionedTable]:
    """From-scratch build over one source snapshot; records the covered
    version so maintenance knows where the feed resumes."""
    sv = (
        source_version
        if source_version is not None
        else source.latest_version()
    )
    sh = doc_shingles(source.read(version=sv)).localCheckpoint()
    bands = VersionedTable(spark, os.path.join(base_path, "bands"))
    store = VersionedTable(spark, os.path.join(base_path, "shingles"))
    bands.append(doc_bands(sh), metadata={_SRC_VERSION_KEY: sv})
    store.append(sh, metadata={_SRC_VERSION_KEY: sv})
    return bands, store


def band_source_version(bands: VersionedTable) -> int:
    """Newest source version the index has applied (commit metadata)."""
    vs = [
        c["metadata"][_SRC_VERSION_KEY]
        for c in bands.history()
        if _SRC_VERSION_KEY in (c.get("metadata") or {})
    ]
    if not vs:
        raise ValueError(
            "band index has no recorded source version — was it built "
            "by build_band_index?"
        )
    return max(vs)


def maintain_band_index(
    spark: SparkSession,
    source: VersionedTable,
    bands: VersionedTable,
    store: VersionedTable,
    v_to: int | None = None,
) -> dict:
    """Advance the band index across (last-applied, v_to] with ONE
    conditional-merge commit per table. Cost ∝ |delta|: churned ids
    come from the feed, the head re-read is manifest-pruned to their
    id range, and only churned docs re-tokenize (``docs_scanned``
    reports that count — the guard the tests pin). A no-op window
    commits nothing."""
    v_from = band_source_version(bands)
    head = v_to if v_to is not None else source.latest_version()
    if head <= v_from:
        return {"version": v_from, "docs_scanned": 0, "churned": 0}
    feed = source.changes_between(v_from, head)
    churned = feed.select("doc_id").distinct().localCheckpoint()
    bounds = churned.agg(F.min("doc_id"), F.max("doc_id")).first()
    if bounds[0] is None:
        return {"version": head, "docs_scanned": 0, "churned": 0}
    # head state of the churned ids only: manifest-pruned read (files
    # whose doc_id range misses the churned window are never opened),
    # then the exact id set via semi-join — the k69 head_ids pattern
    head_docs = source.read(
        version=head, prune=("doc_id", bounds[0], bounds[1])
    ).join(churned, "doc_id", "left_semi")
    sh_new = doc_shingles(head_docs).localCheckpoint()
    docs_scanned = sh_new.count()
    new_bands = doc_bands(sh_new)
    old_bands = bands.read().join(churned, "doc_id", "left_semi")
    keyp = ["doc_id", "band_key"]
    to_del = old_bands.join(new_bands, keyp, "left_anti")
    to_ins = new_bands.join(old_bands, keyp, "left_anti")
    band_delta = to_ins.withColumn("op", F.lit("ins")).unionByName(
        to_del.withColumn("op", F.lit("del"))
    )
    meta = {_SRC_VERSION_KEY: head}
    bands.merge_into(
        band_delta,
        keyp,
        matched=[{"action": "delete", "condition": "s.op = 'del'"}],
        not_matched=[
            {
                "condition": "s.op = 'ins'",
                "columns": keyp,
                "values": ["s.doc_id", "s.band_key"],
            }
        ],
        commit_metadata=meta,
    )
    removals = churned.join(sh_new.select("doc_id"), "doc_id", "left_anti")
    store_delta = sh_new.withColumn("op", F.lit("ins")).unionByName(
        removals.withColumn(
            "shingles", F.lit(None).cast("array<string>")
        ).withColumn("op", F.lit("del"))
    )
    store.merge_into(
        store_delta,
        ["doc_id"],
        matched=[
            {
                "action": "update",
                "condition": "s.op = 'ins'",
                "set": {"shingles": "s.shingles"},
            },
            {"action": "delete"},
        ],
        not_matched=[
            {
                "condition": "s.op = 'ins'",
                "columns": ["doc_id", "shingles"],
                "values": ["s.doc_id", "s.shingles"],
            }
        ],
        commit_metadata=meta,
    )
    return {
        "version": head,
        "docs_scanned": docs_scanned,
        "churned": churned.count(),
    }


def _verify_pairs(cands: DataFrame, store_df: DataFrame) -> DataFrame:
    """Jaccard-verify candidate pairs against the shingle store —
    k3's verify stage reading maintained state instead of re-shingling
    the corpus; the store joins are pruned to the candidate ids."""
    sa = store_df.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    sb = store_df.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast(
        "double"
    ) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def near_dup_pairs_from_index(
    bands_df: DataFrame, store_df: DataFrame
) -> DataFrame:
    """Full near-dup census from maintained state alone — k3's
    candidate self-join + Jaccard verify with every input a read of
    the index, zero corpus tokenization. Equals k3_lsh_near_dedup
    recomputed from scratch on the head corpus (the k72 oracle pin)."""
    a, b = bands_df.alias("a"), bands_df.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return _verify_pairs(cands, store_df)


def probe_near_dups(
    bands: VersionedTable, store: VersionedTable, new_ids: DataFrame
) -> DataFrame:
    """Incremental near-dedup: pairs INVOLVING the given doc ids,
    probed band-first against the FULL maintained index — the nightly
    crawl's query. Cost ∝ |arrivals| × band collisions: the probe side
    is semi-joined to the new ids before the band join, history never
    re-tokenizes (shingles come from the store), and the result is
    exactly the full census filtered to pairs touching a new doc."""
    all_bands = bands.read()
    nb = all_bands.join(new_ids, "doc_id", "left_semi")
    a, b = nb.alias("a"), all_bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return _verify_pairs(cands, store.read())


_K72_ORACLE = """
    WITH corpus AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 1
                    THEN text || ' xenon xenon xenon xenon'
                    ELSE text END AS text
        FROM documents WHERE doc_id % 5 <> 0
    ),
    toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS tokens
        FROM corpus
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(tokens) - 2),
                             i -> array_to_string(tokens[i+1:i+3], ' ')))
                   AS shingles
        FROM toks WHERE len(tokens) >= 3
    ),
    hsh AS (
        SELECT doc_id,
               list_transform(shingles,
                   s -> ('0x' || substring(md5(s), 1, 7))::BIGINT) AS hs
        FROM sh
    ),
    sigs AS (
        SELECT doc_id, {SIGS} FROM hsh
    ),
    bands AS (
        SELECT doc_id, unnest([{BANDS}]) AS band_key FROM sigs
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                 / len(list_distinct(sa.shingles || sb.shingles)), 4)
               AS jaccard
    FROM cands c
    JOIN sh sa ON c.doc_a = sa.doc_id
    JOIN sh sb ON c.doc_b = sb.doc_id
    WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
          / len(list_distinct(sa.shingles || sb.shingles)) >= {THR}
""".replace(
    "{SIGS}", ", ".join(_minhash_sig_duck(i) for i in range(N_PERM))
).replace(
    "{BANDS}", _DUCK_BANDS
).replace(
    "{THR}", str(JACCARD_THRESHOLD)
)


@register(
    "k72_incremental_near_dedup",
    oracle=_K72_ORACLE,
    tags=("K72", "K3", "K68", "K69", "A25", "A44"),
)
def k72_incremental_near_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CDC-maintained LSH band index ≡ from-scratch k3 rebuild, pinned
    both by this oracle row and in-function: documents land in a
    versioned source (v1 = ids with doc_id % 3 != 2), the band index
    builds over that snapshot, then the source takes an append (the
    % 3 == 2 ids, v2), a MOR delete (every 5th id, v3), and a MOR
    UPDATE that rewrites a text stripe (% 7 == 1, v4 — its shingles,
    signatures, and band memberships all change, the case exact-hash
    incremental dedup k17/k68 cannot see). ONE maintenance run folds
    the whole window as one conditional-merge commit per index table;
    the function then REBUILDS both tables from scratch on the head
    snapshot and asserts row-identity, pins the |delta| cost guard
    (``docs_scanned`` == churned docs present at head, never the
    corpus), and checks the incremental probe (arrival ids only)
    equals the full census filtered to pairs touching an arrival. The
    judge-visible result is the full near-dup pair census computed
    FROM MAINTAINED STATE ALONE — zero re-tokenization — which DuckDB
    recomputes from first principles over the swept corpus.

    At 100 TB: near-dedup of a nightly crawl stops being a full band
    self-join over history — maintenance costs the delta (pruned head
    re-read + per-pair net merge), and the probe costs the arrivals'
    band collisions. The band table partitions by band_key prefix and
    the store by doc_id range, so both sides stay co-located."""
    from daas_apps_spark.sources.io import scratch_dir

    base = scratch_dir(f"k72_bandidx_{os.getpid()}")
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    src = VersionedTable(spark, os.path.join(base, "docs"))
    src.append(d.filter(F.col("doc_id") % 3 != 2))  # v1
    bands, store = build_band_index(
        spark, src, os.path.join(base, "index")
    )
    src.append(d.filter(F.col("doc_id") % 3 == 2))  # v2: arrivals
    src.delete("doc_id % 5 = 0", mode="mor")  # v3: removals
    src.update(  # v4: shingle-changing rewrite
        "doc_id % 7 = 1",
        {"text": "concat(text, ' xenon xenon xenon xenon')"},
        mode="mor",
    )
    stats = maintain_band_index(spark, src, bands, store)
    # cost guard: tokenization touched only churned docs, not the corpus
    total = src.read().count()
    if not (0 < stats["docs_scanned"] < total):
        raise AssertionError(
            f"maintenance scanned {stats['docs_scanned']} docs of "
            f"{total} — not |delta|-priced"
        )
    # maintained ≡ rebuilt, on both index tables
    rb, rs = build_band_index(spark, src, os.path.join(base, "rebuilt"))
    for got, want, what in (
        (bands.read(), rb.read(), "bands"),
        (store.read(), rs.read(), "shingles"),
    ):
        if got.exceptAll(want).count() or want.exceptAll(got).count():
            raise AssertionError(
                f"maintained {what} table diverged from rebuild"
            )
    # the incremental probe (arrivals only) is the census slice that
    # touches an arrival — the query a nightly crawl actually runs
    arrivals = src.read().filter(
        (F.col("doc_id") % 3 == 2)
    ).select("doc_id")
    probed = probe_near_dups(bands, store, arrivals)
    # the census feeds the probe check twice and is the return value:
    # materialize once (same localCheckpoint rationale as _k3_impl)
    census = near_dup_pairs_from_index(
        bands.read(), store.read()
    ).localCheckpoint()
    touch = census.join(
        arrivals.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi"
    ).unionByName(
        census.join(
            arrivals.select(F.col("doc_id").alias("doc_b")),
            "doc_b",
            "left_semi",
        )
    ).distinct()
    if probed.exceptAll(touch).count() or touch.exceptAll(probed).count():
        raise AssertionError(
            "incremental probe != census pairs touching an arrival"
        )
    return census
