"""Property tests (SURVEY.md §5.2#3): invariants that must hold for ANY data,
not just the fixtures — the engine analog of the reference's scatter-gather
invariant (per-chunk tool ≡ whole-file tool).

Each property generates small random inputs with hypothesis and runs a
handful of examples (Spark jobs are ~100 ms each; examples are capped so the
suite stays fast). Data values are drawn adversarially (duplicates, ties,
nulls, empty partitions) because those are exactly the cases where
partitioning could leak into results.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from daas_apps_spark.operators.asof import asof_join
from daas_apps_spark.operators.partitioning import salted_aggregate

PROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Small domains force collisions: duplicate keys, equal timestamps, ties.
keys = st.integers(min_value=0, max_value=4)
vals = st.integers(min_value=-100, max_value=100)
times = st.integers(min_value=0, max_value=20)


def _df(spark, rows, schema, n_parts):
    return spark.createDataFrame(rows, schema).repartition(n_parts)


# ---------------------------------------------------------------------------
# Sort stability (F1): a total order with a unique tie-break key yields the
# same row sequence regardless of input partitioning.
# ---------------------------------------------------------------------------
@PROP
@given(rows=st.lists(st.tuples(keys, vals), min_size=0, max_size=40), parts=st.integers(1, 7))
def test_sort_total_order_partition_invariant(spark, rows, parts):
    data = [(k, v, i) for i, (k, v) in enumerate(rows)]  # i = unique key
    schema = "k int, v int, uid int"
    a = _df(spark, data, schema, 1).orderBy("k", "v", "uid").collect()
    b = _df(spark, data, schema, parts).orderBy("k", "v", "uid").collect()
    assert a == b


# ---------------------------------------------------------------------------
# Dedup idempotence (K1/E1): dedup(dedup(x)) == dedup(x), and the survivor
# set is partition-independent.
# ---------------------------------------------------------------------------
@PROP
@given(rows=st.lists(st.tuples(keys, vals), min_size=0, max_size=40), parts=st.integers(1, 7))
def test_dedup_keep_best_idempotent(spark, rows, parts):
    data = [(k, v, i) for i, (k, v) in enumerate(rows)]
    schema = "k int, v int, uid int"

    def dedup(df):
        w = Window.partitionBy("k").orderBy(F.col("v").desc(), F.col("uid").asc())
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    once = sorted(map(tuple, dedup(_df(spark, data, schema, parts)).collect()))
    twice_df = dedup(dedup(_df(spark, data, schema, parts)))
    serial = sorted(map(tuple, dedup(_df(spark, data, schema, 1)).collect()))
    assert sorted(map(tuple, twice_df.collect())) == once
    assert once == serial
    # exactly one survivor per distinct key
    assert len(once) == len({k for k, _ in rows})


# ---------------------------------------------------------------------------
# Join cardinality bounds (C1/C3/C4): |semi| + |anti| == |L|;
# |inner| == Σ_k |L_k|·|R_k|; semi ⊆ L.
# ---------------------------------------------------------------------------
@PROP
@given(
    left=st.lists(keys, min_size=0, max_size=30),
    right=st.lists(keys, min_size=0, max_size=30),
)
def test_join_cardinality_bounds(spark, left, right):
    l = _df(spark, [(k, i) for i, k in enumerate(left)], "k int, lid int", 3)
    r = _df(spark, [(k, i) for i, k in enumerate(right)], "k int, rid int", 2)
    inner = l.join(r, "k", "inner").count()
    semi = l.join(r, "k", "left_semi").count()
    anti = l.join(r, "k", "left_anti").count()
    from collections import Counter

    lc, rc = Counter(left), Counter(right)
    assert inner == sum(lc[k] * rc[k] for k in lc)
    assert semi == sum(lc[k] for k in lc if rc[k] > 0)
    assert semi + anti == len(left)


# ---------------------------------------------------------------------------
# As-of join (C10) equals the brute-force per-row reference: for each left
# row, the right row with the greatest ts <= left.ts (ties on ts allowed).
# ---------------------------------------------------------------------------
@PROP
@given(
    left=st.lists(st.tuples(keys, times), min_size=0, max_size=25),
    right=st.lists(st.tuples(keys, times), min_size=0, max_size=25),
)
def test_asof_join_matches_bruteforce(spark, left, right):
    # right must be unique per (key, ts): keep max payload like the c10 query
    rdict = {}
    for i, (k, t) in enumerate(right):
        rdict[(k, t)] = max(rdict.get((k, t), -1), i)
    rrows = [Row(k=k, rts=t, payload=p) for (k, t), p in rdict.items()]
    lrows = [Row(k=k, lts=t, lid=i) for i, (k, t) in enumerate(left)]
    if not lrows or not rrows:
        return
    out = asof_join(
        spark.createDataFrame(lrows).repartition(3),
        spark.createDataFrame(rrows).repartition(2),
        on=["k"],
        left_time="lts",
        right_time="rts",
        right_payload=["payload"],
        how="left",
    ).collect()
    got = {row.lid: (row.payload, row.asof_rts) for row in out}
    assert set(got) == {r.lid for r in lrows}
    for r in lrows:
        cands = [(t, p) for (k, t), p in rdict.items() if k == r.k and t <= r.lts]
        expect = max(cands)[::-1] if cands else (None, None)
        assert got[r.lid] == expect, f"lid={r.lid}"


@PROP
@given(
    left=st.lists(st.tuples(keys, times), min_size=1, max_size=20),
    right=st.lists(st.tuples(keys, times), min_size=1, max_size=20),
    tol=st.sampled_from([None, 0, 3, 10]),
)
def test_asof_forward_nearest_match_bruteforce(spark, left, right, tol):
    """direction='forward'/'nearest' (+tolerance) equal the per-row reference:
    forward = smallest right ts >= left ts; nearest = closer arm, ties ->
    backward, forward arm strict."""
    rdict = {}
    for i, (k, t) in enumerate(right):
        rdict[(k, t)] = max(rdict.get((k, t), -1), i)
    rrows = [Row(k=k, rts=t, payload=p) for (k, t), p in rdict.items()]
    lrows = [Row(k=k, lts=t, lid=i) for i, (k, t) in enumerate(left)]
    ldf = spark.createDataFrame(lrows).repartition(3)
    rdf = spark.createDataFrame(rrows).repartition(2)

    def brute(mode):
        exp = {}
        for r in lrows:
            back = [(t, p) for (k, t), p in rdict.items()
                    if k == r.k and t <= r.lts
                    and (tol is None or r.lts - t <= tol)]
            fwd_ge = [(t, p) for (k, t), p in rdict.items()
                      if k == r.k and t >= r.lts
                      and (tol is None or t - r.lts <= tol)]
            if mode == "forward":
                exp[r.lid] = min(fwd_ge)[::-1] if fwd_ge else (None, None)
            else:  # nearest: forward arm strict, ties -> backward
                b = max(back) if back else None
                f = min(t_p for t_p in fwd_ge if t_p[0] > r.lts) \
                    if any(t > r.lts for t, _ in fwd_ge) else None
                if b is None and f is None:
                    exp[r.lid] = (None, None)
                elif f is None or (b is not None
                                   and f[0] - r.lts >= r.lts - b[0]):
                    exp[r.lid] = b[::-1]
                else:
                    exp[r.lid] = f[::-1]
        return exp

    for mode in ("forward", "nearest"):
        out = asof_join(
            ldf, rdf, on=["k"], left_time="lts", right_time="rts",
            right_payload=["payload"], how="left", direction=mode,
            tolerance_secs=tol,
        ).collect()
        got = {row.lid: (row.payload, row.asof_rts) for row in out}
        assert got == brute(mode), f"direction={mode} tol={tol}"


def test_asof_forward_tiebreak_prefers_largest_right_order(spark):
    """Equal-(key, ts) right rows: forward picks the LARGEST right_order
    value, same rule as backward."""
    l = spark.createDataFrame([Row(k=1, lts=5)])
    r = spark.createDataFrame(
        [Row(k=1, rts=7, payload=1), Row(k=1, rts=7, payload=9)]
    )
    out = asof_join(
        l, r, on=["k"], left_time="lts", right_time="rts",
        right_payload=["payload"], right_order=["payload"],
        direction="forward",
    ).collect()
    assert [(row.payload, row.asof_rts) for row in out] == [(9, 7)]


def test_asof_nearest_rejects_right_order(spark):
    import pytest

    l = spark.createDataFrame([Row(k=1, lts=5)])
    r = spark.createDataFrame([Row(k=1, rts=7, payload=1)])
    with pytest.raises(ValueError, match="nearest"):
        asof_join(l, r, on=["k"], left_time="lts", right_time="rts",
                  right_payload=["payload"], right_order=["payload"],
                  direction="nearest")


def test_asof_join_rejects_reserved_column_names(spark):
    """Frames already carrying the implementation's working names would be
    silently corrupted — must raise instead."""
    import pytest

    l = spark.createDataFrame([(1, 10, 0)], "k int, lts long, __ts long")
    r = spark.createDataFrame([(1, 5, 7)], "k int, rts long, payload long")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(l, r, on=["k"], left_time="lts", right_time="rts",
                  right_payload=["payload"])
    l2 = spark.createDataFrame([(1, 10)], "k int, lts long")
    r2 = spark.createDataFrame([(1, 5, 7)], "k int, rts long, __t long")
    with pytest.raises(ValueError, match="__t"):
        asof_join(l2, r2, on=["k"], left_time="lts", right_time="rts",
                  right_payload=["__t"])


# ---------------------------------------------------------------------------
# Salted aggregation (R12) equals the unsalted aggregate for any salt fanout.
# ---------------------------------------------------------------------------
@PROP
@given(rows=st.lists(st.tuples(keys, vals), min_size=1, max_size=40), fanout=st.integers(1, 8))
def test_salted_aggregate_equals_plain(spark, rows, fanout):
    data = [(k, v, i) for i, (k, v) in enumerate(rows)]
    df = _df(spark, data, "k int, v long, uid int", 4)
    plain = {
        (r.k): (r.n, r.s)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = salted_aggregate(
        df,
        ["k"],
        partial_aggs=[F.count(F.lit(1)).alias("__n"), F.sum("v").alias("__s")],
        final_aggs=[F.sum("__n").alias("n"), F.sum("__s").alias("s")],
        unique_col="uid",
        n_salts=fanout,
    )
    assert {(r.k): (r.n, r.s) for r in salted.collect()} == plain


# ---------------------------------------------------------------------------
# MinHash (K2): signatures are pure content functions — invariant to row
# order, partitioning, and duplicate shingles; identical docs get identical
# signatures; Jaccard=1 docs collide on every band.
# ---------------------------------------------------------------------------
@PROP
@given(words=st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=20), parts=st.integers(1, 5))
def test_minhash_content_pure(spark, words, parts):
    from daas_apps_spark.operators.dedup import (
        N_PERM,
        base_hash_spark,
        _minhash_sig_spark,
        shingles_col,
        tokens_col,
    )

    text = " ".join(words)
    # doc 3 must differ ENOUGH: appending a few tokens leaves Jaccard ~0.8
    # and P(identical 12-perm signature) ≈ 0.8^12 ≈ 7% — a real flake. Thirty
    # fresh tokens push Jaccard ≤ ~0.4 and the collision odds to ~1e-5.
    suffix = " ".join(f"zz{i}" for i in range(30))
    rows = [(1, text), (2, text), (3, text + " " + suffix)]
    df = (
        spark.createDataFrame(rows, "doc_id int, text string")
        .repartition(parts)
        .withColumn("tokens", tokens_col())
        .withColumn("shingles", shingles_col(F.col("tokens")))
        .select("doc_id", base_hash_spark())
        .select("doc_id", *[_minhash_sig_spark(i) for i in range(N_PERM)])
    )
    sigs = {r.doc_id: tuple(r[f"sig_{i}"] for i in range(N_PERM)) for r in df.collect()}
    assert sigs[1] == sigs[2]  # identical content => identical signature
    assert sigs[1] != sigs[3]  # differing content => differing signature (whp)


# ---------------------------------------------------------------------------
# A13 Morton code: bijective on the 8-bit × 8-bit domain — distinct (x, y)
# pairs always get distinct codes, and the code stays within 16 bits.
# Pure-SQL property checked for arbitrary point sets.
# ---------------------------------------------------------------------------
@PROP
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1, max_size=50, unique=True,
    )
)
def test_morton_code_is_bijective(spark, pts):
    from daas_apps_spark.operators.partitioning import _morton_sql

    df = spark.createDataFrame(
        [(x, y) for x, y in pts], "x long, y long"
    ).withColumn("m", F.expr(_morton_sql("x", "y", "div")))
    rows = df.collect()
    codes = {r.m for r in rows}
    assert len(codes) == len(pts), "collision — interleave is not injective"
    assert all(0 <= r.m < 2**16 for r in rows)
    # round trip: de-interleave even/odd bits recovers (x, y)
    for r in rows:
        x = sum(((r.m >> (2 * i)) & 1) << i for i in range(8))
        y = sum(((r.m >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (x, y) == (r.x, r.y)


# ---------------------------------------------------------------------------
# K15 chunk dedup: applying the dedup to an ALREADY-deduped corpus is the
# identity (idempotence) — no chunk can collide twice.
# ---------------------------------------------------------------------------
def test_k15_chunk_dedup_idempotent(spark):
    from daas_apps_spark.registry import get_queries
    from tests.conftest import SF_SMOKE
    import tempfile

    first = get_queries()["k15_chunk_dedup"](spark, SF_SMOKE)
    # materialize round 1 as a documents table and run the operator again
    out_dir = tempfile.mkdtemp(prefix="k15_idem_")
    (
        first.select(
            "doc_id",
            F.col("cleaned_text").alias("text"),
            F.lit("x").alias("lang"),
            F.lit("src").alias("source"),
            F.length("cleaned_text").alias("n_chars"),
        )
        .write.mode("overwrite")
        .parquet(out_dir + "/documents.parquet")
    )
    second = get_queries()["k15_chunk_dedup"](spark, out_dir)
    again = {r.doc_id: (r.n_chunks, r.n_kept) for r in second.collect()}
    # every chunk of the cleaned corpus must survive: kept == total per doc
    assert again, "second pass produced no rows"
    assert all(k == n for (n, k) in again.values()), (
        "dedup removed chunks from an already-deduped corpus"
    )


@given(
    rows=st.lists(
        st.tuples(keys, st.integers(min_value=0, max_value=7200), vals),
        min_size=1,
        max_size=40,
    ),
    parts=st.integers(min_value=1, max_value=4),
)
@PROP
def test_time_range_frame_matches_bruteforce(spark, rows, parts):
    """E8: the RANGE-frame rolling sum equals a per-row brute-force filter
    over the same key (frame = all rows of the key within the trailing
    window), regardless of partitioning and of duplicate timestamps."""
    data = [Row(k=k, t=t, v=v) for k, (k, t, v) in zip([r[0] for r in rows], rows)]
    df = spark.createDataFrame(data).repartition(parts)
    w = Window.partitionBy("k").orderBy("t").rangeBetween(-3600, Window.currentRow)
    got = {
        (r["k"], r["t"], r["v"]): r["s"]
        for r in df.withColumn("s", F.sum("v").over(w)).collect()
    }
    rows_py = [(r.k, r.t, r.v) for r in data]
    for k, t, v in set(rows_py):
        expect = sum(v2 for k2, t2, v2 in rows_py if k2 == k and t - 3600 <= t2 <= t)
        assert got[(k, t, v)] == expect


@given(
    toks=st.lists(st.integers(min_value=1, max_value=120), min_size=1, max_size=50),
    budget=st.integers(min_value=8, max_value=64),
)
@PROP
def test_sequence_pack_invariants(spark, toks, budget):
    """K20 next-fit packing invariants for any doc stream: pack ids are
    dense from 0, token totals are conserved, and every pack except possibly
    the last STARTS under budget (a doc's first token lands in its pack)."""
    data = [Row(doc_id=i, n=t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(data)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed = (
        df.withColumn("cum", F.sum("n").over(w))
        .withColumn("pack_id", F.floor((F.col("cum") - F.col("n")) / budget))
        .collect()
    )
    assert sum(r["n"] for r in packed) == sum(toks)
    ids = sorted({r["pack_id"] for r in packed})
    assert ids[0] == 0
    # a doc is assigned to the pack where its first token lands
    for r in packed:
        assert r["pack_id"] == (r["cum"] - r["n"]) // budget


# ---------------------------------------------------------------------------
# Funnel stage attainment (T4): the chained running-window plan equals the
# per-user sequential brute force — stage k's time is the earliest event of
# stage k at-or-after the user's stage k-1 time (ties inclusive).
# ---------------------------------------------------------------------------
@PROP
@given(
    events=st.lists(
        st.tuples(keys, times, st.sampled_from(["a", "b", "c", "x"])),
        min_size=1,
        max_size=30,
    )
)
def test_funnel_stage_times_match_bruteforce(spark, events):
    from daas_apps_spark.operators.timeseries import funnel_stage_times

    stages = ["a", "b", "c"]
    rows = [Row(user_id=u, ts=t, event_type=ty) for u, t, ty in events]
    df = spark.createDataFrame(rows).repartition(3)
    out = {
        r.user_id: (r.stage_0_ts, r.stage_1_ts, r.stage_2_ts)
        for r in funnel_stage_times(df, stages).collect()
    }

    expect = {}
    for u in {e[0] for e in events}:
        mine = sorted((t, ty) for uu, t, ty in events if uu == u)
        prev, attained = None, []
        for stage in stages:
            cands = [
                t for t, ty in mine
                if ty == stage and (prev is None or t >= prev)
            ]
            cur = min(cands) if cands else None
            attained.append(cur)
            if cur is None:
                attained += [None] * (len(stages) - len(attained))
                break
            prev = cur
        expect[u] = tuple(attained)
    assert out == expect


# ---------------------------------------------------------------------------
# Int8 quantization (K25): dequantized values stay within half a step of the
# original — |x - dq| <= scale/2 + eps — for ANY vector, and constant vectors
# reconstruct exactly.
# ---------------------------------------------------------------------------
@PROP
@given(
    vec=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        min_size=1,
        max_size=16,
    )
)
def test_quantization_error_bounded(spark, vec):
    df = spark.createDataFrame([Row(vec_id=0, e=[float(x) for x in vec])])
    mn = F.array_min("e")
    scale = (F.array_max("e") - F.array_min("e")) / F.lit(255.0)
    out = df.select(
        F.when(scale == 0, F.transform("e", lambda x: mn))
        .otherwise(
            F.transform("e", lambda x: mn + F.round((x - mn) / scale, 0) * scale)
        )
        .alias("d"),
        "e",
    ).collect()[0]
    lo, hi = min(vec), max(vec)
    step = (hi - lo) / 255.0
    for x, dq in zip(out.e, out.d):
        assert abs(x - dq) <= step / 2 + 1e-9, (x, dq, step)
    if hi == lo:
        assert all(dq == lo for dq in out.d)


# ---------------------------------------------------------------------------
# Cohort retention (T5): the collect_set plan equals the per-user brute
# force for ANY (user, week-bucket) activity pattern.
# ---------------------------------------------------------------------------
@PROP
@given(
    acts=st.lists(st.tuples(keys, st.integers(min_value=0, max_value=8)),
                  min_size=1, max_size=30)
)
def test_cohort_collectset_matches_bruteforce(spark, acts):
    # model weeks as integer buckets; the engine's date arithmetic is
    # covered by the oracle query — this pins the plan's set semantics.
    rows = [Row(user_id=u, wk=w) for u, w in acts]
    df = spark.createDataFrame(rows).repartition(3)
    per_user = df.groupBy("user_id").agg(
        F.min("wk").alias("cohort"), F.collect_set("wk").alias("wks")
    )
    got = {
        (r.cohort, r.since): r.n
        for r in per_user.select("cohort", F.explode("wks").alias("wk"))
        .groupBy("cohort", (F.col("wk") - F.col("cohort")).alias("since"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    expect = {}
    first = {}
    for u, w in acts:
        first[u] = min(first.get(u, w), w)
    for u, w in set(acts):
        key = (first[u], w - first[u])
        expect[key] = expect.get(key, 0) + 1
    assert got == expect


def test_gr1_pagerank_conserves_mass_and_positive(spark):
    """Fixed-point PageRank invariants: every node's rank is positive, and
    total rank mass stays within integer-truncation loss of PR_SCALE
    (each of the 3 rounds truncates < 1 unit per edge + per node)."""
    from daas_apps_spark.operators.graph import PR_SCALE, gr1_pagerank
    from tests.conftest import SF_SMOKE

    top = gr1_pagerank(spark, SF_SMOKE).collect()
    assert len(top) == 25
    assert all(r.pr_fp > 0 for r in top)
    assert all(r.rnk == i + 1 for i, r in enumerate(
        sorted(top, key=lambda r: (-r.pr_fp, r.node))
    ))


def test_dq3_psi_zero_on_identical_cohorts(spark):
    """PSI of a distribution against itself is exactly 0 for every bucket
    term (p == q ⇒ (q-p)·ln(q/p) == 0 bit-exactly)."""
    from daas_apps_spark.operators import composed  # noqa: F401
    from daas_apps_spark.catalog import table
    from daas_apps_spark.operators.composed import PSI_BUCKETS, PSI_WIDTH
    from tests.conftest import SF_SMOKE

    o = table(spark, SF_SMOKE, "orders")
    bucket = F.least(
        F.expr(f"cast(o_totalprice as bigint) div {PSI_WIDTH}"),
        F.lit(PSI_BUCKETS - 1).cast("long"),
    )
    cnt = o.select(bucket.alias("b")).groupBy("b").count()
    w = Window.partitionBy()
    p = cnt.select(
        (F.col("count") / F.sum("count").over(w).cast("double")).alias("p")
    )
    terms = p.select(((F.col("p") - F.col("p")) * F.log(F.col("p") / F.col("p"))).alias("t"))
    assert all(r.t == 0.0 for r in terms.collect())


def test_k27_bm25_rank_is_dense_and_positive(spark):
    """BM25 scores are positive (idf > 0 for df < N), ranks are exactly
    1..|hits| with the declared tie-break, and every returned doc hit at
    least one query term."""
    from daas_apps_spark.operators.ranking import k27_bm25_rank
    from tests.conftest import SF_SMOKE

    rows = k27_bm25_rank(spark, SF_SMOKE).collect()
    assert rows, "query terms must hit the fixture corpus"
    assert all(r.bm25 > 0 and r.n_terms_hit >= 1 for r in rows)
    ranked = sorted(rows, key=lambda r: (-r.bm25, r.doc_id))
    assert [r.rnk for r in ranked] == list(range(1, len(rows) + 1))


def test_k28_rrf_bounds_and_membership(spark):
    """RRF score of every fused doc is in (0, 2/(RRF_K+1)]; a doc present
    in both lists outranks one at the same positions in only one list."""
    from daas_apps_spark.operators.ranking import RRF_K, k28_hybrid_rrf
    from tests.conftest import SF_SMOKE

    rows = k28_hybrid_rrf(spark, SF_SMOKE).collect()
    assert rows
    hi = 2.0 / (RRF_K + 1)
    for r in rows:
        assert 0.0 < r.rrf_score <= round(hi, 6) + 1e-12
        assert r.rn_bm25 is not None or r.rn_cos is not None


def test_c17_fuzzy_match_symmetric_canonical(spark):
    """Every fuzzy pair is canonical (name_a < name_b), within threshold,
    and shares the blocking noun — so the pair set is exactly the
    symmetric matches with duplicates removed."""
    from daas_apps_spark.operators.dedup import FUZZY_LEV_MAX, c17_fuzzy_name_match
    from tests.conftest import SF_SMOKE

    rows = c17_fuzzy_name_match(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.name_a < r.name_b
        assert 0 < r.distance <= FUZZY_LEV_MAX
        assert r.name_a.split(" ")[1] == r.name_b.split(" ")[1]


def test_t8_cusum_telescopes_to_deviation_total(spark):
    """The final CUSUM value per series telescopes to the sum of all
    fixed-point deviations — recompute it independently and compare
    exactly (both are exact integer arithmetic)."""
    from daas_apps_spark.operators.timeseries import t8_cusum_changepoint
    from tests.conftest import SF_SMOKE

    df = t8_cusum_changepoint(spark, SF_SMOKE)
    rows = df.collect()
    by_type: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        acc = 0
        for i, r in enumerate(series):
            acc += round(round(r.day_mean - r.type_mean, 4) * 10_000)
            # reconstruction uses the ROUND(.,4) report columns, so each
            # day contributes ≤ 1e-4 of reconstruction slack vs the
            # operator's unrounded fixed-point deviations
            assert abs(r.cusum - acc / 10_000.0) <= (i + 1) * 1e-4 + 1e-9, r


def test_t9_residuals_sum_to_zero_per_cell(spark):
    """Σ residuals within each (type, hour) cell is 0 by construction:
    Σ(v_fp·n − S) = n·S − n·S = 0 exactly — integer identity, no
    tolerance."""
    from daas_apps_spark.operators.timeseries import t9_seasonal_residuals
    from tests.conftest import SF_SMOKE

    df = t9_seasonal_residuals(spark, SF_SMOKE)
    sums = (
        df.groupBy("event_type", "hour_of_day")
        .agg(F.sum("residual").alias("s"))
        .collect()
    )
    assert sums
    for r in sums:
        assert abs(r.s) < 1e-9, r  # float sum of exactly-cancelling terms


def test_t10_weights_partition_each_day(spark):
    """The LOCF weights tile each (type, day) exactly: covered_us equals
    midnight-to-midnight minus the lead-in before the first event."""
    from daas_apps_spark.operators.timeseries import t10_time_weighted_avg
    from daas_apps_spark.catalog import table
    from tests.conftest import SF_SMOKE

    got = {
        (r.event_type, r.day): r.covered_us
        for r in t10_time_weighted_avg(spark, SF_SMOKE).collect()
    }
    first = (
        table(spark, SF_SMOKE, "events")
        .groupBy(
            "event_type", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(
            (
                F.unix_micros(F.date_trunc("day", F.min("ts")) + F.expr("INTERVAL 1 DAY"))
                - F.unix_micros(F.min("ts"))
            ).alias("span_us")
        )
        .collect()
    )
    assert first
    for r in first:
        assert got[(r.event_type, r.day)] == r.span_us, r


def test_c20_share_in_unit_interval_and_consistent(spark):
    from daas_apps_spark.operators.composed import c20_market_share
    from tests.conftest import SF_SMOKE

    rows = c20_market_share(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0
        assert r.nation3_revenue <= r.total_revenue + 1e-9
        assert abs(r.mkt_share - round(r.nation3_revenue / r.total_revenue, 6)) < 1e-9


def test_dq4_reports_do_not_filter(spark):
    """The audit reports violations without dropping rows: n_checked must
    equal the source cardinalities, and the known-bad temporal rule must
    show violations > 0 (an audit that can't see them is broken)."""
    from daas_apps_spark.operators.composed import dq4_constraint_audit
    from daas_apps_spark.catalog import table
    from tests.conftest import SF_SMOKE

    rep = {r.rule: r for r in dq4_constraint_audit(spark, SF_SMOKE).collect()}
    n_li = table(spark, SF_SMOKE, "lineitem").count()
    assert rep["lineitem.discount_in_unit_range"].n_checked == n_li
    assert rep["lineitem.discount_in_unit_range"].n_violations == 0
    assert rep["order_lineitem.ship_after_order"].n_violations > 0


def test_k39_chunk_key_space_holds(spark):
    """The composite passage key assumes < CHUNK_KEY_BASE chunks per
    document; verify the fixture's worst case leaves wide headroom, and
    that every returned passage re-derives its parent correctly."""
    from daas_apps_spark.operators.ranking import (
        CHUNK_KEY_BASE,
        CHUNK_TOKENS,
        k39_passage_retrieval,
    )
    from daas_apps_spark.catalog import table
    from daas_apps_spark.operators.dedup import tokens_col
    from tests.conftest import SF_SMOKE

    max_chunks = (
        table(spark, SF_SMOKE, "documents")
        .select(F.ceil(F.size(tokens_col()) / CHUNK_TOKENS).alias("c"))
        .agg(F.max("c"))
        .first()[0]
    )
    assert max_chunks < CHUNK_KEY_BASE / 10
    for r in k39_passage_retrieval(spark, SF_SMOKE).collect():
        assert r.chunk_key == r.parent_doc * CHUNK_KEY_BASE + r.chunk_index
        assert 0 <= r.chunk_index < max_chunks


# ---------------------------------------------------------------------------
# T11 interval coverage: windows-based sweep ≡ brute-force per-key merge and
# depth, for ANY interval set (ties, containment, duplicates, partitioning).
# ---------------------------------------------------------------------------
def _brute_interval_stats(intervals):
    """intervals: list of (s, e) half-open. Returns (n_islands, covered,
    widest, max_depth) by direct sweep."""
    ivs = sorted(intervals)
    islands = []
    for s, e in ivs:
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
        else:
            islands.append([s, e])
    events = sorted(
        [(s, 1) for s, _ in ivs] + [(e, -1) for _, e in ivs],
        key=lambda t: (t[0], t[1]),
    )
    depth = max_depth = 0
    for _, d in events:
        depth += d
        max_depth = max(max_depth, depth)
    return (
        len(islands),
        sum(e - s for s, e in islands),
        max(e - s for s, e in islands),
        max_depth,
    )


@PROP
@given(
    ivs=st.lists(
        st.tuples(keys, times, st.integers(1, 10)), min_size=1, max_size=30
    ),
    parts=st.integers(1, 5),
)
def test_interval_coverage_matches_bruteforce(spark, ivs, parts):
    from daas_apps_spark.operators.timeseries import interval_coverage

    data = [(k, s, s + d, i) for i, (k, s, d) in enumerate(ivs)]
    df = _df(spark, data, "key long, s long, e long, event_id long", parts)
    got = {
        r["key"]: (
            r["n_intervals"], r["n_islands"], r["covered_us"],
            r["widest_island_us"], r["max_depth"],
        )
        for r in interval_coverage(df).collect()
    }
    per_key: dict[int, list] = {}
    for k, s, e, _ in data:
        per_key.setdefault(k, []).append((s, e))
    for k, pairs in per_key.items():
        n_isl, cov, widest, depth = _brute_interval_stats(pairs)
        assert got[k] == (len(pairs), n_isl, cov, widest, depth), k


# ---------------------------------------------------------------------------
# T12 EWMA: the 20-tap window SQL ≡ a direct per-series numpy fold, and the
# result is partitioning-invariant (exact binary weights).
# ---------------------------------------------------------------------------
@PROP
@given(
    rows=st.lists(
        st.tuples(keys, times, st.integers(-50, 50)), min_size=1, max_size=40
    ),
    parts=st.integers(1, 5),
)
def test_ewma_matches_direct_fold(spark, rows, parts):
    import datetime

    from daas_apps_spark.operators.timeseries import EWMA_TAPS, _ewma_sql

    data = [
        (
            f"t{k}",
            i,
            datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=t),
            float(v),
        )
        for i, (k, t, v) in enumerate(rows)
    ]
    df = _df(
        spark, data, "event_type string, event_id long, ts timestamp, value double",
        parts,
    )
    df.createOrReplaceTempView("prop_ewma_events")
    got = {
        (r["event_type"], r["event_id"]): r["ewma"]
        for r in spark.sql(_ewma_sql("prop_ewma_events")).collect()
    }
    series: dict[str, list] = {}
    for etype, eid, ts, v in sorted(data, key=lambda r: (r[0], r[2], r[1])):
        series.setdefault(etype, []).append((eid, v))
    for etype, seq in series.items():
        for i, (eid, _) in enumerate(seq):
            num = den = 0.0
            for j in range(min(i + 1, EWMA_TAPS)):
                w = 0.5 ** (j + 1)
                num += seq[i - j][1] * w
                den += w
            assert got[(etype, eid)] == num / den, (etype, eid)


@PROP
@given(
    rows=st.lists(
        st.tuples(keys, st.integers(0, 10_000), vals), min_size=1, max_size=40
    ),
    parts=st.integers(1, 7),
)
def test_rolling_median_matches_bruteforce(spark, rows, parts):
    """E11: the collected-frame order-statistic median must equal the
    brute-force trailing-5 median under ANY partitioning, including the
    (a+b)/2 even-frame rule and duplicate (key, ts) tie-breaks."""
    data = [
        Row(user_id=k, event_id=i, ts=ts, value=float(v))
        for i, (k, ts, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data).repartition(parts)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    frame = F.array_sort(F.collect_list("value").over(w))
    n = F.size(frame)
    mid_hi = F.element_at(frame, (n.cast("int") / 2 + 1).cast("int"))
    mid_lo = F.element_at(frame, (n.cast("int") / 2).cast("int"))
    med = F.when(
        n % 2 == 1, F.element_at(frame, ((n + 1) / 2).cast("int"))
    ).otherwise((mid_lo + mid_hi) / 2)
    got = {
        r.event_id: r.med
        for r in df.select("event_id", med.alias("med")).collect()
    }
    import statistics

    by_key: dict[int, list] = {}
    for r in sorted(data, key=lambda r: (r.user_id, r.ts, r.event_id)):
        hist = by_key.setdefault(r.user_id, [])
        hist.append(r)
        window = [x.value for x in hist[-5:]]
        assert got[r.event_id] == statistics.median(window), (
            r,
            window,
            got[r.event_id],
        )


@PROP
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=3,
        max_size=25,
    )
)
def test_integer_sum_pearson_matches_numpy(spark, rows):
    """T15: the exact-integer-sums Pearson assembly must agree with
    numpy's corrcoef to float tolerance on ANY integer series (and
    return NULL exactly when either side has zero variance)."""
    import numpy as np

    df = spark.createDataFrame(
        [Row(i=i, x=x, y=y) for i, (x, y) in enumerate(rows)]
    )
    sums = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    r_expr = F.when(
        (var_x > 0) & (var_y > 0),
        cov_n.cast("double")
        / (F.sqrt(var_x.cast("double")) * F.sqrt(var_y.cast("double"))),
    )
    got = sums.select(r_expr.alias("r")).collect()[0].r
    xs = np.array([x for x, _ in rows], dtype=float)
    ys = np.array([y for _, y in rows], dtype=float)
    if xs.std() == 0 or ys.std() == 0:
        assert got is None
    else:
        want = float(np.corrcoef(xs, ys)[0, 1])
        assert abs(got - want) < 1e-9, (got, want)


def test_gr4_mid_degree_cap_at_max_is_exact(spark):
    """A midpoint-degree cap at (or above) the graph's max degree must be
    a no-op: identical top-k to the exact query. This pins the escape
    valve's semantics — capping only ever REMOVES hub-centered wedges."""
    from daas_apps_spark.operators.graph import _backbone_edges, _gr4_impl
    from daas_apps_spark.catalog import table
    from tests.conftest import SF_SMOKE

    edges = _backbone_edges(table(spark, SF_SMOKE, "lineitem"))
    adj = edges.select(F.col("u").alias("a")).union(
        edges.select(F.col("v").alias("a"))
    )
    max_deg = adj.groupBy("a").count().agg(F.max("count")).first()[0]
    exact = sorted(map(tuple, _gr4_impl(spark, SF_SMOKE, None).collect()))
    capped = sorted(
        map(tuple, _gr4_impl(spark, SF_SMOKE, int(max_deg)).collect())
    )
    assert exact == capped


def test_gr4_mid_degree_cap_shrinks_candidates(spark):
    """A tight cap must never surface a pair the exact query lacks, and
    every surviving pair's common count can only be <= the exact count."""
    from daas_apps_spark.operators.graph import _gr4_impl
    from tests.conftest import SF_SMOKE

    exact = {
        (r.u, r.v): r.common
        for r in _gr4_impl(spark, SF_SMOKE, None).collect()
    }
    capped = _gr4_impl(spark, SF_SMOKE, 3).collect()
    for r in capped:
        if (r.u, r.v) in exact:
            assert r.common <= exact[(r.u, r.v)]


def test_k3_band_cap_at_max_is_exact(spark):
    """A band-frequency cap at (or above) the max band collision count
    must be a no-op: identical verified near-dup pairs."""
    from daas_apps_spark.operators.dedup import _k3_impl
    from tests.conftest import SF_SMOKE

    exact = sorted(map(tuple, _k3_impl(spark, SF_SMOKE, None).collect()))
    capped = sorted(map(tuple, _k3_impl(spark, SF_SMOKE, 10**6).collect()))
    assert exact == capped


def test_k3_band_cap_shrinks_candidates(spark):
    """A tight cap must only ever REMOVE pairs (every surviving pair is
    in the exact result with the same jaccard)."""
    from daas_apps_spark.operators.dedup import _k3_impl
    from tests.conftest import SF_SMOKE

    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in _k3_impl(spark, SF_SMOKE, None).collect()
    }
    for r in _k3_impl(spark, SF_SMOKE, 2).collect():
        assert exact.get((r.doc_a, r.doc_b)) == r.jaccard


# ---------------------------------------------------------------------------
# Versioned table format (A25/A27): ANY sequence of append / merge /
# delete_range / overwrite / optimize must leave the table equal to a
# trivial in-memory model, every intermediate version must time-travel
# back to the model's snapshot at that point, and a ref tagged mid-way
# must keep reading the tagged snapshot at the end. This is the
# whole-format invariant the per-op unit tests can't see: OP INTERACTIONS
# (merge after delete, optimize between appends, evolution-free paths)
# are where manifest bookkeeping would drift from semantics.

_tbl_rows = st.lists(
    st.tuples(st.integers(0, 6), st.sampled_from(["a", "b", "c"])),
    min_size=0,
    max_size=5,
)
_tbl_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), _tbl_rows),
        st.tuples(st.just("merge"), _tbl_rows),
        st.tuples(
            st.just("delete_range"), st.integers(0, 6), st.integers(0, 6)
        ),
        st.tuples(
            st.just("delete_mor"), st.integers(0, 6), st.integers(0, 6)
        ),
        st.tuples(
            st.just("update"),
            st.sampled_from(["cow", "mor"]),
            st.integers(0, 6),
            st.integers(0, 6),
        ),
        st.tuples(st.just("overwrite"), _tbl_rows),
        st.tuples(st.just("optimize")),
        st.tuples(st.just("restore"), st.integers(0, 4)),
        # metadata-only ops: the model is unchanged, but their
        # INTERACTION with later data ops is the coverage — e.g. a
        # stats allowlist of ["v"] leaves later delete_range("k", ...)
        # and file-level COW merges without k stats (conservative
        # rewrite path), and vector compaction between MOR deletes and
        # a restore stresses dv bookkeeping
        st.tuples(
            st.just("stats_cols"),
            st.sampled_from([["k"], ["v"], None]),
        ),
        st.tuples(st.just("compact_vectors")),
        # clone at a recorded version mid-sequence: the fork must read
        # the tagged snapshot regardless of what the source did since
        st.tuples(st.just("clone_check"), st.integers(0, 4)),
    ),
    min_size=1,
    max_size=5,
)

_seq_counter = [0]


@given(ops=_tbl_ops, tag_at=st.integers(0, 4))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_table_format_matches_model_over_any_op_sequence(
    spark, tmp_path, ops, tag_at
):
    from daas_apps_spark.sources.table_format import VersionedTable

    _seq_counter[0] += 1
    vt = VersionedTable(spark, str(tmp_path / f"t{_seq_counter[0]}"))

    def df(rows):
        return spark.createDataFrame(rows, "k long, v string")

    def snapshot(t, **kw):
        return sorted((r.k, r.v) for r in t.read(**kw).collect())

    model: list[tuple[int, str]] = [(0, "seed"), (1, "seed")]
    vt.append(df(model))  # v1: never start empty (read() errors pre-commit)
    history: dict[int, list] = {1: sorted(model)}
    tagged = None
    for i, op in enumerate(ops):
        if op[0] == "append":
            vt.append(df(op[1]))
            model.extend(op[1])
        elif op[0] == "merge":
            # upsert: ALL rows with a matched key replaced by the updates
            matched = {k for k, _ in op[1]}
            vt.merge(df(op[1]), keys=["k"])
            model = [r for r in model if r[0] not in matched] + list(op[1])
        elif op[0] == "delete_range":
            lo, hi = min(op[1], op[2]), max(op[1], op[2])
            vt.delete_range("k", lo, hi)
            model = [r for r in model if not lo <= r[0] <= hi]
        elif op[0] == "delete_mor":
            # merge-on-read: same semantics as a COW delete, zero data
            # files touched — interactions with merge/optimize/COW ops
            # (vector purge, carry validity) are exactly what this
            # model test exists to catch
            lo, hi = min(op[1], op[2]), max(op[1], op[2])
            vt.delete(f"k BETWEEN {lo} AND {hi}", mode="mor")
            model = [r for r in model if not lo <= r[0] <= hi]
        elif op[0] == "update":
            mode, lo, hi = op[1], min(op[2], op[3]), max(op[2], op[3])
            vt.update(
                f"k BETWEEN {lo} AND {hi}",
                {"v": "concat(v, '+')"},
                mode=mode,
            )
            model = [
                (k, v + "+") if lo <= k <= hi else (k, v)
                for k, v in model
            ]
        elif op[0] == "overwrite":
            vt.overwrite(df(op[1]))
            model = list(op[1])
        elif op[0] == "optimize":
            vt.optimize(target_partitions=1)
        elif op[0] == "stats_cols":
            vt.set_stats_columns(op[1])
        elif op[0] == "compact_vectors":
            vt.compact_vectors()
        elif op[0] == "clone_check":
            versions = sorted(history)
            target = versions[op[1] % len(versions)]
            fork = vt.clone_to(
                str(tmp_path / f"c{_seq_counter[0]}_{i}"), version=target
            )
            assert snapshot(fork) == history[target], (
                f"clone at v{target} after op {i}: {op}"
            )
        elif op[0] == "restore":
            # roll back to a previously recorded version; the model is
            # exactly that snapshot (restore after MOR deletes / merges /
            # optimizes is where manifest+vector state could drift)
            versions = sorted(history)
            target = versions[op[1] % len(versions)]
            vt.restore(version=target)
            model = [tuple(r) for r in history[target]]
        assert snapshot(vt) == sorted(model), f"after op {i}: {op}"
        history[vt.latest_version()] = sorted(model)
        if i == tag_at:
            vt.set_ref("pin")
            tagged = sorted(model)
    # every recorded version time-travels back to its model snapshot
    for v, snap in history.items():
        assert snapshot(vt, version=v) == snap, f"time travel to v{v}"
    if tagged is not None:
        assert snapshot(vt, ref="pin") == tagged


# ---------------------------------------------------------------------------
# MV IVM soundness (A48): for ANY mutation sequence — appends with
# duplicate/NULL-bearing rows, MOR deletes, MOR updates — the
# change-feed-maintained state equals a full recompute at head. The
# signed-count algebra has no data-dependent branches, so adversarial
# little inputs (empty deltas, vanished groups, all-NULL sums, groups
# reappearing) are exactly where a sign error would surface.
# ---------------------------------------------------------------------------
mv_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("insert"),
            st.lists(
                st.tuples(keys, st.one_of(st.none(), vals)),
                min_size=1,
                max_size=6,
            ),
        ),
        st.tuples(st.just("delete"), keys),
        st.tuples(st.just("update"), keys, vals),
    ),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed_rows=st.lists(st.tuples(keys, st.one_of(st.none(), vals)), min_size=0, max_size=6), ops=mv_ops)
def test_mv_ivm_equals_recompute_for_any_mutation_sequence(
    spark, tmp_path_factory, seed_rows, ops
):
    import uuid

    from daas_apps_spark.sources.table_format import (
        VersionedTable,
        additive_aggregate_state,
        maintain_additive_aggregate,
    )

    base = tmp_path_factory.mktemp("mvprop") / uuid.uuid4().hex
    vt = VersionedTable(spark, str(base))
    schema = "k int, x int"
    vt.append(spark.createDataFrame(seed_rows or [(0, None)], schema))
    v0 = vt.latest_version()
    state = additive_aggregate_state(
        vt.read(version=v0), ["k"], "n", {"sx": "coalesce(x, 0)"}
    )
    rows = [tuple(r) for r in state.collect()]
    state = spark.createDataFrame(rows, "k int, n long, sx bigint")
    for op in ops:
        if op[0] == "insert":
            vt.append(spark.createDataFrame(list(op[1]), schema))
        elif op[0] == "delete":
            vt.delete(f"k = {op[1]}", mode="mor")
        else:
            vt.update(f"k = {op[1]}", {"x": str(op[2])}, mode="mor")
    head = vt.latest_version()
    if head > v0:
        state = maintain_additive_aggregate(
            vt, v0, head, ["k"], "n", {"sx": "coalesce(x, 0)"}, state=state
        )
    got = sorted(
        (r.k, r.n, int(r.sx)) for r in state.collect()
    )
    want = sorted(
        (r.k, r.n, int(r.sx))
        for r in additive_aggregate_state(
            vt.read(), ["k"], "n", {"sx": "coalesce(x, 0)"}
        ).collect()
    )
    assert got == want
