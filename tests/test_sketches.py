"""ε-accuracy checks for the approximate (sketch) aggregates — the queries
declared ``oracle=None`` because their outputs are approximate by
construction (D4 HLL++, D12 Greenwald-Khanna). The contract here is the
sketch's published error bound, checked against the exact value computed
in the same query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from daas_apps_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_ORACLE

_load_all()


def test_d4_hll_within_declared_rsd(spark):
    row = REGISTRY["d4_approx_count_distinct"].fn(spark, SF_ORACLE).collect()[0]
    # rsd=0.02 declared; allow 5 sigma
    assert abs(row.approx_orders - row.exact_orders) <= 0.10 * row.exact_orders


def test_d12_gk_percentiles_within_accuracy(spark):
    rows = REGISTRY["d12_approx_percentile"].fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        # GK with accuracy=1000 bounds rank error by n/1000 per group; on
        # continuous-ish price data that is a tight relative value error —
        # allow 2% of the exact value (loose vs the bound, tight vs bugs).
        pairs = [
            (r.approx_p25, r.exact_p25),
            (r.approx_p50, r.exact_p50),
            (r.approx_p75, r.exact_p75),
        ]
        for approx, exact in pairs:
            assert abs(approx - exact) <= 0.02 * abs(exact) + 1e-9, (
                r.o_orderstatus,
                approx,
                exact,
            )


def test_d17_hll_estimates_within_epsilon_and_merge_consistent(spark):
    rows = REGISTRY["d17_hll_sketch"].fn(spark, SF_ORACLE).collect()
    per = [r for r in rows if r["exact_distinct"] is not None]
    merged = [r for r in rows if r["exact_distinct"] is None]
    assert per and len(merged) == 1
    # per-group estimates within the default-lgK HLL error envelope
    for r in per:
        assert abs(r["est_distinct"] - r["exact_distinct"]) <= max(
            3, 0.05 * r["exact_distinct"]
        ), r
    # union-of-sketches ≈ sketch-of-union (sparse→dense promotion during
    # union can shift the register set by a hair, so ε not equality)
    from daas_apps_spark.catalog import table

    o = table(spark, SF_ORACLE, "orders")
    direct = o.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))").cast("long")
    ).collect()[0][0]
    exact_all = o.select("o_custkey").distinct().count()
    assert abs(merged[0]["est_distinct"] - direct) <= max(3, 0.01 * direct)
    assert abs(merged[0]["est_distinct"] - exact_all) <= max(
        3, 0.05 * exact_all
    )


def test_d19_theta_exact_regime_pinned_by_oracle(spark):
    # The DuckDB oracle pins exact set counts, so here just assert the
    # internal consistency identities that must hold in the exact regime:
    # |A∪B| = |A| + |B| − |A∩B| and |A\B| = |A| − |A∩B|.
    rows = {
        r["set_op"]: r["est_distinct"]
        for r in REGISTRY["d19_theta_sketch_setops"].fn(spark, SF_ORACLE).collect()
    }
    assert rows["A_union_B"] == rows["A"] + rows["B"] - rows["A_intersect_B"]
    assert rows["A_minus_B"] == rows["A"] - rows["A_intersect_B"]
    assert rows["A_intersect_B"] > 0  # the two predicates genuinely overlap


def test_d20_kll_quantiles_within_rank_epsilon(spark):
    # KLL k=200 bounds rank error at ~1.65% (99% confidence). Convert to a
    # value tolerance by checking the estimate's RANK against the exact
    # order statistics: the estimated quantile must sit within 4% of the
    # target rank in each group's sorted data (loose vs the bound).
    from daas_apps_spark.catalog import table

    rows = REGISTRY["d20_kll_quantile_sketch"].fn(spark, SF_ORACLE).collect()
    per = [r for r in rows if r["p50_exact"] is not None]
    merged = [r for r in rows if r["p50_exact"] is None]
    assert per and len(merged) == 1
    o = table(spark, SF_ORACLE, "orders").select("o_orderstatus", "o_totalprice")
    import pandas as pd

    pdf = o.toPandas()
    def rank_of(series, value):
        return (series <= value).mean()

    for r in per:
        grp = pdf[pdf.o_orderstatus == r.o_orderstatus].o_totalprice
        for q, est in ((0.25, r.p25_est), (0.5, r.p50_est), (0.75, r.p75_est)):
            assert abs(rank_of(grp, est) - q) <= 0.04, (r.o_orderstatus, q, est)
    allv = pdf.o_totalprice
    m = merged[0]
    for q, est in ((0.25, m.p25_est), (0.5, m.p50_est), (0.75, m.p75_est)):
        assert abs(rank_of(allv, est) - q) <= 0.04, ("merged", q, est)
    assert m.n_rows == len(allv)
