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
