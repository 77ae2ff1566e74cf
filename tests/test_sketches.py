"""ε-accuracy checks for the approximate (sketch) aggregates — the queries
declared ``oracle=None`` because their outputs are approximate by
construction (D4 HLL++, D12 Greenwald-Khanna). The contract here is the
sketch's published error bound, checked against the exact value computed
in the same query.
"""

from __future__ import annotations

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
