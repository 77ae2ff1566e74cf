"""t2: every declared query hash-matches its DuckDB oracle at sf0.01.

This mirrors the driver's CORRECTNESS gate exactly (row count + schema +
order-insensitive values), so a green run here predicts a green
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

from daas_apps_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle import run_compare

_load_all()

ORACLE_SPECS = [s for s in REGISTRY.values() if s.oracle]
ROWS_ONLY_SPECS = [s for s in REGISTRY.values() if not s.oracle]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity(spark, duck, spec):
    run_compare(spark, duck, spec, SF_ORACLE)


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_smoke(spark, spec):
    df = spec.fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
