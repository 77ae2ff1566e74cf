"""Driver-contract invariants over the whole registry: properties the
verification harness assumes about EVERY declared query, checked wholesale so
a new query can't silently violate them.
"""

from __future__ import annotations

import pytest

from daas_apps_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_SMOKE

_load_all()
ALL = sorted(REGISTRY.values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", ALL, ids=lambda s: s.name)
def test_output_columns_unique_and_named(spark, spec):
    """The driver sorts columns BY NAME before hashing — duplicate or
    auto-generated names (e.g. 'sum(x)') would corrupt or fail the compare."""
    df = spec.fn(spark, SF_SMOKE)
    names = [f.name for f in df.schema.fields]
    assert len(names) == len(set(names)), f"duplicate columns: {names}"
    for n in names:
        assert "(" not in n and ")" not in n, f"unaliased aggregate column: {n}"


def test_every_oracle_names_a_query():
    for name, spec in REGISTRY.items():
        assert spec.fn is not None, name
        if spec.oracle is not None:
            assert spec.oracle.strip(), f"{name}: empty oracle SQL"
