"""Registry-wide physical-plan lint: every declared query's plan is swept
for scale anti-patterns — the whole-registry generalization of the
hand-pinned assertions in tests/test_plans.py.

Rules (each with an explicit allowlist where the pattern is the point):

- ``CartesianProduct``: an unkeyed all-pairs join — fatal at scale unless
  the query IS a declared cross product over tiny inputs (C8) or a
  broadcast-backed constant join.
- ``BatchEvalPython``: a row-at-a-time Python UDF in the plan — the slow
  path the engine bans outright (Arrow/pandas evaluation shows up as
  ``ArrowEvalPython`` / ``FlatMapGroupsInPandas`` etc. and is allowed).
- ``InMemoryTableScan``: a query that silently depends on a persisted
  relation (the engine's queries must be self-contained; localCheckpoint
  shows as RDDScanExec, which is expected for declared iteratives).

Run as a module for a report, or through tests/test_plans.py's
``test_registry_plan_lint`` which asserts zero violations.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from daas_apps_spark.operators.partitioning import physical_plan
from daas_apps_spark.registry import REGISTRY, _load_all

# Queries whose plans legitimately contain a CartesianProduct: declared
# cross joins over dimension-sized inputs.
CARTESIAN_OK = {"c8_cross_join"}

RULES = (
    ("CartesianProduct", CARTESIAN_OK),
    ("BatchEvalPython", set()),
    ("InMemoryTableScan", set()),
)


def lint(spark, sf_dir: str) -> dict[str, list[str]]:
    """Return {query_name: [violated rules]} over the whole registry."""
    _load_all()
    out: dict[str, list[str]] = {}
    for name, spec in REGISTRY.items():
        try:
            plan = physical_plan(spec.fn(spark, sf_dir))
        except Exception as e:  # pragma: no cover - surfaced by the caller
            out[name] = [f"PLAN-ERROR: {str(e).splitlines()[0][:120]}"]
            continue
        hits = [
            rule
            for rule, allow in RULES
            if rule in plan and name not in allow
        ]
        if hits:
            out[name] = hits
    return out


if __name__ == "__main__":  # pragma: no cover
    from daas_apps_spark.session import get_spark

    spark = get_spark("plan-lint")
    spark.sparkContext.setLogLevel("ERROR")
    violations = lint(spark, "/root/testdata/sf0.001")
    for name, hits in sorted(violations.items()):
        print(f"{name}: {', '.join(hits)}")
    print(f"{len(violations)} violating queries of {len(REGISTRY)}")
