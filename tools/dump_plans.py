#!/usr/bin/env python
"""Dump the AQE-final `.explain("formatted")` plan of each headline bench
query to ``plans/<tag>/<query>_<suffix>.txt`` — the before/after plan
evidence the optimization rounds commit (judge checks plan claims against
these files). Usage::

    python tools/dump_plans.py r12 before [query ...]

With no query names, dumps every bench query. Each query is EXECUTED once
(noop-style toPandas) so the captured plan is the AQE-final one.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from daas_apps_spark.operators.partitioning import physical_plan
from daas_apps_spark.registry import REGISTRY, _load_all
from daas_apps_spark.session import get_spark
from daas_apps_spark.sources.layout import (
    compact_dir,
    drop_persisted_rdds,
    tune_scan_confs,
)


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    _load_all()
    sf = compact_dir(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    tune_scan_confs(spark)
    specs = sorted((s for s in REGISTRY.values() if s.bench), key=lambda s: s.name)
    if names:
        specs = [REGISTRY[n] for n in names]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for spec in specs:
        df = spec.fn(spark, sf)
        df.toPandas()  # execute so the plan below is AQE-final
        plan = physical_plan(df)
        path = os.path.join(out_dir, f"{spec.name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{spec.name}: {len(plan.splitlines())} lines -> {path}")
        drop_persisted_rdds(spark)
    spark.stop()


if __name__ == "__main__":
    main()
