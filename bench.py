#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing = full query wall-clock including the collect of results (small result
sets by construction — every headline query aggregates or limits). A first
untimed warmup query amortizes JVM/codegen startup so numbers reflect steady
state, matching how the reference benchmarked means of repeated runs
(genomics/README.md:108).
"""

from __future__ import annotations

import json
import os
import sys
import time

from daas_apps_spark.registry import REGISTRY, _load_all
from daas_apps_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    _load_all()
    specs = sorted(
        (s for s in REGISTRY.values() if s.bench), key=lambda s: s.name
    )
    spark = get_spark("daas_apps_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: run the first spec once untimed (JVM + codegen + parquet footer).
    if specs:
        specs[0].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for spec in specs:
        t0 = time.perf_counter()
        rows = spec.fn(spark, sf_dir).collect()
        timings[spec.name] = round(time.perf_counter() - t0, 4)
        assert rows is not None

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wallclock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
