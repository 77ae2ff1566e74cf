"""Driver-strict dtype sweep: flag int-vs-float column mismatches.

The driver's correctness gate hashes TYPED cells, so a DuckDB column that
widens to float64 (e.g. SUM(BIGINT) -> HUGEINT -> float64 in pandas) red-rows
a query whose values are cell-identical to Spark's int64. The repo's own
comparator (daas_apps_spark/verify.py) canonicalizes 17 == 17.0, so it cannot
see this class. This sweep runs EVERY oracle-checked registered query on both
engines at a small scale factor and reports any column where one side lands
in an integer pandas dtype and the other in a float dtype — the exact family
behind round-1's b2/b6 and round-2's t15 red rows.

Usage: python tools/strict_typecheck.py [sf_dir]
"""

from __future__ import annotations

import sys

import pandas as pd

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from daas_apps_spark.session import get_spark
from daas_apps_spark.verify import duck_connect


def _kind(dtype) -> str:
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "ts"
    return "other"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from daas_apps_spark.registry import REGISTRY, _load_all

    _load_all()
    spark = get_spark()
    con = duck_connect(sf_dir)
    bad = 0
    for name, spec in REGISTRY.items():
        if not spec.oracle:
            continue
        try:
            spdf = spec.fn(spark, sf_dir).toPandas()
            opdf = con.sql(spec.oracle).df()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"ERR  {name}: {str(e).splitlines()[0][:160]}")
            bad += 1
            continue
        scols, ocols = set(spdf.columns), set(opdf.columns)
        if scols != ocols:
            print(f"COLS {name}: spark-only={sorted(scols - ocols)} "
                  f"oracle-only={sorted(ocols - scols)}")
            bad += 1
            continue
        for c in sorted(scols):
            sk, ok = _kind(spdf[c].dtype), _kind(opdf[c].dtype)
            # empty float64 columns on either side are indistinguishable
            # from all-NULL int columns — skip only if truly empty
            if len(spdf) == 0:
                continue
            if {sk, ok} == {"int", "float"} and not (
                spdf[c].isna().any() or opdf[c].isna().any()
            ):
                print(f"TYPE {name}.{c}: spark={spdf[c].dtype} "
                      f"oracle={opdf[c].dtype}")
                bad += 1
    print(f"done: {bad} findings")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
