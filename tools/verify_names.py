"""Oracle cross-check for an explicit list of registered query names.

Same comparator as tools/preverify_window.py (row count, column set,
canonical cells, int-vs-float dtype divergence) but takes names on the
command line instead of a window slice — the focused re-verification loop
optimization rounds need after restructuring a shared operator.

Usage: python tools/verify_names.py <sf_dir> <name> [<name> ...]
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from daas_apps_spark.session import get_spark
from daas_apps_spark.verify import canonicalize, duck_connect


def _kind(dtype) -> str:
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    return "other"


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from daas_apps_spark.registry import REGISTRY, get_queries

    get_queries()
    spark = get_spark()
    con = duck_connect(sf_dir)
    bad = 0
    for name in names:
        spec = REGISTRY[name]
        if not spec.oracle:
            print(f"SKIP {name}: rows-only (no oracle)")
            continue
        try:
            spdf = spec.fn(spark, sf_dir).toPandas()
            opdf = con.sql(spec.oracle).df()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"ERR  {name}: {str(e).splitlines()[0][:160]}")
            bad += 1
            continue
        if len(spdf) != len(opdf):
            print(f"ROWS {name}: spark={len(spdf)} oracle={len(opdf)}")
            bad += 1
            continue
        scols, ocols = set(spdf.columns), set(opdf.columns)
        if scols != ocols:
            print(f"COLS {name}: spark-only={sorted(scols - ocols)} "
                  f"oracle-only={sorted(ocols - scols)}")
            bad += 1
            continue
        if canonicalize(spdf) != canonicalize(opdf):
            print(f"VALS {name}: canonical cell mismatch")
            bad += 1
            continue
        typed_bad = False
        for c in sorted(scols):
            sk, ok = _kind(spdf[c].dtype), _kind(opdf[c].dtype)
            if len(spdf) == 0:
                continue
            if {sk, ok} == {"int", "float"} and not (
                spdf[c].isna().any() or opdf[c].isna().any()
            ):
                print(f"TYPE {name}.{c}: spark={spdf[c].dtype} "
                      f"oracle={opdf[c].dtype}")
                typed_bad = True
        if typed_bad:
            bad += 1
        else:
            print(f"OK   {name} ({len(spdf)} rows)")
    print(f"done: {len(names)} checked, {bad} findings")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
