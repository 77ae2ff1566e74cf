"""Pre-verify the driver's next correctness window before the driver runs it.

The round driver samples the FIRST ~50 queries in registration order and
hashes TYPED cells at sf0.01. This tool replays exactly that window: for each
of the first N registered queries it runs the Spark plan and the DuckDB
oracle at the given sf_dir, then reports

  * row-count mismatches,
  * column-name set mismatches,
  * value mismatches under the repo's canonical comparator, and
  * int-vs-float column dtype divergence (the typed-cell-hash failure class
    the canonical comparator cannot see — see tools/strict_typecheck.py).

Usage: python tools/preverify_window.py [sf_dir] [n] [offset]

``offset`` replays a FUTURE window (e.g. ``... 50 50`` simulates next
round's slots 50-99 after this round's 50 names go green and rotate out).
"""

from __future__ import annotations

import sys

import pandas as pd

import os
import sys

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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    offset = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    from daas_apps_spark.registry import REGISTRY, get_queries

    # get_queries() applies WINDOW_PRIORITY — the exact order the driver
    # sees through __spark_entry__.queries(); raw REGISTRY order would
    # preview the wrong window
    names = list(get_queries())
    spark = get_spark()
    con = duck_connect(sf_dir)
    bad = 0
    for name in names[offset : offset + n]:
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
    print(f"done: {bad} findings")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
