"""Engine self-verification: run a registered query through PySpark AND its
declared DuckDB oracle on the same parquet fixtures, canonicalize both
results (FIXTURES.md rules: sorted columns, sorted rows, µs timestamps,
float64 decimals), and compare cell-for-cell — the package-level core
behind both the t2 test suite (tests/oracle.py) and the
``python -m daas_apps_spark verify`` CLI.

This is the engine's answer to the reference's "validate the pipeline by
re-running the canonical tool" workflow (genomics/README.md accuracy
check): the oracle SQL is the canonical tool, and verification is a
first-class, user-invokable operation rather than a CI-only artifact.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from daas_apps_spark.catalog import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with every fixture table registered as a view."""
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    """Map a cell to a canonical, orderable, hashable python value."""
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.floor("us").isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, np.bool_):
        return bool(v)
    return v


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    """Sorted-columns, sorted-rows list of canonical tuples."""
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
    return rows


def compare_frames(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str
) -> None:
    """Raise AssertionError with a readable diff unless frames match."""
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    assert s_cols == o_cols, (
        f"{name}: column mismatch spark={s_cols} oracle={o_cols}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows = canonicalize(spark_pdf)
    o_rows = canonicalize(oracle_pdf)
    if s_rows == o_rows:
        return
    diffs = []
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if sr != orow:
            diffs.append(f"  row {i}:\n    spark : {sr}\n    oracle: {orow}")
        if len(diffs) >= 5:
            break
    raise AssertionError(
        f"{name}: value mismatch over columns {s_cols} ({len(s_rows)} rows)\n"
        + "\n".join(diffs)
    )


def run_compare(spark, con, spec, sf_dir: str) -> None:
    """Execute one QuerySpec on both engines and compare."""
    sdf = spec.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    oracle_pdf = con.sql(spec.oracle).df()
    compare_frames(spark_pdf, oracle_pdf, spec.name)


def verify_queries(
    spark, sf_dir: str, names: list[str] | None = None
) -> dict[str, str | None]:
    """Verify queries against their oracles.

    Returns {name: None} for passes, {name: "reason"} for failures;
    oracle-less queries are checked rows-only (run + count >= 0).
    """
    from daas_apps_spark.registry import REGISTRY, _load_all

    _load_all()
    specs = [REGISTRY[n] for n in names] if names else list(REGISTRY.values())
    con = duck_connect(sf_dir)
    out: dict[str, str | None] = {}
    for spec in specs:
        try:
            if spec.oracle:
                run_compare(spark, con, spec, sf_dir)
            else:
                assert spec.fn(spark, sf_dir).count() >= 0
            out[spec.name] = None
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            out[spec.name] = str(e).splitlines()[0][:200]
    return out
