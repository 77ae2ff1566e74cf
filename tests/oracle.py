"""DuckDB-oracle comparison harness (SURVEY.md §5.2 t2).

Runs a registered QuerySpec through PySpark and its declared oracle SQL
through DuckDB on the same parquet fixtures, canonicalizes both results
(FIXTURES.md rules: sorted columns, sorted rows, µs timestamps, float64
decimals), and asserts exact cell-level equality — a strict proxy for the
driver's order-insensitive value-hash.
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


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    assert s_cols == o_cols, f"{name}: column mismatch spark={s_cols} oracle={o_cols}"
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows = canonicalize(spark_pdf)
    o_rows = canonicalize(oracle_pdf)
    if s_rows == o_rows:
        return
    # Build a readable diff of the first few mismatching rows.
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
    sdf = spec.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    oracle_pdf = con.sql(spec.oracle).df()
    compare_frames(spark_pdf, oracle_pdf, spec.name)
