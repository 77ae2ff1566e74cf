"""Shared fixtures: one local SparkSession per test run + DuckDB oracle."""

from __future__ import annotations

import os

import pytest

from daas_apps_spark.session import get_spark
from tests.oracle import duck_connect

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("daas_apps_spark-tests", master="local[8]")
    # Strict codegen: a whole-stage-codegen compile error fails the test
    # instead of silently demoting the stage to the interpreted path (a
    # per-task perf cliff that production would hit quietly). The full
    # registry is verified clean under this flag; keep it so any new
    # expression that trips a codegen bug (e.g. ElementAt→GetStructField,
    # see test_plans.py::test_h_struct_battery_compiles_without_fallback)
    # fails loudly here first.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duck_connect(SF_ORACLE)
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_smoke():
    con = duck_connect(SF_SMOKE)
    yield con
    con.close()
