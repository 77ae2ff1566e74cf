"""Pipeline-spec interpreter tests: elision (R17), sink semantics (R16)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from daas_apps_spark.operators.pipelines import SEGMENT_REVENUE_SPEC
from daas_apps_spark.plans.pipeline_spec import build_pipeline, run_pipeline
from tests.conftest import SF_SMOKE


def test_stage_elision_is_identity(spark):
    spec = {
        "source": {"table": "nation"},
        "stages": [
            None,
            {"op": "filter", "condition": "n_regionkey = 0", "enabled": False},
        ],
    }
    df = build_pipeline(spark, spec, SF_SMOKE)
    assert df.count() == 25  # both stages elided → full table


def test_unknown_stage_rejected(spark):
    spec = {"source": {"table": "nation"}, "stages": [{"op": "frobnicate"}]}
    with pytest.raises(ValueError, match="unknown op"):
        build_pipeline(spark, spec, SF_SMOKE)


def test_sink_errorifexists(spark, tmp_path):
    """R16: write-then-refuse-overwrite (FileMover.java:17-26 semantics)."""
    out = str(tmp_path / "sink")
    spec = {
        "source": {"table": "region"},
        "stages": [{"op": "select", "columns": ["r_regionkey", "r_name"]}],
        "sink": {"path": out},
    }
    assert run_pipeline(spark, spec, SF_SMOKE) is None
    assert spark.read.parquet(out).count() == 5
    with pytest.raises(Exception, match="already exists|LOCATION_ALREADY_EXISTS"):
        run_pipeline(spark, spec, SF_SMOKE)


def test_spec_pipeline_matches_handwritten(spark):
    df = build_pipeline(spark, SEGMENT_REVENUE_SPEC, SF_SMOKE)
    assert df.count() > 0
    assert {"c_mktsegment", "order_year", "n_best_orders", "revenue"} <= set(df.columns)
