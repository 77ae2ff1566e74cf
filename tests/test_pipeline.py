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


# ---------------------------------------------------------------------------
# File front-end (SparkCaller.main / MiscUtils.loadConfigFile analog)
# ---------------------------------------------------------------------------


def test_json_spec_file_equals_dict_path(spark, tmp_path):
    """The quick-start pipeline run from a JSON spec file is byte-equal to
    the in-memory dict path."""
    import json

    from daas_apps_spark.plans.pipeline_spec import run_pipeline_file

    path = tmp_path / "segment_revenue.json"
    path.write_text(json.dumps(SEGMENT_REVENUE_SPEC))
    from_file = run_pipeline_file(spark, str(path), SF_SMOKE)
    from_dict = run_pipeline(spark, SEGMENT_REVENUE_SPEC, SF_SMOKE)
    assert from_file.schema == from_dict.schema
    assert sorted(map(tuple, from_file.collect())) == sorted(
        map(tuple, from_dict.collect())
    )


def test_properties_spec_file_equals_dict_path(spark, tmp_path):
    """Reference-style flat key=value spec: same pipeline, same results."""
    from daas_apps_spark.plans.pipeline_spec import load_spec, run_pipeline_file

    props = """
    # best-order revenue per segment (flat subset)
    source.table=orders
    stage.1.op=filter
    stage.1.condition=o_totalprice > 50000
    stage.2.op=with_columns
    stage.2.col.order_year=year(o_orderdate)
    stage.3.op=join
    stage.3.table=customer
    stage.3.on=o_custkey
    stage.3.broadcast=true
    stage.3.select=c_custkey AS o_custkey, c_mktsegment
    stage.4.op=aggregate
    stage.4.group_by=c_mktsegment,order_year
    stage.4.agg.n_orders=COUNT(*)
    stage.5.op=sort
    stage.5.by=c_mktsegment ASC, order_year ASC
    stage.6.op=limit
    stage.6.n=1000
    """
    path = tmp_path / "segment.properties"
    path.write_text("\n".join(line.strip() for line in props.splitlines()))
    spec = load_spec(str(path))
    assert spec["stages"][0] == {"op": "filter", "condition": "o_totalprice > 50000"}
    assert spec["stages"][2]["on"] == ["o_custkey"]
    assert spec["stages"][2]["broadcast"] is True
    assert spec["stages"][3]["aggs"] == {"n_orders": "COUNT(*)"}
    assert spec["stages"][5] == {"op": "limit", "n": 1000}
    df = run_pipeline_file(spark, str(path), SF_SMOKE)
    dict_df = run_pipeline(spark, spec, SF_SMOKE)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, dict_df.collect()))


def test_properties_sink_roundtrip(spark, tmp_path):
    from daas_apps_spark.plans.pipeline_spec import run_pipeline_file

    out = tmp_path / "out"
    path = tmp_path / "sink.properties"
    path.write_text(
        "source.table=region\n"
        "stage.1.op=select\n"
        "stage.1.columns=r_regionkey,r_name\n"
        f"sink.path={out}\n"
        "sink.mode=overwrite\n"
    )
    assert run_pipeline_file(spark, str(path), SF_SMOKE) is None
    assert spark.read.parquet(str(out)).count() == 5


def test_sample_stage_deterministic_and_validated(spark, tmp_path):
    """The 'sample' op keeps the K9 hash-threshold subset — identical to the
    registered k9_hash_sample query — and rejects bad permille up front."""
    from daas_apps_spark.plans.pipeline_spec import (
        PipelineSpecError,
        run_pipeline_file,
        validate_pipeline,
    )
    from daas_apps_spark.registry import REGISTRY, _load_all

    _load_all()
    path = tmp_path / "sample.properties"
    path.write_text(
        "source.table=documents\n"
        "stage.1.op=sample\n"
        "stage.1.key=doc_id\n"
        "stage.1.permille=80\n"
        "stage.2.op=select\n"
        "stage.2.columns=doc_id\n"
    )
    got = {r.doc_id for r in run_pipeline_file(spark, str(path), SF_SMOKE).collect()}
    want = {
        r.doc_id for r in REGISTRY["k9_hash_sample"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want and got
    with pytest.raises(PipelineSpecError, match="permille"):
        validate_pipeline(
            {"source": {"table": "documents"},
             "stages": [{"op": "sample", "key": "doc_id", "permille": 2000}]}
        )


def test_cli_validate_only(tmp_path, capsys):
    """--validate-only checks the spec without touching Spark."""
    from daas_apps_spark.plans.pipeline_spec import main

    path = tmp_path / "ok.properties"
    path.write_text("source.table=nation\nstage.1.op=filter\nstage.1.condition=1=1\n")
    assert main([str(path), SF_SMOKE, "--validate-only"]) == 0
    assert "ok" in capsys.readouterr().out


# ---------------------------------------------------------------------------
# Analyzer-style validation: spec errors BEFORE any job runs
# ---------------------------------------------------------------------------


def test_validation_catches_everything_at_once():
    """Unknown source table, join typo, missing param, bad sink mode, and
    the contradictory sink pair — one raise, all listed, no SparkSession."""
    from daas_apps_spark.plans.pipeline_spec import (
        PipelineSpecError,
        validate_pipeline,
    )

    spec = {
        "source": {"table": "lineitme"},  # typo
        "stages": [
            {"op": "join", "table": "ordres"},  # typo + missing 'on'
            {"op": "filter"},  # missing 'condition'
            {"op": "limit", "n": "ten"},  # non-int
        ],
        "sink": {
            "path": "/tmp/x",
            "mode": "overwite",  # typo
            "partition_by": ["a"],
            "single_file": True,
        },
    }
    with pytest.raises(PipelineSpecError) as ei:
        validate_pipeline(spec)
    msg = str(ei.value)
    for frag in (
        "lineitme",
        "ordres",
        "requires 'on'",
        "requires 'condition'",
        "must be an int",
        "overwite",
        "contradictory",
    ):
        assert frag in msg, f"missing {frag!r} in:\n{msg}"


def test_validation_checks_fixture_files_exist():
    from daas_apps_spark.plans.pipeline_spec import (
        PipelineSpecError,
        validate_pipeline,
    )

    spec = {"source": {"table": "nation"}}
    validate_pipeline(spec, SF_SMOKE)  # file exists → fine
    with pytest.raises(PipelineSpecError, match="no parquet file"):
        validate_pipeline(spec, "/nonexistent/dir")


def test_validation_runs_before_execution(spark, tmp_path):
    """A bad spec with a sink must fail BEFORE writing anything."""
    from daas_apps_spark.plans.pipeline_spec import PipelineSpecError, run_pipeline

    out = tmp_path / "never_written"
    spec = {
        "source": {"table": "region"},
        "stages": [{"op": "join", "table": "nopetable", "on": ["x"]}],
        "sink": {"path": str(out)},
    }
    with pytest.raises(PipelineSpecError, match="nopetable"):
        run_pipeline(spark, spec, SF_SMOKE)
    assert not out.exists()


def test_window_stage_matches_handwritten(spark):
    """The `window` stage reproduces a handwritten rank + running-sum
    query, including the ROWS frame."""
    from pyspark.sql import Window

    spec = {
        "source": {"table": "orders"},
        "stages": [
            {
                "op": "window",
                "partition_by": ["o_custkey"],
                "order_by": ["o_orderdate ASC", "o_orderkey ASC"],
                "cols": {"rn": "row_number()"},
            },
            {
                "op": "window",
                "partition_by": ["o_custkey"],
                "order_by": ["o_orderdate ASC", "o_orderkey ASC"],
                "frame_rows": [None, 0],
                "cols": {"run_n": "count(1)"},
            },
            {"op": "filter", "condition": "rn <= 3"},
            {"op": "select", "columns": ["o_orderkey", "rn", "run_n"]},
        ],
    }
    from daas_apps_spark.catalog import table

    got = run_pipeline(spark, spec, SF_SMOKE)
    o = table(spark, SF_SMOKE, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    want = (
        o.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "run_n",
            F.count(F.lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .filter(F.col("rn") <= 3)
        .select("o_orderkey", "rn", "run_n")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_window_stage_properties_and_validation(spark, tmp_path):
    """Properties grammar carries window stages (stage.N.win.<name>), and
    the validator rejects malformed frames/cols before any job runs."""
    from daas_apps_spark.catalog import table
    from daas_apps_spark.plans.pipeline_spec import (
        PipelineSpecError,
        run_pipeline_file,
        validate_pipeline,
    )

    props = tmp_path / "win.properties"
    props.write_text(
        "source.table=orders\n"
        "stage.0.op=window\n"
        "stage.0.partition_by=o_custkey\n"
        "stage.0.order_by=o_orderdate ASC,o_orderkey ASC\n"
        "stage.0.win.rn=row_number()\n"
        "stage.1.op=filter\n"
        "stage.1.condition=rn = 1\n"
    )
    df = run_pipeline_file(spark, str(props), SF_SMOKE)
    n_customers = table(spark, SF_SMOKE, "orders").select("o_custkey").distinct().count()
    assert df.count() == n_customers

    bad = {
        "source": {"table": "orders"},
        "stages": [
            {
                "op": "window",
                "partition_by": ["o_custkey"],
                "order_by": ["o_orderkey"],
                "cols": {},
                "frame_rows": [1, 2, 3],
            }
        ],
    }
    with pytest.raises(PipelineSpecError) as err:
        validate_pipeline(bad)
    assert "cols" in str(err.value) and "frame_rows" in str(err.value)


def test_asof_join_stage_matches_direct_call(spark):
    """The declarative asof_join stage must produce exactly the helper's
    result (same single-shuffle plan under the spec layer)."""
    from daas_apps_spark.catalog import table
    from daas_apps_spark.operators.asof import asof_join

    spec = {
        "source": {"table": "events"},
        "stages": [
            {"op": "filter", "condition": "event_type = 'purchase'"},
            {
                "op": "select",
                "columns": ["event_id AS purchase_id", "user_id", "ts"],
            },
            {
                "op": "asof_join",
                "table": "events",
                "right_filter": "event_type = 'click'",
                "on": ["user_id"],
                "left_time": "ts",
                "right_time": "ts",
                "payload": ["event_id"],
                "how": "left",
            },
        ],
    }
    got = build_pipeline(spark, spec, SF_SMOKE)

    e = table(spark, SF_SMOKE, "events")
    want = asof_join(
        e.filter("event_type = 'purchase'").selectExpr(
            "event_id AS purchase_id", "user_id", "ts"
        ),
        e.filter("event_type = 'click'"),
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        right_payload=["event_id"],
        how="left",
    )
    gp = got.toPandas().sort_values("purchase_id").reset_index(drop=True)
    wp = want.toPandas().sort_values("purchase_id").reset_index(drop=True)
    cols = sorted(gp.columns)
    assert cols == sorted(wp.columns)
    assert gp[cols].equals(wp[cols])


def test_asof_join_stage_missing_params_rejected(spark):
    """Spec validation rejects an asof_join stage with missing required
    params BEFORE any job runs."""
    import pytest
    from daas_apps_spark.plans.pipeline_spec import validate_pipeline

    bad = {
        "source": {"table": "events"},
        "stages": [{"op": "asof_join", "table": "events", "on": ["user_id"]}],
    }
    with pytest.raises(ValueError) as ei:
        validate_pipeline(bad, SF_SMOKE)
    assert "left_time" in str(ei.value)


def test_asof_join_stage_unknown_table_rejected(spark):
    """And separately: an unknown right-table name is a spec error, not a
    mid-run Spark failure (the join-stage check applies to asof_join)."""
    import pytest
    from daas_apps_spark.plans.pipeline_spec import validate_pipeline

    bad = {
        "source": {"table": "events"},
        "stages": [
            {
                "op": "asof_join",
                "table": "nope",
                "on": ["user_id"],
                "left_time": "ts",
                "right_time": "ts",
                "payload": ["event_id"],
            }
        ],
    }
    with pytest.raises(ValueError) as ei:
        validate_pipeline(bad, SF_SMOKE)
    assert "nope" in str(ei.value)


def test_versioned_table_sink_and_source_stages(spark, tmp_path):
    """The lakehouse arc driven entirely from specs: a pipeline COMMITS its
    result as a version of the table format (append → append → keyed
    merge), and a second spec READS the table — latest or time-traveled —
    as its source. The spec layer composes with time travel exactly like
    the library path (tests/test_table_format.py::test_lakehouse_end_to_end)."""
    from daas_apps_spark.catalog import table
    from daas_apps_spark.sources.table_format import VersionedTable

    tbl = str(tmp_path / "vt")
    base = {
        "source": {"table": "nation"},
        "stages": [
            {"op": "select", "columns": ["n_nationkey AS k", "n_name AS v"]},
        ],
    }
    run_pipeline(
        spark,
        {**base, "sink": {"versioned_table": tbl, "mode": "append"}},
        SF_SMOKE,
    )
    run_pipeline(
        spark,
        {
            "source": {"table": "region"},
            "stages": [
                {"op": "select", "columns": ["r_regionkey + 100 AS k", "r_name AS v"]},
            ],
            "sink": {"versioned_table": tbl, "mode": "append"},
        },
        SF_SMOKE,
    )
    run_pipeline(
        spark,
        {
            "source": {"table": "region"},
            "stages": [
                {"op": "select", "columns": ["r_regionkey + 100 AS k", "upper(r_name) AS v"]},
            ],
            "sink": {
                "versioned_table": tbl,
                "mode": "merge",
                "merge_keys": ["k"],
            },
        },
        SF_SMOKE,
    )
    vt = VersionedTable(spark, tbl)
    assert vt.latest_version() == 3
    n_nations = table(spark, SF_SMOKE, "nation").count()
    n_regions = table(spark, SF_SMOKE, "region").count()
    latest = run_pipeline(
        spark, {"source": {"versioned_table": tbl}}, SF_SMOKE
    ).toPandas()
    assert len(latest) == n_nations + n_regions
    # the merge upper-cased every region row
    assert all(v == v.upper() for v in latest[latest.k >= 100].v)
    # time travel through the spec source: version 1 predates the regions
    v1 = run_pipeline(
        spark,
        {"source": {"versioned_table": tbl, "version": 1}},
        SF_SMOKE,
    ).toPandas()
    assert len(v1) == n_nations


def test_versioned_table_sink_validation():
    from daas_apps_spark.plans.pipeline_spec import (
        PipelineSpecError,
        validate_pipeline,
    )

    with pytest.raises(PipelineSpecError, match="merge_keys"):
        validate_pipeline(
            {
                "source": {"table": "nation"},
                "sink": {"versioned_table": "/tmp/x", "mode": "merge"},
            }
        )
    with pytest.raises(PipelineSpecError, match="versioned-table mode"):
        validate_pipeline(
            {
                "source": {"table": "nation"},
                "sink": {"versioned_table": "/tmp/x", "mode": "errorifexists"},
            }
        )
    with pytest.raises(PipelineSpecError, match="version"):
        validate_pipeline(
            {"source": {"versioned_table": "/tmp/x", "version": "one"}}
        )


def test_stream_pipeline_spec_equals_batch(spark, tmp_path):
    """The declarative STREAMING pipeline: stateless stages + an additive
    aggregate merged into the versioned table per micro-batch must end at
    exactly the batch pipeline's answer, (stream_id, batch_id)-guarded —
    and a drained re-run on the same checkpoint commits nothing."""
    from daas_apps_spark.catalog import table
    from daas_apps_spark.plans.pipeline_spec import run_stream_pipeline
    from daas_apps_spark.sources.table_format import VersionedTable
    from tests.conftest import SF_SMOKE

    src = str(tmp_path / "events_json")
    table(spark, SF_SMOKE, "events").repartition(4).write.mode(
        "overwrite"
    ).json(src)
    tbl = str(tmp_path / "vt")
    ck = str(tmp_path / "ck")
    spec = {
        "stream_source": {
            "path": src,
            "schema": "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
            "max_files_per_trigger": 2,
        },
        "stages": [
            {"op": "filter", "condition": "event_type IS NOT NULL"},
            {"op": "with_columns", "columns": {"v100": "CAST(value * 100 AS BIGINT)"}},
        ],
        "aggregate": {
            "group_by": ["event_type"],
            "aggs": {"n": "count(1)", "v_sum": "sum(v100)"},
            "add": ["n", "v_sum"],
        },
        "stream_sink": {"versioned_table": tbl},
    }
    run_stream_pipeline(spark, spec, ck)
    vt = VersionedTable(spark, tbl)
    got = {
        r.event_type: (r.n, r.v_sum) for r in vt.read().collect()
    }
    batch = (
        spark.read.schema(spec["stream_source"]["schema"])
        .json(src)
        .filter("event_type IS NOT NULL")
        .selectExpr("*", "CAST(value * 100 AS BIGINT) AS v100")
        .groupBy("event_type")
        .agg(F.expr("count(1)").alias("n"), F.expr("sum(v100)").alias("v_sum"))
    )
    want = {r.event_type: (r.n, r.v_sum) for r in batch.collect()}
    assert got == want
    n_versions = vt.latest_version()
    assert n_versions >= 2  # maxFilesPerTrigger=2 over 4 files
    # drained re-run, same checkpoint: exactly-once guard holds
    run_stream_pipeline(spark, spec, ck)
    assert vt.latest_version() == n_versions


def test_stream_pipeline_spec_validation():
    from daas_apps_spark.plans.pipeline_spec import (
        PipelineSpecError,
        validate_stream_pipeline,
    )

    with pytest.raises(PipelineSpecError, match="stateless"):
        validate_stream_pipeline(
            {
                "stream_source": {"path": "/x", "schema": "a int"},
                "stages": [{"op": "sort", "by": ["a"]}],
                "aggregate": {"group_by": ["a"], "aggs": {"n": "count(1)"}, "add": ["n"]},
                "stream_sink": {"versioned_table": "/t"},
            }
        )
    with pytest.raises(PipelineSpecError, match="additive"):
        validate_stream_pipeline(
            {
                "stream_source": {"path": "/x", "schema": "a int"},
                "aggregate": {"group_by": ["a"], "aggs": {"m": "avg(a)"}, "add": []},
                "stream_sink": {"versioned_table": "/t"},
            }
        )
    with pytest.raises(PipelineSpecError, match="stream_source"):
        validate_stream_pipeline({"aggregate": {"group_by": ["a"], "aggs": {"n": "count(1)"}, "add": ["n"]}, "stream_sink": {"versioned_table": "/t"}})
