"""Registered pipeline-spec queries (R20 composition, interpreted DAG)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from daas_apps_spark.functions.discipline import sql_dsum
from daas_apps_spark.plans.pipeline_spec import build_pipeline
from daas_apps_spark.registry import register

# The Lambda-phage-analog smoke pipeline (SURVEY §5.2#4): scan → filter →
# broadcast join → dedup → aggregate → sort, declared as data, executed as
# ONE lazy DAG (vs the reference's per-stage collect() barriers).
SEGMENT_REVENUE_SPEC = {
    "source": {"table": "orders"},
    "stages": [
        {"op": "filter", "condition": "o_totalprice > 50000"},
        {"op": "with_columns", "columns": {"order_year": "year(o_orderdate)"}},
        None,  # R17: elided stage (absent config key)
        {"op": "join", "table": "customer", "on": ["o_custkey"], "how": "inner",
         "broadcast": True, "select": ["c_custkey AS o_custkey", "c_mktsegment"]},
        {"op": "dedup", "keys": ["o_custkey", "order_year"],
         "order_by": ["o_totalprice DESC", "o_orderkey ASC"]},
        {"op": "aggregate", "group_by": ["c_mktsegment", "order_year"],
         "aggs": {
             "n_best_orders": "COUNT(*)",
             "revenue": "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)",
         }},
        {"op": "sort", "by": ["c_mktsegment ASC", "order_year ASC"]},
        {"op": "limit", "n": 1000, "enabled": False},  # R17: disabled stage
    ],
}


@register(
    "pipeline_segment_revenue",
    oracle=f"""
    WITH best AS (
        SELECT o.*, c.c_mktsegment, year(o.o_orderdate) AS order_year,
               ROW_NUMBER() OVER (PARTITION BY o.o_custkey, year(o.o_orderdate)
                                  ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS rn
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_totalprice > 50000
    )
    SELECT c_mktsegment, CAST(order_year AS BIGINT) AS order_year,
           CAST(COUNT(*) AS BIGINT) AS n_best_orders,
           {sql_dsum('o_totalprice')} AS revenue
    FROM best WHERE rn = 1
    GROUP BY c_mktsegment, order_year
    """,
    tags=("R20", "R17", "R16", "C5", "E1", "D1"),
)
def pipeline_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spec-interpreted pipeline: best order per (customer, year) → segment
    revenue. Two stages are elided (None / enabled:false), proving R17."""
    from pyspark.sql import functions as F

    df = build_pipeline(spark, SEGMENT_REVENUE_SPEC, sf_dir)
    return df.select(
        "c_mktsegment",
        F.col("order_year").cast("long").alias("order_year"),
        "n_best_orders",
        "revenue",
    )
