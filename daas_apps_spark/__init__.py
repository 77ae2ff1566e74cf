"""daas_apps_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the capability closure of the
UNINETT/daas-apps reference pipeline (scan, sort, dedup, broadcast-join,
group-wise transform, aggregate, merge/sink — see SURVEY.md §2), widened to a
full relational operator surface plus LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) and Structured Streaming.

Everything is declared through the DataFrame/SQL API so Catalyst/Tungsten and
AQE own the physical plan; Python UDFs appear only where built-ins genuinely
cannot express the semantics (grouped-map transforms, reference R7/R10).
"""

from daas_apps_spark.session import get_spark
from daas_apps_spark.registry import REGISTRY, get_queries, get_oracles

__all__ = ["get_spark", "REGISTRY", "get_queries", "get_oracles"]

__version__ = "0.1.0"
