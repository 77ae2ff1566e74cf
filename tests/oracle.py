"""DuckDB-oracle comparison harness (SURVEY.md §5.2 t2).

Thin re-export of the package-level verification core
(:mod:`daas_apps_spark.verify`) so the t2 suite and the
``python -m daas_apps_spark verify`` CLI share one canonicalization and
one comparison — a test-vs-product drift here would be a correctness bug.
"""

from __future__ import annotations

from daas_apps_spark.verify import (  # noqa: F401
    canonicalize,
    compare_frames,
    duck_connect,
    run_compare,
)
