"""Bench artifact contract tests.

Round 7's official bench artifact failed to parse because the single stdout
JSON line grew to ~5.4 KB (per-run samples inlined) while the consumer
captures only a bounded stdout tail (~2000 chars). These tests pin the
round-8 contract: the FINAL stdout line of bench.py stays compact (per-run
detail goes to the BENCH_DETAIL sidecar / an earlier stdout line), and the
contended-row self-healing rule is deterministic.

No SparkSession needed — these exercise bench.py's pure helpers and a
worst-case reconstruction of the final line from the real headline set.
"""

from __future__ import annotations

import json

import bench
from daas_apps_spark.registry import REGISTRY, _load_all

# The consumer captures a 2000-char stdout tail; leave headroom for any
# stray progress-bar bytes that land after our line.
FINAL_LINE_BUDGET = 1900


def _worst_case_final_line() -> str:
    """Rebuild the final-line dict with worst-plausible-width values."""
    _load_all()
    names = sorted(s.name for s in REGISTRY.values() if s.bench)
    assert names, "headline set must not be empty"
    # worst case: every timing is a 4-decimal float with 3 integer digits
    timings = {n: 999.9999 for n in names}
    payload = {
        "metric": "headline_queries_total_wallclock",
        "value": 99999.9999,
        "unit": "sec",
        "queries": timings,
        "duckdb_queries": dict(timings),  # every query has an oracle: max width
        "duckdb_total": 99999.9999,
        "ratio_vs_duckdb": 99.99,
        "sf": 0.1,
        "runs_per_query": bench.RUNS,
        "stat": "median",
        "max_spread": 99.99,
        "layout": "compacted",
        # round-10 machine-speed anchors ride on every line — they must
        # fit inside the same budget
        "calibration": {
            "cpu_spin": 999.9999,
            "jvm_range_agg": 999.9999,
            "io_scan": 999.9999,
        },
    }
    # bench.py prints the final line with compact separators (every byte of
    # margin counts against the consumer's tail window) — the worst-case
    # reconstruction must measure the same encoding it ships
    return json.dumps(payload, separators=(",", ":"))


def test_final_line_fits_consumer_window():
    line = _worst_case_final_line()
    assert len(line) <= FINAL_LINE_BUDGET, (
        f"bench final line would be {len(line)} chars (> {FINAL_LINE_BUDGET});"
        " the artifact consumer captures a ~2000-char tail — move detail to"
        " BENCH_DETAIL.json, or trim the headline set / key names"
    )


def test_final_line_is_single_parseable_json():
    parsed = json.loads(_worst_case_final_line())
    # the r6 schema the consumer already understood, plus stat/max_spread
    for key in (
        "metric", "value", "unit", "queries", "duckdb_queries",
        "duckdb_total", "ratio_vs_duckdb", "sf", "runs_per_query",
        "stat", "max_spread", "layout",
    ):
        assert key in parsed
    # per-run detail must NOT be on the final line
    for key in ("queries_runs", "duckdb_runs", "spread", "retries"):
        assert key not in parsed


def test_median_even_and_odd():
    assert bench._median([3.0, 1.0, 2.0]) == 2.0
    assert bench._median([4.0, 1.0, 2.0, 3.0]) == 2.5


def test_needs_retry_threshold():
    # idle-machine spreads (1.1-1.7) never trigger
    assert not bench._needs_retry([1.0, 1.1, 1.2, 1.5, 1.7])
    # a single contended outlier (>2x the fastest) does
    assert bench._needs_retry([1.0, 1.05, 1.1, 1.0, 2.5])
    # exactly at threshold: no retry (strict >)
    assert not bench._needs_retry([1.0, 2.0])
