#!/usr/bin/env python
"""Regenerate EXPLAIN.md: the executed (AQE-final) physical plan of every
headline bench query at sf0.1, annotated with what to look for. Run after
any planner-visible change: `python tools/gen_explain.py`.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from daas_apps_spark.operators.partitioning import physical_plan
from daas_apps_spark.registry import REGISTRY, _load_all
from daas_apps_spark.session import get_spark
from daas_apps_spark.sources.layout import compact_dir, tune_scan_confs

NOTES = {
    "q1_pricing_summary": "shipdate filter pushed to the scan; ReadSchema pruned to 7 of 11 columns; partial_sum before the single hash exchange.",
    "c1_join_orders_customer": "two large sides — AQE decides SMJ vs BHJ from runtime sizes; aggregate pipelined after the join.",
    "c5_broadcast_join": "dimension side builds a broadcast hash table; fact side never shuffles.",
    "c6_multikey_join": "both self-join sides derive from ONE lineitem aggregate — ReusedExchange, single fact pass; AQE converts the joins to broadcast at this scale (SMJ at 100 TB).",
    "k11_corpus_pipeline": "dedup window + hash-sample filter + token census in one plan: scan -> digest-window shuffle -> aggregate shuffle.",
    "c10_asof_join": "no join node: union + one hash shuffle + ordered window scan (last ignorenulls).",
    "i1_tumbling_window": "window bucketing is a projection; aggregation is an ordinary partial+final hash agg.",
    "i3_session_window": "native session-window operator: shuffle on user_id, in-partition sort, session merge.",
    "k1_exact_dedup": "sha256 shuffle + window rank — no self-join.",
    "k2_minhash_signatures": "one md5 per shingle, 12 affine array_min transforms, zero shuffles.",
    "k3_lsh_near_dedup": "band explode, then ONE band-key aggregate with map-side pair generation from the sorted doc set (the self-join of earlier rounds is gone — one exchange fewer), Jaccard verify joins — never a cartesian.",
    "k4_cosine_topk": "query side broadcast; per-query top-k via window rank.",
    "k6_quality_heuristics": "pure projection: single codegen stage, no exchange at all.",
    "c15_regional_revenue": "six-table star chain: every dimension broadcast, only the orders⋈lineitem FK spine shuffles; the two-key local-supplier constraint rides the same join.",
    "c21_waiting_supplier": "EXISTS/NOT EXISTS pair decorrelated to left-semi + left-anti against the same fact; all three lineitem passes hash on l_orderkey.",
    "gr2_triangle_count": "significance-backbone co-occurrence aggregate localCheckpointed with its σ-threshold observed as job metrics (no separate stats pass; the plan reads Scan ExistingRDD — zero parquet re-scans vs 69 before round 11); pair keys packed into one BIGINT (u<<32|v) through the explode/aggregate and unpacked after the threshold filter (narrower shuffle rows, r12); degree-oriented wedge enumeration; explode-to-corners count.",
    "i3_session_window": "native session-window operator: shuffle on user_id, in-partition sort, session merge.",
    "k51_cdc_chunking": "per-row HOF rolling-hash boundary scan, explode to chunks, census aggregate — no Python, no join.",
    "c21_bucketed_layout": "same Q21 semantics on the bucketed layout: the probe join and both decorrelated self-probes read the bucketed scans with ZERO Exchange on the orderkey (SelectedBucketsCount in the scan); only the final aggregate shuffles.",
    "gr4_capped": "the scale-path form: wedge midpoints above GR4_MID_DEGREE_CAP are semi-join-filtered BEFORE wedge generation, bounding every midpoint's neighbor set at cap; candidate pairs explode map-side from one groupBy(midpoint) aggregate as PACKED BIGINT keys (u<<32|v, unpacked after the count — r12); endpoint degrees stay exact.",
    "k3_lsh_capped": "band-frequency cap rides the SAME band aggregate that generates pairs (count <= cap on the collected doc set — no separate frequency pass or semi-join), bounding every band at cap^2 candidate pairs; verify joins unchanged.",
    "k7_ppm_decode": "two Arrow mapInPandas passes: synthesize P6 payloads, then parse header + frombuffer raster to per-channel means — payloads never leave the executor.",
    "c6_bucketed_layout": "the (l_partkey, l_suppkey) pre-aggregation runs ONCE on the bucketed scan (no fact shuffle; localCheckpoint replaces the ReuseExchange the layout removed) and both self-probe sides read the materialized result.",
    "c15_bucketed_layout": "Q5 restructured for the layout: lineitem⋈orders bucket-local, supplier broadcast onto the fact, pre-aggregate by (custkey, nationkey) so the only surviving exchange carries aggregate rows.",
    "a25_mor_sweep": "the plan shown is only the FINAL census + CDF count union; the timed work before it (clone links, DV delete, MOR update, vector compaction) is commit-log arithmetic plus |delta|-sized writes — see SCALING_CURVE's ~flat growth for the evidence.",
    "a27_clone_restore_cycle": "two snapshot censuses; the clone/restore themselves are O(files) metadata ops that never appear as data-plan nodes — the point of the row.",
    "a48_mv_refresh_sweep": "the plan shown is the final MV-state read; the timed work is CREATE MV + bulk DML + REFRESH, where the refresh prices the |delta| change feed (manifest arithmetic since round 11's dv_files keys, no snapshot diff) merged by union + re-aggregation.",
}


def main() -> None:
    _load_all()
    sf = compact_dir("/root/testdata/sf0.1")
    spark = get_spark("explain-gen")
    spark.sparkContext.setLogLevel("ERROR")
    tune_scan_confs(spark)
    specs = sorted((s for s in REGISTRY.values() if s.bench), key=lambda s: s.name)
    out = [
        "# EXPLAIN — executed physical plans of the headline queries\n",
        "Generated by `tools/gen_explain.py` (sf0.1, compacted layout, AQE-final",
        "plans captured *after* execution). Each plan is the one the plan tests",
        "in `tests/test_plans.py` pin.\n",
    ]
    for s in specs:
        df = s.fn(spark, sf)
        df.collect()
        plan = physical_plan(df, mode="simple")
        out.append(f"\n## {s.name}\n")
        if s.name in NOTES:
            out.append(f"*{NOTES[s.name]}*\n")
        out.append("```\n" + plan.strip() + "\n```\n")
    with open("EXPLAIN.md", "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote EXPLAIN.md ({len(specs)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
