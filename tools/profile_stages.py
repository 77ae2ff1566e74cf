#!/usr/bin/env python
"""Per-query job/stage time breakdown via the Spark event log (guide §1).

Runs each named headline query once untimed (warm) and once timed under a
job description, with the event log enabled, then replays the log and
prints, per query: wall seconds, job count, and each job's stages with
submit→complete duration, task count, and shuffle read/write bytes. This
is the UI's Stages page in text form — usable in a sandbox with the UI
disabled, and exact (driver-recorded timestamps, not sampling).

Usage::

    python tools/profile_stages.py [query ...]     # default: all bench rows
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from daas_apps_spark.registry import REGISTRY, _load_all
from daas_apps_spark.session import get_spark
from daas_apps_spark.sources.layout import (
    compact_dir,
    drop_persisted_rdds,
    tune_scan_confs,
)

EVDIR = "/tmp/spark-events-profile"


def main() -> None:
    names = sys.argv[1:]
    _load_all()
    os.makedirs(EVDIR, exist_ok=True)
    import shutil

    for f in glob.glob(os.path.join(EVDIR, "*")):
        shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = compact_dir(os.environ["SPARK_GRAFT_SF_DIR"])
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder_extras = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": EVDIR,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    }
    # get_spark caches by config-free getOrCreate; build directly instead
    from daas_apps_spark.session import get_spark as _gs

    b = SparkSession.builder.appName("stage-profile").master(f"local[{cpus}]")
    for k, v in builder_extras.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    from daas_apps_spark.session import pin_session

    pin_session(spark)
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tune_scan_confs(spark)
    try:
        from daas_apps_spark.sources.bucketed import prune_stale_warehouse

        prune_stale_warehouse(spark)
    except Exception:
        pass

    specs = sorted((s for s in REGISTRY.values() if s.bench), key=lambda s: s.name)
    if names:
        specs = [REGISTRY[n] for n in names]

    walls = {}
    for spec in specs:  # warm pass
        spec.fn(spark, sf).toPandas()
        drop_persisted_rdds(spark)
    for spec in specs:
        spark.catalog.clearCache()
        drop_persisted_rdds(spark)
        sc = spark.sparkContext
        sc.setJobDescription(f"PROFILE:{spec.name}")
        t0 = time.perf_counter()
        spec.fn(spark, sf).toPandas()
        walls[spec.name] = time.perf_counter() - t0
        sc.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # -- replay the event log ------------------------------------------------
    cand = glob.glob(os.path.join(EVDIR, f"*{app_id}*")) or glob.glob(
        os.path.join(EVDIR, "*")
    )
    path = cand[0]
    if os.path.isdir(path):  # Spark 4 rolling event log dir
        path = sorted(glob.glob(os.path.join(path, "events*")))[0]
    jobs = {}  # job_id -> {desc, stages: [ids], t0, t1}
    stages = {}  # stage_id -> {name, t0, t1, tasks, sh_read, sh_write, input}
    with open(path) as fh:
        for line in fh:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = ev.get("Properties", {}).get("spark.job.description", "")
                jobs[ev["Job ID"]] = {
                    "desc": desc,
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    "t0": ev["Submission Time"],
                }
                for s in ev["Stage Infos"]:
                    stages.setdefault(
                        s["Stage ID"],
                        {"name": s["Stage Name"], "tasks": s["Number of Tasks"]},
                    )
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                st = stages.setdefault(
                    si["Stage ID"],
                    {"name": si["Stage Name"], "tasks": si["Number of Tasks"]},
                )
                st["t0"] = si.get("Submission Time")
                st["t1"] = si.get("Completion Time")
                acc = {
                    a["Name"]: a.get("Value")
                    for a in si.get("Accumulables", [])
                }
                st["sh_read"] = acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0) or 0
                st["sh_read"] = (st["sh_read"] or 0) + (acc.get("internal.metrics.shuffle.read.localBytesRead", 0) or 0)
                st["sh_write"] = acc.get("internal.metrics.shuffle.write.bytesWritten", 0) or 0
                st["input"] = acc.get("internal.metrics.input.bytesRead", 0) or 0

    per_query = {}
    for jid, j in sorted(jobs.items()):
        d = j["desc"]
        if not d.startswith("PROFILE:"):
            continue
        q = d.split(":", 1)[1]
        per_query.setdefault(q, []).append((jid, j))

    for q, jlist in per_query.items():
        print(f"\n=== {q}  wall={walls.get(q, float('nan')):.3f}s  jobs={len(jlist)} ===")
        for jid, j in jlist:
            jdur = (j.get("t1", j["t0"]) - j["t0"]) / 1000.0
            print(f"  job {jid}: {jdur:.3f}s")
            for sid in sorted(j["stages"]):
                st = stages.get(sid, {})
                if st.get("t0") is None:
                    continue  # skipped stage (reused exchange)
                sdur = (st["t1"] - st["t0"]) / 1000.0
                name = st["name"].split("\n")[0][:70]
                print(
                    f"    stage {sid:>4} {sdur:7.3f}s tasks={st['tasks']:>3} "
                    f"shR={st.get('sh_read', 0)>>10:>7}K shW={st.get('sh_write', 0)>>10:>7}K "
                    f"in={st.get('input', 0)>>10:>7}K  {name}"
                )


if __name__ == "__main__":
    main()
