#!/usr/bin/env python
"""Round-12 optimization profiler: per-query plan capture + job/stage
accounting (guide §1: measure first, label jobs, isolate with the noop sink).

Identical protocol to scripts/profile_r11.py (collect + noop medians, job-id
delta), with two r12 changes: plans land in ``plans/r12/`` and the session's
dead localCheckpoint blocks are freed between runs (session.
free_local_checkpoints — the r11 tier-3 21x session-drag finding), so a
multi-query profiling session measures each query, not the accumulated
block/GC state of the queries before it.

Usage: python scripts/profile_r12.py [--tag before|after] [names...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guardian_for_apache_kafka_spark.plans import all_queries  # noqa: E402
from guardian_for_apache_kafka_spark.session import (  # noqa: E402
    free_local_checkpoints,
    get_spark,
)

FOCUS = [
    "q50_table_profile",
    "q66_skyline_pareto",
    "m4_video_frames",
    "q44_rolling_zscore_anomaly",
    "q25_asof_join",
    "q52_cdc_merge",
    "d16_edit_distance_pairs",
    "s16_ivfpq_rerank",
    "d13_semantic_dedup",
    "s14_pq_adc_topk",
]

N_RUNS = 3


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    if args and args[0] == "--tag":
        tag = args[1]
        args = args[2:]
    names = args or FOCUS

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "guardian-profile-r12", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(here, "plans", "r12")
    os.makedirs(plan_dir, exist_ok=True)

    def next_job_id() -> int:
        nid = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        return nid if isinstance(nid, int) else nid.get()

    print(f"{'query':35s} {'collect_s':>9s} {'noop_s':>8s} {'jobs':>5s}")
    for name in names:
        builder = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = builder(spark, sf_dir)
        with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        # warm-up (codegen, listing)
        builder(spark, sf_dir).collect()
        free_local_checkpoints(spark)
        # job count for one collect execution
        j0 = next_job_id()
        builder(spark, sf_dir).collect()
        jobs = next_job_id() - j0
        free_local_checkpoints(spark)

        def run_collect() -> float:
            d = builder(spark, sf_dir)
            t0 = time.perf_counter()
            d.collect()
            dt = time.perf_counter() - t0
            free_local_checkpoints(spark)
            return dt

        def run_noop() -> float:
            d = builder(spark, sf_dir)
            t0 = time.perf_counter()
            d.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            free_local_checkpoints(spark)
            return dt

        c = statistics.median(run_collect() for _ in range(N_RUNS))
        n = statistics.median(run_noop() for _ in range(N_RUNS))
        print(f"{name:35s} {c:9.3f} {n:8.3f} {jobs:5d}", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
