#!/usr/bin/env python
"""Round-11 optimization profiler: per-query plan capture + job/stage
accounting (guide §1: measure first, label jobs, isolate with the noop sink).

For each query name given on argv (default: the round-11 focus set):
  - builds the DataFrame once and writes ``.explain('formatted')`` to
    ``plans/r11/<name>_<tag>.txt``
  - times N warm executions through the **noop sink** (guide §1.4 — computes
    every column, discards the write) and through ``collect()`` (the bench's
    timed action) and reports the median of each
  - reports how many Spark JOBS one execution launches (dagScheduler
    nextJobId delta — multi-job queries pay per-job latency at bench scale)

Usage: python scripts/profile_r11.py [--tag before|after] [names...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guardian_for_apache_kafka_spark.plans import all_queries  # noqa: E402
from guardian_for_apache_kafka_spark.session import get_spark  # noqa: E402

FOCUS = [
    "s16_ivfpq_rerank",
    "d16_edit_distance_pairs",
    "s11_knn_graph",
    "q125_weighted_median",
    "t35_ngram_novelty",
    "m9_scene_segments",
    "d13_semantic_dedup",
    "q50_table_profile",
    "t15_bigram_cross_entropy",
    "t17_char_entropy",
    "s14_pq_adc_topk",
    "t13_boilerplate_chunks",
    "t37_burrows_delta",
    "t25_kneser_ney_entropy",
    "s6_mmr_diverse_topk",
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
        "guardian-profile-r11", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(here, "plans", "r11")
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
        # job count for one collect execution
        j0 = next_job_id()
        builder(spark, sf_dir).collect()
        jobs = next_job_id() - j0

        def run_collect() -> float:
            d = builder(spark, sf_dir)
            t0 = time.perf_counter()
            d.collect()
            return time.perf_counter() - t0

        def run_noop() -> float:
            d = builder(spark, sf_dir)
            t0 = time.perf_counter()
            d.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        c = statistics.median(run_collect() for _ in range(N_RUNS))
        n = statistics.median(run_noop() for _ in range(N_RUNS))
        print(f"{name:35s} {c:9.3f} {n:8.3f} {jobs:5d}", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
