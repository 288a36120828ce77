#!/usr/bin/env python
"""Round-12 core-scaling check at the 10x corpus (VERDICT r11 ask #3).

The driver's own 8-vs-32-core block runs at sf0.1, where per-query cost is
task/shuffle setup and 8 cores BEATS 32 — it measures overhead, not
parallelism. This harness re-runs the BENCH_r11_c8 protocol where plan
shape dominates: the heavy dedup/similarity/text queries at the 10x corpus
(scripts/scaling_stress_r10.build_scale — the same replica scaling
bench.py's sf1 section uses), timed warm, medians of N runs, dead
checkpoint blocks freed between runs.

Core count comes from $SPARK_GRAFT_CPUS exactly like bench.py (master
local[$SPARK_GRAFT_CPUS]); run the script once per core count from a FRESH
process and compare:

    SPARK_GRAFT_CPUS=32 python scripts/scaling_sf1_r12.py > /tmp/sf1_c32.json
    SPARK_GRAFT_CPUS=8  python scripts/scaling_sf1_r12.py > /tmp/sf1_c8.json

Prints one JSON line {"cpus": N, "scale": "10x", "queries": {...}, "total": T}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from guardian_for_apache_kafka_spark.plans import all_queries  # noqa: E402
from guardian_for_apache_kafka_spark.session import (  # noqa: E402
    free_local_checkpoints,
    get_spark,
)

# the shuffle/kernel-bound families whose 100 TB posture the round's trades
# target; cheap-first so a partial run still yields comparable prefixes
QUERIES = [
    "t31_hapax_ratio",
    "d4_minhash_lsh_dedup",
    "d3_ngram_jaccard_pairs",
    "p13_curation_funnel",
    "t41_ngram_diversity",
    "d15_bloom_decontaminate",
    "s16_ivfpq_rerank",
    "d6_embedding_near_dup",
]

N_RUNS = 2


def main() -> None:
    from scaling_stress_r10 import build_scale

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "guardian-scaling-r12", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    x10 = build_scale(spark, 10, base=base)
    queries = all_queries()
    timings: dict[str, float] = {}
    for name in QUERIES:
        builder = queries[name]
        spark.sparkContext.setJobDescription(f"scaling:{name}")
        try:
            builder(spark, x10).collect()  # warm
            free_local_checkpoints(spark)
            runs = []
            for _ in range(N_RUNS):
                df = builder(spark, x10)
                t0 = time.perf_counter()
                df.collect()
                runs.append(time.perf_counter() - t0)
                free_local_checkpoints(spark)
            timings[name] = round(statistics.median(runs), 4)
        except Exception as exc:
            print(f"scaling: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
        spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                "scale": "10x",
                "base": base,
                "runs": N_RUNS,
                "queries": timings,
                "total": round(sum(v for v in timings.values() if v > 0), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
