#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {"q1": sec, ...}, "sf": ...}

The eight headline metrics mirror BASELINE.md §2 (stock-PySpark measured
baseline, same data, same hardware) so the per-round BENCH_r{N}.json is
directly comparable. Each timing = median of N_RUNS warm runs, collect()
included (same protocol as BASELINE.md).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from guardian_for_apache_kafka_spark.plans import all_queries  # noqa: E402
from guardian_for_apache_kafka_spark.session import get_spark  # noqa: E402

# metric name (BASELINE.md §2) -> registry query name
HEADLINE = {
    "agg_q1": "q02_hash_aggregate_tpch_q1",
    "join_q5ish": "q03_multiway_join",
    "window_rank": "q10_window_rank",
    "topk": "q12_topk",
    "dedup_latest_by_key": "g6_compaction_latest_by_key",
    "tumbling_window": "g2_time_slice_hourly",
    "semi_anti": "q06_semi_anti_join",
    "json_extract": "q17_json_extraction",
    # engine-specific headline ops beyond the stock baseline
    "minhash_lsh": "d4_minhash_lsh_dedup",
    "cosine_topk": "s1_cosine_topk",
    "simhash": "d5_simhash_pairs",
    "asof_join": "q25_asof_join",
    "dedup_clusters": "d7_dedup_clusters",
    "training_pipeline": "p2_training_pipeline",
}

N_RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or sf_dir
    try:
        sf: float | str = float(sf_label)
    except ValueError:
        sf = sf_label

    spark = get_spark("guardian-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    timings: dict[str, float] = {}
    for metric, qname in HEADLINE.items():
        builder = queries.get(qname)
        if builder is None:
            continue
        # warm-up run (catalog/file listing, codegen, JIT) then timed runs
        try:
            builder(spark, sf_dir).collect()
            runs = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                builder(spark, sf_dir).collect()
                runs.append(time.perf_counter() - t0)
            timings[metric] = round(statistics.median(runs), 4)
        except Exception as exc:  # keep the bench line parseable even on failure
            print(f"bench: {metric} ({qname}) failed: {exc}", file=sys.stderr)
            timings[metric] = -1.0

    ok = [v for v in timings.values() if v >= 0]
    total = round(sum(ok), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs": N_RUNS,
                "failed": sorted(k for k, v in timings.items() if v < 0),
            }
        )
    )


if __name__ == "__main__":
    main()
