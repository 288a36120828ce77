#!/usr/bin/env python
"""Round-10 multi-scale sweep (SCALE.md round-11 design note #2, the
unilaterally-actionable half): measure how the HEAVY operator families
scale when the corpus grows 2x/4x/10x past sf0.1, since sf0.1 itself is
overhead-dominated (BASELINE.md's own warning) and the engine's real
claim is 100 TB viability.

Methodology — replica scaling, not synthesis: each scale factor k unions
k replicas of the driver-generated sf0.1 tables (TESTDATA.md inputs stay
the only source of content). Replica i > 0 gets:

- documents: doc_id += i * 10^7 and every token suffixed with ``~i`` —
  NOTE (advisor r10): the 2-char suffix shifts replica i>0's mean word
  length by +2, so selectivity of mean-word-length quality rules (p13
  stage 2) differs between replica 0 and the others; scaling exponents
  for p13 therefore mix a selectivity change with scale. Quantified: the
  fixture's mean token length is ~5, so suffixed replicas sit at ~7 —
  still inside the 3..10 gopher band, which is why stage-2 yield stays
  high; interpret p13's multi-scale numbers with that caveat. —
  token COUNTS and length distributions are preserved (plus 2 chars), but
  shingle/token SETS are disjoint across replicas, so each replica keeps
  exactly the original's near-dup/vocabulary structure and total work
  should scale ~linearly in corpus size. (Naive replication without the
  suffix would plant k-cliques of exact dups and measure an artificial
  quadratic pair blow-up instead of scaling.)
- embeddings: vec_id += i * 10^7 and the dimensions CYCLICALLY SHIFTED
  by 7*i positions — a permutation is orthogonal, so every within-replica
  cosine/L2 relationship is preserved EXACTLY, while cross-replica
  similarities scramble to the corpus's background level. (v1 of this
  script shifted dim 0 by +1000*i instead: that preserves L2 slabs but
  makes every replica's vectors near-parallel in COSINE space — the
  d6/s1/s11 cosine operators then measure an artificial within-replica
  clique explosion, 2206 -> 2,007,206 pairs at x2. The permutation fixes
  the methodology; doc-side numbers were never affected.)

For each query we report wall seconds at each scale and the log-log
scaling exponent between consecutive scales (1.0 = linear; sub-linear at
small k usually means fixed overhead still dominates; super-linear
flags a shuffle/partition ceiling worth a plan fix).

Usage: python scripts/scaling_stress_r10.py [k ...]   (default 1 2 4 10)
Run SOLO (no concurrent Spark) and record the lines in SCALE.md.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from guardian_for_apache_kafka_spark.plans import REGISTRY  # noqa: E402
from guardian_for_apache_kafka_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/sparkgraft_scale_r10_v2"  # v2: permutation embedding transform

#: the heavy families worth scaling: inverted-index jaccard, banded LSH,
#: brute cosine, IVF knn graph, vocabulary agg, the full funnel, and the
#: embedding near-dup join
QUERIES = [
    "d3_ngram_jaccard_pairs",
    "d4_minhash_lsh_dedup",
    "s1_cosine_topk",
    "s11_knn_graph",
    "t31_hapax_ratio",
    "p13_curation_funnel",
    "d6_embedding_near_dup",
]


def build_scale(spark, k: int, base: str = BASE) -> str:
    # cache key includes the base label: an x10 built from sf0.01 must not
    # be served to a caller scaling sf0.1 (bench.py passes its sf_dir)
    out = os.path.join(WORK, f"x{k}-{os.path.basename(base.rstrip('/'))}")
    if os.path.exists(os.path.join(out, "_OK")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(f"{base}/documents.parquet")
    embs = spark.read.parquet(f"{base}/embeddings.parquet")
    # one dim lookup for ALL replicas (advisor r10: the head() inside the
    # loop re-ran a Spark job per replica)
    dim = len(embs.select("embedding").head()[0])
    d_parts = []
    e_parts = []
    for i in range(k):
        if i == 0:
            d_parts.append(docs)
            e_parts.append(embs)
            continue
        suffix = F.lit(f"~{i}")
        d_parts.append(
            docs.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split("text", " "), lambda t: F.concat(t, suffix)
                    ),
                    " ",
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        rot = (7 * i) % dim
        e_parts.append(
            embs.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                F.concat(
                    F.slice("embedding", rot + 1, dim - rot),
                    F.slice("embedding", 1, rot),
                ).alias("embedding"),
                "label",
            )
        )
    d_all, e_all = d_parts[0], e_parts[0]
    for p in d_parts[1:]:
        d_all = d_all.unionByName(p)
    for p in e_parts[1:]:
        e_all = e_all.unionByName(p)
    d_all.repartition(max(4, 4 * k)).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    e_all.repartition(max(4, k)).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    # the registry loader wants the other tables too; symlink the originals
    for t in (
        "region nation customer supplier part orders lineitem events".split()
    ):
        src = f"{base}/{t}.parquet"
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    open(os.path.join(out, "_OK"), "w").write("ok")
    return out


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 10]
    spark = get_spark()
    dirs = {k: build_scale(spark, k) for k in ks}
    results: dict[str, dict[int, float]] = {q: {} for q in QUERIES}
    for k in ks:
        sf_dir = dirs[k]
        for q in QUERIES:
            fn = REGISTRY[q].builder
            fn(spark, sf_dir).collect()  # warm (scan cache, codegen)
            t0 = time.time()
            n = len(fn(spark, sf_dir).collect())
            dt = time.time() - t0
            results[q][k] = dt
            print(f"x{k:<3} {q:<28} {dt:7.2f}s  rows={n}", flush=True)
    print()
    for q in QUERIES:
        line = f"{q:<28}"
        prev_k = None
        for k in ks:
            line += f"  x{k}:{results[q][k]:6.2f}s"
            if prev_k is not None:
                expo = math.log(results[q][k] / results[q][prev_k]) / math.log(
                    k / prev_k
                )
                line += f" (e={expo:4.2f})"
            prev_k = k
        print(line, flush=True)


if __name__ == "__main__":
    main()
