"""Round-8b stress: hard-negative mining's aggregate argmax vs the
ranking-window formulation at corpus scales.

The claim under test (SCALE.md round-8b plan audit): s24's per-side
argmax is a map-side-combinable ``max(struct(cosine, -vec_id))`` hash
aggregate, so each (query, side) reducer key receives at most
n_map_partitions combined rows regardless of corpus size — while the
rank-window formulation sorts every (query, side) partition's FULL
corpus-sized score stream in one task. Run:

    python scripts/stress_round8b.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from guardian_for_apache_kafka_spark import get_spark
from guardian_for_apache_kafka_spark.functions.columns import cosine_similarity
from guardian_for_apache_kafka_spark.operators.similarity import hard_negative_pairs


def synth_vectors(spark, n: int, dim: int = 16):
    """Deterministic synthetic vectors: component d of vector i is
    (xxhash64(i, d) % 2_000_001) / 1e6 — Spark's % keeps the dividend's
    sign, so components range over (-2.000001, 2.000001); label = i % 4.
    Cosine is scale-free, so the range only affects norm intuition, and
    the aggregate-vs-window comparison is on identical inputs anyway."""
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            F.xxhash64(F.col("vec_id"), d) % 2_000_001
        ).cast("double") / 1_000_000.0,
    )
    return base.select(
        "vec_id", comps.alias("embedding"), (F.col("vec_id") % 4).alias("label")
    )


def window_formulation(corpus, queries):
    """The rank-window twin of hard_negative_pairs (identical output)."""
    q = queries.select("query_id", F.col("embedding").alias("__qv"), F.col("label").alias("__ql"))
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (F.col("label") == F.col("__ql")).alias("__same"),
            cosine_similarity(F.col("embedding"), F.col("__qv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id", "__same").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    best = scored.withColumn("__rk", F.row_number().over(w)).where(F.col("__rk") == 1)
    pos = best.where(F.col("__same")).select(
        "query_id", F.col("vec_id").alias("pos_id"), F.col("cosine").alias("__pc")
    )
    neg = best.where(~F.col("__same")).select(
        "query_id", F.col("vec_id").alias("neg_id"), F.col("cosine").alias("__nc")
    )
    return (
        pos.join(neg, "query_id")
        .select(
            "query_id",
            "pos_id",
            F.round("__pc", 4).alias("pos_cosine"),
            "neg_id",
            F.round("__nc", 4).alias("neg_cosine"),
            F.round(F.col("__pc") - F.col("__nc"), 4).alias("margin"),
        )
        .orderBy("query_id")
    )


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f} s ({len(out)} rows)", flush=True)
    return out


def main() -> None:
    spark = get_spark()
    for n in (1_000_000, 10_000_000):
        corpus = synth_vectors(spark, n).localCheckpoint()
        queries = (
            corpus.where(F.col("vec_id") < 8)
            .select(F.col("vec_id").alias("query_id"), "embedding", "label")
            .localCheckpoint()
        )
        print(f"--- corpus {n:,} vectors, 8 queries ---", flush=True)
        agg = timed("aggregate argmax (s24 path)", lambda: hard_negative_pairs(corpus, queries).collect())
        win = timed("rank window (single-task sort)", lambda: window_formulation(corpus, queries).collect())
        assert sorted(map(tuple, agg)) == sorted(map(tuple, win)), "outputs diverge"
        print("outputs identical: True", flush=True)


if __name__ == "__main__":
    main()
