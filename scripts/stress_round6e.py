#!/usr/bin/env python
"""Round-6e adversarial scaling stress (SCALE.md): 10x-replicated,
duplication-dense corpora for the CDC-chunk (d29) and TF-IDF-cosine (d30)
dedup operators, and 100x-deep per-user sequences for FIFO allocation
(q106). Prints one line per measurement; record in SCALE.md."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from guardian_for_apache_kafka_spark.session import get_spark  # noqa: E402
from guardian_for_apache_kafka_spark.sources.tables import load_table  # noqa: E402


def timed(label, build):
    build().collect()  # warm plan
    t0 = time.perf_counter()
    n = len(build().collect())
    print(f"{label}: {time.perf_counter() - t0:.2f}s, {n} rows")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stress-round6e")

    d = load_table(spark, sf_dir, "documents")
    # 10x corpus where every replica k prepends k tokens — every original
    # chunk boundary must re-align after the edit, so d29's duplicate-chunk
    # population is ~10x per chunk: the dense regime.
    reps = None
    for k in range(10):
        prefix = " ".join(["pad"] * k)
        r = d.select(
            (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
            (F.concat(F.lit(prefix + (" " if k else "")), F.col("text"))).alias("text"),
        )
        reps = r if reps is None else reps.unionAll(r)
    corpus = reps.localCheckpoint()
    print(f"corpus: {corpus.count()} docs (10x, edit-shifted replicas)")

    from guardian_for_apache_kafka_spark.operators.dedup import tfidf_cosine_pairs
    from guardian_for_apache_kafka_spark.operators.text import cdc_chunks

    def d29_dense():
        ch = cdc_chunks(corpus)
        return (
            ch.groupBy(F.md5(F.col("chunk").cast("binary")).alias("h"))
            .agg(F.count("*").alias("n"))
            .where(F.col("n") >= 2)
        )

    timed("d29 CDC chunk dedup @10x edit-shifted", d29_dense)

    def d30_dense():
        return tfidf_cosine_pairs(corpus, threshold=0.6, max_df_ratio=0.1)

    timed("d30 tfidf cosine pairs @10x (10x dup density)", d30_dense)

    # q106 FIFO at 100x sequence depth: every user's grant/spend interval
    # count scales the per-user join fan-out quadratically in the worst
    # case — the stress is DEPTH, not row count.
    ev = load_table(spark, sf_dir, "events")
    deep = None
    for k in range(10):
        r = ev.select(
            (F.col("event_id") + k * 10_000_000).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {k} SECOND")).alias("ts"),
            (F.col("user_id") % 20).alias("user_id"),  # squeeze into 20 users
            "event_type",
            "value",
        )
        deep = r if deep is None else deep.unionAll(r)

    from pyspark.sql import Window

    def q106_deep():
        flow = deep.where(
            F.col("event_type").isin("view", "signup", "purchase")
        ).select(
            "user_id",
            "ts",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.when(F.col("event_type") == "purchase", "spend")
            .otherwise("grant")
            .alias("side"),
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

        def cum_side(side, prefix):
            return (
                flow.where(F.col("side") == side)
                .withColumn("hi", F.sum("cents").over(w))
                .withColumn("lo", F.col("hi") - F.col("cents"))
                .select(
                    "user_id",
                    F.col("lo").alias(f"{prefix}_lo"),
                    F.col("hi").alias(f"{prefix}_hi"),
                )
            )

        g, s = cum_side("grant", "g"), cum_side("spend", "s")
        return (
            s.join(g, "user_id")
            .where((F.col("g_lo") < F.col("s_hi")) & (F.col("s_lo") < F.col("g_hi")))
            .groupBy("user_id")
            .agg(F.count("*").alias("n_alloc"), F.sum(
                F.least("g_hi", "s_hi") - F.greatest("g_lo", "s_lo")
            ).alias("alloc"))
        )

    timed("q106 FIFO @10x rows / 20 users (deep sequences)", q106_deep)


if __name__ == "__main__":
    main()
