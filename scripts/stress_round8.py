#!/usr/bin/env python
"""Round-8 adversarial scaling stress (SCALE.md): planted hot-shingle skew
for shingle_duplication_profile (VERDICT r7 ask #3).

Corpus: N docs, each containing THE SAME 3-token phrase (one global hot
shingle with df == N) followed by unique filler tokens — the adversarial
shape for the r6 window formulation, where ``COUNT(*) OVER (PARTITION BY
shingle)`` forced all N hot-key rows into one task's sort with zero
map-side combine. The r8 groupBy formulation partial-aggregates the hot
key on the map side, so each reducer key receives at most n_map_partitions
rows regardless of df.

Usage: python scripts/stress_round8.py [N ...]  (default 100000 1000000)
Prints one line per measurement; record the numbers in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from guardian_for_apache_kafka_spark.operators.text import (  # noqa: E402
    shingle_duplication_profile,
)
from guardian_for_apache_kafka_spark.session import get_spark  # noqa: E402


def hot_corpus(spark, n_docs: int, repeat: int = 32):
    """Every doc: the hot phrase repeated ``repeat`` times + 8 unique
    tokens — the stopword-trigram shape, where the hot shingle dominates
    the exploded stream (~repeat*3 of ~repeat*3+11 shingles per doc) and
    repeats WITHIN each document, so map-side combine collapses it while
    a window cannot."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.concat_ws(" ", F.array_repeat(F.lit("alpha beta gamma"), repeat)),
            F.lit(" "),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"u{i}x"), F.col("id").cast("string"))
                    for i in range(8)
                ],
            ),
        ).alias("text"),
    )


def window_formulation(df, n=3):
    """The r6 shape, kept here ONLY as the stress baseline."""
    from guardian_for_apache_kafka_spark.functions.columns import (
        ngram_shingles,
        tokens_col,
    )

    tok = df.select(F.col("doc_id").alias("__id"), tokens_col("text").alias("__tk"))
    sh = tok.select(
        "__id", ngram_shingles(F.col("__tk"), n).alias("__shingles")
    ).where(F.size("__shingles") > 0)
    inv = sh.select(
        "__id",
        F.explode(F.transform("__shingles", lambda c: F.xxhash64(c))).alias("__s"),
    )
    dfreq = inv.withColumn("__df", F.count("*").over(Window.partitionBy("__s")))
    return (
        dfreq.groupBy("__id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("__df") >= 2, 1).otherwise(0)).alias("n_shared"),
        )
        .select(
            F.col("__id").alias("doc_id"),
            "n_shingles",
            "n_shared",
            F.round(F.col("n_shared").cast("double") / F.col("n_shingles"), 4).alias(
                "shared_ratio"
            ),
        )
    )


def timed(label, build):
    build().collect()  # warm
    t0 = time.perf_counter()
    rows = build().collect()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f} s ({len(rows)} rows)")
    return dt, rows


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark()
    for n in sizes:
        corpus = hot_corpus(spark, n).localCheckpoint()
        t_new, r_new = timed(f"groupBy formulation  n={n}", lambda: shingle_duplication_profile(corpus))
        t_old, r_old = timed(f"window formulation   n={n}", lambda: window_formulation(corpus))
        assert sorted(map(tuple, r_new)) == sorted(map(tuple, r_old)), "output drift!"
        print(f"  hot-shingle df={n}; window/groupBy wall ratio: {t_old / t_new:.2f}x")


if __name__ == "__main__":
    main()


def stream_writer_stress(spark, n_records: int, n_batches: int) -> None:
    """Volume profile for the native guardian stream writer: commit cost
    is driver-side renames linear in slices TOUCHED per batch, not in
    records — verify wall grows sublinearly in records at fixed slices."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.operators.restore import restore_batch
    from guardian_for_apache_kafka_spark.sources.guardian_source import (
        register_guardian_datasource,
    )

    register_guardian_datasource(spark)
    root = tempfile.mkdtemp()
    src, dest, ckpt = f"{root}/in", f"{root}/arch", f"{root}/ckpt"
    per_batch = n_records // n_batches
    recs = spark.range(n_records).select(
        F.lit("t").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("id").alias("offset"),
        F.col("id").cast("string").cast("binary").alias("key"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("value"),
        F.timestamp_millis(
            F.lit(1704067200000) + (F.col("id") % 48) * 3600000 + F.col("id")
        ).alias("timestamp"),
        F.lit(0).alias("timestamp_type"),
    )
    for b in range(n_batches):
        recs.where((F.col("offset") % n_batches) == b).coalesce(4).write.mode(
            "append"
        ).parquet(src)
    t0 = time.perf_counter()
    stream = spark.readStream.schema(recs.schema).option("maxFilesPerTrigger", 4).parquet(src)
    q = (
        stream.writeStream.format("guardian")
        .option("chronoUnitSlice", "hours")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(dest)
    )
    q.awaitTermination(600)
    wall = time.perf_counter() - t0
    n = restore_batch(spark, dest, fmt="json").count()
    assert n == n_records, (n, n_records)
    print(
        f"stream_writer: {n_records} records / {n_batches} batches / 48 slices"
        f" -> {wall:.1f} s ({per_batch} rec/batch), restore count OK"
    )
    shutil.rmtree(root)
