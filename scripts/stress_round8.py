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
