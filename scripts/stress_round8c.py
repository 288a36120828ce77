"""Round-8c stress: the r8b token-rollup operators at 1M documents.

Both d39 (DSIR importance) and t41 (n-gram diversity) follow the
t14/unigram posture — token-keyed aggregates whose results are
vocabulary-sized, broadcast back onto the exploded stream — so wall
should scale with the token count, not blow up on the vocab join. The
synthetic corpus plants a template-spam source (identical docs) and a
fresh source (distinct docs) so t41's diversity separation is asserted
at scale, and tags 10% of docs as the DSIR target language.

    python scripts/stress_round8c.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from guardian_for_apache_kafka_spark import get_spark  # noqa: E402
from guardian_for_apache_kafka_spark.operators.text import (  # noqa: E402
    dsir_importance_weights,
    ngram_diversity_profile,
)


def synth_docs(spark, n: int):
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(19)),
        lambda i: F.concat(
            F.lit("w"), (F.xxhash64(F.col("doc_id"), i) % 5000).cast("string")
        ),
    )
    spam = F.lit("copy paste boilerplate terms and conditions apply here now ok "
                 "copy paste boilerplate terms and conditions apply here now ok")
    return base.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, spam)
        .otherwise(F.concat_ws(" ", words))
        .alias("text"),
        F.when(F.col("doc_id") % 10 == 1, F.lit("en")).otherwise(F.lit("xx")).alias("lang"),
        F.when(F.col("doc_id") % 10 == 0, F.lit("spam")).otherwise(F.lit("fresh")).alias("source"),
        F.lit(120).alias("n_chars"),
    )


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.1f} s ({len(out)} rows)", flush=True)
    return out


def main() -> None:
    spark = get_spark()
    for n in (100_000, 1_000_000):
        docs = synth_docs(spark, n).localCheckpoint()
        print(f"--- {n:,} docs (~{n * 20:,} tokens) ---", flush=True)
        div = timed(
            "t41 ngram_diversity_profile",
            lambda: ngram_diversity_profile(docs).collect(),
        )
        d = {(r.source, r.n): r.diversity for r in div}
        assert d[("spam", 3)] < 0.001 < d[("fresh", 3)], d
        w = timed(
            "d39 dsir_importance_weights (top-25 out)",
            lambda: (
                dsir_importance_weights(docs, target=F.col("lang") == "en")
                .orderBy(F.col("weight_q").desc())
                .limit(25)
                .collect()
            ),
        )
        assert len(w) == 25


if __name__ == "__main__":
    main()
