#!/usr/bin/env python
"""Round-6 adversarial scaling stress (SCALE.md): replicate sf0.1 inputs 10x
with per-replica perturbation and time the new operator families.

Usage: python scripts/stress_round6.py  (env: SPARK_GRAFT_SF_DIR, default sf0.1)
Prints one line per measurement; record the numbers in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from guardian_for_apache_kafka_spark.session import get_spark  # noqa: E402
from guardian_for_apache_kafka_spark.sources.tables import load_table  # noqa: E402


def timed(label, df_or_build):
    """Accepts a DataFrame (legacy; repeated collect reuses shuffle stages,
    so the number is a LOWER bound) or a zero-arg builder returning a fresh
    DataFrame per run (bench.py discipline: no stage reuse, honest wall)."""
    build = df_or_build if callable(df_or_build) else (lambda: df_or_build)
    build().collect()
    t0 = time.perf_counter()
    n = len(build().collect())
    print(f"{label:44s} {time.perf_counter() - t0:7.2f} s  ({n} rows)")


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("guardian-stress-r6")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf, "documents")
    reps = spark.range(10).select(F.col("id").alias("__rep"))
    # 10x docs; each replica gets a distinct token suffix so vocabulary
    # grows 10x too (adversarial for summaries and LM models)
    docs10 = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") * 10 + F.col("__rep")).alias("doc_id"),
            F.concat_ws(
                " ", F.col("text"), F.concat(F.lit("rep"), F.col("__rep"))
            ).alias("text"),
            "lang",
            "source",
        )
        .repartition(64)
        .localCheckpoint()  # freeze: stress the operator, not the generator
    )
    n_docs = docs10.count()
    print(f"stress corpus: {n_docs} docs")

    from guardian_for_apache_kafka_spark.operators.text import (
        bigram_cross_entropy,
        token_heavy_hitters,
        vocab_growth_stats,
    )

    timed("heavy_hitters 10x (0.2% threshold)", token_heavy_hitters(docs10, 0.002))
    timed("bigram_cross_entropy 10x", bigram_cross_entropy(docs10, broadcast_model=True))
    timed("vocab_growth 10x", vocab_growth_stats(docs10))

    # IVM at 10k groups: synthetic group = orderkey % 10000
    from guardian_for_apache_kafka_spark.operators.ivm import (
        apply_agg_delta,
        cdc_agg_delta,
    )

    o = load_table(spark, sf, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderkey") % 10000).cast("string").alias("g"),
    )
    old = o.groupBy("g").agg(F.count("*").cast("long").alias("n"), F.sum("cents").alias("s"))
    cdc = o.where(F.col("o_orderkey") % 3 == 0).select(
        F.col("g").alias("before_g"),
        F.col("cents").alias("before_v"),
        ((F.col("o_orderkey") + 1) % 10000).cast("string").alias("after_g"),
        (F.col("cents") + 1).alias("after_v"),
    )
    timed("ivm 10k groups, 50k-row group-moving CDC",
          apply_agg_delta(old, cdc_agg_delta(cdc), "g", "n", "s"))

    # MMR with a 256-candidate pool (65k pair sims through one Arrow group)
    from guardian_for_apache_kafka_spark.operators.similarity import mmr_topk

    emb = load_table(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    timed("mmr pool=256 k=32", mmr_topk(emb, q, k=32, pool=256))

    # histogram rollup at 10x events and 100x finer bins
    from guardian_for_apache_kafka_spark.operators.profiling import (
        histogram_quantile_rollup,
    )

    ev = load_table(spark, sf, "events")
    ev10 = (
        ev.crossJoin(reps)
        .select(
            "event_type",
            (F.col("value") + F.col("__rep") / 10.0).alias("value"),
            "ts",
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(f"stress events: {ev10.count()} rows")
    timed("hist quantile rollup 10x events, width=10c",
          histogram_quantile_rollup(ev10, bin_width_cents=10))





def extra() -> None:
    """Round-6b additions: PageRank at 10x nodes, SCD-2 over a 10x log,
    rolling sketch distinct at 10x events."""
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("guardian-stress-r6b")
    spark.sparkContext.setLogLevel("ERROR")

    from guardian_for_apache_kafka_spark.operators.hierarchy import (
        md5_hash32,
        pagerank_fixed_point,
        synthetic_parent,
    )

    n_nodes = 150_000
    c = spark.range(1, n_nodes + 1).select(F.col("id").alias("k"))
    k = F.col("k")
    e1 = c.select(k.alias("src"), synthetic_parent(k).alias("dst"))
    e2 = c.select(
        k.alias("src"),
        (k - 1 - md5_hash32(F.concat(k.cast("string"), F.lit("#2"))) % k).alias("dst"),
    )
    edges = e1.unionByName(e2).localCheckpoint()
    timed(f"pagerank 3 rounds @ {n_nodes} nodes/300k edges",
          pagerank_fixed_point(edges, iterations=3))

    from guardian_for_apache_kafka_spark.operators.merge import scd2_from_log

    base = spark.range(1, 100_001).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v")
    )
    log = (
        spark.range(1, 500_001)
        .select(
            (F.col("id") % 100_000 + 1).alias("k"),
            (F.col("id") % 997).alias("v"),
            (F.floor(F.col("id") / 100_000) + 1).cast("long").alias("ver"),
            (F.col("id") % 13 == 0).alias("deleted"),
        )
        .localCheckpoint()
    )
    timed("scd2 history @ 100k keys / 500k log rows",
          scd2_from_log(base, log, "k", "ver"))

    from guardian_for_apache_kafka_spark.operators.timeseries import (
        rolling_distinct_sketch,
    )

    ev = load_table(spark, sf, "events")
    reps = spark.range(10).select(F.col("id").alias("__rep"))
    ev10 = (
        ev.crossJoin(reps)
        .select("event_type", (F.col("user_id") * 10 + F.col("__rep")).alias("user_id"), "ts")
        .repartition(64)
        .localCheckpoint()
    )
    timed("rolling 7d sketch distinct @ 1M events/15k users",
          rolling_distinct_sketch(ev10))


def extra_c() -> None:
    """Round-6c additions: SymSpell join at 10x keys, interval coalescing
    and attribution at 10x events, shingle-duplication at 10x docs."""
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("guardian-stress-r6c")
    spark.sparkContext.setLogLevel("ERROR")

    from guardian_for_apache_kafka_spark.operators.strings import (
        edit_distance_pairs,
    )

    # 150k digit-dense keys — the adversarial shape (many ED-2 collisions)
    names = spark.range(150_000).select(
        F.format_string("Customer#%09d", F.col("id") * 7 % 1_000_000).alias("nm")
    ).localCheckpoint()
    timed("symspell ed<=1 join @ 150k digit keys",
          lambda: edit_distance_pairs(names, "nm"))

    from guardian_for_apache_kafka_spark.operators.timeseries import (
        coalesce_intervals,
    )

    ev = load_table(spark, sf, "events")
    reps = spark.range(10).select(F.col("id").alias("__rep"))
    ev10 = (
        ev.crossJoin(reps)
        .select(
            (F.col("user_id") * 10 + F.col("__rep")).alias("user_id"),
            F.col("ts").alias("s"),
            F.expr(
                "timestampadd(MINUTE, 1 + abs(cast(round(value * 100) as bigint)) % 30, ts)"
            ).alias("e"),
            F.col("event_id"),
            F.col("event_type"),
            F.col("value"),
            F.col("ts"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    timed("interval coalesce @ 1M intervals/15k users",
          lambda: coalesce_intervals(ev10, "user_id", "s", "e")
          .groupBy().agg(F.count("*").alias("n"), F.sum("n_intervals").alias("s")))

    from guardian_for_apache_kafka_spark.operators.text import (
        shingle_duplication_profile,
    )

    docs = load_table(spark, sf, "documents")
    docs10 = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") * 10 + F.col("__rep")).alias("doc_id"),
            "text",  # replicas share text -> duplication density rises 10x
        )
        .repartition(64)
        .localCheckpoint()
    )
    timed("shingle duplication profile @ 50k docs (10x dup density)",
          lambda: shingle_duplication_profile(docs10)
          .groupBy().agg(F.count("*").alias("n"), F.sum("n_shared").alias("s")))


def extra_d() -> None:
    """Round-6d additions: substring-level span extraction/excision and
    cross-corpus span decontamination at 10x docs with 10x duplication
    density (replicas share text, so every passage is copied 10x — match
    points grow with duplication^2, the worst case for any span plan)."""
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("guardian-stress-r6d")
    spark.sparkContext.setLogLevel("ERROR")

    from guardian_for_apache_kafka_spark.operators.dedup import (
        decontaminate_spans,
        duplicate_spans,
        excise_duplicate_spans,
    )

    docs = load_table(spark, sf, "documents")
    reps = spark.range(10).select(F.col("id").alias("__rep"))
    docs10 = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") * 10 + F.col("__rep")).alias("doc_id"),
            "text",  # replicas share text -> every span duplicated 10x
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(f"stress corpus: {docs10.count()} docs, 10x span duplication")
    timed(
        "duplicate spans @ 50k docs (10x dup density)",
        lambda: duplicate_spans(docs10, n=8, min_span_tokens=16, max_bucket=200)
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum("span_tokens").alias("tok")),
    )
    timed(
        "span excision @ 50k docs (10x dup density)",
        lambda: excise_duplicate_spans(
            docs10, n=8, min_span_tokens=16, max_bucket=200
        )
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum("n_spans_cut").alias("cut")),
    )
    bench = docs.where(F.col("doc_id") < 50).select("doc_id", "text")
    timed(
        "span decontaminate @ 50k train x 50 bench",
        lambda: decontaminate_spans(
            docs10, bench, n=8, min_span_tokens=16
        )
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum("n_spans_cut").alias("cut")),
    )


if __name__ == "__main__":
    if os.environ.get("STRESS_EXTRA_D"):
        extra_d()
    elif os.environ.get("STRESS_EXTRA_C"):
        extra_c()
    elif os.environ.get("STRESS_EXTRA"):
        extra()
    else:
        main()
