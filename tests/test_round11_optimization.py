"""Round-11 optimization pins.

The first optimization round changed operator INTERNALS without changing any
query's results (OPTIMIZATION_r11.md). These tests pin the two behavioral
properties the changes introduced:

1. Multi-consumer intermediates materialize via lazy localCheckpoint, NOT
   persist(): nothing may enter Spark's logical-plan-keyed cache manager,
   where an identical later plan (e.g. the next bench run of the same query)
   would silently reuse the previous materialization instead of recomputing.
2. The knn_graph corpus-as-query specialization (one Arrow top-nprobe kernel
   feeding both the assignment and the probes) returns exactly what the
   generic ivf_topk path returns for the same corpus/params.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from guardian_for_apache_kafka_spark.sources.tables import load_table


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_dedup_intermediates_never_enter_cache_manager(spark, sf_dir):
    from guardian_for_apache_kafka_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    spark.catalog.clearCache()
    docs = load_table(spark, sf_dir, "documents").limit(300)
    r1 = sorted(
        (r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    )
    minhash_lsh_candidates(docs, num_hashes=16, bands=4).collect()
    simhash_pairs(docs, max_hamming=3).collect()
    assert _cache_manager_empty(spark)
    # an identical second call recomputes from its own inputs and agrees
    r2 = sorted(
        (r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    )
    assert r1 == r2
    assert _cache_manager_empty(spark)


def test_knn_graph_specialization_matches_generic_ivf(spark, sf_dir):
    from guardian_for_apache_kafka_spark.operators.similarity import (
        ivf_topk,
        knn_graph,
    )

    e = load_table(spark, sf_dir, "embeddings")
    fast = knn_graph(e, k=3, nlist=8, nprobe=2)
    q = e.select(F.col("vec_id").alias("query_id"), F.col("embedding"))
    generic = ivf_topk(e, q, k=3, nlist=8, nprobe=2)
    a = sorted(tuple(r) for r in fast.collect())
    b = sorted(tuple(r) for r in generic.collect())
    assert a == b
