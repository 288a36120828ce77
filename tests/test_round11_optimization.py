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


def test_knn_graph_budget_curve_matches_independent_calls(spark, sf_dir):
    # the s12 curve shares ONE training + top-max(budgets) kernel pass;
    # each budget's frame must be bit-identical to an independent
    # knn_graph call at that nprobe (top-p lists are a prefix of the
    # shared top-8 list under the same (cosine desc, cid) stable order)
    from guardian_for_apache_kafka_spark.operators.similarity import (
        knn_graph,
        knn_graph_at_budgets,
    )

    e = load_table(spark, sf_dir, "embeddings")
    shared = knn_graph_at_budgets(e, k=3, nlist=8, budgets=(1, 2, 4))
    for p in (1, 2, 4):
        solo = sorted(tuple(r) for r in knn_graph(e, k=3, nlist=8, nprobe=p).collect())
        curve = sorted(tuple(r) for r in shared[p].collect())
        assert curve == solo, f"nprobe={p}"


def test_ivfpq_shared_model_matches_per_call_training(spark, sf_dir):
    # the s18 curve trains the IVF-PQ index once (ivfpq_model) and probes
    # it per budget; training is deterministic, so the shared-model result
    # must equal a fresh train-and-probe call at the same nprobe
    from guardian_for_apache_kafka_spark.operators.similarity import (
        ivfpq_model,
        ivfpq_rerank_topk,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    model = ivfpq_model(e, nlist=8, m=16, ksub=32, iters=2, share=True)
    for p in (1, 4):
        fresh = ivfpq_rerank_topk(
            e, q, k=3, probe_mult=4, nlist=8, nprobe=p, m=16, ksub=32, iters=2
        )
        shared = ivfpq_rerank_topk(e, q, k=3, probe_mult=4, nprobe=p, model=model)
        a = sorted(tuple(r) for r in fresh.collect())
        b = sorted(tuple(r) for r in shared.collect())
        assert a == b, f"nprobe={p}"


def test_duplicate_spans_barrier_is_not_cached_and_deterministic(spark, sf_dir):
    # the positional-shingle frame feeding both self-join sides materializes
    # via lazy localCheckpoint (instance-scoped): repeated calls recompute
    # from parquet and agree, and nothing enters the plan-keyed cache manager
    from guardian_for_apache_kafka_spark.operators.dedup import duplicate_spans

    spark.catalog.clearCache()
    docs = load_table(spark, sf_dir, "documents").limit(400)
    r1 = sorted(tuple(r) for r in duplicate_spans(docs, n=8, min_span_tokens=16).collect())
    r2 = sorted(tuple(r) for r in duplicate_spans(docs, n=8, min_span_tokens=16).collect())
    assert r1 == r2
    assert _cache_manager_empty(spark)


def test_cross_jaccard_count_path_matches_array_verify_path(spark, sf_dir):
    """The tier-3 rewrite computes the exact intersection from inverted-index
    collision counts when no bucket cap drops postings (max_bucket=None);
    the capped path re-verifies from full shingle arrays. With a cap high
    enough to drop NOTHING the two formulations must emit identical
    (new_id, ref_id, jaccard) rows — same pairs, same division bits."""
    from guardian_for_apache_kafka_spark.operators.dedup import cross_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents").limit(400)
    new = docs.where(F.col("doc_id") % 2 == 1)
    ref = docs.where(F.col("doc_id") % 2 == 0)
    counted = sorted(
        tuple(r) for r in cross_jaccard_pairs(new, ref, threshold=0.3).collect()
    )
    arrayed = sorted(
        tuple(r)
        for r in cross_jaccard_pairs(
            new, ref, threshold=0.3, max_bucket=1 << 30
        ).collect()
    )
    assert counted == arrayed
    assert _cache_manager_empty(spark)


def test_q99_builder_launches_no_jobs(spark, sf_dir):
    """q99's audit counts used to run as six driver-blocking .count() jobs at
    plan-BUILD time (19 Spark jobs before any timed action). The declarative
    rewrite must build with ZERO jobs — the whole audit is one lazy plan."""
    from guardian_for_apache_kafka_spark.plans import all_queries

    sc = spark.sparkContext
    # first build warms the parquet file-listing (planning-time I/O jobs);
    # the rewrite is pinned on the SECOND build: the old builder ran its six
    # .count() jobs on EVERY build, the declarative one runs none
    all_queries()["q99_referential_audit"](spark, sf_dir)
    before = sc._jsc.sc().dagScheduler().nextJobId()
    df = all_queries()["q99_referential_audit"](spark, sf_dir)
    after = sc._jsc.sc().dagScheduler().nextJobId()
    assert after == before, f"builder launched {after - before} jobs"
    # and the plan reads parquet directly (no driver-computed local relation)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "applySchemaToPythonRDD" not in plan, plan


def test_cdc_kernel_matches_catalyst_fold(spark, sf_dir):
    """cdc_chunks' Arrow kernel must segment bit-identically to the pure-JVM
    Catalyst fold it replaced (r11 tier-4) — same chunks, same order, on the
    real corpus plus the empty-token edge cases the state machine's
    ``cur == ""`` quirk makes tricky (chunk-leading empty tokens contribute
    no separator)."""
    from guardian_for_apache_kafka_spark.functions.columns import tokens_col
    from guardian_for_apache_kafka_spark.operators.text import (
        _cdc_chunks_fold,
        cdc_chunks,
    )

    docs = load_table(spark, sf_dir, "documents").limit(300)
    edge = spark.createDataFrame(
        [
            (100001, ""),
            (100002, "a"),
            (100003, "a b"),
            (100004, " leading space"),
            (100005, "double  space inside and trailing "),
            (100006, "   "),
        ],
        "doc_id long, text string",
    )
    both = docs.select("doc_id", "text").unionAll(edge)
    kernel = sorted(tuple(r) for r in cdc_chunks(both).collect())
    fold = sorted(
        tuple(r)
        for r in both.select(
            F.col("doc_id"), _cdc_chunks_fold(tokens_col("text")).alias("__c")
        )
        .select("doc_id", F.posexplode("__c").alias("chunk_index", "chunk"))
        .collect()
    )
    assert kernel == fold


def test_multimodal_dedup_decodes_once(spark, sf_dir):
    """m8/m12 fan their decoded feature frame out to two consumers; the
    barrier must keep the decode MapInPandas BELOW the checkpoint scan so
    each blob is decoded once per execution, not once per consumer (the
    multimodal families' one-decode-pass contract). In the physical plan
    that shows as ZERO Python nodes above the barrier."""
    from guardian_for_apache_kafka_spark.plans import all_queries

    qs = all_queries()
    for name in ("m8_audio_fingerprint_dedup", "m12_patch_signature_dedup"):
        plan = qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        for node in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
            assert node not in plan, f"{name}: {node} above the decode barrier"


def test_cosine_kernel_matches_jvm_fold_bitwise(spark, sf_dir):
    """The Arrow cosine kernel must equal the Catalyst fold BIT-FOR-BIT on
    the real embeddings (cumsum = the fold's sequential adds) — the property
    d6's verify stage and its full-precision oracle depend on — plus the
    null/length-mismatch edge semantics (NULL, like zip_with's padding)."""
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.functions.columns import (
        cosine_similarity,
        cosine_similarity_udf,
    )

    e = load_table(spark, sf_dir, "embeddings").limit(300)
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__a"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__b"))
    pairs = a.crossJoin(b).where((F.col("id_a") % 7 == 0) & (F.col("id_b") % 5 == 0))
    cos = cosine_similarity_udf()
    rows = pairs.select(
        "id_a",
        "id_b",
        cosine_similarity(F.col("__a"), F.col("__b")).alias("fold"),
        cos(F.col("__a"), F.col("__b")).alias("kernel"),
    ).collect()
    assert rows
    import struct

    for r in rows:
        fb = struct.pack("<d", r.fold)
        kb = struct.pack("<d", r.kernel)
        assert fb == kb, f"({r.id_a},{r.id_b}): {r.fold!r} != {r.kernel!r}"

    edge = spark.createDataFrame(
        [
            (1, [1.0, 2.0], [1.0, 2.0, 3.0]),  # length mismatch -> NULL
            (2, None, [1.0, 2.0]),  # null side -> NULL
            (3, [1.0, 0.0], [0.0, 1.0]),  # orthogonal -> 0.0
        ],
        "i long, a array<double>, b array<double>",
    )
    got = {r.i: r.c for r in edge.select("i", cos("a", "b").alias("c")).collect()}
    assert got[1] is None and got[2] is None and got[3] == 0.0
