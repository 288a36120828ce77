"""Physical-plan shape assertions — the 100 TB posture, checked in CI.

Correctness tests prove the small-SF answer; these prove the *plan* is the one
that survives a 1000-executor scale-up: filters reach the parquet scan, small
dimensions broadcast instead of shuffling, top-k never globally sorts, and
aggregates are two-phase (map-side partial). A regression here is a silent
10-100x at scale long before it is a wrong answer.
"""

import pytest

from guardian_for_apache_kafka_spark.plans import all_queries


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = all_queries()

    def plan_of(name: str) -> str:
        # AQE defers join/exchange decisions to runtime; disable it while
        # dumping so the static plan exposes the strategy choices to assert on
        # (the engine's sessions run with AQE on — it can only improve these).
        prev = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            return qs[name](spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev)

    return plan_of


def test_q01_filter_pushed_to_scan(plans):
    p = plans("q01_scan_filter_project")
    assert "PushedFilters: [" in p
    assert "l_shipdate" in p.split("PushedFilters:")[1].split("]")[0]


def test_q01_scan_prunes_columns(plans):
    # the lineitem scan must not read all 16 columns for a 5-column projection
    p = plans("q01_scan_filter_project")
    read_schema = p.split("ReadSchema:")[1].split("\n")[0]
    assert "l_comment" not in read_schema and "l_shipmode" not in read_schema


def test_q03_dimensions_broadcast(plans):
    # customer/nation/region are dims: no shuffle join anywhere in Q5-shape
    p = plans("q03_multiway_join")
    tree = p.split("\n\n")[0]  # the plan tree, before per-node detail sections
    assert tree.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in tree


def test_q04_part_side_broadcast(plans):
    assert "BroadcastHashJoin" in plans("q04_broadcast_join")


def test_q06_semi_anti_plan(plans):
    p = plans("q06_semi_anti_join")
    assert "LeftSemi" in p and "LeftAnti" in p


def test_q12_topk_never_global_sorts(plans):
    assert "TakeOrderedAndProject" in plans("q12_topk")


def test_q02_two_phase_aggregate(plans):
    # partial (map-side) agg before the shuffle, final after
    p = plans("q02_hash_aggregate_tpch_q1")
    assert "partial_sum" in p or "Partial" in p
    assert "HashAggregate" in p


def test_q02_codegen_covers_agg(plans):
    # the hot path (scan -> filter -> partial agg) stays in whole-stage codegen
    assert "[codegen id :" in plans("q02_hash_aggregate_tpch_q1")


def test_g6_single_shuffle_for_latest_per_key(plans):
    # latest-per-key = window over one hash-partition exchange; a second
    # exchange would mean the sort/window repartitioned needlessly
    p = plans("g6_compaction_latest_by_key")
    assert p.count("Arguments: hashpartitioning") == 1
    # Spark 4 plans the rn=1 filter as WindowGroupLimit with a Partial
    # (map-side) phase — keep that: it prunes to 1 row/key before the shuffle
    assert "WindowGroupLimit" in p and "Partial" in p


def test_q27_sessionization_single_hash_exchange(plans):
    # lag-window, running-sum window, and the per-session aggregate must all
    # sit on ONE hashpartitioning(user_id) exchange: partitioning by user_id
    # already co-locates every (user_id, session_id) group, so a second hash
    # exchange before the aggregate would be a pure regression at scale
    p = plans("q27_sessionization")
    tree = p.split("\n\n")[0]
    assert p.count("Arguments: hashpartitioning") == 1
    assert tree.count("Window") == 2


def test_q29_unpivot_generates_without_extra_exchange(plans):
    # the stack() melt must run as a Generate directly over the aggregate
    # output: one hashpartitioning exchange for the groupBy, nation broadcast,
    # and no extra shuffle between aggregate and Generate — a UNION-ALL style
    # plan would triple-scan and re-shuffle the aggregated input
    p = plans("q29_unpivot")
    tree = p.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    assert "Generate" in tree
    assert p.count("Arguments: hashpartitioning") == 1
    assert tree.count("Union") == 0


def test_d4_lsh_join_carries_ids_only(plans):
    # the LSH bucket self-join must not shuffle 64-long signatures; sig
    # columns re-attach after the distinct — check no exchange row wider
    # than (id, band, bh) feeds the join
    p = plans("d4_minhash_lsh_dedup")
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p
    join_section = p.split("Join")[1][:2000]
    assert "__sig" not in join_section.split("Output")[0]


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Co-bucketed tables joined on the bucket key must plan with zero
    Exchange nodes — the scan delivers the hash distribution (and, with
    sortBy, the sort order)."""
    from guardian_for_apache_kafka_spark.operators.bucketing import bucketed_join, write_bucketed
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    # managed tables land in the session's spark-warehouse dir (static conf);
    # DROP TABLE in the finally block removes the files
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS o_custkey", "c_nationkey"
    )
    write_bucketed(orders, "b_orders", "o_custkey", 4)
    write_bucketed(cust, "b_cust", "o_custkey", 4)
    try:
        prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        # force a non-broadcast join so the shuffle question is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        joined = bucketed_join(spark, "b_orders", "b_cust", "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        # and it computes the same thing as the unbucketed join
        assert joined.count() == orders.join(cust, "o_custkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")


def test_q30_distribution_functions_share_one_window(plans):
    # ntile/percent_rank/cume_dist share one (c_mktsegment | acctbal,custkey)
    # sort: one hash exchange, ONE Window operator — three separate windows
    # would re-sort the partition three times
    p = plans("q30_window_distribution")
    tree = p.split("\n\n")[0]
    assert p.count("Arguments: hashpartitioning") == 1
    assert tree.count("Window") == 1


def test_q32_exists_decorrelates_to_broadcast(plans):
    # the EXISTS subquery must plan as a two-phase distinct (map-side partial
    # before its shuffle) whose tiny result BROADCASTS back to supplier —
    # shuffling supplier to meet lineitem would invert the size relationship
    p = plans("q32_exists_subquery")
    tree = p.split("\n\n")[0]
    assert "BroadcastHashJoin LeftOuter" in tree
    assert tree.count("SortMergeJoin") == 0
    # heavy-supplier filter reaches the lineitem scan (any of the scans'
    # PushedFilters blocks — supplier's own block comes first in the dump)
    pushed = [s.split("]")[0] for s in p.split("PushedFilters:")[1:]]
    assert any("l_quantity" in s for s in pushed)


def test_q33_value_frames_share_one_window(plans):
    # first/last/nth (unbounded frame) and row_number (running frame) share
    # the same partition+order key, so Spark must evaluate all four in ONE
    # Window operator over one exchange — no per-frame re-sort
    p = plans("q33_value_window_frames")
    tree = p.split("\n\n")[0]
    assert p.count("Arguments: hashpartitioning") == 1
    assert tree.count("Window") == 1


def test_p2_dedup_shuffle_carries_digest_not_text(plans):
    # the exact-dedup groupBy keys on the sha2 digest: its exchange must not
    # carry the text column (whole documents over the wire at 100 TB) — only
    # the digest grouping expression and the min-struct aggregation buffer
    p = plans("p2_training_pipeline")
    import re
    first_exchange = re.search(r"\(\d+\) Exchange\n(Input.*?)\n", p).group(1)
    assert "text#" not in first_exchange
    # both aggregates stay two-phase (partial before each exchange)
    assert p.count("Arguments: hashpartitioning") == 2


def test_q37_lateral_decorrelates_to_window_limit(plans):
    # the LATERAL top-2 must decorrelate: partial WindowGroupLimit before the
    # exchange (prunes to <=2 rows/custkey map-side), then a hash join back
    # to customer — never a per-row rescan (nested-loop) of orders
    p = plans("q37_lateral_topk_per_group")
    tree = p.split("\n\n")[0]
    assert tree.count("WindowGroupLimit") >= 2
    assert "NestedLoop" not in tree and "CartesianProduct" not in tree


def test_q38_gap_fill_broadcasts_grid_and_limits(plans):
    # the densified (types x hours) grid is tiny: the hourly aggregate must
    # BROADCAST into the left join (never shuffle the grid), and the final
    # ORDER BY ... LIMIT must plan as TakeOrderedAndProject, not a global sort
    p = plans("q38_gap_fill_resample")
    tree = p.split("\n\n")[0]
    assert "BroadcastHashJoin LeftOuter" in tree
    assert "TakeOrderedAndProject" in tree
    assert "SortMergeJoin" not in tree


def test_q39_salted_join_spreads_hot_keys(spark, sf_dir):
    """With broadcast and AQE disabled (the regime salting exists for —
    broadcast-ineligible build sides, pre-AQE engines), the salted join's
    exchanges must hash-partition on (event_type, __salt): each hot key
    spreads over `buckets` reducer keys instead of landing on one reducer.
    The build side replicates via explode.

    Exercised through ``salted_join`` with an UNHINTED dim (q39's builder
    now carries an explicit broadcast hint on its literal 5-row dim — the
    right local plan for that query — and a hint overrides the threshold
    conf, so the no-broadcast regime this test pins is the operator's)."""
    import re

    from guardian_for_apache_kafka_spark.functions.skew import salted_join
    from guardian_for_apache_kafka_spark.plans.relational_queries import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 10), ("signup", 5), ("logout", 3)],
        "event_type string, weight long",
    )
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            salted_join(ev, dim, on="event_type", buckets=16)
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
    # both join-input exchanges carry the salt in the partitioning key
    salted_exchanges = re.findall(r"hashpartitioning\([^)]*__salt[^)]*\)", plan)
    assert len(salted_exchanges) >= 2, plan
    # the dimension side is replicated buckets-fold via explode
    assert "explode(" in plan, plan
    # and the probe side's salt is deterministic (xxhash64, not rand)
    assert "xxhash64" in plan, plan


def test_q39_query_builds_broadcast_on_dim(spark, sf_dir):
    """q39's own plan must broadcast the replicated DIM side, never the
    events fact table: the stats-less createDataFrame dim used to defeat
    auto-broadcast, flipping Spark to BuildLeft over events — backwards
    at any scale (r11 tier-3 fix: explicit hint in the builder)."""
    from guardian_for_apache_kafka_spark.plans import all_queries

    plan = (
        all_queries()["q39_salted_skew_join"](spark, sf_dir)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    )
    assert "BuildRight" in plan, plan
    assert "BuildLeft" not in plan, plan


def test_t7_repetition_stats_zero_shuffle(plans):
    """The repetition report is per-row expressions + top-k: the computation
    itself must never hash-shuffle — an explode+groupBy formulation would
    shuffle the whole corpus for a per-document signal. The only exchange
    allowed is the narrow-input layout spread (round-robin), which is a no-op
    on a well-partitioned 100 TB input."""
    plan = plans("t7_repetition_stats")
    assert "hashpartitioning" not in plan, plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") <= 1, plan
    assert tree.count("Scan parquet") == 1, plan


def test_s3_knn_votes_broadcast_corpus_never_shuffles(plans):
    """kNN classify: the |Q| x k neighbor set must broadcast into the label
    join; the corpus label projection must not hash-exchange on vec_id."""
    import re

    plan = plans("s3_knn_classify")
    assert "BroadcastExchange" in plan, plan
    # no shuffle keyed on the corpus id column
    assert not re.search(r"Exchange hashpartitioning\(vec_id", plan), plan


def test_spread_narrow_scan_contract(spark, tmp_path):
    """spread_narrow_scan widens a 1-partition scan to the session's shuffle
    parallelism, leaves an already-wide frame untouched (no gratuitous
    exchange), and passes streaming frames through (no .rdd probe)."""
    from guardian_for_apache_kafka_spark.core.model import RECORD_SCHEMA
    from guardian_for_apache_kafka_spark.operators.layout import spread_narrow_scan

    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    narrow = spark.range(0, 1000).coalesce(1)
    assert spread_narrow_scan(narrow).rdd.getNumPartitions() == target

    wide = spark.range(0, 1000).repartition(target)
    assert spread_narrow_scan(wide) is wide  # no-op, not merely same count

    src = str(tmp_path / "stream_src")
    spark.range(0, 10).write.parquet(src)
    stream = spark.readStream.schema("id LONG").parquet(src)
    assert spread_narrow_scan(stream) is stream


def test_d10_stratified_rebalance_single_scan_no_udf(plans):
    """The rebalance filter is one scan of pure JVM expressions (md5 CASE
    chain); the only shuffles are the per-stratum window count + final sort."""
    plan = plans("d10_stratified_rebalance")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, plan
    assert "Python" not in plan, plan  # no UDF in the membership math


def test_q42_activity_correlation_broadcast_pair_join(plans):
    """The bounded profile pair join must broadcast (no sort-merge join of
    the profile frames) and the 24-bucket grid must be a broadcast range,
    so the event log is scanned, aggregated, and never pair-shuffled."""
    plan = plans("q42_activity_correlation")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q44_zscore_single_window_single_exchange(plans):
    """Rolling z-score: all three frame aggregates fuse into ONE Window
    operator over ONE hash exchange on the key; the scan reads only the four
    needed event columns (props/user_id never ride the shuffle)."""
    p = plans("q44_rolling_zscore_anomaly")
    tree = p.split("\n\n")[0]
    assert tree.count("Window") == 1, p
    assert p.count("hashpartitioning(event_type") == 1, p
    read_schema = p.split("ReadSchema:")[1].split("\n")[0]
    assert "props" not in read_schema and "user_id" not in read_schema


def test_q45_funnel_one_exchange_no_join(plans):
    """Funnel: stacked same-spec windows + the per-user aggregate reuse ONE
    hash partitioning on user_id; no self-joins, no extra exchanges beyond
    the final presentation sort."""
    p = plans("q45_funnel_steps")
    tree = p.split("\n\n")[0]
    assert p.count("hashpartitioning(user_id") == 1, p
    assert "Join" not in tree, p


def test_d14_decontaminate_broadcasts_eval_grams(plans):
    """N-gram decontamination: the eval gram set must broadcast — the
    exploded corpus gram stream joins map-side with no shuffle keyed on the
    gram."""
    import re

    p = plans("d14_ngram_decontaminate")
    tree = p.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree, p
    assert not re.search(r"Exchange hashpartitioning\(__g", tree), p


def test_t10_t11_no_python_udf(plans):
    """PII scrub and df-scoring are pure JVM expression pipelines."""
    for name in ("t10_pii_scrub", "t11_token_df_scores"):
        assert "Python" not in plans(name).split("\n\n")[0], name


def test_p4_mixture_single_window_rank(plans):
    """Temperature mixture: membership is one ranking window per group plus
    broadcast quota join — the corpus never hash-exchanges twice."""
    p = plans("p4_temperature_mixture")
    tree = p.split("\n\n")[0]
    assert tree.count("Exchange hashpartitioning(lang") <= 1, p
    assert "BroadcastHashJoin" in tree, p


def test_d13_semantic_dedup_no_corpus_shuffle_in_assignment(plans):
    """SemDeDup: cluster assignment is literal-centroid projection work —
    the only hash exchanges are the pair join keys and id-side joins; no
    crossJoin (BroadcastNestedLoopJoin) anywhere."""
    p = plans("d13_semantic_dedup")
    tree = p.split("\n\n")[0]
    assert "BroadcastNestedLoopJoin" not in tree, p
    assert "CartesianProduct" not in tree, p


def test_q46_bucketed_join_no_exchange(plans):
    """Co-bucketed fact-to-fact join: the SortMergeJoin must see NO Exchange
    on either input — the only exchanges are the post-join aggregate and the
    presentation sort. This is the assertion that the write-time bucket
    layout, not a per-query shuffle, co-locates the join at 100 TB."""
    p = plans("q46_bucketed_colocated_join")
    tree = p.split("\n\n")[0]
    assert "SortMergeJoin" in tree, p
    join_subtree = tree.split("SortMergeJoin")[1]
    assert "Exchange" not in join_subtree, p
    assert tree.count("Exchange") == 2, p  # groupBy agg + final orderBy only


def test_m4_video_frames_arrow_fanout(plans):
    """Video frame extraction: one MapInPandas (Arrow) stage; the only
    exchange below it is the deliberate round-robin spread of the narrow
    scan (operators/layout.py) — blobs never HASH-shuffle (no key exchange),
    and the per-frame fan-out happens inside the Arrow stage."""
    p = plans("m4_video_frames")
    tree = p.split("\n\n")[0]
    assert "MapInPandas" in tree, p
    assert "hashpartitioning" not in p, p


def test_t13_boilerplate_single_md5_shuffle(plans):
    """Boilerplate inventory: chunking is map-only; the only exchanges are
    the two-phase distinct-count pair keyed on chunk_md5 (+doc_id in phase
    one) — fixed-width keys, never chunk text — plus the presentation
    sort. No joins anywhere."""
    p = plans("t13_boilerplate_chunks")
    tree = p.split("\n\n")[0]
    assert 1 <= p.count("hashpartitioning(chunk_md5") <= 2, p
    assert "Join" not in tree, p
    # chunk text must not ride any exchange: both partial-agg outputs are
    # (md5, id) / (md5, count) projections
    assert "__chunk" not in p.split("Exchange")[1], p


def test_d15_bloom_prefilter_before_exchange(plans):
    """Bloom decontamination: the probe predicate (element_at & shiftleft
    over the literal filter words) must run MAP-SIDE as a pure JVM Filter
    directly over the exploded gram stream — before any join/exchange — so
    only bloom hits ever leave the scan stage. The confirm join's strategy
    is Catalyst's to pick (broadcast at test scale, shuffle when the
    blocklist outgrows the budget)."""
    import re

    p = plans("d15_bloom_decontaminate")
    tree = p.split("\n\n")[0]
    assert "Join" in tree, p
    assert "Python" not in tree, p  # probe is codegen'd, not a UDF
    # a Filter node whose condition computes the bloom probe
    filter_blocks = re.split(r"\(\d+\) Filter", p)[1:]
    assert any("shiftleft" in b.split("\n\n")[0] for b in filter_blocks), p


def test_q48_sketch_rollup_mergeable_pipeline(plans):
    """Mergeable-sketch rollup: per-day sketches built then UNIONED — both
    HLL stages present, partial aggregation before each exchange (the
    pre-aggregation pattern that lets a 100 TB pipeline materialize daily
    sketches and never rescan raw data for the monthly rollup)."""
    p = plans("q48_sketch_rollup")
    assert "hll_sketch_agg" in p, p
    assert "hll_union_agg" in p, p
    tree = p.split("\n\n")[0]
    assert "ObjectHashAggregate" in tree, p


def test_q49_partition_pruning_reaches_scan(plans):
    """The date band must prune at the PARTITION level: PartitionFilters on
    day bounds in the scan node, and no post-scan Filter at all — rows from
    other days are never even read."""
    p = plans("q49_partition_pruned_scan")
    assert "PartitionFilters: [" in p, p
    pf = p.split("PartitionFilters: [")[1].split("]")[0]
    assert "day" in pf and ">=" in pf and "<=" in pf, p
    tree = p.split("\n\n")[0]
    assert "Filter" not in tree, p


def test_q50_profile_is_single_scan(plans):
    """Profiling all columns must be ONE aggregate over ONE scan (plus the
    count-distinct Expand), never a per-column rescan: exactly one parquet
    Scan node in the plan."""
    p = plans("q50_table_profile")
    tree = p.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, p
    read_schema = p.split("ReadSchema:")[1].split("\n")[0]
    assert "l_comment" not in read_schema and "l_orderkey" not in read_schema


def test_t14_cross_entropy_model_broadcasts(plans):
    """LM scoring: the unigram model (vocabulary-sized) must BROADCAST onto
    the exploded token stream — the only hash exchanges are the model build
    (token key) and the per-doc average (id key); the corpus token stream
    itself never hash-shuffles for the scoring join."""
    p = plans("t14_unigram_cross_entropy")
    tree = p.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree, p
    assert "SortMergeJoin" not in tree, p


def test_t15_bigram_model_broadcasts(plans):
    """Bigram-LM scoring: the model joins onto the bigram stream via
    broadcast (the pinned branch); the stream itself never hash-shuffles
    for the scoring join."""
    p = plans("t15_bigram_cross_entropy")
    tree = p.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree, p
    assert "SortMergeJoin" not in tree, p


def test_q55_ivm_never_rebuilds_snapshot(plans):
    """IVM: the new rollup must come from old_agg FULL OUTER delta_agg —
    two aggregates joined — with the merged snapshot never materialized:
    no join below either aggregate, and the only exchanges are the two
    group-keyed agg shuffles plus the presentation sort."""
    p = plans("q55_incremental_agg_maintenance")
    tree = p.split("\n\n")[0]
    assert "FullOuter" in tree, p
    join_inputs = tree.split("FullOuter")[1]
    assert "Join" not in join_inputs, p  # aggregates only below the combine
    assert tree.count("Exchange") == 3, p


def test_q56_sketch_prefilter_before_count_shuffle(plans):
    """Heavy hitters: the Misra-Gries candidate pass is an Arrow
    MapInPandas stage, and the exact count aggregates a LeftSemi-broadcast-
    prefiltered token stream — only candidate tokens reach the count
    exchange (d15's prefilter-then-confirm shape)."""
    p = plans("q56_heavy_hitters")
    tree = p.split("\n\n")[0]
    assert "MapInPandas" in tree, p
    assert "LeftSemi BuildRight" in tree, p
    # the semi prefilter must sit BELOW the exact-count aggregate pair
    agg_subtree = tree.split("LeftSemi")[0]
    assert "HashAggregate" in agg_subtree, p


def test_q57_single_window_exchange(plans):
    """Time travel: one latest-per-key window over ONE key exchange (plus
    the presentation sort) — the g6 latest-per-key discipline; the version
    predicate prunes the log before the shuffle."""
    p = plans("q57_snapshot_time_travel")
    assert p.count("Arguments: hashpartitioning") == 1, p
    # two WindowGroupLimit nodes = the Partial (map-side, before the
    # exchange) and Final prune to 1 row/key — the g6 discipline
    assert p.split("\n\n")[0].count("WindowGroupLimit") == 2, p


def test_s6_mmr_corpus_never_shuffles(plans):
    """MMR: the corpus-scale work is the broadcast-query top-pool scan; the
    pool-sized stages (pair sims, greedy walk) run on broadcasts + ONE
    Arrow group — the corpus itself never hash-shuffles (the only key
    exchange feeds the pool-sized applyInPandas group)."""
    p = plans("s6_mmr_diverse_topk")
    tree = p.split("\n\n")[0]
    assert "FlatMapGroupsInPandas" in tree or "ApplyInPandas" in tree, p
    assert "BroadcastNestedLoopJoin" in tree or "BroadcastHashJoin" in tree, p
    # hash exchanges: the rnk window for the pool + the single-group walk
    # (+1 for the final orderBy range exchange is not hashpartitioning)
    assert p.count("Arguments: hashpartitioning") <= 2, p


def test_t14_broadcast_gate_branches(spark, sf_dir):
    """The vocab-size gate (VERDICT r5 #3) must actually change strategy:
    forced-broadcast plans a BroadcastHashJoin for the scoring join; a
    vocabulary over the limit (auto-gate with limit=0) falls back to a
    shuffle join — and both branches return identical scores."""
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.operators.text import unigram_cross_entropy
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").limit(50)
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # emulate a model past the broadcast budget: with auto-broadcast off, the
    # gated-off branch must NOT pin a broadcast hint (that hint overrides the
    # threshold — exactly the 100 TB OOM the gate exists to prevent), while
    # the forced branch still broadcasts via its explicit hint
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bc = unigram_cross_entropy(d, broadcast_model=True)
        sh = unigram_cross_entropy(d, broadcast_vocab_limit=0)  # auto-gate -> over limit
        bc_plan = bc._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        sh_plan = sh._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        sh_rows = {
            row.doc_id: row.ce
            for row in sh.select(
                "doc_id", F.round("cross_entropy", 6).alias("ce")
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
    # scoring join: broadcast on one branch, shuffle (sort-merge) on the other
    assert "BroadcastHashJoin" in bc_plan.split("\n\n")[0]
    assert "SortMergeJoin" in sh_plan.split("\n\n")[0], sh_plan
    bc_rows = {
        row.doc_id: row.ce
        for row in bc.select("doc_id", F.round("cross_entropy", 6).alias("ce")).collect()
    }
    assert bc_rows == sh_rows


def test_q58_merge_reaggregates_bins_not_raw(plans):
    """Histogram quantile rollup: exactly TWO raw scans — the daily
    histogram build and the exact-percentile verdict pass (which a
    production rollup skips); the merge and the quantile walk operate on
    the bin table (window over bin order), never raw rows."""
    p = plans("q58_histogram_quantile_rollup")
    tree = p.split("\n\n")[0]
    assert tree.count("Scan parquet") == 2, p
    assert "Window" in tree, p


def test_q61_single_key_exchange(plans):
    """SCD-2 history: ONE lead() window over ONE key exchange (plus the
    presentation sort) — the whole history table costs a single shuffle."""
    p = plans("q61_scd2_history")
    assert p.count("Arguments: hashpartitioning") == 1, p


def test_q62_runtime_bloom_filter_injected(spark, sf_dir):
    """Under at-scale conditions (both sides too big to broadcast, fact
    scan over the application threshold) the optimizer must inject a
    runtime bloom filter: ``bloom_filter_agg`` on the filtered orders side
    and ``might_contain(Subquery ...)`` in the lineitem scan's Filter — the
    row-level runtime pruning q62 relies on at 100 TB."""
    from guardian_for_apache_kafka_spark.plans import all_queries

    knobs = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    )
    prev = {k: spark.conf.get(k) for k in knobs}
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = all_queries()["q62_runtime_filtered_join"](spark, sf_dir)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    finally:
        for k in knobs:
            spark.conf.set(k, prev[k])
    assert "bloom_filter_agg" in p, p
    assert "might_contain" in p, p


def test_q63_dynamic_partition_pruning_fires(plans):
    """The opaque dim filter cannot transfer statically, so the fact scan
    must carry a dynamicpruningexpression in its PartitionFilters — runtime
    partition-level pruning (and the static filters must NOT contain the
    hash predicate, which would mean the test dim wasn't opaque)."""
    p = plans("q63_dynamic_partition_pruning")
    assert "dynamicpruningexpression" in p, p
    # inspect the PartitionFilters block that CARRIES the dpp expression
    # (the fact scan); its static part must be bare isnotnull — any other
    # static predicate would mean the dim filter transferred and DPP is no
    # longer doing the pruning
    fact_filters = next(
        blk.split("]")[0]
        for blk in p.split("PartitionFilters:")[1:]
        if "dynamicpruningexpression" in blk.split("]")[0]
    )
    static = [
        f.strip()
        for f in fact_filters.strip(" [").split(",")
        if "dynamicpruning" not in f
    ]
    assert all(f.startswith("isnotnull") for f in static if f), fact_filters


def test_t17_entropy_zero_shuffle(plans):
    """Char entropy is per-row fold arithmetic: no KEY exchange anywhere
    (the only exchanges are the deliberate round-robin spread of the
    narrow scan and the presentation sort) and no explode of corpus
    characters."""
    p = plans("t17_char_entropy")
    tree = p.split("\n\n")[0]
    assert "hashpartitioning" not in p, p
    assert "Generate" not in tree, p  # no explode of characters


def test_q64_stacked_windows_single_exchange(plans):
    """The reset-segment window and the within-segment balance window must
    share ONE user-keyed exchange: (user, seg) partitioning refines (user),
    so the second window re-sorts locally instead of reshuffling."""
    p = plans("q64_running_balance_with_resets")
    assert p.count("Arguments: hashpartitioning") == 1, p
    assert p.split("\n\n")[0].count("Window") == 2, p


def test_q72_interval_coalesce_single_user_exchange(plans):
    """Interval coalescing: the window pair (running max-end + island sum)
    and the island groupBy must all ride ONE user_id hash exchange — a
    second hashpartitioning(user_id) would mean the island groupBy
    re-shuffles what the window already partitioned."""
    plan = plans("q72_interval_coalesce")
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_d16_join_key_is_variant_hash_not_text(plans):
    """SymSpell join: the candidate equi-join's key must be the int64
    variant hash (__h), never raw variant strings; the r12
    position-augmented discipline (same-deletion-position for
    substitutions, exactly-one-self for indels) must sit in the join
    condition BEFORE the exact levenshtein verify, so the O(len^2) verify
    only pays for true pairs + hash collisions. The join strategy is
    Catalyst's choice (broadcast at test scale, shuffled hash at corpus
    scale) — only the key and the filter order are contractual. Since the
    r11 barrier, the variant index enters the plan as a checkpointed RDD
    scan (the xxhash64 computation materializes once below it — the t20
    shape), so the key contract is asserted on the join keys' int64 type,
    not on the hash expression's presence in the dumped tree."""
    import re

    plan = plans("d16_edit_distance_pairs")
    assert "Scan ExistingRDD" in plan, plan
    assert "levenshtein" in plan, plan
    assert re.search(r"Left keys \[1\]: \[__h#\d+L\]", plan), plan
    assert re.search(r"Right keys \[1\]: \[__h#\d+L\]", plan), plan
    # the position/self discipline is part of the candidate join's
    # condition (other joins in the tree — the hot-bucket anti-join —
    # carry none)
    conds = re.findall(r"Join condition: .*", plan)
    assert any("__ia" in c and "__sa" in c and "levenshtein" in c for c in conds), plan
    # no equi-join keys on raw strings anywhere in the candidate tree
    for m in re.finditer(r"(Left|Right) keys \[\d+\]: \[([^\]]*)\]", plan):
        assert "__s#" not in m.group(2) and "__v#" not in m.group(2), m.group(0)


def test_t20_exchanges_carry_hashes_not_text(plans):
    """Shingle-duplication profile: the downstream plan reads the
    localCheckpointed (doc, shingle-hash, count) rollup — an int64-only
    RDD scan (the r8 de-skew shape) — so document text can never cross a
    keyed shuffle, there is NO window node (document frequency is a
    combined groupBy, not COUNT OVER PARTITION BY shingle), and every
    hash exchange carries only long columns."""
    import re

    plan = plans("t20_shingle_duplication")
    # the expensive shingle stream is materialized once at checkpoint time;
    # everything after scans the compact rollup
    assert "Scan ExistingRDD" in plan, plan
    assert "Window" not in plan, plan
    for m in re.finditer(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\nArguments: hashpartitioning",
        plan,
    ):
        assert "text#" not in m.group(1), m.group(1)
        assert re.fullmatch(r"(\s*\w+#\d+L,?)+\s*", m.group(1)), m.group(1)


def test_q74_q79_broadcast_thresholds_not_value_shuffle(plans):
    """Robust-stats queries: the percentile threshold tables broadcast back
    onto the event stream; the raw corpus must never hash-exchange on
    value (only event_type-keyed aggregate exchanges are allowed)."""
    for name in ("q74_mad_outliers", "q79_winsorized_stats"):
        plan = plans(name)
        assert "BroadcastExchange" in plan, name
        assert "hashpartitioning(value" not in plan, name


def test_q82_session_and_trigram_share_user_exchange(plans):
    """Session numbering and the trigram leads both partition by user; the
    plan must not re-exchange between them (one hashpartitioning(user_id),
    plus only the tiny path-count aggregate exchange)."""
    plan = plans("q82_session_paths")
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_q96_group_limit_prunes_before_exchange(plans):
    """Diversity-constrained top-k: the per-customer rank must plan with
    WindowGroupLimit (partial, map-side) so each group prunes to its cap
    BEFORE the exchange, and the global k must be TakeOrdered — never a
    global Sort."""
    plan = plans("q96_diverse_topk")
    assert "WindowGroupLimit" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_q95_pairs_generated_in_array(plans):
    """Audience overlap: the type-pair fan-out happens INSIDE the per-user
    array (Generate over collect_list output) — a second self-join
    formulation would re-exchange the distinct stream."""
    import re

    plan = plans("q95_audience_overlap")
    assert re.search(r"\(\d+\) Generate", plan) and "explode" in plan, plan
    # distinct + per-user collect + matrix count: three keyed exchanges max
    assert plan.count("Arguments: hashpartitioning") <= 3, plan


def test_q97_dim_broadcasts_no_sort_merge(plans):
    """Gini concentration: the customer segment dim must broadcast onto
    orders (no SortMergeJoin anywhere); the only hash exchanges are the
    per-customer spend aggregate and the segment-keyed rank window."""
    plan = plans("q97_gini_concentration")
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree, plan
    assert "SortMergeJoin" not in tree, plan


def test_q98_single_user_exchange(plans):
    """Markov transitions: session numbering (lag + running sum) and the
    transition lead must all ride ONE user_id hash exchange — the only
    other keyed exchange is the |types|^2 transition-count aggregate."""
    plan = plans("q98_markov_transitions")
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_q100_contract_checks_single_scan(plans):
    """Data-contract validation: all five checks plus the row count must
    fold into ONE aggregate over ONE events scan — a per-check rescan
    multiplies the 100 TB read by the number of checks."""
    plan = plans("q100_contract_checks")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, plan


def test_q101_no_corpus_window_and_midranks_broadcast(plans):
    """Global-rank drift: the running below-count window must run over the
    length DOMAIN (n_tok, cnt — distinct-value-sized), never the corpus
    stream, and the midrank table must broadcast back onto the stream.
    A corpus-sized SinglePartition sort is the failure mode this guards."""
    import re

    plan = plans("q101_rank_drift")
    assert "BroadcastHashJoin" in plan, plan
    # every SinglePartition exchange feeds domain-shaped rows, not documents
    for m in re.finditer(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\nArguments: SinglePartition",
        plan,
    ):
        cols = m.group(1)
        assert "text#" not in cols and "source#" not in cols, cols


def test_p12_epoch_plan_single_scan_broadcast_scalars(plans):
    """Epoch plan: ONE documents scan feeding a source-keyed partial
    aggregate; the fold/total scalars come back via BroadcastExchange
    (BroadcastNestedLoopJoin on the 1-row side) — a second corpus scan or
    a non-broadcast join would pay the whole read twice at 100 TB."""
    plan = plans("p12_epoch_plan")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") <= 2, plan  # cnt reused; scalars derive from it
    assert "BroadcastExchange" in tree, plan
    assert "SortMergeJoin" not in tree, plan


def test_d25_duplicate_spans_long_only_shuffles(plans):
    # substring dedup: the inverted-index join + islands window must shuffle
    # (id, pos, hash64) longs only — no string shingles past the projection,
    # no Python evaluation anywhere
    p = plans("d25_duplicate_spans")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    # the islands window reuses the join's (id_a, id_b) clustering up to the
    # diagonal; groupBy on (pair, diag, grp) must NOT add a 4th exchange:
    # subset-clustering satisfies the aggregate's distribution
    tree = p.split("== Physical Plan ==")[1]
    assert tree.count("Exchange hashpartitioning") <= 3, p


def test_d26_span_excision_no_python_eval(plans):
    # the interval membership probe is a nested JVM higher-order function
    # (filter + exists), never a Python UDF; the corpus-side join on doc_id
    # adds exactly one exchange over d25's three
    p = plans("d26_span_excision")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_t24_gopher_rules_map_only(plans):
    """The Gopher rule battery is the funnel's FIRST stage: every rule is a
    per-row higher-order expression over the hoisted token/line arrays —
    no joins, no aggregation shuffle; the only exchange is the
    presentation sort's range partitioning."""
    p = plans("t24_gopher_rules")
    tree = p.split("\n\n")[0]
    assert "Join" not in tree, p
    assert "hashpartitioning" not in tree, p
    assert tree.count("Exchange") <= 1, p


def test_d27_decontaminate_bench_side_capped_join(plans):
    """Cross-corpus span decontamination: the train-x-bench match join is
    keyed on the int64 shingle hash (never text) with the benchmark-sized
    side BROADCAST (at 100 TB the bench index is MBs against a TB train
    scan — Catalyst picks broadcast here and must keep doing so); no
    cartesian anywhere, no Python eval, and the islands window sits on
    (pair, diagonal) partitions."""
    p = plans("d27_span_decontaminate")
    tree = p.split("\n\n")[0]
    assert "CartesianProduct" not in tree, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert "BroadcastHashJoin" in tree or "hashpartitioning(__s" in p, p
    assert "hashpartitioning(train_id" in p, p


def test_zorder_write_prunes_files_for_box_predicate(spark, sf_dir, tmp_path):
    """The physical half of q69's locality claim: write the same normalized
    (nx, ny) data once z-ordered and once lexicographically sorted, read
    back only the parquet FOOTER stats, and count which files a quarter-box
    predicate (nx and ny each in a half-range) could touch. The z-layout
    must prune strictly more files — this is the 100 TB data-skipping
    argument measured on disk, not asserted from theory."""
    import pyspark.sql.functions as F

    from guardian_for_apache_kafka_spark.operators.layout import (
        parquet_file_ranges,
        write_zordered,
        zorder_value,
    )
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    base = load_table(spark, sf_dir, "events").select(
        F.pmod(F.xxhash64("event_id"), F.lit(65536)).alias("nx"),
        F.pmod(F.xxhash64("user_id"), F.lit(65536)).alias("ny"),
    )
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "lex")
    write_zordered(base, zdir, "nx", "ny", n_files=64)
    (
        base.repartitionByRange(64, "nx")
        .sortWithinPartitions("nx")
        .write.parquet(ldir)
    )

    # a selective 1/8 x 1/8 box — the shape multi-dim skipping exists for:
    # the lex layout must open every file in the nx slice (each spans the
    # full ny range, ~8 of 64); z-order confines both dims per file
    box = {"nx": (16384, 24575), "ny": (16384, 24575)}

    def touched(path: str) -> int:
        n = 0
        for f in parquet_file_ranges(path, ["nx", "ny"]):
            if all(
                f[c][0] is not None and f[c][0] <= hi and f[c][1] >= lo
                for c, (lo, hi) in box.items()
            ):
                n += 1
        return n

    z_touched, lex_touched = touched(zdir), touched(ldir)
    # lexicographic layout: every file spans the full ny range, so ~half
    # the files (the nx half-range) intersect; z-order confines both dims
    assert z_touched < lex_touched, (z_touched, lex_touched)
    # round-trip sanity: both layouts hold the same rows
    assert spark.read.parquet(zdir).count() == spark.read.parquet(ldir).count()


def test_d28_eval_contamination_corpus_never_shuffles(plans):
    """Eval-side contamination: the benchmark gram set must BROADCAST onto
    the corpus gram stream (semi-join map-side), so no hashpartitioning
    exchange ever carries corpus-scan-sized data — the aggregates downstream
    of the semi-join run on benchmark-sized frames only."""
    p = plans("d28_eval_contamination")
    tree = p.split("\n\n")[0]
    assert "BroadcastHashJoin LeftSemi" in tree, p
    assert "CartesianProduct" not in tree, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_q102_single_scan_and_daily_sized_window(plans):
    """Bounded-lag EWMA: one events scan; the eight-lag window runs over the
    per-(user, day) aggregate, so every exchange after the partial agg
    carries daily rows — a window over raw events (or a per-lag re-scan)
    is the 100 TB failure mode."""
    plan = plans("q102_ewma_smoothing")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, plan
    assert "Window" in plan, plan


def test_q103_one_scan_three_generalization_levels(plans):
    """k-anonymity: the three candidate generalizations must come from ONE
    customer scan via a generator (map-side explode), never three scans or
    a per-level union of re-reads."""
    plan = plans("q103_k_anonymity")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, plan
    assert "Generate" in tree and "explode(" in plan, plan


def test_q104_single_scan_decomposition(plans):
    """Seasonal decomposition: trend, seasonal, and residual all derive from
    windows over the daily aggregate in one lineage — exactly ONE events
    scan (the join-back formulation this replaced scanned the fact table
    twice)."""
    plan = plans("q104_seasonal_decomposition")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, plan


def test_t25_model_broadcasts_onto_stream(plans):
    """Kneser-Ney scoring: the assembled bigram model must BROADCAST onto
    the token stream under the vocabulary gate (a sort-merge join would
    shuffle the whole corpus' bigram stream), and no corpus-sized
    SinglePartition exchange may appear — the scalar N1+(*,*) total is the
    only single-partition value and it feeds a broadcast."""
    import re

    plan = plans("t25_kneser_ney_entropy")
    assert "BroadcastHashJoin" in plan, plan
    for m in re.finditer(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\nArguments: SinglePartition",
        plan,
    ):
        cols = m.group(1)
        assert "text#" not in cols and "doc_id#" not in cols, cols


def test_m7_patch_grid_one_decode_pass_no_blob_shuffle(plans):
    """Patch extraction: decode is exactly ONE MapInPandas pass whose 2x2
    fan-out happens inside the Arrow batch (each blob opened once); the
    global order+limit is a TakeOrdered over patch rows, never a full sort;
    and no exchange ABOVE the decode carries the binary content column —
    patch rows shuffle, blobs don't."""
    plan = plans("m7_patch_grid")
    tree = plan.split("\n\n")[0]
    assert tree.count("MapInPandas") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan
    above_decode = tree.split("MapInPandas")[0]  # operators above the decode
    assert "content#" not in above_decode, above_decode


def test_q106_alloc_join_carries_interval_rows_only(plans):
    """FIFO allocation: ONE events scan feeds both sides (the side filter
    splits AFTER the scan via plan reuse or a second scan of the pruned
    columns is acceptable — what must NOT happen is a corpus-sized
    SinglePartition sort), and the allocation join is user-keyed, never a
    cartesian."""
    plan = plans("q106_fifo_allocation")
    assert "CartesianProduct" not in plan, plan
    import re

    for m in re.finditer(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\nArguments: SinglePartition",
        plan,
    ):
        assert "event_id#" not in m.group(1), m.group(1)


def test_q107_two_aggregates_one_scan(plans):
    """Chi-square readout: per-user flags then four cells — ONE events scan,
    and the final statistic is computed on a single scalar row (no join,
    no window)."""
    plan = plans("q107_ab_test_chisquare")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, plan
    assert "Join" not in tree and "Window" not in tree, plan


def test_p14_no_corpus_wide_rank(plans):
    """Mixture schedule: the global rank runs only over the TakeOrdered
    200-row prefix — the corpus-sized input must reach at most a
    TakeOrdered, never a SinglePartition sort carrying text/source rows."""
    import re

    plan = plans("p14_mixture_schedule")
    assert "TakeOrderedAndProject" in plan, plan
    for m in re.finditer(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\nArguments: SinglePartition",
        plan,
    ):
        cols = m.group(1)
        assert "text#" not in cols, cols


def test_t26_df_broadcasts_and_group_limit(plans):
    """Per-doc keywords: the vocabulary-sized df table must BROADCAST onto
    the tf stream (a token-keyed sort-merge join would shuffle the exploded
    corpus twice), and the per-doc top-3 must plan as WindowGroupLimit —
    pruning to 3 rows/doc before the final exchange."""
    plan = plans("t26_doc_keywords")
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree, plan
    assert "WindowGroupLimit" in tree, plan


def test_d29_cdc_fold_single_hash_shuffle(plans):
    """CDC chunk dedup: segmentation is a map-only fold — exactly ONE
    documents scan and ONE hash exchange (the chunk-hash groupBy); the
    exploded chunk text never shuffles twice."""
    plan = plans("d29_cdc_chunk_dedup")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, plan
    # exact count_distinct(doc_id) needs the standard two-phase distinct:
    # two hash exchanges, both carrying (chunk_hash, ids/ints) — assert the
    # chunk TEXT itself never rides an exchange
    assert plan.count("Arguments: hashpartitioning") <= 2, plan
    import re
    for m in re.finditer(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan
    ):
        assert "chunk#" not in m.group(1), m.group(1)


def test_q109_psi_single_scan(plans):
    """PSI drift: ONE events scan; everything after the per-(period, bin)
    aggregate is bins-sized."""
    plan = plans("q109_psi_drift")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, plan


def test_q111_ipf_windows_on_cell_table_only(plans):
    """IPF raking: the six rescaling windows must all run over the
    contingency-table aggregate — one customer scan, and every window
    input carries cell rows (i, j, n, w), never customer columns."""
    import re

    plan = plans("q111_ipf_raking")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, plan
    for m in re.finditer(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan
    ):
        assert "c_acctbal#" not in m.group(1) and "c_name#" not in m.group(1)


def test_q112_benford_one_tiny_aggregate(plans):
    """Benford audit: one scan, digits aggregate to <= 9 rows before any
    further work; no join back to the fact table."""
    plan = plans("q112_benford_audit")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, plan


def test_t27_kl_runs_on_stats_table(plans):
    """Source KL: pair list broadcasts; no exchange carries document text —
    all divergence arithmetic happens on (source, token, count) rows."""
    import re

    plan = plans("t27_source_kl_divergence")
    assert "BroadcastHashJoin" in plan, plan
    for m in re.finditer(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan
    ):
        assert "text#" not in m.group(1), m.group(1)


def test_t28_burstiness_single_scan_no_doc_join(plans):
    """Token burstiness: moments come from one exploded-scan aggregate plus
    a scalar corpus size — no join back to documents, no window."""
    plan = plans("t28_token_burstiness")
    tree = plan.split("\n\n")[0]
    # documents scanned twice is acceptable (count + tokens are separate
    # aggregates on different projections); what must NOT happen is a
    # token-stream x documents join or a corpus-wide window
    assert "Window" not in tree, plan
    assert "SortMergeJoin" not in tree, plan


def test_q113_sweep_is_partition_parallel(plans):
    """The r6 verdict's one scale-killer, fixed: the concurrency sweep must
    range-partition the boundary points and run its corpus-sized running-sum
    window keyed by spark_partition_id — the ONLY SinglePartition exchange
    allowed is the one feeding the n_parts-row prefix-offset window, i.e. its
    direct child is already an aggregate (HashAggregate), never corpus data."""
    import re

    plan = plans("q113_peak_concurrency")
    tree = plan.split("\n\n")[0]
    # the two-pass structure is present
    assert "rangepartitioning(t#" in plan, plan
    assert "hashpartitioning(__pid#" in plan, plan
    # every SinglePartition exchange feeds off an aggregate, not the corpus
    single_ids = {
        m.group(1)
        for m in re.finditer(
            r"\((\d+)\) Exchange\nInput[^\n]*\nArguments: SinglePartition", plan
        )
    }
    assert single_ids, "expected exactly the prefix-offset SinglePartition exchange\n" + plan
    for node_id in single_ids:
        # find the tree line for this exchange and its direct child
        lines = tree.splitlines()
        idx = next(i for i, ln in enumerate(lines) if ln.rstrip().endswith(f"Exchange ({node_id})"))
        child = lines[idx + 1]
        assert "HashAggregate" in child, f"SinglePartition exchange ({node_id}) over non-aggregate input:\n{tree}"


def test_q116_trend_is_two_aggregates_no_window(plans):
    """Linear trend: day rollup then moment rollup — two hash aggregates,
    no window, no join; the day rollup is the only corpus-sized exchange."""
    plan = plans("q116_linear_trend")
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree, plan
    assert "Join" not in tree, plan
    assert tree.count("Exchange") <= 3, plan  # day agg, moment agg, final sort


def test_q117_lift_windows_run_over_aggregates(plans):
    """Decile lift: the corpus-sized exchange is the user aggregate; at
    fixture scale the adaptive ntile_by_rank takes the plain-window path
    (the window's input is the user AGGREGATE, never raw events), and no
    shuffle join appears anywhere. The scale path's shape is asserted on
    the operator directly in test_round7_queries."""
    plan = plans("q117_decile_lift")
    tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" not in tree, plan
    assert "ShuffledHashJoin" not in tree, plan
    assert "hashpartitioning(user_id#" in plan, plan


def test_q118_ltv_joins_on_user_only(plans):
    """Cohort LTV: purchases join cohorts on user_id (hash or broadcast —
    never a nested loop); no corpus-sized single-partition window."""
    plan = plans("q118_cohort_ltv")
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree, plan
    assert "BroadcastNestedLoopJoin" not in tree, plan


def test_t30_readability_is_pure_projection(plans):
    """Readability: per-row JVM expressions + the ordered LIMIT take —
    no join, no window, no aggregate over the corpus."""
    plan = plans("t30_readability")
    tree = plan.split("\n\n")[0]
    assert "Join" not in tree, plan
    assert "Window" not in tree, plan


def test_t31_hapax_exchanges_never_carry_text(plans):
    """Hapax ratio: the (source, word) aggregate shuffles tokens, never
    document text."""
    import re

    plan = plans("t31_hapax_ratio")
    for m in re.finditer(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan):
        assert "text#" not in m.group(1), m.group(1)


def test_d33_canonical_exchanges_carry_digest_not_text(plans):
    """Canonical dedup: the group-by key is the md5 digest; text is pruned
    before every exchange."""
    import re

    plan = plans("d33_canonical_dedup")
    for m in re.finditer(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan):
        assert "text#" not in m.group(1), m.group(1)


def test_p15_apportionment_single_corpus_exchange(plans):
    """Budget apportionment: one corpus-sized exchange (the source token
    census); every window runs over source-count rows."""
    plan = plans("p15_budget_apportionment")
    tree = plan.split("\n\n")[0]
    assert "Join" not in tree or "BroadcastHashJoin" in tree, plan
    assert "hashpartitioning(source#" in plan, plan


def test_s16_ivfpq_no_unbucketed_cartesian(plans):
    """IVFADC: corpus codes join query tables on list_id (hash/broadcast);
    the only nested-loop joins are against the broadcast nlist-row centroid
    set — a raw CartesianProduct anywhere means the bucketing is broken."""
    plan = plans("s16_ivfpq_rerank")
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree, plan


def test_q115_and_q117_have_no_corpus_single_partition_window(plans):
    """Round-7 hardening: the ABC cumulative share and the lift ntile rank
    both run through the two-pass prefix primitive — every SinglePartition
    exchange in their plans feeds off an aggregate (the n_parts-row offset
    table or a bucket-count rollup), never corpus-scale rows."""
    import re

    for name in ("q115_abc_pareto", "q117_decile_lift"):
        plan = plans(name)
        tree = plan.split("\n\n")[0]
        if name == "q115_abc_pareto":  # q117's small path has no range stage
            assert "rangepartitioning(" in plan, name + "\n" + plan
        lines = tree.splitlines()
        for m in re.finditer(
            r"\((\d+)\) Exchange\nInput[^\n]*\nArguments: SinglePartition", plan
        ):
            node_id = m.group(1)
            idx = next(
                i for i, ln in enumerate(lines)
                if ln.rstrip().endswith(f"Exchange ({node_id})")
            )
            # look through row-preserving wrappers (Project/Sort/Filter) to
            # the node that determines cardinality
            j = idx + 1
            while j < len(lines) and any(
                t in lines[j] for t in ("Project", "Sort", "Filter", "ColumnarToRow")
            ):
                j += 1
            child = lines[j] if j < len(lines) else ""
            # "Scan ExistingRDD" = a localCheckpoint of an upstream
            # aggregate (ntile_by_rank materializes the already-reduced
            # input) — aggregate-sized by construction
            assert (
                "HashAggregate" in child
                or "Window" in child
                or "Scan ExistingRDD" in child
            ), (
                f"{name}: SinglePartition exchange ({node_id}) over "
                f"non-aggregate input:\n{tree}"
            )


def test_q146_disjunction_keeps_hash_join(spark, sf_dir):
    """The OR-of-ANDs must not demote the p_partkey = l_partkey equi-join:
    the physical plan keeps a hash join (broadcast or sort-merge) and
    contains no nested-loop/cartesian node."""
    df = all_queries()["q146_disjunctive_pushdown"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan), plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan
    assert "Brand#" in plan  # the disjunction survives into the physical plan


def test_q147_quantiles_no_data_sized_ranking_window(plans):
    """Round-9 hardening (VERDICT r8 #2): the discrete quantiles must NOT
    rank all orders rows in a 5-key window (5 tasks each sorting N/5 —
    a skew ceiling at 100x). The rewrite collapses the value distribution
    first (groupBy(pri, cents)), takes the cumulative count via the
    range-partitioned two-pass prefix sum, and reads the quantile off the
    straddling cumulative range — so every Window in the plan runs over an
    aggregate, never the raw scan."""
    p = plans("q147_discrete_quantiles_mode")
    tree = p.split("\n\n")[0]
    assert "rangepartitioning(" in p  # the two-pass prefix sum is present
    # the prefix sum's local window is per-range-partition (__pid), i.e.
    # parallelism = shuffle partitions, not 5 priorities
    assert "__pid" in p
    # every Window's cardinality-determining input is an aggregate: in the
    # linearized tree, the first aggregate-or-scan node printed after each
    # Window line must be a HashAggregate, never the parquet scan itself
    lines = tree.splitlines()
    for i, ln in enumerate(lines):
        if " Window (" in ln:
            nxt = next(
                (l for l in lines[i + 1:]
                 if "HashAggregate" in l or "Scan parquet" in l),
                "",
            )
            assert "HashAggregate" in nxt, f"Window over raw scan:\n{tree}"


def test_s23_matryoshka_shuffles_never_carry_full_vectors(plans):
    """The Matryoshka two-stage contract in the physical plan: stage 1
    scores 16-of-64 prefix dims, so no shuffle exchange may carry the full
    embedding array — the coarse rank exchange moves (query_id, vec_id,
    score) and the spread exchange moves the sliced prefix. (Broadcast
    exchanges are exempt: the |Q|-row query side and the |Q|x20 shortlist
    legitimately ship full vectors.) Guards both the r8 design claim and
    the r9 slice-before-spread fix."""
    import re

    p = plans("s23_matryoshka_rerank")
    assert "slice(embedding" in p  # the prefix projection exists
    for m in re.finditer(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", p):
        cols = m.group(1)
        assert "embedding#" not in cols, (
            f"shuffle exchange carries full vectors: [{cols}]\n{p}"
        )


def test_s25_filtered_search_label_predicate_drives_hash_join(plans):
    """Filtered ANN: the label equi-predicate must become the join KEY of a
    hash join (corpus rows meet only same-label queries; cosine FLOPs are
    paid on the filtered set), not a post-hoc filter under a nested-loop
    cross join that scores everything first."""
    p = plans("s25_filtered_search")
    tree = p.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    assert "BroadcastNestedLoopJoin" not in tree and "CartesianProduct" not in tree
    # per-query top-k never materializes the full scored set into one sort:
    # the rank window gets the partial group-limit below the exchange
    assert "WindowGroupLimit" in tree


def test_p20_budget_walk_is_two_pass_prefix_sum(plans):
    """The token-budget walk orders the whole corpus by quality — the naive
    plan is sum() OVER (ORDER BY ttr) in ONE task. Assert the two-pass
    shape instead: a rangepartitioning exchange on (ttr, doc_id), the
    local window keyed by the range partition id (parallel in the number
    of shuffle partitions), and any SinglePartition exchange feeding off
    an aggregate (the n_parts-row offset table), never corpus rows."""
    import re

    p = plans("p20_token_budget_curation")
    tree = p.split("\n\n")[0]
    assert re.search(r"rangepartitioning\(ttr#\d+ DESC", p)
    assert "__pid" in p
    lines = tree.splitlines()
    for m in re.finditer(
        r"\((\d+)\) Exchange\nInput[^\n]*\nArguments: SinglePartition", p
    ):
        node_id = m.group(1)
        idx = next(
            i for i, ln in enumerate(lines)
            if ln.rstrip().endswith(f"Exchange ({node_id})")
        )
        nxt = next(
            (l for l in lines[idx + 1:]
             if "HashAggregate" in l or "Scan parquet" in l),
            "",
        )
        assert "HashAggregate" in nxt, (
            f"SinglePartition exchange ({node_id}) over raw rows:\n{tree}"
        )
