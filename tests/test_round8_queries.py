"""Semantic property tests for the round-8 additions — invariants the
DuckDB differential can't express (exactness on synthetic inputs,
conservation laws, known-answer statistics)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from guardian_for_apache_kafka_spark.plans import all_queries


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    qs = all_queries()
    return lambda name: qs[name](spark, sf_dir)


def _events_dir(spark, rows):
    """Write a synthetic events table and return its sf_dir."""
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = tempfile.mkdtemp()
    df.write.parquet(os.path.join(d, "events.parquet"))
    return d


def test_q129_q130_perfect_monotone_association(spark):
    """A day series where purchases strictly increase with views must give
    Spearman rho == 1 and Kendall tau-b == 1 exactly (no ties, perfect
    concordance)."""
    qs = all_queries()
    rows = []
    eid = 0
    for x in range(12):
        for _ in range(x + 1):  # views strictly increasing by day
            rows.append((eid, f"2024-01-{x+1:02d} 08:00:00", 1, "view", 1.0, "{}"))
            eid += 1
        for _ in range(2 * x + 1):  # purchases strictly increasing too
            rows.append((eid, f"2024-01-{x+1:02d} 09:00:00", 1, "purchase", 1.0, "{}"))
            eid += 1
    d = _events_dir(spark, rows)
    r = qs["q129_spearman_corr"](spark, d).collect()[0]
    assert r.n_days == 12 and r.spearman_rho == 1.0, r
    t = qs["q130_kendall_tau"](spark, d).collect()[0]
    assert t.concordant == 66 and t.discordant == 0 and t.kendall_tau_b == 1.0, t


def test_q131_q132_q133_on_strict_trend(spark):
    """A strictly increasing daily series: Mann-Kendall S = n(n-1)/2 with
    'increasing' trend, zero turning points, and (n/2 above median in the
    second half) exactly 2 runs."""
    qs = all_queries()
    rows = []
    eid = 0
    for x in range(14):
        for _ in range(5 + 3 * x):
            rows.append((eid, f"2024-01-{x+1:02d} 08:00:00", 1, "view", 1.0, "{}"))
            eid += 1
    d = _events_dir(spark, rows)
    mk = qs["q131_mann_kendall_trend"](spark, d).collect()[0]
    assert mk.s_stat == 14 * 13 // 2 and mk.trend == "increasing", mk
    tp = qs["q132_turning_points"](spark, d).collect()[0]
    assert tp.turning_points == 0, tp
    runs = qs["q133_runs_test"](spark, d).collect()[0]
    # strictly increasing: first half below-or-equal the lower median,
    # second half above -> exactly one switch, 2 runs
    assert runs.runs == 2 and runs.n_above + runs.n_below == 14, runs


def test_q134_planted_weekday_effect(spark):
    """Days 0 mod 7 get 10x the volume: the weekday ANOVA must flag the
    effect with a large F; a flat series must give F ~= 0."""
    qs = all_queries()
    rows, eid = [], 0
    for x in range(21):
        n = 100 if x % 7 == 0 else 10
        for _ in range(n):
            rows.append((eid, f"2024-01-{x+1:02d} 08:00:00", 1, "view", 1.0, "{}"))
            eid += 1
    d = _events_dir(spark, rows)
    r = qs["q134_anova_dow"](spark, d).collect()[0]
    # within-group variance is exactly 0 here (every Monday identical), so
    # F is infinite: NULL statistic, effect still flagged (SSB > 0)
    assert r.k_groups == 7 and r.dow_effect_at_3 and r.f_stat is None, r
    assert r.eta_sq == 1.0, r
    # flat series: SSB == 0 exactly -> F == 0
    flat, eid = [], 0
    for x in range(21):
        for _ in range(10):
            flat.append((eid, f"2024-01-{x+1:02d} 08:00:00", 1, "view", 1.0, "{}"))
            eid += 1
    d2 = _events_dir(spark, flat)
    r2 = qs["q134_anova_dow"](spark, d2).collect()[0]
    # a perfectly flat series has SSW == 0 as well (every day identical):
    # NULL F again, but SSB == 0 so no effect is flagged
    assert r2.f_stat is None and not r2.dow_effect_at_3 and r2.eta_sq == 0.0, r2


def test_t35_novelty_conservation(spark, sf_dir, run):
    """Novelty attribution is a partition of the distinct-shingle space:
    sum(n_novel) == corpus distinct shingles; the lowest doc_id is 100%
    novel; n_novel <= n_shingles everywhere."""
    from guardian_for_apache_kafka_spark.functions.columns import (
        ngram_shingles,
        tokens_col,
    )
    from guardian_for_apache_kafka_spark.operators.text import shingle_novelty_profile
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    prof = shingle_novelty_profile(docs, n=3).collect()
    assert all(0 <= r.n_novel <= r.n_shingles for r in prof)
    total_novel = sum(r.n_novel for r in prof)
    distinct = (
        docs.select(F.explode(ngram_shingles(tokens_col("text"), 3)).alias("s"))
        .agg(F.countDistinct("s"))
        .collect()[0][0]
    )
    assert total_novel == distinct, (total_novel, distinct)
    first = min(prof, key=lambda r: r.doc_id)
    assert first.n_novel == first.n_shingles and first.novelty_ratio == 1.0


def test_s21_rrf_identical_and_disjoint_lists(spark):
    """RRF sanity: fusing a ranking with ITSELF preserves its order; a doc
    ranked 1st in both lists always outranks a doc ranked 2nd in both."""
    from guardian_for_apache_kafka_spark.operators.similarity import (
        reciprocal_rank_fusion,
    )

    ranked = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id long, vec_id long, rnk long"
    )
    out = reciprocal_rank_fusion(ranked, ranked, k=3).orderBy("fused_rank").collect()
    assert [r.vec_id for r in out] == [10, 11, 12]
    assert out[0].rrf == round(2 / 61, 6)
    # a doc present in only one list scores below one present in both
    only_a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id long, vec_id long, rnk long"
    )
    only_b = spark.createDataFrame(
        [(0, 10, 1), (0, 12, 2)], "query_id long, vec_id long, rnk long"
    )
    fused = {r.vec_id: r.rrf for r in reciprocal_rank_fusion(only_a, only_b, k=3).collect()}
    assert fused[10] > fused[11] and fused[10] > fused[12]
    assert fused[11] == fused[12] == round(1 / 62, 6)


def test_m11_motion_invariants(run):
    """Motion energy conservation: total >= max_jump, n_cuts bounded by
    frame count, class consistent with its definition."""
    rows = run("m11_motion_energy").collect()
    assert rows
    for r in rows:
        assert r.total_motion >= r.max_jump >= 0
        assert 0 <= r.n_cuts <= 15
        if r.motion_class == "static":
            assert r.total_motion < 32 * 15
        elif r.motion_class == "smooth":
            assert r.n_cuts == 0 and r.total_motion >= 32 * 15
        else:
            assert r.n_cuts > 0 and r.total_motion >= 32 * 15


def test_d36_budget_conservation(spark, sf_dir, run):
    """The df bands partition the distinct-shingle space; 'unique'
    contributes zero candidate pairs."""
    rows = {r.df_band: r for r in run("d36_candidate_pair_budget").collect()}
    if "unique" in rows:
        assert rows["unique"].candidate_pairs == 0
    assert all(r.candidate_pairs >= 0 and r.n_shingles > 0 for r in rows.values())


def test_g13_plan_contiguous_and_conserving(spark, sf_dir, run):
    """Compaction groups tile the timeline: contiguous, ordered, record
    totals conserved."""
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    rows = sorted(run("g13_compaction_plan").collect(), key=lambda r: r.grp)
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_records for r in rows) == total
    for a, b in zip(rows, rows[1:]):
        assert a.last_slice < b.first_slice  # contiguous, non-overlapping
        assert b.grp == a.grp + 1 or b.grp > a.grp  # ordered
    for r in rows:
        assert r.first_slice <= r.last_slice and r.n_slices >= 1


def test_p17_share_sums_to_one(run):
    rows = run("p17_shard_balance_report").collect()
    assert {r.shard for r in rows} <= set(range(8))
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.balance_ratio > 0


def test_t37_stylistic_clones_have_zero_delta(spark):
    """Two sources with IDENTICAL token statistics must have Burrows'
    Delta == 0; a source with a shifted vocabulary stands apart."""
    qs = all_queries()
    rows = []
    did = 0
    base = "the quick brown fox jumps over the lazy dog again and again"
    for src in ("clone_a", "clone_b"):
        for _ in range(10):
            rows.append((did, base, "en", src, len(base)))
            did += 1
    for _ in range(10):
        rows.append((did, "zebra quartz vortex " * 4, "en", "shifted", 80))
        did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tempfile.mkdtemp()
    df.write.parquet(os.path.join(d, "documents.parquet"))
    out = {(r.source_a, r.source_b): r.burrows_delta
           for r in qs["t37_burrows_delta"](spark, d).collect()}
    assert out[("clone_a", "clone_b")] == 0.0
    assert out[("clone_a", "shifted")] > 0.5 and out[("clone_b", "shifted")] > 0.5


def test_g14_predicted_bytes_match_real_archive(spark, sf_dir, tmp_path):
    """The restore cost plan's arithmetic wire-size model must be
    BYTE-EXACT: write the same records through the real bulk writer and
    compare each predicted object_bytes with the file on disk."""
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.core import normalize_events_to_records
    from guardian_for_apache_kafka_spark.core.timeslice import ChronoUnitSlice
    from guardian_for_apache_kafka_spark.operators import write_guardian_format
    from guardian_for_apache_kafka_spark.operators.backup import physical_name
    from guardian_for_apache_kafka_spark.plans import all_queries
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    plan = {
        r.slice: (r.n_records, r.object_bytes)
        for r in all_queries()["g14_restore_cost_plan"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp")
    )
    recs = normalize_events_to_records(ev).withColumn(
        "timestamp", F.timestamp_millis(F.unix_millis("timestamp"))
    )
    dest = str(tmp_path / "arch")
    keys = write_guardian_format(recs, dest, ChronoUnitSlice("HOURS"))
    from guardian_for_apache_kafka_spark.core.timeslice import key_to_datetime

    sizes = {}
    for k in keys:
        t = key_to_datetime(k).replace(tzinfo=None)
        sizes[t] = os.path.getsize(os.path.join(dest, physical_name(k)))
    assert set(sizes) == set(plan)
    for t, size in sizes.items():
        assert plan[t][1] == size, (t, plan[t], size)


def test_t40_dropout_determinism_and_rate(run):
    """Augmentation invariants: rerunning yields byte-identical text
    (content-addressed, no RNG), kept tokens are a subsequence, and the
    corpus-level dropout rate sits near the designed 10%."""
    rows1 = run("t40_token_dropout_augment").collect()
    rows2 = run("t40_token_dropout_augment").collect()
    assert [(r.doc_id, r.augmented_text) for r in rows1] == [
        (r.doc_id, r.augmented_text) for r in rows2
    ]
    tot = sum(r.n_tokens for r in rows1)
    kept = sum(r.n_kept for r in rows1)
    assert 0.85 <= kept / tot <= 0.95, kept / tot
    for r in rows1[:10]:
        assert r.n_kept == len(r.augmented_text.split(" ")) if r.n_kept else True


def test_d38_tertiles_partition_each_lang(spark, sf_dir, run):
    """Tertile populations per language differ by at most 1 and sum to the
    language's doc count; head entropy range sits at or below tail's."""
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    rows = run("d38_ccnet_quality_buckets").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.quality_bucket] = r
    counts = {
        r["lang"]: r["count"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .collect()
    }
    for lang, buckets in by_lang.items():
        ns = [b.n_docs for b in buckets.values()]
        assert sum(ns) == counts[lang]
        assert max(ns) - min(ns) <= 1
        assert buckets["head"].max_ce <= buckets["tail"].min_ce + 1e-9
