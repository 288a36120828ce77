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


def _docs_dir(spark, rows):
    """Write a synthetic documents table and return its sf_dir."""
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    d = tempfile.mkdtemp()
    df.write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_q139_isotonic_is_monotone_and_brackets_rates(run):
    """PAV output must be non-decreasing in the bucket order, stay inside
    [0, 1], and preserve the weighted mean of the raw rates (the
    projection property of isotonic regression)."""
    rows = run("q139_isotonic_calibration").collect()
    fitted = [r.isotonic_rate for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(fitted, fitted[1:])), fitted
    assert all(0.0 <= f <= 1.0 for f in fitted)
    n = sum(r.n for r in rows)
    raw_mass = sum(r.pos for r in rows)
    fit_mass = sum(r.isotonic_rate * r.n for r in rows)
    # rounding to 4dp perturbs each bucket by <= 5e-5
    assert abs(fit_mass - raw_mass) <= 5e-5 * n + 1e-6, (fit_mass, raw_mass)


def test_q139_pav_equals_sequential_pool_adjacent(spark):
    """The minimax closed form must equal the classic sequential PAV walk
    on a planted non-monotone rate sequence."""
    qs = all_queries()
    rows = []
    eid = 0
    # 10 value buckets with rates deliberately violating monotonicity
    rates = [0.1, 0.5, 0.2, 0.2, 0.8, 0.4, 0.6, 0.9, 0.7, 1.0]
    for b, rate in enumerate(rates):
        for i in range(20):
            et = "purchase" if i < round(rate * 20) else "view"
            rows.append((eid, "2024-01-05 10:00:00", 1, et, b + 0.5, "{}"))
            eid += 1
    d = _events_dir(spark, rows)
    out = qs["q139_isotonic_calibration"](spark, d).collect()
    # sequential PAV on the same bins
    blocks = [[r.pos, r.n] for r in out]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] * blocks[i + 1][1] > blocks[i + 1][0] * blocks[i][1]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    expanded = []
    for pos, n in blocks:
        rate = pos / n
        # each merged block spans (n / 20) original buckets of 20 events
        expanded.extend([rate] * (n // 20))
    got = [r.isotonic_rate for r in out]
    assert len(expanded) == len(got)
    for g, e in zip(got, expanded):
        assert abs(g - e) <= 5e-5, (got, expanded)


def test_q140_km_survival_decreasing_and_bounded(run):
    """KM survival must start <= 1, be non-increasing over duration, and
    at-risk counts must telescope down by exactly the day-group sizes."""
    rows = run("q140_kaplan_meier").collect()
    surv = [r.survival for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(b <= a + 1e-9 for a, b in zip(surv, surv[1:])), surv
    for prev, cur in zip(rows, rows[1:]):
        drop = prev.churned + prev.censored
        assert cur.at_risk == prev.at_risk - drop, (prev, cur)


def test_q140_km_known_answer(spark):
    """Textbook KM check: 4 users — durations 1 (churn), 2 (churn),
    2 (censored), 3 (churn) => S(1)=0.75, S(2)=0.5, S(3)=0."""
    rows = []
    eid = 0
    # observation window wide enough that only the day-28 user is censored
    specs = [
        (1, "2024-01-01", "2024-01-02"),   # dur 1, churn
        (2, "2024-01-01", "2024-01-03"),   # dur 2, churn
        (3, "2024-01-26", "2024-01-28"),   # dur 2, censored (active at end)
        (4, "2024-01-01", "2024-01-04"),   # dur 3, churn
    ]
    for uid, a, b in specs:
        rows.append((eid, f"{a} 08:00:00", uid, "view", 1.0, "{}")); eid += 1
        rows.append((eid, f"{b} 08:00:00", uid, "view", 1.0, "{}")); eid += 1
    d = _events_dir(spark, rows)
    out = {r.dur_days: r for r in all_queries()["q140_kaplan_meier"](spark, d).collect()}
    assert out[1].survival == 0.75
    # at dur 2: at_risk 3, churned 1, censored 1 -> S = 0.75 * 2/3 = 0.5
    assert out[2].at_risk == 3 and out[2].churned == 1 and out[2].censored == 1
    assert out[2].survival == 0.5
    # at dur 3: at_risk 1, churned 1 -> S = 0 (zero-factor guard path)
    assert out[3].survival == 0.0


def test_q141_jsd_bounds_and_identity(spark, run):
    """JSD is bounded by ln 2 and is exactly 0 for identical weekly
    distributions."""
    import math

    rows = run("q141_jsd_drift").collect()
    assert all(0.0 <= r.jsd <= math.log(2) + 1e-9 for r in rows)
    # planted: two weeks with the identical type mix -> jsd == 0
    synth = []
    eid = 0
    for day in ("2024-01-01", "2024-01-08"):
        for et, k in (("view", 10), ("click", 5)):
            for _ in range(k):
                synth.append((eid, f"{day} 10:00:00", 1, et, 1.0, "{}"))
                eid += 1
    d = _events_dir(spark, synth)
    out = all_queries()["q141_jsd_drift"](spark, d).collect()
    assert len(out) == 1 and out[0].jsd == 0.0


def test_s23_matryoshka_matches_exact_when_shortlist_is_corpus(spark, sf_dir):
    """With shortlist >= corpus size the two-stage rerank must equal the
    brute-force exact top-k (the coarse stage only prunes)."""
    from guardian_for_apache_kafka_spark.operators.similarity import (
        cosine_topk,
        prefix_dim_rerank_topk,
    )
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.rnk): r.vec_id for r in cosine_topk(e, q, k=3).collect()}
    two = {
        (r.query_id, r.rnk): r.vec_id
        for r in prefix_dim_rerank_topk(e, q, k=3, prefix_dims=16, shortlist=10**9).collect()
    }
    assert exact == two


def test_s24_margin_and_sides(spark, sf_dir, run):
    """Positive/negative labels must actually match/differ from the query
    label, and margin must equal pos_cosine - neg_cosine (+-1 ulp of 4dp)."""
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    for r in run("s24_hard_negative_mining").collect():
        assert labels[r.pos_id] == labels[r.query_id]
        assert labels[r.neg_id] != labels[r.query_id]
        assert abs(r.margin - (r.pos_cosine - r.neg_cosine)) <= 2e-4


def test_d39_target_lookalikes_score_above_background(spark):
    """Planted corpus: non-target docs written in the target's vocabulary
    must outscore non-target docs in a disjoint vocabulary."""
    qs = all_queries()
    rows = []
    # target: english-ish vocab
    for i in range(20):
        rows.append((i, "the quick brown fox jumps over the lazy dog", "en", "srcA", 40))
    # lookalike non-target: same vocab, different lang tag
    for i in range(20, 25):
        rows.append((i, "the quick brown fox", "fr", "srcB", 19))
    # background non-target: disjoint vocab
    for i in range(25, 30):
        rows.append((i, "zzz yyy xxx www vvv", "de", "srcC", 19))
    d = _docs_dir(spark, rows)
    out = qs["d39_dsir_importance"](spark, d).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.log_ratio)
    assert min(by_lang["fr"]) > max(by_lang["de"]), out


def test_t41_diversity_detects_template_spam(spark):
    """A source of identical documents must show far lower trigram
    diversity than a source of distinct documents."""
    qs = all_queries()
    rows = []
    for i in range(50):
        rows.append((i, "copy paste boilerplate terms and conditions apply", "en", "spam", 49))
    for i in range(50, 100):
        rows.append((i, f"unique document number {i} about topic {i*7%31} here", "en", "fresh", 40))
    d = _docs_dir(spark, rows)
    out = {(r.source, r.n): r for r in qs["t41_ngram_diversity"](spark, d).collect()}
    assert out[("spam", 3)].diversity < 0.05
    assert out[("fresh", 3)].diversity > 0.5
    # totals conserve: per doc, total n-grams = sum_docs max(len - n + 1, 0)
    assert out[("spam", 1)].total_ngrams == 50 * 7


def test_p19_padding_accounting(run):
    """Bucketed padding must never exceed naive padding, every doc fits its
    cap, and saved_frac is consistent with the two padding columns."""
    rows = run("p19_length_bucket_padding").collect()
    for r in rows:
        assert 0 <= r.bucket_padding <= r.naive_padding
        assert r.tokens <= r.cap * r.n_docs
        if r.naive_padding > 0:
            expect = (r.naive_padding - r.bucket_padding) / r.naive_padding
            assert abs(r.saved_frac - expect) <= 5e-5


def test_g15_planted_gap_is_found(spark):
    """Remove a 3-hour block from one topic's otherwise-dense stream: the
    report must show exactly that gap for that topic and zero for a dense
    topic."""
    rows = []
    eid = 0
    for h in range(24):
        if h not in (10, 11, 12):
            rows.append((eid, f"2024-01-01 {h:02d}:30:00", 1, "gappy", 1.0, "{}"))
            eid += 1
        rows.append((eid, f"2024-01-01 {h:02d}:15:00", 2, "dense", 1.0, "{}"))
        eid += 1
    d = _events_dir(spark, rows)
    out = {r.topic: r for r in all_queries()["g15_archive_gap_report"](spark, d).collect()}
    assert out["dense"].missing_hours == 0 and out["dense"].n_gaps == 0
    assert out["dense"].first_gap_start is None
    g = out["gappy"]
    assert g.missing_hours == 3 and g.n_gaps == 1 and g.longest_gap_hours == 3
    assert str(g.first_gap_start) == "2024-01-01 10:00:00"


def test_q142_deterministic_chain_has_zero_entropy(spark):
    """A strictly alternating A->B->A->B stream has H(next|cur) == 0 and
    perplexity == 1 for both states."""
    rows = []
    for i in range(40):
        et = "view" if i % 2 == 0 else "click"
        rows.append((i, f"2024-01-01 10:{i:02d}:00", 7, et, 1.0, "{}"))
    d = _events_dir(spark, rows)
    out = all_queries()["q142_conditional_entropy"](spark, d).collect()
    assert len(out) == 2
    for r in out:
        assert r.cond_entropy == 0.0 and r.perplexity == 1.0


def test_q142_uniform_branching_hits_ln_k(spark):
    """A state whose successor is uniform over 4 types has H = ln 4 and
    perplexity = 4."""
    import math

    rows = []
    eid = 0
    nxts = ["a", "b", "c", "d"]
    for rep in range(8):
        for nxt in nxts:
            rows.append((eid, f"2024-01-01 10:{eid:02d}:00" if eid < 60 else f"2024-01-01 11:{eid-60:02d}:00", 1, "hub", 1.0, "{}"))
            eid += 1
            rows.append((eid, f"2024-01-01 10:{eid:02d}:00" if eid < 60 else f"2024-01-01 11:{eid-60:02d}:00", 1, nxt, 1.0, "{}"))
            eid += 1
    d = _events_dir(spark, rows)
    out = {r.from_type: r for r in all_queries()["q142_conditional_entropy"](spark, d).collect()}
    hub = out["hub"]
    assert abs(hub.cond_entropy - math.log(4)) <= 1e-6
    assert abs(hub.perplexity - 4.0) <= 1e-4


def test_q143_symmetric_distribution_has_zero_skew(spark):
    """Values uniform on an odd integer ladder are symmetric: Bowley skew
    exactly 0; octiles land on exact quarter-integer cents."""
    rows = []
    eid = 0
    for v in range(1, 10):           # 1..9 dollars, symmetric around 5
        for _ in range(4):
            rows.append((eid, "2024-01-02 09:00:00", 1, "view", float(v), "{}"))
            eid += 1
    d = _events_dir(spark, rows)
    r = all_queries()["q143_quantile_shape"](spark, d).collect()[0]
    assert r.n == 36
    assert r.bowley_skew == 0.0
    assert r.median == 5.0 and r.q1 + r.q3 == 10.0


def test_g16_planted_holes_and_duplicates(spark):
    """One topic missing two interior offsets reports holes=2; a topic
    with a replayed (duplicate) offset reports duplicates=1; a dense
    topic is continuous."""
    rows = []
    for i in range(10):
        if i not in (4, 5):
            rows.append((i, "2024-01-01 10:00:00", 1, "holey", 1.0, "{}"))
    for i in range(100, 105):
        rows.append((i, "2024-01-01 10:00:00", 2, "dense", 1.0, "{}"))
    for i in (200, 201, 201, 202):
        rows.append((i, "2024-01-01 10:00:00", 3, "dupey", 1.0, "{}"))
    d = _events_dir(spark, rows)
    out = {r.topic: r for r in all_queries()["g16_offset_continuity"](spark, d).collect()}
    assert out["holey"].holes == 2 and not out["holey"].continuous
    assert out["dense"].holes == 0 and out["dense"].continuous
    assert out["dupey"].duplicates == 1 and not out["dupey"].continuous


def test_p20_budget_respected_and_greedy(spark, sf_dir, run):
    """Selected tokens never exceed the 50% budget, and the selection is
    exactly the greedy prefix of the (ttr desc, doc_id) order."""
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    rows = run("p20_token_budget_curation").collect()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text").collect()
    scored = []
    total = 0
    for r in docs:
        toks = r.text.split(" ")
        n = len(toks)
        total += n
        scored.append((-(len(set(toks)) / n), r.doc_id, n, r.source))
    scored.sort()
    budget = total // 2
    run_sum, by_source = 0, {}
    for _ttr, doc_id, n, source in scored:
        run_sum += n
        if run_sum <= budget:
            s = by_source.setdefault(source, [0, 0])
            s[0] += 1
            s[1] += n
    got_sel_tokens = sum(r.selected_tokens for r in rows)
    assert got_sel_tokens <= budget
    for r in rows:
        want = by_source.get(r.source, [0, 0])
        assert (r.n_selected, r.selected_tokens) == tuple(want), r.source


def test_m14_plan_arithmetic(run):
    """fps/stride table is exactly the decimation rule: stride =
    round(fps/6), n_kept = floor(15/stride)+1, effective close to 6."""
    rows = run("m14_fps_normalization").collect()
    assert rows
    want = {12: 2, 24: 4, 25: 4, 30: 5}
    for r in rows:
        assert r.stride == want[r.fps]
        assert r.n_kept == 15 // r.stride + 1
        assert 5.0 <= r.effective_fps <= 6.5


def test_q144_hill_on_planted_pareto(spark):
    """Exact Pareto(alpha=2) order statistics: x_(i) = (n/i)^(1/2) gives a
    Hill estimate near 1/2 (so tail_alpha near 2)."""
    rows = []
    n = 200
    for i in range(1, n + 1):
        rows.append((i, "2024-01-03 12:00:00", 1, "view", (n / i) ** 0.5, "{}"))
    d = _events_dir(spark, rows)
    r = all_queries()["q144_hill_tail_index"](spark, d).collect()[0]
    # H = mean_{i<=50} ln(x_i/x_51) = 0.5 * mean ln(51/i), close to 0.5
    assert 0.35 <= r.hill_h <= 0.65, r
    assert 1.5 <= r.tail_alpha <= 2.9, r


def test_s25_filter_honored_and_subset_of_unfiltered_pool(spark, sf_dir, run):
    """Every filtered hit shares the query's label, and each hit's cosine
    can't exceed the global (unfiltered) best."""
    from guardian_for_apache_kafka_spark.operators.similarity import cosine_topk
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    labels = {r.vec_id: r.label for r in e.select("vec_id", "label").collect()}
    rows = run("s25_filtered_search").collect()
    assert rows
    q = e.where(F.col("vec_id") < 6).select(F.col("vec_id").alias("query_id"), "embedding")
    best = {
        r.query_id: r.cosine
        for r in cosine_topk(e, q, k=1).select("query_id", F.round("cosine", 4).alias("cosine")).collect()
    }
    for r in rows:
        assert labels[r.vec_id] == labels[r.query_id]
        assert r.cosine <= best[r.query_id] + 1e-9


def test_q145_planted_echo_wins(spark):
    """A sinusoid-ish weekly pattern replayed exactly two weeks before the
    query week must be the rank-1 match with distance 0 (z-norm makes the
    scale irrelevant: the echo is 3x the amplitude)."""
    pattern = [5, 9, 14, 9, 5, 2, 1]
    rows, eid = [], 0
    day = 0
    # 28 days: noise week, echo week (3x pattern), noise week, query week (1x)
    for wk, series in enumerate(
        [[3, 3, 4, 3, 3, 4, 3], [15, 27, 42, 27, 15, 6, 3],
         [4, 3, 3, 4, 3, 3, 4], pattern]
    ):
        for v in series:
            for _ in range(v):
                rows.append((eid, f"2024-01-{day+1:02d} 12:00:00", 1, "view", 1.0, "{}"))
                eid += 1
            day += 1
    d = _events_dir(spark, rows)
    out = all_queries()["q145_subsequence_search"](spark, d).collect()
    top = [r for r in out if r.rnk == 1][0]
    assert top.window_start == 7 and top.dist == 0.0, out


def test_p21_epochs_differ_but_partition(spark, sf_dir, run):
    """Each epoch's shards partition the corpus (sizes sum to n_docs);
    different epochs produce different assignments (checksums differ);
    re-running is bit-identical (determinism)."""
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    rows = run("p21_epoch_shuffle_plan").collect()
    n = load_table(spark, sf_dir, "documents").count()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    assert set(by_epoch) == {0, 1, 2}
    sigs = set()
    for epoch, shards in by_epoch.items():
        assert sum(s.n_docs for s in shards) == n
        sigs.add(tuple(sorted((s.shard, s.order_checksum) for s in shards)))
    assert len(sigs) == 3  # three distinct shuffles
    again = [tuple(r) for r in run("p21_epoch_shuffle_plan").collect()]
    assert again == [tuple(r) for r in rows]


def test_q145_short_series_key_is_omitted_not_crashed(spark):
    """A key with fewer than `window` days must be silently omitted (the
    oracle's range(len - w + 1) = empty semantics), not crash the
    sequence/slice expansion."""
    from guardian_for_apache_kafka_spark.operators.timeseries import (
        znorm_subsequence_topk,
    )

    daily = spark.createDataFrame(
        [("short", d, 5 + d) for d in range(3)]
        + [("long", d, (d * 13) % 7 + d) for d in range(20)],
        "t string, d int, y long",
    )
    out = znorm_subsequence_topk(daily, window=7, k=3).collect()
    assert out and all(r.t == "long" for r in out)


def test_p19_long_document_is_not_dropped(spark):
    """A 300-token document (beyond the old 256 cap) must still appear in
    the padding audit: the cap ladder extends to 2^20."""
    rows = [(0, " ".join(["tok"] * 300), "en", "src", 1200)]
    rows += [(i, "a b c d e f g h", "en", "src", 15) for i in range(1, 21)]
    d = _docs_dir(spark, rows)
    out = all_queries()["p19_length_bucket_padding"](spark, d).collect()
    assert sum(r.n_docs for r in out) == 21
    assert any(r.cap == 512 and r.n_docs == 1 for r in out), out


def test_p19_oversized_document_lands_in_overflow_bucket(spark):
    """ADVICE r8: a document past the top rung (2^20 tokens) must not
    silently vanish from the audit — it reports as the cap = -1 overflow
    bucket with NULL paddings, while the sized buckets keep their math."""
    rows = [(0, " ".join(["t"] * ((1 << 20) + 1)), "en", "src", 1)]
    rows += [(i, "a b c d e f g h", "en", "src", 15) for i in range(1, 4)]
    d = _docs_dir(spark, rows)
    out = {r.cap: r for r in all_queries()["p19_length_bucket_padding"](spark, d).collect()}
    assert sum(r.n_docs for r in out.values()) == 4
    over = out[-1]
    assert over.overflow and over.n_docs == 1
    assert over.bucket_padding is None and over.saved_frac is None
    # r10 (ADVICE r9): naive_padding is NULL too — "pad to the tallest
    # sized rung" is meaningless (negative) for a doc no rung fits
    assert over.naive_padding is None
    assert over.tokens == (1 << 20) + 1
    sized = out[8]
    assert not sized.overflow and sized.n_docs == 3
    # the naive cap comes from the largest SIZED bucket, not the overflow
    assert sized.naive_padding == 3 * 8 - 24


def test_q147_type1_quantiles_under_heavy_ties(spark):
    """Stress the r9 prefix-sum quantile rewrite where it could plausibly
    drift from row_number semantics: a value domain of 3 cents levels with
    heavily duplicated values (every (pri, cents) group spans many rows,
    ties straddle range-partition boundaries) and ranks ceil(p*n) landing
    exactly on cumulative-range edges. Ground truth is the type-1
    definition computed directly: value at 1-based rank ceil(p*n) of the
    sorted multiset."""
    import math

    rows = []
    key = 0
    # pri A: 10x 1.00, 30x 2.00, 10x 3.00  (n=50: p25 rank 13 -> 2.00,
    # p50 rank 25 -> 2.00, p75 rank 38 -> 2.00... make edges interesting)
    # pri B: 20x 1.00, 20x 2.00  (n=40: p25 rank 10 -> 1.00 edge,
    # p50 rank 20 -> 1.00 LAST of tie group, p75 rank 30 -> 2.00)
    spec = {"A": [(1.00, 10), (2.00, 30), (3.00, 10)], "B": [(1.00, 20), (2.00, 20)]}
    for pri, dist in spec.items():
        for price, cnt in dist:
            for i in range(cnt):
                rows.append((key, 1, "O", price, f"199{5 + (key % 3)}-01-01", pri))
                key += 1
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    d = tempfile.mkdtemp()
    df.write.parquet(os.path.join(d, "orders.parquet"))

    out = {r.pri: r for r in all_queries()["q147_discrete_quantiles_mode"](spark, d).collect()}
    for pri, dist in spec.items():
        values = sorted(int(round(p * 100)) for p, c in dist for _ in range(c))
        n = len(values)
        got = out[pri]
        assert got.n == n
        for p, col in ((0.25, "p25_cents"), (0.50, "med_cents"), (0.75, "p75_cents")):
            want = values[math.ceil(p * n) - 1]
            assert getattr(got, col) == want, (pri, col, got, want)
