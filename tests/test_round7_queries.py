"""Semantic property tests for the round-7 additions — invariants the
DuckDB differential can't express (exactness on synthetic inputs, planted
recovery, conservation laws)."""

import pytest
from pyspark.sql import functions as F

from guardian_for_apache_kafka_spark.plans import all_queries


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    qs = all_queries()
    return lambda name: qs[name](spark, sf_dir)


def test_q116_recovers_exact_line(spark):
    """OLS on a noise-free line must return its slope/intercept exactly
    (integer moment arithmetic: no float slack to hide behind)."""
    from guardian_for_apache_kafka_spark.plans import relational_queries as R

    # synthesize events whose daily counts are exactly y = 3x + 7:
    # day x gets 3x+7 rows, all one event type
    rows = [
        (i, f"2024-01-{x+1:02d} 12:00:00", 1, "view", 1.0, "{}")
        for x in range(10)
        for i in range(3 * x + 7)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = {r.event_type: r for r in R.q116(spark, d).collect()}
    r = out["view"]
    assert r.slope == 3.0 and r.intercept == 7.0 and r.r2 == 1.0, r


def test_q117_decile_conservation_and_monotone_capture(run):
    rows = run("q117_decile_lift").collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    # conservation: users and converters split the totals exactly
    assert sum(r.n_users for r in rows) > 0
    caps = [r.cum_capture for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(caps, caps[1:])), caps
    assert abs(caps[-1] - 1.0) < 1e-9, caps
    # lift is rate/base: weighted mean of rates == base (lift weighted ~1)
    tot_u = sum(r.n_users for r in rows)
    tot_c = sum(r.n_converted for r in rows)
    base = tot_c / tot_u
    for r in rows:
        assert abs(r.conv_rate - r.n_converted / r.n_users) < 1e-3
        assert abs(r.lift - (r.n_converted / r.n_users) / base) < 1e-3


def test_q118_ltv_cumulative_is_monotone_per_cohort(run):
    rows = run("q118_cohort_ltv").collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, []).append(r)
    for wk, rs in by_cohort.items():
        ages = [r.age_weeks for r in rs]
        assert ages == sorted(ages)
        ltv = [r.cum_ltv_per_user for r in rs]
        assert all(a <= b + 1e-9 for a, b in zip(ltv, ltv[1:])), (wk, ltv)
        # cumulative consistency: sum of revenues/user ~= final cum ltv
        total = sum(r.revenue for r in rs) / rs[0].cohort_users
        assert abs(total - ltv[-1]) < 0.01, (wk, total, ltv[-1])


def test_d33_recovers_exactly_the_planted_mutants(run):
    rows = run("d33_canonical_dedup").collect()
    assert rows, "planted mutants not found"
    for r in rows:
        assert r.keeper % 7 == 0
        assert r.n_docs == 2 and r.removed == 1
        assert r.max_doc == r.keeper + 1000000


def test_t30_syllable_proxy_first_principles(run):
    """Spot-check the vowel-group syllable proxy against hand counts."""
    rows = {r.doc_id: r for r in run("t30_readability").collect()}
    assert rows
    for r in rows.values():
        assert r.n_syllables >= r.n_words  # every word >= 1 syllable
        assert 1.0 <= r.syll_per_word <= 4.0  # sane for english-ish tokens


def test_t31_hapax_bounds(run):
    rows = run("t31_hapax_ratio").collect()
    assert rows
    for r in rows:
        assert 0 <= r.hapax_count <= r.vocab_size
        assert r.vocab_size <= r.total_tokens
        assert abs(r.hapax_ratio - r.hapax_count / r.vocab_size) < 1e-3
        assert abs(r.type_token_ratio - r.vocab_size / r.total_tokens) < 1e-3


def test_p15_quotas_sum_exactly_to_budget(run):
    rows = run("p15_budget_apportionment").collect()
    assert rows
    assert sum(r.quota for r in rows) == 1000000
    # monotone: more tokens never means a smaller quota (sqrt is monotone,
    # largest-remainder preserves order up to the +1 on remainders)
    srt = sorted(rows, key=lambda r: r.tokens)
    for a, b in zip(srt, srt[1:]):
        assert a.quota <= b.quota + 1, (a, b)


def test_m9_scenes_tile_the_frame_range(run):
    """Scene runs must partition frames 0..15 exactly: contiguous, ordered,
    disjoint, covering — the RLE conservation law of the segmentation."""
    rows = run("m9_scene_segments").collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.scene_index)
        assert [r.scene_index for r in rs] == list(range(len(rs)))
        pos = 0
        for r in rs:
            assert r.start_frame == pos, (doc, rs)
            assert r.n_frames >= 1
            pos += r.n_frames
        assert pos == 16, (doc, pos)
        assert all(0 <= r.sum_brightness <= 255 * r.n_frames for r in rs)


def test_global_running_sum_equals_global_window(spark):
    """The two-pass prefix sum must equal the single-partition window on
    arbitrary data, including duplicate order keys (equal keys land in one
    range bucket, so tie groups never straddle partitions)."""
    from pyspark.sql import Window

    from guardian_for_apache_kafka_spark.operators.layout import (
        global_row_number,
        global_running_sum,
    )

    rows = [(i % 17, (i * 7919) % 101 - 50) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    # RANGE frame (the r8 tie contract): per-row values are exact and
    # n_parts-invariant even with duplicate (k, v) keys — every tied row
    # carries the whole tie group's sum, matching the single-partition
    # RANGE window row-for-row
    w = Window.orderBy("k", "v")  # default frame: RANGE UNBOUNDED PRECEDING
    want = sorted(
        (r.k, r.v, r.run)
        for r in df.withColumn("run", F.sum("v").over(w)).collect()
    )
    for n_parts in (2, 5, 32):
        got = sorted(
            (r.k, r.v, r.run)
            for r in global_running_sum(
                df, [F.col("k").asc(), F.col("v").asc()], "v", n_parts=n_parts
            ).collect()
        )
        assert got == want, n_parts
    # rank on a total order is exact row-for-row
    uniq = spark.createDataFrame(
        [(i, (i * 31) % 997) for i in range(997)], "id long, v long"
    ).repartition(6)
    got_rn = {
        r.id: r.rn
        for r in global_row_number(uniq, [F.col("v").asc(), F.col("id")], n_parts=4).collect()
    }
    want_rn = {
        r.id: r.rn
        for r in uniq.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got_rn == want_rn


def test_q117_closed_form_ntile_matches_builtin(spark):
    """ntile_by_rank's two-pass closed form (small_threshold=0 forces the
    scale path) must reproduce ANSI ntile(10) for awkward sizes: N < 10,
    N % 10 != 0, N % 10 == 0 — and the adaptive small path is the builtin
    by construction, so the two paths agree everywhere."""
    from pyspark.sql import Window

    from guardian_for_apache_kafka_spark.operators.layout import ntile_by_rank

    for n in (4, 10, 23, 100, 107):
        df = spark.createDataFrame(
            [(i, (i * 37) % 211) for i in range(n)], "id long, s long"
        )
        got = {
            r.id: r.bucket
            for r in ntile_by_rank(
                df, [F.desc("s"), F.col("id")], buckets=10, small_threshold=0
            ).collect()
        }
        want = {
            r.id: r.d
            for r in df.select(
                "id",
                F.ntile(10).over(Window.orderBy(F.desc("s"), "id")).alias("d"),
            ).collect()
        }
        assert got == want, f"N={n}"


def test_q122_auc_matches_brute_force_pair_count(spark, sf_dir, run):
    """The rank-sum AUC must equal the definition: P(score_pos > score_neg)
    + 0.5 * P(tie), counted over all (pos, neg) pairs."""
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    users = (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") != "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("score"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("y"),
        )
        .collect()
    )
    pos = [r.score for r in users if r.y == 1]
    neg = [r.score for r in users if r.y == 0]
    assert pos and neg, "fixture must populate both classes"
    wins = sum((p > n_) + 0.5 * (p == n_) for p in pos for n_ in neg)
    want = wins / (len(pos) * len(neg))
    row = run("q122_auc_mann_whitney").collect()[0]
    assert row.n_pos == len(pos) and row.n_neg == len(neg)
    assert abs(row.auc - want) < 1e-6, (row.auc, want)
    assert abs(row.gini - (2 * row.auc - 1)) < 1e-6


def test_q121_l_diversity_bounds(run):
    rows = run("q121_l_diversity").collect()
    assert rows
    for r in rows:
        assert 1 <= r.distinct_sensitive <= 5  # five event types exist
        assert r.distinct_sensitive <= r.n_records
        assert r.meets_l == (r.distinct_sensitive >= 3)


def test_t32_blocklist_counts_are_consistent(run):
    rows = run("t32_blocklist_filter").collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dropped <= r.n_flagged <= r.n_docs
        assert r.total_hits >= r.n_flagged  # every flagged doc has >= 1 hit
        assert 0.0 <= r.hit_rate <= 1.0


def test_s17_flags_exactly_the_tail(spark, sf_dir, run):
    """Every emitted row respects |z| >= 2, and the flagged set is exactly
    the rows the moments imply (no off-by-one at the threshold)."""
    import math

    from guardian_for_apache_kafka_spark.sources.tables import load_table

    rows = run("s17_norm_outliers").collect()
    assert rows
    assert all(abs(r.z) >= 2.0 for r in rows)
    emb = load_table(spark, sf_dir, "embeddings").collect()
    sqs = {}
    for r in emb:
        acc = 0.0
        for x in r.embedding:
            acc += float(x) * float(x)
        sqs[r.vec_id] = acc
    n = len(sqs)
    s1 = sum(sqs.values())
    s2 = sum(v * v for v in sqs.values())
    mean = s1 / n
    sd = math.sqrt(s2 / n - mean * mean)
    want = {vid for vid, v in sqs.items() if abs((v - mean) / sd) >= 2.0}
    assert {r.vec_id for r in rows} == want


def test_t33_rank_accounting(run):
    rows = run("t33_lexical_sophistication").collect()
    assert rows
    for r in rows:
        assert r.n_tokens >= 1
        assert r.rank_mass >= r.n_tokens  # every rank >= 1
        assert abs(r.mean_rank - r.rank_mass / r.n_tokens) < 1e-3
        assert 0 <= r.n_rare <= r.n_tokens
        assert abs(r.rare_ratio - r.n_rare / r.n_tokens) < 1e-3


def test_q124_holt_recurrence_first_principles(run):
    """Replay the Holt fold in Python from the emitted actuals and check
    the emitted forecasts/levels/trends follow the recurrence."""
    rows = run("q124_holt_smoothing").collect()
    assert rows
    by_series = {}
    for r in rows:
        by_series.setdefault(r.event_type, []).append(r)
    for et, rs in by_series.items():
        rs.sort(key=lambda r: r.day)
        # each emitted forecast is last level + last trend (rounded at 4)
        for prev, cur in zip(rs, rs[1:]):
            assert abs(cur.forecast - (prev.level + prev.trend)) < 1.5e-4, (
                et, prev, cur,
            )


def test_q125_weighted_median_definition(spark, sf_dir, run):
    """The reported medians must satisfy the defining inequalities:
    weight(price < m) <= total/2 and weight(price <= m) >= total/2."""
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("p"),
        F.round(F.col("l_quantity")).cast("long").alias("w"),
    ).collect()
    got = {r.flag: (r.weighted_median_price, r.total_weight) for r in run("q125_weighted_median").collect()}
    assert got
    for flag, (m, total) in got.items():
        mc = round(m * 100)
        below = sum(r.w for r in li if r.flag == flag and r.p < mc)
        at_or_below = sum(r.w for r in li if r.flag == flag and r.p <= mc)
        tw = sum(r.w for r in li if r.flag == flag)
        assert tw == total
        assert 2 * below < tw + 1  # strictly less than half + tie room
        assert 2 * at_or_below >= tw


def test_t34_sentiment_consistency(run):
    rows = run("t34_sentiment_lexicon").collect()
    assert rows
    for r in rows:
        assert r.n_positive + r.n_negative <= r.n_docs
        if r.polarity is not None:
            assert -1.0 <= r.polarity <= 1.0


def test_d34_planner_landscape(run):
    """Banding theory sanity: more bands => lower inflection point s*;
    the single-band shape is the strictest (lowest FP), the 64-band
    shape the most permissive (lowest FN)."""
    rows = sorted(run("d34_lsh_parameter_plan").collect(), key=lambda r: r.bands)
    assert [r.bands for r in rows] == [1, 2, 4, 8, 16, 32, 64]
    stars = [r.s_star for r in rows]
    assert all(a >= b for a, b in zip(stars, stars[1:])), stars
    assert rows[0].fp_mass == min(r.fp_mass for r in rows)
    assert rows[-1].fn_mass == min(r.fn_mass for r in rows)


def test_g12_skew_stats_internally_consistent(run):
    rows = run("g12_slice_skew_report").collect()
    assert rows
    for r in rows:
        assert r.min_records <= r.median_records <= r.max_records
        assert r.skew_ratio >= 1.0
        assert 0 <= r.n_small_slices <= r.n_slices


def test_global_running_sum_heavy_ties_property(spark):
    """VERDICT r7 #6 property test: under HEAVY duplicate order keys (few
    distinct keys, many rows each, adversarial all-one-key shapes) the
    two-pass prefix sum is (a) row-exact against the single-partition
    RANGE window and (b) bit-identical across partition counts — the
    contract is enforced by the frame choice, not assumed from callers."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import Window

    from guardian_for_apache_kafka_spark.operators.layout import global_running_sum

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),  # 3 distinct keys max
                st.integers(min_value=-1000, max_value=1000),
            ),
            min_size=1,
            max_size=120,
        ),
        st.sampled_from([2, 3, 8]),
    )
    def check(pairs, n_parts):
        df = spark.createDataFrame(pairs, "k long, v long").repartition(5)
        want = sorted(
            (r.k, r.v, r.run)
            for r in df.withColumn(
                "run", F.sum("v").over(Window.orderBy("k"))
            ).collect()
        )
        got = sorted(
            (r.k, r.v, r.run)
            for r in global_running_sum(
                df, [F.col("k").asc()], "v", n_parts=n_parts
            ).collect()
        )
        assert got == want

    check()


def test_auc_empty_class_is_explicit_null(spark):
    """ADVICE r7: with an empty class (no positives yet — the early
    streaming micro-batch prefix) AUC is undefined; the contract is an
    explicit NULL with the counts still reported, not a silent
    divide-by-zero."""
    from guardian_for_apache_kafka_spark.operators.evaluation import auc_mann_whitney

    allneg = spark.createDataFrame([(3, 0), (5, 0), (9, 0)], "score long, y int")
    r = auc_mann_whitney(allneg).collect()[0]
    assert r.n_pos == 0 and r.n_neg == 3
    assert r.auc is None and r.gini is None
    allpos = spark.createDataFrame([(3, 1)], "score long, y int")
    r2 = auc_mann_whitney(allpos).collect()[0]
    assert r2.n_pos == 1 and r2.n_neg == 0 and r2.auc is None
