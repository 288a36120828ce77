"""Model-evaluation statistics computed exactly at corpus scale.

The shared discipline: reduce to an integer VALUE-DOMAIN table first
(score -> class counts), walk that tiny table with ordered windows, and
let floating point in only for the final division — so every statistic is
bit-deterministic across engines, partitionings, and batch/streaming
formulations (the q101/q116 integer-moment pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def auc_mann_whitney(scored: DataFrame) -> DataFrame:
    """Exact tie-averaged AUC-ROC from a (score: long, y: 0/1) frame via
    the Mann-Whitney rank-sum: scores aggregate to (score, pos, neg), the
    running below-count walks the DOMAIN table (the only ordered window —
    domain-sized, never row-sized), and 2*R+ = sum(pos * (2*below + pos +
    neg + 1)) gives midrank tie handling for free in integer arithmetic.
    Returns one row: (n_pos, n_neg, auc, gini); auc/gini are an explicit
    NULL when either class is empty (undefined, not zero). Shared verbatim by the
    q122 batch query and the streaming AUC monitor's rollup
    (streaming/pipeline.auc_rollup) — the stream==batch equivalence test
    rides on this single implementation.

    At 100 TB: the caller's per-entity aggregate is the corpus exchange;
    this function touches only the score-domain table (bounded by the
    distinct integer scores) and constant-sized output."""
    dom = scored.groupBy("score").agg(
        F.sum("y").cast("long").alias("pos"),
        F.sum(1 - F.col("y")).cast("long").alias("neg"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    walked = dom.withColumn(
        "below", F.coalesce(F.sum(F.col("pos") + F.col("neg")).over(w), F.lit(0))
    )
    sums = walked.agg(
        F.sum(
            F.col("pos") * (2 * F.col("below") + F.col("pos") + F.col("neg") + 1)
        ).alias("two_ranksum_pos"),
        F.sum("pos").alias("np"),
        F.sum("neg").alias("nn"),
    )
    # an empty class (possible in a streaming rollup over an early
    # micro-batch prefix with no qualifying positives yet) makes AUC
    # undefined — emit an explicit NULL instead of a silent divide-by-zero
    # null-with-no-contract (ADVICE r7)
    auc = F.when(
        F.col("np") * F.col("nn") > 0,
        (F.col("two_ranksum_pos") - F.col("np") * (F.col("np") + 1)) * 1.0
        / (2 * F.col("np") * F.col("nn")),
    )
    return sums.select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        F.round(auc, 6).alias("auc"),
        F.round(auc * 2 - 1, 6).alias("gini"),
    )


def ks_statistic_pairs(samples: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance for EVERY pair of
    groups over an integer value column: D = max_v |F_a(v) - F_b(v)|,
    computed as the integer argmax of |c_a * n_b - c_b * n_a| over the
    value domain (one division at the end — the drift detector next to
    q109's PSI, sensitive to shape changes PSI's fixed bins miss).

    Plan: one (group, value) rollup (the corpus exchange, map-side
    combined), per-group running counts over the domain via a
    group-partitioned window, then a domain x groups-squared join that
    stays tiny because it runs on the DOMAIN table. Returns (group_a,
    group_b, n_a, n_b, ks_at, ks) with group_a < group_b, the argmax
    value and its earlier-value tie-break both integer decisions."""
    counts = samples.groupBy(group_col, value_col).agg(F.count("*").alias("c"))
    w_run = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    cum = counts.select(
        F.col(group_col).alias("g"),
        F.col(value_col).alias("v"),
        F.sum("c").over(w_run).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    # the domain grid per group has holes (a value unseen by group g);
    # densify by joining the global domain and carrying the last cum.
    # Derive domain and group lists from the already-aggregated counts
    # frame (ADVICE r7: distinct() on the corpus-sized samples frame added
    # two corpus-scale scans; counts is domain x groups-sized, so these
    # are domain-sized scans and the one corpus exchange really is the
    # (group, value) rollup)
    dom = counts.select(F.col(value_col).alias("v")).distinct()
    grps = counts.select(F.col(group_col).alias("g")).distinct()
    grid = dom.crossJoin(grps)
    w_fill = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dense = (
        grid.join(cum, ["g", "v"], "left")
        .select(
            "g",
            "v",
            F.last("cum", ignorenulls=True).over(w_fill).alias("cum"),
            F.max("n").over(Window.partitionBy("g")).alias("n"),
        )
        .withColumn("cum", F.coalesce("cum", F.lit(0)))
    )
    a = dense.select(
        F.col("g").alias("group_a"),
        "v",
        F.col("cum").alias("ca"),
        F.col("n").alias("n_a"),
    )
    b = dense.select(
        F.col("g").alias("group_b"),
        F.col("v").alias("vb"),
        F.col("cum").alias("cb"),
        F.col("n").alias("n_b"),
    )
    pairs = a.join(
        b, (F.col("v") == F.col("vb")) & (F.col("group_a") < F.col("group_b"))
    ).select(
        "group_a",
        "group_b",
        "v",
        "n_a",
        "n_b",
        F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")).alias("num"),
    )
    w_pick = Window.partitionBy("group_a", "group_b").orderBy(
        F.desc("num"), F.col("v")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w_pick))
        .where(F.col("rn") == 1)
        .select(
            "group_a",
            "group_b",
            "n_a",
            "n_b",
            F.col("v").cast("long").alias("ks_at"),
            F.round(F.col("num") * 1.0 / (F.col("n_a") * F.col("n_b")), 6).alias("ks"),
        )
        .orderBy("group_a", "group_b")
    )


def weighted_median_walk(points: DataFrame, key_col: str = "flag") -> DataFrame:
    """Exact weighted median per key from a (key, price_cents, w) points
    frame — THE single domain-walk implementation (ADVICE r7: q125 and the
    streaming rollup each had an inline copy that could drift; the
    stream==batch equivalence now rides on shared code, like the
    cusum/auc/ks twins). Integer cents x integer weights aggregate to the
    (key, price) domain (the one corpus-sized exchange, map-side
    combined), the running weight walks each key's domain-sized frame,
    and the median is the smallest price with 2*cum >= total — all
    integer comparisons, no interpolation ambiguity across engines.
    Returns (key_col, total_weight, weighted_median_price) ordered by key."""
    dom = points.groupBy(key_col, "price_cents").agg(F.sum("w").alias("w"))
    w_run = (
        Window.partitionBy(key_col)
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(key_col)
    walked = dom.select(
        key_col,
        "price_cents",
        F.sum("w").over(w_run).alias("cum"),
        F.sum("w").over(w_all).alias("total"),
    )
    picked = walked.where(2 * F.col("cum") >= F.col("total")).select(
        key_col,
        "price_cents",
        "total",
        F.row_number()
        .over(Window.partitionBy(key_col).orderBy("price_cents"))
        .alias("rn"),
    )
    return (
        picked.where(F.col("rn") == 1)
        .select(
            key_col,
            F.col("total").cast("long").alias("total_weight"),
            F.round(F.col("price_cents") / 100.0, 2).alias("weighted_median_price"),
        )
        .orderBy(key_col)
    )


def jsd_weekly_drift(counts: DataFrame) -> DataFrame:
    """Week-over-week Jensen-Shannon divergence from a (wk: date,
    et: string, c: long) count table — the shared core of the q141 batch
    query and the streaming drift monitor's rollup
    (streaming/pipeline.jsd_rollup); the stream==batch equivalence test
    rides on this single implementation.

    Distributions live on the dense week x type grid whose domains come
    from the AGGREGATED counts frame (never a corpus re-scan); absent
    types contribute their closed-form limits (0*ln0 = 0, q*ln2); the
    per-week terms fold in event-type order (the q127 sorted-fold
    discipline) so the float statistic is bit-identical across engines
    and partitionings. Everything here is grid-sized — the caller's
    count rollup is the only corpus-scale work."""
    weeks = counts.select("wk").distinct()
    types = counts.select("et").distinct()
    grid = (
        weeks.crossJoin(types)
        .join(counts, ["wk", "et"], "left")
        .select("wk", "et", F.coalesce("c", F.lit(0)).alias("c"))
        .withColumn("n", F.sum("c").over(Window.partitionBy("wk")))
    )
    prv = grid.select(
        F.date_add(F.col("wk"), 7).alias("wk"),
        "et",
        F.col("c").alias("__pc"),
        F.col("n").alias("__pn"),
    )
    p = F.col("c") * 1.0 / F.col("n")
    q = F.col("__pc") * 1.0 / F.col("__pn")
    mmid = (p + q) / 2
    term = F.when(p > 0, 0.5 * p * F.log(p / mmid)).otherwise(0.0) + F.when(
        q > 0, 0.5 * q * F.log(q / mmid)
    ).otherwise(0.0)
    pairs = grid.join(prv, ["wk", "et"]).select(
        "wk",
        "et",
        F.col("n").alias("n_curr"),
        F.col("__pn").alias("n_prev"),
        term.alias("term"),
    )
    return (
        pairs.groupBy("wk")
        .agg(
            F.max("n_curr").cast("long").alias("n_curr"),
            F.max("n_prev").cast("long").alias("n_prev"),
            F.round(
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("et", "term"))),
                        lambda s: s["term"],
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                6,
            ).alias("jsd"),
        )
        .select(F.col("wk").alias("week"), "n_curr", "n_prev", "jsd")
        .orderBy("week")
    )


def conditional_entropy_from_transitions(tr: DataFrame) -> DataFrame:
    """H(next | current) with perplexity from a (cur, nxt) transition
    frame — the shared core of the q142 batch query and the streaming
    chain monitor's rollup (streaming/pipeline.conditional_entropy_rollup,
    which feeds it the stateful stream_markov_transitions output with an
    unbounded session gap). One transition-keyed rollup (map-side
    combined); the |types|^2 matrix terms fold in next-type order (the
    q127 sorted-fold discipline) so the float entropy is bit-identical
    across engines and batch/stream formulations."""
    cnt = tr.groupBy("cur", "nxt").agg(F.count("*").alias("c"))
    n = F.sum("c").over(Window.partitionBy("cur"))
    p = F.col("c") * 1.0 / n
    probs = cnt.select("cur", "nxt", n.alias("n"), (p * F.log(p)).alias("term"))
    folded = probs.groupBy("cur").agg(
        F.max("n").cast("long").alias("n_transitions"),
        (
            -F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("nxt", "term"))),
                    lambda s: s["term"],
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ).alias("__h"),
    )
    return folded.select(
        F.col("cur").alias("from_type"),
        "n_transitions",
        F.round("__h", 6).alias("cond_entropy"),
        F.round(F.exp("__h"), 4).alias("perplexity"),
    ).orderBy("from_type")
