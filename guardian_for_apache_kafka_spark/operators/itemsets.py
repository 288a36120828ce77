"""Frequent-itemset mining, level 2 (a-priori frequent pairs).

Market-basket co-occurrence at scale is dominated by one number: the
C(basket_size, 2) pair fan-out. Two guards make it tractable at 100 TB —
both are the textbook a-priori discipline, not approximations of it:

1. **Frequent-singleton pruning** (the a-priori property): a pair can only
   be frequent if both items are, so baskets are semi-joined against the
   frequent-item set BEFORE any pair is generated. On heavy-tailed
   catalogs this removes most of every basket at map side (the frequent
   set is small and broadcasts).
2. **Basket cap**: a degenerate mega-basket (a crawler, a reseller
   account) contributes C(n, 2) pairs from a single row; baskets above
   ``max_basket`` surviving items are DROPPED — deterministic, declared,
   and replayed identically by the oracle — rather than silently dominating
   the shuffle (the d3 ``max_bucket`` stop-shingle discipline).

The pair count shuffle then carries (item, item) int pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _basket_items(baskets: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    """Distinct (basket, item) frame behind every a-priori level, lazily
    checkpointed (r11, guide §5): it feeds at least the singleton-support
    aggregate AND the pruning join in every consumer (4 consumers in the
    level-3 ladder), and without the barrier each consumer re-runs the
    corpus-scale scan + distinct exchange."""
    return (
        baskets.select(F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"))
        .distinct()
        .localCheckpoint(eager=False)
    )


def frequent_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_support: int,
    min_pair_support: int,
    max_basket: int = 50,
    _distinct_items: DataFrame | None = None,
) -> DataFrame:
    """Frequent item pairs from (basket, item) rows (duplicates tolerated —
    support counts DISTINCT baskets). Returns (item_a, item_b, support)
    with item_a < item_b, for pairs co-occurring in >= ``min_pair_support``
    baskets whose items each occur in >= ``min_item_support`` baskets.
    ``_distinct_items`` lets the level-3/rules ladders pass their shared
    :func:`_basket_items` frame instead of re-deriving it."""
    b = (
        _distinct_items
        if _distinct_items is not None
        else _basket_items(baskets, basket_col, item_col)
    )
    freq_items = (
        b.groupBy("__i")
        .agg(F.count("*").alias("__s"))
        .where(F.col("__s") >= min_item_support)
        .select("__i")
    )
    pruned = b.join(F.broadcast(freq_items), "__i")
    kept = (
        pruned.groupBy("__b")
        .agg(F.collect_list("__i").alias("__items"))
        .where(F.size("__items") <= max_basket)
        # sort so pair orientation is content-determined, not shuffle-order
        .select("__b", F.array_sort("__items").alias("__items"))
    )
    # pairs are generated INSIDE the sorted array (map-only; a per-item
    # explode + self-join on the basket key would pay a second exchange) —
    # item_a < item_b holds by the sort, and the sole shuffle is the final
    # pair-keyed count
    pairs = F.expr(
        "flatten(transform(__items, (x, i) -> "
        "transform(slice(__items, i + 2, size(__items)), "
        "y -> struct(x AS item_a, y AS item_b))))"
    )
    return (
        kept.select(F.explode(pairs).alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_pair_support)
    )


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_support: int,
    min_pair_support: int,
    max_basket: int = 50,
) -> DataFrame:
    """Directed association rules from level-2 itemsets: for every frequent
    pair {a, b}, both rules a=>b and b=>a with

    - ``support``   = distinct baskets containing both,
    - ``confidence``= support / baskets(antecedent),
    - ``lift``      = confidence / (baskets(consequent) / n_baskets).

    Plan: :func:`frequent_pairs` (one pair-keyed shuffle) -> explode each
    undirected pair into its two directions (map-only) -> two joins against
    the BROADCAST frequent-item support table (already small by the
    min-support filter) -> scalar n_baskets via a broadcast single-row
    cross. Denominators use the RAW distinct-basket item supports (standard
    a-priori bookkeeping), while pair supports inherit the declared
    ``max_basket`` cap. Division order is fixed (support/sa, then /(sb/n))
    so doubles replay bit-identically in the oracle."""
    b = _basket_items(baskets, basket_col, item_col)
    item_support = b.groupBy("__i").agg(F.count("*").alias("__s")).where(
        F.col("__s") >= min_item_support
    )
    n_baskets = b.select(F.countDistinct("__b").alias("__n"))
    pairs = frequent_pairs(
        baskets, basket_col, item_col,
        min_item_support=min_item_support,
        min_pair_support=min_pair_support,
        max_basket=max_basket,
        _distinct_items=b,
    )
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("antecedent"),
                    F.col("item_b").alias("consequent"),
                ),
                F.struct(
                    F.col("item_b").alias("antecedent"),
                    F.col("item_a").alias("consequent"),
                ),
            )
        ).alias("r"),
        "support",
    ).select("r.antecedent", "r.consequent", "support")
    sa = item_support.select(
        F.col("__i").alias("antecedent"), F.col("__s").alias("__sa")
    )
    sb = item_support.select(
        F.col("__i").alias("consequent"), F.col("__s").alias("__sb")
    )
    return (
        directed.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sb), "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "support",
            (F.col("support").cast("double") / F.col("__sa")).alias("confidence"),
            (
                (F.col("support").cast("double") / F.col("__sa"))
                / (F.col("__sb").cast("double") / F.col("__n"))
            ).alias("lift"),
        )
    )


def frequent_triples(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_support: int,
    min_pair_support: int,
    min_triple_support: int,
    max_basket: int = 20,
) -> DataFrame:
    """Level-3 a-priori: frequent item triples. The candidate ladder prunes
    twice before any triple exists — items below ``min_item_support`` leave
    the baskets (broadcast semi-join), then only items that participate in
    some frequent PAIR survive (the a-priori property one level up: a
    triple's every sub-pair must be frequent, so an item in no frequent
    pair can't be in any frequent triple). Triples generate INSIDE the
    sorted per-basket array (map-only, C(n,3) bounded by the declared
    ``max_basket`` cap — tighter than level 2's, as the fan-out is cubic);
    the one shuffle carries (int, int, int) triple keys. Returns
    (item_a, item_b, item_c, support), a < b < c."""
    b = _basket_items(baskets, basket_col, item_col)
    freq_items = (
        b.groupBy("__i")
        .agg(F.count("*").alias("__s"))
        .where(F.col("__s") >= min_item_support)
        .select("__i")
    )
    pruned = b.join(F.broadcast(freq_items), "__i")
    pairs = frequent_pairs(
        baskets, basket_col, item_col,
        min_item_support=min_item_support,
        min_pair_support=min_pair_support,
        max_basket=max_basket,
        _distinct_items=b,
    )
    pair_items = (
        pairs.select(F.col("item_a").alias("__i"))
        .unionAll(pairs.select(F.col("item_b").alias("__i")))
        .distinct()
    )
    pruned2 = pruned.join(F.broadcast(pair_items), "__i")
    kept = (
        pruned2.groupBy("__b")
        .agg(F.collect_list("__i").alias("__items"))
        .where(F.size("__items") <= max_basket)
        .select(F.array_sort("__items").alias("__items"))
        .where(F.size("__items") >= 3)
    )
    triples = F.expr(
        "flatten(transform(__items, (x, i) -> "
        "flatten(transform(slice(__items, i + 2, size(__items)), (y, j) -> "
        "transform(slice(__items, i + j + 3, size(__items)), "
        "z -> struct(x AS item_a, y AS item_b, z AS item_c))))))"
    )
    return (
        kept.select(F.explode(triples).alias("t"))
        .select("t.item_a", "t.item_b", "t.item_c")
        .groupBy("item_a", "item_b", "item_c")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_triple_support)
    )
