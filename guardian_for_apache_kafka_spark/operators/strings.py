"""String-similarity joins via symmetric deletion neighborhoods.

The public SymSpell observation: two strings are within Levenshtein
distance 1 iff their deletion neighborhoods *including self* intersect —
a deletion covers b = del(a); an insertion covers a = del(b); a
substitution at position i makes del_i(a) = del_i(b). That collapses the
O(n^2) string theta-join into an EQUI-join on variant keys, followed by an
exact ``levenshtein()`` verify over the (tiny) candidate set only — false
positives from the variant join (or from hashing variants) die in the
verify, so recall is guaranteed and precision is exact.

Scale posture (100 TB): each distinct string emits ``length+1`` variant
keys, hashed to int64 so the one shuffle carries ``(hash, string)`` rather
than long variant texts; hot variants (a key shared by a degenerate number
of strings) are droppable via ``max_bucket`` exactly like the stop-shingle
cap in :mod:`.dedup` — with the same documented recall trade. The verify
is a per-candidate JVM ``levenshtein`` (whole-stage codegen), never Python.

Reference parity note: the reference engine has no fuzzy string join; this
is part of the training-data-pipeline surface (entity/near-key resolution
before dedup), same family as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def deletion_variants(c: Column) -> Column:
    """``array<string>`` of all single-character deletions of ``c`` plus
    ``c`` itself (the i = length(c) slot), distinct. Pure built-ins —
    ``transform`` over ``sequence(0, length)`` with two substrings — so the
    whole neighborhood generation stays inside whole-stage codegen."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.length(c)),
            lambda i: F.concat(
                c.substr(F.lit(1), i), c.substr(i + F.lit(2), F.length(c))
            ),
        )
    )


def _variant_index(df: DataFrame, col: str) -> DataFrame:
    """(``__s`` string, ``__h`` int64 variant hash) deletion-neighborhood
    inverted index over the distinct non-null values of ``df[col]``."""
    names = df.select(F.col(col).alias("__s")).where(F.col("__s").isNotNull()).distinct()
    return names.select(
        "__s",
        F.explode(deletion_variants(F.col("__s"))).alias("__v"),
    ).select("__s", F.xxhash64("__v").alias("__h"))


def edit_distance_dropped_report(
    df: DataFrame,
    col: str,
    max_bucket: int = 1024,
) -> DataFrame:
    """One-row accounting of what the ``max_bucket`` cap in
    :func:`edit_distance_pairs` drops on this corpus: ``n_variant_keys``
    (distinct variant hashes), ``n_hot_variant_keys`` (buckets over the
    cap), ``n_postings`` (total index entries) and ``n_dropped_postings``
    (entries the cap removes). The job is one aggregate over the int64
    variant index — no string payloads, no join — so running it alongside
    the pair join costs one narrow pass; callers log/record the row (the
    registry twin records it in SCALE.md)."""
    counts = _variant_index(df, col).groupBy("__h").agg(F.count(F.lit(1)).alias("__n"))
    return counts.agg(
        F.count(F.lit(1)).alias("n_variant_keys"),
        F.count(F.when(F.col("__n") > max_bucket, 1)).alias("n_hot_variant_keys"),
        F.sum("__n").alias("n_postings"),
        F.coalesce(
            F.sum(F.when(F.col("__n") > max_bucket, F.col("__n"))), F.lit(0)
        ).alias("n_dropped_postings"),
    )


def edit_distance_pairs(
    df: DataFrame,
    col: str,
    max_bucket: int | None = 1024,
) -> DataFrame:
    """All unordered pairs of **distinct** values of ``df[col]`` with
    Levenshtein distance exactly 1 (distinct inputs make distance 0
    impossible), as ``(s_a, s_b)`` with ``s_a < s_b``.

    Plan: distinct -> explode deletion variants -> xxhash64 the variant
    (the only wide exchange carries ``(int64, string)``) -> self equi-join
    -> distinct candidates -> exact ``levenshtein <= 1`` verify. Variants
    shared by more than ``max_bucket`` strings are dropped before the join
    (hot-key cap; bounded recall loss — same contract as dedup.ngram_*
    ``max_bucket``). The cap DEFAULTS ON (r6 advice): a degenerate key
    family — e.g. sequential digit strings, where one deletion variant can
    cover thousands of keys — would otherwise pay an uncapped
    quadratic-in-bucket candidate join by default; callers wanting exact
    recall pass ``max_bucket=None`` explicitly. A bucket of ``b`` strings
    proposes ``b^2`` candidates, so 1024 bounds any single variant's
    contribution at ~1M candidate rows per bucket while sitting far above
    organic bucket sizes (name data peaks at tens).

    The cap's recall cost is measurable with
    :func:`edit_distance_dropped_report` (same variant index, one tiny
    aggregate job) — the d16-style registry callers record it in SCALE.md.
    """
    # materialize the variant index ONCE (lazy local checkpoint — the cost
    # lands inside the first consuming job, not at plan-build time): the
    # index feeds the hot-bucket count AND both join sides, and without the
    # checkpoint each consumer re-runs the distinct + variant explode +
    # xxhash64 from the scan (the r11 plan showed 3 Generate subtrees; with
    # the d16 caller's two union branches, 8). The index is (string, int64)
    # rows — the same order of magnitude as the shuffle it feeds, so the
    # one-time materialization is strictly cheaper than re-deriving it.
    inv = _variant_index(df, col).localCheckpoint(eager=False)
    if max_bucket is not None:
        hot = (
            inv.groupBy("__h")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > max_bucket)
        )
        inv = inv.join(F.broadcast(hot.select("__h")), "__h", "left_anti")
    a = inv.select(F.col("__s").alias("s_a"), "__h")
    b = inv.select(F.col("__s").alias("s_b"), "__h")
    # shuffled-hash beats sort-merge here: the int64 key needs no sort and
    # the build side is variant-index-sized; the exact levenshtein verify
    # runs BEFORE the pair distinct, so the distinct's exchange carries
    # only true pairs (~4x fewer rows than candidates on digit-dense keys
    # where the delete1-intersection admits ED-2 false positives)
    cand = a.join(b.hint("shuffle_hash"), "__h").where(
        (F.col("s_a") < F.col("s_b")) & (F.levenshtein("s_a", "s_b") <= 1)
    )
    return cand.select("s_a", "s_b").distinct()
