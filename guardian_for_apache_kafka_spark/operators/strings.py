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

    Candidate pruning is POSITION-AUGMENTED (r12, §2.3/§8 — know what the
    optimizer cannot): two DISTINCT strings sharing a deletion variant are
    within ED 1 only via (a) a substitution — equal length, and then they
    MUST share a variant produced by deleting the SAME position i
    (deleting the differing position from both yields equal strings;
    deleting any other position keeps the differing character), or (b) an
    insertion/deletion — the short string IS a deletion variant of the
    long one (its self-slot row). So each index posting carries its
    deletion position and self flag, the join stays ONE equi-join on the
    int64 variant hash (same exchange count and key as before), and a
    two-integer-compare filter ``(i_a == i_b) XOR exactly-one-self``
    prunes the candidate stream to exactly the true ED<=1 pairs BEFORE
    the O(len^2) ``levenshtein`` verify runs (the verify stays, killing
    int64 hash collisions): on the sf0.1 digit-dense name fixture this
    cuts the verify stream from 977.5k candidates (every same-bucket ED-2
    pair) to the 262.5k true pairs. Unlike a candidate heuristic the cut
    is an invariant, so recall is untouched, and the ``max_bucket`` cap
    semantics are UNCHANGED: hot buckets are still detected on the plain
    distinct-variant index (the exact counts
    :func:`edit_distance_dropped_report` reports).
    """
    names = (
        df.select(F.col(col).alias("__s")).where(F.col("__s").isNotNull()).distinct()
    )
    # one posexplode over the UNDEDUPLICATED variant list: position i in
    # 0..len-1 is the deletion del_i; slot i == len is the string itself
    # (substr past the end yields ''+s = s, same as deletion_variants' last
    # slot). The lazy checkpoint materializes the index ONCE (cost lands
    # inside the first consuming job): it feeds both join sides, and its
    # rows are (string, int64, int, bool) — no variant text survives the
    # projection. Repeated deletions of one string can produce duplicate
    # (s, v) postings at different positions (e.g. 'aa' -> 'a' twice);
    # they only duplicate candidate rows, which the final distinct absorbs.
    # explode(sequence) + scalar substr/concat instead of a transform() HOF
    # over a built array: higher-order functions run interpreted, while this
    # whole projection stays in whole-stage codegen (measured ~0.3 s of the
    # index build at sf0.1)
    idx = names.select(
        "__s", F.explode(F.sequence(F.lit(0), F.length("__s"))).alias("__i")
    )
    variant = F.concat(
        F.col("__s").substr(F.lit(1), F.col("__i")),
        F.col("__s").substr(F.col("__i") + F.lit(2), F.length("__s")),
    )
    inv = idx.select(
        "__s",
        F.col("__i"),
        (F.col("__i") == F.length("__s")).alias("__self"),
        # __first marks the variant's FIRST occurrence among this string's
        # deletion slots: del_i(s) == del_j(s) (i < j) iff s[i..j] is a run
        # of one character, so a deletion is a repeat exactly when the
        # previous character equals the deleted one; the self slot is never
        # a repeat (its length differs from every deletion). Summing
        # __first per bucket reproduces the old distinct-variant posting
        # counts (= edit_distance_dropped_report's accounting) with a
        # plain aggregate over the checkpoint — no distinct exchange, no
        # re-derived index subtree, all in codegen.
        (
            (F.col("__i") == F.length("__s"))
            | (F.col("__i") == 0)
            | (
                F.col("__s").substr(F.col("__i"), F.lit(1))
                != F.col("__s").substr(F.col("__i") + F.lit(1), F.lit(1))
            )
        ).alias("__first"),
        F.xxhash64(variant).alias("__h"),
    ).localCheckpoint(eager=False)
    if max_bucket is not None:
        hot = (
            inv.groupBy("__h")
            .agg(F.sum(F.when(F.col("__first"), 1)).alias("__n"))
            .where(F.col("__n") > max_bucket)
        )
        inv = inv.join(F.broadcast(hot.select("__h")), "__h", "left_anti")
    a = inv.select(F.col("__s").alias("s_a"), F.col("__i").alias("__ia"),
                   F.col("__self").alias("__sa"), "__h")
    b = inv.select(F.col("__s").alias("s_b"), F.col("__i").alias("__ib"),
                   F.col("__self").alias("__sb"), "__h")
    # shuffled-hash beats sort-merge here: the int64 key needs no sort and
    # the build side is variant-index-sized. The position discipline prunes
    # ED-2 collisions with two integer compares; the exact levenshtein
    # verify then only pays for true pairs + hash collisions, and the
    # distinct's exchange carries only true pairs
    cand = a.join(b.hint("shuffle_hash"), "__h").where(
        (F.col("s_a") < F.col("s_b"))
        & (
            (~F.col("__sa") & ~F.col("__sb") & (F.col("__ia") == F.col("__ib")))
            | (F.col("__sa") != F.col("__sb"))
        )
        & (F.levenshtein("s_a", "s_b") <= 1)
    )
    return cand.select("s_a", "s_b").distinct()
