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


def edit_distance_pairs(
    df: DataFrame,
    col: str,
    max_bucket: int | None = None,
) -> DataFrame:
    """All unordered pairs of **distinct** values of ``df[col]`` with
    Levenshtein distance exactly 1 (distinct inputs make distance 0
    impossible), as ``(s_a, s_b)`` with ``s_a < s_b``.

    Plan: distinct -> explode deletion variants -> xxhash64 the variant
    (the only wide exchange carries ``(int64, string)``) -> self equi-join
    -> distinct candidates -> exact ``levenshtein <= 1`` verify. With
    ``max_bucket`` set, variants shared by more than that many strings are
    dropped before the join (hot-key cap; bounded recall loss, logged by
    callers who care — same contract as dedup.ngram_* ``max_bucket``).
    """
    names = df.select(F.col(col).alias("__s")).where(F.col("__s").isNotNull()).distinct()
    inv = names.select(
        "__s",
        F.explode(deletion_variants(F.col("__s"))).alias("__v"),
    ).select("__s", F.xxhash64("__v").alias("__h"))
    if max_bucket is not None:
        hot = inv.groupBy("__h").count().where(F.col("count") > max_bucket).select("__h")
        inv = inv.join(F.broadcast(hot), "__h", "left_anti")
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
