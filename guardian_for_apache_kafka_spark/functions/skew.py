"""Skew-mitigation utilities for the 100 TB posture.

AQE's skew-join splitting (on in the engine session) handles sort-merge skew
at runtime, but two cases still need explicit salting:

- hot-key shuffle joins where one side must replicate (AQE cannot split a
  broadcast-ineligible build side keyed by one hot value),
- non-algebraic aggregations (collect_list/set-style) where partial
  aggregation cannot shrink a hot group before the shuffle.

``salted_join`` implements the classic replicate-and-salt pattern: the skewed
(probe) side gets a uniform random salt in [0, buckets); the build side is
replicated ``buckets`` times via an explode — the join key becomes
(key, salt), spreading each hot key over ``buckets`` reducers. Results are
exactly equal to the unsalted join (verified in tests); cost is build-side
replication, so size buckets to the observed skew, not to the cluster.

``top_keys`` finds the hot keys worth salting — at scale, run it on a sample
(``df.sample(0.01)``) and salt only keys above a frequency threshold
(selective salting), joining the rest unsalted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_keys(df: DataFrame, key: str, n: int = 20, min_count: int | None = None) -> DataFrame:
    """Frequency of the ``n`` hottest values of ``key`` (run on a sample at
    scale). Feeds selective salting decisions."""
    counts = df.groupBy(key).agg(F.count("*").alias("cnt"))
    if min_count is not None:
        counts = counts.where(F.col("cnt") >= min_count)
    return counts.orderBy(F.col("cnt").desc(), key).limit(n)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on column ``on`` with the skewed side's hot
    keys spread over ``buckets`` reducers.

    Supported ``how``: inner / left (the skewed side must be the outer side —
    replicating the preserved side would duplicate unmatched rows).
    Deterministic salting: salt = pmod(xxhash64(whole skewed row), buckets)
    keeps retried tasks consistent (rand() would break task retry idempotency).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in skewed.columns])), F.lit(buckets))
    left = skewed.withColumn("__salt", salt.cast("int"))
    right = other.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    return left.join(right, [on, "__salt"], how).drop("__salt")
