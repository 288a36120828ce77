"""Reproducible sampling for training-data pipelines.

`df.sample()` is seed-dependent but not content-stable: adding or removing
ANY row reshuffles which rows a given seed keeps, so holdout membership
churns between pipeline runs. Deterministic (content-hash) sampling fixes
membership per record forever — the standard way large corpus pipelines
carve train/validation/holdout splits that survive recrawls and backfills.

``deterministic_sample`` keeps a row iff the first 8 hex chars of
md5(seed || key) are lexicographically below the rate threshold. md5 is
bit-identical across engines (and available in DuckDB), so the exact split
is oracle-checkable — and reproducible in any other system that can md5.

``stratified_sample`` wraps ``sampleBy`` (per-stratum rates, seeded) for
engine-side balanced subsets; approximate by design, bounds tested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_bucket(key: Column, seed: str = "guardian") -> Column:
    """Stable [0, 1) bucket for a key: first 8 md5 hex chars as a fraction.
    Uniform to ~2^-32; string-compare portable across engines."""
    return F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 8)


def _threshold_hex(rate: float) -> str:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(int(rate * 0xFFFFFFFF), "08x")


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", seed: str = "guardian"
) -> DataFrame:
    """Content-stable sample: a record's membership depends only on
    (seed, key) — immune to corpus growth, partitioning, and row order."""
    return df.where(sample_bucket(F.col(key_col), seed) < _threshold_hex(rate))


def split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    seed: str = "guardian",
) -> dict[str, DataFrame]:
    """Disjoint, exhaustive, content-stable named splits (e.g. {"train": .98,
    "val": .01, "test": .01}). Each record lands in exactly one split, and
    stays there across runs and corpus versions."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = sample_bucket(F.col(key_col), seed)
    out: dict[str, DataFrame] = {}
    lo = 0.0
    names = list(weights)
    for i, name in enumerate(names):
        hi = lo + weights[name]
        upper = "ffffffff~" if i == len(names) - 1 else _threshold_hex(hi)  # last takes the tail
        out[name] = df.where((bucket >= _threshold_hex(lo)) & (bucket < upper))
        lo = hi
    return out


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum sampling (``sampleBy``): balanced subsets across e.g.
    languages or sources. Seeded but not content-stable — use
    deterministic_sample when membership must survive corpus changes."""
    return df.sampleBy(strata_col, fractions, seed)
