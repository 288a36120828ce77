"""Skyline (Pareto frontier) queries — multi-criteria "best trade-off" rows.

A row is on the skyline iff no other row dominates it: at least as good on
EVERY criterion and strictly better on at least one (Börzsönyi et al.,
ICDE'01). The naive formulation is a NOT EXISTS self-theta-join — a
cartesian O(n²) that no optimizer can save at scale.

Scale design — the two-phase prune (the MapReduce skyline formulation):

1. **Local skyline, map-only.** Each Arrow batch computes its own Pareto
   frontier with a vectorized numpy scan (sorted walk against the kept
   frontier, O(n·k·d) with k = local frontier size). Dominated-by-a-local-
   peer implies dominated-globally, so dropping them is conservative; for
   randomly ordered data the expected frontier of a batch is O(log^(d-1) n)
   rows, so phase 1 eliminates ~everything with ZERO shuffle.
2. **Global finish, exact.** Survivors (partitions x tiny frontier) are
   coalesced into one task and pruned again with the same kernel — exact
   because domination is transitive: any globally dominated row is
   dominated by some global-skyline row, and every global-skyline row
   survives its local phase untouched.

Caveat documented for adversarial layouts: if the input arrives SORTED by
one criterion, local frontiers degenerate toward O(batch) and the finish
task grows; a cheap salt-repartition restores the random-order expectation
(not applied by default — it costs the shuffle the operator exists to avoid).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pareto_prune(pdf: pd.DataFrame, crit: list[str], signs: list[int]) -> pd.DataFrame:
    """Exact Pareto frontier of one pandas batch. ``signs[i]`` is +1 for
    maximize, -1 for minimize. Equal points (ties on every criterion) do
    not dominate each other — all survive."""
    import numpy as np

    if len(pdf) == 0:
        return pdf
    m = pdf[crit].to_numpy(dtype="float64") * np.asarray(signs, dtype="float64")
    # descending lexicographic: a row can only be dominated by an earlier one
    order = np.lexsort(tuple(-m[:, i] for i in reversed(range(m.shape[1]))))
    kept_idx: list[int] = []
    kept: list = []
    for i in order:
        cand = m[i]
        dominated = False
        if kept:
            k = np.asarray(kept)
            dominated = bool(((k >= cand).all(axis=1) & (k > cand).any(axis=1)).any())
        if not dominated:
            kept_idx.append(i)
            kept.append(cand)
    return pdf.iloc[sorted(kept_idx)]


def skyline(
    df: DataFrame,
    minimize: list[str] | None = None,
    maximize: list[str] | None = None,
) -> DataFrame:
    """Rows of ``df`` not dominated on the given criteria (all of
    ``minimize`` lower-or-equal AND all of ``maximize`` higher-or-equal,
    with at least one strict). Criterion columns must be numeric and
    non-null (filter first; NULL has no defined domination order)."""
    minimize = minimize or []
    maximize = maximize or []
    crit = [*minimize, *maximize]
    if not crit:
        raise ValueError("at least one minimize/maximize column required")
    missing = [c for c in crit if c not in df.columns]
    if missing:
        raise ValueError(f"criterion columns not in frame: {missing}")
    signs = [-1] * len(minimize) + [1] * len(maximize)
    schema = df.schema

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _pareto_prune(pdf, crit, signs)

    local = df.mapInPandas(prune, schema=schema)
    # exact finish: one task over the few local survivors
    return local.coalesce(1).mapInPandas(prune, schema=schema)
