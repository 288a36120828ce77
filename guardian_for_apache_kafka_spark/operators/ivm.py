"""Incremental view maintenance (IVM) for additive aggregates.

The 100 TB problem this solves: a per-group rollup (counts, sums) over a
huge snapshot must not be recomputed from scratch every time a CDC batch
lands. Counts and sums are ABELIAN-GROUP aggregates — every change is
expressible as a signed delta — so the maintained view updates as
``new_agg = old_agg (+) delta_agg`` where ``delta_agg`` aggregates ONLY the
CDC batch: a Debezium-style change row contributes ``(-1, -before_value)``
under its before-group and ``(+1, +after_value)`` under its after-group
(update = delete+insert, which also handles group-changing updates). The
base table is never rescanned; the combine is a full-outer join between the
group-count-sized old view and the batch-sized delta.

Determinism contract: values should be exact integers (e.g. cents) so that
old + delta is bit-identical to a from-scratch recomputation — float sums
would drift by summation order (q53's integer-cents discipline).

No reference twin: guardian has no aggregate layer at all (SURVEY.md §2.2);
this is extension surface, the standard materialized-view delta rule
(count/sum self-maintainability) expressed as one Spark plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_agg_delta(
    cdc: DataFrame,
    group_col: str = "g",
    before_group: str = "before_g",
    before_val: str = "before_v",
    after_group: str = "after_g",
    after_val: str = "after_v",
) -> DataFrame:
    """Aggregate a CDC batch into per-group (count, sum) deltas.

    A NULL before-group marks an insert (no removal leg); a NULL
    after-group marks a delete (no addition leg); rows with both are
    updates and contribute both legs."""
    removed = cdc.where(F.col(before_group).isNotNull()).select(
        F.col(before_group).alias(group_col),
        F.lit(-1).cast("long").alias("__dn"),
        (-F.col(before_val)).cast("long").alias("__ds"),
    )
    added = cdc.where(F.col(after_group).isNotNull()).select(
        F.col(after_group).alias(group_col),
        F.lit(1).cast("long").alias("__dn"),
        F.col(after_val).cast("long").alias("__ds"),
    )
    return (
        removed.unionByName(added)
        .groupBy(group_col)
        .agg(F.sum("__dn").alias("__dn"), F.sum("__ds").alias("__ds"))
    )


def apply_agg_delta(
    old_agg: DataFrame,
    delta: DataFrame,
    group_col: str = "g",
    n_col: str = "n",
    sum_col: str = "s",
) -> DataFrame:
    """Combine a maintained (group, n, sum) view with a delta from
    :func:`cdc_agg_delta`: full-outer on the group (new groups appear,
    untouched groups pass through), counts and sums add, groups whose
    count reaches zero disappear — exactly the from-scratch result, with
    the base never rescanned."""
    return (
        old_agg.join(delta, group_col, "full_outer")
        .select(
            group_col,
            (F.coalesce(F.col(n_col), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0))).alias(n_col),
            (F.coalesce(F.col(sum_col), F.lit(0)) + F.coalesce(F.col("__ds"), F.lit(0))).alias(sum_col),
        )
        .where(F.col(n_col) > 0)
    )
