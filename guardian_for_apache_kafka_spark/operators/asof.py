"""Distributed as-of (nearest-event) join.

Spark has no ASOF JOIN operator (DuckDB/Pandas/kdb do); the naive encodings
are a range theta-join (quadratic blowup per key) or a per-key collect
(driver-bound). This implementation is the scale-correct composition of
existing operators: tag both sides, union, and resolve each left row's match
with a ``last(..., ignorenulls)`` running window over (key, time) order —
ONE shuffle on the by-keys, linear work per partition, no row explosion,
regardless of how many right rows precede each left row.

Semantics (= DuckDB ``ASOF JOIN`` with ``l.t >= r.t``, the oracle in
plans/pipeline_queries.py q25): for every left row, attach the right row with
the greatest right-time <= left-time (direction="backward"; "forward" gives
smallest right-time >= left-time) within the same by-keys, optionally
bounded by ``tolerance`` seconds; unmatched left rows keep NULL payloads
(left-outer shape). Ties on right-time resolve to the largest
``right_order`` column value (pass e.g. an offset/id column for determinism).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "timestamp",
    by: tuple[str, ...] = ("topic",),
    payload: tuple[str, ...] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_order: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """As-of join ``left`` to ``right`` on time column ``on`` within ``by`` keys.

    ``payload``: right columns to attach (default: all except ``by`` + ``on``).
    Returns left columns + ``on+suffix`` (matched right time) + payload columns
    (suffixed on collision).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    by = tuple(by)
    payload = tuple(payload if payload is not None else
                    [c for c in right.columns if c not in (*by, on)])
    out_names = {p: p + suffix if p in left.columns else p for p in payload}
    rt_name = on + suffix

    # one combined frame: right rows carry payload, left rows carry NULLs
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right.schema[on].dataType).alias("__rt"),
        F.lit(None).cast("long").alias("__ro"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(f"__p_{p}") for p in payload],
    )
    r_tagged = right.select(
        *[F.col(c) if c in (*by, on) else F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns],
        F.lit(0).alias("__is_left"),
        F.col(on).alias("__rt"),
        (F.col(right_order).cast("long") if right_order else F.lit(0)).alias("__ro"),
        *[F.col(p).alias(f"__p_{p}") for p in payload],
    )
    both = l_tagged.unionByName(r_tagged)

    # backward: right rows sort before left at equal time (<= matches);
    # forward: scan time-descending so "last seen" = smallest time >= left.
    t = F.col(on)
    time_ord: list[Column] = (
        [t.asc(), F.col("__is_left").asc(), F.col("__ro").asc()]
        if direction == "backward"
        else [t.desc(), F.col("__is_left").asc(), F.col("__ro").asc()]
    )
    w = (
        Window.partitionBy(*[F.col(k) for k in by])
        .orderBy(*time_ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    resolved = both.select(
        *[F.col(c) for c in left.columns],
        F.col("__is_left"),
        F.last("__rt", ignorenulls=True).over(w).alias(rt_name),
        *[F.last(f"__p_{p}", ignorenulls=True).over(w).alias(out_names[p]) for p in payload],
    ).where(F.col("__is_left") == 1).drop("__is_left")

    if tolerance_seconds is not None:
        gap = (
            F.unix_micros(F.col(on)) - F.unix_micros(F.col(rt_name))
            if direction == "backward"
            else F.unix_micros(F.col(rt_name)) - F.unix_micros(F.col(on))
        )
        in_tol = F.col(rt_name).isNotNull() & (gap <= int(tolerance_seconds * 1_000_000))
        resolved = resolved.select(
            *[F.col(c) for c in left.columns],
            F.when(in_tol, F.col(rt_name)).alias(rt_name),
            *[F.when(in_tol, F.col(out_names[p])).alias(out_names[p]) for p in payload],
        )
    return resolved
