"""Single-pass table profiling — the ingest data-quality primitive.

Row count, null count, exact distinct count, min/max/mean for every
profiled column, computed in ONE aggregate over ONE scan and melted to a
row per column with ``stack()``. The naive per-column loop re-scans the
table once per column; at 100 TB that is the difference between one pass
and N. Multiple exact count-distincts plan as a single Expand (xN rows)
before the shuffle — the standard Spark multi-distinct strategy; swap
``approx_count_distinct`` in via ``exact_distinct=False`` when a profiled
table is too hot for the Expand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def numeric_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, NUMERIC_TYPES)]


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``cols`` (default: every numeric column) in one scan.
    Returns one row per column:
    (col_name, n, n_null, n_distinct, min_v, max_v, avg_v)."""
    cols = sorted(cols if cols is not None else numeric_columns(df))
    if not cols:
        raise ValueError("no numeric columns to profile")
    ndv = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            (F.count("*") - F.count(c)).alias(f"{c}__n_null"),
            ndv(c).alias(f"{c}__n_distinct"),
            # doubles throughout: stack() requires homogeneous types across
            # rows, and profiled columns mix INT/BIGINT/DOUBLE
            F.round(F.min(c).cast("double"), 2).alias(f"{c}__min_v"),
            F.round(F.max(c).cast("double"), 2).alias(f"{c}__max_v"),
            F.round(F.avg(c).cast("double"), 2).alias(f"{c}__avg_v"),
        ]
    wide = df.select(*cols).agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__n, {c}__n_null, {c}__n_distinct, {c}__min_v, {c}__max_v, {c}__avg_v"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(col_name, n, n_null, n_distinct, min_v, max_v, avg_v)"
    ).orderBy("col_name")
