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


def histogram_quantile_rollup(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    time_col: str = "ts",
    bin_width_cents: int = 1000,
    quantiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """Mergeable-histogram quantile estimation — the quantile analogue of
    q48's HLL rollup: per-(group, day) sparse equi-width histograms of the
    integer-cents value (the artifact a 100 TB pipeline materializes per
    ingest day) SUM-merge into per-group totals without touching raw data
    again; each quantile estimate is the lower edge of the first bin whose
    cumulative count reaches ceil(q * n). The estimate's bin contains the
    ceil(q*n)-th ORDER STATISTIC by construction, and it is a
    deterministic integer function of the merged bins — exactly
    reproducible by an oracle, unlike t-digest/KLL internals.

    For attestation the result also carries a ``pXX_within_bin`` verdict
    against the exact INTERPOLATED percentile (one extra raw-data pass the
    production rollup would skip). Note the verdict is a data property,
    not a construction guarantee: interpolation sits between two adjacent
    order statistics, and on a sparse tail those can span more than one
    bin (e.g. n=2 values 0 and 100 put the interpolated median 5 bins
    above the order statistic's bin) — on such data the verdict
    legitimately reads false and the bin width should be widened. Scale shape: the daily histogram is one
    two-phase aggregate; the merge re-aggregates the BIN TABLE (groups x
    populated bins, tiny); the quantile walk is a window over the bin
    table ordered by bin."""
    from pyspark.sql.window import Window

    cents = F.round(F.col(value_col) * 100).cast("long")
    b = F.floor(cents / F.lit(float(bin_width_cents))).cast("long")
    day = F.to_date(F.col(time_col))
    daily = (
        df.select(F.col(group_col), day.alias("__day"), b.alias("__bin"))
        .groupBy(group_col, "__day", "__bin")
        .agg(F.count("*").alias("__c"))
    )
    rolled = daily.groupBy(group_col, "__bin").agg(F.sum("__c").alias("__c"))
    w_cum = Window.partitionBy(group_col).orderBy("__bin")
    w_all = Window.partitionBy(group_col)
    cum = rolled.withColumn("__cum", F.sum("__c").over(w_cum)).withColumn(
        "__total", F.sum("__c").over(w_all)
    )
    est_aggs = [F.max("__total").cast("long").alias("n")]
    for q in quantiles:
        tag = f"p{int(q * 100)}"
        est_aggs.append(
            (
                F.min(
                    F.when(
                        F.col("__cum") >= F.ceil(F.lit(q) * F.col("__total")),
                        F.col("__bin"),
                    )
                )
                * bin_width_cents
            )
            .cast("long")
            .alias(f"{tag}_cents")
        )
    est = cum.groupBy(group_col).agg(*est_aggs)
    exact_aggs = [
        F.expr(f"percentile(round({value_col} * 100), {q}D)").alias(
            f"__e{int(q * 100)}"
        )
        for q in quantiles
    ]
    exact = df.groupBy(group_col).agg(*exact_aggs)
    out = est.join(exact, group_col)
    for q in quantiles:
        tag = f"p{int(q * 100)}"
        lo = F.col(f"{tag}_cents")
        e = F.col(f"__e{int(q * 100)}")
        out = out.withColumn(
            f"{tag}_within_bin", (e >= lo) & (e <= lo + bin_width_cents)
        )
    return out.select(
        group_col, "n",
        *[c for q in quantiles for c in (f"p{int(q*100)}_cents", f"p{int(q*100)}_within_bin")],
    )
