"""Time-series similarity over event streams (EDBT'19 "Time Series
Similarity Search for Streaming Data in Distributed Systems" problem shape,
re-expressed relationally).

The engine's unit of similarity is an *activity profile*: a dense, fixed-
dimension integer vector per entity (here: events per hour-of-day). Fixed
dimensionality makes all-pairs scoring a bounded equi-join on the bucket
index, and INTEGER sums make the Pearson correlation bit-deterministic
across engines: numerator and variance terms are exact int64 arithmetic,
and the final double expression (one multiply, one sqrt, one divide on
identical integers) is IEEE-correctly-rounded everywhere — which is what
lets the q42 oracle hash-match instead of tolerance-match.

Scale shape: profiles are |entities| x buckets rows (tiny vs the event
log); the pair join runs on an explicitly bounded entity set (broadcast) —
for unbounded corpora, feed the profile vectors to the similarity/LSH
machinery (operators/similarity.py) instead of all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def activity_profile(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    buckets: int = 24,
) -> DataFrame:
    """Dense hour-of-day activity profile: (id, bucket, cnt) with every
    bucket present (zero-filled) — correlation needs aligned dense vectors,
    and a sparse join would silently drop anti-correlated zero buckets."""
    ids = events.select(F.col(id_col).alias("__id")).distinct()
    grid = ids.crossJoin(
        events.sparkSession.range(buckets).select(F.col("id").cast("int").alias("__b"))
    )
    counts = events.select(
        F.col(id_col).alias("__id"),
        # pmod keeps every event inside the grid for any bucket count
        # (buckets=24 is the identity on hour-of-day)
        F.pmod(F.hour(ts_col), F.lit(buckets)).cast("int").alias("__b"),
    ).groupBy("__id", "__b").agg(F.count("*").alias("__c"))
    return grid.join(counts, ["__id", "__b"], "left").select(
        "__id", "__b", F.coalesce("__c", F.lit(0)).alias("__c")
    )


def profile_vectors(profiles: DataFrame, id_out: str = "vec_id") -> DataFrame:
    """Collapse a dense (id, bucket, cnt) profile into an ordered array
    column — the bridge from bounded all-pairs correlation to the ANN
    machinery for unbounded entity sets: feed the result to
    ``similarity.cosine_topk`` / ``ivf_topk`` or
    ``dedup.embedding_near_dup_pairs`` (cosine of mean-centered profiles is
    Pearson, so near-neighbor search over these vectors IS correlation
    search at scale)."""
    return (
        profiles.groupBy("__id")
        .agg(F.array_sort(F.collect_list(F.struct("__b", "__c"))).alias("__p"))
        .select(
            F.col("__id").alias(id_out),
            F.transform("__p", lambda s: s["__c"].cast("double")).alias("embedding"),
        )
    )


def correlated_pairs(
    profiles: DataFrame,
    min_corr: float = 0.2,
    buckets: int = 24,
) -> DataFrame:
    """All-pairs Pearson correlation over dense integer profiles.

    Per pair: n*Sxy - Sx*Sy and the two variance terms are EXACT int64; the
    only floating-point ops are the final multiply/sqrt/divide, identical on
    both engines. Constant profiles (zero variance) are excluded — their
    correlation is undefined. Callers bound the entity set; the join is
    |ids|^2 * buckets rows of 3 ints, broadcast-friendly."""
    a = profiles.select(
        F.col("__id").alias("id_a"), "__b", F.col("__c").alias("__ca")
    )
    b = profiles.select(
        F.col("__id").alias("id_b"), "__b", F.col("__c").alias("__cb")
    )
    joined = a.join(b, "__b").where(F.col("id_a") < F.col("id_b"))
    sums = joined.groupBy("id_a", "id_b").agg(
        F.sum(F.col("__ca") * F.col("__cb")).alias("sxy"),
        F.sum("__ca").alias("sx"),
        F.sum("__cb").alias("sy"),
        F.sum(F.col("__ca") * F.col("__ca")).alias("sxx"),
        F.sum(F.col("__cb") * F.col("__cb")).alias("syy"),
    )
    n = F.lit(buckets)
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    d1 = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    d2 = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return (
        sums.where((d1 > 0) & (d2 > 0))
        .select("id_a", "id_b", (num / F.sqrt(d1 * d2)).alias("corr"))
        .where(F.col("corr") >= min_corr)
    )


def rolling_zscore_anomalies(
    events: DataFrame,
    lookback: int = 20,
    z_threshold: float = 3.0,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    scale: int = 100,
) -> DataFrame:
    """Rolling z-score anomaly detection: flag events whose value deviates
    from the mean of the ``lookback`` PRECEDING events (per key, time order,
    current row excluded — no self-contamination) by ``z_threshold`` sample
    standard deviations. Returns (key, id, ts, value, z).

    Only rows with a FULL lookback window are scored (count = lookback), so
    every z is computed from the same-size sample and the statistic is
    well-defined from the first emitted row.

    Determinism (q42's integer-sums discipline): values are scaled to int64
    (``scale`` = 100 for cent-precision inputs) and the window computes
    integer sum / sum-of-squares; the z expression
    ``(n*x - sx) * sqrt((n-1) / (n * (n*sxx - sx^2)))`` then performs a
    handful of IEEE-exact double ops on identical integers — bit-identical
    across engines, no tolerance needed at the threshold.

    Scale shape: ONE hash exchange on the key column, one sort within
    partitions, one pass — the window never buffers more than ``lookback``
    rows per key, and the input projects down to (key, id, ts, value) BEFORE
    the exchange so unrelated payload columns never ride the shuffle.
    Skewed keys split by time range upstream if a single key dominates (the
    frame only needs contiguity within each split + lookback rows of
    overlap)."""
    x = F.round(F.col(value_col) * scale).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-lookback, -1)
    )
    # __x2 is pre-projected so all three aggregates see plain column inputs
    # and fuse into ONE Window operator (an expression input would force an
    # intermediate Project and split the window evaluation in two)
    scored = (
        events.select(key_col, id_col, ts_col, value_col)
        .withColumn("__x", x)
        .withColumn("__x2", F.col("__x") * F.col("__x"))
        .withColumn("__n", F.count("__x").over(w))
        .withColumn("__sx", F.sum("__x").over(w))
        .withColumn("__sxx", F.sum("__x2").over(w))
        .where(F.col("__n") == lookback)
    )
    num = F.col("__n") * F.col("__x") - F.col("__sx")
    var_term = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    z = num.cast("double") * F.sqrt(
        (F.col("__n") - 1).cast("double") / (F.col("__n") * var_term).cast("double")
    )
    return (
        scored.where(var_term > 0)
        .withColumn("z", z)
        .where(F.abs(F.col("z")) >= z_threshold)
        .select(key_col, id_col, ts_col, value_col, "z")
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Ordered-funnel analysis: per key, the earliest *qualified* timestamp of
    each step, where step i qualifies only if some qualified step i-1 happened
    STRICTLY BEFORE it (order = (ts, id), ties resolved by id). Returns
    (key, steps_completed, step1_ts..stepN_ts) for keys that reached step 1.

    Semantics: the textbook "earliest qualified event" funnel — a step-2
    event before the first step-1 event does not count, and the chain is
    evaluated left to right, so ``steps_completed`` is monotone in prefix
    order. Every comparison is on exact timestamps/ids — no floats anywhere,
    so the oracle matches without tolerance.

    Scale shape: ONE hash exchange on the key (all N stacked window passes
    share the same partitioning/ordering spec), then one partial-agg groupBy
    on the same key — no self-joins, no per-step scans of the event log. The
    running state per window pass is a single min timestamp."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    df = events.select(key_col, ts_col, type_col, id_col).withColumn(
        "__q0", F.when(F.col(type_col) == steps[0], F.col(ts_col))
    )
    for i, s in enumerate(steps[1:], 1):
        prev_first = F.min(f"__q{i - 1}").over(w)
        df = df.withColumn(
            f"__q{i}",
            F.when((F.col(type_col) == s) & prev_first.isNotNull(), F.col(ts_col)),
        )
    agg = df.groupBy(key_col).agg(
        *[F.min(f"__q{i}").alias(f"step{i + 1}_ts") for i in range(len(steps))]
    )
    completed = F.lit(0)
    for i in range(len(steps)):
        completed = F.when(
            F.col(f"step{i + 1}_ts").isNotNull(), F.lit(i + 1)
        ).otherwise(completed)
    return (
        agg.withColumn("steps_completed", completed.cast("int"))
        .where(F.col("step1_ts").isNotNull())
        .select(
            key_col,
            "steps_completed",
            *[f"step{i + 1}_ts" for i in range(len(steps))],
        )
    )


def sliding_pattern_topk(
    events: DataFrame,
    pattern: list[float],
    k: int = 20,
    key_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
) -> DataFrame:
    """Subsequence pattern search (the EDBT'19 streaming-similarity shape):
    slide a |pattern|-length window over each key's time-ordered value
    series and return the k closest windows by squared Euclidean distance.

    Distance arithmetic is INTEGER CENTS end to end (values and pattern
    scaled x100 to BIGINT before the squared-difference fold), so scores
    are bit-identical across engines — the q53 oracle recomputes them
    exactly in DuckDB; no float summation order can flip a ranking.

    Scale shape: ONE hash exchange on the key + per-partition sort (the
    same single-window discipline as q44's z-score); window frames hold
    |pattern| rows of state; top-k is TakeOrderedAndProject (per-partition
    heap, k rows to the driver), never a global sort. The pattern ships as
    a literal — nothing broadcasts, nothing self-joins."""
    L = len(pattern)
    ts_col, id_col = order_cols
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-(L - 1), Window.currentRow)
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    pat = F.array(*[F.lit(int(round(p * 100))).cast("long") for p in pattern])
    win = F.collect_list(cents).over(w)
    scored = (
        events.select(key_col, ts_col, id_col, win.alias("__w"))
        .where(F.size("__w") == L)
        .select(
            key_col,
            F.col(id_col).alias("window_end_id"),
            F.aggregate(
                F.zip_with(F.col("__w"), pat, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dist"),
        )
    )
    return scored.orderBy("dist", key_col, "window_end_id").limit(k)


def rolling_distinct_sketch(
    events: DataFrame,
    window_days: int = 7,
    key_col: str = "user_id",
    group_col: str = "event_type",
    time_col: str = "ts",
    lg_k: int = 12,
) -> DataFrame:
    """Rolling N-day distinct counts via mergeable HLL sketches — the
    SLIDING-window extension of q48's rollup: one per-(group, day) sketch
    (the artifact a pipeline materializes per ingest day) is UNIONED across
    a calendar RANGE frame per group, so each day's trailing-window
    distinct costs a sketch merge, not a rescan of N days of raw events
    (distinct doesn't add across days; sketch union handles the overlap in
    constant memory).

    The frame is a RANGE over the epoch-day number, not ROWS — a missing
    day in a group must shrink the window's content, not silently extend
    it to older rows. Output carries the exact windowed distinct (computed
    in-query from per-day key sets — the verdict pass a production rollup
    skips) and the q48-style 5% bound verdict; rows anchor on the exact
    counts so the oracle hash-matches."""
    from pyspark.sql.window import Window as W

    day = F.to_date(F.col(time_col))
    daily = (
        events.select(F.col(group_col), day.alias("day"), F.col(key_col))
        .groupBy(group_col, "day")
        .agg(
            F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("__sk"),
            F.collect_set(key_col).alias("__keys"),
        )
        .withColumn("__dnum", F.unix_date(F.col("day")))
    )
    w = (
        W.partitionBy(group_col)
        .orderBy("__dnum")
        .rangeBetween(-(window_days - 1), 0)
    )
    est = F.hll_sketch_estimate(F.hll_union_agg("__sk").over(w))
    exact = F.size(F.array_distinct(F.flatten(F.collect_list("__keys").over(w))))
    return daily.select(
        group_col,
        "day",
        exact.cast("long").alias("n_exact"),
        (F.abs(est - exact) / exact <= 0.05).alias("within_5pct"),
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    grid_seconds: int = 600,
) -> DataFrame:
    """Interval-interval overlap join ([a_start, a_end] intersects
    [b_start, b_end], closed ends) — the generalization of q7's
    point-in-range join, and the classic case where the naive theta join
    is a cartesian product no optimizer can save.

    GRID BUCKETING makes it an equi-join: each interval explodes to the
    epoch-time grid cells it spans, the join runs on the cell key, and the
    residual overlap predicate filters within the cell. Duplicate pair
    elimination is FREE (no distinct): a pair is kept only in the cell
    containing greatest(a_start, b_start) — for overlapping intervals that
    instant lies in both intervals, so exactly one joined cell row
    survives; a distinct would re-shuffle every matched pair.

    At 100 TB: fan-out per row = interval_len/grid_seconds + 1 cells, so
    pick the grid near the median interval length (fan-out ~2 rows); cell
    keys are dense integers and hot cells are ordinary AQE-visible skew.
    Output: all columns of ``a`` then ``b`` plus ``overlap_seconds``
    (exact int64). Column names must not collide between the sides."""
    dup = set(a.columns) & set(b.columns)
    if dup:
        raise ValueError(f"column collision between sides: {sorted(dup)}")

    def cells(df: DataFrame, start: str, end: str) -> DataFrame:
        lo = (F.unix_timestamp(start) / grid_seconds).cast("long")
        hi = (F.unix_timestamp(end) / grid_seconds).cast("long")
        return df.withColumn("__cell", F.explode(F.sequence(lo, hi)))

    ac, bc = cells(a, a_start, a_end), cells(b, b_start, b_end)
    anchor = F.greatest(F.col(a_start), F.col(b_start))
    return (
        ac.join(bc, "__cell")
        .where(
            (F.col(a_start) <= F.col(b_end))
            & (F.col(b_start) <= F.col(a_end))
            & ((F.unix_timestamp(anchor) / grid_seconds).cast("long") == F.col("__cell"))
        )
        .drop("__cell")
        .withColumn(
            "overlap_seconds",
            F.unix_timestamp(F.least(F.col(a_end), F.col(b_end)))
            - F.unix_timestamp(anchor),
        )
    )


def coalesce_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping-or-touching ``[start, end]`` intervals per key into
    maximal islands: ``(key, island_start, island_end, n_intervals)``.

    The classic one-window plan: per key ordered by (start, end), an interval
    opens a new island iff its start exceeds the running max of all previous
    ends; the island id is the running count of such opens, and the final
    shape is one groupBy over (key, island). Exactly ONE shuffle (the window
    and the aggregate share the key partitioning — AQE reuses the exchange),
    state per row is a single max, and skewed keys parallelize like any
    window (a key's timeline must be ordered, so per-key order is inherent
    to the semantics, same posture as q44's rolling window).
    """
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    opens = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    islands = df.select(
        F.col(key_col),
        F.col(start_col),
        F.col(end_col),
        F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("__island"),
    )
    return islands.groupBy(key_col, "__island").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.count("*").alias("n_intervals"),
    ).drop("__island")


def sweep_daily_peaks(pts: DataFrame, n_parts: int | None = None) -> DataFrame:
    """Peak concurrency by partition-parallel sweep line over boundary
    points ``(t timestamp, delta int)`` (+1 at interval start, -1 at end):
    returns (day, peak, first_peak_at). The shared core of the q113
    relational query and its streaming twin
    (streaming/pipeline.stream_concurrency_points).

    Two-pass sweep (never a corpus-sized global window — the r6 verdict's
    one scale-killer), via the generalized primitive
    operators/layout.global_running_sum: range-partition on the sweep
    order (t ASC, delta DESC — equal keys land in one range bucket),
    per-partition running sums in parallel, broadcast prefix offsets.
    delta DESC at equal t counts touching intervals as overlapping
    (inclusive convention)."""
    from guardian_for_apache_kafka_spark.operators.layout import global_running_sum

    swept = global_running_sum(
        pts, [F.col("t").asc(), F.col("delta").desc()], "delta",
        out="live", n_parts=n_parts,
    ).select(
        F.date_trunc("day", "t").cast("date").alias("day"),
        "t",
        "live",
    )
    daily = swept.groupBy("day").agg(F.max("live").alias("peak"))
    return (
        daily.join(
            swept,
            (swept.day == daily.day) & (swept.live == daily.peak),
        )
        .groupBy(daily.day, "peak")
        .agg(F.min("t").alias("first_peak_at"))
        .select(
            daily.day.alias("day"),
            F.col("peak").cast("long").alias("peak"),
            "first_peak_at",
        )
        .orderBy("day")
    )


def cusum_changepoints(daily: DataFrame) -> DataFrame:
    """CUSUM changepoint per series over a (event_type, x, y) day table:
    the scaled statistic |n*C_t - t*S| (C_t running sum, S series total,
    n series length — all BIGINT-exact, so the argmax and its
    earlier-day tie-break are pure integer decisions) peaks at the most
    likely mean-shift point. Returns one row per series: (event_type,
    change_day, cusum_stat, mean_shift_mass). Shared verbatim by the q120
    batch query and the streaming twin's rollup — the stream==batch
    equivalence test rides on this single implementation. Every window is
    partitioned BY SERIES; nothing here ever sees corpus-sized input."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    walked = daily.select(
        "event_type",
        "x",
        F.sum("y").over(w).alias("c"),
        F.row_number().over(Window.partitionBy("event_type").orderBy("x")).alias("t"),
        F.sum("y").over(w_all).alias("s"),
        F.count("*").over(w_all).alias("n"),
    )
    stat = F.abs(F.col("n") * F.col("c") - F.col("t") * F.col("s"))
    scored = walked.select(
        "event_type",
        "x",
        "n",
        stat.alias("stat"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy(stat.desc(), "x"))
        .alias("rn"),
    )
    return (
        scored.where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("x").cast("int").alias("change_day"),
            F.col("stat").cast("long").alias("cusum_stat"),
            F.round(F.col("stat") * 1.0 / F.col("n"), 2).alias("mean_shift_mass"),
        )
        .orderBy("event_type")
    )


def turning_point_stats(daily: DataFrame) -> DataFrame:
    """q132's randomness screen from a (event_type, x, y) day table —
    shared verbatim by the batch query and the streaming rollup
    (streaming/pipeline.turning_points_rollup), the cusum/auc twin
    discipline. Strict local extrema via lag/lead; i.i.d. expectation
    2(n-2)/3; one division at the end."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("event_type").orderBy("x")
    lagged = daily.select(
        "event_type",
        "y",
        F.lag("y").over(w).alias("yp"),
        F.lead("y").over(w).alias("yn"),
    )
    is_tp = (
        F.col("yp").isNotNull()
        & F.col("yn").isNotNull()
        & (
            ((F.col("y") > F.col("yp")) & (F.col("y") > F.col("yn")))
            | ((F.col("y") < F.col("yp")) & (F.col("y") < F.col("yn")))
        )
    )
    g = lagged.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum(F.when(is_tp, 1).otherwise(0)).cast("long").alias("turning_points"),
    )
    exp = 2.0 * (F.col("n_days") - 2) / 3.0
    return g.select(
        "event_type",
        "n_days",
        "turning_points",
        F.round(exp, 4).alias("expected_tp"),
        F.round(F.col("turning_points") / exp, 4).alias("randomness_ratio"),
    ).orderBy("event_type")


def runs_test_stats(daily: DataFrame) -> DataFrame:
    """q133's Wald-Wolfowitz runs test from a (event_type, x, y) day
    table — shared by the batch query and the streaming rollup. Lower
    median via the integer domain-walk pick; runs counted as sign
    changes in day order; everything integer until expected_runs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w_rank = Window.partitionBy("event_type").orderBy("y")
    w_all = Window.partitionBy("event_type")
    med = (
        daily.select(
            "event_type",
            "y",
            F.row_number().over(w_rank).alias("rn"),
            F.count("*").over(w_all).alias("n"),
        )
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("y").alias("med"))
    )
    w_ord = Window.partitionBy("event_type").orderBy("x")
    above = F.when(F.col("y") > F.col("med"), 1).otherwise(0)
    flagged = daily.join(med, "event_type").select(
        "event_type",
        above.alias("above"),
        F.lag(above).over(w_ord).alias("prev"),
    )
    g = flagged.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("above").cast("long").alias("n_above"),
        (F.count("*") - F.sum("above")).cast("long").alias("n_below"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev").isNotNull() & (F.col("above") != F.col("prev")), 1
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("runs"),
    )
    return g.select(
        "event_type",
        "n_days",
        "n_above",
        "n_below",
        "runs",
        F.round(
            1 + 2.0 * F.col("n_above") * F.col("n_below") / F.col("n_days"), 4
        ).alias("expected_runs"),
    ).orderBy("event_type")


def znorm_subsequence_topk(
    daily: DataFrame, window: int = 7, k: int = 3
) -> DataFrame:
    """Z-normalized subsequence similarity search over per-key daily count
    series (the distributed MASS/Matrix-Profile-lite shape of EDBT'19
    streaming time-series search): for each key, score every
    ``window``-day subsequence against the LATEST window ("find past weeks
    that looked like this week") by z-normalized squared Euclidean
    distance, excluding overlaps, and keep the top ``k``.

    Input: (t, d, y) — key, dense 0-based day index, integer count.
    Determinism: window sums and sum-of-squares are exact INTEGER folds;
    mean/std/distance use the identical expression tree on both engines,
    and the per-pair distance folds element-wise in index order
    (zip_with), so even the float distances are bit-identical. Constant
    (sd == 0) windows are excluded — z-normalization is undefined there.

    Scale shape: one corpus rollup to the (key, day) grid, one
    collect_list per key (series length = the retention horizon, not the
    corpus), window expansion is per-row array arithmetic, and candidate
    scoring joins the broadcast-sized query-window table. Output:
    (t, window_start, dist, rnk)."""
    series = daily.groupBy("t").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "y"))), lambda s: s["y"]
        ).alias("__ys")
    # a key with fewer than `window` points has no subsequences at all —
    # filter BEFORE the sequence expansion (sequence(0, n_win-1) would
    # sign-infer a descending [0, -1] for n_win <= 0 and then slice() at
    # start 0 is a runtime error; the ngram_shingles guard, same hazard).
    # Matches the oracle's range(len - window + 1) = empty semantics.
    ).where(F.size("__ys") >= window)
    n_win = F.size("__ys") - window + 1
    wins = series.select(
        "t",
        "__ys",
        F.explode(F.sequence(F.lit(0), n_win - 1)).alias("s"),
        (n_win - 1).alias("__qs"),
    ).select(
        "t",
        "s",
        "__qs",
        F.slice("__ys", F.col("s") + 1, window).alias("__w"),
    )
    sm = F.aggregate("__w", F.lit(0).cast("long"), lambda a, x: a + x)
    ss = F.aggregate("__w", F.lit(0).cast("long"), lambda a, x: a + x * x)
    stats = wins.select(
        "t",
        "s",
        "__qs",
        "__w",
        (sm / float(window)).alias("__m"),
        F.sqrt(ss / float(window) - (sm / float(window)) * (sm / float(window))).alias(
            "__sd"
        ),
    ).where(F.col("__sd") > 0)
    qwin = stats.where(F.col("s") == F.col("__qs")).select(
        "t",
        F.col("__w").alias("__qw"),
        F.col("__m").alias("__qm"),
        F.col("__sd").alias("__qsd"),
    )
    cands = stats.where(F.col("s") <= F.col("__qs") - window).join(
        F.broadcast(qwin), "t"
    )
    za = lambda a: (a - F.col("__m")) / F.col("__sd")
    zq = lambda b: (b - F.col("__qm")) / F.col("__qsd")
    dist = F.aggregate(
        F.zip_with("__w", "__qw", lambda a, b: (za(a) - zq(b)) * (za(a) - zq(b))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = cands.select("t", F.col("s").alias("window_start"), dist.alias("__dist"))
    w = Window.partitionBy("t").orderBy("__dist", "window_start")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("t", "window_start", F.round("__dist", 4).alias("dist"), "rnk")
        .orderBy("t", "rnk")
    )
