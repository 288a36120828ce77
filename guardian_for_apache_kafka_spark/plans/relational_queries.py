"""Q1-Q22: the general relational surface (SURVEY.md §2.3).

Design rules (scale posture — SURVEY.md §4.2):
- Built-in functions only; every plan stays inside whole-stage codegen.
- Dimension joins are explicitly ``broadcast()`` (region/nation/customer-sized);
  fact-fact joins shuffle on their keys and rely on AQE for skew.
- The range join (Q7) is expressed as a bucketed equi-join + residual filter —
  the 100 TB-safe shape — not a nested-loop theta join.
- Dialect notes: DuckDB sum(INT)->HUGEINT, ceil/floor->DOUBLE, year()->BIGINT,
  rank()->BIGINT are cast to match Spark's types; NULL ordering is pinned
  explicitly (Spark asc = NULLS FIRST, DuckDB asc = NULLS LAST by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from guardian_for_apache_kafka_spark.plans.registry import query
from guardian_for_apache_kafka_spark.sources.tables import load_table


@query(
    "q01_scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    ORDER BY l_orderkey, l_linenumber
    LIMIT 100
    """,
    tags=("relational", "scan", "filter", "projection"),
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + pushed-down filter + arithmetic projection; the filter and the
    2-column-ish read should reach the parquet scan (PushedFilters/ReadSchema)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "q02_hash_aggregate_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                       AS sum_qty,
           round(sum(l_extendedprice), 2)                                  AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2)                                       AS avg_qty,
           round(avg(l_extendedprice), 2)                                  AS avg_price,
           round(avg(l_discount), 2)                                       AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("relational", "agg"),
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shape hash aggregate: partial (map-side) agg + final agg after a
    6-group shuffle — the canonical two-phase plan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q03_multiway_join",
    oracle="""
    SELECT n.n_name, round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    tags=("relational", "join", "agg"),
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way equi-join (TPC-H Q5 shape). customer/nation/region are dimensions:
    broadcast all three so the only full pass is the orders scan — zero shuffles
    before the 5-group aggregate."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q04_broadcast_join",
    oracle="""
    SELECT p.p_brand,
           count(*) AS cnt,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type = 'PROMO'
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
    tags=("relational", "join", "agg"),
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim with an explicit broadcast hint: part is small after the p_type
    filter; lineitem never shuffles for the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("p_brand")
    )


@query(
    "q05_left_outer_join",
    oracle="""
    SELECT c.c_mktsegment,
           count(o.o_orderkey) AS order_cnt,
           count(*) AS row_cnt
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    tags=("relational", "join", "outer"),
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders; count(col) vs
    count(*) distinguishes null-extended rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(F.count("o_orderkey").alias("order_cnt"), F.count("*").alias("row_cnt"))
        .orderBy("c_mktsegment")
    )


@query(
    "q06_semi_anti_join",
    oracle="""
    SELECT
      (SELECT count(*) FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)) AS with_orders,
      (SELECT count(*) FROM customer WHERE c_custkey NOT IN
         (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')) AS without_f_orders
    """,
    tags=("relational", "join", "semi", "anti"),
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (customers with orders) and anti join (customers with no 'F'
    orders) — the decorrelated forms of IN / NOT IN."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count("*").alias("with_orders")
    )
    anti = c.join(
        o.where(F.col("o_orderstatus") == "F"), c.c_custkey == o.o_custkey, "left_anti"
    ).agg(F.count("*").alias("without_f_orders"))
    return semi.crossJoin(anti)


@query(
    "q07_range_join",
    oracle="""
    SELECT count(*) AS pair_cnt
    FROM events e1
    JOIN events e2
      ON e2.event_type = 'purchase'
     AND e1.event_id <> e2.event_id
     AND e1.ts >= e2.ts
     AND e1.ts <= e2.ts + INTERVAL 1 MINUTE
    """,
    tags=("relational", "join", "range"),
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/theta join done scale-safe: bucket both sides to the minute and
    equi-join on the bucket (each probe-side row lands in 2 candidate buckets),
    then apply the exact range as a residual filter. O(n) shuffle instead of the
    nested-loop a naive theta join plans; the DuckDB oracle states the same
    semantics as a plain theta join."""
    ev = load_table(spark, sf_dir, "events")
    bucket_us = 60 * 1_000_000
    e1 = ev.select(
        F.col("event_id").alias("id1"),
        F.col("ts").alias("ts1"),
        (F.unix_micros("ts") / bucket_us).cast("long").alias("bucket"),
    )
    e2 = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("id2"),
            F.col("ts").alias("ts2"),
            (F.unix_micros("ts") / bucket_us).cast("long").alias("b2"),
        )
        .withColumn("bucket", F.explode(F.array(F.col("b2"), F.col("b2") + 1)))
    )
    pairs = e1.join(e2, "bucket").where(
        (F.col("id1") != F.col("id2"))
        & (F.col("ts1") >= F.col("ts2"))
        & (F.col("ts1") <= F.col("ts2") + F.expr("INTERVAL 1 MINUTE"))
    )
    return pairs.agg(F.count("*").alias("pair_cnt"))


@query(
    "q08_rollup_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT)  AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT)  AS g_status,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status,
             l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("relational", "agg", "rollup"),
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() markers; NULL ordering pinned explicitly (Spark
    and DuckDB default opposite NULL sort positions)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("cnt"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "cnt")
        .orderBy(
            "g_flag",
            "g_status",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "q09_distinct_count",
    oracle="""
    SELECT count(DISTINCT l_partkey) AS distinct_parts,
           count(DISTINCT l_suppkey) AS distinct_supps,
           count(*) AS total_rows
    FROM lineitem
    """,
    tags=("relational", "distinct"),
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct aggregation (expand + two-phase agg in Spark).
    The approximate path (approx_count_distinct / HLL) is engine-side only —
    see pipeline_queries and tests."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.count("*").alias("total_rows"),
    )


@query(
    "q10_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice, 2) AS price,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    QUALIFY row_number() OVER w <= 2
    ORDER BY o_custkey, rn, o_orderkey
    """,
    tags=("relational", "window_fn"),
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions, top-2 orders per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .where(F.col("rn") <= 2)
        .orderBy("o_custkey", "rn", "o_orderkey")
    )


@query(
    "q11_window_frame_analytic",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS roll_sum,
           round(lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS prev_val,
           round(lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS next_val
    FROM events
    WHERE event_type = 'click'
    ORDER BY user_id, event_id
    """,
    tags=("relational", "window_fn", "frame"),
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window with an explicit ROWS frame + lag/lead, on a filtered
    events subset; ordering key (ts, event_id) is unique so frames are
    deterministic."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "click")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(-2, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(wf), 2).alias("roll_sum"),
        F.round(F.lag("value").over(w), 2).alias("prev_val"),
        F.round(F.lead("value").over(w), 2).alias("next_val"),
    ).orderBy("user_id", "event_id")


@query(
    "q12_topk",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("relational", "sort", "limit"),
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject (per-partition
    heap + driver merge), never a full sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.round("o_totalprice", 2).alias("price"), "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .drop("o_totalprice")
    )


@query(
    "q13_set_ops",
    oracle="""
    SELECT 'except' AS op, count(*) AS cnt FROM (
        SELECT c_nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect', count(*) FROM (
        SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'union', count(*) FROM (
        SELECT c_nationkey FROM customer UNION SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'union_all', count(*) FROM (
        SELECT c_nationkey FROM customer UNION ALL SELECT s_nationkey FROM supplier)
    ORDER BY op
    """,
    tags=("relational", "setop"),
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / UNION ALL / INTERSECT / EXCEPT over nation-key projections."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))

    def one(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("cnt")).select(F.lit(op).alias("op"), "cnt")

    return (
        one("except", c.subtract(s))
        .unionAll(one("intersect", c.intersect(s)))
        .unionAll(one("union", c.union(s).distinct()))
        .unionAll(one("union_all", c.union(s)))
        .orderBy("op")
    )


@query(
    "q14_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(substr(p_name, 1, 5))                 AS up5,
           lower(p_brand)                              AS lbrand,
           CAST(length(p_name) AS INT)                 AS name_len,
           replace(p_name, ' ', '_')                   AS snake,
           lpad(p_brand, 12, '*')                      AS padded,
           split_part(p_name, ' ', 1)                  AS first_word,
           regexp_extract(p_name, '([a-z]+)$', 1)      AS last_word,
           concat(trim(p_type), ':', p_brand)          AS tagged,
           (p_name LIKE '%widget%')                    AS is_widget
    FROM part
    ORDER BY p_partkey
    LIMIT 100
    """,
    tags=("relational", "scalar", "string"),
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string function battery."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper(F.substring("p_name", 1, 5)).alias("up5"),
            F.lower("p_brand").alias("lbrand"),
            F.length("p_name").alias("name_len"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
            F.lpad("p_brand", 12, "*").alias("padded"),
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
            F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
            F.concat(F.trim(F.col("p_type")), F.lit(":"), F.col("p_brand")).alias("tagged"),
            F.col("p_name").like("%widget%").alias("is_widget"),
        )
        .orderBy("p_partkey")
        .limit(100)
    )


@query(
    "q15_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)   AS yr,
           CAST(month(o_orderdate) AS INT)  AS mo,
           CAST(day(o_orderdate) AS INT)    AS dy,
           CAST(o_orderdate AS DATE) + 30   AS plus30,
           date_diff('day', DATE '2000-01-01', CAST(o_orderdate AS DATE)) AS diff_days,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           epoch_ms(o_orderdate)            AS epoch_msec
    FROM orders
    ORDER BY o_orderkey
    LIMIT 100
    """,
    tags=("relational", "scalar", "date"),
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar date/time battery: extract, arithmetic, trunc, epoch conversion."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.dayofmonth("o_orderdate").alias("dy"),
            F.date_add(d, 30).alias("plus30"),
            F.datediff(d, F.lit("2000-01-01").cast("date")).cast("long").alias("diff_days"),
            F.trunc(d, "month").alias("month_start"),
            # parquet ms timestamps surface as TIMESTAMP_NTZ; session TZ is
            # pinned UTC so the cast to instant is exact
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("epoch_msec"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


@query(
    "q16_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 2)        AS r_abs,
           CAST(ceil(l_extendedprice)  AS BIGINT)  AS r_ceil,
           CAST(floor(l_extendedprice) AS BIGINT)  AS r_floor,
           round(l_extendedprice / 7, 2)           AS r_div7,
           l_linenumber % 3                        AS r_mod,
           round(power(l_quantity, 2), 2)          AS r_pow,
           round(sqrt(l_extendedprice), 2)         AS r_sqrt,
           round(ln(l_extendedprice), 2)           AS r_ln,
           round(greatest(l_quantity, l_discount * 100), 2) AS r_greatest,
           round(least(l_quantity, l_tax * 100), 2)         AS r_least
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    LIMIT 100
    """,
    tags=("relational", "scalar", "math"),
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar math battery (DuckDB ceil/floor return DOUBLE — cast to match
    Spark's BIGINT)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(F.col("l_discount") - 0.05), 2).alias("r_abs"),
            F.ceil("l_extendedprice").alias("r_ceil"),
            F.floor("l_extendedprice").alias("r_floor"),
            F.round(F.col("l_extendedprice") / 7, 2).alias("r_div7"),
            (F.col("l_linenumber") % 3).alias("r_mod"),
            F.round(F.pow("l_quantity", F.lit(2)), 2).alias("r_pow"),
            F.round(F.sqrt("l_extendedprice"), 2).alias("r_sqrt"),
            F.round(F.log("l_extendedprice"), 2).alias("r_ln"),
            F.round(F.greatest(F.col("l_quantity"), F.col("l_discount") * 100), 2).alias(
                "r_greatest"
            ),
            F.round(F.least(F.col("l_quantity"), F.col("l_tax") * 100), 2).alias("r_least"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "q17_json_extraction",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, count(*) AS cnt
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("relational", "json"),
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props payload column
    (Spark get_json_object ≡ DuckDB json_extract_string)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.get_json_object("props", "$.k").cast("int").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("cnt"))
        .orderBy("k")
    )


@query(
    "q18_array_functions",
    oracle="""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 50
    """,
    tags=("relational", "array", "explode"),
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode word counts (the array/table-function surface)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(50)
    )


@query(
    "q19_conditional_null",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid'
                ELSE 'high' END AS band,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg,
           count(*) AS cnt,
           round(avg(c_acctbal), 2) AS avg_bal
    FROM customer
    GROUP BY 1, 2
    ORDER BY band, seg
    """,
    tags=("relational", "scalar", "conditional"),
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / coalesce / nullif over account-balance bands."""
    c = load_table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    seg = F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER"))
    return (
        c.select(band.alias("band"), seg.alias("seg"), "c_acctbal")
        .groupBy("band", "seg")
        .agg(F.count("*").alias("cnt"), F.round(F.avg("c_acctbal"), 2).alias("avg_bal"))
        .orderBy("band", "seg")
    )


@query(
    "q20_correlated_subquery",
    oracle="""
    SELECT c.c_nationkey, count(*) AS cnt
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
    tags=("relational", "subquery"),
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, written in its decorrelated form (per-key
    aggregate + equi-join) — exactly what Catalyst's
    RewriteCorrelatedScalarSubquery produces."""
    c = load_table(spark, sf_dir, "customer")
    nation_avg = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.avg("c_acctbal").alias("nation_avg")
    )
    return (
        c.join(F.broadcast(nation_avg), c.c_nationkey == nation_avg.nk)
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("cnt"))
        .orderBy("c_nationkey")
    )


@query(
    "q21_cte_multiblock",
    oracle="""
    WITH hourly AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS slice, count(*) AS cnt
        FROM events GROUP BY 1
    ),
    stats AS (SELECT avg(cnt) AS avg_cnt FROM hourly)
    SELECT h.slice, h.cnt
    FROM hourly h, stats s
    WHERE h.cnt > s.avg_cnt
    ORDER BY h.slice
    """,
    tags=("relational", "cte"),
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE chain (slice stats joined back against their own average) via the
    SQL entry point — exercises spark.sql parsing/analysis over temp views."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS slice, count(*) AS cnt
            FROM events GROUP BY 1
        ),
        stats AS (SELECT avg(cnt) AS avg_cnt FROM hourly)
        SELECT h.slice, h.cnt
        FROM hourly h CROSS JOIN stats s
        WHERE h.cnt > s.avg_cnt
        ORDER BY h.slice
        """
    )


@query(
    "q22_documents_tokens",
    oracle="""
    SELECT lang, token, cnt, rn FROM (
        SELECT lang, token, cnt,
               CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS BIGINT) AS rn
        FROM (
            SELECT lang, token, count(*) AS cnt
            FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
            GROUP BY 1, 2
        )
    )
    WHERE rn <= 20
    ORDER BY lang, rn
    """,
    tags=("relational", "text", "window_fn"),
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens per language over documents (tokenize → agg → ranked
    window), the text-analysis shape of SURVEY §2.3 Q22."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "token")
    return (
        counts.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 20)
        .orderBy("lang", "rn")
    )


@query(
    "q23_statistical_aggregates",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 2) + 0            AS med_qty,
           round(quantile_cont(l_extendedprice, 0.25), 2) + 0     AS p25_price,
           round(quantile_cont(l_extendedprice, 0.75), 2) + 0     AS p75_price,
           round(stddev_samp(l_quantity), 2) + 0                  AS sd_qty,
           round(var_samp(l_discount), 4) + 0                     AS var_disc,
           round(corr(l_quantity, l_extendedprice), 4) + 0        AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) + 0  AS cov_qty_price,
           round(skewness(l_quantity), 4) + 0                     AS skew_qty,
           round(kurtosis(l_quantity), 4) + 0                     AS kurt_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("relational", "agg", "statistics"),
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: exact interpolated percentiles
    (Spark ``percentile`` == DuckDB ``quantile_cont``), sample
    stddev/variance, correlation/covariance, skewness/kurtosis — all
    single-pass algebraic/sketchable aggregates that partial-aggregate
    map-side at scale. ``+ 0`` canonicalizes IEEE -0.0 to 0.0 on both
    engines (skew/corr of near-symmetric data can round to either)."""
    li = load_table(spark, sf_dir, "lineitem")
    z = F.lit(0.0)
    return (
        li.groupBy("l_returnflag")
        .agg(
            (F.round(F.expr("percentile(l_quantity, 0.5D)"), 2) + z).alias("med_qty"),
            (F.round(F.expr("percentile(l_extendedprice, 0.25D)"), 2) + z).alias("p25_price"),
            (F.round(F.expr("percentile(l_extendedprice, 0.75D)"), 2) + z).alias("p75_price"),
            (F.round(F.stddev_samp("l_quantity"), 2) + z).alias("sd_qty"),
            (F.round(F.var_samp("l_discount"), 4) + z).alias("var_disc"),
            (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + z).alias("corr_qty_price"),
            (F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2) + z).alias("cov_qty_price"),
            (F.round(F.skewness("l_quantity"), 4) + z).alias("skew_qty"),
            (F.round(F.kurtosis("l_quantity"), 4) + z).alias("kurt_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q24_approx_aggregates",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           true AS ndv_within_5pct, true AS median_within_2pct
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("relational", "agg", "approx", "statistical-oracle"),
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregate surface for the 100 TB path: HyperLogLog++
    distinct counts and t-digest percentiles — constant memory per group
    where the exact forms (q09/q23) buffer per-key state.

    Bounded-assertion oracle: sketches have no cross-engine twin, so the
    query computes approx AND exact side by side and emits the error-bound
    verdicts (HLL++ rsd=0.02 vs a 5% NDV band; approx_percentile accuracy
    10000 vs a 2% median band). The oracle states the bounds hold — a broken
    sketch flips a boolean and fails the hash match. Group row counts stay
    exact so the rows remain anchored to the data.

    Plan note (r11): count_distinct must NOT share an aggregate with the
    buffer-backed sketches — Spark's distinct-agg rewrite then keys the
    FIRST phase by (flag, partkey), building and merging an exact-
    percentile value buffer per partkey group (~200 k buffer merges;
    measured 8.8 s at sf0.1). The exact NDV is its own two-phase dedupe
    (codegen hash aggregates, no object buffers) joined back on the
    3-row group spine: same values, 8.8 -> ~1.3 s, and at 100 TB the
    sketch pass streams instead of materializing per-key lists."""
    li = load_table(spark, sf_dir, "lineitem")
    sketched = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("__acd"),
        F.expr("approx_percentile(l_extendedprice, 0.5D, 10000)").alias("__amed"),
        F.expr("percentile(l_extendedprice, 0.5D)").alias("__med"),
        F.count("*").alias("n"),
    )
    ndv = (
        li.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("__ndv"))
    )
    return (
        sketched.join(F.broadcast(ndv), "l_returnflag")
        .select(
            "l_returnflag",
            "n",
            (F.abs(F.col("__acd") - F.col("__ndv")) / F.col("__ndv") <= 0.05).alias(
                "ndv_within_5pct"
            ),
            (F.abs(F.col("__amed") - F.col("__med")) / F.col("__med") <= 0.02).alias(
                "median_within_2pct"
            ),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q26_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    WHERE user_id < 100
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("relational", "pivot", "agg"),
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: long->wide event-type counts per user. Spark's
    groupBy().pivot(values=[...]) with explicit values skips the extra
    distinct-values job and keeps the plan a single two-phase aggregate;
    the oracle states the same thing as portable FILTER aggregation."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.where(F.col("user_id") < 100)
        .groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
        .orderBy("user_id")
    )
    return out


@query(
    "q27_sessionization",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WHERE user_id < 50
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    tags=("relational", "window_fn", "sessionization"),
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap) as a batch query:
    lag() flags session starts, a running sum numbers sessions, then a
    per-session aggregate. This is the batch-equivalence oracle for the
    streaming ``session_window`` pipeline (streaming/pipeline.py) — same
    session boundaries, deterministic tie-break on (ts, event_id). At scale
    the two windows share one hash-partition-by-user_id exchange, and the
    final aggregate reuses it (no second shuffle)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "q28_string_agg",
    oracle="""
    SELECT n_name,
           array_to_string(list_sort(array_agg(DISTINCT c_mktsegment)), ',') AS segments,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("relational", "agg", "collect"),
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List/string aggregation: collect the distinct market segments per
    nation into a sorted comma-joined string (Spark collect_set ->
    sort_array -> array_join == DuckDB array_agg DISTINCT -> list_sort ->
    array_to_string). collect_set keeps per-group state bounded by segment
    cardinality (5 here), so it partial-aggregates map-side; nation is a
    25-row dim and must broadcast, never shuffle customer."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias("segments"),
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("n_name")
    )


@query(
    "q29_unpivot",
    oracle="""
    WITH wide AS (
        SELECT n_name,
               CAST(count(*) AS DOUBLE) AS n_customers,
               round(sum(c_acctbal), 2) AS total_acctbal,
               floor(round(sum(c_acctbal), 2) / count(*) * 100) / 100 AS avg_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    )
    SELECT n_name, measure, val FROM (
        SELECT n_name, 'avg_acctbal' AS measure, avg_acctbal AS val FROM wide
        UNION ALL
        SELECT n_name, 'n_customers', n_customers FROM wide
        UNION ALL
        SELECT n_name, 'total_acctbal', total_acctbal FROM wide
    )
    ORDER BY n_name, measure
    """,
    tags=("relational", "unpivot", "agg"),
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide->long), the inverse of q26's pivot: three per-nation
    measures melt into (n_name, measure, val) rows via ``stack``. stack is a
    generator expression evaluated row-by-row in the same stage as the
    aggregate output — no shuffle, no UNION-ALL triple-scan of the input
    (which is what the portable oracle SQL has to do). The derived average
    uses floor(x*100)/100 instead of round(): Spark rounds the shortest
    decimal repr (HALF_UP) while DuckDB rounds the binary value, so exact
    .xx5 quotients diverge under round() but floor() agrees bit-for-bit."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    wide = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("double").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            (
                F.floor(F.round(F.sum("c_acctbal"), 2) / F.count("*") * 100) / 100
            ).alias("avg_acctbal"),
        )
    )
    return wide.select(
        "n_name",
        F.expr(
            "stack(3, 'avg_acctbal', avg_acctbal, 'n_customers', n_customers,"
            " 'total_acctbal', total_acctbal) AS (measure, val)"
        ),
    ).orderBy("n_name", "measure")


@query(
    "q30_window_distribution",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_mktsegment, c_custkey
    """,
    tags=("relational", "window", "distribution"),
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window distribution functions (ntile / percent_rank / cume_dist) —
    the ranking family q10 doesn't cover. The ORDER BY key is made total
    (acctbal DESC, custkey) so every row is its own peer group and both
    engines compute identical doubles: pct_rank = (rank-1)/(n-1), cume =
    rank/n. One hash exchange on c_mktsegment feeds a single in-partition
    sort that all three functions share."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy("c_mktsegment", "c_custkey")
    )


@query(
    "q31_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25_qty,
           quantile_cont(l_quantity, 0.50) AS med_qty,
           quantile_cont(l_quantity, 0.75) AS p75_qty,
           floor(quantile_cont(l_extendedprice, 0.50) * 100) / 100 AS med_price,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("relational", "agg", "percentile"),
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (ordered-set aggregate): Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` both use the standard
    lower + (upper-lower)*frac rule at rank p*(n-1). l_quantity is
    integer-valued so quartiles are exact multiples of 0.25 (binary-exact
    on both sides); the price median is truncated with floor(x*100)/100
    instead of round() to dodge HALF_UP-vs-binary .xx5 divergence. At scale
    this is a full sort per group — q24's t-digest is the 100 TB path; this
    query is the exactness anchor it's tested against."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.25D)").alias("p25_qty"),
            F.expr("percentile(l_quantity, 0.50D)").alias("med_qty"),
            F.expr("percentile(l_quantity, 0.75D)").alias("p75_qty"),
            (F.floor(F.expr("percentile(l_extendedprice, 0.50D)") * 100) / 100).alias("med_price"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q32_exists_subquery",
    oracle="""
    SELECT n_name,
           count(*) FILTER (WHERE EXISTS (
               SELECT 1 FROM lineitem
               WHERE l_suppkey = s_suppkey AND l_quantity >= 48)) AS with_heavy,
           count(*) FILTER (WHERE NOT EXISTS (
               SELECT 1 FROM lineitem
               WHERE l_suppkey = s_suppkey AND l_quantity >= 48)) AS without_heavy
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("relational", "subquery", "exists"),
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS with an extra predicate, expressed in
    the decorrelated form Catalyst itself would produce: distinct heavy
    suppliers (partial-aggregated map-side before the shuffle) LEFT-joined
    back, flag = match presence. supplier-per-nation counts make the result
    small; nation broadcasts. Unlike q06 (uncorrelated IN/NOT IN on keys),
    the subquery here carries its own filter and feeds both branches from
    one scan."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    heavy = li.where(F.col("l_quantity") >= 48).select("l_suppkey").distinct()
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(heavy, supp.s_suppkey == heavy.l_suppkey, "left")
        .groupBy("n_name")
        .agg(
            F.count(F.when(F.col("l_suppkey").isNotNull(), 1)).alias("with_heavy"),
            F.count(F.when(F.col("l_suppkey").isNull(), 1)).alias("without_heavy"),
        )
        .orderBy("n_name")
    )


@query(
    "q33_value_window_frames",
    oracle="""
    SELECT user_id, n_events, first_et, last_et, second_et
    FROM (
        SELECT user_id,
               CAST(count(*) OVER w AS BIGINT) AS n_events,
               first_value(event_type) OVER w AS first_et,
               last_value(event_type) OVER w AS last_et,
               nth_value(event_type, 2) OVER w AS second_et,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
    tags=("relational", "window", "frame"),
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions over an explicit unbounded frame: first / last
    / nth event_type per user in event-time order (nth_value(_, 2) is NULL
    for single-event users — renders as \\N on both sides). The row_number
    filter collapses to one row per user; both windows share the same
    (user_id | ts, event_id) sort so Spark evaluates them in a single
    Window operator after one exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.count("*").over(w).alias("n_events"),
            F.first("event_type").over(w).alias("first_et"),
            F.last("event_type").over(w).alias("last_et"),
            F.nth_value("event_type", 2).over(w).alias("second_et"),
            F.row_number().over(wo).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id")
    )


@query(
    "q34_posexplode_ordinality",
    oracle="""
    WITH tk AS (SELECT p_partkey, string_split(p_name, ' ') AS t FROM part),
    pw AS (SELECT p_partkey, unnest(range(len(t))) AS pos, unnest(t) AS word FROM tk)
    SELECT pos, word, count(*) AS cnt
    FROM pw
    GROUP BY pos, word
    HAVING count(*) >= 3
    ORDER BY pos, word
    """,
    tags=("relational", "generator", "array"),
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional generator (explode WITH ORDINALITY): posexplode emits
    (pos, word) per token so downstream logic can reason about token
    position — q18's explode drops ordinality. The oracle zips DuckDB's
    positional multi-unnest of range(len) with the token list. Generate
    runs in the scan stage (no shuffle before the aggregate's exchange)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(F.posexplode(F.split("p_name", " ")).alias("pos", "word"))
        .groupBy("pos", "word")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= 3)
        .orderBy("pos", "word")
    )


@query(
    "q35_bitwise_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey & 255 AS BIGINT) AS band,
           CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS xorv,
           CAST(l_orderkey << 2 AS BIGINT) AS shl,
           CAST(l_orderkey >> 1 AS BIGINT) AS shr,
           CAST(l_orderkey | 4096 AS BIGINT) AS orv
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    LIMIT 50
    """,
    tags=("relational", "scalar", "bitwise"),
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar functions (& ^ | << >>) — the partitioner/bucketing
    primitive family (hash banding, bit-packed flags). All JVM-codegen'd
    expressions; DuckDB's xor() is Spark's ^ operator."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.expr("l_orderkey & 255").alias("band"),
            F.expr("l_orderkey ^ l_partkey").alias("xorv"),
            F.expr("shiftleft(l_orderkey, 2)").alias("shl"),
            F.expr("shiftright(l_orderkey, 1)").alias("shr"),
            F.expr("l_orderkey | 4096").alias("orv"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(50)
    )


@query(
    "q36_scalar_subquery_select",
    oracle="""
    SELECT c_custkey,
           coalesce((SELECT max(o_totalprice) FROM orders
                     WHERE o_custkey = c_custkey), 0.0) AS max_spend,
           (SELECT CAST(count(*) AS BIGINT) FROM orders
            WHERE o_custkey = c_custkey) AS n_orders
    FROM customer ORDER BY c_custkey LIMIT 100
    """,
    tags=("relational", "subquery", "scalar"),
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in the SELECT list (q20 covers the
    WHERE-clause form): per-customer max spend and order count. Catalyst
    decorrelates both into ONE left-outer aggregate join (two subqueries on
    the same correlation key merge); customers with no orders exercise the
    NULL-fill path (coalesce vs count()=0). max/count are exact, so no
    rounding is needed on either engine."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey,
               coalesce((SELECT max(o_totalprice) FROM orders
                         WHERE o_custkey = c_custkey), 0.0D) AS max_spend,
               (SELECT count(*) FROM orders
                WHERE o_custkey = c_custkey) AS n_orders
        FROM customer ORDER BY c_custkey LIMIT 100
        """
    )


@query(
    "q37_lateral_topk_per_group",
    oracle="""
    SELECT c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    ORDER BY c_custkey, t.o_totalprice DESC, t.o_orderkey
    """,
    tags=("relational", "lateral", "topk"),
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: top-2 orders per customer as a lateral
    per-row table (the join-shaped dual of q10's window-rank top-2).
    Customers without orders drop (inner lateral). Both engines plan the
    decorrelated form — partition-limit per key, never a per-customer
    rescan of orders."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c, LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        ORDER BY c_custkey, t.o_totalprice DESC, t.o_orderkey
        """
    )


@query(
    "q38_gap_fill_resample",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events WHERE event_type IN ('click','purchase') GROUP BY 1, 2
    ),
    bounds AS (SELECT min(date_trunc('hour', ts)) AS lo,
                      max(date_trunc('hour', ts)) AS hi FROM events),
    grid AS (
        SELECT t.event_type, g.hr
        FROM (SELECT DISTINCT event_type FROM hourly) t
        CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
                    FROM bounds) g
    ),
    joined AS (
        SELECT grid.event_type, grid.hr, hourly.cnt,
               last_value(hourly.cnt IGNORE NULLS) OVER (
                   PARTITION BY grid.event_type ORDER BY grid.hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        FROM grid LEFT JOIN hourly
          ON grid.event_type = hourly.event_type AND grid.hr = hourly.hr
    )
    SELECT event_type, hr, coalesce(cnt, 0) AS cnt, coalesce(filled, 0) AS filled
    FROM joined ORDER BY event_type, hr LIMIT 200
    """,
    tags=("relational", "timeseries", "gapfill"),
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: densify the hourly grid with sequence()+
    explode (no holes when an hour has no events) and forward-fill gaps with
    last(IGNORE NULLS) over an unbounded-preceding frame — the standard
    gap-fill idiom monitoring/feature pipelines need. The grid is
    (types x hours): tiny, so it broadcasts into the left join against the
    aggregated side; the window's one exchange partitions by event_type."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count("*").alias("cnt"))
    )
    bounds = ev.agg(
        F.min(F.date_trunc("hour", "ts")).alias("lo"),
        F.max(F.date_trunc("hour", "ts")).alias("hi"),
    )
    grid = (
        hourly.select("event_type").distinct()
        .crossJoin(
            bounds.select(
                F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hr")
            )
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.coalesce(F.last("cnt", ignorenulls=True).over(w), F.lit(0)).alias("filled"),
        )
        .orderBy("event_type", "hr")
        .limit(200)
    )


@query(
    "q39_salted_skew_join",
    oracle="""
    WITH dim(event_type, weight) AS (VALUES
        ('click', 1), ('view', 2), ('purchase', 10), ('signup', 5), ('logout', 3)),
    j AS (
        SELECT e.event_type,
               CAST(floor(e."value" * 100) AS BIGINT) * d.weight AS wc
        FROM events e JOIN dim d ON e.event_type = d.event_type
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(wc) AS BIGINT) AS weighted_cents
    FROM j GROUP BY event_type ORDER BY event_type
    """,
    tags=("relational", "join", "skew"),
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient equi-join (functions/skew.salted_join): events'
    event_type is a pathological 5-value hot key, so the salted join spreads
    each key across 16 reducers (deterministic row-hash salt, dim side
    replicated per salt) — the manual fallback when AQE's skew split can't
    apply (e.g. broadcast-ineligible dims, or pre-AQE engines). The oracle
    is the plain unsalted join: same rows, same aggregate. The measure is
    integer cents (floor(value*100) x integer weight) so the per-key sum is
    order-independent — a float sum lands on different last bits per engine.

    The dim here is 5 literal rows (80 after salt replication) so it
    carries an explicit broadcast hint: without it the stats-less
    createDataFrame side defeats auto-broadcast and Spark broadcasts the
    EVENTS side instead (BuildLeft over the fact table — backwards at any
    scale). ``salted_join`` itself stays strategy-neutral: its target case
    is the broadcast-INELIGIBLE dim, where the salted shuffle is the point."""
    from guardian_for_apache_kafka_spark.functions.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 10), ("signup", 5), ("logout", 3)],
        "event_type string, weight long",
    )
    j = salted_join(ev, F.broadcast(dim), on="event_type", buckets=16)
    return (
        j.select(
            "event_type",
            (F.floor(F.col("value") * 100).cast("long") * F.col("weight")).alias("wc"),
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("wc").alias("weighted_cents"))
        .orderBy("event_type")
    )


@query(
    "q40_hopping_window",
    oracle="""
    WITH e AS (
        SELECT event_type, epoch_us(ts) AS us, "value" FROM events
    ),
    hopped AS (
        SELECT event_type, "value",
               unnest(range(us // 300000000 - 1, us // 300000000 + 1)) AS widx
        FROM e
    )
    SELECT CAST(to_timestamp(widx * 300) AS TIMESTAMP) AS w_start,
           event_type,
           count(*) AS cnt,
           round(sum("value"), 2) AS sum_value
    FROM hopped
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("relational", "window", "hopping"),
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregate: 10-minute windows every 5 minutes,
    per event type — each event lands in width/slide = 2 overlapping windows.
    Spark's ``window(ts, width, slide)`` generates the window copies inline
    before the aggregate (no self-join); the oracle derives the same window
    starts arithmetically (start = slide-aligned grid in (ts - width, ts])."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "10 minutes", "5 minutes")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "cnt", "sum_value")
        .orderBy("w_start", "event_type")
    )


@query(
    "q41_session_window_native",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, "value",
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WHERE user_id < 50
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, "value",
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           CAST(min(ts) AS TIMESTAMP) AS s_start,
           CAST(to_timestamp(epoch_us(max(ts)) / 1000000.0 + 1800) AS TIMESTAMP) AS s_end,
           count(*) AS cnt,
           round(sum("value"), 2) AS sum_value
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, s_start
    """,
    tags=("relational", "session_window", "native"),
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window (30-minute gap) as a batch aggregate —
    the built-in operator q27's manual islands-and-gaps formulation emulates.
    Session end = last event + gap (Spark's semantics; the oracle recomputes
    it from max(ts))."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy(sw.alias("w"), "user_id")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "cnt",
            "sum_value",
        )
        .orderBy("user_id", "s_start")
    )


@query(
    "q42_activity_correlation",
    oracle="""
    WITH ids AS (SELECT DISTINCT user_id FROM events WHERE user_id < 40),
    grid AS (SELECT user_id, CAST(r.range AS INT) AS b FROM ids CROSS JOIN range(24) r),
    counts AS (
        SELECT user_id, CAST(hour(ts) AS INT) AS b, count(*) AS c
        FROM events WHERE user_id < 40 GROUP BY 1, 2
    ),
    prof AS (
        SELECT g.user_id, g.b, COALESCE(c.c, 0) AS c
        FROM grid g LEFT JOIN counts c ON g.user_id = c.user_id AND g.b = c.b
    ),
    sums AS (
        SELECT a.user_id AS id_a, b2.user_id AS id_b,
               sum(a.c * b2.c) AS sxy, sum(a.c) AS sx, sum(b2.c) AS sy,
               sum(a.c * a.c) AS sxx, sum(b2.c * b2.c) AS syy
        FROM prof a JOIN prof b2 ON a.b = b2.b AND a.user_id < b2.user_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(CAST(24*sxy - sx*sy AS DOUBLE)
                 / sqrt(CAST(24*sxx - sx*sx AS DOUBLE) * CAST(24*syy - sy*sy AS DOUBLE)),
                 4) AS corr
    FROM sums
    WHERE (24*sxx - sx*sx) > 0 AND (24*syy - sy*sy) > 0
      AND CAST(24*sxy - sx*sy AS DOUBLE)
          / sqrt(CAST(24*sxx - sx*sx AS DOUBLE) * CAST(24*syy - sy*sy AS DOUBLE)) >= 0.2
    ORDER BY id_a, id_b
    """,
    tags=("relational", "timeseries", "correlation"),
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (EDBT'19 problem shape): user pairs
    whose hour-of-day activity profiles correlate at >= 0.2, over a bounded
    entity set. Pearson is computed from exact int64 sums (numerator and
    variance terms are integers); the only float ops are one multiply, one
    sqrt, one divide on identical integers — IEEE-deterministic on both
    engines, so the oracle hash-matches without a tolerance
    (operators/timeseries.py)."""
    from guardian_for_apache_kafka_spark.operators.timeseries import (
        activity_profile,
        correlated_pairs,
    )

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    prof = activity_profile(ev, "user_id", "ts", buckets=24)
    return (
        correlated_pairs(prof, min_corr=0.2, buckets=24)
        .select("id_a", "id_b", F.round("corr", 4).alias("corr"))
        .orderBy("id_a", "id_b")
    )


@query(
    "q43_temporal_validity_intervals",
    oracle="""
    SELECT user_id, event_id,
           CAST(ts AS TIMESTAMP) AS valid_from,
           CAST(lead(ts) OVER w AS TIMESTAMP) AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, valid_from, event_id
    """,
    tags=("relational", "temporal", "scd2"),
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal versioning (SCD-2 shape): each per-user event becomes a
    validity interval [valid_from, valid_to) closed by the next event, the
    open-ended latest row flagged current — the standard
    effective-dated-dimension construction, one window over one hash
    exchange. The pattern a key-latest compaction (g6) collapses is here
    preserved as queryable history instead."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.lead("ts").over(w).isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "event_id")
    )


@query(
    "q44_rolling_zscore_anomaly",
    oracle="""
    WITH x AS (
      SELECT event_type, event_id, ts, "value",
             CAST(round("value" * 100) AS BIGINT) AS xi
      FROM events
    ),
    wnd AS (
      SELECT event_type, event_id, ts, "value", xi,
             count(xi) OVER w AS n, sum(xi) OVER w AS sx,
             sum(xi * xi) OVER w AS sxx
      FROM x
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, event_id, ts, "value", round(z, 4) AS z
    FROM (
      SELECT *, CAST(n * xi - sx AS DOUBLE)
                * sqrt(CAST(n - 1 AS DOUBLE)
                       / CAST(n * (n * sxx - sx * sx) AS DOUBLE)) AS z
      FROM wnd WHERE n = 20 AND (n * sxx - sx * sx) > 0
    ) t
    WHERE abs(z) >= 3.0
    ORDER BY event_type, event_id
    """,
    tags=("relational", "timeseries", "anomaly", "window-frame"),
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection per event type: events deviating
    >= 3 sample stddevs from the mean of the 20 preceding events (current
    row excluded). Integer-sums discipline (q42): the window aggregates
    int64 cents, the z expression is a few IEEE-exact double ops on
    identical integers — the >= 3.0 decision is bit-identical across
    engines, so no tolerance contract is needed
    (operators/timeseries.rolling_zscore_anomalies)."""
    from guardian_for_apache_kafka_spark.operators.timeseries import (
        rolling_zscore_anomalies,
    )

    ev = load_table(spark, sf_dir, "events")
    out = rolling_zscore_anomalies(ev, lookback=20, z_threshold=3.0)
    return out.select(
        "event_type", "event_id", "ts", "value", F.round("z", 4).alias("z")
    ).orderBy("event_type", "event_id")


@query(
    "q45_funnel_steps",
    oracle="""
    WITH e AS (SELECT user_id, ts, event_type, event_id FROM events),
    w1 AS (
      SELECT *, CASE WHEN event_type = 'view' THEN ts END AS q0 FROM e
    ),
    w2 AS (
      SELECT *, CASE WHEN event_type = 'click'
                      AND min(q0) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NOT NULL
                     THEN ts END AS q1
      FROM w1
    ),
    w3 AS (
      SELECT *, CASE WHEN event_type = 'purchase'
                      AND min(q1) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NOT NULL
                     THEN ts END AS q2
      FROM w2
    ),
    agg AS (
      SELECT user_id, min(q0) AS step1_ts, min(q1) AS step2_ts, min(q2) AS step3_ts
      FROM w3 GROUP BY 1
    )
    SELECT user_id,
           CAST(CASE WHEN step3_ts IS NOT NULL THEN 3
                     WHEN step2_ts IS NOT NULL THEN 2
                     ELSE 1 END AS INT) AS steps_completed,
           step1_ts, step2_ts, step3_ts
    FROM agg
    WHERE step1_ts IS NOT NULL
    ORDER BY user_id
    """,
    tags=("relational", "funnel", "sessionization", "window-frame"),
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase ordered funnel per user: earliest QUALIFIED
    step timestamps (each step needs a strictly-earlier qualified previous
    step; ties broken by event_id) and the furthest step reached. Stacked
    same-spec window passes share one exchange; pure timestamp/int
    comparisons so the oracle hash-matches without tolerance
    (operators/timeseries.funnel_steps)."""
    from guardian_for_apache_kafka_spark.operators.timeseries import funnel_steps

    ev = load_table(spark, sf_dir, "events")
    return funnel_steps(ev, ["view", "click", "purchase"]).orderBy("user_id")


@query(
    "q46_bucketed_colocated_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("relational", "join", "bucketing"),
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The zero-shuffle fact-to-fact join path: orders and lineitem are
    first materialized as co-bucketed catalog tables (8 buckets on the
    orderkey, bucket-sorted, one file per bucket — the ONE write-time
    shuffle the layout ever pays), then joined as a SortMergeJoin with NO
    Exchange on either side (plan-shape-tested; only the memory-local
    within-partition Sort remains, see operators/bucketing.py). At 100 TB this is the standard
    warehouse layout for repeatedly-joined fact tables: the per-query
    shuffle of both full tables disappears entirely
    (operators/bucketing.py)."""
    from guardian_for_apache_kafka_spark.operators.bucketing import (
        bucketed_pair,
        colocated_join,
        source_fingerprint,
    )

    import os

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # layout reuse keyed on source mtime/size too (the q49 staleness rule):
    # a regenerated testdata dir gets a fresh layout, never stale buckets
    fp = source_fingerprint(
        [os.path.join(sf_dir, "orders.parquet"), os.path.join(sf_dir, "lineitem.parquet")]
    )
    ob, lb = bucketed_pair(
        spark, o, li, "o_orderkey", "l_orderkey", sf_dir,
        ("g_bkt_orders", "g_bkt_lineitem"), fingerprint=fp,
    )
    j = colocated_join(ob, lb, "o_orderkey", "l_orderkey")
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q48_sketch_rollup",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           true AS distinct_within_5pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("relational", "approx", "sketch", "statistical-oracle"),
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE sketches — the pre-aggregation pattern q24's one-shot
    HLL++ can't express: per-(event_type, day) DataSketches HLL sketches
    (what a 100 TB pipeline materializes incrementally, one partition per
    ingest day) are UNIONED into per-type totals without touching raw data
    again. Distinct counts don't add across days (users repeat); sketch
    union handles the overlap in constant memory. Bounded-assertion oracle
    (q24 pattern): the query computes the rolled-up estimate AND the exact
    distinct side by side and emits the 5% verdict; day counts stay exact
    so rows anchor to the data."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select("event_type", F.to_date("ts").alias("day"), "user_id")
        .groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("__sk"))
    )
    rolled = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("__est"),
        F.count("*").alias("n_days"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("__ndv")
    )
    return (
        rolled.join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            (F.abs(F.col("__est") - F.col("__ndv")) / F.col("__ndv") <= 0.05).alias(
                "distinct_within_5pct"
            ),
        )
        .orderBy("event_type")
    )


def _partitioned_events_copy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The day-partitioned events layout q49/q63 scan: written once per
    source state (cached layout keyed on path + mtime + size and gated on
    the _SUCCESS marker — a regenerated events table gets a fresh digest,
    and a crashed partial write is rewritten rather than silently served;
    ADVICE r5)."""
    import hashlib
    import os
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    src = os.path.join(sf_dir, "events.parquet")
    try:
        st = os.stat(src)
        fingerprint = f"{sf_dir}|{st.st_mtime_ns}|{st.st_size}"
    except OSError:
        fingerprint = sf_dir
    digest = hashlib.md5(fingerprint.encode()).hexdigest()[:12]
    dest = os.path.join(tempfile.gettempdir(), f"guardian_part_events_{digest}")
    if not os.path.isfile(os.path.join(dest, "_SUCCESS")):
        ev.withColumn("day", F.to_date("ts")).write.mode("overwrite").partitionBy(
            "day"
        ).parquet(dest)
    return spark.read.parquet(dest)


@query(
    "q49_partition_pruned_scan",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n,
           round(sum("value"), 2) AS total_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-09'
    GROUP BY 1 ORDER BY 1
    """,
    tags=("relational", "layout", "partition-pruning"),
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition pruning — the other half of the 100 TB scan story next to
    q01's predicate pushdown: events are laid out hive-partitioned by day
    (the write a real pipeline does once at ingest; idempotent fixed
    destination per sf_dir), and the date-band query must read ONLY the five
    matching day=... directories — PartitionFilters in the scan node, file
    listing pruned catalog-side, zero data files from other days opened
    (plan-shape-tested). The oracle recomputes from the unpartitioned
    table."""
    back = _partitioned_events_copy(spark, sf_dir)
    return (
        back.where(F.col("day").between("2024-01-05", "2024-01-09"))
        .groupBy("day")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("day")
    )


@query(
    "q50_table_profile",
    oracle="""
    SELECT 'l_discount' AS col_name, CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) - count(l_discount) AS BIGINT) AS n_null,
           CAST(count(DISTINCT l_discount) AS BIGINT) AS n_distinct,
           round(min(l_discount), 2) AS min_v, round(max(l_discount), 2) AS max_v,
           round(avg(l_discount), 2) AS avg_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
           count(DISTINCT l_extendedprice),
           round(min(l_extendedprice), 2), round(max(l_extendedprice), 2),
           round(avg(l_extendedprice), 2)
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
           count(DISTINCT l_quantity),
           round(min(l_quantity), 2), round(max(l_quantity), 2),
           round(avg(l_quantity), 2)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', count(*), count(*) - count(l_tax), count(DISTINCT l_tax),
           round(min(l_tax), 2), round(max(l_tax), 2), round(avg(l_tax), 2)
    FROM lineitem
    ORDER BY col_name
    """,
    tags=("relational", "profiling", "data-quality"),
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profiling — the ingest data-quality primitive
    (row count, null count, exact distinct, min/max/mean per column) for
    every profiled column in ONE aggregate over ONE scan, then a stack()
    melt to rows. The naive per-column loop re-scans the table once per
    column — at 100 TB that is the difference between one pass and N. The
    oracle recomputes each column's stats independently (4 scans — DuckDB's
    cost, not ours) and UNION ALLs them."""
    from guardian_for_apache_kafka_spark.operators.profiling import profile_table

    li = load_table(spark, sf_dir, "lineitem")
    return profile_table(li, ["l_discount", "l_extendedprice", "l_quantity", "l_tax"])


@query(
    "q51_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(date_trunc('week', CAST(ts AS DATE))) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS DATE)) AS active_week
      FROM events
    )
    SELECT CAST(f.cohort_week AS DATE) AS cohort_week,
           CAST(datediff('week', f.cohort_week, a.active_week) AS BIGINT) AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM activity a JOIN firsts f USING (user_id)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("relational", "cohort", "retention"),
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-cohort analysis — the classic product-analytics rollup:
    users bucketed by first-activity week, then distinct-active counts per
    (cohort, week-offset). Two aggregates over one scan lineage: the
    first-activity frame is user-count-sized and BROADCASTS onto the
    distinct (user, week) activity set, so the big side shuffles only for
    its own distinct — no fact-to-fact exchange. week_offset arithmetic is
    integer week-diff, bit-identical across engines."""
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.to_date("ts")).cast("date")
    activity = ev.select("user_id", week.alias("active_week")).distinct()
    firsts = activity.groupBy("user_id").agg(F.min("active_week").alias("cohort_week"))
    return (
        activity.join(F.broadcast(firsts), "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "q52_cdc_merge",
    oracle="""
    WITH o AS (SELECT o_orderkey AS k, o_custkey AS c, o_totalprice AS p,
                      o_orderpriority AS pr FROM orders),
    merged AS (
      SELECT k, c,
             CASE WHEN k % 7 = 0 AND k % 11 <> 3 THEN p + 1000 ELSE p END AS p,
             pr
      FROM o WHERE k % 3 <> 0 AND k % 11 <> 3
      UNION ALL
      SELECT k, c, p, pr FROM o WHERE k % 3 = 0
    )
    SELECT pr AS o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           round(sum(p), 2) AS total_price
    FROM merged GROUP BY pr ORDER BY pr
    """,
    tags=("relational", "merge", "cdc"),
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO / CDC-upsert without a table format: a deterministic CDC
    batch (price updates on keys %7, deletes on keys %11=3, inserts of the
    %3=0 key space) applied to the orders snapshot via ONE full-outer join
    + row-wise resolution (operators/merge.merge_into — Delta-style
    matched-update / unmatched-insert / flagged-delete semantics on plain
    parquet). The oracle reconstructs the merged snapshot set-wise. At
    100 TB the apply is a key-equi join: broadcast when the CDC batch is
    small, zero-exchange when snapshot and batch share the q46 bucket
    layout."""
    from guardian_for_apache_kafka_spark.operators.merge import merge_into

    k = F.col("o_orderkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    base = o.where(k % 3 != 0)
    upd = o.where((k % 3 != 0) & (k % 7 == 0) & (k % 11 != 3)).select(
        k,
        F.col("o_custkey"),
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
        F.col("o_orderpriority"),
        F.lit(False).alias("deleted"),
    )
    dels = o.where((k % 3 != 0) & (k % 11 == 3)).select(
        k, "o_custkey", "o_totalprice", "o_orderpriority", F.lit(True).alias("deleted")
    )
    ins = o.where(k % 3 == 0).select(
        k, "o_custkey", "o_totalprice", "o_orderpriority", F.lit(False).alias("deleted")
    )
    updates = upd.unionByName(dels).unionByName(ins)
    merged = merge_into(
        base, updates, "o_orderkey",
        ["o_custkey", "o_totalprice", "o_orderpriority"], "deleted",
    )
    return (
        merged.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q55_incremental_agg_maintenance",
    oracle="""
    WITH o AS (SELECT o_orderkey AS k,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                      o_orderpriority AS pr FROM orders),
    merged AS (
      SELECT k,
             CASE WHEN k % 7 = 0 AND k % 11 <> 3 THEN cents + 100000 ELSE cents END AS cents,
             pr
      FROM o WHERE k % 3 <> 0 AND k % 11 <> 3
      UNION ALL
      SELECT k, cents, pr FROM o WHERE k % 3 = 0
    )
    SELECT pr AS o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           round(sum(cents) / 100.0, 2) AS total_price
    FROM merged GROUP BY pr ORDER BY pr
    """,
    tags=("relational", "ivm", "cdc"),
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the per-priority (count, sum) rollup
    is updated from the q52 CDC batch as old_agg (+) delta_agg — the delta
    aggregates ONLY the change rows (Debezium-style before/after images;
    update = delete+insert, so group-changing updates work), and the
    combine is a full-outer join between the group-count-sized view and the
    batch-sized delta. The snapshot is NEVER re-aggregated — the oracle
    recomputes from scratch, so the hash match proves the delta rule. Sums
    are integer cents end to end: old + delta is bit-identical to the
    recomputation, no float summation-order drift
    (operators/ivm.cdc_agg_delta / apply_agg_delta)."""
    from guardian_for_apache_kafka_spark.operators.ivm import (
        apply_agg_delta,
        cdc_agg_delta,
    )

    k = F.col("o_orderkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderpriority").alias("pr"),
    )
    base = o.where(k % 3 != 0)
    old_agg = base.groupBy("pr").agg(
        F.count("*").cast("long").alias("n"), F.sum("cents").alias("s")
    )
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    upd = base.where((k % 7 == 0) & (k % 11 != 3)).select(
        F.col("pr").alias("before_g"),
        F.col("cents").alias("before_v"),
        F.col("pr").alias("after_g"),
        (F.col("cents") + 100000).alias("after_v"),
    )
    dels = base.where(k % 11 == 3).select(
        F.col("pr").alias("before_g"),
        F.col("cents").alias("before_v"),
        null_s.alias("after_g"),
        null_l.alias("after_v"),
    )
    ins = o.where(k % 3 == 0).select(
        null_s.alias("before_g"),
        null_l.alias("before_v"),
        F.col("pr").alias("after_g"),
        F.col("cents").alias("after_v"),
    )
    cdc = upd.unionByName(dels).unionByName(ins)
    new_agg = apply_agg_delta(old_agg, cdc_agg_delta(cdc, "pr"), "pr", "n", "s")
    return new_agg.select(
        F.col("pr").alias("o_orderpriority"),
        F.col("n"),
        F.round(F.col("s") / 100.0, 2).alias("total_price"),
    ).orderBy("o_orderpriority")


@query(
    "q57_snapshot_time_travel",
    oracle="""
    WITH o AS (SELECT o_orderkey AS k,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                      o_orderpriority AS pr FROM orders),
    log AS (
      SELECT k, cents, pr, 0 AS v, false AS del FROM o WHERE k % 3 <> 0
      UNION ALL
      SELECT k, cents + 100000, pr, 1, false FROM o
      WHERE k % 3 <> 0 AND k % 7 = 0 AND k % 11 <> 3
      UNION ALL
      SELECT k, cents, pr, 2, true FROM o WHERE k % 3 <> 0 AND k % 11 = 3
    ),
    latest AS (
      SELECT k, cents, pr, del,
             row_number() OVER (PARTITION BY k ORDER BY v DESC) AS rn
      FROM log WHERE v <= 2
    )
    SELECT k AS o_orderkey, pr AS o_orderpriority,
           round(cents / 100.0, 2) AS price
    FROM latest WHERE rn = 1 AND NOT del
    ORDER BY o_orderkey
    """,
    tags=("relational", "cdc", "time-travel"),
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time reconstruction over a CDC log (time travel without a
    table format): the q52 change stream is versioned (updates v=1, deletes
    v=2, inserts v=3) and the snapshot is reconstructed AS OF v=2 — updates
    and deletes applied, inserts not yet visible. One latest-per-key window
    over one key exchange (the g6 discipline), version predicate pruning
    the log before the shuffle; integer cents keep prices engine-exact
    (operators/merge.snapshot_asof). Complements q52 (latest merge) and the
    streaming versioned snapshots (coarse per-batch points)."""
    from guardian_for_apache_kafka_spark.operators.merge import snapshot_asof

    k = F.col("o_orderkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderpriority").alias("pr"),
    )
    base = o.where(k % 3 != 0)
    upd = base.where((k % 7 == 0) & (k % 11 != 3)).select(
        k,
        (F.col("cents") + 100000).alias("cents"),
        F.col("pr"),
        F.lit(1).alias("v"),
        F.lit(False).alias("deleted"),
    )
    dels = base.where(k % 11 == 3).select(
        k, "cents", "pr", F.lit(2).alias("v"), F.lit(True).alias("deleted")
    )
    ins = o.where(k % 3 == 0).select(
        k, "cents", "pr", F.lit(3).alias("v"), F.lit(False).alias("deleted")
    )
    log = upd.unionByName(dels).unionByName(ins)
    snap = snapshot_asof(base, log, "o_orderkey", "v", 2)
    return snap.select(
        "o_orderkey",
        F.col("pr").alias("o_orderpriority"),
        F.round(F.col("cents") / 100.0, 2).alias("price"),
    ).orderBy("o_orderkey")


@query(
    "q58_histogram_quantile_rollup",
    oracle="""
    WITH e AS (SELECT event_type, CAST(round("value" * 100) AS BIGINT) AS cents,
                      CAST(ts AS DATE) AS day FROM events),
    daily AS (
      SELECT event_type, day, CAST(floor(cents / 1000.0) AS BIGINT) AS bin,
             count(*) AS c
      FROM e GROUP BY 1, 2, 3
    ),
    rolled AS (SELECT event_type, bin, sum(c) AS c FROM daily GROUP BY 1, 2),
    cum AS (
      SELECT event_type, bin,
             sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS total
      FROM rolled
    ),
    est AS (
      SELECT event_type, CAST(max(total) AS BIGINT) AS n,
             CAST(min(CASE WHEN cum >= ceil(0.5 * total) THEN bin END) * 1000 AS BIGINT) AS p50_cents,
             CAST(min(CASE WHEN cum >= ceil(0.95 * total) THEN bin END) * 1000 AS BIGINT) AS p95_cents
      FROM cum GROUP BY 1
    ),
    ex AS (
      SELECT event_type,
             quantile_cont(round(cents), 0.5) AS e50,
             quantile_cont(round(cents), 0.95) AS e95
      FROM e GROUP BY 1
    )
    SELECT est.event_type, n,
           p50_cents, (e50 >= p50_cents AND e50 <= p50_cents + 1000) AS p50_within_bin,
           p95_cents, (e95 >= p95_cents AND e95 <= p95_cents + 1000) AS p95_within_bin
    FROM est JOIN ex USING (event_type)
    ORDER BY event_type
    """,
    tags=("relational", "sketch", "quantile", "statistical-oracle"),
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-histogram quantile rollup — q48's pre-aggregation pattern
    for QUANTILES: per-(type, day) sparse integer-cents histograms sum-merge
    into per-type totals without rescanning raw data; p50/p95 estimates are
    the first bin edge reaching ceil(q*n) cumulative count — error <= one
    bin width by construction, and the estimate is a deterministic integer
    function of the bins, so the WHOLE sketch path is hash-oracled (not
    just bound-asserted like t-digest). The within-bin verdicts against the
    exact interpolated percentile are computed in-query, q24-style
    (operators/profiling.histogram_quantile_rollup)."""
    from guardian_for_apache_kafka_spark.operators.profiling import (
        histogram_quantile_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    return histogram_quantile_rollup(ev).orderBy("event_type")


def _duck_h32(expr: str) -> str:
    """DuckDB twin of operators/hierarchy.md5_hash32 (8-hex md5 prefix)."""
    return f"CAST(CAST('0x' || substring(md5({expr}), 1, 8) AS UBIGINT) AS BIGINT)"


def _duck_pagerank_round(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT n.node,
             CAST(150000 + coalesce(sum((r.rank * 85) // (100 * d.deg)), 0) AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN e ON e.dst = n.node
      LEFT JOIN {prev} r ON e.src = r.node
      LEFT JOIN deg d ON e.src = d.src
      GROUP BY n.node
    )"""


@query(
    "q59_pagerank_fixed_point",
    oracle=f"""
    WITH c AS (SELECT c_custkey AS k FROM customer WHERE c_custkey >= 1),
    e AS (
      SELECT k AS src,
             k - 1 - ({_duck_h32("CAST(k AS VARCHAR)")} % k) AS dst FROM c
      UNION ALL
      SELECT k,
             k - 1 - ({_duck_h32("CAST(k AS VARCHAR) || '#2'")} % k) FROM c
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
    {_duck_pagerank_round("r0", "r1")},
    {_duck_pagerank_round("r1", "r2")},
    {_duck_pagerank_round("r2", "r3")}
    SELECT node, rank FROM r3 ORDER BY rank DESC, node LIMIT 25
    """,
    tags=("iterative", "graph", "pagerank"),
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer fixed-point PageRank, 3 synchronous rounds over a
    deterministic synthetic graph (two md5-jump out-edges per customer id —
    the q47 forest generator doubled). Per-edge shares are exact integer
    DIVs of micro-ranks and contribution sums are int64 — order-independent,
    so every round is bit-identical across engines and the oracle replays
    the rounds as unrolled SQL (float PageRank would drift with reduce
    order). One exchange per round + localCheckpoint; top-25 by final rank
    (operators/hierarchy.pagerank_fixed_point)."""
    from guardian_for_apache_kafka_spark.operators.hierarchy import (
        md5_hash32,
        pagerank_fixed_point,
        synthetic_parent,
    )

    k = F.col("k")
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") >= 1)
        .select(F.col("c_custkey").alias("k"))
    )
    e1 = c.select(k.alias("src"), synthetic_parent(k).alias("dst"))
    e2 = c.select(
        k.alias("src"),
        (k - 1 - md5_hash32(F.concat(k.cast("string"), F.lit("#2"))) % k).alias("dst"),
    )
    ranks = pagerank_fixed_point(e1.unionByName(e2), iterations=3)
    return ranks.orderBy(F.desc("rank"), "node").limit(25)


@query(
    "q60_rolling_distinct_sketch",
    oracle="""
    WITH d AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT DISTINCT event_type, day FROM d)
    SELECT dy.event_type, dy.day,
           CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_exact,
           true AS within_5pct
    FROM days dy JOIN d ON d.event_type = dy.event_type
                       AND d.day BETWEEN dy.day - 6 AND dy.day
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("relational", "sketch", "window", "statistical-oracle"),
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per event type from per-day HLL
    sketches unioned over a calendar RANGE frame — q48's mergeable-sketch
    pattern made SLIDING (each day's trailing window is a sketch merge,
    never an N-day rescan; a missing day shrinks the window instead of
    extending it to older rows). Bounded-assertion oracle, q24/q48
    pattern: the query computes the estimate AND the exact windowed
    distinct side by side and emits the 5% verdict; exact counts anchor
    the rows (operators/timeseries.rolling_distinct_sketch)."""
    from guardian_for_apache_kafka_spark.operators.timeseries import (
        rolling_distinct_sketch,
    )

    ev = load_table(spark, sf_dir, "events")
    return rolling_distinct_sketch(ev).orderBy("event_type", "day")


@query(
    "q61_scd2_history",
    oracle="""
    WITH o AS (SELECT o_orderkey AS k,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                      o_orderpriority AS pr FROM orders),
    log AS (
      SELECT k, cents, pr, 0 AS v, false AS del FROM o WHERE k % 3 <> 0
      UNION ALL
      SELECT k, cents + 100000, pr, 1, false FROM o
      WHERE k % 3 <> 0 AND k % 7 = 0 AND k % 11 <> 3
      UNION ALL
      SELECT k, cents, pr, 2, true FROM o WHERE k % 3 <> 0 AND k % 11 = 3
      UNION ALL
      SELECT k, cents, pr, 3, false FROM o WHERE k % 3 = 0
    ),
    hist AS (
      SELECT k, cents, pr, del, v AS valid_from,
             lead(v) OVER (PARTITION BY k ORDER BY v) AS valid_to
      FROM log
    )
    SELECT k AS o_orderkey, round(cents / 100.0, 2) AS price,
           pr AS o_orderpriority,
           CAST(valid_from AS BIGINT) AS valid_from,
           CAST(valid_to AS BIGINT) AS valid_to
    FROM hist WHERE NOT del
    ORDER BY o_orderkey, valid_from
    """,
    tags=("relational", "cdc", "scd2"),
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history from the q52/q57 CDC log: every non-deleted state
    of every order becomes a validity-interval row ([valid_from, valid_to)
    in version space, current = NULL valid_to; deletes close intervals
    without opening one). One lead() window over one key exchange — the
    CDC family's third leg (q52 latest merge, q57 point-in-time, q61 full
    history), integer-cents deterministic
    (operators/merge.scd2_from_log)."""
    from guardian_for_apache_kafka_spark.operators.merge import scd2_from_log

    k = F.col("o_orderkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderpriority").alias("pr"),
    )
    base = o.where(k % 3 != 0)
    upd = base.where((k % 7 == 0) & (k % 11 != 3)).select(
        k, (F.col("cents") + 100000).alias("cents"), "pr",
        F.lit(1).alias("v"), F.lit(False).alias("deleted"),
    )
    dels = base.where(k % 11 == 3).select(
        k, "cents", "pr", F.lit(2).alias("v"), F.lit(True).alias("deleted")
    )
    ins = o.where(k % 3 == 0).select(
        k, "cents", "pr", F.lit(3).alias("v"), F.lit(False).alias("deleted")
    )
    log = upd.unionByName(dels).unionByName(ins)
    hist = scd2_from_log(base, log, "o_orderkey", "v")
    return hist.select(
        "o_orderkey",
        F.round(F.col("cents") / 100.0, 2).alias("price"),
        F.col("pr").alias("o_orderpriority"),
        "valid_from",
        "valid_to",
    ).orderBy("o_orderkey", "valid_from")


@query(
    "q62_runtime_filtered_join",
    oracle="""
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """,
    tags=("relational", "join", "runtime-filter"),
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective dim-side filter on a fact-to-fact join — the shape where
    Spark's RUNTIME BLOOM FILTER earns its keep at 100 TB: the filtered
    orders side builds a bloom_filter_agg subquery at execution time and
    the planner injects ``might_contain(...)`` into the lineitem SCAN
    filter, so non-matching fact rows die at the scan instead of riding
    the shuffle (row-level runtime pruning; complements q49's
    partition-level and q01's predicate pushdown). At local test scale the
    small filtered side broadcasts instead and the filter is moot — the
    plan-shape test (test_q62_runtime_bloom_filter_injected) forces the
    at-scale conditions and asserts the injection; this entry attests the
    RESULT is identical either way."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q63_dynamic_partition_pruning",
    oracle="""
    WITH dim AS (
      SELECT day FROM (
        SELECT CAST(ts AS DATE) AS day, count(*) AS c FROM events GROUP BY 1
      ) WHERE c % 3 = 0
    )
    SELECT e.day, CAST(count(*) AS BIGINT) AS n,
           round(sum("value"), 2) AS total_value
    FROM (SELECT CAST(ts AS DATE) AS day, "value" FROM events) e
    JOIN dim USING (day)
    GROUP BY e.day ORDER BY e.day
    """,
    tags=("relational", "layout", "dynamic-partition-pruning"),
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning over the q49 day-partitioned layout: the
    dim side selects days by a predicate on an AGGREGATE (per-day count
    mod 3) — a value no static rule can transfer to the fact's partition
    column (a filter that is a pure function of the join key would be
    inferred through the equi-join and prune statically; measured — the
    md5-flag variant did exactly that). Only runtime DPP can prune here:
    the dim's surviving day set broadcasts into the fact scan's
    PartitionFilters as a dynamicpruningexpression (plan-asserted, with
    the static filters checked clean). The fourth rung of the pruning
    ladder: q01 static pushdown, q49 static partition pruning, q62
    row-level runtime bloom, q63 partition-level runtime pruning."""
    back = _partitioned_events_copy(spark, sf_dir)
    dim = (
        back.groupBy("day")
        .agg(F.count("*").alias("__c"))
        .where(F.col("__c") % 3 == 0)
        .select("day")
        .hint("broadcast")
    )
    return (
        back.join(dim, "day")
        .groupBy("day")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("day")
    )


@query(
    "q64_running_balance_with_resets",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, ts,
             CAST(round("value" * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_reset
      FROM events
    ),
    grp AS (
      SELECT user_id, event_id, ts, cents, is_reset,
             sum(is_reset) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS seg
      FROM ev
    )
    SELECT user_id, event_id,
           round(sum(CASE WHEN is_reset = 0 THEN cents ELSE 0 END)
                 OVER (PARTITION BY user_id, seg ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) / 100.0, 2) AS balance
    FROM grp
    ORDER BY user_id, event_id
    """,
    tags=("relational", "window", "running-reset"),
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running balance with CONDITIONAL RESETS — the accumulate-until-event
    idiom (credit balances cleared by payment, inventory zeroed by
    stocktake, session byte counters): a running count of reset markers
    derives a segment id, and the balance is a running sum WITHIN the
    segment — two stacked windows on ONE (user) exchange (the q27
    sessionization discipline: the segment window's (user, seg) partition
    is a refinement of the user partition, so no second shuffle). Integer
    cents keep every balance engine-exact."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_reset"),
    )
    w_user = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    seg = F.sum("is_reset").over(w_user)
    with_seg = ev.withColumn("seg", seg)
    w_seg = W.partitionBy("user_id", "seg").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    bal = F.sum(
        F.when(F.col("is_reset") == 0, F.col("cents")).otherwise(F.lit(0))
    ).over(w_seg)
    return (
        with_seg.select(
            "user_id", "event_id", F.round(bal / 100.0, 2).alias("balance")
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q65_triangle_counts",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 40
    ),
    pr AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS ea,
                      greatest(a.l_partkey, b.l_partkey) AS eb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT ea AS node FROM pr UNION ALL SELECT eb FROM pr
      ) GROUP BY 1
    ),
    o AS (
      SELECT CASE WHEN (da.d, pr.ea) < (db.d, pr.eb) THEN pr.ea ELSE pr.eb END AS lo,
             CASE WHEN (da.d, pr.ea) < (db.d, pr.eb) THEN pr.eb ELSE pr.ea END AS hi
      FROM pr JOIN deg da ON da.node = pr.ea JOIN deg db ON db.node = pr.eb
    ),
    c AS (SELECT least(lo, hi) AS p, greatest(lo, hi) AS q FROM o),
    tp AS (
      SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
      FROM o e1 JOIN o e2 ON e1.lo = e2.lo AND e1.hi < e2.hi
    ),
    tri AS (
      SELECT x, y, z FROM tp
      WHERE EXISTS (SELECT 1 FROM c
                    WHERE c.p = least(tp.y, tp.z) AND c.q = greatest(tp.y, tp.z))
    ),
    corners AS (
      SELECT x AS node FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY node
    ORDER BY n_triangles DESC, node LIMIT 20
    """,
    tags=("graph", "triangle", "join"),
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the high-quantity co-purchase graph
    (parts sharing an order with l_quantity >= 40), top-20 by count — the
    canonical non-iterative graph kernel beside CC (d7), depths (q47) and
    PageRank (q59). DEGREE ORIENTATION makes it 100 TB-safe: edges point
    from the (degree, id)-smaller endpoint, bounding every node's oriented
    out-degree by O(sqrt(m)), so the two-path join's fan-out is O(m^1.5)
    total with hub skew structurally removed (a celebrity node emits zero
    two-paths) — the unoriented join explodes as C(deg_hub, 2) on exactly
    the keys AQE can't split. The oracle replays orientation, two-paths,
    and the closing-edge EXISTS set-wise (operators/graph.triangle_counts)."""
    from guardian_for_apache_kafka_spark.operators.graph import triangle_counts

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 40)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "k")
        .where(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .distinct()
    )
    return (
        triangle_counts(edges)
        .orderBy(F.desc("n_triangles"), "node")
        .limit(20)
    )


@query(
    "q67_snapshot_diff",
    oracle="""
    WITH oldt AS (SELECT event_id, user_id, event_type, "value" FROM events),
    newt AS (
      SELECT event_id, user_id, event_type,
             CASE WHEN user_id % 10 = 0 THEN "value" + 1 ELSE "value" END AS value
      FROM events WHERE user_id % 17 != 0
      UNION ALL
      SELECT event_id + 100000000, user_id, event_type, "value"
      FROM events WHERE user_id % 23 = 0 AND user_id % 17 != 0
    ),
    d AS (
      SELECT coalesce(o.event_id, n.event_id) AS event_id,
             CASE WHEN o.event_id IS NULL THEN 'insert'
                  WHEN n.event_id IS NULL THEN 'delete'
                  WHEN o.user_id != n.user_id OR o.event_type != n.event_type
                       OR o."value" != n."value" THEN 'update'
             END AS change_type
      FROM oldt o FULL OUTER JOIN newt n USING (event_id)
    )
    SELECT change_type, CAST(count(*) AS BIGINT) AS n,
           min(event_id) AS min_key, max(event_id) AS max_key
    FROM d WHERE change_type IS NOT NULL
    GROUP BY change_type ORDER BY change_type
    """,
    tags=("relational", "reconciliation", "digest"),
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation by content digest: diff two versions of the
    events table (the second derived deterministically — user_id%17 rows
    deleted, %10 values bumped, %23 re-keyed copies inserted) and count
    inserts/updates/deletes with key ranges. The operator reduces each side
    MAP-SIDE to (key, md5-of-row) so the full-outer exchange carries a
    fixed 32-hex payload per row — two 100 TB snapshots reconcile by
    shuffling keys+digests only (zero exchange once both sides are
    key-bucketed). The oracle classifies by direct column comparison — a
    digest false-negative would surface as a missing update row
    (operators/merge.snapshot_diff)."""
    from guardian_for_apache_kafka_spark.operators.merge import snapshot_diff

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    new = (
        ev.where(F.col("user_id") % 17 != 0)
        .withColumn(
            "value",
            F.when(F.col("user_id") % 10 == 0, F.col("value") + 1).otherwise(
                F.col("value")
            ),
        )
        .unionByName(
            ev.where((F.col("user_id") % 23 == 0) & (F.col("user_id") % 17 != 0))
            .withColumn("event_id", F.col("event_id") + 100000000)
        )
    )
    return (
        snapshot_diff(ev, new, "event_id")
        .groupBy("change_type")
        .agg(
            F.count("*").alias("n"),
            F.min("event_id").alias("min_key"),
            F.max("event_id").alias("max_key"),
        )
        .orderBy("change_type")
    )


@query(
    "q66_skyline_pareto",
    oracle="""
    SELECT p_partkey, round(p_retailprice, 2) AS price, p_size
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    ORDER BY p_partkey
    """,
    tags=("relational", "skyline", "pareto"),
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier of parts — cheapest-for-the-size trade-off
    set (minimize p_retailprice, maximize p_size). The naive form is a
    NOT-EXISTS self-theta-join (cartesian, O(n²) — the oracle runs exactly
    that, affordable only at oracle scale); the operator is the TWO-PHASE
    prune: a map-only vectorized local frontier per Arrow batch (zero
    shuffle, expected O(log n) survivors each), then an exact one-task
    finish over the survivors — correct because domination is transitive,
    so local pruning is conservative and every true skyline row reaches
    the finish (operators/skyline.skyline)."""
    from guardian_for_apache_kafka_spark.operators.skyline import skyline

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    out = skyline(p, minimize=["p_retailprice"], maximize=["p_size"])
    return out.select(
        "p_partkey", F.round("p_retailprice", 2).alias("price"), "p_size"
    ).orderBy("p_partkey")


@query(
    "q68_interval_overlap_join",
    oracle="""
    WITH a AS (
      SELECT ts AS a_s,
             ts + to_minutes(1 + abs(CAST(round("value" * 100) AS BIGINT)) % 10) AS a_e
      FROM events WHERE event_type = 'purchase'
    ),
    b AS (
      SELECT ts AS b_s,
             ts + to_minutes(1 + abs(CAST(round("value" * 100) AS BIGINT)) % 10) AS b_e
      FROM events WHERE event_type = 'error'
    ),
    j AS (
      SELECT a_s, date_diff('second', greatest(a_s, b_s), least(a_e, b_e)) AS ov
      FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
    )
    SELECT CAST(a_s AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(ov) AS BIGINT) AS overlap_sec
    FROM j GROUP BY 1 ORDER BY 1
    """,
    tags=("relational", "interval-join", "grid"),
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-interval overlap join: purchase activity windows vs error
    windows (each event spans a value-derived 1-10 minute interval),
    counting overlapping pairs and total overlap seconds per day. The
    oracle runs the naive theta join (cartesian — oracle-scale only); the
    operator grid-buckets both sides into 10-minute epoch cells so the
    join is an EQUI-join on dense integer cells, with pair dedup FREE by
    the anchor-cell rule (a pair survives only in the cell containing
    greatest(start) — inside both intervals, so exactly once, no
    re-shuffling distinct). Exact int64 overlap seconds
    (operators/timeseries.interval_overlap_join)."""
    from guardian_for_apache_kafka_spark.operators.timeseries import (
        interval_overlap_join,
    )

    ev = load_table(spark, sf_dir, "events")
    dur = 1 + F.abs(F.round(F.col("value") * 100).cast("long")) % 10

    def side(event_type: str, p: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == event_type)
            .withColumn("__dur", dur)
            .select(
                F.col("ts").alias(f"{p}_s"),
                F.expr(f"timestampadd(MINUTE, __dur, ts)").alias(f"{p}_e"),
            )
        )

    j = interval_overlap_join(
        side("purchase", "a"), side("error", "b"), "a_s", "a_e", "b_s", "b_e"
    )
    return (
        j.groupBy(F.to_date("a_s").alias("day"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("overlap_seconds").alias("overlap_sec"),
        )
        .orderBy("day")
    )


def _duck_zbits(x: str, y: str, bits: int = 16) -> str:
    """DuckDB Morton interleave of two normalized BIGINT expressions —
    the same bit arithmetic as operators/layout.zorder_value."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "q69_zorder_locality",
    oracle=f"""
    WITH base AS (
      SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS pc,
             CAST(p_size AS BIGINT) AS sz
      FROM part
    ),
    mm AS (
      SELECT min(pc) AS lo_pc, max(pc) AS hi_pc,
             min(sz) AS lo_sz, max(sz) AS hi_sz
      FROM base
    ),
    norm AS (
      SELECT ((pc - lo_pc) * 65535) // (hi_pc - lo_pc) AS nx,
             ((sz - lo_sz) * 65535) // (hi_sz - lo_sz) AS ny
      FROM base, mm
    ),
    keyed AS (
      SELECT nx, ny, ({_duck_zbits('nx', 'ny')}) >> 28 AS zbucket,
             nx >> 12 AS lexbucket
      FROM norm
    ),
    z AS (
      SELECT 'zorder' AS method, CAST(zbucket AS INT) AS bucket,
             CAST(count(*) AS BIGINT) AS n,
             max(nx) - min(nx) AS x_span, max(ny) - min(ny) AS y_span
      FROM keyed GROUP BY zbucket
    ),
    lx AS (
      SELECT 'lexicographic' AS method, CAST(lexbucket AS INT) AS bucket,
             CAST(count(*) AS BIGINT) AS n,
             max(nx) - min(nx) AS x_span, max(ny) - min(ny) AS y_span
      FROM keyed GROUP BY lexbucket
    )
    SELECT * FROM z UNION ALL SELECT * FROM lx
    ORDER BY method, bucket
    """,
    tags=("relational", "layout", "zorder"),
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs lexicographic clustering quality over parts (price x
    size): normalize both dims to exact-integer [0, 65535], Morton-
    interleave, and measure each 16-way bucket's bounding box (the top 4
    z-bits = a 4x4 quadrant grid; the lexicographic comparator buckets by
    the top 4 x-bits). Z buckets bound BOTH spans (~quarter range each);
    lexicographic buckets have tiny x-spans and FULL y-spans — the reason
    multi-dim min/max file skipping needs z-order. Everything is map-only
    integer bit arithmetic + one small aggregate; bucket-by-value (not
    ntile) keeps it windowless and scale-safe
    (operators/layout.zorder_value)."""
    from guardian_for_apache_kafka_spark.operators.layout import zorder_value

    base = load_table(spark, sf_dir, "part").select(
        F.round(F.col("p_retailprice") * 100).cast("long").alias("pc"),
        F.col("p_size").cast("long").alias("sz"),
    )
    mm = base.agg(
        F.min("pc").alias("lo_pc"), F.max("pc").alias("hi_pc"),
        F.min("sz").alias("lo_sz"), F.max("sz").alias("hi_sz"),
    )
    norm = base.crossJoin(F.broadcast(mm)).select(
        F.expr("(pc - lo_pc) * 65535 DIV (hi_pc - lo_pc)").alias("nx"),
        F.expr("(sz - lo_sz) * 65535 DIV (hi_sz - lo_sz)").alias("ny"),
    )
    keyed = norm.select(
        "nx", "ny",
        F.shiftright(zorder_value(F.col("nx"), F.col("ny")), 28).alias("zbucket"),
        F.shiftright(F.col("nx"), 12).alias("lexbucket"),
    )

    def spans(bucket_col: str, method: str) -> DataFrame:
        return keyed.groupBy(F.col(bucket_col).cast("int").alias("bucket")).agg(
            F.count("*").alias("n"),
            (F.max("nx") - F.min("nx")).alias("x_span"),
            (F.max("ny") - F.min("ny")).alias("y_span"),
        ).select(F.lit(method).alias("method"), "bucket", "n", "x_span", "y_span")

    return (
        spans("zbucket", "zorder")
        .unionByName(spans("lexbucket", "lexicographic"))
        .orderBy("method", "bucket")
    )


@query(
    "q70_frequent_pairs",
    oracle="""
    WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
    fi AS (SELECT it FROM b GROUP BY it HAVING count(*) >= 25),
    pruned AS (SELECT bk, it FROM b JOIN fi USING (it)),
    sized AS (
      SELECT bk FROM pruned GROUP BY bk HAVING count(*) BETWEEN 2 AND 50
    ),
    pairs AS (
      SELECT a.it AS item_a, a2.it AS item_b
      FROM pruned a JOIN sized USING (bk)
      JOIN pruned a2 ON a.bk = a2.bk AND a.it < a2.it
    )
    SELECT item_a, item_b, CAST(count(*) AS BIGINT) AS support
    FROM pairs GROUP BY 1, 2 HAVING count(*) >= 2
    ORDER BY support DESC, item_a, item_b LIMIT 20
    """,
    tags=("itemsets", "apriori", "co-occurrence"),
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-priori frequent pair mining over order baskets (top-20 part pairs
    co-purchased in >= 2 orders, items individually in >= 25 orders). The
    two 100 TB guards are the textbook discipline, not approximations:
    frequent-singleton pruning semi-joins baskets against the broadcast
    frequent set BEFORE any pair exists, and a declared 50-item basket cap
    drops degenerate mega-baskets instead of letting one row emit C(n,2)
    pairs. Pair generation happens INSIDE the sorted item array (map-only)
    so the only shuffle carries (int, int) pairs. The oracle replays
    pruning, cap, and pair counting set-wise
    (operators/itemsets.frequent_pairs)."""
    from guardian_for_apache_kafka_spark.operators.itemsets import frequent_pairs

    li = load_table(spark, sf_dir, "lineitem")
    out = frequent_pairs(
        li, "l_orderkey", "l_partkey",
        min_item_support=25, min_pair_support=2, max_basket=50,
    )
    return out.orderBy(F.desc("support"), "item_a", "item_b").limit(20)


def _duck_lpa_round(prev: str, n: int) -> str:
    """One unrolled synchronous label-propagation round for the q71 oracle:
    neighbor-label counts, per-node argmax (count DESC, label ASC), keep
    own label when isolated."""
    return f"""
    c{n} AS (
      SELECT e.a AS node, l.label, count(*) AS c
      FROM e JOIN {prev} l ON e.b = l.node GROUP BY 1, 2
    ),
    b{n} AS (
      SELECT node, label FROM c{n}
      QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, label) = 1
    ),
    l{n} AS (
      SELECT n.node, coalesce(b{n}.label, n.node) AS label
      FROM n LEFT JOIN b{n} USING (node)
    )"""


@query(
    "q71_label_propagation",
    oracle=f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 40
    ),
    pr AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS ea,
                      greatest(a.l_partkey, b.l_partkey) AS eb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    e AS (SELECT ea AS a, eb AS b FROM pr UNION SELECT eb, ea FROM pr),
    n AS (SELECT DISTINCT a AS node FROM e),
    l0 AS (SELECT node, node AS label FROM n),
    {_duck_lpa_round('l0', 1)},
    {_duck_lpa_round('l1', 2)},
    {_duck_lpa_round('l2', 3)}
    SELECT label, CAST(count(*) AS BIGINT) AS n_nodes
    FROM l3 GROUP BY label ORDER BY n_nodes DESC, label LIMIT 20
    """,
    tags=("graph", "community", "label-propagation", "iterative"),
)
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the q65
    co-purchase graph, 3 rounds, top-20 communities by size. Deterministic
    LPA: the adopted label is the neighbor argmax by (count DESC, label
    ASC) — classic async LPA's random tie-breaks can't replay, this
    variant is bit-stable so the oracle unrolls all 3 rounds as SQL with
    the identical QUALIFY argmax. Two long-typed exchanges per round,
    label-per-node state, localCheckpointed (the q59 fixed-round
    discipline) (operators/graph.label_propagation)."""
    from guardian_for_apache_kafka_spark.operators.graph import label_propagation

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 40)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "k")
        .where(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .distinct()
    )
    return (
        label_propagation(edges, rounds=3)
        .groupBy("label")
        .agg(F.count("*").alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), "label")
        .limit(20)
    )


@query(
    "q72_interval_coalesce",
    oracle="""
    WITH iv AS (
      SELECT user_id, ts AS s,
             ts + to_minutes(1 + abs(CAST(round("value" * 100) AS BIGINT)) % 30) AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN max(e) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) IS NULL OR s > max(e) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) THEN 1 ELSE 0 END AS opens
      FROM iv
    ),
    islands AS (
      SELECT user_id,
             sum(opens) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island, s, e
      FROM flagged
    ),
    merged AS (
      SELECT user_id, min(s) AS island_start, max(e) AS island_end,
             count(*) AS n_intervals
      FROM islands GROUP BY user_id, island
    )
    SELECT CAST(island_start AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(date_diff('second', island_start, island_end)) AS BIGINT)
             AS covered_sec,
           CAST(max(n_intervals) AS BIGINT) AS max_merged
    FROM merged GROUP BY 1 ORDER BY 1
    """,
    tags=("relational", "intervals", "sessionization"),
)
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user interval coalescing: every event spans a value-derived
    1-30 minute window; overlapping windows merge into maximal activity
    islands (the interval-union/gap-split primitive under session
    coverage, SLA uptime, and time-weighted dedup). ONE user-keyed
    shuffle: the running-max-end window flags island opens, a running sum
    numbers them, and the island groupBy reuses the same partitioning
    (AQE exchange reuse). The oracle replays the identical window algebra
    in DuckDB (operators/timeseries.coalesce_intervals)."""
    from guardian_for_apache_kafka_spark.operators.timeseries import (
        coalesce_intervals,
    )

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        F.expr(
            "timestampadd(MINUTE, 1 + abs(cast(round(value * 100) as bigint)) % 30, ts)"
        ).alias("e"),
    )
    merged = coalesce_intervals(iv, "user_id", "s", "e")
    return (
        merged.groupBy(F.to_date("island_start").alias("day"))
        .agg(
            F.count("*").alias("n_islands"),
            F.sum(
                F.unix_timestamp("island_end") - F.unix_timestamp("island_start")
            ).alias("covered_sec"),
            F.max("n_intervals").alias("max_merged"),
        )
        .orderBy("day")
    )


@query(
    "q73_association_rules",
    oracle="""
    WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
    isup AS (SELECT it, count(*) AS s FROM b GROUP BY it HAVING count(*) >= 25),
    nb AS (SELECT count(DISTINCT bk) AS n FROM b),
    pruned AS (SELECT bk, it FROM b JOIN isup USING (it)),
    sized AS (SELECT bk FROM pruned GROUP BY bk HAVING count(*) BETWEEN 2 AND 50),
    pairs AS (
      SELECT a.it AS item_a, a2.it AS item_b, count(*) AS support
      FROM pruned a JOIN sized USING (bk)
      JOIN pruned a2 ON a.bk = a2.bk AND a.it < a2.it
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    directed AS (
      SELECT item_a AS antecedent, item_b AS consequent, support FROM pairs
      UNION ALL
      SELECT item_b, item_a, support FROM pairs
    )
    SELECT antecedent, consequent, CAST(support AS BIGINT) AS support,
           round(CAST(support AS DOUBLE) / sa.s, 2) AS confidence,
           round((CAST(support AS DOUBLE) / sa.s)
                 / (CAST(sb.s AS DOUBLE) / nb.n), 2) AS lift
    FROM directed
    JOIN isup sa ON sa.it = antecedent
    JOIN isup sb ON sb.it = consequent
    CROSS JOIN nb
    ORDER BY round((CAST(support AS DOUBLE) / sa.s)
                 / (CAST(sb.s AS DOUBLE) / nb.n), 2) DESC,
             antecedent, consequent
    LIMIT 20
    """,
    tags=("itemsets", "association-rules", "apriori"),
)
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules (confidence + lift) over the q70 basket
    graph, top-20 by lift. Everything after the single pair-count shuffle
    is map-side: direction fan-out is an in-row explode, both support
    denominators come from the BROADCAST frequent-item table, and the
    basket total joins as a broadcast scalar. Doubles divide in a fixed
    order (support/sa, then /(sb/n)) so the oracle replays them
    bit-identically (operators/itemsets.association_rules)."""
    from guardian_for_apache_kafka_spark.operators.itemsets import association_rules

    li = load_table(spark, sf_dir, "lineitem")
    rules = association_rules(
        li, "l_orderkey", "l_partkey",
        min_item_support=25, min_pair_support=2, max_basket=50,
    )
    return (
        rules.select(
            "antecedent", "consequent", "support",
            F.round("confidence", 2).alias("confidence"),
            F.round("lift", 2).alias("lift"),
        )
        .orderBy(F.desc(F.round("lift", 2)), "antecedent", "consequent")
        .limit(20)
    )


@query(
    "q74_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont("value", 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e."value", m.med,
             abs(e."value" - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN d.adev > 3 * t.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           round(max(d.med), 2) AS median_value,
           round(max(t.mad), 2) AS mad
    FROM dev d JOIN mad t USING (event_type)
    GROUP BY d.event_type ORDER BY d.event_type
    """,
    tags=("relational", "robust-stats", "outliers"),
)
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by median absolute deviation: per
    event_type, count rows whose |value - median| exceeds 3x the MAD —
    the estimator that survives the contamination that wrecks
    mean/stddev z-scores (q44's rolling z-score is the parametric twin).
    Two grouped exact-percentile aggregates (each output is
    event_type-sized, broadcast back onto the stream), so the corpus
    itself is scanned twice and never shuffled by value. Both engines
    use linear-interpolated exact medians."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
            F.round(F.max("med"), 2).alias("median_value"),
            F.round(F.max("mad"), 2).alias("mad"),
        )
        .orderBy("event_type")
    )


@query(
    "q75_last_touch_attribution",
    oracle="""
    WITH tl AS (
      SELECT user_id, ts, event_id, event_type, "value",
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS channel
      FROM events
    )
    SELECT coalesce(channel, 'direct') AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum("value"), 2) AS revenue
    FROM tl WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
    tags=("relational", "attribution", "window"),
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase's value is credited
    to the user's most recent PRECEDING non-purchase event type ('direct'
    when the purchase opens the timeline). One user-keyed window with an
    IGNORE NULLS last_value over the strictly-preceding frame — the
    filter-after-window keeps the purchase rows only, so the single
    exchange carries the raw timeline once and nothing self-joins
    (the classic alternative, an as-of self-join, pays two exchanges and
    a range probe). Deterministic via the (ts, event_id) order key."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.select("event_type", "value", channel.alias("channel"))
        .where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("direct")).alias("channel"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("revenue"),
        )
        .orderBy("channel")
    )


@query(
    "q76_time_to_convert",
    oracle="""
    WITH fv AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS first_view
      FROM events
    ),
    conv AS (
      SELECT user_id, min(first_view) AS first_view,
             min(ts) AS first_purchase
      FROM fv
      WHERE event_type = 'purchase' AND first_view IS NOT NULL
        AND ts >= first_view
      GROUP BY user_id
    )
    SELECT CAST(date_trunc('day', first_view) AS DATE) AS cohort_day,
           CAST(count(*) AS BIGINT) AS n_converted,
           CAST(round(quantile_cont(
             date_diff('second', first_view, first_purchase), 0.5)) AS BIGINT)
             AS median_ttc_sec,
           CAST(round(quantile_cont(
             date_diff('second', first_view, first_purchase), 0.9)) AS BIGINT)
             AS p90_ttc_sec
    FROM conv GROUP BY 1 ORDER BY 1
    """,
    tags=("relational", "funnel", "conversion"),
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert: per user, seconds from the FIRST view to the first
    purchase at-or-after it, summarized per first-view cohort day with
    exact interpolated median and p90. One user-keyed exchange serves both
    the first-view window and the per-user purchase min (same
    partitioning); the cohort rollup is week-sized. The >= guard makes
    'converted' mean view-then-purchase, not co-presence — q45's funnel
    counts steps, this measures the latency between them."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    fv = ev.select(
        "user_id", "ts", "event_type",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w).alias(
            "first_view"
        ),
    )
    conv = (
        fv.where(
            (F.col("event_type") == "purchase")
            & F.col("first_view").isNotNull()
            & (F.col("ts") >= F.col("first_view"))
        )
        .groupBy("user_id")
        .agg(
            F.min("first_view").alias("first_view"),
            F.min("ts").alias("first_purchase"),
        )
    )
    ttc = F.unix_timestamp("first_purchase") - F.unix_timestamp("first_view")
    return (
        conv.select(
            F.date_trunc("day", "first_view").cast("date").alias("cohort_day"),
            ttc.alias("ttc"),
        )
        .groupBy("cohort_day")
        .agg(
            F.count("*").alias("n_converted"),
            F.round(F.expr("percentile(ttc, 0.5)")).cast("long").alias(
                "median_ttc_sec"
            ),
            F.round(F.expr("percentile(ttc, 0.9)")).cast("long").alias(
                "p90_ttc_sec"
            ),
        )
        .orderBy("cohort_day")
    )


@query(
    "q77_week_over_week",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             count(*) AS n, sum("value") AS rev
      FROM events GROUP BY 1, 2
    )
    SELECT c.day, c.event_type,
           CAST(c.n AS BIGINT) AS n,
           CAST(p.n AS BIGINT) AS n_prev_week,
           round((CAST(c.n AS DOUBLE) - p.n) * 100.0 / p.n, 2) AS n_pct_change,
           round((c.rev - p.rev) * 100.0 / p.rev, 2) AS rev_pct_change
    FROM daily c JOIN daily p
      ON p.event_type = c.event_type AND p.day = c.day - 7
    ORDER BY c.day, c.event_type
    """,
    tags=("relational", "timeseries", "period-over-period"),
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week deltas: daily (event_type, count, revenue) compared
    against the same weekday one week earlier, as percent change. The
    corpus collapses to a day x type aggregate FIRST (one shuffle,
    ~150 rows), so the period self-join runs broadcast over aggregate-
    sized data — the date-arithmetic equi-join also survives gaps in the
    series, where a lag(7)-over-dense-days window would silently compare
    the wrong rows. Division order fixed for bit-identical doubles."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"), F.sum("value").alias("rev"))
    cur = daily
    prev = daily.select(
        F.col("event_type"),
        F.date_add("day", 7).alias("day"),
        F.col("n").alias("n_prev_week"),
        F.col("rev").alias("rev_prev"),
    )
    return (
        cur.join(F.broadcast(prev), ["event_type", "day"])
        .select(
            "day",
            "event_type",
            "n",
            "n_prev_week",
            F.round(
                (F.col("n").cast("double") - F.col("n_prev_week"))
                * 100.0
                / F.col("n_prev_week"),
                2,
            ).alias("n_pct_change"),
            F.round(
                (F.col("rev") - F.col("rev_prev")) * 100.0 / F.col("rev_prev"), 2
            ).alias("rev_pct_change"),
        )
        .orderBy("day", "event_type")
    )


@query(
    "q78_bounce_rate",
    oracle="""
    WITH t AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS opens
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             sum(opens) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM t
    ),
    sessions AS (
      SELECT user_id, sess, min(ts) AS session_start, count(*) AS n_events
      FROM s GROUP BY user_id, sess
    )
    SELECT CAST(session_start AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           round(sum(CASE WHEN n_events = 1 THEN 1.0 ELSE 0.0 END) * 100.0
                 / count(*), 2) AS bounce_pct
    FROM sessions GROUP BY 1 ORDER BY 1
    """,
    tags=("relational", "sessionization", "bounce"),
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate per day: 30-minute-gap sessions (q27's sessionization
    core) where a single-event session counts as a bounce. Both windows
    (gap flag + session number) and the session groupBy share ONE user
    exchange; the day rollup is calendar-sized. The deterministic order
    key (ts, event_id) pins lag() under timestamp ties."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    opens = F.when(
        F.lag("ts").over(w).isNull() | (gap > 1800), F.lit(1)
    ).otherwise(F.lit(0))
    wsum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = (
        ev.select("user_id", "ts", "event_id", opens.alias("opens"))
        .withColumn("sess", F.sum("opens").over(wsum))
        .groupBy("user_id", "sess")
        .agg(F.min("ts").alias("session_start"), F.count("*").alias("n_events"))
    )
    return (
        sessions.groupBy(F.to_date("session_start").alias("day"))
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias(
                "n_bounces"
            ),
            F.round(
                F.sum(F.when(F.col("n_events") == 1, 1.0).otherwise(0.0))
                * 100.0
                / F.count("*"),
                2,
            ).alias("bounce_pct"),
        )
        .orderBy("day")
    )


@query(
    "q79_winsorized_stats",
    oracle="""
    WITH b AS (
      SELECT event_type, quantile_cont("value", 0.05) AS p05,
             quantile_cont("value", 0.95) AS p95
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN e."value" < b.p05 OR e."value" > b.p95
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           round(avg(CASE WHEN e."value" < b.p05 THEN b.p05
                          WHEN e."value" > b.p95 THEN b.p95
                          ELSE e."value" END), 2) AS winsorized_mean,
           round(avg(e."value"), 2) AS raw_mean
    FROM events e JOIN b USING (event_type)
    GROUP BY e.event_type ORDER BY e.event_type
    """,
    tags=("relational", "robust-stats", "winsorize"),
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized means per event_type: values clipped at the exact
    interpolated p5/p95 before averaging — the tail-robust estimator
    between q74's MAD rejection (drop outliers) and the raw mean (keep
    them); n_clipped reports how much tail was flattened. One percentile
    aggregate (event_type-sized, broadcast back) + one scan-side CASE —
    the corpus is never shuffled by value."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    b = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clipped = F.when(F.col("value") < F.col("p05"), F.col("p05")).when(
        F.col("value") > F.col("p95"), F.col("p95")
    ).otherwise(F.col("value"))
    is_clipped = (F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95"))
    return (
        ev.join(F.broadcast(b), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(is_clipped, 1).otherwise(0)).alias("n_clipped"),
            F.round(F.avg(clipped), 2).alias("winsorized_mean"),
            F.round(F.avg("value"), 2).alias("raw_mean"),
        )
        .orderBy("event_type")
    )


@query(
    "q80_weekly_churn",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS DATE)) AS w
      FROM events WHERE event_type = 'purchase'
    ),
    weeks AS (SELECT DISTINCT w FROM wk),
    nxt AS (
      SELECT a.w, a.user_id,
             CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END AS churned
      FROM wk a
      LEFT JOIN wk b
        ON b.user_id = a.user_id AND b.w = a.w + INTERVAL 7 DAY
      WHERE a.w < (SELECT max(w) FROM weeks)
    )
    SELECT CAST(w AS DATE) AS week,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(sum(churned) AS BIGINT) AS n_churned,
           round(sum(churned) * 100.0 / count(*), 2) AS churn_pct
    FROM nxt GROUP BY w ORDER BY w
    """,
    tags=("relational", "retention", "churn"),
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly purchase churn: users purchasing in week W with NO purchase in week W+1
    (the inverse of q51's retention view). The corpus collapses to
    distinct (user, week) FIRST — one exchange — and the week-shift
    LEFT anti-pattern join runs on that user-week skeleton; the final
    week is excluded (its churn is undefined until the next week lands).
    Integer counts; one fixed-order percentage division."""
    ev = load_table(spark, sf_dir, "events")
    wk = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.date_trunc("week", F.col("ts").cast("date")).alias("w"),
        )
        .distinct()
    )
    max_w = wk.agg(F.max("w").alias("__mx"))
    # label each activity week SHIFTED BACK by 7 days: a (user, w) row in
    # ``nxt`` then means "user was active in w's NEXT week", so the left
    # join key equality tests exactly the oracle's b.w = a.w + 7
    nxt = wk.select(
        "user_id",
        (F.col("w") - F.expr("INTERVAL 7 DAYS")).alias("w"),
        F.lit(1).alias("__hit"),
    )
    return (
        wk.crossJoin(F.broadcast(max_w))
        .where(F.col("w") < F.col("__mx"))
        .join(nxt, ["user_id", "w"], "left")
        .select("w", F.when(F.col("__hit").isNull(), 1).otherwise(0).alias("churned"))
        .groupBy(F.col("w").cast("date").alias("week"))
        .agg(
            F.count("*").alias("n_active"),
            F.sum("churned").alias("n_churned"),
            F.round(F.sum("churned") * 100.0 / F.count("*"), 2).alias("churn_pct"),
        )
        .orderBy("week")
    )


@query(
    "q81_variant_json_stats",
    oracle="""
    WITH x AS (
      SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(k) AS BIGINT) AS n_k,
           CAST(min(k) AS INT) AS min_k,
           CAST(max(k) AS INT) AS max_k,
           round(avg(k), 2) AS avg_k,
           CAST(count(DISTINCT k) AS BIGINT) AS ndv_k
    FROM x GROUP BY event_type ORDER BY event_type
    """,
    tags=("relational", "json", "variant", "spark4"),
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured stats through Spark 4's native VARIANT type:
    ``parse_json`` once into a binary variant, then typed ``variant_get``
    extraction — the modern engine path for JSON columns (single parse,
    typed access, shreddable at the scan at scale) where q17 uses the
    legacy per-access ``get_json_object`` string walk. The oracle reads
    the same field with DuckDB's JSON extraction; aggregates are exact
    integers plus one rounded mean."""
    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        F.try_variant_get(F.parse_json("props"), "$.k", "int").alias("k"),
    )
    return (
        x.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("k").alias("n_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 2).alias("avg_k"),
            F.countDistinct("k").alias("ndv_k"),
        )
        .orderBy("event_type")
    )


@query(
    "q82_session_paths",
    oracle="""
    WITH t AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS opens
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             sum(opens) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM t
    ),
    tri AS (
      SELECT event_type
             || '>' || lead(event_type, 1) OVER v
             || '>' || lead(event_type, 2) OVER v AS path,
             lead(sess, 2) OVER v AS sess2, sess
      FROM s
      WINDOW v AS (PARTITION BY user_id, sess ORDER BY ts, event_id)
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n
    FROM tri WHERE path IS NOT NULL AND sess2 = sess
    GROUP BY path ORDER BY n DESC, path LIMIT 15
    """,
    tags=("relational", "sessionization", "sequence-mining"),
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 behavioral 3-step paths WITHIN sessions: q78's 30-minute-gap
    sessionization, then event-type trigrams via two leads over the
    session-scoped window — the lightweight sequential-pattern miner
    (clickstream 'what do users do next'). Both the session numbering and
    the trigram leads partition by user, so everything rides user-keyed
    exchanges; the path space is |event_types|^3-bounded, so the count
    shuffle is tiny. The session-scoped lead window makes cross-session
    trigrams structurally impossible."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    opens = F.when(F.lag("ts").over(w).isNull() | (gap > 1800), 1).otherwise(0)
    wsum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    s = ev.select(
        "user_id", "ts", "event_id", "event_type", opens.alias("opens")
    ).withColumn("sess", F.sum("opens").over(wsum))
    v = Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")
    tri = s.select(
        F.concat_ws(
            ">",
            "event_type",
            F.lead("event_type", 1).over(v),
            F.lead("event_type", 2).over(v),
        ).alias("path"),
        (F.lead("event_type", 2).over(v).isNotNull()).alias("complete"),
    )
    return (
        tri.where(F.col("complete"))
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(15)
    )


@query(
    "q83_frequent_triples",
    oracle="""
    WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
    isup AS (SELECT it FROM b GROUP BY it HAVING count(*) >= 25),
    pruned AS (SELECT bk, it FROM b JOIN isup USING (it)),
    sized AS (SELECT bk FROM pruned GROUP BY bk HAVING count(*) BETWEEN 2 AND 20),
    pairs AS (
      SELECT a.it AS ia, a2.it AS ib
      FROM pruned a JOIN sized USING (bk)
      JOIN pruned a2 ON a.bk = a2.bk AND a.it < a2.it
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    pitems AS (SELECT DISTINCT ia AS it FROM pairs UNION SELECT ib FROM pairs),
    pruned2 AS (SELECT bk, it FROM pruned JOIN pitems USING (it)),
    sized3 AS (SELECT bk FROM pruned2 GROUP BY bk HAVING count(*) BETWEEN 3 AND 20),
    tr AS (
      SELECT a.it AS item_a, b2.it AS item_b, c.it AS item_c, count(*) AS support
      FROM pruned2 a JOIN sized3 USING (bk)
      JOIN pruned2 b2 ON a.bk = b2.bk AND a.it < b2.it
      JOIN pruned2 c ON a.bk = c.bk AND b2.it < c.it
      GROUP BY 1, 2, 3
    )
    SELECT item_a, item_b, item_c, CAST(support AS BIGINT) AS support
    FROM tr ORDER BY support DESC, item_a, item_b, item_c LIMIT 20
    """,
    tags=("itemsets", "apriori", "triples"),
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-3 a-priori: top-20 part triples co-purchased together. The
    candidate ladder prunes twice before any triple exists (frequent
    singletons, then items appearing in some frequent PAIR — the a-priori
    property one level up), and the cubic in-array fan-out is bounded by
    a tighter 20-item basket cap; the one shuffle carries (int,int,int)
    keys. The oracle replays the identical ladder with set-wise SQL
    (operators/itemsets.frequent_triples)."""
    from guardian_for_apache_kafka_spark.operators.itemsets import frequent_triples

    li = load_table(spark, sf_dir, "lineitem")
    out = frequent_triples(
        li, "l_orderkey", "l_partkey",
        min_item_support=25, min_pair_support=2, min_triple_support=1,
        max_basket=20,
    )
    return out.orderBy(
        F.desc("support"), "item_a", "item_b", "item_c"
    ).limit(20)


@query(
    "q84_join_skew_report",
    oracle="""
    WITH c AS (
      SELECT l_partkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1
    ),
    s AS (
      SELECT count(*) AS n_keys, sum(cnt) AS n_rows,
             max(cnt) AS max_cnt, avg(cnt) AS avg_cnt
      FROM c
    )
    SELECT c.key, CAST(c.cnt AS BIGINT) AS cnt,
           round(c.cnt * 100.0 / s.n_rows, 4) AS pct_of_rows,
           round(c.cnt / s.avg_cnt, 2) AS skew_factor,
           CAST(s.n_keys AS BIGINT) AS n_keys
    FROM c CROSS JOIN s
    ORDER BY c.cnt DESC, c.key LIMIT 10
    """,
    tags=("relational", "diagnostics", "skew"),
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report: the 10 heaviest lineitem part keys with their
    share of rows and skew factor (count / mean count) — the pre-join
    diagnostic that decides whether q39's salting or AQE skew-join is
    needed BEFORE a 100 TB shuffle burns. One key-count aggregate + a
    broadcast scalar summary; TakeOrdered for the top-k."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    s = c.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.avg("cnt").alias("avg_cnt"),
    )
    return (
        c.crossJoin(F.broadcast(s))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") * 100.0 / F.col("n_rows"), 4).alias(
                "pct_of_rows"
            ),
            F.round(F.col("cnt") / F.col("avg_cnt"), 2).alias("skew_factor"),
            "n_keys",
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(10)
    )


@query(
    "q85_latency_bands",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont("value", 0.50), 3) AS p50,
           round(quantile_cont("value", 0.90), 3) AS p90,
           round(quantile_cont("value", 0.99), 3) AS p99
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("relational", "percentiles", "observability"),
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily latency-band rollup: exact interpolated p50/p90/p99 of value
    per (day, event_type) — the SLO dashboard primitive. One grouped
    percentile aggregate; at 100 TB the same shape swaps percentile() for
    the q58 mergeable histograms when groups stop fitting a sort buffer
    (both are in the registry precisely so the trade is measured, not
    guessed)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.expr("percentile(value, 0.50)"), 3).alias("p50"),
            F.round(F.expr("percentile(value, 0.90)"), 3).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 3).alias("p99"),
        )
        .orderBy("day", "event_type")
    )


@query(
    "q86_merge_schema_evolution",
    oracle="""
    WITH o AS (SELECT o_orderkey AS k, o_custkey AS c, o_totalprice AS p,
                      o_orderpriority AS pr FROM orders),
    base AS (SELECT k, c, p, pr FROM o WHERE k % 3 <> 0),
    upd AS (
      SELECT k, c, p + 1000 AS p, pr, 'eu-west' AS region
      FROM o WHERE k % 3 <> 0 AND k % 7 = 0
      UNION ALL
      SELECT k, c, p, pr, 'us-east' AS region FROM o WHERE k % 3 = 0
    ),
    merged AS (
      SELECT b.k, b.c,
             CASE WHEN u.k IS NOT NULL THEN u.p ELSE b.p END AS p,
             b.pr,
             u.region
      FROM base b LEFT JOIN upd u ON b.k = u.k
      UNION ALL
      SELECT u.k, u.c, u.p, u.pr, u.region
      FROM upd u LEFT JOIN base b ON b.k = u.k WHERE b.k IS NULL
    )
    SELECT coalesce(region, '(legacy)') AS region,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(p), 2) AS total_price
    FROM merged GROUP BY 1 ORDER BY 1
    """,
    tags=("relational", "merge", "schema-evolution"),
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with schema evolution (Delta ``mergeSchema`` twin): the CDC
    batch carries a NEW ``region`` column; ``evolve_schema=True`` adds it
    to the snapshot, updates/inserts populate it, and untouched legacy
    rows carry NULL — the add-column backfill contract on plain parquet.
    Still ONE full-outer key join (operators/merge.merge_into); the
    oracle reconstructs the evolved snapshot set-wise."""
    from guardian_for_apache_kafka_spark.operators.merge import merge_into

    k = F.col("o_orderkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    base = o.where(k % 3 != 0)
    upd = o.where((k % 3 != 0) & (k % 7 == 0)).select(
        k,
        "o_custkey",
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
        "o_orderpriority",
        F.lit("eu-west").alias("region"),
    )
    ins = o.where(k % 3 == 0).select(
        k, "o_custkey", "o_totalprice", "o_orderpriority",
        F.lit("us-east").alias("region"),
    )
    merged = merge_into(
        base,
        upd.unionByName(ins),
        "o_orderkey",
        ["o_custkey", "o_totalprice", "o_orderpriority", "region"],
        evolve_schema=True,
    )
    return (
        merged.groupBy(
            F.coalesce("region", F.lit("(legacy)")).alias("region")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("region")
    )


@query(
    "q87_bitemporal_asof",
    oracle="""
    WITH log AS (
      SELECT o_orderkey % 997 AS k, o_totalprice AS p, o_orderpriority AS pr,
             o_orderdate AS valid_ts,
             row_number() OVER (PARTITION BY o_orderkey % 997
                                ORDER BY o_orderdate, o_orderkey) AS txn
      FROM orders
    ),
    picked AS (
      SELECT k, p, pr FROM log
      WHERE txn <= 3 AND valid_ts <= TIMESTAMP '1996-12-31 00:00:00'
      QUALIFY row_number() OVER (PARTITION BY k
                                 ORDER BY valid_ts DESC, txn DESC) = 1
    )
    SELECT pr AS o_orderpriority, CAST(count(*) AS BIGINT) AS n_keys,
           round(sum(p), 2) AS total_price
    FROM picked GROUP BY pr ORDER BY pr
    """,
    tags=("relational", "bitemporal", "cdc"),
)
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of: order state per key as KNOWN after each key's
    first 3 transactions, EFFECTIVE at valid time 1996-12-31 — both time
    axes at once (q57 time-travels the transaction axis, q61 materializes
    the valid axis; this is the point lookup across both, the
    late-correction-safe read a bitemporal ledger exists for). One
    key-partitioned argmax window on one exchange; both as-of predicates
    are scan filters (operators/merge.bitemporal_asof)."""
    from guardian_for_apache_kafka_spark.operators.merge import bitemporal_asof

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy(F.col("o_orderkey") % 997).orderBy(
        "o_orderdate", "o_orderkey"
    )
    log = o.select(
        (F.col("o_orderkey") % 997).alias("k"),
        F.col("o_totalprice").alias("p"),
        F.col("o_orderpriority").alias("pr"),
        F.col("o_orderdate").alias("valid_ts"),
        F.row_number().over(w).cast("long").alias("txn"),
    )
    picked = bitemporal_asof(
        log, "k", "valid_ts", "txn",
        valid_as_of="1996-12-31 00:00:00", txn_as_of=3,
    )
    return (
        picked.groupBy(F.col("pr").alias("o_orderpriority"))
        .agg(
            F.count("*").alias("n_keys"),
            F.round(F.sum("p"), 2).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q88_silence_gaps",
    oracle="""
    WITH g AS (
      SELECT user_id,
             date_diff('second', lag(ts) OVER w, ts) AS gap
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(max(gap) AS BIGINT) AS max_gap_sec,
           CAST(sum(CASE WHEN gap > 86400 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_day_gaps
    FROM g WHERE gap IS NOT NULL
    GROUP BY user_id
    ORDER BY max_gap_sec DESC, user_id LIMIT 25
    """,
    tags=("relational", "timeseries", "gap-detection"),
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence-gap report: the 25 users with the longest gap between
    consecutive events, plus their count of >1-day outages — the
    missing-data / dead-sensor diagnostic that q38's gap-fill assumes
    somebody ran first. One lag window and the per-user aggregate on one
    user exchange; TakeOrdered for the top-k."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        ev.select("user_id", gap.alias("gap"))
        .where(F.col("gap").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max("gap").alias("max_gap_sec"),
            F.sum(F.when(F.col("gap") > 86400, 1).otherwise(0)).alias(
                "n_day_gaps"
            ),
        )
        .orderBy(F.desc("max_gap_sec"), "user_id")
        .limit(25)
    )


@query(
    "q89_guarded_sequence",
    oracle="""
    WITH t AS (
      SELECT user_id, ts, event_id, event_type, "value",
             last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
               OVER w AS last_view,
             last_value(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
               OVER w AS last_error
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_clean_purchases,
           round(sum("value"), 2) AS clean_revenue
    FROM t
    WHERE event_type = 'purchase'
      AND last_view IS NOT NULL
      AND date_diff('second', last_view, ts) <= 3600
      AND (last_error IS NULL OR last_error < last_view)
    GROUP BY 1 ORDER BY 1
    """,
    tags=("relational", "cep", "sequence-guard"),
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guarded event sequence (CEP shape): purchases within ONE HOUR of a
    preceding view with NO error in between — the A-then-B-within-T-
    without-C pattern (fraud/UX funnels) as two IGNORE NULLS last_value
    frames on ONE user exchange; the 'no C between' guard is just
    last_error < last_view, no self-join, no range probe. Per-day clean
    conversion counts and revenue."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.last(
        F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
    ).over(w)
    last_error = F.last(
        F.when(F.col("event_type") == "error", F.col("ts")), ignorenulls=True
    ).over(w)
    t = ev.select(
        "ts", "event_type", "value",
        last_view.alias("last_view"), last_error.alias("last_error"),
    )
    return (
        t.where(
            (F.col("event_type") == "purchase")
            & F.col("last_view").isNotNull()
            & (
                F.unix_timestamp("ts") - F.unix_timestamp("last_view") <= 3600
            )
            & (
                F.col("last_error").isNull()
                | (F.col("last_error") < F.col("last_view"))
            )
        )
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n_clean_purchases"),
            F.round(F.sum("value"), 2).alias("clean_revenue"),
        )
        .orderBy("day")
    )


@query(
    "q90_scd2_fact_join",
    oracle="""
    WITH tiers AS (
      SELECT user_id, ts AS tier_from, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS tier
      FROM events WHERE event_type = 'signup' OR event_type = 'click'
    ),
    facts AS (
      SELECT user_id, ts, event_id, "value" FROM events
      WHERE event_type = 'purchase'
    ),
    joined AS (
      SELECT f.user_id, f."value",
             (SELECT max(t.tier) FROM tiers t
              WHERE t.user_id = f.user_id
                AND (t.tier_from < f.ts
                     OR (t.tier_from = f.ts AND t.event_id <= f.event_id)))
               AS tier
      FROM facts f
    )
    SELECT coalesce(tier, 0) AS tier,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum("value"), 2) AS revenue
    FROM joined GROUP BY 1 ORDER BY 1
    """,
    tags=("relational", "scd2", "asof", "dimension-join"),
)
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-SCD2 dimension join: each purchase picks up the user's tier
    AS OF the purchase time (tier = running count of signup/click
    milestones — a self-derived slowly-changing dimension), the warehouse
    lookup every fact table runs against its dimension history. Spark
    plan: the union-window as-of join (operators/asof.asof_join — one
    (user, time)-keyed exchange, NO range probe, no per-fact subquery);
    the oracle states the textbook correlated validity-interval lookup
    the operator exists to avoid. Tier 0 = purchases before any
    milestone."""
    from guardian_for_apache_kafka_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tiers = (
        ev.where(F.col("event_type").isin("signup", "click"))
        .select(
            "user_id", "ts", "event_id",
            F.row_number().over(w).cast("long").alias("tier"),
        )
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        facts,
        tiers.select("user_id", "ts", "tier"),
        on="ts",
        by=("user_id",),
        payload=("tier",),
        direction="backward",
    )
    return (
        joined.groupBy(F.coalesce("tier", F.lit(0)).alias("tier"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("revenue"),
        )
        .orderBy("tier")
    )


@query(
    "q91_event_debounce",
    oracle="""
    WITH t AS (
      SELECT event_type, "value",
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > 300
                  THEN 1 ELSE 0 END AS keep
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(sum(keep) AS BIGINT) AS n_kept,
           round(sum(keep) * 100.0 / count(*), 2) AS kept_pct,
           round(sum(CASE WHEN keep = 1 THEN "value" ELSE 0 END), 2)
             AS kept_value
    FROM t GROUP BY event_type ORDER BY event_type
    """,
    tags=("relational", "debounce", "dedup", "signals"),
)
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event debouncing: collapse bursts of the same (user, event_type)
    signal into their first occurrence — a burst (re)opens after 5 silent
    minutes, so keep == the burst-opening rows (the q78 session-open flag
    on a finer key). The telemetry/refresh-spam dedup every event
    pipeline runs before counting anything; one (user, type)-keyed window
    exchange, burst membership never materializes."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    keep = F.when(F.lag("ts").over(w).isNull() | (gap > 300), 1).otherwise(0)
    t = ev.select("event_type", "value", keep.alias("keep"))
    return (
        t.groupBy("event_type")
        .agg(
            F.count("*").alias("n_raw"),
            F.sum("keep").alias("n_kept"),
            F.round(F.sum("keep") * 100.0 / F.count("*"), 2).alias("kept_pct"),
            F.round(
                F.sum(F.when(F.col("keep") == 1, F.col("value")).otherwise(0.0)),
                2,
            ).alias("kept_value"),
        )
        .orderBy("event_type")
    )


@query(
    "q92_write_conflicts",
    oracle="""
    WITH a AS (
      SELECT o_orderkey AS k, round(o_totalprice * 1.10, 2) AS p
      FROM orders WHERE o_orderkey % 5 = 0
    ),
    b AS (
      SELECT o_orderkey AS k, round(o_totalprice + 500, 2) AS p
      FROM orders WHERE o_orderkey % 7 = 0
    )
    SELECT a.k AS o_orderkey, a.p AS price_txn_a, b.p AS price_txn_b,
           round(abs(a.p - b.p), 2) AS divergence
    FROM a JOIN b ON a.k = b.k AND a.p <> b.p
    ORDER BY divergence DESC, a.k LIMIT 20
    """,
    tags=("relational", "cdc", "concurrency", "conflict-detection"),
)
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic-concurrency conflict detection: two concurrent CDC
    batches (a 10% reprice and a flat +500 adjustment) touch overlapping
    keys with DIFFERENT results — the write-write conflicts a MERGE
    serializer must surface before applying either (Delta's
    ConcurrentAppend analysis on plain frames). One key-equi join between
    batch key sets; conflict volume is overlap-sized, so the report is
    tiny even when the batches aren't."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    a = o.where(k % 5 == 0).select(
        k.alias("k"), F.round(F.col("o_totalprice") * 1.10, 2).alias("pa")
    )
    b = o.where(k % 7 == 0).select(
        k.alias("k"), F.round(F.col("o_totalprice") + 500, 2).alias("pb")
    )
    return (
        a.join(b, "k")
        .where(F.col("pa") != F.col("pb"))
        .select(
            F.col("k").alias("o_orderkey"),
            F.col("pa").alias("price_txn_a"),
            F.col("pb").alias("price_txn_b"),
            F.round(F.abs(F.col("pa") - F.col("pb")), 2).alias("divergence"),
        )
        .orderBy(F.desc("divergence"), "o_orderkey")
        .limit(20)
    )


@query(
    "q93_range_split_points",
    oracle="""
    WITH sp AS (
      SELECT quantile_cont(o_totalprice,
               [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS v
      FROM orders
    )
    SELECT CAST(g.i AS BIGINT) AS bucket, round(v[g.i], 2) AS split_point
    FROM sp CROSS JOIN generate_series(1, 7) AS g(i)
    ORDER BY bucket
    """,
    tags=("relational", "layout", "range-partitioning"),
)
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth range-partition planning: the 7 split points dividing
    orders into 8 equal-count price ranges — what a range partitioner /
    sorted-write layout computes before a 100 TB global sort (Spark's own
    RangePartitioner samples; this is the exact version, and q58's
    mergeable histograms the approximate-at-scale one). One percentile
    aggregate; boundaries are 7 scalars."""
    o = load_table(spark, sf_dir, "orders")
    qs = ", ".join(str((b) / 8.0) for b in range(1, 8))
    splits = o.agg(
        F.expr(f"percentile(o_totalprice, array({qs}))").alias("sp")
    )
    return (
        splits.select(F.posexplode("sp").alias("i", "v"))
        .select(
            (F.col("i") + 1).cast("long").alias("bucket"),
            F.round("v", 2).alias("split_point"),
        )
        .orderBy("bucket")
    )


@query(
    "q94_cube_aggregate",
    oracle="""
    SELECT coalesce(l_returnflag, '(all)') AS returnflag,
           coalesce(l_linestatus, '(all)') AS linestatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, returnflag, linestatus
    """,
    tags=("relational", "cube", "grouping"),
)
def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping combinations in
    one pass — completes the grouped-aggregate surface next to q8's
    ROLLUP/GROUPING SETS. Spark plans CUBE as a single Expand + aggregate
    (rows duplicated 4x at map side, partial-agg before the one
    exchange); grouping() flags disambiguate real NULLs from subtotal
    rows, rendered '(all)' deterministically."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping("l_returnflag").cast("long").alias("g_rf"),
            F.grouping("l_linestatus").cast("long").alias("g_ls"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "n", "sum_qty", "g_rf", "g_ls",
        )
        .orderBy("g_rf", "g_ls", "returnflag", "linestatus")
    )


@query(
    "q95_audience_overlap",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT x.event_type AS type_a, y.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_both
    FROM a x JOIN a y
      ON x.user_id = y.user_id AND x.event_type < y.event_type
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("relational", "audience", "overlap"),
)
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap matrix: distinct users engaging in BOTH of each
    event-type pair — the co-audience view behind campaign planning and
    the q48 sketch rollup's exact twin (at 100 TB the same matrix comes
    from pairwise HLL sketch intersections via inclusion-exclusion;
    this exact form is the ground truth it's validated against).
    One distinct (user, type) collapse, then the pair fan-out happens
    INSIDE the per-user type array — types^2 is tiny — so the only
    exchanges are the distinct and the matrix count."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.select("user_id", "event_type").distinct()
    per_user = a.groupBy("user_id").agg(
        F.array_sort(F.collect_list("event_type")).alias("types")
    )
    pairs = F.expr(
        "flatten(transform(types, (x, i) -> "
        "transform(slice(types, i + 2, size(types)), "
        "y -> struct(x AS type_a, y AS type_b))))"
    )
    return (
        per_user.select(F.explode(pairs).alias("p"))
        .groupBy("p.type_a", "p.type_b")
        .agg(F.count("*").alias("n_both"))
        .orderBy("type_a", "type_b")
    )


@query(
    "q96_diverse_topk",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price,
           CAST(rn AS BIGINT) AS rank_within_cust
    FROM ranked WHERE rn <= 2
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
    tags=("relational", "topk", "diversity-constraint"),
)
def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-constrained top-k: the 15 highest-value orders subject to
    AT MOST 2 per customer — the feed/search-results constraint that a
    plain ORDER BY LIMIT violates the moment one heavy customer dominates.
    Per-customer window rank caps the group contribution (WindowGroupLimit
    prunes to 2 rows/customer BEFORE the exchange), then TakeOrdered picks
    the global k — no global sort ever materializes."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("price"),
            F.col("rn").cast("long").alias("rank_within_cust"),
        )
        .orderBy(F.desc("price"), "o_orderkey")
        .limit(15)
    )


@query(
    "q97_gini_concentration",
    oracle="""
    WITH spend AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey AS k, sum(o.o_totalprice) AS s
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT seg, s,
             row_number() OVER (PARTITION BY seg ORDER BY s, k) AS i,
             count(*) OVER (PARTITION BY seg) AS n
      FROM spend
    )
    SELECT seg,
           CAST(max(n) AS BIGINT) AS n_customers,
           round(sum(s), 2) AS total_spend,
           round(2.0 * sum(i * s) / (max(n) * sum(s))
                 - (max(n) + 1.0) / max(n), 4) AS gini
    FROM ranked GROUP BY seg ORDER BY seg
    """,
    tags=("relational", "statistics", "concentration"),
)
def q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per market segment: the exact Gini
    coefficient of per-customer spend (0 = equal, 1 = one whale) via the
    rank formula G = 2*sum(i*s_i)/(n*sum(s)) - (n+1)/n — the
    whale-dependence metric behind q84's skew report, as a statistic
    instead of a top-k. One spend aggregate, one segment-keyed rank
    window, one segment-sized rollup; ties pinned by (spend, custkey)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
               o.o_custkey == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("o_custkey").alias("k"))
        .agg(F.sum("o_totalprice").alias("s"))
    )
    w = Window.partitionBy("seg").orderBy("s", "k")
    ranked = spend.select(
        "seg", "s",
        F.row_number().over(w).alias("i"),
        F.count("*").over(Window.partitionBy("seg")).alias("n"),
    )
    return (
        ranked.groupBy("seg")
        .agg(
            F.max("n").cast("long").alias("n_customers"),
            F.round(F.sum("s"), 2).alias("total_spend"),
            F.round(
                2.0 * F.sum(F.col("i") * F.col("s"))
                / (F.max("n") * F.sum("s"))
                - (F.max("n") + 1.0) / F.max("n"),
                4,
            ).alias("gini"),
        )
        .orderBy("seg")
    )


@query(
    "q98_markov_transitions",
    oracle="""
    WITH t AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS opens
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             sum(opens) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM t
    ),
    tr AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER v AS to_type
      FROM s
      WINDOW v AS (PARTITION BY user_id, sess ORDER BY ts, event_id)
    ),
    cnt AS (
      SELECT from_type, to_type, count(*) AS n
      FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY from_type), 4) AS p
    FROM cnt ORDER BY from_type, to_type
    """,
    tags=("relational", "markov", "sessionization"),
)
def q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of in-session behavior:
    P(next event type | current) estimated from consecutive pairs inside
    q78's 30-minute sessions — the model behind next-action prediction
    and the q82 path miner's 1-step core. All heavy work rides the one
    user-keyed exchange; the matrix itself is |types|^2, and the
    row-normalization window runs over that tiny frame."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    opens = F.when(F.lag("ts").over(w).isNull() | (gap > 1800), 1).otherwise(0)
    wsum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    s = ev.select(
        "user_id", "ts", "event_id", "event_type", opens.alias("opens")
    ).withColumn("sess", F.sum("opens").over(wsum))
    v = Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")
    tr = s.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(v).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    cnt = tr.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    wrow = Window.partitionBy("from_type")
    return (
        cnt.select(
            "from_type", "to_type", "n",
            F.round(F.col("n").cast("double") / F.sum("n").over(wrow), 4).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "q99_referential_audit",
    oracle="""
    SELECT 'lineitem->orders' AS relationship,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_children,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                   WHERE l.l_orderkey = o.o_orderkey))
                AS BIGINT) AS n_childless_parents
    UNION ALL
    SELECT 'orders->customer',
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_custkey = c.c_custkey))
                AS BIGINT)
    ORDER BY relationship
    """,
    tags=("relational", "data-quality", "referential-integrity"),
)
def q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphaned children and childless
    parents across the lineitem->orders and orders->customer foreign
    keys — the RELATIONSHIP-level data-quality check beside q50's
    column-level profile (a broken ingest shows up here first).

    One declarative plan per relationship: group each side down to its
    key, full-outer join the two key spines, and read all three counts
    off the match pattern (child count where parent side is null =
    orphans; parent count where child side is null = childless). Exactly
    the anti-join semantics — a null FK never equi-matches, so null-key
    child groups land on the orphan side, as LeftAnti counts them.
    Nothing wider than (key, count) ever shuffles, and the whole audit is
    ONE action instead of six driver-blocking counts at plan-build time
    (r11: 19 build jobs / 8.5 s -> 0; the s5 Lloyd caveat no longer
    applies here)."""

    def audit(child, ckey, parent, pkey, name):
        ca = child.groupBy(F.col(ckey).alias("__k")).agg(F.count("*").alias("__c"))
        pa = parent.groupBy(F.col(pkey).alias("__k")).agg(F.count("*").alias("__p"))
        return ca.join(pa, "__k", "full_outer").agg(
            F.lit(name).alias("relationship"),
            F.coalesce(F.sum("__c"), F.lit(0)).alias("n_children"),
            F.coalesce(
                F.sum(F.when(F.col("__p").isNull(), F.col("__c"))), F.lit(0)
            ).alias("n_orphans"),
            F.coalesce(
                F.sum(F.when(F.col("__c").isNull(), F.col("__p"))), F.lit(0)
            ).alias("n_childless_parents"),
        )

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        audit(li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionAll(
            audit(
                o.select("o_custkey"), "o_custkey", c, "c_custkey",
                "orders->customer",
            )
        )
        .orderBy("relationship")
    )


@query(
    "q100_contract_checks",
    oracle="""
    WITH checks AS (
      SELECT
        CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS null_event_id,
        CAST(sum(CASE WHEN event_type NOT IN
                  ('click','error','purchase','signup','view')
                 THEN 1 ELSE 0 END) AS BIGINT) AS bad_event_type,
        CAST(sum(CASE WHEN "value" < 0 OR "value" > 1000 THEN 1 ELSE 0 END)
          AS BIGINT) AS value_out_of_range,
        CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-01'
                        OR ts >= TIMESTAMP '2024-02-01'
                 THEN 1 ELSE 0 END) AS BIGINT) AS ts_out_of_window,
        CAST(sum(CASE WHEN json_extract(props, '$.k') IS NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS props_missing_k,
        CAST(count(*) AS BIGINT) AS n_rows
      FROM events
    )
    SELECT c.name AS check_name, c.v AS n_violations, checks.n_rows,
           c.v = 0 AS passed
    FROM checks, LATERAL (VALUES
      ('event_id_not_null', null_event_id),
      ('event_type_enum', bad_event_type),
      ('props_has_k', props_missing_k),
      ('ts_in_window', ts_out_of_window),
      ('value_range', value_out_of_range)
    ) AS c(name, v)
    ORDER BY check_name
    """,
    tags=("relational", "data-quality", "contract"),
)
def q100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract validation (the expectations-suite shape): not-null,
    enum-membership, numeric-range, time-window and JSON-shape checks over
    events in ONE scan — all violation counters are conditional sums in a
    single aggregate, melted to one row per check (q50 profiles what IS
    there; this asserts what MUST be). At 100 TB adding a check costs one
    more CASE column, never another pass. The check suite itself lives in
    functions.columns.contract_violation_aggs, shared with the streaming
    monitor twin (streaming.pipeline.stream_contract_checks)."""
    from guardian_for_apache_kafka_spark.functions.columns import (
        contract_violation_aggs,
    )

    ev = load_table(spark, sf_dir, "events")
    viol = contract_violation_aggs()
    agg = ev.agg(
        *[v.alias(k) for k, v in viol.items()], F.count("*").alias("n_rows")
    )
    stack = ", ".join(f"'{k}', {k}" for k in sorted(viol))
    return (
        agg.select(
            F.expr(
                f"stack({len(viol)}, {stack}) AS (check_name, n_violations)"
            ),
            "n_rows",
        )
        .select(
            "check_name",
            "n_violations",
            "n_rows",
            (F.col("n_violations") == 0).alias("passed"),
        )
        .orderBy("check_name")
    )


def _ewma_sql(alpha: float, n_lags: int) -> tuple[str, str]:
    """DuckDB numerator/denominator text for the bounded-lag EWMA: weighted
    sum over the ``n_lags`` most recent rows (weight (1-alpha)^i), normalized
    by the weights actually present so the series start is unbiased."""
    num, den = [], []
    for i in range(n_lags):
        w = (1 - alpha) ** i
        x = f"lag(x, {i}) OVER w" if i else "x"
        num.append(f"CASE WHEN {x} IS NOT NULL THEN {w!r} * {x} ELSE 0 END")
        den.append(f"CASE WHEN {x} IS NOT NULL THEN {w!r} ELSE 0 END")
    return " + ".join(num), " + ".join(den)


_EWMA_NUM, _EWMA_DEN = _ewma_sql(0.3, 8)


@query(
    "q102_ewma_smoothing",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, sum("value") AS x
      FROM events WHERE user_id < 20 GROUP BY 1, 2
    )
    SELECT user_id, day, round(x, 2) AS total,
           round(({_EWMA_NUM}) / ({_EWMA_DEN}), 2) AS ewma
    FROM daily
    WINDOW w AS (PARTITION BY user_id ORDER BY day)
    ORDER BY user_id, day
    """,
    tags=("relational", "timeseries", "smoothing"),
)
def q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-lag EWMA smoothing of each user's daily spend — the
    monitoring-dashboard smoother. The textbook EWMA is a per-row recurrence
    (inherently sequential); the weight (1-a)^i decays below 6% of the head
    weight by lag 8 at a=0.3, so the 8-lag truncation is the
    cluster-friendly form: one shuffle on user_id, then a single window pass
    computes all eight lags — no per-key sequential state, no iteration.
    Weights are renormalized over the lags actually present so the series
    start is unbiased rather than damped. The untruncated recurrence lives
    in the streaming twin (streaming.stateful.stream_ewma), where per-key
    state is the natural home."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("user_id") < 20)
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.sum("value").alias("x"))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    alpha, n_lags = 0.3, 8
    num = F.lit(0.0)
    den = F.lit(0.0)
    for i in range(n_lags):
        x = F.lag("x", i).over(w) if i else F.col("x")
        wt = float((1 - alpha) ** i)
        num = num + F.when(x.isNotNull(), F.lit(wt) * x).otherwise(F.lit(0.0))
        den = den + F.when(x.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return daily.select(
        "user_id",
        "day",
        F.round("x", 2).alias("total"),
        F.round(num / den, 2).alias("ewma"),
    ).orderBy("user_id", "day")


@query(
    "q103_k_anonymity",
    oracle="""
    WITH qi AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band0,
             CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS band1
      FROM customer
    ),
    leveled AS (
      SELECT nation, segment, 0 AS level, band0 AS band FROM qi
      UNION ALL
      SELECT nation, segment, 1 AS level, band1 AS band FROM qi
      UNION ALL
      SELECT nation, segment, 2 AS level, 0 AS band FROM qi
    ),
    classes AS (
      SELECT nation, segment, level, band, count(*) AS class_size
      FROM leveled GROUP BY 1, 2, 3, 4
    ),
    lv AS (
      SELECT nation, segment, level, min(class_size) AS min_size
      FROM classes GROUP BY 1, 2, 3
    ),
    chosen AS (
      SELECT nation, segment, level, min_size,
             coalesce(min(CASE WHEN min_size >= 5 THEN level END)
                        OVER (PARTITION BY nation, segment), 2)
               AS chosen_level
      FROM lv
    )
    SELECT nation, segment,
           CAST(chosen_level AS INT) AS chosen_level,
           CAST(min_size AS BIGINT) AS min_class_size,
           min_size >= 5 AS meets_k
    FROM chosen WHERE level = chosen_level
    ORDER BY nation, segment
    """,
    tags=("relational", "privacy", "k-anonymity"),
)
def q103(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal-generalization k-anonymity audit (k=5) over the customer
    quasi-identifiers (nation, segment, account-balance band): for each
    (nation, segment) population, pick the LEAST generalized balance band
    (level 0 = $1000 bands, 1 = $2000 bands, 2 = band suppressed) whose
    smallest equivalence class still holds >= k people — the
    release-readiness check run before publishing any user-keyed dataset.
    ONE scan: the three candidate generalizations explode to (level, band)
    rows map-side, two small aggregations find per-level minima, and the
    chosen level is a window minimum over the 3-rows-per-group level table
    (a join-back formulation would duplicate the lineage and re-scan the
    base table; plan-asserted). Groups failing k even fully suppressed
    surface as meets_k = false rather than being dropped."""
    c = load_table(spark, sf_dir, "customer")
    leveled = c.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("level"),
                    F.floor(F.col("c_acctbal") / 1000.0).alias("band"),
                ),
                F.struct(
                    F.lit(1).alias("level"),
                    F.floor(F.col("c_acctbal") / 2000.0).alias("band"),
                ),
                F.struct(
                    F.lit(2).alias("level"), F.lit(0).cast("long").alias("band")
                ),
            )
        ).alias("lb"),
    ).select("nation", "segment", "lb.level", "lb.band")
    lv = (
        leveled.groupBy("nation", "segment", "level", "band")
        .agg(F.count("*").alias("class_size"))
        .groupBy("nation", "segment", "level")
        .agg(F.min("class_size").alias("min_size"))
    )
    chosen = lv.withColumn(
        "chosen_level",
        F.coalesce(
            F.min(F.when(F.col("min_size") >= 5, F.col("level"))).over(
                Window.partitionBy("nation", "segment")
            ),
            F.lit(2),
        ),
    )
    return (
        chosen.where(F.col("level") == F.col("chosen_level"))
        .select(
            "nation",
            "segment",
            F.col("chosen_level").cast("int").alias("chosen_level"),
            F.col("min_size").cast("long").alias("min_class_size"),
            (F.col("min_size") >= 5).alias("meets_k"),
        )
        .orderBy("nation", "segment")
    )


@query(
    "q104_seasonal_decomposition",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, sum("value") AS total
      FROM events GROUP BY 1
    ),
    tr AS (
      SELECT day, total,
             CASE WHEN count(*) OVER w = 7
                  THEN avg(total) OVER w END AS trend
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    se AS (
      SELECT day, total, trend,
             avg(total - trend) OVER (PARTITION BY dayofweek(day)) AS seasonal
      FROM tr
    )
    SELECT day, round(total, 2) AS total, round(trend, 2) AS trend,
           round(seasonal, 2) AS seasonal,
           round(total - trend - seasonal, 2) AS residual
    FROM se
    ORDER BY day
    """,
    tags=("relational", "timeseries", "decomposition"),
)
def q104(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily revenue
    series: trend = centered 7-day moving average (defined only where the
    full window exists, so edges stay NULL instead of biased), weekly
    seasonal = day-of-week mean of the detrended series (expressed as a
    dow-partitioned window so NULL-trend edges drop out arithmetically),
    residual = the anomaly signal left over — the STL-lite preprocessing
    step before alerting on q44-style z-scores. Everything past the first
    groupBy is windows over the DAYS-sized daily aggregate in ONE lineage —
    the fact table is scanned exactly once (a join-back formulation would
    re-scan it per decomposition term; plan-asserted)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum("value").alias("total")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "total",
        F.when(F.count("*").over(w) == 7, F.avg("total").over(w)).alias("trend"),
    )
    se = tr.withColumn(
        "seasonal",
        F.avg(F.col("total") - F.col("trend")).over(
            Window.partitionBy(F.dayofweek("day") - 1)
        ),
    )
    return se.select(
        "day",
        F.round("total", 2).alias("total"),
        F.round("trend", 2).alias("trend"),
        F.round("seasonal", 2).alias("seasonal"),
        F.round(F.col("total") - F.col("trend") - F.col("seasonal"), 2).alias(
            "residual"
        ),
    ).orderBy("day")


@query(
    "q105_linear_attribution",
    oracle="""
    WITH nxt AS (
      SELECT user_id, ts, event_id, event_type,
             min(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS next_pts
      FROM events
    ),
    touch AS (
      SELECT user_id, event_type, next_pts,
             count(*) OVER (PARTITION BY user_id, next_pts) AS n
      FROM nxt
      WHERE event_type IN ('view', 'click')
        AND next_pts IS NOT NULL
        AND date_diff('second', ts, next_pts) <= 86400
    )
    SELECT event_type AS channel,
           CAST(count(*) AS BIGINT) AS n_touches,
           round(sum(1.0 / n), 2) AS attributed_conversions
    FROM touch GROUP BY event_type ORDER BY event_type
    """,
    tags=("relational", "attribution", "marketing"),
)
def q105(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution — the fair-share complement of q75's
    last-touch: every view/click in the 24 h before a user's next purchase
    splits that conversion's credit equally (1/n per touch). The
    next-purchase lookup is a running conditional MIN over a DESCENDING
    user window (the as-of-forward idiom — no self-join), the per-
    conversion touch count is a second window over the filtered touch rows,
    and the final rollup is channel-sized. Exchanges carry touch rows only;
    nothing joins."""
    ev = load_table(spark, sf_dir, "events")
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).over(w_next).alias("next_pts"),
    )
    touch = nxt.where(
        F.col("event_type").isin("view", "click")
        & F.col("next_pts").isNotNull()
        & (F.unix_seconds("next_pts") - F.unix_seconds("ts") <= 86400)
    ).withColumn(
        "n", F.count("*").over(Window.partitionBy("user_id", "next_pts"))
    )
    return (
        touch.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count("*").alias("n_touches"),
            F.round(F.sum(1.0 / F.col("n")), 2).alias("attributed_conversions"),
        )
        .orderBy("channel")
    )


@query(
    "q106_fifo_allocation",
    oracle="""
    WITH flow AS (
      SELECT user_id, ts, event_id,
             CAST(round("value" * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 'spend' ELSE 'grant' END
               AS side
      FROM events
      WHERE user_id < 50 AND event_type IN ('view', 'signup', 'purchase')
    ),
    g AS (
      SELECT user_id, ts, event_id, cents,
             sum(cents) OVER w - cents AS lo, sum(cents) OVER w AS hi
      FROM flow WHERE side = 'grant'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s AS (
      SELECT user_id, ts, event_id, cents,
             sum(cents) OVER w - cents AS lo, sum(cents) OVER w AS hi
      FROM flow WHERE side = 'spend'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    alloc AS (
      SELECT s.user_id,
             least(g.hi, s.hi) - greatest(g.lo, s.lo) AS qty,
             date_diff('second', g.ts, s.ts) AS age_s
      FROM s JOIN g ON g.user_id = s.user_id
                   AND g.lo < s.hi AND s.lo < g.hi
    ),
    spend_tot AS (
      SELECT user_id, sum(cents) AS spent FROM flow
      WHERE side = 'spend' GROUP BY user_id
    )
    SELECT t.user_id,
           round(t.spent / 100.0, 2) AS total_spend,
           round(coalesce(sum(a.qty), 0) / 100.0, 2) AS allocated,
           round((t.spent - coalesce(sum(a.qty), 0)) / 100.0, 2)
             AS unallocated,
           round(CASE WHEN coalesce(sum(a.qty), 0) > 0
                      THEN sum(a.qty * a.age_s) * 1.0 / sum(a.qty) END, 2)
             AS avg_age_s
    FROM spend_tot t LEFT JOIN alloc a ON a.user_id = t.user_id
    GROUP BY t.user_id, t.spent ORDER BY t.user_id
    """,
    tags=("relational", "fifo", "allocation"),
)
def q106(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO credit allocation — the cost-basis/lot-matching idiom (fintech
    FIFO accounting, inventory COGS): each user's purchases consume earlier
    view/signup 'credits' in strict arrival order. The classic row-at-a-time
    matching collapses to interval intersection on CUMULATIVE integer-cents
    ranges: grant i covers [G_{i-1}, G_i), spend j covers [S_{j-1}, S_j),
    and the allocation of j to i is the overlap — an equi-join on user plus
    a range predicate, no recursion, no loops. Integer cents make both
    engines' cumulative sums bit-identical, so join membership (the razor
    edge lo < hi) is deterministic. Per user: total spend, allocated,
    unallocated (spend past all credit), and the qty-weighted mean age of
    consumed credit."""
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("user_id") < 50)
        & F.col("event_type").isin("view", "signup", "purchase")
    )
    flow = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(F.col("event_type") == "purchase", "spend")
        .otherwise("grant")
        .alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    def cum_side(side: str, prefix: str) -> DataFrame:
        # filter FIRST: each side's cumulative range is over its own rows
        return (
            flow.where(F.col("side") == side)
            .withColumn("hi", F.sum("cents").over(w))
            .withColumn("lo", F.col("hi") - F.col("cents"))
            .select(
                "user_id",
                F.col("ts").alias(f"{prefix}_ts"),
                F.col("lo").alias(f"{prefix}_lo"),
                F.col("hi").alias(f"{prefix}_hi"),
            )
        )

    g = cum_side("grant", "g")
    s = cum_side("spend", "s")
    alloc = s.join(g, "user_id").where(
        (F.col("g_lo") < F.col("s_hi")) & (F.col("s_lo") < F.col("g_hi"))
    ).select(
        "user_id",
        (F.least("g_hi", "s_hi") - F.greatest("g_lo", "s_lo")).alias("qty"),
        (F.unix_seconds("s_ts") - F.unix_seconds("g_ts")).alias("age_s"),
    )
    spend_tot = (
        flow.where(F.col("side") == "spend")
        .groupBy("user_id")
        .agg(F.sum("cents").alias("spent"))
    )
    agg = alloc.groupBy("user_id").agg(
        F.sum("qty").alias("alloc_q"),
        F.sum(F.col("qty") * F.col("age_s")).alias("alloc_age"),
    )
    return (
        spend_tot.join(agg, "user_id", "left")
        .select(
            "user_id",
            F.round(F.col("spent") / 100.0, 2).alias("total_spend"),
            F.round(F.coalesce(F.col("alloc_q"), F.lit(0)) / 100.0, 2).alias(
                "allocated"
            ),
            F.round(
                (F.col("spent") - F.coalesce(F.col("alloc_q"), F.lit(0))) / 100.0, 2
            ).alias("unallocated"),
            F.round(
                F.when(
                    F.coalesce(F.col("alloc_q"), F.lit(0)) > 0,
                    F.col("alloc_age") * 1.0 / F.col("alloc_q"),
                ),
                2,
            ).alias("avg_age_s"),
        )
        .orderBy("user_id")
    )


@query(
    "q107_ab_test_chisquare",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
             max(CASE WHEN event_type = 'purchase' AND "value" > 150
                 THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT variant, conv, count(*) AS n FROM u GROUP BY 1, 2
    ),
    tot AS (
      SELECT sum(n) AS total,
             sum(CASE WHEN variant = 0 THEN n ELSE 0 END) AS r0,
             sum(CASE WHEN variant = 1 THEN n ELSE 0 END) AS r1,
             sum(CASE WHEN conv = 0 THEN n ELSE 0 END) AS c0,
             sum(CASE WHEN conv = 1 THEN n ELSE 0 END) AS c1,
             sum(CASE WHEN variant = 0 AND conv = 1 THEN n ELSE 0 END) AS a1,
             sum(CASE WHEN variant = 1 AND conv = 1 THEN n ELSE 0 END) AS b1
      FROM cells
    )
    SELECT CAST(r0 AS BIGINT) AS n_control, CAST(r1 AS BIGINT) AS n_treatment,
           round(CASE WHEN r0 > 0 THEN a1 * 1.0 / r0 END, 4)
             AS conv_rate_control,
           round(CASE WHEN r1 > 0 THEN b1 * 1.0 / r1 END, 4)
             AS conv_rate_treatment,
           round(CASE WHEN r0 * 1.0 * r1 * c0 * c1 > 0
                 THEN total * power(a1 * (r1 - b1) * 1.0 - b1 * (r0 - a1), 2)
                      / (r0 * 1.0 * r1 * c0 * c1) END, 4) AS chi2,
           coalesce(CASE WHEN r0 * 1.0 * r1 * c0 * c1 > 0
                 THEN total * power(a1 * (r1 - b1) * 1.0 - b1 * (r0 - a1), 2)
                      / (r0 * 1.0 * r1 * c0 * c1) END
                 > 3.841458820694124, false) AS significant
    FROM tot
    """,
    tags=("relational", "statistics", "hypothesis-test"),
)
def q107(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with a chi-square independence test — the
    hypothesis-testing member of the statistics family (q23 moments, q42
    correlation, q97 concentration): users split into deterministic
    variants (user_id parity = the hash-bucket assignment of a real
    experiment framework), conversion = any HIGH-VALUE purchase (> $150, ~5% of this fixture's exponential values —
    "any purchase" is degenerate here, every user has one, and a margin of
    zero never exercises the statistic), and the 2x2 chi-square
    uses the closed form N(ad-bc)^2/(r0 r1 c0 c1) on exact BIGINT cell
    counts (denominator promoted to DOUBLE — four ~1e5 marginals overflow
    int64), so both engines compute the identical statistic. A degenerate
    table (an empty margin, e.g. nobody unconverted) pins chi2 NULL and
    significant FALSE instead of a NULL verdict downstream alerting would
    silently skip. Verdict
    compares against the df=1, alpha=0.05 critical value (3.8415) — the
    p-value-free form every SQL engine can evaluate. Two aggregates total:
    per-user conversion flags, then four cells. The readout lives in
    functions.columns.ab_chisquare_readout, shared with the streaming A/B
    monitor so the two surfaces cannot drift formula-by-formula."""
    from guardian_for_apache_kafka_spark.functions.columns import (
        ab_chisquare_readout,
    )

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("conv")
    ).withColumn("variant", (F.col("user_id") % 2).cast("int"))
    return ab_chisquare_readout(u)


@query(
    "q108_subtree_rollup",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT c_custkey AS node,
             c_custkey - 1 - CAST(
               CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS UBIGINT)
               % CAST(c_custkey AS UBIGINT) AS BIGINT) AS parent,
             c_acctbal AS val
      FROM customer WHERE c_custkey >= 1
    ),
    up AS (
      SELECT node AS descendant, parent AS anc FROM e WHERE parent <> 0
      UNION
      SELECT u.descendant, e2.parent
      FROM up u JOIN e e2 ON u.anc = e2.node WHERE e2.parent <> 0
    )
    SELECT e.node,
           CAST(coalesce(d.n_desc, 0) AS BIGINT) AS n_desc,
           round(e.val + coalesce(d.desc_val, 0), 2) AS subtree_acctbal
    FROM e LEFT JOIN (
      SELECT u.anc AS node, count(*) AS n_desc, sum(e2.val) AS desc_val
      FROM up u JOIN e e2 ON e2.node = u.descendant GROUP BY u.anc
    ) d ON d.node = e.node
    WHERE e.node < 500
    ORDER BY e.node
    """,
    tags=("iterative", "hierarchy", "rollup"),
)
def q108(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials subtree rollup — every node's descendant count and
    subtree value total (the org-chart / BOM / category-tree aggregation) —
    without recursive CTEs: the transitive closure comes from PATH DOUBLING
    (reach o reach per round, ceil(log2 depth) rounds; the same iterative
    family as q47's depths and d7's components), then ONE join attaches
    descendant values and ONE aggregate rolls them up. The closure is
    n x avg_depth rows (~12x nodes on this O(log n)-deep forest), so the
    rollup never materializes per-level scans. DuckDB replays the walk with
    a real recursive CTE, attesting every (count, total) pair
    (operators/hierarchy.ancestor_closure)."""
    from guardian_for_apache_kafka_spark.operators.hierarchy import (
        ancestor_closure,
        synthetic_parent,
    )

    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") >= 1)
    nodes = c.select(
        F.col("c_custkey").cast("long").alias("node"),
        synthetic_parent(F.col("c_custkey")).cast("long").alias("parent"),
        F.col("c_acctbal").alias("val"),
    )
    closure = ancestor_closure(nodes)
    rolled = (
        closure.join(
            nodes.select(F.col("node").alias("descendant"), "val"),
            closure.node == F.col("descendant"),
        )
        .groupBy(F.col("anc").alias("rnode"))
        .agg(F.count("*").alias("n_desc"), F.sum("val").alias("desc_val"))
    )
    return (
        nodes.join(rolled, nodes.node == F.col("rnode"), "left")
        .where(F.col("node") < 500)
        .select(
            "node",
            F.coalesce("n_desc", F.lit(0)).cast("long").alias("n_desc"),
            F.round(
                F.col("val") + F.coalesce("desc_val", F.lit(0.0)), 2
            ).alias("subtree_acctbal"),
        )
        .orderBy("node")
    )


@query(
    "q109_psi_drift",
    oracle="""
    WITH binned AS (
      SELECT CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                  THEN 'base' ELSE 'current' END AS period,
             greatest(least(CAST(floor("value" / 100.0) AS BIGINT), 9), 0) AS bin
      FROM events
    ),
    cnt AS (
      SELECT period, bin, count(*) AS n FROM binned GROUP BY 1, 2
    ),
    tot AS (SELECT period, sum(n) AS t FROM cnt GROUP BY 1),
    grid AS (
      SELECT b.bin, p.period, coalesce(t.t, 0) AS t
      FROM (SELECT CAST(g AS BIGINT) AS bin FROM generate_series(0, 9) s(g)) b
      CROSS JOIN (VALUES ('base'), ('current')) p(period)
      LEFT JOIN tot t ON t.period = p.period
    ),
    smoothed AS (
      SELECT g.period, g.bin,
             (coalesce(c.n, 0) + 0.5) / (g.t + 5.0) AS prob
      FROM grid g LEFT JOIN cnt c
        ON c.bin = g.bin AND c.period = g.period
    ),
    terms AS (
      SELECT bin,
             max(CASE WHEN period = 'base' THEN prob END) AS p,
             max(CASE WHEN period = 'current' THEN prob END) AS q
      FROM smoothed GROUP BY bin
    )
    SELECT CAST(bin AS INT) AS bin,
           round(p, 6) AS p_base, round(q, 6) AS p_current,
           round((q - p) * ln(q / p), 6) AS psi_term,
           round(sum((q - p) * ln(q / p)) OVER (), 4) AS psi_total
    FROM terms ORDER BY bin
    """,
    tags=("relational", "drift", "monitoring"),
)
def q109(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report — the standard ML-ops check
    that a feature's distribution hasn't shifted between a baseline window
    and now: value binned into fixed $100 buckets (capped at bin 9 so the
    bin set is schema-stable), additive smoothing (+0.5 per bin over +5
    total — Laplace over the 10-bin domain) so an empty bin contributes a
    finite term instead of log(0), PSI = sum (q-p) ln(q/p). One scan, two
    tiny aggregates, the total as a window over 10 rows; rule of thumb
    PSI > 0.2 = investigate. Smoothing constants are part of the declared
    contract (the oracle replays them exactly). The report itself lives in
    functions.columns.psi_report, shared with the streaming drift monitor
    so the two surfaces cannot drift formula-by-formula."""
    from guardian_for_apache_kafka_spark.functions.columns import psi_report

    ev = load_table(spark, sf_dir, "events")
    binned = ev.select(
        F.when(
            F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"), "base"
        )
        .otherwise("current")
        .alias("period"),
        F.greatest(F.least(F.floor(F.col("value") / 100.0), F.lit(9)), F.lit(0))
        .cast("long")
        .alias("bin"),
    )
    cnt = binned.groupBy("period", "bin").agg(F.count("*").alias("n"))
    return psi_report(cnt)


@query(
    "q110_retention_halflife",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(date_trunc('week', CAST(ts AS DATE))) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS DATE)) AS active_week
      FROM events
    ),
    curve AS (
      SELECT f.cohort_week,
             datediff('week', f.cohort_week, a.active_week) AS week_offset,
             count(DISTINCT a.user_id) AS n_active
      FROM activity a JOIN firsts f USING (user_id)
      GROUP BY 1, 2
    ),
    sized AS (
      SELECT cohort_week, week_offset, n_active,
             max(CASE WHEN week_offset = 0 THEN n_active END)
               OVER (PARTITION BY cohort_week) AS cohort_size
      FROM curve
    ),
    fit AS (
      SELECT cohort_week, CAST(max(cohort_size) AS BIGINT) AS cohort_size,
             CAST(count(*) AS BIGINT) AS n_points,
             regr_slope(ln(n_active * 1.0 / cohort_size), week_offset)
               AS slope
      FROM sized WHERE week_offset >= 1
      GROUP BY cohort_week HAVING count(*) >= 2
    )
    SELECT CAST(cohort_week AS DATE) AS cohort_week, cohort_size, n_points,
           round(slope, 4) AS decay_slope,
           round(CASE WHEN slope < 0 THEN -ln(2) / slope END, 2)
             AS half_life_weeks
    FROM fit ORDER BY cohort_week
    """,
    tags=("relational", "retention", "regression"),
)
def q110(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention HALF-LIFE per cohort: fit ln(retention) ~ week_offset by
    least squares over q51's retention curve (offsets >= 1 — week 0 is the
    anchor, retention 1 by definition) and convert the decay slope to a
    half-life, -ln(2)/slope — the single number a growth team tracks where
    q51 gives the full matrix. regr_slope on exact counts; cohorts with
    fewer than 2 curve points can't be fit and are excluded (attested by
    the oracle's HAVING); a non-decaying cohort (slope >= 0) reports NULL
    half-life rather than a negative one. Everything past the q51 rollup is
    cohort-sized."""
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.to_date("ts")).cast("date")
    activity = ev.select("user_id", week.alias("active_week")).distinct()
    firsts = activity.groupBy("user_id").agg(F.min("active_week").alias("cohort_week"))
    curve = (
        activity.join(F.broadcast(firsts), "user_id")
        .groupBy(
            "cohort_week",
            # active_week / cohort_week are already week-truncated dates
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    sized = curve.withColumn(
        "cohort_size",
        F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(
            Window.partitionBy("cohort_week")
        ),
    )
    fit = (
        sized.where(F.col("week_offset") >= 1)
        .groupBy("cohort_week")
        .agg(
            F.max("cohort_size").cast("long").alias("cohort_size"),
            F.count("*").cast("long").alias("n_points"),
            F.regr_slope(
                F.log(F.col("n_active") * 1.0 / F.col("cohort_size")),
                F.col("week_offset").cast("double"),
            ).alias("slope"),
        )
        .where(F.col("n_points") >= 2)
    )
    return fit.select(
        "cohort_week",
        "cohort_size",
        "n_points",
        F.round("slope", 4).alias("decay_slope"),
        F.round(
            F.when(F.col("slope") < 0, -F.log(F.lit(2.0)) / F.col("slope")),
            2,
        ).alias("half_life_weeks"),
    ).orderBy("cohort_week")


@query(
    "q111_ipf_raking",
    oracle="""
    WITH cells AS (
      SELECT c_nationkey AS i, c_mktsegment AS j, count(*) * 1.0 AS n
      FROM customer GROUP BY 1, 2
    ),
    tgt AS (
      SELECT sum(n) / count(DISTINCT i) AS r,
             sum(n) / count(DISTINCT j) AS c
      FROM cells
    ),
    r1 AS (
      SELECT i, j, n, r, c,
             n * (r / sum(n) OVER (PARTITION BY i)) / n AS w
      FROM cells, tgt
    ),
    c1 AS (
      SELECT i, j, n, r, c,
             w * (c / sum(w * n) OVER (PARTITION BY j)) AS w
      FROM r1
    ),
    r2 AS (
      SELECT i, j, n, r, c,
             w * (r / sum(w * n) OVER (PARTITION BY i)) AS w
      FROM c1
    ),
    c2 AS (
      SELECT i, j, n, r, c,
             w * (c / sum(w * n) OVER (PARTITION BY j)) AS w
      FROM r2
    ),
    r3 AS (
      SELECT i, j, n, r, c,
             w * (r / sum(w * n) OVER (PARTITION BY i)) AS w
      FROM c2
    ),
    c3 AS (
      SELECT i, j, n, r, c,
             w * (c / sum(w * n) OVER (PARTITION BY j)) AS w
      FROM r3
    )
    SELECT CAST(i AS BIGINT) AS nation, j AS segment,
           CAST(n AS BIGINT) AS n,
           round(w, 6) AS weight, round(w * n, 2) AS fitted
    FROM c3 ORDER BY nation, segment
    """,
    tags=("relational", "iterative", "raking", "weighting"),
)
def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking) — the survey-weighting /
    post-stratification standard: fit per-cell weights over the
    (nation x segment) contingency table so BOTH marginals match uniform
    targets, by alternately rescaling rows and columns (3 rounds; IPF's
    geometric convergence makes that plenty at this table's skew). The
    iterative-family member where the state is a WEIGHT per cell rather
    than a rank (q59) or a pointer (q47); every round is two window sums
    over the CELL table — contingency-table-sized, never the fact table,
    so at 100 TB only the first groupBy touches raw data. The oracle
    unrolls all six rescalings exactly."""
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy(
        F.col("c_nationkey").alias("i"), F.col("c_mktsegment").alias("j")
    ).agg((F.count("*") * 1.0).alias("n"))
    tgt = cells.agg(
        (F.sum("n") / F.count_distinct("i")).alias("r"),
        (F.sum("n") / F.count_distinct("j")).alias("c"),
    )
    cur = cells.crossJoin(F.broadcast(tgt)).withColumn("w", F.lit(1.0))
    wi = Window.partitionBy("i")
    wj = Window.partitionBy("j")
    for _ in range(3):
        cur = cur.withColumn(
            "w", F.col("w") * (F.col("r") / F.sum(F.col("w") * F.col("n")).over(wi))
        )
        cur = cur.withColumn(
            "w", F.col("w") * (F.col("c") / F.sum(F.col("w") * F.col("n")).over(wj))
        )
    return cur.select(
        F.col("i").cast("long").alias("nation"),
        F.col("j").alias("segment"),
        F.col("n").cast("long").alias("n"),
        F.round("w", 6).alias("weight"),
        F.round(F.col("w") * F.col("n"), 2).alias("fitted"),
    ).orderBy("nation", "segment")


@query(
    "q112_benford_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor("value" * 100) AS BIGINT) AS VARCHAR), 1, 1)
             AS INT) AS digit
      FROM events WHERE "value" >= 0.01
    ),
    obs AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
    tot AS (SELECT sum(n) AS t FROM obs)
    SELECT digit, CAST(n AS BIGINT) AS n,
           round(n * 1.0 / t, 4) AS observed_p,
           round(ln(1.0 + 1.0 / digit) / ln(10.0), 4) AS benford_p,
           round(power(n * 1.0 / t - ln(1.0 + 1.0 / digit) / ln(10.0), 2)
                 / (ln(1.0 + 1.0 / digit) / ln(10.0)), 6) AS gof_term
    FROM obs, tot ORDER BY digit
    """,
    tags=("relational", "data-quality", "benford"),
)
def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit — the forensic data-quality classic:
    natural multi-scale amounts follow P(d) = log10(1 + 1/d); fabricated or
    truncated feeds don't. First digits come from the integer-cents string
    (floor(value*100), so sub-dollar amounts keep their leading digit and
    the digit extraction is exact in both engines); per digit: observed vs
    Benford share and the chi-square goodness-of-fit term. One scan, one
    9-row aggregate. This fixture's exponential values WON'T be Benford-
    perfect — the point of the report is the deviation, not a verdict."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.where(F.col("value") >= 0.01).select(
        F.substring(
            F.floor(F.col("value") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count("*").alias("n"))
    tot = obs.agg(F.sum("n").alias("t"))
    benford = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    p = F.col("n") * 1.0 / F.col("t")
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            F.round(p, 4).alias("observed_p"),
            F.round(benford, 4).alias("benford_p"),
            F.round(F.pow(p - benford, 2) / benford, 6).alias("gof_term"),
        )
        .orderBy("digit")
    )


@query(
    "q113_peak_concurrency",
    oracle="""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL 300 SECOND AS e FROM events
    ),
    pts AS (
      SELECT s AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT e AS t, -1 AS delta FROM iv
    ),
    swept AS (
      SELECT CAST(date_trunc('day', t) AS DATE) AS day, t,
             sum(delta) OVER (ORDER BY t, delta DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS live
      FROM pts
    ),
    daily AS (
      SELECT day, max(live) AS peak FROM swept GROUP BY day
    )
    SELECT d.day, CAST(d.peak AS BIGINT) AS peak,
           min(s.t) AS first_peak_at
    FROM daily d JOIN swept s ON s.day = d.day AND s.live = d.peak
    GROUP BY d.day, d.peak ORDER BY d.day
    """,
    tags=("relational", "sweep-line", "concurrency"),
)
def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency by sweep line — the capacity-planning classic (max
    simultaneous sessions/connections/jobs): every activity window
    [ts, ts+5min) becomes a +1/-1 boundary point, a single running sum over
    the time-ordered points is the live count, and the per-day max is the
    peak (with its first occurrence). The self-join alternative
    (intervals x intervals overlap count) is quadratic; the sweep is one
    sort. Tie order (delta DESC at equal timestamps: starts before ends)
    makes touching intervals count as overlapping — the inclusive
    convention, pinned identically in the oracle.

    Scale note (the two-pass sweep, round 7): the running sum is a GLOBAL
    property, but it is NOT computed with a global window. The boundary
    points are range-partitioned on the exact sweep order (t ASC, delta
    DESC — ties never straddle a partition), each partition computes its
    own running sum in parallel (window keyed by spark_partition_id), and
    the global count is recovered by adding the exclusive prefix of
    per-partition delta totals — a partition-count-sized table (the only
    single-partition window runs over those ~n_parts rows) broadcast back
    onto the stream. Identical output to the single-sort sweep, but the
    widest sort is 1/n_parts of the corpus; at 1000 executors every pass
    stays parallel. Plan pinned by
    test_q113_sweep_is_partition_parallel; shared core
    operators/timeseries.sweep_daily_peaks (the streaming twin
    stream_concurrency_points accumulates the same points incrementally)."""
    from guardian_for_apache_kafka_spark.operators.timeseries import sweep_daily_peaks

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 300 SECOND")).alias("e"),
    )
    pts = iv.select(F.col("s").alias("t"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    return sweep_daily_peaks(pts)


@query(
    "q114_clamped_balance",
    oracle="""
    WITH RECURSIVE flow AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'purchase'
                  THEN -CAST(round("value" * 100) AS BIGINT)
                  ELSE CAST(round("value" * 100) AS BIGINT) END AS delta,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
      WHERE user_id < 10 AND event_type IN ('view', 'signup', 'purchase')
    ),
    walk AS (
      SELECT user_id, event_id, ts, rn,
             greatest(CAST(0 AS BIGINT), delta) AS bal
      FROM flow WHERE rn = 1
      UNION ALL
      SELECT f.user_id, f.event_id, f.ts, f.rn,
             greatest(CAST(0 AS BIGINT), w.bal + f.delta)
      FROM walk w JOIN flow f
        ON f.user_id = w.user_id AND f.rn = w.rn + 1
    )
    SELECT user_id, event_id, round(bal / 100.0, 2) AS balance
    FROM walk ORDER BY user_id, event_id
    """,
    tags=("relational", "sequential", "balance", "arrow"),
)
def q114(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped running balance — credits accrue (view/signup), purchases
    draw down, and the balance FLOORS at zero: b_i = max(0, b_{i-1} + x_i).
    Unlike q64's reset-on-event balances (expressible as segmented
    windows), the clamp feeds back into every subsequent step, so NO window
    formulation exists — this is the engine's showcase for the
    applyInPandas escape hatch: per-user Arrow batches, a sequential
    integer-cents fold inside, nothing but (user) partitioning outside. The
    oracle walks the identical recurrence with a recursive CTE row-by-row,
    so the fold's clamp arithmetic is differentially attested. Integer
    cents make every step exact in both engines."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").where(
        (F.col("user_id") < 10)
        & F.col("event_type").isin("view", "signup", "purchase")
    )
    flow = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.col("event_type") == "purchase",
            -F.round(F.col("value") * 100).cast("long"),
        )
        .otherwise(F.round(F.col("value") * 100).cast("long"))
        .alias("delta"),
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        bal, out = 0, []
        for d in pdf["delta"]:
            bal = max(0, bal + int(d))
            out.append(bal)
        pdf = pdf[["user_id", "event_id"]].copy()
        pdf["bal"] = out
        return pdf

    res = flow.groupBy("user_id").applyInPandas(
        walk, "user_id long, event_id long, bal long"
    )
    return res.select(
        "user_id",
        "event_id",
        F.round(F.col("bal") / 100.0, 2).alias("balance"),
    ).orderBy("user_id", "event_id")


@query(
    "q115_abc_pareto",
    oracle="""
    WITH rev AS (
      -- per-ROW integer ten-thousandths: cents * (100 - disc_pct) is an
      -- exact integer < 2^53, so round() is never near a .5 tie and both
      -- engines quantize identically; every downstream sum is BIGINT
      SELECT l_partkey AS part,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                      AS BIGINT)) AS rq
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT part, rq,
             sum(rq) OVER (ORDER BY rq DESC, part
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               * 1.0 / sum(rq) OVER () AS cum_share
      FROM rev
    ),
    classed AS (
      SELECT part, rq,
             CASE WHEN cum_share <= 0.8 THEN 'A'
                  WHEN cum_share <= 0.95 THEN 'B'
                  ELSE 'C' END AS klass
      FROM ranked
    )
    SELECT klass,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(rq) / 10000.0, 2) AS revenue,
           round(sum(rq) * 1.0 / (SELECT sum(rq) FROM rev), 4) AS revenue_share
    FROM classed GROUP BY klass ORDER BY klass
    """,
    tags=("relational", "pareto", "abc-analysis"),
)
def q115(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification — rank parts by revenue,
    classify by CUMULATIVE share (A holds the first 80%, B to 95%, C the
    tail): the 80/20 working-capital lens q97's Gini summarizes as one
    number, materialized as the three bands planners actually act on.
    The running share is computed with the partition-parallel two-pass
    prefix sum (operators/layout.global_running_sum — the generalized
    q113 sweep), so even a billion-part catalog never funnels through a
    single-partition WindowExec: the widest sort is 1/n_parts of the part
    table, and the only single-partition window runs over the n_parts-row
    offset table. Ties pinned by part key. Revenue is quantized to integer
    ten-thousandths PER ROW before any summation (ADVICE r7: the two-pass
    prefix sum re-associates float additions, so a double cum could differ
    in ulps from the oracle's sequential window and flip a boundary part's
    class with the partition count; cents * (100 - disc_pct) is an exact
    integer < 2^53, so the quantization itself is engine-identical and
    every cumulative is integer-exact). Three rows out, each class's
    population and exact revenue share (the final rollup windows run over
    exactly 3 rows)."""
    from guardian_for_apache_kafka_spark.operators.layout import global_running_sum

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)
            .cast("long")
        ).alias("rq")
    )
    tot = rev.agg(F.sum("rq").alias("tr"))
    cum = global_running_sum(rev, [F.desc("rq"), F.col("part")], "rq", out="cum")
    classed = cum.crossJoin(F.broadcast(tot)).select(
        "rq",
        F.when(F.col("cum") / F.col("tr") <= 0.8, "A")
        .when(F.col("cum") / F.col("tr") <= 0.95, "B")
        .otherwise("C")
        .alias("klass"),
        "tr",
    )
    return (
        classed.groupBy("klass")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.round(F.sum("rq") / 10000.0, 2).alias("revenue"),
            F.round(F.sum("rq") / F.first("tr"), 4).alias("revenue_share"),
        )
        .orderBy("klass")
    )


@query(
    "q116_linear_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE))
               AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    sums AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM daily GROUP BY 1
    )
    SELECT event_type,
           n AS n_days,
           round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6) AS slope,
           round((sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx) * 1.0
                 / (n * (n * sxx - sx * sx)), 6) AS intercept,
           round(((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx))
                 * ((n * sxy - sx * sy) * 1.0 / (n * syy - sy * sy)), 6) AS r2
    FROM sums ORDER BY event_type
    """,
    tags=("relational", "regression", "trend"),
)
def q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series OLS linear trend — the capacity-forecasting one-liner
    (is traffic growing, and how fast?): daily event counts per type,
    least-squares slope/intercept/R^2 against the day index. The moment
    sums (n, Σx, Σy, Σxx, Σyy, Σxy) are BIGINT-exact — x is a small day
    offset, y an integer count, so every product fits in int64 and the
    normal-equation numerators/denominators are computed in exact integer
    arithmetic; floating point enters only in the final divisions, in a
    fixed association both engines share (slope = num/dx; r2 =
    (num/dx)*(num/dy); intercept keeps one exact integer numerator). This
    sidesteps the cross-engine summation-order hazard that regr_slope /
    regr_r2 built-ins carry (Welford vs naive moment accumulation differ
    in final ulps). Plan: two hash aggregates (day rollup, then 5-row
    moment rollup) — the day rollup is the only corpus-sized exchange, and
    partial aggregation makes it map-side combined."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date(F.date_trunc("day", F.col("ts"))), F.lit("2024-01-01").cast("date")).alias("x"),
    ).agg(F.count("*").alias("y"))
    s = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(num * 1.0 / dx, 6).alias("slope"),
        F.round(
            (F.col("sy") * dx - num * F.col("sx")) * 1.0 / (F.col("n") * dx), 6
        ).alias("intercept"),
        F.round((num * 1.0 / dx) * (num * 1.0 / dy), 6).alias("r2"),
    ).orderBy("event_type")


@query(
    "q117_decile_lift",
    oracle="""
    WITH u AS (
      SELECT user_id,
             sum(CASE WHEN event_type <> 'purchase'
                      THEN CAST(round("value" * 100) AS BIGINT)
                      ELSE 0 END) AS score_cents,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY 1
    ),
    deciled AS (
      SELECT user_id, score_cents, converted,
             ntile(10) OVER (ORDER BY score_cents DESC, user_id) AS decile
      FROM u
    ),
    agg AS (
      SELECT decile,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(converted) AS BIGINT) AS n_converted
      FROM deciled GROUP BY 1
    )
    SELECT decile, n_users, n_converted,
           round(n_converted * 1.0 / n_users, 4) AS conv_rate,
           round((n_converted * 1.0 / n_users)
                 / (sum(n_converted) OVER () * 1.0 / sum(n_users) OVER ()), 4)
             AS lift,
           round(sum(n_converted) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 * 1.0 / sum(n_converted) OVER (), 4) AS cum_capture
    FROM agg ORDER BY decile
    """,
    tags=("relational", "lift", "gains-chart"),
)
def q117(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / cumulative-gains chart — the model-evaluation classic
    (does engagement spend rank users by conversion propensity?): users
    score by non-purchase engagement value (INTEGER CENTS, so the
    per-user sum is exact and the ntile order has no float ambiguity),
    label by whether they ever purchased; ntile(10) over (score DESC,
    user_id) buckets them, and each decile reports conversion rate, lift
    over the base rate, and cumulative capture. The ntile tie-break is a
    total order, so both engines bucket identically. Plan: one user
    aggregate (corpus-sized exchange, map-side combined); the bucketing
    is the ADAPTIVE operators/layout.ntile_by_rank — below the
    small-input threshold it is the plain ntile window (this fixture's
    1.5k users: the two-pass machinery's fixed overhead measured 2.9x
    the plain sort), above it the two-pass prefix rank + closed-form
    bucket, so a billion-user table never funnels through one WindowExec
    task. Both paths emit identical buckets (pinned against the builtin
    for ragged sizes). The final gains windows run over 10 rows."""
    from guardian_for_apache_kafka_spark.operators.layout import ntile_by_rank

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") != "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("score_cents"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    deciled = ntile_by_rank(
        u, [F.desc("score_cents"), F.col("user_id")], buckets=10, out="decile"
    ).select("converted", "decile")
    agg = deciled.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rate = F.col("n_converted") * 1.0 / F.col("n_users")
    base = F.sum("n_converted").over(w_all) * 1.0 / F.sum("n_users").over(w_all)
    return agg.select(
        "decile",
        "n_users",
        "n_converted",
        F.round(rate, 4).alias("conv_rate"),
        F.round(rate / base, 4).alias("lift"),
        F.round(
            F.sum("n_converted").over(w_cum) * 1.0 / F.sum("n_converted").over(w_all),
            4,
        ).alias("cum_capture"),
    ).orderBy("decile")


@query(
    "q118_cohort_ltv",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1
    ),
    cohorts AS (
      SELECT user_id,
             date_diff('day', DATE '2024-01-01',
                       CAST(date_trunc('day', first_ts) AS DATE)) // 7
               AS cohort_week
      FROM first_seen
    ),
    sizes AS (
      SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
      FROM cohorts GROUP BY 1
    ),
    rev AS (
      SELECT c.cohort_week,
             date_diff('day', DATE '2024-01-01',
                       CAST(date_trunc('day', e.ts) AS DATE)) // 7
               - c.cohort_week AS age_weeks,
             sum(CAST(round(e."value" * 100) AS BIGINT)) AS rev_cents
      FROM events e JOIN cohorts c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT r.cohort_week, r.age_weeks, s.cohort_users,
           round(r.rev_cents / 100.0, 2) AS revenue,
           round(sum(r.rev_cents) OVER (PARTITION BY r.cohort_week
                   ORDER BY r.age_weeks
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / 100.0 / s.cohort_users, 4) AS cum_ltv_per_user
    FROM rev r JOIN sizes s ON s.cohort_week = r.cohort_week
    ORDER BY r.cohort_week, r.age_weeks
    """,
    tags=("relational", "cohort", "ltv"),
)
def q118(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value — q51's retention triangle with MONEY in the
    cells: users cohort by first-seen week, purchase revenue rolls up by
    (cohort, weeks-since-acquisition), and the running per-user cumulative
    LTV is the payback-period curve finance actually reads. Integer-cents
    revenue keeps every sum exact; the cumulative window runs per cohort
    over at most |weeks| rows. Plan: one user-level min (map-side
    combined), a purchases join back to cohorts on user_id (AQE broadcasts
    the cohort side when small; at 100 TB it shuffles on user_id — the
    same key both sides already aggregate on), then a triangle-sized
    rollup and window."""
    ev = load_table(spark, sf_dir, "events")
    week = lambda c: F.floor(
        F.datediff(
            F.to_date(F.date_trunc("day", c)), F.lit("2024-01-01").cast("date")
        )
        / 7
    )
    cohorts = ev.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_users")
    )
    rev = (
        ev.where(F.col("event_type") == "purchase")
        .join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (week(F.col("ts")) - F.col("cohort_week")).alias("age_weeks"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev_cents"))
    )
    w_cum = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rev.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "age_weeks",
            "cohort_users",
            F.round(F.col("rev_cents") / 100.0, 2).alias("revenue"),
            F.round(
                F.sum("rev_cents").over(w_cum) / 100.0 / F.col("cohort_users"), 4
            ).alias("cum_ltv_per_user"),
        )
        .orderBy("cohort_week", "age_weeks")
    )


@query(
    "q119_autocorrelation",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE))
               AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(y) AS s, sum(y * y) AS q
      FROM daily GROUP BY 1
    ),
    pairs AS (
      SELECT d1.event_type, k.k,
             sum(d1.y * d2.y) AS p,
             sum(d1.y) AS a, sum(d2.y) AS b,
             CAST(count(*) AS BIGINT) AS npairs
      FROM daily d1
      JOIN range(1, 8) k(k) ON true
      JOIN daily d2 ON d2.event_type = d1.event_type AND d2.x = d1.x + k.k
      GROUP BY 1, 2
    )
    SELECT p.event_type, CAST(p.k AS INT) AS lag,
           p.npairs AS n_pairs,
           round((t.n * t.n * p.p - t.n * t.s * (p.a + p.b)
                  + p.npairs * t.s * t.s) * 1.0
                 / (t.n * t.n * t.q - t.n * t.s * t.s), 6) AS acf
    FROM pairs p JOIN tot t ON t.event_type = p.event_type
    ORDER BY p.event_type, lag
    """,
    tags=("relational", "timeseries", "autocorrelation"),
)
def q119(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (lags 1-7) of daily event counts per type
    — the seasonality detector behind q104's decomposition (a weekly cycle
    shows as an acf spike at lag 7; white noise hovers near zero). The
    standard ACF estimator r_k = sum((y_t - mean)(y_{t+k} - mean)) /
    sum((y_t - mean)^2) is computed in EXACT BIGINT arithmetic by scaling
    through n^2 (the q116 trick): numerator n^2*P_k - n*S*(A_k + B_k) +
    npairs*S^2, denominator n^2*Q - n*S^2 — every term a product of
    integer day-count sums, one double division at the end. Calendar gaps
    drop pairs on both engines identically (the lag join is on x + k).
    Plan: one corpus-sized day rollup, then everything runs on the
    |days x types| table — the lag self-join and the 7-way lag fan-out
    are day-table-sized, broadcast-friendly, constant cost at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.to_date(F.date_trunc("day", F.col("ts"))),
            F.lit("2024-01-01").cast("date"),
        ).alias("x"),
    ).agg(F.count("*").alias("y"))
    tot = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("q"),
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("k"))
    d1 = daily.alias("d1")
    d2 = daily.alias("d2")
    pairs = (
        d1.crossJoin(F.broadcast(lags))
        .join(
            d2,
            (F.col("d2.event_type") == F.col("d1.event_type"))
            & (F.col("d2.x") == F.col("d1.x") + F.col("k")),
        )
        .groupBy(F.col("d1.event_type").alias("event_type"), "k")
        .agg(
            F.sum(F.col("d1.y") * F.col("d2.y")).alias("p"),
            F.sum(F.col("d1.y")).alias("a"),
            F.sum(F.col("d2.y")).alias("b"),
            F.count("*").cast("long").alias("npairs"),
        )
    )
    j = pairs.join(tot, "event_type")
    num = (
        F.col("n") * F.col("n") * F.col("p")
        - F.col("n") * F.col("s") * (F.col("a") + F.col("b"))
        + F.col("npairs") * F.col("s") * F.col("s")
    )
    den = F.col("n") * F.col("n") * F.col("q") - F.col("n") * F.col("s") * F.col("s")
    return j.select(
        "event_type",
        F.col("k").cast("int").alias("lag"),
        F.col("npairs").alias("n_pairs"),
        F.round(num * 1.0 / den, 6).alias("acf"),
    ).orderBy("event_type", "lag")


@query(
    "q120_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE))
               AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    walked AS (
      SELECT event_type, x, y,
             sum(y) OVER w AS c,
             row_number() OVER w AS t,
             sum(y) OVER (PARTITION BY event_type) AS s,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    scored AS (
      SELECT event_type, x, n,
             abs(n * c - t * s) AS stat,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(n * c - t * s) DESC, x) AS rn
      FROM walked
    )
    SELECT event_type, CAST(x AS INT) AS change_day,
           CAST(stat AS BIGINT) AS cusum_stat,
           round(stat * 1.0 / n, 2) AS mean_shift_mass
    FROM scored WHERE rn = 1 ORDER BY event_type
    """,
    tags=("relational", "timeseries", "changepoint"),
)
def q120(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event series — the monitoring
    primitive that answers "WHEN did the rate change": the scaled CUSUM
    statistic |n*C_t - t*S| (C_t = running count sum, S = total, both
    BIGINT-exact, so the argmax is integer arithmetic with ties broken to
    the earlier day) peaks at the most likely mean-shift point; dividing
    by n recovers the classic max|C_t - t*mean| mass. On this fixture's
    stationary series the peak is noise-sized — the point is the
    detector's exactness, pinned differentially. Plan: one corpus-sized
    day rollup; the windows and the argmax run over the |days x types|
    table, partitioned BY SERIES (no global window anywhere). The
    detector core is operators/timeseries.cusum_changepoints, shared
    verbatim with the streaming twin (stream_daily_count_points +
    cusum_rollup)."""
    from guardian_for_apache_kafka_spark.operators.timeseries import (
        cusum_changepoints,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.to_date(F.date_trunc("day", F.col("ts"))),
            F.lit("2024-01-01").cast("date"),
        ).alias("x"),
    ).agg(F.count("*").alias("y"))
    return cusum_changepoints(daily)


@query(
    "q121_l_diversity",
    oracle="""
    WITH cls AS (
      SELECT user_id // 100 AS user_band,
             date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE))
               AS day,
             event_type,
             count(*) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    per_class AS (
      SELECT user_band, day,
             CAST(sum(n) AS BIGINT) AS n_records,
             CAST(count(*) AS BIGINT) AS distinct_sensitive
      FROM cls GROUP BY 1, 2
    )
    SELECT user_band, CAST(day AS INT) AS day, n_records, distinct_sensitive,
           distinct_sensitive >= 3 AS meets_l
    FROM per_class
    ORDER BY user_band, day
    """,
    tags=("relational", "privacy", "l-diversity"),
)
def q121(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit (l=3) — k-anonymity's (q103) sibling
    check: a release is UNSAFE when an equivalence class is large enough
    for k yet homogeneous in its SENSITIVE attribute (everyone in the
    class shares the diagnosis/action, so membership alone leaks it).
    Quasi-identifiers here: (user-id band, day); sensitive attribute:
    event_type; each class reports size, distinct sensitive values, and
    the l >= 3 verdict. One scan, two aggregates (the class-type rollup
    is the only corpus-sized exchange, map-side combined). At 100 TB the
    class table is |bands x days| — the audit itself is free."""
    ev = load_table(spark, sf_dir, "events")
    cls = ev.groupBy(
        F.expr("user_id div 100").alias("user_band"),
        F.datediff(
            F.to_date(F.date_trunc("day", F.col("ts"))),
            F.lit("2024-01-01").cast("date"),
        ).alias("day"),
        "event_type",
    ).agg(F.count("*").alias("n"))
    return (
        cls.groupBy("user_band", "day")
        .agg(
            F.sum("n").cast("long").alias("n_records"),
            F.count("*").cast("long").alias("distinct_sensitive"),
        )
        .select(
            "user_band",
            F.col("day").cast("int").alias("day"),
            "n_records",
            "distinct_sensitive",
            (F.col("distinct_sensitive") >= 3).alias("meets_l"),
        )
        .orderBy("user_band", "day")
    )


@query(
    "q122_auc_mann_whitney",
    oracle="""
    WITH u AS (
      SELECT user_id,
             sum(CASE WHEN event_type <> 'purchase'
                      THEN CAST(round("value" * 100) AS BIGINT) ELSE 0 END)
               AS score,
             max(CASE WHEN event_type = 'purchase' AND "value" > 150
                      THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY 1
    ),
    dom AS (
      SELECT score,
             CAST(sum(y) AS BIGINT) AS pos,
             CAST(sum(1 - y) AS BIGINT) AS neg
      FROM u GROUP BY score
    ),
    walked AS (
      SELECT score, pos, neg,
             coalesce(sum(pos + neg) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM dom
    ),
    sums AS (
      SELECT sum(pos * (2 * below + pos + neg + 1)) AS two_ranksum_pos,
             sum(pos) AS np, sum(neg) AS nn
      FROM walked
    )
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           round((two_ranksum_pos - np * (np + 1)) * 1.0 / (2 * np * nn), 6)
             AS auc,
           round((two_ranksum_pos - np * (np + 1)) * 1.0 / (np * nn) - 1, 6)
             AS gini
    FROM sums
    """,
    tags=("relational", "ml-eval", "auc"),
)
def q122(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC-ROC by the Mann-Whitney rank-sum — the model-eval
    statistic q117's decile table eyeballs, computed exactly: does
    engagement spend rank BIG-TICKET purchasers (any purchase over $150 —
    both classes populated at every sf) above the rest? Midrank tie
    handling comes free from the VALUE-DOMAIN formulation (the q101
    trick): scores aggregate to (score, pos, neg) first, the running
    below-count walks that tiny domain table (the only ordered window —
    domain-sized, never user-sized), and the rank-sum of positives is
    2*R+ = sum(pos * (2*below + pos + neg + 1)) — integer-exact, ties
    averaged by construction. AUC = (R+ - np(np+1)/2) / (np*nn); one
    double division at the end, Gini = 2*AUC - 1. Integer cents keep the
    domain exact. At 100 TB: one user aggregate (corpus exchange), one
    domain aggregate, constant-sized everything else."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") != "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
            ).otherwise(0)
        ).alias("y"),
    )
    from guardian_for_apache_kafka_spark.operators.evaluation import (
        auc_mann_whitney,
    )

    return auc_mann_whitney(u.select("score", "y"))


@query(
    "q123_ks_drift",
    oracle="""
    WITH t AS (
      SELECT source AS g, len(string_split(text, ' ')) AS v FROM documents
    ),
    counts AS (SELECT g, v, count(*) AS c FROM t GROUP BY 1, 2),
    cum AS (
      SELECT g, v,
             sum(c) OVER (PARTITION BY g ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(c) OVER (PARTITION BY g) AS n
      FROM counts
    ),
    grid AS (
      SELECT g, v FROM (SELECT DISTINCT v FROM t)
      CROSS JOIN (SELECT DISTINCT g FROM t)
    ),
    dense AS (
      SELECT grid.g, grid.v,
             coalesce(last_value(cum.cum IGNORE NULLS) OVER (
               PARTITION BY grid.g ORDER BY grid.v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cum,
             max(cum.n) OVER (PARTITION BY grid.g) AS n
      FROM grid LEFT JOIN cum ON cum.g = grid.g AND cum.v = grid.v
    ),
    pairs AS (
      SELECT a.g AS group_a, b.g AS group_b, a.v, a.n AS n_a, b.n AS n_b,
             abs(a.cum * b.n - b.cum * a.n) AS num
      FROM dense a JOIN dense b ON a.v = b.v AND a.g < b.g
    ),
    picked AS (
      SELECT *, row_number() OVER (PARTITION BY group_a, group_b
                                   ORDER BY num DESC, v) AS rn
      FROM pairs
    )
    SELECT group_a, group_b,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(v AS BIGINT) AS ks_at,
           round(num * 1.0 / (n_a * n_b), 6) AS ks
    FROM picked WHERE rn = 1
    ORDER BY group_a, group_b
    """,
    tags=("relational", "drift", "ks-test"),
)
def q123(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise two-sample Kolmogorov-Smirnov drift matrix over document
    length by source — the shape-sensitive companion to q109's PSI (fixed
    bins miss a drift that only moves mass WITHIN a bin; KS compares full
    CDFs). D = max_v |F_a - F_b| computed as the INTEGER argmax of
    |c_a*n_b - c_b*n_a| (one division at the end; ties to the smaller
    value — all integer decisions, so the matrix hash-matches). Plan: one
    (source, length) rollup is the corpus exchange; the forward-filled
    CDF grid and the pairs join run on the value DOMAIN (|lengths| x
    |sources| rows), constant-sized at 100 TB
    (operators/evaluation.ks_statistic_pairs)."""
    from guardian_for_apache_kafka_spark.operators.evaluation import (
        ks_statistic_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    samples = d.select(
        "source", F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )
    return ks_statistic_pairs(samples, "source", "n_tok")


@query(
    "q124_holt_smoothing",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE))
               AS x,
             CAST(count(*) AS DOUBLE) AS y,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY date_trunc('day', ts)) AS rn
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    walk AS (
      SELECT d1.event_type, d1.rn, d1.x, d1.y,
             d1.y AS lvl,
             d1.y - d2.y AS trend,
             CAST(NULL AS DOUBLE) AS fc
      FROM daily d1 JOIN daily d2
        ON d2.event_type = d1.event_type AND d2.rn = 1
      WHERE d1.rn = 2
      UNION ALL
      SELECT d.event_type, d.rn, d.x, d.y,
             (0.5 * d.y) + (0.5 * (w.lvl + w.trend)),
             (0.5 * (((0.5 * d.y) + (0.5 * (w.lvl + w.trend))) - w.lvl))
               + (0.5 * w.trend),
             w.lvl + w.trend
      FROM walk w JOIN daily d
        ON d.event_type = w.event_type AND d.rn = w.rn + 1
    )
    SELECT event_type, CAST(x AS INT) AS day,
           CAST(y AS BIGINT) AS actual,
           round(fc, 4) AS forecast,
           round(lvl, 4) AS level,
           round(trend, 4) AS trend
    FROM walk WHERE rn >= 3
    ORDER BY event_type, day
    """,
    tags=("relational", "timeseries", "forecasting", "arrow"),
)
def q124(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (alpha = beta = 1/2) with
    one-step-ahead forecasts per event series — the capacity-forecast
    recurrence q102's EWMA lacks a trend term for. Like q114's clamp,
    the COUPLED level/trend recurrence has no window formulation
    (level feeds trend feeds level), so it runs as a per-series Arrow
    fold (applyInPandas) with nothing but series partitioning outside.
    Exactness: multiplying by 0.5 is exact in IEEE double and both
    engines execute the IDENTICAL operation sequence — the oracle's
    recursive CTE replays the fold step by step, so even once the dyadic
    mantissa outgrows 53 bits the correctly-rounded results stay
    bit-identical. Init: level = y_2, trend = y_2 - y_1 (emission starts
    at the third point — no forecast exists for the init rows). At 100 TB: |series| independent folds, each over
    its day-count rows — embarrassingly parallel, bounded state."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.to_date(F.date_trunc("day", F.col("ts"))),
            F.lit("2024-01-01").cast("date"),
        ).alias("x"),
    ).agg(F.count("*").cast("double").alias("y"))

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("x", kind="mergesort").reset_index(drop=True)
        out = []
        lvl = trend = None
        for i, row in pdf.iterrows():
            y = float(row["y"])
            if i == 0:
                prev = y
                continue
            if i == 1:
                # init (rn=2): level = y_2, trend = y_2 - y_1; emission
                # starts at rn=3 (no forecast exists for the init row)
                lvl, trend = y, y - prev
                continue
            fc = lvl + trend
            new_lvl = (0.5 * y) + (0.5 * (lvl + trend))
            trend = (0.5 * (new_lvl - lvl)) + (0.5 * trend)
            lvl = new_lvl
            out.append((row["event_type"], int(row["x"]), y, fc, lvl, trend))
        return pd.DataFrame(
            out, columns=["event_type", "x", "y", "fc", "lvl", "trend"]
        )

    res = daily.groupBy("event_type").applyInPandas(
        walk, "event_type string, x int, y double, fc double, lvl double, trend double"
    )
    return res.select(
        "event_type",
        F.col("x").cast("int").alias("day"),
        F.col("y").cast("long").alias("actual"),
        F.round("fc", 4).alias("forecast"),
        F.round("lvl", 4).alias("level"),
        F.round("trend", 4).alias("trend"),
    ).orderBy("event_type", "day")


@query(
    "q125_weighted_median",
    oracle="""
    WITH pts AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
             CAST(round(l_quantity) AS BIGINT) AS w
      FROM lineitem
    ),
    dom AS (
      SELECT flag, price_cents, sum(w) AS w
      FROM pts GROUP BY 1, 2
    ),
    walked AS (
      SELECT flag, price_cents, w,
             sum(w) OVER (PARTITION BY flag ORDER BY price_cents
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(w) OVER (PARTITION BY flag) AS total
      FROM dom
    ),
    picked AS (
      SELECT flag, price_cents, total,
             row_number() OVER (PARTITION BY flag ORDER BY price_cents) AS rn
      FROM walked WHERE 2 * cum >= total
    )
    SELECT flag, CAST(total AS BIGINT) AS total_weight,
           round(price_cents / 100.0, 2) AS weighted_median_price
    FROM picked WHERE rn = 1 ORDER BY flag
    """,
    tags=("relational", "statistics", "weighted-median"),
)
def q125(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag — the robust
    "typical traded price" a plain median (q31) gets wrong when order
    sizes skew (one 50-unit line should count 50x a 1-unit line). Exact
    by the domain walk: integer cents x integer quantities aggregate to
    (flag, price, weight), the running weight walks each flag's domain,
    and the median is the smallest price with 2*cum >= total — all
    integer comparisons, no interpolation ambiguity across engines.
    Plan: one corpus-sized (flag, price) rollup (map-side combined),
    then flag-partitioned windows over domain-sized frames. The walk
    itself is operators/evaluation.weighted_median_walk — shared verbatim
    with the streaming rollup (streaming/pipeline.weighted_median_rollup),
    so the stream==batch equivalence rides on one implementation."""
    from guardian_for_apache_kafka_spark.operators.evaluation import (
        weighted_median_walk,
    )

    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        F.round(F.col("l_quantity")).cast("long").alias("w"),
    )
    return weighted_median_walk(pts, key_col="flag")


@query(
    "q126_theil_sen_slope",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE))
               AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.event_type,
             (b.y - a.y) * 1.0 / (b.x - a.x) AS m,
             b.y - a.y AS dy, b.x - a.x AS dx
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.x > a.x
    ),
    ranked AS (
      SELECT event_type, m,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY m, dy, dx) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM slopes
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_pairs,
           round(m, 6) AS theil_sen_slope
    FROM ranked WHERE rn = (n + 1) // 2
    ORDER BY event_type
    """,
    tags=("relational", "regression", "robust-statistics"),
)
def q126(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event series — the median of all
    pairwise slopes, immune to the outlier days that drag q116's OLS
    (the standard robust-regression companion: breakdown point 29%).
    Slopes are rationals of small integers, so the double division is
    bit-identical across engines and the median pick (lower median, ties
    broken by the integer (dy, dx) pair — a total order both engines
    share) is deterministic. The pairwise join runs on the DAY table
    (|days|^2 per series ~ 435 pairs here, |days| bounded by the
    retention window at any corpus size — never event-scaled), so the
    O(n^2) lives entirely in the domain tier. One corpus exchange: the
    day rollup."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.to_date(F.date_trunc("day", F.col("ts"))),
            F.lit("2024-01-01").cast("date"),
        ).alias("x"),
    ).agg(F.count("*").alias("y"))
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.x") > F.col("a.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.y") - F.col("a.y")) * 1.0 / (F.col("b.x") - F.col("a.x"))).alias("m"),
        (F.col("b.y") - F.col("a.y")).alias("dy"),
        (F.col("b.x") - F.col("a.x")).alias("dx"),
    )
    ranked = slopes.select(
        "event_type",
        "m",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("m", "dy", "dx"))
        .alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    return (
        ranked.where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_pairs"),
            F.round("m", 6).alias("theil_sen_slope"),
        )
        .orderBy("event_type")
    )


@query(
    "q127_g_test_independence",
    oracle="""
    WITH cells AS (
      SELECT event_type AS et,
             CAST(dayofweek(ts) AS INT) AS dow,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    margins AS (
      SELECT et, dow, o,
             sum(o) OVER (PARTITION BY et) AS row_tot,
             sum(o) OVER (PARTITION BY dow) AS col_tot,
             sum(o) OVER () AS grand
      FROM cells
    ),
    terms AS (
      SELECT et, dow,
             o * ln(o * grand * 1.0 / (row_tot * col_tot)) AS term
      FROM margins WHERE o > 0
    ),
    folded AS (
      SELECT 2.0 * list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(term ORDER BY et, dow)),
               (a, x) -> a + x) AS g,
             count(*) AS n_cells
      FROM terms
    )
    SELECT CAST(n_cells AS BIGINT) AS n_cells,
           round(g, 4) AS g_statistic,
           g > 50.0 AS dependent_at_50
    FROM folded
    """,
    tags=("relational", "statistics", "g-test"),
)
def q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test of independence (log-likelihood ratio) for event_type x
    day-of-week — the information-theoretic twin of q107's chi-square
    (G = 2 sum O ln(O/E) is additive across partitions of the table,
    which Pearson's statistic is not): expected counts from BIGINT-exact
    margins, one ln per occupied cell, and the cross-engine summation
    hazard solved by the SORTED-FOLD discipline — the ~35 cell terms
    fold in (event_type, dow) order on BOTH engines (collect_list of
    structs sorted, F.aggregate vs list(term ORDER BY) + list_reduce), so
    even the float sum is bit-identical. The 50.0 verdict line is the
    df=24 rejection region at far beyond any conventional alpha. At
    100 TB: one corpus rollup to a 35-cell table; everything after is
    constant-sized."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("et"),
        F.dayofweek("ts").cast("int").alias("dow"),
    ).agg(F.count("*").alias("o"))
    margins = cells.select(
        "et",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("et")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("dow")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("grand"),
    )
    term = F.col("o") * F.log(
        F.col("o") * F.col("grand") * 1.0 / (F.col("row_tot") * F.col("col_tot"))
    )
    terms = margins.where(F.col("o") > 0).select(
        F.struct("et", "dow").alias("__k"), term.alias("term")
    )
    folded = terms.agg(
        F.count("*").cast("long").alias("n_cells"),
        (
            2.0
            * F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__k", "term"))
                    ),
                    lambda s: s["term"],
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ).alias("g"),
    )
    return folded.select(
        "n_cells",
        F.round("g", 4).alias("g_statistic"),
        (F.col("g") > 50.0).alias("dependent_at_50"),
    )


@query(
    "q128_seasonal_naive_skill",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE))
               AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, x, y,
             lag(y, 1) OVER w AS y1,
             lag(y, 7) OVER w AS y7
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY x)
    ),
    scored AS (
      SELECT event_type,
             CAST(count(CASE WHEN y7 IS NOT NULL THEN 1 END) AS BIGINT) AS n,
             sum(CASE WHEN y7 IS NOT NULL THEN abs(y - y1) END) AS mae1,
             sum(CASE WHEN y7 IS NOT NULL THEN abs(y - y7) END) AS mae7
      FROM lagged GROUP BY 1
    )
    SELECT event_type, n AS n_days,
           CAST(mae1 AS BIGINT) AS naive1_abs_err,
           CAST(mae7 AS BIGINT) AS seasonal7_abs_err,
           round(mae7 * 1.0 / mae1, 4) AS seasonal_skill_ratio,
           mae7 < mae1 AS weekly_cycle_detected
    FROM scored ORDER BY event_type
    """,
    tags=("relational", "forecasting", "evaluation"),
)
def q128(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive skill test — the forecasting-eval sanity check run
    before q124's smoother is trusted: on the same evaluation days
    (those with a 7-day lag available), compare the absolute error mass
    of the lag-7 seasonal-naive forecast against the lag-1 naive. Ratio
    < 1 means a weekly cycle carries real signal (q119's lag-7 acf said
    the same thing correlationally; this is the decision-grade MASE-style
    version). Error masses are sums of |integer - integer| — exact; one
    division at the end. One corpus day-rollup, series-partitioned lag
    windows over the day table."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.to_date(F.date_trunc("day", F.col("ts"))),
            F.lit("2024-01-01").cast("date"),
        ).alias("x"),
    ).agg(F.count("*").alias("y"))
    w = Window.partitionBy("event_type").orderBy("x")
    lagged = daily.select(
        "event_type",
        "y",
        F.lag("y", 1).over(w).alias("y1"),
        F.lag("y", 7).over(w).alias("y7"),
    )
    ok = F.col("y7").isNotNull()
    scored = lagged.groupBy("event_type").agg(
        F.count(F.when(ok, 1)).cast("long").alias("n"),
        F.sum(F.when(ok, F.abs(F.col("y") - F.col("y1")))).alias("mae1"),
        F.sum(F.when(ok, F.abs(F.col("y") - F.col("y7")))).alias("mae7"),
    )
    return scored.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("mae1").cast("long").alias("naive1_abs_err"),
        F.col("mae7").cast("long").alias("seasonal7_abs_err"),
        F.round(F.col("mae7") * 1.0 / F.col("mae1"), 4).alias("seasonal_skill_ratio"),
        (F.col("mae7") < F.col("mae1")).alias("weekly_cycle_detected"),
    ).orderBy("event_type")


def _daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared (event_type, x=day offset, y=count) rollup — the one
    corpus-sized exchange of the q126/q128-family trend tests; everything
    downstream runs on the bounded day domain (|days| fixed by the
    retention window at any corpus size)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.datediff(
            F.to_date(F.date_trunc("day", F.col("ts"))),
            F.lit("2024-01-01").cast("date"),
        ).alias("x"),
    ).agg(F.count("*").alias("y"))


_DAILY_CTE = """
    daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE))
               AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    )
"""


@query(
    "q129_spearman_corr",
    oracle=f"""
    WITH {_DAILY_CTE},
    xy AS (
      SELECT x,
             CAST(sum(CASE WHEN event_type = 'view' THEN y ELSE 0 END) AS BIGINT) AS xv,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN y ELSE 0 END) AS BIGINT) AS yv
      FROM daily GROUP BY 1
    ),
    rk AS (
      SELECT
        -- 2*midrank is the integer min_rank + max_rank = 2*rank + ties - 1
        2 * rank() OVER (ORDER BY xv) + count(*) OVER (PARTITION BY xv) - 1 AS rx,
        2 * rank() OVER (ORDER BY yv) + count(*) OVER (PARTITION BY yv) - 1 AS ry
      FROM xy
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
             CAST(sum(rx * rx) AS BIGINT) AS sxx,
             CAST(sum(ry * ry) AS BIGINT) AS syy,
             CAST(sum(rx * ry) AS BIGINT) AS sxy
      FROM rk
    )
    SELECT n AS n_days,
           round((n * sxy - sx * sy)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS spearman_rho
    FROM s
    """,
    tags=("relational", "rank-statistics", "correlation"),
)
def q129(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the daily view and purchase
    series — the monotone-association companion to q42's Pearson (rank
    transform makes it robust to the heavy-tailed days OLS-style moments
    chase). Integer discipline: 2*midrank = min_rank + max_rank =
    2*rank() + tie_size - 1 is an exact integer (FIXTURES.md §D pattern
    1), all five moment sums are BIGINT over the bounded day domain, and
    float enters only in the final sqrt/division — bit-identical across
    engines. The windows run over the |days|-sized pivot, never the
    corpus."""
    daily = _daily_counts(spark, sf_dir)
    xy = daily.groupBy("x").agg(
        F.sum(F.when(F.col("event_type") == "view", F.col("y")).otherwise(0))
        .cast("long")
        .alias("xv"),
        F.sum(F.when(F.col("event_type") == "purchase", F.col("y")).otherwise(0))
        .cast("long")
        .alias("yv"),
    )
    rk = xy.select(
        (
            2 * F.rank().over(Window.orderBy("xv"))
            + F.count("*").over(Window.partitionBy("xv"))
            - 1
        ).alias("rx"),
        (
            2 * F.rank().over(Window.orderBy("yv"))
            + F.count("*").over(Window.partitionBy("yv"))
            - 1
        ).alias("ry"),
    )
    s = rk.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        F.col("n").alias("n_days"),
        F.round(num / (F.sqrt(denx) * F.sqrt(deny)), 6).alias("spearman_rho"),
    )


@query(
    "q130_kendall_tau",
    oracle=f"""
    WITH {_DAILY_CTE},
    xy AS (
      SELECT x,
             CAST(sum(CASE WHEN event_type = 'view' THEN y ELSE 0 END) AS BIGINT) AS xv,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN y ELSE 0 END) AS BIGINT) AS yv
      FROM daily GROUP BY 1
    ),
    pairs AS (
      SELECT CAST(sum(CASE WHEN (a.xv < b.xv AND a.yv < b.yv)
                             OR (a.xv > b.xv AND a.yv > b.yv) THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(sum(CASE WHEN (a.xv < b.xv AND a.yv > b.yv)
                             OR (a.xv > b.xv AND a.yv < b.yv) THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM xy a JOIN xy b ON b.x > a.x
    ),
    totals AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM xy
    ),
    tx AS (
      SELECT CAST(sum(t * (t - 1) / 2) AS BIGINT) AS n1
      FROM (SELECT count(*) AS t FROM xy GROUP BY xv)
    ),
    ty AS (
      SELECT CAST(sum(t * (t - 1) / 2) AS BIGINT) AS n2
      FROM (SELECT count(*) AS t FROM xy GROUP BY yv)
    )
    SELECT n AS n_days, c AS concordant, d AS discordant,
           round((c - d) / (sqrt(CAST(n * (n - 1) / 2 - n1 AS DOUBLE))
                            * sqrt(CAST(n * (n - 1) / 2 - n2 AS DOUBLE))), 6)
             AS kendall_tau_b
    FROM pairs, totals, tx, ty
    """,
    tags=("relational", "rank-statistics", "correlation"),
)
def q130(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between the daily view and purchase series — the
    pairwise-concordance association measure (more robust than q129's
    Spearman to a few wild ranks; the standard pair for ordinal drift).
    Concordant/discordant/tie counts are pure integers from the
    |days|^2/2 pair join (domain-sized: day count is retention-bounded,
    never corpus-scaled — the q126 argument), tau-b's tie-corrected
    denominator sqrt((n0-n1)(n0-n2)) is two sqrts of exact BIGINTs, and
    the one division is the last operation."""
    daily = _daily_counts(spark, sf_dir)
    xy = daily.groupBy("x").agg(
        F.sum(F.when(F.col("event_type") == "view", F.col("y")).otherwise(0))
        .cast("long")
        .alias("xv"),
        F.sum(F.when(F.col("event_type") == "purchase", F.col("y")).otherwise(0))
        .cast("long")
        .alias("yv"),
    )
    a, b = xy.alias("a"), xy.alias("b")
    conc = (
        (F.col("a.xv") < F.col("b.xv")) & (F.col("a.yv") < F.col("b.yv"))
    ) | ((F.col("a.xv") > F.col("b.xv")) & (F.col("a.yv") > F.col("b.yv")))
    disc = (
        (F.col("a.xv") < F.col("b.xv")) & (F.col("a.yv") > F.col("b.yv"))
    ) | ((F.col("a.xv") > F.col("b.xv")) & (F.col("a.yv") < F.col("b.yv")))
    pairs = a.join(b, F.col("b.x") > F.col("a.x")).agg(
        F.sum(F.when(conc, 1).otherwise(0)).cast("long").alias("c"),
        F.sum(F.when(disc, 1).otherwise(0)).cast("long").alias("d"),
    )
    n = xy.agg(F.count("*").cast("long").alias("n"))
    tx = (
        xy.groupBy("xv")
        .agg(F.count("*").alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) div 2")).cast("long").alias("n1"))
    )
    ty = (
        xy.groupBy("yv")
        .agg(F.count("*").alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) div 2")).cast("long").alias("n2"))
    )
    j = pairs.crossJoin(n).crossJoin(tx).crossJoin(ty)
    n0 = F.expr("n * (n - 1) div 2")
    return j.select(
        F.col("n").alias("n_days"),
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.round(
            (F.col("c") - F.col("d"))
            / (
                F.sqrt((n0 - F.col("n1")).cast("double"))
                * F.sqrt((n0 - F.col("n2")).cast("double"))
            ),
            6,
        ).alias("kendall_tau_b"),
    )


@query(
    "q131_mann_kendall_trend",
    oracle=f"""
    WITH {_DAILY_CTE},
    s AS (
      SELECT a.event_type,
             CAST(sum(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.x > a.x
      GROUP BY 1
    ),
    nn AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1
    ),
    ties AS (
      SELECT event_type,
             CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
      FROM (SELECT event_type, y, count(*) AS t FROM daily GROUP BY 1, 2)
      GROUP BY 1
    )
    SELECT s.event_type,
           n AS n_days,
           s_stat,
           round(CASE WHEN s_stat > 0 THEN (s_stat - 1)
                      WHEN s_stat < 0 THEN (s_stat + 1)
                      ELSE 0 END
                 / sqrt((n * (n - 1) * (2 * n + 5) - tie_term) / 18.0), 4) AS z,
           CASE WHEN (s_stat - 1) / sqrt((n * (n - 1) * (2 * n + 5) - tie_term) / 18.0)
                     > 1.96 AND s_stat > 0 THEN 'increasing'
                WHEN (s_stat + 1) / sqrt((n * (n - 1) * (2 * n + 5) - tie_term) / 18.0)
                     < -1.96 AND s_stat < 0 THEN 'decreasing'
                ELSE 'no trend' END AS trend
    FROM s JOIN nn ON nn.event_type = s.event_type
           JOIN ties ON ties.event_type = s.event_type
    ORDER BY s.event_type
    """,
    tags=("relational", "trend", "nonparametric"),
)
def q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per event series — the nonparametric
    significance companion to q126's Theil-Sen point estimate (same
    pairwise domain join; MK asks IS there a monotone trend, Theil-Sen
    asks how steep). S = sum of pairwise signs is an exact integer; the
    tie-corrected variance (n(n-1)(2n+5) - sum t(t-1)(2t+5))/18 is a
    ratio of exact integers; the continuity-corrected z and the 1.96 cut
    are single identical double expressions on both engines. The
    |days|^2 pair join is domain-sized (q126's argument)."""
    daily = _daily_counts(spark, sf_dir)
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.x") > F.col("a.x")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.y") > F.col("a.y"), 1)
                .when(F.col("b.y") < F.col("a.y"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    nn = daily.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    ties = (
        daily.groupBy("event_type", "y")
        .agg(F.count("*").alias("t"))
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    j = s.join(nn, "event_type").join(ties, "event_type")
    var = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    ) / 18.0
    zpos = (F.col("s_stat") - 1) / F.sqrt(var)
    zneg = (F.col("s_stat") + 1) / F.sqrt(var)
    z = (
        F.when(F.col("s_stat") > 0, zpos)
        .when(F.col("s_stat") < 0, zneg)
        .otherwise(F.lit(0.0))
    )
    trend = (
        F.when((zpos > 1.96) & (F.col("s_stat") > 0), "increasing")
        .when((zneg < -1.96) & (F.col("s_stat") < 0), "decreasing")
        .otherwise("no trend")
    )
    return j.select(
        "event_type",
        F.col("n").alias("n_days"),
        "s_stat",
        F.round(z, 4).alias("z"),
        trend.alias("trend"),
    ).orderBy("event_type")


@query(
    "q132_turning_points",
    oracle=f"""
    WITH {_DAILY_CTE},
    lagged AS (
      SELECT event_type, y,
             lag(y) OVER (PARTITION BY event_type ORDER BY x) AS yp,
             lead(y) OVER (PARTITION BY event_type ORDER BY x) AS yn
      FROM daily
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN yp IS NOT NULL AND yn IS NOT NULL
                          AND ((y > yp AND y > yn) OR (y < yp AND y < yn))
                         THEN 1 ELSE 0 END) AS BIGINT) AS turning_points,
           round(2.0 * (count(*) - 2) / 3.0, 4) AS expected_tp,
           round(sum(CASE WHEN yp IS NOT NULL AND yn IS NOT NULL
                           AND ((y > yp AND y > yn) OR (y < yp AND y < yn))
                          THEN 1 ELSE 0 END)
                 / (2.0 * (count(*) - 2) / 3.0), 4) AS randomness_ratio
    FROM lagged GROUP BY 1 ORDER BY 1
    """,
    tags=("relational", "randomness", "timeseries"),
)
def q132(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point randomness test per event series: count strict local
    maxima/minima in the daily counts; an i.i.d. series expects
    2(n-2)/3 of them, so the ratio flags both over-smooth (trending,
    ratio << 1) and oscillating (ratio >> 1) series — the cheap
    first-line check before q131's MK test. Pure lag/lead integer
    comparisons over the day domain; one division at the end. The core is
    operators/timeseries.turning_point_stats — shared with the streaming
    rollup (streaming/pipeline.turning_points_rollup)."""
    from guardian_for_apache_kafka_spark.operators.timeseries import (
        turning_point_stats,
    )

    return turning_point_stats(_daily_counts(spark, sf_dir))


@query(
    "q133_runs_test",
    oracle=f"""
    WITH {_DAILY_CTE},
    med AS (
      SELECT event_type, y AS med FROM (
        SELECT event_type, y,
               row_number() OVER (PARTITION BY event_type ORDER BY y) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM daily
      ) WHERE rn = (n + 1) // 2
    ),
    flagged AS (
      SELECT d.event_type,
             CASE WHEN d.y > m.med THEN 1 ELSE 0 END AS above,
             lag(CASE WHEN d.y > m.med THEN 1 ELSE 0 END)
               OVER (PARTITION BY d.event_type ORDER BY d.x) AS prev
      FROM daily d JOIN med m ON m.event_type = d.event_type
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(above) AS BIGINT) AS n_above,
           CAST(count(*) - sum(above) AS BIGINT) AS n_below,
           CAST(1 + sum(CASE WHEN prev IS NOT NULL AND above <> prev
                             THEN 1 ELSE 0 END) AS BIGINT) AS runs,
           round(1 + 2.0 * sum(above) * (count(*) - sum(above)) / count(*), 4)
             AS expected_runs
    FROM flagged GROUP BY 1 ORDER BY 1
    """,
    tags=("relational", "randomness", "nonparametric"),
)
def q133(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test per event series: classify each day
    above/below the series' lower median (an integer domain-walk pick, no
    interpolation), count maximal same-side runs in day order, and
    compare with the i.i.d. expectation 1 + 2*n1*n2/n — too few runs =
    clustering/trend, too many = oscillation. Everything is integer
    until the expected-runs division; the median pick and the run count
    are windows over the bounded day domain. The core is
    operators/timeseries.runs_test_stats — shared with the streaming
    rollup (streaming/pipeline.runs_test_rollup)."""
    from guardian_for_apache_kafka_spark.operators.timeseries import runs_test_stats

    return runs_test_stats(_daily_counts(spark, sf_dir))


@query(
    "q134_anova_dow",
    oracle=f"""
    WITH {_DAILY_CTE},
    dowd AS (
      SELECT event_type, x, y, CAST(x % 7 AS INT) AS g FROM daily
    ),
    per_g AS (
      SELECT event_type, g,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(y) AS BIGINT) AS s_g
      FROM dowd GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s,
             CAST(sum(y * y) AS BIGINT) AS q,
             CAST(count(DISTINCT g) AS BIGINT) AS k
      FROM dowd GROUP BY 1
    ),
    folded AS (
      SELECT event_type,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                         list(s_g * s_g * 1.0 / n_g ORDER BY g)),
                         (a, x) -> a + x) AS between_raw
      FROM per_g GROUP BY event_type
    )
    SELECT t.event_type,
           n AS n_days, k AS k_groups,
           -- SSW == 0 (all within-group values identical) makes F infinite:
           -- report NULL, flag the effect iff SSB > 0 (guarded identically
           -- on the engine side)
           CASE WHEN (q - between_raw) > 0 AND n > k
                THEN round(((between_raw - s * s * 1.0 / n) / (k - 1))
                           / ((q - between_raw) / (n - k)), 4)
                ELSE NULL END AS f_stat,
           CASE WHEN (q - s * s * 1.0 / n) > 0
                THEN round((between_raw - s * s * 1.0 / n)
                           / (q - s * s * 1.0 / n), 4)
                ELSE 0.0 END AS eta_sq,
           CASE WHEN (q - between_raw) > 0 AND n > k
                THEN ((between_raw - s * s * 1.0 / n) / (k - 1))
                     / ((q - between_raw) / (n - k)) > 3.0
                ELSE (between_raw - s * s * 1.0 / n) > 0 END AS dow_effect_at_3
    FROM tot t JOIN folded f ON f.event_type = t.event_type
    ORDER BY t.event_type
    """,
    tags=("relational", "anova", "seasonality"),
)
def q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA for a day-of-week effect on daily volumes per event
    series — the mean-comparison companion to q127's G-test (G asks "are
    type and weekday dependent as CATEGORIES"; this asks "do weekday
    MEANS differ beyond within-group noise") and the significance test
    behind q104's seasonal component. Day groups key on x % 7 (offset
    from the epoch Monday — engine-identical by construction, no dialect
    dayofweek drift). All sums (n_g, S_g, Q) are BIGINT; the only float
    accumulation is the k<=7-term sum of S_g^2/n_g, folded in g order on
    both engines (the q127 sorted-fold discipline), so F and eta^2 are
    bit-identical. One corpus rollup to the day table; everything after
    is constant-sized."""
    daily = _daily_counts(spark, sf_dir)
    dowd = daily.select(
        "event_type", "y", (F.col("x") % 7).cast("int").alias("g")
    )
    per_g = dowd.groupBy("event_type", "g").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum("y").cast("long").alias("s_g"),
    )
    tot = dowd.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("q"),
        F.countDistinct("g").cast("long").alias("k"),
    )
    folded = (
        per_g.select(
            "event_type",
            F.struct("g", (F.col("s_g") * F.col("s_g") * 1.0 / F.col("n_g")).alias("r")).alias("__t"),
        )
        .groupBy("event_type")
        .agg(
            F.aggregate(
                F.transform(F.array_sort(F.collect_list("__t")), lambda s: s["r"]),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("between_raw")
        )
    )
    j = tot.join(folded, "event_type")
    ssb = F.col("between_raw") - F.col("s") * F.col("s") * 1.0 / F.col("n")
    ssw = F.col("q") - F.col("between_raw")
    sst = F.col("q") - F.col("s") * F.col("s") * 1.0 / F.col("n")
    ok = (ssw > 0) & (F.col("n") > F.col("k"))
    fstat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))
    # SSW == 0 makes F infinite (every within-group value identical):
    # NULL statistic, effect flagged iff SSB > 0 — mirrored in the oracle
    return j.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("k").alias("k_groups"),
        F.round(F.when(ok, fstat), 4).alias("f_stat"),
        F.round(F.when(sst > 0, ssb / sst).otherwise(0.0), 4).alias("eta_sq"),
        F.when(ok, fstat > 3.0).otherwise(ssb > 0).alias("dow_effect_at_3"),
    ).orderBy("event_type")


@query(
    "q135_lorenz_curve",
    oracle="""
    WITH rev AS (
      SELECT l_partkey AS part,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                      AS BIGINT)) AS rq
      FROM lineitem GROUP BY 1
    ),
    deciled AS (
      SELECT part, rq,
             ntile(10) OVER (ORDER BY rq, part) AS decile
      FROM rev
    ),
    agg AS (
      SELECT decile,
             CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(rq) AS BIGINT) AS r
      FROM deciled GROUP BY 1
    )
    SELECT decile,
           n_parts,
           round(sum(r) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 * 1.0 / sum(r) OVER (), 6) AS cum_revenue_share,
           round(sum(n_parts) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 * 1.0 / sum(n_parts) OVER (), 6) AS cum_population_share
    FROM agg ORDER BY decile
    """,
    tags=("relational", "concentration", "pareto"),
)
def q135(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lorenz curve behind q97's Gini and q115's ABC cut: parts
    sorted by revenue ASCENDING, cumulative revenue share vs cumulative
    population share at each decile boundary — the 10-point curve an
    analyst actually plots (Gini is 1 - 2*area under this). Revenue is
    q115's integer ten-thousandths (per-row quantization, exact on both
    engines); deciles come from the adaptive two-pass ntile
    (operators/layout.ntile_by_rank — never a corpus-wide single-task
    sort above the small gate); the final windows run over the 10-row
    decile table."""
    from guardian_for_apache_kafka_spark.operators.layout import ntile_by_rank

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)
            .cast("long")
        ).alias("rq")
    )
    deciled = ntile_by_rank(
        rev, [F.col("rq").asc(), F.col("part").asc()], buckets=10, out="decile"
    )
    agg = deciled.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("rq").cast("long").alias("r"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    return agg.select(
        "decile",
        "n_parts",
        F.round(
            F.sum("r").over(w_cum) * 1.0 / F.sum("r").over(w_all), 6
        ).alias("cum_revenue_share"),
        F.round(
            F.sum("n_parts").over(w_cum) * 1.0 / F.sum("n_parts").over(w_all), 6
        ).alias("cum_population_share"),
    ).orderBy("decile")


@query(
    "q136_link_prediction",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id AS u,
             date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE))
               AS d
      FROM events WHERE user_id < 150
    ),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS n FROM active GROUP BY u),
    common AS (
      SELECT a.u AS user_a, b.u AS user_b, CAST(count(*) AS BIGINT) AS common_days
      FROM active a JOIN active b ON b.d = a.d AND a.u < b.u
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT user_a, user_b, common_days,
             da.n AS days_a, db.n AS days_b,
             round(common_days * 1.0 / (da.n + db.n - common_days), 6) AS jaccard
      FROM common
      JOIN deg da ON da.u = user_a
      JOIN deg db ON db.u = user_b
      WHERE common_days >= 3
    )
    SELECT user_a, user_b, common_days, days_a, days_b, jaccard
    FROM scored
    ORDER BY jaccard DESC, user_a, user_b
    LIMIT 20
    """,
    tags=("relational", "graph", "link-prediction"),
)
def q136(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard link prediction over the user co-activity graph: the 20
    user pairs whose active-day sets overlap most (common >= 3) — the
    classic common-neighbors recommender signal, with days as the shared
    neighborhood (q65's triangle machinery asks about closed triples;
    this scores OPEN pairs worth an edge). Pair generation is blocked by
    the day key (users only pair within a day — the d-family
    bucket-bounded quadratic discipline; a production run would also
    salt or cap pathological days the way d16 caps hot buckets, and the
    user_id < 150 gate here bounds the fixture). Counts and degrees are
    BIGINT; Jaccard is the final division."""
    ev = load_table(spark, sf_dir, "events")
    active = (
        ev.where(F.col("user_id") < 150)
        .select(
            F.col("user_id").alias("u"),
            F.datediff(
                F.to_date(F.date_trunc("day", F.col("ts"))),
                F.lit("2024-01-01").cast("date"),
            ).alias("d"),
        )
        .distinct()
    )
    deg = active.groupBy("u").agg(F.count("*").cast("long").alias("n"))
    a, b = active.alias("a"), active.alias("b")
    common = (
        a.join(b, (F.col("b.d") == F.col("a.d")) & (F.col("a.u") < F.col("b.u")))
        .groupBy(F.col("a.u").alias("user_a"), F.col("b.u").alias("user_b"))
        .agg(F.count("*").cast("long").alias("common_days"))
        .where(F.col("common_days") >= 3)
    )
    scored = (
        common.join(
            F.broadcast(deg.select(F.col("u").alias("user_a"), F.col("n").alias("days_a"))),
            "user_a",
        )
        .join(
            F.broadcast(deg.select(F.col("u").alias("user_b"), F.col("n").alias("days_b"))),
            "user_b",
        )
        .select(
            "user_a",
            "user_b",
            "common_days",
            "days_a",
            "days_b",
            F.round(
                F.col("common_days")
                * 1.0
                / (F.col("days_a") + F.col("days_b") - F.col("common_days")),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(F.col("jaccard").desc(), "user_a", "user_b").limit(20)


@query(
    "q137_capture_recapture",
    oracle="""
    WITH w1 AS (
      SELECT DISTINCT user_id FROM events
      WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
    ),
    w2 AS (
      SELECT DISTINCT user_id FROM events
      WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
    ),
    m AS (
      SELECT CAST((SELECT count(*) FROM w1) AS BIGINT) AS n1,
             CAST((SELECT count(*) FROM w2) AS BIGINT) AS n2,
             CAST((SELECT count(*) FROM w1 JOIN w2 USING (user_id)) AS BIGINT)
               AS recaptured,
             CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT)
               AS true_distinct
    )
    SELECT n1, n2, recaptured, true_distinct,
           -- Chapman's bias-corrected Lincoln-Petersen estimator; // keeps
           -- the estimate integral so rel_error matches the engine's
           -- floored integer estimate exactly
           CAST((n1 + 1) * (n2 + 1) // (recaptured + 1) - 1 AS BIGINT)
             AS estimated_distinct,
           round(abs((n1 + 1) * (n2 + 1) // (recaptured + 1) - 1
                     - true_distinct) * 1.0 / true_distinct, 4) AS rel_error
    FROM m
    """,
    tags=("relational", "estimation", "statistics"),
)
def q137(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture population estimate (Chapman's bias-corrected
    Lincoln-Petersen): treat the first and second half-months as two
    'captures' of the user population and estimate total distinct users
    from (n1, n2, recaptured) alone — the sampling trick that sizes a
    dedup problem (how many distinct keys does this corpus REALLY have)
    from two cheap samples before paying for the full distinct. The
    estimator is integer arithmetic ((n1+1)(n2+1) div (m+1) - 1); the
    true distinct is computed alongside so the report carries its own
    relative error. Two semi-joined distinct sets + one exact distinct —
    all map-side-combined aggregations."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    w1 = ev.where(F.col("ts") < cut).select("user_id").distinct()
    w2 = ev.where(F.col("ts") >= cut).select("user_id").distinct()
    n1 = w1.count()
    n2 = w2.count()
    m = w1.join(w2, "user_id").count()
    true_distinct = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    est = (n1 + 1) * (n2 + 1) // (m + 1) - 1
    rel = round(abs(est - true_distinct) / true_distinct, 4)
    return spark.createDataFrame(
        [(n1, n2, m, true_distinct, est, rel)],
        "n1 long, n2 long, recaptured long, true_distinct long, "
        "estimated_distinct long, rel_error double",
    )


@query(
    "q138_gumbel_extremes",
    oracle=f"""
    WITH {_DAILY_CTE},
    weekly_max AS (
      SELECT event_type, x // 7 AS wk, CAST(max(y) AS BIGINT) AS mx
      FROM daily GROUP BY 1, 2
    ),
    mom AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_weeks,
             CAST(sum(mx) AS BIGINT) AS s,
             CAST(sum(mx * mx) AS BIGINT) AS q
      FROM weekly_max GROUP BY 1
    )
    SELECT event_type, n_weeks,
           round(sqrt((q - s * s * 1.0 / n_weeks) / (n_weeks - 1))
                 * sqrt(6.0) / pi(), 4) AS gumbel_scale,
           round(s * 1.0 / n_weeks
                 - 0.5772156649015329
                   * (sqrt((q - s * s * 1.0 / n_weeks) / (n_weeks - 1))
                      * sqrt(6.0) / pi()), 4) AS gumbel_location,
           -- 99th-percentile weekly peak under the fitted Gumbel
           round(s * 1.0 / n_weeks
                 - 0.5772156649015329
                   * (sqrt((q - s * s * 1.0 / n_weeks) / (n_weeks - 1))
                      * sqrt(6.0) / pi())
                 - (sqrt((q - s * s * 1.0 / n_weeks) / (n_weeks - 1))
                    * sqrt(6.0) / pi()) * ln(-ln(0.99)), 4) AS p99_weekly_peak
    FROM mom WHERE n_weeks >= 2 ORDER BY event_type
    """,
    tags=("relational", "extreme-value", "capacity"),
)
def q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel extreme-value fit on weekly peak volumes per event series —
    the capacity-planning statistic (method-of-moments: scale =
    std*sqrt(6)/pi, location = mean - gamma*scale) plus the fitted
    99th-percentile weekly peak, which is what you provision for (q85's
    latency bands describe the body; this models the TAIL of the maxima
    themselves). Weekly maxima and both moment sums are BIGINT; the fit
    is a fixed closed-form double expression written identically on both
    engines (one sqrt, one ln at the end)."""
    daily = _daily_counts(spark, sf_dir)
    weekly = daily.groupBy(
        "event_type", F.expr("x div 7").alias("wk")
    ).agg(F.max("y").cast("long").alias("mx"))
    mom = weekly.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_weeks"),
        F.sum("mx").cast("long").alias("s"),
        F.sum(F.col("mx") * F.col("mx")).cast("long").alias("q"),
    ).where(F.col("n_weeks") >= 2)
    std = F.sqrt(
        (F.col("q") - F.col("s") * F.col("s") * 1.0 / F.col("n_weeks"))
        / (F.col("n_weeks") - 1)
    )
    scale = std * F.sqrt(F.lit(6.0)) / F.lit(3.141592653589793)
    mean = F.col("s") * 1.0 / F.col("n_weeks")
    loc = mean - 0.5772156649015329 * scale
    p99 = loc - scale * F.log(-F.log(F.lit(0.99)))
    return mom.select(
        "event_type",
        "n_weeks",
        F.round(scale, 4).alias("gumbel_scale"),
        F.round(loc, 4).alias("gumbel_location"),
        F.round(p99, 4).alias("p99_weekly_peak"),
    ).orderBy("event_type")


@query(
    "q139_isotonic_calibration",
    oracle="""
    WITH s AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events),
    b AS (
      SELECT least(9, CAST(floor((value - vmin) / (vmax - vmin) * 10) AS BIGINT))
               AS bucket,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      FROM events, s
    ),
    bins AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n, CAST(sum(is_p) AS BIGINT) AS pos
      FROM b GROUP BY bucket
    ),
    segs AS (
      SELECT j.bucket AS j, k.bucket AS k, sum(m.pos) * 1.0 / sum(m.n) AS seg
      FROM bins j JOIN bins k ON k.bucket >= j.bucket
      JOIN bins m ON m.bucket BETWEEN j.bucket AND k.bucket
      GROUP BY 1, 2
    ),
    minseg AS (
      SELECT i.bucket AS i, s2.j, min(s2.seg) AS ms
      FROM bins i JOIN segs s2 ON s2.j <= i.bucket AND s2.k >= i.bucket
      GROUP BY 1, 2
    ),
    fit AS (SELECT i, max(ms) AS fitted FROM minseg GROUP BY i)
    SELECT bins.bucket, bins.n, bins.pos,
           round(bins.pos * 1.0 / bins.n, 4) AS purchase_rate,
           round(fit.fitted, 4) AS isotonic_rate
    FROM bins JOIN fit ON fit.i = bins.bucket
    ORDER BY bins.bucket
    """,
    tags=("relational", "statistics", "calibration"),
)
def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of purchase rate against the event-value
    axis — the monotone-regression step of probability calibration
    (Zadrozny & Elkan 2002), computed by the minimax identity
    fitted[i] = max_{j<=i} min_{k>=i} wavg(rate[j..k]) instead of the
    sequential pool-adjacent-violators walk, because over the BUCKET
    domain (10 rows after one corpus rollup) the O(B^3) closed form is
    pure joins — no iteration, no UDF, and trivially deterministic: every
    segment average is a single division of exact BIGINT sums, and min/max
    over doubles are order-free. At 100 TB only the bucket rollup touches
    the corpus (map-side combined); the bucketing expression (equal-width
    over [vmin, vmax]) is the identical float tree on both engines."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    b = ev.crossJoin(F.broadcast(s)).select(
        F.least(
            F.lit(9).cast("long"),
            F.floor(
                (F.col("value") - F.col("vmin"))
                / (F.col("vmax") - F.col("vmin"))
                * 10
            ),
        ).alias("bucket"),
        (F.col("event_type") == "purchase").cast("long").alias("is_p"),
    )
    bins = b.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n"), F.sum("is_p").cast("long").alias("pos")
    )
    j = bins.select(F.col("bucket").alias("j"))
    k = bins.select(F.col("bucket").alias("k"))
    m = bins.select(F.col("bucket").alias("m"), "n", "pos")
    segs = (
        j.crossJoin(k)
        .where(F.col("k") >= F.col("j"))
        .join(m, (F.col("m") >= F.col("j")) & (F.col("m") <= F.col("k")))
        .groupBy("j", "k")
        .agg((F.sum("pos") * 1.0 / F.sum("n")).alias("seg"))
    )
    i = bins.select(F.col("bucket").alias("i"))
    minseg = (
        i.join(segs, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min("seg").alias("ms"))
    )
    fit = minseg.groupBy("i").agg(F.max("ms").alias("fitted"))
    return (
        bins.join(fit, bins["bucket"] == fit["i"])
        .select(
            "bucket",
            "n",
            "pos",
            F.round(F.col("pos") * 1.0 / F.col("n"), 4).alias("purchase_rate"),
            F.round("fitted", 4).alias("isotonic_rate"),
        )
        .orderBy("bucket")
    )


@query(
    "q140_kaplan_meier",
    oracle="""
    WITH mx AS (SELECT max(ts) AS tmax FROM events),
    u AS (
      SELECT user_id,
             CAST(CAST(max(ts) AS DATE) - CAST(min(ts) AS DATE) AS BIGINT) AS dur,
             CASE WHEN max(ts) < (SELECT tmax FROM mx) - INTERVAL 7 DAY
                  THEN 1 ELSE 0 END AS observed
      FROM events GROUP BY user_id
    ),
    d AS (
      SELECT dur, CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(observed) AS BIGINT) AS churned
      FROM u GROUP BY dur
    ),
    walked AS (
      SELECT dur, churned, n_total,
             (SELECT CAST(count(*) AS BIGINT) FROM u)
               - CAST(coalesce(sum(n_total) OVER (ORDER BY dur
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS at_risk
      FROM d
    ),
    km AS (
      SELECT dur, at_risk, churned, n_total - churned AS censored,
             min((at_risk - churned) * 1.0 / at_risk) OVER (ORDER BY dur
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS minf,
             exp(sum(CASE WHEN churned < at_risk
                          THEN ln((at_risk - churned) * 1.0 / at_risk) END)
                 OVER (ORDER BY dur
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS surv
      FROM walked
    )
    SELECT dur AS dur_days, at_risk, churned, CAST(censored AS BIGINT) AS censored,
           round(CASE WHEN minf = 0 THEN 0.0 ELSE surv END, 4) AS survival
    FROM km ORDER BY dur_days
    """,
    tags=("relational", "statistics", "survival"),
)
def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user activity lifespans with right
    censoring: a user's duration is last-minus-first activity day, and
    users still active in the final 7 days of the observation window are
    CENSORED (they count in the at-risk denominator up to their duration
    but contribute no churn event) — the estimator retention analyses
    should use instead of naive churn rates, which bias low. S(t) is the
    running product of (at_risk - churned)/at_risk over the DAY domain
    (~30 rows after one user rollup), computed as an ordered ln-sum fold
    (both engines accumulate the same sequence -> bit-identical) with a
    running-min guard so a zero factor yields exactly 0.0 rather than
    engine-specific ln(0) behavior (Spark: NULL, DuckDB: -inf). Corpus
    work: one user-keyed rollup, map-side combined."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("tmax"))
    u = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("__mn"), F.max("ts").alias("__mx"))
        .crossJoin(F.broadcast(mx))
        .select(
            F.datediff(F.to_date("__mx"), F.to_date("__mn")).cast("long").alias("dur"),
            (F.col("__mx") < F.col("tmax") - F.expr("INTERVAL 7 DAY"))
            .cast("long")
            .alias("observed"),
        )
    )
    d = u.groupBy("dur").agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum("observed").cast("long").alias("churned"),
    )
    total = u.agg(F.count("*").cast("long").alias("__tot"))
    wprev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    walked = d.crossJoin(F.broadcast(total)).select(
        "dur",
        "churned",
        "n_total",
        (
            F.col("__tot")
            - F.coalesce(F.sum("n_total").over(wprev), F.lit(0)).cast("long")
        ).alias("at_risk"),
    )
    wrun = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    factor = (F.col("at_risk") - F.col("churned")) * 1.0 / F.col("at_risk")
    km = walked.select(
        "dur",
        "at_risk",
        "churned",
        (F.col("n_total") - F.col("churned")).cast("long").alias("censored"),
        F.min(factor).over(wrun).alias("__minf"),
        F.exp(
            F.sum(
                F.when(F.col("churned") < F.col("at_risk"), F.log(factor))
            ).over(wrun)
        ).alias("__surv"),
    )
    return km.select(
        F.col("dur").alias("dur_days"),
        "at_risk",
        "churned",
        "censored",
        F.round(
            F.when(F.col("__minf") == 0, F.lit(0.0)).otherwise(F.col("__surv")), 4
        ).alias("survival"),
    ).orderBy("dur_days")


@query(
    "q141_jsd_drift",
    oracle="""
    WITH counts AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk, event_type AS et,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    weeks AS (SELECT DISTINCT wk FROM counts),
    types AS (SELECT DISTINCT et FROM counts),
    grid AS (
      SELECT w.wk, t.et, coalesce(c.c, 0) AS c,
             sum(coalesce(c.c, 0)) OVER (PARTITION BY w.wk) AS n
      FROM weeks w CROSS JOIN types t
      LEFT JOIN counts c ON c.wk = w.wk AND c.et = t.et
    ),
    pairs AS (
      SELECT cur.wk, cur.et,
             cur.c * 1.0 / cur.n AS p,
             prv.c * 1.0 / prv.n AS q,
             cur.n AS n_curr, prv.n AS n_prev
      FROM grid cur JOIN grid prv
        ON prv.wk + 7 = cur.wk AND prv.et = cur.et
    ),
    terms AS (
      SELECT wk, et, n_curr, n_prev,
             (CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0.0 END)
           + (CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2)) ELSE 0.0 END)
               AS term
      FROM pairs
    )
    SELECT wk AS week,
           CAST(max(n_curr) AS BIGINT) AS n_curr,
           CAST(max(n_prev) AS BIGINT) AS n_prev,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                          list(term ORDER BY et)),
                             (a, x) -> a + x), 6) AS jsd
    FROM terms GROUP BY wk ORDER BY week
    """,
    tags=("relational", "statistics", "drift"),
)
def q141(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week Jensen-Shannon divergence of the event-type mix —
    the bounded, symmetric drift metric (0 <= JSD <= ln 2) that
    complements q109's PSI (which explodes on near-empty bins; JSD
    doesn't). Distributions live on the dense week x type grid (domains
    derived from the AGGREGATED counts frame, never a second corpus
    scan), absent types contribute their closed-form 0*ln0 = 0 / q*ln2
    terms, and the ~5 per-week terms fold in event-type order on both
    engines (the q127 sorted-fold discipline) so the float statistic is
    bit-identical. One corpus rollup; everything after is grid-sized.
    The grid walk + fold live in operators/evaluation.jsd_weekly_drift,
    shared verbatim with the streaming drift monitor's rollup
    (streaming/pipeline.jsd_rollup)."""
    from guardian_for_apache_kafka_spark.operators.evaluation import jsd_weekly_drift

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.to_date(F.date_trunc("week", "ts")).alias("wk"),
        F.col("event_type").alias("et"),
    ).agg(F.count("*").alias("c"))
    return jsd_weekly_drift(counts)



@query(
    "q142_conditional_entropy",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    cnt AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS c
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    probs AS (
      SELECT cur, nxt, c,
             sum(c) OVER (PARTITION BY cur) AS n,
             (c * 1.0 / sum(c) OVER (PARTITION BY cur))
               * ln(c * 1.0 / sum(c) OVER (PARTITION BY cur)) AS term
      FROM cnt
    )
    SELECT cur AS from_type,
           CAST(max(n) AS BIGINT) AS n_transitions,
           round(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                           list(term ORDER BY nxt)),
                              (a, x) -> a + x), 6) AS cond_entropy,
           round(exp(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                               list(term ORDER BY nxt)),
                                  (a, x) -> a + x)), 4) AS perplexity
    FROM probs GROUP BY cur ORDER BY from_type
    """,
    tags=("relational", "statistics", "information"),
)
def q142(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional entropy H(next | current) of the per-user event-type
    chain — the information-theoretic summary of q98's Markov matrix: how
    predictable is the next action given the current one, reported with
    its perplexity (effective branching factor). One user-keyed window
    builds transitions (the only corpus exchange); the matrix is
    |types|^2, the per-state terms fold in next-type order (q127
    discipline) so even the float entropies are bit-identical. The
    rollup lives in operators/evaluation.conditional_entropy_from_transitions,
    shared verbatim with the streaming chain monitor
    (streaming/pipeline.conditional_entropy_rollup)."""
    from guardian_for_apache_kafka_spark.operators.evaluation import (
        conditional_entropy_from_transitions,
    )

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    return conditional_entropy_from_transitions(seq)


@query(
    "q143_quantile_shape",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
    ),
    oct AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             quantile_cont(cents, 0.125) AS e1, quantile_cont(cents, 0.25) AS e2,
             quantile_cont(cents, 0.375) AS e3, quantile_cont(cents, 0.5) AS e4,
             quantile_cont(cents, 0.625) AS e5, quantile_cont(cents, 0.75) AS e6,
             quantile_cont(cents, 0.875) AS e7
      FROM c GROUP BY event_type
    )
    SELECT event_type, n,
           floor(e2) / 100 AS q1, floor(e4) / 100 AS median, floor(e6) / 100 AS q3,
           floor((e6 + e2 - 2 * e4) / nullif(e6 - e2, 0) * 10000) / 10000
             AS bowley_skew,
           floor(((e7 - e5) + (e3 - e1)) / nullif(e6 - e2, 0) * 10000) / 10000
             AS moors_kurtosis
    FROM oct ORDER BY event_type
    """,
    tags=("relational", "statistics", "robust"),
)
def q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-based robust shape statistics per event type: Bowley
    (quartile) skewness and Moors (octile) kurtosis — the outlier-immune
    alternatives to moment skew/kurtosis, computed from exact interpolated
    octiles over integer CENTS (the q31 percentile contract: both engines
    interpolate lower + (upper-lower)*frac, and with integer inputs at
    k/8 ranks the interpolation fracs are exact binary, so the octiles
    are bit-identical). Displays truncate with floor (no HALF_UP hazard).
    At scale: a per-group sort, with q24's sketches as the 100 TB path —
    this is the exactness anchor."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    e = {
        k: F.expr(f"percentile(cents, {k / 8.0}D)")
        for k in range(1, 8)
    }
    oct_ = c.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        *[e[k].alias(f"e{k}") for k in range(1, 8)],
    )
    iqr = F.nullif(F.col("e6") - F.col("e2"), F.lit(0))
    return oct_.select(
        "event_type",
        "n",
        (F.floor(F.col("e2")) / 100).alias("q1"),
        (F.floor(F.col("e4")) / 100).alias("median"),
        (F.floor(F.col("e6")) / 100).alias("q3"),
        (
            F.floor((F.col("e6") + F.col("e2") - 2 * F.col("e4")) / iqr * 10000)
            / 10000
        ).alias("bowley_skew"),
        (
            F.floor(
                ((F.col("e7") - F.col("e5")) + (F.col("e3") - F.col("e1")))
                / iqr
                * 10000
            )
            / 10000
        ).alias("moors_kurtosis"),
    ).orderBy("event_type")


@query(
    "g16_offset_continuity",
    oracle="""
    SELECT event_type AS topic,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST(min(event_id) AS BIGINT) AS min_offset,
           CAST(max(event_id) AS BIGINT) AS max_offset,
           CAST(max(event_id) - min(event_id) + 1 - count(DISTINCT event_id)
                AS BIGINT) AS holes,
           CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS duplicates,
           (max(event_id) - min(event_id) + 1 = count(*)
             AND count(*) = count(DISTINCT event_id)) AS continuous
    FROM events GROUP BY event_type ORDER BY topic
    """,
    tags=("guardian", "audit", "integrity"),
)
def g16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-continuity audit of a restored record set: per topic, does
    the offset sequence cover its [min, max] span with no holes and no
    duplicates — the invariant a Kafka restore must satisfy per
    topic-partition (reference semantics: offsets are per-partition
    monotone, ReducedConsumerRecord.scala:24-31), and the first thing to
    check after a restore or replication. One map-side-combined rollup;
    holes/duplicates are exact integer arithmetic on (count, distinct,
    span). On the shared synthetic stream event_ids interleave across
    types, so every topic reports its true hole count."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("event_type").alias("topic"))
        .agg(
            F.count("*").cast("long").alias("n_records"),
            F.min("event_id").cast("long").alias("min_offset"),
            F.max("event_id").cast("long").alias("max_offset"),
            (
                F.max("event_id")
                - F.min("event_id")
                + 1
                - F.countDistinct("event_id")
            )
            .cast("long")
            .alias("holes"),
            (F.count("*") - F.countDistinct("event_id"))
            .cast("long")
            .alias("duplicates"),
            (
                (F.max("event_id") - F.min("event_id") + 1 == F.count("*"))
                & (F.count("*") == F.countDistinct("event_id"))
            ).alias("continuous"),
        )
        .orderBy("topic")
    )


@query(
    "q144_hill_tail_index",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value, event_id,
             row_number() OVER (PARTITION BY event_type
                  ORDER BY value DESC, event_id) AS rnk
      FROM events
    ),
    xmin AS (
      SELECT event_type, value AS x_ref FROM ranked WHERE rnk = 51
    ),
    terms AS (
      SELECT r.event_type, r.rnk, ln(r.value / x.x_ref) AS term
      FROM ranked r JOIN xmin x USING (event_type)
      WHERE r.rnk <= 50
    )
    SELECT event_type,
           CAST(50 AS BIGINT) AS k,
           round(max(CASE WHEN rnk = 1 THEN exp(term) END), 4) AS top_ratio,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                          list(term ORDER BY rnk)),
                             (a, x) -> a + x) / 50, 6) AS hill_h,
           round(50 / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                               list(term ORDER BY rnk)),
                                  (a, x) -> a + x), 4) AS tail_alpha
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
    tags=("relational", "statistics", "heavy-tail"),
)
def q144(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the tail index over the top-50 order statistics
    of event value per type — the standard heavy-tail diagnostic (is this
    a power law, and how heavy?) that complements q138's Gumbel block
    maxima: H = mean ln(x_(i)/x_(51)), alpha = 1/H. The 50 log-ratio
    terms fold in RANK order (q127 discipline) so the float statistic is
    bit-identical; the per-type top-51 cut is a ranking window with a
    total (value desc, event_id) order. At 100 TB the full-sort window
    gives way to a per-type top-k aggregate (the s24 argmax shape widened
    to k rows) — the statistic itself only ever sees 51 rows per type."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    ranked = ev.select("event_type", "value", "event_id").withColumn(
        "rnk", F.row_number().over(w)
    )
    xmin = ranked.where(F.col("rnk") == 51).select(
        "event_type", F.col("value").alias("x_ref")
    )
    terms = (
        ranked.where(F.col("rnk") <= 50)
        .join(xmin, "event_type")
        .select("event_type", "rnk", F.log(F.col("value") / F.col("x_ref")).alias("term"))
    )
    folded = terms.groupBy("event_type").agg(
        F.round(F.max(F.when(F.col("rnk") == 1, F.exp("term"))), 4).alias("top_ratio"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rnk", "term"))),
                lambda s: s["term"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("__s"),
    )
    return folded.select(
        "event_type",
        F.lit(50).cast("long").alias("k"),
        "top_ratio",
        F.round(F.col("__s") / 50, 6).alias("hill_h"),
        F.round(50 / F.col("__s"), 4).alias("tail_alpha"),
    ).orderBy("event_type")


@query(
    "q145_subsequence_search",
    oracle="""
    WITH counts AS (
      SELECT event_type AS t, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    b AS (SELECT min(day) AS d0, max(day) AS d1 FROM counts),
    days AS (
      SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                         CAST(d1 AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM b
    ),
    types AS (SELECT DISTINCT t FROM counts),
    grid AS (
      SELECT ty.t, d.day, coalesce(c.y, 0) AS y
      FROM days d CROSS JOIN types ty
      LEFT JOIN counts c ON c.t = ty.t AND c.day = d.day
    ),
    series AS (SELECT t, list(y ORDER BY day) AS ys FROM grid GROUP BY t),
    expanded AS (
      SELECT t, ys, CAST(unnest(range(len(ys) - 6)) AS BIGINT) AS s,
             CAST(len(ys) - 7 AS BIGINT) AS qs
      FROM series
    ),
    wins AS (
      SELECT t, s, qs, ys[s+1:s+7] AS w FROM expanded
    ),
    stats AS (
      SELECT t, s, qs, w,
             list_reduce(list_prepend(CAST(0 AS BIGINT), w),
                         (a, x) -> a + x) / 7.0 AS m,
             sqrt(list_reduce(list_prepend(CAST(0 AS BIGINT), w),
                              (a, x) -> a + x * x) / 7.0
                  - (list_reduce(list_prepend(CAST(0 AS BIGINT), w),
                                 (a, x) -> a + x) / 7.0)
                    * (list_reduce(list_prepend(CAST(0 AS BIGINT), w),
                                   (a, x) -> a + x) / 7.0)) AS sd
      FROM wins
    ),
    ok AS (SELECT * FROM stats WHERE sd > 0),
    q AS (SELECT t, w AS qw, m AS qm, sd AS qsd FROM ok WHERE s = qs),
    cand AS (
      SELECT o.t, o.s, o.w, o.m, o.sd, q.qw, q.qm, q.qsd
      FROM ok o JOIN q USING (t) WHERE o.s <= o.qs - 7
    ),
    scored AS (
      SELECT t, s AS window_start,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(7),
                 i -> ((w[i+1] - m) / sd - (qw[i+1] - qm) / qsd)
                    * ((w[i+1] - m) / sd - (qw[i+1] - qm) / qsd))),
               (a, x) -> a + x) AS dist
      FROM cand
    ),
    ranked AS (
      SELECT t, window_start, dist,
             CAST(row_number() OVER (PARTITION BY t
                  ORDER BY dist, window_start) AS BIGINT) AS rnk
      FROM scored
    )
    SELECT t, window_start, round(dist, 4) AS dist, rnk
    FROM ranked WHERE rnk <= 3 ORDER BY t, rnk
    """,
    tags=("relational", "timeseries", "similarity"),
)
def q145(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-normalized subsequence search over the per-type daily count
    series — "which past weeks looked like this week" (the distributed
    MASS / Matrix-Profile-lite shape of EDBT'19 streaming time-series
    similarity): every 7-day window scores against the latest window by
    z-normalized squared Euclidean distance, overlaps excluded, top-3 per
    type. Window sums/sum-of-squares are exact integer folds; the
    distance folds element-wise in index order, so both engines produce
    bit-identical doubles (operators/timeseries.znorm_subsequence_topk).
    Corpus work: one (type, day) rollup; series length is the retention
    horizon, never the corpus."""
    from guardian_for_apache_kafka_spark.operators.timeseries import (
        znorm_subsequence_topk,
    )

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.col("event_type").alias("t"),
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
    ).agg(F.count("*").cast("long").alias("y"))
    b = counts.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    days = b.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    types = counts.select("t").distinct()
    grid = (
        days.crossJoin(types)
        .join(counts, ["t", "day"], "left")
        .select("t", "day", F.coalesce("y", F.lit(0)).cast("long").alias("y"))
    )
    day0 = grid.crossJoin(F.broadcast(b)).select(
        "t", F.datediff("day", "d0").alias("d"), "y"
    )
    return znorm_subsequence_topk(day0, window=7, k=3)


@query(
    "q146_disjunctive_pushdown",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_microcents,
           round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                 / 10000.0, 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
    tags=("relational", "join", "pushdown"),
)
def q146(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shape disjunctive predicate join (OR of per-brand
    size/quantity conjunctions) — the classic optimizer stressor: the
    common `p_partkey = l_partkey` conjunct must still drive a hash join
    (NOT a nested loop), with the OR-of-ANDs evaluated as a post-join
    filter and the single-sided conjuncts (brand/size disjunction on
    part, quantity range on lineitem) pushed into both scans. Revenue
    accumulates as exact integer micro-cents (cents x discount
    hundredths), one division at the end — no float-sum ordering hazard.
    The plan-shape test pins the hash join."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    j = li.join(pt, F.col("p_partkey") == F.col("l_partkey"))
    arm = lambda brand, s0, s1, q0, q1: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s0, s1)
        & F.col("l_quantity").between(q0, q1)
    )
    filt = j.where(
        arm("Brand#12", 1, 15, 1, 21)
        | arm("Brand#24", 10, 30, 10, 30)
        | arm("Brand#3", 20, 50, 20, 50)
    )
    micro = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    return filt.agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(micro).cast("long").alias("revenue_microcents"),
        F.round(F.sum(micro) / 10000.0, 2).alias("revenue"),
    )


@query(
    "q147_discrete_quantiles_mode",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority AS pri,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             year(o_orderdate) AS yr
      FROM orders
    ),
    modes AS (
      SELECT pri, yr, CAST(count(*) AS BIGINT) AS n_yr,
             row_number() OVER (PARTITION BY pri
                  ORDER BY count(*) DESC, yr) AS rk
      FROM c GROUP BY pri, yr
    )
    SELECT c.pri,
           CAST(count(*) AS BIGINT) AS n,
           CAST(quantile_disc(c.cents, 0.25) AS BIGINT) AS p25_cents,
           CAST(quantile_disc(c.cents, 0.50) AS BIGINT) AS med_cents,
           CAST(quantile_disc(c.cents, 0.75) AS BIGINT) AS p75_cents,
           CAST(max(CASE WHEN m.rk = 1 THEN m.yr END) AS BIGINT) AS mode_year,
           CAST(max(CASE WHEN m.rk = 1 THEN m.n_yr END) AS BIGINT) AS mode_count
    FROM c JOIN modes m ON m.pri = c.pri AND m.yr = c.yr
    GROUP BY c.pri ORDER BY c.pri
    """,
    tags=("relational", "agg", "quantile"),
)
def q147(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete (type-1, no-interpolation) quantiles + per-group mode with
    a deterministic tie-break — the ordered-set aggregates q31's
    interpolated percentiles deliberately skip. Discrete quantile
    semantics differ between engines (Spark has no percentile_disc), so
    the engine computes them EXPLICITLY as the value at 1-based rank
    ceil(p * n) over integer cents — which is exactly DuckDB's
    quantile_disc definition. Mode = most frequent order year, ties to
    the EARLIEST year. Everything is integer; no float enters at all.

    Scale plan (VERDICT r8 #4): the obvious ``row_number() OVER
    (PARTITION BY pri)`` over raw orders has a 5-way parallelism ceiling
    — 5 tasks each sorting N/5 rows, a skew bottleneck at 100x. Instead
    the value distribution collapses first (``groupBy(pri, cents)`` —
    at most |distinct cents| rows per group, shuffle carries counts not
    rows), then the cumulative count comes from the two-pass
    range-partitioned prefix sum (``global_running_sum`` ordered by
    (pri, cents), parallelism = shuffle partitions, not 5), and the
    type-1 quantile is the unique cents whose cumulative range straddles
    rank ceil(p*n): cum - cnt < rank <= cum. The only windows left are
    domain-sized (5-row per-pri offsets; per-pri year modes)."""
    o = load_table(spark, sf_dir, "orders")
    c = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.year("o_orderdate").alias("yr"),
    )
    from guardian_for_apache_kafka_spark.operators.layout import global_running_sum

    cnt = c.groupBy("pri", "cents").agg(F.count("*").cast("long").alias("cnt"))
    cum = global_running_sum(cnt, [F.col("pri"), F.col("cents")], "cnt", out="gcum")
    # per-pri totals + global start offsets: 5 rows, a driver-trivial window
    w_off = Window.orderBy("pri").rowsBetween(Window.unboundedPreceding, -1)
    off = (
        cnt.groupBy("pri")
        .agg(F.sum("cnt").cast("long").alias("n"))
        .withColumn("__prior", F.coalesce(F.sum("n").over(w_off), F.lit(0)))
    )
    within = (
        cum.join(F.broadcast(off), "pri")
        .withColumn("__cum", F.col("gcum") - F.col("__prior"))
    )
    q_at = lambda p: F.min(
        F.when(
            (F.col("__cum") - F.col("cnt") < F.ceil(F.lit(p) * F.col("n")))
            & (F.ceil(F.lit(p) * F.col("n")) <= F.col("__cum")),
            F.col("cents"),
        )
    )
    quant = within.groupBy("pri").agg(
        F.max("n").cast("long").alias("n"),
        q_at(0.25).cast("long").alias("p25_cents"),
        q_at(0.50).cast("long").alias("med_cents"),
        q_at(0.75).cast("long").alias("p75_cents"),
    )
    modes = (
        c.groupBy("pri", "yr")
        .agg(F.count("*").alias("n_yr"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("pri").orderBy(F.col("n_yr").desc(), "yr")
            ),
        )
        .where(F.col("rk") == 1)
        .select(
            "pri",
            F.col("yr").cast("long").alias("mode_year"),
            F.col("n_yr").cast("long").alias("mode_count"),
        )
    )
    return quant.join(modes, "pri").orderBy("pri")
