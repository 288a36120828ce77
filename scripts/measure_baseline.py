#!/usr/bin/env python
"""Measure the stock-PySpark baseline that BASELINE.md §2 records.

Protocol is identical to bench.py (median of N_RUNS warm runs, collect()
included) but the engine is deliberately NOT used: a plain SparkSession with
stock defaults (only nanosAsLong/UTC, required to read the driver's parquet at
all) runs independently-written spark.sql text against temp views. Re-run this
back-to-back with bench.py on the same machine before comparing numbers —
absolute latencies at this scale move with machine load.

Usage: python scripts/measure_baseline.py  (env: SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from pyspark.sql import SparkSession

# Stock formulations of the eight BASELINE.md metrics. Same semantics as the
# engine's registry queries (and their DuckDB oracles), written as plain SQL.
QUERIES = {
    "agg_q1": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 2) AS avg_qty,
               round(avg(l_extendedprice), 2) AS avg_price,
               round(avg(l_discount), 2) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "join_q5ish": """
        SELECT n.n_name, round(sum(o.o_totalprice), 2) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name
    """,
    "window_rank": """
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn, rnk, drnk
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER w AS rn,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS drnk
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        )
        WHERE rn <= 2
        ORDER BY o_custkey, rn, o_orderkey
    """,
    "topk": """
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    "dedup_latest_by_key": """
        SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
               round(value, 2) AS last_value
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        WHERE rn = 1
        ORDER BY user_id
    """,
    "tumbling_window": """
        SELECT date_trunc('hour', ts) AS slice, count(*) AS cnt
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "semi_anti": """
        SELECT
          (SELECT count(*) FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)) AS with_orders,
          (SELECT count(*) FROM customer WHERE c_custkey NOT IN
             (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')) AS without_f_orders
    """,
    "json_extract": """
        SELECT CAST(get_json_object(props, '$.k') AS INT) AS k, count(*) AS cnt
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "hopping_window": """
        SELECT window(ts, '10 minutes', '5 minutes').start AS w_start, event_type,
               count(*) AS cnt, round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY window(ts, '10 minutes', '5 minutes'), event_type
        ORDER BY w_start, event_type
    """,
    "quality_filter": """
        WITH s AS (
            SELECT source,
                   size(split(text, ' ')) AS n,
                   size(array_distinct(split(text, ' '))) * 1.0
                     / size(split(text, ' ')) AS dr,
                   size(filter(split(text, ' '), x -> x IN ('the', 'a'))) * 1.0
                     / size(split(text, ' ')) AS sr
            FROM documents)
        SELECT source, count(*) AS n_docs,
               sum(CASE WHEN n >= 25 AND n <= 90 AND dr >= 0.35 AND sr <= 0.12
                        THEN 1 ELSE 0 END) AS n_kept,
               sum(CASE WHEN n < 25 THEN 1 ELSE 0 END) AS n_too_short,
               sum(CASE WHEN n > 90 THEN 1 ELSE 0 END) AS n_too_long,
               sum(CASE WHEN dr < 0.35 THEN 1 ELSE 0 END) AS n_low_diversity,
               sum(CASE WHEN sr > 0.12 THEN 1 ELSE 0 END) AS n_stopword_heavy
        FROM s GROUP BY source ORDER BY source
    """,
    "zscore_anomaly": """
        WITH x AS (
          SELECT event_type, event_id, ts, value,
                 CAST(round(value * 100) AS BIGINT) AS xi
          FROM events
        ),
        w AS (
          SELECT event_type, event_id, ts, value, xi,
                 count(xi) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS n,
                 sum(xi)  OVER (PARTITION BY event_type ORDER BY ts, event_id
                                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS sx,
                 sum(xi * xi) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS sxx
          FROM x
        )
        SELECT event_type, event_id, ts, value,
               round(CAST(n * xi - sx AS DOUBLE)
                     * sqrt(CAST(n - 1 AS DOUBLE)
                            / CAST(n * (n * sxx - sx * sx) AS DOUBLE)), 4) AS z
        FROM w
        WHERE n = 20 AND n * sxx - sx * sx > 0
          AND abs(CAST(n * xi - sx AS DOUBLE)
                  * sqrt(CAST(n - 1 AS DOUBLE)
                         / CAST(n * (n * sxx - sx * sx) AS DOUBLE))) >= 3.0
        ORDER BY event_type, event_id
    """,
    # the stock twin of q46: the SAME fact-to-fact aggregate join, over the
    # unbucketed views — pays the both-sides shuffle that the engine's
    # write-once bucket layout eliminates; the ratio is the layout's payoff
    "bucketed_colocated_join": """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_items,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    # round-7 stock twins (plain Spark SQL, same semantics as the registry
    # queries and their DuckDB oracles)
    "decile_lift": """
        WITH u AS (
          SELECT user_id,
                 sum(CASE WHEN event_type <> 'purchase'
                          THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                   AS score_cents,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
          FROM events GROUP BY user_id
        ),
        deciled AS (
          SELECT converted,
                 ntile(10) OVER (ORDER BY score_cents DESC, user_id) AS decile
          FROM u
        ),
        agg AS (
          SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(converted) AS BIGINT) AS n_converted
          FROM deciled GROUP BY decile
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
    "autocorrelation": """
        WITH daily AS (
          SELECT event_type,
                 datediff(to_date(date_trunc('day', ts)), DATE '2024-01-01') AS x,
                 CAST(count(*) AS BIGINT) AS y
          FROM events GROUP BY 1, 2
        ),
        tot AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 sum(y) AS s, sum(y * y) AS q
          FROM daily GROUP BY 1
        ),
        lags AS (SELECT explode(sequence(1, 7)) AS k),
        pairs AS (
          SELECT d1.event_type, k.k,
                 sum(d1.y * d2.y) AS p, sum(d1.y) AS a, sum(d2.y) AS b,
                 CAST(count(*) AS BIGINT) AS npairs
          FROM daily d1 CROSS JOIN lags k
          JOIN daily d2 ON d2.event_type = d1.event_type AND d2.x = d1.x + k.k
          GROUP BY 1, 2
        )
        SELECT p.event_type, CAST(p.k AS INT) AS lag, p.npairs AS n_pairs,
               round((t.n * t.n * p.p - t.n * t.s * (p.a + p.b)
                      + p.npairs * t.s * t.s) * 1.0
                     / (t.n * t.n * t.q - t.n * t.s * t.s), 6) AS acf
        FROM pairs p JOIN tot t ON t.event_type = p.event_type
        ORDER BY p.event_type, lag
    """,
    "readability": """
        WITH d AS (
          SELECT doc_id,
                 size(split(text, ' ')) AS n_words,
                 greatest(1, size(regexp_extract_all(text, '[.!?]+', 0)))
                   AS n_sents,
                 aggregate(transform(split(text, ' '), w ->
                     greatest(CAST(1 AS BIGINT),
                              CAST(size(regexp_extract_all(w, '[aeiouy]+', 0))
                                   AS BIGINT))),
                   CAST(0 AS BIGINT), (a, x) -> a + x) AS n_syll
          FROM documents
        )
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
               CAST(n_syll AS BIGINT) AS n_syllables,
               round(n_syll * 1.0 / n_words, 4) AS syll_per_word,
               round(206.835 - (1.015 * (n_words * 1.0 / n_sents))
                     - (84.6 * (n_syll * 1.0 / n_words)), 3) AS flesch
        FROM d ORDER BY doc_id LIMIT 200
    """,
    # the NAIVE shingle-keyed formulation (explode -> GROUP BY shingle ->
    # join back): what a stock user writes for first-contribution novelty;
    # the engine's t35 computes the same result via the de-skewed
    # owner-attribution aggregate (operators/text.py novelty_from_pairs)
    "ngram_novelty": """
        WITH toks AS (SELECT doc_id, split(text, ' ') AS tk FROM documents),
        shl AS (
          SELECT doc_id,
                 array_distinct(transform(sequence(0, size(tk) - 3),
                     i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS sh
          FROM toks WHERE size(tk) >= 3
        ),
        inv AS (SELECT doc_id, explode(sh) AS s FROM shl),
        owner AS (SELECT s, min(doc_id) AS o FROM inv GROUP BY s),
        novel AS (SELECT o AS doc_id, CAST(count(*) AS BIGINT) AS n_novel
                  FROM owner GROUP BY o),
        tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
                FROM inv GROUP BY doc_id)
        SELECT t.doc_id, t.n_shingles,
               CAST(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel,
               round(CAST(coalesce(n.n_novel, 0) AS DOUBLE) / t.n_shingles, 4)
                 AS novelty_ratio
        FROM tot t LEFT JOIN novel n ON n.doc_id = t.doc_id
        ORDER BY t.doc_id
        LIMIT 100
    """,
    "auc": """
        WITH u AS (
          SELECT user_id,
                 sum(CASE WHEN event_type <> 'purchase'
                          THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                   AS score,
                 max(CASE WHEN event_type = 'purchase' AND value > 150
                          THEN 1 ELSE 0 END) AS y
          FROM events GROUP BY user_id
        ),
        dom AS (
          SELECT score, CAST(sum(y) AS BIGINT) AS pos,
                 CAST(sum(1 - y) AS BIGINT) AS neg
          FROM u GROUP BY score
        ),
        walked AS (
          SELECT score, pos, neg,
                 coalesce(sum(pos + neg) OVER (ORDER BY score
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS below
          FROM dom
        ),
        sums AS (
          SELECT sum(pos * (2 * below + pos + neg + 1)) AS r2p,
                 sum(pos) AS np, sum(neg) AS nn
          FROM walked
        )
        SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
               round((r2p - np * (np + 1)) * 1.0 / (2 * np * nn), 6) AS auc,
               round((r2p - np * (np + 1)) * 1.0 / (np * nn) - 1, 6) AS gini
        FROM sums
    """,
    "weighted_median": """
        WITH pts AS (
          SELECT l_returnflag AS flag,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
                 CAST(round(l_quantity) AS BIGINT) AS w
          FROM lineitem
        ),
        dom AS (SELECT flag, price_cents, sum(w) AS w FROM pts GROUP BY 1, 2),
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
                 row_number() OVER (PARTITION BY flag ORDER BY price_cents)
                   AS rn
          FROM walked WHERE 2 * cum >= total
        )
        SELECT flag, CAST(total AS BIGINT) AS total_weight,
               round(price_cents / 100.0, 2) AS weighted_median_price
        FROM picked WHERE rn = 1 ORDER BY flag
    """,
    "canonical_dedup": """
        WITH aug AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id,
                 concat('  ', upper(text), '!!!') AS text
          FROM documents WHERE doc_id % 7 = 0
        ),
        canon AS (
          SELECT doc_id,
                 md5(trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9 ]', ' '), ' +', ' '))) AS ck
          FROM aug
        ),
        grp AS (
          SELECT ck, CAST(count(*) AS BIGINT) AS n_docs,
                 min(doc_id) AS keeper, max(doc_id) AS max_doc
          FROM canon GROUP BY ck
        )
        SELECT keeper, n_docs, max_doc, CAST(n_docs - 1 AS BIGINT) AS removed
        FROM grp WHERE n_docs > 1 ORDER BY keeper
    """,
    "isotonic_calibration": """
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
    "kaplan_meier": """
        WITH mx AS (SELECT max(ts) AS tmax FROM events),
        u AS (
          SELECT user_id,
                 CAST(datediff(to_date(max(ts)), to_date(min(ts))) AS BIGINT) AS dur,
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
        SELECT dur AS dur_days, at_risk, churned,
               CAST(censored AS BIGINT) AS censored,
               round(CASE WHEN minf = 0 THEN 0.0 ELSE surv END, 4) AS survival
        FROM km ORDER BY dur_days
    """,
    "cond_entropy": """
        WITH seq AS (
          SELECT event_type AS cur,
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
               round(-aggregate(transform(sort_array(collect_list(struct(nxt, term))),
                                          s -> s.term),
                                0D, (a, x) -> a + x), 6) AS cond_entropy
        FROM probs GROUP BY cur ORDER BY from_type
    """,
}

N_RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("stock-baseline")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings"):
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        if t == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", df.ts.cast("long")).selectExpr(
                "* except(ts)", "timestamp_micros(ts DIV 1000) AS ts"
            )
        df.createOrReplaceTempView(t)

    timings = {}
    for name, sql in QUERIES.items():
        spark.sql(sql).collect()
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            spark.sql(sql).collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 4)

    print(json.dumps({"baseline": "stock-pyspark", "sf_dir": sf_dir, "runs": N_RUNS,
                      "queries": timings}))


if __name__ == "__main__":
    main()
