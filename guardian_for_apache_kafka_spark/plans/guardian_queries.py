"""G1-G8: direct relational encodings of the reference's operators (SURVEY.md §2.3).

Each builder is pure DataFrame API (built-in functions only — whole-stage
codegen, no Python in the hot path); each oracle is the same semantics in
DuckDB SQL. Reference citations live in the operator modules these encode
(core/model.py, core/timeslice.py, operators/*).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from guardian_for_apache_kafka_spark.plans.registry import query
from guardian_for_apache_kafka_spark.sources.tables import load_table

FROM_WHEN = "2024-01-15 00:00:00"
PERIOD_15M_US = 15 * 60 * 1_000_000
COMMITTED_OFFSET = 1000


@query(
    "g1_record_normalization",
    oracle=f"""
    SELECT event_id,
           to_base64(encode(event_type)) AS etype_b64,
           (decode(from_base64(to_base64(encode(event_type)))) = event_type) AS roundtrip_ok
    FROM events
    ORDER BY event_id
    LIMIT 100
    """,
    tags=("guardian", "projection", "base64"),
)
def g1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record normalization (KafkaConsumer.scala:127-138): Base64 at the wire
    edge, with an in-query unbase64(base64(x)) == x round-trip proof."""
    ev = load_table(spark, sf_dir, "events")
    b64 = F.base64(F.col("event_type").cast("binary"))
    return (
        ev.select(
            "event_id",
            b64.alias("etype_b64"),
            (F.unbase64(b64).cast("string") == F.col("event_type")).alias("roundtrip_ok"),
        )
        .orderBy("event_id")
        .limit(100)
    )


@query(
    "g2_time_slice_hourly",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS slice, count(*) AS cnt
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("guardian", "window", "agg"),
)
def g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChronoUnitSlice(HOURS) bucket population (TimeConfiguration.scala:16-23 ->
    date_trunc): one row per backup object the pipeline would write."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("slice"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("slice")
    )


@query(
    "g3_anchored_windows",
    oracle=f"""
    WITH a AS (SELECT min(epoch_us(ts)) AS anchor_us FROM events)
    SELECT (epoch_us(e.ts) - a.anchor_us) // {PERIOD_15M_US} AS win_idx,
           count(*) AS cnt
    FROM events e, a
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("guardian", "window", "agg"),
)
def g3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PeriodFromFirst(15 min) window-index assignment
    (BackupClientInterface.scala:551-563): index = micros-between(anchor, t) DIV
    period, anchor = first record's event time. The scalar anchor is a 1-row
    aggregate broadcast to all partitions (no driver-side loop)."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.min(F.unix_micros("ts")).alias("anchor_us"))
    return (
        ev.crossJoin(F.broadcast(anchor))
        .select(
            ((F.unix_micros("ts") - F.col("anchor_us")) / F.lit(PERIOD_15M_US))
            .cast("long")
            .alias("win_idx")
        )
        .groupBy("win_idx")
        .agg(F.count("*").alias("cnt"))
        .orderBy("win_idx")
    )


@query(
    "g4_fromwhen_filter",
    oracle=f"""
    SELECT event_type,
           count(*) AS cnt,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS min_ts,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS max_ts
    FROM events
    WHERE ts >= TIMESTAMP '{FROM_WHEN}'
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("guardian", "filter", "agg"),
)
def g4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The restore-side fromWhen record filter (RestoreClientInterface.scala:83-91):
    time >= cutoff, with per-topic span stats."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("ts") >= F.lit(FROM_WHEN).cast("timestamp"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("min_ts"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("max_ts"),
        )
        .orderBy("event_type")
    )


@query(
    "g5_topic_rename",
    oracle="""
    SELECT CASE WHEN event_type = 'click' THEN 'tap' ELSE event_type END AS topic,
           count(*) AS cnt
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("guardian", "projection"),
)
def g5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restore topic rename: map-lookup-with-fallback
    (core-restore/.../KafkaProducer.scala:32-53) as
    coalesce(element_at(map, topic), topic)."""
    ev = load_table(spark, sf_dir, "events")
    rename = F.create_map(F.lit("click"), F.lit("tap"))
    return (
        ev.select(
            F.coalesce(F.element_at(rename, F.col("event_type")), F.col("event_type")).alias(
                "topic"
            )
        )
        .groupBy("topic")
        .agg(F.count("*").alias("cnt"))
        .orderBy("topic")
    )


@query(
    "g6_compaction_latest_by_key",
    oracle="""
    SELECT user_id,
           event_id AS last_event_id,
           event_type AS last_event_type,
           round(value, 2) AS last_value
    FROM (
        SELECT *,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
    tags=("guardian", "compaction", "window_fn"),
)
def g6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-latest compaction — the operation the reference stubbed
    (core-compaction/.../PostgresJDBCDatabase.scala:46-47 empty SQL; intent from
    GCS.scala:9 compactionBucket) — as a row_number arg-max per key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.round("value", 2).alias("last_value"),
        )
        .orderBy("user_id")
    )


@query(
    "g7_offset_resume_filter",
    oracle=f"""
    SELECT count(*) AS cnt, min(event_id) AS min_id, max(event_id) AS max_id
    FROM events
    WHERE event_id > {COMMITTED_OFFSET}
    """,
    tags=("guardian", "filter"),
)
def g7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Committed-offset replay skip (MockedKafkaConsumerInterface.scala:64-101):
    monotone offset > committed."""
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_id") > COMMITTED_OFFSET).agg(
        F.count("*").alias("cnt"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


_INTERRUPTED_JSON = (
    '[{"topic":"t","partition":0,"offset":0,"key":"a2V5","value":"djA=","timestamp":1000,"timestamp_type":1},'
    '{"topic":"t","partition":0,"offset":1,"key":null,"value":"djE=","timestamp":2000,"timestamp_type":1},'
    '{"topic":"t","partition":0,"offset":2,"key":"a2V5","value":"djI=","timestamp":3000,"timestamp_type":1},'
    "null]"
)

_REC_DDL = (
    "topic STRING, partition INT, offset BIGINT, key STRING, value STRING, "
    "timestamp BIGINT, timestamp_type INT"
)


@query(
    "g8_interrupted_file_parse",
    oracle=f"""
    WITH raw AS (SELECT '{_INTERRUPTED_JSON}'::JSON AS j),
         idx AS (
            SELECT unnest(generate_series(0, CAST(json_array_length(j) AS INT) - 1)) AS i, j
            FROM raw
         )
    SELECT CAST(json_extract_string(j, '$[' || i || '].offset') AS BIGINT) AS "offset",
           json_extract_string(j, '$[' || i || '].key') AS key,
           json_extract_string(j, '$[' || i || '].value') AS "value",
           CAST(json_extract_string(j, '$[' || i || '].timestamp') AS BIGINT) AS ts_ms
    FROM idx
    WHERE json_type(json_extract(j, '$[' || i || ']')) <> 'NULL'
    ORDER BY "offset"
    """,
    tags=("guardian", "json"),
)
def g8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted-backup-file parse: a JSON array terminated with the ``null``
    sentinel (BackupClientInterface.scala:594-600 terminateSource); parsers drop
    the null element (RestoreClientInterface.scala:115-120)."""
    return (
        spark.range(1)
        .select(
            F.explode(F.from_json(F.lit(_INTERRUPTED_JSON), f"array<struct<{_REC_DDL}>>")).alias(
                "rec"
            )
        )
        .where(F.col("rec").isNotNull())
        .select(
            F.col("rec.offset").alias("offset"),
            F.col("rec.key").alias("key"),
            F.col("rec.value").alias("value"),
            F.col("rec.timestamp").alias("ts_ms"),
        )
        .orderBy("offset")
    )
