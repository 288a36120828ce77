"""The engine's one record type and its JSON wire codec.

Reference semantics (cited into /root/reference):
- ReducedConsumerRecord fields/types:
  core/src/main/scala/io/aiven/guardian/kafka/models/ReducedConsumerRecord.scala:24-31
  (key/value are Base64 of raw bytes, :16-18; timestamp is epoch millis interpreted
  as UTC, :32-34).
- JSON codec: snake_case ``timestamp_type`` serialized as the Kafka enum int id
  (0=NO_TIMESTAMP_TYPE, 1=CREATE_TIME, 2=LOG_APPEND_TIME):
  core/src/main/scala/io/aiven/guardian/kafka/codecs/Circe.scala:9-38; documented
  wire format docs/src/main/paradox/backup/design.md:6-16.
- Record normalization (ConsumerRecord -> 7 fields, Base64 at the edge):
  core-backup/src/main/scala/io/aiven/guardian/kafka/backup/KafkaConsumer.scala:127-138.

Spark-first design: internally records are a plain DataFrame with BinaryType
key/value and TimestampType event time (exactly the shape of Spark's own Kafka
source); Base64 strings and the epoch-millis long appear only at the JSON
serialization boundary, via built-in ``base64``/``unbase64``/``unix_millis`` —
no Python in the hot path.
"""

from __future__ import annotations

from enum import IntEnum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class TimestampType(IntEnum):
    """Kafka TimestampType ids as serialized by the reference codec
    (core/.../codecs/Circe.scala:9-17)."""

    NO_TIMESTAMP_TYPE = 0
    CREATE_TIME = 1
    LOG_APPEND_TIME = 2


#: Internal (engine-native) record schema. Matches Spark's Kafka source layout;
#: key/value stay raw bytes until the JSON edge.
RECORD_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), nullable=False),
        T.StructField("partition", T.IntegerType(), nullable=False),
        T.StructField("offset", T.LongType(), nullable=False),
        T.StructField("key", T.BinaryType(), nullable=True),
        T.StructField("value", T.BinaryType(), nullable=False),
        T.StructField("timestamp", T.TimestampType(), nullable=False),
        T.StructField("timestamp_type", T.IntegerType(), nullable=False),
    ]
)

#: DDL schema of one JSON wire object (backup/design.md:6-16) for ``from_json``.
RECORD_JSON_SCHEMA_DDL = (
    "topic STRING, partition INT, offset BIGINT, key STRING, value STRING, "
    "timestamp BIGINT, timestamp_type INT"
)


def record_to_json_col(
    topic: str | Column = "topic",
    partition: str | Column = "partition",
    offset: str | Column = "offset",
    key: str | Column = "key",
    value: str | Column = "value",
    timestamp: str | Column = "timestamp",
    timestamp_type: str | Column = "timestamp_type",
) -> Column:
    """Render one record to its JSON wire object.

    Key/value (BinaryType) become Base64 strings; the event-time timestamp
    becomes epoch millis — matching the reference wire format exactly
    (Circe.scala:19-38). A null key/value must serialize as an explicit
    ``"key":null`` field, not an absent one: the reference's Circe
    ``Encoder.forProduct7`` (codecs/Circe.scala:29-38) always emits all seven
    fields. ``to_json`` drops null fields by default, so pass
    ``ignoreNullFields=false`` for byte parity. Pure built-in expressions
    (whole-stage codegen).
    """

    def c(x: str | Column) -> Column:
        return F.col(x) if isinstance(x, str) else x

    return F.to_json(
        F.struct(
            c(topic).alias("topic"),
            c(partition).alias("partition"),
            c(offset).alias("offset"),
            F.base64(c(key)).alias("key"),
            F.base64(c(value)).alias("value"),
            F.unix_millis(c(timestamp)).alias("timestamp"),
            c(timestamp_type).alias("timestamp_type"),
        ),
        {"ignoreNullFields": "false"},
    )


def parsed_json_to_record_cols(rec: Column) -> list[Column]:
    """Columns converting a parsed wire struct back to the internal schema."""
    return [
        rec["topic"].alias("topic"),
        rec["partition"].alias("partition"),
        rec["offset"].alias("offset"),
        F.unbase64(rec["key"]).alias("key"),
        F.unbase64(rec["value"]).alias("value"),
        F.timestamp_millis(rec["timestamp"]).alias("timestamp"),
        rec["timestamp_type"].alias("timestamp_type"),
    ]


def normalize_events_to_records(events: DataFrame) -> DataFrame:
    """Project the driver's ``events`` table into the record schema.

    FIXTURES.md §B: topic := event_type, key := user_id bytes, value := props
    bytes, timestamp := event time. This is the deterministic stand-in for a
    Kafka source when no broker is available (the mapping the reference's mocked
    consumer plays: core-backup/src/test/.../MockedKafkaConsumerInterface.scala:34-128).
    """
    return events.select(
        F.col("event_type").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.col("props").cast("binary").alias("value"),
        F.col("ts").alias("timestamp"),
        F.lit(int(TimestampType.CREATE_TIME)).alias("timestamp_type"),
    )
