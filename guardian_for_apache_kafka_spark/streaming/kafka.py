"""Kafka source/sink builders — the production edges of the pipelines.

Reference semantics (cited into /root/reference):
- S1 consumer source: subscribe topic set, earliest offset reset, byte-array
  deserialization (core-backup/src/main/scala/io/aiven/guardian/kafka/backup/
  KafkaConsumer.scala:66-96).
- S3 record normalization: ConsumerRecord -> 7-field record
  (KafkaConsumer.scala:127-138). Spark's Kafka source already produces
  exactly that shape (topic/partition/offset/key/value/timestamp/
  timestampType); normalization is a rename + cast projection.
- K4 offset commit after storage write (KafkaConsumer.scala:97-123): owned by
  the Structured Streaming checkpoint — offsets enter the commit log only
  after the sink's files/epochs commit, which is the reference's
  commit-after-upload contract with less machinery.
- K5 producer sink incl. topic rename and null-key passthrough
  (core-restore/src/main/scala/io/aiven/guardian/kafka/restore/
  KafkaProducer.scala:32-53) and the restore CLI's "single message per
  request" exactly-once-without-transactions mode
  (cli-restore/src/main/scala/io/aiven/guardian/kafka/restore/Main.scala:127-142).

The spark-sql-kafka connector jar is not bundled with plain PySpark; callers
in jar-less environments get a clear error from ``require_kafka_support``
up front instead of an opaque ClassNotFoundException at start(). Everything
here only *builds* plans, so it is unit-testable down to the analyzed plan
without a broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from guardian_for_apache_kafka_spark.core.model import TimestampType
from guardian_for_apache_kafka_spark.operators.restore import restore_to_producer_records

#: Producer options for the reference's --single-message-per-kafka-request
#: mode (idempotence + 1 in-flight + no batching, Main.scala:127-142), spelled
#: as Spark Kafka-sink options.
SINGLE_MESSAGE_PRODUCER_OPTIONS = {
    "kafka.enable.idempotence": "true",
    "kafka.max.in.flight.requests.per.connection": "1",
    "kafka.batch.size": "0",
}


def kafka_support_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the session's classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def require_kafka_support(spark: SparkSession) -> None:
    if not kafka_support_available(spark):
        raise RuntimeError(
            "spark-sql-kafka connector not on the classpath; launch with "
            "spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "or use the file-based sources (streaming.pipeline.records_file_stream)"
        )


def normalize_kafka_source(raw: DataFrame) -> DataFrame:
    """Kafka source layout -> engine record schema (S3, KafkaConsumer.scala:127-138).

    Spark's source column ``timestampType`` carries the same Kafka enum ids the
    reference serializes (0/1/2); key/value stay raw bytes — Base64 happens
    only at the JSON wire edge (core/.../models/ReducedConsumerRecord.scala:16-18).
    """
    return raw.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("key"),
        F.col("value"),
        F.col("timestamp"),
        F.coalesce(F.col("timestampType"), F.lit(int(TimestampType.NO_TIMESTAMP_TYPE)))
        .cast("int")
        .alias("timestamp_type"),
    )


def kafka_record_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: set[str] | list[str],
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    group_id_prefix: str | None = None,
) -> DataFrame:
    """S1: streaming record source over a Kafka topic set.

    The reference's consumer-group/commit settings (group id, earliest reset,
    commit timeout = slice + buffer; KafkaConsumer.scala:66-87) collapse into
    Spark's own offset management: the checkpoint is the group state, so only
    an optional ``groupIdPrefix`` (for broker-side ACLs/quotas) survives.
    Per-partition parallelism replaces the reference's single consumer stream
    (BackupClientInterface.scala:498) — ordering stays per topic-partition,
    which is Kafka's own guarantee.
    """
    require_kafka_support(spark)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", ",".join(sorted(topics)))
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if group_id_prefix is not None:
        reader = reader.option("groupIdPrefix", group_id_prefix)
    return normalize_kafka_source(reader.load())


def kafka_record_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: set[str] | list[str],
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
) -> DataFrame:
    """Bounded (batch) read of a topic set — used by backup backfills."""
    require_kafka_support(spark)
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", ",".join(sorted(topics)))
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
        .load()
    )
    return normalize_kafka_source(raw)


def write_records_to_kafka(
    records: DataFrame,
    bootstrap_servers: str,
    override_topics: dict[str, str] | None = None,
    single_message_per_request: bool = False,
    checkpoint: str | None = None,
    extra_options: dict[str, str] | None = None,
):
    """K5: produce records (back) into Kafka — the restore sink.

    Topic rename + raw-byte mapping comes from restore_to_producer_records
    (KafkaProducer.scala:32-53). ``single_message_per_request`` applies the
    reference's exactly-once-without-transactions producer mode. Returns the
    started StreamingQuery for streaming input, or None after a completed
    batch write.
    """
    spark = records.sparkSession
    require_kafka_support(spark)
    out = restore_to_producer_records(records, override_topics)
    options = {"kafka.bootstrap.servers": bootstrap_servers}
    if single_message_per_request:
        options.update(SINGLE_MESSAGE_PRODUCER_OPTIONS)
    options.update(extra_options or {})
    if out.isStreaming:
        writer = out.writeStream.format("kafka").options(**options)
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        return writer.start()
    out.write.format("kafka").options(**options).save()
    return None
