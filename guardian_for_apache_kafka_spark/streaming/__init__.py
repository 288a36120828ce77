from guardian_for_apache_kafka_spark.streaming.kafka import (
    kafka_record_batch,
    kafka_record_stream,
    kafka_support_available,
    normalize_kafka_source,
    write_records_to_kafka,
)
from guardian_for_apache_kafka_spark.streaming.listener import (
    ProgressListener,
    run_with_restarts,
)
from guardian_for_apache_kafka_spark.streaming.pipeline import (
    cohort_rollup,
    init_cdc_snapshot,
    read_cdc_snapshot,
    records_file_stream,
    stream_audit_join,
    stream_backup,
    stream_backup_foreach_batch,
    stream_cdc_apply,
    stream_cohort_activity,
    stream_dedup_content,
    stream_dedup_replays,
    stream_enrich,
    stream_ivm_apply,
    stream_restore,
    stream_session_stats,
    stream_slice_counts,
    stream_sliding_counts,
)

from guardian_for_apache_kafka_spark.streaming.stateful import (
    anchored_slice_records,
    stream_compact_latest,
)

__all__ = [
    "ProgressListener",
    "run_with_restarts",
    "stream_restore",
    "anchored_slice_records",
    "kafka_record_batch",
    "kafka_record_stream",
    "kafka_support_available",
    "normalize_kafka_source",
    "records_file_stream",
    "stream_backup",
    "stream_backup_foreach_batch",
    "stream_compact_latest",
    "stream_audit_join",
    "stream_cdc_apply",
    "stream_cohort_activity",
    "cohort_rollup",
    "init_cdc_snapshot",
    "read_cdc_snapshot",
    "stream_dedup_content",
    "stream_dedup_replays",
    "stream_enrich",
    "stream_ivm_apply",
    "stream_session_stats",
    "stream_slice_counts",
    "stream_sliding_counts",
    "write_records_to_kafka",
]
