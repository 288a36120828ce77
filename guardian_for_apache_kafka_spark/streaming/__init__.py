from guardian_for_apache_kafka_spark.streaming.pipeline import (
    records_file_stream,
    stream_backup,
    stream_backup_foreach_batch,
    stream_slice_counts,
)

__all__ = [
    "records_file_stream",
    "stream_backup",
    "stream_backup_foreach_batch",
    "stream_slice_counts",
]
