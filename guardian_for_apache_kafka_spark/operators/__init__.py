from guardian_for_apache_kafka_spark.operators.backup import backup_batch, write_guardian_format
from guardian_for_apache_kafka_spark.operators.compaction import compact_latest_by_key
from guardian_for_apache_kafka_spark.operators.restore import (
    list_backup_keys,
    prune_keys_from_when,
    read_guardian_files,
    restore_batch,
    restore_to_producer_records,
)

__all__ = [
    "backup_batch",
    "write_guardian_format",
    "compact_latest_by_key",
    "list_backup_keys",
    "prune_keys_from_when",
    "read_guardian_files",
    "restore_batch",
    "restore_to_producer_records",
]
