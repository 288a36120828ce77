from guardian_for_apache_kafka_spark.core.model import (
    RECORD_SCHEMA,
    RECORD_JSON_SCHEMA_DDL,
    TimestampType,
    normalize_events_to_records,
    record_to_json_col,
)
from guardian_for_apache_kafka_spark.core.timeslice import (
    ChronoUnitSlice,
    PeriodFromFirst,
    TimeConfiguration,
    calculate_key,
    key_to_datetime,
    slice_index,
)

__all__ = [
    "RECORD_SCHEMA",
    "RECORD_JSON_SCHEMA_DDL",
    "TimestampType",
    "normalize_events_to_records",
    "record_to_json_col",
    "ChronoUnitSlice",
    "PeriodFromFirst",
    "TimeConfiguration",
    "calculate_key",
    "key_to_datetime",
    "slice_index",
]
