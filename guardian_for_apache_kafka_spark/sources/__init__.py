from guardian_for_apache_kafka_spark.sources.guardian_source import (
    GuardianDataSource,
    register_guardian_datasource,
)
from guardian_for_apache_kafka_spark.sources.tables import TABLES, load_table, load_tables, register_views

__all__ = [
    "TABLES",
    "GuardianDataSource",
    "load_table",
    "load_tables",
    "register_guardian_datasource",
    "register_views",
]
