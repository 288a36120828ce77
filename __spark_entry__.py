"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``guardian_for_apache_kafka_spark`` package; this
module only adapts its query registry (plans/registry.py) to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from guardian_for_apache_kafka_spark.plans import all_queries, oracle_map  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the Guardian backup pipeline's
    relational core — normalize events to the record schema, assign hourly
    ChronoUnitSlice windows, and report per-slice object stats (what each
    backup object would contain)."""
    from pyspark.sql import functions as F

    from guardian_for_apache_kafka_spark.core import normalize_events_to_records
    from guardian_for_apache_kafka_spark.core.timeslice import ChronoUnitSlice, slice_col
    from guardian_for_apache_kafka_spark.sources.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    records = normalize_events_to_records(events)
    sliced = records.withColumn("slice", slice_col(F.col("timestamp"), ChronoUnitSlice("HOURS")))
    return (
        sliced.groupBy("topic", "slice")
        .agg(
            F.count("*").alias("record_cnt"),
            F.min("offset").alias("min_offset"),
            F.max("offset").alias("max_offset"),
        )
        .orderBy("topic", "slice")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (see
    guardian_for_apache_kafka_spark/plans/*_queries.py)."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every SQL-expressible query; keys absent
    here (but present in ``queries()``) get the driver's rows-only check."""
    return oracle_map()
