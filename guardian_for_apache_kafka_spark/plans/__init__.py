from guardian_for_apache_kafka_spark.plans.registry import REGISTRY, EngineQuery, all_queries, oracle_map

# importing the modules populates REGISTRY
from guardian_for_apache_kafka_spark.plans import guardian_queries  # noqa: F401
from guardian_for_apache_kafka_spark.plans import relational_queries  # noqa: F401
from guardian_for_apache_kafka_spark.plans import pipeline_queries  # noqa: F401

__all__ = ["REGISTRY", "EngineQuery", "all_queries", "oracle_map"]
