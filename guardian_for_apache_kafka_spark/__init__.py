"""guardian-spark: a PySpark-native engine with the data-processing capabilities of
Aiven-Open/guardian-for-apache-kafka (continuous Kafka backup into time-sliced object
storage, point-in-time restore, key-latest compaction), rebuilt Spark-first on
DataFrame/SQL/Catalyst/Structured Streaming, plus a general relational query surface
and large-scale training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns).

Nothing here is a port: the reference (see SURVEY.md) is a single-threaded Pekko
Streams byte pipeline; this engine re-expresses the same *semantics* as declarative
Spark plans that partition-parallelize to cluster scale.
"""

from guardian_for_apache_kafka_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
