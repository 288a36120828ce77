"""Physical-layout helpers shared by the CPU-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_narrow_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition a narrow input before CPU-heavy per-row work.

    A small parquet table arrives as one (or few) scan partitions —
    ``maxPartitionBytes`` splits by bytes, and a single row group can't split
    at all — so shingle string-building, signature UDFs, or per-vector cosine
    scoring would run on one core while the rest idle (measured 2.4 s ->
    0.2 s on the sf0.1 documents shingle scan). At cluster scale many input
    files make parallelism natural, in which case this is a no-op: we only
    repartition when the scan has fewer partitions than the session's shuffle
    parallelism. The extra exchange moves the raw rows once — far cheaper
    than serializing the expensive expression work."""
    if df.isStreaming:
        # no static partition count to probe; micro-batch sizing is the
        # trigger's job and .rdd is illegal on a streaming frame
        return df
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
