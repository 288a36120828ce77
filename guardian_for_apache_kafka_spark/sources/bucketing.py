"""Bucketed-table helpers: co-located, shuffle-free joins for repeated keys.

At 100 TB the dominant cost of a recurring fact⋈fact join is the shuffle of
both sides on every run. Hive-style bucketing amortizes it: write each table
once, hash-partitioned into N buckets on the join key (``bucketBy`` +
``sortBy``), and every subsequent equi-join on that key plans with ZERO
Exchange nodes on the bucketed sides — the scan itself delivers the required
hash distribution (and sort order, enabling merge joins without a sort step).

The plan test (tests/test_plan_shapes.py) asserts the no-Exchange property.
Bucket count guidance: ~(table size / 128 MB) rounded to a power of two,
identical on both join sides; mismatched counts fall back to shuffling the
smaller-bucketed side (Spark ≥3.1 bucket coalescing) rather than both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching bucket
    counts this plans shuffle-free (no Exchange on either side); with
    ``sortBy`` it is also sort-free."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
