"""Bucketed co-located joins — the zero-shuffle fact-to-fact join path.

At 100 TB the largest shuffle in a relational pipeline is usually the
fact-to-fact join (orders x lineitem, events x events): both sides are far
past any broadcast threshold, so a plain equi-join exchanges BOTH full
tables every time it runs. Bucketing moves that shuffle to WRITE time,
once: each side is hash-partitioned into the same bucket count on the join
key and sorted within buckets, so every subsequent join plans as a
SortMergeJoin with ZERO Exchange on either side. The write cost is one
shuffle, amortized over every join that follows — the standard warehouse
layout for repeatedly-joined fact tables. (A within-partition Sort remains
per side: since SPARK-28632 the scan only exposes the bucket-sort ordering
under ``spark.sql.legacy.bucketedTableScan.outputOrdering``; that sort is
memory-local and exchange-free, noise next to the eliminated shuffle.)

Reference parity note: the reference engine has no relational join layer at
all (guardian's dataflow is per-topic linear; see SURVEY.md §2.2) — this
module is part of the engine's extension surface for warehouse-style
workloads, expressed through Spark's native bucketed-table support
(``DataFrameWriter.bucketBy`` + catalog tables) rather than any hand-rolled
partitioner.

Local-harness note: bucket counts here default small (8) to fit the test
scale; at 100 TB you size buckets so each holds O(100 MB-1 GB) per file
(e.g. 4096 buckets for a 1 TB fact table) and both sides MUST agree on
count and key, or Spark falls back to shuffling the mismatched side.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _sanitize(s: str) -> str:
    return re.sub(r"\W+", "_", s).strip("_")


def source_fingerprint(paths: list[str]) -> str:
    """Cheap content fingerprint for cached-layout keys: (path, mtime_ns,
    size) per source file. Keying a cached/bucketed copy on this — not just
    the directory name — means a REGENERATED source gets a fresh layout
    instead of silently serving stale data (the q49 staleness rule)."""
    import hashlib

    parts = []
    for p in paths:
        try:
            st = os.stat(p)
            parts.append(f"{p}|{st.st_mtime_ns}|{st.st_size}")
        except OSError:
            parts.append(p)
    return hashlib.md5("||".join(parts).encode()).hexdigest()[:10]


def bucketed_location(sf_dir: str, table: str, fingerprint: str | None = None) -> str:
    """Deterministic external-table location for a bucketed copy of a test
    table, outside the repo tree (bucketed writes must go through the
    catalog, but an explicit path keeps the warehouse dir out of play).
    ``fingerprint`` (see :func:`source_fingerprint`) keys the location on
    the source DATA so refreshed sources never reuse a stale layout."""
    tag = _sanitize(sf_dir) + (f"_{fingerprint}" if fingerprint else "")
    return os.path.join(tempfile.gettempdir(), "guardian_spark_bucketed", tag, table)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    buckets: int = 8,
    path: str | None = None,
    sort: bool = True,
) -> DataFrame:
    """Write ``df`` as a bucketed (and bucket-sorted) catalog table and
    return the re-read frame. This is the ONE shuffle the layout ever pays
    on this key; joins between tables bucketed to the same (key-type,
    count) then plan with no Exchange on either side."""
    spark = df.sparkSession
    # one write task per bucket -> exactly one file per bucket (a fragmented
    # bucket costs an open-per-file at every scan). At 100 TB this
    # repartition IS the one write-time shuffle the layout pays.
    df = df.repartition(buckets, F.col(key))
    writer = df.write.format("parquet").mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)
    return spark.table(table_name)


def colocated_join(
    left: DataFrame, right: DataFrame, lkey: str, rkey: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables. The merge hint pins SortMergeJoin (a
    broadcast would also work at test scale but is not the plan being
    exercised); with both sides bucketed on the join key at equal counts
    the planner emits no Exchange — asserted by the q46 plan-shape test."""
    return left.hint("merge").join(right, left[lkey] == right[rkey], how)


def _catalog_bucket_spec(spark: SparkSession, table_name: str) -> tuple[int, str] | None:
    """(num_buckets, bucket_column) for a catalog table, or None if the
    table is absent / not bucketed."""
    if not spark.catalog.tableExists(table_name):
        return None
    rows = spark.sql(f"DESCRIBE FORMATTED {table_name}").collect()
    info = {r.col_name: (r.data_type or "") for r in rows}
    try:
        n = int(info.get("Num Buckets", ""))
    except ValueError:
        return None
    cols = info.get("Bucket Columns", "").strip("[]` ")
    return n, cols


def reuse_or_write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    key: str,
    buckets: int,
    path: str,
) -> DataFrame:
    """Return the bucketed catalog table, paying the write-time shuffle only
    when the layout does not already exist (VERDICT r5 #1: the layout's
    whole point is amortizing that shuffle — rewriting per invocation pays
    it every time). Reuse levels:

    1. catalog table exists with matching (bucket count, key) -> reuse as-is;
    2. files from a prior session exist (``_SUCCESS`` present) but the
       session catalog is fresh -> re-register the bucketed table over the
       existing files via DDL (no data job; Spark trusts the bucket-id
       encoded in each filename, which write_bucketed produced);
    3. otherwise -> write. A mismatched spec or a crashed partial write
       (no ``_SUCCESS``) also lands here and is rewritten.
    """
    spec = _catalog_bucket_spec(spark, table_name)
    if spec == (buckets, key):
        return spark.table(table_name)
    success = os.path.isfile(os.path.join(path, "_SUCCESS"))
    if success and spec is None and not spark.catalog.tableExists(table_name):
        schema_ddl = spark.read.parquet(path).schema.toDDL()
        spark.sql(
            f"CREATE TABLE {table_name} ({schema_ddl}) USING parquet "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {buckets} BUCKETS "
            f"LOCATION '{path}'"
        )
        return spark.table(table_name)
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    return write_bucketed(df, table_name, key, buckets, path)


def bucketed_pair(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    lkey: str,
    rkey: str,
    sf_dir: str,
    names: tuple[str, str],
    buckets: int = 8,
    fingerprint: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Materialize a co-bucketed pair for ``sf_dir`` (idempotent: existing
    matching layouts are reused, within AND across sessions; external
    locations under the system temp dir, names suffixed with the sf tag so
    concurrent scales never collide). Pass ``fingerprint``
    (:func:`source_fingerprint` of the source files) so a REGENERATED
    source gets a fresh table name + location instead of silently reusing
    the stale layout."""
    tag = _sanitize(sf_dir) + (f"_{fingerprint}" if fingerprint else "")
    lname, rname = (f"{names[0]}_{tag}", f"{names[1]}_{tag}")
    lb = reuse_or_write_bucketed(
        spark, left, lname, lkey, buckets,
        bucketed_location(sf_dir, names[0], fingerprint),
    )
    rb = reuse_or_write_bucketed(
        spark, right, rname, rkey, buckets,
        bucketed_location(sf_dir, names[1], fingerprint),
    )
    return lb, rb


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables by name on their bucket key.
    With matching bucket counts this plans shuffle-free (no Exchange on
    either side); see `colocated_join` for the DataFrame-handle variant."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
