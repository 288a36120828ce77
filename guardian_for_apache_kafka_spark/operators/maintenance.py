"""Archive maintenance: small-file compaction.

Streaming archival writes one-or-more files per slice per micro-batch; at a
1-minute trigger over a day that is ~1440 files per slice directory — the
classic small-files problem (NameNode/object-store listing pressure, task
overhead per file at read time). ``compact_archive_slices`` rewrites slice
directories into a bounded file count, preserving the record set and the
``slice=`` partition layout so restore-side pruning is untouched.

All filesystem access goes through the Hadoop FS API (the storage-API listing
the reference does, restore-s3/.../RestoreClient.scala:33-43), so the same
code maintains ``file://``, ``hdfs://``, ``s3a://``, ``gs://`` archive roots
— matching ``restore.list_backup_keys``.

Safety: the rewrite stages into ``<dest>/_compacting`` then swaps each slice
directory via two renames, so a crash leaves either the old or the new
directory intact, never a mix. Rename is atomic on file/HDFS/ABFS; on S3A it
is a server-side copy (O(data), still all-or-nothing per directory listing
epoch) — acceptable for an offline maintenance job. Do not run concurrently
with an active writer on the same slices (compact closed slices only — pass
``before`` to bound).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import SparkSession


def _slice_time(key: str) -> _dt.datetime:
    from guardian_for_apache_kafka_spark.core.timeslice import key_to_datetime

    return key_to_datetime(key[len("slice=") :] if key.startswith("slice=") else key)


def describe_archive(spark: SparkSession, dest: str) -> "DataFrame":
    """Per-slice inventory of a JSON-lines archive: file count and bytes from
    FileSystem metadata (no data read), record count from ONE scan grouped by
    the slice partition column. The small-files pressure this surfaces is
    exactly what ``compact_archive_slices`` fixes — run describe, compact,
    describe again.

    Driver-side work is bounded by slice count (one listStatus per slice);
    record counting is a partition-pruned columnar count, executor-side."""
    import urllib.parse as _url

    from pyspark.sql import functions as F

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    root = hpath(dest)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    rows = []
    for status in fs.listStatus(root):
        physical = str(status.getPath().getName())
        if not physical.startswith("slice=") or not status.isDirectory():
            continue
        files = [
            f for f in fs.listStatus(status.getPath())
            if not str(f.getPath().getName()).startswith(("_", "."))
        ]
        rows.append(
            (
                _url.unquote(physical[len("slice=") :]),
                len(files),
                sum(f.getLen() for f in files),
            )
        )
    meta = spark.createDataFrame(rows, "slice string, n_files int, bytes long")
    from guardian_for_apache_kafka_spark.operators.restore import read_backup_jsonl

    counts = (
        read_backup_jsonl(spark, dest)
        .groupBy(F.date_format("slice", "yyyy-MM-dd'T'HH:mm:ssXXX").alias("slice"))
        .agg(F.count("*").alias("n_records"))
    )
    return meta.join(counts, "slice", "left").select(
        "slice", "n_files", "bytes", F.coalesce("n_records", F.lit(0)).alias("n_records")
    ).orderBy("slice")


def compact_archive_slices(
    spark: SparkSession,
    dest: str,
    files_per_slice: int = 1,
    before: _dt.datetime | None = None,
    min_files: int = 2,
) -> list[str]:
    """Rewrite JSON-lines slice directories with more than ``min_files`` data
    files down to ``files_per_slice`` files each. Only slices strictly before
    ``before`` (closed slices) are touched when given. Returns compacted keys.

    ``dest`` may be a bare local path or any Hadoop-FS URI (``file://``,
    ``s3a://``, ...) — listing, staging, and the swap all go through the
    destination's FileSystem.

    Scale shape: all eligible slices of one compression flavor are rewritten in
    ONE Spark job (union of slice scans, ``repartition`` on the slice value,
    ``partitionBy`` write) — a day of 1-minute micro-batches is one job, not
    1440 sequential ones. Gzip slices are rewritten gzip (codec detected from
    the existing part-file suffixes) so maintenance never silently changes the
    archive's compression.
    """
    import urllib.parse as _url

    from pyspark.sql import functions as F

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    root = hpath(dest)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())

    # 1. Driver-side listing (bounded: one status per slice + per data file):
    #    find eligible slices, grouped by compression flavor.
    groups: dict[str | None, list[tuple[str, str, object]]] = {}  # codec -> (physical, value, path)
    for status in sorted(fs.listStatus(root), key=lambda s: str(s.getPath().getName())):
        physical = str(status.getPath().getName())
        if not physical.startswith("slice="):
            continue  # guardian-format single files are already one object
        # on-disk partition dirs are URL-encoded; keys are logical
        value = _url.unquote(physical[len("slice=") :])
        key = "slice=" + value
        if before is not None and _slice_time(key) >= before:
            continue
        if not status.isDirectory():
            continue
        slice_path = status.getPath()
        data_files = [
            str(f.getPath().getName())
            for f in fs.listStatus(slice_path)
            if not str(f.getPath().getName()).startswith(("_", "."))
        ]
        if len(data_files) < max(min_files, files_per_slice + 1):
            continue
        codec = "gzip" if any(f.endswith(".gz") for f in data_files) else None
        groups.setdefault(codec, []).append((physical, value, slice_path))

    # 2. One job per compression flavor: union the slice scans, co-locate each
    #    slice's rows, write the whole staged tree with partitionBy.
    compacted: list[str] = []
    for codec, slices in groups.items():
        df = None
        for _physical, value, slice_path in slices:
            part = (
                spark.read.format("text")
                .load(str(slice_path))
                .withColumn("slice", F.lit(value))
            )
            df = part if df is None else df.unionByName(part)
        if files_per_slice <= 1:
            df = df.repartition("slice")
        else:
            df = df.repartition(F.col("slice"), F.pmod(F.xxhash64("value"), F.lit(files_per_slice)))
        staged_root = hpath(root, "_compacting")
        writer = df.write.mode("overwrite").format("text").partitionBy("slice")
        if codec:
            writer = writer.option("compression", codec)
        writer.save(str(staged_root))
        # 3. Per-slice swap out of the staged tree (two renames; crash leaves
        #    either _old_<slice> or the new directory, never a mix).
        for physical, value, slice_path in slices:
            staged = hpath(staged_root, physical)
            if not fs.exists(staged):  # encoding mismatch safety net
                continue
            old = hpath(root, f"_old_{physical}")
            if not fs.rename(slice_path, old):
                raise IOError(f"compaction swap failed renaming {slice_path} aside")
            if not fs.rename(staged, slice_path):
                fs.rename(old, slice_path)  # roll back; archive unchanged
                raise IOError(f"compaction swap failed installing staged {staged}")
            fs.delete(old, True)
            compacted.append("slice=" + value)
        fs.delete(staged_root, True)
    return sorted(compacted)
