"""Archive maintenance: small-file compaction.

Streaming archival writes one-or-more files per slice per micro-batch; at a
1-minute trigger over a day that is ~1440 files per slice directory — the
classic small-files problem (NameNode/object-store listing pressure, task
overhead per file at read time). ``compact_archive_slices`` rewrites slice
directories into a bounded file count, preserving the record set and the
``slice=`` partition layout so restore-side pruning is untouched.

Safety: the rewrite stages into ``<dest>/_compacting_<slice>`` then swaps
directories, so a crash leaves either the old or the new directory intact,
never a mix. Do not run concurrently with an active writer on the same
slices (compact closed slices only — pass ``before`` to bound).
"""

from __future__ import annotations

import datetime as _dt
import os
import shutil

from pyspark.sql import SparkSession

def _slice_time(key: str) -> _dt.datetime:
    from guardian_for_apache_kafka_spark.core.timeslice import key_to_datetime

    return key_to_datetime(key[len("slice=") :] if key.startswith("slice=") else key)


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

    Local-FS directory swap here; an object-store deployment swaps via
    manifest/rename-prefix instead — the rewrite plan (read slices ->
    repartition by slice -> write staged -> swap) is identical.

    Scale shape: all eligible slices of one compression flavor are rewritten in
    ONE Spark job (union of slice scans, ``repartition`` on the slice value,
    ``partitionBy`` write) — a day of 1-minute micro-batches is one job, not
    1440 sequential ones. Gzip slices are rewritten gzip (codec detected from
    the existing part-file suffixes) so maintenance never silently changes the
    archive's compression.
    """
    import urllib.parse as _url

    from pyspark.sql import functions as F

    # 1. Driver-side scan: find eligible slices, grouped by compression flavor.
    groups: dict[str | None, list[tuple[str, str, str]]] = {}  # codec -> (physical, key, dir)
    for physical in sorted(os.listdir(dest)):
        if not physical.startswith("slice="):
            continue  # guardian-format single files are already one object
        # on-disk partition dirs are URL-encoded; keys are logical
        value = _url.unquote(physical[len("slice=") :])
        key = "slice=" + value
        if before is not None and _slice_time(key) >= before:
            continue
        slice_dir = os.path.join(dest, physical)
        if not os.path.isdir(slice_dir):
            continue
        data_files = [f for f in os.listdir(slice_dir) if not f.startswith(("_", "."))]
        if len(data_files) < max(min_files, files_per_slice + 1):
            continue
        codec = "gzip" if any(f.endswith(".gz") for f in data_files) else None
        groups.setdefault(codec, []).append((physical, value, slice_dir))

    # 2. One job per compression flavor: union the slice scans, co-locate each
    #    slice's rows, write the whole staged tree with partitionBy.
    compacted: list[str] = []
    for codec, slices in groups.items():
        df = None
        for _physical, value, slice_dir in slices:
            part = spark.read.format("text").load(slice_dir).withColumn("slice", F.lit(value))
            df = part if df is None else df.unionByName(part)
        if files_per_slice <= 1:
            df = df.repartition("slice")
        else:
            df = df.repartition(F.col("slice"), F.pmod(F.xxhash64("value"), F.lit(files_per_slice)))
        staged_root = os.path.join(dest, "_compacting")
        writer = df.write.mode("overwrite").format("text").partitionBy("slice")
        if codec:
            writer = writer.option("compression", codec)
        writer.save(staged_root)
        # 3. Per-slice atomic-ish swap out of the staged tree.
        for physical, value, slice_dir in slices:
            staged = os.path.join(staged_root, physical)
            if not os.path.isdir(staged):  # encoding mismatch safety net
                continue
            old = os.path.join(dest, f"_old_{physical}")
            os.rename(slice_dir, old)
            os.rename(staged, slice_dir)
            shutil.rmtree(old)
            compacted.append("slice=" + value)
        shutil.rmtree(staged_root, ignore_errors=True)
    return sorted(compacted)
