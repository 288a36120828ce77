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
    manifest/rename-prefix instead — the rewrite plan (read slice ->
    coalesce -> write staged -> swap) is identical.
    """
    import urllib.parse as _url

    compacted = []
    for physical in sorted(os.listdir(dest)):
        if not physical.startswith("slice="):
            continue  # guardian-format single files are already one object
        # on-disk partition dirs are URL-encoded; keys are logical
        key = "slice=" + _url.unquote(physical[len("slice=") :])
        if before is not None and _slice_time(key) >= before:
            continue
        slice_dir = os.path.join(dest, physical)
        if not os.path.isdir(slice_dir):
            continue
        data_files = [f for f in os.listdir(slice_dir) if not f.startswith(("_", "."))]
        if len(data_files) < max(min_files, files_per_slice + 1):
            continue
        staged = os.path.join(dest, f"_compacting_{physical}")
        (
            spark.read.format("text").load(slice_dir)
            .coalesce(files_per_slice)
            .write.mode("overwrite").format("text").save(staged)
        )
        old = os.path.join(dest, f"_old_{physical}")
        os.rename(slice_dir, old)
        os.rename(staged, slice_dir)
        shutil.rmtree(old)
        compacted.append(key)
    return compacted
