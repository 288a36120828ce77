"""Restore: archive objects -> records -> Kafka-producible rows.

Reference semantics (SURVEY.md §2.1 R1-R7, /root/reference citations inline):
- list keys, parse slice time from the key (Utils.scala:8-26), sort by time
  (RestoreClientInterface.scala:50-58);
- fromWhen pruning KEEPS ONE SLICE BEFORE the cutoff — that slice may straddle
  it (RestoreClientInterface.scala:60-79: ``indexWhere(time >= picked)`` then
  ``splitAt(index - 1)``; when no key is >= the cutoff, only the LAST key is
  kept);
- per-record filters: topic ∈ configured set AND time >= fromWhen AND drop the
  ``null`` interrupted-stream sentinel (RestoreClientInterface.scala:83-91,
  :115-120);
- producer mapping: topic rename via map-with-fallback, Base64-decode
  key/value, null key passes through (core-restore/.../KafkaProducer.scala:32-53).

Scale note: the reference materializes the full key list in driver memory
(RestoreClientInterface.scala:104-123 — a List). Here only *slice partition
values* (one per slice, bounded by time-range/period) ever reach the driver;
record data flows executor-side. On the engine-native layout pruning is
partition pruning Catalyst applies from a ``slice >=`` predicate.
"""

from __future__ import annotations

import datetime as _dt
import os
import urllib.parse as _urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from guardian_for_apache_kafka_spark.core.model import (
    RECORD_JSON_SCHEMA_DDL,
    parsed_json_to_record_cols,
)
from guardian_for_apache_kafka_spark.core.timeslice import key_to_datetime
from guardian_for_apache_kafka_spark.operators.backup import logical_name, physical_name


def _list_names(dest: str, spark: SparkSession | None) -> list[str]:
    """Child entry names of ``dest``. With a session, listing goes through the
    Hadoop FS API — the storage-API listing the reference does for S4
    (restore-s3/.../RestoreClient.scala:33-43 ``S3.listBucket``) — so any
    supported scheme (file://, s3a://, gs://, ...) works; without one, plain
    ``os.listdir`` for bare local paths."""
    if spark is None:
        if "://" in dest:
            # sessionless planning contexts (the Python DataSource) still
            # reach object stores: pyarrow FS, the same dispatch the
            # guardian writer's executor side uses — resolve_fs is the one
            # alias-normalization point (review r6 finding; round 7 moved
            # the inline copies there).
            from pyarrow.fs import FileSelector

            from guardian_for_apache_kafka_spark.operators.backup import resolve_fs

            fs, inner = resolve_fs(dest)
            return [
                info.base_name
                for info in fs.get_file_info(FileSelector(inner, recursive=False))
            ]
        return os.listdir(dest)
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(dest)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return [str(s.getPath().getName()) for s in fs.listStatus(path)]


def list_backup_keys(dest: str, spark: SparkSession | None = None) -> list[str]:
    """R2: logical slice keys sorted by their parsed time. Decodes both on-disk
    escapings: guardian-format files use ``_`` for ``:`` (see
    backup.physical_name); Spark partition directories URL-encode
    (``slice=2024-01-01T00%3A00%3A00Z``). Pass ``spark`` to list through the
    Hadoop FS API (object-store URIs)."""
    names = []
    for n in _list_names(dest, spark):
        if n.startswith("_") or n.startswith("."):
            continue
        if n.startswith("slice="):
            n = "slice=" + _urlparse.unquote(n[len("slice=") :])
            stem = n[len("slice=") :]
        else:
            n = logical_name(n)
            stem = n
        try:
            names.append((key_to_datetime(stem), n))
        except ValueError:
            continue
    # tie-break by name: slices can hold SEVERAL objects (the commit layer's
    # .b<batch> stream objects), and a time-only sort would order ties by
    # directory-listing order — nondeterministic across filesystems
    names.sort(key=lambda p: (p[0], p[1]))
    return [n for _, n in names]


def prune_keys_from_when(keys: list[str], from_when: _dt.datetime) -> list[str]:
    """R3: drop keys strictly before the slice *preceding* the cutoff.

    Mirrors RestoreClientInterface.scala:60-79: find the first key with
    time >= fromWhen and keep from (index - 1); if every key is earlier, keep
    only the last slice (it may still straddle); index 0 keeps everything.

    Multi-object slices (round 11): the commit layer's streaming sink puts
    SEVERAL objects at one slice time (``<ISO>.b<batch>.json``), so "the
    preceding slice" means every key SHARING that slice time — keeping just
    one tied key would silently drop the other batches' straddling records.
    The reference never has tied keys, so this is a strict generalization.
    """
    if not keys:
        return []
    if from_when.tzinfo is None:
        # slice keys parse tz-aware (ISO offset); interpret naive cutoffs as
        # UTC — the reference's epoch-millis-as-UTC convention
        from_when = from_when.replace(tzinfo=_dt.timezone.utc)
    times = [key_to_datetime(k[len("slice=") :] if k.startswith("slice=") else k) for k in keys]
    idx = next((i for i, t in enumerate(times) if t >= from_when), None)
    if idx is None:
        straddle_t = times[-1]
    elif idx == 0:
        return keys
    else:
        straddle_t = times[idx - 1]
    first = next(i for i, t in enumerate(times) if t == straddle_t)
    return keys[first:]


def read_guardian_files(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """R4+R5: parse reference-format backup objects (JSON arrays, possibly
    ``null``-terminated, possibly .gz) into the internal record schema.

    ``spark.read.text`` handles the gzip codec transparently; each whole-file
    array is parsed JVM-side with ``from_json`` + ``explode`` and the null
    sentinel dropped (R6's ``rec IS NOT NULL``) — no Python per-record work.
    """
    raw = spark.read.text(paths, wholetext=True)
    rec = F.explode(
        F.from_json(F.col("value"), f"array<struct<{RECORD_JSON_SCHEMA_DDL}>>")
    ).alias("rec")
    return (
        raw.select(rec)
        .where(F.col("rec").isNotNull())
        .select(*parsed_json_to_record_cols(F.col("rec")))
    )


def instance_roots(spark: SparkSession, dest: str) -> list[str]:
    """Per-instance archive roots under a shared destination (the
    concurrent-backup layout, streaming/pipeline.stream_backup
    ``instance_id``): every child directory not hidden by the ``_``/``.``
    convention. Hadoop-FS listing, so any supported scheme works."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(dest)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return sorted(
        str(s.getPath()) for s in fs.listStatus(path)
        if s.isDirectory() and not s.getPath().getName().startswith(("_", "."))
    )


def read_backup_jsonl(spark: SparkSession, dest: str, instances: bool = False) -> DataFrame:
    """Read the engine-native partitioned JSON-lines archive back to records,
    keeping the ``slice`` partition column for pruning.

    ``instances=True`` reads a multi-instance archive — per-instance roots
    under ``dest`` (``dest/<instance>/slice=*``), the layout concurrent
    backup instances write (streaming/pipeline.py concurrency note) — as a
    union of per-root scans (partition discovery forbids non-``key=value``
    intermediate directories under one basePath); slice pruning applies per
    root. Root listing goes through the Hadoop FS API, so any supported
    scheme (file://, s3a://, ...) works."""
    if instances:
        roots = instance_roots(spark, dest)
        if not roots:
            raise ValueError(f"no instance roots under {dest}")
        out = read_backup_jsonl(spark, roots[0])
        for r in roots[1:]:
            out = out.unionByName(read_backup_jsonl(spark, r))
        return out
    raw = spark.read.format("text").option("basePath", dest).load(f"{dest}/slice=*")
    rec = F.from_json(F.col("value"), RECORD_JSON_SCHEMA_DDL).alias("rec")
    return (
        raw.select(rec, F.col("slice"))
        # a corrupt line parses (PERMISSIVE struct mode) to all-null fields;
        # topic is non-null in every legitimate record and the JSON-lines
        # format has no null sentinel, so topic-null = corruption — dropped
        # here (same rule as stream_restore), and the loss stays loud via
        # audit_archive, which reports the record as missing vs the source
        .where(F.col("rec.topic").isNotNull())
        .select(
            *parsed_json_to_record_cols(F.col("rec")), F.to_timestamp("slice").alias("slice")
        )
    )


def scan_corrupt_files(spark: SparkSession, source: str) -> DataFrame:
    """Parse-integrity check for a guardian-format archive: files whose JSON
    array parse yields ZERO records despite non-trivial content.

    Documented divergence this guards: the reference's streaming parser
    (jawn AsyncParser, RestoreClientInterface.scala:104-120) THROWS on a
    corrupt object and aborts the restore; ``from_json`` returns null, so
    the engine's restore silently skips an unparseable file. Run this before
    (or after) a restore to fail loudly instead: each returned row is a file
    the reference would have rejected. Executor-side parse, one row per
    file — nothing but (path, bytes, parsed count) reaches the driver."""
    keys = list_backup_keys(source, spark)
    if not keys:
        return spark.createDataFrame([], "path string, bytes long, parsed_records long")
    paths = [os.path.join(source, physical_name(k)) for k in keys]
    raw = spark.read.text(paths, wholetext=True).select(
        F.input_file_name().alias("path"),
        F.length("value").cast("long").alias("bytes"),
        F.coalesce(
            F.size(
                F.filter(
                    F.from_json(F.col("value"), f"array<struct<{RECORD_JSON_SCHEMA_DDL}>>"),
                    lambda r: r.isNotNull(),
                )
            ),
            F.lit(-1),
        ).cast("long").alias("parsed_records"),
    )
    # from_json yields NULL for an unparseable array (coalesced to -1 here);
    # "[]"/"[null]" parse to 0 — an empty slice is legitimate, a parse
    # failure with real bytes is not
    return raw.where(
        (F.col("parsed_records") <= 0) & (F.col("bytes") > F.lit(8))
    ).select("path", "bytes", F.greatest("parsed_records", F.lit(0)).alias("parsed_records"))


def scan_corrupt_jsonl(spark: SparkSession, dest: str) -> DataFrame:
    """JSON-lines twin of ``scan_corrupt_files``: per-line parse check over
    a ``slice=`` archive — a line whose record parse yields a NULL topic is
    corrupt (topic is non-null in every legitimate record and the wire
    format has no null sentinel; same rule read_backup_jsonl uses to DROP
    such lines silently at restore). Returns one row per damaged file
    (path, n_lines, corrupt_lines) so the loss is loud BEFORE a restore
    silently skips it. Executor-side; only damaged-file rows reach the
    driver."""
    raw = spark.read.format("text").option("basePath", dest).load(f"{dest}/slice=*")
    rec = F.from_json(F.col("value"), RECORD_JSON_SCHEMA_DDL)
    per_file = (
        raw.select(
            F.input_file_name().alias("path"),
            rec["topic"].isNull().cast("int").alias("__bad"),
        )
        .groupBy("path")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum("__bad").cast("long").alias("corrupt_lines"),
        )
        .where(F.col("corrupt_lines") > 0)
    )
    return per_file


def restore_batch(
    spark: SparkSession,
    source: str,
    topics: set[str] | None = None,
    from_when: _dt.datetime | None = None,
    fmt: str = "guardian",
    instances: bool = False,
    snapshot: bool = False,
    version: int | None = None,
) -> DataFrame:
    """Full restore read: prune slices (R3), parse (R4/R5), filter records (R6).

    fmt="guardian": reference-format array files; fmt="json": engine-native
    partitioned JSON-lines (pruning via the slice partition column predicate —
    Catalyst partition pruning, the scan never opens pruned directories).
    ``instances=True`` (json only): per-instance roots under ``source``
    (the concurrent-backup layout); the straddle lower bound still prunes —
    it is conservative per instance since every instance shares the cutoff.

    ``snapshot=True`` / ``version=N`` (guardian format, commit-log archives —
    operators/commitlog): restore from a pinned committed snapshot instead of
    the directory listing — a crashed writer's orphans stay invisible, a
    concurrent commit cannot change the object set mid-restore, and
    ``version`` makes the restore point-in-time (the bulk-path twin of the
    DataSource's ``versionAsOf`` read).
    """
    if (snapshot or version is not None) and fmt != "guardian":
        raise ValueError("snapshot/version restore requires fmt='guardian'")
    if fmt == "guardian":
        if instances:
            raise ValueError("instances=True requires fmt='json'")
        if snapshot or version is not None:
            from guardian_for_apache_kafka_spark.operators.commitlog import (
                ensure_snapshot_objects_present,
                snapshot_keys,
            )

            keys = snapshot_keys(source, version)
            if from_when is not None:
                keys = prune_keys_from_when(keys, from_when)
            # same planning-time vacuum diagnosis as the DataSource path —
            # never a bare executor FileNotFoundError on a vacuumed version
            ensure_snapshot_objects_present(source, keys, version)
        else:
            keys = list_backup_keys(source, spark)
            if from_when is not None:
                keys = prune_keys_from_when(keys, from_when)
        if not keys:
            return spark.createDataFrame([], schema="topic string")
        records = read_guardian_files(spark, [os.path.join(source, physical_name(k)) for k in keys])
    elif fmt == "json":
        records = read_backup_jsonl(spark, source, instances=instances)
        if from_when is not None:
            # -1-slice straddle handled record-exact by the timestamp filter;
            # partition pruning needs only a lower bound on the slice value.
            # Multi-instance archives take the min of the per-root straddle
            # bounds — conservative (every root shares the cutoff) but still
            # prunes every slice older than the earliest straddler.
            roots = instance_roots(spark, source) if instances else [source]
            bounds = []
            for root in roots:
                keys = prune_keys_from_when(list_backup_keys(root, spark), from_when)
                if keys:
                    bounds.append(key_to_datetime(keys[0][len("slice=") :]))
            if bounds:
                records = records.where(F.col("slice") >= F.lit(min(bounds)))
        records = records.drop("slice")
    elif fmt in ("parquet", "orc"):
        # columnar archives (backup_batch fmt="parquet"/"orc"): the slice
        # partition column prunes directories exactly like the JSON-lines
        # path — same straddle rule, expressed on the slice string value
        if instances:
            raise ValueError("instances=True requires fmt='json'")
        records = getattr(spark.read, fmt)(source)
        if from_when is not None:
            keys = prune_keys_from_when(list_backup_keys(source, spark), from_when)
            if keys:
                bound = key_to_datetime(keys[0][len("slice="):])
                records = records.where(F.col("slice") >= F.lit(bound))
        records = records.drop("slice")
    else:
        raise ValueError(f"unsupported restore format: {fmt}")
    if topics is not None:
        records = records.where(F.col("topic").isin(*sorted(topics)))
    if from_when is not None:
        records = records.where(F.col("timestamp") >= F.lit(from_when))
    return records


def audit_archive(
    spark: SparkSession,
    records: DataFrame,
    source: str,
    fmt: str = "json",
    instances: bool = False,
) -> DataFrame:
    """Backup-integrity audit: records present at the source but missing from
    the archive, matched on record identity (topic, partition, offset) via a
    left-anti join. The archive side projects identity columns only, so the
    join shuffles 3 narrow columns per side regardless of payload size. The
    streaming twin is ``streaming.pipeline.stream_audit_join`` (no reference
    twin — Guardian has no audit path at all)."""
    archived = restore_batch(spark, source, fmt=fmt, instances=instances).select(
        "topic", "partition", "offset"
    )
    return records.join(archived, ["topic", "partition", "offset"], "left_anti")


def restore_to_producer_records(
    records: DataFrame, override_topics: dict[str, str] | None = None
) -> DataFrame:
    """K5: map restored records to Kafka-producer shape — topic rename with
    fallback, raw bytes for key/value, null key passthrough
    (KafkaProducer.scala:32-53). The result is exactly what
    ``df.write.format("kafka")`` expects."""
    topic = F.col("topic")
    if override_topics:
        m = F.create_map(*[F.lit(x) for kv in override_topics.items() for x in kv])
        topic = F.coalesce(F.element_at(m, F.col("topic")), F.col("topic"))
    return records.select(
        topic.alias("topic"),
        F.col("key"),
        F.col("value"),
        F.col("timestamp"),
    )
