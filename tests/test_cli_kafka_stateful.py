"""CLI round-trips, Kafka builder plumbing, and the applyInPandasWithState
PeriodFromFirst operator (batch/stream equivalence)."""

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from guardian_for_apache_kafka_spark.cli import main as cli_main
from guardian_for_apache_kafka_spark.core.model import normalize_events_to_records
from guardian_for_apache_kafka_spark.sources.tables import load_table
from guardian_for_apache_kafka_spark.streaming import (
    anchored_slice_records,
    kafka_record_stream,
    kafka_support_available,
    normalize_kafka_source,
)


@pytest.fixture(scope="module")
def records_parquet(spark, sf_dir, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("records") / "records.parquet")
    normalize_events_to_records(load_table(spark, sf_dir, "events")).write.parquet(p)
    return p


# ---------------------------------------------------------------- CLI


def test_cli_dry_run_resolves_config():
    out = subprocess.run(
        [sys.executable, "-m", "guardian_for_apache_kafka_spark.cli", "backup",
         "--source", "x", "--dest", "y", "--period-from-first", "PT15M",
         "--compression", "gzip", "--dry-run"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    assert '"time_configuration"' in out.stdout and "900" in out.stdout


def test_cli_rejects_conflicting_time_config():
    with pytest.raises(SystemExit):
        cli_main(["backup", "--source", "x", "--dest", "y", "--dry-run",
                  "--period-from-first", "PT1H", "--chrono-unit-slice", "hours"])


def test_cli_backup_restore_compact_roundtrip(spark, records_parquet, tmp_path):
    archive = str(tmp_path / "archive")
    restored = str(tmp_path / "restored")
    compacted = str(tmp_path / "compacted")

    assert cli_main(["backup", "--source", records_parquet, "--dest", archive,
                     "--chrono-unit-slice", "hours", "--format", "guardian"]) == 0
    assert cli_main(["restore", "--source", archive, "--format", "guardian",
                     "--override-topics", "click:tap", "--target", restored]) == 0
    assert cli_main(["compact", "--source", archive, "--format", "guardian",
                     "--target", compacted]) == 0

    src = spark.read.parquet(records_parquet)
    out = spark.read.parquet(restored)
    assert out.count() == src.count()
    # override-topics renamed every click record, and only those
    src_clicks = src.where(F.col("topic") == "click").count()
    assert out.where(F.col("topic") == "tap").count() == src_clicks
    assert out.where(F.col("topic") == "click").count() == 0

    comp = spark.read.parquet(compacted)
    # latest-per-key: one row per distinct non-null key (+ null-key passthrough)
    keys = src.where(F.col("key").isNotNull()).select("topic", "partition", "key").distinct()
    nulls = src.where(F.col("key").isNull()).count()
    assert comp.count() == keys.count() + nulls


# ---------------------------------------------------------------- Kafka builders


def test_kafka_builders_give_clear_error_or_analyze(spark):
    """Without the connector jar the builders fail fast with guidance; with it
    they produce a record-schema streaming DataFrame."""
    if not kafka_support_available(spark):
        with pytest.raises(RuntimeError, match="spark-sql-kafka"):
            kafka_record_stream(spark, "localhost:9092", {"t"})
        return
    df = kafka_record_stream(spark, "localhost:9092", {"t"})
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "topic", "partition", "offset", "key", "value", "timestamp", "timestamp_type"]


def test_normalize_kafka_source_shape(spark):
    """The normalization projection works on any DataFrame with the Kafka
    source layout (here: a literal stand-in) and yields the record schema with
    null timestampType coalesced to NO_TIMESTAMP_TYPE=0."""
    raw = spark.createDataFrame(
        [("t", 0, 7, bytearray(b"k"), bytearray(b"v"), None)],
        "topic STRING, partition INT, offset BIGINT, key BINARY, value BINARY, "
        "timestampType INT",
    ).withColumn("timestamp", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    rec = normalize_kafka_source(raw).collect()[0]
    assert rec.timestamp_type == 0 and rec.offset == 7 and bytes(rec.value) == b"v"


# ---------------------------------------------------------------- stateful op


def test_anchored_slice_stream_equals_batch(spark, tmp_path, records_parquet):
    """applyInPandasWithState PeriodFromFirst == batch G3-style anchored
    windows on a finite replay (input ordered by time per topic so first-seen
    record == min, matching the reference's single ordered stream)."""
    src_dir = str(tmp_path / "stream_src")
    period = 900
    records = spark.read.parquet(records_parquet).orderBy("timestamp")
    records.coalesce(1).write.parquet(src_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        anchored_slice_records(stream, period_seconds=period)
        .writeStream.format("memory")
        .queryName("anchored_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.topic, r.partition, r.offset): r.slice_idx
        for r in spark.sql("select * from anchored_t").collect()
    }

    batch = spark.read.parquet(src_dir)
    anchors = batch.groupBy("topic").agg(F.min(F.unix_micros("timestamp")).alias("anchor_us"))
    expected = {
        (r.topic, r.partition, r.offset): r.slice_idx
        for r in batch.join(anchors, "topic")
        .select(
            "topic", "partition", "offset",
            F.floor((F.unix_micros("timestamp") - F.col("anchor_us")) / (period * 1_000_000))
            .alias("slice_idx"),
        )
        .collect()
    }
    assert got == expected


def test_stream_compact_latest_equals_batch(spark, tmp_path, records_parquet):
    """Continuous compaction changelog: last emitted row per key == batch
    compact_latest_by_key (for keyed records)."""
    from guardian_for_apache_kafka_spark.operators.compaction import compact_latest_by_key
    from guardian_for_apache_kafka_spark.streaming.stateful import stream_compact_latest

    src_dir = str(tmp_path / "stream_src")
    batch_records = spark.read.parquet(records_parquet).orderBy("timestamp")
    # several files -> several micro-batches, in event-time order
    batch_records.withColumn(
        "__b", (F.unix_micros("timestamp") % 3)
    ).repartition(3, "__b").drop("__b").write.parquet(src_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream_compact_latest(stream)
        .writeStream.format("memory")
        .queryName("compact_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # changelog: later batches overwrite earlier emissions per key; the memory
    # sink appends, so take the max-(timestamp, offset) row per key
    rows = spark.sql("select * from compact_t").collect()
    latest = {}
    for r in rows:
        k = (r.topic, r.partition, bytes(r.key))
        cand = (r.timestamp, r.offset, bytes(r.value) if r.value is not None else None)
        if k not in latest or (cand[0], cand[1]) > (latest[k][0], latest[k][1]):
            latest[k] = cand

    expected = {
        (r.topic, r.partition, bytes(r.key)): (
            r.timestamp, r.offset, bytes(r.value) if r.value is not None else None)
        for r in compact_latest_by_key(
            spark.read.parquet(records_parquet).where(F.col("key").isNotNull())
        ).collect()
    }
    assert latest == expected


def test_cli_streaming_file_backup(spark, records_parquet, tmp_path):
    """--streaming without Kafka: checkpointed file-stream archival
    (availableNow) whose output equals the batch backup record set."""
    import os

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    spark.read.parquet(records_parquet).write.parquet(src_dir, mode="overwrite")
    archive = str(tmp_path / "archive")
    ckpt = str(tmp_path / "ckpt")
    assert cli_main(["backup", "--source", src_dir, "--dest", archive,
                     "--checkpoint", ckpt, "--streaming",
                     "--chrono-unit-slice", "hours"]) == 0

    from guardian_for_apache_kafka_spark.operators.restore import read_backup_jsonl

    restored = read_backup_jsonl(spark, archive).drop("slice")
    src = spark.read.parquet(records_parquet)
    assert restored.count() == src.count()
    a = {(r.topic, r.partition, r.offset) for r in restored.collect()}
    b = {(r.topic, r.partition, r.offset) for r in src.collect()}
    assert a == b


def test_boundary_mode_slice_closure(spark, tmp_path, records_parquet):
    """Close-on-next-record slice closure == batch hourly G2 counts minus the
    final (never-closed) slice per topic, on an in-order finite replay."""
    from guardian_for_apache_kafka_spark.streaming.stateful import (
        stream_slice_counts_boundary_mode,
    )

    src_dir = str(tmp_path / "stream_src")
    records = spark.read.parquet(records_parquet).orderBy("timestamp")
    records.coalesce(1).write.parquet(src_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream_slice_counts_boundary_mode(stream, period_seconds=3600)
        .writeStream.format("memory")
        .queryName("boundary_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.topic, r.slice_idx): r.record_cnt
        for r in spark.sql("select * from boundary_t").collect()
    }

    batch = spark.read.parquet(src_dir)
    full = {
        (r.topic, r.slice_idx): r.cnt
        for r in batch.groupBy(
            "topic", (F.unix_micros("timestamp") / (3600 * 1_000_000)).cast("long").alias("slice_idx")
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    # the last slice per topic never closes (reference T9 semantics)
    last_per_topic = {}
    for (topic, idx) in full:
        last_per_topic[topic] = max(last_per_topic.get(topic, -1), idx)
    expected = {k: v for k, v in full.items() if k[1] != last_per_topic[k[0]]}
    assert got == expected and len(got) > 0


def test_stream_compact_latest_on_rocksdb_state_store(spark, tmp_path, records_parquet):
    """The continuous compaction operator is state-store-agnostic: running it
    on RocksDB (SCALE.md's recommendation for huge key spaces) produces the
    same changelog result as the default HDFS-backed store."""
    from guardian_for_apache_kafka_spark.operators.compaction import compact_latest_by_key
    from guardian_for_apache_kafka_spark.streaming.stateful import stream_compact_latest

    src_dir = str(tmp_path / "src")
    spark.read.parquet(records_parquet).orderBy("timestamp").coalesce(1).write.parquet(src_dir)
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(spark.read.parquet(src_dir).schema).parquet(src_dir)
        q = (
            stream_compact_latest(stream)
            .writeStream.format("memory")
            .queryName("compact_rocks")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.topic, r.partition, bytes(r.key)): (r.timestamp, r.offset)
            for r in spark.sql("select * from compact_rocks").collect()
        }
        expected = {
            (r.topic, r.partition, bytes(r.key)): (r.timestamp, r.offset)
            for r in compact_latest_by_key(
                spark.read.parquet(records_parquet).where(F.col("key").isNotNull())
            ).collect()
        }
        assert got == expected
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_cli_maintain_compacts_archive(spark, records_parquet, tmp_path):
    import glob
    import os

    from guardian_for_apache_kafka_spark.core.timeslice import ChronoUnitSlice
    from guardian_for_apache_kafka_spark.operators.backup import backup_batch

    dest = str(tmp_path / "archive")
    records = spark.read.parquet(records_parquet)
    for i in range(3):
        backup_batch(
            records.where(F.col("offset") % 3 == i).repartition(2),
            dest, ChronoUnitSlice("DAYS"), fmt="json",
        )
    assert cli_main(["maintain", "--dest", dest, "--files-per-slice", "1"]) == 0
    for d in glob.glob(f"{dest}/slice=*"):
        assert len([f for f in os.listdir(d) if not f.startswith(("_", "."))]) == 1


def test_cli_restore_from_when_point_in_time(spark, records_parquet, tmp_path):
    """CLI point-in-time restore: --from-when filters records exactly (>=
    cutoff) regardless of slice straddle."""
    from guardian_for_apache_kafka_spark.core.timeslice import ChronoUnitSlice
    from guardian_for_apache_kafka_spark.operators.backup import write_guardian_format

    src = spark.read.parquet(records_parquet)
    archive = str(tmp_path / "archive")
    restored = str(tmp_path / "restored")
    write_guardian_format(src, archive, ChronoUnitSlice("DAYS"))

    cutoff = "2024-01-05T00:00:00Z"
    assert cli_main(["restore", "--source", archive, "--format", "guardian",
                     "--from-when", cutoff, "--target", restored]) == 0
    import datetime as dt

    out = spark.read.parquet(restored)
    expected = src.where(F.col("timestamp") >= F.lit(dt.datetime(2024, 1, 5)))
    assert out.count() == expected.count() > 0


def test_cli_audit_detects_missing_records(spark, records_parquet, tmp_path):
    """audit exits 0 on a complete archive, 3 with the missing count when
    records were lost, and can dump the missing rows themselves."""
    archive = str(tmp_path / "archive")
    partial = str(tmp_path / "partial")
    lost_out = str(tmp_path / "lost")

    assert cli_main(["backup", "--source", records_parquet, "--dest", archive,
                     "--chrono-unit-slice", "hours", "--format", "json"]) == 0
    # complete archive: nothing missing
    assert cli_main(["audit", "--records", records_parquet,
                     "--archive", archive, "--format", "json"]) == 0

    # drop some records from a copy of the archive source and re-archive
    src = spark.read.parquet(records_parquet)
    kept = src.where(F.col("offset") % 10 != 0)
    kept_parquet = str(tmp_path / "kept.parquet")
    kept.write.parquet(kept_parquet)
    assert cli_main(["backup", "--source", kept_parquet, "--dest", partial,
                     "--chrono-unit-slice", "hours", "--format", "json"]) == 0
    assert cli_main(["audit", "--records", records_parquet, "--archive", partial,
                     "--format", "json", "--target", lost_out]) == 3

    lost = spark.read.parquet(lost_out)
    expect = src.where(F.col("offset") % 10 == 0)
    assert lost.count() == expect.count()
    assert {(r.topic, r.partition, r.offset) for r in lost.collect()} == {
        (r.topic, r.partition, r.offset) for r in expect.collect()
    }


def test_cli_backup_period_from_first_non_dry_run(spark, records_parquet, tmp_path):
    """--period-from-first must construct a timedelta-backed PeriodFromFirst;
    regression for the int-seconds crash that only --dry-run dodged."""
    archive = str(tmp_path / "pff_archive")
    assert cli_main(["backup", "--source", records_parquet, "--dest", archive,
                     "--period-from-first", "PT15M", "--format", "json"]) == 0
    from guardian_for_apache_kafka_spark.operators.restore import read_backup_jsonl

    restored = read_backup_jsonl(spark, archive)
    assert restored.count() == spark.read.parquet(records_parquet).count()


def test_cli_maintain_before_compacts_closed_slices(spark, records_parquet, tmp_path):
    """maintain --before on an engine JSON archive (bare ISO directory names)
    — previously crashed in key parsing before any compaction ran."""
    import glob

    archive = str(tmp_path / "m_archive")
    for _ in range(2):
        assert cli_main(["backup", "--source", records_parquet, "--dest", archive,
                         "--chrono-unit-slice", "days", "--format", "json"]) == 0
    assert cli_main(["maintain", "--dest", archive, "--before", "2100-01-01T00:00:00Z"]) == 0
    for d in glob.glob(f"{archive}/slice=*"):
        files = [f for f in os.listdir(d) if not f.startswith(("_", "."))]
        assert len(files) == 1


def test_cli_prepare_training_data(spark, tmp_path):
    """prepare: quality filter -> verified near-dedup -> content-stable
    splits, written parquet partitioned by split; splits are disjoint,
    exhaustive over the surviving docs, and the summary line reconciles."""
    import json as _json

    docs_src = str(tmp_path / "docs")
    out = str(tmp_path / "prepared")
    load_table(spark, "/root/testdata/sf0.001", "documents").write.parquet(docs_src)

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main([
            "prepare", "--documents", docs_src, "--output", out,
            "--splits", "train:0.8,val:0.1,test:0.1",
        ])
    assert rc == 0
    summary = _json.loads(buf.getvalue().strip().splitlines()[-1])
    prepared = spark.read.parquet(out)
    assert summary["docs_out"] == prepared.count()
    assert summary["docs_out"] <= summary["docs_in"]
    assert set(summary["splits"]) == {"train", "val", "test"}
    by_split = {r.split: r.n for r in prepared.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by_split.values()) == summary["docs_out"]
    assert by_split.get("train", 0) > by_split.get("val", 0)
    # no duplicate doc ids survive across splits
    assert prepared.select("doc_id").distinct().count() == summary["docs_out"]
