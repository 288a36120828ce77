#!/usr/bin/env python
"""Streaming backup throughput micro-bench (SCALE.md evidence).

Stages the sf0.1 events table as guardian records on local disk, then
drives the engine's streaming archival paths end-to-end (file source ->
transform -> sink incl. checkpoint commit) with availableNow, reporting
records/second of sustained wall-clock throughput. The reference pipeline
is single-consumer sequential by construction
(core-backup BackupClientInterface.scala:498 mergeSubstreamsWithParallelism(1),
backup-s3 BackupClient.scala:252 chunkingParallelism=1), so any multi-core
number here is structural headroom, not tuning.

Usage: python scripts/stream_throughput.py  (env: SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from guardian_for_apache_kafka_spark.core import normalize_events_to_records  # noqa: E402
from guardian_for_apache_kafka_spark.session import get_spark  # noqa: E402
from guardian_for_apache_kafka_spark.sources.tables import load_table  # noqa: E402
from guardian_for_apache_kafka_spark.streaming.pipeline import (  # noqa: E402
    records_file_stream,
    stream_backup,
    stream_backup_foreach_batch,
)


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("guardian-stream-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf, "events")
    rep = int(os.environ.get("STREAM_TP_REPLICATE", "1"))
    if rep > 1:
        # replicate with offset-shifted copies: bigger corpus, same schema —
        # shows the micro-batch fixed overhead amortizing into real rate
        reps = spark.range(rep).select(F.col("id").alias("__rep"))
        ev = ev.crossJoin(reps).withColumn(
            "event_id", F.col("event_id") * rep + F.col("__rep")
        ).drop("__rep")
    records = normalize_events_to_records(ev).withColumn(
        "timestamp", F.timestamp_millis(F.unix_millis("timestamp"))
    )
    n = records.count()
    work = tempfile.mkdtemp(prefix="stream-tp-")
    src = os.path.join(work, "in")
    # 8 input files ~= 8 micro-batch-able units; availableNow drains them all
    records.repartition(8).write.parquet(src)

    def run(label, starter):
        dest = os.path.join(work, label, "out")
        ckpt = os.path.join(work, label, "ck")
        t0 = time.perf_counter()
        q = starter(records_file_stream(spark, src), dest, ckpt)
        q.awaitTermination(600)
        dt = time.perf_counter() - t0
        print(f"{label:34s} {n / dt:10.0f} records/s  ({n} records, {dt:.2f} s)")

    # JSONL-partitioned archival sink (the engine's parallel bulk shape)
    run("stream_backup (jsonl, hourly)", stream_backup)
    # byte-exact guardian-format writer via foreachBatch (reference parity path)
    from guardian_for_apache_kafka_spark.core.timeslice import ChronoUnitSlice

    run(
        "stream_backup_foreach_batch",
        lambda s, d, c: stream_backup_foreach_batch(
            s, d, c, ChronoUnitSlice("HOURS")
        ),
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
