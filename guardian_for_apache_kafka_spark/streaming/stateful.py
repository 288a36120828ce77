"""Custom stateful streaming operator: PeriodFromFirst slice assignment.

The reference's one genuinely stateful semantic (SURVEY.md §4.3): slice
boundaries anchored at the FIRST record's event time
(core-backup/src/main/scala/io/aiven/guardian/kafka/backup/
BackupClientInterface.scala:188-205 ``sourceWithFirstRecord`` +
:551-563 window-index math), configured by PeriodFromFirst
(core-backup/.../configs/TimeConfiguration.scala:9-14).

Spark-first realization: ``applyInPandasWithState`` keyed by topic. The group
state holds one long — the anchor (first-seen event time in µs); every batch
annotates its records with ``slice_idx = (ts_us - anchor_us) div period_us``
(exactly BackupClientInterface.scala:551-563) and the anchor persists in the
checkpoint, so restarts keep slicing against the same origin — strictly
stronger than the reference, which opens a fresh anchor per run
(TimeConfiguration.scala:9-14 "not resumable").

Keying note: the reference runs ONE merged consumer stream, so its anchor is
global; a distributed engine needs a shuffle key for state, and per-topic is
the coarsest key that still partitions (a global anchor would serialize the
cluster through one state partition — the same scale defect as the
reference's mergeSubstreamsWithParallelism(1)). Per-topic anchors equal the
reference's behavior whenever a single topic is backed up, and are
batch-reproducible as ``anchor = min(ts) over topic`` on finite replays.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # GroupState is provided by the runtime at call time
    from pyspark.sql.streaming.state import GroupState

OUTPUT_SCHEMA = (
    "topic STRING, partition INT, offset BIGINT, timestamp TIMESTAMP, slice_idx BIGINT"
)
STATE_SCHEMA = "anchor_us BIGINT"


def _period_us(period_seconds: int) -> int:
    return int(period_seconds) * 1_000_000


def anchored_slice_records(records: DataFrame, period_seconds: int = 900) -> DataFrame:
    """Annotate a streaming record DataFrame with PeriodFromFirst slice indexes.

    Works on any DataFrame carrying (topic, partition, offset, timestamp);
    output adds ``slice_idx``. On a finite replayed input the result equals
    the batch expression floor((unix_micros(ts) - min-anchor-per-topic)/period)
    (the G3 query) — the batch/stream equivalence tests assert exactly that.
    """
    period = _period_us(period_seconds)

    def assign(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        (anchor_us,) = state.get if state.exists else (None,)
        for pdf in pdfs:
            if pdf.empty:
                continue
            ts_us = pdf["timestamp"].astype("int64") // 1000
            if anchor_us is None:
                # first record ever seen for this topic anchors the windows;
                # micro-batches arrive in offset order per partition, so "first
                # row of the first batch" matches the reference's prefixAndTail(1)
                anchor_us = int(ts_us.iloc[0])
                state.update((anchor_us,))
            out = pdf[["topic", "partition", "offset", "timestamp"]].copy()
            out["slice_idx"] = (ts_us - anchor_us) // period
            yield out

    return (
        records.groupBy("topic")
        .applyInPandasWithState(
            assign,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


COMPACT_OUTPUT_SCHEMA = (
    "topic STRING, partition INT, key BINARY, offset BIGINT, "
    "timestamp TIMESTAMP, value BINARY"
)
COMPACT_STATE_SCHEMA = "ts_us BIGINT, offset BIGINT, value BINARY"


def stream_compact_latest(records: DataFrame) -> DataFrame:
    """Continuous key-latest compaction — the reference's *intended* compaction
    (GCS compactionBucket config, core-gcs/.../configs/GCS.scala:9; Postgres
    skeleton left as ``???``, core-compaction/.../PostgresJDBCDatabase.scala:46-47)
    as a live materialized view instead of a batch job.

    State per (topic, partition, key): the winning (timestamp, offset, value).
    Each micro-batch emits one row per key whose winner changed — downstream
    ``foreachBatch`` upserts or an append sink gives a changelog whose last
    row per key equals the batch ``compact_latest_by_key`` result (asserted by
    the equivalence test). Later = greater (timestamp, offset), identical to
    the batch operator's ordering. NULL-key records are not compactable and
    must be routed around this operator (the batch twin passes them through).

    State size = number of live keys x record payload; at 100 TB scope the
    key space per (topic, partition) group or use RocksDB state store —
    the operator itself is already partition-parallel on the group key.
    """

    def compact(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        best = state.get if state.exists else None
        changed = False
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.assign(__ts_us=pdf["timestamp"].astype("int64") // 1000)
            top = pdf.sort_values(["__ts_us", "offset"]).iloc[-1]
            cand = (int(top["__ts_us"]), int(top["offset"]), top["value"])
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
                changed = True
        if changed and best is not None:
            state.update((best[0], best[1], bytes(best[2]) if best[2] is not None else None))
            topic, partition, k = key
            yield pd.DataFrame(
                {
                    "topic": [topic],
                    "partition": [partition],
                    "key": [k],
                    "offset": [best[1]],
                    "timestamp": [pd.Timestamp(best[0], unit="us")],
                    "value": [best[2]],
                }
            )

    return (
        records.where(F.col("key").isNotNull())
        .groupBy("topic", "partition", "key")
        .applyInPandasWithState(
            compact,
            outputStructType=COMPACT_OUTPUT_SCHEMA,
            stateStructType=COMPACT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
