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
