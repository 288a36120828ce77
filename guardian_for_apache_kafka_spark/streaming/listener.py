"""Control-plane parity: query monitoring and lifecycle management.

The reference's control plane (SURVEY.md §2.1 "Control-plane operators"):
Stop-on-error supervision (cli-backup/.../App.scala:24-31), restart-with-
backoff on storage errors (backup-s3/.../BackupClient.scala:209-211), drain-
and-shutdown hooks (core-cli/.../MainUtils.scala:21-40). In Structured
Streaming those responsibilities split between the engine (task retries,
checkpoint-resume) and a ``StreamingQueryListener`` for the observability
piece — this module provides that listener plus the restart-with-backoff
wrapper for driver-visible failures (the analogue of RestartSink settings
5 ms → 10 s, core-s3/src/main/resources/reference.conf).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.listener import StreamingQueryListener


class ProgressListener(StreamingQueryListener):
    """Collects per-batch progress (rows/sec, batch durations, state size)
    and terminal events — the backup-lag dashboard feed. Pure accumulation;
    read ``progress``/``terminated`` from the driver."""

    def __init__(self) -> None:
        self.progress: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[tuple[str, str | None]] = []

    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.progress.append(
            {
                "id": str(p.id),
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "durationMs": dict(p.durationMs) if p.durationMs else {},
            }
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing dependent
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append((str(event.id), event.exception))


def run_with_restarts(
    start_query: Callable[[], StreamingQuery],
    max_restarts: int = 3,
    min_backoff_s: float = 0.005,
    max_backoff_s: float = 10.0,
    factor: float = 2.0,
) -> StreamingQuery:
    """Restart-with-backoff for driver-visible stream failures — the engine
    twin of the reference's RestartSink (5ms floor / 10s ceiling defaults
    from its reference.conf). ``start_query`` must be checkpoint-backed so a
    restart resumes instead of reprocessing; returns the first query handle
    that runs to successful termination (awaitTermination() without raising).
    """
    backoff = min_backoff_s
    attempt = 0
    while True:
        q = start_query()
        try:
            q.awaitTermination()
            return q
        except Exception:
            attempt += 1
            if attempt > max_restarts:
                raise
            time.sleep(backoff)
            backoff = min(backoff * factor, max_backoff_s)
