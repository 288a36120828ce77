"""Custom stateful streaming operator: PeriodFromFirst slice assignment.

The reference's one genuinely stateful semantic (SURVEY.md §4.3): slice
boundaries anchored at the FIRST record's event time
(core-backup/src/main/scala/io/aiven/guardian/kafka/backup/
BackupClientInterface.scala:188-205 ``sourceWithFirstRecord`` +
:551-563 window-index math), configured by PeriodFromFirst
(core-backup/.../configs/TimeConfiguration.scala:9-14).

API note: Spark 4's newer ``transformWithStateInPandas`` (value/list/map
state, timers) would be the forward path for these operators, but its
state-server protocol requires ``google.protobuf``, which is not importable
in this environment (verified: the TWS driver worker crashes on
``cannot import name 'descriptor' from 'google.protobuf'``) — so the
stateful surface stays on ``applyInPandasWithState``, which is
protobuf-free and fully supported.

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


BOUNDARY_OUTPUT_SCHEMA = "topic STRING, slice_idx BIGINT, record_cnt BIGINT"
BOUNDARY_STATE_SCHEMA = "slice_idx BIGINT, record_cnt BIGINT"


def stream_slice_counts_boundary_mode(
    records: DataFrame, period_seconds: int = 3600
) -> DataFrame:
    """The reference's exact slice-closure semantics: a slice closes only when
    a record with a strictly greater slice index ARRIVES (isAtBoundary,
    BackupClientInterface.scala:543-549) — no watermark, no event-time
    progress rule; out-of-order records land in whatever slice is current.

    This is the documented divergence-discharge operator (SURVEY.md §2.2
    streaming row / §7 risk register): ``stream_slice_counts`` closes windows
    by watermark; this operator reproduces close-on-next-record for
    byte-format parity tests and idle-then-burst topics. The LAST slice per
    topic never closes (exactly like the reference, whose final file is only
    terminated by shutdown, T9); a finite replay therefore yields batch-G2
    results minus each topic's final slice.

    Slice index uses calendar alignment (epoch-anchored tumbling windows, the
    ChronoUnitSlice mode); state per topic = (current slice, running count).
    """
    period = _period_us(period_seconds)

    def close_on_boundary(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        (topic,) = key
        cur, cnt = state.get if state.exists else (None, 0)
        closed: list[tuple[int, int]] = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            for ts_us in (pdf["timestamp"].astype("int64") // 1000).tolist():
                idx = ts_us // period
                if cur is None:
                    cur, cnt = idx, 0
                elif idx > cur:  # strictly-greater index fires the boundary
                    closed.append((cur, cnt))
                    cur, cnt = idx, 0
                cnt += 1
        state.update((cur, cnt))
        if closed:
            yield pd.DataFrame(
                {
                    "topic": [topic] * len(closed),
                    "slice_idx": [c[0] for c in closed],
                    "record_cnt": [c[1] for c in closed],
                }
            )

    return records.groupBy("topic").applyInPandasWithState(
        close_on_boundary,
        outputStructType=BOUNDARY_OUTPUT_SCHEMA,
        stateStructType=BOUNDARY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
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


ZSCORE_OUTPUT_SCHEMA = (
    "event_type STRING, event_id BIGINT, ts TIMESTAMP, value DOUBLE, z DOUBLE"
)
ZSCORE_STATE_SCHEMA = "xs ARRAY<BIGINT>"


def stream_zscore_anomalies(
    events: DataFrame,
    lookback: int = 20,
    z_threshold: float = 3.0,
    scale: int = 100,
) -> DataFrame:
    """Streaming twin of ``timeseries.rolling_zscore_anomalies``: per-key
    rolling z-score over the last ``lookback`` values, with the ring buffer
    of scaled int64 values as the ONLY state (bounded: lookback longs per
    key, checkpoint-persisted across restarts).

    Arithmetic mirrors the batch operator exactly — int64 cents (HALF-UP
    rounding, matching Spark's ``round``), integer window sums, then
    ``(n*x - sx) * sqrt((n-1)/(n*var))`` in IEEE doubles — so on a finite
    replay whose micro-batches arrive in (ts, id) order the emissions equal
    the batch result row-for-row (asserted in test_streaming). Within each
    micro-batch rows are sorted by (ts, id); cross-batch order is the
    stream's arrival order, the standard streaming-analytics contract (an
    out-of-order record scores against the window as of its arrival)."""
    import math

    import numpy as np

    def score(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        buf = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            v = pdf["value"].to_numpy()
            xs = np.where(
                v >= 0, np.floor(v * scale + 0.5), np.ceil(v * scale - 0.5)
            ).astype("int64")
            keep, zs = [], []
            for i, x in enumerate(xs):
                if len(buf) >= lookback:
                    w = buf[-lookback:]
                    n = lookback
                    sx = sum(w)
                    sxx = sum(y * y for y in w)
                    var = n * sxx - sx * sx
                    if var > 0:
                        z = (n * int(x) - sx) * math.sqrt((n - 1) / (n * var))
                        if abs(z) >= z_threshold:
                            keep.append(i)
                            zs.append(z)
                buf.append(int(x))
                del buf[:-lookback]
            out = pdf.iloc[keep][["event_type", "event_id", "ts", "value"]].copy()
            out["z"] = zs
            yield out
        state.update((buf[-lookback:],))

    return events.select("event_type", "event_id", "ts", "value").groupBy(
        "event_type"
    ).applyInPandasWithState(
        score,
        outputStructType=ZSCORE_OUTPUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


FUNNEL_OUTPUT_SCHEMA = (
    "user_id LONG, n_seen LONG, steps_completed INT, "
    "step1_us LONG, step2_us LONG, step3_us LONG"
)
FUNNEL_STATE_SCHEMA = (
    "s1 LONG, i1 LONG, s2 LONG, i2 LONG, s3 LONG, i3 LONG, n LONG"
)


def stream_funnel_steps(
    events: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Streaming twin of ``timeseries.funnel_steps`` (q45): a per-user
    funnel state machine — state is the first QUALIFIED (ts_us, event_id)
    per step plus an event counter (7 longs/user, checkpoint-persisted).
    A step qualifies only with a strictly-earlier qualified previous step
    in (ts, event_id) LEX order — exactly the batch rule (q45 orders rows
    by (ts, id), so a same-timestamp chain with ascending event ids DOES
    qualify; a plain ts > comparison would diverge on ties). On a finite
    replay arriving in (ts, event_id) order the latest emission per user
    equals the batch operator's row (asserted in test_streaming). Emits
    the user's current funnel row every batch the user appears in
    (Update-style; ``n_seen`` is the monotone pick-latest key).

    This is the state-machine shape ``transformWithStateInPandas`` targets;
    see the module docstring for why it stays on applyInPandasWithState
    here."""

    def advance(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            s1, i1, s2, i2, s3, i3, n = state.get
        else:
            s1 = i1 = s2 = i2 = s3 = i3 = None
            n = 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
            for r in pdf.itertuples():
                n += 1
                t, e = int(r.ts_us), int(r.event_id)
                if r.event_type == steps[0]:
                    if s1 is None or (t, e) < (s1, i1):
                        s1, i1 = t, e
                elif r.event_type == steps[1]:
                    if s1 is not None and (t, e) > (s1, i1) and s2 is None:
                        s2, i2 = t, e
                elif r.event_type == steps[2]:
                    if s2 is not None and (t, e) > (s2, i2) and s3 is None:
                        s3, i3 = t, e
        state.update((s1, i1, s2, i2, s3, i3, n))
        done = 3 if s3 is not None else (2 if s2 is not None else (1 if s1 is not None else 0))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_seen": [n],
                "steps_completed": [done],
                "step1_us": [s1],
                "step2_us": [s2],
                "step3_us": [s3],
            }
        )

    prepared = events.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        advance,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


ATTRIBUTION_OUTPUT_SCHEMA = (
    "user_id BIGINT, event_id BIGINT, ts_us BIGINT, channel STRING, value DOUBLE"
)
ATTRIBUTION_STATE_SCHEMA = "last_ts_us BIGINT, last_event_id BIGINT, channel STRING"


def stream_last_touch(events: DataFrame) -> DataFrame:
    """Streaming twin of q75 last-touch attribution: per-user state is the
    LATEST non-purchase event seen so far (by (ts, event_id) lex order —
    the batch window's exact order key); each purchase row emits an
    attribution record crediting that channel ('direct' when the purchase
    opens the timeline). State is 2 longs + a short string per user,
    checkpoint-persisted, so the stream attributes forever at O(users)
    state. Batch rows are processed in (ts_us, event_id) order; on a
    finite replay arriving in event-time order the emitted attributions
    equal the batch q75 rows exactly (asserted in test_streaming). An
    out-of-order straggler ACROSS micro-batches attributes against the
    state as-of processing — the documented funnel-twin caveat; bound it
    upstream with a watermark + sorted replay where exactness matters."""

    def attribute(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            lt, le, ch = state.get
        else:
            lt = le = ch = None
        out = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
            for r in pdf.itertuples():
                t, e = int(r.ts_us), int(r.event_id)
                if r.event_type == "purchase":
                    out.append(
                        {
                            "user_id": key[0],
                            "event_id": e,
                            "ts_us": t,
                            "channel": ch if ch is not None else "direct",
                            "value": float(r.value),
                        }
                    )
                elif lt is None or (t, e) > (lt, le):
                    lt, le, ch = t, e, str(r.event_type)
        state.update((lt, le, ch))
        yield pd.DataFrame(
            out,
            columns=["user_id", "event_id", "ts_us", "channel", "value"],
        )

    prepared = events.select(
        "user_id", "event_id", "event_type", "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        attribute,
        outputStructType=ATTRIBUTION_OUTPUT_SCHEMA,
        stateStructType=ATTRIBUTION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


DEBOUNCE_OUTPUT_SCHEMA = (
    "user_id BIGINT, event_type STRING, event_id BIGINT, ts_us BIGINT, "
    "value DOUBLE"
)
DEBOUNCE_STATE_SCHEMA = "last_ts_us BIGINT, last_event_id BIGINT"


def stream_debounce(events: DataFrame, gap_seconds: int = 300) -> DataFrame:
    """Streaming twin of q91 debouncing: per (user, event_type), emit only
    rows that OPEN a burst — more than ``gap_seconds`` after the previous
    row of that key (the previous ROW, kept or not, exactly like the
    batch lag() formulation). State = the last-seen (ts, event_id), two
    longs per key, checkpoint-persisted; on an in-order finite replay the
    emitted set equals the batch keep=1 rows (asserted in
    test_streaming). The gap compares SECOND-truncated epochs — exactly
    the batch unix_timestamp()/date_diff('second') arithmetic — so
    sub-second fractions can't diverge the twins at the 300 s knife edge.
    The out-of-order caveat matches stream_last_touch."""

    def debounce(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            lt, le = state.get
        else:
            lt = le = None
        out = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
            for r in pdf.itertuples():
                t, e = int(r.ts_us), int(r.event_id)
                if lt is None or t // 1_000_000 - lt // 1_000_000 > gap_seconds:
                    out.append(
                        {
                            "user_id": key[0],
                            "event_type": key[1],
                            "event_id": e,
                            "ts_us": t,
                            "value": float(r.value),
                        }
                    )
                lt, le = t, e
        state.update((lt, le))
        yield pd.DataFrame(
            out, columns=["user_id", "event_type", "event_id", "ts_us", "value"]
        )

    prepared = events.select(
        "user_id", "event_type", "event_id", "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    return prepared.groupBy("user_id", "event_type").applyInPandasWithState(
        debounce,
        outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
        stateStructType=DEBOUNCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


SILENCE_OUTPUT_SCHEMA = "user_id BIGINT, last_seen_us BIGINT, alerted BOOLEAN"
SILENCE_STATE_SCHEMA = "last_seen_us BIGINT"


def stream_silence_alerts(events: DataFrame, silence_seconds: int = 3600) -> DataFrame:
    """Dead-man's-switch over user activity (q88's streaming complement):
    alert when a user goes silent for ``silence_seconds`` of EVENT time.
    State = last-seen timestamp per user with an **event-time timeout** at
    last_seen + silence: when the watermark passes that point with no new
    activity, Spark invokes the function with ``state.hasTimedOut`` and
    the alert fires WITHOUT any row for that user — the push-style gap
    detection a batch lag() scan can only discover after the fact. New
    activity re-arms the timeout. The input must carry a watermark (the
    caller's ``withWatermark``), which also bounds state recovery time.

    Emits (user_id, last_seen_us, alerted): alerted=false heartbeat rows
    on activity (pick-latest per user downstream), alerted=true exactly
    when the silence window expires; timed-out state is REMOVED, so a
    returning user alerts again after the next silence."""

    def track(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (last,) = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "last_seen_us": [last], "alerted": [True]}
            )
            return
        last = state.get[0] if state.exists else None
        for pdf in pdfs:
            if pdf.empty:
                continue
            mx = int(pdf["ts_us"].max())
            last = mx if last is None else max(last, mx)
        if last is not None:
            state.update((last,))
            # event-time timeout: alert when the watermark passes this
            state.setTimeoutTimestamp(last // 1000 + silence_seconds * 1000)
            yield pd.DataFrame(
                {"user_id": [key[0]], "last_seen_us": [last], "alerted": [False]}
            )

    prepared = events.select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=SILENCE_OUTPUT_SCHEMA,
        stateStructType=SILENCE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="EventTimeTimeout",
    )


MARKOV_OUTPUT_SCHEMA = (
    "user_id BIGINT, from_type STRING, to_type STRING, event_id BIGINT, "
    "ts_us BIGINT"
)
MARKOV_STATE_SCHEMA = "last_ts_us BIGINT, last_event_id BIGINT, last_type STRING"


def stream_markov_transitions(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Streaming twin of q98's transition extraction: per user, every
    consecutive in-session pair (gap <= ``gap_seconds``) emits a
    (from_type, to_type) transition row; a gap beyond the threshold opens
    a new session and emits nothing — exactly the batch lead()-inside-
    session formulation. Counting the emitted rows by (from_type, to_type)
    and row-normalizing reproduces the q98 matrix (asserted in
    test_streaming), so the downstream estimator can stay a trivial
    always-correct aggregate while THIS operator holds the only state:
    the last-seen (ts, event_id, type) per user — two longs and a short
    string, checkpoint-persisted, O(users) forever.

    The gap compares SECOND-truncated epochs (the batch
    unix_timestamp()/date_diff('second') arithmetic — the
    stream_debounce discipline) so sub-second fractions can't diverge
    the twins at the session knife edge. Batch rows are processed in
    (ts_us, event_id) order; the out-of-order-across-micro-batches caveat
    matches stream_last_touch."""

    def transitions(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            lt, le, lty = state.get
        else:
            lt = le = lty = None
        out = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
            for r in pdf.itertuples():
                t, e = int(r.ts_us), int(r.event_id)
                if (
                    lt is not None
                    and t // 1_000_000 - lt // 1_000_000 <= gap_seconds
                ):
                    out.append(
                        {
                            "user_id": key[0],
                            "from_type": lty,
                            "to_type": str(r.event_type),
                            "event_id": e,
                            "ts_us": t,
                        }
                    )
                lt, le, lty = t, e, str(r.event_type)
        state.update((lt, le, lty))
        yield pd.DataFrame(
            out, columns=["user_id", "from_type", "to_type", "event_id", "ts_us"]
        )

    prepared = events.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        transitions,
        outputStructType=MARKOV_OUTPUT_SCHEMA,
        stateStructType=MARKOV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


EWMA_OUTPUT_SCHEMA = (
    "user_id LONG, event_id LONG, ts TIMESTAMP, value DOUBLE, ewma DOUBLE"
)
EWMA_STATE_SCHEMA = "ewma DOUBLE, n LONG"


def stream_ewma(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Streaming twin of q102's EWMA smoother, running the UNTRUNCATED
    textbook recurrence ``ewma_i = alpha * x_i + (1 - alpha) * ewma_{i-1}``
    (seeded with the first value) per user — the form that is inherently
    sequential and therefore lives here rather than in a batch window
    (q102's batch plan truncates to 8 lags instead; the two agree to within
    the (1-alpha)^8 tail by construction).

    State is two scalars per key (current ewma + count), checkpoint-
    persisted, so restarts continue the recurrence exactly. Within each
    micro-batch rows are sorted by (ts, event_id); cross-batch order is
    arrival order — the same contract as stream_zscore_anomalies. On a
    finite in-order replay the emissions equal a per-key sequential fold
    over the batch table row-for-row (asserted in test_streaming)."""

    def smooth(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ewma, n = state.get
        else:
            ewma, n = 0.0, 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            out = []
            for x in pdf["value"]:
                x = float(x)
                ewma = x if n == 0 else alpha * x + (1.0 - alpha) * ewma
                n += 1
                out.append(ewma)
            res = pdf[["user_id", "event_id", "ts", "value"]].copy()
            res["ewma"] = out
            yield res
        state.update((ewma, n))

    return events.select("user_id", "event_id", "ts", "value").groupBy(
        "user_id"
    ).applyInPandasWithState(
        smooth,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
