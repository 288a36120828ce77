"""Spark-4 Python DataSource exposing guardian-format archives as a
first-class format: ``spark.read.format("guardian").load(dest)``.

The reference's archive (one JSON array object per time slice, optionally
gzip, ``null]`` interruption sentinel — SURVEY.md §1.2/§1.3) becomes a
native source with:

- one input partition PER ARCHIVE OBJECT (slice-parallel scan, the same
  parallelism unit as the reference's restore listing,
  core-restore/.../RestoreClientInterface.scala:33-43);
- PLANNING-TIME slice pruning from the ``fromWhen`` option — the R3
  ``-1``-slice straddle rule applied before any file opens, so pruned
  objects never reach an executor;
- row-level FILTER PUSHDOWN via the DataSource ``pushFilters`` API:
  ``EqualTo``/``In`` on ``topic`` and ``IsNotNull`` on ``key`` are
  consumed inside the reader (records die at parse time); everything else
  is handed back to Spark.

This is the INTEGRATION surface — schema, partitioning and pushdown for
ad-hoc SQL over archives. The JVM-side ``operators/restore.py`` paths
remain the bulk-restore hot path (whole-file text scan + ``from_json``,
no Python in the loop); parity between the two is asserted in
tests/test_backup_restore.py.
"""

from __future__ import annotations

import base64
import datetime as _dt
import gzip as _gzip
import io
import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    IsNotNull,
)
from pyspark.sql.types import StructType

from guardian_for_apache_kafka_spark.core.model import RECORD_SCHEMA

#: single source of truth for the record shape (incl. nullability)
RECORD_STRUCT = RECORD_SCHEMA


class GuardianObjectPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _open_bytes(path: str) -> bytes:
    """Read one archive object. ``scheme://`` paths go through
    ``pyarrow.fs.FileSystem.from_uri`` (the executor-side FS dispatch the
    guardian writer uses, operators/backup.py); bare paths use plain
    open."""
    if "://" in path:
        from pyarrow.fs import FileSystem

        fs, inner = FileSystem.from_uri(path)
        with fs.open_input_stream(inner) as fh:
            return fh.read()
    with open(path, "rb") as fh:
        return fh.read()


class GuardianReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("guardian datasource requires a path")
        self.from_when = options.get("fromwhen")  # options arrive lowercased
        self.topics: set[str] | None = None
        self.require_key = False

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        def narrow(values: set) -> None:
            # filters arrive as a CONJUNCTION: successive topic predicates
            # INTERSECT (overwriting would wrongly widen consumed filters)
            self.topics = values if self.topics is None else (self.topics & values)

        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("topic",):
                narrow({f.value})
            elif isinstance(f, In) and f.attribute == ("topic",):
                narrow(set(f.value))  # the In dataclass field is `value`
            elif isinstance(f, IsNotNull) and f.attribute == ("key",):
                self.require_key = True
            else:
                yield f  # not consumed — Spark applies it post-scan

    def partitions(self) -> Sequence[GuardianObjectPartition]:
        # planning-time listing + R3 pruning; the key list is slice-count
        # bounded (same driver cost as the reference's restore listing)
        import os

        from guardian_for_apache_kafka_spark.operators.backup import physical_name
        from guardian_for_apache_kafka_spark.operators.restore import (
            list_backup_keys,
            prune_keys_from_when,
        )

        keys = list_backup_keys(self.path)
        if self.from_when:
            cut = _dt.datetime.fromisoformat(self.from_when.replace("Z", "+00:00"))
            keys = prune_keys_from_when(keys, cut)
        return [
            GuardianObjectPartition(os.path.join(self.path, physical_name(k)))
            for k in keys
        ]

    def read(self, partition: GuardianObjectPartition) -> Iterator[tuple]:
        blob = _open_bytes(partition.path)
        if partition.path.endswith(".gz"):
            blob = _gzip.GzipFile(fileobj=io.BytesIO(blob)).read()
        try:
            records = json.loads(blob.decode("utf-8"))
        except ValueError:
            # truncated object without the null] sentinel: the JVM restore
            # path silently skips it (from_json -> null), so the DataSource
            # matches; run scan_corrupt_files / the check verb for loudness
            return
        for rec in records:
            if rec is None:
                continue  # the null] interruption sentinel (SURVEY §1.2)
            topic = rec["topic"]
            if self.topics is not None and topic not in self.topics:
                continue
            key_b64 = rec.get("key")
            if self.require_key and key_b64 is None:
                continue
            yield (
                topic,
                rec["partition"],
                rec["offset"],
                None if key_b64 is None else base64.b64decode(key_b64),
                base64.b64decode(rec["value"]),
                _dt.datetime.fromtimestamp(rec["timestamp"] / 1000.0, _dt.timezone.utc),
                rec["timestamp_type"],
            )


class GuardianDataSource(DataSource):
    """``spark.read.format("guardian")`` after
    :func:`register_guardian_datasource`."""

    @classmethod
    def name(cls) -> str:
        return "guardian"

    def schema(self) -> StructType:
        return RECORD_STRUCT

    def reader(self, schema: StructType) -> GuardianReader:
        return GuardianReader(self.options)

    def streamReader(self, schema: StructType) -> "GuardianStreamReader":
        return GuardianStreamReader(self.options)


def register_guardian_datasource(spark) -> None:
    """Register the format for the session (idempotent) and enable the
    Python-datasource filter pushdown the reader implements (off by
    default in Spark 4.1; runtime-settable)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(GuardianDataSource)


class GuardianStreamReader(DataSourceStreamReader):
    """Streaming half: ``spark.readStream.format("guardian")`` — a
    micro-batch source over the archive's time-sorted object list. The
    offset is simply "objects consumed": the key list is sorted by slice
    time and new slices always sort after consumed ones, so each
    micro-batch reads exactly the objects that appeared since the last
    committed offset (one input partition per object). This gives
    guardian-format archives the streaming restore the JSON-lines layout
    gets from the file source (``streaming/pipeline.stream_restore``);
    pace with the trigger interval.

    Contract: objects are treated as immutable once listed — stream CLOSED
    slices (a ChronoUnitSlice still being appended to would be read once,
    short; stay behind the active slice, exactly like compaction's
    ``before`` discipline)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("guardian datasource requires a path")
        self.from_when = options.get("fromwhen")
        self._listed: list[str] = []

    def _keys(self) -> list[str]:
        from guardian_for_apache_kafka_spark.operators.restore import list_backup_keys

        self._listed = list_backup_keys(self.path)
        return self._listed

    def initialOffset(self) -> dict:
        # fromWhen = start behind the R3-pruned prefix instead of slice 0
        # (same semantics as the batch reader's planning-time pruning)
        if not self.from_when:
            return {"consumed": 0}
        from guardian_for_apache_kafka_spark.operators.restore import (
            prune_keys_from_when,
        )

        keys = self._keys()
        cut = _dt.datetime.fromisoformat(self.from_when.replace("Z", "+00:00"))
        kept = prune_keys_from_when(keys, cut)
        return {"consumed": len(keys) - len(kept)}

    def latestOffset(self) -> dict:
        # monotone by construction: keys only ever append in time order
        return {"consumed": len(self._keys())}

    def partitions(self, start: dict, end: dict) -> Sequence[GuardianObjectPartition]:
        import os

        from guardian_for_apache_kafka_spark.operators.backup import physical_name

        # reuse the listing latestOffset() just took for this batch; relist
        # only if this end outruns it (e.g. replay after restart)
        keys = self._listed if len(self._listed) >= end["consumed"] else self._keys()
        keys = keys[start["consumed"]:end["consumed"]]
        return [
            GuardianObjectPartition(os.path.join(self.path, physical_name(k)))
            for k in keys
        ]

    def read(self, partition: GuardianObjectPartition) -> Iterator[tuple]:
        return GuardianReader({"path": self.path}).read(partition)

    def commit(self, end: dict) -> None:
        pass  # progress lives in the checkpoint's offset log
