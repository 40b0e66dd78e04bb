"""In-engine JSONL sink via the Python DataSource WRITER API.

Completes the Python DataSource surface (sources/pysources.py covers
the batch reader and stream reader): a first-class Spark SINK whose
task/commit protocol the engine plans and recovers, writing one JSON
object per row — the reference's alert-webhook payload shape
(alerts.py, stock_stream.py Slack block) landed durably instead of
POSTed, which is what an audit trail of fired alerts needs anyway.

Commit protocol (both batch and streaming):

- every task writes its rows to ``<path>/_staging/<uuid>.jsonl`` and
  returns the file name in its WriterCommitMessage — a task that dies
  mid-file leaves garbage only in _staging, never in the visible dir;
- driver-side ``commit`` renames the listed files into ``<path>``
  (rename is atomic per file) and, for streaming, stamps
  ``<path>/_batch_<id>.committed`` FIRST — a batch replayed after a
  crash-between-sink-and-checkpoint sees its marker and discards its
  staged files instead of duplicating rows (the same idempotence
  posture as streaming/sinks.upsert_parquet_bucketed);
- ``abort`` deletes the staged files.

Use: ``df.write.format("jsonl_sink").option("path", p).mode("append")``
or ``df.writeStream.format("jsonl_sink")`` after
``register_jsonl_sink(spark)``.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import Row, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _StagedFile(WriterCommitMessage):
    name: str
    n_rows: int


def _stage_rows(path: str, rows: Iterator[Row]) -> _StagedFile:
    staging = os.path.join(path, "_staging")
    os.makedirs(staging, exist_ok=True)
    name = f"{uuid.uuid4().hex}.jsonl"
    n = 0
    with open(os.path.join(staging, name), "w") as f:
        for row in rows:
            f.write(json.dumps(row.asDict(recursive=True), default=str) + "\n")
            n += 1
    return _StagedFile(name=name, n_rows=n)


def _publish(path: str, messages, suffix: str = "") -> None:
    staging = os.path.join(path, "_staging")
    for m in messages:
        if m is None or m.n_rows == 0:
            if m is not None:
                os.remove(os.path.join(staging, m.name))
            continue
        final = m.name if not suffix else f"{suffix}-{m.name}"
        os.rename(os.path.join(staging, m.name), os.path.join(path, final))


def _discard(path: str, messages) -> None:
    staging = os.path.join(path, "_staging")
    for m in messages:
        if m is not None:
            try:
                os.remove(os.path.join(staging, m.name))
            except FileNotFoundError:
                pass


class JsonlBatchWriter(DataSourceWriter):
    def __init__(self, path: str) -> None:
        self.path = path

    def write(self, iterator: Iterator[Row]) -> _StagedFile:
        return _stage_rows(self.path, iterator)

    def commit(self, messages) -> None:
        _publish(self.path, messages)

    def abort(self, messages) -> None:
        _discard(self.path, messages)


class JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, path: str) -> None:
        self.path = path

    def write(self, iterator: Iterator[Row]) -> _StagedFile:
        return _stage_rows(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        marker = os.path.join(self.path, f"_batch_{batchId}.committed")
        if os.path.exists(marker):
            # replayed batch (crash landed between sink commit and
            # checkpoint commit): output is already visible — drop the
            # replay's staged files instead of duplicating them
            _discard(self.path, messages)
            return
        # marker goes down atomically-enough first: a crash after some
        # renames but before the marker replays the batch, and replayed
        # staged files get fresh uuids — the risk window duplicates
        # nothing because publish happens after the marker exists
        with open(marker + ".tmp", "w") as f:
            f.write(json.dumps({"batch": batchId, "files": len(messages)}))
        os.rename(marker + ".tmp", marker)
        _publish(self.path, messages, suffix=f"b{batchId}")

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        _discard(self.path, messages)


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_sink requires option 'path'")
        return path

    def writer(self, schema, overwrite: bool) -> JsonlBatchWriter:
        path = self._path()
        if overwrite:
            for f in os.listdir(path) if os.path.isdir(path) else []:
                if f.endswith(".jsonl"):
                    os.remove(os.path.join(path, f))
        os.makedirs(path, exist_ok=True)
        return JsonlBatchWriter(path)

    def streamWriter(self, schema, overwrite: bool) -> JsonlStreamWriter:
        path = self._path()
        os.makedirs(path, exist_ok=True)
        return JsonlStreamWriter(path)


def register_jsonl_sink(spark: SparkSession) -> None:
    spark.dataSource.register(JsonlSinkDataSource)


def read_jsonl_dir(path: str) -> list[dict]:
    """Driver-side helper for tests/audits: all committed rows."""
    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".jsonl"):
            continue
        with open(os.path.join(path, f)) as fh:
            out.extend(json.loads(line) for line in fh if line.strip())
    return out
