"""In-engine REST / WebSocket-replay sources via the Python DataSource
API (SURVEY §2.1 S5/S6 — upgraded from out-of-engine producers).

The reference ingests Twelve Data REST quotes and Finnhub WS frames
with driver-side asyncio producers that publish to Kafka
(apache_kafka/producers/stock_producer.py:56-102 and :20-47); Spark
only ever sees the Kafka topic. Here both are first-class Spark
sources built on the Python DataSource API (Spark 4), so the fetch
itself is planned, partitioned, and recovered by the engine:

- ``twelvedata_quotes`` (batch): one input partition per symbol chunk;
  each task fetches ``url`` with ``{symbol}`` substituted (file:// in
  tests, https:// in deployment), parses the ``{"values": [...]}``
  envelope, and applies the reference's normalization — ET→UTC,
  str→float (stock_producer.py:80-93) — executor-side. Twelve Data's
  8-req/min free tier (edge_runner.py:30) maps to ``rate_s`` sleeps
  inside each task; with one API key, set ``symbols_per_task`` high so
  requests serialize in one task instead of parallel tasks sharing a
  budget they can't see.
- ``ws_frames`` (stream): replays recorded WS frames (NDJSON, one
  envelope per line) as a micro-batch stream with **line-count
  offsets** — restart from a checkpoint resumes exactly after the last
  committed line, the recovery semantics the reference's TODO punts to
  Kafka. Emits raw ``value`` strings byte-identical to the Kafka
  frame path, so operators/parse.parse_trade_envelope is the shared
  downstream. A live WS connection is a single socket; the replay
  file stands in for the socket's append-only log, and reads fan out
  over line ranges on executors.
"""

from __future__ import annotations

import json
import os
import time
import urllib.request
from collections.abc import Iterator, Sequence
from datetime import datetime, timezone
from zoneinfo import ZoneInfo

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_QUOTES_SCHEMA = (
    "symbol string, open double, high double, low double, close double, "
    "volume double, timestamp timestamp"
)

_ET = ZoneInfo("America/New_York")


def _fetch_json(url: str, timeout_s: float) -> dict:
    with urllib.request.urlopen(url, timeout=timeout_s) as resp:  # noqa: S310
        return json.load(resp)


def _normalize_quote(symbol: str, q: dict) -> tuple:
    """The reference's record normalization (stock_producer.py:80-93):
    naive exchange-local datetime -> UTC, string fields -> float."""
    dt = datetime.strptime(q["datetime"], "%Y-%m-%d %H:%M:%S")
    dt_utc = dt.replace(tzinfo=_ET).astimezone(timezone.utc)
    return (
        symbol,
        float(q["open"]),
        float(q["high"]),
        float(q["low"]),
        float(q["close"]),
        float(q["volume"]),
        dt_utc,
    )


class _SymbolsPartition(InputPartition):
    def __init__(self, symbols: Sequence[str]):
        self.symbols = list(symbols)


class TwelveDataQuotesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.url = options["url"]
        self.symbols = [s for s in options["symbols"].split(",") if s]
        self.symbols_per_task = int(options.get("symbols_per_task", "1"))
        self.rate_s = float(options.get("rate_s", "0"))
        self.timeout_s = float(options.get("timeout_s", "30"))

    def partitions(self) -> list[InputPartition]:
        k = self.symbols_per_task
        return [
            _SymbolsPartition(self.symbols[i : i + k])
            for i in range(0, len(self.symbols), k)
        ]

    def read(self, partition: _SymbolsPartition) -> Iterator[tuple]:
        for i, symbol in enumerate(partition.symbols):
            if i and self.rate_s:
                time.sleep(self.rate_s)
            payload = _fetch_json(
                self.url.format(symbol=symbol), self.timeout_s
            )
            for q in payload.get("values", []):
                yield _normalize_quote(symbol, q)


class TwelveDataQuotesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "twelvedata_quotes"

    def schema(self) -> str:
        return _QUOTES_SCHEMA

    def reader(self, schema: StructType) -> TwelveDataQuotesReader:
        return TwelveDataQuotesReader(self.options)


class _LineRangePartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class WsFramesStreamReader(DataSourceStreamReader):
    """Offset = committed line count of the replay log."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def initialOffset(self) -> dict:
        return {"line": 0}

    def latestOffset(self) -> dict:
        # NOTE: do not clamp the batch size by shrinking the range in
        # partitions() — the engine commits THIS offset regardless, so
        # any lines partitions() withholds would be skipped forever
        # (and Python stream sources fall back to single-batch under
        # Trigger.AvailableNow anyway).
        if not os.path.exists(self.path):
            return {"line": 0}
        # Count only newline-TERMINATED lines: when tailing a live log, a
        # partial trailing line (writer mid-append) must not be committed —
        # it would be read torn now and skipped complete forever after.
        with open(self.path, "rb") as fh:
            n = sum(1 for line in fh if line.endswith(b"\n"))
        return {"line": n}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = int(start["line"]), int(end["line"])
        if hi <= lo:
            return []
        return [_LineRangePartition(self.path, lo, hi)]

    def read(self, partition: _LineRangePartition) -> Iterator[tuple]:
        with open(partition.path) as fh:
            for i, line in enumerate(fh):
                if i >= partition.end:
                    break
                if i >= partition.start and line.strip():
                    yield (line.rstrip("\n"),)

    def commit(self, end: dict) -> None:
        pass


class WsFramesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ws_frames"

    def schema(self) -> str:
        return "value string"

    def streamReader(self, schema: StructType) -> WsFramesStreamReader:
        return WsFramesStreamReader(self.options)


def register_python_sources(spark: SparkSession) -> None:
    """Register both sources on the session (idempotent)."""
    spark.dataSource.register(TwelveDataQuotesDataSource)
    spark.dataSource.register(WsFramesDataSource)
