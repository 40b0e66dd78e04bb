"""S5/S6 as real in-engine sources (Python DataSource API): REST quote
fetch planned/partitioned by Spark, WS-frame replay with line-count
offset recovery."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sparktrends_spark.operators.parse import parse_trade_envelope
from sparktrends_spark.sources.pysources import register_python_sources

SYMS = ["AAPL", "MSFT", "NVDA"]


@pytest.fixture(scope="module")
def quote_dir(tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("td_quotes")
    for i, sym in enumerate(SYMS):
        # Twelve Data envelope: string-typed OHLCV, naive ET datetimes
        values = [
            {
                "datetime": f"2024-01-05 10:{30 + j}:00",
                "open": f"{100 + i}.5",
                "high": f"{101 + i}.0",
                "low": f"{99 + i}.25",
                "close": f"{100 + i}.75",
                "volume": f"{1000 * (j + 1)}",
            }
            for j in range(3)
        ]
        (out / f"{sym}.json").write_text(
            json.dumps({"meta": {"symbol": sym}, "values": values})
        )
    return str(out)


def test_rest_quotes_source_normalizes_like_reference(spark, quote_dir):
    register_python_sources(spark)
    df = (
        spark.read.format("twelvedata_quotes")
        .option("url", f"file://{quote_dir}/{{symbol}}.json")
        .option("symbols", ",".join(SYMS))
        .load()
    )
    rows = df.collect()
    assert len(rows) == 9
    assert df.columns == [
        "symbol", "open", "high", "low", "close", "volume", "timestamp",
    ]
    aapl = sorted(
        (r for r in rows if r.symbol == "AAPL"), key=lambda r: r.timestamp
    )
    # str -> float
    assert aapl[0].open == 100.5 and aapl[0].volume == 1000.0
    # ET -> UTC: 10:30 America/New_York (EST, UTC-5) == 15:30 UTC
    assert aapl[0].timestamp.strftime("%H:%M") == "15:30"


def test_rest_quotes_source_partitions_by_symbol_chunk(spark, quote_dir):
    register_python_sources(spark)

    def n_parts(**opts):
        reader = (
            spark.read.format("twelvedata_quotes")
            .option("url", f"file://{quote_dir}/{{symbol}}.json")
            .option("symbols", ",".join(SYMS))
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        return reader.load().rdd.getNumPartitions()

    assert n_parts() == 3  # one fetch task per symbol by default
    # one-API-key mode: all symbols serialize inside a single task
    assert n_parts(symbols_per_task=len(SYMS)) == 1


def _write_frames(path: str, symbols: list[str], n: int, t0: int = 1704450600000):
    with open(path, "a") as fh:
        for j in range(n):
            frame = {
                "data": [
                    {"p": 100.0 + j, "s": s, "t": t0 + 60000 * j, "v": 10.0}
                    for s in symbols
                ]
            }
            fh.write(json.dumps(frame) + "\n")


def test_ws_frames_stream_replay_and_offset_recovery(spark, tmp_path):
    register_python_sources(spark)
    log = str(tmp_path / "frames.ndjson")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_frames(log, ["AAPL", "MSFT"], 5)

    def run_once():
        stream = (
            spark.readStream.format("ws_frames").option("path", log).load()
        )
        trades = parse_trade_envelope(stream)
        q = (
            trades.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(out)
    assert first.count() == 10  # 5 frames x 2 trades, envelope exploded
    assert set(r.symbol for r in first.collect()) == {"AAPL", "MSFT"}

    # append to the replay log; a restarted query with the same
    # checkpoint must consume ONLY the new lines (line-count offsets)
    _write_frames(log, ["AAPL", "MSFT"], 2, t0=1704454200000)
    run_once()
    after = spark.read.parquet(out)
    assert after.count() == 14  # +2 frames x 2 trades, no re-reads
    # exactly-once across restart: no duplicate (symbol, timestamp)
    assert (
        after.groupBy("symbol", "timestamp").count().filter(F.col("count") > 1).count()
        == 0
    )


def test_ws_frames_partial_trailing_line_not_committed(tmp_path):
    """ADVICE r5: when tailing a live log, a partial trailing line (the
    writer is mid-append, no newline yet) must NOT be counted by
    latestOffset — committing it would emit a torn frame now and skip
    the completed line forever after."""
    from sparktrends_spark.sources.pysources import WsFramesStreamReader

    log = tmp_path / "frames.ndjson"
    log.write_bytes(b'{"a":1}\n{"b":2}\n{"partial');
    reader = WsFramesStreamReader({"path": str(log)})
    assert reader.latestOffset() == {"line": 2}
    # writer finishes the line -> now committed
    with open(log, "ab") as fh:
        fh.write(b'...done"}\n')
    assert reader.latestOffset() == {"line": 3}
    parts = reader.partitions({"line": 2}, {"line": 3})
    rows = list(reader.read(parts[0]))
    assert rows == [('{"partial...done"}',)]


def test_ws_frames_empty_log_yields_no_batches(spark, tmp_path):
    register_python_sources(spark)
    log = str(tmp_path / "missing.ndjson")  # not created yet
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.format("ws_frames").option("path", log).load()
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    import os

    assert not os.path.isdir(out) or spark.read.parquet(out).count() == 0
