"""Streaming sources (SURVEY §2.1 S2, plus test-friendly equivalents).

The reference reads one unbounded Kafka topic
(spark/jobs/stock_stream.py:122-129). This module keeps that reader
(as a plan builder — no broker exists in the test container) and adds
the sources Spark ships for development parity:

- text-file stream: each file is a micro-batch of wire frames, which
  makes end-to-end streaming tests hermetic (FIXTURES replay).
- rate stream: synthetic monotonic rows for load/latency tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparktrends_spark.operators.parse import parse_trade_envelope


def kafka_stream(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """Unbounded Kafka scan (reference S2, stock_stream.py:122-129).

    Returns the raw Kafka frame (key/value binary + metadata). Requires
    the spark-sql-kafka connector on the classpath; the plan is built
    lazily so environments without a broker can still import this.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
        .load()
    )


def text_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """File-based stream of raw text frames; one column ``value``.

    Drop-in stand-in for the Kafka value column: every downstream parse
    starts with CAST(value AS STRING) either way. ``maxFilesPerTrigger``
    defaults to 1 so each fixture file becomes its own micro-batch.
    """
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic (timestamp, value) stream for load tests."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def trade_stream_from_files(spark: SparkSession, path: str) -> DataFrame:
    """Streamed Finnhub-style envelope frames -> normalized trade rows.

    The same parse chain as the reference's stream job
    (stock_stream.py:130-142), applied to a file stream instead of
    Kafka — the logical plan downstream of the source is identical.
    """
    return parse_trade_envelope(text_file_stream(spark, path))
