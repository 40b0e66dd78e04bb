"""Wire-format parsing operators (SURVEY §2.3 P1-P4, §2.9 F1-F6).

Rebuilds the reference's Kafka-value parse chains as composable
DataFrame transforms:

- bytes -> string -> from_json(envelope) -> inline(data) -> rename
  (reference: spark/jobs/stock_stream.py:130-142)
- bytes -> string -> from_json(record) -> flatten
  (reference: spark/jobs/stock_batch.py:45-47)
- nested crypto quote parse — the consumer the reference never wired
  up (SURVEY Q11; producer contract crypto_producer.py:60-75).

All parses are permissive: malformed JSON yields null structs, never a
task failure (FIXTURES.md Part A edge cases).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType, TimestampType

from sparktrends_spark.schemas import (
    CRYPTO_QUOTE_SCHEMA,
    TRADE_ENVELOPE_SCHEMA,
)


def epoch_ms_to_timestamp(col: Column) -> Column:
    """Exact epoch-milliseconds -> timestamp.

    The reference used ``(t/1000).cast(TimestampType())``
    (stock_stream.py:141) which round-trips through a double;
    ``timestamp_millis`` is exact for any representable epoch.
    """
    return F.timestamp_millis(col.cast("long"))


def bytes_to_json_string(df: DataFrame, value_col: str = "value") -> DataFrame:
    """P1: CAST(value AS STRING) AS json."""
    return df.selectExpr(f"CAST({value_col} AS STRING) AS json")


def parse_json_records(
    df: DataFrame, schema: StructType, value_col: str = "value"
) -> DataFrame:
    """P1+P2+P3: bytes -> from_json(schema) -> flattened columns."""
    return (
        bytes_to_json_string(df, value_col)
        .select(F.from_json("json", schema).alias("rec"))
        .select("rec.*")
    )


def parse_trade_envelope(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse Finnhub-style ``{"data": [{p,s,t,v}, ...]}`` frames into
    normalized trade rows (symbol, price, volume, timestamp).

    ``inline`` explodes the array-of-struct (reference F3,
    stock_stream.py:136); frames with null/empty ``data`` simply
    produce no rows.
    """
    return (
        bytes_to_json_string(df, value_col)
        .select(F.from_json("json", TRADE_ENVELOPE_SCHEMA).alias("d"))
        .select(F.inline("d.data"))
        .select(
            F.col("s").alias("symbol"),
            F.col("p").alias("price"),
            F.col("v").alias("volume"),
            epoch_ms_to_timestamp(F.col("t")).alias("timestamp"),
        )
    )


def parse_crypto_quotes(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse nested crypto daily quotes into flat OHLCV rows.

    The struct-in-struct flatten the reference lacked a consumer for
    (SURVEY Q11); volume stays Double (fractional crypto volumes, Q5).
    """
    return (
        bytes_to_json_string(df, value_col)
        .select(F.from_json("json", CRYPTO_QUOTE_SCHEMA).alias("q"))
        .select(
            F.col("q.symbol").alias("symbol"),
            F.col("q.name").alias("name"),
            F.col("q.sector").alias("sector"),
            F.to_date("q.market_date").alias("market_date"),
            F.col("q.crypto_info.open").alias("open"),
            F.col("q.crypto_info.high").alias("high"),
            F.col("q.crypto_info.low").alias("low"),
            F.col("q.crypto_info.close").alias("close"),
            F.col("q.crypto_info.volume").alias("volume"),
        )
    )
