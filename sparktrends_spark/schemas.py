"""Canonical StructType contracts.

These are the cleaned versions of the reference's declared schemas
(SURVEY.md §1): the Finnhub-style trade envelope the streaming job
parses (`spark/jobs/stock_stream.py:22-27,131-135`), the OHLCV bar and
company-metadata shapes (`spark/jobs/stock_batch.py:16-32`,
`postgres/init.sql`), the canonical metrics schema (SURVEY Q4), and the
nested crypto quote (`apache_kafka/producers/crypto_producer.py:60-75`,
which the reference never consumed — SURVEY Q11).

Decisions encoded here (SURVEY §2.13): volume is Double end-to-end
(fractional crypto volumes, Q5); the metrics table is
``symbol, timestamp, vwap_5, vol_5, is_anomaly`` (Q4); the canonical
wire envelope is the Finnhub shape the Spark job expects (Q1).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Raw trade tick as it appears inside the wire envelope:
# p=price, s=symbol, t=epoch-millis, v=volume.
TRADE_SCHEMA = StructType(
    [
        StructField("p", DoubleType(), False),
        StructField("s", StringType(), False),
        StructField("t", DoubleType(), False),
        StructField("v", DoubleType(), False),
    ]
)

# Wire envelope: {"data": [trade, ...]} (one WS frame, many trades).
TRADE_ENVELOPE_SCHEMA = StructType(
    [StructField("data", ArrayType(TRADE_SCHEMA), True)]
)

# Normalized trade after parsing/renaming.
NORMALIZED_TRADE_SCHEMA = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("price", DoubleType(), False),
        StructField("volume", DoubleType(), False),
        StructField("timestamp", TimestampType(), False),
    ]
)

# 1-minute OHLCV bar (timestamp = window start).
OHLCV_SCHEMA = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("open", DoubleType(), True),
        StructField("high", DoubleType(), True),
        StructField("low", DoubleType(), True),
        StructField("close", DoubleType(), True),
        StructField("volume", DoubleType(), True),
        StructField("timestamp", TimestampType(), False),
    ]
)

# Company metadata dimension.
COMPANY_SCHEMA = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("name", StringType(), True),
        StructField("sector", StringType(), True),
        StructField("industry", StringType(), True),
    ]
)

# Canonical computed-metrics row (SURVEY Q4 cleaned contract).
METRICS_SCHEMA = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("timestamp", TimestampType(), False),
        StructField("close", DoubleType(), True),
        StructField("vwap_5", DoubleType(), True),
        StructField("vol_5", DoubleType(), True),
        StructField("is_anomaly", BooleanType(), True),
    ]
)

# Nested crypto daily quote (producer-only in the reference; we consume it).
CRYPTO_INFO_SCHEMA = StructType(
    [
        StructField("open", DoubleType(), True),
        StructField("high", DoubleType(), True),
        StructField("low", DoubleType(), True),
        StructField("close", DoubleType(), True),
        StructField("volume", DoubleType(), True),
    ]
)

CRYPTO_QUOTE_SCHEMA = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("name", StringType(), True),
        StructField("sector", StringType(), True),
        StructField("market_date", StringType(), True),
        StructField("crypto_info", CRYPTO_INFO_SCHEMA, True),
    ]
)

# North-star: embedding row (TESTDATA embeddings.parquet).
EMBEDDING_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
        StructField("label", LongType(), True),
    ]
)

# North-star: multimodal asset row — opaque binary payload + typed metadata.
from pyspark.sql.types import BinaryType, IntegerType, MapType  # noqa: E402

MULTIMODAL_ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime_type", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("extra", MapType(StringType(), StringType()), True),
    ]
)
