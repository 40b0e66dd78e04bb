"""Kafka scans (SURVEY §2.1 S1/S2) and the Kafka sink (K7).

The reference reads a whole topic in batch (spark/jobs/stock_batch.py:
36-44) and an unbounded stream (stock_stream.py:122-129), and publishes
with a Python aiokafka producer (apache_kafka/utilities.py:21-45). All
three are one declarative reader/writer here.

These are plan builders: they need the spark-sql-kafka connector jar on
the session classpath and a reachable broker at action time, neither of
which exists in the build container — the hermetic test path is the
file/text source (streaming/sources.py), which produces byte-identical
``value`` frames for everything downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_topic_bounded(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
) -> DataFrame:
    """S1: batch-read a whole topic (earliest -> latest)."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
        .load()
    )


def write_topic(
    df: DataFrame, topic: str, bootstrap_servers: str, value_col: str = "value"
) -> None:
    """K7: publish a DataFrame to Kafka (value must be string/binary).

    Replaces the reference's driver-side aiokafka JSON loop with a
    distributed write: serialization happens on executors via
    ``to_json(struct(*))`` upstream of this call.
    """
    out = df if value_col == "value" else df.withColumnRenamed(value_col, "value")
    (
        out.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )


def serialize_for_kafka(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Encode rows as Kafka-ready (key, value) JSON strings.

    Replaces the reference's driver-side ``json.dumps`` serializer
    (apache_kafka/utilities.py:30) with a distributed projection:
    value = to_json(struct(*cols)). Round-trips through
    ``operators.parse.parse_json_records`` with the matching schema.
    """
    from pyspark.sql import functions as F

    cols = [c for c in df.columns if c != key_col]
    out = df.select(
        *([F.col(key_col).cast("string").alias("key")] if key_col else []),
        F.to_json(F.struct(*cols)).alias("value"),
    )
    return out
