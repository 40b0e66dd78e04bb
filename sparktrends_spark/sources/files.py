"""File sources/sinks (SURVEY §2.1 S4 + engine-native parquet layout).

The reference read its symbol universe CSV driver-side with
``csv.DictReader`` (edge_runner.py:16-18) — not distributed, no schema
contract. Here every file read is a Spark scan with an explicit schema
(schema-on-read inference is off by default: at 100 TB an inference
pass is a full extra scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """S4 distributed: CSV scan with a declared schema."""
    reader = spark.read.schema(schema).option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json_lines(
    spark: SparkSession, path: str, schema: StructType, **options: str
) -> DataFrame:
    """JSON-lines scan with a declared schema (permissive nulls)."""
    reader = spark.read.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "append",
) -> None:
    """Engine-native at-rest layout: parquet partitioned by low-
    cardinality keys (date, symbol bucket) so partition pruning turns
    time/symbol predicates into directory skips at 100 TB.
    """
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
