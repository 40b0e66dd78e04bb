"""JDBC source/sink (SURVEY §2.1 S3, §2.2 K1-K3).

The reference reads Postgres with a hand-rolled pushdown subquery
(spark/jobs/stock_stream.py:39-57) and appends with a generic writer
(spark/utilities.py:29-47). Kept here as the optional JDBC deployment
path; the engine's primary storage is partitioned parquet (SURVEY §4:
"restate as Spark window+filter over parquet-resident bars").

Plan builders only — no JDBC driver jar ships in the build container.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    predicates: list[str] | None = None,
) -> DataFrame:
    """Read a JDBC table; simple filters/column pruning push down
    automatically. ``predicates`` (one WHERE clause per partition)
    parallelize the scan without a numeric partition column.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if predicates:
        # Spark's DataFrameReader.jdbc(predicates=...) path
        return spark.read.jdbc(
            url, table, predicates=predicates, properties=properties or {}
        )
    return reader.load()


def read_pushdown_query(
    spark: SparkSession,
    url: str,
    sql: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S3: execute ``sql`` inside the database, scan only its result.

    The reference used this to make Postgres compute top-10-per-symbol
    (ROW_NUMBER window) because Spark won't push window functions
    through JDBC. Spark-native alternative: operators/topk.py
    ``top_k_per_group`` over parquet.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({sql}) AS pushed")
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    batch_size: int = 10_000,
) -> None:
    """K1/K2: JDBC append or overwrite.

    At-least-once under retries — for exactly-once use natural-key
    upserts (streaming/sinks.upsert_parquet semantics) or stage to
    parquet and MERGE db-side.
    """
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
