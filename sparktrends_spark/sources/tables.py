"""Loaders for the driver-generated parquet testdata (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings, one parquet file per table under an sf dir.

The `events` table stores ``ts`` as parquet **timestamp[us]**, which
Spark reads natively as ``timestamp_ntz`` — no conversion needed.
Defensively, if a regenerated file ever stores TIMESTAMP(NANOS)
(which Spark's vectorized reader rejects unless
``spark.sql.legacy.parquet.nanosAsLong`` surfaces it as a ns-long),
``load_table`` detects the LongType and converts with integer-µs
truncation — the same value DuckDB produces for the same file.

All timestamps stay timezone-naive (``timestamp_ntz``) end-to-end to
match the DuckDB oracle's TIMESTAMP type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Timestamp columns to normalize: stored as timestamp[us] today (read
# natively); if ever regenerated as TIMESTAMP(NANOS) they surface as
# ns-longs under nanosAsLong and load_table converts them.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def _ensure_read_confs(spark: SparkSession) -> None:
    # Defensive: the driver may hand us a session without our factory
    # defaults. Both confs are runtime-settable SQL confs. nanosAsLong
    # is a no-op for the current µs testdata; see module docstring.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing ns-timestamp columns."""
    _ensure_read_confs(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        field = df.schema[col] if col in df.columns else None
        if field is not None and isinstance(field.dataType, LongType):
            df = df.withColumn(
                col,
                F.expr(f"cast(timestamp_micros(cast({col} div 1000 as bigint)) as timestamp_ntz)"),
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def scan_parallel(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a scan has enough partitions to use every core.

    Small single-file parquet inputs (and single row-group files, which
    ``spark.sql.files.maxPartitionBytes`` cannot split) arrive as one
    partition, serializing any CPU-heavy projection downstream. At real
    scale a table is thousands of splits and this is a no-op; it only
    repartitions when the scan is narrower than the target parallelism,
    so the round-robin shuffle costs only show up where they buy CPU.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
