"""Idempotent micro-batch sinks (SURVEY §2.2 K1-K5, §7.4 exactly-once).

The reference's ``foreachBatch`` does plain JDBC appends
(stock_stream.py:169-180 -> spark/utilities.py:36-44): at-least-once,
so a retried micro-batch double-writes. Two idempotence strategies:

- ``write_batch_partitioned``: batch-id-keyed dynamic-partition
  overwrite — replaying batch N rewrites only partition batch_id=N.
  Right for append-mode streams (rows of a batch are final).
- ``upsert_parquet``: natural-key upsert (last writer wins) — right
  for update-mode streams that re-emit a (symbol, window) row as it
  refines. Implemented read-merge-rewrite over parquet here; on a
  cluster this is a Delta/Iceberg MERGE INTO keyed on the same
  natural key — the call signature is the stable part.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def write_batch_partitioned(df: DataFrame, batch_id: int, path: str) -> None:
    """Exactly-once-under-retry append of one micro-batch."""
    (
        df.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def upsert_parquet(
    df: DataFrame,
    path: str,
    keys: Sequence[str],
    version_col: str = "_batch_id",
    version: int = 0,
) -> None:
    """Merge ``df`` into the parquet table at ``path`` by natural key.

    Keeps, per key, the row with the highest ``version`` (micro-batch
    id), so replays and update-mode re-emissions are both idempotent.
    """
    spark = df.sparkSession
    incoming = df.withColumn(version_col, F.lit(int(version)))
    # Recover from a crash that happened between the two renames of a
    # previous call (final moved aside, staging not yet promoted): the
    # backup is then the only copy of the table, so restore it BEFORE
    # reading/merging — otherwise this call would treat the table as
    # absent and the backup cleanup below would delete the last copy.
    final = path.rstrip("/")
    backup = final + ".old"
    if not os.path.isdir(final) and os.path.isdir(backup):
        os.rename(backup, final)
    if os.path.isdir(path):
        existing = spark.read.parquet(path)
        merged = existing.unionByName(incoming)
    else:
        merged = incoming
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    latest = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # Parquet can't transactionally overwrite a path it is reading, so
    # stage the merged table then swap directories. The old table is
    # renamed aside before the staging rename so a crash mid-swap
    # leaves a recoverable copy (never an empty path). Cluster path:
    # this read-merge-rewrite is a single MERGE INTO on Delta/Iceberg.
    staging = final + ".staging"
    latest.write.mode("overwrite").parquet(staging)
    if os.path.isdir(backup):
        shutil.rmtree(backup)
    had_existing = os.path.isdir(final)
    if had_existing:
        os.rename(final, backup)
    os.rename(staging, final)
    if had_existing:
        shutil.rmtree(backup)
