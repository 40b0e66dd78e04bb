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
- ``upsert_parquet_bucketed``: the scale-shaped variant. The table is
  laid out as ``_bucket=NN/`` partitions (hash of the natural key);
  a micro-batch merges and dynamically overwrites ONLY the buckets
  its keys land in, so per-batch write cost is O(batch ∪ touched
  buckets), not O(table) — the property that keeps a long-running
  update-mode stream viable as the sink table grows. This is the
  hash-bucketed poor-man's MERGE INTO; Delta/Iceberg replace the
  directory swap with a transactional log but the data movement is
  the same.
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


BUCKET_COL = "_bucket"


def upsert_parquet_bucketed(
    df: DataFrame,
    path: str,
    keys: Sequence[str],
    n_buckets: int = 64,
    version_col: str = "_batch_id",
    version: int = 0,
) -> None:
    """Merge ``df`` into a hash-bucket-partitioned parquet table,
    rewriting only the buckets the incoming keys touch.

    Layout: ``path/_bucket=NN/*.parquet`` with NN = pmod(hash(keys),
    n_buckets). A batch's work is: (1) collect its distinct bucket ids
    (≤ n_buckets ints — bounded, not data-sized), (2) read ONLY those
    partitions of the existing table (partition pruning on the bucket
    directory), (3) last-writer-wins merge per key, (4) dynamic
    partition overwrite, which replaces exactly the partitions present
    in the merged frame. Untouched buckets are never read or written.

    Idempotence: replaying a batch re-merges the same keys at the same
    version — per-key max-version keeps the outcome stable. Crash
    mid-write: dynamic overwrite swaps per-partition, so a crash can
    leave SOME buckets updated and others stale — rerunning the same
    batch (what checkpoint recovery does) converges; cross-bucket
    atomicity is what a Delta/Iceberg commit log adds on a cluster.
    """
    spark = df.sparkSession
    incoming = df.withColumn(version_col, F.lit(int(version))).withColumn(
        BUCKET_COL, F.pmod(F.hash(*keys), F.lit(n_buckets))
    )
    final = path.rstrip("/")
    # An upsert of zero rows is a no-op — and must not write: a
    # partitioned overwrite of an empty frame creates a directory with
    # no parquet files (unlike the flat writer's empty-but-schema'd
    # file), which poisons every later read. Append-mode streams emit
    # empty micro-batches routinely while the watermark catches up.
    if incoming.isEmpty():
        return
    if os.path.isdir(final):
        # Bounded driver collect: ≤ n_buckets small ints per batch.
        affected = [
            r[BUCKET_COL]
            for r in incoming.select(BUCKET_COL).distinct().collect()
        ]
        existing = spark.read.parquet(final).filter(
            F.col(BUCKET_COL).isin(affected)
        )
        merged = existing.unionByName(incoming)
    else:
        merged = incoming
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    latest = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    (
        latest.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BUCKET_COL)
        .parquet(final)
    )


def read_upserted(spark, path: str, version_col: str = "_batch_id") -> DataFrame:
    """Read a (bucketed or flat) upsert table minus sink bookkeeping."""
    df = spark.read.parquet(path.rstrip("/"))
    drop = [c for c in (version_col, BUCKET_COL) if c in df.columns]
    return df.drop(*drop)
