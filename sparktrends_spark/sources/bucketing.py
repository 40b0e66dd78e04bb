"""Bucketed tables: co-located joins without a per-query shuffle.

SURVEY §7.2/§7.4: big fact-fact joins (bars x bars history, events x
orders) shuffle both sides on every query unless the storage layout
pre-partitions them. Spark bucketing hashes rows into a fixed number of
buckets at write time; a join between two tables bucketed on the same
key with the same bucket count reads co-located buckets and skips the
Exchange entirely (verified in tests by asserting the plan has no
shuffle).

At 100 TB this is the difference between an O(data) shuffle per query
and a one-time layout cost amortized over every downstream join/agg.
Buckets also bound skew: a hot symbol spreads over hash(symbol) % n
files only if you bucket by a compound key — for truly skewed keys use
operators/skew.py salting instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Save as a bucketed (and optionally sorted) table.

    Sorting within buckets additionally enables sort-merge joins with
    neither shuffle nor sort at read time. ``path`` makes it an
    external table (data at ``path``, metadata in the catalog) — handy
    when the warehouse dir isn't writable/configurable at runtime.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
