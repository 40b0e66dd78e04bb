"""One-call OPTIMIZE: compaction + Z-order + skip-index refresh."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sparktrends_spark.sources.bloom import scan_bloom
from sparktrends_spark.sources.layout import STATS_MANIFEST, scan_pruned
from sparktrends_spark.sources.optimize import optimize_table


def _make_messy_table(spark, dest, n=40_000, files=64):
    spark.range(n).selectExpr(
        "CAST(pmod(id * 2654435761, 1000000007) AS LONG) AS event_id",
        "CAST(pmod(id, 50) AS INT) AS user_id",
        "CAST(pmod(id * 40503, 500) AS DOUBLE) AS value",
    ).repartition(files).write.parquet(dest)


def test_optimize_compacts_and_refreshes_indexes(spark, tmp_path):
    dest = str(tmp_path / "t")
    _make_messy_table(spark, dest)
    before = spark.read.parquet(dest)
    n_rows = before.count()
    checksum = before.agg(F.sum("event_id")).head()[0]

    stats = optimize_table(
        spark,
        dest,
        zorder_cols=["user_id", "value"],
        bloom_cols=["event_id"],
        target_file_bytes=64 * 1024,
    )
    # fewer, bigger files; bytes in the same ballpark; rows identical
    assert stats["files_after"] < stats["files_before"]
    after = spark.read.parquet(dest)
    assert after.count() == n_rows
    assert after.agg(F.sum("event_id")).head()[0] == checksum

    # both skip indexes are fresh and effective on the NEW layout
    assert os.path.isfile(os.path.join(dest, STATS_MANIFEST))
    ranges = {"user_id": (3, 9), "value": (50.0, 250.0)}
    pruned = scan_pruned(spark, dest, ranges)
    assert len(pruned.inputFiles()) < stats["files_after"]
    full = after.filter(
        F.col("user_id").between(3, 9) & F.col("value").between(50.0, 250.0)
    )
    assert pruned.count() == full.count()

    probe = [r.event_id for r in after.limit(2).collect()]
    looked = scan_bloom(spark, dest, "event_id", probe)
    assert looked.count() == full.filter(F.lit(True)).sparkSession.read.parquet(
        dest
    ).filter(F.col("event_id").isin(probe)).count()


def test_optimize_plain_compaction_without_zorder(spark, tmp_path):
    dest = str(tmp_path / "t")
    _make_messy_table(spark, dest, n=5_000, files=32)
    stats = optimize_table(spark, dest, target_file_bytes=1 << 20)
    assert stats["files_after"] < stats["files_before"]
    assert stats["zorder_cols"] == [] and stats["stats_manifest"]
    assert spark.read.parquet(dest).count() == 5_000
