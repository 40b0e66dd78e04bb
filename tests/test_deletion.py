"""Targeted deletion: surgical per-file rewrite, untouched files stay
byte-identical on disk (inode + mtime preserved)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sparktrends_spark.sources.deletion import delete_keys, find_files_with_keys
from sparktrends_spark.sources.tables import load_table


def _file_sig(path: str) -> dict[str, tuple]:
    out = {}
    for r, _d, fs in os.walk(path):
        for f in fs:
            if f.endswith(".parquet"):
                fp = os.path.join(r, f)
                st = os.stat(fp)
                out[fp] = (st.st_ino, st.st_mtime_ns, st.st_size)
    return out


def test_delete_keys_rewrites_only_affected_files(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events")
    ev = load_table(spark, sf_dir, "events")
    # range-partition by user so target users land in few files
    ev.repartitionByRange(8, "user_id").sortWithinPartitions(
        "user_id"
    ).write.parquet(path)

    orig = spark.read.parquet(path)
    n_total = orig.count()
    targets = [3, 7]
    n_victims = orig.filter(F.col("user_id").isin(targets)).count()
    assert n_victims > 0

    before = _file_sig(path)
    hit_files = find_files_with_keys(spark, path, "user_id", targets)
    assert 0 < len(hit_files) < len(before)  # localized, not everywhere

    stats = delete_keys(spark, path, "user_id", targets)
    assert stats["rows_deleted"] == n_victims
    assert stats["files_rewritten"] + stats["files_removed"] == len(hit_files)

    after = _file_sig(path)
    untouched = set(before) - set(hit_files)
    # surgical: every non-target file is the SAME inode, mtime, bytes
    for fp in untouched:
        assert after[fp] == before[fp]

    got = spark.read.parquet(path)
    assert got.count() == n_total - n_victims
    assert got.filter(F.col("user_id").isin(targets)).count() == 0
    # survivors untouched row-for-row
    keep_orig = orig.filter(~F.col("user_id").isin(targets))
    assert got.exceptAll(keep_orig).count() == 0
    assert keep_orig.exceptAll(got).count() == 0


def test_delete_keys_keeps_null_keyed_rows(spark, tmp_path):
    """`~isin` is NULL (not true) for NULL keys — the deletion filter
    must keep NULL-keyed rows explicitly, and must not count them in
    rows_deleted."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c"), (None, "d"), (3, "e")],
        "k INT, v STRING",
    )
    df.coalesce(1).write.parquet(path)
    stats = delete_keys(spark, path, "k", [1, 3])
    assert stats["rows_deleted"] == 2
    got = spark.read.parquet(path)
    assert got.count() == 3
    assert got.filter(F.col("k").isNull()).count() == 2
    assert {r["v"] for r in got.collect()} == {"b", "c", "d"}


def test_delete_keys_temp_dir_is_hidden_from_spark_listing(spark, tmp_path):
    """A crash between the temp-dir write and cleanup must not break
    subsequent reads of the table: the temp dir is dot-prefixed, which
    Spark's file listing ignores. Simulate the crash by planting a
    stale temp dir shaped exactly like the one delete_keys creates."""
    path = str(tmp_path / "t")
    spark.range(10).selectExpr("id AS k", "id * 2 AS v").coalesce(
        1
    ).write.parquet(path)
    fp = next(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    stale = os.path.join(
        path, f".{os.path.basename(fp)}__del_deadbeef"
    )
    os.makedirs(stale)
    spark.range(3).selectExpr("id AS k", "id AS v").coalesce(
        1
    ).write.mode("overwrite").parquet(stale)
    spark.catalog.refreshByPath(path)
    # hidden dir is invisible: read still sees only the original rows
    assert spark.read.parquet(path).count() == 10
    # and delete_keys itself still works with the stale dir present
    stats = delete_keys(spark, path, "k", [0, 1])
    assert stats["rows_deleted"] == 2
    assert spark.read.parquet(path).count() == 8


def test_delete_keys_drops_fully_matching_file(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(100).selectExpr("CAST(id < 50 AS INT) AS bucket", "id")
    df.repartitionByRange(2, "bucket").write.parquet(path)
    n_files_before = len(_file_sig(path))
    stats = delete_keys(spark, path, "bucket", [1])
    assert stats["files_removed"] >= 1
    assert len(_file_sig(path)) < n_files_before
    got = spark.read.parquet(path)
    assert got.count() == 50 and got.filter("bucket = 1").count() == 0
