"""Unit tests for join operators (operators/joins.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparktrends_spark.operators.joins import as_of_join


def test_asof_tolerance_judges_each_value_column_by_its_own_match_ts(spark):
    """A newer right row with a NULL value column must NOT refresh the
    staleness clock for that column: the carried value came from an
    older row, and if THAT row is beyond tolerance the value is nulled.
    (Regression for the shared-`_rts` bug.)"""
    left = spark.createDataFrame(
        [("k1", 110)], "key STRING, lts BIGINT"
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k1", 0, 5.0, 50.0), ("k1", 100, None, 60.0)],
        "key STRING, rts BIGINT, px DOUBLE, qty DOUBLE",
    ).withColumn("rts", F.col("rts").cast("timestamp"))

    out = as_of_join(
        left,
        right,
        on=["key"],
        left_ts="lts",
        right_ts="rts",
        value_cols=["px", "qty"],
        tolerance_seconds=50,
    ).head()
    # px's only supplier is the t=0 row: 110s old > 50s tolerance -> NULL,
    # even though a right row existed 10s before the left row.
    assert out["asof_px"] is None
    # qty's supplier is the t=100 row: 10s old <= tolerance -> fresh.
    assert out["asof_qty"] == 60.0


def test_asof_tolerance_within_bound_survives(spark):
    left = spark.createDataFrame(
        [("k1", 30), ("k1", 200)], "key STRING, lts BIGINT"
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k1", 10, 1.5)], "key STRING, rts BIGINT, px DOUBLE"
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    rows = {
        int(r["lts"].timestamp()): r["asof_px"]
        for r in as_of_join(
            left,
            right,
            on=["key"],
            left_ts="lts",
            right_ts="rts",
            value_cols=["px"],
            tolerance_seconds=60,
        ).collect()
    }
    assert rows[30] == 1.5  # 20s lookback, within bound
    assert rows[200] is None  # 190s lookback, stale


def test_asof_no_tolerance_unbounded_lookback(spark):
    left = spark.createDataFrame(
        [("k1", 1_000_000)], "key STRING, lts BIGINT"
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k1", 1, 9.0)], "key STRING, rts BIGINT, px DOUBLE"
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    out = as_of_join(
        left, right, on=["key"], left_ts="lts", right_ts="rts",
        value_cols=["px"],
    ).head()
    assert out["asof_px"] == 9.0
