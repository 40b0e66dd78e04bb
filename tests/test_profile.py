"""Single-pass column profiler (operators/profile.py): typed stats on
a hand-built frame, NULL/dtype edge cases, and the one-scan plan."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from sparktrends_spark.operators.profile import profile_columns


def test_profile_typed_stats_and_nulls(spark):
    df = spark.createDataFrame(
        [
            (1, "ab", 2.0, datetime.datetime(2024, 1, 1, 0, 0, 0)),
            (2, "abcd", 4.0, datetime.datetime(2024, 1, 2, 0, 0, 0)),
            (2, None, None, None),
        ],
        "k bigint, s string, v double, t timestamp",
    )
    prof = {r.col_name: r for r in profile_columns(df).collect()}

    assert prof["k"].n_rows == 3
    assert prof["k"].n_null == 0
    assert prof["k"].n_distinct == 2
    assert prof["k"].min_value == 1.0
    assert prof["k"].max_value == 2.0
    assert abs(prof["k"].mean_value - 5.0 / 3.0) < 1e-12

    # strings profile their LENGTH
    assert prof["s"].n_null == 1
    assert prof["s"].n_distinct == 2
    assert prof["s"].min_value == 2.0
    assert prof["s"].max_value == 4.0
    assert prof["s"].mean_value == 3.0  # mean over non-null lengths

    assert prof["v"].n_null == 1
    assert prof["v"].mean_value == 3.0

    # timestamps profile epoch micros
    day_us = 86400.0 * 1e6
    epoch_us = 1704067200.0 * 1e6  # 2024-01-01 UTC
    assert prof["t"].min_value == epoch_us
    assert prof["t"].max_value == epoch_us + day_us
    assert prof["t"].mean_value == epoch_us + day_us / 2


def test_profile_unsummarizable_dtype_counts_only(spark):
    df = spark.createDataFrame([([1, 2],), ([3],)], "a array<int>")
    row = profile_columns(df).collect()[0]
    assert row.n_rows == 2
    assert row.n_distinct == 2
    assert row.min_value is None and row.mean_value is None


def test_profile_column_subset(spark):
    df = spark.createDataFrame([(1, "x")], "k bigint, s string")
    rows = profile_columns(df, cols=["s"]).collect()
    assert [r.col_name for r in rows] == ["s"]


def test_profile_queries_scan_table_once(spark, sf_dir):
    # the whole point: N columns profiled != N scans
    from sparktrends_spark.plans import QUERIES

    for name in ("events_column_profile", "documents_column_profile"):
        plan = (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("FileScan parquet") == 1, name
        assert "Expand" in plan  # the multi-distinct single-pass shape


def test_profile_statistics_merge_across_shards(spark):
    """The mergeable-profile claim behind stream_events_profile:
    combining two shards' profiles with the stat algebra (counts add,
    min/min, max/max, exact sums add -> mean recomputed) must equal
    profiling the union directly."""
    rows_a = [(i, float(i)) for i in range(1, 8)]
    rows_b = [(i, float(2 * i)) for i in range(8, 20)]
    schema = "k bigint, v double"
    a = spark.createDataFrame(rows_a, schema)
    b = spark.createDataFrame(rows_b, schema)

    def prof(df):
        return {
            r.col_name: r
            for r in profile_columns(df, include_distinct=False).collect()
        }

    pa, pb, pu = prof(a), prof(b), prof(a.unionAll(b))
    for c in ("k", "v"):
        n = pa[c].n_rows + pb[c].n_rows
        nn = n - (pa[c].n_null + pb[c].n_null)
        assert pu[c].n_rows == n
        assert pu[c].min_value == min(pa[c].min_value, pb[c].min_value)
        assert pu[c].max_value == max(pa[c].max_value, pb[c].max_value)
        merged_mean = (
            pa[c].mean_value * (pa[c].n_rows - pa[c].n_null)
            + pb[c].mean_value * (pb[c].n_rows - pb[c].n_null)
        ) / nn
        assert abs(pu[c].mean_value - merged_mean) < 1e-9
