"""Distributed two-phase rank (operators/rank.py): value parity with
the single-partition row_number window, plan shape (no unpartitioned
WindowExec), and edge cases."""

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sparktrends_spark.caching import release_persisted
from sparktrends_spark.operators.rank import with_global_rank


@pytest.fixture(autouse=True)
def _release():
    yield
    release_persisted()


def _expected(df, cols):
    w = Window.orderBy(*cols)
    return {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(w).cast("bigint")
        ).collect()
    }


def test_matches_row_number_random_frames(spark):
    """Property: for random frames and several partition counts, the
    two-phase rank equals the global row_number under the same total
    order."""
    rng = random.Random(42)
    for trial, nparts in [(0, 1), (1, 4), (2, 7), (3, 32)]:
        rows = [(i, rng.randrange(50)) for i in range(503)]
        df = spark.createDataFrame(rows, "id long, x long")
        got = {
            r["id"]: r["rnk"]
            for r in with_global_rank(
                df, ["x", "id"], num_partitions=nparts
            ).collect()
        }
        assert got == _expected(df, [F.col("x"), F.col("id")]), (
            f"trial {trial}, num_partitions={nparts}"
        )
        release_persisted()


def test_descending_and_mixed_order(spark):
    rng = random.Random(7)
    rows = [(i, rng.randrange(20), float(rng.randrange(100))) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y double")
    order = [F.desc("y"), F.asc("x"), F.asc("id")]
    got = {
        r["id"]: r["rnk"]
        for r in with_global_rank(df, order, num_partitions=5).collect()
    }
    assert got == _expected(df, order)


def test_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "id long, x long")
    assert with_global_rank(empty, ["x", "id"]).count() == 0
    one = spark.createDataFrame([(1, 5)], "id long, x long")
    rows = with_global_rank(one, ["x", "id"]).collect()
    assert [(r["id"], r["rnk"]) for r in rows] == [(1, 1)]


def test_ntile_from_rank_matches_builtin(spark):
    """Property: the closed-form tile assignment from (rank, total)
    equals F.ntile for every tile count and ragged division, including
    n < tiles."""
    import random

    from sparktrends_spark.operators.rank import (
        ntile_from_rank,
        with_global_rank,
    )

    rng = random.Random(11)
    for n_rows, tiles in [(503, 4), (500, 5), (7, 10), (1, 3), (97, 8)]:
        rows = [(i, rng.randrange(40)) for i in range(n_rows)]
        df = spark.createDataFrame(rows, "id long, x long")
        order = [F.asc("x"), F.asc("id")]
        got = {
            r["id"]: r["t"]
            for r in with_global_rank(
                df, order, rank_col="_i", total_col="_n", num_partitions=6
            )
            .withColumn("t", ntile_from_rank(F.col("_i"), F.col("_n"), tiles))
            .collect()
        }
        release_persisted()
        w = Window.orderBy(*order)
        exp = {
            r["id"]: r["t"]
            for r in df.withColumn("t", F.ntile(tiles).over(w)).collect()
        }
        assert got == exp, (n_rows, tiles)


def test_no_unpartitioned_window_in_plan(spark):
    """The whole point: every WindowExec in the physical plan is
    partitioned (by _pid), so no stage funnels the frame into one
    task."""
    df = spark.createDataFrame(
        [(i, i % 9) for i in range(100)], "id long, x long"
    )
    ranked = with_global_rank(df, ["x", "id"], num_partitions=4)
    plan = ranked._jdf.queryExecution().optimizedPlan()

    def walk(node):
        found = []
        if node.getClass().getSimpleName() == "Window":
            if node.partitionSpec().isEmpty():
                found.append(node.getClass().getName())
        for i in range(node.children().size()):
            found += walk(node.children().apply(i))
        return found

    assert walk(plan) == []
    # and the ranks are still right
    got = {r["id"]: r["rnk"] for r in ranked.collect()}
    assert got == _expected(df, [F.col("x"), F.col("id")])
