"""PageRank operator properties (operators/pagerank.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _pr(spark, nodes, edges, **kw):
    from sparktrends_spark.operators.pagerank import pagerank

    n = spark.createDataFrame([(x,) for x in nodes], "node int")
    e = spark.createDataFrame(edges, "src int, dst int, w long")
    return {
        r.node: r.rank for r in pagerank(n, e, **kw).collect()
    }


def test_pagerank_symmetric_two_cycle(spark):
    """A -> B -> A with equal weights: ranks are exactly equal and sum
    to 1 (no dangling mass)."""
    got = _pr(spark, [0, 1], [(0, 1, 1), (1, 0, 1)])
    assert got[0] == got[1]
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_star_hub_dominates(spark):
    """Every spoke points at the hub: the hub outranks every spoke;
    total mass leaks only through the hub's dangling-ness."""
    spokes = list(range(1, 6))
    got = _pr(spark, [0, *spokes], [(s, 0, 1) for s in spokes])
    assert all(got[0] > got[s] for s in spokes)
    # spokes are symmetric
    assert len({got[s] for s in spokes}) == 1


def test_pagerank_weight_sensitivity(spark):
    """Heavier in-edges mean higher rank: C gets 9x A's weight."""
    got = _pr(
        spark,
        [0, 1, 2],
        [(0, 1, 1), (0, 2, 9), (1, 0, 1), (2, 0, 1)],
    )
    assert got[2] > got[1]


def test_pagerank_empty_nodes_raises(spark):
    from sparktrends_spark.operators.pagerank import pagerank

    n = spark.createDataFrame([], "node int")
    e = spark.createDataFrame([], "src int, dst int, w long")
    with pytest.raises(ValueError, match="empty node set"):
        pagerank(n, e)


def test_pagerank_isolated_node_keeps_teleport_mass(spark):
    """An isolated node (no edges at all) holds exactly (1-d)/N after
    any number of iterations."""
    got = _pr(spark, [0, 1, 2], [(0, 1, 1), (1, 0, 1)], iterations=3)
    assert got[2] == pytest.approx((1 - 0.85) / 3, abs=1e-9)
