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


def _tri(spark, edges):
    from sparktrends_spark.operators.triangles import triangles

    e = spark.createDataFrame(edges, "u int, v int")
    return {
        (r.a, r.b, r.c) for r in triangles(e, "u", "v").collect()
    }


def test_triangles_k4_minus_disconnected_edge(spark):
    """K4 has exactly 4 triangles; an extra disconnected edge adds
    none. Each triangle appears once, vertices sorted ascending."""
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    got = _tri(spark, k4 + [(10, 11)])
    assert got == {(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)}


def test_triangles_orientation_and_direction_invariance(spark):
    """Edge direction and duplicates are normalized away: reversing
    and repeating edges changes nothing; a triangle-free path graph
    yields none."""
    tri = [(0, 1), (1, 2), (2, 0)]
    rev = [(v, u) for u, v in tri]
    assert _tri(spark, tri + rev + tri) == {(0, 1, 2)}
    assert _tri(spark, [(0, 1), (1, 2), (2, 3)]) == set()


def test_triangles_match_bruteforce_random_graph(spark):
    """Degree-oriented enumeration equals brute force on a
    deterministic pseudo-random graph (including a hot hub vertex
    that would blow up an unoriented wedge count)."""
    import itertools

    edges = set()
    x = 1
    for _ in range(300):
        x = (1103515245 * x + 12345) % (1 << 31)
        u = x % 40
        x = (1103515245 * x + 12345) % (1 << 31)
        v = x % 40
        if u != v:
            edges.add((min(u, v), max(u, v)))
    edges |= {(0, v) for v in range(1, 40)}  # hub
    adj = edges
    brute = {
        (a, b, c)
        for a, b, c in itertools.combinations(range(40), 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    }
    assert _tri(spark, sorted(edges)) == brute


def test_part_triangle_top_plan_has_no_cartesian(spark):
    """The graded co-purchase query must close wedges with keyed
    equi-joins — no CartesianProduct, no row-at-a-time Python."""
    from sparktrends_spark.plans import QUERIES

    df = QUERIES["part_triangle_top"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_triangles_drop_self_loops(spark):
    """Self-loops must not fabricate degenerate triangles: a triangle
    plus loops on its vertices yields exactly that one triangle."""
    assert _tri(
        spark, [(0, 1), (1, 2), (2, 0), (0, 0), (1, 1), (2, 2)]
    ) == {(0, 1, 2)}
