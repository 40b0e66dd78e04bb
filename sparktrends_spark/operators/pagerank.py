"""Weighted PageRank as an iterative DataFrame computation.

The second member of the iterative-graph family next to connected
components (`operators/components.py`): entity-importance scoring over
an edge list — the shape behind citation/link/interaction ranking in a
training-data pipeline (source-site authority for quality weighting,
user-influence weighting for interaction corpora).

Formula (per iteration, damping d, N nodes):

    pr'(v) = (1-d)/N + d * sum_{u->v} pr(u) * w(u,v) / outw(u)

Dangling nodes (no out-edges) leak their damped mass — the simple
variant; both the Spark plan and the SQL oracle state the identical
formula, so parity is exact.

Scale notes: each iteration is one shuffle keyed on the destination
node (the contribution aggregation) plus one equi-join of ranks to
edges on src. Edges are the big side and are never collected; ranks
are O(nodes). Out-weights are computed once before the loop. Lineage
is cut per iteration with ``localCheckpoint`` (same discipline as the
CC loop) so the plan does not grow with the iteration count.

Float discipline (the exact-oracle gate): the per-destination
contribution sum is an addition-order-dependent double sum, so every
iteration ROUNDS the rank to ``round_digits`` (default 12) — both
engines round identically, and the 1-ULP drift (~1e-18 at rank scale)
can never reach the 1e-12 quantum, so ranks stay bit-identical
through arbitrarily many iterations. Reference has no graph surface;
this is engine-extension territory (SURVEY §2 absent inventory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparktrends_spark.caching import persist_tracked


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    round_digits: int = 12,
) -> DataFrame:
    """Run ``iterations`` synchronous PageRank steps; returns
    (node_col, rank). ``nodes`` must contain every node id exactly
    once (isolated nodes included — they hold the teleport mass)."""
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty node set")
    base = (1.0 - damping) / n
    outw = edges.groupBy(src_col).agg(F.sum(weight_col).alias("_ow"))
    # Pin the normalized edge list: it feeds EVERY iteration, and each
    # iteration's checkpointed ranks frame otherwise re-derives it from
    # scratch (for the graded nation graph that is the lineitem-orders
    # join ×iterations — same re-derivation waste the triangle operator
    # fixed by pinning; `connected_components` already does this).
    # Cached partitions replay identically, so per-partition sum order
    # (and the round-12 ranks) are unchanged.
    ew = persist_tracked(
        edges.join(outw, src_col).select(
            src_col, dst_col, (F.col(weight_col) / F.col("_ow")).alias("_nw")
        )
    )
    ranks = nodes.select(node_col, F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contrib = (
            ew.join(ranks, ew[src_col] == ranks[node_col])
            .select(
                F.col(dst_col).alias(node_col),
                (F.col("rank") * F.col("_nw")).alias("_c"),
            )
            .groupBy(node_col)
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = (
            nodes.join(contrib, node_col, "left")
            .select(
                node_col,
                F.round(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0)),
                    round_digits,
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
