"""Connected components over a pair list — dedup-cluster resolution.

Near-dup detection (MinHash-LSH, SimHash, embedding cosine — SURVEY
north-star ops) emits PAIRS; turning pairs into delete lists needs the
transitive closure: if A~B and B~C, then {A, B, C} is one cluster and
one canonical survivor is kept. The reference has nothing like this
(its dedup intent is a TODO, ``stock_stream.py:118-119``); this is the
piece a 100 TB training-data pipeline needs on top.

Algorithm: iterative minimum-label propagation. Every node starts
labeled with its own id; each round a node takes the min of its label
and its neighbors' labels; converges in O(graph diameter) rounds.
Dedup-similarity graphs have tiny diameters (clusters are near-cliques
because similarity is near-transitive at high thresholds), so the
round count is small and each round is two shuffles (join on dst,
groupBy src) — the same plan at 60k rows or 100 TB. For adversarial
long-chain graphs the large-star/small-star variant (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) halves the
diameter per round; ``max_iter`` guards the loop either way.

Driver involvement is one ``count()`` per round on a two-column frame
(the convergence check) — no row data ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparktrends_spark.caching import persist_tracked


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve undirected ``pairs`` into components.

    Returns one row per node: ``(node, component_id)`` where
    ``component_id`` is the minimum node id in the component — a
    deterministic canonical representative, independent of partitioning
    and iteration order (min is commutative/associative).
    """
    both = pairs.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    # Undirected: keep each edge in both directions. Repartition to the
    # session's core count BEFORE persisting: a cached frame pins its
    # partition layout (AQE cannot re-coalesce under an
    # InMemoryRelation), and without this every round's join re-scans
    # the distinct's raw shuffle layout (e.g. 200 near-empty partitions
    # in a default-conf session) — the dominant cost of the loop.
    par = max(pairs.sparkSession.sparkContext.defaultParallelism, 1)
    edges = persist_tracked(
        both.union(
            both.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .distinct()
        .repartition(par, "v")
    )
    # localCheckpoint (eager) per round: persist alone is NOT enough for
    # an iterative loop — each round's plan embeds the previous round's
    # plan, and the logical tree grows until the planner itself OOMs
    # (observed at ~11 rounds on a 12-node path graph). Checkpointing
    # truncates lineage so every round plans against a flat scan. On a
    # real cluster with executor loss, prefer reliable checkpoints
    # (spark.sparkContext.setCheckpointDir + .checkpoint()); local is
    # used here so the operator works in any vanilla session.
    labels_ckpt = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    labels = labels_ckpt
    for _ in range(max_iter):
        # Min label among neighbors, then min with own label.
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy(F.col("u").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # The convergence flag rides along in the same frame, so the
        # changed-count is a cheap filter over the checkpointed result
        # instead of a second join against the old labels.
        new_labels = (
            labels.join(
                neighbor_min, F.col("node") == F.col("node2"), "left"
            )
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
                (
                    F.coalesce("nbr_label", "label") < F.col("label")
                ).alias("_changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("_changed")).count()
        # Best-effort release of the previous round. For a
        # localCheckpoint() frame this unpersist is routed through the
        # CacheManager, which has no entry for the checkpoint's
        # LogicalRDD — the blocks are actually freed when the RDD is
        # GC'd by the ContextCleaner. Dropping our only reference here
        # is what makes that GC possible; with reliable .checkpoint()
        # (setCheckpointDir) the release would be explicit instead.
        labels_ckpt.unpersist()
        labels_ckpt = new_labels
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    else:
        # Loop exhausted max_iter without the changed-count reaching 0:
        # the labels are NOT a fixed point and component ids would be
        # silently wrong (callers like dedup_clusters would emit bogus
        # canonical ids). Fail loudly — similarity graphs are
        # near-cliques and converge in a handful of rounds, so hitting
        # this means the graph (or max_iter) is not what the caller
        # assumed.
        if changed > 0:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                f"rounds ({changed} labels still changing); raise "
                "max_iter or check the pair graph for long chains"
            )
    return labels.select("node", F.col("label").alias("component_id"))


def dedup_clusters(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Components + cluster size + canonical flag, ready to drive a
    keep/delete decision: keep rows where ``is_canonical``."""
    comp = persist_tracked(connected_components(pairs, src=src, dst=dst))
    sizes = comp.groupBy(F.col("component_id").alias("_cid")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        comp.join(F.broadcast(sizes), F.col("_cid") == F.col("component_id"))
        .select(
            F.col("node").alias("doc_id"),
            "component_id",
            "cluster_size",
            (F.col("node") == F.col("component_id")).alias("is_canonical"),
        )
    )
