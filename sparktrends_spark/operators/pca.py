"""Power iteration for the top principal direction of an embedding
corpus — the fifth member of the iterative family (connected
components, PageRank, triangles, k-means).

Per iteration, with the current direction v (a dim-length literal):
  score:     s(x)  = round6( x . v )          (map-side fold per row)
  aggregate: w_i   = round9( sum_x x_i s(x) ) (one dim-bounded shuffle)
  normalize: v'_i  = round9( w_i / ||w|| )    (driver-side, dim floats)

The direction converges to the dominant eigenvector of the (uncentered)
Gram matrix X'X — the first PCA axis of the corpus up to centering,
which callers apply upstream when they need it. Downstream uses:
spectral ordering for curriculum, whitening's first step, and the
classic "remove the common direction" embedding post-processing.

Scale shape (the PageRank/k-means contract): the direction is dim
doubles collected per iteration — a bounded, documented collect — and
re-enters the plan as literals, so scoring is a pure map and the only
shuffle is the dim-row aggregation. Cost per iteration = one corpus
scan; memory independent of iteration count.

Float discipline: scores quantize round-6 BEFORE the outer product
(so cross-engine fold drift in the dot cannot propagate), component
sums quantize round-9 (aggregation-order drift ~1e-11 absolute
against a 1e-9 grid), and the normalize runs driver-side on already-
quantized values — both engines iterate on bit-identical directions,
which is what lets the oracle unroll the loop into chained CTEs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparktrends_spark.caching import persist_tracked
from sparktrends_spark.similarity.cosine import dot


def power_iteration(
    vectors: DataFrame,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[float], float]:
    """Return ``(direction, lam)`` after ``iterations`` power steps:
    the round-9 unit direction and the round-6 Rayleigh-quotient
    estimate lam = mean of s(x)^2 under the FINAL direction (the
    dominant eigenvalue of X'X / n)."""
    v = persist_tracked(
        vectors.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
        )
    )
    seed_row = v.orderBy(id_col).limit(1).collect()
    if not seed_row:
        raise ValueError("power_iteration: empty input")
    x0 = seed_row[0]["_v"]
    nrm = math.sqrt(sum(c * c for c in x0))
    if nrm == 0.0:
        raise ValueError("power_iteration: zero seed vector")
    direction = [round(c / nrm, 9) for c in x0]

    for _ in range(iterations):
        lit = F.array(*[F.lit(float(c)) for c in direction])
        scored = v.select("_v", F.round(dot(F.col("_v"), lit), 6).alias("_s"))
        w_rows = (
            scored.select(F.posexplode("_v").alias("pos", "val"), "_s")
            .groupBy("pos")
            .agg(F.round(F.sum(F.col("val") * F.col("_s")), 9).alias("w"))
            .collect()
        )
        w = [0.0] * len(direction)
        for r in w_rows:
            w[r["pos"]] = r["w"]
        nrm = math.sqrt(sum(c * c for c in w))
        if nrm == 0.0:  # degenerate corpus: keep the old direction
            break
        direction = [round(c / nrm, 9) for c in w]

    lit = F.array(*[F.lit(float(c)) for c in direction])
    lam_row = (
        v.select(F.round(dot(F.col("_v"), lit), 6).alias("_s"))
        .agg(
            F.round(
                F.sum(F.col("_s") * F.col("_s")) / F.count(F.lit(1)), 6
            ).alias("lam")
        )
        .collect()[0]
    )
    return direction, float(lam_row["lam"])
