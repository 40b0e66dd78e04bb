"""Lloyd's k-means over an embedding column — iterative clustering.

Fourth member of the iterative family (connected components, PageRank,
triangles): unsupervised corpus organization — topic bucketing,
deduplication blocking, and diversity sampling all start from a
k-means pass over document embeddings at training-data scale.

Per iteration:
  assign:  cluster(v) = argmin_c round6(||v - c||^2), ties by cluster
  update:  c' = round9(decimal-sum(round6(values)) / n, per dimension);
           an empty cluster keeps its previous centroid

Scale shape: the assignment is a MAP-SIDE expression — centroids are
k x dim doubles collected to the driver once per iteration (a bounded,
documented collect, the same contract as MLlib's KMeans aggregation)
and re-enter the plan as literals, so no join and no shuffle touches
the corpus for assignment; the update is one groupBy(cluster, pos)
average over the exploded assignment, k*dim output rows per
iteration. Cost per iteration = one corpus scan + one k*dim-bounded
shuffle, independent of k-means round count memory-wise.

Float discipline (the exact-oracle gate): squared distances are
computed as a SEQUENTIAL fold over dimensions (zip_with + aggregate —
the same left-to-right order the oracle's list comprehension uses)
and quantized round-6 BEFORE the argmin, so cross-engine ULP drift
cannot flip an assignment; centroid updates sum round-6-quantized
values as EXACT decimals (partition/merge-order independent — a raw
double avg can land within a ULP of the round-9 grid and flip across
engines or parallelism), divide once, and quantize round-9 before
re-entering the next iteration (the PageRank per-iteration rounding
discipline), so both engines iterate on bit-identical centroids.

Reference scope note: SparkTrends has no clustering; engine extension
(SURVEY §2 absent inventory, LLM-pipeline operators).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparktrends_spark.caching import persist_tracked


def _round9_mean(s, n: int) -> float:
    """round-9 of the exact rational mean ``s/n`` (``s`` a scale-6
    Decimal sum), HALF AWAY FROM ZERO, in pure integer arithmetic.

    The mean of 6-decimal-quantized values is a small-denominator
    rational, so it lands EXACTLY on 1e-9-grid halves routinely (e.g.
    n=2000 -> k/2e9, half for every odd k) — where double-based
    round() primitives disagree across engines (Python rounds the
    binary value's true decimal expansion; DuckDB rounds the scaled
    product, which can manufacture or miss the tie). Integer floor
    division with an explicit away-from-zero rule is tie-exact in any
    engine; the final /1e9 is one correctly-rounded int->double
    conversion everywhere. The oracle restates the identical formula
    (plans/similarity.py _kmeans_chain)."""
    su = int(s * (10**6))  # exact: s is a scale-6 decimal
    n = int(n)
    if su >= 0:
        u9 = (2000 * su + n) // (2 * n)
    else:
        u9 = -((2000 * -su + n) // (2 * n))
    return u9 / 1e9


def dist2_col(vec_col: F.Column, cent_col: F.Column) -> F.Column:
    """round6 squared L2 between two array columns — the sequential
    left-to-right fold over dimensions (the oracle's list-comprehension
    order), with the centroid as a COLUMN so one lambda serves every
    centroid (see ``cent_struct_array``)."""
    diffsq = F.zip_with(vec_col, cent_col, lambda a, b: (a - b) * (a - b))
    return F.round(
        F.aggregate(diffsq, F.lit(0.0), lambda acc, x: acc + x), 6
    )


_CENT_MEMO: dict[tuple, tuple[object, int]] = {}  # key -> (Column, bytes)
_CENT_MEMO_MAX_BYTES = 128 * 1024 * 1024
_CENT_MEMO_LOCK = threading.Lock()


def _session_token() -> str | None:
    """Identity of the live Spark gateway, folded into every memo key:
    memoized Columns hold py4j expression handles that die with their
    JVM, so a process that recycles its SparkContext (a serving
    container restarting the gateway between batches) must MISS the
    cache and rebuild rather than serve dead handles with opaque py4j
    errors. applicationId is unique per context; a fresh context means
    every old entry is unreachable and ages out of the byte-bounded
    FIFO like any cold key."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    return sc.applicationId if sc is not None else None


def centroid_memo_key(centroids: dict[int, list[float]]) -> tuple:
    """Content key for memoizing constructed centroid literals: the
    exact float64 bytes, so two dicts with equal values share one
    Column and any numeric difference (a retrain) misses the cache."""
    import numpy as np

    return tuple(
        (int(c), np.asarray(centroids[c], dtype=np.float64).tobytes())
        for c in sorted(centroids)
    )


def memo_literal(key: tuple, build) -> F.Column:
    """Process-level memo for constructed literal Columns (bounded in
    BYTES, FIFO eviction — at thousands-of-cells scale one entry is
    k x dim doubles, so a count bound alone could pin gigabytes).
    Constructing a k x dim literal costs one py4j round-trip per
    centroid — a serving process that answers query batch after query
    batch against the SAME index must not pay that per batch, any more
    than a FAISS server would reload its index per query. Column
    objects are immutable expression trees, so reuse across plans is
    exactly as safe as reusing ``F.lit(5)``.

    Lifetime: entries are keyed by the LIVE gateway's applicationId
    (``_session_token``), so a recycled SparkContext can never be
    served a dead py4j handle — its keys simply miss. The
    get/size/evict/insert sequence holds a process lock: a foreachBatch
    stream thread racing a main-thread serve must not interleave the
    bytes-accounting eviction (the build itself runs outside the lock
    — it is py4j-bound, and a rare duplicate build is harmless: last
    writer wins with an identical Column)."""
    key = (_session_token(),) + key
    with _CENT_MEMO_LOCK:
        hit = _CENT_MEMO.get(key)
    if hit is not None:
        return hit[0]
    col = build()
    # key = (token, tag, (id, float64-bytes), ...): size the byte blobs
    nbytes = sum(
        len(b)
        for e in key
        if isinstance(e, tuple)
        for b in e
        if isinstance(b, bytes)
    )
    with _CENT_MEMO_LOCK:
        total = sum(n for _, n in _CENT_MEMO.values()) + nbytes
        while _CENT_MEMO and total > _CENT_MEMO_MAX_BYTES:
            oldest = next(iter(_CENT_MEMO))  # insertion order = FIFO
            total -= _CENT_MEMO.pop(oldest)[1]
        _CENT_MEMO[key] = (col, nbytes)
    return col


def vec_array_literal(vecs: dict[int, list[float]]) -> F.Column:
    """A keyed vector set (centroids or a PQ codebook) as one literal
    array of vectors, key ascending — one numpy ``F.lit`` per vector
    (not per element), content-memoized. Element k+1 is the vector of
    the k-th smallest key, so ``element_at(col, key + 1)`` is the
    contiguous-id positional lookup the ADC/residual paths rely on."""
    import numpy as np

    def _build() -> F.Column:
        return F.array(
            *[
                F.lit(np.asarray(vecs[c], dtype=np.float64))
                for c in sorted(vecs)
            ]
        )

    return memo_literal(("arrays",) + centroid_memo_key(vecs), _build)


def cent_struct_array(
    centroids: dict[int, list[float]], memoize: bool = True
) -> F.Column:
    """The centroid set as ONE literal array of (c, v) structs, cluster
    ascending. Every leaf is a literal, so Catalyst constant-folds the
    whole thing into a single array value — scoring then iterates it
    with ONE ``transform`` lambda. The pre-round-12 shape (a separate
    zip_with/aggregate expression tree per centroid) made analysis and
    codegen cost scale with k: at 64 cells a 10-query IVF-PQ serve
    spent ~9 s/batch in plan handling alone; the single-lambda shape
    plans in constant time. At thousands of cells the folded literal
    rides the task binary (k x dim doubles) — bounded, same contract
    as the per-iteration centroid collect. Each centroid vector enters
    as one numpy ``F.lit`` (one py4j call per centroid, not per
    element — float64 is exact either way), and the finished Column is
    memoized by content so repeat serves against the same index pay
    zero construction. ``memoize=False`` skips the cache — the Lloyd
    loop's INTERMEDIATE centroids are never seen again, and caching
    them would churn out the standing-index entries the memo exists
    for."""
    import numpy as np

    def _build() -> F.Column:
        return F.array(
            *[
                F.struct(
                    F.lit(int(c)).alias("c"),
                    F.lit(
                        np.asarray(centroids[c], dtype=np.float64)
                    ).alias("v"),
                )
                for c in sorted(centroids)
            ]
        )

    if not memoize:
        return _build()
    return memo_literal(("structs",) + centroid_memo_key(centroids), _build)


def dist_struct_array(
    vec_col: F.Column,
    centroids: dict[int, list[float]],
    memoize: bool = True,
) -> F.Column:
    """(round6 L2 distance d, cluster c) structs for ``vec_col``
    against every centroid, cluster ascending — ``array_min`` of this
    is the assignment, ``array_sort`` + ``slice`` the nprobe probe
    list. Struct field order (d, c) makes min/sort compare dist-asc
    then cluster-asc, the engine-exact tie-break the Lloyd loop, the
    IVF-PQ coarse quantizer, and the probe selection all share."""
    return F.transform(
        cent_struct_array(centroids, memoize=memoize),
        lambda s: F.struct(
            dist2_col(vec_col, s["v"]).alias("d"), s["c"].alias("c")
        ),
    )


def assign_clusters(
    frame: DataFrame,
    centroids: dict[int, list[float]],
    vec_col: str = "_v",
    out_col: str = "cluster",
    memoize: bool = True,
) -> DataFrame:
    """Map-side argmin assignment against literal centroids: array_min
    over (round6 L2 distance, cluster) structs — dist-asc then
    cluster-asc, the engine-exact tie-break both the Lloyd loop and
    the IVF coarse quantizer share."""
    best = F.array_min(
        dist_struct_array(F.col(vec_col), centroids, memoize=memoize)
    )
    return frame.withColumn(out_col, best["c"])


def kmeans_fit(
    vectors: DataFrame,
    k: int = 4,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[dict[int, list[float]], DataFrame]:
    """Run ``iterations`` Lloyd steps seeded with the vectors whose
    ids are the ``k`` smallest (deterministic, engine-independent).

    Returns ``(centroids, assigned)``: the final round-9 centroid
    dict and the final assignment frame ``(id_col, cluster)`` (the
    assignment AGAINST the final centroids, i.e. one extra assign
    pass after the last update — the labeling a caller would persist).
    """
    # every iteration re-reads the projected vectors (assign + update
    # + the final labeling): persist once, released by the caller's
    # release_persisted() like the CC loop
    v = persist_tracked(
        vectors.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
        )
    )
    seed_rows = v.orderBy(id_col).limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"kmeans_fit: need >= {k} vectors")
    centroids = {
        c: [round(x, 9) for x in row["_v"]]
        for c, row in enumerate(seed_rows)
    }

    # The update is ONE fixed-width partial+final HashAggregate per
    # iteration: array(sum(round(_v[0],6)), ..) + count, a 2·dim-decimal
    # buffer per cluster — no posexplode (corpus rows × dim through a
    # Generate), no (cluster, pos) shuffle, and the per-iteration
    # collect shrinks from k·dim rows to k. Fixed dim is already this
    # loop's contract (the long-form path indexed a [0.0]*dim list by
    # pos); the exact decimal sums are order-independent, so the means
    # are bit-identical to the long-form transpose.
    dim = len(centroids[0])
    sum_exprs = ", ".join(
        f"sum(cast(round(_v[{i}], 6) as decimal(38,6)))" for i in range(dim)
    )
    for _ in range(iterations):
        # memoize=False: intermediate centroids are one-shot — caching
        # them would churn the standing-index literal memo
        assigned = assign_clusters(v, centroids, memoize=False)
        stats = (
            assigned.groupBy("cluster")
            .agg(
                F.expr(f"array({sum_exprs})").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = {
            int(r["cluster"]): [
                _round9_mean(s_i, r["n"]) for s_i in r["s"]
            ]
            for r in stats
        }
        # empty cluster: keep previous centroid
        centroids = {c: new.get(c, centroids[c]) for c in range(k)}

    return centroids, assign_clusters(v, centroids).select(id_col, "cluster")
