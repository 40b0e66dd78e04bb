"""Product quantization (PQ) — memory-bounded approximate nearest
neighbor, the FAISS-style companion to the IVF operators.

The embedding family already has brute-force, LSH, and IVF top-k;
what none of them change is the PER-VECTOR MEMORY: every candidate is
scored against its full float vector. PQ replaces each vector with m
sub-space code IDs (here 2 x 1 byte instead of 64 doubles): train an
independent k-means codebook per sub-space (`operators/kmeans.py`,
reused verbatim per slice), encode every vector as its per-sub-space
nearest-centroid ids, and answer queries by Asymmetric Distance
Computation — a per-query lookup table of (sub-space, code) ->
distance, so candidate scoring touches ONLY the code columns.

Scale shape: training cost = m bounded k-means runs (each a map-side
argmin + k*dim/m-bounded update per iteration); encoding is one
map-side pass; the ADC query plan is TWO broadcast equi-joins of the
code table — a tiny (query, code_0) key frame for the fan-out, then
one m x k sub-distance LUT row per query — independent of m (never a
nested-loop join, never the raw vectors) plus a per-query top-k
window. A billion-vector corpus scans bytes, not floats — the whole
point of PQ.

Float discipline: sub-space distances inherit kmeans' round-6-
before-argmin rule, LUT entries are round-6, and the ADC score is a
FIXED-ORDER expression sum of m rounded terms (not an aggregation) —
deterministic in every engine, so the oracle matches bit-exact with
no further rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparktrends_spark.operators.kmeans import (
    assign_clusters,
    dist2_col,
    kmeans_fit,
    vec_array_literal,
)

Codebooks = dict[int, dict[int, list[float]]]


def _sub(vec_col: str, s: int, sub_len: int):
    # F.slice is 1-based
    return F.slice(
        F.col(vec_col).cast("array<double>"), s * sub_len + 1, sub_len
    )


def adc_lut_array(books: Codebooks, dim: int, vec_col: str) -> F.Column:
    """The fused-ADC lookup table as ONE nested m x k array column of
    round-6 sub-space distances between ``vec_col``'s sub-vectors and
    every codebook entry — shared by pq_topk, the in-query IVF-PQ
    plan, and the persisted-index serve so the three stay
    byte-identical by construction. Raises (never a bare assert —
    ``python -O`` would compile that out into silently wrong
    element_at lookups) if code ids are not contiguous 0..k-1, the
    positional contract kmeans_fit guarantees."""
    m = len(books)
    sub_len = dim // m
    for s in range(m):
        if sorted(books[s]) != list(range(len(books[s]))):
            raise ValueError(
                f"codebook {s} ids {sorted(books[s])} not contiguous"
                " 0..k-1 — element_at positional lookup would read the"
                " wrong slot"
            )
    # per sub-space: ONE transform lambda over the constant-folded
    # codebook array, not k_codes separate distance expression trees
    # (whose analysis cost scales with m x k — the same plan-time
    # blowup kmeans.cent_struct_array documents for cell counts).
    # The lambda MUST be unary and close over s via a factory: a
    # two-parameter lambda is pyspark's (element, index) form, which
    # would silently bind the second arg to the array index column.
    def _sub_lut(s: int) -> F.Column:
        return F.transform(
            vec_array_literal(books[s]),
            lambda cv: dist2_col(_sub(vec_col, s, sub_len), cv),
        )

    return F.array(*[_sub_lut(s) for s in range(m)])


def adc_score(m: int, lut_col: str = "_lut", code_prefix: str = "code_") -> F.Column:
    """The ADC distance: fixed-order (s = 0..m-1) sum of element_at
    lookups into the fused LUT — the same left-to-right addition order
    as the unrolled oracle chains, so scores are engine-exact."""
    approx = None
    for s in range(m):
        term = F.element_at(
            F.element_at(F.col(lut_col), s + 1),
            F.col(f"{code_prefix}{s}") + 1,
        )
        approx = term if approx is None else approx + term
    return approx


def pq_train(
    vectors: DataFrame,
    dim: int,
    m: int = 2,
    k: int = 4,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebooks:
    """One independent k-means codebook per sub-space, trained JOINTLY:
    all m sub-spaces ride one tagged union frame, so seeding is one
    TakeOrdered collect (every sub-space seeds from the same k
    smallest ids) and each Lloyd step is ONE assignment + aggregate
    job instead of m — m×(iterations+1) driver round-trips become
    (iterations+1) per training (r14 §5). The per-sub-space algebra
    is byte-for-byte the kmeans_fit contract: round-6-before-argmin
    assignment with the (dist asc, cluster asc) tie-break per
    sub-space, exact-decimal sums per (sub-space, cluster) group
    (order-independent, so the union changes nothing), round-9
    half-away-from-zero means, empty clusters keep their previous
    centroid."""
    from functools import reduce

    from sparktrends_spark.caching import persist_tracked
    from sparktrends_spark.operators.kmeans import (
        _round9_mean,
        dist_struct_array,
    )

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_len = dim // m
    v = persist_tracked(
        reduce(
            DataFrame.unionByName,
            [
                vectors.select(
                    F.lit(s).alias("_sub"),
                    F.col(id_col).alias("_id"),
                    _sub(vec_col, s, sub_len).alias("_v"),
                )
                for s in range(m)
            ],
        )
    )
    seed_rows = (
        vectors.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(f"kmeans_fit: need >= {k} vectors")
    books: Codebooks = {
        s: {
            c: [
                round(x, 9)
                for x in row["_v"][s * sub_len : (s + 1) * sub_len]
            ]
            for c, row in enumerate(seed_rows)
        }
        for s in range(m)
    }
    sum_exprs = ", ".join(
        f"sum(cast(round(_v[{i}], 6) as decimal(38,6)))"
        for i in range(sub_len)
    )
    for _ in range(iterations):
        # per-sub-space argmin (the assign_clusters expression), routed
        # by the tag — rows of sub-space s evaluate exactly the
        # expression the independent trainer used
        cl = F.array_min(
            dist_struct_array(F.col("_v"), books[m - 1], memoize=False)
        )["c"]
        for s in range(m - 2, -1, -1):
            cl = F.when(
                F.col("_sub") == s,
                F.array_min(
                    dist_struct_array(F.col("_v"), books[s], memoize=False)
                )["c"],
            ).otherwise(cl)
        stats = (
            v.withColumn("cluster", cl)
            .groupBy("_sub", "cluster")
            .agg(
                F.expr(f"array({sum_exprs})").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = {
            (int(r["_sub"]), int(r["cluster"])): [
                _round9_mean(x, r["n"]) for x in r["s"]
            ]
            for r in stats
        }
        books = {
            s: {c: new.get((s, c), books[s][c]) for c in range(k)}
            for s in range(m)
        }
    return books


def pq_encode(
    vectors: DataFrame,
    books: Codebooks,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-side encoding: per sub-space nearest-codebook-centroid id
    (round-6 distances, ties by code — the kmeans assignment rule).
    Returns ``(id_col, code_0 .. code_{m-1})``."""
    m = len(books)
    sub_len = dim // m
    out = vectors.select(id_col, F.col(vec_col).cast("array<double>").alias("_v"))
    for s in range(m):
        out = assign_clusters(
            out.withColumn("_s", _sub("_v", s, sub_len)),
            books[s],
            vec_col="_s",
            out_col=f"code_{s}",
        ).drop("_s")
    return out.drop("_v")


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    books: Codebooks,
    dim: int,
    k_neighbors: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """ADC top-k: encode the corpus, fan out queries via a broadcast
    (query, code_0) key join, attach each query's m x k round-6
    sub-distance LUT row with a second broadcast join, score via
    fixed-order element_at lookups, keep the k best per query
    (approx distance asc, id asc).

    ``exclude_self`` drops candidates whose id equals the probing
    query's id — correct ONLY when query ids are drawn from the corpus
    id space (self-search). Pass False when query ids are a separate
    namespace: there, an id collision is an unrelated vector and must
    stay eligible."""
    from pyspark.sql import Window

    m = len(books)
    codes = pq_encode(vectors, books, dim, id_col=id_col, vec_col=vec_col)

    q = queries.select(
        F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("_qv")
    )
    # fused ADC (round 10): TWO broadcast equi-joins independent of m
    # (the old form used one join PER sub-space). Exhaustive PQ has no
    # natural equi key between corpus codes and queries, so the query
    # fan-out is disguised as an equi-join on the code_0 value: a tiny
    # (query, c0) KEY frame joins first (every corpus row matches
    # exactly one row per query), then the m x k LUT PAYLOAD joins by
    # query id — one payload row per query, so the broadcast stays
    # O(|q| * (k + m*k)) doubles, the same total as the old m frames
    # (duplicating the payload onto the k key rows instead would blow
    # the broadcast up k-fold: k=256 classical budgets -> MBs/query).
    # Scoring is the same fixed-order element_at sum — byte-identical.
    lut_keys = q.select(query_id_col).select(
        query_id_col,
        F.explode(
            F.array(*[F.lit(c) for c in sorted(books[0])])
        ).alias("_c0"),
    )
    lut_payload = q.select(
        query_id_col, adc_lut_array(books, dim, "_qv").alias("_lut")
    )
    scored = (
        codes.join(F.broadcast(lut_keys), codes["code_0"] == F.col("_c0"))
        .drop("_c0")
        .join(F.broadcast(lut_payload), query_id_col)
    )
    approx = adc_score(m)
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col(query_id_col))
    scored = scored.select(
        query_id_col, id_col, approx.alias("approx_d2")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("approx_d2"), F.asc(id_col)
    )
    return scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= k_neighbors
    )
