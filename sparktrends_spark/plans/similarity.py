"""Embedding similarity queries over ``embeddings`` (north-star).

Cosines are computed in double precision and rounded to 6 digits
*before* ranking in both engines, so top-k boundaries cannot flip on
last-bit float noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparktrends_spark.plans.registry import query
from sparktrends_spark.similarity.cosine import (
    brute_force_topk,
    hyperplanes,
    lsh_topk,
)
from sparktrends_spark.sources.tables import load_table

_N_QUERIES = 10
_DIM = 64
_N_PLANES = 8

_COS = (
    "round(list_dot_product(qv, cv) / "
    "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6)"
)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


@query(
    "embedding_topk",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {_N_QUERIES}
),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
scored AS (
  SELECT query_id, vec_id, {_COS} AS cosine
  FROM c, q WHERE vec_id != query_id
)
SELECT query_id, vec_id, cosine, rnk FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored
) WHERE rnk <= 5
""",
)
def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 10 vectors as queries.

    Broadcast queries x partitioned candidate scan: the big side never
    shuffles; ranking is one per-query window.
    """
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(queries, emb, k=5)


@query(
    "embedding_centroids",
    oracle="""
SELECT label, i AS pos, avg(CAST(embedding[i] AS DOUBLE)) AS mean_v, count(*) AS n
FROM embeddings, generate_series(1, 64) AS t(i)
GROUP BY label, i
""",
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid in long form (label, dim position, mean)."""
    emb = _emb(spark, sf_dir)
    return (
        emb.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(
            F.avg(F.col("v").cast("double")).alias("mean_v"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _lsh_oracle() -> str:
    planes = hyperplanes(_N_PLANES, _DIM)
    bits = " || ".join(
        "CASE WHEN list_dot_product(v, ["
        + ", ".join(f"{x:.1f}" for x in plane)
        + "]) >= 0 THEN '1' ELSE '0' END"
        for plane in planes
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, v, {bits} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < {_N_QUERIES}),
c AS (SELECT vec_id, v AS cv, bucket FROM b),
scored AS (
  SELECT query_id, vec_id, {_COS} AS cosine
  FROM c JOIN q USING (bucket) WHERE vec_id != query_id
)
SELECT query_id, vec_id, cosine, rnk FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk
  FROM scored
) WHERE rnk <= 3
"""


@query("embedding_lsh_topk", oracle=_lsh_oracle())
def q_embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-3 via md5-parity hyperplane LSH buckets — the scale path
    (compare ~1/2^8 of the corpus per query). Oracle builds identical
    planes, so results match exactly."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(queries, emb, num_planes=_N_PLANES, dim=_DIM, k=3)
