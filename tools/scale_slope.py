#!/usr/bin/env python
"""Scale-slope evidence for the heaviest plans (VERDICT r5 item 7).

Builds a ``factor``x replica of the sf0.1 heavy tables (events,
documents, embeddings) under /tmp, times the heaviest registered
queries at 1x and ``factor``x, and verifies the physical plan shape is
unchanged across scales. Prints one JSON line per query:

    {"query": ..., "t_1x": s, "t_Nx": s, "slope": t_Nx/t_1x,
     "rows_1x": n, "rows_Nx": n, "plan_match": bool}

A slope near the replication factor (for per-row work) or below it
(for fixed-output aggregations where input grows but output doesn't)
with ``plan_match: true`` is the evidence that the plan survives a
scale-up without strategy flips, driver collects, or quadratic joins.

Replication is *structure-preserving*, not naive duplication:

- events: event_id shifted per replica; ts/user_id/event_type kept, so
  the same 50 derived symbols get factor-x ticks per bar (how a market
  feed actually scales) and the user-skew profile is preserved.
- documents: doc_id shifted; every word gets a per-replica suffix, so
  each replica reproduces the corpus's internal duplicate-rate while
  replicas are NOT near-dups of each other. Naive copying would grow
  every near-dup cluster by factor-x and inflate candidate pairs
  quadratically — a different workload, not a scale-up of this one.
- embeddings: vec_id shifted; vectors circularly rolled (and
  sign-flipped on odd replicas) per replica, preserving norms and the
  within-replica similarity structure while keeping cross-replica
  cosine far from the near-dup threshold.

Usage: python tools/scale_slope.py [factor] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_ROOT = "/tmp/sparktrends_scale_slope"

HEAVY_QUERIES = (
    "ohlcv_bars",
    "ohlcv_rollup_hourly",
    "doc_minhash_pairs",
    "embedding_neardup",
    "embedding_ivf_topk",
    # codec dataflows (round 6): per-row mapInPandas encode/decode work
    # — the slope certifies the fan-out stays linear and the plan stays
    # a single Arrow-batched pass at 10x the corpus
    "asset_jpeg_stats",
    "asset_mp4_frames",
    # round 6 (cont.): substring-dedup span pipeline (shingle fan-out +
    # hash shuffle + doc-keyed window) and the Misra-Gries heavy-hitter
    # two-phase plan — output is fixed at top-20 whatever the input
    "doc_dup_spans",
    "user_heavy_hitters",
    # composed curation pass (dedup window + map-only scrub/gate) and
    # the map-only PII scrubber — both should scale ~linearly with
    # unchanged plans
    "corpus_curation_pipeline",
    "doc_pii_redact",
    # round 7: the output-bounded near-dup report — output is O(n·k)
    # per document (cap k=3), so unlike embedding_neardup's threshold
    # pair set it must NOT inherit the O(n²) output growth
    "embedding_neardup_topk",
    # round 7 (cont.): retrieval + fragmented-container dataflows
    "doc_bm25_terms",
    "asset_fmp4_frames",
    # round 8: graph + basket ops over the replicated lineitem (orders
    # AND parts shifted per replica — a bigger catalog with more
    # orders, so edges/triangles/rules grow ~linearly; naive
    # same-partkey replication would densify the co-purchase graph and
    # grow triangles superlinearly, a different workload), plus the
    # bounded-state CMS build and the one-pass weighted sampler
    "part_triangle_top",
    "part_association_rules",
    "user_cms_frequency",
    "doc_weighted_sample",
    # late round 8: the date-keyed correlation self-join (output fixed
    # at symbols^2 pairs — input grows, pair count doesn't), the
    # broadcast-factor beta, the one-scan multi-distinct profiler, and
    # the grouping-sets skew advisor (per-key state, bounded output)
    "symbol_return_correlation",
    "symbol_market_beta",
    "events_column_profile",
    "event_key_skew_profile",
    # late round 8 (cont.): PQ/IVF-PQ ANN — training is m bounded
    # kmeans runs, encoding map-side, scoring equi-joins over codes;
    # output fixed at queries x 3
    "embedding_pq_topk",
    "embedding_ivfpq_topk",
    # index build + partition-pruned serve; fixed 4-row output
    "doc_term_lookup_indexed",
    # iterative power steps: 3 corpus scans + dim-bounded shuffles
    "embedding_top_direction",
    # late round 8 wave 2: window-form change-point detection, SCD2
    # interval construction, collocations, as-of latency percentiles,
    # QI-keyed privacy audit, rank-weighted Gini, quantile norm,
    # window drawdown + rolling co-moment beta
    "cusum_daily",
    "user_scd2_versions",
    "doc_bigram_pmi",
    "purchase_latency_percentiles",
    "events_k_anonymity",
    "user_activity_gini",
    "doc_length_quantile_norm",
    "symbol_max_drawdown",
    "symbol_rolling_beta",
)

# Ops that define the plan's *strategy* — join algorithms, aggregate
# modes, window/expand stages. Exchange/Project/scan deltas are
# excluded on purpose: scan_parallel() inserts a repartition only when
# the input arrives narrower than the core count, so the 1x single-file
# read carries an extra Exchange+Project that the 10x multi-file read
# doesn't need — by design, not a strategy flip.
_STRATEGY_OPS = frozenset(
    {
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
        "HashAggregate",
        "SortAggregate",
        "ObjectHashAggregate",
        "Window",
        "WindowGroupLimit",
        "Generate",
        "Expand",
        "MapInPandas",
        "FlatMapGroupsInPandas",
    }
)

SCALED_TABLES = ("events", "documents", "embeddings")
EMBED_DIM = 64


def _replicas(df: DataFrame, factor: int) -> DataFrame:
    """Cross the frame with replica ids 0..factor-1 (broadcast fan-out)."""
    reps = df.sparkSession.range(factor).select(F.col("id").cast("int").alias("rep"))
    return df.crossJoin(F.broadcast(reps))


def build_scaled_dir(spark: SparkSession, factor: int) -> str:
    out_dir = f"{OUT_ROOT}/x{factor}"
    if os.path.exists(out_dir):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    # Small/static tables: byte-copy, they don't participate in the
    # heavy plans but keep the dir a complete sf layout.
    for name in (
        "region", "nation", "customer", "supplier", "part", "orders",
    ):
        shutil.copy(f"{SRC_SF_DIR}/{name}.parquet", f"{out_dir}/{name}.parquet")

    # lineitem: shift BOTH orderkey and partkey per replica — each
    # replica is its own disjoint catalog+order universe, so basket
    # sizes, co-purchase degree, and triangle density match the source
    # exactly while edge/triangle/rule counts scale ~linearly.
    li = spark.read.parquet(f"{SRC_SF_DIR}/lineitem.parquet")
    _replicas(li, factor).select(
        (F.col("l_orderkey") + F.col("rep").cast("long") * F.lit(10**9)).alias(
            "l_orderkey"
        ),
        (F.col("l_partkey") + F.col("rep").cast("long") * F.lit(10**9)).alias(
            "l_partkey"
        ),
        *[
            c
            for c in li.columns
            if c not in ("l_orderkey", "l_partkey")
        ],
    ).repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )

    events = spark.read.parquet(f"{SRC_SF_DIR}/events.parquet")
    _replicas(events, factor).select(
        (F.col("event_id") + F.col("rep").cast("long") * F.lit(10**12)).alias("event_id"),
        "ts", "user_id", "event_type", "value", "props",
    ).repartition(32).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    docs = spark.read.parquet(f"{SRC_SF_DIR}/documents.parquet")
    suffixed = F.when(
        F.col("rep") == 0, F.col("text")
    ).otherwise(
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.lit("~r"), F.col("rep").cast("string")),
            ),
            " ",
        )
    )
    _replicas(docs, factor).select(
        (F.col("doc_id") + F.col("rep").cast("long") * F.lit(10**9)).alias("doc_id"),
        suffixed.alias("text"),
        "lang", "source",
        F.length(suffixed).cast("long").alias("n_chars"),
    ).repartition(32).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    # Per-replica Rademacher sign pattern: element i of replica r is
    # multiplied by ±1 from hash(r, i). A uniform diagonal orthogonal
    # transform per replica, so every within-replica cosine equals the
    # original corpus's exactly (the near-dup structure replicates 1:1)
    # while cross-replica cosines are ~N(0, 1/dim) — far below any
    # near-dup threshold. (A circular roll fails here: rolled near-dups
    # stay near-dups at lags where the corpus autocorrelates.)
    emb = spark.read.parquet(f"{SRC_SF_DIR}/embeddings.parquet")
    signed = F.when(F.col("rep") == 0, F.col("embedding")).otherwise(
        F.zip_with(
            F.col("embedding"),
            F.sequence(F.lit(0), F.lit(EMBED_DIM - 1)),
            lambda x, i: (
                x
                * (
                    F.lit(1.0)
                    - F.lit(2.0)
                    * F.pmod(
                        F.hash(F.concat_ws("_", F.col("rep"), i)), F.lit(2)
                    ).cast("double")
                )
            ).cast("float"),
        )
    )
    _replicas(emb, factor).select(
        (F.col("vec_id") + F.col("rep").cast("long") * F.lit(10**9)).alias("vec_id"),
        signed.alias("embedding"),
        "label",
    ).repartition(8).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    return out_dir


def plan_signature(df: DataFrame) -> list[str]:
    """Multiset of *strategy* operator names, pre-execution (AQE
    initial plan). See _STRATEGY_OPS for why shuffles/projections are
    excluded from the cross-scale comparison."""
    text = df._jdf.queryExecution().executedPlan().toString()
    ops: list[str] = []
    for line in text.splitlines():
        m = re.match(r"^[\s*:+-]*([A-Za-z][A-Za-z0-9]*)", line)
        if m and m.group(1) in _STRATEGY_OPS:
            ops.append(m.group(1))
    return sorted(ops)


def time_query(spark: SparkSession, name: str, sf_dir: str, reps: int) -> float:
    from sparktrends_spark.caching import release_persisted
    from sparktrends_spark.plans import QUERIES

    best = float("inf")
    for _ in range(reps):
        start = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - start)
    release_persisted()
    return round(best, 3)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from sparktrends_spark.caching import release_persisted
    from sparktrends_spark.plans import QUERIES
    from sparktrends_spark.session import get_spark

    spark = get_spark("sparktrends-scale-slope")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = build_scaled_dir(spark, factor)

    for t in SCALED_TABLES:
        n1 = spark.read.parquet(f"{SRC_SF_DIR}/{t}.parquet").count()
        nN = spark.read.parquet(f"{scaled_dir}/{t}.parquet").count()
        print(json.dumps({"table": t, "rows_1x": n1, f"rows_{factor}x": nN}))

    # SLOPE_ONLY=name1,name2 restricts the run (iterating on one op's
    # slope without re-timing the whole list)
    only = os.environ.get("SLOPE_ONLY")
    names = (
        [n for n in only.split(",") if n] if only else list(HEAVY_QUERIES)
    )
    for name in names:
        # Warm: compile/JIT both plans once outside the timed region.
        QUERIES[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        release_persisted()

        df1 = QUERIES[name](spark, SRC_SF_DIR)
        dfN = QUERIES[name](spark, scaled_dir)
        sig1, sigN = plan_signature(df1), plan_signature(dfN)
        if sig1 != sigN:
            from collections import Counter

            c1, cN = Counter(sig1), Counter(sigN)
            print(
                json.dumps(
                    {
                        "query": name,
                        "plan_only_1x": dict(c1 - cN),
                        "plan_only_Nx": dict(cN - c1),
                    }
                )
            )
        rows1, rowsN = df1.count(), dfN.count()
        release_persisted()

        t1 = time_query(spark, name, SRC_SF_DIR, reps)
        tN = time_query(spark, name, scaled_dir, reps)
        print(
            json.dumps(
                {
                    "query": name,
                    "t_1x": t1,
                    f"t_{factor}x": tN,
                    "slope": round(tN / t1, 2) if t1 else None,
                    "rows_1x": rows1,
                    f"rows_{factor}x": rowsN,
                    "plan_match": sig1 == sigN,
                }
            )
        )

    spark.stop()


if __name__ == "__main__":
    main()
