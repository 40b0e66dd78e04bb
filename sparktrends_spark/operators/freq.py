"""Heavy hitters: bounded-memory candidate generation + exact recount.

The naive exact top-k frequent (`groupBy(key).count().orderBy(...)
.limit(k)`) shuffles EVERY distinct key. At 100 TB with mostly-unique
keys (URLs, user ids, n-grams) that shuffle is the job. The classic
fix is a two-phase plan:

1. **Candidate generation** — each partition maintains a Misra-Gries
   summary of at most ``capacity`` keys (Arrow-batched ``mapInPandas``;
   the per-batch merge is the mergeable-summaries construction of
   Agarwal et al., "Mergeable Summaries", PODS'12 — public paper).
   Only ``<= capacity`` candidate keys leave each partition, whatever
   the input cardinality.
2. **Exact recount** — the tiny candidate set is broadcast back as a
   semi-join filter and ONLY candidate keys are shuffled for an exact
   count; the final top-k is a TakeOrderedAndProject.

Guarantee: a key with global count ``> N/(capacity+1)`` survives the
per-partition summaries (pigeonhole over partitions), so the result
EXACTLY equals the naive plan whenever the k-th frequency clears that
threshold — size ``capacity > N/count_k`` for the workload. The
recount makes reported counts exact regardless.

Reference scope note: SparkTrends has no frequency analysis; this is
engine surface for corpus curation (stopword mining, boilerplate-key
discovery, hot-entity detection).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_merge(state: dict, counts: dict, capacity: int) -> dict:
    """Merge a batch's exact counts into a Misra-Gries summary.

    Add counts, then if more than ``capacity`` keys remain subtract
    the (capacity+1)-th largest count from all and drop non-positives
    — the mergeable-summaries construction. Property (Hypothesis-
    tested): after any merge sequence over a stream of total weight N,
    every key with true count > N/(capacity+1) is present."""
    for val, cnt in counts.items():
        state[val] = state.get(val, 0) + int(cnt)
    if len(state) > capacity:
        threshold = sorted(state.values(), reverse=True)[capacity]
        state = {k: v - threshold for k, v in state.items() if v > threshold}
    return state


def mg_candidates(df: DataFrame, key_col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries candidate keys (``<= capacity`` each).

    State lives across Arrow batches inside one task; each Arrow batch
    contributes its exact value_counts through ``mg_merge``. No key
    whose partition count exceeds N_p/(capacity+1) is ever evicted."""
    field = df.schema[key_col]
    out_schema = f"{key_col} {field.dataType.simpleString()}"

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict = {}
        for pdf in batches:
            state = mg_merge(
                state, pdf[key_col].value_counts(dropna=True).to_dict(), capacity
            )
        yield pd.DataFrame({key_col: list(state.keys())})

    return df.select(key_col).mapInPandas(summarize, out_schema)


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int,
    capacity: int,
    count_col: str = "n",
) -> DataFrame:
    """Exact top-k most frequent keys without a full-cardinality shuffle.

    Shuffle volume: candidate dedup moves ``<= capacity * partitions``
    keys; the recount shuffles only rows surviving the broadcast
    semi-join filter pre-aggregated map-side — never one record per
    distinct key of the raw input. Ties at the k-th count break
    deterministically by key."""
    cand = mg_candidates(df, key_col, capacity).distinct()
    counts = (
        df.join(F.broadcast(cand), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias(count_col))
    )
    return counts.orderBy(F.col(count_col).desc(), F.col(key_col)).limit(k)
