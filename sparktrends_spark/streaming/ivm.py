"""Incremental view maintenance (IVM) for a GROUP BY aggregate under
a CDC changefeed — the materialized-view counterpart of
``apply_cdc_bucketed``.

``order_cdc_state`` grades applying inserts/updates/deletes to the
BASE table; a warehouse also keeps aggregates (dashboard rollups,
BI extracts) over that table, and recomputing them per batch costs a
full scan. This module maintains ``group -> (count, exact sum)``
with the counting algebra instead: each change contributes
``-old_row`` and ``+new_row`` to its group's partials, so the
aggregate advances in O(batch) — never rescanning the base — and a
group whose count reaches zero is physically deleted.

The feed carries no before-images (op + new values only, the
Debezium-without-`before` shape), so old contributions come from the
base table itself via ``read_upserted_keyed`` — a bucket-pruned point
read of exactly the touched keys, O(batch buckets). This also makes
GROUP MOVES correct for free: an update that changes a row's group
subtracts from the old group and adds to the new one.

Contracts:
- The batch must be key-compacted (at most one op per key), the
  standard shape of a per-batch changefeed; multiple ops per key in
  one batch would need ordered intra-batch folding.
- Sums are carried as ``decimal(18,2)`` partials (exact,
  merge-order-independent — the repo's aggregate-value discipline).
- Crash safety by WRITE ORDER: the aggregate delta commits BEFORE the
  base apply, both at the batch ``version``. A replay after a crash
  between the two recomputes the identical delta (base still
  pre-batch), finds the aggregate buckets already committed at that
  version (no-op), and completes the base apply. After both commit, a
  replay no-ops entirely.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparktrends_spark.streaming.sinks import (
    apply_cdc_bucketed,
    read_manifest,
    read_upserted_keyed,
)

_DELETE_OPS = ("D", "DELETE")


def _read_keyed_or_empty(
    spark: SparkSession, path: str, probe: DataFrame, schema: str
) -> DataFrame:
    """Keyed read, or an empty typed frame before the table exists
    (first batch)."""
    if not os.path.isdir(path.rstrip("/")) or read_manifest(path.rstrip("/")) is None:
        return spark.createDataFrame([], schema)
    return read_upserted_keyed(spark, path, probe)


def maintain_agg_cdc(
    batch: DataFrame,
    base_dir: str,
    agg_dir: str,
    keys: Sequence[str],
    group_col: str,
    value_col: str,
    version: int,
    op_col: str = "op",
    n_buckets: int = 16,
) -> None:
    """Apply one CDC batch to the base table AND advance the
    ``group_col -> (n_rows, total)`` aggregate incrementally."""
    spark = batch.sparkSession
    keys = list(keys)
    base_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in batch.schema.fields
        if f.name != op_col
    )

    # the batch feeds THREE consumers (key probe, +new contributions,
    # the base apply) — pin it so its upstream plan runs once per
    # call, not per consumer (in foreachBatch the micro-batch is
    # already materialized and this is a no-op-cost cache; in batch
    # replays of a changefeed it saves two source re-reads)
    batch = batch.persist()

    # -old: current contributions of every touched key (bucket-pruned
    # point read; semi-join drops co-bucketed rows of other keys).
    # No .distinct(): the batch is key-compacted by contract, the
    # bucket-id collection dedups internally, and left-semi semantics
    # ignore probe duplicates — a distinct here is one wasted
    # O(batch) shuffle per call.
    probe = batch.select(*keys)
    old = _read_keyed_or_empty(spark, base_dir, probe, base_schema).join(
        probe, keys, "left_semi"
    )
    neg = old.select(
        F.col(group_col).alias("grp"),
        F.lit(-1).cast("long").alias("dn"),
        (-F.col(value_col).cast("decimal(18,2)")).alias("dv"),
    )
    # +new: non-tombstone rows of the batch
    ops = F.upper(F.col(op_col))
    pos = batch.where(~ops.isin(*_DELETE_OPS)).select(
        F.col(group_col).alias("grp"),
        F.lit(1).cast("long").alias("dn"),
        F.col(value_col).cast("decimal(18,2)").alias("dv"),
    )
    # touched-groups-sized (tiny), but its upstream includes the old
    # point-read AND the batch scan — pin it: it feeds the agg-table
    # probe, the merge join, and (twice) the merged projection
    delta = (
        neg.unionByName(pos)
        .groupBy("grp")
        .agg(F.sum("dn").alias("dn"), F.sum("dv").alias("dv"))
        .where((F.col("dn") != 0) | (F.col("dv") != 0))
        .persist()
    )

    # merge with the touched groups' current partials; count-0 groups
    # become tombstones (physically removed from the aggregate table)
    agg_schema = f"`{group_col}` string, `n_rows` long, `total` decimal(20,2)"
    cur = _read_keyed_or_empty(
        spark, agg_dir, delta.select(F.col("grp").alias(group_col)), agg_schema
    ).join(delta.select(F.col("grp").alias(group_col)), [group_col], "left_semi")
    merged = delta.join(
        cur, delta["grp"] == cur[group_col], "left_outer"
    ).select(
        F.col("grp").alias(group_col),
        (F.coalesce(F.col("n_rows"), F.lit(0)) + F.col("dn")).alias("n_rows"),
        (
            F.coalesce(F.col("total"), F.lit(0).cast("decimal(20,2)"))
            + F.col("dv")
        )
        .cast("decimal(20,2)")
        .alias("total"),
    )
    changes = merged.select(
        group_col,
        "n_rows",
        "total",
        F.when(F.col("n_rows") == 0, F.lit("d")).otherwise(F.lit("u")).alias("op"),
    )
    # aggregate delta FIRST, base apply second (see crash-safety note)
    try:
        apply_cdc_bucketed(
            changes,
            agg_dir,
            keys=(group_col,),
            n_buckets=n_buckets,
            version=version,
        )
        apply_cdc_bucketed(
            batch, base_dir, keys=keys, n_buckets=n_buckets, version=version
        )
    finally:
        delta.unpersist()
        batch.unpersist()
