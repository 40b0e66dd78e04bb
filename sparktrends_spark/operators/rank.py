"""Distributed global rank — row_number over a total order without a
single-partition sort.

An unpartitioned ``row_number().over(Window.orderBy(...))`` moves
EVERY row into one task (Spark itself warns "No Partition Defined for
Window operation"); at the entity cardinalities this engine targets
(10^8-10^9 users / documents) that one task IS the job. The classical
MPP restatement is a two-phase rank:

1. range-partition on the order key (``repartitionByRange``), so every
   row in partition p sorts before every row in partition p+1;
2. rank WITHIN each range partition (each window group is ONE bounded
   partition, ~n/num_partitions rows — never the whole frame);
3. per-partition row counts (num_partitions scalars, collected — the
   same bounded-collect contract as the k-means centroid loop) become
   broadcast cumulative offsets: global rank = offset + local rank.

Cost: the range exchange, one bounded-output count aggregation, and a
hash exchange on the partition id for the local window — three
shuffles of which only two move the data, versus the single-task sort
that stops scaling at one executor's memory.

Requires a TOTAL order (include a unique tiebreaker column): with
duplicate full keys the range partitioner may split a tie group across
a boundary, which is exactly the regime where ``row_number`` itself is
nondeterministic anyway.

Reference scope note: SparkTrends has no ranking surface; engine
extension (SURVEY §2 absent inventory — scale restatement of the
global-window idiom used by the Gini/RFM/top-spend families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparktrends_spark.caching import persist_tracked


def with_global_rank(
    df: DataFrame,
    order_cols,
    rank_col: str = "rnk",
    num_partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Append ``rank_col`` = global 1-based row_number under
    ``order_cols`` (strings or asc()/desc() Columns forming a total
    order) with no single-partition window. The input frame is
    persisted (it is scanned twice: counts + rank); callers release
    via ``release_persisted()`` like every other multi-branch plan.

    ``total_col``: also attach the total row count as a bigint literal
    column — free (the two-phase rank already collected per-partition
    counts), and exactly what percent_rank / cume_dist / ntile
    restatements need alongside the rank.

    Determinism contract: the input must recompute identically if the
    persisted blocks are evicted (every registered caller reads
    immutable parquet through deterministic plans). The two passes
    (driver-side counts collect, then the window/join execution) see
    the same partition assignment only under that contract. As a
    partial guard, the rank expression verifies each row's partition
    was counted and its local rank stays within the counted size, and
    RAISES on those drift shapes (rows landing in an uncounted
    partition, or a partition growing past its counted size — by
    pigeonhole, any row MOVEMENT under a fixed total trips one of
    them). A recompute that silently DROPS rows shrinks partitions
    without tripping the guard and yields gapped ranks — only the
    determinism contract covers that case, which is why it is a
    contract and not merely a hint."""
    spark = df.sparkSession
    n = int(
        num_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    part = persist_tracked(
        df.repartitionByRange(n, *cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    counts = {
        r["_pid"]: r["c"]
        for r in part.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc, counts[pid]))
        acc += counts[pid]
    offs = spark.createDataFrame(
        offsets or [(0, 0, 0)], "_pid int, _off bigint, _cnt bigint"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_pid").orderBy(*cols)
    # LEFT join + in-expression guard: if cached blocks were evicted
    # and a non-deterministic input recomputed into DIFFERENT partition
    # assignments than the collected counts, rows would land in an
    # uncounted pid (null _off after the left join) or overflow a
    # counted one (_local > _cnt) — both must fail loudly, never ship
    # a silently corrupted rank. Zero-cost: the check rides the
    # existing broadcast join.
    drifted = F.raise_error(
        F.lit(
            "with_global_rank: partition assignment drifted between the"
            " count and rank passes — input recomputed"
            " non-deterministically after cache eviction?"
        )
    )
    valid = F.col("_off").isNotNull() & (F.col("_local") <= F.col("_cnt"))
    out = (
        part.join(F.broadcast(offs), "_pid", "left")
        .withColumn("_local", F.row_number().over(w))
        .withColumn(
            rank_col,
            F.when(valid, F.col("_off") + F.col("_local"))
            .otherwise(drifted.cast("bigint"))
            .cast("bigint"),
        )
        .drop("_pid", "_off", "_cnt", "_local")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(acc).cast("bigint"))
    return out


def ntile_from_rank(i: F.Column, n: F.Column, tiles: int) -> F.Column:
    """ANSI ntile(tiles) from a global 1-based rank ``i`` and total
    count ``n``: the first (n % tiles) tiles hold ceil(n/tiles) rows,
    the rest floor(n/tiles) — the closed form both Spark's and
    DuckDB's window functions implement, so a rank-derived tile is
    value-identical to the built-in without the single-partition
    window. Integer-safe: the double divisions' operands stay far
    below 2^53 and true non-integer quotients sit >= 1/n from any
    integer, so floor() is exact."""
    q = F.floor(n / tiles).cast("long")
    r = (n % tiles).cast("long")
    big = r * (q + 1)
    return (
        F.when(q == F.lit(0), i)
        .when(i <= big, F.floor((i - 1) / (q + 1)) + 1)
        .otherwise(r + 1 + F.floor((i - big - 1) / q))
    ).cast("int")
