"""Count-Min sketch: fixed-size mergeable frequency summaries.

Third member of the bounded-memory frequency family next to
Misra-Gries heavy hitters (`operators/freq.py`) and the histogram
quantile sketch (`plans/relational.py` rollups): CMS answers point
frequency queries for ANY key — not just the heavy ones MG retains —
from ``depth x width`` integer counters, with the classic one-sided
guarantee est >= true and est <= true + eps*N w.h.p. (Cormode &
Muthukrishnan, "An improved data stream summary: the count-min sketch
and its applications", J. Algorithms 2005 — public paper).

Scale shape (the reason to ship it at 100 TB): the sketch is a
``groupBy(row, col).sum()`` over at most depth*width distinct cells,
so the map-side partial aggregation bounds shuffle volume at
depth*width rows PER TASK regardless of key cardinality — counting
10^9 distinct user ids costs the same shuffle as counting 10^3.
Sketches merge by cell-wise addition (the same mergeable-summaries
algebra as the histogram sketch), which is exactly an idempotent
keyed upsert on (row, col) — see the streaming twin in
`plans/streaming_queries.py`.

Hash discipline (the exact-oracle gate): each of the ``depth`` rows
uses an INDEPENDENT 32-bit slice of md5(key) reduced mod ``width`` —
no multiply-shift constants, so no 64-bit overflow under ANSI mode,
and the DuckDB oracle restates the identical
``CAST(concat('0x', substr(md5(k), i*8+1, 8)) AS BIGINT) % width``
arithmetic. All-integer math end to end: bit-exact across engines.

Reference scope note: SparkTrends has no sketch surface; engine
extension (SURVEY §2 absent inventory, scale operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: depth*width defaults sized so eps = e/width ~ 0.0027 of stream
#: weight and error probability e^-depth ~ 1.8%.
CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cell_col(key: F.Column, row: int, width: int) -> F.Column:
    """Counter column for hash row ``row``: an independent 32-bit md5
    slice mod width. Non-negative, so ``%`` == pmod."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), row * 8 + 1, 8), 16, 10)
        .cast("long")
        % width
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch: one row per touched counter cell,
    ``(row, col, cnt)``. At most depth*width rows total; merging two
    sketches is ``union.groupBy(row, col).sum(cnt)``.

    Plan: project each input row to its ``depth`` cells via one
    ``explode(array(struct...))`` pass (no union-subplan re-execution
    — the r7 neardup lesson), then hash-aggregate. Partial map-side
    combine caps per-task shuffle output at depth*width cells."""
    if not 1 <= depth <= 4:
        raise ValueError("cms_build: depth must be in 1..4 (md5 slices)")
    key = F.col(key_col)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cell_col(key, i, width).alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c")
    )
    return (
        cells.select("c.row", "c.col")
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    est_col: str = "est_count",
) -> DataFrame:
    """Point-frequency estimates for every row of ``probes``:
    ``(key_col, est_col)`` with est = min over the key's depth cells
    (absent cell -> 0; only possible for keys never inserted).

    The sketch side is at most depth*width rows — broadcast it, so
    probing N keys is a map-side join, no shuffle of the probe side."""
    key = F.col(key_col)
    probed = probes.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cell_col(key, i, width).alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.row", "c.col")
    return (
        probed.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(est_col))
    )
