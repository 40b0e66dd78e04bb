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


def cms_check_params(sketch: DataFrame, depth: int, width: int) -> None:
    """Assert a sketch frame is consistent with (depth, width): every
    populated row id must be < depth, every column < width, and ALL
    ``depth`` hash rows must be populated (a sketch built shallower
    leaves its top rows absent — a probe would min() in a phantom 0).
    One bounded aggregation over the <= depth*width-cell frame; run it
    once before probing a persisted or caller-supplied sketch, so a
    parameter mismatch fails loudly instead of silently
    underestimating."""
    row = sketch.agg(
        F.max("row").alias("mr"),
        F.min("row").alias("nr"),
        F.countDistinct("row").alias("dr"),
        F.max("col").alias("mc"),
        F.min("col").alias("nc"),
    ).collect()[0]
    if row["mr"] is None:
        return  # empty sketch: nothing was ever inserted — est 0 is true
    if row["nr"] < 0 or row["mr"] >= depth or row["dr"] != depth:
        raise ValueError(
            f"cms_check_params: sketch rows span [{row['nr']}, {row['mr']}] "
            f"({row['dr']} distinct) — not a depth={depth} sketch"
        )
    if row["nc"] < 0 or row["mc"] >= width:
        raise ValueError(
            f"cms_check_params: sketch cols span [{row['nc']}, {row['mc']}] "
            f"— exceeds width={width}"
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
    probing N keys is a map-side join, no shuffle of the probe side.

    ``depth``/``width`` MUST match the build parameters: probing with
    a different shape silently takes the min over wrong or absent
    cells and UNDERESTIMATES — breaking the one-sided est >= true
    guarantee. The bounds that can be checked without touching the
    sketch fail loudly here (mirroring ``cms_build``); to assert a
    persisted/foreign sketch actually matches, run
    ``cms_check_params`` once before probing."""
    if not 1 <= depth <= 4:
        raise ValueError(
            "cms_estimate: depth must be in 1..4 (md5 slices) and equal "
            "the build depth"
        )
    if width < 1:
        raise ValueError("cms_estimate: width must be >= 1")
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
