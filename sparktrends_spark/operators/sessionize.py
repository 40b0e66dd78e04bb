"""Gap-based sessionization (batch analogue of session windows).

Streaming session windows (``F.session_window``) exist in
streaming/; this is the batch formulation: a new session starts when
the gap to the previous event (per key) exceeds ``gap_seconds``.
One shuffle by key + per-partition sort; the cumulative sum is a
running window — no second shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
    session_col: str = "session_idx",
) -> DataFrame:
    """Assign a per-key 1-based session index to every row."""
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    prev_epoch = F.lag(epoch).over(w)
    is_new = F.when(
        prev_epoch.isNull() | ((epoch - prev_epoch) > gap_seconds), 1
    ).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(is_new).over(running))


def session_summary(
    sessionized: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str | None = None,
    session_col: str = "session_idx",
) -> DataFrame:
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col:
        aggs.append(F.sum(value_col).alias("total_value"))
    return sessionized.groupBy(*key_cols, session_col).agg(*aggs)
