"""Streaming windowed aggregations (SURVEY §2.10 T1 + declared gaps).

The reference computes 1-minute tumbling OHLCV bars with no watermark
and no dedup (stock_stream.py:146-166, TODO at :118-119). Here:

- ``streaming_minute_bars``: tumbling bars with a watermark and
  optional duplicate-frame dedup, deterministic open/close via
  ``min_by``/``max_by`` (SURVEY Q9).
- ``sliding_window_counts``: overlapping windows (length > slide).
- ``session_window_agg``: gap-based session windows.

All take an already-streaming trades/events DataFrame, so the same
functions compose with any source (Kafka, file, rate, memory).

Scale notes: streaming state is keyed by (symbol, window); the state
store holds only open windows — the watermark bounds state size, which
is exactly why it cannot be optional at 100 TB/day ingest. Partial
aggregation still applies map-side before the state-store shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparktrends_spark.operators.bars import ohlcv_bars


def streaming_minute_bars(
    trades: DataFrame,
    watermark: str = "2 minutes",
    window_duration: str = "1 minute",
    dedup_cols: Sequence[str] | None = None,
    ts_col: str = "timestamp",
) -> DataFrame:
    """Watermarked tumbling OHLCV bars over a trade stream.

    ``dedup_cols``: natural key identifying a duplicate delivery (e.g.
    a trade id, or all columns for exact re-delivered frames). Uses
    ``dropDuplicatesWithinWatermark`` so dedup state is also bounded.
    """
    t = trades.withWatermark(ts_col, watermark)
    if dedup_cols is not None:
        t = t.dropDuplicatesWithinWatermark(list(dedup_cols))
    return ohlcv_bars(t, window_duration=window_duration, ts_col=ts_col)


def sliding_window_counts(
    events: DataFrame,
    key_col: str,
    watermark: str = "2 minutes",
    window_duration: str = "5 minutes",
    slide: str = "1 minute",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Overlapping-window event counts (each row lands in len/slide windows)."""
    w = F.window(F.col(ts_col), window_duration, slide)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def session_window_agg(
    events: DataFrame,
    key_col: str,
    gap: str = "30 seconds",
    watermark: str = "2 minutes",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Gap-based session windows (``F.session_window``): a session ends
    when no event arrives for ``gap``. The streaming counterpart of
    operators/sessionize.py's batch formulation.
    """
    sw = F.session_window(F.col(ts_col), gap)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), sw.alias("s"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )
