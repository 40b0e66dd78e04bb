"""OHLCV bar aggregation (SURVEY §2.5 A2, deterministic variant).

The reference builds 1-minute bars with ``first(price)``/``last(price)``
inside a windowed groupBy (stock_stream.py:146-166) — non-deterministic
after a shuffle (SURVEY Q9). Our engine uses ``min_by``/``max_by`` keyed
on (timestamp, tiebreak) so open/close are the true earliest/latest
trade prices regardless of physical row order.

Scale notes: this is a single hash aggregation keyed on
(symbol, window); Catalyst plans partial (map-side) + final aggregation
so the shuffle carries one row per (symbol, minute) per mapper, not one
per trade. No skew concern unless one symbol dominates — at which point
AQE skew handling applies to downstream joins, and bars remain bounded
by minutes × symbols.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rollup_bars(
    bars: DataFrame,
    window_duration: str = "1 hour",
    symbol_col: str = "symbol",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Re-aggregate fine OHLCV bars into coarser bars (hypertable
    continuous-aggregate rollup: 1 min -> 1 h -> 1 d).

    OHLCV composes associatively over ordered buckets — open of the
    earliest sub-bar, close of the latest, max/min/sum for the rest —
    so each coarser resolution reads only the next-finer aggregate
    (orders of magnitude smaller than ticks), never the raw trades.
    Same partial+final hash-agg shape as ``ohlcv_bars``; input rows per
    group are bounded (60 minutes/hour, 24 hours/day) so no skew.
    """
    bucket = F.window(F.col(ts_col), window_duration)
    return (
        bars.groupBy(F.col(symbol_col).alias("symbol"), bucket.alias("w"))
        .agg(
            F.min_by("open", F.col(ts_col)).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", F.col(ts_col)).alias("close"),
            F.sum("volume").alias("volume"),
            F.sum("n_trades").alias("n_trades"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("timestamp"),
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n_trades",
        )
    )


def gapfill_bars(
    bars: DataFrame,
    start: str,
    end: str,
    step: str = "1 minute",
    symbol_col: str = "symbol",
    ts_col: str = "timestamp",
    fill_col: str = "close",
) -> DataFrame:
    """Dense per-symbol time grid with forward-filled values
    (TimescaleDB ``time_bucket_gapfill`` + ``locf`` analogue).

    Grid = distinct symbols x ``sequence(start, end, step)`` — the
    explode happens on the tiny symbol dimension, so grid size is
    symbols x slots regardless of input row count. A left join marks
    gaps; ``last(value, ignorenulls=True)`` over an unbounded-preceding
    row frame carries the previous observation forward.

    Scale: the join and the window share the (symbol) partitioning, so
    the fill adds one shuffle of the grid only; slots-per-symbol is
    bounded by the requested range, never by data volume.
    """
    from pyspark.sql import Window

    scope = bars.filter(
        (F.col(ts_col) >= F.lit(start).cast("timestamp_ntz"))
        & (F.col(ts_col) <= F.lit(end).cast("timestamp_ntz"))
    ).select(
        F.col(symbol_col).alias("symbol"),
        F.col(ts_col).alias("timestamp"),
        F.col(fill_col).alias("_v"),
    )
    grid = (
        scope.select("symbol")
        .distinct()
        .select(
            "symbol",
            F.explode(
                F.sequence(
                    F.lit(start).cast("timestamp_ntz"),
                    F.lit(end).cast("timestamp_ntz"),
                    F.expr(f"interval {step}"),
                )
            ).alias("timestamp"),
        )
    )
    w = (
        Window.partitionBy("symbol")
        .orderBy("timestamp")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(scope, ["symbol", "timestamp"], "left")
        .select(
            "symbol",
            "timestamp",
            F.last("_v", ignorenulls=True).over(w).alias(f"{fill_col}_ff"),
            F.col("_v").isNull().alias("is_gap"),
        )
    )


def ohlcv_bars(
    trades: DataFrame,
    window_duration: str = "1 minute",
    symbol_col: str = "symbol",
    ts_col: str = "timestamp",
    price_col: str = "price",
    volume_col: str = "volume",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Aggregate trades into per-(symbol, window) OHLCV bars.

    ``tiebreak_col`` disambiguates trades sharing a timestamp (e.g. a
    monotonic trade id); without it, equal-timestamp open/close picks
    are unspecified (as in any engine).
    """
    order: Column = (
        F.struct(F.col(ts_col), F.col(tiebreak_col))
        if tiebreak_col
        else F.col(ts_col)
    )
    bucket = F.window(F.col(ts_col), window_duration)
    return (
        trades.groupBy(F.col(symbol_col).alias("symbol"), bucket.alias("w"))
        .agg(
            F.min_by(F.col(price_col), order).alias("open"),
            F.max(price_col).alias("high"),
            F.min(price_col).alias("low"),
            F.max_by(F.col(price_col), order).alias("close"),
            F.sum(volume_col).alias("volume"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("timestamp"),
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n_trades",
        )
    )
