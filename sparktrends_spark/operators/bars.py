"""OHLCV bar aggregation (SURVEY §2.5 A2, deterministic variant).

The reference builds 1-minute bars with ``first(price)``/``last(price)``
inside a windowed groupBy (stock_stream.py:146-166) — non-deterministic
after a shuffle (SURVEY Q9). Our engine uses ``min_by``/``max_by`` keyed
on (timestamp, tiebreak) so open/close are the true earliest/latest
trade prices regardless of physical row order.

Scale notes: this is a single aggregation keyed on (symbol, window)
with partial (map-side) + final stages, so the shuffle carries one row
per (symbol, minute) per mapper, not one per trade. No skew concern
unless one symbol dominates — at which point AQE skew handling applies
to downstream joins, and bars remain bounded by minutes × symbols.

Hash-vs-sort aggregate: ``min_by(price, struct(ts, tiebreak))`` has a
struct-typed aggregation buffer, which HashAggregateExec cannot hold in
its fixed-size UnsafeRow — Catalyst silently degrades the whole agg to
SortAggregate, inserting a full sort of every trade on BOTH sides of
the shuffle (measured ~16% slower at sf0.1; at 100 TB those sorts
spill). ``ohlcv_bars`` therefore packs (within-window µs offset,
tiebreak) into one bigint ordering scalar whenever the window duration
leaves ≥30 bits for the tiebreak — every buffer field is then a
primitive and the plan is partial+final HashAggregate with no sorts.
The struct path remains as the fallback for exotic durations.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_UNIT_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 604_800_000_000,
}


def _duration_us(window_duration: str) -> int | None:
    m = re.fullmatch(
        r"\s*(\d+)\s+(microsecond|millisecond|second|minute|hour|day|week)s?\s*",
        window_duration,
    )
    if not m:
        return None
    return int(m.group(1)) * _UNIT_US[m.group(2)]


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


def daily_bars(
    trades: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "timestamp",
    price_col: str = "price",
    volume_col: str = "volume",
    tiebreak_col: str | None = None,
    bucket_col: str | None = None,
) -> DataFrame:
    """Daily OHLCV bars via hierarchical aggregation: packed-bigint
    minute bars first, then ``rollup_bars`` to 1 day.
    ``bucket_col`` (a materialized minute-truncated timestamp) is
    forwarded to the minute-bar stage — see ``ohlcv_bars``.

    A direct 1-day ``ohlcv_bars`` falls off the packed fast path — a
    day is 2^36.3 µs, leaving only 26 tiebreak bits (< the 30-bit
    safety floor), so Spark plans max_by over a struct ordering as a
    SortAggregate: two full sorts of every trade on both shuffle
    sides. Composing instead keeps every stage a partial+final
    HashAggregate: minute bars pack (60e6 µs -> 37 tiebreak bits) and
    the day rollup orders by the minute timestamp alone (atomic, no
    struct). OHLCV composes associatively over ordered buckets, so the
    result is identical to the direct computation — and the rollup
    input is bounded at 1440 rows per symbol-day regardless of tick
    volume, which is the 100 TB shape."""
    minute = ohlcv_bars(
        trades,
        window_duration="1 minute",
        symbol_col=symbol_col,
        ts_col=ts_col,
        price_col=price_col,
        volume_col=volume_col,
        tiebreak_col=tiebreak_col,
        bucket_col=bucket_col,
    )
    return rollup_bars(minute, window_duration="1 day")


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
    bucket_col: str | None = None,
) -> DataFrame:
    """Aggregate trades into per-(symbol, window) OHLCV bars.

    ``tiebreak_col`` disambiguates trades sharing a timestamp (e.g. a
    monotonic trade id); without it, equal-timestamp open/close picks
    are unspecified (as in any engine).

    ``bucket_col``: a caller-materialized column holding the aligned
    window START (== ``date_trunc`` of ``ts_col`` at the window
    granularity — the caller guarantees equivalence). Grouping then
    keys on the bare attribute, so an upstream exchange hash-keyed on
    ``(symbol_col, bucket_col)`` satisfies the aggregation's clustering
    requirement and the agg runs in the same stage — one shuffle for
    fan-out + aggregation instead of two (guide §2.4). Values are
    identical either way: ``F.window(ts).start`` IS the truncated
    timestamp for exact-unit tumbling windows.

    Ordering is packed into one bigint (see module docstring) when the
    tumbling window duration parses and leaves >=30 tiebreak bits:
    ``pmod(unix_micros(ts), dur)`` is the offset inside the aligned
    window (identical alignment to ``F.window``'s default), shifted
    left so (offset, biased tiebreak) orders lexicographically. The
    tiebreak's low bits are biased by half the modulus so NEGATIVE ids
    order below non-negative ones, exactly like the struct fallback —
    exact whenever |tiebreak| < 2^(bits-1) (2^36 for 1-minute bars;
    any realistic id space), and only same-microsecond trades consult
    the tiebreak at all.
    """
    order: Column
    dur_us = _duration_us(window_duration) if tiebreak_col else None
    tb_bits = 63 - dur_us.bit_length() if dur_us else 0
    if tiebreak_col and dur_us and tb_bits >= 30:
        offset = F.pmod(
            F.unix_micros(F.col(ts_col).cast("timestamp")), F.lit(dur_us)
        )
        # pmod(pmod(tb, 2^b) + 2^(b-1), 2^b) == pmod(tb + 2^(b-1), 2^b)
        # without the (ANSI-mode) overflow risk of adding to a raw long:
        # maps [-2^(b-1), 2^(b-1)) monotonically onto [0, 2^b), so the
        # packed path agrees with the (ts, tiebreak) struct ordering for
        # negative tiebreaks too.
        half, full = 1 << (tb_bits - 1), 1 << tb_bits
        biased_tb = F.pmod(
            F.pmod(F.col(tiebreak_col).cast("long"), F.lit(full)) + F.lit(half),
            F.lit(full),
        )
        order = F.shiftleft(offset, tb_bits) + biased_tb
    elif tiebreak_col:
        order = F.struct(F.col(ts_col), F.col(tiebreak_col))
    else:
        order = F.col(ts_col)
    aggs = [
        F.min_by(F.col(price_col), order).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(F.col(price_col), order).alias("close"),
        F.sum(volume_col).alias("volume"),
        F.count(F.lit(1)).alias("n_trades"),
    ]
    if bucket_col is not None:
        return trades.groupBy(
            F.col(symbol_col).alias("symbol"),
            F.col(bucket_col).alias("timestamp"),
        ).agg(*aggs)
    bucket = F.window(F.col(ts_col), window_duration)
    return (
        trades.groupBy(F.col(symbol_col).alias("symbol"), bucket.alias("w"))
        .agg(*aggs)
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
