"""Indicator operator semantics + plan shape (EMA/Bollinger/RSI)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from sparktrends_spark.operators.indicators import (
    bollinger_bands,
    ema,
    ema_jvm,
    macd,
    macd_jvm,
    rsi,
)


def _series(spark, closes, symbol="A"):
    return spark.createDataFrame(
        [Row(symbol=symbol, day=float(i), close=float(c)) for i, c in enumerate(closes)]
    )


def test_ema_recurrence_exact(spark):
    df = _series(spark, [10.0, 20.0, 30.0])
    out = {
        r.day: r.ema
        for r in ema(df, "close", "day", ["symbol"], alpha=0.3).collect()
    }
    assert out[0.0] == 10.0
    assert out[1.0] == 10.0 * 0.7 + 20.0 * 0.3
    assert out[2.0] == (10.0 * 0.7 + 20.0 * 0.3) * 0.7 + 30.0 * 0.3


def test_ema_alpha_one_is_identity(spark):
    closes = [5.0, 9.0, 2.0, 7.5]
    df = _series(spark, closes)
    rows = ema(df, "close", "day", ["symbol"], alpha=1.0).collect()
    assert all(r.ema == r.close for r in rows)


def test_ema_constant_series_stays_constant(spark):
    df = _series(spark, [42.0] * 10)
    rows = ema(df, "close", "day", ["symbol"], alpha=0.3).collect()
    assert all(r.ema == 42.0 for r in rows)


def test_ema_keys_are_independent(spark):
    a = _series(spark, [1.0, 2.0], symbol="A")
    b = _series(spark, [100.0, 200.0], symbol="B")
    rows = ema(a.union(b), "close", "day", ["symbol"], alpha=0.5).collect()
    got = {(r.symbol, r.day): r.ema for r in rows}
    assert got[("A", 1.0)] == 1.5
    assert got[("B", 1.0)] == 150.0


def test_ema_jvm_bit_identical_to_pandas_path(spark, sf_dir):
    """The aggregate()-HOF fold must replay the exact IEEE754 op
    sequence of the applyInPandas fold: bit-equality, not tolerance."""
    from sparktrends_spark.plans.indicators import _daily

    daily = _daily(spark, sf_dir)
    a = {
        (r.symbol, r.day): r.ema
        for r in ema(daily, "close", "day", ["symbol"], alpha=0.3).collect()
    }
    b = {
        (r.symbol, r.day): r.ema
        for r in ema_jvm(daily, "close", "day", ["symbol"], alpha=0.3).collect()
    }
    assert a.keys() == b.keys() and len(a) > 0
    assert all(a[k] == b[k] for k in a)  # == on floats: bitwise intent


def test_macd_jvm_bit_identical_to_pandas_path(spark, sf_dir):
    from sparktrends_spark.plans.indicators import _daily

    daily = _daily(spark, sf_dir)
    cols = ("macd", "signal", "histogram")
    a = {
        (r.symbol, r.day): tuple(getattr(r, c) for c in cols)
        for r in macd(daily, "close", "day", ["symbol"]).collect()
    }
    b = {
        (r.symbol, r.day): tuple(getattr(r, c) for c in cols)
        for r in macd_jvm(daily, "close", "day", ["symbol"]).collect()
    }
    assert a.keys() == b.keys() and len(a) > 0
    assert all(a[k] == b[k] for k in a)


def test_jvm_indicator_plans_have_no_python(spark, sf_dir):
    """The point of the JVM twins: zero Python workers in the physical
    plan (no ArrowEvalPython / FlatMapGroupsInPandas / BatchEvalPython
    nodes), one shuffle for the groupBy."""
    from sparktrends_spark.plans.indicators import _daily

    daily = _daily(spark, sf_dir)
    for fn in (
        lambda d: ema_jvm(d, "close", "day", ["symbol"]),
        lambda d: macd_jvm(d, "close", "day", ["symbol"]),
    ):
        plan = fn(daily)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Pandas" not in plan, plan


def test_bollinger_constant_series_zero_band(spark):
    df = _series(spark, [10.0] * 25)
    rows = bollinger_bands(df, "close", "day", ["symbol"], n=20).collect()
    late = [r for r in rows if r.day >= 1]
    assert all(r.sd20 == 0.0 for r in late)
    assert all(r.upper_band == 10.0 and r.lower_band == 10.0 for r in late)
    # sd == 0 -> %B undefined
    assert all(r.pct_b is None for r in rows)


def test_rsi_monotone_up_is_100(spark):
    df = _series(spark, [float(i) for i in range(20)])
    rows = rsi(df, "close", "day", ["symbol"], n=14).collect()
    by_day = {r.day: r.rsi_14 for r in rows}
    # needs 14 deltas -> first non-null at day 14
    assert by_day[13.0] is None
    assert by_day[14.0] == 100.0
    assert by_day[19.0] == 100.0


def test_rsi_alternating_is_50(spark):
    # equal gains and losses -> RSI = 50
    closes = [10.0, 12.0] * 10
    df = _series(spark, closes)
    rows = rsi(df, "close", "day", ["symbol"], n=14).collect()
    vals = [r.rsi_14 for r in rows if r.rsi_14 is not None]
    assert vals and all(math.isclose(v, 50.0) for v in vals)


def test_bollinger_plan_single_shuffle(spark, sf_dir):
    from sparktrends_spark.plans import QUERIES

    plan = (
        QUERIES["bollinger_daily"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # hierarchical daily bars: one shuffle for the minute aggregation,
    # one for the day rollup, one for the symbol window — no extra
    # exchanges from the band/%B projections, and no SortAggregate
    # (the win the composition buys; see operators/bars.daily_bars)
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "SortAggregate" not in plan


def test_ema_chunked_matches_sequential_small(spark):
    """Chunked decomposition == sequential fold (tolerance: the
    reassociation is exact in real arithmetic)."""
    from sparktrends_spark.caching import release_persisted
    from sparktrends_spark.operators.indicators import ema_chunked

    closes = [10.0, 20.0, 5.0, 7.0, 30.0, 1.0, 2.0, 50.0, 8.0]
    df = _series(spark, closes)
    want = {
        r.day: r.ema
        for r in ema(df, "close", "day", ["symbol"], alpha=0.3).collect()
    }
    got = {
        r.day: r.ema
        for r in ema_chunked(
            df, "close", "day", ["symbol"], alpha=0.3, chunk_rows=3
        ).collect()
    }
    release_persisted()
    assert want.keys() == got.keys()
    for k in want:
        assert math.isclose(want[k], got[k], rel_tol=1e-11, abs_tol=1e-11), k


def test_ema_chunked_bounded_memory_on_million_row_key(spark):
    """The scale contract: one key, 1M rows, chunk_rows=50k -> per-task
    series arrays hold at most 50k rows; results still match the
    unchunked sequential fold within FP-reassociation tolerance."""
    from sparktrends_spark.caching import release_persisted
    from sparktrends_spark.operators.indicators import ema_chunked

    n = 1_000_000
    df = (
        spark.range(n)
        .selectExpr(
            "'A' AS symbol",
            "CAST(id AS DOUBLE) AS day",
            # deterministic pseudo-random walk, pure JVM
            "100.0 + 10.0 * sin(id * 0.001) + pmod(id * 2654435761, 97) / 97.0 AS close",
        )
    )
    seq = ema(df, "close", "day", ["symbol"], alpha=0.1)
    chk = ema_chunked(
        df, "close", "day", ["symbol"], alpha=0.1, chunk_rows=50_000
    )
    # spot-check a deterministic sample of positions incl. chunk edges
    probe = [0, 1, 49_999, 50_000, 50_001, 123_456, 999_999]
    want = {
        r.day: r.ema
        for r in seq.filter(F.col("day").isin([float(p) for p in probe])).collect()
    }
    got = {
        r.day: r.ema
        for r in chk.filter(F.col("day").isin([float(p) for p in probe])).collect()
    }
    release_persisted()
    assert want.keys() == got.keys() and len(want) == len(probe)
    for k in want:
        assert math.isclose(want[k], got[k], rel_tol=1e-9, abs_tol=1e-9), (
            k, want[k], got[k],
        )


def test_ema_jvm_max_rows_guard_fires(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = _series(spark, [1.0] * 10)
    with pytest.raises(Exception, match="max_rows_per_key"):
        ema_jvm(
            df, "close", "day", ["symbol"], max_rows_per_key=5
        ).collect()
    # under the bound: clean
    assert (
        len(ema_jvm(df, "close", "day", ["symbol"], max_rows_per_key=10).collect())
        == 10
    )


def test_macd_chunked_matches_sequential(spark):
    from sparktrends_spark.caching import release_persisted
    from sparktrends_spark.operators.indicators import macd_chunked

    closes = [float(10 + ((i * 7) % 13) - 3) for i in range(40)]
    df = _series(spark, closes)
    want = {
        r.day: (r.macd, r.signal, r.histogram)
        for r in macd(df, "close", "day", ["symbol"]).collect()
    }
    got = {
        r.day: (r.macd, r.signal, r.histogram)
        for r in macd_chunked(
            df, "close", "day", ["symbol"], chunk_rows=7
        ).collect()
    }
    release_persisted()
    assert want.keys() == got.keys()
    for k in want:
        for a, b in zip(want[k], got[k]):
            assert math.isclose(a, b, rel_tol=1e-10, abs_tol=1e-10), (k, a, b)


def test_cusum_detects_step_change(spark):
    from pyspark.sql import functions as F

    from sparktrends_spark.operators.indicators import cusum

    # flat at 100 for 10 days, steps to 110: positive CUSUM must climb
    # after the shift and alarm; the pre-shift side stays near zero
    rows = [("A", d, 100.0) for d in range(1, 11)] + [
        ("A", d, 110.0) for d in range(11, 21)
    ]
    df = spark.createDataFrame(rows, "symbol string, day int, close double")
    out = {
        r.day: r
        for r in cusum(
            df, "close", "day", ["symbol"], slack=1.0, threshold=20.0
        ).collect()
    }
    # mu = 105; pre-shift drift is negative-side, post-shift positive
    assert out[1].cusum_pos == 0.0
    assert not out[5].is_alarm
    assert out[20].cusum_pos > 20.0
    assert out[20].is_alarm
    # negative side alarms on the early (below-mean) regime
    assert out[10].cusum_neg > 20.0


def test_cusum_closed_form_matches_textbook_recursion(spark):
    """The window restatement (running sum minus clamped running min)
    must equal the textbook recursion s+ = max(0, s+ + x - mu - k) on
    a randomized series (seeded), to float tolerance."""
    import random

    from sparktrends_spark.operators.indicators import cusum

    rng = random.Random(42)
    xs = [round(rng.uniform(50, 150), 2) for _ in range(200)]
    rows = [("A", d, x) for d, x in enumerate(xs, start=1)]
    df = spark.createDataFrame(rows, "symbol string, day int, close double")
    out = {
        r.day: (r.cusum_pos, r.cusum_neg)
        for r in cusum(df, "close", "day", ["symbol"], slack=1.0).collect()
    }
    mu = sum(xs) / len(xs)  # 2-decimal inputs -> exact decimal mean path
    sp = sn = 0.0
    for d, x in enumerate(xs, start=1):
        sp = max(0.0, sp + (x - mu - 1.0))
        sn = max(0.0, sn + (mu - x - 1.0))
        assert abs(out[d][0] - sp) < 1e-6, d
        assert abs(out[d][1] - sn) < 1e-6, d
