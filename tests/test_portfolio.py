"""Portfolio analytics operators (operators/portfolio.py): value
semantics on hand-built frames + the plan shapes the 100 TB design
depends on (single upstream scan via persist, broadcast factor join,
one-exchange drawdown)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sparktrends_spark.caching import release_persisted
from sparktrends_spark.operators.portfolio import (
    daily_returns,
    market_beta,
    max_drawdown,
    pairwise_correlation,
)


def _series(spark, rows):
    return spark.createDataFrame(rows, "symbol string, day int, close double")


def test_daily_returns_first_period_null(spark):
    df = _series(spark, [("A", 1, 10.0), ("A", 2, 11.0), ("A", 3, 9.9)])
    got = {r.day: r.ret for r in daily_returns(df).collect()}
    assert got[1] is None
    assert math.isclose(got[2], 0.1)
    assert math.isclose(got[3], 9.9 / 11.0 - 1.0)


def test_max_drawdown_trough_and_peak(spark):
    df = _series(
        spark,
        [("A", 1, 10.0), ("A", 2, 8.0), ("A", 3, 12.0), ("A", 4, 6.0)],
    )
    row = max_drawdown(df).collect()[0]
    # worst decline: 12 -> 6 = -50%, at day 4, from the day-3 peak
    assert row.trough_day == 4
    assert row.trough_close == 6.0
    assert row.peak_close == 12.0
    assert math.isclose(row.max_drawdown, -0.5)


def test_max_drawdown_tie_takes_earliest_trough(spark):
    df = _series(
        spark,
        [("A", 1, 10.0), ("A", 2, 5.0), ("A", 3, 10.0), ("A", 4, 5.0)],
    )
    row = max_drawdown(df).collect()[0]
    assert row.trough_day == 2
    assert math.isclose(row.max_drawdown, -0.5)


def test_pairwise_correlation_sign_and_count(spark):
    # B tracks A exactly (corr +1), C moves opposite (corr -1)
    rows = []
    closes = [10.0, 11.0, 10.5, 12.0, 11.0]
    for d, c in enumerate(closes, start=1):
        rows += [("A", d, c), ("B", d, 2 * c), ("C", d, 100.0 / c)]
    out = {
        (r.sym_a, r.sym_b): r
        for r in pairwise_correlation(daily_returns(_series(spark, rows))).collect()
    }
    release_persisted()
    assert out[("A", "B")].ret_corr == 1.0
    assert out[("A", "B")].n_days == len(closes) - 1
    assert out[("A", "C")].ret_corr < -0.99


def test_market_beta_of_market_tracker_is_one(spark):
    # two symbols with identical returns: each IS the market
    rows = []
    closes = [10.0, 11.0, 10.5, 12.0, 11.0, 13.0]
    for d, c in enumerate(closes, start=1):
        rows += [("A", d, c), ("B", d, 3 * c)]
    out = {r.symbol: r for r in market_beta(daily_returns(_series(spark, rows))).collect()}
    release_persisted()
    for sym in ("A", "B"):
        assert out[sym].beta == 1.0
        assert out[sym].alpha == 0.0
        assert out[sym].r2 == 1.0
        assert out[sym].n_days == len(closes) - 1


def _plan(spark, name, sf_dir):
    from sparktrends_spark.plans import QUERIES

    df = QUERIES[name](spark, sf_dir)
    s = df._jdf.queryExecution().executedPlan().toString()
    release_persisted()
    return s


def test_beta_factor_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, "symbol_market_beta", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_portfolio_joins_read_persisted_returns_once(spark, sf_dir):
    # both sides of the self-join / factor join must come from the
    # persisted returns frame, never re-run the trades scan per branch
    for name in ("symbol_return_correlation", "symbol_market_beta"):
        plan = _plan(spark, name, sf_dir)
        assert plan.count("InMemoryTableScan") >= 2, name


def test_max_drawdown_single_symbol_exchange_no_join(spark, sf_dir):
    plan = _plan(spark, "symbol_max_drawdown", sf_dir)
    assert "Join" not in plan
    # windows + final aggregate all ride the one hashpartitioning(symbol)
    # exchange; the remaining exchanges belong to the daily-bar rollup
    assert plan.count("hashpartitioning(symbol") <= 3
