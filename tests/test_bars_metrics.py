"""Unit + property tests for the OHLCV/metrics core (SURVEY §5.1, §5.4)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sparktrends_spark.operators.bars import ohlcv_bars
from sparktrends_spark.operators.metrics import anomalies, vwap_metrics
from sparktrends_spark.operators.parse import parse_trade_envelope


def _trades_fixture(spark):
    base = dt.datetime(2024, 1, 1, 9, 30, 0)
    rows = [
        # symbol, price, volume, timestamp, trade_id
        ("AAA", 10.0, 5.0, base + dt.timedelta(seconds=1), 1),
        ("AAA", 12.0, 1.0, base + dt.timedelta(seconds=30), 2),
        ("AAA", 11.0, 2.0, base + dt.timedelta(seconds=59), 3),
        ("AAA", 20.0, 1.0, base + dt.timedelta(minutes=1, seconds=5), 4),
        ("BBB", 100.0, 10.0, base + dt.timedelta(seconds=10), 5),
        # same-timestamp tie: tiebreak id decides open/close
        ("CCC", 1.0, 1.0, base, 6),
        ("CCC", 2.0, 1.0, base, 7),
    ]
    return spark.createDataFrame(
        rows, "symbol string, price double, volume double, ts timestamp, trade_id long"
    )


def test_ohlcv_bars_deterministic(spark):
    bars = ohlcv_bars(
        _trades_fixture(spark), ts_col="ts", tiebreak_col="trade_id"
    ).orderBy("symbol", "timestamp")
    rows = {(r.symbol, r.timestamp.minute): r for r in bars.collect()}
    a0 = rows[("AAA", 30)]
    assert (a0.open, a0.high, a0.low, a0.close) == (10.0, 12.0, 10.0, 11.0)
    assert a0.volume == 8.0 and a0.n_trades == 3
    a1 = rows[("AAA", 31)]
    assert (a1.open, a1.close) == (20.0, 20.0)
    c = rows[("CCC", 30)]
    assert (c.open, c.close) == (1.0, 2.0)  # tiebreak on trade_id


def test_ohlcv_bars_negative_tiebreaks_match_struct_fallback(spark):
    """The packed-bigint fast path must order NEGATIVE tiebreak ids the
    same way as the (ts, tiebreak) struct fallback: -3 < -1 < 0 < 2.
    (ADVICE r5: raw pmod mapped negatives above non-negatives.)"""
    base = dt.datetime(2024, 1, 1, 9, 30, 0)
    rows = [
        ("NEG", 5.0, 1.0, base, -1),
        ("NEG", 7.0, 1.0, base, -3),  # earliest: most-negative id
        ("NEG", 6.0, 1.0, base, 2),   # latest: largest id
        ("NEG", 4.0, 1.0, base, 0),
        ("MIX", 1.0, 1.0, base + dt.timedelta(seconds=5), -10),
        ("MIX", 3.0, 1.0, base + dt.timedelta(seconds=5), 10),
        ("MIX", 2.0, 1.0, base + dt.timedelta(seconds=1), 4),  # earlier ts wins
    ]
    df = spark.createDataFrame(
        rows, "symbol string, price double, volume double, ts timestamp, trade_id long"
    )
    # packed path: 1-minute tumbling window parses -> bigint ordering
    packed = {
        r.symbol: r
        for r in ohlcv_bars(df, ts_col="ts", tiebreak_col="trade_id").collect()
    }
    # struct path: unparseable duration string of the same length falls
    # back — instead, force it by using a duration leaving <30 tb bits
    fallback = {
        r.symbol: r
        for r in ohlcv_bars(
            df, window_duration="7 days", ts_col="ts", tiebreak_col="trade_id"
        ).collect()
    }
    assert (packed["NEG"].open, packed["NEG"].close) == (7.0, 6.0)
    assert (packed["MIX"].open, packed["MIX"].close) == (2.0, 3.0)
    assert (fallback["NEG"].open, fallback["NEG"].close) == (7.0, 6.0)
    assert (fallback["MIX"].open, fallback["MIX"].close) == (2.0, 3.0)


def test_ohlcv_invariants(spark):
    bars = ohlcv_bars(_trades_fixture(spark), ts_col="ts", tiebreak_col="trade_id")
    bad = bars.filter(
        (F.col("low") > F.least("open", "close"))
        | (F.col("high") < F.greatest("open", "close"))
    )
    assert bad.count() == 0


def test_rollup_bars_associative(spark):
    """1min -> daily must equal 1min -> hourly -> daily (the property
    that makes the hypertable rollup safe to compute incrementally)."""
    from sparktrends_spark.operators.bars import rollup_bars

    minute = ohlcv_bars(
        _trades_fixture(spark), ts_col="ts", tiebreak_col="trade_id"
    )
    direct = rollup_bars(minute, "1 day")
    via_hourly = rollup_bars(rollup_bars(minute, "1 hour"), "1 day")
    key = ["symbol", "timestamp"]
    a = {tuple(r[k] for k in key): r.asDict() for r in direct.collect()}
    b = {tuple(r[k] for k in key): r.asDict() for r in via_hourly.collect()}
    assert a == b
    aaa = a[("AAA", dt.datetime(2024, 1, 1))]
    assert (aaa["open"], aaa["close"], aaa["high"], aaa["low"]) == (
        10.0, 20.0, 20.0, 10.0,
    )
    assert aaa["volume"] == 9.0 and aaa["n_trades"] == 4


def test_vwap_metrics_null_history_semantics(spark):
    # vol_5 is null with <2 bars of history => is_anomaly null => dropped
    # by anomalies() — reference §2.12 quirk preserved.
    bars = spark.createDataFrame(
        [("AAA", 10.0, 1.0, dt.datetime(2024, 1, 1, 9, 30))],
        "symbol string, close double, volume double, timestamp timestamp",
    )
    m = vwap_metrics(bars).collect()[0]
    assert m.vwap_5 == 10.0 and m.vol_5 is None and m.is_anomaly is None
    assert anomalies(vwap_metrics(bars)).count() == 0


def test_vwap_rolling_frame(spark):
    base = dt.datetime(2024, 1, 1)
    bars = spark.createDataFrame(
        [
            ("AAA", float(p), 1.0, base + dt.timedelta(minutes=i))
            for i, p in enumerate([10, 20, 30, 40, 50, 60, 70])
        ],
        "symbol string, close double, volume double, timestamp timestamp",
    )
    out = vwap_metrics(bars).orderBy("timestamp").collect()
    # row 6 (close=70): frame = [30,40,50,60,70], equal volume => mean 50
    assert out[6].vwap_5 == 50.0
    # row 2 (close=30): frame = [10,20,30] => 20
    assert out[2].vwap_5 == 20.0


def test_parse_trade_envelope_permissive(spark):
    frames = [
        ('{"data": [{"p": 101.5, "s": "BA", "t": 1754650000000, "v": 20.0},'
         ' {"p": 102.0, "s": "BA", "t": 1754650001000, "v": 1.5}]}',),
        ('{"data": []}',),
        ("not json at all",),
        (None,),
    ]
    raw = spark.createDataFrame(frames, "value string")
    out = parse_trade_envelope(raw)
    rows = out.orderBy("timestamp").collect()
    assert len(rows) == 2
    assert rows[0].symbol == "BA" and rows[0].price == 101.5
    assert rows[0].timestamp == dt.datetime(2025, 8, 8, 10, 46, 40)
