"""Golden end-to-end pipeline test (SURVEY §5.3, FIXTURES Part A).

Replays a fixed Finnhub-envelope fixture through the full
parse -> 1-min bars -> metrics -> anomaly DAG and compares against a
committed golden. Catches any silent semantic drift in the core
pipeline across refactors — values here were verified by hand and by
the DuckDB oracles at commit time.

Regenerate (after an INTENTIONAL semantics change only):
    python -m tests.test_golden_pipeline
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from sparktrends_spark.operators.bars import ohlcv_bars
from sparktrends_spark.operators.metrics import vwap_metrics
from sparktrends_spark.operators.parse import parse_trade_envelope

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "market_pipeline.json")

BASE_MS = 1_704_103_200_000  # 2024-01-01 10:00:00 UTC


def _fixture_frames() -> list[str]:
    def t(minute: int, sec: int) -> int:
        return BASE_MS + minute * 60_000 + sec * 1_000

    frames = []
    # 12 minutes of AAA with a price spike at minute 10 (anomaly trigger)
    for m in range(12):
        price = 100.0 + m * 0.1 + (50.0 if m == 10 else 0.0)
        frames.append(
            {"data": [
                {"s": "AAA", "p": price, "v": 10.0, "t": t(m, 5)},
                {"s": "AAA", "p": price + 0.05, "v": 5.0, "t": t(m, 35)},
            ]}
        )
    # BBB: 3 bars only (short history), with a gap at minute 1
    for m in (0, 2, 3):
        frames.append(
            {"data": [{"s": "BBB", "p": 50.0 + m, "v": 1.0, "t": t(m, 10)}]}
        )
    # edge frames: malformed, empty, null
    frames.append({"data": []})
    frames.append({"data": None})
    return [json.dumps(f) for f in frames] + ["not json"]


def _run_pipeline(spark):
    raw = spark.createDataFrame([(f,) for f in _fixture_frames()], "value string")
    trades = parse_trade_envelope(raw)
    bars = ohlcv_bars(trades)
    metrics = vwap_metrics(bars)
    out = metrics.select(
        "symbol",
        F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round("open", 6).alias("open"),
        F.round("close", 6).alias("close"),
        F.round("volume", 6).alias("volume"),
        F.round("vwap_5", 6).alias("vwap_5"),
        F.round("vol_5", 6).alias("vol_5"),
        "is_anomaly",
    ).orderBy("symbol", "ts")
    return [r.asDict() for r in out.collect()]


def test_golden_market_pipeline(spark):
    got = _run_pipeline(spark)
    with open(GOLDEN_PATH) as fh:
        want = json.load(fh)
    assert got == want
    # structural properties of the reference formulation:
    # 1. in-frame 3-sigma anomalies are mathematically impossible
    #    (max |close - vwap| / stddev < 2.24 for a 5-row frame incl.
    #    current — see operators/metrics.py), so none may appear
    assert not [r for r in got if r["is_anomaly"]]
    # 2. first bar per symbol: null vol/anomaly (null-history semantics)
    bbb_first = [r for r in got if r["symbol"] == "BBB"][0]
    assert bbb_first["vol_5"] is None and bbb_first["is_anomaly"] is None
    # 3. the history-based variant DOES flag the engineered spike
    from sparktrends_spark.operators.metrics import anomaly_vs_history
    from sparktrends_spark.operators.bars import ohlcv_bars as _bars
    from sparktrends_spark.operators.parse import parse_trade_envelope as _parse

    raw = spark.createDataFrame([(f,) for f in _fixture_frames()], "value string")
    hist = anomaly_vs_history(_bars(_parse(raw)))
    flagged = [r for r in hist.collect() if r.is_anomaly]
    assert any(
        r.symbol == "AAA" and r.timestamp.minute == 10 for r in flagged
    )


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sparktrends_spark.session import get_spark

    spark = get_spark("golden-regen", master="local[4]", shuffle_partitions=4)
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as fh:
        json.dump(_run_pipeline(spark), fh, indent=1)
    print(f"wrote {GOLDEN_PATH}")
