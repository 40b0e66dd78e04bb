"""Property-based tests (SURVEY §5.4): OHLCV aggregation invariants.

For arbitrary trade sets:
- low <= min(open, close) <= max(open, close) <= high
- volume = sum of trade volumes in the bar
- one bar per distinct (symbol, minute)
- open/close are the prices of the earliest/latest trade (by ts,
  tiebreak) — determinism under any physical row order.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparktrends_spark.operators.bars import ohlcv_bars

BASE_MS = 1_700_000_000_000 - (1_700_000_000_000 % 60_000)

trade_st = st.tuples(
    st.sampled_from(["A", "B", "C"]),                      # symbol
    st.floats(0.01, 1e6, allow_nan=False),                 # price
    st.floats(0.0, 1e4, allow_nan=False),                  # volume
    st.integers(0, 10 * 60_000 - 1),                       # offset ms
)


@settings(
    max_examples=8,
    deadline=None,
    # the spark fixture is session-scoped state handed through a
    # function-scoped shim; examples can't mutate it
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(st.lists(trade_st, min_size=1, max_size=80))
def test_ohlcv_invariants(spark_session_holder, trades):
    spark = spark_session_holder
    rows = [
        (sym, float(p), float(v), i, BASE_MS + off)
        for i, (sym, p, v, off) in enumerate(trades)
    ]
    df = spark.createDataFrame(
        rows, "symbol string, price double, volume double, trade_id long, t long"
    ).selectExpr(
        "symbol", "price", "volume", "trade_id", "timestamp_millis(t) AS timestamp"
    )
    bars = {
        (r.symbol, r.timestamp): r
        for r in ohlcv_bars(df, tiebreak_col="trade_id").collect()
    }

    grouped = defaultdict(list)
    for sym, p, v, i, ms in rows:
        grouped[(sym, ms // 60_000)].append((ms, i, p, v))

    assert len(bars) == len(grouped)
    for (sym, minute), trs in grouped.items():
        key = next(k for k in bars if k[0] == sym and
                   int(k[1].timestamp() * 1000) // 60_000 == minute)
        bar = bars[key]
        prices = [p for _, _, p, _ in trs]
        assert bar.low == min(prices) and bar.high == max(prices)
        assert bar.low <= min(bar.open, bar.close)
        assert max(bar.open, bar.close) <= bar.high
        assert abs(bar.volume - sum(v for _, _, _, v in trs)) < 1e-6
        trs_sorted = sorted(trs)  # by (ms, trade_id)
        assert bar.open == trs_sorted[0][2]
        assert bar.close == trs_sorted[-1][2]
        assert bar.n_trades == len(trs)


# hypothesis can't take a pytest fixture directly as an argument each
# example; bind the session once at module scope via a tiny indirection
import pytest  # noqa: E402


@pytest.fixture(name="spark_session_holder")
def _spark_session_holder(spark):
    return spark


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=50),
)
@settings(max_examples=200, deadline=None)
def test_misra_gries_guarantee(stream, capacity, batch_size):
    """Pure-Python MG property (no Spark): for ANY stream, batch
    split, and capacity: (a) the summary never exceeds capacity keys,
    (b) every key with true count > N/(capacity+1) survives — the
    pigeonhole bound heavy_hitters' exactness rests on."""
    from collections import Counter

    from sparktrends_spark.operators.freq import mg_merge

    state: dict = {}
    for i in range(0, len(stream), batch_size):
        batch = Counter(stream[i : i + batch_size])
        state = mg_merge(state, batch, capacity)
        assert len(state) <= capacity

    true = Counter(stream)
    bound = len(stream) / (capacity + 1)
    for key, cnt in true.items():
        if cnt > bound:
            assert key in state, (key, cnt, bound, capacity, state)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 10),
    st.floats(0.05, 0.95),
)
def test_ema_chunked_equals_sequential_property(
    spark_session_holder, closes, chunk_rows, alpha
):
    """For ANY series, chunk size and alpha: the chunked linear-
    recurrence decomposition equals the sequential fold within FP-
    reassociation tolerance."""
    import math

    from sparktrends_spark.caching import release_persisted
    from sparktrends_spark.operators.indicators import ema, ema_chunked

    spark = spark_session_holder
    rows = [("S", float(i), float(c)) for i, c in enumerate(closes)]
    df = spark.createDataFrame(rows, "symbol string, day double, close double")
    want = {
        r.day: r.ema
        for r in ema(df, "close", "day", ["symbol"], alpha=alpha).collect()
    }
    got = {
        r.day: r.ema
        for r in ema_chunked(
            df, "close", "day", ["symbol"], alpha=alpha, chunk_rows=chunk_rows
        ).collect()
    }
    release_persisted()
    assert want.keys() == got.keys()
    for k in want:
        assert math.isclose(want[k], got[k], rel_tol=1e-9, abs_tol=1e-6), (
            k, want[k], got[k],
        )


cdc_op_st = st.tuples(
    st.integers(0, 9),                       # key
    st.integers(0, 1_000),                   # value
    st.sampled_from(["c", "u", "d"]),        # op
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(st.lists(st.lists(cdc_op_st, min_size=1, max_size=6), min_size=1, max_size=4))
def test_cdc_apply_matches_model(spark_session_holder, tmp_path_factory, batches):
    """apply_cdc_bucketed over arbitrary batch sequences equals a
    dict model applying the same changes in order (one change per key
    per batch — the changefeed contract; duplicates within a batch are
    collapsed to the last occurrence before applying)."""
    from sparktrends_spark.streaming.sinks import (
        apply_cdc_bucketed,
        read_upserted,
    )

    spark = spark_session_holder
    path = str(tmp_path_factory.mktemp("cdc") / "t")
    model: dict[int, int] = {}
    for version, batch in enumerate(batches):
        dedup: dict[int, tuple] = {}
        for k, v, op in batch:  # last change per key wins in the feed
            dedup[k] = (k, v, op)
        rows = list(dedup.values())
        apply_cdc_bucketed(
            spark.createDataFrame(rows, "k long, v long, op string"),
            path, keys=("k",), n_buckets=4, version=version,
        )
        for k, v, op in rows:
            if op == "d":
                model.pop(k, None)
            else:
                model[k] = v
    got = {r.k: r.v for r in read_upserted(spark, path).collect()}
    assert got == model
