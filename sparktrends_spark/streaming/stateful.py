"""Custom stateful streaming operator (SURVEY §2.10 T3 escalation,
§7.4 "escalate to applyInPandasWithState only if latency demands it").

``running_symbol_stats`` keeps a bounded per-symbol ring of recent bars
in the Spark state store and emits, per micro-batch, the trailing-N
VWAP / volatility / anomaly flag for every updated symbol — the
reference's anomaly computation (stock_stream.py:61-97) without
re-reading external history each batch: O(changed symbols) per batch,
state bounded at ``history`` rows per symbol.

This is the genuinely-stateful path for when the bars table is too hot
to re-scan per micro-batch; the default pipeline (pipeline.py) stays
on the stream-static pattern.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("ts_ms", StringType()),  # csv ring of epoch-ms
        StructField("closes", StringType()),  # csv ring of closes
        StructField("volumes", StringType()),  # csv ring of volumes
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("timestamp", TimestampType(), False),
        StructField("close", DoubleType(), True),
        StructField("vwap_5", DoubleType(), True),
        StructField("vol_5", DoubleType(), True),
        StructField("is_anomaly", BooleanType(), True),
        StructField("n_history", LongType(), False),
    ]
)


def _decode(state: GroupState) -> tuple[list[int], list[float], list[float]]:
    if not state.exists:
        return [], [], []
    ts_s, cl_s, vo_s = state.get
    split = lambda s, f: [f(x) for x in s.split(",")] if s else []  # noqa: E731
    return split(ts_s, int), split(cl_s, float), split(vo_s, float)


def _metrics(
    closes: list[float], volumes: list[float], frame: int, threshold: float
) -> tuple[float | None, float | None, bool | None]:
    tail_c, tail_v = closes[-frame:], volumes[-frame:]
    tot_v = sum(tail_v)
    vwap = (
        sum(c * v for c, v in zip(tail_c, tail_v)) / tot_v if tot_v > 0 else None
    )
    if len(tail_c) >= 2:
        s = pd.Series(tail_c)
        vol = float(s.std(ddof=1))
    else:
        vol = None
    if vwap is None or vol is None:
        anom = None  # reference semantics: null history -> null flag
    else:
        anom = abs(tail_c[-1] - vwap) > threshold * vol
    return vwap, vol, anom


def make_update_fn(history: int = 10, frame: int = 5, threshold: float = 3.0):
    """Build the (key, batches, state) -> output iterator function."""

    def update(
        key: tuple[str],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        ts, closes, volumes = _decode(state)
        rows: list[dict[str, Any]] = []
        batch = pd.concat(list(pdfs)).sort_values("timestamp")
        for _, r in batch.iterrows():
            t_ms = int(r["timestamp"].timestamp() * 1000)
            ts.append(t_ms)
            closes.append(float(r["close"]))
            volumes.append(float(r["volume"]))
            ts, closes, volumes = ts[-history:], closes[-history:], volumes[-history:]
            vwap, vol, anom = _metrics(closes, volumes, frame, threshold)
            rows.append(
                {
                    "symbol": symbol,
                    "timestamp": r["timestamp"],
                    "close": float(r["close"]),
                    "vwap_5": vwap,
                    "vol_5": vol,
                    "is_anomaly": anom,
                    "n_history": len(closes),
                }
            )
        state.update(
            (
                ",".join(str(x) for x in ts),
                ",".join(repr(x) for x in closes),
                ",".join(repr(x) for x in volumes),
            )
        )
        yield pd.DataFrame(rows)

    return update


def running_symbol_stats(
    bars: DataFrame,
    history: int = 10,
    frame: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Stateful trailing metrics over a streaming bars DataFrame.

    Input must have columns (symbol, timestamp, close, volume). Output
    mode must be ``append``/``update`` downstream; state never expires
    (NoTimeout) because symbol cardinality is bounded in this domain —
    at web scale attach an idle-timeout eviction.
    """
    return bars.groupBy("symbol").applyInPandasWithState(
        make_update_fn(history, frame, threshold),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
