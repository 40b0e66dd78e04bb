"""Rolling metrics + anomaly flag (SURVEY §2.6 W1/W2, §2.3 P6, §2.12).

The reference's signature computation: per-symbol trailing-5-row VWAP
and close-price stddev, then flag ``|close - vwap_5| > k * vol_5``
(stock_stream.py:61-81, threshold ANOMALY_THRESHOLD=3.0 at :17).

Two frame variants:
- ``rows`` (default, matches the reference): 5-row trailing frame —
  "5 minutes" only when bars are gap-free (SURVEY Q10).
- ``range``: time-true trailing frame via ``rangeBetween`` over epoch
  seconds — the variant the reference's naming implied.

Null semantics preserved from the reference: with < 2 rows of history
``vol_5`` is null, so ``is_anomaly`` is null (not false) and a plain
``filter(is_anomaly)`` drops the row (SURVEY §2.12).

Structural finding (proved while building the golden test): with the
current bar INSIDE the frame — the reference's formulation — the
anomaly can never fire at threshold 3.0. For an n-row frame,
max |close - vwap| / stddev(close) is (n-1)/sqrt(n·(n-1)) scaled by the
worst volume weighting, ≤ sqrt(n) ≈ 2.24 at n=5 (and smaller for
n < 5). So ``is_anomaly`` is always false-or-null: the reference's
Slack alert (stock_stream.py:103-114) was dead code in effect. We keep
the formulation for parity; ``anomaly_vs_history`` computes the
deviation against the PRIOR frame (rowsBetween(-n, -1)) — the variant
that can actually alert.

Scale notes: one window spec, partitioned by symbol — a single shuffle
by symbol then sorted within partitions. Symbol cardinality is large in
real deployments (thousands), so partitions stay balanced; for very few
symbols pre-bucketing by (symbol) is still the right key because the
frame is per-symbol sequential by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ANOMALY_THRESHOLD = 3.0


def vwap_metrics(
    bars: DataFrame,
    frame_rows: int = 5,
    anomaly_threshold: float = ANOMALY_THRESHOLD,
    symbol_col: str = "symbol",
    ts_col: str = "timestamp",
    close_col: str = "close",
    volume_col: str = "volume",
) -> DataFrame:
    """Trailing-N-row VWAP + volatility + anomaly flag per symbol."""
    w = (
        Window.partitionBy(symbol_col)
        .orderBy(ts_col)
        .rowsBetween(-(frame_rows - 1), Window.currentRow)
    )
    close = F.col(close_col)
    vwap = (F.sum(close * F.col(volume_col)).over(w) / F.sum(volume_col).over(w))
    vol = F.stddev_samp(close).over(w)
    # one projection for both window columns (CollapseProject folds the
    # chained form to the same plan; fusing here just skips a py4j/
    # analysis round per build — this operator is on every bars-family
    # build path)
    out = bars.select("*", vwap.alias("vwap_5"), vol.alias("vol_5"))
    return out.withColumn(
        "is_anomaly",
        F.abs(close - F.col("vwap_5")) > anomaly_threshold * F.col("vol_5"),
    )


def vwap_metrics_time_range(
    bars: DataFrame,
    frame_seconds: int = 5 * 60,
    anomaly_threshold: float = ANOMALY_THRESHOLD,
    symbol_col: str = "symbol",
    ts_col: str = "timestamp",
    close_col: str = "close",
    volume_col: str = "volume",
) -> DataFrame:
    """Time-true trailing-window variant: frame = [t - frame_seconds, t]."""
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    with_epoch = bars.withColumn("_epoch_s", epoch)
    w = (
        Window.partitionBy(symbol_col)
        .orderBy("_epoch_s")
        .rangeBetween(-(frame_seconds - 1), Window.currentRow)
    )
    close = F.col(close_col)
    out = (
        with_epoch.withColumn(
            "vwap_t",
            F.sum(close * F.col(volume_col)).over(w) / F.sum(volume_col).over(w),
        )
        .withColumn("vol_t", F.stddev_samp(close).over(w))
        .drop("_epoch_s")
    )
    return out.withColumn(
        "is_anomaly",
        F.abs(close - F.col("vwap_t")) > anomaly_threshold * F.col("vol_t"),
    )


def anomaly_vs_history(
    bars: DataFrame,
    frame_rows: int = 5,
    anomaly_threshold: float = ANOMALY_THRESHOLD,
    symbol_col: str = "symbol",
    ts_col: str = "timestamp",
    close_col: str = "close",
    volume_col: str = "volume",
) -> DataFrame:
    """Anomaly flag of the current close vs the PRIOR ``frame_rows``
    bars (frame excludes the current row) — the formulation whose 3σ
    threshold can actually trip, unlike the reference's (see module
    docstring). Null when history has < 2 bars.
    """
    w = (
        Window.partitionBy(symbol_col)
        .orderBy(ts_col)
        .rowsBetween(-frame_rows, -1)
    )
    close = F.col(close_col)
    vwap = F.sum(close * F.col(volume_col)).over(w) / F.sum(volume_col).over(w)
    vol = F.stddev_samp(close).over(w)
    out = bars.select("*", vwap.alias("hist_vwap"), vol.alias("hist_vol"))
    return out.withColumn(
        "is_anomaly",
        F.abs(close - F.col("hist_vwap")) > anomaly_threshold * F.col("hist_vol"),
    )


def anomalies(metrics: DataFrame, limit: int | None = 1000) -> DataFrame:
    """P5: keep only confirmed anomalies (null-safe drop, as reference).

    ``limit`` bounds what a driver-side alert callback may collect —
    unlike the reference's unbounded ``collect()`` (stock_stream.py:105).
    """
    out = metrics.filter(F.col("is_anomaly"))
    return out.limit(limit) if limit is not None else out
