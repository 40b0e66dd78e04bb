"""Cross-sectional portfolio analytics over per-key ordered series.

The reference stops at single-series indicators (trailing VWAP /
rolling stddev, `/root/reference/spark/jobs/stock_stream.py:61-77`);
a market analytics engine's next questions are CROSS-series: how do
symbols co-move (pairwise return correlation), how does each symbol
load on the common factor (beta vs. an equal-weight market return),
and what was the worst peak-to-trough loss (maximum drawdown).

Spark shapes, chosen for the 100 TB posture:

- ``daily_returns``: one window pass (lag on the symbol partition) —
  single exchange, whole-stage codegen.
- ``pairwise_correlation``: a date-keyed self-join. The join fan-out
  is O(days x symbols^2) — quadratic in the SYMBOL universe, linear in
  history, so it scales with time but not with a wider universe; the
  operator takes the symbol frame already restricted (callers bound
  the universe — e.g. top-k by volume — before calling, the standard
  practice for correlation matrices). Corr itself is Spark's partial
  co-moment aggregation: map-side combine, one shuffle on the pair key.
- ``market_beta``: the market return is one row per day — built with a
  hash aggregate and joined back via BROADCAST (a days-long table is
  KBs even for decades), so the factor join adds no shuffle.
- ``max_drawdown``: running max + ratio in one window pass on the
  symbol partition, then an arg-min aggregate on the same key — the
  window shuffle is reused by the aggregate (no second exchange).

Float parity discipline (see plans/market.py `_round6`): returns and
drawdowns are DIVISIONS of raw values — deterministic, bit-identical
across engines — so min/filter/arg-min on them are exact; only the
co-moment aggregates (corr / covar / var), whose partial-merge order
differs between engines, are rounded to 6 digits on both sides.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparktrends_spark.caching import persist_tracked


def daily_returns(
    df: DataFrame,
    value_col: str = "close",
    order_col: str = "day",
    partition_cols: Iterable[str] = ("symbol",),
    out_col: str = "ret",
) -> DataFrame:
    """Simple per-period return: v_i / v_{i-1} - 1 per key (NULL on
    each key's first period). One lag window on the key partition."""
    partition_cols = list(partition_cols)
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    prev = F.lag(value_col).over(w)
    return df.withColumn(out_col, F.col(value_col) / prev - F.lit(1.0))


def pairwise_correlation(
    returns: DataFrame,
    key_col: str = "symbol",
    time_col: str = "day",
    ret_col: str = "ret",
    min_obs: int = 2,
) -> DataFrame:
    """Pearson correlation of returns for every unordered key pair
    (key_a < key_b), with the joint observation count.

    Date-keyed self-join (NULL returns dropped BEFORE the join — the
    first-day row would fan out against every other symbol only to be
    ignored by corr), then one hash aggregate on the pair key.
    """
    # Both join sides reference the returns frame; Spark has no
    # common-subplan reuse across DataFrame branches, so without a
    # persist the entire upstream pipeline (the raw trades scan and
    # the daily-bar aggregation) would execute once PER SIDE. The
    # returns frame is one row per key-period — KBs-to-MBs at any
    # input scale — so pinning it costs nothing and halves the scan.
    r = persist_tracked(
        returns.where(F.col(ret_col).isNotNull()).select(
            key_col, time_col, ret_col
        )
    )
    a = r.select(
        F.col(key_col).alias("sym_a"),
        F.col(time_col).alias(time_col),
        F.col(ret_col).alias("ret_a"),
    )
    b = r.select(
        F.col(key_col).alias("sym_b"),
        F.col(time_col).alias(time_col),
        F.col(ret_col).alias("ret_b"),
    )
    pairs = a.join(b, time_col).where(F.col("sym_a") < F.col("sym_b"))
    return (
        pairs.groupBy("sym_a", "sym_b")
        .agg(
            F.round(F.corr("ret_a", "ret_b"), 6).alias("ret_corr"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .where(F.col("n_days") >= F.lit(min_obs))
    )


def market_beta(
    returns: DataFrame,
    key_col: str = "symbol",
    time_col: str = "day",
    ret_col: str = "ret",
    min_obs: int = 2,
) -> DataFrame:
    """CAPM-style loading of each key on the equal-weight market
    return: beta = covar_samp(ret, mkt) / var_samp(mkt), alpha =
    mean(ret) - beta * mean(mkt), r2 = corr(ret, mkt)^2.

    The market frame is one row per day (hash aggregate), broadcast
    back onto the per-key returns — no extra shuffle on the fact side.
    """
    # Same two-branch shape as pairwise_correlation: the market
    # aggregate and the per-key join probe both read the returns
    # frame — persist it so the trades scan runs once.
    r = persist_tracked(
        returns.where(F.col(ret_col).isNotNull()).select(
            key_col, time_col, ret_col
        )
    )
    mkt = r.groupBy(time_col).agg(F.avg(ret_col).alias("mkt_ret"))
    joined = r.join(F.broadcast(mkt), time_col)
    beta = F.covar_samp(ret_col, "mkt_ret") / F.var_samp("mkt_ret")
    # r2 as corr*corr, NOT pow(corr, 2): plain multiplication is the
    # same single IEEE op in every engine, pow's rounding is not.
    c = F.corr(ret_col, "mkt_ret")
    return (
        joined.groupBy(key_col)
        .agg(
            F.round(beta, 6).alias("beta"),
            F.round(
                F.avg(ret_col) - beta * F.avg("mkt_ret"), 6
            ).alias("alpha"),
            F.round(c * c, 6).alias("r2"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .where(F.col("n_days") >= F.lit(min_obs))
    )


def max_drawdown(
    df: DataFrame,
    value_col: str = "close",
    order_col: str = "day",
    partition_cols: Iterable[str] = ("symbol",),
) -> DataFrame:
    """Worst peak-to-trough decline per key: running max of the value,
    drawdown = value / running_max - 1, reported at its (earliest)
    trough with the peak and trough values.

    Two windows + one aggregate, all on the key partition — a single
    exchange end-to-end. The trough row is selected by exact equality
    on the drawdown (divisions are deterministic doubles; the min is a
    member of the set, so `drawdown = min` is FP-safe), ties broken by
    earliest period via arg-min on the unique order column.
    """
    partition_cols = list(partition_cols)
    w_run = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*partition_cols)
    dd = df.withColumn("peak", F.max(value_col).over(w_run)).withColumn(
        "drawdown", F.col(value_col) / F.col("peak") - F.lit(1.0)
    )
    dd = dd.withColumn("mdd", F.min("drawdown").over(w_all))
    return (
        dd.where(F.col("drawdown") == F.col("mdd"))
        .groupBy(*partition_cols)
        .agg(
            F.min(order_col).alias("trough_" + order_col),
            F.min_by(value_col, order_col).alias("trough_" + value_col),
            F.min_by("peak", order_col).alias("peak_" + value_col),
            F.round(F.min("drawdown"), 6).alias("max_drawdown"),
        )
    )
