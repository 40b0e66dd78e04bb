"""Cross-sectional portfolio analytics queries (correlation matrix,
market beta, maximum drawdown) over the deterministic daily-close
series `plans/market.py` derives from ``events``.

Extends the reference's single-series indicator surface
(`/root/reference/spark/jobs/stock_stream.py:61-77`) with the
cross-SERIES questions a market engine answers next; see
`operators/portfolio.py` for the Spark shapes and the float-parity
discipline (divisions exact; co-moment aggregates rounded to 6 on
both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparktrends_spark.operators.bars import daily_bars
from sparktrends_spark.operators.portfolio import (
    daily_returns,
    market_beta,
    max_drawdown,
    pairwise_correlation,
)
from sparktrends_spark.plans.market import (
    _DAILY_BARS_CTE,
    _TRADES_CTE,
    trades_view,
)
from sparktrends_spark.plans.registry import query

_RETS_CTE = """
rets AS (
  SELECT symbol, day, close,
         close / lag(close) OVER (PARTITION BY symbol ORDER BY day)
           - 1.0 AS ret
  FROM daily
),
r AS (SELECT symbol, day, ret FROM rets WHERE ret IS NOT NULL)
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_bars(
        trades_view(spark, sf_dir),
        ts_col="ts",
        tiebreak_col="event_id",
        bucket_col="_bucket",
    ).select("symbol", F.col("timestamp").alias("day"), "close")


@query(
    "symbol_return_correlation",
    oracle=f"""
WITH {_TRADES_CTE.strip()}, {_DAILY_BARS_CTE.strip()}, {_RETS_CTE.strip()}
SELECT a.symbol AS sym_a, b.symbol AS sym_b,
       round(corr(a.ret, b.ret), 6) AS ret_corr,
       count(*) AS n_days
FROM r a JOIN r b ON a.day = b.day AND a.symbol < b.symbol
GROUP BY 1, 2
HAVING count(*) >= 2
""",
)
def q_symbol_return_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of daily returns for every
    unordered symbol pair — the correlation matrix in long form.

    Date-keyed self-join (first-day NULL returns dropped BEFORE the
    fan-out) then one hash aggregate on the pair key. O(days x
    symbols^2) join output: linear in history, quadratic only in the
    (caller-bounded) symbol universe — the standard shape for a
    correlation matrix at scale.
    """
    rets = daily_returns(_daily(spark, sf_dir))
    return pairwise_correlation(rets, min_obs=2)


@query(
    "symbol_market_beta",
    oracle=f"""
WITH {_TRADES_CTE.strip()}, {_DAILY_BARS_CTE.strip()}, {_RETS_CTE.strip()},
mkt AS (SELECT day, avg(ret) AS mkt_ret FROM r GROUP BY day)
SELECT symbol,
       round(covar_samp(ret, mkt_ret) / var_samp(mkt_ret), 6) AS beta,
       round(avg(ret)
             - covar_samp(ret, mkt_ret) / var_samp(mkt_ret)
               * avg(mkt_ret), 6) AS alpha,
       round(corr(ret, mkt_ret) * corr(ret, mkt_ret), 6) AS r2,
       count(*) AS n_days
FROM r JOIN mkt USING (day)
GROUP BY symbol
HAVING count(*) >= 2
""",
)
def q_symbol_market_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPM-style beta/alpha/r2 of each symbol against the
    equal-weight market return.

    The market factor is one row per day — built by hash aggregate and
    BROADCAST back onto the returns (a days-long frame is KBs at any
    corpus scale), so the factor join adds no shuffle; betas then come
    from one co-moment aggregate on the symbol key.
    """
    rets = daily_returns(_daily(spark, sf_dir))
    return market_beta(rets, min_obs=2)


@query(
    "symbol_max_drawdown",
    oracle=f"""
WITH {_TRADES_CTE.strip()}, {_DAILY_BARS_CTE.strip()},
dd AS (
  SELECT symbol, day, close,
         max(close) OVER (
           PARTITION BY symbol ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS peak
  FROM daily
),
dd2 AS (SELECT *, close / peak - 1.0 AS drawdown FROM dd),
m AS (
  SELECT *, min(drawdown) OVER (PARTITION BY symbol) AS mdd FROM dd2
)
SELECT symbol,
       min(day) AS trough_day,
       arg_min(close, day) AS trough_close,
       arg_min(peak, day) AS peak_close,
       round(min(drawdown), 6) AS max_drawdown
FROM m
WHERE drawdown = mdd
GROUP BY symbol
""",
)
def q_symbol_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per symbol with its (earliest) trough day and
    the peak/trough closes.

    Running-max + ratio + partition-min are all windows on the SAME
    symbol partitioning as the final arg-min aggregate — one exchange
    end-to-end. The trough row is selected by exact FP equality
    (drawdown is a deterministic division; the min is a member of the
    set), ties broken by earliest day.
    """
    return max_drawdown(_daily(spark, sf_dir))


@query(
    "symbol_rolling_beta",
    oracle=f"""
WITH {_TRADES_CTE.strip()}, {_DAILY_BARS_CTE.strip()}, {_RETS_CTE.strip()},
mkt AS (SELECT day, avg(ret) AS mkt_ret FROM r GROUP BY day),
j AS (SELECT symbol, day, ret, mkt_ret FROM r JOIN mkt USING (day))
SELECT symbol, day,
       round(covar_samp(ret, mkt_ret) OVER w
             / var_samp(mkt_ret) OVER w, 6) AS beta_30,
       count(*) OVER w AS n_days
FROM j
WINDOW w AS (
  PARTITION BY symbol ORDER BY day
  ROWS BETWEEN 29 PRECEDING AND CURRENT ROW
)
""",
)
def q_symbol_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day rolling CAPM beta per symbol — the time-varying loading
    a risk desk actually monitors (the static symbol_market_beta is
    its full-history summary).

    Same broadcast factor join, then BOTH co-moment window aggregates
    (covar/var) ride ONE window pass on the symbol partition — no
    extra exchange vs a single rolling stddev."""
    from pyspark.sql import Window

    from sparktrends_spark.caching import persist_tracked

    rets = daily_returns(_daily(spark, sf_dir))
    r = persist_tracked(
        rets.where(F.col("ret").isNotNull()).select("symbol", "day", "ret")
    )
    mkt = r.groupBy("day").agg(F.avg("ret").alias("mkt_ret"))
    j = r.join(F.broadcast(mkt), "day")
    w = (
        Window.partitionBy("symbol")
        .orderBy("day")
        .rowsBetween(-29, Window.currentRow)
    )
    return j.select(
        "symbol",
        "day",
        F.round(
            F.covar_samp("ret", "mkt_ret").over(w)
            / F.var_samp("mkt_ret").over(w),
            6,
        ).alias("beta_30"),
        F.count(F.lit(1)).over(w).alias("n_days"),
    )
