"""Ranking / top-K operators (SURVEY §2.6 W3, §2.7, §2.4 J1).

The reference computes "last 10 bars per symbol" by pushing a
ROW_NUMBER subquery into Postgres (stock_stream.py:45-55) and "latest
bar per symbol" as groupBy-max + self-join (A1+J1, :85-97). Both are
restated Spark-native here.

Scale notes: ``row_number`` over (key) is one shuffle + per-partition
sort; for global top-k, ``orderBy().limit(k)`` plans
TakeOrderedAndProject (per-partition heaps + driver merge — no full
sort, no full shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group by the given ordering (W3 pattern)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)


def latest_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str = "timestamp",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Newest row per group — the reference's A1+J1 greatest-n-per-group
    restated as a single window pass (no self-join, one shuffle)."""
    order = [F.desc(ts_col)] + ([F.desc(tiebreak_col)] if tiebreak_col else [])
    return top_k_per_group(df, group_cols, order, k=1)


def global_top_k(df: DataFrame, order_cols: Sequence[Column], k: int) -> DataFrame:
    """Global top-k: TakeOrderedAndProject under the hood."""
    return df.orderBy(*order_cols).limit(k)
