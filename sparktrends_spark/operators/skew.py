"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join splitting (on in session.py) handles most runtime skew
in sort-merge joins; these helpers cover the two cases it doesn't:

- ``salted_agg``: a groupBy where one key holds a large share of all
  rows. Two-phase: aggregate (key, salt) partials, then merge partials
  per key — the hot key's rows spread over ``salt_buckets`` reducers in
  phase 1 and the phase-2 input is only #keys x salt_buckets rows.
  Requires algebraic aggregates (sum/count/min/max, and avg as
  sum+count merged at the end).

- ``replicated_join``: equi-join where the LEFT side has hot keys and
  the right side is small-ish: salt the left key, replicate each right
  row ``salt_buckets`` times (explode), equi-join on (key, salt). The
  hot key's matches spread over ``salt_buckets`` tasks instead of one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Uniform random salt in [0, buckets). Random (not hash-of-row) is
    correct here: the salt only spreads rows, it never has to be
    reproducible across datasets."""
    return df.withColumn(salt_col, (F.rand(seed=42) * buckets).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (phase1 partial over raw rows,
    phase2 merge over partials). Example:
        {"n": (F.count(F.lit(1)), F.sum("n")),
         "total": (F.sum("value"), F.sum("total"))}
    """
    salted = with_salt(df, salt_buckets)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[p.alias(name) for name, (p, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[m.alias(name) for name, (_, m) in aggs.items()]
    )


def replicated_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salt-left / replicate-right equi-join for hot left-side keys."""
    salted_left = with_salt(left, salt_buckets)
    replicated_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_left.join(replicated_right, [*on, "_salt"], how)
    return out.drop("_salt")
