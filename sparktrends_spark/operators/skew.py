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


def join_key_skew_profile(
    df: DataFrame, key_cols: Sequence[str], max_salt: int = 64
) -> DataFrame:
    """The advisor that tells you WHEN the two helpers above are
    needed: per candidate join/aggregation key, the distribution
    facts that predict a hot reducer — distinct-key count, the
    heaviest key's row share, the max/mean skew factor, the key
    entropy, and a suggested salt-bucket count.

    One shuffle for ALL audited columns: the per-key counts come from
    a single GROUPING SETS pass ((c1),(c2),...) — Spark expands each
    row once per set map-side and aggregates every column's key space
    in the same exchange, instead of one groupBy job per column. The
    second-stage rollup input is one row per distinct key, tiny by
    construction.

    Float discipline: counts are exact; skew_factor and
    suggested_salt derive from them with deterministic double
    arithmetic; entropy (the one order-dependent sum) is rounded to 6
    on both engines. NULL keys form a group like any other — a
    NULL-heavy foreign key IS a hot key and must show up here.
    """
    key_cols = list(key_cols)
    k = len(key_cols)
    # grouping_id bit i (MSB-first over key_cols) set = column i was
    # aggregated away; the single-column set {c_i} therefore has all
    # bits set EXCEPT i.
    gid_of = {
        sum(1 << (k - 1 - j) for j in range(k) if j != i): c
        for i, c in enumerate(key_cols)
    }
    cnts = df.groupingSets([[c] for c in key_cols], *key_cols).agg(
        F.count(F.lit(1)).alias("cnt"), F.grouping_id().alias("gid")
    )
    name = F.lit(None).cast("string")
    for gid, c in gid_of.items():
        name = F.when(F.col("gid") == gid, F.lit(c)).otherwise(name)
    cnts = cnts.select(name.alias("key_col"), "cnt")

    total_d = F.sum("cnt").cast("double")
    max_d = F.max("cnt").cast("double")
    skew = max_d * F.count(F.lit(1)) / total_d
    prof = cnts.groupBy("key_col").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_key_rows"),
        skew.alias("skew_factor"),
        F.round(
            F.log(total_d)
            - F.sum(F.col("cnt") * F.log(F.col("cnt"))) / total_d,
            6,
        ).alias("entropy"),
        F.least(
            F.greatest(F.ceil(skew), F.lit(1).cast("long")),
            F.lit(int(max_salt)).cast("long"),
        ).alias("suggested_salt"),
    )
    return prof
