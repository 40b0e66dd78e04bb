"""Data-quality expectations: declarative constraints, one-pass checks.

The Delta-constraints / Great-Expectations-shaped surface a lake
pipeline runs before publishing a table: not-null, value-range, set
membership, uniqueness, referential integrity. Row-local rules are
evaluated in ONE aggregate pass (each rule is a SUM(violates) over the
same scan — no per-rule actions); uniqueness and foreign-key rules
need their own keyed shapes (a group-count and a broadcast anti join)
and are still one job each.

Everything returns violation COUNTS rather than failing fast, so a
pipeline can apply its own severity policy (block on any, warn under a
rate, quarantine rows). Reference scope note: the reference loads
Postgres with no validation; this is the publish-gate a production
deployment adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate named row-level expectations in one aggregate pass.

    ``rules`` maps rule name -> boolean Column that is TRUE when the
    row SATISFIES the expectation (NULL counts as a violation, like a
    failed SQL CHECK). Returns one row per rule:
    (rule, n_violations, n_rows, violation_rate)."""
    aggs = [
        F.sum(
            F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
        ).cast("bigint").alias(name)
        for name, cond in rules.items()
    ]
    row = df.agg(F.count(F.lit(1)).cast("bigint").alias("_n"), *aggs)
    stack_args = ", ".join(f"'{n}', `{n}`" for n in rules)
    long = row.selectExpr(
        "_n", f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"
    )
    return long.select(
        "rule",
        "n_violations",
        F.col("_n").alias("n_rows"),
        F.round(F.col("n_violations") / F.col("_n").cast("double"), 6).alias(
            "violation_rate"
        ),
    )


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows participating in duplicate key groups, as a one-row frame
    (rule, n_violations, n_rows, violation_rate). A single keyed
    aggregate; map-side combine collapses repeats before the shuffle."""
    n = df.count()
    dup_rows = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") > 1)
        .agg(F.coalesce(F.sum("_c"), F.lit(0)).cast("bigint").alias("v"))
    )
    return dup_rows.select(
        F.lit("unique:" + ",".join(cols)).alias("rule"),
        F.col("v").alias("n_violations"),
        F.lit(n).cast("bigint").alias("n_rows"),
        F.round(F.col("v") / F.lit(float(n)), 6).alias("violation_rate"),
    )


def check_foreign_key(
    df: DataFrame, col: str, dim: DataFrame, dim_col: str
) -> DataFrame:
    """Rows whose ``col`` has no match in ``dim.dim_col`` (broadcast
    anti join — the dimension is the small side by construction)."""
    n = df.count()
    orphans = df.join(
        F.broadcast(dim.select(F.col(dim_col).alias(col)).distinct()),
        col,
        "left_anti",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    return orphans.select(
        F.lit(f"fk:{col}").alias("rule"),
        F.col("v").alias("n_violations"),
        F.lit(n).cast("bigint").alias("n_rows"),
        F.round(F.col("v") / F.lit(float(n)), 6).alias("violation_rate"),
    )
