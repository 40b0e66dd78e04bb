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

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Rule names are interpolated into a selectExpr stack() string; restrict
# them so a quote/backtick can't produce a SQL parse error or mangled
# labels at runtime.
_RULE_NAME_RE = re.compile(r"^[A-Za-z0-9_:.,\- ]+$")


def check_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate named row-level expectations in one aggregate pass.

    ``rules`` maps rule name -> boolean Column that is TRUE when the
    row SATISFIES the expectation (NULL counts as a violation, like a
    failed SQL CHECK). Returns one row per rule:
    (rule, n_violations, n_rows, violation_rate)."""
    for name in rules:
        if not _RULE_NAME_RE.match(name):
            raise ValueError(
                f"rule name {name!r} contains characters outside "
                "[A-Za-z0-9_:.,- ] — it would be interpolated into SQL"
            )
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
    (rule, n_violations, n_rows, violation_rate). ONE job: the keyed
    aggregate that finds duplicates also supplies the total row count
    (sum of group sizes) — no separate eager ``df.count()`` action
    rescanning the table (on a 100 TB fact table that extra scan is the
    dominant cost of the whole check)."""
    agg = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(
            F.coalesce(F.sum("_c"), F.lit(0)).cast("bigint").alias("_n"),
            F.coalesce(
                F.sum(F.when(F.col("_c") > 1, F.col("_c"))), F.lit(0)
            ).cast("bigint").alias("v"),
        )
    )
    return agg.select(
        F.lit("unique:" + ",".join(cols)).alias("rule"),
        F.col("v").alias("n_violations"),
        F.col("_n").alias("n_rows"),
        F.round(F.col("v") / F.col("_n").cast("double"), 6).alias(
            "violation_rate"
        ),
    )


def check_foreign_key(
    df: DataFrame, col: str, dim: DataFrame, dim_col: str
) -> DataFrame:
    """Rows whose ``col`` has no match in ``dim.dim_col``. ONE scan of
    the fact side: a broadcast LEFT join against the (small, distinct)
    dimension with a match marker, then a single aggregate counting
    both total rows and unmatched rows — replacing the previous
    anti-join + separate eager ``df.count()`` (two full scans)."""
    marked = df.select(col).join(
        F.broadcast(
            dim.select(F.col(dim_col).alias(col))
            .distinct()
            .withColumn("_hit", F.lit(1))
        ),
        col,
        "left",
    )
    agg = marked.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.coalesce(
            F.sum(F.when(F.col("_hit").isNull(), 1)), F.lit(0)
        ).cast("bigint").alias("v"),
    )
    return agg.select(
        F.lit(f"fk:{col}").alias("rule"),
        F.col("v").alias("n_violations"),
        F.col("_n").alias("n_rows"),
        F.round(F.col("v") / F.col("_n").cast("double"), 6).alias(
            "violation_rate"
        ),
    )
