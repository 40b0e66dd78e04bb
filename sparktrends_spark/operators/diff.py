"""Snapshot diff: CDC-style comparison of two keyed table versions.

Given OLD and NEW snapshots of a keyed table (two parquet versions,
two `read_upserted_as_of` views, two pipeline runs), classify every
key as inserted / deleted / updated / unchanged and carry both sides'
values. This is the verification primitive behind incremental-pipeline
rollouts ("the new code changed exactly these partitions and nothing
else") and the change feed a downstream consumer ingests.

One full outer join keyed by the natural key — both sides shuffle
once on that key and nothing else; comparison is a null-safe equality
over the value columns (JVM expressions). At 100 TB this is the
minimal-movement plan for an unordered diff.

Reference scope note: the reference overwrites state blindly; this is
the audit op a production deployment adds around it.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """(keys..., change_type, old_<col>..., new_<col>...) per key.

    change_type: 'inserted' (key only in new), 'deleted' (only in
    old), 'updated' (present in both, any compare col differs under
    null-safe equality), else 'unchanged'."""
    o = old.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    joined = o.join(n, keys, "full_outer")

    same: Column = reduce(
        lambda a, b: a & b,
        [
            F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare_cols
        ],
    )
    change = (
        F.when(F.col("_in_old").isNull(), "inserted")
        .when(F.col("_in_new").isNull(), "deleted")
        .when(same, "unchanged")
        .otherwise("updated")
    )
    return joined.select(
        *keys,
        change.alias("change_type"),
        *[f"old_{c}" for c in compare_cols],
        *[f"new_{c}" for c in compare_cols],
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Tiny per-change_type count frame for gating/alerting."""
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )
