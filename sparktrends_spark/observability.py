"""Plan-embedded pipeline metrics via Spark's Observation API.

A curation pipeline needs counters (rows in, rows dropped by each
gate, redactions applied) — but counting with extra ``.count()``
actions re-executes the plan once per metric. ``df.observe`` attaches
aggregate expressions to a point IN the plan; they are computed as a
side effect of the single real action, cost nothing extra, and are
read back from the driver after the action completes.

Usage:

    gated, obs = observed(
        df, "gate",
        rows_in=F.count(F.lit(1)),
        pii=F.sum("n_red"),
    )
    gated.filter(...).write.parquet(...)   # the one real action
    obs.get  # {'rows_in': ..., 'pii': ...}

Reference scope note: the reference pipeline logs nothing per stage;
this is standard Spark 3.3+ public API surface (Observation /
Dataset.observe) wired for the engine's pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics at this point of the plan.

    Returns the (unchanged) DataFrame to keep chaining, plus the
    Observation whose ``.get`` yields ``{metric_name: value}`` after
    the first action. Metrics are computed map-side alongside the
    action — no second pass over the data."""
    if not metrics:
        raise ValueError("observed() needs at least one metric")
    obs = Observation(name)
    exprs = [expr.alias(alias) for alias, expr in metrics.items()]
    return df.observe(obs, *exprs), obs
