"""Column-profiling queries (single-pass Deequ/describe shape) over
the ``events`` and ``documents`` tables. See operators/profile.py for
the one-scan plan shape and the engine-exact mean discipline."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparktrends_spark.operators.profile import profile_columns
from sparktrends_spark.plans.registry import query
from sparktrends_spark.sources.tables import load_table


def _profile_sql(
    table: str,
    cols: list[tuple[str, str | None, str]],
    include_distinct: bool = True,
) -> str:
    """UNION-ALL oracle: one SELECT per column, mirroring the Spark
    operator's typed statistic and exact decimal-sum mean (scale 0
    for integral stats, 6 for fractional — see operators/profile.py
    on why the scale is parity-critical)."""
    parts = []
    for name, x, dec in cols:
        if x is None:
            stats = (
                "CAST(NULL AS DOUBLE) AS min_value, "
                "CAST(NULL AS DOUBLE) AS max_value, "
                "CAST(NULL AS DOUBLE) AS mean_value"
            )
        else:
            stats = (
                f"CAST(min({x}) AS DOUBLE) AS min_value, "
                f"CAST(max({x}) AS DOUBLE) AS max_value, "
                f"CAST(sum(CAST({x} AS {dec})) AS DOUBLE)"
                f" / count({name}) AS mean_value"
            )
        nd = (
            f"count(DISTINCT {name}) AS n_distinct, "
            if include_distinct
            else ""
        )
        parts.append(
            f"SELECT '{name}' AS col_name, count(*) AS n_rows, "
            f"count(*) - count({name}) AS n_null, "
            f"{nd}{stats} FROM {table}"
        )
    return "\nUNION ALL\n".join(parts)


_EVENTS_COLS = [
    ("event_id", "event_id", "DECIMAL(27,0)"),
    ("ts", "epoch_us(ts)", "DECIMAL(27,0)"),
    ("user_id", "user_id", "DECIMAL(27,0)"),
    ("event_type", "length(event_type)", "DECIMAL(27,0)"),
    ("value", "value", "DECIMAL(27,6)"),
    ("props", "length(props)", "DECIMAL(27,0)"),
]

_DOCUMENTS_COLS = [
    ("doc_id", "doc_id", "DECIMAL(27,0)"),
    ("text", "length(text)", "DECIMAL(27,0)"),
    ("lang", "length(lang)", "DECIMAL(27,0)"),
    ("source", "length(source)", "DECIMAL(27,0)"),
    ("n_chars", "n_chars", "DECIMAL(27,0)"),
]


@query("events_column_profile", oracle=_profile_sql("events", _EVENTS_COLS))
def q_events_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile every events column — completeness, distinctness,
    typed min/max/mean — in ONE aggregate over ONE scan (the multiple
    count-distincts plan as a single Expand, not per-column jobs)."""
    return profile_columns(load_table(spark, sf_dir, "events"))


@query(
    "documents_column_profile",
    oracle=_profile_sql("documents", _DOCUMENTS_COLS),
)
def q_documents_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same one-pass profiler over the text corpus: string
    columns profile their LENGTH distribution (doc size stats fall
    out of the mean/min/max for free)."""
    return profile_columns(load_table(spark, sf_dir, "documents"))


@query(
    "stream_events_profile",
    oracle=_profile_sql("events", _EVENTS_COLS, include_distinct=False),
)
def q_stream_events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The profiler maintained ON THE INGEST PATH: the same one-pass
    aggregate runs as a streaming global aggregation in COMPLETE mode
    — Spark's state store holds one bounded row of mergeable partials
    (counts, min/max, exact decimal sums) and re-emits the whole
    profile each micro-batch into the keyed upsert sink (key =
    col_name; output is dimension-bounded, the sane complete-mode
    case). However history is micro-batched, the converged table must
    equal the batch profile — the statistics are associative, and the
    decimal sums keep them EXACT across any merge order.

    ``n_distinct`` is omitted: exact count-distinct has no bounded
    merge state (streaming-unsupported); the scale answer is an HLL
    sketch column, which has no cross-engine value oracle. The batch
    twin (events_column_profile) grades distinctness exactly.
    """
    from sparktrends_spark.plans.streaming_queries import (
        run_upsert_stream,
        stream_events,
    )

    ev = stream_events(spark, sf_dir)
    prof = profile_columns(ev, include_distinct=False)
    return run_upsert_stream(prof, keys=("col_name",), output_mode="complete")
