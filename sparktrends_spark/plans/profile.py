"""Column-profiling queries (single-pass Deequ/describe shape) over
the ``events`` and ``documents`` tables. See operators/profile.py for
the one-scan plan shape and the engine-exact mean discipline."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparktrends_spark.operators.profile import profile_columns
from sparktrends_spark.plans.registry import query
from sparktrends_spark.sources.tables import load_table


def _profile_sql(table: str, cols: list[tuple[str, str | None, str]]) -> str:
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
        parts.append(
            f"SELECT '{name}' AS col_name, count(*) AS n_rows, "
            f"count(*) - count({name}) AS n_null, "
            f"count(DISTINCT {name}) AS n_distinct, {stats} FROM {table}"
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
