"""Time-window queries over ``events``: tumbling daily rollups,
sliding windows, and gap sessionization (SURVEY §2.10 declared-intent
gaps, batch form)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparktrends_spark.operators.sessionize import session_summary, sessionize
from sparktrends_spark.plans.registry import query
from sparktrends_spark.sources.tables import load_table


@query(
    "daily_event_rollup",
    oracle="""
SELECT event_type, date_trunc('day', ts) AS day,
       count(*) AS n_events, sum(value) AS total_value, avg(value) AS avg_value
FROM events GROUP BY event_type, date_trunc('day', ts)
""",
)
def q_daily_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.avg("value").alias("avg_value"),
    )


@query(
    "sliding_event_counts",
    oracle="""
WITH base AS (
  SELECT event_type, value,
         (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS b
  FROM events
)
SELECT event_type,
       make_timestamp((b - off) * 1000000) AS window_start,
       make_timestamp((b - off + 600) * 1000000) AS window_end,
       count(*) AS n_events,
       sum(value) AS total_value
FROM base, unnest([CAST(0 AS BIGINT), CAST(300 AS BIGINT)]) AS t(off)
GROUP BY 1, 2, 3
""",
)
def q_sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 (each event lands in exactly
    two windows); the oracle reconstructs window membership arithmetically."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type", F.window("ts", "10 minutes", "5 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "event_sessions",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, CAST(sum(is_new) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM seq
)
SELECT user_id, session_idx,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, sum(value) AS total_value
FROM sess GROUP BY user_id, session_idx
""",
)
def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization per user (batch session windows)."""
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(
        ev, ["user_id"], "ts", gap_seconds=1800, tiebreak_col="event_id"
    )
    return session_summary(s, ["user_id"], "ts", value_col="value")
