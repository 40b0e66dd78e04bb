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
    """Calendar bucketing (§2.9): per-day per-type counts/sums via
    date_trunc — the coarse rollup feeding the window queries."""
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


@query(
    "event_funnel",
    oracle="""
WITH s1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t_view
  FROM events
), s2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
              OVER (PARTITION BY user_id) AS t_click
  FROM s1
), s3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
              OVER (PARTITION BY user_id) AS t_purchase
  FROM s2
), per_user AS (
  SELECT user_id, max(t_view) AS t_view, max(t_click) AS t_click,
         max(t_purchase) AS t_purchase
  FROM s3 GROUP BY user_id
)
SELECT count(t_view) AS n_view,
       count(t_click) AS n_view_click,
       count(t_purchase) AS n_full_funnel
FROM per_user
""",
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel (view -> click -> purchase, in
    strict timestamp order): per user, the first view, the first click
    AFTER that view, and the first purchase AFTER that click; the
    output counts users surviving each step. The classic funnel/
    sequential-pattern operator (absent from the reference and from
    plain SQL GROUP BY — it needs ordered, stage-dependent minima).

    Scale shape: the three stage columns are windows over the SAME
    partitioning (user_id), so Spark plans ONE exchange + three Window
    operators back-to-back — no join, no second shuffle; the per-user
    collapse reuses the same partitioning and the final global count is
    a single-row partial+final agg. Timestamp comparisons and counts
    are exact in both engines.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    s1 = ev.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_view_click"),
        F.count("t_purchase").alias("n_full_funnel"),
    )


@query(
    "customer_spend_distribution",
    oracle="""
WITH spend AS (
  SELECT o_custkey AS custkey,
         CAST(count(*) AS BIGINT) AS n_orders,
         round(sum(o_totalprice), 6) AS total_spend
  FROM orders GROUP BY o_custkey
)
SELECT custkey, n_orders, total_spend,
       round(percent_rank() OVER (ORDER BY total_spend, custkey), 6)
         AS spend_pct_rank,
       round(cume_dist() OVER (ORDER BY total_spend), 6) AS spend_cume_dist,
       round(percent_rank() OVER (ORDER BY n_orders, custkey), 6)
         AS orders_pct_rank
FROM spend
""",
)
def q_customer_spend_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position statistics (percent_rank / cume_dist)
    over per-customer spend — where each customer sits in the spend
    CDF, the ranking marketing segmentations are built from — restated
    over the DISTRIBUTED two-phase rank (operators/rank.py):
    percent_rank = (rank-1)/(n-1) under the custkey-tiebroken total
    order, cume_dist = (max rank within the tied spend value)/n (ties
    share a value by definition — a keyed max + join, still parallel).
    No single-partition WindowExec anywhere; the per-customer
    aggregate and every rank pass stay keyed and partitioned."""
    from sparktrends_spark.operators.rank import with_global_rank

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 6).alias("total_spend"),
    )
    ranked = with_global_rank(
        spend,
        [F.asc("total_spend"), F.asc("custkey")],
        rank_col="_is",
        total_col="_n",
    )
    mx = ranked.groupBy("total_spend").agg(F.max("_is").alias("_mx"))
    ranked = with_global_rank(
        ranked.join(mx, "total_spend"),
        [F.asc("n_orders"), F.asc("custkey")],
        rank_col="_io",
    )
    n = F.col("_n")
    pct = lambda i: F.when(n == 1, F.lit(0.0)).otherwise((i - 1) / (n - 1))  # noqa: E731
    return ranked.select(
        "custkey",
        "n_orders",
        "total_spend",
        F.round(pct(F.col("_is")), 6).alias("spend_pct_rank"),
        F.round(F.col("_mx") / n, 6).alias("spend_cume_dist"),
        F.round(pct(F.col("_io")), 6).alias("orders_pct_rank"),
    )


@query(
    "event_type_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, CAST(n AS BIGINT) AS n_transitions,
       round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
         AS p_next
FROM pairs
""",
)
def q_event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: for each user's
    time-ordered event stream, count (previous type -> next type)
    transitions and normalize rows into conditional probabilities —
    the Markov-chain input for session modeling and anomaly scoring
    (an impossible transition spike = instrumentation bug or abuse).

    Scale shape: ONE user-keyed window for lag (the stream is already
    per-user ordered after the exchange), a 25-cell aggregate, and a
    window over that tiny matrix for row normalization. Deterministic
    ordering ties break on event_id."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    row_total = F.sum("n_transitions").over(
        Window.partitionBy("prev_type")
    )
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / row_total.cast("double"), 6
        ).alias("p_next"),
    )


@query(
    "session_trigram_paths",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
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
),
tri AS (
  SELECT event_type AS step1,
         lead(event_type, 1) OVER s AS step2,
         lead(event_type, 2) OVER s AS step3
  FROM sess
  WINDOW s AS (PARTITION BY user_id, session_idx ORDER BY ts, event_id)
)
SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n
FROM tri WHERE step3 IS NOT NULL
GROUP BY step1, step2, step3
ORDER BY n DESC, step1, step2, step3
LIMIT 10
""",
)
def q_session_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining over sessionized clickstreams: the
    top-10 three-step event-type paths within 30-minute-gap sessions
    — the n-gram path-frequency op behind funnel discovery and
    next-action modeling, one level up from the single-step
    `event_type_transitions` matrix.

    Scale shape: ONE shuffle total — the trigram leads run over the
    sessionizer's own (user_id | ts, event_id) window and trigrams
    that cross a session boundary are filtered by comparing the led
    session_idx, so Catalyst plans a single Exchange + Sort feeding
    both Window stages (plan-asserted). Path counting is a
    map-side-combined hash agg on a domain bounded by |event_type|^3;
    the top-10 is a TakeOrderedAndProject. All strings/integers:
    bit-exact."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    s = sessionize(
        ev, ["user_id"], "ts", gap_seconds=1800, tiebreak_col="event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = s.select(
        F.col("event_type").alias("step1"),
        F.lead("event_type", 1).over(w).alias("step2"),
        F.lead("event_type", 2).over(w).alias("step3"),
        F.col("session_idx").alias("s1"),
        F.lead("session_idx", 2).over(w).alias("s3"),
    ).where(F.col("s3") == F.col("s1"))
    return (
        tri.groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "step1", "step2", "step3")
        .limit(10)
    )


@query(
    "user_scd2_versions",
    oracle="""
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, event_type,
         count(*) AS n
  FROM events GROUP BY 1, 2, 3
),
dominant AS (
  SELECT user_id, day, event_type FROM (
    SELECT *, row_number() OVER (
      PARTITION BY user_id, day ORDER BY n DESC, event_type ASC) AS rn
    FROM daily) WHERE rn = 1
),
changes AS (
  SELECT user_id, day, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY day) AS prev
  FROM dominant
),
versions AS (
  SELECT user_id, day AS valid_from, event_type
  FROM changes WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
         AS valid_to,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY valid_from)
         AS BIGINT) AS version_n
FROM versions
""",
)
def q_user_scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 construction — the warehouse
    verb the CDC apply/IVM queries consume downstream: derive each
    user's daily dominant event_type (deterministic argmax: count
    desc, type asc), collapse consecutive repeats (lag), and emit
    versioned validity intervals (valid_from, valid_to=next change,
    NULL = current) with a per-user version number.

    Three window passes ALL on the user_id partitioning — one
    exchange end-to-end after the daily aggregate; no floats anywhere,
    so the oracle is exact by construction. The interval output is
    as-of-joinable (operators/joins.py) for point-in-time enrichment.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    w_day = Window.partitionBy("user_id", "day").orderBy(
        F.desc("n"), F.asc("event_type")
    )
    dominant = (
        daily.withColumn("rn", F.row_number().over(w_day))
        .where(F.col("rn") == 1)
        .select("user_id", "day", "event_type")
    )
    w_u = Window.partitionBy("user_id").orderBy("day")
    changes = dominant.withColumn(
        "prev", F.lag("event_type").over(w_u)
    ).where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    w_v = Window.partitionBy("user_id").orderBy("day")
    return changes.select(
        "user_id",
        "event_type",
        F.col("day").alias("valid_from"),
        F.lead("day").over(w_v).alias("valid_to"),
        F.row_number().over(w_v).cast("bigint").alias("version_n"),
    )


@query(
    "session_engagement_summary",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id,
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
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS session_idx
  FROM seq
),
per AS (
  SELECT user_id, session_idx, count(*) AS depth,
         CAST(floor(epoch(max(ts))) AS BIGINT)
           - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_s
  FROM sess GROUP BY user_id, session_idx
)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       round(CAST(sum(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS bounce_rate,
       round(CAST(sum(depth) AS DOUBLE) / count(*), 6) AS avg_depth,
       round(quantile_cont(depth, 0.9), 4) AS p90_depth,
       round(quantile_cont(duration_s, 0.5), 4) AS p50_duration_s
FROM per
""",
)
def q_session_engagement_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement rollup over the gap sessionizer: session count,
    bounce rate (single-event sessions), average depth, p90 depth and
    median duration — the dashboard row a product team reads daily.
    All inputs exact integers (depths, floor-epoch durations); rates
    are deterministic divisions round-6; percentiles exact linear
    interpolation round-4. Same single user-keyed exchange as the
    graded event_sessions, one extra global aggregate over the
    per-session frame (|sessions| rows)."""
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(
        ev, ["user_id"], "ts", gap_seconds=1800, tiebreak_col="event_id"
    )
    per = s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("depth"),
        (
            F.unix_timestamp(F.max("ts").cast("timestamp"))
            - F.unix_timestamp(F.min("ts").cast("timestamp"))
        ).alias("duration_s"),
    )
    bounce = F.sum(F.when(F.col("depth") == 1, 1).otherwise(0))
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        bounce.cast("bigint").alias("n_bounces"),
        F.round(bounce.cast("double") / F.count(F.lit(1)), 6).alias(
            "bounce_rate"
        ),
        F.round(
            F.sum("depth").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_depth"),
        F.round(F.expr("percentile(depth, 0.9)"), 4).alias("p90_depth"),
        F.round(F.expr("percentile(duration_s, 0.5)"), 4).alias(
            "p50_duration_s"
        ),
    )
