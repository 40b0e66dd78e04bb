"""Relational operator breadth (SURVEY §2 "absent" surface) as named,
oracled queries over the TPC-H-ish testdata.

Covers: grouped aggregation (sum/avg/count/stddev/distinct), multi-way
joins with broadcast dims, sort + limit top-k, rollup/cube grouping
sets, semi/anti joins, set operations, ranking/lag/lead/ntile windows,
pivot, JSON extraction, dedup-keep-first, and as-of join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparktrends_spark.operators.joins import anti_join, as_of_join, enrich, semi_join
from sparktrends_spark.operators.setops import except_, intersect, union_distinct
from sparktrends_spark.operators.topk import global_top_k, top_k_per_group
from sparktrends_spark.plans.registry import query
from sparktrends_spark.sources.tables import load_table, maybe_broadcast, table_bytes


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregations


@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity)                                       AS sum_qty,
       sum(l_extendedprice)                                  AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount))               AS sum_disc_price,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
       avg(l_quantity)                                       AS avg_qty,
       avg(l_extendedprice)                                  AS avg_price,
       avg(l_discount)                                       AS avg_disc,
       count(*)                                              AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan -> filter (pushed to parquet) -> hash agg."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc).alias("sum_disc_price"),
            F.sum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "segment_stats",
    oracle="""
SELECT c_mktsegment,
       count(*)                     AS n_customers,
       count(DISTINCT c_nationkey)  AS n_nations,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(c_acctbal)
                                    AS avg_bal,
       round(stddev_samp(c_acctbal), 6) AS sd_bal,
       min(c_acctbal)               AS min_bal,
       max(c_acctbal)               AS max_bal,
       median(c_acctbal)            AS med_bal
FROM customer
GROUP BY c_mktsegment
""",
)
def q_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped stats incl. exact distinct count and exact median.

    Value discipline: avg is an exact decimal sum (acctbal is
    2-decimal) divided once; stddev has no exact form, so both sides
    round to 6 digits — raw double aggregates are addition-order-
    dependent and drift between engines."""
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("c_acctbal")
            ).alias("avg_bal"),
            F.round(F.stddev_samp("c_acctbal"), 6).alias("sd_bal"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            F.median("c_acctbal").alias("med_bal"),
        )
    )


@query(
    "brand_rollup",
    oracle="""
SELECT p_brand, p_type,
       count(*)            AS n_parts,
       avg(p_retailprice)  AS avg_price,
       GROUPING(p_brand, p_type) AS gid
FROM part
GROUP BY ROLLUP (p_brand, p_type)
""",
)
def q_brand_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: ROLLUP over (brand, type) with grouping id."""
    return (
        _t(spark, sf_dir, "part")
        .rollup("p_brand", "p_type")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.avg("p_retailprice").alias("avg_price"),
            F.grouping_id().alias("gid"),
        )
    )


@query(
    "status_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*)          AS n_orders,
       sum(o_totalprice) AS total_price,
       GROUPING(o_orderstatus, o_orderpriority) AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with grouping_id (SURVEY §2.5
    absent aggs): all 2^2 grouping-set combinations in one pass."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_price"),
            F.grouping_id().alias("gid"),
        )
    )


# ---------------------------------------------------------------------------
# Joins


@query(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       sum(l_extendedprice * (1 - l_discount)) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-15'
  AND l_shipdate  > TIMESTAMP '1998-06-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> joins -> agg -> top-k.

    Customer side is filtered then broadcast; lineitem (the 100 TB
    side) never shuffles for the join.
    """
    cutoff = F.lit("1998-06-15").cast("timestamp_ntz")
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    joined = li.join(
        # size-aware: orders/customer grow with scale — hint only under
        # the cap (locally identical); above it AQE picks the strategy
        maybe_broadcast(
            orders.join(
                maybe_broadcast(cust, table_bytes(sf_dir, "customer")),
                F.col("o_custkey") == F.col("c_custkey"),
            ),
            table_bytes(sf_dir, "orders", "customer"),
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    return global_top_k(
        agg.select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority"),
        [F.desc("revenue"), F.asc("l_orderkey")],
        k=10,
    )


@query(
    "q5_region_revenue",
    oracle="""
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
GROUP BY n_name
""",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join with every dimension broadcast.

    Revenue is summed as exact decimals (prices/discounts are
    2-decimal) and cast to double once at the end: a raw-double sum's
    value depends on addition order — partition layout on the Spark
    side, thread scheduling on the oracle side — and drifts 1 ULP
    between engines (caught by the round-8 exact-string sweep)."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    joined = (
        # size-aware hints: orders/customer/supplier all grow with
        # scale factor — locally (under the cap) the plan is identical
        # all-broadcast; at 100 TB the hints vanish and AQE chooses
        li.join(
            maybe_broadcast(orders, table_bytes(sf_dir, "orders")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            maybe_broadcast(
                cust.select("c_custkey", "c_nationkey", "n_name"),
                table_bytes(sf_dir, "customer"),
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            maybe_broadcast(supp, table_bytes(sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
    )
    return joined.groupBy("n_name").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
        )
        .cast("double")
        .alias("revenue")
    )


@query(
    "top_customers",
    oracle="""
SELECT c_custkey, c_name, sum(o_totalprice) AS total_spend, count(*) AS n_orders
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spend DESC, c_custkey
LIMIT 10
""",
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by revenue (§2.7): agg then orderBy+limit — plans
    as TakeOrderedAndProject, never a full sort."""
    agg = (
        _t(spark, sf_dir, "orders")
        .join(
            # customer grows with scale: size-aware hint (locally identical)
            maybe_broadcast(
                _t(spark, sf_dir, "customer").select("c_custkey", "c_name"),
                table_bytes(sf_dir, "customer"),
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum("o_totalprice").alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    return global_top_k(agg, [F.desc("total_spend"), F.asc("c_custkey")], k=10)


@query(
    "enrich_orders",
    oracle="""
SELECT o_orderkey, o_totalprice, c_name, n_name, r_name
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
""",
)
def q_enrich_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension enrichment chain, every dim broadcast (SURVEY §2.4)."""
    out = enrich(
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey"),
        on="o_custkey",
        how="inner",
    )
    out = enrich(
        out,
        _t(spark, sf_dir, "nation").withColumnRenamed("n_nationkey", "c_nationkey"),
        on="c_nationkey",
        how="inner",
    )
    out = enrich(
        out,
        _t(spark, sf_dir, "region").withColumnRenamed("r_regionkey", "n_regionkey"),
        on="n_regionkey",
        how="inner",
    )
    return out.select("o_orderkey", "o_totalprice", "c_name", "n_name", "r_name")


@query(
    "customers_with_orders",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (§2.4 absent): existence probe, no row fan-out,
    customer payload never duplicated."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return semi_join(cust, orders, on="c_custkey")


@query(
    "customers_without_orders",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (§2.4 absent): the complement probe — customers
    with no orders at all."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return anti_join(cust, orders, on="c_custkey")


@query(
    "events_to_orders_asof",
    oracle="""
WITH q AS (
  SELECT event_id, user_id AS k, ts, value
  FROM events WHERE event_type = 'purchase'
),
s AS (
  SELECT k, o_orderdate, max(o_totalprice) AS o_totalprice FROM (
    SELECT o_custkey % 15 AS k, o_orderdate, o_totalprice FROM orders
  ) GROUP BY k, o_orderdate
)
SELECT q.event_id, q.k, q.ts, q.value,
       s.o_orderdate AS asof_o_orderdate,
       s.o_totalprice AS asof_o_totalprice
FROM q ASOF LEFT JOIN s ON q.k = s.k AND s.o_orderdate <= q.ts
""",
)
def q_events_to_orders_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (nearest prior order per user bucket) — no PySpark
    builtin; union+window implementation (operators/joins.py)."""
    q = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", F.col("user_id").alias("k"), "ts", "value")
    )
    s = (
        _t(spark, sf_dir, "orders")
        .select(
            (F.col("o_custkey") % 15).alias("k"),
            "o_orderdate",
            "o_totalprice",
        )
        .groupBy("k", "o_orderdate")
        .agg(F.max("o_totalprice").alias("o_totalprice"))
    )
    return as_of_join(
        q,
        s,
        on=["k"],
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["o_orderdate", "o_totalprice"],
    ).select(
        "event_id", "k", "ts", "value", "asof_o_orderdate", "asof_o_totalprice"
    )


# ---------------------------------------------------------------------------
# Set operations


@query(
    "nation_setops",
    oracle="""
SELECT 'union' AS op, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'intersect' AS op, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'except' AS op, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT
  SELECT s_nationkey FROM supplier
)
""",
)
def q_nation_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (§2.8): UNION / INTERSECT / EXCEPT over derived
    nation key sets, tagged by operator."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    u = union_distinct(cust, supp).withColumn("op", F.lit("union"))
    i = intersect(cust, supp).withColumn("op", F.lit("intersect"))
    e = except_(cust, supp).withColumn("op", F.lit("except"))
    return u.unionByName(i).unionByName(e).select("op", "nationkey")


# ---------------------------------------------------------------------------
# Window functions


@query(
    "order_rank_window",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         rank()       OVER (PARTITION BY o_custkey ORDER BY round(o_totalprice, -2) DESC) AS rnk,
         dense_rank() OVER (PARTITION BY o_custkey ORDER BY round(o_totalprice, -2) DESC) AS drnk
  FROM orders
) WHERE rn <= 3
""",
)
def q_order_rank_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank per customer by order price (§2.6): classic
    ranking window, ties exercised by shared prices."""
    orders = _t(spark, sf_dir, "orders")
    w_rn = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_rnk = Window.partitionBy("o_custkey").orderBy(
        F.desc(F.round("o_totalprice", -2))
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w_rn).alias("rn"),
            F.rank().over(w_rnk).alias("rnk"),
            F.dense_rank().over(w_rnk).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "event_lag_lead",
    oracle="""
SELECT event_type, event_id, ts, value,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       value - lag(value) OVER w AS delta
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
""",
)
def q_event_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with defaults per user ordered by time (§2.6): gap
    deltas between consecutive events."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_type",
        "event_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "customer_ntiles",
    oracle="""
SELECT c_custkey, c_acctbal,
       ntile(4)       OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
""",
)
def q_customer_ntiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) wealth quartiles + distribution positions (§2.6),
    restated over the DISTRIBUTED two-phase rank (operators/rank.py)
    instead of unpartitioned windows: ntile/percent_rank/cume_dist are
    all closed forms of (global rank, total count) under a total order
    — (c_acctbal, c_custkey) has no ties — so the plan has no
    single-partition WindowExec and scales to any customer count."""
    from sparktrends_spark.operators.rank import (
        ntile_from_rank,
        with_global_rank,
    )

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked = with_global_rank(
        cust,
        [F.asc("c_acctbal"), F.asc("c_custkey")],
        rank_col="_i",
        total_col="_n",
    )
    i, n = F.col("_i"), F.col("_n")
    return ranked.select(
        "c_custkey",
        "c_acctbal",
        ntile_from_rank(i, n, 4).alias("quartile"),
        F.when(n == 1, F.lit(0.0))
        .otherwise((i - 1) / (n - 1))
        .alias("pct_rank"),
        (i / n).alias("cume"),
    )


# ---------------------------------------------------------------------------
# Pivot / JSON / dedup


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "user_event_pivot",
    oracle="""
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')    AS click,
       count(*) FILTER (WHERE event_type = 'error')    AS error,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS signup,
       count(*) FILTER (WHERE event_type = 'view')     AS view
FROM events GROUP BY user_id
""",
)
def q_user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type to columns per user (§2.5 absent): explicit
    value list so the plan is a single agg, no distinct-scan pass."""
    out = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return out.fillna(0, subset=_EVENT_TYPES)


@query(
    "event_json_stats",
    oracle="""
SELECT event_type,
       avg(CAST(json_extract_string(props, '$.k') AS DOUBLE))            AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS DOUBLE))            AS max_k,
       count(DISTINCT CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS n_k
FROM events GROUP BY event_type
""",
)
def q_event_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions over props per event type (F2 restated):
    get_json_object extraction + numeric aggregation."""
    k = F.get_json_object("props", "$.k").cast("double")
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.avg(k).alias("avg_k"),
            F.max(k).alias("max_k"),
            F.countDistinct(k).alias("n_k"),
        )
    )


@query(
    "event_dedup_first",
    oracle="""
SELECT user_id, event_type, event_id, ts, value FROM (
  SELECT e.*, row_number() OVER (
    PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events e
) WHERE rn = 1
""",
)
def q_event_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dropDuplicates-keep-earliest (exact dedup pattern)."""
    ev = _t(spark, sf_dir, "events")
    return top_k_per_group(
        ev, ["user_id", "event_type"], [F.asc("ts"), F.asc("event_id")], k=1
    ).select("user_id", "event_type", "event_id", "ts", "value")


@query(
    "returnflag_percentiles",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
       round(quantile_cont(l_discount, 0.25), 4) AS p25_discount,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_returnflag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile/median aggregation (SURVEY §2.5 absent list).

    ``percentile`` is exact with linear interpolation — same definition
    as DuckDB's quantile_cont. At 100 TB exact percentiles shuffle every
    value to its group; the scale substitute is approx_percentile
    (t-digest, bounded error) — exposed separately because its results
    are engine-specific by design.
    """
    li = _t(spark, sf_dir, "lineitem")
    # One percentile buffer per COLUMN, not per requested quantile:
    # percentile(col, array(...)) computes every quantile from one
    # value-counts buffer (identical interpolation code path), so the
    # price column is buffered/serialized once instead of twice —
    # that buffer is the whole cost of an exact percentile at scale.
    agg = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("_ep"),
        F.round(F.expr("percentile(l_discount, 0.25)"), 4).alias("p25_discount"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        "l_returnflag",
        F.round(F.col("_ep")[0], 4).alias("median_price"),
        F.round(F.col("_ep")[1], 4).alias("p90_price"),
        "p25_discount",
        "n",
    )


@query(
    "segment_priority_arrays",
    oracle="""
SELECT c_mktsegment,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def q_segment_priority_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set + countDistinct aggregation (SURVEY §2.5 absent list).

    The distinct-set is serialized sorted-CSV so both engines hash the
    same value. Join side: customer is the small dimension -> broadcast,
    orders never shuffles.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("o_orderpriority"))).alias(
                "priorities"
            ),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "event_window_range_join",
    oracle="""
WITH w AS (
  SELECT CAST(d AS TIMESTAMP) - INTERVAL 1 DAY AS w_start,
         CAST(d AS TIMESTAMP) + INTERVAL 2 DAY AS w_end,
         CAST(d AS TIMESTAMP) AS w_day
  FROM generate_series(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY) AS t(d)
)
SELECT w_day, count(*) AS n_events, round(avg(value), 4) AS avg_value
FROM events JOIN w ON ts >= w_start AND ts < w_end
GROUP BY w_day
""",
)
def q_event_window_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: events into *overlapping* 3-day windows —
    a true non-equi join, not expressible as date truncation (each event
    lands in up to 3 windows).

    Plan shape: the window table is 30 rows -> broadcast nested-loop
    with the range predicate; the events side streams through without a
    shuffle. At 100 TB the windows side stays tiny, so this remains the
    right plan; for large-x-large range joins, bin both sides to buckets
    and equi-join on bucket (events_to_orders_asof shows the pattern).
    """
    ev = _t(spark, sf_dir, "events")
    w = spark.sql(
        """
        SELECT w_start, w_start + INTERVAL 3 DAY AS w_end,
               cast(w_start + INTERVAL 1 DAY AS timestamp_ntz) AS w_day
        FROM (
          SELECT explode(sequence(
            timestamp'2023-12-31 00:00:00', timestamp'2024-01-29 00:00:00',
            INTERVAL 1 DAY)) AS w_start
        )
        """
    )
    return (
        ev.join(
            F.broadcast(w),
            (ev.ts >= w.w_start) & (ev.ts < w.w_end),
        )
        .groupBy("w_day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


@query(
    "customer_reconciliation_outer",
    oracle="""
WITH rich AS (
  SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000
),
active AS (
  SELECT o_custkey, count(*) AS n_orders
  FROM orders GROUP BY o_custkey HAVING count(*) >= 3
)
SELECT coalesce(c_custkey, o_custkey) AS custkey,
       c_acctbal, n_orders,
       (c_custkey IS NOT NULL) AS is_rich,
       (o_custkey IS NOT NULL) AS is_active
FROM rich FULL OUTER JOIN active ON c_custkey = o_custkey
""",
)
def q_customer_reconciliation_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (SURVEY §2.4 absent list): reconcile two customer
    subsets with mismatches on both sides. Shuffle join on custkey —
    outer joins can't broadcast either side without losing rows."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 9000).select("c_custkey", "c_acctbal")
    active = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 3)
    )
    j = rich.join(active, rich.c_custkey == active.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_acctbal",
        "n_orders",
        F.col("c_custkey").isNotNull().alias("is_rich"),
        F.col("o_custkey").isNotNull().alias("is_active"),
    )


@query(
    "priority_approx_distinct",
    oracle="""
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS exact_customers,
       count(*)                  AS n_orders,
       TRUE                      AS approx_in_bound
FROM orders
GROUP BY o_orderpriority
""",
)
def q_priority_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++, SURVEY §2.5 absent list),
    value-bounded against the exact count IN the query: sketch
    estimates are engine-specific (DuckDB's approx HLL differs), so
    the raw estimate can never value-hash across engines — instead the
    query emits ``approx_in_bound`` = |approx - exact| / exact <=
    5 * rsd, and the oracle states it as literal TRUE. The driver's
    value-hash therefore FAILS if Spark's sketch ever drifts outside
    the rsd-derived envelope (5 sigma at rsd=0.02 -> 10% relative
    error; HLL++ is exact in sparse mode at these cardinalities, so
    the observed error is ~0). The test suite additionally bounds the
    raw estimate at 3 sigma and prints the observed error."""
    o = _t(spark, sf_dir, "orders")
    rsd = 0.02
    agg = o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=rsd).alias("_approx"),
        F.countDistinct("o_custkey").alias("exact_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    err = F.abs(F.col("_approx") - F.col("exact_customers")) / F.col(
        "exact_customers"
    )
    return agg.select(
        "o_orderpriority",
        "exact_customers",
        "n_orders",
        (err <= F.lit(5 * rsd)).alias("approx_in_bound"),
    )


@query(
    "order_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders, sum(o_totalprice) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def q_order_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SURVEY §2.5 absent list) — the general
    form cube/rollup specialize: three aggregation granularities in one
    pass (Expand + single shuffle, not three scans)."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders, sum(o_totalprice) AS total_price
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "event_window_binned_join",
    oracle="""
WITH w AS (
  SELECT CAST(d AS TIMESTAMP) - INTERVAL 1 DAY AS w_start,
         CAST(d AS TIMESTAMP) + INTERVAL 2 DAY AS w_end,
         CAST(d AS TIMESTAMP) AS w_day
  FROM generate_series(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY) AS t(d)
)
SELECT w_day, count(*) AS n_events, round(avg(value), 4) AS avg_value
FROM events JOIN w ON ts >= w_start AND ts < w_end
GROUP BY w_day
""",
)
def q_event_window_binned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same interval join as event_window_range_join, via the binned
    equi-join strategy (operators/joins.interval_join): explode each
    interval to the hour-buckets it overlaps, equi-join on bucket, then
    exact-filter. This is the large-x-large plan — no nested loop, one
    bucket-keyed shuffle — verified equal to the broadcast-NLJ variant
    by sharing its oracle."""
    from sparktrends_spark.operators.joins import interval_join

    ev = _t(spark, sf_dir, "events")
    w = spark.sql(
        """
        SELECT w_start,
               w_start + INTERVAL 3 DAY - INTERVAL 1 MICROSECOND AS w_end,
               cast(w_start + INTERVAL 1 DAY AS timestamp_ntz) AS w_day
        FROM (
          SELECT explode(sequence(
            timestamp'2023-12-31 00:00:00', timestamp'2024-01-29 00:00:00',
            INTERVAL 1 DAY)) AS w_start
        )
        """
    )
    joined = interval_join(
        ev, w, point_ts="ts", interval_lo="w_start", interval_hi="w_end",
        bucket_seconds=86400,
    )
    return joined.groupBy("w_day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


@query(
    "orders_above_customer_avg",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 1.5 * (
  SELECT avg(o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
""",
)
def q_orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (SURVEY §4 'subquery decorrelation'):
    Catalyst rewrites the per-row subquery into one aggregate + join —
    verify with .explain: a single Aggregate on o_custkey, no
    re-evaluation per outer row."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_orders_corr")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM _orders_corr o
        WHERE o_totalprice > 1.5 * (
          SELECT avg(o_totalprice) FROM _orders_corr o2
          WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "user_first_last_event",
    oracle="""
SELECT DISTINCT user_id,
       first_value(value) OVER w AS first_value_of_day,
       last_value(value) OVER w AS last_value_of_day,
       nth_value(value, 2) OVER w AS second_value,
       count(*) OVER (PARTITION BY user_id) AS n_events
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
""",
)
def q_user_first_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value window functions (SURVEY
    §2.6 absent list) with a deterministic (ts, event_id) order and an
    unbounded frame."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wc = Window.partitionBy("user_id")
    return ev.select(
        "user_id",
        F.first("value").over(w).alias("first_value_of_day"),
        F.last("value").over(w).alias("last_value_of_day"),
        F.nth_value("value", 2).over(w).alias("second_value"),
        F.count(F.lit(1)).over(wc).alias("n_events"),
    ).distinct()


@query(
    "pricing_decimal_summary",
    oracle="""
SELECT l_returnflag,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 4)))
            AS DECIMAL(38, 4)) AS VARCHAR) AS exact_revenue,
       CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(18, 4)))
            AS DECIMAL(38, 4)) AS VARCHAR) AS exact_discounted,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_pricing_decimal_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL aggregation (SURVEY §1.2: decimal unused by the
    reference, exposed by the engine). Unlike double sums, decimal sums
    are order-independent — no rounding tolerance needed. Both engines
    emit the DECIMAL(38,4) total as its canonical string because
    DuckDB's pandas bridge renders every DECIMAL as float64, which can
    never hash-match a true decimal; the string form keeps the
    comparison bit-for-bit exact."""
    li = _t(spark, sf_dir, "lineitem")
    price_dec = F.col("l_extendedprice").cast("decimal(18,4)")
    disc_dec = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return li.groupBy("l_returnflag").agg(
        F.sum(price_dec)
        .cast("decimal(38,4)")
        .cast("string")
        .alias("exact_revenue"),
        F.sum(disc_dec)
        .cast("decimal(38,4)")
        .cast("string")
        .alias("exact_discounted"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "user_retention_cohorts",
    oracle="""
WITH weeks AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS w
  FROM events
),
first AS (SELECT user_id, min(w) AS cohort_week FROM weeks GROUP BY user_id),
act AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', CAST(f.cohort_week AS DATE), CAST(weeks.w AS DATE)) / 7 AS INTEGER) AS week_offset,
         weeks.user_id
  FROM weeks JOIN first f USING (user_id)
),
per AS (
  SELECT cohort_week, week_offset, count(*) AS n_active
  FROM act GROUP BY cohort_week, week_offset
),
sizes AS (SELECT cohort_week, count(*) AS cohort_size FROM first GROUP BY cohort_week)
SELECT cohort_week, week_offset, n_active, cohort_size,
       round(n_active / CAST(cohort_size AS DOUBLE), 6) AS retention
FROM per JOIN sizes USING (cohort_week)
""",
)
def q_user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle — the product-analytics staple: users
    cohorted by first-active ISO week, and for each (cohort, week
    offset) the fraction of the cohort still active.

    Scale shape: one distinct over (user, week) — the only pass over
    raw events — then everything downstream is user- or cohort-sized.
    The cohort-size frame is tiny (one row per week) and broadcasts
    onto the per-offset counts."""
    ev = _t(spark, sf_dir, "events")
    weeks = (
        ev.select(
            "user_id",
            F.date_trunc("week", F.col("ts")).alias("w"),
        )
        .distinct()
    )
    first = weeks.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    act = weeks.join(first, "user_id").select(
        "cohort_week",
        (F.datediff(F.col("w").cast("date"), F.col("cohort_week").cast("date")) / 7)
        .cast("int")
        .alias("week_offset"),
        "user_id",
    )
    per = act.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return per.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size").cast("double"), 6).alias(
            "retention"
        ),
    )


@query(
    "customer_rfm_segments",
    oracle="""
WITH mx AS (SELECT max(o_orderdate) AS anchor FROM orders),
rfm AS (
  SELECT o_custkey AS custkey,
         date_diff('day', max(o_orderdate), (SELECT anchor FROM mx)) AS recency_days,
         count(*) AS frequency,
         round(sum(o_totalprice), 2) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT custkey, recency_days, frequency, monetary,
         ntile(5) OVER (ORDER BY recency_days DESC, custkey) AS r_score,
         ntile(5) OVER (ORDER BY frequency ASC, custkey) AS f_score,
         ntile(5) OVER (ORDER BY monetary ASC, custkey) AS m_score
  FROM rfm
)
SELECT custkey, recency_days, frequency, monetary, r_score, f_score, m_score,
       CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
            WHEN r_score >= 4 THEN 'recent'
            WHEN f_score >= 4 THEN 'loyal_lapsing'
            WHEN r_score <= 2 AND f_score <= 2 THEN 'at_risk'
            ELSE 'regular' END AS segment
FROM scored
""",
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) quintile segmentation — the
    classic marketing-analytics operator: per-customer order stats
    scored into quintiles and bucketed into named segments.

    Each quintile is the DISTRIBUTED two-phase rank + the closed-form
    ntile (operators/rank.py) over the per-customer aggregate — three
    range-partitioned rank passes, zero single-partition windows, so
    the segmentation scales to any customer count; ties break on
    custkey so both engines assign identical quintiles."""
    from sparktrends_spark.caching import persist_tracked
    from sparktrends_spark.operators.rank import (
        ntile_from_rank,
        with_global_rank,
    )

    o = _t(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("anchor"))
    rfm = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .join(F.broadcast(anchor))
        .select(
            "custkey",
            F.datediff(F.col("anchor"), F.col("_last")).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    # three rank passes over the SAME customer frame: persist it once
    scored = persist_tracked(rfm)
    for out_col, order in [
        ("r_score", [F.desc("recency_days"), F.asc("custkey")]),
        ("f_score", [F.asc("frequency"), F.asc("custkey")]),
        ("m_score", [F.asc("monetary"), F.asc("custkey")]),
    ]:
        scored = with_global_rank(
            scored, order, rank_col="_i", total_col="_n"
        ).withColumn(
            out_col, ntile_from_rank(F.col("_i"), F.col("_n"), 5)
        ).drop("_i", "_n")
    scored = scored.select(
        "custkey", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score",
    )
    seg = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion")
        .when(F.col("r_score") >= 4, "recent")
        .when(F.col("f_score") >= 4, "loyal_lapsing")
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "at_risk")
        .otherwise("regular")
    )
    return scored.withColumn("segment", seg)


@query(
    "event_stats_skipping_scan",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS total_value
FROM events
WHERE user_id BETWEEN 3 AND 9 AND value BETWEEN 50 AND 250
GROUP BY event_type
""",
)
def q_event_stats_skipping_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME rectangle aggregate through the explicit data-skipping
    reader (`layout.scan_pruned`): per-file footer min/max envelopes —
    the statistics a Delta/Iceberg manifest caches — select the file
    subset that can contain matching rows BEFORE Spark plans the scan,
    and the exact predicate filters the survivors. Shares
    `event_zorder_rectangle`'s oracle (plain semantics over the
    original table) so the graded row proves file-level skipping is
    lossless; `tests/test_partition_pruning.py` asserts it actually
    reads fewer files on the Z-ordered layout."""
    import os

    from sparktrends_spark.sources.layout import scan_pruned, zorder_write

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    dest = os.path.join(
        "/tmp/sparktrends_zorder",
        os.path.basename(sf_dir.rstrip("/")) or "sf",
        "events_skip",
    )
    zorder_write(events, ["user_id", "value"], dest, n_files=8)
    return (
        scan_pruned(
            spark, dest, {"user_id": (3, 9), "value": (50.0, 250.0)}
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


@query(
    "event_zorder_rectangle",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS total_value
FROM events
WHERE user_id BETWEEN 3 AND 9 AND value BETWEEN 50 AND 250
GROUP BY event_type
""",
)
def q_event_zorder_rectangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangle predicate over a Z-order-clustered copy of events
    (`sources/layout.py`): rewrite the table clustered on the Morton
    curve over (user_id, value), then scan with both range filters.
    The oracle states plain semantics over the ORIGINAL table, so the
    graded plan proves the layout rewrite is lossless byte-for-byte.

    Scale shape: the rewrite is one range-partition + local sort on a
    pure-JVM bitwise key; the read-back scan pushes BOTH predicates
    into parquet (PushedFilters) and the Morton clustering keeps each
    file's min/max envelope tight on BOTH columns, so most files are
    skipped before any row is read — tested mechanically in
    tests/test_partition_pruning.py."""
    import os

    from sparktrends_spark.sources.layout import zorder_write

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    dest = os.path.join(
        "/tmp/sparktrends_zorder",
        os.path.basename(sf_dir.rstrip("/")) or "sf",
        "events",
    )
    zorder_write(events, ["user_id", "value"], dest, n_files=8)
    return (
        spark.read.parquet(dest)
        .filter(
            (F.col("user_id").between(3, 9))
            & (F.col("value").between(50, 250))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


@query(
    "order_cdc_state",
    oracle="""
WITH b0 AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 4 IN (0, 1)
),
b1 AS (
  SELECT o_orderkey, round(o_totalprice + 1.0, 2) AS o_totalprice
  FROM orders WHERE o_orderkey % 4 IN (1, 2)
),
dels AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderkey % 4 IN (0, 1, 2) AND o_orderstatus = 'F'
    AND o_orderkey % 10 = 0
),
live AS (
  SELECT COALESCE(b1.o_orderkey, b0.o_orderkey) AS o_orderkey,
         COALESCE(b1.o_totalprice, b0.o_totalprice) AS o_totalprice
  FROM b0 FULL OUTER JOIN b1 ON b0.o_orderkey = b1.o_orderkey
)
SELECT CAST(count(*) AS BIGINT) AS n_live,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            AS DECIMAL(20,2)) AS VARCHAR) AS total_value,
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(max(o_orderkey) AS BIGINT) AS max_key
FROM live WHERE o_orderkey NOT IN (SELECT o_orderkey FROM dels)
""",
)
def q_order_cdc_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changefeed apply graded end-to-end
    (`streaming/sinks.py:apply_cdc_bucketed`): three Debezium-shaped
    batches — inserts (keys ≡ 0,1 mod 4), updates overwriting
    overlapping keys with price+1 (keys ≡ 1,2 mod 4), then deletes of
    finished orders with key ≡ 0 mod 10 — merge into a bucketed upsert
    table under last-writer-wins with tombstones physically removing
    their keys (O(touched buckets) per batch). The oracle restates the
    final state relationally (full outer join of the two write sets,
    minus the delete set), so the graded row proves insert/update/
    delete resolution AND that deletes actually removed rows."""
    import os

    from sparktrends_spark.streaming.sinks import (
        apply_cdc_bucketed,
        read_upserted,
    )

    dest = os.path.join(
        "/tmp/sparktrends_cdc",
        os.path.basename(sf_dir.rstrip("/")) or "sf",
        "orders",
    )
    if os.path.isdir(dest):
        import shutil

        shutil.rmtree(dest)
    orders = _t(spark, sf_dir, "orders")
    b0 = orders.filter(F.col("o_orderkey") % 4 <= 1).select(
        "o_orderkey", "o_totalprice", F.lit("c").alias("op")
    )
    b1 = orders.filter(
        (F.col("o_orderkey") % 4 >= 1) & (F.col("o_orderkey") % 4 <= 2)
    ).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") + 1.0, 2).alias("o_totalprice"),
        F.lit("u").alias("op"),
    )
    b2 = orders.filter(
        (F.col("o_orderkey") % 4 <= 2)
        & (F.col("o_orderstatus") == "F")
        & (F.col("o_orderkey") % 10 == 0)
    ).select(
        "o_orderkey",
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit("d").alias("op"),
    )
    for version, batch in enumerate([b0, b1, b2]):
        apply_cdc_bucketed(
            batch, dest, keys=("o_orderkey",), n_buckets=16, version=version
        )
    # decimal sum: exact and aggregation-order-independent, so the
    # value hash cannot drift with partitioning (float sums can)
    return read_upserted(spark, dest).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_live"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(20,2)")
        .cast("string")
        .alias("total_value"),
        F.min("o_orderkey").cast("bigint").alias("min_key"),
        F.max("o_orderkey").cast("bigint").alias("max_key"),
    )


@query(
    "order_status_ivm",
    oracle="""
WITH b0 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 4 IN (0, 1)
),
b1 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 8 = 1 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         round(o_totalprice + 1.0, 2) AS o_totalprice
  FROM orders WHERE o_orderkey % 4 IN (1, 2)
),
dels AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderkey % 4 IN (0, 1, 2) AND o_orderstatus = 'F'
    AND o_orderkey % 10 = 0
),
live AS (
  SELECT COALESCE(b1.o_orderkey, b0.o_orderkey) AS o_orderkey,
         COALESCE(b1.o_orderstatus, b0.o_orderstatus) AS o_orderstatus,
         COALESCE(b1.o_totalprice, b0.o_totalprice) AS o_totalprice
  FROM b0 FULL OUTER JOIN b1 ON b0.o_orderkey = b1.o_orderkey
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            AS DECIMAL(20,2)) AS VARCHAR) AS total_price
FROM live WHERE o_orderkey NOT IN (SELECT o_orderkey FROM dels)
GROUP BY o_orderstatus
""",
)
def q_order_status_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance graded end-to-end
    (`streaming/ivm.py`): the same three Debezium-shaped batches as
    order_cdc_state — plus UPDATES THAT MOVE ROWS BETWEEN GROUPS
    (keys ≡ 1 mod 8 flip status to 'X') — maintain a per-status
    (count, exact decimal sum) aggregate via the counting algebra:
    -old/+new contributions per change, old values fetched by
    bucket-pruned point reads, never a base-table rescan. The oracle
    recomputes the aggregate from the final live state relationally,
    so the graded row proves delta accumulation across the three
    batches lands exactly on recomputation — including the group that
    appears mid-stream ('X') and groups shrunk by tombstones."""
    import os
    import shutil

    from sparktrends_spark.streaming.ivm import maintain_agg_cdc
    from sparktrends_spark.streaming.sinks import read_upserted

    root = os.path.join(
        "/tmp/sparktrends_ivm", os.path.basename(sf_dir.rstrip("/")) or "sf"
    )
    base, agg = os.path.join(root, "orders"), os.path.join(root, "status_agg")
    if os.path.isdir(root):
        shutil.rmtree(root)
    orders = _t(spark, sf_dir, "orders")
    b0 = orders.filter(F.col("o_orderkey") % 4 <= 1).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", F.lit("c").alias("op")
    )
    b1 = orders.filter(
        (F.col("o_orderkey") % 4 >= 1) & (F.col("o_orderkey") % 4 <= 2)
    ).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 8 == 1, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.round(F.col("o_totalprice") + 1.0, 2).alias("o_totalprice"),
        F.lit("u").alias("op"),
    )
    b2 = orders.filter(
        (F.col("o_orderkey") % 4 <= 2)
        & (F.col("o_orderstatus") == "F")
        & (F.col("o_orderkey") % 10 == 0)
    ).select(
        "o_orderkey",
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit("d").alias("op"),
    )
    for version, batch in enumerate([b0, b1, b2]):
        maintain_agg_cdc(
            batch,
            base,
            agg,
            keys=("o_orderkey",),
            group_col="o_orderstatus",
            value_col="o_totalprice",
            version=version,
        )
    return read_upserted(spark, agg).select(
        "o_orderstatus",
        F.col("n_rows").cast("bigint").alias("n_orders"),
        F.col("total").cast("string").alias("total_price"),
    )


@query(
    "order_status_ivm_small_batches",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            AS DECIMAL(20,2)) AS VARCHAR) AS total_price
FROM (
  SELECT CASE WHEN o_orderkey % 997 = 2 THEN 'X'
              ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 997 = 1 THEN round(o_totalprice + 1.0, 2)
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 997 != 3
)
GROUP BY o_orderstatus
""",
)
def q_order_status_ivm_small_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM at its DESIGN POINT: one large committed base (the whole
    orders table as batch 0), then three O(batch) delta batches each
    touching ~0.1% of the keys (residues mod 997) — a value update, a
    group-moving update (status -> 'X'), and deletes. The graded
    order_status_ivm fixture makes every batch table-sized, so its
    cost row can't show the O(delta) win the counting algebra exists
    for; here maintenance per batch reads ONLY the touched buckets'
    old rows (bucket-pruned point reads) and shuffles ~150 rows at
    sf0.1 against a 150k-row base — maintenance vs full-recompute
    timings recorded in BENCH_NOTES.md. The oracle recomputes the
    final aggregate from the equivalent live state relationally."""
    import os
    import shutil

    from sparktrends_spark.streaming.ivm import maintain_agg_cdc
    from sparktrends_spark.streaming.sinks import read_upserted

    root = os.path.join(
        "/tmp/sparktrends_ivm_small",
        os.path.basename(sf_dir.rstrip("/")) or "sf",
    )
    base, agg = os.path.join(root, "orders"), os.path.join(root, "status_agg")
    if os.path.isdir(root):
        shutil.rmtree(root)
    orders = _t(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    b0 = orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", F.lit("c").alias("op")
    )
    d1 = orders.filter(key % 997 == 1).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") + 1.0, 2).alias("o_totalprice"),
        F.lit("u").alias("op"),
    )
    d2 = orders.filter(key % 997 == 2).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        "o_totalprice",
        F.lit("u").alias("op"),
    )
    d3 = orders.filter(key % 997 == 3).select(
        "o_orderkey",
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit("d").alias("op"),
    )
    for version, batch in enumerate([b0, d1, d2, d3]):
        maintain_agg_cdc(
            batch,
            base,
            agg,
            keys=("o_orderkey",),
            group_col="o_orderstatus",
            value_col="o_totalprice",
            version=version,
        )
    return read_upserted(spark, agg).select(
        "o_orderstatus",
        F.col("n_rows").cast("bigint").alias("n_orders"),
        F.col("total").cast("string").alias("total_price"),
    )


@query(
    "event_optimize_roundtrip",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS total_value
FROM events
WHERE user_id BETWEEN 3 AND 9 AND value BETWEEN 50 AND 250
GROUP BY event_type
""",
)
def q_event_optimize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full OPTIMIZE maintenance verb graded end-to-end
    (`sources/optimize.py`): scatter events across 32 small files (the
    streaming-sink failure mode), run one `optimize_table` call —
    Z-order-clustered compaction + footer-stats manifest + Bloom
    sidecar — then answer the rectangle aggregate THROUGH the
    stats-skipping reader over the optimized layout. The oracle states
    plain semantics over the original table, so the graded row proves
    the whole rewrite-and-index cycle is lossless. Scale shape: one
    shuffle for the clustered rewrite, O(files) index build (a
    write-time hook in a deployment), pruned IO forever after."""
    import os
    import shutil

    from sparktrends_spark.sources.layout import scan_pruned
    from sparktrends_spark.sources.optimize import optimize_table

    dest = os.path.join(
        "/tmp/sparktrends_optimize",
        os.path.basename(sf_dir.rstrip("/")) or "sf",
        "events",
    )
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    events.repartition(32).write.parquet(dest)
    spark.catalog.refreshByPath(dest)
    optimize_table(
        spark,
        dest,
        zorder_cols=["user_id", "value"],
        bloom_cols=["event_id"],
        target_file_bytes=256 * 1024,
    )
    return (
        scan_pruned(spark, dest, {"user_id": (3, 9), "value": (50.0, 250.0)})
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


@query(
    "event_upsert_optimize_concurrent",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN event_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_updated,
       CAST(sum(CAST(value AS DECIMAL(18,2))
                + (CASE WHEN event_id % 97 = 0 THEN 1000 ELSE 0 END))
            AS DOUBLE) AS total_value,
       CAST(min(event_id) AS BIGINT) AS min_id,
       CAST(max(event_id) AS BIGINT) AS max_id
FROM events
""",
)
def q_event_upsert_optimize_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintenance-vs-writer race graded end-to-end
    (`sources/optimize.optimize_upsert_table` + the manifest-lock CAS
    in `streaming/sinks.py`): load events into a bucketed upsert
    table, then run OPTIMIZE while a concurrent batch (+1000 to every
    event_id % 97 == 0 row) commits BETWEEN a bucket's compaction
    rewrite and its CAS — the exact schedule that loses committed rows
    without the CAS. The raced bucket's compaction is discarded, the
    batch's writes win, remaining buckets compact. The oracle states
    the final table in plain SQL over the source, so the graded row
    proves no committed row (or update) was lost or duplicated.
    Value discipline: decimal-exact sum, double once at the end."""
    import os
    import shutil

    from sparktrends_spark.sources.optimize import optimize_upsert_table
    from sparktrends_spark.streaming.sinks import (
        read_upserted,
        upsert_parquet_bucketed,
    )

    dest = os.path.join(
        "/tmp/sparktrends_optimize",
        os.path.basename(sf_dir.rstrip("/")) or "sf",
        "events_upsert",
    )
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    upsert_parquet_bucketed(
        events, dest, keys=("event_id",), n_buckets=16, version=0
    )
    update = events.filter(F.col("event_id") % 97 == 0).withColumn(
        "value", F.col("value") + F.lit(1000.0)
    )
    raced: list = []

    def commit_update_mid_optimize(_bucket):
        if not raced:
            raced.append(_bucket)
            upsert_parquet_bucketed(
                update, dest, keys=("event_id",), n_buckets=16, version=1
            )

    optimize_upsert_table(
        spark, dest, on_before_commit=commit_update_mid_optimize
    )
    return read_upserted(spark, dest).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(
            F.when(F.col("event_id") % 97 == 0, 1).otherwise(0)
        ).cast("bigint").alias("n_updated"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
        F.min("event_id").cast("bigint").alias("min_id"),
        F.max("event_id").cast("bigint").alias("max_id"),
    )


_PR_ITERS = 5
_PR_DAMPING = 0.85
_PR_N = 25  # TPC-H nation is fixed at 25 rows at every SF


def _pagerank_oracle() -> str:
    """Unrolled 5-iteration PageRank as chained CTEs — the SQL
    restatement of operators/pagerank.py, ops in the identical IEEE
    order (rank * (w/ow), round-12 per iteration) so ranks are
    bit-identical."""
    base = repr((1.0 - _PR_DAMPING) / _PR_N)
    d = repr(_PR_DAMPING)
    r0 = repr(1.0 / _PR_N)
    steps = []
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        steps.append(f"""
r{i} AS (
  SELECT n.node,
         round({base} + {d} * coalesce(s.s, 0.0), 12) AS rank
  FROM nodes n LEFT JOIN (
    SELECT ew.dst AS node,
           sum(r.rank * ew.nw) AS s
    FROM ew JOIN {prev} r ON r.node = ew.src
    GROUP BY ew.dst) s USING (node)
)""")
        prev = f"r{i}"
    chain = ",".join(steps)
    return f"""
WITH nodes AS (SELECT n_nationkey AS node FROM nation),
e AS (
  SELECT c_nationkey AS src, s_nationkey AS dst,
         CAST(count(*) AS BIGINT) AS w
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey  = c_custkey
  JOIN supplier ON l_suppkey  = s_suppkey
  GROUP BY 1, 2
),
ow AS (SELECT src, sum(w) AS ow FROM e GROUP BY src),
ew AS (
  SELECT e.src, e.dst,
         CAST(e.w AS DOUBLE) / CAST(ow.ow AS DOUBLE) AS nw
  FROM e JOIN ow USING (src)
),
r0 AS (SELECT node, {r0} AS rank FROM nodes),{chain}
SELECT node, round(rank, 6) AS rank FROM {prev}
"""


@query("nation_pagerank", oracle=_pagerank_oracle())
def q_nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation trade graph (customer-nation
    -> supplier-nation edges weighted by lineitem count), 5 synchronous
    iterations via operators/pagerank.py — the iterative-graph family
    next to connected components, with a FULL value oracle (the
    iterations unroll into chained CTEs). Per-iteration round-12 keeps
    the addition-order-dependent contribution sums bit-identical
    across engines; output rounds to 6. Scale shape: one dst-keyed
    shuffle + one src equi-join per iteration, edges never collected,
    lineage cut per step."""
    from sparktrends_spark.operators.pagerank import pagerank

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    nodes = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    ranks = pagerank(
        nodes, edges, iterations=_PR_ITERS, damping=_PR_DAMPING
    )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


@query(
    "order_upsert_schema_evolution",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_priority,
       CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_priority,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
""",
)
def q_order_upsert_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert schema evolution graded end-to-end
    (`streaming/sinks._evolved_schema`): batch v0 writes half of orders
    WITHOUT the priority column; batch v1 writes the other half WITH it
    (an ADDED column) — since both halves hash into the same buckets,
    v1's merge reads v0's narrow leaves through the evolved schema and
    every reader thereafter nulls the column for v0 rows. The oracle
    states the expected final table from the source in plain SQL, so
    the graded row proves no row, value, or column was lost across the
    evolution. Decimal-exact price sum; double once at the end."""
    import os
    import shutil

    from sparktrends_spark.streaming.sinks import (
        read_upserted,
        upsert_parquet_bucketed,
    )

    dest = os.path.join(
        "/tmp/sparktrends_optimize",
        os.path.basename(sf_dir.rstrip("/")) or "sf",
        "orders_evolution",
    )
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    orders = load_table(spark, sf_dir, "orders")
    v0 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    v1 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    upsert_parquet_bucketed(v0, dest, keys=("o_orderkey",), n_buckets=8, version=0)
    upsert_parquet_bucketed(v1, dest, keys=("o_orderkey",), n_buckets=8, version=1)
    final = read_upserted(spark, dest)
    return final.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(
            F.when(F.col("o_orderpriority").isNotNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_with_priority"),
        F.sum(
            F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_null_priority"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


@query(
    "event_bloom_point_lookup",
    oracle="""
SELECT CAST(event_id AS BIGINT) AS event_id, user_id, event_type,
       round(value, 6) AS value
FROM events WHERE event_id IN (1, 42, 777)
""",
)
def q_event_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup through the per-file Bloom index
    (`sources/bloom.py`): copy events id-shuffled into 16 files (every
    file's min/max envelope spans the whole id domain — range stats
    prune NOTHING), build the Bloom sidecar once, then read only the
    files whose filter accepts a probed id. Zero false negatives by
    construction; the oracle states plain IN semantics over the
    original table, so the graded row proves the pruned read is
    lossless. Scale shape: the index build is one projected pass per
    file (a write-time hook in a deployment), the probe is a sidecar
    read + k md5s per (file, value) on the driver — no data IO for
    rejected files. This is the lookup shape a 100 TB event store
    needs for "find these 3 events" without partitioning by id."""
    import os

    from sparktrends_spark.sources.bloom import build_bloom_index, scan_bloom

    dest = os.path.join(
        "/tmp/sparktrends_bloom",
        os.path.basename(sf_dir.rstrip("/")) or "sf",
        "events",
    )
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    events.repartition(16, "event_id").write.mode("overwrite").parquet(dest)
    spark.catalog.refreshByPath(dest)
    build_bloom_index(dest, "event_id")
    return scan_bloom(spark, dest, "event_id", [1, 42, 777]).select(
        F.col("event_id").cast("bigint").alias("event_id"),
        "user_id",
        "event_type",
        F.round("value", 6).alias("value"),
    )


@query(
    "event_targeted_delete",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       round(sum(value), 6) AS total_value
FROM events
WHERE user_id NOT IN (3, 7)
GROUP BY event_type
""",
)
def q_event_targeted_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR-style targeted deletion (`sources/deletion.py`) graded
    end-to-end: copy events range-clustered by user into 8 files,
    surgically delete two users (only the 1-2 files containing them
    are rewritten — proven byte-identical for the rest in
    tests/test_deletion.py), then aggregate the surviving table. The
    oracle states plain NOT IN semantics over the original table, so
    the graded plan proves the rewrite removed exactly the target
    rows and nothing else.

    Scale shape: affected-file discovery is one projected key-column
    scan with a broadcast membership filter; rewrite cost is
    O(files containing the keys), never O(table) — the property that
    makes a 50-user deletion request tractable on a 100 TB lake."""
    import os

    from sparktrends_spark.sources.deletion import delete_keys
    from sparktrends_spark.sources.tables import scan_parallel

    dest = os.path.join(
        "/tmp/sparktrends_delete",
        os.path.basename(sf_dir.rstrip("/")) or "sf",
        "events",
    )
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    events.repartitionByRange(8, "user_id").write.mode("overwrite").parquet(
        dest
    )
    spark.catalog.refreshByPath(dest)
    delete_keys(spark, dest, "user_id", [3, 7])
    return (
        # light aggregate downstream — byte-floor the fan-out (§2.2)
        scan_parallel(
            spark.read.parquet(dest),
            source_path=dest,
            min_partition_bytes=96 * 1024,
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


@query(
    "events_quality_checks",
    oracle="""
WITH rowchecks AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS v_null,
         CAST(sum(CASE WHEN value IS NULL OR value < 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS v_neg,
         CAST(sum(CASE WHEN value IS NULL OR value > 400 THEN 1 ELSE 0 END)
              AS BIGINT) AS v_cap,
         CAST(sum(CASE WHEN event_type IS NULL OR event_type NOT IN
                   ('view', 'click', 'purchase', 'signup')
              THEN 1 ELSE 0 END) AS BIGINT) AS v_type
  FROM events
),
uniq AS (
  SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS v
  FROM (SELECT count(*) AS c FROM events GROUP BY event_id HAVING count(*) > 1)
),
fk AS (
  SELECT CAST(count(*) AS BIGINT) AS v
  FROM events e LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON e.user_id = c.c_custkey
  WHERE c.c_custkey IS NULL
)
SELECT rule, n_violations, n, round(n_violations / CAST(n AS DOUBLE), 6)
         AS violation_rate
FROM (
  SELECT 'user_not_null' AS rule, v_null AS n_violations, n FROM rowchecks
  UNION ALL SELECT 'value_nonnegative', v_neg, n FROM rowchecks
  UNION ALL SELECT 'value_capped_400', v_cap, n FROM rowchecks
  UNION ALL SELECT 'known_event_type', v_type, n FROM rowchecks
  UNION ALL SELECT 'unique:event_id', v, (SELECT n FROM rowchecks) FROM uniq
  UNION ALL SELECT 'fk:user_id', v, (SELECT n FROM rowchecks) FROM fk
) t(rule, n_violations, n)
""".replace("n, round", "n AS n_rows, round"),
)
def q_events_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish-gate data-quality expectations over events
    (`quality.py`): four row-local rules in ONE aggregate pass
    (stacked to long form), key uniqueness as one keyed aggregate,
    and referential integrity to the customer dimension as a broadcast
    marker join — each family reads events exactly ONCE (no eager
    count() actions; plan-asserted). Two rules genuinely fire on this data
    (value > 400 exists; 'error' is outside the allowed type set), so
    the oracle checks real violation counts, not a vacuous zero
    column."""
    from sparktrends_spark.quality import (
        check_foreign_key,
        check_rules,
        check_unique,
    )

    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    rules = check_rules(
        events,
        {
            "user_not_null": F.col("user_id").isNotNull(),
            "value_nonnegative": F.col("value") >= 0,
            "value_capped_400": F.col("value") <= 400,
            "known_event_type": F.col("event_type").isin(
                "view", "click", "purchase", "signup"
            ),
        },
    )
    uniq = check_unique(events, ["event_id"])
    fk = check_foreign_key(events, "user_id", customer, "c_custkey")
    return rules.unionByName(uniq).unionByName(fk)


@query(
    "event_value_histogram",
    oracle="""
WITH b AS (
  -- DuckDB has no width_bucket; this is its exact contract for
  -- (value, 0, 500, 20): 0 below range, n+1 at/above max, else
  -- floor(value/width)+1. Inputs are 2-decimal, so no value sits
  -- within double-ULP of a 25.0 boundary.
  SELECT CASE WHEN value < 0.0 THEN 0
              WHEN value >= 500.0 THEN 21
              ELSE CAST(floor(value / 25.0) AS BIGINT) + 1 END AS bucket
  FROM events
)
SELECT bucket,
       round(0.0 + (bucket - 1) * 25.0, 6) AS lo,
       round(0.0 + bucket * 25.0, 6) AS hi,
       CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY bucket
""",
)
def q_event_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram via width_bucket — the profiling
    primitive behind data-quality dashboards and skew diagnosis
    (bucket 21 is the overflow bin for values above the range). One
    map-side bucketing projection + a 20-row aggregate; at 100 TB
    it's a scan and a tiny reduce."""
    events = load_table(spark, sf_dir, "events")
    b = events.select(
        F.width_bucket("value", F.lit(0.0), F.lit(500.0), F.lit(20)).alias(
            "bucket"
        )
    )
    return b.groupBy("bucket").agg(
        F.round((F.col("bucket") - 1) * 25.0, 6).alias("lo"),
        F.round(F.col("bucket") * 25.0, 6).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "event_weekday_hour_heatmap",
    oracle="""
WITH g AS (
  SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hr, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT CAST(dow AS BIGINT) AS dow, CAST(hr AS BIGINT) AS hr,
       CAST(n AS BIGINT) AS n_events,
       round(n / CAST(sum(n) OVER () AS DOUBLE), 6) AS share
FROM g
""",
)
def q_event_weekday_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap (day-of-week x hour) with global shares — the
    traffic-shape profile capacity planning and anomaly baselines read.
    NOTE the dialect trap the oracle pins: Spark's dayofweek is
    1=Sunday..7=Saturday while DuckDB's is 0=Sunday..6 — the oracle
    shifts by one, and a value-level check (not an assumption) keeps
    the two aligned. One aggregate over the fact
    table; the share window runs over the <=168-row result."""
    events = load_table(spark, sf_dir, "events")
    g = events.groupBy(
        F.dayofweek("ts").cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    total = F.sum("n_events").over(Window.partitionBy())
    return g.select(
        "dow",
        "hr",
        "n_events",
        F.round(F.col("n_events") / total.cast("double"), 6).alias("share"),
    )


@query(
    "user_activity_snapshot_diff",
    oracle="""
WITH old AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         round(sum(value), 6) AS total_value
  FROM events WHERE ts < TIMESTAMP '2024-01-16' AND user_id < 100
  GROUP BY user_id
),
new AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         round(sum(value), 6) AS total_value
  FROM events GROUP BY user_id
)
SELECT coalesce(o.user_id, n.user_id) AS user_id,
       CASE WHEN o.user_id IS NULL THEN 'inserted'
            WHEN n.user_id IS NULL THEN 'deleted'
            WHEN o.n_events IS NOT DISTINCT FROM n.n_events
             AND o.total_value IS NOT DISTINCT FROM n.total_value
              THEN 'unchanged'
            ELSE 'updated' END AS change_type,
       o.n_events AS old_n_events,
       o.total_value AS old_total_value,
       n.n_events AS new_n_events,
       n.total_value AS new_total_value
FROM old o FULL OUTER JOIN new n ON o.user_id = n.user_id
""",
)
def q_user_activity_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot diff (`operators/diff.py`): per-user
    activity aggregated over the first half of the month (the OLD
    snapshot) vs the full month (the NEW snapshot), every user
    classified inserted / updated / unchanged under null-safe value
    equality — the change feed an incremental consumer ingests, and
    the audit a pipeline rollout gates on. One full-outer join keyed
    by user; both snapshot aggregates are map-side-combined."""
    from sparktrends_spark.operators.diff import snapshot_diff

    events = _t(spark, sf_dir, "events")

    def snap(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )

    cutoff = F.lit("2024-01-16").cast("timestamp_ntz")
    # the OLD snapshot predates users >= 100 (they onboard later), so
    # the diff genuinely exercises the 'inserted' classification too
    old = snap(
        events.filter((F.col("ts") < cutoff) & (F.col("user_id") < 100))
    )
    new = snap(events)
    return snapshot_diff(
        old, new, keys=["user_id"], compare_cols=["n_events", "total_value"]
    )


@query(
    "purchase_to_prior_view_asof",
    oracle="""
WITH q AS (
  SELECT event_id, user_id, ts, value
  FROM events WHERE event_type = 'purchase'
),
s AS (
  SELECT user_id, ts, max(value) AS view_value
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, ts
),
m AS (
  SELECT q.event_id, q.user_id, q.ts, q.value,
         s.ts AS view_ts, s.view_value
  FROM q ASOF LEFT JOIN s
    ON q.user_id = s.user_id AND s.ts <= q.ts
)
SELECT event_id, user_id, ts, value,
       CASE WHEN view_ts IS NOT NULL
             AND date_diff('second', view_ts, ts) <= 3600
            THEN view_value END AS asof_view_value,
       (view_ts IS NOT NULL
        AND date_diff('second', view_ts, ts) <= 3600) AS attributed
FROM m
""",
)
def q_purchase_to_prior_view_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-lookback as-of join (pandas merge_asof `tolerance`):
    each purchase picks up the user's most recent view WITHIN ONE
    HOUR — a view from last week must NOT decorate today's purchase,
    which is what an unbounded as-of (events_to_orders_asof) would
    happily do. The attribution flag makes the staleness cut itself a
    graded value. Duplicate (user, ts) views are pre-deduplicated by
    max(value), matching the operator's tiebreak contract.

    Same scale shape as the unbounded variant: union + one user-keyed
    window; the tolerance adds a carried match-timestamp column, no
    extra shuffle."""
    events = _t(spark, sf_dir, "events")
    q = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    s = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    out = as_of_join(
        q,
        s,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["view_value"],
        tolerance_seconds=3600,
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("asof_view_value"),
        F.col("asof_view_value").isNotNull().alias("attributed"),
    )


@query(
    "daily_user_sketch_rollup",
    oracle="""
SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(count(*) AS BIGINT) AS n_events,
       TRUE AS union_in_bound
FROM events
""",
)
def q_daily_user_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (Datasketches HLL, Spark 3.5+ builtin):
    one HLL sketch per DAY, then the month answered by UNIONING the
    daily sketches — the pattern that makes "distinct users over any
    date range" answerable from a tiny rollup table instead of
    re-scanning 100 TB of history. Sketch bytes are engine-specific,
    so (as with priority_approx_distinct) the query grades itself:
    union_in_bound = |estimate - exact| / exact <= 5%, stated as
    literal TRUE by the oracle — the driver's value-hash fails if the
    union path ever drifts.

    Scale shape: daily partials are map-side combined; the union
    aggregates ~30 sketch blobs. The exact count here exists only to
    grade the sketch; a deployment stores sketches alone."""
    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    merged = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"),
        F.sum("n").alias("n_events"),
    )
    exact = events.agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    joined = merged.join(F.broadcast(exact))
    in_bound = (
        F.abs(F.col("_est") - F.col("exact_users"))
        / F.col("exact_users").cast("double")
        <= 0.05
    )
    return joined.select(
        "n_days",
        "exact_users",
        F.col("n_events").cast("bigint").alias("n_events"),
        in_bound.alias("union_in_bound"),
    )


@query(
    "value_quantile_sketch_rollup",
    oracle="""
WITH b AS (
  SELECT CASE WHEN value < 0.0 THEN 0
              WHEN value >= 500.0 THEN 101
              ELSE CAST(floor(value / 5.0) AS BIGINT) + 1 END AS bucket
  FROM events
),
h AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY bucket),
c AS (
  SELECT bucket, n, CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cum
  FROM h
),
tgt AS (
  SELECT p, CAST(ceil(p * total) AS BIGINT) AS target
  FROM (SELECT * FROM (VALUES (0.5), (0.9), (0.99)) AS t(p))
  CROSS JOIN (SELECT CAST(sum(n) AS BIGINT) AS total FROM h)
),
pick AS (
  SELECT t.p, t.target,
         min(c.bucket) AS bucket,
         min_by(c.cum, c.bucket) AS cum,
         min_by(c.n, c.bucket) AS n
  FROM tgt t JOIN c ON c.cum >= t.target
  GROUP BY t.p, t.target
),
est AS (
  SELECT p, target,
         CASE WHEN bucket = 0 THEN 0.0
              WHEN bucket = 101 THEN 500.0
              ELSE (bucket - 1) * 5.0
                   + (target - (cum - n)) / CAST(n AS DOUBLE) * 5.0
         END AS est
  FROM pick
),
ranked AS (
  SELECT value, ROW_NUMBER() OVER (ORDER BY value) AS rn FROM events
),
x AS (
  SELECT t.p, r.value AS exact_val
  FROM tgt t JOIN ranked r ON r.rn = t.target
)
SELECT e.p, round(e.est, 6) AS est, round(x.exact_val, 6) AS exact_val,
       abs(e.est - x.exact_val) <= 5.0 AS in_bound
FROM est e JOIN x ON e.p = x.p
""",
)
def q_value_quantile_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HISTOGRAM sketch rollup for range quantiles — the
    percentile sibling of `daily_user_sketch_rollup` (HLL / distinct).

    Per-day equi-width histograms of event value (100 buckets over
    [0, 500) + under/overflow bins) are the persisted sketch; any date
    range's p50/p90/p99 is answered by SUMMING the daily count vectors
    (here: the two-level (day, bucket) -> (bucket) aggregate) and
    interpolating inside the first bucket whose cumulative count
    reaches ceil(p·n) — never re-scanning raw history. Guarantee:
    the rank-target value lies inside the chosen bucket, so
    |estimate − exact| <= bucket width (5.0); the query self-grades
    that bound per quantile, and the exact disc-quantile (grading
    machinery only, not part of the sketch path) is emitted for the
    oracle's value hash via the two-phase distributed rank
    (`operators/rank.with_global_rank`) — ranking by value alone is
    sufficient because the VALUE at a given rank is tie-independent
    even where the rank permutation is not.

    Scale shape: the sketch table is O(days × 102) rows, map-side
    combined; the rollup collapses to ONE row whose cumulative counts
    are a <=102-element fold (no window at all), and the quantile walk
    is an array filter over that row. The grading column costs a
    range-partitioned rank, never a single-task global sort — zero
    unpartitioned windows anywhere in the plan."""
    events = _t(spark, sf_dir, "events")
    nb, width, hi_dom = 100, 5.0, 500.0
    v = F.col("value")
    bucket = (
        F.when(v < 0.0, F.lit(0))
        .when(v >= hi_dom, F.lit(nb + 1))
        .otherwise(F.floor(v / width) + 1)
    ).cast("bigint")
    daily = (
        events.select(F.to_date("ts").alias("day"), bucket.alias("bucket"))
        .groupBy("day", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    h = daily.groupBy("bucket").agg(F.sum("n").cast("bigint").alias("n"))
    # collapse the (<= 102-row) merged sketch to ONE broadcast row so
    # the cum >= target walk is an array filter, not a non-equi join
    # (a BroadcastNestedLoopJoin — forbidden by the plan-hygiene gate
    # even when both sides are tiny); broadcast-singleton crossJoin is
    # the sanctioned pattern. Cumulative counts are a fold over the
    # sorted <=102-element array (O(len²) array_append copies of tiny
    # structs), NOT a global window — the plan carries zero
    # unpartitioned Window nodes.
    cum_t = "array<struct<bucket:bigint,n:bigint,cum:bigint>>"
    sketch_row = h.agg(
        F.array_sort(F.collect_list(F.struct("bucket", "n"))).alias("_bn"),
        F.sum("n").cast("bigint").alias("total"),
    ).select(
        F.aggregate(
            "_bn",
            F.struct(
                F.lit(0).cast("bigint").alias("c"),
                F.array().cast(cum_t).alias("a"),
            ),
            lambda acc, s: F.struct(
                (acc["c"] + s["n"]).alias("c"),
                F.array_append(
                    acc["a"],
                    F.struct(
                        s["bucket"].alias("bucket"),
                        s["n"].alias("n"),
                        (acc["c"] + s["n"]).alias("cum"),
                    ),
                ).alias("a"),
            ),
            lambda acc: acc["a"],
        ).alias("_cs"),
        "total",
    )
    ps = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "p double")
    tgt = ps.crossJoin(F.broadcast(sketch_row)).select(
        "p",
        F.ceil(F.col("p") * F.col("total")).cast("bigint").alias("target"),
        "_cs",
    )
    pick = tgt.select(
        "p",
        "target",
        F.expr("filter(_cs, s -> s.cum >= target)")[0].alias("s"),
    )
    est = pick.select(
        "p",
        "target",
        F.when(F.col("s.bucket") == 0, F.lit(0.0))
        .when(F.col("s.bucket") == nb + 1, F.lit(hi_dom))
        .otherwise(
            (F.col("s.bucket") - 1) * width
            + (F.col("target") - (F.col("s.cum") - F.col("s.n")))
            / F.col("s.n").cast("double")
            * width
        )
        .alias("est"),
    )
    from sparktrends_spark.operators.rank import with_global_rank

    ranked = with_global_rank(events.select("value"), ["value"], "rn")
    exact = ranked.join(
        F.broadcast(tgt.select("p", "target")),
        ranked["rn"] == F.col("target"),
    ).select("p", F.col("value").alias("exact_val"))
    return est.join(exact, "p").select(
        "p",
        F.round("est", 6).alias("est"),
        F.round("exact_val", 6).alias("exact_val"),
        (F.abs(F.col("est") - F.col("exact_val")) <= width).alias("in_bound"),
    )


@query(
    "part_triangle_top",
    oracle="""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
m AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node AS partkey, CAST(count(*) AS BIGINT) AS n_triangles
FROM m GROUP BY node
ORDER BY n_triangles DESC, partkey
LIMIT 20
""",
)
def q_part_triangle_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by triangle membership in the co-purchase graph
    (parts co-occurring in an order are adjacent) via the
    degree-oriented node-iterator (`operators/triangles.py`). The
    oracle states the PLAIN semantics (a<b<c three-way self-join);
    the graded plan must produce identical counts while bounding
    wedge volume by orientation — each triangle enumerated exactly
    once at its minimum-(degree, id) apex, O(m^1.5) worst-case wedge
    work instead of sum(deg^2), no reducer ever owning a hot
    vertex's full neighborhood pair set. All-integer: bit-exact."""
    from sparktrends_spark.operators.triangles import triangle_participation

    lp = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    b = lp.withColumnsRenamed(
        {"l_orderkey": "r_orderkey", "l_partkey": "r_partkey"}
    )
    edges = lp.join(
        b,
        (F.col("l_orderkey") == F.col("r_orderkey"))
        & (F.col("l_partkey") < F.col("r_partkey")),
    ).select(F.col("l_partkey").alias("u"), F.col("r_partkey").alias("v"))
    part = triangle_participation(edges)
    return (
        part.select(F.col("node").alias("partkey"), "n_triangles")
        .orderBy(F.col("n_triangles").desc(), "partkey")
        .limit(20)
    )


@query(
    "part_association_rules",
    oracle="""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM lp),
item AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_x FROM lp GROUP BY 1),
pair AS (
  SELECT a.l_partkey AS x, b.l_partkey AS y, CAST(count(*) AS BIGINT) AS n_xy
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
)
SELECT p.x, p.y, p.n_xy,
       round(CAST(p.n_xy AS DOUBLE) / ix.n_x, 6) AS confidence,
       round(CAST(p.n_xy AS DOUBLE) * (SELECT n_orders FROM n)
             / (ix.n_x * iy.n_x), 6) AS lift
FROM pair p
JOIN item ix ON ix.l_partkey = p.x
JOIN item iy ON iy.l_partkey = p.y
ORDER BY lift DESC, x, y
LIMIT 20
""",
)
def q_part_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order co-occurrence:
    top-20 part pairs by lift among pairs with support >= 2, with
    confidence(x -> y). The a-priori discipline at scale: pair
    generation is bounded per basket (k^2 for a k-item order, k small
    and capped by the domain), the min-support HAVING prunes the long
    tail BEFORE any join, and the per-item counts attach via KEYED
    equi-joins — never a forced broadcast of the item-cardinality
    table (the doc_bm25_terms vocabulary lesson: at 100 TB the item
    table is catalog-sized). Ratios are quantized round-6 after
    all-integer numerators, ties broken by (x, y): bit-exact."""
    lp = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = lp.select(F.countDistinct("l_orderkey").alias("n_orders"))
    item = lp.groupBy(F.col("l_partkey")).agg(F.count(F.lit(1)).alias("n_x"))
    b = lp.withColumnsRenamed(
        {"l_orderkey": "r_orderkey", "l_partkey": "r_partkey"}
    )
    pair = (
        lp.join(
            b,
            (F.col("l_orderkey") == F.col("r_orderkey"))
            & (F.col("l_partkey") < F.col("r_partkey")),
        )
        .groupBy(
            F.col("l_partkey").alias("x"), F.col("r_partkey").alias("y")
        )
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .where(F.col("n_xy") >= 2)
    )
    ix = item.withColumnsRenamed({"l_partkey": "x", "n_x": "nx"})
    iy = item.withColumnsRenamed({"l_partkey": "y", "n_x": "ny"})
    scored = (
        pair.join(ix, "x")
        .join(iy, "y")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "x",
            "y",
            "n_xy",
            F.round(F.col("n_xy").cast("double") / F.col("nx"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("n_xy").cast("double")
                * F.col("n_orders")
                / (F.col("nx") * F.col("ny")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.col("lift").desc(), "x", "y").limit(20)


@query(
    "part_clustering_coefficient",
    oracle="""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT x AS node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY x
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
t AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_tri
  FROM (SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY node
)
SELECT d.node AS partkey, d.d AS degree,
       coalesce(t.n_tri, 0) AS n_triangles,
       round(2.0 * coalesce(t.n_tri, 0) / (d.d * (d.d - 1)), 6) AS coefficient
FROM deg d LEFT JOIN t ON t.node = d.node
WHERE d.d >= 2
ORDER BY coefficient DESC, partkey
LIMIT 20
""",
)
def q_part_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by local clustering coefficient
    2*T(v) / (deg(v)*(deg(v)-1)) over the co-purchase graph — the
    neighborhood-density score (Watts-Strogatz) behind community
    tightness and link-quality weighting, composed from the
    degree-oriented triangle counts (`operators/triangles.py`) and
    one degree aggregation; the ratio is quantized round-6 after
    all-integer numerators, ties by partkey. Scale shape: the
    triangle plan's three keyed shuffles plus one left join of two
    node-sized aggregates."""
    from sparktrends_spark.operators.triangles import triangle_participation

    lp = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    b = lp.withColumnsRenamed(
        {"l_orderkey": "r_orderkey", "l_partkey": "r_partkey"}
    )
    edges = lp.join(
        b,
        (F.col("l_orderkey") == F.col("r_orderkey"))
        & (F.col("l_partkey") < F.col("r_partkey")),
    ).select(F.col("l_partkey").alias("u"), F.col("r_partkey").alias("v"))
    # the co-purchase graph is SIMPLE: a pair co-occurring in many
    # orders is still one edge — dedup before degree counting (the
    # triangle operator dedups internally)
    edges = edges.distinct()
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select("v"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_participation(edges)
    return (
        deg.join(tri, "node", "left")
        .where(F.col("degree") >= 2)
        .select(
            F.col("node").alias("partkey"),
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
            F.round(
                F.lit(2.0)
                * F.coalesce(F.col("n_triangles"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - F.lit(1))),
                6,
            ).alias("coefficient"),
        )
        .orderBy(F.col("coefficient").desc(), "partkey")
        .limit(20)
    )


@query(
    "order_priority_from_cube",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            AS DECIMAL(20,2)) AS VARCHAR) AS total_price
FROM orders
GROUP BY o_orderpriority
""",
)
def q_order_priority_from_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate navigation: MATERIALIZE the (status x priority) CUBE
    once — one Expand pass over the fact table, exact decimal sums —
    then answer the priority rollup FROM THE CUBE (the grouping-id
    slice where status is aggregated away), never re-touching orders.
    The oracle recomputes from the fact table, so the graded row
    proves the navigation is lossless. Scale shape: the cube is
    2^d * |groups| rows built in one shuffle; every dashboard rollup
    after that reads O(result) rows from the materialization instead
    of rescanning a 100 TB fact table."""
    import os
    import shutil

    dest = os.path.join(
        "/tmp/sparktrends_cube",
        os.path.basename(sf_dir.rstrip("/")) or "sf",
        "orders_cube",
    )
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    orders = _t(spark, sf_dir, "orders")
    cube = (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(20,2)")
            .alias("total_price"),
            F.grouping_id().alias("gid"),
        )
    )
    cube.write.mode("overwrite").parquet(dest)
    served = spark.read.parquet(dest)
    # gid bit layout (status, priority): 2 = status aggregated away,
    # priority present — exactly the GROUP BY o_orderpriority slice
    return served.where(F.col("gid") == 2).select(
        "o_orderpriority",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("total_price").cast("string").alias("total_price"),
    )


@query(
    "events_k_anonymity",
    oracle="""
WITH qi AS (
  SELECT event_type,
         date_trunc('day', ts) AS day,
         CASE WHEN value < 0 THEN 0
              WHEN value >= 500 THEN 11
              ELSE CAST(floor(value / 50.0) AS BIGINT) + 1 END AS value_bucket,
         count(*) AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT CAST(5 AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       round(CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS DOUBLE)
             / CAST(sum(n) AS DOUBLE), 6) AS at_risk_rate
FROM qi
""",
)
def q_events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit — the privacy check that complements regex
    PII redaction (doc_pii_redact) and Exif scrubbing
    (asset_exif_scrubbed): bucket rows by their quasi-identifier
    tuple (event type, day, coarse value decile) and report how many
    equivalence classes — and what fraction of rows — fall below
    k=5, i.e. are re-identifiable by the QI combination alone. One
    hash aggregate on the QI tuple + one summary aggregate; counts
    exact, the single rate a deterministic division rounded on both
    sides. At 100 TB this is the same one-shuffle shape as any
    group-by (the QI space, not the row count, bounds the second
    stage)."""
    ev = load_table(spark, sf_dir, "events")
    k = 5
    qi = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.when(F.col("value") < 0, F.lit(0))
        .when(F.col("value") >= 500, F.lit(11))
        .otherwise((F.floor(F.col("value") / 50.0) + 1).cast("bigint"))
        .alias("value_bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    viol = F.when(F.col("n") < k, F.col("n")).otherwise(F.lit(0))
    return qi.agg(
        F.lit(k).cast("bigint").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("n") < k, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating_groups"),
        F.sum(viol).cast("bigint").alias("n_rows_at_risk"),
        F.round(
            F.sum(viol).cast("double") / F.sum("n").cast("double"), 6
        ).alias("at_risk_rate"),
    )


@query(
    "event_ab_test_ztest",
    oracle="""
WITH u AS (
  SELECT DISTINCT user_id, user_id % 2 AS variant FROM events
),
n AS (
  SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM u
),
conv AS (
  SELECT event_type,
         CAST(count(DISTINCT CASE WHEN user_id % 2 = 0
                             THEN user_id END) AS BIGINT) AS c_a,
         CAST(count(DISTINCT CASE WHEN user_id % 2 = 1
                             THEN user_id END) AS BIGINT) AS c_b
  FROM events GROUP BY event_type
)
, den AS (
  SELECT event_type, c_a, c_b, n_a, n_b,
         CAST(c_a AS DOUBLE) / n_a AS ra,
         CAST(c_b AS DOUBLE) / n_b AS rb,
         sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
              * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
              * (1.0 / n_a + 1.0 / n_b)) AS d
  FROM conv CROSS JOIN n
)
SELECT event_type, c_a, c_b, n_a, n_b,
       round(ra, 6) AS rate_a,
       round(rb, 6) AS rate_b,
       round(CASE WHEN d > 0 THEN (ra - rb) / d END, 6) AS z_score,
       CASE WHEN d > 0 THEN abs((ra - rb) / d) > 1.96
            ELSE FALSE END AS significant
FROM den
""",
)
def q_event_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation analytics: a two-proportion z-test per metric.
    Users split into variants by a deterministic hash (user_id parity
    stands in for the bucketing fn); for each event_type the per-
    variant user-conversion rates, the pooled-proportion z statistic,
    and the |z| > 1.96 verdict. Exact distinct-user counts (one
    Expand pass for both conditional distincts), then a fixed-shape
    expression over double-converted counts — engine-deterministic;
    the significance predicate is evaluated on the UNROUNDED z (both
    engines compute the identical double). The two-row denominator
    frame broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    variant = (F.col("user_id") % 2).alias("variant")
    n = (
        ev.select("user_id").distinct()
        .agg(
            F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_a"),
            F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_b"),
        )
    )
    conv = ev.groupBy("event_type").agg(
        F.count_distinct(
            F.when(F.col("user_id") % 2 == 0, F.col("user_id"))
        )
        .cast("bigint")
        .alias("c_a"),
        F.count_distinct(
            F.when(F.col("user_id") % 2 == 1, F.col("user_id"))
        )
        .cast("bigint")
        .alias("c_b"),
    )
    j = conv.crossJoin(F.broadcast(n))
    ra = F.col("c_a").cast("double") / F.col("n_a")
    rb = F.col("c_b").cast("double") / F.col("n_b")
    p = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    # the pooled variance is 0 when every (or no) user converts in
    # both variants — z is undefined there (NULL, not significant),
    # and the guard also keeps ANSI mode from raising DIVIDE_BY_ZERO
    den = F.sqrt(
        p * (F.lit(1.0) - p)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    z = F.when(den > 0, (ra - rb) / den)
    return j.select(
        "event_type", "c_a", "c_b", "n_a", "n_b",
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
        F.when(den > 0, F.abs((ra - rb) / den) > F.lit(1.96))
        .otherwise(F.lit(False))
        .alias("significant"),
    )


@query(
    "user_activity_gini",
    oracle="""
WITH cnt AS (
  SELECT user_id, count(*) AS x FROM events GROUP BY user_id
),
ranked AS (
  SELECT x, row_number() OVER (ORDER BY x, user_id) AS i FROM cnt
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(x) AS BIGINT) AS total_events,
       round(2.0 * CAST(sum(i * x) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
             - (CAST(count(*) AS DOUBLE) + 1.0)
               / CAST(count(*) AS DOUBLE), 6) AS gini
FROM ranked
""",
)
def q_user_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration of activity across users — the Gini coefficient
    of per-user event counts, the single-number companion to the
    per-key skew advisor (event_key_skew_profile): 0 = uniform load,
    ->1 = one user generates everything. Computed from EXACT integer
    sums (rank-weighted count sum, both bigint) through one fixed
    double expression — engine-exact. The global rank over the user
    aggregate uses the DISTRIBUTED two-phase rank (operators/rank.py:
    range partition + local row_number + broadcast offsets) — users
    are the one entity that reaches 10^8-10^9 in the target
    deployment, so no single-partition window anywhere in the plan."""
    from sparktrends_spark.operators.rank import with_global_rank

    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    ranked = with_global_rank(
        cnt, [F.asc("x"), F.asc("user_id")], rank_col="i"
    )
    n = F.count(F.lit(1)).cast("double")
    s0 = F.sum("x").cast("double")
    s1 = F.sum(F.col("i") * F.col("x")).cast("double")
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("total_events"),
        F.round(
            F.lit(2.0) * s1 / (n * s0) - (n + F.lit(1.0)) / n, 6
        ).alias("gini"),
    )


@query(
    "event_type_weekday_chi2",
    oracle="""
WITH o AS (
  SELECT event_type, dayofweek(ts) AS wd, CAST(count(*) AS DOUBLE) AS obs
  FROM events GROUP BY 1, 2
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM events),
rt AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS r FROM events GROUP BY 1),
ct AS (SELECT dayofweek(ts) AS wd, CAST(count(*) AS DOUBLE) AS c
       FROM events GROUP BY 1)
SELECT round(sum((o.obs - rt.r * ct.c / tot.n)
              * (o.obs - rt.r * ct.c / tot.n)
              / (rt.r * ct.c / tot.n)), 6) AS chi2,
       CAST((SELECT count(*) FROM rt) - 1 AS BIGINT)
         * CAST((SELECT count(*) FROM ct) - 1 AS BIGINT) AS dof,
       CAST(sum(o.obs) AS BIGINT) AS n_events
FROM o JOIN rt USING (event_type) JOIN ct USING (wd) CROSS JOIN tot
""",
)
def q_event_type_weekday_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test: is event type independent of
    weekday? Observed vs expected over the (type x weekday)
    contingency table — all counts exact; each cell's contribution is
    one fixed double expression and the 35-cell sum rounds to 6 (the
    only order-dependent step). Completes the statistical-testing
    pair with the A/B z-test. One scan builds all three margins via
    separate aggregates over the same cached-size table; the margins
    broadcast onto the cells."""
    ev = load_table(spark, sf_dir, "events")
    wd = F.dayofweek("ts").alias("wd")
    o = ev.groupBy("event_type", wd).agg(
        F.count(F.lit(1)).cast("double").alias("obs")
    )
    rt = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("r")
    )
    ct = ev.groupBy(wd).agg(F.count(F.lit(1)).cast("double").alias("c"))
    tot = ev.agg(F.count(F.lit(1)).cast("double").alias("n"))
    exp = F.col("r") * F.col("c") / F.col("n")
    cells = (
        o.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "wd")
        .crossJoin(F.broadcast(tot))
    )
    n_rt = rt.count()
    n_ct = ct.count()
    return cells.agg(
        F.round(
            F.sum((F.col("obs") - exp) * (F.col("obs") - exp) / exp), 6
        ).alias("chi2"),
        F.lit((n_rt - 1) * (n_ct - 1)).cast("bigint").alias("dof"),
        F.sum("obs").cast("bigint").alias("n_events"),
    )


@query(
    "purchase_latency_percentiles",
    oracle="""
WITH q AS (
  SELECT event_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
),
s AS (
  SELECT user_id, ts, max(value) AS view_value
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, ts
),
m AS (
  SELECT q.event_id, q.ts, s.ts AS view_ts
  FROM q ASOF LEFT JOIN s
    ON q.user_id = s.user_id AND s.ts <= q.ts
),
lat AS (
  SELECT date_diff('second', view_ts, ts) AS latency_s
  FROM m
  WHERE view_ts IS NOT NULL AND date_diff('second', view_ts, ts) <= 3600
)
SELECT CAST(count(*) AS BIGINT) AS n_attributed,
       round(quantile_cont(latency_s, 0.5), 4) AS p50_s,
       round(quantile_cont(latency_s, 0.9), 4) AS p90_s,
       round(quantile_cont(latency_s, 0.99), 4) AS p99_s,
       CAST(max(latency_s) AS BIGINT) AS max_s
FROM lat
""",
)
def q_purchase_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: for purchases attributed to a
    prior view within the hour (the bounded as-of join), the
    view-to-purchase delay percentiles — the product metric behind
    attribution windows. Latencies are exact integer seconds out of
    the as-of match (the view timestamp rides the join as a value
    column); percentiles are Spark's exact linear interpolation =
    DuckDB quantile_cont, round-4 (the returnflag_percentiles
    discipline)."""
    from sparktrends_spark.operators.joins import as_of_join

    events = _t(spark, sf_dir, "events")
    q = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    s = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
        .withColumn("view_ts", F.col("ts"))
    )
    m = as_of_join(
        q,
        s,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["view_ts"],
        tolerance_seconds=3600,
    )
    lat = m.where(F.col("asof_view_ts").isNotNull()).select(
        (
            F.unix_timestamp(F.col("ts").cast("timestamp"))
            - F.unix_timestamp(F.col("asof_view_ts").cast("timestamp"))
        ).alias("latency_s")
    )
    return lat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_attributed"),
        F.round(F.expr("percentile(latency_s, 0.5)"), 4).alias("p50_s"),
        F.round(F.expr("percentile(latency_s, 0.9)"), 4).alias("p90_s"),
        F.round(F.expr("percentile(latency_s, 0.99)"), 4).alias("p99_s"),
        F.max("latency_s").cast("bigint").alias("max_s"),
    )
