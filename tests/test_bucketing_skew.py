"""Bucketed co-located joins (no Exchange) and skew-salting helpers."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparktrends_spark.operators.skew import replicated_join, salted_agg
from sparktrends_spark.sources.bucketing import read_table, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(
        orders, "orders_b", ["o_custkey"], num_buckets=8,
        path=str(tmp_path / "orders_b"),
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b",
        ["o_custkey"],
        num_buckets=8,
        path=str(tmp_path / "customer_b"),
    )
    # disable broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_table(spark, "orders_b").join(
            read_table(spark, "customer_b"), "o_custkey"
        )
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        # sanity: same result as the plain join
        expected = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        r.l_returnflag: (r.n, r.total)
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {
                "n": (F.count(F.lit(1)), F.sum("n")),
                "total": (F.sum("l_extendedprice"), F.sum("total")),
            },
            salt_buckets=8,
        ).collect()
    }
    want = {
        r.l_returnflag: (r.n, r.total)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("total")
        )
        .collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6 * abs(want[k][1])


def test_replicated_join_matches_plain_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    got = replicated_join(orders, customer, ["o_custkey"], salt_buckets=4)
    plain = orders.join(customer, "o_custkey")
    assert got.count() == plain.count()
    assert sorted(got.columns) == sorted(plain.columns)


def test_heavy_hitters_matches_exact_on_high_cardinality(spark):
    """The sketch must genuinely prune (candidate set << distinct
    keys) yet return EXACTLY the naive groupBy+orderBy+limit result:
    30k long-tail keys appearing 1-2 times, 25 head keys appearing
    60-300 times, capacity far below the cardinality."""
    from pyspark.sql import functions as F

    from sparktrends_spark.operators.freq import heavy_hitters, mg_candidates

    head = spark.range(25).selectExpr(
        "id AS key", "CAST(60 + id * 10 AS INT) AS reps"
    )
    head_rows = head.selectExpr("explode(sequence(1, reps))", "key").select("key")
    tail = spark.range(30000).selectExpr("1000000 + id AS key")
    tail2 = spark.range(15000).selectExpr("1000000 + id * 2 AS key")
    df = head_rows.unionAll(tail).unionAll(tail2).repartition(8)

    capacity = 256
    cand = mg_candidates(df, "key", capacity)
    n_cand = cand.count()
    assert n_cand <= capacity * 8
    assert n_cand < 5000  # pruned hard vs 30k distinct keys

    got = heavy_hitters(df, "key", k=15, capacity=capacity, count_col="n").collect()
    exact = (
        df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("key"))
        .limit(15)
        .collect()
    )
    assert [(r["key"], r["n"]) for r in got] == [
        (r["key"], r["n"]) for r in exact
    ]


def test_heavy_hitters_string_keys(spark):
    """The schema-derivation path must work for non-numeric keys."""
    from sparktrends_spark.operators.freq import heavy_hitters

    df = spark.createDataFrame(
        [("a",)] * 30 + [("b",)] * 20 + [("c",)] * 5 + [("d",)] * 1,
        "k string",
    ).repartition(4)
    got = heavy_hitters(df, "k", k=2, capacity=16).collect()
    assert [(r["k"], r["n"]) for r in got] == [("a", 30), ("b", 20)]


def test_snapshot_diff_covers_all_change_types(spark):
    from sparktrends_spark.operators.diff import diff_summary, snapshot_diff

    old = spark.createDataFrame(
        [(1, 10, None), (2, 20, "x"), (3, 30, "y")],
        "k long, v long, s string",
    )
    new = spark.createDataFrame(
        [(2, 20, "x"), (3, 31, "y"), (4, 40, None)],
        "k long, v long, s string",
    )
    d = {
        r["k"]: r
        for r in snapshot_diff(
            old, new, keys=["k"], compare_cols=["v", "s"]
        ).collect()
    }
    assert d[1]["change_type"] == "deleted" and d[1]["new_v"] is None
    # null-safe equality: NULL == NULL must read as unchanged
    assert d[2]["change_type"] == "unchanged"
    assert d[3]["change_type"] == "updated" and d[3]["old_v"] == 30
    assert d[4]["change_type"] == "inserted" and d[4]["old_v"] is None
    counts = {
        r["change_type"]: r["n_keys"]
        for r in diff_summary(
            snapshot_diff(old, new, keys=["k"], compare_cols=["v", "s"])
        ).collect()
    }
    assert counts == {
        "deleted": 1, "unchanged": 1, "updated": 1, "inserted": 1
    }


def test_cms_never_underestimates_and_collides(spark):
    """CMS one-sided guarantee on a high-cardinality input: for EVERY
    key est >= true, and with a deliberately narrow width collisions
    actually occur (some est > true) — the estimator is exercised,
    not an exact count in disguise. An unseen key gets a finite
    (possibly positive) estimate, never an error."""
    from pyspark.sql import functions as F

    from sparktrends_spark.operators.cms import cms_build, cms_estimate

    # 500 keys, key k appears (k % 17) + 1 times
    df = (
        spark.range(500)
        .selectExpr("id AS key", "CAST(id % 17 + 1 AS INT) AS reps")
        .selectExpr("explode(sequence(1, reps))", "key")
        .select("key")
        .repartition(8)
    )
    depth, width = 4, 128
    sketch = cms_build(df, "key", depth=depth, width=width)
    cells = sketch.collect()
    assert len(cells) <= depth * width
    assert sketch.agg(F.sum("cnt")).first()[0] == df.count() * depth

    probes = df.select("key").distinct()
    est = cms_estimate(sketch, probes, "key", depth=depth, width=width)
    true = df.groupBy("key").agg(F.count(F.lit(1)).alias("t"))
    joined = est.join(true, "key").select("key", "est_count", "t").collect()
    assert len(joined) == 500
    assert all(r["est_count"] >= r["t"] for r in joined)
    assert any(r["est_count"] > r["t"] for r in joined)  # width forced collisions

    unseen = spark.range(1).selectExpr("987654321 AS key")
    (r,) = cms_estimate(sketch, unseen, "key", depth=depth, width=width).collect()
    assert r["est_count"] >= 0


def test_cms_merge_is_cellwise_sum(spark):
    """Mergeability (the streaming-upsert contract): sketch(A) +
    sketch(B) merged cell-wise equals sketch(A union B) exactly."""
    from pyspark.sql import functions as F

    from sparktrends_spark.operators.cms import cms_build

    a = spark.range(0, 300).selectExpr("id % 40 AS key")
    b = spark.range(300, 700).selectExpr("id % 55 AS key")
    merged = (
        cms_build(a, "key", depth=3, width=32)
        .unionAll(cms_build(b, "key", depth=3, width=32))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_build(a.unionAll(b), "key", depth=3, width=32)
    m = {(r["row"], r["col"]): r["cnt"] for r in merged.collect()}
    d = {(r["row"], r["col"]): r["cnt"] for r in direct.collect()}
    assert m == d


def test_cms_estimate_broadcasts_sketch(spark):
    """The probe join must broadcast the <=depth*width-row sketch —
    no shuffle of the probe side, no sort-merge join."""
    from sparktrends_spark.operators.cms import cms_build, cms_estimate

    df = spark.range(2000).selectExpr("id % 100 AS key")
    sketch = cms_build(df, "key")
    est = cms_estimate(sketch, df.select("key").distinct(), "key")
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan


def test_join_key_skew_profile_values(spark):
    from sparktrends_spark.operators.skew import join_key_skew_profile

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (None, "a")], "u int, e string"
    )
    prof = {r.key_col: r for r in join_key_skew_profile(df, ["u", "e"]).collect()}
    # u: keys {1(x2), 2, NULL} -> 3 keys, max 2, skew 2*3/4
    assert prof["u"].n_keys == 3
    assert prof["u"].max_key_rows == 2
    assert prof["u"].skew_factor == 1.5
    assert prof["u"].suggested_salt == 2
    # e: keys {a(x3), b} -> NULL-free column, heavier head
    assert prof["e"].n_keys == 2
    assert prof["e"].max_key_rows == 3
    assert prof["e"].total_rows == 4


def test_skew_profile_single_pass_plan(spark, sf_dir):
    from sparktrends_spark.plans import QUERIES

    plan = (
        QUERIES["event_key_skew_profile"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # ALL audited columns ride ONE grouping-sets pass over ONE scan
    assert plan.count("FileScan parquet") == 1
    assert "Expand" in plan
