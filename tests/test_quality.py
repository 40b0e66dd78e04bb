"""Data-quality expectations: violation counting semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparktrends_spark.quality import check_foreign_key, check_rules, check_unique


def test_check_rules_counts_nulls_as_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (None, 3.0), (4, None)],
        "k long, v double",
    )
    out = {
        r["rule"]: r
        for r in check_rules(
            df,
            {
                "k_not_null": F.col("k").isNotNull(),
                "v_nonneg": F.col("v") >= 0,  # NULL comparison -> violation
            },
        ).collect()
    }
    assert out["k_not_null"]["n_violations"] == 1
    assert out["v_nonneg"]["n_violations"] == 2  # -5 and NULL
    assert out["v_nonneg"]["n_rows"] == 4
    assert abs(out["v_nonneg"]["violation_rate"] - 0.5) < 1e-9


def test_check_unique_counts_all_rows_in_dup_groups(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (3,), (3,)], "k long"
    )
    row = check_unique(df, ["k"]).head()
    # 2 appears twice + 3 appears thrice = 5 rows participate in dups
    assert row["n_violations"] == 5 and row["n_rows"] == 6


def test_check_unique_clean_table_reports_zero(spark):
    row = check_unique(spark.range(10).selectExpr("id AS k"), ["k"]).head()
    assert row["n_violations"] == 0 and row["violation_rate"] == 0.0


def test_check_foreign_key_counts_orphans(spark):
    fact = spark.createDataFrame([(1,), (2,), (9,), (9,)], "fk long")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    row = check_foreign_key(fact, "fk", dim, "id").head()
    assert row["n_violations"] == 2 and row["rule"] == "fk:fk"


def test_check_foreign_key_null_fk_is_orphan(spark):
    fact = spark.createDataFrame([(1,), (None,)], "fk INT")
    dim = spark.createDataFrame([(1,), (2,)], "id INT")
    row = check_foreign_key(fact, "fk", dim, "id").head()
    assert row["n_violations"] == 1 and row["n_rows"] == 2


def test_check_rules_rejects_sql_injection_shaped_rule_name(spark):
    import pytest

    df = spark.range(3)
    for bad in ["a'b", "a`b", "a), (b"]:
        with pytest.raises(ValueError):
            check_rules(df, {bad: F.col("id") >= 0}).collect()


def test_quality_checks_scan_each_table_once(spark, sf_dir):
    """The de-scan fix: no per-check eager count() actions. Each rule
    family's plan contains exactly one scan of the fact table."""
    from sparktrends_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")

    def n_event_scans(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("events.parquet")

    uniq = check_unique(events, ["event_id"])
    assert n_event_scans(uniq) == 1
    fk = check_foreign_key(events, "user_id", customer, "c_custkey")
    assert n_event_scans(fk) == 1
    rules = check_rules(events, {"user_not_null": F.col("user_id").isNotNull()})
    assert n_event_scans(rules) == 1
