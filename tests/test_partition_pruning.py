"""At-rest layout: date-partitioned parquet + partition pruning.

SURVEY §4: the reference had no partitioned storage (Postgres btree on
symbol only). Our engine's layout is parquet partitioned by
low-cardinality keys so time/symbol predicates skip whole directories.
This test locks the property in: a day filter must show up as a
PartitionFilter (directory skip), not a post-scan Filter.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparktrends_spark.sources.files import write_partitioned_parquet


def test_partition_pruning_on_date_layout(spark, sf_dir, tmp_path):
    # load_table normalizes ts to timestamp_ntz regardless of the
    # parquet physical type (µs today; defensive against ns-long).
    from sparktrends_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("event_date", F.to_date(F.col("ts")))
    path = str(tmp_path / "events_by_date")
    write_partitioned_parquet(ev, path, partition_cols=["event_date"], mode="overwrite")

    df = spark.read.parquet(path).filter(F.col("event_date") == "2024-01-05")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "event_date" in plan.split("PartitionFilters")[1].split("]")[0]

    # pruning must also be correct, not just present
    expected = ev.filter(F.col("event_date") == "2024-01-05").count()
    assert df.count() == expected > 0
    # (df.inputFiles() reports the pre-pruning relation, so the
    # PartitionFilters assertion above is the directory-skip evidence)
