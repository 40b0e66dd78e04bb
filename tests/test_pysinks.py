"""Python DataSource WRITER (jsonl_sink): batch + streaming commit
protocol, staging isolation, and replayed-batch idempotence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sparktrends_spark.sources.pysinks import (
    JsonlStreamWriter,
    _stage_rows,
    read_jsonl_dir,
    register_jsonl_sink,
)


def test_batch_write_commits_atomically(spark, tmp_path):
    register_jsonl_sink(spark)
    p = str(tmp_path / "alerts")
    df = spark.range(10).select("id", (F.col("id") * 2.0).alias("v"))
    df.write.format("jsonl_sink").option("path", p).mode("append").save()
    rows = read_jsonl_dir(p)
    assert sorted(r["id"] for r in rows) == list(range(10))
    assert {r["id"]: r["v"] for r in rows}[3] == 6.0
    # staging drained on commit
    assert os.listdir(os.path.join(p, "_staging")) == []


def test_batch_append_accumulates(spark, tmp_path):
    register_jsonl_sink(spark)
    p = str(tmp_path / "alerts2")
    df = spark.range(5)
    df.write.format("jsonl_sink").option("path", p).mode("append").save()
    df.write.format("jsonl_sink").option("path", p).mode("append").save()
    assert len(read_jsonl_dir(p)) == 10


def test_stream_write_lands_all_rows(spark, tmp_path):
    register_jsonl_sink(spark)
    src = str(tmp_path / "src")
    spark.range(20).select(
        "id", F.col("id").cast("string").alias("s")
    ).coalesce(1).write.parquet(src)
    p = str(tmp_path / "stream_alerts")
    q = (
        spark.readStream.schema("id bigint, s string")
        .parquet(src)
        .writeStream.format("jsonl_sink")
        .option("path", p)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = read_jsonl_dir(p)
    assert sorted(r["id"] for r in rows) == list(range(20))
    assert any(f.startswith("_batch_") for f in os.listdir(p))


def test_stream_replayed_batch_is_discarded(spark, tmp_path):
    """Crash between sink commit and checkpoint commit replays the
    batch: the committed-marker makes the replay a no-op instead of a
    duplicate (the at-least-once -> effectively-once bridge)."""
    from pyspark.sql import Row

    p = str(tmp_path / "replay")
    os.makedirs(p, exist_ok=True)
    w = JsonlStreamWriter(p)
    rows = [Row(id=1), Row(id=2)]
    m1 = _stage_rows(p, iter(rows))
    w.commit([m1], batchId=7)
    assert len(read_jsonl_dir(p)) == 2
    # replay of batch 7: fresh staged file, same batch id
    m2 = _stage_rows(p, iter(rows))
    w.commit([m2], batchId=7)
    assert len(read_jsonl_dir(p)) == 2  # no duplicates
    assert os.listdir(os.path.join(p, "_staging")) == []


def test_abort_discards_staging(spark, tmp_path):
    from pyspark.sql import Row

    p = str(tmp_path / "abort")
    os.makedirs(p, exist_ok=True)
    w = JsonlStreamWriter(p)
    m = _stage_rows(p, iter([Row(id=1)]))
    w.abort([m], batchId=0)
    assert read_jsonl_dir(p) == []
    assert os.listdir(os.path.join(p, "_staging")) == []
