"""The TIMESTAMP(NANOS) defensive branch, exercised for real.

The shipped testdata stores events.ts as timestamp[us]; the loaders
keep a fallback for regenerated data written as TIMESTAMP(NANOS)
(which Spark only reads as a ns-long under nanosAsLong). These tests
write an actual nanos parquet file and prove both the batch and the
streaming loader normalize it to the same timestamp_ntz values the
µs file produces — the r3 wrong-answer bug stays dead even if the
testdata's physical type changes back.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from sparktrends_spark.plans.streaming_queries import stream_events
from sparktrends_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def nanos_dir(sf_dir, tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("nanos_events")
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    ts_ns = tbl.column("ts").cast(pa.timestamp("ns"))
    tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", ts_ns)
    pq.write_table(tbl, str(out / "events.parquet"), store_schema=False)
    return str(out)


def test_batch_loader_normalizes_nanos(spark, sf_dir, nanos_dir):
    ref = load_table(spark, sf_dir, "events")
    got = load_table(spark, nanos_dir, "events")
    assert str(got.schema["ts"].dataType) == str(ref.schema["ts"].dataType)
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_stream_loader_normalizes_nanos(spark, sf_dir, nanos_dir, tmp_path):
    out = str(tmp_path / "out")
    q = (
        stream_events(spark, nanos_dir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).select("event_id", "ts")
    # stream path reads event time as TIMESTAMP (watermark requirement)
    ref = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0
