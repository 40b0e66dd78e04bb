"""K1's at-scale half: keyed JDBC upsert + derived DDL (SURVEY §2.2).

The reference appends to Postgres at-least-once
(spark/utilities.py:29-47) over hand-written DDL (postgres/init.sql).
These tests prove the engine's replacement — a dialect MERGE executed
distributed via foreachPartition — is per-key idempotent across
repeated micro-batches, using sqlite as the live DB-API target (no
Postgres in the container; the statement builder is also asserted for
the postgres/mysql/ANSI shapes it would emit there).
"""

from __future__ import annotations

import functools
import sqlite3

import pytest
from pyspark.sql import types as T

from sparktrends_spark.sources.jdbc import (
    create_table_ddl,
    upsert_statement,
    upsert_table,
)

BAR_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("ts", T.StringType(), False),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
    ]
)


def _connect_factory(path: str):
    # partial over the stdlib builtin: picklable by reference, so the
    # factory ships to executor workers without importing this module.
    # Generous lock timeout: partitions upsert concurrently.
    return functools.partial(sqlite3.connect, path, 60.0)


def _snapshot(path: str) -> dict:
    with sqlite3.connect(path) as conn:
        rows = conn.execute(
            "SELECT symbol, ts, close, volume FROM bars ORDER BY symbol, ts"
        ).fetchall()
    return {(r[0], r[1]): (r[2], r[3]) for r in rows}


def test_upsert_statement_postgresql():
    sql = upsert_statement("bars", ["symbol", "ts", "close"], ["symbol", "ts"])
    assert sql == (
        "INSERT INTO bars (symbol, ts, close) VALUES (%s, %s, %s) "
        "ON CONFLICT (symbol, ts) DO UPDATE SET close = excluded.close"
    )


def test_upsert_statement_key_only_and_mysql_and_merge():
    assert upsert_statement("t", ["k"], ["k"], "sqlite") == (
        "INSERT INTO t (k) VALUES (?) ON CONFLICT (k) DO NOTHING"
    )
    assert "ON DUPLICATE KEY UPDATE v = VALUES(v)" in upsert_statement(
        "t", ["k", "v"], ["k"], "mysql"
    )
    merge = upsert_statement("t", ["k", "v"], ["k"], "ansi")
    assert merge.startswith("MERGE INTO t t USING (VALUES (?, ?))")
    assert "WHEN MATCHED THEN UPDATE SET t.v = s.v" in merge
    assert "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)" in merge


def test_upsert_statement_rejects_bad_keys():
    with pytest.raises(ValueError):
        upsert_statement("t", ["a"], ["missing"])


def test_create_table_ddl_postgresql_shapes():
    ddl = create_table_ddl(BAR_SCHEMA, "bars", ["symbol", "ts"])
    assert "CREATE TABLE IF NOT EXISTS bars" in ddl
    assert "symbol TEXT NOT NULL" in ddl
    assert "close DOUBLE PRECISION" in ddl
    assert "volume BIGINT" in ddl
    assert "PRIMARY KEY (symbol, ts)" in ddl
    with pytest.raises(ValueError):
        create_table_ddl(BAR_SCHEMA, "bars", ["nope"])


def test_upsert_table_idempotent_across_replayed_batches(spark, tmp_path):
    db = str(tmp_path / "bars.db")
    connect = _connect_factory(db)

    batch1 = spark.createDataFrame(
        [
            ("AAPL", "2024-01-01 09:30", 100.0, 10),
            ("AAPL", "2024-01-01 09:31", 101.0, 11),
            ("MSFT", "2024-01-01 09:30", 200.0, 20),
        ],
        BAR_SCHEMA,
    ).repartition(3)
    # update-mode refinement: one key refined, one key new
    batch2 = spark.createDataFrame(
        [
            ("AAPL", "2024-01-01 09:31", 105.0, 15),
            ("MSFT", "2024-01-01 09:31", 201.0, 21),
        ],
        BAR_SCHEMA,
    ).repartition(2)

    kwargs = dict(
        connect=connect, table="bars", keys=("symbol", "ts"), dialect="sqlite"
    )
    upsert_table(batch1, ensure_table=True, **kwargs)
    after1 = _snapshot(db)
    assert after1[("AAPL", "2024-01-01 09:31")] == (101.0, 11)
    assert len(after1) == 3

    upsert_table(batch2, **kwargs)
    after2 = _snapshot(db)
    assert after2[("AAPL", "2024-01-01 09:31")] == (105.0, 15)
    assert after2[("MSFT", "2024-01-01 09:31")] == (201.0, 21)
    assert len(after2) == 4

    # replay both batches out of order (retry storm): last writer per
    # key is still batch2's value — state converges, no duplicates.
    upsert_table(batch1, **kwargs)
    upsert_table(batch2, **kwargs)
    after_replay = _snapshot(db)
    assert after_replay[("AAPL", "2024-01-01 09:31")] == (105.0, 15)
    assert len(after_replay) == 4

    # ensure_table on an existing table is a no-op, not an error
    upsert_table(batch2, ensure_table=True, **kwargs)
    assert _snapshot(db) == after_replay


def test_stream_foreachbatch_upserts_into_db(spark, tmp_path):
    """The reference's deployment shape end-to-end: a streaming agg
    foreachBatch-upserted into a SQL database (stock_stream.py:169-180
    did at-least-once appends; this is the exactly-once-observable
    replacement), restart included."""
    import json

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    db = str(tmp_path / "metrics.db")
    connect = _connect_factory(db)

    import os

    os.makedirs(src)

    def write_batch(name: str, rows: list[dict]):
        with open(os.path.join(src, name), "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    write_batch(
        "a.json",
        [
            {"symbol": "AAPL", "price": 10.0},
            {"symbol": "AAPL", "price": 20.0},
            {"symbol": "MSFT", "price": 5.0},
        ],
    )

    def run():
        stream = (
            spark.readStream.schema("symbol string, price double")
            .json(src)
        )
        agg = stream.groupBy("symbol").agg(
            F.count(F.lit(1)).alias("n"), F.sum("price").alias("total")
        )

        def process(batch_df, batch_id):
            upsert_table(
                batch_df,
                connect=connect,
                table="metrics",
                keys=("symbol",),
                dialect="sqlite",
                ensure_table=True,
            )

        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    with sqlite3.connect(db) as conn:
        rows = dict(
            (s, (n, t))
            for s, n, t in conn.execute(
                "SELECT symbol, n, total FROM metrics"
            )
        )
    assert rows == {"AAPL": (2, 30.0), "MSFT": (1, 5.0)}

    # restart with more data: update-mode re-emission refines the same
    # natural keys in place — no duplicate rows, totals move forward
    write_batch("b.json", [{"symbol": "AAPL", "price": 5.0}])
    run()
    with sqlite3.connect(db) as conn:
        rows = dict(
            (s, (n, t))
            for s, n, t in conn.execute(
                "SELECT symbol, n, total FROM metrics"
            )
        )
    assert rows == {"AAPL": (3, 35.0), "MSFT": (1, 5.0)}
