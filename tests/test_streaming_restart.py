"""Checkpoint kill-and-restart recovery for the graded streaming
queries (reference intent: stock_stream.py:188-191 exactly-once
posture; VERDICT r4 item 5).

Each test runs a graded streaming query over time-ordered event files
with ``maxFilesPerTrigger=1``, KILLS it mid-stream by injecting a
crash into the foreachBatch sink, then restarts the query against the
same checkpoint and the same sink table. The restarted run must
recover offsets + state-store contents from the checkpoint, replay
only un-committed work, and land the sink on exactly the single-batch
DuckDB oracle — through both crash positions the protocol has:

- crash BEFORE the sink's manifest commit: the batch is invisible in
  the sink and un-committed in the checkpoint -> replayed wholesale
- crash AFTER the sink commit but before the checkpoint commit (the
  at-least-once window): the replay hits the sink's
  already-committed-version skip -> idempotent no-op convergence
"""

from __future__ import annotations

import os

import pytest
from pyspark.errors import StreamingQueryException

import sparktrends_spark.plans.streaming_queries as sq
from sparktrends_spark.plans.streaming_queries import (
    build_stream_ohlcv_bars,
    build_stream_user_sessions,
)
from sparktrends_spark.streaming.sinks import read_upserted, upsert_parquet_bucketed
from tests.test_streaming_multibatch import (
    N_SPLITS,
    _assert_frames_equal,
    _n_batches,
    _oracle,
    emb_split_dir,  # noqa: F401  (fixture re-export)
    split_dir,  # noqa: F401  (fixture re-export)
)


def _crashing_sink(crash_at_batch: int, when: str):
    """A wrapper around upsert_parquet_bucketed that dies at a chosen
    batch, either before the sink's atomic commit or after it."""
    state = {"crashed": False}

    def sink(batch_df, table, keys, version):
        if version == crash_at_batch and not state["crashed"]:
            state["crashed"] = True
            if when == "pre_commit":
                raise RuntimeError("injected kill (pre sink commit)")
            upsert_parquet_bucketed(batch_df, table, keys=keys, version=version)
            raise RuntimeError("injected kill (post sink commit)")
        upsert_parquet_bucketed(batch_df, table, keys=keys, version=version)

    return sink


@pytest.mark.parametrize("when", ["pre_commit", "post_commit"])
def test_ohlcv_kill_and_restart_lands_on_oracle(
    spark, sf_dir, split_dir, tmp_path, monkeypatch, when  # noqa: F811
):
    ckpt = str(tmp_path / f"ckpt_{when}")
    table_dir = str(tmp_path / f"table_{when}")
    os.makedirs(table_dir, exist_ok=True)

    # run 1: crash at batch 1 (batch 0 committed, stream killed)
    monkeypatch.setattr(
        sq, "upsert_parquet_bucketed", _crashing_sink(1, when)
    )
    with pytest.raises(StreamingQueryException, match="injected kill"):
        build_stream_ohlcv_bars(
            spark, split_dir, max_files_per_trigger=1,
            ckpt_dir=ckpt, table_dir=table_dir,
        )
    monkeypatch.setattr(sq, "upsert_parquet_bucketed", upsert_parquet_bucketed)

    # the partially-processed sink exists and is readable (batch 0 only)
    partial = read_upserted(spark, os.path.join(table_dir, "t")).count()
    assert partial > 0

    # run 2: same checkpoint + same table; restart recovers offsets and
    # state, replays only unfinished work, completes the stream
    result = build_stream_ohlcv_bars(
        spark, split_dir, max_files_per_trigger=1,
        ckpt_dir=ckpt, table_dir=table_dir,
    ).toPandas()
    assert _n_batches(ckpt) >= N_SPLITS
    _assert_frames_equal(result, _oracle(sf_dir, "stream_ohlcv_bars"))


def test_sessions_kill_and_restart_lands_on_oracle(
    spark, sf_dir, split_dir, tmp_path, monkeypatch  # noqa: F811
):
    """Append-mode session windows: the state store (merged, not-yet-
    emitted sessions) must survive the kill via the checkpoint — a
    restart that lost session state would emit wrong/missing sessions,
    not just duplicate rows."""
    ckpt = str(tmp_path / "ckpt_sessions")
    table_dir = str(tmp_path / "table_sessions")
    os.makedirs(table_dir, exist_ok=True)

    monkeypatch.setattr(
        sq, "upsert_parquet_bucketed", _crashing_sink(1, "post_commit")
    )
    with pytest.raises(StreamingQueryException, match="injected kill"):
        build_stream_user_sessions(
            spark, split_dir, max_files_per_trigger=1,
            ckpt_dir=ckpt, table_dir=table_dir,
        )
    monkeypatch.setattr(sq, "upsert_parquet_bucketed", upsert_parquet_bucketed)

    result = build_stream_user_sessions(
        spark, split_dir, max_files_per_trigger=1,
        ckpt_dir=ckpt, table_dir=table_dir,
    ).toPandas()
    assert _n_batches(ckpt) >= N_SPLITS
    _assert_frames_equal(result, _oracle(sf_dir, "stream_user_sessions"))


def test_doc_dedup_kill_and_restart_lands_on_oracle(
    spark, sf_dir, tmp_path, monkeypatch, tmp_path_factory
):
    """Streaming exact-dedup recovery: the state store holds per-hash
    (min doc_id, count) aggregates with duplicates straddling batch
    boundaries — losing state on restart would double-count or forget
    survivors, not just duplicate rows."""
    from sparktrends_spark.plans.streaming_queries import build_stream_doc_dedup
    from tests.test_streaming_multibatch import docs_split_dir

    split = docs_split_dir.__wrapped__(sf_dir, tmp_path_factory)
    ckpt = str(tmp_path / "ckpt_dedup")
    table_dir = str(tmp_path / "table_dedup")
    os.makedirs(table_dir, exist_ok=True)

    monkeypatch.setattr(
        sq, "upsert_parquet_bucketed", _crashing_sink(1, "post_commit")
    )
    with pytest.raises(StreamingQueryException, match="injected kill"):
        build_stream_doc_dedup(
            spark, split, max_files_per_trigger=1,
            ckpt_dir=ckpt, table_dir=table_dir,
        )
    monkeypatch.setattr(sq, "upsert_parquet_bucketed", upsert_parquet_bucketed)

    result = build_stream_doc_dedup(
        spark, split, max_files_per_trigger=1,
        ckpt_dir=ckpt, table_dir=table_dir,
    ).toPandas()
    assert _n_batches(ckpt) >= N_SPLITS
    _assert_frames_equal(result, _oracle(sf_dir, "stream_doc_dedup"))


def test_asset_features_kill_and_restart_lands_on_oracle(
    spark, sf_dir, tmp_path, monkeypatch, tmp_path_factory
):
    """Stateless append-mode recovery: no state store involved, so the
    invariant under replay is pure sink idempotence — the re-run batch
    upserts the same asset_ids it already committed."""
    from sparktrends_spark.plans.streaming_queries import (
        build_stream_asset_features,
    )
    from tests.test_streaming_multibatch import docs_split_dir

    split = docs_split_dir.__wrapped__(sf_dir, tmp_path_factory)
    ckpt = str(tmp_path / "ckpt_saf")
    table_dir = str(tmp_path / "table_saf")
    os.makedirs(table_dir, exist_ok=True)

    monkeypatch.setattr(
        sq, "upsert_parquet_bucketed", _crashing_sink(1, "post_commit")
    )
    with pytest.raises(StreamingQueryException, match="injected kill"):
        build_stream_asset_features(
            spark, split, max_files_per_trigger=1,
            ckpt_dir=ckpt, table_dir=table_dir,
        )
    monkeypatch.setattr(sq, "upsert_parquet_bucketed", upsert_parquet_bucketed)

    result = build_stream_asset_features(
        spark, split, max_files_per_trigger=1,
        ckpt_dir=ckpt, table_dir=table_dir,
    ).toPandas()
    assert _n_batches(ckpt) >= N_SPLITS
    _assert_frames_equal(result, _oracle(sf_dir, "stream_asset_features"))


@pytest.mark.parametrize("when", ["pre_commit", "post_commit"])
def test_heavy_hitters_kill_and_restart_lands_on_oracle(
    spark, sf_dir, split_dir, tmp_path, monkeypatch, when  # noqa: F811
):
    """Running-count recovery: the state store must restore each
    user's partial count at the crash point — a replay from zero
    would double-count the already-committed batches and corrupt the
    top-20 counts (not just their order)."""
    from sparktrends_spark.plans.streaming_queries import (
        build_stream_user_heavy_hitters,
    )

    ckpt = str(tmp_path / f"ckpt_hh_{when}")
    table_dir = str(tmp_path / f"table_hh_{when}")
    os.makedirs(table_dir, exist_ok=True)

    monkeypatch.setattr(sq, "upsert_parquet_bucketed", _crashing_sink(1, when))
    with pytest.raises(StreamingQueryException, match="injected kill"):
        build_stream_user_heavy_hitters(
            spark, split_dir, max_files_per_trigger=1,
            ckpt_dir=ckpt, table_dir=table_dir,
        )
    monkeypatch.setattr(sq, "upsert_parquet_bucketed", upsert_parquet_bucketed)

    result = build_stream_user_heavy_hitters(
        spark, split_dir, max_files_per_trigger=1,
        ckpt_dir=ckpt, table_dir=table_dir,
    ).toPandas()
    assert _n_batches(ckpt) >= N_SPLITS
    _assert_frames_equal(result, _oracle(sf_dir, "stream_user_heavy_hitters"))


def test_incremental_dedup_screen_kill_and_restart(
    spark, sf_dir, tmp_path, monkeypatch, tmp_path_factory
):
    """Stateless screening recovery: no state store — the replayed
    batch re-screens against the same fixed index and the keyed
    upsert converges idempotently on the oracle verdicts."""
    from sparktrends_spark.plans.streaming_queries import (
        build_stream_doc_incremental_dedup,
    )
    from tests.test_streaming_multibatch import docs_split_dir

    split = docs_split_dir.__wrapped__(sf_dir, tmp_path_factory)
    ckpt = str(tmp_path / "ckpt_screen")
    table_dir = str(tmp_path / "table_screen")
    os.makedirs(table_dir, exist_ok=True)

    monkeypatch.setattr(
        sq, "upsert_parquet_bucketed", _crashing_sink(1, "post_commit")
    )
    with pytest.raises(StreamingQueryException, match="injected kill"):
        build_stream_doc_incremental_dedup(
            spark, split, max_files_per_trigger=1,
            ckpt_dir=ckpt, table_dir=table_dir,
        )
    monkeypatch.setattr(sq, "upsert_parquet_bucketed", upsert_parquet_bucketed)

    result = build_stream_doc_incremental_dedup(
        spark, split, max_files_per_trigger=1,
        ckpt_dir=ckpt, table_dir=table_dir,
    ).toPandas()
    assert _n_batches(ckpt) >= N_SPLITS
    _assert_frames_equal(
        result, _oracle(sf_dir, "stream_doc_incremental_dedup")
    )


def test_cdc_stream_kill_and_restart_lands_on_oracle(
    spark, sf_dir, tmp_path, monkeypatch
):
    """CDC apply with tombstones through kill-and-restart: the stream
    crashes mid-feed (after committing batch 0), restarts from the
    checkpoint, and the final sink equals the relational oracle —
    including keys whose DELETE arrived in a replayed batch."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_

    import sparktrends_spark.streaming.sinks as sinks_mod
    from sparktrends_spark.plans.streaming_queries import (
        build_stream_order_cdc_apply,
    )
    from sparktrends_spark.streaming.sinks import (
        read_upserted,
        upsert_parquet_bucketed as real_upsert,
    )
    from tests.oracle_utils import duckdb_connection

    # split orders into 3 key-ordered files, mtime-ascending
    split = tmp_path / "orders_split"
    split.mkdir()
    tbl = pq_.read_table(f"{sf_dir}/orders.parquet")
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("o_orderkey", "ascending")]))
    step = (len(tbl) + 2) // 3
    for i in range(3):
        name = "orders.parquet" if i == 0 else f"orders_{i}.parquet"
        p = str(split / name)
        pq_.write_table(tbl.slice(i * step, step), p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    calls = {"crashed": False}
    def crashing(df, path, keys, **kw):
        if kw.get("version") == 1 and not calls["crashed"]:
            calls["crashed"] = True
            raise RuntimeError("injected kill (cdc)")
        return real_upsert(df, path, keys=keys, **kw)

    monkeypatch.setattr(sinks_mod, "upsert_parquet_bucketed", crashing)
    ckpt = str(tmp_path / "ckpt")
    table_dir = str(tmp_path / "table")
    os.makedirs(table_dir, exist_ok=True)
    with pytest.raises(StreamingQueryException, match="injected kill"):
        build_stream_order_cdc_apply(
            spark, str(split), max_files_per_trigger=1,
            ckpt_dir=ckpt, table_dir=table_dir,
        )
    monkeypatch.setattr(sinks_mod, "upsert_parquet_bucketed", real_upsert)

    result = build_stream_order_cdc_apply(
        spark, str(split), max_files_per_trigger=1,
        ckpt_dir=ckpt, table_dir=table_dir,
    )
    got = {r.o_orderkey: r.o_totalprice for r in result.collect()}
    con = duckdb_connection(sf_dir)
    try:
        want = {
            int(k): v
            for k, v in con.execute(
                "SELECT o_orderkey, o_totalprice FROM orders "
                "WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 0)"
            ).fetchall()
        }
    finally:
        con.close()
    assert got == want


def test_hybrid_serve_kill_and_restart_lands_on_oracle(
    spark, sf_dir, emb_split_dir, tmp_path, monkeypatch  # noqa: F811
):
    """The round-14 streaming HYBRID serve recovers through a
    mid-stream kill: both standing indexes (filtered IVF + BM25
    postings) live OUTSIDE the checkpoint and rebuild
    deterministically on restart, so the restarted run re-resolves
    them, replays only the uncommitted query batches through the
    idempotent upsert sink (the crash lands AFTER the sink commit —
    the at-least-once window, converged by the versioned-skip), and
    the table lands exactly on the stream's batch-equivalent
    oracle."""
    from sparktrends_spark.plans.similarity import (
        build_stream_doc_hybrid_serve,
    )

    ckpt = str(tmp_path / "ckpt_hyb_restart")
    table_dir = str(tmp_path / "table_hyb_restart")
    os.makedirs(table_dir, exist_ok=True)

    monkeypatch.setattr(
        sq, "upsert_parquet_bucketed", _crashing_sink(1, "post_commit")
    )
    with pytest.raises(StreamingQueryException, match="injected kill"):
        build_stream_doc_hybrid_serve(
            spark, emb_split_dir, max_files_per_trigger=1,
            ckpt_dir=ckpt, table_dir=table_dir, docs_dir=sf_dir,
        )
    monkeypatch.setattr(sq, "upsert_parquet_bucketed", upsert_parquet_bucketed)

    result = build_stream_doc_hybrid_serve(
        spark, emb_split_dir, max_files_per_trigger=1,
        ckpt_dir=ckpt, table_dir=table_dir, docs_dir=sf_dir,
    ).toPandas()
    assert _n_batches(ckpt) >= N_SPLITS
    _assert_frames_equal(result, _oracle(sf_dir, "stream_doc_hybrid_rrf"))
