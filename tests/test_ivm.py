"""Incremental view maintenance (streaming/ivm.py): counting-algebra
correctness (group moves, count-0 removal) and the crash-replay
contract (agg delta commits before base apply; replay recovers)."""

from __future__ import annotations

import shutil

import pytest

from sparktrends_spark.streaming import ivm
from sparktrends_spark.streaming.ivm import maintain_agg_cdc
from sparktrends_spark.streaming.sinks import read_upserted

_SCHEMA = "k long, g string, v double, op string"


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "base"), str(tmp_path / "agg")


def _batches(spark):
    b0 = spark.createDataFrame(
        [(1, "A", 10.0, "c"), (2, "A", 20.0, "c"), (3, "B", 5.0, "c")], _SCHEMA
    )
    # k=1 MOVES group A->B with a new value; k=3 deleted
    b1 = spark.createDataFrame(
        [(1, "B", 11.0, "u"), (3, None, None, "d")], _SCHEMA
    )
    # k=2 deleted -> group A count hits 0 and must vanish
    b2 = spark.createDataFrame([(2, None, None, "d")], _SCHEMA)
    return [b0, b1, b2]


def _agg_state(spark, agg_dir):
    return {
        r.g: (r.n_rows, float(r.total))
        for r in read_upserted(spark, agg_dir).collect()
    }


def test_ivm_group_move_and_zero_group_removal(spark, dirs):
    base, agg = dirs
    for v, b in enumerate(_batches(spark)):
        maintain_agg_cdc(b, base, agg, ["k"], "g", "v", version=v)
    state = _agg_state(spark, agg)
    # A emptied (count 0 -> physically deleted); B = the moved k=1 row
    assert state == {"B": (1, 11.0)}
    live = {(r.k, r.g, r.v) for r in read_upserted(spark, base).collect()}
    assert live == {(1, "B", 11.0)}


def test_ivm_replay_after_full_commit_is_noop(spark, dirs):
    base, agg = dirs
    b0, b1, b2 = _batches(spark)
    maintain_agg_cdc(b0, base, agg, ["k"], "g", "v", version=0)
    maintain_agg_cdc(b1, base, agg, ["k"], "g", "v", version=1)
    before = _agg_state(spark, agg)
    maintain_agg_cdc(b1, base, agg, ["k"], "g", "v", version=1)  # replay
    assert _agg_state(spark, agg) == before


def test_ivm_crash_between_agg_and_base_recovers_on_replay(
    spark, dirs, tmp_path, monkeypatch
):
    base, agg = dirs
    b0, b1, _ = _batches(spark)
    maintain_agg_cdc(b0, base, agg, ["k"], "g", "v", version=0)

    # crash injection: the SECOND apply (the base one) dies mid-batch
    real = ivm.apply_cdc_bucketed
    calls = {"n": 0}

    def flaky(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash before base apply")
        return real(*args, **kwargs)

    monkeypatch.setattr(ivm, "apply_cdc_bucketed", flaky)
    with pytest.raises(RuntimeError, match="injected"):
        maintain_agg_cdc(b1, base, agg, ["k"], "g", "v", version=1)
    monkeypatch.setattr(ivm, "apply_cdc_bucketed", real)

    # replay the SAME version: agg buckets already committed (no-op),
    # base apply completes — end state equals the clean run
    maintain_agg_cdc(b1, base, agg, ["k"], "g", "v", version=1)
    clean_base, clean_agg = str(tmp_path / "cb"), str(tmp_path / "ca")
    maintain_agg_cdc(b0, clean_base, clean_agg, ["k"], "g", "v", version=0)
    maintain_agg_cdc(b1, clean_base, clean_agg, ["k"], "g", "v", version=1)
    assert _agg_state(spark, agg) == _agg_state(spark, clean_agg)
    shutil.rmtree(clean_base, ignore_errors=True)


def test_ivm_delete_only_first_batch_then_insert(spark, dirs):
    # tombstones for keys that never existed: old-read finds nothing,
    # zero delta -> the aggregate table is simply not created yet;
    # the next real batch creates it and the algebra is unaffected
    base, agg = dirs
    d_only = spark.createDataFrame([(9, None, None, "d")], _SCHEMA)
    maintain_agg_cdc(d_only, base, agg, ["k"], "g", "v", version=0)
    assert read_upserted(spark, base).count() == 0
    ins = spark.createDataFrame([(1, "A", 5.0, "c")], _SCHEMA)
    maintain_agg_cdc(ins, base, agg, ["k"], "g", "v", version=1)
    assert _agg_state(spark, agg) == {"A": (1, 5.0)}


def test_ivm_random_op_sequences_match_recompute(spark, tmp_path):
    """Dict-model property (the CDC apply test's pattern): random
    batched op sequences through maintain_agg_cdc must leave the
    aggregate table equal to recomputing count/sum over the surviving
    rows. Deterministic seed — hypothesis' function-scoped fixture
    health check doesn't fit a Spark session fixture, and one seeded
    30-batch randomized run exercises the same space."""
    import random

    rng = random.Random(8)
    base, agg = str(tmp_path / "rb"), str(tmp_path / "ra")
    live: dict[int, tuple[str, float]] = {}
    keys = list(range(12))
    groups = ["A", "B", "C"]
    for version in range(30):
        batch_rows = []
        for k in rng.sample(keys, rng.randint(1, 4)):
            op = rng.choice(["c", "u", "d"])
            if op == "d":
                batch_rows.append((k, None, None, "d"))
                live.pop(k, None)
            else:
                g = rng.choice(groups)
                v = round(rng.uniform(1, 100), 2)
                batch_rows.append((k, g, v, op))
                live[k] = (g, v)
        b = spark.createDataFrame(batch_rows, _SCHEMA)
        maintain_agg_cdc(b, base, agg, ["k"], "g", "v", version=version)

    expect: dict[str, tuple[int, float]] = {}
    for g, v in live.values():
        n, s = expect.get(g, (0, 0.0))
        expect[g] = (n + 1, round(s + v, 2))
    got = _agg_state(spark, agg)
    assert got == expect, (got, expect)
