"""Focused tests for operators/pairs.first_collision_pairs.

The operator's contract: emit each colliding (smaller id, larger id)
pair exactly once — the same pair set as DISTINCT over the exploded
band join — with optional per-side payload carry. The r14 single-SQL
rewrite must preserve that contract, leave no temp view behind, and
keep every branch a hash join on the band key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparktrends_spark.operators.pairs import KEY_PREFIX, first_collision_pairs


def _base(spark, rows):
    """rows: (id, k0, k1, payload)"""
    return spark.createDataFrame(
        rows, f"id int, {KEY_PREFIX}0 string, {KEY_PREFIX}1 string, p double"
    )


def _reference_pairs(rows, n_bands):
    """DISTINCT over all bands, smaller id first — the naive semantics."""
    out = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            lo, hi = (a, b) if a[0] < b[0] else (b, a)
            if any(lo[1 + t] == hi[1 + t] for t in range(n_bands)):
                out.add((lo[0], hi[0]))
    return out


def test_pair_set_matches_distinct_reference(spark):
    rows = [
        (1, "x", "m", 1.0),
        (2, "x", "n", 2.0),  # collides with 1 in band 0
        (3, "y", "n", 3.0),  # collides with 2 in band 1
        (4, "x", "n", 4.0),  # collides with 1,2 (band 0) and 2,3 (band 1)
        (5, "z", "q", 5.0),  # no collisions
    ]
    got = {
        (r.doc_a, r.doc_b)
        for r in first_collision_pairs(_base(spark, rows), 2, "id").collect()
    }
    assert got == _reference_pairs(rows, 2)


def test_each_pair_emitted_exactly_once(spark):
    # ids 1/2 collide in BOTH bands: first-collision-wins must emit once.
    rows = [(1, "x", "m", 1.0), (2, "x", "m", 2.0)]
    out = first_collision_pairs(_base(spark, rows), 2, "id").collect()
    assert [(r.doc_a, r.doc_b) for r in out] == [(1, 2)]


def test_carry_projects_both_sides(spark):
    rows = [(1, "x", "m", 1.5), (2, "x", "n", 2.5)]
    out = first_collision_pairs(
        _base(spark, rows),
        2,
        "id",
        out_ids=("id_a", "id_b"),
        carry=[("p", "p_a", "p_b")],
    ).collect()
    assert [(r.id_a, r.id_b, r.p_a, r.p_b) for r in out] == [(1, 2, 1.5, 2.5)]


def test_single_band_and_no_view_leak(spark):
    before = {v.name for v in spark.catalog.listTables() if v.isTemporary}
    rows = [(1, "x", "m", 1.0), (2, "x", "m", 2.0), (3, "y", "m", 3.0)]
    df = first_collision_pairs(_base(spark, rows), 1, "id")
    assert {(r.doc_a, r.doc_b) for r in df.collect()} == {(1, 2)}
    after = {v.name for v in spark.catalog.listTables() if v.isTemporary}
    assert after == before  # the transient _fcp_* view is dropped


def test_persisted_base_stays_cached(spark):
    # The transient view's drop must NOT uncache the caller's pinned
    # base frame (the public Catalog.dropTempView would): unpinning it
    # re-derives the banded pipeline once per band branch.
    rows = [(1, "x", "m", 1.0), (2, "x", "n", 2.0)]
    base = _base(spark, rows).persist()
    try:
        base.count()
        cache_mgr = spark._jsparkSession.sharedState().cacheManager()
        assert cache_mgr.lookupCachedData(base._jdf).isDefined()
        first_collision_pairs(base, 2, "id").collect()
        assert cache_mgr.lookupCachedData(base._jdf).isDefined()
    finally:
        base.unpersist()


def test_fallback_drop_repersists_pinned_base(spark, monkeypatch):
    # If the internal SessionCatalog drop surface ever moves, the
    # public-API fallback (which UNCACHES plans equal to the view's)
    # must restore the caller's pin — otherwise every downstream
    # reference re-derives the banded pipeline (the r14 3x cliff).
    from sparktrends_spark.operators import pairs as pairs_mod

    def boom(spark_, name):
        raise RuntimeError("internal surface moved")

    monkeypatch.setattr(pairs_mod, "_internal_drop_temp_view", boom)
    before = {v.name for v in spark.catalog.listTables() if v.isTemporary}
    rows = [(1, "x", "m", 1.0), (2, "x", "n", 2.0)]
    base = _base(spark, rows).persist()
    try:
        base.count()
        cache_mgr = spark._jsparkSession.sharedState().cacheManager()
        assert cache_mgr.lookupCachedData(base._jdf).isDefined()
        got = {
            (r.doc_a, r.doc_b)
            for r in first_collision_pairs(base, 2, "id").collect()
        }
        assert got == {(1, 2)}
        # the pin survived the fallback drop (re-persisted)
        assert base.storageLevel.useMemory
        assert cache_mgr.lookupCachedData(base._jdf).isDefined()
        # and the transient view is still gone
        after = {v.name for v in spark.catalog.listTables() if v.isTemporary}
        assert after == before
    finally:
        base.unpersist()


def test_branches_plan_as_hash_joins(spark):
    rows = [(i, str(i % 3), str(i % 2), float(i)) for i in range(20)]
    plan = (
        first_collision_pairs(_base(spark, rows), 2, "id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
