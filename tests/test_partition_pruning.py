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


def test_zorder_layout_prunes_on_both_columns(spark, tmp_path):
    """Z-order vs single-column sort: a layout sorted by x alone
    cannot prune a y-only predicate (every file's y-envelope spans the
    domain), the Morton layout prunes on BOTH clustered columns — and
    both layouts return identical rows."""
    from sparktrends_spark.sources.layout import (
        file_prune_stats,
        zorder_write,
    )

    df = spark.range(40000).selectExpr(
        "CAST(id % 1000 AS BIGINT) AS x",
        "CAST((id * 7919) % 1000 AS BIGINT) AS y",
        "id AS payload",
    )
    linear = str(tmp_path / "linear")
    zpath = str(tmp_path / "zorder")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(linear)
    zorder_write(df, ["x", "y"], zpath, n_files=16)

    rect = {"x": (100, 150), "y": (100, 150)}
    yonly = {"y": (100, 150)}
    lin_rect = file_prune_stats(linear, rect)
    z_rect = file_prune_stats(zpath, rect)
    lin_y = file_prune_stats(linear, yonly)
    z_y = file_prune_stats(zpath, yonly)

    # x-sorted layout: y predicate prunes nothing.
    assert lin_y["n_pruned"] == 0 and lin_y["n_files"] == 16
    # z-order: both the rectangle and the y-only predicate skip files.
    assert z_y["n_pruned"] > 0
    assert z_rect["n_pruned"] >= z_rect["n_files"] // 2
    assert z_rect["n_pruned"] >= lin_rect["n_pruned"]

    # Same rows either way (layout must never change query results).
    cond = "x BETWEEN 100 AND 150 AND y BETWEEN 100 AND 150"
    a = spark.read.parquet(linear).filter(cond)
    b = spark.read.parquet(zpath).filter(cond)
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_zorder_key_degenerate_and_clamped_inputs(spark):
    """A constant column (span 0) must not divide by zero, and values
    outside the provided stats clamp into [0, 2^bits) instead of
    corrupting neighboring bit planes."""
    import pytest

    from sparktrends_spark.sources.layout import zorder_key

    df = spark.createDataFrame(
        [(5, -100), (5, 0), (5, 2000)], "x long, y long"
    )
    z = df.select(
        zorder_key(
            ["x", "y"], {"x": 5, "y": 0}, {"x": 5, "y": 1000}, bits=8
        ).alias("z")
    ).collect()
    vals = [r["z"] for r in z]
    assert all(v >= 0 for v in vals)
    # y=-100 clamps to 0 -> same key as y=0; y=2000 clamps to max
    assert vals[0] == vals[1]
    assert vals[2] == max(vals)

    with pytest.raises(ValueError):
        zorder_key(["x", "y"], {}, {}, bits=32)  # 64 bits > signed range


def test_scan_pruned_reads_fewer_files_and_is_lossless(spark, tmp_path):
    """Footer-stats file skipping: on a Z-ordered layout the skipping
    reader hands Spark a strict subset of files (inputFiles) for a
    rectangle predicate, and its result equals the full-scan filter."""
    from pyspark.sql import functions as F

    from sparktrends_spark.sources.layout import scan_pruned, zorder_write

    df = spark.range(20_000).selectExpr(
        "id AS event_id",
        "CAST(pmod(id * 2654435761, 50) AS INT) AS user_id",
        "CAST(pmod(id * 40503, 500) AS DOUBLE) AS value",
    )
    dest = str(tmp_path / "z")
    zorder_write(df, ["user_id", "value"], dest, n_files=16)

    ranges = {"user_id": (3, 9), "value": (50.0, 250.0)}
    pruned = scan_pruned(spark, dest, ranges)
    full = spark.read.parquet(dest).filter(
        F.col("user_id").between(3, 9) & F.col("value").between(50.0, 250.0)
    )
    assert len(pruned.inputFiles()) < len(
        spark.read.parquet(dest).inputFiles()
    )
    a = sorted(r.event_id for r in pruned.select("event_id").collect())
    b = sorted(r.event_id for r in full.select("event_id").collect())
    assert a == b and len(a) > 0


def test_scan_pruned_empty_rectangle(spark, tmp_path):
    from sparktrends_spark.sources.layout import scan_pruned, zorder_write

    df = spark.range(1000).selectExpr(
        "id AS event_id",
        "CAST(pmod(id, 50) AS INT) AS user_id",
        "CAST(pmod(id, 500) AS DOUBLE) AS value",
    )
    dest = str(tmp_path / "z")
    zorder_write(df, ["user_id", "value"], dest, n_files=4)
    out = scan_pruned(spark, dest, {"user_id": (900, 950), "value": (0.0, 1.0)})
    assert out.count() == 0
    assert "event_id" in out.columns


def test_stats_manifest_caches_envelopes_and_detects_staleness(spark, tmp_path):
    """build_stats_manifest collects footer envelopes once; scan_pruned
    plans from the cache (same file selection as live footers), and a
    rewritten file invalidates its entry via size/mtime so pruning is
    never wrong against stale stats."""
    import json
    import os

    from pyspark.sql import functions as F

    from sparktrends_spark.sources.layout import (
        STATS_MANIFEST,
        build_stats_manifest,
        scan_pruned,
        zorder_write,
    )

    df = spark.range(10_000).selectExpr(
        "id AS event_id",
        "CAST(pmod(id * 2654435761, 50) AS INT) AS user_id",
        "CAST(pmod(id * 40503, 500) AS DOUBLE) AS value",
    )
    dest = str(tmp_path / "z")
    zorder_write(df, ["user_id", "value"], dest, n_files=8)

    ranges = {"user_id": (3, 9), "value": (50.0, 250.0)}
    live = sorted(scan_pruned(spark, dest, ranges).inputFiles())
    build_stats_manifest(dest)
    assert os.path.isfile(os.path.join(dest, STATS_MANIFEST))
    cached = sorted(scan_pruned(spark, dest, ranges).inputFiles())
    assert cached == live

    # poison the manifest for one file: pretend it covers nothing.
    # size/mtime still match, so the (wrong) cached envelope is used —
    # proving the cache is actually consulted...
    mp = os.path.join(dest, STATS_MANIFEST)
    m = json.load(open(mp))
    victim = os.path.relpath(
        live[0].replace("file:", ""), dest
    )
    m["files"][victim]["cols"]["user_id"] = [10_000, 10_001]
    json.dump(m, open(mp, "w"))
    spark.catalog.refreshByPath(dest)
    poisoned = sorted(scan_pruned(spark, dest, ranges).inputFiles())
    assert len(poisoned) == len(live) - 1

    # ...and rewriting the file on disk invalidates the stale entry
    # (size/mtime mismatch -> live footer read -> correct again)
    vf = os.path.join(dest, victim)
    sub = spark.read.parquet(vf)
    tmp_out = str(tmp_path / "one")
    sub.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    part = next(
        os.path.join(tmp_out, f)
        for f in os.listdir(tmp_out)
        if f.endswith(".parquet")
    )
    os.replace(part, vf)
    crc = os.path.join(
        os.path.dirname(vf), f".{os.path.basename(vf)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    spark.catalog.refreshByPath(dest)
    refreshed = sorted(scan_pruned(spark, dest, ranges).inputFiles())
    assert len(refreshed) == len(live)
    # result correctness end-to-end after all of it
    full = spark.read.parquet(dest).filter(
        F.col("user_id").between(3, 9) & F.col("value").between(50.0, 250.0)
    )
    got = scan_pruned(spark, dest, ranges)
    assert sorted(r.event_id for r in got.collect()) == sorted(
        r.event_id for r in full.collect()
    )


def test_bloom_index_point_lookup_prunes_without_false_negatives(spark, tmp_path):
    """High-cardinality point lookups: min/max envelopes can't prune a
    randomly distributed key, the Bloom sidecar can — strict inputFiles
    subset, result identical to a full-scan IN filter (zero false
    negatives by construction), and a stale entry degrades to
    accept-the-file, never to missing rows."""
    from pyspark.sql import functions as F

    from sparktrends_spark.sources.bloom import build_bloom_index, scan_bloom

    dest = str(tmp_path / "t")
    # ids shuffled across 16 files: every file's [min, max] spans ~the
    # whole domain, so range stats prune nothing
    spark.range(50_000).selectExpr(
        "CAST(pmod(id * 2654435761, 1000000007) AS LONG) AS event_id",
        "id AS payload",
    ).repartition(16).write.parquet(dest)

    build_bloom_index(dest, "event_id", fpp=0.01)
    probe = [
        r.event_id
        for r in spark.read.parquet(dest).limit(3).collect()
    ]
    got = scan_bloom(spark, dest, "event_id", probe)
    full = spark.read.parquet(dest).filter(F.col("event_id").isin(probe))
    assert len(got.inputFiles()) < len(spark.read.parquet(dest).inputFiles())
    assert sorted(r.payload for r in got.collect()) == sorted(
        r.payload for r in full.collect()
    )
    assert got.count() >= 3

    # absent key: most (often all) files rejected, zero rows
    none = scan_bloom(spark, dest, "event_id", [-1])
    assert none.count() == 0

    # staleness: rewrite one file in place -> its entry is ignored
    # (file accepted), results stay correct
    import os

    victim = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(dest)
        for f in fs
        if f.endswith(".parquet")
    )[0]
    sub = spark.read.parquet(victim).limit(10)
    tmp_out = str(tmp_path / "one")
    sub.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    part = next(
        os.path.join(tmp_out, f)
        for f in os.listdir(tmp_out)
        if f.endswith(".parquet")
    )
    os.replace(part, victim)
    crc = os.path.join(
        os.path.dirname(victim), f".{os.path.basename(victim)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    spark.catalog.refreshByPath(dest)
    again = scan_bloom(spark, dest, "event_id", probe)
    full2 = spark.read.parquet(dest).filter(F.col("event_id").isin(probe))
    assert sorted(r.payload for r in again.collect()) == sorted(
        r.payload for r in full2.collect()
    )


def test_bloom_probe_type_mismatch_never_false_negative(spark, tmp_path):
    """A probe whose Python type differs from the stored column type
    (1.0 vs 1, '1' vs 1, int vs double column) must hash to the same
    bits as the stored value — Spark's exact `isin` coerces and
    matches, so a type-sensitive hash would skip a file that contains
    the row (false negative). Canonicalization (bloom._canon) makes
    numerically equal values hash identically."""
    from pyspark.sql import functions as F

    from sparktrends_spark.sources.bloom import build_bloom_index, scan_bloom

    # long column probed with float and string forms
    ints = str(tmp_path / "ints")
    spark.range(2_000).selectExpr(
        "CAST(pmod(id * 2654435761, 1000003) AS LONG) AS k", "id AS payload"
    ).repartition(8).write.parquet(ints)
    build_bloom_index(ints, "k", fpp=0.01)
    stored = [r.k for r in spark.read.parquet(ints).limit(3).collect()]
    for probe in ([float(v) for v in stored], [str(v) for v in stored]):
        got = scan_bloom(spark, ints, "k", probe)
        full = spark.read.parquet(ints).filter(F.col("k").isin(probe))
        assert sorted(r.payload for r in got.collect()) == sorted(
            r.payload for r in full.collect()
        )
        assert got.count() >= 3, f"false negative for probe {probe!r}"

    # double column (integral values) probed with plain ints
    dbls = str(tmp_path / "dbls")
    spark.range(2_000).selectExpr(
        "CAST(pmod(id * 37, 997) AS DOUBLE) AS k", "id AS payload"
    ).repartition(8).write.parquet(dbls)
    build_bloom_index(dbls, "k", fpp=0.01)
    int_probe = [int(r.k) for r in spark.read.parquet(dbls).limit(3).collect()]
    got = scan_bloom(spark, dbls, "k", int_probe)
    full = spark.read.parquet(dbls).filter(F.col("k").isin(int_probe))
    assert got.count() == full.count() and got.count() >= 3


def test_bloom_large_integral_cross_type_probe(spark, tmp_path):
    """Integral magnitudes >= 2^53: the exact int and its nearest
    double are distinct decimal strings (canon-v2 hashed the float via
    repr() scientific notation — numerically equal value, different
    bits, false negative under isin's type coercion). canon-v3 hashes
    both forms, so a bigint column probed with equal doubles — and a
    double column probed with big ints — never skips a matching file."""
    from pyspark.sql import functions as F

    from sparktrends_spark.sources.bloom import build_bloom_index, scan_bloom

    big = 2**60
    # bigint column probed with an equal double: Spark coerces the
    # column to double, every value within the double's ULP matches
    ints = str(tmp_path / "big_ints")
    spark.createDataFrame(
        [(big + i, i) for i in range(8)], "k long, payload int"
    ).repartition(4).write.parquet(ints)
    build_bloom_index(ints, "k", fpp=0.01)
    probe = [float(big)]
    got = scan_bloom(spark, ints, "k", probe)
    full = spark.read.parquet(ints).filter(F.col("k").isin(probe))
    assert got.count() == full.count() and full.count() >= 1

    # double column probed with a big int not exactly representable
    dbls = str(tmp_path / "big_dbls")
    spark.createDataFrame(
        [(float(big), 0), (float(big) + 4096.0, 1)], "k double, payload int"
    ).repartition(2).write.parquet(dbls)
    build_bloom_index(dbls, "k", fpp=0.01)
    int_probe = [big + 1]  # rounds to float(big) under coercion
    got = scan_bloom(spark, dbls, "k", int_probe)
    full = spark.read.parquet(dbls).filter(F.col("k").isin(int_probe))
    assert got.count() == full.count() and full.count() >= 1


def test_incremental_index_maintenance_touches_only_new_files(spark, tmp_path):
    """Append workload: incremental refresh keeps current entries
    byte-identical (no re-read — proven by preserving a poisoned
    marker), indexes the appended files, drops deleted ones, and both
    skipping readers stay correct."""
    import json
    import os

    from pyspark.sql import functions as F

    from sparktrends_spark.sources.bloom import (
        _bloom_path,
        build_bloom_index,
        scan_bloom,
    )
    from sparktrends_spark.sources.layout import (
        STATS_MANIFEST,
        build_stats_manifest,
        scan_pruned,
    )

    dest = str(tmp_path / "t")
    spark.range(5_000).selectExpr(
        "CAST(pmod(id * 2654435761, 1000003) AS LONG) AS event_id",
        "CAST(pmod(id, 50) AS INT) AS user_id",
        "CAST(pmod(id * 40503, 500) AS DOUBLE) AS value",
    ).repartition(4).write.parquet(dest)
    build_stats_manifest(dest)
    build_bloom_index(dest, "event_id")

    # plant a marker in one current entry of each sidecar: an
    # incremental refresh must carry it through untouched (proving it
    # did not re-read that file)
    sp = os.path.join(dest, STATS_MANIFEST)
    m = json.load(open(sp))
    k0 = sorted(m["files"])[0]
    m["files"][k0]["_marker"] = 1
    json.dump(m, open(sp, "w"))
    bp = _bloom_path(dest, "event_id")
    b = json.load(open(bp))
    b["files"][k0]["_marker"] = 1
    json.dump(b, open(bp, "w"))

    # append new files
    spark.range(5_000, 7_000).selectExpr(
        "CAST(pmod(id * 2654435761, 1000003) AS LONG) AS event_id",
        "CAST(pmod(id, 50) AS INT) AS user_id",
        "CAST(pmod(id * 40503, 500) AS DOUBLE) AS value",
    ).repartition(2).write.mode("append").parquet(dest)
    spark.catalog.refreshByPath(dest)

    build_stats_manifest(dest, incremental=True)
    build_bloom_index(dest, "event_id", incremental=True)
    m2 = json.load(open(sp))
    b2 = json.load(open(bp))
    n_files = len([
        f for r, _d, fs in os.walk(dest) for f in fs if f.endswith(".parquet")
    ])
    assert len(m2["files"]) == len(b2["files"]) == n_files == 6
    assert m2["files"][k0].get("_marker") == 1  # untouched entry
    assert b2["files"][k0].get("_marker") == 1

    # correctness end-to-end over old + new data
    full = spark.read.parquet(dest)
    probe = [r.event_id for r in full.orderBy(F.desc("event_id")).limit(2).collect()]
    assert (
        scan_bloom(spark, dest, "event_id", probe).count()
        == full.filter(F.col("event_id").isin(probe)).count()
    )
    ranges = {"user_id": (3, 9), "value": (50.0, 250.0)}
    assert (
        scan_pruned(spark, dest, ranges).count()
        == full.filter(
            F.col("user_id").between(3, 9) & F.col("value").between(50.0, 250.0)
        ).count()
    )


def test_term_lookup_prunes_index_partitions(spark, sf_dir):
    from sparktrends_spark.plans import QUERIES

    plan = (
        QUERIES["doc_term_lookup_indexed"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every index scan must carry the probe-bucket partition filter —
    # the lookup opens only the probed terms' bucket directories
    import re

    pf = re.findall(r"PartitionFilters: \[term_bucket#\d+ IN \([\d,]+\)\]", plan)
    assert pf, plan
