"""One-call table maintenance: OPTIMIZE for the filesystem lake.

Delta/Iceberg expose table maintenance as one verb (``OPTIMIZE ...
[ZORDER BY ...]``) that compacts small files, re-clusters, and
refreshes the statistics its planner prunes with. This module is that
verb for the plain-parquet lake the other maintenance primitives in
this package operate on:

``optimize_table(spark, path, zorder_cols=..., bloom_cols=...,
target_file_bytes=...)``:

1. rewrite the directory — Z-order-clustered on ``zorder_cols`` when
   given (``layout.zorder_write``: tight per-file min/max envelopes on
   every clustered column), plain size-targeted compaction otherwise
   (``compaction.compact_parquet_dir``);
2. rebuild the footer-stats manifest (``layout.build_stats_manifest``)
   so ``scan_pruned`` plans from cached envelopes;
3. rebuild per-file Bloom sidecars for ``bloom_cols``
   (``bloom.build_bloom_index``) so point lookups skip files.

Ordering matters: indexes are rebuilt AFTER the rewrite, so their
(size, mtime) staleness keys match the final files. Returns the
before/after file stats plus which indexes were refreshed.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import SparkSession

from sparktrends_spark.sources.bloom import build_bloom_index
from sparktrends_spark.sources.compaction import compact_parquet_dir, dir_stats
from sparktrends_spark.sources.layout import build_stats_manifest, zorder_write


def optimize_table(
    spark: SparkSession,
    path: str,
    zorder_cols: Sequence[str] | None = None,
    bloom_cols: Sequence[str] = (),
    target_file_bytes: int = 128 * 1024 * 1024,
    fpp: float = 0.01,
) -> dict:
    """Compact + (optionally) Z-order + refresh skip indexes. See
    module docstring. The Z-order rewrite swaps via two renames
    (path -> old, tmp -> path): NOT one atomic operation — a reader in
    that window sees the path briefly missing and should retry. Any
    failure after the first rename restores the original directory, so
    the table is never left absent. Index refreshes are atomic per
    sidecar; a crash between rewrite and refresh leaves stale sidecars,
    which both readers treat as merely unhelpful (stats: live-footer
    fallback; bloom: accept-the-file), never wrong. For a bucketed
    UPSERT table with a live writer use ``optimize_upsert_table``,
    which commits per bucket under the manifest lock instead."""
    n_before, bytes_before = dir_stats(path)
    if n_before == 0:
        raise ValueError(f"no parquet files under {path!r}")
    if zorder_cols:
        n_out = max(1, -(-bytes_before // target_file_bytes))
        df = spark.read.parquet(path)
        import shutil
        import uuid

        tmp = f"{path.rstrip('/')}__opt_{uuid.uuid4().hex[:8]}"
        old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
        zorder_write(df, list(zorder_cols), tmp, n_files=int(n_out))
        os.rename(path, old)
        try:
            # the non-atomic window: `path` is absent between the two
            # renames. ANY failure from here on restores the original
            # directory so the table is never left missing.
            os.rename(tmp, path)
        except BaseException:
            if os.path.exists(old) and not os.path.exists(path):
                os.rename(old, path)
            raise
        shutil.rmtree(old)
        stats = {"files_before": n_before, "bytes_before": bytes_before}
        n_after, bytes_after = dir_stats(path)
        stats.update({"files_after": n_after, "bytes_after": bytes_after})
    else:
        stats = compact_parquet_dir(
            spark, path, target_file_bytes=target_file_bytes
        )
    spark.catalog.refreshByPath(path)
    build_stats_manifest(path)
    for col in bloom_cols:
        build_bloom_index(path, col, fpp=fpp)
    stats["zorder_cols"] = list(zorder_cols) if zorder_cols else []
    stats["stats_manifest"] = True
    stats["bloom_cols"] = list(bloom_cols)
    return stats


def _snapshot_references(final: str, _sinks, bucket: str, version: str) -> bool:
    """True if any retained time-travel snapshot's manifest points
    ``bucket`` at ``version``. Call under the manifest lock: snapshots
    are only ever written under it, so the answer cannot go stale
    between check and the caller's delete."""
    for s in _sinks.list_snapshots(final):
        with open(_sinks._snapshot_path(final, s)) as fh:
            if str(json.load(fh)["buckets"].get(bucket)) == version:
                return True
    return False


def optimize_upsert_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: Sequence[str] | None = None,
    on_before_commit=None,
) -> dict:
    """Compact a BUCKETED UPSERT table (streaming/sinks layout) while a
    live stream may be committing batches — the maintenance-vs-writer
    race Delta/Iceberg solve with log-commit CAS, implemented here on
    the manifest:

    Per bucket: (1) read the committed leaf, (2) write a compacted
    twin off to the side under ``_v=<old>_c<tag>`` (invisible — no
    manifest pointer), (3) under the manifest lock, re-read the
    manifest and flip the bucket's pointer ONLY IF it still points at
    the leaf we compacted (compare-and-swap); if a stream batch
    re-pointed the bucket in the meantime, its leaf is already freshly
    written — discard ours and move on. The upsert commit side holds
    the same lock and merge-commits only its touched buckets
    (sinks.upsert_parquet_bucketed), so neither writer can dangle the
    other's pointers. No committed row is ever lost: every pointer
    flip is old-leaf -> byte-equal-rows compacted leaf, and losing a
    CAS just wastes the compaction work.

    The superseded old leaf is deleted post-CAS unless a retained
    time-travel snapshot references it. A reader mid-scan of a leaf
    deleted under it fails and retries with the new manifest — the
    same single-writer-filesystem caveat the upsert GC documents;
    snapshot-isolated readers are what a real table-format log adds.

    ``sort_cols`` clusters rows WITHIN each compacted leaf (sort before
    write), tightening per-row-group min/max stats so a later filtered
    scan skips row groups inside the bucket — the per-bucket analogue
    of the flat lake's Z-order pass.

    ``on_before_commit(bucket)`` is a test seam invoked between (2)
    and (3) to interleave a concurrent writer deterministically.

    Returns {"compacted": [...buckets...], "skipped": [...lost CAS...]}.
    """
    import shutil
    import uuid

    from sparktrends_spark.streaming import sinks as _sinks

    final = path.rstrip("/")
    manifest = _sinks.read_manifest(final)
    if manifest is None:
        raise ValueError(f"{final}: not a bucketed upsert table (no manifest)")
    # Sweep orphans from a previously CRASHED optimize: a kill between
    # leaf rewrite and CAS leaves invisible ``_v=*_c*`` dirs no pointer
    # references. They are only ever created by this function, so with
    # the documented single-maintenance-job-at-a-time contract they are
    # safe to delete under the lock (a live upsert stream never writes
    # ``_c``-tagged leaves). Snapshot refs are read UNDER the lock —
    # snapshots are only written under it, so the live set cannot miss
    # a concurrently-committed snapshot.
    with _sinks._manifest_lock(final):
        snapshot_refs: set[tuple[str, str]] = set()
        for s in _sinks.list_snapshots(final):
            with open(_sinks._snapshot_path(final, s)) as fh:
                for b, v in json.load(fh)["buckets"].items():
                    snapshot_refs.add((str(b), str(v)))
        fresh = _sinks.read_manifest(final) or {"buckets": {}}
        live = {
            (str(b), str(v)) for b, v in fresh["buckets"].items()
        } | snapshot_refs
        for entry in os.listdir(final):
            if not entry.startswith(f"{_sinks.BUCKET_COL}="):
                continue
            b = entry.split("=", 1)[1]
            bdir = os.path.join(final, entry)
            for leaf in os.listdir(bdir):
                v = leaf.split("=", 1)[1] if "=" in leaf else ""
                if "_c" in v and (b, v) not in live:
                    shutil.rmtree(os.path.join(bdir, leaf), ignore_errors=True)
    compacted, skipped = [], []
    for b in sorted(manifest["buckets"], key=int):
        # re-resolve the bucket's pointer fresh each iteration: a
        # stream batch committed mid-run may have re-pointed (and GC'd)
        # leaves our startup snapshot still referenced
        current = _sinks.read_manifest(final) or {"buckets": {}}
        v = current["buckets"].get(str(b))
        leaf = f"{final}/{_sinks.BUCKET_COL}={b}/{_sinks.VERSION_DIR_COL}={v}"
        if v is None or not os.path.isdir(leaf):
            skipped.append(str(b))
            continue
        leaf_bytes = sum(
            os.path.getsize(os.path.join(leaf, f))
            for f in os.listdir(leaf)
            if f.endswith(".parquet")
        )
        n_files = max(1, -(-leaf_bytes // target_file_bytes))
        df = _sinks._leaf_reader(spark, final, manifest).parquet(leaf)
        new_tag = f"{v}_c{uuid.uuid4().hex[:8]}"
        new_leaf = f"{final}/{_sinks.BUCKET_COL}={b}/{_sinks.VERSION_DIR_COL}={new_tag}"
        out = df.drop(_sinks.BUCKET_COL, _sinks.VERSION_DIR_COL).coalesce(
            int(n_files)
        )
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        out.write.parquet(new_leaf)
        if on_before_commit is not None:
            on_before_commit(b)
        referenced = True
        with _sinks._manifest_lock(final):
            fresh = _sinks.read_manifest(final)
            if fresh is not None and str(fresh["buckets"].get(str(b))) == str(v):
                fresh["buckets"][str(b)] = new_tag
                _sinks._write_manifest_atomic(final, fresh)
                committed = True
                # decide the old leaf's fate UNDER the same lock the
                # upsert commit writes snapshots under: a concurrent
                # batch (retain_history > 0) may have committed a NEW
                # snapshot since our startup scan that still references
                # this bucket's old leaf — deleting it would break
                # read_upserted_as_of for that snapshot. Any snapshot
                # written AFTER this CAS captures the post-CAS manifest
                # (new_tag), so checking here is race-free.
                referenced = _snapshot_references(
                    final, _sinks, str(b), str(v)
                )
            else:
                committed = False
        if committed:
            compacted.append(str(b))
            if not referenced:
                shutil.rmtree(leaf, ignore_errors=True)
        else:
            # a stream batch re-pointed this bucket mid-compaction:
            # its leaf is newer than our input — discard our twin
            skipped.append(str(b))
            shutil.rmtree(new_leaf, ignore_errors=True)
    spark.catalog.refreshByPath(final)
    return {"compacted": compacted, "skipped": skipped}
