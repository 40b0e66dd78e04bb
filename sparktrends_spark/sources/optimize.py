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
    module docstring. The rewrite path is atomic (temp-dir + rename
    swap); index refreshes are atomic per sidecar; a crash between
    rewrite and refresh leaves stale sidecars, which both readers
    treat as merely unhelpful (stats: live-footer fallback; bloom:
    accept-the-file), never wrong."""
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
        try:
            os.rename(path, old)
            os.rename(tmp, path)
        except OSError:
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
