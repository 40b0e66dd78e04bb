"""Targeted key deletion from a parquet directory (surgical rewrite).

The "right to be forgotten" op a data lake needs: delete every row
whose key is in a given set, WITHOUT rewriting the table. At 100 TB a
full-table rewrite for a 50-user GDPR request is absurd; the deletion
cost should be proportional to the files that actually contain the
keys. This module:

1. locates affected files distributedly — one projected scan of the
   key column with ``input_file_name()``, filtered by a broadcast of
   the key set, aggregated to the distinct file list (tiny);
2. rewrites ONLY those files (filter-out + write + atomic rename),
   leaving every other file byte-identical on disk;
3. drops a file entirely when all its rows matched.

Like `compaction.py`, this is the single-writer filesystem-lake form:
each replacement file lands under a temp name in the same directory
and is renamed over the original (atomic on POSIX). A concurrent
reader that listed the directory earlier keeps reading consistent old
bytes per file; table-format-grade snapshot isolation needs a commit
log (out of scope, documented). Reference scope note: the reference
retains raw parquet forever with no maintenance ops.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def find_files_with_keys(
    spark: SparkSession, path: str, key_col: str, keys: Sequence
) -> list[str]:
    """Distinct files under ``path`` containing any of ``keys``.

    Projected single-column scan; parquet row-group stats and
    dictionary filtering make the membership filter cheap, and only
    (file, key-hit) pairs pre-aggregated map-side reach the driver."""
    df = spark.read.parquet(path)
    hits = (
        df.select(F.col(key_col), F.input_file_name().alias("_f"))
        .filter(F.col(key_col).isin(list(keys)))
        .select("_f")
        .distinct()
        .collect()
    )
    # input_file_name returns URIs (file:///..., %-encoded); normalize
    # to plain filesystem paths so they compare equal to os.walk output
    from urllib.parse import unquote, urlparse

    return sorted(unquote(urlparse(r["_f"]).path) for r in hits)


def delete_keys(
    spark: SparkSession, path: str, key_col: str, keys: Sequence
) -> dict:
    """Delete all rows with ``key_col`` in ``keys`` from the parquet
    directory at ``path``, rewriting only affected files.

    Returns stats: files seen / rewritten / removed and rows deleted.
    Untouched files are not opened for write at all (their inodes and
    mtimes are preserved — asserted in tests)."""
    before_files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    targets = find_files_with_keys(spark, path, key_col, keys)
    rows_deleted = 0
    rewritten = removed = 0
    for fp in targets:
        df = spark.read.parquet(fp)
        # NULL-keyed rows are explicitly kept: `~isin` evaluates to
        # NULL (not true) for a NULL key, so without the isNull() arm
        # the filter would silently drop rows it was never asked to
        # delete — and count them as deleted.
        keep_cond = F.col(key_col).isNull() | ~F.col(key_col).isin(
            list(keys)
        )
        keep = df.filter(keep_cond)
        # one aggregate pass for both counts (not two .count() actions
        # re-scanning the file): total rows + surviving rows
        counts = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.when(keep_cond, 1)), F.lit(0)
            ).alias("k"),
        ).head()
        n_keep = counts["k"]
        rows_deleted += counts["n"] - n_keep
        # Hadoop's local FS keeps a ".{name}.crc" checksum sidecar per
        # file; after replacing the bytes the stale sidecar fails every
        # read (ChecksumException), so it must go with the original.
        crc = os.path.join(
            os.path.dirname(fp), f".{os.path.basename(fp)}.crc"
        )
        if n_keep == 0:
            os.remove(fp)
            if os.path.exists(crc):
                os.remove(crc)
            removed += 1
            continue
        # Write the replacement as a single file next to the original,
        # then rename over it — readers never see a half-written file.
        # The temp dir is dot-prefixed: Spark's file listing skips
        # hidden paths, so a crash between write and cleanup leaves a
        # dir that does NOT break partition discovery over the table.
        tmp_dir = os.path.join(
            os.path.dirname(fp),
            f".{os.path.basename(fp)}__del_{uuid.uuid4().hex[:8]}",
        )
        keep.coalesce(1).write.mode("overwrite").parquet(tmp_dir)
        part = next(
            os.path.join(tmp_dir, f)
            for f in os.listdir(tmp_dir)
            if f.endswith(".parquet")
        )
        os.replace(part, fp)
        # carry the replacement's checksum sidecar over (renamed to
        # match fp), so checksummed readers stay verified
        new_crc = os.path.join(tmp_dir, f".{os.path.basename(part)}.crc")
        if os.path.exists(new_crc):
            os.replace(new_crc, crc)
        elif os.path.exists(crc):
            os.remove(crc)
        for leftover in os.listdir(tmp_dir):
            os.remove(os.path.join(tmp_dir, leftover))
        os.rmdir(tmp_dir)
        rewritten += 1
    # Spark's FileStatusCache remembers (size, mtime) per listed path;
    # after an in-place replace a stale entry makes readers chase old
    # byte ranges. Invalidate the directory explicitly.
    spark.catalog.refreshByPath(path)
    return {
        "files_total": len(before_files),
        "files_rewritten": rewritten,
        "files_removed": removed,
        "rows_deleted": rows_deleted,
    }
