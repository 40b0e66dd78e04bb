"""Small-files compaction for parquet directories.

The classic 100 TB lake failure mode: streaming sinks and per-batch
writers leave thousands of KB-scale files per partition, and every
downstream scan pays file-open + footer-parse + scheduler overhead per
file. Compaction rewrites a directory to approximately
``target_file_bytes``-sized files.

Atomicity: the rewrite lands in a sibling temp directory first and is
swapped in with two renames (dir moves are atomic on POSIX; on object
stores swap per-partition or use a table format's commit protocol —
this module is the filesystem-lake form). A reader holding the old
directory listing keeps reading the old files until the swap, never a
half-written mix. Reference intent: the reference's parquet landing
zone (docker-compose volumes) has no compaction at all — this is the
maintenance op a real deployment adds first.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory."""
    n = total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 1,
) -> dict:
    """Rewrite ``path`` into ceil(total_bytes / target)-many files
    (at least ``min_files``), atomically. Returns before/after stats.

    The file count is derived from the directory's ACTUAL byte size,
    not row counts — parquet compresses, so sizing from data volume is
    the only estimate that tracks the target. Row-group layout inside
    each output file is the writer default.
    """
    n_before, bytes_before = dir_stats(path)
    if n_before == 0:
        raise ValueError(f"no parquet files under {path!r}")
    n_out = max(min_files, -(-bytes_before // target_file_bytes))

    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    # coalesce, not repartition: narrowing needs no shuffle; if the
    # directory has fewer input splits than n_out this keeps them
    df.coalesce(int(n_out)).write.mode("overwrite").parquet(tmp)
    try:
        os.rename(path, old)
        os.rename(tmp, path)
    except OSError:
        if os.path.exists(old) and not os.path.exists(path):
            os.rename(old, path)  # roll back
        raise
    shutil.rmtree(old)
    n_after, bytes_after = dir_stats(path)
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes_before": bytes_before,
        "bytes_after": bytes_after,
    }
