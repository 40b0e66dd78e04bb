"""Tracked persist for multi-branch plans.

Spark has no common-subplan reuse across DataFrame branches (only
identical-exchange reuse), so plan builders ``persist()`` any frame
referenced by two branches — LSH band frames, MinHash signatures,
IVF centroid rows — to stop the whole upstream pipeline re-executing
per branch. That caching is correct per query but leaks in a
long-lived session: repeated invocations (bench runs every query
several times) accumulate cached blocks until LRU eviction.

``persist_tracked`` is ``persist`` plus registration in a
module-level list; callers that loop queries (bench, tests, a
service) call ``release_persisted()`` after materializing each
result. Frames persisted inside one query never outlive the caller's
loop iteration, so cache pressure stays bounded by one query's
working set regardless of how many queries a session runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK_DESER
) -> DataFrame:
    """Persist ``df`` and register it for ``release_persisted``."""
    df = df.persist(level)
    _TRACKED.append(df)
    return df


def release_persisted(blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were released.

    Safe to call at any time — a frame the current plan still needs is
    simply recomputed on next use (correctness unaffected).
    """
    n = len(_TRACKED)
    while _TRACKED:
        _TRACKED.pop().unpersist(blocking=blocking)
    return n
