"""Tracked persist for multi-branch plans.

Spark has no common-subplan reuse across DataFrame branches (only
identical-exchange reuse), so plan builders ``persist()`` any frame
referenced by two branches — LSH band frames, MinHash signatures,
IVF centroid rows — to stop the whole upstream pipeline re-executing
per branch. That caching is correct per query but leaks in a
long-lived session: repeated invocations (bench runs every query
several times) accumulate cached blocks until LRU eviction.

``persist_tracked`` is ``persist`` plus registration in a
**thread-local** list; callers that loop queries (bench, tests, a
service) call ``release_persisted()`` after materializing each
result. Tracking is scoped per thread so two threads (or sessions in
one process) building/releasing concurrently cannot unpersist each
other's pinned frames mid-execution — releasing another query's
branch cache would silently degrade it to full branch recompute.
Register and release on the same thread; frames persisted on a
thread that never calls ``release_persisted`` are unpinned only by
LRU eviction, same as an untracked ``persist``.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LOCAL = threading.local()


def _tracked() -> list[DataFrame]:
    frames = getattr(_LOCAL, "frames", None)
    if frames is None:
        frames = _LOCAL.frames = []
    return frames


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK_DESER
) -> DataFrame:
    """Persist ``df`` and register it for ``release_persisted``."""
    df = df.persist(level)
    _tracked().append(df)
    return df


def release_persisted(blocking: bool = False) -> int:
    """Unpersist every frame tracked by THIS thread; returns the count.

    Safe to call at any time — a frame the current plan still needs is
    simply recomputed on next use (correctness unaffected).
    """
    frames = _tracked()
    n = len(frames)
    while frames:
        frames.pop().unpersist(blocking=blocking)
    return n
