"""Set operations (SURVEY §2.8 — absent in the reference, exposed here).

Thin, explicit wrappers pinning SQL semantics: ``union_distinct``
matches SQL UNION (dedup), ``union_all`` matches UNION ALL,
``intersect``/``except_`` are distinct per ANSI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(a: DataFrame, b: DataFrame, by_name: bool = True) -> DataFrame:
    return a.unionByName(b) if by_name else a.union(b)


def union_distinct(a: DataFrame, b: DataFrame, by_name: bool = True) -> DataFrame:
    return union_all(a, b, by_name).distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_(a: DataFrame, b: DataFrame) -> DataFrame:
    # ANSI EXCEPT: set difference (a row is excluded if it appears in b
    # at all). Spark's subtract() has exactly these semantics;
    # exceptAll() would be EXCEPT ALL (bag difference) instead.
    return a.subtract(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)
