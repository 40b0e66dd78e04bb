"""Query/oracle registry.

A query is ``fn(spark, sf_dir) -> DataFrame``. An oracle is the
equivalent ANSI SQL DuckDB runs over the same parquet tables (views
``region nation customer supplier part orders lineitem events
documents embeddings``). Column names must match exactly — the driver
sorts columns by name before hashing values.

Queries registered with ``oracle=None`` get the driver's weaker
rows-only check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def register(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return register
