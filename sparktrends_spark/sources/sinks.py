"""Named-sink registry (SURVEY §2.2 K3).

The reference routed writes through table-specific wrappers
(spark/utilities.py:50-60). Generalized: register a (name -> writer)
mapping once, call ``write(name, df)`` everywhere — keeps the
table/topic/path catalog in one place instead of scattered literals.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

SinkFn = Callable[[DataFrame], None]

_SINKS: dict[str, SinkFn] = {}


def register_sink(name: str, fn: SinkFn) -> None:
    _SINKS[name] = fn


def write(name: str, df: DataFrame) -> None:
    try:
        sink = _SINKS[name]
    except KeyError:
        raise KeyError(
            f"unknown sink {name!r}; registered: {sorted(_SINKS)}"
        ) from None
    sink(df)


def registered_sinks() -> list[str]:
    return sorted(_SINKS)
