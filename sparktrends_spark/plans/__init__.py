"""Named query registry.

Each module registers queries via ``plans.registry.query``; importing
this package loads them all. ``__spark_entry__`` at the repo root
exposes the registry to the driver.
"""

from sparktrends_spark.plans.registry import ORACLES, QUERIES, query

# Import for registration side effects.
from sparktrends_spark.plans import market  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]


def _load_all() -> None:
    from sparktrends_spark.plans import (  # noqa: F401
        relational,
        windows,
        text,
        similarity,
    )


try:
    _load_all()
except ImportError:  # modules land incrementally during the build
    pass
