"""Every oracled query in the registry must match DuckDB at sf0.001.

This mirrors the driver's CORRECTNESS gate (see __spark_entry__) so
regressions surface locally first.
"""

from __future__ import annotations

import pytest

from sparktrends_spark.plans import ORACLES

from tests.oracle_utils import assert_query_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    # exact=True mirrors the driver's value hasher (stringified cells,
    # bit-exact floats) — the tolerant comparison let 1-ULP
    # aggregation-order drift hide until the driver flagged it (r7)
    assert_query_matches_oracle(spark, sf_dir, name, exact=True)


def test_approx_distinct_raw_estimate_within_3_sigma(spark, sf_dir):
    """Tighter companion to the graded 5-sigma bound baked into
    priority_approx_distinct: the RAW HLL++ estimate must sit within
    3 * rsd of the exact per-group count (rsd=0.02 -> 6%)."""
    from pyspark.sql import functions as F

    from sparktrends_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    rows = (
        o.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
            F.countDistinct("o_custkey").alias("exact"),
        )
        .collect()
    )
    assert rows
    worst = max(abs(r.approx - r.exact) / r.exact for r in rows)
    print(f"approx_count_distinct worst relative error: {worst:.4f}")
    assert worst <= 3 * 0.02, worst
