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
    assert_query_matches_oracle(spark, sf_dir, name)
