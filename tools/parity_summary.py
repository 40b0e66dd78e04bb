"""Full-registry oracle-parity sweep -> PARITY.json (round hygiene).

The grading driver samples ~50 queries per round; this sweep runs EVERY
registered query against its DuckDB oracle (same comparison as
tests/oracle_utils) with a vanilla SparkSession, so a red query can't
hide behind driver sampling. Commit the artifact with each round.

Usage: python tools/parity_summary.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("parity-summary")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry
    from tests.oracle_utils import assert_query_matches_oracle

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures: dict[str, str] = {}
    rows_only: list[str] = sorted(set(queries) - set(oracles))
    for name in sorted(oracles):
        try:
            assert_query_matches_oracle(spark, sf_dir, name)
        except Exception as exc:  # noqa: BLE001 - summarize, don't abort
            failures[name] = str(exc)[:300]
    for name in rows_only:
        try:
            assert queries[name](spark, sf_dir).count() >= 0
        except Exception as exc:  # noqa: BLE001
            failures[name] = str(exc)[:300]

    summary = {
        "sf_dir": sf_dir,
        "n_registered": len(queries),
        "n_oracled": len(oracles),
        "n_rows_only": len(rows_only),
        "rows_only": rows_only,
        "n_parity_pass": len(oracles) - sum(1 for f in failures if f in oracles),
        "failures": failures,
    }
    with open("/root/repo/PARITY.json", "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "failures"}))
    if failures:
        print("FAILURES:", json.dumps(failures, indent=2))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
