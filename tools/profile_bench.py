#!/usr/bin/env python
"""Per-query profiling harness for the optimization rounds (guide §1).

Mirrors bench.py's methodology (same warmup, same noop sink, min-of-3)
but additionally records, per headline query:

- wall seconds (each rep, not just min)
- Spark job count / stage count / task count for the timed rep
  (via the status tracker's job-id delta — counts every action the
  query's plan builder triggers, not just the final noop write)
- the formatted physical plan, written to ``plans/<tag>/<q>_<when>.txt``

Usage:
    python tools/profile_bench.py [--queries a,b,c] [--tag r14]
        [--when before|after] [--sf-dir DIR] [--no-plans]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--when", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import HEADLINE
    from sparktrends_spark.caching import release_persisted
    from sparktrends_spark.plans import QUERIES
    from sparktrends_spark.session import get_spark

    names = args.queries.split(",") if args.queries else HEADLINE
    plans_dir = os.path.join(REPO_ROOT, "plans", args.tag)
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("sparktrends-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # Same warmup as bench.py: page-cache the inputs, compile the plans.
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        spark.read.parquet(f"{args.sf_dir}/{t}.parquet").write.format(
            "noop"
        ).mode("overwrite").save()
    for warm_q in names:
        QUERIES[warm_q](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
        release_persisted()

    out: dict[str, dict] = {}
    for name in names:
        sc.setJobDescription(f"profile:{name}")
        reps = []
        jobs = stages = tasks = 0
        for rep in range(args.reps):
            before_ids = set(tracker.getJobIdsForGroup(None) or [])
            start = time.perf_counter()
            df = QUERIES[name](spark, args.sf_dir)
            built = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - start
            reps.append(round(elapsed, 3))
            if rep == args.reps - 1:
                after_ids = set(tracker.getJobIdsForGroup(None) or [])
                new_ids = sorted(after_ids - before_ids)
                jobs = len(new_ids)
                for jid in new_ids:
                    info = tracker.getJobInfo(jid)
                    if info is None:
                        continue
                    stages += len(info.stageIds)
                    for sid in info.stageIds:
                        sinfo = tracker.getStageInfo(sid)
                        if sinfo is not None:
                            tasks += sinfo.numTasks
                if not args.no_plans:
                    plan = df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                    )
                    with open(
                        os.path.join(plans_dir, f"{name}_{args.when}.txt"), "w"
                    ) as fh:
                        fh.write(plan)
                out[name] = {
                    "reps": reps,
                    "min": min(reps),
                    "build_s": round(built - start, 3),
                    "jobs": jobs,
                    "stages": stages,
                    "tasks": tasks,
                }
        release_persisted()
        sc.setJobDescription(None)
        print(json.dumps({name: out[name]}), flush=True)

    total = round(sum(v["min"] for v in out.values()), 3)
    print(json.dumps({"total_min_sum": total, "sf_dir": args.sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
