#!/usr/bin/env python
"""Isolate one registry query's computation time with the noop sink
(guide §1.4): build a fresh DataFrame per attempt, write to the noop
format (computes every column of every row, discards the result), and
report per-attempt build + exec seconds plus the executed plan.

Usage:
    python scripts/time_query.py name [name ...] [--n 3] [--sf /root/testdata/sf0.1]
    python scripts/time_query.py name --plan   # also print the final AQE plan

Timings here are for RELATIVE comparison during optimization work; the
committed bench numbers come from bench.py (toPandas methodology,
idle machine).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plan", action="store_true")
    args = ap.parse_args()

    from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import (
        REGISTRY,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.session import get_spark

    spark = get_spark("time-query")
    # JVM warmup, same spirit as bench.py
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        REGISTRY["rewards_by_member"].spark_fn(spark, warm).count()
        REGISTRY["latest_event_per_user"].spark_fn(spark, warm).count()

    for name in args.names:
        q = REGISTRY[name]
        execs, builds = [], []
        df = None
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"time_query:{name}")
            tb = time.perf_counter()
            df = q.spark_fn(spark, args.sf)
            builds.append(time.perf_counter() - tb)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            execs.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: exec best={min(execs):.3f} all={[round(t,3) for t in execs]}"
            f" | build best={min(builds):.3f} all={[round(t,3) for t in builds]}"
        )
        if args.plan and df is not None:
            print(df._jdf.queryExecution().executedPlan().toString())
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
