#!/usr/bin/env python
"""Foreign-CWD pre-drive of driver-window queries against the DuckDB oracle.

Replays the driver's correctness gate (CORRECTNESS_r{N}.json) offline so a
window rotation is de-risked BEFORE registration day: run from any directory
(deliberately NOT /root/repo — pickle/path bugs that only bite under the
driver's CWD surface here first), it imports the registry, runs each named
query on Spark and its oracle SQL on DuckDB at sf0.01, and compares row
count + column names + order-insensitive values exactly like tests/oracle.py.

Usage:
    python /root/repo/scripts/predrive.py name1 name2 ...
    python /root/repo/scripts/predrive.py --window   # current driver window
    python /root/repo/scripts/predrive.py --all      # full registry sweep
    python /root/repo/scripts/predrive.py --cohort 8 # latest-green==r8 set

Exits non-zero on any mismatch; prints a one-line JSON summary.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CORRECTNESS", "/root/testdata/sf0.01")


def _cohort(round_n: int) -> list[str]:
    """Names whose latest green hash row is CORRECTNESS_r{round_n}."""
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        for k, v in json.load(open(f)).items():
            if (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("hash_match")
                and v.get("schema_match")
            ):
                latest[k] = max(latest.get(k, 0), rnd)
    return sorted(k for k, r in latest.items() if r == round_n)


def main(argv: list[str]) -> int:
    from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import (
        _DRIVER_WINDOW_PRIORITY,
        REGISTRY,
    )

    if argv and argv[0] == "--all":
        names = sorted(REGISTRY)
    elif argv and argv[0] == "--window":
        names = list(_DRIVER_WINDOW_PRIORITY)
    elif argv and argv[0] == "--cohort":
        if len(argv) < 2 or not argv[1].isdigit():
            print("usage: predrive.py --cohort <round_number>", file=sys.stderr)
            return 2
        names = _cohort(int(argv[1]))
    else:
        names = argv
    if not names:
        print("no query names given", file=sys.stderr)
        return 2
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from oracle import compare, duckdb_connection

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        .appName("predrive")
        .getOrCreate()
    )
    con = duckdb_connection(SF_DIR)

    results: dict[str, str] = {}
    n_equal = n_rows_only = n_fail = 0
    t0 = time.time()
    for name in names:
        q = REGISTRY[name]
        t = time.time()
        try:
            df = q.spark_fn(spark, SF_DIR)
            if q.oracle is None:
                df.count()  # plain statement — an assert dies under -O
                results[name] = "rows-only"
                n_rows_only += 1
            else:
                compare(df, con, q.oracle)
                results[name] = "EQUAL"
                n_equal += 1
        except Exception as e:  # noqa: BLE001 — report every failure, keep going
            results[name] = f"FAIL: {e}"
            n_fail += 1
        print(f"{results[name][:60]:12s} {time.time() - t:6.2f}s  {name}", flush=True)

    summary = {
        "sf_dir": SF_DIR,
        "n": len(names),
        "equal": n_equal,
        "rows_only": n_rows_only,
        "fail": n_fail,
        "sec": round(time.time() - t0, 1),
        "failures": {k: v for k, v in results.items() if v.startswith("FAIL")},
    }
    print(json.dumps(summary))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
