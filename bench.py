"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed to full materialization (count of the result — results
are small aggregates/top-ks, so the count forces the whole plan without
driver-collect overhead dominating).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import REGISTRY
from example_cdk_dynamodb_stream_to_redshift_spark.session import get_spark

# Headline set: the reference's two join+agg reports, the two top-k monitors,
# the CDC-merge-shaped dedup, the heaviest scan/join/window shapes, and the
# event-time (streaming-portable) operators.
HEADLINE = [
    "rewards_by_member",
    "rewards_by_quest",
    "region_customer_counts",
    "recent_events_topk",
    "event_lag_topk",
    "latest_event_per_user",
    "cdc_merge_latest_state",
    "event_type_stats",
    "scalar_function_suite",
    "lineitem_pricing_summary",
    "top_orders_by_revenue",
    "events_hourly_tumbling",
    "user_sessions",
    "purchase_attribution_asof",
    "distinct_users_per_type",
    "user_running_spend",
    "events_sliding_window",
    "exact_dedup_docs",
    "minhash_lsh_near_dups",
    "corpus_clean_keep",
    "ann_bruteforce_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    # Warm the JVM once (codegen compiler, parquet reader, shuffle machinery)
    # with a tiny end-to-end query at the smallest SF, so per-query timings
    # measure the queries rather than one-time JIT/class-loading cost.
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf):
        REGISTRY["rewards_by_member"].spark_fn(spark, warm_sf).count()
        REGISTRY["latest_event_per_user"].spark_fn(spark, warm_sf).count()
    else:
        spark.range(1).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = REGISTRY[name]
        df = q.spark_fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.count()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
