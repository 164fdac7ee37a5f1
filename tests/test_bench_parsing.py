"""bench.py grading-channel invariants: the compact summary must always
fit the driver's ~2 KB tail capture, and the prior-round comparison must
recover per-query numbers even from an r4-style record whose single JSON
line outgrew the tail (parsed: null)."""

from __future__ import annotations

import json
import os

import bench

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pairs_from_tail_recovers_escaped_fragment():
    tail = (
        '"queries\\": {\\"q_a\\": 1.25, \\"q_b\\": 0.5, '
        '\\"sf\\": 0.1, \\"q_c\\": 3'
    )
    got = bench._pairs_from_tail(tail)
    assert got["q_a"] == 1.25 and got["q_b"] == 0.5 and got["q_c"] == 3.0
    assert got["sf"] == 0.1  # non-query keys are filtered by the caller


def test_prior_comparison_recovers_r4_null_parse():
    """BENCH_r04.json itself has parsed: null — the comparison must still
    produce both ratios from the raw tail, with build costs split at the
    build_sec marker (query timings precede it, builds follow)."""
    with open(os.path.join(_REPO_ROOT, "BENCH_r04.json")) as fh:
        r4 = json.load(fh)
    assert r4.get("parsed") is None  # the exact failure mode under test
    timings = {"dedup_clusters": 2.6, "gopher_filter_docs": 0.4}
    builds = {"dedup_clusters": 4.5}
    cmp_ = bench._prior_round_comparison(timings, builds)
    assert cmp_ is not None
    assert cmp_["shared_queries"] == 2
    # r4 tail: dedup_clusters query 2.7413 / build 4.7485, gopher 0.372
    assert cmp_["prior_shared_query_sec"] == 3.1133
    assert cmp_["prior_shared_end_to_end_sec"] == 7.8618
    assert cmp_["shared_query_ratio"] == round(3.0 / 3.1133, 4)


def test_summary_fields_are_bounded():
    """Every key the compact summary may emit is a scalar or the 8-key cdc
    stage map — no unbounded per-query maps can ever reach the last line
    (the r4 failure mode, structurally)."""
    src = open(os.path.join(_REPO_ROOT, "bench.py")).read()
    start = src.index('summary = {')
    block = src[start : src.index("print(json.dumps(summary))")]
    assert '"queries"' not in block
    assert '"build_sec"' not in block


def test_headline_names_are_registered():
    """A typo'd HEADLINE name would crash the driver's graded bench run
    at the KeyError — pin every name against the registry."""
    from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import (
        REGISTRY,
    )

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, missing
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)  # no duplicates
