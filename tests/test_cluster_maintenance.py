"""Maintained dedup clusters (streaming/cluster_maintenance) — the
incremental closure equals connected_components over everything landed,
under fixed adversarial batchings (cross-batch chain merges, a new node
becoming the root of an old cluster, idle batches, self-loops), under
random hypothesis slicings, across replay, and across checkpoint()
(fold + log trim) — plus the pure resolve_remaps contract and the
plan-shape guarantee that reads never shuffle the nodes store."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.components import (
    connected_components,
    incremental_step,
    resolve_remaps,
)
from example_cdk_dynamodb_stream_to_redshift_spark.streaming.cluster_maintenance import (
    ClusterMaintenance,
)

SCHEMA = "src long, dst long"

# Adversarial fixed batching:
#  b0: two separate pairs                       -> {10,11}@10, {20,21}@20
#  b1: bridge the pairs (merge 20-root into 10) -> remap 20->10
#  b2: idle batch (must not disturb anything)
#  b3: NEW smaller id joins: 5 becomes the root -> remap 10->5 (chain 20->10->5)
#  b4: self-loop only node + a fresh pair
#  b5: duplicate + reversed edges of b0 (all no-ops)
BATCHES = [
    [(10, 11), (20, 21)],
    [(11, 20)],
    [],
    [(5, 21)],
    [(30, 30), (40, 41)],
    [(11, 10), (21, 20)],
]


def _edges_df(spark, edges):
    return spark.createDataFrame(edges or [], SCHEMA)


def _batch_truth(spark, edges):
    if not edges:
        return []
    got = connected_components(_edges_df(spark, edges)).collect()
    return sorted((r["node"], r["component"]) for r in got)


def _store(spark, tmp_path, name="cm"):
    return ClusterMaintenance(spark, str(tmp_path / name))


def _feed(spark, store, batches, start=0):
    for i, b in enumerate(batches, start=start):
        store.process_batch(_edges_df(spark, b), i)


def _clusters(store):
    return sorted((r["node"], r["component"]) for r in store.clusters().collect())


def test_incremental_equals_batch_after_every_batch(spark, tmp_path):
    store = _store(spark, tmp_path)
    seen: list[tuple[int, int]] = []
    for i, b in enumerate(BATCHES):
        store.process_batch(_edges_df(spark, b), i)
        seen.extend(b)
        assert _clusters(store) == _batch_truth(spark, seen), f"batch {i}"
    # the final state exercises a 20->10->5 remap chain
    assert dict(_clusters(store))[20] == 5
    assert dict(_clusters(store))[30] == 30  # self-loop-only node kept


def test_one_big_batch_agrees_with_many_small(spark, tmp_path):
    many = _store(spark, tmp_path, "many")
    _feed(spark, many, BATCHES)
    one = _store(spark, tmp_path, "one")
    one.process_batch(_edges_df(spark, [e for b in BATCHES for e in b]), 0)
    assert _clusters(many) == _clusters(one)


def test_each_node_lands_exactly_once(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(spark, store, BATCHES)
    rows = store.assignments().collect()
    nodes = [r["node"] for r in rows]
    assert len(nodes) == len(set(nodes))
    # first sighting wins: node 21 arrived in batch 0, re-seen later
    by_node = {r["node"]: r["batch_id"] for r in rows}
    assert by_node[21] == 0 and by_node[5] == 3


def test_replay_overwrites_itself(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(spark, store, BATCHES)
    before = _clusters(store)
    last = len(BATCHES) - 1
    store.process_batch(_edges_df(spark, BATCHES[last]), last)  # retry
    assert _clusters(store) == before
    rows = store.assignments().collect()
    assert len(rows) == len({r["node"] for r in rows})


def test_checkpoint_preserves_state_and_trims_log(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(spark, store, BATCHES)
    before = _clusters(store)
    assert store.remap_log_size() == 2  # 20->10 and 10->5
    assert store.checkpoint() is True
    assert _clusters(store) == before
    # both merges happened before the kept tail (batches 4,5) -> trimmed
    assert store.remap_log_size() == 0
    # continue streaming after the fold: merge a folded cluster again
    store.process_batch(_edges_df(spark, [(1, 40)]), len(BATCHES))
    seen = [e for b in BATCHES for e in b] + [(1, 40)]
    assert _clusters(store) == _batch_truth(spark, seen)
    # idempotent second checkpoint over a quiet store
    store.checkpoint()
    assert _clusters(store) == _batch_truth(spark, seen)


def test_replay_after_checkpoint_no_double_landing(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(spark, store, BATCHES)
    store.checkpoint(keep_last=2)
    before = _clusters(store)
    last = len(BATCHES) - 1
    store.process_batch(_edges_df(spark, BATCHES[last]), last)  # retry
    assert _clusters(store) == before
    rows = store.clusters().collect()
    assert len(rows) == len({r["node"] for r in rows})


def test_checkpoint_keeps_remaps_the_kept_dirs_need(spark, tmp_path):
    # merges recorded in the KEPT tail must survive the log trim: batch 2
    # merges clusters born in batches 0 and 1, then checkpoint keeps
    # batches 1,2 — batch 1's dir stores root 30 for node 31, resolved
    # only through batch 2's (30 -> 10) entry.
    store = _store(spark, tmp_path)
    _feed(spark, store, [[(10, 11)], [(30, 31)], [(31, 11)]])
    truth = _batch_truth(spark, [(10, 11), (30, 31), (31, 11)])
    assert _clusters(store) == truth
    store.checkpoint(keep_last=2)
    assert store.remap_log_size() == 1
    assert _clusters(store) == truth


def test_checkpoint_finishes_pending_cleanup(spark, tmp_path):
    """A crash between write_compact's atomic rename and its source
    deletion leaves superseded dirs behind (marker-excluded from reads
    but still on disk); the next checkpoint must reclaim them."""
    import glob
    import json
    import os as _os

    store = _store(spark, tmp_path)
    _feed(spark, store, BATCHES)
    store.checkpoint(keep_last=0)
    marker = glob.glob(
        str(tmp_path / "cm" / "_cluster_nodes" / "compact=*" /
            "_compacted_from.json")
    )[0]
    gone = json.load(open(marker))["superseded"][0]
    leftover = _os.path.join(
        _os.path.dirname(_os.path.dirname(marker)), gone
    )
    _os.makedirs(leftover, exist_ok=True)  # simulate the crash residue
    before = _clusters(store)
    assert _clusters(store) == before  # marker keeps it out of reads
    store.process_batch(_edges_df(spark, [(100, 101)]), 99)
    store.checkpoint(keep_last=0)
    assert not _os.path.isdir(leftover)
    seen = [e for b in BATCHES for e in b] + [(100, 101)]
    assert _clusters(store) == _batch_truth(spark, seen)


def test_checkpoint_keep_last_zero_quiescent(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(spark, store, BATCHES)
    before = _clusters(store)
    store.checkpoint(keep_last=0)
    assert store.remap_log_size() == 0
    assert _clusters(store) == before


def test_cluster_sizes_and_spectrum(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(spark, store, BATCHES)
    # final components: {5,10,11,20,21} (size 5), {30} and {40,41}
    sizes = {
        r["component"]: r["n_nodes"] for r in store.cluster_sizes().collect()
    }
    assert sizes == {5: 5, 30: 1, 40: 2}
    spectrum = {
        r["n_nodes"]: r["n_clusters"] for r in store.size_spectrum().collect()
    }
    assert spectrum == {1: 1, 2: 1, 5: 1}


def test_wrap_passes_batch_through_unchanged(spark, tmp_path):
    store = _store(spark, tmp_path)
    got = []
    fn = store.wrap(lambda df, bid: got.append((bid, df.count())))
    fn(_edges_df(spark, BATCHES[0]), 0)
    assert got == [(0, 2)]
    assert _clusters(store) == _batch_truth(spark, BATCHES[0])


def test_empty_store_reads(spark, tmp_path):
    store = _store(spark, tmp_path)
    assert store.clusters().count() == 0
    assert store.remap_log_size() == 0
    assert store.checkpoint() is False


def test_clusters_plan_never_shuffles_the_store(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(spark, store, BATCHES)
    plan = store.clusters()._sc._jvm.PythonSQLUtils.explainString(
        store.clusters()._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin" not in plan
    # every exchange must be a broadcast: a bare shuffle Exchange node
    # would mean the corpus-scale nodes store is being repartitioned
    import re

    shuffle_exchanges = re.findall(r"\)\s+Exchange\b", plan)
    assert not shuffle_exchanges, plan


def test_incremental_step_contract(spark):
    mapping = spark.createDataFrame(
        [(10, 10), (11, 10), (20, 20)], "node long, component long"
    )
    out = incremental_step(
        spark.createDataFrame([(11, 20), (7, 99)], SCHEMA), mapping
    ).collect()
    got = {r["node"]: (r["prev_root"], r["root"]) for r in out}
    assert got[11] == (10, 10)
    assert got[20] == (20, 10)  # merged into the smaller root
    assert got[7] == (None, 7)  # fresh pair, min id is the root
    assert got[99] == (None, 7)


def test_bucketed_store_equals_unbucketed(spark, tmp_path):
    """n_buckets changes layout and probe pruning, never results:
    equality with the plain store across feed, replay, checkpoint,
    and post-checkpoint batches."""
    plain = _store(spark, tmp_path, "plain")
    bucketed = ClusterMaintenance(
        spark, str(tmp_path / "bucketed"), n_buckets=7
    )
    for i, b in enumerate(BATCHES):
        plain.process_batch(_edges_df(spark, b), i)
        bucketed.process_batch(_edges_df(spark, b), i)
        assert _clusters(bucketed) == _clusters(plain), f"batch {i}"
    last = len(BATCHES) - 1
    bucketed.process_batch(_edges_df(spark, BATCHES[last]), last)  # replay
    assert _clusters(bucketed) == _clusters(plain)
    assert bucketed.checkpoint() is True
    assert _clusters(bucketed) == _clusters(plain)
    extra = [(1, 40)]
    plain.process_batch(_edges_df(spark, extra), len(BATCHES))
    bucketed.process_batch(_edges_df(spark, extra), len(BATCHES))
    assert _clusters(bucketed) == _clusters(plain)
    assert sorted(
        tuple(r) for r in bucketed.cluster_sizes().collect()
    ) == sorted(tuple(r) for r in plain.cluster_sizes().collect())


def test_wide_batch_skips_bucket_filter_same_results(spark, tmp_path):
    """A batch touching more than half the buckets gets no pruning from
    the IN-filter (just a huge predicate), so the probe falls back to
    the full store scan — results must be identical either way. With
    n_buckets=2 every multi-node batch takes the fallback branch."""
    plain = _store(spark, tmp_path, "wide_plain")
    bucketed = ClusterMaintenance(
        spark, str(tmp_path / "wide_bucketed"), n_buckets=2
    )
    for i, b in enumerate(BATCHES):
        plain.process_batch(_edges_df(spark, b), i)
        bucketed.process_batch(_edges_df(spark, b), i)
        assert _clusters(bucketed) == _clusters(plain), f"batch {i}"


def test_reopening_with_different_buckets_fails_loudly(spark, tmp_path):
    root = str(tmp_path / "meta")
    store = ClusterMaintenance(spark, root, n_buckets=7)
    store.process_batch(_edges_df(spark, BATCHES[0]), 0)
    # matching reopen works and reads the same state
    again = ClusterMaintenance(spark, root, n_buckets=7)
    assert _clusters(again) == _clusters(store)
    # mismatched modulus / toggled bucketing both fail at OPEN time
    with pytest.raises(ValueError, match="n_buckets=7"):
        ClusterMaintenance(spark, root, n_buckets=1024)
    with pytest.raises(ValueError, match="n_buckets=7"):
        ClusterMaintenance(spark, root)
    # and an unbucketed store refuses a bucketed reopen
    root2 = str(tmp_path / "meta2")
    plain = ClusterMaintenance(spark, root2)
    plain.process_batch(_edges_df(spark, BATCHES[0]), 0)
    with pytest.raises(ValueError, match="n_buckets=None"):
        ClusterMaintenance(spark, root2, n_buckets=7)


def test_premarker_stores_validated_structurally(spark, tmp_path):
    """A store created before the layout marker existed must not be
    trusted blindly: bucketed-without-meta is unopenable (unknown
    modulus), unbucketed-without-meta opens only unbucketed."""
    import os as _os

    root = str(tmp_path / "legacy_b")
    store = ClusterMaintenance(spark, root, n_buckets=7)
    store.process_batch(_edges_df(spark, BATCHES[0]), 0)
    _os.remove(_os.path.join(root, "_cluster_meta.json"))
    with pytest.raises(ValueError, match="unknown modulus"):
        ClusterMaintenance(spark, root, n_buckets=7)  # even the right one
    with pytest.raises(ValueError, match="unknown modulus"):
        ClusterMaintenance(spark, root)

    root2 = str(tmp_path / "legacy_p")
    plain = ClusterMaintenance(spark, root2)
    plain.process_batch(_edges_df(spark, BATCHES[0]), 0)
    _os.remove(_os.path.join(root2, "_cluster_meta.json"))
    with pytest.raises(ValueError, match="unbucketed"):
        ClusterMaintenance(spark, root2, n_buckets=7)
    reopened = ClusterMaintenance(spark, root2)  # re-stamps the marker
    assert _clusters(reopened) == _clusters(plain)
    assert _os.path.isfile(_os.path.join(root2, "_cluster_meta.json"))


def test_bucketed_compact_keeps_the_probe_pushdown(spark, tmp_path):
    """plain compact() on a bucketed store must keep files clustered on
    b — else every probe scans the whole store until the next
    checkpoint."""
    store = ClusterMaintenance(spark, str(tmp_path / "bc"), n_buckets=7)
    _feed(spark, store, BATCHES)
    before = _clusters(store)
    store.compact(keep_last=0)
    assert _clusters(store) == before
    plan = store._mapping(
        probe_edges=_edges_df(spark, [(10, 11)])
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters" in plan and "In(b, [" in plan, plan


def test_bucketed_probe_pushes_the_bucket_filter(spark, tmp_path):
    store = ClusterMaintenance(spark, str(tmp_path / "bp"), n_buckets=7)
    _feed(spark, store, BATCHES)
    probe = _edges_df(spark, [(10, 11)])
    plan = store._mapping(probe_edges=probe)._jdf.queryExecution(
    ).explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # the bucket IN-filter must reach the parquet scan so row-group
    # stats can skip non-matching slices
    assert "PushedFilters" in plan and "In(b, [" in plan, plan


def test_incremental_step_rejects_non_integral_ids(spark):
    mapping = spark.createDataFrame([], "node long, component long")
    bad = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="integral"):
        incremental_step(bad, mapping)


def test_resolve_remaps_pure():
    assert resolve_remaps([(5, 4), (4, 3)]) == {5: 3, 4: 3}
    assert resolve_remaps([(9, 2), (7, 5), (5, 2)]) == {9: 2, 7: 2, 5: 2}
    assert resolve_remaps([]) == {}
    assert resolve_remaps([(4, 4)]) == {}  # self no-op dropped
    with pytest.raises(ValueError):
        resolve_remaps([(3, 8)])
    # duplicate entries with the SAME target are tolerated (idempotent
    # replay); a CONFLICTING target means a corrupted/mixed log — raise
    # instead of last-wins-by-read-order nondeterminism
    assert resolve_remaps([(5, 4), (5, 4)]) == {5: 4}
    with pytest.raises(ValueError, match="conflicting"):
        resolve_remaps([(5, 4), (5, 3)])


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=14),
        ),
        min_size=1,
        max_size=24,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=24), max_size=3),
    ckpt_after=st.integers(min_value=-1, max_value=3),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_slicings_match_batch_closure(
    spark, tmp_path_factory, edges, cuts, ckpt_after
):
    """Random edge streams under random batchings, with a checkpoint()
    interleaved at a random position (-1 = never): the maintained
    closure equals connected_components over everything seen, and the
    fold/trim never perturbs subsequent batches."""
    bounds = sorted({min(c, len(edges)) for c in cuts})
    slices, prev = [], 0
    for c in bounds + [len(edges)]:
        slices.append(edges[prev:c])
        prev = c
    root = tmp_path_factory.mktemp("cm-hyp")
    store = ClusterMaintenance(spark, str(root))
    for i, b in enumerate(slices):
        store.process_batch(_edges_df(spark, b), i)
        if i == ckpt_after:
            store.checkpoint()
    assert _clusters(store) == _batch_truth(spark, edges)
