"""Lineage-truncation modes (operators/lineage.py): the default
localCheckpoint and the opt-in reliable checkpoint must produce identical
operator results — the flag trades recovery posture (executor-loss
survival at 100 TB) for extra I/O, never semantics."""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.lineage import (
    DIR_CONF,
    RELIABLE_CONF,
    _resolve_checkpoint_dir,
    truncate_lineage,
)


@contextlib.contextmanager
def reliable_mode(spark, ckpt_dir):
    spark.conf.set(RELIABLE_CONF, "true")
    spark.conf.set(DIR_CONF, str(ckpt_dir))
    try:
        yield
    finally:
        spark.conf.set(RELIABLE_CONF, "false")


def test_reliable_mode_without_dir_raises():
    # the resolution logic is a pure helper, so the no-dir guard path is
    # exercised in every suite order (the shared Spark context usually
    # carries a checkpoint dir by the time this file runs, which used to
    # permanently self-skip the end-to-end form of this test)
    with pytest.raises(ValueError, match="checkpoint directory"):
        _resolve_checkpoint_dir(None, None)


def test_resolve_checkpoint_dir_precedence():
    # DIR_CONF wins even when the context already has a dir — a caller
    # reconfiguring the dir mid-session must take effect rather than
    # silently landing checkpoints in the stale first-ever path
    assert _resolve_checkpoint_dir("/new", "/old") == "/new"
    assert _resolve_checkpoint_dir(None, "/old") == "/old"
    assert _resolve_checkpoint_dir("/new", None) == "/new"


def test_truncate_lineage_reliable_writes_checkpoint(spark, tmp_path):
    import os

    df = spark.range(100).withColumn("x", F.col("id") * 2)
    with reliable_mode(spark, tmp_path / "ckpt"):
        out = truncate_lineage(df)
        assert sorted(r["x"] for r in out.collect()) == list(range(0, 200, 2))
        # the reliable checkpoint landed on disk
        assert any(
            files
            for _, _, files in os.walk(str(tmp_path / "ckpt"))
        )
    # default mode still works after the flag flips back
    out2 = truncate_lineage(df)
    assert out2.count() == 100


def test_connected_components_agree_across_modes(spark, tmp_path):
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)]  # 20 two-node components
        + [(100 + i, 100 + i + 1) for i in range(30)],  # one 31-node chain
        "src long, dst long",
    )
    base = {
        (r["node"], r["component"])
        for r in connected_components(edges, driver_finish_edges=0).collect()
    }
    with reliable_mode(spark, tmp_path / "ckpt"):
        reliable = {
            (r["node"], r["component"])
            for r in connected_components(edges, driver_finish_edges=0).collect()
        }
    assert base == reliable


def test_bpe_merges_agree_across_modes(spark, tmp_path):
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.bpe import (
        train_bpe_merges,
    )

    docs = spark.createDataFrame(
        [("low lower lowest newest widest",), ("new newer low newest",)],
        "text string",
    )
    base = train_bpe_merges(docs, n_merges=6)
    with reliable_mode(spark, tmp_path / "ckpt"):
        reliable = train_bpe_merges(docs, n_merges=6)
    assert base == reliable


def test_global_row_number_agrees_across_modes(spark, tmp_path):
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.ranking import (
        global_row_number,
    )

    df = spark.range(500).select(
        (F.col("id") * 37 % 500).alias("key"), F.col("id")
    )
    base = {
        r["id"]: r["rn"]
        for r in global_row_number(
            df, [F.asc("key"), F.asc("id")], num_partitions=8
        ).collect()
    }
    with reliable_mode(spark, tmp_path / "ckpt"):
        reliable = {
            r["id"]: r["rn"]
            for r in global_row_number(
                df, [F.asc("key"), F.asc("id")], num_partitions=8
            ).collect()
        }
    assert base == reliable
    assert sorted(base.values()) == list(range(1, 501))


def test_query_checkpoint_sites_agree_across_modes(spark, tmp_path):
    """The scan-census fixes route shared count tables through
    truncate_lineage inside ordinary registry queries (DSIR, tf-idf,
    bigram LM, funnel, ...). The reliable-checkpoint flag must leave
    their results bit-identical — same guarantee the iterative operators
    pin, proven on one representative from the new site family."""
    from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import (
        REGISTRY,
    )

    from .conftest import SF_CORRECTNESS

    q = REGISTRY["dsir_select_docs"]
    default = [tuple(r) for r in q.spark_fn(spark, SF_CORRECTNESS).collect()]
    with reliable_mode(spark, tmp_path / "qckpt"):
        reliable = [
            tuple(r) for r in q.spark_fn(spark, SF_CORRECTNESS).collect()
        ]
    assert default == reliable
