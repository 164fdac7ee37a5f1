"""Small-files compaction on both storage backends: file counts shrink,
contents and commit semantics are untouched."""

from __future__ import annotations

import glob
import os

from pyspark.sql import types as T

from example_cdk_dynamodb_stream_to_redshift_spark.operators.partitioned_store import (
    PartitionedParquetTable,
)
from example_cdk_dynamodb_stream_to_redshift_spark.operators.storage import ParquetTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _files(path: str) -> list[str]:
    return glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)


def _rows(df) -> set[tuple]:
    return {(r["k"], r["v"]) for r in df.collect()}


def test_versioned_table_compact(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"), SCHEMA)
    for b in range(4):  # 4 commits x multi-file writes -> many small files
        t.overwrite(
            t.read().unionByName(
                spark.createDataFrame(
                    [(b * 10 + i, f"r{b}_{i}") for i in range(8)], SCHEMA
                ).repartition(4)
            )
        )
    before = _rows(t.read())
    v_before = t._current_version()
    assert len(_files(os.path.join(str(tmp_path / "t"), f"v{v_before}"))) >= 4

    t.compact(n_files=2)
    v_after = t._current_version()
    assert v_after == v_before + 1  # compaction is a normal atomic commit
    assert len(_files(os.path.join(str(tmp_path / "t"), f"v{v_after}"))) <= 2
    assert _rows(t.read()) == before


def test_versioned_table_compact_empty_is_noop(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "e"), SCHEMA)
    t.compact(n_files=1)
    assert t._current_version() is None
    assert t.read().count() == 0


def test_partitioned_table_compact(spark, tmp_path):
    root = str(tmp_path / "p")
    t = PartitionedParquetTable(spark, root, SCHEMA, key_col="k", n_buckets=4)
    for b in range(3):  # repeated appends pile files into each bucket dir
        t.append(
            spark.createDataFrame(
                [(i, f"r{b}_{i}") for i in range(b * 8, b * 8 + 8)], SCHEMA
            ).repartition(4)
        )
    before = _rows(t.read())
    bucket_dirs = glob.glob(os.path.join(root, "_kb=*"))
    assert bucket_dirs
    assert any(len(_files(d)) > 1 for d in bucket_dirs)

    t.compact()
    for d in glob.glob(os.path.join(root, "_kb=*")):
        assert len(_files(d)) <= 2  # ~1 task per bucket (hash collisions ok)
    assert _rows(t.read()) == before


def test_partitioned_table_compact_subset_leaves_other_buckets(spark, tmp_path):
    root = str(tmp_path / "ps")
    t = PartitionedParquetTable(spark, root, SCHEMA, key_col="k", n_buckets=4)
    for b in range(3):
        t.append(
            spark.createDataFrame(
                [(i, f"r{b}_{i}") for i in range(b * 8, b * 8 + 8)], SCHEMA
            ).repartition(4)
        )
    before = _rows(t.read())
    dirs = {d: set(_files(d)) for d in glob.glob(os.path.join(root, "_kb=*"))}
    target = sorted(
        int(d.rsplit("=", 1)[1]) for d in dirs if len(dirs[d]) > 1
    )[0]

    t.compact(buckets=[target])
    for d, old_files in dirs.items():
        b = int(d.rsplit("=", 1)[1])
        if b == target:
            assert len(_files(d)) <= 2
        else:  # untouched buckets keep their exact files
            assert set(_files(d)) == old_files
    assert _rows(t.read()) == before
    t.compact(buckets=[])  # explicit empty set: no-op
    assert _rows(t.read()) == before
