"""Maintained corpus-version fingerprint manifests: the streaming twin
of ``operators/corpus_diff.py``.

:func:`operators.corpus_diff.corpus_diff` re-fingerprints BOTH corpora
on every call — two full text scans per diff. At 100 TB per snapshot
that is the whole cost, and it is paid again for every version pair
asked about. This store amortizes it: each ingested micro-batch writes
its ``(id, fp)`` rows ONCE (two narrow strings per document — the same
``functions.text.fingerprint`` the exact-dedup ingestion key already
computes), into the batch's own ``batch_id=<n>`` directory under the
version's root. A diff between ANY two landed versions then reads
manifests only — orders of magnitude less I/O than the text, and the
text itself is never rescanned:

    v1 = SnapshotManifest(spark, root, "v1")
    stream_v1.foreachBatch(v1.wrap(sink))        # fp recorded at ingest
    ...
    v2 = SnapshotManifest(spark, root, "v2")
    ...
    diff_manifests(v1, v2)                       # manifest-only

``diff_manifests`` equals ``corpus_diff`` of the raw corpora row-exactly
(ids compared as strings — the store's stable-schema convention, like
the bottom-k sample store), pinned in tests/test_manifest_maintenance.py
across adversarial batchings, duplicate ids, NULL text, replay, and
compaction. Writes are distributed (the manifest is corpus-sized, never
driver-collected); ``batch_id``-directory overwrite makes at-least-once
replay idempotent; ``compact`` consolidates a finished version's layout.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import fingerprint
from ..operators.corpus_diff import (
    diff_by_group_of_fps,
    diff_of_fps,
    summary_of_diff,
)
from .batch_layout import ForeachBatchStore, read_root

_VERSION_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")

# `g` is always present (NULL when the store has no group_col) so the
# read schema is stable across store configurations.
MANIFEST_FIELDS = [
    T.StructField("batch_id", T.IntegerType()),
    T.StructField("id", T.StringType()),
    T.StructField("fp", T.StringType()),
    T.StructField("g", T.StringType()),
]


class SnapshotManifest(ForeachBatchStore):
    """Fingerprint manifest for ONE corpus version: ``(id, fp)`` per
    ingested row, id stored as a string (stable read schema), fp NULL
    for NULL text (corpus_diff's null-safe content compare). One store
    instance per version; versions share a parent ``root`` so
    :func:`diff_manifests` can relate them."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        version: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        group_col: str | None = None,
    ) -> None:
        if not _VERSION_RE.match(version):
            raise ValueError(
                f"version {version!r} must be path-safe "
                "([A-Za-z0-9][A-Za-z0-9._-]*)"
            )
        self.spark = spark
        self.version = version
        self.id_col = id_col
        self.text_col = text_col
        self.group_col = group_col
        self._manifest_dir = os.path.join(root, f"version={version}")
        self._meta_path = os.path.join(self._manifest_dir, "_manifest_meta.json")
        self._check_meta()  # reopening with different columns fails NOW

    def _check_meta(self, create: bool = False) -> None:
        """The column configuration is part of the persisted state:
        reopening a version with a different id/text/group column would
        mix incompatible rows into the same manifest (e.g. real and
        NULL group labels, per-doc) with no error at read time — the
        ClusterMaintenance layout-marker precedent. Pinned at creation,
        validated on every open and write."""
        mine = {
            "id_col": self.id_col,
            "text_col": self.text_col,
            "group_col": self.group_col,
        }
        if os.path.isfile(self._meta_path):
            with open(self._meta_path) as fh:
                stored = json.load(fh)
            if stored != mine:
                raise ValueError(
                    f"manifest version {self.version!r} was created with "
                    f"{stored}; reopening with {mine} would corrupt the "
                    "manifest — match the original columns or rebuild."
                )
            return
        if create:
            os.makedirs(self._manifest_dir, exist_ok=True)
            tmp = self._meta_path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(mine, fh)
            os.replace(tmp, self._meta_path)

    def _store_roots(self) -> list[str]:
        return [self._manifest_dir]

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Distributed write of the batch's (id, fp) rows — corpus-sized,
        never collected. NULL ids carry no identity and are dropped here
        (matching corpus_diff); duplicate ids land as duplicate rows and
        stay visible in the diff's multiplicities."""
        self._check_meta(create=True)
        g = (
            F.col(self.group_col).cast("string")
            if self.group_col is not None
            else F.lit(None).cast("string")
        )
        frame = (
            batch_df.filter(F.col(self.id_col).isNotNull())
            .select(
                F.col(self.id_col).cast("string").alias("id"),
                fingerprint(self.text_col).alias("fp"),
                g.alias("g"),
            )
        )
        frame.write.mode("overwrite").parquet(
            os.path.join(self._manifest_dir, f"batch_id={batch_id}")
        )

    def manifest(self) -> DataFrame:
        """Everything landed for this version, as ``(id, fp, g)``."""
        return read_root(self.spark, self._manifest_dir, MANIFEST_FIELDS).select(
            "id", "fp", "g"
        )


def diff_manifests(
    old: SnapshotManifest, new: SnapshotManifest, id_col: str = "doc_id"
) -> DataFrame:
    """``corpus_diff`` of two landed versions from manifests alone:
    ``(id_col string, status, n_old, n_new)`` — row-exactly the batch
    operator's output with ids cast to string, zero text scans."""
    return diff_of_fps(old.manifest(), new.manifest(), id_col)


def diff_manifests_by_group(
    old: SnapshotManifest, new: SnapshotManifest, group_col: str = "source"
) -> DataFrame:
    """Which groups drove the diff, from manifests alone: ``(group_col,
    status, n_docs)`` — equals ``operators.corpus_diff.diff_by_group``
    of the raw corpora when both stores recorded a group column. A
    store built without ``group_col`` contributes NULL groups (they
    roll up under one NULL row rather than failing)."""
    return diff_by_group_of_fps(old.manifest(), new.manifest(), group_col)


def diff_manifests_summary(
    old: SnapshotManifest, new: SnapshotManifest
) -> DataFrame:
    """Bounded ``(status, n_docs)`` rollup with every status
    materialized (zero counts included) — the shared
    ``corpus_diff.summary_of_diff`` over the manifest diff."""
    return summary_of_diff(diff_manifests(old, new))
