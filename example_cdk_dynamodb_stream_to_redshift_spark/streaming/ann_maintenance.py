"""Maintained IVF ANN index: the streaming twin of the batch IVF path
(``operators/similarity.py build_ivf_index`` / ``ivf_topk``).

An embedding corpus that grows by micro-batches needs its ANN index to
grow with it. The batch operator answers that with
``append_ivf_index`` — but a bare ``mode("append")`` is NOT replay-safe:
foreachBatch is at-least-once, and a retried batch would double its
vectors in the inverted lists (and therefore in every search result).
This store puts the same frozen-coarse-quantizer assignment on the
engine's batch-id-directory idempotence recipe (streaming/batch_layout):

- each micro-batch is assigned with the FROZEN centroids (the pure
  codegen ``_assign_cid`` expression — no Python boundary, no training)
  and written DISTRIBUTED into its own ``batch_id=<n>`` directory,
  PARTITIONED BY ``cid``, so an at-least-once replay overwrites its own
  rows instead of appending duplicates;
- ``index()`` unions the live layout; ``search()`` probes it through
  the plain ``ivf_topk`` operator, and the ``cid IN (probes)`` filter
  is a storage-level partition prune on the batch dirs (the
  write_ivf_index layout, per batch);
- ``compact()`` consolidates the small-files layout through the shared
  crash-safe marker protocol, clustering rows by ``cid`` so parquet
  row-group min/max stats keep probe reads selective after the
  ``cid=`` directories are gone (the ClusterMaintenance bucketed-probe
  trade: directory pruning on the streaming tail, stats pruning on the
  compacted bulk — at 100 TB the compacted bulk would be re-laid-out
  partitioned by cid on the same cadence that retrains centroids).

Because assignment is a pure function of (vector, centroids), the
maintained index equals ``build_ivf_index`` over all landed vectors
under ANY batch slicing — pinned in tests/test_ann_maintenance.py along
with replay idempotence, compaction invariance, search parity with
brute force at nprobe=K, and the probe-prune plan shape. Centroid drift
is handled the way IVF systems do at scale: retrain + rebuild on a
cadence, never per batch; the centroid matrix is part of the persisted
state (a meta file pins its fingerprint, the SnapshotManifest
column-config precedent), so silently reopening the store with
different centroids — which would mix incompatible list assignments —
fails loudly instead.

Reference parity note: the reference system (a DynamoDB-CDC-to-Redshift
sync, /root/reference) has no vector surface; this store is part of the
training-data-pipeline extension the engine provides beyond it.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.pq import ivfpq_topk, pq_code_expr
from ..operators.similarity import _assign_cid, brute_force_topk, ivf_topk
from .batch_layout import (
    ForeachBatchStore,
    compact_root,
    read_root,
    write_batch_dir,
)

INDEX_FIELDS = [
    T.StructField("id", T.StringType()),
    T.StructField("vec", T.ArrayType(T.DoubleType())),
    T.StructField("batch_id", T.IntegerType()),
    T.StructField("cid", T.IntegerType()),
]


def _centroid_fingerprint(centroids: list[list[float]]) -> str:
    """Stable content hash of the coarse quantizer. repr(float) is exact
    (shortest round-trip), so equal matrices hash equal and any value
    drift — even one ulp, which would move assignments — changes it."""
    payload = json.dumps(
        [[repr(float(x)) for x in row] for row in centroids]
    ).encode()
    return hashlib.md5(payload).hexdigest()


class IvfIndexMaintenance(ForeachBatchStore):
    """Frozen-quantizer IVF inverted lists maintained per micro-batch.

    Rows are stored as ``(id string, vec array<double>, cid)`` — id as
    string and components as double for a stable read schema across
    input types (the manifest/bottom-k store convention). NULL ids
    carry no identity and are dropped; NULL vectors cannot be assigned
    and are dropped (both documented contracts, matching the corpus
    stores); a vector of the WRONG DIMENSION is a violated data
    contract that would otherwise mis-assign silently (zip_with pads
    the shorter side with NULLs), so it raises in-plan at execution —
    the rarity max_sources fail-loud pattern.

    Ids are NOT deduplicated across batches: ingestion identity is the
    upstream pipeline's job (the CDC merge / CorpusIngestPipeline
    recipes), and a re-ingested id lands again and stays VISIBLE in
    search results rather than being silently collapsed — the corpus
    stores' duplicate-visibility convention.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        centroids: list[list[float]],
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        if not centroids or not centroids[0]:
            raise ValueError("centroids must be a non-empty K x dim matrix")
        dims = {len(c) for c in centroids}
        if len(dims) != 1:
            raise ValueError(f"ragged centroid matrix: dims {sorted(dims)}")
        self.spark = spark
        self.centroids = [[float(x) for x in c] for c in centroids]
        self.dim = len(self.centroids[0])
        self.id_col = id_col
        self.vec_col = vec_col
        self._index_dir = os.path.join(root, self._SUBDIR)
        self._meta_path = os.path.join(self._index_dir, "_index_meta.json")
        self._check_meta()  # reopening with different centroids fails NOW

    _SUBDIR = "ivf_index"

    # stable read schema / public columns (subclasses override)
    _FIELDS = INDEX_FIELDS
    _COLS = ["id", "vec", "cid"]

    def _meta_dict(self) -> dict:
        return {
            "n_centroids": len(self.centroids),
            "dim": self.dim,
            "centroid_md5": _centroid_fingerprint(self.centroids),
        }

    def _check_meta(self, create: bool = False) -> None:
        mine = self._meta_dict()
        if os.path.isfile(self._meta_path):
            with open(self._meta_path) as fh:
                stored = json.load(fh)
            if stored != mine:
                raise ValueError(
                    f"IVF store at {self._index_dir!r} was built with "
                    f"{stored}; reopening with {mine} would mix "
                    "incompatible list assignments — reuse the original "
                    "centroids, or retrain and REBUILD into a fresh root."
                )
            return
        if create:
            os.makedirs(self._index_dir, exist_ok=True)
            tmp = self._meta_path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(mine, fh)
            os.replace(tmp, self._meta_path)

    def _store_roots(self) -> list[str]:
        return [self._index_dir]

    def _checked_vec(self) -> F.Column:
        """The input vector as array<double>, with the wrong-dimension
        contract enforced IN-PLAN."""
        vec = F.transform(self.vec_col, lambda x: x.cast("double"))
        return F.when(
            F.size(self.vec_col) == F.lit(self.dim), vec
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"{type(self).__name__}: {self.vec_col!r} has "
                    ),
                    F.size(self.vec_col).cast("string"),
                    F.lit(
                        f" components, centroids have {self.dim} — a "
                        "mis-dimensioned vector would mis-assign "
                        "silently (zip_with NULL-pads the shorter side)"
                    ),
                )
            ).cast("array<double>")
        )

    def _valid_rows(self, batch_df: DataFrame) -> DataFrame:
        return batch_df.filter(
            F.col(self.id_col).isNotNull() & F.col(self.vec_col).isNotNull()
        ).select(
            F.col(self.id_col).cast("string").alias("id"),
            self._checked_vec().alias("vec"),
        )

    def _assigned(self, batch_df: DataFrame) -> DataFrame:
        return self._valid_rows(batch_df).select(
            "id", "vec", _assign_cid(F.col("vec"), self.centroids).alias("cid")
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Assign the batch with the frozen quantizer and overwrite its
        own ``batch_id=<n>`` directory, partitioned by ``cid`` — a
        distributed corpus-sized write, never collected; overwrite makes
        at-least-once replay idempotent.

        A batch with ZERO valid rows writes nothing (and removes any
        existing dir for its id): ``partitionBy`` emits no part files
        for empty data, and a file-less ``batch_id=`` dir would poison
        every later read with UNABLE_TO_INFER_SCHEMA — the empty-store
        fallback only covers the no-dirs-at-all case (r12 review). The
        same poison can arrive through a MID-WRITE failure — the
        isEmpty probe stops at the first row, so a batch mixing valid
        rows with one wrong-dimension vector passes it and the
        raise_error fires inside the write — so the write cleans up its
        partial dir on failure (write_batch_dir, r12 advice) and the
        contract error surfaces instead of poisoning later reads."""
        self._check_meta(create=True)
        assigned = self._assigned(batch_df)
        dest = os.path.join(self._index_dir, f"batch_id={batch_id}")
        if assigned.isEmpty():
            import shutil

            shutil.rmtree(dest, ignore_errors=True)
            return
        write_batch_dir(assigned, dest, partition_by=["cid"])

    def index(self) -> DataFrame:
        """Everything landed, as ``(id, vec, cid)`` — the same shape
        ``build_ivf_index`` produces, read from the live layout."""
        return read_root(self.spark, self._index_dir, self._FIELDS).select(
            *self._COLS
        )

    def list_sizes(self) -> DataFrame:
        """Per-list posting counts ``(cid, n_vectors)`` — the bounded
        K-row index-health stat (an empty or elephant list means the
        frozen centroids have drifted off the data and a retrain is
        due)."""
        return (
            self.index()
            .groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n_vectors"))
            .orderBy("cid")
        )

    def search(
        self,
        query_vec: list[float],
        k: int = 10,
        nprobe: int = 4,
        exact_engine_parity: bool = False,
    ) -> DataFrame:
        """Top-k over the maintained lists through the plain ``ivf_topk``
        operator: probe selection is O(K) on the driver, the scan reads
        only the probed ``cid=`` directories (partition-pruned on the
        streaming tail, row-group-stats-pruned on compacted bulk).
        ``nprobe >= K`` degrades to exact brute force over everything
        landed — the recall dial's exact end, pinned in tests."""
        if len(query_vec) != self.dim:
            raise ValueError(
                f"query has {len(query_vec)} components, index stores "
                f"{self.dim}"
            )
        return ivf_topk(
            self.index(),
            [float(x) for x in query_vec],
            self.centroids,
            k=k,
            nprobe=nprobe,
            id_col="id",
            vec_col="vec",
            exact_engine_parity=exact_engine_parity,
        )

    def search_exact(self, query_vec: list[float], k: int = 10) -> DataFrame:
        """Brute-force cosine top-k over everything landed — the exact
        baseline ``search``'s recall is measured against."""
        q = self.spark.createDataFrame(
            [([float(x) for x in query_vec],)], "q array<double>"
        )
        return brute_force_topk(
            self.index(), q, k=k, id_col="id", vec_col="vec"
        )

    def compact(self, target_partitions: int = 8, keep_last: int = 2) -> None:
        """Consolidate the batch-dir layout, clustered by ``cid`` so probe
        IN-filters stay selective via row-group min/max stats (the
        directory-level prune only exists while ``cid=`` partition dirs
        do; see module docstring for the 100 TB re-layout cadence)."""
        if os.path.isdir(self._index_dir):
            compact_root(
                self.spark,
                self._index_dir,
                target_partitions=target_partitions,
                keep_last=keep_last,
                cluster_by=["cid"],
            )


IVFPQ_FIELDS = [
    T.StructField("id", T.StringType()),
    T.StructField("codes", T.ArrayType(T.IntegerType())),
    T.StructField("batch_id", T.IntegerType()),
    T.StructField("cid", T.IntegerType()),
]


class IvfPqIndexMaintenance(IvfIndexMaintenance):
    """Maintained IVF+PQ composite index: the 100 TB serving format.

    Same replay-safe layout and frozen coarse quantizer as the parent,
    but each batch lands as ``(id, codes, cid)`` — M small ints per
    vector (``operators/pq.pq_encode``, pure codegen) instead of the
    raw components, a 16-64x byte reduction on what every probe reads
    (Jegou et al. 2011; the batch twin is
    ``operators/pq.build_ivfpq_index``). The PQ codebooks are frozen
    alongside the centroids and fingerprinted into the store meta —
    codes encoded under different codebooks are mutually meaningless,
    so drift fails at open like centroid drift does.

    ``search`` scores by asymmetric distance (``ivfpq_topk``: M table
    lookups + adds per row, partition-pruned to the probed lists).
    There is deliberately NO ``search_exact``: codes are lossy, the raw
    vectors are not in this store — recall baselines run against a raw
    store (the parent class, or the corpus itself), which is how the
    pytest pins do it.
    """

    _SUBDIR = "ivfpq_index"
    _FIELDS = IVFPQ_FIELDS
    _COLS = ["id", "codes", "cid"]

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        centroids: list[list[float]],
        codebooks: list[list[list[float]]],
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        if not codebooks or not codebooks[0] or not codebooks[0][0]:
            raise ValueError(
                "codebooks must be a non-empty M x K x d_sub tensor"
            )
        d_subs = {len(c) for book in codebooks for c in book}
        if len(d_subs) != 1:
            raise ValueError(f"ragged codebooks: d_subs {sorted(d_subs)}")
        self.codebooks = [
            [[float(x) for x in c] for c in book] for book in codebooks
        ]
        d_sub = len(self.codebooks[0][0])
        dim = len(centroids[0]) if centroids and centroids[0] else 0
        if len(self.codebooks) * d_sub != dim:
            raise ValueError(
                f"codebooks cover {len(self.codebooks)} x {d_sub} = "
                f"{len(self.codebooks) * d_sub} components, centroids "
                f"have {dim}"
            )
        super().__init__(spark, root, centroids, id_col, vec_col)

    def _meta_dict(self) -> dict:
        mine = super()._meta_dict()
        # structure-preserving hash: flattening the tensor would let a
        # DIFFERENTLY-SPLIT codebook with identical flattened centroids
        # (e.g. [[A,B],[C]] reopened as [[A],[B,C]]) slip past the drift
        # guard and mix mutually meaningless codes (r12 review)
        payload = json.dumps(
            [
                [[repr(float(x)) for x in c] for c in book]
                for book in self.codebooks
            ]
        ).encode()
        mine["codebook_md5"] = hashlib.md5(payload).hexdigest()
        mine["m"] = len(self.codebooks)
        return mine

    def _assigned(self, batch_df: DataFrame) -> DataFrame:
        # one projection: coarse list id + per-subspace codes, both pure
        # codegen over the same checked vector (the shared pq_code_expr,
        # so cid and codes ride one select with no join)
        return self._valid_rows(batch_df).select(
            "id",
            pq_code_expr(F.col("vec"), self.codebooks).alias("codes"),
            _assign_cid(F.col("vec"), self.centroids).alias("cid"),
        )

    def search(
        self,
        query_vec: list[float],
        k: int = 10,
        nprobe: int = 4,
        exact_engine_parity: bool = False,
    ) -> DataFrame:
        """ADC top-k over the maintained code lists through the plain
        ``ivfpq_topk`` operator — probed lists only, M lookups + adds
        per row, no per-component math on the scan side."""
        if len(query_vec) != self.dim:
            raise ValueError(
                f"query has {len(query_vec)} components, index stores "
                f"{self.dim}"
            )
        return ivfpq_topk(
            self.index(),
            [float(x) for x in query_vec],
            self.centroids,
            self.codebooks,
            k=k,
            nprobe=nprobe,
            id_col="id",
            exact_engine_parity=exact_engine_parity,
        )

    def search_exact(self, query_vec: list[float], k: int = 10) -> DataFrame:
        raise TypeError(
            "IvfPqIndexMaintenance stores lossy codes, not vectors — run "
            "the exact baseline against a raw store (IvfIndexMaintenance) "
            "or the corpus itself"
        )

