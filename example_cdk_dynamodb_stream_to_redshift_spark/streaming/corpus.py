"""Streaming corpus ingestion with cross-batch exact dedup.

The continuous-ingestion counterpart of the batch dedup family
(operators/dedup.py): documents arrive as a stream, and each micro-batch
lands only the docs whose content fingerprint has never been seen — the
shape of a training-corpus collector that must stay duplicate-free while
crawls/dumps trickle in.

Reference tie-in: this is the CDC merge recipe (operators/merge.py,
sql/incremental_sync_members.sql:38-52) re-keyed from row identity to
CONTENT identity — within-batch keep-first collapse (ST3 analogue), then a
dedup-anti-join into the accumulated target (ST4's delete+insert degenerates
to insert-if-absent because content rows are immutable).

Scale posture (the merge.py trick, reversed): the historical corpus is huge
and the micro-batch is small, so the batch's fingerprint set BROADCASTS —
history is probed map-side (left_semi against the broadcast batch set) and
never shuffles; the resulting seen-set (<= |batch| rows) broadcasts back
into an anti-join on the batch. Writes are batch_id-scoped overwrites, so
foreachBatch replays are idempotent (same recipe as the extract/quarantine/
sync-log writes in streaming/pipeline.py).

``history_probe="bloom"`` goes one step further: a PERSISTED Bloom bitset
over every landed fingerprint (operators/bloom.py; OR-maintained
incrementally, so replays are idempotent by set semantics) screens the
batch BEFORE any history I/O. Only bloom-positive fingerprints — true
repeats plus an ε of false positives — reach the exact history verify
join, and a batch with zero bloom hits skips the history scan entirely:
the steady-state cost of "mostly novel batches" drops from one full
history probe per batch to one bitset lookup per doc. The bitset decides
only WHAT gets verified, never the answer, so the kept set is IDENTICAL
to the scan mode (tests/test_corpus_ingest.py proves equivalence on a
multi-refresh fixture).

``decontam_docs=`` adds the held-out DECONTAMINATION gate between the
quality gates and dedup — the missing middle stage of the canonical
quality -> decontam -> dedup ingestion order: docs sharing more than
``decontam_max_hits`` distinct ``decontam_n``-gram md5s with the
held-out set (eval/test data) never land, so the corpus can never leak
benchmark text no matter how it arrives. Per-batch cost is
batch-scoped: the batch's shingles are screened map-side by a Bloom
bitset over the held-out keys (built once per process from the small
held-out frame), only ε + true hits pay the exact verify join, and
dropped docs are logged with hit counts (``decontamination_log()``) —
visible drops, the quarantine convention, replay-idempotent like every
other per-batch store here.

``postings_store=`` / ``ann_store=`` attach the maintained retrieval
stores (streaming/postings_maintenance, streaming/ann_maintenance) so a
corpus ingested through the pipeline stays SEARCHABLE without a
separate drive loop: each micro-batch's LANDED docs — the post-quality/
decontam/dedup batch-dir read-back, so drops and duplicate copies never
become searchable — flow into the stores' own replay-idempotent
process_batch, and ``compact()`` rides the pipeline's maintenance
cadence. With an ANN store attached the input stream carries the
embedding under the store's ``vec_col`` and the landed corpus keeps it.

``near_dedup="cluster"`` composes the same incremental LSH pair stream
with the maintained closure (streaming/cluster_maintenance) instead of
dropping: every exact-unique doc lands, and the near-dup CLUSTER
assignment is kept current batch-by-batch — the reversible dedup policy
(survivor choice and near-dup-aware weights stay downstream decisions).
tests/test_corpus_cluster_mode.py pins the maintained assignment equal
to the batch pipeline (full-corpus LSH pairs -> connected components)
after every refresh.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as _text
from ..operators import dedup as _dedup

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def content_fingerprint(col: str = "text") -> F.Column:
    """The exact-dedup key (operators/dedup.py convention): md5 of the
    lowercased, trimmed text."""
    return F.md5(F.lower(F.trim(F.col(col))).cast("binary"))


class CorpusIngestPipeline:
    """File-source streaming ingestion: JSONL doc files -> deduplicated
    corpus parquet. One ``refresh()`` = one AvailableNow micro-batch pass,
    mirroring CdcPipeline's REFRESH parity."""

    def __init__(
        self,
        spark: SparkSession,
        input_path: str,
        warehouse: str,
        near_dedup: bool | str = False,
        num_hashes: int = 16,
        bands: int = 4,
        jaccard_threshold: float = 0.5,
        quality_filter: bool = False,
        quality_model=None,
        quality_model_dim: int = 256,
        quality_threshold: float = 0.5,
        history_probe: str = "scan",
        bloom_bits: int = 1 << 23,
        bloom_k: int = 4,
        decontam_docs: DataFrame | None = None,
        decontam_n: int = 13,
        decontam_max_hits: int = 0,
        decontam_bloom_bits: int = 1 << 20,
        decontam_bloom_k: int = 4,
        postings_store=None,
        ann_store=None,
    ):
        """``history_probe``: "scan" probes the accumulated corpus with
        the broadcast batch fingerprint set every batch; "bloom" keeps a
        persisted bitset of all landed fingerprints and only runs the
        exact history verify for bloom-positive batch docs (identical
        kept set — the bitset has no false negatives and its false
        positives are re-checked exactly). Size ``bloom_bits`` at ~10
        bits per expected corpus doc for ε ≈ 1%.

        ``near_dedup`` picks the near-duplicate POLICY:

        - ``False`` — exact (fingerprint) dedup only;
        - ``True`` / ``"drop"`` — near-dup batch docs are DROPPED at
          ingest (greedy keep-first), the corpus stays near-dup-free;
        - ``"cluster"`` — near-dup docs are KEPT and their cluster
          assignments MAINTAINED (ClusterMaintenance over the same LSH
          pair stream): the reversible policy for when dedup decisions
          are revisited downstream (per-cluster survivor choice,
          near-dup-aware sampling weights). ``clusters()`` reads the
          assignment; ``canonical_corpus()`` applies the min-id
          survivor convention."""
        if history_probe not in ("scan", "bloom"):
            raise ValueError(f"history_probe must be scan|bloom, got {history_probe!r}")
        modes = {False: None, True: "drop", "drop": "drop", "cluster": "cluster"}
        if near_dedup not in modes:
            raise ValueError(
                f"near_dedup must be False|True|'drop'|'cluster', got {near_dedup!r}"
            )
        # trained quality gate (operators/quality_classifier.py weights):
        # scored per micro-batch, docs below threshold never reach the
        # dedup machinery — the learned complement of the Gopher rules
        self.quality_model = quality_model
        self.quality_model_dim = quality_model_dim
        self.quality_threshold = quality_threshold
        self.spark = spark
        self.input_path = input_path
        self.corpus_path = os.path.join(warehouse, "corpus")
        self.index_path = os.path.join(warehouse, "band_index")
        self.checkpoint = os.path.join(warehouse, "_checkpoint")
        self.bloom_path = os.path.join(warehouse, "fp_bloom.bin")
        self.dedup_mode = modes[near_dedup]
        # truthy for BOTH near-dup modes (index maintenance, compaction)
        self.near_dedup = self.dedup_mode is not None
        if self.dedup_mode == "cluster":
            from .cluster_maintenance import ClusterMaintenance

            self._clusters = ClusterMaintenance(spark, warehouse)
        self.num_hashes = num_hashes
        self.bands = bands
        self.jaccard_threshold = jaccard_threshold
        self.quality_filter = quality_filter
        self.history_probe = history_probe
        self.bloom_bits = bloom_bits
        self.bloom_k = bloom_k
        # held-out decontamination gate (the ngram_decontamination
        # operator's semantics at ingest): docs sharing > max_hits
        # distinct n-gram md5s with the held-out set never land. The key
        # set + its screening bitset derive lazily on first use (one
        # shingle pass over the SMALL held-out frame, once per process)
        # and are deterministic, so restarts re-derive identical state.
        if decontam_n < 1:
            raise ValueError(f"decontam_n must be >= 1, got {decontam_n}")
        if decontam_max_hits < 0:
            raise ValueError(
                f"decontam_max_hits must be >= 0, got {decontam_max_hits}"
            )
        self.decontam_docs = decontam_docs
        self.decontam_n = decontam_n
        self.decontam_max_hits = decontam_max_hits
        self.decontam_bloom_bits = decontam_bloom_bits
        self.decontam_bloom_k = decontam_bloom_k
        self.decontam_log_path = os.path.join(warehouse, "decontam_log")
        self._decontam_state: tuple | None = None
        # attached maintained retrieval stores (r12 verdict item 5): a
        # corpus ingested through the pipeline stays SEARCHABLE without
        # a separate drive loop. Each store ingests exactly what LANDED
        # (post-quality/decontam/dedup, the replay-correct read-back of
        # the batch dir) through its own replay-idempotent process_batch
        # — the same composition pattern as the cluster store above.
        if postings_store is not None and (
            postings_store.id_col != "doc_id"
            or postings_store.text_col != "text"
        ):
            raise ValueError(
                "postings_store must be built with id_col='doc_id', "
                f"text_col='text' to index this corpus; got "
                f"({postings_store.id_col!r}, {postings_store.text_col!r})"
            )
        if ann_store is not None and ann_store.id_col != "doc_id":
            raise ValueError(
                "ann_store must be built with id_col='doc_id' to index "
                f"this corpus; got {ann_store.id_col!r}"
            )
        self.postings_store = postings_store
        self.ann_store = ann_store
        # with an ANN store attached, the input stream carries the
        # embedding under the store's vec_col (array<double>) and the
        # landed corpus keeps it — docs arriving without one are
        # skipped by the store's documented NULL-vector contract
        self.stream_schema = T.StructType(list(DOC_STREAM_SCHEMA.fields))
        if ann_store is not None:
            self.stream_schema = self.stream_schema.add(
                T.StructField(
                    ann_store.vec_col, T.ArrayType(T.DoubleType())
                )
            )

    # -- reads ------------------------------------------------------------
    def _read_store(
        self, root: str, empty_fields: list, exclude_batch: int | None
    ) -> DataFrame:
        from . import batch_layout

        return batch_layout.read_root(self.spark, root, empty_fields, exclude_batch)

    def corpus(self, exclude_batch: int | None = None) -> DataFrame:
        """The accumulated deduplicated corpus (doc_id, text, lang, source,
        fp, batch_id). ``exclude_batch`` drops one batch's rows — used by a
        replayed batch so it never deduplicates against its own previous
        write."""
        fields = list(self.stream_schema.fields) + [
            T.StructField("fp", T.StringType()),
            T.StructField("batch_id", T.IntegerType()),
        ]
        return self._read_store(self.corpus_path, fields, exclude_batch)

    def band_index(self, exclude_batch: int | None = None) -> DataFrame:
        """The accumulated MinHash band index (id, band, key, batch_id) —
        each corpus batch appended its OWN docs' band rows at ingest time,
        so the index is always exactly the signatures of the accumulated
        corpus without any corpus re-shingling. Same batch-scoped layout
        (and ``exclude_batch`` replay guard) as the corpus itself."""
        fields = [
            T.StructField("id", T.LongType()),
            T.StructField("band", T.IntegerType()),
            T.StructField("key", T.StringType()),
            T.StructField("batch_id", T.IntegerType()),
        ]
        return self._read_store(self.index_path, fields, exclude_batch)

    # -- ingestion --------------------------------------------------------
    def _ingest_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self.quality_filter:
            # quality gate FIRST — the cheapest stage (pure per-row
            # codegen, no shuffle/state) runs before any dedup machinery
            # spends hashes or index probes on docs that would be dropped
            # anyway: the C4/Gopher pipeline ordering
            batch = batch.filter(_text.gopher_kept("text"))
        if self.quality_model is not None:
            # learned gate after the rule gate (CCNet ordering: cheap
            # rules prune, the classifier decides the borderline): one
            # Arrow scoring pass over the (micro-batch-sized) survivors,
            # kept ids semi-joined back — batch-scoped, no history I/O
            from ..operators.quality_classifier import score_quality

            kept = (
                score_quality(
                    batch,
                    self.quality_model,
                    dim=self.quality_model_dim,
                    id_cols=["doc_id"],
                )
                .filter(F.col("quality_score") >= self.quality_threshold)
                .select("doc_id")
            )
            batch = batch.join(F.broadcast(kept), "doc_id", "left_semi")
        if self.decontam_docs is not None:
            # decontamination AFTER the quality gates (cheapest first),
            # BEFORE dedup: a contaminated doc must never spend hashes or
            # index probes, and must never become the kept first-copy
            # that shadows a clean near-duplicate
            batch = self._decontaminate(batch, batch_id)
        fp_batch = batch.withColumn("fp", content_fingerprint())
        # within-batch keep-first (ST3 analogue): min doc_id per fingerprint,
        # deterministic regardless of arrival order inside the batch
        w = Window.partitionBy("fp").orderBy("doc_id")
        firsts = (
            fp_batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # cross-batch dedup, history never shuffles: probe the (huge)
        # corpus map-side with the (small) broadcast batch set, then
        # anti-join the <=|batch| seen fingerprints back into the batch
        history = self.corpus(exclude_batch=batch_id)
        seen = self._seen_fingerprints(firsts, history, batch_id)
        novel = firsts.join(F.broadcast(seen), "fp", "left_anti")
        if self.dedup_mode == "drop":
            novel = self._near_dedup_batch(novel, history, batch_id)
        # batch-scoped overwrite => replay-idempotent append
        novel.write.mode("overwrite").parquet(
            os.path.join(self.corpus_path, f"batch_id={batch_id}")
        )
        if self.history_probe == "bloom":
            # fold the landed fingerprints into the persisted bitset so
            # FUTURE batches screen against them; OR is idempotent, so a
            # replayed batch re-folding its own bits changes nothing
            landed_fp = self.spark.read.parquet(
                os.path.join(self.corpus_path, f"batch_id={batch_id}")
            ).select("fp")
            self._fold_into_bloom(landed_fp)
        landed = None
        if self.near_dedup:
            # append this batch's band rows so FUTURE batches probe them —
            # the index stays exactly the accumulated corpus's signatures,
            # maintained incrementally (the corpus is never re-shingled).
            # Recompute from the just-written batch dir (novel's lineage
            # references the pre-write plan; reading back is also the
            # replay-correct source of truth for what actually landed).
            landed = self.spark.read.parquet(
                os.path.join(self.corpus_path, f"batch_id={batch_id}")
            )
            _dedup.minhash_band_index(
                landed, num_hashes=self.num_hashes, bands=self.bands
            ).write.mode("overwrite").parquet(
                os.path.join(self.index_path, f"batch_id={batch_id}")
            )
            if self.dedup_mode == "cluster":
                self._cluster_batch(landed, batch_id)
        if self.postings_store is not None or self.ann_store is not None:
            # attached retrieval stores index exactly what LANDED — the
            # batch-dir read-back, so quality/decontam/dedup drops never
            # become searchable and a replayed batch re-lands the same
            # rows into the stores' own replay-idempotent batch dirs
            if landed is None:
                landed = self.spark.read.parquet(
                    os.path.join(self.corpus_path, f"batch_id={batch_id}")
                )
            if self.postings_store is not None:
                self.postings_store.process_batch(landed, batch_id)
            if self.ann_store is not None:
                self.ann_store.process_batch(landed, batch_id)

    # -- decontamination gate ----------------------------------------------
    def _decontam_keys(self) -> tuple:
        """(keys DataFrame, bitset) for the held-out n-gram set, derived
        once per process from the SMALL held-out frame and cached: the
        distinct n-gram md5 keys (the exact-verify side) plus a Bloom
        bitset over them (the map-side screen). Derivation is a pure
        function of (docs, n), so a restarted pipeline reconstructs
        identical state — no persisted sidecar to drift."""
        if self._decontam_state is None:
            from ..operators import bloom as _bloom

            keys = (
                _dedup.shingle_rows(
                    self.decontam_docs.select("doc_id", "text"),
                    "text",
                    "doc_id",
                    self.decontam_n,
                )
                .select(F.md5("s").alias("g"))
                .distinct()
                .localCheckpoint(eager=True)  # one shingle pass, reused every batch
            )
            bits = _bloom.build_bloom(
                keys, "g", self.decontam_bloom_bits, self.decontam_bloom_k
            )
            # broadcast ONCE and cache the handle: might_contain_filter
            # with a raw ndarray creates (and pins until GC) a new
            # bitset-sized broadcast block per call — per micro-batch, in
            # a long-lived stream (the helper's own documented contract
            # for repeated probers)
            bc = self.spark.sparkContext.broadcast(bits)
            self._decontam_state = (keys, bc)
        return self._decontam_state

    def reset_decontam_state(self) -> None:
        """Release the cached held-out state: unpersist the Bloom
        broadcast (its bitset block is otherwise pinned on every
        executor until process exit) and drop the localCheckpoint'ed
        key frame reference. Safe to call any time — the next batch
        re-derives identical state (pure function of (docs, n))."""
        if self._decontam_state is not None:
            _keys, bc = self._decontam_state
            self._decontam_state = None
            try:
                bc.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release

    close = reset_decontam_state  # end-of-life hook alias

    def _decontaminate(self, batch: DataFrame, batch_id: int) -> DataFrame:
        """Drop batch docs sharing > max_hits DISTINCT n-gram md5s with
        the held-out set (ngram_decontamination's semantics, applied at
        ingest). Batch-scoped cost: the batch's shingle stream is
        screened MAP-SIDE by the held-out bitset (zero-hit batches
        shuffle nothing), survivors get the exact key join — the bitset
        decides what shuffles, never the answer. Dropped docs are
        recorded with their hit counts in the decontam log (batch-dir
        overwrite, replay-idempotent) so contamination stays VISIBLE,
        the quarantine convention.

        The cached key frame is a ``localCheckpoint`` — its blocks are
        NON-RELIABLE, so on a real cluster an executor loss invalidates
        them (r12 advice). The exact-verify join therefore retries ONCE
        after re-deriving the state from scratch (a pure function of
        ``(decontam_docs, n)``, so the retry computes identical keys);
        a second failure is a real error and propagates."""
        try:
            return self._decontaminate_once(batch, batch_id)
        except Exception:
            self.reset_decontam_state()
            return self._decontaminate_once(batch, batch_id)

    def _decontaminate_once(self, batch: DataFrame, batch_id: int) -> DataFrame:
        from ..operators import bloom as _bloom

        keys, bits = self._decontam_keys()  # bits is the cached Broadcast
        sh = (
            _dedup.shingle_rows(
                batch.select("doc_id", "text"), "text", "doc_id", self.decontam_n
            )
            .select("id", F.md5("s").alias("g"))
            .distinct()
        )
        screened = _bloom.might_contain_filter(
            sh, "g", bits, self.decontam_bloom_bits, self.decontam_bloom_k
        )
        dropped = (
            screened.join(keys, "g")
            .groupBy(F.col("id").alias("doc_id"))
            .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
            .filter(F.col("n_shared_ngrams") > F.lit(self.decontam_max_hits))
        )
        # batch-scoped overwrite (possibly empty) => a replayed batch
        # rewrites its own log instead of doubling it
        dropped.write.mode("overwrite").parquet(
            os.path.join(self.decontam_log_path, f"batch_id={batch_id}")
        )
        logged = self.spark.read.parquet(
            os.path.join(self.decontam_log_path, f"batch_id={batch_id}")
        ).select("doc_id")
        return batch.join(F.broadcast(logged), "doc_id", "left_anti")

    def decontamination_log(self) -> DataFrame:
        """Every dropped-at-ingest contaminated doc: (doc_id,
        n_shared_ngrams, batch_id) across the live layout."""
        fields = [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_shared_ngrams", T.LongType()),
            T.StructField("batch_id", T.IntegerType()),
        ]
        return self._read_store(self.decontam_log_path, fields, None)

    def _cluster_batch(self, landed: DataFrame, batch_id: int) -> None:
        """Fold the batch's verified near-dup pairs into the maintained
        cluster assignment: cross-batch pairs from ONE probe of the
        persisted band index (the landed history is never re-shingled),
        within-batch pairs from an LSH self-join over the (small) batch
        reusing its just-written band rows — then one
        ClusterMaintenance.process_batch, whose own exclude-batch replay
        guard composes with this store's."""
        batch_index = self.spark.read.parquet(
            os.path.join(self.index_path, f"batch_id={batch_id}")
        ).select("id", "band", "key")
        cross = _dedup.incremental_near_dup_pairs(
            self.band_index(exclude_batch=batch_id).select("id", "band", "key"),
            self.corpus(exclude_batch=batch_id),
            landed,
            num_hashes=self.num_hashes,
            bands=self.bands,
            threshold=self.jaccard_threshold,
            batch_index=batch_index,
        )
        within = _dedup.minhash_lsh_near_dup_pairs(
            landed,
            num_hashes=self.num_hashes,
            bands=self.bands,
            threshold=self.jaccard_threshold,
            band_index=batch_index,
        )
        edges = cross.select(
            F.col("batch_id").alias("src"), F.col("corpus_id").alias("dst")
        ).union(
            within.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        )
        self._clusters.process_batch(edges, batch_id)

    # -- cluster-mode reads -------------------------------------------------
    def clusters(self) -> DataFrame:
        """Current ``(node, component)`` near-dup cluster assignment
        (cluster mode only) — docs with no near-dup edge are absent;
        they are their own singleton component by convention."""
        if self.dedup_mode != "cluster":
            raise ValueError("clusters() requires near_dedup='cluster'")
        return self._clusters.clusters()

    def canonical_corpus(self) -> DataFrame:
        """The corpus reduced to one survivor per near-dup cluster
        (minimum doc_id — the same canonical convention as the batch
        dedup_clusters query), computed from the MAINTAINED assignment:
        no pair regeneration, no closure recomputation at read time."""
        if self.dedup_mode != "cluster":
            raise ValueError("canonical_corpus() requires near_dedup='cluster'")
        comp = self._clusters.clusters().select(
            F.col("node").alias("doc_id"), "component"
        )
        corpus = self.corpus()
        return (
            corpus.join(comp, "doc_id", "left")
            .filter(
                F.coalesce(F.col("component"), F.col("doc_id"))
                == F.col("doc_id")
            )
            .drop("component")
        )

    def _seen_fingerprints(
        self, firsts: DataFrame, history: DataFrame, batch_id: int
    ) -> DataFrame:
        """Fingerprints of ``firsts`` already present in ``history``
        (<= |batch| rows). "scan": one map-side broadcast-semi probe of
        the full history. "bloom": screen the batch against the persisted
        bitset first; only bloom-positive fingerprints reach the exact
        history verify, and zero positives skips history I/O entirely."""
        if self.history_probe == "scan":
            return history.join(
                F.broadcast(firsts.select("fp")), "fp", "left_semi"
            ).select("fp").distinct()
        from ..operators import bloom as _bloom

        bits = self._load_bloom(batch_id)
        candidates = _bloom.might_contain_filter(
            firsts.select("fp"), "fp", bits, self.bloom_bits, self.bloom_k
        # the candidate set is consumed twice (empty probe + verify join)
        # and is <= |batch| rows: materialize once
        ).localCheckpoint(eager=True)
        if candidates.isEmpty():
            return candidates  # nothing ever seen: no history scan at all
        return history.join(
            F.broadcast(candidates), "fp", "left_semi"
        ).select("fp").distinct()

    # -- bloom state ------------------------------------------------------
    def _load_bloom(self, batch_id: int | None = None):
        """The persisted fingerprint bitset. Missing file + existing
        corpus (a warehouse built in scan mode, or a lost sidecar) means
        the bitset must be REBUILT from history before it is trusted — a
        Bloom with false negatives would silently re-admit duplicates."""
        import numpy as np

        if os.path.exists(self.bloom_path):
            bits = np.fromfile(self.bloom_path, dtype=np.uint8)
            if bits.size == self.bloom_bits // 8:
                return bits
            raise ValueError(
                f"bloom bitset at {self.bloom_path} has {bits.size * 8} bits, "
                f"pipeline configured for {self.bloom_bits} — rebuild or fix "
                "bloom_bits (a mis-sized probe would produce false negatives)"
            )
        from ..operators import bloom as _bloom

        history_fp = self.corpus(exclude_batch=batch_id).select("fp")
        bits = _bloom.build_bloom(
            history_fp, "fp", num_bits=self.bloom_bits, k=self.bloom_k
        )
        self._save_bloom(bits)
        return bits

    def _fold_into_bloom(self, fps: DataFrame) -> None:
        import numpy as np

        from ..operators import bloom as _bloom

        bits = self._load_bloom()
        bits = bits | _bloom.build_bloom(
            fps, "fp", num_bits=self.bloom_bits, k=self.bloom_k
        )
        self._save_bloom(bits)

    def _save_bloom(self, bits) -> None:
        # tmp + atomic rename: a crash mid-write leaves the previous
        # bitset (or none — triggering a rebuild), never a torn file
        tmp = self.bloom_path + ".tmp"
        os.makedirs(os.path.dirname(self.bloom_path), exist_ok=True)
        bits.tofile(tmp)
        os.replace(tmp, self.bloom_path)

    def _near_dedup_batch(
        self, novel: DataFrame, history: DataFrame, batch_id: int
    ) -> DataFrame:
        """Drop batch docs that near-duplicate (Jaccard >= threshold) either
        (a) an accumulated-corpus doc — found by probing the PERSISTED band
        index, so the historical corpus is never re-shingled — or (b) a
        smaller-id doc in the same batch (greedy keep-first via one LSH
        self-join over the small batch)."""
        index = self.band_index(exclude_batch=batch_id)
        cross = _dedup.incremental_near_dup_pairs(
            index.select("id", "band", "key"),
            history,
            novel,
            num_hashes=self.num_hashes,
            bands=self.bands,
            threshold=self.jaccard_threshold,
        )
        cross_ids = cross.select(F.col("batch_id").alias("doc_id")).distinct()
        survivors = novel.join(F.broadcast(cross_ids), "doc_id", "left_anti")
        within = _dedup.minhash_lsh_near_dup_pairs(
            survivors,
            num_hashes=self.num_hashes,
            bands=self.bands,
            threshold=self.jaccard_threshold,
        )
        # keep-first: any doc near-matching a smaller id in the batch drops
        later_ids = within.select(F.col("id_b").alias("doc_id")).distinct()
        return survivors.join(F.broadcast(later_ids), "doc_id", "left_anti")

    def refresh(self) -> None:
        """Process all newly-arrived doc files, then return (AvailableNow)."""
        stream = self.spark.readStream.schema(self.stream_schema).json(
            self.input_path
        )
        query = (
            stream.writeStream.foreachBatch(self._ingest_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()

    def start(self, processing_time: str = "60 seconds"):
        """CONTINUOUS ingestion on a processing-time cadence (the corpus
        twin of CdcPipeline.start). Shares the checkpoint with
        ``refresh()`` so the two modes interleave without reprocessing;
        the caller owns the returned StreamingQuery's lifecycle."""
        stream = self.spark.readStream.schema(self.stream_schema).json(
            self.input_path
        )
        return (
            stream.writeStream.foreachBatch(self._ingest_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(processingTime=processing_time)
            .start()
        )

    # -- maintenance ------------------------------------------------------
    def compact(
        self, target_partitions: int = 8, keep_last: int = 2
    ) -> None:
        """Consolidate the per-micro-batch directory layout into one
        ``compact=<k>`` directory per store (corpus and, in near-dedup
        mode, the band index) — the streaming small-files fix. Protocol,
        crash-safety, and replay guarantees live in
        ``streaming/batch_layout.py`` (shared with CdcPipeline.compact);
        run from the maintenance side while the stream is the only
        writer of NEW batch dirs."""
        from . import batch_layout

        roots = [self.corpus_path]
        if self.near_dedup:
            roots.append(self.index_path)
        if os.path.isdir(self.decontam_log_path):
            roots.append(self.decontam_log_path)
        for root in roots:
            # keep_last (default 2) protects the replayable tail (same
            # guard as CdcPipeline.compact): a replayed batch whose rows
            # were already folded would land them a second time. Pass 0
            # only when the stream is provably quiescent and committed.
            batch_layout.compact_root(
                self.spark, root, target_partitions=target_partitions,
                keep_last=keep_last,
            )
        if self.dedup_mode == "cluster":
            # fold the cluster store's remap log too, with the SAME
            # replay-tail depth — a shallower guard there would re-land
            # folded nodes on a deep replay
            self._clusters.checkpoint(
                target_partitions=target_partitions, keep_last=keep_last
            )
        # attached retrieval stores ride the same maintenance cadence
        # (their compact() carries each store's clustering choice:
        # postings by tb, ANN lists by cid)
        for store in (self.postings_store, self.ann_store):
            if store is not None:
                store.compact(
                    target_partitions=target_partitions, keep_last=keep_last
                )
