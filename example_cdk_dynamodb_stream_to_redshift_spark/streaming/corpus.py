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
"""

from __future__ import annotations

import glob as _glob
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
        near_dedup: bool = False,
        num_hashes: int = 16,
        bands: int = 4,
        jaccard_threshold: float = 0.5,
        quality_filter: bool = False,
        history_probe: str = "scan",
        bloom_bits: int = 1 << 23,
        bloom_k: int = 4,
    ):
        """``history_probe``: "scan" probes the accumulated corpus with
        the broadcast batch fingerprint set every batch; "bloom" keeps a
        persisted bitset of all landed fingerprints and only runs the
        exact history verify for bloom-positive batch docs (identical
        kept set — the bitset has no false negatives and its false
        positives are re-checked exactly). Size ``bloom_bits`` at ~10
        bits per expected corpus doc for ε ≈ 1%."""
        if history_probe not in ("scan", "bloom"):
            raise ValueError(f"history_probe must be scan|bloom, got {history_probe!r}")
        self.spark = spark
        self.input_path = input_path
        self.corpus_path = os.path.join(warehouse, "corpus")
        self.index_path = os.path.join(warehouse, "band_index")
        self.checkpoint = os.path.join(warehouse, "_checkpoint")
        self.bloom_path = os.path.join(warehouse, "fp_bloom.bin")
        self.near_dedup = near_dedup
        self.num_hashes = num_hashes
        self.bands = bands
        self.jaccard_threshold = jaccard_threshold
        self.quality_filter = quality_filter
        self.history_probe = history_probe
        self.bloom_bits = bloom_bits
        self.bloom_k = bloom_k

    # -- reads ------------------------------------------------------------
    @staticmethod
    def _superseded(root: str) -> set[str]:
        """Basenames superseded by compaction markers under ``root``. A
        compacted directory carries ``_compacted_from.json`` naming the
        source dirs it replaced; those stay excluded from every read even
        if their deletion hasn't happened yet (the crash window between
        marker publication and cleanup never shows duplicate rows)."""
        import json as _json

        gone: set[str] = set()
        for marker in _glob.glob(os.path.join(root, "compact=*", "_compacted_from.json")):
            try:
                with open(marker) as fh:
                    gone.update(_json.load(fh)["superseded"])
            except (OSError, ValueError, KeyError):
                # unreadable marker = torn compact dir; ignore the dir
                gone.add(os.path.basename(os.path.dirname(marker)))
        return gone

    def _read_store(
        self, root: str, empty_fields: list, exclude_batch: int | None
    ) -> DataFrame:
        gone = self._superseded(root)
        batch_dirs = [
            d
            for d in _glob.glob(os.path.join(root, "batch_id=*"))
            if os.path.basename(d) not in gone
            and (exclude_batch is None or not d.endswith(f"batch_id={exclude_batch}"))
        ]
        compact_dirs = [
            d
            for d in _glob.glob(os.path.join(root, "compact=*"))
            if os.path.basename(d) not in gone
        ]
        parts = []
        if batch_dirs:
            parts.append(
                self.spark.read.option("basePath", root).parquet(*batch_dirs)
            )
        if compact_dirs:
            # compacted files store batch_id as a DATA column (original
            # landing batch preserved); the replay guard must still apply
            dc = self.spark.read.parquet(*compact_dirs)
            if exclude_batch is not None:
                dc = dc.filter(F.col("batch_id") != exclude_batch)
            parts.append(dc)
        if not parts:
            return self.spark.createDataFrame([], T.StructType(empty_fields))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def corpus(self, exclude_batch: int | None = None) -> DataFrame:
        """The accumulated deduplicated corpus (doc_id, text, lang, source,
        fp, batch_id). ``exclude_batch`` drops one batch's rows — used by a
        replayed batch so it never deduplicates against its own previous
        write."""
        fields = list(DOC_STREAM_SCHEMA.fields) + [
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
        if self.near_dedup:
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
        stream = self.spark.readStream.schema(DOC_STREAM_SCHEMA).json(
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
        stream = self.spark.readStream.schema(DOC_STREAM_SCHEMA).json(
            self.input_path
        )
        return (
            stream.writeStream.foreachBatch(self._ingest_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(processingTime=processing_time)
            .start()
        )

    # -- maintenance ------------------------------------------------------
    def compact(self, target_partitions: int = 8) -> None:
        """Consolidate the per-micro-batch directory layout into one
        ``compact=<k>`` directory per store — the streaming small-files
        fix: N micro-batches otherwise mean N directories × a few files
        each, and at ingest-forever scale the file listing (not the data)
        becomes the read bottleneck.

        Crash-safe by construction: the consolidated data is written to a
        hidden temp dir together with a ``_compacted_from.json`` marker
        naming every superseded directory, then atomically renamed into
        place; readers honor markers, so the window between publication
        and source deletion never shows duplicate rows, and a crash
        anywhere leaves either the old layout or a fully-valid new one.
        Re-running compact() completes any pending cleanup first.

        Replay safety: compacted rows keep their original ``batch_id`` as
        a data column, so a replayed micro-batch still excludes its own
        prior rows (the ``exclude_batch`` guard filters compacted dirs by
        value). Run from the maintenance side while the stream is the
        only writer of NEW batch dirs — compaction never touches a
        directory created after it listed its sources."""
        import json as _json
        import shutil as _shutil

        roots = [self.corpus_path]
        if self.near_dedup:
            roots.append(self.index_path)
        for root in roots:
            if not os.path.isdir(root):
                continue
            # finish any prior compaction's pending cleanup (idempotent)
            for base in self._superseded(root):
                _shutil.rmtree(os.path.join(root, base), ignore_errors=True)
            batch_dirs = sorted(_glob.glob(os.path.join(root, "batch_id=*")))
            compact_dirs = sorted(_glob.glob(os.path.join(root, "compact=*")))
            sources = batch_dirs + compact_dirs
            if len(sources) <= 1:
                continue
            # read EXACTLY the captured source dirs (not a re-glob: a
            # micro-batch landing mid-compaction must be neither absorbed
            # nor deleted); batch_id becomes a data column
            parts = []
            if batch_dirs:
                parts.append(
                    self.spark.read.option("basePath", root).parquet(*batch_dirs)
                )
            if compact_dirs:
                parts.append(self.spark.read.parquet(*compact_dirs))
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
            df = df.repartition(target_partitions)
            next_k = (
                max(
                    (int(os.path.basename(d).split("=", 1)[1]) for d in compact_dirs),
                    default=-1,
                )
                + 1
            )
            tmp = os.path.join(root, f".compact_tmp_{next_k}")
            _shutil.rmtree(tmp, ignore_errors=True)
            df.write.mode("overwrite").parquet(tmp)
            with open(os.path.join(tmp, "_compacted_from.json"), "w") as fh:
                _json.dump(
                    {"superseded": [os.path.basename(d) for d in sources]}, fh
                )
            os.replace(tmp, os.path.join(root, f"compact={next_k}"))
            for d in sources:
                _shutil.rmtree(d, ignore_errors=True)
