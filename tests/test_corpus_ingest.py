"""Streaming corpus ingestion: cross-batch exact dedup semantics.

Pins: within-batch keep-first, cross-batch fingerprint suppression,
incremental second refresh (checkpointed file source), and replay
idempotence of a batch write.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.streaming.corpus import (
    CorpusIngestPipeline,
)


def _write_docs(path: str, docs: list[tuple[int, str]]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for doc_id, text in docs:
            fh.write(
                json.dumps(
                    {"doc_id": doc_id, "text": text, "lang": "en", "source": "s"}
                )
                + "\n"
            )


def _ids(pipe: CorpusIngestPipeline) -> set[int]:
    return {r["doc_id"] for r in pipe.corpus().collect()}


def test_two_refreshes_dedup_within_and_across_batches(spark, tmp_path):
    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    pipe = CorpusIngestPipeline(spark, inp, wh)

    # batch 1: docs 1 and 3 share content -> keep-first keeps 1
    _write_docs(os.path.join(inp, "b1.json"), [(1, "alpha text"), (2, "beta text"), (3, "alpha text")])
    pipe.refresh()
    assert _ids(pipe) == {1, 2}

    # batch 2: doc 4 repeats batch-1 content (suppressed), 5 is novel;
    # case/whitespace-normalized duplicate (6) is suppressed too
    _write_docs(
        os.path.join(inp, "b2.json"),
        [(4, "beta text"), (5, "gamma text"), (6, "  ALPHA TEXT  ")],
    )
    pipe.refresh()
    assert _ids(pipe) == {1, 2, 5}

    # corpus rows carry their landing batch and fingerprint
    rows = {r["doc_id"]: r for r in pipe.corpus().collect()}
    assert rows[5]["batch_id"] == 1  # second micro-batch (0-indexed)
    assert rows[1]["fp"] == rows[1]["fp"] and len(rows[1]["fp"]) == 32


def test_replayed_batch_is_idempotent(spark, tmp_path):
    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    pipe = CorpusIngestPipeline(spark, inp, wh)
    _write_docs(os.path.join(inp, "b1.json"), [(1, "alpha"), (2, "beta")])
    pipe.refresh()
    before = _ids(pipe)

    # simulate foreachBatch at-least-once: re-run the SAME batch payload
    # with the same batch_id — the batch-scoped overwrite plus
    # exclude-own-batch dedup must leave the corpus unchanged
    batch = spark.createDataFrame(
        [(1, "alpha", "en", "s"), (2, "beta", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    pipe._ingest_batch(batch, 0)
    assert _ids(pipe) == before

    # and a replay that races AFTER later batches still only rewrites its
    # own directory: add batch 1, then replay batch 0 again
    _write_docs(os.path.join(inp, "b2.json"), [(3, "gamma")])
    pipe.refresh()
    pipe._ingest_batch(batch, 0)
    assert _ids(pipe) == {1, 2, 3}


def test_replay_after_compaction_never_double_lands(spark, tmp_path):
    """compact() must keep the replayable tail OUT of the fold
    (keep_last=2, the CdcPipeline guard): a replayed batch whose rows
    were already folded would land them a second time."""
    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    pipe = CorpusIngestPipeline(spark, inp, wh)
    docs = [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta")]
    for i, doc in enumerate(docs):
        _write_docs(os.path.join(inp, f"b{i}.json"), [doc])
        pipe.refresh()
    # 4 batch dirs - keep_last=2 leaves 2 to fold: the compaction must
    # actually RUN for the guard to be exercised
    import glob

    pipe.compact()
    assert glob.glob(os.path.join(wh, "corpus", "compact=*"))
    last = spark.createDataFrame(
        [(4, "delta", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    pipe._ingest_batch(last, 3)  # at-least-once retry of the last batch
    rows = pipe.corpus().collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 3, 4]
    # and a replay of a FOLDED batch would be the dangerous case; the
    # stream never replays committed batches, but document the guard:
    # batch 0/1 rows live only in the compact dir now
    b01 = [d for d in glob.glob(os.path.join(wh, "corpus", "batch_id=*"))]
    assert all(int(d.rsplit("=", 1)[1]) >= 2 for d in b01)


def test_empty_corpus_reader_has_full_schema(spark, tmp_path):
    pipe = CorpusIngestPipeline(spark, str(tmp_path / "in"), str(tmp_path / "wh"))
    df = pipe.corpus()
    assert df.count() == 0
    assert set(df.columns) == {"doc_id", "text", "lang", "source", "fp", "batch_id"}


# -- near-dedup ingestion mode ---------------------------------------------

_W = [f"tok{i}" for i in range(20)]
BASE = " ".join(_W)                          # 20 distinct tokens
VAR = " ".join(_W[:-1] + ["changed"])        # 1-token edit: Jaccard 0.8
OTHER = " ".join(f"oth{i}" for i in range(20))
NOVEL = " ".join(f"new{i}" for i in range(20))
NOVEL_VAR = " ".join([f"new{i}" for i in range(19)] + ["edited"])


def _index_ids(pipe: CorpusIngestPipeline) -> set[int]:
    return {r["id"] for r in pipe.band_index().select("id").distinct().collect()}


def test_near_dedup_ingestion_across_and_within_batches(spark, tmp_path):
    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    pipe = CorpusIngestPipeline(
        spark, inp, wh, near_dedup=True, jaccard_threshold=0.5
    )

    _write_docs(os.path.join(inp, "b1.json"), [(1, BASE), (2, OTHER)])
    pipe.refresh()
    assert _ids(pipe) == {1, 2}
    assert _index_ids(pipe) == {1, 2}  # index rows landed with the batch

    # batch 2: 3 near-duplicates corpus doc 1 (caught by the PERSISTED
    # index probe); 4 is novel; 5 near-duplicates 4 within the same batch
    # (greedy keep-first LSH self-join)
    _write_docs(
        os.path.join(inp, "b2.json"),
        [(3, VAR), (4, NOVEL), (5, NOVEL_VAR)],
    )
    pipe.refresh()
    assert _ids(pipe) == {1, 2, 4}
    # the index grew by exactly the landed doc's signatures
    assert _index_ids(pipe) == {1, 2, 4}


def test_near_dedup_replay_is_idempotent(spark, tmp_path):
    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    pipe = CorpusIngestPipeline(
        spark, inp, wh, near_dedup=True, jaccard_threshold=0.5
    )
    _write_docs(os.path.join(inp, "b1.json"), [(1, BASE), (2, OTHER)])
    pipe.refresh()
    _write_docs(os.path.join(inp, "b2.json"), [(3, VAR), (4, NOVEL)])
    pipe.refresh()
    assert _ids(pipe) == {1, 2, 4}
    before_idx = _index_ids(pipe)

    # at-least-once replay of batch 1 with the same payload: the
    # exclude-own-batch guards on BOTH stores must leave corpus and
    # index unchanged (3 still near-dups 1 via the retained batch-0 index)
    batch = spark.createDataFrame(
        [(3, VAR, "en", "s"), (4, NOVEL, "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    pipe._ingest_batch(batch, 1)
    assert _ids(pipe) == {1, 2, 4}
    assert _index_ids(pipe) == before_idx


# -- quality-gated ingestion mode -------------------------------------------

GOOD = " ".join(["the", "and"] + [f"word{i:03d}" for i in range(58)])
SHORT = " ".join(f"tok{i}" for i in range(20))  # fails ok_word_count


def test_quality_filter_gates_ingestion(spark, tmp_path):
    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    pipe = CorpusIngestPipeline(spark, inp, wh, quality_filter=True)
    _write_docs(os.path.join(inp, "b1.json"), [(1, GOOD), (2, SHORT)])
    pipe.refresh()
    assert _ids(pipe) == {1}  # the 20-word doc never reaches the corpus

    # quality runs BEFORE dedup: a later batch re-sending the good doc's
    # content under a new id is still dropped by the cross-batch dedup
    _write_docs(os.path.join(inp, "b2.json"), [(3, GOOD), (4, SHORT)])
    pipe.refresh()
    assert _ids(pipe) == {1}


def test_quality_filter_off_keeps_everything(spark, tmp_path):
    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    pipe = CorpusIngestPipeline(spark, inp, wh)
    _write_docs(os.path.join(inp, "b1.json"), [(1, GOOD), (2, SHORT)])
    pipe.refresh()
    assert _ids(pipe) == {1, 2}


# -- bloom-prefiltered history probe ----------------------------------------


def test_bloom_probe_equivalent_to_scan_multi_refresh(spark, tmp_path):
    """The 100 TB swap-in (SCALE.md): the persisted-bitset probe must keep
    the IDENTICAL doc set as the full history scan across several
    refreshes mixing novel docs, exact repeats, and normalized repeats."""
    inp = str(tmp_path / "in")
    batches = [
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")],
        [(4, "beta text"), (5, "gamma text"), (6, "  ALPHA TEXT  ")],
        [(7, "delta text"), (8, "gamma text"), (9, "epsilon text")],
    ]
    pipes = {
        mode: CorpusIngestPipeline(
            spark, inp, str(tmp_path / f"wh_{mode}"),
            history_probe=mode, bloom_bits=1 << 16,
        )
        for mode in ("scan", "bloom")
    }
    for i, docs in enumerate(batches):
        _write_docs(os.path.join(inp, f"b{i}.json"), docs)
        for pipe in pipes.values():
            pipe.refresh()
        assert _ids(pipes["bloom"]) == _ids(pipes["scan"])
    assert _ids(pipes["scan"]) == {1, 2, 5, 7, 9}
    # full row-level equality, not just ids
    rows = {
        mode: sorted(
            (r["doc_id"], r["text"], r["fp"], r["batch_id"])
            for r in p.corpus().collect()
        )
        for mode, p in pipes.items()
    }
    assert rows["bloom"] == rows["scan"]
    assert os.path.exists(pipes["bloom"].bloom_path)


def test_bloom_probe_composes_with_near_dedup(spark, tmp_path):
    """history_probe='bloom' + near_dedup=True: the bitset gates only the
    exact-fingerprint stage; the persisted-band-index near-dup probe runs
    unchanged, and the kept set matches the scan-mode pipeline."""
    inp = str(tmp_path / "in")
    batches = [
        [(1, BASE), (2, OTHER)],
        [(3, VAR), (4, NOVEL), (5, NOVEL_VAR)],  # 3 near-dups corpus, 5 near-dups 4
        [(6, BASE), (7, " ".join(f"fresh{i}" for i in range(20)))],
    ]
    pipes = {
        mode: CorpusIngestPipeline(
            spark, inp, str(tmp_path / f"wh_{mode}"),
            near_dedup=True, jaccard_threshold=0.5,
            history_probe=mode, bloom_bits=1 << 16,
        )
        for mode in ("scan", "bloom")
    }
    for i, docs in enumerate(batches):
        _write_docs(os.path.join(inp, f"b{i}.json"), docs)
        for pipe in pipes.values():
            pipe.refresh()
    assert _ids(pipes["bloom"]) == _ids(pipes["scan"]) == {1, 2, 4, 7}
    assert _index_ids(pipes["bloom"]) == _index_ids(pipes["scan"])


def test_bloom_rebuilds_from_scan_mode_warehouse(spark, tmp_path):
    """Opening an existing scan-mode warehouse in bloom mode must REBUILD
    the bitset from history before trusting it — a missing sidecar read
    as empty would have false negatives and re-admit duplicates."""
    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    scan = CorpusIngestPipeline(spark, inp, wh)
    _write_docs(os.path.join(inp, "b1.json"), [(1, "alpha"), (2, "beta")])
    scan.refresh()
    assert not os.path.exists(os.path.join(wh, "fp_bloom.bin"))

    bloom = CorpusIngestPipeline(
        spark, inp, wh, history_probe="bloom", bloom_bits=1 << 16
    )
    _write_docs(os.path.join(inp, "b2.json"), [(3, "alpha"), (4, "gamma")])
    bloom.refresh()
    assert _ids(bloom) == {1, 2, 4}  # 3 suppressed via the REBUILT bitset


def test_bloom_replay_is_idempotent(spark, tmp_path):
    """A replayed batch re-folds its own bits (OR: no-op) and its
    bloom-positive fps verify against history that EXCLUDES its own
    batch — the corpus stays unchanged."""
    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    pipe = CorpusIngestPipeline(
        spark, inp, wh, history_probe="bloom", bloom_bits=1 << 16
    )
    _write_docs(os.path.join(inp, "b1.json"), [(1, "alpha"), (2, "beta")])
    pipe.refresh()
    batch = spark.createDataFrame(
        [(1, "alpha", "en", "s"), (2, "beta", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    pipe._ingest_batch(batch, 0)
    assert _ids(pipe) == {1, 2}


def test_mis_sized_bloom_refuses_loudly(spark, tmp_path):
    import pytest

    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    pipe = CorpusIngestPipeline(
        spark, inp, wh, history_probe="bloom", bloom_bits=1 << 16
    )
    _write_docs(os.path.join(inp, "b1.json"), [(1, "alpha")])
    pipe.refresh()
    resized = CorpusIngestPipeline(
        spark, inp, wh, history_probe="bloom", bloom_bits=1 << 17
    )
    with pytest.raises(ValueError, match="bloom bitset"):
        resized._load_bloom()


# -- compaction --------------------------------------------------------------


def _full_rows(pipe):
    return sorted(
        (r["doc_id"], r["text"], r["fp"], r["batch_id"])
        for r in pipe.corpus().collect()
    )


def test_compact_preserves_rows_and_dedup(spark, tmp_path):
    """Compaction rewrites N batch dirs into one compact dir with rows —
    including original batch_id lineage — bit-identical, and the
    cross-batch dedup keeps working against the compacted history."""
    import glob

    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    pipe = CorpusIngestPipeline(spark, inp, wh)
    _write_docs(os.path.join(inp, "b1.json"), [(1, "alpha"), (2, "beta")])
    pipe.refresh()
    _write_docs(os.path.join(inp, "b2.json"), [(3, "gamma"), (4, "alpha")])
    pipe.refresh()
    _write_docs(os.path.join(inp, "b3.json"), [(5, "delta")])
    pipe.refresh()
    before = _full_rows(pipe)

    pipe.compact(target_partitions=2, keep_last=0)
    assert glob.glob(os.path.join(wh, "corpus", "batch_id=*")) == []
    assert len(glob.glob(os.path.join(wh, "corpus", "compact=*"))) == 1
    assert _full_rows(pipe) == before  # lineage batch_id preserved

    # dedup continues against compacted history; new novel doc lands
    _write_docs(os.path.join(inp, "b4.json"), [(6, "beta"), (7, "epsilon")])
    pipe.refresh()
    assert _ids(pipe) == {1, 2, 3, 5, 7}

    # second compact folds the compacted dir + the new batch dir into one
    pipe.compact(target_partitions=2, keep_last=0)
    assert len(glob.glob(os.path.join(wh, "corpus", "compact=*"))) == 1
    assert _ids(pipe) == {1, 2, 3, 5, 7}


def test_compact_replay_guard_survives(spark, tmp_path):
    """A micro-batch replayed AFTER its directory was compacted away must
    still exclude its own prior rows (batch_id filters the compacted
    data by value) — corpus unchanged."""
    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    pipe = CorpusIngestPipeline(spark, inp, wh)
    _write_docs(os.path.join(inp, "b1.json"), [(1, "alpha"), (2, "beta")])
    pipe.refresh()
    pipe.compact()
    batch = spark.createDataFrame(
        [(1, "alpha", "en", "s"), (2, "beta", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    pipe._ingest_batch(batch, 0)  # at-least-once replay of batch 0
    assert _ids(pipe) == {1, 2}


def test_compact_marker_hides_undeleted_sources(spark, tmp_path):
    """Crash window: a superseded dir still on disk (deletion didn't run)
    must stay invisible to reads, and the next compact() cleans it up."""
    import glob
    import shutil

    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    pipe = CorpusIngestPipeline(spark, inp, wh)
    _write_docs(os.path.join(inp, "b1.json"), [(1, "alpha"), (2, "beta")])
    pipe.refresh()
    _write_docs(os.path.join(inp, "b2.json"), [(3, "gamma")]);
    pipe.refresh()
    before = _full_rows(pipe)
    # preserve a source dir, compact, then "resurrect" it = the crash state
    src = os.path.join(wh, "corpus", "batch_id=0")
    saved = str(tmp_path / "saved")
    shutil.copytree(src, saved)
    pipe.compact(keep_last=0)
    shutil.copytree(saved, src)
    assert _full_rows(pipe) == before  # marker hides the stale dir
    pipe.compact(keep_last=0)  # cleanup pass
    assert not os.path.exists(src)
    assert _full_rows(pipe) == before


def test_compact_near_dedup_index_keeps_probing(spark, tmp_path):
    """near_dedup mode: the band index compacts alongside the corpus and
    the persisted-index probe still suppresses near-duplicates of
    compacted history."""
    import glob

    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    pipe = CorpusIngestPipeline(
        spark, inp, wh, near_dedup=True, jaccard_threshold=0.5
    )
    _write_docs(os.path.join(inp, "b1.json"), [(1, BASE), (2, OTHER)])
    pipe.refresh()
    _write_docs(os.path.join(inp, "b2.json"), [(4, NOVEL)])
    pipe.refresh()
    pipe.compact(keep_last=0)
    assert glob.glob(os.path.join(wh, "band_index", "batch_id=*")) == []
    assert len(glob.glob(os.path.join(wh, "band_index", "compact=*"))) == 1
    _write_docs(os.path.join(inp, "b3.json"), [(3, VAR), (5, NOVEL_VAR)])
    pipe.refresh()
    # 3 near-dups compacted doc 1, 5 near-dups compacted doc 4 — both
    # suppressed via the COMPACTED index
    assert _ids(pipe) == {1, 2, 4}
    assert _index_ids(pipe) == {1, 2, 4}


def test_trained_quality_model_gates_ingestion(spark, tmp_path):
    """A trained classifier (operators/quality_classifier.py) plugged
    into ingestion as the learned gate: below-threshold docs never reach
    the dedup machinery, and the gate composes with exact dedup (a
    duplicate GOOD doc is still suppressed)."""
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.quality_classifier import (
        hashed_features,
        train_quality_model,
    )

    good = "clean prose article reference cited edited"
    bad = "zzz spamspam clickbux w1nn3r freefree xoxo"
    train = spark.createDataFrame(
        [(i, good if i % 2 == 0 else bad, 1 - i % 2) for i in range(40)],
        "doc_id long, text string, label int",
    )
    feats = hashed_features(train, dim=64).join(
        train.select("doc_id", "label"), "doc_id"
    ).localCheckpoint(eager=True)
    w = train_quality_model(feats, "label", dim=64, epochs=20)

    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    pipe = CorpusIngestPipeline(
        spark, inp, wh, quality_model=w, quality_model_dim=64,
        quality_threshold=0.5,
    )
    _write_docs(
        os.path.join(inp, "b1.json"),
        [(1, good), (2, bad), (3, good + " extra"), (4, good)],  # 4 dups 1? no: same text as 1
    )
    pipe.refresh()
    # 2 rejected by the model; 4 passes the model but exact-dedups vs 1
    assert _ids(pipe) == {1, 3}

    # second refresh: model keeps gating, history dedup keeps suppressing
    _write_docs(
        os.path.join(inp, "b2.json"),
        [(5, bad + " more"), (6, good), (7, "clean cited article prose")],
    )
    pipe.refresh()
    assert _ids(pipe) == {1, 3, 7}


def test_decontamination_gates_ingestion(spark, tmp_path):
    """Held-out decontamination at ingest: docs sharing > max_hits
    distinct n-grams with the held-out set never land; overlap-free
    docs do; drops are visible in the log with their hit counts, and
    the gate's answer equals the batch ngram_decontamination operator's
    on the same data."""
    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    heldout = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "pack my box with five dozen liquor jugs")],
        "doc_id long, text string",
    )
    pipe = CorpusIngestPipeline(
        spark, inp, wh, decontam_docs=heldout, decontam_n=4,
        decontam_max_hits=0,
    )
    _write_docs(
        os.path.join(inp, "b1.json"),
        [
            # 1: verbatim leak of heldout 100 -> dropped
            (1, "the quick brown fox jumps over the lazy dog"),
            # 2: contains one 4-gram of heldout 101 -> dropped at max_hits=0
            (2, "we pack my box with care and tape"),
            # 3: clean -> lands
            (3, "completely unrelated sentence about spark pipelines"),
            # 4: shares words but no 4-gram run -> lands
            (4, "the quick red fox sat over a lazy cat"),
        ],
    )
    pipe.refresh()
    assert _ids(pipe) == {3, 4}
    log = {r["doc_id"]: r["n_shared_ngrams"] for r in pipe.decontamination_log().collect()}
    assert set(log) == {1, 2}
    assert log[1] == 6  # 9-word doc -> 6 distinct 4-grams, all held out
    assert log[2] == 1


def test_decontamination_max_hits_threshold(spark, tmp_path):
    """max_hits tolerates small incidental overlap: the same one-4-gram
    doc that max_hits=0 drops lands at max_hits=1, while the verbatim
    leak still never lands."""
    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    heldout = spark.createDataFrame(
        [(101, "pack my box with five dozen liquor jugs")],
        "doc_id long, text string",
    )
    pipe = CorpusIngestPipeline(
        spark, inp, wh, decontam_docs=heldout, decontam_n=4,
        decontam_max_hits=1,
    )
    _write_docs(
        os.path.join(inp, "b1.json"),
        [(1, "we pack my box with care and tape"),
         (2, "pack my box with five dozen liquor jugs")],
    )
    pipe.refresh()
    assert _ids(pipe) == {1}
    log = {r["doc_id"]: r["n_shared_ngrams"] for r in pipe.decontamination_log().collect()}
    assert log == {2: 5}


def test_decontamination_recovers_from_lost_cached_state(spark, tmp_path):
    """The cached held-out key frame lives in NON-RELIABLE
    localCheckpoint blocks (r12 advice): on a real cluster an executor
    loss invalidates them, and without recovery every later batch's
    exact-verify join fails until process restart. The gate must
    re-derive the state (a pure function of (docs, n)) and retry once.
    Simulated by swapping the cached frame for one that raises at
    execution time."""
    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    heldout = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    pipe = CorpusIngestPipeline(
        spark, inp, wh, decontam_docs=heldout, decontam_n=4,
        decontam_max_hits=0,
    )
    _write_docs(
        os.path.join(inp, "b1.json"),
        [(1, "the quick brown fox jumps over the lazy dog"),
         (3, "completely unrelated sentence about spark pipelines")],
    )
    pipe.refresh()
    assert _ids(pipe) == {3}
    assert pipe._decontam_state is not None
    # poison the cached state: a key frame that dies at execution (the
    # lost-block failure mode), paired with the still-valid broadcast
    _keys, bc = pipe._decontam_state
    broken = spark.range(1).select(
        F.raise_error(F.lit("BlockNotFound: localCheckpoint block lost"))
        .cast("string")
        .alias("g")
    )
    pipe._decontam_state = (broken, bc)
    # the next batch carries a leak, so the exact-verify join MUST
    # consult the keys — first attempt dies, the retry re-derives
    _write_docs(
        os.path.join(inp, "b2.json"),
        [(5, "over the lazy dog it jumps quick the brown fox jumps over the lazy dog"),
         (7, "clean follow-up doc about parquet compaction")],
    )
    pipe.refresh()
    assert _ids(pipe) == {3, 7}
    log = {r["doc_id"] for r in pipe.decontamination_log().collect()}
    assert log == {1, 5}
    # re-derivation replaced the poisoned state with a fresh pair
    assert pipe._decontam_state is not None
    assert pipe._decontam_state[0] is not broken
    # the end-of-life hook releases the cached state; next use re-derives
    pipe.close()
    assert pipe._decontam_state is None


def test_decontamination_replay_is_idempotent(spark, tmp_path):
    """A replayed batch rewrites its own decontam log dir and re-drops
    the same docs — corpus and log both unchanged."""
    heldout = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    pipe = CorpusIngestPipeline(
        spark, inp, wh, decontam_docs=heldout, decontam_n=4
    )
    _write_docs(
        os.path.join(inp, "b1.json"),
        [(1, "the quick brown fox jumps over the lazy dog"), (2, "clean doc here")],
    )
    pipe.refresh()
    corpus_before = sorted(tuple(r) for r in pipe.corpus().collect())
    log_before = sorted(tuple(r) for r in pipe.decontamination_log().collect())
    batch = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", "en", "s"),
         (2, "clean doc here", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    pipe._ingest_batch(batch, 0)
    assert sorted(tuple(r) for r in pipe.corpus().collect()) == corpus_before
    assert sorted(tuple(r) for r in pipe.decontamination_log().collect()) == log_before


def test_decontamination_composes_with_quality_and_dedup(spark, tmp_path):
    """Full canonical order on one batch: the rule gate drops junk
    BEFORE decontamination sees it (its n-grams never probe the bitset),
    the decontam gate drops leaks BEFORE dedup hashes them, and a clean
    near-verbatim variant still lands exactly once."""
    heldout = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    inp, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    pipe = CorpusIngestPipeline(
        spark, inp, wh, decontam_docs=heldout, decontam_n=4,
        quality_filter=True,
    )
    filler = (
        "and the pipeline keeps moving rows of data through the stages "
        "while each of the operators does its small part of the work "
        "and the results land in the tables that the readers expect "
        "to find when they query the warehouse at the end of the day"
    )
    clean = "a perfectly ordinary paragraph about data pipelines " + filler
    leak = "the quick brown fox jumps over the lazy dog " + filler
    _write_docs(
        os.path.join(inp, "b1.json"),
        [
            (1, "x" * 50),  # gopher-dropped junk (one giant word)
            (2, leak),  # passes gopher (50+ words), held-out run inside
            (3, clean),
            (4, clean),  # exact dup of 3 -> dedup keeps first only
        ],
    )
    pipe.refresh()
    assert _ids(pipe) == {3}
    log_ids = {r["doc_id"] for r in pipe.decontamination_log().collect()}
    assert 2 in log_ids and 1 not in log_ids  # junk never reached the gate
