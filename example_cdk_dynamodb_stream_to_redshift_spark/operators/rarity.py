"""Shingle rarity analysis: corpus document frequencies of word
n-grams, their spectrum, and a per-document uniqueness profile.

The dedup family answers "which documents repeat each other"
(minhash/simhash/winnowing) and the boilerplate family answers "which
SEGMENTS repeat within a source"; this module answers the inverse
diagnostic a curation pipeline reads before setting either family's
thresholds: how duplicated is the corpus at the n-gram level
(``docfreq_spectrum`` — the df histogram whose head is boilerplate and
whose tail is unique content), and how much of EACH document is its
own (``uniqueness_profile`` — the fraction of a doc's distinct
shingles found nowhere else; near-dups and template pages score low,
fresh content scores high). The per-doc profile is the standard
triage signal for ordering dedup candidates and for estimating how
much a corpus shrinks under span-level dedup (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better").

Scale shape (100 TB posture):
- ONE shingle pass per corpus scan (operators/dedup.shingle_rows — the
  codegen'd lead-window form), immediately reduced to ``(id, md5)``
  DISTINCT rows: every downstream shuffle carries 32-byte hashes,
  never text.
- document frequency is one groupBy over the hash — uniform 128-bit
  key, map-side partials; the hot-shingle skew lives in the JOIN back
  to doc rows, where AQE skew-join splits it (same posture as
  ngram_decontamination).
- the profile's two aggregations consume one shingle index built as
  canonically IDENTICAL subtrees (the NULL-id filter in
  ``_doc_shingles`` aligns them with the join's pushed predicate), so
  AQE reuses the tokenize/explode exchange at runtime — the corpus is
  scanned and split ONCE; only the cheap post-shuffle window + hash
  aggregations run per consumer. No manual caching, no checkpoint of
  a token-scale index.
- outputs are bounded: the spectrum by distinct df values, the profile
  by document count. Nothing collects.

Maintained form: streaming/rarity_maintenance.ShingleDocFreqStore —
per-batch (g, df, min-owner) partials plus per-doc totals, additive
under the batch-unique-docs contract, reproduce all three readers
over everything landed without rescanning text (equality pinned in
tests/test_rarity_maintenance.py under arbitrary slicings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, min_shingle_fingerprint
from .dedup import shingle_rows


def _doc_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """Distinct ``(id, g)`` — each document's shingle SET as md5 keys.

    The explicit NULL-id filter is load-bearing for the plan, not just
    the convention (a NULL id is not a countable document): the
    profile's totals branch gets ``isnotnull(id)`` pushed into it by
    its join anyway, and applying the SAME filter here keeps both
    consumers' subtrees canonically identical, so Spark reuses the
    tokenize/explode exchange instead of scanning the corpus twice
    (pinned in tests/test_rarity.py)."""
    return (
        shingle_rows(
            df.filter(F.col(id_col).isNotNull()), text_col, id_col, n
        )
        .select("id", F.md5("s").alias("g"))
        .distinct()
    )


def shingle_docfreq(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """``(g, df)`` — md5 of every distinct word-``n``-gram in the corpus
    with the number of DISTINCT documents containing it (set semantics:
    repeats inside one document count once, matching the boilerplate
    family's document-frequency convention)."""
    return _doc_shingles(df, text_col, id_col, n).groupBy("g").agg(
        F.count(F.lit(1)).alias("df")
    )


def docfreq_spectrum(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """``(df, n_shingles)`` ordered by ``df`` — how many distinct
    n-grams appear in exactly ``df`` documents. ``df = 1`` is the
    unique tail (the corpus's own content); the high-df head is
    boilerplate — the two ends this histogram exists to size before
    picking dedup/boilerplate thresholds. Output is bounded by the
    number of distinct df values (<= max df, heavily concentrated in
    practice); bucketing further is a projection the caller owns."""
    return (
        shingle_docfreq(df, text_col, id_col, n)
        .groupBy("df")
        .agg(F.count(F.lit(1)).alias("n_shingles"))
        .orderBy("df")
    )


def uniqueness_profile(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """Per-document uniqueness: ``(id, n_shingles, n_unique)`` where
    ``n_shingles`` counts the doc's DISTINCT word-n-grams and
    ``n_unique`` those appearing in NO other document (corpus df = 1).
    Documents shorter than ``n`` tokens have no shingles and report
    ``(0, 0)`` — every DISTINCT non-NULL document id gets exactly one
    row (ids are entities here, so input row multiplicity and NULL ids
    do not leak into the output — matching the maintained store's
    totals contract). Integer-only on purpose: the ratio
    ``n_unique / n_shingles`` is one projection away, and keeping the
    public frame exact keeps it oracle-stable."""
    sh = _doc_shingles(df, text_col, id_col, n)
    totals = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    # a df = 1 shingle has exactly ONE (id, g) row, so min(id) IS its
    # owning document — n_unique needs no join back onto the (skewed)
    # shingle key at all, just a second aggregation over the same
    # distinct index
    uniq = (
        sh.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"), F.min("id").alias("id"))
        .filter(F.col("df") == 1)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .filter(F.col("id").isNotNull())
        .distinct()
        .join(totals, "id", "left")
        .join(uniq, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
        )
    )


def source_overlap(
    df: DataFrame,
    text_col: str,
    group_col: str,
    shingle_n: int | None = None,
    max_sources: int | None = None,
) -> DataFrame:
    """Cross-source content overlap: ``(source_a, source_b, n_shared)``
    for every unordered source pair sharing at least one fingerprint —
    the acquisition-time question "how much of corpus B is already
    inside A", asked BEFORE paying for ingestion + dedup of B.

    ``shingle_n=None`` fingerprints whole documents
    (functions.text.fingerprint: md5 of lowercased trimmed text —
    exact-dup overlap, the corpus ingester's own key);
    ``shingle_n=k`` uses the min-shingle fingerprint (1-hash MinHash —
    a cheap near-dup-leaning overlap estimate with the same output
    shape). Counts are DISTINCT shared fingerprints, symmetric, with
    ``source_a < source_b``.

    Scale shape: one scan reduces the corpus to distinct
    (fingerprint, source) rows; pair generation happens INSIDE each
    fingerprint group via collect_set (bounded by the source count —
    dozens, never corpus-sized) and a self-product of that tiny array,
    so no corpus self-join ever materializes; the final count shuffles
    (source_a, source_b) pairs — at most sources^2 groups. NULL groups
    are excluded (an unattributed doc has no side in the question).

    That per-group array is the one unbounded surface: a high-cardinality
    ``group_col`` (e.g. a doc-level column passed by mistake) would make
    the per-fingerprint set — and its quadratic self-product — explode.
    ``max_sources`` is an OPT-IN cap on that set size, checked IN-PLAN:
    the check rides the same aggregation (stays lazy, costs no extra
    scan — the r11 review rejected an eager up-front validation pass)
    and any oversize set raises at execution, at exactly the point that
    would otherwise OOM an executor. The default is None — no cap —
    because a legitimate corpus can have one common fingerprint (e.g.
    boilerplate, or a hot min-shingle) genuinely spanning hundreds of
    real sources, and a default cap would turn that data shape into a
    RUNTIME failure. Set it (a comfortable multiple of your true source
    cardinality) when the group column comes from untrusted plumbing and
    a mis-passed doc-level column is the bigger risk; a set ride-along
    raise, not a silent truncation, is what fires if it trips."""
    if shingle_n is not None and shingle_n < 1:
        raise ValueError(
            f"shingle_n must be >= 1 (got {shingle_n}); n=0 would "
            "fingerprint every document to md5('') and report every "
            "source pair as overlapping"
        )
    if max_sources is not None and max_sources < 2:
        raise ValueError(f"max_sources must be >= 2 (got {max_sources})")
    fp = (
        fingerprint(text_col)
        if shingle_n is None
        else min_shingle_fingerprint(text_col, shingle_n)
    )
    pairs_per_fp = (
        df.filter(F.col(group_col).isNotNull())
        .select(fp.alias("fp"), F.col(group_col).cast("string").alias("g"))
        .filter(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.sort_array(F.collect_set("g")).alias("gs"))
        .filter(F.size("gs") >= 2)
    )
    if max_sources is not None:
        pairs_per_fp = pairs_per_fp.select(
            F.when(
                F.size("gs") > max_sources,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "source_overlap: a fingerprint is shared by "
                        ),
                        F.size("gs").cast("string"),
                        F.lit(
                            f" sources (> max_sources={max_sources}) — "
                            f"group column {group_col!r} looks "
                            "high-cardinality; its per-fingerprint "
                            "self-product is quadratic. Pass a true "
                            "source/corpus column or raise max_sources "
                            "deliberately."
                        ),
                    )
                ).cast("array<string>"),
            )
            .otherwise(F.col("gs"))
            .alias("gs")
        )
    return (
        pairs_per_fp.select(
            F.explode("gs").alias("source_a"), F.col("gs").alias("gs")
        )
        .select(
            "source_a",
            F.explode(
                F.filter("gs", lambda x: x > F.col("source_a"))
            ).alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .orderBy("source_a", "source_b")
    )
