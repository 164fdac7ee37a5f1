"""Deduplication operator family for training-data pipelines.

Scale design (the point of each variant):
- exact_dedup:      one hash-shuffle on a 32-byte fingerprint, then
                    min-per-group — the cheapest possible global dedup.
- ngram_jaccard:    exact near-dup via shingle inverted index. Cost is
                    bounded by the inverted-index join fan-out; fine for
                    verification and small corpora, quadratic in the worst
                    case — the LSH variant is the scale path.
- minhash_lsh:      shingle -> K minhashes -> B bands; only pairs sharing a
                    band key are candidates (join on band key, linear-ish),
                    then exact-Jaccard verification of candidates only.
- simhash:          64-bit signature per doc (Pandas UDF), near-dups =
                    signatures within Hamming distance d, found by the
                    pigeonhole block trick (d+1 blocks, equi-join per block).
- embedding cosine: see similarity.embedding_near_dup_pairs.

Everything except simhash is pure built-in DataFrame ops (codegen'd);
fingerprints use md5 so the DuckDB oracle can reproduce them byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Window

from ..functions.text import fingerprint, shingles, tokens


def shingle_rows(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, s) word-n-gram shingle ROWS (duplicates kept): explode the
    start-index sequence, stitch each n-gram with codegen'd
    ``concat_ws(slice(tokens, i+1, n))`` — ONE split per document, zero
    shuffle, whole plan inside one codegen stage.

    History of the three forms, all measured at sf0.1:
    - the one-expression HOF form (functions.text.shingles) re-evaluates
      its array subtrees inside the interpreted ``transform`` lambda —
      4-5× slower end-to-end, because higher-order lambdas never enter
      whole-stage codegen;
    - the posexplode + n-1 ``lead``-window form (r6-r12) fixed that but
      paid an Exchange + Sort of every (id, pos, token) row, keyed by
      doc id — at 100 TB that is the entire tokenized corpus crossing
      the network once per shingle pass;
    - this form (r13) keeps codegen (``slice``/``concat_ws`` are plain
      Catalyst expressions, not lambdas) and drops the window: explode
      duplicates only the start index, the token array is sliced in the
      same stage, and no exchange exists at all. 0.72s vs 0.92-1.20s on
      the 13-gram distinct-hash pipeline at sf0.1, identical output on
      every input (incl. empty tokens from repeated separators — slice
      keeps them and concat_ws preserves them, matching the oracle's
      ``l[i+1:i+n]`` list slicing; pinned by the multiset-equality and
      adversarial-spacing cases in tests/test_shingle_rows.py).

    Docs with < n tokens emit no rows (guarded sequence — an unguarded
    ``sequence(0, size-n)`` would DESCEND for short docs)."""
    if n < 1:
        raise ValueError(f"shingle n must be >= 1 (got {n})")
    tok_arr = tokens(text_col)
    if n == 1:  # 1-grams ARE the tokens: no index arithmetic needed
        return df.select(
            F.col(id_col).alias("id"), F.explode(tok_arr).alias("s")
        )
    idxs = F.when(
        F.size(tok_arr) >= n, F.sequence(F.lit(0), F.size(tok_arr) - n)
    ).otherwise(F.array().cast("array<int>"))
    return df.select(
        F.col(id_col).alias("id"),
        tok_arr.alias("_toks"),
        F.explode(idxs).alias("_i"),
    ).select(
        "id", F.concat_ws(" ", F.slice("_toks", F.col("_i") + 1, n)).alias("s")
    )


def distinct_shingle_sets(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, sh): the distinct shingle SET per document, as an array —
    shingle_rows + a collect_set aggregate (set semantics make the
    collection order irrelevant). Docs with < n tokens drop out."""
    return shingle_rows(df, text_col, id_col, n).groupBy("id").agg(
        F.collect_set("s").alias("sh")
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups: md5(normalized text) -> canonical (min) id +
    group size. Output: fp, canonical_id, n_dups."""
    return (
        df.select(fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def exact_dedup_keep_first(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The deduplicated corpus itself: keep the min-id row per fingerprint."""
    canon = exact_dedup(df, text_col, id_col).select(
        F.col("canonical_id").alias(id_col)
    )
    return df.join(canon, id_col, "left_semi")


def _shingle_index(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Inverted index: (shingle_md5, id, n_shingles) — distinct shingles."""
    sh = distinct_shingle_sets(df, text_col, id_col, n).withColumn(
        "n_sh", F.size("sh")
    )
    return sh.select("id", "n_sh", F.explode("sh").alias("s")).withColumn(
        "s", F.md5("s")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >= threshold).

    Plan: inverted index on shingle hash -> self-equi-join on shingle (the
    shuffle key is the 32-char hash: uniformly distributed, no skew) ->
    count shared shingles per pair -> |A ∪ B| = |A| + |B| - shared.
    """
    idx = _shingle_index(df, text_col, id_col, n)
    a = idx.select(
        F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), F.col("s")
    )
    b = idx.select(
        F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), F.col("s")
    )
    pairs = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jaccard = F.col("shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("shared")
    ).cast("double")
    return (
        pairs.withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document: hash lane k is the min over shingles
    of an 8-hex-char WORD of md5 — lane k reads chars [8·(k%4), 8·(k%4)+8)
    of md5(f"{k//4}|" + shingle), so K lanes cost only ceil(K/4) md5
    invocations per shingle (md5 yields 128 bits = four independent 32-bit
    words; one md5 per lane would be 4× the hash work for no recall gain).
    The md5 family keeps the DuckDB oracle bit-reproducible; at production
    scale you'd swap in xxhash64(shingle, seed_k) — same plan shape.

    Implementation note: shingles are EXPLODED once and the K minhashes are
    grouped ``min`` aggregates. The tempting all-in-one expression
    (K × array_min(transform(shingle_expr, md5))) re-evaluates the shingle
    construction (itself O(tokens) per element) inside every hash lane:
    O(K·n²) string work per document, measured 10× slower end-to-end. The
    explode adds one narrow shuffle on the doc id (map-side partial min) —
    the right trade at any scale. Docs with < shingle_n tokens have no
    shingles and drop out of the signature (no shingle set for Jaccard
    anyway). Shingle construction goes through shingle_rows (posexplode +
    lead, one split per doc); duplicates are NOT removed first — min over
    duplicates equals min over the distinct set, so the dedup shuffle
    would be pure waste."""
    ex = shingle_rows(df, text_col, id_col, shingle_n)
    n_md5 = -(-num_hashes // 4)
    # md5s materialize in a projection BEFORE the aggregate: column refs in
    # the min() children guarantee one md5 evaluation per row per j, with no
    # reliance on codegen subexpression elimination across aggregate lanes
    hashed = ex.select(
        "id",
        *[
            F.md5(F.concat(F.lit(f"{j}|"), F.col("s"))).alias(f"_m{j}")
            for j in range(n_md5)
        ],
    )
    mins = [
        F.min(
            F.substring(F.col(f"_m{k // 4}"), (k % 4) * 8 + 1, 8)
        ).alias(f"_h{k}")
        for k in range(num_hashes)
    ]
    return (
        hashed.groupBy("id")
        .agg(*mins)
        .select(
            "id",
            F.array(*[F.col(f"_h{k}") for k in range(num_hashes)]).alias("sig"),
        )
    )


def minhash_band_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band, key) LSH band-index rows — the PERSISTABLE form of the
    MinHash index. One row per (doc, band); ``key`` is the md5 of the
    band's signature slice, so equality on (band, key) is the LSH
    candidate test.

    This is the table a 100 TB corpus stores once (parquet partitioned by
    ``band``, sorted/bucketed by ``key``) and every incremental crawl
    batch probes: the batch computes signatures for ITS docs only and
    equi-joins the stored index — the corpus is never re-shingled
    (see incremental_near_dup_pairs)."""
    rows = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.md5(
                F.concat_ws("|", *[F.col("sig")[bi * rows + r] for r in range(rows)])
            ).alias("key"),
        )
        for bi in range(bands)
    ]
    return sigs.select(
        "id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def minhash_lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    band_index: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: split the K-hash signature into B bands of K/B rows;
    docs sharing any band key are candidate pairs.

    The only shuffle is the equi-join on (band_idx, band_key) — a uniform
    md5-derived key, so no skew; candidate count is tunable via (K, B).
    Output: id_a < id_b, distinct.

    ``band_index``: a PREBUILT (id, band, key) table for ``df`` (from
    minhash_band_index — typically the persisted/materialized corpus
    index, so the corpus is not re-shingled when several dedup jobs in
    one session consume the same index). When given, the hashing
    parameters are ignored; the caller owns index/params consistency.
    """
    banded = (
        band_index
        if band_index is not None
        else minhash_band_index(df, text_col, id_col, num_hashes, bands, shingle_n)
    )
    # Bucket-grouped pair enumeration instead of a banded self-join: the
    # signature pipeline is evaluated ONCE (a self-join would recompute it
    # for each side), and pairs are enumerated inside each (band, key)
    # bucket — whose size LSH keeps small by construction. The pathological
    # all-identical corpus degenerates to one big bucket either way.
    buckets = (
        banded.groupBy("band", "key")
        .agg(F.array_sort(F.collect_set("id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice("ids", i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def minhash_lsh_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.2,
    band_index: DataFrame | None = None,
) -> DataFrame:
    """Full MinHash+LSH near-dup: LSH candidates, then exact Jaccard
    verification of the CANDIDATES ONLY (the standard scale recipe — the
    all-pairs shingle join is never materialized). ``band_index``
    optionally supplies the prebuilt (id, band, key) corpus index (see
    minhash_lsh_candidate_pairs).

    The verification shingle sets are built ONLY for docs appearing in
    some candidate pair: a broadcast semi-join prunes the corpus BEFORE
    the explode/collect_set chain (the same candidates-only discipline
    as incremental_near_dup_pairs), so the corpus is shingled once for
    signatures and the verify pass touches the (vanishing) candidate
    subset instead of re-shingling everything for each join side —
    measured 5.3s -> ~2s on the sf0.1 pair generation. Candidates have
    three consumers (the two id-extraction branches + the verify join);
    they share ONE computation fully lazily (r14): each consumer
    references the same DataFrame, whose plan ends in the distinct's
    hashpartitioning(id_a, id_b) exchange — the three exchanges
    canonicalize equal, so at runtime AQE executes one and the other two
    are ReusedExchange. (The r10-r13 form ran localCheckpoint(eager=True)
    here, which executed the whole LSH subtree at spark_fn-construction
    time — build-time work the caller's action never saw; converting it
    to the reuse idiom keeps candidate generation inside the timed
    action, per the r13 honest-lazy finding.)"""
    cands = minhash_lsh_candidate_pairs(
        df, text_col, id_col, num_hashes, bands, shingle_n, band_index
    )
    cand_ids = (
        cands.select(F.col("id_a").alias("id"))
        .union(cands.select(F.col("id_b").alias("id")))
        .distinct()
    )
    touched = df.join(
        F.broadcast(cand_ids.select(F.col("id").alias(id_col))), id_col, "left_semi"
    )
    # SHUFFLE_HASH pin (the winnowing_overlap_pairs idiom): the verify
    # join consumes `sets` TWICE (id_a and id_b sides). Left unhinted the
    # planner broadcasts the sets side per join, and the two
    # BroadcastExchanges hash different keys — no reuse, so the executed
    # plan re-ran the candidate-doc scan + shingle collect_set once per
    # side. Hinting shuffle_hash keys both sides on the SAME
    # hashpartitioning(id) exchange; the second side is a ReusedExchange
    # at runtime, so each touched doc is shingled exactly once, inside
    # the query's own action (fully lazy — a localCheckpoint here would
    # run the shingle stages at build time under AQE, outside the
    # caller's timed action). At corpus scale broadcasting per-doc
    # shingle SETS was never viable anyway — the shuffle join IS the
    # scale plan.
    sets = distinct_shingle_sets(touched, text_col, id_col, shingle_n)
    sets_a = sets.select(
        F.col("id").alias("id_a"), F.col("sh").alias("sh_a")
    ).hint("shuffle_hash")
    sets_b = sets.select(
        F.col("id").alias("id_b"), F.col("sh").alias("sh_b")
    ).hint("shuffle_hash")
    pairs = (
        cands.join(sets_a, "id_a")
        .join(sets_b, "id_b")
        .withColumn("shared", F.size(F.array_intersect("sh_a", "sh_b")))
    )
    jaccard = F.col("shared").cast("double") / (
        F.size("sh_a") + F.size("sh_b") - F.col("shared")
    ).cast("double")
    return (
        pairs.withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


def incremental_near_dup_pairs(
    corpus_index: DataFrame,
    corpus_df: DataFrame,
    batch_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.2,
    batch_index: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dedup of a NEW batch against an EXISTING corpus's
    persisted MinHash band index — the steady-state shape of corpus
    collection at 100 TB, where the historical corpus must never be
    re-shingled just because a new crawl arrived.

    ``batch_index``: optionally the batch's PREBUILT (id, band, key) rows
    (e.g. a slice of an already-materialized whole-corpus index); when
    given, batch signature hashing is skipped and the hashing parameters
    are ignored.

    ``corpus_index`` is a (id, band, key) table from minhash_band_index —
    normally read back from parquet partitioned by ``band`` (see
    tests/test_incremental_dedup.py for the persisted round-trip). Only
    the BATCH is signature-hashed here (O(|batch|) hash work); candidates
    come from the (band, key) equi-join against the stored index, and
    exact-Jaccard verification re-reads text for the candidate CORPUS
    docs only (left-semi pushdown on the candidate id set) plus the
    batch. At scale: the index join shuffles |batch_index| + the touched
    index partitions; corpus text I/O is candidates-only.

    Output: (batch_id, corpus_id, jaccard) for verified pairs, the rows a
    collector uses to drop/flag near-dup batch docs before appending.
    Reference tie-in: the CDC staging anti-join (operators/merge.py,
    sql/incremental_sync_members.sql:38-52) re-keyed from row identity to
    near-identity.
    """
    if batch_index is None:
        batch_index = minhash_band_index(
            batch_df, text_col, id_col, num_hashes, bands, shingle_n
        )
    cand = (
        batch_index.select(F.col("id").alias("batch_id"), "band", "key")
        .join(corpus_index.select(F.col("id").alias("corpus_id"), "band", "key"),
              ["band", "key"])
        .select("batch_id", "corpus_id")
        .distinct()
        # the candidate set is consumed twice (the touched-corpus prune and
        # the verification join); without truncation the WHOLE
        # index-join subtree — including the batch signature hashing —
        # re-evaluates for each consumer. Candidates are the small
        # post-LSH set, so materializing them is cheap at any scale.
        .localCheckpoint(eager=True)
    )
    # Shingle-set construction only for touched corpus docs: the semi-join
    # prunes before the expensive posexplode/collect_set chain. BROADCAST
    # pinned (r13): localCheckpoint strips the statistics Catalyst would
    # size the build side with, so the planner fell back to a SortMergeJoin
    # that shuffled the CORPUS TEXT by doc_id — the exact shuffle this
    # incremental path exists to avoid. The candidate id set is the small
    # post-LSH frame by construction, so the hint is always safe.
    touched = cand.select(F.col("corpus_id").alias(id_col)).distinct()
    corpus_sets = distinct_shingle_sets(
        corpus_df.join(F.broadcast(touched), id_col, "left_semi"),
        text_col,
        id_col,
        shingle_n,
    )
    batch_sets = distinct_shingle_sets(batch_df, text_col, id_col, shingle_n)
    pairs = (
        cand.join(
            batch_sets.select(F.col("id").alias("batch_id"), F.col("sh").alias("sh_a")),
            "batch_id",
        )
        .join(
            corpus_sets.select(
                F.col("id").alias("corpus_id"), F.col("sh").alias("sh_b")
            ),
            "corpus_id",
        )
        .withColumn("shared", F.size(F.array_intersect("sh_a", "sh_b")))
    )
    jaccard = F.col("shared").cast("double") / (
        F.size("sh_a") + F.size("sh_b") - F.col("shared")
    ).cast("double")
    return (
        pairs.withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("batch_id", "corpus_id", "jaccard")
    )


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 10,
) -> DataFrame:
    """C4-style repeated-span removal (Raffel et al. 2020 §2.2 adapted to
    word spans): partition each document into non-overlapping
    ``span_words``-word spans; any span whose exact text occurs elsewhere
    in the corpus survives only at its globally-first occurrence
    (ordered by (doc_id, span_idx)); surviving spans reassemble in order.

    Plan: one split + posexplode per doc -> global first-occurrence per
    span hash tagged in-stream (min over the hash window of the
    (doc_id, span_idx) STRUCT — structs order lexicographically, so this
    is exact for ANY orderable id type: strings, negatives, uuids; no
    arithmetic encoding, no aggregate joined back) -> per-doc ordered
    reassembly
    (collect_list of (idx, span) structs, array_sort, array_join). Two
    shuffles, both on uniform keys (md5 span hash for the window, doc id
    for the reassembly); per-doc totals ride the exploded rows as a
    grouping key, so there is no totals branch and no join.
    The reassembly array holds one document's SURVIVING spans — a task
    must see a whole doc to rebuild it, same bound as any per-doc
    aggregation; no corpus-wide array ever materializes.

    Output: (doc_id, n_spans, n_spans_kept, clean_text); docs whose every
    span occurred earlier come back with clean_text = ''.
    """
    n = span_words
    toks = F.split(F.col(text_col), " ")
    spans_expr = F.expr(
        f"transform(sequence(0, cast(ceil(size(_l) / {n}.0) as int) - 1), "
        f"i -> array_join(slice(_l, i * {n} + 1, {n}), ' '))"
    )
    base = df.select(F.col(id_col).alias("id"), toks.alias("_l")).select(
        "id", spans_expr.alias("_spans")
    )
    # ONE corpus pass (r13): n_spans used to come from a separate
    # `totals` branch LEFT-joined back at the end — a second scan + span
    # construction of every document. Since split() yields >= 1 token
    # for any non-NULL text, every doc has >= 1 span, so the per-doc
    # count can RIDE the exploded rows as a grouping key instead;
    # posexplode_outer keeps NULL-text docs (NULL span array) as one
    # NULL-span placeholder row, preserving the old join's n_spans=NULL
    # row for them. The survivor guard and the null-skipping collect_list
    # reproduce the old coalesce-to-''/0 semantics for docs whose every
    # span occurred earlier. (Like the old two-branch form, ids are
    # assumed unique per row — the corpus contract.)
    sp = base.select(
        "id",
        F.size("_spans").cast("bigint").alias("n_spans"),
        F.posexplode_outer("_spans").alias("span_idx", "span"),
    ).withColumn("h", F.md5(F.col("span").cast("binary")))
    # globally-first occurrence per span hash, tagged IN-STREAM:
    # min(struct(id, span_idx)) over the hash window marks survivors in
    # the same pass that built them — no min-aggregate joined back, so
    # the span explode runs once (a hash shared by f spans streams
    # through one window group with O(1) min state). Struct min orders
    # lexicographically, so ids of any orderable type (strings, negatives,
    # uuids) are handled exactly — no arithmetic encoding that a
    # string id would silently NULL out.
    pos = F.struct("id", "span_idx")
    survivor = (pos == F.col("first_pos")) & F.col("span_idx").isNotNull()
    return (
        sp.withColumn("first_pos", F.min(pos).over(Window.partitionBy("h")))
        .groupBy("id", "n_spans")
        .agg(
            F.count(F.when(survivor, 1)).cast("bigint").alias("n_spans_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(survivor, F.struct("span_idx", "span"))
                        )
                    ),
                    lambda x: x["span"],
                ),
                " ",
            ).alias("clean_text"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_spans",
            "n_spans_kept",
            "clean_text",
        )
    )
