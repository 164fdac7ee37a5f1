"""Training-data-pipeline operator inventory: dedup, similarity search,
text analysis, multimodal plumbing — each driver-checkable against a DuckDB
oracle (or declared rows-only where genuinely non-SQL, e.g. Pandas-UDF
simhash and multi-probe LSH).

Oracle determinism strategy (validated empirically in tests/oracle.py):
- all text primitives are string/int ops -> bitwise identical.
- cosine goes through int64 quantization (operators.similarity.cosine_q6):
  float folds differ between engines in the last ulp; integer dots don't.
- hash family is md5 everywhere (same bytes -> same hex in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import bpe as BPE
from ..operators import dedup as DD
from ..operators import multimodal as MM
from ..operators import pq as PQ
from ..operators import similarity as SIM
from ..operators.simhash import simhash_near_dup_pairs
from ..sources.tables import load_table
from .inventory import register

_STOP_SQL = TX.STOP_SQL  # shared IN-list fragment (functions/text.py)
_SHINGLE_SQL = (
    "list_distinct(list_transform(range(0, len(string_split(text,' ')) - 2), "
    "i -> md5(array_to_string(list_slice(string_split(text,' '), i+1, i+3), ' '))))"
)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------
@register(
    "doc_text_stats",
    f"""
    SELECT doc_id,
      len(string_split(text, ' ')) AS n_tokens,
      len(regexp_extract_all(text, '{TX.TOKEN_PATTERN}')) AS n_tokens_bpe,
      len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_SQL}))) AS n_stop,
      CAST(len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_SQL}))) AS DOUBLE)
        / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
      CAST(length(replace(text, ' ', '')) AS DOUBLE)
        / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len,
      len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct
    FROM documents ORDER BY doc_id
    """,
    "Text analysis: whitespace + BPE-ish regex token counting, stopword "
    "ratio, average token length, punctuation count — per-row projections, "
    "no shuffle, all JVM-side.",
)
def doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.bpe_ish_token_count("text").alias("n_tokens_bpe"),
        TX.stopword_count("text").alias("n_stop"),
        TX.stopword_ratio("text").alias("stop_ratio"),
        TX.avg_token_length("text").alias("avg_token_len"),
        TX.punct_count("text").alias("n_punct"),
    ).orderBy("doc_id")


# shared by doc_quality_scores and top_docs_per_source (same scoring chain)
_QUALITY_CTE = f"""
    WITH t AS (
      SELECT doc_id, source,
        CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
        CAST(len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_SQL}))) AS DOUBLE)
          / CAST(len(string_split(text, ' ')) AS DOUBLE) AS sr,
        CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) AS pc
      FROM documents),
    scored AS (
      SELECT doc_id, source,
        least(n / 100.0, 1.0) * 0.4
        + greatest(1.0 - abs(sr - 0.04) * 5.0, 0.0) * 0.4
        + (1.0 - least(pc / n, 1.0)) * 0.2 AS quality
      FROM t)
"""


@register(
    "doc_quality_scores",
    _QUALITY_CTE
    + """
    SELECT doc_id, quality FROM scored ORDER BY doc_id
    """,
    "Quality scoring: length/stopword/punctuation heuristic in [0,1] "
    "(fixed-weight IEEE double chain — deterministic cross-engine).",
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", TX.quality_score("text").alias("quality")
    ).orderBy("doc_id")


@register(
    "top_docs_per_source",
    _QUALITY_CTE
    + """
    SELECT source, doc_id, quality, rank FROM (
      SELECT source, doc_id, quality,
             row_number() OVER (
               PARTITION BY source ORDER BY quality DESC, doc_id) AS rank
      FROM scored) w
    WHERE rank <= 10 ORDER BY source, rank
    """,
    "Per-key top-N (per-source quality cap) via the salted two-phase "
    "operator (operators/topn.py): phase 1 keeps each (key, salt)-bucket's "
    "local top-n under a bounded window, phase 2 ranks the <= salt_buckets*n "
    "survivors — exact row_number semantics (this oracle IS the single "
    "window form) but hot-key-proof: no single task ever sorts a whole "
    "skewed group. The per-group generalization of the reference's "
    "ORDER BY .. LIMIT monitors (sql/queries.sql:8,19).",
)
def top_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.topn import top_n_per_key

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "source", "doc_id", TX.quality_score("text").alias("quality")
    )
    return top_n_per_key(
        scored,
        ["source"],
        [F.desc("quality"), F.asc("doc_id")],
        n=10,
        unique_key="doc_id",
    ).orderBy("source", "rank")


def _lang_score_sql(lang: str) -> str:
    markers = "'" + "','".join(TX.LANG_MARKERS[lang]) + "'"
    return f"len(list_filter(string_split(text, ' '), x -> x IN ({markers})))"


@register(
    "doc_lang_id",
    f"""
    WITH s AS (
      SELECT doc_id,
        {_lang_score_sql('en')} AS s_en, {_lang_score_sql('de')} AS s_de,
        {_lang_score_sql('fr')} AS s_fr, {_lang_score_sql('es')} AS s_es,
        {_lang_score_sql('zh')} AS s_zh
      FROM documents)
    SELECT doc_id,
      CASE
        WHEN s_en > 0 AND s_en >= greatest(s_de, s_fr, s_es, s_zh) THEN 'en'
        WHEN s_de > 0 AND s_de >= greatest(s_fr, s_es, s_zh) THEN 'de'
        WHEN s_fr > 0 AND s_fr >= greatest(s_es, s_zh) THEN 'fr'
        WHEN s_es > 0 AND s_es >= s_zh THEN 'es'
        WHEN s_zh > 0 THEN 'zh'
        ELSE 'und'
      END AS pred_lang
    FROM s ORDER BY doc_id
    """,
    "Language-ID heuristic: marker-word profile scoring, argmax with "
    "deterministic tie precedence.",
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", TX.lang_id("text").alias("pred_lang")
    ).orderBy("doc_id")


_WINNOW_W = 4  # winnowing window over consecutive 3-gram hashes


def _winnowing_index(docs: DataFrame) -> DataFrame:
    """Unordered (doc_id, fp) winnowing index — the join input; the
    driver-facing fingerprint query adds the presentation sort."""
    toks = TX.tokens("text")
    n_sh = F.greatest(F.size(toks) - 2, F.lit(0))
    sh = F.transform(
        F.sequence(F.lit(0), n_sh - 1),
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(toks, i + 1, 3)).cast("binary")
        ),
    )
    with_sh = docs.select("doc_id", sh.alias("sh")).filter(F.size("sh") > 0)
    wins = F.transform(
        F.sequence(
            F.lit(0), F.greatest(F.size(F.col("sh")) - _WINNOW_W, F.lit(0))
        ),
        lambda j: F.array_min(F.slice(F.col("sh"), j + 1, _WINNOW_W)),
    )
    return with_sh.select(
        "doc_id",
        F.explode(F.array_sort(F.array_distinct(wins))).alias("fp"),
    )


@register(
    "doc_winnowing_fingerprints",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    s AS (SELECT doc_id,
                 list_transform(range(0, greatest(len(l) - 2, 0)),
                   i -> md5(array_to_string(list_slice(l, i + 1, i + 3), ' ')))
                   AS sh
          FROM t),
    w AS (SELECT doc_id,
                 list_transform(range(0, greatest(len(sh) - {_WINNOW_W - 1}, 1)),
                   j -> list_min(list_slice(sh, j + 1, j + {_WINNOW_W}))) AS wins
          FROM s WHERE len(sh) > 0)
    SELECT doc_id, unnest(list_sort(list_distinct(wins))) AS fp
    FROM w ORDER BY doc_id, fp
    """,
    "Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the MOSS "
    f"algorithm): per {_WINNOW_W}-window of consecutive 3-gram hashes keep "
    "the minimum — guarantees any shared run of >= w+k-1 tokens shares a "
    "fingerprint, at ~2/(w+1) the density of full shingling. Entirely "
    "per-row higher-order array expressions (codegen, no shuffle, no UDF); "
    "the fingerprint set is the join key for MOSS-style overlap detection "
    "at a fraction of the inverted-index volume.",
)
def doc_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return _winnowing_index(docs).orderBy("doc_id", "fp")


# shared winnowing CTE body (through `w`), reused by the pairs query
_WINNOW_CTE = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    s AS (SELECT doc_id,
                 list_transform(range(0, greatest(len(l) - 2, 0)),
                   i -> md5(array_to_string(list_slice(l, i + 1, i + 3), ' ')))
                   AS sh
          FROM t),
    w AS (SELECT doc_id,
                 list_sort(list_distinct(
                   list_transform(range(0, greatest(len(sh) - {_WINNOW_W - 1}, 1)),
                     j -> list_min(list_slice(sh, j + 1, j + {_WINNOW_W})))))
                   AS fps
          FROM s WHERE len(sh) > 0)
"""


# Stop-fingerprint cap (MOSS's own over-common-hash drop): a fingerprint
# shared by f docs yields f^2 candidate rows in ONE join key, and — unlike a
# MinHash band bucket, where a hot bucket approximates a true near-dup
# cluster — one shared 3-gram window is weak evidence, so boilerplate
# (license headers, templates) creates pathological skew on real corpora.
# Fingerprints with document frequency > this cap are dropped BEFORE the
# self-join, bounding any join key's fan-out to _WINNOW_MAX_DF^2.
_WINNOW_MAX_DF = 10


def winnowing_pairs_from_index(idx: DataFrame, max_df: int = _WINNOW_MAX_DF,
                               min_shared: int = 3) -> DataFrame:
    """Overlap pairs from a (doc_id, fp) winnowing index with the stop-fp
    cap applied as a COUNT WINDOW over the same fp partitioning the
    self-join needs: the index shuffles on fp exactly once, the window
    filter drops hot fingerprints in-stream, and the second join side is an
    identical subplan so Spark reuses the exchange (ReusedExchange —
    measured: the cap costs ~nothing over the uncapped join, vs ~2x for a
    separate df-count aggregate + anti-join, which shuffles the index
    twice more). Skew posture: a boilerplate fingerprint's f rows land in
    one window group — a LINEAR, spill-able pass (the rows are then
    dropped), never the f^2 join fan-out the cap exists to prevent."""
    from pyspark.sql import Window

    w = Window.partitionBy("fp")
    kept = (
        idx.withColumn("_df", F.count(F.lit(1)).over(w))
        .filter(F.col("_df") <= max_df)
        .drop("_df")
    )
    a = kept.select(F.col("doc_id").alias("id_a"), "fp")
    b = kept.select(F.col("doc_id").alias("id_b"), "fp")
    # SHUFFLE_HASH pin (r13): left unhinted, the planner broadcasts one
    # side of the self-join (the index estimates under the broadcast
    # threshold at bench SF), which severs the exchange-reuse this
    # function's design depends on — the executed plan rebuilt the whole
    # scan -> shingle -> window subtree once per side. Pinning a shuffle
    # join keys both sides on the SAME hashpartitioning(fp) exchange the
    # cap window already established, so the shingle pipeline runs once
    # and the second side is a ReusedExchange (asserted in the committed
    # after-plan). At 100 TB broadcasting a corpus fingerprint index was
    # never viable anyway — the shuffle join IS the scale plan; hash
    # (not merge) because the equi-key probe needs no sort and AQE skew
    # handling still applies.
    return (
        a.join(b.hint("shuffle_hash"), "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


@register(
    "winnowing_overlap_pairs",
    _WINNOW_CTE
    + f"""
    , idx AS (SELECT doc_id, unnest(fps) AS fp FROM w)
    , keep AS (SELECT fp FROM idx GROUP BY fp HAVING COUNT(*) <= {_WINNOW_MAX_DF})
    , k AS (SELECT doc_id, fp FROM idx JOIN keep USING (fp))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fps
    FROM k a JOIN k b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING COUNT(*) >= 3
    ORDER BY id_a, id_b
    """,
    "MOSS-style overlap detection end-to-end: the winnowed fingerprint "
    "sets self-join on fp (inverted-index equi-join — candidates only, "
    "never all-pairs) and pairs sharing >= 3 fingerprints surface. "
    f"Fingerprints appearing in > {_WINNOW_MAX_DF} docs are dropped before "
    "the join (MOSS's over-common-hash drop, restated in the oracle): a "
    "boilerplate fingerprint would otherwise fan out f^2 rows under one "
    "join key. Same plan family as ngram_jaccard_pairs but the joined "
    "index is ~2/(w+1) the size, which at 100 TB is the difference "
    "between shuffling 40% and 100% of the shingle volume for the same "
    "shared-run guarantee.",
)
def winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    idx = _winnowing_index(docs)
    return winnowing_pairs_from_index(idx).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Exact substring-run duplication (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better": remove long token runs that repeat
# across the corpus). Window-hash inverted index — the distributed stand-in
# for their suffix array: a shared >= N-token run implies a shared window.
# ---------------------------------------------------------------------------
_SUBSTR_N = 20  # token-window length flagged as a duplicated run


@register(
    "substring_dup_stats",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    w AS (SELECT doc_id,
                 unnest(list_transform(range(0, greatest(len(l) - {_SUBSTR_N - 1}, 0)),
                   i -> md5(array_to_string(list_slice(l, i + 1, i + {_SUBSTR_N}), ' '))))
                   AS h
          FROM t),
    hot AS (SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    tot AS (SELECT doc_id, COUNT(*) AS n_windows FROM w GROUP BY doc_id),
    dup AS (SELECT doc_id, COUNT(*) AS n_dup_windows
            FROM w JOIN hot USING (h) GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(tot.n_windows, 0) AS n_windows,
           COALESCE(dup.n_dup_windows, 0) AS n_dup_windows,
           CASE WHEN COALESCE(tot.n_windows, 0) > 0
                THEN CAST(COALESCE(dup.n_dup_windows, 0) AS DOUBLE)
                     / CAST(tot.n_windows AS DOUBLE)
                ELSE 0.0 END AS dup_fraction
    FROM documents d
    LEFT JOIN tot ON d.doc_id = tot.doc_id
    LEFT JOIN dup ON d.doc_id = dup.doc_id
    ORDER BY d.doc_id
    """,
    f"Exact substring-run duplication stats (Lee et al. 2022 EXACTSUBSTR, "
    f"distributed form): every {_SUBSTR_N}-token window hashes into an "
    "inverted index (shingle_rows: explode + slice/concat_ws, pure "
    "codegen, zero shuffle); windows whose hash appears in >= 2 DISTINCT docs are "
    "cross-doc duplicated runs, tagged IN-STREAM (min(id) != max(id) over "
    "the hash window — O(1) state per group) and counted per doc in one "
    "conditional aggregation: a single pass over the shingles. "
    "All shuffles key on uniform md5/doc_id; no arrays ever hold a whole "
    "doc's windows, so arbitrarily long docs stream. The per-doc "
    "dup_fraction is the signal a pipeline thresholds to strip "
    "boilerplate-heavy documents (int/int double division — exact in "
    "both engines).",
)
def substring_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = DD.shingle_rows(docs, "text", "doc_id", _SUBSTR_N).select(
        "id", F.md5(F.col("s").cast("binary")).alias("h")
    )
    # hot-ness ("this window hash appears in >= 2 DISTINCT docs") is
    # exactly min(id) != max(id) over the hash partition — two streaming
    # window aggregates tag every shingle row IN-STREAM, so the whole
    # query is ONE pass over the shingles (one h-shuffle, one id-shuffle):
    # no hot-set aggregate, no join back, no second evaluation of the
    # expensive shingle construction (the old two-branch form re-ran it —
    # the branches' exchanges differ post-aggregation, so AQE can't
    # stitch them). A boilerplate hash's f rows stream through one window
    # group linearly; min/max state is O(1), unlike a collect_set.
    wh = Window.partitionBy("h")
    counts = (
        sh.withColumn(
            "hot", F.min("id").over(wh) != F.max("id").over(wh)
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("hot"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_windows"),
        )
    )
    zero = F.lit(0).cast("bigint")
    return (
        docs.select("doc_id")
        .join(counts, F.col("doc_id") == counts["id"], "left")
        .drop(counts["id"])
        .select(
            "doc_id",
            F.coalesce("n_windows", zero).alias("n_windows"),
            F.coalesce("n_dup_windows", zero).alias("n_dup_windows"),
        )
        .withColumn(
            "dup_fraction",
            F.when(
                F.col("n_windows") > 0,
                F.col("n_dup_windows").cast("double")
                / F.col("n_windows").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# BPE merge induction, step one: the corpus-wide adjacent character-pair
# frequency scan that picks the first merge (Sennrich et al. 2016). The full
# algorithm iterates merge->rescan; each iteration is exactly this plan over
# re-tokenized symbols, so driver-proving one scan proves the building block.
# ---------------------------------------------------------------------------
@register(
    "bpe_pair_candidates",
    """
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
    p AS (SELECT unnest(list_transform(range(1, len(t)), i -> substr(t, i, 2)))
            AS pair
          FROM tok WHERE len(t) >= 2)
    SELECT pair, COUNT(*) AS n
    FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 25
    """,
    "BPE vocabulary induction, first merge scan (Sennrich 2016): explode "
    "tokens to adjacent character pairs, count corpus-wide, top-25 with a "
    "deterministic tie-break. Map-side explodes feed ONE aggregation "
    "shuffle whose key space is bounded (|charset|^2, thousands of keys "
    "regardless of corpus size — partial aggregation collapses almost "
    "everything map-side), then TakeOrderedAndProject. The iterate-merge "
    "loop of real BPE is this same plan re-run over re-paired symbols.",
)
def bpe_pair_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(TX.tokens("text")).alias("t")).filter(
        F.length("t") >= 2
    )
    pairs = tok.select(
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(25)
    )


@register(
    "doc_fingerprints",
    """
    SELECT doc_id,
      md5(lower(trim(text))) AS fp,
      list_min(list_transform(range(0, len(string_split(text,' ')) - 2),
        i -> md5(array_to_string(list_slice(string_split(text,' '), i+1, i+3), ' ')))) AS min_shingle_fp
    FROM documents ORDER BY doc_id
    """,
    "Document fingerprinting: content md5 + min-shingle rolling-hash "
    "fingerprint (1-hash MinHash).",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.fingerprint("text").alias("fp"),
        TX.min_shingle_fingerprint("text").alias("min_shingle_fp"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------
@register(
    "exact_dedup_docs",
    """
    SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS canonical_id,
           COUNT(*) AS n_dups
    FROM documents GROUP BY 1 ORDER BY canonical_id
    """,
    "Exact dedup: hash-groupBy on content fingerprint, canonical min-id "
    "per group — one shuffle on a uniform 32-byte key.",
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.exact_dedup(docs).orderBy("canonical_id")


@register(
    "ngram_jaccard_pairs",
    f"""
    WITH sh AS (SELECT doc_id, {_SHINGLE_SQL} AS s FROM documents),
    idx AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS h FROM sh),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
             COUNT(*) AS shared
      FROM idx a JOIN idx b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b,
           CAST(shared AS DOUBLE) / CAST(n_a + n_b - shared AS DOUBLE) AS jaccard
    FROM p
    WHERE CAST(shared AS DOUBLE) / CAST(n_a + n_b - shared AS DOUBLE) >= 0.05
    ORDER BY id_a, id_b
    """,
    "N-gram Jaccard near-dup: shingle inverted index -> self-join -> "
    "shared-count -> Jaccard >= 0.05 (29 true pairs at sf0.01).",
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(docs, threshold=0.05).orderBy("id_a", "id_b")


def _minhash_sig_sql(k: int) -> str:
    # lane i = min over shingles of the (i%4)-th 8-hex-char word of
    # md5(f"{i//4}|" + shingle) — mirrors operators.dedup.minhash_signatures
    # (4 hash lanes per md5 invocation)
    mins = ", ".join(
        "list_min(list_transform(s, x -> "
        f"substr(md5(concat('{i // 4}|', x)), {(i % 4) * 8 + 1}, 8)))"
        for i in range(k)
    )
    return f"[{mins}]"


@register(
    "minhash_lsh_near_dups",
    f"""
    WITH sh AS (
      SELECT doc_id,
        list_distinct(list_transform(range(0, len(string_split(text,' ')) - 2),
          i -> array_to_string(list_slice(string_split(text,' '), i+1, i+3), ' '))) AS s
      FROM documents),
    sig AS (SELECT doc_id, s, {_minhash_sig_sql(16)} AS g FROM sh),
    bands AS (
      SELECT doc_id, s, b.band,
        md5(concat_ws('|', g[b.band*4 + 1], g[b.band*4 + 2],
                           g[b.band*4 + 3], g[b.band*4 + 4])) AS key
      FROM sig, (SELECT unnest([0,1,2,3]) AS band) b),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                   AND a.doc_id < b.doc_id),
    verified AS (
      SELECT id_a, id_b,
        CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
          / CAST(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)) AS DOUBLE) AS jaccard
      FROM cand JOIN sh x ON cand.id_a = x.doc_id
                JOIN sh y ON cand.id_b = y.doc_id)
    SELECT id_a, id_b, jaccard FROM verified
    WHERE jaccard >= 0.05 ORDER BY id_a, id_b
    """,
    "MinHash(16)+LSH(4 bands of 4): shingle->md5-minhash->band-bucket-join "
    "candidates, exact-Jaccard verify of candidates only — the linear-ish "
    "scale path for corpus dedup.",
)
def minhash_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.minhash_lsh_near_dup_pairs(
        docs,
        num_hashes=16,
        bands=4,
        threshold=0.05,
        band_index=_minhash_band_index_cached(spark, sf_dir),
    ).orderBy("id_a", "id_b")


# (spark, sf_dir) -> MATERIALIZED (id, band, key) MinHash band index over
# the WHOLE documents table (K=16, B=4, shingle_n=3). The index is the
# artifact a 100 TB corpus persists once and every dedup job probes
# (operators/dedup.minhash_band_index docstring); this session cache is
# the in-memory analogue: minhash_lsh_near_dups and
# minhash_incremental_dedup both consume the same signatures (the
# incremental query slices batch/corpus out of it by id), so without the
# cache each build re-shingles and re-hashes the corpus — the same
# duplicated-build regression the shared unigram LM frame
# (_unigram_logprob_scores_cached) fixed for the quality-score pair.
# Holding the DataFrame reference keeps the checkpoint blocks alive
# against the ContextCleaner.
_minhash_index_cache: dict[tuple[SparkSession, str], DataFrame] = {}


def _minhash_band_index_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lineage import truncate_lineage

    key = (spark, sf_dir)
    if key not in _minhash_index_cache:
        docs = load_table(spark, sf_dir, "documents")
        _minhash_index_cache[key] = truncate_lineage(
            DD.minhash_band_index(docs, num_hashes=16, bands=4, shingle_n=3)
        )
    return _minhash_index_cache[key]


# (spark, sf_dir) -> the trained IVF coarse quantizer (K=8, iters=3) and
# the assigned (cid, vec_id, embedding) inverted-list table over the WHOLE
# embeddings table — shared by ivf_ann_topk / ivf_ann_fullprobe_topk /
# ivf_knn_join_topk / ivf_knn_join_fullprobe (and the centroids alone by
# ivfpq_ann_topk, which builds its OWN composite index — so centroids and
# index cache separately and the index materializes only when an IVF
# consumer actually needs it). The docs for
# train_ivf_centroids/write_ivf_index already say the 100 TB posture is
# "train once, persist partitionBy(cid), every probe reads the store";
# without this cache each query re-ran the identical deterministic
# k-means (first-K init, argmin ties to lowest cid — value-identical
# across sites). The degenerate EXACT twins that train on filtered
# slices or other params keep their own direct calls.
_ivf_centroid_cache: dict[tuple[SparkSession, str], list] = {}
_ivf_index_cache: dict[tuple[SparkSession, str], DataFrame] = {}


def _ivf_centroids_cached(spark: SparkSession, sf_dir: str) -> list:
    key = (spark, sf_dir)
    if key not in _ivf_centroid_cache:
        emb = load_table(spark, sf_dir, "embeddings")
        _ivf_centroid_cache[key] = SIM.train_ivf_centroids(
            emb, n_centroids=8, iters=3
        )
    return _ivf_centroid_cache[key]


def _ivf_index_cached(
    spark: SparkSession, sf_dir: str
) -> tuple[list, DataFrame]:
    from ..operators.lineage import truncate_lineage

    centroids = _ivf_centroids_cached(spark, sf_dir)
    key = (spark, sf_dir)
    if key not in _ivf_index_cache:
        emb = load_table(spark, sf_dir, "embeddings")
        _ivf_index_cache[key] = truncate_lineage(
            SIM.build_ivf_index(emb, centroids)
        )
    return centroids, _ivf_index_cache[key]


# (spark, sf_dir) -> the trained PQ codebooks (m=8, K=16, iters=2, dim=64)
# over the whole embeddings table — shared by pq_ann_topk and
# ivfpq_ann_topk (training is deterministic per-subspace k-means; the
# codebook is the persisted serving artifact). The lossless exact twins
# use different params on a filtered slice and stay direct.
_pq_books_cache: dict[tuple[SparkSession, str], object] = {}


def _pq_codebooks_cached(spark: SparkSession, sf_dir: str):
    key = (spark, sf_dir)
    if key not in _pq_books_cache:
        emb = load_table(spark, sf_dir, "embeddings")
        _pq_books_cache[key] = PQ.train_pq_codebooks(
            emb, m=8, n_centroids=16, iters=2, dim=64
        )
    return _pq_books_cache[key]


@register(
    "simhash_near_dups",
    None,  # Pandas-UDF signature: not SQL-expressible -> rows-only check
    "SimHash(64-bit) near-dup pairs within Hamming distance 3 via the "
    "pigeonhole block join (operators/simhash.py). Verified in pytest "
    "against brute-force Hamming over all pairs.",
)
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(docs, max_hamming=3).orderBy("id_a", "id_b")


@register(
    "simhash_exact_near_dups",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    tok AS (SELECT doc_id, unnest(l) AS tok FROM t),
    h AS (SELECT doc_id,
            CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS UBIGINT)
              * 4294967296
          + CAST(CAST('0x' || substr(md5(tok), 9, 8) AS BIGINT) AS UBIGINT)
            AS hv
          FROM tok),
    votes AS (
      SELECT doc_id, b.b AS bit,
             SUM(CASE WHEN (hv >> (63 - b.b)) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM h, (SELECT unnest(range(64)) AS b) b
      GROUP BY doc_id, b.b),
    sig AS (SELECT doc_id, bit, CASE WHEN v >= 0 THEN 1 ELSE 0 END AS s
            FROM votes),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(SUM(CASE WHEN a.s <> b.s THEN 1 ELSE 0 END) AS BIGINT)
               AS hamming
      FROM sig a JOIN sig b ON a.bit = b.bit AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, hamming FROM pairs
    WHERE hamming <= 3 ORDER BY id_a, id_b
    """,
    "SimHash near-dup pairs in the pigeonhole-EXACT configuration: with "
    "d+1 = 4 signature blocks, any pair within Hamming distance 3 must "
    "share >= 1 whole block (pigeonhole), so the block equi-join plan has "
    "recall 1.0 by construction and the bit_count verify makes precision "
    "exact — the driver row hash-proves operators/simhash.py's Pandas-UDF "
    "signature AND the block-join machinery against a DuckDB brute force "
    "that re-derives the 64-bit vote signature per doc (md5-based token "
    "hash restated bitwise) and compares all pairs. Same driver-proof "
    "pattern as srp_ann_exact_topk / ivf_ann_fullprobe_topk. Nearest "
    "reference analogue: key-identity dedup "
    "(sql/incremental_sync_members.sql:38-40) generalized to "
    "near-identity.",
)
def simhash_exact_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        simhash_near_dup_pairs(docs, max_hamming=3)
        .select("id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming"))
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------
_COS_Q6_SQL = """
  CAST(list_sum(list_transform(list_zip(va, vb), s ->
      CAST(round(CAST(s[1] AS DOUBLE) * 1000000) AS BIGINT)
    * CAST(round(CAST(s[2] AS DOUBLE) * 1000000) AS BIGINT))) AS DOUBLE)
  / (sqrt(CAST(list_sum(list_transform(va, x ->
      CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
    * CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS DOUBLE))
   * sqrt(CAST(list_sum(list_transform(vb, x ->
      CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
    * CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS DOUBLE)))
"""


# Exact cosine top-10 vs the vec_id=0 query: shared by the brute-force
# baseline AND the two ANN paths in their degenerate exact configurations
# (IVF at nprobe=K, SRP at max_hamming=n_planes) — same answer, three plans.
_ANN_TOPK_ORACLE = f"""
    WITH q AS (SELECT embedding AS vb FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT vec_id, {_COS_Q6_SQL} AS cos_sim
      FROM (SELECT vec_id, embedding AS va FROM embeddings), q)
    SELECT vec_id, cos_sim FROM scored
    ORDER BY cos_sim DESC, vec_id LIMIT 10
    """


@register(
    "ann_bruteforce_topk",
    _ANN_TOPK_ORACLE,
    "ANN baseline: exact cosine top-10 vs the vec_id=0 query vector — "
    "broadcast query, full scan, TakeOrderedAndProject (per-partition "
    "heaps). Quantized int64 cosine for cross-engine bit-stability.",
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return SIM.brute_force_topk(emb, query, k=10, exact_engine_parity=True)


@register(
    "knn_join_topk",
    f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS vb
               FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q_id, vec_id, {_COS_Q6_SQL} AS cos_sim
      FROM (SELECT vec_id, embedding AS va FROM embeddings), q),
    ranked AS (SELECT q_id, vec_id, cos_sim,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos_sim DESC, vec_id) AS rn
               FROM scored)
    SELECT q_id, vec_id, cos_sim FROM ranked WHERE rn <= 5
    ORDER BY q_id, cos_sim DESC, vec_id
    """,
    "Batch exact k-NN JOIN (operators/similarity.py knn_join): every "
    "query row gets its cosine top-5 corpus neighbors from ONE corpus "
    "scan — the SemDeDup-curation / batch-retrieval primitive. The "
    "broadcast Q×dim query matrix scores each Arrow batch as a single "
    "BLAS matmul; partitions emit only their LOCAL per-query top-k, so "
    "the one shuffle carries ≤ partitions·Q·k candidate rows into the "
    "final per-query window — corpus rows never shuffle. Parity mode "
    "scores with exact int64 q6 dots (HALF_UP rounding replicated in "
    "numpy) so DuckDB's window re-derivation hash-matches bit-for-bit.",
)
def knn_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q")
    )
    return SIM.knn_join(emb, queries, k=5, exact_engine_parity=True).orderBy(
        "q_id", F.desc("cos_sim"), "vec_id"
    )


@register(
    "ivf_knn_join_topk",
    None,  # approximate (list pruning) — rows-only; exactness at full
    #       probe is the driver-green entry below, recall in pytest
    "Batch k-NN through IVF list pruning (ivf_knn_join): each query "
    "probes its nprobe=4 of K=8 inverted lists — ~nprobe/K of the corpus "
    "read per query batch (a storage-level partition prune over the "
    "persisted index). Fully JVM: broadcast (q_id, cid, qvec) probe "
    "table equi-joined on cid, codegen cosine on the join output, "
    "per-query window on candidates only.",
)
def ivf_knn_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids, index = _ivf_index_cached(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q")
    )
    return SIM.ivf_knn_join(
        index, queries, centroids, k=5, nprobe=4
    ).orderBy("q_id", F.desc("cos_sim"), "vec_id")


@register(
    "ivf_knn_join_fullprobe",
    f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS vb
               FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q_id, vec_id, {_COS_Q6_SQL} AS cos_sim
      FROM (SELECT vec_id, embedding AS va FROM embeddings), q),
    ranked AS (SELECT q_id, vec_id, cos_sim,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos_sim DESC, vec_id) AS rn
               FROM scored)
    SELECT q_id, vec_id, cos_sim FROM ranked WHERE rn <= 5
    ORDER BY q_id, cos_sim DESC, vec_id
    """,
    "ivf_knn_join at nprobe = K: every query probes every list, so the "
    "IVF-pruned batch k-NN degrades to the exact k-NN join by "
    "construction — hash-checked against the same windowed brute-force "
    "oracle as knn_join_topk. Driver-proves the probe-table join + "
    "codegen scoring machinery the nprobe=4 form prunes with.",
)
def ivf_knn_join_fullprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids, index = _ivf_index_cached(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q")
    )
    return SIM.ivf_knn_join(
        index, queries, centroids, k=5, nprobe=8, exact_engine_parity=True
    ).orderBy("q_id", F.desc("cos_sim"), "vec_id")


@register(
    "embedding_near_dup_pairs",
    f"""
    WITH a AS (SELECT vec_id AS id_a, embedding AS va FROM embeddings),
         b AS (SELECT vec_id AS id_b, embedding AS vb FROM embeddings)
    SELECT id_a, id_b, {_COS_Q6_SQL} AS cos_sim
    FROM a JOIN b ON id_a < id_b
    WHERE {_COS_Q6_SQL} >= 0.4
    ORDER BY id_a, id_b
    """,
    "Embedding-cosine near-dup pairs (cos >= 0.4), exact. The Spark plan "
    "is NOT the oracle's theta join: pairs come from a chunk-keyed shuffle "
    "EQUI-join (bounded memory, even task split, no broadcast nested "
    "loop), with a 256-plane SRP Hamming prefilter ahead of the exact "
    "quantized-cosine check (binomial-budgeted: per-pair miss < 4e-6 at "
    "the threshold; measured zero at this SF). At this loose threshold "
    "bucket-FIRST pruning is mathematically off the table (see "
    "operators/similarity.py docstrings + SCALE.md); srp_bucket_near_dups "
    "below is the bucket-first form at the threshold regime where it "
    "genuinely prunes.",
)
def embedding_near_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.embedding_near_dup_pairs(
        emb, threshold=0.4, exact_engine_parity=True, dim=64, prefilter_planes=256
    ).orderBy("id_a", "id_b")


@register(
    "srp_ann_topk",
    None,  # approximate (bucket pruning) — rows-only; recall tested in pytest
    "SRP-LSH ANN: 16 random-hyperplane bit signature, candidates within "
    "Hamming<=6 of the query bucket, cosine top-10 of candidates only — "
    "the partition-pruned scale path (operators/similarity.py).",
)
def srp_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    index = SIM.build_srp_index(emb, dim=64, n_planes=16)
    return SIM.srp_topk(index, query, dim=64, k=10, n_planes=16, max_hamming=6)


@register(
    "srp_ann_exact_topk",
    _ANN_TOPK_ORACLE,
    "SRP ANN in its provably-recall-1.0 configuration: max_hamming = "
    "n_planes probes every bucket, so the multi-probe equi-join plan "
    "(operators/similarity.py srp_topk) must reproduce brute force exactly "
    "— hash-checked against the same oracle as ann_bruteforce_topk. The "
    "probing (max_hamming=6) form above stays rows-only; this entry "
    "driver-proves the machinery it prunes with.",
)
def srp_ann_exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    index = SIM.build_srp_index(emb, dim=64, n_planes=8)
    return SIM.srp_topk(
        index,
        query,
        dim=64,
        k=10,
        n_planes=8,
        max_hamming=8,
        exact_engine_parity=True,
    )


@register(
    "embedding_contamination_audit",
    f"""
    WITH te AS (SELECT vec_id AS test_id, embedding AS vb FROM embeddings
                WHERE vec_id % 10 = 0),
         tr AS (SELECT vec_id, embedding AS va FROM embeddings
                WHERE vec_id % 10 <> 0),
         p AS (SELECT test_id, {_COS_Q6_SQL} AS cos_sim FROM tr, te)
    SELECT test_id, MAX(cos_sim) AS max_train_cos,
           MAX(cos_sim) >= 0.5 AS contaminated
    FROM p GROUP BY test_id ORDER BY test_id
    """,
    "Semantic (embedding-space) train/test contamination audit — the "
    "dense-retrieval counterpart of ngram_decontamination: every held-out "
    "vector (vec_id % 10 = 0) reports its maximum cosine against the "
    "train split, flagged above 0.5. Plan: the SMALL test split "
    "broadcasts, the train corpus is scanned ONCE with per-row cosine "
    "against each broadcast test vector, and the per-test MAX collapses "
    "map-side (partial agg over |test| keys) — no pair set ever "
    "shuffles. MAX over quantized-int64 cosines is order-independent, so "
    "the hash is exact cross-engine. At 100 TB the same plan holds (the "
    "audit is one linear train scan); an SRP prefilter can cheapen the "
    "per-row cosine when |test| grows.",
)
def embedding_contamination_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("test_id"), F.col("embedding").alias("tv")
    )
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("embedding").alias("rv")
    )
    pairs = train.crossJoin(F.broadcast(test)).select(
        "test_id",
        SIM.cosine_q6(F.col("rv"), F.col("tv")).alias("cos_sim"),
    )
    return (
        pairs.groupBy("test_id")
        .agg(F.max("cos_sim").alias("max_train_cos"))
        .withColumn("contaminated", F.col("max_train_cos") >= 0.5)
        .orderBy("test_id")
    )


@register(
    "doc_unigram_logprob",
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                 FROM documents),
    v AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY t),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM v),
    lp AS (SELECT t,
                  CAST(round(ln(CAST(n AS DOUBLE) / total) * 1000000)
                       AS BIGINT) AS lpq
           FROM v, tot),
    d AS (SELECT doc_id, CAST(SUM(lpq) AS BIGINT) AS s,
                 CAST(COUNT(*) AS BIGINT) AS n_tokens
          FROM tok JOIN lp ON tok.t = lp.t GROUP BY doc_id)
    SELECT doc_id, n_tokens,
           round(CAST(s AS DOUBLE) / (1000000.0 * n_tokens), 6)
             AS avg_logprob
    FROM d ORDER BY doc_id
    """,
    "Unigram language-model quality score (the CCNet-style LM-perplexity "
    "proxy): corpus unigram distribution -> per-doc mean token log-prob; "
    "low scores mark gibberish/rare-token noise, high scores mark "
    "boilerplate. Bit-stable: each token's ln is quantized to 1e-6 int64 "
    "BEFORE the per-doc sum (double addition is order-dependent across "
    "engines; integer sums aren't), and the mean is one exact int/double "
    "division. Plan: the vocab (bounded) broadcasts into the token "
    "stream, per-doc sums collapse map-side keyed by uniform doc_id.",
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _unigram_logprob_scores_cached(spark, sf_dir).orderBy("doc_id")


# (spark, sf_dir) -> MATERIALIZED scored frame. The vocab checkpoint
# inside _unigram_logprob_scores is the expensive part of the LM-score
# build; before this cache, doc_unigram_logprob and
# doc_lm_quality_buckets each materialized their own copy in the same
# session (the r6 regression: the buckets build paid the whole
# tokenize+checkpoint again). One shared truncated frame per session —
# the _rewards_cdc_fixture session-cache pattern — restores one build
# for the pair; holding the DataFrame reference keeps its checkpoint
# blocks alive against the ContextCleaner.
_unigram_scores_cache: dict[tuple[SparkSession, str], DataFrame] = {}


def _unigram_logprob_scores_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lineage import truncate_lineage

    key = (spark, sf_dir)
    if key not in _unigram_scores_cache:
        docs = load_table(spark, sf_dir, "documents")
        _unigram_scores_cache[key] = truncate_lineage(
            _unigram_logprob_scores(docs)
        )
    return _unigram_scores_cache[key]


def _unigram_logprob_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob): the CCNet-style unigram LM score —
    shared by doc_unigram_logprob and the bucket filter built on it
    (always through _unigram_logprob_scores_cached, so the two builds
    materialize ONE vocab checkpoint and one scored frame per session)."""
    from ..operators.lineage import truncate_lineage

    tok = docs.select("doc_id", F.explode(TX.tokens("text")).alias("t"))
    # vocab-bounded; checkpointed so the grand total and the broadcast
    # into the scoring join don't each re-tokenize the corpus (Spark has
    # no cross-subtree CSE) — the token stream is built exactly twice
    v = truncate_lineage(
        tok.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = v.agg(F.sum("n").cast("bigint").alias("total"))
    lp = v.crossJoin(F.broadcast(tot)).select(
        "t",
        F.round(
            F.log(F.col("n").cast("double") / F.col("total")) * 1000000
        )
        .cast("bigint")
        .alias("lpq"),
    )
    d = (
        tok.join(F.broadcast(lp), "t")
        .groupBy("doc_id")
        .agg(
            F.sum("lpq").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        )
    )
    # unordered: the consumers sort their own way (doc_id vs score rank),
    # and the shared checkpoint should not materialize a sort neither needs
    return d.select(
        "doc_id",
        "n_tokens",
        F.round(
            F.col("s").cast("double") / (F.lit(1000000.0) * F.col("n_tokens")), 6
        ).alias("avg_logprob"),
    )


@register(
    "bpe_train_merges",
    None,  # iterative driver-coordinated training loop — genuinely
    #       non-SQL; merge-sequence equality vs a pure-Python reference
    #       BPE is pinned in tests/test_bpe.py
    "Iterative BPE merge training (operators/bpe.py): 6 merge rules "
    "learned by repeated [bounded-key pair aggregation -> driver top-1 -> "
    "Arrow-batched greedy fusion over the word vocab], lineage truncated "
    "per iteration. The one-shot bpe_pair_candidates scan above is this "
    "loop's first iteration; this runs the whole loop — the engine's "
    "third iterative algorithm next to k-means and connected components.",
)
def bpe_train_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    merges = BPE.train_bpe_merges(docs, n_merges=6)
    return spark.createDataFrame(
        [(r, l, rt, l + rt, pc) for r, l, rt, pc in merges],
        "rank int, left string, right string, merged string, pair_count bigint",
    ).orderBy("rank")


@register(
    "bpe_encode_docs",
    None,  # the per-word greedy rule cascade is iterative — non-SQL;
    #       encode-vs-reference equality is pinned in tests/test_bpe.py
    "Corpus encoded with the trained BPE merges (operators/bpe.py "
    "bpe_encode): the DISTINCT word vocab is encoded once in an Arrow "
    "batch (cost O(|vocab|), never O(corpus)), broadcast back onto the "
    "positioned token stream, and per-doc token lists reassemble in word "
    "order — the corpus side stays entirely JVM-side. Output is the "
    "per-doc whitespace vs BPE token accounting a batching pipeline "
    "budgets with.",
)
def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    merges = BPE.train_bpe_merges(docs, n_merges=6)
    return (
        BPE.bpe_encode(docs, merges)
        .join(
            docs.select("doc_id", TX.token_count("text").alias("n_words")),
            "doc_id",
        )
        .select("doc_id", "n_words", "n_bpe_tokens")
        .orderBy("doc_id")
    )


@register(
    "gopher_filter_docs",
    f"""
    WITH t AS (
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        CAST(length(replace(text, ' ', '')) AS DOUBLE)
          / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len,
        CAST(len(list_filter(string_split(text, ' '),
                 x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
          / CAST(len(string_split(text, ' ')) AS DOUBLE) AS alpha_word_frac,
        CAST(length(text) - length(replace(text, '#', ''))
             + len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
          / CAST(len(string_split(text, ' ')) AS DOUBLE) AS symbol_ratio,
        CAST(len(list_filter(string_split(text, ' '),
                 x -> x IN ({_STOP_SQL}))) AS BIGINT) AS n_stop
      FROM documents)
    SELECT doc_id, n_words, mean_word_len, alpha_word_frac, symbol_ratio,
           n_stop,
           n_words BETWEEN 50 AND 100000 AS ok_word_count,
           mean_word_len BETWEEN 3.0 AND 10.0 AS ok_mean_word_len,
           alpha_word_frac >= 0.8 AS ok_alpha_words,
           symbol_ratio <= 0.1 AS ok_symbol_ratio,
           n_stop >= 2 AS ok_stopwords,
           (n_words BETWEEN 50 AND 100000)
             AND (mean_word_len BETWEEN 3.0 AND 10.0)
             AND alpha_word_frac >= 0.8 AND symbol_ratio <= 0.1
             AND n_stop >= 2 AS kept
    FROM t ORDER BY doc_id
    """,
    "The Gopher quality-rule set (Rae et al. 2021 Table A1, the subset "
    "meaningful for single-line synthetic docs — the bullet/ellipsis LINE "
    "ratios need multi-line text): word-count bounds, mean-word-length "
    "bounds, alpha-word fraction, symbol-to-word ratio, minimum stopword "
    "count, plus the conjunction a pipeline actually filters on. Every "
    "ratio is an exact int/int -> double division (bit-stable without "
    "quantization); per-row projection, no shuffle, whole-stage codegen.",
)
def gopher_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    n_words = F.size(toks).cast("bigint")
    n_chars = F.length(F.regexp_replace("text", " ", "")).cast("double")
    mean_wl = n_chars / n_words.cast("double")
    alpha = F.size(
        F.filter(toks, lambda x: x.rlike("[A-Za-z]"))
    ).cast("double") / n_words.cast("double")
    symbols = (
        F.length("text") - F.length(F.regexp_replace("text", "#", ""))
        + F.regexp_count("text", F.lit(r"\.\.\."))
    ).cast("double") / n_words.cast("double")
    n_stop = TX.stopword_count("text").cast("bigint")
    flags = TX.gopher_flags("text")
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha.alias("alpha_word_frac"),
        symbols.alias("symbol_ratio"),
        n_stop.alias("n_stop"),
        *[c.alias(name) for name, c in flags.items()],
        TX.gopher_kept("text").alias("kept"),
    ).orderBy("doc_id")


@register(
    "doc_bigram_logprob",
    """
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    tok AS (SELECT doc_id,
                   unnest(list_transform(range(1, len(t) + 1),
                     i -> struct_pack(cur := t[i],
                       prev := CASE WHEN i = 1 THEN NULL
                               ELSE t[i - 1] END))) AS pc
            FROM tk),
    p AS (SELECT doc_id, pc.cur AS cur, pc.prev AS prev FROM tok),
    uni AS (SELECT cur, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY cur),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM uni),
    big AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS nb
            FROM p WHERE prev IS NOT NULL GROUP BY prev, cur),
    pfx AS (SELECT prev, CAST(SUM(nb) AS BIGINT) AS np FROM big GROUP BY prev),
    sc AS (
      SELECT p.doc_id,
             CAST(round(ln(CASE WHEN p.prev IS NULL
                  THEN CAST(uni.n AS DOUBLE) / CAST(total AS DOUBLE)
                  ELSE 0.7 * (CAST(big.nb AS DOUBLE) / CAST(pfx.np AS DOUBLE))
                     + 0.3 * (CAST(uni.n AS DOUBLE) / CAST(total AS DOUBLE))
                  END) * 1000000) AS BIGINT) AS lpq
      FROM p
      JOIN uni ON p.cur = uni.cur
      LEFT JOIN big ON p.prev = big.prev AND p.cur = big.cur
      LEFT JOIN pfx ON p.prev = pfx.prev
      CROSS JOIN tot),
    d AS (SELECT doc_id, CAST(SUM(lpq) AS BIGINT) AS s,
                 CAST(COUNT(*) AS BIGINT) AS n_tokens
          FROM sc GROUP BY doc_id)
    SELECT doc_id, n_tokens,
           round(CAST(s AS DOUBLE) / (1000000.0 * n_tokens), 6)
             AS avg_logprob
    FROM d ORDER BY doc_id
    """,
    "Interpolated bigram LM quality score (the KenLM-shaped upgrade of "
    "doc_unigram_logprob): per-token ln(0.7*P(w|prev) + 0.3*P(w)), pure "
    "unigram at document start; self-scoring on the corpus counts so "
    "every bigram is attested (held-out scoring would add backoff mass). "
    "Bit-stable the same way as the unigram form: exact integer count "
    "ratios -> one double formula -> per-token 1e-6 int64 quantization "
    "BEFORE the per-doc sum. Plan: prev/cur pairs come from one "
    "arrays_zip projection (no self-join), the bounded unigram/prefix "
    "tables broadcast, the bigram table joins on its uniform (prev,cur) "
    "key, per-doc sums collapse map-side.",
)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select("doc_id", TX.tokens("text").alias("tk"))
    pairs = (
        tk.select(
            "doc_id",
            F.arrays_zip(
                F.col("tk").alias("cur"),
                F.concat(
                    F.array(F.lit(None).cast("string")),
                    F.slice(F.col("tk"), 1, F.size("tk") - 1),
                ).alias("prev"),
            ).alias("pcs"),
        )
        .select("doc_id", F.explode("pcs").alias("pc"))
        .select("doc_id", F.col("pc.cur").alias("cur"), F.col("pc.prev").alias("prev"))
    )
    # ONE (prev, cur) aggregation (null prev = document start included)
    # feeds every count table: unigram counts re-aggregate it over cur,
    # the bigram table filters it, prefix marginals re-aggregate the
    # bigram table. The aggregation is CHECKPOINTED: its three consumers
    # are three separate subtrees in one plan, and Spark performs no
    # cross-subtree CSE (executed plan showed zero ReusedExchange here) —
    # without the checkpoint each consumer re-tokenized the corpus, 5
    # scans total. With it the token stream is built exactly twice (once
    # into these counts, once for the scoring join below) and the count
    # tables — vocab²-bounded, orders smaller than the token stream —
    # materialize once.
    from ..operators.lineage import truncate_lineage

    big0 = truncate_lineage(
        pairs.groupBy("prev", "cur").agg(
            F.count(F.lit(1)).cast("bigint").alias("nb")
        )
    )
    uni = big0.groupBy("cur").agg(F.sum("nb").cast("bigint").alias("n"))
    tot = uni.agg(F.sum("n").cast("bigint").alias("total"))
    big = big0.filter(F.col("prev").isNotNull())
    pfx = big.groupBy("prev").agg(F.sum("nb").cast("bigint").alias("np"))
    pu = F.col("n").cast("double") / F.col("total").cast("double")
    pb = F.col("nb").cast("double") / F.col("np").cast("double")
    sc = (
        pairs.join(F.broadcast(uni), "cur")
        .join(big, ["prev", "cur"], "left")
        .join(F.broadcast(pfx), "prev", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(
                F.log(
                    F.when(F.col("prev").isNull(), pu).otherwise(
                        F.lit(0.7) * pb + F.lit(0.3) * pu
                    )
                )
                * 1000000
            )
            .cast("bigint")
            .alias("lpq"),
        )
    )
    d = sc.groupBy("doc_id").agg(
        F.sum("lpq").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
    )
    return d.select(
        "doc_id",
        "n_tokens",
        F.round(
            F.col("s").cast("double") / (F.lit(1000000.0) * F.col("n_tokens")), 6
        ).alias("avg_logprob"),
    )


@register(
    "doc_lm_quality_buckets",
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                 FROM documents),
    v AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY t),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM v),
    lp AS (SELECT t,
                  CAST(round(ln(CAST(n AS DOUBLE) / total) * 1000000)
                       AS BIGINT) AS lpq
           FROM v, tot),
    d0 AS (SELECT doc_id, CAST(SUM(lpq) AS BIGINT) AS s,
                  CAST(COUNT(*) AS BIGINT) AS n_tokens
           FROM tok JOIN lp ON tok.t = lp.t GROUP BY doc_id),
    d AS (SELECT doc_id,
                 round(CAST(s AS DOUBLE) / (1000000.0 * n_tokens), 6)
                   AS avg_logprob
          FROM d0),
    ranked AS (SELECT doc_id, avg_logprob,
                      row_number() OVER (ORDER BY avg_logprob DESC, doc_id)
                        AS rank
               FROM d),
    nn AS (SELECT CAST(ceil(COUNT(*) / 3.0) AS BIGINT) AS n3 FROM d)
    SELECT doc_id, avg_logprob, rank,
           CASE WHEN rank <= n3 THEN 'head'
                WHEN rank <= 2 * n3 THEN 'middle'
                ELSE 'tail' END AS bucket,
           rank <= 2 * n3 AS kept
    FROM ranked, nn ORDER BY rank
    """,
    "CCNet's head/middle/tail LM-quality bucketing (Wenzek et al. 2019): "
    "corpus ranked by unigram log-prob, split in rank terciles, tail "
    "dropped. The oracle is the plain unpartitioned row_number window; "
    "the Spark plan is operators/ranking.py global_row_number — "
    "repartitionByRange on the unique (score desc, doc_id) key, "
    "per-partition counts (<= num_partitions driver scalars), "
    "mapInPandas offset stamping — the EXACT same ranks with no "
    "single-partition window anywhere, i.e. the form that survives a "
    "corpus that doesn't fit one task.",
)
def doc_lm_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..operators.ranking import global_row_number

    # the session-cached MATERIALIZED scored frame (shared with
    # doc_unigram_logprob — one vocab checkpoint + one scoring pass per
    # session): the tercile boundary (count), the range partitioner's
    # sample, the per-partition counts, and the stamp pass all read the
    # checkpointed rows, not the scoring plan
    d = _unigram_logprob_scores_cached(spark, sf_dir).select(
        "doc_id", "avg_logprob"
    )
    n3 = math.ceil(d.count() / 3.0)
    ranked = global_row_number(
        d,
        [F.col("avg_logprob").desc(), F.col("doc_id").asc()],
        out_col="rank",
        num_partitions=8,
    )
    bucket = (
        F.when(F.col("rank") <= n3, F.lit("head"))
        .when(F.col("rank") <= 2 * n3, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ranked.select(
        "doc_id",
        "avg_logprob",
        "rank",
        bucket.alias("bucket"),
        (F.col("rank") <= 2 * n3).alias("kept"),
    ).orderBy("rank")


@register(
    "dedup_corpus_keep_first",
    """
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id IN (
      SELECT min(doc_id) FROM documents GROUP BY md5(lower(trim(text))))
    ORDER BY doc_id
    """,
    "The deduplicated corpus itself (not just the group stats): keep the "
    "min-id row per content fingerprint — fingerprint groupBy + left_semi "
    "join back, the exact shape a pipeline materializes before training.",
)
def dedup_corpus_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        DD.exact_dedup_keep_first(docs)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE
    sh AS (SELECT doc_id, {_SHINGLE_SQL} AS s FROM documents),
    idx AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS h FROM sh),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
             COUNT(*) AS shared
      FROM idx a JOIN idx b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4),
    pr AS (
      SELECT id_a, id_b FROM p
      WHERE CAST(shared AS DOUBLE) / CAST(n_a + n_b - shared AS DOUBLE) >= 0.05),
    ed AS (SELECT id_a AS u, id_b AS v FROM pr
           UNION SELECT id_b, id_a FROM pr),
    walk(node, reach) AS (
      SELECT u, u FROM ed
      UNION
      SELECT w.node, e.v FROM walk w JOIN ed e ON w.reach = e.u),
    cc AS (SELECT node, MIN(reach) AS cluster_id FROM walk GROUP BY node),
    sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM cc GROUP BY cluster_id)
    SELECT CAST(cc.node AS BIGINT) AS doc_id,
           CAST(cc.cluster_id AS BIGINT) AS cluster_id,
           sz.cluster_size,
           cc.node = cc.cluster_id AS is_canonical
    FROM cc JOIN sz USING (cluster_id)
    ORDER BY doc_id
    """,
    "Transitive closure of the near-dup relation: n-gram Jaccard pairs -> "
    "alternating large-star/small-star connected components "
    "(operators/components.py, O(log n) shuffle rounds) -> one canonical "
    "min-id doc per cluster. The oracle computes the same closure with a "
    "recursive reachability CTE — feasible only at oracle scale; the "
    "star algorithm is the 100 TB path.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    cc = _dedup_cc_cached(spark, sf_dir)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("component")).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


# (spark, sf_dir) -> MATERIALIZED (node, component) cluster assignment for
# the n-gram-Jaccard(0.05) near-dup graph. The assignment table is the
# artifact a dedup pipeline persists (it's consulted by every downstream
# keep/drop/report); in-session, dedup_clusters and
# near_dedup_corpus_keep_first both need it, and the dominant cost — the
# shingle inverted-index self-join feeding connected_components — would
# otherwise run once PER query. Same session-cache pattern as
# _unigram_logprob_scores_cached; the held reference keeps the checkpoint
# blocks alive.
_dedup_cc_cache: dict[tuple[SparkSession, str], DataFrame] = {}


def _dedup_cc_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components
    from ..operators.lineage import truncate_lineage

    key = (spark, sf_dir)
    if key not in _dedup_cc_cache:
        docs = load_table(spark, sf_dir, "documents")
        pairs = DD.ngram_jaccard_pairs(docs, threshold=0.05)
        _dedup_cc_cache[key] = truncate_lineage(
            connected_components(pairs, src="id_a", dst="id_b")
        )
    return _dedup_cc_cache[key]


@register(
    "near_dedup_corpus_keep_first",
    f"""
    WITH RECURSIVE
    sh AS (SELECT doc_id, {_SHINGLE_SQL} AS s FROM documents),
    idx AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS h FROM sh),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
             COUNT(*) AS shared
      FROM idx a JOIN idx b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4),
    pr AS (
      SELECT id_a, id_b FROM p
      WHERE CAST(shared AS DOUBLE) / CAST(n_a + n_b - shared AS DOUBLE) >= 0.05),
    ed AS (SELECT id_a AS u, id_b AS v FROM pr
           UNION SELECT id_b, id_a FROM pr),
    walk(node, reach) AS (
      SELECT u, u FROM ed
      UNION
      SELECT w.node, e.v FROM walk w JOIN ed e ON w.reach = e.u),
    cc AS (SELECT node, MIN(reach) AS cluster_id FROM walk GROUP BY node)
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id NOT IN (SELECT node FROM cc WHERE node <> cluster_id)
    ORDER BY doc_id
    """,
    "The NEAR-deduplicated corpus itself — what a pipeline actually "
    "materializes before training (the near-dup generalization of "
    "dedup_corpus_keep_first): n-gram Jaccard pairs -> connected "
    "components -> drop every non-canonical cluster member via a "
    "broadcast anti-join (the drop set is |dups|, tiny relative to the "
    "corpus). Every stage is the individually-proven scale path; the "
    "oracle recomputes the closure with a recursive reachability CTE.",
)
def near_dedup_corpus_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cc = _dedup_cc_cached(spark, sf_dir)
    drop = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return (
        docs.join(F.broadcast(drop), "doc_id", "left_anti")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def _augmented_embeddings(emb: DataFrame) -> DataFrame:
    """The corpus plus one deterministic near-duplicate per vector
    (vec_id + 100000, first component shifted by +0.01 in double) — the
    driver corpus has no true dups (max natural cos 0.51), so the
    true-dup-regime operator needs pairs to find. The same construction is
    restated in the oracle SQL, so the check is a full value-hash match."""
    return emb.select("vec_id", "embedding").unionByName(
        emb.select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.concat(
                F.array(F.col("embedding")[0].cast("double") + F.lit(0.01)),
                F.slice(
                    F.transform("embedding", lambda x: x.cast("double")), 2, 63
                ),
            ).alias("embedding"),
        )
    )


@register(
    "srp_bucket_near_dups",
    f"""
    WITH aug AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
      UNION ALL
      SELECT vec_id + 100000,
             list_prepend(CAST(embedding[1] AS DOUBLE) + 0.01,
                          list_transform(embedding[2:64], x -> CAST(x AS DOUBLE)))
      FROM embeddings),
    a AS (SELECT vec_id AS id_a, v AS va FROM aug),
    b AS (SELECT vec_id AS id_b, v AS vb FROM aug)
    SELECT id_a, id_b, {_COS_Q6_SQL} AS cos_sim
    FROM a JOIN b ON id_a < id_b
    WHERE {_COS_Q6_SQL} >= 0.99
    ORDER BY id_a, id_b
    """,
    "Bucket-FIRST near-dup at a true-dup threshold (cos >= 0.99), "
    "oracle-checked: pigeonhole block equi-joins over a 64-plane SRP "
    "signature generate candidates (Hamming <= 4 -> 5 blocks of ~13 bits; "
    "a random pair matches a block with p ~ 2^-13, so candidates are a "
    "vanishing fraction of n²), then exact quantized cosine verifies "
    "candidates only. Runs on the corpus augmented with one deterministic "
    "near-duplicate per vector; the oracle restates the augmentation and "
    "checks the full all-pairs answer — the miss bound (all 5 blocks "
    "differing) is ~1e-8 per pair at this threshold.",
)
def srp_bucket_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.srp_near_dup_pairs(
        _augmented_embeddings(emb),
        dim=64,
        threshold=0.99,
        max_hamming=4,
        exact_engine_parity=True,
    ).orderBy("id_a", "id_b")


@register(
    "embedding_dup_clusters",
    f"""
    WITH RECURSIVE
    aug AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
      UNION ALL
      SELECT vec_id + 100000,
             list_prepend(CAST(embedding[1] AS DOUBLE) + 0.01,
                          list_transform(embedding[2:64], x -> CAST(x AS DOUBLE)))
      FROM embeddings),
    a AS (SELECT vec_id AS id_a, v AS va FROM aug),
    b AS (SELECT vec_id AS id_b, v AS vb FROM aug),
    pr AS (
      SELECT id_a, id_b FROM a JOIN b ON id_a < id_b
      WHERE {_COS_Q6_SQL} >= 0.99),
    ed AS (SELECT id_a AS u, id_b AS v FROM pr
           UNION SELECT id_b, id_a FROM pr),
    walk(node, reach) AS (
      SELECT u, u FROM ed
      UNION
      SELECT w.node, e.v FROM walk w JOIN ed e ON w.reach = e.u),
    cc AS (SELECT node, MIN(reach) AS cluster_id FROM walk GROUP BY node),
    sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM cc GROUP BY cluster_id)
    SELECT CAST(cc.node AS BIGINT) AS vec_id,
           CAST(cc.cluster_id AS BIGINT) AS cluster_id,
           sz.cluster_size,
           cc.node = cc.cluster_id AS is_canonical
    FROM cc JOIN sz USING (cluster_id)
    ORDER BY vec_id
    """,
    "Semantic (embedding-space) dedup clustering end-to-end — the "
    "SemDeDup-style composition: SRP pigeonhole block joins generate "
    "cos >= 0.99 candidate pairs (never all-pairs), exact quantized cosine "
    "verifies them, and alternating large-star/small-star connected "
    "components (operators/components.py) collapse the pair relation into "
    "clusters with a canonical min-id representative. Runs on the corpus "
    "augmented with one deterministic near-duplicate per vector (the "
    "srp_bucket_near_dups construction, restated in the oracle); the "
    "oracle recomputes the closure with all-pairs + a recursive "
    "reachability CTE — feasible only at oracle scale, while every Spark "
    "stage (block equi-joins, star rounds) is the 100 TB path.",
)
def embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = SIM.srp_near_dup_pairs(
        _augmented_embeddings(emb),
        dim=64,
        threshold=0.99,
        max_hamming=4,
        exact_engine_parity=True,
    )
    cc = connected_components(pairs, src="id_a", dst="id_b")
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col("node").alias("vec_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("component")).alias("is_canonical"),
        )
        .orderBy("vec_id")
    )


@register(
    "corpus_clean_keep",
    f"""
    WITH t AS (
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
        CAST(len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_SQL}))) AS DOUBLE)
          / CAST(len(string_split(text, ' ')) AS DOUBLE) AS sr,
        CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) AS pc,
        md5(lower(trim(text))) AS fp
      FROM documents),
    c AS (
      SELECT doc_id, n,
        least(n / 100.0, 1.0) * 0.4
        + greatest(1.0 - abs(sr - 0.04) * 5.0, 0.0) * 0.4
        + (1.0 - least(pc / n, 1.0)) * 0.2 AS quality,
        min(doc_id) OVER (PARTITION BY fp) AS canon
      FROM t)
    SELECT doc_id, quality FROM c
    WHERE quality >= 0.5 AND n >= 10 AND doc_id = canon
    ORDER BY doc_id
    """,
    "Composed corpus-cleaning pipeline in ONE pass: quality gate (>=0.5) x "
    "min-length gate (>=10 tokens) x exact-dedup keep-canonical — the "
    "training-data filter chain. Per-row projections + one window shuffle "
    "on the content fingerprint; each gate is a pushed filter, nothing "
    "materializes between stages.",
)
def corpus_clean_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("fp")
    return (
        docs.select(
            "doc_id",
            TX.token_count("text").cast("double").alias("n"),
            TX.quality_score("text").alias("quality"),
            TX.fingerprint("text").alias("fp"),
        )
        .withColumn("canon", F.min("doc_id").over(w))
        .filter(
            (F.col("quality") >= 0.5)
            & (F.col("n") >= 10)
            & (F.col("doc_id") == F.col("canon"))
        )
        .select("doc_id", "quality")
        .orderBy("doc_id")
    )


@register(
    "ivf_ann_topk",
    None,  # approximate (list pruning) — rows-only; exactness at full probe
    #       and recall at nprobe=4 are asserted in tests/test_ivf_ann.py
    "IVF ANN: k-means coarse quantizer (trained as DataFrame jobs, only the "
    "KxD centroid matrix on the driver), inverted lists partitionable by "
    "cid, probe nprobe=4 of K=8 lists, exact cosine inside "
    "(operators/similarity.py). nprobe=K degrades to exact brute force.",
)
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids, index = _ivf_index_cached(spark, sf_dir)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return SIM.ivf_topk(index, qvec, centroids, k=10, nprobe=4)


@register(
    "ivf_ann_fullprobe_topk",
    _ANN_TOPK_ORACLE,
    "IVF ANN at nprobe = K (full probe): the k-means quantizer + inverted "
    "lists + probe plan degrades to exact brute force by construction — "
    "hash-checked against the same oracle as ann_bruteforce_topk. The "
    "nprobe=4 probing form above stays rows-only; this entry driver-proves "
    "the index/probe machinery itself.",
)
def ivf_ann_fullprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids, index = _ivf_index_cached(spark, sf_dir)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return SIM.ivf_topk(
        index, qvec, centroids, k=10, nprobe=8, exact_engine_parity=True
    )


@register(
    "pq_ann_topk",
    None,  # approximate (lossy codes) — rows-only; the lossless config
    #       below is hash-checked, recall is asserted in tests/test_pq_ann.py
    "Product-quantization ANN (Jegou et al. 2011): 8 sub-codebooks of 16 "
    "centroids trained per-subspace by the same DataFrame-job k-means as "
    "IVF, vectors stored as 8 int codes (32x smaller than float32), query "
    "scored by ADC lookup tables folded in codegen — the shrink-the-scan "
    "axis of the ANN family (operators/pq.py).",
)
def pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    books = _pq_codebooks_cached(spark, sf_dir)
    codes = PQ.pq_encode(emb, books)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return PQ.pq_adc_topk(codes, qvec, books, k=10)


@register(
    "pq_ann_exact_topk",
    f"""
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 64),
    q AS (SELECT embedding AS vb FROM sub WHERE vec_id = 0),
    scored AS (
      SELECT vec_id, {_COS_Q6_SQL} AS cos_sim
      FROM (SELECT vec_id, embedding AS va FROM sub), q)
    SELECT vec_id, cos_sim FROM scored
    ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
    "PQ ANN in its lossless configuration (n_centroids >= |corpus|, "
    "iters=0: every codebook contains every subvector, codes reconstruct "
    "exactly, and integer-parity ADC partial dots/norms sum to the full "
    "cosine_q6 quantities bitwise) — hash-checked against the brute-force "
    "oracle on the vec_id<64 slice. The lossy m=8/K=16 form above stays "
    "rows-only; this entry driver-proves the train/encode/ADC machinery "
    "itself, the same degenerate-config pattern as srp_ann_exact_topk and "
    "ivf_ann_fullprobe_topk.",
)
def pq_ann_exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 64)
    books = PQ.train_pq_codebooks(emb, m=4, n_centroids=64, iters=0, dim=64)
    codes = PQ.pq_encode(emb, books)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return PQ.pq_adc_topk(codes, qvec, books, k=10, exact_engine_parity=True)


@register(
    "ivfpq_ann_topk",
    None,  # doubly-approximate (list pruning x lossy codes) — rows-only;
    #       recall and the exact degenerate config are in tests/test_pq_ann.py
    "IVF+PQ composite ANN (the FAISS IVFPQ layout): k-means inverted "
    "lists prune WHICH rows a probe scans, PQ codes shrink WHAT it reads "
    "— partitionBy(cid) storage makes a probe a partition-pruned scan of "
    "nprobe/K of the corpus at ~1/32 the bytes (operators/pq.py "
    "build_ivfpq_index/ivfpq_topk).",
)
def ivfpq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # shares the coarse quantizer AND the PQ codebooks with the plain
    # IVF/PQ queries (identical params, deterministic trainers); only the
    # composite index assembly is specific to this query — centroids-only
    # lookup so the plain IVF index is never materialized on its behalf
    centroids = _ivf_centroids_cached(spark, sf_dir)
    books = _pq_codebooks_cached(spark, sf_dir)
    index = PQ.build_ivfpq_index(emb, centroids, books)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return PQ.ivfpq_topk(index, qvec, centroids, books, k=10, nprobe=4)


@register(
    "ivfpq_ann_exact_topk",
    f"""
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 64),
    q AS (SELECT embedding AS vb FROM sub WHERE vec_id = 0),
    scored AS (
      SELECT vec_id, {_COS_Q6_SQL} AS cos_sim
      FROM (SELECT vec_id, embedding AS va FROM sub), q)
    SELECT vec_id, cos_sim FROM scored
    ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
    "IVF+PQ in its doubly-degenerate configuration: nprobe = K (every "
    "list probed) AND lossless codebooks (K >= corpus, iters=0) — the "
    "composite index/probe/ADC machinery must reproduce brute force "
    "bitwise, hash-checked against the same oracle as pq_ann_exact_topk. "
    "The probing/lossy form above stays rows-only.",
)
def ivfpq_ann_exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 64)
    centroids = SIM.train_ivf_centroids(emb, n_centroids=4, iters=2)
    books = PQ.train_pq_codebooks(emb, m=4, n_centroids=64, iters=0, dim=64)
    index = PQ.build_ivfpq_index(emb, centroids, books)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return PQ.ivfpq_topk(
        index, qvec, centroids, books, k=10, nprobe=4, exact_engine_parity=True
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (text bytes as opaque media; decode kernels stubbed)
# ---------------------------------------------------------------------------
@register(
    "doc_binary_features",
    """
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5
    FROM documents ORDER BY media_id
    """,
    "Multimodal plumbing: text bytes as opaque binary payload — byte "
    "length + content hash through the binary column path (real media "
    "decode is a mapInPandas kernel, operators/multimodal.py).",
)
def doc_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.text_as_media(docs)
    return media.select(
        "media_id",
        F.octet_length("content").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    ).orderBy("media_id")


# 64-bit pHash (r14, verdict-ordered fixture widening): each of the stub
# decoder's 8 features quantized to its 8 MOST-SIGNIFICANT fractional
# bits (feature = word/2^32, so those bits are the word's top byte —
# with a real decoder this is coarse DCT-coefficient quantization). The
# r13 form thresholded each feature to ONE bit: an 8-bit hash whose
# pigeonhole blocks had only 2x16 distinct keys, capping the block
# join's parallelism at 32 tasks — three orders of magnitude narrower
# than the production key space the plan is designed for. 64 bits give
# 4 16-bit blocks (~65k keys each), so pair enumeration spreads over
# the full shuffle width at any scale. Byte 7 lands in the sign byte of
# the BIGINT phash: both engines place it via the SAME signed
# arithmetic (b7 - 256 when b7 >= 128), so the two's-complement bit
# pattern — what xor/bit_count read — is identical cross-engine.
_PHASH64_BYTE_SQL = [
    f"CAST('0x' || substr(h, {8 * i + 1}, 2) AS BIGINT)" for i in range(8)
]
_PHASH64_SQL = " + ".join(
    [f"({_PHASH64_BYTE_SQL[i]}) * {1 << (8 * i)}" for i in range(7)]
    + [
        f"(CASE WHEN {_PHASH64_BYTE_SQL[7]} >= 128 "
        f"THEN {_PHASH64_BYTE_SQL[7]} - 256 "
        f"ELSE {_PHASH64_BYTE_SQL[7]} END) * {1 << 56}"
    ]
)


@register(
    "media_phash_near_dups",
    f"""
    WITH f AS (SELECT doc_id AS media_id, sha256(text) AS h FROM documents),
    p AS (SELECT media_id, CAST({_PHASH64_SQL} AS BIGINT) AS phash FROM f
          WHERE h IS NOT NULL)
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
    FROM p a JOIN p b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 1
    ORDER BY id_a, id_b
    """,
    "Perceptual-hash near-dup detection on the MULTIMODAL path: the "
    "decode kernel's feature vector (Arrow mapInPandas, "
    "operators/multimodal.py) quantizes into a 64-bit pHash (8 "
    "most-significant bits per feature — with a real decoder this is "
    "coarse DCT quantization; the stub's features are sha256-dyadic so "
    "DuckDB re-derives the SAME bytes from hex), and Hamming<=1 pairs "
    "come from a pigeonhole BLOCK equi-join (4 16-bit blocks, ~65k keys "
    "each; budget 1 < 4 blocks => recall 1.0 by construction, the "
    "simhash trick) + exact bit_count verify on candidates only — never "
    "the all-pairs theta join the oracle runs. Docs with NULL text have "
    "no decodable content and emit no pairs (NULL join keys) in both "
    "engines.",
)
def media_phash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = MM.extract_media_features(MM.text_as_media(docs))
    # feature i is word_i/2^32 (dyadic): the multiply-back is exact, and
    # its top byte is the feature's 8 most-significant fractional bits
    fbytes = [
        F.shiftright(
            (F.element_at("features", i + 1) * F.lit(4294967296.0)).cast(
                "long"
            ),
            24,
        ).bitwiseAND(F.lit(255))
        for i in range(8)
    ]
    phash = sum(
        [fbytes[i] * F.lit(1 << (8 * i)) for i in range(7)],
        start=F.lit(0),
    ) + (
        F.when(fbytes[7] >= 128, fbytes[7] - F.lit(256)).otherwise(fbytes[7])
        * F.lit(1 << 56)
    )
    # SHUFFLE_HASH pin (the winnowing_overlap_pairs idiom): the block
    # self-join consumes `sig` on BOTH sides, and left unhinted the
    # planner broadcast one side — the two exchanges don't canonicalize
    # equal, so the executed plan ran the decode MapInPandas twice, once
    # per side, doubling the only expensive stage (guide §8: decide on
    # small rows, decode heavy bytes ONCE). Hinting shuffle_hash keys
    # both sides on the SAME hashpartitioning(bi, bv) exchange; the
    # second side is a ReusedExchange at runtime, so the decode runs
    # exactly once — fully lazy, inside the query's own action (a
    # localCheckpoint would run the decode at build time under AQE,
    # outside the timed action). Measured 1.7s -> 1.2s at sf0.1.
    sig = feats.select("media_id", phash.cast("bigint").alias("phash"))
    blocks = sig.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("bi"),
                        F.shiftrightunsigned("phash", 16 * j)
                        .bitwiseAND(F.lit(65535))
                        .alias("bv"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("b"),
    ).select("media_id", "phash", F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv"))
    a = blocks.select(
        F.col("media_id").alias("id_a"), F.col("phash").alias("pa"), "bi", "bv"
    ).hint("shuffle_hash")
    b = blocks.select(
        F.col("media_id").alias("id_b"), F.col("phash").alias("pb"), "bi", "bv"
    ).hint("shuffle_hash")
    cands = (
        a.join(b, ["bi", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pa", "pb")
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming",
            F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).cast("bigint"),
        )
        .filter(F.col("hamming") <= 1)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


def _feature_word_sql(i: int) -> str:
    # feature i = int(hexdigest[8i:8i+8], 16) / 2^32 — the fake decoder's
    # exact arithmetic (operators/multimodal.py:_fake_decode): a 32-bit int
    # divided by 2^32 is dyadic, so the double is identical cross-engine.
    return (
        f"CAST(CAST('0x' || substr(h, {8 * i + 1}, 8) AS BIGINT) AS DOUBLE)"
        f" / 4294967296.0 AS f{i}"
    )


@register(
    "media_feature_extract",
    f"""
    WITH f AS (
      SELECT doc_id AS media_id, sha256(text) AS h,
             octet_length(encode(text)) AS n_bytes
      FROM documents)
    SELECT media_id, h AS content_sha256, n_bytes,
           {', '.join(_feature_word_sql(i) for i in range(8))}
    FROM f ORDER BY media_id
    """,
    "Multimodal feature extraction: binary content -> sha256 + stub feature "
    "vector via Arrow-batched mapInPandas (operators/multimodal.py; decode "
    "kernel stubbed per environment constraints, plumbing real). The vector "
    "is flattened to fixed scalar columns f0..f7 for the check: scalars "
    "canon-sort cleanly and the stub features are dyadic rationals DuckDB "
    "reproduces exactly; the array form stays the internal API.",
)
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = MM.extract_media_features(MM.text_as_media(docs))
    return feats.select(
        "media_id",
        "content_sha256",
        "n_bytes",
        *[F.col("features")[i].alias(f"f{i}") for i in range(8)],
    ).orderBy("media_id")


@register(
    "media_resize_batch",
    """
    SELECT doc_id AS media_id,
           sha256(text || '|64x64') AS resized_sha256,
           64 AS out_width, 64 AS out_height
    FROM documents ORDER BY media_id
    """,
    "Image resize through the multimodal batch path: content replaced by "
    "the resize kernel's output, meta width/height rewritten — 1-row-in/"
    "1-row-out Arrow mapInPandas (operators/multimodal.py resize_images; "
    "kernel pluggable, default deterministic fake = sha256(content|WxH), "
    "which DuckDB re-derives bit-exactly so the whole batch path is "
    "driver-checked). Plan: per-row projection through one Arrow "
    "round-trip, no shuffle before the presentation sort.",
)
def media_resize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    resized = MM.resize_images(MM.text_as_media(docs), 64, 64)
    return resized.select(
        "media_id",
        F.lower(F.hex("content")).alias("resized_sha256"),
        F.col("meta.width").alias("out_width"),
        F.col("meta.height").alias("out_height"),
    ).orderBy("media_id")


@register(
    "media_frame_sample",
    """
    SELECT doc_id AS media_id, CAST(i AS INTEGER) AS frame_idx,
           CAST(i * 2500 AS BIGINT) AS ts_ms,
           sha256(text || '|frame' || i) AS frame_sha256
    FROM (SELECT doc_id, text, CAST(10 * n_chars AS BIGINT) AS dur
          FROM documents),
         LATERAL unnest(range(CAST(ceil(dur / 2500.0) AS BIGINT))) AS t(i)
    ORDER BY media_id, frame_idx
    """,
    "Video frame sampling through the multimodal fan-out path: each fake "
    "video (duration_ms = 10 x n_chars) emits ceil(duration/2500) frame "
    "rows from the Arrow-batched mapInPandas kernel "
    "(operators/multimodal.py sample_video_frames) — the 1-row-in / "
    "N-rows-out batch shape a real ffmpeg kernel needs, driver-checked "
    "because the stub frame is sha256(content|frame_i), which DuckDB "
    "re-derives bit-exactly. Plan: pure per-row fan-out, no shuffle "
    "before the presentation sort; frames-per-row is bounded by "
    "duration, so batch memory is metadata-controlled at any scale.",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
    frames = MM.sample_video_frames(media, every_ms=2500)
    return frames.select(
        "media_id",
        "frame_idx",
        "ts_ms",
        F.lower(F.hex("frame")).alias("frame_sha256"),
    ).orderBy("media_id", "frame_idx")


# ---------------------------------------------------------------------------
# Repetition-based quality filtering (Gopher rules, Rae et al. 2021 §A1.1):
# heavily repetitious text is a strong low-quality signal. Integer counts
# only — ratios stay host-side so the cross-engine hash is exact.
# ---------------------------------------------------------------------------
@register(
    "doc_repetition_stats",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    w AS (SELECT doc_id, len(l) AS n_words,
                 len(list_distinct(l)) AS n_distinct_words FROM t),
    b AS (SELECT doc_id,
                 unnest(list_transform(range(len(l) - 1),
                                       i -> l[i + 1] || ' ' || l[i + 2])) AS bg
          FROM t),
    c AS (SELECT doc_id, bg, COUNT(*) AS c FROM b GROUP BY doc_id, bg),
    a AS (SELECT doc_id, MAX(c) AS top_bigram_count,
                 CAST(SUM(c) AS BIGINT) AS n_bigrams
          FROM c GROUP BY doc_id)
    SELECT w.doc_id, n_words, n_distinct_words,
           CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
           CASE WHEN 5 * COALESCE(top_bigram_count, 0) <= COALESCE(n_bigrams, 0)
                 AND 2 * n_distinct_words > n_words THEN 1 ELSE 0 END AS keep
    FROM w LEFT JOIN a ON w.doc_id = a.doc_id
    ORDER BY w.doc_id
    """,
    "Gopher-style repetition filter: duplicate-word fraction (per-row "
    "codegen'd array ops) + top-bigram share in ONE corpus pass — the "
    "word stats ride the exploded bigram rows as grouping keys through "
    "two grouped aggregates, all shuffles keyed by uniform doc_id (no "
    "word-stats branch, no join; scales to docs too long for per-row "
    "arrays). keep = top bigram <= 20% of bigrams AND "
    "distinct words > 50% — integer comparisons, no float drift.",
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    # ONE corpus pass (r13): the word stats used to live on their own
    # scan + split branch, LEFT-joined back to the bigram aggregate. The
    # per-doc word stats are constants of the doc, so they RIDE the
    # exploded bigram rows as extra grouping keys instead (16 bytes over
    # uniform doc-keyed shuffles), and the join disappears. explode_outer
    # keeps docs with < 2 tokens (no bigrams) as one s=NULL row, so the
    # coalesce(0) semantics of the old left join are preserved exactly:
    # the conditional count gives those groups c=0 -> max/sum read 0.
    # Shingle stitching matches DD.shingle_rows (slice + concat_ws, pure
    # codegen); the when() guard keeps the NULL placeholder row NULL
    # (concat_ws would fold it to '').
    idxs = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(0), F.size(toks) - 2)
    ).otherwise(F.array().cast("array<int>"))
    exploded = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_words"),
        toks.alias("_toks"),
        F.explode_outer(idxs).alias("_i"),
    ).select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        F.when(
            F.col("_i").isNotNull(),
            F.concat_ws(" ", F.slice("_toks", F.col("_i") + 1, 2)),
        ).alias("s"),
    )
    bg_counts = exploded.groupBy(
        "doc_id", "n_words", "n_distinct_words", "s"
    ).agg(F.count(F.when(F.col("s").isNotNull(), 1)).alias("c"))
    stats = bg_counts.groupBy("doc_id", "n_words", "n_distinct_words").agg(
        F.max("c").cast("bigint").alias("top_bigram_count"),
        F.sum("c").cast("bigint").alias("n_bigrams"),
    )
    keep = (
        (F.lit(5) * F.col("top_bigram_count") <= F.col("n_bigrams"))
        & (F.lit(2) * F.col("n_distinct_words") > F.col("n_words"))
    ).cast("int")
    return stats.select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        "n_bigrams",
        "top_bigram_count",
        keep.alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# C4-style repeated-span removal: dedup WITHIN documents at sub-document
# granularity (Raffel et al. 2020 §2.2 removed any three-sentence span
# occurring more than once in C4; this corpus has no sentence boundaries, so
# the unit is a fixed 10-word span). Unlike whole-doc dedup this rewrites
# surviving documents.
# ---------------------------------------------------------------------------
_SPAN_W = 10


@register(
    "span_dedup_docs",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    tot AS (SELECT doc_id, CAST(ceil(len(l) / {_SPAN_W}.0) AS BIGINT) AS n_spans
            FROM t),
    sp AS (SELECT doc_id,
             unnest(list_transform(range(0, CAST(ceil(len(l) / {_SPAN_W}.0) AS BIGINT)),
               i -> struct_pack(idx := i,
                      sp := array_to_string(
                        list_slice(l, i*{_SPAN_W} + 1, i*{_SPAN_W} + {_SPAN_W}),
                        ' ')))) AS s
           FROM t),
    spx AS (SELECT doc_id, s.idx AS span_idx, s.sp AS span, md5(s.sp) AS h,
                   doc_id * 100000000 + s.idx AS pos FROM sp),
    firsts AS (SELECT h, min(pos) AS first_pos FROM spx GROUP BY h),
    kept AS (SELECT doc_id, span_idx, span FROM spx JOIN firsts USING (h)
             WHERE pos = first_pos),
    ka AS (SELECT doc_id, string_agg(span, ' ' ORDER BY span_idx) AS clean_text,
                  COUNT(*) AS n_spans_kept FROM kept GROUP BY doc_id)
    SELECT tot.doc_id, tot.n_spans,
           CAST(COALESCE(ka.n_spans_kept, 0) AS BIGINT) AS n_spans_kept,
           COALESCE(ka.clean_text, '') AS clean_text
    FROM tot LEFT JOIN ka ON tot.doc_id = ka.doc_id
    ORDER BY tot.doc_id
    """,
    f"C4-style repeated-span removal (Raffel 2020 §2.2, {_SPAN_W}-word "
    "spans standing in for three-sentence spans): every non-overlapping "
    "span occurring more than once corpus-wide survives only at its "
    "globally-first (doc_id, span_idx) occurrence; documents are "
    "REASSEMBLED from surviving spans in order (operators/dedup.span_dedup)"
    ". The hash check covers the rewritten text itself, not just counts — "
    "the strongest equality the driver can assert. Three uniform-key "
    "shuffles (md5 span hash ×2, doc id ×1); the only array held is one "
    "doc's surviving spans during reassembly.",
)
def span_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return DD.span_dedup(docs, span_words=_SPAN_W).orderBy("doc_id")


@register(
    "contrastive_negatives",
    """
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    j AS (SELECT unnest(range(0, 4)) AS neg_rank),
    h AS (SELECT d.doc_id, j.neg_rank,
            CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
                 || CAST(j.neg_rank AS VARCHAR)), 1, 8) AS BIGINT) AS hv
          FROM documents d CROSS JOIN j)
    SELECT doc_id, CAST(neg_rank AS BIGINT) AS neg_rank,
           CASE WHEN hv % n = doc_id THEN (hv + 1) % n
                ELSE hv % n END AS neg_doc_id
    FROM h, n ORDER BY doc_id, neg_rank
    """,
    "Deterministic negative sampling for contrastive training pairs: "
    "k=4 pseudo-random partner docs per anchor, drawn by md5(anchor:rank) "
    "mod corpus size (md5 is engine-identical, so the 'random' draw is "
    "reproducible AND oracle-checkable — xxhash64 would not be), "
    "self-collisions bumped to the next id. Contiguous doc_id space makes "
    "the modulus a valid id; a sparse id space would compose this with "
    "global_row_number (operators/ranking.py) as the index. Pure per-row "
    "codegen + a 1-row count broadcast; no shuffle.",
)
def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    j = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("neg_rank")
    h = docs.select("doc_id", j).select(
        "doc_id",
        F.col("neg_rank").cast("bigint").alias("neg_rank"),
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id"), F.col("neg_rank"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("hv"),
    )
    return (
        h.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "neg_rank",
            F.when(
                F.col("hv") % F.col("n") == F.col("doc_id"),
                (F.col("hv") + 1) % F.col("n"),
            )
            .otherwise(F.col("hv") % F.col("n"))
            .alias("neg_doc_id"),
        )
        .orderBy("doc_id", "neg_rank")
    )


@register(
    "frequent_tokens_sketch",
    None,  # freqItems picks are algorithm/partition-order defined —
    #       rows-only; the no-false-negative guarantee (every token with
    #       freq > support*n is present) is pinned in pytest
    "Heavy-hitters sketch over the token stream: DataFrame.stat.freqItems "
    "(Karp et al. collapsing-counters — single pass, map-side mergeable "
    "state of O(1/support) entries, no shuffle of the token stream) at "
    "support=0.01. The sketch family member next to HLL "
    "(approx_distinct_users) and KLL (order_price_approx_percentiles).",
)
def frequent_tokens_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(TX.tokens("text")).alias("token"))
    items = tok.stat.freqItems(["token"], support=0.01).first()[0]
    return spark.createDataFrame(
        [(t,) for t in sorted(items)], "token string"
    )


@register(
    "frequent_tokens_exact",
    """
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
                 FROM documents),
    tot AS (SELECT COUNT(*) AS n_total FROM tok)
    SELECT token, COUNT(*) AS n_tokens
    FROM tok, tot
    GROUP BY token, n_total
    HAVING COUNT(*) * 200 >= n_total
    ORDER BY n_tokens DESC, token
    """,
    "EXACT heavy hitters over the token stream (GROUP BY token HAVING "
    "count*200 >= total — support 0.005 as pure integer arithmetic, no "
    "float threshold to ulp-diverge at the boundary): the oracle-provable "
    "twin of frequent_tokens_sketch, proving the same explode -> "
    "partial-agg plumbing. One uniform token-key shuffle carrying (token, "
    "partial count); the total an unpartitioned window over the "
    "vocabulary-bounded count table. At 100 TB the sketch form "
    "(freqItems, O(1/support) map-side state, no token shuffle) is the "
    "swap-in; this exact form is the audit path and the sketch's "
    "verification harness.",
)
def frequent_tokens_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(TX.tokens("text")).alias("token"))
    # ONE tokenize pass (r13): the grand total is the SUM of the grouped
    # counts — computed as an unpartitioned window over the
    # vocabulary-bounded count table, so the corpus is never exploded a
    # second time AND the plan stays one lazy subtree (a second
    # reference to `counts` — broadcast-total crossJoin or a
    # localCheckpoint — either re-runs the explode per consumer or runs
    # it at build time under AQE; the window keeps everything inside the
    # query's own action). The single-partition window holds only
    # (token, count) vocabulary rows, the same bounded frame the old
    # 1-row broadcast carried. Measured 5.6s -> 0.66s at sf0.1 vs the
    # two-reference form.
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n_tokens"))
    return (
        counts.withColumn(
            "n_total",
            F.sum("n_tokens").over(Window.partitionBy()).cast("bigint"),
        )
        .filter(F.col("n_tokens") * 200 >= F.col("n_total"))
        .select("token", "n_tokens")
        .orderBy(F.desc("n_tokens"), F.asc("token"))
    )


@register(
    "minhash_incremental_dedup",
    f"""
    WITH sh AS (
      SELECT doc_id,
        list_distinct(list_transform(range(0, len(string_split(text,' ')) - 2),
          i -> array_to_string(list_slice(string_split(text,' '), i+1, i+3), ' '))) AS s
      FROM documents),
    sig AS (SELECT doc_id, s, {_minhash_sig_sql(16)} AS g FROM sh),
    bands AS (
      SELECT doc_id, b.band,
        md5(concat_ws('|', g[b.band*4 + 1], g[b.band*4 + 2],
                           g[b.band*4 + 3], g[b.band*4 + 4])) AS key
      FROM sig, (SELECT unnest([0,1,2,3]) AS band) b),
    cand AS (
      SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
      WHERE a.doc_id % 10 = 7 AND b.doc_id % 10 <> 7),
    verified AS (
      SELECT batch_id, corpus_id,
        CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
          / CAST(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)) AS DOUBLE)
          AS jaccard
      FROM cand JOIN sh x ON cand.batch_id = x.doc_id
                JOIN sh y ON cand.corpus_id = y.doc_id)
    SELECT batch_id, corpus_id, jaccard FROM verified
    WHERE jaccard >= 0.05 ORDER BY batch_id, corpus_id
    """,
    "Incremental near-dedup of a new crawl batch (doc_id % 10 = 7) against "
    "the EXISTING corpus's MinHash band index — the steady-state collector "
    "shape at 100 TB: the historical corpus is signature-hashed once "
    "(operators/dedup.minhash_band_index, persistable parquet partitioned "
    "by band), each arriving batch hashes only ITS docs and equi-joins the "
    "stored index; exact-Jaccard verify re-reads corpus text for candidate "
    "ids only (left-semi pushdown). The oracle re-derives both sides' "
    "signatures from scratch — same answer, which is the point: "
    "incremental probing loses nothing. tests/test_incremental_dedup.py "
    "proves the persisted-index round-trip gives identical pairs.",
)
def minhash_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    # Both sides' (id, band, key) rows are slices of the one materialized
    # whole-corpus band index (signatures are per-doc, so a subset's index
    # IS the index filtered to the subset) — the session shares one
    # signature build with minhash_lsh_near_dups instead of re-shingling
    # the corpus per query.
    index = _minhash_band_index_cached(spark, sf_dir)
    corpus_index = index.filter(F.col("id") % 10 != 7)
    batch_index = index.filter(F.col("id") % 10 == 7)
    return DD.incremental_near_dup_pairs(
        corpus_index,
        corpus,
        batch,
        num_hashes=16,
        bands=4,
        threshold=0.05,
        batch_index=batch_index,
    ).orderBy("batch_id", "corpus_id")


def _doc_link_edges(docs: DataFrame, n: int) -> DataFrame:
    """Deterministic synthetic link graph over doc ids: out-degree
    1 + id%3 with targets (7*id+j) mod n for j=1..(1+id%3), plus every
    10th doc linking to doc 0 as a hub edge — irregular by construction
    so the stationary distribution is non-uniform and a top-50 actually
    ranks. Shared by the float operator query and its exact-oracle twin
    (the oracle SQL re-derives the same edges relationally)."""
    edges = docs.select(
        F.col("doc_id").alias("src"),
        F.posexplode(
            F.array(
                *[((F.col("doc_id") * 7 + j) % n).alias(f"d{j}") for j in (1, 2, 3)]
            )
        ).alias("j", "dst"),
    ).filter(F.col("j") < 1 + F.col("src") % 3).select("src", "dst")
    hub = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("src"), F.lit(0).cast("long").alias("dst")
    )
    return edges.unionByName(hub)


@register(
    "doc_link_pagerank",
    None,  # iterative float fixpoint — rows-only; the operator is pinned
    #       against a plain-numpy power iteration in tests/test_pagerank.py
    "PageRank centrality over a deterministic synthetic document link "
    "graph (each doc links to (7*id+j) mod N for j=1..3) — the link-"
    "graph quality signal web-corpus curation weights documents by, "
    "next to the content rules (operators/pagerank.py: per-iteration "
    "one node-keyed shuffle, dangling mass as a broadcast 1-row agg, "
    "lineage truncated via the reliable-checkpoint-capable helper). "
    "Top-50 by rank.",
)
def doc_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pagerank import pagerank

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ranks = pagerank(
        _doc_link_edges(docs, docs.count()), damping=0.85, iters=10, tol=None
    )
    return ranks.orderBy(F.desc("rank"), F.asc("node")).limit(50)


@register(
    "doc_quality_classifier_topk",
    None,  # iterative float GD — rows-only; the trainer is pinned against
    #       a plain-numpy reference in tests/test_quality_classifier.py
    "CCNet/fastText-style quality classifier "
    "(operators/quality_classifier.py): crc32-hashed bag-of-words "
    "features (L2-normalized, 128 buckets), logistic regression trained "
    "by full-batch GD where each epoch is ONE Arrow kernel pass "
    "emitting a per-partition gradient partial (bounded dim+1 vector), "
    "reduced driver-side — corpus never shuffles, epoch plan is "
    "iteration-invariant. Target domain = src0 (the DSIR target, "
    "discriminated instead of ratio-reweighted); returns the top-50 "
    "non-target docs by model keep-probability.",
)
def doc_quality_classifier_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lineage import truncate_lineage
    from ..operators.quality_classifier import (
        hashed_features,
        score_quality,
        train_quality_model,
    )

    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.select(
        "doc_id", "text", (F.col("source") == "src0").cast("int").alias("label")
    )
    feats = truncate_lineage(  # featurize once; every epoch re-reads this
        hashed_features(labeled, dim=128).join(
            labeled.select("doc_id", "label"), "doc_id"
        )
    )
    w = train_quality_model(feats, "label", dim=128, epochs=12)
    scored = score_quality(docs, w, dim=128)
    return (
        scored.join(
            docs.filter(F.col("source") != "src0").select("doc_id"), "doc_id", "left_semi"
        )
        .orderBy(F.desc("quality_score"), F.asc("doc_id"))
        .limit(50)
    )


def _pagerank_exact_oracle(iters: int, scale: int, num: int = 85, den: int = 100) -> str:
    """Unrolled fixed-iteration integer power iteration: every value is
    int64 (shares via floor div, exact integer sums), so DuckDB and Spark
    agree bit-for-bit regardless of summation order — the graph-family
    version of the 1e6-quantization every float oracle here uses."""
    sql = f"""
    WITH dn AS (SELECT COUNT(*) AS n FROM documents),
    edges AS (
        SELECT d.doc_id AS src, (d.doc_id * 7 + j.j) % dn.n AS dst
        FROM documents d CROSS JOIN dn
        CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) j
        WHERE j.j <= 1 + d.doc_id % 3
        UNION ALL
        SELECT d.doc_id AS src, 0 AS dst FROM documents d WHERE d.doc_id % 10 = 0
    ),
    nodes AS (SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT node, {scale} // nn.n AS rank_q FROM nodes CROSS JOIN nn)"""
    prev = "r0"
    for k in range(1, iters + 1):
        sql += f""",
    d{k} AS (SELECT COALESCE(SUM(r.rank_q), 0) AS m
             FROM {prev} r LEFT JOIN outdeg o ON r.node = o.src
             WHERE o.src IS NULL),
    c{k} AS (SELECT e.dst, SUM(r.rank_q // o.deg) AS inflow_q
             FROM {prev} r JOIN outdeg o ON r.node = o.src
             JOIN edges e ON e.src = r.node
             GROUP BY e.dst),
    r{k} AS (SELECT nodes.node,
                    (({den - num} * {scale}) // ({den} * nn.n))
                    + ({num} * (COALESCE(c{k}.inflow_q, 0) + (d{k}.m // nn.n)))
                      // {den} AS rank_q
             FROM nodes CROSS JOIN nn CROSS JOIN d{k}
             LEFT JOIN c{k} ON c{k}.dst = nodes.node)"""
        prev = f"r{k}"
    # CAST the output: the iteration SUMs widen rank_q to HUGEINT, which
    # poisons the driver's value hash (the bug class tests/test_oracle_types.py
    # exists for); values are <= scale so the narrowing is lossless
    return sql + f"""
    SELECT node, CAST(rank_q AS BIGINT) AS rank_q FROM {prev}
    ORDER BY rank_q DESC, node LIMIT 50"""


@register(
    "doc_link_pagerank_exact",
    _pagerank_exact_oracle(iters=5, scale=10**12),
    "Exact-config oracle twin of doc_link_pagerank (the pattern every ANN "
    "probing form here has): fixed-iteration PageRank over the same "
    "synthetic link graph, computed ENTIRELY in int64 units of 1e-12 "
    "(operators/pagerank.pagerank_quantized — shares by integer div, "
    "exact integer sums, damping as (85*x) div 100), so the driver's hash "
    "check covers the graph family's join/agg/dangling/teleport plumbing "
    "bit-for-bit; the float operator stays pinned vs numpy in "
    "tests/test_pagerank.py. Same per-iteration plan shape: one "
    "node-keyed shuffle, broadcast 1-row dangling agg, truncated lineage.",
)
def doc_link_pagerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pagerank import pagerank_quantized

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ranks = pagerank_quantized(
        _doc_link_edges(docs, docs.count()), iters=5, scale=10**12
    )
    return ranks.orderBy(F.desc("rank_q"), F.asc("node")).limit(50)


# Frozen weights for the scoring-path oracle twin: deterministic, modest
# magnitude (|w| <= 0.128 -> |z| <= ~1.1), so the sigmoid never saturates
# and every doc's keep decision sits far from both the 0.5 threshold and
# float-rounding boundaries. Rendered into the oracle SQL via repr() —
# shortest-round-trip decimals that parse to the identical double in both
# engines.
_FROZEN_DIM = 64
_FROZEN_W = [((j * 37) % 101 - 50) / 400.0 for j in range(_FROZEN_DIM)]
_FROZEN_BIAS = 0.05


def _crc32_table() -> list[int]:
    out = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (0xEDB88320 if c & 1 else 0)
        out.append(c)
    return out


def _crc32_sql(expr: str) -> str:
    """DuckDB SQL fragment computing zlib.crc32 of the VARCHAR expression
    ``expr``, built from SQL primitives (DuckDB 1.0 has no crc32
    function): the string is expanded to its UTF-8 BYTES — encode() +
    hex() + two-hex-char slices, NOT per-character code points, which
    agree with the operator's tok.encode('utf-8') hashing only for ASCII
    and would index past the 256-entry table for code points > 255
    (ADVICE r7) — then folded through the standard reflected-polynomial
    table. Byte-equality with zlib.crc32 on non-ASCII text is pinned in
    tests/test_quality_classifier.py."""
    tbl = "[" + ",".join(str(v) for v in _crc32_table()) + "]"
    return f"""xor(list_reduce(
                   list_prepend(4294967295::BIGINT,
                       list_transform(range(1, octet_length(encode({expr})) + 1),
                                      i -> CAST('0x' || substr(hex(encode({expr})),
                                                               2 * i - 1, 2)
                                               AS BIGINT))),
                   (acc, b) -> xor(acc >> 8, ({tbl})[xor(acc & 255, b) + 1])
               ), 4294967295::BIGINT)"""


def _frozen_score_oracle(dim: int, weights: list[float], bias: float) -> str:
    """SQL re-derivation of quality_classifier's scoring path: whitespace
    tokenize + lowercase, CRC32 bucket over UTF-8 bytes (_crc32_sql),
    L2-normalized counts, frozen-weight dot product, sigmoid threshold at
    0.5. The output is the per-doc KEEP DECISION, not the float score: z
    is bounded away from 0 by the weight design, so both engines'
    last-ulp exp() differences can never flip a row."""
    wlist = "[" + ",".join(repr(v) for v in weights) + "]"
    return f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  t -> t <> '')) AS t
        FROM documents
    ),
    hashed AS (
        SELECT doc_id,
               CAST({_crc32_sql("t")} % {dim} AS BIGINT) AS b
        FROM toks
    ),
    counts AS (SELECT doc_id, b, COUNT(*) AS cnt FROM hashed GROUP BY doc_id, b),
    z AS (
        SELECT doc_id,
               SUM(({wlist})[b + 1] * cnt)
                 / sqrt(SUM(CAST(cnt * cnt AS DOUBLE))) AS zr
        FROM counts GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(1.0 / (1.0 + exp(-(COALESCE(z.zr, 0.0) + {bias!r}))) >= 0.5
                AS INT) AS keep
    FROM documents d LEFT JOIN z ON z.doc_id = d.doc_id
    ORDER BY d.doc_id
    """


@register(
    "doc_quality_scored_frozen",
    _frozen_score_oracle(_FROZEN_DIM, _FROZEN_W, _FROZEN_BIAS),
    "Scoring-path oracle twin of doc_quality_classifier_topk: "
    "operators/quality_classifier.score_quality under FROZEN literal "
    "weights (training stays pinned vs numpy GD in "
    "tests/test_quality_classifier.py — iterative float fixpoints don't "
    "hash-compare; the inference path does). Each doc's keep decision "
    "(sigmoid >= 0.5) exercises the full Arrow kernel: whitespace "
    "tokenize, crc32 feature hashing, L2 normalization, dot product, "
    "sigmoid — vs a DuckDB oracle that rebuilds crc32 from SQL "
    "primitives. One mapInPandas projection, no shuffle.",
)
def doc_quality_scored_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from ..operators.quality_classifier import score_quality

    docs = load_table(spark, sf_dir, "documents")
    w = np.array(_FROZEN_W + [_FROZEN_BIAS], dtype=np.float64)
    scored = score_quality(docs, w, dim=_FROZEN_DIM)
    return scored.select(
        "doc_id", (F.col("quality_score") >= 0.5).cast("int").alias("keep")
    ).orderBy("doc_id")


@register(
    "udtf_word_ngrams_topk",
    """
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS ts
        FROM documents
    ),
    grams AS (
        SELECT 2 AS n, ts[i] || ' ' || ts[i + 1] AS ngram
        FROM toks, unnest(range(1, array_length(ts))) AS u(i)
        UNION ALL
        SELECT 3 AS n, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS ngram
        FROM toks, unnest(range(1, array_length(ts) - 1)) AS u(i)
    )
    SELECT n, ngram, COUNT(*) AS cnt
    FROM grams GROUP BY n, ngram
    ORDER BY cnt DESC, n, ngram LIMIT 25
    """,
    "The UDTF surface under a driver hash check (the fifth Python "
    "boundary — functions/tablefuncs.WordNgrams — was pytest-only until "
    "now): LATERAL word_ngrams(text, 2, 3) fans each doc into its word "
    "2/3-grams procedurally, then a corpus-wide top-25 by frequency. "
    "Proves the Arrow-batched UDTF config yields the same rows as the "
    "oracle's relational unnest over split arrays. Generate-free plan on "
    "the Spark side: the expansion happens INSIDE the Python UDTF "
    "boundary, grouped/counted JVM-side after.",
)
def udtf_word_ngrams_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.tablefuncs import register_udtfs

    register_udtfs(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT n, ngram, COUNT(*) AS cnt
        FROM _udtf_docs d, LATERAL word_ngrams(d.text, 2, 3) g
        GROUP BY n, ngram
        ORDER BY cnt DESC, n, ngram
        LIMIT 25
        """
    )


# Registration complete for this module — trigger the driver-window reorder
# (no-op until the LAST registering module finishes; see inventory.py).
from .inventory import _maybe_reorder_registry  # noqa: E402

_maybe_reorder_registry()
