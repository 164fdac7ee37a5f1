"""Group-scoped boilerplate pruning — the line-frequency cleaning pass
web-corpus pipelines run per domain (C4's line-level rules, Raffel et
al. 2020 §2.2; CCNet's shard paragraph dedup, Wenzek et al. 2020;
RefinedWeb's line-wise filtering, Penedo et al. 2023): a segment (line,
paragraph — anything a delimiter splits) that recurs across MANY
DOCUMENTS of the same group is navigation/header/footer chrome, not
content, and every occurrence should go — unlike span_dedup's
keep-first-occurrence semantics, which preserve one copy of genuinely
duplicated CONTENT.

Semantics: a segment is dropped from every doc of group g iff its
document frequency there satisfies BOTH
``df_docs >= min_docs`` AND ``df_docs > max_doc_ratio * n_docs(g)``
(strict >, so "half the docs" at ratio 0.5 survives; the min_docs floor
keeps tiny groups from pruning on a coincidence of two docs).
Frequency counts DOCUMENTS, not occurrences — a segment repeated ten
times inside one doc is that doc's business (span-level repetition is
operators/dedup.span_dedup's job).

Plan shape (100 TB posture): one split + posexplode per doc; document
frequency is distinct(group, segment-md5, id) -> count — two shuffles
on uniform hash-derived keys with map-side partials; the drop set joins
back as a LEFT ANTI on (group, hash) and docs reassemble in order
(collect_list of (idx, segment) structs, array_sort — the span_dedup
recipe, per-doc bounded). The tempting single-pass alternative —
``size(collect_set(id)) OVER (PARTITION BY group, hash)`` — is rejected
deliberately: it materializes the full doc-id set per row on exactly
the hot segments this operator exists to remove (a million-doc domain's
footer = a million-element set per footer row). The group-size side
input is |groups|-bounded and broadcasts.

NULL handling: a NULL group is its own group (Spark groupBy semantics —
"docs with no source" prune against each other, not against everything);
NULL text is treated as empty text (one empty segment, so
``join(split(x, d), d) == x`` round-trips for every non-null input).

Reference tie-in: the reference app (damc-dev/example-cdk-dynamodb-
stream-to-redshift) has no text surface; engine extension for
training-data pipelines per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _validated(min_docs: int, max_doc_ratio: float) -> tuple[int, float]:
    if min_docs < 2:
        raise ValueError(
            f"min_docs must be >= 2 (min_docs={min_docs} would prune "
            "segments unique to a single document — every doc's content)"
        )
    if not (0.0 < max_doc_ratio <= 1.0):
        raise ValueError(
            f"max_doc_ratio must be in (0, 1], got {max_doc_ratio}"
        )
    return int(min_docs), float(max_doc_ratio)


def _segments(
    df: DataFrame, text_col: str, id_col: str, group_cols, delimiter: str
) -> DataFrame:
    """(group..., id, n_segments, segs): one row per doc with its
    ordered segment array (NULL text = empty text)."""
    # split() takes a Java REGEX — \Q...\E quotes the delimiter so "."
    # or "||" split literally; array_join reassembles with the literal
    pattern = "\\Q" + delimiter + "\\E"
    return df.select(
        *group_cols,
        F.col(id_col).alias("id"),
        F.split(F.coalesce(F.col(text_col), F.lit("")), pattern, -1).alias(
            "_segs"
        ),
    )


def segment_docfreq(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_cols: tuple[str, ...] = ("source",),
    delimiter: str = "\n",
) -> DataFrame:
    """``(group..., h, segment, df_docs)`` — per group, how many
    DISTINCT documents contain each segment (``h`` = md5; the segment
    text rides along via any-value for inspection). The diagnostic
    surface: ``ORDER BY df_docs DESC`` is literally "show me this
    domain's boilerplate"."""
    sp = _segments(df, text_col, id_col, group_cols, delimiter).select(
        *group_cols, "id", F.explode("_segs").alias("segment")
    )
    return (
        sp.withColumn("h", F.md5(F.col("segment").cast("binary")))
        .groupBy(*group_cols, "h")
        .agg(
            F.any_value("segment").alias("segment"),
            F.count_distinct(F.col("id")).alias("df_docs"),
        )
        .select(*group_cols, "h", "segment", "df_docs")
    )


def prune_frequent_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_cols: tuple[str, ...] = ("source",),
    delimiter: str = "\n",
    min_docs: int = 2,
    max_doc_ratio: float = 0.5,
) -> DataFrame:
    """Remove every occurrence of group-frequent segments and reassemble
    the survivors in order. Output: ``(id_col, n_segments,
    n_segments_kept, clean_text)`` — docs whose every segment was
    boilerplate come back with ``clean_text = ''`` (same contract as
    span_dedup: the caller decides whether an emptied doc survives)."""
    min_docs, max_doc_ratio = _validated(min_docs, max_doc_ratio)
    base = _segments(df, text_col, id_col, group_cols, delimiter)
    totals = base.select(
        *group_cols, "id", F.size("_segs").alias("n_segments")
    )
    sp = base.select(
        *group_cols, "id", F.posexplode("_segs").alias("seg_idx", "segment")
    ).withColumn("h", F.md5(F.col("segment").cast("binary")))
    # document frequency per (group, segment): distinct docs, counted
    # with map-side partials on the uniform (group, h, id) key
    docfreq = (
        sp.select(*group_cols, "h", "id")
        .distinct()
        .groupBy(*group_cols, "h")
        .agg(F.count(F.lit(1)).alias("_df_docs"))
    )
    n_docs = totals.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n_docs"))
    # group joins are NULL-SAFE (<=>): a NULL group is its own group, so
    # its boilerplate must match its own drop rows — a plain equi-join
    # would silently never prune NULL-group docs
    if group_cols:
        sized = docfreq.join(
            F.broadcast(n_docs),
            [docfreq[c].eqNullSafe(n_docs[c]) for c in group_cols],
        ).drop(*[n_docs[c] for c in group_cols])
    else:
        sized = docfreq.crossJoin(F.broadcast(n_docs))
    drop = sized.filter(
        (F.col("_df_docs") >= min_docs)
        & (
            F.col("_df_docs")
            > F.lit(max_doc_ratio) * F.col("_n_docs").cast("double")
        )
    ).select(*group_cols, "h")
    anti_cond = sp["h"] == drop["h"]
    for c in group_cols:
        anti_cond = anti_cond & sp[c].eqNullSafe(drop[c])
    kept = sp.join(drop, anti_cond, "left_anti")
    reassembled = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_segments_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "segment"))),
                lambda x: x["segment"],
            ),
            delimiter,
        ).alias("clean_text"),
    )
    zero = F.lit(0).cast("bigint")
    return totals.join(reassembled, "id", "left").select(
        F.col("id").alias(id_col),
        F.col("n_segments").cast("bigint").alias("n_segments"),
        F.coalesce("n_segments_kept", zero).alias("n_segments_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )
