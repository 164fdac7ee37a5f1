"""Persisted sparse inverted (postings) index for the term-keyed retrieval
family (BM25 `bm25_topk_docs`, tf-idf `tfidf_similar_docs`).

Both queries' plans read term-keyed (doc, term, tf) postings; at fixture
scale they rebuild that table per query, but at 100 TB the index is built
ONCE and persisted partitioned by a term hash bucket. A query then prunes
at the STORAGE level to the few buckets its terms hash into — the sparse
twin of `similarity.write_ivf_index`'s cid-partitioned dense layout
(reference analogue: the Redshift MV's DISTKEY/SORTKEY physical layout
hints, sql/create_materialized_view.sql:18).

Bucketing by hash(term) % n_buckets (not raw term) keeps the directory
count bounded and the hot-term skew spread: a boilerplate term shares its
bucket with ~|vocab|/n_buckets others, so one directory never holds a
vocabulary-scale file count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens


def build_postings_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> DataFrame:
    """(tb, term, doc_id, tf): term-frequency postings with the bucket key
    the persisted layout partitions on. One explode + one (doc, term)
    aggregation with map-side partials — the index build is a single
    corpus pass."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(text_col)).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .select(
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("tb"),
            "term",
            "doc_id",
            "tf",
        )
    )


def write_postings_index(index: DataFrame, path: str) -> None:
    """Persist partitioned by term bucket: a probe's `tb IN (...)` becomes
    a storage-level partition prune (only the query terms' bucket
    directories are listed/read — asserted on PartitionFilters in
    tests/test_postings.py)."""
    index.write.mode("overwrite").partitionBy("tb").parquet(path)


def read_postings_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def probe_buckets(
    spark: SparkSession, query_terms: list[str], n_buckets: int = 16
) -> list[int]:
    """Bucket ids for a bounded query-term list — ONE constant-size local
    plan evaluates every term's xxhash64 (no per-term jobs, no Python
    reimplementation of the JVM hash)."""
    rows = (
        spark.createDataFrame([(t,) for t in query_terms], "term string")
        .select(F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("tb"))
        .distinct()
        .collect()
    )
    return sorted(int(r["tb"]) for r in rows)


def probe_postings_index(
    index: DataFrame,
    query_terms: list[str],
    bucket_ids: list[int],
) -> DataFrame:
    """Scan only the probed buckets, then keep exactly the query terms.
    With the index persisted via write_postings_index, the `tb IN`
    predicate is a PartitionFilter (storage prune); `term IN` rides as a
    pushed data filter inside the surviving buckets."""
    return index.filter(
        F.col("tb").isin(*bucket_ids) & F.col("term").isin(*query_terms)
    ).select("term", "doc_id", "tf")
