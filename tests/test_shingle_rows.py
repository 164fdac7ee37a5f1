"""shingle_rows (operators/dedup.py): the r13 zero-shuffle slice form
must be row-for-row identical to the one-expression semantic reference
(functions.text.shingles — the oracle's ``l[i+1:i+n]`` list slicing) on
every input, and its plan must contain no Exchange/Window at all."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.functions.text import shingles
from example_cdk_dynamodb_stream_to_redshift_spark.operators.dedup import (
    shingle_rows,
)

# repeated separators (empty tokens), leading/trailing spaces, empty
# string, NULL, short docs at/below the shingle width — every way the
# slice arithmetic could diverge from list slicing
ADVERSARIAL = [
    (1, "a  b c"),
    (2, " x y "),
    (3, ""),
    (4, "a b"),
    (5, None),
    (6, "q w e r t"),
    (7, "   "),
    (8, "solo"),
]


def _reference(df, n):
    """The semantic definition: explode the HOF-built shingle array."""
    return df.select(
        F.col("doc_id").alias("id"), F.explode(shingles("text", n)).alias("s")
    )


def _multiset(df):
    return sorted(map(tuple, df.groupBy("id", "s").count().collect()))


def test_matches_semantic_reference_on_adversarial_spacing(spark):
    adv = spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")
    for n in (1, 2, 3, 5):
        got = _multiset(shingle_rows(adv, "text", "doc_id", n))
        want = _multiset(_reference(adv, n))
        assert got == want, f"n={n}"


def test_matches_semantic_reference_on_corpus(spark):
    from .conftest import SF_CORRECTNESS

    from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, SF_CORRECTNESS, "documents")
    for n in (3, 13):
        diff = (
            shingle_rows(docs, "text", "doc_id", n)
            .exceptAll(_reference(docs, n))
            .count()
        )
        assert diff == 0, f"n={n}: {diff} rows diverge"


def test_short_docs_emit_no_rows(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert shingle_rows(df, "text", "doc_id", 3).count() == 0


def test_plan_has_no_exchange_or_window(spark):
    """The point of the r13 form: shingling is a pure per-partition
    projection — the old lead-window form shuffled every (id, pos,
    token) row by doc id, i.e. the whole tokenized corpus."""
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    plan = (
        shingle_rows(df, "text", "doc_id", 3)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "Exchange" not in plan
    assert ") Window" not in plan


def test_bad_n_raises(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        shingle_rows(df, "text", "doc_id", 0)
