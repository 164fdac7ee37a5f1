"""Python UDTFs (functions/tablefuncs.py): DataFrame + SQL LATERAL
invocation, equivalence with the expression-based shingle path, and
edge rows (empty/null text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.functions.tablefuncs import (
    SplitSentences,
    WordNgrams,
    register_udtfs,
)


def test_word_ngrams_dataframe_call(spark):
    out = WordNgrams(F.lit("a b c d"), F.lit(2), F.lit(3)).collect()
    got = {(r["n"], r["start"], r["ngram"]) for r in out}
    assert got == {
        (2, 0, "a b"), (2, 1, "b c"), (2, 2, "c d"),
        (3, 0, "a b c"), (3, 1, "b c d"),
    }


def test_lateral_join_from_sql_matches_explode(spark):
    register_udtfs(spark)
    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "p q"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = {
        (r["doc_id"], r["ngram"])
        for r in spark.sql(
            "SELECT d.doc_id, g.ngram FROM udtf_docs d, "
            "LATERAL word_ngrams(d.text, 2, 2) g"
        ).collect()
    }
    # the expression-based 2-gram path (the dedup family's shingle shape)
    toks = F.split(F.col("text"), " ")
    via_expr = {
        (r["doc_id"], r["ngram"])
        for r in docs.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                    lambda _, i: F.concat_ws(
                        " ",
                        F.element_at(toks, i + 1),
                        F.element_at(toks, i + 2),
                    ),
                )
            ).alias("ngram"),
        )
        .collect()
    }
    assert via_udtf == via_expr  # empty/null docs yield no rows on either path
    assert via_udtf == {(1, "x y"), (1, "y z"), (2, "p q")}


def test_split_sentences(spark):
    rows = SplitSentences(
        F.lit("One two. Three four five! Six?  ")
    ).collect()
    assert [(r["sentence"], r["n_words"]) for r in rows] == [
        ("One two.", 2),
        ("Three four five!", 3),
        ("Six?", 1),
    ]
    assert SplitSentences(F.lit(None).cast("string")).count() == 0
