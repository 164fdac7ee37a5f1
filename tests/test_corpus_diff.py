"""Corpus snapshot diff (operators/corpus_diff): DuckDB FULL OUTER JOIN
parity on deterministic mutations of the real documents table, a pure-
Python reference under hypothesis-random corpora (duplicate ids, NULL
text/ids), zero-count summary materialization, and the no-BNLJ plan
shape."""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from example_cdk_dynamodb_stream_to_redshift_spark.operators.corpus_diff import (
    STATUSES,
    corpus_diff,
    diff_summary,
)
from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import load_table

from .conftest import SF_CORRECTNESS as SF_DIR
from .oracle import compare, duckdb_connection

SCHEMA = "doc_id long, text string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_all_statuses_unit(spark):
    old = _df(
        spark,
        [(1, "a"), (2, "b"), (3, "c"), (5, None), (6, None), (None, "ghost")],
    )
    new = _df(
        spark,
        [(1, "a"), (2, "B2"), (4, "d"), (5, None), (6, "real"), (None, "x")],
    )
    got = {
        r["doc_id"]: (r["status"], r["n_old"], r["n_new"])
        for r in corpus_diff(old, new).collect()
    }
    assert got == {
        1: ("unchanged", 1, 1),
        2: ("changed", 1, 1),
        3: ("removed", 1, 0),
        4: ("added", 0, 1),
        5: ("unchanged", 1, 1),  # NULL -> NULL compares equal (null-safe)
        6: ("changed", 1, 1),  # NULL -> real text is a content change
    }  # NULL ids carry no identity -> dropped from both sides


def test_fingerprint_normalization_matches_ingester(spark):
    """Case/whitespace-only edits are NOT changes — the same equivalence
    the exact-dedup ingestion key uses."""
    old = _df(spark, [(1, "  Hello World ")])
    new = _df(spark, [(1, "hello world")])
    [row] = corpus_diff(old, new).collect()
    assert row["status"] == "unchanged"


def test_duplicate_ids_visible_not_multiplied(spark):
    old = _df(spark, [(1, "a"), (1, "a"), (2, "x")])
    new = _df(spark, [(1, "a"), (2, "x"), (2, "y")])
    got = {
        r["doc_id"]: (r["status"], r["n_old"], r["n_new"])
        for r in corpus_diff(old, new).collect()
    }
    assert got[1] == ("unchanged", 2, 1)  # dup with agreeing content
    assert got[2] == ("changed", 1, 2)  # dup envelope differs -> changed
    assert len(got) == 2  # one row per id, never a join blow-up


def test_summary_materializes_zero_counts(spark):
    old = _df(spark, [(1, "a")])
    got = [tuple(r) for r in diff_summary(old, old).collect()]
    assert got == [
        ("added", 0),
        ("changed", 0),
        ("removed", 0),
        ("unchanged", 1),
    ]
    assert set(STATUSES) == {s for s, _ in got}


def test_duckdb_parity_on_documents(spark):
    """old = docs with doc_id % 3 != 0; new = docs with doc_id % 5 != 0,
    text rewritten where doc_id % 7 == 0 — deterministic mutations both
    engines restate verbatim."""
    docs = load_table(spark, SF_DIR, "documents")
    old = docs.filter(F_mod(3)).select("doc_id", "text")
    new = docs.filter(F_mod(5)).select(
        "doc_id", F_rewrite().alias("text")
    )
    df = corpus_diff(old, new).orderBy("doc_id")
    path = os.path.join(SF_DIR, "documents.parquet")
    con = duckdb_connection(SF_DIR)
    try:
        compare(
            df,
            con,
            f"""
            WITH old_side AS (
              SELECT doc_id, count(*) AS n_old,
                     min(md5(lower(trim(text)))) AS fmin,
                     max(md5(lower(trim(text)))) AS fmax,
                     count(*) > count(md5(lower(trim(text)))) AS hasnull
              FROM read_parquet('{path}')
              WHERE doc_id % 3 <> 0 AND doc_id IS NOT NULL GROUP BY doc_id),
            new_side AS (
              SELECT doc_id, count(*) AS n_new,
                     min(md5(lower(trim(t)))) AS fmin,
                     max(md5(lower(trim(t)))) AS fmax,
                     count(*) > count(md5(lower(trim(t)))) AS hasnull
              FROM (SELECT doc_id,
                           CASE WHEN doc_id % 7 = 0
                                THEN 'rewritten ' || CAST(doc_id AS VARCHAR)
                                ELSE text END AS t
                    FROM read_parquet('{path}') WHERE doc_id % 5 <> 0)
              WHERE doc_id IS NOT NULL GROUP BY doc_id)
            SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN o.fmin IS NOT DISTINCT FROM n.fmin
                         AND o.fmax IS NOT DISTINCT FROM n.fmax
                         AND o.hasnull = n.hasnull
                        THEN 'unchanged' ELSE 'changed' END AS status,
                   coalesce(o.n_old, 0) AS n_old,
                   coalesce(n.n_new, 0) AS n_new
            FROM old_side o FULL OUTER JOIN new_side n USING (doc_id)
            ORDER BY doc_id
            """,
        )
    finally:
        con.close()


def F_mod(k: int):
    from pyspark.sql import functions as F

    return (F.col("doc_id") % k) != 0


def F_rewrite():
    from pyspark.sql import functions as F

    return F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit("rewritten "), F.col("doc_id").cast("string")),
    ).otherwise(F.col("text"))


def _py_diff(old_rows, new_rows):
    import hashlib

    def side(rows):
        acc: dict[int, list] = {}
        for i, t in rows:
            if i is None:
                continue
            fp = (
                None
                if t is None
                else hashlib.md5(t.strip().lower().encode()).hexdigest()
            )
            acc.setdefault(i, []).append(fp)
        return {
            i: (
                len(fps),
                min((f for f in fps if f is not None), default=None),
                max((f for f in fps if f is not None), default=None),
                any(f is None for f in fps),
            )
            for i, fps in acc.items()
        }

    o, n = side(old_rows), side(new_rows)
    out = {}
    for i in o.keys() | n.keys():
        if i not in o:
            out[i] = ("added", 0, n[i][0])
        elif i not in n:
            out[i] = ("removed", o[i][0], 0)
        else:
            same = (
                o[i][1] == n[i][1]
                and o[i][2] == n[i][2]
                and o[i][3] == n[i][3]  # NULL-fp presence parity
            )
            out[i] = ("unchanged" if same else "changed", o[i][0], n[i][0])
    return out


@given(
    old=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 8)),
            st.one_of(st.none(), st.sampled_from(["a", "b", "A ", " b", "c"])),
        ),
        max_size=12,
    ),
    new=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 8)),
            st.one_of(st.none(), st.sampled_from(["a", "b", "A ", " b", "c"])),
        ),
        max_size=12,
    ),
)
@settings(max_examples=12, deadline=None)
def test_matches_python_reference(spark, old, new):
    got = {
        r["doc_id"]: (r["status"], r["n_old"], r["n_new"])
        for r in corpus_diff(_df(spark, old), _df(spark, new)).collect()
    }
    assert got == _py_diff(old, new)


def test_plan_shape_no_bnlj(spark):
    old = _df(spark, [(1, "a")])
    new = _df(spark, [(1, "a")])
    plan = corpus_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_diff_by_group_unit(spark):
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.corpus_diff import (
        diff_by_group,
    )

    gschema = "doc_id long, text string, source string"
    old = spark.createDataFrame(
        [(1, "a", "web"), (2, "b", "web"), (3, "c", "books")], gschema
    )
    new = spark.createDataFrame(
        # 1 unchanged (and migrated web->books: attributed to NEW side),
        # 2 changed, 3 removed (old-side group), 4 added
        [(1, "a", "books"), (2, "B2", "web"), (4, "d", "web")], gschema
    )
    got = {(r["source"], r["status"]): r["n_docs"]
           for r in diff_by_group(old, new).collect()}
    assert got == {
        ("books", "removed"): 1,
        ("books", "unchanged"): 1,
        ("web", "added"): 1,
        ("web", "changed"): 1,
    }


def test_diff_by_group_duckdb_parity(spark):
    """Same %3/%5/%7 mutations as the per-doc parity test, rolled up by
    the real source column."""
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.corpus_diff import (
        diff_by_group,
    )

    docs = load_table(spark, SF_DIR, "documents")
    old = docs.filter(F_mod(3)).select("doc_id", "text", "source")
    new = docs.filter(F_mod(5)).select("doc_id", F_rewrite().alias("text"), "source")
    df = diff_by_group(old, new)
    path = os.path.join(SF_DIR, "documents.parquet")
    con = duckdb_connection(SF_DIR)
    try:
        compare(
            df,
            con,
            f"""
            WITH old_side AS (
              SELECT doc_id, count(*) AS n_old,
                     min(md5(lower(trim(text)))) AS fmin,
                     max(md5(lower(trim(text)))) AS fmax,
                     count(*) > count(md5(lower(trim(text)))) AS hasnull,
                     max(source) AS g
              FROM read_parquet('{path}')
              WHERE doc_id % 3 <> 0 AND doc_id IS NOT NULL GROUP BY doc_id),
            new_side AS (
              SELECT doc_id, count(*) AS n_new,
                     min(md5(lower(trim(t)))) AS fmin,
                     max(md5(lower(trim(t)))) AS fmax,
                     count(*) > count(md5(lower(trim(t)))) AS hasnull,
                     max(source) AS g
              FROM (SELECT doc_id, source,
                           CASE WHEN doc_id % 7 = 0
                                THEN 'rewritten ' || CAST(doc_id AS VARCHAR)
                                ELSE text END AS t
                    FROM read_parquet('{path}') WHERE doc_id % 5 <> 0)
              WHERE doc_id IS NOT NULL GROUP BY doc_id)
            SELECT CASE WHEN n.doc_id IS NOT NULL THEN n.g ELSE o.g END
                     AS source,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN o.fmin IS NOT DISTINCT FROM n.fmin
                         AND o.fmax IS NOT DISTINCT FROM n.fmax
                         AND o.hasnull = n.hasnull
                        THEN 'unchanged' ELSE 'changed' END AS status,
                   count(*) AS n_docs
            FROM old_side o FULL OUTER JOIN new_side n USING (doc_id)
            GROUP BY 1, 2 ORDER BY 1, 2
            """,
        )
    finally:
        con.close()


def test_null_text_among_duplicate_ids_is_visible(spark):
    """min/max skip NULLs, so the envelope alone cannot distinguish
    {(1,'a'), (1,NULL)} from {(1,'a')} — the NULL-presence flag must
    (r11 advice). Both directions, plus the all-NULL identity."""
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.corpus_diff import (
        corpus_diff,
    )

    def d(rows):
        return _df(spark, rows)

    got = {
        r["doc_id"]: r["status"]
        for r in corpus_diff(
            d([(1, "a"), (1, None), (2, "b"), (3, None)]),
            d([(1, "a"), (2, "b"), (2, None), (3, None)]),
        ).collect()
    }
    assert got == {1: "changed", 2: "changed", 3: "unchanged"}


def test_reserved_output_column_names_rejected(spark):
    """id_col/group_col colliding with a diff output column would produce
    duplicate/ambiguous output columns — fail loudly at construction
    (r11 advice), case-insensitively (the ordering.py convention)."""
    import pytest

    from example_cdk_dynamodb_stream_to_redshift_spark.operators.corpus_diff import (
        corpus_diff,
        diff_by_group,
    )

    df = spark.createDataFrame([(1, "a", "w")], "status long, text string, g string")
    with pytest.raises(ValueError, match="reserved"):
        corpus_diff(df, df, id_col="status")
    df2 = spark.createDataFrame(
        [(1, "a", "w")], "doc_id long, text string, N_DOCS string"
    )
    with pytest.raises(ValueError, match="reserved"):
        diff_by_group(df2, df2, group_col="N_DOCS")


def test_diff_by_group_new_side_null_label_stays_null(spark):
    """A doc present in the new snapshot with a NULL group must land
    under NULL, not be re-attributed to its old-side label."""
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.corpus_diff import (
        diff_by_group,
    )

    gschema = "doc_id long, text string, source string"
    old = spark.createDataFrame([(1, "a", "web")], gschema)
    new = spark.createDataFrame([(1, "a", None)], gschema)
    got = [tuple(r) for r in diff_by_group(old, new).collect()]
    assert got == [(None, "unchanged", 1)]
