"""Group-scoped boilerplate pruning (operators/boilerplate.py): pruned
output equals a pure-Python reference (fixed, hypothesis-random, and
the real documents table), the df/ratio boundaries are exact, groups
are isolated (NULL groups included — the null-safe join), delimiters
split literally, and the plan stays on equi-joins."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from example_cdk_dynamodb_stream_to_redshift_spark.operators.boilerplate import (
    prune_frequent_segments,
    segment_docfreq,
)


def _ref(rows, min_docs=2, max_doc_ratio=0.5, delimiter="\n"):
    """The definition, independently restated in pure Python."""
    segs = {d: (t if t is not None else "").split(delimiter) for _, d, t in rows}
    by_group: dict = {}
    for g, d, _ in rows:
        by_group.setdefault(g, []).append(d)
    drop: dict = {}
    for g, docs in by_group.items():
        freq: dict = {}
        for d in docs:
            for s in set(segs[d]):
                freq[s] = freq.get(s, 0) + 1
        drop[g] = {
            s
            for s, n in freq.items()
            if n >= min_docs and n > max_doc_ratio * len(docs)
        }
    out = {}
    for g, d, _ in rows:
        kept = [s for s in segs[d] if s not in drop[g]]
        out[d] = (len(segs[d]), len(kept), delimiter.join(kept))
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        list(rows), "source string, doc_id string, text string"
    )


def _got(df):
    return {
        r["doc_id"]: (r["n_segments"], r["n_segments_kept"], r["clean_text"])
        for r in df.collect()
    }


HEADER, FOOTER = "ACME NEWS NETWORK", "(c) 2024 acme | terms | privacy"
ROWS = [
    ("a", f"a{i}", f"{HEADER}\nstory {i} body text\n{FOOTER}") for i in range(6)
] + [
    ("a", "a9", "an unchromed doc\nwith two lines"),
    # the same chrome ONCE in source b: content there, not boilerplate
    ("b", "b0", f"{HEADER}\nb zero\n{FOOTER}"),
    ("b", "b1", "b one\nplain"),
    ("b", "b2", "b two\nplain"),
]


def test_planted_chrome_is_pruned_and_groups_are_isolated(spark):
    got = _got(prune_frequent_segments(_df(spark, ROWS)))
    assert got == _ref(ROWS)
    assert got["a0"] == (3, 1, "story 0 body text")  # chrome gone in a
    assert got["b0"] == (3, 3, f"{HEADER}\nb zero\n{FOOTER}")  # kept in b


def test_ratio_boundary_is_strict_and_min_docs_floors(spark):
    rows = [
        ("s", "d0", "shared\nzero"),
        ("s", "d1", "shared\none"),
        ("s", "d2", "two"),
        ("s", "d3", "three"),
    ]
    df = _df(spark, rows)
    # df_docs=2 of 4: 2 > 0.5*4 is FALSE -> kept
    assert _got(prune_frequent_segments(df, max_doc_ratio=0.5))["d0"][1] == 2
    # 2 > 0.4*4 -> dropped
    got = _got(prune_frequent_segments(df, max_doc_ratio=0.4))
    assert got["d0"] == (2, 1, "zero") and got == _ref(rows, 2, 0.4)
    # min_docs floor overrides the ratio
    assert (
        _got(prune_frequent_segments(df, min_docs=3, max_doc_ratio=0.4))["d0"][1]
        == 2
    )


def test_fully_boilerplate_null_text_and_null_group(spark):
    rows = [
        ("s", "d0", f"{HEADER}\n{FOOTER}"),
        ("s", "d1", f"{HEADER}\nreal\n{FOOTER}"),
        ("s", "d2", f"{HEADER}\nmore\n{FOOTER}"),
        ("s", "dn", None),  # null text == empty text: one '' segment
        (None, "n0", "null-group chrome\nx"),
        (None, "n1", "null-group chrome\ny"),
        (None, "n2", "z"),
    ]
    got = _got(prune_frequent_segments(_df(spark, rows)))
    assert got == _ref(rows)
    assert got["d0"] == (2, 0, "")  # emptied, still present
    assert got["dn"] == (1, 1, "")  # '' unique here: kept
    # NULL group prunes against itself (null-safe join): 2 of 3 docs
    assert got["n0"] == (2, 1, "x")


def test_literal_delimiter_even_when_regex_special(spark):
    rows = [
        ("s", "d0", "boiler.alpha.tail0"),
        ("s", "d1", "boiler.beta.tail1"),
        ("s", "d2", "boiler.gamma.tail2"),
    ]
    got = _got(prune_frequent_segments(_df(spark, rows), delimiter="."))
    assert got == _ref(rows, delimiter=".")
    assert got["d0"] == (3, 2, "alpha.tail0")


def test_deterministic_across_input_layouts(spark):
    a = _got(prune_frequent_segments(_df(spark, ROWS)))
    b = _got(
        prune_frequent_segments(_df(spark, list(reversed(ROWS))).repartition(7))
    )
    assert a == b


def test_validation_is_loud(spark):
    df = _df(spark, ROWS)
    with pytest.raises(ValueError, match="min_docs"):
        prune_frequent_segments(df, min_docs=1)
    with pytest.raises(ValueError, match="max_doc_ratio"):
        prune_frequent_segments(df, max_doc_ratio=0.0)
    with pytest.raises(ValueError, match="max_doc_ratio"):
        prune_frequent_segments(df, max_doc_ratio=1.5)


def test_docfreq_diagnostic_surfaces_the_chrome(spark):
    top = (
        segment_docfreq(_df(spark, ROWS))
        .filter("source = 'a'")
        .orderBy("df_docs", ascending=False)
        .limit(2)
        .collect()
    )
    assert {r["segment"] for r in top} == {HEADER, FOOTER}
    assert all(r["df_docs"] == 6 for r in top)


def test_plan_stays_on_equi_joins(spark):
    out = prune_frequent_segments(_df(spark, ROWS))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["s", "t", None]),
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd", ""]), max_size=5
            ),
        ),
        min_size=1,
        max_size=12,
    ),
    ratio=st.sampled_from([0.3, 0.5, 0.9]),
    min_docs=st.integers(min_value=2, max_value=4),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_matches_reference_on_random_inputs(spark, data, ratio, min_docs):
    rows = [(g, f"d{i}", "\n".join(lines)) for i, (g, lines) in enumerate(data)]
    got = _got(
        prune_frequent_segments(
            _df(spark, rows), min_docs=min_docs, max_doc_ratio=ratio
        )
    )
    assert got == _ref(rows, min_docs, ratio)


def _store(spark, tmp_path):
    from example_cdk_dynamodb_stream_to_redshift_spark.streaming.boilerplate_maintenance import (
        SegmentDocFreqStore,
    )

    return SegmentDocFreqStore(spark, str(tmp_path / "bp"))


def test_maintained_docfreq_equals_direct_over_ragged_batches(spark, tmp_path):
    """Sum of per-batch distinct-doc counts == the global docfreq when
    docs are batch-unique — the store's never-rescan guarantee."""
    store = _store(spark, tmp_path)
    cuts = [(0, 3), (3, 4), (4, 10)]
    for i, (lo, hi) in enumerate(cuts):
        store.process_batch(_df(spark, ROWS[lo:hi]), i)
    direct = {
        (r["source"], r["h"]): r["df_docs"]
        for r in segment_docfreq(_df(spark, ROWS)).collect()
    }
    maintained = {
        (r["source"], r["h"]): r["df_docs"] for r in store.docfreq().collect()
    }
    assert maintained == direct
    # crash replay: a batch overwrites its own directories, nothing moves
    store.process_batch(_df(spark, ROWS[3:4]), 1)
    assert {
        (r["source"], r["h"]): r["df_docs"] for r in store.docfreq().collect()
    } == direct


def test_store_prune_equals_the_batch_operator(spark, tmp_path):
    store = _store(spark, tmp_path)
    for i, chunk in enumerate([ROWS[:5], ROWS[5:]]):
        store.process_batch(_df(spark, chunk), i)
    got = _got(store.prune(_df(spark, ROWS)))
    assert got == _got(prune_frequent_segments(_df(spark, ROWS)))
    assert got == _ref(ROWS)
    # the drop set itself is inspectable from store state alone
    drops = {
        (r["source"], r["segment"]) for r in store.drop_set().collect()
    }
    # b's "plain" is in 2 of its 3 docs: genuinely over both thresholds
    assert drops == {("a", HEADER), ("a", FOOTER), ("b", "plain")}


def test_store_compaction_preserves_the_answer(spark, tmp_path):
    store = _store(spark, tmp_path)
    for i, (lo, hi) in enumerate([(0, 2), (2, 5), (5, 8), (8, 10)]):
        store.process_batch(_df(spark, ROWS[lo:hi]), i)
    before = {
        (r["source"], r["h"]): r["df_docs"] for r in store.docfreq().collect()
    }
    store.compact(keep_last=0)
    assert {
        (r["source"], r["h"]): r["df_docs"] for r in store.docfreq().collect()
    } == before


def test_real_documents_word_level_pruning_matches_reference(spark):
    """delimiter=' ' turns the operator into corpus-adaptive frequent-
    word pruning per source — runs against the real table and the same
    pure-Python reference."""
    from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = [
        (r["source"], str(r["doc_id"]), r["text"])
        for r in docs.select("source", "doc_id", "text").collect()
    ]
    got = _got(
        prune_frequent_segments(
            docs.withColumn("doc_id", docs["doc_id"].cast("string")),
            delimiter=" ",
            max_doc_ratio=0.8,
        )
    )
    want = _ref(rows, 2, 0.8, " ")
    assert got == want
    # the pruning engaged: some doc lost segments, none lost everything
    assert any(n != k for n, k, _ in got.values())
    assert all(k > 0 for _, k, _ in got.values())