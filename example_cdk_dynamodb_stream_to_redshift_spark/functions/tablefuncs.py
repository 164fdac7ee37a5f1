"""Python user-defined table functions (UDTFs) — the fifth Python
boundary next to the four Pandas-UDF flavors (U2): a row-in,
table-out generator callable from SQL via LATERAL joins.

Spark 4 UDTFs complement the engine's Generate-based explodes: where
``F.explode`` needs the rows precomputed as an array column, a UDTF
yields them procedurally — the natural seam for tokenizer-style
expansion logic too stateful for an expression but too row-local for
``mapInPandas``. Arrow-optimized execution
(spark.sql.execution.pythonUDTF.arrow.enabled) batches the boundary;
the terminate() hook supports per-partition flush semantics.

Kernels here are self-contained classes (stdlib-only evals), so
cloudpickle ships them by value — executors never import this module
(the pickle-safety rule every executor-side kernel in this package
follows).
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="n int, start int, ngram string")
class WordNgrams:
    """All word n-grams of ``text`` for n in [lo, hi]: one input row
    fans out to a table of (n, start index, ngram). The UDTF form of
    the shingle generators the dedup family builds as expressions —
    callable straight from SQL:

        SELECT d.doc_id, g.ngram
        FROM documents d, LATERAL word_ngrams(d.text, 2, 3) g
    """

    def eval(self, text: str | None, lo: int = 2, hi: int = 3):
        toks = (text or "").split()
        for n in range(lo, hi + 1):
            for i in range(len(toks) - n + 1):
                yield n, i, " ".join(toks[i : i + n])


@udtf(returnType="sentence string, n_words int")
class SplitSentences:
    """Naive sentence splitter (., !, ? boundaries) with a word count
    per sentence — the row-local text-expansion shape (chunking for
    context windows, per-sentence quality scoring) as a LATERAL-joinable
    table function."""

    def eval(self, text: str | None):
        import re

        for s in re.split(r"(?<=[.!?])\s+", (text or "").strip()):
            s = s.strip()
            if s:
                yield s, len(s.split())


def register_udtfs(spark) -> None:
    """Register the UDTFs for SQL use (idempotent)."""
    spark.udtf.register("word_ngrams", WordNgrams)
    spark.udtf.register("split_sentences", SplitSentences)


__all__ = ["WordNgrams", "SplitSentences", "register_udtfs", "lit"]
