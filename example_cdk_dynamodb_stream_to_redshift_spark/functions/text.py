"""Text-analysis column functions for training-data pipelines.

All are compositions of built-in ``pyspark.sql.functions`` (JVM-side,
codegen'd, no Python in the hot path) and have exact DuckDB-SQL oracle
equivalents (see plans/inventory_ml.py). Designed for 100 TB corpora: every
function is a narrow projection over one row — embarrassingly parallel, no
shuffle, no UDF serialization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small fixed stopword list (order matters for determinism of ratios).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# The same list as a quoted SQL IN-list fragment, for DuckDB oracle
# restatements — ONE construction shared by every plan family so oracles
# cannot quietly diverge (r11 review: inventory_ml and staged_r11 had
# grown independent copies).
STOP_SQL = "'" + "','".join(STOPWORDS) + "'"

# Marker words scored by the language-ID heuristic. With a real corpus these
# would be per-language function-word profiles; the mechanism (count marker
# hits per language, argmax with deterministic precedence) is the operator.
LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "les", "et"),
    "es": ("el", "los", "las", "y"),
    "zh": ("de5", "shi4", "le5", "he2"),  # romanized placeholders
}

# BPE-ish token pattern: letter runs, digit runs, single punctuation marks.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (documents are single-space separated)."""
    return F.split(_c(col), " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Regex token count: letter runs + digit runs + punctuation marks."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(TOKEN_PATTERN), 0))


def stopword_count(col: Column | str) -> Column:
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens(col), lambda x: F.array_contains(stops, x)))


def stopword_ratio(col: Column | str) -> Column:
    return stopword_count(col).cast("double") / token_count(col).cast("double")


def avg_token_length(col: Column | str) -> Column:
    c = _c(col)
    # total non-space chars / token count (single double division: exact)
    non_space = F.length(F.regexp_replace(c, " ", ""))
    return non_space.cast("double") / token_count(c).cast("double")


def punct_count(col: Column | str) -> Column:
    return F.size(F.regexp_extract_all(_c(col), F.lit(r"[^A-Za-z0-9\s]"), 0))


def gopher_flags(col: Column | str) -> dict[str, Column]:
    """The Gopher rule set (Rae et al. 2021 Table A1, single-line subset)
    as named boolean expressions — shared by the gopher_filter_docs driver
    query and the streaming ingestion quality stage. Every ratio is an
    exact int/int double division; pure per-row codegen."""
    c = _c(col)
    n_words = token_count(c).cast("bigint")
    mean_wl = avg_token_length(c)
    alpha = F.size(
        F.filter(tokens(c), lambda x: x.rlike("[A-Za-z]"))
    ).cast("double") / n_words.cast("double")
    symbols = (
        F.length(c)
        - F.length(F.regexp_replace(c, "#", ""))
        + F.regexp_count(c, F.lit(r"\.\.\."))
    ).cast("double") / n_words.cast("double")
    return {
        "ok_word_count": (n_words >= 50) & (n_words <= 100000),
        "ok_mean_word_len": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "ok_alpha_words": alpha >= 0.8,
        "ok_symbol_ratio": symbols <= 0.1,
        "ok_stopwords": stopword_count(c).cast("bigint") >= 2,
    }


def gopher_kept(col: Column | str) -> Column:
    """Conjunction of all Gopher rules — the keep predicate a pipeline
    filters on."""
    kept = F.lit(True)
    for flag in gopher_flags(col).values():
        kept = kept & flag
    return kept


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0, 1]: rewards mid-length documents
    with a healthy stopword ratio and low punctuation noise.

    Components (each in [0,1], combined by fixed weights — all arithmetic is
    a deterministic chain of IEEE double ops):
    - length_score: min(n_tokens / 100, 1)
    - stop_score:   1 - |stop_ratio - 0.04| * 5, floored at 0
    - punct_score:  1 - min(punct_count / n_tokens, 1)
    """
    c = _c(col)
    n = token_count(c).cast("double")
    length_score = F.least(n / F.lit(100.0), F.lit(1.0))
    stop_score = F.greatest(
        F.lit(1.0) - F.abs(stopword_ratio(c) - F.lit(0.04)) * F.lit(5.0),
        F.lit(0.0),
    )
    punct_score = F.lit(1.0) - F.least(punct_count(c).cast("double") / n, F.lit(1.0))
    return (
        length_score * F.lit(0.4) + stop_score * F.lit(0.4) + punct_score * F.lit(0.2)
    )


def lang_id(col: Column | str) -> Column:
    """N-gram/function-word language-ID heuristic.

    Scores each candidate language by marker-word hits; returns the argmax
    with deterministic precedence (dict order) on ties, 'und' when no marker
    hits at all.
    """
    toks = tokens(col)
    scores = []
    for lang, markers in LANG_MARKERS.items():
        marr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            (lang, F.size(F.filter(toks, lambda x: F.array_contains(marr, x))))
        )
    best = F.lit("und")
    best_score = F.lit(0)
    # forward order + strict '>' ⇒ earliest dict entry wins ties; score 0 -> 'und'
    for lang, score in scores:
        cond = score > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, score).otherwise(best_score)
    return best


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of the lowercased, trimmed text."""
    return F.md5(F.lower(F.trim(_c(col))))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (basis for MinHash/Jaccard).

    Documents with fewer than ``n`` tokens yield an EMPTY array — matching
    the DuckDB oracle's ``range(0, len - (n-1))`` (empty range). Without the
    guard, ``sequence(0, size-n)`` would generate a descending sequence for
    short docs and ``slice`` would throw, crashing the whole job on one bad
    row."""
    if n < 1:
        raise ValueError(
            f"shingle n must be >= 1 (got {n}); n=0 degenerates every "
            "document to the empty shingle"
        )
    toks = tokens(col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def min_shingle_fingerprint(col: Column | str, n: int = 3) -> Column:
    """Rolling-hash document fingerprint: minimum md5 over word n-gram
    shingles — a 1-hash MinHash signature (locality-sensitive for Jaccard)."""
    return F.array_min(F.transform(shingles(col, n), F.md5))
