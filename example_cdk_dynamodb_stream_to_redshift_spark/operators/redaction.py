"""PII detection and redaction over text columns — the scrub pass a
training-data pipeline runs before a corpus is allowed anywhere near a
model, expressed entirely as JVM-side regex expressions (zero Python
boundary: ``regexp_count`` / ``regexp_replace`` stay inside whole-stage
codegen, so the scrub is a pure projection over the corpus scan — no
shuffle, no UDF, scale-invariant by construction).

Detectors are deliberately PATTERN-BASED and conservative: emails,
IPv4 addresses, E.164-ish phone numbers, 13-19-digit card-shaped
numbers (Luhn-checked, so numeric order-ids survive), US-SSN-shaped
triples, and IBAN-shaped codes. Pattern PII
scrubbing is a well-understood floor, not a ceiling — it catches the
formats that appear verbatim in web corpora and leaves NER-grade
entity detection (names, addresses) to model-based tooling outside
this engine's scope; the point here is that the FLOOR costs one
projection at 100 TB. Patterns are ordered most-specific-first so one
kind's replacement cannot destroy evidence of another (cards before
phones: a 16-digit card must not be half-eaten by the phone pattern).

Every kind redacts to a TYPED placeholder (``<EMAIL>``, ``<IP>``, …):
downstream token statistics still see a stable token, and redaction is
IDEMPOTENT — placeholders match none of the patterns, so scrubbing an
already-scrubbed corpus is a no-op (pinned in tests, along with
count/replace equivalence against Python's re on the documents
fixture).

Two consumption modes, mirroring operators/expectations.py:

- ``pii_stats(df, col)``: per-row counts by kind + total, ONE
  projection — the audit artifact (which sources leak, how much).
- ``redact(df, col)``: the scrubbed text (optionally keeping the
  original under ``keep_original``), plus per-kind counts so the
  pipeline can route heavily-leaking rows to quarantine instead of
  keeping a half-scrubbed document.

Relationship to ``plans/inventory_pipeline.scrub_pii``: that is the
driver-ORACLE-checked minimal form (email + one phone shape, untyped
``[PII]`` replacement, hash-compared against DuckDB every rotation of
``pii_scrub_docs``); this module is the full production surface —
typed placeholders, six detectors, idempotence and ordering contracts.
The minimal form stays as registered so its green driver row keeps
proving the regexp_replace plumbing cross-engine; new pipeline code
should use THIS module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (kind, java-regex, placeholder) — ORDER MATTERS: replacements run in
# this sequence, most-specific first. Word-ish boundaries keep the
# digit patterns from firing inside longer digit runs (timestamps,
# ids); the lookarounds are zero-width so they never eat neighbors.
#
# ASCII-EXPLICIT on purpose (r8 review finding): \d and \b are
# ASCII-only in Java regex but Unicode-aware in Python 3, so the
# cross-engine count equivalence the tests pin would silently diverge
# on Unicode digits — every class is spelled [0-9]/[A-Za-z0-9] and
# boundaries are explicit lookarounds in BOTH engines' shared subset.
# The card pattern refuses a leading '+' so a 13-19-digit E.164 phone
# number is counted/redacted ONCE as <PHONE>, never double-counted as
# card+phone or half-eaten into '+<CARD>'.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "iban",
        r"(?<![A-Za-z0-9])[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}(?![A-Za-z0-9])",
        "<IBAN>",
    ),
    (
        "card",
        # 13-19 digits, optionally space/dash-grouped in 3-6-digit runs;
        # a leading '+' marks an international phone number, not a card
        r"(?<![+0-9A-Za-z])(?:[0-9][ \-]?){12,18}[0-9](?![0-9A-Za-z])",
        "<CARD>",
    ),
    (
        "ssn",
        r"(?<![0-9])[0-9]{3}-[0-9]{2}-[0-9]{4}(?![0-9])",
        "<SSN>",
    ),
    (
        "phone",
        # +country or (area) prefixed, 7-12 further digits with
        # separators; requires a prefix marker so plain numbers don't fire
        r"(?<![0-9A-Za-z])(?:\+[0-9]{1,3}[ \-.]?|\([0-9]{2,4}\)[ \-.]?)(?:[0-9][ \-.]?){6,11}[0-9](?![0-9A-Za-z])",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"(?<![0-9.])(?:[0-9]{1,3}\.){3}[0-9]{1,3}(?![0-9.])",
        "<IP>",
    ),
]

KINDS = [k for k, _, _ in PII_PATTERNS]

# The card pattern with its digit run CAPTURED (lookarounds stay
# zero-width outside the group) — regexp_extract_all pulls the
# candidate spans so the Luhn residual can judge each one.
_CARD_EXTRACT = (
    r"(?<![+0-9A-Za-z])((?:[0-9][ \-]?){12,18}[0-9])(?![0-9A-Za-z])"
)


def luhn_valid(m: Column) -> Column:
    """Mod-10 (Luhn, Peterson 1954 — the check digit every real PAN
    carries) over a separator-grouped digit string, as a pure Catalyst
    expression: reverse the digit string, double every second digit
    from the right (subtracting 9 on overflow), and test the sum
    modulo 10. No UDF — transform/aggregate are JVM-side higher-order
    functions, so the no-Python-boundary discipline holds."""
    s = F.reverse(F.regexp_replace(m, r"[ \-]", ""))
    terms = F.transform(
        F.sequence(F.lit(0), F.length(s) - F.lit(1)),
        lambda i: _luhn_term(
            F.ascii(s.substr(i + F.lit(1), F.lit(1))) - F.lit(48), i
        ),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, x: acc + x)
    return total % F.lit(10) == F.lit(0)


def _luhn_term(d: Column, i: Column) -> Column:
    doubled = d * F.lit(2)
    return F.when(
        i % F.lit(2) == F.lit(1),
        F.when(doubled > F.lit(9), doubled - F.lit(9)).otherwise(doubled),
    ).otherwise(d)


def _card_candidates(c: Column) -> Column:
    return F.regexp_extract_all(c, F.lit(_CARD_EXTRACT), 1)


def _card_count(c: Column) -> Column:
    """Occurrences of LUHN-VALID card-shaped runs. The shape pattern
    alone fires on any 13-19-digit separator-grouped run — long numeric
    order-ids redacted as <CARD> (r8 verdict nit); the mod-10 residual
    costs one more codegen expression and cuts those false positives to
    the 1-in-10 that mod-10 admits by chance."""
    return F.size(F.filter(_card_candidates(c), luhn_valid))


def _card_scrub(c: Column) -> Column:
    """Per-match conditional replacement with the SCANNER'S OWN
    segmentation — the JVM-expression equivalent of a re.sub callback.
    ``split(text, pattern)`` yields exactly the inter-match segments of
    the same leftmost-maximal scan that ``regexp_extract_all`` matches
    against (both run successive ``find()`` of the identical regex), so
    rebuilding ``seg0 + decide(m1) + seg1 + decide(m2) + ...`` replaces
    a candidate IFF the scan produced it, with zero positional
    approximation. Two earlier shapes failed exactly there (r9 review,
    both confirmed by execution): a global re-anchored literal replace
    rewrote a valid span INSIDE a longer invalid run, and
    stricter-than-the-scanner lookarounds left adjacent counted PANs
    UNSCRUBBED — counts and text must come from the same match set,
    so now they do by construction. The common no-candidate path is
    ``when(size=0) -> text`` (split/extract arrays stay unevaluated
    per-row only in cost, not in plan — still a pure projection)."""
    matches = _card_candidates(c)
    n_valid = F.size(F.filter(matches, luhn_valid))
    return _card_scrub_from(c, matches, n_valid)


def _card_scrub_from(c: Column, matches: Column, n_valid: Column) -> Column:
    """The scrub core with the candidate array and valid count supplied
    by the caller — `_staged_frame` materializes both as columns so the
    interpreted extraction+Luhn work is shared between the pii_card
    count and the scrub decision instead of re-evaluated per
    reference (r9 review)."""
    repl = dict((k, r) for k, _, r in PII_PATTERNS)["card"]
    pat = dict((k, p) for k, p, _ in PII_PATTERNS)["card"]
    segs = F.split(c, pat, -1)  # limit -1 keeps trailing empty segments
    n = F.size(matches)
    rebuilt = F.aggregate(
        F.sequence(F.lit(1), n),
        F.element_at(segs, 1),
        lambda acc, i: F.concat(
            acc,
            F.when(
                luhn_valid(F.element_at(matches, i)), F.lit(repl)
            ).otherwise(F.element_at(matches, i)),
            F.element_at(segs, i + F.lit(1)),
        ),
    )
    # fast paths keep the expensive interpreted rebuild off the common
    # rows: no valid candidate -> text unchanged (also the NULL and
    # sequence(1,0)-would-count-DOWN guard); ALL candidates valid ->
    # the plain codegen regexp_replace IS the per-match semantics
    # (every maximal match replaced); only MIXED rows rebuild.
    return (
        F.when(F.coalesce(n_valid, F.lit(0)) == 0, c)
        .when(n_valid == n, F.regexp_replace(c, pat, repl))
        .otherwise(rebuilt)
    )


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII kind in the column AS GIVEN (0 for NULL
    text). ``card`` counts only Luhn-valid runs. Single-kind, stage-free
    probe; ``pii_stats`` computes the sequential-scrub-consistent
    counts."""
    c = F.col(col) if isinstance(col, str) else col
    if kind == "card":
        return F.coalesce(_card_count(c), F.lit(0)).cast("bigint")
    pat = dict((k, p) for k, p, _ in PII_PATTERNS)[kind]
    return F.coalesce(
        F.regexp_count(c, F.lit(pat)), F.lit(0)
    ).cast("bigint")


def _scrub_stages(c: Column) -> tuple[list[tuple[str, Column]], Column]:
    """The sequential machinery as ONE expression tree: per kind, the
    count of spans the scrub REPLACES at that stage (evaluated on the
    text after all earlier kinds ran) and the progressively-scrubbed
    text. Counting on the staged text makes ``pii_total`` exactly the
    number of placeholders the scrub inserts — a span matching two
    detectors (e.g. a card-digit email localpart) counts ONCE, for the
    kind that actually masked it, instead of once per detector (ADVICE
    r8). Used by the Column-level ``scrub``; the DataFrame APIs go
    through ``_staged_frame`` instead, which materializes each stage as
    a column so the interpreted card rebuild is never duplicated
    across counts."""
    counts: list[tuple[str, Column]] = []
    for kind, pat, repl in PII_PATTERNS:
        cnt, c = _stage_step(kind, pat, repl, c)
        counts.append((kind, cnt))
    return counts, c


def _stage_step(
    kind: str, pat: str, repl: str, c: Column
) -> tuple[Column, Column]:
    """ONE kind's (replaced-span count, advanced text) — the single
    definition both the expression-tree form (`_scrub_stages`) and the
    materialized-column form (`_staged_frame`) consume, so the
    count/text machinery cannot desynchronize between the Column and
    DataFrame APIs (r9 review)."""
    if kind == "card":
        return (
            F.coalesce(_card_count(c), F.lit(0)).cast("bigint"),
            _card_scrub(c),
        )
    return (
        F.coalesce(F.regexp_count(c, F.lit(pat)), F.lit(0)).cast("bigint"),
        F.regexp_replace(c, pat, repl),
    )


def scrub(col: Column | str) -> Column:
    """The redacted text: every pattern replaced by its typed
    placeholder, applied in declaration order (card spans additionally
    Luhn-gated). Pure codegen expression chain — usable inside any
    larger projection."""
    c = F.col(col) if isinstance(col, str) else col
    return _scrub_stages(c)[1]


def _fresh_name(base: str, taken: set) -> str:
    """A working-column name that cannot shadow (and so destroy) a
    caller's column — the first `_stage` draft silently dropped a
    pre-existing `_stage` input column (r9 review)."""
    name = base
    while name in taken:
        name = "_" + name
    taken.add(name)
    return name


def _staged_frame(df: DataFrame, col: str) -> tuple[DataFrame, str]:
    """The sequential scrub as a chain of MATERIALIZED stage columns:
    each kind's count reads the stage column as of its turn, then the
    stage advances; returns (frame, stage_column_name). Building this
    as one monolithic expression tree inlined the (interpreted,
    CodegenFallback) card rebuild into every downstream count — HOFs
    are excluded from codegen subexpression elimination, so the whole
    card stage re-evaluated per count, measured 3.3x slower on a
    card-bearing corpus (r9). Catalyst's CollapseProject refuses to
    merge projections when that would duplicate non-cheap expressions,
    so the withColumn chain keeps each stage evaluated once per row —
    the card stage additionally materializes its candidate array and
    valid count so extraction+Luhn are shared between the pii_card
    count and the scrub decision. Still a pure projection pipeline: no
    shuffle, no Python."""
    taken = set(df.columns)
    stage_name = _fresh_name("_stage", taken)
    out = df.withColumn(stage_name, F.col(col))
    for kind, pat, repl in PII_PATTERNS:
        stage = F.col(stage_name)
        if kind == "card":
            m_name = _fresh_name("_card_matches", taken)
            nv_name = _fresh_name("_card_n_valid", taken)
            out = out.withColumn(m_name, _card_candidates(stage)).withColumn(
                nv_name, F.size(F.filter(F.col(m_name), luhn_valid))
            )
            cnt = F.coalesce(F.col(nv_name), F.lit(0)).cast("bigint")
            nxt = _card_scrub_from(stage, F.col(m_name), F.col(nv_name))
            out = (
                out.withColumn(f"pii_{kind}", cnt)
                .withColumn(stage_name, nxt)
                .drop(m_name, nv_name)
            )
        else:
            cnt, nxt = _stage_step(kind, pat, repl, stage)
            out = out.withColumn(f"pii_{kind}", cnt).withColumn(
                stage_name, nxt
            )
    total = None
    for kind in KINDS:
        t = F.col(f"pii_{kind}")
        total = t if total is None else total + t
    return out.withColumn("pii_total", total), stage_name


def pii_stats(df: DataFrame, col: str) -> DataFrame:
    """Source columns + ``pii_<kind>`` counts + ``pii_total`` — a pure
    projection pipeline over the scan (the audit artifact; aggregate it
    by source/domain to see which feeds leak). Counts mirror the
    sequential replacement: kind k is counted on the text with kinds
    1..k-1 already scrubbed, so ``pii_total`` equals the number of
    placeholders ``scrub`` inserts even when a span matches several
    detectors."""
    out, stage_name = _staged_frame(df, col)
    return out.drop(stage_name)


def redact(
    df: DataFrame, col: str, keep_original: bool = False
) -> DataFrame:
    """Scrub ``col`` in place, plus the per-kind counts of exactly the
    spans the scrub masks (so the caller can quarantine heavy leakers
    rather than trust a heavily-rewritten document) — the final stage
    column IS the scrubbed text, so counts and text share one
    evaluation. ``keep_original=True`` preserves the pre-scrub text
    under ``<col>_raw`` for audit pipelines."""
    out, stage_name = _staged_frame(df, col)
    if keep_original:
        out = out.withColumn(f"{col}_raw", F.col(col))
    return out.withColumn(col, F.col(stage_name)).drop(stage_name)
