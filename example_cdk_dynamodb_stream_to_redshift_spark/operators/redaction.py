"""PII detection and redaction over text columns — the scrub pass a
training-data pipeline runs before a corpus is allowed anywhere near a
model, expressed entirely as JVM-side regex expressions (zero Python
boundary: ``regexp_count`` / ``regexp_replace`` stay inside whole-stage
codegen, so the scrub is a pure projection over the corpus scan — no
shuffle, no UDF, scale-invariant by construction).

Detectors are deliberately PATTERN-BASED and conservative: emails,
IPv4 addresses, E.164-ish phone numbers, 13-19-digit card-shaped
numbers, US-SSN-shaped triples, and IBAN-shaped codes. Pattern PII
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


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII kind in the column (0 for NULL text)."""
    pat = dict((k, p) for k, p, _ in PII_PATTERNS)[kind]
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.regexp_count(c, F.lit(pat)), F.lit(0)
    ).cast("bigint")


def scrub(col: Column | str) -> Column:
    """The redacted text: every pattern replaced by its typed
    placeholder, applied in declaration order. Pure codegen expression
    chain — usable inside any larger projection."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_stats(df: DataFrame, col: str) -> DataFrame:
    """Source columns + ``pii_<kind>`` counts + ``pii_total`` — ONE
    projection over the scan (the audit artifact; aggregate it by
    source/domain to see which feeds leak)."""
    out = df
    for kind in KINDS:
        out = out.withColumn(f"pii_{kind}", pii_count(F.col(col), kind))
    total = None
    for kind in KINDS:
        t = F.col(f"pii_{kind}")
        total = t if total is None else total + t
    return out.withColumn("pii_total", total)


def redact(
    df: DataFrame, col: str, keep_original: bool = False
) -> DataFrame:
    """Scrub ``col`` in place (plus per-kind counts from the ORIGINAL
    text, so the caller can quarantine heavy leakers rather than trust
    a heavily-rewritten document). ``keep_original=True`` preserves the
    pre-scrub text under ``<col>_raw`` for audit pipelines."""
    out = pii_stats(df, col)
    if keep_original:
        out = out.withColumn(f"{col}_raw", F.col(col))
    return out.withColumn(col, scrub(F.col(col)))
