"""Round-10 oracle candidates — implemented and DuckDB-proven in round
9, PROMOTED in round 10 (both are now registered: the drift profile via
``plans/inventory_analytics``, the typed scrub via
``plans/inventory_pipeline``; this module stays the implementation home
so the round-9 provenance and oracle construction remain citable).

Round 9 was a zero-slack driver window (the full 50-entry r6 cohort, no
spare slots — COVERAGE.md capacity budget), so these two queries were
deliberately NOT registered then: nothing HERE imports
``inventory.register``. Round 10 owed the 48-entry r7 cohort with <=2
spare slots, earmarked for exactly this pair (r8 verdict item 3):

- ``events_value_drift_profile`` — the drift-monitoring family's first
  driver row: ``operators/drift.profile`` emits exact int64
  ``(column, bucket, cnt)`` histogram rows that a DuckDB
  filtered-count UNION restates directly (declared edges, declared
  categories, NaN/null/other buckets, zero-count buckets
  materialized).
- ``typed_pii_scrub_docs`` — the production typed scrub
  (``operators/redaction.redact``: six detectors, Luhn-gated cards,
  sequential-stage counts) over a corpus deterministically seeded with
  one span per kind plus a doc_id-varying email tail and a
  Luhn-INVALID card-shaped run. The corpus itself contains zero
  detector hits (asserted in tests), so DuckDB restates the scrubbed
  text by CONSTRUCTION (string concat of the typed placeholders) —
  no RE2-vs-Java regex divergence risk, while the md5 of the full
  scrubbed text still value-checks every replacement decision,
  including the invalid-Luhn run surviving verbatim.

The round-10 promotion was mechanical, as planned: each function is
wrapped with ``register(name, STAGED_R10[name][1], ...)`` in its home
module (drift profile -> plans/inventory_analytics, typed scrub ->
plans/inventory_pipeline) and both names sit in the r10 driver window.

Both were foreign-CWD driven against DuckDB at sf0.01 this round; the
sf0.001 equivalence is pinned in tests/test_staged_r10.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.drift import CategoricalProfile, NumericProfile, profile
from ..operators.redaction import KINDS, redact
from ..sources.tables import load_table

# Declared bucketing for the events.value histogram — frozen here, the
# monitoring contract (deriving edges per slice is the drift bug the
# module exists to prevent).
_VALUE_EDGES = (10.0, 50.0, 200.0)
_TYPE_CATEGORIES = ("click", "view", "purchase", "signup")
# 'error' is deliberately NOT declared: it lands in __other__, so the
# driver row exercises the unseen-category path with a nonzero count,
# while value's __nan__/__null__ buckets pin zero-count materialization.


def events_value_drift_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan histogram profile of events: (column, bucket, cnt) with
    the FULL declared support (zero-count buckets included). The plan is
    a single conditional aggregation over one scan — the artifact a
    100 TB monitor persists per slice; PSI then never rescans data."""
    ev = load_table(spark, sf_dir, "events")
    prof = profile(
        ev,
        [
            NumericProfile("value", _VALUE_EDGES),
            CategoricalProfile("event_type", _TYPE_CATEGORIES),
        ],
    )
    return prof.orderBy("column", "bucket")


def _bucket_case_sql() -> str:
    """DuckDB restatement of the declared buckets as filtered counts —
    one UNION ALL branch per declared bucket, so zero-count buckets
    materialize exactly like profile() materializes them."""
    v = "value"
    branches = []
    lo = None
    edges = list(_VALUE_EDGES)
    labels = []
    prev = "-inf"
    for e in edges:
        labels.append((f"[{prev},{e!r})", lo, e))
        lo, prev = e, repr(e)
    labels.append((f"[{prev},inf)", lo, None))
    for lab, lo_e, hi_e in labels:
        conds = [f"{v} IS NOT NULL", f"NOT isnan({v})"]
        if lo_e is not None:
            conds.append(f"{v} >= {lo_e!r}")
        if hi_e is not None:
            conds.append(f"{v} < {hi_e!r}")
        branches.append(
            f"SELECT 'value' AS \"column\", '{lab}' AS bucket, "
            f"count(*) FILTER (WHERE {' AND '.join(conds)}) AS cnt FROM events"
        )
    branches.append(
        "SELECT 'value', '__nan__', count(*) FILTER "
        f"(WHERE isnan({v})) FROM events"
    )
    branches.append(
        "SELECT 'value', '__null__', count(*) FILTER "
        f"(WHERE {v} IS NULL) FROM events"
    )
    cats = ", ".join(f"'{c}'" for c in _TYPE_CATEGORIES)
    for c in _TYPE_CATEGORIES:
        branches.append(
            f"SELECT 'event_type', '{c}', count(*) FILTER "
            f"(WHERE event_type = '{c}') FROM events"
        )
    branches.append(
        "SELECT 'event_type', '__other__', count(*) FILTER "
        f"(WHERE event_type IS NOT NULL AND event_type NOT IN ({cats})) "
        "FROM events"
    )
    branches.append(
        "SELECT 'event_type', '__null__', count(*) FILTER "
        "(WHERE event_type IS NULL) FROM events"
    )
    return (
        "SELECT * FROM (" + " UNION ALL ".join(branches) + ") "
        'ORDER BY "column", bucket'
    )


# Deterministic per-kind PII seeding: every span space-delimited, one
# per kind, plus (doc_id % 3) extra emails and one Luhn-INVALID
# card-shaped run that must survive the scrub verbatim.
_VALID_PAN = "4111 1111 1111 1111"    # mod-10 valid (classic test PAN)
_INVALID_PAN = "4111 1111 1111 1112"  # same shape, fails mod-10


def _seed_suffix_spark(doc_id: F.Column) -> F.Column:
    did = doc_id.cast("string")
    return F.concat(
        F.lit(" reach user"),
        did,
        F.lit("@mail.example.org or +1 415-555-0133 card "),
        F.lit(_VALID_PAN),
        F.lit(" ref "),
        F.lit(_INVALID_PAN),
        F.lit(" ssn 078-05-1120 ip 10.0."),
        (doc_id % 256).cast("string"),
        F.lit(".7 iban DE89370400440532013000 end"),
        F.expr(
            "repeat(concat(' alt', cast(doc_id AS string), "
            "'@example.com'), cast(doc_id % 3 AS int))"
        ),
    )


def typed_pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION typed scrub (operators/redaction.redact — six
    detectors, Luhn-gated cards, sequential-stage counts) driven over a
    deterministically seeded corpus: doc_id, md5 of the fully scrubbed
    text, the six per-kind counts, and pii_total. Pure codegen
    projection — shuffle-free at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(F.col("text"), _seed_suffix_spark(F.col("doc_id"))).alias(
            "text"
        ),
    )
    out = redact(seeded, "text")
    return out.select(
        "doc_id",
        F.md5("text").alias("clean_md5"),
        *[F.col(f"pii_{k}") for k in KINDS],
        "pii_total",
    ).orderBy("doc_id")


def _typed_scrub_sql() -> str:
    scrubbed_suffix = (
        " reach <EMAIL> or <PHONE> card <CARD> ref "
        + _INVALID_PAN
        + " ssn <SSN> ip <IP> iban <IBAN> end"
    )
    return f"""
    SELECT doc_id,
           md5(text || '{scrubbed_suffix}'
                    || repeat(' <EMAIL>', CAST(doc_id % 3 AS INT))) AS clean_md5,
           1 + doc_id % 3 AS pii_email,
           CAST(1 AS BIGINT) AS pii_iban,
           CAST(1 AS BIGINT) AS pii_card,
           CAST(1 AS BIGINT) AS pii_ssn,
           CAST(1 AS BIGINT) AS pii_phone,
           CAST(1 AS BIGINT) AS pii_ipv4,
           6 + doc_id % 3 AS pii_total
    FROM documents ORDER BY doc_id
    """


# name -> (query fn, oracle SQL) — what round 10 registers.
STAGED_R10: dict = {
    "events_value_drift_profile": (
        events_value_drift_profile,
        _bucket_case_sql(),
    ),
    "typed_pii_scrub_docs": (typed_pii_scrub_docs, _typed_scrub_sql()),
}
