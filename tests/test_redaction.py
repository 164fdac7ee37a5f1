"""PII scrub (operators/redaction.py): detector counts vs Python's re
on hand-built and fixture text, typed placeholders, idempotence, order
independence between kinds, and the no-UDF plan shape."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.redaction import (
    KINDS,
    PII_PATTERNS,
    pii_stats,
    redact,
    scrub,
)

CASES = [
    ("contact a.smith+spam@mail.example.co.uk today", {"email": 1}),
    ("server at 10.0.42.7 and 192.168.1.255, version 1.2.3.4.5 is not an ip",
     {"ipv4": 2}),
    ("call +1 415-555-0133 or (020) 7946 0958", {"phone": 2}),
    ("card 4111 1111 1111 1111 expires soon", {"card": 1}),
    ("ssn 078-05-1120 leaked", {"ssn": 1}),
    ("iban DE89370400440532013000 on file", {"iban": 1}),
    ("clean text with numbers 12345 and date 2024-01-02", {}),
    (None, {}),
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CASES)], "id long, text string"
    )


def test_counts_per_kind(spark):
    got = {r["id"]: r for r in pii_stats(_df(spark), "text").collect()}
    for i, (_, want) in enumerate(CASES):
        for kind in KINDS:
            assert got[i][f"pii_{kind}"] == want.get(kind, 0), (
                i, kind, CASES[i][0]
            )
        assert got[i]["pii_total"] == sum(want.values())


def _py_luhn(span: str) -> bool:
    ds = [int(ch) for ch in reversed(re.sub(r"[ \-]", "", span))]
    total = 0
    for i, d in enumerate(ds):
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def _py_scrub_counts(text: str) -> tuple[dict, str]:
    """Independent Python mirror of the sequential scrub: per-kind
    counts of the spans actually replaced, and the scrubbed text."""
    cur = text or ""
    counts = {}
    for kind, pat, repl in PII_PATTERNS:
        if kind == "card":
            n = 0

            def _sub(m):
                nonlocal n
                if _py_luhn(m.group(0)):
                    n += 1
                    return repl
                return m.group(0)

            cur = re.sub(pat, _sub, cur)
            counts[kind] = n
        else:
            counts[kind] = len(re.findall(pat, cur))
            cur = re.sub(pat, repl, cur)
    return counts, cur


def test_counts_and_scrub_match_python_re_on_documents_fixture(spark):
    """Same regexes + same sequential/Luhn semantics, independent
    engine: Java and Python agree on counts AND scrubbed text for every
    fixture document (the patterns deliberately avoid syntax the two
    engines read differently). The raw corpus is detector-free
    (pinned in tests/test_staged_r10.py), which would make this check
    vacuous — so every document is SEEDED with one span per kind plus
    the adversarial shapes (a Luhn-invalid run, a valid span embedded
    in a longer invalid run) before comparing (r9 review finding)."""
    from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" mail u"),
            F.col("doc_id").cast("string"),
            F.lit(
                "@x.org call +44 20 7946 0958 pay 4111 1111 1111 1111"
                " ref 4111 1111 1111 1112 tracking"
                " 123-4111 1111 1111 1111 ssn 078-05-1120 at 10.2.3."
            ),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(" iban GB82WEST12345698765432 done"),
        ).alias("text"),
    )
    got = {
        r["doc_id"]: ({k: r[f"pii_{k}"] for k in KINDS}, r["scrubbed"])
        for r in pii_stats(seeded, "text")
        .withColumn("scrubbed", scrub("text"))
        .collect()
    }
    nonzero = 0
    for row in seeded.select("doc_id", "text").collect():
        want_counts, want_text = _py_scrub_counts(row["text"])
        assert got[row["doc_id"]][0] == want_counts, row["doc_id"]
        assert got[row["doc_id"]][1] == want_text, row["doc_id"]
        nonzero += sum(want_counts.values()) > 0
    assert nonzero == seeded.count()  # the check is not vacuous


def test_redaction_replaces_with_typed_placeholders(spark):
    df = spark.createDataFrame(
        [("mail a@b.com from 1.2.3.4 card 4111-1111-1111-1111",)],
        "text string",
    )
    out = redact(df, "text", keep_original=True).collect()[0]
    assert out["text"] == "mail <EMAIL> from <IP> card <CARD>"
    assert out["text_raw"].startswith("mail a@b.com")
    assert out["pii_email"] == 1 and out["pii_ipv4"] == 1 and out["pii_card"] == 1


def test_redaction_is_idempotent(spark):
    df = _df(spark).filter(F.col("text").isNotNull())
    once = sorted(
        r["text"] for r in df.select(scrub("text").alias("text")).collect()
    )
    twice = sorted(
        r["text"]
        for r in df.select(scrub(scrub("text")).alias("text")).collect()
    )
    assert once == twice
    # placeholders themselves trigger no detector
    ph = spark.createDataFrame(
        [("<EMAIL> <IP> <CARD> <SSN> <PHONE> <IBAN>",)], "text string"
    )
    assert pii_stats(ph, "text").collect()[0]["pii_total"] == 0


def test_card_not_half_eaten_by_phone(spark):
    """Ordering contract: the 16-digit card redacts as ONE <CARD>, not a
    phone prefix plus digit residue."""
    df = spark.createDataFrame([("pay 4111 1111 1111 1111 now",)], "text string")
    assert df.select(scrub("text").alias("t")).collect()[0]["t"] == (
        "pay <CARD> now"
    )


def test_plan_is_pure_projection_without_python(spark, tmp_path):
    src = str(tmp_path / "docs")
    spark.createDataFrame([("a@b.com", 1)], "text string, id long").write.parquet(src)
    out = redact(spark.read.parquet(src), "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan


def test_nulls_pass_through(spark):
    out = redact(_df(spark), "text").filter(F.col("text").isNull()).collect()
    assert len(out) == 1 and out[0]["pii_total"] == 0


@pytest.mark.parametrize("kind,pat", [(k, p) for k, p, _ in PII_PATTERNS])
def test_patterns_compile_in_python_too(kind, pat):
    re.compile(pat)  # cross-engine check support: both engines parse them


def test_international_phone_is_phone_once_not_card(spark):
    """A 13-19-digit E.164 number must count and redact ONCE as
    <PHONE> — the card pattern previously also matched the digit run,
    double-counting pii_total and scrubbing to '+<CARD>' (r8 review
    finding)."""
    df = spark.createDataFrame(
        [("reach me at +8613912345678 thanks",)], "text string"
    )
    row = redact(df, "text").collect()[0]
    assert row["pii_phone"] == 1 and row["pii_card"] == 0
    assert row["pii_total"] == 1
    assert row["text"] == "reach me at <PHONE> thanks"
    # a bare (unprefixed) card-shaped run still counts as card
    df2 = spark.createDataFrame([("pay 4111111111111111 ok",)], "text string")
    row2 = redact(df2, "text").collect()[0]
    assert row2["pii_card"] == 1 and row2["pii_phone"] == 0
    assert row2["text"] == "pay <CARD> ok"


def test_card_detector_is_luhn_gated(spark):
    """The shape pattern alone fires on ANY 13-19-digit grouped run, so
    long numeric order-ids redacted as <CARD> (r8 verdict nit). The
    mod-10 residual keeps real PANs redacting while invalid-Luhn runs
    pass through untouched."""
    valid = "4111 1111 1111 1111"        # classic Luhn-valid test PAN
    invalid = "4111 1111 1111 1112"      # same shape, fails mod-10
    order_id = "9400111899560000000000"  # carrier-tracking-shaped, 22 digits
    df = spark.createDataFrame(
        [(0, f"pay {valid} now"), (1, f"order {invalid} shipped"),
         (2, f"track {order_id} here")],
        "id long, text string",
    )
    rows = {r["id"]: r for r in redact(df, "text").collect()}
    assert rows[0]["pii_card"] == 1 and rows[0]["text"] == "pay <CARD> now"
    assert rows[1]["pii_card"] == 0
    assert rows[1]["text"] == f"order {invalid} shipped"  # preserved
    # >19 digits never matched the shape in the first place
    assert rows[2]["pii_card"] == 0 and order_id in rows[2]["text"]
    # python mirror agrees on all three
    for i, txt in [(0, f"pay {valid} now"), (1, f"order {invalid} shipped"),
                   (2, f"track {order_id} here")]:
        counts, text = _py_scrub_counts(txt)
        assert counts["card"] == rows[i]["pii_card"]
        assert text == rows[i]["text"]


def test_valid_span_inside_longer_invalid_run_survives(spark):
    """The fold-back literal replace must fire only where the scanning
    regex produced the span as a MAXIMAL candidate: a Luhn-valid
    16-digit span embedded in a longer separator-grouped run (itself a
    Luhn-invalid 19-digit candidate) must survive verbatim, exactly as
    the Python mirror and the sequential-count contract say (r9 review
    finding, was: 'ref 123-<CARD> end' with pii_total lying about the
    second insertion)."""
    txt = ("use 4111 1111 1111 1111 ok ref 123-4111 1111 1111 1111 end"
           " tail 4111 1111 1111 1111-77 x")
    df = spark.createDataFrame([(txt,)], "text string")
    row = redact(df, "text").collect()[0]
    counts, want = _py_scrub_counts(txt)
    assert row["text"] == want
    assert row["text"] == ("use <CARD> ok ref 123-4111 1111 1111 1111 end"
                           " tail 4111 1111 1111 1111-77 x")
    assert row["pii_card"] == counts["card"] == 1
    assert row["pii_total"] == 1


def test_counted_cards_are_always_scrubbed(spark):
    """Counts and text must come from the SAME match set: every
    Luhn-valid candidate the scanner counts is replaced, including
    adjacent PANs and a PAN followed by space+digits — the shapes the
    previous lookaround approximation left UNSCRUBBED while pii_card
    claimed them masked (r9 review finding 2, confirmed by
    execution: counted PII leaking into 'scrubbed' text is the worst
    failure mode a scrub can have)."""
    cases = [
        "pay 4111 1111 1111 1111 4111 1111 1111 1111 now",
        "card 4111 1111 1111 1111 20250815 end",
        "at 4111 1111 1111 1111 1234 Main St",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(cases)],
                               "id long, text string")
    rows = {r["id"]: r for r in redact(df, "text").collect()}
    for i, txt in enumerate(cases):
        counts, want = _py_scrub_counts(txt)
        assert rows[i]["text"] == want, (i, txt)
        assert rows[i]["pii_card"] == counts["card"], (i, txt)
        # the invariant itself: no digit run the scanner counted as a
        # valid card survives in the output
        assert "4111 1111 1111 1111" not in rows[i]["text"], (i, txt)


def test_cross_kind_overlap_counts_once(spark):
    """A span matching two detectors must count ONCE, for the kind that
    actually masks it: the card-digit email localpart counted as both
    email and card (pii_total=2 for one masked span), overstating
    leakage for quarantine thresholds keyed on pii_total (ADVICE r8).
    Counts now mirror the sequential replacement."""
    df = spark.createDataFrame(
        [("mail 4111111111111111@x.com please",)], "text string"
    )
    row = redact(df, "text").collect()[0]
    assert row["pii_email"] == 1
    assert row["pii_card"] == 0  # already masked by the email stage
    assert row["pii_total"] == 1
    assert row["text"] == "mail <EMAIL> please"


def test_caller_columns_named_like_working_columns_survive(spark):
    """The staged implementation's working columns must not shadow (and
    silently destroy) caller columns of the same name (r9 review: an
    input `_stage` column vanished from redact()'s output)."""
    df = spark.createDataFrame(
        [("a@b.com", "keepme", "alsome", "metoo")],
        "text string, _stage string, _card_matches string, _card_n_valid string",
    )
    for out in (redact(df, "text", keep_original=True), pii_stats(df, "text")):
        row = out.collect()[0]
        assert row["_stage"] == "keepme"
        assert row["_card_matches"] == "alsome"
        assert row["_card_n_valid"] == "metoo"
    assert redact(df, "text").collect()[0]["text"] == "<EMAIL>"


def test_unicode_digits_agree_across_engines(spark):
    """\\d is ASCII in Java but Unicode in Python — the patterns spell
    [0-9] explicitly so BOTH engines count Unicode-digit lookalikes as
    zero (r8 review finding): the audit can never claim a redaction the
    scrub didn't make."""
    txt = "٠٧٨-٠٥-١١٢٠"  # ٠٧٨-٠٥-١١٢٠
    df = spark.createDataFrame([(txt,)], "text string")
    row = pii_stats(df, "text").collect()[0]
    assert row["pii_total"] == 0
    for kind, pat, _ in PII_PATTERNS:
        assert len(re.findall(pat, txt)) == row[f"pii_{kind}"] == 0
