"""sources/export_json.py ACCEPTINVCHARS parity: COPY ... ACCEPTINVCHARS ' '
(scripts/initial_load_from_export.sh:168) substitutes each invalid UTF-8
sequence with the given character and KEEPS the row — it does not null the
row's fields. Exercised over raw and gzip files, matching the export format
(DYNAMODB_JSON, gzip)."""

from __future__ import annotations

import gzip

import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.sources.export_json import (
    read_dynamodb_export,
)

# A member item whose memberName carries a lone invalid byte (\xff) and a
# truncated 2-byte sequence (\xc3 at end) — the JSON framing stays ASCII.
_GOOD = (
    b'{"Item":{"pk":{"S":"M_aaa"},"sk":{"S":"alice"},'
    b'"memberId":{"S":"aaa"},"memberName":{"S":"alice"}}}'
)
_BAD = (
    b'{"Item":{"pk":{"S":"M_bbb"},"sk":{"S":"bo\xffb"},'
    b'"memberId":{"S":"bbb"},"memberName":{"S":"bo\xffb\xc3"}}}'
)


def _write(path, raw: bytes, gz: bool):
    data = raw if not gz else gzip.compress(raw)
    path.write_bytes(data)


@pytest.mark.parametrize("gz", [False, True], ids=["raw", "gzip"])
def test_invalid_utf8_substituted_row_kept(spark, tmp_path, gz):
    name = "export.json.gz" if gz else "export.json"
    _write(tmp_path / name, _GOOD + b"\n" + _BAD + b"\n", gz)
    df = read_dynamodb_export(spark, str(tmp_path), accept_inv_chars=" ")
    rows = {r["Item"]["pk"]["S"]: r["Item"] for r in df.collect()}
    assert set(rows) == {"M_aaa", "M_bbb"}  # the malformed row is KEPT
    assert rows["M_aaa"]["memberName"]["S"] == "alice"  # clean rows untouched
    # each invalid sequence became exactly one replacement char
    assert rows["M_bbb"]["sk"]["S"] == "bo b"
    assert rows["M_bbb"]["memberName"]["S"] == "bo b "


def test_default_path_unchanged_for_valid_input(spark, tmp_path):
    _write(tmp_path / "export.json", _GOOD + b"\n", False)
    plain = read_dynamodb_export(spark, str(tmp_path))
    accept = read_dynamodb_export(spark, str(tmp_path), accept_inv_chars=" ")
    assert [r.asDict(True) for r in plain.collect()] == [
        r.asDict(True) for r in accept.collect()
    ]


def test_pipeline_initial_load_copy_option_parity(spark, tmp_path):
    # CdcPipeline.initial_load defaults mirror the reference COPY invocation
    # (ACCEPTINVCHARS ' ' + TRIMBLANKS): a member row with invalid UTF-8 and
    # trailing blanks in its name bootstraps as a kept, repaired, trimmed row.
    import datetime as dt

    from example_cdk_dynamodb_stream_to_redshift_spark.streaming import (
        CdcPipeline,
    )

    export_dir = tmp_path / "export"
    export_dir.mkdir()
    rows = [
        _GOOD,
        # bo\xffb + trailing blanks: ACCEPTINVCHARS repairs, TRIMBLANKS trims
        (
            b'{"Item":{"pk":{"S":"M_bbb"},"sk":{"S":"bo\xffb   "},'
            b'"memberId":{"S":"bbb"},"memberName":{"S":"bo\xffb   "}}}'
        ),
        b'{"Item":{"pk":{"S":"Q_q1"},"sk":{"S":"Walk"},"questId":{"S":"q1"}}}',
        (
            b'{"Item":{"pk":{"S":"MQ#M_aaa"},"sk":{"S":"MQ_mq1"},'
            b'"questId":{"S":"q1"},"dollarsEarned":{"N":"10.00"}}}'
        ),
    ]
    (export_dir / "p0.json").write_bytes(b"\n".join(rows) + b"\n")
    pipe = CdcPipeline(
        spark, str(tmp_path / "stream"), str(tmp_path / "wh")
    )
    pipe.initial_load(str(export_dir), sync_ts=dt.datetime(2023, 1, 1))
    members = {r.memberId: r.memberName for r in pipe.table("member").collect()}
    assert members == {"aaa": "alice", "bbb": "bo b"}  # repaired AND trimmed


def test_rejects_multichar_replacement(spark, tmp_path):
    _write(tmp_path / "export.json", _GOOD + b"\n", False)
    with pytest.raises(ValueError, match="single replacement character"):
        read_dynamodb_export(spark, str(tmp_path), accept_inv_chars="  ")
