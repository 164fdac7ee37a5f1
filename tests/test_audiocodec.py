"""Real byte-level audio decode (operators/audiocodec.py): golden-sample
WAV fixtures, round-trips, nearest-neighbor resampling, and the same
mapInPandas paths the oracle queries prove — driven with ACTUAL PCM
samples instead of the deterministic fakes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.operators import audiocodec as AC
from example_cdk_dynamodb_stream_to_redshift_spark.operators import multimodal as MM

# 4-sample stereo golden signal @ 8 kHz
GOLD = np.array(
    [[0, 100], [-200, 300], [32767, -32768], [-1, 1]], dtype=np.int16
)
GOLD_RATE = 8000


def _wav16(samples: np.ndarray, rate: int, extra_chunk: bytes = b"") -> bytes:
    """Hand-assembled 16-bit PCM WAV, NOT produced by our encoder; an
    optional unknown chunk goes BEFORE fmt/data to exercise skipping."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    n_ch = samples.shape[1]
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    body = (
        b"WAVE"
        + extra_chunk
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


GOLD_WAV = _wav16(GOLD, GOLD_RATE)


def test_wav16_golden_samples():
    samples, rate = AC.decode_wav(GOLD_WAV)
    assert rate == GOLD_RATE
    np.testing.assert_array_equal(samples, GOLD)


def test_unknown_chunks_and_odd_padding_are_skipped():
    # 5-byte LIST payload: spec pads odd chunks with one byte
    wav = _wav16(GOLD, GOLD_RATE, b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00")
    samples, rate = AC.decode_wav(wav)
    assert rate == GOLD_RATE
    np.testing.assert_array_equal(samples, GOLD)


def test_wav8_widens_exactly():
    # unsigned 8-bit: 128 is zero, 0 is -32768, 255 is +32512
    raw = bytes([128, 0, 255, 129])
    fmt = struct.pack("<HHIIHH", 1, 1, 4000, 4000, 1, 8)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    samples, rate = AC.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert rate == 4000
    np.testing.assert_array_equal(
        samples, np.array([[0], [-32768], [32512], [256]], dtype=np.int16)
    )


def test_encode_decode_round_trip():
    rng = np.random.default_rng(7)
    arr = rng.integers(-32768, 32768, size=(37, 2), dtype=np.int16)
    samples, rate = AC.decode_wav(AC.encode_wav(arr, 16000))
    assert rate == 16000
    np.testing.assert_array_equal(samples, arr)
    # mono 1-D input comes back as (n, 1)
    mono, _ = AC.decode_wav(AC.encode_wav(arr[:, 0], 16000))
    np.testing.assert_array_equal(mono, arr[:, :1])


def test_decode_errors_are_loud():
    with pytest.raises(ValueError):
        AC.decode_wav(b"OggS....")  # unsupported format: no silent junk
    with pytest.raises(ValueError):
        AC.decode_wav(GOLD_WAV[:20])  # truncated: fmt/data missing
    # float PCM (format tag 3) is not supported
    bad = bytearray(GOLD_WAV)
    bad[20:22] = (3).to_bytes(2, "little")
    with pytest.raises(ValueError):
        AC.decode_wav(bytes(bad))


def test_resample_nearest_golden():
    up = AC.resample_nearest(GOLD, GOLD_RATE, 2 * GOLD_RATE)
    # 2x upsample with sample-center mapping duplicates each sample
    np.testing.assert_array_equal(up, GOLD.repeat(2, axis=0))
    # downsample back recovers the original
    np.testing.assert_array_equal(
        AC.resample_nearest(up, 2 * GOLD_RATE, GOLD_RATE), GOLD
    )


def _real_media(spark, duration_ms=None):
    rows = [
        (1, GOLD_WAV, ("audio", "wav", None, None, duration_ms, GOLD_RATE)),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_real_resample_through_mapinpandas(spark):
    """The resample_audio plumbing with the real decode->resample->encode
    kernel: output bytes decode to the expected samples at the new rate,
    meta.sample_rate is rewritten, duration_ms survives."""
    out = MM.resample_audio(
        _real_media(spark, duration_ms=1),
        2 * GOLD_RATE,
        resample_fn=AC.make_audio_resample_fn(2 * GOLD_RATE),
    ).collect()
    (row,) = out
    samples, rate = AC.decode_wav(bytes(row["content"]))
    assert rate == 2 * GOLD_RATE
    np.testing.assert_array_equal(samples, GOLD.repeat(2, axis=0))
    assert row["meta"]["sample_rate"] == 2 * GOLD_RATE
    assert row["meta"]["duration_ms"] == 1


def test_real_features_through_mapinpandas(spark):
    """extract_media_features with the real WAV kernel: duration, rate,
    channels, and peak of the golden signal are exact."""
    (row,) = MM.extract_media_features(
        _real_media(spark), decode_fn=AC.audio_feature_fn
    ).collect()
    f = row["features"]
    assert len(f) == 8
    assert f[0] == pytest.approx(4 / GOLD_RATE)  # duration s
    assert f[1] == pytest.approx(GOLD_RATE / 1000.0)
    assert f[2] == 2.0  # channels
    # channel-mean signal is [50, 50, -0.5, 0]/32768 -> peak 50/32768
    assert f[5] == pytest.approx(50 / 32768.0)


def test_real_windows_through_frame_sampling(spark):
    """sample_video_frames run over audio with the real window kernel:
    1 row fans out to ceil(duration/every) windows whose bytes decode to
    the exact sample slices."""
    # 4 samples @ 8 kHz = 0.5 ms; windows of 0.25 ms -> 2 samples each...
    # keep integer ms: pretend duration_ms=2 with 1 ms windows -> 2 rows,
    # each window = 8 samples; our signal has 4, so window 0 gets all 4
    # and window 1 is empty (past-the-end contract).
    out = sorted(
        MM.sample_video_frames(
            _real_media(spark, duration_ms=2),
            every_ms=1,
            frame_fn=AC.make_audio_window_fn(1),
        ).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in out] == [0, 1]
    w0, rate = AC.decode_wav(bytes(out[0]["frame"]))
    assert rate == GOLD_RATE
    np.testing.assert_array_equal(w0, GOLD)  # 8-sample window, 4 available
    w1, _ = AC.decode_wav(bytes(out[1]["frame"]))
    assert w1.shape[0] == 0


# ---------------------------------------------------------------------------
# Untrusted-bytes contract + round-trip property (same posture as the
# image codecs: media columns are arbitrary bytes at corpus scale)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=300, deadline=None)
@given(
    blob=st.binary(max_size=200),
    prefix=st.sampled_from(
        [b"", b"RIFF", b"RIFF\x00\x00\x00\x00WAVE", b"RIFF1234WAVEfmt "]
    ),
)
def test_decode_rejects_garbage_with_valueerror_only(blob, prefix):
    try:
        samples, rate = AC.decode_wav(prefix + blob)
    except ValueError:
        return
    assert samples.ndim == 2 and rate > 0


@settings(max_examples=50, deadline=None)
@given(
    arr=st.integers(min_value=1, max_value=3).flatmap(
        lambda ch: st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=ch,
            max_size=60 * ch,
        ).map(
            lambda v: np.array(v[: len(v) - len(v) % ch], dtype=np.int16).reshape(
                -1, ch
            )
        )
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_round_trip_property(arr, rate):
    samples, got_rate = AC.decode_wav(AC.encode_wav(arr, rate))
    assert got_rate == rate
    np.testing.assert_array_equal(samples, arr)


def test_zero_sample_rate_is_rejected():
    # rate feeds divisions in every kernel; a declared 0 must be a
    # ValueError at decode, never a ZeroDivisionError downstream
    bad = bytearray(GOLD_WAV)
    bad[24:28] = (0).to_bytes(4, "little")  # fmt.sample_rate
    with pytest.raises(ValueError, match="sample rate"):
        AC.decode_wav(bytes(bad))
