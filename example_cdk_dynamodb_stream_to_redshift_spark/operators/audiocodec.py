"""Real byte-level audio codec (pure numpy — no soundfile/librosa in this
environment) for the multimodal operators: the audio counterpart of
``operators/imagecodec.py``.

One uncompressed format covers the real-decode path end-to-end:

- **WAV (RIFF/WAVE, PCM)**: 12-byte RIFF header, then chunks; the
  ``fmt `` chunk declares PCM (format tag 1), channel count, sample
  rate and bit depth (8 or 16 supported); the ``data`` chunk holds
  interleaved little-endian samples. Unknown chunks (LIST, fact, ...)
  are skipped, including the RIFF odd-size pad byte.

These are the pluggable kernels for ``operators/multimodal.py``: the
SAME ``mapInPandas`` plumbing the oracle-proven queries drive with
deterministic fakes runs these against actual samples
(tests/test_audiocodec.py decodes golden byte fixtures). Audio decodes
to ``(n_samples, n_channels) int16`` (8-bit input is widened exactly:
``(x - 128) * 256``).

Scale posture is inherited from multimodal.py: kernels run inside Arrow
batches on executors; bytes never reach the driver. An MP3/FLAC/ffmpeg
kernel slots into the identical signatures when those libs exist.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM 8/16-bit)
# ---------------------------------------------------------------------------


def _iter_chunks(b: bytes):
    """Yield (chunk_id, payload_offset, payload_size) for every RIFF
    sub-chunk, honoring the spec's pad byte after odd-sized chunks."""
    i = 12  # past "RIFF" <size> "WAVE"
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = struct.unpack_from("<I", b, i + 4)[0]
        yield cid, i + 8, size
        i += 8 + size + (size & 1)


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM -> ((n_samples, n_channels) int16, sample_rate)."""
    if b is None or len(b) < 12:
        raise ValueError("empty WAV payload")
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file (magic {b[:4]!r}/{b[8:12]!r})")
    fmt = None
    data = None
    for cid, off, size in _iter_chunks(b):
        if cid == b"fmt " and fmt is None:
            if size < 16 or off + 16 > len(b):
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", b, off)
        elif cid == b"data" and data is None:
            if off + size > len(b):
                raise ValueError(f"truncated data chunk: {len(b) - off} < {size}")
            data = b[off : off + size]
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, n_ch, rate, _byte_rate, _block_align, bits = fmt
    if tag != 1:
        raise ValueError(f"only PCM (format tag 1) supported, got {tag}")
    if n_ch < 1:
        raise ValueError(f"invalid channel count {n_ch}")
    if rate < 1:
        # rate feeds divisions in every downstream kernel (duration,
        # resampling, windowing) — a declared 0 must fail HERE as the
        # untrusted-bytes ValueError, not later as ZeroDivisionError
        raise ValueError(f"invalid sample rate {rate}")
    if bits == 16:
        samples = np.frombuffer(data[: len(data) & ~1], dtype="<i2").astype(np.int16)
    elif bits == 8:
        # 8-bit WAV is UNSIGNED; widen exactly onto the int16 grid
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
        ) * 256
    else:
        raise ValueError(f"only 8/16-bit PCM supported, got {bits}")
    n = (len(samples) // n_ch) * n_ch
    return samples[:n].reshape(-1, n_ch).copy(), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_samples, n_channels) int16 -> RIFF/WAVE 16-bit PCM bytes."""
    arr = np.ascontiguousarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    if arr.ndim != 2:
        raise ValueError("WAV encoder needs (n_samples, n_channels)")
    n_ch = arr.shape[1]
    data = arr.tobytes()
    block_align = n_ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def resample_nearest(samples: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Nearest-neighbor resample to ``sr_out`` (duration preserved): pure
    index gather on the sample-center mapping (i + 0.5) * in/out — the 1-D
    twin of imagecodec.resize_nearest. Real deployments swap in a
    windowed-sinc kernel; the operator plumbing is identical."""
    n_in = samples.shape[0]
    n_out = int(round(n_in * sr_out / sr_in))
    idx = np.minimum(
        ((np.arange(n_out) + 0.5) * n_in / n_out).astype(np.int64), n_in - 1
    )
    return samples[idx]


# ---------------------------------------------------------------------------
# Kernels matching multimodal.py signatures
# ---------------------------------------------------------------------------


def audio_feature_fn(content: bytes) -> list[float]:
    """Real ``decode_fn`` for multimodal.extract_media_features: decode
    samples and emit 8 floats — duration (s), sample rate (kHz), channel
    count, then mean / RMS / peak / zero-crossing rate / std over the
    channel-averaged signal normalized to [-1, 1]."""
    samples, rate = decode_wav(content)
    x = samples.astype(np.float64).mean(axis=1) / 32768.0
    n = x.shape[0]
    zcr = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))) / max(
        n - 1, 1
    )
    return [
        n / rate,
        rate / 1000.0,
        float(samples.shape[1]),
        float(x.mean()) if n else 0.0,
        float(np.sqrt((x * x).mean())) if n else 0.0,
        float(np.abs(x).max()) if n else 0.0,
        zcr,
        float(x.std()) if n else 0.0,
    ]


def make_audio_resample_fn(sr_out: int):
    """Real ``resample_fn`` factory for multimodal.resample_audio:
    decode -> nearest-neighbor resample -> re-encode PCM16. A factory
    because the kernel signature is ``(content) -> bytes`` and the target
    rate is configuration. Like the imagecodec kernels, this references
    the module's codec functions, so it needs the package importable on
    workers (true whenever the driver runs from the repo root — the
    registry queries never use these; see tests/test_pickle_safety.py)."""

    def kernel(content: bytes) -> bytes:
        samples, rate = decode_wav(content)
        return encode_wav(resample_nearest(samples, rate, sr_out), sr_out)

    return kernel


def make_audio_window_fn(window_ms: int):
    """Real ``frame_fn`` factory for multimodal.sample_video_frames run
    over AUDIO rows: the idx-th ``window_ms`` slice of the decoded signal,
    re-encoded as PCM16 WAV (the fan-out shape an ASR/embedding pipeline
    feeds). Past-the-end windows return an empty-data WAV."""

    def kernel(content: bytes, idx: int) -> bytes:
        samples, rate = decode_wav(content)
        w = (rate * window_ms) // 1000
        chunk = samples[idx * w : (idx + 1) * w]
        return encode_wav(chunk, rate)

    return kernel
