"""Real byte-level image codecs (pure numpy — no PIL/opencv in this
environment) for the multimodal operators.

Two uncompressed formats cover the real-decode path end-to-end:

- **PPM (P6)**: ASCII header ``P6 <w> <h> <maxval>`` (with ``#`` comment
  lines), then ``h*w*3`` raw RGB bytes.
- **BMP (Windows, BITMAPINFOHEADER, 24 bpp, uncompressed)**: 14-byte file
  header + 40-byte info header, pixel rows stored bottom-up in BGR order,
  each row zero-padded to a 4-byte boundary.

These are the pluggable ``decode_fn`` / ``resize_fn`` kernels for
``operators/multimodal.py``: the SAME ``mapInPandas`` plumbing the
oracle-proven queries drive with deterministic fakes runs these against
actual pixels (tests/test_imagecodec.py decodes golden byte fixtures).
Images decode to ``(height, width, 3) uint8`` RGB arrays.

Scale posture is inherited from multimodal.py: kernels run inside Arrow
batches on executors; bytes never reach the driver. A JPEG/PNG/ffmpeg
kernel slots into the identical signatures when those libs exist.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------


def _ppm_header_tokens(b: bytes, n_tokens: int) -> tuple[list[bytes], int]:
    """First ``n_tokens`` whitespace-separated header tokens (skipping
    ``#`` comments), plus the offset of the byte AFTER the single
    whitespace that terminates the last token (where raster data begins)."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < n_tokens:
        if i >= len(b):
            raise ValueError("truncated PPM header")
        c = b[i : i + 1]
        if c == b"#":
            while i < len(b) and b[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(b) and not b[j : j + 1].isspace() and b[j : j + 1] != b"#":
                j += 1
            toks.append(b[i:j])
            i = j
            if len(toks) == n_tokens:
                # exactly ONE whitespace byte separates maxval from raster
                if i >= len(b) or not b[i : i + 1].isspace():
                    raise ValueError("PPM header not terminated by whitespace")
                i += 1
    return toks, i


def decode_ppm(b: bytes) -> np.ndarray:
    """P6 binary PPM -> (h, w, 3) uint8 RGB."""
    toks, off = _ppm_header_tokens(b, 4)
    if toks[0] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {toks[0]!r})")
    w, h, maxval = int(toks[1]), int(toks[2]), int(toks[3])
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    need = h * w * 3
    raster = b[off : off + need]
    if len(raster) < need:
        raise ValueError(f"truncated PPM raster: {len(raster)} < {need}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> P6 binary PPM."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("PPM encoder needs (h, w, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


# ---------------------------------------------------------------------------
# BMP (24 bpp uncompressed, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------


def decode_bmp(b: bytes) -> np.ndarray:
    """24-bpp uncompressed BMP -> (h, w, 3) uint8 RGB. Handles the
    standard bottom-up row order (positive height) and the rarer top-down
    (negative height); rows are padded to 4-byte multiples."""
    if b[:2] != b"BM":
        raise ValueError(f"not a BMP (magic {b[:2]!r})")
    if len(b) < 54:  # 14-byte file header + 40-byte BITMAPINFOHEADER
        # keep the untrusted-bytes contract: every malformed input is a
        # ValueError, never a struct.error leaking from header parsing
        # (fuzz-pinned in tests/test_imagecodec.py)
        raise ValueError(f"truncated BMP header: {len(b)} bytes < 54")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bpp uncompressed supported (bpp={bpp}, comp={compression})")
    top_down = h_raw < 0
    h = abs(h_raw)
    row_bytes = (w * 3 + 3) & ~3  # padded to 4-byte boundary
    need = row_bytes * h
    raster = b[data_off : data_off + need]
    if len(raster) < need:
        raise ValueError(f"truncated BMP raster: {len(raster)} < {need}")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]  # bottom-up -> top-down
    return bgr[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bpp uncompressed bottom-up BMP."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("BMP encoder needs (h, w, 3)")
    row_bytes = (w * 3 + 3) & ~3
    raster = np.zeros((h, row_bytes), dtype=np.uint8)
    raster[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # top-down RGB -> bottom-up BGR
    data_off = 14 + 40
    size = data_off + raster.size
    file_hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, raster.size, 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + raster.tobytes()


# ---------------------------------------------------------------------------
# Format-sniffing decode + kernels matching multimodal.py signatures
# ---------------------------------------------------------------------------


def decode_image(content: bytes) -> np.ndarray:
    """Sniff the magic and decode: P6 PPM or 24-bpp BMP -> RGB array."""
    if content is None or len(content) < 2:
        raise ValueError("empty image payload")
    if content[:2] == b"P6":
        return decode_ppm(content)
    if content[:2] == b"BM":
        return decode_bmp(content)
    raise ValueError(f"unrecognized image magic {content[:2]!r}")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width): pure index gather —
    the sample grid is the pixel-center mapping (i + 0.5) * src/dst."""
    h, w = arr.shape[:2]
    rows = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return arr[rows][:, cols]


def image_resize_fn(content: bytes, width: int, height: int) -> bytes:
    """Real ``resize_fn`` for multimodal.resize_images: decode ->
    nearest-neighbor resample -> re-encode in the SOURCE format."""
    arr = decode_image(content)
    out = resize_nearest(arr, width, height)
    return encode_ppm(out) if content[:2] == b"P6" else encode_bmp(out)


def image_feature_fn(content: bytes) -> list[float]:
    """Real ``decode_fn`` for multimodal.extract_media_features: decode
    pixels and emit 8 floats — per-channel mean and std (RGB, in [0,1])
    plus normalized aspect ratio and mean luma."""
    arr = decode_image(content).astype(np.float64) / 255.0
    means = arr.mean(axis=(0, 1))
    stds = arr.std(axis=(0, 1))
    h, w = arr.shape[:2]
    luma = float(0.2126 * means[0] + 0.7152 * means[1] + 0.0722 * means[2])
    return [
        float(means[0]), float(means[1]), float(means[2]),
        float(stds[0]), float(stds[1]), float(stds[2]),
        w / (w + h),
        luma,
    ]
