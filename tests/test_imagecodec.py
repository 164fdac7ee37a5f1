"""Real byte-level image decode (operators/imagecodec.py): golden-pixel
fixtures for PPM/BMP, round-trips, nearest-neighbor resize, and the same
mapInPandas paths the oracle queries prove — driven with ACTUAL pixels
instead of the deterministic fakes."""

from __future__ import annotations

import numpy as np
import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.operators import imagecodec as IC
from example_cdk_dynamodb_stream_to_redshift_spark.operators import multimodal as MM

# 2x2 golden image: top row red, green; bottom row blue, white
GOLD = np.array(
    [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
    dtype=np.uint8,
)

# hand-written P6 bytes (comment line + maxval), NOT produced by our encoder
GOLD_PPM = (
    b"P6\n# golden fixture\n2 2\n255\n"
    + bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
)

# hand-assembled 24-bpp BMP: 54-byte header, bottom-up BGR rows padded to 4
# bytes (2px*3 = 6 -> 8). File row 0 = image BOTTOM row.
GOLD_BMP = (
    b"BM"                      # magic
    + (70).to_bytes(4, "little")   # file size 54 + 16
    + b"\x00\x00\x00\x00"
    + (54).to_bytes(4, "little")   # pixel data offset
    + (40).to_bytes(4, "little")   # BITMAPINFOHEADER
    + (2).to_bytes(4, "little")    # width
    + (2).to_bytes(4, "little")    # height (positive: bottom-up)
    + (1).to_bytes(2, "little")    # planes
    + (24).to_bytes(2, "little")   # bpp
    + b"\x00" * 24                 # compression..colors-important
    # bottom row: blue (BGR 255,0,0), white (255,255,255), 2 pad bytes
    + bytes([255, 0, 0, 255, 255, 255, 0, 0])
    # top row: red (BGR 0,0,255), green (0,255,0), 2 pad bytes
    + bytes([0, 0, 255, 0, 255, 0, 0, 0])
)


def test_ppm_golden_pixels():
    np.testing.assert_array_equal(IC.decode_ppm(GOLD_PPM), GOLD)
    np.testing.assert_array_equal(IC.decode_image(GOLD_PPM), GOLD)


def test_bmp_golden_pixels():
    np.testing.assert_array_equal(IC.decode_bmp(GOLD_BMP), GOLD)
    np.testing.assert_array_equal(IC.decode_image(GOLD_BMP), GOLD)


def test_round_trips_include_row_padding():
    rng = np.random.default_rng(7)
    # width 5: BMP row = 15 bytes -> padded to 16 (exercises padding)
    arr = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    np.testing.assert_array_equal(IC.decode_ppm(IC.encode_ppm(arr)), arr)
    np.testing.assert_array_equal(IC.decode_bmp(IC.encode_bmp(arr)), arr)


def test_bmp_top_down_variant():
    # negative height = top-down row order; decoder must NOT flip
    b = bytearray(IC.encode_bmp(GOLD))
    b[22:26] = (-2).to_bytes(4, "little", signed=True)
    raster = IC.encode_bmp(GOLD[::-1])[54:]  # rows in top-down order
    np.testing.assert_array_equal(
        IC.decode_bmp(bytes(b[:54]) + raster), GOLD
    )


def test_decode_errors_are_loud():
    with pytest.raises(ValueError):
        IC.decode_image(b"\x89PNG....")  # unsupported format: no silent junk
    with pytest.raises(ValueError):
        IC.decode_ppm(b"P6\n2 2\n255\n\xff\x00")  # truncated raster
    with pytest.raises(ValueError):
        IC.decode_bmp(GOLD_BMP[:40])  # truncated header/raster


def test_resize_nearest_upscale_golden():
    out = IC.resize_nearest(GOLD, 4, 4)
    # 2x upscale with pixel-center mapping duplicates each source pixel 2x2
    expect = GOLD.repeat(2, axis=0).repeat(2, axis=1)
    np.testing.assert_array_equal(out, expect)
    # downscale back recovers the original
    np.testing.assert_array_equal(IC.resize_nearest(out, 2, 2), GOLD)


def _real_media(spark):
    rows = [
        (1, bytes(GOLD_PPM), ("image", "ppm", 2, 2, None, None)),
        (2, bytes(GOLD_BMP), ("image", "bmp", 2, 2, None, None)),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_real_resize_through_mapinpandas(spark):
    """The SAME resize_images plumbing the oracle query proves, with the
    real decode->resample->re-encode kernel: output bytes decode to the
    expected pixels, in each row's source format."""
    out = {
        r["media_id"]: r
        for r in MM.resize_images(
            _real_media(spark), 4, 4, resize_fn=IC.image_resize_fn
        ).collect()
    }
    expect = GOLD.repeat(2, axis=0).repeat(2, axis=1)
    assert out[1]["content"][:2] == b"P6"
    assert out[2]["content"][:2] == b"BM"
    for mid in (1, 2):
        np.testing.assert_array_equal(IC.decode_image(out[mid]["content"]), expect)
        assert out[mid]["meta"]["width"] == 4 and out[mid]["meta"]["height"] == 4


def test_real_features_through_mapinpandas(spark):
    """extract_media_features with the real pixel kernel: per-channel
    means of the golden image are exactly (510/4, 510/4, 510/4)/255."""
    feats = {
        r["media_id"]: r["features"]
        for r in MM.extract_media_features(
            _real_media(spark), decode_fn=IC.image_feature_fn
        ).collect()
    }
    for mid in (1, 2):
        f = feats[mid]
        assert len(f) == 8
        for ch in range(3):  # mean of [255,0,0,255]/255 etc. = 0.5
            assert f[ch] == pytest.approx(510 / 4 / 255)
        assert f[6] == pytest.approx(0.5)  # square: w/(w+h)


# ---------------------------------------------------------------------------
# Untrusted-bytes contract: corpus media columns are arbitrary bytes; the
# decoders must reject ANY malformed input with ValueError — never leak
# struct.error / IndexError from header parsing into the Arrow kernel.
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=300, deadline=None)
@given(
    blob=st.binary(max_size=200),
    prefix=st.sampled_from([b"", b"P6", b"P6\n", b"BM", b"BM" + b"\x00" * 20]),
)
def test_decoders_reject_garbage_with_valueerror_only(blob, prefix):
    for fn in (IC.decode_ppm, IC.decode_bmp, IC.decode_image):
        try:
            out = fn(prefix + blob)
        except ValueError:
            continue
        # the (astronomically unlikely) accidental-valid case must still
        # produce a well-formed pixel array
        assert out.ndim == 3 and out.shape[2] == 3


@settings(max_examples=50, deadline=None)
@given(
    arr=st.integers(min_value=1, max_value=7).flatmap(
        lambda h: st.integers(min_value=1, max_value=7).flatmap(
            lambda w: st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=h * w * 3,
                max_size=h * w * 3,
            ).map(lambda v: np.array(v, dtype=np.uint8).reshape(h, w, 3))
        )
    )
)
def test_codec_round_trip_property(arr):
    np.testing.assert_array_equal(IC.decode_ppm(IC.encode_ppm(arr)), arr)
    np.testing.assert_array_equal(IC.decode_bmp(IC.encode_bmp(arr)), arr)
