"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus a typed metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` operators so each task processes whole record batches and
the (heavy) media bytes never leave the executor.

The DEFAULT kernels (``decode_fn=None``) are deterministic fakes so the
oracle queries stay engine-checkable; REAL byte-level kernels exist in
``operators/imagecodec.py`` (pure-numpy PPM/BMP decode, nearest-neighbor
resize, pixel-statistics features) and plug into these same signatures —
tests/test_imagecodec.py drives actual pixels through the identical
mapInPandas paths. Compressed formats (JPEG/PNG/ffmpeg) slot in the same
way when their libs exist; only the codec byte-parsing is absent here,
never the Spark-side plumbing.

Scale notes: media rows are large and count-skewed — ``repartition`` by a
uniform key (content hash) before heavy decode so one executor doesn't eat
all 4K videos; ``spark.sql.files.maxPartitionBytes`` should be sized down
for tables with multi-MB binary cells.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png | wav | mp4 | ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)

# features are DOUBLE: each stub feature is (32-bit int)/2^32 — a dyadic
# rational that doubles carry exactly, so the DuckDB oracle can reproduce
# the values bit-for-bit (a float32 column would round them and break the
# cross-engine check). A real embedder plugged in via decode_fn may narrow
# this to float32 without touching the plumbing.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _make_fake_decode(n_features: int = 8) -> Callable[[bytes], list]:
    """Deterministic stand-in for a real decoder+embedder: derives
    n_features floats in [0,1) from the sha256 of the bytes.

    Returns a NESTED closure on purpose: cloudpickle serializes nested
    functions by VALUE, while a module-level function is pickled as a
    reference its Python worker must re-import — and workers only share
    the driver's CWD, not its sys.path, so a kernel referencing this
    package by name dies with ModuleNotFoundError the moment the driver
    runs from outside the repo root. Every default kernel below follows
    this factory pattern for that reason."""

    def fake(content: bytes) -> list:
        import hashlib as _hl

        if content is None:
            return []
        digest = _hl.sha256(content).digest()
        return [
            int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
            for i in range(n_features)
        ]

    return fake


def extract_media_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    n_features: int = 8,
) -> DataFrame:
    """binary content -> (sha256, size, feature vector) via mapInPandas.

    A real deployment passes ``decode_fn`` that decodes pixels/samples and
    runs the feature model; batches stream through Arrow so memory stays
    bounded by batch size, not partition size.
    """
    fn = decode_fn or _make_fake_decode(n_features)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content_sha256": [
                        hashlib.sha256(b).hexdigest() if b is not None else None
                        for b in content
                    ],
                    "n_bytes": [len(b) if b is not None else 0 for b in content],
                    "features": [fn(bytes(b) if b is not None else b) for b in content],
                }
            )

    return media.mapInPandas(op, FEATURE_SCHEMA)


def _make_fake_resize() -> Callable[[bytes, int, int], bytes]:
    """Deterministic stand-in for decode->resize->re-encode (PIL/opencv not
    in this image): output bytes derived from (content, w, h). Factory ->
    closure, pickled by value (see _make_fake_decode)."""

    def fake(content: bytes, width: int, height: int) -> bytes:
        import hashlib as _hl

        if content is None:
            return b""
        return _hl.sha256(content + f"|{width}x{height}".encode()).digest()

    return fake


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize operator: 1 row in -> 1 row out, content replaced by the
    resized encoding, meta width/height updated. The pixel kernel is
    pluggable (``resize_fn(content, w, h) -> bytes``); the default is the
    clearly-marked deterministic fake. Plumbing — Arrow batching, schema,
    meta rewrite — is real and tested either way."""
    fn = resize_fn or _make_fake_resize()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["content"] = [
                fn(bytes(b) if b is not None else None, width, height)
                for b in pdf["content"]
            ]
            out["meta"] = [
                {**(m if isinstance(m, dict) else m.asDict() if m is not None else {}),
                 "width": width, "height": height}
                for m in pdf["meta"]
            ]
            yield out

    return media.mapInPandas(op, MEDIA_SCHEMA)


def _make_fake_resample() -> Callable[[bytes], bytes]:
    """Deterministic stand-in for decode->resample->re-encode (no audio
    libs in this image): output bytes derived from the content hash.
    Factory -> closure, pickled by value (see _make_fake_decode)."""

    def fake(content: bytes) -> bytes:
        import hashlib as _hl

        if content is None:
            return b""
        return _hl.sha256(content + b"|resample").digest()

    return fake


def resample_audio(
    media: DataFrame,
    sample_rate: int,
    resample_fn: Callable[[bytes], bytes] | None = None,
) -> DataFrame:
    """Sample-rate conversion: 1 row in -> 1 row out, content replaced by
    the resampled encoding, ``meta.sample_rate`` rewritten (duration is a
    time quantity and survives resampling, so ``duration_ms`` is kept).
    The signal kernel is pluggable (``resample_fn(content) -> bytes`` —
    a real one comes from operators/audiocodec.make_audio_resample_fn);
    the default is the clearly-marked deterministic fake. The audio twin
    of resize_images: same Arrow batching, same meta-rewrite contract."""
    fn = resample_fn or _make_fake_resample()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["content"] = [
                fn(bytes(b)) if b is not None else b"" for b in pdf["content"]
            ]
            out["meta"] = [
                {**(m if isinstance(m, dict) else m.asDict() if m is not None else {}),
                 "sample_rate": sample_rate}
                for m in pdf["meta"]
            ]
            yield out

    return media.mapInPandas(op, MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _make_fake_frame() -> Callable[[bytes, int], bytes]:
    """Factory -> closure, pickled by value (see _make_fake_decode)."""

    def fake(content: bytes, idx: int) -> bytes:
        import hashlib as _hl

        if content is None:
            return b""
        return _hl.sha256(content + f"|frame{idx}".encode()).digest()

    return fake


def sample_video_frames(
    media: DataFrame,
    every_ms: int,
    frame_fn: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Frame sampling: 1 video row in -> ceil(duration/every_ms) frame rows
    out (the fan-out batch shape a real ffmpeg kernel needs). Frame count
    comes from ``meta.duration_ms``; rows with no duration emit no frames.
    The frame-extraction kernel is pluggable; default is the deterministic
    fake."""
    fn = frame_fn or _make_fake_frame()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                m = meta if isinstance(meta, dict) else (
                    meta.asDict() if meta is not None else {}
                )
                duration = m.get("duration_ms") or 0
                # frames at t in [0, duration): exactly ceil(duration/every)
                # — never ask the decode kernel for a frame at t == duration
                n = -(-int(duration) // every_ms) if duration else 0
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(fn(bytes(content) if content is not None else None, i))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return media.mapInPandas(op, FRAME_SCHEMA)


def text_as_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adapter used by tests/driver queries: treat utf-8 text bytes as an
    opaque media payload (exercises the binary-column plumbing on the
    driver's documents table, where no true media exists)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.struct(
            F.lit("text").alias("media_type"),
            F.lit("utf-8").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
