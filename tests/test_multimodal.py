"""Multimodal plumbing: resize (1:1) and frame-sample (1:N fan-out) via
mapInPandas — schemas, meta rewrite, determinism, pluggable kernels."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators import multimodal as MM


def _media(spark):
    rows = [
        (1, b"imgbytes-aaaa", ("image", "png", 640, 480, None, None)),
        (2, b"vidbytes-bbbb", ("video", "mp4", 1280, 720, 2500, None)),
        (3, b"vidbytes-cccc", ("video", "mp4", 1280, 720, 1000, None)),
        (4, b"audbytes-dddd", ("audio", "wav", None, None, None, 16000)),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_resize_rewrites_content_and_meta(spark):
    out = MM.resize_images(_media(spark), 64, 64)
    assert out.schema == MM.MEDIA_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 4
    for r in rows.values():
        assert r["meta"]["width"] == 64 and r["meta"]["height"] == 64
        assert r["content"] and r["content"] != b""
    # deterministic: same input -> same resized bytes
    again = {r["media_id"]: r["content"] for r in MM.resize_images(_media(spark), 64, 64).collect()}
    assert {k: v["content"] for k, v in rows.items()} == again
    # media_type preserved through the meta rewrite
    assert rows[2]["meta"]["media_type"] == "video"


def test_resize_pluggable_kernel(spark):
    out = MM.resize_images(
        _media(spark), 8, 8, resize_fn=lambda b, w, h: b"K%dx%d" % (w, h)
    ).collect()
    assert all(r["content"] == b"K8x8" for r in out)


def test_frame_sampling_fanout(spark):
    out = MM.sample_video_frames(_media(spark), every_ms=1000)
    assert out.schema == MM.FRAME_SCHEMA
    rows = out.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    # ceil(duration/every): 2500 @1000ms -> 0,1000,2000; 1000 -> just 0
    # (no frame ever at t == duration)
    assert len(by_id[2]) == 3 and len(by_id[3]) == 1
    assert sorted(r["ts_ms"] for r in by_id[2]) == [0, 1000, 2000]
    # media without duration emit no frames
    assert 1 not in by_id and 4 not in by_id
    # frames differ per index, deterministic per (content, idx)
    assert len({bytes(r["frame"]) for r in by_id[2]}) == 3
