"""Multimodal plumbing: binary payload synthesis, mapInPandas decode
stub, 1-to-many frame sampling, resize stub, and the NotImplementedError
gate for the real codec seam."""

import hashlib

import pytest

from arcane_stream_sqlserver_change_tracking_spark.operators.multimodal import (
    attach_binary_payload,
    decode_media,
    resize_media,
    sample_frames,
)


@pytest.fixture()
def docs(spark):
    rows = [(1, "hello world"), (2, "x" * 200), (3, "")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decode_metadata_matches_python(spark, docs):
    out = {r["doc_id"]: r for r in decode_media(attach_binary_payload(docs)).collect()}
    for did, text in [(1, "hello world"), (2, "x" * 200), (3, "")]:
        blob = text.encode()
        r = out[did]
        assert r["n_bytes"] == len(blob)
        assert r["content_hash"] == hashlib.sha256(blob).hexdigest()
        assert r["width"] == len(blob) % 1920 + 1
        assert r["height"] == len(blob) * 7 % 1080 + 1


def test_frame_sampling_explodes(spark, docs):
    frames = sample_frames(attach_binary_payload(docs), every_n_bytes=64).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 200 bytes -> 4 frames of <=64; 11 bytes -> 1 frame; empty payload
    # -> ZERO frames (nothing to sample — same as the DuckDB oracle's
    # generate_series(0, ceil(0/64)-1) producing no offsets)
    assert len(by_doc[2]) == 4
    assert [r["frame_idx"] for r in sorted(by_doc[2], key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
    assert by_doc[2][0]["frame_hash"] == hashlib.sha256(b"x" * 64).hexdigest()
    assert len(by_doc[1]) == 1
    assert 3 not in by_doc


def test_resize_stub_preserves_rows(spark, docs):
    out = resize_media(attach_binary_payload(docs), 224, 224)
    assert out.count() == 3
    r = out.limit(1).collect()[0]
    assert (r["resized_width"], r["resized_height"]) == (224, 224)


def test_real_decode_is_gated(spark, docs):
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        decode_media(attach_binary_payload(docs), decode_stub="real")
