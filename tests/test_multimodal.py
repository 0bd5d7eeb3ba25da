"""Multimodal plumbing: binary payload synthesis, mapInPandas decode
(fake byte-derived stub AND the real PPM/BMP/WAV codec path), 1-to-many
frame sampling, and resize (stamp stub AND real nearest-neighbor)."""

import hashlib

import pytest

from arcane_stream_sqlserver_change_tracking_spark.operators.multimodal import (
    attach_binary_payload,
    decode_media,
    resize_media,
    sample_frames,
    synth_media_payload,
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


def test_unknown_decode_stub_rejected(spark, docs):
    with pytest.raises(ValueError, match="unknown decode_stub"):
        decode_media(attach_binary_payload(docs), decode_stub="warp")


IDS = [0, 1, 2, 5, 31, 46, 47, 100]  # covers all three formats + extremes


@pytest.fixture()
def media(spark):
    ids = spark.createDataFrame([(i,) for i in IDS], "doc_id long")
    return synth_media_payload(ids)


def test_real_decode_roundtrips_synth_params(spark, media):
    """synth (real encoders) → decode_stub='real' (real parsers) must
    recover the synthesis parameters — the closed NotImplementedError
    seam from the r4 verdict."""
    out = {r["doc_id"]: r for r in decode_media(media, decode_stub="real").collect()}
    assert set(out) == set(IDS)
    for i in IDS:
        r = out[i]
        if i % 3 == 2:  # wav
            assert r["format"] == "wav"
            assert (r["width"], r["height"]) == (None, None)
            assert r["channels"] == i % 2 + 1
            assert r["sample_rate"] == 8000 + (i % 5) * 1000
            assert r["n_samples"] == i % 50 + 8
        else:           # ppm / bmp
            assert r["format"] == ("ppm" if i % 3 == 0 else "bmp")
            assert r["width"] == i % 31 + 1
            assert r["height"] == i % 17 + 1
            assert r["channels"] == 3
            assert (r["sample_rate"], r["n_samples"]) == (None, None)
        assert r["n_bytes"] > 0 and len(r["content_hash"]) == 64


def test_real_resize_reencodes_images(spark, media):
    """impl='real': images are decoded, nearest-neighbor resized, and
    re-encoded in their ORIGINAL format; audio passes through untouched
    with null geometry."""
    from arcane_stream_sqlserver_change_tracking_spark.functions.codecs import (
        decode_any,
        sniff_media,
    )

    before = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    out = resize_media(media, 8, 6, impl="real").collect()
    assert len(out) == len(IDS)
    for r in out:
        i, blob = r["doc_id"], bytes(r["payload"])
        if i % 3 == 2:  # audio: untouched
            assert blob == before[i]
            assert (r["resized_width"], r["resized_height"]) == (None, None)
        else:
            assert sniff_media(blob) == ("ppm" if i % 3 == 0 else "bmp")
            meta = decode_any(blob)
            assert (meta["width"], meta["height"]) == (8, 6)
            assert (r["resized_width"], r["resized_height"]) == (8, 6)


def test_real_resize_pixel_content(spark):
    """The resized payload is the actual nearest-neighbor image, not a
    re-stamped original: compare against resizing locally."""
    import numpy as np

    from arcane_stream_sqlserver_change_tracking_spark.functions.codecs import (
        decode_ppm,
        resize_image_nearest,
    )

    i = 3  # ppm, 4x4 (w = 3%31+1, h = 3%17+1)
    ids = spark.createDataFrame([(i,)], "doc_id long")
    src = decode_ppm(bytes(synth_media_payload(ids).collect()[0]["payload"]))
    out = resize_media(synth_media_payload(ids), 9, 5, impl="real").collect()[0]
    got = decode_ppm(bytes(out["payload"]))
    assert np.array_equal(got, resize_image_nearest(src, 9, 5))


def test_feature_stats_match_local_decode(spark, media):
    """extract_media_features computes stats over the DECODED content —
    cross-check a sample against decoding locally with the same codecs."""
    import numpy as np

    from arcane_stream_sqlserver_change_tracking_spark.functions.codecs import (
        decode_bmp,
        decode_ppm,
        decode_wav,
        sniff_media,
    )
    from arcane_stream_sqlserver_change_tracking_spark.operators.multimodal import (
        extract_media_features,
    )

    blobs = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    out = {r["doc_id"]: r for r in extract_media_features(media).collect()}
    assert set(out) == set(blobs)
    for i, b in blobs.items():
        kind = sniff_media(b)
        vals = (decode_wav(b)[0] if kind == "wav"
                else decode_ppm(b) if kind == "ppm"
                else decode_bmp(b)).astype(np.int64).ravel()
        r = out[i]
        assert r["format"] == kind
        assert r["n_values"] == vals.size
        assert r["value_sum"] == int(vals.sum())
        assert (r["value_min"], r["value_max"]) == (int(vals.min()), int(vals.max()))


def test_feature_stats_rejects_unknown_payload(spark):
    from arcane_stream_sqlserver_change_tracking_spark.operators.multimodal import (
        extract_media_features,
    )

    bad = spark.createDataFrame([(1, bytearray(b"\x89PNG junk"))],
                                "doc_id long, payload binary")
    with pytest.raises(Exception, match="unrecognized media payload"):
        extract_media_features(bad).collect()


def test_media_pipeline_plan_has_zero_exchange(spark, media):
    """100 TB shape pin: synth → decode → feature-extract is per-row
    work that must stay IN the scan stage — no Exchange anywhere. At
    petabyte media scale a shuffle of blob payloads would dominate the
    job; mapInPandas chains must not introduce one."""
    from arcane_stream_sqlserver_change_tracking_spark.operators.multimodal import (
        extract_media_features,
    )

    for df in (decode_media(media, decode_stub="real"),
               extract_media_features(media),
               resize_media(media, 8, 6, impl="real")):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_png_format_mix_end_to_end(spark):
    """formats=('ppm','bmp','wav','png'): the compressed codec joins
    the mix — real decode recovers the synthesis parameters, feature
    extraction sees the exact zlib-roundtripped pixel values, and real
    resize re-encodes PNG as PNG."""
    import numpy as np

    from arcane_stream_sqlserver_change_tracking_spark.functions.codecs import (
        decode_png,
        sniff_media,
    )
    from arcane_stream_sqlserver_change_tracking_spark.operators.multimodal import (
        extract_media_features,
    )

    ids = [3, 7, 11, 31, 47, 103]  # all ≡ 3 (mod 4) → every payload is png
    df = synth_media_payload(
        spark.createDataFrame([(i,) for i in ids], "doc_id long"),
        formats=("ppm", "bmp", "wav", "png"))

    blobs = {r["doc_id"]: bytes(r["payload"]) for r in df.collect()}
    assert all(sniff_media(b) == "png" for b in blobs.values())

    for r in decode_media(df, decode_stub="real").collect():
        i = r["doc_id"]
        assert (r["format"], r["width"], r["height"], r["channels"]) == (
            "png", i % 31 + 1, i % 17 + 1, 3)

    for r in extract_media_features(df).collect():
        i = r["doc_id"]
        vals = decode_png(blobs[i]).astype(np.int64).ravel()
        expect = (i + np.arange(vals.size)) % 256
        assert np.array_equal(vals, expect)  # zlib roundtrip is exact
        assert (r["n_values"], r["value_sum"]) == (vals.size, int(expect.sum()))

    for r in resize_media(df, 8, 6, impl="real").collect():
        blob = bytes(r["payload"])
        assert sniff_media(blob) == "png"  # re-encoded in original format
        assert decode_png(blob).shape == (6, 8, 3)


def test_synth_rejects_unknown_format(spark):
    ids = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="unknown formats"):
        synth_media_payload(ids, formats=("ppm", "gif"))


def test_video_frame_extraction_real_container(spark):
    """synth_video_payload → extract_video_frames: actual Y4M stream
    headers and planar payload decoded back; every 2nd frame sampled,
    exact luma stats, zero Exchange in the plan."""
    import numpy as np

    from arcane_stream_sqlserver_change_tracking_spark.operators.multimodal import (
        extract_video_frames,
        synth_video_payload,
    )

    ids = [0, 1, 6, 13, 39, 103]
    vids = synth_video_payload(
        spark.createDataFrame([(i,) for i in ids], "doc_id long"))
    out = extract_video_frames(vids, every_n=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in ids:
        n, w, h = i % 7 + 2, 2 * (i % 8 + 1), 2 * (i % 5 + 1)
        got = sorted(by_doc[i], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in got] == list(range(0, n, 2))
        for r in got:
            f = r["frame_idx"]
            vals = (i + f * 131 + np.arange(w * h, dtype=np.int64)) % 256
            assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
            assert r["luma_sum"] == int(vals.sum())
            assert (r["luma_min"], r["luma_max"]) == (int(vals.min()),
                                                      int(vals.max()))


def test_video_frame_extraction_rejects_non_video(spark, media):
    from arcane_stream_sqlserver_change_tracking_spark.operators.multimodal import (
        extract_video_frames,
    )

    with pytest.raises(Exception, match="not a Y4M video payload"):
        extract_video_frames(media).collect()
    with pytest.raises(ValueError, match="every_n"):
        extract_video_frames(media, every_n=0)
