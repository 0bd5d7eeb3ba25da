"""Pure-Python PPM/BMP/WAV codecs (functions/codecs.py): encode→decode
round-trips, spec'd byte layouts against hand-built golden files,
malformed-input errors, and nearest-neighbor resize arithmetic."""

import struct

import numpy as np
import pytest

from arcane_stream_sqlserver_change_tracking_spark.functions.codecs import (
    decode_any,
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    resize_image_nearest,
    sniff_media,
)


def _img(h, w, seed=0):
    return ((seed + np.arange(h * w * 3)) % 256).astype(np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------- PPM


def test_ppm_roundtrip_exact():
    for h, w in [(1, 1), (3, 5), (17, 31)]:
        img = _img(h, w, seed=h * w)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_header_layout():
    data = encode_ppm(_img(2, 3))
    assert data.startswith(b"P6\n3 2\n255\n")
    assert len(data) == len(b"P6\n3 2\n255\n") + 2 * 3 * 3


def test_ppm_comments_and_p3_ascii():
    img = decode_ppm(b"P6\n# a comment\n2 1\n255\n" + bytes(6))
    assert img.shape == (1, 2, 3) and img.sum() == 0
    ascii_ppm = b"P3\n2 2\n255\n" + b" ".join(
        str(v).encode() for v in range(12))
    assert np.array_equal(decode_ppm(ascii_ppm).ravel(), np.arange(12))


def test_ppm_16bit_maxval_rescales():
    # one white pixel at maxval 65535 (2-byte big-endian samples)
    data = b"P6\n1 1\n65535\n" + b"\xff\xff" * 3
    assert np.array_equal(decode_ppm(data), np.full((1, 1, 3), 255, np.uint8))


def test_ppm_rejects_garbage():
    with pytest.raises(ValueError, match="magic"):
        decode_ppm(b"JUNK")
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n2 ")


# ---------------------------------------------------------------- BMP


def test_bmp_roundtrip_exact():
    for h, w in [(1, 1), (2, 2), (5, 3), (7, 6)]:  # odd widths hit row padding
        img = _img(h, w, seed=h + w)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_header_layout_and_padding():
    data = encode_bmp(_img(2, 3))  # 3px*3B=9 → stride 12
    assert data[:2] == b"BM"
    assert struct.unpack_from("<I", data, 10)[0] == 54          # pixel offset
    assert struct.unpack_from("<ii", data, 18) == (3, 2)        # w, h
    assert struct.unpack_from("<H", data, 28)[0] == 24          # bpp
    assert len(data) == 54 + 12 * 2


def test_bmp_top_down_and_32bit():
    # hand-built 1x2 top-down 32-bit BGRA file: red above blue
    px = bytes([0, 0, 255, 0]) + bytes([255, 0, 0, 0])  # BGRA rows
    info = struct.pack("<IiiHHIIiiII", 40, 1, -2, 1, 32, 0, len(px), 0, 0, 0, 0)
    data = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54) + info + px
    img = decode_bmp(data)
    assert img.shape == (2, 1, 3)
    assert tuple(img[0, 0]) == (255, 0, 0) and tuple(img[1, 0]) == (0, 0, 255)


def test_bmp_rejects_malformed():
    with pytest.raises(ValueError, match="magic|truncated"):
        decode_bmp(b"BM123")
    good = encode_bmp(_img(4, 4))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:-8])
    rle = bytearray(good)
    struct.pack_into("<I", rle, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(rle))


# ---------------------------------------------------------------- WAV


def test_wav_roundtrip_exact():
    for frames, ch, rate in [(8, 1, 8000), (50, 2, 44100), (1, 2, 16000)]:
        samples = ((np.arange(frames * ch) * 977) % 65536 - 32768).astype(
            "<i2").reshape(frames, ch)
        audio, got_rate = decode_wav(encode_wav(samples, rate))
        assert got_rate == rate
        assert np.array_equal(audio, samples)


def test_wav_skips_unknown_chunks():
    base = encode_wav(np.zeros((4, 1), dtype="<i2"), 8000)
    # splice a LIST chunk between fmt and data; sizes in RIFF header fixed up
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = bytearray(base[:fmt_end] + extra + base[fmt_end:])
    struct.pack_into("<I", spliced, 4, len(spliced) - 8)
    audio, rate = decode_wav(bytes(spliced))
    assert rate == 8000 and audio.shape == (4, 1)


def test_wav_float32_and_8bit():
    f32 = np.linspace(-1, 1, 6, dtype="<f4").reshape(3, 2)
    fmt = struct.pack("<HHIIHH", 3, 2, 48000, 48000 * 8, 8, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", f32.nbytes) + f32.tobytes())
    audio, rate = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert rate == 48000 and np.allclose(audio, f32)


def test_wav_rejects_malformed():
    with pytest.raises(ValueError, match="magic"):
        decode_wav(b"RIFX0000WAVE")
    with pytest.raises(ValueError, match="missing"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


# ---------------------------------------------------------------- dispatch


def test_sniff_and_decode_any():
    assert sniff_media(encode_ppm(_img(1, 1))) == "ppm"
    assert sniff_media(encode_bmp(_img(1, 1))) == "bmp"
    assert sniff_media(encode_wav(np.zeros((1, 1), "<i2"), 8000)) == "wav"
    assert sniff_media(b"\x89PNG") is None

    m = decode_any(encode_ppm(_img(4, 7)))
    assert (m["format"], m["width"], m["height"], m["channels"]) == ("ppm", 7, 4, 3)
    assert m["sample_rate"] is None
    m = decode_any(encode_wav(np.zeros((9, 2), "<i2"), 22050))
    assert (m["format"], m["channels"], m["sample_rate"], m["n_samples"]) == (
        "wav", 2, 22050, 9)
    assert m["width"] is None
    with pytest.raises(ValueError, match="unrecognized"):
        decode_any(b"\x89PNG\r\n")


# ---------------------------------------------------------------- resize


def test_resize_nearest_arithmetic():
    img = _img(4, 4)
    assert np.array_equal(resize_image_nearest(img, 4, 4), img)  # identity
    up = resize_image_nearest(img, 8, 8)       # 2x up: each px becomes 2x2
    assert up.shape == (8, 8, 3)
    assert np.array_equal(up[::2, ::2], img) and np.array_equal(up[1::2, 1::2], img)
    down = resize_image_nearest(img, 2, 2)     # 2x down: centered sample grid
    assert np.array_equal(down, img[1::2, 1::2])
    with pytest.raises(ValueError, match="bad target"):
        resize_image_nearest(img, 0, 2)


# ---------------------------------------------------------------- properties

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

pytestmark_hyp = pytest.mark.skipif(not HAVE_HYPOTHESIS,
                                    reason="hypothesis not installed")


@pytestmark_hyp
@settings(max_examples=50, deadline=None)
@given(h=st.integers(1, 24), w=st.integers(1, 24), seed=st.integers(0, 10_000))
def test_prop_ppm_bmp_roundtrip(h, w, seed):
    img = ((seed + np.arange(h * w * 3)) * 2654435761 % 256).astype(
        np.uint8).reshape(h, w, 3)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@pytestmark_hyp
@settings(max_examples=50, deadline=None)
@given(frames=st.integers(1, 200), ch=st.integers(1, 4),
       rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
       seed=st.integers(0, 10_000))
def test_prop_wav_roundtrip(frames, ch, rate, seed):
    samples = ((seed + np.arange(frames * ch)) * 48271 % 65536 - 32768).astype(
        "<i2").reshape(frames, ch)
    audio, got = decode_wav(encode_wav(samples, rate))
    assert got == rate and np.array_equal(audio, samples)


@pytestmark_hyp
@settings(max_examples=40, deadline=None)
@given(h=st.integers(1, 16), w=st.integers(1, 16),
       th=st.integers(1, 40), tw=st.integers(1, 40))
def test_prop_resize_samples_from_source(h, w, th, tw):
    """Every output pixel of a nearest-neighbor resize is some source
    pixel, dims are exact, and identity resize is a no-op."""
    img = (np.arange(h * w * 3) % 251).astype(np.uint8).reshape(h, w, 3)
    out = resize_image_nearest(img, tw, th)
    assert out.shape == (th, tw, 3)
    src = {tuple(p) for p in img.reshape(-1, 3)}
    assert {tuple(p) for p in out.reshape(-1, 3)} <= src
    assert np.array_equal(resize_image_nearest(img, w, h), img)


@pytestmark_hyp
@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_prop_decoders_never_crash_unstructured(data):
    """Arbitrary bytes either decode or raise ValueError — never an
    unhandled IndexError/struct.error from header parsing (malformed
    blobs at 100 TB are routine, and mapInPandas would kill the task)."""
    for fn in (decode_ppm, decode_bmp, decode_wav, decode_any):
        try:
            fn(data)
        except ValueError:
            pass
