"""Pure-Python PPM/BMP/WAV/PNG codecs (functions/codecs.py):
encode→decode round-trips, spec'd byte layouts against hand-built
golden files, malformed-input errors, and nearest-neighbor resize
arithmetic."""

import struct
import zlib

import numpy as np
import pytest

from arcane_stream_sqlserver_change_tracking_spark.functions.codecs import (
    decode_any,
    decode_bmp,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_png,
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


def test_wav_truncated_fmt_chunk_is_valueerror():
    """Mutation-fuzz regression: a fmt chunk shorter than the 16-byte
    PCM body must raise ValueError, not struct.error."""
    raw = (b"RIFF" + struct.pack("<I", 24) + b"WAVE"
           + b"fmt " + struct.pack("<I", 10) + bytes(10)
           + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="truncated fmt"):
        decode_wav(raw)


def test_wav_rejects_malformed():
    with pytest.raises(ValueError, match="magic"):
        decode_wav(b"RIFX0000WAVE")
    with pytest.raises(ValueError, match="missing"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


# ---------------------------------------------------------------- Y4M


def test_y4m_roundtrip_exact():
    from arcane_stream_sqlserver_change_tracking_spark.functions.codecs import (
        decode_y4m,
        encode_y4m,
    )

    luma = (np.arange(3 * 4 * 6) % 256).astype(np.uint8).reshape(3, 4, 6)
    for cs in ("mono", "444", "420"):
        out, p = decode_y4m(encode_y4m(luma, fps_num=25, colorspace=cs))
        assert np.array_equal(out, luma)
        assert (p["width"], p["height"], p["n_frames"], p["fps_num"],
                p["colorspace"]) == (6, 4, 3, 25, cs)


def test_y4m_header_layout_and_foreign_tokens():
    """Decoder handles the full ffmpeg-style header (interlace, aspect,
    rational frame rate, X comments) and golden hand-built bytes —
    independent of encode_y4m."""
    from arcane_stream_sqlserver_change_tracking_spark.functions.codecs import (
        decode_y4m,
        encode_y4m,
    )

    b = encode_y4m(np.zeros((1, 2, 2), np.uint8), fps_num=30)
    assert b.startswith(b"YUV4MPEG2 W2 H2 F30:1 Ip A1:1 Cmono\n")
    assert b.endswith(b"FRAME\n" + bytes(4))

    hand = (b"YUV4MPEG2 W4 H2 F30000:1001 It A4:3 C420jpeg XYSCSS=420JPEG\n"
            + b"FRAME\n" + bytes(range(8)) + b"\x80" * 4
            + b"FRAME Xfoo\n" + bytes(range(8, 16)) + b"\x80" * 4)
    luma, p = decode_y4m(hand)
    assert p == {"width": 4, "height": 2, "fps_num": 30000, "fps_den": 1001,
                 "colorspace": "420jpeg", "n_frames": 2}
    assert np.array_equal(luma.reshape(-1), np.arange(16, dtype=np.uint8))


def test_y4m_rejects_malformed():
    from arcane_stream_sqlserver_change_tracking_spark.functions.codecs import (
        decode_y4m,
        encode_y4m,
    )

    cases = [
        (b"NOTY4M", "bad magic"),
        (b"YUV4MPEG2 W4 H2 Cmono", "unterminated"),
        (b"YUV4MPEG2 Cmono\n", "missing or bad W/H"),
        (b"YUV4MPEG2 Wx H2\n", "malformed header token"),
        (b"YUV4MPEG2 W4 H2 F0:1 Cmono\n", "bad frame rate"),
        (b"YUV4MPEG2 W4 H2 Crgb\n", "unsupported colorspace"),
        (b"YUV4MPEG2 W3 H3 C420\n", "even dimensions"),
        (b"YUV4MPEG2 W4 H2 Cmono\nFRAME\n" + bytes(3), "truncated frame"),
        (b"YUV4MPEG2 W4 H2 Cmono\nGARBAGE\n" + bytes(8), "malformed FRAME"),
    ]
    for raw, msg in cases:
        with pytest.raises(ValueError, match=msg):
            decode_y4m(raw)
    with pytest.raises(ValueError, match="even dimensions"):
        encode_y4m(np.zeros((1, 3, 3), np.uint8), colorspace="420")
    with pytest.raises(ValueError, match="want \\(n, h, w\\)"):
        encode_y4m(np.zeros((3, 3), np.uint8))


# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype, body):
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def _png_file(w, h, color_type, scanlines, plte=None):
    """Hand-build a PNG from raw (already filtered) scanline bytes —
    independent of encode_png, so decoder tests aren't circular."""
    out = _PNG_SIG + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(scanlines)) + _png_chunk(
        b"IEND", b"")


def test_png_roundtrip_exact():
    img = _img(17, 31, seed=5)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_layout():
    b = encode_png(_img(3, 5))
    assert b[:8] == _PNG_SIG
    assert b[12:16] == b"IHDR"
    w, h, depth, ctype = struct.unpack(">IIBB", b[16:26])
    assert (w, h, depth, ctype) == (5, 3, 8, 2)  # 8-bit RGB
    assert b.endswith(_png_chunk(b"IEND", b""))


def test_png_all_filter_types_unfilter():
    """Hand-filter a 5-row image with one row per filter type
    (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) and check the decoder
    reconstructs the original pixels — covers both the vectorized and
    the sequential unfilter paths."""
    img = _img(5, 4, seed=9)
    bpp, stride = 3, 4 * 3
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        rec = img[y].reshape(-1).astype(np.int64)
        filt = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = rec[x - bpp] if x >= bpp else 0
            c = prev[x - bpp] if x >= bpp else 0
            up = prev[x]
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (a + up) // 2
            else:
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
            filt[x] = (rec[x] - pred) % 256
        lines += bytes([f]) + bytes(filt.astype(np.uint8))
        prev = rec
    assert np.array_equal(decode_png(_png_file(4, 5, 2, bytes(lines))), img)


def test_png_color_types_normalize_to_rgb():
    g = (np.arange(21) % 256).astype(np.uint8).reshape(3, 7)
    scan = b"".join(b"\x00" + bytes(g[y]) for y in range(3))
    assert np.array_equal(decode_png(_png_file(7, 3, 0, scan)),
                          np.repeat(g[:, :, None], 3, axis=2))

    rgba = _img(2, 3, seed=1).repeat(2, axis=2)[:, :, :4]
    scan = b"".join(b"\x00" + bytes(rgba[y].reshape(-1)) for y in range(2))
    assert np.array_equal(decode_png(_png_file(3, 2, 6, scan)), rgba[:, :, :3])

    ga = _img(2, 3, seed=2)[:, :, :2]
    scan = b"".join(b"\x00" + bytes(ga[y].reshape(-1)) for y in range(2))
    assert np.array_equal(decode_png(_png_file(3, 2, 4, scan)),
                          np.repeat(ga[:, :, :1], 3, axis=2))

    plte = bytes(range(12))  # 4 palette entries
    idx = (np.arange(15) % 4).astype(np.uint8).reshape(3, 5)
    scan = b"".join(b"\x00" + bytes(idx[y]) for y in range(3))
    lut = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    assert np.array_equal(decode_png(_png_file(5, 3, 3, scan, plte)), lut[idx])


def test_png_rejects_malformed():
    img = _img(2, 2)
    good = encode_png(img)

    bad_crc = bytearray(good)
    bad_crc[20] ^= 0xFF  # flip an IHDR byte; chunk CRC no longer matches
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad_crc))

    interlaced = _PNG_SIG + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)) + _png_chunk(
        b"IDAT", zlib.compress(b"\x00" * 14)) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlac"):
        decode_png(interlaced)

    deep = _PNG_SIG + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)) + _png_chunk(
        b"IDAT", zlib.compress(b"\x00" * 26)) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(deep)

    corrupt_idat = _PNG_SIG + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)) + _png_chunk(
        b"IDAT", b"\x12\x34notdeflate") + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="deflate"):
        decode_png(corrupt_idat)

    short = _png_file(4, 4, 2, b"\x00" + b"\x01" * 12)  # 1 row for a 4-row image
    with pytest.raises(ValueError, match="decompressed size"):
        decode_png(short)

    oor = _png_file(2, 1, 3, b"\x00\x07\x00", plte=bytes(range(9)))  # idx 7 > 2
    with pytest.raises(ValueError, match="palette index"):
        decode_png(oor)

    with pytest.raises(ValueError, match="missing IEND"):
        decode_png(good[:-12])

    # mutation-fuzz regression: body present but trailing CRC truncated
    # must be ValueError, not struct.error (codecs.py _png_chunks)
    with pytest.raises(ValueError, match="truncated chunk"):
        decode_png(good[:23])  # cuts inside IHDR's CRC field


def test_png_zip_bomb_rejected_without_inflating(monkeypatch):
    """A 2x2 header whose IDAT inflates to 100 MB must be rejected at
    the expected-size cap — decompressobj(max_length) stops after
    expected+1 bytes, so a zip bomb can't exhaust task memory."""
    import time

    bomb = _PNG_SIG + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)) + _png_chunk(
        b"IDAT", zlib.compress(b"\x00" * 100_000_000, 9)) + _png_chunk(
        b"IEND", b"")
    t0 = time.time()
    with pytest.raises(ValueError, match="decompressed size"):
        decode_png(bomb)
    assert time.time() - t0 < 1.0  # rejected at the cap, not after 100 MB


# ---------------------------------------------------------------- dispatch


def test_sniff_and_decode_any():
    assert sniff_media(encode_ppm(_img(1, 1))) == "ppm"
    assert sniff_media(encode_bmp(_img(1, 1))) == "bmp"
    assert sniff_media(encode_wav(np.zeros((1, 1), "<i2"), 8000)) == "wav"
    assert sniff_media(encode_png(_img(1, 1))) == "png"
    assert sniff_media(b"\x89PNG") is None  # truncated signature

    m = decode_any(encode_png(_img(4, 7)))
    assert (m["format"], m["width"], m["height"], m["channels"]) == ("png", 7, 4, 3)
    assert m["sample_rate"] is None

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
    assert np.array_equal(decode_png(encode_png(img)), img)


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
    for fn in (decode_ppm, decode_bmp, decode_wav, decode_png, decode_any):
        try:
            fn(data)
        except ValueError:
            pass


def test_mutation_fuzz_decoders_only_raise_valueerror():
    """Seeded structured-corruption fuzz (the harness that caught the
    PNG-CRC and WAV-fmt escapes): flip/truncate/extend/splice valid
    files of every format, assert each decoder either decodes or
    raises ValueError — never struct.error/zlib.error/IndexError."""
    import random

    from arcane_stream_sqlserver_change_tracking_spark.functions.codecs import (
        decode_png,
        decode_y4m,
        encode_png,
        encode_y4m,
    )

    rng = random.Random(1234)
    img = _img(9, 13, seed=4)
    valids = [
        encode_ppm(img), encode_bmp(img), encode_png(img),
        encode_wav((np.arange(80) % 65536 - 32768).astype("<i2").reshape(40, 2),
                   16000),
        encode_y4m((np.arange(192) % 256).astype(np.uint8).reshape(4, 6, 8),
                   colorspace="444"),
    ]
    decoders = (decode_ppm, decode_bmp, decode_wav, decode_png, decode_y4m,
                decode_any)
    for trial in range(600):
        base = bytearray(rng.choice(valids))
        mode = trial % 4
        if mode == 0:
            for _ in range(rng.randint(1, 8)):
                base[rng.randrange(len(base))] = rng.randrange(256)
        elif mode == 1:
            base = base[: rng.randrange(len(base))]
        elif mode == 2:
            base += bytes(rng.randrange(256) for _ in range(rng.randint(1, 64)))
        else:
            i, j = sorted(rng.randrange(len(base)) for _ in range(2))
            base = base[:i] + base[j:]
        for fn in decoders:
            try:
                fn(bytes(base))
            except ValueError:
                pass  # the one allowed failure mode


@pytestmark_hyp
@settings(max_examples=40, deadline=None)
@given(n=st.integers(0, 6), h=st.integers(1, 12), w=st.integers(1, 12),
       fps=st.sampled_from([24, 25, 30, 60]), seed=st.integers(0, 10_000))
def test_prop_y4m_roundtrip(n, h, w, fps, seed):
    from arcane_stream_sqlserver_change_tracking_spark.functions.codecs import (
        decode_y4m,
        encode_y4m,
    )

    luma = ((seed + np.arange(n * h * w)) * 69069 % 256).astype(
        np.uint8).reshape(n, h, w)
    for cs in ("mono", "444") + (("420",) if h % 2 == 0 and w % 2 == 0 else ()):
        out, p = decode_y4m(encode_y4m(luma, fps_num=fps, colorspace=cs))
        assert np.array_equal(out, luma)
        assert (p["n_frames"], p["fps_num"], p["width"], p["height"]) == (
            n, fps, w, h)


@pytestmark_hyp
@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=120))
def test_prop_y4m_decoder_never_crashes_after_magic(data):
    from arcane_stream_sqlserver_change_tracking_spark.functions.codecs import (
        decode_y4m,
    )

    try:
        decode_y4m(b"YUV4MPEG2" + data)
    except ValueError:
        pass


@pytestmark_hyp
@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=120))
def test_prop_png_decoder_never_crashes_after_signature(data):
    """Adversarial PNG: a valid signature followed by arbitrary bytes
    must decode or raise ValueError — never zlib.error, struct.error,
    or IndexError (these would kill the mapInPandas task)."""
    try:
        decode_png(b"\x89PNG\r\n\x1a\n" + data)
    except ValueError:
        pass


def test_review_regressions_codecs():
    """Code-review findings pinned: (a) P3 sample token beyond int64 is
    ValueError, not OverflowError; (b) a WAV chunk declaring more bytes
    than the buffer holds is a truncation error, not silent partial
    audio; (c) BI_BITFIELDS with non-BGRA masks is rejected, not
    silently channel-swapped."""
    with pytest.raises(ValueError, match="bad P3 sample token"):
        decode_ppm(b"P3\n1 1\n255\n99999999999999999999999 1 2")

    wav = bytearray(encode_wav(np.zeros((4, 1), "<i2"), 8000))
    # inflate the data chunk's declared size past the buffer
    off = wav.index(b"data") + 4
    wav[off:off + 4] = struct.pack("<I", 0xFFFF)
    with pytest.raises(ValueError, match="truncated chunk"):
        decode_wav(bytes(wav))

    img = _img(2, 2)
    def bitfields_bmp(r_m, g_m, b_m):
        h, w = 2, 2
        stride = (w * 4 + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        px = np.dstack([img[::-1, :, ::-1], np.full((h, w, 1), 255, np.uint8)])
        rows[:, : w * 4] = px.reshape(h, w * 4)
        pix = rows.tobytes()
        header = struct.pack("<2sIHHI", b"BM", 70 + len(pix), 0, 0, 70)
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 3, len(pix),
                           2835, 2835, 0, 0)
        masks = struct.pack("<III", r_m, g_m, b_m) + struct.pack("<I", 0xFF000000)
        return header + info + masks + pix

    # default BGRA masks decode; RGBA-order masks are rejected
    ok = bitfields_bmp(0x00FF0000, 0x0000FF00, 0x000000FF)
    assert np.array_equal(decode_bmp(ok)[:, :, :3], img)
    with pytest.raises(ValueError, match="unsupported channel masks"):
        decode_bmp(bitfields_bmp(0x000000FF, 0x0000FF00, 0x00FF0000))
