"""Pure-Python media codecs: PPM (P6/P3), BMP (24/32-bit), WAV (PCM),
PNG (8-bit, non-interlaced — stdlib zlib).

These close the multimodal ``decode_stub="real"`` seam
(operators/multimodal.py) without external image/audio libraries: each
format is simple enough that a correct reader/writer fits in numpy —
headers parsed from the spec'd byte layout, pixel/sample payloads
decoded with ``np.frombuffer`` (no per-pixel Python). The reference
engine has no media surface (SURVEY.md §1.2); this is part of the
training-data-pipeline extension.

Format notes (public specs):

* **PPM** — netpbm: ``P6`` (binary) / ``P3`` (ascii); header tokens
  width, height, maxval separated by whitespace, ``#`` comments
  allowed; maxval ≤ 255 → 1 byte/sample, else 2 bytes big-endian.
* **BMP** — 14-byte file header (``BM``, file size, pixel-data offset)
  + BITMAPINFOHEADER (≥40 bytes: width, height, bpp, compression);
  uncompressed 24-bit BGR / 32-bit BGRA, rows padded to 4 bytes,
  positive height = bottom-up row order.
* **WAV** — RIFF container: ``fmt `` chunk (PCM=1 or IEEE float=3,
  channels, sample rate, bits/sample) + ``data`` chunk; interleaved
  frames; unknown chunks are skipped by declared size (word-aligned).
* **Y4M** — YUV4MPEG2, the uncompressed video container ffmpeg pipes:
  ascii stream header ``YUV4MPEG2`` + space-separated tagged params
  (``W<width> H<height> F<num>:<den> I<interlace> A<aspect>
  C<colorspace>``) terminated by ``\\n``; each frame is ``FRAME``
  (+ optional params) ``\\n`` followed by raw planar YUV. Supported
  colorspaces: ``C444`` (3 full planes), ``C420``/``C420jpeg``/
  ``C420mpeg2``/``C420paldv`` (U/V at half resolution, even dims
  required), ``Cmono`` (luma only).
* **PNG** — the one COMPRESSED format here, feasible without an image
  library because its compression is stdlib ``zlib``: 8-byte
  signature, CRC-checked chunks (IHDR geometry/color-type, optional
  PLTE palette, concatenated IDAT deflate stream, IEND), scanlines
  prefixed by a per-row filter byte (0 None, 1 Sub, 2 Up, 3 Average,
  4 Paeth). Supported: bit depth 8, color types 0 (gray), 2 (RGB),
  3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced. Unfiltering
  is vectorized where the recurrence allows (None/Sub/Up); Average and
  Paeth depend on BOTH the left and up neighbors and are inherently
  sequential, so those rows fall back to a per-pixel loop — our own
  encoder always emits filter 0, so self-produced files decode with
  zero per-pixel Python.

Decoded images are ``uint8`` HxWx3 RGB arrays; audio is an
(n_frames, channels) array. Encoders emit canonical minimal files, so
encode→decode round-trips bit-identically — the property the tests
pin.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PPM (netpbm P6 binary / P3 ascii)
# ---------------------------------------------------------------------------


def _ppm_tokens(buf: bytes, start: int, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated integer tokens from ``buf``
    beginning at ``start``, honoring ``#`` comments; returns (tokens,
    next offset)."""
    toks: list[int] = []
    i = start
    while len(toks) < n:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if i < len(buf) and buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("ppm: truncated header")
        toks.append(int(buf[i:j]))
        i = j
    return toks, i


def decode_ppm(data: bytes) -> np.ndarray:
    """PPM bytes → uint8 HxWx3 RGB array (maxval>255 inputs are
    rescaled to 8-bit)."""
    magic = data[:2]
    if magic not in (b"P6", b"P3"):
        raise ValueError(f"ppm: bad magic {magic!r}")
    (w, h, maxval), i = _ppm_tokens(data, 2, 3)
    if w <= 0 or h <= 0 or not (0 < maxval < 65536):
        raise ValueError(f"ppm: bad dimensions {w}x{h} maxval={maxval}")
    n = w * h * 3
    if magic == b"P3":
        try:
            vals = np.array(data[i:].split()[:n], dtype=np.int64)
        except (ValueError, OverflowError) as e:  # non-numeric / >int64 token
            raise ValueError(f"ppm: bad P3 sample token ({e})") from e
        if vals.size != n:
            raise ValueError("ppm: truncated P3 pixel data")
    else:
        i += 1  # exactly one whitespace byte separates header and raster
        if maxval < 256:
            raw = np.frombuffer(data, dtype=np.uint8, count=n, offset=i)
            vals = raw.astype(np.int64)
        else:
            raw = np.frombuffer(data, dtype=">u2", count=n, offset=i)
            vals = raw.astype(np.int64)
    if maxval != 255:
        vals = vals * 255 // maxval
    return vals.astype(np.uint8).reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 HxWx3 RGB array → canonical binary P6 bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"ppm: want HxWx3, got {img.shape}")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit BGR / 32-bit BGRA, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → uint8 HxWx3 RGB array (alpha dropped for 32-bit)."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("bmp: bad magic or truncated file header")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError(f"bmp: unsupported header size {hdr_size}")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression not in (0, 3):  # BI_RGB / BI_BITFIELDS
        raise ValueError(f"bmp: unsupported compression {compression}")
    if bpp not in (24, 32):
        raise ValueError(f"bmp: unsupported bpp {bpp}")
    if compression == 3:
        # BI_BITFIELDS exists to express NON-default channel orders; we
        # decode assuming BGRA, so accept only masks that say exactly
        # that (alpha mask 0xFF000000 or absent) and reject the rest
        # rather than silently swapping channels. Masks live in-header
        # (BITMAPV2+/V4/V5, hdr_size >= 52) or right after a 40-byte
        # BITMAPINFOHEADER.
        mask_off = 14 + hdr_size if hdr_size == 40 else 54
        if len(data) < mask_off + 12:
            raise ValueError("bmp: BI_BITFIELDS without channel masks")
        r_m, g_m, b_m = struct.unpack_from("<III", data, mask_off)
        if (r_m, g_m, b_m) != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise ValueError(
                f"bmp: unsupported channel masks "
                f"({r_m:#010x}/{g_m:#010x}/{b_m:#010x}; want BGRA order)")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"bmp: bad dimensions {w}x{h}")
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3  # rows padded to 4 bytes
    need = pix_off + stride * h
    if len(data) < need:
        raise ValueError(f"bmp: truncated pixel data ({len(data)} < {need})")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                         offset=pix_off).reshape(h, stride)
    px = rows[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if not top_down:
        px = px[::-1]
    return px[:, :, 2::-1].copy()  # BGR(A) → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 HxWx3 RGB array → canonical 24-bit bottom-up BMP bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"bmp: want HxWx3, got {img.shape}")
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                       2835, 2835, 0, 0)
    return header + info + pix


# ---------------------------------------------------------------------------
# WAV (RIFF, PCM integer / IEEE float)
# ---------------------------------------------------------------------------

_WAV_DTYPES = {(1, 8): np.uint8, (1, 16): np.dtype("<i2"),
               (1, 32): np.dtype("<i4"), (3, 32): np.dtype("<f4")}


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n_frames, channels) sample array, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: bad RIFF/WAVE magic")
    fmt = payload = None
    i = 12
    while i + 8 <= len(data):  # chunk walk: id + size, word-aligned
        cid = data[i : i + 4]
        (size,) = struct.unpack_from("<I", data, i + 4)
        body = data[i + 8 : i + 8 + size]
        if len(body) != size:
            # a declared size past the buffer is a truncated file —
            # decoding the partial payload silently would misreport
            # n_samples/value stats downstream
            raise ValueError(
                f"wav: truncated chunk {cid!r} ({len(body)} < {size})")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            payload = body
        i += 8 + size + (size & 1)
    if fmt is None or payload is None:
        raise ValueError("wav: missing fmt or data chunk")
    if len(fmt) < 16:  # PCM fmt body is ≥16 bytes; truncation ends here
        raise ValueError(f"wav: truncated fmt chunk ({len(fmt)} bytes)")
    audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    dtype = _WAV_DTYPES.get((audio_fmt, bits))
    if dtype is None:
        raise ValueError(f"wav: unsupported format {audio_fmt}/{bits}-bit")
    if channels <= 0:
        raise ValueError("wav: zero channels")
    samples = np.frombuffer(payload, dtype=dtype)
    frames = samples.size // channels
    return samples[: frames * channels].reshape(frames, channels), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames, channels) int16 array → canonical PCM16 WAV bytes."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape
    payload = samples.tobytes()
    block = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block, block, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2 — ffmpeg's uncompressed planar video pipe format)
# ---------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"
#: colorspace → (u/v plane size as a fraction of w*h expressed as
#: (num, den), number of chroma planes)
_Y4M_CHROMA = {"444": (1, 1), "420": (1, 4), "420jpeg": (1, 4),
               "420mpeg2": (1, 4), "420paldv": (1, 4), "mono": (0, 1)}


def decode_y4m(data: bytes) -> tuple[np.ndarray, dict]:
    """Y4M bytes → ((n_frames, h, w) uint8 LUMA array, params dict
    ``{width, height, fps_num, fps_den, colorspace, n_frames}``).
    Chroma planes are validated for size and skipped — frame analytics
    here operate on luma; a full-YUV consumer reads the same layout."""
    if data[: len(_Y4M_MAGIC)] != _Y4M_MAGIC:
        raise ValueError("y4m: bad magic")
    nl = data.find(b"\n", len(_Y4M_MAGIC))
    if nl < 0:
        raise ValueError("y4m: unterminated stream header")
    w = h = None
    fps_num, fps_den, cspace = 30, 1, "420"
    for tok in data[len(_Y4M_MAGIC):nl].split():
        tag, val = tok[:1], tok[1:]
        try:
            if tag == b"W":
                w = int(val)
            elif tag == b"H":
                h = int(val)
            elif tag == b"F":
                fps_num, fps_den = (int(x) for x in val.split(b":"))
            elif tag == b"C":
                cspace = val.decode("ascii")
            # I (interlace), A (aspect), X (comment): validated as
            # well-formed tokens by the split, otherwise ignored
        except (ValueError, UnicodeDecodeError) as e:
            raise ValueError(f"y4m: malformed header token {tok!r}") from e
    if w is None or h is None or w <= 0 or h <= 0:
        raise ValueError("y4m: missing or bad W/H in stream header")
    if fps_den <= 0 or fps_num <= 0:
        raise ValueError("y4m: bad frame rate")
    chroma = _Y4M_CHROMA.get(cspace)
    if chroma is None:
        raise ValueError(f"y4m: unsupported colorspace C{cspace}")
    (cn, cd) = chroma
    if cn and cd == 4 and (w % 2 or h % 2):
        raise ValueError(f"y4m: C{cspace} requires even dimensions, got {w}x{h}")
    luma_size = w * h
    chroma_size = 0 if cn == 0 else 2 * (w * h * cn // cd)
    frame_size = luma_size + chroma_size
    frames = []
    i = nl + 1
    while i < len(data):
        fnl = data.find(b"\n", i)
        if fnl < 0 or data[i : i + 5] != b"FRAME":
            raise ValueError("y4m: malformed FRAME marker")
        body = data[fnl + 1 : fnl + 1 + frame_size]
        if len(body) != frame_size:
            raise ValueError("y4m: truncated frame payload")
        frames.append(np.frombuffer(body, dtype=np.uint8,
                                    count=luma_size).reshape(h, w))
        i = fnl + 1 + frame_size
    luma = (np.stack(frames) if frames
            else np.zeros((0, h, w), dtype=np.uint8))
    return luma, {"width": w, "height": h, "fps_num": fps_num,
                  "fps_den": fps_den, "colorspace": cspace,
                  "n_frames": len(frames)}


def encode_y4m(luma: np.ndarray, fps_num: int = 30, fps_den: int = 1,
               colorspace: str = "mono") -> bytes:
    """(n_frames, h, w) uint8 luma → canonical Y4M bytes. ``mono``
    writes luma only; ``444``/``420`` fill chroma planes with the
    neutral value 128 (gray — real color rides in a fuller encoder)."""
    luma = np.asarray(luma, dtype=np.uint8)
    if luma.ndim != 3:
        raise ValueError(f"y4m: want (n, h, w) luma, got {luma.shape}")
    chroma = _Y4M_CHROMA.get(colorspace)
    if chroma is None:
        raise ValueError(f"y4m: unsupported colorspace C{colorspace}")
    n, h, w = luma.shape
    if h <= 0 or w <= 0:
        raise ValueError(f"y4m: bad dimensions {w}x{h}")
    cn, cd = chroma
    if cn and cd == 4 and (w % 2 or h % 2):
        raise ValueError(f"y4m: C{colorspace} requires even dimensions")
    pad = b"" if cn == 0 else b"\x80" * (2 * (w * h * cn // cd))
    out = bytearray(b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n"
                    % (w, h, fps_num, fps_den, colorspace.encode("ascii")))
    for f in range(n):
        out += b"FRAME\n" + luma[f].tobytes() + pad
    return bytes(out)


# ---------------------------------------------------------------------------
# PNG (8-bit, non-interlaced; stdlib zlib for deflate + CRC-32)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: color type → samples per pixel in the filtered scanline
_PNG_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(data: bytes):
    """Yield (type, body) for each chunk, validating length and CRC-32
    (computed over type+body, per spec)."""
    i = len(_PNG_SIG)
    while i + 12 <= len(data):
        (size,) = struct.unpack_from(">I", data, i)
        ctype = data[i + 4 : i + 8]
        if i + 12 + size > len(data):  # body OR trailing CRC truncated
            raise ValueError(f"png: truncated chunk {ctype!r}")
        body = data[i + 8 : i + 8 + size]
        (crc,) = struct.unpack_from(">I", data, i + 8 + size)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: CRC mismatch in chunk {ctype!r}")
        yield ctype, body
        if ctype == b"IEND":
            return
        i += 12 + size
    raise ValueError("png: missing IEND")


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering. ``raw`` is h rows of
    (1 filter byte + stride filtered bytes); returns (h, stride) uint8.

    Filters 0/1/2 are vectorized (Sub is a running sum along the pixel
    lane → int cumsum mod 256; Up adds the already-reconstructed prior
    row). Average/Paeth read the up AND left reconstructed neighbors,
    a 2-D recurrence with no closed form — per-pixel loop, hit only on
    foreign files (our encoder emits filter 0)."""
    rows = raw.reshape(h, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(filters[y])
        cur = rows[y, 1:].astype(np.int64)
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: rec[x] = cur[x] + rec[x-bpp]
            lanes = cur[: (stride // bpp) * bpp].reshape(-1, bpp)
            rec = np.cumsum(lanes, axis=0).reshape(-1) % 256
            if stride % bpp:  # stride is w*bpp, so this never triggers; guard anyway
                rec = np.concatenate([rec, cur[len(rec):]])
        elif f == 2:  # Up: rec[x] = cur[x] + prev[x]
            rec = (cur + prev) % 256
        elif f in (3, 4):
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 3:
                    rec[x] = (cur[x] + (a + b) // 2) % 256
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"png: unknown filter type {f}")
        out[y] = rec
        prev = rec.astype(np.int64)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 HxWx3 RGB array (gray expanded, alpha
    dropped, palette resolved). 8-bit non-interlaced only."""
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("png: bad signature")
    ihdr = palette = None
    idat = bytearray()
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat.extend(body)
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("png: missing or malformed IHDR")
    w, h, depth, ctype_n, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if comp != 0 or filt != 0:
        raise ValueError("png: nonzero compression/filter method")
    if interlace != 0:
        raise ValueError("png: Adam7 interlacing not supported")
    if depth != 8:
        raise ValueError(f"png: only 8-bit depth supported, got {depth}")
    spp = _PNG_SAMPLES.get(ctype_n)
    if spp is None:
        raise ValueError(f"png: unknown color type {ctype_n}")
    if w <= 0 or h <= 0:
        raise ValueError(f"png: bad dimensions {w}x{h}")
    stride = w * spp
    expected = h * (stride + 1)
    try:
        # cap inflation at expected+1: a zip bomb (tiny IDAT inflating
        # to GBs) stops at the cap instead of exhausting task memory —
        # anything past `expected` is malformed either way
        dec = zlib.decompressobj()
        inflated = dec.decompress(bytes(idat), expected + 1)
    except zlib.error as e:  # keep the ValueError error contract
        raise ValueError(f"png: corrupt deflate stream ({e})") from e
    raw = np.frombuffer(inflated, dtype=np.uint8)
    if raw.size != expected or dec.unconsumed_tail:
        raise ValueError(
            f"png: decompressed size {raw.size} != {expected}"
            + (" (more data follows)" if dec.unconsumed_tail else ""))
    px = _png_unfilter(raw, h, stride, spp).reshape(h, w, spp)
    if ctype_n == 2:
        return px.copy()
    if ctype_n == 6:
        return px[:, :, :3].copy()
    if ctype_n == 0:
        return np.repeat(px, 3, axis=2)
    if ctype_n == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # palette
    if palette is None or len(palette) % 3:
        raise ValueError("png: palette image without valid PLTE")
    lut = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= lut.shape[0]:
        raise ValueError("png: palette index out of range")
    return lut[idx]


def encode_png(img: np.ndarray) -> bytes:
    """uint8 HxWx3 RGB array → canonical PNG bytes (color type 2,
    filter 0 on every scanline, one IDAT, fixed zlib level 6 so output
    bytes are deterministic for a given zlib build)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"png: want HxWx3, got {img.shape}")
    h, w = img.shape[:2]
    scanlines = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    scanlines[:, 1:] = img.reshape(h, w * 3)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(scanlines.tobytes(), 6)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def sniff_media(data: bytes) -> str | None:
    """Magic-byte detection: ``ppm`` | ``bmp`` | ``wav`` | ``png`` |
    None."""
    if data[:2] in (b"P6", b"P3"):
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[: len(_PNG_SIG)] == _PNG_SIG:
        return "png"
    if data[: len(_Y4M_MAGIC)] == _Y4M_MAGIC:
        return "y4m"
    return None


def decode_any(data: bytes) -> dict:
    """Decode a blob by sniffed format into uniform metadata:
    ``{format, width, height, channels, sample_rate, n_samples}`` —
    image fields null for audio and vice versa. Raises ValueError on
    unknown or malformed payloads (callers choose whether to
    null-tolerate)."""
    kind = sniff_media(data)
    if kind == "ppm":
        img = decode_ppm(data)
        return {"format": "ppm", "width": img.shape[1], "height": img.shape[0],
                "channels": 3, "sample_rate": None, "n_samples": None}
    if kind == "bmp":
        img = decode_bmp(data)
        return {"format": "bmp", "width": img.shape[1], "height": img.shape[0],
                "channels": 3, "sample_rate": None, "n_samples": None}
    if kind == "wav":
        audio, rate = decode_wav(data)
        return {"format": "wav", "width": None, "height": None,
                "channels": audio.shape[1], "sample_rate": rate,
                "n_samples": audio.shape[0]}
    if kind == "png":
        img = decode_png(data)
        return {"format": "png", "width": img.shape[1], "height": img.shape[0],
                "channels": 3, "sample_rate": None, "n_samples": None}
    if kind == "y4m":
        _, params = decode_y4m(data)
        # video reuses the generic slots: sample_rate = integer fps,
        # n_samples = frame count, channels = plane count
        return {"format": "y4m", "width": params["width"],
                "height": params["height"],
                "channels": 1 if params["colorspace"] == "mono" else 3,
                "sample_rate": params["fps_num"] // params["fps_den"],
                "n_samples": params["n_frames"]}
    raise ValueError(f"unrecognized media payload (first bytes {data[:4]!r})")


def resize_image_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index arithmetic (the classic
    ``floor((i+0.5)*src/dst)`` sample grid) — no interpolation library
    needed, exact for integer up/downscales."""
    if w <= 0 or h <= 0:
        raise ValueError(f"resize: bad target {w}x{h}")
    src_h, src_w = img.shape[:2]
    ys = np.minimum((np.arange(h) + 0.5) * src_h / h, src_h - 1).astype(np.int64)
    xs = np.minimum((np.arange(w) + 0.5) * src_w / w, src_w - 1).astype(np.int64)
    return img[ys[:, None], xs[None, :]]
