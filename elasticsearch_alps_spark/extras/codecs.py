"""Pure-Python media codecs for the multimodal pipeline (r4, VERDICT r3
next #8): real decoders for the formats that need no external codec
library — uncompressed BMP (BI_RGB 24/32-bit), PCM WAV (8/16-bit), and
non-interlaced 8-bit PNG (all five scanline filters; gray/RGB/palette/
alpha color types, inflate via stdlib zlib) — so ``decode_media(fake=False)``
does real work and the NotImplementedError stub boundary shrinks to formats
that genuinely need libraries this container doesn't ship (JPEG, video,
compressed audio).

The decoders are numpy-vectorized after a struct-parsed header: BMP/WAV are
one frombuffer + reshape/astype; PNG unfilters None/Up/Sub rows fully
vectorized (Sub via a per-byte-lane cumsum) and falls back to a per-pixel
loop only for Average/Paeth rows, whose left-neighbor dependency is
inherently sequential. Formats are public: BMP per the Windows
BITMAPINFOHEADER layout, WAV per the RIFF/WAVE PCM spec, PNG per RFC 2083 /
the W3C PNG spec.
"""

from __future__ import annotations

import struct
import zlib
from typing import Tuple

import numpy as np


class UnsupportedMediaError(NotImplementedError):
    """Raised for formats outside the built-in pure-Python codecs (the
    documented stub boundary — JPEG/video need external libraries)."""


# --------------------------------------------------------------------- BMP

def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed BI_RGB 24- or 32-bit BMP → HxWx3 uint8 RGB.

    Handles both bottom-up (height > 0) and top-down (height < 0) layouts and
    the 4-byte row padding of the BMP format.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP file")
    pix_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise UnsupportedMediaError(f"BMP core-header size {hdr_size} unsupported")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:  # BI_RGB only (no RLE/bitfields)
        raise UnsupportedMediaError(f"BMP compression {compression} unsupported")
    if bpp not in (24, 32):
        raise UnsupportedMediaError(f"BMP bpp {bpp} unsupported")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise UnsupportedMediaError("BMP has empty dimensions")
    bytes_pp = bpp // 8
    row_stride = (width * bytes_pp + 3) & ~3  # rows pad to 4 bytes
    need = pix_offset + row_stride * height
    if len(payload) < need:
        raise UnsupportedMediaError(
            f"BMP truncated: need {need} bytes, have {len(payload)}")
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=row_stride * height, offset=pix_offset)
    rows = raw.reshape(height, row_stride)[:, :width * bytes_pp]
    px = rows.reshape(height, width, bytes_pp)
    if not top_down:
        px = px[::-1]  # bottom-up storage → flip to natural row order
    # BMP stores BGR(A) → return RGB
    return np.ascontiguousarray(px[:, :, 2::-1])


def image_feature(rgb: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic feature for a decoded image: a ``g×g`` box-downsampled
    grayscale thumbnail (g = floor(sqrt(dim))), zero-padded to ``dim``,
    scaled to [0, 1]. Box means are exact (no interpolation), so the feature
    is bit-stable across platforms."""
    g = max(1, int(dim ** 0.5))
    gray = rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = np.linspace(0, h, g + 1).astype(int)
    xs = np.linspace(0, w, g + 1).astype(int)
    cells = [gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                  xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
             for i in range(g) for j in range(g)]
    out = np.zeros(dim, dtype=np.float32)
    out[:len(cells)] = np.asarray(cells, dtype=np.float32) / 255.0
    return out


# --------------------------------------------------------------------- WAV

def decode_wav(payload: bytes) -> Tuple[int, int, int, np.ndarray]:
    """Decode a PCM RIFF/WAVE file → (n_frames, sample_rate, channels,
    mono float32 samples in [-1, 1]). 8-bit unsigned and 16-bit signed PCM.

    Walks the RIFF chunk list (fmt may be followed by LIST/fact chunks before
    data), ignoring unknown chunks like a spec-conforming reader.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise UnsupportedMediaError("not a RIFF/WAVE file")
    pos, fmt, data, data_size = 12, None, None, 0
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data, data_size = body, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise UnsupportedMediaError("WAVE missing fmt/data chunk")
    # a PCM fmt chunk is ≥16 bytes; shorter would make the slices below read
    # garbage or raise raw struct.error, escaping the documented boundary
    # exception type (ADVICE r4) — same for a data chunk whose declared size
    # exceeds the payload (would silently truncate samples)
    if len(fmt) < 16:
        raise UnsupportedMediaError(f"WAVE fmt chunk truncated ({len(fmt)} < 16 bytes)")
    if len(data) < data_size:
        raise UnsupportedMediaError(
            f"WAVE data chunk truncated ({len(data)} of {data_size} declared bytes)")
    audio_fmt, channels, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt != 1:  # PCM only (no float/ADPCM/extensible)
        raise UnsupportedMediaError(f"WAVE format {audio_fmt} unsupported")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2",
                                count=len(data) // 2).astype(np.float32) / 32768.0
    elif bits == 8:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
                   - 128.0) / 128.0
    else:
        raise UnsupportedMediaError(f"WAVE bit depth {bits} unsupported")
    if channels > 1:
        n = len(samples) // channels
        samples = samples[:n * channels].reshape(n, channels).mean(axis=1)
    return len(samples), rate, channels, samples


def audio_feature(samples: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic feature for decoded audio: per-segment RMS energy over
    ``dim`` equal time slices (a coarse loudness envelope)."""
    out = np.zeros(dim, dtype=np.float32)
    if len(samples) == 0:
        return out
    edges = np.linspace(0, len(samples), dim + 1).astype(int)
    for i in range(dim):
        seg = samples[edges[i]:max(edges[i + 1], edges[i] + 1)]
        out[i] = np.sqrt(np.mean(seg.astype(np.float64) ** 2))
    return out


# --------------------------------------------------------------------- PNG

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type: 0 gray, 2 RGB, 3 palette, 4 gray+α, 6 RGB+α
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG → HxWx3 uint8 RGB.

    All five scanline filters (None/Sub/Up/Average/Paeth) and all five
    color types (palette via PLTE; alpha dropped). Inflate is stdlib zlib;
    CRCs are not verified (a decoder may skip them; encoders we emit write
    correct ones). 16-bit depth and Adam7 interlace raise
    UnsupportedMediaError.
    """
    if payload[:8] != PNG_MAGIC:
        raise UnsupportedMediaError("not a PNG file")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        ln = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise UnsupportedMediaError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13])
    if depth != 8:
        raise UnsupportedMediaError(f"PNG bit depth {depth} unsupported")
    if interlace != 0:
        raise UnsupportedMediaError("interlaced (Adam7) PNG unsupported")
    bpp = _PNG_CHANNELS.get(color)
    if bpp is None:
        raise UnsupportedMediaError(f"PNG color type {color} invalid")
    if w <= 0 or h <= 0:
        raise UnsupportedMediaError("PNG has empty dimensions")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise UnsupportedMediaError(f"PNG inflate failed: {e}") from e
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        raise UnsupportedMediaError("PNG pixel data truncated")
    arr = np.frombuffer(raw, np.uint8,
                        count=h * (stride + 1)).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, cur = arr[y, 0], arr[y, 1:]
        if f == 0:          # None
            rec = cur.copy()
        elif f == 2:        # Up — uint8 addition wraps mod 256, as specified
            rec = cur + prev
        elif f == 1:        # Sub — per-byte-lane cumsum (x_i = raw_i + x_{i-bpp})
            rec = np.cumsum(cur.reshape(w, bpp).astype(np.uint64),
                            axis=0).astype(np.uint8).reshape(stride)
        elif f == 3:        # Average — left-neighbor dependency → sequential
            rec = np.empty(stride, np.uint8)
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                rec[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:        # Paeth — sequential for the same reason
            rec = np.empty(stride, np.uint8)
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (int(cur[i]) + pr) & 0xFF
        else:
            raise UnsupportedMediaError(f"PNG filter type {f} invalid")
        out[y] = rec
        prev = rec
    px = out.reshape(h, w, bpp)
    if color == 2:
        rgb = px
    elif color == 6:
        rgb = px[:, :, :3]
    elif color == 0:
        rgb = np.repeat(px, 3, axis=2)
    elif color == 4:
        rgb = np.repeat(px[:, :, :1], 3, axis=2)
    else:  # color == 3: palette
        if plte is None:
            raise UnsupportedMediaError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, np.uint8)
        pal = pal[:(len(pal) // 3) * 3].reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise UnsupportedMediaError("PNG palette index out of range")
        rgb = pal[idx]
    return np.ascontiguousarray(rgb)


# ------------------------------------------------------------------ encode
# Minimal encoders so tests can synthesize real files without fixtures on
# disk (and a user can round-trip).

def encode_bmp(rgb: np.ndarray) -> bytes:
    """Encode HxWx3 uint8 RGB → 24-bit bottom-up BI_RGB BMP."""
    h, w, _ = rgb.shape
    row_stride = (w * 3 + 3) & ~3
    img_size = row_stride * h
    bgr = rgb[:, :, ::-1]
    rows = np.zeros((h, row_stride), dtype=np.uint8)
    rows[:, :w * 3] = bgr.reshape(h, w * 3)
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    return header + info + rows[::-1].tobytes()  # bottom-up row order


def encode_png(rgb: np.ndarray, row_filters=None) -> bytes:
    """Encode HxWx3 uint8 RGB → 8-bit truecolor PNG (valid CRCs).

    ``row_filters`` (sequence cycled over rows, values 0-4) selects the
    scanline filter per row — the spec's forward filters reference the
    previous ORIGINAL bytes (= reconstructed bytes), so forward filtering
    vectorizes; tests use this to exercise every unfilter path in
    :func:`decode_png`.
    """
    h, w, _ = rgb.shape
    bpp = 3
    raw = rgb.reshape(h, w * bpp).astype(np.int16)
    zeros = np.zeros(bpp, np.int16)
    lines = []
    prev = np.zeros(w * bpp, np.int16)
    for y in range(h):
        cur = raw[y]
        f = int(row_filters[y % len(row_filters)]) if row_filters else 0
        left = np.concatenate([zeros, cur[:-bpp]])
        upleft = np.concatenate([zeros, prev[:-bpp]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        else:  # 4: Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            filt = cur - pred
        lines.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    comp = zlib.compress(b"".join(lines))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp)
            + chunk(b"IEND", b""))


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode mono float32 [-1,1] → 16-bit PCM WAV."""
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767) \
        .astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
