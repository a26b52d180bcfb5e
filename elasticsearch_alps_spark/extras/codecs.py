"""Pure-Python media codecs for the multimodal pipeline (r4, VERDICT r3
next #8): real decoders for the two formats that need no external codec
library — uncompressed BMP (BI_RGB 24/32-bit) and PCM WAV (8/16-bit) — so
``decode_media(fake=False)`` does real work and the NotImplementedError stub
boundary shrinks to compressed/exotic codecs only (PNG/JPEG/ffmpeg formats,
which genuinely need libraries this container doesn't ship).

Both decoders are numpy-vectorized after a struct-parsed header: the per-file
Python cost is header parsing; pixel/sample manipulation is one frombuffer +
reshape/astype. Formats are public: BMP per the Windows BITMAPINFOHEADER
layout, WAV per the RIFF/WAVE PCM spec.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


class UnsupportedMediaError(NotImplementedError):
    """Raised for formats outside the built-in pure-Python codecs (the
    documented stub boundary — PNG/JPEG/video need external libraries)."""


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
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise UnsupportedMediaError("WAVE missing fmt/data chunk")
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


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode mono float32 [-1,1] → 16-bit PCM WAV."""
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767) \
        .astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
