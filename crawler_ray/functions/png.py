"""Minimal REAL PNG codec (stdlib only: zlib + struct), 8-bit grayscale.

The sandbox has no PIL/ffmpeg, but PNG itself needs nothing beyond zlib —
so the multimodal decode path can operate on genuine, spec-conformant PNG
bytes (readable by any external tool) instead of an opaque fake payload:

- :func:`encode_png_gray`: PNG signature + IHDR + IDAT (zlib-compressed
  scanlines, selectable per-image filter type) + IEND, CRC32 per chunk
  (RFC 2083 / W3C PNG spec structure).
- :func:`decode_png_gray`: chunk walk with CRC validation, inflate, and
  full reconstruction of all five standard scanline filters (None, Sub,
  Up, Average, Paeth) — the decoder is general even though our encoder is
  simple.

Scope: color type 0 (grayscale), bit depth 8, no interlace — enough for
thumbnail/feature pipelines; anything else raises ValueError so callers
fall back to a real library when one exists.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png_gray(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a (h, w) uint8 array as a real grayscale PNG."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("encode_png_gray expects a 2-D grayscale array")
    h, w = img.shape
    if filter_type not in (0, 1, 2):
        raise ValueError("encoder supports filter types 0 (None), 1 (Sub), 2 (Up)")
    rows = []
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        row = img[y]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub: delta vs left neighbor
            left = np.concatenate([[0], row[:-1]]).astype(np.uint8)
            filt = (row - left).astype(np.uint8)
        else:  # Up: delta vs row above
            filt = (row - prev).astype(np.uint8)
        rows.append(bytes([filter_type]) + filt.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"".join(rows), 6)
    return _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png_gray(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale PNG to a (h, w) uint8 array, validating
    chunk CRCs and reconstructing any of the five standard filters."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    "only 8-bit grayscale non-interlaced PNGs are supported"
                )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (w + 1):
        raise ValueError("scanline payload size mismatch")
    out = np.zeros((h, w), dtype=np.uint8)
    stride = w + 1
    for y in range(h):
        ft = raw[y * stride]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=w, offset=y * stride + 1).copy()
        prev = out[y - 1] if y else np.zeros(w, dtype=np.uint8)
        if ft == 0:
            out[y] = line
        elif ft == 1:  # Sub
            acc = 0
            for x in range(w):
                acc = (line[x] + acc) & 0xFF
                out[y, x] = acc
        elif ft == 2:  # Up
            out[y] = (line + prev).astype(np.uint8)
        elif ft == 3:  # Average
            acc = 0
            for x in range(w):
                left = out[y, x - 1] if x else 0
                out[y, x] = (line[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(w):
                a = int(out[y, x - 1]) if x else 0
                b = int(prev[x])
                c = int(out[y - 1, x - 1]) if (x and y) else 0
                out[y, x] = (line[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ft}")
    return out


def synth_image(seed: str, h: int = 48, w: int = 64) -> np.ndarray:
    """Deterministic grayscale test image: gradient + seeded noise bands."""
    import hashlib

    base = np.add.outer(
        np.linspace(0, 180, h, dtype=np.float64),
        np.linspace(0, 60, w, dtype=np.float64),
    )
    dig = hashlib.sha256(seed.encode()).digest()
    rng = np.random.default_rng(int.from_bytes(dig[:8], "big"))
    noise = rng.integers(0, 32, size=(h, w))
    return ((base + noise) % 256).astype(np.uint8)
