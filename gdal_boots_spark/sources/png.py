"""Minimal pure-Python PNG codec (grayscale 8/16-bit, RGB/RGBA 8-bit).

Replaces the reference's GDAL PNG driver for to_bytes/from_bytes
(gdal.py:566-607): real decode(encode(x)) == x round-trips stand in for
the reference's codec byte-size goldens (SURVEY §5a) — PNG is just
zlib + CRC chunks, no image library needed.

Encoder emits filter 0 (None) rows; decoder supports filters 0-4
(None/Sub/Up/Average/Paeth), non-interlaced only.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, zlevel: int = 6) -> bytes:
    """(h, w) uint8/uint16 grayscale, (h, w, 3) uint8 RGB or
    (h, w, 4) uint8 RGBA -> PNG."""
    if arr.ndim == 2 and arr.dtype == np.uint8:
        color, depth, raw = 0, 8, arr
    elif arr.ndim == 2 and arr.dtype == np.uint16:
        color, depth, raw = 0, 16, arr.astype(">u2")
    elif arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8:
        color, depth, raw = 2, 8, arr
    elif arr.ndim == 3 and arr.shape[2] == 4 and arr.dtype == np.uint8:
        color, depth, raw = 6, 8, arr
    else:
        raise ValueError("supported: uint8/uint16 gray, uint8 RGB/RGBA")
    h, w = arr.shape[:2]
    body = raw.tobytes()
    stride = len(body) // h
    rows = b"".join(b"\x00" + body[i * stride : (i + 1) * stride] for i in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(rows, zlevel)) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = depth = color = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", payload)
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    if color == 0:
        channels = 1
    elif color == 2:
        channels = 3
    elif color == 6:
        channels = 4
    else:
        raise ValueError(f"color type {color} unsupported")
    bpp = channels * (depth // 8)
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    p = 0
    for r in range(h):
        ftype = raw[p]
        row = np.frombuffer(raw[p + 1 : p + 1 + stride], dtype=np.uint8).astype(np.int32)
        p += 1 + stride
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub
            cur = row.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    if depth == 16:
        arr = out.view(">u2").astype(np.uint16).reshape(h, w)
    elif channels in (3, 4):
        arr = out.reshape(h, w, channels)
    else:
        arr = out.reshape(h, w)
    return arr
