"""Minimal pure-Python PNG codec (grayscale, 8-bit, non-interlaced).

Vendored so the REAL-mime decode path of
:mod:`tafra_spark.functions.multimodal` is exercisable in environments
without PIL (this container): `image/png` payloads decode through this
module when PIL is absent, and tests round-trip genuine PNG bytes
through the Arrow-batched pipeline instead of only the `image/fake`
grid. Deliberately fixture-grade: grayscale (color type 0), bit depth
8, no interlace — a color or 16-bit PNG still requires PIL and raises.

Implements the full scanline filter set (None/Sub/Up/Average/Paeth) of
the PNG spec (RFC 2083 §6) — encoders routinely emit any of them, so a
"filter 0 only" reader would quietly mangle real files.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png_gray", "encode_png_gray"]

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png_gray(content: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale non-interlaced PNG to (h, w) uint8."""
    if content[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos < len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8 or color_type != 0 or interlace != 0:
                raise NotImplementedError(
                    "vendored PNG decoder handles 8-bit grayscale "
                    "non-interlaced only (install PIL for the rest); got "
                    f"depth={bit_depth} color={color_type} "
                    f"interlace={interlace}"
                )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("PNG data length mismatch")
    out = np.zeros((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.int32)
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        ftype, line = row[0], np.frombuffer(row[1:], np.uint8).astype(np.int32)
        cur = np.zeros(width, dtype=np.int32)
        if ftype == 0:  # None
            cur[:] = line
        elif ftype == 1:  # Sub
            acc = 0
            for x in range(width):
                acc = (line[x] + acc) & 0xFF
                cur[x] = acc
        elif ftype == 2:  # Up
            cur[:] = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            left = 0
            for x in range(width):
                left = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
                cur[x] = left
        elif ftype == 4:  # Paeth
            left = up_left = 0
            for x in range(width):
                left = (line[x] + _paeth(left, int(prev[x]), up_left)) & 0xFF
                up_left = int(prev[x])
                cur[x] = left
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png_gray(arr: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 array as an 8-bit grayscale PNG
    (filter 0 scanlines — any spec-compliant reader accepts it)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("encode_png_gray expects a 2-D array")
    h, w = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )
