"""Minimal pure-Python PNG codec.

Vendored so the REAL-mime decode path of
:mod:`tafra_spark.functions.multimodal` is exercisable in environments
without PIL (this container): `image/png` payloads decode through this
module when PIL is absent, and tests round-trip genuine PNG bytes
through the Arrow-batched pipeline instead of only the `image/fake`
grid. Decode coverage: 8-bit gray/gray+alpha/RGB/RGBA, PALETTED images
at bit depths 1/2/4/8 (PLTE lookup, optional tRNS alpha), sub-byte
grayscale, 16-bit channels (high byte kept), and — r8 — Adam7
interlace for all of those (seven sub-image passes, each unfiltered
independently and scattered into the final grid; the likeliest fence a
real web crawl used to trip). (Round 6 extended the r5 grayscale-only
version to color types 2/4/6; r7 added palette/sub-byte/16-bit; r8
removed the last decode fence, Adam7.)

Implements the full scanline filter set (None/Sub/Up/Average/Paeth) of
the PNG spec (RFC 2083 §6) — encoders routinely emit any of them, so a
"filter 0 only" reader would quietly mangle real files.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "decode_png",
    "decode_png_gray",
    "encode_png_gray",
    "encode_png_rgb",
]

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: color type -> samples per pixel (8-bit depth, so also bytes/pixel)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

#: Adam7 pass grid: (x_start, y_start, x_step, y_step), RFC 2083 §2
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, offset: int, height: int, rowbytes: int, bpp: int):
    """Reverse the scanline filters over one (sub)image of ``height``
    rows of ``rowbytes`` bytes starting at ``offset`` in the inflated
    stream; returns (unfiltered byte grid, next offset)."""
    stride = rowbytes + 1
    if offset + stride * height > len(raw):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((height, rowbytes), dtype=np.uint8)
    prev = np.zeros(rowbytes, dtype=np.int32)
    for y in range(height):
        row = raw[offset + y * stride : offset + (y + 1) * stride]
        ftype = row[0]
        line = np.frombuffer(row[1:], np.uint8).astype(np.int32)
        cur = np.zeros(rowbytes, dtype=np.int32)
        if ftype == 0:  # None
            cur[:] = line
        elif ftype == 1:  # Sub ("left" = same channel, previous pixel)
            for x in range(rowbytes):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (line[x] + left) & 0xFF
        elif ftype == 2:  # Up
            cur[:] = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            for x in range(rowbytes):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (line[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(rowbytes):
                left = int(cur[x - bpp]) if x >= bpp else 0
                up_left = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (line[x] + _paeth(left, int(prev[x]), up_left)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out, offset + stride * height


def _to_samples(
    out: np.ndarray, width: int, height: int, channels: int, bit_depth: int
) -> np.ndarray:
    """Unfiltered byte rows -> RAW sample grid, shape (h, w) for one
    channel else (h, w, channels): 16-bit keeps the high byte, sub-byte
    depths unpack big-endian-within-byte (values NOT yet scaled /
    palette-mapped — that happens once on the assembled image)."""
    rowbytes = (width * channels * bit_depth + 7) // 8
    if bit_depth == 16:
        px = (
            out.reshape(height, rowbytes).view(">u2").astype(np.uint16) >> 8
        ).astype(np.uint8)
        if channels == 1:
            return px.reshape(height, width)
        return px.reshape(height, width, channels)
    if bit_depth < 8:
        bits = np.unpackbits(out, axis=1)[:, : width * bit_depth]
        vals = bits.reshape(height, width, bit_depth)
        weights = (1 << np.arange(bit_depth - 1, -1, -1)).astype(np.uint8)
        return (vals * weights).sum(axis=2).astype(np.uint8)
    if channels == 1:
        return out.reshape(height, width)
    return out.reshape(height, width, channels)


def decode_png(content: bytes) -> np.ndarray:
    """Decode a PNG to uint8: shape (h, w) for grayscale (color type
    0), (h, w, channels) otherwise. Supported: 8-bit
    gray/gray+alpha/RGB/RGBA (types 0/2/4/6), PALETTED (type 3, bit
    depths 1/2/4/8, with optional tRNS alpha -> RGBA), sub-byte
    grayscale (depths 1/2/4, scaled to full 8-bit range), 16-bit
    gray/gray+alpha/RGB/RGBA (high byte kept — NOTE: PIL's own
    convert("L") would CLAMP 16-bit values instead, so the PIL decode
    path in multimodal normalizes 16-bit modes the same high-byte way),
    each in both sequential and Adam7-interlaced layout (r8)."""
    if content[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = bpp = None
    color_type = 0
    bit_depth = 8
    interlace = 0
    palette = None
    trns = None
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
            ok = (
                (bit_depth == 8 and color_type in (0, 2, 3, 4, 6))
                or (bit_depth == 16 and color_type in (0, 2, 4, 6))
                or (bit_depth in (1, 2, 4) and color_type in (0, 3))
            )
            if not ok or interlace not in (0, 1):
                raise NotImplementedError(
                    "vendored PNG decoder: gray/gray+alpha/RGB/RGBA "
                    "(8/16-bit), paletted or sub-byte gray (1/2/4/8-bit), "
                    "sequential or Adam7 — install PIL for anything else; "
                    f"got depth={bit_depth} color={color_type} "
                    f"interlace={interlace}"
                )
            channels = 1 if color_type == 3 else _CHANNELS[color_type]
            # filters operate on BYTES: bpp = filter displacement
            bpp = max(1, channels * bit_depth // 8)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS" and color_type == 3:
            trns = np.frombuffer(data, np.uint8)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    raw = zlib.decompress(bytes(idat))
    channels = 1 if color_type == 3 else _CHANNELS[color_type]
    if interlace == 0:
        rowbytes = (width * channels * bit_depth + 7) // 8
        if len(raw) != (rowbytes + 1) * height:
            raise ValueError("PNG data length mismatch")
        out, _ = _unfilter(raw, 0, height, rowbytes, bpp)
        samples = _to_samples(out, width, height, channels, bit_depth)
    else:
        # Adam7: seven independent sub-images, each filtered within
        # its own pass (RFC 2083 §6.2: "filtering is done on each pass
        # independently"); empty passes contribute no scanlines
        shape = (
            (height, width) if channels == 1 else (height, width, channels)
        )
        samples = np.zeros(shape, dtype=np.uint8)
        offset = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rowbytes = (pw * channels * bit_depth + 7) // 8
            out, offset = _unfilter(raw, offset, ph, rowbytes, bpp)
            samples[y0::dy, x0::dx] = _to_samples(
                out, pw, ph, channels, bit_depth
            )
        if offset != len(raw):
            raise ValueError("PNG data length mismatch")
    if bit_depth < 8 and color_type == 0:
        # scale to the full 8-bit range (PIL's 1/2/4-bit gray view)
        return (samples * (255 // ((1 << bit_depth) - 1))).astype(np.uint8)
    if color_type == 3:
        return _apply_palette(samples, palette, trns)
    return samples


def _apply_palette(idx: np.ndarray, palette, trns) -> np.ndarray:
    """Palette-index grid -> RGB (or RGBA when a tRNS chunk provides
    per-entry alpha; entries past its end are opaque, per spec)."""
    if palette is None:
        raise ValueError("PNG: paletted image missing PLTE chunk")
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("PNG: palette index out of range")
    rgb = palette[idx]
    if trns is None:
        return rgb
    alpha = np.full(len(palette), 255, dtype=np.uint8)
    alpha[: len(trns)] = trns
    return np.dstack([rgb, alpha[idx]])


def decode_png_gray(content: bytes) -> np.ndarray:
    """Decode any supported PNG to an (h, w) uint8 LUMINANCE grid —
    the downstream (width, height, intensity) contract of
    :mod:`.multimodal`. Color collapses via PIL's exact ``convert("L")``
    fixed-point ITU-R 601-2 formula ``(R*19595 + G*38470 + B*7471 +
    0x8000) >> 16``, so environments with and without PIL produce
    identical grids; alpha is ignored, like PIL's RGB→L path."""
    arr = decode_png(content)
    if arr.ndim == 2:
        return arr
    if arr.shape[2] == 2:  # gray + alpha
        return arr[:, :, 0]
    r = arr[:, :, 0].astype(np.uint32)
    g = arr[:, :, 1].astype(np.uint32)
    b = arr[:, :, 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
        np.uint8
    )


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _raw_scanlines(a: np.ndarray, interlace: bool) -> bytes:
    """Filter-0 scanline serialization, sequential or Adam7."""
    h, w = a.shape[:2]
    if not interlace:
        return b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    out = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = a[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for y in range(sub.shape[0]):
            out += b"\x00" + sub[y].tobytes()
    return bytes(out)


def encode_png_gray(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an (h, w) uint8 array as an 8-bit grayscale PNG
    (filter 0 scanlines — any spec-compliant reader accepts it);
    ``interlace=True`` emits the Adam7 pass layout."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("encode_png_gray expects a 2-D array")
    h, w = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, int(interlace))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_raw_scanlines(a, interlace), 9))
        + _chunk(b"IEND", b"")
    )


def encode_png_rgb(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 array as an 8-bit RGB PNG
    (filter 0 scanlines); ``interlace=True`` emits Adam7."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_png_rgb expects an (h, w, 3) array")
    h, w, _ = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, int(interlace))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_raw_scanlines(a, interlace), 9))
        + _chunk(b"IEND", b"")
    )
