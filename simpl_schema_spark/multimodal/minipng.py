"""Minimal pure-Python PNG codec (stdlib zlib/struct only).

Vendored so the REAL image-decode path (media.decode_image_features with
``use_stub=False``) is exercisable in environments without pillow: supports
the baseline subset — 8-bit depth, color types 0 (gray), 2 (RGB), 3
(palette), 4 (gray+alpha), 6 (RGBA), non-interlaced — which covers the PNGs
the tests generate and the overwhelming majority of crawl thumbnails.
Format per the public PNG specification (RFC 2083 / ISO 15948); written
from scratch, no third-party code.

Not a pillow replacement: production deployments should ship pillow (or a
real vision encoder) to the executors; this module keeps CI honest about
the decode path's plumbing.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["decode_png", "encode_png", "luminance_histogram", "PngError"]

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes):
    """→ ``(width, height, pixels)`` with ``pixels`` a list of rows, each a
    ``bytes`` of per-pixel channel values after palette expansion (so rows
    hold 1, 2, 3 or 4 bytes per pixel; palette images expand to RGB)."""
    if data[:8] != _SIGNATURE:
        raise PngError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos: pos + 4])
        ctype = data[pos + 4: pos + 8]
        body = data[pos + 8: pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise PngError(f"unsupported bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise PngError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise PngError("interlaced PNGs unsupported")
        elif ctype == b"PLTE":
            palette = [tuple(body[i: i + 3]) for i in range(0, len(body), 3)]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise PngError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    nch = _CHANNELS[color_type]
    stride = width * nch
    rows: list[bytes] = []
    prev = bytearray(stride)
    off = 0
    for _y in range(height):
        if off + 1 + stride > len(raw):
            raise PngError("truncated image data")
        ftype = raw[off]
        line = bytearray(raw[off + 1: off + 1 + stride])
        off += 1 + stride
        if ftype == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                up_left = prev[i - nch] if i >= nch else 0
                line[i] = (line[i] + _paeth(left, prev[i], up_left)) & 0xFF
        elif ftype != 0:
            raise PngError(f"unknown filter type {ftype}")
        prev = line
        if color_type == 3:
            if palette is None:
                raise PngError("palette image without PLTE")
            expanded = bytearray()
            for idx in line:
                expanded.extend(palette[idx])
            rows.append(bytes(expanded))
        else:
            rows.append(bytes(line))
    nch_out = 3 if color_type == 3 else nch
    return width, height, rows, nch_out


def luminance_histogram(data: bytes) -> tuple[int, int, list[int]]:
    """Decode and return ``(width, height, 256-bucket luminance histogram)``
    — ITU-R 601-2 weights, matching pillow's ``convert("L")``."""
    width, height, rows, nch = decode_png(data)
    hist = [0] * 256
    for row in rows:
        if nch == 1:
            for v in row:
                hist[v] += 1
        elif nch == 2:  # gray + alpha
            for i in range(0, len(row), 2):
                hist[row[i]] += 1
        else:  # RGB / RGBA
            step = nch
            for i in range(0, len(row), step):
                lum = (
                    row[i] * 299 + row[i + 1] * 587 + row[i + 2] * 114
                ) // 1000
                hist[lum] += 1
    return width, height, hist


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb_rows: list[bytes]) -> bytes:
    """Encode 8-bit RGB rows (``len == width*3`` each) as a valid PNG
    (filter 0 scanlines) — enough to build test fixtures without pillow."""
    if len(rgb_rows) != height or any(len(r) != width * 3 for r in rgb_rows):
        raise PngError("rgb_rows must be height rows of width*3 bytes")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rgb_rows)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
