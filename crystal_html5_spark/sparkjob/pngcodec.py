"""Minimal pure-stdlib PNG codec (no PIL/libpng in this container).

Honest-decode path for the multimodal pipeline: width/height/pixels come
from actual IDAT pixel data, not from a stub.  Supports the subset a
training-data pipeline actually meets in practice for thumbnails:
8-bit depth, grayscale / RGB / RGBA, non-interlaced, all five scanline
filter types (None/Sub/Up/Average/Paeth, PNG spec §9).

The encoder exists so tests and the synthetic media table can produce
real, spec-valid PNGs deterministically; it can emit any filter type to
exercise every decoder branch.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # colortype -> samples per pixel


class PngError(ValueError):
    """Malformed or unsupported PNG input."""


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels, channels: int = 1, filter_type: int = 0) -> bytes:
    """Encode an (h, w*channels) uint8 array-like as a PNG.

    ``filter_type`` applies the same filter to every scanline (0..4), so
    tests can drive each decoder branch."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 2:
        raise PngError("pixels must be 2-d (h, w*channels)")
    h, row_bytes = arr.shape
    if row_bytes % channels:
        raise PngError("row width not a multiple of channels")
    w = row_bytes // channels
    colortype = {1: 0, 3: 2, 4: 6}.get(channels)
    if colortype is None:
        raise PngError(f"unsupported channel count {channels}")
    if not 0 <= filter_type <= 4:
        raise PngError(f"bad filter {filter_type}")

    raw = bytearray()
    prev = np.zeros(row_bytes, dtype=np.int64)
    for y in range(h):
        cur = arr[y].astype(np.int64)
        a = np.concatenate([np.zeros(channels, np.int64),
                            cur[:-channels]]) if row_bytes else cur
        b = prev
        c = np.concatenate([np.zeros(channels, np.int64),
                            prev[:-channels]]) if row_bytes else prev
        if filter_type == 0:
            out = cur
        elif filter_type == 1:
            out = cur - a
        elif filter_type == 2:
            out = cur - b
        elif filter_type == 3:
            out = cur - (a + b) // 2
        else:
            out = cur - _paeth(a, b, c)
        raw.append(filter_type)
        raw.extend((out % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _paeth(a, b, c):
    import numpy as np

    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(data: bytes, max_pixels: int = 1 << 26):
    """Decode a PNG -> (width, height, channels, pixels) where pixels is
    an (h, w*channels) uint8 numpy array of real, unfiltered samples.

    ``max_pixels`` bounds allocation against lying headers, and IDAT
    inflation is capped at the header-implied size (zip-bomb guard): at
    100 TB a hostile blob must become an error row, not an OOM."""
    import numpy as np

    if not data.startswith(_SIGNATURE):
        raise PngError("bad signature")
    pos = len(_SIGNATURE)
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise PngError("truncated chunk")
        crc = data[pos + 8 + length:pos + 12 + length]
        if len(crc) != 4 or struct.unpack(">I", crc)[0] != (
                zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise PngError("chunk crc mismatch")
        if ctype == b"IHDR":
            if len(body) != 13:
                raise PngError("bad IHDR length")
            width, height, depth, colortype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth}")
            if colortype not in _CHANNELS:
                raise PngError(f"unsupported color type {colortype}")
            if comp or filt or interlace:
                raise PngError("unsupported compression/filter/interlace")
            if not width or not height or width * height > max_pixels:
                raise PngError("unreasonable dimensions")
            channels = _CHANNELS[colortype]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise PngError("missing IHDR or IDAT")

    row_bytes = width * channels
    expected = height * (1 + row_bytes)
    try:
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected)
        if d.decompress(b"", 1):  # more output than the header implies
            raise PngError("idat inflates past header size")
    except zlib.error as e:
        raise PngError(f"idat: {e}") from e
    if len(raw) != expected:
        raise PngError("idat length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, 1 + row_bytes)
    filters, rows = raw[:, 0], raw[:, 1:].astype(np.int64)

    out = np.zeros((height, row_bytes), dtype=np.int64)
    prev = np.zeros(row_bytes, dtype=np.int64)
    for y in range(height):
        f, cur = int(filters[y]), rows[y]
        if f == 0:
            line = cur
        elif f == 2:
            line = (cur + prev) % 256
        elif f in (1, 3, 4):
            # Left-dependent filters are inherently sequential per pixel;
            # recur across the row in channel-sized steps.
            line = np.zeros(row_bytes, dtype=np.int64)
            for x in range(row_bytes):
                a = line[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                if f == 1:
                    v = cur[x] + a
                elif f == 3:
                    v = cur[x] + (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                    v = cur[x] + pred
                line[x] = v % 256
        else:
            raise PngError(f"bad filter byte {f}")
        out[y] = line
        prev = line
    return width, height, channels, out.astype(np.uint8)
