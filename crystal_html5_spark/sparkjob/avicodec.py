"""Pure-stdlib AVI (RIFF) container codec for uncompressed video:
8-bit grayscale and 24-bit BI_RGB color.

Completes the multimodal decode set (pngcodec/wavcodec/jpegcodec):
video stays an opaque binary column; this module gives it an honest
container parse — real RIFF/LIST walking, real ``avih``/``strh``/
``strf`` headers, real DIB frame payloads ('00db' chunks, bottom-up
rows padded to 4 bytes; 8-bit with grayscale palette, or 24-bit
BGR-ordered BI_RGB) — per the public Microsoft RIFF/AVI specification.
Frame-sampling features come from the actual decoded frames.

Scope is honest: a single uncompressed 8- or 24-bit video stream.
Compressed FourCCs and other bit depths raise ``AviError`` and the
pipeline's feature path falls back.
"""

from __future__ import annotations

import struct

import numpy as np


class AviError(ValueError):
    """Malformed or unsupported AVI input."""


_MAX_PIXELS_PER_FRAME = 16_000_000
_MAX_FRAMES = 100_000


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""  # RIFF word alignment
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi(frames, fps: int = 10) -> bytes:
    """Encode uint8 frames as an uncompressed AVI: (n, h, w) arrays
    become 8-bit grayscale (palette DIB), (n, h, w, 3) RGB arrays
    become 24-bit BI_RGB (BGR byte order on disk, per the DIB spec)."""
    arr = np.asarray(frames, dtype=np.uint8)
    color = arr.ndim == 4 and arr.shape[3] == 3
    if (arr.ndim not in (3, 4) or arr.size == 0
            or (arr.ndim == 4 and not color)):
        raise AviError(
            "encode_avi wants a non-empty (n, h, w) or (n, h, w, 3) array")
    n, h, w = arr.shape[:3]
    if fps <= 0:
        raise AviError("fps must be positive")
    bpp = 3 if color else 1
    stride = (w * bpp + 3) & ~3  # DIB rows pad to 4 bytes
    frame_bytes = stride * h

    # Main AVI header (avih): microsec/frame, max bytes/sec, padding,
    # flags, total frames, initial frames, streams, buffer size, dims,
    # 4 reserved dwords.
    avih = struct.pack(
        "<14I", 1_000_000 // fps, frame_bytes * fps, 0, 0x10, n, 0, 1,
        frame_bytes, w, h, 0, 0, 0, 0)
    # Stream header (strh): 'vids', no FourCC (uncompressed DIB),
    # scale/rate = 1/fps, length = n frames.
    strh = (b"vids" + b"\x00\x00\x00\x00"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                          frame_bytes, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    # Stream format (strf): BITMAPINFOHEADER (+ 256-gray palette for
    # 8-bit; 24-bit BI_RGB carries no palette).
    bmih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8 * bpp, 0,
                       frame_bytes, 0, 0, 256 if not color else 0, 0)
    palette = (b"" if color
               else bytes(v for g in range(256) for v in (g, g, g, 0)))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", bmih + palette)))
    movi_body = b""
    pad_cols = stride - w * bpp
    for f in arr:
        if color:
            dib = np.flipud(f[:, :, ::-1])  # bottom-up, RGB -> BGR
            dib = dib.reshape(h, w * 3)
        else:
            dib = np.flipud(f)  # DIB rows are bottom-up
        if pad_cols:
            dib = np.pad(dib, ((0, 0), (0, pad_cols)))
        movi_body += _chunk(b"00db", dib.tobytes())
    movi = _list(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(data: bytes):
    """Decode an uncompressed AVI per the RIFF spec -> (width, height,
    fps, frames): (n, h, w) uint8 for 8-bit grayscale streams,
    (n, h, w, 3) RGB for 24-bit BI_RGB."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI stream")
    w = h = -1
    fps = 0
    n_frames = -1
    bitcount = -1
    compression = -1
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int, depth: int) -> None:
        nonlocal w, h, fps, n_frames, bitcount, compression
        if depth > 8:
            raise AviError("RIFF nesting too deep")
        while pos + 8 <= end:
            cid = data[pos:pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise AviError("truncated chunk")
            if cid == b"LIST":
                walk(body_start + 4, body_end, depth + 1)
            elif cid == b"avih":
                if size < 40:
                    raise AviError("short avih")
                vals = struct.unpack("<10I", data[body_start:body_start + 40])
                usec, n_frames, w, h = vals[0], vals[4], vals[8], vals[9]
                if w <= 0 or h <= 0 or w * h > _MAX_PIXELS_PER_FRAME:
                    raise AviError("implausible dimensions")
                if n_frames > _MAX_FRAMES:
                    raise AviError("implausible frame count")
                fps = round(1_000_000 / usec) if usec else 0
            elif cid == b"strf":
                if size < 20:
                    raise AviError("short strf")
                _sz, _w, _h, _planes, bitcount, compression = \
                    struct.unpack("<IiiHHI", data[body_start:body_start + 20])
            elif cid[2:4] in (b"db", b"dc"):
                if w < 0:
                    raise AviError("frame chunk before headers")
                if compression != 0 or bitcount not in (8, 24):
                    raise AviError(
                        "only uncompressed 8/24-bit supported")
                bpp = bitcount // 8
                stride = (w * bpp + 3) & ~3
                if size != stride * h:
                    raise AviError("frame size mismatch")
                dib = np.frombuffer(
                    data[body_start:body_end], dtype=np.uint8
                ).reshape(h, stride)
                if bpp == 1:
                    frames.append(np.flipud(dib[:, :w]))
                else:  # 24-bit: rows bottom-up, BGR -> RGB
                    px = dib[:, :w * 3].reshape(h, w, 3)
                    frames.append(np.flipud(px)[:, :, ::-1])
            pos = body_end + (size & 1)  # word alignment

    walk(12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0]), 0)
    if w < 0 or not frames:
        raise AviError("no decodable frames")
    if n_frames >= 0 and n_frames != len(frames):
        raise AviError("frame count disagrees with header")
    return w, h, fps, np.stack(frames)
