"""Pure-stdlib WAV (RIFF/PCM) codec and JPEG header parser.

Together with ``pngcodec.py`` these give the multimodal pipeline honest
decode paths for three mime types with zero external codecs:

- WAV: FULL decode — sample rate, channels, and the actual PCM samples
  (16-bit LE), so audio features come from real amplitude data.
- JPEG: header-only decode — dimensions from the SOF0/1/2 frame marker
  (real pixel decode needs a DCT implementation; dimensions and
  component count are honestly parsed, features fall back to byte
  stripes and say so via the decoder column).
"""

from __future__ import annotations

import struct


class WavError(ValueError):
    """Malformed or unsupported WAV input."""


class JpegError(ValueError):
    """Malformed JPEG input."""


def encode_wav(samples, sample_rate: int = 8000,
               channels: int = 1) -> bytes:
    """Encode int16 samples (interleaved if multi-channel) as PCM WAV."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    data = arr.tobytes()
    block_align = 2 * channels
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes):
    """Decode PCM WAV -> (sample_rate, channels, samples int16 ndarray).

    Accepts the 16-bit PCM subset (format tag 1); walks RIFF chunks so
    extra chunks (LIST, fact, ...) are tolerated."""
    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE stream")
    pos = 12
    rate = channels = bits = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise WavError("truncated chunk")
        if cid == b"fmt ":
            if size < 16:
                raise WavError("short fmt chunk")
            tag, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if tag != 1:
                raise WavError(f"unsupported format tag {tag}")
            if bits != 16:
                raise WavError(f"unsupported bit depth {bits}")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise WavError("missing fmt or data chunk")
    if len(pcm) % 2:
        raise WavError("odd-length 16-bit PCM data")
    samples = np.frombuffer(pcm, dtype="<i2")
    return rate, channels, samples


def jpeg_dimensions(data: bytes):
    """Parse (width, height, n_components) from a JPEG's SOF marker."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (no SOI)")
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise JpegError("marker desync")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RST/TEM: bare
            pos += 2
            continue
        (size,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            if size < 8 or pos + 2 + size > n:
                raise JpegError("short SOF")
            _prec, h, w, ncomp = struct.unpack(
                ">BHHB", data[pos + 4:pos + 10])
            return w, h, ncomp
        if marker == 0xDA:  # SOS: entropy data follows, no SOF seen
            break
        pos += 2 + size
    raise JpegError("no SOF marker")


def encode_jpeg_stub(width: int, height: int, payload: bytes) -> bytes:
    """A structurally valid JPEG container (SOI/APP0/SOF0/SOS/EOI) with
    the given dimensions and opaque entropy payload — enough for header
    parsers (including this module's) to read real dimensions.  The scan
    data is not a decodable image; the pipeline's decoder column reports
    'jpeg-header' accordingly."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    sof = b"\xff\xc0" + struct.pack(">H", 11) \
        + struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    body = payload.replace(b"\xff", b"\xfe")  # no marker collisions
    return b"\xff\xd8" + app0 + sof + sos + body + b"\xff\xd9"
