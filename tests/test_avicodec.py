"""AVI container codec: lossless round-trip, header honesty,
robustness."""

import random
import struct

import numpy as np
import pytest

from crystal_html5_spark.sparkjob.avicodec import (
    AviError,
    decode_avi,
    encode_avi,
)


@pytest.mark.parametrize("n,h,w", [(3, 6, 8), (1, 1, 1), (5, 7, 13),
                                   (2, 16, 5), (4, 8, 8)])
def test_lossless_round_trip(n, h, w):
    fr = ((np.arange(n * h * w, dtype=np.int64) * 29) % 256) \
        .astype(np.uint8).reshape(n, h, w)
    w2, h2, fps, out = decode_avi(encode_avi(fr, fps=12))
    assert (w2, h2, fps) == (w, h, 12)
    assert np.array_equal(out, fr)  # uncompressed: bit-exact


def test_deterministic():
    fr = np.zeros((2, 4, 4), dtype=np.uint8)
    assert encode_avi(fr) == encode_avi(fr)


def test_rejects_compressed_fourcc():
    fr = np.zeros((1, 8, 8), dtype=np.uint8)
    blob = bytearray(encode_avi(fr))
    strf = blob.index(b"strf") + 8
    # biCompression lives at offset 16 of BITMAPINFOHEADER
    blob[strf + 16:strf + 20] = b"MJPG"
    with pytest.raises(AviError):
        decode_avi(bytes(blob))


def test_dimension_and_frame_bomb_guards():
    fr = np.zeros((1, 8, 8), dtype=np.uint8)
    blob = bytearray(encode_avi(fr))
    avih = blob.index(b"avih") + 8
    b2 = bytearray(blob)
    # dwWidth/dwHeight are dwords 8 and 9 of avih
    b2[avih + 32:avih + 40] = struct.pack("<II", 100000, 100000)
    with pytest.raises(AviError):
        decode_avi(bytes(b2))
    b3 = bytearray(blob)
    b3[avih + 16:avih + 20] = struct.pack("<I", 10**6)  # dwTotalFrames
    with pytest.raises(AviError):
        decode_avi(bytes(b3))


def test_frame_count_must_match_header():
    fr = np.zeros((2, 4, 4), dtype=np.uint8)
    blob = bytearray(encode_avi(fr))
    avih = blob.index(b"avih") + 8
    blob[avih + 16:avih + 20] = struct.pack("<I", 7)
    with pytest.raises(AviError):
        decode_avi(bytes(blob))


def test_fuzz_typed_errors_only():
    rng = random.Random(6)
    fr = ((np.arange(3 * 5 * 9) * 11) % 256).astype(np.uint8) \
        .reshape(3, 5, 9)
    blob = encode_avi(fr)
    for cut in (4, 11, 40, len(blob) // 2, len(blob) - 2):
        try:
            decode_avi(blob[:cut])
        except AviError:
            pass
    for _ in range(300):
        junk = b"RIFF" + bytes(rng.randrange(256)
                               for _ in range(rng.randrange(0, 120)))
        try:
            decode_avi(junk)
        except AviError:
            pass
    for _ in range(100):
        b2 = bytearray(blob)
        b2[rng.randrange(len(b2))] = rng.randrange(256)
        try:
            decode_avi(bytes(b2))
        except AviError:
            pass


def test_color_24bit_round_trip():
    """24-bit BI_RGB: BGR bottom-up rows with 4-byte padding round-trip
    losslessly to RGB frames, incl. widths whose 3w needs padding."""
    import numpy as np

    rng = np.random.default_rng(21)
    for shape in [(2, 3, 4, 3), (3, 7, 5, 3), (1, 1, 1, 3), (2, 6, 8, 3)]:
        fr = rng.integers(0, 256, shape).astype(np.uint8)
        w, h, fps, out = decode_avi(encode_avi(fr, fps=9))
        assert (w, h, fps) == (shape[2], shape[1], 9)
        assert out.shape == shape and np.array_equal(out, fr)


def test_color_rejects_bad_channel_count():
    import numpy as np

    with pytest.raises(AviError):
        encode_avi(np.zeros((2, 3, 4, 4), dtype=np.uint8))


def test_color_fuzz_typed_errors_only():
    import random as _random

    import numpy as np

    blob = encode_avi(
        (np.arange(2 * 4 * 5 * 3) % 256).astype(np.uint8)
        .reshape(2, 4, 5, 3))
    rng = _random.Random(77)
    for _ in range(150):
        corrupt = bytearray(blob)
        corrupt[rng.randrange(len(blob))] ^= 1 << rng.randrange(8)
        try:
            decode_avi(bytes(corrupt))
        except AviError:
            pass  # typed rejection is the contract
