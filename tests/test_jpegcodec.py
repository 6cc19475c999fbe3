"""Baseline-JPEG codec: round-trip fidelity, stream-defined tables,
robustness.  Complements tests/test_multimodal.py's pipeline checks."""

import struct

import numpy as np
import pytest

from crystal_html5_spark.sparkjob.jpegcodec import (
    ZIGZAG,
    JpegCodecError,
    decode_jpeg,
    encode_jpeg,
)


def test_zigzag_is_the_standard_order():
    # Spot-check the generated T.81 Figure-5 sequence.
    assert ZIGZAG[:10] == (0, 1, 8, 16, 9, 2, 3, 10, 17, 24)
    assert ZIGZAG[-3:] == (55, 62, 63)
    assert sorted(ZIGZAG) == list(range(64))


@pytest.mark.parametrize("h,w", [(8, 8), (9, 16), (25, 47), (1, 1),
                                 (13, 5), (16, 16)])
def test_round_trip_close_and_exact_dims(h, w):
    px = ((np.arange(h * w, dtype=np.int64) * 31 + 7) % 256) \
        .astype(np.uint8).reshape(h, w)
    blob = encode_jpeg(px, quality=92)
    w2, h2, out = decode_jpeg(blob)
    assert (w2, h2) == (w, h)
    assert out.shape == (h, w)
    # Lossy but bounded: quantization error at q92 on this texture.
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 16


def test_smooth_image_near_lossless():
    px = np.tile(np.linspace(0, 255, 64).astype(np.uint8), (32, 1))
    _w, _h, out = decode_jpeg(encode_jpeg(px))
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 2


def test_deterministic_encode_and_decode():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    b1, b2 = encode_jpeg(px), encode_jpeg(px)
    assert b1 == b2
    assert np.array_equal(decode_jpeg(b1)[2], decode_jpeg(b2)[2])


def test_header_parser_interop():
    """wavcodec's header-only parser reads this encoder's SOF."""
    from crystal_html5_spark.sparkjob.wavcodec import jpeg_dimensions

    px = np.zeros((9, 17), dtype=np.uint8)
    assert jpeg_dimensions(encode_jpeg(px)) == (17, 9, 1)


def test_quality_controls_size():
    px = (np.arange(64 * 64, dtype=np.int64) * 97 % 256) \
        .astype(np.uint8).reshape(64, 64)
    assert len(encode_jpeg(px, quality=30)) < len(encode_jpeg(px, 95))


def test_decode_rejects_color_and_progressive():
    px = np.zeros((8, 8), dtype=np.uint8)
    blob = bytearray(encode_jpeg(px))
    sof = blob.index(b"\xff\xc0")
    blob[sof + 9] = 3  # claim 3 components
    with pytest.raises(JpegCodecError):
        decode_jpeg(bytes(blob))
    blob[sof + 9] = 1
    blob[sof + 1] = 0xC2  # progressive SOF
    with pytest.raises(JpegCodecError):
        decode_jpeg(bytes(blob))


def test_dimension_bomb_guard():
    px = np.zeros((8, 8), dtype=np.uint8)
    blob = bytearray(encode_jpeg(px))
    sof = blob.index(b"\xff\xc0")
    # SOF body: len(2) prec(1) h(2) w(2): claim 30000x30000.
    blob[sof + 5:sof + 9] = struct.pack(">HH", 30000, 30000)
    with pytest.raises(JpegCodecError):
        decode_jpeg(bytes(blob))


def test_truncated_and_garbage_inputs_raise_typed_error():
    import random

    px = ((np.arange(16 * 24) * 13) % 256).astype(np.uint8).reshape(16, 24)
    blob = encode_jpeg(px)
    for cut in (2, 10, len(blob) // 2, len(blob) - 3):
        try:
            decode_jpeg(blob[:cut])
        except JpegCodecError:
            pass  # typed rejection is the contract
    rng = random.Random(4)
    for _ in range(200):
        junk = b"\xff\xd8" + bytes(rng.randrange(256)
                                   for _ in range(rng.randrange(0, 80)))
        try:
            decode_jpeg(junk)
        except JpegCodecError:
            pass


def test_corrupted_entropy_data_never_escapes_untyped():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    blob = bytearray(encode_jpeg(px))
    sos = blob.index(b"\xff\xda")
    for _ in range(100):
        b2 = bytearray(blob)
        i = int(rng.integers(sos + 10, len(blob) - 2))
        b2[i] = int(rng.integers(0, 256))
        try:
            decode_jpeg(bytes(b2))
        except JpegCodecError:
            pass


def test_restart_interval_round_trip():
    """DRI + RST markers (spec conformance): identical pixels to the
    non-restart encoding, DC prediction reset at each interval."""
    px = ((np.arange(24 * 40, dtype=np.int64) * 37) % 256) \
        .astype(np.uint8).reshape(24, 40)
    _w, _h, base = decode_jpeg(encode_jpeg(px, quality=92))
    for ri in (1, 2, 3, 7):
        blob = encode_jpeg(px, quality=92, restart_interval=ri)
        assert b"\xff\xdd" in blob  # DRI segment present
        w, h, out = decode_jpeg(blob)
        assert (w, h) == (40, 24)
        assert np.array_equal(out, base)


def test_fill_bytes_before_marker_tolerated():
    px = np.zeros((8, 8), dtype=np.uint8)
    blob = bytearray(encode_jpeg(px))
    sof = blob.index(b"\xff\xc0")
    padded = bytes(blob[:sof]) + b"\xff\xff\xff" + bytes(blob[sof:])
    w, h, out = decode_jpeg(padded)
    assert (w, h) == (8, 8)
    assert np.array_equal(out, decode_jpeg(bytes(blob))[2])


def test_corrupt_restart_marker_raises_typed():
    px = ((np.arange(16 * 16, dtype=np.int64)) % 256) \
        .astype(np.uint8).reshape(16, 16)
    blob = bytearray(encode_jpeg(px, restart_interval=1))
    i = blob.index(b"\xff\xd0", blob.index(b"\xff\xda"))
    blob[i + 1] = 0xC8  # not an RST code
    with pytest.raises(JpegCodecError):
        decode_jpeg(bytes(blob))


@pytest.mark.parametrize("sub", ["444", "420"])
def test_color_round_trip(sub):
    h, w = 24, 33
    base = np.linspace(0, 255, w)
    img = np.stack([np.tile(base, (h, 1)),
                    np.tile(base[::-1], (h, 1)),
                    np.full((h, w), 128.0)], axis=2).astype(np.uint8)
    blob = encode_jpeg(img, quality=95, subsampling=sub)
    w2, h2, out = decode_jpeg(blob)
    assert (w2, h2) == (w, h) and out.shape == (h, w, 3)
    # smooth gradients: 4:4:4 near-lossless, 4:2:0 bounded chroma error
    tol = 2 if sub == "444" else 8
    assert np.abs(out.astype(int) - img.astype(int)).max() <= tol


def test_color_restart_interval():
    h, w = 20, 18
    img = ((np.arange(h * w * 3, dtype=np.int64) * 11) % 256) \
        .astype(np.uint8).reshape(h, w, 3)
    plain = decode_jpeg(encode_jpeg(img, quality=92,
                                    subsampling="420"))[2]
    rst = decode_jpeg(encode_jpeg(img, quality=92, subsampling="420",
                                  restart_interval=1))[2]
    assert np.array_equal(plain, rst)


def test_color_chroma_actually_decoded():
    """A uniform-luma, strong-chroma image must come back colored —
    byte stripes or a luma-only decode would return gray."""
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, :8] = (200, 40, 40)   # reddish
    img[:, 8:] = (40, 40, 200)   # bluish
    _w, _h, out = decode_jpeg(encode_jpeg(img, quality=95))
    left, right = out[:, :8].mean(axis=(0, 1)), out[:, 8:].mean(axis=(0, 1))
    assert left[0] > left[2] + 50   # red dominates left
    assert right[2] > right[0] + 50  # blue dominates right


# ---------------------------------------------------------- progressive

def test_progressive_emits_sof2_and_multiple_scans():
    px = (np.arange(24 * 40, dtype=np.int64) * 7 % 256) \
        .astype(np.uint8).reshape(24, 40)
    blob = encode_jpeg(px, progressive=True)
    assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob
    # gray progression: DC first + AC first + AC refine + DC refine
    assert blob.count(b"\xff\xda") == 4
    cblob = encode_jpeg(np.stack([px] * 3, axis=2), progressive=True,
                        subsampling="420")
    # color: DC first + 3x AC first + 3x AC refine + DC refine
    assert cblob.count(b"\xff\xda") == 8


def test_progressive_decodes_identical_to_baseline_gray():
    """Same quantized coefficients -> byte-identical pixels: the
    progressive re-encode must reconstruct exactly what the sequential
    stream does, across sizes that exercise partial MCUs and EOB runs."""
    rng = np.random.default_rng(11)
    shapes = [(8, 8), (16, 24), (9, 17), (40, 33), (64, 64)]
    for shape in shapes:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        for q in (35, 75, 92):
            base = decode_jpeg(encode_jpeg(img, quality=q))
            prog = decode_jpeg(encode_jpeg(img, quality=q,
                                           progressive=True))
            assert base[:2] == prog[:2]
            assert np.array_equal(base[2], prog[2]), (shape, q)


def test_progressive_decodes_identical_to_baseline_color():
    rng = np.random.default_rng(12)
    for shape in [(16, 24, 3), (9, 17, 3), (63, 65, 3)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        for sub in ("444", "420"):
            base = decode_jpeg(encode_jpeg(img, subsampling=sub))
            prog = decode_jpeg(encode_jpeg(img, subsampling=sub,
                                           progressive=True))
            assert np.array_equal(base[2], prog[2]), (shape, sub)


def test_progressive_eobrun_heavy_streams():
    """Flat/smooth images drive the EOB-run aggregation paths (EOBn
    with n>0 plus correction bits inside covered blocks)."""
    flat = np.full((50, 70), 128, np.uint8)
    base = decode_jpeg(encode_jpeg(flat))
    prog = decode_jpeg(encode_jpeg(flat, progressive=True))
    assert np.array_equal(base[2], prog[2])
    yy, xx = np.mgrid[0:100, 0:140]
    grad = ((yy + xx) // 4 % 256).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(grad, 75))
    prog = decode_jpeg(encode_jpeg(grad, 75, progressive=True))
    assert np.array_equal(base[2], prog[2])


def test_progressive_sparse_high_freq_zrl_refinement():
    """A single hot pixel per block puts long zero runs before the
    significant coefficient — ZRL emission inside first AND refinement
    scans, with correction bits crossing the runs."""
    img = np.zeros((32, 48), np.uint8)
    img[::7, ::11] = 255
    base = decode_jpeg(encode_jpeg(img, 90))
    prog = decode_jpeg(encode_jpeg(img, 90, progressive=True))
    assert np.array_equal(base[2], prog[2])


def test_progressive_truncation_and_bitflips_raise_typed():
    img = (np.arange(40 * 56, dtype=np.int64) * 13 % 256) \
        .astype(np.uint8).reshape(40, 56)
    blob = encode_jpeg(img, progressive=True)
    for cut in (24, len(blob) // 3, len(blob) - 5):
        try:
            decode_jpeg(blob[:cut])
        except JpegCodecError:
            pass  # typed rejection is the contract
    rng = np.random.default_rng(5)
    for _ in range(150):
        corrupt = bytearray(blob)
        corrupt[rng.integers(2, len(blob) - 2)] ^= 1 << rng.integers(8)
        try:
            decode_jpeg(bytes(corrupt))
        except JpegCodecError:
            pass  # either decodes (to something) or raises typed


def test_progressive_restart_intervals_round_trip():
    """DRI + RSTm inside progressive scans: DC predictors and EOB-run
    state reset at every marker, and the pixels still match the
    sequential stream exactly (gray and 4:2:0 color, restart interval
    smaller than blocks-per-scan so every scan kind emits markers)."""
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, 80))
    for ri in (1, 2, 5):
        blob = encode_jpeg(img, 80, restart_interval=ri,
                           progressive=True)
        assert b"\xff\xdd" in blob  # DRI present
        assert any(bytes((0xFF, 0xD0 + m)) in blob for m in range(8))
        prog = decode_jpeg(blob)
        assert np.array_equal(base[2], prog[2]), ri
    cimg = rng.integers(0, 256, (24, 33, 3)).astype(np.uint8)
    cbase = decode_jpeg(encode_jpeg(cimg, subsampling="420"))
    cprog = decode_jpeg(encode_jpeg(cimg, subsampling="420",
                                    restart_interval=3,
                                    progressive=True))
    assert np.array_equal(cbase[2], cprog[2])
