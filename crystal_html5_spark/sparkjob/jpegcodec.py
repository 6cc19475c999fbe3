"""Pure-stdlib+numpy baseline JPEG codec (grayscale + YCbCr color).

Implements the real thing — forward/inverse 8x8 DCT, quantization,
zigzag, category/EXTEND coding and canonical Huffman entropy coding —
for baseline sequential (SOF0) images per the public ITU-T T.81 spec
(Annex F procedures, Annex K reference tables): single-component
grayscale AND 3-component YCbCr with 4:4:4, 4:2:2, 4:4:0 and 4:2:0
chroma subsampling on decode (the encoder emits grayscale or 4:2:0
color).  The decoder builds its Huffman tables and quantization tables
from the stream's own DHT/DQT segments, so it decodes any conforming
baseline JPEG in that scope, not just this module's output.

Restart intervals (DRI + RST0-7) and 0xFF fill bytes — both spec-
conforming — are handled on decode, and the encoder can emit restart
markers.  Progressive (SOF2) streams are both encoded and decoded per
T.81 Annex G (all four scan kinds: DC/AC first + refinement, EOB runs,
correction bits); a progressive re-encode of the same quantized
coefficients decodes to byte-identical pixels vs sequential.
Remaining honest fallback: arithmetic coding, non-8-bit precision and
unusual component counts raise ``JpegCodecError`` and the caller's
feature path falls back to header-only features.  Complements
pngcodec.py (PNG) and wavcodec.py (WAV + JPEG header-only parse).
"""

from __future__ import annotations

import struct

import numpy as np


class JpegCodecError(ValueError):
    """Malformed or unsupported JPEG input."""


# Guard against absurd dimension claims before allocating (same policy
# as pngcodec's zip-bomb guard).
_MAX_PIXELS = 16_000_000

# Zigzag scan order (T.81 Figure 5), generated rather than typed:
# diagonal s = row+col; even diagonals run bottom-left -> top-right.
ZIGZAG = []
for _s in range(15):
    _rng = range(max(0, _s - 7), min(_s, 7) + 1)
    for _r in (reversed(_rng) if _s % 2 == 0 else _rng):
        ZIGZAG.append(_r * 8 + (_s - _r))
ZIGZAG = tuple(ZIGZAG)

# Annex K.1 luminance quantization table (zigzag-natural row order).
_K1_QUANT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

# Annex K.2 chrominance quantization table.
_K2_QUANT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 / K.5 luminance Huffman specs: (BITS[1..16], HUFFVAL).
_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_VALS = tuple(range(12))

# Progressive-scan AC table: every 8-bit symbol (EOBn runs, ZRL, all
# run/size pairs) at a flat code length — canonical, conforming, and
# trivially correct; compression optimality is not this codec's goal.
# 255 symbols at length 9 (codes 0..254) + 1 at length 10.
_AC_PROG_BITS = (0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0)
_AC_PROG_VALS = tuple(range(256))
_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)

# 8x8 DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16).
_DCT_A = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 / np.sqrt(2)) if _u == 0 else 0.5
    for _x in range(8):
        _DCT_A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _canonical_codes(bits, vals):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} per T.81 Annex C."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _quant_table(quality: int, base=None) -> np.ndarray:
    """Annex K table scaled by the conventional libjpeg-style quality
    mapping (K.1 luminance by default, pass _K2_QUANT for chroma)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = ((_K1_QUANT if base is None else base) * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing (F.1.2.3)
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (B.2.1)

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw, block, qt_mat, dc_codes, ac_codes, pred,
                  a, zz):
    """Encode one level-shifted 8x8 block; returns the new DC pred."""
    coef = a @ block @ a.T
    q = np.round(coef / qt_mat).astype(np.int64).ravel()[zz]
    diff = int(q[0]) - pred
    pred = int(q[0])
    cat = _category(diff)
    code, length = dc_codes[cat]
    bw.write(code, length)
    if cat:
        bits = diff if diff > 0 else diff + (1 << cat) - 1
        bw.write(bits, cat)
    run = 0
    nz = np.nonzero(q[1:])[0]
    last_nz = int(nz[-1]) + 1 if nz.size else 0
    for k in range(1, last_nz + 1):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        cat = _category(v)
        code, length = ac_codes[(run << 4) | cat]
        bw.write(code, length)
        bits = v if v > 0 else v + (1 << cat) - 1
        bw.write(bits, cat)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return pred


def _rgb_to_ycbcr(px: np.ndarray):
    """JFIF/BT.601 full-range conversion, float planes."""
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = -h % mh
    pw = -w % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")         if (ph or pw) else plane


def encode_jpeg(pixels, quality: int = 92,
                restart_interval: int = 0,
                subsampling: str = "444",
                progressive: bool = False) -> bytes:
    """Encode uint8 pixels as baseline sequential (SOF0) or progressive
    (SOF2) JPEG.

    HxW arrays encode as single-component grayscale; HxWx3 arrays as
    YCbCr color (JFIF BT.601), ``subsampling`` '444' (no subsampling)
    or '420' (2x2 chroma, the common web shape).  Chroma uses the
    Annex K.2 quantization table (id 1); all components share the
    luminance Huffman tables (conforming — ids are per-scan-component).
    ``restart_interval`` > 0 emits DRI + RST0-7 every that many MCUs
    (byte-aligned; DC prediction and, in progressive AC scans, EOB-run
    state reset — the restart unit is one block in non-interleaved
    scans).

    ``progressive=True`` emits a T.81 Annex G progression exercising
    all four scan kinds: DC first (Al=1, interleaved), per-component AC
    first (Ss=1..63, Al=1, with EOB-run coding), per-component AC
    refinement (Ah=1, Al=0, correction bits), DC refinement.  The
    quantized coefficients are identical to the sequential path, so a
    progressive re-encode decodes to byte-identical pixels."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.size == 0 or px.ndim not in (2, 3) or             (px.ndim == 3 and px.shape[2] != 3):
        raise JpegCodecError("encode_jpeg wants HxW or HxWx3 uint8")
    if subsampling not in ("444", "420"):
        raise JpegCodecError("subsampling must be '444' or '420'")
    h, w = px.shape[:2]
    qt_l = _quant_table(quality)
    qts = [qt_l]
    color = px.ndim == 3
    if color:
        qt_c = _quant_table(quality, _K2_QUANT)
        qts.append(qt_c)
        y, cb, cr = _rgb_to_ycbcr(px)
        if subsampling == "420":
            # Box-average 2x2 chroma (pad odd dims first).
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2,
                             cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2,
                             crp.shape[1] // 2, 2).mean(axis=(1, 3))
            hv = [(2, 2), (1, 1), (1, 1)]
        else:
            hv = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qt_of = [0, 1, 1]
    else:
        planes = [px.astype(np.float64)]
        hv = [(1, 1)]
        qt_of = [0]
    hmax = max(x for x, _ in hv)
    vmax = max(v for _, v in hv)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # Pad each plane to its MCU-aligned size and level-shift.
    shifted = []
    for plane, (ch, cv) in zip(planes, hv):
        shifted.append(_pad_to(plane, 8 * mcuy * cv, 8 * mcux * ch)
                       [:8 * mcuy * cv, :8 * mcux * ch] - 128.0)

    if progressive:
        return _encode_progressive(
            h, w, shifted, hv, qt_of, qts, hmax, vmax,
            restart_interval)

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    preds = [0] * len(planes)
    a = _DCT_A
    zz = np.array(ZIGZAG)
    qt_mats = [q.reshape(8, 8).astype(np.float64) for q in qts]
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.pad_to_byte()
                bw.out += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            mcu += 1
            for c, (plane, (ch, cv)) in enumerate(zip(shifted, hv)):
                for vy in range(cv):
                    for vx in range(ch):
                        by = (my * cv + vy) * 8
                        bx = (mx * ch + vx) * 8
                        preds[c] = _encode_block(
                            bw, plane[by:by + 8, bx:bx + 8],
                            qt_mats[qt_of[c]], dc_codes, ac_codes,
                            preds[c], a, zz)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) \
            + body

    dqt = seg(0xDB, b"\x00" + bytes(int(qt_l[z]) for z in ZIGZAG))
    if color:
        dqt += seg(0xDB, b"\x01" + bytes(int(qts[1][z]) for z in ZIGZAG))
    ncomp = len(planes)
    sof_body = struct.pack(">BHHB", 8, h, w, ncomp)
    sos_body = bytes((ncomp,))
    for c in range(ncomp):
        ch, cv = hv[c]
        sof_body += bytes((c + 1, (ch << 4) | cv, qt_of[c]))
        sos_body += bytes((c + 1, 0x00))  # DC/AC table 0 for all
    sos_body += b"\x00\x3f\x00"
    sof = seg(0xC0, sof_body)
    dht = seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)) \
        + seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    dri = (seg(0xDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    sos = seg(0xDA, sos_body)
    return (b"\xff\xd8" + dqt + sof + dht + dri + sos + scan
            + b"\xff\xd9")


def _fdct_quant(plane: np.ndarray, qt_mat: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize every 8x8 block of a level-shifted,
    8-aligned plane at once -> (nby, nbx, 64) int64 in ZIGZAG order."""
    nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    # Broadcast matmul, NOT einsum: same summation order (and thus the
    # same float rounding at the quantizer's .5 boundaries) as the
    # sequential encoder's per-block `a @ block @ a.T`.
    coef = _DCT_A @ blocks @ _DCT_A.T
    q = np.round(coef / qt_mat).astype(np.int64).reshape(nby, nbx, 64)
    return q[:, :, list(ZIGZAG)]


def _emit_cat_bits(bw, codes, v: int) -> None:
    """category Huffman code + magnitude bits for a DC diff (F.1.2.1)."""
    cat = _category(v)
    code, length = codes[cat]
    bw.write(code, length)
    if cat:
        bw.write(v if v > 0 else v + (1 << cat) - 1, cat)


class _EobrunState:
    """Pending end-of-band run + buffered correction bits shared by the
    progressive AC scan emitters (G.1.2.2): EOB runs accumulate across
    blocks and their refinement correction bits must be emitted right
    after the EOBn symbol that closes the run."""

    def __init__(self, bw, ac_codes) -> None:
        self.bw = bw
        self.ac = ac_codes
        self.run = 0
        self.pending: list[int] = []

    def symbol(self, sym: int) -> None:
        code, length = self.ac[sym]
        self.bw.write(code, length)

    def flush(self) -> None:
        if self.run:
            cat = self.run.bit_length() - 1
            self.symbol(cat << 4)
            if cat:
                self.bw.write(self.run - (1 << cat), cat)
            self.run = 0
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []

    def add_eob(self, correction_bits: list[int]) -> None:
        self.run += 1
        self.pending.extend(correction_bits)
        if self.run == 0x7FFF:
            self.flush()


def _emit_ac_first(state: _EobrunState, bw, band: np.ndarray,
                   al: int) -> None:
    """One block of an AC first scan (Ah=0): run/size coding of the
    point-transformed band with EOB-run aggregation."""
    vals = [int(v) // (1 << al) if v >= 0 else -((-int(v)) >> al)
            for v in band]
    nz = [i for i, v in enumerate(vals) if v]
    if not nz:
        state.add_eob([])
        return
    state.flush()
    run = 0
    for i in range(nz[-1] + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            state.symbol(0xF0)  # ZRL
            run -= 16
        cat = _category(v)
        state.symbol((run << 4) | cat)
        bw.write(v if v > 0 else v + (1 << cat) - 1, cat)
        run = 0
    if nz[-1] + 1 < len(vals):
        state.add_eob([])


def _emit_ac_refine(state: _EobrunState, bw, band: np.ndarray,
                    al: int) -> None:
    """One block of an AC refinement scan (Ah=Al+1): newly significant
    coefficients as (run,1) symbols + sign, previously nonzero ones as
    buffered correction bits (G.1.2.3 / the classic two-buffer shape)."""
    absv = [(abs(int(v)) >> al) for v in band]
    signs = [1 if int(v) >= 0 else 0 for v in band]
    eob = 0  # index AFTER the last newly-significant coefficient
    for i, a in enumerate(absv):
        if a == 1:
            eob = i + 1
    run = 0
    corrections: list[int] = []
    for i, a in enumerate(absv):
        if a == 0:
            run += 1
            continue
        # ZRL flush BEFORE buffering this coefficient's bit: the decoder
        # consumes correction bits in coefficient order within the span
        # each symbol covers, so a previously-nonzero coefficient past a
        # >15 zero run must come after the ZRL that spends those zeros.
        while run > 15 and i < eob:
            state.flush()
            state.symbol(0xF0)
            run -= 16
            for b in corrections:
                bw.write(b, 1)
            corrections = []
        if a > 1:  # previously nonzero: correction bit, run unaffected
            corrections.append(a & 1)
            continue
        # newly significant (a == 1)
        state.flush()
        state.symbol((run << 4) | 1)
        bw.write(signs[i], 1)
        run = 0
        for b in corrections:
            bw.write(b, 1)
        corrections = []
    if run > 0 or corrections:
        state.add_eob(corrections)


def _encode_progressive(h: int, w: int, shifted, hv, qt_of, qts,
                        hmax: int, vmax: int,
                        restart_interval: int = 0) -> bytes:
    """Emit a complete SOF2 progressive stream for the prepared
    (level-shifted, MCU-padded) planes.  Progression script:

      1. DC first, all components interleaved, Al=1
      2. AC first  Ss=1..63 Al=1, one scan per component (EOB runs)
      3. AC refine Ss=1..63 Ah=1 Al=0, one scan per component
      4. DC refine, all components interleaved, Ah=1 Al=0

    — every Annex G scan kind a conforming decoder must handle.
    ``restart_interval`` > 0 emits DRI + RSTm every that many MCUs
    (blocks, for the non-interleaved AC scans), resetting DC
    predictors and flushing the EOB-run state per F.2.1.3.1."""
    ncomp = len(shifted)
    qt_mats = [q.reshape(8, 8).astype(np.float64) for q in qts]
    coefs = [_fdct_quant(plane, qt_mats[qt_of[c]])
             for c, plane in enumerate(shifted)]
    mcux = shifted[0].shape[1] // (8 * hv[0][0])
    mcuy = shifted[0].shape[0] // (8 * hv[0][1])

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) \
            + body

    def sos(comp_ids: list[int], ss: int, se: int, ah: int,
            al: int) -> bytes:
        body = bytes((len(comp_ids),))
        for cid in comp_ids:
            body += bytes((cid, 0x00))  # DC/AC table 0
        return seg(0xDA, body + bytes((ss, se, (ah << 4) | al)))

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_PROG_BITS, _AC_PROG_VALS)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + bytes(int(qts[0][z]) for z in ZIGZAG))
    if ncomp == 3:
        out += seg(0xDB, b"\x01" + bytes(int(qts[1][z]) for z in ZIGZAG))
    sof_body = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        ch, cv = hv[c]
        sof_body += bytes((c + 1, (ch << 4) | cv, qt_of[c]))
    out += seg(0xC2, sof_body)  # SOF2: progressive DCT, Huffman
    out += seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xC4, b"\x10" + bytes(_AC_PROG_BITS)
               + bytes(_AC_PROG_VALS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    def emit_rst(bw, rst: int) -> int:
        bw.pad_to_byte()
        bw.out += bytes((0xFF, 0xD0 + rst))
        return (rst + 1) % 8

    def comp_blocks(c: int):
        """Non-interleaved block grid (spec G.1: excludes MCU padding
        blocks of other components' geometry)."""
        ch, cv = hv[c]
        bw_ = (-(-(w * ch) // hmax) + 7) // 8
        bh_ = (-(-(h * cv) // vmax) + 7) // 8
        return bh_, bw_

    # Scan 1: DC first, interleaved, Al=1.
    bw = _BitWriter()
    preds = [0] * ncomp
    rst = mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                rst = emit_rst(bw, rst)
                preds = [0] * ncomp
            mcu += 1
            for c in range(ncomp):
                ch, cv = hv[c]
                for vy in range(cv):
                    for vx in range(ch):
                        dc = int(coefs[c][my * cv + vy, mx * ch + vx, 0])
                        v = dc >> 1  # DC point transform: arith shift
                        _emit_cat_bits(bw, dc_codes, v - preds[c])
                        preds[c] = v
    out += sos(list(range(1, ncomp + 1)), 0, 0, 0, 1) + bw.flush()

    # Scans 2..: AC first per component, Ss=1..63, Al=1.  Restart unit
    # for non-interleaved scans is one block; the EOB-run state must
    # flush before each marker.
    for c in range(ncomp):
        bw = _BitWriter()
        state = _EobrunState(bw, ac_codes)
        bh_, bw_n = comp_blocks(c)
        rst = unit = 0
        for by in range(bh_):
            for bx in range(bw_n):
                if restart_interval and unit \
                        and unit % restart_interval == 0:
                    state.flush()
                    rst = emit_rst(bw, rst)
                unit += 1
                _emit_ac_first(state, bw, coefs[c][by, bx, 1:], 1)
        state.flush()
        out += sos([c + 1], 1, 63, 0, 1) + bw.flush()

    # AC refinement per component, Ah=1 -> Al=0.
    for c in range(ncomp):
        bw = _BitWriter()
        state = _EobrunState(bw, ac_codes)
        bh_, bw_n = comp_blocks(c)
        rst = unit = 0
        for by in range(bh_):
            for bx in range(bw_n):
                if restart_interval and unit \
                        and unit % restart_interval == 0:
                    state.flush()
                    rst = emit_rst(bw, rst)
                unit += 1
                _emit_ac_refine(state, bw, coefs[c][by, bx, 1:], 0)
        state.flush()
        out += sos([c + 1], 1, 63, 1, 0) + bw.flush()

    # Final scan: DC refinement, interleaved, Ah=1 Al=0 (raw bits).
    bw = _BitWriter()
    rst = mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                rst = emit_rst(bw, rst)
            mcu += 1
            for c in range(ncomp):
                ch, cv = hv[c]
                for vy in range(cv):
                    for vx in range(ch):
                        dc = int(coefs[c][my * cv + vy, mx * ch + vx, 0])
                        bw.write(dc & 1, 1)
    out += sos(list(range(1, ncomp + 1)), 0, 0, 1, 0) + bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops (raises) at any real marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        p = self.pos
        if p >= len(d):
            raise JpegCodecError("truncated entropy data")
        b = d[p]
        p += 1
        if b == 0xFF:
            if p >= len(d):
                raise JpegCodecError("truncated after 0xFF")
            m = d[p]
            if m == 0x00:
                p += 1
            elif 0xD0 <= m <= 0xD7:  # RST belongs between MCUs
                raise JpegCodecError("unexpected RST inside block")
            else:
                raise JpegCodecError("marker inside entropy data")
        self.pos = p
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume an RST marker at an MCU boundary (F.2.1.3.1): drop
        the partial byte, then expect 0xFF 0xD0-0xD7."""
        self.nbits = 0
        self.acc = 0
        d, p = self.data, self.pos
        if p + 2 > len(d) or d[p] != 0xFF or not 0xD0 <= d[p + 1] <= 0xD7:
            raise JpegCodecError("expected restart marker")
        self.pos = p + 2


def _decode_huffman(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegCodecError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _parse_dqt(body: bytes, qtables: dict) -> None:
    """DQT segment (possibly several tables) -> natural-order 8x8."""
    bp = 0
    while bp < len(body):
        pq, tq = body[bp] >> 4, body[bp] & 0x0F
        bp += 1
        cnt = 64 * (2 if pq else 1)
        raw = body[bp:bp + cnt]
        if len(raw) != cnt:
            raise JpegCodecError("short DQT")
        vals = (np.frombuffer(raw, dtype=">u2").astype(np.int64)
                if pq else
                np.frombuffer(raw, dtype=np.uint8).astype(np.int64))
        tab = np.zeros(64, dtype=np.int64)
        tab[list(ZIGZAG)] = vals
        qtables[tq] = tab.reshape(8, 8)
        bp += cnt


def _parse_dht(body: bytes, htables: dict) -> None:
    """DHT segment -> {(class, id): {(length, code): symbol}}."""
    bp = 0
    while bp < len(body):
        tc, th = body[bp] >> 4, body[bp] & 0x0F
        bits = body[bp + 1:bp + 17]
        if len(bits) != 16:
            raise JpegCodecError("short DHT")
        total = sum(bits)
        vals = body[bp + 17:bp + 17 + total]
        if len(vals) != total:
            raise JpegCodecError("short DHT values")
        table = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                table[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1
        htables[(tc, th)] = table
        bp += 17 + total


def _parse_sof(body: bytes):
    """SOF frame header -> (h, w, [(comp_id, ch, cv, tq)])."""
    prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
    if prec != 8:
        raise JpegCodecError("only 8-bit precision supported")
    if ncomp not in (1, 3):
        raise JpegCodecError("only 1 or 3 components")
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise JpegCodecError("implausible dimensions")
    if len(body) < 6 + 3 * ncomp:
        raise JpegCodecError("short SOF")
    comps = []
    for c in range(ncomp):
        cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
        ch, cv = samp >> 4, samp & 0x0F
        if ch not in (1, 2) or cv not in (1, 2):
            raise JpegCodecError("sampling factor unsupported")
        comps.append((cid, ch, cv, tq))
    if ncomp == 1 and comps[0][1:3] != (1, 1):
        raise JpegCodecError("subsampling unsupported for 1 comp")
    return h, w, comps


def _planes_to_pixels(comps, planes, hmax: int, vmax: int,
                      w: int, h: int):
    """Upsample component planes to full resolution, crop, and convert
    (shared by the sequential and progressive decoders)."""
    full = []
    for (cid, ch, cv, _tq), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, vmax // cv, axis=0),
                       hmax // ch, axis=1)
        full.append(up[:h, :w] + 128.0)
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_jpeg(data: bytes):
    """Decode baseline sequential JPEG -> (width, height, pixels).

    ``pixels`` is HxW uint8 for grayscale streams, HxWx3 RGB for
    3-component YCbCr (4:4:4, 4:2:2, 4:4:0 and 4:2:0 sampling).
    Tables come from the stream's own DQT/DHT segments.  Raises
    JpegCodecError for progressive/arithmetic/non-8-bit or malformed
    input."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise JpegCodecError("not a JPEG (no SOI)")
    pos = 2
    n = len(data)
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    w = h = -1
    comps = []  # (comp_id, ch, cv, tq) in SOF order
    scan_tabs = {}  # comp_id -> (dc_id, ac_id)
    scan_pos = -1
    dri = 0
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise JpegCodecError("marker desync")
        while data[pos + 1] == 0xFF:  # 0xFF fill bytes (B.1.1.2)
            pos += 1
            if pos + 4 > n:
                raise JpegCodecError("truncated fill run")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        (size,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + size]
        if len(body) != size - 2:
            raise JpegCodecError("truncated segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            _parse_dqt(body, qtables)
        elif marker == 0xC4:  # DHT
            _parse_dht(body, htables)
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            h, w, comps = _parse_sof(body)
        elif marker == 0xC2:  # SOF2: progressive DCT
            return _decode_progressive(data)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegCodecError("non-baseline SOF unsupported")
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise JpegCodecError("short DRI")
            dri = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if w < 0:
                raise JpegCodecError("SOS before SOF")
            ns = body[0]
            if ns != len(comps):
                raise JpegCodecError("scan must cover all components")
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan_tabs[cid] = (tabs >> 4, tabs & 0x0F)
            scan_pos = pos + 2 + size
            break
        pos += 2 + size
    if scan_pos < 0:
        raise JpegCodecError("no scan data")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    tables = []
    for cid, ch, cv, tq in comps:
        qt = qtables.get(tq)
        ids = scan_tabs.get(cid)
        if qt is None or ids is None:
            raise JpegCodecError("missing table referenced by scan")
        dc_tab = htables.get((0, ids[0]))
        ac_tab = htables.get((1, ids[1]))
        if dc_tab is None or ac_tab is None:
            raise JpegCodecError("missing Huffman table")
        planes.append(np.zeros((mcuy * cv * 8, mcux * ch * 8),
                               dtype=np.float64))
        tables.append((qt, dc_tab, ac_tab))

    br = _BitReader(data, scan_pos)
    a = _DCT_A
    preds = [0] * len(comps)
    unz = list(ZIGZAG)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu and mcu % dri == 0:
                br.restart()
                preds = [0] * len(comps)
            mcu += 1
            for c, ((cid, ch, cv, _tq), plane) in \
                    enumerate(zip(comps, planes)):
                qt, dc_tab, ac_tab = tables[c]
                for vy in range(cv):
                    for vx in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        cat = _decode_huffman(br, dc_tab)
                        if cat:
                            preds[c] += _extend(br.bits(cat), cat)
                        zz[0] = preds[c]
                        k = 1
                        while k < 64:
                            rs = _decode_huffman(br, ac_tab)
                            r, sbits = rs >> 4, rs & 0x0F
                            if sbits == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegCodecError("AC index overrun")
                            zz[k] = _extend(br.bits(sbits), sbits)
                            k += 1
                        coef = np.zeros(64, dtype=np.int64)
                        coef[unz] = zz
                        block = (coef.reshape(8, 8) * qt) \
                            .astype(np.float64)
                        by = (my * cv + vy) * 8
                        bx = (mx * ch + vx) * 8
                        plane[by:by + 8, bx:bx + 8] = a.T @ block @ a
    return w, h, _planes_to_pixels(comps, planes, hmax, vmax, w, h)


def _decode_progressive(data: bytes):
    """Decode a progressive (SOF2) Huffman JPEG per T.81 Annex G.

    Coefficients accumulate across scans in per-component block arrays
    (zigzag order); each SOS is one of the four scan kinds — DC first
    (interleaved or single-component), DC refinement (raw bits), AC
    first with EOB-run coding, AC refinement with correction bits —
    with successive-approximation shifts applied per spec.  After the
    last scan everything is dequantized + IDCT'd in one vectorized
    pass and finished by the shared upsample/color tail."""
    pos = 2
    n = len(data)
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    w = h = -1
    comps: list = []
    coefs: list = []
    dri = 0
    hmax = vmax = 1
    mcux = mcuy = 0

    def comp_block_dims(ci: int) -> tuple[int, int]:
        """Non-interleaved block grid for one component (G.1: the
        component's own ceil dims, not the MCU-padded grid)."""
        _cid, ch, cv, _tq = comps[ci]
        bw_ = (-(-(w * ch) // hmax) + 7) // 8
        bh_ = (-(-(h * cv) // vmax) + 7) // 8
        return bh_, bw_

    def decode_scan(body: bytes, start: int) -> int:
        """Decode one scan's entropy data; returns position just past
        it (the next marker's 0xFF)."""
        nonlocal dri
        ns = body[0]
        if len(body) < 1 + 2 * ns + 3:
            raise JpegCodecError("short SOS")
        scomps = []  # (comp_index, dc_table, ac_table)
        for c in range(ns):
            cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
            try:
                ci = next(i for i, cc in enumerate(comps)
                          if cc[0] == cid)
            except StopIteration:
                raise JpegCodecError("scan references unknown component")
            scomps.append((ci, htables.get((0, tabs >> 4)),
                           htables.get((1, tabs & 0x0F))))
        ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
        ah, al = ahal >> 4, ahal & 0x0F
        if ss > se or se > 63 or al > 13:
            raise JpegCodecError("bad spectral selection")
        if ss == 0 and se != 0:
            raise JpegCodecError("DC scan must have Se=0")
        if ss > 0 and ns != 1:
            raise JpegCodecError("AC scans are single-component")
        br = _BitReader(data, start)
        preds = [0] * ns
        eobrun = 0

        def dc_first(ci: int, by: int, bx: int, si: int) -> None:
            tab = scomps[si][1]
            if tab is None:
                raise JpegCodecError("missing DC table")
            cat = _decode_huffman(br, tab)
            if cat:
                preds[si] += _extend(br.bits(cat), cat)
            coefs[ci][by, bx, 0] = preds[si] << al

        def dc_refine(ci: int, by: int, bx: int, _si: int) -> None:
            if br.bit():
                coefs[ci][by, bx, 0] |= (1 << al)

        def ac_first(ci: int, by: int, bx: int) -> None:
            nonlocal eobrun
            if eobrun:
                eobrun -= 1
                return
            tab = scomps[0][2]
            if tab is None:
                raise JpegCodecError("missing AC table")
            blk = coefs[ci][by, bx]
            k = ss
            while k <= se:
                rs = _decode_huffman(br, tab)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.bits(r)
                        return
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise JpegCodecError("AC index overrun")
                blk[k] = _extend(br.bits(s), s) << al
                k += 1

        def ac_refine(ci: int, by: int, bx: int) -> None:
            nonlocal eobrun
            tab = scomps[0][2]
            if tab is None:
                raise JpegCodecError("missing AC table")
            blk = coefs[ci][by, bx]
            p1, m1 = 1 << al, -1 << al

            def correct(k: int) -> None:
                c = int(blk[k])
                if c and br.bit() and not (c & p1):
                    blk[k] = c + (p1 if c >= 0 else m1)

            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _decode_huffman(br, tab)
                    r, s = rs >> 4, rs & 0x0F
                    newval = 0
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.bits(r)
                            break
                        # ZRL: skip 16 zero-history coefficients
                    else:
                        if s != 1:
                            raise JpegCodecError(
                                "refinement size must be 1")
                        newval = p1 if br.bit() else m1
                    while k <= se:
                        if blk[k]:
                            correct(k)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval:
                        if k > se:
                            raise JpegCodecError("refinement overrun")
                        blk[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:
                    correct(k)
                    k += 1
                eobrun -= 1

        def reset() -> None:
            nonlocal eobrun
            br.restart()
            eobrun = 0
            for i in range(ns):
                preds[i] = 0

        # --- traversal: interleaved MCU order for multi-component DC
        # scans, the component's own block grid otherwise.
        if ss == 0 and ns > 1:
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if dri and unit and unit % dri == 0:
                        reset()
                    unit += 1
                    for si, (ci, _d, _a) in enumerate(scomps):
                        _cid, ch, cv, _tq = comps[ci]
                        for vy in range(cv):
                            for vx in range(ch):
                                if ah == 0:
                                    dc_first(ci, my * cv + vy,
                                             mx * ch + vx, si)
                                else:
                                    dc_refine(ci, my * cv + vy,
                                              mx * ch + vx, si)
        else:
            ci = scomps[0][0]
            bh_, bw_ = comp_block_dims(ci)
            unit = 0
            for by in range(bh_):
                for bx in range(bw_):
                    if dri and unit and unit % dri == 0:
                        reset()
                    unit += 1
                    if ss == 0:
                        if ah == 0:
                            dc_first(ci, by, bx, 0)
                        else:
                            dc_refine(ci, by, bx, 0)
                    elif ah == 0:
                        ac_first(ci, by, bx)
                    else:
                        ac_refine(ci, by, bx)

        # Skip pad bits / any trailing RST, then find the next marker.
        p = br.pos
        while p + 1 < n:
            if data[p] == 0xFF and data[p + 1] != 0x00:
                if 0xD0 <= data[p + 1] <= 0xD7:
                    p += 2  # stray RST at scan end
                    continue
                return p
            p += 1
        raise JpegCodecError("missing marker after scan")

    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise JpegCodecError("marker desync")
        while data[pos + 1] == 0xFF:  # fill bytes (B.1.1.2)
            pos += 1
            if pos + 4 > n:
                raise JpegCodecError("truncated fill run")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        (size,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + size]
        if len(body) != size - 2:
            raise JpegCodecError("truncated segment")
        if marker == 0xDB:
            _parse_dqt(body, qtables)
        elif marker == 0xC4:
            _parse_dht(body, htables)
        elif marker == 0xC2:
            if comps:
                raise JpegCodecError("multiple frames")
            h, w, comps = _parse_sof(body)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for _cid, ch, cv, _tq in comps:
                coefs.append(np.zeros((mcuy * cv, mcux * ch, 64),
                                      dtype=np.int64))
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegCodecError("frame type conflict in progressive")
        elif marker == 0xDD:
            if len(body) < 2:
                raise JpegCodecError("short DRI")
            dri = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            if not comps:
                raise JpegCodecError("SOS before SOF")
            pos = decode_scan(body, pos + 2 + size)
            continue
        pos += 2 + size
    if not comps:
        raise JpegCodecError("no progressive frame")
    # Dequantize + IDCT every block per component (vectorized).
    planes = []
    unz = np.array(ZIGZAG)
    for (cid, ch, cv, tq), zz_blocks in zip(comps, coefs):
        qt = qtables.get(tq)
        if qt is None:
            raise JpegCodecError("missing quantization table")
        nby, nbx = zz_blocks.shape[:2]
        nat = np.zeros_like(zz_blocks)
        nat[:, :, unz] = zz_blocks
        blocks = nat.reshape(nby, nbx, 8, 8).astype(np.float64) * qt
        # Broadcast matmul matches the sequential decoder's per-block
        # `a.T @ block @ a` rounding exactly (einsum's different
        # summation order flips np.round at .5 by one LSB).
        spatial = _DCT_A.T @ blocks @ _DCT_A
        planes.append(spatial.transpose(0, 2, 1, 3)
                      .reshape(nby * 8, nbx * 8))
    return w, h, _planes_to_pixels(comps, planes, hmax, vmax, w, h)
