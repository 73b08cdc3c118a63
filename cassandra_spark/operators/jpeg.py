"""Baseline sequential JPEG codec — pure Python + numpy, zero external
codec libraries, for the L4 multimodal tier.

Scope (documented honestly):

- **decode**: DCT sequential (SOF0/1), 8- AND 12-bit samples (16-bit
  DQT entries parsed; 12-bit output scales to the 8-bit RGB contract),
  Huffman entropy coding, 1 or 3 components, subsampling factors up to
  2×2 (4:4:4 / 4:2:2 / 4:2:0 via box upsample), restart markers
  (DRI/RSTn), APPn/COM skipped. Progressive Huffman (SOF2) decodes here
  too, and arithmetic-coded sequential/progressive (SOF9/SOF10,
  QM-coder) decode via operators/jpeg_arith.py, lossless (SOF3
  Huffman AND — round 7 — SOF11 arithmetic; all 7 Annex-H predictors,
  byte-exact) decodes here, and HIERARCHICAL progressions (Annex J:
  DHP + EXP reference expansion) accept EVERY differential frame
  type as a stage — SOF5/6/7 Huffman and SOF13/14/15 arithmetic
  (the lossless stages make the pyramid byte-exact): the COMPLETE
  T.81 frame matrix, encode and decode. Truly malformed streams raise
  ``ValueError`` — the multimodal pipeline degrades those payloads to
  the stub path instead of failing the job.
- **encode**: baseline sequential, YCbCr 4:4:4, Annex-K-style quant tables
  scaled by an IJG-style quality knob, standard Huffman tables written
  into DHT segments (the decoder always reads tables from the stream, so
  the round-trip never depends on table constants matching any external
  implementation).

The DCT is the exact orthonormal 8×8 transform as two matrix multiplies
(numpy), so decode(encode(x)) differs from x only by quantization error —
the round-trip test bounds per-pixel error as a function of quality.

Worker-safe pure functions over bytes: they run inside Arrow-batched
mapInPandas with no driver state (same contract as codecs.py).
"""

from __future__ import annotations

import math
import struct

import numpy as np

JPEG_MIME = "image/jpeg"

# zigzag scan order: ZIGZAG[i] = block index (row*8+col) of the i-th
# coefficient in scan order
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex-K-style base quantization tables (luminance / chrominance)
_QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# standard-shaped Huffman specs: (bits[1..16], values). The decoder never
# uses these constants — it reads DHT from the stream.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUMA_VALS = [
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
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for k in range(8):
        c = math.sqrt(1 / 8) if k == 0 else math.sqrt(2 / 8)
        for i in range(8):
            m[k, i] = c * math.cos((2 * i + 1) * k * math.pi / 16)
    return m


_DCT = _dct_matrix()  # forward: _DCT @ block @ _DCT.T


def _quality_scale(table: list[int], quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = [(t * scale + 50) // 100 for t in table]
    return np.array([min(255, max(1, v)) for v in q], dtype=np.int32)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) by the canonical JPEG code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """value → (category, appended bits) per the JPEG signed encoding."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _rgb_to_quantized(
    width: int, height: int, rgb: bytes, quality: int
) -> tuple[list[np.ndarray], list[np.ndarray], int, int]:
    """RGB → per-component quantized coefficient blocks in ZIGZAG order:
    ([Y, Cb, Cr] each shaped (nby, nbx, 64) int64, [qt_luma, qt_chroma],
    nby, nbx). Shared by the baseline and progressive encoders so both
    scan scripts serialize identical coefficients (4:4:4)."""
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(
        np.float64
    )
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    ]
    qts = [_quality_scale(_QT_LUMA, quality), _quality_scale(_QT_CHROMA, quality)]
    ph = (height + 7) & ~7
    pw = (width + 7) & ~7
    nby, nbx = ph // 8, pw // 8
    out = []
    for ci, p in enumerate(planes):
        pp = np.empty((ph, pw))
        pp[:height, :width] = p
        pp[height:, :width] = p[-1:, :]
        pp[:, width:] = pp[:, width - 1 : width]
        ti = 0 if ci == 0 else 1
        zz = np.zeros((nby, nbx, 64), dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                block = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = _DCT @ block @ _DCT.T
                q = np.rint(coef.reshape(64) / qts[ti]).astype(np.int64)
                zz[by, bx] = q[ZIGZAG]  # scan order i holds block idx ZIGZAG[i]
        out.append(zz)
    return out, qts, nby, nbx



def _emit_block_huffman(bw, zz, dc_tab, ac_tab, pred, ci) -> None:
    """Emit one quantized block (scan order) through the sequential
    Huffman model: DC diff + run-length AC with ZRL/EOB. Shared by every
    sequential encoder (baseline, 12-bit, hierarchical stages)."""
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    t, bits = _magnitude(diff)
    code, length = dc_tab[t]
    bw.write(code, length)
    if t:
        bw.write(bits, t)
    run = 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        t, bits = _magnitude(v)
        code, length = ac_tab[(run << 4) | t]
        bw.write(code, length)
        bw.write(bits, t)
        run = 0
    if run:
        code, length = ac_tab[0x00]  # EOB
        bw.write(code, length)


def encode_jpeg(width: int, height: int, rgb: bytes, quality: int = 85) -> bytes:
    """Top-down RGB bytes → baseline sequential JPEG (YCbCr 4:4:4)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    blocks, qts, nby, nbx = _rgb_to_quantized(width, height, rgb, quality)
    dc_tabs = [
        _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
        _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ]
    ac_tabs = [
        _huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
        _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ]

    w = _BitWriter()
    pred = [0, 0, 0]
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(3):
                ti = 0 if ci == 0 else 1
                _emit_block_huffman(
                    w, blocks[ci][by, bx], dc_tabs[ti], ac_tabs[ti],
                    pred, ci,
                )
    w.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tid, qt in enumerate(qts):
        zzq = bytes(int(qt[ZIGZAG[i]]) for i in range(64))
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + zzq
    # SOF0: 3 components, no subsampling
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    for cid in (1, 2, 3):
        out += struct.pack("BBB", cid, 0x11, 0 if cid == 1 else 1)
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        payload = bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">HB", 3 + len(payload), (cls << 4) | tid)
        out += payload
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid in (1, 2, 3):
        out += struct.pack("BB", cid, 0x00 if cid == 1 else 0x11)
    out += b"\x00\x3f\x00"  # Ss, Se, Ah/Al
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder (SOF2 scan scripts, spec Annex G) ------------------
#
# Fixture source for the progressive decoder: a libjpeg-style scan script
# covering every progressive scan kind — DC first with point transform,
# spectral-selection AC bands, DC refinement, and AC successive-
# approximation refinement (the jcphuff.c correction-bit algorithm).
# Coefficients come from the same _rgb_to_quantized pipeline as the
# baseline encoder, so progressive-decode output must be pixel-identical
# to baseline-decode output for the same (image, quality).


class _ProgACState:
    """EOB-run + run-attached correction bits for one AC scan (jcphuff's
    EOBRUN/BE pair; the block-local BR buffer lives in _emit_ac_refine).
    Bit order is the decoder's consumption order: EOBn symbol + extra
    bits, THEN the correction bits accumulated across the run's blocks."""

    def __init__(self, w: _BitWriter, ac_tab) -> None:
        self.w = w
        self.ac = ac_tab
        self.eobrun = 0
        self.be_bits: list[int] = []  # correction bits bound to the run

    def flush_eobrun(self) -> None:
        if self.eobrun == 0:
            return  # be_bits is empty by construction when no run pends
        nbits = self.eobrun.bit_length() - 1
        code, length = self.ac[nbits << 4]
        self.w.write(code, length)
        if nbits:
            self.w.write(self.eobrun - (1 << nbits), nbits)
        self.eobrun = 0
        for bit in self.be_bits:
            self.w.write(bit, 1)
        self.be_bits = []


def _emit_ac_first(
    st: _ProgACState, zz: np.ndarray, Ss: int, Se: int, Al: int
) -> None:
    """One block of an AC 'first' scan (Ah=0): run-lengths over the
    shifted band with shared EOB runs."""
    w, ac = st.w, st.ac
    run = 0
    emitted = False
    for k in range(Ss, Se + 1):
        v = int(zz[k]) >> Al if int(zz[k]) >= 0 else -((-int(zz[k])) >> Al)
        if v == 0:
            run += 1
            continue
        st.flush_eobrun()
        while run > 15:
            code, length = ac[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        t, bits = _magnitude(v)
        code, length = ac[(run << 4) | t]
        w.write(code, length)
        w.write(bits, t)
        run = 0
        emitted = True
    if run > 0 or not emitted:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


def _emit_ac_refine(
    st: _ProgACState, zz: np.ndarray, Ss: int, Se: int, Al: int
) -> None:
    """One block of an AC refinement scan (Ah = Al+1): newly-nonzero
    coefficients carry magnitude 1 at this precision; already-nonzero ones
    emit one correction bit, buffered across runs exactly as jcphuff's
    BR_buffer (decoder consumes them in the same order)."""
    w, ac = st.w, st.ac
    absv = [0] * 64
    eob_k = Ss - 1
    for k in range(Ss, Se + 1):
        a = abs(int(zz[k])) >> Al
        absv[k] = a
        if a == 1:
            eob_k = k
    run = 0
    br_bits: list[int] = []  # block-local correction bits (jcphuff BR)
    for k in range(Ss, Se + 1):
        temp = absv[k]
        if temp == 0:
            run += 1
            continue
        while run > 15 and k <= eob_k:
            st.flush_eobrun()
            code, length = ac[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
            for bit in br_bits:
                w.write(bit, 1)
            br_bits = []
        if temp > 1:
            # already nonzero at the previous precision: correction bit
            br_bits.append(temp & 1)
            continue
        st.flush_eobrun()
        code, length = ac[(run << 4) | 1]
        w.write(code, length)
        w.write(1 if int(zz[k]) > 0 else 0, 1)
        run = 0
        for bit in br_bits:
            w.write(bit, 1)
        br_bits = []
    if run > 0 or br_bits:
        # block ends inside an EOB run; its leftover correction bits
        # ride with the run and flush after the EOBn symbol
        st.eobrun += 1
        st.be_bits.extend(br_bits)
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


# Progressive AC scans emit EOBn symbols ((n<<4)|0, n=1..14) that the
# standard sequential tables do not contain, so the progressive encoder
# carries its own generic AC table: every symbol it can emit at a flat
# 9-bit code (176 symbols < 2^9, all-ones code unused — canonical-valid,
# deliberately non-optimal; fixtures trade size for coverage).
_AC_PROG_VALS = (
    [n << 4 for n in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_PROG_BITS = [0] * 16
_AC_PROG_BITS[8] = len(_AC_PROG_VALS)  # all codes at length 9


def encode_jpeg_progressive(
    width: int, height: int, rgb: bytes, quality: int = 85
) -> bytes:
    """Top-down RGB bytes → progressive JPEG (SOF2, YCbCr 4:4:4) with a
    10-scan script exercising DC first (Al=1), spectral-selection AC
    bands with point transform, DC refinement, and chained AC
    refinements down to full precision."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    blocks, qts, nby, nbx = _rgb_to_quantized(width, height, rgb, quality)
    dc_tabs = [
        _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
        _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ]
    prog_ac = _huff_codes(_AC_PROG_BITS, _AC_PROG_VALS)
    ac_tabs = [prog_ac, prog_ac]

    def sos_header(comps: list[int], Ss: int, Se: int, Ah: int, Al: int) -> bytes:
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
        for ci in comps:
            ti = 0 if ci == 0 else 1
            hdr += struct.pack("BB", ci + 1, (ti << 4) | ti)
        return hdr + struct.pack("BBB", Ss, Se, (Ah << 4) | Al)

    def dc_first_scan(Al: int) -> bytes:
        w = _BitWriter()
        pred = [0, 0, 0]
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(3):
                    ti = 0 if ci == 0 else 1
                    dc = int(blocks[ci][by, bx][0]) >> Al
                    diff = dc - pred[ci]
                    pred[ci] = dc
                    t, bits = _magnitude(diff)
                    code, length = dc_tabs[ti][t]
                    w.write(code, length)
                    if t:
                        w.write(bits, t)
        w.flush()
        return bytes(w.out)

    def dc_refine_scan(Al: int) -> bytes:
        w = _BitWriter()
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(3):
                    w.write((int(blocks[ci][by, bx][0]) >> Al) & 1, 1)
        w.flush()
        return bytes(w.out)

    def ac_scan(ci: int, Ss: int, Se: int, Ah: int, Al: int) -> bytes:
        w = _BitWriter()
        st = _ProgACState(w, ac_tabs[0 if ci == 0 else 1])
        for by in range(nby):
            for bx in range(nbx):
                if Ah == 0:
                    _emit_ac_first(st, blocks[ci][by, bx], Ss, Se, Al)
                else:
                    _emit_ac_refine(st, blocks[ci][by, bx], Ss, Se, Al)
        st.flush_eobrun()
        w.flush()
        return bytes(w.out)

    out = bytearray()
    out += b"\xff\xd8"
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tid, qt in enumerate(qts):
        zzq = bytes(int(qt[ZIGZAG[i]]) for i in range(64))
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + zzq
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, height, width, 3)  # SOF2
    for cid in (1, 2, 3):
        out += struct.pack("BBB", cid, 0x11, 0 if cid == 1 else 1)
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_PROG_BITS, _AC_PROG_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_PROG_BITS, _AC_PROG_VALS),
    ):
        payload = bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">HB", 3 + len(payload), (cls << 4) | tid)
        out += payload

    # libjpeg-style script: coarse DC + banded AC first, then refinements
    out += sos_header([0, 1, 2], 0, 0, 0, 1) + dc_first_scan(1)
    out += sos_header([0], 1, 5, 0, 2) + ac_scan(0, 1, 5, 0, 2)
    out += sos_header([0], 6, 63, 0, 2) + ac_scan(0, 6, 63, 0, 2)
    out += sos_header([1], 1, 63, 0, 1) + ac_scan(1, 1, 63, 0, 1)
    out += sos_header([2], 1, 63, 0, 1) + ac_scan(2, 1, 63, 0, 1)
    out += sos_header([0, 1, 2], 0, 0, 1, 0) + dc_refine_scan(0)
    out += sos_header([0], 1, 63, 2, 1) + ac_scan(0, 1, 63, 2, 1)
    out += sos_header([0], 1, 63, 1, 0) + ac_scan(0, 1, 63, 1, 0)
    out += sos_header([1], 1, 63, 1, 0) + ac_scan(1, 1, 63, 1, 0)
    out += sos_header([2], 1, 63, 1, 0) + ac_scan(2, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


# --- decoder ---------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(d):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume an RSTn marker and realign to the next byte."""
        # drop any buffered bits (they are padding before the marker)
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                self.marker = None
                return
            self.pos += 1
        raise ValueError("missing restart marker")


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    out: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _scan_end(data: bytes, pos: int) -> int:
    """Position of the marker terminating the entropy-coded segment that
    starts at ``pos`` (skipping stuffed FF00 and RST markers)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                return pos
            pos += 2
        else:
            pos += 1
    return n


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Baseline sequential (SOF0/1) or PROGRESSIVE (SOF2) JPEG →
    (width, height, 3, top-down RGB bytes). Progressive scans accumulate
    into per-component coefficient buffers (DC/AC, first/refine with
    shared EOB runs — spec Annex G / the jdphuff.c algorithms) and are
    rendered once at EOI. Arithmetic-coded variants (SOF9 sequential,
    SOF10 progressive) route to operators/jpeg_arith.py; 12-bit
    precision decodes with output scaled to the 8-bit RGB contract;
    lossless SOF3 (Huffman) and SOF11 (arithmetic, round 7) decode
    byte-exactly; hierarchical progressions render their reference
    pyramid at EOI with EVERY T.81 differential frame type as a stage
    (round 7): SOF5/SOF13 sequential, SOF6/SOF14 progressive (scans
    accumulate per stage, render at the next frame boundary),
    SOF7/SOF15 differential-lossless (makes the whole pyramid
    byte-exact) — the full frame matrix, Huffman and arithmetic."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps)
    prec = 8
    progressive = False
    arith = False
    lossless = False
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_kx: dict[int, int] = {}
    coefs: list[np.ndarray] | None = None
    pred: list[int] = []
    restart_interval = 0
    hier: dict | None = None  # hierarchical progression state (Annex J)
    differential = False
    # pending PROGRESSIVE hierarchical stage (SOF14): scans accumulate
    # into per-stage coefficient buffers; the stage renders into the
    # reference pyramid at the next frame boundary (SOF/EXP/EOI)
    hier_prog: list | None = None  # [frame, coefs, differential]

    def _flush_hier_stage() -> None:
        nonlocal hier_prog
        if hier_prog is None:
            return
        st_frame, st_coefs, st_diff = hier_prog[:3]
        st_qt = hier_prog[4]  # qt snapshot from the stage's first SOS —
        # a DQT between this stage's scans and the next frame header
        # must not retroactively requantize the stage
        hier_prog = None
        planes = _render_prog_planes(
            st_frame, st_coefs, st_qt,
            0.0 if st_diff else float(1 << (prec - 1)),
            float(1 << (prec - 8)),
        )
        sfh, sfw, _ = st_frame
        planes = [pl[:sfh, :sfw] for pl in planes]
        if st_diff:
            refs = hier["refs"]
            if refs is None:
                raise ValueError(
                    "differential stage before any non-differential frame"
                )
            hier["refs"] = [
                r[:sfh, :sfw] + pl for r, pl in zip(refs, planes)
            ]
        else:
            hier["refs"] = [np.clip(np.rint(pl), 0, 255) for pl in planes]

    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            _flush_hier_stage()
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                tab = np.zeros(64, dtype=np.int32)
                if pq == 0:
                    for i in range(64):
                        tab[ZIGZAG[i]] = seg[p + i]
                    p += 64
                else:  # pq=1: 16-bit entries (12-bit-precision streams)
                    for i in range(64):
                        tab[ZIGZAG[i]] = struct.unpack_from(
                            ">H", seg, p + 2 * i
                        )[0]
                    p += 128
                qt[tq] = tab
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                huff[(cls, tid)] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker in (
            0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
            0xCB, 0xCD, 0xCE, 0xCF, 0xDE,
        ):
            # SOF0-3/9/10/11 + the full differential matrix — SOF5/6/7
            # (seq/prog/lossless Huffman), SOF13/14/15 (seq/prog/
            # lossless arithmetic) — and DHP
            _flush_hier_stage()  # a new frame closes a pending stage
            prec, h, w_, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec not in (8, 12):
                raise ValueError("only 8- and 12-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            if marker == 0xDE:  # DHP: hierarchical progression header
                hier = {"h": h, "w": w_, "comps": comps, "refs": None}
                pos += seglen
                continue
            frame = (h, w_, comps)
            progressive = marker in (0xC2, 0xC6, 0xCA, 0xCE)
            arith = marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
            lossless = marker in (0xC3, 0xC7, 0xCB, 0xCF)
            differential = marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF)
            if differential and hier is None:
                raise ValueError("differential frame outside DHP")
            if hier is not None and lossless and not differential:
                raise ValueError(
                    "hierarchical lossless stages must be differential"
                )
        elif marker == 0xDF:  # EXP: expand the hierarchical reference
            _flush_hier_stage()  # EXP closes a pending stage too
            if hier is None or hier["refs"] is None:
                raise ValueError("EXP outside a hierarchical progression")
            eh, ev = seg[0] >> 4, seg[0] & 0xF
            hier["refs"] = [
                _exp_expand(r, eh, ev).astype(np.float64)
                for r in hier["refs"]
            ]
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0xF
                val = seg[p + 1]
                if tc == 0:
                    dc_cond[tb] = (val & 0xF, val >> 4)  # (L, U)
                else:
                    ac_kx[tb] = val  # Kx
                p += 2
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tabs >> 4, tabs & 0xF))
            if hier is not None and progressive:  # SOF6/SOF14 scans
                if hier_prog is None:
                    h2, w2, comps2 = frame
                    if any(c[1] != 1 or c[2] != 1 for c in comps2):
                        raise ValueError(
                            "subsampled hierarchical stages not supported"
                        )
                    hier_prog = [
                        frame,
                        [
                            np.zeros(
                                ((h2 + 7) // 8, (w2 + 7) // 8, 64),
                                dtype=np.int64,
                            )
                            for _ in comps2
                        ],
                        differential,
                        [0] * len(comps2),  # Huffman DC predictors
                        dict(qt),  # quant tables in effect for THIS stage
                    ]
                Ss, Se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                AhAl = seg[3 + 2 * ns]
                if arith:
                    from cassandra_spark.operators.jpeg_arith import (
                        decode_prog_scan_arith,
                    )

                    pos = decode_prog_scan_arith(
                        data, pos + seglen, frame, scan,
                        Ss, Se, AhAl >> 4, AhAl & 0xF,
                        hier_prog[1], dc_cond, ac_kx, restart_interval,
                    )
                else:
                    pos = _decode_prog_scan(
                        data, pos + seglen, frame, scan,
                        Ss, Se, AhAl >> 4, AhAl & 0xF,
                        huff, hier_prog[1], hier_prog[3],
                        restart_interval,
                    )
                continue
            if hier is not None:
                fh, fw, _ = frame
                if lossless:  # SOF7/SOF15: exact differential final stage
                    if arith:
                        from cassandra_spark.operators.jpeg_arith import (
                            decode_scan_lossless_diff_arith,
                        )

                        planes, endpos = decode_scan_lossless_diff_arith(
                            data, pos + seglen, frame, scan, dc_cond,
                            restart_interval,
                        )
                    else:
                        planes, endpos = _decode_scan_lossless_diff_huff(
                            data, pos + seglen, frame, scan, huff,
                            restart_interval,
                        )
                    planes = [pl.astype(np.float64) for pl in planes]
                    # component values are now exact: interpret them as
                    # RGB at EOI (the lossless-JPEG convention — no
                    # color transform), not YCbCr
                    hier["exact_rgb"] = True
                elif arith:  # SOF9 first stage / SOF13 differential
                    from cassandra_spark.operators.jpeg_arith import (
                        decode_scan_arith_planes,
                    )

                    planes, endpos = decode_scan_arith_planes(
                        data, pos + seglen, frame, scan, qt,
                        dc_cond, ac_kx, restart_interval,
                        shift=(
                            0.0 if differential
                            else float(1 << (prec - 1))
                        ),
                        scale=float(1 << (prec - 8)),
                    )
                else:
                    planes, endpos = _decode_scan_planes(
                        data, pos + seglen, frame, scan, qt, huff,
                        restart_interval,
                        shift=(
                            0.0 if differential
                            else float(1 << (prec - 1))
                        ),
                        scale=float(1 << (prec - 8)),
                    )
                planes = [pl[:fh, :fw] for pl in planes]
                if differential:
                    refs = hier["refs"]
                    if refs is None:
                        raise ValueError("differential stage before any "
                                         "non-differential frame")
                    hier["refs"] = [
                        r[:fh, :fw] + pl for r, pl in zip(refs, planes)
                    ]
                else:
                    hier["refs"] = [
                        np.clip(np.rint(pl), 0, 255) for pl in planes
                    ]
                pos = endpos
                continue
            if lossless and arith:  # SOF11
                from cassandra_spark.operators.jpeg_arith import (
                    decode_scan_lossless_arith,
                )

                return decode_scan_lossless_arith(
                    data, pos + seglen, frame, scan, dc_cond,
                    seg[1 + 2 * ns], seg[3 + 2 * ns] & 0xF, prec,
                    restart_interval,
                )
            if lossless:
                return _decode_scan_lossless(
                    data, pos + seglen, frame, scan,
                    huff, seg[1 + 2 * ns], seg[3 + 2 * ns] & 0xF, prec,
                    restart_interval,
                )
            if arith and not progressive:
                from cassandra_spark.operators.jpeg_arith import (
                    decode_scan_arith,
                )

                return decode_scan_arith(
                    data, pos + seglen, frame, scan, qt,
                    dc_cond, ac_kx, restart_interval, prec=prec,
                )
            if not progressive:
                return _decode_scan(
                    data, pos + seglen, frame, scan, qt, huff,
                    restart_interval, prec=prec,
                )
            Ss, Se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            AhAl = seg[3 + 2 * ns]
            if coefs is None:
                h, w_, comps = frame
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = (w_ + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                coefs = [
                    np.zeros((mcuy * cv, mcux * ch, 64), dtype=np.int64)
                    for _, ch, cv, _ in comps
                ]
                pred = [0] * len(comps)
            if arith:
                from cassandra_spark.operators.jpeg_arith import (
                    decode_prog_scan_arith,
                )

                pos = decode_prog_scan_arith(
                    data, pos + seglen, frame, scan,
                    Ss, Se, AhAl >> 4, AhAl & 0xF,
                    coefs, dc_cond, ac_kx, restart_interval,
                )
            else:
                pos = _decode_prog_scan(
                    data, pos + seglen, frame, scan,
                    Ss, Se, AhAl >> 4, AhAl & 0xF,
                    huff, coefs, pred, restart_interval,
                )
            continue
        pos += seglen
    # a truncated stream (no EOI) still renders what committed: a
    # pending progressive stage folds into the refs first
    _flush_hier_stage()
    if hier is not None and hier["refs"] is not None:
        fh, fw = hier["h"], hier["w"]
        planes = [
            np.asarray(r, dtype=np.float64)[:fh, :fw] for r in hier["refs"]
        ]
        if hier.get("exact_rgb"):
            # a lossless differential stage fixed the component values
            # exactly — lossless-JPEG convention: components ARE RGB
            out = np.stack(
                [
                    np.clip(np.rint(p), 0, 255).astype(np.uint8)
                    for p in planes
                ],
                axis=-1,
            )
            if len(planes) == 1:
                out = np.repeat(out, 3, axis=-1)
            return fw, fh, 3, out.tobytes()
        return _planes_to_rgb(planes, hier["comps"], fh, fw, 1, 1)
    if progressive and coefs is not None:
        return _render_progressive(frame, coefs, qt, prec=prec)
    raise ValueError("no scan data found")


def _decode_prog_scan(
    data, pos, frame, scan, Ss, Se, Ah, Al, huff, coefs, pred,
    restart_interval,
):
    """One progressive SOS: route each block of the scan's component(s)
    through the DC/AC first/refine block decoders; returns the stream
    position of the terminating marker. DC predictors persist across DC
    scans of the same progression (reset at restarts), EOB runs are
    scan-local."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    cid_to_ci = {c[0]: i for i, c in enumerate(comps)}
    br = _BitReader(data, pos)
    state = _ProgDecState()
    if Ss == 0 and Ah == 0:
        for ci in (cid_to_ci[cs] for cs, _, _ in scan):
            pred[ci] = 0

    def restart_check(count: int) -> None:
        if restart_interval and count and count % restart_interval == 0:
            br.sync_restart()
            state.eobrun = 0
            for i in range(len(pred)):
                pred[i] = 0

    if len(scan) > 1:
        # interleaved (DC scans only, per spec): MCU order
        if Ss != 0:
            raise ValueError("interleaved AC scan is not legal JPEG")
        count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                restart_check(count)
                for cs, td, _ in scan:
                    ci = cid_to_ci[cs]
                    _, ch, cv, _ = comps[ci]
                    for vy in range(cv):
                        for vx in range(ch):
                            zz = coefs[ci][my * cv + vy, mx * ch + vx]
                            _dec_dc_block(
                                br, huff.get((0, td)), zz, Ah, Al, pred, ci
                            )
                count += 1
    else:
        cs, td, ta = scan[0]
        ci = cid_to_ci[cs]
        _, ch, cv, _ = comps[ci]
        cw = (w * ch + hmax - 1) // hmax
        chh = (h * cv + vmax - 1) // vmax
        nbx = (cw + 7) // 8
        nby = (chh + 7) // 8
        count = 0
        for by in range(nby):
            for bx in range(nbx):
                restart_check(count)
                zz = coefs[ci][by, bx]
                if Ss == 0:
                    _dec_dc_block(
                        br, huff.get((0, td)), zz, Ah, Al, pred, ci
                    )
                elif Ah == 0:
                    _dec_ac_first(br, huff.get((1, ta)), zz, Ss, Se, Al, state)
                else:
                    _dec_ac_refine(br, huff.get((1, ta)), zz, Ss, Se, Al, state)
                count += 1
    return _scan_end(data, pos)


class _ProgDecState:
    def __init__(self) -> None:
        self.eobrun = 0


def _dec_dc_block(br, dct, zz, Ah, Al, pred, ci) -> None:
    if Ah == 0:  # DC first: diff-coded at reduced precision
        if dct is None:
            raise ValueError("missing DC Huffman table")
        t = _huff_decode(br, dct)
        diff = _extend(br.read_bits(t), t) if t else 0
        pred[ci] += diff
        zz[0] = pred[ci] << Al
    else:  # DC refine: one bit of added precision
        if br.read_bit():
            zz[0] = int(zz[0]) | (1 << Al)


def _dec_ac_first(br, act, zz, Ss, Se, Al, state) -> None:
    if act is None:
        raise ValueError("missing AC Huffman table")
    if state.eobrun > 0:
        state.eobrun -= 1
        return
    k = Ss
    while k <= Se:
        rs = _huff_decode(br, act)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:
                state.eobrun = (1 << r) - 1
                if r:
                    state.eobrun += br.read_bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > Se:
            raise ValueError("AC index overflow")
        zz[k] = _extend(br.read_bits(s), s) << Al
        k += 1


def _dec_ac_refine(br, act, zz, Ss, Se, Al, state) -> None:
    """jdphuff.c decode_mcu_AC_refine: newly-nonzero coefficients arrive
    as ±1<<Al; every nonzero-history coefficient passed over consumes one
    correction bit."""
    if act is None:
        raise ValueError("missing AC Huffman table")
    p1 = 1 << Al
    m1 = -1 << Al

    def correct(k: int) -> None:
        c = int(zz[k])
        if br.read_bit() and (c & p1) == 0:
            zz[k] = c + (p1 if c >= 0 else m1)

    k = Ss
    if state.eobrun == 0:
        while k <= Se:
            rs = _huff_decode(br, act)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    state.eobrun = 1 << r
                    if r:
                        state.eobrun += br.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients below
            else:
                if s != 1:
                    raise ValueError("bad AC refinement magnitude")
                val = p1 if br.read_bit() else m1
            while k <= Se:
                if int(zz[k]) != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= Se:
                zz[k] = val
            k += 1
    if state.eobrun > 0:
        while k <= Se:
            if int(zz[k]) != 0:
                correct(k)
            k += 1
        state.eobrun -= 1


def _render_prog_planes(frame, coefs, qt, shift, scale):
    """Dequantize + IDCT the accumulated coefficient buffers into
    per-component planes (``shift=0`` renders a DIFFERENTIAL frame's
    signed difference planes — the SOF14 hierarchical stage)."""
    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(frame[2]):
        qtab = qt.get(tq)
        if qtab is None:
            raise ValueError("missing quant table")
        nby, nbx, _ = coefs[ci].shape
        plane = np.zeros((nby * 8, nbx * 8))
        for by in range(nby):
            for bx in range(nbx):
                zz = coefs[ci][by, bx]
                coef = np.zeros(64)
                coef[ZIGZAG] = zz * qtab[ZIGZAG]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _DCT.T @ coef.reshape(8, 8) @ _DCT + shift
                ) / scale
        planes.append(plane)
    return planes


def _render_progressive(frame, coefs, qt, prec=8):
    """Dequantize + IDCT the accumulated coefficient buffers and convert
    to RGB — the one-shot rendering a progressive decoder performs after
    the final scan."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = _render_prog_planes(
        frame, coefs, qt, float(1 << (prec - 1)), float(1 << (prec - 8))
    )
    return _planes_to_rgb(planes, comps, h, w, hmax, vmax)


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval,
                 prec=8):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes, _ = _decode_scan_planes(
        data, pos, frame, scan, qt, huff, restart_interval,
        shift=float(1 << (prec - 1)), scale=float(1 << (prec - 8)),
    )
    return _planes_to_rgb(planes, comps, h, w, hmax, vmax)


def _decode_scan_planes(data, pos, frame, scan, qt, huff, restart_interval,
                        shift=128.0, scale=1.0):
    """Sequential-Huffman scan → (component planes, end-of-scan pos).
    ``shift`` is the inverse level shift (0 for hierarchical differential
    frames); planes stay float at MCU-padded size."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("subsampling factors above 2 not supported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component plane buffers at component resolution
    planes = []
    for cid, ch, cv, tq in comps:
        pw, ph = mcux * 8 * ch, mcuy * 8 * cv
        planes.append(np.zeros((ph, pw)))

    # scan table assignment by component id
    tabmap = {cs: (td, ta) for cs, td, ta in scan}

    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                td, ta = tabmap[cid]
                dct = huff.get((0, td))
                act = huff.get((1, ta))
                qtab = qt.get(tq)
                if dct is None or act is None or qtab is None:
                    raise ValueError("missing Huffman/quant table")
                for vy in range(cv):
                    for vx in range(ch):
                        t = _huff_decode(br, dct)
                        diff = _extend(br.read_bits(t), t) if t else 0
                        pred[ci] += diff
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = pred[ci]
                        i = 1
                        while i < 64:
                            rs = _huff_decode(br, act)
                            r_, s_ = rs >> 4, rs & 0xF
                            if s_ == 0:
                                if r_ == 15:
                                    i += 16
                                    continue
                                break  # EOB
                            i += r_
                            if i > 63:
                                raise ValueError("AC index overflow")
                            zz[i] = _extend(br.read_bits(s_), s_)
                            i += 1
                        coef = np.zeros(64)
                        for k in range(64):
                            coef[ZIGZAG[k]] = zz[k] * qtab[ZIGZAG[k]]
                        block = (
                            _DCT.T @ coef.reshape(8, 8) @ _DCT + shift
                        ) / scale
                        by = (my * cv + vy) * 8
                        bx = (mx * ch + vx) * 8
                        planes[ci][by : by + 8, bx : bx + 8] = block
            mcu_count += 1

    return planes, _scan_end(data, pos)


def _planes_to_rgb(planes, comps, h, w, hmax, vmax):
    """Upsample component planes to full resolution and convert YCbCr →
    RGB (shared by the sequential and progressive renderers)."""
    full = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        p = planes[ci]
        if ch < hmax:
            p = np.repeat(p, hmax // ch, axis=1)
        if cv < vmax:
            p = np.repeat(p, vmax // cv, axis=0)
        full.append(p[:h, :w])

    if len(comps) == 1:
        y = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        rgb = np.stack([y, y, y], axis=-1)
        return w, h, 3, rgb.tobytes()
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.rint(c), 0, 255).astype(np.uint8) for c in (r, g, b)],
        axis=-1,
    )
    return w, h, 3, rgb.tobytes()


def encode_jpeg_12bit(
    width: int, height: int, rgb: bytes, quality: int = 85
) -> bytes:
    """Top-down 8-bit RGB bytes → 12-bit-precision sequential JPEG
    (samples widened ×16, level shift 2048, 16-bit DQT entries scaled
    ×16 so quantized coefficients — and therefore the Huffman category
    range — match the 8-bit encoding of the same image). Used to build
    real 12-bit fixtures in tests; decode scales back to the 8-bit RGB
    contract."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(
        np.float64
    )
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    planes = [
        (0.299 * r + 0.587 * g + 0.114 * b) * 16.0,
        (128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b) * 16.0,
        (128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b) * 16.0,
    ]
    qts = [
        _quality_scale(_QT_LUMA, quality) * 16,
        _quality_scale(_QT_CHROMA, quality) * 16,
    ]
    ph, pw = (height + 7) & ~7, (width + 7) & ~7
    nby, nbx = ph // 8, pw // 8
    blocks = []
    for ci, p in enumerate(planes):
        pp = np.empty((ph, pw))
        pp[:height, :width] = p
        pp[height:, :width] = p[-1:, :]
        pp[:, width:] = pp[:, width - 1 : width]
        ti = 0 if ci == 0 else 1
        zz = np.zeros((nby, nbx, 64), dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                block = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 2048.0
                coef = _DCT @ block @ _DCT.T
                q = np.rint(coef.reshape(64) / qts[ti]).astype(np.int64)
                zz[by, bx] = q[ZIGZAG]
        blocks.append(zz)

    dc_tabs = [
        _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
        _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ]
    ac_tabs = [
        _huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
        _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ]
    w = _BitWriter()
    pred = [0, 0, 0]
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(3):
                ti = 0 if ci == 0 else 1
                _emit_block_huffman(
                    w, blocks[ci][by, bx], dc_tabs[ti], ac_tabs[ti],
                    pred, ci,
                )
    w.flush()

    out = bytearray()
    out += b"\xff\xd8"
    for tid, qtab in enumerate(qts):
        payload = b"".join(
            struct.pack(">H", int(qtab[ZIGZAG[i]])) for i in range(64)
        )
        out += b"\xff\xdb" + struct.pack(">HB", 131, 0x10 | tid) + payload
    out += b"\xff\xc1" + struct.pack(">HBHHB", 17, 12, height, width, 3)
    for cid in (1, 2, 3):
        out += struct.pack("BBB", cid, 0x11, 0 if cid == 1 else 1)
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        payload = bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">HB", 3 + len(payload), (cls << 4) | tid)
        out += payload
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid in (1, 2, 3):
        out += struct.pack("BB", cid, 0x00 if cid == 1 else 0x11)
    out += b"\x00\x3f\x00"
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


# --- lossless JPEG (SOF3, spec Annex H) -------------------------------------
#
# Predictive, not DCT: each sample is Huffman-coded as the difference
# from one of the seven Annex-H predictors (Px = Ra, Rb, Rc, Ra+Rb-Rc,
# Ra+(Rb-Rc)/2, Rb+(Ra-Rc)/2, (Ra+Rb)/2). decode(encode(x)) == x
# EXACTLY — the round-trip test asserts byte identity, the strongest
# check in the codec suite. Scope: 8-bit, 1 or 3 components (RGB coded
# directly, no color transform — the common lossless convention),
# no subsampling, point transform 0, restart markers.


def _predict(ra: int, rb: int, rc: int, sel: int) -> int:
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1  # sel == 7


def encode_jpeg_lossless(
    width: int, height: int, rgb: bytes, predictor: int = 4
) -> bytes:
    """Top-down 8-bit RGB bytes → lossless JPEG (SOF3): exact, no
    quantization. RGB components code directly (no YCbCr)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    tab = _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    w = _BitWriter()
    for y in range(height):
        for x in range(width):
            for c in range(3):
                cur = rgb[(y * width + x) * 3 + c]
                if x == 0 and y == 0:
                    pred = 128  # 2^(P-1)
                elif y == 0:
                    pred = rgb[(y * width + x - 1) * 3 + c]  # Ra
                elif x == 0:
                    pred = rgb[((y - 1) * width + x) * 3 + c]  # Rb
                else:
                    ra = rgb[(y * width + x - 1) * 3 + c]
                    rb = rgb[((y - 1) * width + x) * 3 + c]
                    rc = rgb[((y - 1) * width + x - 1) * 3 + c]
                    pred = _predict(ra, rb, rc, predictor)
                diff = (cur - pred) & 0xFFFF  # modulo-65536 arithmetic (H.1.2.1)
                if diff > 32767:
                    diff -= 65536
                t, bits = _magnitude(diff)
                code, length = tab[t]
                w.write(code, length)
                if t:
                    w.write(bits, t)
    w.flush()

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xc3" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    for cid in (1, 2, 3):
        out += struct.pack("BBB", cid, 0x11, 0)
    payload = bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">HB", 3 + len(payload), 0x00)
    out += payload
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid in (1, 2, 3):
        out += struct.pack("BB", cid, 0x00)
    out += struct.pack("BBB", predictor, 0, 0)  # Ss=predictor, Se=0, Ah/Al
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


def _decode_scan_lossless(data, pos, frame, scan, huff, sel, pt, prec,
                          restart_interval):
    """SOF3 scan: interleaved raster walk reconstructing each component
    from its predicted difference. Returns the full RGB tuple."""
    h, w, comps = frame
    if any(ch != 1 or cv != 1 for _, ch, cv, _ in comps):
        raise ValueError("subsampled lossless JPEG not supported")
    nc = len(comps)
    tabs = []
    for cs, td, _ in scan:
        t = huff.get((0, td))
        if t is None:
            raise ValueError("missing lossless Huffman table")
        tabs.append(t)
    br = _BitReader(data, pos)
    planes = [np.zeros((h, w), dtype=np.int32) for _ in range(nc)]
    default = 1 << (prec - 1 - pt)
    count = 0
    restart_row_reset = False
    for y in range(h):
        for x in range(w):
            if (
                restart_interval
                and count
                and count % restart_interval == 0
            ):
                br.sync_restart()
                restart_row_reset = True
            for ci in range(nc):
                p = planes[ci]
                if restart_row_reset or (x == 0 and y == 0):
                    pred = default
                elif y == 0:
                    pred = int(p[y, x - 1])
                elif x == 0:
                    pred = int(p[y - 1, x])
                else:
                    pred = _predict(
                        int(p[y, x - 1]), int(p[y - 1, x]),
                        int(p[y - 1, x - 1]), sel,
                    )
                t = _huff_decode(br, tabs[ci])
                if t == 16:
                    diff = 32768
                else:
                    diff = _extend(br.read_bits(t), t) if t else 0
                p[y, x] = (pred + diff) & 0xFFFF
            restart_row_reset = False
            count += 1
    scale = 1 << (prec - 8)
    out = np.stack(
        [np.clip(p // scale, 0, 255).astype(np.uint8) for p in planes],
        axis=-1,
    )
    if nc == 1:
        out = np.repeat(out, 3, axis=-1)
    return w, h, 3, out.tobytes()


# --- hierarchical JPEG (SOF5 differential stages, spec Annex J) -------------
#
# The pyramid mode: DHP declares the full-size progression, a reduced-
# resolution NON-differential frame decodes normally, EXP doubles the
# reference with the spec's (a+b+1)/2 interpolation filter, and each
# DIFFERENTIAL frame (SOF5: sequential Huffman, no level shift) adds its
# decoded difference to the reference. Scope: 8-bit, 4:4:4 stages, one
# expansion per axis between stages (what encode_jpeg_hierarchical
# emits); lossless final stages (SOF7) and arithmetic differential
# variants stay out (documented).


def _exp_expand(plane: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """J.1.1.3 reference expansion: out[2i] = in[i], out[2i+1] =
    (in[i] + in[i+1] + 1) >> 1, last output replicates the edge."""
    p = plane.astype(np.int64)
    if eh:
        hh, ww = p.shape
        out = np.empty((hh, 2 * ww), dtype=np.int64)
        out[:, 0::2] = p
        out[:, 1:-1:2] = (p[:, :-1] + p[:, 1:] + 1) >> 1
        out[:, -1] = p[:, -1]
        p = out
    if ev:
        hh, ww = p.shape
        out = np.empty((2 * hh, ww), dtype=np.int64)
        out[0::2, :] = p
        out[1:-1:2, :] = (p[:-1, :] + p[1:, :] + 1) >> 1
        out[-1, :] = p[-1, :]
        p = out
    return p


def _box_down2(plane: np.ndarray) -> np.ndarray:
    """Edge-padded 2x2 box mean (the encoder's pyramid filter — any
    downsampler is legal; the decoder never sees it)."""
    h, w = plane.shape
    ph, pw = (h + 1) & ~1, (w + 1) & ~1
    p = np.empty((ph, pw))
    p[:h, :w] = plane
    if ph > h:
        p[h:, :w] = plane[-1:, :]
    if pw > w:
        p[:, w:] = p[:, w - 1 : w]
    return p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))


def _encode_seq_frame(
    planes: list[np.ndarray], qts, marker: int, shift: float
) -> tuple[bytes, list[np.ndarray]]:
    """Encode float planes as one sequential-Huffman frame (SOF ``marker``,
    4:4:4) and return (frame bytes incl. SOF/DHT/SOS, the decoder's
    reconstruction of each plane — needed to build the next differential
    stage)."""
    h, w = planes[0].shape
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    nby, nbx = ph // 8, pw // 8
    blocks = []
    recon = []
    for ci, plane in enumerate(planes):
        ti = 0 if ci == 0 else 1
        pp = np.empty((ph, pw))
        pp[:h, :w] = plane
        if ph > h:
            pp[h:, :w] = plane[-1:, :]
        if pw > w:
            pp[:, w:] = pp[:, w - 1 : w]
        zz = np.zeros((nby, nbx, 64), dtype=np.int64)
        rec = np.empty((ph, pw))
        for by in range(nby):
            for bx in range(nbx):
                block = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - shift
                coef = _DCT @ block @ _DCT.T
                q = np.rint(coef.reshape(64) / qts[ti]).astype(np.int64)
                zz[by, bx] = q[ZIGZAG]
                deq = (q * qts[ti]).reshape(8, 8)
                rec[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _DCT.T @ deq @ _DCT + shift
                )
        blocks.append(zz)
        recon.append(rec[:h, :w])
    dc_tabs = [
        _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
        _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ]
    ac_tabs = [
        _huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
        _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ]
    bw = _BitWriter()
    pred = [0] * len(planes)
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(len(planes)):
                ti = 0 if ci == 0 else 1
                _emit_block_huffman(
                    bw, blocks[ci][by, bx], dc_tabs[ti], ac_tabs[ti],
                    pred, ci,
                )
    bw.flush()

    out = bytearray()
    out += bytes((0xFF, marker)) + struct.pack(
        ">HBHHB", 8 + 3 * len(planes), 8, h, w, len(planes)
    )
    for ci in range(len(planes)):
        out += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    for cls, tid, bits_, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        payload = bytes(bits_) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(
            ">HB", 3 + len(payload), (cls << 4) | tid
        )
        out += payload
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(planes), len(planes))
    for ci in range(len(planes)):
        out += struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11)
    out += b"\x00\x3f\x00"
    out += bw.out
    return bytes(out), recon


def encode_jpeg_hierarchical(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 85,
    arithmetic: bool = False,
    lossless_final: bool = False,
    progressive_final: bool = False,
) -> bytes:
    """Top-down RGB bytes → hierarchical JPEG (Annex J): DHP, a half-
    resolution non-differential stage, EXP(1,1), one full-resolution
    differential stage. The differential stage encodes original minus
    the decoder's own expanded stage-1 reconstruction, so fidelity at
    full size is bounded by the stage-2 coder alone.

    ``arithmetic=True`` swaps the entropy stage: SOF9 + SOF13 (QM
    coder) instead of SOF0 + SOF5 — the DCT/quantization pipeline is
    shared, so both reconstruct pixel-identically. ``lossless_final=
    True`` (round 7) makes the final stage a differential-LOSSLESS
    pass over the EXACT integer residual (SOF15 arithmetic / SOF7
    Huffman): the decoded image equals the input byte-for-byte
    regardless of ``quality``; components are then coded as RGB
    directly (the lossless-JPEG convention — an integer-exact YCbCr
    round trip does not exist). ``progressive_final=True`` codes the
    differential stage progressively (SOF14 arithmetic / SOF6
    Huffman) with the standard successive-approximation scan script;
    it decodes pixel-identically to the sequential stage of the same
    quantized residual. Together these cover EVERY cell of the T.81
    frame matrix."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(
        np.float64
    )
    if lossless_final:
        # exact residual stage (SOF15 arithmetic / SOF7 Huffman):
        # components code as RGB (lossless convention, see docstring)
        planes = [img[..., 0], img[..., 1], img[..., 2]]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    qts = [
        _quality_scale(_QT_LUMA, quality),
        _quality_scale(_QT_CHROMA, quality),
    ]
    if arithmetic:
        from cassandra_spark.operators.jpeg_arith import (
            encode_seq_frame_arith,
        )

        seq_frame = encode_seq_frame_arith
        m1, m2 = 0xC9, 0xCD
    else:
        seq_frame = _encode_seq_frame
        m1, m2 = 0xC0, 0xC5
    out = bytearray()
    out += b"\xff\xd8"
    for tid, qtab in enumerate(qts):
        zzq = bytes(int(qtab[ZIGZAG[i]]) for i in range(64))
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + zzq
    # DHP: the full-size progression frame header (no quant selectors used)
    out += b"\xff\xde" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    for cid in (1, 2, 3):
        out += struct.pack("BBB", cid, 0x11, 0 if cid == 1 else 1)
    # stage 1: half resolution, non-differential
    small = [_box_down2(p) for p in planes]
    frame1, recon1 = seq_frame(small, qts, m1, 128.0)
    out += frame1
    # EXP both axes, then the full-size differential stage
    out += b"\xff\xdf" + struct.pack(">HB", 3, 0x11)
    refs = [
        _exp_expand(
            np.clip(np.rint(rc), 0, 255), 1, 1
        ).astype(np.float64)[:height, :width]
        for rc in recon1
    ]
    if lossless_final:
        diffs = [
            (p - rf).astype(np.int64) for p, rf in zip(planes, refs)
        ]
        if arithmetic:
            from cassandra_spark.operators.jpeg_arith import (
                encode_lossless_diff_frame_arith,
            )

            out += encode_lossless_diff_frame_arith(diffs)
        else:
            out += encode_lossless_diff_frame_huff(diffs)
    elif progressive_final:
        diffs = [p - rf for p, rf in zip(planes, refs)]
        if arithmetic:
            from cassandra_spark.operators.jpeg_arith import (
                encode_prog_frame_arith,
            )

            frame2, _ = encode_prog_frame_arith(diffs, qts, 0xCE, 0.0)
        else:
            frame2, _ = encode_prog_frame_huff(diffs, qts, 0xC6, 0.0)
        out += frame2
    else:
        diffs = [p - rf for p, rf in zip(planes, refs)]
        frame2, _ = seq_frame(diffs, qts, m2, 0.0)
        out += frame2
    out += b"\xff\xd9"
    return bytes(out)


# --- differential HUFFMAN stages (SOF6 progressive / SOF7 lossless) ---------
#
# Round 7 closes the last two cells of the T.81 frame matrix: the
# differential Huffman variants. SOF6 reuses the progressive scan
# machinery (spectral selection + successive approximation) over a
# differential frame's coefficients; SOF7 is the Annex-H lossless walk
# with ZERO prediction over the stage residual, which — like SOF15 —
# makes the whole hierarchical pyramid byte-exact.


def encode_prog_frame_huff(
    planes, qts, marker: int, shift: float
) -> tuple[bytes, list]:
    """Encode float planes as one PROGRESSIVE Huffman frame (SOF
    ``marker``: 0xC2 non-differential / 0xC6 differential, 4:4:4) using
    the successive-approximation scan script shared with the arithmetic
    stage encoder. Returns (frame bytes, decoder's reconstruction)."""
    h, w = planes[0].shape
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    nby, nbx = ph // 8, pw // 8
    blocks = []
    recon = []
    for ci, plane in enumerate(planes):
        ti = 0 if ci == 0 else 1
        pp = np.empty((ph, pw))
        pp[:h, :w] = plane
        if ph > h:
            pp[h:, :w] = plane[-1:, :]
        if pw > w:
            pp[:, w:] = pp[:, w - 1 : w]
        zz = np.zeros((nby, nbx, 64), dtype=np.int64)
        rec = np.empty((ph, pw))
        for by in range(nby):
            for bx in range(nbx):
                block = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - shift
                coef = _DCT @ block @ _DCT.T
                q = np.rint(coef.reshape(64) / qts[ti]).astype(np.int64)
                zz[by, bx] = q[ZIGZAG]
                deq = (q * qts[ti]).reshape(8, 8)
                rec[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _DCT.T @ deq @ _DCT + shift
                )
        blocks.append(zz)
        recon.append(rec[:h, :w])
    nc = len(planes)
    dc_tabs = [
        _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
        _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ]
    prog_ac = _huff_codes(_AC_PROG_BITS, _AC_PROG_VALS)

    def sos_header(comps, Ss, Se, Ah, Al):
        hdr = b"\xff\xda" + struct.pack(
            ">HB", 6 + 2 * len(comps), len(comps)
        )
        for ci in comps:
            ti = 0 if ci == 0 else 1
            hdr += struct.pack("BB", ci + 1, (ti << 4) | ti)
        return hdr + struct.pack("BBB", Ss, Se, (Ah << 4) | Al)

    def dc_scan(Ah, Al):
        bw = _BitWriter()
        pred = [0] * nc
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(nc):
                    ti = 0 if ci == 0 else 1
                    dc = int(blocks[ci][by, bx][0])
                    if Ah == 0:
                        v = dc >> Al
                        diff = v - pred[ci]
                        pred[ci] = v
                        t, bits = _magnitude(diff)
                        code, length = dc_tabs[ti][t]
                        bw.write(code, length)
                        if t:
                            bw.write(bits, t)
                    else:
                        bw.write((dc >> Al) & 1, 1)
        bw.flush()
        return bytes(bw.out)

    def ac_scan(ci, Ss, Se, Ah, Al):
        bw = _BitWriter()
        st = _ProgACState(bw, prog_ac)
        for by in range(nby):
            for bx in range(nbx):
                if Ah == 0:
                    _emit_ac_first(st, blocks[ci][by, bx], Ss, Se, Al)
                else:
                    _emit_ac_refine(st, blocks[ci][by, bx], Ss, Se, Al)
        st.flush_eobrun()
        bw.flush()
        return bytes(bw.out)

    out = bytearray()
    out += bytes((0xFF, marker)) + struct.pack(
        ">HBHHB", 8 + 3 * nc, 8, h, w, nc
    )
    for ci in range(nc):
        out += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    for cls, tid, bits_, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_PROG_BITS, _AC_PROG_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_PROG_BITS, _AC_PROG_VALS),
    ):
        payload = bytes(bits_) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(
            ">HB", 3 + len(payload), (cls << 4) | tid
        )
        out += payload
    out += sos_header(list(range(nc)), 0, 0, 0, 1) + dc_scan(0, 1)
    for ci in range(nc):
        out += sos_header([ci], 1, 63, 0, 1) + ac_scan(ci, 1, 63, 0, 1)
    out += sos_header(list(range(nc)), 0, 0, 1, 0) + dc_scan(1, 0)
    for ci in range(nc):
        out += sos_header([ci], 1, 63, 1, 0) + ac_scan(ci, 1, 63, 1, 0)
    return bytes(out), recon


def encode_lossless_diff_frame_huff(diff_planes) -> bytes:
    """Signed int difference planes → one SOF7 frame (DHT + SOF + SOS +
    entropy bytes), 4:4:4, ZERO prediction — the Huffman twin of
    jpeg_arith.encode_lossless_diff_frame_arith."""
    h, w = diff_planes[0].shape
    nc = len(diff_planes)
    tab = _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    bw = _BitWriter()
    for y in range(h):
        for x in range(w):
            for c in range(nc):
                diff = int(diff_planes[c][y, x]) & 0xFFFF
                if diff > 32767:
                    diff -= 65536
                t, bits = _magnitude(diff)
                code, length = tab[t]
                bw.write(code, length)
                if t:
                    bw.write(bits, t)
    bw.flush()

    out = bytearray()
    out += b"\xff\xc7" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for cid in range(1, nc + 1):
        out += struct.pack("BBB", cid, 0x11, 0)
    payload = bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">HB", 3 + len(payload), 0x00)
    out += payload
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for cid in range(1, nc + 1):
        out += struct.pack("BB", cid, 0x00)
    out += struct.pack("BBB", 0, 0, 0)  # Ss=0: differential, no predictor
    out += bytes(bw.out)
    return bytes(out)


def _decode_scan_lossless_diff_huff(
    data, pos, frame, scan, huff, restart_interval
):
    """SOF7 scan → (signed int difference planes, endpos): the Annex-H
    walk with zero prediction; modulo-65536 values re-signed."""
    h, w, comps = frame
    if any(ch != 1 or cv != 1 for _, ch, cv, _ in comps):
        raise ValueError("subsampled lossless JPEG not supported")
    nc = len(comps)
    tabs = []
    for cs, td, _ in scan:
        t = huff.get((0, td))
        if t is None:
            raise ValueError("missing lossless Huffman table")
        tabs.append(t)
    br = _BitReader(data, pos)
    planes = [np.zeros((h, w), dtype=np.int32) for _ in range(nc)]
    count = 0
    for y in range(h):
        for x in range(w):
            if (
                restart_interval
                and count
                and count % restart_interval == 0
            ):
                br.sync_restart()
            for ci in range(nc):
                t = _huff_decode(br, tabs[ci])
                if t == 16:
                    diff = 32768
                else:
                    diff = _extend(br.read_bits(t), t) if t else 0
                v = diff & 0xFFFF
                if v > 32767:
                    v -= 65536
                planes[ci][y, x] = v
            count += 1
    # endpos: the next real marker at/after the reader's byte position
    # (0xFF00 stuffing and RSTn are entropy bytes, skip them)
    p = br.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            break
        p += 1
    return planes, p
