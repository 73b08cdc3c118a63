"""Baseline sequential JPEG codec — pure Python + numpy, zero external
codec libraries, for the L4 multimodal tier.

Scope (documented honestly):

- **decode**: baseline DCT sequential (SOF0), 8-bit samples, Huffman
  entropy coding, 1 or 3 components, subsampling factors up to 2×2
  (4:4:4 / 4:2:2 / 4:2:0 via box upsample), restart markers (DRI/RSTn),
  APPn/COM skipped. Progressive (SOF2), arithmetic coding, and 12-bit
  precision raise ``ValueError`` — the multimodal pipeline degrades those
  payloads to the stub path instead of failing the job.
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


def encode_jpeg(width: int, height: int, rgb: bytes, quality: int = 85) -> bytes:
    """Top-down RGB bytes → baseline sequential JPEG (YCbCr 4:4:4)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
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
    dc_tabs = [
        _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
        _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ]
    ac_tabs = [
        _huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
        _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ]

    # pad each plane to multiples of 8 by edge replication
    ph = (height + 7) & ~7
    pw = (width + 7) & ~7
    padded = []
    for p in planes:
        pp = np.empty((ph, pw))
        pp[:height, :width] = p
        pp[height:, :width] = p[-1:, :]
        pp[:, width:] = pp[:, width - 1 : width]
        padded.append(pp)

    w = _BitWriter()
    pred = [0, 0, 0]
    inv_zz = ZIGZAG  # scan position i reads block index ZIGZAG[i]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci in range(3):
                ti = 0 if ci == 0 else 1
                block = padded[ci][by : by + 8, bx : bx + 8] - 128.0
                coef = _DCT @ block @ _DCT.T
                q = np.rint(coef.reshape(64) / qts[ti]).astype(np.int64)
                zz = [int(q[inv_zz[i]]) for i in range(64)]
                # DC
                diff = zz[0] - pred[ci]
                pred[ci] = zz[0]
                t, bits = _magnitude(diff)
                code, length = dc_tabs[ti][t]
                w.write(code, length)
                if t:
                    w.write(bits, t)
                # AC with run-length + ZRL/EOB
                run = 0
                for i in range(1, 64):
                    v = zz[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_tabs[ti][0xF0]  # ZRL
                        w.write(code, length)
                        run -= 16
                    t, bits = _magnitude(v)
                    code, length = ac_tabs[ti][(run << 4) | t]
                    w.write(code, length)
                    w.write(bits, t)
                    run = 0
                if run:
                    code, length = ac_tabs[ti][0x00]  # EOB
                    w.write(code, length)
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


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Baseline sequential JPEG → (width, height, 3, top-down RGB bytes).
    Raises ``ValueError`` for progressive/arithmetic/12-bit variants and
    malformed streams."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps)
    restart_interval = 0
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
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
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tab = np.zeros(64, dtype=np.int32)
                for i in range(64):
                    tab[ZIGZAG[i]] = seg[p + i]
                qt[tq] = tab
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                huff[(cls, tid)] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, h, w_, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w_, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG is supported")
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
            return _decode_scan(
                data, pos + seglen, frame, scan, qt, huff, restart_interval
            )
        pos += seglen
    raise ValueError("no scan data found")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
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
                        block = _DCT.T @ coef.reshape(8, 8) @ _DCT + 128.0
                        by = (my * cv + vy) * 8
                        bx = (mx * ch + vx) * 8
                        planes[ci][by : by + 8, bx : bx + 8] = block
            mcu_count += 1

    # upsample to full resolution and convert
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
