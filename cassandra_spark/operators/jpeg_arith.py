"""Arithmetic-coded JPEG (SOF9 sequential + SOF10 progressive) — pure
Python, zero external codec libraries, for the L4 multimodal tier.

This closes the last entropy-coding variant in the JPEG matrix: the
QM-coder (ITU T.81 Annex D) with the sequential-DCT statistical models
(Annex F) — DC difference conditioning categories, per-index AC
end-of-block/zero decision trees, magnitude category + bit-pattern bins,
and the fixed (non-adapting) sign estimate for AC coefficients.

Scope and validation (documented honestly):

- **decode**: SOF9 and SOF10 (8-bit, 1 or 3 components, subsampling
  ≤ 2×2 via the shared plane pipeline in operators/jpeg.py), DAC
  conditioning markers (DC L/U, AC Kx), restart markers (statistics +
  coder reinit per F.1.4.1), full Annex G progressive models (DC
  first/refine, AC spectral-selection first + successive-approximation
  refine with EOBx). SOF11 lossless-arithmetic decode ships below
  (decode_scan_lossless_arith, Annex H predictors + the 16-bit-wide
  X/M conditioning areas) and hierarchical frames are driven from
  operators/jpeg.py's pyramid; 12-bit sample precision is the one
  variant that still raises ValueError.
- **encode**: SOF9 (optional restart interval) and SOF10 (the Huffman
  progressive encoder's 10-scan script), YCbCr 4:4:4, default
  conditioning (L=0, U=1, Kx=5) — all four (sequential|progressive) ×
  (Huffman|arithmetic) encoders share the exact DCT/quantization
  pipeline, so the entropy stage is the ONLY difference.
- **validation**: the QM-coder is exercised by an isolated
  encode→decode bit-stream round-trip over adversarial bit patterns,
  and the full codec by pixel-identity against the Huffman decode of
  the SAME quantized coefficients (entropy coding is lossless, so any
  divergence is a codec bug). No external arithmetic-JPEG sample exists
  in this offline container, so cross-implementation interop rests on
  the state table and bin layout being transcribed from the public
  spec (T.81 Table D.3 / Annex F) — the same caveat as any clean-room
  implementation tested against itself.

Worker-safe pure functions over bytes (the codecs.py contract).
"""

from __future__ import annotations

import struct

import numpy as np

# --- T.81 Table D.3: Qe values and probability estimation state machine ----
#
# Rows are (Qe, NMPS, NLPS, SWITCH); index 113 is the conventional
# "fixed" bin (Qe ≈ 0.5, transitions to itself, never switches) used for
# AC coefficient signs (F.1.4.3.1).

QM_TABLE = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)

FIXED_BIN_INDEX = 113  # non-adapting ~0.5 estimate (AC sign coding)

# Statistics areas per table id (libjpeg-compatible bin layout, which is
# Table F.4/F.5 flattened): DC = 49 bins used of 64; AC = 3*(k-1) decision
# triples for k=1..63 plus two shared magnitude regions at 189 (k ≤ Kx)
# and 217 (k > Kx), 245 bins used of 256.
DC_STAT_BINS = 64
AC_STAT_BINS = 256


def _new_stats(n: int) -> list[list[int]]:
    """Fresh statistics area: each bin is a mutable [state_index, mps]."""
    return [[0, 0] for _ in range(n)]


# --- QM encoder (T.81 D.1: encoder conventions with byte stuffing) ---------


class ArithEncoder:
    """QM arithmetic encoder. ``encode(st, bit)`` codes one binary
    decision against the adaptive bin ``st`` (a mutable [index, mps]
    pair). C-register layout and byte-stuffing follow the software
    conventions of T.81 D.1.6: output bytes are C bits 19-26, a carry
    propagates into the pending byte, 0xFF output bytes are followed by
    a stuffed 0x00, and trailing zero bytes are withheld until proven
    non-trailing (the decoder synthesizes zeros past the marker)."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1  # pending output byte; -1 = none yet
        self.sc = 0  # count of stacked 0xFF bytes (may carry)
        self.zc = 0  # count of withheld 0x00 bytes (may be trailing)
        self.out = bytearray()

    def _flush_zeros(self) -> None:
        if self.zc:
            self.out += b"\x00" * self.zc
            self.zc = 0

    def _byteout(self) -> None:
        temp = self.c >> 19
        if temp > 0xFF:  # carry: bump pending byte, FFs become 00s
            if self.buffer >= 0:
                self._flush_zeros()
                self.out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self.out.append(0x00)
            self.zc += self.sc
            self.sc = 0
            self.buffer = temp & 0xFF
        elif temp == 0xFF:
            self.sc += 1  # stack: a later carry may still bump it
        else:
            if self.buffer == 0:
                self.zc += 1  # zero byte: withhold (may be trailing)
            elif self.buffer >= 0:
                self._flush_zeros()
                self.out.append(self.buffer)
            if self.sc:
                self._flush_zeros()
                for _ in range(self.sc):
                    self.out += b"\xff\x00"  # settled 0xFF + stuffed zero
                self.sc = 0
            self.buffer = temp
        self.c &= 0x7FFFF

    def _renorm(self) -> None:
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if self.a >= 0x8000:
                break

    def encode(self, st: list[int], bit: int) -> None:
        qe, nmps, nlps, sw = QM_TABLE[st[0]]
        if bit == st[1]:  # MPS path
            self.a -= qe
            if self.a >= 0x8000:
                return  # no renorm → no estimation update
            if self.a < qe:  # conditional exchange: MPS takes the top
                self.c += self.a
                self.a = qe
            st[0] = nmps
            self._renorm()
        else:  # LPS path (always renormalizes)
            self.a -= qe
            if self.a >= qe:  # no exchange: LPS is the top subinterval
                self.c += self.a
                self.a = qe
            if sw:
                st[1] ^= 1
            st[0] = nlps
            self._renorm()

    def flush(self) -> bytes:
        """Terminate (D.1.8): pick the in-interval value with the most
        trailing zero bits, emit the last two value bytes, and drop
        withheld trailing zeros (the decoder synthesizes zeros past the
        marker)."""
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        self.c <<= self.ct
        if self.c & 0xF8000000:  # final carry into the pending byte
            if self.buffer >= 0:
                self._flush_zeros()
                self.out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self.out.append(0x00)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._flush_zeros()
                self.out.append(self.buffer)
            if self.sc:
                self._flush_zeros()
                for _ in range(self.sc):
                    self.out += b"\xff\x00"
                self.sc = 0
        if self.c & 0x7FFF800:  # final bytes, unless trailing zeros
            self._flush_zeros()
            b = (self.c >> 19) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
        self.buffer, self.sc, self.zc = -1, 0, 0
        return bytes(self.out)


# --- QM decoder (T.81 D.2, lazy-renormalization software conventions) ------


class ArithDecoder:
    """QM arithmetic decoder over a JPEG entropy-coded segment. Feeds
    zero bytes once a marker (or end of data) is reached — the legal
    arithmetic-coding convention for scan termination. ``marker_pos``
    then points at the 0xFF of the terminating marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.c = 0
        self.a = 0
        self.ct = -16  # forces the two initial byte loads
        self.marker_pos: int | None = None

    def _next_byte(self) -> int:
        if self.marker_pos is not None:
            return 0
        if self.pos >= len(self.data):
            self.marker_pos = len(self.data)
            return 0
        d = self.data[self.pos]
        self.pos += 1
        if d != 0xFF:
            return d
        # 0xFF: either a stuffed zero (data byte 0xFF) or a marker
        while self.pos < len(self.data) and self.data[self.pos] == 0xFF:
            self.pos += 1
        if self.pos < len(self.data) and self.data[self.pos] == 0x00:
            self.pos += 1
            return 0xFF
        self.marker_pos = self.pos - 1
        return 0

    def decode(self, st: list[int]) -> int:
        # lazy renormalization + byte feed
        while self.a < 0x8000:
            self.ct -= 1
            if self.ct < 0:
                self.c = (self.c << 8) | self._next_byte()
                self.ct += 8
                if self.ct < 0:
                    self.ct += 1
                    if self.ct == 0:
                        self.a = 0x8000  # both initial bytes are in
            self.a <<= 1
        qe, nmps, nlps, sw = QM_TABLE[st[0]]
        mps = st[1]
        self.a -= qe
        temp = self.a << self.ct
        if self.c >= temp:  # top subinterval
            self.c -= temp
            if self.a < qe:  # exchange: top is the MPS
                self.a = qe
                st[0] = nmps
                return mps
            self.a = qe
            if sw:
                st[1] ^= 1
            st[0] = nlps
            return mps ^ 1
        if self.a >= 0x8000:
            return mps  # no renorm pending → no estimation update
        if self.a < qe:  # exchange: bottom is the LPS
            if sw:
                st[1] ^= 1
            st[0] = nlps
            return mps ^ 1
        st[0] = nmps
        return mps


# --- Annex F sequential statistical models ----------------------------------


class _SeqArithModel:
    """DC/AC statistics areas + conditioning state for one scan.
    ``dc_cond``/``ac_kx`` come from DAC markers (defaults L=0/U=1,
    Kx=5)."""

    def __init__(self, n_comps: int, dc_cond, ac_kx) -> None:
        self.dc_stats: dict[int, list[list[int]]] = {}
        self.ac_stats: dict[int, list[list[int]]] = {}
        self.fixed = [FIXED_BIN_INDEX, 0]
        self.dc_context = [0] * n_comps
        self.last_dc = [0] * n_comps
        self.dc_cond = dc_cond  # tbl -> (L, U)
        self.ac_kx = ac_kx  # tbl -> Kx

    def reset(self) -> None:
        """Restart-marker semantics (F.1.4.1): statistics, conditioning
        contexts, and DC predictors all reset."""
        for area in self.dc_stats.values():
            for b in area:
                b[0] = b[1] = 0
        for area in self.ac_stats.values():
            for b in area:
                b[0] = b[1] = 0
        self.fixed = [FIXED_BIN_INDEX, 0]
        self.dc_context = [0] * len(self.dc_context)
        self.last_dc = [0] * len(self.last_dc)

    def dc_area(self, tbl: int) -> list[list[int]]:
        if tbl not in self.dc_stats:
            self.dc_stats[tbl] = _new_stats(DC_STAT_BINS)
        return self.dc_stats[tbl]

    def ac_area(self, tbl: int) -> list[list[int]]:
        if tbl not in self.ac_stats:
            self.ac_stats[tbl] = _new_stats(AC_STAT_BINS)
        return self.ac_stats[tbl]


def _dc_classify(m: int, sign: int, L: int, U: int) -> int:
    """F.1.4.4.1.2: conditioning category of a just-coded DC difference,
    from its magnitude-category msb ``m`` and sign."""
    if m < ((1 << L) >> 1):
        return 0  # zero diff category
    if m > ((1 << U) >> 1):
        return 12 + 4 * sign  # large diff
    return 4 + 4 * sign  # small diff


def _encode_dc(enc, model, tbl, ci, dc: int) -> None:
    area = model.dc_area(tbl)
    base = model.dc_context[ci]
    v = dc - model.last_dc[ci]
    if v == 0:
        enc.encode(area[base], 0)
        model.dc_context[ci] = 0
        return
    model.last_dc[ci] = dc
    enc.encode(area[base], 1)
    if v > 0:
        enc.encode(area[base + 1], 0)
        sign = 0
        st = base + 2  # SP
    else:
        v = -v
        enc.encode(area[base + 1], 1)
        sign = 1
        st = base + 3  # SN
    # magnitude category (F.8): X1 at SP/SN, X2.. at bins 20..
    m = 0
    sz = v - 1
    if sz:
        enc.encode(area[st], 1)
        m = 1
        v2 = sz
        st = 20
        while v2 >> 1:
            v2 >>= 1
            enc.encode(area[st], 1)
            m <<= 1
            st += 1
    enc.encode(area[st], 0)
    L, U = model.dc_cond.get(tbl, (0, 1))
    model.dc_context[ci] = _dc_classify(m, sign, L, U)
    # magnitude bit pattern (F.9): M bins at last-X + 14
    st += 14
    mm = m
    while mm := mm >> 1:
        enc.encode(area[st], 1 if (mm & sz) else 0)


def _decode_dc(dec, model, tbl, ci) -> int:
    area = model.dc_area(tbl)
    base = model.dc_context[ci]
    if dec.decode(area[base]) == 0:
        model.dc_context[ci] = 0
        return model.last_dc[ci]
    sign = dec.decode(area[base + 1])
    st = base + 2 + sign
    m = dec.decode(area[st])
    if m:
        st = 20
        while dec.decode(area[st]):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arith DC magnitude overflow")
            st += 1
    L, U = model.dc_cond.get(tbl, (0, 1))
    model.dc_context[ci] = _dc_classify(m, sign, L, U)
    v = m
    st += 14
    while m := m >> 1:
        if dec.decode(area[st]):
            v |= m
    v += 1
    if sign:
        v = -v
    model.last_dc[ci] += v
    return model.last_dc[ci]


def _encode_ac(enc, model, tbl, zz) -> None:
    """zz: the 63 AC coefficients in scan order (indices 1..63)."""
    area = model.ac_area(tbl)
    kx = model.ac_kx.get(tbl, 5)
    ke = 63
    while ke > 0 and zz[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(area[st], 0)  # not EOB
        while zz[k] == 0:
            enc.encode(area[st + 1], 0)
            st += 3
            k += 1
        enc.encode(area[st + 1], 1)
        v = int(zz[k])
        if v > 0:
            enc.encode(model.fixed, 0)
            sign = 0
        else:
            v = -v
            enc.encode(model.fixed, 1)
            sign = 1
        _ = sign
        st += 2
        m = 0
        sz = v - 1
        if sz:
            enc.encode(area[st], 1)  # X1
            m = 1
            v2 = sz
            if v2 >> 1:
                v2 >>= 1
                enc.encode(area[st], 1)  # X2 (same bin)
                m <<= 1
                st = 189 if k <= kx else 217
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(area[st], 1)
                    m <<= 1
                    st += 1
        enc.encode(area[st], 0)
        st += 14
        mm = m
        while mm := mm >> 1:
            enc.encode(area[st], 1 if (mm & sz) else 0)
        k += 1
    if k <= 63:
        enc.encode(area[3 * (k - 1)], 1)  # EOB


def _decode_ac(dec, model, tbl, zz) -> None:
    area = model.ac_area(tbl)
    kx = model.ac_kx.get(tbl, 5)
    k = 1
    while k <= 63:
        st = 3 * (k - 1)
        if dec.decode(area[st]):
            return  # EOB
        while dec.decode(area[st + 1]) == 0:
            st += 3
            k += 1
            if k > 63:
                raise ValueError("arith AC index overflow")
        sign = dec.decode(model.fixed)
        st += 2
        m = dec.decode(area[st])
        if m:
            if dec.decode(area[st]):
                m <<= 1
                st = 189 if k <= kx else 217
                while dec.decode(area[st]):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arith AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        while m := m >> 1:
            if dec.decode(area[st]):
                v |= m
        v += 1
        if sign:
            v = -v
        zz[k] = v
        k += 1


# --- scan-level encode / decode ---------------------------------------------


def decode_scan_arith(
    data: bytes,
    pos: int,
    frame,
    scan,
    qt,
    dc_cond,
    ac_kx,
    restart_interval: int,
    prec: int = 8,
):
    """Arithmetic-coded sequential scan → RGB, mirroring jpeg._decode_scan's
    MCU walk (interleaved components, subsampling, restart handling)."""
    from cassandra_spark.operators.jpeg import ZIGZAG, _DCT, _planes_to_rgb

    h, w, comps = frame
    shift = float(1 << (prec - 1))
    scale = float(1 << (prec - 8))
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("subsampling factors above 2 not supported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    planes = [
        np.zeros((mcuy * 8 * cv, mcux * 8 * ch))
        for _, ch, cv, _ in comps
    ]
    tabmap = {cs: (td, ta) for cs, td, ta in scan}

    dec = ArithDecoder(data, pos)
    model = _SeqArithModel(len(comps), dc_cond, ac_kx)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                # skip to the RSTn marker, then restart clean
                while dec.marker_pos is None:
                    # drain: the encoder terminated this chunk; the next
                    # marker must be RSTn. Feed until the byte layer
                    # reports it.
                    dec._next_byte()
                mpos = dec.marker_pos
                if not (0xD0 <= data[mpos + 1] <= 0xD7):
                    raise ValueError("expected restart marker")
                dec = ArithDecoder(data, mpos + 2)
                model.reset()
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                td, ta = tabmap[cid]
                qtab = qt.get(tq)
                if qtab is None:
                    raise ValueError("missing quant table")
                for vy in range(cv):
                    for vx in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = _decode_dc(dec, model, td, ci)
                        _decode_ac(dec, model, ta, zz)
                        coef = np.zeros(64)
                        for kk in range(64):
                            coef[ZIGZAG[kk]] = zz[kk] * qtab[ZIGZAG[kk]]
                        block = (
                            _DCT.T @ coef.reshape(8, 8) @ _DCT + shift
                        ) / scale
                        by = (my * cv + vy) * 8
                        bx = (mx * ch + vx) * 8
                        planes[ci][by : by + 8, bx : bx + 8] = block
            mcu_count += 1
    return _planes_to_rgb(planes, comps, h, w, hmax, vmax)


def encode_jpeg_arith(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 85,
    restart_interval: int = 0,
) -> bytes:
    """Top-down RGB bytes → arithmetic-coded sequential JPEG (SOF9,
    YCbCr 4:4:4, default DAC conditioning). Shares the DCT/quantization
    pipeline with the baseline encoder, so for any image
    ``decode(encode_jpeg_arith(x)) == decode(encode_jpeg(x))``
    pixel-for-pixel — entropy coding is lossless."""
    from cassandra_spark.operators.jpeg import ZIGZAG, _rgb_to_quantized

    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    blocks, qts, nby, nbx = _rgb_to_quantized(width, height, rgb, quality)

    dc_cond = {0: (0, 1), 1: (0, 1)}
    ac_kx = {0: 5, 1: 5}
    enc = ArithEncoder()
    model = _SeqArithModel(3, dc_cond, ac_kx)
    chunks: list[bytes] = []
    mcu_count = 0
    for by in range(nby):
        for bx in range(nbx):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                chunks.append(enc.flush())
                chunks.append(
                    bytes((0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)))
                )
                enc = ArithEncoder()
                model.reset()
            for ci in range(3):
                ti = 0 if ci == 0 else 1
                zz = blocks[ci][by, bx]
                _encode_dc(enc, model, ti, ci, int(zz[0]))
                _encode_ac(enc, model, ti, zz)
            mcu_count += 1
    chunks.append(enc.flush())

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    for tid, qtab in enumerate(qts):
        zzq = bytes(int(qtab[ZIGZAG[i]]) for i in range(64))
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + zzq
    # DAC: default conditioning, stated explicitly
    dac = b""
    for tbl in (0, 1):
        L, U = dc_cond[tbl]
        dac += struct.pack("BB", 0x00 | tbl, (U << 4) | L)
        dac += struct.pack("BB", 0x10 | tbl, ac_kx[tbl])
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc9" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    for cid in (1, 2, 3):
        out += struct.pack("BBB", cid, 0x11, 0 if cid == 1 else 1)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid in (1, 2, 3):
        # Td/Ta select the STATISTICS areas (conditioning tables)
        out += struct.pack("BB", cid, 0x00 if cid == 1 else 0x11)
    out += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0
    for ch in chunks:
        out += ch
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive arithmetic (SOF10): Annex G models over the QM coder -------
#
# Statistics, DC predictors, and the coder itself are PER SCAN (the
# reference's start_pass resets them); successive-approximation DC
# refinement bits and newly-significant AC signs use the fixed bin.


def _dec_dc_first_arith(dec, model, tbl, ci, zz, Al) -> None:
    zz[0] = _decode_dc(dec, model, tbl, ci) << Al


def _enc_dc_first_arith(enc, model, tbl, ci, dc, Al) -> None:
    _encode_dc(enc, model, tbl, ci, int(dc) >> Al)


def _dec_ac_first_arith(dec, model, tbl, zz, Ss, Se, Al) -> None:
    area = model.ac_area(tbl)
    kx = model.ac_kx.get(tbl, 5)
    k = Ss
    while k <= Se:
        st = 3 * (k - 1)
        if dec.decode(area[st]):
            return  # EOB
        while dec.decode(area[st + 1]) == 0:
            st += 3
            k += 1
            if k > Se:
                raise ValueError("arith AC-first index overflow")
        sign = dec.decode(model.fixed)
        st += 2
        m = dec.decode(area[st])
        if m:
            if dec.decode(area[st]):
                m <<= 1
                st = 189 if k <= kx else 217
                while dec.decode(area[st]):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arith AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        while m := m >> 1:
            if dec.decode(area[st]):
                v |= m
        v += 1
        if sign:
            v = -v
        zz[k] = v << Al
        k += 1


def _enc_ac_first_arith(enc, model, tbl, zz, Ss, Se, Al) -> None:
    area = model.ac_area(tbl)
    kx = model.ac_kx.get(tbl, 5)
    ke = Se
    while ke >= Ss and (abs(int(zz[ke])) >> Al) == 0:
        ke -= 1
    k = Ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(area[st], 0)  # not EOB
        while True:
            t = int(zz[k])
            neg = t < 0
            t = (-t if neg else t) >> Al
            if t:
                break
            enc.encode(area[st + 1], 0)
            st += 3
            k += 1
        enc.encode(area[st + 1], 1)
        enc.encode(model.fixed, 1 if neg else 0)
        st += 2
        sz = t - 1
        m = 0
        if sz:
            enc.encode(area[st], 1)
            m = 1
            v2 = sz
            if v2 >> 1:
                v2 >>= 1
                enc.encode(area[st], 1)
                m <<= 1
                st = 189 if k <= kx else 217
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(area[st], 1)
                    m <<= 1
                    st += 1
        enc.encode(area[st], 0)
        st += 14
        mm = m
        while mm := mm >> 1:
            enc.encode(area[st], 1 if (mm & sz) else 0)
        k += 1
    if k <= Se:
        enc.encode(area[3 * (k - 1)], 1)  # EOB


def _dec_ac_refine_arith(dec, model, tbl, zz, Ss, Se, Al) -> None:
    area = model.ac_area(tbl)
    p1, m1 = 1 << Al, -1 << Al
    kex = Se
    while kex > 0 and zz[kex] == 0:
        kex -= 1
    k = Ss
    while k <= Se:
        st = 3 * (k - 1)
        if k > kex:
            if dec.decode(area[st]):
                return  # EOB
        while True:
            if zz[k] != 0:  # previously-significant: correction bit
                if dec.decode(area[st + 2]):
                    zz[k] = int(zz[k]) + (m1 if zz[k] < 0 else p1)
                break
            if dec.decode(area[st + 1]):  # newly significant
                zz[k] = m1 if dec.decode(model.fixed) else p1
                break
            st += 3
            k += 1
            if k > Se:
                raise ValueError("arith AC-refine index overflow")
        k += 1


def _enc_ac_refine_arith(enc, model, tbl, zz, Ss, Se, Ah, Al) -> None:
    area = model.ac_area(tbl)
    ke = Se
    while ke >= Ss and (abs(int(zz[ke])) >> Al) == 0:
        ke -= 1
    kex = ke
    while kex >= Ss and (abs(int(zz[kex])) >> Ah) == 0:
        kex -= 1
    k = Ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(area[st], 0)  # not EOB
        while True:
            t = int(zz[k])
            neg = t < 0
            ta = (-t if neg else t) >> Al
            if ta:
                if ta >> 1:  # significant before this pass
                    enc.encode(area[st + 2], ta & 1)
                else:  # newly significant at this Al
                    enc.encode(area[st + 1], 1)
                    enc.encode(model.fixed, 1 if neg else 0)
                break
            enc.encode(area[st + 1], 0)
            st += 3
            k += 1
        k += 1
    if k <= Se:
        enc.encode(area[3 * (k - 1)], 1)  # EOB


def decode_prog_scan_arith(
    data, pos, frame, scan, Ss, Se, Ah, Al, coefs, dc_cond, ac_kx,
    restart_interval,
):
    """One SOF10 progressive SOS: arithmetic-decode the scan's blocks
    into the shared coefficient buffers (the same accumulation contract
    as jpeg._decode_prog_scan); returns the stream position of the
    terminating marker. Statistics, DC state, and the QM decoder are
    scan-local; restarts reinit all three."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    cid_to_ci = {c[0]: i for i, c in enumerate(comps)}

    dec = ArithDecoder(data, pos)
    model = _SeqArithModel(len(comps), dc_cond, ac_kx)

    def restart(count: int):
        nonlocal dec
        if restart_interval and count and count % restart_interval == 0:
            while dec.marker_pos is None:
                dec._next_byte()
            mpos = dec.marker_pos
            if not (0xD0 <= data[mpos + 1] <= 0xD7):
                raise ValueError("expected restart marker")
            dec = ArithDecoder(data, mpos + 2)
            model.reset()

    if len(scan) > 1:  # interleaved DC scan
        if Ss != 0:
            raise ValueError("interleaved AC scan is not legal JPEG")
        count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                restart(count)
                for cs, td, _ in scan:
                    ci = cid_to_ci[cs]
                    _, ch, cv, _ = comps[ci]
                    for vy in range(cv):
                        for vx in range(ch):
                            zz = coefs[ci][my * cv + vy, mx * ch + vx]
                            if Ah == 0:
                                _dec_dc_first_arith(
                                    dec, model, td, ci, zz, Al
                                )
                            elif dec.decode(model.fixed):
                                zz[0] = int(zz[0]) | (1 << Al)
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
                restart(count)
                zz = coefs[ci][by, bx]
                if Ss == 0:
                    if Ah == 0:
                        _dec_dc_first_arith(dec, model, td, ci, zz, Al)
                    elif dec.decode(model.fixed):
                        zz[0] = int(zz[0]) | (1 << Al)
                elif Ah == 0:
                    _dec_ac_first_arith(dec, model, ta, zz, Ss, Se, Al)
                else:
                    _dec_ac_refine_arith(dec, model, ta, zz, Ss, Se, Al)
                count += 1
    while dec.marker_pos is None:
        dec._next_byte()
    return dec.marker_pos


def encode_jpeg_arith_progressive(
    width: int, height: int, rgb: bytes, quality: int = 85
) -> bytes:
    """Top-down RGB bytes → progressive ARITHMETIC JPEG (SOF10, YCbCr
    4:4:4) with the same 10-scan script as the Huffman progressive
    encoder (DC first Al=1, banded AC first with point transform, DC
    refine, chained AC refinements to full precision) — so all four
    (sequential|progressive) × (Huffman|arithmetic) encodings of an
    image decode pixel-identically."""
    from cassandra_spark.operators.jpeg import ZIGZAG, _rgb_to_quantized

    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    blocks, qts, nby, nbx = _rgb_to_quantized(width, height, rgb, quality)
    dc_cond = {0: (0, 1), 1: (0, 1)}
    ac_kx = {0: 5, 1: 5}

    def sos_header(comps, Ss, Se, Ah, Al):
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
        for ci in comps:
            ti = 0 if ci == 0 else 1
            hdr += struct.pack("BB", ci + 1, (ti << 4) | ti)
        return hdr + struct.pack("BBB", Ss, Se, (Ah << 4) | Al)

    def dc_scan(Ah, Al):
        enc = ArithEncoder()
        model = _SeqArithModel(3, dc_cond, ac_kx)
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(3):
                    ti = 0 if ci == 0 else 1
                    dc = int(blocks[ci][by, bx][0])
                    if Ah == 0:
                        _enc_dc_first_arith(enc, model, ti, ci, dc, Al)
                    else:
                        enc.encode(model.fixed, (dc >> Al) & 1)
        return enc.flush()

    def ac_scan(ci, Ss, Se, Ah, Al):
        enc = ArithEncoder()
        model = _SeqArithModel(3, dc_cond, ac_kx)
        ti = 0 if ci == 0 else 1
        for by in range(nby):
            for bx in range(nbx):
                zz = blocks[ci][by, bx]
                if Ah == 0:
                    _enc_ac_first_arith(enc, model, ti, zz, Ss, Se, Al)
                else:
                    _enc_ac_refine_arith(enc, model, ti, zz, Ss, Se, Ah, Al)
        return enc.flush()

    out = bytearray()
    out += b"\xff\xd8"
    for tid, qtab in enumerate(qts):
        zzq = bytes(int(qtab[ZIGZAG[i]]) for i in range(64))
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + zzq
    dac = b""
    for tbl in (0, 1):
        L, U = dc_cond[tbl]
        dac += struct.pack("BB", 0x00 | tbl, (U << 4) | L)
        dac += struct.pack("BB", 0x10 | tbl, ac_kx[tbl])
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    out += b"\xff\xca" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    for cid in (1, 2, 3):
        out += struct.pack("BBB", cid, 0x11, 0 if cid == 1 else 1)
    out += sos_header([0, 1, 2], 0, 0, 0, 1) + dc_scan(0, 1)
    out += sos_header([0], 1, 5, 0, 2) + ac_scan(0, 1, 5, 0, 2)
    out += sos_header([0], 6, 63, 0, 2) + ac_scan(0, 6, 63, 0, 2)
    out += sos_header([1], 1, 63, 0, 1) + ac_scan(1, 1, 63, 0, 1)
    out += sos_header([2], 1, 63, 0, 1) + ac_scan(2, 1, 63, 0, 1)
    out += sos_header([0, 1, 2], 0, 0, 1, 0) + dc_scan(1, 0)
    out += sos_header([0], 1, 63, 2, 1) + ac_scan(0, 1, 63, 2, 1)
    out += sos_header([0], 1, 63, 1, 0) + ac_scan(0, 1, 63, 1, 0)
    out += sos_header([1], 1, 63, 1, 0) + ac_scan(1, 1, 63, 1, 0)
    out += sos_header([2], 1, 63, 1, 0) + ac_scan(2, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


# --- lossless arithmetic JPEG (SOF11, spec Annex H + the QM-coder) -----------
#
# The prediction walk is SOF3's (jpeg.py Annex-H predictors, modulo-65536
# difference arithmetic, byte-exact round trip); only the entropy stage
# differs: each difference is coded with the DC-difference decision tree
# (S0 zero/nonzero, SS sign, magnitude category + bit pattern) under a
# TWO-dimensional conditioning context — the 5-way classifications of the
# differences already coded at the LEFT neighbor (Da) and the ABOVE
# neighbor (Db) of the current sample, 25 contexts of 4 decision bins
# each (H.1.2.3). Magnitude-category/bit bins live in two shared areas
# selected by whether Db classified large (H.1.2.3's second bin set for
# high-activity neighborhoods). Classification reuses the DC rule
# (F.1.4.4.1.2 via _dc_classify) with the DAC (L, U) conditioning.
#
# X/M areas are 16 wide (not the DC coder's 14): modulo-65536 lossless
# differences reach |v| = 32768, i.e. magnitude msb 2^15.
#
# Validation mirrors the module's honesty note: byte-exact
# encode->decode round trip over adversarial images + pixel identity
# with the SOF3 Huffman path on the same predictor (entropy coding is
# lossless, so any divergence is a codec bug); no external SOF11 sample
# exists offline, so cross-implementation interop rests on the
# clean-room transcription, same caveat as SOF9/10 above.

LL_CTX_BINS = 100        # 25 contexts x (S0, SS, SP, SN)
LL_X_A = 100             # X1..X16 area A (Db not large)
LL_M_A = LL_X_A + 16
LL_X_B = LL_M_A + 16     # area B (Db classified large)
LL_M_B = LL_X_B + 16
LL_STAT_BINS = LL_M_B + 16


class _LosslessArithModel:
    """Statistics per arithmetic table id + per-component class planes."""

    def __init__(self, n_comps: int, dc_cond) -> None:
        self.stats: dict[int, list[list[int]]] = {}
        self.dc_cond = dc_cond  # tbl -> (L, U)

    def area(self, tbl: int) -> list[list[int]]:
        if tbl not in self.stats:
            self.stats[tbl] = _new_stats(LL_STAT_BINS)
        return self.stats[tbl]

    def reset(self) -> None:
        for area in self.stats.values():
            for b in area:
                b[0] = b[1] = 0


def _ll_class(v: int, L: int, U: int) -> int:
    """5-way conditioning class (0 zero, 1 +small, 2 -small, 3 +large,
    4 -large) of an already-coded difference, via the DC rule."""
    if v == 0:
        return 0
    sign = 1 if v < 0 else 0
    sz = abs(v) - 1
    m = 1
    while m <= sz:
        m <<= 1
    m >>= 1  # msb of sz (0 when sz == 0)
    return _dc_classify(m, sign, L, U) // 4


def _ll_code_diff(enc, area, base: int, xa: int, v: int) -> None:
    """Encode one prediction difference with the DC decision tree under
    context ``base``; magnitude bins at ``xa`` (area A or B)."""
    if v == 0:
        enc.encode(area[base], 0)
        return
    enc.encode(area[base], 1)
    if v > 0:
        enc.encode(area[base + 1], 0)
        st = base + 2
    else:
        v = -v
        enc.encode(area[base + 1], 1)
        st = base + 3
    m = 0
    sz = v - 1
    if sz:
        enc.encode(area[st], 1)  # X1 rides the SP/SN bin (DC convention)
        m = 1
        v2 = sz
        st = xa
        while v2 >> 1:
            v2 >>= 1
            enc.encode(area[st], 1)
            m <<= 1
            st += 1
    enc.encode(area[st], 0)
    st += 16  # M bins parallel the X bins at +16 (see area note above)
    mm = m
    while mm := mm >> 1:
        enc.encode(area[st], 1 if (mm & sz) else 0)


def _ll_decode_diff(dec, area, base: int, xa: int) -> int:
    if dec.decode(area[base]) == 0:
        return 0
    sign = dec.decode(area[base + 1])
    st = base + 2 + sign
    m = dec.decode(area[st])
    if m:
        st = xa
        while dec.decode(area[st]):
            m <<= 1
            if m == 0x10000:
                raise ValueError("arith lossless magnitude overflow")
            st += 1
    v = m
    st += 16
    while m := m >> 1:
        if dec.decode(area[st]):
            v |= m
    v += 1
    return -v if sign else v


def encode_jpeg_lossless_arith(
    width: int,
    height: int,
    rgb: bytes,
    predictor: int = 4,
    restart_interval: int = 0,
) -> bytes:
    """Top-down 8-bit RGB bytes → lossless arithmetic JPEG (SOF11):
    exact, no quantization, no Huffman tables — the QM-coder replaces
    the entropy stage of encode_jpeg_lossless."""
    from cassandra_spark.operators.jpeg import _predict

    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    L, U = 0, 1
    model = _LosslessArithModel(3, {0: (L, U)})
    enc = ArithEncoder()
    body = bytearray()
    # class planes: classification of the diff coded at each position
    above = [[0] * width for _ in range(3)]
    left = [0, 0, 0]
    count = 0
    restart_reset = False
    for y in range(height):
        for x in range(width):
            if (
                restart_interval
                and count
                and count % restart_interval == 0
            ):
                body += enc.flush()
                body += bytes(
                    (0xFF, 0xD0 + ((count // restart_interval - 1) % 8))
                )
                enc = ArithEncoder()
                model.reset()
                above = [[0] * width for _ in range(3)]
                left = [0, 0, 0]
                restart_reset = True
            area = model.area(0)
            for c in range(3):
                cur = rgb[(y * width + x) * 3 + c]
                if restart_reset or (x == 0 and y == 0):
                    pred = 128
                elif y == 0:
                    pred = rgb[(y * width + x - 1) * 3 + c]
                elif x == 0:
                    pred = rgb[((y - 1) * width + x) * 3 + c]
                else:
                    pred = _predict(
                        rgb[(y * width + x - 1) * 3 + c],
                        rgb[((y - 1) * width + x) * 3 + c],
                        rgb[((y - 1) * width + x - 1) * 3 + c],
                        predictor,
                    )
                diff = (cur - pred) & 0xFFFF
                if diff > 32767:
                    diff -= 65536
                ca = left[c] if x > 0 else 0
                cb = above[c][x] if y > 0 else 0
                base = 4 * (5 * cb + ca)
                xa = LL_X_B if cb >= 3 else LL_X_A
                _ll_code_diff(enc, area, base, xa, diff)
                cls = _ll_class(diff, L, U)
                left[c] = cls
                above[c][x] = cls
            restart_reset = False
            count += 1
    body += enc.flush()

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xcb" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    for cid in (1, 2, 3):
        out += struct.pack("BBB", cid, 0x11, 0)
    out += b"\xff\xcc" + struct.pack(">HBB", 4, 0x00, (U << 4) | L)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid in (1, 2, 3):
        out += struct.pack("BB", cid, 0x00)
    out += struct.pack("BBB", predictor, 0, 0)
    out += body
    out += b"\xff\xd9"
    return bytes(out)


def decode_scan_lossless_arith(
    data: bytes,
    pos: int,
    frame,
    scan,
    dc_cond,
    sel: int,
    pt: int,
    prec: int,
    restart_interval: int,
):
    """SOF11 scan: SOF3's interleaved raster walk with QM-decoded
    differences under the 2-D neighbor-class conditioning."""
    h, w, comps = frame
    if any(ch != 1 or cv != 1 for _, ch, cv, _ in comps):
        raise ValueError("subsampled lossless JPEG not supported")
    nc = len(comps)
    tbls = [td for _, td, _ in scan]
    dec = ArithDecoder(data, pos)
    model = _LosslessArithModel(nc, dc_cond)
    planes = [np.zeros((h, w), dtype=np.int32) for _ in range(nc)]
    default = 1 << (prec - 1 - pt)
    above = [[0] * w for _ in range(nc)]
    left = [0] * nc
    count = 0
    restart_reset = False
    for y in range(h):
        for x in range(w):
            if (
                restart_interval
                and count
                and count % restart_interval == 0
            ):
                while dec.marker_pos is None:
                    dec._next_byte()
                mpos = dec.marker_pos
                if not (0xD0 <= data[mpos + 1] <= 0xD7):
                    raise ValueError("expected restart marker")
                dec = ArithDecoder(data, mpos + 2)
                model.reset()
                above = [[0] * w for _ in range(nc)]
                left = [0] * nc
                restart_reset = True
            for ci in range(nc):
                p = planes[ci]
                if restart_reset or (x == 0 and y == 0):
                    pred = default
                elif y == 0:
                    pred = int(p[y, x - 1])
                elif x == 0:
                    pred = int(p[y - 1, x])
                else:
                    from cassandra_spark.operators.jpeg import _predict

                    pred = _predict(
                        int(p[y, x - 1]), int(p[y - 1, x]),
                        int(p[y - 1, x - 1]), sel,
                    )
                L, U = dc_cond.get(tbls[ci], (0, 1))
                area = model.area(tbls[ci])
                ca = left[ci] if x > 0 else 0
                cb = above[ci][x] if y > 0 else 0
                base = 4 * (5 * cb + ca)
                xa = LL_X_B if cb >= 3 else LL_X_A
                diff = _ll_decode_diff(dec, area, base, xa)
                p[y, x] = (pred + diff) & 0xFFFF
                cls = _ll_class(diff, L, U)
                left[ci] = cls
                above[ci][x] = cls
            restart_reset = False
            count += 1
    scale = 1 << (prec - 8)
    out = np.stack(
        [np.clip(p // scale, 0, 255).astype(np.uint8) for p in planes],
        axis=-1,
    )
    if nc == 1:
        out = np.repeat(out, 3, axis=-1)
    return w, h, 3, out.tobytes()


# --- hierarchical support: planes-mode scan decode + stage encoder ----------
#
# Round 7 closes the differential-arithmetic variants: SOF13
# (differential sequential DCT, QM entropy) decodes through the same
# Annex-J pyramid walk as SOF5, and hierarchical stage ENCODING can use
# the arithmetic entropy stage (encode_seq_frame_arith mirrors
# jpeg._encode_seq_frame; the DCT/quantization pipeline is shared, so
# Huffman and arithmetic progressions reconstruct pixel-identically).


def decode_scan_arith_planes(
    data: bytes,
    pos: int,
    frame,
    scan,
    qt,
    dc_cond,
    ac_kx,
    restart_interval: int,
    shift: float,
    scale: float,
):
    """Arithmetic sequential scan → (padded per-component planes, endpos)
    — the planes-mode twin of decode_scan_arith, for hierarchical
    progressions (``shift=0`` decodes a DIFFERENTIAL frame's signed
    difference planes)."""
    from cassandra_spark.operators.jpeg import ZIGZAG, _DCT

    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("subsampling factors above 2 not supported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * 8 * cv, mcux * 8 * ch))
        for _, ch, cv, _ in comps
    ]
    tabmap = {cs: (td, ta) for cs, td, ta in scan}
    dec = ArithDecoder(data, pos)
    model = _SeqArithModel(len(comps), dc_cond, ac_kx)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                while dec.marker_pos is None:
                    dec._next_byte()
                mpos = dec.marker_pos
                if not (0xD0 <= data[mpos + 1] <= 0xD7):
                    raise ValueError("expected restart marker")
                dec = ArithDecoder(data, mpos + 2)
                model.reset()
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                td, ta = tabmap[cid]
                qtab = qt.get(tq)
                if qtab is None:
                    raise ValueError("missing quant table")
                for vy in range(cv):
                    for vx in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = _decode_dc(dec, model, td, ci)
                        _decode_ac(dec, model, ta, zz)
                        coef = np.zeros(64)
                        for kk in range(64):
                            coef[ZIGZAG[kk]] = zz[kk] * qtab[ZIGZAG[kk]]
                        block = (
                            _DCT.T @ coef.reshape(8, 8) @ _DCT + shift
                        ) / scale
                        by = (my * cv + vy) * 8
                        bx = (mx * ch + vx) * 8
                        planes[ci][by : by + 8, bx : bx + 8] = block
            mcu_count += 1
    while dec.marker_pos is None:
        dec._next_byte()
    return planes, dec.marker_pos


def encode_seq_frame_arith(
    planes, qts, marker: int, shift: float
) -> tuple[bytes, list]:
    """Encode float planes as one arithmetic sequential frame (SOF
    ``marker``: 0xC9 non-differential / 0xCD differential, 4:4:4) and
    return (frame bytes incl. DAC/SOF/SOS, the decoder's reconstruction
    of each plane) — jpeg._encode_seq_frame with the QM entropy stage."""
    from cassandra_spark.operators.jpeg import ZIGZAG, _DCT

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

    dc_cond = {0: (0, 1), 1: (0, 1)}
    ac_kx = {0: 5, 1: 5}
    enc = ArithEncoder()
    model = _SeqArithModel(len(planes), dc_cond, ac_kx)
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(len(planes)):
                ti = 0 if ci == 0 else 1
                zz = blocks[ci][by, bx]
                _encode_dc(enc, model, ti, ci, int(zz[0]))
                _encode_ac(enc, model, ti, zz)
    body = enc.flush()

    out = bytearray()
    dac = b""
    for tbl in (0, 1):
        L, U = dc_cond[tbl]
        dac += struct.pack("BB", 0x00 | tbl, (U << 4) | L)
        dac += struct.pack("BB", 0x10 | tbl, ac_kx[tbl])
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    out += bytes((0xFF, marker)) + struct.pack(
        ">HBHHB", 8 + 3 * len(planes), 8, h, w, len(planes)
    )
    for ci in range(len(planes)):
        out += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(planes), len(planes))
    for ci in range(len(planes)):
        out += struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11)
    out += b"\x00\x3f\x00"
    out += body
    return bytes(out), recon


# --- differential LOSSLESS stage (SOF15): exact hierarchical final pass -----
#
# In a differential lossless frame the prediction is ZERO (the samples
# ARE the stage differences), so each signed difference codes directly
# through the lossless decision tree; modulo-65536 arithmetic makes the
# stage exact, which makes the WHOLE pyramid exact — the decoder's
# stage-1 reconstruction plus the coded difference reproduces the
# original sample bit-for-bit.


def encode_lossless_diff_frame_arith(diff_planes) -> bytes:
    """Signed int difference planes → one SOF15 frame (DAC + SOF + SOS +
    entropy bytes), 4:4:4, zero prediction."""
    h, w = diff_planes[0].shape
    nc = len(diff_planes)
    L, U = 0, 1
    model = _LosslessArithModel(nc, {0: (L, U)})
    enc = ArithEncoder()
    above = [[0] * w for _ in range(nc)]
    left = [0] * nc
    area_getter = model.area
    for y in range(h):
        for x in range(w):
            area = area_getter(0)
            for c in range(nc):
                v = int(diff_planes[c][y, x])
                diff = v & 0xFFFF
                if diff > 32767:
                    diff -= 65536
                ca = left[c] if x > 0 else 0
                cb = above[c][x] if y > 0 else 0
                base = 4 * (5 * cb + ca)
                xa = LL_X_B if cb >= 3 else LL_X_A
                _ll_code_diff(enc, area, base, xa, diff)
                cls = _ll_class(diff, L, U)
                left[c] = cls
                above[c][x] = cls
    body = enc.flush()

    out = bytearray()
    out += b"\xff\xcc" + struct.pack(">HBB", 4, 0x00, (U << 4) | L)
    out += b"\xff\xcf" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for cid in range(1, nc + 1):
        out += struct.pack("BBB", cid, 0x11, 0)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for cid in range(1, nc + 1):
        out += struct.pack("BB", cid, 0x00)
    out += struct.pack("BBB", 0, 0, 0)  # Ss=0 (differential: no predictor)
    out += body
    return bytes(out)


def decode_scan_lossless_diff_arith(
    data: bytes,
    pos: int,
    frame,
    scan,
    dc_cond,
    restart_interval: int,
):
    """SOF15 scan → (signed int difference planes, endpos). Zero
    prediction, same 2-D neighbor-class conditioning as SOF11."""
    h, w, comps = frame
    if any(ch != 1 or cv != 1 for _, ch, cv, _ in comps):
        raise ValueError("subsampled lossless JPEG not supported")
    nc = len(comps)
    tbls = [td for _, td, _ in scan]
    dec = ArithDecoder(data, pos)
    model = _LosslessArithModel(nc, dc_cond)
    planes = [np.zeros((h, w), dtype=np.int32) for _ in range(nc)]
    above = [[0] * w for _ in range(nc)]
    left = [0] * nc
    count = 0
    for y in range(h):
        for x in range(w):
            if (
                restart_interval
                and count
                and count % restart_interval == 0
            ):
                while dec.marker_pos is None:
                    dec._next_byte()
                mpos = dec.marker_pos
                if not (0xD0 <= data[mpos + 1] <= 0xD7):
                    raise ValueError("expected restart marker")
                dec = ArithDecoder(data, mpos + 2)
                model.reset()
                above = [[0] * w for _ in range(nc)]
                left = [0] * nc
            for ci in range(nc):
                L, U = dc_cond.get(tbls[ci], (0, 1))
                area = model.area(tbls[ci])
                ca = left[ci] if x > 0 else 0
                cb = above[ci][x] if y > 0 else 0
                base = 4 * (5 * cb + ca)
                xa = LL_X_B if cb >= 3 else LL_X_A
                diff = _ll_decode_diff(dec, area, base, xa)
                planes[ci][y, x] = diff
                cls = _ll_class(diff, L, U)
                left[ci] = cls
                above[ci][x] = cls
            count += 1
    while dec.marker_pos is None:
        dec._next_byte()
    return planes, dec.marker_pos


def encode_prog_frame_arith(
    planes, qts, marker: int, shift: float
) -> tuple[bytes, list]:
    """Encode float planes as one PROGRESSIVE arithmetic frame (SOF
    ``marker``: 0xCA non-differential / 0xCE differential, 4:4:4) using
    the same 10-scan successive-approximation script as the standalone
    progressive encoders — for hierarchical stages (SOF14 closes the
    arithmetic differential matrix). Returns (frame bytes incl.
    DAC/SOF/scans, the decoder's reconstruction of each plane)."""
    from cassandra_spark.operators.jpeg import ZIGZAG, _DCT

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

    dc_cond = {0: (0, 1), 1: (0, 1)}
    ac_kx = {0: 5, 1: 5}
    nc = len(planes)

    def sos_header(comps, Ss, Se, Ah, Al):
        hdr = b"\xff\xda" + struct.pack(
            ">HB", 6 + 2 * len(comps), len(comps)
        )
        for ci in comps:
            ti = 0 if ci == 0 else 1
            hdr += struct.pack("BB", ci + 1, (ti << 4) | ti)
        return hdr + struct.pack("BBB", Ss, Se, (Ah << 4) | Al)

    def dc_scan(Ah, Al):
        enc = ArithEncoder()
        model = _SeqArithModel(nc, dc_cond, ac_kx)
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(nc):
                    ti = 0 if ci == 0 else 1
                    dc = int(blocks[ci][by, bx][0])
                    if Ah == 0:
                        _enc_dc_first_arith(enc, model, ti, ci, dc, Al)
                    else:
                        enc.encode(model.fixed, (dc >> Al) & 1)
        return enc.flush()

    def ac_scan(ci, Ss, Se, Ah, Al):
        enc = ArithEncoder()
        model = _SeqArithModel(nc, dc_cond, ac_kx)
        ti = 0 if ci == 0 else 1
        for by in range(nby):
            for bx in range(nbx):
                zz = blocks[ci][by, bx]
                if Ah == 0:
                    _enc_ac_first_arith(enc, model, ti, zz, Ss, Se, Al)
                else:
                    _enc_ac_refine_arith(enc, model, ti, zz, Ss, Se, Ah, Al)
        return enc.flush()

    out = bytearray()
    dac = b""
    for tbl in (0, 1):
        L, U = dc_cond[tbl]
        dac += struct.pack("BB", 0x00 | tbl, (U << 4) | L)
        dac += struct.pack("BB", 0x10 | tbl, ac_kx[tbl])
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    out += bytes((0xFF, marker)) + struct.pack(
        ">HBHHB", 8 + 3 * nc, 8, h, w, nc
    )
    for ci in range(nc):
        out += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    out += sos_header(list(range(nc)), 0, 0, 0, 1) + dc_scan(0, 1)
    for ci in range(nc):
        out += sos_header([ci], 1, 63, 0, 1) + ac_scan(ci, 1, 63, 0, 1)
    out += sos_header(list(range(nc)), 0, 0, 1, 0) + dc_scan(1, 0)
    for ci in range(nc):
        out += sos_header([ci], 1, 63, 1, 0) + ac_scan(ci, 1, 63, 1, 0)
    return bytes(out), recon
