"""H.264/AVC baseline-profile INTRA codec subset — the round-12 step into
inter-coded video (SURVEY §2.12; round-11 verdict "what's missing" #2).

Scope (honest): IDR pictures only, CAVLC entropy coding, I_16x16 and
I_PCM macroblocks, 4:2:0 chroma, frame_mbs_only, deblocking disabled by
the slice header. That is exactly the subset a frame-sampling pipeline
needs at 100 TB — sample only the IDR (sync) pictures of a GOP and skip
the inter frames — and it is the subset this module's own writer emits,
so the decoder is round-trip-tested without external samples (the
jpeg.py / avi.py self-validation contract). Everything outside the
subset raises NotImplementedError with the reason: I_4x4 / inter slices
/ CABAC remain gated.

Clean-room transcription from the PUBLIC ITU-T H.264 (ISO/IEC 14496-10)
specification: exp-Golomb (9.1), CAVLC residual (9.2 with tables
9-5..9-10), intra prediction (8.3), transform/scaling (8.5), NAL/RBSP
emulation prevention (7.3/7.4). Caveat recorded: with no reference
decoder in the container, table transcription is validated structurally
(prefix-freeness + completeness tests) and by encoder/decoder
round-trip; cross-implementation interop is asserted only to the spec
text, the same standing caveat as jpeg_arith.py.

Pure functions over bytes (codecs.py contract) — worker-safe, no Spark
imports.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

# ---------------------------------------------------------------------------
# bit I/O + exp-Golomb (spec 9.1)


class BitWriter:
    def __init__(self) -> None:
        self._bits: list[int] = []

    def u(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self._bits.append((val >> i) & 1)

    def ue(self, val: int) -> None:
        code = val + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, val: int) -> None:
        self.ue(2 * val - 1 if val > 0 else -2 * val)

    def bits(self, s: str) -> None:
        for ch in s:
            self._bits.append(1 if ch == "1" else 0)

    def rbsp_trailing(self) -> None:
        self._bits.append(1)
        while len(self._bits) % 8:
            self._bits.append(0)

    def tobytes(self) -> bytes:
        assert len(self._bits) % 8 == 0, "call rbsp_trailing() first"
        out = bytearray()
        for i in range(0, len(self._bits), 8):
            b = 0
            for bit in self._bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


class BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def peek(self, n: int) -> int:
        save = self.pos
        try:
            return self.u(n)
        finally:
            self.pos = save

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("bad exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def rbsp_to_ebsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes (spec 7.4.1.1): any 00 00 0x
    (x<=3) sequence gets 03 stuffed after the two zeros."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def ebsp_to_rbsp(ebsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    n = len(ebsp)
    while i < n:
        b = ebsp[i]
        if zeros >= 2 and b == 3 and i + 1 < n and ebsp[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def nal(nal_type: int, rbsp: bytes, ref_idc: int = 3) -> bytes:
    """One NAL unit (header byte + emulation-prevented payload)."""
    return bytes([(ref_idc << 5) | nal_type]) + rbsp_to_ebsp(rbsp)


# ---------------------------------------------------------------------------
# CAVLC tables (spec tables 9-5, 9-7, 9-8, 9-9(a), 9-10) — bitstring form.
# Keys: (TotalCoeff, TrailingOnes) -> codeword. Transcribed clean-room;
# prefix-freeness + completeness are pinned by tests/test_h264.py.

COEFF_TOKEN_NC0 = {  # 0 <= nC < 2
    (0, 0): "1",
    (1, 0): "000101", (1, 1): "01",
    (2, 0): "00000111", (2, 1): "000100", (2, 2): "001",
    (3, 0): "000000111", (3, 1): "00000110", (3, 2): "0000101",
    (3, 3): "00011",
    (4, 0): "0000000111", (4, 1): "000000110", (4, 2): "00000101",
    (4, 3): "000011",
    (5, 0): "00000000111", (5, 1): "0000000110", (5, 2): "000000101",
    (5, 3): "0000100",
    (6, 0): "0000000001111", (6, 1): "00000000110", (6, 2): "0000000101",
    (6, 3): "00000100",
    (7, 0): "0000000001011", (7, 1): "0000000001110", (7, 2): "00000000101",
    (7, 3): "000000100",
    (8, 0): "0000000001000", (8, 1): "0000000001010",
    (8, 2): "0000000001101", (8, 3): "0000000100",
    (9, 0): "00000000001111", (9, 1): "00000000001110",
    (9, 2): "0000000001001", (9, 3): "00000000100",
    (10, 0): "00000000001011", (10, 1): "00000000001010",
    (10, 2): "00000000001101", (10, 3): "0000000001100",
    (11, 0): "000000000001111", (11, 1): "000000000001110",
    (11, 2): "00000000001001", (11, 3): "00000000001100",
    (12, 0): "000000000001011", (12, 1): "000000000001010",
    (12, 2): "000000000001101", (12, 3): "00000000001000",
    (13, 0): "0000000000001111", (13, 1): "000000000000001",
    (13, 2): "000000000001001", (13, 3): "000000000001100",
    (14, 0): "0000000000001011", (14, 1): "0000000000001110",
    (14, 2): "0000000000001101", (14, 3): "000000000001000",
    (15, 0): "0000000000000111", (15, 1): "0000000000001010",
    (15, 2): "0000000000001001", (15, 3): "0000000000001100",
    (16, 0): "0000000000000100", (16, 1): "0000000000000110",
    (16, 2): "0000000000000101", (16, 3): "0000000000001000",
}

COEFF_TOKEN_NC2 = {  # 2 <= nC < 4
    (0, 0): "11",
    (1, 0): "001011", (1, 1): "10",
    (2, 0): "000111", (2, 1): "00111", (2, 2): "011",
    (3, 0): "0000111", (3, 1): "001010", (3, 2): "001001", (3, 3): "0101",
    (4, 0): "00000111", (4, 1): "000110", (4, 2): "000101", (4, 3): "0100",
    (5, 0): "00000100", (5, 1): "0000110", (5, 2): "0000101", (5, 3): "00110",
    (6, 0): "000000111", (6, 1): "00000110", (6, 2): "00000101",
    (6, 3): "001000",
    (7, 0): "00000001111", (7, 1): "000000110", (7, 2): "000000101",
    (7, 3): "000100",
    (8, 0): "00000001011", (8, 1): "00000001110", (8, 2): "00000001101",
    (8, 3): "0000100",
    (9, 0): "000000001111", (9, 1): "00000001010", (9, 2): "00000001001",
    (9, 3): "000000100",
    (10, 0): "000000001011", (10, 1): "000000001110",
    (10, 2): "000000001101", (10, 3): "00000001100",
    (11, 0): "000000001000", (11, 1): "000000001010",
    (11, 2): "000000001001", (11, 3): "00000001000",
    (12, 0): "0000000001111", (12, 1): "0000000001110",
    (12, 2): "0000000001101", (12, 3): "000000001100",
    (13, 0): "0000000001011", (13, 1): "0000000001010",
    (13, 2): "0000000001001", (13, 3): "0000000001100",
    (14, 0): "0000000000111", (14, 1): "00000000001011",
    (14, 2): "0000000000110", (14, 3): "0000000001000",
    (15, 0): "00000000001001", (15, 1): "00000000001000",
    (15, 2): "00000000001010", (15, 3): "0000000000001",
    (16, 0): "00000000000111", (16, 1): "00000000000110",
    (16, 2): "00000000000101", (16, 3): "00000000000100",
}

COEFF_TOKEN_NC4 = {  # 4 <= nC < 8
    (0, 0): "1111",
    (1, 0): "001111", (1, 1): "1110",
    (2, 0): "001011", (2, 1): "01111", (2, 2): "1101",
    (3, 0): "001000", (3, 1): "01100", (3, 2): "01110", (3, 3): "1100",
    (4, 0): "0001111", (4, 1): "01010", (4, 2): "01011", (4, 3): "1011",
    (5, 0): "0001011", (5, 1): "01000", (5, 2): "01001", (5, 3): "1010",
    (6, 0): "0001001", (6, 1): "001110", (6, 2): "001101", (6, 3): "1001",
    (7, 0): "0001000", (7, 1): "001010", (7, 2): "001001", (7, 3): "1000",
    (8, 0): "00001111", (8, 1): "0001110", (8, 2): "0001101", (8, 3): "01101",
    (9, 0): "00001011", (9, 1): "00001110", (9, 2): "0001010",
    (9, 3): "001100",
    (10, 0): "000001111", (10, 1): "00001010", (10, 2): "00001101",
    (10, 3): "0001100",
    (11, 0): "000001011", (11, 1): "000001110", (11, 2): "00001001",
    (11, 3): "00001100",
    (12, 0): "000001000", (12, 1): "000001010", (12, 2): "000001101",
    (12, 3): "00001000",
    (13, 0): "0000001101", (13, 1): "000000111", (13, 2): "000001001",
    (13, 3): "000001100",
    (14, 0): "0000001001", (14, 1): "0000001100", (14, 2): "0000001011",
    (14, 3): "0000001010",
    (15, 0): "0000000101", (15, 1): "0000001000", (15, 2): "0000000111",
    (15, 3): "0000000110",
    (16, 0): "0000000001", (16, 1): "0000000100", (16, 2): "0000000011",
    (16, 3): "0000000010",
}

COEFF_TOKEN_CHROMA_DC = {  # nC == -1 (4:2:0)
    (0, 0): "01",
    (1, 0): "000111", (1, 1): "1",
    (2, 0): "000100", (2, 1): "000110", (2, 2): "001",
    (3, 0): "000011", (3, 1): "0000011", (3, 2): "0000010", (3, 3): "000101",
    (4, 0): "000010", (4, 1): "00000011", (4, 2): "00000010",
    (4, 3): "0000000",
}

# total_zeros for 4x4 blocks (tables 9-7/9-8): TOTAL_ZEROS[tc][tz]
TOTAL_ZEROS_4x4 = {
    1: ["1", "011", "010", "0011", "0010", "00011", "00010", "000011",
        "000010", "0000011", "0000010", "00000011", "00000010",
        "000000011", "000000010", "000000001"],
    2: ["111", "110", "101", "100", "011", "0101", "0100", "0011", "0010",
        "00011", "00010", "000011", "000010", "000001", "000000"],
    3: ["0101", "111", "110", "101", "0100", "0011", "100", "011", "0010",
        "00011", "00010", "000001", "00001", "000000"],
    4: ["00011", "111", "0101", "0100", "110", "101", "100", "0011", "011",
        "0010", "00010", "00001", "00000"],
    5: ["0101", "0100", "0011", "111", "110", "101", "100", "011", "0010",
        "00001", "0001", "00000"],
    6: ["000001", "00001", "111", "110", "101", "100", "011", "010",
        "0001", "001", "000000"],
    7: ["000001", "00001", "101", "100", "011", "11", "010", "0001", "001",
        "000000"],
    8: ["000001", "0001", "00001", "011", "11", "10", "010", "001",
        "000000"],
    9: ["000001", "000000", "0001", "11", "10", "001", "01", "00001"],
    10: ["00001", "00000", "001", "11", "10", "01", "0001"],
    11: ["0000", "0001", "001", "010", "1", "011"],
    12: ["0000", "0001", "01", "1", "001"],
    13: ["000", "001", "1", "01"],
    14: ["00", "01", "1"],
    15: ["0", "1"],
}

# total_zeros for chroma DC 2x2 (table 9-9(a), 4:2:0)
TOTAL_ZEROS_CHROMA_DC = {
    1: ["1", "01", "001", "000"],
    2: ["1", "01", "00"],
    3: ["1", "0"],
}

# run_before (table 9-10): RUN_BEFORE[min(zerosLeft,7)][run] — runs >= 7
# (zerosLeft > 6 only) continue unary: "000" + (run-7 zeros) + "1"... see
# _read_run_before / _write_run_before.
RUN_BEFORE = {
    1: ["1", "0"],
    2: ["1", "01", "00"],
    3: ["11", "10", "01", "00"],
    4: ["11", "10", "01", "001", "000"],
    5: ["11", "10", "011", "010", "001", "000"],
    6: ["11", "000", "001", "011", "010", "101", "100"],
    7: ["111", "110", "101", "100", "011", "010", "001"],
}


def _decode_table(table: dict | list) -> dict[str, object]:
    """codeword -> value lookup; dict tables map code -> (tc, t1), list
    tables map code -> index."""
    if isinstance(table, dict):
        return {code: key for key, code in table.items()}
    return {code: i for i, code in enumerate(table)}


_REV = {}


def _rev(table_id: str, table) -> dict:
    if table_id not in _REV:
        _REV[table_id] = _decode_table(table)
    return _REV[table_id]


def _read_vlc(r: BitReader, rev: dict, what: str):
    code = ""
    for _ in range(20):
        code += str(r.u(1))
        if code in rev:
            return rev[code]
    raise ValueError(f"bad {what} VLC code {code!r}")


def _coeff_token_table(nc: int):
    if nc == -1:
        return "cdc", COEFF_TOKEN_CHROMA_DC
    if nc < 2:
        return "nc0", COEFF_TOKEN_NC0
    if nc < 4:
        return "nc2", COEFF_TOKEN_NC2
    if nc < 8:
        return "nc4", COEFF_TOKEN_NC4
    return "flc", None


# ---------------------------------------------------------------------------
# CAVLC residual block codec (spec 9.2). Coefficients are in scan order
# (zig-zag), length = maxNumCoeff (16 DC / 15 AC / 4 chroma DC).

ZIGZAG_4x4 = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3),
]


def write_residual_block(w: BitWriter, coeffs: list[int], nc: int) -> int:
    """Encode one scan-ordered coefficient list; returns TotalCoeff (the
    caller stores it for nC context derivation)."""
    max_coeff = len(coeffs)
    nz = [(i, c) for i, c in enumerate(coeffs) if c]
    total = len(nz)
    # trailing ones: up to three |1| values at the end of the nz list
    t1 = 0
    while t1 < min(3, total) and abs(nz[total - 1 - t1][1]) == 1:
        t1 += 1
    tid, table = _coeff_token_table(nc)
    if table is None:  # nC >= 8: 6-bit FLC
        w.u(3 if total == 0 else ((total - 1) << 2) | t1, 6)
    else:
        w.bits(table[(total, t1)])
    if total == 0:
        return 0
    # trailing-one signs, high frequency first
    for k in range(t1):
        w.u(1 if nz[total - 1 - k][1] < 0 else 0, 1)
    # remaining levels, high frequency first (spec 9.2.2)
    suffix_len = 1 if total > 10 and t1 < 3 else 0
    first = True
    for k in range(total - 1 - t1, -1, -1):
        level = nz[k][1]  # actual level: suffixLength adapts on THIS
        sent = level
        if first and t1 < 3:
            # the decoder adds 2 to the first levelCode (a first
            # non-trailing level can never be +-1 when t1 < 3)
            sent = level - 1 if level > 0 else level + 1
        code = 2 * sent - 2 if sent > 0 else -2 * sent - 1
        first = False
        if suffix_len == 0:
            if code < 14:
                w.u(0, code)
                w.u(1, 1)
            elif code < 30:
                w.u(0, 14)
                w.u(1, 1)
                w.u(code - 14, 4)
            else:
                esc = code - 30
                size = 12
                prefix = 15
                while esc >= (1 << size):
                    esc -= 1 << size
                    size += 1
                    prefix += 1
                w.u(0, prefix)
                w.u(1, 1)
                w.u(esc, size)
        else:
            if (code >> suffix_len) < 15:
                w.u(0, code >> suffix_len)
                w.u(1, 1)
                w.u(code & ((1 << suffix_len) - 1), suffix_len)
            else:
                esc = code - (15 << suffix_len)
                size = 12
                prefix = 15
                while esc >= (1 << size):
                    esc -= 1 << size
                    size += 1
                    prefix += 1
                w.u(0, prefix)
                w.u(1, 1)
                w.u(esc, size)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros
    last_idx = nz[-1][0]
    total_zeros = last_idx + 1 - total
    if total < max_coeff:
        if nc == -1:
            w.bits(TOTAL_ZEROS_CHROMA_DC[total][total_zeros])
        else:
            w.bits(TOTAL_ZEROS_4x4[total][total_zeros])
    # run_before, high frequency first; last coefficient's run implied
    zeros_left = total_zeros
    for k in range(total - 1, 0, -1):
        if zeros_left <= 0:
            break
        run = nz[k][0] - nz[k - 1][0] - 1
        _write_run_before(w, run, zeros_left)
        zeros_left -= run
    return total


def _write_run_before(w: BitWriter, run: int, zeros_left: int) -> None:
    zl = min(zeros_left, 7)
    if zl < 7 or run < 7:
        w.bits(RUN_BEFORE[zl][run])
    else:
        w.u(0, run - 4)  # "000" already covers run 6... unary extension:
        w.u(1, 1)


def _read_run_before(r: BitReader, zeros_left: int) -> int:
    zl = min(zeros_left, 7)
    if zl < 7:
        return _read_vlc(r, _rev(f"rb{zl}", RUN_BEFORE[zl]), "run_before")
    # zerosLeft > 6: 3-bit codes for run 0..6, then unary for 7..14
    code = ""
    for _ in range(3):
        code += str(r.u(1))
    if code in _rev("rb7", RUN_BEFORE[7]):
        return _rev("rb7", RUN_BEFORE[7])[code]
    if code != "000":
        raise ValueError(f"bad run_before code {code!r}")
    run = 7
    while r.u(1) == 0:
        run += 1
        if run > 14:
            raise ValueError("bad run_before escape")
    return run


def read_residual_block(
    r: BitReader, max_coeff: int, nc: int
) -> tuple[list[int], int]:
    """Decode one residual block; returns (scan-ordered coeffs, TotalCoeff)."""
    tid, table = _coeff_token_table(nc)
    if table is None:
        v = r.u(6)
        total, t1 = (0, 0) if v == 3 else ((v >> 2) + 1, v & 3)
    else:
        total, t1 = _read_vlc(r, _rev(tid, table), "coeff_token")
    coeffs = [0] * max_coeff
    if total == 0:
        return coeffs, 0
    levels = []
    for _ in range(t1):
        levels.append(-1 if r.u(1) else 1)
    suffix_len = 1 if total > 10 and t1 < 3 else 0
    for i in range(total - t1):
        prefix = 0
        while r.u(1) == 0:
            prefix += 1
            if prefix > 32:
                raise ValueError("bad level_prefix")
        if suffix_len == 0:
            size = 4 if prefix == 14 else (prefix - 3 if prefix >= 15 else 0)
        else:
            size = prefix - 3 if prefix >= 15 else suffix_len
        code = min(15, prefix) << suffix_len
        if size:
            code += r.u(size)
        if prefix >= 15 and suffix_len == 0:
            code += 15
        if prefix >= 16:
            code += (1 << (prefix - 3)) - 4096
        if i == 0 and t1 < 3:
            code += 2
        level = (code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1)
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # levels[] is high-frequency-first; positions via total_zeros + runs
    if total < max_coeff:
        if nc == -1:
            tz = _read_vlc(
                r, _rev(f"tzc{total}", TOTAL_ZEROS_CHROMA_DC[total]),
                "total_zeros",
            )
        else:
            tz = _read_vlc(
                r, _rev(f"tz{total}", TOTAL_ZEROS_4x4[total]), "total_zeros"
            )
    else:
        tz = 0
    zeros_left = tz
    pos = total - 1 + tz  # index of the highest-frequency coefficient
    for k, level in enumerate(levels):
        if pos < 0 or pos >= max_coeff:
            raise ValueError("residual position out of range")
        coeffs[pos] = level
        if k == total - 1:
            break
        run = (
            _read_run_before(r, zeros_left) if zeros_left > 0 else 0
        )
        zeros_left -= run
        pos -= 1 + run
    return coeffs, total


# ---------------------------------------------------------------------------
# transforms + quantization (spec 8.5)

_V_TABLE = [  # dequant weights (v0, v1, v2) per qp%6
    (10, 16, 13), (11, 18, 14), (13, 20, 16),
    (14, 23, 18), (16, 25, 20), (18, 29, 23),
]
_M_TABLE = [  # forward quant multipliers per qp%6
    (13107, 5243, 8066), (11916, 4660, 7490), (10082, 4194, 6554),
    (9362, 3647, 5825), (8192, 3355, 5243), (7282, 2893, 4559),
]


def _pos_class(i: int, j: int) -> int:
    if (i % 2 == 0) and (j % 2 == 0):
        return 0
    if (i % 2 == 1) and (j % 2 == 1):
        return 1
    return 2


def forward4x4(block: list[list[int]]) -> list[list[int]]:
    """Core 4x4 forward transform (integer, spec-equivalent)."""
    tmp = [[0] * 4 for _ in range(4)]
    for i in range(4):
        a = [block[i][j] for j in range(4)]
        s0, s1 = a[0] + a[3], a[1] + a[2]
        d0, d1 = a[0] - a[3], a[1] - a[2]
        tmp[i][0] = s0 + s1
        tmp[i][2] = s0 - s1
        tmp[i][1] = 2 * d0 + d1
        tmp[i][3] = d0 - 2 * d1
    out = [[0] * 4 for _ in range(4)]
    for j in range(4):
        a = [tmp[i][j] for i in range(4)]
        s0, s1 = a[0] + a[3], a[1] + a[2]
        d0, d1 = a[0] - a[3], a[1] - a[2]
        out[0][j] = s0 + s1
        out[2][j] = s0 - s1
        out[1][j] = 2 * d0 + d1
        out[3][j] = d0 - 2 * d1
    return out


def inverse4x4(block: list[list[int]]) -> list[list[int]]:
    """Core 4x4 inverse transform including the final (x+32)>>6."""
    tmp = [[0] * 4 for _ in range(4)]
    for i in range(4):
        a = [block[i][j] for j in range(4)]
        e0 = a[0] + a[2]
        e1 = a[0] - a[2]
        e2 = (a[1] >> 1) - a[3]
        e3 = a[1] + (a[3] >> 1)
        tmp[i][0] = e0 + e3
        tmp[i][1] = e1 + e2
        tmp[i][2] = e1 - e2
        tmp[i][3] = e0 - e3
    out = [[0] * 4 for _ in range(4)]
    for j in range(4):
        a = [tmp[i][j] for i in range(4)]
        e0 = a[0] + a[2]
        e1 = a[0] - a[2]
        e2 = (a[1] >> 1) - a[3]
        e3 = a[1] + (a[3] >> 1)
        out[0][j] = (e0 + e3 + 32) >> 6
        out[1][j] = (e1 + e2 + 32) >> 6
        out[2][j] = (e1 - e2 + 32) >> 6
        out[3][j] = (e0 - e3 + 32) >> 6
    return out


def hadamard4x4(block: list[list[int]], forward: bool) -> list[list[int]]:
    tmp = [[0] * 4 for _ in range(4)]
    for i in range(4):
        a = [block[i][j] for j in range(4)]
        s0, s1 = a[0] + a[3], a[1] + a[2]
        d0, d1 = a[0] - a[3], a[1] - a[2]
        tmp[i][0] = s0 + s1
        tmp[i][2] = s0 - s1
        tmp[i][1] = d0 + d1
        tmp[i][3] = d0 - d1
    out = [[0] * 4 for _ in range(4)]
    for j in range(4):
        a = [tmp[i][j] for i in range(4)]
        s0, s1 = a[0] + a[3], a[1] + a[2]
        d0, d1 = a[0] - a[3], a[1] - a[2]
        out[0][j] = s0 + s1
        out[2][j] = s0 - s1
        out[1][j] = d0 + d1
        out[3][j] = d0 - d1
    if forward:
        for i in range(4):
            for j in range(4):
                out[i][j] = out[i][j] // 2 if out[i][j] >= 0 else -((-out[i][j]) // 2)
    return out


def quant4x4(coef: list[list[int]], qp: int, skip_dc: bool) -> list[list[int]]:
    mf = _M_TABLE[qp % 6]
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3  # intra rounding offset
    out = [[0] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(4):
            if skip_dc and i == 0 and j == 0:
                continue
            c = coef[i][j]
            m = mf[_pos_class(i, j)]
            v = (abs(c) * m + f) >> qbits
            out[i][j] = v if c >= 0 else -v
    return out


def dequant4x4(levels: list[list[int]], qp: int, skip_dc: bool) -> list[list[int]]:
    v = _V_TABLE[qp % 6]
    shift = qp // 6
    out = [[0] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(4):
            if skip_dc and i == 0 and j == 0:
                continue
            c = levels[i][j]
            w = v[_pos_class(i, j)]
            if shift >= 4:
                out[i][j] = (c * w) << (shift - 4)
            else:
                out[i][j] = (c * w + (1 << (3 - shift))) >> (4 - shift)
    return out


def quant_luma_dc(dc: list[list[int]], qp: int) -> list[list[int]]:
    mf = _M_TABLE[qp % 6][0]
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3
    out = [[0] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(4):
            c = dc[i][j]
            v = (abs(c) * mf + 2 * f) >> (qbits + 1)
            out[i][j] = v if c >= 0 else -v
    return out


def scale_luma_dc(f4x4: list[list[int]], qp: int) -> list[list[int]]:
    """Spec 8.5.10: applied AFTER the inverse 4x4 Hadamard."""
    w = _V_TABLE[qp % 6][0]
    shift = qp // 6
    out = [[0] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(4):
            f = f4x4[i][j]
            if qp >= 36:
                out[i][j] = (f * w) << (shift - 6)
            else:
                out[i][j] = (f * w + (1 << (5 - shift))) >> (6 - shift)
    return out


def quant_chroma_dc(dc: list[list[int]], qp: int) -> list[list[int]]:
    mf = _M_TABLE[qp % 6][0]
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3
    out = [[0] * 2 for _ in range(2)]
    for i in range(2):
        for j in range(2):
            c = dc[i][j]
            v = (abs(c) * mf + 2 * f) >> (qbits + 1)
            out[i][j] = v if c >= 0 else -v
    return out


def scale_chroma_dc(f2x2: list[list[int]], qp: int) -> list[list[int]]:
    """Spec 8.5.11 (4:2:0): applied AFTER the inverse 2x2 Hadamard."""
    w = _V_TABLE[qp % 6][0]
    shift = qp // 6
    return [
        [((f2x2[i][j] * w) << shift) >> 5 for j in range(2)]
        for i in range(2)
    ]


def hadamard2x2(block: list[list[int]]) -> list[list[int]]:
    a, b = block[0]
    c, d = block[1]
    return [[a + b + c + d, a - b + c - d], [a + b - c - d, a - b - c + d]]


# chroma QP mapping (table 8-15, chroma_qp_index_offset = 0)
_CHROMA_QP = {
    30: 29, 31: 30, 32: 31, 33: 32, 34: 32, 35: 33, 36: 34, 37: 34,
    38: 35, 39: 35, 40: 36, 41: 36, 42: 37, 43: 37, 44: 37, 45: 38,
    46: 38, 47: 38, 48: 39, 49: 39, 50: 39, 51: 39,
}


def chroma_qp(qp: int) -> int:
    return _CHROMA_QP.get(qp, qp if qp < 30 else 39)


# ---------------------------------------------------------------------------
# intra prediction (spec 8.3.3 / 8.3.4)


def pred16x16(mode: int, left, top, topleft) -> list[list[int]]:
    """16x16 luma prediction from reconstructed neighbors. ``left``/``top``
    are length-16 lists or None; ``topleft`` a sample or None."""
    if mode == 2 or (mode in (0, 1, 3) and (
        (mode == 0 and top is None)
        or (mode == 1 and left is None)
        or (mode == 3 and (top is None or left is None or topleft is None))
    )):
        mode = 2  # unavailable-neighbor fallbacks only legal for DC
    if mode == 0:  # vertical
        return [list(top) for _ in range(16)]
    if mode == 1:  # horizontal
        return [[left[y]] * 16 for y in range(16)]
    if mode == 3:  # plane
        h = sum(
            (x + 1) * (top[8 + x] - (top[6 - x] if 6 - x >= 0 else topleft))
            for x in range(8)
        )
        v = sum(
            (y + 1) * (left[8 + y] - (left[6 - y] if 6 - y >= 0 else topleft))
            for y in range(8)
        )
        a = 16 * (left[15] + top[15])
        b = (5 * h + 32) >> 6
        c = (5 * v + 32) >> 6
        return [
            [max(0, min(255, (a + b * (x - 7) + c * (y - 7) + 16) >> 5))
             for x in range(16)]
            for y in range(16)
        ]
    # DC
    if top is not None and left is not None:
        dc = (sum(top) + sum(left) + 16) >> 5
    elif top is not None:
        dc = (sum(top) + 8) >> 4
    elif left is not None:
        dc = (sum(left) + 8) >> 4
    else:
        dc = 128
    return [[dc] * 16 for _ in range(16)]


def pred_chroma8x8(mode: int, left, top, topleft) -> list[list[int]]:
    """8x8 chroma prediction (mode 0=DC, 1=H, 2=V, 3=plane)."""
    if mode == 1 and left is None:
        mode = 0
    if mode == 2 and top is None:
        mode = 0
    if mode == 3 and (top is None or left is None or topleft is None):
        mode = 0
    if mode == 1:
        return [[left[y]] * 8 for y in range(8)]
    if mode == 2:
        return [list(top) for _ in range(8)]
    if mode == 3:
        h = sum(
            (x + 1) * (top[4 + x] - (top[2 - x] if 2 - x >= 0 else topleft))
            for x in range(4)
        )
        v = sum(
            (y + 1) * (left[4 + y] - (left[2 - y] if 2 - y >= 0 else topleft))
            for y in range(4)
        )
        a = 16 * (left[7] + top[7])
        b = (17 * h + 16) >> 5
        c = (17 * v + 16) >> 5
        return [
            [max(0, min(255, (a + b * (x - 3) + c * (y - 3) + 16) >> 5))
             for x in range(8)]
            for y in range(8)
        ]
    # DC: per-4x4 sub-block neighbor rules (8.3.4.1)
    out = [[0] * 8 for _ in range(8)]

    def seg(vals, base):
        return sum(vals[base : base + 4])

    for by in (0, 4):
        for bx in (0, 4):
            t_ok = top is not None
            l_ok = left is not None
            if (bx, by) in ((0, 0), (4, 4)):
                if t_ok and l_ok:
                    dc = (seg(top, bx) + seg(left, by) + 4) >> 3
                elif t_ok:
                    dc = (seg(top, bx) + 2) >> 2
                elif l_ok:
                    dc = (seg(left, by) + 2) >> 2
                else:
                    dc = 128
            elif (bx, by) == (4, 0):
                if t_ok:
                    dc = (seg(top, bx) + 2) >> 2
                elif l_ok:
                    dc = (seg(left, by) + 2) >> 2
                else:
                    dc = 128
            else:  # (0, 4)
                if l_ok:
                    dc = (seg(left, by) + 2) >> 2
                elif t_ok:
                    dc = (seg(top, bx) + 2) >> 2
                else:
                    dc = 128
            for y in range(4):
                for x in range(4):
                    out[by + y][bx + x] = dc
    return out


def _clip(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


# Table 9-4, intra column: coded_block_pattern codeNum -> cbp value for
# I_4x4 macroblocks ("me" mapped exp-Golomb). A permutation of 0..47 —
# structurally pinned in tests/test_h264.py.
CBP_INTRA_ME = [
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41,
]
CBP_INTRA_INV = {v: i for i, v in enumerate(CBP_INTRA_ME)}


def pred4x4(
    mode: int, top, topright, left, topleft
) -> list[list[int]]:
    """One Intra_4x4 prediction (spec 8.3.1.2.1-9). ``top`` = p[0..3,-1]
    or None, ``topright`` = p[4..7,-1] or None (the CALLER substitutes
    p[3,-1]x4 when top exists but top-right doesn't — 8.3.1.2.2),
    ``left`` = p[-1,0..3] or None, ``topleft`` = p[-1,-1] or None. The
    caller must only request modes whose inputs are available (the
    encoder picks accordingly; a non-conforming stream fails loudly)."""
    if mode == 2:  # DC with fallbacks
        if top is not None and left is not None:
            dc = (sum(top) + sum(left) + 4) >> 3
        elif top is not None:
            dc = (sum(top) + 2) >> 2
        elif left is not None:
            dc = (sum(left) + 2) >> 2
        else:
            dc = 128
        return [[dc] * 4 for _ in range(4)]

    def need(*conds):
        if any(c is None for c in conds):
            raise ValueError(f"intra4x4 mode {mode} needs unavailable samples")

    out = [[0] * 4 for _ in range(4)]
    if mode == 0:  # vertical
        need(top)
        return [list(top) for _ in range(4)]
    if mode == 1:  # horizontal
        need(left)
        return [[left[y]] * 4 for y in range(4)]
    if mode == 3:  # diagonal down-left
        need(top, topright)
        t = list(top) + list(topright)
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    out[y][x] = (t[6] + 3 * t[7] + 2) >> 2
                else:
                    out[y][x] = (
                        t[x + y] + 2 * t[x + y + 1] + t[x + y + 2] + 2
                    ) >> 2
        return out
    if mode == 4:  # diagonal down-right
        need(top, left, topleft)
        for y in range(4):
            for x in range(4):
                if x > y:
                    out[y][x] = (
                        (topleft if x - y - 2 < 0 else top[x - y - 2])
                        + 2 * (topleft if x - y - 1 < 0 else top[x - y - 1])
                        + top[x - y] + 2
                    ) >> 2
                elif x < y:
                    out[y][x] = (
                        (topleft if y - x - 2 < 0 else left[y - x - 2])
                        + 2 * (topleft if y - x - 1 < 0 else left[y - x - 1])
                        + left[y - x] + 2
                    ) >> 2
                else:
                    out[y][x] = (top[0] + 2 * topleft + left[0] + 2) >> 2
        return out
    if mode == 5:  # vertical-right
        need(top, left, topleft)

        def pt(i):  # p[i, -1] with i == -1 -> topleft
            return topleft if i < 0 else top[i]

        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    out[y][x] = (
                        pt(x - (y >> 1) - 1) + pt(x - (y >> 1)) + 1
                    ) >> 1
                elif z >= 0:
                    out[y][x] = (
                        pt(x - (y >> 1) - 2) + 2 * pt(x - (y >> 1) - 1)
                        + pt(x - (y >> 1)) + 2
                    ) >> 2
                elif z == -1:
                    out[y][x] = (left[0] + 2 * topleft + top[0] + 2) >> 2
                else:
                    out[y][x] = (
                        left[y - 1] + 2 * left[y - 2]
                        + (topleft if y - 3 < 0 else left[y - 3]) + 2
                    ) >> 2
        return out
    if mode == 6:  # horizontal-down
        need(top, left, topleft)

        def pl(i):  # p[-1, i] with i == -1 -> topleft
            return topleft if i < 0 else left[i]

        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    out[y][x] = (
                        pl(y - (x >> 1) - 1) + pl(y - (x >> 1)) + 1
                    ) >> 1
                elif z >= 0:
                    out[y][x] = (
                        pl(y - (x >> 1) - 2) + 2 * pl(y - (x >> 1) - 1)
                        + pl(y - (x >> 1)) + 2
                    ) >> 2
                elif z == -1:
                    out[y][x] = (left[0] + 2 * topleft + top[0] + 2) >> 2
                else:
                    out[y][x] = (
                        top[x - 1] + 2 * top[x - 2]
                        + (topleft if x - 3 < 0 else top[x - 3]) + 2
                    ) >> 2
        return out
    if mode == 7:  # vertical-left
        need(top, topright)
        t = list(top) + list(topright)
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y % 2 == 0:
                    out[y][x] = (t[i] + t[i + 1] + 1) >> 1
                else:
                    out[y][x] = (t[i] + 2 * t[i + 1] + t[i + 2] + 2) >> 2
        return out
    if mode == 8:  # horizontal-up
        need(left)
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z in (0, 2, 4):
                    i = y + (x >> 1)
                    out[y][x] = (left[i] + left[i + 1] + 1) >> 1
                elif z in (1, 3):
                    i = y + (x >> 1)
                    out[y][x] = (
                        left[i] + 2 * left[i + 1] + left[i + 2] + 2
                    ) >> 2
                elif z == 5:
                    out[y][x] = (left[2] + 3 * left[3] + 2) >> 2
                else:
                    out[y][x] = left[3]
        return out
    raise ValueError(f"invalid intra4x4 prediction mode {mode}")


# luma4x4BlkIdx -> (x4, y4) within the MB (spec 6.4.3 scan)
def blk_xy(blk: int) -> tuple[int, int]:
    quad, sub = blk >> 2, blk & 3
    return ((quad & 1) * 2 + (sub & 1), (quad >> 1) * 2 + (sub >> 1))


_BLK_ORDER = {blk_xy(b): b for b in range(16)}


@dataclass
class Sps:
    width: int
    height: int
    log2_max_frame_num: int = 4
    # pic_order_cnt_type (7.4.2.1.1): 2 = output order IS decode order
    # (IDR/P-only streams); 0 = explicit pic_order_cnt_lsb in every
    # slice header — required once B pictures reorder output (round 13)
    poc_type: int = 2
    log2_max_poc_lsb: int = 8


def write_sps(
    width: int, height: int, num_ref_frames: int = 0, poc_type: int = 2
) -> bytes:
    if width % 16 or height % 16:
        raise NotImplementedError(
            "this writer emits uncropped streams: dimensions must be "
            "multiples of 16"
        )
    if poc_type not in (0, 2):
        raise NotImplementedError("pic_order_cnt_type 1 unsupported")
    w = BitWriter()
    # B slices are a Main-profile tool; IDR/P-only streams stay baseline
    w.u(77 if poc_type == 0 else 66, 8)  # profile_idc
    w.u(0, 8)      # constraint flags + reserved
    w.u(20, 8)     # level_idc 2.0
    w.ue(0)        # sps id
    w.ue(0)        # log2_max_frame_num_minus4
    w.ue(poc_type)  # pic_order_cnt_type
    if poc_type == 0:
        w.ue(4)    # log2_max_pic_order_cnt_lsb_minus4 (lsb = 8 bits)
    w.ue(num_ref_frames)  # max_num_ref_frames (anchor count for GOPs)
    w.u(0, 1)      # gaps_in_frame_num_value_allowed
    w.ue(width // 16 - 1)
    w.ue(height // 16 - 1)
    w.u(1, 1)      # frame_mbs_only
    w.u(0, 1)      # direct_8x8_inference
    w.u(0, 1)      # frame_cropping
    w.u(0, 1)      # vui_parameters_present
    w.rbsp_trailing()
    return w.tobytes()


def parse_sps(rbsp: bytes) -> Sps:
    r = BitReader(rbsp)
    profile = r.u(8)
    r.u(8)
    r.u(8)
    r.ue()  # sps id
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        raise NotImplementedError(
            f"high-profile SPS (profile_idc {profile}) is outside the "
            "baseline intra subset"
        )
    log2_mfn = r.ue() + 4
    poc_type = r.ue()
    log2_poc = 8
    if poc_type == 0:
        log2_poc = r.ue() + 4
    elif poc_type == 1:
        raise NotImplementedError("pic_order_cnt_type 1 unsupported")
    r.ue()  # max_num_ref_frames
    r.u(1)
    w_mbs = r.ue() + 1
    h_mbs = r.ue() + 1
    if r.u(1) != 1:
        raise NotImplementedError("interlaced (frame_mbs_only=0) unsupported")
    r.u(1)
    if r.u(1):  # frame_cropping
        raise NotImplementedError("cropped streams unsupported")
    return Sps(
        width=w_mbs * 16, height=h_mbs * 16, log2_max_frame_num=log2_mfn,
        poc_type=poc_type, log2_max_poc_lsb=log2_poc,
    )


def write_pps(qp: int) -> bytes:
    w = BitWriter()
    w.ue(0)        # pps id
    w.ue(0)        # sps id
    w.u(0, 1)      # entropy_coding_mode: CAVLC
    w.u(0, 1)      # bottom_field_pic_order_in_frame_present
    w.ue(0)        # num_slice_groups_minus1
    w.ue(0)        # num_ref_idx_l0_default_active_minus1
    w.ue(0)        # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)      # weighted_pred
    w.u(0, 2)      # weighted_bipred_idc
    w.se(qp - 26)  # pic_init_qp_minus26
    w.se(0)        # pic_init_qs_minus26
    w.se(0)        # chroma_qp_index_offset
    w.u(1, 1)      # deblocking_filter_control_present
    w.u(0, 1)      # constrained_intra_pred
    w.u(0, 1)      # redundant_pic_cnt_present
    w.rbsp_trailing()
    return w.tobytes()


def parse_pps(rbsp: bytes) -> dict:
    r = BitReader(rbsp)
    r.ue()
    r.ue()
    if r.u(1):
        raise NotImplementedError("CABAC entropy coding unsupported (CAVLC only)")
    r.u(1)
    if r.ue() != 0:
        raise NotImplementedError("slice groups (FMO) unsupported")
    r.ue()
    r.ue()
    r.u(1)
    r.u(2)
    qp = 26 + r.se()
    r.se()
    cqo = r.se()
    dbc = r.u(1)
    r.u(1)
    r.u(1)
    if cqo != 0:
        raise NotImplementedError("chroma_qp_index_offset != 0 unsupported")
    return {"init_qp": qp, "deblock_control": dbc}


# ---------------------------------------------------------------------------
# frame codec


# sentinel for "this 4x4 block has not been (de)coded yet" in the
# motion grid — distinct from None (= block of an intra MB)
_MV_UNSET = object()


class _FrameState:
    """Reconstruction state shared by the encoder (which decodes in the
    loop) and the decoder: planes + per-4x4-block TotalCoeff grids."""

    def __init__(self, width: int, height: int):
        self.w, self.h = width, height
        self.y = [[0] * width for _ in range(height)]
        self.cb = [[0] * (width // 2) for _ in range(height // 2)]
        self.cr = [[0] * (width // 2) for _ in range(height // 2)]
        self.nnz_y = [[0] * (width // 4) for _ in range(height // 4)]
        self.nnz_cb = [[0] * (width // 8 * 2) for _ in range(height // 8 * 2)]
        self.nnz_cr = [[0] * (width // 8 * 2) for _ in range(height // 8 * 2)]
        # per-4x4-block Intra4x4PredMode, None where the covering MB is
        # not I_4x4 (predIntra4x4PredMode's neighbor rule, spec 8.3.1.1)
        self.i4_mode: list[list[int | None]] = [
            [None] * (width // 4) for _ in range(height // 4)
        ]
        # per-4x4-block motion state for P slices (round 13 partitions:
        # a 16x8/8x16 partition's MV neighbors can live INSIDE the same
        # MB, so MV state is block-granular like the spec's): _MV_UNSET
        # = not yet (de)coded (unavailable to the predictor), None =
        # block of an intra MB (available, refIdx -1), (mvx, mvy)
        # quarter-pel = inter refIdx 0.
        self.mv4: list[list] = [
            [_MV_UNSET] * (width // 4) for _ in range(height // 4)
        ]
        # list-1 motion grid for B slices (round 13): same convention;
        # a block predicted from one list only holds None (refIdx -1)
        # in the other list's grid
        self.mv4_l1: list[list] = [
            [_MV_UNSET] * (width // 4) for _ in range(height // 4)
        ]

    def nc_luma(self, gx: int, gy: int) -> int:
        a = self.nnz_y[gy][gx - 1] if gx > 0 else None
        b = self.nnz_y[gy - 1][gx] if gy > 0 else None
        if a is not None and b is not None:
            return (a + b + 1) >> 1
        if a is not None:
            return a
        if b is not None:
            return b
        return 0

    def nc_chroma(self, grid, gx: int, gy: int) -> int:
        a = grid[gy][gx - 1] if gx > 0 else None
        b = grid[gy - 1][gx] if gy > 0 else None
        if a is not None and b is not None:
            return (a + b + 1) >> 1
        if a is not None:
            return a
        if b is not None:
            return b
        return 0


def _zigzag_flat(block4x4: list[list[int]]) -> list[int]:
    return [block4x4[i][j] for i, j in ZIGZAG_4x4]


def _unzigzag(flat: list[int]) -> list[list[int]]:
    out = [[0] * 4 for _ in range(4)]
    for k, (i, j) in enumerate(ZIGZAG_4x4):
        out[i][j] = flat[k]
    return out


def _mb_neighbors_luma(st: _FrameState, mbx: int, mby: int):
    x0, y0 = mbx * 16, mby * 16
    left = [st.y[y0 + k][x0 - 1] for k in range(16)] if x0 > 0 else None
    top = st.y[y0 - 1][x0 : x0 + 16] if y0 > 0 else None
    tl = st.y[y0 - 1][x0 - 1] if x0 > 0 and y0 > 0 else None
    return left, top, tl


def _mb_neighbors_chroma(plane, mbx: int, mby: int):
    x0, y0 = mbx * 8, mby * 8
    left = [plane[y0 + k][x0 - 1] for k in range(8)] if x0 > 0 else None
    top = plane[y0 - 1][x0 : x0 + 8] if y0 > 0 else None
    tl = plane[y0 - 1][x0 - 1] if x0 > 0 and y0 > 0 else None
    return left, top, tl


def _encode_mb(
    w: BitWriter, st: _FrameState, src_y, src_cb, src_cr,
    mbx: int, mby: int, qp: int, pred_mode: int, chroma_mode: int,
    mb_type_offset: int = 0,
) -> None:
    """Encode one I_16x16 macroblock and reconstruct it into ``st`` (the
    encoder decodes in the loop so prediction uses what the decoder will
    see)."""
    x0, y0 = mbx * 16, mby * 16
    left, top, tl = _mb_neighbors_luma(st, mbx, mby)
    pred = pred16x16(pred_mode, left, top, tl)
    # residual -> per-4x4 forward transform; DC coefficients split out
    dc = [[0] * 4 for _ in range(4)]
    ac_levels = [None] * 16  # per luma4x4BlkIdx: 4x4 level grid (DC pos 0)
    for blk in range(16):
        bx, by = blk_xy(blk)
        res = [
            [
                src_y[y0 + by * 4 + i][x0 + bx * 4 + j]
                - pred[by * 4 + i][bx * 4 + j]
                for j in range(4)
            ]
            for i in range(4)
        ]
        coef = forward4x4(res)
        dc[by][bx] = coef[0][0]
        ac_levels[blk] = quant4x4(coef, qp, skip_dc=True)
    dc_levels = quant_luma_dc(hadamard4x4(dc, forward=True), qp)
    cbp_luma = 15 if any(
        any(any(row) for row in lv) for lv in ac_levels
    ) else 0

    # chroma: DC + AC per component
    qpc = chroma_qp(qp)
    ch_data, cbp_chroma = _chroma_analyze(
        st, src_cb, src_cr, mbx, mby, qpc, chroma_mode
    )

    # mb_type: 1 + predMode + 4*cbp_chroma + 12*(cbp_luma == 15)
    # (+5 inside a P slice, spec Table 7-10)
    w.ue(
        mb_type_offset
        + 1 + pred_mode + 4 * cbp_chroma + 12 * (1 if cbp_luma else 0)
    )
    w.ue(chroma_mode)  # intra_chroma_pred_mode
    w.se(0)            # mb_qp_delta (slice QP everywhere)

    # ---- residuals (and in-loop reconstruction) ----
    gx0, gy0 = mbx * 4, mby * 4
    # Intra16x16DCLevel: nC of luma blk 0
    nc = st.nc_luma(gx0, gy0)
    write_residual_block(w, _zigzag_flat(dc_levels), nc)
    dcr = scale_luma_dc(hadamard4x4(dc_levels, forward=False), qp)
    ac_total = [0] * 16
    recon_blocks = {}
    for blk in range(16):
        bx, by = blk_xy(blk)
        if cbp_luma:
            nc = st.nc_luma(gx0 + bx, gy0 + by)
            flat = _zigzag_flat(ac_levels[blk])[1:]
            total = write_residual_block(w, flat, nc)
        else:
            total = 0
        ac_total[blk] = total
        st.nnz_y[gy0 + by][gx0 + bx] = total
        deq = dequant4x4(
            ac_levels[blk] if cbp_luma else [[0] * 4 for _ in range(4)],
            qp, skip_dc=True,
        )
        deq[0][0] = dcr[by][bx]
        recon_blocks[blk] = inverse4x4(deq)
    for blk in range(16):
        bx, by = blk_xy(blk)
        r4 = recon_blocks[blk]
        for i in range(4):
            for j in range(4):
                st.y[y0 + by * 4 + i][x0 + bx * 4 + j] = _clip(
                    pred[by * 4 + i][bx * 4 + j] + r4[i][j]
                )
    _chroma_emit(w, st, ch_data, cbp_chroma, mbx, mby, qpc)


def _chroma_analyze(
    st: _FrameState, src_cb, src_cr, mbx: int, mby: int,
    qpc: int, chroma_mode: int, mc_preds=None,
):
    """Predict + transform + quantize both chroma components from the
    current reconstruction state; returns (per-component data, the
    derived CodedBlockPatternChroma). ``mc_preds`` = (pred_cb, pred_cr)
    motion-compensated 8x8 predictions for inter MBs (chroma_mode is
    then unused); None = intra prediction from the neighbors."""
    ch_data = []
    for comp, (plane, src) in enumerate(((st.cb, src_cb), (st.cr, src_cr))):
        if mc_preds is not None:
            cpred = mc_preds[comp]
        else:
            cl, ct, ctl = _mb_neighbors_chroma(plane, mbx, mby)
            cpred = pred_chroma8x8(chroma_mode, cl, ct, ctl)
        cdc = [[0] * 2 for _ in range(2)]
        cac = [None] * 4
        cx0, cy0 = mbx * 8, mby * 8
        for blk in range(4):
            bx, by = (blk & 1), (blk >> 1)
            res = [
                [
                    src[cy0 + by * 4 + i][cx0 + bx * 4 + j]
                    - cpred[by * 4 + i][bx * 4 + j]
                    for j in range(4)
                ]
                for i in range(4)
            ]
            coef = forward4x4(res)
            cdc[by][bx] = coef[0][0]
            cac[blk] = quant4x4(coef, qpc, skip_dc=True)
        cdc_levels = quant_chroma_dc(hadamard2x2(cdc), qpc)
        ch_data.append((cpred, cdc_levels, cac))
    has_cdc = any(any(any(row) for row in d[1]) for d in ch_data)
    has_cac = any(
        any(any(any(r) for r in lv) for lv in d[2]) for d in ch_data
    )
    return ch_data, (2 if has_cac else (1 if has_cdc else 0))


def _chroma_emit(
    w: BitWriter, st: _FrameState, ch_data, cbp_chroma: int,
    mbx: int, mby: int, qpc: int,
) -> None:
    """Write the chroma residual blocks (DC pair then per-component AC)
    and reconstruct both planes into ``st`` — shared by the I_16x16 and
    I_4x4 encoders (residual order is identical, spec 7.3.5.3.1)."""
    if cbp_chroma:
        for _, cdc_levels, _ in ch_data:
            write_residual_block(w, [
                cdc_levels[0][0], cdc_levels[0][1],
                cdc_levels[1][0], cdc_levels[1][1],
            ], -1)
    cgx0, cgy0 = mbx * 2, mby * 2
    for comp, (cpred, cdc_levels, cac) in enumerate(ch_data):
        plane = st.cb if comp == 0 else st.cr
        grid = st.nnz_cb if comp == 0 else st.nnz_cr
        cdcr = (
            scale_chroma_dc(hadamard2x2(cdc_levels), qpc)
            if cbp_chroma
            else [[0, 0], [0, 0]]
        )
        cx0, cy0 = mbx * 8, mby * 8
        for blk in range(4):
            bx, by = (blk & 1), (blk >> 1)
            if cbp_chroma == 2:
                nc = st.nc_chroma(grid, cgx0 + bx, cgy0 + by)
                flat = _zigzag_flat(cac[blk])[1:]
                total = write_residual_block(w, flat, nc)
            else:
                total = 0
            grid[cgy0 + by][cgx0 + bx] = total
            deq = dequant4x4(
                cac[blk] if cbp_chroma == 2 else [[0] * 4 for _ in range(4)],
                qpc, skip_dc=True,
            )
            deq[0][0] = cdcr[by][bx]
            r4 = inverse4x4(deq)
            for i in range(4):
                for j in range(4):
                    plane[cy0 + by * 4 + i][cx0 + bx * 4 + j] = _clip(
                        cpred[by * 4 + i][bx * 4 + j] + r4[i][j]
                    )


def _i4_neighbors(st: _FrameState, mbx: int, mby: int, blk: int):
    """(top, topright, left, topleft) for luma 4x4 block ``blk`` from the
    reconstruction state, None where unavailable; top-right substitutes
    p[3,-1] when top exists but those samples aren't decoded yet
    (8.3.1.2.2)."""
    bx, by = blk_xy(blk)
    gx, gy = mbx * 16 + bx * 4, mby * 16 + by * 4

    def done(px: int, py: int) -> bool:
        if px < 0 or py < 0 or px >= st.w or py >= st.h:
            return False
        mx, my = px // 16, py // 16
        if my < mby or (my == mby and mx < mbx):
            return True
        if (mx, my) != (mbx, mby):
            return False
        return _BLK_ORDER[((px % 16) // 4, (py % 16) // 4)] < blk

    top = (
        st.y[gy - 1][gx : gx + 4] if done(gx, gy - 1) else None
    )
    left = (
        [st.y[gy + k][gx - 1] for k in range(4)]
        if done(gx - 1, gy)
        else None
    )
    topleft = st.y[gy - 1][gx - 1] if done(gx - 1, gy - 1) else None
    if done(gx + 4, gy - 1):
        topright = st.y[gy - 1][gx + 4 : gx + 8]
    elif top is not None:
        topright = [top[3]] * 4  # substitution rule
    else:
        topright = None
    return top, topright, left, topleft


def _i4_pred_mode(st: _FrameState, gx4: int, gy4: int) -> int:
    """predIntra4x4PredMode (8.3.1.1): min of the left/above blocks'
    modes, with DC (2) substituted for unavailable or non-I4x4
    neighbors."""
    a = st.i4_mode[gy4][gx4 - 1] if gx4 > 0 else None
    b = st.i4_mode[gy4 - 1][gx4] if gy4 > 0 else None
    return min(2 if a is None else a, 2 if b is None else b)


def _i4_available_modes(top, topright, left, topleft) -> list[int]:
    """Prediction modes whose inputs exist (encoder's menu)."""
    out = [2]
    if top is not None:
        out.append(0)
    if left is not None:
        out += [1, 8]
    if top is not None and topright is not None:
        out += [3, 7]
    if top is not None and left is not None and topleft is not None:
        out += [4, 5, 6]
    return out


def _encode_i4x4_mb(
    w: BitWriter, st: _FrameState, src_y, src_cb, src_cr,
    mbx: int, mby: int, qp: int, chroma_mode: int,
    cbp_luma_mask: int = 15, mb_type_offset: int = 0,
) -> None:
    """Encode one I_4x4 macroblock (decode-in-the-loop like the I_16x16
    path: each 4x4 block predicts from already-RECONSTRUCTED samples,
    including earlier blocks of this same MB). ``cbp_luma_mask`` selects
    which 8x8 quadrants carry residuals — an uncoded quadrant
    reconstructs as pure prediction, exercising the partial-cbp decode
    path."""
    x0, y0 = mbx * 16, mby * 16
    gx0, gy0 = mbx * 4, mby * 4
    qpc = chroma_qp(qp)

    # pass 1: choose modes + build residual levels IN DECODE ORDER,
    # reconstructing as we go (predictions depend on it)
    modes = [0] * 16
    levels = [None] * 16
    for blk in range(16):
        bx, by = blk_xy(blk)
        top, topright, left, topleft = _i4_neighbors(st, mbx, mby, blk)
        cands = _i4_available_modes(top, topright, left, topleft)
        mode = cands[(blk + mbx + 2 * mby) % len(cands)]
        modes[blk] = mode
        st.i4_mode[gy0 + by][gx0 + bx] = mode
        pred = pred4x4(mode, top, topright, left, topleft)
        quad_coded = (cbp_luma_mask >> (blk >> 2)) & 1
        if quad_coded:
            res = [
                [
                    src_y[y0 + by * 4 + i][x0 + bx * 4 + j] - pred[i][j]
                    for j in range(4)
                ]
                for i in range(4)
            ]
            lv = quant4x4(forward4x4(res), qp, skip_dc=False)
        else:
            lv = [[0] * 4 for _ in range(4)]
        levels[blk] = lv
        deq = dequant4x4(lv, qp, skip_dc=False)
        r4 = inverse4x4(deq)
        for i in range(4):
            for j in range(4):
                st.y[y0 + by * 4 + i][x0 + bx * 4 + j] = _clip(
                    pred[i][j] + r4[i][j]
                )
    cbp_luma = 0
    for quad in range(4):
        if any(
            any(any(row) for row in levels[4 * quad + k]) for k in range(4)
        ):
            cbp_luma |= 1 << quad
    ch_data, cbp_chroma = _chroma_analyze(
        st, src_cb, src_cr, mbx, mby, qpc, chroma_mode
    )
    cbp = cbp_luma | (cbp_chroma << 4)

    # pass 2: emit — mb_type, 16 mode signals, chroma mode, cbp,
    # qp_delta (only when cbp != 0), residuals
    w.ue(mb_type_offset)  # I_4x4 / I_NxN (+5 inside a P slice)
    for blk in range(16):
        bx, by = blk_xy(blk)
        # the PREDICTED mode uses neighbor modes as known at decode time
        # of this block — recompute against the grid state the decoder
        # will have (the grid was fully written in pass 1, but neighbors
        # of block k are always earlier in decode order, so their
        # entries match what the decoder has seen)
        pm = _i4_pred_mode(st, gx0 + bx, gy0 + by)
        mode = modes[blk]
        if mode == pm:
            w.u(1, 1)  # prev_intra4x4_pred_mode_flag
        else:
            w.u(0, 1)
            w.u(mode if mode < pm else mode - 1, 3)
    w.ue(chroma_mode)
    w.ue(CBP_INTRA_INV[cbp])
    if cbp:
        w.se(0)  # mb_qp_delta
    for blk in range(16):
        bx, by = blk_xy(blk)
        if (cbp_luma >> (blk >> 2)) & 1:
            nc = st.nc_luma(gx0 + bx, gy0 + by)
            total = write_residual_block(w, _zigzag_flat(levels[blk]), nc)
        else:
            total = 0
        st.nnz_y[gy0 + by][gx0 + bx] = total
    _chroma_emit(w, st, ch_data, cbp_chroma, mbx, mby, qpc)


def _decode_mb(
    r: BitReader, st: _FrameState, mbx: int, mby: int, qp: int
) -> None:
    mb_type = r.ue()
    return _decode_intra_mb(r, st, mbx, mby, qp, mb_type)


def _decode_intra_mb(
    r: BitReader, st: _FrameState, mbx: int, mby: int, qp: int,
    mb_type: int,
) -> None:
    """Decode one intra macroblock given its (already-read, I-slice
    numbering) mb_type — shared by I slices and the intra MBs of P
    slices (whose mb_type arrives offset by 5, spec Table 7-10)."""
    if mb_type == 0:  # I_4x4 / I_NxN (round 12)
        return _decode_i4x4_mb(r, st, mbx, mby, qp)
    if mb_type == 25:  # I_PCM
        r.byte_align()
        x0, y0 = mbx * 16, mby * 16
        for i in range(16):
            for j in range(16):
                st.y[y0 + i][x0 + j] = r.u(8)
        cx0, cy0 = mbx * 8, mby * 8
        for plane in (st.cb, st.cr):
            for i in range(8):
                for j in range(8):
                    plane[cy0 + i][cx0 + j] = r.u(8)
        gx0, gy0 = mbx * 4, mby * 4
        for by in range(4):
            for bx in range(4):
                st.nnz_y[gy0 + by][gx0 + bx] = 16
        for grid in (st.nnz_cb, st.nnz_cr):
            for by in range(2):
                for bx in range(2):
                    grid[mby * 2 + by][mbx * 2 + bx] = 16
        return
    if mb_type > 25:
        raise ValueError(f"invalid I-slice mb_type {mb_type}")
    k = mb_type - 1
    pred_mode = k % 4
    cbp_chroma = (k // 4) % 3
    cbp_luma = 15 if k >= 12 else 0
    chroma_mode = r.ue()
    if r.se() != 0:
        raise NotImplementedError(
            "mb_qp_delta != 0 unsupported (the writer pins slice QP)"
        )
    x0, y0 = mbx * 16, mby * 16
    left, top, tl = _mb_neighbors_luma(st, mbx, mby)
    pred = pred16x16(pred_mode, left, top, tl)
    gx0, gy0 = mbx * 4, mby * 4
    nc = st.nc_luma(gx0, gy0)
    dc_flat, _ = read_residual_block(r, 16, nc)
    dcr = scale_luma_dc(hadamard4x4(_unzigzag(dc_flat), forward=False), qp)
    recon = {}
    for blk in range(16):
        bx, by = blk_xy(blk)
        if cbp_luma:
            nc = st.nc_luma(gx0 + bx, gy0 + by)
            flat, total = read_residual_block(r, 15, nc)
            levels = _unzigzag([0] + flat)
        else:
            total, levels = 0, [[0] * 4 for _ in range(4)]
        st.nnz_y[gy0 + by][gx0 + bx] = total
        deq = dequant4x4(levels, qp, skip_dc=True)
        deq[0][0] = dcr[by][bx]
        recon[blk] = inverse4x4(deq)
    for blk in range(16):
        bx, by = blk_xy(blk)
        r4 = recon[blk]
        for i in range(4):
            for j in range(4):
                st.y[y0 + by * 4 + i][x0 + bx * 4 + j] = _clip(
                    pred[by * 4 + i][bx * 4 + j] + r4[i][j]
                )
    _decode_chroma(r, st, mbx, mby, chroma_qp(qp), chroma_mode, cbp_chroma)


def _decode_chroma(
    r: BitReader, st: _FrameState, mbx: int, mby: int,
    qpc: int, chroma_mode: int, cbp_chroma: int, mc_preds=None,
) -> None:
    """Read the chroma residual blocks and reconstruct both planes —
    shared by the I_16x16 / I_4x4 decoders and (with ``mc_preds``, the
    motion-compensated 8x8 prediction pair) the P-slice inter path."""
    cdc_levels = []
    for _ in range(2):
        if cbp_chroma:
            flat, _ = read_residual_block(r, 4, -1)
        else:
            flat = [0, 0, 0, 0]
        cdc_levels.append([[flat[0], flat[1]], [flat[2], flat[3]]])
    cgx0, cgy0 = mbx * 2, mby * 2
    for comp in range(2):
        plane = st.cb if comp == 0 else st.cr
        grid = st.nnz_cb if comp == 0 else st.nnz_cr
        if mc_preds is not None:
            cpred = mc_preds[comp]
        else:
            cl, ct, ctl = _mb_neighbors_chroma(plane, mbx, mby)
            cpred = pred_chroma8x8(chroma_mode, cl, ct, ctl)
        cdcr = scale_chroma_dc(hadamard2x2(cdc_levels[comp]), qpc)
        cx0, cy0 = mbx * 8, mby * 8
        for blk in range(4):
            bx, by = (blk & 1), (blk >> 1)
            if cbp_chroma == 2:
                nc = st.nc_chroma(grid, cgx0 + bx, cgy0 + by)
                flat, total = read_residual_block(r, 15, nc)
                levels = _unzigzag([0] + flat)
            else:
                total, levels = 0, [[0] * 4 for _ in range(4)]
            grid[cgy0 + by][cgx0 + bx] = total
            deq = dequant4x4(levels, qpc, skip_dc=True)
            deq[0][0] = cdcr[by][bx]
            r4 = inverse4x4(deq)
            for i in range(4):
                for j in range(4):
                    plane[cy0 + by * 4 + i][cx0 + bx * 4 + j] = _clip(
                        cpred[by * 4 + i][bx * 4 + j] + r4[i][j]
                    )


def _decode_i4x4_mb(
    r: BitReader, st: _FrameState, mbx: int, mby: int, qp: int
) -> None:
    """Decode one I_4x4 macroblock (round 12): 16 signaled prediction
    modes, Table 9-4 coded_block_pattern, per-block 4x4 residuals (full
    16-coefficient blocks, no DC split), reconstruction in decode order
    so later blocks predict from earlier ones."""
    x0, y0 = mbx * 16, mby * 16
    gx0, gy0 = mbx * 4, mby * 4
    modes = [0] * 16
    for blk in range(16):
        bx, by = blk_xy(blk)
        pm = _i4_pred_mode(st, gx0 + bx, gy0 + by)
        if r.u(1):  # prev_intra4x4_pred_mode_flag
            mode = pm
        else:
            rem = r.u(3)
            mode = rem if rem < pm else rem + 1
        modes[blk] = mode
        st.i4_mode[gy0 + by][gx0 + bx] = mode
    chroma_mode = r.ue()
    code_num = r.ue()
    if code_num >= len(CBP_INTRA_ME):
        raise ValueError(f"bad coded_block_pattern codeNum {code_num}")
    cbp = CBP_INTRA_ME[code_num]
    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    if cbp and r.se() != 0:
        raise NotImplementedError(
            "mb_qp_delta != 0 unsupported (the writer pins slice QP)"
        )
    for blk in range(16):
        bx, by = blk_xy(blk)
        top, topright, left, topleft = _i4_neighbors(st, mbx, mby, blk)
        pred = pred4x4(modes[blk], top, topright, left, topleft)
        if (cbp_luma >> (blk >> 2)) & 1:
            nc = st.nc_luma(gx0 + bx, gy0 + by)
            flat, total = read_residual_block(r, 16, nc)
            levels = _unzigzag(flat)
        else:
            total, levels = 0, [[0] * 4 for _ in range(4)]
        st.nnz_y[gy0 + by][gx0 + bx] = total
        r4 = inverse4x4(dequant4x4(levels, qp, skip_dc=False))
        for i in range(4):
            for j in range(4):
                st.y[y0 + by * 4 + i][x0 + bx * 4 + j] = _clip(
                    pred[i][j] + r4[i][j]
                )
    _decode_chroma(r, st, mbx, mby, chroma_qp(qp), chroma_mode, cbp_chroma)


def encode_idr(
    y: list[list[int]], cb: list[list[int]], cr: list[list[int]],
    qp: int = 26, pred_mode: int = 2, chroma_mode: int = 0,
    frame_num: int = 0, idr_pic_id: int = 0, mb_mode: str = "i16",
    cbp_luma_mask: int = 15, poc_lsb: int | None = None,
) -> tuple[bytes, tuple]:
    """Encode one IDR picture (coded-slice NAL only — SPS/PPS travel in
    avcC). Returns (slice NAL bytes, reconstructed (y, cb, cr) planes) —
    the reconstruction is what a conforming decoder must produce, byte-
    exact, which is the round-trip contract. ``mb_mode``: "i16" (every
    MB I_16x16 with ``pred_mode``), "i4" (every MB I_4x4, per-block
    modes rotated over whatever the neighbors make legal), or "mix"
    (checkerboard of both — exercises the predIntra4x4PredMode rule
    that a non-I4x4 neighbor predicts as DC). ``cbp_luma_mask`` (i4
    only) drops residuals of unselected 8x8 quadrants, exercising the
    partial-cbp decode path."""
    height, width = len(y), len(y[0])
    if width % 16 or height % 16:
        raise NotImplementedError("dimensions must be multiples of 16")
    if not 0 <= qp <= 51:
        raise ValueError("qp out of range")
    if mb_mode not in ("i16", "i4", "mix"):
        raise ValueError(f"unknown mb_mode {mb_mode!r}")
    st = _FrameState(width, height)
    w = BitWriter()
    w.ue(0)          # first_mb_in_slice
    w.ue(7)          # slice_type: I (all slices in picture)
    w.ue(0)          # pps id
    w.u(frame_num % 16, 4)  # frame_num (log2_max_frame_num = 4)
    if poc_lsb is not None:  # pic_order_cnt_type 0 stream (B GOPs)
        w.u(poc_lsb % 256, 8)
    w.ue(idr_pic_id)
    # dec_ref_pic_marking (7.3.3.3, nal_ref_idc != 0 and IdrPicFlag):
    w.u(0, 1)        # no_output_of_prior_pics_flag
    w.u(0, 1)        # long_term_reference_flag
    w.se(0)          # slice_qp_delta (pps init_qp is the slice QP)
    w.ue(1)          # disable_deblocking_filter_idc: off
    for mby in range(height // 16):
        for mbx in range(width // 16):
            use_i4 = mb_mode == "i4" or (
                mb_mode == "mix" and (mbx + mby) % 2 == 1
            )
            if use_i4:
                _encode_i4x4_mb(
                    w, st, y, cb, cr, mbx, mby, qp, chroma_mode,
                    cbp_luma_mask=cbp_luma_mask,
                )
            else:
                _encode_mb(
                    w, st, y, cb, cr, mbx, mby, qp, pred_mode, chroma_mode
                )
    w.rbsp_trailing()
    return nal(5, w.tobytes()), (st.y, st.cb, st.cr)


def decode_idr(
    slice_nal: bytes, sps: Sps, init_qp: int
) -> tuple[list[list[int]], list[list[int]], list[list[int]]]:
    """Decode one IDR coded-slice NAL into (y, cb, cr) planes."""
    hdr = slice_nal[0]
    if hdr & 0x1F != 5:
        raise NotImplementedError(
            f"NAL type {hdr & 0x1F} is not an IDR slice: inter-coded "
            "pictures are outside the decoded subset (sample IDR "
            "pictures only)"
        )
    r = BitReader(ebsp_to_rbsp(slice_nal[1:]))
    if r.ue() != 0:
        raise NotImplementedError("multi-slice pictures unsupported")
    st_type = r.ue()
    if st_type % 5 != 2:
        raise NotImplementedError(
            f"slice_type {st_type} is not I: inter slices are gated"
        )
    r.ue()  # pps id
    r.u(sps.log2_max_frame_num)  # frame_num
    if sps.poc_type == 0:
        r.u(sps.log2_max_poc_lsb)  # pic_order_cnt_lsb
    r.ue()  # idr_pic_id
    r.u(1)  # no_output_of_prior_pics_flag (dec_ref_pic_marking, IDR)
    r.u(1)  # long_term_reference_flag
    qp = init_qp + r.se()
    idc = r.ue()  # disable_deblocking_filter_idc
    if idc != 1:
        if idc in (0, 2):
            r.se()
            r.se()
        raise NotImplementedError(
            "in-loop deblocking unsupported (writer disables it; "
            "disable_deblocking_filter_idc must be 1)"
        )
    st = _FrameState(sps.width, sps.height)
    for mby in range(sps.height // 16):
        for mbx in range(sps.width // 16):
            _decode_mb(r, st, mbx, mby, qp)
    return st.y, st.cb, st.cr


# ---------------------------------------------------------------------------
# P slices (round 13): motion-compensated inter prediction — quarter-pel
# luma (8.4.2.2.1 six-tap), eighth-pel bilinear chroma (8.4.2.2.2),
# median MV prediction (8.4.1.3), P_Skip (8.4.1.1), CAVLC mb_skip_run
# slice data (7.3.4), Table 9-4 inter coded_block_pattern. Subset:
# whole-MB P_L0_16x16 partitions + P_Skip + intra MBs, one reference
# picture (the previous decoded frame), no weighted prediction (baseline
# has none). 16x8/8x16/8x8 partitions and B slices raise
# NotImplementedError.

# Table 9-4, inter column: coded_block_pattern codeNum -> cbp for
# P-macroblocks. A permutation of 0..47, structurally pinned in
# tests/test_h264.py alongside the intra column.
CBP_INTER_ME = [
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
    14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41,
]
CBP_INTER_INV = {v: i for i, v in enumerate(CBP_INTER_ME)}


def _ref_pix(plane, x: int, y: int, w: int, h: int) -> int:
    """Edge-extended reference fetch (8.4.2.2.1 coordinate clipping)."""
    return plane[0 if y < 0 else h - 1 if y >= h else y][
        0 if x < 0 else w - 1 if x >= w else x
    ]


def mc_luma(
    ref, px: int, py: int, mvx: int, mvy: int, bw: int = 16, bh: int = 16
):
    """Quarter-sample luma motion compensation (8.4.2.2.1): block of
    ``bw`` x ``bh`` predicted samples at full-pel origin (px, py)
    displaced by (mvx, mvy) in quarter-pel units. Half-pel positions use
    the 6-tap (1,-5,20,20,-5,1) filter; the center position j filters
    the unclipped horizontal intermediates vertically; quarter positions
    average per Table 8-12."""
    h, w = len(ref), len(ref[0])
    fx, fy = mvx & 3, mvy & 3
    x0, y0 = px + (mvx >> 2), py + (mvy >> 2)

    def P(x, y):
        return _ref_pix(ref, x, y, w, h)

    def B1(x, y):  # horizontal 6-tap intermediate at (x + 1/2, y)
        return (
            P(x - 2, y) - 5 * P(x - 1, y) + 20 * P(x, y)
            + 20 * P(x + 1, y) - 5 * P(x + 2, y) + P(x + 3, y)
        )

    def H1(x, y):  # vertical 6-tap intermediate at (x, y + 1/2)
        return (
            P(x, y - 2) - 5 * P(x, y - 1) + 20 * P(x, y)
            + 20 * P(x, y + 1) - 5 * P(x, y + 2) + P(x, y + 3)
        )

    def bpix(x, y):
        return _clip((B1(x, y) + 16) >> 5)

    def hpix(x, y):
        return _clip((H1(x, y) + 16) >> 5)

    def jpix(x, y):  # center: vertical 6-tap over unclipped horizontals
        j1 = (
            B1(x, y - 2) - 5 * B1(x, y - 1) + 20 * B1(x, y)
            + 20 * B1(x, y + 1) - 5 * B1(x, y + 2) + B1(x, y + 3)
        )
        return _clip((j1 + 512) >> 10)

    out = [[0] * bw for _ in range(bh)]
    for i in range(bh):
        for jj in range(bw):
            x, y = x0 + jj, y0 + i
            if fx == 0 and fy == 0:
                v = P(x, y)
            elif fy == 0:  # a / b / c
                b = bpix(x, y)
                if fx == 2:
                    v = b
                elif fx == 1:
                    v = (P(x, y) + b + 1) >> 1
                else:
                    v = (b + P(x + 1, y) + 1) >> 1
            elif fx == 0:  # d / h / n
                hh = hpix(x, y)
                if fy == 2:
                    v = hh
                elif fy == 1:
                    v = (P(x, y) + hh + 1) >> 1
                else:
                    v = (hh + P(x, y + 1) + 1) >> 1
            elif fx == 2 and fy == 2:  # j
                v = jpix(x, y)
            elif fy == 2:  # i / k
                cj = jpix(x, y)
                v = (
                    (hpix(x, y) + cj + 1) >> 1
                    if fx == 1
                    else (cj + hpix(x + 1, y) + 1) >> 1
                )
            elif fx == 2:  # f / q
                cj = jpix(x, y)
                v = (
                    (bpix(x, y) + cj + 1) >> 1
                    if fy == 1
                    else (cj + bpix(x, y + 1) + 1) >> 1
                )
            else:  # e / g / p / r — diagonal averages of b/s and h/m
                bb = bpix(x, y) if fy == 1 else bpix(x, y + 1)
                hm = hpix(x, y) if fx == 1 else hpix(x + 1, y)
                v = (bb + hm + 1) >> 1
            out[i][jj] = v
    return out


def mc_chroma(
    plane, cx0: int, cy0: int, mvx: int, mvy: int,
    bw: int = 8, bh: int = 8,
):
    """Eighth-sample bilinear chroma motion compensation (8.4.2.2.2,
    4:2:0): the luma quarter-pel vector is an eighth-pel chroma
    vector."""
    h, w = len(plane), len(plane[0])
    fx, fy = mvx & 7, mvy & 7
    x0, y0 = cx0 + (mvx >> 3), cy0 + (mvy >> 3)
    out = [[0] * bw for _ in range(bh)]
    for i in range(bh):
        for j in range(bw):
            x, y = x0 + j, y0 + i
            a = _ref_pix(plane, x, y, w, h)
            b = _ref_pix(plane, x + 1, y, w, h)
            c = _ref_pix(plane, x, y + 1, w, h)
            d = _ref_pix(plane, x + 1, y + 1, w, h)
            out[i][j] = (
                (8 - fx) * (8 - fy) * a + fx * (8 - fy) * b
                + (8 - fx) * fy * c + fx * fy * d + 32
            ) >> 6
    return out


def _med3(a: int, b: int, c: int) -> int:
    return max(min(a, b), min(c, max(a, b)))


def _mv_paint(
    st: _FrameState, bx0: int, by0: int, w4: int, h4: int, mv,
    grid=None,
) -> None:
    """Record a partition's motion (or None for intra / no-MV-in-this-
    list) over its 4x4 blocks — the granularity the spec's neighbor
    derivation reads. ``grid`` selects the reference list (default
    L0)."""
    g = st.mv4 if grid is None else grid
    for y in range(by0, by0 + h4):
        row = g[y]
        for x in range(bx0, bx0 + w4):
            row[x] = mv


def _mv_at(st: _FrameState, bx: int, by: int, grid=None):
    """(refIdx, mv, available) of one 4x4 block (8.4.1.3.1's neighbor
    reduction): out-of-frame or not-yet-coded blocks are unavailable;
    blocks of intra MBs (or without an MV in this list) are available
    with refIdx -1; both contribute mv (0,0) to the median."""
    if not (0 <= bx < st.w // 4 and 0 <= by < st.h // 4):
        return -1, (0, 0), False
    v = (st.mv4 if grid is None else grid)[by][bx]
    if v is _MV_UNSET:
        return -1, (0, 0), False
    if v is None:
        return -1, (0, 0), True
    return 0, v, True


def _mv_pred_part(
    st: _FrameState, bx0: int, by0: int, w4: int, h4: int,
    shape: str | None = None, part: int = 0, grid=None,
) -> tuple[int, int]:
    """Motion-vector prediction for a partition with top-left 4x4 block
    (bx0, by0) spanning w4 x h4 blocks (8.4.1.3): neighbors A (left of
    the top-left), B (above the top-left), C (above-right of the
    top-right; D top-left substituted when C is unavailable) — with
    block granularity a 16x8/8x16 partition's neighbor can live INSIDE
    the same MB. The directional rules (8.4.1.3.2) take precedence when
    their neighbor's refIdx matches: 16x8 top <- B, bottom <- A; 8x16
    left <- A, right <- C. Otherwise: mvA outright when B, C and D are
    all unavailable; a lone refIdx-0 match wins; else componentwise
    median."""
    ra, mva, av_a = _mv_at(st, bx0 - 1, by0, grid)
    rb, mvb, av_b = _mv_at(st, bx0, by0 - 1, grid)
    rc, mvc, av_c = _mv_at(st, bx0 + w4, by0 - 1, grid)
    if not av_c:
        rc, mvc, av_c = _mv_at(st, bx0 - 1, by0 - 1, grid)
    if shape == "16x8":
        if part == 0 and rb == 0:
            return mvb
        if part == 1 and ra == 0:
            return mva
    elif shape == "8x16":
        if part == 0 and ra == 0:
            return mva
        if part == 1 and rc == 0:
            return mvc
    if av_a and not av_b and not av_c:
        return mva
    matches = [m for r, m in ((ra, mva), (rb, mvb), (rc, mvc)) if r == 0]
    if len(matches) == 1:
        return matches[0]
    return (
        _med3(mva[0], mvb[0], mvc[0]),
        _med3(mva[1], mvb[1], mvc[1]),
    )


def _mv_pred_16x16(st: _FrameState, mbx: int, mby: int) -> tuple[int, int]:
    return _mv_pred_part(st, mbx * 4, mby * 4, 4, 4)


def _mv_pred_skip(st: _FrameState, mbx: int, mby: int) -> tuple[int, int]:
    """P_Skip motion vector (8.4.1.1): zero when either edge neighbor is
    unavailable or is a zero-motion refIdx-0 inter block; otherwise the
    standard 16x16 prediction. An INTRA neighbor is available but
    refIdx -1, so it falls through to the median rule."""
    bx0, by0 = mbx * 4, mby * 4
    ra, mva, av_a = _mv_at(st, bx0 - 1, by0)
    rb, mvb, av_b = _mv_at(st, bx0, by0 - 1)
    if not av_a or not av_b:
        return (0, 0)
    if (ra == 0 and mva == (0, 0)) or (rb == 0 and mvb == (0, 0)):
        return (0, 0)
    return _mv_pred_16x16(st, mbx, mby)


# partition geometry per P mb_type (Table 7-13), in partition order:
# (pixel dx, pixel dy, width, height, block dx, block dy, w4, h4)
_P_PARTS = {
    0: ("16x16", ((0, 0, 16, 16, 0, 0, 4, 4),)),
    1: ("16x8", ((0, 0, 16, 8, 0, 0, 4, 2), (0, 8, 16, 8, 0, 2, 4, 2))),
    2: ("8x16", ((0, 0, 8, 16, 0, 0, 2, 4), (8, 0, 8, 16, 2, 0, 2, 4))),
}

# sub-macroblock partition geometry per sub_mb_type (Table 7-17),
# relative to the 8x8's origin, in sub-partition order (6.4.2.2)
_SUB_PARTS = {
    0: ((0, 0, 8, 8, 0, 0, 2, 2),),                               # P_L0_8x8
    1: ((0, 0, 8, 4, 0, 0, 2, 1), (0, 4, 8, 4, 0, 1, 2, 1)),      # P_L0_8x4
    2: ((0, 0, 4, 8, 0, 0, 1, 2), (4, 0, 4, 8, 1, 0, 1, 2)),      # P_L0_4x8
    3: ((0, 0, 4, 4, 0, 0, 1, 1), (4, 0, 4, 4, 1, 0, 1, 1),
        (0, 4, 4, 4, 0, 1, 1, 1), (4, 4, 4, 4, 1, 1, 1, 1)),      # P_L0_4x4
}


def _sub_geoms(sub_types):
    """Flatten the four 8x8s' sub-partition geometries into MB-relative
    part tuples, in decode order (8x8 raster, then sub-partition
    order)."""
    out = []
    for i8, stype in enumerate(sub_types):
        ox, oy = (i8 & 1) * 8, (i8 >> 1) * 8
        for g in _SUB_PARTS[stype]:
            out.append((
                ox + g[0], oy + g[1], g[2], g[3],
                (ox + g[0]) // 4, (oy + g[1]) // 4, g[6], g[7],
            ))
    return out


def _mc_predict_mb(ref_planes, mbx: int, mby: int, mv: tuple[int, int]):
    """(luma 16x16, cb 8x8, cr 8x8) motion-compensated prediction."""
    ry, rcb, rcr = ref_planes
    return (
        mc_luma(ry, mbx * 16, mby * 16, mv[0], mv[1], 16, 16),
        mc_chroma(rcb, mbx * 8, mby * 8, mv[0], mv[1], 8, 8),
        mc_chroma(rcr, mbx * 8, mby * 8, mv[0], mv[1], 8, 8),
    )


def _mc_predict_parts(ref_planes, mbx: int, mby: int, parts, mvs):
    """Assemble the full-MB prediction from per-partition motion
    compensation (16x8 / 8x16 / 16x16 geometries of _P_PARTS)."""
    ry, rcb, rcr = ref_planes
    pred_y = [[0] * 16 for _ in range(16)]
    pcb = [[0] * 8 for _ in range(8)]
    pcr = [[0] * 8 for _ in range(8)]
    for (pdx, pdy, pw, ph, _bdx, _bdy, _w4, _h4), mv in zip(parts, mvs):
        block = mc_luma(ry, mbx * 16 + pdx, mby * 16 + pdy, mv[0], mv[1],
                        pw, ph)
        for i in range(ph):
            pred_y[pdy + i][pdx:pdx + pw] = block[i]
        cw, ch_ = pw // 2, ph // 2
        cdx, cdy = pdx // 2, pdy // 2
        for plane, out in ((rcb, pcb), (rcr, pcr)):
            cb_ = mc_chroma(plane, mbx * 8 + cdx, mby * 8 + cdy,
                            mv[0], mv[1], cw, ch_)
            for i in range(ch_):
                out[cdy + i][cdx:cdx + cw] = cb_[i]
    return pred_y, pcb, pcr


def _apply_inter_recon(
    st: _FrameState, mbx: int, mby: int, pred_y, luma_levels, qp: int,
) -> int:
    """Reconstruct the luma of an inter MB from its prediction and
    (possibly all-zero) residual levels; returns CodedBlockPatternLuma.
    ``luma_levels[blk]`` is None for an uncoded quadrant's blocks."""
    x0, y0 = mbx * 16, mby * 16
    gx0, gy0 = mbx * 4, mby * 4
    cbp_luma = 0
    for quad in range(4):
        if any(
            luma_levels[4 * quad + k] is not None
            and any(any(row) for row in luma_levels[4 * quad + k])
            for k in range(4)
        ):
            cbp_luma |= 1 << quad
    for blk in range(16):
        bx, by = blk_xy(blk)
        lv = luma_levels[blk]
        if lv is None or not (cbp_luma >> (blk >> 2)) & 1:
            lv = None
        r4 = (
            inverse4x4(dequant4x4(lv, qp, skip_dc=False))
            if lv is not None
            else None
        )
        for i in range(4):
            for j in range(4):
                p = pred_y[by * 4 + i][bx * 4 + j]
                st.y[y0 + by * 4 + i][x0 + bx * 4 + j] = _clip(
                    p + (r4[i][j] if r4 is not None else 0)
                )
    return cbp_luma


def _apply_skip(st: _FrameState, ref_planes, mbx: int, mby: int) -> None:
    """Reconstruct one P_Skip MB: motion-compensated prediction at the
    skip vector, zero residual, zero TotalCoeff contexts (9.2.1 treats
    skipped neighbors as coefficient-free)."""
    mv = _mv_pred_skip(st, mbx, mby)
    _mv_paint(st, mbx * 4, mby * 4, 4, 4, mv)
    pred_y, pcb, pcr = _mc_predict_mb(ref_planes, mbx, mby, mv)
    x0, y0 = mbx * 16, mby * 16
    for i in range(16):
        row = st.y[y0 + i]
        prow = pred_y[i]
        for j in range(16):
            row[x0 + j] = prow[j]
    cx0, cy0 = mbx * 8, mby * 8
    for plane, ppred in ((st.cb, pcb), (st.cr, pcr)):
        for i in range(8):
            row = plane[cy0 + i]
            prow = ppred[i]
            for j in range(8):
                row[cx0 + j] = prow[j]
    gx0, gy0 = mbx * 4, mby * 4
    for by in range(4):
        for bx in range(4):
            st.nnz_y[gy0 + by][gx0 + bx] = 0
    for grid in (st.nnz_cb, st.nnz_cr):
        for by in range(2):
            for bx in range(2):
                grid[mby * 2 + by][mbx * 2 + bx] = 0


def _quantize_inter_mb(
    st: _FrameState, src_y, src_cb, src_cr, ref_planes,
    mbx: int, mby: int, qp: int, mv: tuple[int, int],
):
    """Motion-compensate at ``mv`` and quantize the full-MB residual.
    Returns (pred_y, (pcb, pcr), luma_levels, ch_data, cbp_chroma)."""
    pred_y, pcb, pcr = _mc_predict_mb(ref_planes, mbx, mby, mv)
    levels, ch_data, cbp_c = _quantize_residual(
        st, src_y, src_cb, src_cr, mbx, mby, qp, pred_y, pcb, pcr
    )
    return pred_y, (pcb, pcr), levels, ch_data, cbp_c


def _quantize_residual(
    st: _FrameState, src_y, src_cb, src_cr,
    mbx: int, mby: int, qp: int, pred_y, pcb, pcr,
):
    """Quantize the full-MB residual against an assembled prediction
    (shared by the whole-MB and partitioned inter encoders)."""
    x0, y0 = mbx * 16, mby * 16
    luma_levels = []
    for blk in range(16):
        bx, by = blk_xy(blk)
        res = [
            [
                src_y[y0 + by * 4 + i][x0 + bx * 4 + j]
                - pred_y[by * 4 + i][bx * 4 + j]
                for j in range(4)
            ]
            for i in range(4)
        ]
        luma_levels.append(quant4x4(forward4x4(res), qp, skip_dc=False))
    ch_data, cbp_chroma = _chroma_analyze(
        st, src_cb, src_cr, mbx, mby, chroma_qp(qp), 0,
        mc_preds=(pcb, pcr),
    )
    return luma_levels, ch_data, cbp_chroma


def _sad16(src_y, pred_y, x0: int, y0: int) -> int:
    return sum(
        abs(src_y[y0 + i][x0 + j] - pred_y[i][j])
        for i in range(16)
        for j in range(16)
    )


def _subsad16(src_y, ref_y, x0: int, y0: int, mv: tuple[int, int]) -> int:
    """Cheap 2:1-subsampled SAD for encoder-side candidate ranking and
    the skip precheck — INTEGER-pel only (fractional candidates rank by
    the full interpolated SAD). Encoder-internal; never affects
    conformance, only which MVs get the expensive evaluation."""
    h, w = len(ref_y), len(ref_y[0])
    dx, dy = mv[0] >> 2, mv[1] >> 2
    s = 0
    for i in range(0, 16, 2):
        sy = y0 + i
        ry = min(h - 1, max(0, sy + dy))
        srow, rrow = src_y[sy], ref_y[ry]
        for j in range(0, 16, 2):
            sx = x0 + j
            s += abs(srow[sx] - rrow[min(w - 1, max(0, sx + dx))])
    return s


def _emit_inter_residual(
    w: BitWriter, st: _FrameState, mbx: int, mby: int, qp: int,
    pred_y, levels, ch_data, cbp_c: int,
) -> None:
    """Write an inter MB's coded_block_pattern + residual blocks and
    reconstruct it (shared by the whole-MB and partitioned paths)."""
    cbp_luma = 0
    for quad in range(4):
        if any(
            any(any(row) for row in levels[4 * quad + k])
            for k in range(4)
        ):
            cbp_luma |= 1 << quad
    cbp = cbp_luma | (cbp_c << 4)
    w.ue(CBP_INTER_INV[cbp])
    if cbp:
        w.se(0)              # mb_qp_delta
    gx0, gy0 = mbx * 4, mby * 4
    for blk in range(16):
        bx, by = blk_xy(blk)
        if (cbp_luma >> (blk >> 2)) & 1:
            nc = st.nc_luma(gx0 + bx, gy0 + by)
            total = write_residual_block(w, _zigzag_flat(levels[blk]), nc)
        else:
            total = 0
        st.nnz_y[gy0 + by][gx0 + bx] = total
    _apply_inter_recon(st, mbx, mby, pred_y, levels, qp)
    _chroma_emit(w, st, ch_data, cbp_c, mbx, mby, chroma_qp(qp))


def encode_p(
    y: list[list[int]], cb: list[list[int]], cr: list[list[int]],
    ref_planes: tuple, qp: int = 26, frame_num: int = 1,
    mv_hint: tuple[int, int] = (0, 0), intra_mbs=frozenset(),
    intra_mode: str = "i16", pred_mode: int = 2, chroma_mode: int = 0,
    partition_mbs=None, poc_lsb: int | None = None, ref_idc: int = 2,
) -> tuple[bytes, tuple]:
    """Encode one P picture against ``ref_planes`` (the previous
    frame's reconstruction). Returns (slice NAL bytes, reconstructed
    planes) — in-loop reconstruction, the decoder's contractual output.

    Per MB: P_Skip when the skip-vector residual quantizes to zero,
    else P_L0_16x16 with the motion vector chosen by SAD over a small
    candidate set (the MV prediction, zero, ``mv_hint`` in quarter-pel
    units and its one-quarter-pel refinements — enough to exercise every
    fractional interpolation class); ``partition_mbs`` maps (mbx, mby)
    to "16x8" / "8x16" to force the round-13 two-partition shapes (one
    MV per partition, directional prediction); ``intra_mbs`` forces
    intra MBs (``intra_mode``: "i16" or "i4", mb_type offset +5 per
    Table 7-10)."""
    height, width = len(y), len(y[0])
    if width % 16 or height % 16:
        raise NotImplementedError("dimensions must be multiples of 16")
    if not 0 <= qp <= 51:
        raise ValueError("qp out of range")
    _shape_code = {"16x8": 1, "8x16": 2, "8x8": 3}
    part_map = {
        k: (_shape_code[v] if isinstance(v, str) else int(v))
        for k, v in dict(partition_mbs or {}).items()
    }
    if any(v not in (1, 2, 3) for v in part_map.values()):
        raise ValueError(
            "partition_mbs values must be '16x8', '8x16' or '8x8'"
        )
    st = _FrameState(width, height)
    w = BitWriter()
    w.ue(0)                  # first_mb_in_slice
    w.ue(5)                  # slice_type: P (all slices in picture)
    w.ue(0)                  # pps id
    w.u(frame_num % 16, 4)   # frame_num
    if poc_lsb is not None:  # pic_order_cnt_type 0 stream (B GOPs)
        w.u(poc_lsb % 256, 8)
    w.u(0, 1)                # num_ref_idx_active_override_flag
    w.u(0, 1)                # ref_pic_list_modification_flag_l0
    if ref_idc:
        w.u(0, 1)            # adaptive_ref_pic_marking_mode_flag
    w.se(0)                  # slice_qp_delta
    w.ue(1)                  # disable_deblocking_filter_idc: off
    skip_run = 0
    for mby in range(height // 16):
        for mbx in range(width // 16):
            levels = None
            mbt = part_map.get((mbx, mby), 0)
            if (mbx, mby) not in intra_mbs and mbt == 0:
                # skip test first: residual at the skip vector. The
                # full quantization is only worth running when the
                # subsampled SAD says the MB is near-static (a missed
                # skip only costs compression, never conformance).
                mv_skip = _mv_pred_skip(st, mbx, mby)
                if _subsad16(
                    y, ref_planes[0], mbx * 16, mby * 16, mv_skip
                ) <= 4 * (qp + 4):
                    pred_y, preds_c, levels, ch_data, cbp_c = (
                        _quantize_inter_mb(
                            st, y, cb, cr, ref_planes, mbx, mby, qp,
                            mv_skip,
                        )
                    )
                    if cbp_c == 0 and not any(
                        any(any(row) for row in lv) for lv in levels
                    ):
                        skip_run += 1
                        _apply_skip(st, ref_planes, mbx, mby)
                        continue
            w.ue(skip_run)
            skip_run = 0
            if (mbx, mby) in intra_mbs:
                _mv_paint(st, mbx * 4, mby * 4, 4, 4, None)
                if intra_mode == "i4":
                    _encode_i4x4_mb(
                        w, st, y, cb, cr, mbx, mby, qp, chroma_mode,
                        mb_type_offset=5,
                    )
                else:
                    _encode_mb(
                        w, st, y, cb, cr, mbx, mby, qp, pred_mode,
                        chroma_mode, mb_type_offset=5,
                    )
                continue
            if mbt:
                # partitioned shapes: one searched MV per (sub-)
                # partition, written as sequential mvd_l0 pairs after
                # mb_type (and, for P_8x8, the four sub_mb_type)
                if mbt == 3:
                    # rotate every sub shape through the 8x8s so the
                    # decode path sees 8x8/8x4/4x8/4x4 alike
                    sub_types = [(i + mbx + 2 * mby) % 4 for i in range(4)]
                    parts = _sub_geoms(sub_types)
                    shape = None
                else:
                    shape, parts = _P_PARTS[mbt]
                mvs, mvps = [], []
                for i, g in enumerate(parts):
                    bx0, by0 = mbx * 4 + g[4], mby * 4 + g[5]
                    mvp = _mv_pred_part(st, bx0, by0, g[6], g[7], shape, i)
                    best_mv, best_sad = None, None
                    for cand in dict.fromkeys([mvp, (0, 0), mv_hint]):
                        pr = mc_luma(
                            ref_planes[0], mbx * 16 + g[0],
                            mby * 16 + g[1], cand[0], cand[1], g[2], g[3],
                        )
                        sad = sum(
                            abs(y[mby * 16 + g[1] + ii][mbx * 16 + g[0] + jj]
                                - pr[ii][jj])
                            for ii in range(g[3])
                            for jj in range(g[2])
                        )
                        if best_sad is None or sad < best_sad:
                            best_mv, best_sad = cand, sad
                    _mv_paint(st, bx0, by0, g[6], g[7], best_mv)
                    mvs.append(best_mv)
                    mvps.append(mvp)
                w.ue(mbt)            # mb_type: 16x8 / 8x16 / P_8x8
                if mbt == 3:
                    for stype in sub_types:
                        w.ue(stype)  # sub_mb_type (7.3.5.2)
                for mv, mvp in zip(mvs, mvps):
                    w.se(mv[0] - mvp[0])
                    w.se(mv[1] - mvp[1])
                pred_y, pcb, pcr = _mc_predict_parts(
                    ref_planes, mbx, mby, parts, mvs
                )
                levels, ch_data, cbp_c = _quantize_residual(
                    st, y, cb, cr, mbx, mby, qp, pred_y, pcb, pcr
                )
                _emit_inter_residual(
                    w, st, mbx, mby, qp, pred_y, levels, ch_data, cbp_c
                )
                continue
            # motion search: rank the candidate set by the cheap
            # subsampled integer SAD, then fully interpolate only the
            # two best (the interpolated SAD decides between them) —
            # encoder effort only, conformance is untouched
            mvp = _mv_pred_16x16(st, mbx, mby)
            cands = [mvp, (0, 0), mv_hint]
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                cands.append((mv_hint[0] + dx, mv_hint[1] + dy))
            ranked = sorted(
                dict.fromkeys(cands),
                key=lambda c: _subsad16(
                    y, ref_planes[0], mbx * 16, mby * 16, c
                ),
            )
            best_mv, best_sad = None, None
            for cand in ranked[:2]:
                p = mc_luma(
                    ref_planes[0], mbx * 16, mby * 16, cand[0], cand[1]
                )
                sad = _sad16(y, p, mbx * 16, mby * 16)
                if best_sad is None or sad < best_sad:
                    best_mv, best_sad = cand, sad
                if sad == 0:
                    break
            if levels is None or best_mv != mv_skip:
                pred_y, preds_c, levels, ch_data, cbp_c = (
                    _quantize_inter_mb(
                        st, y, cb, cr, ref_planes, mbx, mby, qp, best_mv
                    )
                )
            mv = best_mv
            _mv_paint(st, mbx * 4, mby * 4, 4, 4, mv)
            w.ue(0)                  # mb_type: P_L0_16x16
            w.se(mv[0] - mvp[0])     # mvd_l0 horizontal
            w.se(mv[1] - mvp[1])     # mvd_l0 vertical
            _emit_inter_residual(
                w, st, mbx, mby, qp, pred_y, levels, ch_data, cbp_c
            )
    if skip_run:
        w.ue(skip_run)  # trailing skipped MBs (7.3.4)
    w.rbsp_trailing()
    return nal(1, w.tobytes(), ref_idc=ref_idc), (st.y, st.cb, st.cr)


def _decode_p_inter_mb(
    r: BitReader, st: _FrameState, ref_planes,
    mbx: int, mby: int, qp: int, mb_type: int,
) -> None:
    """One inter P macroblock: P_L0_16x16 (mb_type 0) or the round-13
    two-partition shapes P_L0_L0_16x8 / P_L0_L0_8x16 (1 / 2) — per-
    partition mvd_l0 in partition order (ref_idx_l0 absent with one
    active reference), directional MV prediction, assembled prediction,
    then the shared cbp/residual path."""
    if mb_type in (3, 4):
        # P_8x8 / P_8x8ref0 (identical with one reference): four
        # sub_mb_type first (7.3.5.2), then mvd_l0 per sub-partition;
        # sub-partitions use the GENERAL prediction rule (no
        # directional cases, 8.4.1.3)
        sub_types = []
        for _ in range(4):
            stype = r.ue()
            if stype > 3:
                raise ValueError(f"invalid P sub_mb_type {stype}")
            sub_types.append(stype)
        parts = _sub_geoms(sub_types)
        shape = None
    else:
        shape, parts = _P_PARTS[mb_type]
    mvs = []
    for i, g in enumerate(parts):
        bx0, by0 = mbx * 4 + g[4], mby * 4 + g[5]
        mvp = _mv_pred_part(st, bx0, by0, g[6], g[7], shape, i)
        mvd = (r.se(), r.se())
        mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
        _mv_paint(st, bx0, by0, g[6], g[7], mv)
        mvs.append(mv)
    pred_y, pcb, pcr = _mc_predict_parts(ref_planes, mbx, mby, parts, mvs)
    code_num = r.ue()
    if code_num >= len(CBP_INTER_ME):
        raise ValueError(f"bad inter coded_block_pattern codeNum {code_num}")
    cbp = CBP_INTER_ME[code_num]
    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    if cbp and r.se() != 0:
        raise NotImplementedError(
            "mb_qp_delta != 0 unsupported (the writer pins slice QP)"
        )
    gx0, gy0 = mbx * 4, mby * 4
    levels = []
    for blk in range(16):
        bx, by = blk_xy(blk)
        if (cbp_luma >> (blk >> 2)) & 1:
            nc = st.nc_luma(gx0 + bx, gy0 + by)
            flat, total = read_residual_block(r, 16, nc)
            levels.append(_unzigzag(flat))
        else:
            total = 0
            levels.append(None)
        st.nnz_y[gy0 + by][gx0 + bx] = total
    _apply_inter_recon(st, mbx, mby, pred_y, levels, qp)
    _decode_chroma(
        r, st, mbx, mby, chroma_qp(qp), 0, cbp_chroma,
        mc_preds=(pcb, pcr),
    )


def decode_p(
    slice_nal: bytes, sps: Sps, init_qp: int, ref_planes: tuple
) -> tuple[list[list[int]], list[list[int]], list[list[int]]]:
    """Decode one P coded-slice NAL against ``ref_planes`` (the
    previous decoded picture)."""
    hdr = slice_nal[0]
    if hdr & 0x1F != 1:
        raise NotImplementedError(
            f"NAL type {hdr & 0x1F} is not a non-IDR coded slice"
        )
    r = BitReader(ebsp_to_rbsp(slice_nal[1:]))
    if r.ue() != 0:
        raise NotImplementedError("multi-slice pictures unsupported")
    st_type = r.ue()
    if st_type % 5 != 0:
        raise NotImplementedError(
            f"slice_type {st_type} is not P (B/SP/SI slices are gated)"
        )
    r.ue()  # pps id
    r.u(sps.log2_max_frame_num)  # frame_num
    if sps.poc_type == 0:
        r.u(sps.log2_max_poc_lsb)  # pic_order_cnt_lsb
    if r.u(1):
        raise NotImplementedError(
            "num_ref_idx_active_override unsupported (one reference)"
        )
    if r.u(1):
        raise NotImplementedError("ref_pic_list_modification unsupported")
    if (hdr >> 5) & 3:  # nal_ref_idc != 0 -> dec_ref_pic_marking
        if r.u(1):
            raise NotImplementedError(
                "adaptive_ref_pic_marking unsupported (sliding window)"
            )
    qp = init_qp + r.se()
    idc = r.ue()
    if idc != 1:
        if idc in (0, 2):
            r.se()
            r.se()
        raise NotImplementedError(
            "in-loop deblocking unsupported (writer disables it)"
        )
    st = _FrameState(sps.width, sps.height)
    n_x = sps.width // 16
    total_mbs = n_x * (sps.height // 16)
    idx = 0
    while idx < total_mbs:
        run = r.ue()  # mb_skip_run
        if idx + run > total_mbs:
            raise ValueError("mb_skip_run past end of slice")
        for _ in range(run):
            _apply_skip(st, ref_planes, idx % n_x, idx // n_x)
            idx += 1
        if idx >= total_mbs:
            break
        mbx, mby = idx % n_x, idx // n_x
        mb_type = r.ue()
        if mb_type >= 5:  # intra MB in a P slice (Table 7-10)
            _mv_paint(st, mbx * 4, mby * 4, 4, 4, None)
            _decode_intra_mb(r, st, mbx, mby, qp, mb_type - 5)
        else:  # 0..4: inter (whole-MB, 16x8/8x16, or 8x8 sub-partitions)
            _decode_p_inter_mb(r, st, ref_planes, mbx, mby, qp, mb_type)
        idx += 1
    return st.y, st.cb, st.cr


def _bi_avg(a, b):
    """Default (unweighted) bi-prediction, 8.4.2.3.1: rounded average
    of the two list predictions, per sample."""
    return [
        [(x + y + 1) >> 1 for x, y in zip(ra, rb)]
        for ra, rb in zip(a, b)
    ]


# B_L0_16x16 / B_L1_16x16 / B_Bi_16x16 (Table 7-14): which lists carry
# a motion vector. B_Direct (0), partitions (4..21) and B_8x8 (22) are
# outside the subset; intra mb_types arrive offset by 23.
_B_LISTS = {1: (True, False), 2: (False, True), 3: (True, True)}


def encode_b(
    y: list[list[int]], cb: list[list[int]], cr: list[list[int]],
    ref0: tuple, ref1: tuple, qp: int = 26, frame_num: int = 1,
    poc_lsb: int = 1, mv_hint0: tuple[int, int] = (0, 0),
    mv_hint1: tuple[int, int] = (0, 0), intra_mbs=frozenset(),
    pred_mode: int = 2, chroma_mode: int = 0,
) -> tuple[bytes, tuple]:
    """Encode one B picture against ``ref0`` (the preceding anchor,
    list 0) and ``ref1`` (the following anchor, list 1) — a
    NON-REFERENCE picture (nal_ref_idc 0), so it never enters the DPB
    and dec_ref_pic_marking is absent. Per MB the encoder evaluates the
    best list-0 MV, the best list-1 MV and their default bi-prediction
    average, and codes whichever SAD wins (B_L0_16x16 / B_L1_16x16 /
    B_Bi_16x16); ``intra_mbs`` forces I_16x16 MBs (mb_type offset 23,
    Table 7-14). B_Skip/B_Direct and B partitions are not emitted."""
    height, width = len(y), len(y[0])
    if width % 16 or height % 16:
        raise NotImplementedError("dimensions must be multiples of 16")
    st = _FrameState(width, height)
    w = BitWriter()
    w.ue(0)                  # first_mb_in_slice
    w.ue(6)                  # slice_type: B (all slices in picture)
    w.ue(0)                  # pps id
    w.u(frame_num % 16, 4)   # frame_num
    w.u(poc_lsb % 256, 8)    # pic_order_cnt_lsb (poc_type 0)
    w.u(1, 1)                # direct_spatial_mv_pred_flag (unused: no
    #                          direct-mode MBs are emitted)
    w.u(0, 1)                # num_ref_idx_active_override_flag
    w.u(0, 1)                # ref_pic_list_modification_flag_l0
    w.u(0, 1)                # ref_pic_list_modification_flag_l1
    # nal_ref_idc == 0: no dec_ref_pic_marking
    w.se(0)                  # slice_qp_delta
    w.ue(1)                  # disable_deblocking_filter_idc: off

    def best_for(ref, hint, grid, bx0, by0):
        # same two-stage search as encode_p: rank by the cheap
        # subsampled integer SAD, fully interpolate only the two best
        mvp = _mv_pred_part(st, bx0, by0, 4, 4, grid=grid)
        cands = [mvp, (0, 0), hint]
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            cands.append((hint[0] + dx, hint[1] + dy))
        ranked = sorted(
            dict.fromkeys(cands),
            key=lambda c: _subsad16(y, ref[0], bx0 * 4, by0 * 4, c),
        )
        best = None
        for cand in ranked[:2]:
            pr = mc_luma(ref[0], bx0 * 4, by0 * 4, cand[0], cand[1])
            sad = _sad16(y, pr, bx0 * 4, by0 * 4)
            if best is None or sad < best[1]:
                best = (cand, sad, pr)
            if sad == 0:
                break
        return mvp, best

    for mby in range(height // 16):
        for mbx in range(width // 16):
            w.ue(0)  # mb_skip_run: this writer never emits B_Skip
            bx0, by0 = mbx * 4, mby * 4
            if (mbx, mby) in intra_mbs:
                _mv_paint(st, bx0, by0, 4, 4, None)
                _mv_paint(st, bx0, by0, 4, 4, None, grid=st.mv4_l1)
                _encode_mb(
                    w, st, y, cb, cr, mbx, mby, qp, pred_mode,
                    chroma_mode, mb_type_offset=23,
                )
                continue
            mvp0, (mv0, sad0, p0) = best_for(ref0, mv_hint0, None,
                                             bx0, by0)
            mvp1, (mv1, sad1, p1) = best_for(ref1, mv_hint1, st.mv4_l1,
                                             bx0, by0)
            bi = _bi_avg(p0, p1)
            sad_bi = _sad16(y, bi, mbx * 16, mby * 16)
            mode = min(
                ((sad_bi, 3), (sad0, 1), (sad1, 2)), key=lambda s: s
            )[1]
            use0, use1 = _B_LISTS[mode]
            w.ue(mode)
            if use0:
                w.se(mv0[0] - mvp0[0])
                w.se(mv0[1] - mvp0[1])
            if use1:
                w.se(mv1[0] - mvp1[0])
                w.se(mv1[1] - mvp1[1])
            _mv_paint(st, bx0, by0, 4, 4, mv0 if use0 else None)
            _mv_paint(st, bx0, by0, 4, 4, mv1 if use1 else None,
                      grid=st.mv4_l1)
            if mode == 1:
                pred_y = p0
                pcb = mc_chroma(ref0[1], mbx * 8, mby * 8, *mv0)
                pcr = mc_chroma(ref0[2], mbx * 8, mby * 8, *mv0)
            elif mode == 2:
                pred_y = p1
                pcb = mc_chroma(ref1[1], mbx * 8, mby * 8, *mv1)
                pcr = mc_chroma(ref1[2], mbx * 8, mby * 8, *mv1)
            else:
                pred_y = bi
                pcb = _bi_avg(
                    mc_chroma(ref0[1], mbx * 8, mby * 8, *mv0),
                    mc_chroma(ref1[1], mbx * 8, mby * 8, *mv1),
                )
                pcr = _bi_avg(
                    mc_chroma(ref0[2], mbx * 8, mby * 8, *mv0),
                    mc_chroma(ref1[2], mbx * 8, mby * 8, *mv1),
                )
            levels, ch_data, cbp_c = _quantize_residual(
                st, y, cb, cr, mbx, mby, qp, pred_y, pcb, pcr
            )
            _emit_inter_residual(
                w, st, mbx, mby, qp, pred_y, levels, ch_data, cbp_c
            )
    w.rbsp_trailing()
    return nal(1, w.tobytes(), ref_idc=0), (st.y, st.cb, st.cr)


def decode_b(
    slice_nal: bytes, sps: Sps, init_qp: int, ref0: tuple, ref1: tuple
) -> tuple:
    """Decode one B coded-slice NAL against its two anchors (list 0 =
    preceding, list 1 = following in output order)."""
    hdr = slice_nal[0]
    if hdr & 0x1F != 1:
        raise NotImplementedError(
            f"NAL type {hdr & 0x1F} is not a non-IDR coded slice"
        )
    r = BitReader(ebsp_to_rbsp(slice_nal[1:]))
    if r.ue() != 0:
        raise NotImplementedError("multi-slice pictures unsupported")
    st_type = r.ue()
    if st_type % 5 != 1:
        raise NotImplementedError(f"slice_type {st_type} is not B")
    r.ue()  # pps id
    r.u(sps.log2_max_frame_num)  # frame_num
    if sps.poc_type == 0:
        r.u(sps.log2_max_poc_lsb)  # pic_order_cnt_lsb
    r.u(1)  # direct_spatial_mv_pred_flag (no direct MBs in the subset)
    if r.u(1):
        raise NotImplementedError(
            "num_ref_idx_active_override unsupported (one ref per list)"
        )
    if r.u(1) or r.u(1):
        raise NotImplementedError("ref_pic_list_modification unsupported")
    if (hdr >> 5) & 3:
        raise NotImplementedError(
            "reference B pictures unsupported (writer emits ref_idc 0)"
        )
    qp = init_qp + r.se()
    idc = r.ue()
    if idc != 1:
        if idc in (0, 2):
            r.se()
            r.se()
        raise NotImplementedError("in-loop deblocking unsupported")
    st = _FrameState(sps.width, sps.height)
    n_x = sps.width // 16
    total_mbs = n_x * (sps.height // 16)
    for idx in range(total_mbs):
        run = r.ue()  # mb_skip_run
        if run:
            raise NotImplementedError(
                "B_Skip uses direct-mode prediction: outside the subset"
            )
        mbx, mby = idx % n_x, idx // n_x
        bx0, by0 = mbx * 4, mby * 4
        mb_type = r.ue()
        if mb_type >= 23:  # intra MB in a B slice (Table 7-14)
            _mv_paint(st, bx0, by0, 4, 4, None)
            _mv_paint(st, bx0, by0, 4, 4, None, grid=st.mv4_l1)
            _decode_intra_mb(r, st, mbx, mby, qp, mb_type - 23)
            continue
        if mb_type not in _B_LISTS:
            raise NotImplementedError(
                f"B mb_type {mb_type}: direct mode / partitions are "
                "outside the subset"
            )
        use0, use1 = _B_LISTS[mb_type]
        mv0 = mv1 = None
        if use0:
            mvp = _mv_pred_part(st, bx0, by0, 4, 4)
            mvd = (r.se(), r.se())
            mv0 = (mvp[0] + mvd[0], mvp[1] + mvd[1])
        if use1:
            mvp = _mv_pred_part(st, bx0, by0, 4, 4, grid=st.mv4_l1)
            mvd = (r.se(), r.se())
            mv1 = (mvp[0] + mvd[0], mvp[1] + mvd[1])
        _mv_paint(st, bx0, by0, 4, 4, mv0)
        _mv_paint(st, bx0, by0, 4, 4, mv1, grid=st.mv4_l1)
        if use0 and use1:
            pred_y = _bi_avg(
                mc_luma(ref0[0], mbx * 16, mby * 16, *mv0),
                mc_luma(ref1[0], mbx * 16, mby * 16, *mv1),
            )
            pcb = _bi_avg(
                mc_chroma(ref0[1], mbx * 8, mby * 8, *mv0),
                mc_chroma(ref1[1], mbx * 8, mby * 8, *mv1),
            )
            pcr = _bi_avg(
                mc_chroma(ref0[2], mbx * 8, mby * 8, *mv0),
                mc_chroma(ref1[2], mbx * 8, mby * 8, *mv1),
            )
        else:
            ref, mv = (ref0, mv0) if use0 else (ref1, mv1)
            pred_y = mc_luma(ref[0], mbx * 16, mby * 16, *mv)
            pcb = mc_chroma(ref[1], mbx * 8, mby * 8, *mv)
            pcr = mc_chroma(ref[2], mbx * 8, mby * 8, *mv)
        code_num = r.ue()
        if code_num >= len(CBP_INTER_ME):
            raise ValueError(
                f"bad inter coded_block_pattern codeNum {code_num}"
            )
        cbp = CBP_INTER_ME[code_num]
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp and r.se() != 0:
            raise NotImplementedError("mb_qp_delta != 0 unsupported")
        gx0, gy0 = mbx * 4, mby * 4
        levels = []
        for blk in range(16):
            bx, by = blk_xy(blk)
            if (cbp_luma >> (blk >> 2)) & 1:
                nc = st.nc_luma(gx0 + bx, gy0 + by)
                flat, total = read_residual_block(r, 16, nc)
                levels.append(_unzigzag(flat))
            else:
                total = 0
                levels.append(None)
            st.nnz_y[gy0 + by][gx0 + bx] = total
        _apply_inter_recon(st, mbx, mby, pred_y, levels, qp)
        _decode_chroma(
            r, st, mbx, mby, chroma_qp(qp), 0, cbp_chroma,
            mc_preds=(pcb, pcr),
        )
    return st.y, st.cb, st.cr


def slice_kind(slice_nal: bytes, sps: Sps) -> str:
    """Peek a coded slice's type: 'I', 'P' or 'B' (7.4.3)."""
    ntype = slice_nal[0] & 0x1F
    if ntype == 5:
        return "I"
    if ntype != 1:
        raise NotImplementedError(f"NAL type {ntype} is not a coded slice")
    r = BitReader(ebsp_to_rbsp(slice_nal[1:33]))
    r.ue()  # first_mb_in_slice
    return {0: "P", 1: "B", 2: "I"}.get(
        r.ue() % 5, "?"
    )


def decode_frame(
    slice_nal: bytes, sps: Sps, init_qp: int, ref_planes=None,
    ref_next=None,
) -> tuple:
    """Dispatch one coded-slice NAL: IDR (type 5) decodes standalone; a
    P slice requires ``ref_planes`` (the previous anchor); a B slice
    additionally requires ``ref_next`` (the following anchor, list
    1)."""
    ntype = slice_nal[0] & 0x1F
    if ntype == 5:
        return decode_idr(slice_nal, sps, init_qp)
    if ntype == 1:
        if ref_planes is None:
            raise ValueError(
                "non-IDR slice needs the previous decoded picture"
            )
        if slice_kind(slice_nal, sps) == "B":
            if ref_next is None:
                raise ValueError(
                    "B slice needs the following anchor picture too"
                )
            return decode_b(slice_nal, sps, init_qp, ref_planes, ref_next)
        return decode_p(slice_nal, sps, init_qp, ref_planes)
    raise NotImplementedError(f"NAL type {ntype} is not a coded slice")


# ---------------------------------------------------------------------------
# avcC extradata (ISO/IEC 14496-15)


def build_avcc(sps_rbsp: bytes, pps_rbsp: bytes) -> bytes:
    sps_n = rbsp_to_ebsp(sps_rbsp)
    pps_n = rbsp_to_ebsp(pps_rbsp)
    sps_nal = bytes([0x67]) + sps_n
    pps_nal = bytes([0x68]) + pps_n
    return (
        bytes([1, sps_rbsp[0], sps_rbsp[1], sps_rbsp[2], 0xFF, 0xE1])
        + struct.pack(">H", len(sps_nal)) + sps_nal
        + bytes([1])
        + struct.pack(">H", len(pps_nal)) + pps_nal
    )


def parse_avcc(avcc: bytes) -> tuple[Sps, dict]:
    if len(avcc) < 7 or avcc[0] != 1:
        raise ValueError("bad avcC record")
    n_sps = avcc[5] & 0x1F
    pos = 6
    sps = None
    for _ in range(n_sps):
        ln = struct.unpack_from(">H", avcc, pos)[0]
        pos += 2
        sps = parse_sps(ebsp_to_rbsp(avcc[pos + 1 : pos + ln]))
        pos += ln
    n_pps = avcc[pos]
    pos += 1
    pps = None
    for _ in range(n_pps):
        ln = struct.unpack_from(">H", avcc, pos)[0]
        pos += 2
        pps = parse_pps(ebsp_to_rbsp(avcc[pos + 1 : pos + ln]))
        pos += ln
    if sps is None or pps is None:
        raise ValueError("avcC missing SPS or PPS")
    return sps, pps


def split_avcc_sample(sample: bytes, length_size: int = 4) -> list[bytes]:
    """AVCC length-prefixed sample -> list of NAL units."""
    out = []
    pos = 0
    while pos + length_size <= len(sample):
        ln = int.from_bytes(sample[pos : pos + length_size], "big")
        pos += length_size
        if pos + ln > len(sample):
            raise ValueError("AVCC NAL length past sample end")
        out.append(sample[pos : pos + ln])
        pos += ln
    return out
