"""L-tier audio modality: real WAV (RIFF PCM) decode + feature extraction
as Arrow-batched mapInPandas stages. SURVEY.md §2.12 (multimodal columns).

The audio column is the same blob-carrier pattern as images: ``payload:
binary`` + typed metadata. Decode is REAL — :func:`decode_wav` walks the
RIFF chunk tree and parses PCM samples (8-bit unsigned, 16/24/32-bit
signed little-endian, any channel count) with numpy; no codec library
involved, so nothing is stubbed.

Cross-engine oracle design (l19): the synthesized fixture corpus is a
two-level SQUARE wave — integer samples, no transcendentals — so every
feature the decoder computes (peak, zero crossings, RMS via an exact
integer sum-of-squares) has a CLOSED-FORM integer formula the DuckDB
oracle evaluates independently. sqrt and int64→double are correctly
rounded in IEEE-754, which makes even the RMS double bit-exact across
engines — unlike sin/exp waveforms, where JVM-vs-libm last-ulp drift
would poison a value-hash compare.

Scale posture: payloads stream through mapInPandas one Arrow batch at a
time; features project out before any shuffle; the per-doc feature table
is what aggregates downstream — at 100 TB the raw audio bytes are read
once and never shuffled.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_spark.catalog import Catalog
from cassandra_spark.registry import query

# ---------------------------------------------------------------------------
# WAV codec (pure stdlib/numpy)
# ---------------------------------------------------------------------------


def encode_wav(
    samples: np.ndarray, rate: int = 16000, bits: int = 16
) -> bytes:
    """Minimal RIFF/WAVE PCM writer. ``samples`` is (n,) mono or
    (n, channels); 8-bit is written unsigned (offset-128), wider widths
    signed little-endian."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    bytes_per = bits // 8
    if bits == 8:
        raw = (arr.astype(np.int16) + 128).clip(0, 255).astype(np.uint8).tobytes()
    elif bits == 16:
        raw = arr.astype("<i2").tobytes()
    elif bits == 24:
        as32 = arr.astype("<i4")
        b = as32.view(np.uint8).reshape(n * channels, 4)
        raw = b[:, :3].tobytes()  # little-endian: low 3 bytes
    elif bits == 32:
        raw = arr.astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    byte_rate = rate * channels * bytes_per
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, byte_rate, channels * bytes_per, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_ima_adpcm(
    samples: np.ndarray, rate: int = 16000, block_align: int = 512
) -> bytes:
    """(n,) mono or (n, channels) samples -> RIFF/WAVE with IMA ADPCM
    (format tag 0x11) data — the decoder's round-trip fixture, fmt chunk
    per the public spec (cbSize=2 extension carrying samples-per-block)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    raw = encode_ima_adpcm(arr, block_align)
    spb = 1 + (block_align - 4 * channels) // (4 * channels) * 8
    byte_rate = (rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, channels, rate, byte_rate, block_align, 4, 2, spb
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def is_wav(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def _g711_ulaw_table() -> "np.ndarray":
    """G.711 mu-law byte -> 16-bit linear (the classic +-32124 expansion:
    complement, 3-bit exponent, 4-bit mantissa, 0x84 bias)."""
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        out[b] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    return out


def _g711_alaw_table() -> "np.ndarray":
    """G.711 A-law byte -> 16-bit linear (+-32256: XOR 0x55, segmented
    expansion)."""
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[b] = t if (a & 0x80) else -t
    return out


_ULAW_TABLE = _g711_ulaw_table()
_ALAW_TABLE = _g711_alaw_table()


# --- IMA/DVI ADPCM (WAV format tag 0x11) -------------------------------------
#
# 4-bit adaptive differential PCM per the public IMA ADPCM spec (the
# 'DVI4'/WAV-0x11 profile): per block, a 4-byte state header (int16
# predictor + step index) then two samples per byte, each nibble decoded
# against an 89-entry step table with exact integer arithmetic — so
# decode is bit-deterministic and the repo's own encoder round-trips it.
# Pure-Python per-block loop (the codec is a sequential state machine);
# ADPCM payloads appear only in dedicated tests/probe paths, never in
# l19's Arrow-batched PCM hot path.

_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _ima_step_nibble(pred: int, index: int, nib: int) -> tuple[int, int]:
    """One IMA decode step: (predictor, index) -> next state."""
    step = _IMA_STEP[index]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX[nib & 7]))
    return pred, index


def decode_ima_adpcm(
    data: bytes, block_align: int, channels: int = 1
) -> np.ndarray:
    """IMA ADPCM block stream -> (n, channels) int32 samples. Per block:
    one 4-byte state header per channel, then data in channel-interleaved
    4-byte groups (8 nibbles of one channel per group) — the WAV-0x11
    multichannel layout."""
    if channels < 1:
        raise ValueError("channels must be >= 1")
    chans: list[list[int]] = [[] for _ in range(channels)]
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        if len(block) < 4 * channels:
            break
        preds: list[int] = []
        idxs: list[int] = []
        for c in range(channels):
            pred = struct.unpack_from("<h", block, 4 * c)[0]
            index = block[4 * c + 2]
            if index > 88:
                raise ValueError(
                    f"IMA ADPCM step index {index} out of range"
                )
            preds.append(pred)
            idxs.append(index)
            chans[c].append(pred)
        pos = 4 * channels
        while pos + 4 * channels <= len(block):
            for c in range(channels):
                for byte in block[pos + 4 * c : pos + 4 * c + 4]:
                    for nib in (byte & 0x0F, byte >> 4):
                        preds[c], idxs[c] = _ima_step_nibble(
                            preds[c], idxs[c], nib
                        )
                        chans[c].append(preds[c])
            pos += 4 * channels
    n = min(len(ch) for ch in chans)
    return np.stack(
        [np.asarray(ch[:n], dtype=np.int32) for ch in chans], axis=1
    )


def _ima_quantize(pred: int, index: int, sample: int) -> tuple[int, int, int]:
    """Encoder side: choose the nibble for ``sample`` and advance state
    with the decoder's own step (so decode(encode(x)) is deterministic)."""
    step = _IMA_STEP[index]
    delta = sample - pred
    nib = 0
    if delta < 0:
        nib = 8
        delta = -delta
    if delta >= step:
        nib |= 4
        delta -= step
    if delta >= step >> 1:
        nib |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nib |= 1
    pred, index = _ima_step_nibble(pred, index, nib)
    return nib, pred, index


def encode_ima_adpcm(
    samples: "np.ndarray", block_align: int = 512
) -> bytes:
    """(n,) mono or (n, channels) int samples -> IMA ADPCM block stream
    (per-channel headers + channel-interleaved 4-byte groups)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    s = np.clip(s, -32768, 32767)
    n, channels = s.shape
    if (block_align - 4 * channels) % (4 * channels):
        raise ValueError(
            "block_align must leave a multiple of 4 bytes per channel"
        )
    groups = (block_align - 4 * channels) // (4 * channels)
    per_block = 1 + groups * 8  # samples per channel per block
    blocks: list[bytes] = []
    idxs = [0] * channels
    for b0 in range(0, n, per_block):
        chunk = s[b0 : b0 + per_block]
        preds = [int(chunk[0, c]) for c in range(channels)]
        hdr = b"".join(
            struct.pack("<hBB", preds[c], idxs[c], 0)
            for c in range(channels)
        )
        # per channel: quantize its samples (zero-delta padding fills
        # the final partial block so the byte grid stays exact)
        nibs: list[list[int]] = []
        for c in range(channels):
            col: list[int] = []
            for r in range(1, len(chunk)):
                nib, preds[c], idxs[c] = _ima_quantize(
                    preds[c], idxs[c], int(chunk[r, c])
                )
                col.append(nib)
            while len(col) < groups * 8:
                nib, preds[c], idxs[c] = _ima_quantize(
                    preds[c], idxs[c], preds[c]
                )
                col.append(nib)
            nibs.append(col)
        body = bytearray()
        for g in range(groups):
            for c in range(channels):
                seg = nibs[c][g * 8 : g * 8 + 8]
                body += bytes(
                    (seg[i] & 0x0F) | (seg[i + 1] << 4)
                    for i in range(0, 8, 2)
                )
        blocks.append(hdr + bytes(body))
    return b"".join(blocks)


def decode_wav(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a RIFF/WAVE payload → (rate, channels, bits, samples) with
    ``samples`` (n, channels) int32 (8-bit PCM re-centered to signed).
    Walks the chunk tree (fmt may be preceded by LIST/INFO etc.), accepts
    linear PCM (format tag 1) at 8/16/24/32 bits plus the G.711
    companded telephony formats — mu-law (tag 7) and A-law (tag 6) —
    expanded to 16-bit linear via the standard tables."""
    if not is_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _, block_align, bits = fmt
    if tag == 0x11:  # IMA/DVI ADPCM: 4-bit adaptive differential
        arr = decode_ima_adpcm(data, block_align, channels)
        # decoded amplitude is 16-bit linear (the 4 is storage width)
        return rate, channels, 16, arr
    if tag in (6, 7):  # G.711 A-law / mu-law: 8-bit companded storage
        table = _ULAW_TABLE if tag == 7 else _ALAW_TABLE
        arr = table[np.frombuffer(data, dtype=np.uint8)].astype(np.int32)
        n = (len(arr) // channels) * channels
        # bits reports the DECODED amplitude width (16), not the stored
        # byte width: consumers scale peak/RMS by 2^(bits-1), and the
        # expanded samples span +-32k — reporting 8 would mis-scale 256x
        return rate, channels, 16, arr[:n].reshape(-1, channels)
    if tag != 1:
        raise ValueError(
            f"unsupported WAV format tag {tag} "
            "(PCM/mu-law/A-law/IMA-ADPCM only)"
        )
    if bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.int32)
    elif bits == 24:
        b = np.frombuffer(data, dtype=np.uint8)
        b = b[: (len(b) // 3) * 3].reshape(-1, 3)
        arr = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        arr = np.where(arr >= 1 << 23, arr - (1 << 24), arr)
    elif bits == 32:
        arr = np.frombuffer(data, dtype="<i4").astype(np.int32)
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n = (len(arr) // channels) * channels
    return rate, channels, bits, arr[:n].reshape(-1, channels)


# ---------------------------------------------------------------------------
# Feature extraction (mapInPandas)
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate int, n_channels int, bits int, "
    "n_samples bigint, duration_ms bigint, peak int, sumsq bigint, "
    "rms double, zero_crossings bigint"
)
_AUDIO_COLS = [
    "doc_id", "sample_rate", "n_channels", "bits", "n_samples",
    "duration_ms", "peak", "sumsq", "rms", "zero_crossings",
]


def _features(rate: int, channels: int, bits: int, samples: np.ndarray):
    mono = samples[:, 0].astype(np.int64)  # features over channel 0
    n = len(mono)
    sumsq = int((mono * mono).sum())
    rms = float(np.sqrt(np.float64(sumsq) / n)) if n else 0.0
    sign = np.sign(mono)
    nz = sign != 0
    s = sign[nz]
    zc = int((s[1:] != s[:-1]).sum()) if len(s) > 1 else 0
    return (
        rate, channels, bits, n, n * 1000 // rate,
        int(np.abs(mono).max()) if n else 0, sumsq, rms, zc,
    )


def extract_audio(docs: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode + featurize a WAV payload column: duration, peak, exact
    sum-of-squares, RMS, zero-crossing count. Undecodable payloads raise —
    audio decode has no stub path (the codec is self-contained)."""

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, ch, bits, samples = decode_wav(bytes(payload))
                rows.append((doc_id, *_features(rate, ch, bits, samples)))
            yield pd.DataFrame(rows, columns=_AUDIO_COLS)

    src = docs.select(
        F.col("doc_id"), F.col(payload_col).cast("binary").alias("payload")
    )
    return src.mapInPandas(run, AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# Fixture synthesis + the registered query
# ---------------------------------------------------------------------------

_RATE = 16000
_A2_SHIFT = 1  # negative half-wave amplitude = A >> 1


def _wave_params(doc_id: int) -> tuple[int, int, int]:
    """(amplitude, half_period, n_samples) — all integer functions of the
    key, mirrored literally in the oracle SQL."""
    a = 1000 + doc_id % 100
    h = 20 + doc_id % 13
    n = 2000 + (doc_id % 7) * 400
    return a, h, n


def synth_wav_batch(
    pdfs: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic fixture synthesizer: two-level square wave — segments
    of ``h`` samples alternating +A and -(A>>1). Integer samples only."""
    for pdf in pdfs:
        rows = []
        for doc_id in pdf["doc_id"]:
            a, h, n = _wave_params(int(doc_id))
            i = np.arange(n)
            pos = (i // h) % 2 == 0
            samples = np.where(pos, a, -(a >> 1)).astype(np.int16)
            rows.append((int(doc_id), encode_wav(samples, _RATE, 16)))
        yield pd.DataFrame(rows, columns=["doc_id", "payload"])


@query(
    "l19_audio",
    oracle=f"""
    WITH params AS (
      SELECT doc_id,
             1000 + doc_id % 100 AS a,
             20 + doc_id % 13 AS h,
             2000 + (doc_id % 7) * 400 AS n
      FROM documents WHERE doc_id % 10 = 4
    ), derived AS (
      SELECT doc_id, a, h, n,
             -- samples in +A segments: full 2h pairs + leading remainder
             (n // (2*h)) * h +
               CASE WHEN n % (2*h) < h THEN n % (2*h) ELSE h END AS n_pos
      FROM params
    )
    SELECT doc_id,
           {_RATE} AS sample_rate,
           1 AS n_channels,
           16 AS bits,
           CAST(n AS BIGINT) AS n_samples,
           CAST(n * 1000 // {_RATE} AS BIGINT) AS duration_ms,
           CAST(a AS INTEGER) AS peak,
           CAST(n_pos * a * a + (n - n_pos) * (a // 2) * (a // 2)
                AS BIGINT) AS sumsq,
           sqrt(CAST(n_pos * a * a + (n - n_pos) * (a // 2) * (a // 2)
                     AS DOUBLE) / n) AS rms,
           CAST((n - 1) // h AS BIGINT) AS zero_crossings
    FROM derived
    """,
)
def l19_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode + features over a synthesized WAV corpus: Spark
    round-trips REAL RIFF bytes (synth → encode → decode → featurize, all
    executor-side); the oracle re-derives every feature from the closed-form
    integer wave algebra — agreement proves the codec and the features."""
    cat = Catalog(spark, sf_dir)
    keys = cat.documents.filter(F.col("doc_id") % 10 == 4).select("doc_id")
    wavs = keys.mapInPandas(synth_wav_batch, "doc_id bigint, payload binary")
    return extract_audio(wavs)
