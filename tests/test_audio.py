"""WAV codec round-trips + audio feature semantics."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cassandra_spark.operators.audio import (
    decode_wav,
    encode_wav,
    is_wav,
    _features,
)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_roundtrip_mono(bits):
    rng = np.random.default_rng(7)
    lim = 120 if bits == 8 else (1 << (bits - 2))
    samples = rng.integers(-lim, lim, size=500, dtype=np.int64)
    payload = encode_wav(samples, rate=8000, bits=bits)
    rate, ch, b, out = decode_wav(payload)
    assert (rate, ch, b) == (8000, 1, bits)
    assert np.array_equal(out[:, 0], samples)


def test_roundtrip_stereo_16():
    rng = np.random.default_rng(11)
    samples = rng.integers(-30000, 30000, size=(300, 2), dtype=np.int64)
    payload = encode_wav(samples, rate=44100, bits=16)
    rate, ch, b, out = decode_wav(payload)
    assert (rate, ch, b) == (44100, 2, 16)
    assert np.array_equal(out, samples)


def test_decoder_walks_extra_chunks():
    """fmt/data may be preceded by LIST/INFO chunks; the walker must skip
    them (and honor word alignment for odd-sized chunks)."""
    samples = np.array([100, -100, 50], dtype=np.int64)
    base = encode_wav(samples, rate=8000, bits=16)
    # splice an odd-sized LIST chunk right after the WAVE tag
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = base[:12] + extra + base[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, ch, bits, out = decode_wav(spliced)
    assert np.array_equal(out[:, 0], samples)


def test_decode_rejects_non_wav():
    assert not is_wav(b"not a wav")
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"JUNKJUNKJUNKJUNK")
    # RIFF/WAVE but non-PCM format tag
    samples = np.array([1, 2], dtype=np.int64)
    payload = bytearray(encode_wav(samples, 8000, 16))
    fmt_off = payload.index(b"fmt ") + 8
    struct.pack_into("<H", payload, fmt_off, 3)  # IEEE float tag
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bytes(payload))


def test_features_square_wave():
    # +A for h samples, -A/2 for h samples, repeating
    a, h, n = 1000, 10, 100
    i = np.arange(n)
    samples = np.where((i // h) % 2 == 0, a, -(a >> 1)).astype(np.int64)
    rate, ch, bits, n_s, dur, peak, sumsq, rms, zc = _features(
        16000, 1, 16, samples[:, None]
    )
    assert (n_s, peak) == (100, 1000)
    assert zc == (n - 1) // h
    n_pos = (n // (2 * h)) * h + min(n % (2 * h), h)
    assert sumsq == n_pos * a * a + (n - n_pos) * (a // 2) * (a // 2)
    assert rms == float(np.sqrt(sumsq / n))


def test_features_empty_and_silence():
    assert _features(8000, 1, 16, np.zeros((0, 1), dtype=np.int64))[4] == 0
    r = _features(8000, 1, 16, np.zeros((50, 1), dtype=np.int64))
    assert r[5] == 0 and r[7] == 0.0 and r[8] == 0  # peak, rms, crossings


def test_g711_expansion_properties():
    """mu-law/A-law decode tables: correct extremes, odd symmetry, and
    monotone magnitude growth within each sign half."""
    import numpy as np

    from cassandra_spark.operators.audio import _ALAW_TABLE, _ULAW_TABLE

    # mu-law: 0xFF is +0, 0x7F is -0, 0x80 is the negative extreme
    # (-32124), 0x00 decodes to -32124's positive twin at byte 0x80^0x80
    assert _ULAW_TABLE[0xFF] == 0
    assert _ULAW_TABLE[0x7F] == 0
    assert _ULAW_TABLE[0x00] == -32124
    assert _ULAW_TABLE[0x80] == 32124
    # odd symmetry: byte b and b^0x80 are negatives of each other
    b = np.arange(256)
    assert (_ULAW_TABLE[b] == -_ULAW_TABLE[b ^ 0x80]).all()
    assert (_ALAW_TABLE[b] == -_ALAW_TABLE[b ^ 0x80]).all()
    # A-law extremes (+-32256 convention)
    assert int(np.abs(_ALAW_TABLE).max()) == 32256
    # magnitudes grow monotonically along each chord
    mags = _ULAW_TABLE[np.arange(0x7F, -1, -1)]  # negative half reversed
    assert (np.diff(-mags) >= 0).all()


def test_wav_g711_roundtrip_through_decoder():
    """A hand-built mu-law/A-law WAV decodes through the normal RIFF walk
    with the table-expanded samples."""
    import struct

    import numpy as np

    from cassandra_spark.operators.audio import (
        _ALAW_TABLE,
        _ULAW_TABLE,
        decode_wav,
    )

    def wav(tag: int, payload: bytes) -> bytes:
        fmt = struct.pack("<HHIIHH", tag, 1, 8000, 8000, 1, 8)
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    raw = bytes(range(0, 256, 8))
    for tag, table in ((7, _ULAW_TABLE), (6, _ALAW_TABLE)):
        rate, ch, bits, samples = decode_wav(wav(tag, raw))
        # bits = decoded amplitude width (16), not the 8-bit storage
        assert (rate, ch, bits) == (8000, 1, 16)
        assert (samples[:, 0] == table[np.frombuffer(raw, np.uint8)]).all()


# --- IMA ADPCM (round 8) ----------------------------------------------------


def test_ima_adpcm_roundtrip_tracks_signal():
    import numpy as np

    from cassandra_spark.operators.audio import (
        decode_ima_adpcm,
        encode_ima_adpcm,
    )

    n = 2400
    t = np.arange(n)
    # slow ramp + square: the adaptive quantizer must track both
    sig = (t * 13 % 2000 - 1000) + np.where(t % 50 < 25, 800, -800)
    raw = encode_ima_adpcm(sig, block_align=256)
    dec = decode_ima_adpcm(raw, 256)[:, 0]
    assert dec[0] == sig[0], "block header carries the exact first sample"
    assert len(dec) >= n
    err = np.abs(dec[:n].astype(np.int64) - sig)
    # lossy: transient slope-overload at the square flips is expected;
    # the quantizer must stay LOCKED on average
    assert int(err.max()) < 4000 and float(err.mean()) < 300
    # bit-deterministic
    assert decode_ima_adpcm(raw, 256)[:, 0].tolist() == dec.tolist()


def test_ima_adpcm_wav_container_roundtrip():
    import numpy as np

    from cassandra_spark.operators.audio import (
        decode_wav,
        encode_wav_ima_adpcm,
    )

    sig = (np.arange(1500) * 7 % 1024) - 512
    wav = encode_wav_ima_adpcm(sig, rate=8000, block_align=256)
    rate, channels, bits, samples = decode_wav(wav)
    assert (rate, channels, bits) == (8000, 1, 16)
    assert samples.shape[1] == 1
    err = np.abs(samples[: len(sig), 0].astype(np.int64) - sig)
    assert int(err.max()) < 1200


def test_ima_adpcm_stereo_roundtrip_and_bad_index_rejected():
    import numpy as np
    import pytest as _pytest

    from cassandra_spark.operators.audio import (
        decode_ima_adpcm,
        decode_wav,
        encode_wav_ima_adpcm,
    )

    n = 1200
    t = np.arange(n)
    left = (t * 11 % 1600) - 800
    right = np.where(t % 40 < 20, 500, -500)
    sig = np.stack([left, right], axis=1)
    wav = encode_wav_ima_adpcm(sig, rate=8000, block_align=256)
    rate, channels, bits, samples = decode_wav(wav)
    assert (rate, channels, bits) == (8000, 2, 16)
    # channels must not cross-contaminate: each tracks ITS OWN signal
    for c in range(2):
        err = np.abs(samples[:n, c].astype(np.int64) - sig[:, c])
        assert int(err.max()) < 2500 and float(err.mean()) < 300, c
    assert samples[0, 0] == left[0] and samples[0, 1] == right[0]
    with _pytest.raises(ValueError, match="step index"):
        decode_ima_adpcm(b"\x00\x00\x59\x00" + b"\x00" * 4, 8)


def test_ima_adpcm_flows_through_extract_audio(spark):
    import numpy as np

    from cassandra_spark.operators.audio import (
        encode_wav_ima_adpcm,
        extract_audio,
    )

    sig = np.where(np.arange(800) % 8 < 4, 900, -900)
    payload = encode_wav_ima_adpcm(sig, rate=4000, block_align=132)
    docs = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    row = extract_audio(docs).collect()[0]
    assert row.sample_rate == 4000 and row.n_channels == 1
    assert row.bits == 16
    assert row.n_samples >= 800
    # ±900 square: ADPCM overshoots transiently at flips, never wildly
    assert 0 < row.peak <= 2500
