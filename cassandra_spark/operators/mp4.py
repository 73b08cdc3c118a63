"""ISO-BMFF (MP4 / QuickTime MOV) demux for the L4 multimodal tier.

Round 7 closes the "compressed video container" gate as far as an
offline pure-Python engine honestly can: the CONTAINER is parsed for
real — box tree, track headers, sample tables (stsd/stts/stsc/stsz/
stco|co64) — so geometry, timing, codec identity, and per-sample byte
ranges come from the actual file, and MJPEG video tracks (sample entry
``jpeg``/``mjpa``/``mjpb``) decode to RGB through the repo's complete
T.81 JPEG codec. Inter-coded codecs (avc1/H.264, hev1/HEVC, vp09…)
demux with REAL metadata but their bitstreams stay undecodable here —
``sample_frames`` degrades those to the stub only under ``allow_stub``
(an H.264 entropy/prediction stack is out of scope for this container,
and SURVEY §2.12 documents it as the one remaining codec gap).

A writer (`encode_mp4_mjpeg`) produces a minimal valid single-track
MJPEG MP4, so the demuxer is round-trip-tested without external
samples — the same self-validation contract as the AVI/Y4M codecs.

Worker-safe pure functions over bytes (the codecs.py contract).
Box layout per ISO/IEC 14496-12 [public spec, transcribed clean-room].
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


@dataclass
class Mp4Stream:
    width: int
    height: int
    codec: str           # stsd sample-entry fourcc, e.g. 'jpeg', 'avc1'
    timescale: int       # mdhd ticks/second
    durations: list[int]  # per-sample ticks (expanded stts)
    frames: list[bytes]  # raw sample bytes (mdat slices)

    @property
    def duration_ms(self) -> float:
        return sum(self.durations) * 1000.0 / self.timescale

    @property
    def frame_ms(self) -> float:
        n = max(1, len(self.frames))
        return max(1.0, self.duration_ms / n)


def _boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [pos, end)."""
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # to end of enclosing container
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"bad box size for {fourcc!r}")
        yield fourcc, body, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, fourcc: bytes):
    for fc, b, e in _boxes(data, pos, end):
        if fc == fourcc:
            return b, e
    return None


def _fullbox(data: bytes, body: int) -> tuple[int, int]:
    """(version, payload start) of a FullBox."""
    return data[body], body + 4


def _parse_stbl(data: bytes, b: int, e: int) -> dict:
    out: dict = {}
    for fc, bb, ee in _boxes(data, b, e):
        if fc == b"stsd":
            _, p = _fullbox(data, bb)
            n = struct.unpack_from(">I", data, p)[0]
            if n < 1:
                raise ValueError("empty stsd")
            entry = p + 4
            out["codec"] = data[entry + 4 : entry + 8].decode(
                "ascii", "replace"
            )
            # VideoSampleEntry geometry (width/height @ offset 24/26
            # into the sample entry, past the 8-byte box header +
            # 6 reserved + 2 data_reference_index + 16 predefined)
            if ee - entry >= 36:
                w, h = struct.unpack_from(">HH", data, entry + 32)
                if w and h:
                    out.setdefault("width", w)
                    out.setdefault("height", h)
        elif fc == b"stts":
            _, p = _fullbox(data, bb)
            n = struct.unpack_from(">I", data, p)[0]
            runs = []
            for i in range(n):
                cnt, delta = struct.unpack_from(">II", data, p + 4 + 8 * i)
                runs.extend([delta] * cnt)
            out["durations"] = runs
        elif fc == b"stsc":
            _, p = _fullbox(data, bb)
            n = struct.unpack_from(">I", data, p)[0]
            out["stsc"] = [
                struct.unpack_from(">III", data, p + 4 + 12 * i)
                for i in range(n)
            ]
        elif fc == b"stsz":
            _, p = _fullbox(data, bb)
            fixed, n = struct.unpack_from(">II", data, p)
            out["sizes"] = (
                [fixed] * n
                if fixed
                else [
                    struct.unpack_from(">I", data, p + 8 + 4 * i)[0]
                    for i in range(n)
                ]
            )
        elif fc == b"stco":
            _, p = _fullbox(data, bb)
            n = struct.unpack_from(">I", data, p)[0]
            out["chunks"] = [
                struct.unpack_from(">I", data, p + 4 + 4 * i)[0]
                for i in range(n)
            ]
        elif fc == b"co64":
            _, p = _fullbox(data, bb)
            n = struct.unpack_from(">I", data, p)[0]
            out["chunks"] = [
                struct.unpack_from(">Q", data, p + 4 + 8 * i)[0]
                for i in range(n)
            ]
    return out


def demux_mp4(data: bytes) -> Mp4Stream:
    """Parse the box tree and return the FIRST video ('vide' handler)
    track's geometry, timing, codec, and raw samples. Raises ValueError
    on malformed containers or when no video track exists."""
    if not is_mp4(data):
        raise ValueError("not an ISO-BMFF (ftyp) payload")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    for fc, b, e in _boxes(data, *moov):
        if fc != b"trak":
            continue
        info: dict = {}
        tk = _find(data, b, e, b"tkhd")
        if tk:
            ver, p = _fullbox(data, tk[0])
            # width/height: fixed 16.16 at the tail of tkhd — after the
            # time/id/duration block (20 bytes v0, 32 v1), 8 reserved,
            # layer/group/volume/pad (8), and the 36-byte matrix
            off = p + (32 if ver == 0 else 44) + 40
            if tk[1] - off >= 8:
                tw, th = struct.unpack_from(">II", data, off)
                info["width"], info["height"] = tw >> 16, th >> 16
        mdia = _find(data, b, e, b"mdia")
        if mdia is None:
            continue
        hd = _find(data, *mdia, b"hdlr")
        if hd is None or data[hd[0] + 8 : hd[0] + 12] != b"vide":
            continue
        mh = _find(data, *mdia, b"mdhd")
        if mh is None:
            raise ValueError("video trak missing mdhd")
        ver, p = _fullbox(data, mh[0])
        info["timescale"] = struct.unpack_from(
            ">I", data, p + (8 if ver == 0 else 16)
        )[0]
        minf = _find(data, *mdia, b"minf")
        stbl = _find(data, *minf, b"stbl") if minf else None
        if stbl is None:
            raise ValueError("video trak missing stbl")
        info.update(_parse_stbl(data, *stbl))
        missing = [
            k
            for k in ("codec", "durations", "sizes", "chunks", "timescale")
            if k not in info
        ]
        if missing:
            raise ValueError(f"video trak missing sample tables: {missing}")
        # expand stsc runs -> per-chunk sample counts -> sample offsets
        sizes, chunks, stsc = info["sizes"], info["chunks"], info["stsc"]
        frames: list[bytes] = []
        si = 0
        for ci, chunk_off in enumerate(chunks, start=1):
            spc = 1
            for first, count, _desc in stsc:
                if first <= ci:
                    spc = count
                else:
                    break
            off = chunk_off
            for _ in range(spc):
                if si >= len(sizes):
                    break
                sz = sizes[si]
                if off + sz > len(data):
                    raise ValueError("sample range past end of file")
                frames.append(data[off : off + sz])
                off += sz
                si += 1
        if si != len(sizes):
            raise ValueError(
                f"sample table mismatch: {si} placed of {len(sizes)}"
            )
        dur = info["durations"]
        if len(dur) < len(frames):  # defensively pad (last delta repeats)
            dur = dur + [dur[-1] if dur else 1] * (len(frames) - len(dur))
        return Mp4Stream(
            width=info.get("width", 0),
            height=info.get("height", 0),
            codec=info["codec"],
            timescale=info["timescale"],
            durations=dur[: len(frames)],
            frames=frames,
        )
    raise ValueError("no video track in container")


MJPEG_CODECS = ("jpeg", "mjpa", "mjpb")


def decode_mp4_frame(stream: Mp4Stream, idx: int) -> bytes:
    """Sample bytes → top-down RGB, for MJPEG tracks (each sample is a
    self-contained JPEG — decoded by the repo's own T.81 codec)."""
    if stream.codec not in MJPEG_CODECS:
        raise ValueError(
            f"MP4 codec {stream.codec!r} is not locally decodable "
            "(MJPEG tracks are)"
        )
    from cassandra_spark.operators.jpeg import decode_jpeg

    w, h, _, rgb = decode_jpeg(stream.frames[idx])
    return rgb


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, ver: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (ver << 24) | flags) + payload)


def encode_mp4_mjpeg(
    width: int, height: int, frames_rgb: list[bytes], fps: int = 10,
    quality: int = 85,
) -> bytes:
    """RGB frames → minimal valid single-track MJPEG MP4 (ftyp + mdat +
    moov with full sample tables) — the demuxer's round-trip fixture."""
    from cassandra_spark.operators.jpeg import encode_jpeg

    samples = [
        encode_jpeg(width, height, f, quality=quality) for f in frames_rgb
    ]
    n = len(samples)
    if n == 0:
        raise ValueError("at least one frame required")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    first_sample_off = len(ftyp) + 8  # mdat header is 8 bytes

    timescale = 1000
    delta = max(1, timescale // fps)
    duration = n * delta

    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_ref_index
        + b"\x00" * 16                       # predefined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)               # frame count per sample
        + b"\x00" * 32                       # compressor name
        + struct.pack(">Hh", 24, -1)         # depth, color table id
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first_sample_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    url = _full(b"url ", 0, 1, b"")  # flag 1: data in this file
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(
        b"hdlr", 0, 0,
        b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"mjpeg\x00",
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0)       # times, track id, reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8                           # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)      # layer/group/volume/pad
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )                                       # identity matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)  # rate, volume
        + b"\x00" * 10
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )
        + b"\x00" * 24
        + struct.pack(">I", 2),                 # next track id
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
