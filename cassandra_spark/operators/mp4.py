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
    # avc1 tracks (round 12): the avcC decoder-configuration record from
    # the sample entry, and the stss sync-sample numbers (1-based; None =
    # no stss box = every sample is a sync sample per ISO 14496-12)
    avcc: bytes | None = None
    sync: list[int] | None = None
    # ctts composition offsets (round 13, B GOPs): per-sample ticks
    # added to decode time to get composition (display) time; None =
    # no ctts box = display order is decode order
    comp_offsets: list[int] | None = None

    @property
    def duration_ms(self) -> float:
        return sum(self.durations) * 1000.0 / self.timescale

    @property
    def frame_ms(self) -> float:
        n = max(1, len(self.frames))
        return max(1.0, self.duration_ms / n)

    @property
    def display_order(self) -> list[int]:
        """Sample indices sorted by composition time (decode time plus
        the ctts offset): the order a player PRESENTS the samples in.
        Identity when no ctts box exists."""
        n = len(self.frames)
        if self.comp_offsets is None:
            return list(range(n))
        dec = 0
        comp = []
        for i in range(n):
            comp.append(dec + self.comp_offsets[i])
            dec += self.durations[i] if i < len(self.durations) else 1
        return sorted(range(n), key=lambda i: (comp[i], i))


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
            # avc1 sample entry: the avcC config box follows the fixed
            # 78-byte VideoSampleEntry body (ISO 14496-15)
            if out.get("codec") == "avc1" and ee - entry > 86:
                found = _find(data, entry + 86, ee, b"avcC")
                if found:
                    out["avcc"] = data[found[0] : found[1]]
        elif fc == b"ctts":
            _, pview = _fullbox(data, bb)
            n = struct.unpack_from(">I", data, pview)[0]
            offs: list[int] = []
            for i in range(n):
                cnt, off = struct.unpack_from(
                    ">Ii", data, pview + 4 + 8 * i
                )
                offs.extend([off] * cnt)
            out["comp_offsets"] = offs
        elif fc == b"stss":
            _, p = _fullbox(data, bb)
            n = struct.unpack_from(">I", data, p)[0]
            out["sync"] = [
                struct.unpack_from(">I", data, p + 4 + 4 * i)[0]
                for i in range(n)
            ]
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
            avcc=info.get("avcc"),
            sync=info.get("sync"),
            comp_offsets=info.get("comp_offsets"),
        )
    raise ValueError("no video track in container")


MJPEG_CODECS = ("jpeg", "mjpa", "mjpb")


def snap_to_sync(stream: Mp4Stream, idx: int) -> int:
    """Latest sync (IDR) sample at or before ``idx`` — the per-GOP
    sampling rule for inter-coded tracks: a 100 TB frame pipeline decodes
    the GOP's sync picture, never the inter frames. Non-avc1 streams
    (every sample independently decodable) return ``idx`` unchanged."""
    if stream.codec != "avc1" or stream.sync is None:
        return idx
    prior = [s - 1 for s in stream.sync if s - 1 <= idx]
    if prior:
        return max(prior)
    return min(s - 1 for s in stream.sync)


def is_sync_sample(stream: Mp4Stream, idx: int) -> bool:
    """Sample ``idx`` (0-based) is a sync (IDR) sample: listed in stss,
    or every sample when no stss box exists (ISO 14496-12 rule)."""
    return stream.sync is None or (idx + 1) in stream.sync


def decode_mp4_frame(stream: Mp4Stream, idx: int) -> bytes:
    """Sample bytes → top-down RGB. MJPEG tracks decode through the
    repo's T.81 codec; avc1 tracks decode IDR (sync) samples through the
    round-12 H.264 baseline-intra subset (operators/h264.py) — non-IDR
    samples stay honestly gated (the per-GOP sampling contract: a frame
    pipeline at 100 TB samples sync pictures and skips inter frames)."""
    if stream.codec == "avc1":
        return _yuv420_to_rgb(*_decode_avc_sample(stream, idx))
    if stream.codec not in MJPEG_CODECS:
        raise ValueError(
            f"MP4 codec {stream.codec!r} is not locally decodable "
            "(MJPEG and IDR-only avc1 tracks are)"
        )
    from cassandra_spark.operators.jpeg import decode_jpeg

    w, h, _, rgb = decode_jpeg(stream.frames[idx])
    return rgb


def _decode_avc_sample(stream: Mp4Stream, idx: int) -> tuple:
    """Decode avc1 sample ``idx`` to (y, cb, cr) planes. A non-sync
    (P) sample decodes by GOP replay (round 13): decode forward from
    the covering IDR, chaining each picture as the next one's
    reference — exactly what a conforming player does on a seek. The
    per-GOP cost is bounded by the writer's GOP length; a 100 TB
    sampling pipeline still prefers IDR samples (see sample_frames'
    snap), but arbitrary-frame decode is no longer gated."""
    if stream.avcc is None:
        raise ValueError("avc1 track without avcC configuration")
    from cassandra_spark.operators.h264 import (
        decode_frame,
        parse_avcc,
        split_avcc_sample,
    )

    from cassandra_spark.operators.h264 import decode_b, slice_kind

    sps, pps = parse_avcc(stream.avcc)
    length_size = (stream.avcc[4] & 3) + 1
    start = idx
    while start > 0 and not is_sync_sample(stream, start):
        start -= 1
    if not is_sync_sample(stream, start):
        raise ValueError("no sync sample at or before the requested frame")
    anchors: list = []  # the last two decoded ANCHOR (I/P) pictures
    planes = None
    for i in range(start, idx + 1):
        sample_planes = None
        for nal_unit in split_avcc_sample(stream.frames[i], length_size):
            ntype = nal_unit[0] & 0x1F
            if ntype in (6, 7, 8, 9):  # SEI / SPS / PPS / AUD: skip
                continue
            kind = slice_kind(nal_unit, sps)
            if kind == "B":
                # a B sample references the last TWO anchors (both
                # already decoded — the writer emits the following
                # anchor before the B that points at it)
                if len(anchors) < 2:
                    raise ValueError(
                        "B sample before two anchor pictures"
                    )
                sample_planes = decode_b(
                    nal_unit, sps, pps["init_qp"],
                    anchors[-2], anchors[-1],
                )
            else:
                # anchors chain off the previous ANCHOR, never a B;
                # a NON-REFERENCE P (ref_idc 0 — the closed-GOP slot
                # before an IDR) decodes but never enters the DPB
                sample_planes = decode_frame(
                    nal_unit, sps, pps["init_qp"],
                    ref_planes=(anchors[-1] if anchors else None),
                )
                if (nal_unit[0] >> 5) & 3:
                    anchors = (anchors + [sample_planes])[-2:]
        if sample_planes is None:
            raise ValueError(f"sample {i} carries no coded slice")
        planes = sample_planes
    return planes


def _yuv420_to_rgb(y, cb, cr) -> bytes:
    """Full-range BT.601 YCbCr 4:2:0 → top-down RGB (chroma by sample
    replication — the writer's own convention, matching jpeg.py's JFIF
    math so round trips are engine-consistent)."""
    h, w = len(y), len(y[0])
    out = bytearray(w * h * 3)
    k = 0
    for yy in range(h):
        cyr = cb[yy >> 1]
        crr = cr[yy >> 1]
        yr = y[yy]
        for x in range(w):
            Y = yr[x]
            U = cyr[x >> 1] - 128
            V = crr[x >> 1] - 128
            r = Y + ((91881 * V + 32768) >> 16)
            g = Y - ((22554 * U + 46802 * V + 32768) >> 16)
            b = Y + ((116130 * U + 32768) >> 16)
            out[k] = 0 if r < 0 else 255 if r > 255 else r
            out[k + 1] = 0 if g < 0 else 255 if g > 255 else g
            out[k + 2] = 0 if b < 0 else 255 if b > 255 else b
            k += 3
    return bytes(out)


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, ver: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (ver << 24) | flags) + payload)


def _video_sample_entry(width: int, height: int) -> bytes:
    """Fixed 78-byte VideoSampleEntry body (before any extension boxes)."""
    return (
        b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_ref_index
        + b"\x00" * 16                       # predefined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)               # frame count per sample
        + b"\x00" * 32                       # compressor name
        + struct.pack(">Hh", 24, -1)         # depth, color table id
    )


def encode_mp4_avc1(
    width: int,
    height: int,
    frames_yuv: list[tuple],
    fps: int = 10,
    qp: int = 26,
    pred_mode: int = 2,
    chroma_mode: int = 0,
    mb_mode: str = "i16",
    gop: int | None = None,
    mv_hints: list[tuple] | None = None,
    intra_mbs=frozenset(),
    partition_mbs=None,
) -> tuple[bytes, list[tuple]]:
    """YCbCr 4:2:0 frames (each a (y, cb, cr) plane triple) → a minimal
    valid single-track avc1 MP4 (avcC extradata, stss marking the sync
    samples, AVCC 4-byte length-prefixed samples). ``gop=None`` keeps
    the IDR-only layout; ``gop=N`` (round 13) codes every Nth frame as
    an IDR and the rest as P pictures referencing the previous frame's
    reconstruction (``mv_hints``: per-frame quarter-pel motion-search
    hints; ``intra_mbs``: (mbx, mby) set forced intra inside P frames).
    Returns (container bytes, per-frame reconstructed planes) — the
    reconstruction is the decoder's contractual output, so the demux →
    decode round trip is asserted byte-exact without external samples."""
    from cassandra_spark.operators.h264 import (
        build_avcc,
        encode_idr,
        encode_p,
        write_pps,
        write_sps,
    )

    if not frames_yuv:
        raise ValueError("at least one frame required")
    samples: list[bytes] = []
    recons: list[tuple] = []
    sync_nums: list[int] = []
    for i, (y, cb, cr) in enumerate(frames_yuv):
        is_idr = gop is None or i % gop == 0
        if is_idr:
            nal_bytes, recon = encode_idr(
                y, cb, cr, qp=qp, pred_mode=pred_mode,
                chroma_mode=chroma_mode, frame_num=0, idr_pic_id=i % 2,
                mb_mode=mb_mode,
            )
            sync_nums.append(i + 1)
        else:
            nal_bytes, recon = encode_p(
                y, cb, cr, recons[i - 1], qp=qp, frame_num=i % gop,
                mv_hint=(mv_hints[i] if mv_hints else (0, 0)),
                intra_mbs=intra_mbs,
                intra_mode=("i4" if i % 2 else "i16"),
                pred_mode=pred_mode, chroma_mode=chroma_mode,
                partition_mbs=partition_mbs,
            )
        samples.append(struct.pack(">I", len(nal_bytes)) + nal_bytes)
        recons.append(recon)
    avcc = build_avcc(
        write_sps(width, height, num_ref_frames=0 if gop is None else 1),
        write_pps(qp),
    )
    entry = _video_sample_entry(width, height) + _box(b"avcC", avcc)
    stss = _full(
        b"stss", 0, 0,
        struct.pack(">I", len(sync_nums))
        + b"".join(struct.pack(">I", s) for s in sync_nums),
    )
    return (
        _single_track_mp4(width, height, samples, fps, b"avc1", entry, stss),
        recons,
    )


def encode_mp4_avc1_bgop(
    width: int,
    height: int,
    frames_yuv: list[tuple],
    fps: int = 10,
    qp: int = 26,
    idr_every: int = 4,
    mv_hints: list[tuple] | None = None,
    intra_mbs=frozenset(),
) -> tuple[bytes, list[tuple]]:
    """Round-13 B-GOP avc1 writer: ``frames_yuv`` in DISPLAY order with
    anchors at even positions and a B picture between each pair (the
    display pattern A b A b A ... — the length must be odd so the track
    ends on an anchor). Samples are stored in DECODE order (each
    following anchor before the B that references it), composition
    times travel in a ctts box, anchors are IDR every ``idr_every``-th
    (P otherwise, referencing the previous anchor), and B pictures are
    non-reference (B_L0/B_L1/B_Bi 16x16). Returns (container bytes,
    reconstructions in SAMPLE order) — use the demuxed stream's
    ``display_order`` to map presentation positions back to samples."""
    from cassandra_spark.operators.h264 import (
        build_avcc,
        encode_b,
        encode_idr,
        encode_p,
        write_pps,
        write_sps,
    )

    n = len(frames_yuv)
    if n < 3 or n % 2 == 0:
        raise ValueError(
            "B-GOP pattern needs an odd frame count >= 3 (A b A ...)"
        )
    samples: list[bytes] = []
    recons: list[tuple] = []
    sync_nums: list[int] = []
    ctts: list[int] = []          # composition offset per sample, ticks
    prev_anchor: tuple | None = None

    def emit(nal_bytes, recon, disp):
        samples.append(struct.pack(">I", len(nal_bytes)) + nal_bytes)
        recons.append(recon)
        ctts.append(disp - (len(samples) - 1))

    for k, disp in enumerate(range(0, n, 2)):
        y, cb, cr = frames_yuv[disp]
        is_idr = k % idr_every == 0
        if prev_anchor is not None and is_idr:
            # CLOSED GOPs: an IDR resets the DPB, so the display slot
            # before it cannot be a B referencing across it — code it
            # as a NON-REFERENCE P on the previous anchor instead,
            # in decode order before the IDR (it also displays first)
            bdisp = disp - 1
            pnal, precon = encode_p(
                *frames_yuv[bdisp], prev_anchor, qp=qp,
                frame_num=k % 16,
                mv_hint=(mv_hints[bdisp] if mv_hints else (0, 0)),
                poc_lsb=(2 * bdisp) % 256, ref_idc=0,
            )
            emit(pnal, precon, bdisp)
        if is_idr:
            nal_bytes, recon = encode_idr(
                y, cb, cr, qp=qp, frame_num=0, idr_pic_id=k % 2,
                poc_lsb=(2 * disp) % 256,
            )
            sync_nums.append(len(samples) + 1)
        else:
            nal_bytes, recon = encode_p(
                y, cb, cr, prev_anchor, qp=qp, frame_num=k % 16,
                mv_hint=(mv_hints[disp] if mv_hints else (0, 0)),
                poc_lsb=(2 * disp) % 256,
            )
        emit(nal_bytes, recon, disp)
        if prev_anchor is not None and not is_idr:
            bdisp = disp - 1
            by, bcb, bcr = frames_yuv[bdisp]
            bnal, brecon = encode_b(
                by, bcb, bcr, prev_anchor, recon, qp=qp,
                frame_num=k % 16, poc_lsb=(2 * bdisp) % 256,
                mv_hint0=(mv_hints[bdisp] if mv_hints else (0, 0)),
                mv_hint1=(0, 0),
                intra_mbs=intra_mbs,
            )
            emit(bnal, brecon, bdisp)
        prev_anchor = recon
    avcc = build_avcc(
        write_sps(width, height, num_ref_frames=2, poc_type=0),
        write_pps(qp),
    )
    entry = _video_sample_entry(width, height) + _box(b"avcC", avcc)
    stss = _full(
        b"stss", 0, 0,
        struct.pack(">I", len(sync_nums))
        + b"".join(struct.pack(">I", s) for s in sync_nums),
    )
    timescale = 1000
    delta = max(1, timescale // fps)
    shift = -min(ctts)  # ctts v0 offsets are unsigned: shift to >= 0
    ctts_box = _full(
        b"ctts", 0, 0,
        struct.pack(">I", len(ctts))
        + b"".join(
            struct.pack(">II", 1, (off + shift) * delta) for off in ctts
        ),
    )
    return (
        _single_track_mp4(
            width, height, samples, fps, b"avc1", entry, stss + ctts_box
        ),
        recons,
    )


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
    if not samples:
        raise ValueError("at least one frame required")
    return _single_track_mp4(
        width, height, samples, fps, b"jpeg",
        _video_sample_entry(width, height), b"",
    )


def _single_track_mp4(
    width: int, height: int, samples: list[bytes], fps: int,
    fourcc: bytes, sample_entry: bytes, extra_stbl: bytes,
) -> bytes:
    n = len(samples)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    first_sample_off = len(ftyp) + 8  # mdat header is 8 bytes

    timescale = 1000
    delta = max(1, timescale // fps)
    duration = n * delta

    stsd = _full(
        b"stsd", 0, 0, struct.pack(">I", 1) + _box(fourcc, sample_entry)
    )
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first_sample_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + extra_stbl)
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
