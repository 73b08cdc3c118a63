"""Matroska (MKV/WebM) EBML demux for the L4 multimodal tier.

The container half of the round-7 "compressed video" gate closure,
beside operators/mp4.py: the EBML element tree is parsed for real —
Segment > Info (TimestampScale), Tracks (TrackEntry: number, type,
CodecID, PixelWidth/PixelHeight), Clusters (Timestamp + SimpleBlock
frames) — so geometry, timing, codec identity, and frame payloads come
from the actual file. ``V_MJPEG`` tracks decode to RGB through the
repo's complete T.81 JPEG codec; inter-coded codecs (V_MPEG4/ISO/AVC,
V_VP9, …) demux with REAL metadata but stay undecodable here (the same
honest gate as MP4's avc1). All three lacing modes (Xiph, EBML,
fixed-size) parse for real since round 8 — pure container math on the
public spec, round-trip-verified against this module's own writer.

A writer (`encode_mkv_mjpeg`) produces a minimal valid single-track
V_MJPEG Matroska file, so the demuxer round-trips without external
samples. Element IDs per the public Matroska/EBML specs [transcribed
clean-room].
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

EBML_MAGIC = b"\x1a\x45\xdf\xa3"


def is_mkv(data: bytes) -> bool:
    return data[:4] == EBML_MAGIC


@dataclass
class MkvStream:
    width: int
    height: int
    codec: str            # Matroska CodecID, e.g. 'V_MJPEG'
    timestamps_ms: list[float]  # per-frame absolute timestamps
    frames: list[bytes]
    # V_MPEG4/ISO/AVC tracks (round 12): the CodecPrivate element (an
    # avcC record) and the per-frame SimpleBlock keyframe flags
    codec_private: bytes | None = None
    keyframe: list[bool] | None = None
    # storage (decode) order of the display-sorted ``frames`` (round-13
    # B GOPs): store_order[j] = index into frames of the j-th STORED
    # block. Matroska stores blocks in decode order with presentation
    # timestamps; reordered video makes the two differ. None = identity.
    store_order: list[int] | None = None

    @property
    def duration_ms(self) -> float:
        if not self.timestamps_ms:
            return 0.0
        if len(self.timestamps_ms) == 1:
            return max(1.0, self.timestamps_ms[0] + 1)
        # last delta extrapolated from the previous one
        last = self.timestamps_ms[-1] - self.timestamps_ms[-2]
        return self.timestamps_ms[-1] + max(1.0, last)

    @property
    def frame_ms(self) -> float:
        n = max(1, len(self.frames))
        return max(1.0, self.duration_ms / n)


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-length integer at ``pos`` → (value, next_pos).
    ``keep_marker`` keeps the length-marker bit (element IDs); sizes
    strip it."""
    if pos >= len(data):
        raise ValueError("truncated EBML vint")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML vint")
    length = 9 - first.bit_length()
    if pos + length > len(data):
        raise ValueError("truncated EBML vint body")
    v = first if keep_marker else first & (0xFF >> length)
    for i in range(1, length):
        v = (v << 8) | data[pos + i]
    return v, pos + length


def _elements(data: bytes, pos: int, end: int):
    """Yield (element id, body_start, body_end)."""
    while pos < end:
        eid, p = _read_vint(data, pos, keep_marker=True)
        size, body = _read_vint(data, p, keep_marker=False)
        unknown = size == (1 << (7 * (body - p))) - 1  # all-ones: unknown
        body_end = end if unknown else body + size
        if body_end > end:
            raise ValueError("EBML element overruns container")
        yield eid, body, body_end
        pos = body_end


def _uint(data: bytes, b: int, e: int) -> int:
    v = 0
    for i in range(b, e):
        v = (v << 8) | data[i]
    return v


def _read_svint(data: bytes, pos: int) -> tuple[int, int]:
    """EBML-lacing SIGNED vint (size delta): the unsigned vint value
    minus the length's bias ``2^(7·len−1) − 1`` (Matroska §lacing,
    public spec)."""
    if pos >= len(data):
        raise ValueError("truncated EBML svint")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML svint")
    length = 9 - first.bit_length()
    v, nxt = _read_vint(data, pos, keep_marker=False)
    return v - ((1 << (7 * length - 1)) - 1), nxt


def _block_frames(data: bytes, pos: int, end: int, flags: int):
    """Split a (Simple)Block payload into frames per its lacing mode
    (flags bits 0x06): 00 none, 01 Xiph (255-run sizes), 10 fixed-size,
    11 EBML (first size plain vint, rest signed-vint deltas). Pure
    container math on the public Matroska spec; every path validates
    that the declared sizes tile the payload exactly."""
    lace = (flags >> 1) & 0x03
    if lace == 0:
        yield data[pos:end]
        return
    if pos >= end:
        raise ValueError("laced block missing frame count")
    n = data[pos] + 1
    q = pos + 1
    sizes: list[int] = []
    if lace == 0b01:  # Xiph
        for _ in range(n - 1):
            s = 0
            while True:
                if q >= end:
                    raise ValueError("truncated Xiph lace sizes")
                byte = data[q]
                q += 1
                s += byte
                if byte != 255:
                    break
            sizes.append(s)
    elif lace == 0b11:  # EBML
        if n > 1:
            first, q = _read_vint(data, q, keep_marker=False)
            if q > end:
                raise ValueError("truncated EBML lace sizes")
            sizes.append(first)
            for _ in range(n - 2):
                delta, q = _read_svint(data, q)
                if q > end:
                    raise ValueError("truncated EBML lace sizes")
                sizes.append(sizes[-1] + delta)
    else:  # 0b10 fixed-size: no size table, payload divides evenly
        total = end - q
        if n == 0 or total % n:
            raise ValueError(
                f"fixed lacing: {total} payload bytes not divisible "
                f"into {n} frames"
            )
        each = total // n
        sizes = [each] * (n - 1)
    if any(s < 0 for s in sizes):
        raise ValueError("negative laced frame size")
    declared = sum(sizes)
    if q + declared > end:
        raise ValueError("laced frame sizes overrun the block")
    for s in sizes:
        yield data[q : q + s]
        q += s
    yield data[q:end]  # last frame: the remainder


def demux_mkv(data: bytes) -> MkvStream:
    """Parse the EBML tree; return the FIRST video track's geometry,
    codec, timeline and raw frames (laced SimpleBlocks split per their
    Xiph/EBML/fixed size tables). Raises ValueError on malformed
    containers or absent video tracks."""
    if not is_mkv(data):
        raise ValueError("not an EBML/Matroska payload")
    segment = None
    for eid, b, e in _elements(data, 0, len(data)):
        if eid == 0x18538067:  # Segment
            segment = (b, e)
            break
    if segment is None:
        raise ValueError("no Matroska Segment")
    ts_scale = 1_000_000  # ns per tick (spec default)
    video_track = None
    info: dict = {}
    clusters: list[tuple[int, int]] = []
    for eid, b, e in _elements(data, *segment):
        if eid == 0x1549A966:  # Info
            for eid2, b2, e2 in _elements(data, b, e):
                if eid2 == 0x2AD7B1:  # TimestampScale
                    ts_scale = _uint(data, b2, e2)
        elif eid == 0x1654AE6B:  # Tracks
            for eid2, b2, e2 in _elements(data, b, e):
                if eid2 != 0xAE:  # TrackEntry
                    continue
                tr: dict = {}
                for eid3, b3, e3 in _elements(data, b2, e2):
                    if eid3 == 0xD7:
                        tr["number"] = _uint(data, b3, e3)
                    elif eid3 == 0x83:
                        tr["type"] = _uint(data, b3, e3)
                    elif eid3 == 0x86:
                        tr["codec"] = data[b3:e3].rstrip(b"\x00").decode(
                            "ascii", "replace"
                        )
                    elif eid3 == 0x63A2:  # CodecPrivate
                        tr["codec_private"] = data[b3:e3]
                    elif eid3 == 0xE0:  # Video
                        for eid4, b4, e4 in _elements(data, b3, e3):
                            if eid4 == 0xB0:
                                tr["width"] = _uint(data, b4, e4)
                            elif eid4 == 0xBA:
                                tr["height"] = _uint(data, b4, e4)
                if tr.get("type") == 1 and video_track is None:
                    video_track = tr
        elif eid == 0x1F43B675:  # Cluster
            clusters.append((b, e))
    if video_track is None:
        raise ValueError("no video track in container")
    missing = [k for k in ("number", "codec") if k not in video_track]
    if missing:
        raise ValueError(f"video TrackEntry missing: {missing}")
    frames: list[bytes] = []
    stamps: list[float] = []
    keys: list[bool] = []
    for b, e in clusters:
        cluster_ts = 0
        for eid2, b2, e2 in _elements(data, b, e):
            if eid2 == 0xE7:  # cluster Timestamp
                cluster_ts = _uint(data, b2, e2)
            elif eid2 == 0xA3:  # SimpleBlock
                tnum, p = _read_vint(data, b2, keep_marker=False)
                if tnum != video_track["number"]:
                    continue
                if p + 3 > e2:
                    raise ValueError("truncated SimpleBlock header")
                rel = struct.unpack_from(">h", data, p)[0]
                flags = data[p + 2]
                ts = (cluster_ts + rel) * ts_scale / 1_000_000.0
                for fr in _block_frames(data, p + 3, e2, flags):
                    frames.append(fr)
                    # laced frames share the block timestamp; sorted() is
                    # stable, so intra-lace order survives the timeline sort
                    stamps.append(ts)
                    keys.append(bool(flags & 0x80))
    if not frames:
        raise ValueError("video track has no frames")
    order = sorted(range(len(frames)), key=lambda i: stamps[i])
    # storage position -> display index (inverse of the timeline sort):
    # identity unless the track reorders (B pictures)
    inv = [0] * len(order)
    for disp, storage_i in enumerate(order):
        inv[storage_i] = disp
    return MkvStream(
        width=video_track.get("width", 0),
        height=video_track.get("height", 0),
        codec=video_track["codec"],
        timestamps_ms=[stamps[i] for i in order],
        frames=[frames[i] for i in order],
        codec_private=video_track.get("codec_private"),
        keyframe=[keys[i] for i in order],
        store_order=(None if inv == list(range(len(inv))) else inv),
    )


MJPEG_CODEC_IDS = ("V_MJPEG",)
AVC_CODEC_ID = "V_MPEG4/ISO/AVC"


def snap_to_key(stream: MkvStream, idx: int) -> int:
    """Latest keyframe at or before ``idx`` — the Matroska twin of
    mp4.snap_to_sync (per-GOP sampling of inter-coded tracks). Non-AVC
    streams (every frame independently decodable) return ``idx``."""
    if stream.codec != AVC_CODEC_ID or stream.keyframe is None:
        return idx
    prior = [i for i, k in enumerate(stream.keyframe[: idx + 1]) if k]
    if prior:
        return prior[-1]
    nxt = [i for i, k in enumerate(stream.keyframe) if k]
    if not nxt:
        raise ValueError("AVC track carries no keyframes")
    return nxt[0]


def decode_mkv_frame(stream: MkvStream, idx: int) -> bytes:
    """Frame bytes → top-down RGB. V_MJPEG decodes through the repo's
    T.81 codec; V_MPEG4/ISO/AVC decodes IDR (keyframe) blocks through
    the round-12 H.264 baseline-intra subset — inter frames stay
    honestly gated (sample the GOP's keyframe instead)."""
    if stream.codec == AVC_CODEC_ID:
        from cassandra_spark.operators.h264 import (
            decode_frame,
            parse_avcc,
            split_avcc_sample,
        )
        from cassandra_spark.operators.mp4 import _yuv420_to_rgb

        if stream.codec_private is None:
            raise ValueError("AVC track without CodecPrivate (avcC)")
        sps, pps = parse_avcc(stream.codec_private)
        length_size = (stream.codec_private[4] & 3) + 1

        def _is_key(i: int) -> bool:
            return stream.keyframe is None or bool(stream.keyframe[i])

        # GOP replay (round 13): a non-keyframe block decodes by
        # chaining forward from the covering keyframe IN STORAGE
        # (decode) order — for reordered (B) tracks storage order is
        # the decode order, which is why Matroska preserves it.
        sord = stream.store_order or list(range(len(stream.frames)))
        tpos = sord.index(idx)
        spos = tpos
        while spos > 0 and not _is_key(sord[spos]):
            spos -= 1
        if not _is_key(sord[spos]):
            raise ValueError("no keyframe at or before the requested frame")
        walk = [sord[j] for j in range(spos, tpos + 1)]
        from cassandra_spark.operators.h264 import decode_b, slice_kind

        anchors: list = []  # the last two decoded ANCHOR (I/P) pictures
        planes = None
        for i in walk:
            blk_planes = None
            for nal_unit in split_avcc_sample(
                stream.frames[i], length_size
            ):
                if nal_unit[0] & 0x1F in (6, 7, 8, 9):
                    continue
                if slice_kind(nal_unit, sps) == "B":
                    if len(anchors) < 2:
                        raise ValueError(
                            "B block before two anchor pictures"
                        )
                    blk_planes = decode_b(
                        nal_unit, sps, pps["init_qp"],
                        anchors[-2], anchors[-1],
                    )
                else:
                    blk_planes = decode_frame(
                        nal_unit, sps, pps["init_qp"],
                        ref_planes=(anchors[-1] if anchors else None),
                    )
                    if (nal_unit[0] >> 5) & 3:  # reference picture
                        anchors = (anchors + [blk_planes])[-2:]
            if blk_planes is None:
                raise ValueError(f"frame {i} carries no coded slice")
            planes = blk_planes
        return _yuv420_to_rgb(*planes)
    if stream.codec not in MJPEG_CODEC_IDS:
        raise ValueError(
            f"MKV codec {stream.codec!r} is not locally decodable "
            "(V_MJPEG and IDR-only V_MPEG4/ISO/AVC are)"
        )
    from cassandra_spark.operators.jpeg import decode_jpeg

    _, _, _, rgb = decode_jpeg(stream.frames[idx])
    return rgb


# --- writer (round-trip fixture) ---------------------------------------------


def _vint_size(v: int) -> bytes:
    """Encode an element SIZE as a minimal EBML vint."""
    for length in range(1, 9):
        if v < (1 << (7 * length)) - 1:
            out = v | (1 << (7 * length))
            return out.to_bytes(length, "big")
    raise ValueError("size too large")


def _elem(eid: bytes, payload: bytes) -> bytes:
    return eid + _vint_size(len(payload)) + payload


def _uint_payload(v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return v.to_bytes(n, "big")


def _svint_encode(v: int) -> bytes:
    """Signed vint for EBML lace-size deltas (inverse of _read_svint)."""
    for length in range(1, 9):
        bias = (1 << (7 * length - 1)) - 1
        if -bias <= v <= bias:
            enc = (v + bias) | (1 << (7 * length))
            return enc.to_bytes(length, "big")
    raise ValueError("delta too large for svint")


def _lace_payload(jpgs: list[bytes], lacing: str) -> bytes:
    """Frame-count byte + lace-size table + concatenated frames, per the
    requested mode — the writer half of _block_frames' round trip."""
    n = len(jpgs)
    head = bytes([n - 1])
    if lacing == "xiph":
        table = b""
        for jpg in jpgs[:-1]:
            s = len(jpg)
            table += b"\xff" * (s // 255) + bytes([s % 255])
    elif lacing == "ebml":
        table = b""
        if n > 1:
            table = _vint_size(len(jpgs[0]))
            for prev, cur in zip(jpgs, jpgs[1:-1]):
                table += _svint_encode(len(cur) - len(prev))
    elif lacing == "fixed":
        if len({len(j) for j in jpgs}) != 1:
            raise ValueError("fixed lacing requires equal-size frames")
        table = b""
    else:
        raise ValueError(f"unknown lacing mode {lacing!r}")
    return head + table + b"".join(jpgs)


def encode_mkv_avc1(
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
    """YCbCr 4:2:0 frames → a minimal valid single-track
    V_MPEG4/ISO/AVC Matroska file (CodecPrivate = avcC, one SimpleBlock
    per frame, AVCC length-prefixed payloads). ``gop=None`` keeps the
    all-keyframe layout; ``gop=N`` (round 13) codes every Nth frame as
    an IDR keyframe block and the rest as non-keyframe P blocks (the
    SimpleBlock keyframe flag is clear). Returns (container bytes,
    per-frame reconstructions) — mp4.encode_mp4_avc1's contract on the
    Matroska container."""
    from cassandra_spark.operators.h264 import (
        build_avcc,
        encode_idr,
        encode_p,
        write_pps,
        write_sps,
    )

    if not frames_yuv:
        raise ValueError("at least one frame required")
    header = _elem(
        EBML_MAGIC,
        _elem(b"\x42\x82", b"matroska")
        + _elem(b"\x42\x87", b"\x04")
        + _elem(b"\x42\x85", b"\x02"),
    )
    info = _elem(
        b"\x15\x49\xa9\x66",
        _elem(b"\x2a\xd7\xb1", _uint_payload(1_000_000)),  # 1 ms ticks
    )
    avcc = build_avcc(
        write_sps(width, height, num_ref_frames=0 if gop is None else 1),
        write_pps(qp),
    )
    video = _elem(
        b"\xe0",
        _elem(b"\xb0", _uint_payload(width))
        + _elem(b"\xba", _uint_payload(height)),
    )
    track = _elem(
        b"\xae",
        _elem(b"\xd7", b"\x01")
        + _elem(b"\x73\xc5", b"\x01")
        + _elem(b"\x83", b"\x01")
        + _elem(b"\x86", AVC_CODEC_ID.encode("ascii"))
        + _elem(b"\x63\xa2", avcc)  # CodecPrivate
        + video,
    )
    tracks = _elem(b"\x16\x54\xae\x6b", track)
    frame_ms = max(1, 1000 // fps)
    blocks = b""
    recons: list[tuple] = []
    for i, (y, cb, cr) in enumerate(frames_yuv):
        is_idr = gop is None or i % gop == 0
        if is_idr:
            nal_bytes, recon = encode_idr(
                y, cb, cr, qp=qp, pred_mode=pred_mode,
                chroma_mode=chroma_mode, frame_num=0, idr_pic_id=i % 2,
                mb_mode=mb_mode,
            )
        else:
            nal_bytes, recon = encode_p(
                y, cb, cr, recons[i - 1], qp=qp, frame_num=i % gop,
                mv_hint=(mv_hints[i] if mv_hints else (0, 0)),
                intra_mbs=intra_mbs,
                intra_mode=("i4" if i % 2 else "i16"),
                pred_mode=pred_mode, chroma_mode=chroma_mode,
                partition_mbs=partition_mbs,
            )
        recons.append(recon)
        sample = struct.pack(">I", len(nal_bytes)) + nal_bytes
        flags = b"\x80" if is_idr else b"\x00"  # SimpleBlock keyframe bit
        blocks += _elem(
            b"\x1f\x43\xb6\x75",
            _elem(b"\xe7", _uint_payload(i * frame_ms))
            + _elem(
                b"\xa3", b"\x81" + struct.pack(">h", 0) + flags + sample
            ),
        )
    segment = _elem(b"\x18\x53\x80\x67", info + tracks + blocks)
    return header + segment, recons


def encode_mkv_avc1_bgop(
    width: int,
    height: int,
    frames_yuv: list[tuple],
    fps: int = 10,
    qp: int = 26,
    idr_every: int = 4,
    mv_hints: list[tuple] | None = None,
    intra_mbs=frozenset(),
) -> tuple[bytes, list[tuple]]:
    """Round-13 B-GOP Matroska writer: ``frames_yuv`` in DISPLAY order
    (A b A b ... — odd length), blocks stored in DECODE order with
    their true PRESENTATION timestamps (non-monotonic storage order is
    how Matroska carries reordered video), keyframe bit on IDR blocks
    only, closed GOPs (the display slot before an IDR is a
    non-reference P, never a cross-IDR B). Returns (container bytes,
    reconstructions in DISPLAY order — matching the demuxed stream's
    timeline-sorted ``frames``)."""
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
    header = _elem(
        EBML_MAGIC,
        _elem(b"\x42\x82", b"matroska")
        + _elem(b"\x42\x87", b"\x04")
        + _elem(b"\x42\x85", b"\x02"),
    )
    info = _elem(
        b"\x15\x49\xa9\x66",
        _elem(b"\x2a\xd7\xb1", _uint_payload(1_000_000)),  # 1 ms ticks
    )
    avcc = build_avcc(
        write_sps(width, height, num_ref_frames=2, poc_type=0),
        write_pps(qp),
    )
    video = _elem(
        b"\xe0",
        _elem(b"\xb0", _uint_payload(width))
        + _elem(b"\xba", _uint_payload(height)),
    )
    track = _elem(
        b"\xae",
        _elem(b"\xd7", b"\x01")
        + _elem(b"\x73\xc5", b"\x01")
        + _elem(b"\x83", b"\x01")
        + _elem(b"\x86", AVC_CODEC_ID.encode("ascii"))
        + _elem(b"\x63\xa2", avcc)
        + video,
    )
    tracks = _elem(b"\x16\x54\xae\x6b", track)
    frame_ms = max(1, 1000 // fps)
    blocks = b""
    recons: list[tuple] = []
    prev_anchor: tuple | None = None

    def emit(nal_bytes, recon, disp, keyframe):
        nonlocal blocks
        recons.append((disp, recon))
        sample = struct.pack(">I", len(nal_bytes)) + nal_bytes
        flags = b"\x80" if keyframe else b"\x00"
        blocks += _elem(
            b"\x1f\x43\xb6\x75",
            _elem(b"\xe7", _uint_payload(disp * frame_ms))
            + _elem(
                b"\xa3", b"\x81" + struct.pack(">h", 0) + flags + sample
            ),
        )

    for k, disp in enumerate(range(0, n, 2)):
        y, cb, cr = frames_yuv[disp]
        is_idr = k % idr_every == 0
        if prev_anchor is not None and is_idr:
            bdisp = disp - 1
            pnal, precon = encode_p(
                *frames_yuv[bdisp], prev_anchor, qp=qp,
                frame_num=k % 16,
                mv_hint=(mv_hints[bdisp] if mv_hints else (0, 0)),
                poc_lsb=(2 * bdisp) % 256, ref_idc=0,
            )
            emit(pnal, precon, bdisp, False)
        if is_idr:
            nal_bytes, recon = encode_idr(
                y, cb, cr, qp=qp, frame_num=0, idr_pic_id=k % 2,
                poc_lsb=(2 * disp) % 256,
            )
        else:
            nal_bytes, recon = encode_p(
                y, cb, cr, prev_anchor, qp=qp, frame_num=k % 16,
                mv_hint=(mv_hints[disp] if mv_hints else (0, 0)),
                poc_lsb=(2 * disp) % 256,
            )
        emit(nal_bytes, recon, disp, is_idr)
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
            emit(bnal, brecon, bdisp, False)
        prev_anchor = recon
    segment = _elem(b"\x18\x53\x80\x67", info + tracks + blocks)
    return header + segment, [r for _, r in sorted(recons)]


def encode_mkv_mjpeg(
    width: int, height: int, frames_rgb: list[bytes], fps: int = 10,
    quality: int = 85, lacing: str | None = None,
) -> bytes:
    """RGB frames → minimal valid single-track V_MJPEG Matroska file.
    ``lacing`` packs ALL frames into one laced SimpleBlock ('xiph',
    'ebml', or 'fixed' — fixed requires equal-size frames); None keeps
    the one-cluster-per-frame layout."""
    from cassandra_spark.operators.jpeg import encode_jpeg

    if not frames_rgb:
        raise ValueError("at least one frame required")
    header = _elem(
        EBML_MAGIC,
        _elem(b"\x42\x82", b"matroska")      # DocType
        + _elem(b"\x42\x87", b"\x04")         # DocTypeVersion
        + _elem(b"\x42\x85", b"\x02"),        # DocTypeReadVersion
    )
    info = _elem(
        b"\x15\x49\xa9\x66",
        _elem(b"\x2a\xd7\xb1", _uint_payload(1_000_000)),  # 1 ms ticks
    )
    video = _elem(
        b"\xe0",
        _elem(b"\xb0", _uint_payload(width))
        + _elem(b"\xba", _uint_payload(height)),
    )
    track = _elem(
        b"\xae",
        _elem(b"\xd7", b"\x01")               # TrackNumber 1
        + _elem(b"\x73\xc5", b"\x01")          # TrackUID
        + _elem(b"\x83", b"\x01")              # TrackType video
        + _elem(b"\x86", b"V_MJPEG")           # CodecID
        + video,
    )
    tracks = _elem(b"\x16\x54\xae\x6b", track)
    frame_ms = max(1, 1000 // fps)
    jpgs = [
        encode_jpeg(width, height, rgb, quality=quality)
        for rgb in frames_rgb
    ]
    if lacing is not None:
        # one Cluster, one laced SimpleBlock holding every frame
        # (keyframe flag | lacing bits: xiph 0x02, fixed 0x04, ebml 0x06)
        lace_bits = {"xiph": 0x02, "fixed": 0x04, "ebml": 0x06}[lacing]
        blocks = _elem(
            b"\x1f\x43\xb6\x75",
            _elem(b"\xe7", _uint_payload(0))
            + _elem(
                b"\xa3",
                b"\x81" + struct.pack(">h", 0)
                + bytes([0x80 | lace_bits])
                + _lace_payload(jpgs, lacing),
            ),
        )
    else:
        blocks = b""
        for i, jpg in enumerate(jpgs):
            # one Cluster per frame: Timestamp + SimpleBlock (track vint 1,
            # relative ts 0, keyframe flag)
            cluster = _elem(
                b"\x1f\x43\xb6\x75",
                _elem(b"\xe7", _uint_payload(i * frame_ms))
                + _elem(
                    b"\xa3", b"\x81" + struct.pack(">h", 0) + b"\x80" + jpg
                ),
            )
            blocks += cluster
    segment = _elem(b"\x18\x53\x80\x67", info + tracks + blocks)
    return header + segment
