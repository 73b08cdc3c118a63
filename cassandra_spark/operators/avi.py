"""Dependency-free AVI (RIFF) mux/demux for the L4 video tier.

Makes the frame-sampling stage REAL in this container: an AVI payload is
demuxed by walking the RIFF chunk tree (``LIST hdrl`` → ``avih``/``strh``/
``strf`` for geometry and timing, ``LIST movi`` for the frame chunks), and
each sampled frame decodes to top-down RGB:

- **MJPG** (motion-JPEG): every ``00dc`` chunk is a standalone baseline
  JPEG — decoded by operators/jpeg.py's from-scratch Huffman/DCT decoder.
- **DIB** (``biCompression == 0``): raw 24-bit bottom-up BGR rows padded
  to 4 bytes, the same raster layout as BMP.

The muxer exists so tests can round-trip real video bytes end-to-end
without any media library: ``encode_avi(rgb frames) → demux_avi →
decode_avi_frame`` must reproduce the input rasters (exactly for DIB,
within JPEG quantization error for MJPG).

All functions are worker-safe pure functions over bytes (no driver state),
designed to run inside Arrow-batched mapInPandas.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

AVI_MIME = "video/x-msvideo"

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def is_avi(data: bytes) -> bool:
    """RIFF magic + AVI form type."""
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


@dataclass
class AviStream:
    """One demuxed video stream: geometry, timing, codec, frame chunks."""

    width: int
    height: int
    usec_per_frame: int
    codec: str  # 'MJPG' or 'DIB '
    frames: list[bytes]

    @property
    def frame_ms(self) -> float:
        return self.usec_per_frame / 1000.0

    @property
    def duration_ms(self) -> float:
        return len(self.frames) * self.frame_ms


# --- mux -------------------------------------------------------------------


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    out = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        out += b"\x00"  # RIFF chunks are word-aligned
    return out


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def encode_avi(
    width: int,
    height: int,
    frames_rgb: list[bytes],
    fps: int = 25,
    codec: str = "MJPG",
    quality: int = 85,
) -> bytes:
    """Top-down RGB frames → a minimal single-video-stream AVI."""
    if codec not in ("MJPG", "DIB "):
        raise ValueError("codec must be 'MJPG' or 'DIB '")
    for f in frames_rgb:
        if len(f) != width * height * 3:
            raise ValueError("every frame must be width*height*3 RGB bytes")

    if codec == "MJPG":
        from cassandra_spark.operators.jpeg import encode_jpeg

        payloads = [encode_jpeg(width, height, f, quality) for f in frames_rgb]
        compression = struct.unpack("<I", b"MJPG")[0]
    else:
        payloads = [_rgb_to_dib(width, height, f) for f in frames_rgb]
        compression = 0  # BI_RGB

    usec = 1_000_000 // fps
    max_size = max((len(p) for p in payloads), default=0)

    avih = struct.pack(
        "<14I",
        usec,  # dwMicroSecPerFrame
        max_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,  # dwFlags
        len(payloads),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_size,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids",
        codec.encode("ascii"),
        0,  # dwFlags
        0, 0,  # wPriority, wLanguage
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate → fps = rate/scale
        0,  # dwStart
        len(payloads),  # dwLength
        max_size,  # dwSuggestedBufferSize
        0,  # dwQuality
        0,  # dwSampleSize
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        compression,  # biCompression
        width * height * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b"movi"
    idx_entries = []
    for p in payloads:
        # idx1 offsets are relative to the start of the 'movi' list data
        # (the 'movi' fourcc sits at offset 0, so the first chunk is at 4)
        idx_entries.append((len(movi_payload), len(p)))
        movi_payload += _chunk(b"00dc", p)
    movi = _chunk(b"LIST", movi_payload)

    idx1 = b"".join(
        b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, size)
        for off, size in idx_entries
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _rgb_to_dib(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB → bottom-up BGR rows padded to 4 bytes (BMP raster)."""
    stride = (width * 3 + 3) & ~3
    out = bytearray(stride * height)
    for y in range(height):
        src = (height - 1 - y) * width * 3
        dst = y * stride
        row = rgb[src : src + width * 3]
        # swap R<->B per pixel
        b = bytearray(row)
        b[0::3], b[2::3] = row[2::3], row[0::3]
        out[dst : dst + width * 3] = b
    return bytes(out)


def _dib_to_rgb(width: int, height: int, dib: bytes) -> bytes:
    stride = (width * 3 + 3) & ~3
    if len(dib) < stride * height:
        raise ValueError("DIB frame shorter than geometry requires")
    out = bytearray(width * height * 3)
    for y in range(height):
        src = (height - 1 - y) * stride
        dst = y * width * 3
        row = dib[src : src + width * 3]
        b = bytearray(row)
        b[0::3], b[2::3] = row[2::3], row[0::3]
        out[dst : dst + width * 3] = b
    return bytes(out)


# --- demux -----------------------------------------------------------------


def demux_avi(data: bytes) -> AviStream:
    """Walk the RIFF tree; return geometry/timing and raw frame chunks for
    the first (and only supported) video stream. Tolerant of unknown
    chunks and a missing idx1; raises ValueError on malformed containers."""
    if not is_avi(data):
        raise ValueError("not an AVI (RIFF/AVI ) payload")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    end = min(len(data), 8 + riff_size)

    info: dict = {"frames": []}
    _walk(data, 12, end, info)

    missing = [k for k in ("width", "height", "usec", "codec") if k not in info]
    if missing:
        raise ValueError(f"AVI missing header fields: {missing}")
    return AviStream(
        width=info["width"],
        height=info["height"],
        usec_per_frame=info["usec"],
        codec=info["codec"],
        frames=info["frames"],
    )


def _walk(data: bytes, pos: int, end: int, info: dict) -> None:
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body_start = pos + 8
        body_end = body_start + size
        if body_end > end:
            raise ValueError("truncated RIFF chunk")
        if fourcc == b"LIST":
            _walk(data, body_start + 4, body_end, info)
        elif fourcc == b"avih":
            if size < 40:
                raise ValueError("avih chunk too small")
            usec, *_ = struct.unpack_from("<I", data, body_start)
            w, h = struct.unpack_from("<II", data, body_start + 32)
            info["usec"] = usec
            info.setdefault("width", w)
            info.setdefault("height", h)
        elif fourcc == b"strh":
            if data[body_start : body_start + 4] == b"vids":
                scale, rate = struct.unpack_from("<II", data, body_start + 20)
                if scale and rate and "usec" not in info:
                    info["usec"] = int(1_000_000 * scale / rate)
        elif fourcc == b"strf" and "codec" not in info:
            if size >= 20:
                w, h = struct.unpack_from("<ii", data, body_start + 4)
                comp = struct.unpack_from("<I", data, body_start + 16)[0]
                info["width"], info["height"] = w, abs(h)
                if comp == 0:
                    info["codec"] = "DIB "
                else:
                    info["codec"] = struct.pack("<I", comp).decode(
                        "ascii", "replace"
                    )
        elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2] == b"00":
            info["frames"].append(data[body_start:body_end])
        pos = body_end + (size % 2)  # word alignment


def decode_avi_frame(stream: AviStream, idx: int) -> bytes:
    """Frame chunk → top-down RGB bytes, dispatched on the stream codec."""
    chunk = stream.frames[idx]
    if stream.codec == "MJPG":
        from cassandra_spark.operators.jpeg import decode_jpeg

        w, h, _c, rgb = decode_jpeg(chunk)
        if (w, h) != (stream.width, stream.height):
            raise ValueError("MJPG frame geometry disagrees with the header")
        return rgb
    if stream.codec == "DIB ":
        return _dib_to_rgb(stream.width, stream.height, chunk)
    raise ValueError(f"unsupported AVI codec {stream.codec!r}")
