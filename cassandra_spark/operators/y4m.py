"""YUV4MPEG2 (Y4M) video container — the uncompressed interchange format
ffmpeg/mjpegtools pipelines stream, and the second real video container
for the L4 multimodal tier (AVI MJPG/DIB and animated GIF being the
others). Pure stdlib/numpy, worker-safe (the codecs.py contract).

Supported: C420 family (420jpeg/420mpeg2/420paldv siting — siting only
affects sub-pixel phase, which a box upsample ignores), C422, C444 and
mono; any W/H; F<num>:<den> frame rate; interlacing tag parsed and
ignored (progressive treatment). YUV→RGB uses the full-range BT.601
(JPEG/JFIF) matrix — the same arithmetic as the JPEG decoder, so both
"real video" paths share one color convention.
"""

from __future__ import annotations

import numpy as np

Y4M_MAGIC = b"YUV4MPEG2 "


def is_y4m(data: bytes) -> bool:
    return data[: len(Y4M_MAGIC)] == Y4M_MAGIC


class Y4MStream:
    def __init__(self, width, height, fps_num, fps_den, colorspace, frames):
        self.width = width
        self.height = height
        self.fps_num = fps_num
        self.fps_den = fps_den
        self.colorspace = colorspace
        self.frames = frames  # list of raw plane payloads

    @property
    def frame_ms(self) -> float:
        return 1000.0 * self.fps_den / self.fps_num

    @property
    def duration_ms(self) -> float:
        return self.frame_ms * len(self.frames)


_PLANE_FACTORS = {
    "420": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
    "mono": None,
}


def _cs_key(cs: str) -> str:
    if cs.startswith("mono"):
        return "mono"
    for k in ("420", "422", "444"):
        if cs.startswith(k):
            return k
    raise ValueError(f"unsupported Y4M colorspace C{cs}")


def _frame_size(width: int, height: int, cs: str) -> int:
    f = _PLANE_FACTORS[_cs_key(cs)]
    if f is None:
        return width * height
    sx, sy = f
    return width * height + 2 * ((width + sx - 1) // sx) * (
        (height + sy - 1) // sy
    )


def demux_y4m(data: bytes) -> Y4MStream:
    """Parse the stream header + every FRAME payload."""
    if not is_y4m(data):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = data.index(b"\n")
    width = height = None
    fps_num, fps_den = 25, 1
    colorspace = "420jpeg"
    for tok in data[len(Y4M_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:].decode("ascii")
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        elif tag == "C":
            colorspace = val
        # I (interlacing), A (aspect), X (comment): parsed and ignored
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    if fps_num <= 0 or fps_den <= 0:
        raise ValueError("Y4M frame rate must be positive")
    fsize = _frame_size(width, height, colorspace)
    frames = []
    pos = nl + 1
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("expected FRAME marker")
        fnl = data.index(b"\n", pos)
        pos = fnl + 1
        if pos + fsize > len(data):
            raise ValueError("truncated Y4M frame")
        frames.append(data[pos : pos + fsize])
        pos += fsize
    if not frames:
        raise ValueError("Y4M stream has no frames")
    return Y4MStream(width, height, fps_num, fps_den, colorspace, frames)


def decode_y4m_frame(stream: Y4MStream, idx: int) -> bytes:
    """One frame → top-down RGB bytes (full-range BT.601, box upsample)."""
    w, h = stream.width, stream.height
    raw = stream.frames[idx]
    key = _cs_key(stream.colorspace)
    y = (
        np.frombuffer(raw[: w * h], dtype=np.uint8)
        .reshape(h, w)
        .astype(np.float64)
    )
    if key == "mono":
        g = np.clip(np.rint(y), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1).tobytes()
    sx, sy = _PLANE_FACTORS[key]
    cw, ch = (w + sx - 1) // sx, (h + sy - 1) // sy
    usz = cw * ch
    u = (
        np.frombuffer(raw[w * h : w * h + usz], dtype=np.uint8)
        .reshape(ch, cw)
        .astype(np.float64)
    )
    v = (
        np.frombuffer(raw[w * h + usz : w * h + 2 * usz], dtype=np.uint8)
        .reshape(ch, cw)
        .astype(np.float64)
    )
    u = np.repeat(np.repeat(u, sy, axis=0), sx, axis=1)[:h, :w]
    v = np.repeat(np.repeat(v, sy, axis=0), sx, axis=1)[:h, :w]
    r = y + 1.402 * (v - 128.0)
    g = y - 0.344136 * (u - 128.0) - 0.714136 * (v - 128.0)
    b = y + 1.772 * (u - 128.0)
    return np.stack(
        [np.clip(np.rint(c), 0, 255).astype(np.uint8) for c in (r, g, b)],
        axis=-1,
    ).tobytes()


def encode_y4m(
    width: int,
    height: int,
    rgb_frames: list[bytes],
    fps_num: int = 25,
    fps_den: int = 1,
    colorspace: str = "444",
) -> bytes:
    """Top-down RGB frames → Y4M (C444 exact, or C420jpeg box-subsampled).
    Used to build real fixtures in tests."""
    if colorspace not in ("444", "420jpeg"):
        raise ValueError("encoder supports C444 and C420jpeg")
    if colorspace == "420jpeg" and (width % 2 or height % 2):
        raise ValueError("C420 needs even dimensions")
    out = bytearray()
    out += Y4M_MAGIC + (
        f"W{width} H{height} F{fps_num}:{fps_den} Ip A0:0 C{colorspace}"
    ).encode() + b"\n"
    for rgb in rgb_frames:
        if len(rgb) != width * height * 3:
            raise ValueError("rgb frame length must be width*height*3")
        px = (
            np.frombuffer(rgb, dtype=np.uint8)
            .reshape(height, width, 3)
            .astype(np.float64)
        )
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        u = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        v = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        out += b"FRAME\n"
        out += np.clip(np.rint(y), 0, 255).astype(np.uint8).tobytes()
        if colorspace == "444":
            out += np.clip(np.rint(u), 0, 255).astype(np.uint8).tobytes()
            out += np.clip(np.rint(v), 0, 255).astype(np.uint8).tobytes()
        else:  # 420jpeg: 2x2 box average
            for plane in (u, v):
                ph = plane[: (height // 2) * 2, : (width // 2) * 2]
                sub = (
                    ph.reshape(height // 2, 2, width // 2, 2).mean(
                        axis=(1, 3)
                    )
                )
                out += np.clip(np.rint(sub), 0, 255).astype(
                    np.uint8
                ).tobytes()
    return bytes(out)
