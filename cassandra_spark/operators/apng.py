"""APNG (animated PNG) demux + compositor for the L4 multimodal tier.

Per the public APNG spec (W3C PNG 3rd edition / the original Mozilla
extension): ``acTL`` declares the animation, each frame is an ``fcTL``
control chunk (region geometry, delay fraction, dispose/blend ops)
followed by its pixel data — the first frame may reuse the static
``IDAT``; later frames ship ``fdAT`` chunks (a sequence number prepended
to IDAT-equivalent bytes). Frames decode with the SAME IHDR
depth/colour-type as the static image and composite onto an RGBA canvas:

- blend_op 0 SOURCE replaces the region (including alpha),
  1 OVER is Porter-Duff over;
- dispose_op 0 NONE keeps the canvas, 1 BACKGROUND clears the region to
  transparent, 2 PREVIOUS restores the pre-frame region.

The emitted contract mirrors ``codecs.decode_gif_frames``: (w, h,
[(delay_ms, rgb)]) where each rgb is the flattened (over black)
composited canvas after the frame. A writer (`encode_apng`) produces
minimal valid APNGs so the demuxer round-trips without external samples
[clean-room transcription of the public spec].
"""

from __future__ import annotations

import struct
import zlib

from cassandra_spark.operators.codecs import decode_png

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def is_apng(data: bytes) -> bool:
    """PNG signature AND an acTL chunk before the first IDAT."""
    if data[:8] != _PNG_SIG:
        return False
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        if ctype == b"acTL":
            return True
        if ctype == b"IDAT":
            return False
        pos += 12 + length
    return False


def _chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated APNG chunk")
        yield ctype, payload
        pos += 12 + length
        if ctype == b"IEND":
            break


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(
        ">I", crc
    )


def decode_apng_frames(
    data: bytes,
) -> tuple[int, int, list[tuple[int, bytes]]]:
    """APNG → (width, height, [(delay_ms, composited_rgb)])."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = b""
    trns = b""
    actl = None
    default_idat = bytearray()
    frames: list[dict] = []  # {"fctl": tuple, "data": bytearray}
    seqs: list[int] = []
    seen_idat = False
    cur: dict | None = None
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            ihdr = payload
        elif ctype == b"PLTE":
            plte = payload
        elif ctype == b"tRNS":
            trns = payload
        elif ctype == b"acTL":
            actl = struct.unpack(">II", payload[:8])
        elif ctype == b"fcTL":
            f = struct.unpack(">IIIIIHHBB", payload[:26])
            seqs.append(f[0])
            cur = {"fctl": f, "data": bytearray()}
            frames.append(cur)
        elif ctype == b"IDAT":
            seen_idat = True
            default_idat += payload
            if cur is not None and len(frames) == 1:
                # an fcTL before IDAT makes the static image frame 1
                cur["data"] += payload
        elif ctype == b"fdAT":
            if cur is None:
                raise ValueError("fdAT before any fcTL")
            seqs.append(struct.unpack_from(">I", payload, 0)[0])
            cur["data"] += payload[4:]
    if ihdr is None or not seen_idat:
        raise ValueError("APNG missing IHDR/IDAT")
    if actl is None:
        raise ValueError("not an APNG (no acTL)")
    if not frames:
        raise ValueError("APNG with no fcTL frames")
    if seqs != list(range(len(seqs))):
        raise ValueError(f"APNG sequence numbers not contiguous: {seqs}")
    if actl[0] != len(frames):
        raise ValueError(
            f"acTL declares {actl[0]} frames, found {len(frames)}"
        )
    width, height = struct.unpack_from(">II", ihdr, 0)

    canvas = bytearray(width * height * 4)  # transparent black
    out: list[tuple[int, bytes]] = []
    for f in frames:
        (
            _seq, fw, fh, fx, fy, dnum, dden, dispose, blend,
        ) = f["fctl"]
        if not f["data"]:
            raise ValueError("APNG frame with no pixel data")
        if fx + fw > width or fy + fh > height:
            raise ValueError("APNG frame region exceeds the canvas")
        # a standalone PNG for the region: same depth/colour-type IHDR
        sub_ihdr = struct.pack(">II", fw, fh) + ihdr[8:]
        sub = (
            _PNG_SIG
            + _chunk(b"IHDR", sub_ihdr)
            + (_chunk(b"PLTE", plte) if plte else b"")
            + (_chunk(b"tRNS", trns) if trns else b"")
            + _chunk(b"IDAT", bytes(f["data"]))
            + _chunk(b"IEND", b"")
        )
        _, _, _, rgba = decode_png(sub, keep_alpha=True)
        prev = bytes(canvas) if dispose == 2 else None
        for ry in range(fh):
            crow = ((fy + ry) * width + fx) * 4
            srow = ry * fw * 4
            if blend == 0:  # SOURCE: replace the region
                canvas[crow : crow + fw * 4] = rgba[srow : srow + fw * 4]
            else:  # OVER
                for rx in range(fw):
                    s = srow + rx * 4
                    d = crow + rx * 4
                    sa = rgba[s + 3]
                    if sa == 255:
                        canvas[d : d + 4] = rgba[s : s + 4]
                    elif sa:
                        da = canvas[d + 3]
                        oa = sa + da * (255 - sa) // 255
                        for c in range(3):
                            canvas[d + c] = (
                                rgba[s + c] * sa
                                + canvas[d + c] * da * (255 - sa) // 255
                            ) // max(oa, 1)
                        canvas[d + 3] = oa
        # flatten over black for the emitted RGB contract
        rgb = bytearray(width * height * 3)
        for i in range(width * height):
            a = canvas[4 * i + 3]
            for c in range(3):
                rgb[3 * i + c] = canvas[4 * i + c] * a // 255
        delay_ms = dnum * 1000 // (dden or 100)
        out.append((delay_ms, bytes(rgb)))
        # dispose for the NEXT frame
        if dispose == 1:  # BACKGROUND: region -> transparent
            for ry in range(fh):
                crow = ((fy + ry) * width + fx) * 4
                canvas[crow : crow + fw * 4] = bytes(fw * 4)
        elif dispose == 2 and prev is not None:  # PREVIOUS
            for ry in range(fh):
                crow = ((fy + ry) * width + fx) * 4
                canvas[crow : crow + fw * 4] = prev[crow : crow + fw * 4]
    return width, height, out


def _idat_for(rgb: bytes, w: int, h: int) -> bytes:
    rows = b"".join(
        b"\x00" + rgb[y * w * 3 : (y + 1) * w * 3] for y in range(h)
    )
    return zlib.compress(rows, 6)


def encode_apng(
    width: int,
    height: int,
    frames_rgb: list[bytes],
    delays_ms: list[int] | None = None,
    num_plays: int = 0,
) -> bytes:
    """Full-canvas RGB frames → minimal valid APNG (colour-type 2,
    blend SOURCE, dispose NONE) — the demuxer's round-trip fixture."""
    if not frames_rgb:
        raise ValueError("at least one frame required")
    if delays_ms is not None and len(delays_ms) != len(frames_rgb):
        raise ValueError(
            f"delays_ms has {len(delays_ms)} entries for "
            f"{len(frames_rgb)} frames"
        )
    delays = delays_ms or [100] * len(frames_rgb)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    out = bytearray(_PNG_SIG)
    out += _chunk(b"IHDR", ihdr)
    out += _chunk(
        b"acTL", struct.pack(">II", len(frames_rgb), num_plays)
    )
    seq = 0
    for i, rgb in enumerate(frames_rgb):
        fctl = struct.pack(
            ">IIIIIHHBB", seq, width, height, 0, 0, delays[i], 1000, 0, 0
        )
        out += _chunk(b"fcTL", fctl)
        seq += 1
        idat = _idat_for(rgb, width, height)
        if i == 0:
            out += _chunk(b"IDAT", idat)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + idat)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)
