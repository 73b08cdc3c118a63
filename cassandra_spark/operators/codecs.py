"""Dependency-free image codecs for the L4 multimodal tier: BMP (24-bit
uncompressed), PPM (P6 binary), and baseline sequential JPEG (operators/
jpeg.py — pure Python + numpy) decode, plus nearest-neighbor resampling —
so the decode → resize pipeline runs REAL bytes end-to-end in this
container (`allow_stub=False`).

PNG (zlib+filters) and video stay behind the stub gate in
llm_multimodal.py; progressive/arithmetic JPEG raises and degrades to the
stub path. The Spark-side contract (batch shape, schema, partitioning) is
identical either way.

All functions are worker-safe pure functions over bytes: they run inside
Arrow-batched mapInPandas with no driver state.
"""

from __future__ import annotations

import struct

BMP_MIME = "image/bmp"
PPM_MIME = "image/x-portable-pixmap"
JPEG_MIME = "image/jpeg"


def sniff_mime(data: bytes) -> str | None:
    """Magic-number sniff for the locally-decodable formats."""
    if data[:2] == b"BM":
        return BMP_MIME
    if data[:2] == b"P6":
        return PPM_MIME
    if data[:3] == b"\xff\xd8\xff":
        return JPEG_MIME
    return None


# --- BMP (Windows BITMAPINFOHEADER, 24 bpp, uncompressed) ------------------


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB bytes → 24-bit BMP (bottom-up rows, 4-byte padded, BGR
    pixel order per the format). Used to build real fixtures in tests."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    row_size = (width * 3 + 3) & ~3
    image_size = row_size * height
    offset = 14 + 40
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", offset + image_size, 0, 0, offset)
    out += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    pad = b"\x00" * (row_size - width * 3)
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        base = y * width * 3
        for x in range(width):
            r, g, b = rgb[base + 3 * x : base + 3 * x + 3]
            row += bytes((b, g, r))  # BGR on disk
        out += row + pad
    return bytes(out)


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """24-bit uncompressed BMP → (width, height, 3, top-down RGB bytes).
    Handles positive (bottom-up) and negative (top-down) heights."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError("unsupported BMP header")
    width, height = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    if len(data) < offset + row_size * height:
        raise ValueError("truncated BMP payload")
    rgb = bytearray(width * height * 3)
    for out_y in range(height):
        src_y = (height - 1 - out_y) if bottom_up else out_y
        base = offset + src_y * row_size
        obase = out_y * width * 3
        for x in range(width):
            b, g, r = data[base + 3 * x : base + 3 * x + 3]
            rgb[obase + 3 * x : obase + 3 * x + 3] = bytes((r, g, b))
    return width, height, 3, bytes(rgb)


# --- PPM (P6 binary) -------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_ppm(data: bytes) -> tuple[int, int, int, bytes]:
    """P6 PPM (maxval ≤ 255) → (width, height, 3, top-down RGB bytes)."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 whitespace-separated ints, '#' comments allowed
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = width * height * 3
    if len(data) < pos + n:
        raise ValueError("truncated PPM payload")
    return width, height, 3, bytes(data[pos : pos + n])


def decode_image(data: bytes) -> tuple[str, int, int, int, bytes] | None:
    """Dispatch on magic number: (mime, w, h, channels, top-down RGB), or
    None when the format isn't locally decodable (caller decides
    stub/raise). Raises ValueError for recognized-but-unsupported variants
    (e.g. progressive JPEG) — decode_batch degrades those to the stub."""
    mime = sniff_mime(data)
    if mime == BMP_MIME:
        return (mime, *decode_bmp(data))
    if mime == PPM_MIME:
        return (mime, *decode_ppm(data))
    if mime == JPEG_MIME:
        from cassandra_spark.operators.jpeg import decode_jpeg

        return (mime, *decode_jpeg(data))
    return None


# --- resampling ------------------------------------------------------------


def resize_nearest(
    rgb: bytes, width: int, height: int, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resample of top-down RGB bytes (the classic
    sample-at-pixel-center mapping)."""
    out = bytearray(out_w * out_h * 3)
    for oy in range(out_h):
        sy = min(height - 1, (oy * height + height // 2) // out_h)
        sbase = sy * width * 3
        obase = oy * out_w * 3
        for ox in range(out_w):
            sx = min(width - 1, (ox * width + width // 2) // out_w)
            out[obase + 3 * ox : obase + 3 * ox + 3] = rgb[
                sbase + 3 * sx : sbase + 3 * sx + 3
            ]
    return bytes(out)


def rgb_features(rgb: bytes) -> list[float]:
    """The 4-dim image feature the decode stage emits for real pixels:
    channel means + ITU-R 601 luma — cheap, deterministic, and enough to
    drive downstream dedup/ANN demos on real decoded content."""
    n = len(rgb) // 3
    if n == 0:
        return [0.0, 0.0, 0.0, 0.0]
    rs = sum(rgb[0::3]) / n
    gs = sum(rgb[1::3]) / n
    bs = sum(rgb[2::3]) / n
    return [rs, gs, bs, 0.299 * rs + 0.587 * gs + 0.114 * bs]
