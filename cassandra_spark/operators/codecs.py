"""Dependency-free image codecs for the L4 multimodal tier: BMP (24-bit
uncompressed), PPM (P6 binary), PNG (zlib + per-row filters; EVERY legal
depth 1/2/4/8/16, non-interlaced and Adam7 — including interlaced
sub-byte bit-packing), GIF (87a/89a LZW, interlaced and not), and
baseline + progressive JPEG (operators/jpeg.py — pure Python + numpy)
decode, plus nearest-neighbor resampling — so the decode → resize
pipeline runs REAL bytes end-to-end in this container
(`allow_stub=False`).

Video decode for AVI containers (MJPG / raw-DIB) lives in operators/
avi.py and animated GIF decodes here (decode_gif_frames); arithmetic-
coded JPEG (SOF9 sequential + SOF10 progressive, QM-coder) decodes in
operators/jpeg_arith.py; 12-bit precision decodes with output scaled to the
8-bit RGB contract; lossless SOF3 decodes byte-exactly and hierarchical
progressions (DHP/EXP/SOF5) decode in jpeg.py. The remaining gated
variants (arithmetic differential/lossless JPEG, compressed non-AVI/
non-Y4M video containers) degrade to the stub path in
llm_multimodal.py. The Spark-side contract
(batch shape, schema, partitioning) is identical either way.

All functions are worker-safe pure functions over bytes: they run inside
Arrow-batched mapInPandas with no driver state.
"""

from __future__ import annotations

import struct

BMP_MIME = "image/bmp"
PPM_MIME = "image/x-portable-pixmap"
JPEG_MIME = "image/jpeg"
PNG_MIME = "image/png"

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_mime(data: bytes) -> str | None:
    """Magic-number sniff for the locally-decodable formats."""
    if data[:2] == b"BM":
        return BMP_MIME
    if data[:2] == b"P6":
        return PPM_MIME
    if data[:3] == b"\xff\xd8\xff":
        return JPEG_MIME
    if data[:8] == _PNG_SIG:
        return PNG_MIME
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "video/x-msvideo"  # demuxed by operators/avi.py, not here
    if data[:10] == b"YUV4MPEG2 ":
        return "video/x-yuv4mpeg"  # demuxed by operators/y4m.py
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "video/mp4"  # ISO-BMFF, demuxed by operators/mp4.py
    if data[:4] == b"\x1a\x45\xdf\xa3":
        return "video/x-matroska"  # EBML, demuxed by operators/mkv.py
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return GIF_MIME
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


# --- PNG (stdlib zlib inflate + per-row filter reversal) -------------------


# Adam7 pass geometry: (x_start, y_start, x_step, y_step) per PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_pass_dims(width: int, height: int) -> list[tuple[int, int]]:
    """(pass_width, pass_height) per Adam7 pass; zero-size passes are
    legal (small images) and carry no bytes."""
    return [
        (
            max(0, (width - x0 + dx - 1) // dx),
            max(0, (height - y0 + dy - 1) // dy),
        )
        for x0, y0, dx, dy in _ADAM7
    ]


def encode_png(
    width: int, height: int, rgb: bytes, interlace: bool = False,
    depth: int = 8,
) -> bytes:
    """Top-down RGB bytes → truecolor PNG (filter 0 rows, one IDAT);
    ``interlace=True`` writes the Adam7 pass sequence, ``depth=16``
    widens each 8-bit sample to ``v*257`` (the exact high-byte inverse).
    Used to build real fixtures in tests."""
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    if depth not in (8, 16):
        raise ValueError("encoder supports depth 8 or 16")

    def px(i: int) -> bytes:
        p = rgb[i : i + 3]
        if depth == 8:
            return p
        return b"".join(struct.pack(">H", v * 257) for v in p)

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, 2, 0, 0, 1 if interlace else 0
    )
    raw = bytearray()
    if interlace:
        for (x0, y0, dx, dy), (pw, ph) in zip(
            _ADAM7, _adam7_pass_dims(width, height)
        ):
            if pw == 0 or ph == 0:
                continue
            for py in range(ph):
                raw.append(0)  # filter type 0 (None)
                y = y0 + py * dy
                for px_ in range(pw):
                    x = x0 + px_ * dx
                    raw += px((y * width + x) * 3)
    else:
        for y in range(height):
            raw.append(0)  # filter type 0 (None)
            for x in range(width):
                raw += px((y * width + x) * 3)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def _defilter(
    raw: bytes,
    p: int,
    width_px: int,
    height: int,
    channels: int,
    sample_bytes: int = 1,
    row_bytes: int | None = None,
) -> tuple[bytearray, int]:
    """Reverse per-row PNG filters (0 none, 1 sub, 2 up, 3 average,
    4 paeth) for one image (or one Adam7 pass) of ``height`` rows of
    ``width_px`` pixels starting at stream offset ``p``. Returns the
    defiltered samples and the offset after the last row. ``sample_bytes``
    is 2 for 16-bit depth (filters operate bytewise with a 2x-wide pixel
    unit, PNG spec §9.2); ``row_bytes`` overrides the stride for
    bit-packed sub-byte depths (where the pixel unit is one byte)."""
    stride = row_bytes if row_bytes is not None else (
        width_px * channels * sample_bytes
    )
    bpp = max(1, channels * sample_bytes) if row_bytes is None else 1
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        if p >= len(raw):
            raise ValueError("truncated PNG image data")
        ftype = raw[p]
        row = bytearray(raw[p + 1 : p + 1 + stride])
        if len(row) != stride:
            raise ValueError("truncated PNG image data")
        p += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pr) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = row
        prev = bytes(row)
    return out, p


def decode_png(
    data: bytes, keep_alpha: bool = False
) -> tuple[int, int, int, bytes]:
    """8-bit PNG → (width, height, 3, top-down RGB bytes), non-interlaced
    OR Adam7 interlaced (each pass defiltered independently, pixels
    scattered per the pass grid — PNG spec §8.2). Color types: 0
    grayscale, 2 RGB, 3 palette, 4 gray+alpha, 6 RGBA (alpha is dropped —
    the pipeline contract is 3-channel RGB). Depths: 8 and 16 for every
    color type (16-bit samples reduce to their high byte), 1/2/4 for
    gray/palette (bit-packed rows, non-interlaced AND Adam7 — each pass
    packs its reduced rows independently per spec §8.2).

    ``keep_alpha`` returns (w, h, 4, RGBA) instead — real alpha for color
    types 4/6; for 0/2/3 the ``tRNS`` chunk applies (per-index alpha for
    palettes, the single transparent sample/colour otherwise), opaque 255
    elsewhere (APNG compositing needs all of this)."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = b""
    trns = b""
    idat = bytearray()
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"PLTE":
            plte = payload
        elif ctype == b"tRNS":
            trns = payload
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, ctype_, comp, filt, interlace = ihdr
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if depth == 16 and ctype_ == 3:
        raise ValueError("16-bit palette PNG is not a legal combination")
    if depth < 8 and ctype_ not in (0, 3):
        raise ValueError(
            f"sub-byte depth {depth} is only legal for gray/palette"
        )
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype_}")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad PNG zlib stream: {e}") from None
    sample_bytes = 2 if depth == 16 else 1
    stride = width * channels * sample_bytes

    if depth < 8:
        # bit-packed rows (MSB-first); filters operate with a 1-byte unit.
        # Interlaced images pack each Adam7 pass's rows INDEPENDENTLY
        # (PNG spec §8.2: a pass is a reduced image), so the pass loop and
        # the bit unpacking compose: defilter a pass, unpack its samples,
        # scatter them onto the full grid.
        out = bytearray(width * height)
        maxval = (1 << depth) - 1
        passes = (
            [((0, 0, 1, 1), (width, height))]
            if interlace == 0
            else list(zip(_ADAM7, _adam7_pass_dims(width, height)))
        )
        p = 0
        for (x0, y0, dx, dy), (pw, ph) in passes:
            if pw == 0 or ph == 0:
                continue
            row_bytes = (pw * depth + 7) // 8
            packed, p = _defilter(raw, p, pw, ph, 1, 1, row_bytes=row_bytes)
            for py in range(ph):
                base = py * row_bytes
                y = y0 + py * dy
                for px_i in range(pw):
                    bitpos = px_i * depth
                    byte = packed[base + (bitpos >> 3)]
                    v = (byte >> (8 - depth - (bitpos & 7))) & maxval
                    # gray samples scale to full range; palette indexes don't
                    out[y * width + x0 + px_i * dx] = (
                        v * 255 // maxval if ctype_ == 0 else v
                    )
    elif interlace == 0:
        out, _ = _defilter(raw, 0, width, height, channels, sample_bytes)
    else:
        # Adam7: 7 independently-filtered passes, scattered onto the grid
        out = bytearray(stride * height)
        px_bytes = channels * sample_bytes
        p = 0
        for (x0, y0, dx, dy), (pw, ph) in zip(
            _ADAM7, _adam7_pass_dims(width, height)
        ):
            if pw == 0 or ph == 0:
                continue
            sub, p = _defilter(raw, p, pw, ph, channels, sample_bytes)
            for py in range(ph):
                y = y0 + py * dy
                for px in range(pw):
                    x = x0 + px * dx
                    src = (py * pw + px) * px_bytes
                    dst = (y * width + x) * px_bytes
                    out[dst : dst + px_bytes] = sub[src : src + px_bytes]
    if depth == 16:
        # 16 -> 8 bit: keep the high byte of each big-endian sample
        out = out[0::2]

    if keep_alpha:
        rgba = bytearray(width * height * 4)
        if ctype_ == 6:
            rgba[:] = out[: width * height * 4]
        elif ctype_ == 4:
            for i in range(width * height):
                g, a = out[2 * i], out[2 * i + 1]
                rgba[4 * i : 4 * i + 4] = bytes((g, g, g, a))
        elif ctype_ == 2:
            # tRNS for truecolour: one 2-byte field per channel — the
            # sample lives in the LOW byte for depth < 16; our 16-bit
            # reduction keeps high bytes, so match the byte accordingly
            _b = 0 if depth == 16 else 1
            tr = (
                (trns[_b], trns[2 + _b], trns[4 + _b])
                if len(trns) >= 6
                else None
            )
            for i in range(width * height):
                px = out[3 * i : 3 * i + 3]
                rgba[4 * i : 4 * i + 3] = px
                rgba[4 * i + 3] = (
                    0 if tr is not None and tuple(px) == tr else 255
                )
        elif ctype_ == 0:
            # 2-byte field: low byte for depth < 16, high for 16
            tr = (
                trns[0 if depth == 16 else 1]
                if len(trns) >= 2
                else None
            )
            if tr is not None and depth < 8:
                # sub-byte samples were scaled to 0-255 at unpack
                # (v*255//maxval); the tRNS value is raw 0..maxval —
                # scale it identically or transparency never matches
                tr = (tr * 255) // ((1 << depth) - 1)
            for i in range(width * height):
                g = out[i]
                rgba[4 * i : 4 * i + 4] = bytes(
                    (g, g, g, 0 if tr is not None and g == tr else 255)
                )
        else:  # palette: tRNS carries per-index alpha (short = opaque)
            if not plte:
                raise ValueError("palette PNG missing PLTE")
            for i in range(width * height):
                pi = out[i]
                idx = pi * 3
                if idx + 3 > len(plte):
                    raise ValueError("palette index out of range")
                rgba[4 * i : 4 * i + 3] = plte[idx : idx + 3]
                rgba[4 * i + 3] = trns[pi] if pi < len(trns) else 255
        return width, height, 4, bytes(rgba)

    # expand to 3-channel RGB
    if ctype_ == 2:
        return width, height, 3, bytes(out)
    rgb = bytearray(width * height * 3)
    if ctype_ == 0:  # grayscale
        for i in range(width * height):
            g = out[i]
            rgb[3 * i : 3 * i + 3] = bytes((g, g, g))
    elif ctype_ == 4:  # gray + alpha (alpha dropped)
        for i in range(width * height):
            g = out[2 * i]
            rgb[3 * i : 3 * i + 3] = bytes((g, g, g))
    elif ctype_ == 6:  # RGBA (alpha dropped)
        for i in range(width * height):
            rgb[3 * i : 3 * i + 3] = out[4 * i : 4 * i + 3]
    else:  # palette
        if not plte:
            raise ValueError("palette PNG missing PLTE")
        for i in range(width * height):
            idx = out[i] * 3
            if idx + 3 > len(plte):
                raise ValueError("palette index out of range")
            rgb[3 * i : 3 * i + 3] = plte[idx : idx + 3]
    return width, height, 3, bytes(rgb)


def decode_image(data: bytes) -> tuple[str, int, int, int, bytes] | None:
    """Dispatch on magic number: (mime, w, h, channels, top-down RGB), or
    None when the format isn't locally decodable (caller decides
    stub/raise). Raises ValueError for recognized-but-unsupported
    variants (e.g. arithmetic-lossless JPEG) or corrupt payloads —
    decode_batch degrades those to the stub."""
    mime = sniff_mime(data)
    if mime == BMP_MIME:
        return (mime, *decode_bmp(data))
    if mime == PPM_MIME:
        return (mime, *decode_ppm(data))
    if mime == JPEG_MIME:
        from cassandra_spark.operators.jpeg import decode_jpeg

        return (mime, *decode_jpeg(data))
    if mime == PNG_MIME:
        return (mime, *decode_png(data))
    if mime == GIF_MIME:
        return (mime, *decode_gif(data))
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


# --- GIF (87a/89a, LZW) ----------------------------------------------------

GIF_MIME = "image/gif"


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytearray:
    """GIF-variant LZW: variable-width codes (little-endian bit packing),
    clear/end-of-information codes, table rebuilds, 12-bit cap."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8

    def fresh_table() -> list[bytes]:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh_table()
    code_size = min_code_size + 1
    prev: bytes | None = None
    while bitpos + code_size <= nbits:
        # little-endian bit order: LSB of the stream first
        byte0 = bitpos >> 3
        window = int.from_bytes(
            data[byte0 : byte0 + 3], "little"
        ) >> (bitpos & 7)
        code = window & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = fresh_table()
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        if len(out) >= n_expected:
            break
    if len(out) < n_expected:
        raise ValueError("LZW stream ended before the raster filled")
    return out[:n_expected]


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """GIF-variant LZW encoder (for test fixtures): emits clear, codes
    with growing width, end-of-information."""
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += code_size
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    emit(clear)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= (1 << 12):
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run])
    emit(end)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_frames(
    data: bytes,
) -> tuple[int, int, list[tuple[int, bytes]]]:
    """GIF87a/89a animation → (screen_w, screen_h, [(delay_ms, rgb)])
    where each rgb is the top-down RGB raster of the COMPOSITED logical
    screen after rendering that frame. Full 89a animation semantics:
    graphic-control delays (centiseconds → ms), transparency (pixels of
    the transparent index leave the canvas unchanged — how animations
    ship delta frames), and disposal methods 1 (leave), 2 (restore the
    frame rect to background), 3 (restore the frame rect to the previous
    canvas). Global/local color tables and interlacing per frame."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = b""
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = data[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n
    bg_px = (
        gct[3 * bg : 3 * bg + 3]
        if gct and 3 * bg + 3 <= len(gct)
        else b"\x00\x00\x00"
    )
    canvas = bytearray(bg_px * (sw * sh))
    frames: list[tuple[int, bytes]] = []
    # graphic-control state: applies to the NEXT image only (89a spec)
    transparent = -1
    delay_ms = 0
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos]
            pos += 1
            if label == 0xF9 and pos + 5 <= len(data) and data[pos] == 4:
                gflags = data[pos + 1]
                delay_ms = struct.unpack_from("<H", data, pos + 2)[0] * 10
                disposal = (gflags >> 2) & 7
                transparent = data[pos + 4] if gflags & 1 else -1
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1  # block terminator
            continue
        if block != 0x2C:  # image descriptor
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            table = data[pos : pos + 3 * n]
            if len(table) < 3 * n:
                raise ValueError("truncated GIF local color table")
            pos += 3 * n
        if not table:
            raise ValueError("GIF image has no color table")
        if pos >= len(data):
            raise ValueError("truncated GIF image data")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            n = data[pos]
            lzw += data[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1  # sub-block terminator
        idx = _lzw_decode(min_code_size, bytes(lzw), iw * ih)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            rows = []
            for start, step in _GIF_INTERLACE_PASSES:
                rows += list(range(start, ih, step))
            deinter = bytearray(iw * ih)
            for src_row, y in enumerate(rows):
                deinter[y * iw : (y + 1) * iw] = idx[
                    src_row * iw : (src_row + 1) * iw
                ]
            idx = deinter
        prev = bytes(canvas) if disposal == 3 else b""
        for y in range(ih):
            if iy + y >= sh:
                break
            for x in range(iw):
                if ix + x >= sw:
                    break
                ci = idx[y * iw + x]
                if ci == transparent:
                    continue  # delta frame: underlying canvas shows through
                off = 3 * ci
                if off + 3 > len(table):
                    raise ValueError("GIF color index out of range")
                d = ((iy + y) * sw + (ix + x)) * 3
                canvas[d : d + 3] = table[off : off + 3]
        frames.append((delay_ms, bytes(canvas)))
        if disposal == 2:  # restore the frame rect to background
            for y in range(ih):
                if iy + y >= sh:
                    break
                for x in range(iw):
                    if ix + x >= sw:
                        break
                    d = ((iy + y) * sw + (ix + x)) * 3
                    canvas[d : d + 3] = bg_px
        elif disposal == 3 and prev:  # restore to the pre-frame canvas
            canvas = bytearray(prev)
        transparent, delay_ms, disposal = -1, 0, 0
    if not frames:
        raise ValueError("GIF contains no image frame")
    return sw, sh, frames


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """GIF87a/89a → (width, height, 3, top-down RGB) of the FIRST frame
    composited on the logical screen (uncovered area takes the background
    color); transparency in a first frame renders as background — the
    pipeline contract is opaque RGB. Full animations: decode_gif_frames."""
    sw, sh, frames = decode_gif_frames(data)
    return sw, sh, 3, frames[0][1]


def encode_gif(
    width: int, height: int, rgb: bytes, interlace: bool = False
) -> bytes:
    """Top-down RGB bytes (≤256 distinct colors) → single-frame GIF89a.
    Used to build real fixtures in tests."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    palette: dict[bytes, int] = {}
    indices = bytearray()
    for i in range(0, len(rgb), 3):
        c = rgb[i : i + 3]
        if c not in palette:
            if len(palette) == 256:
                raise ValueError("more than 256 distinct colors")
            palette[c] = len(palette)
        indices.append(palette[c])
    depth = max(1, (len(palette) - 1).bit_length())
    n = 1 << depth
    table = b"".join(palette) + b"\x00\x00\x00" * (n - len(palette))
    if interlace:
        reordered = bytearray()
        for start, step in _GIF_INTERLACE_PASSES:
            for y in range(start, height, step):
                reordered += indices[y * width : (y + 1) * width]
        indices = reordered
    min_code_size = max(2, depth)
    lzw = _lzw_encode(min_code_size, bytes(indices))
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    out += table
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, width, height, 0x40 if interlace else 0
    )
    out.append(min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_gif_animated(
    width: int,
    height: int,
    frames: list[tuple[int, int, int, int, bytes, int, int, bytes | None]],
    *,
    loop: bool = True,
) -> bytes:
    """Animated GIF89a from composable delta frames. Each frame is
    ``(x, y, w, h, rgb, delay_ms, disposal, transparent_rgb)`` — ``rgb``
    is the top-down w*h*3 subrect painted at (x, y); pixels equal to
    ``transparent_rgb`` (when not None) are written as the transparent
    index so the underlying canvas shows through. ``disposal`` is the
    GIF disposal method (0/1 leave, 2 restore-background, 3
    restore-previous). No global color table (background renders black,
    matching the decoder's fallback); one local table per frame. Used to
    build real animation fixtures in tests."""
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0, 0, 0)
    if loop:  # Netscape 2.0 looping extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for x, y, w, h, rgb, delay_ms, disposal, transparent in frames:
        if len(rgb) != w * h * 3:
            raise ValueError("frame rgb length must be w*h*3")
        palette: dict[bytes, int] = {}
        trans_idx = -1
        if transparent is not None:
            palette[bytes(transparent)] = 0
            trans_idx = 0
        indices = bytearray()
        for i in range(0, len(rgb), 3):
            c = rgb[i : i + 3]
            if c not in palette:
                if len(palette) == 256:
                    raise ValueError("more than 256 distinct colors")
                palette[c] = len(palette)
            indices.append(palette[c])
        depth = max(1, (len(palette) - 1).bit_length())
        n = 1 << depth
        table = (
            b"".join(sorted(palette, key=palette.get))
            + b"\x00\x00\x00" * (n - len(palette))
        )
        gflags = (disposal & 7) << 2 | (1 if trans_idx >= 0 else 0)
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", gflags, max(0, delay_ms) // 10, max(0, trans_idx)
        ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", x, y, w, h, 0x80 | (depth - 1))
        out += table
        min_code_size = max(2, depth)
        out.append(min_code_size)
        lzw = _lzw_encode(min_code_size, bytes(indices))
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
