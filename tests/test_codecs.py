"""Pure-stdlib BMP/PPM codecs + the real (allow_stub=False) decode → resize
pipeline over actual image payloads."""

from __future__ import annotations

import pytest

from cassandra_spark.operators.codecs import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    resize_nearest,
    rgb_features,
    sniff_mime,
)


def _gradient(width: int, height: int) -> bytes:
    """Deterministic RGB test image: r=x, g=y, b=(x+y)%256, top-down."""
    out = bytearray()
    for y in range(height):
        for x in range(width):
            out += bytes((x % 256, y % 256, (x + y) % 256))
    return bytes(out)


def test_bmp_roundtrip():
    for w, h in [(1, 1), (3, 2), (5, 5), (7, 3)]:  # odd widths hit padding
        rgb = _gradient(w, h)
        data = encode_bmp(w, h, rgb)
        assert sniff_mime(data) == "image/bmp"
        assert decode_bmp(data) == (w, h, 3, rgb)


def test_ppm_roundtrip():
    rgb = _gradient(4, 3)
    data = encode_ppm(4, 3, rgb)
    assert sniff_mime(data) == "image/x-portable-pixmap"
    assert decode_ppm(data) == (4, 3, 3, rgb)
    # comments in the header are legal
    commented = b"P6\n# a comment\n4 3\n255\n" + rgb
    assert decode_ppm(commented) == (4, 3, 3, rgb)


def test_codec_rejections():
    with pytest.raises(ValueError):
        decode_bmp(b"nope")
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")  # grayscale PGM, not P6
    assert decode_image(b"\x89PNG\r\n") is None  # not stdlib-decodable
    with pytest.raises(ValueError):  # truncated body
        decode_ppm(b"P6\n4 4\n255\n\x00\x01")


def test_resize_nearest_semantics():
    rgb = _gradient(4, 4)
    # identity
    assert resize_nearest(rgb, 4, 4, 4, 4) == rgb
    # 2x downscale samples pixel centers: (1,1),(3,1),(1,3),(3,3)
    half = resize_nearest(rgb, 4, 4, 2, 2)
    px = lambda x, y: rgb[(y * 4 + x) * 3 : (y * 4 + x) * 3 + 3]  # noqa: E731
    assert half == px(1, 1) + px(3, 1) + px(1, 3) + px(3, 3)
    # 1x1 collapses to the center pixel
    assert resize_nearest(rgb, 4, 4, 1, 1) == px(2, 2)


def test_rgb_features_match_channel_means():
    rgb = bytes((10, 20, 30, 50, 60, 70))  # two pixels
    r, g, b, luma = rgb_features(rgb)
    assert (r, g, b) == (30.0, 40.0, 50.0)
    assert luma == pytest.approx(0.299 * 30 + 0.587 * 40 + 0.114 * 50)


def test_real_decode_resize_pipeline_no_stub(spark):
    """End-to-end over REAL image payloads with allow_stub=False: BMP and
    PPM fixtures decode to actual pixels, features are channel means, and
    resize produces genuinely resampled bytes."""
    from cassandra_spark.operators.llm_multimodal import (
        decode_documents,
        resize_decoded,
    )

    images = [
        (1, bytearray(encode_bmp(48, 24, _gradient(48, 24)))),
        (2, bytearray(encode_ppm(8, 8, _gradient(8, 8)))),
        (3, bytearray(encode_bmp(5, 64, _gradient(5, 64)))),
    ]
    docs = spark.createDataFrame(images, "doc_id bigint, payload binary")
    decoded = decode_documents(docs, payload_col="payload")  # no stub!
    rows = {r.doc_id: r for r in decoded.collect()}
    assert rows[1].mime == "image/bmp" and (rows[1].width, rows[1].height) == (48, 24)
    assert rows[2].mime == "image/x-portable-pixmap"
    assert bytes(rows[2].pixels) == _gradient(8, 8)
    assert rows[1].feat == pytest.approx(rgb_features(_gradient(48, 24)))

    out = {r.doc_id: r for r in resize_decoded(decoded, max_side=16).collect()}
    # aspect preserved, long side hits the box, pixels really resampled
    assert (out[1].out_width, out[1].out_height) == (16, 8)
    assert bytes(out[1].pixels) == resize_nearest(
        _gradient(48, 24), 48, 24, 16, 8
    )
    assert (out[2].out_width, out[2].out_height) == (8, 8)  # no upscale
    assert bytes(out[2].pixels) == _gradient(8, 8)
    assert (out[3].out_width, out[3].out_height) == (1, 16)
    assert len(bytes(out[3].pixels)) == 1 * 16 * 3


def test_mixed_real_and_unknown_payloads(spark):
    """A batch mixing a real BMP with an undecodable payload: refuses
    without allow_stub, decodes the BMP for real (and fakes the rest)
    with it."""
    from cassandra_spark.operators.llm_multimodal import decode_documents

    rows = [
        (1, bytearray(encode_bmp(4, 4, _gradient(4, 4)))),
        (2, bytearray(b"not an image")),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    with pytest.raises(Exception, match="codec|BMP/PPM"):
        decode_documents(docs, payload_col="payload").collect()
    got = {
        r.doc_id: r
        for r in decode_documents(
            docs, payload_col="payload", allow_stub=True
        ).collect()
    }
    assert got[1].mime == "image/bmp" and got[1].pixels is not None
    assert got[2].mime == "image/fake" and got[2].pixels is None


def test_sniff_false_positive_degrades_to_stub(spark):
    """Payloads that START with a codec magic ('BM', 'P6') but are not valid
    images must not kill the job: with allow_stub=True they fall through to
    the fake decoder; without it they raise the honest NotImplementedError."""
    from cassandra_spark.operators.llm_multimodal import decode_documents

    rows = [
        (1, bytearray(b"BMW is a car maker, not a bitmap header")),
        (2, bytearray(b"P6 is also a Pentium badge\n")),
        (3, bytearray(encode_bmp(2, 2, _gradient(2, 2))[:20])),  # truncated
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {
        r.doc_id: r
        for r in decode_documents(
            docs, payload_col="payload", allow_stub=True
        ).collect()
    }
    assert all(got[i].mime == "image/fake" for i in (1, 2, 3))
    with pytest.raises(Exception, match="codec|BMP/PPM"):
        decode_documents(docs, payload_col="payload").collect()


# --- baseline JPEG (operators/jpeg.py) -------------------------------------


def test_jpeg_roundtrip_error_bounds():
    """decode(encode(x)) differs from x only by quantization error; the
    bound tightens with quality."""
    import numpy as np

    from cassandra_spark.operators.jpeg import decode_jpeg, encode_jpeg

    for w, h in [(8, 8), (20, 12), (7, 5), (33, 17)]:
        rgb = _gradient(w, h)
        a = np.frombuffer(rgb, np.uint8).astype(int)
        for q, bound in ((50, 8), (85, 4), (95, 2)):
            data = encode_jpeg(w, h, rgb, q)
            assert sniff_mime(data) == "image/jpeg"
            w2, h2, c, out = decode_jpeg(data)
            assert (w2, h2, c) == (w, h, 3)
            err = np.abs(a - np.frombuffer(out, np.uint8).astype(int))
            assert err.max() <= bound, (w, h, q, err.max())


def test_jpeg_decodes_real_world_files():
    """Externally-produced baseline JPEGs (Spark's mllib sample images,
    4:2:0 photographic) decode; progressive ones raise ValueError."""
    import glob
    import os

    import pytest as _pytest

    from cassandra_spark.operators.jpeg import decode_jpeg

    root = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images"
    files = sorted(glob.glob(os.path.join(root, "**/*.jpg"), recursive=True))
    if not files:
        _pytest.skip("no sample JPEGs in this container")
    decoded = rejected = 0
    for f in files:
        data = open(f, "rb").read()
        try:
            w, h, c, rgb = decode_jpeg(data)
            assert c == 3 and len(rgb) == w * h * 3 and w > 0 and h > 0
            decoded += 1
        except ValueError:
            rejected += 1  # progressive/unsupported — stub path in pipeline
    assert decoded >= 1, "no baseline JPEG decoded"


def test_jpeg_matches_imageio_reference(spark):
    """Pixel-level cross-check against an independent decoder: Spark's
    `image` source (Java ImageIO). Differences come only from chroma
    upsampling choices, so the mean absolute error must stay tiny."""
    import glob

    import numpy as np
    import pytest as _pytest

    from cassandra_spark.operators.jpeg import decode_jpeg

    files = sorted(
        glob.glob(
            "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/*.jpg"
        )
    )
    if not files:
        _pytest.skip("no sample JPEGs in this container")
    path = files[0]
    row = spark.read.format("image").load(path).select("image.*").head()
    ref = (
        np.frombuffer(bytes(row.data), np.uint8)
        .reshape(row.height, row.width, row.nChannels)[..., ::-1]
        .astype(int)
    )
    w, h, c, rgb = decode_jpeg(open(path, "rb").read())
    assert (w, h) == (row.width, row.height)
    mine = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(int)
    err = np.abs(ref - mine)
    assert err.mean() < 1.0
    assert (err > 4).mean() < 0.01


def test_jpeg_through_decode_pipeline(spark):
    """A real JPEG payload flows through decode_documents with
    allow_stub=False: real pixels, real features, resize works."""
    from cassandra_spark.operators.jpeg import encode_jpeg
    from cassandra_spark.operators.llm_multimodal import (
        decode_documents,
        resize_decoded,
    )

    rgb = _gradient(32, 16)
    rows = [(1, bytearray(encode_jpeg(32, 16, rgb, 90)))]
    docs = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    decoded = decode_documents(docs, payload_col="payload")  # no stub
    got = decoded.collect()[0]
    assert got.mime == "image/jpeg"
    assert (got.width, got.height) == (32, 16)
    assert got.pixels is not None and len(bytes(got.pixels)) == 32 * 16 * 3
    out = resize_decoded(decoded, max_side=8).collect()[0]
    assert (out.out_width, out.out_height) == (8, 4)


# --- PNG (stdlib zlib) -----------------------------------------------------


def test_png_roundtrip_and_filter_reversal():
    """encode→decode is exact; a hand-built PNG exercising every filter
    type (sub/up/average/paeth) decodes back to the source pixels."""
    import struct
    import zlib

    from cassandra_spark.operators.codecs import (
        _PNG_SIG,
        decode_png,
        encode_png,
    )

    for w, h in [(1, 1), (5, 3), (16, 16), (33, 7)]:
        rgb = _gradient(w, h)
        data = encode_png(w, h, rgb)
        assert sniff_mime(data) == "image/png"
        assert decode_png(data) == (w, h, 3, rgb)

    # forward-filter a 4x5 image with one row per filter type
    w, h = 4, 5
    rgb = _gradient(w, h)
    stride = w * 3
    rows = [bytearray(rgb[y * stride : (y + 1) * stride]) for y in range(h)]
    raw = bytearray()
    prev = bytes(stride)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = rows[y]
        enc = bytearray(cur)
        if ftype == 1:
            for i in range(stride - 1, 2, -1):
                enc[i] = (cur[i] - cur[i - 3]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                enc[i] = (cur[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                a = cur[i - 3] if i >= 3 else 0
                enc[i] = (cur[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = cur[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (cur[i] - pr) & 0xFF
        raw.append(ftype)
        raw += enc
        prev = bytes(cur)

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    data = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert decode_png(data) == (w, h, 3, rgb)


def test_png_matches_imageio_reference(spark):
    """Pixel-exact cross-check against Java ImageIO on a real-world PNG
    (PNG is lossless, so unlike JPEG the comparison is exact equality)."""
    import os

    import numpy as np
    import pytest as _pytest

    from cassandra_spark.operators.codecs import decode_png

    path = "/usr/share/gitweb/static/git-logo.png"
    if not os.path.exists(path):
        _pytest.skip("no system PNG available")
    row = spark.read.format("image").load(path).select("image.*").head()
    w, h, c, rgb = decode_png(open(path, "rb").read())
    assert (w, h) == (row.width, row.height)
    ref = (
        np.frombuffer(bytes(row.data), np.uint8)
        .reshape(row.height, row.width, row.nChannels)[..., :3][..., ::-1]
    )
    mine = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    assert np.array_equal(ref, mine)


def test_png_through_decode_pipeline(spark):
    from cassandra_spark.operators.codecs import encode_png
    from cassandra_spark.operators.llm_multimodal import decode_documents

    rgb = _gradient(10, 6)
    docs = spark.createDataFrame(
        [(1, bytearray(encode_png(10, 6, rgb)))], "doc_id bigint, payload binary"
    )
    got = decode_documents(docs, payload_col="payload").collect()[0]  # no stub
    assert got.mime == "image/png"
    assert (got.width, got.height) == (10, 6)
    assert bytes(got.pixels) == rgb


# --- Adam7 interlaced PNG ---------------------------------------------------


def _gradient_rgb(w: int, h: int) -> bytes:
    return bytes(
        ((x * 7 + y * 13 + c * 29) % 256)
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


def test_adam7_roundtrip_exact():
    from cassandra_spark.operators.codecs import decode_png, encode_png

    for w, h in ((16, 16), (17, 13), (8, 8), (5, 3)):
        rgb = _gradient_rgb(w, h)
        data = encode_png(w, h, rgb, interlace=True)
        dw, dh, ch, out = decode_png(data)
        assert (dw, dh, ch) == (w, h, 3)
        assert out == rgb, f"{w}x{h} interlaced roundtrip mismatch"


def test_adam7_matches_noninterlaced_decode():
    from cassandra_spark.operators.codecs import decode_png, encode_png

    rgb = _gradient_rgb(23, 11)
    plain = decode_png(encode_png(23, 11, rgb))
    inter = decode_png(encode_png(23, 11, rgb, interlace=True))
    assert plain == inter


def test_adam7_tiny_images_skip_empty_passes():
    # 1x1 through 4x4: several Adam7 passes are empty; decode must not
    # consume bytes for them
    from cassandra_spark.operators.codecs import decode_png, encode_png

    for w, h in ((1, 1), (2, 2), (3, 1), (1, 5), (4, 4)):
        rgb = _gradient_rgb(w, h)
        assert decode_png(encode_png(w, h, rgb, interlace=True))[3] == rgb


def test_adam7_flows_through_decode_image():
    from cassandra_spark.operators.codecs import decode_image, encode_png

    rgb = _gradient_rgb(9, 6)
    mime, w, h, ch, out = decode_image(encode_png(9, 6, rgb, interlace=True))
    assert (mime, w, h, ch) == ("image/png", 9, 6, 3)
    assert out == rgb


# --- progressive JPEG (SOF2) ------------------------------------------------


def test_progressive_jpeg_matches_baseline_pixels():
    """The 10-scan progressive script (DC first with point transform,
    spectral bands, DC refine, chained AC refinements) must reconstruct
    EXACTLY the pixels the baseline scan produces for the same quantized
    coefficients — scan scripting cannot change the rendered image."""
    import numpy as np

    from cassandra_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(3)
    for w, h in ((16, 16), (24, 17), (8, 8), (33, 9)):
        base = (np.add.outer(np.arange(h) * 3, np.arange(w) * 5) % 256)
        img = np.stack([base, 255 - base, (base * 2) % 256], axis=-1)
        img = np.clip(
            img + rng.normal(0, 20, img.shape), 0, 255
        ).astype(np.uint8)
        rgb = img.tobytes()
        assert (
            decode_jpeg(encode_jpeg_progressive(w, h, rgb))[3]
            == decode_jpeg(encode_jpeg(w, h, rgb))[3]
        ), f"{w}x{h}"


def test_progressive_jpeg_through_decode_image():
    import numpy as np

    from cassandra_spark.operators.codecs import decode_image
    from cassandra_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (12, 20, 3), dtype=np.uint8)
    out = decode_image(encode_jpeg_progressive(20, 12, img.tobytes()))
    assert out is not None
    mime, w, h, ch, rgb = out
    assert (mime, w, h, ch) == ("image/jpeg", 20, 12, 3)
    assert len(rgb) == 20 * 12 * 3


def test_arithmetic_jpeg_still_raises():
    import struct

    from cassandra_spark.operators.jpeg import decode_jpeg

    # SOF9 (arithmetic sequential): recognized, honestly refused
    data = (
        b"\xff\xd8"
        + b"\xff\xc9" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        + bytes([1, 0x11, 0])
        + b"\xff\xd9"
    )
    try:
        decode_jpeg(data)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_progressive_jpeg_matches_imageio_reference(spark):
    """Independent-encoder check: the JDK's ImageIO JPEG writer in
    progressive mode (its own libjpeg-style scan script, successive
    approximation, subsampled chroma) produces a real SOF2 file; our
    decoder's pixels must match ImageIO's own decode up to chroma
    upsampling noise — the same threshold as the baseline cross-check."""
    import glob

    import numpy as np
    import pytest as _pytest

    from cassandra_spark.operators.jpeg import decode_jpeg

    files = sorted(
        glob.glob(
            "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/*.jpg"
        )
    )
    if not files:
        _pytest.skip("no sample JPEGs in this container")
    dst = "/tmp/codecs_prog_ref.jpg"
    jvm = spark._jvm
    File = jvm.java.io.File
    ImageIO = jvm.javax.imageio.ImageIO
    img = ImageIO.read(File(files[0]))
    writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    ios = ImageIO.createImageOutputStream(File(dst))
    writer.setOutput(ios)
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
    ios.close()
    writer.dispose()

    data = open(dst, "rb").read()
    assert b"\xff\xc2" in data, "ImageIO did not emit SOF2"
    w, h, c, rgb = decode_jpeg(data)
    row = spark.read.format("image").load(dst).select("image.*").head()
    assert (w, h) == (row.width, row.height)
    ref = (
        np.frombuffer(bytes(row.data), np.uint8)
        .reshape(row.height, row.width, row.nChannels)[..., ::-1]
        .astype(int)
    )
    mine = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(int)
    err = np.abs(ref - mine)
    assert err.mean() < 1.0
    assert (err > 4).mean() < 0.01


# --- AVI video (operators/avi.py) ------------------------------------------


def _frames(w, h, n):
    """n distinct gradient frames (frame index shifts the pattern)."""
    out = []
    for k in range(n):
        rgb = bytearray(w * h * 3)
        for y in range(h):
            for x in range(w):
                i = (y * w + x) * 3
                rgb[i] = (x * 9 + k * 31) % 256
                rgb[i + 1] = (y * 13 + k * 7) % 256
                rgb[i + 2] = (x + y + k * 17) % 256
        out.append(bytes(rgb))
    return out


def test_avi_dib_roundtrip_exact():
    """Raw-DIB AVI: mux → demux → decode reproduces every raster exactly,
    and timing metadata survives the container."""
    from cassandra_spark.operators.avi import (
        decode_avi_frame,
        demux_avi,
        encode_avi,
        is_avi,
    )

    frames = _frames(13, 7, 5)  # odd width exercises DIB row padding
    data = encode_avi(13, 7, frames, fps=10, codec="DIB ")
    assert is_avi(data)
    s = demux_avi(data)
    assert (s.width, s.height, s.codec) == (13, 7, "DIB ")
    assert s.usec_per_frame == 100_000 and len(s.frames) == 5
    for i, f in enumerate(frames):
        assert decode_avi_frame(s, i) == f


def test_avi_mjpg_roundtrip_error_bounds():
    """MJPG AVI: every 00dc chunk is a standalone baseline JPEG; decoded
    frames match the encoder input within quantization error."""
    import numpy as np

    from cassandra_spark.operators.avi import (
        decode_avi_frame,
        demux_avi,
        encode_avi,
    )

    w, h = 24, 16
    frames = _frames(w, h, 3)
    data = encode_avi(w, h, frames, fps=25, codec="MJPG", quality=90)
    s = demux_avi(data)
    assert (s.width, s.height, s.codec) == (w, h, "MJPG")
    assert s.usec_per_frame == 40_000
    for i, f in enumerate(frames):
        assert s.frames[i][:3] == b"\xff\xd8\xff"  # real JPEG chunk
        got = np.frombuffer(decode_avi_frame(s, i), np.uint8).astype(int)
        ref = np.frombuffer(f, np.uint8).astype(int)
        assert np.abs(got - ref).mean() < 12.0


def test_avi_demux_rejects_garbage_and_truncation():
    import pytest as _pytest

    from cassandra_spark.operators.avi import demux_avi, encode_avi

    with _pytest.raises(ValueError):
        demux_avi(b"not a riff file at all")
    data = encode_avi(8, 8, _frames(8, 8, 2), codec="DIB ")
    with _pytest.raises(ValueError):
        demux_avi(data[: len(data) // 2])


def test_avi_sniffed_as_video():
    from cassandra_spark.operators.avi import encode_avi
    from cassandra_spark.operators.codecs import sniff_mime

    data = encode_avi(4, 4, _frames(4, 4, 1), codec="DIB ")
    assert sniff_mime(data) == "video/x-msvideo"


# --- PNG depth variants (16-bit and sub-byte) ------------------------------


def test_png16_roundtrip_exact():
    """16-bit truecolor: encoder widens v -> v*257, decoder keeps the
    high byte — exact round-trip, non-interlaced and Adam7."""
    from cassandra_spark.operators.codecs import decode_png, encode_png

    rgb = bytes(_gradient(11, 6))
    for interlace in (False, True):
        data = encode_png(11, 6, rgb, interlace=interlace, depth=16)
        w, h, c, out = decode_png(data)
        assert (w, h, c) == (11, 6, 3)
        assert out == rgb, f"interlace={interlace}"


def test_png16_sub_filter_uses_two_byte_pixel_unit():
    """Filter type 1 (Sub) at depth 16 references the byte 6 positions
    back (channels*2), not 3 — a hand-filtered image decodes correctly
    only if the decoder widens the pixel unit."""
    import struct
    import zlib

    from cassandra_spark.operators.codecs import decode_png

    w, h = 5, 3
    rgb = bytes(_gradient(w, h))
    raw16 = bytearray()
    for v in rgb:
        raw16 += struct.pack(">H", v * 257)
    stride, bpp = w * 6, 6
    filtered = bytearray()
    for y in range(h):
        row = raw16[y * stride : (y + 1) * stride]
        filtered.append(1)  # Sub
        for i in range(stride):
            prev = row[i - bpp] if i >= bpp else 0
            filtered.append((row[i] - prev) & 0xFF)

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )
    got = decode_png(data)
    assert got == (w, h, 3, rgb)


def _png_chunks(*chunks):
    import struct
    import zlib

    out = b"\x89PNG\r\n\x1a\n"
    for ctype, payload in chunks:
        out += (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )
    return out


def test_png_1bit_gray_scales_to_full_range():
    import struct
    import zlib

    from cassandra_spark.operators.codecs import decode_png

    # 10x2: alternating vertical stripes, bit-packed MSB-first
    w, h = 10, 2
    rows = bytearray()
    for _y in range(h):
        rows.append(0)  # filter None
        rows += bytes([0b10101010, 0b10000000])  # 10 bits + pad
    data = _png_chunks(
        (b"IHDR", struct.pack(">IIBBBBB", w, h, 1, 0, 0, 0, 0)),
        (b"IDAT", zlib.compress(bytes(rows))),
        (b"IEND", b""),
    )
    gw, gh, c, rgb = decode_png(data)
    assert (gw, gh, c) == (w, h, 3)
    row = [rgb[3 * x] for x in range(w)]
    assert row == [255, 0] * 5  # 1 -> 255, 0 -> 0
    assert rgb[: 3] == b"\xff\xff\xff"


def test_png_4bit_palette():
    import struct
    import zlib

    from cassandra_spark.operators.codecs import decode_png

    # 3x1, palette entries: red, green, blue; indexes 0,1,2 packed 4-bit
    plte = b"\xff\x00\x00" + b"\x00\xff\x00" + b"\x00\x00\xff"
    rows = bytes([0, 0x01, 0x20])  # filter 0, nibbles 0,1 then 2,pad
    data = _png_chunks(
        (b"IHDR", struct.pack(">IIBBBBB", 3, 1, 4, 3, 0, 0, 0)),
        (b"PLTE", plte),
        (b"IDAT", zlib.compress(rows)),
        (b"IEND", b""),
    )
    got = decode_png(data)
    assert got == (3, 1, 3, b"\xff\x00\x00\x00\xff\x00\x00\x00\xff")


def test_png_2bit_gray_levels():
    import struct
    import zlib

    from cassandra_spark.operators.codecs import decode_png

    # 4x1 at depth 2: levels 0,1,2,3 -> 0,85,170,255
    rows = bytes([0, 0b00011011])
    data = _png_chunks(
        (b"IHDR", struct.pack(">IIBBBBB", 4, 1, 2, 0, 0, 0, 0)),
        (b"IDAT", zlib.compress(rows)),
        (b"IEND", b""),
    )
    _w, _h, _c, rgb = decode_png(data)
    assert [rgb[3 * x] for x in range(4)] == [0, 85, 170, 255]


def test_png16_through_decode_image():
    from cassandra_spark.operators.codecs import decode_image, encode_png

    rgb = bytes(_gradient(7, 5))
    mime, w, h, c, out = decode_image(encode_png(7, 5, rgb, depth=16))
    assert (mime, w, h, c) == ("image/png", 7, 5, 3)
    assert out == rgb


def test_png16_matches_imageio_reference(spark):
    """A 16-bit grayscale PNG written by an independent encoder (Java
    ImageIO via the Spark JVM — its own filter heuristics, not our
    filter-0 fixtures) decodes to the exact high bytes of the samples we
    drew."""
    import os
    import tempfile

    from cassandra_spark.operators.codecs import decode_png, sniff_mime

    jvm = spark.sparkContext._jvm
    w, h = 19, 11
    img = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_USHORT_GRAY
    )
    raster = img.getRaster()
    vals = [[(x * 13 + y * 41) % 256 for x in range(w)] for y in range(h)]
    for y in range(h):
        for x in range(w):
            raster.setSample(x, y, 0, vals[y][x] * 257)
    dst = os.path.join(tempfile.mkdtemp(), "gray16.png")
    jvm.javax.imageio.ImageIO.write(img, "png", jvm.java.io.File(dst))

    data = open(dst, "rb").read()
    assert sniff_mime(data) == "image/png"
    assert data[24] == 16, "ImageIO did not write bit depth 16"
    gw, gh, c, rgb = decode_png(data)
    assert (gw, gh, c) == (w, h, 3)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            assert rgb[i] == rgb[i + 1] == rgb[i + 2] == vals[y][x], (x, y)


# --- GIF (LZW) -------------------------------------------------------------


def test_gif_roundtrip_exact():
    """encode → decode reproduces the raster exactly (palette formats are
    lossless), non-interlaced and interlaced."""
    from cassandra_spark.operators.codecs import decode_gif, encode_gif

    # ≤256 distinct colors by construction
    rgb = bytes(
        v for y in range(9) for x in range(14)
        for v in ((x * 16) % 256, (y * 24) % 256, ((x + y) * 8) % 256)
    )
    for interlace in (False, True):
        data = encode_gif(14, 9, rgb, interlace=interlace)
        assert decode_gif(data) == (14, 9, 3, rgb), f"interlace={interlace}"


def test_gif_lzw_table_growth_and_clear():
    """A long low-entropy raster drives the LZW table through multiple
    width bumps (and exercises clear-code handling on round-trip)."""
    from cassandra_spark.operators.codecs import decode_gif, encode_gif

    w, h = 101, 67
    rgb = bytes(
        v for i in range(w * h)
        for v in (((i * i) % 7) * 30, (i % 5) * 50, (i % 3) * 80)
    )
    data = encode_gif(w, h, rgb)
    assert decode_gif(data) == (w, h, 3, rgb)


def test_gif_two_color_min_code_size():
    """1-bit palettes still use the spec minimum LZW code size of 2."""
    from cassandra_spark.operators.codecs import decode_gif, encode_gif

    rgb = (b"\x00\x00\x00" + b"\xff\xff\xff") * 8
    data = encode_gif(4, 4, rgb)
    assert data[6 + 7 + 6 + 10] == 2  # min code size byte after descriptor
    assert decode_gif(data) == (4, 4, 3, rgb)


def test_gif_rejects_garbage():
    import pytest as _pytest

    from cassandra_spark.operators.codecs import decode_gif, encode_gif

    with _pytest.raises(ValueError):
        decode_gif(b"GIF89a only a header")
    data = encode_gif(8, 8, bytes(range(8)) * 24)
    with _pytest.raises(ValueError):
        decode_gif(data[: len(data) - len(data) // 3])


def test_gif_through_decode_image():
    from cassandra_spark.operators.codecs import (
        decode_image,
        encode_gif,
        sniff_mime,
    )

    rgb = bytes(v for i in range(30) for v in (i, 255 - i, i * 2))
    data = encode_gif(6, 5, rgb)
    assert sniff_mime(data) == "image/gif"
    assert decode_image(data) == ("image/gif", 6, 5, 3, rgb)


def test_gif_matches_imageio_reference(spark):
    """A GIF written by an independent encoder (Java ImageIO via the
    Spark JVM, indexed-color source so quantization is exact) decodes to
    the same pixels ImageIO itself reads back."""
    import os
    import tempfile

    from cassandra_spark.operators.codecs import decode_gif

    jvm = spark.sparkContext._jvm
    w, h = 23, 17
    img = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_BYTE_INDEXED
    )
    for y in range(h):
        for x in range(w):
            rgb = ((x * 11) % 256 << 16) | ((y * 13) % 256 << 8) | (
                (x + y) % 256
            )
            img.setRGB(x, y, rgb)
    dst = os.path.join(tempfile.mkdtemp(), "ref.gif")
    jvm.javax.imageio.ImageIO.write(img, "gif", jvm.java.io.File(dst))

    data = open(dst, "rb").read()
    gw, gh, c, mine = decode_gif(data)
    assert (gw, gh, c) == (w, h, 3)
    back = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(dst))
    for y in range(h):
        for x in range(w):
            ref = back.getRGB(x, y)
            i = (y * w + x) * 3
            assert (mine[i], mine[i + 1], mine[i + 2]) == (
                (ref >> 16) & 0xFF, (ref >> 8) & 0xFF, ref & 0xFF
            ), (x, y)


# --- interlaced sub-byte-depth PNG (Adam7 x bit-packing composition) --------


def _build_subbyte_png(
    w: int, h: int, samples: list[int], depth: int, interlace: bool,
    palette: bytes | None = None,
) -> bytes:
    """Hand-assemble a 1/2/4-bit gray or palette PNG (filter 0 rows); the
    interlaced variant packs each Adam7 pass's reduced rows independently,
    per spec §8.2."""
    import struct
    import zlib

    from cassandra_spark.operators.codecs import (
        _ADAM7,
        _PNG_SIG,
        _adam7_pass_dims,
    )

    def pack_rows(grid_w, grid_h, get):
        row_bytes = (grid_w * depth + 7) // 8
        out = bytearray()
        for y in range(grid_h):
            out.append(0)  # filter: none
            row = bytearray(row_bytes)
            for x in range(grid_w):
                bitpos = x * depth
                row[bitpos >> 3] |= get(x, y) << (8 - depth - (bitpos & 7))
            out += row
        return out

    raw = bytearray()
    if interlace:
        for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, _adam7_pass_dims(w, h)):
            if pw == 0 or ph == 0:
                continue
            raw += pack_rows(
                pw, ph,
                lambda px, py: samples[(y0 + py * dy) * w + x0 + px * dx],
            )
    else:
        raw += pack_rows(w, h, lambda x, y: samples[y * w + x])

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ctype_ = 3 if palette is not None else 0
    data = _PNG_SIG + chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", w, h, depth, ctype_, 0, 0, int(interlace)),
    )
    if palette is not None:
        data += chunk(b"PLTE", palette)
    return data + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(
        b"IEND", b""
    )


def test_interlaced_subbyte_gray_matches_noninterlaced():
    from cassandra_spark.operators.codecs import decode_png

    for depth in (1, 2, 4):
        maxval = (1 << depth) - 1
        for w, h in [(1, 1), (5, 3), (8, 8), (13, 7), (17, 17)]:
            samples = [(x * 3 + y * 5) % (maxval + 1)
                       for y in range(h) for x in range(w)]
            plain = decode_png(_build_subbyte_png(w, h, samples, depth, False))
            inter = decode_png(_build_subbyte_png(w, h, samples, depth, True))
            assert plain == inter, (depth, w, h)
            assert plain[:3] == (w, h, 3)


def test_interlaced_subbyte_palette_uses_plte():
    from cassandra_spark.operators.codecs import decode_png

    w, h, depth = 9, 6, 2
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 7, 7])
    samples = [(x + y) % 4 for y in range(h) for x in range(w)]
    plain = decode_png(
        _build_subbyte_png(w, h, samples, depth, False, palette)
    )
    inter = decode_png(
        _build_subbyte_png(w, h, samples, depth, True, palette)
    )
    assert plain == inter
    # spot-check a pixel maps through the palette
    rgb = plain[3]
    assert rgb[:3] == bytes([255, 0, 0])  # sample 0 → palette entry 0


# --- animated GIF (decode_gif_frames) ---------------------------------------


def _solid(w, h, c):
    return bytes(c) * (w * h)


def test_gif_animation_disposal_semantics():
    """Four-frame animation exercising every disposal method: 1 (leave),
    2 (restore-background over the frame rect), 3 (restore-previous), and
    transparency (delta pixels show the underlying canvas)."""
    from cassandra_spark.operators.codecs import (
        decode_gif_frames,
        encode_gif_animated,
    )

    red, grn, blu, blk = (255, 0, 0), (0, 255, 0), (0, 0, 255), (0, 0, 0)
    frames = [
        # full-screen red, leave it
        (0, 0, 4, 4, _solid(4, 4, red), 100, 1, None),
        # green 2x2 patch at (1,1), restore-previous afterwards
        (1, 1, 2, 2, _solid(2, 2, grn), 200, 3, None),
        # blue 2x2 patch at (2,2), restore-background afterwards
        (2, 2, 2, 2, _solid(2, 2, blu), 0, 2, None),
        # full-screen green with a transparent hole at (0,0): the hole
        # shows whatever the canvas holds after frame 3's disposal
        (0, 0, 4, 4, bytes(red) + _solid(4, 4, grn)[3:], 50, 1, red),
    ]
    data = encode_gif_animated(4, 4, frames)
    sw, sh, out = decode_gif_frames(data)
    assert (sw, sh) == (4, 4)
    assert [d for d, _ in out] == [100, 200, 0, 50]

    def px(rgb, x, y):
        return tuple(rgb[(y * 4 + x) * 3 : (y * 4 + x) * 3 + 3])

    f1, f2, f3, f4 = (rgb for _, rgb in out)
    assert f1 == _solid(4, 4, red)
    assert px(f2, 1, 1) == grn and px(f2, 0, 0) == red
    # frame 2's disposal restored red before frame 3 painted blue
    assert px(f3, 1, 1) == red and px(f3, 2, 2) == blu
    # frame 3's disposal restored its rect to BACKGROUND (black, no GCT);
    # frame 4 painted green everywhere except the transparent (0,0) hole,
    # which shows the post-disposal canvas: red
    assert px(f4, 0, 0) == red
    assert px(f4, 2, 2) == grn and px(f4, 1, 1) == grn


def test_gif_first_frame_delegate_matches_single_frame_decoder():
    """decode_gif == first composited frame of decode_gif_frames, and the
    single-frame encoder round-trips through both."""
    from cassandra_spark.operators.codecs import (
        decode_gif,
        decode_gif_frames,
        encode_gif,
    )

    rgb = b"".join(
        bytes(((x * 37) % 200, (y * 11) % 200, 50))
        for y in range(5)
        for x in range(6)
    )
    data = encode_gif(6, 5, rgb)
    w, h, frames = decode_gif_frames(data)
    assert (w, h) == (6, 5) and len(frames) == 1
    assert decode_gif(data) == (6, 5, 3, frames[0][1])


def test_gif_animation_survives_sniff_and_interlace_mix():
    """Animated payloads still sniff as image/gif; a frame with >255
    colors raises; delay of 0 is preserved as 0 (the sampler applies the
    100 ms default, not the codec)."""
    from cassandra_spark.operators.codecs import (
        decode_gif_frames,
        encode_gif_animated,
        sniff_mime,
    )

    data = encode_gif_animated(
        2, 2, [(0, 0, 2, 2, _solid(2, 2, (9, 9, 9)), 0, 0, None)]
    )
    assert sniff_mime(data) == "image/gif"
    _, _, frames = decode_gif_frames(data)
    assert frames[0][0] == 0


# --- arithmetic-coded JPEG (operators/jpeg_arith.py) -------------------------


def test_qm_coder_roundtrip_adversarial():
    """The QM coder in isolation: biased multi-context bit streams of
    several lengths encode → decode bit-exactly, including streams that
    exercise carry propagation and 0xFF stuffing."""
    from cassandra_spark.operators.jpeg_arith import (
        FIXED_BIN_INDEX,
        ArithDecoder,
        ArithEncoder,
    )

    def lcg(seed):
        while True:
            seed = (seed * 1103515245 + 12345) % (1 << 31)
            yield seed

    for seed in (1, 7, 42, 999):
        for n in (1, 10, 100, 2000):
            g = lcg(seed)
            ctxs, bits = [], []
            for _ in range(n):
                r = next(g)
                ctxs.append(r % 8)
                bits.append(1 if (r >> 8) % 100 < 15 + 70 * (r % 8) // 8 else 0)
            enc = ArithEncoder()
            est = [[0, 0] for _ in range(8)] + [[FIXED_BIN_INDEX, 0]]
            for c, b in zip(ctxs, bits):
                enc.encode(est[c], b)
            data = enc.flush()
            dec = ArithDecoder(data + b"\xff\xd9", 0)
            est2 = [[0, 0] for _ in range(8)] + [[FIXED_BIN_INDEX, 0]]
            assert [dec.decode(est2[c]) for c in ctxs] == bits


def test_arith_jpeg_matches_huffman_pixels():
    """SOF9 arithmetic and SOF0 Huffman share the DCT/quant pipeline, so
    their decodes must be PIXEL-IDENTICAL (entropy coding is lossless);
    the arithmetic stream should also be smaller on non-trivial images."""
    from cassandra_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from cassandra_spark.operators.jpeg_arith import encode_jpeg_arith

    for w, h, q in ((16, 24, 80), (56, 40, 95), (9, 7, 50)):
        rgb = b"".join(
            bytes(
                (
                    (x * 37 + y * 11) % 256,
                    (x * 5 + y * 3) % 256,
                    (x * x + y) % 256,
                )
            )
            for y in range(h)
            for x in range(w)
        )
        a = encode_jpeg_arith(w, h, rgb, quality=q)
        hf = encode_jpeg(w, h, rgb, quality=q)
        assert decode_jpeg(a) == decode_jpeg(hf), (w, h, q)
    assert len(a) < len(hf)  # 9x7 case may be close; last sizes suffice


def test_arith_jpeg_restart_markers():
    """Restart intervals: coder + statistics + DC predictors reinit at
    each RSTn (F.1.4.1) and the decode stays pixel-identical."""
    from cassandra_spark.operators.jpeg import decode_jpeg
    from cassandra_spark.operators.jpeg_arith import encode_jpeg_arith

    rgb = b"".join(
        bytes(((x * 13 + y * 29) % 256, (x + y * 7) % 256, (x * 3) % 256))
        for y in range(32)
        for x in range(24)
    )
    base = decode_jpeg(encode_jpeg_arith(24, 32, rgb, quality=75))
    for ri in (1, 2, 5):
        with_rst = encode_jpeg_arith(
            24, 32, rgb, quality=75, restart_interval=ri
        )
        assert decode_jpeg(with_rst) == base, f"restart_interval={ri}"


def test_arith_jpeg_flows_through_multimodal_decode():
    """decode_image dispatches SOF9 payloads (sniffed image/jpeg) to the
    arithmetic decoder — the multimodal pipeline needs no stub for them."""
    from cassandra_spark.operators.codecs import decode_image, sniff_mime
    from cassandra_spark.operators.jpeg_arith import encode_jpeg_arith

    rgb = bytes(192 for _ in range(8 * 8 * 3))
    data = encode_jpeg_arith(8, 8, rgb, quality=90)
    assert sniff_mime(data) == "image/jpeg"
    mime, w, h, c, out = decode_image(data)
    assert (mime, w, h, c) == ("image/jpeg", 8, 8, 3)
    # flat gray block survives DCT/quant almost exactly
    assert all(abs(px - 192) <= 2 for px in out)


def test_arith_progressive_jpeg_matches_all_other_modes():
    """SOF10: the four (sequential|progressive) x (Huffman|arithmetic)
    encoders share one DCT/quant pipeline, so all four decodes of the
    same image are pixel-identical; both arithmetic streams are smaller
    than their Huffman counterparts on this image."""
    from cassandra_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from cassandra_spark.operators.jpeg_arith import (
        encode_jpeg_arith,
        encode_jpeg_arith_progressive,
    )

    for w, h, q in ((16, 24, 80), (40, 28, 92)):
        rgb = b"".join(
            bytes(
                ((x * 37 + y * 11) % 256, (x * 5 + y * 3) % 256,
                 (x * x + y) % 256)
            )
            for y in range(h)
            for x in range(w)
        )
        hseq = encode_jpeg(w, h, rgb, q)
        hprog = encode_jpeg_progressive(w, h, rgb, q)
        aseq = encode_jpeg_arith(w, h, rgb, q)
        aprog = encode_jpeg_arith_progressive(w, h, rgb, q)
        ref = decode_jpeg(hseq)
        assert decode_jpeg(hprog) == ref
        assert decode_jpeg(aseq) == ref
        assert decode_jpeg(aprog) == ref
        assert len(aseq) < len(hseq) and len(aprog) < len(hprog)


def test_jpeg_12bit_precision_decodes_to_8bit_contract():
    """12-bit sequential JPEG (SOF1, 16-bit DQT): with samples and quant
    tables both widened x16 the quantized coefficients match the 8-bit
    encoding, so the decode (scaled back to 8-bit RGB) is IDENTICAL to
    the 8-bit decode of the same image."""
    import numpy as np

    from cassandra_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_12bit,
    )

    for w, h, q in ((16, 24, 85), (9, 7, 60)):
        rgb = b"".join(
            bytes(
                ((x * 37 + y * 11) % 256, (x * 5 + y * 3) % 256,
                 (x * x + y) % 256)
            )
            for y in range(h)
            for x in range(w)
        )
        data12 = encode_jpeg_12bit(w, h, rgb, q)
        assert data12[data12.index(b"\xff\xc1") + 4] == 12  # SOF precision
        d12 = decode_jpeg(data12)
        d8 = decode_jpeg(encode_jpeg(w, h, rgb, q))
        assert d12 == d8
        err = np.abs(
            np.frombuffer(d12[3], np.uint8).astype(int)
            - np.frombuffer(rgb, np.uint8).astype(int)
        )
        # quantization error only (quality-dependent; the hard contract
        # is the d12 == d8 identity above)
        assert err.max() <= 120


def test_lossless_jpeg_byte_exact_all_predictors():
    """SOF3 lossless: decode(encode(x)) == x BYTE-EXACTLY for every
    Annex-H predictor — no quantization anywhere in the path."""
    from cassandra_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    for w, h in ((16, 24), (7, 5), (1, 1), (33, 2)):
        rgb = b"".join(
            bytes(
                ((x * 37 + y * 11) % 256, (x * 5 + y * 3) % 256,
                 (x * x + y) % 256)
            )
            for y in range(h)
            for x in range(w)
        )
        for pred in range(1, 8):
            out = decode_jpeg(encode_jpeg_lossless(w, h, rgb, pred))
            assert out == (w, h, 3, rgb), (w, h, pred)


def test_lossless_jpeg_flows_through_decode_image():
    from cassandra_spark.operators.codecs import decode_image

    from cassandra_spark.operators.jpeg import encode_jpeg_lossless

    rgb = bytes(range(48)) * 2  # 4x8 RGB
    data = encode_jpeg_lossless(4, 8, rgb)
    assert decode_image(data) == ("image/jpeg", 4, 8, 3, rgb)


def test_lossless_arith_jpeg_byte_exact_all_predictors():
    """SOF11 (round 7): the QM-coder replaces SOF3's Huffman stage —
    decode(encode(x)) == x BYTE-EXACTLY for every Annex-H predictor,
    and pixel-identical to the SOF3 decode of the same input (entropy
    coding is lossless, so any divergence is a codec bug)."""
    from cassandra_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless,
    )
    from cassandra_spark.operators.jpeg_arith import (
        encode_jpeg_lossless_arith,
    )

    for w, h in ((16, 24), (7, 5), (1, 1), (33, 2)):
        rgb = b"".join(
            bytes(
                ((x * 37 + y * 11) % 256, (x * 5 + y * 3) % 256,
                 (x * x + y) % 256)
            )
            for y in range(h)
            for x in range(w)
        )
        for pred in range(1, 8):
            out = decode_jpeg(encode_jpeg_lossless_arith(w, h, rgb, pred))
            assert out == (w, h, 3, rgb), (w, h, pred)
            huff = decode_jpeg(encode_jpeg_lossless(w, h, rgb, pred))
            assert out == huff, (w, h, pred)


def test_lossless_arith_jpeg_adversarial_and_restarts():
    """SOF11 edge payloads: flat, saturated, alternating-extreme
    (exercises the modulo-65536 +/-32768 magnitude chain and both
    conditioning areas), plus restart-marker statistic resets."""
    import numpy as np

    from cassandra_spark.operators.jpeg import decode_jpeg
    from cassandra_spark.operators.jpeg_arith import (
        encode_jpeg_lossless_arith,
    )

    for img in (
        bytes(48),
        bytes([255] * 48),
        bytes([0, 255] * 24),
        bytes(range(48)),
    ):
        assert decode_jpeg(encode_jpeg_lossless_arith(4, 4, img))[3] == img
    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=20 * 10 * 3, dtype=np.uint8).tobytes()
    enc = encode_jpeg_lossless_arith(
        20, 10, rgb, predictor=4, restart_interval=37
    )
    assert decode_jpeg(enc)[3] == rgb


def test_lossless_arith_jpeg_flows_through_decode_image():
    from cassandra_spark.operators.codecs import decode_image
    from cassandra_spark.operators.jpeg_arith import (
        encode_jpeg_lossless_arith,
    )

    rgb = bytes(range(48)) * 2  # 4x8 RGB
    data = encode_jpeg_lossless_arith(4, 8, rgb)
    assert decode_image(data) == ("image/jpeg", 4, 8, 3, rgb)


def test_hierarchical_arithmetic_stages_match_huffman():
    """SOF13 (round 7): the arithmetic hierarchical progression decodes
    pixel-identically to the Huffman progression of the same image —
    shared DCT/quantization pipeline, only the entropy stage differs."""
    import numpy as np

    from cassandra_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_hierarchical,
    )

    rng = np.random.default_rng(5)
    for w, h in ((24, 16), (7, 5), (1, 1), (9, 2)):
        rgb = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
        a = decode_jpeg(encode_jpeg_hierarchical(w, h, rgb, arithmetic=True))
        b = decode_jpeg(encode_jpeg_hierarchical(w, h, rgb, arithmetic=False))
        assert a == b, (w, h)


def test_hierarchical_progressive_stage_sof14():
    """SOF14 (round 7): a progressive-arithmetic differential stage —
    scans accumulate per stage and render at the frame boundary —
    decodes pixel-identically to the SOF13 sequential stage of the same
    quantized residual."""
    import numpy as np

    from cassandra_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_hierarchical,
    )

    rng = np.random.default_rng(6)
    for w, h in ((24, 16), (7, 5), (16, 16)):
        rgb = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
        seq = decode_jpeg(
            encode_jpeg_hierarchical(w, h, rgb, arithmetic=True)
        )
        prog = decode_jpeg(
            encode_jpeg_hierarchical(w, h, rgb, progressive_final=True)
        )
        assert seq == prog, (w, h)


def test_hierarchical_lossless_final_stage_exact():
    """SOF15 (round 7): a differential-LOSSLESS final stage makes the
    whole pyramid byte-exact at ANY stage-1 quality — the strongest
    property in the hierarchical matrix."""
    import numpy as np

    from cassandra_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_hierarchical,
    )

    rng = np.random.default_rng(7)
    for w, h in ((24, 16), (7, 5), (1, 1), (9, 2)):
        rgb = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
        for q in (20, 85):
            out = decode_jpeg(
                encode_jpeg_hierarchical(
                    w, h, rgb, quality=q, lossless_final=True
                )
            )
            assert out == (w, h, 3, rgb), (w, h, q)


def test_differential_huffman_stages_sof6_sof7():
    """SOF6/SOF7 (round 7): the differential HUFFMAN variants — SOF6
    progressive stage decodes pixel-identically to SOF5, SOF7 lossless
    final stage makes the pyramid byte-exact; with them the ENTIRE
    T.81 frame matrix (SOF0-3, 5-7, 9-11, 13-15) round-trips."""
    import struct

    import numpy as np

    from cassandra_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_hierarchical,
    )

    rng = np.random.default_rng(9)
    for w, h in ((24, 16), (7, 5), (1, 1), (9, 2)):
        rgb = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
        base = decode_jpeg(encode_jpeg_hierarchical(w, h, rgb))
        p6 = decode_jpeg(
            encode_jpeg_hierarchical(
                w, h, rgb, progressive_final=True, arithmetic=False
            )
        )
        assert p6 == base, (w, h, "SOF6")
        l7 = decode_jpeg(
            encode_jpeg_hierarchical(
                w, h, rgb, lossless_final=True, arithmetic=False
            )
        )
        assert l7 == (w, h, 3, rgb), (w, h, "SOF7")
    # a differential frame OUTSIDE a hierarchical progression is invalid
    data = (
        b"\xff\xd8"
        + b"\xff\xc6" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        + bytes([1, 0x11, 0])
        + b"\xff\xd9"
    )
    try:
        decode_jpeg(data)
        raise AssertionError("expected ValueError")
    except ValueError:
            pass


# --- Y4M video (operators/y4m.py) --------------------------------------------


def test_y4m_roundtrip_c444_exact():
    """C444 Y4M: YUV is full-range BT.601 like the JPEG path, so a
    round-trip differs from the source by at most rounding (|err| <= 2),
    and geometry/fps parse exactly."""
    import numpy as np

    from cassandra_spark.operators.y4m import (
        decode_y4m_frame,
        demux_y4m,
        encode_y4m,
    )

    frames = [
        bytes(
            ((x * 31 + y * 7 + k * 41) % 256)
            for y in range(6)
            for x in range(10)
            for k in range(3)
        )
        for _ in range(3)
    ]
    data = encode_y4m(10, 6, frames, fps_num=30, fps_den=1)
    s = demux_y4m(data)
    assert (s.width, s.height, s.fps_num, s.fps_den) == (10, 6, 30, 1)
    assert len(s.frames) == 3
    for i, f in enumerate(frames):
        got = np.frombuffer(decode_y4m_frame(s, i), np.uint8).astype(int)
        err = np.abs(got - np.frombuffer(f, np.uint8).astype(int))
        assert err.max() <= 2, err.max()


def test_y4m_c420_subsample_and_mono():
    import numpy as np

    from cassandra_spark.operators.y4m import (
        decode_y4m_frame,
        demux_y4m,
        encode_y4m,
    )

    frame = bytes(
        ((x * 13 + y * 29) % 256) for y in range(8) for x in range(12)
        for _ in range(3)
    )  # gray content: chroma planes are flat 128, so 420 is lossless-ish
    data = encode_y4m(12, 8, [frame], colorspace="420jpeg")
    s = demux_y4m(data)
    assert s.colorspace == "420jpeg"
    got = np.frombuffer(decode_y4m_frame(s, 0), np.uint8).astype(int)
    err = np.abs(got - np.frombuffer(frame, np.uint8).astype(int))
    assert err.max() <= 2
    # mono: hand-build a Cmono stream
    y = bytes((i * 3) % 256 for i in range(12 * 8))
    mono = b"YUV4MPEG2 W12 H8 F25:1 Cmono\n" + b"FRAME\n" + y
    sm = demux_y4m(mono)
    rgb = decode_y4m_frame(sm, 0)
    assert rgb[0::3] == y and rgb[1::3] == y and rgb[2::3] == y


def test_y4m_sniffs_and_flows_through_sampler(spark):
    """sample_frames treats Y4M as a REAL video container: cadence from
    the F tag, hashes of decoded RGB, geometry as provenance."""
    import hashlib

    from cassandra_spark.operators.codecs import sniff_mime
    from cassandra_spark.operators.llm_multimodal import sample_frames
    from cassandra_spark.operators.y4m import (
        decode_y4m_frame,
        demux_y4m,
        encode_y4m,
    )

    frames = [bytes((k * 50 + 10,)) * (8 * 4 * 3) for k in range(4)]
    data = encode_y4m(8, 4, frames, fps_num=4, fps_den=1)  # 250 ms/frame
    assert sniff_mime(data) == "video/x-yuv4mpeg"
    docs = spark.createDataFrame(
        [(9, bytearray(data))], "doc_id bigint, payload binary"
    )
    out = sorted(
        sample_frames(
            docs, every_ms=500, allow_stub=False, payload_col="payload"
        ).collect(),
        key=lambda r: r.frame_idx,
    )
    # 1000 ms / 500 ms = 2 samples at frames 0 and 2
    assert [r.frame_ts_ms for r in out] == [0, 500]
    assert [r.src_frame for r in out] == [0, 2]
    s = demux_y4m(data)
    for r in out:
        assert r.frame_sha == hashlib.sha1(
            decode_y4m_frame(s, r.src_frame)
        ).hexdigest()
    assert all((r.width, r.height) == (8, 4) for r in out)


# --- ISO-BMFF / MP4 (operators/mp4.py) ---------------------------------------


def test_mp4_mjpeg_roundtrip():
    """MP4 demux (round 7): the writer's single-track MJPEG container
    demuxes to the exact geometry/timing/sample set, and each sample
    decodes through the repo's JPEG codec to the expected pixels."""
    import numpy as np

    from cassandra_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from cassandra_spark.operators.mp4 import (
        decode_mp4_frame,
        demux_mp4,
        encode_mp4_mjpeg,
        is_mp4,
    )

    w, h = 16, 8
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    frames = [
        np.stack(
            [(xx * 3 + yy * 2 + k * 11) % 256, (xx + yy * 5 + k * 7) % 256,
             np.full_like(xx, (k * 40) % 256)],
            axis=-1,
        ).astype(np.uint8).tobytes()
        for k in range(5)
    ]
    data = encode_mp4_mjpeg(w, h, frames, fps=5)
    assert is_mp4(data)
    s = demux_mp4(data)
    assert (s.codec, s.width, s.height, len(s.frames)) == ("jpeg", w, h, 5)
    assert abs(s.duration_ms - 1000.0) < 1
    for i in range(5):
        want = decode_jpeg(encode_jpeg(w, h, frames[i], quality=85))[3]
        assert decode_mp4_frame(s, i) == want, i


def test_mp4_rejects_malformed_containers():
    import pytest

    from cassandra_spark.operators.mp4 import demux_mp4, encode_mp4_mjpeg

    good = encode_mp4_mjpeg(4, 4, [bytes(48)], fps=1)
    for bad in (b"not an mp4", b"\x00\x00\x00\x08ftypaaaa", good[:40]):
        with pytest.raises(ValueError):
            demux_mp4(bad)


def test_mp4_sniffs_and_flows_through_sampler(spark):
    """sample_frames treats MJPEG MP4 as a REAL video container: cadence
    from the sample tables, hashes of decoded RGB, geometry provenance."""
    import hashlib

    import numpy as np

    from cassandra_spark.operators.codecs import sniff_mime
    from cassandra_spark.operators.llm_multimodal import sample_frames
    from cassandra_spark.operators.mp4 import (
        decode_mp4_frame,
        demux_mp4,
        encode_mp4_mjpeg,
    )

    w, h = 8, 4
    frames = [bytes((k * 50 + 10,)) * (w * h * 3) for k in range(4)]
    data = encode_mp4_mjpeg(w, h, frames, fps=4)  # 250 ms/frame
    assert sniff_mime(data) == "video/mp4"
    docs = spark.createDataFrame(
        [(11, bytearray(data))], "doc_id bigint, payload binary"
    )
    out = sorted(
        sample_frames(
            docs, every_ms=500, allow_stub=False, payload_col="payload"
        ).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_ts_ms for r in out] == [0, 500]
    assert [r.src_frame for r in out] == [0, 2]
    s = demux_mp4(data)
    for r in out:
        assert r.frame_sha == hashlib.sha1(
            decode_mp4_frame(s, r.src_frame)
        ).hexdigest()
    assert all((r.width, r.height) == (w, h) for r in out)


def test_mp4_intercoded_track_gates_honestly(spark):
    """An avc1 (H.264) track DEMUXES with real metadata but its bitstream
    is not locally decodable: sample_frames raises without allow_stub
    and degrades to the byte-stub sampler with it."""
    import pytest

    from cassandra_spark.operators.llm_multimodal import sample_frames
    from cassandra_spark.operators.mp4 import demux_mp4, encode_mp4_mjpeg

    data = encode_mp4_mjpeg(8, 4, [bytes(96)], fps=1)
    # patch the stsd SAMPLE-ENTRY fourcc specifically (the hdlr box's
    # "mjpeg" name string also contains the substring)
    at = data.index(b"jpeg", data.index(b"stsd"))
    patched = data[:at] + b"avc1" + data[at + 4:]
    s = demux_mp4(patched)
    assert s.codec == "avc1" and (s.width, s.height) == (8, 4)
    assert len(s.frames) == 1  # sample ranges still real
    docs = spark.createDataFrame(
        [(12, bytearray(patched))], "doc_id bigint, payload binary"
    )
    with pytest.raises(Exception, match="avc1"):
        sample_frames(
            docs, every_ms=500, allow_stub=False, payload_col="payload"
        ).collect()
    out = sample_frames(
        docs, every_ms=500, allow_stub=True, payload_col="payload"
    ).collect()
    assert out and all(r.width is None for r in out)  # stub provenance


# --- Matroska / MKV (operators/mkv.py) ----------------------------------------


def test_mkv_mjpeg_roundtrip():
    """MKV demux (round 7): the writer's single-track V_MJPEG file
    demuxes to the exact geometry/codec/timeline/frame set, each frame
    decoding through the in-repo JPEG codec."""
    from cassandra_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from cassandra_spark.operators.mkv import (
        decode_mkv_frame,
        demux_mkv,
        encode_mkv_mjpeg,
        is_mkv,
    )

    w, h = 16, 8
    frames = [
        bytes(((k * 37 + i) % 256) for i in range(w * h * 3))
        for k in range(4)
    ]
    data = encode_mkv_mjpeg(w, h, frames, fps=5)
    assert is_mkv(data)
    s = demux_mkv(data)
    assert (s.codec, s.width, s.height) == ("V_MJPEG", w, h)
    assert s.timestamps_ms == [0.0, 200.0, 400.0, 600.0]
    for i in range(4):
        want = decode_jpeg(encode_jpeg(w, h, frames[i], quality=85))[3]
        assert decode_mkv_frame(s, i) == want, i


def test_mkv_rejects_malformed_and_gates_intercoded(spark):
    import pytest

    from cassandra_spark.operators.llm_multimodal import sample_frames
    from cassandra_spark.operators.mkv import demux_mkv, encode_mkv_mjpeg

    good = encode_mkv_mjpeg(8, 4, [bytes(96)], fps=1)
    for bad in (b"junk", good[:30], b"\x1a\x45\xdf\xa3\x84abcd"):
        with pytest.raises(ValueError):
            demux_mkv(bad)
    # V_VP9 track: metadata demuxes, frames gate honestly
    patched = good.replace(b"V_MJPEG", b"V_VP9\x00\x00")
    s = demux_mkv(patched)
    assert s.codec == "V_VP9" and len(s.frames) == 1
    docs = spark.createDataFrame(
        [(13, bytearray(patched))], "doc_id bigint, payload binary"
    )
    with pytest.raises(Exception, match="V_VP9"):
        sample_frames(
            docs, every_ms=500, allow_stub=False, payload_col="payload"
        ).collect()
    out = sample_frames(
        docs, every_ms=500, allow_stub=True, payload_col="payload"
    ).collect()
    assert out and all(r.width is None for r in out)


def test_mkv_sniffs_and_flows_through_sampler(spark):
    import hashlib

    from cassandra_spark.operators.codecs import sniff_mime
    from cassandra_spark.operators.llm_multimodal import sample_frames
    from cassandra_spark.operators.mkv import (
        decode_mkv_frame,
        demux_mkv,
        encode_mkv_mjpeg,
    )

    w, h = 8, 4
    frames = [bytes((k * 50 + 10,)) * (w * h * 3) for k in range(4)]
    data = encode_mkv_mjpeg(w, h, frames, fps=4)  # 250 ms/frame
    assert sniff_mime(data) == "video/x-matroska"
    docs = spark.createDataFrame(
        [(14, bytearray(data))], "doc_id bigint, payload binary"
    )
    out = sorted(
        sample_frames(
            docs, every_ms=500, allow_stub=False, payload_col="payload"
        ).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_ts_ms for r in out] == [0, 500]
    assert [r.src_frame for r in out] == [0, 2]
    s = demux_mkv(data)
    for r in out:
        assert r.frame_sha == hashlib.sha1(
            decode_mkv_frame(s, r.src_frame)
        ).hexdigest()


# --- hypothesis property tests: entropy coders never corrupt ----------------


def test_qm_coder_hypothesis_roundtrip():
    """Property: ANY bit sequence over ANY context assignment round-trips
    through the QM coder exactly (hypothesis-driven)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cassandra_spark.operators.jpeg_arith import (
        FIXED_BIN_INDEX,
        ArithDecoder,
        ArithEncoder,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 5), st.integers(0, 1)),
            min_size=0,
            max_size=400,
        )
    )
    def run(seq):
        enc = ArithEncoder()
        est = [[0, 0] for _ in range(6)] + [[FIXED_BIN_INDEX, 0]]
        for ctx, bit in seq:
            enc.encode(est[ctx], bit)
        data = enc.flush()
        dec = ArithDecoder(data + b"\xff\xd9", 0)
        est2 = [[0, 0] for _ in range(6)] + [[FIXED_BIN_INDEX, 0]]
        assert [dec.decode(est2[c]) for c, _ in seq] == [b for _, b in seq]

    run()


def test_lossless_jpeg_hypothesis_roundtrip():
    """Property: random images round-trip byte-exactly through SOF3 for a
    random predictor (hypothesis-driven)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cassandra_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(1, 9),
        st.integers(1, 9),
        st.integers(1, 7),
        st.integers(0, 2**32 - 1),
    )
    def run(w, h, pred, seed):
        rgb = bytes(
            (seed * 1103515245 + i * 12345 + 17) % 256
            for i in range(w * h * 3)
        )
        assert decode_jpeg(encode_jpeg_lossless(w, h, rgb, pred)) == (
            w, h, 3, rgb,
        )

    run()


def test_lossless_arith_jpeg_hypothesis_roundtrip():
    """Property: random images round-trip byte-exactly through SOF11 for
    a random predictor (hypothesis-driven) — the QM-coder twin of the
    SOF3 property above."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cassandra_spark.operators.jpeg import decode_jpeg
    from cassandra_spark.operators.jpeg_arith import (
        encode_jpeg_lossless_arith,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 9),
        st.integers(1, 9),
        st.integers(1, 7),
        st.integers(0, 2**32 - 1),
    )
    def run(w, h, pred, seed):
        rgb = bytes(
            (seed * 1103515245 + i * 12345 + 17) % 256
            for i in range(w * h * 3)
        )
        assert decode_jpeg(
            encode_jpeg_lossless_arith(w, h, rgb, pred)
        ) == (w, h, 3, rgb)

    run()


def test_hierarchical_lossless_final_hypothesis_roundtrip():
    """Property: random images survive the FULL hierarchical pyramid
    byte-exactly when the final stage is differential-lossless — both
    the SOF15 arithmetic and SOF7 Huffman coders (hypothesis-driven)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cassandra_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_hierarchical,
    )

    @settings(max_examples=15, deadline=None)
    @given(
        st.integers(1, 9),
        st.integers(1, 9),
        st.booleans(),
        st.integers(0, 2**32 - 1),
    )
    def run(w, h, arith, seed):
        rgb = bytes(
            (seed * 2654435761 + i * 40503 + 29) % 256
            for i in range(w * h * 3)
        )
        out = decode_jpeg(
            encode_jpeg_hierarchical(
                w, h, rgb, quality=35, lossless_final=True,
                arithmetic=arith,
            )
        )
        assert out == (w, h, 3, rgb)

    run()


def test_hierarchical_jpeg_pyramid_roundtrip():
    """Annex-J hierarchical: DHP + half-res SOF0 stage + EXP + full-res
    SOF5 differential stage. Fidelity at full size is bounded by the
    stage-2 quantizer (comparable to plain sequential at the same
    quality), and the error tightens as quality rises."""
    import numpy as np

    from cassandra_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_hierarchical,
    )

    from cassandra_spark.operators.jpeg import encode_jpeg

    for w, h in ((16, 24), (9, 7), (33, 17)):
        rgb = b"".join(
            bytes(
                ((x * 37 + y * 11) % 256, (x * 5 + y * 3) % 256,
                 (x * x + y) % 256)
            )
            for y in range(h)
            for x in range(w)
        )
        src = np.frombuffer(rgb, np.uint8).astype(int)
        prev_err = None
        for q in (60, 85, 95):
            data = encode_jpeg_hierarchical(w, h, rgb, q)
            assert b"\xff\xde" in data and b"\xff\xdf" in data  # DHP, EXP
            assert b"\xff\xc5" in data  # differential frame
            w2, h2, c, out = decode_jpeg(data)
            assert (w2, h2, c) == (w, h, 3)
            err = int(np.abs(
                np.frombuffer(out, np.uint8).astype(int) - src
            ).max())
            seq_err = int(np.abs(
                np.frombuffer(
                    decode_jpeg(encode_jpeg(w, h, rgb, q))[3], np.uint8
                ).astype(int) - src
            ).max())
            # the pyramid's full-size fidelity tracks plain sequential at
            # the same quality (stage-2 residual quantization dominates)
            assert err <= seq_err + 20, (w, h, q, err, seq_err)
            if prev_err is not None:
                assert err <= prev_err + 2, (w, h, q)  # quality monotone
            prev_err = err


def test_hierarchical_jpeg_rejects_illegal_structure():
    import pytest as _pytest

    from cassandra_spark.operators.jpeg import decode_jpeg

    # differential frame with no DHP
    import struct

    bad = bytearray(b"\xff\xd8")
    bad += b"\xff\xc5" + struct.pack(">HBHHB", 11, 8, 4, 4, 1)
    bad += struct.pack("BBB", 1, 0x11, 0)
    bad += b"\xff\xd9"
    with _pytest.raises(ValueError, match="differential frame outside"):
        decode_jpeg(bytes(bad))


def test_container_demux_hypothesis_roundtrip():
    """Property: random frame sets round-trip through BOTH round-7
    containers (MJPEG MP4 and V_MJPEG MKV) — geometry, frame count,
    timeline, and per-frame decoded pixels all survive (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cassandra_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from cassandra_spark.operators.mkv import (
        decode_mkv_frame,
        demux_mkv,
        encode_mkv_mjpeg,
    )
    from cassandra_spark.operators.mp4 import (
        decode_mp4_frame,
        demux_mp4,
        encode_mp4_mjpeg,
    )

    @settings(max_examples=15, deadline=None)
    @given(
        st.integers(1, 12),
        st.integers(1, 12),
        st.integers(1, 5),
        st.integers(1, 30),
        st.integers(0, 2**32 - 1),
    )
    def run(w, h, n, fps, seed):
        frames = [
            bytes((seed * 48271 + k * 193 + i * 7) % 256
                  for i in range(w * h * 3))
            for k in range(n)
        ]
        want = [
            decode_jpeg(encode_jpeg(w, h, f, quality=85))[3] for f in frames
        ]
        m4 = demux_mp4(encode_mp4_mjpeg(w, h, frames, fps=fps))
        assert (m4.width, m4.height, len(m4.frames)) == (w, h, n)
        mk = demux_mkv(encode_mkv_mjpeg(w, h, frames, fps=fps))
        assert (mk.width, mk.height, len(mk.frames)) == (w, h, n)
        for i in range(n):
            assert decode_mp4_frame(m4, i) == want[i]
            assert decode_mkv_frame(mk, i) == want[i]

    run()


# --- MKV lacing (round 8: Xiph / EBML / fixed-size) --------------------------


def test_mkv_laced_roundtrip_all_modes():
    """Each lacing mode round-trips through the writer: one SimpleBlock
    holding every frame, split back per its size table, frames decoding
    to the original RGB."""
    from cassandra_spark.operators.mkv import (
        decode_mkv_frame,
        demux_mkv,
        encode_mkv_mjpeg,
    )

    w, h = 8, 6
    # xiph/ebml: different content per frame → different JPEG sizes,
    # exercising the size tables; fixed: identical frames (equal sizes)
    varied = [
        bytes((i * 37 + j) % 256 for j in range(w * h * 3)) for i in range(4)
    ]
    same = [bytes((j * 11) % 256 for j in range(w * h * 3))] * 3
    for mode, frames in (
        ("xiph", varied), ("ebml", varied), ("fixed", same),
    ):
        data = encode_mkv_mjpeg(w, h, frames, fps=10, lacing=mode)
        s = demux_mkv(data)
        assert s.codec == "V_MJPEG" and (s.width, s.height) == (w, h)
        assert len(s.frames) == len(frames), mode
        # laced frames must byte-equal the per-cluster layout's frames
        # (JPEG is lossy, so decoded-RGB equality is vs the plain layout)
        plain = demux_mkv(encode_mkv_mjpeg(w, h, frames, fps=10))
        assert s.frames == plain.frames, mode
        for i in range(len(frames)):
            assert decode_mkv_frame(s, i) == decode_mkv_frame(plain, i), (
                mode, i,
            )


def test_mkv_single_frame_lace_degenerates():
    from cassandra_spark.operators.mkv import demux_mkv, encode_mkv_mjpeg

    rgb = [bytes(8 * 4 * 3)]
    for mode in ("xiph", "ebml", "fixed"):
        s = demux_mkv(encode_mkv_mjpeg(8, 4, rgb, lacing=mode))
        assert len(s.frames) == 1


def test_mkv_fixed_lacing_requires_equal_sizes():
    from cassandra_spark.operators.mkv import encode_mkv_mjpeg

    w, h = 8, 6
    varied = [
        bytes((i * 37 + j) % 256 for j in range(w * h * 3)) for i in range(2)
    ]
    with pytest.raises(ValueError, match="equal-size"):
        encode_mkv_mjpeg(w, h, varied, lacing="fixed")


def test_mkv_lace_payload_blockframes_hypothesis_roundtrip():
    """Property: arbitrary frame byte-strings (sizes spanning the Xiph
    255-run and EBML multi-byte-vint regimes) tile exactly through
    _lace_payload → _block_frames for every mode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cassandra_spark.operators.mkv import _block_frames, _lace_payload

    lace_bits = {"xiph": 0x02, "fixed": 0x04, "ebml": 0x06}

    @settings(max_examples=60, deadline=None)
    @given(
        st.sampled_from(["xiph", "ebml"]),
        st.lists(st.binary(min_size=0, max_size=700), min_size=1,
                 max_size=6),
    )
    def run(mode, frames):
        payload = _lace_payload(frames, mode)
        got = list(_block_frames(
            b"\x00" + payload, 1, 1 + len(payload), 0x80 | lace_bits[mode]
        ))
        assert got == frames

    run()

    @settings(max_examples=20, deadline=None)
    @given(st.binary(min_size=0, max_size=300), st.integers(1, 6))
    def run_fixed(frame, n):
        frames = [frame] * n
        payload = _lace_payload(frames, "fixed")
        got = list(_block_frames(
            b"\x00" + payload, 1, 1 + len(payload), 0x80 | lace_bits["fixed"]
        ))
        assert got == frames

    run_fixed()


def test_mkv_malformed_laces_raise_not_misparse():
    from cassandra_spark.operators.mkv import _block_frames

    # xiph sizes overrun the payload
    with pytest.raises(ValueError):
        list(_block_frames(b"\x01\xff\xff\x0aAB", 0, 6, 0x82))
    # fixed lacing with indivisible payload
    with pytest.raises(ValueError):
        list(_block_frames(b"\x02ABCDE", 0, 6, 0x84))
    # truncated EBML size table
    with pytest.raises(ValueError):
        list(_block_frames(b"\x02", 0, 1, 0x86))


# --- APNG (round 8) -----------------------------------------------------------


def test_apng_writer_roundtrip_exact():
    from cassandra_spark.operators.apng import (
        decode_apng_frames,
        encode_apng,
        is_apng,
    )

    w, h = 6, 4
    f1 = bytes((i * 7) % 256 for i in range(w * h * 3))
    f2 = bytes((i * 13 + 5) % 256 for i in range(w * h * 3))
    blob = encode_apng(w, h, [f1, f2], delays_ms=[40, 80])
    assert is_apng(blob)
    gw, gh, frames = decode_apng_frames(blob)
    assert (gw, gh) == (w, h)
    assert [d for d, _ in frames] == [40, 80]
    assert [r for _, r in frames] == [f1, f2]


def test_apng_static_png_is_not_apng():
    from cassandra_spark.operators.apng import decode_apng_frames, is_apng
    from cassandra_spark.operators.codecs import encode_png

    plain = encode_png(4, 4, bytes(48))
    assert not is_apng(plain)
    with pytest.raises(ValueError, match="acTL"):
        decode_apng_frames(plain)


def _apng_rgba(frames):
    """Hand-build an RGBA APNG from (fctl_fields, rgba_bytes) specs."""
    import struct
    import zlib

    from cassandra_spark.operators.apng import _chunk

    w, h = frames[0][0][1], frames[0][0][2]  # first frame is full canvas
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(b"IHDR", ihdr)
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for i, (fctl, rgba) in enumerate(frames):
        fw, fh = fctl[1], fctl[2]
        rows = b"".join(
            b"\x00" + rgba[y * fw * 4 : (y + 1) * fw * 4] for y in range(fh)
        )
        idat = zlib.compress(rows)
        out += _chunk(b"fcTL", struct.pack(">IIIIIHHBB", seq, *fctl[1:]))
        seq += 1
        if i == 0:
            out += _chunk(b"IDAT", idat)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + idat)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def test_apng_region_blend_over_and_dispose():
    """Region frames: OVER blends with source alpha; dispose BACKGROUND
    clears the region to transparent for the NEXT frame; dispose
    PREVIOUS restores the pre-frame canvas."""
    from cassandra_spark.operators.apng import decode_apng_frames

    w, h = 4, 2
    red = bytes([255, 0, 0, 255]) * (w * h)
    # frame 2: 2x1 region at (1, 0), half-alpha green, blend OVER,
    # dispose BACKGROUND
    green = bytes([0, 255, 0, 128]) * 2
    # frame 3: 1x1 region at (0, 1), opaque blue, blend SOURCE, dispose 0
    blue = bytes([0, 0, 255, 255])
    blob = _apng_rgba([
        ((0, w, h, 0, 0, 10, 1000, 0, 0), red),
        ((0, 2, 1, 1, 0, 10, 1000, 1, 1), green),
        ((0, 1, 1, 0, 1, 10, 1000, 0, 0), blue),
    ])
    gw, gh, frames = decode_apng_frames(blob)
    assert (gw, gh) == (w, h)
    f1, f2, f3 = (r for _, r in frames)
    assert f1 == bytes([255, 0, 0]) * (w * h)
    # OVER math: a=128 over opaque red -> (127, 128, 0)
    px = f2[3 * 1 : 3 * 1 + 3], f2[3 * 2 : 3 * 2 + 3]
    assert px == (bytes([127, 128, 0]), bytes([127, 128, 0])), f2.hex()
    assert f2[:3] == bytes([255, 0, 0])  # outside the region untouched
    # frame 2 disposed to BACKGROUND: its region is transparent in f3
    assert f3[3 * 1 : 3 * 1 + 3] == bytes(3)
    assert f3[3 * 2 : 3 * 2 + 3] == bytes(3)
    # frame 3's own blue pixel landed at row 1, col 0
    assert f3[3 * w : 3 * w + 3] == bytes([0, 0, 255])
    # untouched red persists elsewhere
    assert f3[:3] == bytes([255, 0, 0])


def test_apng_sequence_validation():
    import struct

    from cassandra_spark.operators.apng import (
        decode_apng_frames,
        encode_apng,
    )

    blob = bytearray(encode_apng(4, 2, [bytes(24), bytes(24)]))
    # corrupt the fdAT sequence number
    i = blob.find(b"fdAT")
    struct.pack_into(">I", blob, i + 4, 9)
    with pytest.raises(ValueError, match="sequence"):
        decode_apng_frames(bytes(blob))


def test_apng_flows_through_sample_frames(spark):
    from cassandra_spark.operators.apng import encode_apng
    from cassandra_spark.operators.llm_multimodal import sample_frames

    w, h = 5, 3
    frames = [
        bytes((i * k + 3) % 256 for i in range(w * h * 3))
        for k in (7, 11, 13)
    ]
    payload = encode_apng(w, h, frames, delays_ms=[500, 500, 500])
    docs = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, text binary"
    )
    rows = sample_frames(docs, every_ms=500).collect()
    assert len(rows) == 3
    assert [r.src_frame for r in rows] == [0, 1, 2]
    assert all((r.width, r.height) == (w, h) for r in rows)
    import hashlib

    assert rows[1].frame_sha == hashlib.sha1(frames[1]).hexdigest()


def test_png_trns_alpha_in_keep_alpha_mode():
    """tRNS transparency surfaces through keep_alpha: per-index alpha for
    palettes, the single transparent colour for truecolour/grayscale —
    and an APNG palette frame with tRNS composites as a DELTA frame."""
    import struct
    import zlib

    from cassandra_spark.operators.apng import _chunk, decode_apng_frames
    from cassandra_spark.operators.codecs import decode_png

    sig = b"\x89PNG\r\n\x1a\n"

    # palette: index 0 red opaque, index 1 green alpha 0
    def pal_png(w, h, indexes, trns):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
        rows = b"".join(
            b"\x00" + bytes(indexes[y * w : (y + 1) * w]) for y in range(h)
        )
        return (
            sig
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
            + _chunk(b"tRNS", trns)
            + _chunk(b"IDAT", zlib.compress(rows))
            + _chunk(b"IEND", b"")
        )

    w, h = 2, 1
    png = pal_png(w, h, [0, 1], bytes([255, 0]))
    _, _, ch, rgba = decode_png(png, keep_alpha=True)
    assert ch == 4
    assert rgba[3] == 255 and rgba[7] == 0, "per-index tRNS alpha"
    # plain RGB mode is unchanged (alpha dropped, palette colours kept)
    assert decode_png(png)[3] == bytes([255, 0, 0, 0, 255, 0])

    # truecolour single transparent colour (depth 8: value in LOW byte)
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    rows = b"\x00" + bytes([10, 20, 30, 40, 50, 60])
    tc = (
        sig
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"tRNS", struct.pack(">HHH", 10, 20, 30))
        + _chunk(b"IDAT", zlib.compress(rows))
        + _chunk(b"IEND", b"")
    )
    _, _, _, rgba = decode_png(tc, keep_alpha=True)
    assert rgba[3] == 0, "matching pixel transparent"
    assert rgba[7] == 255, "non-matching pixel opaque"

    # APNG delta frame: full red base, then a palette frame whose
    # transparent index must leave the base pixel visible under OVER
    base_ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    base_rows = b"\x00" + bytes([0, 0])  # both red
    f2_rows = b"\x00" + bytes([1, 0])  # transparent, then red again
    blob = (
        sig
        + _chunk(b"IHDR", base_ihdr)
        + _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
        + _chunk(b"tRNS", bytes([255, 0]))
        + _chunk(b"acTL", struct.pack(">II", 2, 0))
        + _chunk(
            b"fcTL",
            struct.pack(">IIIIIHHBB", 0, 2, 1, 0, 0, 10, 1000, 0, 0),
        )
        + _chunk(b"IDAT", zlib.compress(base_rows))
        + _chunk(
            b"fcTL",
            struct.pack(">IIIIIHHBB", 1, 2, 1, 0, 0, 10, 1000, 0, 1),
        )
        + _chunk(b"fdAT", struct.pack(">I", 2) + zlib.compress(f2_rows))
        + _chunk(b"IEND", b"")
    )
    _, _, frames = decode_apng_frames(blob)
    assert frames[0][1] == bytes([255, 0, 0, 255, 0, 0])
    # OVER with a fully-transparent source pixel keeps the base red
    assert frames[1][1] == bytes([255, 0, 0, 255, 0, 0])
