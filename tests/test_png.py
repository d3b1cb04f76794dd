"""Pure-stdlib PNG codec (multimodal/png.py): decode correctness for
every filter type, palette expansion, resize, and the Spark
resize_images integration with real PNG payloads."""

from __future__ import annotations

import struct
import zlib

import pytest

from redmap_spark.multimodal.png import (
    UnsupportedPng,
    decode_png,
    encode_png,
    resize_nearest,
    resize_png,
)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", zlib.crc32(tag + body))


def _png(width, height, color_type, raw_scanlines, plte=b""):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw_scanlines)) + _chunk(b"IEND", b"")


def test_roundtrip_rgb():
    px = bytes(range(2 * 2 * 3))  # 2x2 RGB, distinct bytes
    data = encode_png(2, 2, 3, px)
    w, h, ch, got = decode_png(data)
    assert (w, h, ch) == (2, 2, 3)
    assert bytes(got) == px


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_every_filter_type_decodes(f):
    """Encode 3x3 gray with a forced filter byte per row and verify the
    decoder reconstructs the original pixels (filters are defined
    relative to raw bytes, so build the filtered rows by hand)."""
    pix = [[10, 60, 250], [90, 40, 200], [5, 120, 33]]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    rows = []
    for y in range(3):
        line = bytearray([f])
        for x in range(3):
            v = pix[y][x]
            left = pix[y][x - 1] if x else 0
            up = pix[y - 1][x] if y else 0
            ul = pix[y - 1][x - 1] if (x and y) else 0
            if f == 0:
                enc = v
            elif f == 1:
                enc = (v - left) & 0xFF
            elif f == 2:
                enc = (v - up) & 0xFF
            elif f == 3:
                enc = (v - ((left + up) >> 1)) & 0xFF
            else:
                enc = (v - paeth(left, up, ul)) & 0xFF
            line.append(enc)
        rows.append(bytes(line))
    data = _png(3, 3, 0, b"".join(rows))
    w, h, ch, got = decode_png(data)
    assert (w, h, ch) == (3, 3, 1)
    assert list(got) == [v for row in pix for v in row]


def test_palette_expands_to_rgb():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red green blue
    raw = b"\x00\x00\x01" + b"\x00\x02\x01"  # rows: [red,green],[blue,green]
    w, h, ch, got = decode_png(_png(2, 2, 3, raw, plte=plte))
    assert (w, h, ch) == (2, 2, 3)
    assert bytes(got) == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 255, 0])


def test_unsupported_raises():
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    data = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr16)
    with pytest.raises(UnsupportedPng):
        decode_png(data)
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_resize_nearest_downsample():
    # 4x4 gray quadrant image -> 2x2 picks one value per quadrant
    px = bytearray(16)
    for y in range(4):
        for x in range(4):
            px[y * 4 + x] = (0 if y < 2 else 100) + (0 if x < 2 else 10)
    out = resize_nearest(4, 4, 1, bytes(px), 2, 2)
    assert list(out) == [0, 10, 100, 110]


def test_resize_png_roundtrip_valid():
    big = encode_png(4, 4, 3, bytes(range(48)))
    small = resize_png(big, 2, 2)
    w, h, ch, px = decode_png(small)
    assert (w, h, ch) == (2, 2, 3)
    assert len(px) == 12


def test_spark_resize_images_real_png(spark):
    """resize_images must emit a VALID smaller PNG for PNG payloads and
    keep the decimation fallback for non-PNG payloads."""
    from redmap_spark.multimodal.columns import resize_images

    big = encode_png(4, 4, 3, bytes(range(48)))
    df = spark.createDataFrame(
        [(1, big), (2, b"plain text payload")], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in resize_images(df, target_w=2, target_h=2).collect()}
    w, h, ch, px = decode_png(bytes(rows[1].payload))
    assert (w, h, ch) == (2, 2, 3)
    assert (rows[1].width, rows[1].height) == (4, 4)  # true header dims
    assert len(rows[2].payload) <= 4  # fallback decimation to tw*th bytes


# ---------------------------------------------------------------- JPEG


def test_jpeg_roundtrip_gray_and_color():
    """Baseline JPEG codec (multimodal/jpeg.py): encode → decode must
    reproduce pixels within rounding error under a flat quant table."""
    import numpy as np

    from redmap_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(gray))
    assert out.shape == (16, 24)
    assert int(np.max(np.abs(out.astype(int) - gray.astype(int)))) <= 1

    rgb = rng.integers(0, 256, (8, 16, 3), dtype=np.uint8)
    out3 = decode_jpeg(encode_jpeg(rgb))
    assert out3.shape == (8, 16, 3)
    # YCbCr forward+inverse adds one more rounding step
    assert int(np.max(np.abs(out3.astype(int) - rgb.astype(int)))) <= 3


def test_jpeg_lossy_quant_still_close():
    """A non-trivial quant table loses information but a smooth image
    must stay visually close (mean abs error small)."""
    import numpy as np

    from redmap_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    xx, yy = np.meshgrid(np.arange(32), np.arange(16))
    smooth = ((xx * 5 + yy * 3) % 256).astype(np.uint8)
    q = np.full(64, 8, dtype=np.int64)
    out = decode_jpeg(encode_jpeg(smooth, quant=q))
    err = np.abs(out.astype(int) - smooth.astype(int))
    assert float(err.mean()) < 4.0, err.mean()


def test_jpeg_decoder_rejects_progressive():
    """Progressive (SOF2) streams must raise — the seam's fallback
    handles them, never a wrong-pixel decode."""
    import numpy as np
    import pytest

    from redmap_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    enc = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC2  # masquerade as progressive
    with pytest.raises(ValueError):
        decode_jpeg(bytes(enc))


def test_resize_real_jpeg_payload(spark):
    """mm_resize produces a VALID smaller JPEG for real JPEG payloads:
    decodable, right dimensions, pixel content preserved."""
    import numpy as np
    from pyspark.sql import Row

    from redmap_spark.multimodal.columns import resize_images
    from redmap_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    grad = np.tile(np.arange(0, 256, 8, dtype=np.uint8), (16, 1))  # 16x32 gradient
    payload = encode_jpeg(grad)
    df = spark.createDataFrame([Row(doc_id=1, payload=bytearray(payload))])
    row = resize_images(df, target_w=8, target_h=8).collect()[0]
    assert (row.width, row.height) == (32, 16)
    small = decode_jpeg(bytes(row.payload))
    assert small.shape == (8, 8)
    # nearest-neighbor of a horizontal gradient stays monotonic
    assert all(small[0, i] <= small[0, i + 1] + 2 for i in range(7))


# ----------------------------------------------------------------- GIF


def test_gif_lzw_roundtrip_exact():
    """GIF LZW codec (multimodal/gif.py): palette images round-trip
    EXACTLY (LZW is lossless), including the 4-color minimum palette
    and the KwKwK-exercising uncompressed stream."""
    import numpy as np

    from redmap_spark.multimodal.gif import decode_gif, decode_gif_indexed, encode_gif

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (13, 21), dtype=np.int32)
    enc = encode_gif(idx, pal)
    i2, p2 = decode_gif_indexed(enc)
    assert (i2 == idx).all() and (p2 == pal).all()
    assert (decode_gif(enc) == pal[idx]).all()

    pal4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx4 = rng.integers(0, 4, (8, 8), dtype=np.int32)
    assert (decode_gif(encode_gif(idx4, pal4)) == pal4[idx4]).all()


def test_gif_decoder_rejects_interlaced():
    import numpy as np
    import pytest

    from redmap_spark.multimodal.gif import decode_gif, encode_gif

    pal4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    enc = bytearray(encode_gif(np.zeros((8, 8), dtype=np.int32), pal4))
    desc = enc.find(b"\x2c")
    enc[desc + 9] |= 0x40  # set the interlace flag
    with pytest.raises(ValueError):
        decode_gif(bytes(enc))


def test_resize_real_gif_payload(spark):
    """mm_resize emits a VALID smaller GIF with the SAME palette for
    real GIF payloads."""
    import numpy as np
    from pyspark.sql import Row

    from redmap_spark.multimodal.columns import resize_images
    from redmap_spark.multimodal.gif import decode_gif_indexed, encode_gif

    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = np.tile(np.arange(8, dtype=np.int32), (16, 4))  # 16x32 stripes
    payload = encode_gif(idx, pal)
    df = spark.createDataFrame([Row(doc_id=1, payload=bytearray(payload))])
    row = resize_images(df, target_w=8, target_h=4).collect()[0]
    assert (row.width, row.height) == (32, 16)
    small_idx, small_pal = decode_gif_indexed(bytes(row.payload))
    assert small_idx.shape == (4, 8)
    assert (small_pal == pal).all()
    # nearest-neighbor of horizontal stripes keeps the stripe values
    assert set(np.unique(small_idx)) <= set(range(8))


def test_sample_frames_real_animated_gif(spark):
    """sample_frames emits REAL decoded frames for animated GIFs:
    every_n sampling, each emitted payload a valid single-frame GIF
    whose pixels equal the source frame exactly."""
    import numpy as np
    from pyspark.sql import Row

    from redmap_spark.multimodal.columns import sample_frames
    from redmap_spark.multimodal.gif import (
        decode_gif_indexed,
        encode_gif_animated,
    )

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    frames = [rng.integers(0, 8, (6, 10), dtype=np.int32) for _ in range(5)]
    payload = encode_gif_animated(frames, pal)
    df = spark.createDataFrame([Row(doc_id=1, payload=bytearray(payload))])
    out = sorted(sample_frames(df, every_n=2).collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in out] == [0, 2, 4]
    for r in out:
        idx, p = decode_gif_indexed(bytes(r.frame_payload))
        assert (idx == frames[r.frame_idx]).all() and (p == pal).all()


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 chroma subsampling (the shape real camera JPEGs use):
    encoder interleaves 4 Y + Cb + Cr blocks per 16x16 MCU, decoder
    upsamples chroma back. Smooth images stay visually close; the
    4:4:4 and grayscale paths are unchanged."""
    import numpy as np

    from redmap_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    xx, yy = np.meshgrid(np.arange(32), np.arange(16))
    smooth = np.stack(
        [(xx * 4) % 256, (yy * 6) % 256, ((xx + yy) * 3) % 256], axis=-1
    ).astype(np.uint8)
    enc = encode_jpeg(smooth, subsample=True)
    dec = decode_jpeg(enc)
    assert dec.shape == smooth.shape
    err = np.abs(dec.astype(int) - smooth.astype(int))
    assert float(err.mean()) < 3.0 and int(err.max()) <= 16, (err.mean(), err.max())
    # the subsampled stream is smaller than 4:4:4 of the same image
    assert len(enc) < len(encode_jpeg(smooth))


def test_jpeg_restart_markers():
    """DRI/RSTn support: restart markers byte-align the stream and
    reset DC prediction; decode is bit-identical to the no-DRI stream
    of the same image, in both grayscale and 4:2:0 paths."""
    import numpy as np

    from redmap_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    enc = encode_jpeg(gray, restart_interval=2)
    assert b"\xff\xdd" in enc and b"\xff\xd0" in enc
    assert (decode_jpeg(enc) == decode_jpeg(encode_jpeg(gray))).all()

    rgb = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    a = decode_jpeg(encode_jpeg(rgb, subsample=True, restart_interval=1))
    b = decode_jpeg(encode_jpeg(rgb, subsample=True))
    assert (a == b).all()


def test_gif_partial_region_compositing():
    """Partial-region animated GIF frames composite onto the logical
    screen: a patch frame updates only its (x, y, w, h) region, the
    rest of the canvas carries over (disposal=leave); disposal=3
    (restore-previous) is rejected, not mis-rendered."""
    import numpy as np
    import pytest

    from redmap_spark.multimodal.gif import (
        decode_gif_composited,
        encode_gif_partial,
    )

    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    base = rng.integers(0, 8, (10, 12), dtype=np.int32)
    patch = rng.integers(0, 8, (4, 5), dtype=np.int32)
    enc = encode_gif_partial(base, [(patch, 3, 2)], pal)
    frames = decode_gif_composited(enc)
    assert len(frames) == 2
    want0 = pal[base]
    assert (frames[0] == want0).all()
    want1 = want0.copy()
    want1[2:6, 3:8] = pal[patch]
    assert (frames[1] == want1).all()

    # disposal=3 rejected
    bad = bytearray(enc)
    gce = bad.find(b"\x21\xf9")
    bad[gce + 3] = 0x0C  # disposal bits -> 3
    with pytest.raises(ValueError):
        decode_gif_composited(bytes(bad))
