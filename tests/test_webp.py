"""Clean-room VP8L codec (multimodal/webp.py): encoder round-trips,
hand-built bitstreams for the decoder-only features (LZ77, color
cache, all four transforms), container handling, and the
decode_pixel_array dispatch integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from redmap_spark.multimodal.webp import (
    _BitWriter,
    _GREEN_BASE,
    UnsupportedWebp,
    decode_vp8l,
    decode_webp,
    encode_vp8l,
)


def _rgba(w, h, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)


def test_roundtrip_rgba():
    px = _rgba(13, 9)
    data = encode_vp8l(13, 9, 4, px.tobytes())
    got = decode_webp(data)
    assert got.shape == (9, 13, 4)
    assert np.array_equal(got, px)


def test_roundtrip_rgb_and_gray():
    rgb = _rgba(5, 4)[:, :, :3]
    got = decode_webp(encode_vp8l(5, 4, 3, rgb.tobytes()))
    assert np.array_equal(got[:, :, :3], rgb)
    assert (got[:, :, 3] == 255).all()

    gray = _rgba(6, 3)[:, :, 0]
    got = decode_webp(encode_vp8l(6, 3, 1, gray.tobytes()))
    for c in range(3):
        assert np.array_equal(got[:, :, c], gray)


def test_roundtrip_single_color_and_two_colors():
    # exercises the simple (1- and 2-symbol) prefix-code paths
    one = np.full((4, 4, 4), 200, dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_vp8l(4, 4, 4, one.tobytes())), one)
    two = one.copy()
    two[::2, :, 1] = 3
    assert np.array_equal(decode_webp(encode_vp8l(4, 4, 4, two.tobytes())), two)


def test_roundtrip_1x1_and_wide():
    px = _rgba(1, 1)
    assert np.array_equal(decode_webp(encode_vp8l(1, 1, 4, px.tobytes())), px)
    wide = _rgba(300, 2)
    assert np.array_equal(
        decode_webp(encode_vp8l(300, 2, 4, wide.tobytes())), wide
    )


def test_header_dims_match_columns_parser():
    """encode_vp8l output must parse in the pre-existing header walk
    (multimodal/columns.py) with the same dimensions."""
    from redmap_spark.multimodal.columns import parse_image_header

    data = encode_vp8l(37, 21, 3, bytes(37 * 21 * 3))
    assert parse_image_header(data) == (37, 21, 1)


def test_lossy_vp8_raises_unsupported():
    body = b"\x00" * 10 + b"\x9d\x01\x2a" + struct.pack("<HH", 64, 48)
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    with pytest.raises(UnsupportedWebp):
        decode_webp(payload)


def test_corrupt_streams_raise_value_error():
    with pytest.raises(ValueError):
        decode_vp8l(b"\x00\x01\x02")
    good = encode_vp8l(8, 8, 3, bytes(range(8 * 8 * 3 % 256)) * (8 * 8 * 3 // 256 + 1))
    # find the VP8L chunk and truncate it hard
    with pytest.raises(ValueError):
        decode_vp8l(good[20:28])


def test_corrupt_prefix_codes_raise_value_error_not_crash():
    """The two ADVICE r10 corrupt-stream shapes must surface as
    ValueError (the documented corrupt-media fallback contract), not
    StopIteration/IndexError escaping the mapInPandas generator:

    1. a normal code whose code-length code has ALL-ZERO lengths
       (previously StopIteration from the single-symbol picker);
    2. a simple code whose 8-bit symbol exceeds the alphabet size
       (previously IndexError on the 40-symbol distance alphabet).
    """
    from redmap_spark.multimodal.webp import _BitReader, _read_prefix_code

    # shape 1: not-simple (0), num_clc-4 = 0 (4 bits), then 4x3 zero bits
    bw = _BitWriter()
    bw.put_bits(0, 1)
    bw.put_bits(0, 4)
    for _ in range(4):
        bw.put_bits(0, 3)
    with pytest.raises(ValueError, match="no symbols"):
        _read_prefix_code(_BitReader(bw.getvalue()), 256)

    # shape 2: simple (1), 2 symbols (1), 8-bit form (1), syms 60/61 >= 40
    for syms in ([60], [3, 61]):
        bw = _BitWriter()
        bw.put_bits(1, 1)
        bw.put_bits(len(syms) - 1, 1)
        bw.put_bits(1, 1)
        bw.put_bits(syms[0], 8)
        if len(syms) == 2:
            bw.put_bits(syms[1], 8)
        with pytest.raises(ValueError, match="out of range"):
            _read_prefix_code(_BitReader(bw.getvalue()), 40)


# ---------------------------------------------------- hand-built bits
#
# The encoder is literal-only, so the decoder-only features are
# exercised with hand-assembled bitstreams: a tiny writer DSL emits
# headers, simple prefix codes and symbols exactly as the spec lays
# them out.


def _simple_code(bw, syms):
    """Emit a simple prefix code for 1 or 2 symbols (8-bit form)."""
    bw.put_bits(1, 1)
    bw.put_bits(len(syms) - 1, 1)
    bw.put_bits(1, 1)  # first symbol in 8 bits
    bw.put_bits(syms[0], 8)
    if len(syms) == 2:
        bw.put_bits(syms[1], 8)
    # canonical over {sym: len 1} -> smaller symbol gets code 0
    if len(syms) == 1:
        return {syms[0]: (0, 0)}
    lo, hi = sorted(syms)
    return {lo: (0, 1), hi: (1, 1)}


def _header(bw, w, h):
    bw.put_bits(w - 1, 14)
    bw.put_bits(h - 1, 14)
    bw.put_bits(0, 1)
    bw.put_bits(0, 3)


def test_decoder_lz77_vertical_copy():
    """Backref with distance code 1 = 2D map entry (0,1) = the pixel
    one row above; a 4x2 image whose second row copies the first."""
    bw = _BitWriter()
    _header(bw, 4, 2)
    bw.put_bits(0, 1)  # no transforms
    bw.put_bits(0, 1)  # no color cache
    bw.put_bits(0, 1)  # no meta
    # green alphabet: literals 10,11 + length-prefix symbol 256+2
    # (length 3 needs prefix code 2 -> value 3, no extra bits).
    # Complete code (Kraft=1): 10->len1, 11->len2, 258->len2.
    bw.put_bits(0, 1)  # normal code for green (3 symbols)
    # code-length code over lengths used {0,1,2}: 0->len1, 1->len2,
    # 2->len2 (complete); order: 17 18 0 1 2 ... -> 5 entries
    bw.put_bits(5 - 4, 4)  # num_code_lengths = 5
    for v in (0, 0, 1, 2, 2):  # 17,18,0,1,2
        bw.put_bits(v, 3)
    clc = {0: (0, 1), 1: (2, 2), 2: (3, 2)}
    bw.put_bits(0, 1)  # no max-symbol cap
    lens = {10: 1, 11: 2, 256 + 2: 2}
    for i in range(_GREEN_BASE):
        c, ln = clc[lens.get(i, 0)]
        bw.put_code(c, ln)
    # canonical green: 10->0, 11->10, 258->11
    g = {10: (0, 1), 11: (2, 2), 258: (3, 2)}
    r = _simple_code(bw, [1])
    b = _simple_code(bw, [2])
    a = _simple_code(bw, [255])
    d = _simple_code(bw, [0])  # distance prefix symbol 0 -> value 1

    def lit(green):
        bw.put_code(*g[green])
        bw.put_code(*r[1])
        bw.put_code(*b[2])
        bw.put_code(*a[255])

    lit(10)
    lit(11)
    lit(10)
    lit(11)
    lit(10)  # (0,1): row 2 starts with a literal
    bw.put_code(*g[258])  # length 3
    bw.put_code(*d[0])    # distance code 1 -> (0,1) -> dist = width
    out = decode_vp8l(b"\x2f" + bw.getvalue())
    assert out.shape == (2, 4, 4)
    assert np.array_equal(out[1, 1:4], out[0, 1:4])
    assert list(out[0, 0]) == [1, 10, 2, 255]
    assert list(out[0, 1]) == [1, 11, 2, 255]


def test_decoder_color_cache():
    """cache_bits=1: a literal fills a cache slot, a cache symbol
    replays it."""
    bw = _BitWriter()
    _header(bw, 3, 1)
    bw.put_bits(0, 1)  # no transforms
    bw.put_bits(1, 1)  # color cache present
    bw.put_bits(1, 4)  # cache_bits = 1 (2 slots)
    bw.put_bits(0, 1)  # no meta
    # green alphabet = 280 + 2; literals 5, 6 + cache symbol 280+k
    px1 = (255 << 24) | (9 << 16) | (5 << 8) | 7
    k1 = ((0x1E35A7BD * px1) & 0xFFFFFFFF) >> 31
    g2 = next(
        v for v in range(6, 256)
        if ((0x1E35A7BD * ((255 << 24) | (9 << 16) | (v << 8) | 7))
            & 0xFFFFFFFF) >> 31 != k1
    )  # second literal lands in the OTHER slot -> replay unambiguous
    cache_sym = _GREEN_BASE + k1
    bw.put_bits(0, 1)  # normal green code
    bw.put_bits(5 - 4, 4)
    for v in (0, 0, 1, 2, 2):  # 17,18,0,1,2
        bw.put_bits(v, 3)
    clc = {0: (0, 1), 1: (2, 2), 2: (3, 2)}
    bw.put_bits(0, 1)
    lens = {5: 1, g2: 2, cache_sym: 2}  # complete: 1/2 + 1/4 + 1/4
    for i in range(_GREEN_BASE + 2):
        c, ln = clc[lens.get(i, 0)]
        bw.put_code(c, ln)
    g = {5: (0, 1), g2: (2, 2), cache_sym: (3, 2)}
    r = _simple_code(bw, [9])
    b = _simple_code(bw, [7])
    a = _simple_code(bw, [255])
    _simple_code(bw, [0])  # unused distance tree

    for green in (5, g2):
        bw.put_code(*g[green])
        bw.put_code(*r[9])
        bw.put_code(*b[7])
        bw.put_code(*a[255])
    bw.put_code(*g[cache_sym])
    out = decode_vp8l(b"\x2f" + bw.getvalue())
    assert [list(p) for p in out[0]] == [
        [9, 5, 7, 255], [9, g2, 7, 255], [9, 5, 7, 255]
    ]


def _append_stream_bits(bw, w, h, channels, pixels):
    """Write pixels as an ENTROPY-CODED image stream (spec:
    [cache-info][codes][data] — no meta bit; transform-data
    sub-images use this form)."""
    from redmap_spark.multimodal.webp import _write_literal_stream

    bw.put_bits(0, 1)  # no color cache
    _write_literal_stream(bw, w, h, channels, pixels)


def _append_main_bits(bw, w, h, channels, pixels):
    """Write pixels as the MAIN spatially-coded image (spec:
    [cache-info][meta-prefix][codes][data])."""
    from redmap_spark.multimodal.webp import _write_literal_stream

    bw.put_bits(0, 1)  # no color cache
    bw.put_bits(0, 1)  # no meta prefix codes
    _write_literal_stream(bw, w, h, channels, pixels)


def test_decoder_subtract_green_transform():
    px = _rgba(6, 5, seed=3)
    fwd = px.copy()
    fwd[:, :, 0] = (fwd[:, :, 0].astype(int) - fwd[:, :, 1]) % 256  # r -= g
    fwd[:, :, 2] = (fwd[:, :, 2].astype(int) - fwd[:, :, 1]) % 256  # b -= g
    bw = _BitWriter()
    _header(bw, 6, 5)
    bw.put_bits(1, 1)  # a transform follows
    bw.put_bits(2, 2)  # subtract green
    bw.put_bits(0, 1)  # no more transforms
    _append_main_bits(bw, 6, 5, 4, fwd.tobytes())
    out = decode_vp8l(b"\x2f" + bw.getvalue())
    assert np.array_equal(out, px)


def test_decoder_predictor_transform_mode_top():
    """One predictor tile, mode 2 (= top): residuals are vertical
    deltas; decode must rebuild the original image. Header row/column use the
    spec's implicit L/T/black edge rules."""
    px = _rgba(7, 6, seed=11)
    res = px.astype(int).copy()
    # forward: (0,0) -= black(a=255); row0 -= left; col0/body per rule
    res[0, 1:] = (px[0, 1:].astype(int) - px[0, :-1]) % 256
    res[1:, 0] = (px[1:, 0].astype(int) - px[:-1, 0]) % 256
    res[1:, 1:] = (px[1:, 1:].astype(int) - px[:-1, 1:]) % 256  # mode 2
    res[0, 0, 3] = (int(px[0, 0, 3]) - 255) % 256  # alpha of black pred
    res = res.astype(np.uint8)
    bw = _BitWriter()
    _header(bw, 7, 6)
    bw.put_bits(1, 1)
    bw.put_bits(0, 2)   # predictor transform
    bw.put_bits(2, 3)   # size_bits = 4 -> 16x16 tiles -> 1 tile here
    tile = np.zeros((1, 1, 4), dtype=np.uint8)
    tile[0, 0, 1] = 2   # green byte = mode 2
    _append_stream_bits(bw, 1, 1, 4, tile.tobytes())
    bw.put_bits(0, 1)   # no more transforms
    _append_main_bits(bw, 7, 6, 4, res.tobytes())
    out = decode_vp8l(b"\x2f" + bw.getvalue())
    assert np.array_equal(out, px)


def test_decoder_color_indexing_packed():
    """4-color palette -> 2-bit packed indices (4 per byte)."""
    pal = np.array(
        [[10, 20, 30, 255], [40, 50, 60, 255],
         [70, 80, 90, 255], [200, 210, 220, 255]],
        dtype=np.uint8,
    )
    w, h = 10, 3
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 4, size=(h, w))
    px = pal[idx]
    # palette image: delta-coded per channel, as a psize x 1 stream
    deltas = pal.astype(int).copy()
    deltas[1:] = (pal[1:].astype(int) - pal[:-1]) % 256
    deltas = deltas.astype(np.uint8)
    # packed index image: 2-bit indices, little-endian within the
    # green byte, width ceil(10/4) = 3
    packed_w = 3
    packed = np.zeros((h, packed_w, 4), dtype=np.uint8)
    packed[:, :, 3] = 255
    for y in range(h):
        for x in range(w):
            packed[y, x // 4, 1] |= idx[y, x] << ((x % 4) * 2)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.put_bits(1, 1)
    bw.put_bits(3, 2)        # color indexing
    bw.put_bits(4 - 1, 8)    # palette size 4
    _append_stream_bits(bw, 4, 1, 4, deltas.tobytes())
    bw.put_bits(0, 1)        # no more transforms
    _append_main_bits(bw, packed_w, h, 4, packed.tobytes())
    out = decode_vp8l(b"\x2f" + bw.getvalue())
    assert np.array_equal(out, px)


def test_decoder_color_transform():
    """One color-transform tile with fixed cross-channel factors."""
    def s8(v):
        return v - 256 if v >= 128 else v

    def delta(t, c):
        return (s8(t) * s8(c)) >> 5

    g2r, g2b, r2b = 17, 250, 5
    px = _rgba(4, 4, seed=9)
    fwd = px.astype(int).copy()
    for y in range(4):
        for x in range(4):
            rr, gg, bb = int(px[y, x, 0]), int(px[y, x, 1]), int(px[y, x, 2])
            nr = (rr - delta(g2r, gg)) % 256
            # the decoder restores red first and feeds the RESTORED
            # red (= original rr) into the blue delta
            nb = (bb - delta(g2b, gg) - delta(r2b, rr)) % 256
            fwd[y, x, 0] = nr
            fwd[y, x, 2] = nb
    fwd = fwd.astype(np.uint8)
    tile = np.zeros((1, 1, 4), dtype=np.uint8)
    tile[0, 0, 0] = r2b   # red byte
    tile[0, 0, 1] = g2b   # green byte
    tile[0, 0, 2] = g2r   # blue byte
    bw = _BitWriter()
    _header(bw, 4, 4)
    bw.put_bits(1, 1)
    bw.put_bits(1, 2)    # color transform
    bw.put_bits(2, 3)    # size_bits 4 -> one tile
    _append_stream_bits(bw, 1, 1, 4, tile.tobytes())
    bw.put_bits(0, 1)
    _append_main_bits(bw, 4, 4, 4, fwd.tobytes())
    out = decode_vp8l(b"\x2f" + bw.getvalue())
    assert np.array_equal(out, px)


def test_dispatch_integration():
    """decode_pixel_array must now decode VP8L payloads for real (the
    phash/palette consumers get true pixels, not the fallback)."""
    from redmap_spark.multimodal.decode import decode_pixel_array

    px = _rgba(16, 8)
    a = decode_pixel_array(encode_vp8l(16, 8, 4, px.tobytes()))
    assert a is not None and a.shape == (8, 16, 4)
    assert np.array_equal(a, px)
    # corrupt VP8L payload -> None (batch-survival contract)
    bad = bytearray(encode_vp8l(4, 4, 3, bytes(48)))
    bad[25:] = b"\xff" * (len(bad) - 25)
    assert decode_pixel_array(bytes(bad)) is None


def test_spark_resize_images_real_webp(spark):
    """resize_images must REALLY resize lossless-WebP payloads: the
    output is a valid target-sized VP8L whose pixels equal the
    nearest-neighbor downsample of the source (the PNG/JPEG resize
    contract, extended by the r10 codec)."""
    from redmap_spark.multimodal.columns import resize_images

    px = _rgba(40, 24, seed=21)
    payload = encode_vp8l(40, 24, 4, px.tobytes())
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    row = resize_images(df, target_w=8, target_h=8).collect()[0]
    assert (row.width, row.height) == (40, 24)
    got = decode_webp(bytes(row.payload))
    ys = (np.arange(8) * 24) // 8
    xs = (np.arange(8) * 40) // 8
    assert np.array_equal(got, px[np.ix_(ys, xs)])


# ------------------------------------------------- animated (r11)


def test_webp_anim_roundtrip():
    """encode_webp_anim -> split/decode: frame metadata and pixels
    survive, and the container header advertises animation with the
    right canvas dims + ANMF count (columns.py header parser)."""
    from redmap_spark.multimodal.webp import (
        decode_webp_anim,
        encode_webp_anim,
        webp_anim_stills,
    )

    f0 = _rgba(20, 12, seed=31)
    f1 = _rgba(8, 6, seed=32)
    f2 = _rgba(20, 12, seed=33)
    payload = encode_webp_anim(
        [(0, 0, 100, f0), (4, 2, 50, f1), (0, 0, 250, f2)], 20, 12
    )

    from redmap_spark.multimodal.columns import parse_image_header

    assert parse_image_header(payload) == (20, 12, 3)

    frames = decode_webp_anim(payload)
    assert len(frames) == 3
    metas = [m for m, _ in frames]
    assert [(m["x"], m["y"]) for m in metas] == [(0, 0), (4, 2), (0, 0)]
    assert [m["duration_ms"] for m in metas] == [100, 50, 250]
    assert [(m["w"], m["h"]) for m in metas] == [(20, 12), (8, 6), (20, 12)]
    for want, (_, got) in zip((f0, f1, f2), frames):
        assert np.array_equal(got, want)

    # stills are standalone lossless WebPs decoding to the same pixels
    stills = webp_anim_stills(payload)
    assert len(stills) == 3
    for want, still in zip((f0, f1, f2), stills):
        assert still[:4] == b"RIFF" and still[12:16] == b"VP8L"
        assert np.array_equal(decode_webp(still), want)

    # decode_webp on the animated container = first frame
    assert np.array_equal(decode_webp(payload), f0)


def test_webp_anim_rejects_non_animated_and_odd_offsets():
    from redmap_spark.multimodal.webp import encode_webp_anim, split_webp_anim

    still = encode_vp8l(4, 4, 4, _rgba(4, 4).tobytes())
    with pytest.raises(ValueError):
        split_webp_anim(still)  # no VP8X/ANIM
    with pytest.raises(ValueError, match="even"):
        encode_webp_anim([(1, 0, 10, _rgba(4, 4))], 8, 8)


def test_spark_sample_frames_animated_webp(spark):
    """sample_frames must emit every_n-th ANMF frame as a standalone
    VP8L still, executor-side (the GIF splitter contract, extended)."""
    from redmap_spark.multimodal.columns import sample_frames
    from redmap_spark.multimodal.webp import encode_webp_anim

    fr = [_rgba(10, 8, seed=40 + i) for i in range(5)]
    payload = encode_webp_anim(
        [(0, 0, 40, f) for f in fr], 10, 8
    )
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, payload binary"
    )
    rows = sorted(
        sample_frames(df, every_n=2).collect(), key=lambda r: r.frame_idx
    )
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    for r, want in zip(rows, (fr[0], fr[2], fr[4])):
        got = decode_webp(bytes(r.frame_payload))
        assert np.array_equal(got, want)
