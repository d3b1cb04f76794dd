"""Multimodal column plumbing (SURVEY §2.F).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct alongside. The Spark-side plumbing — schema, Arrow batch shape,
partition-parallel decode via ``mapInPandas`` — is real and tested.
``decode_image`` reads REAL dimensions from PNG / JPEG / GIF payloads
by pure-stdlib magic-byte header parsing (no PIL needed), and PNG
payloads get REAL pixel decode / nearest-neighbor resize / re-encode
via the stdlib codec in ``multimodal/png.py``. Only JPEG/GIF pixel
decode (and the deterministic fake used for synthetic non-media
payloads) remains behind the decoder seam, so swapping in PIL/ffmpeg
changes one function, not the plan.

At 100 TB: payloads stay in executor memory one Arrow batch at a
time (``mapInPandas`` is a streaming iterator — no per-partition
materialization), and feature extraction parallelizes per input
split with zero shuffle.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redmap_spark.multimodal.decode import _DECODE_ERRORS
from redmap_spark.multimodal.mp4 import parse_mp4

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, head_md5 string, width int, height int, n_frames int"
)

# Repo codecs give REAL pixel decode for PNG / baseline JPEG / GIF /
# lossless WebP (VP8L, r10) via multimodal/decode.py; this flag gates
# only the residual formats (lossy VP8, H.264) where a pure-python
# decoder is out of scope — flip when PIL/ffmpeg exist.
REAL_DECODERS_AVAILABLE = False

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers carry dimensions; C4/C8/CC are not SOFs
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _gif_frame_count(payload: bytes) -> int:
    """REAL animated-GIF frame count by walking the block structure
    (no LZW decode needed — frames are delimited by 0x2C image
    descriptors; LZW data rides in length-prefixed sub-blocks that
    skip in O(#blocks)). Falls back to 1 on any truncation/desync."""
    try:
        i = 10
        packed = payload[i]
        i += 3  # packed fields + bg color index + aspect ratio
        if packed & 0x80:  # global color table present
            i += 3 * (2 ** ((packed & 0x07) + 1))
        frames = 0
        while i < len(payload):
            b = payload[i]
            if b == 0x3B:  # trailer
                break
            if b == 0x21:  # extension: label byte then sub-blocks
                i += 2
                while i < len(payload) and payload[i] != 0:
                    i += 1 + payload[i]
                i += 1  # block terminator
            elif b == 0x2C:  # image descriptor == one frame
                frames += 1
                lpacked = payload[i + 9]
                i += 10
                if lpacked & 0x80:  # local color table
                    i += 3 * (2 ** ((lpacked & 0x07) + 1))
                i += 1  # LZW minimum code size
                while i < len(payload) and payload[i] != 0:
                    i += 1 + payload[i]
                i += 1
            else:  # desync
                break
        return max(1, frames)
    except IndexError:
        return 1


def _webp_anmf_count(payload: bytes) -> int:
    """Animated-WebP frame count by walking the RIFF chunk list
    (ANMF chunks are top-level, so no bitstream decode is needed;
    chunk payloads pad to even length per RIFF)."""
    i, frames = 12, 0
    while i + 8 <= len(payload):
        fourcc = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        if fourcc == b"ANMF":
            frames += 1
        i += 8 + size + (size & 1)
    return max(1, frames)


def parse_image_header(payload: bytes) -> tuple[int, int, int] | None:
    """Pure-stdlib (width, height, n_frames) from real image bytes:

    - PNG: IHDR chunk — big-endian u32 width/height at offsets 16/20.
    - GIF: logical screen descriptor — little-endian u16 at 6/8.
    - JPEG: walk marker segments to the first SOFn; its body is
      precision(1) height(2) width(2), big-endian.
    - WebP (RIFF/'WEBP'): VP8 lossy (sync-coded u14 dims), VP8L
      lossless (14-bit packed dims after the 0x2F signature) and
      VP8X extended (24-bit LE canvas dims; ANMF chunk-walk frame
      count when the animation flag is set).

    Returns None for unrecognized payloads (caller decides fallback).
    n_frames is 1 — stills; animated-GIF frame counts need full LZW
    block walking, which is the pixel decoder's job."""
    if payload[:8] == _PNG_MAGIC and len(payload) >= 24 and payload[12:16] == b"IHDR":
        width, height = struct.unpack(">II", payload[16:24])
        return width, height, 1
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        width, height = struct.unpack("<HH", payload[6:10])
        return width, height, _gif_frame_count(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP" and len(payload) >= 25:
        fourcc = payload[12:16]
        if (
            fourcc == b"VP8 "
            and len(payload) >= 30
            and payload[23:26] == b"\x9d\x01\x2a"
        ):
            width = struct.unpack("<H", payload[26:28])[0] & 0x3FFF
            height = struct.unpack("<H", payload[28:30])[0] & 0x3FFF
            return width, height, 1
        if fourcc == b"VP8L" and payload[20] == 0x2F:
            b = payload[21:25]
            width = 1 + (((b[1] & 0x3F) << 8) | b[0])
            height = 1 + (((b[3] & 0x0F) << 10) | (b[2] << 2) | ((b[1] & 0xC0) >> 6))
            return width, height, 1
        if fourcc == b"VP8X" and len(payload) >= 30:
            width = 1 + int.from_bytes(payload[24:27], "little")
            height = 1 + int.from_bytes(payload[27:30], "little")
            n_frames = (
                _webp_anmf_count(payload) if payload[20] & 0x02 else 1
            )
            return width, height, n_frames
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                return None  # desynced — not a well-formed JPEG stream
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                i += 2  # standalone marker, no length field
                continue
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF_MARKERS:
                if i + 9 > len(payload):
                    return None
                height, width = struct.unpack(">HH", payload[i + 5 : i + 9])
                return width, height, 1
            i += 2 + seg_len
    return None


def decode_image(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) for a binary payload. Real PNG/JPEG/GIF
    headers are parsed for true dimensions, and ISO-BMFF (MP4/MOV)
    payloads go through the pure-stdlib box walk (tkhd display size,
    stts sample count as n_frames); anything else (the synthetic
    utf-8 payloads in testdata) gets a deterministic fake so plumbing
    tests stay reproducible. Full pixel decode sits behind
    REAL_DECODERS_AVAILABLE (PIL/ffmpeg not in this container)."""
    parsed = parse_image_header(payload)
    if parsed is not None:
        return parsed
    mp4 = parse_mp4(payload)
    # BMFF payloads with no moov / no video track parse with width 0;
    # fall through to the deterministic fake there so every path
    # guarantees nonzero dimensions (downstream feature stats divide
    # by and bucket on them).
    if mp4 is not None and mp4["width"] > 0 and mp4["height"] > 0:
        return mp4["width"], mp4["height"], max(1, mp4["n_samples"])
    if REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire a real pixel decoder here")
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192          # 64..255
    height = 64 + h[1] % 192
    n_frames = 1 + h[2] % 4
    return width, height, n_frames


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic binary payload column (the testdata
    has no real media; payload = utf-8 bytes of the text) plus the
    typed metadata struct every multimodal row carries."""
    with_payload = df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        F.length(F.col("payload")).alias("n_bytes"),
    )
    return with_payload.withColumn("meta", meta)


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Partition-parallel feature extraction over binary payloads.

    Arrow-batched ``mapInPandas``: each executor receives an iterator
    of pandas batches, decodes payloads batch-by-batch, emits a typed
    feature frame. No shuffle; no driver involvement."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(payload)
                w, h, nf = decode_image(raw)
                feats.append(
                    (
                        int(doc_id),
                        len(raw),
                        hashlib.md5(raw[:16]).hexdigest(),
                        w,
                        h,
                        nf,
                    )
                )
            yield pd.DataFrame(
                feats,
                columns=["doc_id", "n_bytes", "head_md5", "width", "height", "n_frames"],
            )

    return df.select(id_col, "payload").mapInPandas(extract, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, payload binary, width int, height int, target_w int, target_h int"
)


def resize_images(df: DataFrame, target_w: int = 32, target_h: int = 32, id_col: str = "doc_id") -> DataFrame:
    """Resize: payload in → (smaller) payload out, batch by Arrow
    batch. REAL for PNG (stdlib codec, multimodal/png.py), baseline
    JPEG (numpy DCT codec, multimodal/jpeg.py — decode →
    nearest-neighbor resample → re-encode, a valid thumbnail JPEG
    out when the target dims are multiples of 8), GIF
    (palette-preserving) AND lossless WebP (VP8L codec,
    multimodal/webp.py, r10 — lossless in, lossless out). Remaining
    unsupported payloads (progressive JPEG, lossy VP8, the synthetic
    corpus) fall back to deterministic byte-decimation to
    (target_w*target_h) bytes so plumbing tests stay reproducible.
    The Spark contract — binary in/out, no shuffle, bounded executor
    memory — is unchanged."""
    from redmap_spark.multimodal.png import resize_png

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from redmap_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

        def resize_jpeg(raw: bytes) -> bytes:
            if raw[:2] != b"\xff\xd8" or target_w % 8 or target_h % 8:
                raise ValueError("not a resizable-jpeg case")
            px = decode_jpeg(raw)
            ys = (np.arange(target_h) * px.shape[0]) // target_h
            xs = (np.arange(target_w) * px.shape[1]) // target_w
            return encode_jpeg(px[np.ix_(ys, xs)])

        def resize_gif(raw: bytes) -> bytes:
            from redmap_spark.multimodal.gif import decode_gif_indexed, encode_gif

            idx, pal = decode_gif_indexed(raw)  # palette-preserving
            ys = (np.arange(target_h) * idx.shape[0]) // target_h
            xs = (np.arange(target_w) * idx.shape[1]) // target_w
            return encode_gif(idx[np.ix_(ys, xs)], pal)

        def resize_webp(raw: bytes) -> bytes:
            # lossless in, lossless out (multimodal/webp.py, r10);
            # lossy VP8 raises UnsupportedWebp (a ValueError) and
            # falls through to the decimation stub like before
            from redmap_spark.multimodal.webp import decode_webp, encode_vp8l

            if raw[:4] != b"RIFF" or raw[8:12] != b"WEBP":
                raise ValueError("not webp")
            px = decode_webp(raw)
            ys = (np.arange(target_h) * px.shape[0]) // target_h
            xs = (np.arange(target_w) * px.shape[1]) // target_w
            out = px[np.ix_(ys, xs)]
            return encode_vp8l(target_w, target_h, 4, out.tobytes())

        n_out = target_w * target_h
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(payload)
                w, h, _ = decode_image(raw)
                small = None
                for codec in (
                    lambda b: resize_png(b, target_w, target_h),
                    resize_jpeg,
                    resize_gif,
                    resize_webp,
                ):
                    try:
                        small = codec(raw)
                        break
                    except _DECODE_ERRORS:
                        continue
                if small is None:  # unsupported codec: stub path
                    step = max(1, len(raw) // n_out)
                    small = raw[::step][:n_out]
                rows.append((int(doc_id), small, w, h, target_w, target_h))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "payload", "width", "height", "target_w", "target_h"],
            )

    return df.select(id_col, "payload").mapInPandas(resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_payload binary, frame_md5 string"


def sample_frames(df: DataFrame, every_n: int = 2, id_col: str = "doc_id") -> DataFrame:
    """Frame sampling: 1 video row → N frame rows (the mapInPandas
    row-expansion pattern — output batches need not align with input
    rows). REAL for animated GIFs: every ``every_n``-th frame is LZW-
    decoded and re-emitted as a valid single-frame GIF
    (multimodal/gif.py). REAL for MJPEG streams (concatenated JPEGs):
    a marker-walk splitter (multimodal/jpeg.py split_mjpeg) emits
    every ``every_n``-th complete JPEG frame verbatim. Genuinely
    unknown containers keep the deterministic chunk-cut stub (a video
    deployment slots ffmpeg keyframe extraction into the same seam).
    Row expansion happens
    executor-side with no shuffle and no driver round-trip, so a
    100 TB corpus fans out to frames at scan parallelism."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from redmap_spark.multimodal.gif import decode_gif_frames, encode_gif
        from redmap_spark.multimodal.jpeg import split_mjpeg
        from redmap_spark.multimodal.webp import webp_anim_stills

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(payload)
                try:
                    # animated WebP (r11): every ANMF frame's VP8L
                    # chunk re-wraps byte-lossless into a standalone
                    # still — no transcode, same per-frame contract
                    # as the GIF path below
                    webp_frames = webp_anim_stills(raw)
                    for i in range(0, len(webp_frames), every_n):
                        fp = webp_frames[i]
                        rows.append(
                            (int(doc_id), i, fp, hashlib.md5(fp).hexdigest())
                        )
                    continue
                except _DECODE_ERRORS:
                    pass
                try:
                    gif_frames = decode_gif_frames(raw)
                    for i in range(0, len(gif_frames), every_n):
                        idx, pal = gif_frames[i]
                        fp = encode_gif(idx, pal)
                        rows.append((int(doc_id), i, fp, hashlib.md5(fp).hexdigest()))
                    continue
                except _DECODE_ERRORS:
                    pass
                try:
                    jpeg_frames = split_mjpeg(raw)
                    for i in range(0, len(jpeg_frames), every_n):
                        fp = jpeg_frames[i]
                        rows.append(
                            (int(doc_id), i, fp, hashlib.md5(fp).hexdigest())
                        )
                    continue
                except _DECODE_ERRORS:
                    pass
                _, _, n_frames = decode_image(raw)
                chunk = max(1, len(raw) // n_frames)
                for i in range(0, n_frames, every_n):
                    fp = raw[i * chunk : (i + 1) * chunk]
                    rows.append(
                        (int(doc_id), i, fp, hashlib.md5(fp).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_payload", "frame_md5"]
            )

    return df.select(id_col, "payload").mapInPandas(frames, schema=FRAME_SCHEMA)
