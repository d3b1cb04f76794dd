"""Shared pixel-decode dispatch for binary payloads.

ONE magic-byte dispatcher over the repo's clean-room codecs
(png.py / jpeg.py / gif.py) so every pixel consumer (phash, palette,
future feature extractors) resolves payloads identically and a codec
fix lands everywhere at once. Returns the raw decoded channel array —
(h, w, ch) for PNG, (h, w[, 3]) for JPEG, (h, w, 3) for GIF — or
``None`` for non-media/corrupt payloads: a corrupt byte in one
payload must never fail a whole Arrow batch, so callers supply their
own deterministic fallback (the §2.F contract).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# The failure modes a corrupt/truncated payload can legitimately hit in
# the repo codecs: explicit ValueError (incl. UnsupportedPng subclass),
# struct.error on short header reads, zlib.error on bad IDAT deflate,
# IndexError on truncated marker/block walks. Anything else (TypeError,
# AttributeError, ...) is a codec BUG and must surface, not silently
# degrade to the caller's fallback.
_DECODE_ERRORS = (ValueError, struct.error, zlib.error, IndexError)


def decode_pixel_array(payload: bytes) -> np.ndarray | None:
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            from redmap_spark.multimodal.png import decode_png

            w, h, ch, raw = decode_png(payload)
            return np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w, ch)
        if payload[:2] == b"\xff\xd8":
            from redmap_spark.multimodal.jpeg import decode_jpeg

            return decode_jpeg(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            from redmap_spark.multimodal.gif import decode_gif_indexed

            idx, pal = decode_gif_indexed(payload)
            return pal[idx]
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            from redmap_spark.multimodal.webp import decode_webp

            # UnsupportedWebp (lossy VP8) is a ValueError: falls to
            # the caller's deterministic fallback like corrupt media
            return decode_webp(payload)
    except _DECODE_ERRORS:
        return None
    return None
