"""Pure-stdlib PNG pixel codec (decode / nearest-neighbor resize /
encode) — the "real decoder" behind the multimodal seam for PNG
payloads, with zero imaging dependencies (zlib + struct only).

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced — i.e. what the vast
majority of real-world PNGs use. Anything else raises
``UnsupportedPng`` so callers can fall back (interlaced/16-bit are
rare in training corpora and a deployment with PIL swaps one
function).

Per-pixel work is plain Python over bytearrays: this runs inside
Arrow-batched ``mapInPandas`` workers, so corpus-level parallelism
comes from Spark partitioning — the per-image cost is the declared
slow path of multimodal decode (SURVEY §2.F), and at 100 TB these
workers scale out with executors exactly like any other decode UDF.
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class UnsupportedPng(ValueError):
    """Valid-looking PNG outside the supported subset."""


def _chunks(data: bytes):
    i = 8
    while i + 8 <= len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        yield tag, data[i + 8 : i + 8 + length]
        i += 12 + length  # length + tag + data + crc
        if tag == b"IEND":
            break


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytearray]:
    """(width, height, channels, pixels) with pixels row-major
    interleaved (palette expanded to RGB). Raises ``UnsupportedPng``
    for interlaced / 16-bit / exotic color types, ``ValueError`` for
    malformed data."""
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG")
    width = height = None
    color_type = None
    idat = bytearray()
    plte = b""
    for tag, body in _chunks(data):
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8:
                raise UnsupportedPng(f"bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise UnsupportedPng(f"color type {color_type}")
            if interlace:
                raise UnsupportedPng("interlaced")
        elif tag == b"PLTE":
            plte = body
        elif tag == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = bytearray(height * stride)
    prev_start = -1
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif f == 2:  # Up
            if prev_start >= 0:
                for x in range(stride):
                    line[x] = (line[x] + out[prev_start + x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                up = out[prev_start + x] if prev_start >= 0 else 0
                line[x] = (line[x] + ((left + up) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                up = out[prev_start + x] if prev_start >= 0 else 0
                ul = out[prev_start + x - ch] if (prev_start >= 0 and x >= ch) else 0
                line[x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad filter byte {f}")
        out[y * stride : (y + 1) * stride] = line
        prev_start = y * stride
    if color_type == 3:  # expand palette to RGB
        rgb = bytearray(height * width * 3)
        for i, idx in enumerate(out):
            rgb[3 * i : 3 * i + 3] = plte[3 * idx : 3 * idx + 3]
        return width, height, 3, rgb
    return width, height, ch, out


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Minimal valid PNG from interleaved 8-bit pixels (filter 0 rows,
    one zlib IDAT). channels: 1=gray, 2=gray+alpha, 3=RGB, 4=RGBA."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    raw = b"".join(
        b"\x00" + bytes(pixels[y * stride : (y + 1) * stride]) for y in range(height)
    )

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_nearest(
    width: int, height: int, channels: int, pixels: bytes, tw: int, th: int
) -> bytes:
    """Nearest-neighbor resample to (tw, th), same channel layout."""
    out = bytearray(tw * th * channels)
    for ty in range(th):
        sy = min(height - 1, ty * height // th)
        for tx in range(tw):
            sx = min(width - 1, tx * width // tw)
            s = (sy * width + sx) * channels
            d = (ty * tw + tx) * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)


def resize_png(data: bytes, tw: int, th: int) -> bytes:
    """Decode → nearest-neighbor resize → re-encode. Raises
    UnsupportedPng/ValueError for non-(supported-)PNG input."""
    w, h, ch, px = decode_png(data)
    return encode_png(tw, th, ch, resize_nearest(w, h, ch, px, tw, th))
