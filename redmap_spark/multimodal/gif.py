"""GIF pixel codec — pure stdlib + numpy (public spec: GIF89a, 1990).

Decoder: first-frame pixels of a non-interlaced GIF — LZW
variable-width decompression (LSB-first bit packing, CLEAR/EOI,
KwKwK case, 12-bit cap) + palette lookup → HxWx3 uint8 RGB.
Interlaced frames raise ValueError (seam fallback).

Encoder (tests): writes a valid single-frame GIF using the classic
"uncompressed GIF" trick — every index emitted as its own literal
code with periodic CLEARs so the code width never has to grow.
Any conforming decoder (including this one) reads it back exactly.
"""

from __future__ import annotations

import struct

import numpy as np


class _LSBBitReader:
    """GIF packs LZW codes least-significant-bit first."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("gif: LZW stream exhausted")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    reader = _LSBBitReader(data)
    out: list[int] = []
    dictionary: list[list[int]] = []
    code_size = 0
    prev: list[int] | None = None

    def reset() -> None:
        nonlocal dictionary, code_size, prev
        dictionary = [[i] for i in range(clear)] + [[], []]
        code_size = min_code_size + 1
        prev = None

    reset()
    while len(out) < n_pixels:
        code = reader.read(code_size)
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if code < len(dictionary) and dictionary[code]:
            entry = dictionary[code]
        elif code == len(dictionary) and prev is not None:
            entry = prev + [prev[0]]  # KwKwK
        elif code < clear:
            entry = [code]
        else:
            raise ValueError("gif: invalid LZW code")
        out.extend(entry)
        if prev is not None and len(dictionary) < 4096:
            dictionary.append(prev + [entry[0]])
            if len(dictionary) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out[:n_pixels]


def decode_gif_indexed(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """(HxW index array, Nx3 palette) of the FIRST frame — the
    palette-preserving form the resize path re-encodes from."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a gif")
    sw, sh = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    i = 13
    gpal = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        gpal = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(-1, 3)
        i += 3 * n
    while i < len(payload):
        b = payload[i]
        if b == 0x3B:
            break
        if b == 0x21:  # extension
            i += 2
            while payload[i] != 0:
                i += 1 + payload[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            _x, _y, w, h = struct.unpack("<HHHH", payload[i + 1 : i + 9])
            lpacked = payload[i + 9]
            i += 10
            if lpacked & 0x40:
                raise ValueError("gif: interlaced frames unsupported")
            pal = gpal
            if lpacked & 0x80:
                n = 2 ** ((lpacked & 0x07) + 1)
                pal = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(-1, 3)
                i += 3 * n
            if pal is None:
                raise ValueError("gif: no palette")
            min_code = payload[i]
            i += 1
            chunks = []
            while payload[i] != 0:
                ln = payload[i]
                chunks.append(payload[i + 1 : i + 1 + ln])
                i += 1 + ln
            indices = _lzw_decode(b"".join(chunks), min_code, w * h)
            idx = np.array(indices, dtype=np.int32).reshape(h, w)
            return np.clip(idx, 0, len(pal) - 1), pal
        else:
            raise ValueError("gif: desynced block stream")
    raise ValueError("gif: no image descriptor")


def decode_gif(payload: bytes) -> np.ndarray:
    """HxWx3 uint8 RGB pixels of the FIRST frame."""
    idx, pal = decode_gif_indexed(payload)
    return pal[idx]


class _LSBBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Single-frame GIF from an HxW index array + Nx3 palette
    (N a power of two, >= 4). 'Uncompressed' LZW: literal codes with
    a CLEAR before the dictionary would force a width change."""
    h, w = indices.shape
    n = len(palette)
    bits = max(2, (n - 1).bit_length())
    if 2**bits != n:
        raise ValueError("palette size must be a power of two")
    out = bytearray(b"GIF89a")
    out.extend(struct.pack("<HH", w, h))
    out.append(0x80 | (bits - 1))  # global palette flag + size
    out.extend(b"\x00\x00")
    out.extend(bytes(int(x) for x in palette.flatten()))
    out.append(0x2C)
    out.extend(struct.pack("<HHHH", 0, 0, w, h))
    out.append(0x00)  # no local palette, not interlaced
    min_code = max(2, bits)
    clear = 1 << min_code
    out.append(min_code)
    writer = _LSBBitWriter()
    writer.write(clear, min_code + 1)
    budget = clear - 2  # literals before next_code hits 2^(min_code+1)
    for v in indices.flatten():
        if budget == 0:
            writer.write(clear, min_code + 1)
            budget = clear - 2
        writer.write(int(v), min_code + 1)
        budget -= 1
    writer.write(clear + 1, min_code + 1)  # EOI
    data = writer.flush()
    for j in range(0, len(data), 255):
        chunk = data[j : j + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0x00)
    out.append(0x3B)
    return bytes(out)


def decode_gif_frames(payload: bytes) -> list[tuple[np.ndarray, np.ndarray]]:
    """[(HxW indices, palette), ...] for EVERY frame of an animated
    GIF. Supports full-logical-screen frames (our encoder's shape and
    the common screencap case); partial-region frames would need
    disposal-method compositing and raise ValueError instead."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a gif")
    sw, sh = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    i = 13
    gpal = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        gpal = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(-1, 3)
        i += 3 * n
    frames: list[tuple[np.ndarray, np.ndarray]] = []
    while i < len(payload):
        b = payload[i]
        if b == 0x3B:
            break
        if b == 0x21:
            i += 2
            while payload[i] != 0:
                i += 1 + payload[i]
            i += 1
        elif b == 0x2C:
            x, y, w, h = struct.unpack("<HHHH", payload[i + 1 : i + 9])
            lpacked = payload[i + 9]
            i += 10
            if lpacked & 0x40:
                raise ValueError("gif: interlaced frames unsupported")
            if (x, y, w, h) != (0, 0, sw, sh):
                raise ValueError("gif: partial-region frames unsupported")
            pal = gpal
            if lpacked & 0x80:
                n = 2 ** ((lpacked & 0x07) + 1)
                pal = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(-1, 3)
                i += 3 * n
            if pal is None:
                raise ValueError("gif: no palette")
            min_code = payload[i]
            i += 1
            chunks = []
            while payload[i] != 0:
                ln = payload[i]
                chunks.append(payload[i + 1 : i + 1 + ln])
                i += 1 + ln
            i += 1  # frame's block terminator
            idx = np.array(
                _lzw_decode(b"".join(chunks), min_code, w * h), dtype=np.int32
            ).reshape(h, w)
            frames.append((np.clip(idx, 0, len(pal) - 1), pal))
        else:
            raise ValueError("gif: desynced block stream")
    if not frames:
        raise ValueError("gif: no image descriptor")
    return frames


def encode_gif_animated(frames: list[np.ndarray], palette: np.ndarray) -> bytes:
    """Multi-frame GIF (all frames full-size, shared global palette):
    the single-frame writer's body repeated per frame."""
    if not frames:
        raise ValueError("no frames")
    single = [encode_gif(f, palette) for f in frames]
    head_end = len(single[0]) - 1  # strip trailer 0x3B
    # header + palette of the first, then every frame's descriptor body
    first = bytearray(single[0][:head_end])
    desc_off = 13 + 3 * len(palette)  # fixed: header+LSD+global palette
    for s in single[1:]:
        first.extend(s[desc_off:-1])
    first.append(0x3B)
    return bytes(first)


def decode_gif_composited(payload: bytes) -> list[np.ndarray]:
    """RGB frames of an animated GIF with PARTIAL-REGION frames
    composited onto the logical screen — disposal method 0/1 (leave
    in place) and 2 (restore background), plus GCE transparency
    (transparent pixels leave the canvas unchanged). Disposal 3
    (restore previous) raises — rare and needs a frame stack."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a gif")
    sw, sh = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    bg_index = payload[11]
    i = 13
    gpal = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        gpal = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(-1, 3)
        i += 3 * n
    bg_rgb = gpal[min(bg_index, len(gpal) - 1)] if gpal is not None else np.zeros(3, np.uint8)
    canvas = np.tile(bg_rgb, (sh, sw, 1)).astype(np.uint8)
    frames: list[np.ndarray] = []
    disposal, transparent = 0, None
    while i < len(payload):
        b = payload[i]
        if b == 0x3B:
            break
        if b == 0x21:
            label = payload[i + 1]
            j = i + 2
            if label == 0xF9 and payload[j] >= 4:  # graphic control
                flags = payload[j + 1]
                disposal = (flags >> 2) & 0x7
                transparent = payload[j + 4] if flags & 1 else None
            while payload[j] != 0:
                j += 1 + payload[j]
            i = j + 1
        elif b == 0x2C:
            x, y, w, h = struct.unpack("<HHHH", payload[i + 1 : i + 9])
            lpacked = payload[i + 9]
            i += 10
            if lpacked & 0x40:
                raise ValueError("gif: interlaced frames unsupported")
            if disposal == 3:
                raise ValueError("gif: disposal=restore-previous unsupported")
            pal = gpal
            if lpacked & 0x80:
                n = 2 ** ((lpacked & 0x07) + 1)
                pal = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(-1, 3)
                i += 3 * n
            if pal is None:
                raise ValueError("gif: no palette")
            min_code = payload[i]
            i += 1
            chunks = []
            while payload[i] != 0:
                ln = payload[i]
                chunks.append(payload[i + 1 : i + 1 + ln])
                i += 1 + ln
            i += 1
            idx = np.array(
                _lzw_decode(b"".join(chunks), min_code, w * h), dtype=np.int32
            ).reshape(h, w)
            region = pal[np.clip(idx, 0, len(pal) - 1)]
            target = canvas[y : y + h, x : x + w]
            if transparent is not None:
                mask = idx != transparent
                target[mask] = region[mask]
            else:
                target[:, :] = region
            frames.append(canvas.copy())
            if disposal == 2:  # restore background inside the region
                canvas[y : y + h, x : x + w] = bg_rgb
            disposal, transparent = 0, None
        else:
            raise ValueError("gif: desynced block stream")
    if not frames:
        raise ValueError("gif: no image descriptor")
    return frames


def encode_gif_partial(
    base: np.ndarray,
    patches: list[tuple[np.ndarray, int, int]],
    palette: np.ndarray,
) -> bytes:
    """Animated GIF with a full-size first frame and PARTIAL-REGION
    follow-up frames (test writer for the compositing decoder):
    ``patches`` are (indices, x, y) regions, disposal=leave."""
    full = encode_gif(base, palette)
    out = bytearray(full[:-1])  # strip trailer
    for idx, x, y in patches:
        h, w = idx.shape
        # GCE: disposal=1 (leave), no transparency
        out.extend(bytes([0x21, 0xF9, 0x04, 0x04, 0x00, 0x00, 0x00, 0x00]))
        frame = bytearray(encode_gif(idx, palette))
        desc_off = 13 + 3 * len(palette)
        body = bytearray(frame[desc_off:-1])
        # patch the descriptor's (x, y)
        body[1:5] = struct.pack("<HH", x, y)
        out.extend(body)
    out.append(0x3B)
    return bytes(out)
