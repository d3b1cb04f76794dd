"""Clean-room VP8L (lossless WebP) codec — pure stdlib + numpy.

Implements the public VP8L bitstream specification (RFC 9649 /
Google's "WebP Lossless Bitstream Specification"); no reference code
was consulted beyond the spec text. Closes the largest remaining
real-corpus pixel fallback behind multimodal/decode.py's dispatch
(PNG / baseline JPEG / GIF were already fully decoded; WebP stopped
at header dims).

Decoder covers the full still-image feature set:

- simple (1-2 symbol) and normal canonical prefix codes, including
  the code-length code with 16/17/18 repeats and the optional
  max-symbol ("use length") trick;
- meta prefix images (per-tile prefix-code groups);
- the color cache (up to 11 bits);
- LZ77 backward references with the 120-entry 2D distance map;
- all four transforms, inverse-applied in reverse read order:
  predictor (all 14 modes), color (ColorTransformDelta), subtract
  green, and color indexing with sub-byte packing (1/2/4-bit
  indices).

Encoder emits a minimal legal stream — no transforms, no color
cache, no LZ77, one prefix group, complete canonical codes — enough
for round-trip tests and for re-emitting resized stills. VP8 (lossy)
payloads remain header-parse only: a pure-python VP8 decoder is out
of scope (documented fallback in multimodal/columns.py).
"""

from __future__ import annotations

import heapq
import struct

import numpy as np


class UnsupportedWebp(ValueError):
    """Recognized WebP container but an unsupported flavor (lossy
    VP8, extended VP8X without a VP8L chunk)."""


# ---------------------------------------------------------------- bits

class _BitReader:
    """LSB-first bit reader (spec §4: values little-endian bit order;
    prefix-code bits are consumed one at a time by the caller)."""

    def __init__(self, data: bytes):
        self._d = data
        self._pos = 0

    def bit(self) -> int:
        p = self._pos
        if (p >> 3) >= len(self._d):
            raise ValueError("truncated VP8L stream")
        self._pos = p + 1
        return (self._d[p >> 3] >> (p & 7)) & 1

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


class _BitWriter:
    def __init__(self):
        self._bytes = bytearray()
        self._bitpos = 0

    def put_bits(self, value: int, n: int) -> None:
        for i in range(n):
            if self._bitpos == 0:
                self._bytes.append(0)
            if (value >> i) & 1:
                self._bytes[-1] |= 1 << self._bitpos
            self._bitpos = (self._bitpos + 1) & 7

    def put_code(self, code: int, length: int) -> None:
        """Prefix-code bits are written MSB of the code first."""
        for i in range(length - 1, -1, -1):
            self.put_bits((code >> i) & 1, 1)

    def getvalue(self) -> bytes:
        return bytes(self._bytes)


# ------------------------------------------------------- prefix codes

# Order in which code-length-code lengths are stored (spec §5.2.1).
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_MAX_CODE_LEN = 15


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (DEFLATE-style:
    shorter codes first, ties by symbol index)."""
    counts = [0] * (_MAX_CODE_LEN + 1)
    for ln in lengths:
        if ln:
            counts[ln] += 1
    code = 0
    next_code = [0] * (_MAX_CODE_LEN + 2)
    for ln in range(1, _MAX_CODE_LEN + 1):
        code = (code + counts[ln - 1]) << 1
        next_code[ln] = code
    out: dict[int, tuple[int, int]] = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _PrefixCode:
    """Decoding table: either a zero-bit single-symbol code or a
    (length, code) -> symbol map. Completeness is enforced — an over-
    or under-subscribed code marks a corrupt stream (spec §5.2)."""

    def __init__(self, lengths: list[int]):
        used = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("prefix code with no symbols")
        if len(used) == 1:
            self.single: int | None = used[0][1]
            self.table: dict[tuple[int, int], int] = {}
            return
        kraft = sum(1 << (_MAX_CODE_LEN - ln) for ln, _ in used)
        if kraft != 1 << _MAX_CODE_LEN:
            raise ValueError("incomplete prefix code")
        self.single = None
        self.table = {
            (ln, code): sym
            for sym, (code, ln) in _canonical_codes(lengths).items()
        }

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, _MAX_CODE_LEN + 1):
            code = (code << 1) | br.bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad prefix code in stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.bit():  # simple code: 1 or 2 symbols
        num_symbols = br.bit() + 1
        if br.bit():
            sym0 = br.bits(8)
        else:
            sym0 = br.bits(1)
        if sym0 >= alphabet_size:
            raise ValueError("simple prefix code symbol out of range")
        lengths = [0] * alphabet_size
        lengths[sym0] = 1
        if num_symbols == 2:
            sym1 = br.bits(8)
            if sym1 >= alphabet_size:
                raise ValueError("simple prefix code symbol out of range")
            lengths[sym1] = 1
        else:
            return _PrefixCode.__new__(_PrefixCode)._as_single(sym0)  # type: ignore[attr-defined]
        return _PrefixCode(lengths)
    # normal code: lengths are themselves prefix-coded
    num_clc = br.bits(4) + 4
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.bits(3)
    n_used_clc = sum(1 for v in clc_lengths if v)
    if n_used_clc == 0:
        raise ValueError("code-length code with no symbols")
    clc = _PrefixCode(clc_lengths) if n_used_clc > 1 else (
        _PrefixCode.__new__(_PrefixCode)._as_single(  # type: ignore[attr-defined]
            next(s for s, v in enumerate(clc_lengths) if v)
        )
    )
    if br.bit():  # optional cap on stored lengths
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.bits(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.bits(3)
        else:  # 18
            i += 11 + br.bits(7)
    return _PrefixCode(lengths)


def _as_single(self, sym: int) -> "_PrefixCode":
    self.single = sym
    self.table = {}
    return self


_PrefixCode._as_single = _as_single  # noqa: SLF001 — zero-bit code helper


# ------------------------------------------------------ LZ77 plumbing

def _prefix_value(br: _BitReader, code: int) -> int:
    """LZ77 prefix coding (spec §5.2.3): 1-based value from a prefix
    code plus extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1

# 120-entry 2D distance map (spec §5.2.3), (dx, dy) pairs; distance
# code 1 maps to entry 0.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (4, 8), (-4, 8), (8, 4), (3, 8), (-3, 8), (8, 5), (7, 6), (-7, 6),
    (6, 7), (-6, 7), (8, 6), (7, 7), (-7, 7), (8, 7), (8, 8),
)


def _map_distance(code: int, width: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dy * width + dx
    return d if d >= 1 else 1


# ----------------------------------------------------- image streams

_GREEN_BASE = 256 + 24  # literals + length prefix codes


def _read_code_groups(
    br: _BitReader, n_groups: int, cache_size: int
) -> list[list[_PrefixCode]]:
    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(br, _GREEN_BASE + cache_size)
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append([green, red, blue, alpha, dist])
    return groups


def _decode_image_stream(
    br: _BitReader, width: int, height: int, is_main: bool
) -> np.ndarray:
    """Entropy-coded ARGB image (spec §5): returns a uint32 array of
    length width*height. Transforms are handled by the caller
    (decode_vp8l) — this covers meta prefix images, the color cache
    and LZ77."""
    # Order per the spec (and libwebp's DecodeImageStream):
    # color-cache-info FIRST, then the meta-prefix bit, then codes.
    cache_bits = br.bits(4) if br.bit() else 0
    if cache_bits > 11:
        raise ValueError("color cache too large")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta = None
    meta_bits = 0
    if is_main and br.bit():
        meta_bits = br.bits(3) + 2
        mw = (width + (1 << meta_bits) - 1) >> meta_bits
        mh = (height + (1 << meta_bits) - 1) >> meta_bits
        meta = _decode_image_stream(br, mw, mh, is_main=False)
        meta = ((meta >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
        meta_w = mw
    else:
        n_groups = 1
        meta_w = 0

    groups = _read_code_groups(br, n_groups, cache_size)

    n = width * height
    out = np.zeros(n, dtype=np.uint32)
    pos = 0
    while pos < n:
        if meta is not None:
            x, y = pos % width, pos // width
            g = groups[int(meta[(y >> meta_bits) * meta_w + (x >> meta_bits)])]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:  # literal: G, then R, B, A
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
        elif s < _GREEN_BASE:  # LZ77 backward reference
            length = _prefix_value(br, s - 256)
            dist_code = _prefix_value(br, g[4].read(br))
            dist = _map_distance(dist_code, width)
            if dist > pos:
                raise ValueError("LZ77 distance before image start")
            for _ in range(length):
                if pos >= n:
                    raise ValueError("LZ77 run past image end")
                px = int(out[pos - dist])
                out[pos] = px
                if cache_size:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
                pos += 1
            continue
        else:  # color cache reference
            if not cache_size:
                raise ValueError("cache symbol without a color cache")
            px = cache[s - _GREEN_BASE]
            out[pos] = px
            pos += 1
        if cache_size:
            cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
    return out


# -------------------------------------------------------- transforms

def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    return (_s8(t) * _s8(c)) >> 5


def _inverse_color_transform(
    argb: np.ndarray, w: int, h: int, tiles: np.ndarray, bits: int
) -> None:
    tw = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        trow = (y >> bits) * tw
        for x in range(w):
            t = int(tiles[trow + (x >> bits)])
            g2r = (t >> 0) & 0xFF   # stored in the tile's blue byte
            g2b = (t >> 8) & 0xFF   # green byte
            r2b = (t >> 16) & 0xFF  # red byte
            px = int(argb[y * w + x])
            green = (px >> 8) & 0xFF
            red = ((px >> 16) & 0xFF) + _ct_delta(g2r, green)
            red &= 0xFF
            blue = (px & 0xFF) + _ct_delta(g2b, green) + _ct_delta(r2b, red)
            blue &= 0xFF
            argb[y * w + x] = (px & 0xFF00FF00) | (red << 16) | blue


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((a & 0xFF) + (b & 0xFF)) >> 1
    )


def _select(left: int, top: int, topleft: int) -> int:
    diff = 0
    for sh in (24, 16, 8, 0):
        lc = (left >> sh) & 0xFF
        tc = (top >> sh) & 0xFF
        tlc = (topleft >> sh) & 0xFF
        diff += abs(lc - tlc) - abs(tc - tlc)
    return top if diff <= 0 else left


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(ave: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        d = a - ((c >> sh) & 0xFF)
        half = d // 2 if d >= 0 else -((-d) // 2)  # C truncation
        out |= max(0, min(255, a + half)) << sh
    return out


def _inverse_predictor_transform(
    argb: np.ndarray, w: int, h: int, tiles: np.ndarray, bits: int
) -> None:
    tw = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        trow = (y >> bits) * tw
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(argb[i - 1])
            elif x == 0:
                pred = int(argb[i - w])
            else:
                mode = (int(tiles[trow + (x >> bits)]) >> 8) & 0xFF
                left = int(argb[i - 1])
                top = int(argb[i - w])
                tl = int(argb[i - w - 1])
                tr = int(argb[i - w + 1]) if x + 1 < w else int(argb[i - x])
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(left, tr), top)
                elif mode == 6:
                    pred = _avg2(left, tl)
                elif mode == 7:
                    pred = _avg2(left, top)
                elif mode == 8:
                    pred = _avg2(tl, top)
                elif mode == 9:
                    pred = _avg2(top, tr)
                elif mode == 10:
                    pred = _avg2(_avg2(left, tl), _avg2(top, tr))
                elif mode == 11:
                    pred = _select(left, top, tl)
                elif mode == 12:
                    pred = _clamp_add_sub_full(left, top, tl)
                elif mode == 13:
                    pred = _clamp_add_sub_half(_avg2(left, top), tl)
                else:
                    raise ValueError(f"bad predictor mode {mode}")
            px = int(argb[i])
            argb[i] = (
                (((px >> 24) + (pred >> 24)) & 0xFF) << 24
                | ((((px >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
                | ((((px >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
                | (((px & 0xFF) + (pred & 0xFF)) & 0xFF)
            )


def _inverse_subtract_green(argb: np.ndarray) -> None:
    g = (argb >> np.uint32(8)) & np.uint32(0xFF)
    r = (((argb >> np.uint32(16)) & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    b = ((argb & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    argb[:] = (argb & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b


def _index_width_bits(palette_size: int) -> int:
    if palette_size <= 2:
        return 3
    if palette_size <= 4:
        return 2
    if palette_size <= 16:
        return 1
    return 0


def _inverse_color_indexing(
    packed: np.ndarray, packed_w: int, w: int, h: int, palette: np.ndarray
) -> np.ndarray:
    wbits = _index_width_bits(len(palette))
    out = np.zeros(w * h, dtype=np.uint32)
    if wbits == 0:
        idx = (packed >> np.uint32(8)) & np.uint32(0xFF)
        safe = np.where(idx < len(palette), idx, 0)
        out[:] = np.where(
            idx < len(palette), palette[safe.astype(np.int64)], 0
        )
        return out
    per = 1 << wbits          # packed pixels per green byte
    bpp = 8 >> wbits          # bits per index
    mask = (1 << bpp) - 1
    for y in range(h):
        row = y * packed_w
        for x in range(w):
            green = (int(packed[row + (x >> wbits)]) >> 8) & 0xFF
            idx = (green >> ((x % per) * bpp)) & mask
            out[y * w + x] = int(palette[idx]) if idx < len(palette) else 0
    return out


# ----------------------------------------------------------- decoder

def decode_vp8l(chunk: bytes) -> np.ndarray:
    """(h, w, 4) uint8 RGBA from a raw VP8L chunk payload."""
    if len(chunk) < 5 or chunk[0] != 0x2F:
        raise ValueError("not a VP8L stream")
    br = _BitReader(chunk[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha hint (informational)
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")

    # Transforms are declared front-to-back; each records the image
    # width CURRENT at its read position (color indexing shrinks the
    # width for everything declared/decoded after it).
    transforms: list[tuple[int, dict]] = []
    seen: set[int] = set()
    cur_w = w
    while br.bit():
        ttype = br.bits(2)
        if ttype in seen:
            raise ValueError("duplicate transform")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / color
            bits = br.bits(3) + 2
            tw = (cur_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            tiles = _decode_image_stream(br, tw, th, is_main=False)
            transforms.append((ttype, {"bits": bits, "tiles": tiles, "w": cur_w}))
        elif ttype == 2:  # subtract green
            transforms.append((2, {}))
        else:  # color indexing
            psize = br.bits(8) + 1
            praw = _decode_image_stream(br, psize, 1, is_main=False)
            # palette entries are delta-coded per channel
            pal = np.zeros(psize, dtype=np.uint32)
            prev = 0
            for i in range(psize):
                cur = int(praw[i])
                px = 0
                for sh in (24, 16, 8, 0):
                    px |= ((((cur >> sh) & 0xFF) + ((prev >> sh) & 0xFF)) & 0xFF) << sh
                pal[i] = px
                prev = px
            wbits = _index_width_bits(psize)
            packed_w = (cur_w + (1 << wbits) - 1) >> wbits
            transforms.append(
                (3, {"palette": pal, "w": cur_w, "packed_w": packed_w})
            )
            cur_w = packed_w

    argb = _decode_image_stream(br, cur_w, h, is_main=True)

    for ttype, st in reversed(transforms):
        if ttype == 3:
            argb = _inverse_color_indexing(
                argb, st["packed_w"], st["w"], h, st["palette"]
            )
            cur_w = st["w"]
        elif ttype == 2:
            _inverse_subtract_green(argb)
        elif ttype == 1:
            _inverse_color_transform(argb, cur_w, h, st["tiles"], st["bits"])
        else:
            _inverse_predictor_transform(argb, cur_w, h, st["tiles"], st["bits"])

    a = ((argb >> np.uint32(24)) & np.uint32(0xFF)).astype(np.uint8)
    r = ((argb >> np.uint32(16)) & np.uint32(0xFF)).astype(np.uint8)
    g = ((argb >> np.uint32(8)) & np.uint32(0xFF)).astype(np.uint8)
    b = (argb & np.uint32(0xFF)).astype(np.uint8)
    return np.stack([r, g, b, a], axis=-1).reshape(h, w, 4)


def decode_webp(payload: bytes) -> np.ndarray:
    """(h, w, 4) uint8 RGBA from a RIFF/WEBP container holding a VP8L
    chunk (directly, or as the still image inside a VP8X container).
    Raises UnsupportedWebp for lossy-only payloads."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    i = 12
    while i + 8 <= len(payload):
        fourcc = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l(body)
        if fourcc == b"VP8 ":
            raise UnsupportedWebp("lossy VP8 pixel decode not implemented")
        if fourcc == b"ANMF":
            # animated container: the first frame is the still (r11)
            return decode_vp8l(split_webp_anim(payload)[0][1])
        i += 8 + size + (size & 1)
    raise UnsupportedWebp("no VP8L chunk in WebP container")


# ----------------------------------------------------------- encoder

def _code_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Canonical-huffman code lengths from symbol frequencies; the
    result is always a COMPLETE code (required by spec decoders).
    Flattens frequencies if a depth ever exceeds the 15-bit cap."""
    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 0}  # caller emits a simple code
    f = dict(freqs)
    while True:
        heap: list[tuple[int, int, list[int]]] = [
            (fr, s, [s]) for s, fr in sorted(f.items())
        ]
        heapq.heapify(heap)
        depth = dict.fromkeys(f, 0)
        while len(heap) > 1:
            fa, ia, sa = heapq.heappop(heap)
            fb, ib, sb = heapq.heappop(heap)
            for s in sa + sb:
                depth[s] += 1
            heapq.heappush(heap, (fa + fb, min(ia, ib), sa + sb))
        if max(depth.values()) <= _MAX_CODE_LEN:
            return depth
        f = {s: max(1, fr >> 2) for s, fr in f.items()}


def _write_prefix_code(
    bw: _BitWriter, lengths_by_sym: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Emit one prefix code, return symbol -> (code, length)."""
    syms = sorted(lengths_by_sym)
    if len(syms) <= 2 and all(s < 256 for s in syms) and all(
        lengths_by_sym[s] <= 1 for s in syms
    ):
        bw.put_bits(1, 1)  # simple
        bw.put_bits(len(syms) - 1, 1)
        s0 = syms[0]
        if s0 > 1:
            bw.put_bits(1, 1)
            bw.put_bits(s0, 8)
        else:
            bw.put_bits(0, 1)
            bw.put_bits(s0, 1)
        if len(syms) == 1:
            return {s0: (0, 0)}
        bw.put_bits(syms[1], 8)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    bw.put_bits(0, 1)  # normal code
    full = [0] * alphabet_size
    for s, ln in lengths_by_sym.items():
        full[s] = ln
    clc_freq: dict[int, int] = {}
    for ln in full:
        clc_freq[ln] = clc_freq.get(ln, 0) + 1
    clc_lengths = _code_lengths(clc_freq)
    if len(clc_lengths) == 1:
        # a degenerate CL code can't express anything useful; force a
        # second symbol so the CL code is a real 1-bit pair
        other = 0 if next(iter(clc_lengths)) != 0 else 1
        clc_lengths = {next(iter(clc_lengths)): 1, other: 1}
    num_clc = max(
        i + 1 for i, s in enumerate(_CLC_ORDER) if s in clc_lengths
    )
    num_clc = max(num_clc, 4)
    bw.put_bits(num_clc - 4, 4)
    for i in range(num_clc):
        bw.put_bits(clc_lengths.get(_CLC_ORDER[i], 0), 3)
    clc_codes = _canonical_codes(
        [clc_lengths.get(s, 0) for s in range(19)]
    )
    bw.put_bits(0, 1)  # no max-symbol cap: all lengths stored
    for ln in full:
        c, cl = clc_codes[ln]
        bw.put_code(c, cl)
    return _canonical_codes(full)


def _write_literal_stream(
    bw: _BitWriter, width: int, height: int, channels: int, pixels: bytes
) -> None:
    """[prefix codes][literal pixels] — the shared tail of a
    spatially- or entropy-coded image with no color cache. The caller
    writes whatever flag bits its context requires (transform bit +
    cache bit + meta bit for the main image; cache bit alone for
    transform-data sub-images)."""
    px = np.frombuffer(pixels, dtype=np.uint8).reshape(-1, channels)
    if channels == 1:
        r = g = b = px[:, 0]
        a = np.full(len(px), 255, dtype=np.uint8)
    else:
        r, g, b = px[:, 0], px[:, 1], px[:, 2]
        a = px[:, 3] if channels == 4 else np.full(len(px), 255, np.uint8)

    def freqs(arr: np.ndarray) -> dict[int, int]:
        vals, counts = np.unique(arr, return_counts=True)
        return {int(v): int(c) for v, c in zip(vals, counts)}

    codes = []
    for arr, size in ((g, _GREEN_BASE), (r, 256), (b, 256), (a, 256)):
        codes.append(_write_prefix_code(bw, _code_lengths(freqs(arr)), size))
    _write_prefix_code(bw, {0: 0}, 40)  # unused distance tree

    gc, rc, bc, ac = codes
    for i in range(width * height):
        c, ln = gc[int(g[i])]
        bw.put_code(c, ln)
        c, ln = rc[int(r[i])]
        bw.put_code(c, ln)
        c, ln = bc[int(b[i])]
        bw.put_code(c, ln)
        c, ln = ac[int(a[i])]
        bw.put_code(c, ln)


def encode_vp8l(
    width: int, height: int, channels: int, pixels: bytes
) -> bytes:
    """Minimal legal lossless WebP: literal-only VP8L stream (no
    transforms / cache / LZ77) in a RIFF container. ``channels`` is
    1 (gray), 3 (RGB) or 4 (RGBA); ``pixels`` is row-major."""
    if width < 1 or width > 16384 or height < 1 or height > 16384:
        raise ValueError("VP8L dims must be in 1..16384")
    if channels not in (1, 3, 4):
        raise ValueError("channels must be 1, 3 or 4")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")

    bw = _BitWriter()
    bw.put_bits(width - 1, 14)
    bw.put_bits(height - 1, 14)
    bw.put_bits(1 if channels == 4 else 0, 1)
    bw.put_bits(0, 3)  # version
    bw.put_bits(0, 1)  # no transforms
    bw.put_bits(0, 1)  # no color cache (spec: cache-info first)
    bw.put_bits(0, 1)  # no meta prefix codes
    _write_literal_stream(bw, width, height, channels, pixels)

    chunk = b"\x2f" + bw.getvalue()
    if len(chunk) & 1:
        padded = chunk + b"\x00"
    else:
        padded = chunk
    riff_body = b"WEBP" + b"VP8L" + struct.pack("<I", len(chunk)) + padded
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


# ------------------------------------------------- animated (ANMF)
#
# Container-spec slice (RFC 9649 §"Animation"): a VP8X header with
# the animation flag, one ANIM chunk (background color + loop
# count), then one ANMF chunk per frame — 16 header bytes
# (x/2, y/2, w-1, h-1 as u24le; duration u24le; 1 flags byte:
# bit0 = do-not-blend, bit1 = dispose-to-background) followed by the
# frame's own image sub-chunks (VP8L here). Frame payloads are
# complete stills, so sampling = re-wrapping the embedded VP8L chunk
# into a standalone RIFF container — no transcode, byte-lossless.
# Canvas COMPOSITION (blend/dispose across frames) is the renderer's
# job, same contract as the GIF frame splitter (gif.py emits
# standalone per-frame GIFs without composing disposal methods).


def _u24(b: bytes) -> int:
    return int.from_bytes(b, "little")


def split_webp_anim(payload: bytes) -> list[tuple[dict, bytes]]:
    """[(meta, vp8l_chunk_payload)] per ANMF frame of an animated
    WebP. meta: x, y, w, h, duration_ms, blend ('none'|'alpha'),
    dispose ('none'|'background'). Raises ValueError when the
    container is not an animated WebP; UnsupportedWebp when a frame
    carries lossy VP8 instead of VP8L."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    if payload[12:16] != b"VP8X" or len(payload) < 30:
        raise ValueError("not an extended WebP (no VP8X)")
    if not payload[20] & 0x02:
        raise ValueError("animation flag not set")
    frames: list[tuple[dict, bytes]] = []
    i = 12
    while i + 8 <= len(payload):
        fourcc = payload[i : i + 4]
        size = _u24(payload[i + 4 : i + 7]) | (payload[i + 7] << 24)
        body = payload[i + 8 : i + 8 + size]
        if fourcc == b"ANMF":
            if len(body) < 16:
                raise ValueError("truncated ANMF header")
            meta = {
                "x": 2 * _u24(body[0:3]),
                "y": 2 * _u24(body[3:6]),
                "w": _u24(body[6:9]) + 1,
                "h": _u24(body[9:12]) + 1,
                "duration_ms": _u24(body[12:15]),
                "blend": "none" if body[15] & 0x01 else "alpha",
                "dispose": "background" if body[15] & 0x02 else "none",
            }
            # frame data: sub-chunks (ALPH skipped; VP8L wanted)
            j = 16
            chunk = None
            while j + 8 <= len(body):
                fc = body[j : j + 4]
                sz = struct.unpack("<I", body[j + 4 : j + 8])[0]
                if fc == b"VP8L":
                    chunk = body[j + 8 : j + 8 + sz]
                    break
                if fc == b"VP8 ":
                    raise UnsupportedWebp(
                        "lossy VP8 animation frame not supported"
                    )
                j += 8 + sz + (sz & 1)
            if chunk is None:
                raise ValueError("ANMF frame without VP8L data")
            frames.append((meta, chunk))
        i += 8 + size + (size & 1)
    if not frames:
        raise ValueError("animated WebP with no ANMF frames")
    return frames


def _wrap_vp8l_still(chunk: bytes) -> bytes:
    """Standalone RIFF/WEBP container around a raw VP8L chunk."""
    padded = chunk + (b"\x00" if len(chunk) & 1 else b"")
    riff_body = b"WEBP" + b"VP8L" + struct.pack("<I", len(chunk)) + padded
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def webp_anim_stills(payload: bytes) -> list[bytes]:
    """One standalone lossless-WebP still per animation frame —
    byte-lossless re-wrap of each ANMF frame's VP8L chunk (the
    sample_frames seam's per-frame output format)."""
    return [_wrap_vp8l_still(c) for _, c in split_webp_anim(payload)]


def decode_webp_anim(payload: bytes) -> list[tuple[dict, "np.ndarray"]]:
    """[(meta, (h, w, 4) RGBA)] per frame — full pixel decode of each
    ANMF frame's VP8L stream (sub-frame rectangle; composition onto
    the canvas is the caller's concern, see split_webp_anim)."""
    return [(m, decode_vp8l(c)) for m, c in split_webp_anim(payload)]


def encode_webp_anim(
    frames: list[tuple[int, int, int, "np.ndarray"]],
    canvas_w: int,
    canvas_h: int,
    loop: int = 0,
) -> bytes:
    """Animated lossless WebP from [(x, y, duration_ms, rgba)] frames
    (each rgba an (h, w, 4) uint8 array placed at even offsets x, y).
    Inverse of decode_webp_anim for blend='none'/dispose='background'
    frames."""
    body = bytearray()

    def put_chunk(fourcc: bytes, payload: bytes) -> None:
        body.extend(fourcc)
        body.extend(struct.pack("<I", len(payload)))
        body.extend(payload)
        if len(payload) & 1:
            body.append(0)

    flags = 0x02 | 0x10  # animation + alpha
    put_chunk(
        b"VP8X",
        bytes([flags, 0, 0, 0])
        + (canvas_w - 1).to_bytes(3, "little")
        + (canvas_h - 1).to_bytes(3, "little"),
    )
    put_chunk(b"ANIM", struct.pack("<IH", 0, loop))
    for x, y, dur, rgba in frames:
        if x % 2 or y % 2:
            raise ValueError("ANMF offsets must be even")
        h, w = rgba.shape[:2]
        still = encode_vp8l(w, h, 4, rgba.tobytes())
        # extract the VP8L chunk (incl. header+pad) from the still
        vp8l = still[12:]
        anmf = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little")
            + int(dur).to_bytes(3, "little")
            + bytes([0x02])  # blend=alpha, dispose=background
            + vp8l
        )
        put_chunk(b"ANMF", anmf)
    riff_body = b"WEBP" + bytes(body)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
