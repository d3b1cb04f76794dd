"""Baseline JPEG codec — pure stdlib + numpy, no media libraries.

Decoder: baseline sequential DCT (SOF0), Huffman entropy coding,
grayscale, 4:4:4 and 4:2:0-subsampled YCbCr (generalized MCU
interleave with chroma upsampling), DRI/RSTn restart markers —
the shapes real camera/screenshot JPEGs use. Progressive /
arithmetic / exotic-sampling streams raise ValueError and stay
behind the decoder seam (multimodal/columns.py falls back to
header-only parsing for them).

Encoder: grayscale, 4:4:4 and 4:2:0 baseline writer (optional
restart intervals) used by the tests to craft genuine JPEG payloads
(round-trip: encode → decode → compare within quantization error).

Everything here is public-spec knowledge: ITU T.81 (JPEG, 1992),
including the Annex K "typical" Huffman tables. The FDCT/IDCT is the
orthonormal 8×8 DCT-II as two matrix products — numpy-vectorized per
block, no per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# ITU T.81 Annex K.3: typical Huffman tables (BITS counts + values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# flat quant table: lossless-but-for-rounding (used by the test encoder)
FLAT_Q = np.ones(64, dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8).reshape(-1, 1)
    j = np.arange(8).reshape(1, -1)
    c = np.cos((2 * j + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    c[0, :] = np.sqrt(1 / 8)
    return c


_C = _dct_matrix()


def fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def idct(coefs: np.ndarray) -> np.ndarray:
    return _C.T @ coefs @ _C


def _build_huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical JPEG assignment."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (category, bits)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _extend(bits: int, s: int) -> int:
    """Inverse of _magnitude."""
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)

    def restart(self, n: int) -> None:
        """Byte-align (1-padding) and emit RSTn — markers are written
        raw, never byte-stuffed."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out.extend(bytes([0xFF, 0xD0 + (n % 8)]))


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: entropy stream exhausted")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1  # stuffed zero
            else:
                raise ValueError("jpeg: unexpected marker in scan")
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("jpeg: invalid huffman code")

    def sync_restart(self) -> None:
        """Discard padding bits to the byte boundary and consume the
        RSTn marker that the encoder wrote between restart
        intervals."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("jpeg: expected restart marker")
        self.pos += 2


# ---------------------------------------------------------------- encoder


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    coefs = np.round(fdct(block.astype(np.float64) - 128.0)).astype(np.int64)
    quant = (coefs.flatten()[ZIGZAG] / q).round().astype(np.int64)
    dc = int(quant[0])
    s, bits = _magnitude(dc - pred)
    code, length = dc_codes[s]
    writer.write(code, length)
    if s:
        writer.write(bits, s)
    run = 0
    for ac in quant[1:]:
        if ac == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s, bits = _magnitude(int(ac))
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(bits, s)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return dc


def encode_jpeg(
    img: np.ndarray,
    quant: np.ndarray = FLAT_Q,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG bytes from uint8 HxW (grayscale) or HxWx3 (RGB,
    encoded 4:4:4 YCbCr — or 4:2:0 with ``subsample=True``).
    Dimensions must be multiples of 8 (16 for 4:2:0) — test encoder,
    no padding logic."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    mcu = 16 if subsample and not gray else 8
    if h % mcu or w % mcu:
        raise ValueError(f"test encoder requires multiple-of-{mcu} dims")
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0]) + bytes(int(x) for x in quant))  # DQT id 0
    if gray:
        comps = bytes([1, 0x11, 0])
        planes = [img.astype(np.float64)]
    else:
        seg(0xDB, bytes([1]) + bytes(int(x) for x in quant))  # DQT id 1
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:  # 2x2 mean chroma downsample (4:2:0)
            cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            comps = bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
        else:
            comps = bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
        planes = [y, cb, cr]
    seg(0xC0, struct.pack(">BHHB", 8, h, w, len(planes)) + comps)  # SOF0

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> None:
        seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)

    if gray:
        sos_comps = bytes([1, 0x00])
    else:
        sos_comps = bytes([1, 0x00, 2, 0x11, 3, 0x11])
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    seg(0xDA, bytes([len(planes)]) + sos_comps + bytes([0, 63, 0]))

    dc_codes = [
        _build_huff_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_codes = [
        _build_huff_codes(AC_LUMA_BITS, AC_LUMA_VALS),
        _build_huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]
    writer = _BitWriter()
    preds = [0] * len(planes)
    # (h_i, v_i) sampling factors per component, matching the SOF
    factors = [(1, 1)] * len(planes)
    if not gray and subsample:
        factors = [(2, 2), (1, 1), (1, 1)]
    mcu_i = 0
    rst_n = 0
    for by in range(h // mcu):
        for bx in range(w // mcu):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                writer.restart(rst_n)
                rst_n += 1
                preds = [0] * len(planes)  # RST resets DC prediction
            mcu_i += 1
            for ci, plane in enumerate(planes):
                hi, vi = factors[ci]
                t = 0 if ci == 0 else 1
                for v in range(vi):  # blocks raster-ordered within MCU
                    for u in range(hi):
                        r0 = (by * vi + v) * 8
                        c0 = (bx * hi + u) * 8
                        block = plane[r0 : r0 + 8, c0 : c0 + 8]
                        preds[ci] = _encode_block(
                            writer, block, quant, preds[ci], dc_codes[t], ac_codes[t]
                        )
    out.extend(writer.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


def decode_jpeg(payload: bytes) -> np.ndarray:
    """uint8 HxW (grayscale) or HxWx3 (RGB) pixels from baseline
    sequential JPEG bytes. Raises ValueError on progressive /
    subsampled / arithmetic / truncated streams (the seam's fallback
    handles those)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a jpeg")
    i = 2
    restart_interval = 0
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = 0
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qtable)
    scan: bytes | None = None
    scan_comps: list[tuple[int, int, int]] = []  # (id, dc_tid, ac_tid)
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("jpeg: desynced marker stream")
        marker = payload[i + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        body = payload[i + 4 : i + 2 + seglen]
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0xF
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(
                    body[j + 1 : j + 65], dtype=np.uint8
                ).astype(np.int64)
                j += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("jpeg: only baseline SOF0 supported")
        elif marker == 0xC0:
            _prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            comps = []
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp not in (0x11, 0x22):
                    raise ValueError("jpeg: only 1x1/2x2 sampling factors supported")
                comps.append((cid, samp, tq))
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                nvals = sum(bits)
                vals = list(body[j + 17 : j + 17 + nvals])
                huff[(cls, tid)] = _build_huff_decoder(bits, vals)
                j += 17 + nvals
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ncomp = body[0]
            scan_comps = []
            for c in range(ncomp):
                cid = body[1 + 2 * c]
                tsel = body[2 + 2 * c]
                scan_comps.append((cid, tsel >> 4, tsel & 0xF))
            scan = payload[i + 2 + seglen :]
            break
        i += 2 + seglen
    if scan is None or not comps or not h:
        raise ValueError("jpeg: missing SOF/SOS")

    reader = _BitReader(scan)
    # per-component sampling factors; MCU spans (8·hmax × 8·vmax) px
    factors = [((s >> 4) & 0xF, s & 0xF) for _cid, s, _tq in comps]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    nmy = (h + 8 * vmax - 1) // (8 * vmax)
    nmx = (w + 8 * hmax - 1) // (8 * hmax)
    planes = [
        np.zeros((nmy * 8 * vi, nmx * 8 * hi)) for (hi, vi) in factors
    ]
    preds = [0] * len(comps)
    qt = {cid: qtables[tq] for cid, _s, tq in comps}
    comp_order = {cid: ci for ci, (cid, _s, _tq) in enumerate(comps)}

    def decode_block(cid: int, dc_tid: int, ac_tid: int, ci: int) -> np.ndarray:
        dc_table = huff[(0, dc_tid)]
        ac_table = huff[(1, ac_tid)]
        zz = np.zeros(64, dtype=np.int64)
        s = reader.read_huff(dc_table)
        diff = _extend(reader.read_bits(s), s) if s else 0
        preds[ci] += diff
        zz[0] = preds[ci]
        k = 1
        while k < 64:
            rs = reader.read_huff(ac_table)
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += rs >> 4
            size = rs & 0xF
            if k > 63:
                raise ValueError("jpeg: AC index overflow")
            zz[k] = _extend(reader.read_bits(size), size)
            k += 1
        coefs = np.zeros(64)
        coefs[ZIGZAG] = zz * qt[cid]
        return idct(coefs.reshape(8, 8)) + 128.0

    mcu_i = 0
    for my in range(nmy):
        for mx in range(nmx):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                reader.sync_restart()
                for ci in range(len(preds)):
                    preds[ci] = 0
            mcu_i += 1
            for cid, dc_tid, ac_tid in scan_comps:
                ci = comp_order[cid]
                hi, vi = factors[ci]
                for v in range(vi):
                    for u in range(hi):
                        block = decode_block(cid, dc_tid, ac_tid, ci)
                        r0 = (my * vi + v) * 8
                        c0 = (mx * hi + u) * 8
                        planes[ci][r0 : r0 + 8, c0 : c0 + 8] = block
    # upsample subsampled components to full resolution, crop to (h, w)
    full = []
    for p, (hi, vi) in zip(planes, factors):
        if hi < hmax or vi < vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    planes = full
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- mjpeg


def _jpeg_frame_end(payload: bytes, start: int) -> int:
    """Index just past the EOI of the JPEG frame starting at ``start``
    (which must point at an SOI). Walks marker segments by their
    declared lengths — header segments (DQT/DHT/APPn/COM) may contain
    raw FF D9 bytes, so a naive EOI search is wrong — and scans
    entropy-coded data using the stuffing rules (FF 00 = data byte,
    FF D0–D7 = restart)."""
    i, n = start + 2, len(payload)
    while i + 2 <= n:
        if payload[i] != 0xFF:
            raise ValueError("expected marker in JPEG header stream")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI before any scan: header-only frame
            return i + 2
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn: bare
            i += 2
            continue
        if i + 4 > n:
            break
        seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
        i += 2 + seglen
        if marker != 0xDA:  # not SOS: next marker follows the segment
            continue
        # entropy-coded scan data: FF 00 stuffing, FF D0-D7 restarts;
        # any other FF xx is a real marker (EOI, or DNL/next SOS for
        # multi-scan streams — loop back to marker parsing for those)
        while i + 1 < n:
            if payload[i] != 0xFF or payload[i + 1] in (0x00,) or (
                0xD0 <= payload[i + 1] <= 0xD7
            ):
                i += 1
                continue
            if payload[i + 1] == 0xD9:
                return i + 2
            break  # another marker segment (multi-scan); outer loop
    raise ValueError("truncated JPEG frame")


def split_mjpeg(payload: bytes) -> list[bytes]:
    """Split a concatenated-JPEG (MJPEG-in-a-blob) stream into its
    individual complete JPEG frames.

    Frames are SOI..EOI spans found by a real marker walk
    (``_jpeg_frame_end``); 0x00/0xFF fill bytes between frames (common
    in hardware MJPEG) are skipped. Raises ValueError unless the
    payload starts at an SOI and contains at least two complete frames
    with nothing but padding between them — single JPEGs and arbitrary
    binary blobs fall through to the caller's other codecs.
    """
    if len(payload) < 8 or payload[:2] != b"\xff\xd8":
        raise ValueError("not an MJPEG stream")
    frames: list[bytes] = []
    pos, n = 0, len(payload)
    while pos < n:
        if payload[pos] in (0x00, 0xFF) and payload[pos : pos + 2] != b"\xff\xd8":
            pos += 1  # inter-frame fill byte
            continue
        if payload[pos : pos + 2] != b"\xff\xd8":
            raise ValueError("garbage between MJPEG frames")
        end = _jpeg_frame_end(payload, pos)
        frames.append(payload[pos:end])
        pos = end
    if len(frames) < 2:
        raise ValueError("single JPEG, not an MJPEG stream")
    return frames
