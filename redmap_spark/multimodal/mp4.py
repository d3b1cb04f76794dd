"""ISO-BMFF (MP4/MOV) box-walk metadata — pure stdlib struct parsing.

The container format is a tree of length-prefixed boxes
(`size:u32 type:4s [largesize:u64]`); metadata never requires a
codec: `ftyp` carries the brand, `moov/mvhd` the presentation
timescale + duration, each `moov/trak` one track whose `tkhd` holds
16.16 fixed-point display width/height and whose
`mdia/minf/stbl/stts` time-to-sample table gives the exact sample
(frame) count. This parser walks exactly those boxes and nothing
else — no sample data is touched, so it runs at header speed on an
Arrow batch inside mm_features' mapInPandas path (the same
header-only contract as parse_image_header for PNG/GIF/JPEG).

Malformed input contract: any truncated/overflowing box aborts the
walk and returns None — callers fall back exactly as for any other
unrecognized payload.
"""

from __future__ import annotations

import struct
from typing import Iterator


def _boxes(data: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    i = start
    while i + 8 <= end:
        size, btype = struct.unpack(">I4s", data[i : i + 8])
        header = 8
        if size == 1:
            if i + 16 > end:
                return
            (size,) = struct.unpack(">Q", data[i + 8 : i + 16])
            header = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - i
        if size < header or i + size > end:
            return  # malformed — abort the walk
        yield btype, i + header, i + size
        i += size


def _find(data: bytes, start: int, end: int, btype: bytes) -> tuple[int, int] | None:
    for t, s, e in _boxes(data, start, end):
        if t == btype:
            return s, e
    return None


def _stts_sample_count(data: bytes, s: int, e: int) -> int:
    """Total samples from a time-to-sample box: sum of entry counts."""
    if s + 8 > e:
        return 0
    (n_entries,) = struct.unpack(">I", data[s + 4 : s + 8])
    total = 0
    for k in range(n_entries):
        off = s + 8 + 8 * k
        if off + 8 > e:
            break
        (count,) = struct.unpack(">I", data[off : off + 4])
        total += count
    return total


def parse_mp4(payload: bytes) -> dict | None:
    """Box-walk metadata for an ISO-BMFF payload, or None.

    Returns {brand, timescale, duration, duration_s, n_tracks,
    width, height, n_samples}: brand from ftyp; timescale/duration
    from mvhd (version 0 and 1 layouts); n_tracks = trak count;
    width/height = first trak with a nonzero tkhd display size
    (16.16 fixed-point, rounded); n_samples = that track's stts
    total (0 when the sample tables are absent, e.g. fragmented
    MP4)."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    out = {
        "brand": payload[8:12].decode("latin-1"),
        "timescale": 0,
        "duration": 0,
        "duration_s": 0.0,
        "n_tracks": 0,
        "width": 0,
        "height": 0,
        "n_samples": 0,
    }
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        return out  # ftyp alone is still identifiable metadata
    ms, me = moov
    for t, s, e in _boxes(payload, ms, me):
        if t == b"mvhd" and s < e:
            version = payload[s]
            if version == 1 and s + 32 <= e:
                (out["timescale"],) = struct.unpack(">I", payload[s + 20 : s + 24])
                (out["duration"],) = struct.unpack(">Q", payload[s + 24 : s + 32])
            elif version == 0 and s + 20 <= e:
                (out["timescale"],) = struct.unpack(">I", payload[s + 12 : s + 16])
                (out["duration"],) = struct.unpack(">I", payload[s + 16 : s + 20])
            if out["timescale"]:
                out["duration_s"] = round(out["duration"] / out["timescale"], 3)
        elif t == b"trak":
            out["n_tracks"] += 1
            tkhd = _find(payload, s, e, b"tkhd")
            if tkhd is None:
                continue
            ts_, te_ = tkhd
            version = payload[ts_] if ts_ < te_ else 0
            wh_off = ts_ + (88 if version == 1 else 76)
            if wh_off + 8 > te_:
                continue
            w_fp, h_fp = struct.unpack(">II", payload[wh_off : wh_off + 8])
            w, h = round(w_fp / 65536), round(h_fp / 65536)
            if w and h and not out["width"]:
                out["width"], out["height"] = w, h
                # frame count: walk this (video) track's sample table
                path = (b"mdia", b"minf", b"stbl")
                scope = (s, e)
                for want in path:
                    nxt = _find(payload, scope[0], scope[1], want)
                    if nxt is None:
                        scope = None
                        break
                    scope = nxt
                if scope is not None:
                    stts = _find(payload, scope[0], scope[1], b"stts")
                    if stts is not None:
                        out["n_samples"] = _stts_sample_count(
                            payload, stts[0], stts[1]
                        )
    return out
