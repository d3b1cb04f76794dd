"""ISO-BMFF box-walk metadata: crafted-bytes roundtrips — ftyp brand,
mvhd timescale/duration (v0 and v1), trak count, tkhd 16.16 display
size, stts sample count — and the mm_features header path handling an
MP4 payload without the md5 fallback."""

from __future__ import annotations

import struct

from redmap_spark.multimodal.columns import decode_image
from redmap_spark.multimodal.mp4 import parse_mp4


def box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), btype) + body


def ftyp(brand: bytes = b"isom") -> bytes:
    return box(b"ftyp", brand + struct.pack(">I", 0x200) + b"isomiso2")


def mvhd_v0(timescale: int, duration: int) -> bytes:
    body = bytes(4) + struct.pack(">II", 0, 0)  # version/flags, times
    body += struct.pack(">II", timescale, duration)
    body += bytes(80)  # rate..matrix..next_track_id
    return box(b"mvhd", body)


def mvhd_v1(timescale: int, duration: int) -> bytes:
    body = b"\x01" + bytes(3) + struct.pack(">QQ", 0, 0)
    body += struct.pack(">IQ", timescale, duration)
    body += bytes(80)
    return box(b"mvhd", body)


def tkhd_v0(width: int, height: int) -> bytes:
    body = bytes(4)  # version/flags
    body += struct.pack(">IIII", 0, 0, 1, 0)  # times, track_id, reserved
    body += struct.pack(">I", 0)  # duration
    body += bytes(8 + 2 + 2 + 2 + 2 + 36)  # reserved..matrix
    body += struct.pack(">II", width << 16, height << 16)
    return box(b"tkhd", body)


def stts(counts_deltas: list[tuple[int, int]]) -> bytes:
    body = bytes(4) + struct.pack(">I", len(counts_deltas))
    for c, d in counts_deltas:
        body += struct.pack(">II", c, d)
    return box(b"stts", body)


def video_trak(width: int, height: int, samples: list[tuple[int, int]]) -> bytes:
    stbl = box(b"stbl", stts(samples))
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", minf)
    return box(b"trak", tkhd_v0(width, height) + mdia)


def audio_trak() -> bytes:
    return box(b"trak", tkhd_v0(0, 0))


def mp4_bytes(mvhd: bytes, traks: list[bytes]) -> bytes:
    return ftyp() + box(b"moov", mvhd + b"".join(traks))


def test_parse_mp4_v0_full_walk():
    payload = mp4_bytes(
        mvhd_v0(timescale=600, duration=3000),
        [video_trak(640, 360, [(48, 25), (24, 50)]), audio_trak()],
    )
    got = parse_mp4(payload)
    assert got == {
        "brand": "isom",
        "timescale": 600,
        "duration": 3000,
        "duration_s": 5.0,
        "n_tracks": 2,
        "width": 640,
        "height": 360,
        "n_samples": 72,
    }


def test_parse_mp4_v1_64bit_duration():
    payload = mp4_bytes(mvhd_v1(90000, 90000 * 7200), [audio_trak()])
    got = parse_mp4(payload)
    assert got["timescale"] == 90000
    assert got["duration_s"] == 7200.0
    assert got["n_tracks"] == 1 and got["width"] == 0


def test_parse_mp4_rejects_non_bmff_and_truncation():
    assert parse_mp4(b"not a video at all") is None
    assert parse_mp4(b"\x89PNG\r\n\x1a\n" + bytes(100)) is None
    full = mp4_bytes(mvhd_v0(600, 600), [video_trak(64, 64, [(10, 60)])])
    # truncating inside moov aborts the walk without raising; the
    # ftyp-derived brand survives
    cut = parse_mp4(full[: len(full) - 30])
    assert cut is not None and cut["brand"] == "isom"


def test_decode_image_uses_mp4_header_not_md5_fallback():
    payload = mp4_bytes(
        mvhd_v0(600, 1200), [video_trak(1280, 720, [(100, 12)])]
    )
    assert decode_image(payload) == (1280, 720, 100)


def test_mm_features_handles_mp4_through_spark(spark):
    from redmap_spark.multimodal.columns import extract_features

    payload = mp4_bytes(
        mvhd_v0(600, 1200), [video_trak(320, 240, [(30, 20)])]
    )
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    (row,) = extract_features(df).collect()
    assert (row.width, row.height, row.n_frames) == (320, 240, 30)
    assert row.n_bytes == len(payload)
