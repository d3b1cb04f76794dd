"""Constellation audio fingerprinting: real-WAV landmark hashes and
the bucketed matcher (the correctness evidence for the rows-only
mm_audio_match entry, per its SURVEY §2 tag)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

from redmap_spark.multimodal.audio import (
    fingerprint_samples,
    fingerprint_hashes,
    match_by_fingerprint,
    parse_wav,
)


def _wav_bytes(samples: np.ndarray, sr: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2")
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _tone_seq(freqs, sr: int = 8000, dur: float = 0.4) -> np.ndarray:
    t = np.arange(int(sr * dur)) / sr
    return np.concatenate([0.8 * np.sin(2 * np.pi * f * t) for f in freqs])


def test_identical_clips_share_all_hashes():
    s = _tone_seq([440, 880, 660])
    h1 = fingerprint_samples(s, 8000)
    h2 = fingerprint_samples(s.copy(), 8000)
    assert h1 and h1 == h2


def test_different_clips_share_few_hashes():
    a = set(fingerprint_samples(_tone_seq([440, 880, 660]), 8000))
    b = set(fingerprint_samples(_tone_seq([523, 1047, 784]), 8000))
    assert a and b
    # distinct tone stacks produce mostly disjoint landmark sets
    assert len(a & b) < min(len(a), len(b)) / 4


def test_hash_packing_bounds():
    for h in fingerprint_samples(_tone_seq([440, 880]), 8000):
        assert 0 <= h < (1 << 21)
        dt = h & 0b111
        assert 1 <= dt <= 3


def test_wav_roundtrip_through_parse():
    s = _tone_seq([440])
    parsed = parse_wav(_wav_bytes(s))
    assert parsed is not None
    nc, sr, bits, mono = parsed
    assert (nc, sr, bits) == (1, 8000, 16)
    assert abs(len(mono) - len(s)) <= 1


def test_matcher_finds_shared_clip_pairs(spark):
    shared = _tone_seq([440, 880, 660, 550])
    other = _tone_seq([523, 1047, 784, 622])
    rows = [
        (1, bytearray(_wav_bytes(shared))),
        (2, bytearray(_wav_bytes(shared))),  # duplicate of 1
        (3, bytearray(_wav_bytes(other))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = fingerprint_hashes(df)
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in match_by_fingerprint(hashes, min_shared=4).collect()
    }
    assert (1, 2) in got
    assert got[(1, 2)] >= 4
    assert (1, 3) not in got and (2, 3) not in got


def test_inventory_entry_runs(spark):
    from redmap_spark.inventory import QUERIES
    from tests.conftest import SF_DIR

    df = QUERIES["mm_audio_match"](spark, SF_DIR)
    rows = df.collect()
    for r in rows:
        assert r.id_a < r.id_b
        assert r.n_shared >= 4


def test_landmark_hash_fields_do_not_alias():
    """rfft of a 1024-sample frame yields bins 0..512 (10 bits): the
    (b1 << 13) | (b2 << 3) | dt packing must keep a Nyquist-bin
    target (b2=512) distinct from the next anchor's (b1+1, b2=0, dt)
    — the 12-bit shift used previously collapsed exactly that pair."""
    seen = {}
    for b1 in (0, 1, 511, 512):
        for b2 in (0, 1, 511, 512):
            for dt in (1, 2, 3):
                h = (b1 << 13) | (b2 << 3) | dt
                assert h not in seen, f"collision: {(b1, b2, dt)} vs {seen[h]}"
                seen[h] = (b1, b2, dt)
