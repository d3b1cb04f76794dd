"""Audio columns (SURVEY §2.F): REAL RIFF/WAVE decode, stdlib+numpy.

A WAV payload is fully decodable without any media library: the RIFF
container is length-prefixed chunks; `fmt ` carries channels / sample
rate / bit depth, `data` carries raw PCM that numpy reinterprets with
one `frombuffer` call. So unlike compressed codecs (which stay behind
the decoder seam), audio features here are computed from true samples:
RMS energy, zero-crossing rate, peak amplitude — the standard cheap
speech/music screening features of a pretraining audio pipeline.

Non-WAV payloads (the synthetic utf-8 corpus) get a deterministic
md5-derived fallback, mirroring ``decode_image`` — which keeps the
inventory entry DuckDB-oracle-checkable end-to-end while the real
path is pytest-verified on stdlib-`wave`-written bytes.

Scale shape: identical to image features — Arrow-batched
``mapInPandas``, one streaming pass, zero shuffle, features
parallelize per input split.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_FEATURE_SCHEMA = (
    "doc_id long, kind string, n_channels int, sample_rate int, "
    "n_samples long, duration_s double, rms double, zcr double, peak double"
)

_PCM_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def parse_wav(payload: bytes) -> tuple[int, int, int, np.ndarray] | None:
    """(n_channels, sample_rate, bits, mono_float_samples) from real
    RIFF/WAVE bytes, or None if the payload is not parseable WAV.

    Walks the chunk list (chunks are NOT at fixed offsets — encoders
    put LIST/fact chunks before `data`), accepts PCM (format tag 1)
    at 8/16/32 bits, mixes to mono in float64 normalized to [-1, 1].
    """
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    n_channels = sample_rate = bits = None
    data = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (clen,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            fmt_tag, n_channels, sample_rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt_tag != 1:  # non-PCM (float/ADPCM/…): behind the seam
                return None
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if not (n_channels and sample_rate and bits in _PCM_DTYPES and data is not None):
        return None
    raw = np.frombuffer(data[: len(data) - len(data) % ((bits // 8) * n_channels)],
                        dtype=_PCM_DTYPES[bits])
    if raw.size == 0:
        return n_channels, sample_rate, bits, np.zeros(0)
    x = raw.astype(np.float64)
    if bits == 8:  # unsigned, midpoint 128
        x = (x - 128.0) / 128.0
    else:
        x = x / float(2 ** (bits - 1))
    mono = x.reshape(-1, n_channels).mean(axis=1)
    return n_channels, sample_rate, bits, mono


def _features_from_samples(mono: np.ndarray, sample_rate: int) -> tuple:
    n = int(mono.size)
    if n == 0:
        return 0, 0.0, 0.0, 0.0, 0.0
    rms = float(np.sqrt(np.mean(mono * mono)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    peak = float(np.max(np.abs(mono)))
    return n, n / sample_rate, rms, zcr, peak


def _fallback_features(payload: bytes) -> tuple:
    """Deterministic md5-derived pseudo-features for non-audio payloads
    (same convention as decode_image's fallback — reproducible in any
    engine from the bytes alone, so the inventory entry stays
    oracle-checkable on the synthetic corpus)."""
    h = hashlib.md5(payload).digest()
    n_channels = 1 + h[0] % 2
    sample_rate = 8000 + 100 * (h[1] % 81)  # 8000..16000 Hz
    n_samples = 4 * len(payload)
    # plain IEEE divisions — bit-identical in any engine, no rounding
    # (round() here would hit Python-half-even vs SQL-half-away skew)
    duration = n_samples / sample_rate
    rms = ((h[2] << 8 | h[3]) % 1000) / 1000.0
    zcr = ((h[3] << 8 | h[4]) % 500) / 1000.0
    peak = ((h[4] << 8 | h[5]) % 1000) / 1000.0
    return n_channels, sample_rate, n_samples, duration, rms, zcr, peak


def extract_audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched audio feature extraction over binary payloads —
    real decoded-PCM features for WAV, deterministic fallback
    otherwise. No shuffle; bounded memory (one Arrow batch of
    payloads at a time)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "kind", "n_channels", "sample_rate", "n_samples",
                "duration_s", "rms", "zcr", "peak"]
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(payload)
                parsed = parse_wav(raw)
                if parsed is not None:
                    ch, sr, _bits, mono = parsed
                    n, dur, rms, zcr, peak = _features_from_samples(mono, sr)
                    rows.append((int(doc_id), "wav", ch, sr, n, dur, rms, zcr, peak))
                else:
                    ch, sr, n, dur, rms, zcr, peak = _fallback_features(raw)
                    rows.append((int(doc_id), "synthetic", ch, sr, n, dur, rms, zcr, peak))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, "payload").mapInPandas(extract, schema=AUDIO_FEATURE_SCHEMA)


# -- constellation fingerprinting (SURVEY §2.F audio matching) ---------
#
# Shazam-style landmark hashing (Wang 2003): STFT magnitude peaks
# form a sparse constellation; (anchor_bin, target_bin, Δframe)
# triples hash into compact integers that survive noise and offset.
# Matching assets is then a BUCKETED EQUI-JOIN on hash — the LSH
# shape, never an all-pairs signal comparison.

FP_FRAME = 1024
FP_HOP = 512
FP_PEAKS = 3
FP_FANOUT = 3


def fingerprint_samples(mono: np.ndarray, sample_rate: int) -> list[int]:
    """Landmark hashes from mono float samples. Deterministic: peak
    bins tie-break toward the lower bin; hash packs
    (b1 << 13) | (b2 << 3) | dt with 10-bit bins (rfft of a
    1024-sample frame yields bins 0..512, so 9 bits would alias the
    Nyquist bin into the anchor field) and 2-bit dt."""
    n = len(mono)
    if n < FP_FRAME:
        return []
    peaks: list[list[int]] = []
    for start in range(0, n - FP_FRAME + 1, FP_HOP):
        frame = mono[start : start + FP_FRAME]
        mag = np.abs(np.fft.rfft(frame * np.hanning(FP_FRAME)))
        # top-K by magnitude, ties toward lower bin: sort by
        # (-mag, bin) via stable argsort on -mag
        order = np.argsort(-mag, kind="stable")[:FP_PEAKS]
        peaks.append(sorted(int(b) for b in order))
    hashes: list[int] = []
    for i, anchor_bins in enumerate(peaks):
        for dt in range(1, FP_FANOUT + 1):
            if i + dt >= len(peaks):
                break
            for b1 in anchor_bins:
                for b2 in peaks[i + dt]:
                    hashes.append((b1 << 13) | (b2 << 3) | dt)
    return hashes


def _fallback_hashes(payload: bytes) -> list[int]:
    """Content-derived fingerprint for non-WAV payloads: md5 of each
    4-byte-aligned 16-byte shingle, 8 smallest kept — duplicate-ish
    payloads share hashes, so the bucketed matcher is exercised
    end-to-end on the synthetic corpus."""
    hs = set()
    for off in range(0, max(len(payload) - 16, 0) + 1, 4):
        h = hashlib.md5(payload[off : off + 16]).hexdigest()[:8]
        hs.add(int(h, 16) & 0x7FFFFF)
    return sorted(hs)[:8]


def fingerprint_hashes(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, hash) landmark rows per asset — real STFT constellation
    for WAV payloads, content shingle hashes otherwise."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids: list[int] = []
            out_hashes: list[int] = []
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col])
                parsed = parse_wav(payload)
                if parsed is not None:
                    _nc, sr, _bits, mono = parsed
                    hs = fingerprint_samples(mono, sr)
                else:
                    hs = _fallback_hashes(payload)
                for h in hs:
                    out_ids.append(int(row[id_col]))
                    out_hashes.append(h)
            yield pd.DataFrame({"id": out_ids, "hash": out_hashes})

    return df.mapInPandas(extract, schema="id long, hash long")


def match_by_fingerprint(
    hashes: DataFrame, min_shared: int = 4, max_bucket: int = 64
) -> DataFrame:
    """Pairs of assets sharing >= min_shared landmark hashes.

    Bucketed join on the hash value (distinct per asset first so a
    repeated landmark inside one asset counts once); buckets larger
    than ``max_bucket`` assets are dropped as degenerate (the
    stop-hash guard — the dedup `max_shingle_df` discipline)."""
    from pyspark.sql import functions as F

    h = hashes.distinct()
    df_per_hash = h.groupBy("hash").agg(F.count(F.lit(1)).alias("nb"))
    kept = h.join(
        F.broadcast(
            df_per_hash.filter(F.col("nb") <= max_bucket).select("hash")
        ),
        "hash",
    )
    a = kept.select("hash", F.col("id").alias("id_a"))
    b = kept.select("hash", F.col("id").alias("id_b"))
    return (
        a.join(b, "hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
