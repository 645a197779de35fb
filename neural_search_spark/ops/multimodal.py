"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

One REAL decode path exists dependency-free: RIFF/WAVE PCM audio
(parse_wav → wav_features — pure numpy: header walk, 8/16-bit PCM,
multi-channel downmix, time+band-energy features). Other formats' kernels
remain STUBBED (no image/video libraries in this container — the stub
raises NotImplementedError unless the deterministic fake is requested);
the Spark-side contract — schemas, batch shapes, partition behavior, UDF
signatures — is identical for both and fully tested.

Reference anchor: the reference's text_image_embedding processor accepts an
image as a base64 string field next to text (processor/
TextImageEmbeddingProcessor.java) — i.e. media rides in the document as an
opaque payload, exactly as modeled here.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def real_decode_stub(payload: bytes, mime: str) -> np.ndarray:
    """Placeholder for a real decoder (PIL/libav/ffmpeg) — NOT available in
    this container."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in this "
        "environment; use deterministic_fake_features or plug a decoder in"
    )


WAV_MIMES = {"audio/wav", "audio/x-wav", "audio/wave", "x/wav"}
WAV_FEATURE_DIM = 8  # [duration_s, rms, zcr, peak, band0..band3]


def parse_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Minimal dependency-free RIFF/WAVE PCM parser: (sample_rate, mono
    float32 waveform in [-1, 1]). Walks the chunk list (word-aligned, extra
    chunks like LIST/fact skipped), supports uncompressed PCM (format tag
    1) at 8 or 16 bits, any channel count (channels averaged to mono).
    Raises ValueError on anything else — malformed media at 100 TB scale is
    routine, and the Arrow-batch caller turns that into a null/skip, never
    a task failure."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError("missing fmt/data chunk")
    tag = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    sr = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if tag != 1 or bits not in (8, 16) or n_ch < 1 or sr <= 0:
        raise ValueError(f"unsupported WAV: tag={tag} bits={bits} ch={n_ch} sr={sr}")
    if bits == 16:
        x = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(np.float32) / 32768.0
    else:  # 8-bit WAV PCM is unsigned
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    if n_ch > 1:
        x = x[: len(x) // n_ch * n_ch].reshape(-1, n_ch).mean(axis=1)
    return sr, x


def wav_features(payload: bytes, mime: str = "audio/wav") -> np.ndarray:
    """WAV payload → WAV_FEATURE_DIM float32 features: duration (s), RMS
    energy, zero-crossing rate, peak amplitude, and the energy fraction in
    4 log-spaced frequency bands of the power spectrum. All numpy — runs
    vectorized inside the extract_features Arrow batches."""
    sr, x = parse_wav(payload)
    n = len(x)
    if n == 0:
        return np.zeros(WAV_FEATURE_DIM, dtype=np.float32)
    dur = n / float(sr)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    peak = float(np.max(np.abs(x)))
    spec = np.abs(np.fft.rfft(x)) ** 2
    spec[0] = 0.0  # drop DC so band fractions reflect oscillatory content
    total = float(spec.sum())
    bands = []
    nb = len(spec)
    # log-spaced band edges over the rfft bins: [1, n^(1/4)], … , [n^(3/4), n]
    edges = [1] + [max(1, int(round(nb ** (q / 4.0)))) for q in (1, 2, 3)] + [nb]
    for lo, hi in zip(edges[:-1], edges[1:]):
        e = float(spec[lo:hi].sum()) / total if total > 0 else 0.0
        bands.append(e)
    return np.array([dur, rms, zcr, peak, *bands], dtype=np.float32)


def media_decode_features(payload: bytes, mime: str) -> np.ndarray:
    """Dispatching decode kernel for extract_features: WAV audio decodes
    for real (pure numpy); every other mime keeps the declared stub path
    (no media libraries in this container)."""
    if (mime or "").lower() in WAV_MIMES:
        return wav_features(payload, mime)
    return real_decode_stub(payload, mime)


def make_wav_bytes(
    freq_hz: float = 440.0,
    duration_s: float = 0.25,
    sample_rate: int = 8000,
    n_channels: int = 1,
    amplitude: float = 0.5,
    bits: int = 16,
) -> bytes:
    """Synthesize a valid PCM WAV (sine tone) for tests/fixtures — the
    encoder mirror of parse_wav, also dependency-free."""
    import struct

    n = int(round(duration_s * sample_rate))
    t = np.arange(n, dtype=np.float64) / sample_rate
    wave = amplitude * np.sin(2.0 * np.pi * freq_hz * t)
    if bits == 16:
        frames = np.repeat((wave * 32767.0).astype("<i2"), n_channels).tobytes()
        bytes_per_sample = 2
    elif bits == 8:
        frames = np.repeat(np.round(wave * 127.0 + 128.0).astype(np.uint8), n_channels).tobytes()
        bytes_per_sample = 1
    else:
        raise ValueError("bits must be 8 or 16")
    block_align = n_channels * bytes_per_sample
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align, block_align, bits
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(frames)) + frames
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def deterministic_fake_features(payload: bytes, mime: str, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in feature extractor: bytes → fixed-dim float32
    vector via a rolling byte histogram. Lets the full pipeline (schema,
    partitioning, batching, downstream similarity search) run and be tested
    end-to-end without media libraries."""
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    norm = np.linalg.norm(hist)
    return hist / norm if norm > 0 else hist


def extract_features(
    media: DataFrame,
    kernel: Callable[[bytes, str], np.ndarray] = real_decode_stub,
    batch_kind: str | None = None,
    skip_malformed: bool = False,
) -> DataFrame:
    """media table → (media_id, feature). The kernel runs inside Arrow
    batches (mapInPandas); filtering by kind happens BEFORE the Python
    boundary so pruned rows never cross into Python.

    `skip_malformed=True` drops rows whose kernel raises ValueError
    (truncated/corrupt payloads are routine at 100 TB — a bad row must
    cost one row, not a task retry storm); decode bugs other than
    malformed input still surface as failures."""
    if batch_kind is not None:
        media = media.where(F.col("kind") == batch_kind)
    media = media.select("media_id", "mime", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if batch.empty:
                continue
            ids, feats = [], []
            for mid, p, m in zip(batch["media_id"], batch["payload"], batch["mime"]):
                try:
                    f = kernel(p if p is not None else b"", m or "")
                except ValueError:
                    if skip_malformed:
                        continue
                    raise
                ids.append(mid)
                feats.append(f.tolist())
            if ids:
                yield pd.DataFrame({"media_id": ids, "feature": feats})

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthesize_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: payload = repeatable bytes
    derived from the row id."""
    df = spark.range(0, n)
    i = F.col("id")
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (i % 3 + 1).cast("int"))
    payload = F.sha2(F.concat(F.lit(str(seed)), i.cast("string")), 256).cast("binary")
    return df.select(
        i.alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("x/"), kind).alias("mime"),
        payload.alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (i * 100).cast("int").alias("duration_ms"),
    )
