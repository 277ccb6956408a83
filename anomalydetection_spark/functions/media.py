"""Multimodal payload plumbing: audio / video as opaque binary + metadata.

Images get the full decode/PSNR treatment (image_udfs.py, pure-stdlib
codec). Audio/video codecs are NOT available in this container, so the
decode kernels here are STUBS — but everything Spark-side is real and
tested: schemas, Arrow batch shapes, iterator-UDF signatures, map-only
plan discipline (payload bytes never shuffle), and the deterministic
fake decoder used by tests exercises the identical plumbing.

Swap ``_decode_audio_impl`` / ``_sample_frames_impl`` for soundfile /
PyAV in a real deployment; nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_SCHEMA = (
    "media_id string, bytes binary, codec string, sample_rate int, "
    "n_channels int, duration_ms int"
)
AUDIO_FEATURES_SCHEMA = (
    "media_id string, decode_ok boolean, n_samples int, rms double, "
    "clipping_rate double"
)

VIDEO_SCHEMA = (
    "media_id string, bytes binary, codec string, w int, h int, fps double, "
    "n_frames int"
)
FRAME_SAMPLE_SCHEMA = (
    "media_id string, frame_idx int, frame_png binary, mean_luma double"
)


def _decode_audio_impl(data: bytes, codec: str) -> np.ndarray:
    """Real deployment: soundfile/librosa. Stubbed here."""
    raise NotImplementedError(
        "audio codecs unavailable in this environment; inject a decoder "
        "via audio_features(..., decoder=...)"
    )


def _fake_audio_decoder(data: bytes, codec: str) -> np.ndarray:
    """Deterministic fake: derives a waveform from the payload hash so
    tests exercise the full Arrow path with stable expected values."""
    seed = int.from_bytes(data[:8].ljust(8, b"\0"), "big") % (2**32)
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(1024) * 0.25).astype(np.float32)


def audio_features(audio: DataFrame, decoder=None) -> DataFrame:
    """Map-only feature extraction over the audio bytes column.

    Same plan shape as image decode: narrow select → mapInPandas →
    feature frame; bytes never cross a shuffle boundary."""
    fn = decoder or _decode_audio_impl

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "decode_ok", "n_samples", "rms", "clipping_rate")}
            for mid, data, codec in zip(pdf["media_id"], pdf["bytes"], pdf["codec"]):
                try:
                    wave = fn(bytes(data), codec)
                    out["media_id"].append(mid)
                    out["decode_ok"].append(True)
                    out["n_samples"].append(int(wave.size))
                    out["rms"].append(float(np.sqrt(np.mean(wave**2))))
                    out["clipping_rate"].append(float(np.mean(np.abs(wave) >= 0.999)))
                except NotImplementedError:
                    raise
                except Exception:
                    out["media_id"].append(mid)
                    out["decode_ok"].append(False)
                    out["n_samples"].append(0)
                    out["rms"].append(None)
                    out["clipping_rate"].append(None)
            yield pd.DataFrame(out)

    return audio.select("media_id", "bytes", "codec").mapInPandas(
        kernel, AUDIO_FEATURES_SCHEMA
    )


def _sample_frames_impl(data: bytes, codec: str, n: int) -> list[np.ndarray]:
    """Real deployment: PyAV keyframe sampling. Stubbed here."""
    raise NotImplementedError(
        "video codecs unavailable in this environment; inject a sampler "
        "via sample_frames(..., sampler=...)"
    )


def _fake_frame_sampler(data: bytes, codec: str, n: int) -> list[np.ndarray]:
    seed = int.from_bytes(data[:8].ljust(8, b"\0"), "big") % (2**32)
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(n)]


def sample_frames(video: DataFrame, n_frames: int = 3, sampler=None) -> DataFrame:
    """Uniform frame sampling → one output row per (video, frame).

    Output frames are PNG-encoded with the engine's stdlib codec so the
    image validation suite can consume them downstream unchanged."""
    from anomalydetection_spark.functions.png import encode_png

    fn = sampler or _sample_frames_impl

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "frame_idx", "frame_png", "mean_luma")}
            for mid, data, codec in zip(pdf["media_id"], pdf["bytes"], pdf["codec"]):
                frames = fn(bytes(data), codec, n_frames)
                for i, px in enumerate(frames):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_png"].append(encode_png(px))
                    rows["mean_luma"].append(float(px.mean()))
            yield pd.DataFrame(rows)

    return video.select("media_id", "bytes", "codec").mapInPandas(
        kernel, FRAME_SAMPLE_SCHEMA
    )
