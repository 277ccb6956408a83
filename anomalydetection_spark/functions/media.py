"""Multimodal payload plumbing: audio / video as opaque binary + metadata.

Images get the full decode/PSNR treatment (image_udfs.py, pure-stdlib
codec). For audio, uncompressed PCM WAV decodes FOR REAL through the
stdlib ``wave`` parser (``_decode_wav_int`` — 8/16/24/32-bit PCM, any
channel count); compressed audio and all video codecs are NOT available
in this container, so those kernels stay injectable seams — but
everything Spark-side is real and tested: schemas, Arrow batch shapes,
iterator-UDF signatures, map-only plan discipline (payload bytes never
shuffle), and the deterministic fake decoder used by tests exercises
the identical plumbing.

Swap ``_decode_audio_impl``'s compressed branch / ``_sample_frames_impl``
for soundfile / PyAV in a real deployment; nothing else changes.
"""

from __future__ import annotations

import io
import wave
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


#: Exact tags routed to the stdlib WAV parser; any other tag STARTING
#: with "pcm" also routes there (pcm_u8 / pcm_s24le / pcm_s32le ... —
#: the fmt chunk, not the tag, carries the real sample width).
_WAV_CODECS = {"wav", "wave", "pcm", "pcm_s16le"}
#: Tags that unambiguously mean a compressed codec: NEVER sniffed —
#: an explicit compressed tag over a RIFF payload (WebP/AVI are RIFF
#: too) is a loud misconfiguration, not a WAV (ADVICE r04).
_COMPRESSED_CODECS = {
    "mp3", "aac", "opus", "flac", "ogg", "vorbis", "m4a", "wma", "amr",
}


def _decode_wav_int(data: bytes) -> tuple[np.ndarray, int, int]:
    """Parse PCM WAV bytes (stdlib ``wave``) → (frames int32 array of
    shape [n_frames, n_channels] at the ORIGINAL integer scale,
    sample_rate, sample_width_bytes). 8-bit WAV is unsigned per the RIFF
    spec and is re-centred to signed; 24-bit is widened manually
    (numpy has no 3-byte dtype). Raises ``wave.Error`` on non-PCM or
    malformed payloads — callers map that to decode_ok=False."""
    with wave.open(io.BytesIO(data), "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 1:
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    elif width == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        arr = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        arr = np.where(arr >= (1 << 23), arr - (1 << 24), arr)
    elif width == 4:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.int32)
    else:
        raise wave.Error(f"unsupported sample width {width}")
    return arr.reshape(-1, n_ch), rate, width


def _decode_audio_impl(data: bytes, codec: str) -> np.ndarray:
    """Default decoder: REAL for PCM WAV (stdlib parser — no external
    codec needed), normalized to float32 in [−1, 1] and averaged to
    mono. Compressed formats (mp3/opus/flac/...) still need an injected
    decoder (soundfile/librosa in a real deployment).

    The RIFF magic-byte sniff applies when the codec tag is empty or
    unknown (ADVICE r04): an explicit COMPRESSED codec like 'mp3' keeps
    the loud NotImplementedError even if the payload happens to be a
    RIFF container (WebP/AVI are RIFF too) — feeding it to the wave
    parser would turn an obvious misconfiguration into a quiet
    decode_ok=False, or a silent decode for RIFF-wrapped PCM
    misdeclared as compressed. Any ``pcm*`` tag routes to the parser
    directly (the fmt chunk carries the true sample width)."""
    tag = (codec or "").strip().lower()
    if (tag in _WAV_CODECS or tag.startswith("pcm")
            or (tag not in _COMPRESSED_CODECS and data[:4] == b"RIFF")):
        frames, _rate, width = _decode_wav_int(data)
        full = 1 << (8 * width - 1)
        return (frames.mean(axis=1) / float(full)).astype(np.float32)
    raise NotImplementedError(
        f"audio codec {codec!r} unavailable in this environment; inject "
        "a decoder via audio_features(..., decoder=...)"
    )


def pcm16_wav_bytes(samples: np.ndarray, sample_rate: int = 8000,
                    n_channels: int = 1) -> bytes:
    """Hand-assembled RIFF/WAVE container around int16 PCM samples —
    built with manual byte layout (NOT the ``wave`` writer) so tests
    and gates that decode with the stdlib parser are not circular."""
    import struct

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    block = 2 * n_channels
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate,
        sample_rate * block, block, 16,
    )
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    return struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data),
                       b"WAVE") + fmt + data


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


AUDIO_INT_FEATURES_SCHEMA = (
    "media_id string, n_frames long, sample_rate long, max_abs long, "
    "sum_abs long, n_clipped long"
)


def audio_wav_int_features(audio: DataFrame) -> DataFrame:
    """Map-only WAV feature extraction at the RAW integer PCM scale,
    decoding through the real stdlib parser: (media_id, n_frames,
    sample_rate, max_abs, sum_abs, n_clipped) with n_clipped counting
    samples at full scale (|s| ≥ 2^(bits−1) − 1). All-integer outputs —
    bit-exact on any engine, which is what lets the WAV codec path be
    driver-gated against a SQL oracle instead of pytest-only. Same plan
    shape as every media kernel: narrow select → mapInPandas; bytes
    never cross a shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "n_frames", "sample_rate",
                                   "max_abs", "sum_abs", "n_clipped")}
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                frames, rate, width = _decode_wav_int(bytes(data))
                a = np.abs(frames.astype(np.int64))
                clip = (1 << (8 * width - 1)) - 1
                out["media_id"].append(mid)
                out["n_frames"].append(int(frames.shape[0]))
                out["sample_rate"].append(int(rate))
                out["max_abs"].append(int(a.max()) if a.size else 0)
                out["sum_abs"].append(int(a.sum()))
                out["n_clipped"].append(int((a >= clip).sum()))
            yield pd.DataFrame(out)

    return audio.select("media_id", "bytes").mapInPandas(
        kernel, AUDIO_INT_FEATURES_SCHEMA
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
