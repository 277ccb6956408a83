"""Structured-Streaming incremental validation + multimodal plumbing."""

import time

import pyspark.sql.functions as F
import pytest

from anomalydetection_spark.checks import ColumnStatsCheck, NotNullCheck
from anomalydetection_spark.functions.media import (
    _fake_audio_decoder,
    _fake_frame_sampler,
    audio_features,
    sample_frames,
)
from anomalydetection_spark.streaming.incremental import validate_stream
from anomalydetection_spark.suite import ValidationSuite
from anomalydetection_spark.synth import IMAGES_SCHEMA, generate_pandas, to_spark


def test_incremental_validation_processes_batches_and_resumes(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pdf, _ = generate_pandas(300, with_payload=False)
    to_spark(spark, pdf.iloc[:150]).write.mode("overwrite").parquet(inp)

    suite = ValidationSuite(
        [ColumnStatsCheck("w"), NotNullCheck("image_id")], table_name="images"
    )
    q = validate_stream(spark, inp, IMAGES_SCHEMA, suite, out, ckpt)
    q.awaitTermination(120)
    v1 = spark.read.parquet(f"{out}/verdicts")
    batches1 = {r["batch_id"] for r in v1.select("batch_id").distinct().collect()}
    assert len(batches1) >= 1
    n1 = v1.count()

    # new files arrive; availableNow processes ONLY them on restart
    to_spark(spark, pdf.iloc[150:]).write.mode("append").parquet(inp)
    q2 = validate_stream(spark, inp, IMAGES_SCHEMA, suite, out, ckpt)
    q2.awaitTermination(120)
    v2 = spark.read.parquet(f"{out}/verdicts")
    assert v2.count() > n1
    assert len({r["batch_id"] for r in v2.select("batch_id").distinct().collect()}) > len(batches1)


def test_audio_features_plumbing(spark):
    rows = [(f"a{i}", bytes([i]) * 64, "wav", 16000, 1, 1000) for i in range(10)]
    audio = spark.createDataFrame(
        rows,
        "media_id string, bytes binary, codec string, sample_rate int, "
        "n_channels int, duration_ms int",
    )
    feats = audio_features(audio, decoder=_fake_audio_decoder).collect()
    assert len(feats) == 10
    for r in feats:
        assert r["decode_ok"] and r["n_samples"] == 1024
        assert 0.0 < r["rms"] < 1.0
    # determinism: same bytes → same features
    again = audio_features(audio, decoder=_fake_audio_decoder).collect()
    assert {(r["media_id"], r["rms"]) for r in feats} == \
           {(r["media_id"], r["rms"]) for r in again}


def test_audio_default_decoder_is_explicit_stub(spark):
    audio = spark.createDataFrame(
        [("a0", b"xx" * 8, "wav", 16000, 1, 10)],
        "media_id string, bytes binary, codec string, sample_rate int, "
        "n_channels int, duration_ms int",
    )
    with pytest.raises(Exception, match="(?i)audio codecs unavailable"):
        audio_features(audio).collect()


def test_frame_sampling_feeds_image_suite(spark):
    from anomalydetection_spark.functions.png import decode_image

    video = spark.createDataFrame(
        [(f"v{i}", bytes([i + 1]) * 32, "h264", 640, 360, 24.0, 240) for i in range(4)],
        "media_id string, bytes binary, codec string, w int, h int, fps double, n_frames int",
    )
    frames = sample_frames(video, n_frames=3, sampler=_fake_frame_sampler).collect()
    assert len(frames) == 12
    px = decode_image(bytes(frames[0]["frame_png"]), "png")
    assert px.shape == (16, 16, 3)  # PNG round-trips through the real codec
