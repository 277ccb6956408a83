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


def test_audio_default_decoder_decodes_real_wav(spark):
    """VERDICT r03 #7: PCM WAV is pure-stdlib, so the DEFAULT decoder is
    real for it — a hand-assembled (struct-packed, not wave-written)
    RIFF container round-trips through the stdlib parser with exact
    features: a ±16384 square wave at 16-bit full scale 32768 has RMS
    exactly 0.5; the integer kernel reproduces raw-scale sums; stereo
    averages to mono; clipping at full scale is counted."""
    import numpy as np

    from anomalydetection_spark.functions.media import (
        audio_wav_int_features,
        pcm16_wav_bytes,
    )

    sq = np.tile(np.array([16384, -16384], dtype=np.int16), 512)
    st = np.ravel(np.column_stack([np.full(256, 8192, dtype=np.int16),
                                   np.full(256, 24576, dtype=np.int16)]))
    cl = np.array([32767, -32768, 100, -100], dtype=np.int16)
    rows = [
        ("mono_sq", pcm16_wav_bytes(sq, 8000), "wav", 8000, 1, 128),
        ("stereo", pcm16_wav_bytes(st, 16000, n_channels=2), "wav", 16000, 2, 16),
        ("clipped", pcm16_wav_bytes(cl, 8000), "wav", 8000, 1, 1),
    ]
    audio = spark.createDataFrame(
        rows,
        "media_id string, bytes binary, codec string, sample_rate int, "
        "n_channels int, duration_ms int",
    )
    feats = {r["media_id"]: r for r in audio_features(audio).collect()}
    assert feats["mono_sq"]["decode_ok"]
    assert feats["mono_sq"]["n_samples"] == 1024
    assert feats["mono_sq"]["rms"] == pytest.approx(0.5, abs=1e-7)
    # stereo mono-mean: (8192 + 24576)/2 / 32768 = 0.5 every frame
    assert feats["stereo"]["n_samples"] == 256
    assert feats["stereo"]["rms"] == pytest.approx(0.5, abs=1e-7)
    assert feats["clipped"]["clipping_rate"] == pytest.approx(0.5)

    ints = {r["media_id"]: r for r in audio_wav_int_features(audio).collect()}
    assert ints["mono_sq"]["n_frames"] == 1024
    assert ints["mono_sq"]["sample_rate"] == 8000
    assert ints["mono_sq"]["max_abs"] == 16384
    assert ints["mono_sq"]["sum_abs"] == 16384 * 1024
    assert ints["mono_sq"]["n_clipped"] == 0
    assert ints["clipped"]["n_clipped"] == 2
    assert ints["stereo"]["n_frames"] == 256 and ints["stereo"]["sum_abs"] \
        == (8192 + 24576) * 256


def test_audio_default_decoder_corrupt_wav_and_compressed_codecs(spark):
    """Corrupt WAV bytes degrade to decode_ok=False (per-row, the batch
    survives); compressed codecs still fail loudly — they need an
    injected decoder, and silently fake-decoding them would be worse."""
    from anomalydetection_spark.functions.media import pcm16_wav_bytes
    import numpy as np

    good = pcm16_wav_bytes(np.array([1, -1], dtype=np.int16), 8000)
    audio = spark.createDataFrame(
        [("bad", b"RIFFxxxx" * 4, "wav", 16000, 1, 10),
         ("good", good, "wav", 8000, 1, 1)],
        "media_id string, bytes binary, codec string, sample_rate int, "
        "n_channels int, duration_ms int",
    )
    got = {r["media_id"]: r for r in audio_features(audio).collect()}
    assert not got["bad"]["decode_ok"] and got["bad"]["rms"] is None
    assert got["good"]["decode_ok"]

    mp3 = spark.createDataFrame(
        [("a0", b"\xff\xfb" * 16, "mp3", 44100, 2, 10)],
        "media_id string, bytes binary, codec string, sample_rate int, "
        "n_channels int, duration_ms int",
    )
    with pytest.raises(Exception, match="(?i)codec 'mp3' unavailable"):
        audio_features(mp3).collect()


def test_riff_sniff_does_not_override_explicit_codec(spark):
    """ADVICE r04: a row explicitly tagged codec='mp3' whose payload
    happens to be a RIFF container (WebP/AVI are RIFF too) must keep the
    loud NotImplementedError path — sniffing it into the wave parser
    would turn a misconfiguration into a silent decode or a quiet
    decode_ok=False. The sniff applies to empty/NULL and UNKNOWN tags;
    pcm* variants route to the parser directly (review r05: the fmt
    chunk, not the tag, carries the real sample width)."""
    from anomalydetection_spark.functions.media import pcm16_wav_bytes
    import numpy as np

    riff = pcm16_wav_bytes(np.array([1000, -1000], dtype=np.int16), 8000)
    schema = ("media_id string, bytes binary, codec string, "
              "sample_rate int, n_channels int, duration_ms int")
    mislabeled = spark.createDataFrame(
        [("m0", riff, "mp3", 8000, 1, 1)], schema
    )
    with pytest.raises(Exception, match="(?i)codec 'mp3' unavailable"):
        audio_features(mislabeled).collect()
    untagged = spark.createDataFrame(
        [("u0", riff, None, 8000, 1, 1), ("u1", riff, "", 8000, 1, 1)],
        schema,
    )
    got = {r["media_id"]: r for r in audio_features(untagged).collect()}
    assert got["u0"]["decode_ok"] and got["u1"]["decode_ok"]
    # pcm-family tags not in the exact set route to the parser (the fmt
    # chunk defines the width); unknown non-compressed tags are sniffed
    pcmish = spark.createDataFrame(
        [("p0", riff, "pcm_s24le", 8000, 1, 1),
         ("p1", riff, "x-custom", 8000, 1, 1)],
        schema,
    )
    got2 = {r["media_id"]: r for r in audio_features(pcmish).collect()}
    assert got2["p0"]["decode_ok"] and got2["p1"]["decode_ok"]


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


def test_stateful_running_stats_accumulate_across_batches_and_restart(spark, tmp_path):
    from anomalydetection_spark.streaming.incremental import (
        RUNNING_STATS_OUT,
        running_column_stats_stream,
    )

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def write_batch(name, rows):
        spark.createDataFrame(rows, "fmt string, w int").coalesce(1) \
            .write.mode("overwrite").parquet(str(src / name))

    sink = str(tmp_path / "sink")

    def run_query():
        stream = spark.readStream.schema("fmt string, w int").option(
            "maxFilesPerTrigger", "100"
        ).parquet(str(src) + "/*")
        out = running_column_stats_stream(stream, "fmt", "w")

        def write(batch_df, batch_id):
            batch_df.write.mode("append").parquet(sink)

        q = (
            out.writeStream.foreachBatch(write)
            .outputMode("update").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        # last update per group wins (the one with the highest cnt)
        return {
            r["group"]: r
            for r in spark.read.parquet(sink).orderBy("cnt").collect()
        }

    write_batch("b1", [("png", 10), ("png", 20), ("jpeg", 4)])
    first = run_query()
    assert first["png"]["cnt"] == 2 and first["png"]["mean"] == 15.0
    assert first["jpeg"]["cnt"] == 1

    # restart with the SAME checkpoint: state must resume, not reset
    write_batch("b2", [("png", 30), ("jpeg", 6)])
    second = run_query()
    assert second["png"]["cnt"] == 3 and second["png"]["mean"] == 20.0
    assert second["png"]["mn"] == 10.0 and second["png"]["mx"] == 30.0
    assert second["jpeg"]["cnt"] == 2 and second["jpeg"]["mean"] == 5.0
    # merge-form variance matches the exact batch computation
    assert abs(second["png"]["var"] - 100.0) < 1e-9


def test_stream_micro_batches_refit_models_per_batch(spark, tmp_path):
    """ADVICE r01 (high): a reused suite must not score batch N against
    batch 1's fitted robust-z model. Two single-file micro-batches with
    shifted distributions: each batch's median verdict reflects its own
    data (reset() at the start of every run)."""
    import pyspark.sql.functions as F2

    from anomalydetection_spark.checks import RobustZScoreCheck
    from anomalydetection_spark.streaming.incremental import validate_stream
    from anomalydetection_spark.suite import ValidationSuite

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    suite = ValidationSuite([RobustZScoreCheck("w", keys=["image_id"])], "t")
    schema = "image_id string, w int"

    b1 = spark.createDataFrame(
        [(f"a{i}", 100 + i % 5) for i in range(300)], schema)
    b1.coalesce(1).write.mode("overwrite").parquet(inp)
    validate_stream(spark, inp, schema, suite, out, ckpt,
                    max_files_per_trigger=1).awaitTermination()

    b2 = spark.createDataFrame(
        [(f"b{i}", 9000 + i % 5) for i in range(300)], schema)
    b2.coalesce(1).write.mode("append").parquet(inp)
    validate_stream(spark, inp, schema, suite, out, ckpt,
                    max_files_per_trigger=1).awaitTermination()

    v = spark.read.parquet(f"{out}/verdicts")
    med = {r["batch_id"]: r["value"] for r in
           v.filter(F2.col("metric") == "median").collect()}
    assert len(med) == 2
    assert min(med.values()) < 200 and max(med.values()) > 8000


def test_dedup_stream_drops_duplicates_across_batches_and_restart(spark, tmp_path):
    """Streaming exact dedup: each image_id is emitted once across
    micro-batches AND across restarts (state lives in the streaming
    checkpoint's state store)."""
    from anomalydetection_spark.streaming.incremental import dedup_stream

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # the synth table itself plants ~0.1% duplicate ids, so expected
    # counts are DISTINCT ids in each drop, not raw row counts
    pdf, _ = generate_pandas(200, with_payload=False)
    # first drop: rows 0-99 plus exact duplicates of the first 30
    first = pdf.iloc[:100]
    n_first = first["image_id"].nunique()
    to_spark(spark, first).write.mode("overwrite").parquet(inp)
    to_spark(spark, first.iloc[:30]).write.mode("append").parquet(inp)

    q = dedup_stream(spark, inp, IMAGES_SCHEMA, ["image_id"], out, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out)
    assert got1.count() == n_first
    assert got1.select("image_id").distinct().count() == n_first

    # second drop: ~50 already-seen keys + ~100 new ones; restart emits
    # ONLY the never-seen keys (dedup state survived the restart)
    n_all = pdf["image_id"].nunique()
    to_spark(spark, pdf.iloc[50:]).write.mode("append").parquet(inp)
    q2 = dedup_stream(spark, inp, IMAGES_SCHEMA, ["image_id"], out, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out)
    assert got2.count() == n_all
    assert got2.select("image_id").distinct().count() == n_all


def test_dedup_stream_watermarked_state_expiry_shape(spark, tmp_path):
    """The bounded-state form: dropDuplicatesWithinWatermark keyed on
    image_id with an event-time watermark — the only shape whose state
    does not grow with every distinct key ever seen. Verifies duplicates
    inside the watermark window are dropped and the plan carries the
    watermark + within-watermark dedup operators."""
    from anomalydetection_spark.streaming.incremental import dedup_stream

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pdf, _ = generate_pandas(60, with_payload=False)
    n_keys = pdf.iloc[:40]["image_id"].nunique()
    sdf = to_spark(spark, pdf.iloc[:40]).withColumn(
        "event_ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    sdf.write.mode("overwrite").parquet(inp)
    # duplicates of 10 keys, 1 minute later (inside the watermark)
    dup = to_spark(spark, pdf.iloc[:10]).withColumn(
        "event_ts", F.to_timestamp(F.lit("2026-01-01 00:01:00")))
    dup.write.mode("append").parquet(inp)

    schema = IMAGES_SCHEMA + ", event_ts timestamp"
    q = dedup_stream(spark, inp, schema, ["image_id"], out, ckpt,
                     event_time_col="event_ts", watermark="1 hour")
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == n_keys
    assert got.select("image_id").distinct().count() == n_keys
