"""Audio/video multimodal kernels: codec round-trips, signal stats over
Spark, and seekable frame sampling feeding the image pipeline."""

import numpy as np
import pyarrow as pa
import pytest

from btrblocks_spark.functions.media import (
    audio_stats_batches,
    decode_audio,
    encode_audio,
    encode_video,
    frame_sample_batches,
    video_frame,
    video_meta,
)


def test_audio_roundtrip_and_stats():
    rng = np.random.default_rng(3)
    pcm = (rng.standard_normal(16000) * 8000).astype(np.int16)
    blob = encode_audio(pcm, rate=16000)
    back, rate = decode_audio(blob)
    assert rate == 16000
    assert np.array_equal(back[:, 0], pcm)
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFFxxxx")  # real wav needs a real library


def test_video_seek_decode():
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (12, 16, 20, 3)).astype(np.uint8)
    blob = encode_video(frames, fps=6)
    meta = video_meta(blob)
    assert meta == {"w": 20, "h": 16, "fps": 6, "n_frames": 12}
    for idx in (0, 7, 11):
        assert np.array_equal(video_frame(blob, idx), frames[idx])
    with pytest.raises(NotImplementedError):
        video_meta(b"\x00\x00\x00\x20ftypisom")


def test_audio_stats_spark(spark):
    rng = np.random.default_rng(11)
    rows = []
    for i in range(30):
        n = 8000 + 400 * i
        pcm = (rng.standard_normal(n) * (3000 + 500 * i)).astype(np.int16)
        rows.append((f"a{i:03d}", bytearray(encode_audio(pcm, 8000))))
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    out = df.mapInArrow(
        audio_stats_batches,
        "audio_id string, duration_s double, rms double, peak double, "
        "clip_rate double",
    ).collect()
    assert len(out) == 30
    by_id = {r.audio_id: r for r in out}
    assert abs(by_id["a000"].duration_s - 1.0) < 1e-9
    assert all(0.0 <= r.rms <= 1.0 and r.peak <= 1.0 for r in out)


def test_video_frame_sample_spark_feeds_image_pipeline(spark):
    from btrblocks_spark.functions.images import decode_image

    rng = np.random.default_rng(13)
    rows = []
    for i in range(6):
        frames = rng.integers(0, 256, (10, 8, 8, 3)).astype(np.uint8)
        rows.append((f"v{i}", bytearray(encode_video(frames, fps=5))))
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    out = df.mapInArrow(
        frame_sample_batches,
        "video_id string, frame_idx int, w int, h int, frame_bytes binary",
    )
    rows_out = out.collect()
    # every 5th of 10 frames -> 2 per video
    assert len(rows_out) == 12
    assert {r.frame_idx for r in rows_out} == {0, 5}
    px = decode_image(rows_out[0].frame_bytes)
    assert px.shape == (8, 8, 3)  # sampled frames are real image cells
