"""Audio/video stub plumbing: schemas, Arrow batch shapes, frame explode."""

from __future__ import annotations

import numpy as np
import pytest

from crawlee_spark.functions.multimodal import (
    _decode_audio_stub,
    _decode_video_stub,
    audio_features,
    sample_frames,
)


def _audio_rows(n=4):
    rows = []
    for i in range(n):
        rng = np.random.default_rng(i)
        pcm = rng.standard_normal(1000).astype(np.float32)
        rows.append({
            "media_id": f"au-{i}", "bytes": pcm.tobytes(), "sample_rate": 16000,
            "n_channels": 1, "duration_ms": 1000 * 1000 // 16000,
            "codec": "pcm_f32_fake",
        })
    return rows


def test_audio_features(spark):
    rows = _audio_rows()
    rows.append({**rows[0], "media_id": "au-bad", "codec": "mp3"})  # real codec -> stub error
    df = spark.createDataFrame(
        rows,
        "media_id string, bytes binary, sample_rate int, n_channels int, "
        "duration_ms long, codec string",
    )
    out = {r["media_id"]: r for r in audio_features(df).collect()}
    assert len(out) == 5
    for i in range(4):
        r = out[f"au-{i}"]
        assert r["error"] is None and 0.5 < r["rms"] < 2.0 and r["zero_crossings"] > 0
    assert "NotImplementedError" in out["au-bad"]["error"]  # stub clearly marked


def test_video_frame_sampling(spark):
    n_frames, w, h = 25, 8, 6
    rng = np.random.default_rng(7)
    vid = rng.integers(0, 256, size=(n_frames, h, w, 3), dtype=np.uint8)
    rows = [
        {"media_id": "v0", "bytes": vid.tobytes(), "w": w, "h": h,
         "fps": 25.0, "n_frames": n_frames, "codec": "rawrgb_fake"},
        {"media_id": "v-undecodable", "bytes": b"xx", "w": w, "h": h,
         "fps": 25.0, "n_frames": 1, "codec": "h264"},
    ]
    df = spark.createDataFrame(
        rows,
        "media_id string, bytes binary, w int, h int, fps double, n_frames int, codec string",
    )
    frames = sample_frames(df, every_n=10).collect()
    got = sorted((r["media_id"], r["frame_idx"]) for r in frames)
    assert got == [("v0", 0), ("v0", 10), ("v0", 20)]
    f0 = next(r for r in frames if r["frame_idx"] == 10)
    assert np.array_equal(
        np.frombuffer(bytes(f0["frame_bytes"]), dtype=np.uint8).reshape(h, w, 3),
        vid[10],
    )


def test_stub_raises_for_real_codecs():
    with pytest.raises(NotImplementedError):
        _decode_audio_stub(b"", "opus", 48000)
    with pytest.raises(NotImplementedError):
        _decode_video_stub(b"", "av1", 1, 1, 1)
