"""Audio/video codecs (real WAV + Y4M, honest stubs for compressed ones)
and Spark plumbing: schemas, Arrow batch shapes, frame explode."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from crawlee_spark.functions.multimodal import (
    MediaFormatError,
    _decode_audio,
    _decode_video,
    audio_features,
    decode_wav,
    decode_y4m,
    encode_wav,
    encode_y4m,
    sample_frames,
)


def test_wav_roundtrip_all_widths():
    rng = np.random.default_rng(3)
    pcm = (rng.random((480, 2), dtype=np.float32) * 2 - 1)
    for bits, tol in [(16, 1 / 32767), (32, 1 / 2**31), (-32, 0.0)]:
        out, rate, ch = decode_wav(encode_wav(pcm, 48000, bits))
        assert (rate, ch) == (48000, 2)
        assert np.abs(out - pcm).max() <= tol + 1e-9


def test_wav_interops_with_stdlib_wave():
    # our encode opens in the stdlib reader…
    rng = np.random.default_rng(4)
    pcm = (rng.random((256, 1), dtype=np.float32) * 2 - 1)
    wf = wave.open(io.BytesIO(encode_wav(pcm, 44100, 16)))
    assert (wf.getframerate(), wf.getnchannels(), wf.getsampwidth(),
            wf.getnframes()) == (44100, 1, 2, 256)
    # …and we decode a file the stdlib writer produced
    buf = io.BytesIO()
    ww = wave.open(buf, "wb")
    ww.setnchannels(2), ww.setsampwidth(2), ww.setframerate(8000)
    ww.writeframes((np.sin(np.arange(200)) * 30000).astype("<i2").tobytes())
    ww.close()
    out, rate, ch = decode_wav(buf.getvalue())
    assert (rate, ch, len(out)) == (8000, 2, 100)


def test_wav_rejects_garbage():
    with pytest.raises(MediaFormatError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(MediaFormatError):
        decode_wav(b"not a riff at all")


def test_y4m_roundtrip_above_psnr_and_c420():
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(3, 16, 24, 3), dtype=np.uint8)
    blob = encode_y4m(frames, 30, 1)
    assert blob.startswith(b"YUV4MPEG2 ")
    out, fps = decode_y4m(blob)
    assert out.shape == frames.shape and fps == 30.0
    diff = out.astype(float) - frames.astype(float)
    psnr = 10 * np.log10(255**2 / np.mean(diff**2))
    assert psnr > 40  # input_hint bound for lossy codecs
    # C420 variant: hand-build one gray frame (all planes constant)
    y, u, v = 128, 128, 128
    hdr = b"YUV4MPEG2 W4 H2 F25:1 C420jpeg\nFRAME\n"
    c420 = hdr + bytes([y] * 8) + bytes([u] * 2) + bytes([v] * 2)
    out2, _ = decode_y4m(c420)
    assert out2.shape == (1, 2, 4, 3)
    assert int(np.abs(out2.astype(int) - 128).max()) <= 1


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
    rows.append({**rows[0], "media_id": "au-bad", "codec": "mp3"})  # compressed -> stub error
    # one REAL wav row: same signal as au-0 so features must agree
    pcm0 = np.frombuffer(rows[0]["bytes"], dtype=np.float32)
    rows.append({**rows[0], "media_id": "au-wav", "codec": "wav",
                 "bytes": encode_wav(pcm0, 16000, -32)})
    df = spark.createDataFrame(
        rows,
        "media_id string, bytes binary, sample_rate int, n_channels int, "
        "duration_ms long, codec string",
    )
    out = {r["media_id"]: r for r in audio_features(df).collect()}
    assert len(out) == 6
    for i in range(4):
        r = out[f"au-{i}"]
        assert r["error"] is None and 0.5 < r["rms"] < 2.0 and r["zero_crossings"] > 0
    assert "NotImplementedError" in out["au-bad"]["error"]  # stub clearly marked
    wav, raw = out["au-wav"], out["au-0"]
    assert wav["error"] is None
    assert wav["rms"] == pytest.approx(raw["rms"], rel=1e-6)
    assert wav["zero_crossings"] == raw["zero_crossings"]


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
    # one REAL y4m row (lossy YUV transform — frames sampled, not compared raw)
    rows.append({"media_id": "v-y4m", "bytes": encode_y4m(vid[:12], 25, 1),
                 "w": w, "h": h, "fps": 25.0, "n_frames": 12, "codec": "y4m"})
    df = spark.createDataFrame(
        rows,
        "media_id string, bytes binary, w int, h int, fps double, n_frames int, codec string",
    )
    frames = sample_frames(df, every_n=10).collect()
    got = sorted((r["media_id"], r["frame_idx"]) for r in frames)
    assert got == [("v-y4m", 0), ("v-y4m", 10), ("v0", 0), ("v0", 10), ("v0", 20)]
    f0 = next(r for r in frames if r["media_id"] == "v0" and r["frame_idx"] == 10)
    assert np.array_equal(
        np.frombuffer(bytes(f0["frame_bytes"]), dtype=np.uint8).reshape(h, w, 3),
        vid[10],
    )
    fy = next(r for r in frames if r["media_id"] == "v-y4m" and r["frame_idx"] == 10)
    dec = np.frombuffer(bytes(fy["frame_bytes"]), dtype=np.uint8).reshape(h, w, 3)
    diff = dec.astype(float) - vid[10].astype(float)
    assert 10 * np.log10(255**2 / np.mean(diff**2)) > 40


def test_stub_raises_for_real_codecs():
    with pytest.raises(NotImplementedError):
        _decode_audio(b"", "opus", 48000)
    with pytest.raises(NotImplementedError):
        _decode_video(b"", "av1", 1, 1, 1)


def test_wav_extensible_float_subformat():
    # WAVE_FORMAT_EXTENSIBLE wrapping IEEE float: the real tag lives in
    # the SubFormat GUID's first two bytes — hardcoding tag=1 would parse
    # the float bit patterns as int32 garbage
    rng = np.random.default_rng(3)
    pcm = (rng.random((480, 2), dtype=np.float32) * 2 - 1).astype(np.float32)
    frames = pcm.astype("<f4").tobytes()
    # extensible fmt chunk: 16 base + cbSize(22) = 40 bytes
    guid_tail = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    fmt = (struct.pack("<HHIIHH", 0xFFFE, 2, 48000, 48000 * 8, 8, 32)
           + struct.pack("<H", 22)            # cbSize
           + struct.pack("<HI", 32, 0b11)     # valid bits, channel mask
           + struct.pack("<H", 3) + guid_tail)  # SubFormat: IEEE float
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(frames)) + frames)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    x, rate, ch = decode_wav(blob)
    assert (rate, ch) == (48000, 2)
    assert np.allclose(x, pcm, atol=1e-7)


def test_wav_truncated_data_chunk_raises():
    import pytest

    good = encode_wav(np.zeros(1000, np.float32), 8000, bits=16)
    with pytest.raises(MediaFormatError):
        decode_wav(good[: len(good) - 500])  # data chunk cut mid-way
