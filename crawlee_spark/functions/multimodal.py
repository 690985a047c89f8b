"""Multimodal columns: audio/video as opaque binary + typed metadata.

Per the build brief, image/audio/video payloads are opaque ``binary``
columns with typed metadata; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas UDFs over ``mapInPandas``. The
image path is fully implemented (functions/images.py with a deterministic
stand-in codec). Audio/video DECODERS ARE STUBS — the codec libraries
(ffmpeg/librosa) are not in this container — but everything Spark-side is
real and tested: schemas, column pruning before the Arrow boundary, UDF
signatures, batch shapes, and the frame-sample explode.

Swapping real decoders in means replacing ``_decode_audio_stub`` /
``_decode_video_stub`` only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_SCHEMA = (
    "media_id string, bytes binary, sample_rate int, n_channels int, "
    "duration_ms long, codec string"
)
VIDEO_SCHEMA = (
    "media_id string, bytes binary, w int, h int, fps double, "
    "n_frames int, codec string"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id string, rms double, peak double, zero_crossings long, "
    "duration_ms long, error string"
)

FRAME_SCHEMA = "media_id string, frame_idx int, frame_bytes binary, w int, h int"


def _decode_audio_stub(blob: bytes, codec: str, sample_rate: int) -> np.ndarray:
    """STUB: real implementation decodes `codec` bytes to float32 PCM.

    Raises for real codecs; accepts the deterministic test codec
    ``'pcm_f32_fake'`` = raw little-endian float32 samples, so the Spark
    plumbing is testable end-to-end without audio libraries."""
    if codec == "pcm_f32_fake":
        return np.frombuffer(blob, dtype=np.float32)
    raise NotImplementedError(
        f"audio codec {codec!r}: decoder not available in this environment "
        "(stub; plug librosa/ffmpeg here)"
    )


def _decode_video_stub(blob: bytes, codec: str, w: int, h: int, n_frames: int) -> np.ndarray:
    """STUB: real implementation decodes to (n_frames, h, w, 3) uint8.

    Accepts ``'rawrgb_fake'`` = concatenated raw RGB frames for testing."""
    if codec == "rawrgb_fake":
        expect = n_frames * h * w * 3
        if len(blob) != expect:
            raise ValueError(f"rawrgb size mismatch: {len(blob)} != {expect}")
        return np.frombuffer(blob, dtype=np.uint8).reshape(n_frames, h, w, 3)
    raise NotImplementedError(
        f"video codec {codec!r}: decoder not available in this environment "
        "(stub; plug ffmpeg/decord here)"
    )


def audio_features(df: DataFrame) -> DataFrame:
    """Vectorized audio feature extraction (rms / peak / zero crossings).

    Column-prunes to the needed columns before the Arrow boundary; errors
    are per-row, never task-fatal (dead-letter discipline)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "rms", "peak", "zero_crossings",
                                   "duration_ms", "error")}
            for media_id, blob, sr, codec, dur in zip(
                pdf["media_id"], pdf["bytes"], pdf["sample_rate"],
                pdf["codec"], pdf["duration_ms"],
            ):
                out["media_id"].append(media_id)
                out["duration_ms"].append(int(dur))
                try:
                    pcm = _decode_audio_stub(bytes(blob), codec, int(sr))
                    out["rms"].append(float(np.sqrt(np.mean(pcm ** 2))) if len(pcm) else 0.0)
                    out["peak"].append(float(np.max(np.abs(pcm))) if len(pcm) else 0.0)
                    out["zero_crossings"].append(
                        int(np.count_nonzero(np.diff(np.signbit(pcm)))) if len(pcm) > 1 else 0
                    )
                    out["error"].append(None)
                except Exception as e:
                    out["rms"].append(float("nan"))
                    out["peak"].append(float("nan"))
                    out["zero_crossings"].append(0)
                    out["error"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    return df.select("media_id", "bytes", "sample_rate", "codec", "duration_ms") \
        .mapInPandas(feats, AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling: one output row per kept frame (explode inside the
    UDF — the batch shape real video pipelines use, keeping frame bytes out
    of JVM row objects until needed)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "frame_bytes", "w", "h")}
            for media_id, blob, w, h, n_frames, codec in zip(
                pdf["media_id"], pdf["bytes"], pdf["w"], pdf["h"],
                pdf["n_frames"], pdf["codec"],
            ):
                try:
                    vid = _decode_video_stub(bytes(blob), codec, int(w), int(h), int(n_frames))
                except NotImplementedError:
                    continue  # undecodable codec -> no frames (dead-letter upstream)
                for i in range(0, len(vid), every_n):
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(vid[i].tobytes())
                    out["w"].append(int(w))
                    out["h"].append(int(h))
            yield pd.DataFrame(out)

    return df.select("media_id", "bytes", "w", "h", "n_frames", "codec") \
        .mapInPandas(frames, FRAME_SCHEMA)
