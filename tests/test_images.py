"""Image codec / PSNR / phash invariants (input_hint contract) — pure Python
parts plus one Spark mapInPandas validation test."""

from __future__ import annotations

import numpy as np
import pytest

from crawlee_spark import datagen
from crawlee_spark.functions.images import (
    ImageFormatError,
    decode_image,
    encode_image,
    phash_pixels,
    psnr,
    validate_pages,
    extract_features,
    resize_images,
)


def test_png_roundtrip_lossless():
    px = datagen.gen_page_pixels(42, 3, 64, 32)
    blob = encode_image(px, "png")
    dec = decode_image(blob, "png", 64, 32)
    assert np.array_equal(dec, px)
    assert psnr(dec, px) == float("inf")


def test_jpeg_lossy_but_above_psnr_bound():
    px = datagen.gen_page_pixels(42, 4, 128, 128)
    blob = encode_image(px, "jpeg")
    dec = decode_image(blob, "jpeg", 128, 128)
    assert not np.array_equal(dec, px)  # genuinely lossy
    assert psnr(dec, px) >= 40.0  # input_hint bound


def test_decode_rejects_corrupt():
    px = datagen.gen_page_pixels(42, 5, 32, 32)
    blob = encode_image(px, "png")
    with pytest.raises(ImageFormatError):
        decode_image(blob, "jpeg", 32, 32)  # wrong magic
    with pytest.raises(ImageFormatError):
        decode_image(blob, "png", 64, 64)  # wrong dims
    with pytest.raises(ImageFormatError):
        encode_image(px.astype(np.int32), "png")


def test_phash_stable_and_robust_to_jpeg():
    # structured image (gradient): block means differ clearly, so the
    # perceptual hash must survive lossy quantization EXACTLY
    import numpy as np

    y, x = np.mgrid[0:64, 0:64]
    px = np.stack([(y * 4) % 256, (x * 4) % 256, ((x + y) * 2) % 256],
                  axis=2).astype(np.uint8)
    ph_png = phash_pixels(decode_image(encode_image(px, "png"), "png", 64, 64))
    ph_jpg = phash_pixels(decode_image(encode_image(px, "jpeg"), "jpeg", 64, 64))
    assert ph_png == ph_jpg
    assert -(1 << 63) <= ph_png < (1 << 63)

    # pure-noise image: block means sit at the threshold, quantization may
    # flip a few bits — bound the Hamming drift instead of exact equality
    noise = datagen.gen_page_pixels(42, 6, 64, 64)
    n_png = phash_pixels(decode_image(encode_image(noise, "png"), "png", 64, 64))
    n_jpg = phash_pixels(decode_image(encode_image(noise, "jpeg"), "jpeg", 64, 64))
    hamming = bin((n_png ^ n_jpg) & ((1 << 64) - 1)).count("1")
    assert hamming <= 16


def test_validate_pages_spark(spark):
    rows = [
        {k: r[k] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
        for r in datagen.gen_pages_rows(20, 3, seed=42)
    ]
    # corrupt one caption and one blob
    rows[5]["caption"] = "tampered"
    rows[7]["bytes"] = b"garbage"
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    out = {r["image_id"]: r for r in validate_pages(df, seed=42).collect()}
    assert len(out) == 20
    bad_caption = out["img-000000000005"]
    assert not bad_caption["ok"] and not bad_caption["caption_match"]
    bad_blob = out["img-000000000007"]
    assert not bad_blob["ok"] and bad_blob["error"] is not None
    good = [r for iid, r in out.items() if iid not in ("img-000000000005", "img-000000000007")]
    assert all(r["ok"] for r in good)
    assert all(r["psnr_db"] >= 40.0 or r["psnr_db"] == float("inf") for r in good)


def test_feature_and_resize_plumbing(spark):
    rows = [
        {k: r[k] for k in ("image_id", "bytes", "w", "h", "fmt")}
        for r in datagen.gen_pages_rows(8, 2, seed=42)
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, w int, h int, fmt string")
    feats = extract_features(df).collect()
    assert len(feats) == 8
    assert all(0.0 <= r["mean_r"] <= 255.0 for r in feats)
    resized = resize_images(df, 16, 16).collect()
    assert len(resized) == 8
    assert all(r["w"] == 16 and r["h"] == 16 for r in resized)
    # decoded resize output is a valid 16x16 image
    dec = decode_image(bytes(resized[0]["bytes"]), "png", 16, 16)
    assert dec.shape == (16, 16, 3)
