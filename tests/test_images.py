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


def test_png_is_spec_valid():
    """Our PNG bytes carry a real signature/IHDR/IDAT/IEND with good CRCs."""
    import struct
    import zlib

    px = datagen.gen_page_pixels(42, 6, 48, 20)
    blob = encode_image(px, "png")
    assert blob.startswith(b"\x89PNG\r\n\x1a\n")
    pos, types = 8, []
    while pos < len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        assert zlib.crc32(ctype + data) & 0xFFFFFFFF == crc
        types.append(ctype)
        pos += 12 + length
    assert types == [b"IHDR", b"IDAT", b"IEND"]
    w, h, depth, color = struct.unpack_from(">IIBB", blob, 16)
    assert (w, h, depth, color) == (48, 20, 8, 2)


def test_png_decodes_every_filter_type():
    """Third-party encoders may use any of the 5 row filters; decode all."""
    import struct
    import zlib

    from crawlee_spark.functions.images import _PNG_SIG, _png_chunk

    rng = np.random.default_rng(11)
    h, w, bpp = 5, 7, 3
    ref = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    rows = ref.reshape(h, w * 3).astype(np.int32)
    lines, prev = [], np.zeros(w * 3, np.int32)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = rows[y]
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur.copy()
            enc[bpp:] = (cur[bpp:] - cur[:-bpp]) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        else:
            enc = np.empty(w * 3, np.int32)
            for x in range(w * 3):
                a = cur[x - bpp] if x >= bpp else 0
                b, c = prev[x], (prev[x - bpp] if x >= bpp else 0)
                if f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (cur[x] - pred) % 256
        lines.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_image(blob, "png", w, h), ref)


def test_png_crc_corruption_detected():
    px = datagen.gen_page_pixels(42, 7, 16, 16)
    bad = bytearray(encode_image(px, "png"))
    bad[40] ^= 0xFF  # flip a raster byte inside IDAT
    with pytest.raises(ImageFormatError, match="CRC"):
        decode_image(bytes(bad), "png", 16, 16)


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
    import numpy as np

    def drift(px):
        a = phash_pixels(decode_image(encode_image(px, "png"), "png", *px.shape[1::-1]))
        b = phash_pixels(decode_image(encode_image(px, "jpeg"), "jpeg", *px.shape[1::-1]))
        return a, b, bin((a ^ b) & ((1 << 64) - 1)).count("1")

    # cell means far from the global mean (two-tone checkerboard): the hash
    # must survive real DCT quantization EXACTLY — this is the property near-
    # dup detection relies on
    yy, xx = np.mgrid[0:64, 0:64]
    tone = np.where((yy // 8 + xx // 8) % 2 == 0, 40, 200).astype(np.uint8)
    tt = np.stack([tone, tone, tone], axis=2)
    a, b, d = drift(tt)
    assert d == 0
    assert -(1 << 63) <= a < (1 << 63)

    # threshold-straddling image (symmetric gradient: the diagonal cells sit
    # AT the global mean): a real lossy codec may flip those borderline bits;
    # near-dup matching is a Hamming-distance test, so bound the drift
    px = np.stack([(yy * 4) % 256, (xx * 4) % 256, ((xx + yy) * 2) % 256],
                  axis=2).astype(np.uint8)
    _, _, d = drift(px)
    assert d <= 8

    # pure noise
    noise = datagen.gen_page_pixels(42, 6, 64, 64)
    _, _, d = drift(noise)
    assert d <= 16


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


def test_ppm_real_codec_roundtrip_and_header_tolerance():
    # P6 is a REAL public format: spec-shaped header (comments + arbitrary
    # whitespace between tokens) must decode; roundtrip is lossless
    px = datagen.gen_page_pixels(7, 1, 33, 17)  # non-square, odd width
    blob = encode_image(px, "ppm")
    assert blob.startswith(b"P6\n33 17\n255\n")
    assert np.array_equal(decode_image(blob, "ppm", 33, 17), px)
    # hand-built header with comments and mixed whitespace
    raster = px.tobytes()
    messy = b"P6 # comment after magic\n# full-line comment\n 33\t17 # dims\n255\n" + raster
    assert np.array_equal(decode_image(messy, "ppm", 33, 17), px)
    with pytest.raises(ImageFormatError):
        decode_image(blob, "ppm", 17, 33)  # transposed dims
    with pytest.raises(ImageFormatError):
        decode_image(b"P6\n33 17\n65535\n" + raster * 2, "ppm", 33, 17)  # 16-bit maxval
    with pytest.raises(ImageFormatError):
        decode_image(blob[:-10], "ppm", 33, 17)  # short raster


def test_bmp_real_codec_roundtrip_padding_and_topdown():
    import struct

    # width 33 -> row stride 100 (33*3=99 padded to 4) exercises padding
    px = datagen.gen_page_pixels(7, 2, 33, 9)
    blob = encode_image(px, "bmp")
    assert blob[:2] == b"BM"
    assert struct.unpack_from("<I", blob, 2)[0] == len(blob)  # header file size
    w, h = struct.unpack_from("<ii", blob, 18)
    assert (w, h) == (33, 9)
    assert np.array_equal(decode_image(blob, "bmp", 33, 9), px)
    # top-down variant (negative height) decodes to the same pixels
    neg = bytearray(blob)
    struct.pack_into("<i", neg, 22, -9)
    off = struct.unpack_from("<I", blob, 10)[0]
    row = (33 * 3 + 3) & ~3
    rows = np.frombuffer(blob, np.uint8, count=row * 9, offset=off).reshape(9, row)
    topdown = bytes(neg[:off]) + rows[::-1].tobytes()
    assert np.array_equal(decode_image(topdown, "bmp", 33, 9), px)
    with pytest.raises(ImageFormatError):
        decode_image(b"BM" + blob[2:52], "bmp", 33, 9)  # truncated
    bad_bpp = bytearray(blob)
    struct.pack_into("<H", bad_bpp, 28, 32)
    with pytest.raises(ImageFormatError):
        decode_image(bytes(bad_bpp), "bmp", 33, 9)  # 32bpp unsupported


def test_real_formats_flow_through_validator(spark):
    # the datagen mix now includes ppm/bmp rows; every untampered row must
    # validate ok (exact pixel equality for the lossless formats)
    rows = [
        {k: r[k] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
        for r in datagen.gen_pages_rows(40, 3, seed=11)
    ]
    fmts = {r["fmt"] for r in rows}
    assert {"ppm", "bmp", "gif"} <= fmts  # mix actually exercises the real codecs
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    out = validate_pages(df, seed=11).collect()
    assert len(out) == 40 and all(r["ok"] for r in out)


def test_sniff_header_on_real_codec_output(spark):
    """The JVM-side header sniffer must agree with the repo's own REAL
    encoders (PNG/BMP) and with an externally-pinned GIF89a header —
    independent derivations of the same bytes."""
    from crawlee_spark.functions.images import encode_image, sniff_header

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(24, 37, 3), dtype=np.uint8)  # h=24, w=37
    gif = b"GIF89a" + (37).to_bytes(2, "little") + (24).to_bytes(2, "little") + b"\x00\x00\x00"
    rows = [
        ("png", bytearray(encode_image(img, "png"))),
        ("bmp", bytearray(encode_image(img, "bmp"))),
        ("gif", bytearray(gif)),
        ("jpeg", bytearray(encode_image(img, "jpeg"))),
        ("ppm", bytearray(encode_image(img, "ppm"))),
        ("short", bytearray(b"\x89PNG")),  # right magic, truncated header
        ("junk", bytearray(b"\x00\x01\x02\x03\x04\x05\x06\x07\x08\x09")),
        # top-down BMP: negative height must NOT throw under ANSI mode
        # (reads as the 2^32 complement per the docstring contract)
        ("bmp-topdown", bytearray(
            b"BM" + b"\x00" * 12 + (40).to_bytes(4, "little")
            + (37).to_bytes(4, "little")
            + (-24).to_bytes(4, "little", signed=True) + b"\x00" * 4)),
    ]
    df = spark.createDataFrame(rows, "tag string, blob binary")
    got = {r["tag"]: r["s"] for r in df.select("tag", sniff_header(df.blob).alias("s")).collect()}
    assert got["png"] == ("png", 37, 24)
    assert got["bmp"] == ("bmp", 37, 24)
    assert got["gif"] == ("gif", 37, 24)
    assert got["jpeg"][0] == "jpeg" and got["jpeg"][1] is None
    assert got["ppm"][0] == "ppm" and got["ppm"][1] is None
    assert got["short"][0] == "unknown"
    assert got["junk"][0] == "unknown"
    assert got["bmp-topdown"] == ("bmp", 37, (1 << 32) - 24)
