"""EXIF APP1/TIFF parse + build (functions/exif.py): build->parse
round-trip in both byte orders, JPEG segment walking, orientation
application, per-row error discipline on the Spark surface."""

from __future__ import annotations

import numpy as np
import pytest

from crawlee_spark.functions.exif import (
    ExifFormatError,
    apply_orientation,
    build_exif_app1,
    exif_from_jpeg,
    extract_exif,
    inject_app1,
    parse_exif_app1,
)
from crawlee_spark.functions.images import encode_image


def _jpeg(w=16, h=16, seed=3):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    return encode_image(px, "jpeg")


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_build_parse_roundtrip(bo):
    payload = build_exif_app1(orientation=6, make="ACME", model="Cam 3000",
                              pixel_w=4032, pixel_h=3024, byte_order=bo)
    got = parse_exif_app1(payload)
    assert got == {"orientation": 6, "make": "ACME", "model": "Cam 3000",
                   "exif_w": 4032, "exif_h": 3024}


def test_partial_tags_and_missing_sub_ifd():
    got = parse_exif_app1(build_exif_app1(orientation=3))
    assert got["orientation"] == 3
    assert got["make"] is None and got["exif_w"] is None
    got2 = parse_exif_app1(build_exif_app1(orientation=None, make="X"))
    assert got2["orientation"] is None and got2["make"] == "X"


def test_jpeg_walk_finds_app1_and_absence():
    base = _jpeg()
    assert exif_from_jpeg(base) is None  # our encoder emits no APP1
    tagged = inject_app1(base, build_exif_app1(orientation=8, byte_order="MM"))
    assert exif_from_jpeg(tagged)["orientation"] == 8


def test_malformed_raises():
    with pytest.raises(ExifFormatError):
        parse_exif_app1(b"Exif\0\0XX\x2a\0\0\0\0\0")   # bad byte order
    with pytest.raises(ExifFormatError):
        parse_exif_app1(b"NotExif")
    tagged = inject_app1(_jpeg(), build_exif_app1(orientation=1))
    with pytest.raises(ExifFormatError):
        exif_from_jpeg(tagged[:20])                      # truncated mid-APP1
    # truncated AFTER the APP1: the EXIF itself is intact and parses
    assert exif_from_jpeg(tagged[: len(tagged) // 4])["orientation"] == 1
    with pytest.raises(ExifFormatError):
        exif_from_jpeg(b"\x00\x01rubbish")               # no SOI


def test_apply_orientation_inverts_camera_rotation():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert apply_orientation(px, 1) is px
    assert apply_orientation(px, 3).tolist() == px[::-1, ::-1].tolist()
    r6 = apply_orientation(px, 6)
    assert r6.shape == (3, 2, 3)
    # rot90 CW: top-left of the upright image was bottom-left of stored
    assert r6[0, 0].tolist() == px[1, 0].tolist()
    with pytest.raises(ExifFormatError):
        apply_orientation(px, 9)


def test_extract_exif_spark_rows(spark):
    base = _jpeg()
    rows = [
        ("ii", inject_app1(base, build_exif_app1(
            orientation=6, make="ACME", pixel_w=640, pixel_h=480))),
        ("mm", inject_app1(base, build_exif_app1(
            orientation=2, byte_order="MM"))),
        ("plain", base),
        ("png", encode_image(np.zeros((4, 4, 3), np.uint8), "png")),
        ("trunc", inject_app1(base, build_exif_app1(orientation=1))[:20]),
        ("empty", None),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    out = {r["image_id"]: r for r in extract_exif(df).collect()}
    assert out["ii"]["has_exif"] and out["ii"]["orientation"] == 6
    assert out["ii"]["make"] == "ACME" and out["ii"]["exif_w"] == 640
    assert out["mm"]["has_exif"] and out["mm"]["orientation"] == 2
    assert out["plain"]["has_exif"] is False and out["plain"]["error"] is None
    assert out["png"]["has_exif"] is False
    assert out["trunc"]["has_exif"] is None
    assert "ExifFormatError" in out["trunc"]["error"]
    assert out["empty"]["has_exif"] is False
    assert len(out) == len(rows)


def test_fill_bytes_before_marker():
    """ITU T.81 B.1.1.2: 0xFF fill bytes may pad before any marker — the
    segment walk must skip them, not misread the length."""
    base = _jpeg()
    payload = build_exif_app1(orientation=7)
    import struct

    seg = b"\xff" * 3 + b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    padded = base[:2] + seg + base[2:]
    assert exif_from_jpeg(padded)["orientation"] == 7


def test_inject_app1_oversize_payload_raises_exif_error():
    """The JPEG APP1 length field is 16-bit: payloads over 65533 bytes must
    fail inside the module's error contract (ExifFormatError), not escape
    as struct.error."""
    import pytest

    from crawlee_spark.functions.exif import ExifFormatError, inject_app1

    soi_jpeg = b"\xff\xd8\xff\xd9"
    ok = inject_app1(soi_jpeg, b"x" * 65533)   # exactly at the cap: fine
    assert ok[2:4] == b"\xff\xe1"
    with pytest.raises(ExifFormatError, match="65533"):
        inject_app1(soi_jpeg, b"x" * 65534)
