"""Property-based EXIF round-trip (functions/exif.py): for ARBITRARY tag
combinations, byte orders, and pad bytes, build → inject → segment-walk →
parse must reproduce the inputs exactly — the curated examples in
test_exif.py are only as strong as this equivalence. Pure Python (no
Spark): the builder/parser pair is the codec; the Spark surface is a thin
mapInPandas over it."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from crawlee_spark.functions.exif import (
    build_exif_app1,
    exif_from_jpeg,
    inject_app1,
    parse_exif_app1,
)

_ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0, max_size=40)

_CASE = st.fixed_dictionaries({
    "orientation": st.one_of(st.none(), st.integers(1, 8)),
    "make": st.one_of(st.none(), _ASCII),
    "model": st.one_of(st.none(), _ASCII),
    "pixel_w": st.one_of(st.none(), st.integers(0, 2**31 - 1)),
    "pixel_h": st.one_of(st.none(), st.integers(0, 2**31 - 1)),
    "byte_order": st.sampled_from(["II", "MM"]),
})


@settings(max_examples=150, deadline=None)
@given(case=_CASE, fill=st.integers(0, 4))
def test_build_parse_roundtrip_property(case, fill):
    payload = build_exif_app1(**case)
    got = parse_exif_app1(payload)
    want = {
        "orientation": case["orientation"],
        "make": case["make"],
        "model": case["model"],
        "exif_w": case["pixel_w"],
        "exif_h": case["pixel_h"],
    }
    assert got == want, (case, got)

    # through a JPEG stream, with 0..4 fill bytes before the APP1 marker
    # (a minimal-but-legal stream: SOI + APP1 + EOI)
    seg = (b"\xff" * fill + b"\xff\xe1"
           + struct.pack(">H", len(payload) + 2) + payload)
    jpeg = b"\xff\xd8" + seg + b"\xff\xd9"
    assert exif_from_jpeg(jpeg) == want


@settings(max_examples=100, deadline=None)
@given(data=st.binary(min_size=0, max_size=64))
def test_parse_never_hangs_or_leaks(data):
    """Arbitrary bytes either parse (if they happen to be valid) or raise
    ValueError-family — never IndexError/struct.error/infinite loop."""
    try:
        parse_exif_app1(b"Exif\0\0" + data)
    except ValueError:
        pass
    try:
        exif_from_jpeg(b"\xff\xd8" + data)
    except ValueError:
        pass
