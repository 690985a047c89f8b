"""Real baseline JPEG codec (functions/jpeg.py): spec structure, roundtrip
PSNR, error handling. All pure-Python (no Spark session needed)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from crawlee_spark import datagen
from crawlee_spark.functions.jpeg import JpegFormatError, decode_jpeg, encode_jpeg


def _markers(blob: bytes) -> list[int]:
    """Walk the marker segments up to (and including) SOS."""
    assert blob[:2] == b"\xff\xd8"
    out, pos = [0xD8], 2
    while pos < len(blob):
        assert blob[pos] == 0xFF, f"no marker at {pos}"
        m = blob[pos + 1]
        out.append(m)
        if m == 0xDA:  # SOS: entropy data follows
            break
        (seglen,) = struct.unpack_from(">H", blob, pos + 2)
        pos += 2 + seglen
    return out


def test_jfif_marker_structure():
    px = datagen.gen_page_pixels(42, 1, 32, 24)
    blob = encode_jpeg(px)
    ms = _markers(blob)
    # SOI, APP0(JFIF), DQT x2, SOF0, DHT x4, SOS — and the stream ends in EOI
    assert ms == [0xD8, 0xE0, 0xDB, 0xDB, 0xC0, 0xC4, 0xC4, 0xC4, 0xC4, 0xDA]
    assert blob.endswith(b"\xff\xd9")
    assert b"JFIF\x00" in blob[:30]
    # SOF0 dims are big-endian (h, w) after precision byte
    sof = blob.find(b"\xff\xc0")
    _len, prec, h, w, nc = struct.unpack_from(">HBHHB", blob, sof + 2)
    assert (prec, h, w, nc) == (8, 24, 32, 3)


def test_roundtrip_psnr_noise_and_structured():
    noise = datagen.gen_page_pixels(42, 2, 64, 64)
    dec = decode_jpeg(encode_jpeg(noise))
    assert dec.shape == noise.shape
    diff = dec.astype(float) - noise.astype(float)
    p = 10 * np.log10(255**2 / np.mean(diff**2))
    assert p >= 40.0  # input_hint bound, on the least-compressible input
    assert not np.array_equal(dec, noise)  # genuinely lossy

    x = np.linspace(0, 255, 128).astype(np.uint8)
    grad = np.stack([np.tile(x, (96, 1)), np.tile(x[::-1], (96, 1)),
                     np.full((96, 128), 80, np.uint8)], axis=-1)
    dec = decode_jpeg(encode_jpeg(grad))
    diff = dec.astype(float) - grad.astype(float)
    assert 10 * np.log10(255**2 / np.mean(diff**2)) >= 45.0  # easy input: well above


def test_non_multiple_of_8_dims():
    px = datagen.gen_page_pixels(42, 3, 47, 33)  # w=47, h=33
    dec = decode_jpeg(encode_jpeg(px))
    assert dec.shape == (33, 47, 3)
    diff = dec.astype(float) - px.astype(float)
    assert 10 * np.log10(255**2 / np.mean(diff**2)) >= 40.0


def test_quality_knob_monotone():
    px = datagen.gen_page_pixels(42, 4, 64, 64)
    sizes, psnrs = [], []
    for q in (50, 75, 98):
        blob = encode_jpeg(px, quality=q)
        dec = decode_jpeg(blob)
        diff = dec.astype(float) - px.astype(float)
        sizes.append(len(blob))
        psnrs.append(10 * np.log10(255**2 / np.mean(diff**2)))
    assert sizes == sorted(sizes)
    assert psnrs == sorted(psnrs)


def test_rejects_bad_input():
    with pytest.raises(JpegFormatError):
        decode_jpeg(b"not a jpeg")
    px = datagen.gen_page_pixels(42, 5, 16, 16)
    blob = encode_jpeg(px)
    with pytest.raises(JpegFormatError):
        decode_jpeg(blob[:40])  # truncated before SOS
    # progressive SOF2 must be rejected, not mis-decoded
    prog = bytearray(blob)
    sof = blob.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(JpegFormatError, match="non-baseline"):
        decode_jpeg(bytes(prog))
    with pytest.raises(JpegFormatError):
        encode_jpeg(px.astype(np.int32))  # wrong dtype


def test_entropy_data_is_byte_stuffed():
    """Every 0xFF inside the entropy segment must be followed by 0x00 or a
    marker — scan the whole stream for illegal bare 0xFF bytes."""
    px = datagen.gen_page_pixels(42, 8, 64, 64)
    blob = encode_jpeg(px)
    sos = blob.find(b"\xff\xda")
    (seglen,) = struct.unpack_from(">H", blob, sos + 2)
    entropy = blob[sos + 2 + seglen:-2]  # up to EOI
    i = 0
    while i < len(entropy):
        if entropy[i] == 0xFF:
            assert i + 1 < len(entropy) and entropy[i + 1] == 0x00
            i += 2
        else:
            i += 1


def test_restart_interval_round_trip():
    # DRI + RSTn path: the decoder must produce EXACTLY the pixels of the
    # unsegmented encoding (same quantized coefficients, only the entropy
    # stream is split). Pins the need-based bit fill: a greedy prefetch
    # used to eat the last MCU of each interval at the marker boundary.
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(px, quality=90))
    for ri in (1, 2, 5, 7):  # 15 MCUs: aligned and straggler tails
        blob = encode_jpeg(px, quality=90, restart_interval=ri)
        assert b"\xff\xdd\x00\x04" in blob  # DRI segment present
        got = decode_jpeg(blob)
        assert np.array_equal(got, plain), f"ri={ri}"


def test_corrupt_jpeg_raises_format_error_not_indexerror():
    import pytest

    from crawlee_spark.functions.jpeg import JpegFormatError

    good = encode_jpeg(np.zeros((24, 24, 3), np.uint8), restart_interval=1)
    sos = good.find(b"\xff\xda")
    # cuts in the headers and inside the entropy stream (a cut that only
    # drops the final EOI byte after all MCUs decoded is legitimately fine)
    for cut in (3, 20, sos + 8, sos + (len(good) - sos) // 2):
        with pytest.raises(JpegFormatError):
            decode_jpeg(good[:cut])
