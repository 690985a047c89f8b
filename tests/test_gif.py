"""GIF89a codec (functions/gif.py): LZW round trip across code-width
growth and dictionary reset, interop with real-world bytes, interlace,
and the encode_image/decode_image dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from crawlee_spark.functions.gif import (
    GifFormatError,
    _lzw_encode,
    decode_gif,
    encode_gif,
)
from crawlee_spark.functions.images import ImageFormatError, decode_image, encode_image


def _palette_image(h: int, w: int, n_colors: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 255, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w))
    return pal[idx]


def test_round_trip_bit_exact_small_palette():
    img = _palette_image(23, 41, 7, seed=1)
    blob = encode_gif(img)
    assert blob[:6] == b"GIF89a"
    assert np.array_equal(decode_gif(blob), img)


def test_round_trip_256_colors_code_width_growth():
    # 256 colors force min_code_size=8 and enough pixels to push LZW
    # codes across the 9->10->11->12-bit boundaries AND a dictionary
    # reset — the classic interop off-by-one sites
    img = _palette_image(120, 130, 256, seed=2)
    blob = encode_gif(img)
    assert np.array_equal(decode_gif(blob), img)


def test_round_trip_two_color_min_code_size_floor():
    img = _palette_image(15, 9, 2, seed=3)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_rejects_too_many_colors():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, size=(40, 40, 3), dtype=np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(GifFormatError):
        encode_gif(img)


def test_decodes_real_world_1x1_gif():
    # the canonical 1x1 tracking-pixel GIF (widely published bytes):
    # GIF89a + white/black global palette + graphic-control extension
    # (which the decoder must skip) + a 2-byte LZW image block
    blob = (
        b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
        b"\x21\xf9\x04\x01\x00\x00\x00\x00"
        b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02\x44\x01\x00\x3b"
    )
    px = decode_gif(blob)
    assert px.shape == (1, 1, 3)
    # LZW stream 0x44 0x01 = clear(4) then index 0 -> palette[0] = white
    assert px[0, 0].tolist() == [255, 255, 255]


def test_decodes_interlaced():
    img = _palette_image(13, 6, 4, seed=5)  # 13 rows hits all 4 passes
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    rows = indices.reshape(h, w)
    order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
             for r in range(start, h, step)]
    interlaced = rows[order].astype(np.uint8)
    pal = np.zeros((4, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    blob = bytearray(b"GIF89a")
    blob += struct.pack("<HHBBB", w, h, 0x80 | 0x11, 0, 0)  # 4-entry GCT
    blob += pal.tobytes()
    blob += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    blob.append(2)
    lzw = _lzw_encode(interlaced.reshape(-1), 2)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blob.append(len(chunk))
        blob += chunk
    blob += b"\x00\x3b"
    assert np.array_equal(decode_gif(bytes(blob)), img)


def test_dispatch_and_sniff_agree():
    from crawlee_spark.functions.images import sniff_header  # noqa: F401

    img = _palette_image(10, 17, 5, seed=6)
    blob = encode_image(img, "gif")
    assert np.array_equal(decode_image(blob, "gif", 17, 10), img)
    with pytest.raises(ImageFormatError):
        decode_image(blob, "gif", 16, 10)  # declared size mismatch
    with pytest.raises(ImageFormatError):
        decode_image(b"GIF89a" + b"\x00" * 4, "gif", 1, 1)  # truncated


def test_corrupt_lzw_not_silently_identical():
    # LZW carries no checksum: a flipped byte must either raise (invalid
    # code / truncation) or decode to DIFFERENT pixels — never silently
    # reproduce the original
    img = _palette_image(8, 8, 3, seed=7)
    blob = bytearray(encode_gif(img))
    blob[-6] ^= 0xFF  # flip a byte inside the LZW stream
    try:
        out = decode_gif(bytes(blob))
        assert not np.array_equal(out, img)
    except GifFormatError:
        pass
