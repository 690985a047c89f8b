"""Real GIF89a codec — pure numpy/stdlib, no external image libraries.

Spec: GIF89a (CompuServe, 1990; W3C mirror) — header, logical screen
descriptor, global color table, image descriptor, LZW-compressed indexed
pixel data in 255-byte sub-blocks, trailer. The encoder emits a single
non-interlaced full-frame image with a global palette built from the
image's distinct colors (GIF is palette-indexed: encoding requires
<= 256 distinct colors, and within that constraint the round trip is
bit-exact). The decoder handles GIF87a/89a, both global and local color
tables, interlaced row order, graphic-control / comment / application
extension blocks, and the full variable-width LZW scheme (code widths
3..12 bits, clear + EOI codes, dictionary growth and reset).

Like the PNG/JPEG codecs in this package, the point is that the bytes
are REAL interchange-format bytes any viewer opens — the Spark pipeline
around them (binary columns, Arrow batches, header sniffing) is the
same machinery a libvips/Pillow-backed production decode would use.
"""

from __future__ import annotations

import struct

import numpy as np


class GifFormatError(ValueError):
    pass


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Variable-width LZW per GIF spec, dictionary-reset on overflow."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for sym in indices.tolist():
        cand = prefix + bytes([sym])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([sym])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    bitbuf = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise GifFormatError("LZW stream truncated")
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
            if prev is not None:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifFormatError(f"bad LZW code {code}")
        out.extend(entry)
        prev = entry
        # widen AFTER appending: next code would not fit
        if len(table) >= (1 << width) and width < 12:
            width += 1
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def encode_gif(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> GIF89a bytes. Requires <= 256 distinct colors
    (GIF is palette-indexed; quantization is a caller policy, not a
    codec concern). Bit-exact round trip with decode_gif."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise GifFormatError(f"expected (h,w,3) uint8, got {pixels.shape}")
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise GifFormatError(f"{len(palette)} distinct colors > GIF palette max 256")
    # palette size must be a power of two >= 2
    pal_bits = max(1, int(len(palette) - 1).bit_length())
    pal_size = 1 << pal_bits
    pal = np.zeros((pal_size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    min_code_size = max(2, pal_bits)

    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table flag, color resolution,
    # sorted=0, size bits
    packed = 0x80 | ((pal_bits - 1) << 4) | (pal_bits - 1)
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += pal.tobytes()
    # image descriptor (no local table, not interlaced)
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code_size)
    lzw = _lzw_encode(indices.astype(np.uint8), min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(blob: bytes) -> np.ndarray:
    """GIF87a/89a bytes -> (h, w, 3) uint8 (first frame). Truncated or
    structurally corrupt input raises GifFormatError (LZW itself carries
    no checksum, so a bit flip that still yields valid codes decodes to
    wrong pixels — content integrity is the container's job, e.g. the
    WARC digest upstream)."""
    try:
        return _decode_gif(blob)
    except GifFormatError:
        raise
    except (struct.error, IndexError, ValueError) as e:
        # numpy reshape/broadcast errors from truncated color tables or
        # out-of-bounds image descriptors are corrupt-input, not bugs
        raise GifFormatError(f"corrupt GIF: {e}") from e


def _decode_gif(blob: bytes) -> np.ndarray:
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifFormatError("not a GIF signature")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(blob):
        block = blob[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise GifFormatError(f"unexpected block 0x{block:02x}")
        ix, iy, iw, ih, ipacked = struct.unpack("<HHHHB", blob[pos : pos + 9])
        pos += 9
        pal = global_pal
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise GifFormatError("no color table")
        min_code_size = blob[pos]
        pos += 1
        lzw = bytearray()
        while blob[pos] != 0:
            ln = blob[pos]
            lzw += blob[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        indices = _lzw_decode(bytes(lzw), min_code_size, iw * ih)
        if indices.size != iw * ih:
            raise GifFormatError("pixel count mismatch")
        rows = indices.reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: reorder rows
            ordered = np.empty_like(rows)
            src = 0
            for start, step in _INTERLACE_PASSES:
                n_rows = len(range(start, ih, step))
                ordered[start:ih:step] = rows[src : src + n_rows]
                src += n_rows
        else:
            ordered = rows
        if (iw, ih) != (sw, sh) or ix or iy:
            # partial first frame: paint onto a screen-sized canvas
            canvas = np.zeros((sh, sw), dtype=np.uint8)
            canvas[iy : iy + ih, ix : ix + iw] = ordered
            ordered = canvas
        if int(ordered.max(initial=0)) >= len(pal):
            raise GifFormatError("palette index out of range")
        return pal[ordered.reshape(-1)].reshape(sh, sw, 3).copy()
    raise GifFormatError("no image block")
