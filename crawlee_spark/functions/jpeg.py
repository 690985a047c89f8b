"""Real baseline JPEG codec (ITU-T T.81), pure numpy + stdlib.

libjpeg/PIL are not in this container, so this implements the actual
interchange format from the spec: JFIF container, 8-bit baseline
sequential DCT, YCbCr 4:4:4 (no chroma subsampling — keeps the codec
simple AND the error small), the Annex-K quantization tables scaled by a
libjpeg-style quality factor, and the Annex-K typical Huffman tables.
Files decode in any image viewer; the decoder also accepts third-party
baseline 4:4:4 JPEGs (DQT/DHT/SOF0/SOS chunk walking, 0xFF00 byte
de-stuffing, restart markers).

Quality default is 98: quantization steps of 1-5 bound the per-coefficient
error so that even white-noise images (our datagen worst case — no spatial
correlation for the DCT to exploit, full energy in every frequency) land at
~43-44 dB PSNR, above the input_hint 40 dB bound, while remaining genuinely
lossy (measured: q=95 -> 35.9 dB on noise, q=97 -> 40.3, q=98 -> 43.8).

Scope (documented, spec-allowed subset on ENCODE; decoder validates and
raises on anything else): baseline DCT only (no progressive), 8-bit, 1 or
3 components, no subsampling on encode (decode handles h/v factors of 1
only). DCTs are vectorized over all blocks at once (two matmuls against
the orthonormal DCT-II basis); only the entropy coding loops per block.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg", "JpegFormatError"]


class JpegFormatError(ValueError):
    pass


# -- Annex K.1 quantization tables (luminance / chrominance) ------------------

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)


def _scaled_q(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 -> table as-is, 100 -> all ones."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int32)


# -- zigzag + DCT bases --------------------------------------------------------

def _zigzag_order() -> np.ndarray:
    idx = np.arange(64).reshape(8, 8)
    out = []
    for s in range(15):
        d = [idx[i, s - i] for i in range(8) if 0 <= s - i < 8]
        out.extend(d if s % 2 else d[::-1])
    return np.array(out)


_ZIGZAG = _zigzag_order()          # block-raster index for each zigzag slot
_UNZIGZAG = np.argsort(_ZIGZAG)

_DCT_M = np.array([
    [np.cos((2 * x + 1) * u * np.pi / 16) * (np.sqrt(0.125) if u == 0 else 0.5)
     for x in range(8)] for u in range(8)
])  # orthonormal: block_dct = M @ B @ M.T


# -- Annex K.3 typical Huffman tables ------------------------------------------
# (bits: count of codes per length 1..16; vals: symbols in code order)

_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical JPEG assignment (Annex C)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


# -- color transforms (JFIF full-range YCbCr) ----------------------------------

def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    f = px.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a (h, w) plane to multiples of 8 by edge replication (the spec's
    recommended extension — avoids ringing at the border) and return
    (n_blocks, 8, 8) in raster block order plus the block grid dims."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, bh, bw


def _from_blocks(blocks: np.ndarray, bh: int, bw: int, h: int, w: int) -> np.ndarray:
    full = blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return full[:h, :w]


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, size-bit code)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def encode_jpeg(pixels: np.ndarray, quality: int = 98,
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (YCbCr 4:4:4).
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker every
    that many MCUs (DC predictors reset, writer byte-aligned) — the spec
    feature that makes partial-corruption recovery possible, and the
    round-trip pin for the decoder's restart path."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise JpegFormatError(f"expected (h,w,3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w = pixels.shape[:2]
    if h > 65535 or w > 65535 or h == 0 or w == 0:
        raise JpegFormatError(f"bad dimensions {w}x{h}")
    qy, qc = _scaled_q(_Q_LUMA, quality), _scaled_q(_Q_CHROMA, quality)
    ycc = _rgb_to_ycbcr(pixels)

    parts = [b"\xFF\xD8"]  # SOI
    parts.append(b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
                 + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tid, q in ((0, qy), (1, qc)):
        parts.append(b"\xFF\xDB" + struct.pack(">HB", 67, tid)
                     + bytes(q.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    # SOF0: 3 components, no subsampling (h=v=1)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)
    parts.append(b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof)
    for tc_th, (bits, vals) in ((0x00, _DC_LUMA), (0x10, _AC_LUMA),
                                (0x01, _DC_CHROMA), (0x11, _AC_CHROMA)):
        seg = bytes([tc_th]) + bytes(bits) + bytes(vals)
        parts.append(b"\xFF\xC4" + struct.pack(">H", 2 + len(seg)) + seg)
    if restart_interval:
        parts.append(b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval))
    sos = struct.pack(">B", 3)
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += struct.pack(">BB", cid, tdta)
    sos += b"\x00\x3F\x00"
    parts.append(b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos)

    dc_l, ac_l = _build_codes(*_DC_LUMA), _build_codes(*_AC_LUMA)
    dc_c, ac_c = _build_codes(*_DC_CHROMA), _build_codes(*_AC_CHROMA)
    comp_blocks = [_to_blocks(ycc[..., i])[0] for i in range(3)]
    writer = _BitWriter()
    # non-interleaved MCU would need one scan per component; with h=v=1 the
    # interleaved MCU is simply one block of each component in raster order
    prev = [0, 0, 0]
    n_mcu = comp_blocks[0].shape[0]
    # pre-quantized zigzag rows per component, entropy-coded MCU-interleaved
    zz = []
    for ci in range(3):
        q = qy if ci == 0 else qc
        coeffs = np.einsum("ux,nxy,vy->nuv", _DCT_M, comp_blocks[ci] - 128.0, _DCT_M)
        zz.append(np.round(coeffs / q).astype(np.int32).reshape(-1, 64)[:, _ZIGZAG])
    rst = 0
    for b in range(n_mcu):
        if restart_interval and b and b % restart_interval == 0:
            writer.flush()
            parts.append(bytes(writer.out))
            parts.append(bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            writer = _BitWriter()
            prev = [0, 0, 0]
        for ci in range(3):
            row = zz[ci][b]
            dc_codes = dc_l if ci == 0 else dc_c
            ac_codes = ac_l if ci == 0 else ac_c
            dc = int(row[0])
            size, code = _magnitude(dc - prev[ci])
            hcode, hlen = dc_codes[size]
            writer.put(hcode, hlen)
            if size:
                writer.put(code, size)
            prev[ci] = dc
            run = 0
            nz = np.nonzero(row[1:])[0]
            last = int(nz[-1]) + 1 if len(nz) else 0
            for i in range(1, last + 1):
                v = int(row[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    zrl, zlen = ac_codes[0xF0]
                    writer.put(zrl, zlen)
                    run -= 16
                size, code = _magnitude(v)
                hcode, hlen = ac_codes[(run << 4) | size]
                writer.put(hcode, hlen)
                writer.put(code, size)
                run = 0
            if last < 63:
                eob, elen = ac_codes[0x00]
                writer.put(eob, elen)
    writer.flush()
    parts.append(bytes(writer.out))
    parts.append(b"\xFF\xD9")  # EOI
    return b"".join(parts)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 de-stuffing and RSTn handling."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        # fill EXACTLY until `need` bits are buffered — never greedily past
        # it: a greedy prefetch near a restart boundary would read the
        # interval's final data bytes into acc and then hit the RSTn
        # marker, and raising _Restart there throws away real entropy bits
        # (the last MCU of every interval would decode corrupt). With
        # need-based filling, a marker encountered mid-read means the
        # interval genuinely ran out of bits (corrupt input).
        d = self.data
        while self.nbits < need:
            if self.pos >= len(d):
                raise JpegFormatError("truncated entropy data")
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # restart marker: byte-align, reset
                    raise _Restart(self.pos)
                else:  # EOI or next segment: pad with 1s, don't consume
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegFormatError("bad Huffman code")

    def align_after_restart(self) -> None:
        # called with self.pos at the 0xFF of an RSTn marker
        self.acc = 0
        self.nbits = 0
        self.pos += 2


class _Restart(Exception):
    def __init__(self, pos: int) -> None:
        self.pos = pos


def _extend(code: int, size: int) -> int:
    if size == 0:
        return 0
    return code if code >= (1 << (size - 1)) else code - (1 << size) + 1


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB (grayscale broadcast to
    3). Structurally corrupt input raises JpegFormatError — same error
    contract as decode_gif (images.decode_image catches format errors
    per row; a raw IndexError would kill the whole Spark task)."""
    try:
        return _decode_jpeg(blob)
    except JpegFormatError:
        raise
    except (struct.error, IndexError, ValueError, _Restart) as e:
        raise JpegFormatError(f"corrupt JPEG: {e}") from e


def _decode_jpeg(blob: bytes) -> np.ndarray:
    if len(blob) < 4 or blob[:2] != b"\xFF\xD8":
        raise JpegFormatError("bad magic for fmt 'jpeg'")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict[tuple[int, int], int]] = {}
    sof = None
    ri = 0
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise JpegFormatError(f"expected marker at {pos}")
        marker = blob[pos + 1]
        if marker == 0xD9:
            raise JpegFormatError("EOI before SOS")
        (seglen,) = struct.unpack_from(">H", blob, pos + 2)
        if pos + 2 + seglen > len(blob):
            raise JpegFormatError("truncated marker segment")
        seg = blob[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 15
                if pq != 0:
                    raise JpegFormatError("16-bit quant tables unsupported")
                if o + 65 > len(seg):
                    raise JpegFormatError("truncated DQT")
                q = np.zeros(64, np.int32)
                q[_ZIGZAG] = np.frombuffer(seg[o + 1:o + 65], np.uint8)
                qtables[tq] = q.reshape(8, 8)
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc_th = seg[o]
                bits = list(seg[o + 1:o + 17])
                n = sum(bits)
                vals = list(seg[o + 17:o + 17 + n])
                htables[tc_th] = _build_decoder(bits, vals)
                o += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise JpegFormatError(f"precision {prec} unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                if hv != 0x11:
                    raise JpegFormatError("subsampled JPEG unsupported (4:4:4 only)")
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegFormatError(f"non-baseline SOF 0x{marker:02X} unsupported")
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise JpegFormatError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 15))
            data_pos = pos + 2 + seglen
            return _decode_scan(blob, data_pos, sof, scan, qtables, htables, ri)
        pos += 2 + seglen
    raise JpegFormatError("no SOS segment found")


def _decode_scan(blob, pos, sof, scan, qtables, htables, ri):
    h, w, comps = sof
    comp_by_id = dict(comps)
    bh, bw = -(-h // 8), -(-w // 8)
    n_mcu = bh * bw
    ncomp = len(scan)
    zz = [np.zeros((n_mcu, 64), np.int32) for _ in range(ncomp)]
    reader = _BitReader(blob, pos)
    prev = [0] * ncomp
    mcu = 0
    while mcu < n_mcu:
        try:
            for ci, (cs, td, ta) in enumerate(scan):
                dc_tab = htables.get(td)
                ac_tab = htables.get(0x10 | ta)
                if dc_tab is None or ac_tab is None:
                    raise JpegFormatError("missing Huffman table")
                row = zz[ci][mcu]
                size = reader.huff(dc_tab)
                prev[ci] += _extend(reader.bits(size), size)
                row[0] = prev[ci]
                k = 1
                while k < 64:
                    rs = reader.huff(ac_tab)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise JpegFormatError("AC run overflows block")
                    row[k] = _extend(reader.bits(s), s)
                    k += 1
            mcu += 1
            if ri and mcu % ri == 0 and mcu < n_mcu:
                # expect a restart marker next (byte-aligned)
                p = reader.pos
                # skip to the marker if we stopped mid-byte (bounds-safe:
                # p+1 must exist before indexing it)
                while p + 1 < len(blob) and not (
                        blob[p] == 0xFF and 0xD0 <= blob[p + 1] <= 0xD7):
                    p += 1
                if p + 1 >= len(blob):
                    raise JpegFormatError("missing restart marker")
                reader.pos = p
                reader.align_after_restart()
                prev = [0] * ncomp
        except _Restart as r:
            # corrupt interval: resync at the marker and RE-decode this
            # MCU from the next interval's data — clear its partial rows
            # first (stale AC coefficients would survive the retry)
            for ci in range(ncomp):
                zz[ci][mcu][:] = 0
            reader.pos = r.pos
            reader.align_after_restart()
            prev = [0] * ncomp
    planes = []
    for ci, (cs, _td, _ta) in enumerate(scan):
        q = qtables.get(comp_by_id[cs])
        if q is None:
            raise JpegFormatError("missing quant table")
        blocks = (zz[ci][:, _UNZIGZAG].reshape(-1, 8, 8) * q).astype(np.float64)
        spatial = np.einsum("ux,nuv,vy->nxy", _DCT_M, blocks, _DCT_M) + 128.0
        planes.append(_from_blocks(spatial, bh, bw, h, w))
    if ncomp == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    ycc = np.stack(planes, axis=-1)
    return np.clip(np.round(_ycbcr_to_rgb(ycc)), 0, 255).astype(np.uint8)
