"""Image decode / validation as vectorized Arrow UDFs (input_hint contract).

`BASELINE.json` `input_hint`: payload table columns
``(image_id, bytes:binary, w, h, fmt, caption, phash:long)``; per-row
invariant vs the reference pixels = decoded-pixel allclose, PSNR >= 40 dB for
lossy formats, caption equality; all through vectorized pandas/Arrow UDFs —
no per-row Python objects crossing the JVM boundary.

The reference repo (Crawlee) has no image pipeline — this is the north_rule
addition (SURVEY.md §2.8 last row). The *Spark* side here is fully real:
binary columns in Arrow batches, `mapInPandas` decode, vectorized PSNR.

Codec surface (five real formats):

- ``fmt='ppm'``  -> REAL binary PPM / P6 (netpbm spec: ``P6`` magic,
  whitespace/comment-tolerant ASCII header, maxval 255, raw RGB rows).
  Decodable by any image viewer; pure-numpy, no external lib.
- ``fmt='bmp'``  -> REAL Windows BMP, 24-bit uncompressed BI_RGB
  (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up BGR rows padded to 4
  bytes; negative-height top-down decode supported). Also viewer-openable.
- ``fmt='png'``  -> REAL PNG (RFC 2083 / ISO 15948): 8-bit truecolor
  (color type 2), zlib-deflated IDAT, CRC-32-checked chunks. The encoder
  emits filter 1 (Sub) scanlines; the decoder implements ALL FIVE row
  filters (None/Sub/Up/Average/Paeth) so third-party PNGs decode too.
  Pure stdlib ``zlib`` + numpy; viewer-openable.
- ``fmt='jpeg'`` -> REAL baseline JPEG (ITU-T T.81; functions/jpeg.py):
  JFIF container, 8-bit sequential DCT, YCbCr 4:4:4, Annex-K quantization
  (quality 98) + typical Huffman tables. Genuinely lossy (~43 dB PSNR on
  noise images — above the input_hint 40 dB bound), viewer-openable,
  and the decoder accepts third-party baseline 4:4:4 JPEGs. Pure
  numpy/stdlib — libjpeg/PIL are not in this container.

- ``fmt='gif'``  -> REAL GIF89a (functions/gif.py): palette-indexed,
  variable-width LZW (3..12-bit codes, clear/EOI, dictionary growth +
  reset), 255-byte sub-blocks; decoder also handles GIF87a, local color
  tables, interlacing, and extension blocks. Encoding requires <= 256
  distinct colors (palette membership is the GIF contract; quantization
  is caller policy) and is bit-exact within it. Pure numpy/stdlib.

All five formats are therefore real interchange formats.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from crawlee_spark.functions.jpeg import JpegFormatError, decode_jpeg, encode_jpeg


class ImageFormatError(ValueError):
    pass


# -- real codec: binary PPM (netpbm P6) --------------------------------------


def _encode_ppm(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def _ppm_header_tokens(blob: bytes, n: int) -> tuple[list[int], int]:
    """First ``n`` ASCII integer tokens after the P6 magic (netpbm header:
    tokens separated by whitespace, ``#``-to-EOL comments allowed anywhere
    between them). Returns (tokens, offset-of-first-raster-byte)."""
    toks: list[int] = []
    i = 2  # past b"P6"
    while len(toks) < n:
        if i >= len(blob):
            raise ImageFormatError("truncated PPM header")
        c = blob[i:i + 1]
        if c == b"#":
            nl = blob.find(b"\n", i)
            if nl < 0:
                raise ImageFormatError("unterminated PPM comment")
            i = nl + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(blob) and not blob[j:j + 1].isspace() and blob[j:j + 1] != b"#":
                j += 1
            tok = blob[i:j]
            if not tok.isdigit():
                raise ImageFormatError(f"bad PPM header token {tok!r}")
            toks.append(int(tok))
            i = j
    # exactly ONE whitespace byte separates maxval from the raster (spec)
    if i >= len(blob) or not blob[i:i + 1].isspace():
        raise ImageFormatError("missing PPM raster separator")
    return toks, i + 1


def _decode_ppm(blob: bytes) -> np.ndarray:
    if not blob.startswith(b"P6"):
        raise ImageFormatError("bad magic for fmt 'ppm'")
    (w, h, maxval), off = _ppm_header_tokens(blob, 3)
    if maxval != 255:
        raise ImageFormatError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    if len(blob) - off < need:
        raise ImageFormatError(f"PPM raster short: {len(blob) - off} < {need}")
    return np.frombuffer(blob, np.uint8, count=need, offset=off).reshape(h, w, 3)


# -- real codec: Windows BMP, 24-bit BI_RGB ----------------------------------


def _encode_bmp(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape[:2]
    row_size = (w * 3 + 3) & ~3  # rows padded to 4-byte boundary
    img_size = row_size * h
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + rows.tobytes()


def _decode_bmp(blob: bytes) -> np.ndarray:
    if len(blob) < 54 or not blob.startswith(b"BM"):
        raise ImageFormatError("bad magic for fmt 'bmp'")
    off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size, w, h_signed, _planes, bpp, comp = struct.unpack_from("<IiiHHI", blob, 14)
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise ImageFormatError(f"unsupported BMP (hdr={hdr_size} bpp={bpp} comp={comp})")
    h = abs(h_signed)
    row_size = (w * 3 + 3) & ~3
    if len(blob) - off < row_size * h:
        raise ImageFormatError("BMP raster short")
    rows = np.frombuffer(blob, np.uint8, count=row_size * h, offset=off).reshape(h, row_size)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up (the common case); negative = top-down
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])


# -- real codec: PNG, 8-bit truecolor (RFC 2083 / ISO 15948) -----------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _encode_png(pixels: np.ndarray) -> bytes:
    """Spec-valid PNG: bit depth 8, color type 2 (RGB), no interlace.

    Scanlines use filter 1 (Sub) — horizontal byte deltas deflate far better
    than raw pixels on natural images, and Sub is pure vectorized math
    (per-row diff along x, no sequential dependency on encode)."""
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = pixels.reshape(h, w * 3)
    # Sub filter: raw[x] - raw[x-3] (bytewise mod 256); first pixel verbatim
    filtered = np.empty((h, 1 + w * 3), dtype=np.uint8)
    filtered[:, 0] = 1
    filtered[:, 1:4] = rows[:, :3]
    filtered[:, 4:] = rows[:, 3:] - rows[:, :-3]
    idat = zlib.compress(filtered.tobytes(), 6)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat)
            + _png_chunk(b"IEND", b""))


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int = 3) -> np.ndarray:
    """Reverse PNG row filters. ``raw`` is (h, 1+stride) filter-byte-prefixed
    scanlines. None/Sub/Up are vectorized (Sub = per-channel cumsum); Average
    and Paeth have a true sequential dependency along x, so they fall back to
    a per-pixel loop — acceptable because this runs inside an Arrow-batched
    UDF on thumbnail-scale rows, and our own encoder never emits them."""
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:]
        if ftype == 0:  # None
            rec = line.copy()
        elif ftype == 1:  # Sub
            rec = np.cumsum(line.reshape(-1, bpp).astype(np.uint32), axis=0)
            rec = (rec & 0xFF).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            rec = line + prev
        elif ftype == 3:  # Average
            rec = np.empty(stride, dtype=np.uint8)
            rec[:bpp] = line[:bpp] + (prev[:bpp] >> 1)
            for x in range(bpp, stride):
                rec[x] = (int(line[x]) + ((int(rec[x - bpp]) + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ImageFormatError(f"bad PNG filter type {ftype}")
        out[y] = rec
        prev = rec
    return out


def _decode_png(blob: bytes) -> np.ndarray:
    if not blob.startswith(_PNG_SIG):
        raise ImageFormatError("bad magic for fmt 'png'")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(blob):
        (length,), ctype = struct.unpack_from(">I", blob, pos), blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(blob):
            raise ImageFormatError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ImageFormatError(f"PNG CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ImageFormatError("PNG missing IHDR/IDAT")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if (depth, ctype_, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ImageFormatError(
            f"unsupported PNG variant (depth={depth} color={ctype_} interlace={interlace})")
    stride = w * 3
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (1 + stride):
        raise ImageFormatError(f"PNG raster size {len(raw)} != {h}*(1+{stride})")
    return _png_unfilter(
        np.frombuffer(raw, np.uint8).reshape(h, 1 + stride), h, stride
    ).reshape(h, w, 3)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array; all five formats are real interchange
    formats (module docstring)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ImageFormatError(f"expected (h,w,3) uint8, got {pixels.shape} {pixels.dtype}")
    if fmt == "ppm":
        return _encode_ppm(pixels)
    if fmt == "bmp":
        return _encode_bmp(pixels)
    if fmt == "png":
        return _encode_png(pixels)
    if fmt == "jpeg":
        try:
            return encode_jpeg(pixels)
        except JpegFormatError as e:
            raise ImageFormatError(str(e)) from e
    if fmt == "gif":
        from crawlee_spark.functions.gif import GifFormatError, encode_gif

        try:
            return encode_gif(pixels)
        except GifFormatError as e:
            raise ImageFormatError(str(e)) from e
    raise ImageFormatError(f"unsupported fmt {fmt!r}")


def decode_image(blob: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """Decode bytes back to (h, w, 3) uint8. Raises on corrupt input; the
    declared (w, h) must match the bytes (a mismatch is a corrupt row)."""
    if fmt == "ppm":
        px = _decode_ppm(blob)
    elif fmt == "bmp":
        px = _decode_bmp(blob)
    elif fmt == "png":
        px = _decode_png(blob)
    elif fmt == "jpeg":
        try:
            px = decode_jpeg(blob)
        except JpegFormatError as e:
            raise ImageFormatError(str(e)) from e
    elif fmt == "gif":
        from crawlee_spark.functions.gif import GifFormatError, decode_gif

        try:
            px = decode_gif(blob)
        except GifFormatError as e:
            raise ImageFormatError(str(e)) from e
    else:
        raise ImageFormatError(f"unsupported fmt {fmt!r}")
    if px.shape != (h, w, 3):
        raise ImageFormatError(f"size mismatch: {px.shape} != ({h},{w},3)")
    return px


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """10*log10(MAX^2 / MSE); inf when identical."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash_pixels(pixels: np.ndarray, grid: int = 8) -> int:
    """64-bit perceptual-hash-style digest: mean-threshold over an 8x8
    block-downsampled grayscale (stable function of decoded pixels; signed
    int64 so it round-trips through a Spark ``long`` column). ``grid`` is
    capped at 8: grid*grid bits must fit the 64-bit signed conversion and
    the Spark long column (a 16x16 grid would build a 256-bit int that
    overflows the Arrow conversion)."""
    if grid > 8:
        raise ValueError(f"phash grid {grid} > 8 exceeds the 64-bit hash")
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    cells = np.empty((grid, grid))
    for i in range(grid):
        for j in range(grid):
            cells[i, j] = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    bits = (cells > cells.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


# ---------------------------------------------------------------------------
# Vectorized Spark-side validators (mapInPandas over Arrow batches)
# ---------------------------------------------------------------------------

VALIDATE_SCHEMA = (
    "image_id string, ok boolean, psnr_db double, phash_match boolean, "
    "caption_match boolean, error string"
)


def make_validator(seed: int = 42, psnr_min: float = 40.0):
    """Build a mapInPandas function validating fetched pages against the
    reference pixel generator (input_hint invariant).

    Input batches need columns: image_id, bytes, w, h, fmt, caption, phash.
    The reference pixels are re-derived from (seed, page index) — parsed from
    ``image_id`` = ``img-{i:012d}`` — so the validator is self-contained on
    executors (no driver data, no shuffle).
    """
    from crawlee_spark.datagen import gen_caption, gen_page_pixels, quantize_web_safe

    def validate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("image_id", "ok", "psnr_db", "phash_match", "caption_match", "error")}
            for image_id, blob, w, h, fmt, caption, ph in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"],
                pdf["fmt"], pdf["caption"], pdf["phash"],
            ):
                err = None
                p_db = float("nan")
                ph_ok = cap_ok = ok = False
                try:
                    i = int(image_id.split("-")[1])
                    decoded = decode_image(bytes(blob), fmt, int(w), int(h))
                    ref = gen_page_pixels(seed, i, int(w), int(h))
                    if fmt == "gif":  # palette-indexed: canonical pixels
                        ref = quantize_web_safe(ref)  # are the quantized ones
                    p_db = psnr(decoded, ref)
                    if fmt == "jpeg":  # the only lossy format
                        pix_ok = p_db >= psnr_min
                    else:  # png/ppm/bmp/gif are lossless: exact equality
                        pix_ok = bool(np.array_equal(decoded, ref))
                    ph_ok = phash_pixels(decoded) == int(ph)
                    cap_ok = caption == gen_caption(seed, i)
                    ok = pix_ok and ph_ok and cap_ok
                except Exception as e:  # corrupt blob -> row-level error, not task death
                    err = f"{type(e).__name__}: {e}"
                out["image_id"].append(image_id)
                out["ok"].append(ok)
                out["psnr_db"].append(p_db)
                out["phash_match"].append(ph_ok)
                out["caption_match"].append(cap_ok)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return validate


def validate_pages(df, seed: int = 42, psnr_min: float = 40.0):
    """df(image_id, bytes, w, h, fmt, caption, phash, ...) -> validation df.

    Column-prunes before the UDF so only needed columns cross the Arrow
    boundary (decisive when the frame also carries html or other payloads).
    """
    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    return df.select(*cols).mapInPandas(make_validator(seed, psnr_min), VALIDATE_SCHEMA)


FEATURE_SCHEMA = (
    "image_id string, mean_r double, mean_g double, mean_b double, "
    "luma_std double, phash long"
)


def extract_features(df, feature_grid: int = 8):
    """Vectorized image feature extraction (decode -> channel means, luma std,
    phash) via mapInPandas — the 'feature-extract' stage of a training-data
    pipeline. Real deep-feature extractors slot into the same UDF shape."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "mean_r", "mean_g", "mean_b", "luma_std", "phash")}
            for image_id, blob, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                try:
                    px = decode_image(bytes(blob), fmt, int(w), int(h)).astype(np.float64)
                except Exception:
                    out["image_id"].append(image_id)
                    for k in ("mean_r", "mean_g", "mean_b", "luma_std"):
                        out[k].append(float("nan"))
                    out["phash"].append(0)
                    continue
                out["image_id"].append(image_id)
                out["mean_r"].append(float(px[:, :, 0].mean()))
                out["mean_g"].append(float(px[:, :, 1].mean()))
                out["mean_b"].append(float(px[:, :, 2].mean()))
                out["luma_std"].append(float(px.mean(axis=2).std()))
                out["phash"].append(phash_pixels(px.astype(np.uint8), feature_grid))
            yield pd.DataFrame(out)

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(feats, FEATURE_SCHEMA)


def resize_images(df, out_w: int, out_h: int):
    """Nearest-neighbor resize as a mapInPandas stage (decode→resize→re-encode).

    Demonstrates the multimodal transform plumbing: binary in, binary out,
    schema ``image_id string, bytes binary, w int, h int, fmt string``.
    """
    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "error string")

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt",
                                   "error")}
            for image_id, blob, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                # per-row error discipline, same as make_validator /
                # extract_features: one corrupt blob costs one error row,
                # never the Spark task
                try:
                    px = decode_image(bytes(blob), fmt, int(w), int(h))
                    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                    enc = encode_image(px[yi][:, xi], "png")
                    err = None
                except (ImageFormatError, ValueError) as e:
                    enc, err = None, str(e)
                out["image_id"].append(image_id)
                out["bytes"].append(enc)
                out["w"].append(out_w if err is None else None)
                out["h"].append(out_h if err is None else None)
                out["fmt"].append("png" if err is None else None)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(do_resize, schema)


def sniff_header(blob):
    """``struct(fmt, w, h)`` from magic bytes + fixed header offsets —
    ALL JVM column expressions (``substring``/``hex``/``conv``): format
    detection and dimension extraction never cross into Python at all,
    unlike the decode path above which legitimately needs numpy. This is
    the cheap pre-filter a 100 TB image pipeline runs BEFORE decode (drop
    undersized/oversized/unknown images from the read set, or route rows
    by format) — at that point spending a Python batch per row just to
    read 8 header bytes would dominate the stage.

    Formats: PNG (IHDR w/h, big-endian 32-bit at bytes 17/21), GIF87a/89a
    (logical screen w/h, little-endian 16-bit at 7/9), BMP
    (BITMAPINFOHEADER w/h, little-endian 32-bit at 19/23; top-down
    negative-height files read as their 2^32 complement — callers that
    accept top-down BMPs should normalize), JPEG (magic only — dimensions
    live in a variable-offset SOF marker, which is the decoder's job),
    PPM/P6 (magic only — dims are variable-offset ASCII header tokens).
    Anything else (or a blob too short for its header) yields
    ``('unknown', NULL, NULL)``.
    """
    from pyspark.sql import functions as F

    def hx(pos: int, n: int):
        return F.hex(F.substring(blob, pos, n))

    def be(pos: int, n: int):
        # long, not int: a top-down BMP stores height as a negative
        # int32, which reads back as its 2^32 complement — an int cast
        # would THROW under ANSI mode (Spark 4 default) and kill the job
        return F.conv(hx(pos, n), 16, 10).cast("long")

    def le(pos: int, n: int):
        raw = hx(pos, n)
        pairs = [F.substring(raw, 2 * i + 1, 2) for i in reversed(range(n))]
        return F.conv(F.concat(*pairs), 16, 10).cast("long")

    is_png = hx(1, 8) == "89504E470D0A1A0A"
    is_gif = hx(1, 6).isin("474946383761", "474946383961")
    is_bmp = hx(1, 2) == "424D"
    is_jpeg = hx(1, 3) == "FFD8FF"
    # netpbm P6: 'P6' + whitespace; dims are variable-offset ASCII tokens,
    # so like jpeg this is magic-only (the decoder owns the header walk)
    is_ppm = hx(1, 2) == "5036"
    fmt = (
        F.when(is_png & (F.length(blob) >= 24), "png")
        .when(is_gif & (F.length(blob) >= 10), "gif")
        .when(is_bmp & (F.length(blob) >= 26), "bmp")
        .when(is_jpeg, "jpeg")
        .when(is_ppm, "ppm")
        .otherwise("unknown")
    )
    w = (F.when(fmt == "png", be(17, 4)).when(fmt == "gif", le(7, 2))
         .when(fmt == "bmp", le(19, 4)))
    h = (F.when(fmt == "png", be(21, 4)).when(fmt == "gif", le(9, 2))
         .when(fmt == "bmp", le(23, 4)))
    return F.struct(fmt.alias("fmt"), w.alias("w"), h.alias("h"))
