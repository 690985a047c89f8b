"""EXIF (APP1/TIFF) metadata: parse + build, pure stdlib.

Crawled JPEGs carry orientation (the #1 gotcha of naive image pipelines —
a camera photo decoded without applying tag 0x0112 trains rotated), camera
make/model (provenance / dedup signal), and the Exif pixel dimensions.
LAION-class pipelines read these during curation; this module gives the
engine that capability without PIL/exiftool (absent from the container).

Format (Exif 2.3 / TIFF 6.0):

  APP1 segment = marker FFE1, big-endian length, "Exif\\0\\0", then a TIFF
  file: byte-order mark (II little / MM big) + 0x002A + offset to IFD0.
  An IFD is a count plus 12-byte entries (tag, type, count, value-or-
  offset — value inline when its size fits 4 bytes); IFD0's tag 0x8769
  points at the Exif sub-IFD holding PixelXDimension/PixelYDimension.

Both byte orders are parsed AND built (fixtures exercise II and MM).
``parse_exif_app1`` raises ``ExifFormatError`` on malformed input;
``extract_exif`` (the Spark surface, mapInPandas) converts that to the
same per-row error-column discipline as ``functions/images.py`` — one
corrupt blob costs one error row, never a task.

Reference parity note: Crawlee itself never decodes images (the dataset
is opaque); this is a north-rule image-axis op (SURVEY.md §2.11), like
the codecs in ``functions/images.py``.
"""

from __future__ import annotations

import struct
from typing import Iterator

TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_EXIF_IFD = 0x8769
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003

_TYPE_ASCII = 2
_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_SIZE = {_TYPE_ASCII: 1, _TYPE_SHORT: 2, _TYPE_LONG: 4}


class ExifFormatError(ValueError):
    """Malformed APP1/TIFF structure (truncated, bad magic, bad offsets)."""


# --------------------------------------------------------------------------
# build (fixture twin — kept beside the parser so the framings cannot drift)
# --------------------------------------------------------------------------

def _entry(en: str, tag: int, typ: int, count: int, value: bytes) -> bytes:
    assert len(value) <= 4
    return struct.pack(f"{en}HHI", tag, typ, count) + value.ljust(4, b"\0")


def build_exif_app1(
    *,
    orientation: int | None = 1,
    make: str | None = None,
    model: str | None = None,
    pixel_w: int | None = None,
    pixel_h: int | None = None,
    byte_order: str = "II",
) -> bytes:
    """A complete APP1 payload (``Exif\\0\\0`` + TIFF), either byte order.

    Strings land after the IFDs (TIFF offset-valued entries); SHORT values
    are inline. Returns the segment PAYLOAD — ``inject_app1`` frames it
    with the FFE1 marker and length.
    """
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    en = "<" if byte_order == "II" else ">"

    ifd0: list[tuple[int, int, int, bytes | str]] = []
    if make is not None:
        ifd0.append((TAG_MAKE, _TYPE_ASCII, len(make) + 1, make))
    if model is not None:
        ifd0.append((TAG_MODEL, _TYPE_ASCII, len(model) + 1, model))
    if orientation is not None:
        ifd0.append((TAG_ORIENTATION, _TYPE_SHORT, 1,
                     struct.pack(f"{en}H", orientation) + b"\0\0"))
    sub: list[tuple[int, int, int, bytes | str]] = []
    if pixel_w is not None:
        sub.append((TAG_PIXEL_X, _TYPE_LONG, 1, struct.pack(f"{en}I", pixel_w)))
    if pixel_h is not None:
        sub.append((TAG_PIXEL_Y, _TYPE_LONG, 1, struct.pack(f"{en}I", pixel_h)))

    n0 = len(ifd0) + (1 if sub else 0)
    ifd0_off = 8
    ifd0_size = 2 + 12 * n0 + 4
    sub_off = ifd0_off + ifd0_size
    sub_size = (2 + 12 * len(sub) + 4) if sub else 0
    data_off = sub_off + sub_size  # string area starts here

    strings = b""
    entries0 = b""
    for tag, typ, count, val in sorted(ifd0):
        if typ == _TYPE_ASCII:
            raw = str(val).encode("ascii") + b"\0"
            if len(raw) <= 4:
                # TIFF: values whose size fits 4 bytes are stored INLINE
                entries0 += _entry(en, tag, typ, count, raw)
            else:
                entries0 += _entry(
                    en, tag, typ, count,
                    struct.pack(f"{en}I", data_off + len(strings)))
                strings += raw
        else:
            entries0 += _entry(en, tag, typ, count, bytes(val))
    if sub:
        entries0 += _entry(en, TAG_EXIF_IFD, _TYPE_LONG, 1,
                           struct.pack(f"{en}I", sub_off))
    tiff = struct.pack(f"{en}2sHI", byte_order.encode(), 0x2A, ifd0_off)
    tiff += struct.pack(f"{en}H", n0) + entries0 + struct.pack(f"{en}I", 0)
    if sub:
        entries1 = b"".join(_entry(en, t, ty, c, bytes(v))
                            for t, ty, c, v in sorted(sub))
        tiff += struct.pack(f"{en}H", len(sub)) + entries1
        tiff += struct.pack(f"{en}I", 0)
    tiff += strings
    return b"Exif\0\0" + tiff


def inject_app1(jpeg: bytes, app1_payload: bytes) -> bytes:
    """Insert an APP1 segment right after SOI of an existing JPEG."""
    if len(jpeg) < 2 or jpeg[:2] != b"\xff\xd8":
        raise ExifFormatError("not a JPEG (no SOI)")
    if len(app1_payload) + 2 > 0xFFFF:
        # the JPEG segment length field is 16-bit (includes its own 2
        # bytes); oversize payloads must fail inside the module's declared
        # error contract, not as struct.error from the pack below
        raise ExifFormatError(
            f"APP1 payload {len(app1_payload)} bytes exceeds the 65533-byte "
            f"segment limit")
    seg = b"\xff\xe1" + struct.pack(">H", len(app1_payload) + 2) + app1_payload
    return jpeg[:2] + seg + jpeg[2:]


# --------------------------------------------------------------------------
# parse
# --------------------------------------------------------------------------

def _read_ifd(data: bytes, en: str, off: int) -> dict[int, tuple[int, int, bytes]]:
    """IFD at ``off`` -> {tag: (type, count, raw_value_field)}."""
    if off + 2 > len(data):
        raise ExifFormatError("IFD offset past end")
    (n,) = struct.unpack_from(f"{en}H", data, off)
    out = {}
    base = off + 2
    if base + 12 * n > len(data):
        raise ExifFormatError("IFD entries truncated")
    for i in range(n):
        tag, typ, count = struct.unpack_from(f"{en}HHI", data, base + 12 * i)
        out[tag] = (typ, count, data[base + 12 * i + 8: base + 12 * i + 12])
    return out


def _value(data: bytes, en: str, typ: int, count: int, raw: bytes):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return None  # unhandled type: skip, don't fail the whole blob
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(f"{en}I", raw)
        if off + total > len(data):
            raise ExifFormatError("value offset past end")
        buf = data[off: off + total]
    if typ == _TYPE_ASCII:
        return buf.split(b"\0", 1)[0].decode("ascii", "replace")
    fmt = "H" if typ == _TYPE_SHORT else "I"
    vals = struct.unpack(f"{en}{count}{fmt}", buf)
    return vals[0] if count == 1 else list(vals)


def parse_exif_app1(payload: bytes) -> dict:
    """APP1 payload -> {orientation, make, model, exif_w, exif_h}.

    Missing tags come back None; structural damage raises
    ``ExifFormatError`` (the caller decides the per-row error contract).
    """
    if not payload.startswith(b"Exif\0\0"):
        raise ExifFormatError("missing Exif header")
    tiff = payload[6:]
    if len(tiff) < 8:
        raise ExifFormatError("TIFF header truncated")
    bom = tiff[:2]
    if bom == b"II":
        en = "<"
    elif bom == b"MM":
        en = ">"
    else:
        raise ExifFormatError(f"bad byte-order mark {bom!r}")
    magic, ifd0_off = struct.unpack_from(f"{en}HI", tiff, 2)
    if magic != 0x2A:
        raise ExifFormatError("bad TIFF magic")
    ifd0 = _read_ifd(tiff, en, ifd0_off)

    def val(ifd, tag):
        if tag not in ifd:
            return None
        typ, count, raw = ifd[tag]
        return _value(tiff, en, typ, count, raw)

    out = {
        "orientation": val(ifd0, TAG_ORIENTATION),
        "make": val(ifd0, TAG_MAKE),
        "model": val(ifd0, TAG_MODEL),
        "exif_w": None,
        "exif_h": None,
    }
    sub_off = val(ifd0, TAG_EXIF_IFD)
    if sub_off is not None:
        sub = _read_ifd(tiff, en, int(sub_off))
        out["exif_w"] = val(sub, TAG_PIXEL_X)
        out["exif_h"] = val(sub, TAG_PIXEL_Y)
    return out


def exif_from_jpeg(blob: bytes) -> dict | None:
    """Walk JPEG segments to the Exif APP1; None when the JPEG has none.

    Raises ``ExifFormatError`` for blobs that are not JPEG-framed or whose
    segment lengths run past the end (truncation detection, same contract
    as the codecs).
    """
    if len(blob) < 2 or blob[:2] != b"\xff\xd8":
        raise ExifFormatError("not a JPEG (no SOI)")
    i = 2
    while i + 4 <= len(blob):
        if blob[i] != 0xFF:
            raise ExifFormatError(f"bad marker byte at {i}")
        # ITU T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — skip them (real-world encoders pad)
        while i + 4 <= len(blob) and blob[i + 1] == 0xFF:
            i += 1
        if i + 4 > len(blob):
            break
        marker = blob[i + 1]
        if marker == 0xD9 or marker == 0xDA:  # EOI / start of scan: no APP1
            return None
        (seg_len,) = struct.unpack_from(">H", blob, i + 2)
        if seg_len < 2 or i + 2 + seg_len > len(blob):
            raise ExifFormatError("segment length past end")
        if marker == 0xE1 and blob[i + 4: i + 10] == b"Exif\0\0":
            return parse_exif_app1(blob[i + 4: i + 2 + seg_len])
        i += 2 + seg_len
    # a well-formed stream reaches SOS or EOI before running out of bytes
    raise ExifFormatError("unexpected end of JPEG segment stream")


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

EXIF_SCHEMA = ("image_id string, has_exif boolean, orientation int, "
               "make string, model string, exif_w long, exif_h long, "
               "error string")


def extract_exif(df, bytes_col: str = "bytes"):
    """Per-row EXIF features over a binary image column (mapInPandas).

    Column pruning applies: only (image_id, bytes) cross the Arrow
    boundary. Per-row error discipline — a corrupt blob yields one error
    row (has_exif NULL), never a task death. Non-JPEG formats simply have
    no EXIF (has_exif false).
    """
    import pandas as pd

    def walk(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            out = {k: [] for k in ("image_id", "has_exif", "orientation",
                                   "make", "model", "exif_w", "exif_h",
                                   "error")}
            for img_id, blob in zip(b["image_id"], b[bytes_col]):
                rec = {"orientation": None, "make": None, "model": None,
                       "exif_w": None, "exif_h": None}
                has, err = False, None
                try:
                    blob = bytes(blob) if blob is not None else b""
                    if blob[:2] == b"\xff\xd8":
                        parsed = exif_from_jpeg(blob)
                        if parsed is not None:
                            rec.update(parsed)
                            has = True
                except Exception as e:
                    err, has = f"{type(e).__name__}: {e}", None
                out["image_id"].append(img_id)
                out["has_exif"].append(has)
                out["orientation"].append(rec["orientation"])
                out["make"].append(rec["make"])
                out["model"].append(rec["model"])
                out["exif_w"].append(rec["exif_w"])
                out["exif_h"].append(rec["exif_h"])
                out["error"].append(err)
            yield pd.DataFrame(out)

    return df.select("image_id", bytes_col).mapInPandas(walk, EXIF_SCHEMA)


def apply_orientation(pixels, orientation: int):
    """Orientation tag -> upright pixels (numpy HxWx3), Exif 2.3 table:
    1 normal, 2 flip-H, 3 rot180, 4 flip-V, 5 transpose, 6 rot90 CW,
    7 transverse, 8 rot270 CW."""
    import numpy as np

    o = int(orientation or 1)
    if o == 1:
        return pixels
    if o == 2:
        return pixels[:, ::-1]
    if o == 3:
        return pixels[::-1, ::-1]
    if o == 4:
        return pixels[::-1]
    if o == 5:
        return np.transpose(pixels, (1, 0, 2))
    if o == 6:
        return np.transpose(pixels, (1, 0, 2))[:, ::-1]
    if o == 7:
        return np.transpose(pixels, (1, 0, 2))[::-1, ::-1]
    if o == 8:
        return np.transpose(pixels, (1, 0, 2))[::-1]
    raise ExifFormatError(f"orientation {o} out of range 1-8")
