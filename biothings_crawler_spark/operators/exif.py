"""EXIF metadata extraction — the image-metadata lane of the
multimodal plane (operators/multimodal.py decodes pixels; this module
decodes the APP1 sidecar a multimodal corpus needs for dedup keys,
orientation-aware preprocessing, and capture-time provenance).

The parser is REAL and stdlib-only: scan JPEG markers for the APP1
``Exif\\x00\\x00`` segment, parse the embedded TIFF header (``II``
little- and ``MM`` big-endian both supported — the fixture plants
both), walk IFD0's 12-byte tag entries (value inlined when it fits in
4 bytes, else offset-addressed — both lanes planted), follow the
ExifIFD pointer (0x8769) for the photographic tags, and decode ASCII
(type 2, NUL-stripped), SHORT (3), LONG (4) and RATIONAL (5, exact
numerator/denominator — never floated).

Extracted columns: make, model, orientation, datetime, exposure_num /
exposure_den (exact rational), iso.  Missing tags are NULL; malformed
segments land in ``decode_err`` (the shared media-plane policy — one
corrupt header never kills a 100 TB stage).

Scale shape: pure map stage over the media table (Arrow-batched
mapInPandas, no state across rows, zero shuffle).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

_TAGS_IFD0 = {0x010F: "make", 0x0110: "model", 0x0112: "orientation",
              0x0132: "datetime", 0x8769: "_exif_ptr"}
_TAGS_EXIF = {0x829A: "exposure", 0x8827: "iso"}


def _parse_ifd(data: bytes, off: int, endian: str, wanted: dict) -> dict:
    out: dict = {}
    (n,) = struct.unpack_from(endian + "H", data, off)
    for k in range(n):
        base = off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from(endian + "HHI", data, base)
        if tag not in wanted:
            continue
        name = wanted[tag]
        if typ == 2:  # ASCII, cnt includes the NUL
            voff = base + 8 if cnt <= 4 else struct.unpack_from(
                endian + "I", data, base + 8)[0]
            raw = data[voff:voff + cnt]
            out[name] = raw.rstrip(b"\x00").decode("ascii")
        elif typ == 3:  # SHORT
            out[name] = struct.unpack_from(endian + "H", data, base + 8)[0]
        elif typ == 4:  # LONG
            out[name] = struct.unpack_from(endian + "I", data, base + 8)[0]
        elif typ == 5:  # RATIONAL: always offset-addressed (8 bytes)
            voff = struct.unpack_from(endian + "I", data, base + 8)[0]
            num, den = struct.unpack_from(endian + "II", data, voff)
            out[name] = (num, den)
        else:
            raise ValueError(f"unsupported EXIF type {typ} for tag {tag:#x}")
    return out


def extract_exif(data: bytes) -> tuple:
    """(make, model, orientation, datetime, exposure_num, exposure_den,
    iso) from the first APP1 Exif segment."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    i = 2
    tiff = None
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError(f"bad marker alignment at {i}")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, i + 2)
        seg = data[i + 4:i + 2 + seglen]
        if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            tiff = seg[6:]
            break
        i += 2 + seglen
    if tiff is None:
        raise ValueError("no APP1 Exif segment")
    if tiff[:2] == b"II":
        endian = "<"
    elif tiff[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("bad TIFF byte-order mark")
    magic, ifd0 = struct.unpack_from(endian + "HI", tiff, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    vals = _parse_ifd(tiff, ifd0, endian, _TAGS_IFD0)
    if "_exif_ptr" in vals:
        vals.update(_parse_ifd(tiff, vals.pop("_exif_ptr"), endian,
                               _TAGS_EXIF))
    exp = vals.get("exposure")
    return (vals.get("make"), vals.get("model"),
            vals.get("orientation"), vals.get("datetime"),
            exp[0] if exp else None, exp[1] if exp else None,
            vals.get("iso"))


EXIF_SCHEMA = ("media_id long, make string, model string, "
               "orientation long, taken_at string, exposure_num long, "
               "exposure_den long, iso long, decode_err string")


def decode_exif(media: DataFrame) -> DataFrame:
    """(media_id, content) -> EXIF columns via Arrow-batched
    mapInPandas with the shared decode_err policy."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from biothings_crawler_spark.operators.multimodal import (
            DECODE_ERR_CLASSES,
            _decode_rows,
        )

        for pdf in batches:
            yield pd.DataFrame(_decode_rows(
                pdf,
                ("make", "model", "orientation", "taken_at",
                 "exposure_num", "exposure_den", "iso"),
                extract_exif, DECODE_ERR_CLASSES))

    return media.mapInPandas(run, EXIF_SCHEMA)


def _build_exif_jpeg(*, make: str, model: str, orientation: int,
                     datetime_s: str, exposure: tuple, iso: int,
                     big_endian: bool) -> bytes:
    """Minimal real JPEG wrapper (SOI + APP1 Exif + EOI) whose TIFF
    block exercises inline vs offset-addressed values, the ExifIFD
    pointer, and both endiannesses."""
    e = ">" if big_endian else "<"
    make_b = make.encode() + b"\x00"
    model_b = model.encode() + b"\x00"
    dt_b = datetime_s.encode() + b"\x00"

    # layout (offsets relative to TIFF start):
    # 0: header(8) | 8: IFD0 count(2) + 5*12 + next(4)
    ifd0_off = 8
    ifd0_end = ifd0_off + 2 + 5 * 12 + 4
    # data area: make, model, datetime strings then exif IFD then rational
    off = ifd0_end
    make_off, off = off, off + len(make_b)
    model_off, off = off, off + len(model_b)
    dt_off, off = off, off + len(dt_b)
    exif_off = off
    exif_end = exif_off + 2 + 2 * 12 + 4
    rat_off = exif_end

    def entry(tag, typ, cnt, val4):
        return struct.pack(e + "HHI", tag, typ, cnt) + val4

    def inline_or_off(raw, data_off):
        if len(raw) <= 4:
            return raw + b"\x00" * (4 - len(raw)), b""
        return struct.pack(e + "I", data_off), raw

    make_v, make_d = inline_or_off(make_b, make_off)
    model_v, model_d = inline_or_off(model_b, model_off)
    dt_v, dt_d = inline_or_off(dt_b, dt_off)
    # keep the data area layout fixed: pad skipped inline strings
    make_d = make_d or b"\x00" * len(make_b)
    model_d = model_d or b"\x00" * len(model_b)
    dt_d = dt_d or b"\x00" * len(dt_b)

    ifd0 = struct.pack(e + "H", 5)
    ifd0 += entry(0x010F, 2, len(make_b), make_v)
    ifd0 += entry(0x0110, 2, len(model_b), model_v)
    ifd0 += entry(0x0112, 3, 1, struct.pack(e + "H", orientation)
                  + b"\x00\x00")
    ifd0 += entry(0x0132, 2, len(dt_b), dt_v)
    ifd0 += entry(0x8769, 4, 1, struct.pack(e + "I", exif_off))
    ifd0 += struct.pack(e + "I", 0)

    exif = struct.pack(e + "H", 2)
    exif += entry(0x829A, 5, 1, struct.pack(e + "I", rat_off))
    exif += entry(0x8827, 3, 1, struct.pack(e + "H", iso) + b"\x00\x00")
    exif += struct.pack(e + "I", 0)

    tiff = ((b"MM" if big_endian else b"II")
            + struct.pack(e + "HI", 42, ifd0_off)
            + ifd0 + make_d + model_d + dt_d + exif
            + struct.pack(e + "II", *exposure))
    app1 = b"Exif\x00\x00" + tiff
    return (b"\xff\xd8\xff\xe1" + struct.pack(">H", len(app1) + 2)
            + app1 + b"\xff\xd9")


def gen_exif_media_seeded(ids: DataFrame) -> DataFrame:
    """(media_id, seed) -> real JPEG bytes with an APP1 Exif block.
    Closed-form fixture shared with the SQL oracle: make ``Cam{seed%7}``,
    model ``M{seed%13}`` (1-char when seed%13<10 — the INLINE value
    lane), orientation ``1+seed%8``, datetime from seed, exposure
    ``(1, 50+(seed%20)*10)``, iso ``100*(1+seed%32)``; seed%2 flips
    endianness."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = {"media_id": [], "content": []}
        for pdf in batches:
            for mid, seed in zip(pdf["media_id"], pdf["seed"]):
                s = int(seed)
                out["media_id"].append(int(mid))
                out["content"].append(_build_exif_jpeg(
                    make=f"Cam{s % 7}",
                    model=f"M{s % 13}",
                    orientation=1 + s % 8,
                    datetime_s=(f"2025:{1 + s % 12:02d}:{1 + s % 28:02d}"
                                f" {s % 24:02d}:{s % 60:02d}:00"),
                    exposure=(1, 50 + (s % 20) * 10),
                    iso=100 * (1 + s % 32),
                    big_endian=s % 2 == 1,
                ))
            yield pd.DataFrame(out)
            out = {"media_id": [], "content": []}

    return ids.mapInPandas(run, "media_id long, content binary")
