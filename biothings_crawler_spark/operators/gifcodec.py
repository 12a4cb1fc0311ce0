"""GIF87a codec (LZW) in pure stdlib — the third real image decoder
(PNG: zlib/struct; JPEG: numpy DCT; GIF: the LZW dictionary coder,
implemented from the spec, no compression library involved at all).

Scope: GIF87a/89a, one image block, global color table, no interlace
(raises NotImplementedError), no GCE transparency handling beyond
skipping extension blocks. GIF is lossless, so like PNG the decoded
pixels equal the source exactly and the oracle compares closed-form
pixel features.

The LZW layer is the real variable-width algorithm: initial code size
from the image block, CLEAR/EOI codes, dictionary growth with width
bumps at 2^n, 12-bit cap with encoder-side CLEAR reset — the parts a
"fake" decoder would skip and real-world GIFs exercise constantly.
"""

from __future__ import annotations

import struct


def _lzw_encode(pixels: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = n = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, n
        acc |= code << n          # GIF packs LSB-first
        n += width
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    put(clear, width)
    run = b""
    for b in pixels:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        put(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:                      # table full: reset (the spec path)
            put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        put(table[run], width)
    put(eoi, width)
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0

    def get(width: int) -> int:
        nonlocal pos
        code = 0
        for i in range(width):
            byte = data[(pos + i) >> 3]
            code |= ((byte >> ((pos + i) & 7)) & 1) << i
        pos += width
        return code

    out = bytearray()
    table: list[bytes] = []

    def reset() -> int:
        nonlocal table
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return min_code_size + 1

    width = reset()
    prev: bytes | None = None
    while True:
        code = get(width)
        if code == clear:
            width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]      # the KwKwK case
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # width bumps when the NEXT code would not fit
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def gif_encode_gray(pixels: bytes, w: int, h: int) -> bytes:
    """Encode width*height palette-index bytes (0..255 = gray levels
    via an identity grayscale global color table) as a real GIF87a."""
    gct = b"".join(bytes([i, i, i]) for i in range(256))
    lsd = struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    img = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    lzw = _lzw_encode(pixels, 8)
    subs = bytearray([8])                          # min code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        subs += bytes([len(chunk)]) + chunk
    subs += b"\x00"
    return b"GIF87a" + lsd + gct + img + bytes(subs) + b"\x3b"


def gif_decode_gray(data: bytes):
    """Decode a GIF into (w, h, pixel_bytes of palette GRAY levels).
    Walks the real block structure: header, logical screen descriptor,
    global color table, extension blocks (skipped), image descriptor,
    LZW sub-blocks. Raises on interlace/local-color-table/no-image."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF header")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = data[pos:pos + 3 * n]
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x21:                              # extension: skip
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:
            _l, _t, w, h, iflags = struct.unpack("<HHHHB",
                                                 data[pos + 1:pos + 10])
            pos += 10
            if iflags & 0x40:
                raise NotImplementedError("interlaced GIF")
            if iflags & 0x80:
                raise NotImplementedError("local color table")
            if gct is None:
                raise ValueError("no color table")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                ln = data[pos]
                lzw += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(lzw), mcs)
            if len(idx) < w * h:
                raise ValueError("short pixel stream")
            # gray level = red channel of the palette entry
            pix = bytes(gct[i * 3] for i in idx[:w * h])
            return w, h, pix
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown block 0x{b:02x}")
    raise ValueError("no image block")
