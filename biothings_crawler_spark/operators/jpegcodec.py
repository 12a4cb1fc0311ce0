"""Baseline JPEG codec (ITU-T T.81, sequential DCT, grayscale) in pure
numpy/stdlib — the DCT codec that closes the multimodal plane's last
stub without faking anything: real marker segments, real canonical
Huffman entropy coding with 0xFF byte stuffing, real quantized DCT.

Scope (documented, like the PNG §9 / WAV PCM scopes): SOF0 baseline,
ONE 8-bit component (grayscale), no subsampling, no restart markers,
no progressive. The DECODER parses DQT/DHT/SOF0/SOS from the bytes —
nothing is shared with the encoder except this module's file — so a
decode exercises the full parse→huffman→dequant→IDCT path.

Exactness lane for the oracle: a block-constant image has only DC
coefficients (DC = 8·(v-128); AC exactly 0), and with the Annex-K-style
DC quantizer step of 16 an EVEN source value round-trips bit-exactly
(8·(v-128)/16 = (v-128)/2 is an integer; IDCT of a pure-DC block is
the constant DC/8 in IEEE doubles). Non-flat images round-trip within
the usual quantization error, asserted by pytest, not the oracle.

Encoder Huffman tables are fixed-length canonical (12 DC symbols at 4
bits, 162 AC run/size symbols at 8 bits) — legal per the spec, chosen
so the tables are GENERATED, not transcribed (no 162-constant table to
mistype); the decoder handles any spec-canonical DHT.
"""

from __future__ import annotations

import struct

import numpy as np

# orthonormal 8x8 DCT-II basis: JPEG's FDCT is M @ (f-128) @ M.T,
# IDCT is M.T @ F @ M
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# quantization table: DC step 16 (the Annex K luminance DC step — the
# even-value exactness lane), gentle AC steps
_QTABLE = np.full(64, 10, dtype=np.int32)
_QTABLE[0] = 16

# encoder Huffman specs: (BITS counts by length 1..16, ordered symbols)
_DC_SYMS = list(range(12))                      # size categories 0..11
_DC_BITS = [0, 0, 0, 12] + [0] * 12             # all 4-bit codes
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0] * 7 + [len(_AC_SYMS)] + [0] * 8  # all 8-bit codes


def _canonical_codes(bits, syms):
    """symbol -> (code, length) per the spec's canonical construction."""
    out, code, i = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[syms[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:           # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:           # un-stuff
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("marker inside entropy data")
                self.pos += 1
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _magnitude(v: int):
    """(size, raw bits) for a DC diff / AC value per spec F.1.2."""
    if v == 0:
        return 0, 0
    a, size = abs(v), 0
    while a:
        a >>= 1
        size += 1
    raw = v if v > 0 else v + (1 << size) - 1
    return size, raw


def _extend(raw: int, size: int) -> int:
    if size == 0:
        return 0
    return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1


def _dht_segment(tc_th: int, bits, syms) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(syms)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def jpeg_encode_gray(pix: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 array as a baseline grayscale JPEG."""
    h, w = pix.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(pix.astype(np.float64), ((0, bh * 8 - h), (0, bw * 8 - w)),
                    mode="edge")
    writer = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
            coefs = _M @ block @ _M.T
            # both the coefficient vector and _QTABLE are in zigzag
            # order here (the DQT segment carries zigzag order too)
            q = np.rint(coefs.reshape(64)[_ZIGZAG] / _QTABLE).astype(np.int64)
            size, raw = _magnitude(int(q[0]) - prev_dc)
            prev_dc = int(q[0])
            code, ln = _DC_CODES[size]
            writer.put(code, ln)
            if size:
                writer.put(raw, size)
            run = 0
            last_nz = max((i for i in range(1, 64) if q[i]), default=0)
            for i in range(1, last_nz + 1):
                if q[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    zc, zl = _AC_CODES[0xF0]
                    writer.put(zc, zl)
                    run -= 16
                s, raw = _magnitude(int(q[i]))
                code, ln = _AC_CODES[(run << 4) | s]
                writer.put(code, ln)
                writer.put(raw, s)
                run = 0
            if last_nz < 63:
                ec, el = _AC_CODES[0x00]
                writer.put(ec, el)
    scan = writer.flush()

    dqt = (b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
           + bytes(int(x) for x in _QTABLE))
    sof = (b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
           + bytes([1, 0x11, 0]))
    dht = (_dht_segment(0x00, _DC_BITS, _DC_SYMS)
           + _dht_segment(0x10, _AC_BITS, _AC_SYMS))
    sos = (b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
           + bytes([0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


def _parse_dht(body: bytes, tables: dict) -> None:
    pos = 0
    while pos < len(body):
        tc_th = body[pos]
        bits = list(body[pos + 1:pos + 17])
        n = sum(bits)
        syms = list(body[pos + 17:pos + 17 + n])
        # decode map: (length, code) -> symbol
        table, code, i = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                table[(ln, code)] = syms[i]
                code += 1
                i += 1
            code <<= 1
        tables[tc_th] = table
        pos += 17 + n


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | reader.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def jpeg_decode_gray(data: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG into an (h, w) uint8 array.
    Parses DQT/SOF0/DHT/SOS from the bytes; raises on unsupported
    shapes (multi-component, progressive, 16-bit, restart intervals)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict = {}
    htables: dict = {}
    h = w = None
    scan_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        body = data[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq_tq = body[p]
                if pq_tq >> 4:
                    raise NotImplementedError("16-bit DQT")
                qtables[pq_tq & 0xF] = np.array(
                    list(body[p + 1:p + 65]), dtype=np.int64)
                p += 65
        elif marker == 0xC0:
            _prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 1:
                raise NotImplementedError("grayscale only")
            comp_id, sampling, tq = body[6], body[7], body[8]
            if sampling != 0x11:
                raise NotImplementedError("no subsampling support")
            q_id = tq
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("baseline SOF0 only")
        elif marker == 0xC4:
            _parse_dht(body, htables)
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xDA:
            ns = body[0]
            if ns != 1:
                raise NotImplementedError("one scan component only")
            td_ta = body[2]
            scan_start = pos + 2 + ln
            break
        pos += 2 + ln
    if scan_start is None or h is None:
        raise ValueError("missing SOS/SOF0")
    dc_table = htables[td_ta >> 4]
    ac_table = htables[0x10 | (td_ta & 0xF)]
    qt = qtables[q_id]

    reader = _BitReader(data[scan_start:])
    bh, bw = (h + 7) // 8, (w + 7) // 8
    img = np.zeros((bh * 8, bw * 8))
    unzig = np.zeros(64, dtype=np.int64)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            zz = np.zeros(64, dtype=np.int64)
            size = _huff_decode(reader, dc_table)
            prev_dc += _extend(reader.bits(size), size)
            zz[0] = prev_dc
            i = 1
            while i < 64:
                sym = _huff_decode(reader, ac_table)
                if sym == 0x00:     # EOB
                    break
                if sym == 0xF0:     # ZRL
                    i += 16
                    continue
                i += sym >> 4
                if i > 63:
                    raise ValueError("AC run past block end")
                zz[i] = _extend(reader.bits(sym & 0xF), sym & 0xF)
                i += 1
            unzig[_ZIGZAG] = zz * qt
            block = _M.T @ unzig.reshape(8, 8).astype(np.float64) @ _M
            img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = block
    out = np.clip(np.rint(img + 128.0), 0, 255).astype(np.uint8)
    return out[:h, :w]
