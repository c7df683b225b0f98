"""Minimal pure-Python baseline JPEG codec (stdlib + numpy) — vendored so
the multimodal decode path exercises the dominant real-world image
container in this codec-less container (no PIL; multimodal.py's import
probe prefers PIL when present — this is the fallback, mirroring
raydf.datapipe.png).

Implements the public ITU-T T.81 / ISO 10918-1 baseline sequential DCT
process: JFIF marker parse (SOI APP0 DQT SOF0 DHT SOS DRI EOI), Huffman
entropy decode with byte-stuffing and restart markers, dequantization,
2-D inverse DCT (vectorized numpy matrix form), level shift + clamp.
Components: greyscale (1) and YCbCr 4:4:4 (3, no subsampling) — the
encoder emits those two; subsampled or progressive streams raise loudly
(decode_error rows downstream, never silent wrong pixels).

Encoding uses the T.81 Annex K example Huffman tables and caller-chosen
quantization tables (default all-ones, which is spec-legal and makes
BLOCK-CONSTANT images round-trip bit-exactly: a flat 8x8 block has zero
AC energy and an integer DC, so quantize->dequantize->IDCT reproduces
the input byte — the property the hash-checked fixtures rely on).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# T.81 Annex K.3 example Huffman tables: (bits[1..16], huffval)
_DC_LUM_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# orthonormal 8-point DCT-II matrix (the JPEG 2-D DCT is C @ B @ C.T)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.sqrt((1 if _u else 0.5) / 4.0) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16.0
        )


def _build_huff(bits, vals):
    """(bits, huffval) -> {(length, code): value} per T.81 C.2."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_codes(bits, vals):
    """(bits, huffval) -> {value: (code, length)} for encoding."""
    inv = {}
    for (length, code), v in _build_huff(bits, vals).items():
        inv[v] = (code, length)
    return inv


# ---------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    amp = v if v > 0 else v + (1 << size) - 1
    return size, amp


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht_payload(tc: int, th: int, bits, vals) -> bytes:
    return bytes([tc << 4 | th]) + bytes(bits[1:17]) + bytes(vals)


def encode_jpeg(px: np.ndarray, *, quant: np.ndarray | None = None) -> bytes:
    """uint8 array -> baseline JFIF bytes. (h, w) -> greyscale; (h, w, 3)
    -> YCbCr 4:4:4 where the INPUT IS TAKEN AS YCbCr PLANES VERBATIM (the
    fixture contract: no color transform on encode, the decoder's
    YCbCr->greyscale luma extraction then reads plane 0 back). h and w
    must be multiples of 8 (fixture codec: no edge-block padding).

    Default quant table is all-ones (spec-legal), under which
    block-constant inputs round-trip bit-exactly."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    grey = px.ndim == 2
    if not grey and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError(f"unsupported pixel shape {px.shape}")
    h, w = px.shape[:2]
    if h % 8 or w % 8:
        raise ValueError("fixture codec: dimensions must be multiples of 8")
    q = np.ones(64, np.int64) if quant is None else np.asarray(quant, np.int64).reshape(64)

    ncomp = 1 if grey else 3
    planes = [px] if grey else [px[:, :, c] for c in range(3)]

    dc_codes = _huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)

    out = bytearray(b"\xFF\xD8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(q[z]) for z in ZIGZAG))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])  # id, 1x1 sampling, qtable 0
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_payload(0, 0, _DC_LUM_BITS, _DC_LUM_VALS))
    out += _seg(0xC4, _dht_payload(1, 0, _AC_LUM_BITS, _AC_LUM_VALS))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    pred = [0] * ncomp
    qz = q[ZIGZAG]  # quant in zigzag order
    for by in range(h // 8):
        for bx in range(w // 8):
            for c in range(ncomp):
                block = planes[c][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                f = _C @ (block.astype(np.float64) - 128.0) @ _C.T
                coef = np.round(f.reshape(64)[ZIGZAG] / qz).astype(np.int64)
                # DC
                diff = int(coef[0]) - pred[c]
                pred[c] = int(coef[0])
                size, amp = _magnitude(diff)
                code, length = dc_codes[size]
                bw.write(code, length)
                if size:
                    bw.write(amp, size)
                # AC with run-length of zeros
                run = 0
                for k in range(1, 64):
                    v = int(coef[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_codes[0xF0]  # ZRL
                        bw.write(code, length)
                        run -= 16
                    size, amp = _magnitude(v)
                    code, length = ac_codes[run << 4 | size]
                    bw.write(code, length)
                    bw.write(amp, size)
                    run = 0
                if run:
                    code, length = ac_codes[0x00]  # EOB
                    bw.write(code, length)
    out += bw.flush()
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF  # pad past end
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resets via sync_restart
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:
                    self.pos -= 1  # EOI or other marker: pad
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just after the next RSTn marker and reset bit state."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("jpeg: expected restart marker")


def _decode_huff(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("jpeg: invalid Huffman code")


def _extend(amp: int, size: int) -> int:
    if size == 0:
        return 0
    return amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 pixels: (h, w) for greyscale, or
    (h, w, 3) raw component planes for 3-component 4:4:4 (no color
    transform — symmetric with encode_jpeg's plane contract; callers
    wanting luma take plane 0). Raises ValueError / NotImplementedError
    on progressive, subsampled, or arithmetic-coded streams."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT (possibly multiple tables)
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                o += 1
                if pq:
                    vals = np.frombuffer(seg[o:o + 128], ">u2").astype(np.int64)
                    o += 128
                else:
                    vals = np.frombuffer(seg[o:o + 64], np.uint8).astype(np.int64)
                    o += 64
                t = np.zeros(64, np.int64)
                t[ZIGZAG] = vals
                qtables[tq] = t
        elif marker == 0xC4:  # DHT (possibly multiple tables)
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = [0] + list(seg[o + 1:o + 17])
                n = sum(bits)
                vals = list(seg[o + 17:o + 17 + n])
                huff[(tc, th)] = _build_huff(bits, vals)
                o += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("jpeg: only 8-bit baseline")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError(
                        "jpeg: subsampled components not supported "
                        "(vendored fixture codec decodes 4:4:4 only)"
                    )
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3) or 0xC5 <= marker <= 0xCF and marker != 0xC8:
            raise NotImplementedError("jpeg: progressive/extended not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scomp = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scomp.append((cs, tables >> 4, tables & 0xF))
            h, w, comps = frame
            if ns != len(comps):
                raise NotImplementedError("jpeg: multi-scan not supported")
            br = _BitReader(data[pos + seglen:])
            bh, bw_ = (h + 7) // 8, (w + 7) // 8
            planes = [
                np.zeros((bh * 8, bw_ * 8), np.float64) for _ in comps
            ]
            pred = [0] * ns
            qs = []
            for (cid, tq), _s in zip(comps, scomp):
                qs.append(qtables[tq].reshape(8, 8))
            mcu = 0
            for by in range(bh):
                for bx in range(bw_):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        br.sync_restart()
                        pred = [0] * ns
                    for ci in range(ns):
                        _, td, ta = scomp[ci]
                        dct = huff[(0, td)]
                        act = huff[(1, ta)]
                        size = _decode_huff(br, dct)
                        diff = _extend(br.bits(size), size)
                        pred[ci] += diff
                        coef = np.zeros(64, np.float64)
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            coef[k] = _extend(br.bits(s), s)
                            k += 1
                        blk = np.zeros(64, np.float64)
                        blk[ZIGZAG] = coef
                        f = blk.reshape(8, 8) * qs[ci]
                        pixel = _C.T @ f @ _C + 128.0
                        planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = pixel
                    mcu += 1
            out = [
                np.clip(np.round(p[:h, :w]), 0, 255).astype(np.uint8)
                for p in planes
            ]
            if len(out) == 1:
                return out[0]
            return np.stack(out, axis=2)
        pos += seglen
    raise ValueError("jpeg: no scan data")


def to_grey(px: np.ndarray) -> np.ndarray:
    """Component planes -> single grey plane (luma = plane 0 under the
    symmetric no-transform plane contract; already-grey passes through)."""
    if px.ndim == 2:
        return px
    return px[:, :, 0]
