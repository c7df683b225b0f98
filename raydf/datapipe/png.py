"""Minimal pure-Python PNG codec (stdlib zlib + numpy) — vendored so the
multimodal decode path exercises a REAL image container format in this
codec-less container (no PIL; see multimodal.py's import probe, which
prefers PIL when present).

Implements the public W3C PNG specification (also RFC 2083): 8-bit
greyscale / RGB / RGBA, non-interlaced, all five scanline filters on
decode, filter 0 on encode. Deliberately tiny: this is the TEST/fixture
codec; production images should decode through a native library on the
actor pool — the Ray-side plumbing (schemas, batch sizing, error routing)
is identical either way.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # grey, RGB, RGBA


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    """uint8 array → PNG bytes. (h, w) → greyscale; (h, w, 3) → RGB;
    (h, w, 4) → RGBA. Filter 0 on every scanline."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        h, w, ct = px.shape[0], px.shape[1], 0
        rows = px.reshape(h, w)
    elif px.ndim == 3 and px.shape[2] in (3, 4):
        h, w = px.shape[:2]
        ct = 2 if px.shape[2] == 3 else 6
        rows = px.reshape(h, w * px.shape[2])
    else:
        raise ValueError(f"unsupported pixel shape {px.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    raw = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        up = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up — no left dependency: fully vectorized
            cur = (line + up) & 0xFF
        else:  # Sub/Average/Paeth carry a left dependency: per-pixel walk
            cur = np.zeros(stride, np.int32)
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(up[i])
                c = int(out[y - 1, i - ch]) if (y and i >= ch) else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                elif ft == 4:
                    pred = _paeth(a, b, c)
                else:
                    raise ValueError(f"bad PNG filter type {ft}")
                cur[i] = (int(line[i]) + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, ch) if ch > 1 else out.reshape(h, w)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 pixel array ((h, w) grey or (h, w, ch))."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("not a PNG: missing IHDR/IDAT")
    w, h, depth, ct, comp, filt, interlace = ihdr
    if depth != 8 or ct not in _CHANNELS or comp or filt or interlace:
        raise NotImplementedError(
            f"vendored codec handles 8-bit grey/RGB/RGBA non-interlaced only "
            f"(got depth={depth} color={ct} interlace={interlace})"
        )
    ch = _CHANNELS[ct]
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (1 + w * ch):
        raise ValueError("PNG data length mismatch")
    return _unfilter(raw, h, w, ch)


def to_grey(px: np.ndarray) -> np.ndarray:
    """Collapse RGB/RGBA to greyscale with the integer ITU-R 601 luma
    ((299·R + 587·G + 114·B) // 1000) — deterministic, SQL-reproducible."""
    if px.ndim == 2:
        return px
    r, g, b = (px[..., i].astype(np.int64) for i in range(3))
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
