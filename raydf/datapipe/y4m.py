"""Minimal pure-Python YUV4MPEG2 (.y4m) video codec — vendored so the
multimodal video path exercises a REAL video container format in this
codec-less container (no pyav/ffmpeg; see multimodal.py's probe pattern).

Y4M is the uncompressed interchange format the ffmpeg/mjpegtools
ecosystem standardizes on: a plain-text stream header
(``YUV4MPEG2 W<w> H<h> F<num>:<den> ...``), then one ``FRAME\\n`` marker
per frame followed by raw planar YUV. Because frames are fixed-size,
frame N lives at a computable byte offset — so SAMPLING frames is an
O(sampled) slice, never a full decode; that is the property the
VideoFrameSampler stage relies on and the reason this format (not a
DCT-coded one) is the vendored baseline. Chroma modes C420* / C422 /
C444 / Cmono are supported for geometry; only the luma plane is
returned (features here are luma statistics). Production video should
decode through a native library on the actor pool — the Ray-side
plumbing (schemas, small-batch sizing, row explosion) is identical.

Reference parity: inferdf-rs has no media layer; this belongs to the
training-data operator families layered on top (multimodal columns).
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"

# chroma tag → (plane count beyond luma, subsample divisor x, divisor y)
_CHROMA = {
    "420": (2, 2, 2),
    "420jpeg": (2, 2, 2),
    "420mpeg2": (2, 2, 2),
    "420paldv": (2, 2, 2),
    "422": (2, 2, 1),
    "444": (2, 1, 1),
    "mono": (0, 1, 1),
}


def encode_y4m(frames: np.ndarray, *, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n, h, w) uint8 luma frames → .y4m bytes (C420jpeg, chroma = 128).

    Grey input is encoded as 4:2:0 with neutral chroma planes — the shape
    every decoder accepts — rather than Cmono, so the fixture payloads
    look like ordinary video."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 3:
        raise ValueError(f"expected (n, h, w) luma frames, got {frames.shape}")
    n, h, w = frames.shape
    if h % 2 or w % 2:
        raise ValueError("C420 needs even dimensions")
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420jpeg\n".encode()
    chroma = b"\x80" * ((h // 2) * (w // 2))
    out = [header]
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(frames[f].tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def _parse_header(payload: bytes):
    """→ (w, h, (fn, fd), frame_bytes, first_frame_offset)."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fn, fd = 25, 1
    chroma = "420jpeg"
    for tok in payload[len(_MAGIC) : nl].decode("ascii", "replace").split():
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fn, fd = (int(x) for x in tok[1:].split(":"))
        elif tok[0] == "C":
            chroma = tok[1:]
    if w is None or h is None:
        raise ValueError("y4m header missing W/H")
    if chroma not in _CHROMA:
        raise ValueError(f"unsupported y4m chroma mode C{chroma}")
    planes, dx, dy = _CHROMA[chroma]
    frame_bytes = h * w + planes * ((h // dy) * (w // dx))
    return w, h, (fn, fd), frame_bytes, nl + 1


def frame_count(payload: bytes) -> int:
    _, _, _, fb, off = _parse_header(payload)
    return (len(payload) - off) // (6 + fb)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """.y4m bytes → ((n, h, w) uint8 luma array, (fps_num, fps_den))."""
    w, h, fps, fb, off = _parse_header(payload)
    n = (len(payload) - off) // (6 + fb)
    frames = np.empty((n, h, w), np.uint8)
    for i in range(n):
        frames[i] = _luma_at(payload, off, fb, w, h, i)
    return frames, fps


def _luma_at(payload: bytes, off: int, fb: int, w: int, h: int, i: int) -> np.ndarray:
    # fixed-offset seek requires bare markers; per-frame params would shift
    # every later offset, so they raise loudly instead of mis-slicing
    base = off + i * (6 + fb)
    if payload[base : base + 6] != b"FRAME\n":
        raise ValueError(f"bare FRAME marker missing at frame {i} "
                         "(frame-level y4m params are not supported)")
    start = base + 6
    return np.frombuffer(payload[start : start + h * w], np.uint8).reshape(h, w)


def sample_frames(payload: bytes, *, every: int = 1) -> list[tuple[int, np.ndarray]]:
    """[(frame_index, luma)] for frames 0, every, 2·every… — an O(sampled)
    byte-offset slice (the fixed-frame-size property), NOT a full decode."""
    w, h, _, fb, off = _parse_header(payload)
    n = (len(payload) - off) // (6 + fb)
    return [(i, _luma_at(payload, off, fb, w, h, i)) for i in range(0, n, every)]
