"""Minimal pure-Python WAV (RIFF / PCM) codec — vendored so the multimodal
audio path exercises a REAL audio container format in this codec-less
container (no torchaudio/soundfile; see multimodal.py's import probe
pattern). Companion to png.py / jpeg.py on the image side.

Implements the public RIFF/WAVE format (Microsoft/IBM multimedia spec,
also RFC 2361 registry): 16-bit signed little-endian PCM, any channel
count, proper chunk walking (unknown chunks like LIST/INFO are skipped
with even-byte padding, as the spec requires). Non-PCM encodings
(float, ADPCM, mu-law) raise loudly rather than mis-decode. Deliberately
tiny: this is the TEST/fixture codec; production audio should decode
through a native library on the actor pool — the Ray-side plumbing
(schemas, batch sizing, error routing) is identical either way.

Reference parity: inferdf-rs has no media layer; this belongs to the
training-data operator families layered on top (multimodal columns).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, *, rate: int = 16000) -> bytes:
    """int16 samples → WAV bytes. (n,) → mono; (n, ch) → interleaved.

    Canonical minimal layout: RIFF header, 16-byte PCM ``fmt `` chunk,
    ``data`` chunk (padded to even length per spec)."""
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        n, ch = samples.shape[0], 1
    elif samples.ndim == 2:
        n, ch = samples.shape
    else:
        raise ValueError(f"unsupported sample shape {samples.shape}")
    data = samples.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block_align, block_align, 16)
    pad = b"\x00" if len(data) % 2 else b""
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        + pad
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 array, sample rate). Mono → (n,), else (n, ch).

    Walks the chunk list: ``fmt `` must precede ``data``; any other chunk
    (LIST, fact, cue, bext…) is skipped, honoring the spec's even-byte
    chunk padding. Only format tag 1 (integer PCM) at 16 bits/sample is
    accepted — anything else raises so a wrong decode can't look right."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    channels = rate = bits = fmt_tag = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt_tag, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if fmt_tag is None:
                raise ValueError("data chunk before fmt chunk")
            if fmt_tag != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV encoding (format={fmt_tag}, bits={bits}): "
                    "only 16-bit integer PCM is vendored"
                )
            frames = np.frombuffer(body[: size - size % 2], dtype="<i2").astype(
                np.int16
            )
            if channels > 1:
                frames = frames[: len(frames) - len(frames) % channels].reshape(
                    -1, channels
                )
            return frames, rate
        pos += 8 + size + (size % 2)  # spec: chunks are word-aligned
    raise ValueError("no data chunk found")
