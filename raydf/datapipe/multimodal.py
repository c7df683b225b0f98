"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool stages.

Decoding is feature-probed: ``decode_payload`` uses PIL for real image
mime types when the library is importable (probe at import time — actor
``__init__``s inherit it), and falls back to a loud ``NotImplementedError``
when the codec is genuinely absent (this container ships no codec libs;
vendored pure-Python codecs cover PNG/JPEG images, RIFF-PCM WAV audio and
YUV4MPEG2 video — other containers still need torchaudio/pyav and route
to error rows). Fake ``*/x-fake`` payloads decode
deterministically so the plumbing — schemas, small-batch actor-pool stages
(large binary payloads → small ``batch_size`` so batch × concurrency fits
worker heaps), error routing, output layout — is testable everywhere.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pandas as pd
import pyarrow as pa


def _codec_probe():
    """Import-time feature probe: PIL if installed, else None (the stub
    branch). Probed once; actors inherit the module-level result."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


_PIL = _codec_probe()

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.large_binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32(), nullable=True),
        pa.field("height", pa.int32(), nullable=True),
        pa.field("duration_ms", pa.int32(), nullable=True),
    ]
)


def synthetic_media_table(n: int, *, kind: str = "image") -> pa.Table:
    """Deterministic fake payloads (hash-derived bytes) for plumbing tests."""
    ids = np.arange(n, dtype=np.int64)
    payloads = [hashlib.sha256(f"{kind}-{i}".encode()).digest() * 32 for i in ids]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array([kind] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array([f"{kind}/x-fake"] * n, pa.string()),
            "width": pa.array([64] * n, pa.int32()),
            "height": pa.array([64] * n, pa.int32()),
            "duration_ms": pa.nulls(n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def synthetic_png_table(n: int) -> pa.Table:
    """Deterministic REAL-container fixtures: 32×32 greyscale PNGs whose
    pixels are the sha256(``image-i``) digest repeated 32× (the same byte
    contract as :func:`synthetic_media_table`, so a SQL oracle rebuilds
    every pixel) — but the payload is an actual encoded PNG, so decoding
    exercises zlib inflate + chunk parsing + unfiltering, not a cast."""
    from raydf.datapipe.png import encode_png

    ids = np.arange(n, dtype=np.int64)
    payloads = []
    for i in ids:
        raw = hashlib.sha256(f"image-{i}".encode()).digest() * 32
        payloads.append(encode_png(np.frombuffer(raw, np.uint8).reshape(32, 32)))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["image/png"] * n, pa.string()),
            "width": pa.array([32] * n, pa.int32()),
            "height": pa.array([32] * n, pa.int32()),
            "duration_ms": pa.nulls(n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def synthetic_jpeg_table(n: int) -> pa.Table:
    """Deterministic REAL-container fixtures #2 — the dominant real-world
    image format: 32×32 greyscale baseline JPEGs whose pixels are
    BLOCK-CONSTANT (each 8×8 block = one byte of sha256(``jpeg-i``):
    ``pixel(y, x) = digest[(y//8)*4 + (x//8)]``). A flat block has zero
    AC energy and an integer DC, so under the all-ones quantization
    table the DCT → quantize → IDCT round trip is bit-exact — the
    decode stays SQL-hash-checkable while exercising the full baseline
    path (marker parse, Huffman entropy decode, dequant, IDCT) of
    :mod:`raydf.datapipe.jpeg`."""
    from raydf.datapipe.jpeg import encode_jpeg

    ids = np.arange(n, dtype=np.int64)
    payloads = []
    for i in ids:
        raw = hashlib.sha256(f"jpeg-{i}".encode()).digest()[:16]
        blocks = np.frombuffer(raw, np.uint8).reshape(4, 4)
        px = np.kron(blocks, np.ones((8, 8), np.uint8))
        payloads.append(encode_jpeg(px))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["image/jpeg"] * n, pa.string()),
            "width": pa.array([32] * n, pa.int32()),
            "height": pa.array([32] * n, pa.int32()),
            "duration_ms": pa.nulls(n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def synthetic_wav_table(n: int) -> pa.Table:
    """Deterministic REAL-container audio fixtures: 1024-sample 16 kHz mono
    16-bit PCM WAVs whose samples are the sha256(``wav-i``) digest read as
    16 little-endian int16 values, tiled 64× (``sample(p) = base[p % 16]``,
    ``base[j] = int16le(digest[2j:2j+2])``) — so a SQL oracle rebuilds
    every sample from the hex digest, while the payload is an actual RIFF
    stream and decoding exercises chunk walking + PCM validation
    (:mod:`raydf.datapipe.wav`)."""
    from raydf.datapipe.wav import encode_wav

    ids = np.arange(n, dtype=np.int64)
    payloads = []
    for i in ids:
        base = np.frombuffer(
            hashlib.sha256(f"wav-{i}".encode()).digest(), dtype="<i2"
        ).astype(np.int16)
        payloads.append(encode_wav(np.tile(base, 64), rate=16000))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["audio"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["audio/wav"] * n, pa.string()),
            "width": pa.nulls(n, pa.int32()),
            "height": pa.nulls(n, pa.int32()),
            "duration_ms": pa.array([64] * n, pa.int32()),  # 1024 / 16 kHz
        },
        schema=MEDIA_SCHEMA,
    )


def synthetic_y4m_table(n: int, *, frames: int = 8) -> pa.Table:
    """Deterministic REAL-container video fixtures: 8-frame 32×32 25 fps
    YUV4MPEG2 streams whose frame-``f`` luma plane is the
    sha256(``vid-i-f``) digest repeated 32× (the PNG fixtures' byte
    contract, per frame), chroma neutral — so a SQL oracle rebuilds every
    sampled frame's pixels while the payload is an actual y4m stream and
    sampling exercises header parse + fixed-offset frame seeks
    (:mod:`raydf.datapipe.y4m`)."""
    from raydf.datapipe.y4m import encode_y4m

    ids = np.arange(n, dtype=np.int64)
    payloads = []
    for i in ids:
        fr = np.stack(
            [
                np.frombuffer(
                    hashlib.sha256(f"vid-{i}-{f}".encode()).digest() * 32, np.uint8
                ).reshape(32, 32)
                for f in range(frames)
            ]
        )
        payloads.append(encode_y4m(fr, fps=(25, 1)))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["video"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["video/x-yuv4mpeg"] * n, pa.string()),
            "width": pa.array([32] * n, pa.int32()),
            "height": pa.array([32] * n, pa.int32()),
            "duration_ms": pa.array([frames * 40] * n, pa.int32()),  # 25 fps
        },
        schema=MEDIA_SCHEMA,
    )


def decode_payload(payload: bytes, mime: str) -> np.ndarray:
    """Decode a media payload to a 2-D uint8 pixel array.

    * ``*/x-fake`` — deterministic pseudo-pixels (hash-derived bytes), the
      always-available plumbing-test path.
    * ``image/png`` — real container decode: PIL when the import-time
      probe found it, else the vendored pure-Python codec
      (:mod:`raydf.datapipe.png` — zlib inflate, chunk parse, unfilter).
    * ``image/jpeg`` — real container decode: PIL when present, else the
      vendored pure-Python baseline codec (:mod:`raydf.datapipe.jpeg` —
      marker parse, Huffman entropy decode, dequant, IDCT; progressive /
      subsampled streams raise loudly).
    * other ``image/*`` — real decode via PIL when present.
    * anything else — NotImplementedError, routed to ``decode_error`` rows
      by the featurizer rather than crashing the stage."""
    if mime.endswith("/x-fake"):
        raw = np.frombuffer(payload, dtype=np.uint8)
        side = int(np.sqrt(len(raw)))
        return raw[: side * side].reshape(side, side)
    if mime.startswith("image/") and _PIL is not None:
        img = _PIL.open(io.BytesIO(payload))
        return np.asarray(img.convert("L"), dtype=np.uint8)
    if mime == "image/png":
        from raydf.datapipe import png

        return png.to_grey(png.decode_png(payload))
    if mime == "image/jpeg":
        from raydf.datapipe import jpeg

        return jpeg.to_grey(jpeg.decode_jpeg(payload))
    raise NotImplementedError(
        f"no codec for {mime}: install PIL (images) / torchaudio / pyav"
    )


# back-compat alias (pre-probe name); the probe supersedes the pure stub
_decode_stub = decode_payload


class MediaFeaturizer:
    """Actor-pool stage: decode → feature-extract (64-dim signature).

    __init__ is where a real model would load (once per actor); __call__
    handles a small batch of large binary rows."""

    def __init__(self, *, feature_dim: int = 64):
        self.dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok, err, sums, wsums = [], [], [], [], []
        for payload, mime in zip(
            batch["payload"].to_pylist(), batch["mime"].to_pylist()
        ):
            try:
                px = decode_payload(payload, mime)
                hist, _ = np.histogram(px, bins=self.dim, range=(0, 255))
                v = hist.astype(np.float32)
                v /= np.linalg.norm(v) or 1.0
                feats.append(v.tolist())
                ok.append(True)
                err.append(None)
                # integer decode checksums — the SQL-checkable contract
                # (position-weighted, so any pixel reorder/corruption shows)
                flat = px.reshape(-1).astype(np.int64)
                sums.append(int(flat.sum()))
                wsums.append(int((flat * (np.arange(len(flat)) + 1)).sum()))
            except Exception as e:  # absent codec OR corrupt payload —
                # either way: an error ROW, never a crashed stage
                feats.append([0.0] * self.dim)
                ok.append(False)
                err.append(str(e) or type(e).__name__)
                sums.append(0)
                wsums.append(0)
        out = batch.select(["media_id", "kind"])
        out = out.append_column(
            "features", pa.array(feats, pa.list_(pa.float32(), self.dim))
        )
        out = out.append_column("decoded", pa.array(ok, pa.bool_()))
        out = out.append_column("decode_error", pa.array(err, pa.string()))
        out = out.append_column("px_sum", pa.array(sums, pa.int64()))
        out = out.append_column("px_wsum", pa.array(wsums, pa.int64()))
        return out


class MediaHistogrammer:
    """Actor-pool stage: decode → integer per-bin pixel histogram rows.

    The SQL-checkable decode-correctness contract: MediaFeaturizer's float
    features stand in for a model, but these integer counts a SQL engine
    can recompute exactly from the synthetic sha256-derived payloads
    (np.histogram bin edges i*255/bins are exact doubles, so
    bin = min(floor(v*bins/255), bins-1) on both sides)."""

    def __init__(self, *, bins: int = 64):
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, bin_idx, counts = [], [], []
        all_bins = np.arange(self.bins, dtype=np.int32)
        for mid, payload, mime in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["mime"].to_pylist(),
        ):
            px = decode_payload(payload, mime)
            hist, _ = np.histogram(px, bins=self.bins, range=(0, 255))
            mids.append(np.full(self.bins, mid, np.int64))
            bin_idx.append(all_bins)
            counts.append(hist.astype(np.int64))
        return pa.table(
            {
                "media_id": pa.array(np.concatenate(mids), pa.int64()),
                "bin": pa.array(np.concatenate(bin_idx), pa.int32()),
                "n": pa.array(np.concatenate(counts), pa.int64()),
            }
        )


class AudioFeaturizer:
    """Actor-pool stage: decode audio → integer waveform signatures plus a
    windowed-RMS feature vector (the model stand-in).

    The SQL-checkable contract mirrors MediaFeaturizer's px_sum/px_wsum:
    ``smp_sum`` (Σ samples), position-weighted ``smp_wsum``
    (Σ s[p]·(p+1)), and ``zcross`` (count of sign flips, p≥1, negatives vs
    non-negatives) — all exact int64 a SQL engine recomputes from the
    synthetic digest-derived samples. torchaudio-class decoders would slot
    into ``__init__`` (once per actor); the vendored RIFF codec keeps the
    path real in this container."""

    def __init__(self, *, windows: int = 16):
        self.windows = windows

    def __call__(self, batch: pa.Table) -> pa.Table:
        from raydf.datapipe.wav import decode_wav

        n_s, rates, sums, wsums, zx, ok, err, feats = [], [], [], [], [], [], [], []
        for payload, mime in zip(
            batch["payload"].to_pylist(), batch["mime"].to_pylist()
        ):
            try:
                if mime == "audio/x-fake":
                    s = np.frombuffer(payload, dtype="<i2").astype(np.int64)
                    rate = 16000
                elif mime in ("audio/wav", "audio/x-wav", "audio/wave"):
                    frames, rate = decode_wav(payload)
                    s = (frames if frames.ndim == 1 else frames[:, 0]).astype(
                        np.int64
                    )
                else:
                    raise NotImplementedError(
                        f"no codec for {mime}: install torchaudio/soundfile"
                    )
                neg = s < 0
                w = np.array_split(s.astype(np.float64), self.windows)
                rms = [float(np.sqrt(np.mean(x * x))) if len(x) else 0.0 for x in w]
                n_s.append(len(s))
                rates.append(int(rate))
                sums.append(int(s.sum()))
                wsums.append(int((s * (np.arange(len(s)) + 1)).sum()))
                zx.append(int((neg[1:] != neg[:-1]).sum()))
                ok.append(True)
                err.append(None)
                feats.append(rms)
            except Exception as e:
                n_s.append(0)
                rates.append(0)
                sums.append(0)
                wsums.append(0)
                zx.append(0)
                ok.append(False)
                err.append(str(e) or type(e).__name__)
                feats.append([0.0] * self.windows)
        out = batch.select(["media_id", "kind"])
        out = out.append_column("decoded", pa.array(ok, pa.bool_()))
        out = out.append_column("decode_error", pa.array(err, pa.string()))
        out = out.append_column("n_samples", pa.array(n_s, pa.int64()))
        out = out.append_column("rate", pa.array(rates, pa.int32()))
        out = out.append_column("smp_sum", pa.array(sums, pa.int64()))
        out = out.append_column("smp_wsum", pa.array(wsums, pa.int64()))
        out = out.append_column("zcross", pa.array(zx, pa.int64()))
        out = out.append_column(
            "rms", pa.array(feats, pa.list_(pa.float32(), self.windows))
        )
        return out


class VideoFrameSampler:
    """Actor-pool stage: REAL frame sampling — one output row per sampled
    frame, pixels actually read from the container (supersedes
    :func:`frame_sample_stub`, which only exploded rows by duration).

    Relies on y4m's fixed-frame-size property: sampling is an O(sampled)
    byte-offset slice, so a 2-hour stream at every_n=250 reads ~0.4% of
    the payload. The emitted px_sum / px_wsum are the same exact-int64
    decode-correctness contract as the image featurizers. A pyav-class
    demuxer would slot into ``__init__``; error rows, never crashed
    stages, on unknown containers."""

    def __init__(self, *, every_n: int = 1):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from raydf.datapipe.y4m import sample_frames

        ids, fidx, sums, wsums = [], [], [], []
        e_ids, e_msg = [], []
        for mid, payload, mime in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["mime"].to_pylist(),
        ):
            try:
                if mime not in ("video/x-yuv4mpeg", "video/y4m"):
                    raise NotImplementedError(
                        f"no demuxer for {mime}: install pyav"
                    )
                for i, luma in sample_frames(payload, every=self.every_n):
                    flat = luma.reshape(-1).astype(np.int64)
                    ids.append(mid)
                    fidx.append(i)
                    sums.append(int(flat.sum()))
                    wsums.append(int((flat * (np.arange(len(flat)) + 1)).sum()))
            except Exception as e:
                e_ids.append(mid)
                e_msg.append(str(e) or type(e).__name__)
        n = len(ids)
        out = pa.table(
            {
                "media_id": pa.array(ids + e_ids, pa.int64()),
                "frame": pa.array(fidx + [-1] * len(e_ids), pa.int32()),
                "decoded": pa.array([True] * n + [False] * len(e_ids), pa.bool_()),
                "decode_error": pa.array([None] * n + e_msg, pa.string()),
                "px_sum": pa.array(sums + [0] * len(e_ids), pa.int64()),
                "px_wsum": pa.array(wsums + [0] * len(e_ids), pa.int64()),
            }
        )
        return out


class ImageResizer:
    """Actor-pool stage: resize stub (nearest-neighbor on fake pixels)."""

    def __init__(self, *, size: int = 32):
        self.size = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for payload, mime in zip(
            batch["payload"].to_pylist(), batch["mime"].to_pylist()
        ):
            px = decode_payload(payload, mime)
            idx = (np.linspace(0, px.shape[0] - 1, self.size)).astype(int)
            outs.append(px[np.ix_(idx, idx)].tobytes())
        out = batch.select(["media_id"])
        out = out.append_column("resized", pa.array(outs, pa.large_binary()))
        out = out.append_column(
            "size", pa.array([self.size] * len(outs), pa.int32())
        )
        return out


def frame_sample_stub(batch: pa.Table, *, every_ms: int = 1000) -> pa.Table:
    """Video frame-sampling plumbing: one output row per sampled frame.

    Frame extraction itself is stubbed (duration-driven row explosion)."""
    ids, frame_idx = [], []
    for mid, dur in zip(batch["media_id"].to_pylist(), batch["duration_ms"].to_pylist()):
        n = max(1, (dur or 0) // every_ms)
        ids.extend([mid] * n)
        frame_idx.extend(range(n))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "frame": pa.array(frame_idx, pa.int32()),
        }
    )


def featurize(media_ds, *, concurrency: int = 2, batch_size: int = 64):
    """Small batches: payload bytes × batch_size × concurrency must fit the
    worker heap (the binary-column sizing rule)."""
    return media_ds.map_batches(
        MediaFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
