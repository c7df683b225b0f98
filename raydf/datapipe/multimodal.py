"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool stages.

Decoding is feature-probed: ``decode_payload`` uses PIL for real image
mime types when the library is importable (probe at import time — actor
``__init__``s inherit it), and falls back to a loud ``NotImplementedError``
when the codec is genuinely absent (this container ships no codec libs;
audio/video still need torchaudio/pyav). Fake ``*/x-fake`` payloads decode
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
