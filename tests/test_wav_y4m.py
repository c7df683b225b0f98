"""Vendored WAV (RIFF/PCM) and Y4M (YUV4MPEG2) codecs + the audio/video
actor-pool stages built on them. Mirrors test_datapipe.py's PNG/JPEG
coverage: exact round trips, spec edge cases (chunk walking, frame
seeking), loud failures on unsupported encodings, and the stages'
exact-int64 signature contract recomputed independently with numpy."""

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pytest

from raydf.datapipe.wav import decode_wav, encode_wav
from raydf.datapipe.y4m import decode_y4m, encode_y4m, frame_count, sample_frames


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(3)
    mono = rng.integers(-(2**15), 2**15, 1001).astype(np.int16)
    s, rate = decode_wav(encode_wav(mono, rate=8000))
    assert rate == 8000 and s.ndim == 1
    np.testing.assert_array_equal(s, mono)

    stereo = rng.integers(-(2**15), 2**15, (500, 2)).astype(np.int16)
    s2, rate2 = decode_wav(encode_wav(stereo, rate=44100))
    assert rate2 == 44100 and s2.shape == (500, 2)
    np.testing.assert_array_equal(s2, stereo)


def test_wav_chunk_walk_skips_unknown_chunks():
    """Spec: readers must skip unknown chunks (with word alignment). Insert
    an odd-length LIST chunk between fmt and data."""
    mono = np.arange(-5, 5, dtype=np.int16)
    raw = encode_wav(mono, rate=16000)
    fmt_end = raw.index(b"data")
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # 5 + pad
    patched = raw[:fmt_end] + junk + raw[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    s, rate = decode_wav(patched)
    np.testing.assert_array_equal(s, mono)


def test_wav_rejects_non_pcm_and_garbage():
    raw = bytearray(encode_wav(np.zeros(4, np.int16)))
    tag_at = raw.index(b"fmt ") + 8
    struct.pack_into("<H", raw, tag_at, 3)  # IEEE float format tag
    with pytest.raises(ValueError, match="unsupported WAV encoding"):
        decode_wav(bytes(raw))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"ID3\x04not audio at all")


def test_y4m_roundtrip_and_frame_count():
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (3, 16, 32)).astype(np.uint8)
    payload = encode_y4m(frames, fps=(30, 1))
    assert frame_count(payload) == 3
    out, fps = decode_y4m(payload)
    assert fps == (30, 1)
    np.testing.assert_array_equal(out, frames)


def test_y4m_sample_frames_is_offset_seek():
    frames = np.stack([np.full((8, 8), f, np.uint8) for f in range(7)])
    payload = encode_y4m(frames)
    got = sample_frames(payload, every=3)
    assert [i for i, _ in got] == [0, 3, 6]
    for i, luma in got:
        assert luma[0, 0] == i


def test_y4m_foreign_header_params_and_bad_streams():
    # reordered/extra header params (Xtag, C420 instead of C420jpeg) parse
    frames = np.zeros((2, 4, 4), np.uint8)
    payload = encode_y4m(frames)
    head, rest = payload.split(b"\n", 1)
    patched = b"YUV4MPEG2 C420 F25:1 Xcustom W4 H4 Ip\n" + rest
    out, _ = decode_y4m(patched)
    assert out.shape == (2, 4, 4)
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"RIFF....WAVE")
    with pytest.raises(ValueError, match="chroma"):
        decode_y4m(b"YUV4MPEG2 W4 H4 C999\n")


def _wav_expected(i: int):
    base = np.frombuffer(
        hashlib.sha256(f"wav-{i}".encode()).digest(), dtype="<i2"
    ).astype(np.int64)
    s = np.tile(base, 64)
    neg = s < 0
    return (
        int(s.sum()),
        int((s * (np.arange(len(s)) + 1)).sum()),
        int((neg[1:] != neg[:-1]).sum()),
    )


def test_audio_featurizer_signatures_and_error_rows():
    from raydf.datapipe.multimodal import AudioFeaturizer, synthetic_wav_table

    t = synthetic_wav_table(6)
    # corrupt one payload: decoded=False row, stage never crashes
    payloads = t["payload"].to_pylist()
    payloads[3] = b"RIFF\x00\x00\x00\x00WAVEjunk"
    t = t.set_column(2, "payload", pa.array(payloads, pa.large_binary()))
    out = AudioFeaturizer()(t)
    assert out["decoded"].to_pylist() == [True] * 3 + [False] + [True] * 2
    for row in range(6):
        if row == 3:
            continue
        exp_sum, exp_wsum, exp_zx = _wav_expected(row)
        assert out["n_samples"][row].as_py() == 1024
        assert out["rate"][row].as_py() == 16000
        assert out["smp_sum"][row].as_py() == exp_sum
        assert out["smp_wsum"][row].as_py() == exp_wsum
        assert out["zcross"][row].as_py() == exp_zx
        rms = out["rms"][row].as_py()
        assert len(rms) == 16 and all(v >= 0 for v in rms)


def test_video_frame_sampler_signatures():
    from raydf.datapipe.multimodal import VideoFrameSampler, synthetic_y4m_table

    t = synthetic_y4m_table(4, frames=8)
    out = VideoFrameSampler(every_n=2)(t)
    assert out.num_rows == 4 * 4  # frames 0,2,4,6 per video
    for mid, frame, s, ws in zip(
        out["media_id"].to_pylist(),
        out["frame"].to_pylist(),
        out["px_sum"].to_pylist(),
        out["px_wsum"].to_pylist(),
    ):
        px = np.frombuffer(
            hashlib.sha256(f"vid-{mid}-{frame}".encode()).digest() * 32, np.uint8
        ).astype(np.int64)
        assert s == int(px.sum())
        assert ws == int((px * (np.arange(1024) + 1)).sum())


def test_video_sampler_unknown_container_is_error_row():
    from raydf.datapipe.multimodal import VideoFrameSampler, synthetic_y4m_table

    t = synthetic_y4m_table(2).set_column(
        3, "mime", pa.array(["video/mp4", "video/x-yuv4mpeg"], pa.string())
    )
    out = VideoFrameSampler(every_n=4)(t)
    df = out.to_pandas()
    bad = df[~df["decoded"]]
    assert list(bad["media_id"]) == [0] and "pyav" in bad["decode_error"].iloc[0]
    assert (df[df["decoded"]]["media_id"] == 1).all()
