"""WAV PCM + MJPEG-AVI codecs and their multimodal integration."""

import numpy as np
import pandas as pd
import pytest

from lib_gdal_spark.operators.multimodal import (
    MEDIA_SCHEMA, audio_features, video_frame_sample,
)
from lib_gdal_spark.sources.avi import (
    decode_avi_frames, parse_avi, write_avi_mjpeg,
)
from lib_gdal_spark.sources.jpeg import write_jpeg
from lib_gdal_spark.sources.wav import parse_wav, write_wav


def test_wav16_roundtrip_exact():
    rng = np.random.default_rng(0)
    s = rng.integers(-32768, 32768, (777, 2)).astype(np.int16)
    d, sr = parse_wav(write_wav(s, 16000))
    assert sr == 16000 and np.array_equal(d, s)


def test_wav8_keeps_top_byte():
    rng = np.random.default_rng(1)
    s = (rng.integers(-128, 128, 500).astype(np.int16) << 8)
    d, _ = parse_wav(write_wav(s, 8000, bits=8))
    assert np.array_equal(d[:, 0], s)


def test_wav_skips_unknown_chunks_and_rejects_compressed():
    import struct

    s = np.arange(-5, 5, dtype=np.int16)
    raw = bytearray(write_wav(s, 8000))
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    raw[12:12] = extra                # inject a chunk before fmt
    raw[4:8] = struct.pack("<I", struct.unpack("<I", bytes(raw[4:8]))[0]
                           + len(extra))
    d, _ = parse_wav(bytes(raw))
    assert np.array_equal(d[:, 0], s)
    bad = bytearray(write_wav(s, 8000))
    bad[20:22] = (85).to_bytes(2, "little")   # format tag 85 = MP3
    with pytest.raises(NotImplementedError):
        parse_wav(bytes(bad))


def _block_frames(rng, n, nby=3, nbx=4):
    return [np.kron(rng.integers(0, 256, (nby, nbx)),
                    np.ones((8, 8), dtype=int)).astype(np.uint8)
            for _ in range(n)]


def test_avi_roundtrip_exact_frames():
    rng = np.random.default_rng(2)
    px = _block_frames(rng, 7)
    avi = write_avi_mjpeg([write_jpeg(f) for f in px], 24, 32, 24)
    info, dec = decode_avi_frames(avi)
    assert (info["fps"], info["width"], info["height"],
            info["n_frames"]) == (24, 32, 24, 7)
    assert all(np.array_equal(a, b) for a, b in zip(dec, px))
    with pytest.raises(ValueError):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_audio_features_real_wav(spark):
    sr = 8000
    rows = []
    want = {}
    for m in range(4):
        i = np.arange(sr // 2)
        s = (((m * 7 + i * 13) % 2003) - 1001).astype(np.int16)
        rows.append((m, "audio", write_wav(s, sr), 0, 0, 1,
                     1, 1, None, None))  # metadata deliberately wrong
        f = s.astype(np.float64) / 32768.0
        want[m] = (len(s) / sr, float(np.sqrt((f ** 2).mean())))
    media = spark.createDataFrame(pd.DataFrame(rows, columns=[
        "media_id", "kind", "payload", "width", "height", "channels",
        "sample_rate", "n_samples", "fps", "n_frames"]))
    got = {r["media_id"]: (r["duration_s"], r["rms"])
           for r in audio_features(media, strict=True).collect()}
    for m, (dur, rms) in want.items():
        assert got[m][0] == pytest.approx(dur, abs=0)
        assert got[m][1] == pytest.approx(rms, rel=1e-12)


def test_video_frame_sample_real_avi(spark):
    rng = np.random.default_rng(3)
    px = _block_frames(rng, 10)
    avi = write_avi_mjpeg([write_jpeg(f) for f in px], 5, 32, 24)
    media = spark.createDataFrame(pd.DataFrame(
        [(0, "video", avi, 0, 0, 3, None, None, 99.0, 2)],
        columns=["media_id", "kind", "payload", "width", "height",
                 "channels", "sample_rate", "n_samples", "fps",
                 "n_frames"]))
    got = {r["frame_idx"]: (r["t_s"], r["mean"]) for r in
           video_frame_sample(media, every_n=4, strict=True).collect()}
    assert set(got) == {0, 4, 8}     # real frame count, not metadata's 2
    for k in got:
        assert got[k][0] == k / 5.0  # real fps, not metadata's 99
        assert got[k][1] == pytest.approx(px[k].mean(), rel=1e-12)


def test_strict_still_raises_for_foreign_formats(spark):
    media = spark.createDataFrame(pd.DataFrame(
        [(0, "audio", b"\xffMP3-ish-bytes", 0, 0, 1, 8000, 100, None,
          None),
         (1, "video", b"\x00\x00\x00\x18ftypmp42-ish", 0, 0, 3, None,
          None, 12.0, 24)],
        columns=["media_id", "kind", "payload", "width", "height",
                 "channels", "sample_rate", "n_samples", "fps",
                 "n_frames"]))
    with pytest.raises(Exception, match="no in-repo codec"):
        audio_features(media, strict=True).collect()
    with pytest.raises(Exception, match="no in-repo codec"):
        video_frame_sample(media, strict=True).collect()
    # non-strict: the deterministic fake still runs the plumbing
    assert audio_features(media).count() == 1
    assert video_frame_sample(media).count() == 2
