"""WAV (RIFF/WAVE) PCM codec — pure stdlib/numpy, making audio decode
REAL for the canonical uncompressed format (the multimodal path falls
back to the deterministic fake only for formats that truly need external
libraries: MP3/AAC/OGG...).

Reader: RIFF chunk walk ('fmt ' + 'data', unknown chunks skipped,
odd-size padding honored), PCM format tag 1, 8-bit unsigned and 16-bit
signed little-endian, any channel count (samples return interleaved ->
(n_frames, channels) int16; 8-bit is widened to int16 as (v-128)<<8).
Writer: the matching deterministic encoder. Compressed tags raise
NotImplementedError loudly.
"""

from __future__ import annotations

import struct

import numpy as np


def write_wav(samples: np.ndarray, sample_rate: int,
              bits: int = 16) -> bytes:
    """(n,) or (n, channels) int16 samples -> RIFF/WAVE PCM bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if bits == 16:
        payload = s.astype("<i2").tobytes()
    elif bits == 8:
        payload = ((s.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * block, block, bits)
    data = payload + (b"\x00" if len(payload) % 2 else b"")
    riff = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + data)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def parse_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> ((n_frames, channels) int16, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        ln = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
        pos += 8 + ln + (ln & 1)          # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    tag, ch, sr, _, _, bits = fmt
    if tag != 1:
        raise NotImplementedError(f"non-PCM WAV (format tag {tag})")
    if bits == 16:
        s = np.frombuffer(payload, dtype="<i2").astype(np.int16)
    elif bits == 8:
        s = ((np.frombuffer(payload, dtype=np.uint8).astype(np.int32)
              - 128) << 8).astype(np.int16)
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    n = len(s) // ch
    return s[: n * ch].reshape(n, ch), sr
