"""AVI (RIFF) container with MJPEG video — pure stdlib, making video
frame decode REAL: each '00dc' chunk is a standalone baseline JPEG that
sources/jpeg.py decodes, so the whole video path (container walk + frame
codec) runs in-repo with no external libraries. Formats that need real
inter-frame codecs (H.264/VP9/...) stay on the deterministic fake.

Writer emits the canonical minimal layout (hdrl with avih + one vids
strl pair, movi with '00dc' chunks, idx1 keyframe index); reader walks
RIFF LIST nesting, takes fps/dims/frame count from avih, and collects
'00dc'/'00db' payloads in stream order.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def write_avi_mjpeg(frames: list[bytes], fps: int, width: int,
                    height: int) -> bytes:
    """JPEG-per-frame bytes -> MJPEG AVI (RIFF) bytes. Deterministic."""
    us_per_frame = 1_000_000 // fps
    n = len(frames)
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack("<IIIIIIIIII4I", us_per_frame, max_bytes * fps, 0,
                       0x10, n, 0, 1, max_bytes, width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIIi4H", 0, 0, 0, 0, 1, fps, 0, n,
                          max_bytes, 0xFFFFFFFF, 0, 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_body = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)
    idx = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(f))
        for off, f in zip(offsets, frames))
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(data: bytes) -> dict:
    """AVI bytes -> {fps, width, height, n_frames, frames: [bytes]}."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    out = {"frames": []}

    def walk(lo: int, hi: int) -> None:
        pos = lo
        while pos + 8 <= hi:
            cid = data[pos:pos + 4]
            ln = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            body_lo = pos + 8
            if cid == b"LIST":
                walk(body_lo + 4, body_lo + ln)
            elif cid == b"avih":
                v = struct.unpack("<10I", data[body_lo:body_lo + 40])
                out["fps"] = round(1_000_000 / v[0]) if v[0] else 0
                out["n_frames"] = v[4]
                out["width"], out["height"] = v[8], v[9]
            elif cid in (b"00dc", b"00db"):
                out["frames"].append(data[body_lo:body_lo + ln])
            pos = body_lo + ln + (ln & 1)

    walk(12, len(data))
    if "width" not in out:
        raise ValueError("missing avih header")
    return out


def decode_avi_frames(data: bytes) -> tuple[dict, list[np.ndarray]]:
    """AVI bytes -> (header info, decoded uint8 frames) via the in-repo
    baseline JPEG decoder."""
    from lib_gdal_spark.sources.jpeg import parse_jpeg

    info = parse_avi(data)
    return info, [parse_jpeg(f) for f in info["frames"]]
