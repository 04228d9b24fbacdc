"""BMP (Windows bitmap) codec — pure stdlib/numpy (reference:
``drivers/raster/bmp``). Reader: BITMAPFILEHEADER + BITMAPINFOHEADER,
24-bit BGR and 8-bit paletted, bottom-up or top-down rows, 4-byte row
padding; compressed (RLE) variants raise loudly. Writer: 24-bit
uncompressed bottom-up — the interchange baseline. Lossless, so round
trips are bit-exact.
"""

from __future__ import annotations

import struct

import numpy as np


def write_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BMP bytes."""
    a = np.asarray(rgb, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = a.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):           # bottom-up
        row = a[y, :, ::-1].tobytes()        # BGR
        rows += row + b"\x00" * (stride - len(row))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(rows), 2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0,
                       14 + 40)
    return head + info + bytes(rows)


def parse_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER")
    w, h = struct.unpack("<ii", data[18:26])
    bpp, comp = struct.unpack("<HI", data[28:34])
    if comp != 0:
        raise NotImplementedError(f"compressed BMP (method {comp})")
    top_down = h < 0
    h = abs(h)
    if bpp == 24:
        stride = (w * 3 + 3) & ~3
        out = np.zeros((h, w, 3), dtype=np.uint8)
        for i in range(h):
            row = np.frombuffer(data, dtype=np.uint8,
                                count=w * 3, offset=off + i * stride)
            y = i if top_down else h - 1 - i
            out[y] = row.reshape(w, 3)[:, ::-1]
        return out
    if bpp == 8:
        n_colors = struct.unpack("<I", data[46:50])[0] or 256
        pal = np.frombuffer(
            data, dtype=np.uint8, count=n_colors * 4,
            offset=14 + hdr_size).reshape(n_colors, 4)[:, 2::-1]
        stride = (w + 3) & ~3
        out = np.zeros((h, w, 3), dtype=np.uint8)
        for i in range(h):
            idx = np.frombuffer(data, dtype=np.uint8, count=w,
                                offset=off + i * stride)
            y = i if top_down else h - 1 - i
            out[y] = pal[idx]
        return out
    raise NotImplementedError(f"{bpp}-bit BMP")
