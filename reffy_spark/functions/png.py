"""Minimal pure-stdlib PNG codec (zlib + struct, no image libraries).

Exists so the multimodal family's ``codec="real"`` branch is exercisable
in this container (VERDICT r4 gap #4): 8-bit greyscale / RGB / RGBA,
non-interlaced — the subset a training-data pipeline's thumbnails and
fixtures actually use. Real deployments swap in Pillow/libvips behind
the same ``decode(payload) -> ndarray`` contract; this decoder favors
obvious correctness over speed (scanline unfiltering loops per pixel
for the sequential filters), which is fine for its role: driving the
Spark-side plumbing with REAL bytes in tests and small corpora.

PNG format per the public W3C spec (https://www.w3.org/TR/png-3/):
signature, IHDR/IDAT/IEND chunks, per-scanline filters 0-4.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def is_png(payload: bytes) -> bool:
    return bytes(payload[:8]) == PNG_SIGNATURE


def _chunks(payload: bytes):
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array of shape (height, width, channels).

    Supports bit depth 8, color types 0 (grey), 2 (RGB), 6 (RGBA),
    no interlace. Raises ValueError on anything else.
    """
    payload = bytes(payload)
    if not is_png(payload):
        raise ValueError("not a PNG payload")
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
            if color not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG color type {color} (grey/RGB/RGBA only)"
                )
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        cur = line.astype(np.int32)
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, channels)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) / (h, w, 1) / (h, w, 3) / (h, w, 4) -> PNG
    bytes (filter 0 on every scanline — valid, just not size-optimal)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color = {1: 0, 3: 2, 4: 6}.get(c)
    if color is None:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    stride = w * c
    body = bytearray()
    flat = a.reshape(h, stride)
    for y in range(h):
        body.append(0)  # filter type None
        body.extend(flat[y].tobytes())
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(body), 6))
        + _chunk(b"IEND", b"")
    )
