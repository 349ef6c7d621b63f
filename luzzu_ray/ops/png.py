"""Dependency-free PNG codec: stdlib ``zlib`` inflate/deflate + the five
scanline filters in NumPy.

Why it exists: the container has no image libraries, but the build brief
wants the multimodal decode path REAL where possible.  PNG is the one
mainstream raster container whose decompression (zlib) ships in the
Python stdlib, so a ~150-line decoder makes ``ImageDecodeStage`` operate
on genuine image bytes instead of the FAKEIMG stub — and therefore
hash-verifiable end to end (VERDICT.md round-2 ask #2).

Scope (verification-grade, documented): bit depth 8, color types 0
(gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), no interlace, no palette.
Anything else raises ``ValueError`` — callers degrade per their own
contract.  Defiltering is vectorized where the filter allows: Sub is a
per-channel prefix sum mod 256, Up is a whole-row add; Average/Paeth
recurrences are sequential in x by definition, so those rows loop over
pixels with the channel lanes vectorized.

Format reference: the public PNG specification (RFC 2083 / ISO 15948).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (int16 math per the spec)."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa_ = np.abs(p - a16)
    pb_ = np.abs(p - b16)
    pc_ = np.abs(p - c16)
    out = np.where((pa_ <= pb_) & (pa_ <= pc_), a, np.where(pb_ <= pc_, b, c))
    return out.astype(np.uint8)


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 array.

    Raises ``ValueError`` for anything outside the supported scope
    (wrong signature, bit depth != 8, palette/interlace, truncation).
    """
    if not buf.startswith(PNG_SIG):
        raise ValueError("not a PNG")
    off = len(PNG_SIG)
    width = height = None
    channels = 0
    idat = bytearray()
    while off + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, off)
        ctype = buf[off + 4: off + 8]
        data = buf[off + 8: off + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        off += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("scanline size mismatch")
    rows = raw.reshape(height, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    for y in range(height):
        f = int(filters[y])
        raw_row = rows[y, 1:]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = raw_row
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp] == strided cumsum
            lanes = raw_row.reshape(width, bpp).astype(np.int64)
            out[y] = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(-1)
        elif f == 2:  # Up: whole-row vector add
            out[y] = raw_row + prev  # uint8 wraps mod 256
        elif f == 3:  # Average: sequential in x (depends on own row's left)
            row = out[y]
            up = prev.reshape(width, bpp).astype(np.int16)
            rr = raw_row.reshape(width, bpp).astype(np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            rw = row.reshape(width, bpp)
            for x in range(width):
                left = (rr[x] + ((left + up[x]) >> 1)) & 0xFF
                rw[x] = left.astype(np.uint8)
        elif f == 4:  # Paeth: sequential in x
            row = out[y]
            up = prev.reshape(width, bpp)
            upleft = np.zeros(bpp, dtype=np.uint8)
            rr = raw_row.reshape(width, bpp)
            left = np.zeros(bpp, dtype=np.uint8)
            rw = row.reshape(width, bpp)
            for x in range(width):
                pred = _paeth(left, up[x], upleft)
                left = rr[x] + pred  # uint8 wrap
                rw[x] = left
                upleft = up[x]
        else:
            raise ValueError(f"bad filter byte {f}")
    return out.reshape(height, width, channels)


def encode_png(
    pixels: np.ndarray, filter_type: int | str = 0, level: int = 6
) -> bytes:
    """(h, w) or (h, w, channels) uint8 -> PNG bytes.

    ``filter_type``: a single filter id 0-4 applied to every row, or
    ``"mixed"`` to cycle through all five per row (exercises every
    defilter path — used by the roundtrip property tests).  Filtering is
    fully vectorized (the encoder knows the reconstructed image, so
    every predictor is a shifted-array expression).
    """
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, channels = px.shape
    if channels not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {channels}")
    stride = w * channels
    flat = px.reshape(h, stride)
    up = np.vstack([np.zeros((1, stride), np.uint8), flat[:-1]])
    left = np.zeros_like(flat)
    left[:, channels:] = flat[:, :-channels]
    upleft = np.zeros_like(flat)
    upleft[1:, channels:] = flat[:-1, :-channels]
    enc_by_filter = {
        0: flat,
        1: flat - left,
        2: flat - up,
        3: flat - ((left.astype(np.int16) + up.astype(np.int16)) >> 1).astype(
            np.uint8
        ),
        4: flat - _paeth(left.reshape(-1, channels).reshape(h, stride),
                         up, upleft),
    }
    scan = bytearray()
    for y in range(h):
        f = (y % 5) if filter_type == "mixed" else int(filter_type)
        scan.append(f)
        scan += enc_by_filter[f][y].tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[channels], 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan), level))
        + chunk(b"IEND", b"")
    )
