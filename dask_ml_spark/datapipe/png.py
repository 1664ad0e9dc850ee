"""Pure-Python PNG codec (stdlib zlib + struct + numpy).

The second honest-stub upgrade after `jpeg.py`: PNG is the most common
lossless web-image format, and — unlike JPEG's DCT pipeline — its whole
compression layer is DEFLATE, which ships in the stdlib. What remains
is chunk parsing and the five scanline filters (RFC 2083 §6), so a real
decode needs no codec library at all.

Scope (honest, raising outside it): bit depth 8, color types
0 (grayscale), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
non-interlaced. Adam7 interlacing and 1/2/4/16-bit depths raise —
they are rare in training corpora and would triple the code for no
test-visible behavior.

`encode_png` exists for tests/fixtures (the counterpart of
`encode_bmp`/`encode_wav`): it can force a specific scanline filter or
cycle through all five, so the round-trip tests exercise every
unfilter branch.

Used by `multimodal._decode_any` under stub=False. This runs INSIDE a
mapInPandas batch on executors — per-row Python cost is bounded by the
image size, and the Spark-side plumbing (schema, Arrow batches,
partitioning) is identical to the stub path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(kind: int, row: np.ndarray, prev: np.ndarray,
              bpp: int) -> np.ndarray:
    """Reverse one scanline filter (RFC 2083 §6.3-6.9); returns the
    reconstructed row (uint8). None/Up/Sub are fully vectorized —
    they dominate real encoders' filter choices, and a per-byte
    Python loop over a megapixel image costs millions of interpreter
    iterations inside the executor batch (review-caught). Average and
    Paeth keep the per-pixel loop (each byte depends on the
    reconstructed left neighbor) but step vectorized across channels."""
    if kind == 0:  # None
        return row
    if kind == 1:  # Sub: per-channel prefix sum mod 256
        out = row.reshape(-1, bpp)
        return np.cumsum(out, axis=0, dtype=np.uint64).astype(np.uint8) \
            .reshape(-1)
    if kind == 2:  # Up
        return (row + prev).astype(np.uint8)
    n = len(row)
    out = np.zeros(n, dtype=np.int32)
    r = row.astype(np.int32)
    p = prev.astype(np.int32)
    if kind == 3:  # Average
        for i in range(0, n, bpp):
            left = out[i - bpp:i] if i >= bpp else np.zeros(bpp, np.int32)
            out[i:i + bpp] = (r[i:i + bpp]
                              + ((left + p[i:i + bpp]) >> 1)) & 0xFF
        return out.astype(np.uint8)
    if kind == 4:  # Paeth
        for i in range(0, n, bpp):
            if i >= bpp:
                left, ul = out[i - bpp:i], p[i - bpp:i]
            else:
                left = ul = np.zeros(bpp, np.int32)
            up = p[i:i + bpp]
            pa = np.abs(up - ul)
            pb = np.abs(left - ul)
            pc = np.abs(left + up - 2 * ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, up, ul))
            out[i:i + bpp] = (r[i:i + bpp] + pred) & 0xFF
        return out.astype(np.uint8)
    raise ValueError(f"bad PNG filter type {kind}")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8 (palette expanded to RGB;
    alpha preserved as the last channel for color types 4/6)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS:
        raise NotImplementedError(
            f"PNG bit depth {depth} / color type {color} not supported "
            "(pure-Python decoder covers 8-bit gray/RGB/palette/GA/RGBA)")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if comp or filt:
        raise ValueError("invalid PNG compression/filter method")
    ch = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel payload has wrong length")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        row = np.frombuffer(raw, dtype=np.uint8,
                            count=stride, offset=off + 1)
        prev = _unfilter(raw[off], row, prev, ch)
        out[y] = prev
    img = out.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        img = plte[img[:, :, 0]]
    return img


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, filter_type: int | str = "mixed") -> bytes:
    """(h, w[, channels]) uint8 → PNG bytes. filter_type: 0-4 applies
    that scanline filter to every row; 'mixed' cycles 0..4 by row so a
    single fixture exercises every unfilter branch."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = a.reshape(h, stride)
    lines = []
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        row = flat[y].astype(np.int16)
        k = (y % 5) if filter_type == "mixed" else int(filter_type)
        if k == 0:
            enc = row
        elif k == 1:
            left = np.concatenate([np.zeros(ch, np.int16), row[:-ch]])
            enc = row - left
        elif k == 2:
            enc = row - prev
        elif k == 3:
            left = np.concatenate([np.zeros(ch, np.int16), row[:-ch]])
            enc = row - ((left + prev) >> 1)
        elif k == 4:
            enc = np.empty(stride, dtype=np.int16)
            for i in range(stride):
                left = int(row[i - ch]) if i >= ch else 0
                ul = int(prev[i - ch]) if i >= ch else 0
                enc[i] = row[i] - _paeth(left, int(prev[i]), ul)
        else:
            raise ValueError(f"bad filter_type {filter_type!r}")
        lines.append(bytes([k]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _chunk(b"IEND", b""))
