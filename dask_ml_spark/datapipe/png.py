"""Pure-Python PNG codec (stdlib zlib + struct + numpy).

The second honest-stub upgrade after `jpeg.py`: PNG is the most common
lossless web-image format, and — unlike JPEG's DCT pipeline — its whole
compression layer is DEFLATE, which ships in the stdlib. What remains
is chunk parsing and the five scanline filters (RFC 2083 §6), so a real
decode needs no codec library at all.

Scope (r7: the full spec's bit-depth/interlace matrix): bit depths
1/2/4/8/16 in their legal color-type combinations — 0 (grayscale,
any depth), 2 (RGB, 8/16), 3 (palette, 1/2/4/8), 4 (gray+alpha,
8/16), 6 (RGBA, 8/16) — plus Adam7 interlacing (each of the seven
passes is an independently-filtered sub-image; rows land on the
(xstart::xstep, ystart::ystep) grid). 16-bit samples fold to 8 via
the high byte (the standard 8-bit-pipeline reduction); low-depth
grayscale scales by 255/(2^d−1); filters always operate on BYTES with
bpp = max(1, channels*depth/8), exactly as the spec defines.

`encode_png` exists for tests/fixtures (the counterpart of
`encode_bmp`/`encode_wav`): it can force a specific scanline filter or
cycle through all five, and can emit 16-bit, low-depth gray, palette,
and Adam7-interlaced files so the round-trip tests exercise every
decode branch.

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
# legal bit depths per color type (PNG spec §11.2.2)
_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
           4: (8, 16), 6: (8, 16)}
# Adam7 pass grid: (xstart, ystart, xstep, ystep)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


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
        # stride is an exact multiple of bpp for every legal
        # depth/color combination (bpp=1 when depth<8, else
        # stride = pw*ch*depth/8 = pw*bpp), so reshape is safe
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


def _scanline_geom(pw: int, ch: int, depth: int):
    """(stride bytes, filter bpp) for one scanline of pw pixels."""
    stride = (pw * ch * depth + 7) // 8
    bpp = max(1, (ch * depth) // 8)
    return stride, bpp


def _decode_rows(raw: bytes, off: int, pw: int, ph: int, ch: int,
                 depth: int):
    """Decode ph filtered scanlines of pw pixels starting at byte
    `off` of the decompressed stream → ((ph, pw, ch) uint8 samples,
    bytes consumed). 16-bit samples reduce via the high byte;
    1/2/4-bit samples unpack MSB-first (raw index/level values —
    grayscale scaling happens at the caller)."""
    stride, bpp = _scanline_geom(pw, ch, depth)
    out = np.empty((ph, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(ph):
        o = off + y * (stride + 1)
        if o + stride + 1 > len(raw):
            raise ValueError("PNG pixel payload has wrong length")
        row = np.frombuffer(raw, dtype=np.uint8, count=stride,
                            offset=o + 1)
        prev = _unfilter(raw[o], row, prev, bpp)
        out[y] = prev
    used = ph * (stride + 1)
    if depth == 8:
        img = out[:, :pw * ch].reshape(ph, pw, ch)
    elif depth == 16:
        u16 = np.ascontiguousarray(out).view(">u2")
        img = (u16 >> 8).astype(np.uint8)[:, :pw * ch].reshape(ph, pw, ch)
    else:
        bits = np.unpackbits(out, axis=1)
        npx = (stride * 8) // depth
        vals = bits[:, :npx * depth].reshape(ph, npx, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        img = (vals * weights).sum(axis=2).astype(np.uint8)[:, :pw] \
            .reshape(ph, pw, 1)
    return img, used


def _pass_dims(w: int, h: int, xs: int, ys: int, xst: int, yst: int):
    pw = (w - xs + xst - 1) // xst if w > xs else 0
    ph = (h - ys + yst - 1) // yst if h > ys else 0
    return pw, ph


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8 (palette expanded to RGB;
    alpha preserved as the last channel for color types 4/6; 16-bit
    reduced to 8 via the high byte; low-depth gray scaled to 0-255)."""
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
    if color not in _CHANNELS or depth not in _DEPTHS[color]:
        raise NotImplementedError(
            f"PNG bit depth {depth} / color type {color} is not a legal "
            "spec combination")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if comp or filt:
        raise ValueError("invalid PNG compression/filter method")
    ch = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        img, used = _decode_rows(raw, 0, w, h, ch, depth)
    else:  # Adam7: seven independently-filtered sub-images
        img = np.zeros((h, w, ch), dtype=np.uint8)
        used = 0
        for xs, ys, xst, yst in _ADAM7:
            pw, ph = _pass_dims(w, h, xs, ys, xst, yst)
            if pw == 0 or ph == 0:
                continue
            sub, n = _decode_rows(raw, used, pw, ph, ch, depth)
            img[ys::yst, xs::xst] = sub
            used += n
    if used != len(raw):
        raise ValueError("PNG pixel payload has wrong length")
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        img = plte[img[:, :, 0]]
    elif color == 0 and depth < 8:
        img = (img.astype(np.uint16) * (255 // ((1 << depth) - 1))) \
            .astype(np.uint8)
    return img


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def _filter_rows(flat: np.ndarray, bpp: int, filter_type) -> bytes:
    """Apply per-row scanline filters to (n_rows, stride) uint8 byte
    rows → filtered stream (filter byte + bytes per row)."""
    lines = []
    stride = flat.shape[1]
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(flat.shape[0]):
        row = flat[y].astype(np.int16)
        k = (y % 5) if filter_type == "mixed" else int(filter_type)
        if k == 0:
            enc = row
        elif k == 1:
            left = np.concatenate([np.zeros(bpp, np.int16), row[:-bpp]]) \
                if stride > bpp else np.zeros(stride, np.int16)
            enc = row - left
        elif k == 2:
            enc = row - prev
        elif k == 3:
            left = np.concatenate([np.zeros(bpp, np.int16), row[:-bpp]]) \
                if stride > bpp else np.zeros(stride, np.int16)
            enc = row - ((left + prev) >> 1)
        elif k == 4:
            enc = np.empty(stride, dtype=np.int16)
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                enc[i] = row[i] - _paeth(left, int(prev[i]), ul)
        else:
            raise ValueError(f"bad filter_type {filter_type!r}")
        lines.append(bytes([k]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = row
    return b"".join(lines)


def _rows_to_bytes(a: np.ndarray, depth: int) -> np.ndarray:
    """(h, w, ch) samples → (h, stride) byte rows at the given depth.
    16-bit expects uint16 input; 1/2/4-bit expects values < 2^depth
    in a single channel and packs MSB-first."""
    h, w, ch = a.shape
    if depth == 8:
        return np.asarray(a, np.uint8).reshape(h, w * ch)
    if depth == 16:
        return np.ascontiguousarray(
            np.asarray(a, np.uint16).astype(">u2")).view(np.uint8) \
            .reshape(h, w * ch * 2)
    assert ch == 1
    vals = np.asarray(a, np.uint8).reshape(h, w)
    bits = ((vals[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1) \
        .reshape(h, w * depth).astype(np.uint8)
    pad = (-bits.shape[1]) % 8
    if pad:
        bits = np.concatenate(
            [bits, np.zeros((h, pad), np.uint8)], axis=1)
    return np.packbits(bits, axis=1)


def encode_png(arr: np.ndarray, filter_type: int | str = "mixed",
               depth: int = 8, interlace: bool = False,
               palette: np.ndarray | None = None) -> bytes:
    """(h, w[, channels]) array → PNG bytes (test/fixture encoder).

    - filter_type: 0-4 forces that scanline filter; 'mixed' cycles
      0..4 by row so one fixture exercises every unfilter branch.
    - depth: 8 (default, uint8), 16 (uint16 samples), or 1/2/4
      (single-channel values < 2^depth → grayscale, or palette
      indices when `palette` is given).
    - interlace: Adam7 (seven independently-filtered passes).
    - palette: (N, 3) uint8 → color type 3, `arr` holds indices.
    """
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if palette is not None:
        assert ch == 1 and depth in (1, 2, 4, 8)
        color = 3
    elif depth in (1, 2, 4):
        assert ch == 1
        color = 0
    else:
        color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = max(1, (ch * depth) // 8)

    if interlace:
        parts = []
        for xs, ys, xst, yst in _ADAM7:
            pw, ph = _pass_dims(w, h, xs, ys, xst, yst)
            if pw == 0 or ph == 0:
                continue
            sub = np.ascontiguousarray(a[ys::yst, xs::xst])
            parts.append(_filter_rows(_rows_to_bytes(sub, depth), bpp,
                                      filter_type))
        payload = b"".join(parts)
    else:
        payload = _filter_rows(_rows_to_bytes(a, depth), bpp, filter_type)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                       1 if interlace else 0)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    return (out + _chunk(b"IDAT", zlib.compress(payload))
            + _chunk(b"IEND", b""))
