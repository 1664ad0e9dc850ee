"""Pure-Python baseline JPEG codec (stdlib + numpy only).

The container ships no image codec libraries, but baseline sequential
JPEG (SOF0, 8-bit, Huffman) is decodable in ~250 lines of numpy:
segment parse → Huffman-decode MCUs → dequantize → inverse zigzag →
2-D IDCT (two 8×8 matmuls per block) → chroma upsample → YCbCr→RGB.
This makes `decode_image_features(stub=False)` honest for the most
common real-world format; progressive (SOF2), arithmetic coding, and
12-bit stay out of scope (NotImplementedError).

A minimal 4:4:4 encoder (standard Annex-K quantization tables +
Annex-K Huffman tables) lives here too, so tests can round-trip
without any external fixture. The decoder is anchored beyond the
round-trip by analytic checks (a uniform image must decode exactly to
its DC-quantized value), which guards against self-cancelling
encoder/decoder bug pairs.

Ref behavior parity: the reference treats image decode as an opaque
per-record map (see SURVEY §2 multimodal notes); this module is the
decode kernel invoked from datapipe/multimodal.py's mapInPandas.
"""

from __future__ import annotations

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal 8x8 DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1)uπ/16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct2(F: np.ndarray) -> np.ndarray:
    return _A.T @ F @ _A


def _fdct2(f: np.ndarray) -> np.ndarray:
    return _A @ f @ _A.T


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    stuffing removal; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker in entropy stream")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        self.bitbuf &= (1 << self.nbits) - 1
        return v

    def align_restart(self) -> None:
        """Skip to just past the next RST marker (called on restart)."""
        self.bitbuf = 0
        self.nbits = 0
        while not (self.data[self.pos] == 0xFF
                   and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _build_huffman(counts, symbols):
    """JPEG canonical Huffman: map (length, code) → symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline-sequential JPEG → (h, w, 3) or (h, w, 1)
    uint8 (YCbCr→RGB for 3 components, direct for grayscale)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple, dict] = {}
    frame = None
    restart_interval = 0
    while True:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before scan data")
        seglen = (data[pos] << 8) | data[pos + 1]
        seg = data[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    q = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                else:
                    q = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                qtables[tq] = q
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1: p + 17])
                n = sum(counts)
                symbols = list(seg[p + 17: p + 17 + n])
                htables[(tc, th)] = _build_huffman(counts, symbols)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, ncomp = seg[0], (seg[1] << 8) | seg[2], \
                (seg[3] << 8) | seg[4], seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = seg[6 + 3 * ci: 9 + 3 * ci]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/1) supported")
        elif marker == 0xDD:  # DRI
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = {}
            for si in range(ns):
                cid, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                scan[cid] = (tt >> 4, tt & 0x0F)
            pos += seglen
            return _decode_scan(data, pos, frame, scan, qtables, htables,
                                restart_interval)
        pos += seglen


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
              for c in comps]
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dc_t = htables[(0, scan[c["id"]][0])]
                ac_t = htables[(1, scan[c["id"]][1])]
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        try:
                            blk, pred[ci] = _decode_block(
                                br, dc_t, ac_t, q, pred[ci])
                        except _RestartMarker:
                            br.align_restart()
                            pred = [0] * len(comps)
                            blk, pred[ci] = _decode_block(
                                br, dc_t, ac_t, q, pred[ci])
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = np.clip(out[0] + 128.0, 0, 255)
        return g.astype(np.uint8)[:, :, None]
    Y, Cb, Cr = (o + 128.0 for o in out)
    r = Y + 1.402 * (Cr - 128.0)
    g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    b = Y + 1.772 * (Cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _decode_block(br, dc_t, ac_t, q, pred):
    size = _huff_decode(br, dc_t)
    diff = _extend(br.read(size), size) if size else 0
    pred = pred + diff
    zz = np.zeros(64, np.int32)
    zz[0] = pred
    k = 1
    while k < 64:
        sym = _huff_decode(br, ac_t)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(br.read(size), size)
        k += 1
    coeffs = (zz * q).astype(np.float64)[UNZIGZAG].reshape(8, 8)
    return _idct2(coeffs), pred


# ---------------------------------------------------------------------------
# Minimal baseline encoder (tests only): 4:4:4, Annex-K tables.

_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.buf >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.buf &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _enc_table(counts, symbols):
    enc = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            enc[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


def _enc_coeff(v: int):
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def _encode_block(bw, block, q, dc_enc, ac_enc, pred):
    coeffs = np.round(_fdct2(block - 128.0).ravel()[ZIGZAG] / q).astype(int)
    diff = int(coeffs[0]) - pred
    size, bits = _enc_coeff(diff) if diff else (0, 0)
    c, l = dc_enc[size]
    bw.write(c, l)
    if size:
        bw.write(bits, size)
    run = 0
    for k in range(1, 64):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_enc[0xF0]
            bw.write(c, l)
            run -= 16
        size, bits = _enc_coeff(v)
        c, l = ac_enc[(run << 4) | size]
        bw.write(c, l)
        bw.write(bits, size)
        run = 0
    if run:
        c, l = ac_enc[0x00]
        bw.write(c, l)
    return int(coeffs[0])


def encode_jpeg(img: np.ndarray, subsample: bool = False) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) / (h, w, 1) grayscale uint8 as a
    baseline JPEG with Annex-K tables: 4:4:4 by default, 4:2:0 with
    subsample=True (exercises the decoder's chroma-upsample path).
    Test-fixture quality — no quality knob."""
    img = np.asarray(img, dtype=np.float64)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    if nch == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        Y = 0.299 * r + 0.587 * g + 0.114 * b
        Cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        Cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [Y, Cb, Cr]
        qids = [0, 1, 1]
        hids = [0, 1, 1]
        samps = [(2, 2), (1, 1), (1, 1)] if subsample else \
            [(1, 1), (1, 1), (1, 1)]
    else:
        planes = [img[..., 0]]
        qids = [0]
        hids = [0]
        samps = [(1, 1)]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    ph, pw = -(-h // (8 * vmax)) * 8 * vmax, -(-w // (8 * hmax)) * 8 * hmax
    planes = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
              for p in planes]
    # downsample each plane to its sampling grid (box mean)
    ds = []
    for p, (sh, sv) in zip(planes, samps):
        fy, fx = vmax // sv, hmax // sh
        if fy > 1 or fx > 1:
            p = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        ds.append(p)
    planes = ds

    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]))
        out.extend((len(payload) + 2).to_bytes(2, "big"))
        out.extend(payload)

    seg(0xDB, bytes([0x00]) + bytes(_Q_LUM[ZIGZAG].astype(np.uint8)))
    if nch == 3:
        seg(0xDB, bytes([0x01]) + bytes(_Q_CHR[ZIGZAG].astype(np.uint8)))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([len(planes)])
    for ci in range(len(planes)):
        sh, sv = samps[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, qids[ci]])
    seg(0xC0, bytes(sof))
    for tc, th, (counts, syms) in [(0, 0, _DC_LUM), (1, 0, _AC_LUM)] + (
            [(0, 1, _DC_CHR), (1, 1, _AC_CHR)] if nch == 3 else []):
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms))
    sos = bytearray([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, (hids[ci] << 4) | hids[ci]])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))

    encs = {0: (_enc_table(*_DC_LUM), _enc_table(*_AC_LUM))}
    if nch == 3:
        encs[1] = (_enc_table(*_DC_CHR), _enc_table(*_AC_CHR))
    qmats = {0: _Q_LUM, 1: _Q_CHR}
    bw = _BitWriter()
    preds = [0] * len(planes)
    for my in range(ph // (8 * vmax)):
        for mx in range(pw // (8 * hmax)):
            for ci, p in enumerate(planes):
                sh, sv = samps[ci]
                dc_enc, ac_enc = encs[hids[ci]]
                for by in range(sv):
                    for bx in range(sh):
                        y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                        preds[ci] = _encode_block(
                            bw, p[y0:y0 + 8, x0:x0 + 8],
                            qmats[qids[ci]], dc_enc, ac_enc, preds[ci])
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
