"""Pure-Python JPEG codec (stdlib + numpy only): baseline + progressive.

The container ships no image codec libraries, but Huffman JPEG is
decodable in pure numpy: segment parse → Huffman-decode MCUs →
dequantize → inverse zigzag → 2-D IDCT (two 8×8 matmuls per block) →
chroma upsample → YCbCr→RGB. Baseline sequential (SOF0/1) decodes
scan-at-once; progressive (SOF2, r7) accumulates per-component
coefficient arrays across spectral-selection / successive-
approximation scans (DC first + refinement, AC first + refinement
with EOB runs and in-run correction bits, interleaved DC and
per-component AC geometry, restart intervals) and IDCTs once at EOI.
This makes `decode_image_features(stub=False)` honest for the two
most common real-world web formats; arithmetic coding, 12-bit, and
hierarchical stay out of scope (NotImplementedError).

Encoders for both modes (standard Annex-K quantization tables) live
here too, so tests can round-trip without any external fixture. The
baseline decoder is anchored beyond the round-trip by analytic checks
(a uniform image must decode exactly to its DC-quantized value); the
progressive decoder is anchored by EXACT pixel equality with the
baseline decode of the same quantized coefficients — a self-cancelling
bug pair would have to hit two independent scan codecs identically.

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
    """Decode a baseline-sequential (SOF0/1) or progressive (SOF2)
    JPEG → (h, w, 3) or (h, w, 1) uint8 (YCbCr→RGB for 3 components,
    direct for grayscale). Progressive accumulates per-component
    coefficient arrays across the DC/AC first and refinement scans and
    dequantizes + IDCTs once at EOI."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple, dict] = {}
    frame = None
    restart_interval = 0
    coef = None  # progressive: per-comp (BH, BW, 64) zigzag coefficients
    while True:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            if coef is not None:
                return _finish_progressive(frame, coef, qtables)
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, ncomp = seg[0], (seg[1] << 8) | seg[2], \
                (seg[3] << 8) | seg[4], seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = seg[6 + 3 * ci: 9 + 3 * ci]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/1) and progressive (SOF2) "
                "Huffman JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = {}
            order = []
            for si in range(ns):
                cid, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                scan[cid] = (tt >> 4, tt & 0x0F)
                order.append(cid)
            pos += seglen
            if not frame.get("progressive"):
                return _decode_scan(data, pos, frame, scan, qtables,
                                    htables, restart_interval)
            if coef is None:
                coef = _alloc_coef(frame)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            pos = _decode_prog_scan(data, pos, frame, order, scan, coef,
                                    ss, se, ah, al, htables,
                                    restart_interval)
            continue
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
    return _assemble_image(planes, comps, h, w, hmax, vmax)


def _assemble_image(planes, comps, h, w, hmax, vmax):
    """Shared decode tail: chroma upsample, crop, level shift,
    YCbCr→RGB (3 comps) or direct grayscale (1 comp)."""
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
# Progressive (SOF2) scan decoding: each SOS covers a spectral band
# [Ss, Se] of one successive-approximation bit position; coefficients
# accumulate in per-component zigzag arrays until EOI.


def _geom(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _alloc_coef(frame):
    _, _, mcux, mcuy = _geom(frame)
    return [np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
            for c in frame["comps"]]


def _comp_blocks(frame, ci):
    """Non-interleaved block grid of component ci: ceil of the
    component's own sample dimensions (NOT padded to MCU multiples)."""
    hmax, vmax, _, _ = _geom(frame)
    c = frame["comps"][ci]
    cw = -(-frame["w"] * c["h"] // hmax)
    chh = -(-frame["h"] * c["v"] // vmax)
    return -(-chh // 8), -(-cw // 8)


def _decode_prog_scan(data, pos, frame, order, scan, coef, ss, se, ah, al,
                      htables, restart_interval):
    """Decode one progressive scan into `coef`; returns the stream
    position after the scan's entropy data. Handles DC first/refine
    (interleaved or single-component) and AC first/refine
    (single-component by spec), EOB runs, and restart intervals."""
    comps = frame["comps"]
    hmax, vmax, mcux, mcuy = _geom(frame)
    idxs = [next(i for i, c in enumerate(comps) if c["id"] == cid)
            for cid in order]
    br = _BitReader(data, pos)
    if ss == 0:
        # DC scan. Interleaved when the scan carries >1 component;
        # geometry degenerates to the raster grid for 1-comp frames.
        pred = {i: 0 for i in idxs}
        if len(idxs) > 1 or len(comps) == 1:
            units = [(my, mx) for my in range(mcuy) for mx in range(mcux)]

            def blocks_of(unit):
                my, mx = unit
                for i in idxs:
                    c = comps[i]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            yield i, my * c["v"] + by, mx * c["h"] + bx
        else:
            i0 = idxs[0]
            bh, bw_ = _comp_blocks(frame, i0)
            units = [(by, bx) for by in range(bh) for bx in range(bw_)]

            def blocks_of(unit):
                yield i0, unit[0], unit[1]
        count = 0
        for unit in units:
            if restart_interval and count and \
                    count % restart_interval == 0:
                br.align_restart()
                pred = {i: 0 for i in idxs}
            count += 1
            for i, by, bx in blocks_of(unit):
                blk = coef[i][by, bx]
                if ah == 0:
                    dc_t = htables[(0, scan[comps[i]["id"]][0])]
                    size = _huff_decode(br, dc_t)
                    diff = _extend(br.read(size), size) if size else 0
                    pred[i] += diff
                    blk[0] = pred[i] << al
                elif br.read(1):
                    # refinement: OR in one magnitude bit (pairs with
                    # the encoder's arithmetic shift — two's complement
                    # makes |= correct for negative DC too)
                    blk[0] |= 1 << al
    else:
        # AC scan: exactly one component (F.2.3: AC scans are never
        # interleaved)
        i0 = idxs[0]
        ac_t = htables[(1, scan[comps[i0]["id"]][1])]
        bh, bw_ = _comp_blocks(frame, i0)
        eobrun = 0
        count = 0
        for by in range(bh):
            for bx in range(bw_):
                if restart_interval and count and \
                        count % restart_interval == 0:
                    br.align_restart()
                    eobrun = 0
                count += 1
                blk = coef[i0][by, bx]
                if ah == 0:
                    eobrun = _ac_first_block(br, ac_t, blk, ss, se, al,
                                             eobrun)
                else:
                    eobrun = _ac_refine_block(br, ac_t, blk, ss, se, al,
                                              eobrun)
    return br.pos


def _ac_first_block(br, ac_t, blk, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _huff_decode(br, ac_t)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(br.read(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(br, ac_t, blk, ss, se, al, eobrun):
    """Successive-approximation AC refinement (spec G.1.2.3 / the
    libjpeg decode_mcu_AC_refine control flow): newly significant
    coefficients arrive as ±1<<Al after runs counted over ZERO-history
    positions only; every nonzero-history coefficient passed on the
    way (and the whole band tail during an EOB run) consumes one
    correction bit."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _huff_decode(br, ac_t)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r < 15:
                    # FULL run count — the current block's band tail
                    # still consumes its correction bits below, then
                    # decrements (EOB0 covers exactly this block)
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read(r)
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            else:
                val = p1 if br.read(1) else m1
            while k <= se:
                if blk[k] != 0:
                    if br.read(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if br.read(1) and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _finish_progressive(frame, coef, qtables):
    """Dequantize + inverse zigzag + IDCT every accumulated block
    (vectorized: one einsum per component), then the shared
    upsample/crop/color tail."""
    comps = frame["comps"]
    hmax, vmax, _, _ = _geom(frame)
    planes = []
    for ci, c in enumerate(comps):
        q = qtables[c["tq"]]
        arr = coef[ci].astype(np.float64) * q[None, None, :]
        blocks = arr[:, :, UNZIGZAG].reshape(*arr.shape[:2], 8, 8)
        pix = np.einsum("xu,ijuv,vy->ijxy", _A.T, blocks, _A)
        bh, bw_ = pix.shape[:2]
        planes.append(pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8))
    return _assemble_image(planes, comps, frame["h"], frame["w"],
                           hmax, vmax)


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


def _prep_encode(img, subsample):
    """Shared encoder front half: color convert, pad to MCU multiples,
    box-downsample chroma. Returns (planes, samps, qids, hids, h, w,
    ph, pw, hmax, vmax, nch)."""
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
    return ds, samps, qids, hids, h, w, ph, pw, hmax, vmax, nch


def encode_jpeg(img: np.ndarray, subsample: bool = False) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) / (h, w, 1) grayscale uint8 as a
    baseline JPEG with Annex-K tables: 4:4:4 by default, 4:2:0 with
    subsample=True (exercises the decoder's chroma-upsample path).
    Test-fixture quality — no quality knob."""
    planes, samps, qids, hids, h, w, ph, pw, hmax, vmax, nch = \
        _prep_encode(img, subsample)

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


# ---------------------------------------------------------------------------
# Progressive encoder (tests only): libjpeg-style default scan script
# with spectral selection AND successive approximation, so round-trips
# exercise every progressive decode path (DC/AC first + refinement,
# EOB runs, ZRL-in-refinement, restarts). AC scans use a custom
# all-length-8 canonical Huffman table because the Annex-K baseline AC
# tables lack the EOBn (run-length > 1) symbols progressive needs.

_AC_PROG_SYMS = sorted(
    [r << 4 for r in range(15)]                      # EOB0..EOB14
    + [0xF0]                                         # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_AC_PROG = ([0, 0, 0, 0, 0, 0, 0, len(_AC_PROG_SYMS), 0, 0, 0, 0, 0, 0,
             0, 0], _AC_PROG_SYMS)


def _trunc_pt(v: int, al: int) -> int:
    """AC point transform: magnitude shift (truncation toward zero)."""
    return -((-v) >> al) if v < 0 else v >> al


class _ProgScanWriter:
    """Entropy writer for one progressive scan: wraps a _BitWriter and
    carries the EOB-run + buffered-correction-bit state, flushing into
    `out` (with optional restart markers) as units complete."""

    def __init__(self, out: bytearray, ac_enc=None):
        self.out = out
        self.ac_enc = ac_enc
        self.bw = _BitWriter()
        self.eobrun = 0
        self.bebuf: list[int] = []
        self.rst = 0

    def flush_eobrun(self):
        if self.eobrun > 0:
            nb = self.eobrun.bit_length() - 1
            c, l = self.ac_enc[nb << 4]
            self.bw.write(c, l)
            if nb:
                self.bw.write(self.eobrun & ((1 << nb) - 1), nb)
            for b in self.bebuf:
                self.bw.write(b, 1)
            self.eobrun = 0
            self.bebuf = []

    def restart(self):
        self.flush_eobrun()
        self.bw.flush()
        self.out.extend(self.bw.out)
        self.out.extend(bytes([0xFF, 0xD0 + self.rst]))
        self.rst = (self.rst + 1) % 8
        self.bw = _BitWriter()

    def finish(self):
        self.flush_eobrun()
        self.bw.flush()
        self.out.extend(self.bw.out)


def _enc_dc_first(sw, dc_enc, dc_shifted, pred):
    diff = dc_shifted - pred
    size, bits = _enc_coeff(diff) if diff else (0, 0)
    c, l = dc_enc[size]
    sw.bw.write(c, l)
    if size:
        sw.bw.write(bits, size)
    return dc_shifted


def _enc_ac_first_block(sw, blkzz, ss, se, al):
    ac = sw.ac_enc
    r = 0
    for k in range(ss, se + 1):
        t = _trunc_pt(int(blkzz[k]), al)
        if t == 0:
            r += 1
            continue
        sw.flush_eobrun()
        while r > 15:
            c, l = ac[0xF0]
            sw.bw.write(c, l)
            r -= 16
        size, bits = _enc_coeff(t)
        c, l = ac[(r << 4) | size]
        sw.bw.write(c, l)
        sw.bw.write(bits, size)
        r = 0
    if r > 0:
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def _enc_ac_refine_block(sw, blkzz, ss, se, al):
    ac = sw.ac_enc
    absv = [abs(int(blkzz[k])) >> al for k in range(ss, se + 1)]
    eob_rel = -1
    for idx, t in enumerate(absv):
        if t == 1:
            eob_rel = idx
    r = 0
    br_bits: list[int] = []
    for idx, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and idx <= eob_rel:
            sw.flush_eobrun()
            c, l = ac[0xF0]
            sw.bw.write(c, l)
            r -= 16
            for b in br_bits:
                sw.bw.write(b, 1)
            br_bits = []
        if t > 1:
            br_bits.append(t & 1)
            continue
        # newly significant (point-transformed magnitude exactly 1)
        sw.flush_eobrun()
        c, l = ac[(r << 4) | 1]
        sw.bw.write(c, l)
        sw.bw.write(1 if int(blkzz[ss + idx]) >= 0 else 0, 1)
        for b in br_bits:
            sw.bw.write(b, 1)
        br_bits = []
        r = 0
    if r > 0 or br_bits:
        sw.eobrun += 1
        sw.bebuf.extend(br_bits)
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def encode_jpeg_progressive(img: np.ndarray, subsample: bool = False,
                            restart_interval: int = 0) -> bytes:
    """Encode as progressive (SOF2) JPEG with the libjpeg-style default
    scan script: DC first at Al=1, luma AC split 1-5/6-63 at Al=2 with
    two refinement passes, chroma AC at Al=1 with one refinement, DC
    refinement last. Quantized coefficients are identical to
    encode_jpeg's, so decode(progressive) must equal decode(baseline)
    EXACTLY — the cross-codec anchor the tests pin."""
    planes, samps, qids, hids, h, w, ph, pw, hmax, vmax, nch = \
        _prep_encode(img, subsample)
    qmats = {0: _Q_LUM, 1: _Q_CHR}

    # quantized zigzag coefficient arrays, one (BH, BW, 64) per comp —
    # computed with the SAME per-block _fdct2 matmul + round as
    # _encode_block, NOT a batched einsum: a different FP summation
    # order could round a coefficient sitting exactly on a
    # quantization .5 boundary the other way, breaking the bit-exact
    # progressive==baseline anchor (review-caught)
    coef = []
    for ci, p in enumerate(planes):
        bh, bw_ = p.shape[0] // 8, p.shape[1] // 8
        q = qmats[qids[ci]]
        arr = np.empty((bh, bw_, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw_):
                block = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                arr[by, bx] = np.round(
                    _fdct2(block - 128.0).ravel()[ZIGZAG] / q).astype(
                    np.int64)
        coef.append(arr)

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
    seg(0xC2, bytes(sof))
    for tc, th, (counts, syms) in [(0, 0, _DC_LUM), (1, 0, _AC_PROG)] + (
            [(0, 1, _DC_CHR)] if nch == 3 else []):
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms))
    if restart_interval:
        seg(0xDD, restart_interval.to_bytes(2, "big"))

    dc_encs = {0: _enc_table(*_DC_LUM)}
    if nch == 3:
        dc_encs[1] = _enc_table(*_DC_CHR)
    ac_enc = _enc_table(*_AC_PROG)

    if nch == 3:
        script = [
            ("dc", [0, 1, 2], 0, 0, 0, 1),
            ("ac", 0, 1, 5, 0, 2),
            ("ac", 2, 1, 63, 0, 1),
            ("ac", 1, 1, 63, 0, 1),
            ("ac", 0, 6, 63, 0, 2),
            ("ac", 0, 1, 63, 2, 1),
            ("dc", [0, 1, 2], 0, 0, 1, 0),
            ("ac", 2, 1, 63, 1, 0),
            ("ac", 1, 1, 63, 1, 0),
            ("ac", 0, 1, 63, 1, 0),
        ]
    else:
        script = [
            ("dc", [0], 0, 0, 0, 1),
            ("ac", 0, 1, 63, 0, 2),
            ("ac", 0, 1, 63, 2, 1),
            ("dc", [0], 0, 0, 1, 0),
            ("ac", 0, 1, 63, 1, 0),
        ]

    mcuy, mcux = ph // (8 * vmax), pw // (8 * hmax)
    for kind, target, ss, se, ah, al in script:
        if kind == "dc":
            sos = bytearray([len(target)])
            for ci in target:
                sos += bytes([ci + 1, hids[ci] << 4])
            sos += bytes([ss, se, (ah << 4) | al])
            seg(0xDA, bytes(sos))
            sw = _ProgScanWriter(out)
            preds = {ci: 0 for ci in target}
            count = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and count and \
                            count % restart_interval == 0:
                        sw.restart()
                        preds = {ci: 0 for ci in target}
                    count += 1
                    for ci in target:
                        sh, sv = samps[ci]
                        for by in range(sv):
                            for bx in range(sh):
                                dc = int(coef[ci][my * sv + by,
                                                  mx * sh + bx, 0])
                                if ah == 0:
                                    preds[ci] = _enc_dc_first(
                                        sw, dc_encs[hids[ci]],
                                        dc >> al, preds[ci])
                                else:
                                    sw.bw.write((dc >> al) & 1, 1)
            sw.finish()
        else:
            ci = target
            sos = bytearray([1, ci + 1, 0x00])  # AC table 0 for all
            sos += bytes([ss, se, (ah << 4) | al])
            seg(0xDA, bytes(sos))
            sw = _ProgScanWriter(out, ac_enc)
            sh, sv = samps[ci]
            bh = -(- (-(-h * sv // vmax)) // 8)
            bw_ = -(- (-(-w * sh // hmax)) // 8)
            count = 0
            for by in range(bh):
                for bx in range(bw_):
                    if restart_interval and count and \
                            count % restart_interval == 0:
                        sw.restart()
                    count += 1
                    blk = coef[ci][by, bx]
                    if ah == 0:
                        _enc_ac_first_block(sw, blk, ss, se, al)
                    else:
                        _enc_ac_refine_block(sw, blk, ss, se, al)
            sw.finish()
    out.extend(b"\xff\xd9")
    return bytes(out)
