"""Baseline JPEG (ITU-T T.81 sequential DCT, Huffman) — stdlib + numpy.

The last in-repo codec gap: ``decode_jpeg`` turns a baseline or
extended-sequential JFIF payload into the codec-agnostic (h, w, 3)
uint8 RGB every other decoder in ops/codec.py produces.  Supported:
8-bit precision, 1 (grayscale) or 3 (YCbCr) components, any sampling
factors (2x2 / 2x1 / 1x1 chroma subsampling upsampled by replication),
multi-table DQT/DHT segments, 16-bit quantizer entries, byte stuffing,
and DRI/RSTn restart intervals.  Progressive (SOF2), arithmetic coding
and 12-bit precision raise NotImplementedError.

Performance shape: the entropy decode is an amortized-O(1) MSB-first
bit reader over a 65536-entry Huffman peek LUT (one table lookup per
symbol — the classic fast-huffman layout), and everything after the
symbol loop is batched numpy: dequantize + de-zigzag as one fancy-index
scatter over ALL blocks, IDCT as one (nblocks, 8, 8) matmul pair
against the orthonormal DCT-III basis, chroma upsample as np.repeat,
color convert as whole-plane arithmetic.  Inside the engine the codec
runs per row of a DecodeImage actor batch — the ragged-binary contract
documented at ops/multimodal.py.

``encode_jpeg`` exists for tests and round-trips through the decoder:
4:4:4 or 4:2:0, unit ("lossless-but-rounding") or custom quantizers,
optional restart intervals, fixed valid Huffman tables (12 DC symbols
at 4 bits, the 162 standard AC run/size symbols at 8 bits — canonical,
never the reserved all-ones code).
"""

from __future__ import annotations

import struct

import numpy as np


def _zigzag() -> np.ndarray:
    """Raster index of the k-th zigzag coefficient (T.81 figure A.6)."""
    out = []
    for s in range(15):
        pts = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            pts.reverse()
        out.extend(pts)
    return np.array([r * 8 + c for r, c in out], dtype=np.int64)


ZZ = _zigzag()

# orthonormal DCT basis: T[k, n] = s(k) cos((2n+1) k pi / 16);
# forward F = T f T', inverse f = T' F T
_T = np.array([[(np.sqrt(1 / 8) if k == 0 else 0.5)
                * np.cos((2 * n + 1) * k * np.pi / 16)
                for n in range(8)] for k in range(8)])


def _build_huff_lut(counts, symbols):
    """Canonical Huffman table -> 16-bit peek LUT (symbol, code length).

    Every code of length L owns a 2^(16-L) slice of the peek space —
    decode is one array lookup, no bit-by-bit tree walk."""
    lut_sym = np.zeros(1 << 16, dtype=np.int16)
    lut_len = np.zeros(1 << 16, dtype=np.int8)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            lut_sym[lo:hi] = symbols[k]
            lut_len[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return lut_sym, lut_len


class _BitReader:
    """MSB-first reader over one entropy segment (stuffing removed)."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self, need: int):
        while self.n < need:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read_huff(self, lut) -> int:
        lut_sym, lut_len = lut
        self._fill(16)
        peek = (self.acc >> (self.n - 16)) & 0xFFFF
        length = int(lut_len[peek])
        if length == 0:
            raise ValueError("invalid JPEG Huffman code")
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return int(lut_sym[peek])

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        self._fill(s)
        v = (self.acc >> (self.n - s)) & ((1 << s) - 1)
        self.n -= s
        self.acc &= (1 << self.n) - 1
        if v < (1 << (s - 1)):                 # T.81 EXTEND
            v -= (1 << s) - 1
        return v


def _split_scan(payload: bytes, pos: int) -> list[bytes]:
    """Post-SOS entropy stream -> restart segments, stuffing removed."""
    segs, cur, n = [], bytearray(), len(payload)
    i = pos
    while i < n:
        j = payload.find(b"\xff", i)
        if j < 0:
            cur += payload[i:]
            break
        cur += payload[i:j]
        m = payload[j + 1] if j + 1 < n else 0xD9
        if m == 0x00:                          # stuffed data byte
            cur += b"\xff"
            i = j + 2
        elif 0xD0 <= m <= 0xD7:                # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        else:                                  # next marker ends the scan
            break
    segs.append(bytes(cur))
    return segs


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline/extended-sequential JPEG -> (h, w, 3) uint8 RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    frame = None
    restart = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {pos}")
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:                     # EOI before any scan
            break
        seglen = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        body = payload[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:                     # DQT (multi-table)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq:
                    qt[tq] = np.frombuffer(
                        body[i:i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                else:
                    qt[tq] = np.frombuffer(
                        body[i:i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
        elif marker == 0xC4:                   # DHT (multi-table)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                counts = list(body[i + 1:i + 17])
                nsym = sum(counts)
                symbols = list(body[i + 17:i + 17 + nsym])
                huff[(tc, th)] = _build_huff_lut(counts, symbols)
                i += 17 + nsym
        elif marker in (0xC0, 0xC1):           # SOF0 / SOF1
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} (progressive/"
                "arithmetic/hierarchical) — in-repo codec is baseline")
        elif marker == 0xDD:                   # DRI
            restart = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:                   # SOS -> entropy decode
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame[2] if x["id"] == cs)
                scan.append((comp, tables >> 4, tables & 15))
            return _decode_scan(payload, pos, frame, scan, qt, huff,
                                restart)
        # APPn / COM / anything else: skipped by length
    raise ValueError("JPEG stream ended before SOS")


def _decode_scan(payload, pos, frame, scan, qt, huff, restart):
    h, w, _ = frame
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # zigzag-order coefficient stacks, one (rows, cols, 64) per comp
    stacks = [np.zeros((mcuy * c["v"], mcux * c["h"], 64))
              for c, _, _ in scan]
    segs = _split_scan(payload, pos)
    br = _BitReader(segs[0])
    seg_i = 0
    preds = [0] * len(scan)
    for mcu in range(mcux * mcuy):
        if restart and mcu and mcu % restart == 0:
            seg_i += 1                         # RST: new segment,
            br = _BitReader(segs[seg_i])       # byte-aligned,
            preds = [0] * len(scan)            # DC predictors reset
        my, mx = divmod(mcu, mcux)
        for ci, (comp, td, ta) in enumerate(scan):
            dc_lut, ac_lut = huff[(0, td)], huff[(1, ta)]
            for vy in range(comp["v"]):
                for hx in range(comp["h"]):
                    blk = stacks[ci][my * comp["v"] + vy,
                                     mx * comp["h"] + hx]
                    s = br.read_huff(dc_lut)
                    preds[ci] += br.receive_extend(s)
                    blk[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = br.read_huff(ac_lut)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:        # EOB
                                break
                            k += 16            # ZRL
                            continue
                        k += r
                        blk[k] = br.receive_extend(s)
                        k += 1
    planes = []
    for ci, (comp, _, _) in enumerate(scan):
        rows, cols, _ = stacks[ci].shape
        coef = np.zeros_like(stacks[ci])
        coef[..., ZZ] = stacks[ci] * qt[comp["tq"]][None, None, :]
        f = _T.T @ coef.reshape(-1, 8, 8) @ _T + 128.0
        plane = (f.reshape(rows, cols, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(rows * 8, cols * 8))
        plane = np.repeat(plane, vmax // comp["v"], axis=0)
        plane = np.repeat(plane, hmax // comp["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise NotImplementedError(f"JPEG with {len(planes)} components")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder (tests + writing decode outputs back out)
# --------------------------------------------------------------------------

_DC_SYMS = list(range(12))                              # all 4-bit codes
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s                 # all 8-bit codes
                           for r in range(16) for s in range(1, 11)]
_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, 162] + [0] * 8
_DC_CODE = {s: (i, 4) for i, s in enumerate(_DC_SYMS)}
_AC_CODE = {s: (i, 8) for i, s in enumerate(_AC_SYMS)}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int):
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0)             # byte stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def pad(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) -> (rows, cols, 64)."""
    hh, ww = plane.shape
    b = (plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
         - 128.0)
    return (_T @ b @ _T.T).reshape(hh // 8, ww // 8, 64)


def _pad8(plane: np.ndarray, mh: int = 8, mw: int = 8) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % mh, -w % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(arr: np.ndarray, quant: np.ndarray | None = None,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) gray -> baseline JFIF bytes.

    ``quant``: 8x8 quantizer in RASTER order, used for every component
    (default all-ones = rounding-only loss).  ``subsample=True`` emits
    4:2:0 (2x2-averaged chroma; the decoder upsamples by replication,
    so constant-chroma 2x2 cells round-trip exactly)."""
    a = np.asarray(arr)
    if quant is None:
        quant = np.ones((8, 8))
    q = np.maximum(np.asarray(quant, dtype=np.int64).reshape(64), 1)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if gray:
        planes = [a.astype(np.float64)]
        samp = [(1, 1)]
    else:
        r, g, b = (a[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            cbp, crp = _pad8(cb, 2, 2), _pad8(cr, 2, 2)
            cb = (cbp.reshape(cbp.shape[0] // 2, 2, -1, 2)
                  .mean(axis=(1, 3)))
            cr = (crp.reshape(crp.shape[0] // 2, 2, -1, 2)
                  .mean(axis=(1, 3)))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coeffs = []
    for plane, (sh, sv) in zip(planes, samp):
        padded = _pad8(plane, mcuy * sv * 8, mcux * sh * 8)
        z = _fdct_blocks(padded)[..., ZZ] / q[None, None, :]
        coeffs.append(np.rint(z).astype(np.int64))

    bw = _BitWriter()
    preds = [0] * len(planes)
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.pad()
            bw.out += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1)
                                           % 8)])
            preds = [0] * len(planes)
        my, mx = divmod(mcu, mcux)
        for ci, (sh, sv) in enumerate(samp):
            for vy in range(sv):
                for hx in range(sh):
                    blk = coeffs[ci][my * sv + vy, mx * sh + hx]
                    diff = int(blk[0]) - preds[ci]
                    preds[ci] = int(blk[0])
                    s = _category(diff)
                    code, ln = _DC_CODE[s]
                    bw.write(code, ln)
                    if s:
                        bw.write(diff if diff > 0
                                 else diff + (1 << s) - 1, s)
                    run = 0
                    nz = np.nonzero(blk[1:])[0]
                    last = int(nz[-1]) + 1 if len(nz) else 0
                    for k in range(1, last + 1):
                        v = int(np.clip(blk[k], -1023, 1023))
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = _AC_CODE[0xF0]
                            bw.write(code, ln)
                            run -= 16
                        s = _category(v)
                        code, ln = _AC_CODE[(run << 4) | s]
                        bw.write(code, ln)
                        bw.write(v if v > 0 else v + (1 << s) - 1, s)
                        run = 0
                    if last < 63:
                        code, ln = _AC_CODE[0x00]
                        bw.write(code, ln)
    bw.pad()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    out = bytearray(b"\xff\xd8")
    # DQT entries travel in zigzag order (q is raster): table id 0,
    # 8-bit precision (q must fit a byte; the default unit table does)
    out += seg(0xDB, bytes([0]) + bytes(int(q[i]) for i in ZZ))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS[:16])
               + bytes(_DC_SYMS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS[:16])
               + bytes(_AC_SYMS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
