"""Minimal in-repo media codecs — no image/audio library needed.

This container ships no image libraries, but stdlib zlib is enough for
real PNG, and the uncompressed containers need only numpy — so
``DecodeImage(fake=False)`` is a working stage on real bytes for:

* PNG — 8-bit gray/RGB/gray+alpha/RGBA, non-interlaced: zlib-inflated
  IDAT, per-scanline unfiltering (None/Sub/Up vectorized; Average/Paeth
  within-row loops).
* JPEG — baseline/extended-sequential Huffman DCT (ops/jpeg.py): LUT
  Huffman entropy decode, batched-matmul IDCT, any chroma subsampling,
  restart intervals.  Progressive/arithmetic raise NotImplementedError.

* BMP — 24-bit BI_RGB (the classic Windows DIB): 14-byte file header,
  BITMAPINFOHEADER (or any >= 40-byte DIB header), BGR pixel rows padded
  to 4 bytes, bottom-up unless height is negative (top-down).
* PPM — binary P6 (netpbm): ASCII header ``P6 <w> <h> <maxval>`` with
  ``#`` comments, then raw RGB bytes.
* WAV — RIFF/WAVE with uncompressed integer PCM (format tag 1, 8- or
  16-bit): chunk walk to ``fmt `` + ``data``, samples normalized to
  int16 ``(n_samples, channels)``.

Both decoders are numpy-vectorized over the pixel payload (one
``frombuffer`` + stride reshape; no per-pixel Python) and return the
same ``(h, w, 3) uint8`` RGB layout the fake decoder produces, so every
downstream stage (resize / features / oracle) is codec-agnostic.
Encoders exist for tests and for writing decode outputs back out.
"""

from __future__ import annotations

import numpy as np

_BMP_FILE_HEADER = 14


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed (BI_RGB) BMP -> (h, w, 3) uint8 RGB."""
    if len(payload) < _BMP_FILE_HEADER + 40 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    off = int.from_bytes(payload[10:14], "little")
    dib = int.from_bytes(payload[14:18], "little")
    if dib < 40:
        raise ValueError(f"unsupported DIB header size {dib} (< 40)")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"only 24-bit BI_RGB BMP is supported (bpp={bpp}, "
            f"compression={comp})")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    stride = (w * 3 + 3) & ~3
    need = off + stride * h
    if len(payload) < need:
        raise ValueError(
            f"truncated BMP: need {need} bytes, have {len(payload)}")
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=off)
    rows = data.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[..., ::-1])  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit bottom-up BI_RGB BMP bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3), got {arr.shape}")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    off = _BMP_FILE_HEADER + 40
    size = off + stride * h
    header = (
        b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + (stride * h).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2       # 72 dpi
        + (0).to_bytes(4, "little") * 2
    )
    return header + body.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary netpbm P6 -> (h, w, 3) uint8 RGB (maxval <= 255)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header tokens: whitespace-separated, '#' comments run to newline
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3 and pos < n:
        c = payload[pos:pos + 1]
        if c == b"#":
            while pos < n and payload[pos:pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < n and not payload[pos:pos + 1].isspace():
                pos += 1
            tokens.append(payload[start:pos])
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError(f"16-bit PPM (maxval={maxval}) not supported")
    pos += 1  # exactly one whitespace byte after maxval
    need = w * h * 3
    if len(payload) - pos < need:
        raise ValueError(
            f"truncated PPM: need {need} bytes, have {len(payload) - pos}")
    return (np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
            .reshape(h, w, 3).copy())


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary P6 bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3), got {arr.shape}")
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE integer PCM -> ((n_samples, channels) int16, rate).

    Walks the RIFF chunk list (chunks may appear in any order and carry
    odd-length padding), requires format tag 1 (plain PCM) with 8- or
    16-bit samples; 8-bit WAV is unsigned by spec and is recentered to
    int16 as ``(x - 128) << 8``."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos, n = 12, len(payload)
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        clen = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("truncated WAV fmt chunk")
    tag = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if tag != 1 or bits not in (8, 16):
        raise ValueError(
            f"only 8/16-bit integer PCM WAV is supported (format tag "
            f"{tag}, {bits}-bit)")
    if channels < 1 or rate < 1:
        raise ValueError(f"bad WAV header: channels={channels} rate={rate}")
    bytes_per = bits // 8
    frames = len(data) // (bytes_per * channels)
    if frames == 0:
        raise ValueError("empty WAV data chunk")
    count = frames * channels
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2", count=count)
    else:
        samples = (np.frombuffer(data, dtype=np.uint8, count=count)
                   .astype(np.int16) - 128) << 8
    return samples.reshape(frames, channels).astype(np.int16, copy=False), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n_samples, channels) int16 -> 16-bit PCM RIFF/WAVE bytes."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError(f"expected (n, channels), got {samples.shape}")
    frames, channels = samples.shape
    data = samples.astype("<i2").tobytes()
    block = channels * 2
    fmt = ((1).to_bytes(2, "little") + channels.to_bytes(2, "little")
           + int(rate).to_bytes(4, "little")
           + (int(rate) * block).to_bytes(4, "little")
           + block.to_bytes(2, "little") + (16).to_bytes(2, "little"))
    body = (b"WAVE"
            + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_png(payload: bytes) -> np.ndarray:
    """Real PNG decode via stdlib zlib — no image library needed.

    Supports the mainstream subset: bit depth 8, color types 0 (gray),
    2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced.  Alpha is
    dropped and gray replicated so the output is the codec-agnostic
    (h, w, 3) uint8 RGB every other decoder produces.

    Unfiltering is per scanline (inherent: each row's filter depends on
    the reconstructed row above) with the row math vectorized — None/Up
    are one numpy op; Sub is a modular cumsum over the row's byte
    lanes; only Average/Paeth rows fall back to a within-row loop
    (encoders that cost-optimize emit mostly None/Sub/Up)."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = []
    while pos + 8 <= len(payload):
        (ln,), typ = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8 or interlace:
                raise NotImplementedError(
                    f"PNG depth={depth} interlace={interlace} unsupported "
                    "(in-repo codec handles 8-bit non-interlaced)")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
            if channels is None:
                raise NotImplementedError(f"PNG color type {ctype}")
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * channels
    rows = raw.reshape(h, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        cur = rows[y, 1:].copy()
        f = int(filters[y])
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 1:                       # Sub: modular cumsum per lane
            lanes = cur.reshape(-1, bpp).astype(np.uint64)
            out[y] = (np.cumsum(lanes, axis=0) & 0xFF) \
                .astype(np.uint8).reshape(-1)
        elif f == 2:                       # Up
            out[y] = cur + prev            # uint8 wraps mod 256
        elif f == 3:                       # Average (x-sequential)
            row = out[y]
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:                       # Paeth (x-sequential)
            row = out[y]
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                row[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {f}")
    px = out.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()


def encode_png(arr: np.ndarray, filter_type: int = 1) -> bytes:
    """(h, w, 3) uint8 -> 8-bit RGB PNG (single IDAT, zlib level 6).
    ``filter_type`` 0 (None) or 1 (Sub) — both decode on the fully
    vectorized path above; tests also hand-build Up/Average/Paeth."""
    import struct
    import zlib

    h, w, _ = arr.shape
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if filter_type == 0:
        body = np.concatenate(
            [np.full((h, 1), 0, np.uint8), a.reshape(h, -1)], axis=1)
    elif filter_type == 1:
        flat = a.reshape(h, w, 3)
        diff = flat.copy()
        diff[:, 1:] = flat[:, 1:] - flat[:, :-1]     # uint8 wraps
        body = np.concatenate(
            [np.full((h, 1), 1, np.uint8), diff.reshape(h, -1)], axis=1)
    else:
        raise ValueError("encode_png supports filter 0 or 1")

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(body.tobytes(), 6))
            + chunk(b"IEND", b""))


def y4m_info(payload: bytes) -> tuple[int, int, int, int, int]:
    """Parse a YUV4MPEG2 (Y4M) stream header -> (width, height,
    n_frames, header_len, frame_block_len).

    Y4M is THE standard uncompressed video interchange container
    (mjpegtools/ffmpeg `-f yuv4mpeg`): one ASCII header line, then
    fixed-size frames each prefixed by a plain ``FRAME\\n`` marker.
    Fixed frame size is the scale property this codec exploits:
    frame k lives at header_len + k * frame_block_len, so SAMPLING
    frames is offset arithmetic + a bounded read — skipped frames are
    never touched, let alone decoded."""
    nl = payload.find(b"\n")
    if not payload.startswith(b"YUV4MPEG2") or nl < 0:
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    cspace = "420"
    for tok in payload[10:nl].split(b" "):
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            cspace = tok[1:].decode()
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if cspace.startswith("420"):
        csize = (w // 2) * (h // 2)
    elif cspace == "444":
        csize = w * h
    elif cspace == "mono":
        csize = 0
    else:
        raise NotImplementedError(f"Y4M colorspace C{cspace}")
    block = 6 + w * h + 2 * csize          # b'FRAME\n' + Y + U + V
    body = len(payload) - (nl + 1)
    if body % block:
        raise ValueError("truncated Y4M stream (frame params unsupported)")
    return w, h, body // block, nl + 1, block


def decode_y4m_frames(payload: bytes, indices) -> list[np.ndarray]:
    """Decode ONLY the requested frame indices -> list of (h, w, 3)
    uint8 arrays (luma plane replicated to RGB; chroma is parsed past,
    not decoded — the deterministic, integer-exact contract feature
    extraction needs).  Each decode is one bounded frombuffer/reshape
    at a computed offset."""
    w, h, n, hdr, block = y4m_info(payload)
    out = []
    for i in indices:
        i = int(i)
        if not 0 <= i < n:
            raise IndexError(f"frame {i} out of range (n_frames={n})")
        off = hdr + i * block
        if payload[off:off + 6] != b"FRAME\n":
            raise ValueError(f"Y4M frame marker missing at frame {i}")
        y = np.frombuffer(payload, dtype=np.uint8, count=w * h,
                          offset=off + 6).reshape(h, w)
        out.append(np.repeat(y[:, :, None], 3, axis=2))
    return out


def encode_y4m(luma_frames, fps: str = "25:1") -> bytes:
    """(h, w) uint8 luma frames -> C420 Y4M stream (chroma planes set
    to the neutral 128).  Width/height must be even (C420)."""
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in luma_frames]
    if not frames:
        raise ValueError("encode_y4m needs at least one frame")
    h, w = frames[0].shape
    if w % 2 or h % 2:
        raise ValueError("C420 needs even width/height")
    chroma = np.full((w // 2) * (h // 2), 128, dtype=np.uint8).tobytes()
    parts = [f"YUV4MPEG2 W{w} H{h} F{fps} Ip A1:1 C420\n".encode()]
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share one shape")
        parts.append(b"FRAME\n" + f.tobytes() + chroma + chroma)
    return b"".join(parts)


def _decode_jpeg(payload: bytes):
    from .jpeg import decode_jpeg

    return decode_jpeg(payload)


#: mime -> decoder for the formats the strict DecodeImage path supports
DECODERS = {
    "image/bmp": decode_bmp,
    "image/x-ms-bmp": decode_bmp,
    "image/x-portable-pixmap": decode_ppm,
    "image/png": decode_png,
    "image/jpeg": _decode_jpeg,
    "image/jpg": _decode_jpeg,
}

#: mime -> decoder for the strict DecodeAudio path
AUDIO_DECODERS = {
    "audio/wav": decode_wav,
    "audio/x-wav": decode_wav,
    "audio/wave": decode_wav,
}
