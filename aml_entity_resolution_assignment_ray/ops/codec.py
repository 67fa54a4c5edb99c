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
* GIF — 87a/89a first frame: full variable-width LZW (12-bit
  dictionary, deferred clear), global/local color tables, interlaced
  row order, sub-screen frames composited at (left, top).

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


# --------------------------------------------------------------------------
# MP4 / ISO BMFF container: sample-table parse + sample EXTRACTION.
# No bitstream decode — H.264/H.265 genuinely needs a video library —
# but the container work that matters at 100 TB (find the k sampled
# frames' byte ranges and touch ONLY those) is all box arithmetic.
# --------------------------------------------------------------------------


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each ISO BMFF box
    in [start, end): u32be size + 4cc, size==1 -> 64-bit largesize,
    size==0 -> to end."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos:pos + 4], "big")
        typ = bytes(buf[pos + 4:pos + 8])
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError(f"truncated MP4 largesize box {typ!r}")
            size = int.from_bytes(buf[pos + 8:pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"truncated MP4 box {typ!r}")
        yield typ, pos + hdr, pos + size
        pos += size


def mp4_sample_table(payload: bytes) -> dict:
    """ISO BMFF (MP4/MOV) -> the VIDEO track's sample table:
    ``{codec, timescale, n_samples, offsets, sizes, pts, width,
    height}`` with int64 numpy arrays.  Walks moov/trak/mdia/minf/stbl,
    picks the first track whose hdlr handler is ``vide``, and expands
    stts (timestamps), stsz (sizes) and stsc x stco/co64
    (chunk layout) into absolute per-sample byte ranges — the index a
    frame sampler needs to read ONLY the sampled frames' bytes."""
    if len(payload) < 8:
        raise ValueError("not an MP4 payload (too short)")
    tracks: list[dict] = []

    def walk(start: int, end: int, into: dict | None):
        for typ, b, e in _iter_boxes(payload, start, end):
            if typ == b"trak":
                t: dict = {}
                tracks.append(t)
                walk(b, e, t)
            elif typ in (b"moov", b"mdia", b"minf", b"stbl"):
                walk(b, e, into)
            elif into is not None:
                into[typ] = (b, e)

    walk(0, len(payload), None)
    video = None
    for t in tracks:
        if b"hdlr" in t:
            b, e = t[b"hdlr"]
            if payload[b + 8:b + 12] == b"vide":
                video = t
                break
    if video is None:
        raise ValueError("MP4 has no video track (hdlr 'vide')")
    missing = [n.decode() for n in (b"mdhd", b"stsd", b"stts", b"stsz",
                                    b"stsc")
               if n not in video]
    if missing or (b"stco" not in video and b"co64" not in video):
        raise ValueError(f"MP4 video track missing boxes: "
                         f"{missing or ['stco/co64']}")

    def u32(o: int) -> int:
        return int.from_bytes(payload[o:o + 4], "big")

    # mdhd: timescale (v0 at +12, v1 at +20)
    b, _ = video[b"mdhd"]
    timescale = u32(b + (20 if payload[b] == 1 else 12))

    # stsd: first sample entry's 4cc is the codec; visual entries carry
    # width/height at +24/+26 of the entry payload
    b, e = video[b"stsd"]
    codec, width, height = "", 0, 0
    if u32(b + 4) >= 1 and b + 16 <= e:
        codec = payload[b + 12:b + 16].decode("ascii", "replace")
        if b + 16 + 28 <= e:
            width = int.from_bytes(payload[b + 40:b + 42], "big")
            height = int.from_bytes(payload[b + 42:b + 44], "big")

    # stsz: fixed or per-sample sizes
    b, e = video[b"stsz"]
    fixed, n = u32(b + 4), u32(b + 8)
    if fixed:
        sizes = np.full(n, fixed, dtype=np.int64)
    else:
        if b + 12 + 4 * n > e:
            raise ValueError("truncated MP4 stsz")
        sizes = np.frombuffer(payload, dtype=">u4", count=n,
                              offset=b + 12).astype(np.int64)

    # stco / co64: chunk offsets
    if b"stco" in video:
        b, e = video[b"stco"]
        nch = u32(b + 4)
        if b + 8 + 4 * nch > e:
            raise ValueError("truncated MP4 stco")
        offsets = np.frombuffer(payload, dtype=">u4", count=nch,
                                offset=b + 8).astype(np.int64)
    else:
        b, e = video[b"co64"]
        nch = u32(b + 4)
        if b + 8 + 8 * nch > e:
            raise ValueError("truncated MP4 co64")
        offsets = np.frombuffer(payload, dtype=">u8", count=nch,
                                offset=b + 8).astype(np.int64)

    # stsc: (first_chunk, samples_per_chunk) runs -> per-chunk counts
    b, e = video[b"stsc"]
    nent = u32(b + 4)
    ent = np.frombuffer(payload, dtype=">u4", count=3 * nent,
                        offset=b + 8).astype(np.int64).reshape(nent, 3)
    per_chunk = np.empty(nch, dtype=np.int64)
    for i in range(nent):
        fc = ent[i, 0] - 1
        last = ent[i + 1, 0] - 1 if i + 1 < nent else nch
        if not 0 <= fc <= last <= nch:
            raise ValueError("MP4 stsc chunk runs out of order")
        per_chunk[fc:last] = ent[i, 1]
    if per_chunk.sum() != n:
        raise ValueError(f"MP4 stsc expands to {per_chunk.sum()} samples, "
                         f"stsz says {n}")

    # absolute per-sample offsets: chunk base + within-chunk cum-size
    if n:
        chunk_of = np.repeat(np.arange(nch), per_chunk)
        cs = np.cumsum(sizes) - sizes
        starts = np.concatenate(
            [[0], np.cumsum(per_chunk)[:-1]]).astype(np.int64)
        within = cs - cs[np.minimum(starts, n - 1)][chunk_of]
        sample_off = offsets[chunk_of] + within
        if int((sample_off + sizes).max()) > len(payload):
            raise ValueError("MP4 sample ranges exceed the payload")
    else:
        sample_off = np.zeros(0, dtype=np.int64)

    # stts: (count, delta) runs -> per-sample decode timestamps
    b, e = video[b"stts"]
    nrun = u32(b + 4)
    runs = np.frombuffer(payload, dtype=">u4", count=2 * nrun,
                         offset=b + 8).astype(np.int64).reshape(nrun, 2)
    deltas = np.repeat(runs[:, 1], runs[:, 0])
    if len(deltas) != n:
        raise ValueError(f"MP4 stts covers {len(deltas)} samples, "
                         f"stsz says {n}")
    pts = np.cumsum(deltas) - deltas

    return {"codec": codec, "timescale": int(timescale), "n_samples": int(n),
            "offsets": sample_off, "sizes": sizes, "pts": pts,
            "width": width, "height": height}


def mp4_extract_samples(payload: bytes, indices,
                        table: dict | None = None) -> list[bytes]:
    """The encoded bytes of the video samples at ``indices`` — a byte
    slice per sample, nothing else of mdat touched."""
    t = table if table is not None else mp4_sample_table(payload)
    out = []
    for i in indices:
        i = int(i)
        if not 0 <= i < t["n_samples"]:
            raise ValueError(f"sample index {i} out of range "
                             f"0..{t['n_samples'] - 1}")
        o, s = int(t["offsets"][i]), int(t["sizes"][i])
        out.append(payload[o:o + s])
    return out


def encode_mp4(samples: list[bytes], *, timescale: int = 600,
               durations: list[int] | None = None, width: int = 64,
               height: int = 48, codec: bytes = b"avc1",
               n_chunks: int = 2) -> bytes:
    """Structurally valid single-video-track MP4 around the given
    encoded sample payloads, for tests: real ftyp/mdat/moov box layout,
    stts run compression, multi-chunk stsc/stco.  The samples are
    stored verbatim (no encoder exists in-repo), so extraction is
    byte-exact against the input."""
    n = len(samples)
    if durations is None:
        durations = [100] * n
    if len(durations) != n:
        raise ValueError("durations must match samples")

    def box(typ: bytes, data: bytes) -> bytes:
        return (8 + len(data)).to_bytes(4, "big") + typ + data

    def full(typ: bytes, data: bytes, ver: int = 0, flags: int = 0) -> bytes:
        return box(typ, bytes([ver]) + flags.to_bytes(3, "big") + data)

    ftyp = box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isom")
    mdat = box(b"mdat", b"".join(samples))

    # chunk layout: as even as possible, so stsc has 1-2 runs
    nch = max(1, min(n_chunks, n)) if n else 0
    per_chunk = ([n // nch + 1] * (n % nch)
                 + [n // nch] * (nch - n % nch)) if n else []
    sizes = [len(s) for s in samples]
    data0 = len(ftyp) + 8
    chunk_offsets, si = [], 0
    for c in per_chunk:
        chunk_offsets.append(data0 + sum(sizes[:si]))
        si += c

    def runs(vals):
        out = []
        for v in vals:
            if out and out[-1][1] == v:
                out[-1][0] += 1
            else:
                out.append([1, v])
        return out

    stts = full(b"stts", len(runs(durations)).to_bytes(4, "big") + b"".join(
        c.to_bytes(4, "big") + d.to_bytes(4, "big")
        for c, d in runs(durations)))
    stsc_runs = []
    for ci, c in enumerate(per_chunk):
        if not stsc_runs or stsc_runs[-1][1] != c:
            stsc_runs.append((ci + 1, c))
    stsc = full(b"stsc", len(stsc_runs).to_bytes(4, "big") + b"".join(
        fc.to_bytes(4, "big") + c.to_bytes(4, "big") + (1).to_bytes(4, "big")
        for fc, c in stsc_runs))
    stsz = full(b"stsz", (0).to_bytes(4, "big") + n.to_bytes(4, "big")
                + b"".join(s.to_bytes(4, "big") for s in sizes))
    stco = full(b"stco", len(chunk_offsets).to_bytes(4, "big") + b"".join(
        o.to_bytes(4, "big") for o in chunk_offsets))
    entry = box(codec, bytes(6) + (1).to_bytes(2, "big") + bytes(16)
                + width.to_bytes(2, "big") + height.to_bytes(2, "big")
                + (0x00480000).to_bytes(4, "big") * 2 + bytes(4)
                + (1).to_bytes(2, "big") + bytes(32)
                + (24).to_bytes(2, "big") + (0xFFFF).to_bytes(2, "big"))
    stsd = full(b"stsd", (1).to_bytes(4, "big") + entry)
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    url = full(b"url ", b"", flags=1)
    dref = full(b"dref", (1).to_bytes(4, "big") + url)
    vmhd = full(b"vmhd", bytes(8), flags=1)
    minf = box(b"minf", vmhd + box(b"dinf", dref) + stbl)
    dur = sum(durations)
    hdlr = full(b"hdlr", bytes(4) + b"vide" + bytes(12) + b"VideoHandler\0")
    mdhd = full(b"mdhd", bytes(8) + timescale.to_bytes(4, "big")
                + dur.to_bytes(4, "big") + (0x55C4).to_bytes(2, "big")
                + bytes(2))
    mdia = box(b"mdia", mdhd + hdlr + minf)
    unity = (b"".join(v.to_bytes(4, "big") for v in
                      (0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)))
    tkhd = full(b"tkhd", bytes(8) + (1).to_bytes(4, "big") + bytes(4)
                + dur.to_bytes(4, "big") + bytes(16) + unity
                + (width << 16).to_bytes(4, "big")
                + (height << 16).to_bytes(4, "big"), flags=7)
    mvhd = full(b"mvhd", bytes(8) + timescale.to_bytes(4, "big")
                + dur.to_bytes(4, "big") + (0x00010000).to_bytes(4, "big")
                + (0x0100).to_bytes(2, "big") + bytes(10) + unity
                + bytes(24) + (2).to_bytes(4, "big"))
    moov = box(b"moov", mvhd + box(b"trak", tkhd + mdia))
    return ftyp + mdat + moov


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW (LSB-first variable-width codes, clear/end
    codes, 12-bit cap with deferred clear) -> ``n_pixels`` uint8
    palette indices.  The code loop is per-CODE Python (each code
    emits a whole dictionary string), like PNG's Paeth rows — the
    only non-vectorizable part of the format."""
    if not 2 <= min_code <= 11:
        raise ValueError(f"bad LZW min code size {min_code}")
    clear = 1 << min_code
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    buf = nbits = di = done = 0
    prev = None
    out = np.empty(n_pixels, dtype=np.uint8)
    while done < n_pixels:
        while nbits < width:
            if di >= len(data):
                raise ValueError("truncated GIF LZW stream")
            buf |= data[di] << nbits
            di += 1
            nbits += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW stream starts with a non-literal")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]      # the KwKwK case
            else:
                raise ValueError(f"GIF LZW code {code} out of range")
            if len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
        take = min(len(entry), n_pixels - done)
        out[done:done + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        done += take
        prev = entry
    if done < n_pixels:
        raise ValueError("GIF LZW stream ended early")
    return out


_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))   # interlace row order


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a FIRST frame -> (screen_h, screen_w, 3) uint8 RGB.

    Full LZW decode (variable-width codes, 12-bit dictionary with
    deferred clear), global/local color tables, interlaced row order,
    frames smaller than the logical screen composited at their
    (left, top) onto the background color.  Animation is out of the
    single-image DecodeImage contract, so later frames are ignored;
    89a transparency is rendered as the palette color (no alpha in
    the engine's RGB layout)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF8xa magic)")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    packed, bg = payload[10], payload[11]
    pos = 13
    gpal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gpal = np.frombuffer(payload[pos:pos + 3 * n],
                             dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        blk = payload[pos]
        pos += 1
        if blk == 0x3B:                      # trailer
            break
        if blk == 0x21:                      # extension: skip sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if blk != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{blk:02x}")
        left = int.from_bytes(payload[pos:pos + 2], "little")
        top = int.from_bytes(payload[pos + 2:pos + 4], "little")
        w = int.from_bytes(payload[pos + 4:pos + 6], "little")
        h = int.from_bytes(payload[pos + 6:pos + 8], "little")
        ipacked = payload[pos + 8]
        pos += 9
        pal = gpal
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(payload[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image has no color table")
        if left + w > sw or top + h > sh:
            raise ValueError("GIF frame exceeds the logical screen")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(data), min_code, w * h).reshape(h, w)
        if ipacked & 0x40:                   # interlaced: rows arrive
            order = np.concatenate([         # in 4 passes
                np.arange(s, h, step) for s, step in _GIF_PASSES])
            frame = np.empty((h, w), dtype=np.uint8)
            frame[order] = idx
        else:
            frame = idx
        if int(frame.max(initial=0)) >= len(pal):
            raise ValueError("GIF pixel index outside the color table")
        rgb = np.zeros((sh, sw, 3), dtype=np.uint8)
        if gpal is not None and bg < len(gpal):
            rgb[:] = gpal[bg]
        rgb[top:top + h, left:left + w] = pal[frame]
        return rgb
    raise ValueError("GIF contains no image data")


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB (<= 256 distinct colors) -> single-frame
    GIF89a, for tests.  Pixels are emitted as 9-bit LZW literals with
    a clear code every 250 pixels, which keeps the dictionary below
    the first width increase — a valid (if uncompressed) stream any
    conformant decoder accepts."""
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"encode_gif needs <= 256 colors, got {len(pal)}")
    pal256 = np.zeros((256, 3), dtype=np.uint8)
    pal256[:len(pal)] = pal
    idx = inv.astype(np.uint8).reshape(h, w)
    if interlace:
        order = np.concatenate([
            np.arange(s, h, step) for s, step in _GIF_PASSES])
        idx = idx[order]
    head = (b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + bytes([0xF7, 0, 0]) + pal256.tobytes())
    desc = (b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little")
            + h.to_bytes(2, "little") + bytes([0x40 if interlace else 0]))
    codes, pix = [256], idx.reshape(-1)      # 256 = clear at min_code 8
    for i in range(0, len(pix), 250):
        codes.extend(int(p) for p in pix[i:i + 250])
        codes.append(256)
    codes[-1] = 257                          # end-of-information
    buf = nbits = 0
    stream = bytearray()
    for c in codes:                          # 9-bit LSB-first packing
        buf |= c << nbits
        nbits += 9
        while nbits >= 8:
            stream.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        stream.append(buf & 0xFF)
    blocks = bytearray([8])                  # LZW min code size
    for i in range(0, len(stream), 255):
        sub = stream[i:i + 255]
        blocks += bytes([len(sub)]) + sub
    blocks.append(0)
    return head + desc + bytes(blocks) + b"\x3b"


def _decode_jpeg(payload: bytes):
    from .jpeg import decode_jpeg

    return decode_jpeg(payload)


#: mime -> decoder for the formats the strict DecodeImage path supports
DECODERS = {
    "image/bmp": decode_bmp,
    "image/x-ms-bmp": decode_bmp,
    "image/x-portable-pixmap": decode_ppm,
    "image/png": decode_png,
    "image/gif": decode_gif,
    "image/jpeg": _decode_jpeg,
    "image/jpg": _decode_jpeg,
}

#: mime -> decoder for the strict DecodeAudio path
AUDIO_DECODERS = {
    "audio/wav": decode_wav,
    "audio/x-wav": decode_wav,
    "audio/wave": decode_wav,
}
