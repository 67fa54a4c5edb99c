"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with sidecar
metadata columns (mime, width/height or sample rate, n_frames).  The
decode / feature-extract / resize / frame-sample stages are ACTOR-POOL
``map_batches`` steps whose Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is real and tested.  Decode is REAL
for 24-bit BMP, binary PPM, 8-bit PNG (stdlib zlib), baseline JPEG
(ops/jpeg.py — LUT Huffman + batched-matmul IDCT), integer-PCM WAV,
GIF (in-repo LZW), and Y4M/YUV4MPEG2 video frame sampling — the
in-repo codecs in ops/codec.py.  MP4/MOV gets a real CONTAINER parse
(ExtractVideoSamples: box walk + sample-table expansion, only the
sampled frames' byte ranges are touched); only the work that
genuinely needs an external library (progressive JPEG, WebP, MP3
audio decode, H.264/H.265 bitstream decode) stays behind
``NotImplementedError`` (strict) or the deterministic fake decoder
(``fake=True``) whose output shape/dtype matches a real decode.

Batch sizes for binary payloads must be SMALL: ``batch_size`` here is
rows, and a row can be megabytes — size so batch x concurrency fits the
worker heap (SURVEY: "large binary payloads need small batches").
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("mime", pa.string()),
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_frames", pa.int32()),
])


def make_fake_media_table(n: int = 32, seed: int = 5,
                          payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.RandomState(seed)
    ids, mimes, payloads, ws, hs, fs = [], [], [], [], [], []
    for i in range(n):
        ids.append(f"m{i:05d}")
        mimes.append(["image/png", "audio/wav", "video/mp4"][i % 3])
        payloads.append(rng.bytes(payload_bytes))
        ws.append(int(rng.randint(16, 256)))
        hs.append(int(rng.randint(16, 256)))
        fs.append(int(rng.randint(1, 32)))
    return pa.table({
        "media_id": pa.array(ids), "mime": pa.array(mimes),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(ws, pa.int32()), "height": pa.array(hs, pa.int32()),
        "n_frames": pa.array(fs, pa.int32()),
    })


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: payload-digest-seeded
    uint8 HxWx3 array (same shape/dtype a PNG decode would yield)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


class DecodeImage:
    """Actor-pool stage: payload -> decoded pixel tensor (flat uint8 list
    column + shape columns).

    Strict mode (``fake=False``) REALLY decodes the formats the in-repo
    codec supports (24-bit BMP, binary PPM, 8-bit PNG via stdlib zlib,
    baseline JPEG — ops/codec.py, ops/jpeg.py) and raises
    NotImplementedError only for mimes that genuinely need an external
    library (WebP, progressive JPEG).  ``fake=True``
    substitutes the deterministic payload-digest stand-in for ANY mime,
    which is what the value oracle replays.  The decode loop is per row
    by nature — a ragged binary payload is the codec's unit of work —
    but each decode is one numpy frombuffer/reshape, not per-pixel
    Python."""

    def __init__(self, fake: bool = False):
        # codec table resolved ONCE per actor (the "open the codec in
        # __init__" slot a real library would use)
        from .codec import DECODERS

        self.fake = fake
        self.decoders = DECODERS

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        pixels, shapes = [], []
        mimes = df["mime"] if "mime" in df.columns else [None] * len(df)
        for payload, w, h, mime in zip(df["payload"], df["width"],
                                       df["height"], mimes):
            if self.fake:
                arr = _fake_pixels(payload, int(w), int(h))
            else:
                dec = self.decoders.get(str(mime))
                if dec is None:
                    raise NotImplementedError(
                        f"no in-repo codec for mime {mime!r} (only "
                        f"{sorted(self.decoders)} decode without an "
                        "image library); re-run with fake=True for the "
                        "deterministic stub")
                arr = dec(bytes(payload))
            pixels.append(arr.reshape(-1))
            shapes.append([int(arr.shape[0]), int(arr.shape[1]), 3])
        return pd.DataFrame({
            "media_id": df["media_id"].to_numpy(),
            "pixels": pixels,
            "shape": shapes,
        })


def _shape_groups(df: pd.DataFrame):
    """Row indices grouped by identical (h, w, c) — batches mix shapes,
    but each group stacks into ONE dense tensor for vectorized kernels
    (no per-row Python in the hot path)."""
    shapes = [tuple(int(x) for x in s) for s in df["shape"]]
    groups: dict[tuple, list[int]] = {}
    for i, s in enumerate(shapes):
        groups.setdefault(s, []).append(i)
    return groups


class ResizeImage:
    """Actor-pool stage: nearest-neighbor resize, vectorized per shape
    group (one fancy-index gather over the stacked (g, h, w, c) tensor
    per distinct input shape)."""

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        pixels_col = df["pixels"].to_numpy()
        out = np.empty(n, dtype=object)
        for (h, w, c), idxs in _shape_groups(df).items():
            A = np.stack([np.asarray(pixels_col[i], dtype=np.uint8)
                          for i in idxs]).reshape(len(idxs), h, w, c)
            yi = (np.arange(self.out_h) * h) // self.out_h
            xi = (np.arange(self.out_w) * w) // self.out_w
            R = A[:, yi][:, :, xi].reshape(len(idxs), -1)
            for j, i in enumerate(idxs):
                out[i] = R[j]
        return pd.DataFrame({
            "media_id": df["media_id"].to_numpy(),
            "pixels": out,
            "shape": [[self.out_h, self.out_w, 3]] * n,
        })


class ImageFeatures:
    """Actor-pool stage: pixel tensor -> small feature vector (channel
    means/stds + 8-bin luminance histogram), vectorized per shape group.

    The statistics are computed from EXACT integer sums (sum, sum of
    squares, integer r+g+b luminance bins) and then divided in one fixed
    float64 expression per feature, so a SQL oracle summing the same
    integers reproduces every value bit-for-bit:

        mean_c = (sum_c / n) / 255
        std_c  = sqrt(max(sumsq_c/n - (sum_c/n)^2, 0)) / 255
        hist_k = count[(r+g+b) // 96 == k] / n        (k = 0..7)

    ((r+g+b)//96 == floor(((r+g+b)/3)/32), the original 8-bin 0..256
    luminance histogram, exactly, for integer channel values.)

    ``as_columns=True`` emits the same values as float64 scalar columns
    (mean_r..std_b, h0..h7) instead of one float32 vector — the
    value-oracled layout."""

    FEATURE_COLS = ["mean_r", "mean_g", "mean_b", "std_r", "std_g",
                    "std_b"] + [f"h{k}" for k in range(8)]

    def __init__(self, as_columns: bool = False):
        self.as_columns = as_columns

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        pixels_col = df["pixels"].to_numpy()
        F = np.empty((n, 14), dtype=np.float64)
        for (h, w, c), idxs in _shape_groups(df).items():
            g = len(idxs)
            npix = h * w
            P = np.stack([np.asarray(pixels_col[i], dtype=np.int64)
                          for i in idxs]).reshape(g, npix, c)
            s = P.sum(axis=1)                      # (g, c) exact ints
            ss = (P * P).sum(axis=1)               # (g, c)
            m = s / npix
            var = np.maximum(ss / npix - m * m, 0.0)
            means = m / 255.0
            stds = np.sqrt(var) / 255.0
            bins = P.sum(axis=2) // (32 * c)       # integer luminance bin
            flat = (np.arange(g)[:, None] * 8 + bins).reshape(-1)
            hist = np.bincount(flat, minlength=g * 8).reshape(g, 8) / npix
            F[idxs] = np.concatenate([means, stds, hist], axis=1)
        if self.as_columns:
            out = pd.DataFrame({"media_id": df["media_id"].to_numpy()})
            for j, col in enumerate(self.FEATURE_COLS):
                out[col] = F[:, j]
            return out
        return pd.DataFrame({
            "media_id": df["media_id"].to_numpy(),
            "features": list(F.astype(np.float32)),
        })


AUDIO_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("mime", pa.string()),
    ("payload", pa.binary()),
    ("sample_rate", pa.int32()),
    ("n_samples", pa.int32()),
    ("channels", pa.int32()),
])


def make_audio_table(n: int = 32, seed: int = 11,
                     max_frames: int = 2000) -> pa.Table:
    """Deterministic audio rows whose payloads are REAL 16-bit PCM WAV
    bytes (ops/codec.py::encode_wav), so the strict decode path is the
    one exercised end to end."""
    from .codec import encode_wav

    rng = np.random.RandomState(seed)
    ids, mimes, payloads, rates, nsamp, chans = [], [], [], [], [], []
    for i in range(n):
        rate = [8000, 16000, 22050][i % 3]
        ch = 1 + (i % 2)
        frames = int(rng.randint(200, max_frames))
        samples = rng.randint(-32768, 32768, (frames, ch)).astype(np.int16)
        ids.append(f"a{i:05d}")
        mimes.append("audio/wav")
        payloads.append(encode_wav(samples, rate))
        rates.append(rate)
        nsamp.append(frames)
        chans.append(ch)
    return pa.table({
        "media_id": pa.array(ids), "mime": pa.array(mimes),
        "payload": pa.array(payloads, pa.binary()),
        "sample_rate": pa.array(rates, pa.int32()),
        "n_samples": pa.array(nsamp, pa.int32()),
        "channels": pa.array(chans, pa.int32()),
    })


def make_video_table(n: int = 8, seed: int = 13,
                     max_frames: int = 24) -> pa.Table:
    """Deterministic video rows whose payloads are REAL Y4M streams
    (ops/codec.py::encode_y4m), so the strict frame-sampling path is
    the one exercised end to end."""
    from .codec import encode_y4m

    rng = np.random.RandomState(seed)
    ids, mimes, payloads, ws, hs, nfs = [], [], [], [], [], []
    for i in range(n):
        w, h = [(16, 12), (8, 8), (24, 16)][i % 3]
        nf = int(rng.randint(3, max_frames + 1))
        frames = [rng.randint(0, 256, (h, w)).astype(np.uint8)
                  for _ in range(nf)]
        ids.append(f"v{i:05d}")
        mimes.append("video/x-y4m")
        payloads.append(encode_y4m(frames))
        ws.append(w)
        hs.append(h)
        nfs.append(nf)
    return pa.table({
        "media_id": pa.array(ids), "mime": pa.array(mimes),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "n_frames": pa.array(nfs, pa.int32()),
    })


def _fake_samples(payload: bytes, n_samples: int, channels: int) -> np.ndarray:
    """Deterministic stand-in for a real audio decode: payload-digest-
    seeded int16 (n_samples, channels) array."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[4:8], "little")
    rng = np.random.RandomState(seed)
    return rng.randint(-32768, 32768,
                       size=(n_samples, channels)).astype(np.int16)


class DecodeAudio:
    """Actor-pool stage: payload -> int16 sample tensor (flat list column
    + layout columns).

    Strict mode (``fake=False``) REALLY decodes integer-PCM WAV via the
    in-repo RIFF codec (ops/codec.py::decode_wav) and raises
    NotImplementedError for compressed mimes; ``fake=True`` substitutes
    the deterministic digest stand-in (any mime), honoring the sidecar
    ``n_samples``/``channels``/``sample_rate`` columns."""

    def __init__(self, fake: bool = False):
        from .codec import AUDIO_DECODERS

        self.fake = fake
        self.decoders = AUDIO_DECODERS

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        samples, nsamp, chans, rates = [], [], [], []
        for payload, mime, ns, ch, rate in zip(
                df["payload"], df["mime"], df["n_samples"], df["channels"],
                df["sample_rate"]):
            if self.fake:
                arr, r = _fake_samples(payload, int(ns), int(ch)), int(rate)
            else:
                dec = self.decoders.get(str(mime))
                if dec is None:
                    raise NotImplementedError(
                        f"no in-repo codec for mime {mime!r} (only "
                        f"{sorted(self.decoders)} decode without an audio "
                        "library); re-run with fake=True for the "
                        "deterministic stub")
                arr, r = dec(bytes(payload))
            samples.append(arr.reshape(-1))
            nsamp.append(arr.shape[0])
            chans.append(arr.shape[1])
            rates.append(r)
        return pd.DataFrame({
            "media_id": df["media_id"].to_numpy(),
            "samples": samples,
            "n_samples": pd.array(nsamp, dtype="int64"),
            "channels": pd.array(chans, dtype="int64"),
            "sample_rate": pd.array(rates, dtype="int64"),
        })


class AudioFeatures:
    """Actor-pool stage: sample tensor -> scalar audio features, fully
    vectorized across the RAGGED batch (one concatenate + reduceat per
    statistic — no per-row Python).

    Like ImageFeatures, every statistic is an EXACT integer sum/count
    divided in one fixed float64 expression, so a SQL oracle unnesting
    the same persisted samples reproduces each value bit-for-bit:

        duration_sec   = n_samples / sample_rate
        mean_amp       = (sum(s)  / n_el) / 32768     (n_el = n*channels)
        rms            = sqrt(sum(s^2) / n_el) / 32768
        peak           = max(|s|) / 32768
        zero_crossings = #{i : sign(ch0[i]) != sign(ch0[i-1])}   (s>=0)
    """

    FEATURE_COLS = ["n_samples", "channels", "sample_rate", "duration_sec",
                    "mean_amp", "rms", "peak", "zero_crossings"]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            out = pd.DataFrame({"media_id": pd.Series([], dtype=object)})
            for c in self.FEATURE_COLS:
                out[c] = pd.Series([], dtype="float64")
            return out
        rows = [np.asarray(s, dtype=np.int64) for s in df["samples"]]
        lens = np.array([len(r) for r in rows], dtype=np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
        cat = np.concatenate(rows)
        ssum = np.add.reduceat(cat, offs)
        ssq = np.add.reduceat(cat * cat, offs)
        peak = np.maximum.reduceat(np.abs(cat), offs)
        ch = df["channels"].to_numpy(dtype=np.int64)
        rate = df["sample_rate"].to_numpy(dtype=np.int64)
        frames = df["n_samples"].to_numpy(dtype=np.int64)
        # channel-0 zero crossings, row-boundary-masked
        row_id = np.repeat(np.arange(n), lens)
        pos = np.arange(len(cat)) - np.repeat(offs, lens)
        ch0 = pos % np.repeat(ch, lens) == 0
        nn = (cat >= 0)[ch0]
        zrow = row_id[ch0]
        flip = (nn[1:] != nn[:-1]) & (zrow[1:] == zrow[:-1])
        zc = np.bincount(zrow[1:][flip], minlength=n)
        return pd.DataFrame({
            "media_id": df["media_id"].to_numpy(),
            "n_samples": frames,
            "channels": ch,
            "sample_rate": rate,
            "duration_sec": frames / rate,
            "mean_amp": ssum / lens / 32768.0,
            "rms": np.sqrt(ssq / lens) / 32768.0,
            "peak": peak / 32768.0,
            "zero_crossings": zc.astype(np.int64),
        })


class AudioFrameEnergy:
    """Actor-pool stage: channel-0 samples -> fixed-size frame RMS rows
    (media_id, frame_idx, frame_rms) — the windowed energy contour a
    VAD / silence-trim stage works from.  The tail shorter than
    ``frame`` is dropped (every emitted frame has exactly ``frame``
    samples).

    Integer-exact like the other feature stages: per-frame sum of
    squares is an exact int64, divided once in float64 —
    ``rms = sqrt(sumsq / frame) / 32768`` — so the SQL oracle grouping
    the same persisted samples by ``(i // channels) // frame``
    reproduces every value bit-for-bit."""

    def __init__(self, frame: int = 256):
        self.frame = frame

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids_out, idx_out, rms_out = [], [], []
        for mid, s, ch in zip(df["media_id"], df["samples"], df["channels"]):
            c0 = np.asarray(s, dtype=np.int64)[::int(ch)]
            nf = len(c0) // self.frame
            if nf == 0:
                continue
            F = c0[: nf * self.frame].reshape(nf, self.frame)
            rms = np.sqrt((F * F).sum(axis=1) / self.frame) / 32768.0
            ids_out.append(np.repeat(mid, nf))
            idx_out.append(np.arange(nf, dtype=np.int64))
            rms_out.append(rms)
        if not ids_out:
            return pd.DataFrame({
                "media_id": pd.Series([], dtype=object),
                "frame_idx": pd.Series([], dtype="int64"),
                "frame_rms": pd.Series([], dtype="float64"),
            })
        return pd.DataFrame({
            "media_id": np.concatenate(ids_out),
            "frame_idx": np.concatenate(idx_out),
            "frame_rms": np.concatenate(rms_out),
        })


def audio_frame_energy(ds, frame: int = 256, batch_size: int = 64,
                       concurrency=(1, 4)):
    return ds.map_batches(AudioFrameEnergy, fn_constructor_args=(frame,),
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency)


class SampleFrames:
    """Actor-pool stage: video payload -> k evenly spaced frame indices
    ((arange(k) * n_frames) // k) with per-frame decode.

    Strict mode (``fake=False``) REALLY decodes Y4M/YUV4MPEG2 via the
    in-repo codec (ops/codec.py::decode_y4m_frames): the container's
    fixed frame size means sampled frames are read at COMPUTED OFFSETS
    — the k sampled frames are the only bytes touched, which is the
    whole point of frame sampling at 100 TB.  Compressed containers
    (MP4 etc.) still raise; ``fake=True`` substitutes the
    deterministic payload-digest stand-in using the metadata columns."""

    def __init__(self, k: int = 4, fake: bool = False):
        self.k = k
        self.fake = fake

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from .codec import decode_y4m_frames, y4m_info

        rows_id, rows_frame, rows_pixels = [], [], []
        mimes = df["mime"] if "mime" in df.columns else [None] * len(df)
        for row, mime in zip(df.itertuples(index=False), mimes):
            payload = bytes(row.payload)
            if self.fake:
                nf = max(int(row.n_frames), 1)
                k = min(self.k, nf)
                idxs = (np.arange(k) * nf) // k
                frames = [
                    _fake_pixels(payload + bytes([int(fi) % 256]),
                                 int(row.width), int(row.height))
                    for fi in idxs]
            elif str(mime) in ("video/x-y4m", "video/yuv4mpeg"):
                nf = y4m_info(payload)[2]
                if nf == 0:
                    # a valid zero-frame stream samples nothing —
                    # clamping to 1 would ask the codec for frame 0
                    # of an empty payload and raise
                    continue
                k = min(self.k, nf)
                idxs = (np.arange(k) * nf) // k
                frames = decode_y4m_frames(payload, idxs)
            else:
                raise NotImplementedError(
                    f"no in-repo video codec for mime {mime!r} (only "
                    "Y4M decodes without a video library); re-run with "
                    "fake=True for the deterministic stub")
            for fi, arr in zip(idxs, frames):
                rows_id.append(row.media_id)
                rows_frame.append(int(fi))
                rows_pixels.append(arr.reshape(-1))
        return pd.DataFrame({
            "media_id": rows_id,
            "frame_idx": rows_frame,
            "pixels": rows_pixels,
        })


def frame_motion(frames, cfg=None):
    """SampleFrames output (media_id, frame_idx, pixels) -> per-frame
    motion signal (media_id, frame_idx, mean_abs_diff) against the
    PREVIOUS sampled frame of the same video — the scene-change /
    static-clip filter signal.  Each video's first sampled frame emits
    nothing.  mean_abs_diff = integer |a-b| sum / n_pixels (exact int64
    sum, one float64 division), rounded half-away at 6.

    ONE keyed shuffle on media_id (a video's sampled frames are k tiny
    rows), then a per-block ordered pairwise diff."""
    from .relational import _keyed, _meta_rows
    from ..config import DEFAULT_CONFIG
    from ..util import round_half_away

    cfg = cfg or DEFAULT_CONFIG

    def diff(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "media_id": pd.Series([], dtype=df["media_id"].dtype
                                  if len(df) else "string"),
            "frame_idx": pd.Series([], dtype="int64"),
            "mean_abs_diff": pd.Series([], dtype="float64"),
        })
        if len(df) < 2:
            return empty
        s = df.sort_values(["media_id", "frame_idx"],
                           kind="stable").reset_index(drop=True)
        px = [np.asarray(p, dtype=np.int64) for p in s["pixels"]]
        mids = s["media_id"].to_numpy()
        out_id, out_fi, out_mad = [], [], []
        for i in range(1, len(px)):
            if mids[i] != mids[i - 1]:
                continue
            d = np.abs(px[i] - px[i - 1])
            out_id.append(mids[i])
            out_fi.append(int(s["frame_idx"].iloc[i]))
            out_mad.append(float(round_half_away(
                int(d.sum()) / d.size, 6)))
        if not out_id:
            return empty
        return pd.DataFrame({
            "media_id": out_id,
            "frame_idx": pd.array(out_fi, dtype="int64"),
            "mean_abs_diff": pd.array(out_mad, dtype="float64"),
        })

    return _keyed(frames, ["media_id"], cfg,
                  _meta_rows(frames)).map_batches(
        diff, batch_format="pandas", batch_size=None)


def decode_images(ds, fake: bool = False, batch_size: int = 16,
                  concurrency=(1, 4)):
    """media Dataset -> decoded pixels Dataset (actor pool; small batches
    because payload rows are large)."""
    return ds.map_batches(DecodeImage, fn_constructor_args=(fake,),
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency)


def resize_images(ds, out_w: int = 32, out_h: int = 32,
                  batch_size: int = 32, concurrency=(1, 4)):
    return ds.map_batches(ResizeImage, fn_constructor_args=(out_w, out_h),
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency)


def image_features(ds, batch_size: int = 64, concurrency=(1, 4),
                   as_columns: bool = False):
    return ds.map_batches(ImageFeatures, fn_constructor_args=(as_columns,),
                          batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)


def decode_audio(ds, fake: bool = False, batch_size: int = 16,
                 concurrency=(1, 4)):
    """audio Dataset -> decoded samples Dataset (actor pool; small
    batches because payload rows are large)."""
    return ds.map_batches(DecodeAudio, fn_constructor_args=(fake,),
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency)


def audio_features(ds, batch_size: int = 64, concurrency=(1, 4)):
    return ds.map_batches(AudioFeatures, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)


def sample_frames(ds, k: int = 4, fake: bool = False, batch_size: int = 8,
                  concurrency=(1, 4)):
    return ds.map_batches(SampleFrames, fn_constructor_args=(k, fake),
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency)


def make_mp4_table(n: int = 8, seed: int = 19, max_samples: int = 24,
                   with_truth: bool = False):
    """Deterministic MP4 rows whose payloads are REAL ISO BMFF
    containers (ops/codec.py::encode_mp4) around digest-deterministic
    encoded-sample stand-ins — the container parse / sample extraction
    path is exercised end to end on real box layouts (multi-chunk
    stsc/stco, stts runs); only the H.264 bitstream inside each sample
    is synthetic.  ``with_truth=True`` also returns a per-sample truth
    frame (media_id, sample_idx, pts, n_bytes, byte_sum, codec,
    timescale) computed from the GENERATOR's samples — fully
    independent of the parser, so an oracle joined against it verifies
    the container parse end to end."""
    from .codec import encode_mp4

    rng = np.random.RandomState(seed)
    ids, mimes, payloads, ws, hs, nfs = [], [], [], [], [], []
    truth: list[dict] = []
    for i in range(n):
        w, h = [(64, 48), (32, 24), (128, 96)][i % 3]
        ns = int(rng.randint(3, max_samples + 1))
        samples = [rng.bytes(int(rng.randint(16, 400))) for _ in range(ns)]
        durs = [int(rng.randint(40, 120)) for _ in range(ns)]
        ids.append(f"mp4{i:05d}")
        mimes.append("video/mp4")
        payloads.append(encode_mp4(samples, timescale=600, durations=durs,
                                   width=w, height=h,
                                   n_chunks=1 + i % 3))
        ws.append(w)
        hs.append(h)
        nfs.append(ns)
        if with_truth:
            pts = 0
            for si, (s, d) in enumerate(zip(samples, durs)):
                truth.append({
                    "media_id": ids[-1], "sample_idx": si, "pts": pts,
                    "n_bytes": len(s),
                    "byte_sum": int(np.frombuffer(s, np.uint8)
                                    .sum(dtype=np.int64)),
                    "codec": "avc1", "timescale": 600,
                })
                pts += d
    table = pa.table({
        "media_id": pa.array(ids), "mime": pa.array(mimes),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "n_frames": pa.array(nfs, pa.int32()),
    })
    if with_truth:
        return table, pd.DataFrame(truth)
    return table


class ExtractVideoSamples:
    """Actor-pool stage: compressed-video payload -> the k evenly
    spaced SAMPLES' encoded bytes + timing ((arange(k) * n) // k, the
    same sampling arithmetic as SampleFrames).

    This is the container half of compressed-video frame sampling: the
    ISO BMFF sample table (ops/codec.py::mp4_sample_table) gives each
    sample's byte range, so only the k sampled frames' bytes are
    sliced out of mdat — at 100 TB the payload column would be lazy
    (parquet binary or object-store refs) and these slices are the
    only video bytes that move.  Decoding the H.264/H.265 bitstream
    inside a sample genuinely needs a video library and stays out of
    scope; downstream stages get (codec, pts, timescale, sample) and
    can route to a real decoder where one exists.  ``fake=True``
    substitutes digest-deterministic sample bytes from the metadata
    columns, keeping schema and sampling arithmetic identical."""

    def __init__(self, k: int = 4, fake: bool = False):
        from .codec import mp4_extract_samples, mp4_sample_table

        self.k = k
        self.fake = fake
        self._table = mp4_sample_table
        self._extract = mp4_extract_samples

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_id, out_idx, out_pts, out_ts, out_codec, out_bytes = \
            [], [], [], [], [], []
        mimes = df["mime"] if "mime" in df.columns else [None] * len(df)
        for row, mime in zip(df.itertuples(index=False), mimes):
            payload = bytes(row.payload)
            if self.fake:
                nf = max(int(row.n_frames), 1)
                k = min(self.k, nf)
                idxs = (np.arange(k) * nf) // k
                samples = [
                    hashlib.sha256(payload
                                   + bytes([int(fi) % 256])).digest()
                    for fi in idxs]
                pts, ts, codec = [int(fi) * 100 for fi in idxs], 600, "fake"
            elif str(mime) in ("video/mp4", "video/quicktime"):
                t = self._table(payload)
                nf = t["n_samples"]
                if nf == 0:
                    continue
                k = min(self.k, nf)
                idxs = (np.arange(k) * nf) // k
                samples = self._extract(payload, idxs, t)
                pts = [int(t["pts"][i]) for i in idxs]
                ts, codec = t["timescale"], t["codec"]
            else:
                raise NotImplementedError(
                    f"no in-repo container parser for mime {mime!r} "
                    "(MP4/MOV parse without a video library; Y4M goes "
                    "through SampleFrames); re-run with fake=True for "
                    "the deterministic stub")
            for fi, pt, s in zip(idxs, pts, samples):
                out_id.append(row.media_id)
                out_idx.append(int(fi))
                out_pts.append(pt)
                out_ts.append(int(ts))
                out_codec.append(codec)
                out_bytes.append(s)
        return pd.DataFrame({
            "media_id": out_id,
            "frame_idx": pd.array(out_idx, dtype="int64"),
            "pts": pd.array(out_pts, dtype="int64"),
            "timescale": pd.array(out_ts, dtype="int64"),
            "codec": pd.array(out_codec, dtype="object"),
            "sample": pd.array(out_bytes, dtype="object"),
        })


def extract_video_samples(ds, k: int = 4, fake: bool = False,
                          batch_size: int = 8, concurrency=(1, 4)):
    return ds.map_batches(ExtractVideoSamples, fn_constructor_args=(k, fake),
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency)


class AHashBits:
    """Actor-pool stage: 8x8 average-hash bits from a decoded RGB
    tensor — the classic image near-duplicate signature, INTEGER end
    to end so a SQL oracle can replay it from the persisted decode:

        resize 8x8 nearest (the ResizeImage floor-index arithmetic)
        gray  = (299 r + 587 g + 114 b) // 1000        (BT.601, integer)
        bit_i = [64 * gray_i > sum(gray)]               (no division)

    Long form (media_id, bit_idx, bit): 64 rows per image, the
    Hamming-joinable form (two images are near-dups when their bit
    vectors differ in <= k positions — a groupby over an equi-join of
    this table with itself)."""

    def __init__(self, side: int = 8):
        self.side = side
        self._resize = ResizeImage(out_w=side, out_h=side)

    def _bits(self, df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        """(media ids, (n, side*side) 0/1 bit matrix)."""
        small = self._resize(df)
        s = self.side
        P = np.stack([np.asarray(p, dtype=np.int64)
                      for p in small["pixels"].to_numpy()]) \
            .reshape(len(df), s * s, 3)
        gray = (P[:, :, 0] * 299 + P[:, :, 1] * 587
                + P[:, :, 2] * 114) // 1000
        total = gray.sum(axis=1)
        bits = (s * s * gray > total[:, None]).astype(np.int64)
        return small["media_id"].to_numpy(), bits

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            z = np.empty(0, dtype=np.int64)
            return pd.DataFrame({"media_id": df.get(
                "media_id", pd.Series(dtype=object)),
                "bit_idx": z, "bit": z})
        ids, bits = self._bits(df)
        s, n = self.side, len(df)
        return pd.DataFrame({
            "media_id": np.repeat(ids, s * s),
            "bit_idx": np.tile(np.arange(s * s, dtype=np.int64), n),
            "bit": bits.ravel(),
        })


class AHashPack(AHashBits):
    """Average hash packed to ONE uint64 per image (bit i at position
    i), the signature form ops/dedup.hash64_dup_pairs bands on."""

    def __init__(self, side: int = 8):
        if side * side != 64:
            raise ValueError("packed ahash requires side*side == 64")
        super().__init__(side)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "doc": df.get("media_id", pd.Series(dtype=object)),
                "sim": np.empty(0, dtype=np.uint64)})
        ids, bits = self._bits(df)
        w = np.uint64(1) << np.arange(64, dtype=np.uint64)
        sim = (bits.astype(np.uint64) * w).sum(axis=1).astype(np.uint64)
        return pd.DataFrame({"doc": ids.astype(str), "sim": sim})


def image_ahash_bits(decoded, side: int = 8, batch_size: int = 64,
                     concurrency=(1, 4)):
    """Average-hash bit vectors over a decoded-image dataset (see
    AHashBits)."""
    from ..util import stateful_map

    return stateful_map(decoded, AHashBits, (side,),
                        batch_format="pandas", batch_size=batch_size)


def image_ahash_dup_pairs(decoded, max_hamming: int = 6,
                          batch_size: int = 64, cfg=None):
    """Near-duplicate IMAGE pairs by average-hash Hamming distance:
    pack each decoded image to one uint64 ahash (AHashPack), then run
    the shared 64-bit signature path (ops/dedup.hash64_dup_pairs —
    lossless pigeonhole banding + skew-safe pair generation + gated
    broadcast-or-join exact-popcount verify).  The multimodal/dedup
    crossover: candidate volume scales with band-bucket sizes, never
    image pairs, and pixels stay behind the one-u64-per-image
    signature — nothing heavier than 8 bytes/image ever shuffles."""
    from ..config import DEFAULT_CONFIG
    from ..util import stateful_map
    from .dedup import hash64_dup_pairs

    cfg = cfg or DEFAULT_CONFIG
    sig = stateful_map(decoded, AHashPack, (8,),
                       batch_format="pandas",
                       batch_size=batch_size).materialize()
    return hash64_dup_pairs(sig, max_hamming=max_hamming, cfg=cfg,
                            key_type="ahash")
