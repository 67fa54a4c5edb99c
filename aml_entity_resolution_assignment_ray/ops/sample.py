"""Deterministic sampling / split operators.

Training pipelines need splits that are (a) reproducible across runs
and cluster sizes — no RNG state, no row order dependence — and (b)
derivable per row so they survive any repartitioning.  Both operators
assign each row a bucket from a pure function of its id:

* integer ids — Knuth multiplicative hash ``(id * 2654435761) mod 2^32``
  (exact in SQL BIGINT arithmetic, so every split is value-checkable
  in DuckDB);
* string ids — the whole-string polynomial hash the MinHash kernels use
  (functions/minhash.py shingle polynomial, already reproduced in the
  oracle SQL).

The reference's training split is a driver-side crc32 bucket over the
pair key (train_model.py:70-75 semantics; pipelines/train.py) — these
are the distributed, dataset-level analogues.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(0xFFFFFFFF)
_POLY_P = np.uint64(1_000_003)


def _bucket_ints(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    h = (ids.astype(np.uint64) * _KNUTH) & _M32
    return (h % np.uint64(n_buckets)).astype(np.int64)


def _bucket_strs(ids, n_buckets: int) -> np.ndarray:
    out = np.zeros(len(ids), dtype=np.uint64)
    # whole-string polynomial hash, vectorized over the padded char matrix
    texts = ["" if s is None else str(s) for s in ids]
    lens = np.fromiter((len(t) for t in texts), count=len(texts),
                       dtype=np.int64)
    lmax = int(lens.max()) if len(texts) else 0
    if lmax:
        flat = np.frombuffer("".join(texts).encode("utf-32-le"),
                             dtype=np.uint32)
        mat = np.zeros((len(texts), lmax), dtype=np.uint64)
        mask = np.arange(lmax)[None, :] < lens[:, None]
        mat[mask] = flat
        for c in range(lmax):
            active = c < lens
            out = np.where(active, (out * _POLY_P + mat[:, c]) & _M32, out)
    return (out % np.uint64(n_buckets)).astype(np.int64)


def hash_bucket(ds, id_col: str, n_buckets: int = 100,
                out_col: str = "bucket"):
    """Append a deterministic ``[0, n_buckets)`` bucket column derived
    from ``id_col`` — stateless vectorized map, no shuffle.

    The int-vs-string path is decided PER ELEMENT, never per batch, so
    bucket assignment is a pure function of the value and cannot depend
    on Ray block boundaries: integer values (numpy ints, Python ints in
    object / nullable-Int64 columns, floats holding an integral value)
    are normalized to int64 and take the Knuth path; everything else —
    strings (including all-digit strings like ``'123'``), true floats,
    nulls — takes the string-polynomial path, matching a DuckDB
    VARCHAR-hash oracle.  Ids are assumed NON-NEGATIVE: negative ids
    wrap through uint64 here but DuckDB's signed ``%`` does not, so the
    doc_hash_split oracle parity only holds for ids >= 0."""

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        s = df[id_col]
        vals = s.to_numpy()
        if np.issubdtype(vals.dtype, np.integer):
            out[out_col] = _bucket_ints(vals, n_buckets)
            return out
        if np.issubdtype(vals.dtype, np.floating):
            # per-element: integral floats -> int path, the rest
            # (true fractions, nan/inf) -> string path
            integral = np.isfinite(vals) & (np.floor(vals) == vals)
        else:
            # object / extension arrays: only genuine Python/numpy ints
            # take the int path — numeric STRINGS must not (their bucket
            # would otherwise depend on whether a batchmate forced the
            # string path)
            integral = np.fromiter(
                (isinstance(v, (int, np.integer))
                 and not isinstance(v, (bool, np.bool_)) for v in vals),
                count=len(vals), dtype=bool)
        b = np.empty(len(vals), dtype=np.int64)
        if integral.any():
            picked = vals[integral]
            ints = (picked.astype(np.int64)
                    if np.issubdtype(vals.dtype, np.floating)
                    else np.asarray([int(v) for v in picked],
                                    dtype=np.int64))
            b[integral] = _bucket_ints(ints, n_buckets)
        rest = ~integral
        if rest.any():
            b[rest] = _bucket_strs(list(vals[rest]), n_buckets)
        out[out_col] = b
        return out

    return ds.map_batches(tag, batch_format="pandas")


def hash_split(ds, id_col: str, test_pct: int = 20,
               out_col: str = "split"):
    """Append a deterministic 'train'/'test' split column: buckets
    ``[0, test_pct)`` of 100 are test (the reference's 80/20 semantics,
    train_model.py:70-75, as a distributed per-row function)."""
    tagged = hash_bucket(ds, id_col, n_buckets=100, out_col="_b")

    def lab(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out[out_col] = np.where(df["_b"].to_numpy() < test_pct,
                                "test", "train")
        return out.drop(columns=["_b"])

    return tagged.map_batches(lab, batch_format="pandas")
