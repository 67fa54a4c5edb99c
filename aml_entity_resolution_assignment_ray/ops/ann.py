"""Approximate-nearest-neighbor search over an embedding column.

* brute_force_topk — exact cosine top-k: each map_batches task computes
  a numpy matmul of its batch against the BROADCAST query matrix
  (``ray.put`` once, fetched once per actor) and emits only its local
  top-k candidates; the driver merges #blocks x k rows.  This is the
  baseline and the oracle for the approximate variants.
* ivf_topk — IVF-style scale path: k-means centroids (seeded, fit on a
  driver-side sample), every vector assigned to its nearest centroid
  inside ``map_batches``; a query probes only the ``nprobe`` nearest
  cells.  At cluster scale the assignment is a partition key — probing
  reads a small fraction of the data.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd

import ray


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


class _BlockTopK:
    """Per-batch exact cosine: batch x queries matmul, local top-k."""

    def __init__(self, queries_ref, k, vec_col, id_col):
        self.Q = _normalize(np.asarray(ray.get(queries_ref), dtype=np.float64))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        V = _normalize(np.stack(df[self.vec_col].to_numpy()).astype(np.float64))
        ids = df[self.id_col].to_numpy()
        S = V @ self.Q.T                      # (batch, n_queries)
        k = min(self.k, len(df))
        out_id, out_q, out_cos = [], [], []
        for qi in range(S.shape[1]):
            part = np.argpartition(-S[:, qi], k - 1)[:k]
            out_id.append(ids[part])
            out_q.append(np.full(k, qi, dtype=np.int64))
            out_cos.append(S[part, qi])
        return pd.DataFrame({
            "query_idx": np.concatenate(out_q),
            self.id_col: np.concatenate(out_id),
            "cosine": np.concatenate(out_cos),
        })


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     batch_size: int = 4096) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns a DataFrame
    (query_idx, id_col, cosine) sorted by (query_idx, -cosine, id)."""
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qref = ray.put(queries)
    from ..util import stateful_map

    cand = stateful_map(
        ds, _BlockTopK, (qref, k, vec_col, id_col),
        batch_format="pandas", batch_size=batch_size,
    ).to_pandas()          # #blocks x k x n_queries rows — driver-small
    cand = cand.sort_values(
        ["query_idx", "cosine", id_col], ascending=[True, False, True],
        kind="stable")
    return cand.groupby("query_idx", sort=True).head(k).reset_index(drop=True)


# ---- IVF ----

def _kmeans(X: np.ndarray, ncells: int, iters: int = 15,
            seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(ncells, len(X)), replace=False)].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(C)):
            pts = X[assign == c]
            if len(pts):
                C[c] = pts.mean(axis=0)
    return C


class IVFIndex:
    """IVF state: centroids + per-cell storage as a Dataset with a
    ``_cell`` column (the partition key a multi-node layout shards by)."""

    def __init__(self, centroids: np.ndarray, assigned_ds, vec_col, id_col):
        self.centroids = centroids
        self.ds = assigned_ds
        self.vec_col = vec_col
        self.id_col = id_col

    def search(self, queries: np.ndarray, k: int = 10,
               nprobe: int = 4) -> pd.DataFrame:
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
        Qn = _normalize(queries)
        Cn = _normalize(self.centroids)
        order = np.argsort(-(Qn @ Cn.T), axis=1)[:, :nprobe]  # cells per query
        cells = sorted({int(c) for row in order for c in row})
        sub = self.ds.filter(
            expr=f"_cell in {cells}" if len(cells) > 1 else f"_cell == {cells[0]}")
        res = brute_force_topk(sub, queries, k=k, vec_col=self.vec_col,
                               id_col=self.id_col)
        return res


def build_ivf(ds, ncells: int = 16, vec_col: str = "embedding",
              id_col: str = "vec_id", sample_size: int = 10_000,
              seed: int = 11) -> IVFIndex:
    """Fit centroids on a sample, assign every vector to a cell."""
    n = ds.count()
    if n > sample_size:
        # seeded random_sample: unbiased across the whole dataset (limit()
        # would only ever see the first blocks)
        frac = min(1.0, (sample_size * 1.25) / n)
        sample = ds.random_sample(frac, seed=seed).limit(sample_size).to_pandas()
    else:
        sample = ds.to_pandas()
    X = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    C = _kmeans(X, ncells, seed=seed)
    cref = ray.put(C)

    class Assign:
        def __init__(self, r):
            self.C = _normalize(ray.get(r))

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            V = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
            out = df.copy()
            out["_cell"] = (V @ self.C.T).argmax(axis=1).astype(np.int64)
            return out

    from ..util import stateful_map

    assigned = stateful_map(ds, Assign, (cref,),
                            batch_format="pandas").materialize()
    return IVFIndex(C, assigned, vec_col, id_col)
