"""Approximate-nearest-neighbor search over an embedding column.

* brute_force_topk — exact cosine top-k: each map_batches task computes
  a numpy matmul of its batch against the BROADCAST query matrix
  (``ray.put`` once, fetched once per actor) and emits only its local
  top-k candidates; the driver merges #blocks x k rows.  This is the
  baseline and the oracle for the approximate variants.
* build_ivf / IVFIndex — IVF scale path: k-means centroids (seeded,
  fit on a driver-side sample), every vector assigned to its nearest
  centroid inside ``map_batches``, and the assignment PERSISTED as
  cell-partitioned Parquet (``partition_cols=["_cell"]``).  A query
  probes only the ``nprobe`` nearest cells by reading ONLY those cell
  directories — physical partition pruning, so at 100 TB a probe
  touches nprobe/ncells of the bytes, not a filter over everything.
  The index directory layout::

      <index_path>/centroids.parquet        (cell, centroid list<double>)
      <index_path>/cells/_cell=<i>/*.parquet (id_col, vec_col)

  and ``IVFIndex.load(path)`` reopens a previously built index (the
  checkpoint-or-recompute story: the build is the expensive shuffle,
  the search is cheap and repeatable).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd

import ray


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def _maybe_get(x):
    """ray.get for ObjectRefs, identity for raw values — lets the same
    kernel class serve the distributed actor pool (broadcast refs) and
    the in-process small-probe fast path (plain arrays)."""
    return ray.get(x) if isinstance(x, ray.ObjectRef) else x


def _merge_topk(cand: pd.DataFrame, k: int, id_col: str,
                masked: bool) -> pd.DataFrame:
    """Shared final merge: drop masked sentinels, deterministic
    (query, -cosine, id) order, top k per query — identical whether the
    candidates came from one in-process scan or #blocks map tasks."""
    if masked:
        cand = cand[cand["cosine"] > _BlockTopK._MASKED + 0.5]
    cand = cand.sort_values(
        ["query_idx", "cosine", id_col], ascending=[True, False, True],
        kind="stable")
    return cand.groupby("query_idx", sort=True).head(k).reset_index(drop=True)


class _BlockTopK:
    """Per-batch exact cosine: batch x queries matmul, local top-k.

    ``mask_ref`` (optional) is a broadcast (ncells, n_queries) bool
    matrix + the centroid matrix: each row's cell is recomputed from the
    centroids (one small extra matmul) and scores for (row, query) pairs
    the query did NOT probe are masked out — per-query IVF semantics
    over a single shared scan of the probed-cell union."""

    _MASKED = -2.0  # below any cosine; filtered after the driver merge

    def __init__(self, queries_ref, k, vec_col, id_col, mask_ref=None):
        self.Q = _normalize(np.asarray(_maybe_get(queries_ref),
                                       dtype=np.float64))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        if mask_ref is None:
            self.mask = self.C = None
        else:
            self.mask, C = _maybe_get(mask_ref)
            self.C = _normalize(np.asarray(C, dtype=np.float64))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        V = _normalize(np.stack(df[self.vec_col].to_numpy()).astype(np.float64))
        ids = df[self.id_col].to_numpy()
        S = V @ self.Q.T                      # (batch, n_queries)
        if self.mask is not None:
            cell = (V @ self.C.T).argmax(axis=1)
            S = np.where(self.mask[cell], S, self._MASKED)
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
                     batch_size: int = 4096, _mask_ref=None) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns a DataFrame
    (query_idx, id_col, cosine) sorted by (query_idx, -cosine, id)."""
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qref = ray.put(queries)
    from ..util import stateful_map

    cand = stateful_map(
        ds, _BlockTopK, (qref, k, vec_col, id_col, _mask_ref),
        batch_format="pandas", batch_size=batch_size,
    ).to_pandas()          # #blocks x k x n_queries rows — driver-small
    return _merge_topk(cand, k, id_col, masked=_mask_ref is not None)


# ---- IVF ----

def _kmeans(X: np.ndarray, ncells: int, iters: int = 15,
            seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(ncells, len(X)), replace=False)].copy()
    for _ in range(iters):
        # argmin ||x-c||^2 == argmin (||c||^2 - 2 x·c): matmul distances,
        # no (n, k, d) broadcast temporary
        assign = ((C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)).argmin(axis=1)
        for c in range(len(C)):
            pts = X[assign == c]
            if len(pts):
                C[c] = pts.mean(axis=0)
    return C


class IVFIndex:
    """IVF state: centroids + cell-partitioned Parquet storage.  ``_cell``
    is a PHYSICAL partition key (hive directories), so ``search`` reads
    only the probed cells' files — the pruning a multi-node layout
    shards by, not a filter over the full dataset."""

    def __init__(self, centroids: np.ndarray, index_path: str,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self.path = index_path
        self.vec_col = vec_col
        self.id_col = id_col

    @classmethod
    def load(cls, index_path: str, vec_col: str = "embedding",
             id_col: str = "vec_id") -> "IVFIndex":
        """Reopen a persisted index (checkpoint-or-recompute: the build
        shuffle is the expensive part; search rereads only metadata)."""
        import pyarrow.parquet as pq

        cent_path = os.path.join(index_path, "centroids.parquet")
        if not os.path.exists(cent_path):
            raise FileNotFoundError(
                f"IVF index at {index_path!r} is missing centroids.parquet "
                "— not an index directory (wrong/stale path, or build_ivf "
                "never completed there)")
        t = pq.read_table(cent_path)
        cent = np.stack([np.asarray(c, dtype=np.float64)
                         for c in t.sort_by("cell")["centroid"].to_pylist()])
        return cls(cent, index_path, vec_col=vec_col, id_col=id_col)

    def probe_matrix(self, queries: np.ndarray, nprobe: int = 4) -> np.ndarray:
        """(n_queries, nprobe) nearest cells PER QUERY, ties broken by
        ascending cell id — deterministic, so the DuckDB oracle can
        replay the probe from centroids.parquet."""
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
        Qn = _normalize(queries)
        Cn = _normalize(self.centroids)
        S = Qn @ Cn.T
        # one vectorized stable argsort for the whole query batch: ties
        # on -cosine keep original (ascending cell-id) order, matching
        # the per-query lexsort((cell, -cos)) the oracle replays
        return np.argsort(-S, axis=1, kind="stable")[:, :nprobe]

    def probe_cells(self, queries: np.ndarray, nprobe: int = 4) -> list[int]:
        """Union of the per-query probed cells (the file set one shared
        scan touches)."""
        return sorted(int(c)
                      for c in np.unique(self.probe_matrix(queries, nprobe)))

    def search(self, queries: np.ndarray, k: int = 10,
               nprobe: int = 4) -> pd.DataFrame:
        """Multi-query batched IVF search with per-query semantics: the
        probed-cell UNION is scanned once (each cell file read once no
        matter how many queries probe it), but every query is scored
        only against its OWN nprobe cells — batched search returns
        exactly what each query searched alone would (pinned by
        tests/test_ops.py::test_ivf_multi_query_batching)."""
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
        pm = self.probe_matrix(queries, nprobe=nprobe)
        cells = sorted(int(c) for c in np.unique(pm))
        import ray.data as rd

        cells_root = os.path.join(self.path, "cells")
        if not os.path.isdir(cells_root):
            raise FileNotFoundError(
                f"IVF index at {self.path!r} has no cells/ directory — "
                "wrong/stale index path, or build_ivf never wrote it")
        # physical pruning: list ONLY the probed cells' files.  A k-means
        # cell with zero assigned vectors has no _cell=<i> directory —
        # skipping it is correct (nothing to scan there).
        import glob

        paths = [f for c in cells for f in sorted(glob.glob(
            os.path.join(cells_root, f"_cell={c}", "*.parquet")))]
        if not paths:
            # every probed cell was empty: a valid (if useless) probe —
            # return an empty top-k frame rather than crash read_parquet
            return pd.DataFrame({
                "query_idx": pd.Series([], dtype=np.int64),
                self.id_col: pd.Series([], dtype=object),
                "cosine": pd.Series([], dtype=np.float64),
            })
        # (ncells, n_queries) allow-mask; a worker recomputes each row's
        # cell from the (broadcast) centroids — no _cell column needed
        mask = np.zeros((len(self.centroids), len(queries)), dtype=bool)
        for qi in range(len(queries)):
            mask[pm[qi], qi] = True
        from ..config import DEFAULT_CONFIG

        local_cap = DEFAULT_CONFIG.ivf_local_search_max_bytes
        if 0 < local_cap and sum(os.path.getsize(p)
                                 for p in paths) <= local_cap:
            # small-probe fast path: the probed cells fit comfortably in
            # the driver — run the SAME kernel (_BlockTopK) and the SAME
            # merge in-process, skipping ~1s+ of per-stage Ray Dataset
            # setup.  Bit-identical to the distributed path (pinned by
            # tests/test_ops.py::test_ivf_local_fast_path_matches).
            import pyarrow as pa
            import pyarrow.parquet as pq

            tbl = pa.concat_tables([
                pq.read_table(p, columns=[self.id_col, self.vec_col])
                for p in paths])
            df = tbl.to_pandas()
            if not len(df):      # probed cells' files were all empty
                return pd.DataFrame({
                    "query_idx": pd.Series([], dtype=np.int64),
                    self.id_col: pd.Series([], dtype=object),
                    "cosine": pd.Series([], dtype=np.float64),
                })
            kern = _BlockTopK(queries, k, self.vec_col, self.id_col,
                              (mask, self.centroids))
            return _merge_topk(kern(df), k, self.id_col, masked=True)
        sub = rd.read_parquet(paths, columns=[self.id_col, self.vec_col])
        mask_ref = ray.put((mask, self.centroids))
        return brute_force_topk(sub, queries, k=k, vec_col=self.vec_col,
                                id_col=self.id_col, _mask_ref=mask_ref)


def build_ivf(ds, ncells: int | None = 16, vec_col: str = "embedding",
              id_col: str = "vec_id", sample_size: int = 10_000,
              seed: int = 11, index_path: str | None = None) -> IVFIndex:
    """Fit centroids on a sample, assign every vector to a cell, and
    persist the assignment as cell-partitioned Parquet at ``index_path``
    (a fresh temp dir under /tmp when omitted).  ``ncells=None`` picks
    the standard ~sqrt(n) heuristic (clamped to [4, 65536]), which keeps
    both the probe fan-in (nprobe/ncells of the data) and the per-cell
    scan size balanced as n grows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if index_path is None:
        index_path = tempfile.mkdtemp(prefix="ivf_index_")
    n = ds.count()
    if ncells is None:
        ncells = int(min(max(round(n ** 0.5), 4), 65_536))
    if n > sample_size:
        # seeded random_sample: unbiased across the whole dataset (limit()
        # would only ever see the first blocks)
        frac = min(1.0, (sample_size * 1.25) / n)
        sample = ds.random_sample(frac, seed=seed).limit(sample_size).to_pandas()
    else:
        sample = ds.to_pandas()
    X = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    C = _kmeans(X, ncells, seed=seed)

    os.makedirs(index_path, exist_ok=True)
    pq.write_table(
        pa.table({"cell": pa.array(range(len(C)), pa.int64()),
                  "centroid": pa.array([list(map(float, c)) for c in C],
                                       pa.list_(pa.float64()))}),
        os.path.join(index_path, "centroids.parquet"))
    _write_cells(ds, C, index_path, vec_col, id_col)
    return IVFIndex(C, index_path, vec_col=vec_col, id_col=id_col)


class _AssignCells:
    """Actor-pool kernel: nearest-centroid cell per vector (centroids
    broadcast once per actor)."""

    def __init__(self, cref, vec_col: str, id_col: str):
        self.C = _normalize(_maybe_get(cref))
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        V = _normalize(np.stack(df[self.vec_col].to_numpy())
                       .astype(np.float64))
        out = df[[self.id_col, self.vec_col]].copy()
        out["_cell"] = (V @ self.C.T).argmax(axis=1).astype(np.int64)
        return out


def _write_cells(ds, C: np.ndarray, index_path: str, vec_col: str,
                 id_col: str) -> None:
    from ..util import stateful_map

    assignment = stateful_map(ds, _AssignCells,
                              (ray.put(C), vec_col, id_col),
                              batch_format="pandas")
    if len(C) > 1024:
        # pyarrow's write_dataset refuses one fragment spanning >1024
        # partition dirs; hash-shuffling by cell first caps a write
        # task's distinct cells at ~ncells/nparts — and gives every
        # cell a contiguous file set (one writer per cell) instead of
        # one fragment per (cell x write task), which is also the
        # layout the probe's pruned reads want at scale
        from ..config import DEFAULT_CONFIG

        assignment = assignment.repartition(
            DEFAULT_CONFIG.resolve_join_partitions(), keys=["_cell"])
    assignment.write_parquet(os.path.join(index_path, "cells"),
                             partition_cols=["_cell"])


def append_ivf(index_path: str, ds, vec_col: str = "embedding",
               id_col: str = "vec_id") -> IVFIndex:
    """Incremental index ingest: assign NEW vectors to the PERSISTED
    centroids (no refit — cell identity stays stable, so every
    already-written cell file remains valid) and append their
    cell-partitioned files next to the existing ones.  The streaming
    counterpart to build_ivf, mirroring incremental_exact_dedup: a
    daily embedding ingest touches only its own rows — no re-shuffle,
    no re-read of the existing index — and a probe immediately sees
    old + new because the cell directory is the unit of storage
    (write_parquet adds uniquely-named files; existing files are never
    rewritten).  Assignment uses the same kernel as the build, so an
    appended index is file-for-file equivalent to rebuilding with the
    same centroids over the union (pinned by
    tests/test_ops.py::test_ivf_append).  Centroid drift is the
    documented trade-off of every IVF ingest path; refresh by
    rebuilding when cell-size skew warrants it."""
    idx = IVFIndex.load(index_path, vec_col=vec_col, id_col=id_col)
    _write_cells(ds, idx.centroids, index_path, vec_col, id_col)
    return idx


# --------------------------------------------------------------------------
# grouped centroids — the class-prototype / cluster-summary aggregate
# --------------------------------------------------------------------------


def grouped_centroids(ds, *, key: str, vec_col: str = "embedding"):
    """Mean vector per group (class prototypes, cluster summaries,
    per-language embedding centroids).  Output LONG form
    ``(key, dim, centroid)`` — Arrow-native and SQL-checkable.

    Shape: a per-batch combiner sums vectors per key (matmul-free
    pandas groupby over the stacked matrix), so one (key x dim) row
    set leaves each block regardless of row count; ONE keyed shuffle
    combines the partial sums; the mean is a stateless map.  Never
    gathers vectors to the driver."""
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        w = pd.DataFrame(V)
        w["_k"] = df[key].to_numpy()
        g = w.groupby("_k", sort=False)
        sums = g.sum()
        n = g.size()
        dims = np.arange(V.shape[1], dtype=np.int64)
        keys = sums.index.to_numpy()
        return pd.DataFrame({
            key: np.repeat(keys, len(dims)),
            "dim": np.tile(dims, len(keys)),
            "_s": sums.to_numpy().ravel(),
            "_n": np.repeat(n.to_numpy().astype(np.int64), len(dims)),
        })

    from .relational import keyed_sum

    agg = keyed_sum(ds.map_batches(partial, batch_format="pandas"),
                    [key, "dim"], ["_s", "_n"])

    def finalize(d: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key: d[key],
            "dim": d["dim"].astype("int64"),
            "centroid": d["_s"].to_numpy(dtype=np.float64)
            / d["_n"].to_numpy(dtype=np.float64),
        })

    return agg.map_batches(finalize, batch_format="pandas")


# --------------------------------------------------------------------------
# int8 embedding quantization — the shuffle-byte reducer
# --------------------------------------------------------------------------


def quantize_embeddings(ds, *, vec_col: str = "embedding",
                        id_col: str = "vec_id", long_form: bool = False):
    """Symmetric per-vector int8 quantization:

        scale = max|x|          (per vector)
        q     = round_half_away(x * 127 / scale)   in [-127, 127]

    (all-zero vectors get scale 0 and all-zero codes; dequantize with
    x ~ q * scale / 127).  The embedding column shrinks 4x vs float32 /
    8x vs float64 — at 100 TB this is the difference between an
    embedding shuffle that fits the object store and one that spills;
    ANN recall loss at int8 is negligible for cosine ranking.

    Stateless vectorized map, no shuffle.  Default output is the wide
    working form (id, scale, qvec list<int8>); ``long_form=True``
    explodes to (id, dim, qval, scale) — SQL-checkable row-per-
    component, the label_centroids convention."""
    from ..util import round_half_away

    def qz(df: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        n, d = V.shape
        scale = np.abs(V).max(axis=1)
        safe = np.maximum(scale, 1e-300)
        q = np.where(scale[:, None] > 0,
                     round_half_away(V * 127.0 / safe[:, None]),
                     0.0).astype(np.int8)
        if not long_form:
            return pd.DataFrame({
                id_col: df[id_col].to_numpy(),
                "scale": scale,
                "qvec": [row for row in q],
            })
        return pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), d),
            "dim": np.tile(np.arange(d, dtype=np.int64), n),
            "qval": q.ravel().astype(np.int64),
            "scale": np.repeat(scale, d),
        })

    return ds.map_batches(qz, batch_format="pandas")


def dequantize_matrix(qvecs, scales) -> np.ndarray:
    """(n, d) float64 matrix from int8 codes + per-vector scales —
    the kernel-side inverse for scoring over a quantized index."""
    Q = np.stack([np.asarray(v, dtype=np.int8) for v in qvecs])
    s = np.asarray(scales, dtype=np.float64)
    return Q.astype(np.float64) * (s[:, None] / 127.0)


def gram_matrix_q8(ds, *, vec_col: str = "embedding",
                   id_col: str = "vec_id"):
    """Exact distributed Gram matrix G = Q^T Q over the int8-quantized
    embeddings (upper triangle, long form: (i, j, sum_qq) with
    i <= j) — the X^T X building block of PCA whitening / covariance
    estimation over a corpus too large to gather.

    Scale shape: each block computes its OWN d x d int64 matmul
    partial (one numpy matmul per block, emitting d*(d+1)/2 tiny rows
    regardless of block height), and the final fold sums
    #blocks x d^2/2 rows on one block — bounded state, no shuffle of
    row data at all.  All arithmetic is int64 end to end (|q| <= 127,
    so ~3.5e12 rows fit before overflow) — exact and layout-invariant,
    unlike a float covariance fold."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            z = np.empty(0, dtype=np.int64)
            return pd.DataFrame({"i": z, "j": z, "sum_qq": z})
        Q = np.stack([np.asarray(v) for v in df["qvec"].to_numpy()]) \
            .astype(np.int64)
        G = Q.T @ Q
        i_idx, j_idx = np.triu_indices(G.shape[0])
        return pd.DataFrame({"i": i_idx, "j": j_idx,
                             "sum_qq": G[i_idx, j_idx]})

    def fold(d: pd.DataFrame) -> pd.DataFrame:
        if not len(d):
            return d[["i", "j", "sum_qq"]]
        out = d.groupby(["i", "j"], sort=True, as_index=False)["sum_qq"] \
            .sum()
        out["sum_qq"] = out["sum_qq"].astype(np.int64)
        return out

    q = quantize_embeddings(ds, vec_col=vec_col, id_col=id_col)
    return q.map_batches(partial, batch_format="pandas") \
        .repartition(1) \
        .map_batches(fold, batch_format="pandas", batch_size=None)


def random_projection_q8(ds, *, k: int = 8, seed: int = 7,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         dim: int | None = None):
    """Johnson-Lindenstrauss random projection over the int8-quantized
    embeddings: P = Q @ R with R a seeded +-1 sign matrix (Achlioptas
    2003 — database-friendly random projections).  Output is long form
    (id, comp, proj_q) with proj_q = sum_d q_d * r_{d,comp} — INTEGER
    end to end, so the projection is exact, layout-invariant, and
    SQL-replayable from the literal sign matrix.

    Scale shape: stateless vectorized map — one (block x d) @ (d x k)
    int64 matmul per block, no shuffle; R is built once per task from
    the seed (d x k bytes, nothing to broadcast).  The d-to-k
    reduction is the standard pre-filter for ANN / clustering over
    very wide embeddings."""

    def project(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            z = np.empty(0, dtype=np.int64)
            return pd.DataFrame({id_col: z, "comp": z, "proj_q": z})
        Q = np.stack([np.asarray(v) for v in df["qvec"].to_numpy()]) \
            .astype(np.int64)
        d = Q.shape[1]
        if dim is not None and d != dim:
            raise ValueError(f"random_projection_q8: dim={dim} declared "
                             f"but data has {d}")
        P = Q @ projection_sign_matrix(d, k, seed)
        n = len(df)
        return pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), k),
            "comp": np.tile(np.arange(k, dtype=np.int64), n),
            "proj_q": P.ravel(),
        })

    q = quantize_embeddings(ds, vec_col=vec_col, id_col=id_col)
    return q.map_batches(project, batch_format="pandas")


def projection_sign_matrix(d: int, k: int = 8, seed: int = 7) -> np.ndarray:
    """The exact +-1 matrix random_projection_q8 uses — exposed so an
    oracle can inline it as SQL literals (the GBDT tree-compile
    convention: the model IS part of the query)."""
    rng = np.random.RandomState(seed)
    return np.where(rng.rand(d, k) < 0.5, 1, -1).astype(np.int64)


def pca_project(ds, *, k: int = 2, vec_col: str = "embedding",
                id_col: str = "vec_id", round_to: int = 6,
                components_path: str | None = None):
    """PCA projection to k components, distributed end to end except
    the d x d eigendecomposition (which is driver-trivial at any
    corpus size — d is the embedding width, not the row count):

    1. one pass of per-block partials for n, sum(x) and X^T X
       (float64 d x d matmuls; partials fold on the driver in sorted
       block order so the result is deterministic for a fixed layout),
    2. covariance C = G/n - mean mean^T, eigh on the driver, top-k
       eigenvectors sign-fixed (largest-|component| positive) so the
       basis is reproducible,
    3. a stateless broadcast map projects every row: (x - mean) @ W,
       long form (id, comp, value) rounded to ``round_to``.

    The eigen step is genuinely non-SQL-expressible, but with
    ``components_path`` set the fitted (mean, W) persist to parquet
    BEFORE projection and a SQL oracle can replay step 3 from them —
    the model-as-input convention (cf. kmeans_fit's centroids); only
    the fit itself stays pinned by the numpy-oracle unit test."""

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"payload": pd.Series([], dtype=object)})
        V = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame({"payload": [
            (len(V), V.sum(axis=0).tobytes(), (V.T @ V).tobytes(),
             V.shape[1])]})

    parts = ds.map_batches(moments, batch_format="pandas").to_pandas()
    if not len(parts):
        raise ValueError("pca_project: empty input")
    rows = sorted(parts["payload"], key=lambda p: (p[0], p[1]))
    d = rows[0][3]
    n = sum(p[0] for p in rows)
    s = np.zeros(d)
    G = np.zeros((d, d))
    for cnt, sb, gb, _ in rows:
        s = s + np.frombuffer(sb, dtype=np.float64)
        G = G + np.frombuffer(gb, dtype=np.float64).reshape(d, d)
    mean = s / n
    C = G / n - np.outer(mean, mean)
    w, V = np.linalg.eigh(C)
    W = V[:, np.argsort(w)[::-1][:k]]
    # sign convention: largest-|component| entry positive per vector
    flips = np.sign(W[np.abs(W).argmax(axis=0), np.arange(W.shape[1])])
    W = W * np.where(flips == 0, 1.0, flips)[None, :]

    if components_path is not None:
        import os as _os

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        _os.makedirs(components_path, exist_ok=True)
        kk = W.shape[1]
        _pq.write_table(
            _pa.table({
                "comp": _pa.array(np.repeat(np.arange(kk), d), _pa.int64()),
                "dim": _pa.array(np.tile(np.arange(d), kk), _pa.int64()),
                "w": _pa.array(W.T.ravel(), _pa.float64()),
                "mu": _pa.array(np.tile(mean, kk), _pa.float64()),
            }),
            _os.path.join(components_path, "components.parquet"))

    wref = ray.put((mean, W))

    class Project:
        def __init__(self, ref):
            self.mean, self.W = _maybe_get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                z = np.empty(0)
                return pd.DataFrame({id_col: z.astype(np.int64),
                                     "comp": z.astype(np.int64),
                                     "value": z})
            X = np.stack(df[vec_col].to_numpy()).astype(np.float64)
            P = (X - self.mean[None, :]) @ self.W
            kk = P.shape[1]
            return pd.DataFrame({
                id_col: np.repeat(df[id_col].to_numpy(), kk),
                "comp": np.tile(np.arange(kk, dtype=np.int64), len(X)),
                "value": np.round(P.ravel(), round_to),
            })

    from ..util import stateful_map

    return stateful_map(ds, Project, (wref,), batch_format="pandas")


class _KMeansAssign:
    """argmin_c (||c||^2 - 2 x.c) over broadcast centroids — the same
    expression the SQL oracle replays (ties to the lowest cell id,
    numpy argmin semantics)."""

    def __init__(self, cref, vec_col, id_col, emit):
        C = np.asarray(_maybe_get(cref), dtype=np.float64)
        self.C = C
        self.cc = (C * C).sum(axis=1)
        self.vec_col, self.id_col, self.emit = vec_col, id_col, emit

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            z = np.empty(0, dtype=np.int64)
            if self.emit == "assign":
                return pd.DataFrame({self.id_col: z, "cell": z})
            return pd.DataFrame({"cell": z, "cnt": z,
                                 "vsum": pd.Series([], dtype=object)})
        V = np.stack(df[self.vec_col].to_numpy()).astype(np.float64)
        a = (self.cc[None, :] - 2.0 * (V @ self.C.T)).argmin(axis=1)
        if self.emit == "assign":
            return pd.DataFrame({self.id_col: df[self.id_col].to_numpy(),
                                 "cell": a.astype(np.int64)})
        cells, counts, sums = [], [], []
        for c in np.unique(a):
            m = a == c
            cells.append(int(c))
            counts.append(int(m.sum()))
            sums.append(V[m].sum(axis=0).tobytes())
        return pd.DataFrame({"cell": np.asarray(cells, dtype=np.int64),
                             "cnt": np.asarray(counts, dtype=np.int64),
                             "vsum": pd.Series(sums, dtype=object)})


def kmeans_fit(ds, *, k: int, iters: int = 10, vec_col: str = "embedding",
               id_col: str = "vec_id") -> np.ndarray:
    """Distributed Lloyd's k-means over the FULL dataset (build_ivf
    fits on a driver sample; this is the every-row refinement for when
    the sample misrepresents the distribution).  Returns the (k, d)
    centroid matrix.

    Scale shape, per iteration: centroids broadcast once via ray.put;
    each block emits <= k tiny (cell, count, sum-vector) moment rows
    (a pure combiner — the only driver state is #blocks x k rows,
    folded in sorted order so the float update is deterministic for a
    fixed layout); no shuffle at any point.  Init is the k rows with
    the SMALLEST ids (per-block nsmallest partial then a driver merge)
    — fully deterministic and layout-invariant, unlike sampling block
    order."""
    from ..util import stateful_map

    def smallest(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(k, id_col)[[id_col, vec_col]]

    seed_rows = ds.map_batches(smallest, batch_format="pandas") \
        .to_pandas().nsmallest(k, id_col).sort_values(id_col)
    C = np.stack(seed_rows[vec_col].to_numpy()).astype(np.float64)
    if len(C) < k:
        raise ValueError(f"kmeans_fit: k={k} but only {len(C)} rows")

    for _ in range(iters):
        cref = ray.put(C)
        parts = stateful_map(ds, _KMeansAssign,
                             (cref, vec_col, id_col, "moments"),
                             batch_format="pandas").to_pandas()
        parts = parts.sort_values(["cell", "cnt", "vsum"], kind="stable")
        newC = C.copy()  # empty cells keep their previous centroid
        for cell, grp in parts.groupby("cell", sort=True):
            tot = np.zeros(C.shape[1])
            for b in grp["vsum"]:
                tot = tot + np.frombuffer(b, dtype=np.float64)
            newC[cell] = tot / grp["cnt"].sum()
        C = newC
    return C


def kmeans_assign(ds, centroids: np.ndarray, *,
                  vec_col: str = "embedding", id_col: str = "vec_id"):
    """(id, cell) for every row against fixed centroids — stateless
    broadcast map, the deployment half of kmeans_fit."""
    from ..util import stateful_map

    cref = ray.put(np.asarray(centroids, dtype=np.float64))
    return stateful_map(ds, _KMeansAssign, (cref, vec_col, id_col, "assign"),
                        batch_format="pandas")


def rrf_fuse(rankings, *, query_col: str = "query_id",
             item_col: str = "vec_id", rank_col: str = "rank",
             k0: int = 60, topk: int = 10, scale: int = 10 ** 9,
             cfg=None):
    """Reciprocal-rank fusion of N ranked candidate lists (the hybrid-
    retrieval combiner): fused score per (query, item) =
    sum over lists of ``scale // (k0 + rank)`` — the classic RRF
    1/(k0+r) in EXACT integer form, so ordering is bit-reproducible
    and SQL-replayable — then top ``topk`` per query by (score desc,
    item asc), with the 1-based fused rank appended.

    ``rankings``: Datasets of (query_col, item_col, rank_col), rank
    1-based; items missing from a list contribute 0 (standard RRF over
    truncated lists).  Ids must be integer-typed.

    Shape: per-list stateless rrf map -> union -> ONE combiner-reduced
    keyed sum on (query, item) -> group_topk (per-block partial top-k
    combiner, one keyed shuffle)."""
    from ..config import DEFAULT_CONFIG
    from .relational import group_topk, keyed_sum

    cfg = cfg or DEFAULT_CONFIG

    def to_rrf(d: pd.DataFrame, _rc=rank_col) -> pd.DataFrame:
        return pd.DataFrame({
            query_col: d[query_col].to_numpy().astype(np.int64),
            item_col: d[item_col].to_numpy().astype(np.int64),
            "rrf": (scale // (k0 + d[_rc].to_numpy().astype(np.int64)))
            .astype(np.int64),
        })

    parts = [r.map_batches(to_rrf, batch_format="pandas")
             for r in rankings]
    allp = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    scored = keyed_sum(allp, [query_col, item_col], ["rrf"], cfg)
    return group_topk(scored, key=query_col, order_col="rrf", k=topk,
                      tie_col=item_col, descending=True, with_rank=True,
                      cfg=cfg)
