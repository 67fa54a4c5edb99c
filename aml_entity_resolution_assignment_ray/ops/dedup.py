"""Deduplication operators for a document table.

* exact_dedup           — hash-partition groupby, keep min id per text
* minhash_lsh_dup_pairs — shingle -> MinHash -> banded LSH buckets ->
                          candidate pairs -> exact signature-Jaccard
                          filter (reuses the ER engine's minhash kernels
                          and pair machinery — same shuffle shapes)
* minhash_dedup         — pairs -> union-find -> (doc_id, canonical_id)
* simhash_dup_pairs     — 64-bit SimHash + banded hamming buckets
* ngram_jaccard_pairs   — exact character-q-gram Jaccard on candidates
* embedding_dup_pairs   — cosine near-dup via random-hyperplane LSH
                          buckets + exact cosine filter

All shuffles are hash-shuffles on small fixed-width keys; document text
never moves except where the exact verify step needs it (and then only
for bucketed candidates, never all-pairs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions import minhash as mh
from ..stages.cluster import connected_components
from ..stages.pairs import generate_pairs


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """One row per distinct ``col`` value with the smallest id — the
    hash-partition + per-group-first pattern. Output columns:
    (col, id_col)."""
    return (
        ds.select_columns([col, id_col])
        .groupby(col)
        .min(id_col)
        .rename_columns({f"min({id_col})": id_col})
    )


def _doc_band_keys(ds, col: str, id_col: str, num_perm: int, threshold: float,
                   ngram: int = 3):
    """documents -> long key table (key_type, key_value, conv_id) of LSH
    band keys (conv_id carries the doc id, reusing the ER pair engine)."""
    bands, rows = mh.optimal_param(threshold, num_perm)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].astype(str).to_numpy()
        sigs = mh.minhash_batch(df[col].fillna("").to_numpy(), num_perm)
        bkeys = mh.band_keys(sigs, bands, rows)
        n = len(df)
        band_ids = np.tile(np.arange(bands), n)
        flat = bkeys.reshape(-1)
        vals = np.array(
            [f"{b}:{format(v, 'x')}" for b, v in zip(band_ids, flat)],
            dtype=object)
        return pd.DataFrame({
            "key_type": np.full(n * bands, "minhash", dtype=object),
            "key_value": vals,
            "conv_id": np.repeat(ids, bands),
        })

    return ds.map_batches(emit, batch_format="pandas")


def minhash_lsh_dup_pairs(ds, col: str = "text", id_col: str = "doc_id",
                          threshold: float = 0.7, num_perm: int = 128,
                          cfg: EngineConfig = DEFAULT_CONFIG,
                          verify: bool = True):
    """Near-duplicate candidate pairs (id_a < id_b) whose estimated
    signature Jaccard >= threshold."""
    keys = _doc_band_keys(ds, col, id_col, num_perm, threshold)
    pairs = generate_pairs(keys, cfg)
    if not verify:
        return pairs
    # exact verify: hydrate signatures and filter on signature Jaccard
    import ray

    sig_lookup = {}

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        sigs = mh.minhash_batch(df[col].fillna("").to_numpy(), num_perm)
        return pd.DataFrame({
            "doc": df[id_col].astype(str),
            "sig": [s.tobytes() for s in sigs],
        })

    sig_df = ds.map_batches(collect, batch_format="pandas").to_pandas()
    lookup_ref = ray.put(dict(zip(sig_df["doc"], sig_df["sig"])))

    class Verify:
        def __init__(self, ref, thr):
            self.lookup = ray.get(ref)
            self.thr = thr

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return df.assign(jaccard=np.zeros(0))
            a = np.stack([np.frombuffer(self.lookup[i], dtype=np.uint64)
                          for i in df["id_a"]])
            b = np.stack([np.frombuffer(self.lookup[i], dtype=np.uint64)
                          for i in df["id_b"]])
            jac = (a == b).mean(axis=1)
            out = df.assign(jaccard=jac)
            return out[out["jaccard"] >= self.thr].reset_index(drop=True)

    return pairs.map_batches(
        Verify, fn_constructor_args=(lookup_ref, threshold),
        batch_format="pandas", concurrency=(1, 4))


def minhash_dedup(ds, col: str = "text", id_col: str = "doc_id",
                  threshold: float = 0.7, num_perm: int = 128,
                  cfg: EngineConfig = DEFAULT_CONFIG):
    """Full near-dedup: (doc_id, canonical_id) for every document, where
    canonical_id = min doc id of the near-dup component (union-find over
    LSH-verified pairs)."""
    pairs = minhash_lsh_dup_pairs(ds, col, id_col, threshold, num_perm, cfg) \
        .select_columns(["id_a", "id_b"])
    ids = ds.map_batches(
        lambda t: pa.table({"conv_id": pa.compute.cast(t[id_col], pa.string())}),
        batch_format="pyarrow")
    labels = connected_components(pairs, ids, cfg)
    return labels.rename_columns({"node": id_col, "label": "canonical_id"})


# ---- SimHash ----

_SIM_SEED = 17


def simhash_batch(texts, nbits: int = 64, ngram: int = 3) -> np.ndarray:
    """64-bit SimHash per text over char n-gram hashes: each feature
    votes its hash bits +-1; the sign vector packs into a uint64."""
    flat, counts = mh.batch_shingle_hashes(texts)
    # spread the 32-bit shingle hash to 64 bits with a splitmix-style mix
    with np.errstate(over="ignore"):
        x = flat.astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    bits = ((x[:, None] >> np.arange(nbits, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = bits.astype(np.int64) * 2 - 1      # (n_shingles, nbits)
    ends = np.cumsum(counts)
    starts = ends - counts
    out = np.zeros(len(counts), dtype=np.uint64)
    nonempty = counts > 0
    if nonempty.any():
        # segment sums via cumsum differences (robust to empty docs)
        csum = np.concatenate([np.zeros((1, votes.shape[1]), dtype=np.int64),
                               np.cumsum(votes, axis=0)])
        seg = csum[ends[nonempty]] - csum[starts[nonempty]]
        packed = (seg > 0).astype(np.uint64) @ (
            np.uint64(1) << np.arange(nbits, dtype=np.uint64))
        out[nonempty] = packed
    return out


def simhash_dup_pairs(ds, col: str = "text", id_col: str = "doc_id",
                      max_hamming: int = 3,
                      cfg: EngineConfig = DEFAULT_CONFIG):
    """Near-dup pairs with SimHash hamming distance <= max_hamming.

    Banding: 4 x 16-bit bands — any pair within hamming 3 shares at
    least one exact band (pigeonhole), so bucketing by band value is a
    lossless blocking step; candidates verify exact hamming."""
    nbands, width = 4, 16
    mask = np.uint64((1 << width) - 1)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].astype(str).to_numpy()
        sh = simhash_batch(df[col].fillna("").to_numpy())
        parts = []
        for b in range(nbands):
            vals = (sh >> np.uint64(b * width)) & mask
            parts.append(pd.DataFrame({
                "key_type": "simhash",
                "key_value": [f"{b}:{v:04x}" for v in vals],
                "conv_id": ids,
                "sim": sh,
            }))
        return pd.concat(parts, ignore_index=True)

    keyed = ds.map_batches(emit, batch_format="pandas")
    pairs = generate_pairs(keyed.select_columns(["key_type", "key_value", "conv_id"]), cfg)

    import ray

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        sh = simhash_batch(df[col].fillna("").to_numpy())
        return pd.DataFrame({"doc": df[id_col].astype(str), "sim": sh})

    sim_df = ds.map_batches(collect, batch_format="pandas").to_pandas()
    ref = ray.put(dict(zip(sim_df["doc"], sim_df["sim"])))

    class Verify:
        def __init__(self, r, maxh):
            self.lookup = ray.get(r)
            self.maxh = maxh

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return df.assign(hamming=np.zeros(0, dtype=np.int64))
            a = np.array([self.lookup[i] for i in df["id_a"]], dtype=np.uint64)
            b = np.array([self.lookup[i] for i in df["id_b"]], dtype=np.uint64)
            x = a ^ b
            ham = np.zeros(len(x), dtype=np.int64)
            for _ in range(64):
                ham += (x & np.uint64(1)).astype(np.int64)
                x = x >> np.uint64(1)
            out = df.assign(hamming=ham)
            return out[out["hamming"] <= self.maxh].reset_index(drop=True)

    return pairs.map_batches(Verify, fn_constructor_args=(ref, max_hamming),
                             batch_format="pandas", concurrency=(1, 4))


def ngram_jaccard_pairs(ds, col: str = "text", id_col: str = "doc_id",
                        q: int = 3, threshold: float = 0.5,
                        cfg: EngineConfig = DEFAULT_CONFIG):
    """Exact character-q-gram Jaccard over LSH-bucketed candidates (the
    LSH recall net is cast wider than the final threshold)."""
    lsh_thr = max(0.3, threshold - 0.2)
    pairs = minhash_lsh_dup_pairs(ds, col, id_col, lsh_thr, 128, cfg,
                                  verify=False)
    import ray

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[col].fillna("").astype(str).str.lower()
        grams = [frozenset(t[i:i + q] for i in range(max(len(t) - q + 1, 0))) or
                 frozenset([t]) for t in texts]
        return pd.DataFrame({"doc": df[id_col].astype(str), "grams": grams})

    g = ds.map_batches(collect, batch_format="pandas").to_pandas()
    ref = ray.put(dict(zip(g["doc"], g["grams"])))

    class Verify:
        def __init__(self, r, thr):
            self.lookup = ray.get(r)
            self.thr = thr

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            jac = np.zeros(len(df))
            for i, (a, b) in enumerate(zip(df["id_a"], df["id_b"])):
                ga, gb = self.lookup[a], self.lookup[b]
                inter = len(ga & gb)
                union = len(ga) + len(gb) - inter
                jac[i] = inter / union if union else 0.0
            out = df.assign(jaccard=jac)
            return out[out["jaccard"] >= self.thr].reset_index(drop=True)

    return pairs.map_batches(Verify, fn_constructor_args=(ref, threshold),
                             batch_format="pandas", concurrency=(1, 4))


def embedding_dup_pairs(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                        threshold: float = 0.9, nplanes: int = 8,
                        nbands: int = 4, cfg: EngineConfig = DEFAULT_CONFIG,
                        dim: int | None = None):
    """Embedding-cosine near-dup: random-hyperplane LSH (sign sketches,
    banded) buckets candidates; exact cosine verifies."""
    import ray

    first = ds.take(1)
    if not first:
        return generate_pairs(
            ds.map_batches(lambda df: pd.DataFrame(
                {"key_type": [], "key_value": [], "conv_id": []}),
                batch_format="pandas"), cfg)
    d = dim or len(first[0][vec_col])
    rng = np.random.RandomState(7)
    planes = rng.randn(d, nplanes)
    width = nplanes // nbands
    planes_ref = ray.put(planes)

    class Emit:
        def __init__(self, pref):
            self.planes = ray.get(pref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            V = np.stack(df[vec_col].to_numpy())
            signs = (V @ self.planes) > 0          # (n, nplanes)
            ids = df[id_col].astype(str).to_numpy()
            parts = []
            pw = 1 << np.arange(width)
            for b in range(nbands):
                block = signs[:, b * width:(b + 1) * width]
                vals = block @ pw
                parts.append(pd.DataFrame({
                    "key_type": "rhp",
                    "key_value": [f"{b}:{int(v)}" for v in vals],
                    "conv_id": ids,
                }))
            return pd.concat(parts, ignore_index=True)

    keyed = ds.map_batches(Emit, fn_constructor_args=(planes_ref,),
                           batch_format="pandas", concurrency=(1, 4))
    pairs = generate_pairs(keyed, cfg)

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return pd.DataFrame({"doc": df[id_col].astype(str),
                             "vec": [v.tobytes() for v in V]})

    vecs = ds.map_batches(collect, batch_format="pandas").to_pandas()
    ref = ray.put(dict(zip(vecs["doc"], vecs["vec"])))

    class Verify:
        def __init__(self, r, thr, d):
            self.lookup = ray.get(r)
            self.thr = thr
            self.d = d

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return df.assign(cosine=np.zeros(0))
            A = np.stack([np.frombuffer(self.lookup[i], dtype=np.float64)
                          for i in df["id_a"]])
            B = np.stack([np.frombuffer(self.lookup[i], dtype=np.float64)
                          for i in df["id_b"]])
            cos = (A * B).sum(axis=1)
            out = df.assign(cosine=cos)
            return out[out["cosine"] >= self.thr].reset_index(drop=True)

    return pairs.map_batches(Verify, fn_constructor_args=(ref, threshold, d),
                             batch_format="pandas", concurrency=(1, 4))
