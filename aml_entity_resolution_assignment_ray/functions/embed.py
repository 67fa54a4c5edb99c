"""Deterministic feature-hashed text embeddings + batch cosine.

The north-star scorer computes "Jaro-Winkler/Levenshtein + embedding
cosine" per candidate pair.  The reference has no embedding model (its
fuzzy-name signal is MinHash, preprocessing.py:138-164), so the rebuild
uses a dependency-free, deterministic stand-in with the same contract a
learned encoder would have: text -> fixed-dim unit vector, cosine in
[-1, 1], 1.0 for identical strings, ~0 for unrelated ones.

Construction: the 3-char shingle hashes already used for MinHash
(functions/minhash.py batch_shingle_hashes — one vectorized pass per
batch) are feature-hashed into ``dim`` signed buckets (bucket = h mod
dim, sign = bit 32 of h) and L2-normalized.  This is the classic
hashing-trick bag-of-shingles embedding; swapping in a real model is a
one-function change (any ``texts -> (n, dim) float32`` kernel slots in).
"""

from __future__ import annotations

import numpy as np

from .minhash import batch_shingle_hashes

DEFAULT_DIM = 64


def hashed_embedding_batch(texts, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Batch of strings -> (n, dim) float32 unit vectors (zero vector
    for empty/shingle-less strings).  Fully vectorized: one flat shingle
    pass + one bincount."""
    flat, counts = batch_shingle_hashes(texts)
    n = len(counts)
    if n == 0:
        return np.zeros((0, dim), dtype=np.float32)
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    bucket = (flat % np.uint64(dim)).astype(np.int64)
    sign = np.where((flat >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
    mat = np.bincount(rows * dim + bucket, weights=sign,
                      minlength=n * dim).reshape(n, dim)
    norms = np.linalg.norm(mat, axis=1)
    nz = norms > 0
    mat[nz] /= norms[nz, None]
    return mat.astype(np.float32)


def cosine_pairs_batch(texts_a, texts_b, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Embedding cosine per (a, b) row; 0.0 when either side embeds to
    the zero vector.  Embeds the UNIQUE strings of both sides once and
    gathers — pair batches repeat names heavily."""
    a = np.asarray(texts_a, dtype=object)
    b = np.asarray(texts_b, dtype=object)
    uniq, inv = np.unique(np.concatenate([a, b]).astype(str),
                          return_inverse=True)
    emb = hashed_embedding_batch(uniq, dim=dim)
    ea = emb[inv[:len(a)]]
    eb = emb[inv[len(a):]]
    return np.einsum("ij,ij->i", ea, eb).astype(np.float64)
