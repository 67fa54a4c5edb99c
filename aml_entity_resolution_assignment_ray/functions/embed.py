"""Deterministic feature-hashed text embeddings + batch cosine.

The north-star scorer computes "Jaro-Winkler/Levenshtein + embedding
cosine" per candidate pair.  The reference has no embedding model (its
fuzzy-name signal is MinHash, preprocessing.py:138-164), so the rebuild
uses a dependency-free, deterministic stand-in with the same contract a
learned encoder would have: text -> fixed-dim unit vector, cosine in
[-1, 1], 1.0 for identical strings, ~0 for unrelated ones.

Construction: the 3-char shingle hashes already used for MinHash
(functions/minhash.py batch_shingle_hashes — one vectorized pass per
batch; 32-bit values) are feature-hashed into ``dim`` signed buckets
(sign = bit 0 of h, bucket = (h >> 1) mod dim) and L2-normalized.
This is the classic
hashing-trick bag-of-shingles embedding; swapping in a real model is a
one-function change (any ``texts -> (n, dim) float32`` kernel slots in).
"""

from __future__ import annotations

import numpy as np

from .minhash import batch_shingle_hashes

DEFAULT_DIM = 64


def raw_embedding_batch(texts, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Batch of strings -> (n, dim) float64 UNNORMALIZED signed-count
    vectors (all components are exact small integers; zero vector for
    empty/shingle-less strings).  Fully vectorized: one flat shingle
    pass + one bincount."""
    flat, counts = batch_shingle_hashes(texts)
    n = len(counts)
    if n == 0:
        return np.zeros((0, dim), dtype=np.float64)
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    bucket = ((flat >> np.uint64(1)) % np.uint64(dim)).astype(np.int64)
    sign = np.where(flat & np.uint64(1), 1.0, -1.0)
    return np.bincount(rows * dim + bucket, weights=sign,
                       minlength=n * dim).reshape(n, dim)


def hashed_embedding_batch(texts, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Batch of strings -> (n, dim) float64 unit vectors (zero vector
    for empty/shingle-less strings)."""
    mat = raw_embedding_batch(texts, dim=dim)
    norms = np.linalg.norm(mat, axis=1)
    nz = norms > 0
    mat[nz] /= norms[nz, None]
    return mat


def cosine_pairs_batch(texts_a, texts_b, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Embedding cosine per (a, b) row; 0.0 when either side embeds to
    the zero vector.  Embeds the UNIQUE strings of both sides once and
    gathers — pair batches repeat names heavily.

    Computed as dot(raw_a, raw_b) / (sqrt(q_a) * sqrt(q_b)) with the raw
    integer-valued vectors: the numerator and both squared norms are
    exact integers in float64, so the result is bit-reproducible across
    batch splits, partitionings AND the DuckDB oracle (which evaluates
    the identical expression)."""
    a = np.asarray(texts_a, dtype=object)
    b = np.asarray(texts_b, dtype=object)
    uniq, inv = np.unique(np.concatenate([a, b]).astype(str),
                          return_inverse=True)
    emb = raw_embedding_batch(uniq, dim=dim)
    q = np.einsum("ij,ij->i", emb, emb)
    ea, eb = emb[inv[:len(a)]], emb[inv[len(a):]]
    qa, qb = q[inv[:len(a)]], q[inv[len(a):]]
    dot = np.einsum("ij,ij->i", ea, eb)
    denom = np.sqrt(qa) * np.sqrt(qb)
    return np.divide(dot, denom, out=np.zeros(len(a), dtype=np.float64),
                     where=denom > 0)
