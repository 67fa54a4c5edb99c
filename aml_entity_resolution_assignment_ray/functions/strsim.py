"""Vectorized string-similarity kernels.

Batch (numpy) implementations of the per-pair similarity functions the
reference takes from jellyfish (reference: matching.py:264 damerau-
levenshtein, :273/:279-280 jaro-winkler, :285 levenshtein). jellyfish is a
C extension that is absent from this environment, and a per-row Python loop
would dominate the scoring stage, so each kernel operates on *arrays of
string pairs* at once: strings are encoded into padded UTF-32 code-point
matrices and the dynamic programs iterate over string positions (tens of
steps) with each step vectorized over all N pairs in the batch.

Conventions (matching jellyfish and DuckDB):
  * jaro_winkler(a, b) == 0.0 when either string is empty,
  * the Winkler prefix boost (weight 0.1, prefix cap 4) applies only when
    the plain Jaro similarity exceeds 0.7,
  * levenshtein('', b) == len(b),
  * damerau_levenshtein here is the *optimal string alignment* (OSA)
    variant: transpositions of adjacent characters count as one edit
    ("81" -> "18" = 1, reference: matching.py:329-343) but a transposed
    pair can't be edited further.  The unrestricted variant differs only
    in pathological cases that do not occur for ID strings.
"""

from __future__ import annotations

import numpy as np


def encode_utf32(strings) -> tuple[np.ndarray, np.ndarray]:
    """Encode a sequence of python strings into a padded (N, Lmax) int64
    code-point matrix (pad value 0) plus a length vector.

    Vectorized: one ``str.join`` + one ``np.frombuffer`` for the whole
    batch; no per-character Python loop.
    """
    strings = ["" if s is None else str(s) for s in strings]
    n = len(strings)
    lens = np.fromiter((len(s) for s in strings), count=n, dtype=np.int64)
    lmax = int(lens.max()) if n else 0
    if lmax == 0:
        return np.zeros((n, 1), dtype=np.int64), lens
    flat = np.frombuffer("".join(strings).encode("utf-32-le"), dtype=np.uint32)
    mat = np.zeros((n, lmax), dtype=np.int64)
    mask = np.arange(lmax)[None, :] < lens[:, None]
    mat[mask] = flat
    return mat, lens


def _as_pairs(a, b):
    am, al = encode_utf32(a)
    bm, bl = encode_utf32(b)
    return am, al, bm, bl


def levenshtein_batch(a, b) -> np.ndarray:
    """Levenshtein edit distance for N string pairs, vectorized.

    Row DP over positions of ``b``; the in-row insertion chain
    ``cur[i] = min(cur[i-1]+1, ...)`` is resolved with the
    ``min.accumulate(x - i) + i`` prefix trick so each of the Lb steps is
    a pure vector op over all pairs.
    """
    am, al, bm, bl = _as_pairs(a, b)
    return _levenshtein_core(am, al, bm, bl, transpositions=False)


def osa_batch(a, b) -> np.ndarray:
    """Optimal-string-alignment distance (restricted Damerau-Levenshtein)."""
    am, al, bm, bl = _as_pairs(a, b)
    return _levenshtein_core(am, al, bm, bl, transpositions=True)


def damerau_levenshtein_batch(a, b) -> np.ndarray:
    """Unrestricted Damerau-Levenshtein distance (Lowrance-Wagner),
    matching jellyfish / DuckDB exactly — vectorized over N pairs.

    Keeps the full (N, La+2, Lb+2) DP cube so the transposition term can
    gather from arbitrary earlier rows; intended for short ID-like strings
    (the reference applies it to national IDs only, matching.py:264).
    """
    am, al, bm, bl = _as_pairs(a, b)
    n, la = am.shape
    lb = bm.shape[1]
    big = la + lb + 1
    idx = np.arange(lb + 1, dtype=np.int64)
    jvec = np.arange(1, lb + 1, dtype=np.int64)[None, :]

    # d[i][j] (distance of a[:i] vs b[:j]) lives at D[:, i+1, j+1]; the
    # i=0 / j=0 planes hold the 'maxdist' border the transposition term
    # falls back to when a character was never seen.
    D = np.empty((n, la + 2, lb + 2), dtype=np.int64)
    D[:, 0, :] = big
    D[:, :, 0] = big
    D[:, 1, 1:] = idx
    if la:
        D[:, 2:, 1] = np.arange(1, la + 1, dtype=np.int64)[None, :]

    # krow[:, j-1] = largest i' < i with a[i'-1] == b[j-1], else 0
    krow = np.zeros((n, lb), dtype=np.int64)
    for i in range(1, la + 1):
        eq = bm == am[:, i - 1 : i]                # (n, lb)
        cost = (~eq).astype(np.int64)
        prev = D[:, i, 1:]                         # d[i-1][0..lb], width lb+1
        # lcol[:, j-1] = largest j' < j with b[j'-1] == a[i-1], else 0
        match_pos = np.where(eq, jvec, 0)
        lcol = np.concatenate(
            [np.zeros((n, 1), dtype=np.int64), np.maximum.accumulate(match_pos, axis=1)[:, :-1]],
            axis=1,
        )
        # transposition: d[k-1][l-1] + (i-k-1) + 1 + (j-l-1) = D[:,k,l] + ...
        flat = D.reshape(n, -1)
        gather = np.take_along_axis(flat, krow * (lb + 2) + lcol, axis=1)
        trans = gather + (i - krow - 1) + 1 + (jvec - lcol - 1)
        cand = np.minimum(prev[:, :-1] + cost, prev[:, 1:] + 1)    # substitute / delete
        cand = np.minimum(cand, trans)
        # insertion chain cur[j] = min(cand[j], cur[j-1]+1), base d[i][0] = i
        full = np.concatenate([np.full((n, 1), i, dtype=np.int64), cand], axis=1)
        cur = np.minimum.accumulate(full - idx, axis=1) + idx
        D[:, i + 1, 1:] = cur
        krow = np.where(eq, i, krow)

    rows = np.arange(n)
    return D[rows, al + 1, bl + 1]


def _levenshtein_core(am, al, bm, bl, transpositions: bool) -> np.ndarray:
    n, la = am.shape
    lb = bm.shape[1]
    out = np.empty(n, dtype=np.int64)
    idx = np.arange(la + 1, dtype=np.int64)
    prev = np.broadcast_to(idx, (n, la + 1)).copy()     # row j=0: distance = i
    prev2 = None
    # capture answers for pairs whose b is empty
    done = bl == 0
    out[done] = al[done]
    rows = np.arange(n)
    for j in range(1, lb + 1):
        neq = (am != bm[:, j - 1 : j]).astype(np.int64)           # (n, la)
        cand = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + neq)    # delete / substitute
        if transpositions and j >= 2:
            # a[i-1]==b[j-2] and a[i-2]==b[j-1]  ->  prev2[i-2] + 1
            tr_ok = (am[:, 1:] == bm[:, j - 2 : j - 1]) & (am[:, :-1] == bm[:, j - 1 : j])
            tr_cost = np.where(tr_ok, prev2[:, :-2] + 1, np.iinfo(np.int64).max // 2)
            cand[:, 1:] = np.minimum(cand[:, 1:], tr_cost)
        full = np.concatenate([np.full((n, 1), j, dtype=np.int64), cand], axis=1)
        # resolve cur[i] = min_k<=i (full[k] + (i-k)) : the insertion chain
        cur = np.minimum.accumulate(full - idx, axis=1) + idx
        prev2, prev = prev, cur
        hit = bl == j
        if hit.any():
            out[hit] = cur[rows[hit], al[hit]]
    return out


def jaro_winkler_batch(a, b, prefix_weight: float = 0.1, boost_threshold: float = 0.7) -> np.ndarray:
    """Jaro-Winkler similarity for N string pairs, vectorized.

    The greedy match scan iterates over positions of ``a`` (La steps),
    each step a vector op over all pairs x positions of ``b``.
    """
    am, al, bm, bl = _as_pairs(a, b)
    n, la = am.shape
    lb = bm.shape[1]
    both = (al > 0) & (bl > 0)
    if not both.any():
        return np.zeros(n, dtype=np.float64)

    match_dist = np.maximum(np.maximum(al, bl) // 2 - 1, 0)        # (n,)
    b_pos = np.arange(lb)[None, :]
    b_valid = b_pos < bl[:, None]
    b_used = np.zeros((n, lb), dtype=bool)
    a_match = np.zeros((n, la), dtype=bool)
    for i in range(la):
        active = i < al
        cand = (
            b_valid
            & ~b_used
            & (bm == am[:, i : i + 1])
            & (np.abs(b_pos - i) <= match_dist[:, None])
            & active[:, None]
        )
        has = cand.any(axis=1)
        first = cand.argmax(axis=1)
        hit_rows = np.where(has)[0]
        b_used[hit_rows, first[hit_rows]] = True
        a_match[:, i] = has

    m = a_match.sum(axis=1)

    # ordered matched code points on each side (stable compaction to the left)
    a_ord = _compact(am, a_match)
    b_ord = _compact(bm, b_used)
    k = min(a_ord.shape[1], b_ord.shape[1])
    if k:
        pos = np.arange(k)[None, :]
        mism = (a_ord[:, :k] != b_ord[:, :k]) & (pos < m[:, None])
        # jellyfish / DuckDB convention: integer-halve the mismatch count
        t = (mism.sum(axis=1) // 2).astype(np.float64)
    else:
        t = np.zeros(n)

    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (m / np.maximum(al, 1) + m / np.maximum(bl, 1) + (m - t) / np.maximum(m, 1)) / 3.0
    jaro = np.where((m > 0) & both, jaro, 0.0)

    # Winkler prefix boost: common prefix up to 4 chars, only if jaro > boost_threshold
    pl = min(4, la, lb)
    if pl:
        pref_eq = np.logical_and.accumulate(
            (am[:, :pl] == bm[:, :pl]) & (np.arange(pl)[None, :] < np.minimum(al, bl)[:, None]),
            axis=1,
        )
        prefix = pref_eq.sum(axis=1)
    else:
        prefix = np.zeros(n, dtype=np.int64)
    jw = np.where(jaro > boost_threshold, jaro + prefix * prefix_weight * (1.0 - jaro), jaro)
    return jw


def _compact(mat: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Move the masked elements of each row to the left, preserving order."""
    order = np.argsort(~mask, axis=1, kind="stable")
    return np.take_along_axis(mat, order, axis=1)


# ---- scalar convenience wrappers (tests / one-off probes) ----

def jaro_winkler(a: str, b: str) -> float:
    return float(jaro_winkler_batch([a], [b])[0])


def levenshtein(a: str, b: str) -> int:
    return int(levenshtein_batch([a], [b])[0])


def damerau_levenshtein(a: str, b: str) -> int:
    return int(damerau_levenshtein_batch([a], [b])[0])
