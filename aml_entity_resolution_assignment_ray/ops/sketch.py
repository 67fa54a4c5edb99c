"""Sketch aggregates — bounded-state summaries for the aggregations
whose exact versions shuffle too much at corpus scale.

KMV (k-minimum-values) distinct-count sketch [Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream"]: keep the k smallest
DISTINCT hash values of a column; if fewer than k exist the count is
exact, else estimate

    distinct ~= (k - 1) * M / h_k        (M = hash range, h_k = k-th
                                          smallest distinct hash)

with relative standard error ~1/sqrt(k - 2) (~12.6% at k=64, ~6.3% at
k=256).  Three properties make it the right sketch here:

* deterministic — the hash is the engine's fixed Knuth/polynomial map
  (ops/sample.py), no RNG, so the estimate is a pure function of the
  VALUE SET: repartition-invariant and stable across runs/cluster
  sizes;
* mergeable — k smallest of a union == k smallest over the parts'
  k-smallest sets, so a per-batch combiner bounds the shuffle at
  <= k rows per (block, key) no matter how many rows the group holds
  (exact count-distinct moves every distinct value);
* exactly SQL-replayable — unusually for a sketch: DuckDB can replay
  the hash in BIGINT arithmetic and the estimate in double arithmetic
  bit-for-bit, so the oracle gate checks VALUES, not tolerances.

Hash-collision caveat: distinct values that collide in the 32-bit hash
count once — identically on both sides.

Bottom-m quantile sketch [order/bottom-k sampling: Rosén 1997,
"Asymptotic theory for order sampling"; Cohen & Kaplan 2007,
"Summarizing data using bottom-k sketches"]: keep, per group, the m
rows whose ID hashes smallest — a deterministic uniform row sample —
and evaluate discrete quantiles on the sample.  Rank error is
O(sqrt(q*(1-q)/m)) per quantile (~3% at m=256 for the median), state
is <= m rows per (block, key), and the merge rule (bottom-m of a
union == bottom-m over the parts' bottom-m sets; per-row samples are
disjoint across blocks) makes the per-batch partial a correct
combiner.  Same three properties as KMV: deterministic (fixed Knuth /
polynomial hash of the ROW ID, ties broken by the id itself — a total
order, so the sample is a pure function of the row set), mergeable,
and exactly SQL-replayable (row_number() over the replayed hash +
quantile_disc on the sample), so the oracle gate checks VALUES.  This
is the sketch-side answer to ops/relational.grouped_quantiles' exact
operator, whose (key, value)-count combiner is only bounded for
bounded-domain columns.

Count-Min sketch [Cormode & Muthukrishnan 2005, "An improved data
stream summary: the count-min sketch and its applications"]: a d x w
counter table; row i counts value x in cell ((a_i*h(x) + b_i) mod p)
mod w, and the point-frequency estimate is the MIN over the d rows'
cells — an overestimate by at most (e/w)*n with probability
1 - e^-d, never an underestimate.  Same three properties again:
deterministic (fixed hash constants, no RNG — the table is a pure
function of the value MULTISET, repartition- and merge-order-
invariant because cells are plain sums), mergeable (cell-wise
addition; the per-batch partial emits <= d*w (row, cell, cnt) rows
per block regardless of block size), and exactly SQL-replayable
(BIGINT modular arithmetic + GROUP BY cell + min over rows), so the
oracle gate checks VALUES.  This is the sketch-side answer to
keyed_sum for frequency queries: the exact operator shuffles one
partial row per (block, key); the CM table is O(d*w) TOTAL, however
many distinct keys exist.

Bloom filter [Bloom 1970, "Space/time trade-offs in hash coding with
allowable errors"]: m-bit bitmap, k affine hashes (the CM family) —
bit-miss is an exact negative, bit-hit a deterministic maybe.  The
broadcast membership pre-filter: the bitmap is FIXED-SIZE however
large the build side grows, so a Bloom-gated semi/anti join ships
m/8 bytes once and shuffles only the maybe-rows to the exact check.
Deterministic and exactly SQL-replayable like the others.

HyperLogLog [Flajolet et al. 2007, "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm"]: the industry-standard
distinct sketch and KMV's fixed-size sibling — m = 2^p registers, the
hash splits into a register index j = h mod m and a suffix
w = h div m, and register j keeps the MAX of rank(w) = (number of
leading zero bits of w in its 32-p bit field) + 1.  The estimate is
the bias-corrected harmonic mean alpha_m * m^2 / sum_j 2^-M_j with
Flajolet's small-range (linear counting on empty registers) and
32-bit large-range corrections.  Relative standard error is
~1.04/sqrt(m) (~13% at m=64).  The engine keeps the harmonic sum in
EXACT integer form — sum_j 2^(R - M_j) with R the max possible rank —
so the only float steps are the final constant-multiply/divide (and
ln in the correction branches), shared verbatim with the SQL oracle:

* deterministic — register M_j is a MAX over a pure function of the
  value set: repartition- and merge-order-invariant, like KMV;
* mergeable — registers combine by elementwise max, so per-block
  partials are <= m rows per (block, key) whatever the block holds,
  and a persisted register table absorbs new shards by max;
* exactly SQL-replayable — rank via an integer bit-length CASE chain
  (no floating log2 on the hot path), the harmonic sum in BIGINT, and
  the same double-precision estimator expression on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import DEFAULT_CONFIG, EngineConfig

_M = 4294967296.0  # 2^32, the _hash_values range


def kmv_distinct(ds, *, key: str, col: str, k: int = 64,
                 out_col: str = "approx_distinct",
                 cfg: EngineConfig = DEFAULT_CONFIG):
    """Approximate count-distinct of ``col`` per ``key`` group.
    Output (key, out_col BIGINT); exact below k distinct values.

    Shape: per-batch combiner keeps the k smallest distinct hashes per
    in-block key (<= k rows per block-key leave each block); ONE keyed
    shuffle merges the partials; the finalize re-takes the k smallest
    and evaluates the estimator.  Ids are assumed non-negative (the
    hash_bucket contract — DuckDB's signed ``%`` diverges below 0)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from .relational import _keyed, _meta_rows
    from .sample import _hash_values
    from ..util import round_half_away

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _hash_values(df[col].to_numpy()).astype(np.int64)
        d = pd.DataFrame({key: df[key], "_h": h}).drop_duplicates()
        return d.sort_values([key, "_h"], kind="stable") \
            .groupby(key, sort=False).head(k)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                key: pd.Series([], dtype=df[key].dtype),
                out_col: pd.Series([], dtype="int64"),
            })
        kept = (df.drop_duplicates()
                .sort_values([key, "_h"], kind="stable")
                .groupby(key, sort=False).head(k))
        g = kept.groupby(key, sort=False)["_h"]
        nd = g.size().to_numpy(dtype=np.int64)
        hk = g.max().to_numpy(dtype=np.float64)   # k-th smallest iff nd==k
        est = np.where(nd < k, nd.astype(np.float64),
                       round_half_away((k - 1) * _M / hk))
        return pd.DataFrame({key: g.size().index.to_numpy(),
                             out_col: est.astype(np.int64)})

    parts = ds.select_columns([key, col]).map_batches(
        partial, batch_format="pandas")
    return _keyed(parts, [key], cfg, _meta_rows(ds)).map_batches(
        final, batch_format="pandas", batch_size=None)


def kmv_quantiles(ds, *, key: str, col: str, id_col: str,
                  qs: list[float], m: int = 256,
                  cfg: EngineConfig = DEFAULT_CONFIG):
    """Approximate discrete quantiles of ``col`` per ``key`` group from
    a deterministic bottom-m row sample (see module docstring).
    Output (key, q DOUBLE, value) — ``value`` keeps ``col``'s dtype and
    is an ACTUAL group element (quantile_disc semantics: the sorted
    sample element at 0-based index ceil(q*n) - 1), so no float
    arithmetic enters the result and parity is bit-exact.

    Shape: per-batch combiner keeps the m rows with the smallest
    (hash(id), id) per in-block key — rows live in exactly one block,
    so partials are disjoint and re-taking the m smallest after ONE
    keyed shuffle reconstructs the global sample exactly.  NULL values
    of ``col`` are excluded (matching SQL aggregate semantics); ids are
    assumed non-negative and unique (the hash_bucket contract)."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    qs = sorted(qs)
    from .relational import _keyed, _meta_rows
    from .sample import _hash_values

    def bottom_m(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values([key, "_h", "_id"], kind="stable")
                .groupby(key, sort=False).head(m))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df[col].notna()]
        h = _hash_values(d[id_col].to_numpy()).astype(np.int64)
        p = pd.DataFrame({key: d[key].to_numpy(), "_h": h,
                          "_id": d[id_col].to_numpy(),
                          col: d[col].to_numpy()})
        return bottom_m(p)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: df[key],
                                 "q": pd.Series([], dtype="float64"),
                                 "value": df[col]})
        kept = bottom_m(df)
        out_k, out_q, out_v = [], [], []
        for kval, g in kept.groupby(key, sort=False):
            v = np.sort(g[col].to_numpy())
            n = len(v)
            for q in qs:
                out_k.append(kval)
                out_q.append(q)
                out_v.append(v[max(int(np.ceil(q * n)), 1) - 1])
        return pd.DataFrame({
            key: np.asarray(out_k),
            "q": np.asarray(out_q, dtype=np.float64),
            "value": np.asarray(out_v, dtype=df[col].dtype)})

    parts = ds.select_columns([key, col, id_col]).map_batches(
        partial, batch_format="pandas")
    return _keyed(parts, [key], cfg, _meta_rows(ds)).map_batches(
        final, batch_format="pandas", batch_size=None)


def _kmv_sketch(ds, col: str, k: int) -> np.ndarray:
    """Distributed KMV sketch of a column: per-batch combiner keeps the
    k smallest distinct hashes, the driver merges <= k*nblocks ints —
    BOUNDED driver state (k is 64..1024), never the values."""
    from .sample import _hash_values

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(_hash_values(df[col].to_numpy()).astype(np.int64))
        return pd.DataFrame({"_h": h[:k]})

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    u = np.unique(parts["_h"].to_numpy())
    return u[:k]


def _kmv_est(s: np.ndarray, k: int) -> float:
    from ..util import round_half_away

    if len(s) < k:
        return float(len(s))
    return float(round_half_away((k - 1) * _M / float(s[k - 1])))


def kmv_overlap(ds_a, ds_b, *, col: str, k: int = 256) -> pd.DataFrame:
    """Set-overlap estimation between two datasets WITHOUT a join —
    KMV sketch algebra [Beyer et al. 2007, "On synopses for distinct-
    value estimation under multiset operations"]:

        union sketch  = k smallest of (S_a ∪ S_b)
        jaccard      ~= |union sketch ∩ S_a ∩ S_b| / |union sketch|
        intersection ~= jaccard * est(union)

    One-row output (est_distinct_a, est_distinct_b, est_union,
    est_intersection, jaccard) — e.g. estimate the benchmark-vs-corpus
    n-gram contamination rate from two bounded sketches instead of the
    exact digest semi-join (ops/contamination.py): each side is one
    combiner-reduced pass, nothing input-sized moves or lands anywhere.
    Deterministic (fixed hash, no RNG) and exactly SQL-replayable,
    like kmv_distinct."""
    from ..util import round_half_away

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    sa = _kmv_sketch(ds_a, col, k)
    sb = _kmv_sketch(ds_b, col, k)
    union = np.unique(np.concatenate([sa, sb]))[:k]
    est_a, est_b, est_u = (_kmv_est(s, k) for s in (sa, sb, union))
    in_both = np.isin(union, sa) & np.isin(union, sb)
    jr = float(in_both.sum()) / len(union) if len(union) else 0.0
    return pd.DataFrame({
        "est_distinct_a": pd.array([int(est_a)], dtype="int64"),
        "est_distinct_b": pd.array([int(est_b)], dtype="int64"),
        "est_union": pd.array([int(est_u)], dtype="int64"),
        "est_intersection": pd.array(
            [int(round_half_away(jr * est_u))], dtype="int64"),
        "jaccard": pd.array([float(round_half_away(jr, 6))],
                            dtype="float64"),
    })


# --------------------------------------------------------------------------
# HyperLogLog distinct sketch
# --------------------------------------------------------------------------

#: bias-correction constant alpha_m for m = 64 [Flajolet et al. 2007]
_HLL_ALPHA_64 = 0.709


def _hll_rank(w: np.ndarray, field_bits: int) -> np.ndarray:
    """rank(w) = leading zeros of w in a field_bits-wide field, + 1 =
    field_bits + 1 - bitlength(w).  Exact integer bit lengths via the
    frexp exponent (exact for any integer < 2^53)."""
    bl = np.zeros(len(w), dtype=np.int64)
    nz = w > 0
    if nz.any():
        bl[nz] = np.frexp(w[nz].astype(np.float64))[1]
    return field_bits + 1 - bl


def _hll_estimate(s: np.ndarray, v: np.ndarray, m: int,
                  field_bits: int) -> np.ndarray:
    """Flajolet estimator from the integer harmonic sum ``s`` (in units
    of 2^-R, R = field_bits + 1) and the empty-register count ``v``.
    Every float expression here is mirrored verbatim in the SQL
    oracle, so keep the operation ORDER stable."""
    two32 = 4294967296.0
    const = _HLL_ALPHA_64 * float(m) * float(m) * float(2 ** (field_bits + 1))
    raw = const / s.astype(np.float64)
    est = raw.copy()
    small = (raw <= 2.5 * m) & (v > 0)
    if small.any():
        est[small] = float(m) * np.log(float(m) / v[small].astype(np.float64))
    large = ~small & (raw > two32 / 30.0)
    if large.any():
        est[large] = -two32 * np.log(1.0 - raw[large] / two32)
    return est


def hll_distinct(ds, *, key: str, col: str, p: int = 6,
                 out_col: str = "approx_distinct",
                 cfg: EngineConfig = DEFAULT_CONFIG):
    """Approximate count-distinct of ``col`` per ``key`` group via a
    HyperLogLog register table (m = 2^p registers, p defaults to 6 for
    the SQL-replay test budget; use 11+ for ~2% error at corpus
    scale).  Output (key, out_col BIGINT).

    Shape: per-batch combiner folds each block to its per-key register
    maxima (<= m rows per block-key); keyed_reduce(max) on (key,
    register) merges partials with ONE keyed shuffle; a second bounded
    keyed_sum folds each key's <= m register rows into the integer
    harmonic-sum partials; the finalize is a per-row map.  Values
    hash through the engine's fixed deterministic map (ops/sample),
    so the registers — and hence the estimate — are a pure function
    of the value SET: repartition-invariant, merge-order-invariant,
    and replayed bit-for-bit by the DuckDB oracle."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in 4..16, got {p}")
    if p != 6:
        raise ValueError("alpha is tabulated for p=6 (m=64) only; "
                         "extend _HLL_ALPHA before raising p")
    m = 1 << p
    field_bits = 32 - p
    rmax = field_bits + 1
    from .relational import _meta_rows, keyed_reduce, keyed_sum
    from .sample import _hash_values
    from ..util import round_half_away

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _hash_values(df[col].to_numpy()).astype(np.int64)
        d = pd.DataFrame({key: df[key].to_numpy(),
                          "_j": h % m,
                          "_r": _hll_rank(h // m, field_bits)})
        return (d.groupby([key, "_j"], sort=False)["_r"]
                .max().reset_index())

    regs = keyed_reduce(
        ds.select_columns([key, col]).map_batches(
            partial, batch_format="pandas"),
        [key, "_j"], ["_r"], how="max", cfg=cfg, n_rows=_meta_rows(ds))

    def to_terms(df: pd.DataFrame) -> pd.DataFrame:
        # integer harmonic-sum term 2^(R - M_j) <= 2^R; summed over m
        # registers this stays far under int64
        return pd.DataFrame({
            key: df[key].to_numpy(),
            "_s": np.left_shift(
                np.int64(1), rmax - df["_r"].to_numpy(np.int64)),
            "_n": np.ones(len(df), dtype=np.int64)})

    sums = keyed_sum(regs.map_batches(to_terms, batch_format="pandas"),
                     [key], ["_s", "_n"], cfg=cfg)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                key: df[key],
                out_col: pd.Series([], dtype="int64")})
        npresent = df["_n"].to_numpy(np.int64)
        v = m - npresent                       # empty (zero) registers
        s = df["_s"].to_numpy(np.int64) + v * (1 << rmax)
        est = _hll_estimate(s, v, m, field_bits)
        return pd.DataFrame({
            key: df[key].to_numpy(),
            out_col: round_half_away(est).astype(np.int64)})

    return sums.map_batches(final, batch_format="pandas")


# --------------------------------------------------------------------------
# Count-Min frequency sketch
# --------------------------------------------------------------------------

_CM_P = 2147483647                                  # Mersenne 2^31 - 1
# fixed pairwise-independent hash constants a_i < 2^31, b_i < p; with
# h(x) < 2^32 the products stay under 2^63, so int64 (and DuckDB
# BIGINT) arithmetic is exact on both sides
_CM_A = (892314517, 105891749, 537912851, 1419871283)
_CM_B = (330563033, 726012389, 1117280551, 193847297)


def _cm_cell(hv: np.ndarray, i: int, w: int) -> np.ndarray:
    return ((_CM_A[i] * hv + _CM_B[i]) % _CM_P) % w


def cm_table(ds, *, col: str, d: int = 4, w: int = 1024,
             cfg: EngineConfig = DEFAULT_CONFIG):
    """Distributed Count-Min counter table of ``col``: Dataset
    (row_i, cell, cnt) with at most d*w rows (absent cells are zero).

    Shape: the per-batch partial bincounts each row's cells WITHIN the
    block (<= d*w partial rows leave a block of any size), then
    keyed_sum merges — cell-wise addition is the CM merge rule, so the
    table for a union of corpora is the sum of their tables and a
    persisted table can absorb new shards without touching old data."""
    if not 1 <= d <= len(_CM_A):
        raise ValueError(f"d must be in 1..{len(_CM_A)}, got {d}")
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    from .relational import keyed_sum
    from .sample import _hash_values

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hv = _hash_values(df[col].to_numpy()).astype(np.int64)
        out = []
        for i in range(d):
            cnt = np.bincount(_cm_cell(hv, i, w), minlength=w)
            nz = np.nonzero(cnt)[0]
            out.append(pd.DataFrame({
                "row_i": np.full(len(nz), i, dtype=np.int64),
                "cell": nz.astype(np.int64),
                "cnt": cnt[nz].astype(np.int64),
            }))
        return pd.concat(out, ignore_index=True)

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pandas")
    return keyed_sum(parts, ["row_i", "cell"], ["cnt"], cfg=cfg)


def cm_frequencies(ds, *, col: str, d: int = 4, w: int = 1024,
                   out_col: str = "approx_count",
                   cfg: EngineConfig = DEFAULT_CONFIG):
    """Approximate frequency of every DISTINCT value of ``col`` from a
    Count-Min sketch: (col, out_col BIGINT), where out_col >= the true
    count and <= true + (e/w)*n with probability 1 - e^-d.

    The d x w table (<= 8*d*w bytes — 32 KiB at the defaults) is
    collected to the driver and closure-shipped into the estimate
    stage, the same bounded-state pattern as _kmv_sketch; candidates
    come from a per-block distinct combiner + ONE keyed shuffle, so
    nothing input-sized lands anywhere."""
    from .relational import _keyed, _meta_rows
    from .sample import _hash_values

    cells = cm_table(ds, col=col, d=d, w=w, cfg=cfg).to_pandas()
    lut = np.zeros((d, w), dtype=np.int64)
    lut[cells["row_i"].to_numpy(), cells["cell"].to_numpy()] = \
        cells["cnt"].to_numpy()

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    cand = _keyed(
        ds.select_columns([col]).map_batches(dedup, batch_format="pandas"),
        [col], cfg, _meta_rows(ds),
    ).map_batches(dedup, batch_format="pandas", batch_size=None)

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        hv = _hash_values(df[col].to_numpy()).astype(np.int64)
        est = np.full(len(df), np.iinfo(np.int64).max, dtype=np.int64)
        for i in range(d):
            est = np.minimum(est, lut[i, _cm_cell(hv, i, w)])
        return pd.DataFrame({col: df[col].to_numpy(),
                             out_col: est})

    return cand.map_batches(estimate, batch_format="pandas")


# --------------------------------------------------------------------------
# Bloom filter (broadcast membership pre-filter)
# --------------------------------------------------------------------------


def bloom_build(ds, *, col: str, m_bits: int = 1 << 16, k: int = 3,
                cfg: EngineConfig = DEFAULT_CONFIG) -> np.ndarray:
    """Distributed Bloom-filter build [Bloom 1970] over ``col``:
    packed uint8 bitmap of ``m_bits`` bits, value x setting bits
    ((a_i*h(x) + b_i) mod p) mod m for i < k (the CM hash family —
    deterministic, no RNG, SQL-replayable in BIGINT arithmetic).

    Shape: each block emits its DISTINCT bit positions (<= min(k *
    distinct-in-block, m) rows of one int64); the driver ORs them into
    the bitmap — bounded state like _kmv_sketch, never the values.
    A bit-miss is an EXACT negative; a bit-hit is a maybe with FP rate
    ~(1 - e^(-k*n/m))^k, so the filter pre-gates an exact join, it
    does not replace one."""
    if not 1 <= k <= len(_CM_A):
        raise ValueError(f"k must be in 1..{len(_CM_A)}, got {k}")
    if m_bits < 8:
        raise ValueError(f"m_bits must be >= 8, got {m_bits}")
    from .sample import _hash_values

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hv = np.unique(_hash_values(df[col].to_numpy()).astype(np.int64))
        pos = np.unique(np.concatenate(
            [_cm_cell(hv, i, m_bits) for i in range(k)]
            or [np.zeros(0, dtype=np.int64)]))
        return pd.DataFrame({"_pos": pos})

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    bitmap = np.zeros(m_bits // 8 + (m_bits % 8 > 0), dtype=np.uint8)
    pos = parts["_pos"].to_numpy()
    np.bitwise_or.at(bitmap, pos // 8,
                     np.left_shift(1, (pos % 8)).astype(np.uint8))
    return bitmap


def bloom_maybe_contains(ds, bitmap: np.ndarray, *, col: str, k: int = 3,
                         out_col: str = "bloom_maybe"):
    """Append a bool column: True iff ``col``'s value hits ALL k Bloom
    bits (present or a deterministic false positive), False = exactly
    absent from the build set.  The bitmap is fixed-size (m/8 bytes,
    independent of data volume), so closure-shipping it into the map
    stage is scale-safe — this is the broadcast side of a Bloom-gated
    semi/anti join: only maybe-rows proceed to the exact check."""
    if not 1 <= k <= len(_CM_A):
        raise ValueError(f"k must be in 1..{len(_CM_A)}, got {k}")
    from .sample import _hash_values

    m_bits = len(bitmap) * 8
    cols = list(ds.schema().names)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        out = df[cols].copy()
        hv = _hash_values(df[col].to_numpy()).astype(np.int64)
        hit = np.ones(len(df), dtype=bool)
        for i in range(k):
            pos = _cm_cell(hv, i, m_bits)
            hit &= (bitmap[pos // 8]
                    & np.left_shift(1, (pos % 8)).astype(np.uint8)) != 0
        out[out_col] = hit
        return out

    return ds.map_batches(probe, batch_format="pandas")
