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
