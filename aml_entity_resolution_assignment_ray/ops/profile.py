"""Dataset profiling and categorical-mode aggregates.

The data-quality staples of a training-data pipeline the reference's
SQL surface lacks: a one-pass per-column profile (row/NULL counts,
min/max, exact integer sums — the "describe" you run before trusting a
new 100-TB drop) and the per-group most-frequent value (dominant
language per source, dominant event type per user).

Scale shape:

* dataset_profile — each block folds to ONE tiny row per profiled
  column (a pure combiner), so the driver-side final fold sees
  #blocks x #columns rows — bounded state, no shuffle at all.  There
  is deliberately NO float accumulation anywhere: integer sums are
  exact and layout-invariant, min/max are order-free, float columns
  get min/max but no sum (a distributed float sum is layout-dependent;
  callers that need one convert to integer cents first, like the rest
  of the engine).
* grouped_mode — per-block (key, value) partial counts (shuffle volume
  bounded by the DISTINCT pair count, not rows), ONE hash repartition
  on the key alone (which also makes every (key, value) group
  block-complete), then a vectorized per-block count-sum + argmax with
  the deterministic tie-break (highest count, then smallest value) so
  the result is total-order stable and SQL-replayable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import DEFAULT_CONFIG, EngineConfig

_STAT_COLS = ["column", "n_rows", "n_null", "min_num", "max_num",
              "sum_int", "min_str", "max_str"]


def dataset_profile(ds, *, int_cols: list[str] = (),
                    float_cols: list[str] = (),
                    str_cols: list[str] = (),
                    cfg: EngineConfig = DEFAULT_CONFIG):
    """One row per profiled column: (column, n_rows, n_null, min_num,
    max_num, sum_int, min_str, max_str).  Numeric stats are NULL for
    string columns and vice versa; ``sum_int`` is NULL for float
    columns (see module docstring — no distributed float accumulation).

    int/float mins and maxes are reported as float64: exact for any
    float, and for int64 magnitudes below 2^53 (the engine's id/cents
    domain); the SUM stays int64 end to end."""
    int_cols, float_cols = list(int_cols), list(float_cols)
    str_cols = list(str_cols)
    cols = int_cols + float_cols + str_cols
    if not cols:
        raise ValueError("dataset_profile: no columns requested")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = {c: [] for c in _STAT_COLS}
        for c in cols:
            s = df[c]
            nn = int(s.isna().sum())
            v = s.dropna()
            out["column"].append(c)
            out["n_rows"].append(len(s))
            out["n_null"].append(nn)
            if c in str_cols:
                out["min_num"].append(np.nan)
                out["max_num"].append(np.nan)
                # sum_int is int64 end to end (0 = empty partial, the
                # sum identity) so an empty or all-null block can never
                # promote the column to float64 mid-fold; non-int
                # columns get their sum NULLed once, in the final fold
                out["sum_int"].append(0)
                out["min_str"].append(v.min() if len(v) else None)
                out["max_str"].append(v.max() if len(v) else None)
            else:
                a = v.to_numpy()
                out["min_num"].append(float(a.min()) if len(a) else np.nan)
                out["max_num"].append(float(a.max()) if len(a) else np.nan)
                out["sum_int"].append(
                    int(a.sum()) if c in int_cols and len(a) else 0)
                out["min_str"].append(None)
                out["max_str"].append(None)
        d = pd.DataFrame(out)
        d["n_rows"] = d["n_rows"].astype(np.int64)
        d["n_null"] = d["n_null"].astype(np.int64)
        d["sum_int"] = d["sum_int"].astype(np.int64)
        return d

    def fold(d: pd.DataFrame) -> pd.DataFrame:
        if not len(d):
            return d[_STAT_COLS]
        g = d.groupby("column", sort=True, dropna=False)
        out = pd.DataFrame({
            "n_rows": g["n_rows"].sum().astype(np.int64),
            "n_null": g["n_null"].sum().astype(np.int64),
            "min_num": g["min_num"].min(),
            "max_num": g["max_num"].max(),
            "sum_int": g["sum_int"].sum(),  # exact: int64 end to end
            "min_str": g["min_str"].min(),
            "max_str": g["max_str"].max(),
        }).reset_index()
        if float_cols or str_cols:
            # NULL the sum for columns where it is not defined (this
            # promotes sum_int to float64 — only in mixed profiles; a
            # pure-int profile keeps the exact int64 column)
            out.loc[out["column"].isin([*float_cols, *str_cols]),
                    "sum_int"] = np.nan
        return out[_STAT_COLS]

    parts = ds.map_batches(partial, batch_format="pandas")
    # final fold on one block: #blocks x #columns rows, bounded state
    return parts.repartition(1).map_batches(
        fold, batch_format="pandas", batch_size=None)


def grouped_mode(ds, *, key: str, col: str,
                 cfg: EngineConfig = DEFAULT_CONFIG,
                 n_rows: int | None = None):
    """Per-key most frequent ``col`` value: (key, mode_value, n) with
    n = the winning value's count.  Ties break to the SMALLEST value
    (string order) so the answer is deterministic and matches the SQL
    ``row_number() OVER (ORDER BY count DESC, value ASC)`` replay."""
    from .relational import _keyed

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.groupby([key, col], sort=False, dropna=False).size() \
            .rename("n").reset_index()
        d["n"] = d["n"].astype(np.int64)
        return d

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: df.get(key, pd.Series(dtype=object)),
                                 "mode_value": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})[
                [key, "mode_value", "n"]]
        d = df.groupby([key, col], sort=False, dropna=False)["n"] \
            .sum().reset_index()
        # highest count first, then smallest value: first row per key
        # after this sort IS the mode
        d = d.sort_values([key, "n", col], ascending=[True, False, True],
                          kind="stable")
        top = d.drop_duplicates(subset=[key], keep="first")
        return pd.DataFrame({key: top[key],
                             "mode_value": top[col],
                             "n": top["n"].astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pandas")
    return _keyed(parts, [key], cfg, n_rows).map_batches(
        pick, batch_format="pandas", batch_size=None)


def binned_histogram(ds, *, col: str, bin_width: int,
                     cfg: EngineConfig = DEFAULT_CONFIG):
    """Fixed-width histogram over an INTEGER column: bin = col // width
    (floor division), output (bin, lo, hi, n) with [lo, hi) edges.
    Empty bins are absent (sparse form) — at 100 TB the bin domain of
    a skewed column is unknowable up front, so the sparse form is the
    one that streams.

    Per-block ``bincount`` partials (one row per OCCUPIED bin per
    block) -> keyed_sum on the bin id; shuffle volume is bounded by
    #blocks x #occupied-bins, never rows.  Integer edges and counts —
    exact, layout-invariant."""
    from .relational import keyed_sum

    if bin_width <= 0:
        raise ValueError("binned_histogram: bin_width must be positive")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df[col].to_numpy(dtype=np.int64) // bin_width
        bins, counts = np.unique(b, return_counts=True)
        return pd.DataFrame({"bin": bins,
                             "n": counts.astype(np.int64)})

    hist = keyed_sum(ds.map_batches(partial, batch_format="pandas"),
                     ["bin"], ["n"], cfg=cfg)

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        b = df["bin"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"bin": b, "lo": b * bin_width,
                             "hi": (b + 1) * bin_width,
                             "n": df["n"].to_numpy(dtype=np.int64)})

    return hist.map_batches(edges, batch_format="pandas")


def grouped_distinct_count(ds, *, key: str, col: str,
                           cfg: EngineConfig = DEFAULT_CONFIG,
                           n_rows: int | None = None):
    """EXACT per-key distinct count of ``col`` — the exact sibling of
    the KMV sketch (ops/sketch.grouped_approx_distinct): use this when
    per-key distinct cardinality is bounded (users per hour), the
    sketch when it is not (tokens per corpus).

    Per-block drop_duplicates partial (shuffle volume bounded by the
    DISTINCT (key, value) pair count per block, never rows), ONE hash
    repartition on the key, per-block final dedup + size."""
    from .relational import _keyed

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, col]].drop_duplicates()

    def count(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: df.get(key, pd.Series(dtype=object)),
                                 "n_distinct": pd.Series(dtype=np.int64)})[
                [key, "n_distinct"]]
        d = df.drop_duplicates().groupby(key, sort=False).size() \
            .rename("n_distinct").reset_index()
        d["n_distinct"] = d["n_distinct"].astype(np.int64)
        return d

    parts = ds.map_batches(partial, batch_format="pandas")
    return _keyed(parts, [key], cfg, n_rows).map_batches(
        count, batch_format="pandas", batch_size=None)


def grouped_entropy(ds, *, key: str, col: str, round_to: int = 6,
                    cfg: EngineConfig = DEFAULT_CONFIG,
                    n_rows: int | None = None):
    """Shannon entropy (nats) of the ``col`` distribution per key —
    the class-balance / diversity score of a training mix.  (key,
    value) partial counts per block, ONE hash repartition on the key,
    vectorized -sum(p ln p) per block; counts are exact integers so
    the only float step is the final entropy expression (summed in
    sorted value order, then rounded — SQL-replayable)."""
    from .relational import _keyed

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.groupby([key, col], sort=False).size() \
            .rename("n").reset_index()
        d["n"] = d["n"].astype(np.int64)
        return d

    def ent(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: df.get(key, pd.Series(dtype=object)),
                                 "entropy": pd.Series(dtype=np.float64)})[
                [key, "entropy"]]
        d = df.groupby([key, col], sort=False)["n"].sum().reset_index()
        d = d.sort_values([key, col], kind="stable")
        tot = d.groupby(key, sort=False)["n"].transform("sum") \
            .to_numpy(np.float64)
        p = d["n"].to_numpy(np.float64) / tot
        d["_h"] = -p * np.log(p)
        out = d.groupby(key, sort=False)["_h"].sum().reset_index()
        return pd.DataFrame({key: out[key],
                             "entropy": np.round(out["_h"].to_numpy(),
                                                 round_to)})

    parts = ds.map_batches(partial, batch_format="pandas")
    return _keyed(parts, [key], cfg, n_rows).map_batches(
        ent, batch_format="pandas", batch_size=None)


def mad_outliers(ds, *, key: str, col: str, mult: int = 3,
                 cfg: EngineConfig = DEFAULT_CONFIG,
                 n_rows: int | None = None):
    """Robust per-group outlier flags via Median Absolute Deviation:
    med = discrete median of ``col`` within the key, mad = discrete
    median of |x - med|, outlier when |x - med| > mult * mad — the
    quality gate that survives heavy tails where mean/std z-scores
    drown (``col`` must be integer, so every comparison is exact).

    ONE hash shuffle on the key, then both medians and the flags are
    computed inside the block (key groups are block-complete);
    discrete-median semantics match DuckDB ``quantile_disc(0.5)``
    (the sorted element at ceil(n/2) - 1 — pandas interpolation
    'lower' at q=0.5)."""
    from .relational import _keyed

    def block(df: pd.DataFrame) -> pd.DataFrame:
        d = df.copy()
        if not len(d):
            for c in ("med", "mad"):
                d[c] = pd.Series([], dtype=np.int64)
            d["is_outlier"] = pd.Series([], dtype=np.int64)
            return d
        med = d.groupby(key, sort=False)[col] \
            .quantile(0.5, interpolation="lower")  # C path, no per-group UDF
        d["med"] = d[key].map(med).astype(np.int64)
        d["_ad"] = (d[col] - d["med"]).abs().astype(np.int64)
        mad = d.groupby(key, sort=False)["_ad"] \
            .quantile(0.5, interpolation="lower")
        d["mad"] = d[key].map(mad).astype(np.int64)
        d["is_outlier"] = (d["_ad"] > mult * d["mad"]).astype(np.int64)
        return d.drop(columns=["_ad"])

    return _keyed(ds, [key], cfg, n_rows).map_batches(
        block, batch_format="pandas", batch_size=None)


def grouped_ols(ds, *, key: str, x_col: str, y_col: str,
                cfg: EngineConfig = DEFAULT_CONFIG,
                n_rows: int | None = None):
    """Per-group simple linear regression of ``y_col`` on ``x_col``
    (slope / intercept / r2) via EXACT integer sufficient statistics —
    the distributed ``regr_slope`` family, done so the float outputs
    are bit-reproducible and SQL-replayable.

    Scale shape: each block folds to ONE (n, Sx, Sy, Sxx, Syy, Sxy)
    row per key (a pure combiner — keyed_sum's shuffle volume is
    #blocks x #keys, never rows), then the closed form runs per group:

        slope     = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
        intercept = (Sy - slope*Sx) / n
        r2        = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2)(n*Syy - Sy^2))

    Both columns must already be int64 (cents-scale metrics, like the
    rest of the engine), so every sum is exact and layout-invariant.
    The finalize step promotes the int64 sums to arbitrary-precision
    Python ints, so n*Sxy etc. cannot overflow; the ONLY float steps
    are one cast of each exact numerator/denominator to float64 and
    one IEEE-754 op per output — the same expression a DuckDB oracle
    evaluates as CAST(a AS DOUBLE) / CAST(b AS DOUBLE) from identical
    HUGEINT sums, so engine and oracle agree bit-for-bit.  Per-block
    int64 partials bound Sy^2 within int64 per block-key (|y| <= 1e6
    cents holds to ~10^6 rows per block-key; repartition finer past
    that).  Groups with zero x-variance return NaN for all three.
    The per-group Python finalize loop is bounded by key cardinality
    (one row per group post-aggregate), never by input rows.
    """
    from .relational import keyed_sum

    stat_cols = ["n", "sx", "sy", "sxx", "syy", "sxy"]

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(np.int64)
        y = df[y_col].to_numpy(np.int64)
        return pd.DataFrame({
            key: df[key],
            "n": np.ones(len(df), dtype=np.int64),
            "sx": x, "sy": y,
            "sxx": x * x, "syy": y * y, "sxy": x * y,
        })

    stats = keyed_sum(ds.map_batches(expand, batch_format="pandas"),
                      [key], stat_cols, cfg, n_rows)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: df.get(key, pd.Series(dtype=object)),
                                 "slope": pd.Series(dtype=np.float64),
                                 "intercept": pd.Series(dtype=np.float64),
                                 "r2": pd.Series(dtype=np.float64)})[
                [key, "slope", "intercept", "r2"]]
        slope = np.empty(len(df), dtype=np.float64)
        intercept = np.empty(len(df), dtype=np.float64)
        r2 = np.empty(len(df), dtype=np.float64)
        cols = [df[c].to_numpy() for c in stat_cols]
        for i, (n, sx, sy, sxx, syy, sxy) in enumerate(zip(*cols)):
            # exact big-int arithmetic; floats only at the last step
            n, sx, sy, sxx, syy, sxy = (
                int(n), int(sx), int(sy), int(sxx), int(syy), int(sxy))
            num = n * sxy - sx * sy
            dx = n * sxx - sx * sx
            dy = n * syy - sy * sy
            if dx == 0 or n == 0:
                slope[i] = intercept[i] = r2[i] = np.nan
                continue
            slope[i] = float(num) / float(dx)
            intercept[i] = (float(sy) - slope[i] * float(sx)) / float(n)
            r2[i] = float(num * num) / float(dx * dy) if dy else np.nan
        return pd.DataFrame({key: df[key], "slope": slope,
                             "intercept": intercept, "r2": r2})

    return stats.map_batches(finalize, batch_format="pandas",
                             batch_size=None)


def categorical_mi(ds, *, col_a: str, col_b: str, round_to: int = 6,
                   cfg: EngineConfig = DEFAULT_CONFIG,
                   n_rows: int | None = None):
    """Mutual information (nats) between two categorical columns —
    the feature-relevance / redundancy score of a training mix (is
    `source` informative about `language`?).  Returns ONE row
    (mi, n_rows).

    Per-block (a, b) partial counts (the combiner bounds shuffle
    volume by the DISTINCT pair count, never rows), one keyed_sum,
    then the contingency table — bounded by |A| x |B| CELLS — gathers
    to a single block for the closed form.  All counts are exact
    integers; like grouped_entropy, the only float steps are the final
    per-cell expression p_ab * ln(n_ab*N / (n_a*n_b)) (each operand an
    exact integer cast to float64) summed in sorted (a, b) order and
    rounded, which the SQL oracle replays.  ``n_ab * N`` must fit
    int64 (N <= ~3e9); at true corpus scale MI runs over a sample
    anyway."""
    from .relational import keyed_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.groupby([col_a, col_b], sort=False).size() \
            .rename("n").reset_index()
        d["n"] = d["n"].astype(np.int64)
        return d

    cells = keyed_sum(ds.map_batches(partial, batch_format="pandas"),
                      [col_a, col_b], ["n"], cfg, n_rows).repartition(1)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"mi": pd.Series(dtype=np.float64),
                                 "n_rows": pd.Series(dtype=np.int64)})
        d = df.groupby([col_a, col_b], sort=False)["n"].sum().reset_index()
        d = d.sort_values([col_a, col_b], kind="stable")
        n = d["n"].to_numpy(np.int64)
        N = int(n.sum())
        na = d.groupby(col_a, sort=False)["n"].transform("sum") \
            .to_numpy(np.int64)
        nb = d.groupby(col_b, sort=False)["n"].transform("sum") \
            .to_numpy(np.int64)
        p = n.astype(np.float64) / np.float64(N)
        ratio = (n * N).astype(np.float64) / (na * nb).astype(np.float64)
        mi = float(np.round((p * np.log(ratio)).sum(), round_to))
        return pd.DataFrame({"mi": [mi],
                             "n_rows": np.array([N], dtype=np.int64)})

    return cells.map_batches(final, batch_format="pandas",
                             batch_size=None)


def cooccurrence_jaccard(ds, *, set_col: str, item_col: str,
                         cfg: EngineConfig = DEFAULT_CONFIG,
                         n_rows: int | None = None):
    """Pairwise Jaccard similarity between ``item_col`` values by the
    overlap of their ``set_col`` sets (e.g. event types by the users
    who perform them, sources by the documents they share, tags by
    co-tagged items) -> Dataset of (item_a, item_b, n_a, n_b,
    n_common, jaccard) over pairs with at least one common set member,
    item_a < item_b.

    Shape: (1) distinct (set, item) pairs — per-block dedup combiner,
    ONE keyed shuffle, final dedup; (2) per-item set sizes — keyed_sum
    of ones; (3) intersections — repartition on set_col co-locates
    each set's items, a block-local self-merge emits ordered item
    pairs, keyed_sum folds counts; (4) sizes attach via two hash
    joins on the item columns.  Exact integers throughout; the one
    float is the final n_common / (n_a + n_b - n_common) division —
    deterministic and replayed exactly by SQL.

    Scale contract: the self-merge is O(k^2) per set member where k is
    the member's ITEM count — bounded by the item domain, which is
    also what bounds the O(|items|^2) output.  This operator is for
    categorical domains (event types, sources, languages), not for
    unbounded id-vs-id similarity — that's MinHash/LSH territory
    (ops/dedup)."""
    from ..util import safe_join
    from .relational import _keyed, keyed_sum

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            set_col: df[set_col],
            item_col: df[item_col],
        }).drop_duplicates()

    pairs = _keyed(
        ds.select_columns([set_col, item_col]).map_batches(
            dedup, batch_format="pandas"),
        [set_col, item_col], cfg, n_rows,
    ).map_batches(dedup, batch_format="pandas", batch_size=None) \
        .materialize()

    sizes = keyed_sum(
        pairs.map_batches(
            lambda d: pd.DataFrame({
                item_col: d[item_col],
                "_n": np.ones(len(d), dtype=np.int64)}),
            batch_format="pandas"),
        [item_col], ["_n"], cfg=cfg).materialize()

    def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on=set_col, suffixes=("_a", "_b"))
        m = m[m[f"{item_col}_a"] < m[f"{item_col}_b"]]
        return pd.DataFrame({
            "item_a": m[f"{item_col}_a"].to_numpy(),
            "item_b": m[f"{item_col}_b"].to_numpy(),
            "n_common": np.ones(len(m), dtype=np.int64)})

    inter = keyed_sum(
        _keyed(pairs, [set_col], cfg, None).map_batches(
            emit_pairs, batch_format="pandas", batch_size=None),
        ["item_a", "item_b"], ["n_common"], cfg=cfg)

    nparts = cfg.resolve_join_partitions()
    sa = sizes.map_batches(
        lambda d: pd.DataFrame({"item_a": d[item_col],
                                "n_a": d["_n"].astype(np.int64)}),
        batch_format="pandas")
    sb = sizes.map_batches(
        lambda d: pd.DataFrame({"item_b": d[item_col],
                                "n_b": d["_n"].astype(np.int64)}),
        batch_format="pandas")
    j = safe_join(safe_join(inter, sa, join_type="inner",
                            num_partitions=nparts, on=("item_a",)),
                  sb, join_type="inner", num_partitions=nparts,
                  on=("item_b",))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        c = df["n_common"].to_numpy(np.int64)
        na = df["n_a"].to_numpy(np.int64)
        nb = df["n_b"].to_numpy(np.int64)
        return pd.DataFrame({
            "item_a": df["item_a"].to_numpy(),
            "item_b": df["item_b"].to_numpy(),
            "n_a": na, "n_b": nb, "n_common": c,
            "jaccard": c.astype(np.float64) / (na + nb - c)})

    return j.map_batches(finalize, batch_format="pandas")


def grouped_corr(ds, *, key: str, x_col: str, y_col: str,
                 cfg: EngineConfig = DEFAULT_CONFIG,
                 n_rows: int | None = None):
    """Per-group Pearson correlation of two int64 columns via EXACT
    integer sufficient statistics — grouped_ols's sibling (same
    combiner, same shuffle shape, same bit-reproducibility argument):

        corr = (n*Sxy - Sx*Sy)
             / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    with every sum exact (int64 per block, arbitrary-precision at
    finalize) and float64 entering ONLY at the final cast / multiply /
    sqrt / divide — the identical expression a DuckDB oracle evaluates
    from HUGEINT sums, so both sides agree bit-for-bit.  Groups where
    either variance is zero return NaN (SQL corr returns NULL)."""
    from .relational import keyed_sum

    stat_cols = ["n", "sx", "sy", "sxx", "syy", "sxy"]

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(np.int64)
        y = df[y_col].to_numpy(np.int64)
        return pd.DataFrame({
            key: df[key],
            "n": np.ones(len(df), dtype=np.int64),
            "sx": x, "sy": y,
            "sxx": x * x, "syy": y * y, "sxy": x * y,
        })

    stats = keyed_sum(ds.map_batches(expand, batch_format="pandas"),
                      [key], stat_cols, cfg, n_rows)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        import math

        if not len(df):
            return pd.DataFrame({key: df.get(key, pd.Series(dtype=object)),
                                 "corr": pd.Series(dtype=np.float64)})[
                [key, "corr"]]
        corr = np.empty(len(df), dtype=np.float64)
        cols = [df[c].to_numpy() for c in stat_cols]
        for i, (n, sx, sy, sxx, syy, sxy) in enumerate(zip(*cols)):
            n, sx, sy, sxx, syy, sxy = (
                int(n), int(sx), int(sy), int(sxx), int(syy), int(sxy))
            num = n * sxy - sx * sy
            dx = n * sxx - sx * sx
            dy = n * syy - sy * sy
            if dx == 0 or dy == 0:
                corr[i] = np.nan
                continue
            corr[i] = float(num) / math.sqrt(float(dx) * float(dy))
        return pd.DataFrame({key: df[key], "corr": corr})

    return stats.map_batches(finalize, batch_format="pandas",
                             batch_size=None)


def population_stability(ds_a, ds_b, *, col: str, round_to: int = 6,
                         cfg: EngineConfig = DEFAULT_CONFIG):
    """Population Stability Index terms between two snapshots of a
    categorical column — the distribution-drift gate a production
    pipeline runs before trusting new data:

        psi_term(c) = (p_a(c) - p_b(c)) * ln(p_a(c) / p_b(c))

    (sum the terms for the headline PSI; > 0.2 conventionally means
    population shift).  Counts are exact integers via one keyed_sum
    per side; the category table is vocabulary-sized, so the p/ln
    finalize runs in ONE block; terms are rounded to ``round_to`` on
    both engine and oracle (the grouped_entropy contract for ln-based
    scores).  Categories present in only ONE snapshot raise — PSI is
    undefined there (infinite term); callers smooth or filter first.
    """
    from ..util import round_half_away
    from .relational import _keyed, keyed_sum

    def count_side(ds, name):
        parts = ds.select_columns([col]).map_batches(
            lambda d: pd.DataFrame({col: d[col].astype(str),
                                    name: np.ones(len(d), np.int64)}),
            batch_format="pandas")
        return keyed_sum(parts, [col], [name], cfg)

    a = count_side(ds_a, "n_a")
    b = count_side(ds_b, "n_b")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({col: pd.Series(dtype=object),
                              "n_a": pd.Series(dtype=np.int64),
                              "n_b": pd.Series(dtype=np.int64),
                              "psi_term": pd.Series(dtype=np.float64)})
        if not len(df):
            return empty
        g = df.groupby(col, sort=False)[["n_a", "n_b"]].sum().reset_index()
        na = g["n_a"].to_numpy(np.int64)
        nb = g["n_b"].to_numpy(np.int64)
        if (na == 0).any() or (nb == 0).any():
            missing = g[col][(na == 0) | (nb == 0)].tolist()
            raise ValueError(
                f"PSI undefined: categories {missing[:5]} present in "
                "only one snapshot — smooth or filter first")
        ta, tb = int(na.sum()), int(nb.sum())
        pa = na / np.float64(ta)
        pb = nb / np.float64(tb)
        term = round_half_away((pa - pb) * np.log(pa / pb), round_to)
        return pd.DataFrame({col: g[col], "n_a": na, "n_b": nb,
                             "psi_term": term})

    # vocabulary-sized: union both sides' counts and fold in one block
    u = a.map_batches(lambda d: d.assign(n_b=np.int64(0)),
                      batch_format="pandas").union(
        b.map_batches(lambda d: d.assign(n_a=np.int64(0))
                      [[col, "n_a", "n_b"]], batch_format="pandas"))
    one = u.map_batches(lambda d: d.assign(_g=np.int64(0)),
                        batch_format="pandas")
    return _keyed(one, ["_g"], cfg, None).map_batches(
        lambda d: finalize(d), batch_format="pandas", batch_size=None)


def equidepth_histogram(ds, *, col: str, nbins: int = 8,
                        cfg: EngineConfig = DEFAULT_CONFIG):
    """Equi-depth (quantile-bucketed) histogram over an INTEGER
    column: boundaries are the EXACT discrete quantiles at i/nbins
    (DuckDB ``quantile_disc`` semantics, the grouped_quantiles
    contract), bucket i = values v with v <= b_i and v > b_{i-1} —
    i.e. the SMALLEST i whose boundary covers v, so duplicate
    boundaries on skewed data leave later buckets empty (absent:
    sparse output, like binned_histogram).  Output (bucket:int64,
    hi, n:int64).

    Prefer dyadic ``nbins`` (8, 16...): i/nbins is then exact in
    binary and the ceil(q*n) index arithmetic cannot straddle a float
    ulp between engines.

    Shape: boundary pass = grouped_quantiles' distinct-value combiner
    (driver sees nbins rows); assignment pass = broadcast searchsorted
    + per-block bincount partials -> ONE keyed_sum on the bucket id."""
    import ray as _ray

    from .relational import grouped_quantiles, keyed_sum

    qs = [i / nbins for i in range(1, nbins + 1)]

    bounds = grouped_quantiles(
        ds.map_batches(
            lambda d: pd.DataFrame({
                "_g": np.zeros(len(d), dtype=np.int64),
                col: d[col].to_numpy(dtype=np.int64)}),
            batch_format="pandas"),
        key="_g", col=col, qs=qs, cfg=cfg).to_pandas()  # nbins rows
    bounds = bounds.sort_values("q").reset_index(drop=True)
    his = bounds["value"].to_numpy(dtype=np.int64)
    bref = _ray.put(his)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hi = _ray.get(bref)
        v = df[col].to_numpy(dtype=np.int64)
        idx = np.searchsorted(hi, v, side="left")  # first hi >= v
        bins, counts = np.unique(idx, return_counts=True)
        return pd.DataFrame({"bucket": bins.astype(np.int64) + 1,
                             "n": counts.astype(np.int64)})

    hist = keyed_sum(ds.map_batches(partial, batch_format="pandas"),
                     ["bucket"], ["n"], cfg=cfg)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        hi = _ray.get(bref)
        b = df["bucket"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"bucket": b, "hi": hi[b - 1],
                             "n": df["n"].to_numpy(dtype=np.int64)})

    return hist.map_batches(attach, batch_format="pandas")


def ks_statistic(ds_a, ds_b, *, col: str,
                 cfg: EngineConfig = DEFAULT_CONFIG):
    """EXACT two-sample Kolmogorov-Smirnov drift statistic over an
    INTEGER column — the distribution-shift check PSI buckets can't
    give you when you need the sup-norm itself: ks = max over values
    of |CDF_a - CDF_b|, reported with the SMALLEST value attaining it.

    Both sides reduce to per-block (value, count) partials (the
    grouped_quantiles combiner: bounded by the distinct-value domain,
    never rows), ONE keyed shuffle merges them, and the CDF scan runs
    in a single final block — the same bounded-domain trade
    grouped_quantiles documents; for continuous unbounded columns,
    quantize upstream.  CDF quotients divide identical exact ints on
    both sides, so the argmax is IEEE-reproducible.  Output one row:
    (ks:float64 rounded 6, at_value:int64, n_a:int64, n_b:int64)."""
    from .relational import keyed_sum

    def counts(side):
        def f(d: pd.DataFrame) -> pd.DataFrame:
            g = (d.groupby(col, sort=False).size()
                 .reset_index(name=side))
            g[col] = g[col].astype(np.int64)
            other = "_cb" if side == "_ca" else "_ca"
            g[other] = np.zeros(len(g), dtype=np.int64)
            return g[[col, "_ca", "_cb"]]
        return f

    parts = (ds_a.select_columns([col])
             .map_batches(counts("_ca"), batch_format="pandas")
             .union(ds_b.select_columns([col])
                    .map_batches(counts("_cb"), batch_format="pandas")))
    merged = keyed_sum(parts, [col], ["_ca", "_cb"], cfg)

    def scan(d: pd.DataFrame) -> pd.DataFrame:
        from ..util import round_half_away

        s = d.sort_values(col, kind="stable")
        ca = s["_ca"].to_numpy(np.int64).cumsum()
        cb = s["_cb"].to_numpy(np.int64).cumsum()
        na, nb = int(ca[-1]), int(cb[-1])
        if na == 0 or nb == 0:
            raise ValueError("ks_statistic: one side is empty")
        diff = np.abs(ca / na - cb / nb)
        i = int(np.argmax(diff))  # first (= smallest value) argmax
        return pd.DataFrame({
            "ks": [float(round_half_away(diff[i], 6))],
            "at_value": np.array([s[col].to_numpy()[i]], np.int64),
            "n_a": np.array([na], np.int64),
            "n_b": np.array([nb], np.int64),
        })

    return merged.repartition(1).map_batches(
        scan, batch_format="pandas", batch_size=None)


def grouped_gini(ds, *, key: str, col: str,
                 cfg: EngineConfig = DEFAULT_CONFIG):
    """Per-group Gini concentration index over an INTEGER column via
    the sorted-scan identity G = (2*sum(i*x_i) - (n+1)*sum(x)) /
    (n*sum(x)) with x ascending and i 1-based — the revenue/value
    inequality profile.  Equal values make the rank sum invariant to
    tie order, so the statistic is layout-independent; numerator and
    denominator are exact int64 and the single double division is
    IEEE-identical in SQL.  All-zero groups define G = 0.

    ONE hash shuffle on the key (groups arrive block-complete), then a
    vectorized grouped rank-weighted scan.  Output (key, n:int64,
    gini:float64 rounded 6)."""
    from ..util import round_half_away
    from .relational import _keyed, _meta_rows

    def gini(d: pd.DataFrame) -> pd.DataFrame:
        if not len(d):
            return pd.DataFrame({
                key: d[key], "n": pd.Series([], dtype=np.int64),
                "gini": pd.Series([], dtype=np.float64)})
        s = d.sort_values([key, col], kind="stable")
        x = s[col].to_numpy(np.int64)
        i = (s.groupby(key, sort=False).cumcount().to_numpy() + 1) \
            .astype(np.int64)
        t = pd.DataFrame({key: s[key], "x": x, "ix": i * x})
        a = t.groupby(key, sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), six=("ix", "sum"))
        n = a["n"].to_numpy(np.int64)
        sx = a["sx"].to_numpy(np.int64)
        six = a["six"].to_numpy(np.int64)
        num = (2 * six - (n + 1) * sx).astype(np.float64)
        den = (n * sx).astype(np.float64)
        g = np.where(sx == 0, 0.0,
                     num / np.where(den == 0, 1.0, den))
        return pd.DataFrame({key: a.index.to_numpy(), "n": n,
                             "gini": round_half_away(g, 6)})

    return _keyed(ds.select_columns([key, col]), [key], cfg,
                  _meta_rows(ds)).map_batches(
        gini, batch_format="pandas", batch_size=None)


def ecdf_lookup(ds_a, ds_b, *, col: str, out_col: str = "ecdf",
                cfg: EngineConfig = DEFAULT_CONFIG):
    """Empirical-CDF transform against a REFERENCE distribution: each
    row of ``ds_a`` gets ``P(B <= v)`` where B is ``ds_b``'s integer
    ``col`` — the cross-population normalization (score purchases on
    the click distribution, score a new crawl on last month's).

    The reference reduces to per-block (value, count) partials ->
    ONE keyed_sum -> a single-block sorted cumulative table (bounded
    by the distinct-value domain, the ks_statistic trade) broadcast to
    every scoring task; scoring is one vectorized searchsorted per
    batch — ``ds_a`` itself never shuffles.  The quotient divides the
    same exact ints on both sides; output rounded half-away at 6."""
    import ray

    from ..util import round_half_away
    from .relational import keyed_sum

    def counts(d: pd.DataFrame) -> pd.DataFrame:
        g = (d.groupby(col, sort=False).size().reset_index(name="_c"))
        g[col] = g[col].astype(np.int64)
        return g

    merged = keyed_sum(
        ds_b.select_columns([col]).map_batches(counts,
                                               batch_format="pandas"),
        [col], ["_c"], cfg).to_pandas()  # distinct-value-domain-sized
    if not len(merged):
        raise ValueError("ecdf_lookup: empty reference side")
    merged = merged.sort_values(col)
    vals = merged[col].to_numpy(np.int64)
    cum = merged["_c"].to_numpy(np.int64).cumsum()
    nb = int(cum[-1])
    ref = ray.put((vals, cum))

    cols = list(ds_a.schema().names)

    def score(d: pd.DataFrame) -> pd.DataFrame:
        v, c = ray.get(ref)
        idx = np.searchsorted(v, d[col].to_numpy(np.int64),
                              side="right")
        below = np.where(idx > 0, c[np.maximum(idx - 1, 0)], 0)
        out = d[cols].copy()
        out[out_col] = round_half_away(below.astype(np.float64) / nb, 6)
        return out

    return ds_a.map_batches(score, batch_format="pandas")
