"""Relational operators Ray Data lacks natively: as-of join, range
(interval) join, group-wise top-k and exact grouped quantiles.

These are the window/non-equi-join staples of a training-data pipeline
(attach the latest model checkpoint to each sample, join logs to the
config active at their timestamp, per-group champions, per-slice score
percentiles).  The reference's SQL surface has none of them; each is
built from the engine's core primitives:

* asof_join       — union both sides into one table (explicit unified
                    Arrow schema, typed nulls for the other side's
                    columns), ONE hash shuffle on the key, per-block
                    sort + vectorized forward fill.  The classic
                    merge-asof, distributed.
* range_join      — keyed: the same single-shuffle union, per-block
                    equi-merge + vectorized interval filter.  Keyless:
                    replicate the right side across the <=2 time
                    buckets its admissible interval overlaps (bucket
                    width >= interval length), equi-join on bucket,
                    exact filter — each qualifying pair meets in
                    exactly one bucket (the left row's), so no dedup.
* group_topk      — per-block partial top-k (a correct combiner: the
                    global per-key top-k is a subset of the union of
                    per-block top-ks), then one hash shuffle of <=
                    k rows per (block, key) and a final per-block pass.
* grouped_quantiles — per-block (key, value) partial counts (the
                    combiner bounds shuffle volume by the DISTINCT
                    value count, not the row count), one hash shuffle
                    on the key, per-block merge + exact discrete
                    quantile (sorted element at ceil(q*n) - 1 —
                    DuckDB ``quantile_disc`` semantics).

All per-block kernels are vectorized pandas/numpy; blocks receive
complete key groups via ``repartition(keys=[...])`` so no cross-block
merge step is needed.  Small inputs take the same repartition(1) gather
gate as the rest of the engine (``cfg.gather_max_keys``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig


def _meta_rows(ds) -> int | None:
    try:
        return ds._meta_count()
    except Exception:
        return None


def keyed_sum(parts, keys: list[str], val_cols: list[str],
              cfg: EngineConfig = DEFAULT_CONFIG,
              n_rows: int | None = None):
    """Combiner-reduced keyed sum over a partial-aggregate table:
    per-block pandas partial -> ONE hash repartition on the keys ->
    per-block final sum.  Output columns keep their input names.

    This replaces ``Dataset.groupby().sum()`` everywhere an aggregate's
    key cardinality is unbounded: Ray 2.49's native groupby
    sort-aggregates at ~0.3 ms/row on string keys (measured on a 785k-
    row bigram-count table: 257 s native vs 2.5 s for this shape —
    100x).  Determinism: the final combine sorts each block by
    (keys, values) before summing, so float accumulation order does
    not depend on shuffle ARRIVAL order — results are bit-identical
    across runs for a fixed block layout.  (A different layout changes
    the per-block partial multiset, like any distributed float sum;
    integer sums are exact and layout-invariant either way.)"""

    def combine(d: pd.DataFrame) -> pd.DataFrame:
        if not len(d):
            # project even when empty so empty blocks (common after a
            # hash repartition) share the aggregated blocks' schema and
            # column order instead of leaking extra input columns
            return d[[*keys, *val_cols]]
        s = d.sort_values([*keys, *val_cols], kind="stable")
        return s.groupby(keys, sort=False, dropna=False)[val_cols] \
            .sum().reset_index()

    pre = parts.map_batches(combine, batch_format="pandas")
    return _keyed(pre, keys, cfg, n_rows).map_batches(
        combine, batch_format="pandas", batch_size=None)


def rollup_sum(ds, *, keys: list[str], val_cols: list[str],
               filler: str = "(all)",
               cfg: EngineConfig = DEFAULT_CONFIG):
    """SQL ROLLUP: sums at every key-prefix level — (k1..kn),
    (k1..kn-1), ..., grand total.  Rolled-up key columns carry the
    explicit ``filler`` sentinel instead of ANSI NULL (unambiguous in
    downstream filters and stable across NULL representations; the SQL
    counterpart is ``coalesce(col, '(all)')`` over ``GROUP BY
    ROLLUP``).  Key columns must be strings that never equal the
    filler; this is ENFORCED — a NULL key or a genuine ``filler``
    value in the input raises ValueError at scan time rather than
    silently aliasing rolled-up rows (a real NULL would stay NaN here
    while the SQL coalesce maps it to the filler — a parity break).

    Shape: CASCADING combiners — each level is a keyed_sum over the
    PREVIOUS level's (already aggregated) output, so the input is
    scanned once and the total shuffle volume is the sum of the level
    cardinalities, never n_levels passes over the data; the grand
    total is a two-step scalar fold."""

    def proj(d: pd.DataFrame) -> pd.DataFrame:
        for c in keys:
            if d[c].isna().any():
                raise ValueError(
                    f"rollup_sum: key column {c!r} contains NULLs; "
                    f"coalesce them before rolling up (sentinel is "
                    f"{filler!r})")
            if (d[c] == filler).any():
                raise ValueError(
                    f"rollup_sum: key column {c!r} contains the filler "
                    f"sentinel {filler!r}; pick a different filler")
        return d[[*keys, *val_cols]]

    levels = []
    cur = keyed_sum(ds.map_batches(proj, batch_format="pandas"),
                    keys, val_cols, cfg)
    levels.append(cur.map_batches(proj, batch_format="pandas"))
    for i in range(len(keys) - 1, -1, -1):
        prefix = keys[:i]

        def filled(d: pd.DataFrame, p=tuple(prefix)) -> pd.DataFrame:
            out = d.copy()
            for c in keys:
                if c not in p:
                    out[c] = pd.array([filler] * len(d), dtype="string")
            return out[[*keys, *val_cols]]

        if prefix:
            cur = keyed_sum(cur, list(prefix), val_cols, cfg)
            levels.append(cur.map_batches(filled, batch_format="pandas"))
        else:
            def part(d: pd.DataFrame) -> pd.DataFrame:
                return d[val_cols].sum().to_frame().T

            tot = cur.map_batches(part, batch_format="pandas") \
                .repartition(1).map_batches(part, batch_format="pandas",
                                            batch_size=None)
            levels.append(tot.map_batches(filled, batch_format="pandas"))
    return levels[0].union(*levels[1:])


def pivot_counts(ds, *, key: str, pivot_col: str, values: list[str],
                 cfg: EngineConfig = DEFAULT_CONFIG):
    """Pivot to wide per-key counts: one int64 column per entry of
    ``values`` holding the number of rows where ``pivot_col`` equals
    it (rows with other values are ignored — the output schema is
    FIXED by the caller, as a distributed pivot must be; discover the
    domain first with a distinct if needed).

    Shape: a per-batch crosstab emits one ALREADY-WIDE row per in-block
    key — bounded by key cardinality per block, independent of row
    count — then ONE keyed_sum folds the partials.  A single shuffle,
    no per-value passes."""
    if not values:
        raise ValueError("values must be non-empty")

    def partial(d: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(d[key], d[pivot_col])
        out = pd.DataFrame({key: ct.index.to_numpy()})
        for v in values:
            out[v] = (ct[v].to_numpy(dtype=np.int64) if v in ct.columns
                      else np.zeros(len(ct), dtype=np.int64))
        return out

    return keyed_sum(ds.map_batches(partial, batch_format="pandas"),
                     [key], list(values), cfg)


def dataset_diff(ds_a, ds_b, *, id_col: str, col: str,
                 cfg: EngineConfig = DEFAULT_CONFIG):
    """Corpus-version diff — what changed between two snapshots of the
    same table (crawl N vs crawl N+1): one row per id present in
    either version with ``status`` in {added, removed, changed, same}
    (``ds_b`` is the NEW version; ``changed`` compares ``col`` content
    by md5).

    Shape: each side reduces to (id, digest) in one stateless pass —
    the payload column never enters the join — then ONE full-outer
    hash join on the id and a stateless status map.  The digest is
    md5 over UTF-8, byte-identical to SQL ``md5()``."""
    import hashlib

    from ..util import safe_join

    def digest(side_col):
        def f(d: pd.DataFrame) -> pd.DataFrame:
            h = [hashlib.md5(("" if t is None else str(t))
                             .encode("utf-8")).hexdigest()
                 for t in d[col]]
            return pd.DataFrame({id_col: d[id_col],
                                 side_col: pd.array(h, dtype="string")})
        return f

    a = ds_a.map_batches(digest("_ha"), batch_format="pandas")
    b = ds_b.map_batches(digest("_hb"), batch_format="pandas")
    j = safe_join(a, b, "full_outer",
                  cfg.resolve_join_partitions(), (id_col,))

    def status(d: pd.DataFrame) -> pd.DataFrame:
        ha, hb = d["_ha"], d["_hb"]
        st = np.where(ha.isna(), "added",
                      np.where(hb.isna(), "removed",
                               np.where(ha.to_numpy() == hb.to_numpy(),
                                        "same", "changed")))
        return pd.DataFrame({id_col: d[id_col],
                             "status": pd.array(st, dtype="string")})

    return j.map_batches(status, batch_format="pandas")


def cdc_merge(base, changes, *, key_col: str, seq_col: str, op_col: str,
              val_cols: tuple, cfg: EngineConfig = DEFAULT_CONFIG):
    """Apply a CDC change stream to a base snapshot — SQL ``MERGE
    INTO`` semantics: per key, the change with the HIGHEST ``seq_col``
    wins; a winning ``'delete'`` removes the key, a winning
    ``'upsert'`` inserts-or-replaces the payload (``val_cols``),
    untouched base rows pass through.

    Contract: ``(key, seq)`` pairs are unique (CDC logs carry unique
    monotone LSNs) and seqs are > 0 — ``last_seq`` is 0 for rows no
    change touched.  Returns one row per surviving key:
    (key_col, *val_cols, last_seq:int64).

    Shape: the change stream collapses to one winner per key via a
    per-block argmax-seq combiner then ONE keyed shuffle (change
    volume never re-ships); the base joins the winner table in one
    full-outer hash join — base payload bytes move exactly once.
    Empty sides short-circuit BEFORE the join (Ray 2.49's hash join
    crashes on a 0-row input): no changes -> the base snapshot with
    last_seq 0; empty base -> the surviving upsert winners."""
    from ..util import safe_join, scrub_empty_blocks

    ren = {v: f"_c_{v}" for v in val_cols}
    ren[op_col] = "_c_op"
    ren[seq_col] = "_c_seq"

    def _argmax(d: pd.DataFrame) -> pd.DataFrame:
        d = (d.sort_values(seq_col, kind="stable")
             .groupby(key_col, sort=False).tail(1))
        return d[[key_col, seq_col, op_col, *val_cols]]

    latest = scrub_empty_blocks(
        changes.map_batches(_argmax, batch_format="pandas")
        .repartition(cfg.resolve_join_partitions(), keys=[key_col])
        .map_batches(lambda d: _argmax(d).rename(columns=ren),
                     batch_format="pandas", batch_size=None))

    def _passthrough(d: pd.DataFrame) -> pd.DataFrame:
        out = d[[key_col, *val_cols]].copy()
        out["last_seq"] = np.zeros(len(d), dtype=np.int64)
        return out

    if latest.count() == 0:  # metadata-only (materialized by the scrub)
        return base.map_batches(_passthrough, batch_format="pandas")
    bmat = scrub_empty_blocks(base)
    if bmat.count() == 0:  # pure-insert stream: winners, deletes out
        def _inserts(d: pd.DataFrame) -> pd.DataFrame:
            d = d[d["_c_op"] != "delete"]
            out = {key_col: d[key_col]}
            for v in val_cols:
                out[v] = d[f"_c_{v}"]
            out["last_seq"] = d["_c_seq"].to_numpy().astype(np.int64)
            return pd.DataFrame(out)

        return latest.map_batches(_inserts, batch_format="pandas")
    j = safe_join(bmat, latest, "full_outer",
                  cfg.resolve_join_partitions(), (key_col,))

    def _apply(d: pd.DataFrame) -> pd.DataFrame:
        has_ch = d["_c_op"].notna()
        d = d[~(has_ch & (d["_c_op"] == "delete"))]
        has_ch = d["_c_op"].notna()
        out = {key_col: d[key_col]}
        for v in val_cols:
            out[v] = d[f"_c_{v}"].where(has_ch, d[v])
        out["last_seq"] = (d["_c_seq"].fillna(0).to_numpy()
                           .astype(np.int64))
        return pd.DataFrame(out)

    return j.map_batches(_apply, batch_format="pandas")


def _keyed(ds, keys: list[str], cfg: EngineConfig, n_rows: int | None):
    """Hash-repartition ``ds`` so each key group is block-complete, or
    gather to one block when the input is gate-small."""
    if (n_rows is not None and cfg.gather_max_keys > 0
            and n_rows <= cfg.gather_max_keys):
        return ds.repartition(1)
    return ds.repartition(cfg.resolve_join_partitions(), keys=keys)


def _ts_int64(s: pd.Series) -> np.ndarray:
    """Timestamp-or-numeric column -> int64 (us for datetimes)."""
    if np.issubdtype(s.dtype, np.datetime64):
        return s.to_numpy(dtype="datetime64[us]").astype(np.int64)
    return s.to_numpy(dtype=np.int64)


def _arrow_schema(ds) -> pa.Schema:
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    # pandas-block dataset: map numpy dtypes (object -> string)
    fields = []
    for n, t in zip(s.names, getattr(base, "types", [])):
        try:
            fields.append(pa.field(n, pa.from_numpy_dtype(t)))
        except (pa.ArrowNotImplementedError, TypeError):
            fields.append(pa.field(n, pa.string()))
    if len(fields) != len(s.names):
        raise TypeError(f"cannot derive an Arrow schema from {base!r}")
    return pa.schema(fields)


def _int_restore(schema: pa.Schema) -> dict[str, str]:
    """Columns whose integers get floatified by null-filled Arrow ->
    pandas conversion, with the dtype to cast back to."""
    return {f.name: "int64" for f in schema
            if pa.types.is_integer(f.type)}


def _restored(df: pd.DataFrame, casts: dict[str, str]) -> pd.DataFrame:
    for c, dt in casts.items():
        if c in df.columns:
            df[c] = df[c].astype(dt)
    return df


def _to_arrow(fn, schema: pa.Schema):
    """Conform a prep output to the unified union schema.  The other
    side's INTEGER columns are zero-filled (not null-filled): they are
    never read from the wrong side, and a null-free int column survives
    the Arrow -> pandas hop as exact int64 instead of float64 — so
    64-bit ids above 2^53 round-trip bit-exactly.  (Integer columns
    whose OWN data contains nulls still floatify in pandas blocks; the
    2^53 exactness bound applies only to those.)"""

    def wrapped(df: pd.DataFrame) -> pa.Table:
        out = fn(df)
        for f in schema:
            if f.name not in out.columns:
                if pa.types.is_integer(f.type):
                    out[f.name] = np.zeros(len(out), dtype=np.int64)
                else:
                    out[f.name] = pd.Series([None] * len(out), dtype="object")
        return pa.Table.from_pandas(out[list(schema.names)], schema=schema,
                                    preserve_index=False)

    return wrapped


# --------------------------------------------------------------------------
# as-of join
# --------------------------------------------------------------------------


def asof_join(left, right, *, key: str, left_ts: str, right_ts: str,
              right_cols: list[str], right_id: str,
              cfg: EngineConfig = DEFAULT_CONFIG):
    """For each left row, attach ``right_cols`` of the single right row
    with the same ``key`` and the greatest ``right_ts`` <= ``left_ts``
    (inclusive; "most recent prior").  Ties on right_ts break by the
    greatest ``right_id`` when it is an integer column; a non-integer
    ``right_id`` is hashed to the tiebreak (still deterministic, but
    the winner is the greatest HASH, not the greatest value).  Inner
    semantics: left rows with no prior right row are dropped.  Both
    sides must carry the key under the same column name (rename
    upstream).

    Shape: both sides are projected, tagged and unioned into ONE table
    that hash-shuffles once on ``key``; each block then sorts by
    (key, ts, side, tiebreak) and forward-fills the latest right-row
    index — a single vectorized pass, no per-key loop.  At 100 TB the
    only data movement is that one shuffle of the pruned columns."""
    if right_id not in right_cols:
        right_cols = right_cols + [right_id]
    rpay = [c for c in right_cols if c != key]
    lsch, rsch = _arrow_schema(left), _arrow_schema(right)
    lcols = list(lsch.names)
    fields = list(lsch)
    fields += [pa.field(f"__r_{c}", rsch.field(c).type) for c in rpay]
    fields += [pa.field("__t", pa.int64()), pa.field("__side", pa.int8()),
               pa.field("__tb", pa.int64())]
    schema = pa.schema(fields)
    out_casts = _int_restore(pa.schema(
        [lsch.field(c) for c in lcols]
        + [pa.field(c, rsch.field(c).type) for c in rpay]))

    def prep_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[lcols].copy()
        out["__t"] = _ts_int64(df[left_ts])
        out["__side"] = np.ones(len(df), dtype=np.int8)
        out["__tb"] = np.zeros(len(df), dtype=np.int64)
        return out

    def prep_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({key: df[key].to_numpy()})
        for c in rpay:
            out[f"__r_{c}"] = df[c].to_numpy()
        out["__t"] = _ts_int64(df[right_ts])
        out["__side"] = np.zeros(len(df), dtype=np.int8)
        try:
            out["__tb"] = df[right_id].to_numpy(dtype=np.int64)
        except (ValueError, TypeError):
            # non-integer tiebreaker: deterministic vectorized hash
            out["__tb"] = pd.util.hash_array(
                df[right_id].to_numpy(dtype=object)).astype(np.int64)
        return out

    both = left.map_batches(_to_arrow(prep_left, schema),
                            batch_format="pandas") \
        .union(right.select_columns(
            sorted({key, right_ts, *right_cols},
                   key=list(rsch.names).index))
            .map_batches(_to_arrow(prep_right, schema),
                         batch_format="pandas"))
    nl, nr = _meta_rows(left), _meta_rows(right)
    n_rows = (nl + nr) if (nl is not None and nr is not None) else None

    def block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, "__t", "__side", "__tb"],
                            kind="stable").reset_index(drop=True)
        is_right = (df["__side"].to_numpy() == 0)
        pos = np.arange(len(df))
        # forward-fill the index of the latest right row seen so far
        fill = np.maximum.accumulate(np.where(is_right, pos, -1))
        # reset at key boundaries: the filled right row must sit at or
        # after its key group's first row
        k = df[key].to_numpy()
        first = np.ones(len(df), dtype=bool)
        first[1:] = k[1:] != k[:-1]
        group_start = np.maximum.accumulate(np.where(first, pos, 0))
        valid = (~is_right) & (fill >= group_start)
        take = fill[valid]
        out = df.loc[valid, lcols].reset_index(drop=True)
        for c in rpay:
            out[c] = df[f"__r_{c}"].to_numpy()[take]
        return _restored(out, out_casts)

    return _keyed(both, [key], cfg, n_rows).map_batches(
        block, batch_format="pandas", batch_size=None)


# --------------------------------------------------------------------------
# range (interval) join
# --------------------------------------------------------------------------


def range_join(left, right, *, left_ts: str, right_ts: str,
               lo_s: float, hi_s: float, key: str | None = None,
               right_cols: list[str] | None = None,
               cfg: EngineConfig = DEFAULT_CONFIG):
    """All (left, right) row pairs with ``left_ts - right_ts`` in
    ``[lo_s, hi_s]`` seconds (inclusive both ends), optionally also
    requiring equality on ``key`` (same column name on both sides —
    rename upstream).  Output: left columns + ``right_cols``.

    keyed: ONE hash shuffle co-locates each key's rows from both sides;
    each block pandas-merges its local sides and filters the interval —
    fan-out stays key-local.

    keyless: a true non-equi join.  Bucket width = max(hi-lo, 1) us, so
    each RIGHT row's admissible window [right_ts+lo, right_ts+hi] spans
    at most two buckets — the right side replicates <= 2x, the left row
    maps to its single bucket, and the bucket is the equi-join key;
    every qualifying pair meets in exactly one bucket, so the exact
    filter needs no dedup pass."""
    lsch, rsch = _arrow_schema(left), _arrow_schema(right)
    lcols = list(lsch.names)
    if right_cols is None:
        right_cols = [c for c in rsch.names if c not in lcols]
    rpay = [c for c in right_cols if c != key]
    lo_us, hi_us = int(lo_s * 1e6), int(hi_s * 1e6)

    join_col = key if key is not None else "__b"
    fields = list(lsch)
    fields += [pa.field(f"__r_{c}", rsch.field(c).type) for c in rpay]
    fields += [pa.field("__rts", pa.int64()), pa.field("__side", pa.int8())]
    if key is None:
        fields.append(pa.field("__b", pa.int64()))
    schema = pa.schema(fields)
    out_casts = _int_restore(pa.schema(
        [lsch.field(c) for c in lcols]
        + [pa.field(c, rsch.field(c).type) for c in rpay]))

    def prep_l(df: pd.DataFrame) -> pd.DataFrame:
        out = df[lcols].copy()
        out["__side"] = np.ones(len(df), dtype=np.int8)
        if key is None:
            out["__b"] = _ts_int64(df[left_ts]) // max(hi_us - lo_us, 1)
        return out

    def prep_r(df: pd.DataFrame) -> pd.DataFrame:
        t = _ts_int64(df[right_ts])
        if key is None:
            w = max(hi_us - lo_us, 1)
            b0, b1 = (t + lo_us) // w, (t + hi_us) // w   # b1 - b0 in {0, 1}
            reps = (b1 - b0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(df)), reps)
            offs = np.arange(len(idx)) - np.repeat(np.cumsum(reps) - reps,
                                                   reps)
            out = pd.DataFrame(
                {f"__r_{c}": df[c].to_numpy()[idx] for c in rpay})
            out["__rts"] = t[idx]
            out["__b"] = b0[idx] + offs
        else:
            out = pd.DataFrame({key: df[key].to_numpy()})
            for c in rpay:
                out[f"__r_{c}"] = df[c].to_numpy()
            out["__rts"] = t
        out["__side"] = np.zeros(len(out), dtype=np.int8)
        return out

    rsel = sorted({right_ts, *right_cols} | ({key} if key else set()),
                  key=list(rsch.names).index)
    both = left.map_batches(_to_arrow(prep_l, schema),
                            batch_format="pandas") \
        .union(right.select_columns(rsel)
               .map_batches(_to_arrow(prep_r, schema),
                            batch_format="pandas"))
    nl, nr = _meta_rows(left), _meta_rows(right)
    n_rows = (nl + 2 * nr) if (nl is not None and nr is not None) else None

    def block(df: pd.DataFrame) -> pd.DataFrame:
        side = df["__side"].to_numpy()
        ldf = df.loc[side == 1, lcols + ([join_col] if key is None else [])]
        rdf = df.loc[side == 0,
                     [join_col, "__rts"] + [f"__r_{c}" for c in rpay]]
        m = ldf.merge(rdf, on=join_col)
        delta = _ts_int64(m[left_ts]) - m["__rts"].to_numpy(dtype=np.int64)
        keep = (delta >= lo_us) & (delta <= hi_us)
        m = m.loc[keep].reset_index(drop=True)
        out = m[lcols].copy()
        for c in rpay:
            out[c] = m[f"__r_{c}"].to_numpy()
        return _restored(out, out_casts)

    return _keyed(both, [join_col], cfg, n_rows).map_batches(
        block, batch_format="pandas", batch_size=None)


# --------------------------------------------------------------------------
# group-wise top-k
# --------------------------------------------------------------------------


def group_topk(ds, *, key: str, order_col: str, k: int, tie_col: str,
               descending: bool = True, with_rank: bool = False,
               cfg: EngineConfig = DEFAULT_CONFIG):
    """Top ``k`` rows per ``key`` by ``order_col`` (ties broken by
    ascending ``tie_col`` — deterministic): the row_number()-window
    pattern.  ``with_rank`` appends the 1-based per-group rank.

    The per-block partial top-k BEFORE the shuffle is a correct
    combiner (a row outside its block's per-key top-k cannot be in the
    global per-key top-k), so at most k rows per (block, key) move."""
    cols = list(ds.schema().names)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values([key, order_col, tie_col],
                           ascending=[True, not descending, True],
                           kind="stable")
        return s.groupby(key, sort=False).head(k)[cols]

    def topk_rank(df: pd.DataFrame) -> pd.DataFrame:
        out = topk(df).copy()
        out["rank"] = (out.groupby(key, sort=False).cumcount() + 1) \
            .astype(np.int64)
        return out

    partial = ds.map_batches(topk, batch_format="pandas")
    final = topk_rank if with_rank else topk
    return _keyed(partial, [key], cfg, _meta_rows(ds)).map_batches(
        final, batch_format="pandas", batch_size=None)


# --------------------------------------------------------------------------
# exact grouped quantiles
# --------------------------------------------------------------------------


def grouped_quantiles(ds, *, key: str, col: str, qs: list[float],
                      cfg: EngineConfig = DEFAULT_CONFIG):
    """EXACT discrete quantiles of ``col`` per ``key``: for each q, the
    sorted group element at 0-based index ceil(q*n) - 1 (DuckDB
    ``quantile_disc`` semantics).  Output: (key, q, value).

    The per-block (key, value) -> count combiner bounds the shuffle by
    the number of DISTINCT (key, value) pairs — for bounded-domain
    columns (prices, scores, lengths) that is orders of magnitude below
    the row count.  For genuinely continuous unbounded columns,
    quantize upstream or reach for a sketch; this operator trades that
    restriction for exactness."""
    qs = sorted(qs)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([key, col], sort=False).size()
                .reset_index(name="cnt"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        m = (df.groupby([key, col], sort=False)["cnt"].sum().reset_index()
             .sort_values([key, col], kind="stable").reset_index(drop=True))
        kv = m[key].to_numpy()
        vals = m[col].to_numpy()
        cnts = m["cnt"].to_numpy(dtype=np.int64)
        first = np.ones(len(m), dtype=bool)
        first[1:] = kv[1:] != kv[:-1]
        starts = np.where(first)[0]
        ends = np.append(starts[1:], len(m))
        csum = np.cumsum(cnts)
        out_k, out_q, out_v = [], [], []
        for s, e in zip(starts, ends):       # loop over keys IN BLOCK only
            base = csum[s - 1] if s else 0
            seg = csum[s:e] - base
            n = int(seg[-1])
            for q in qs:
                target = max(int(np.ceil(q * n)), 1)
                i = int(np.searchsorted(seg, target))
                out_k.append(kv[s])
                out_q.append(q)
                out_v.append(vals[s + i])
        return pd.DataFrame({key: np.asarray(out_k),
                             "q": np.asarray(out_q, dtype=np.float64),
                             "value": np.asarray(out_v)})

    counts = ds.select_columns([key, col]).map_batches(
        partial, batch_format="pandas")
    return _keyed(counts, [key], cfg, _meta_rows(ds)).map_batches(
        final, batch_format="pandas", batch_size=None)


def filter_by_group_quantile(ds, *, key: str, col: str, q: float = 0.5,
                             keep: str = "ge",
                             cfg: EngineConfig = DEFAULT_CONFIG):
    """Keep rows whose ``col`` is >= (``keep="ge"``) or <= (``"le"``)
    their OWN group's exact discrete ``q``-quantile — per-language
    quality gating, per-source length floors, per-type outlier trims.

    Exactness: the threshold is ``grouped_quantiles``' quantile_disc
    value — an actual element of the group — so the comparison is
    bit-exact against a SQL replay with no rounding contract needed.

    Shape: the input materializes once (two consumers); thresholds are
    one row per group (the distinct-value-bounded combiner shuffle),
    hash-join-attached and filtered statelessly — the grouped_zscore
    attach pattern, unbounded group cardinality, no driver state."""
    from ..util import safe_join

    if keep not in ("ge", "le"):
        raise ValueError(f"keep must be 'ge' or 'le', got {keep!r}")
    ds = ds.materialize()
    cols = list(ds.schema().names)
    thr = grouped_quantiles(ds, key=key, col=col, qs=[q], cfg=cfg) \
        .map_batches(
            lambda d: pd.DataFrame({key: d[key], "_thr": d["value"]}),
            batch_format="pandas")
    joined = safe_join(ds, thr, "inner",
                       cfg.resolve_join_partitions(), (key,))

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy()
        t = df["_thr"].to_numpy()
        m = v >= t if keep == "ge" else v <= t
        return df.loc[m, cols].reset_index(drop=True)

    return joined.map_batches(filt, batch_format="pandas")


# --------------------------------------------------------------------------
# grouped running (cumulative) sum — the sum() OVER (PARTITION BY key
# ORDER BY ...) window
# --------------------------------------------------------------------------


def grouped_running_sum(ds, *, key: str, order_cols: list[str], val_col: str,
                        out_col: str = "running_sum",
                        cfg: EngineConfig = DEFAULT_CONFIG):
    """Cumulative sum of ``val_col`` per ``key`` in ``order_cols`` order
    (the order must be a total order within each key group — pass a
    unique tie-breaker — so the result is deterministic and matches the
    SQL window exactly).  ONE hash shuffle on the key, then a per-block
    sort + vectorized grouped cumsum; all input columns pass through."""
    cols = list(ds.schema().names)

    def cum(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = df[cols].copy()
            out[out_col] = pd.Series([], dtype="float64")
            return out
        s = df.sort_values([key, *order_cols], kind="stable")
        out = s[cols].copy()
        out[out_col] = s.groupby(key, sort=False)[val_col].cumsum()
        return out

    return _keyed(ds, [key], cfg, _meta_rows(ds)).map_batches(
        cum, batch_format="pandas", batch_size=None)


def grouped_frame_sum(ds, *, key: str, order_cols: list[str],
                      val_col: str, preceding: int,
                      out_col: str = "frame_sum",
                      cfg: EngineConfig = DEFAULT_CONFIG):
    """SUM(val) OVER (PARTITION BY key ORDER BY order_cols ROWS BETWEEN
    ``preceding`` PRECEDING AND CURRENT ROW) — the bounded-frame
    sliding window (trailing spend, rolling token budget), the frame
    sibling of grouped_running_sum's UNBOUNDED PRECEDING.

    ``order_cols`` must be a total order within each key group (pass a
    unique tie-breaker).  ``val_col`` must be integer: the frame sum is
    computed as a grouped cumsum minus its window-shifted self, all in
    int64, so results are exact and layout-invariant.  ONE hash shuffle
    on the key, then a per-block sort + vectorized difference — no
    per-window loop, O(rows) per block regardless of frame width."""
    if preceding < 0:
        raise ValueError(f"preceding must be >= 0, got {preceding}")
    cols = list(ds.schema().names)
    window = preceding + 1

    def frame(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = df[cols].copy()
            out[out_col] = pd.Series([], dtype="int64")
            return out
        s = df.sort_values([key, *order_cols], kind="stable")
        out = s[cols].copy()
        g = s.groupby(key, sort=False)
        cs = g[val_col].cumsum().to_numpy(np.int64)
        # cs[i - window] belongs to the same group exactly when the
        # row's within-group ordinal is >= window
        idx = g.cumcount().to_numpy(np.int64)
        shifted = np.concatenate(
            [np.zeros(min(window, len(cs)), dtype=np.int64),
             cs[:-window]])[:len(cs)]
        out[out_col] = cs - np.where(idx >= window, shifted, 0)
        return out

    return _keyed(ds, [key], cfg, _meta_rows(ds)).map_batches(
        frame, batch_format="pandas", batch_size=None)


def grouped_lag(ds, *, key: str, order_cols: list[str], cols: list[str],
                offset: int = 1, prefix: str = "prev_",
                cfg: EngineConfig = DEFAULT_CONFIG):
    """LAG(col, offset) OVER (PARTITION BY key ORDER BY order_cols) for
    each column in ``cols`` — the inter-event-delta / feature-from-
    previous-row transform (time since a user's last event, value
    change vs the prior observation).  Negative ``offset`` gives LEAD.
    ``order_cols`` must be a total order within each key group (pass a
    unique tie-breaker) so the shift is deterministic and matches the
    SQL window exactly.  Group-leading rows get NULL, as in SQL:
    shifted int64 columns come back float64-with-NaN and timestamps
    NaT — the same dtypes DuckDB's LAG produces through fetchdf.

    ONE hash shuffle on the key co-locates each group, then a
    per-block sort + vectorized grouped shift; all input columns pass
    through, shifted copies are appended as ``prefix + col``."""
    if offset == 0:
        raise ValueError("offset must be nonzero (0 is the row itself)")
    in_cols = list(ds.schema().names)
    out_names = [prefix + c for c in cols]
    clash = set(out_names) & set(in_cols)
    if clash:
        raise ValueError(f"output columns collide with input: {clash}")

    def lag(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = df[in_cols].copy()
            for c, o in zip(cols, out_names):
                out[o] = df[c]
            return out
        s = df.sort_values([key, *order_cols], kind="stable")
        out = s[in_cols].copy()
        g = s.groupby(key, sort=False)
        for c, o in zip(cols, out_names):
            out[o] = g[c].shift(offset)
        return out

    return _keyed(ds, [key], cfg, _meta_rows(ds)).map_batches(
        lag, batch_format="pandas", batch_size=None)


def grouped_ntile(ds, *, key: str, order_cols: list[str], n: int,
                  out_col: str = "tile",
                  cfg: EngineConfig = DEFAULT_CONFIG):
    """ntile(n) OVER (PARTITION BY key ORDER BY order_cols): each
    group's rows split into ``n`` buckets as evenly as possible, the
    first ``size mod n`` buckets one row larger — the
    difficulty-bucket / curriculum-band assignment.  ``order_cols``
    must be a total order within each group (pass a unique
    tie-breaker) so bucket edges are deterministic and match the SQL
    window exactly.  Buckets are 1-based BIGINT like SQL's.

    ONE hash shuffle on the key, then a per-block sort + closed-form
    bucket arithmetic (no quantile estimation); all input columns pass
    through."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    cols = list(ds.schema().names)

    def tile(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = df[cols].copy()
            out[out_col] = pd.Series([], dtype="int64")
            return out
        s = df.sort_values([key, *order_cols], kind="stable")
        g = s.groupby(key, sort=False)
        size = g[key].transform("size").to_numpy(dtype=np.int64)
        r = g.cumcount().to_numpy(dtype=np.int64)        # 0-based rank
        big, rem = size // n + 1, size % n               # first rem buckets
        in_big = r < rem * big                           # hold one extra row
        t = np.where(in_big, r // np.maximum(big, 1),
                     rem + (r - rem * big) // np.maximum(size // n, 1))
        out = s[cols].copy()
        out[out_col] = t + 1
        return out

    return _keyed(ds, [key], cfg, _meta_rows(ds)).map_batches(
        tile, batch_format="pandas", batch_size=None)


def grouped_percent_rank(ds, *, key: str, col: str,
                         out_col: str = "percent_rank",
                         cfg: EngineConfig = DEFAULT_CONFIG):
    """percent_rank() OVER (PARTITION BY key ORDER BY col): the
    per-group CDF position (rank - 1) / (n - 1), ties sharing their
    minimum rank, single-row groups at 0.0 — the normalized-score /
    per-group-calibration transform.  Exact against the SQL window:
    ranks and group sizes are integers, so the quotient is the same
    IEEE double on both sides.  NULL values of ``col`` rank LAST as a
    single peer group (``na_option='bottom'``), matching the SQL
    window's default NULLS LAST where NULLs are order-peers.

    ONE hash shuffle on the key, then a per-block grouped rank (groups
    arrive complete); all input columns pass through."""
    cols = list(ds.schema().names)

    def pr(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = df[cols].copy()
            out[out_col] = pd.Series([], dtype="float64")
            return out
        s = df.sort_values([key, col], kind="stable")
        g = s.groupby(key, sort=False)[col]
        n = g.transform("size").to_numpy(dtype=np.float64)
        r = g.rank(method="min", na_option="bottom") \
            .to_numpy(dtype=np.float64)
        out = s[cols].copy()
        out[out_col] = np.where(n > 1, (r - 1) / (n - 1), 0.0)
        return out

    return _keyed(ds, [key], cfg, _meta_rows(ds)).map_batches(
        pr, batch_format="pandas", batch_size=None)


def grouped_dense_rank(ds, *, key: str, col: str,
                       out_col: str = "dense_rank",
                       cfg: EngineConfig = DEFAULT_CONFIG):
    """dense_rank() OVER (PARTITION BY key ORDER BY col): 1-based
    gapless rank of each row's value within its group — ties share a
    rank and the next distinct value takes rank+1.  NULLs rank LAST as
    one peer group (NULLS LAST, like grouped_percent_rank).  Integer
    output, exact on both sides by construction.

    ONE hash shuffle on the key, then a per-block grouped dense rank
    (groups arrive complete); all input columns pass through."""
    cols = list(ds.schema().names)

    def dr(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = df[cols].copy()
            out[out_col] = pd.Series([], dtype="int64")
            return out
        s = df.sort_values([key, col], kind="stable")
        r = s.groupby(key, sort=False)[col] \
            .rank(method="dense", na_option="bottom")
        out = s[cols].copy()
        out[out_col] = r.to_numpy(dtype=np.int64)
        return out

    return _keyed(ds, [key], cfg, _meta_rows(ds)).map_batches(
        dr, batch_format="pandas", batch_size=None)


def impute_by_group(ds, *, key: str, col: str,
                    cfg: EngineConfig = DEFAULT_CONFIG):
    """Missing-value imputation by group mean with global-mean
    fallback — the data-prep staple: NULL ``col`` values fill with
    ``round(group_sum / group_count)`` over the group's non-null rows
    (half away from zero, the SQL round), and rows whose whole group
    is null fall back to the corpus mean.  ``col`` must be integer-
    or-NaN: integer sums are exact and layout-invariant, the
    sum/count quotient is the same IEEE double on both sides, so the
    imputed integers replay bit-for-bit in SQL.

    Output: input columns with ``col`` filled (int64) +
    ``was_imputed`` (bool).

    Shape: per-block (key, sum, count) combiner -> ONE keyed_sum;
    the global fallback folds the same partials driver-side (two
    ints); means attach back by one left join — the observed rows
    never re-ship their payload anywhere else."""
    import ray

    from ..util import round_half_away, safe_join

    def partials(d: pd.DataFrame) -> pd.DataFrame:
        v = d[col]
        ok = v.notna()
        g = (pd.DataFrame({key: d[key][ok],
                           "_s": v[ok].astype(np.int64)})
             .groupby(key, sort=False)["_s"]
             .agg(["sum", "count"]).reset_index())
        return pd.DataFrame({key: g[key],
                             "_s": g["sum"].astype(np.int64),
                             "_c": g["count"].astype(np.int64)})

    sums = keyed_sum(ds.map_batches(partials, batch_format="pandas"),
                     [key], ["_s", "_c"], cfg).materialize()
    tot = sums.map_batches(
        lambda d: pd.DataFrame({"_s": [d["_s"].sum()],
                                "_c": [d["_c"].sum()]}),
        batch_format="pandas").to_pandas()
    gs, gc = int(tot["_s"].sum()), int(tot["_c"].sum())
    if gc == 0:
        raise ValueError(f"impute_by_group: no non-null {col!r} rows")
    gmean = int(round_half_away(gs / gc))
    gref = ray.put(gmean)

    means = sums.map_batches(
        lambda d: pd.DataFrame({
            key: d[key],
            "_m": round_half_away(
                d["_s"].to_numpy(np.float64)
                / d["_c"].to_numpy(np.float64)).astype(np.int64)}),
        batch_format="pandas")
    j = safe_join(ds, means, "left_outer",
                  cfg.resolve_join_partitions(), (key,))

    def fill(d: pd.DataFrame) -> pd.DataFrame:
        g = ray.get(gref)
        v = d[col]
        miss = v.isna().to_numpy()
        m = (d["_m"] if "_m" in d.columns
             else pd.Series(np.nan, index=d.index))
        filled = np.where(miss,
                          m.fillna(g).to_numpy(np.float64),
                          v.fillna(0).to_numpy(np.float64))
        out = d[[c for c in d.columns if c != "_m"]].copy()
        out[col] = filled.astype(np.int64)
        out["was_imputed"] = miss
        return out

    return j.map_batches(fill, batch_format="pandas")


def grouped_first_last(ds, *, key: str, order_cols: list[str],
                       cols: list[str],
                       cfg: EngineConfig = DEFAULT_CONFIG):
    """first_value / last_value per group under a TOTAL order
    (``order_cols`` must include a unique tiebreak): one output row
    per key with ``first_<c>`` and ``last_<c>`` for every ``c`` in
    ``cols`` — the first-touch / last-touch attribution shape.

    The per-block head(1)+tail(1) per key BEFORE the shuffle is a
    correct combiner (only a block's extreme rows can be group-global
    extremes), so at most 2 rows per (block, key) move; then ONE hash
    shuffle and a per-block final pick."""
    need = [key, *order_cols, *dict.fromkeys(
        c for c in cols if c not in order_cols)]

    def extremes(df: pd.DataFrame) -> pd.DataFrame:
        s = df[need].sort_values([key, *order_cols], kind="stable")
        g = s.groupby(key, sort=False)
        return pd.concat([g.head(1), g.tail(1)]).drop_duplicates()

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        s = extremes(df).sort_values([key, *order_cols], kind="stable")
        g = s.groupby(key, sort=False)
        first, last = g.head(1), g.tail(1)
        out = {key: first[key].to_numpy()}
        for c in cols:
            out[f"first_{c}"] = first[c].to_numpy()
            out[f"last_{c}"] = last[c].to_numpy()
        return pd.DataFrame(out)

    partial = ds.map_batches(extremes, batch_format="pandas")
    return _keyed(partial, [key], cfg, _meta_rows(ds)).map_batches(
        finalize, batch_format="pandas", batch_size=None)


# --------------------------------------------------------------------------
# anti join (left rows with NO key match in right)
# --------------------------------------------------------------------------


def anti_join(left, right, *, on: list[str],
              cfg: EngineConfig = DEFAULT_CONFIG,
              right_rows: int | None = None):
    """left ▷ right: rows of ``left`` whose ``on`` key appears nowhere
    in ``right`` (SQL NOT EXISTS: null-keyed left rows are kept).  Ray
    Data has no native anti join; a right side with a caller-known row
    count at or below ``cfg.broadcast_max_rows`` is broadcast as a key
    set (one ray.put, an exact vectorized isin per batch), else it
    shuffles: left_outer join against the distinct right keys + a
    marker-null filter (the same strategy gate as hydrate / the
    pair-set filters in stages/evaluate.py)."""
    return _exists_filter(left, right, on=on, cfg=cfg,
                          right_rows=right_rows, keep_matched=False)


def semi_join(left, right, *, on: list[str],
              cfg: EngineConfig = DEFAULT_CONFIG,
              right_rows: int | None = None):
    """left ⋉ right: rows of ``left`` whose ``on`` key appears at
    least once in ``right`` (SQL EXISTS: null-keyed left rows match
    nothing and are dropped), each left row emitted EXACTLY once no
    matter how many right rows share the key.  Same broadcast-or-
    shuffle gate as anti_join; the shuffle path adds one keyed
    re-distinct of the right keys (per-block distinct is only a
    combiner — a key present in two right blocks would otherwise
    duplicate its left matches through the join)."""
    return _exists_filter(left, right, on=on, cfg=cfg,
                          right_rows=right_rows, keep_matched=True)


def _exists_filter(left, right, *, on: list[str], cfg: EngineConfig,
                   right_rows: int | None, keep_matched: bool):
    import ray

    from ..util import safe_join, scrub_empty_blocks, stateful_map

    if right_rows == 0:
        # empty right: EXISTS matches nothing, NOT EXISTS keeps all —
        # short-circuit BEFORE touching right (a 0-row dataset's
        # to_pandas() may carry no columns at all, and the join path
        # crashes on 0-row inputs)
        if keep_matched:
            mat = scrub_empty_blocks(left)
            from ..util import _empty_like

            return _empty_like(mat)
        return left

    if right_rows is not None and right_rows <= cfg.broadcast_max_rows:
        # SQL NOT EXISTS semantics: null-keyed right rows match nothing
        # (dropped from the index), null-keyed left rows are always kept;
        # values compare natively (1 == 1.0, no string rendering)
        rk = right.select_columns(list(on)).to_pandas() \
            .dropna(subset=list(on))
        ref = ray.put(pd.MultiIndex.from_frame(rk[list(on)]))

        class _Filter:
            def __init__(self, r):
                self.index = ray.get(r)

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                if not len(df):
                    return df
                ix = pd.MultiIndex.from_frame(df[list(on)])
                # the right index holds no null keys, so isin is False
                # for null-keyed left rows: EXISTS drops them as-is,
                # NOT EXISTS re-keeps them explicitly
                if keep_matched:
                    keep = ix.isin(self.index)
                else:
                    keep = (~ix.isin(self.index)
                            | df[list(on)].isna().any(axis=1).to_numpy())
                return df.loc[keep].reset_index(drop=True)

        return stateful_map(left, _Filter, (ref,), batch_format="pandas")

    cols = list(left.schema().names)

    # dtype-mismatched NUMERIC keys: Arrow's hash join matches raw
    # physical types, while the broadcast path above matches by Python
    # equality (2 == 2.0 across int/float).  Promote mismatched numeric
    # key columns to their common super-type via temp join columns so
    # the two strategy paths always agree; the temp columns never reach
    # the output (null_filter projects back to the original columns).
    import pyarrow.compute as pc

    def _arrow_types(ds) -> dict:
        """name -> arrow type; robust to pandas-block schemas whose
        extension dtypes (Int64 etc.) Ray's Schema.types can't map."""
        s = ds.schema()
        base = getattr(s, "base_schema", None)
        if isinstance(base, pa.Schema):
            return {f.name: f.type for f in base}
        out = {}
        for name, dt in zip(s.names, getattr(base, "types", [])):
            try:
                out[name] = pa.from_numpy_dtype(dt)
            except Exception:
                try:  # pandas extension dtypes round-trip via an
                    out[name] = pa.array(pd.array([], dtype=dt)).type
                except Exception:  # empty typed array
                    out[name] = None
        return out

    lt = _arrow_types(left)
    rt = _arrow_types(right)

    def _num(t):
        return t is not None and (
            pa.types.is_integer(t) or pa.types.is_floating(t))

    promote = {}
    for c in on:
        a, b = lt.get(c), rt.get(c)
        if a is not None and b is not None and a != b \
                and _num(a) and _num(b):
            promote[c] = (
                pa.float64()
                if pa.types.is_floating(a) or pa.types.is_floating(b)
                else pa.int64())
    join_on = [f"_ak_{c}" if c in promote else c for c in on]

    def dk(t):
        # per-block distinct is a combiner; cross-block duplicate keys
        # just mark a matched left row more than once — still dropped
        keys = t.select(list(on)).group_by(list(on)).aggregate([])
        for c, tgt in promote.items():
            i = keys.schema.get_field_index(c)
            keys = keys.set_column(
                i, f"_ak_{c}", pc.cast(keys.column(c), tgt))
        return keys.append_column(
            "_r", pa.array(np.ones(len(keys), dtype=np.int8)))

    left_in = left
    if promote:
        def addk(t):
            for c, tgt in promote.items():
                t = t.append_column(f"_ak_{c}", pc.cast(t.column(c), tgt))
            return t

        left_in = left.map_batches(addk, batch_format="pyarrow")

    marked = right.map_batches(dk, batch_format="pyarrow")
    if keep_matched:
        # semi join must join against GLOBALLY distinct right keys:
        # per-block distinct is only a combiner, and a key present in
        # two right blocks would emit its left matches twice
        def redistinct(t: pa.Table) -> pa.Table:
            keys = t.select(list(join_on)) \
                .group_by(list(join_on)).aggregate([])
            return keys.append_column(
                "_r", pa.array(np.ones(len(keys), dtype=np.int8)))

        marked = marked.repartition(
            cfg.resolve_join_partitions(), keys=list(join_on)) \
            .map_batches(redistinct, batch_format="pyarrow",
                         batch_size=None)
    joined = safe_join(left_in, marked, join_type="left_outer",
                       num_partitions=cfg.resolve_join_partitions(),
                       on=tuple(join_on))

    def null_filter(df: pd.DataFrame) -> pd.DataFrame:
        if "_r" not in df.columns:
            return df[cols] if not keep_matched else df[cols].iloc[:0]
        mask = df["_r"].notna() if keep_matched else df["_r"].isna()
        return df.loc[mask, cols].reset_index(drop=True)

    return joined.map_batches(null_filter, batch_format="pandas")


# --------------------------------------------------------------------------
# grouped standardization (z-scores) — the per-key outlier/anomaly signal
# --------------------------------------------------------------------------


def grouped_zscore(ds, *, key: str, col: str, keep_cols: list[str],
                   out_col: str = "zscore",
                   cfg: EngineConfig = DEFAULT_CONFIG):
    """Standardize ``col`` within each ``key`` group:
    z = (v - mean) / std_pop, 0 when the group is constant — the
    per-group outlier / anomaly-score primitive (filter on |z| to get
    an outlier op).

    Shape: a per-batch (key, n, sum, sumsq) combiner feeds ONE tiny
    groupby (one row per key moves per block), the stats attach back
    via a hash join (group cardinality is unbounded, so no broadcast),
    and the z map is stateless.  Variance uses the one-pass
    sumsq/n - mean^2 identity — exact-replayable in SQL, numerically
    fine while |mean| / std stays moderate (document inputs in the
    1e6-offset regime should be centered first)."""
    from ..util import safe_join

    # two consumers (stats pass + join left side): materialize once so
    # the upstream pipeline doesn't execute twice
    ds = ds.materialize()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        g = pd.DataFrame({key: df[key], "_n": 1, "_s": v, "_ss": v * v}) \
            .groupby(key, sort=False).sum().reset_index()
        g["_n"] = g["_n"].astype("int64")
        return g

    stats = keyed_sum(ds.map_batches(partial, batch_format="pandas"),
                      [key], ["_n", "_s", "_ss"], cfg)

    def finalize_stats(d: pd.DataFrame) -> pd.DataFrame:
        n = d["_n"].to_numpy(dtype=np.float64)
        mu = d["_s"].to_numpy(dtype=np.float64) / n
        var = d["_ss"].to_numpy(dtype=np.float64) / n - mu * mu
        return pd.DataFrame({key: d[key], "_mu": mu,
                             "_sd": np.sqrt(np.maximum(var, 0.0))})

    joined = safe_join(
        ds.map_batches(lambda d: d[[*keep_cols, key, col]],
                       batch_format="pandas"),
        stats.map_batches(finalize_stats, batch_format="pandas"),
        join_type="inner", num_partitions=cfg.resolve_join_partitions(),
        on=(key,))

    def z(d: pd.DataFrame) -> pd.DataFrame:
        sd = d["_sd"].to_numpy(dtype=np.float64)
        v = d[col].to_numpy(dtype=np.float64)
        mu = d["_mu"].to_numpy(dtype=np.float64)
        out = d[[*keep_cols, key, col]].copy()
        with np.errstate(invalid="ignore", divide="ignore"):
            out[out_col] = np.where(sd > 0, (v - mu) / sd, 0.0)
        return out

    return joined.map_batches(z, batch_format="pandas")


# --------------------------------------------------------------------------
# global top-k (no key) — partial top-k combiner, never a full sort
# --------------------------------------------------------------------------


def global_topk(ds, *, order_cols: list[str], descending: list[bool],
                k: int):
    """Top ``k`` rows of the whole dataset by ``order_cols`` — the
    keyless analogue of group_topk: each block contributes at most its
    own top-k (a row outside a block's top-k cannot be in the global
    top-k), the <= k-per-block survivors gather to ONE block for the
    final sort+head.  Replaces sort().limit(k)'s full all-to-all sort
    with a combiner whose shuffle volume is blocks x k rows."""
    cols = list(ds.schema().names)
    asc = [not d for d in descending]

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(order_cols, ascending=asc,
                              kind="stable").head(k)[cols]

    return ds.map_batches(topk, batch_format="pandas") \
        .repartition(1) \
        .map_batches(topk, batch_format="pandas", batch_size=None)


def keyed_reduce(parts, keys: list[str], val_cols: list[str],
                 how: str = "min", cfg: EngineConfig = DEFAULT_CONFIG,
                 n_rows: int | None = None):
    """keyed_sum's order-free sibling for ``min`` / ``max``: per-block
    pandas partial -> ONE hash repartition on the keys -> per-block
    final reduce.  min/max are idempotent and commutative, so unlike
    the float-sum case no deterministic pre-sort is needed — the
    result is layout-invariant for ANY dtype."""
    if how not in ("min", "max"):
        raise ValueError(f"keyed_reduce: how={how!r} not in (min, max)")

    def combine(d: pd.DataFrame) -> pd.DataFrame:
        if not len(d):
            return d[[*keys, *val_cols]]
        return getattr(
            d.groupby(keys, sort=False, dropna=False)[val_cols],
            how)().reset_index()

    pre = parts.map_batches(combine, batch_format="pandas")
    return _keyed(pre, keys, cfg, n_rows).map_batches(
        combine, batch_format="pandas", batch_size=None)


def grouped_ewma(ds, *, key: str, order_cols: list[str], val_col: str,
                 out_col: str = "ewma", num: int = 25, den: int = 100,
                 cfg: EngineConfig = DEFAULT_CONFIG):
    """Exponentially-weighted moving average per key in FIXED-POINT
    integer arithmetic — the trend-smoothing window, made
    layout-invariant and SQL-replayable:

        ewma_0 = x_0
        ewma_t = (num * x_t + (den - num) * ewma_{t-1}) // den

    A float EWMA's bits depend on the kernel's operation order (pandas
    ewm, a closed-form power sum and a sequential recursion all
    disagree in the last ulp), so it could never match a SQL replay;
    the integer recursion is exact, and a recursive CTE stepping
    row-by-row per key reproduces it bit-for-bit.  ``val_col`` must be
    NON-NEGATIVE int64 (cents): engine floor division and DuckDB's
    truncating ``//`` agree only for non-negative operands.

    ONE hash shuffle on the key, per-block sort, then the recursion is
    vectorized ACROSS groups: iteration j updates every group's j-th
    row at once, so the per-block Python loop is bounded by the LONGEST
    group in the block, not total rows.  ``order_cols`` must be a total
    order within each key (pass a unique tie-breaker)."""
    if not (0 < num <= den):
        raise ValueError("need 0 < num <= den")

    def ewma(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = df.copy()
            out[out_col] = pd.Series(dtype=np.int64)
            return out
        s = df.sort_values([key, *order_cols], kind="stable")
        vals = s[val_col].to_numpy(np.int64)
        if (vals < 0).any():
            raise ValueError(f"{val_col} must be non-negative for the "
                             "fixed-point EWMA (floor vs truncating "
                             "integer division diverge below zero)")
        keys = s[key].to_numpy()
        idx = np.arange(len(s))
        new_grp = np.r_[True, keys[1:] != keys[:-1]]
        pos = idx - np.maximum.accumulate(np.where(new_grp, idx, 0))
        ew = vals.copy()
        # rows grouped by within-group position, contiguous per j, so
        # the whole loop is O(n log n) total — not O(n * longest_group)
        order = np.argsort(pos, kind="stable")
        maxpos = int(pos.max())
        starts = np.searchsorted(pos[order], np.arange(maxpos + 2))
        for j in range(1, maxpos + 1):
            rows = order[starts[j]:starts[j + 1]]
            ew[rows] = (num * vals[rows]
                        + (den - num) * ew[rows - 1]) // den
        out = s.copy()
        out[out_col] = ew
        return out

    return _keyed(ds, [key], cfg, _meta_rows(ds)).map_batches(
        ewma, batch_format="pandas", batch_size=None)


def cube_sum(ds, *, keys: list[str], val_cols: list[str],
             filler: str = "(all)",
             cfg: EngineConfig = DEFAULT_CONFIG):
    """SQL GROUP BY CUBE: sums at EVERY key subset (2^k groupings),
    rollup_sum's cross-combination sibling with the same filler
    sentinel, NULL/filler enforcement and combiner cascade — the
    finest level aggregates the raw rows exactly once, every other
    subset is a keyed_sum over THAT already-aggregated table
    (materialized so it computes once), so total shuffle volume is the
    finest cardinality plus the subset cardinalities, never 2^k passes
    over the data."""
    from itertools import combinations

    def proj(d: pd.DataFrame) -> pd.DataFrame:
        for c in keys:
            if d[c].isna().any():
                raise ValueError(
                    f"cube_sum: key column {c!r} contains NULLs; "
                    f"coalesce them before cubing (sentinel is "
                    f"{filler!r})")
            if (d[c] == filler).any():
                raise ValueError(
                    f"cube_sum: key column {c!r} contains the filler "
                    f"sentinel {filler!r}; pick a different filler")
        return d[[*keys, *val_cols]]

    finest = keyed_sum(ds.map_batches(proj, batch_format="pandas"),
                       keys, val_cols, cfg).materialize()
    levels = [finest.map_batches(proj, batch_format="pandas")]
    subsets = [list(s) for r in range(len(keys) - 1, -1, -1)
               for s in combinations(keys, r)]
    for sub in subsets:

        def filled(d: pd.DataFrame, s=tuple(sub)) -> pd.DataFrame:
            out = d.copy()
            for c in keys:
                if c not in s:
                    out[c] = pd.array([filler] * len(d), dtype="string")
            return out[[*keys, *val_cols]]

        if sub:
            lvl = keyed_sum(finest, sub, val_cols, cfg)
            levels.append(lvl.map_batches(filled, batch_format="pandas"))
        else:
            def part(d: pd.DataFrame) -> pd.DataFrame:
                return d[val_cols].sum().to_frame().T

            tot = finest.map_batches(part, batch_format="pandas") \
                .repartition(1).map_batches(part, batch_format="pandas",
                                            batch_size=None)
            levels.append(tot.map_batches(filled, batch_format="pandas"))
    return levels[0].union(*levels[1:])


def grouped_winsorize(ds, *, key: str, col: str,
                      q_lo: float = 0.05, q_hi: float = 0.95,
                      out_col: str = "winsorized",
                      cfg: EngineConfig = DEFAULT_CONFIG):
    """Winsorization: clamp ``col`` to its per-``key`` [q_lo, q_hi]
    EXACT discrete quantiles (outlier taming before normalization /
    loss weighting).  All input columns pass through; the clamped
    value is appended as ``out_col`` in ``col``'s dtype — bounds are
    actual group elements (quantile_disc semantics via
    grouped_quantiles), so no float arithmetic enters and the result
    is layout-invariant and SQL-replayable.

    Shape: grouped_quantiles' (key, value)-count combiner produces the
    per-key bound table (2 rows per key); ONE hash join on the key
    attaches bounds (the bound table is #keys-sized — it shuffles,
    never broadcasts); the clamp is a stateless vectorized map."""
    if not 0 <= q_lo <= q_hi <= 1:
        raise ValueError(f"need 0 <= q_lo <= q_hi <= 1, "
                         f"got ({q_lo}, {q_hi})")
    from ..util import safe_join

    qt = grouped_quantiles(ds, key=key, col=col, qs=[q_lo, q_hi],
                           cfg=cfg)

    def to_bounds(df: pd.DataFrame) -> pd.DataFrame:
        lo = df[df["q"] == q_lo][[key, "value"]].rename(
            columns={"value": "_lo"})
        hi = df[df["q"] == q_hi][[key, "value"]].rename(
            columns={"value": "_hi"})
        return lo.merge(hi, on=key, how="inner")

    # both quantile rows of a key land in the same finalize block, so
    # the lo/hi merge is block-local
    bounds = qt.map_batches(to_bounds, batch_format="pandas")

    cols = list(ds.schema().names)
    j = safe_join(ds, bounds, join_type="inner",
                  num_partitions=cfg.resolve_join_partitions(),
                  on=(key,))

    def clamp(df: pd.DataFrame) -> pd.DataFrame:
        out = df[cols].copy()
        v = df[col].to_numpy()
        out[out_col] = np.minimum(
            np.maximum(v, df["_lo"].to_numpy()), df["_hi"].to_numpy())
        return out

    return j.map_batches(clamp, batch_format="pandas")


def grouped_quantiles_cont(ds, *, key: str, col: str, qs: list[float],
                           cfg: EngineConfig = DEFAULT_CONFIG):
    """EXACT linearly-interpolated quantiles of ``col`` per ``key``
    (SQL ``percentile_cont`` semantics): for each q, with the group's
    n values sorted ascending and pos = q*(n-1),

        value = v[floor(pos)] + (v[ceil(pos)] - v[floor(pos)])
                              * (pos - floor(pos))

    evaluated in float64 in EXACTLY that expression shape, so a SQL
    oracle that replays the same formula from row_number()-ranked
    values agrees bit-for-bit (DuckDB's own quantile_cont internals
    are NOT relied on).  Output: (key, q, value float64).

    Same scale shape as grouped_quantiles: a per-block
    (key, value) -> count combiner bounds the shuffle by DISTINCT
    (key, value) pairs; unbounded continuous domains should quantize
    upstream or use ops/sketch.kmv_quantiles."""
    qs = sorted(qs)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([key, col], sort=False).size()
                .reset_index(name="cnt"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        m = (df.groupby([key, col], sort=False)["cnt"].sum().reset_index()
             .sort_values([key, col], kind="stable").reset_index(drop=True))
        kv = m[key].to_numpy()
        vals = m[col].to_numpy()
        cnts = m["cnt"].to_numpy(dtype=np.int64)
        first = np.ones(len(m), dtype=bool)
        first[1:] = kv[1:] != kv[:-1]
        starts = np.where(first)[0]
        ends = np.append(starts[1:], len(m))
        csum = np.cumsum(cnts)
        out_k, out_q, out_v = [], [], []
        for s, e in zip(starts, ends):       # loop over keys IN BLOCK only
            base = csum[s - 1] if s else 0
            seg = csum[s:e] - base
            n = int(seg[-1])
            for q in qs:
                pos = np.float64(q) * np.float64(n - 1)
                lo = int(np.floor(pos))
                hi = int(np.ceil(pos))
                # ranks are 0-based; element r lives at the first seg
                # index whose cumulative count exceeds r
                vlo = np.float64(vals[s + int(np.searchsorted(seg, lo + 1))])
                vhi = np.float64(vals[s + int(np.searchsorted(seg, hi + 1))])
                frac = pos - np.float64(np.floor(pos))
                out_k.append(kv[s])
                out_q.append(q)
                out_v.append(vlo + (vhi - vlo) * frac)
        return pd.DataFrame({key: np.asarray(out_k),
                             "q": np.asarray(out_q, dtype=np.float64),
                             "value": np.asarray(out_v, dtype=np.float64)})

    counts = ds.select_columns([key, col]).map_batches(
        partial, batch_format="pandas")
    return _keyed(counts, [key], cfg, _meta_rows(ds)).map_batches(
        final, batch_format="pandas", batch_size=None)


def pareto_front(ds, *, id_cols: list[str], dims: list[str],
                 chunk: int = 2048, cfg: EngineConfig = DEFAULT_CONFIG):
    """The Pareto frontier (skyline, maximizing every ``dims`` column):
    rows for which NO other row is >= on all dims and > on at least
    one — the multi-objective data-selection primitive (keep the
    quality/recency/diversity-undominated examples).  Duplicate dim
    vectors do not dominate each other, so all co-optimal rows
    survive, matching the SQL NOT EXISTS oracle exactly.

    Scale shape: dominance is transitive through the skyline (any
    dominator of x is itself dominated only by skyline members), so a
    block-local skyline is a lossless combiner — stage 1 prunes each
    block to its local frontier in parallel, stage 2 folds the
    surviving candidates (expected O(log^d n) of them, the classic
    skyline bound) in ONE final block.  Within a block: rows sort
    lexicographically descending on dims, so every dominator of a row
    precedes it; candidates are checked chunk-at-a-time against the
    kept set with one numpy broadcast per chunk, and only the few
    intra-chunk survivors loop.
    """
    if not dims:
        raise ValueError("dims must be non-empty")
    cols = [*id_cols, *dims]

    def local_skyline(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[cols]
        s = df[cols].sort_values(
            dims, ascending=False, kind="stable").reset_index(drop=True)
        m = s[dims].to_numpy()
        kept_rows: list[np.ndarray] = []
        kept = np.empty((0, m.shape[1]), dtype=m.dtype)
        for c0 in range(0, len(m), chunk):
            blk = m[c0:c0 + chunk]
            if len(kept):
                # dominated by an already-kept row?
                ge = kept[None, :, :] >= blk[:, None, :]
                gt = kept[None, :, :] > blk[:, None, :]
                dom = (ge.all(axis=2) & gt.any(axis=2)).any(axis=1)
            else:
                dom = np.zeros(len(blk), dtype=bool)
            idx = np.where(~dom)[0]
            surv: list[int] = []
            for i in idx:                     # few intra-chunk survivors
                x = blk[i]
                ok = True
                for j in surv:
                    y = blk[j]
                    if (y >= x).all() and (y > x).any():
                        ok = False
                        break
                if ok:
                    surv.append(int(i))
            if surv:
                rows = np.asarray(surv, dtype=np.int64) + c0
                kept_rows.append(rows)
                kept = np.concatenate([kept, m[rows]], axis=0)
        keep_idx = (np.concatenate(kept_rows)
                    if kept_rows else np.empty(0, dtype=np.int64))
        return s.iloc[keep_idx]

    local = ds.select_columns(cols).map_batches(
        local_skyline, batch_format="pandas")
    # fold all local survivors in ONE block: constant-key repartition
    folded = local.map_batches(
        lambda d: d.assign(_pf=np.int64(0)), batch_format="pandas")
    return _keyed(folded, ["_pf"], cfg, None).map_batches(
        lambda d: local_skyline(d)[cols],
        batch_format="pandas", batch_size=None)


def grouped_ohlc(ds, *, keys: list[str], order_cols: list[str],
                 val_col: str,
                 cfg: EngineConfig = DEFAULT_CONFIG):
    """Open/high/low/close of ``val_col`` per key group, ordered by
    ``order_cols`` (which must be a total order within each group —
    pass a unique tie-breaker): the bucketed time-series summary
    (first/last/extremes per bucket).  Output: (keys..., open, high,
    low, close) with exact passthrough dtypes.

    Scale shape: a lossless combiner — each block emits at most FOUR
    candidate rows per key (argmin/argmax of the order tuple, min/max
    of the value), so the shuffle is bounded by 4 x #keys x #blocks;
    the final per-key fold applies the same selection to candidates.
    First/last are deterministic because the order tuple is unique;
    min/max are value-only and order-free."""
    sel = [*keys, *order_cols, val_col]

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[sel]
        s = df[sel].sort_values([*keys, *order_cols], kind="stable")
        g = s.groupby(keys, sort=False, dropna=False)
        first = g.head(1)
        last = g.tail(1)
        vmin = s.loc[g[val_col].idxmin()]
        vmax = s.loc[g[val_col].idxmax()]
        return (pd.concat([first, last, vmin, vmax], ignore_index=True)
                .drop_duplicates())

    def final(df: pd.DataFrame) -> pd.DataFrame:
        base = candidates(df)
        if not len(base):
            out = base[keys].copy()
            for c in ("open", "high", "low", "close"):
                out[c] = base[val_col]
            return out
        s = base.sort_values([*keys, *order_cols], kind="stable")
        g = s.groupby(keys, sort=False, dropna=False)
        first = g.head(1).set_index(keys)[val_col].rename("open")
        last = g.tail(1).set_index(keys)[val_col].rename("close")
        agg = g[val_col].agg(["max", "min"]).rename(
            columns={"max": "high", "min": "low"})
        out = pd.concat([first, agg, last], axis=1).reset_index()
        return out[[*keys, "open", "high", "low", "close"]]

    parts = ds.select_columns(sel).map_batches(
        candidates, batch_format="pandas")
    return _keyed(parts, keys, cfg, _meta_rows(ds)).map_batches(
        final, batch_format="pandas", batch_size=None)


# --------------------------------------------------------------------------
# incremental aggregate maintenance (persisted keyed-sum state)
# --------------------------------------------------------------------------


def incremental_keyed_sum(new_ds, state_path: str, *, keys: list[str],
                          val_cols: list[str], batch_id: str,
                          cfg: EngineConfig = DEFAULT_CONFIG,
                          n_rows: int | None = None) -> bool:
    """Fold one ingest batch into a PERSISTED keyed-sum state — the
    continuously-maintained aggregate of a streaming pipeline (running
    per-key counts/totals over an unbounded event feed), the aggregate
    sibling of ops/dedup.incremental_exact_dedup.

    State layout: ``state_path/inc_<batch_id>/`` — one parquet
    directory per ingest holding that batch's per-key PARTIAL sums
    (combiner output: #keys rows, never events).  Append-only and
    IDEMPOTENT per ``batch_id``: the partial is written to a temp dir
    and renamed into place (atomic on one filesystem), so a crashed
    ingest leaves no visible shard and is simply rerun, and a
    re-applied batch_id is a no-op (returns False).  Reading the
    state folds all shards with one tiny keyed_sum; ingests for
    DIFFERENT batch_ids may run concurrently (no shard ever depends
    on another — partials commute).

    Compaction (``compact_keyed_sum_state``) bounds the shard count
    without changing the fold's value."""
    import os
    import uuid

    final = os.path.join(state_path, f"inc_{batch_id}")
    if os.path.exists(final):
        return False
    partial = keyed_sum(new_ds.select_columns([*keys, *val_cols]),
                        keys, val_cols, cfg, n_rows).materialize()
    os.makedirs(state_path, exist_ok=True)
    tmp = os.path.join(state_path, f"_tmp_{batch_id}_{uuid.uuid4().hex}")
    partial.write_parquet(tmp)
    try:
        os.rename(tmp, final)
    except OSError:
        # lost the race to a concurrent identical batch — drop ours
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        return False
    return True


def _live_state_shards(state_path: str) -> list[str]:
    """Shard dirs that count toward the fold: all ``inc_*`` dirs minus
    the union of every present compact shard's exclusion manifest.
    Manifests carry the TRANSITIVE exclusion set, so the fold stays
    correct even if an earlier compact shard (and its manifest) was
    already deleted while some of its excluded shards linger."""
    import glob as _glob
    import json
    import os

    shards = sorted(_glob.glob(os.path.join(state_path, "inc_*")))
    excluded: set[str] = set()
    for s in shards:
        man = os.path.join(s, "_folded.json")
        if os.path.exists(man):
            with open(man) as f:
                excluded.update(json.load(f)["folded"])
    return [s for s in shards if os.path.basename(s) not in excluded]


def read_keyed_sum_state(state_path: str, *, keys: list[str],
                         val_cols: list[str],
                         cfg: EngineConfig = DEFAULT_CONFIG):
    """The maintained aggregate: ONE keyed_sum over every live shard's
    partial rows (shuffle bounded by #keys x #shards)."""
    import glob as _glob
    import os

    import ray.data as rd

    files = sorted(
        f for s in _live_state_shards(state_path)
        for f in _glob.glob(os.path.join(s, "*.parquet")))
    if not files:
        raise FileNotFoundError(
            f"no aggregate state shards under {state_path!r} — run "
            "incremental_keyed_sum first")
    return keyed_sum(rd.read_parquet(files), keys, val_cols, cfg)


def compact_keyed_sum_state(state_path: str, *, keys: list[str],
                            val_cols: list[str],
                            cfg: EngineConfig = DEFAULT_CONFIG) -> int:
    """Fold every live shard into one consolidated shard, bounding the
    shard count without changing the fold's value.  Crash-safe at
    every step: the consolidated shard is written to a temp dir WITH
    a ``_folded.json`` manifest naming the transitive exclusion set
    (the shards it replaces plus everything those shards had already
    excluded), then renamed into place atomically — so a reader at
    any instant sees either the old shards, or the compact shard
    whose manifest hides them; never both, never neither.  Excluded
    shards are physically deleted only after the rename; a crash
    mid-delete just leaves lingering dirs every future fold ignores.
    Returns the number of shards folded (0 = nothing to do)."""
    import glob as _glob
    import json
    import os
    import shutil
    import uuid

    live = _live_state_shards(state_path)
    if len(live) <= 1:
        return 0
    all_shards = sorted(_glob.glob(os.path.join(state_path, "inc_*")))
    prior_excluded = {os.path.basename(s) for s in all_shards} \
        - {os.path.basename(s) for s in live}
    folded = read_keyed_sum_state(state_path, keys=keys,
                                  val_cols=val_cols, cfg=cfg).materialize()
    gen = uuid.uuid4().hex[:8]
    tmp = os.path.join(state_path, f"_tmp_compact_{gen}")
    folded.write_parquet(tmp)
    manifest = sorted({os.path.basename(s) for s in live}
                      | prior_excluded)
    with open(os.path.join(tmp, "_folded.json"), "w") as f:
        json.dump({"folded": manifest}, f)
    os.rename(tmp, os.path.join(state_path, f"inc_zcompact_{gen}"))
    for s in all_shards:  # live + lingering: all now covered
        shutil.rmtree(s, ignore_errors=True)
    return len(live)


def global_rank(ds, *, val_col: str, tie_col: str,
                out_col: str = "global_rank",
                cfg: EngineConfig = DEFAULT_CONFIG):
    """GLOBAL dense ordering rank — row_number() OVER (ORDER BY
    val_col, tie_col) — WITHOUT a single-node sort, for an INTEGER
    value column and a unique integer tiebreak:

    1. per-block per-value count partials (bounded by the distinct-
       value domain, the grouped_quantiles trade) collapse in one
       single-block cumsum to the EXCLUSIVE global offset of every
       distinct value — broadcast as one small array;
    2. ONE hash shuffle on the value, then each block ranks ONLY its
       own values' rows by the tiebreak and adds the offset.

    All input columns pass through with ``out_col`` (1-based int64)
    appended.  A hot value lands on one block — acceptable exactly
    when the value domain is bounded; for continuous columns quantize
    upstream (same contract as grouped_quantiles / ks_statistic)."""
    import ray

    cols = list(ds.schema().names)

    def partial(d: pd.DataFrame) -> pd.DataFrame:
        g = (d.groupby(val_col, sort=False).size()
             .reset_index(name="_c"))
        g[val_col] = g[val_col].astype(np.int64)
        return g

    counts = (ds.select_columns([val_col])
              .map_batches(partial, batch_format="pandas").to_pandas()
              .groupby(val_col, sort=True)["_c"].sum())
    offs = counts.cumsum().shift(1, fill_value=0).astype(np.int64)
    vref = ray.put((offs.index.to_numpy(np.int64),
                    offs.to_numpy(np.int64)))

    def rank(d: pd.DataFrame) -> pd.DataFrame:
        if not len(d):
            out = d[cols].copy()
            out[out_col] = pd.Series([], dtype=np.int64)
            return out
        vals, offarr = ray.get(vref)
        s = d.sort_values([val_col, tie_col], kind="stable")
        base = offarr[np.searchsorted(
            vals, s[val_col].to_numpy(np.int64))]
        within = s.groupby(val_col, sort=False).cumcount() \
            .to_numpy(np.int64)
        out = s[cols].copy()
        out[out_col] = (base + within + 1).astype(np.int64)
        return out

    return _keyed(ds, [val_col], cfg, _meta_rows(ds)).map_batches(
        rank, batch_format="pandas", batch_size=None)
