"""Deduplication operators for a document table.

* exact_dedup           — 64-bit digest hash-partition -> per-block
                          value groupby (min id); one shuffle, document
                          bytes move exactly once
* minhash_lsh_dup_pairs — shingle -> MinHash -> banded LSH buckets ->
                          candidate pairs -> exact signature-Jaccard
                          filter (reuses the ER engine's minhash kernels
                          and pair machinery — same shuffle shapes)
* minhash_dedup         — pairs -> union-find -> (doc_id, canonical_id)
* simhash_dup_pairs     — 64-bit SimHash + banded hamming buckets
                          (band count derived from max_hamming so the
                          pigeonhole recall guarantee always holds)
* ngram_jaccard_pairs   — exact character-q-gram Jaccard; candidates via
                          LSH (approximate recall net, scale path) or
                          PREFIX FILTERING (lossless, the exact path)
* embedding_dup_pairs   — cosine near-dup via random-hyperplane LSH
                          buckets + exact cosine filter
* exact_cosine_pairs    — exact all-pairs cosine >= threshold
                          (distributed block x broadcast-matrix)
* common_line_dedup     — C4/Falcon boilerplate-line removal: lines in
                          >= min_docs distinct docs are dropped (exact
                          per-batch distinct-doc partials, one digest
                          shuffle, broadcast strip set)
* dup_gram_stats        — ExactSubstr-style duplication signal: per doc,
                          how many of its distinct token n-grams occur
                          in >= 2 docs (gram-digest doc-frequency via
                          one combiner-reduced shuffle + one semi-join)
* incremental_exact_dedup / incremental_minhash_dedup — continuous-
                          ingestion dedup against a PERSISTED index
                          (exact content / MinHash signatures);
                          first-seen wins across increments

Scale contract: all candidate generation is bucketed (never all-pairs
except ``exact_cosine_pairs``, which is exact by definition), and NO
stage materializes an input-sized table on the driver.  Verify state
(signatures / gram sets / vectors) is hydrated onto the pair table
either by hash-shuffle joins (scale path) or as OBJECT-STORE BLOCK REFS
fetched once per verify actor — the driver only ever handles refs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions import minhash as mh
from ..stages.cluster import connected_components
from ..stages.pairs import generate_pairs
from ..util import safe_join

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id",
                cfg: EngineConfig = DEFAULT_CONFIG,
                n_rows: int | None = None):
    """One row per distinct ``col`` value with the smallest id — the
    hash-partition + per-group-first pattern. Output columns:
    (col, id_col).

    A per-block combiner (partial min per text) runs before any data
    moves, so only one survivor per (block, text) is shuffled.  Then
    ONE hash shuffle, keyed on a 64-bit content digest (equal texts
    always co-locate; a digest collision merely puts two groups in one
    partition, where the per-block groupby still separates them by the
    actual value) — or, when ``n_rows`` (caller-known or parquet
    metadata) is at or below ``cfg.gather_max_keys``, a plain
    repartition(1) + one final combine (the small-input gather gate)."""

    def add_digest(df: pd.DataFrame) -> pd.DataFrame:
        t = df[col].fillna("").astype(str).to_numpy(dtype=object)
        return pd.DataFrame({
            "d1": pd.util.hash_array(t), col: df[col], id_col: df[id_col]})

    def block_min(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(col, sort=False, dropna=False)[id_col].min()
               .reset_index())
        return out[[col, id_col]]

    if n_rows is None:
        try:
            n_rows = ds._meta_count()
        except Exception:
            n_rows = None
    partial = ds.map_batches(block_min, batch_format="pandas")
    if (n_rows is not None and cfg.gather_max_keys > 0
            and n_rows <= cfg.gather_max_keys):
        return partial.repartition(1).map_batches(
            block_min, batch_format="pandas", batch_size=None)
    return (
        partial.map_batches(add_digest, batch_format="pandas")
        .repartition(cfg.resolve_join_partitions(), keys=["d1"])
        .map_batches(block_min, batch_format="pandas", batch_size=None)
    )


def dedup_keep_best(ds, *, key_col: str, score_col: str, id_col: str,
                    keep_cols: list[str] | None = None,
                    cfg: EngineConfig = DEFAULT_CONFIG,
                    n_rows: int | None = None):
    """Quality-aware duplicate representative selection: one row per
    distinct ``key_col`` value — the row with the LARGEST ``score_col``
    (ties -> smallest ``id_col``) — plus ``n_dups``, the group size.
    exact_dedup keeps the first id; real corpus prep keeps the BEST
    member (longest original, highest quality score) of each
    duplicate group, which this does in the same shape: a per-block
    argmax+count combiner (one survivor row and one partial count per
    (block, key) leave each block), then ONE hash shuffle keyed on a
    64-bit digest of the key, then the same combiner again.  A digest
    collision co-locates two groups, where the groupby still separates
    them by the actual key value."""
    keep = [c for c in (keep_cols or [])
            if c not in (key_col, score_col, id_col)]
    cols = [key_col, id_col, score_col, *keep]

    def block_best(df: pd.DataFrame) -> pd.DataFrame:
        nd = (df["_nd"] if "_nd" in df.columns
              else pd.Series(np.ones(len(df), dtype=np.int64),
                             index=df.index))
        d = df.assign(_nd=nd)
        d["_cnt"] = d.groupby(key_col, sort=False,
                              dropna=False)["_nd"].transform("sum")
        best = (d.sort_values([key_col, score_col, id_col],
                              ascending=[True, False, True], kind="stable")
                .groupby(key_col, sort=False, dropna=False).head(1))
        out = best[cols].copy()
        out["_nd"] = best["_cnt"].to_numpy()
        return out

    def add_digest(df: pd.DataFrame) -> pd.DataFrame:
        t = df[key_col].fillna("").astype(str).to_numpy(dtype=object)
        return df.assign(d1=pd.util.hash_array(t))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = block_best(df)
        return out.rename(columns={"_nd": "n_dups"})[[*cols, "n_dups"]]

    if n_rows is None:
        try:
            n_rows = ds._meta_count()
        except Exception:
            n_rows = None
    partial = ds.select_columns(cols).map_batches(
        block_best, batch_format="pandas")
    if (n_rows is not None and cfg.gather_max_keys > 0
            and n_rows <= cfg.gather_max_keys):
        return partial.repartition(1).map_batches(
            finalize, batch_format="pandas", batch_size=None)
    return (partial.map_batches(add_digest, batch_format="pandas")
            .repartition(cfg.resolve_join_partitions(), keys=["d1"])
            .map_batches(lambda d: finalize(d.drop(columns=["d1"])),
                         batch_format="pandas", batch_size=None))


# --------------------------------------------------------------------------
# payload hydration (shared by every verify stage)
# --------------------------------------------------------------------------


_LINE_STRIP = " \t\r"


def common_line_dedup(ds, col: str = "text", id_col: str = "doc_id",
                      min_docs: int = 2,
                      cfg: EngineConfig = DEFAULT_CONFIG,
                      n_rows: int | None = None):
    """C4/Falcon-style boilerplate-line removal: drop every line whose
    STRIPPED form occurs in at least ``min_docs`` DISTINCT documents
    (nav bars, cookie banners, template footers).  Empty lines never
    count and are always kept.  Output: ``(id_col, clean_text)`` with
    the surviving lines rejoined by ``\\n`` in original order.

    Scale shape: each batch emits a (line -> distinct-doc-count)
    partial — exact, because a document's lines live in one batch, so
    per-batch distinct-doc counts are disjoint and SUM to the global
    document frequency.  ONE hash shuffle on the line digest combines
    the partials.  The STRIP is strategy-gated on the common-line
    count (``cfg.broadcast_max_rows``, the engine-wide gate): a small
    set is broadcast via ``ray.put`` and stripped in a stateless
    vectorized map (document bytes move zero extra times); above the
    gate the common-line table NEVER lands on the driver or in a
    worker heap — documents explode to (doc, line_no, line), hash
    LEFT-OUTER join against the common table marks boilerplate lines,
    and survivors re-aggregate per doc in line order (one extra
    doc-keyed shuffle).  At 100-TB crawl scale the boilerplate set is
    billions of lines, so the join path is the default regime; the
    broadcast path is the small-corpus fast path."""
    import ray

    from ..util import scrub_empty_blocks, stateful_map

    def line_partials(df: pd.DataFrame) -> pd.DataFrame:
        text = df[col].fillna("").astype(str)
        lines = text.str.split("\n")
        lens = lines.str.len().to_numpy(dtype=np.int64)
        f = pd.DataFrame({
            "doc": np.repeat(df[id_col].to_numpy(), lens),
            "sline": np.concatenate(lines.to_numpy()) if lens.sum()
            else np.array([], dtype=object),
        })
        f["sline"] = f["sline"].str.strip(_LINE_STRIP)
        f = f[f["sline"] != ""]
        g = (f.drop_duplicates().groupby("sline", sort=False).size()
             .reset_index(name="df_part"))
        g["lh"] = pd.util.hash_array(g["sline"].to_numpy(dtype=object))
        return g

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("sline", sort=False)["df_part"].sum()
               .reset_index())
        return out.loc[out["df_part"] >= min_docs, ["sline"]]

    if n_rows is None:
        try:
            n_rows = ds._meta_count()
        except Exception:
            n_rows = None
    partial = scrub_empty_blocks(
        ds.map_batches(line_partials, batch_format="pandas"),
        pa.schema([("sline", pa.string()), ("df_part", pa.int64()),
                   ("lh", pa.uint64())]))
    if (n_rows is not None and cfg.gather_max_keys > 0
            and n_rows <= cfg.gather_max_keys):
        common = partial.repartition(1).map_batches(
            combine, batch_format="pandas", batch_size=None)
    else:
        common = partial.repartition(
            cfg.resolve_join_partitions(), keys=["lh"]).map_batches(
            combine, batch_format="pandas", batch_size=None)
    common_mat = scrub_empty_blocks(
        common, pa.schema([("sline", pa.string())]))
    if common_mat.count() > cfg.broadcast_max_rows:
        return _strip_common_joined(ds, common_mat, col, id_col, cfg)

    # small boilerplate set: broadcast once
    common_df = common_mat.to_pandas()
    ref = ray.put(frozenset(common_df["sline"]) if len(common_df)
                  else frozenset())

    class StripCommon:
        def __init__(self, r):
            self.common = ray.get(r)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            text = df[col].fillna("").astype(str)
            lines = text.str.split("\n")
            lens = lines.str.len().to_numpy(dtype=np.int64)
            idx = np.arange(len(df))
            f = pd.DataFrame({
                "i": np.repeat(idx, lens),
                "line": np.concatenate(lines.to_numpy()) if lens.sum()
                else np.array([], dtype=object),
            })
            s = f["line"].str.strip(_LINE_STRIP)
            kept = f[(s == "") | ~s.isin(self.common)]
            joined = kept.groupby("i", sort=True)["line"].agg("\n".join)
            out = joined.reindex(idx, fill_value="")
            return pd.DataFrame({id_col: df[id_col].to_numpy(),
                                 "clean_text": out.to_numpy()})

    return stateful_map(ds, StripCommon, (ref,), batch_format="pandas")


def _strip_common_joined(ds, common, col: str, id_col: str,
                         cfg: EngineConfig):
    """Distributed strip for ``common_line_dedup`` when the boilerplate
    set exceeds the broadcast gate: explode docs to (doc, line_no,
    line), LEFT-OUTER hash join against the common-line table (a
    marker column flags boilerplate; empty lines never match — the
    counting stage drops them — so they are always kept), then one
    doc-keyed shuffle re-aggregates the surviving lines per document
    in original order.  Bit-identical to the broadcast strip; costs
    one extra pass of the document bytes through the shuffle instead
    of a whole-set worker-heap broadcast."""
    from ..util import safe_join

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        text = df[col].fillna("").astype(str)
        lines = text.str.split("\n")
        lens = lines.str.len().to_numpy(dtype=np.int64)
        total = int(lens.sum())
        csum = np.cumsum(lens)
        out = pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), lens),
            "_ln": np.arange(total, dtype=np.int64)
            - np.repeat(csum - lens, lens),
            "_line": np.concatenate(lines.to_numpy()) if total
            else np.array([], dtype=object),
        })
        out["_sline"] = out["_line"].str.strip(_LINE_STRIP)
        return out

    def mark(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["_sline"])
        return t.append_column(
            "_r", pa.array(np.ones(len(t), dtype=np.int8)))

    from ..util import scrub_empty_blocks

    exploded = ds.map_batches(explode, batch_format="pandas")
    marked = common.map_batches(mark, batch_format="pyarrow")
    joined = scrub_empty_blocks(safe_join(
        exploded, marked, join_type="left_outer",
        num_partitions=cfg.resolve_join_partitions(), on=("_sline",)))

    def rejoin(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({id_col: np.array([], dtype=object),
                                 "clean_text": np.array([], dtype=object)})
        kept = df[df["_r"].isna()] if "_r" in df.columns else df
        s = kept.sort_values([id_col, "_ln"], kind="stable")
        agg = s.groupby(id_col, sort=False)["_line"].agg("\n".join)
        # every doc emits a row, even when all its lines were stripped
        all_ids = pd.unique(df[id_col])
        out = agg.reindex(all_ids, fill_value="")
        return pd.DataFrame({id_col: out.index.to_numpy(),
                             "clean_text": out.to_numpy()})

    return joined.repartition(
        cfg.resolve_join_partitions(), keys=[id_col]).map_batches(
        rejoin, batch_format="pandas", batch_size=None)


def _payload_refs(payload):
    """Materialized payload Dataset -> its non-empty block refs.  The
    driver handles ONLY refs; block data stays in the object store and
    is fetched once per verify actor."""
    return [
        ref
        for bundle in payload.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows
    ]


def _block_to_pandas(block) -> pd.DataFrame:
    if isinstance(block, pd.DataFrame):
        return block
    from ray.data.block import BlockAccessor

    return BlockAccessor.for_block(block).to_pandas()


class _BroadcastVerify:
    """map_batches actor: pairs batch -> verified pairs, looking payload
    rows up in the broadcast (block-ref) payload table."""

    def __init__(self, refs, fn):
        import ray

        parts = [_block_to_pandas(b) for b in ray.get(list(refs))]
        df = (pd.concat(parts, ignore_index=True) if parts
              else pd.DataFrame({"doc": pd.Series([], dtype="string")}))
        self.index = pd.Index(df["doc"].astype(str))
        self.df = df.reset_index(drop=True)
        self.fn = fn

    def __call__(self, pairs: pd.DataFrame) -> pd.DataFrame:
        if not len(pairs):
            return self.fn(None, None, pairs)
        ia = self.index.get_indexer(pairs["id_a"].astype(str))
        ib = self.index.get_indexer(pairs["id_b"].astype(str))
        a = self.df.iloc[ia].reset_index(drop=True)
        b = self.df.iloc[ib].reset_index(drop=True)
        return self.fn(a, b, pairs.reset_index(drop=True))


def _verify_pairs(pairs, payload, payload_cols, fn,
                  cfg: EngineConfig, n_docs: int, prefilter: bool = True):
    """pairs (id_a, id_b) + payload (doc, *payload_cols) -> verified
    pairs via ``fn(a_rows, b_rows, pairs) -> filtered pairs``.

    * broadcast (n_docs <= cfg.broadcast_max_rows): payload block refs
      are shipped to an actor pool; fetched once per actor, zero
      re-shipping per batch, nothing on the driver.
    * join: two hash-shuffle joins hydrate the payload columns onto the
      pair table — the 100-TB path.

    Above ``cfg.verify_prefilter_min_docs`` payload rows, the payload is
    first reduced to the docs the pair table actually references (the
    candidate fraction — typically small): the distinct pair-id set is
    broadcast once and the payload passes through one vectorized isin
    (``semi_join``'s broadcast path — NO shuffle), so every downstream
    hydration byte (per-actor broadcast fetch, or join shuffle volume)
    shrinks by the non-candidate fraction.  Skipped when the id set
    itself exceeds the broadcast gate (then nothing is saved) or on
    small payloads (two extra materializations would dominate).
    Callers whose pair table references (almost) EVERY payload doc by
    construction — semantic dedup emits all-pairs per cell, so every id
    appears — pass ``prefilter=False``: there the reduction saves zero
    bytes and its pair-table materialization is pure cost."""
    if (prefilter and cfg.verify_prefilter_min_docs > 0
            and n_docs > cfg.verify_prefilter_min_docs):
        from .relational import semi_join

        pairs = pairs.materialize()
        ids = pairs.map_batches(
            lambda df: pd.DataFrame({"doc": pd.unique(np.concatenate(
                [df["id_a"].to_numpy(dtype=object),
                 df["id_b"].to_numpy(dtype=object)]))}),
            batch_format="pandas").materialize()
        n_ids = ids.count()
        if n_ids <= cfg.broadcast_max_rows:
            payload = semi_join(payload, ids, on=["doc"], cfg=cfg,
                                right_rows=n_ids).materialize()
            n_docs = payload.count()
    strategy = cfg.hydrate_strategy
    if strategy == "auto":
        strategy = "broadcast" if n_docs <= cfg.broadcast_max_rows else "join"

    if strategy == "broadcast":
        from ..util import stateful_map

        refs = _payload_refs(payload)
        return stateful_map(pairs, _BroadcastVerify, (refs, fn),
                            batch_format="pandas")

    from ..stages.pairs import pair_schema

    nparts = cfg.resolve_join_partitions()
    ren_a = {"doc": "id_a", **{c: f"{c}_a" for c in payload_cols}}
    ren_b = {"doc": "id_b", **{c: f"{c}_b" for c in payload_cols}}

    def renamed(mapping):
        # rename_columns breaks on pandas-block datasets; map-rename instead
        # (also prunes payload columns the verify kernel doesn't need)
        return payload.map_batches(
            lambda df, m=mapping: df[["doc"] + payload_cols].rename(columns=m),
            batch_format="pandas")

    wide = safe_join(
        safe_join(pairs, renamed(ren_a), join_type="inner",
                  num_partitions=nparts, on=("id_a",),
                  empty_left_schema=pair_schema()),
        renamed(ren_b), join_type="inner",
        num_partitions=nparts, on=("id_b",),
    )

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        a = df[[f"{c}_a" for c in payload_cols]].rename(
            columns={f"{c}_a": c for c in payload_cols})
        b = df[[f"{c}_b" for c in payload_cols]].rename(
            columns={f"{c}_b": c for c in payload_cols})
        return fn(a, b, df[["id_a", "id_b"]].reset_index(drop=True))

    return wide.map_batches(apply, batch_format="pandas")


# --------------------------------------------------------------------------
# MinHash LSH
# --------------------------------------------------------------------------


def _sig_table(ds, col: str, id_col: str, num_perm: int):
    """documents -> materialized (doc, sig) payload; signatures are
    computed ONCE and reused for both banding and verification.

    Stored as uint32: every MinHash component is already reduced mod
    2^32 (functions/minhash.py universal hash), so narrowing the uint64
    kernel output is value-exact and HALVES every byte the signature
    table moves (materialized blocks, per-actor broadcast fetches, join
    shuffle volume)."""

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        sigs = mh.minhash_batch(df[col].fillna("").to_numpy(), num_perm)
        return pd.DataFrame({
            "doc": df[id_col].astype(str),
            "sig": [s.astype(np.uint32).tobytes() for s in sigs],
        })

    return ds.map_batches(collect, batch_format="pandas").materialize()


def _sig_matrix(col: pd.Series, num_perm: int) -> np.ndarray:
    buf = b"".join(col.to_numpy(dtype=object))
    return np.frombuffer(buf, dtype=np.uint32).reshape(-1, num_perm)


def _band_key_table(sig_payload, num_perm: int, bands: int, rows: int):
    """(doc, sig) -> long key table (key_type, key_value, conv_id)."""

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if not n:
            return pd.DataFrame({
                "key_type": pd.Series([], dtype="string"),
                "key_value": pd.Series([], dtype="string"),
                "conv_id": pd.Series([], dtype="string"),
            })
        sigs = _sig_matrix(df["sig"], num_perm)
        bkeys = mh.band_keys(sigs, bands, rows)
        band_ids = np.tile(np.arange(bands), n)
        flat = bkeys.reshape(-1)
        vals = np.array(
            [f"{b}:{format(v, 'x')}" for b, v in zip(band_ids, flat)],
            dtype=object)
        return pd.DataFrame({
            "key_type": np.full(n * bands, "minhash", dtype=object),
            "key_value": vals,
            "conv_id": np.repeat(df["doc"].to_numpy(), bands),
        })

    return sig_payload.map_batches(emit, batch_format="pandas")


def _sig_jaccard_fn(threshold: float, num_perm: int):
    """Verify kernel shared by every MinHash consumer: estimated
    Jaccard = fraction of equal signature components."""

    def fn(a, b, pairs_df):
        if a is None or not len(pairs_df):
            return pairs_df.assign(jaccard=np.zeros(len(pairs_df)))
        A = _sig_matrix(a["sig"], num_perm)
        B = _sig_matrix(b["sig"], num_perm)
        jac = (A == B).mean(axis=1)
        out = pairs_df.assign(jaccard=jac)
        return out[out["jaccard"] >= threshold].reset_index(drop=True)

    return fn


def minhash_lsh_dup_pairs(ds, col: str = "text", id_col: str = "doc_id",
                          threshold: float = 0.7, num_perm: int = 128,
                          cfg: EngineConfig = DEFAULT_CONFIG,
                          verify: bool = True):
    """Near-duplicate candidate pairs (id_a < id_b) whose estimated
    signature Jaccard >= threshold."""
    bands, rows = mh.optimal_param(threshold, num_perm)
    sig = _sig_table(ds, col, id_col, num_perm)
    n_docs = sig.count()
    pairs = generate_pairs(_band_key_table(sig, num_perm, bands, rows), cfg,
                           n_rows=n_docs * bands)
    if not verify:
        return pairs
    return _verify_pairs(pairs, sig, ["sig"],
                         _sig_jaccard_fn(threshold, num_perm), cfg,
                         n_docs=n_docs)


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


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_batch(texts, nbits: int = 64, ngram: int = 3) -> np.ndarray:
    """64-bit SimHash per text over char n-gram hashes: each feature
    votes its hash bits +-1; the sign vector packs into a uint64.

    One reduceat pass per bit over a 1-D working array — the previous
    (n_shingles x 64) int64 votes matrix cost ~0.5 GB of memory traffic
    per 1M shingles and dominated the op's wall time."""
    flat, counts = mh.batch_shingle_hashes(texts)
    n = len(counts)
    out = np.zeros(n, dtype=np.uint64)
    nonempty = counts > 0
    if not nonempty.any():
        return out
    # mix only the batch's DISTINCT shingle values (documents share
    # shingles heavily — same observation as minhash_batch)
    uniq, inv = np.unique(flat, return_inverse=True)
    with np.errstate(over="ignore"):
        x = uniq.astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    sel = np.where(nonempty)[0]
    totals = counts[sel]
    if len(uniq) <= 4096:
        # small vocabulary: per-doc vote = (doc x uniq) count matrix @
        # (uniq x bit) matrix — one BLAS matmul replaces 64 reduceats.
        # Counts and bits are small integers, exact in float64.
        bits = ((x[:, None] >> np.arange(nbits, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.float64)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        cmat = np.bincount(doc_idx * len(uniq) + inv,
                           minlength=n * len(uniq)) \
            .reshape(n, len(uniq)).astype(np.float64)
        ones = np.rint(cmat[sel] @ bits).astype(np.int64)
    else:
        xs = x[inv]                  # gather the mixed values back
        starts_all = np.cumsum(counts) - counts
        seg = starts_all[sel]        # strictly increasing (empties dropped)
        ones = np.empty((len(sel), nbits), dtype=np.int64)
        for b in range(nbits):
            bit = ((xs >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
            ones[:, b] = np.add.reduceat(bit, seg)
    # majority vote per bit: +1 votes (ones) outnumber -1 votes
    packed = (ones * 2 > totals[:, None]).astype(np.uint64) @ (
        np.uint64(1) << np.arange(nbits, dtype=np.uint64))
    out[sel] = packed
    return out


def _hamming_bands(max_hamming: int, nbits: int = 64) -> list[tuple[int, int]]:
    """(shift, width) band layout with ``max_hamming + 1`` bands: any
    pair within that hamming distance must share at least one exact band
    (pigeonhole) — the guarantee the previous fixed 4x16 layout only
    gave for hamming <= 3."""
    nbands = max_hamming + 1
    if nbands > nbits:
        raise ValueError(
            f"max_hamming={max_hamming} needs {nbands} bands > {nbits} bits")
    splits = np.array_split(np.arange(nbits), nbands)
    return [(int(s[0]), len(s)) for s in splits]


def _popcount64(x: np.ndarray) -> np.ndarray:
    ham = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        ham += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return ham


def simhash_dup_pairs(ds, col: str = "text", id_col: str = "doc_id",
                      max_hamming: int = 3,
                      cfg: EngineConfig = DEFAULT_CONFIG):
    """Near-dup pairs with SimHash hamming distance <= max_hamming.

    Banding: ``max_hamming + 1`` bands over the 64 bits — lossless
    blocking by pigeonhole for ANY requested distance; candidates verify
    exact hamming."""
    def collect(df: pd.DataFrame) -> pd.DataFrame:
        sh = simhash_batch(df[col].fillna("").to_numpy())
        return pd.DataFrame({"doc": df[id_col].astype(str), "sim": sh})

    sim = ds.map_batches(collect, batch_format="pandas").materialize()
    return hash64_dup_pairs(sim, max_hamming=max_hamming, cfg=cfg,
                            key_type="simhash")


def hash64_dup_pairs(sig, *, max_hamming: int = 3,
                     cfg: EngineConfig = DEFAULT_CONFIG,
                     key_type: str = "hash64"):
    """Near-dup pairs among arbitrary 64-bit signatures: a MATERIALIZED
    (doc, sim:uint64) dataset -> (id_a, id_b, hamming) pairs with
    hamming(sim_a, sim_b) <= ``max_hamming``.

    The signature-agnostic core of simhash_dup_pairs, shared with
    image average-hash near-dup (ops/multimodal.image_ahash_dup_pairs):
    pigeonhole banding (``max_hamming + 1`` bands over the 64 bits is
    lossless for ANY requested distance), skew-safe pair generation on
    the band keys, then gated broadcast-or-join hydration for the exact
    popcount verify."""
    bands = _hamming_bands(max_hamming)
    n_docs = sig.count()

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc"].to_numpy()
        sh = df["sim"].to_numpy(dtype=np.uint64)
        parts = []
        for b, (shift, width) in enumerate(bands):
            mask = np.uint64((1 << width) - 1)
            vals = (sh >> np.uint64(shift)) & mask
            parts.append(pd.DataFrame({
                "key_type": key_type,
                "key_value": [f"{b}:{v:x}" for v in vals],
                "conv_id": ids,
            }))
        return pd.concat(parts, ignore_index=True)

    pairs = generate_pairs(sig.map_batches(emit, batch_format="pandas"), cfg,
                           n_rows=n_docs * len(bands))

    def fn(a, b, pairs_df):
        if a is None or not len(pairs_df):
            return pairs_df.assign(hamming=np.zeros(len(pairs_df), dtype=np.int64))
        x = a["sim"].to_numpy(dtype=np.uint64) ^ b["sim"].to_numpy(dtype=np.uint64)
        out = pairs_df.assign(hamming=_popcount64(x))
        return out[out["hamming"] <= max_hamming].reset_index(drop=True)

    return _verify_pairs(pairs, sig, ["sim"], fn, cfg, n_docs=n_docs)


# --------------------------------------------------------------------------
# exact q-gram Jaccard
# --------------------------------------------------------------------------


def _gram_table(ds, col: str, id_col: str, q: int):
    """documents -> materialized (doc, grams, ng) payload: each doc's
    SORTED DISTINCT 64-bit q-gram hashes as a bytes column + their count.
    Empty documents keep one hash (of ""), mirroring the q-gram-set
    semantics ``set or {text}`` the operator defines."""

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[col].fillna("").astype(str).to_numpy(dtype=object)
        flat, counts = mh.batch_window_hashes(texts, q, lowercase=True)
        flat, counts = mh.unique_per_doc(flat, counts)
        empty = counts == 0
        if empty.any():
            new_counts = np.where(empty, 1, counts)
            out = np.zeros(int(new_counts.sum()), dtype=np.uint64)
            ends = np.cumsum(new_counts)
            starts = ends - new_counts
            pos = np.zeros(len(out), dtype=bool)
            pos[starts[empty]] = True
            out[~pos] = flat
            flat, counts = out, new_counts
        buf = flat.tobytes()
        ends = np.cumsum(counts) * 8
        starts = ends - counts * 8
        return pd.DataFrame({
            "doc": df[id_col].astype(str),
            "grams": [buf[s:e] for s, e in zip(starts, ends)],
            "ng": counts.astype(np.int64),
        })

    return ds.map_batches(collect, batch_format="pandas").materialize()


def _decode_grams(col: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    vals = col.to_numpy(dtype=object)
    counts = np.fromiter((len(v) // 8 for v in vals), count=len(vals),
                         dtype=np.int64)
    flat = np.frombuffer(b"".join(vals), dtype=np.uint64)
    return flat, counts


def _prefix_key_table(gram_payload, threshold: float):
    """Lossless prefix-filter blocking (Chaudhuri et al. SSJoin 2006 /
    Bayardo et al. WWW 2007): under ANY global token order, two sets
    with Jaccard >= t share a token among each one's first
    ``n - ceil(t*n) + 1`` tokens.  Gram hashes ascending IS a global
    order, so each doc emits only its prefix grams as blocking keys."""

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "key_type": pd.Series([], dtype="string"),
                "key_value": pd.Series([], dtype="string"),
                "conv_id": pd.Series([], dtype="string"),
            })
        flat, counts = _decode_grams(df["grams"])
        p = (counts - np.ceil(threshold * counts).astype(np.int64) + 1)
        p = np.clip(p, 1, counts)
        starts = np.cumsum(counts) - counts
        local = np.arange(len(flat)) - np.repeat(starts, counts)
        take = local < np.repeat(p, counts)
        keys = flat[take]
        docs = np.repeat(df["doc"].to_numpy(), p)
        return pd.DataFrame({
            "key_type": np.full(len(keys), "gram", dtype=object),
            "key_value": np.array([format(v, "x") for v in keys], dtype=object),
            "conv_id": docs,
        })

    return gram_payload.map_batches(emit, batch_format="pandas")


def ngram_jaccard_pairs(ds, col: str = "text", id_col: str = "doc_id",
                        q: int = 3, threshold: float = 0.5,
                        cfg: EngineConfig = DEFAULT_CONFIG,
                        candidates: str = "prefix"):
    """Exact character-q-gram Jaccard pairs >= threshold.

    candidates="prefix": LOSSLESS prefix-filter blocking — the exact
    path (requires ``cfg.max_block_records`` to exceed the hottest
    prefix-gram's document frequency; oversized gram blocks are purged
    like any hot key, trading recall for skew safety).
    candidates="lsh": MinHash-LSH recall net cast ~0.2 below the final
    threshold — the approximate scale path."""
    grams = _gram_table(ds, col, id_col, q)
    if candidates == "prefix":
        # materializing the key table costs nothing extra (the shuffle
        # inside generate_pairs would materialize it anyway) and its
        # then-free count drives the gather-vs-shuffle gate
        keys = _prefix_key_table(grams, threshold).materialize()
        pairs = generate_pairs(keys, cfg, n_rows=keys.count())
    else:
        lsh_thr = max(0.3, threshold - 0.2)
        pairs = minhash_lsh_dup_pairs(ds, col, id_col, lsh_thr, 128, cfg,
                                      verify=False)

    def fn(a, b, pairs_df):
        if a is None or not len(pairs_df):
            return pairs_df.assign(jaccard=np.zeros(len(pairs_df)))
        fa, ca = _decode_grams(a["grams"])
        fb, cb = _decode_grams(b["grams"])
        npairs = len(pairs_df)
        da = pd.DataFrame({"pid": np.repeat(np.arange(npairs), ca), "g": fa})
        db = pd.DataFrame({"pid": np.repeat(np.arange(npairs), cb), "g": fb})
        inter = da.merge(db, on=["pid", "g"]).groupby("pid").size()
        i = np.zeros(npairs, dtype=np.int64)
        i[inter.index.to_numpy()] = inter.to_numpy()
        union = ca + cb - i
        jac = np.where(union > 0, i / np.maximum(union, 1), 0.0)
        out = pairs_df.assign(jaccard=jac)
        return out[out["jaccard"] >= threshold].reset_index(drop=True)

    return _verify_pairs(pairs, grams, ["grams"], fn, cfg,
                         n_docs=grams.count())


# --------------------------------------------------------------------------
# embedding near-dup
# --------------------------------------------------------------------------


def _vec_table(ds, vec_col: str, id_col: str):
    """embeddings -> materialized (doc, vec) payload of L2-normalized
    float64 vectors as bytes."""

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return pd.DataFrame({"doc": df[id_col].astype(str),
                             "vec": [v.tobytes() for v in V]})

    return ds.map_batches(collect, batch_format="pandas").materialize()


def _vec_matrix(col: pd.Series) -> np.ndarray:
    vals = col.to_numpy(dtype=object)
    n = len(vals)
    flat = np.frombuffer(b"".join(vals), dtype=np.float64)
    return flat.reshape(n, -1)


def embedding_dup_pairs(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                        threshold: float = 0.9, nplanes: int = 8,
                        nbands: int = 4, cfg: EngineConfig = DEFAULT_CONFIG,
                        dim: int | None = None):
    """Embedding-cosine near-dup: random-hyperplane LSH (sign sketches,
    banded) buckets candidates; exact cosine verifies.  Approximate —
    a pair above threshold can miss every band; ``exact_cosine_pairs``
    is the exact (O(n^2)-compute) alternative."""
    import ray

    vecs = _vec_table(ds, vec_col, id_col)
    n_docs = vecs.count()
    if n_docs == 0:
        return generate_pairs(
            ds.map_batches(lambda df: pd.DataFrame(
                {"key_type": [], "key_value": [], "conv_id": []}),
                batch_format="pandas"), cfg)
    first = vecs.take(1)
    d = dim or len(first[0]["vec"]) // 8
    rng = np.random.RandomState(7)
    planes_ref = ray.put(rng.randn(d, nplanes))
    width = nplanes // nbands

    class Emit:
        def __init__(self, pref):
            self.planes = ray.get(pref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            V = _vec_matrix(df["vec"])
            signs = (V @ self.planes) > 0          # (n, nplanes)
            ids = df["doc"].to_numpy()
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

    from ..util import stateful_map

    keyed = stateful_map(vecs, Emit, (planes_ref,), batch_format="pandas")
    pairs = generate_pairs(keyed, cfg, n_rows=n_docs * nbands)

    def fn(a, b, pairs_df):
        if a is None or not len(pairs_df):
            return pairs_df.assign(cosine=np.zeros(len(pairs_df)))
        cos = (_vec_matrix(a["vec"]) * _vec_matrix(b["vec"])).sum(axis=1)
        out = pairs_df.assign(cosine=cos)
        return out[out["cosine"] >= threshold].reset_index(drop=True)

    return _verify_pairs(pairs, vecs, ["vec"], fn, cfg, n_docs=n_docs)


class _AllPairsCosine:
    """Actor: batch rows x broadcast full matrix; emits (id_a, id_b,
    cosine) with batch_id < matrix_id so every unordered pair appears
    exactly once across the whole run."""

    def __init__(self, refs, thr):
        import ray

        parts = [_block_to_pandas(b) for b in ray.get(list(refs))]
        df = pd.concat(parts, ignore_index=True)
        self.ids = df["doc_num"].to_numpy()
        self.M = _vec_matrix(df["vec"])
        self.thr = thr

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            })
        V = _vec_matrix(df["vec"])
        bids = df["doc_num"].to_numpy()
        S = V @ self.M.T
        ii, jj = np.where(S >= self.thr)
        keep = bids[ii] < self.ids[jj]
        ii, jj = ii[keep], jj[keep]
        return pd.DataFrame({"id_a": bids[ii], "id_b": self.ids[jj],
                             "cosine": S[ii, jj]})


def exact_cosine_pairs(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                       threshold: float = 0.9,
                       cfg: EngineConfig = DEFAULT_CONFIG):
    """EXACT all-pairs cosine >= threshold (numeric id columns).

    Distributed brute force: every block computes its rows against the
    broadcast normalized matrix (object-store block refs, fetched once
    per actor).  O(n^2) similarity compute spread over the cluster; the
    matrix must fit a worker's heap — the exactness bound. Use
    ``embedding_dup_pairs`` (RHP-LSH) beyond that."""

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return pd.DataFrame({"doc_num": df[id_col].astype(np.int64),
                             "vec": [v.tobytes() for v in V]})

    from ..util import stateful_map

    vecs = ds.map_batches(collect, batch_format="pandas").materialize()
    refs = _payload_refs(vecs)
    return stateful_map(vecs, _AllPairsCosine, (refs, threshold),
                        batch_format="pandas")


# --------------------------------------------------------------------------
# SemDeDup — semantic dedup via k-means cells (Abbas et al. 2023,
# arXiv:2303.09540)
# --------------------------------------------------------------------------


def semdedup_pairs(ds, *, vec_col: str = "embedding",
                   id_col: str = "vec_id", ncells: int | None = 8,
                   threshold: float = 0.9, index_path: str | None = None,
                   seed: int = 11, cfg: EngineConfig = DEFAULT_CONFIG):
    """Semantic near-duplicate pairs, SemDeDup-style: cluster the
    embeddings with k-means and compare EXACTLY only within a cluster.
    Returns (id_a, id_b, cosine) with id_a < id_b in string order (the
    candidate-pair canonical form).  Pairs whose members land in
    different cells are missed — the paper's documented approximation
    (cross-cluster duplicates are rare when duplicates are close in
    embedding space and clusters are coarse).

    Scale shape: the k-means index is built and PERSISTED by
    ops/ann.build_ivf (seeded sample fit, distributed assign, CELL-
    PARTITIONED parquet — reusable as an ANN index and replayable by a
    SQL oracle).  Cells then become candidate key groups for the
    skew-safe ``generate_pairs`` machinery (a hot cell salts into
    triangle sub-cells instead of meeting in one task), and exact
    cosine verifies via the gated broadcast-or-join hydration — the
    O(n^2) compute is per-cell, never global, and nothing lands on the
    driver."""
    import ray

    from .ann import build_ivf
    from ..util import stateful_map

    vecs = _vec_table(ds, vec_col, id_col)
    n_docs = vecs.count()
    if n_docs == 0:
        return generate_pairs(
            ds.map_batches(lambda df: pd.DataFrame(
                {"key_type": [], "key_value": [], "conv_id": []}),
                batch_format="pandas"), cfg)
    if ncells is None:
        # bounded-CELL-SIZE default, not build_ivf's sqrt(n): semantic
        # dedup emits C(cell, 2) candidates per cell, so total pair
        # volume is ~ n * cell / 2 — fixing cell ~256 keeps it LINEAR
        # in n, where sqrt(n) cells (cell = sqrt(n)) makes it n^1.5:
        # 2.8x the hydrated verify volume at 500k (177M vs 64M pairs),
        # 27x at 50M, unbounded beyond (measured at 100k: 1.86x wall,
        # 88.8s vs 47.8s — scripts/big_corpus_bench.py vectors mode)
        ncells = int(min(max(n_docs // 256, 4), 65_536))
    idx = build_ivf(ds, ncells=ncells, vec_col=vec_col, id_col=id_col,
                    seed=seed, index_path=index_path)
    cref = ray.put(idx.centroids)

    class EmitCell:
        """Recomputes each row's cell from the broadcast centroids —
        the identical normalized-float64 argmax build_ivf persisted, so
        the emitted groups equal the on-disk partitions bit-for-bit
        (no second read of the index)."""

        def __init__(self, r):
            C = np.asarray(ray.get(r), dtype=np.float64)
            self.C = C / np.maximum(
                np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            V = _vec_matrix(df["vec"])          # already L2-normalized
            cell = (V @ self.C.T).argmax(axis=1)
            return pd.DataFrame({
                "key_type": np.full(len(df), "cell", dtype=object),
                "key_value": cell.astype(np.int64).astype(str),
                "conv_id": df["doc"].to_numpy(),
            })

    keyed = stateful_map(vecs, EmitCell, (cref,), batch_format="pandas")
    # expected emission ~ n * mean_cell / 2 — quadratic per cell, so the
    # row-count gather gate alone would misfire (see generate_pairs)
    pairs = generate_pairs(keyed, cfg, n_rows=n_docs,
                           est_pairs=n_docs * max(n_docs // ncells, 1) // 2)

    def fn(a, b, pairs_df):
        if a is None or not len(pairs_df):
            return pairs_df.assign(cosine=np.zeros(len(pairs_df)))
        cos = (_vec_matrix(a["vec"]) * _vec_matrix(b["vec"])).sum(axis=1)
        out = pairs_df.assign(cosine=cos)
        return out[out["cosine"] >= threshold].reset_index(drop=True)

    # prefilter=False: every cell emits all-pairs, so the pair table
    # references every payload doc — the referenced-id reduction saves
    # nothing and would materialize the (quadratic-per-cell) pair table
    return _verify_pairs(pairs, vecs, ["vec"], fn, cfg, n_docs=n_docs,
                         prefilter=False)


def semantic_dedup(ds, *, vec_col: str = "embedding",
                   id_col: str = "vec_id", ncells: int | None = 8,
                   threshold: float = 0.9, index_path: str | None = None,
                   seed: int = 11, cfg: EngineConfig = DEFAULT_CONFIG):
    """SemDeDup keep set: the rows that SURVIVE semantic dedup, with
    the input's id dtype.  A row is dropped when its cell holds a
    duplicate with a smaller id (string order — the same canonical
    order the pair table uses), i.e. the deterministic greedy that
    'keep one representative per epsilon-ball' reduces to under a
    fixed scan order: the smallest-id member of every duplicate
    relation survives, every other member drops.

    Scale shape: dropped ids are the per-batch-distinct ``id_b`` side
    of the pair table; the keep set is an ``anti_join`` of the id
    column against them (gated broadcast key-set below the config
    threshold, hash-shuffle marker join above — never a driver set)."""
    from .relational import anti_join

    pairs = semdedup_pairs(ds, vec_col=vec_col, id_col=id_col,
                           ncells=ncells, threshold=threshold,
                           index_path=index_path, seed=seed, cfg=cfg)
    drop = pairs.map_batches(
        lambda df: pd.DataFrame({"_doc": pd.unique(df["id_b"])}),
        batch_format="pandas").materialize()

    def key(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col]].copy()
        out["_doc"] = df[id_col].astype(str)
        return out

    left = ds.select_columns([id_col]).map_batches(
        key, batch_format="pandas")
    kept = anti_join(left, drop, on=["_doc"], cfg=cfg,
                     right_rows=drop.count())
    return kept.select_columns([id_col])


def semdedup_clusters(ds, *, vec_col: str = "embedding",
                      id_col: str = "vec_id", ncells: int | None = 8,
                      threshold: float = 0.9,
                      index_path: str | None = None, seed: int = 11,
                      cfg: EngineConfig = DEFAULT_CONFIG):
    """(id, canonical_id) for every row: union-find over the semantic
    dup pairs, canonical = min id (string order) of the component —
    the cluster-then-keep-one form of SemDeDup (transitive: a~b, b~c
    puts a, c in one cluster even when a~c itself misses the
    threshold).  Same distributed CC as minhash_dedup
    (stages/cluster.py: driver DSU under the edge gate, min-label
    pointer jumping above)."""
    pairs = semdedup_pairs(ds, vec_col=vec_col, id_col=id_col,
                           ncells=ncells, threshold=threshold,
                           index_path=index_path, seed=seed, cfg=cfg) \
        .select_columns(["id_a", "id_b"])
    ids = ds.map_batches(
        lambda t: pa.table({"conv_id": pa.compute.cast(t[id_col],
                                                       pa.string())}),
        batch_format="pyarrow")
    labels = connected_components(pairs, ids, cfg)
    return labels.rename_columns({"node": id_col,
                                  "label": "canonical_id"})


# --------------------------------------------------------------------------
# cross-document duplicate-span signal (ExactSubstr-style)
# --------------------------------------------------------------------------


def dup_gram_stats(ds, n: int = 8, col: str = "text", id_col: str = "doc_id",
                   cfg: EngineConfig = DEFAULT_CONFIG):
    """Per doc: how many of its DISTINCT token ``n``-grams occur in at
    least 2 documents — the duplicate-span signal ExactSubstr-style
    dedup ranks documents by (a doc whose spans are mostly shared is a
    near-copy even when no single whole-doc match fires).

    Returns (id_col, n_grams:int64, n_dup_grams:int64,
    dup_fraction:float64), one row per input doc (short docs have zero
    grams and dup_fraction 0).

    Scale shape: gram identity travels as a uint64 digest; the gram
    doc-frequency is ONE combiner-reduced keyed shuffle of (digest,
    partial-count) rows; flagged digests semi-join back onto the
    per-doc gram table and re-aggregate per doc.  Document text never
    moves after the gram explode."""
    from .contamination import _corpus_grams_batch, _doc_gram_digests

    kw = {"col": col, "id_col": id_col, "n": n}
    grams = ds.map_batches(_corpus_grams_batch, fn_kwargs=kw,
                           batch_format="pandas").materialize()
    nparts = cfg.resolve_join_partitions()

    def _partial_df(d: pd.DataFrame) -> pd.DataFrame:
        return (d.groupby("gram_h", sort=False).size()
                .reset_index(name="c"))

    dup = (
        grams.map_batches(_partial_df, batch_format="pandas")
        .repartition(nparts, keys=["gram_h"])
        .map_batches(
            lambda d: d.groupby("gram_h", sort=False)["c"].sum()
            .reset_index().loc[lambda x: x["c"] >= 2, ["gram_h"]],
            batch_format="pandas", batch_size=None))
    hits = safe_join(grams, dup, "inner", nparts, ("gram_h",))
    dup_counts = (
        hits.repartition(nparts, keys=[id_col])
        .map_batches(
            lambda d: d.groupby(id_col, sort=False).size()
            .reset_index(name="n_dup_grams"),
            batch_format="pandas", batch_size=None))

    def _totals(df: pd.DataFrame) -> pd.DataFrame:
        ids, counts, _ = _doc_gram_digests(df, col, id_col, n)
        return pd.DataFrame({id_col: ids, "n_grams": counts})

    totals = ds.map_batches(_totals, batch_format="pandas")
    out = safe_join(totals, dup_counts, "left_outer", nparts, (id_col,))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        dupc = (df["n_dup_grams"].fillna(0).astype(np.int64)
                if "n_dup_grams" in df.columns
                else pd.Series(np.zeros(len(df), dtype=np.int64)))
        tot = df["n_grams"].astype(np.int64)
        return pd.DataFrame({
            id_col: df[id_col],
            "n_grams": tot,
            "n_dup_grams": dupc,
            "dup_fraction": dupc.to_numpy() / np.maximum(tot.to_numpy(), 1),
        })

    return out.map_batches(finalize, batch_format="pandas")


def _gram_occurrence_batch(df: pd.DataFrame, col: str, id_col: str,
                           n: int) -> pd.DataFrame:
    """(id, pos, gram_h) for EVERY token n-gram position — the
    non-distinct sibling of contamination's ``_corpus_grams_batch``
    (span removal needs each occurrence, not the per-doc gram set).
    Gram generation is per-row (ragged token lists); hashing is one
    vectorized ``pd.util.hash_array`` over the exploded gram column."""
    from .contamination import _norm_tokens

    ids, counts, grams = [], [], []
    for doc, toks in zip(df[id_col], _norm_tokens(df[col])):
        m = len(toks) - n + 1
        if m > 0:
            ids.append(doc)
            counts.append(m)
            grams.extend(" ".join(toks[i:i + n]) for i in range(m))
    if not grams:
        return pd.DataFrame({
            id_col: np.array([], dtype=df[id_col].to_numpy().dtype),
            "pos": np.array([], dtype=np.int64),
            "gram_h": np.array([], dtype=np.uint64),
        })
    counts = np.asarray(counts, dtype=np.int64)
    return pd.DataFrame({
        id_col: np.repeat(np.asarray(ids), counts),
        "pos": np.concatenate([np.arange(c, dtype=np.int64) for c in counts]),
        "gram_h": pd.util.hash_array(np.asarray(grams, dtype=object)),
    })


def substring_dedup(ds, n: int = 8, col: str = "text",
                    id_col: str = "doc_id",
                    cfg: EngineConfig = DEFAULT_CONFIG):
    """ExactSubstr span REMOVAL (the Lee et al. 2022 "Deduplicating
    Training Data" operator, token-gram granularity): any token
    ``n``-gram occurring >= 2 times corpus-wide — across documents OR
    repeated inside one — marks its ``n`` token positions; covered
    positions are dropped and each document is reassembled from the
    surviving tokens.

    Returns (id_col, n_tokens:int64, n_removed:int64,
    cleaned_text:str), one row per input doc.  ``cleaned_text`` is in
    the normalized token space (lowercased, whitespace-collapsed) —
    the same contract ``dup_gram_stats`` and the decontamination
    oracles tokenize under, so DuckDB replays it exactly.

    Scale shape: gram identity travels as a uint64 digest; duplicate
    digests come from ONE combiner-reduced keyed shuffle of (digest,
    partial-count) rows; flagged occurrences semi-join back, expand to
    covered positions (<= n_tokens rows per doc), and collapse to one
    packed int32 byte-blob per doc before the single left join onto
    the documents — text bytes move exactly once, in that join."""
    kw = {"col": col, "id_col": id_col, "n": n}
    grams = ds.map_batches(_gram_occurrence_batch, fn_kwargs=kw,
                           batch_format="pandas").materialize()
    nparts = cfg.resolve_join_partitions()

    def _partial(d: pd.DataFrame) -> pd.DataFrame:
        return (d.groupby("gram_h", sort=False).size()
                .reset_index(name="c"))

    dup = (
        grams.map_batches(_partial, batch_format="pandas")
        .repartition(nparts, keys=["gram_h"])
        .map_batches(
            lambda d: d.groupby("gram_h", sort=False)["c"].sum()
            .reset_index().loc[lambda x: x["c"] >= 2, ["gram_h"]],
            batch_format="pandas", batch_size=None))
    hits = safe_join(grams, dup, "inner", nparts, ("gram_h",))

    def _expand(d: pd.DataFrame) -> pd.DataFrame:
        if len(d) == 0:
            return pd.DataFrame({
                id_col: np.array([], dtype=np.int64),
                "p": np.array([], dtype=np.int64)})
        return pd.DataFrame({
            id_col: np.repeat(d[id_col].to_numpy(), n),
            "p": (d["pos"].to_numpy()[:, None]
                  + np.arange(n, dtype=np.int64)[None, :]).ravel(),
        }).drop_duplicates()

    def _pack(d: pd.DataFrame) -> pd.DataFrame:
        d = d.drop_duplicates()
        out_ids, blobs = [], []
        for doc, g in d.groupby(id_col, sort=False):
            out_ids.append(doc)
            blobs.append(np.unique(g["p"].to_numpy())
                         .astype(np.int32).tobytes())
        return pd.DataFrame({id_col: np.asarray(out_ids),
                             "covered": blobs})

    covered = (hits.map_batches(_expand, batch_format="pandas")
               .repartition(nparts, keys=[id_col])
               .map_batches(_pack, batch_format="pandas", batch_size=None))
    out = safe_join(ds, covered, "left_outer", nparts, (id_col,))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        from .contamination import _norm_tokens

        cov = (df["covered"] if "covered" in df.columns
               else pd.Series([None] * len(df)))
        n_tok = np.empty(len(df), dtype=np.int64)
        n_rem = np.zeros(len(df), dtype=np.int64)
        cleaned = []
        for j, (toks, cv) in enumerate(zip(_norm_tokens(df[col]), cov)):
            n_tok[j] = len(toks)
            if cv is None or (isinstance(cv, float)) or len(cv) == 0:
                cleaned.append(" ".join(toks))
                continue
            pos = np.frombuffer(bytes(cv), dtype=np.int32)
            keep = np.ones(len(toks), dtype=bool)
            keep[pos] = False
            n_rem[j] = len(pos)
            cleaned.append(" ".join(t for t, k in zip(toks, keep) if k))
        return pd.DataFrame({
            id_col: df[id_col],
            "n_tokens": n_tok,
            "n_removed": n_rem,
            "cleaned_text": cleaned,
        })

    return out.map_batches(finalize, batch_format="pandas")


# --------------------------------------------------------------------------
# incremental exact dedup (continuous ingestion against persisted state)
# --------------------------------------------------------------------------


def incremental_exact_dedup(new_ds, index_path: str, col: str = "text",
                            id_col: str = "doc_id",
                            cfg: EngineConfig = DEFAULT_CONFIG,
                            n_rows: int | None = None):
    """Streaming-ingest exact dedup: dedup one increment against a
    PERSISTED index of everything seen so far, append the new
    survivors to the index, return them.

    Semantics: within an increment the smallest id wins (exact_dedup);
    across increments FIRST SEEN wins (the reference probe's
    first-seen-NID dedup, api-side J8, lifted to dataset scale).

    State layout: ``index_path/inc_00000, inc_00001, ...`` — one
    parquet directory per ingest (partitioned, append-only, resumable:
    a crashed ingest leaves prior shards intact and is simply rerun).
    The membership check is ops/relational.anti_join on the content
    column itself — Arrow's hash join hashes the strings internally,
    so this IS the digest-semi-join + exact-verify shape, with the
    broadcast/shuffle gate anti_join already carries.  Nothing is ever
    gathered to the driver; the index can exceed any single heap."""
    import glob as _glob

    import ray.data as rd

    from .relational import anti_join

    survivors = exact_dedup(new_ds, col, id_col, cfg, n_rows=n_rows)
    os.makedirs(index_path, exist_ok=True)
    shards = sorted(_glob.glob(os.path.join(index_path, "inc_*")))
    files = sorted(f for s in shards
                   for f in _glob.glob(os.path.join(s, "*.parquet")))
    if files:
        index = rd.read_parquet(files)
        survivors = anti_join(survivors, index.select_columns([col]),
                              on=[col], cfg=cfg)
    survivors = survivors.select_columns([col, id_col]).materialize()
    if survivors.count():
        # claim the next shard number atomically (mkdir is atomic), so
        # a concurrent ingest cannot write into the same directory —
        # but ingests must still be SERIALIZED for correct semantics:
        # two increments running at once do not see each other's
        # survivors (single-writer contract, like any append-only log)
        k = len(shards)
        while True:
            out_dir = os.path.join(index_path, f"inc_{k:05d}")
            try:
                os.makedirs(out_dir, exist_ok=False)
                break
            except FileExistsError:
                k += 1
        survivors.write_parquet(out_dir)
    return survivors


def read_dedup_index(index_path: str):
    """The accumulated survivor set (col, id) across every ingest."""
    import glob as _glob

    import ray.data as rd

    files = sorted(
        f for s in sorted(_glob.glob(os.path.join(index_path, "inc_*")))
        for f in _glob.glob(os.path.join(s, "*.parquet")))
    if not files:
        raise FileNotFoundError(
            f"no dedup index shards under {index_path!r} — run "
            "incremental_exact_dedup first")
    return rd.read_parquet(files)


def _compact_inc_shards(index_path: str, reader) -> int:
    """Fold an append-only ``inc_*`` shard chain into ONE shard —
    the maintenance pass a long-lived streaming index needs (every
    ingest otherwise reads an ever-growing file list).

    Crash-safe without a manifest: the merged rows write to a staging
    directory FIRST (a crash before the swap leaves the live chain
    untouched and only orphans the staging dir); the swap then renames
    old shards out of the live namespace before renaming the staging
    dir to ``inc_00000``.  Increments are single-writer (the
    incremental-ingest contract), so the swap races no ingest.
    Contents are row-identical to the pre-compaction index (survivor
    sets never overlap across shards, so the fold is a pure
    concatenation).  Returns the number of shards folded."""
    import glob as _glob
    import shutil as _shutil

    shards = sorted(_glob.glob(os.path.join(index_path, "inc_*")))
    if len(shards) <= 1:
        return len(shards)
    index = reader(index_path).materialize()
    stage = os.path.join(index_path, "compact_stage")
    _shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)
    index.write_parquet(stage)
    for i, s in enumerate(shards):
        os.rename(s, os.path.join(index_path, f"old_{i:05d}"))
    os.rename(stage, os.path.join(index_path, "inc_00000"))
    for i in range(len(shards)):
        _shutil.rmtree(os.path.join(index_path, f"old_{i:05d}"),
                       ignore_errors=True)
    return len(shards)


def compact_dedup_index(index_path: str,
                        cfg: EngineConfig = DEFAULT_CONFIG):
    """See ``_compact_inc_shards`` — the exact-dedup survivor index."""
    return _compact_inc_shards(index_path, read_dedup_index)


# --------------------------------------------------------------------------
# incremental NEAR-dedup (MinHash-band index over continuous ingestion)
# --------------------------------------------------------------------------


def incremental_minhash_dedup(new_ds, index_path: str, col: str = "text",
                              id_col: str = "doc_id",
                              threshold: float = 0.8, num_perm: int = 128,
                              cfg: EngineConfig = DEFAULT_CONFIG):
    """Streaming-ingest NEAR-dedup: near-dedup one increment against a
    PERSISTED MinHash signature index, append the surviving signatures,
    return the survivors as (doc, sig).

    ``incremental_exact_dedup`` lifted from exact text equality to
    signature Jaccard >= threshold (first-seen wins across increments):

    1. WITHIN the increment: union-find over verified LSH pairs — the
       (string-)min id of each near-dup component survives (exactly
       ``minhash_dedup``'s keep set, restricted to the increment).
    2. ACROSS increments: a within-survivor with a verified pair to ANY
       indexed doc is a near-copy of already-seen content and drops —
       transitively so, since its within-increment followers already
       collapsed into it in step 1.

    Index layout mirrors ``incremental_exact_dedup``:
    ``index_path/inc_NNNNN/`` append-only parquet shards of (doc, sig);
    band keys re-derive from the stored signatures at ingest time (a
    vectorized map), so persisted state is exactly one signature per
    surviving doc.  Doc ids must be globally unique across increments
    (same single-writer contract as the exact variant).

    Scale shape: candidates against the index come from ONE hash join
    of the two band-key tables on the band key — an LSH bucket's
    new x old fanout is the bucket size, small by construction at any
    corpus size — and signature hydration rides the gated
    broadcast-or-join path every other verify stage uses.  The index is
    only ever read as a Dataset; nothing driver-sized."""
    import glob as _glob

    import ray.data as rd

    from .relational import anti_join, semi_join

    bands, rows = mh.optimal_param(threshold, num_perm)
    sig = _sig_table(new_ds, col, id_col, num_perm)
    n_new = sig.count()
    fn = _sig_jaccard_fn(threshold, num_perm)

    # 1. within-increment near-dedup: keep each component's min id
    pairs = generate_pairs(_band_key_table(sig, num_perm, bands, rows),
                           cfg, n_rows=n_new * bands)
    verified = _verify_pairs(pairs, sig, ["sig"], fn, cfg, n_docs=n_new) \
        .select_columns(["id_a", "id_b"])
    ids = sig.map_batches(
        lambda df: pd.DataFrame({"conv_id": df["doc"]}),
        batch_format="pandas")
    labels = connected_components(verified, ids, cfg)
    keep = labels.map_batches(
        lambda df: df.loc[df["node"] == df["label"], ["node"]]
        .rename(columns={"node": "doc"}),
        batch_format="pandas").materialize()
    surv = semi_join(sig, keep, on=["doc"], cfg=cfg,
                     right_rows=keep.count())

    # 2. across increments: drop survivors near-duplicating the index
    os.makedirs(index_path, exist_ok=True)
    shards = sorted(_glob.glob(os.path.join(index_path, "inc_*")))
    files = sorted(f for s in shards
                   for f in _glob.glob(os.path.join(s, "*.parquet")))
    if files:
        surv = surv.materialize()
        n_surv = surv.count()
        index = rd.read_parquet(files)
        n_old = index.count()

        def band_side(payload, out_col):
            return _band_key_table(payload, num_perm, bands, rows) \
                .map_batches(
                    lambda df, c=out_col: df[["key_value", "conv_id"]]
                    .rename(columns={"conv_id": c}),
                    batch_format="pandas")

        # per-block distinct only — a pair surviving in two partitions
        # (it shared two band keys) merely verifies twice; the drop set
        # below is distinct regardless
        cand = safe_join(
            band_side(surv, "id_a"), band_side(index, "id_b"), "inner",
            cfg.resolve_join_partitions(), ("key_value",)) \
            .map_batches(
                lambda df: df[["id_a", "id_b"]].drop_duplicates(),
                batch_format="pandas")
        dup = _verify_pairs(cand, surv.union(index), ["sig"], fn, cfg,
                            n_docs=n_surv + n_old)
        drop = dup.map_batches(
            lambda df: pd.DataFrame({"doc": pd.unique(df["id_a"])}),
            batch_format="pandas").materialize()
        surv = anti_join(surv, drop, on=["doc"], cfg=cfg,
                         right_rows=drop.count())
    surv = surv.materialize()
    if surv.count():
        k = len(shards)
        while True:
            out_dir = os.path.join(index_path, f"inc_{k:05d}")
            try:
                os.makedirs(out_dir, exist_ok=False)
                break
            except FileExistsError:
                k += 1
        surv.write_parquet(out_dir)
    return surv


def read_minhash_index(index_path: str):
    """The accumulated (doc, sig) survivor signatures across ingests."""
    import glob as _glob

    import ray.data as rd

    files = sorted(
        f for s in sorted(_glob.glob(os.path.join(index_path, "inc_*")))
        for f in _glob.glob(os.path.join(s, "*.parquet")))
    if not files:
        raise FileNotFoundError(
            f"no minhash index shards under {index_path!r} — run "
            "incremental_minhash_dedup first")
    return rd.read_parquet(files)


def compact_minhash_index(index_path: str,
                          cfg: EngineConfig = DEFAULT_CONFIG):
    """See ``_compact_inc_shards`` — the (doc, sig) MinHash index."""
    return _compact_inc_shards(index_path, read_minhash_index)


# --------------------------------------------------------------------------
# sparse cosine all-pairs (posting-list join)
# --------------------------------------------------------------------------


def sparse_cosine_pairs(ds, *, id_col: str = "doc_id",
                        col: str = "text", threshold: float = 0.9,
                        min_df: int = 2,
                        max_df_ratio: tuple[int, int] | None = None,
                        chunk_pairs: int = 4_000_000,
                        cfg: EngineConfig = DEFAULT_CONFIG):
    """Exact all-pairs cosine similarity over the term-frequency
    vectors of a document column, by inverted posting lists [Bayardo
    et al. 2007, "Scaling up all pairs similarity search"] -> Dataset
    (id_a, id_b, cosine) with id_a < id_b and cosine >= threshold.

    The sparse-vector sibling of ``exact_cosine_pairs``: instead of a
    dense matmul against a broadcast matrix, each term's posting list
    meets in one block after a term-keyed shuffle and contributes
    tf_a * tf_b to every co-occurring pair; keyed_sum folds the dot
    products.  Everything before the final divide is exact int64, so
    the pair set is layout-invariant and SQL-replayable.

    Scale contract: the work is sum(df^2) over kept terms.  ``min_df``
    drops hapax terms (df < 2 cannot form a pair — lossless);
    ``max_df_ratio`` = (num, den) drops terms with df * den > n * num
    — the stop-word cap that bounds the quadratic blow-up, at the
    documented cost of measuring cosine in the FILTERED term space
    (both the norms and the dots exclude capped terms, consistently).
    Hot terms that survive the cap are emitted in bounded chunks of
    ~``chunk_pairs`` pairs so no single merge materializes df^2 rows
    at once.  For web-scale corpora run MinHash-LSH (approximate
    candidates) instead; this is the exact path."""
    from .relational import _keyed, _meta_rows, keyed_sum, semi_join
    from .text import _TERM_RE

    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    n_docs = ds.count()

    def tf_batch(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[col].fillna("").astype(str).str.lower() \
            .str.findall(_TERM_RE)
        lens = toks.str.len().to_numpy(np.int64)
        if not lens.sum():
            return pd.DataFrame({
                id_col: df[id_col].iloc[:0],
                "word": pd.Series([], dtype="string"),
                "tf": pd.Series([], dtype="int64")})
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks if len(t)])
        ids = np.repeat(df[id_col].to_numpy(), lens)
        d = pd.DataFrame({id_col: ids, "word": flat.astype(str)})
        return (d.groupby([id_col, "word"], sort=False).size()
                .rename("tf").reset_index())

    tf = ds.select_columns([id_col, col]).map_batches(
        tf_batch, batch_format="pandas").materialize()

    dfreq = keyed_sum(
        tf.map_batches(
            lambda d: pd.DataFrame({
                "word": d["word"],
                "df": np.ones(len(d), dtype=np.int64)}),
            batch_format="pandas"),
        ["word"], ["df"], cfg=cfg)

    num, den = max_df_ratio if max_df_ratio else (1, 1)

    def keep(d: pd.DataFrame) -> pd.DataFrame:
        m = d["df"].to_numpy(np.int64) >= min_df
        if max_df_ratio:
            m &= d["df"].to_numpy(np.int64) * den <= n_docs * num
        return d[m][["word"]]

    kept = dfreq.map_batches(keep, batch_format="pandas")
    ftf = semi_join(tf, kept, on=["word"], cfg=cfg).materialize()

    norms = keyed_sum(
        ftf.map_batches(
            lambda d: pd.DataFrame({
                id_col: d[id_col],
                "n2": (d["tf"].to_numpy(np.int64) ** 2)}),
            batch_format="pandas"),
        [id_col], ["n2"], cfg=cfg)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": df[id_col].iloc[:0],
                              "id_b": df[id_col].iloc[:0],
                              "dot": pd.Series([], dtype="int64")})
        if not len(df):
            return empty
        out = [empty]
        s = df.sort_values(["word", id_col], kind="stable")
        words = s["word"].to_numpy()
        ids = s[id_col].to_numpy()
        tfs = s["tf"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, words[1:] != words[:-1]])
        sizes = np.diff(np.r_[starts, len(words)])
        for st, g in zip(starts, sizes):
            if g < 2:
                continue
            gi, gt = ids[st:st + g], tfs[st:st + g]
            step = max(1, chunk_pairs // int(g))
            for lo in range(0, g, step):
                hi = min(lo + step, g)
                # pairs (i, j) with lo <= i < hi, i < j < g
                cnt = g - 1 - np.arange(lo, hi)
                tot = int(cnt.sum())
                if tot <= 0:
                    continue
                i_idx = np.repeat(np.arange(lo, hi), cnt)
                offs = np.cumsum(cnt) - cnt
                j_idx = (np.arange(tot) - np.repeat(offs, cnt)
                         + i_idx + 1)
                fwd = gi[i_idx] < gi[j_idx]
                out.append(pd.DataFrame({
                    "id_a": np.where(fwd, gi[i_idx], gi[j_idx]),
                    "id_b": np.where(fwd, gi[j_idx], gi[i_idx]),
                    "dot": gt[i_idx] * gt[j_idx]}))
        return pd.concat(out, ignore_index=True)

    dots = keyed_sum(
        _keyed(ftf, ["word"], cfg, _meta_rows(ftf)).map_batches(
            emit, batch_format="pandas", batch_size=None),
        ["id_a", "id_b"], ["dot"], cfg=cfg)

    nparts = cfg.resolve_join_partitions()
    na = norms.map_batches(
        lambda d: pd.DataFrame({"id_a": d[id_col],
                                "n2_a": d["n2"].astype(np.int64)}),
        batch_format="pandas")
    nb = norms.map_batches(
        lambda d: pd.DataFrame({"id_b": d[id_col],
                                "n2_b": d["n2"].astype(np.int64)}),
        batch_format="pandas")
    j = safe_join(safe_join(dots, na, join_type="inner",
                            num_partitions=nparts, on=("id_a",)),
                  nb, join_type="inner", num_partitions=nparts,
                  on=("id_b",))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        c = (df["dot"].to_numpy(np.int64).astype(np.float64)
             / (np.sqrt(df["n2_a"].to_numpy(np.int64).astype(np.float64))
                * np.sqrt(df["n2_b"].to_numpy(np.int64)
                          .astype(np.float64))))
        out = pd.DataFrame({"id_a": df["id_a"].to_numpy(),
                            "id_b": df["id_b"].to_numpy(),
                            "cosine": c})
        return out[c >= threshold]

    return j.map_batches(finalize, batch_format="pandas")
