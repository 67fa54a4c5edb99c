"""Deterministic sampling / split operators.

Training pipelines need splits that are (a) reproducible across runs
and cluster sizes — no RNG state, no row order dependence — and (b)
derivable per row so they survive any repartitioning.  Both operators
assign each row a bucket from a pure function of its id:

* integer ids — Knuth multiplicative hash ``(id * 2654435761) mod 2^32``
  (exact in SQL BIGINT arithmetic, so every split is value-checkable
  in DuckDB);
* string ids — the whole-string polynomial hash the MinHash kernels use
  (functions/minhash.py shingle polynomial, already reproduced in the
  oracle SQL).

The reference's training split is a driver-side crc32 bucket over the
pair key (train_model.py:70-75 semantics; pipelines/train.py) — these
are the distributed, dataset-level analogues.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(0xFFFFFFFF)
_POLY_P = np.uint64(1_000_003)


def _hash_ints(ids: np.ndarray) -> np.ndarray:
    return (ids.astype(np.uint64) * _KNUTH) & _M32


def _bucket_ints(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    return (_hash_ints(ids) % np.uint64(n_buckets)).astype(np.int64)


def _hash_strs(ids) -> np.ndarray:
    out = np.zeros(len(ids), dtype=np.uint64)
    # whole-string polynomial hash, vectorized over the padded char matrix
    texts = ["" if s is None else str(s) for s in ids]
    lens = np.fromiter((len(t) for t in texts), count=len(texts),
                       dtype=np.int64)
    lmax = int(lens.max()) if len(texts) else 0
    if lmax:
        flat = np.frombuffer("".join(texts).encode("utf-32-le"),
                             dtype=np.uint32)
        mat = np.zeros((len(texts), lmax), dtype=np.uint64)
        mask = np.arange(lmax)[None, :] < lens[:, None]
        mat[mask] = flat
        for c in range(lmax):
            active = c < lens
            out = np.where(active, (out * _POLY_P + mat[:, c]) & _M32, out)
    return out


def _bucket_strs(ids, n_buckets: int) -> np.ndarray:
    return (_hash_strs(ids) % np.uint64(n_buckets)).astype(np.int64)


def hash_bucket(ds, id_col: str, n_buckets: int = 100,
                out_col: str = "bucket"):
    """Append a deterministic ``[0, n_buckets)`` bucket column derived
    from ``id_col`` — stateless vectorized map, no shuffle.

    The int-vs-string path is decided PER ELEMENT, never per batch, so
    bucket assignment is a pure function of the value and cannot depend
    on Ray block boundaries: integer values (numpy ints, Python ints in
    object / nullable-Int64 columns, floats holding an integral value)
    are normalized to int64 and take the Knuth path; everything else —
    strings (including all-digit strings like ``'123'``), true floats,
    nulls — takes the string-polynomial path, matching a DuckDB
    VARCHAR-hash oracle.  Ids are assumed NON-NEGATIVE: negative ids
    wrap through uint64 here but DuckDB's signed ``%`` does not, so the
    doc_hash_split oracle parity only holds for ids >= 0."""

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out[out_col] = (_hash_values(df[id_col].to_numpy())
                        % np.uint64(n_buckets)).astype(np.int64)
        return out

    return ds.map_batches(tag, batch_format="pandas")


def _hash_values(vals: np.ndarray) -> np.ndarray:
    """Raw 32-bit deterministic hash of each value, routed PER ELEMENT
    (see hash_bucket's contract): integer values take the Knuth path,
    everything else the string-polynomial path.  Returns uint64."""
    if np.issubdtype(vals.dtype, np.integer):
        return _hash_ints(vals)
    if np.issubdtype(vals.dtype, np.floating):
        # per-element: integral floats -> int path, the rest
        # (true fractions, nan/inf) -> string path
        integral = np.isfinite(vals) & (np.floor(vals) == vals)
    else:
        # object / extension arrays: only genuine Python/numpy ints
        # take the int path — numeric STRINGS must not (their hash
        # would otherwise depend on whether a batchmate forced the
        # string path)
        integral = np.fromiter(
            (isinstance(v, (int, np.integer))
             and not isinstance(v, (bool, np.bool_)) for v in vals),
            count=len(vals), dtype=bool)
    h = np.empty(len(vals), dtype=np.uint64)
    if integral.any():
        picked = vals[integral]
        ints = (picked.astype(np.int64)
                if np.issubdtype(vals.dtype, np.floating)
                else np.asarray([int(v) for v in picked], dtype=np.int64))
        h[integral] = _hash_ints(ints)
    rest = ~integral
    if rest.any():
        h[rest] = _hash_strs(list(vals[rest]))
    return h


def stratified_sample(ds, *, group_col: str, id_col: str, k: int,
                      with_rank: bool = False):
    """Deterministic stratified sample: the ``k`` rows per group with
    the smallest id hash (ties broken by id).  Equivalent to a uniform
    per-group sample that is reproducible across runs, cluster sizes
    and repartitionings — no RNG, no row-order dependence.

    Composition: per-row hash column (stateless map) + group_topk's
    per-block partial-top-k combiner, so at most k rows per (block,
    group) enter the single keyed shuffle.  SQL-checkable as
    ``row_number() OVER (PARTITION BY group ORDER BY hash, id) <= k``.
    (The reference samples pairs driver-side via crc32 buckets,
    train_model.py:70-75 — this is the dataset-level analogue for
    balanced eval/train subset selection.)"""
    from .relational import group_topk

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_h"] = _hash_values(df[id_col].to_numpy()).astype(np.int64)
        return out

    picked = group_topk(
        ds.map_batches(tag, batch_format="pandas"),
        key=group_col, order_col="_h", k=k, tie_col=id_col,
        descending=False, with_rank=with_rank)

    def drop(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns=["_h"])

    return picked.map_batches(drop, batch_format="pandas")


def pack_sequences(ds, *, id_col: str, len_col: str, seq_len: int,
                   n_shards: int = 16, cfg=None,
                   _text_len_col: str | None = None):
    """Concat-and-chunk sequence packing (the GPT-style training-data
    layout): documents are deterministically assigned to ``n_shards``
    streams by id hash, concatenated within each stream in (hash, id)
    order, and the stream is cut into fixed ``seq_len`` windows.  Each
    document is tagged with the shard, the window its FIRST token lands
    in (``seq_id``) and its offset inside that window (``seq_offset``).

    Deterministic: shard, order and offsets are pure functions of
    (id, len), so the packing is identical across runs, cluster sizes
    and repartitionings — and exactly replayable in SQL as a
    ``SUM() OVER (PARTITION BY shard ORDER BY hash, id)`` window.

    Scale: ONE keyed shuffle on shard (grouped_running_sum); shard
    count bounds the largest group, so pick n_shards >> workers for
    100-TB corpora.  ``len_col`` is any precomputed length column
    (token counts come from ops/text.token_stats)."""
    from .relational import grouped_running_sum
    from ..config import DEFAULT_CONFIG

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        if _text_len_col is not None:
            # pack by character count of the text column itself
            out[len_col] = df[_text_len_col].fillna("").astype(str) \
                .str.len().astype(np.int64)
        h = _hash_values(df[id_col].to_numpy())
        out["_h"] = h.astype(np.int64)
        out["shard"] = (h % np.uint64(n_shards)).astype(np.int64)
        return out

    cum = grouped_running_sum(
        ds.map_batches(tag, batch_format="pandas"),
        key="shard", order_cols=["_h", id_col], val_col=len_col,
        out_col="_cum", cfg=cfg or DEFAULT_CONFIG)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        start = (df["_cum"].to_numpy().astype(np.int64)
                 - df[len_col].to_numpy().astype(np.int64))
        out = df.drop(columns=["_h", "_cum"]).copy()
        out["seq_id"] = start // seq_len
        out["seq_offset"] = start % seq_len
        return out

    return cum.map_batches(finalize, batch_format="pandas")


def pack_sequence_texts(ds, *, id_col: str, text_col: str, seq_len: int,
                        n_shards: int = 16, cfg=None):
    """Materialize the packed training sequences themselves: each
    shard's documents are concatenated in (hash, id) order and the
    stream is cut into fixed ``seq_len``-character windows.  Output:
    (shard, seq_id, seq_text) — every window except a shard's last has
    exactly ``seq_len`` characters; documents spanning a boundary are
    split across the adjacent windows (GPT-style packing, no padding).

    Shape: pack_sequences assigns each doc its start offset (one keyed
    shuffle); the explode computes every piece's cut indices in one
    vectorized pass (a doc of length L touches ceil((off+L)/seq_len)
    windows) — only the final substring cuts are a per-piece loop,
    inherent to ragged object strings (pieces ~ docs, not tokens);
    ONE more keyed shuffle on (shard, seq_id) re-aggregates pieces in
    offset order (the sessionize rejoin pattern).  Every piece moves
    exactly once; no stream is ever assembled in one place."""
    from .relational import _keyed
    from ..config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    packed = pack_sequences(ds, id_col=id_col, len_col="_len",
                            seq_len=seq_len, n_shards=n_shards, cfg=cfg,
                            _text_len_col=text_col)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "shard": pd.Series([], dtype="int64"),
                "seq_id": pd.Series([], dtype="int64"),
                "off": pd.Series([], dtype="int64"),
                "piece": pd.Series([], dtype="string"),
            })
        txt = df[text_col].fillna("").astype(str).to_numpy(dtype=object)
        lens = df["_len"].to_numpy(dtype=np.int64)
        start = (df["seq_id"].to_numpy(dtype=np.int64) * seq_len
                 + df["seq_offset"].to_numpy(dtype=np.int64))
        end = start + lens
        first = start // seq_len
        last = np.maximum(first, (end - 1) // seq_len)  # empty doc -> 1 row
        n_pieces = (last - first + 1)
        ridx = np.repeat(np.arange(len(df)), n_pieces)
        # window index of each piece within its doc
        w = (np.arange(n_pieces.sum())
             - np.repeat(np.cumsum(n_pieces) - n_pieces, n_pieces))
        seq = first[ridx] + w
        cut_lo = np.maximum(seq * seq_len, start[ridx])
        cut_hi = np.minimum((seq + 1) * seq_len, end[ridx])
        rel_lo = cut_lo - start[ridx]
        rel_hi = cut_hi - start[ridx]
        pieces = [t[a:b] for t, a, b in
                  zip(txt[ridx], rel_lo, rel_hi)]
        out = pd.DataFrame({
            "shard": df["shard"].to_numpy()[ridx],
            "seq_id": seq,
            "off": cut_lo - seq * seq_len,
            "piece": pieces,
        })
        # empty docs contribute nothing to any window
        return out[rel_hi > rel_lo].reset_index(drop=True)

    pieces = packed.map_batches(explode, batch_format="pandas")

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "shard": pd.Series([], dtype="int64"),
                "seq_id": pd.Series([], dtype="int64"),
                "seq_text": pd.Series([], dtype="string"),
            })
        s = df.sort_values(["shard", "seq_id", "off"], kind="stable")
        g = (s.groupby(["shard", "seq_id"], sort=False)["piece"]
             .agg("".join).reset_index(name="seq_text"))
        g["shard"] = g["shard"].astype("int64")
        g["seq_id"] = g["seq_id"].astype("int64")
        return g

    # n_rows=None DELIBERATELY disables _keyed's small-input gather
    # gate: `pieces` carries the corpus text itself (row count and
    # bytes far exceed the doc count the gate would be fed), so
    # gathering to one block would assemble every stream in one
    # place — always take the keyed shuffle.
    return _keyed(pieces, ["shard", "seq_id"], cfg,
                  None).map_batches(assemble, batch_format="pandas",
                                    batch_size=None)


def weighted_sample(ds, *, id_col: str, weight_col: str,
                    weight_scale: int, resolution: int = 1_000_000):
    """Importance-weighted deterministic downsampling: keep a row with
    probability ``min(1, weight / weight_scale)``, decided by the row's
    id hash instead of an RNG — reproducible across runs, cluster
    sizes and repartitionings, and exactly SQL-replayable because the
    acceptance test is pure integer arithmetic:

        keep  <=>  (hash(id) % resolution) * weight_scale
                       < weight * resolution

    The quality-weighted corpus-sampling primitive (keep high-quality
    documents with higher probability); stateless vectorized map, no
    shuffle.  Weights must be non-negative integers (scale float
    scores upstream)."""

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = _hash_values(df[id_col].to_numpy()) % np.uint64(resolution)
        w = df[weight_col].to_numpy(dtype=np.int64)
        mask = (h.astype(np.int64) * int(weight_scale)
                < w * int(resolution))
        return df[mask].reset_index(drop=True)

    return ds.map_batches(keep, batch_format="pandas")


def shuffle_index(ds, *, id_col: str, n_shards: int = 16, cfg=None):
    """Deterministic global shuffle for training data: every row gets a
    (shard, pos) address — shard by id hash, pos = 0-based rank within
    the shard in (hash, id) order.  Reading shards round-robin by pos
    yields a reproducible pseudo-random permutation of the dataset with
    NO random_shuffle all-to-all: one keyed shuffle on shard, identical
    across runs, cluster sizes and repartitionings.

    Implementation: sequence packing with unit lengths and seq_len=1 —
    pos is exactly the start offset of each unit-length doc."""

    def unit(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_one"] = np.ones(len(df), dtype=np.int64)
        return out

    packed = pack_sequences(ds.map_batches(unit, batch_format="pandas"),
                            id_col=id_col, len_col="_one", seq_len=1,
                            n_shards=n_shards, cfg=cfg)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns=["_one", "seq_offset"]).copy()
        return out.rename(columns={"seq_id": "pos"})

    return packed.map_batches(finalize, batch_format="pandas")


def hash_split(ds, id_col: str, test_pct: int = 20,
               out_col: str = "split"):
    """Append a deterministic 'train'/'test' split column: buckets
    ``[0, test_pct)`` of 100 are test (the reference's 80/20 semantics,
    train_model.py:70-75, as a distributed per-row function)."""
    tagged = hash_bucket(ds, id_col, n_buckets=100, out_col="_b")

    def lab(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out[out_col] = np.where(df["_b"].to_numpy() < test_pct,
                                "test", "train")
        return out.drop(columns=["_b"])

    return tagged.map_batches(lab, batch_format="pandas")


def source_mixture_weights(ds, *, key: str = "source",
                           text_col: str = "text",
                           target: dict[str, float] | None = None):
    """Data-mixing weights (the DoReMi/Pile-style static mixture
    table): per-source document and whitespace-token counts, each
    source's token share of the corpus, and the sampling weight that
    reshapes the corpus to a TARGET token mixture —

        weight = target_share / token_share

    ``target`` maps source -> desired share (missing sources get 0);
    when omitted the target is uniform over the observed sources.
    Feed the weight (scaled to an integer) into ``weighted_sample``
    to apply the mixture.  ``token_share`` and ``weight`` are rounded
    half-away at 6 places from the UNROUNDED double quotients — the
    same boundary contract the SQL oracle replays.

    Shape: one per-batch (key, n_docs, n_tokens) combiner — one row
    per source per block regardless of row count — then a tiny keyed
    groupby; the corpus totals are two scalar aggregates over the
    source-cardinality table.  Document text never shuffles, nothing
    input-sized lands on the driver.  Token counting shares the
    doc_token_counts whitespace contract (text.py::_WS_DISAGREE_RE
    normalize, strip, ``\\s+`` split)."""
    from .text import _WS_DISAGREE_RE, _WS_RE
    from ..util import round_half_away

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = (df[text_col].fillna("").astype(str)
             .str.replace(_WS_DISAGREE_RE, " ", regex=True).str.strip())
        ntok = np.where(t.str.len() == 0, 0,
                        t.str.split(_WS_RE).str.len()).astype(np.int64)
        g = pd.DataFrame({key: df[key], "_d": np.int64(1), "_t": ntok}) \
            .groupby(key, sort=False).sum().reset_index()
        return g

    from .relational import keyed_sum

    agg = keyed_sum(ds.map_batches(partial, batch_format="pandas"),
                    [key], ["_d", "_t"]).materialize()
    total = float(agg.sum("_t") or 0.0)
    n_sources = agg.count()

    def finalize(d: pd.DataFrame) -> pd.DataFrame:
        toks = d["_t"].to_numpy(dtype=np.float64)
        share = toks / total if total else np.zeros(len(d))
        if target is None:
            tgt = np.full(len(d), 1.0 / n_sources)
        else:
            tgt = np.array([float(target.get(s, 0.0)) for s in d[key]])
        w = np.divide(tgt, share, out=np.zeros(len(d)), where=share > 0)
        return pd.DataFrame({
            key: d[key],
            "n_docs": d["_d"].astype("int64"),
            "n_tokens": d["_t"].astype("int64"),
            "token_share": round_half_away(share, 6),
            "weight": round_half_away(w, 6),
        })

    return agg.map_batches(finalize, batch_format="pandas")


def token_budget_sample(ds, *, group_col: str, id_col: str,
                        token_col: str, budget: int,
                        cfg=None, n_rows: int | None = None):
    """Per-group budgeted selection: order each group's rows by the
    Knuth id hash (id tiebreak) and keep rows while the INCLUSIVE
    running ``token_col`` total stays <= ``budget`` — the
    source-mixing primitive ("at most N tokens from each source",
    with an unbiased deterministic order instead of file order).

    Reproducible across runs, cluster sizes and repartitionings (the
    order is a pure row function); ONE hash shuffle on the group;
    exact integer cumsum.  Returns the kept rows plus their
    ``cum_<token_col>``."""
    from ..config import DEFAULT_CONFIG
    from .relational import _keyed

    cfg = cfg or DEFAULT_CONFIG
    if budget < 0:
        raise ValueError("token_budget_sample: budget must be >= 0")
    cum_col = f"cum_{token_col}"

    def block(df: pd.DataFrame) -> pd.DataFrame:
        d = df.copy()
        d["_h"] = _hash_ints(d[id_col].to_numpy(np.int64)).astype(np.int64)
        d = d.sort_values([group_col, "_h", id_col], kind="stable")
        d[cum_col] = d.groupby(group_col, sort=False)[token_col].cumsum() \
            .astype(np.int64)
        d = d[d[cum_col] <= budget].drop(columns=["_h"])
        return d

    return _keyed(ds, [group_col], cfg, n_rows).map_batches(
        block, batch_format="pandas", batch_size=None)


def contrastive_negatives(ds, *, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 2,
                          n_rows: int | None = None, cfg=None):
    """Deterministic random NEGATIVE pairs for contrastive training:
    each anchor gets ``k`` pseudo-random partners via the engine's
    SQL-replayable Knuth multiplicative hash (salted by the partner
    slot j), self-pairs avoided by an arithmetic shift over the dense
    id domain, and ACCIDENTAL POSITIVES — partners whose text equals
    the anchor's (planted duplicates) — dropped by digest comparison.

    Requires dense int64 ids 0..n-1 (the corpus contract after a
    shuffle-index assignment); id*KNUTH + j*salt stays within int64 for
    n up to ~3.5e9 ids.  Scale shape: partner ids are ARITHMETIC (no
    sampling shuffle), the anchor digest rides along from the one
    digest pass, and the partner digest hydrates through a single hash
    join — candidates never all-pairs.  Collision risk of the md5
    equality proxy is 2^-128 — the same class of bound the engine's
    64-bit dedup digests document, squared."""
    import hashlib

    from ..config import DEFAULT_CONFIG
    from ..util import safe_join

    cfg = cfg or DEFAULT_CONFIG
    n = n_rows if n_rows is not None else ds.count()
    if n < 2:
        raise ValueError("contrastive_negatives: need >= 2 docs")
    if k < 1:
        raise ValueError("contrastive_negatives: k must be >= 1")
    nparts = cfg.resolve_join_partitions()

    def dig(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].fillna("").astype(str)
        return pd.DataFrame({
            id_col: df[id_col].astype(np.int64),
            "digest": [hashlib.md5(t.encode()).hexdigest()
                       for t in texts],
        })

    digests = ds.map_batches(dig, batch_format="pandas").materialize()

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        outs = []
        for j in range(1, k + 1):
            # uint64 like _hash_ints (id * KNUTH overflows int64 past
            # ~3.5e9 ids; the mod-2^32 result is the same either way)
            h = (ids.astype(np.uint64) * _KNUTH
                 + np.uint64(j * 40503)) & _M32
            neg = (h % np.uint64(n - 1)).astype(np.int64)
            neg = neg + (neg >= ids)
            outs.append(pd.DataFrame({
                id_col: ids,
                "neg_id": neg.astype(np.int64),
                "j": np.full(len(ids), j, dtype=np.int64),
                "a_digest": df["digest"],
            }))
        return pd.concat(outs, ignore_index=True)

    cand = digests.map_batches(emit, batch_format="pandas")
    partner = digests.map_batches(
        lambda d: pd.DataFrame({"neg_id": d[id_col],
                                "n_digest": d["digest"]}),
        batch_format="pandas")
    joined = safe_join(cand, partner, join_type="inner",
                       num_partitions=nparts, on=("neg_id",))
    return joined.map_batches(
        lambda d: d[d["a_digest"] != d["n_digest"]][
            [id_col, "neg_id", "j"]].reset_index(drop=True),
        batch_format="pandas")


def greedy_cover_select(ds, *, id_col: str, item_col: str, k: int,
                        cfg=None, n_rows: int | None = None):
    """Greedy maximum-coverage data selection [Nemhauser et al. 1978
    — the (1 - 1/e) greedy; coreset-style "pick the k docs that cover
    the most distinct features"]: round by round, select the id whose
    ITEMS (terms, n-grams, tool names) cover the most not-yet-covered
    values, ties to the smallest id.  Returns one row per round:
    (round BIGINT, id, gain BIGINT, covered_total BIGINT).

    The driver holds ONLY the current winner row and a covered-count
    integer; the covered set itself stays distributed.  Each round is
    an anti_join of the (id, item) table against the covered items, a
    keyed_sum of per-id gains, and a global_topk(1) combiner — three
    bounded shuffles, no input-sized driver state.  Rounds end early
    when everything is covered (the gain table goes empty).  All
    counts are exact integers: the selection sequence is layout-
    invariant and replayed bit-for-bit by a generated per-round SQL
    CTE chain."""
    from ..config import DEFAULT_CONFIG
    from .relational import _keyed, anti_join, global_topk, keyed_sum

    cfg = cfg or DEFAULT_CONFIG
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df[[id_col, item_col]].drop_duplicates()

    pairs = _keyed(
        ds.select_columns([id_col, item_col]).map_batches(
            dedup, batch_format="pandas"),
        [id_col, item_col], cfg, n_rows,
    ).map_batches(dedup, batch_format="pandas", batch_size=None) \
        .materialize()

    covered = None          # Dataset of distinct covered items
    covered_total = 0
    out_rows = []
    for rnd in range(1, k + 1):
        live = pairs if covered is None else anti_join(
            pairs, covered, on=[item_col], cfg=cfg)
        # materialize: anti_join's empty shuffle partitions otherwise
        # leave the lazy gains dataset without an inferable schema
        gains = keyed_sum(
            live.map_batches(
                lambda d: pd.DataFrame({
                    id_col: d[id_col],
                    "gain": np.ones(len(d), dtype=np.int64)}),
                batch_format="pandas"),
            [id_col], ["gain"], cfg=cfg).materialize()
        if gains.count() == 0:
            break                        # everything covered
        top = global_topk(gains, order_cols=["gain", id_col],
                          descending=[True, False], k=1).take_all()
        if not top:
            break                        # everything covered
        win_id, gain = top[0][id_col], int(top[0]["gain"])
        covered_total += gain
        out_rows.append({"round": rnd, id_col: win_id,
                         "gain": gain, "covered_total": covered_total})
        win_items = pairs.map_batches(
            lambda d, w=win_id: d[d[id_col] == w][[item_col]],
            batch_format="pandas")
        covered = (win_items if covered is None
                   else covered.union(win_items)).materialize()

    import ray.data as rd

    res = pd.DataFrame(out_rows, columns=[
        "round", id_col, "gain", "covered_total"])
    res["round"] = res["round"].astype(np.int64)
    res["gain"] = res["gain"].astype(np.int64)
    res["covered_total"] = res["covered_total"].astype(np.int64)
    return rd.from_pandas(res)


def feature_hash(ds, *, id_col: str, cat_cols: list[str],
                 n_features: int = 64, cfg=None):
    """Hashing-trick featurization (Weinberger et al. 2009): each
    categorical value becomes the token ``"<col>:<value>"``, hashed by
    the whole-string polynomial (``_hash_strs`` — the hash_bucket /
    KMV contract, SQL-replayable) modulo ``n_features``; collisions
    FOLD by summing counts — that is the point of the trick (fixed
    feature width regardless of vocabulary).  Output long-form sparse
    rows (id_col, feature_idx:int64, n:int64).

    Stateless vectorized token hash per block, then ONE combiner-
    reduced keyed_sum on (id, feature_idx)."""
    from ..config import DEFAULT_CONFIG
    from .relational import keyed_sum

    cfg = cfg or DEFAULT_CONFIG

    def explode(d: pd.DataFrame) -> pd.DataFrame:
        ids, toks = [], []
        for c in cat_cols:
            vals = d[c].to_numpy()
            toks.append(np.asarray(
                [f"{c}:{v}" for v in vals], dtype=object))
            ids.append(d[id_col].to_numpy())
        allids = np.concatenate(ids) if ids else np.array([], np.int64)
        alltok = (np.concatenate(toks) if toks
                  else np.array([], dtype=object))
        idx = (_hash_strs(alltok)
               % np.uint64(n_features)).astype(np.int64)
        return pd.DataFrame({
            id_col: allids,
            "feature_idx": idx,
            "n": np.ones(len(allids), dtype=np.int64),
        })

    return keyed_sum(ds.map_batches(explode, batch_format="pandas"),
                     [id_col, "feature_idx"], ["n"], cfg)
