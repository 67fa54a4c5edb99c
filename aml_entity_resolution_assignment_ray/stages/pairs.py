"""Candidate-pair generation: key table -> distinct (id_a, id_b) pairs.

The reference generates candidates by querying a pickled LSH index per
record (matching.py:121-133) plus a 4-way SQL UNION of equi-self-joins on
the exact keys (matching.py:136-167), then set-unions and dedupes
(matching.py:173-177, D1/D2: ``id_a < id_b`` canonical order).

Here both become ONE hash-shuffle self-join over the long key table:
every (key_type, key_value) group of size m emits its m(m-1)/2 pairs.

Scale design (explicit skew + shuffle handling per north_rule):

* hot key groups SALT instead of purging (default ``cfg.salt_pairs``):
  groups above ``cfg.salt_min_group`` split into sorted sub-chunks
  re-shuffled as triangle cells, spreading one key's O(m^2) emission
  across tasks with zero recall loss — the reference only warns about
  such blocks (matching.py:71-73 "danger zone").  Only degenerate
  groups above ``cfg.hard_block_cap`` are purged (with salting off,
  the purge cap is ``cfg.max_block_records``); purged counts are
  reported by ``blocking_stats``.
* keys are first folded to ONE fixed-width uint64 (``kh``) so the
  shuffle moves 8-byte keys, not long strings.
* the shuffle is a HASH repartition on ``kh``
  (``repartition(nparts, keys=["kh"])``): every key group lands wholly
  in one partition, so a single vectorized numpy repeat/arange pass
  emits all pairs of all groups in the block at once — no sort barrier,
  no block-edge side path, no driver coordination.
* distinct is a second hash repartition on the pair hash ``ph`` + a
  per-block Arrow group_by: all copies of a pair are guaranteed
  co-located (this is exact — unlike a range sort, hash partitioning
  cannot split ties across block boundaries).

The unsalted plan is 2 hash shuffles + 3 map stages, fully streaming
(no ``materialize``/``count``/``union`` in the plan).  The default
salted plan adds one combiner-reduced key-frequency pre-pass (tiny
shuffle + hot-key broadcast) and keeps the SAME two heavy data
shuffles — see the routed-salting comment block below.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import DEFAULT_CONFIG, EngineConfig

_EMPTY_PAIRS = {
    "id_a": pd.Series([], dtype="string"),
    "id_b": pd.Series([], dtype="string"),
}


def pair_schema():
    """The canonical (id_a, id_b) Arrow schema — callers joining a pair
    table pass this as the safe_join empty-schema fallback."""
    import pyarrow as pa

    return pa.schema([("id_a", pa.string()), ("id_b", pa.string())])


def _emit_group_pairs(ids: np.ndarray, starts: np.ndarray, sizes: np.ndarray,
                      cap: int) -> pd.DataFrame:
    """Vectorized all-groups pair emission.

    ``ids`` must be sorted within each group so that j > i implies
    ids[j] >= ids[i] (canonical id_a < id_b ordering for free).
    """
    keep = (sizes >= 2) & (sizes <= cap)
    if not keep.any():
        return pd.DataFrame(_EMPTY_PAIRS)
    ks, kz = starts[keep], sizes[keep]
    # absolute row indices of all kept-group members, fully vectorized
    offs_k = np.cumsum(kz) - kz
    t = int(kz.sum())
    rows = np.arange(t) - np.repeat(offs_k, kz) + np.repeat(ks, kz)
    # per-row pair fanout: row r in group g (local index l) pairs with the
    # (size-1-l) rows after it
    row_group_end = np.repeat(ks + kz, kz)
    cnt = row_group_end - rows - 1
    total = int(cnt.sum())
    if total == 0:
        return pd.DataFrame(_EMPTY_PAIRS)
    i_idx = np.repeat(rows, cnt)
    offs = np.cumsum(cnt) - cnt
    j_idx = np.arange(total) - np.repeat(offs, cnt) + i_idx + 1
    return pd.DataFrame({"id_a": ids[i_idx], "id_b": ids[j_idx]})


def _hash_keys(df: pd.DataFrame) -> pd.DataFrame:
    """(key_type, key_value, conv_id) -> (kh: uint64, conv_id).

    Sorting/grouping on one fixed-width hash instead of two long strings
    halves the shuffle bytes and the compare cost; a 64-bit collision
    merges two blocks' candidates (scored and filtered anyway) with
    probability ~(#keys)^2/2^64 — immaterial."""
    kh = pd.util.hash_array(
        (df["key_type"].astype(str) + "\x00" + df["key_value"].astype(str))
        .to_numpy(dtype=object))
    return pd.DataFrame({"kh": kh, "conv_id": df["conv_id"]})


def _pair_hash(id_a: pd.Series, id_b: pd.Series) -> np.ndarray:
    return pd.util.hash_array(
        (id_a.astype(str) + "\x00" + id_b.astype(str)).to_numpy(dtype=object))


def _partition_pairs(df: pd.DataFrame, cap: int) -> pd.DataFrame:
    """One hash-partition of the hashed key table -> that partition's
    pairs.  Key groups are complete within the partition (hash
    co-location), so there is no edge case to route elsewhere."""
    df = df.sort_values(["kh", "conv_id"], kind="stable")
    ids = df["conv_id"].to_numpy()
    key = df["kh"].to_numpy()
    n = len(key)
    empty = pd.DataFrame(_EMPTY_PAIRS)
    empty["ph"] = pd.Series([], dtype="uint64")
    if n == 0:
        return empty
    boundaries = np.concatenate([[0], np.where(key[1:] != key[:-1])[0] + 1, [n]])
    starts = boundaries[:-1]
    sizes = np.diff(boundaries)
    pairs = _emit_group_pairs(ids, starts, sizes, cap)
    # local distinct: same pair from multiple co-located key groups
    pairs = pairs.drop_duplicates(ignore_index=True)
    if not len(pairs):
        return empty
    pairs["ph"] = _pair_hash(pairs["id_a"], pairs["id_b"])
    return pairs


def _distinct_block(t):
    """Arrow-native per-block distinct + schema coercion.

    After the ``ph`` hash repartition every copy of a pair is in ONE
    block, so a per-block group_by is an exact global distinct.  Also
    guarantees the (id_a: string, id_b: string) schema downstream joins
    need."""
    import pyarrow as pa

    schema = pa.schema([("id_a", pa.string()), ("id_b", pa.string())])
    if "id_a" not in t.column_names or len(t) == 0:
        return schema.empty_table()
    return t.select(["id_a", "id_b"]).cast(schema) \
        .group_by(["id_a", "id_b"]).aggregate([])


def _gathered_pairs(df: pd.DataFrame, cap: int) -> pd.DataFrame:
    """All keys in one partition -> all distinct pairs (the local
    distinct inside ``_partition_pairs`` is global here)."""
    out = _partition_pairs(df, cap)
    return out[["id_a", "id_b"]]


_SALT_P = np.uint64(0x9E3779B97F4A7C15)  # cell-key hash mix (splitmix64 odd)


# --------------------------------------------------------------------------
# routed salting (the default salted plan): two-pass skew handling with
# the SAME heavy-shuffle count as the unsalted plan
# --------------------------------------------------------------------------
#
#   pass 1  exact key-frequency count: per-block (kh, partial) combiner,
#           ONE tiny shuffle of distinct-keys-per-block 16-byte rows,
#           driver gathers ONLY the hot keys (count > salt_min_group);
#   pass 2  ONE data shuffle: cold rows route on kh (key-group
#           co-location, as the plain plan), hot rows replicate to their
#           c = ceil(m / salt_min_group) triangle cells with chunk =
#           hash(conv_id) % c — each unordered pair of a hot key meets
#           in EXACTLY one cell (sorted chunk-index pair), so emission
#           is exact with no extra dedup;
#   then    the usual ph shuffle + per-block Arrow distinct.
#
# The legacy 3-shuffle plan (key-shuffle -> cell re-shuffle -> ph
# shuffle, no broadcast) remains as _partition_pairs_salted /
# _expand_salted and is used as the fallback when the hot-key set
# itself is too large to broadcast.


def _count_partial(df: pd.DataFrame) -> pd.DataFrame:
    g = df.groupby("kh", sort=False).size().reset_index(name="c")
    return g


def _hot_filter(df: pd.DataFrame, thr: int) -> pd.DataFrame:
    out = df.groupby("kh", sort=False)["c"].sum().reset_index()
    return out.loc[out["c"] > thr].reset_index(drop=True)


class _RouteSalted:
    """Stateful route kernel: broadcast hot-key counts fetched once per
    worker.  Emits the unified (h: uint64, id: str, s: int8) routing
    frame — s = -1 for cold member rows (h = kh), s = 0/1 for a hot
    member's side within its triangle cell."""

    def __init__(self, hot_ref, salt_min_group: int, cap: int):
        import ray

        hot = ray.get(hot_ref)  # pd.DataFrame (kh, c)
        self.hot = dict(zip(hot["kh"].to_numpy(), hot["c"].to_numpy()))
        self.smg = max(int(salt_min_group), 1)
        self.cap = cap

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        kh = df["kh"].to_numpy()
        ids = df["conv_id"].astype(str).to_numpy(dtype=object)
        cnt = pd.Series(kh).map(self.hot)
        cold = cnt.isna().to_numpy()
        out = [pd.DataFrame({
            "h": kh[cold],
            "id": ids[cold],
            "s": np.full(int(cold.sum()), -1, dtype=np.int8),
        })]
        hotm = ~cold & (cnt.to_numpy() <= self.cap)  # over-cap -> purged
        if hotm.any():
            m = cnt.to_numpy()[hotm].astype(np.int64)
            c_row = -(-m // self.smg)                 # cells per member
            kh_h = kh[hotm]
            id_h = ids[hotm]
            chunk = (pd.util.hash_array(id_h)
                     % c_row.astype(np.uint64)).astype(np.int64)
            total = int(c_row.sum())
            csum = np.cumsum(c_row)
            other = np.arange(total, dtype=np.int64) \
                - np.repeat(csum - c_row, c_row)
            ch = np.repeat(chunk, c_row)
            cr = np.repeat(c_row, c_row)
            i = np.minimum(ch, other)
            j = np.maximum(ch, other)
            cell = (np.repeat(kh_h, c_row).astype(np.uint64) * _SALT_P
                    + (i * cr + j).astype(np.uint64)) * _SALT_P
            out.append(pd.DataFrame({
                "h": cell,
                "id": np.repeat(id_h, c_row),
                "s": np.where(ch == i, 0, 1).astype(np.int8),
            }))
        return pd.concat(out, ignore_index=True)


def _emit_routed(df: pd.DataFrame, cap: int) -> pd.DataFrame:
    """Post-route emission: cold key groups (s == -1, complete within
    the block) take the vectorized all-groups triangle; each hot cell
    crosses its side-0 x side-1 members (or triangles a diagonal cell),
    with elementwise min/max giving the canonical id_a < id_b order —
    chunks are hash-assigned, so sides are NOT globally ordered."""
    empty = pd.DataFrame(_EMPTY_PAIRS)
    empty["ph"] = pd.Series([], dtype="uint64")
    if not len(df):
        return empty
    df = df.sort_values(["h", "s", "id"], kind="stable")
    h = df["h"].to_numpy()
    s = df["s"].to_numpy()
    ids = df["id"].to_numpy()
    n = len(h)
    bounds = np.concatenate([[0], np.where(h[1:] != h[:-1])[0] + 1, [n]])
    starts, sizes = bounds[:-1], np.diff(bounds)
    cold_groups = s[starts] == -1     # sorted by s: a group is cold iff
    out = []                          # its first row is (collision-free)
    pairs = _emit_group_pairs(ids, starts[cold_groups],
                              sizes[cold_groups], cap)
    pairs = pairs.drop_duplicates(ignore_index=True)
    if len(pairs):
        out.append(pairs)
    for g in np.where(~cold_groups)[0]:
        lo, hi = starts[g], starts[g] + sizes[g]
        split = lo + int((s[lo:hi] == 0).sum())
        a, b = ids[lo:split], ids[split:hi]
        if len(b) == 0:
            # diagonal cell: triangle within the (sorted) chunk
            p = _emit_group_pairs(a, np.array([0]),
                                  np.array([len(a)]), 1 << 62)
        else:
            x = np.repeat(a, len(b))
            y = np.tile(b, len(a))
            p = pd.DataFrame({"id_a": np.minimum(x, y),
                              "id_b": np.maximum(x, y)})
        if len(p):
            out.append(p)
    if not out:
        return empty
    allp = pd.concat(out, ignore_index=True)
    allp["ph"] = _pair_hash(allp["id_a"], allp["id_b"])
    return allp


def _partition_pairs_salted(df: pd.DataFrame, cap: int,
                            salt_min_group: int) -> pd.DataFrame:
    """Salted variant of ``_partition_pairs``: cold groups (size <=
    salt_min_group) emit their pairs directly; HOT groups are split into
    c = ceil(m / salt_min_group) sorted sub-chunks and re-emitted as
    member rows of the c(c+1)/2 triangle cells (i <= j), keyed by a
    fresh cell hash ``h`` — the explicit salted repartition the
    north_rule names.  A downstream hash shuffle on ``h`` spreads one
    hot key's O(m^2) pair emission across ~c^2/2 tasks.

    Unified output schema (pair rows | member rows):
      id_a: str         pair left  | member conv_id
      id_b: str or null pair right | null
      h:    uint64      pair hash  | cell hash
      s:    int8        -1         | chunk side within the cell (0 or 1)
    """
    df = df.sort_values(["kh", "conv_id"], kind="stable")
    ids = df["conv_id"].to_numpy()
    key = df["kh"].to_numpy()
    n = len(key)
    empty = pd.DataFrame({
        "id_a": pd.Series([], dtype="string"),
        "id_b": pd.Series([], dtype="string"),
        "h": pd.Series([], dtype="uint64"),
        "s": pd.Series([], dtype="int8"),
    })
    if n == 0:
        return empty
    boundaries = np.concatenate([[0], np.where(key[1:] != key[:-1])[0] + 1, [n]])
    starts = boundaries[:-1]
    sizes = np.diff(boundaries)
    hot = sizes > salt_min_group
    out = []
    # cold groups: the ordinary vectorized all-pairs emission
    pairs = _emit_group_pairs(ids, starts[~hot], sizes[~hot], cap)
    pairs = pairs.drop_duplicates(ignore_index=True)
    if len(pairs):
        pairs["h"] = _pair_hash(pairs["id_a"], pairs["id_b"])
        pairs["s"] = np.int8(-1)
        out.append(pairs)
    # hot groups: triangle-cell member rows (few per partition by
    # definition of "hot"; inner work stays vectorized)
    for g in np.where(hot & (sizes <= cap))[0]:
        m = int(sizes[g])
        gids = ids[starts[g]:starts[g] + m]  # sorted, unique within group
        c = -(-m // salt_min_group)
        chunks = np.array_split(gids, c)
        kh = np.uint64(key[starts[g]])
        rows_id, rows_h, rows_s = [], [], []
        for i in range(c):
            for j in range(i, c):
                cell = (kh * _SALT_P + np.uint64(i * c + j)) * _SALT_P
                rows_id.append(chunks[i])
                rows_h.append(np.full(len(chunks[i]), cell, dtype=np.uint64))
                rows_s.append(np.zeros(len(chunks[i]), dtype=np.int8))
                if j > i:
                    rows_id.append(chunks[j])
                    rows_h.append(np.full(len(chunks[j]), cell, dtype=np.uint64))
                    rows_s.append(np.ones(len(chunks[j]), dtype=np.int8))
        out.append(pd.DataFrame({
            "id_a": np.concatenate(rows_id),
            "id_b": pd.Series([None] * sum(len(r) for r in rows_id),
                              dtype="string"),
            "h": np.concatenate(rows_h),
            "s": np.concatenate(rows_s),
        }))
    if not out:
        return empty
    return pd.concat(out, ignore_index=True)


def _expand_salted(df: pd.DataFrame) -> pd.DataFrame:
    """Post-shuffle expansion: pass pair rows through; turn each
    triangle cell's member rows into its pairs.  Chunk slices come from
    one sorted unique id array, so side-0 ids < side-1 ids and the
    canonical id_a < id_b order is free; diagonal cells (side 0 only)
    reuse the sorted within-group emission."""
    empty = pd.DataFrame(_EMPTY_PAIRS)
    empty["ph"] = pd.Series([], dtype="uint64")
    if not len(df):
        return empty
    s = df["s"].to_numpy()
    out = []
    plain = df[s == -1]
    if len(plain):
        out.append(pd.DataFrame({"id_a": plain["id_a"].to_numpy(),
                                 "id_b": plain["id_b"].to_numpy(),
                                 "ph": plain["h"].to_numpy()}))
    members = df[s >= 0]
    if len(members):
        members = members.sort_values(["h", "s", "id_a"], kind="stable")
        h = members["h"].to_numpy()
        side = members["s"].to_numpy()
        mids = members["id_a"].to_numpy()
        bounds = np.concatenate(
            [[0], np.where(h[1:] != h[:-1])[0] + 1, [len(h)]])
        for b in range(len(bounds) - 1):
            lo, hi = bounds[b], bounds[b + 1]
            cell_side = side[lo:hi]
            split = lo + int((cell_side == 0).sum())
            a, bids = mids[lo:split], mids[split:hi]
            if len(bids) == 0:
                # diagonal cell: all pairs within the (sorted) chunk
                p = _emit_group_pairs(a, np.array([0]),
                                      np.array([len(a)]), 1 << 62)
            else:
                p = pd.DataFrame({
                    "id_a": np.repeat(a, len(bids)),
                    "id_b": np.tile(bids, len(a)),
                })
            if len(p):
                p["ph"] = _pair_hash(p["id_a"], p["id_b"])
                out.append(p)
    if not out:
        return empty
    return pd.concat(out, ignore_index=True)


def generate_pairs(keys, cfg: EngineConfig = DEFAULT_CONFIG,
                   n_rows: int | None = None, salt: bool | None = None,
                   est_pairs: int | None = None):
    """key table Dataset -> distinct candidate pair Dataset (id_a, id_b).

    Two hash shuffles (co-locate key groups; co-locate pair copies),
    zero sorts, zero materializations — the plan streams end to end.

    ``n_rows``: the key-table row count (or an upper bound) when the
    caller knows it.  At or below ``cfg.gather_max_keys`` the operator
    takes a single-task gather path instead — each Ray 2.49 hash
    shuffle costs ~1s of fixed aggregator-actor setup, which dominates
    small inputs (the same reasoning as broadcast-vs-join hydration).

    ``est_pairs``: the caller's upper bound on EMITTED pairs, when it
    can compute one (e.g. semantic dedup knows cells emit C(cell,2)
    each).  Row count alone misgates quadratic emitters — 500k rows in
    256-row cells emit 64M pairs, an ~8 GB single-task grind — so when
    ``est_pairs`` exceeds ``cfg.gather_max_pairs`` the gather path is
    refused regardless of ``n_rows``.

    ``salt`` (default ``cfg.salt_pairs``, ON) adds the explicit SALTED
    repartition the north_rule names: groups larger than
    ``cfg.salt_min_group`` are split into hash-assigned chunks and
    routed to triangle cells, so one hot key's O(m^2) emission spreads
    over ~c^2/2 tasks instead of one straggler — and the purge cap
    rises to ``cfg.hard_block_cap``, so hot keys SALT instead of
    losing recall (the reference never purges, it only warns,
    matching.py:71-73).  Cost over the unsalted plan: one TINY
    combiner-reduced key-frequency shuffle + a hot-key broadcast — the
    heavy data-shuffle count is unchanged (see the routed-salting
    comment block above).  The gather path just emits under the raised
    cap (one task, nothing to spread)."""
    if salt is None:
        salt = cfg.salt_pairs
    cap = cfg.pair_emission_cap(salt)
    hashed = keys.map_batches(_hash_keys, batch_format="pandas")
    if (n_rows is not None and cfg.gather_max_keys > 0
            and n_rows <= cfg.gather_max_keys
            and (est_pairs is None or est_pairs <= cfg.gather_max_pairs)):
        return (
            hashed.repartition(1)
            .map_batches(_gathered_pairs, fn_kwargs={"cap": cap},
                         batch_format="pandas", batch_size=None)
            # split the single emitted block: otherwise the streaming
            # executor fuses downstream map stages (verify kernels,
            # scoring) into this one task and they run serially
            .repartition(cfg.resolve_join_partitions())
        )
    nparts = cfg.resolve_join_partitions()
    if salt:
        import ray

        from ..util import stateful_map

        # pass 1 — exact key frequencies: per-block combiner, one TINY
        # shuffle of 16-byte (kh, count) partials, driver gathers only
        # the hot keys.  hashed is materialized because both passes
        # consume it (8-byte keys + ids — the smallest representation
        # of the input this operator ever holds).
        hashed = hashed.materialize()
        hot = (
            hashed.map_batches(_count_partial, batch_format="pandas")
            .repartition(nparts, keys=["kh"])
            .map_batches(_hot_filter, fn_kwargs={"thr": cfg.salt_min_group},
                         batch_format="pandas", batch_size=None)
        ).to_pandas()
        if len(hot) == 0:
            pass  # no hot keys anywhere: the plain plan below is exact
        elif len(hot) <= cfg.broadcast_max_rows:
            # pass 2 — ONE data shuffle: cold rows co-locate by kh, hot
            # rows replicate to their triangle cells.  Same heavy-
            # shuffle count as the unsalted plan.
            hot_ref = ray.put(hot)
            routed = stateful_map(
                hashed, _RouteSalted,
                (hot_ref, cfg.salt_min_group, cap),
                batch_format="pandas")
            return (
                routed
                .repartition(nparts, keys=["h"])  # the salted repartition
                .map_batches(_emit_routed, fn_kwargs={"cap": cap},
                             batch_format="pandas", batch_size=None)
                .repartition(nparts, keys=["ph"])
                .map_batches(_distinct_block, batch_format="pyarrow",
                             batch_size=None)
            )
        else:
            # degenerate: the hot-key SET itself exceeds the broadcast
            # gate — fall back to the broadcast-free 3-shuffle plan
            # (key shuffle -> cell re-shuffle -> ph shuffle)
            return (
                hashed
                .repartition(nparts, keys=["kh"])
                .map_batches(_partition_pairs_salted,
                             fn_kwargs={"cap": cap,
                                        "salt_min_group": cfg.salt_min_group},
                             batch_format="pandas", batch_size=None)
                .repartition(nparts, keys=["h"])
                .map_batches(_expand_salted, batch_format="pandas",
                             batch_size=None)
                .repartition(nparts, keys=["ph"])
                .map_batches(_distinct_block, batch_format="pyarrow",
                             batch_size=None)
            )
    return (
        hashed
        .repartition(nparts, keys=["kh"])
        .map_batches(_partition_pairs, fn_kwargs={"cap": cap},
                     batch_format="pandas", batch_size=None)
        .repartition(nparts, keys=["ph"])
        .map_batches(_distinct_block, batch_format="pyarrow", batch_size=None)
    )
