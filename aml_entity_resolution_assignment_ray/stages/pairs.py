"""Candidate-pair generation: key table -> distinct (id_a, id_b) pairs.

The reference generates candidates by querying a pickled LSH index per
record (matching.py:121-133) plus a 4-way SQL UNION of equi-self-joins on
the exact keys (matching.py:136-167), then set-unions and dedupes
(matching.py:173-177, D1/D2: ``id_a < id_b`` canonical order).

Here both become ONE hash-shuffle self-join over the long key table:
every (key_type, key_value) group of size m emits its m(m-1)/2 pairs.

Scale design (explicit skew + shuffle handling per north_rule):

* groups larger than ``cfg.max_block_records`` are *purged* (emitted as
  zero pairs) — the reference only warns about such blocks
  (matching.py:71-73 "danger zone"); at 10^12-turn scale a hot key would
  otherwise emit O(m^2) pairs.  Purged counts are reported by
  ``blocking_stats``.
* pair emission is fully vectorized (no per-group Python): after
  ``sort([key_type, key_value, conv_id])`` every block holds whole key
  groups (Ray's range partitioner co-locates equal keys — the same
  property GroupedData.map_groups relies on); a single numpy
  repeat/arange construction emits all pairs of all groups in the block
  at once, with ``id_a < id_b`` free because conv_id is the tertiary
  sort key.
* block-edge groups are routed to a tiny side path (O(#blocks) rows)
  and pair-emitted by a small groupby, exactly like stages/assemble.py.
* distinct: ``sort([id_a, id_b])`` + per-block ``drop_duplicates``
  (equal pairs co-locate under the range partition), replacing the
  reference's driver-memory Python set union.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import DEFAULT_CONFIG, EngineConfig

_EMPTY_PAIRS = {
    "id_a": pd.Series([], dtype="string"),
    "id_b": pd.Series([], dtype="string"),
}


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


def _block_pairs(df: pd.DataFrame, cap: int) -> pd.DataFrame:
    """One sorted block of the hashed key table -> pairs for interior
    groups + raw rows (id_b = None, kh kept) for the block's first/last
    group."""
    df = df.sort_values(["kh", "conv_id"], kind="stable")
    ids = df["conv_id"].to_numpy()
    key = df["kh"].to_numpy()
    n = len(key)
    if n == 0:
        return pd.DataFrame({**_EMPTY_PAIRS,
                             "kh": pd.Series([], dtype="uint64")})
    boundaries = np.concatenate([[0], np.where(key[1:] != key[:-1])[0] + 1, [n]])
    starts = boundaries[:-1]
    sizes = np.diff(boundaries)
    ngroups = len(starts)
    interior = np.ones(ngroups, dtype=bool)
    interior[0] = False
    interior[-1] = False
    pairs = _emit_group_pairs(ids, starts[interior], sizes[interior], cap)
    # local distinct: same pair from multiple co-located key groups
    pairs = pairs.drop_duplicates(ignore_index=True)
    pairs["kh"] = np.uint64(0)
    # edge groups: pass rows through for the merge stage
    edge_rows = np.concatenate([
        np.arange(starts[g], starts[g] + sizes[g])
        for g in np.where(~interior)[0]
    ])
    edges = pd.DataFrame({
        "id_a": ids[edge_rows],
        "id_b": pd.Series([None] * len(edge_rows), dtype="string"),
        "kh": key[edge_rows],
    })
    return pd.concat([pairs, edges], ignore_index=True)


def _edge_group_pairs(df: pd.DataFrame, cap: int) -> pd.DataFrame:
    """Pair emission for one straddling key group (tiny side path)."""
    ids = np.sort(df["id_a"].astype(str).unique())
    m = len(ids)
    if m < 2 or m > cap:
        return pd.DataFrame(_EMPTY_PAIRS)
    i, j = np.triu_indices(m, k=1)
    return pd.DataFrame({"id_a": ids[i], "id_b": ids[j]})


def _dedupe_block(t):
    """Arrow-native per-block distinct + schema coercion.

    Every output block of generate_pairs goes through this, guaranteeing
    the exact (id_a: string, id_b: string) schema downstream joins need —
    Ray's groupby/sort machinery can emit zero-column empty blocks for
    empty partitions, which otherwise poison pyarrow hash joins."""
    import pyarrow as pa

    schema = pa.schema([("id_a", pa.string()), ("id_b", pa.string())])
    if "id_a" not in t.column_names or len(t) == 0:
        return schema.empty_table()
    return t.select(["id_a", "id_b"]).cast(schema) \
        .group_by(["id_a", "id_b"]).aggregate([])


def _coerce_pair_schema(t):
    """Ray's map_groups emits a ZERO-COLUMN empty block for empty groupby
    partitions; such a block poisons downstream join/union schema
    inference. Coerce every block to exactly (id_a: string, id_b: string)
    arrow tables."""
    import pyarrow as pa

    schema = pa.schema([("id_a", pa.string()), ("id_b", pa.string())])
    if "id_a" not in t.column_names or len(t) == 0:
        return schema.empty_table()
    return t.select(["id_a", "id_b"]).cast(schema)


def generate_pairs(keys, cfg: EngineConfig = DEFAULT_CONFIG):
    """key table Dataset -> distinct candidate pair Dataset (id_a, id_b)."""
    cap = cfg.max_block_records
    tagged = (
        keys.map_batches(_hash_keys, batch_format="pandas")
        .sort(["kh", "conv_id"])
        .map_batches(_block_pairs, fn_kwargs={"cap": cap},
                     batch_format="pandas", batch_size=None)
        .materialize()
    )
    import pyarrow.compute as pc

    interior_pairs = tagged.map_batches(
        lambda t: t.filter(pc.is_valid(t["id_b"])).select(["id_a", "id_b"]),
        batch_format="pyarrow",
    )
    edge_rows = tagged.map_batches(
        lambda t: t.filter(pc.is_null(t["id_b"])).select(["kh", "id_a"]),
        batch_format="pyarrow",
    ).materialize()
    result = interior_pairs
    # guard: map_groups over an empty dataset yields a zero-column block
    # that would poison the union/join schema; edge rows are O(#blocks)
    # and `tagged` is materialized, so this count is driver-cheap
    if edge_rows.count() > 0:
        edge_pairs = (
            edge_rows.groupby("kh")
            .map_groups(_edge_group_pairs, fn_kwargs={"cap": cap},
                        batch_format="pandas")
            .map_batches(_coerce_pair_schema, batch_format="pyarrow")
        )
        result = interior_pairs.union(edge_pairs)
    return (
        result
        .sort(["id_a", "id_b"])
        .map_batches(_dedupe_block, batch_format="pyarrow", batch_size=None)
    )
