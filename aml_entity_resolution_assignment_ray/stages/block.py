"""Blocking stage: profiles -> normalized profiles -> long key table.

Reproduces the reference's ``create_blocking_keys``
(preprocessing.py:166-230): 7 ``norm_*`` columns, date parsing, and the
5 blocking keys — MinHash bands over the full name (B1), national id
len>4 (B2), phone last-6 (B3), exact email (B4), initial|last|dob (B5) —
plus the ``key_count`` coverage metric (B6, preprocessing.py:249-253).

Instead of the reference's central pickled MinHashLSH index
(preprocessing.py:274-291), signatures are split into (b, r) bands and
every key — fuzzy or exact — becomes a row of ONE long key table
``(key_type, key_value, conv_id)``.  Candidate generation is then a
single hash-shuffle self-join on that table (stages/pairs.py), which
yields the same candidate set as ``lsh.query`` + the 4-way SQL UNION
(matching.py:121-167) with no mutable index to share.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions import minhash as mh
from ..functions.textnorm import (
    normalize_address_series,
    normalize_email_series,
    normalize_national_id_series,
    normalize_phone_series,
    normalize_text_series,
    parse_dob_series,
)

NORM_COLS = [
    "norm_first_name", "norm_last_name", "norm_nid", "norm_email",
    "norm_phone", "norm_address", "norm_city", "norm_dob", "norm_dob_year",
]

# columns the scorer needs (text_concat and raw fields stay out of the
# pair table — SURVEY §7.4 "very wide rows")
SCORING_COLS = [
    "conv_id", "norm_first_name", "norm_last_name", "norm_nid",
    "norm_email", "norm_phone", "norm_address", "norm_dob", "norm_dob_year",
]


def normalize_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Adds the norm_* columns (preprocessing.py:170-187 semantics)."""
    df = df.copy()
    df["norm_first_name"] = normalize_text_series(df["first_name"])
    df["norm_last_name"] = normalize_text_series(df["last_name"])
    df["norm_nid"] = normalize_national_id_series(df["national_id"])
    df["norm_email"] = normalize_email_series(df["email"])
    df["norm_phone"] = normalize_phone_series(df["phone_number"])
    df["norm_address"] = normalize_address_series(df["address"])
    df["norm_city"] = normalize_text_series(df["city"])
    dob, year = parse_dob_series(df["dob"])
    df["norm_dob"] = dob
    df["norm_dob_year"] = year
    return df


def normalize_profiles(profiles, cfg: EngineConfig = DEFAULT_CONFIG):
    """profiles Dataset -> normalized profiles Dataset."""
    return profiles.map_batches(normalize_batch, batch_format="pandas")


class KeyEmitter:
    """map_batches kernel: normalized profiles -> long key table
    ``(conv_id, key_type, key_value)``.

    MinHash band parameters are computed once per actor from the config
    (datasketch-style optimal_param; see functions/minhash.py).
    """

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self.bands, self.rows = mh.optimal_param(cfg.lsh_threshold, cfg.lsh_num_perm)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        cfg = self.cfg
        conv = df["conv_id"].to_numpy()
        out_conv, out_type, out_val = [], [], []

        def emit(mask: np.ndarray, key_type: str, values: pd.Series):
            idx = np.where(mask)[0]
            if len(idx):
                out_conv.append(conv[idx])
                out_type.append(np.full(len(idx), key_type, dtype=object))
                out_val.append(values.to_numpy()[idx])

        # B2: national id, only when len > 4 (preprocessing.py:199-201)
        nid = df["norm_nid"]
        emit((nid.str.len() > 4).to_numpy(), "nid", nid)
        # B3: phone last 6 digits when len >= 6 (preprocessing.py:204-210)
        phone = df["norm_phone"]
        emit((phone.str.len() >= 6).to_numpy(), "phone", phone.str.slice(-6))
        # B4: exact email when non-empty (preprocessing.py:213-216)
        email = df["norm_email"]
        emit((email.str.len() > 0).to_numpy(), "email", email)
        # B5: initial|last|dob when all parts present (preprocessing.py:219-228)
        first = df["norm_first_name"]
        last = df["norm_last_name"]
        dob = df["norm_dob"].fillna("")
        ok = ((first.str.len() > 0) & (last.str.len() > 0) & (dob.str.len() > 0)).to_numpy()
        emit(ok, "initial_dob", first.str.slice(0, 1) + "|" + last + "|" + dob)

        # B1: minhash bands over "first last" (preprocessing.py:194-196)
        full_name = (first.fillna("") + " " + last.fillna("")).str.strip()
        has_name = (full_name.str.len() > 0).to_numpy()
        idx = np.where(has_name)[0]
        if len(idx):
            # duplicate names are the norm in an ER corpus: signature
            # the unique values once, then scatter back
            names = full_name.to_numpy()[idx]
            uniq, inv = np.unique(names.astype(str), return_inverse=True)
            sigs = mh.minhash_batch(uniq, cfg.lsh_num_perm)[inv]
            bkeys = mh.band_keys(sigs, self.bands, self.rows)  # (n, bands) uint64
            n = len(idx)
            out_conv.append(np.repeat(conv[idx], self.bands))
            out_type.append(np.full(n * self.bands, "minhash", dtype=object))
            band_ids = np.tile(np.arange(self.bands), n)
            flat = bkeys.reshape(-1)
            vals = np.char.add(
                np.char.add(band_ids.astype("U3"), ":"),
                np.array([format(v, "x") for v in flat], dtype="U17"),
            )
            out_val.append(vals.astype(object))

        if not out_conv:
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype="string"),
                "key_type": pd.Series([], dtype="string"),
                "key_value": pd.Series([], dtype="string"),
            })
        return pd.DataFrame({
            "conv_id": np.concatenate(out_conv),
            "key_type": np.concatenate(out_type),
            "key_value": np.concatenate(out_val).astype(object),
        })


def emit_keys(norm_profiles, cfg: EngineConfig = DEFAULT_CONFIG):
    """normalized profiles -> key table Dataset (B1-B5)."""
    from ..util import stateful_map

    return stateful_map(norm_profiles, KeyEmitter, (cfg,),
                        batch_format="pandas")


def keys_per_profile_bound(cfg: EngineConfig = DEFAULT_CONFIG) -> int:
    """Upper bound on keys emitted per profile (bands + 4 exact key
    types) — lets pipelines size generate_pairs' gather-vs-shuffle
    decision from the profile count they already know."""
    bands, _ = mh.optimal_param(cfg.lsh_threshold, cfg.lsh_num_perm)
    return bands + 4


def key_coverage(norm_profiles, cfg: EngineConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """B6 key_count histogram (preprocessing.py:249-253): how many of
    {nid, minhash(name), phone, email} keys each record carries."""

    def count_batch(df: pd.DataFrame) -> pd.DataFrame:
        first = df["norm_first_name"].fillna("")
        last = df["norm_last_name"].fillna("")
        name = (first + " " + last).str.strip()
        kc = (
            (df["norm_nid"].str.len() > 4).astype(int)
            + (name.str.len() > 0).astype(int)
            + (df["norm_phone"].str.len() >= 6).astype(int)
            + (df["norm_email"].str.len() > 0).astype(int)
        )
        return pd.DataFrame({"key_count": kc.astype("int64")})

    hist = (
        norm_profiles.map_batches(count_batch, batch_format="pandas")
        .groupby("key_count")
        .count()
        .to_pandas()
    )
    return hist.sort_values("key_count").reset_index(drop=True)


def blocking_stats(keys, total_records: int, pairs_count: int,
                   cfg: EngineConfig = DEFAULT_CONFIG) -> dict:
    """A2/A3 health metrics (matching.py:21-76): reduction ratio, pairs
    per record, top-3 largest blocks per key type, oversized-block count.

    Distributed reduction: per-block partial top-k / oversize counts are
    computed inside ``map_batches``; the driver only ever sees
    O(#blocks x #key_types x 3) rows — never the full distinct-key
    table."""
    cap = cfg.max_block_records
    purge_cap = cfg.pair_emission_cap(cfg.salt_pairs)
    sizes = keys.groupby(["key_type", "key_value"]).count()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # hash groupby co-locates each (key_type, key_value) in ONE block,
        # so per-block top-3 + oversize sums combine exactly on the driver
        df = df.rename(columns={"count()": "cnt"})
        top = df.sort_values("cnt", ascending=False).groupby("key_type").head(3)
        over = df[df["cnt"] > cap]          # the reference's warn monitor
        purged = df[df["cnt"] > purge_cap]  # actual recall loss
        summary = pd.DataFrame({
            "key_type": ["__oversized__"],
            "key_value": [""],
            "cnt": [0],
            "n_over": [int(len(over))],
            "rows_over": [int(over["cnt"].sum())],
            "n_purged": [int(len(purged))],
            "rows_purged": [int(purged["cnt"].sum())],
        })
        top = top.assign(n_over=0, rows_over=0, n_purged=0, rows_purged=0)
        return pd.concat([top, summary], ignore_index=True)

    small = sizes.map_batches(partial, batch_format="pandas").to_pandas()
    over_rows = small[small["key_type"] == "__oversized__"]
    tops = small[small["key_type"] != "__oversized__"]
    top = (
        tops.sort_values("cnt", ascending=False)
        .groupby("key_type")
        .head(3)[["key_type", "key_value", "cnt"]]
        .to_dict("records")
    )
    total_possible = total_records * (total_records - 1) / 2
    reduction = 1 - (pairs_count / total_possible) if total_possible > 0 else 0
    return {
        "total_records": int(total_records),
        "candidate_pairs": int(pairs_count),
        "reduction_ratio": float(reduction),
        "pairs_per_record": float(pairs_count / total_records) if total_records else 0.0,
        "top_blocks": top,
        # monitor (reference matching.py:51-74 warn threshold) vs actual
        # purge loss: with salting on, oversized blocks still emit their
        # pairs — only blocks over pair_emission_cap lose candidates
        "oversized_blocks": int(over_rows["n_over"].sum()),
        "oversized_rows": int(over_rows["rows_over"].sum()),
        "purged_blocks": int(over_rows["n_purged"].sum()),
        "purged_rows": int(over_rows["rows_purged"].sum()),
        "max_block_records": cap,
        "pair_emission_cap": purge_cap,
        "salted": bool(cfg.salt_pairs),
    }
