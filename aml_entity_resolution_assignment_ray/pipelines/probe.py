"""Single-record probe: the batch-engine equivalent of the reference's
``POST /resolve`` endpoint (reference api.py:219-390).

Given one client-record dict, find candidate conversations among the
normalized profiles (shared blocking key — the same key semantics as
``find_candidates``, api.py:163-215 J5), score them with the identical
feature + cascade path, rank matches (api.py:297-311 O1: priority
match > review, then confidence), truncate (api.py:163 LIMIT, O2) and
deduplicate by first-seen national id (api.py:313-323 D5/J8).

This is a correctness surface, not a service: it runs the same
vectorized kernels on a 1-row probe against a profiles Dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions import minhash as mh
from ..stages.block import KeyEmitter, SCORING_COLS, normalize_batch
from ..stages.score import PairScorer

PROBE_FIELDS = ["first_name", "last_name", "dob", "email", "phone_number",
                "national_id", "address", "city", "country"]


def normalize_probe(record: dict) -> pd.DataFrame:
    """1-row normalize, same kernels as the batch path (api.py:227-233)."""
    row = {f: record.get(f) for f in PROBE_FIELDS}
    df = pd.DataFrame([row])
    return normalize_batch(df)


def probe_keys(norm_row: pd.DataFrame, cfg: EngineConfig) -> set[tuple[str, str]]:
    df = norm_row.copy()
    df["conv_id"] = "__probe__"
    keyed = KeyEmitter(cfg)(df)
    return set(zip(keyed["key_type"], keyed["key_value"]))


def resolve_record(record: dict, norm_profiles, keys,
                   cfg: EngineConfig = DEFAULT_CONFIG,
                   limit: int = 50) -> pd.DataFrame:
    """record dict + profiles/key-table Datasets -> ranked match frame
    (conv_id, match_type, confidence_score, explanation, ...features)."""
    norm_row = normalize_probe(record)
    pkeys = probe_keys(norm_row, cfg)
    if not pkeys:
        return pd.DataFrame()

    import ray

    keyset_ref = ray.put(pkeys)

    class KeyFilter:
        def __init__(self, r):
            # MultiIndex membership: one vectorized isin per batch
            self.index = pd.MultiIndex.from_tuples(sorted(ray.get(r)))

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ix = pd.MultiIndex.from_arrays(
                [df["key_type"], df["key_value"]])
            return df.loc[ix.isin(self.index), ["conv_id"]]

    from ..util import stateful_map

    cand_df = stateful_map(keys, KeyFilter, (keyset_ref,),
                           batch_format="pandas").to_pandas()
    if "conv_id" not in cand_df.columns or cand_df.empty:
        return pd.DataFrame()
    cand_ids = cand_df["conv_id"].drop_duplicates().head(limit)  # O2 LIMIT 50

    cand_set = set(cand_ids)
    probe_cols = SCORING_COLS + ["norm_city"]
    cand_profiles = norm_profiles.map_batches(
        lambda df: df[df["conv_id"].isin(cand_set)][probe_cols],
        batch_format="pandas",
    ).to_pandas()

    # hydrated probe-vs-candidate frame (probe = side a)
    wide = pd.DataFrame({"id_a": ["__probe__"] * len(cand_profiles),
                         "id_b": cand_profiles["conv_id"].to_numpy()})
    ab = [c for c in SCORING_COLS if c != "conv_id"]
    for c in ab:
        wide[f"{c}_a"] = norm_row[c].iloc[0]
        wide[f"{c}_b"] = cand_profiles[c].to_numpy()
    scored = PairScorer(cfg)(wide)
    scored = scored.rename(columns={"id_b": "conv_id"}).drop(columns=["id_a"])
    # city_score: API-mode-only feature (reference matching.py:387-390 —
    # absent from batch mode and from the model's feature list)
    from ..functions.strsim import jaro_winkler_batch

    city_a = np.full(len(cand_profiles), norm_row["norm_city"].iloc[0] or "",
                     dtype=object)
    city_b = cand_profiles["norm_city"].fillna("").to_numpy(dtype=object)
    city = jaro_winkler_batch(city_a, city_b) if len(cand_profiles) else \
        np.zeros(0)
    scored["city_score"] = pd.Series(city, index=pd.Index(
        cand_profiles["conv_id"])).reindex(scored["conv_id"]).to_numpy()

    # rank: priority (match=2 > review=1 > 0), then confidence (O1)
    prio = scored["match_type"].map({"match": 2, "review": 1}).fillna(0)
    scored = scored.assign(_prio=prio).sort_values(
        ["_prio", "confidence_score"], ascending=[False, False],
        kind="stable").drop(columns=["_prio"])

    # D5: first-seen national id wins among ranked candidates
    nids = cand_profiles.set_index("conv_id")["norm_nid"].reindex(
        scored["conv_id"]).fillna("").to_numpy()
    seen: set[str] = set()
    keep = np.ones(len(scored), dtype=bool)
    for i, nid in enumerate(nids):
        if nid:
            if nid in seen:
                keep[i] = False
            seen.add(nid)
    scored = scored[keep].reset_index(drop=True)
    return _flag_identity_conflict(scored)


def _flag_identity_conflict(scored: pd.DataFrame) -> pd.DataFrame:
    """Reference api.py:344-374: if some candidates match via National ID
    signals and OTHERS match via Name/ML signals (disjoint sets), the
    identity evidence is contradictory — force the best match to review
    with an explicit warning."""
    if not len(scored):
        return scored
    sub = scored[scored["match_type"].isin(["match", "review"])]
    id_set, name_set = set(), set()
    for cid, expl in zip(sub["conv_id"], sub["explanation"]):
        parts = str(expl).split("; ")
        id_driven = any("ID" in e for e in parts)
        name_driven = (any("Name" in e for e in parts)
                       or any("ML Probability" in e for e in parts)) \
            and not id_driven
        if id_driven:
            id_set.add(cid)
        if name_driven:
            name_set.add(cid)
    if id_set and name_set and id_set.isdisjoint(name_set):
        scored = scored.copy()
        scored.loc[0, "match_type"] = "review"
        scored.loc[0, "explanation"] = (
            str(scored.loc[0, "explanation"])
            + "; WARNING: Identity Conflict Detected (ID Match vs Name Match)")
    return scored
