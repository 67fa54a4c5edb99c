"""Pair scoring: hydrated pairs -> features -> ml_prob -> rule cascade.

Reproduces, vectorized over whole Arrow/pandas batches, the reference's
per-pair loops:

* feature semantics   — reference matching.py:260-295 (batch mode);
* model probability   — reference matching.py:549-562 (predict_proba on 7
  feature columns, NaN->0, 0.0 when no model);
* rule cascade        — reference matching.py:408-531
  ``decide_match_status``: 6 match rules (early return), 5 review rules,
  model veto, exact ``>=`` / ``>`` boundaries and ``max()`` score
  accumulation preserved — this cascade IS the match decision the F1
  criterion checks;
* ``is_match``        — reference matching.py:565.

The scorer is an ACTOR POOL (stateful map_batches): the model artifact is
read from disk once per actor in ``__init__`` (reference loads it once
per run, matching.py:541-547), batches stream through ``__call__``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.embed import cosine_pairs_batch
from ..functions.gbdt import load_any_model
from ..functions.model import FEATURE_COLS
from ..functions.strsim import (
    damerau_levenshtein_batch,
    jaro_winkler_batch,
    levenshtein_batch,
)

FEATURE_OUTPUT_COLS = [
    "nid_score", "nid_both_present", "email_score", "phone_match",
    "first_name_score", "last_name_score", "addr_score",
    "dob_match", "dob_both_present", "year_match", "name_cosine",
]


def _col(df: pd.DataFrame, name: str) -> np.ndarray:
    """Column as an object array of strings with None/NaN -> "" (the
    reference does ``str(row.get(...) or '')``, matching.py:236-258)."""
    return df[name].fillna("").astype(str).to_numpy()


def _memo_pairs(a: np.ndarray, b: np.ndarray, kernel) -> np.ndarray:
    """Run a batch string-pair kernel on UNIQUE (a, b) pairs only and
    scatter back — real-world fields repeat heavily (common names,
    shared streets), so this cuts the O(len^2) DP work severalfold."""
    combined = np.char.add(np.char.add(a.astype(str), "\x1f"), b.astype(str))
    uniq, first_idx, inv = np.unique(combined, return_index=True,
                                     return_inverse=True)
    if len(uniq) >= 0.9 * len(a):
        return kernel(a, b)
    vals = kernel(a[first_idx], b[first_idx])
    return vals[inv]


def compute_pair_features(df: pd.DataFrame) -> pd.DataFrame:
    """Hydrated pair batch -> feature columns (matching.py:260-295)."""
    n = len(df)
    out = pd.DataFrame({"id_a": df["id_a"].to_numpy(), "id_b": df["id_b"].to_numpy()})

    nid_a, nid_b = _col(df, "norm_nid_a"), _col(df, "norm_nid_b")
    len_a = np.fromiter((len(s) for s in nid_a), count=n, dtype=np.int64)
    len_b = np.fromiter((len(s) for s in nid_b), count=n, dtype=np.int64)
    both = (len_a > 0) & (len_b > 0)
    nid_score = np.zeros(n, dtype=np.float64)
    if both.any():
        # Damerau-Levenshtein on the present subset only (matching.py:263-266)
        d = _memo_pairs(nid_a[both], nid_b[both],
                        damerau_levenshtein_batch).astype(np.float64)
        mx = np.maximum(len_a[both], len_b[both]).astype(np.float64)
        nid_score[both] = np.where(d == 0, 1.0, 1.0 - d / mx)
    out["nid_score"] = nid_score
    out["nid_both_present"] = both.astype(np.int64)

    out["email_score"] = _memo_pairs(
        _col(df, "norm_email_a"), _col(df, "norm_email_b"), jaro_winkler_batch)

    ph_a, ph_b = _col(df, "norm_phone_a"), _col(df, "norm_phone_b")
    out["phone_match"] = ((ph_a != "") & (ph_b != "") & (ph_a == ph_b)).astype(np.int64)

    out["first_name_score"] = _memo_pairs(
        _col(df, "norm_first_name_a"), _col(df, "norm_first_name_b"),
        jaro_winkler_batch)
    out["last_name_score"] = _memo_pairs(
        _col(df, "norm_last_name_a"), _col(df, "norm_last_name_b"),
        jaro_winkler_batch)

    ad_a, ad_b = _col(df, "norm_address_a"), _col(df, "norm_address_b")
    la = np.fromiter((len(s) for s in ad_a), count=n, dtype=np.int64)
    lb = np.fromiter((len(s) for s in ad_b), count=n, dtype=np.int64)
    aboth = (la > 0) & (lb > 0)
    addr = np.zeros(n, dtype=np.float64)
    if aboth.any():
        d = _memo_pairs(ad_a[aboth], ad_b[aboth],
                        levenshtein_batch).astype(np.float64)
        mx = np.maximum(la[aboth], lb[aboth]).astype(np.float64)
        addr[aboth] = 1.0 - d / mx
    out["addr_score"] = addr

    dob_a, dob_b = _col(df, "norm_dob_a"), _col(df, "norm_dob_b")
    dboth = (dob_a != "") & (dob_b != "")
    out["dob_match"] = (dboth & (dob_a == dob_b)).astype(np.int64)
    out["dob_both_present"] = dboth.astype(np.int64)

    yr_a, yr_b = _col(df, "norm_dob_year_a"), _col(df, "norm_dob_year_b")
    out["year_match"] = ((yr_a != "") & (yr_b != "") & (yr_a == yr_b)
                         & (yr_a != "0000")).astype(np.int64)

    # embedding cosine over the full normalized name (north-star scorer:
    # "Jaro-Winkler/Levenshtein + embedding cosine").  Additional signal
    # the rebuild's scorer reports; NOT a model/cascade input — the
    # decision cascade stays boundary-exact vs reference matching.py.
    name_a = np.char.add(np.char.add(
        _col(df, "norm_first_name_a").astype(str), " "),
        _col(df, "norm_last_name_a").astype(str))
    name_b = np.char.add(np.char.add(
        _col(df, "norm_first_name_b").astype(str), " "),
        _col(df, "norm_last_name_b").astype(str))
    out["name_cosine"] = cosine_pairs_batch(
        np.char.strip(name_a), np.char.strip(name_b))
    return out


def _append(expl: np.ndarray, mask: np.ndarray, text) -> np.ndarray:
    """expl[i] += '; ' + text[i] where mask (vectorized reason builder)."""
    if not mask.any():
        return expl
    t = text if isinstance(text, np.ndarray) else np.full(len(expl), text, dtype=object)
    sep = np.where(expl == "", "", "; ")
    return np.where(mask, expl + sep + t, expl)


def decide_match_status_batch(f: pd.DataFrame) -> pd.DataFrame:
    """Branch-free vectorization of the reference's per-row rule cascade
    (matching.py:408-531). Returns f + match_type / confidence_score /
    explanation / is_match columns."""
    n = len(f)
    nid = f["nid_score"].to_numpy(dtype=np.float64)
    email = f["email_score"].to_numpy(dtype=np.float64)
    phone = f["phone_match"].to_numpy()
    first = f["first_name_score"].to_numpy(dtype=np.float64)
    last = f["last_name_score"].to_numpy(dtype=np.float64)
    addr = f["addr_score"].to_numpy(dtype=np.float64)
    dob = f["dob_match"].to_numpy()
    year = f["year_match"].to_numpy()
    ml = f["ml_prob"].to_numpy(dtype=np.float64)
    name_avg = (first + last) / 2.0
    ml_str = np.array([format(v, ".2f") for v in ml], dtype=object)

    # --- match rules (matching.py:424-479); any fires => status 'match',
    # score = max over fired rule scores with base ml_prob ---
    r1 = (nid >= 0.90) & (name_avg > 0.85)
    r2 = ((email > 0.95) | (phone == 1)) & (name_avg > 0.80) \
        & ((dob == 1) | (nid > 0.5) | (year == 1))
    r3 = (name_avg > 0.85) & (dob == 1)
    r4 = (name_avg > 0.90) & (addr > 0.8)
    r5 = ml > 0.8
    r6 = (name_avg > 0.75) & (year == 1) & (nid > 0.8)
    is_match = r1 | r2 | r3 | r4 | r5 | r6

    score = ml.copy()
    for mask, val in ((r1, 0.95), (r2, 0.90), (r3, 0.85), (r4, 0.85), (r6, 0.95)):
        score = np.where(mask, np.maximum(score, val), score)
    # r5's max(score, ml_prob) is a no-op (base is ml_prob)

    expl = np.full(n, "", dtype=object)
    expl = _append(expl, r1, "Rule 1: Strong National ID & Name Match")
    expl = _append(expl, r2, "Rule 2: Strong Contact Info & Name Match (Verified)")
    expl = _append(expl, r3, "Rule 3: Exact DOB & Strong Name Match")
    expl = _append(expl, r4, "Rule 4: Address & Strong Name Match")
    expl = _append(expl, r5, "Rule 5: High ML Probability (" + ml_str + ")")
    expl = _append(expl, r5 & (email > 0.95), "Reason: Exact Email Match")
    expl = _append(expl, r5 & (phone == 1), "Reason: Exact Phone Match")
    expl = _append(expl, r5 & (nid > 0.95), "Reason: Strong National ID Match")
    expl = _append(expl, r5 & (dob == 1), "Reason: Exact Date of Birth Match")
    expl = _append(expl, r6, "Rule 6: Strong ID + Initials Match")

    # --- review rules (matching.py:486-510), evaluated only when no match
    # rule fired (the reference returns early on match) ---
    nm = ~is_match
    rv1 = nm & (name_avg > 0.93) & (year == 1)
    rv2 = nm & (ml > 0.2)
    rv3 = nm & (nid >= 0.85)
    rv4 = nm & (name_avg > 0.9)
    rv5 = nm & (email == 1.0)
    is_review = rv1 | rv2 | rv3 | rv4 | rv5

    rscore = ml.copy()
    for mask, val in ((rv1, 0.75), (rv3, 0.60), (rv4, 0.50), (rv5, 0.55)):
        rscore = np.where(mask, np.maximum(rscore, val), rscore)
    rexpl = np.full(n, "", dtype=object)
    rexpl = _append(rexpl, rv1, "Very Strong Name & Year Match (Common Name Risk)")
    rexpl = _append(rexpl, rv2, "Moderate ML Probability (" + ml_str + ")")
    rexpl = _append(rexpl, rv3, "Strong ID but Weak Name Match")
    rexpl = _append(rexpl, rv4, "Strong Name Match Only")
    rexpl = _append(rexpl, rv5, "Exact Email Match Only")

    # --- model veto (matching.py:516-523): review -> no_match, score=ml ---
    veto = is_review & (ml < 0.10) & (nid < 0.9) & (email < 0.9)
    rexpl = _append(rexpl, veto, "Model Veto: Low ML Probability (" + ml_str + ")")
    rscore = np.where(veto, ml, rscore)
    is_review = is_review & ~veto

    # --- assemble (match takes priority; else review; else no_match) ---
    none_fired = nm & ~is_review & ~veto
    rexpl = _append(rexpl, none_fired, "No strong matching signals found")

    out = f.copy()
    out["match_type"] = np.select(
        [is_match, is_review], ["match", "review"], default="no_match")
    out["confidence_score"] = np.where(is_match, score, rscore)
    out["explanation"] = np.where(is_match, expl, rexpl)
    out["is_match"] = is_match.astype(np.int64)
    return out


class PairScorer:
    """Actor-pool map_batches kernel: hydrated pairs -> classified pairs.

    Model weights load once per actor (reference matching.py:541-547 loads
    once per run); each ``__call__`` is fully vectorized.
    """

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self.model = (
            load_any_model(cfg.model_path)
            if cfg.model_path and os.path.exists(cfg.model_path) else None
        )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        feats = compute_pair_features(df)
        if self.model is not None:
            X = feats[FEATURE_COLS].fillna(0).to_numpy(dtype=np.float64)
            feats["ml_prob"] = self.model.predict_proba(X)
        else:
            feats["ml_prob"] = 0.0  # matching.py:562
        return decide_match_status_batch(feats)


def score_pairs(hydrated, cfg: EngineConfig = DEFAULT_CONFIG,
                n_rows: int | None = None):
    """hydrated pair Dataset -> classified pair Dataset (features +
    ml_prob + match_type / confidence_score / explanation / is_match)."""
    from ..util import stateful_map

    return stateful_map(
        hydrated, PairScorer, (cfg,),
        batch_format="pandas", batch_size=cfg.batch_size,
    )


class FusedHydrateScorer(PairScorer):
    """Broadcast-hydration + scoring in ONE actor stage: the (id_a, id_b)
    pair batch is joined against the broadcast profile lookup in-process
    and scored immediately — the wide hydrated pair table never hits the
    object store (it is ~8x the size of the pair list)."""

    def __init__(self, lookup_ref, cfg: EngineConfig = DEFAULT_CONFIG):
        super().__init__(cfg)
        import ray

        from .hydrate import _AB_COLS

        lookup: pd.DataFrame = ray.get(lookup_ref)
        self.lookup = lookup.set_index("conv_id")
        self.ab_cols = _AB_COLS

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        a = self.lookup.reindex(df["id_a"].to_numpy())
        b = self.lookup.reindex(df["id_b"].to_numpy())
        wide = pd.DataFrame({"id_a": df["id_a"].to_numpy(),
                             "id_b": df["id_b"].to_numpy()})
        for c in self.ab_cols:
            wide[f"{c}_a"] = a[c].to_numpy()
            wide[f"{c}_b"] = b[c].to_numpy()
        return super().__call__(wide)


def score_pairs_broadcast(pairs, norm_profiles, cfg: EngineConfig = DEFAULT_CONFIG,
                          n_rows: int | None = None):
    """pairs + profiles -> classified pairs without a hydrated
    intermediate (broadcast strategy only)."""
    import ray

    from .block import SCORING_COLS

    from ..util import stateful_map

    lookup = norm_profiles.select_columns(SCORING_COLS).to_pandas()
    ref = ray.put(lookup)
    return stateful_map(
        pairs, FusedHydrateScorer, (ref, cfg),
        batch_format="pandas", batch_size=cfg.batch_size,
    )


def match_type_counts(classified) -> pd.DataFrame:
    """A5 metric: match_type value counts (matching.py:567-568)."""
    return (
        classified.groupby("match_type").count().to_pandas()
        .rename(columns={"count()": "cnt"})
        .sort_values("match_type").reset_index(drop=True)
    )
