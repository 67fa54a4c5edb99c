"""Model training pipeline (reference train_model.py re-expressed).

Runs the same blocking + feature stages as the flagship (reference
train_model.py:35-39 reuses get_candidates + calculate_features), labels
candidate pairs by ground-truth entity equality (:43-49), and fits the
in-repo logistic model (functions/model.py; xgboost is absent from this
environment — the cascade only consumes ``ml_prob`` through threshold
cuts, so any well-calibrated classifier of the same 7 features is
threshold-compatible, SURVEY §7.2 M4).

The feature table is many orders of magnitude smaller than the input
(candidate pairs only), so the final fit is driver-local numpy on the
collected features — the distributed part is everything upstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.model import FEATURE_COLS, LogisticModel, train_logistic
from ..stages.block import emit_keys, keys_per_profile_bound
from ..stages.evaluate import label_pairs
from ..stages.hydrate import hydrate_pairs
from ..stages.pairs import generate_pairs
from ..stages.score import compute_pair_features
from .flagship import build_profiles


def build_training_frame(transcripts, truth,
                         cfg: EngineConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """transcripts + truth -> labeled feature DataFrame (driver-small)."""
    norm = build_profiles(transcripts, cfg).materialize()
    pairs = generate_pairs(
        emit_keys(norm, cfg), cfg,
        n_rows=norm.count() * keys_per_profile_bound(cfg)).materialize()
    hydrated = hydrate_pairs(pairs, norm, cfg, n_profiles=norm.count())
    feats = hydrated.map_batches(compute_pair_features, batch_format="pandas")
    # dummy classification columns so label_pairs' schema passes through
    labeled = label_pairs(
        feats.map_batches(lambda df: df.assign(is_match=0, match_type="no_match"),
                          batch_format="pandas"),
        truth, cfg,
    )
    drop = ["is_match", "match_type"]
    labeled = labeled.materialize()
    n = labeled.count()
    if cfg.train_max_pairs > 0 and n > cfg.train_max_pairs:
        # bounded driver collect: at corpus scale the labeled candidate
        # table is billions of rows — thin it with a DETERMINISTIC
        # hash-sample of the pair key (pure per-row function: same rows
        # survive at any repartitioning / cluster size) before to_pandas
        from ..ops.sample import _bucket_strs

        nb = 100_000
        keep = max(1, (cfg.train_max_pairs * nb) // n)

        def sample(df: pd.DataFrame) -> pd.DataFrame:
            key = (df["id_a"].astype(str) + "|"
                   + df["id_b"].astype(str)).to_numpy(dtype=object)
            return df.loc[_bucket_strs(key, nb) < keep] \
                .reset_index(drop=True)

        labeled = labeled.map_batches(sample, batch_format="pandas")
    return labeled.to_pandas().drop(columns=drop)


def roc_auc(y: np.ndarray, p: np.ndarray) -> float:
    """ROC-AUC as the Mann-Whitney rank statistic (average ranks for
    ties) — numpy-only equivalent of sklearn.metrics.roc_auc_score."""
    y = np.asarray(y, dtype=np.float64)
    p = np.asarray(p, dtype=np.float64)
    npos = int((y == 1).sum())
    nneg = len(y) - npos
    if npos == 0 or nneg == 0:
        return float("nan")
    order = np.argsort(p, kind="stable")
    ranks = np.empty(len(p), dtype=np.float64)
    ranks[order] = np.arange(1, len(p) + 1)
    # average ranks over tied scores
    sp = p[order]
    tie_starts = np.concatenate([[0], np.where(sp[1:] != sp[:-1])[0] + 1,
                                 [len(sp)]])
    for s, e in zip(tie_starts[:-1], tie_starts[1:]):
        if e - s > 1:
            ranks[order[s:e]] = (s + 1 + e) / 2.0
    rank_sum = ranks[y == 1].sum()
    return float((rank_sum - npos * (npos + 1) / 2.0) / (npos * nneg))


def _fit(X: np.ndarray, y: np.ndarray, kind: str):
    from ..functions.gbdt import train_gbdt

    return train_gbdt(X, y) if kind == "gbdt" else train_logistic(X, y)


def train_from_frame(frame: pd.DataFrame, kind: str = "gbdt",
                     n_folds: int = 5):
    """Fit + report (reference train_model.py:70-119): deterministic
    hash-based 80/20 split (instead of sklearn's seeded shuffle),
    5-fold stratified CV ROC-AUC on the train portion
    (train_model.py:95-99) and a held-out test report with ROC-AUC and
    a confusion matrix (train_model.py:104-113).

    kind="gbdt" mirrors the reference's XGBoost (nonlinear — needed for
    the email+dob-but-initials-only positives Rule 5 must catch);
    kind="logistic" is the cheap fallback."""
    import zlib

    key = (frame["id_a"].astype(str) + "|" + frame["id_b"].astype(str))
    bucket = key.map(lambda s: zlib.crc32(s.encode()) % 100).to_numpy()
    test = bucket < 20
    X = frame[FEATURE_COLS].fillna(0).to_numpy(dtype=np.float64)
    y = frame["label"].to_numpy(dtype=np.float64)

    # 5-fold CV on the train portion: deterministic per-class hash folds
    # (stratified — each class is folded independently)
    Xtr, ytr = X[~test], y[~test]
    fold_hash = key.map(
        lambda s: zlib.crc32(("fold|" + s).encode()) % n_folds).to_numpy()[~test]
    cv_scores = []
    for f in range(n_folds):
        hold = fold_hash == f
        if hold.all() or not hold.any() or len(np.unique(ytr[~hold])) < 2:
            continue
        m = _fit(Xtr[~hold], ytr[~hold], kind)
        auc = roc_auc(ytr[hold], m.predict_proba(Xtr[hold]))
        if not np.isnan(auc):
            cv_scores.append(auc)

    model = _fit(Xtr, ytr, kind)
    p = model.predict_proba(X[test])
    yt = y[test]
    pred = p > 0.5
    tp = int(((yt == 1) & pred).sum())
    fp = int(((yt == 0) & pred).sum())
    fn = int(((yt == 1) & ~pred).sum())
    tn = int(((yt == 0) & ~pred).sum())
    prec = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    report = {
        "n_train": int((~test).sum()), "n_test": int(test.sum()),
        "pos_rate": float(y.mean()),
        "cv_auc": [round(s, 6) for s in cv_scores],
        "cv_auc_mean": float(np.mean(cv_scores)) if cv_scores else None,
        "cv_auc_std": float(np.std(cv_scores)) if cv_scores else None,
        "test_auc": roc_auc(yt, p),
        "confusion": {"tp": tp, "fp": fp, "fn": fn, "tn": tn},
        "test_precision": prec, "test_recall": rec,
        "test_f1": 2 * prec * rec / (prec + rec) if prec + rec else 0.0,
    }
    return model, report


def train_model(transcripts, truth, cfg: EngineConfig = DEFAULT_CONFIG,
                save_path: str | None = None, kind: str = "gbdt"):
    frame = build_training_frame(transcripts, truth, cfg)
    model, report = train_from_frame(frame, kind=kind)
    if save_path:
        model.save(save_path)
    return model, report
