"""Gradient-boosted decision trees (numpy, deterministic).

The reference trains ``xgb.XGBClassifier(max_depth=3, n_estimators=100,
learning_rate=0.1, subsample=0.8, colsample_bytree=0.8, reg_alpha=0.1,
reg_lambda=1.0, scale_pos_weight=neg/pos)`` on 7 similarity features
(reference train_model.py:81-92).  xgboost is absent from this
environment, so this module implements the same second-order boosting
scheme (logistic loss, per-round gradient/hessian, greedy exact splits,
XGBoost leaf weights ``-G/(H+lambda)`` with L1 soft-thresholding) from
the public algorithm description — the model's only consumer is the rule
cascade's threshold cuts on ``ml_prob`` (>0.8 / >0.2 / <0.10,
matching.py:458/493/516), which this reproduces.

Everything is seeded: row subsampling and column subsampling use a fixed
``RandomState``, so two fits on the same frame are bit-identical.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .model import FEATURE_COLS


class _Tree:
    """Flat-array binary tree: internal nodes carry (feature, threshold),
    leaves carry weights. Children of node i are 2i+1 / 2i+2."""

    __slots__ = ("feature", "threshold", "value", "is_leaf")

    def __init__(self, n_nodes: int):
        self.feature = np.full(n_nodes, -1, dtype=np.int32)
        self.threshold = np.zeros(n_nodes, dtype=np.float64)
        self.value = np.zeros(n_nodes, dtype=np.float64)
        self.is_leaf = np.zeros(n_nodes, dtype=bool)

    def predict(self, X: np.ndarray) -> np.ndarray:
        n = len(X)
        node = np.zeros(n, dtype=np.int64)
        out = np.zeros(n, dtype=np.float64)
        active = np.ones(n, dtype=bool)
        while active.any():
            leaf_hit = active & self.is_leaf[node]
            if leaf_hit.any():
                out[leaf_hit] = self.value[node[leaf_hit]]
                active = active & ~leaf_hit
            if not active.any():
                break
            f = self.feature[node[active]]
            go_left = X[active, f] < self.threshold[node[active]]
            nxt = np.where(go_left, 2 * node[active] + 1, 2 * node[active] + 2)
            node[active] = nxt
        return out

    def to_dict(self) -> dict:
        return {
            "feature": self.feature.tolist(),
            "threshold": self.threshold.tolist(),
            "value": self.value.tolist(),
            "is_leaf": self.is_leaf.tolist(),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "_Tree":
        t = cls(len(d["feature"]))
        t.feature = np.asarray(d["feature"], dtype=np.int32)
        t.threshold = np.asarray(d["threshold"], dtype=np.float64)
        t.value = np.asarray(d["value"], dtype=np.float64)
        t.is_leaf = np.asarray(d["is_leaf"], dtype=bool)
        return t


def _leaf_weight(G: float, H: float, l2: float, l1: float) -> float:
    # XGBoost leaf: -soft_threshold(G, alpha) / (H + lambda)
    if G > l1:
        g = G - l1
    elif G < -l1:
        g = G + l1
    else:
        g = 0.0
    return -g / (H + l2)


def _build_tree(X, g, h, max_depth, l2, l1, gamma, min_child_weight, cols):
    n_nodes = 2 ** (max_depth + 1) - 1
    tree = _Tree(n_nodes)
    # node_of[i]: current node of row i (-1 = not in this tree's sample)
    stack = [(0, np.arange(len(X)), 0)]
    while stack:
        node, idx, depth = stack.pop()
        G, H = float(g[idx].sum()), float(h[idx].sum())
        if depth >= max_depth or len(idx) < 2:
            tree.is_leaf[node] = True
            tree.value[node] = _leaf_weight(G, H, l2, l1)
            continue
        parent_score = (G * G) / (H + l2)
        best_gain, best_feat, best_thr = 0.0, -1, 0.0
        for f in cols:
            xv = X[idx, f]
            order = np.argsort(xv, kind="stable")
            xs, gs, hs = xv[order], g[idx][order], h[idx][order]
            Gl = np.cumsum(gs)[:-1]
            Hl = np.cumsum(hs)[:-1]
            # candidate split between distinct consecutive values
            valid = xs[1:] != xs[:-1]
            if not valid.any():
                continue
            Hr = H - Hl
            ok = valid & (Hl >= min_child_weight) & (Hr >= min_child_weight)
            if not ok.any():
                continue
            Gr = G - Gl
            gain = Gl * Gl / (Hl + l2) + Gr * Gr / (Hr + l2) - parent_score
            gain = np.where(ok, gain, -np.inf)
            k = int(np.argmax(gain))
            if gain[k] > best_gain + 2 * gamma:
                best_gain = float(gain[k]) - 2 * gamma
                best_feat = f
                best_thr = float((xs[k] + xs[k + 1]) / 2.0)
        if best_feat < 0:
            tree.is_leaf[node] = True
            tree.value[node] = _leaf_weight(G, H, l2, l1)
            continue
        tree.feature[node] = best_feat
        tree.threshold[node] = best_thr
        left = idx[X[idx, best_feat] < best_thr]
        right = idx[X[idx, best_feat] >= best_thr]
        stack.append((2 * node + 1, left, depth + 1))
        stack.append((2 * node + 2, right, depth + 1))
    return tree


class GBDTModel:
    """Boosted-trees binary classifier with the reference XGBoost
    hyperparameters; JSON-serializable (train_model.py:131-132 analog)."""

    def __init__(self, trees=None, learning_rate: float = 0.1,
                 base_score: float = 0.0, feature_cols=None):
        self.trees: list[_Tree] = trees or []
        self.learning_rate = learning_rate
        self.base_score = base_score
        self.feature_cols = list(feature_cols or FEATURE_COLS)

    def decision_function(self, X: np.ndarray) -> np.ndarray:
        z = np.full(len(X), self.base_score, dtype=np.float64)
        for t in self.trees:
            z += self.learning_rate * t.predict(X)
        return z

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        z = np.clip(self.decision_function(np.asarray(X, dtype=np.float64)), -35, 35)
        return 1.0 / (1.0 + np.exp(-z))

    def to_dict(self) -> dict:
        return {
            "type": "gbdt",
            "learning_rate": self.learning_rate,
            "base_score": self.base_score,
            "feature_cols": self.feature_cols,
            "trees": [t.to_dict() for t in self.trees],
        }

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f)

    @classmethod
    def from_dict(cls, d: dict) -> "GBDTModel":
        return cls(
            trees=[_Tree.from_dict(t) for t in d["trees"]],
            learning_rate=d["learning_rate"],
            base_score=d["base_score"],
            feature_cols=d.get("feature_cols"),
        )

    @classmethod
    def load(cls, path: str) -> "GBDTModel":
        with open(path) as f:
            return cls.from_dict(json.load(f))


def train_gbdt(X: np.ndarray, y: np.ndarray,
               n_estimators: int = 100, max_depth: int = 3,
               learning_rate: float = 0.1, subsample: float = 0.8,
               colsample: float = 0.8, reg_alpha: float = 0.1,
               reg_lambda: float = 1.0, gamma: float = 0.0,
               min_child_weight: float = 1.0, seed: int = 42,
               class_weighted: bool = True) -> GBDTModel:
    """Fit with the reference's hyperparameters (train_model.py:81-92);
    scale_pos_weight = neg/pos as in :76-78."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, d = X.shape
    rng = np.random.RandomState(seed)
    if class_weighted:
        pos = max(y.sum(), 1.0)
        neg = max(n - y.sum(), 1.0)
        w = np.where(y == 1, neg / pos, 1.0)
    else:
        w = np.ones(n)
    model = GBDTModel(learning_rate=learning_rate)
    z = np.zeros(n, dtype=np.float64)
    n_sub = max(1, int(round(subsample * n)))
    n_col = max(1, int(round(colsample * d)))
    for _ in range(n_estimators):
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -35, 35)))
        g = w * (p - y)
        h = np.maximum(w * p * (1 - p), 1e-16)
        rows = rng.choice(n, size=n_sub, replace=False) if n_sub < n else np.arange(n)
        cols = np.sort(rng.choice(d, size=n_col, replace=False)) if n_col < d else np.arange(d)
        tree = _build_tree(X[rows], g[rows], h[rows], max_depth,
                           reg_lambda, reg_alpha, gamma, min_child_weight, cols)
        model.trees.append(tree)
        z += learning_rate * tree.predict(X)
    return model


def load_any_model(path: str):
    """Model artifact loader: dispatches on the JSON ``type`` field
    (logistic | gbdt)."""
    from .model import LogisticModel

    with open(path) as f:
        d = json.load(f)
    if d.get("type") == "gbdt":
        return GBDTModel.from_dict(d)
    return LogisticModel(np.array(d["weights"]), d["bias"], d.get("feature_cols"))
