"""Pairwise match-probability model.

The reference trains an XGBoost classifier on 7 similarity features
(reference train_model.py:60-92) and uses its ``predict_proba`` only
through threshold cuts inside the rule cascade (>0.8 match, >0.2 review,
<0.10 veto — matching.py:458/493/516). xgboost/sklearn are absent from
this environment, so the engine ships a numpy logistic-regression model
trained by IRLS (Newton) on the same labeled candidate-pair features —
threshold-compatible with the cascade, deterministic, and serialized as a
small JSON artifact loaded once per scorer actor
(reference model artifact: train_model.py:131-132 joblib dump).
"""

from __future__ import annotations

import json
import os

import numpy as np

FEATURE_COLS = [
    # exactly the reference's model features, in order (train_model.py:60-64)
    "nid_score", "email_score", "phone_match",
    "first_name_score", "last_name_score",
    "dob_match", "year_match",
]


class LogisticModel:
    def __init__(self, weights: np.ndarray, bias: float, feature_cols=None):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.bias = float(bias)
        self.feature_cols = list(feature_cols or FEATURE_COLS)

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        z = X @ self.weights + self.bias
        return 1.0 / (1.0 + np.exp(-np.clip(z, -35, 35)))

    def to_dict(self) -> dict:
        return {
            "type": "logistic",
            "weights": self.weights.tolist(),
            "bias": self.bias,
            "feature_cols": self.feature_cols,
        }

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f)

    @classmethod
    def load(cls, path: str) -> "LogisticModel":
        with open(path) as f:
            d = json.load(f)
        return cls(np.array(d["weights"]), d["bias"], d.get("feature_cols"))


def train_logistic(X: np.ndarray, y: np.ndarray,
                   l2: float = 1.0, max_iter: int = 50, tol: float = 1e-8,
                   class_weighted: bool = True) -> LogisticModel:
    """IRLS-fit logistic regression.

    ``class_weighted`` mirrors the reference's ``scale_pos_weight =
    neg/pos`` imbalance handling (train_model.py:76-78). Deterministic:
    no random init, Newton steps from zero.
    """
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, d = X.shape
    w = np.zeros(d + 1)
    Xb = np.concatenate([X, np.ones((n, 1))], axis=1)
    if class_weighted:
        pos = max(y.sum(), 1.0)
        neg = max(n - y.sum(), 1.0)
        sw = np.where(y == 1, neg / pos, 1.0)
    else:
        sw = np.ones(n)
    reg = np.eye(d + 1) * l2
    reg[-1, -1] = 0.0  # don't penalize the bias
    for _ in range(max_iter):
        z = np.clip(Xb @ w, -35, 35)
        p = 1.0 / (1.0 + np.exp(-z))
        g = Xb.T @ (sw * (p - y)) + reg @ w
        r = np.maximum(sw * p * (1 - p), 1e-10)
        H = (Xb * r[:, None]).T @ Xb + reg
        try:
            step = np.linalg.solve(H, g)
        except np.linalg.LinAlgError:
            step = np.linalg.lstsq(H, g, rcond=None)[0]
        w = w - step
        if np.abs(step).max() < tol:
            break
    return LogisticModel(w[:-1], w[-1])
