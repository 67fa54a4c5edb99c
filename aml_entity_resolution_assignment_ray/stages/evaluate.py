"""Pairwise precision / recall / F1 evaluation, distributed.

The reference evaluates by materializing intra-cluster pair *sets* for
ground truth and predictions in driver memory and set-intersecting them
(reference matching.py:598-679, A6).  Here both sides are pair Datasets
(emitted by the same vectorized machinery as candidate generation) and
the set ops become hash joins:

* TP  = pred_pairs ⋈ true_pairs (inner)
* FP  = pred_pairs ▷ true_pairs (anti: left_outer + null filter)
* FN  = true_pairs ▷ pred_pairs, split into "caught in review" vs truly
  missed by joining against the review-pair set
  (matching.py:626-646, D4).

Also provides the *pair-level* evaluation the BASELINE metric names:
classified candidate pairs (which by construction share a blocking key)
labeled by ground-truth entity equality (reference train_model.py:43-49,
J6) vs the cascade's ``is_match``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..util import safe_join
from .pairs import generate_pairs

_INTRA_CAP = 1 << 30  # no truncation for evaluation pair emission


def cluster_pairs(ds, cluster_col: str, id_col: str = "conv_id",
                  cfg: EngineConfig = DEFAULT_CONFIG,
                  n_rows: int | None = None):
    """(id, cluster) Dataset -> canonical intra-cluster pair Dataset.

    Reuses the blocking pair machinery: a cluster id is just a blocking
    key every member shares (matching.py:610-624 builds the same sets
    row-wise in driver memory).
    """
    import pyarrow as pa

    keyed = ds.map_batches(
        lambda t: pa.table({
            "key_type": pa.array(["cluster"] * len(t), pa.string()),
            "key_value": t[cluster_col].cast(pa.string()),
            "conv_id": t[id_col],
        }),
        batch_format="pyarrow",
    )
    uncapped = EngineConfig(max_block_records=_INTRA_CAP)
    return generate_pairs(keyed, uncapped, n_rows=n_rows)


def _mark(ds):
    """Append a constant marker column (for anti-join null filtering)."""
    import pyarrow as pa

    return ds.map_batches(
        lambda t: t.append_column("_r", pa.array(np.ones(len(t), dtype=np.int8))),
        batch_format="pyarrow",
    )


def _null_filter_pairs(t):
    """Keep rows whose _r marker is null; coerce to the exact pair schema
    (join outputs for empty partitions can be zero-column blocks that
    would poison a downstream join).  A block WITHOUT the marker column
    but WITH pair columns comes from safe_join's empty-right short
    circuit — nothing matched, every row survives the anti join."""
    import pyarrow as pa
    import pyarrow.compute as pc

    schema = pa.schema([("id_a", pa.string()), ("id_b", pa.string())])
    if "id_a" not in t.column_names or len(t) == 0:
        return schema.empty_table()
    if "_r" not in t.column_names:
        return t.select(["id_a", "id_b"]).cast(schema)
    return t.filter(pc.is_null(t["_r"])).select(["id_a", "id_b"]).cast(schema)


def anti_join_pairs(left, right, cfg: EngineConfig):
    """left \\ right for canonical pair Datasets (left_outer + null
    filter — Ray Data has no native anti join)."""
    return safe_join(
        left, _mark(right), join_type="left_outer",
        num_partitions=cfg.resolve_join_partitions(), on=("id_a", "id_b"),
    ).map_batches(_null_filter_pairs, batch_format="pyarrow")


def _semi(left, right, cfg: EngineConfig):
    """left ⋉ right for canonical pair Datasets."""
    return safe_join(left, right, join_type="inner",
                     num_partitions=cfg.resolve_join_partitions(),
                     on=("id_a", "id_b"))


def pairwise_eval(predictions, truth, classified=None,
                  cfg: EngineConfig = DEFAULT_CONFIG) -> dict:
    """Cluster-level pairwise P/R/F1 (reference matching.py:598-679).

    predictions: (conv_id, predicted_entity_id); truth: (conv_id,
    entity_id); classified (optional): scored pairs, used to split FN
    into review-caught vs truly missed.
    """
    from ..util import scrub_empty_blocks
    from .pairs import pair_schema

    true_pairs = scrub_empty_blocks(
        cluster_pairs(truth, "entity_id", cfg=cfg, n_rows=truth.count()),
        pair_schema())
    pred_pairs = scrub_empty_blocks(
        cluster_pairs(predictions, "predicted_entity_id", cfg=cfg,
                      n_rows=predictions.count()),
        pair_schema())

    tp = _semi(pred_pairs, true_pairs, cfg).count()
    fp = pred_pairs.count() - tp
    fn_pairs = None
    fn = true_pairs.count() - tp
    out = {"tp": int(tp), "fp": int(fp), "fn": int(fn)}
    if classified is not None and fn > 0:
        fn_pairs = anti_join_pairs(true_pairs, pred_pairs, cfg)
        # classified pairs are already globally distinct (generate_pairs
        # output); _distinct_block here is schema coercion + local dedupe
        from .pairs import _distinct_block

        review_pairs = classified.filter(expr="match_type == 'review'") \
            .select_columns(["id_a", "id_b"]) \
            .map_batches(_distinct_block, batch_format="pyarrow")
        out["fn_in_review"] = int(_semi(fn_pairs, review_pairs, cfg).count())
        out["fn_missed"] = out["fn"] - out["fn_in_review"]
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    out["precision"] = precision
    out["recall"] = recall
    out["f1"] = (2 * precision * recall / (precision + recall)
                 if precision + recall else 0.0)
    return out


def label_pairs(classified, truth, cfg: EngineConfig = DEFAULT_CONFIG):
    """Adds a ground-truth ``label`` column to classified candidate pairs
    via two hash joins on the truth table (reference train_model.py:43-49
    uses a driver dict; joins scale)."""
    from ..util import scrub_empty_blocks

    classified = scrub_empty_blocks(classified)
    if classified.count() == 0:
        # nothing to label; callers aggregate (their sums handle empty)
        return classified
    t_a = truth.rename_columns({"conv_id": "id_a", "entity_id": "ent_a"})
    t_b = truth.rename_columns({"conv_id": "id_b", "entity_id": "ent_b"})
    joined = safe_join(classified, t_a, join_type="inner",
                       num_partitions=cfg.resolve_join_partitions(), on=("id_a",))
    joined = safe_join(joined, t_b, join_type="inner",
                       num_partitions=cfg.resolve_join_partitions(), on=("id_b",))

    def add_label(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["label"] = (df["ent_a"] == df["ent_b"]).astype(np.int64)
        return df.drop(columns=["ent_a", "ent_b"])

    return joined.map_batches(add_label, batch_format="pandas")


def labeled_pair_eval(classified, truth, cfg: EngineConfig = DEFAULT_CONFIG) -> dict:
    """BASELINE metric: pair-level P/R/F1 of ``is_match`` against labeled
    candidate pairs (pairs share a blocking key by construction)."""
    labeled = label_pairs(classified, truth, cfg)

    def confusion(df: pd.DataFrame) -> pd.DataFrame:
        y, p = df["label"].to_numpy(), df["is_match"].to_numpy()
        review = (df["match_type"] == "review").to_numpy()
        return pd.DataFrame({
            "tp": [int(((y == 1) & (p == 1)).sum())],
            "fp": [int(((y == 0) & (p == 1)).sum())],
            "fn": [int(((y == 1) & (p == 0)).sum())],
            "tn": [int(((y == 0) & (p == 0)).sum())],
            "fn_in_review": [int(((y == 1) & (p == 0) & review).sum())],
        })

    sums = labeled.map_batches(confusion, batch_format="pandas") \
        .sum(["tp", "fp", "fn", "tn", "fn_in_review"])
    if sums is None or not isinstance(sums, dict):  # empty labeled set
        sums = {}
    sums = {f"sum({k})": sums.get(f"sum({k})") or 0
            for k in ("tp", "fp", "fn", "tn", "fn_in_review")}
    tp, fp, fn = sums["sum(tp)"], sums["sum(fp)"], sums["sum(fn)"]
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    return {
        "tp": int(tp), "fp": int(fp), "fn": int(fn), "tn": int(sums["sum(tn)"]),
        "fn_in_review": int(sums["sum(fn_in_review)"]),
        "precision": precision, "recall": recall,
        "f1": (2 * precision * recall / (precision + recall)
               if precision + recall else 0.0),
    }
