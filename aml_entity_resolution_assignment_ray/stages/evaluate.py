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
    # Uncapped: a mega-cluster is one giant key group, so this is the
    # path that needs the salted repartition (north_rule) — hot groups
    # split into sub-chunk triangle cells instead of one O(m^2) task.
    uncapped = EngineConfig(max_block_records=_INTRA_CAP)
    return generate_pairs(keyed, uncapped, n_rows=n_rows, salt=True)


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


class _PairSetFilter:
    """Once-per-worker broadcast pair-set membership filter: the small
    side's (id_a, id_b) MultiIndex is fetched from the object store once
    per worker and each batch is an exact vectorized isin."""

    def __init__(self, ref, keep_members: bool):
        import ray

        self.index = ray.get(ref)
        self.keep = keep_members

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[["id_a", "id_b"]]
        ix = pd.MultiIndex.from_arrays(
            [df["id_a"].astype(str), df["id_b"].astype(str)])
        mask = ix.isin(self.index)
        if not self.keep:
            mask = ~mask
        return df.loc[mask, ["id_a", "id_b"]].reset_index(drop=True)


def _broadcast_pair_filter(left, right, cfg: EngineConfig,
                           keep_members: bool):
    """left ⋉/▷ right with the right side broadcast (exact string
    tuples, no hashing).  Caller must have gated ``right``'s row count
    at cfg.broadcast_max_rows."""
    import ray

    from ..util import stateful_map

    rp = right.select_columns(["id_a", "id_b"]).to_pandas()
    ref = ray.put(pd.MultiIndex.from_arrays(
        [rp["id_a"].astype(str), rp["id_b"].astype(str)]))
    return stateful_map(left, _PairSetFilter, (ref, keep_members),
                        batch_format="pandas")


def anti_join_pairs(left, right, cfg: EngineConfig,
                    right_rows: int | None = None):
    """left \\ right for canonical pair Datasets (left_outer + null
    filter — Ray Data has no native anti join; a right side with a
    caller-known row count at or below broadcast_max_rows is broadcast
    instead of shuffled, mirroring hydrate's strategy gate)."""
    if right_rows is not None and right_rows <= cfg.broadcast_max_rows:
        return _broadcast_pair_filter(left, right, cfg, keep_members=False)
    return safe_join(
        left, _mark(right), join_type="left_outer",
        num_partitions=cfg.resolve_join_partitions(), on=("id_a", "id_b"),
    ).map_batches(_null_filter_pairs, batch_format="pyarrow")


def _semi(left, right, cfg: EngineConfig, right_rows: int | None = None):
    """left ⋉ right for canonical pair Datasets (broadcast right side
    when its caller-known count fits the broadcast gate)."""
    if right_rows is not None and right_rows <= cfg.broadcast_max_rows:
        return _broadcast_pair_filter(left, right, cfg, keep_members=True)
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

    n_true = true_pairs.count()
    n_pred = pred_pairs.count()
    tp = _semi(pred_pairs, true_pairs, cfg, right_rows=n_true).count()
    fp = n_pred - tp
    fn_pairs = None
    fn = n_true - tp
    out = {"tp": int(tp), "fp": int(fp), "fn": int(fn)}
    if classified is not None and fn > 0:
        fn_pairs = anti_join_pairs(true_pairs, pred_pairs, cfg,
                                   right_rows=n_pred)
        # classified pairs are already globally distinct (generate_pairs
        # output); _distinct_block here is schema coercion + local dedupe
        from .pairs import _distinct_block

        review_pairs = classified.filter(expr="match_type == 'review'") \
            .select_columns(["id_a", "id_b"]) \
            .map_batches(_distinct_block, batch_format="pyarrow")
        out["fn_in_review"] = int(_semi(fn_pairs, review_pairs, cfg,
                                        right_rows=classified.count()).count())
        out["fn_missed"] = out["fn"] - out["fn_in_review"]
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    out["precision"] = precision
    out["recall"] = recall
    out["f1"] = (2 * precision * recall / (precision + recall)
                 if precision + recall else 0.0)
    return out


class _BroadcastLabeler:
    """Once-per-worker (conv_id -> entity_id) lookup; inner-join
    semantics (pairs with either id missing from truth are dropped)."""

    def __init__(self, ref):
        import ray

        self.map = ray.get(ref)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ea = self.map.reindex(df["id_a"].astype(str)).to_numpy()
        eb = self.map.reindex(df["id_b"].astype(str)).to_numpy()
        keep = pd.notna(ea) & pd.notna(eb)
        df = df.loc[keep].copy()
        df["label"] = (ea[keep] == eb[keep]).astype(np.int64)
        return df


def label_pairs(classified, truth, cfg: EngineConfig = DEFAULT_CONFIG):
    """Adds a ground-truth ``label`` column to classified candidate pairs
    (reference train_model.py:43-49 uses a driver dict).  A truth table
    within the broadcast gate ships as one object-store lookup Series;
    bigger truth tables label via two hash joins."""
    from ..util import scrub_empty_blocks, stateful_map

    classified = scrub_empty_blocks(classified)
    if classified.count() == 0:
        # nothing to label; callers aggregate (their sums handle empty)
        return classified

    n_truth = truth.count()
    if n_truth <= cfg.broadcast_max_rows:
        import ray

        tp = truth.select_columns(["conv_id", "entity_id"]).to_pandas()
        ref = ray.put(pd.Series(tp["entity_id"].astype(str).to_numpy(),
                                index=tp["conv_id"].astype(str).to_numpy()))
        return stateful_map(classified, _BroadcastLabeler, (ref,),
                            batch_format="pandas")

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

    # per-batch partial confusion rows folded on the driver: the partial
    # table is (#batches x 5 ints) — a Dataset.sum() here would pay a
    # hash-shuffle aggregator's fixed startup for a scalar
    parts = labeled.map_batches(confusion, batch_format="pandas").to_pandas()
    sums = {f"sum({k})": (int(parts[k].sum()) if len(parts) else 0)
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
