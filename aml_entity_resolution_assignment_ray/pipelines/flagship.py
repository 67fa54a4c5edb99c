"""Flagship entity-resolution pipeline (reference run_matching,
matching.py:681-715, re-expressed as a lazy Ray Data DAG):

transcripts -> assemble -> normalize -> keys -> candidate pairs ->
hydrate -> score (actor pool) -> cluster -> (optional) evaluate.

Each stage is Dataset -> Dataset; the driver decides what to consume
(write_parquet / aggregates).  Nothing here materializes the full input;
only the small pair/label tables are ever aggregated.
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.assemble import assemble_profiles
from ..stages.block import (blocking_stats, emit_keys,
                            keys_per_profile_bound, normalize_profiles)
from ..stages.cluster import resolve_entities
from ..stages.evaluate import labeled_pair_eval, pairwise_eval
from ..stages.hydrate import hydrate_pairs
from ..stages.pairs import generate_pairs
from ..stages.score import score_pairs, score_pairs_broadcast


def build_profiles(transcripts, cfg: EngineConfig = DEFAULT_CONFIG,
                   n_rows: int | None = None):
    """transcripts -> normalized profiles (one row per conv_id)."""
    if n_rows is None:
        try:
            # metadata-only count (parquet reads / in-memory inputs);
            # None for transformed plans — executing them here to learn
            # the size would double at-scale work, so those keep the
            # shuffle path unless the caller passes n_rows
            n_rows = transcripts._meta_count()
        except Exception:
            n_rows = None
    return normalize_profiles(
        assemble_profiles(transcripts, cfg, n_rows=n_rows), cfg)


def classify_pairs_gated(pairs, norm, cfg: EngineConfig,
                         n_profiles: int, n_pairs: int):
    """The broadcast/join hydration strategy switch, shared by the
    flagship and checkpointed pipelines: a profile table at or below
    ``cfg.broadcast_max_rows`` takes the fused broadcast-hydrate+score
    path (the wide hydrated table never hits the object store); anything
    larger hydrates via two hash joins — at scale the profile table
    won't fit one heap, so the gate must hold on EVERY entry point."""
    strategy = cfg.hydrate_strategy
    if strategy == "auto":
        strategy = ("broadcast" if n_profiles <= cfg.broadcast_max_rows
                    else "join")
    if strategy == "broadcast":
        return score_pairs_broadcast(pairs, norm, cfg, n_rows=n_pairs)
    hydrated = hydrate_pairs(pairs, norm, cfg, n_profiles=n_profiles)
    return score_pairs(hydrated, cfg, n_rows=n_pairs)


def run_flagship(transcripts, cfg: EngineConfig = DEFAULT_CONFIG,
                 truth=None, with_stats: bool = False) -> dict:
    """Full pipeline. Returns a dict of named Datasets (lazy where
    possible) plus metric dicts when ``truth`` / ``with_stats`` ask for
    them."""
    norm = build_profiles(transcripts, cfg).materialize()
    n_profiles = norm.count()
    keys = emit_keys(norm, cfg)
    from ..stages.pairs import pair_schema
    from ..util import scrub_empty_blocks

    pairs = scrub_empty_blocks(
        generate_pairs(keys, cfg,
                       n_rows=n_profiles * keys_per_profile_bound(cfg)),
        pair_schema())
    n_pairs = pairs.count()
    if n_pairs == 0:
        # no candidates at all: classified = 0 rows WITH the full scored
        # schema (run the scorer on an empty wide frame), every conv_id
        # its own entity
        import pandas as pd
        import ray.data as rd

        from ..stages.block import SCORING_COLS
        from ..stages.score import PairScorer

        wide = pd.DataFrame({"id_a": pd.Series([], dtype="string"),
                             "id_b": pd.Series([], dtype="string")})
        for c in SCORING_COLS:
            if c != "conv_id":
                wide[f"{c}_a"] = pd.Series([], dtype="string")
                wide[f"{c}_b"] = pd.Series([], dtype="string")
        classified = rd.from_pandas(PairScorer(cfg)(wide))
        predictions = resolve_entities(
            classified, norm.select_columns(["conv_id"]), cfg).materialize()
        out = {"profiles": norm, "pairs": pairs, "classified": classified,
               "predictions": predictions}
        if with_stats:
            out["blocking_stats"] = blocking_stats(keys, n_profiles, 0, cfg)
        if truth is not None:
            out["pair_eval"] = labeled_pair_eval(classified, truth, cfg)
            out["cluster_eval"] = pairwise_eval(predictions, truth,
                                                classified, cfg)
        return out
    # scoring-task granularity: ~100k pairs per task so the scoring wave
    # count stays >= 4 per CPU and per-block string-cost skew amortizes
    # (data-driven — identical block count at any cluster size)
    target_blocks = max(1, n_pairs // 100_000)
    if target_blocks > pairs.num_blocks() * 1.5:
        pairs = pairs.repartition(target_blocks).materialize()
    classified = classify_pairs_gated(
        pairs, norm, cfg, n_profiles=n_profiles, n_pairs=n_pairs
    ).materialize()
    predictions = resolve_entities(
        classified, norm.select_columns(["conv_id"]), cfg).materialize()

    out = {
        "profiles": norm,
        "pairs": pairs,
        "classified": classified,
        "predictions": predictions,
    }
    if with_stats:
        out["blocking_stats"] = blocking_stats(
            keys, n_profiles, pairs.count(), cfg)
    if truth is not None:
        out["pair_eval"] = labeled_pair_eval(classified, truth, cfg)
        out["cluster_eval"] = pairwise_eval(predictions, truth, classified, cfg)
    return out
