"""Checkpointed flagship pipeline (north_rule: a killed run resumes).

Stage graph (each a Parquet checkpoint with lineage + metrics, see
state/checkpoint.py):

    profiles  <- assemble + normalize        ("blocking inputs")
    pairs     <- keys + candidate generation ("blocking outputs")
    classified<- hydrate + score             ("scored edges")
    clusters  <- union-find                  ("union-find forest")
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.block import emit_keys, keys_per_profile_bound
from ..stages.cluster import resolve_entities
from ..stages.pairs import generate_pairs
from ..state.checkpoint import CheckpointManager
from .flagship import build_profiles, classify_pairs_gated


def run_flagship_checkpointed(transcripts_path: str, checkpoint_root: str,
                              cfg: EngineConfig = DEFAULT_CONFIG,
                              run_id: str = "flagship"):
    """transcripts parquet dir -> checkpointed pipeline. Returns a dict
    with the final Datasets + the manager (whose ``events`` record which
    stages were built vs reused)."""
    import ray.data as rd

    mgr = CheckpointManager(checkpoint_root, run_id=run_id,
                            config=cfg.to_dict(),
                            input_path=transcripts_path)

    profiles = mgr.stage(
        "profiles",
        lambda: build_profiles(rd.read_parquet(transcripts_path), cfg),
    )
    pairs = mgr.stage(
        "pairs",
        lambda: generate_pairs(
            emit_keys(profiles, cfg), cfg,
            n_rows=profiles.count() * keys_per_profile_bound(cfg)),
        deps=["profiles"],
    )
    classified = mgr.stage(
        "classified",
        # same broadcast/join strategy gate as run_flagship — a checkpoint
        # resume at scale must not force the profile table into one heap
        lambda: classify_pairs_gated(pairs, profiles, cfg,
                                     n_profiles=profiles.count(),
                                     n_pairs=pairs.count()),
        deps=["profiles", "pairs"],
    )
    clusters = mgr.stage(
        "clusters",
        lambda: resolve_entities(
            classified, profiles.select_columns(["conv_id"]), cfg),
        deps=["classified"],
    )
    return {
        "profiles": profiles,
        "pairs": pairs,
        "classified": classified,
        "predictions": clusters,
        "manager": mgr,
    }
