"""Engine configuration.

Mirrors the reference's env-var settings surface (reference:
settings.py:32-46 — ``ER_LSH_THRESHOLD`` 0.7, ``ER_LSH_NUM_PERM`` 128,
"LSH parameters must be consistent across preprocessing/batch/api") and
adds the scale knobs a distributed pipeline needs: block-size caps for
skew handling, batch sizes, actor-pool sizing, checkpoint root.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, asdict


def _env_float(name: str, default: float) -> float:
    raw = os.getenv(name)
    if raw in (None, ""):
        return default
    try:
        return float(raw)
    except ValueError:
        return default


def _env_int(name: str, default: int) -> int:
    raw = os.getenv(name)
    if raw in (None, ""):
        return default
    try:
        return int(raw)
    except ValueError:
        return default


@dataclass(frozen=True)
class EngineConfig:
    # --- LSH / MinHash (reference: settings.py:41-42) ---
    lsh_threshold: float = field(default_factory=lambda: _env_float("ER_LSH_THRESHOLD", 0.7))
    lsh_num_perm: int = field(default_factory=lambda: _env_int("ER_LSH_NUM_PERM", 128))

    # --- skew handling (explicit per north_rule; reference only *monitors*
    # block sizes, matching.py:51-74 warns at >50 / danger >1000 @50M) ---
    # Blocks larger than max_block_records are truncated-and-logged before
    # pair emission (bounds the per-key O(m^2) pair explosion).
    max_block_records: int = field(default_factory=lambda: _env_int("ER_MAX_BLOCK_RECORDS", 1000))

    # --- physical execution ---
    batch_size: int = 8192            # rows per map_batches batch in scoring
    scorer_concurrency: int = 0       # 0 = let Ray size the pool from resources
    groupby_num_partitions: int = 0   # 0 = DataContext default

    # --- pair hydration (reference matching.py:198-219 two merges) ---
    # "auto": broadcast the profile lookup when it has <= broadcast_max_rows
    # rows (one ray.put, fetched once per actor), else two hash-shuffle joins.
    hydrate_strategy: str = field(
        default_factory=lambda: os.getenv("ER_HYDRATE_STRATEGY", "auto")
    )
    broadcast_max_rows: int = field(
        default_factory=lambda: _env_int("ER_BROADCAST_MAX_ROWS", 2_000_000)
    )
    # Above this many payload docs, ops/dedup._verify_pairs reduces the
    # hydration payload to pair-REFERENCED rows first (one broadcast
    # key-set isin pass — near-dup candidates are typically a small
    # fraction of the corpus, so every downstream hydration byte shrinks
    # by the non-candidate fraction).  Below it the reduction's two
    # small materializations cost more than they save.
    verify_prefilter_min_docs: int = field(
        default_factory=lambda: _env_int("ER_VERIFY_PREFILTER_MIN_DOCS",
                                         100_000)
    )
    # 0 = auto: ~2 partitions per cluster CPU, clamped to [4, 256]. Fixed
    # values >0 override (a real multi-node run should set this to a few
    # x total cores).
    join_num_partitions: int = field(
        default_factory=lambda: _env_int("ER_JOIN_NUM_PARTITIONS", 0)
    )
    # Size-gated small-input path for generate_pairs: when the caller
    # knows the key table has <= this many rows, pair emission gathers
    # into ONE task (a plain repartition(1)) instead of paying two hash
    # shuffles (~1s fixed aggregator-actor setup each in Ray 2.49) —
    # the pair-generation analogue of broadcast hydration.  Worst-case
    # single-task output is bounded by max_block_records * rows / 2
    # pairs; 0 disables the path entirely (always shuffle).
    gather_max_keys: int = field(
        default_factory=lambda: _env_int("ER_GATHER_MAX_KEYS", 500_000)
    )
    # Companion gate on pair-EMISSION volume: a key table can be small in
    # rows yet quadratic in output (semantic-dedup cells emit C(cell,2)
    # pairs each — 500k rows in 256-row cells is 64M pairs, ~8 GB in one
    # gathered task).  Callers that can bound their emission pass
    # ``est_pairs``; the gather path is taken only when BOTH gates pass.
    gather_max_pairs: int = field(
        default_factory=lambda: _env_int("ER_GATHER_MAX_PAIRS", 2_000_000)
    )
    # IVF probe fast path: when the probed cells' parquet files total at
    # most this many bytes, IVFIndex.search scans them in-process
    # (pyarrow read + the same masked top-k numpy kernel) instead of
    # spinning a Ray Dataset job — ~1s of fixed per-stage setup saved on
    # every small probe, identical results (pinned by test).  Probes
    # touching more than this stay distributed.  0 disables the fast
    # path (always distribute).
    ivf_local_search_max_bytes: int = field(
        default_factory=lambda: _env_int("ER_IVF_LOCAL_SEARCH_MAX_BYTES",
                                         128 << 20)
    )

    def resolve_join_partitions(self) -> int:
        if self.join_num_partitions > 0:
            return self.join_num_partitions
        # call-time env read: tune_context(nparts=...) publishes the
        # data-driven partition count here, and module-level DEFAULT_CONFIG
        # instances (constructed at import, before tuning) must see it —
        # each hash shuffle pays ~0.1s per partition of fixed overhead,
        # so partition count follows data size, not CPU count
        env = os.getenv("ER_JOIN_NUM_PARTITIONS")
        if env:
            try:
                return max(2, int(env))
            except ValueError:
                pass
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        return max(4, min(256, cpus * 2))

    # --- salted repartition (north_rule: "explicit salted repartition to
    # break hot-key skew") ---
    # In generate_pairs(salt=True), key groups larger than this are split
    # into ceil(m / salt_min_group) sub-chunks and re-shuffled as
    # (chunk_i, chunk_j) cells so one hot key's O(m^2) pair emission
    # spreads over ~c^2/2 tasks instead of one straggler.  Used by the
    # UNCAPPED pair paths (cluster evaluation); the capped candidate path
    # already bounds per-key work via max_block_records.
    salt_min_group: int = field(
        default_factory=lambda: _env_int("ER_SALT_MIN_GROUP", 512)
    )
    # Salt-instead-of-purge (flagship default): with salting on, hot key
    # groups up to hard_block_cap emit ALL their pairs (spread across
    # triangle cells) — the reference never drops candidates, it only
    # warns (matching.py:71-73).  max_block_records remains the skew
    # MONITOR threshold (blocking_stats) and the purge cap when salting
    # is off; hard_block_cap is the safety valve for degenerate keys
    # (100k members = 5e9 pairs from one key).
    salt_pairs: bool = field(
        default_factory=lambda: _env_int("ER_SALT_PAIRS", 1) != 0
    )
    hard_block_cap: int = field(
        default_factory=lambda: _env_int("ER_HARD_BLOCK_CAP", 100_000)
    )

    def pair_emission_cap(self, salt: bool) -> int:
        """Effective per-key-group emission cap for generate_pairs:
        salting raises the purge cap to hard_block_cap (never lowering
        an explicitly-raised max_block_records, e.g. the uncapped
        cluster-evaluation path)."""
        if salt:
            return max(self.max_block_records, self.hard_block_cap)
        return self.max_block_records

    # training collect bound: the labeled candidate-pair feature table
    # is driver-collected for the final fit; above this row count it is
    # first thinned by a deterministic hash-sample (repartition- and
    # cluster-size-invariant), so the collect can never exceed a known
    # driver budget at corpus scale.  0 disables the bound.
    train_max_pairs: int = field(
        default_factory=lambda: _env_int("ER_TRAIN_MAX_PAIRS", 5_000_000)
    )

    # connected components: edge lists at or below this size finish on
    # the driver with an array DSU (match graphs are vastly smaller than
    # the input); larger graphs run distributed min-label rounds.
    cc_driver_max_edges: int = field(
        default_factory=lambda: _env_int("ER_CC_DRIVER_MAX_EDGES", 2_000_000)
    )

    def actor_pool_range(self, n_rows: int | None = None) -> tuple[int, int]:
        """(min, max) actor-pool size for stateful map_batches stages:
        scale with the cluster (capped), never hardcoded.  ``n_rows``
        (when the caller knows the input size) caps the pool at the
        number of batches — tiny inputs must not pay 30+ actor
        startups."""
        if self.scorer_concurrency > 0:
            cap = self.scorer_concurrency
        else:
            try:
                import ray

                cpus = int(ray.cluster_resources().get("CPU", 8))
            except Exception:
                cpus = 8
            cap = max(2, min(64, cpus))
        if n_rows is not None:
            batches = max(1, -(-int(n_rows) // max(1, self.batch_size)))
            cap = max(1, min(cap, batches))
        return (1, cap)

    # --- model ---
    model_path: str = field(
        default_factory=lambda: os.getenv(
            "ER_MODEL_PATH",
            os.path.join(os.path.dirname(__file__), "models", "default_model.json"),
        )
    )

    # --- checkpointing ---
    checkpoint_root: str = field(
        default_factory=lambda: os.getenv("ER_CHECKPOINT_ROOT", "/tmp/er_checkpoints")
    )

    def to_dict(self) -> dict:
        return asdict(self)


DEFAULT_CONFIG = EngineConfig()
