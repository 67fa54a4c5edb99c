"""Pair hydration: (id_a, id_b) pairs + normalized profiles -> wide pairs.

The reference hydrates candidate pairs with two pandas merges against the
full in-memory record table (reference matching.py:198-219, suffixes
``_a`` / ``_b``).  Distributed equivalents, chosen by config:

* ``join``       — two Ray Data hash-shuffle joins (pairs ⋈ profiles on
  id_a, then on id_b).  The scale path: nothing is materialized on any
  single node; both sides are hash-partitioned on the join key.
* ``broadcast``  — when the scoring-column slice of the profile table is
  small enough to fit in a worker's heap, put it in the object store
  ONCE (``ray.put``) and look pairs up inside ``map_batches`` actors
  (fetched once per actor in ``__init__``, zero re-shipping per batch).
* ``auto``       — broadcast below ``cfg.broadcast_max_rows`` profiles,
  join above.

Only the columns scoring needs travel (SURVEY §7.4 "very wide rows":
``text_concat`` never enters the pair table).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from ..config import DEFAULT_CONFIG, EngineConfig
from ..util import safe_join
from .block import SCORING_COLS

_AB_COLS = [c for c in SCORING_COLS if c != "conv_id"]


def _renamed(profiles, suffix: str):
    """Profiles Dataset with conv_id -> id_{a,b} and norm_* -> norm_*_{a,b}."""
    mapping = {"conv_id": f"id_{suffix}"}
    mapping.update({c: f"{c}_{suffix}" for c in _AB_COLS})
    return profiles.select_columns(SCORING_COLS).rename_columns(mapping)


class _BroadcastHydrator:
    """map_batches actor: joins a pairs batch against a broadcast profile
    lookup (fetched from the object store once per actor)."""

    def __init__(self, lookup_ref):
        lookup: pd.DataFrame = ray.get(lookup_ref)
        self.lookup = lookup.set_index("conv_id")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        a = self.lookup.reindex(df["id_a"].to_numpy())
        b = self.lookup.reindex(df["id_b"].to_numpy())
        for c in _AB_COLS:
            out[f"{c}_a"] = a[c].to_numpy()
            out[f"{c}_b"] = b[c].to_numpy()
        return out


def hydrate_pairs(pairs, norm_profiles, cfg: EngineConfig = DEFAULT_CONFIG,
                  n_profiles: int | None = None):
    """pairs Dataset (id_a, id_b) -> wide pair Dataset with *_a / *_b
    scoring columns (reference matching.py:198-219 semantics)."""
    strategy = cfg.hydrate_strategy
    if strategy == "auto":
        if n_profiles is None:
            n_profiles = norm_profiles.count()
        strategy = "broadcast" if n_profiles <= cfg.broadcast_max_rows else "join"

    if strategy == "broadcast":
        from ..util import stateful_map

        lookup = norm_profiles.select_columns(SCORING_COLS).to_pandas()
        ref = ray.put(lookup)
        return stateful_map(
            pairs, _BroadcastHydrator, (ref,),
            batch_format="pandas", batch_size=cfg.batch_size,
        )

    from .pairs import pair_schema

    nparts = cfg.resolve_join_partitions()
    hydrated = safe_join(
        pairs, _renamed(norm_profiles, "a"), join_type="inner",
        num_partitions=nparts, on=("id_a",),
        empty_left_schema=pair_schema(),
    )
    return safe_join(
        hydrated, _renamed(norm_profiles, "b"), join_type="inner",
        num_partitions=nparts, on=("id_b",),
    )
