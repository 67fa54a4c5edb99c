"""Assemble stage: transcripts -> one profile row per conversation.

The reference reads one row per client record (preprocessing.py:236); in
the transcript shape a record's fields are spread over a conversation's
turns, so this stage groups by ``conv_id`` with turns in stable
``turn_idx`` order (the per-row invariant the driver verifies) and emits:

  conv_id, n_turns, text_concat (normalized turn texts joined in turn
  order), first ts, and the first non-null occurrence of each extracted
  field (first_name, last_name, dob, email, phone_number, national_id,
  address, city, country).

Scale design — instead of ``groupby().map_groups`` (one Python call per
group; prohibitive at 10^9 conversations) the stage uses:

  1. HASH repartition on ``conv_id`` (``repartition(keys=["conv_id"])``):
     every conversation lands wholly in one partition — unlike a range
     sort there is no boundary straddling, so no edge-merge pass exists;
  2. one vectorized ``map_batches`` pass (batch = whole block) that
     sorts the block by (conv_id, turn_idx) — giving the stable
     in-conversation turn order the O4 contract requires — extracts
     per-turn signals and pandas-aggregates *every conversation in the
     block at once*.

One shuffle, one map stage, fully streaming.
"""

from __future__ import annotations

import pandas as pd

from ..config import EngineConfig, DEFAULT_CONFIG
from .extract import FIELD_COLS, extract_turn_signals

PROFILE_FIELDS = FIELD_COLS


def _aggregate_block(df: pd.DataFrame, extracted: bool = False) -> pd.DataFrame:
    """Vectorized per-block aggregation (all convs at once); conversations
    are complete within the block (hash co-location)."""
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    if not extracted:
        df = extract_turn_signals(df)
    grp = df.groupby("conv_id", sort=False)
    out = pd.DataFrame({
        "n_turns": grp.size().astype("int64"),
        "text_concat": grp["norm_text"].agg("\n".join),
        "ts_first": grp["ts"].min(),
    })
    for col in FIELD_COLS:
        out[col] = grp[col].first()  # first non-null in turn order
    return out.reset_index()


def assemble_profiles(transcripts, cfg: EngineConfig = DEFAULT_CONFIG,
                      n_rows: int | None = None):
    """transcripts Dataset -> profiles Dataset (one row per conv_id).

    ``n_rows``: turn count when the caller knows it.  At or below
    ``cfg.gather_max_keys`` the keyed shuffle (~1s fixed aggregator
    setup in Ray 2.49) is replaced by parallel per-turn extraction, a
    plain repartition(1) and ONE aggregate task — per-turn regex work
    (the compute-heavy part) stays parallel; only the cheap
    sort-and-group of already-extracted rows runs single-task."""
    if (n_rows is not None and cfg.gather_max_keys > 0
            and n_rows <= cfg.gather_max_keys):
        return (
            transcripts
            .map_batches(extract_turn_signals, batch_format="pandas")
            .repartition(1)
            .map_batches(_aggregate_block, fn_kwargs={"extracted": True},
                         batch_format="pandas", batch_size=None)
        )
    nparts = cfg.resolve_join_partitions()
    return (
        transcripts
        .repartition(nparts, keys=["conv_id"])
        .map_batches(_aggregate_block, batch_format="pandas", batch_size=None)
    )
