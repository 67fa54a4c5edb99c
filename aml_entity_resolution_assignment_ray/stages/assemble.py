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

  1. global ``sort(["conv_id", "turn_idx"])``: Ray's range partitioner
     puts all rows of equal key in one block, so after the sort each
     block holds whole runs of conversations in turn order (the same
     property Ray's own ``map_groups`` relies on for the *first* key;
     ``turn_idx`` as secondary key gives in-conversation order);
  2. one vectorized ``map_batches`` pass (batch = whole block) that
     extracts per-turn signals and pandas-aggregates *every conversation
     in the block at once*, marking the block's first/last conversation
     as potential stragglers;
  3. conversations not at a block edge are complete; the O(#blocks) edge
     partials are merged in a tiny follow-up groupby.

Straddling is only possible for the conversations at block edges when the
sort's range boundaries split a conv_id across blocks — Ray's sort places
equal keys in one partition, so in practice edge partials are already
complete; the merge pass exists for robustness and costs O(#blocks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import EngineConfig, DEFAULT_CONFIG
from .extract import FIELD_COLS, extract_turn_signals

PROFILE_FIELDS = FIELD_COLS


def _aggregate_block(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-block partial aggregation (all convs at once)."""
    # blocks arrive sorted by (conv_id, turn_idx); enforce locally for
    # safety — cheap when already sorted
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    df = extract_turn_signals(df)
    grp = df.groupby("conv_id", sort=False)
    out = pd.DataFrame({
        "n_turns": grp.size().astype("int64"),
        "text_concat": grp["norm_text"].agg("\n".join),
        "first_turn_idx": grp["turn_idx"].min().astype("int64"),
        "last_turn_idx": grp["turn_idx"].max().astype("int64"),
        "ts_first": grp["ts"].min(),
    })
    for col in FIELD_COLS:
        out[col] = grp[col].first()  # first non-null in turn order
    out = out.reset_index()
    # mark the block's first/last conversation as potential stragglers
    edge = np.zeros(len(out), dtype=bool)
    if len(out):
        edge[0] = True
        edge[-1] = True
    out["_edge"] = edge
    return out


def _merge_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Merge the (rare) multi-partial conversations; input = all edge
    partials of one or more conv_ids."""
    df = df.sort_values(["conv_id", "first_turn_idx"], kind="stable")
    grp = df.groupby("conv_id", sort=False)
    out = pd.DataFrame({
        "n_turns": grp["n_turns"].sum().astype("int64"),
        "text_concat": grp["text_concat"].agg("\n".join),
        "first_turn_idx": grp["first_turn_idx"].min().astype("int64"),
        "last_turn_idx": grp["last_turn_idx"].max().astype("int64"),
        "ts_first": grp["ts_first"].min(),
    })
    for col in FIELD_COLS:
        out[col] = grp[col].first()
    out = out.reset_index()
    out["_edge"] = False
    return out


_DROP_COLS = ["_edge", "first_turn_idx", "last_turn_idx"]


def assemble_profiles(transcripts, cfg: EngineConfig = DEFAULT_CONFIG):
    """transcripts Dataset -> profiles Dataset (one row per conv_id).

    Materializes the partial-profiles intermediate (output-sized, much
    smaller than the turn table) so the edge/non-edge split doesn't
    re-execute the sort.
    """
    partials = (
        transcripts
        .sort(["conv_id", "turn_idx"])
        .map_batches(_aggregate_block, batch_format="pandas", batch_size=None)
        .materialize()
    )
    complete = partials.filter(expr="_edge == False")
    edges = partials.filter(expr="_edge == True")
    # edge partials: tiny (<= 2 per block) — merge properly by conv_id
    merged_edges = edges.groupby("conv_id").map_groups(
        _merge_partials, batch_format="pandas"
    )
    return complete.union(merged_edges).drop_columns(_DROP_COLS)
