"""Event-stream operators: gap-based sessionization.

A training-data/analytics staple the reference's SQL surface does not
have: assign a session id to every event, where a user's session breaks
when the gap to their previous event exceeds ``gap_s`` seconds.

Scale design: ONE hash repartition on ``user_id`` co-locates each
user's events, then a single vectorized pass per block sorts by
(user_id, ts, event_id) and derives session ordinals with a grouped
cumulative sum — no per-user Python loop, no global sort.  Small
inputs (caller-known or parquet-metadata row count at or below
``cfg.gather_max_keys``) skip the keyed shuffle for repartition(1),
the same gate as pair generation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import DEFAULT_CONFIG, EngineConfig


def _sessionize_block(df: pd.DataFrame, gap_s: float) -> pd.DataFrame:
    """All events of each contained user -> (event_id, user_id,
    session_id); users are complete within the block (hash co-location).
    Ties on ts break by event_id, so output is deterministic."""
    if not len(df):
        return pd.DataFrame({
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "session_id": pd.Series([], dtype="string"),
        })
    df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    user = df["user_id"].to_numpy()
    ts = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    same_user = np.zeros(len(df), dtype=bool)
    same_user[1:] = user[1:] == user[:-1]
    gap_us = np.zeros(len(df), dtype=np.int64)
    gap_us[1:] = ts[1:] - ts[:-1]
    brk = (same_user & (gap_us > int(gap_s * 1_000_000))).astype(np.int64)
    # per-user session ordinal: cumulative breaks minus the cumulative
    # count at each user's first row (vectorized reset per user)
    csum = np.cumsum(brk)
    first = ~same_user
    base = np.maximum.accumulate(np.where(first, csum, 0))
    sess = csum - base
    return pd.DataFrame({
        "event_id": df["event_id"].to_numpy(),
        "user_id": user,
        "session_id": np.char.add(np.char.add(user.astype("U20"), ":"),
                                  sess.astype("U10")).astype(object),
    })


def sessionize(events, gap_s: float = 1800.0,
               cfg: EngineConfig = DEFAULT_CONFIG,
               n_rows: int | None = None):
    """events Dataset (event_id, ts, user_id, ...) -> (event_id,
    user_id, session_id) with session breaks at gaps > ``gap_s``."""
    if n_rows is None:
        try:
            n_rows = events._meta_count()
        except Exception:
            n_rows = None
    cols = events.select_columns(["event_id", "ts", "user_id"])
    if (n_rows is not None and cfg.gather_max_keys > 0
            and n_rows <= cfg.gather_max_keys):
        return (cols.repartition(1)
                .map_batches(_sessionize_block, fn_kwargs={"gap_s": gap_s},
                             batch_format="pandas", batch_size=None)
                .repartition(cfg.resolve_join_partitions()))
    return (cols.repartition(cfg.resolve_join_partitions(),
                             keys=["user_id"])
            .map_batches(_sessionize_block, fn_kwargs={"gap_s": gap_s},
                         batch_format="pandas", batch_size=None))
