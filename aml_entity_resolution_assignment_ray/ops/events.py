"""Event-stream operators: gap-based sessionization and sliding-window
aggregation.

Training-data/analytics staples the reference's SQL surface does not
have: assign a session id to every event, where a user's session breaks
when the gap to their previous event exceeds ``gap_s`` seconds; count /
sum events per overlapping time window (window w sliding by s).

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


def sliding_window_agg(events, window_s: int = 3600, slide_s: int = 900,
                       ts_col: str = "ts", value_col: str = "value",
                       cfg: EngineConfig = DEFAULT_CONFIG):
    """Sliding-window aggregate: (window_start, n_events, sum_value) for
    every window of ``window_s`` seconds advancing by ``slide_s``
    (``window_s`` must be a multiple of ``slide_s``).

    Each event belongs to exactly ``window_s // slide_s`` windows, so
    the map side REPLICATES rows by that factor — but a per-batch
    combiner (groupby window_start within the batch) collapses them to
    at most one partial row per (batch, window) before the single hash
    shuffle on window_start.  Shuffle volume is bounded by
    #batches x #windows, independent of the event count."""
    if window_s % slide_s:
        raise ValueError("window_s must be a multiple of slide_s")
    nrep = window_s // slide_s
    slide_us = slide_s * 1_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        bucket = ts // slide_us
        vals = df[value_col].to_numpy(dtype=np.float64)
        ws = ((np.repeat(bucket, nrep)
               - np.tile(np.arange(nrep, dtype=np.int64), len(df)))
              * slide_us)
        rep_vals = np.repeat(vals, nrep)
        g = pd.DataFrame({"window_start": ws, "v": rep_vals}) \
            .groupby("window_start", sort=False)["v"].agg(["size", "sum"])
        return pd.DataFrame({
            "window_start": g.index.to_numpy(),
            "n_events": g["size"].to_numpy(dtype=np.int64),
            "sum_value": g["sum"].to_numpy(dtype=np.float64),
        })

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("window_start", sort=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        return pd.DataFrame({
            "window_start": g.index.to_numpy().astype("datetime64[us]"),
            "n_events": g["n_events"].to_numpy(dtype=np.int64),
            "sum_value": g["sum_value"].to_numpy(dtype=np.float64),
        })

    parts = events.select_columns([ts_col, value_col]).map_batches(
        partial, batch_format="pandas")
    try:
        n_rows = events._meta_count()
    except Exception:
        n_rows = None
    if (n_rows is not None and cfg.gather_max_keys > 0
            and n_rows <= cfg.gather_max_keys):
        return parts.repartition(1).map_batches(
            final, batch_format="pandas", batch_size=None)
    return parts.repartition(cfg.resolve_join_partitions(),
                             keys=["window_start"]) \
        .map_batches(final, batch_format="pandas", batch_size=None)


def global_running_sum(ds, *, bucket_col: str, order_cols: list[str],
                       val_col: str, out_col: str = "running",
                       cfg=None):
    """GLOBAL running total ordered by ``order_cols`` — the classic
    ``sum() OVER (ORDER BY ...)`` window, WITHOUT a single-node sort:
    a two-level distributed prefix sum.

    Contract: ``bucket_col`` must be order-consistent with
    ``order_cols`` (every row of a smaller bucket sorts before every
    row of a larger one — e.g. bucket = hour when ordering by
    timestamp), and ``order_cols`` must be a total order (include a
    unique tiebreak).  ``val_col`` must be integer so partial sums are
    exact and layout-invariant.

    Scale shape:
    1. per-block per-bucket partial sums (a combiner: <= #buckets rows
       per block) gather to the driver, which computes the EXCLUSIVE
       prefix offset of every bucket — bounded by bucket cardinality,
       the caller's granularity lever;
    2. ONE hash repartition on the bucket, then each block sorts ONLY
       its own buckets' rows and adds cumsum + broadcast offset.

    A hot bucket lands on one block — pick the bucket width so no
    bucket exceeds a worker's heap (at 100 TB: an hour of events per
    bucket, not a day)."""
    import ray

    from .relational import _keyed

    cfg = cfg or DEFAULT_CONFIG

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(bucket_col, sort=False)[val_col].sum().reset_index()
        g[val_col] = g[val_col].astype(np.int64)
        return g

    totals = ds.map_batches(partial, batch_format="pandas").to_pandas()
    totals = totals.groupby(bucket_col, sort=True)[val_col].sum()
    offsets = totals.cumsum().shift(1, fill_value=0).astype(np.int64)
    oref = ray.put(offsets.to_dict())

    class AddPrefix:
        def __init__(self, ref):
            self.offsets = ray.get(ref) if isinstance(
                ref, ray.ObjectRef) else ref

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                out = df.copy()
                out[out_col] = pd.Series([], dtype=np.int64)
                return out
            d = df.sort_values([bucket_col, *order_cols],
                               kind="stable").reset_index(drop=True)
            base = d[bucket_col].map(self.offsets).to_numpy(np.int64)
            # within-bucket cumsum: the sort above groups buckets
            cums = d.groupby(bucket_col, sort=False)[val_col].cumsum() \
                .to_numpy(np.int64)
            d[out_col] = base + cums
            return d

    from ..util import stateful_map

    keyed = _keyed(ds, [bucket_col], cfg, None)
    return stateful_map(keyed, AddPrefix, (oref,), batch_format="pandas",
                        batch_size=None)


def funnel_conversion(ds, *, key: str, ts_col: str, step_col: str,
                      steps: list[str], cfg=None, n_rows: int | None = None):
    """Ordered funnel matching: for every key, how many of ``steps``
    completed IN ORDER (step i+1 must occur STRICTLY after the
    earliest qualifying occurrence of step i — the product-analytics
    conversion funnel, and the same sequence-matching shape as
    multi-turn tool-use filtering in a transcript pipeline).

    ONE hash shuffle on the key, then a vectorized per-block pass per
    step: the earliest step-i event after the key's step-(i-1) time is
    a groupby-min over a boolean mask — no per-row Python loop, and
    the work per block is O(rows x len(steps)).  ``ts_col`` must be an
    integer column (epoch us) so the comparisons are exact."""
    from .relational import _keyed

    cfg = cfg or DEFAULT_CONFIG
    if not steps:
        raise ValueError("funnel_conversion: steps must be non-empty")

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: df.get(key, pd.Series(dtype=object)),
                                 "steps_completed":
                                     pd.Series(dtype=np.int64)})[
                [key, "steps_completed"]]
        users = df[key].drop_duplicates()
        completed = pd.Series(np.zeros(len(users), dtype=np.int64),
                              index=users.to_numpy())
        # earliest qualifying time of the previous step per key;
        # keys drop out of `alive` once a step has no qualifying event
        alive = pd.Series(
            np.full(len(users), -np.inf), index=users.to_numpy())
        ts = df[ts_col].to_numpy(dtype=np.int64)
        for step in steps:
            m = (df[step_col] == step).to_numpy()
            prev = df[key].map(alive).to_numpy(dtype=np.float64)
            m &= ts > prev                 # strict order; NaN prev -> False
            cand = df[m]
            if not len(cand):
                break
            t_step = cand.groupby(key, sort=False)[ts_col].min()
            completed.loc[t_step.index] += 1
            alive = t_step.astype(np.float64)   # non-reaching keys drop
        return pd.DataFrame({key: completed.index,
                             "steps_completed": completed.to_numpy()})

    return _keyed(ds, [key], cfg, n_rows).map_batches(
        block, batch_format="pandas", batch_size=None)


def retention_cohorts(ds, *, user_col: str, bucket_col: str,
                      cfg: EngineConfig = DEFAULT_CONFIG,
                      n_rows: int | None = None):
    """Cohort retention analysis: assign every user to the cohort of
    their FIRST activity bucket, then count, for each (cohort, offset)
    cell, the distinct users from that cohort active ``offset`` buckets
    later — the classic product-analytics retention triangle, and the
    freshness/decay profile of a training-data source.

    Input is pre-bucketed: (user_col, bucket_col int64).  Output
    (cohort BIGINT, offset BIGINT, n_users BIGINT); offset 0 rows are
    cohort sizes.

    Shape: (1) distinct (user, bucket) pairs — per-block dedup
    combiner, ONE keyed shuffle, final dedup; (2) first-touch cohort
    per user — keyed_reduce(min), an order-free combiner; (3) ONE hash
    join on user attaches each user's cohort to their activity pairs
    (both sides are already user-keyed; the cohort side is #users rows
    so it shuffles, never broadcasts); (4) distinct-user counts per
    (cohort, offset) are plain row counts after the dedup — keyed_sum
    of ones.  Exact integers end to end: layout-invariant, and the SQL
    oracle replays it with a GROUP BY chain."""
    from ..util import safe_join
    from .relational import _keyed, keyed_reduce, keyed_sum

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            user_col: df[user_col],
            bucket_col: df[bucket_col].astype(np.int64),
        }).drop_duplicates()

    pairs = _keyed(
        ds.select_columns([user_col, bucket_col]).map_batches(
            dedup, batch_format="pandas"),
        [user_col, bucket_col], cfg, n_rows,
    ).map_batches(dedup, batch_format="pandas", batch_size=None) \
        .materialize()

    cohorts = keyed_reduce(
        pairs.map_batches(
            lambda d: pd.DataFrame({
                user_col: d[user_col],
                "_cohort": d[bucket_col].astype(np.int64)}),
            batch_format="pandas"),
        [user_col], ["_cohort"], how="min", cfg=cfg,
        n_rows=_proxy_count(pairs))

    joined = safe_join(pairs, cohorts, join_type="inner",
                       num_partitions=cfg.resolve_join_partitions(),
                       on=(user_col,))

    def to_cells(df: pd.DataFrame) -> pd.DataFrame:
        c = df["_cohort"].to_numpy(np.int64)
        return pd.DataFrame({
            "cohort": c,
            "offset": df[bucket_col].to_numpy(np.int64) - c,
            "n_users": np.ones(len(df), dtype=np.int64)})

    return keyed_sum(joined.map_batches(to_cells, batch_format="pandas"),
                     ["cohort", "offset"], ["n_users"], cfg=cfg)


def _proxy_count(ds) -> int | None:
    try:
        return ds._meta_count()
    except Exception:
        return None


def session_association(events, gap_s: float = 1800.0,
                        cfg: EngineConfig = DEFAULT_CONFIG):
    """Market-basket association over sessions: sessionize each user's
    event stream (gap > ``gap_s`` breaks), treat each session as a
    basket of DISTINCT event types, and return every co-occurring type
    pair with its exact support and lift

        lift = (support * n_sessions) / (support_a * support_b)

    — the behavioral co-occurrence / recommendation primitive.
    Supports are exact int64; lift's ONLY float step is the final
    cast-and-divide of exact integer products, the same expression the
    SQL oracle evaluates from HUGEINT counts, so both sides agree
    bit-for-bit.

    Scale shape: ONE user-keyed shuffle (sessions are complete within
    a user's block); per block, baskets fold to distinct types and
    emit C(t, 2) pair rows per session (t is the small per-session
    distinct-type count) plus singleton and session-count partials
    into a single tagged keyed_sum — combiner-bounded by the type
    vocabulary, never by events.  The aggregated table is
    #types^2-sized, so the final lift join is one tiny block."""
    from .relational import _keyed, keyed_sum

    nparts = cfg.resolve_join_partitions()
    cols = events.select_columns(["event_id", "ts", "user_id",
                                  "event_type"])

    def baskets(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"ta": pd.Series(dtype=object),
                              "tb": pd.Series(dtype=object),
                              "n": pd.Series(dtype=np.int64)})
        if not len(df):
            return empty
        sess = _sessionize_block(df[["event_id", "ts", "user_id"]],
                                 gap_s)
        d = df.merge(sess, on=["event_id", "user_id"], how="inner")
        d = d[["session_id", "event_type"]].drop_duplicates()
        out_a, out_b = [], []
        for _, g in d.groupby("session_id", sort=False):
            t = np.sort(g["event_type"].to_numpy())
            if len(t) >= 2:
                i, j = np.triu_indices(len(t), k=1)
                out_a.append(t[i])
                out_b.append(t[j])
        parts = [empty]
        if out_a:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
            parts.append(pd.DataFrame(
                {"ta": a, "tb": b, "n": np.ones(len(a), np.int64)}))
        sing = d.groupby("event_type", sort=False).size()
        parts.append(pd.DataFrame({
            "ta": sing.index.to_numpy(dtype=object),
            "tb": "", "n": sing.to_numpy(np.int64)}))
        n_sessions = d["session_id"].nunique()
        parts.append(pd.DataFrame({"ta": [""], "tb": [""],
                                   "n": np.int64(n_sessions)}))
        return pd.concat(parts, ignore_index=True)

    keyed = cols.repartition(nparts, keys=["user_id"]).map_batches(
        baskets, batch_format="pandas", batch_size=None)
    agg = keyed_sum(keyed, ["ta", "tb"], ["n"], cfg)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "type_a": pd.Series(dtype=object),
            "type_b": pd.Series(dtype=object),
            "support": pd.Series(dtype=np.int64),
            "lift": pd.Series(dtype=np.float64)})
        if not len(df):
            return empty
        ns = int(df[(df["ta"] == "") & (df["tb"] == "")]["n"].iloc[0])
        sing = df[(df["ta"] != "") & (df["tb"] == "")] \
            .set_index("ta")["n"].to_dict()
        pairs = df[(df["ta"] != "") & (df["tb"] != "")]
        if not len(pairs):
            return empty
        sup = pairs["n"].to_numpy(np.int64)
        lift = np.empty(len(pairs), dtype=np.float64)
        for i, (a, b, s) in enumerate(zip(pairs["ta"], pairs["tb"], sup)):
            lift[i] = (float(int(s) * ns)
                       / float(int(sing[a]) * int(sing[b])))
        return pd.DataFrame({"type_a": pairs["ta"].to_numpy(),
                             "type_b": pairs["tb"].to_numpy(),
                             "support": sup, "lift": lift})

    # the aggregate is #types^2-sized: fold it in ONE block
    one = agg.map_batches(
        lambda d: d.assign(_g=np.int64(0)), batch_format="pandas")
    return _keyed(one, ["_g"], cfg, None).map_batches(
        finalize, batch_format="pandas", batch_size=None)


def merge_intervals(ds, *, key: str, start_col: str, end_col: str,
                    cfg: EngineConfig = DEFAULT_CONFIG):
    """Coalesce overlapping-or-touching intervals per key (the SQL
    gaps-and-islands pattern): rows whose [start, end] ranges overlap
    or abut (next.start <= running max end) merge into one island ->
    Dataset of (key, island_start, island_end, n_merged).  The
    busy-period / duplicated-span / downtime-window primitive.

    Both columns must share one orderable integer-like dtype (int64,
    epoch-us timestamps).  ONE hash shuffle on the key co-locates each
    key's intervals, then a per-block sort + vectorized running-max
    island detection — no per-row loop, cost O(rows log rows) in the
    block sort."""
    from .relational import _keyed, _meta_rows

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key: pd.Series(dtype=df[key].dtype if len(df.columns) else object),
            "island_start": pd.Series(dtype=np.int64),
            "island_end": pd.Series(dtype=np.int64),
            "n_merged": pd.Series(dtype=np.int64)})
        if not len(df):
            return empty
        s = df.sort_values([key, start_col, end_col],
                           kind="stable").reset_index(drop=True)
        k = s[key].to_numpy()
        st = s[start_col].to_numpy(dtype=np.int64)
        en = s[end_col].to_numpy(dtype=np.int64)
        if (en < st).any():
            raise ValueError(f"{end_col} < {start_col} on some rows")
        new_key = np.ones(len(s), dtype=bool)
        new_key[1:] = k[1:] != k[:-1]
        # running max end within key (cython grouped cummax — no
        # arithmetic lifting, so wide timestamp domains can't overflow)
        run = s.groupby(key, sort=False)[end_col].cummax() \
            .to_numpy(dtype=np.int64)
        brk = np.ones(len(s), dtype=bool)
        brk[1:] = new_key[1:] | (st[1:] > run[:-1])
        isl = np.cumsum(brk) - 1
        out = pd.DataFrame({key: k, "_isl": isl, "_st": st, "_en": en})
        g = out.groupby("_isl", sort=False)
        return pd.DataFrame({
            key: g[key].first().to_numpy(),
            "island_start": g["_st"].min().to_numpy(np.int64),
            "island_end": g["_en"].max().to_numpy(np.int64),
            "n_merged": g.size().to_numpy(np.int64)})

    sel = ds.select_columns([key, start_col, end_col])
    return _keyed(sel, [key], cfg, _meta_rows(ds)).map_batches(
        islands, batch_format="pandas", batch_size=None)


def watermark_late_events(ds, *, bucket_col: str, seq_col: str,
                          ts_col: str, lateness: int, cfg=None):
    """Event-time watermark / late-arrival detection — the streaming
    semantic, computed exactly over a replayed arrival order: the
    watermark after arrival i is ``max(ts over arrivals < i) -
    lateness`` (strict prefix, the arrival itself excluded); an event
    is LATE when its own event-time falls below that watermark, and
    ``late_by = max(0, prefix_max - lateness - ts)`` quantifies by how
    much.  The first arrival is never late.

    Contract mirrors ``global_running_sum``: ``bucket_col`` must be
    order-consistent with ``seq_col`` (a unique total arrival order),
    ``ts_col`` integer event-time.  Two-level distributed prefix MAX:
    per-block per-bucket max partials (<= #buckets rows) give the
    driver exclusive bucket offsets, then ONE hash repartition on the
    bucket and a per-block exclusive running max + offset.  Adds
    ``late_by`` (int64) and ``is_late`` (bool) to the input columns."""
    import ray

    from .relational import _keyed

    cfg = cfg or DEFAULT_CONFIG
    SENTINEL = -(2 ** 62)  # "< every prefix"; clamps to late_by 0

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(bucket_col, sort=False)[ts_col].max().reset_index()
        g[ts_col] = g[ts_col].astype(np.int64)
        return g

    totals = ds.map_batches(partial, batch_format="pandas").to_pandas()
    totals = totals.groupby(bucket_col, sort=True)[ts_col].max()
    offsets = totals.cummax().shift(1, fill_value=SENTINEL) \
        .astype(np.int64)
    oref = ray.put(offsets.to_dict())

    class MarkLate:
        def __init__(self, ref):
            self.offsets = ray.get(ref) if isinstance(
                ref, ray.ObjectRef) else ref

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                out = df.copy()
                out["late_by"] = pd.Series([], dtype=np.int64)
                out["is_late"] = pd.Series([], dtype=bool)
                return out
            d = df.sort_values([bucket_col, seq_col],
                               kind="stable").reset_index(drop=True)
            ts = d[ts_col].to_numpy(np.int64)
            base = d[bucket_col].map(self.offsets).to_numpy(np.int64)
            # exclusive within-bucket running max: shift the inclusive
            # cummax right by one inside each bucket run
            grp = d[bucket_col].to_numpy()
            incl = np.maximum.accumulate(ts)
            excl = np.empty(len(d), dtype=np.int64)
            excl[0] = SENTINEL
            excl[1:] = incl[:-1]
            starts = np.ones(len(d), dtype=bool)
            starts[1:] = grp[1:] != grp[:-1]
            # reset the accumulate at bucket starts: recompute per run
            for s in np.where(starts)[0]:
                e = len(d)
                nxt = np.where(starts[s + 1:])[0]
                if len(nxt):
                    e = s + 1 + nxt[0]
                seg = ts[s:e]
                excl[s] = SENTINEL
                if e - s > 1:
                    excl[s + 1:e] = np.maximum.accumulate(seg[:-1])
            prefix = np.maximum(base, excl)
            late_by = np.maximum(prefix - lateness - ts, 0)
            d["late_by"] = late_by.astype(np.int64)
            d["is_late"] = late_by > 0
            return d

    from ..util import stateful_map

    keyed = _keyed(ds, [bucket_col], cfg, None)
    return stateful_map(keyed, MarkLate, (oref,), batch_format="pandas",
                        batch_size=None)


def sliding_distinct_users(events, window_s: int = 3600,
                           slide_s: int = 900, ts_col: str = "ts",
                           user_col: str = "user_id",
                           cfg: EngineConfig = DEFAULT_CONFIG):
    """EXACT distinct users per sliding window — the exact sibling of
    the KMV ``hourly_approx_users`` sketch (use the sketch when the
    per-window distinct set itself is too large to shuffle; this one
    when exactness matters): (window_start, n_users) for every
    ``window_s`` window advancing by ``slide_s``.

    Distinct is not summable, so the combiner carries DISTINCT
    (window, user) pairs: per-batch dedup -> ONE hash shuffle on
    window_start -> per-block global dedup + count.  Shuffle volume is
    bounded by the distinct (window, user) pair count — the price of
    exactness, and the reason the KMV sketch exists alongside."""
    if window_s % slide_s:
        raise ValueError("window_s must be a multiple of slide_s")
    nrep = window_s // slide_s
    slide_us = slide_s * 1_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        bucket = ts // slide_us
        ws = ((np.repeat(bucket, nrep)
               - np.tile(np.arange(nrep, dtype=np.int64), len(df)))
              * slide_us)
        u = np.repeat(df[user_col].to_numpy(), nrep)
        return (pd.DataFrame({"window_start": ws, "u": u})
                .drop_duplicates())

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.drop_duplicates()
             .groupby("window_start", sort=False)["u"].size())
        return pd.DataFrame({
            "window_start": g.index.to_numpy().astype("datetime64[us]"),
            "n_users": g.to_numpy(dtype=np.int64),
        })

    parts = events.select_columns([ts_col, user_col]).map_batches(
        partial, batch_format="pandas")
    return parts.repartition(cfg.resolve_join_partitions(),
                             keys=["window_start"]) \
        .map_batches(final, batch_format="pandas", batch_size=None)
