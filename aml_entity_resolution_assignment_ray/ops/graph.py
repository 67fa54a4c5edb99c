"""Distributed PageRank over an edge table, in order-invariant
fixed-point integer arithmetic.

The graph-centrality op of a large-scale data pipeline (rank sources /
suppliers / documents by link structure before sampling or pruning).
Ray Data has no iterative-graph primitive; this builds one round of
power iteration from the engine's two core moves — one hash
repartition to co-locate each node's rank, out-degree and out-edges,
then one keyed_sum to fold contributions per destination — exactly the
shape of stages/cluster.py's pointer-jumping rounds.

Why fixed-point integers: a float PageRank is summation-order-
dependent, so a distributed run would not be bit-reproducible across
block layouts, and no SQL oracle could replay it.  Here ranks are
int64 in units of ``1/scale`` and every round is pure integer
arithmetic (floor divisions, exact sums), so the result is
layout-invariant, deterministic, and a DuckDB WITH-chain replays it
bit-for-bit (the same trick as ops/text.py's BPE-round oracle).

Per-round recurrence (all integer, all positive):

    contrib(u)   = rank(u) // outdeg(u)          per out-edge of u
    dangling     = sum of rank(u) for outdeg(u) == 0
    rank'(v)     = (damp_den - damp_num) * scale // (damp_den * n)
                 + damp_num * dangling // (damp_den * n)
                 + damp_num * inflow(v) // damp_den
    inflow(v)    = sum of contrib over distinct in-edges (u, v)

Scale shape: edges / nodes / degrees are distinct-folded per block
before their one keyed shuffle (combiner-bounded); each iteration is
ONE repartition on node (rank + degree + out-edges meet in one block,
so emitting contributions is a block-local merge) plus keyed_sum's
shuffle; the per-round driver state is a single integer (the dangling
mass).  The rank table is materialized once per round — bounded by
#nodes rows of (string, int64), never edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig

#: reserved routing key for the round's dangling-mass accumulator row;
#: node ids must never collide with it (validated at edge fold time).
DANGLING = "\x00__dangling__"

_UNION_SCHEMA = pa.schema([
    pa.field("node", pa.string()),
    pa.field("rank", pa.int64()),
    pa.field("deg", pa.int64()),
    pa.field("dst", pa.string()),
    pa.field("tag", pa.int64()),
])


def _distinct(ds, cols: list[str], cfg: EngineConfig,
              n_rows: int | None = None):
    """Exact distinct rows: per-block dedup partial (combiner), ONE
    hash repartition on the columns, per-block final dedup."""
    from .relational import _keyed

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df[cols].drop_duplicates()

    parts = ds.map_batches(fold, batch_format="pandas")
    return _keyed(parts, cols, cfg, n_rows).map_batches(
        fold, batch_format="pandas", batch_size=None)


def triangle_counts(edges, *, a: str = "a", b: str = "b",
                    cfg: EngineConfig = DEFAULT_CONFIG):
    """Per-node triangle counts of the undirected graph given by an
    edge table (self-loops dropped, duplicates folded) -> Dataset of
    (node, n_tri) over the nodes in at least one triangle.

    The degree-ordered wedge algorithm (the MapReduce classic): direct
    every canonical edge from its lower-(degree, node) endpoint to the
    higher, so each node's OUT-degree is O(sqrt(m)) and the wedge
    volume is bounded by sum(outdeg^2) <= m^1.5 regardless of hub skew
    — a hub of degree d receives its d-1 in-edges but emits almost no
    wedges.  One repartition on src co-locates each node's out-edges;
    wedges (u, v, w) are emitted fully vectorized (the same
    group-offset fanout as stages/pairs._emit_group_pairs), each
    ordered by the SAME (degree, node) rank as the edge direction, so
    the closing test is one hash co-partition of wedges with the
    directed edge set on (v, w) and a block-local merge.  Counts are
    exact integers — layout-invariant and SQL-replayable.

    Node columns may be any sortable dtype (int64 keys, string ids).
    """
    from ..util import safe_join
    from .relational import _keyed, keyed_sum

    nparts = cfg.resolve_join_partitions()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        x, y = df[a].to_numpy(), df[b].to_numpy()
        fwd = x < y
        d = pd.DataFrame({"a": np.where(fwd, x, y),
                          "b": np.where(fwd, y, x)})
        return d[x != y].drop_duplicates()

    ce = _distinct(edges.map_batches(canon, batch_format="pandas"),
                   ["a", "b"], cfg).materialize()
    m = ce.count()
    if m == 0:
        return ce.map_batches(
            lambda d: pd.DataFrame({"node": d["a"],
                                    "n_tri": np.zeros(0, np.int64)}),
            batch_format="pandas")

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": pd.concat([df["a"], df["b"]], ignore_index=True),
            "deg": np.ones(2 * len(df), dtype=np.int64)})

    deg = keyed_sum(ce.map_batches(endpoints, batch_format="pandas"),
                    ["node"], ["deg"], cfg, 2 * m).materialize()

    deg_a = deg.map_batches(
        lambda d: pd.DataFrame({"a": d["node"],
                                "deg_a": d["deg"].astype(np.int64)}),
        batch_format="pandas")
    deg_b = deg.map_batches(
        lambda d: pd.DataFrame({"b": d["node"],
                                "deg_b": d["deg"].astype(np.int64)}),
        batch_format="pandas")
    e1 = safe_join(ce, deg_a, join_type="inner",
                   num_partitions=nparts, on=("a",))
    e2 = safe_join(e1, deg_b, join_type="inner",
                   num_partitions=nparts, on=("b",))

    def direct(df: pd.DataFrame) -> pd.DataFrame:
        da = df["deg_a"].to_numpy(np.int64)
        db = df["deg_b"].to_numpy(np.int64)
        # a < b canonically, so the tie (equal degrees) keeps a -> b
        fwd = (da < db) | (da == db)
        av, bv = df["a"].to_numpy(), df["b"].to_numpy()
        return pd.DataFrame({
            "src": np.where(fwd, av, bv),
            "dst": np.where(fwd, bv, av),
            "dd": np.where(fwd, db, da).astype(np.int64)})

    de = e2.map_batches(direct, batch_format="pandas").materialize()

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"v": df["dst"].iloc[:0],
                              "w": df["dst"].iloc[:0],
                              "u": df["src"].iloc[:0]})
        if not len(df):
            return empty
        d = df.sort_values(["src", "dd", "dst"], kind="stable")
        src, dst = d["src"].to_numpy(), d["dst"].to_numpy()
        change = np.r_[True, src[1:] != src[:-1]]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.r_[starts, len(src)])
        keep = sizes >= 2
        if not keep.any():
            return empty
        ks, kz = starts[keep], sizes[keep]
        offs_k = np.cumsum(kz) - kz
        t = int(kz.sum())
        rows = np.arange(t) - np.repeat(offs_k, kz) + np.repeat(ks, kz)
        row_group_end = np.repeat(ks + kz, kz)
        cnt = row_group_end - rows - 1
        total = int(cnt.sum())
        if total == 0:
            return empty
        i_idx = np.repeat(rows, cnt)
        offs = np.cumsum(cnt) - cnt
        j_idx = np.arange(total) - np.repeat(offs, cnt) + i_idx + 1
        # neighbors are sorted by (dd, dst) = the direction rank, so
        # (v, w) matches the closing edge's orientation
        return pd.DataFrame({"v": dst[i_idx], "w": dst[j_idx],
                             "u": src[i_idx]})

    wg = _keyed(de, ["src"], cfg, m).map_batches(
        wedges, batch_format="pandas", batch_size=None)

    wg_t = wg.map_batches(
        lambda d: pd.DataFrame({"v": d["v"], "w": d["w"], "u": d["u"],
                                "tag": np.zeros(len(d), np.int64)}),
        batch_format="pandas")
    # u is a same-dtype placeholder on the edge side, never read
    de_t = de.map_batches(
        lambda d: pd.DataFrame({"v": d["src"], "w": d["dst"],
                                "u": d["src"],
                                "tag": np.ones(len(d), np.int64)}),
        batch_format="pandas")

    def close(df: pd.DataFrame) -> pd.DataFrame:
        w = df[df["tag"] == 0][["v", "w", "u"]]
        e = df[df["tag"] == 1][["v", "w"]]
        t = w.merge(e, on=["v", "w"], how="inner")
        return pd.DataFrame({
            "node": pd.concat([t["u"], t["v"], t["w"]],
                              ignore_index=True),
            "n_tri": np.ones(3 * len(t), dtype=np.int64)})

    tri = _keyed(wg_t.union(de_t), ["v", "w"], cfg, None).map_batches(
        close, batch_format="pandas", batch_size=None)
    return keyed_sum(tri, ["node"], ["n_tri"], cfg)


def k_core(edges, *, k: int, a: str = "a", b: str = "b",
           max_rounds: int = 64,
           cfg: EngineConfig = DEFAULT_CONFIG):
    """The k-core of the undirected graph given by an edge table
    (self-loops dropped, duplicates folded): the maximal subgraph in
    which every node has degree >= k, found by iterative peeling
    [Matula & Beck 1983; distributed form: Montresor et al. 2013,
    "Distributed k-core decomposition"].  Returns a Dataset of
    (node, deg) — each surviving node with its WITHIN-CORE degree.

    Each peel round is built from the engine's two core moves: one
    keyed_sum over the surviving edges' endpoints for degrees, then a
    semi_join of the edge table against the still-alive node set on
    each endpoint — no driver-side graph state, only the alive COUNT
    crosses to the driver per round (one integer, to detect the
    fixpoint).  Rounds are bounded by the peel depth, not the node
    count: a round removes every currently-under-k node at once, so
    real graphs converge in a handful of rounds (TPC-H-shaped inputs:
    1-2).  Degrees are exact integers — the peel sequence, and hence
    the core, is layout-invariant and replayed bit-for-bit by a
    generated per-round SQL CTE chain (the pagerank/BPE oracle trick).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from .relational import keyed_sum, semi_join

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        x, y = df[a].to_numpy(), df[b].to_numpy()
        fwd = x < y
        d = pd.DataFrame({"a": np.where(fwd, x, y),
                          "b": np.where(fwd, y, x)})
        return d[x != y].drop_duplicates()

    cur = _distinct(edges.map_batches(canon, batch_format="pandas"),
                    ["a", "b"], cfg).materialize()
    m = cur.count()

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": pd.concat([df["a"], df["b"]], ignore_index=True),
            "deg": np.ones(2 * len(df), dtype=np.int64)})

    def degrees(e, n_edges):
        return keyed_sum(e.map_batches(endpoints, batch_format="pandas"),
                         ["node"], ["deg"], cfg, 2 * n_edges)

    deg = degrees(cur, m).materialize()
    prev_alive = -1
    for _ in range(max_rounds):
        alive = deg.map_batches(lambda d: d[d["deg"] >= k],
                                batch_format="pandas").materialize()
        n_alive = alive.count()
        if n_alive == prev_alive:
            break
        prev_alive = n_alive
        if n_alive == 0:
            return alive
        alive_a = alive.map_batches(
            lambda d: pd.DataFrame({"a": d["node"]}),
            batch_format="pandas")
        alive_b = alive.map_batches(
            lambda d: pd.DataFrame({"b": d["node"]}),
            batch_format="pandas")
        cur = semi_join(semi_join(cur, alive_a, on=["a"], cfg=cfg),
                        alive_b, on=["b"], cfg=cfg).materialize()
        m = cur.count()
        deg = degrees(cur, m).materialize()
    return deg.map_batches(lambda d: d[d["deg"] >= k],
                           batch_format="pandas")


def pagerank(edges, *, src: str = "src", dst: str = "dst",
             iterations: int = 4, scale: int = 10 ** 12,
             damp_num: int = 85, damp_den: int = 100,
             cfg: EngineConfig = DEFAULT_CONFIG):
    """PageRank over directed string-keyed edges -> Dataset of
    (node, rank) with rank an int64 in units of 1/``scale``.

    ``edges`` may contain duplicate (src, dst) rows; they are folded
    to distinct edges first (out-degree counts distinct out-neighbors).
    Nodes with no out-edges contribute their rank to the shared
    dangling pool, redistributed uniformly — the standard treatment,
    in integer form.
    """
    from .relational import _keyed, _to_arrow, keyed_sum

    def fold_edges(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"node": df[src].astype(str),
                          "dst": df[dst].astype(str)})
        if (d["node"] == DANGLING).any() or (d["dst"] == DANGLING).any():
            raise ValueError(f"node id collides with reserved {DANGLING!r}")
        return d.drop_duplicates()

    e = _distinct(edges.map_batches(fold_edges, batch_format="pandas"),
                  ["node", "dst"], cfg).materialize()
    n_edges = e.count()

    def deg_part(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"],
                             "deg": np.ones(len(df), dtype=np.int64)})

    deg = keyed_sum(e.map_batches(deg_part, batch_format="pandas"),
                    ["node"], ["deg"], cfg, n_edges).materialize()

    def node_part(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.unique(pd.concat([df["node"], df["dst"]],
                                         ignore_index=True))})

    nodes = _distinct(e.map_batches(node_part, batch_format="pandas"),
                      ["node"], cfg, 2 * n_edges).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda d: d.assign(rank=pd.Series(dtype=np.int64)),
            batch_format="pandas")

    r0 = scale // n_nodes
    teleport = (damp_den - damp_num) * scale // (damp_den * n_nodes)
    ranks = nodes.map_batches(
        lambda d: d.assign(rank=np.full(len(d), r0, dtype=np.int64)),
        batch_format="pandas").materialize()

    deg_t = deg.map_batches(
        _to_arrow(lambda d: d.assign(tag=np.int64(1)), _UNION_SCHEMA),
        batch_format="pandas").materialize()
    e_t = e.map_batches(
        _to_arrow(lambda d: d.assign(tag=np.int64(2)), _UNION_SCHEMA),
        batch_format="pandas").materialize()

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"node": pd.Series(dtype=object),
                              "contrib": pd.Series(dtype=np.int64)})
        if not len(df):
            return empty
        rk = df[df["tag"] == 0][["node", "rank"]]
        dg = df[df["tag"] == 1][["node", "deg"]]
        ed = df[df["tag"] == 2][["node", "dst"]]
        r = rk.merge(dg, on="node", how="left")
        live = r[r["deg"].notna()]
        out = [empty]
        if len(ed) and len(live):
            c = live[["node"]].copy()
            c["c"] = (live["rank"].to_numpy(np.int64)
                      // live["deg"].to_numpy(np.int64))
            oe = ed.merge(c, on="node", how="inner")
            out.append(pd.DataFrame({"node": oe["dst"],
                                     "contrib": oe["c"].astype(np.int64)}))
        dang = r[r["deg"].isna()]
        if len(dang):
            out.append(pd.DataFrame(
                {"node": DANGLING,
                 "contrib": dang["rank"].astype(np.int64)}))
        # zero marker per rank row: every node survives into the next
        # round's rank table even with no inflow
        out.append(pd.DataFrame({"node": rk["node"],
                                 "contrib": np.zeros(len(rk), np.int64)}))
        return pd.concat(out, ignore_index=True)

    for _ in range(iterations):
        r_t = ranks.map_batches(
            _to_arrow(lambda d: d.assign(tag=np.int64(0)), _UNION_SCHEMA),
            batch_format="pandas")
        u = r_t.union(deg_t, e_t)
        n_union = n_nodes + n_edges + deg.count()
        attached = _keyed(u, ["node"], cfg, n_union).map_batches(
            attach, batch_format="pandas", batch_size=None)
        inflow = keyed_sum(attached, ["node"], ["contrib"], cfg,
                           n_edges + 2 * n_nodes).materialize()
        dang_rows = inflow.map_batches(
            lambda d: d[d["node"] == DANGLING],
            batch_format="pandas").take_all()
        dangling = int(dang_rows[0]["contrib"]) if dang_rows else 0
        dang_share = damp_num * dangling // (damp_den * n_nodes)
        base = teleport + dang_share

        def step(d: pd.DataFrame, base=base) -> pd.DataFrame:
            d = d[d["node"] != DANGLING]
            rank = (base
                    + damp_num * d["contrib"].to_numpy(np.int64)
                    // damp_den).astype(np.int64)
            return pd.DataFrame({"node": d["node"], "rank": rank})

        ranks = inflow.map_batches(step, batch_format="pandas") \
            .materialize()

    return ranks


def bfs_hops(edges, seeds, *, a: str = "a", b: str = "b",
             node_col: str = "node", max_hops: int = 4,
             cfg: EngineConfig = DEFAULT_CONFIG):
    """Multi-source BFS hop distance over the undirected graph given
    by an edge table -> Dataset of (node, hop) for every node within
    ``max_hops`` of any seed (seeds themselves at hop 0, including
    seeds absent from the edge table).

    The reachability / neighborhood-expansion primitive of a pipeline
    that prunes or samples data by graph proximity (e.g. keep every
    supplier within 2 purchase hops of a flagged entity).  Each round
    is built from the engine's core moves: one hash-shuffle inner join
    of the symmetrized edge table against the current frontier (emit
    neighbors), one distinct fold, one anti_join against the visited
    set — no driver-side graph state; only the frontier COUNT crosses
    to the driver per round, and rounds are bounded by ``max_hops``,
    not the node count.  Hops are exact integers, so the result is
    layout-invariant and a DuckDB recursive CTE replays it with
    ``min(hop)`` over the bounded walk.
    """
    from ..util import safe_join
    from .relational import anti_join

    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    nparts = cfg.resolve_join_partitions()

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        x, y = df[a].astype(str), df[b].astype(str)
        d = pd.DataFrame({
            "src": pd.concat([x, y], ignore_index=True),
            "dst": pd.concat([y, x], ignore_index=True)})
        return d[d["src"] != d["dst"]].drop_duplicates()

    e = _distinct(edges.map_batches(sym, batch_format="pandas"),
                  ["src", "dst"], cfg).materialize()

    def seed_fold(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": df[node_col].astype(str),
            "hop": np.zeros(len(df), dtype=np.int64)})

    visited = _distinct(
        seeds.map_batches(seed_fold, batch_format="pandas"),
        ["node", "hop"], cfg).materialize()
    frontier = visited

    for h in range(1, max_hops + 1):
        fr = frontier.map_batches(
            lambda d: pd.DataFrame({"src": d["node"]}),
            batch_format="pandas")
        nbrs = safe_join(e, fr, "inner", nparts, ("src",))
        nbrs = _distinct(
            nbrs.map_batches(
                lambda d: pd.DataFrame({"node": d["dst"]})
                if len(d) else pd.DataFrame({"node": pd.Series(dtype=object)}),
                batch_format="pandas"),
            ["node"], cfg)
        fresh = anti_join(
            nbrs,
            visited.map_batches(lambda d: d[["node"]],
                                batch_format="pandas"),
            on=["node"], cfg=cfg).map_batches(
            lambda d, h=h: d.assign(hop=np.full(len(d), h, np.int64)),
            batch_format="pandas").materialize()
        if fresh.count() == 0:
            break
        visited = visited.union(fresh).materialize()
        frontier = fresh
    return visited


def adamic_adar(edges, *, a: str = "a", b: str = "b",
                scale: int = 10 ** 9, max_degree: int = 256,
                cfg: EngineConfig = DEFAULT_CONFIG):
    """Adamic-Adar link-prediction scores [Adamic & Adar 2003] over
    the undirected graph given by an edge table -> Dataset of
    (u, v, aa_score): for every non-adjacent-or-adjacent node pair
    sharing >= 1 common neighbor, ``sum over common neighbors z of
    floor(scale / ln(deg(z)))`` as an exact int64.

    Why fixed-point: a float AA sum is summation-order-dependent;
    with per-degree integer weights every partial sum is exact, so
    the score is layout-invariant and SQL-replayable.  The weight
    table (one row per degree 2..max_degree) is computed ONCE from
    ``math.log`` on the driver and embedded in the oracle as VALUES,
    so no SQL/numpy libm divergence can break the hash.

    Scale shape: wedge emission per center z is O(deg(z)^2) — the
    same hot-key hazard as pair blocking (stages/pairs.py), handled
    the same way: centers above ``max_degree`` are dropped (documented
    cap, mirrored in the oracle's WHERE).  One keyed shuffle
    co-locates each center's adjacency; emission is a per-center
    numpy triu; the final keyed_sum folds scores per (u, v).
    """
    import math

    from .relational import _keyed, keyed_sum

    if max_degree < 2:
        raise ValueError(f"max_degree must be >= 2, got {max_degree}")
    wt = {d: int(math.floor(scale / math.log(d)))
          for d in range(2, max_degree + 1)}

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        x, y = df[a].astype(str), df[b].astype(str)
        d = pd.DataFrame({
            "src": pd.concat([x, y], ignore_index=True),
            "dst": pd.concat([y, x], ignore_index=True)})
        return d[d["src"] != d["dst"]].drop_duplicates()

    e = _distinct(edges.map_batches(sym, batch_format="pandas"),
                  ["src", "dst"], cfg).materialize()
    n_sym = e.count()

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        out_u, out_v, out_w = [], [], []
        if len(df):
            s = df.sort_values(["src", "dst"], kind="stable")
            for _, g in s.groupby("src", sort=False):
                d = len(g)
                if d < 2 or d > max_degree:
                    continue
                w = wt[d]
                nb = g["dst"].to_numpy()
                i, j = np.triu_indices(d, k=1)
                out_u.append(nb[i])
                out_v.append(nb[j])
                out_w.append(np.full(len(i), w, dtype=np.int64))
        if not out_u:
            return pd.DataFrame({"u": pd.Series(dtype=object),
                                 "v": pd.Series(dtype=object),
                                 "aa_score": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"u": np.concatenate(out_u),
                             "v": np.concatenate(out_v),
                             "aa_score": np.concatenate(out_w)})

    wedges = _keyed(e, ["src"], cfg, n_sym).map_batches(
        emit, batch_format="pandas", batch_size=None)
    return keyed_sum(wedges, ["u", "v"], ["aa_score"], cfg)


def adamic_adar_weight_values(scale: int = 10 ** 9,
                              max_degree: int = 256) -> str:
    """The (deg, weight) VALUES list for ``adamic_adar``'s SQL oracle
    — generated from the SAME driver-side math.log table the engine
    uses, so the oracle replays the weights bit-for-bit."""
    import math

    rows = ", ".join(
        f"({d}, {int(math.floor(scale / math.log(d)))})"
        for d in range(2, max_degree + 1))
    return rows


def label_propagation(edges, *, src: str = "src", dst: str = "dst",
                      iterations: int = 3,
                      cfg: EngineConfig = DEFAULT_CONFIG):
    """Synchronous label-propagation communities over an undirected
    graph -> Dataset of (node, label), one row per node with >= 1
    neighbor (self-loops dropped; isolated nodes never appear in an
    edge list).

    Every node starts labeled with its own id; each round, every node
    simultaneously adopts the most frequent label among its neighbors,
    ties broken to the SMALLEST label.  A fixed iteration count makes
    synchronous LPA fully deterministic and layout-invariant (no
    convergence test, no random visit order — the classic async
    variant is irreproducible by design), so a generated SQL CTE chain
    replays it bit-for-bit.

    Scale shape per round: one hash join of the adjacency onto the
    (node, label) table + one combiner-reduced keyed count + one keyed
    argmax — 3 keyed shuffles x ``iterations``, never more; labels
    table stays one row per node."""
    from ..util import safe_join
    from .relational import _keyed, keyed_sum

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src].astype(str)
        b = df[dst].astype(str)
        return pd.DataFrame({
            "node": pd.concat([a, b], ignore_index=True),
            "nbr": pd.concat([b, a], ignore_index=True),
        }).loc[lambda d: d["node"] != d["nbr"]]

    adj = _distinct(edges.map_batches(fold, batch_format="pandas"),
                    ["node", "nbr"], cfg).materialize()
    labels = _distinct(
        adj.map_batches(
            lambda d: pd.DataFrame({"node": d["node"],
                                    "label": d["node"]}),
            batch_format="pandas"),
        ["node", "label"], cfg)

    nparts = cfg.resolve_join_partitions()
    for _ in range(iterations):
        nl = safe_join(
            adj, labels.map_batches(
                lambda d: d.rename(columns={"node": "nbr"}),
                batch_format="pandas"),
            "inner", nparts, ("nbr",)).map_batches(
            lambda d: pd.DataFrame({
                "node": d["node"], "label": d["label"],
                "c": np.ones(len(d), dtype=np.int64)}),
            batch_format="pandas")
        counts = keyed_sum(nl, ["node", "label"], ["c"], cfg)

        def argmax(d: pd.DataFrame) -> pd.DataFrame:
            # keeps c: block-local winners still compete in the final
            # pass (a node's fully-summed (node, label) rows are spread
            # across (node, label)-hashed blocks)
            if not len(d):
                return d[["node", "label", "c"]]
            s = d.sort_values(["c", "label"], ascending=[False, True],
                              kind="stable")
            return (s.groupby("node", sort=False).head(1)
                    [["node", "label", "c"]])

        labels = _keyed(counts.map_batches(argmax, batch_format="pandas"),
                        ["node"], cfg, None).map_batches(
            lambda d: argmax(d)[["node", "label"]],
            batch_format="pandas", batch_size=None).materialize()
    return labels
