"""ops/graph.pagerank and ops/profile.grouped_ols against independent
pure-Python references of the same exact arithmetic."""

import numpy as np
import pandas as pd
import pytest

from aml_entity_resolution_assignment_ray.config import EngineConfig
from aml_entity_resolution_assignment_ray.ops.graph import DANGLING, pagerank
from aml_entity_resolution_assignment_ray.ops.profile import grouped_ols

SCALE = 10 ** 12


def _ref_pagerank(edges, iterations, scale=SCALE):
    """Sequential reference of the identical integer recurrence."""
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    deg = {}
    for u, _ in e:
        deg[u] = deg.get(u, 0) + 1
    rank = {v: scale // n for v in nodes}
    teleport = 15 * scale // (100 * n)
    for _ in range(iterations):
        inflow = {v: 0 for v in nodes}
        dangling = 0
        for v in nodes:
            if v not in deg:
                dangling += rank[v]
        for u, v in e:
            inflow[v] += rank[u] // deg[u]
        share = 85 * dangling // (100 * n)
        rank = {v: teleport + share + 85 * inflow[v] // 100
                for v in nodes}
    return rank


@pytest.mark.usefixtures("ray_session")
def test_pagerank_matches_reference():
    import ray.data as rd

    rng = np.random.default_rng(7)
    # random digraph with duplicate edges, dangling sinks, and a hub
    srcs = [f"n{int(i)}" for i in rng.integers(0, 30, size=200)]
    dsts = [f"n{int(i)}" for i in rng.integers(0, 40, size=200)]
    srcs += ["hub"] * 10
    dsts += [f"n{int(i)}" for i in range(10)]
    df = pd.DataFrame({"src": srcs, "dst": dsts})
    got = pagerank(rd.from_pandas(df), iterations=4,
                   cfg=EngineConfig()).to_pandas()
    want = _ref_pagerank(list(zip(srcs, dsts)), iterations=4)
    assert len(got) == len(want)
    got_map = dict(zip(got["node"], got["rank"].astype(int)))
    assert got_map == want
    # hub-pointed nodes outrank pure sinks that nobody links to twice
    assert all(r > 0 for r in got_map.values())


@pytest.mark.usefixtures("ray_session")
def test_pagerank_rejects_reserved_node_id():
    import ray.data as rd

    df = pd.DataFrame({"src": [DANGLING], "dst": ["x"]})
    with pytest.raises(Exception, match="reserved"):
        pagerank(rd.from_pandas(df), iterations=1).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_pagerank_layout_invariant():
    """Same graph, different block layout -> identical ranks (the
    fixed-point claim)."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "src": [f"a{int(i)}" for i in rng.integers(0, 12, size=80)],
        "dst": [f"a{int(i)}" for i in rng.integers(0, 12, size=80)],
    })
    r1 = pagerank(rd.from_pandas(df), iterations=3).to_pandas()
    r2 = pagerank(rd.from_pandas(df).repartition(7),
                  iterations=3).to_pandas()
    m1 = dict(zip(r1["node"], r1["rank"]))
    m2 = dict(zip(r2["node"], r2["rank"]))
    assert m1 == m2


def _ref_ols(df, key, x, y):
    out = {}
    for k, g in df.groupby(key):
        xs = [int(v) for v in g[x]]
        ys = [int(v) for v in g[y]]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        if dx == 0:
            out[k] = (np.nan, np.nan, np.nan)
            continue
        slope = float(num) / float(dx)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        r2 = float(num * num) / float(dx * dy) if dy else np.nan
        out[k] = (slope, intercept, r2)
    return out


@pytest.mark.usefixtures("ray_session")
def test_grouped_ols_exact():
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=n),
        "x": rng.integers(0, 24, size=n).astype(np.int64),
        "y": rng.integers(-500, 50000, size=n).astype(np.int64),
    })
    # one zero-variance-x group
    df = pd.concat([df, pd.DataFrame(
        {"g": ["flat"] * 4, "x": [5] * 4, "y": [1, 2, 3, 4]})],
        ignore_index=True)
    got = grouped_ols(rd.from_pandas(df).repartition(5),
                      key="g", x_col="x", y_col="y").to_pandas()
    want = _ref_ols(df, "g", "x", "y")
    assert len(got) == len(want)
    for r in got.itertuples():
        ws, wi, wr = want[r.g]
        for a, b in ((r.slope, ws), (r.intercept, wi), (r.r2, wr)):
            if np.isnan(b):
                assert np.isnan(a)
            else:
                assert a == b  # bit-exact, not approx

    # slope recovered on a noiseless line: y = 3x + 7
    line = pd.DataFrame({"g": ["l"] * 50,
                         "x": np.arange(50, dtype=np.int64),
                         "y": (3 * np.arange(50) + 7).astype(np.int64)})
    res = grouped_ols(rd.from_pandas(line), key="g",
                      x_col="x", y_col="y").to_pandas()
    assert res["slope"].iloc[0] == 3.0
    assert res["intercept"].iloc[0] == 7.0
    assert res["r2"].iloc[0] == 1.0


def _ref_triangles(pairs):
    """Brute-force per-node triangle membership counts."""
    import itertools

    adj = {}
    for x, y in pairs:
        if x == y:
            continue
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    counts = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for v in (x, y, z):
                counts[v] = counts.get(v, 0) + 1
    return counts


@pytest.mark.usefixtures("ray_session")
def test_triangle_counts_known_graph():
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.graph import (
        triangle_counts,
    )

    # K4 on 1..4 (4 triangles, each node in 3), a square 5-6-7-8 with
    # one diagonal 5-7 (two triangles), an isolated edge, a self-loop,
    # duplicate and reversed duplicate edges
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (5, 6), (6, 7), (7, 8), (8, 5), (5, 7),
             (9, 10), (11, 11), (2, 1), (1, 2)]
    df = pd.DataFrame(pairs, columns=["a", "b"]).astype(np.int64)
    got = triangle_counts(rd.from_pandas(df).repartition(4),
                          a="a", b="b").to_pandas()
    want = _ref_triangles(pairs)
    assert dict(zip(got["node"].astype(int),
                    got["n_tri"].astype(int))) == want
    assert want[1] == 3 and want[5] == 2 and want[6] == 1
    assert 9 not in want and 11 not in want


@pytest.mark.usefixtures("ray_session")
def test_triangle_counts_random_vs_bruteforce():
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.graph import (
        triangle_counts,
    )

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "a": rng.integers(0, 25, size=160).astype(np.int64),
        "b": rng.integers(0, 25, size=160).astype(np.int64),
    })
    got = triangle_counts(rd.from_pandas(df).repartition(6),
                          a="a", b="b").to_pandas()
    want = _ref_triangles(list(zip(df["a"], df["b"])))
    assert dict(zip(got["node"].astype(int),
                    got["n_tri"].astype(int))) == want


@pytest.mark.usefixtures("ray_session")
def test_image_ahash_dup_pairs_vs_bruteforce():
    """Banded 64-bit signature path == brute-force hamming over the
    packed ahashes, on a corpus with planted exact + noisy dups."""
    import itertools

    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops import multimodal as mm
    from aml_entity_resolution_assignment_ray.util import stateful_map

    media = rd.from_arrow(mm.make_fake_media_table(n=48, seed=5))
    images = media.filter(expr="mime == 'image/png'")
    dec = mm.decode_images(images, fake=True).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    rng = np.random.default_rng(2)
    copies = []
    for i in range(0, len(dec), 2):
        row = dec.iloc[i]
        px = np.asarray(row["pixels"], dtype=np.int64).copy()
        idx = rng.integers(0, len(px), size=max(1, len(px) // 80))
        px[idx] = np.clip(px[idx] + rng.integers(-10, 11, size=len(idx)),
                          0, 255)
        copies.append({"media_id": "dup_" + str(row["media_id"]),
                       "pixels": px.astype(np.uint8),
                       "shape": row["shape"]})
    all_df = pd.concat([dec, pd.DataFrame(copies)], ignore_index=True)
    ds = rd.from_pandas(all_df)

    got = mm.image_ahash_dup_pairs(ds, max_hamming=6).to_pandas()
    got_set = {(r.id_a, r.id_b, r.hamming) for r in got.itertuples()}

    sig = stateful_map(ds, mm.AHashPack, (8,),
                       batch_format="pandas").to_pandas()
    sims = dict(zip(sig["doc"], sig["sim"].astype(np.uint64)))
    want = set()
    for a, b in itertools.combinations(sorted(sims), 2):
        d = int(bin(int(sims[a]) ^ int(sims[b])).count("1"))
        if d <= 6:
            want.add((a, b, d))
    assert got_set == want
    assert want  # planted dups must actually pair


def _ref_kcore(edges, k):
    """Sequential peeling reference: repeatedly drop under-k nodes."""
    e = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    while True:
        deg = {}
        for u, v in e:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
        ne = {(u, v) for u, v in e if u in alive and v in alive}
        if ne == e:
            # fixpoint: every remaining endpoint has degree >= k
            return deg
        e = ne


@pytest.mark.usefixtures("ray_session")
def test_k_core_deep_peel():
    """A 6-cycle with a 10-node tail: the 2-core is exactly the cycle,
    reached only after the tail peels one node per round (~10 rounds)
    — exercises the fixpoint loop far past the TPC-H graphs' 1-2."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.graph import k_core

    cfg = EngineConfig(broadcast_max_rows=0)  # force the shuffle path
    cyc = [(f"c{i}", f"c{(i + 1) % 6}") for i in range(6)]
    tail = [("c0", "t0")] + [(f"t{i}", f"t{i + 1}") for i in range(9)]
    edges = pd.DataFrame(cyc + tail, columns=["a", "b"])
    res = k_core(rd.from_pandas(edges).repartition(5), k=2,
                 cfg=cfg).to_pandas().set_index("node")["deg"]
    assert sorted(res.index) == [f"c{i}" for i in range(6)]
    assert (res == 2).all()

    # k above the max degree: empty core
    empty = k_core(rd.from_pandas(edges), k=9, cfg=cfg).to_pandas()
    assert len(empty) == 0

    with pytest.raises(ValueError):
        k_core(rd.from_pandas(edges), k=0, cfg=cfg)


@pytest.mark.usefixtures("ray_session")
def test_k_core_matches_reference_random():
    """Random sparse graph vs the sequential peeling reference, and
    layout invariance across repartitions."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.graph import k_core

    rng = np.random.RandomState(7)
    e = rng.randint(0, 60, size=(400, 2))
    edges = pd.DataFrame({"a": [f"n{x}" for x in e[:, 0]],
                          "b": [f"n{x}" for x in e[:, 1]]})
    want = _ref_kcore(list(zip(edges["a"], edges["b"])), 4)
    res = k_core(rd.from_pandas(edges).repartition(7), k=4) \
        .to_pandas().set_index("node")["deg"].to_dict()
    assert res == want
    res2 = k_core(rd.from_pandas(edges).repartition(23), k=4) \
        .to_pandas().set_index("node")["deg"].to_dict()
    assert res2 == want


@pytest.mark.usefixtures("ray_session")
def test_bfs_hops_matches_bruteforce():
    """Random graph vs a sequential BFS; seeds outside the edge table
    stay at hop 0; layout invariance across repartitions."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.graph import bfs_hops

    rng = np.random.RandomState(11)
    e = rng.randint(0, 40, size=(120, 2))
    edges = pd.DataFrame({"a": [f"n{x}" for x in e[:, 0]],
                          "b": [f"n{x}" for x in e[:, 1]]})
    seeds = pd.DataFrame({"node": ["n0", "n7", "zzz_isolated"]})

    adj = {}
    for u, v in zip(edges["a"], edges["b"]):
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    want, frontier = {s: 0 for s in seeds["node"]}, set(seeds["node"])
    for h in range(1, 4):
        nxt = {w for u in frontier for w in adj.get(u, ())} - set(want)
        for w in nxt:
            want[w] = h
        frontier = nxt

    for nparts in (3, 17):
        res = bfs_hops(rd.from_pandas(edges).repartition(nparts),
                       rd.from_pandas(seeds), max_hops=3) \
            .to_pandas().set_index("node")["hop"].to_dict()
        assert res == want
    # max_hops=0 -> seeds only
    res0 = bfs_hops(rd.from_pandas(edges), rd.from_pandas(seeds),
                    max_hops=0).to_pandas()
    assert set(res0["node"]) == set(seeds["node"])
    assert (res0["hop"] == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_adamic_adar_matches_bruteforce():
    """Random graph vs a sequential AA with the identical integer
    weight table; high-degree centers dropped by the cap on BOTH
    sides; layout invariance."""
    import math

    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.graph import adamic_adar

    rng = np.random.RandomState(5)
    e = rng.randint(0, 30, size=(150, 2))
    edges = pd.DataFrame({"a": [f"n{x}" for x in e[:, 0]],
                          "b": [f"n{x}" for x in e[:, 1]]})
    max_degree, scale = 9, 10 ** 9

    adj = {}
    for u, v in zip(edges["a"], edges["b"]):
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    want = {}
    for z, nb in adj.items():
        d = len(nb)
        if d < 2 or d > max_degree:
            continue
        w = int(math.floor(scale / math.log(d)))
        nbs = sorted(nb)
        for i in range(len(nbs)):
            for j in range(i + 1, len(nbs)):
                k = (nbs[i], nbs[j])
                want[k] = want.get(k, 0) + w

    for nparts in (4, 13):
        res = adamic_adar(rd.from_pandas(edges).repartition(nparts),
                          max_degree=max_degree).to_pandas()
        got = {(u, v): s for u, v, s in
               zip(res["u"], res["v"], res["aa_score"])}
        assert got == want


def test_label_propagation_matches_reference():
    """Synchronous LPA vs a sequential replay of the same recurrence:
    two cliques joined by one bridge edge, plus a pendant chain; 3
    rounds, modal neighbor label, ties to the smallest label."""
    import random

    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.graph import label_propagation
    from aml_entity_resolution_assignment_ray.util import tune_context

    tune_context(nparts=4)
    rng = random.Random(7)
    clique_a = [f"a{i}" for i in range(5)]
    clique_b = [f"b{i}" for i in range(4)]
    edges = [(u, v) for i, u in enumerate(clique_a)
             for v in clique_a[i + 1:]]
    edges += [(u, v) for i, u in enumerate(clique_b)
              for v in clique_b[i + 1:]]
    edges += [("a0", "b0"), ("b3", "p0"), ("p0", "p1"), ("p1", "p2")]
    rng.shuffle(edges)
    # duplicates and reversed duplicates must fold away
    edges += [("a1", "a0"), ("b0", "b1")]

    df = pd.DataFrame(edges, columns=["src", "dst"])
    got = label_propagation(
        rd.from_pandas(df).repartition(3), iterations=3,
        cfg=EngineConfig(model_path="", join_num_partitions=4)) \
        .to_pandas().set_index("node")["label"].to_dict()

    # sequential reference
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    label = {v: v for v in adj}
    for _ in range(3):
        nxt = {}
        for v, nbrs in adj.items():
            cnt = {}
            for w in nbrs:
                cnt[label[w]] = cnt.get(label[w], 0) + 1
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            nxt[v] = best
        label = nxt
    assert got == label
    # the two cliques actually converged to distinct community labels
    assert len({label[v] for v in clique_a}) == 1
    assert len({label[v] for v in clique_b[:3]}) == 1


def test_label_propagation_random_graphs():
    """Random-graph sweep: synchronous LPA equals the sequential
    reference for several densities, iteration counts and layouts."""
    import random

    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.graph import label_propagation
    from aml_entity_resolution_assignment_ray.util import tune_context

    tune_context(nparts=4)
    for seed, n, p, iters in [(1, 20, 0.15, 2), (2, 30, 0.08, 3),
                              (3, 15, 0.3, 4)]:
        rng = random.Random(seed)
        nodes = [f"n{i:02d}" for i in range(n)]
        edges = [(a, b) for i, a in enumerate(nodes)
                 for b in nodes[i + 1:] if rng.random() < p]
        if not edges:
            continue
        df = pd.DataFrame(edges, columns=["src", "dst"])
        got = label_propagation(
            rd.from_pandas(df).repartition(3), iterations=iters,
            cfg=EngineConfig(model_path="", join_num_partitions=4)) \
            .to_pandas().set_index("node")["label"].to_dict()
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        label = {v: v for v in adj}
        for _ in range(iters):
            nxt = {}
            for v, nbrs in adj.items():
                cnt = {}
                for w in nbrs:
                    cnt[label[w]] = cnt.get(label[w], 0) + 1
                nxt[v] = sorted(cnt.items(),
                                key=lambda kv: (-kv[1], kv[0]))[0][0]
            label = nxt
        assert got == label, seed
