"""Distributed union-find + pairwise evaluation tests."""

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from aml_entity_resolution_assignment_ray.config import EngineConfig
from aml_entity_resolution_assignment_ray.stages.cluster import (
    connected_components,
    resolve_entities,
)
from aml_entity_resolution_assignment_ray.stages.evaluate import (
    cluster_pairs,
    pairwise_eval,
)

CFG = EngineConfig(model_path="", join_num_partitions=4)
# cc_driver_max_edges=0 forces the distributed min-label-round path
CFG_DIST = EngineConfig(model_path="", join_num_partitions=4,
                        cc_driver_max_edges=0)


def _py_components(nodes, edges):
    """Driver union-find oracle (what networkx would compute)."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


@pytest.mark.parametrize("cfg", [CFG, CFG_DIST], ids=["driver", "distributed"])
def test_connected_components_random_graph(ray_session, cfg):
    import ray.data as rd

    rng = random.Random(0)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = []
    # a few chains and cliques + isolated nodes
    for _ in range(60):
        a, b = rng.sample(nodes[:80], 2)
        edges.append((min(a, b), max(a, b)))
    expected = _py_components(nodes, edges)

    nodes_ds = rd.from_arrow(pa.table({"conv_id": nodes}))
    edges_ds = rd.from_arrow(pa.table({
        "id_a": [e[0] for e in edges], "id_b": [e[1] for e in edges]}))
    labels = connected_components(edges_ds, nodes_ds, cfg).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert got == expected


def test_connected_components_distributed_large(ray_session):
    """Forced-distributed min-label rounds on a 10k-node / 15k-edge
    random graph (well above any driver gate): exercises the vectorized
    checksum + label-apply helpers on node-scale data and must agree
    with the driver DSU oracle exactly."""
    import ray.data as rd

    rng = np.random.RandomState(7)
    n = 10_000
    nodes = [f"n{i:05d}" for i in range(n)]
    # edges clustered into ~500-node neighborhoods -> small diameters,
    # many components, plus ~2k isolated nodes
    a = rng.randint(0, 8_000, size=15_000)
    b = a + rng.randint(1, 40, size=15_000)
    edges = sorted({(nodes[x], nodes[min(y, n - 1)]) for x, y in zip(a, b)})
    expected = _py_components(nodes, edges)

    nodes_ds = rd.from_arrow(pa.table({"conv_id": nodes}))
    edges_ds = rd.from_arrow(pa.table({
        "id_a": [e[0] for e in edges], "id_b": [e[1] for e in edges]}))
    labels = connected_components(edges_ds, nodes_ds, CFG_DIST).to_pandas()
    assert len(labels) == n
    got = dict(zip(labels["node"], labels["label"]))
    assert got == expected


def test_resolve_entities_singletons(ray_session):
    """Nodes with no match edges keep their own cluster
    (reference matching.py:580 adds ALL record ids as nodes)."""
    import ray.data as rd

    classified = rd.from_arrow(pa.table({
        "id_a": ["a"], "id_b": ["b"], "is_match": [1]}))
    all_nodes = rd.from_arrow(pa.table({"conv_id": ["a", "b", "c", "d"]}))
    pred = resolve_entities(classified, all_nodes, CFG).to_pandas()
    m = dict(zip(pred["conv_id"], pred["predicted_entity_id"]))
    assert len(pred) == 4
    assert m["a"] == m["b"]
    assert len({m["a"], m["c"], m["d"]}) == 3


def test_pairwise_eval_hand_case(ray_session):
    """truth: {a,b,c}, {d}; pred: {a,b}, {c,d} ->
    true pairs {ab,ac,bc}, pred pairs {ab,cd}: TP=1 FP=1 FN=2."""
    import ray.data as rd

    truth = rd.from_arrow(pa.table({
        "conv_id": ["a", "b", "c", "d"],
        "entity_id": ["E1", "E1", "E1", "E2"]}))
    pred = rd.from_arrow(pa.table({
        "conv_id": ["a", "b", "c", "d"],
        "predicted_entity_id": ["P1", "P1", "P2", "P2"]}))
    ev = pairwise_eval(pred, truth, cfg=CFG)
    assert (ev["tp"], ev["fp"], ev["fn"]) == (1, 1, 2)
    assert ev["precision"] == pytest.approx(0.5)
    assert ev["recall"] == pytest.approx(1 / 3)


def test_cluster_pairs_emission(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "conv_id": ["a", "b", "c", "x", "y", "solo"],
        "entity_id": ["E1", "E1", "E1", "E2", "E2", "E3"]}))
    pairs = cluster_pairs(ds, "entity_id", cfg=CFG).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert got == {("a", "b"), ("a", "c"), ("b", "c"), ("x", "y")}
    assert (pairs["id_a"] < pairs["id_b"]).all()
