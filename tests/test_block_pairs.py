"""Blocking keys + candidate-pair generation vs a naive in-memory oracle
(the reference's LSH-query + SQL-UNION candidate semantics,
matching.py:121-177)."""

import itertools

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from aml_entity_resolution_assignment_ray.config import EngineConfig
from aml_entity_resolution_assignment_ray.functions import minhash as mh
from aml_entity_resolution_assignment_ray.stages.assemble import assemble_profiles
from aml_entity_resolution_assignment_ray.stages.block import (
    KeyEmitter,
    blocking_stats,
    emit_keys,
    key_coverage,
    normalize_batch,
    normalize_profiles,
)
from aml_entity_resolution_assignment_ray.stages.pairs import generate_pairs


@pytest.fixture(scope="module")
def pipeline(ray_session, small_corpus):
    ds = rd.from_arrow(small_corpus["transcripts"]).repartition(7)
    profiles = assemble_profiles(ds)
    norm = normalize_profiles(profiles).materialize()
    keys = emit_keys(norm).materialize()
    pairs = generate_pairs(keys).to_pandas()
    return {"norm": norm.to_pandas(), "keys": keys.to_pandas(), "pairs": pairs,
            "keys_ds": keys, "norm_ds": norm}


def _oracle_pairs(norm_df: pd.DataFrame) -> set:
    """Naive candidate generation over the normalized profiles."""
    out = set()
    # exact keys (matching.py:141-167 UNION self-joins)
    df = norm_df.copy()
    df["bk_nid"] = df["norm_nid"].where(df["norm_nid"].str.len() > 4)
    df["bk_phone"] = df["norm_phone"].str.slice(-6).where(df["norm_phone"].str.len() >= 6)
    df["bk_email"] = df["norm_email"].where(df["norm_email"].str.len() > 0)
    ok = (df["norm_first_name"].str.len() > 0) & (df["norm_last_name"].str.len() > 0) \
        & df["norm_dob"].notna() & (df["norm_dob"].fillna("").str.len() > 0)
    df["bk_initial_dob"] = (
        df["norm_first_name"].str.slice(0, 1) + "|" + df["norm_last_name"] + "|" + df["norm_dob"].fillna("")
    ).where(ok)
    for bk in ["bk_nid", "bk_phone", "bk_email", "bk_initial_dob"]:
        for _, grp in df[df[bk].notna()].groupby(bk):
            ids = sorted(grp["conv_id"])
            for a, b in itertools.combinations(ids, 2):
                out.add((a, b))
    # minhash bands (the banded equivalent of lsh.query, matching.py:121-133)
    name = (df["norm_first_name"].fillna("") + " " + df["norm_last_name"].fillna("")).str.strip()
    has = name.str.len() > 0
    sigs = mh.minhash_batch(name[has].tolist(), 128)
    b, r = mh.optimal_param(0.7, 128)
    bkeys = mh.band_keys(sigs, b, r)
    ids = df.loc[has, "conv_id"].to_numpy()
    for band in range(b):
        bucket = {}
        for i, k in enumerate(bkeys[:, band]):
            bucket.setdefault(int(k), []).append(ids[i])
        for members in bucket.values():
            for a, c in itertools.combinations(sorted(members), 2):
                out.add((a, c))
    return out


def test_pairs_match_oracle(pipeline):
    got = set(zip(pipeline["pairs"]["id_a"], pipeline["pairs"]["id_b"]))
    expected = _oracle_pairs(pipeline["norm"])
    assert got == expected, (
        f"missing={list(expected - got)[:5]} extra={list(got - expected)[:5]}"
    )


def test_pairs_canonical_and_distinct(pipeline):
    p = pipeline["pairs"]
    assert (p["id_a"] < p["id_b"]).all()
    assert not p.duplicated(["id_a", "id_b"]).any()


def test_block_cap_purges_oversized(ray_session):
    """With salting OFF, groups above max_block_records emit no pairs
    (skew purge); the default (salt_pairs ON) keeps them — see
    test_skew.test_hot_key_salted_by_default."""
    rows = [{"conv_id": f"c{i:03d}", "key_type": "nid", "key_value": "HOT"}
            for i in range(50)]
    rows += [{"conv_id": "a1", "key_type": "nid", "key_value": "ok"},
             {"conv_id": "a2", "key_type": "nid", "key_value": "ok"}]
    keys = rd.from_items(rows)
    cfg = EngineConfig(max_block_records=10, salt_pairs=False)
    pairs = generate_pairs(keys, cfg).to_pandas()
    assert len(pairs) == 1
    assert pairs.iloc[0].tolist() == ["a1", "a2"]
    # default config: the hot group now emits all its pairs instead
    dflt = generate_pairs(keys, EngineConfig()).to_pandas()
    assert len(dflt) == 50 * 49 // 2 + 1


def test_recall_of_true_entity_pairs(pipeline, small_corpus):
    """Most same-entity conversation pairs must co-block (the blocking
    recall that bounds end-to-end recall; reference README claims ~99%)."""
    truth = small_corpus["truth"].to_pandas()
    by_entity = truth.groupby("entity_id")["conv_id"].apply(list)
    true_pairs = set()
    for ids in by_entity:
        for a, b in itertools.combinations(sorted(ids), 2):
            true_pairs.add((a, b))
    got = set(zip(pipeline["pairs"]["id_a"], pipeline["pairs"]["id_b"]))
    found = len(true_pairs & got)
    assert found / len(true_pairs) > 0.95, f"{found}/{len(true_pairs)}"


def test_key_coverage_and_stats(pipeline):
    cov = key_coverage(pipeline["norm_ds"])
    assert set(cov.columns) == {"key_count", "count()"}
    n = int(cov["count()"].sum())
    stats = blocking_stats(pipeline["keys_ds"], n, len(pipeline["pairs"]))
    assert 0 < stats["reduction_ratio"] <= 1
    assert stats["candidate_pairs"] == len(pipeline["pairs"])
    assert len(stats["top_blocks"]) >= 3


def test_gather_path_equals_shuffle_path(ray_session):
    """The size-gated single-task gather path must produce exactly the
    two-hash-shuffle path's distinct pair set (same keys, same cap)."""
    rng = np.random.RandomState(11)
    rows = [{"conv_id": f"c{i:04d}",
             "key_type": "t",
             "key_value": f"k{rng.randint(0, 300)}"}
            for i in range(2000)]
    keys = rd.from_items(rows)
    cfg = EngineConfig(max_block_records=50)
    shuffled = generate_pairs(keys, cfg).to_pandas()          # n_rows unknown
    gathered = generate_pairs(keys, cfg, n_rows=2000).to_pandas()
    assert cfg.gather_max_keys >= 2000
    s = set(zip(shuffled["id_a"], shuffled["id_b"]))
    g = set(zip(gathered["id_a"], gathered["id_b"]))
    assert s == g and len(gathered) == len(g)


def test_gather_gate_disabled_by_zero(ray_session):
    rows = [{"conv_id": f"c{i}", "key_type": "t", "key_value": "x"}
            for i in range(4)]
    keys = rd.from_items(rows)
    cfg = EngineConfig(max_block_records=100, gather_max_keys=0)
    pairs = generate_pairs(keys, cfg, n_rows=4).to_pandas()
    assert len(pairs) == 6


def test_gather_gate_refused_by_emission_estimate(ray_session):
    """A quadratic emitter (few huge groups) must be routed to the
    shuffle path by est_pairs even when the ROW count passes the gate —
    and the result must be identical either way (the 500k-doc semdedup
    regression: 64M pairs ground through one gathered task)."""
    rows = [{"conv_id": f"c{i:04d}", "key_type": "t",
             "key_value": f"k{i % 4}"} for i in range(400)]
    keys = rd.from_items(rows)
    cfg = EngineConfig(max_block_records=500, gather_max_pairs=1000)
    est = 400 * 100 // 2  # 20k > the 1000 gate -> must shuffle
    shuffled = generate_pairs(keys, cfg, n_rows=400,
                              est_pairs=est).to_pandas()
    gathered = generate_pairs(keys, cfg, n_rows=400).to_pandas()
    assert (set(zip(shuffled["id_a"], shuffled["id_b"]))
            == set(zip(gathered["id_a"], gathered["id_b"])))
    assert len(shuffled) == len(set(zip(shuffled["id_a"],
                                        shuffled["id_b"])))
