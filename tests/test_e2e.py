"""End-to-end flagship pipeline test: the BASELINE F1 criterion.

Runs the full Ray Data pipeline (assemble -> block -> pairs -> hydrate ->
score -> cluster -> evaluate) on the seeded synthetic transcript corpus
and asserts the north-rule quality bar: pairwise F1 >= 0.99 on labeled
candidate pairs (pairs sharing a blocking key) and on cluster pairs,
mirroring the reference's published ~100% precision / ~99% recall
(reference README.MD:84).
"""

import pytest

from aml_entity_resolution_assignment_ray.config import EngineConfig
from aml_entity_resolution_assignment_ray.pipelines.flagship import run_flagship
from aml_entity_resolution_assignment_ray.sources.synth import generate_corpus


@pytest.fixture(scope="module")
def flagship_result(ray_session):
    import ray.data as rd

    transcripts, truth, _ = generate_corpus(
        n_entities=400, seed=43, doppelganger_rate=0.0)
    cfg = EngineConfig()  # default packaged model
    res = run_flagship(
        rd.from_arrow(transcripts), cfg, truth=rd.from_arrow(truth),
        with_stats=True)
    return res


def test_pair_level_f1(flagship_result):
    pe = flagship_result["pair_eval"]
    assert pe["precision"] >= 0.99, pe
    assert pe["f1"] >= 0.99, pe


def test_cluster_level_f1(flagship_result):
    ce = flagship_result["cluster_eval"]
    assert ce["precision"] >= 0.99, ce
    assert ce["recall"] >= 0.98, ce
    assert ce["f1"] >= 0.99, ce


def test_blocking_health(flagship_result):
    bs = flagship_result["blocking_stats"]
    # candidate generation must prune the quadratic space hard
    # (reference matching.py:44-47 targets >99.9% at scale; at 1k records
    # the blocks are proportionally larger)
    assert bs["reduction_ratio"] > 0.99, bs
    assert bs["oversized_blocks"] == 0, bs


def test_match_counts_sane(flagship_result):
    cls = flagship_result["classified"]
    n = cls.count()
    assert n > 0
    matched = cls.filter(expr="is_match == 1").count()
    assert 0 < matched < n


def test_doppelganger_rule3_inherent():
    """A clean doppelganger pair (same name + dob, different ids/contacts)
    fires the reference's own Rule 3 (matching.py:443-446) — the F1 drop
    at doppelganger_rate>0 (BASELINE.md) is rule-inherent, not an engine
    deviation."""
    import pandas as pd

    from aml_entity_resolution_assignment_ray.stages.score import (
        decide_match_status_batch,
    )

    f = pd.DataFrame([{
        "nid_score": 0.0, "nid_both_present": 1, "email_score": 0.4,
        "phone_match": 0, "first_name_score": 1.0, "last_name_score": 1.0,
        "addr_score": 0.2, "dob_match": 1, "dob_both_present": 1,
        "year_match": 1, "ml_prob": 0.0,
    }])
    out = decide_match_status_batch(f)
    assert out["match_type"][0] == "match"
    assert "Rule 3" in out["explanation"][0]
