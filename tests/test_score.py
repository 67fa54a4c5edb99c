"""Scoring-stage tests: feature semantics + rule-cascade fidelity.

The cascade oracle below is a deliberately naive, scalar re-statement of
the reference's decision procedure (matching.py:408-531) used ONLY as a
test oracle for the vectorized implementation.
"""

import numpy as np
import pandas as pd
import pytest

from aml_entity_resolution_assignment_ray.stages.score import (
    FEATURE_OUTPUT_COLS,
    compute_pair_features,
    decide_match_status_batch,
)


def oracle_decide(r: dict):
    """Scalar oracle for one feature row -> (match_type, score)."""
    avg = (r["first_name_score"] + r["last_name_score"]) / 2
    ml = r["ml_prob"]
    fired = []
    if r["nid_score"] >= 0.90 and avg > 0.85:
        fired.append(0.95)
    if ((r["email_score"] > 0.95 or r["phone_match"] == 1) and avg > 0.80
            and (r["dob_match"] == 1 or r["nid_score"] > 0.5 or r["year_match"] == 1)):
        fired.append(0.90)
    if avg > 0.85 and r["dob_match"] == 1:
        fired.append(0.85)
    if avg > 0.90 and r["addr_score"] > 0.8:
        fired.append(0.85)
    if ml > 0.8:
        fired.append(ml)
    if avg > 0.75 and r["year_match"] == 1 and r["nid_score"] > 0.8:
        fired.append(0.95)
    if fired:
        return "match", max([ml] + fired)
    score = ml
    is_review = False
    if avg > 0.93 and r["year_match"] == 1:
        is_review, score = True, max(score, 0.75)
    if ml > 0.2:
        is_review = True
    if r["nid_score"] >= 0.85:
        is_review, score = True, max(score, 0.60)
    if avg > 0.9:
        is_review, score = True, max(score, 0.50)
    if r["email_score"] == 1.0:
        is_review, score = True, max(score, 0.55)
    if is_review:
        if ml < 0.10 and r["nid_score"] < 0.9 and r["email_score"] < 0.9:
            return "no_match", ml  # veto
        return "review", score
    return "no_match", ml


def random_features(n, seed):
    rng = np.random.RandomState(seed)
    # mix continuous draws with exact boundary values the cascade tests
    def scores(edge_vals):
        cont = rng.rand(n)
        pick = rng.rand(n) < 0.4
        edges = rng.choice(edge_vals, size=n)
        return np.where(pick, edges, cont)

    return pd.DataFrame({
        "id_a": [f"a{i}" for i in range(n)],
        "id_b": [f"b{i}" for i in range(n)],
        "nid_score": scores([0.5, 0.8, 0.85, 0.9, 1.0]),
        "nid_both_present": rng.randint(0, 2, n),
        "email_score": scores([0.9, 0.95, 1.0]),
        "phone_match": rng.randint(0, 2, n),
        "first_name_score": scores([0.75, 0.8, 0.85, 0.9, 0.93, 1.0]),
        "last_name_score": scores([0.75, 0.8, 0.85, 0.9, 0.93, 1.0]),
        "addr_score": scores([0.8, 1.0]),
        "dob_match": rng.randint(0, 2, n),
        "dob_both_present": rng.randint(0, 2, n),
        "year_match": rng.randint(0, 2, n),
        "ml_prob": scores([0.0, 0.1, 0.2, 0.8]),
    })


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cascade_matches_oracle(seed):
    f = random_features(3000, seed)
    out = decide_match_status_batch(f)
    for i in range(len(f)):
        row = f.iloc[i].to_dict()
        exp_type, exp_score = oracle_decide(row)
        assert out["match_type"].iloc[i] == exp_type, (i, row)
        assert out["confidence_score"].iloc[i] == pytest.approx(exp_score), (i, row)
    assert (out["is_match"] == (out["match_type"] == "match").astype(int)).all()


def test_cascade_explanations():
    f = pd.DataFrame([
        # Rule 1 + Rule 3 both fire
        dict(id_a="a", id_b="b", nid_score=0.95, nid_both_present=1,
             email_score=0.0, phone_match=0, first_name_score=1.0,
             last_name_score=1.0, addr_score=0.0, dob_match=1,
             dob_both_present=1, year_match=1, ml_prob=0.0),
        # nothing fires
        dict(id_a="c", id_b="d", nid_score=0.0, nid_both_present=0,
             email_score=0.0, phone_match=0, first_name_score=0.1,
             last_name_score=0.1, addr_score=0.0, dob_match=0,
             dob_both_present=0, year_match=0, ml_prob=0.0),
        # review then vetoed
        dict(id_a="e", id_b="f", nid_score=0.86, nid_both_present=1,
             email_score=0.0, phone_match=0, first_name_score=0.2,
             last_name_score=0.2, addr_score=0.0, dob_match=0,
             dob_both_present=0, year_match=0, ml_prob=0.01),
    ])
    out = decide_match_status_batch(f)
    assert out["explanation"][0].startswith("Rule 1: Strong National ID & Name Match")
    assert "Rule 3" in out["explanation"][0]
    assert out["explanation"][1] == "No strong matching signals found"
    assert out["match_type"][2] == "no_match"
    assert "Model Veto" in out["explanation"][2]
    assert out["confidence_score"][2] == pytest.approx(0.01)


def _pairs_frame(rows):
    cols = ["norm_nid", "norm_email", "norm_phone", "norm_first_name",
            "norm_last_name", "norm_address", "norm_dob", "norm_dob_year"]
    data = {"id_a": [r[0] for r in rows], "id_b": [r[1] for r in rows]}
    for ci, c in enumerate(cols):
        data[f"{c}_a"] = [r[2][ci] for r in rows]
        data[f"{c}_b"] = [r[3][ci] for r in rows]
    return pd.DataFrame(data)


def test_feature_semantics():
    a = ("ABC123", "john.doe@x.com", "555123", "john", "doe",
         "1 oak street", "1980-01-02", "1980")
    b_same = a
    b_nid_swap = ("ABC132", "john.doe@x.com", "555123", "john", "doe",
                  "1 oak street", "1980-01-02", "1980")
    b_empty = ("", "", "", "", "", "", None, "0000")
    f = compute_pair_features(_pairs_frame([
        ("p", "q", a, b_same),
        ("p", "r", a, b_nid_swap),
        ("p", "s", a, b_empty),
    ]))
    # identical -> all maxed
    assert f["nid_score"][0] == 1.0 and f["nid_both_present"][0] == 1
    assert f["email_score"][0] == 1.0 and f["phone_match"][0] == 1
    assert f["dob_match"][0] == 1 and f["year_match"][0] == 1
    assert f["addr_score"][0] == 1.0
    # adjacent transposition = 1 Damerau edit over len 6
    assert f["nid_score"][1] == pytest.approx(1 - 1 / 6)
    # one side empty -> zeros (matching.py:268-270, 287-288, 291-293)
    assert f["nid_score"][2] == 0.0 and f["nid_both_present"][2] == 0
    assert f["email_score"][2] == 0.0 and f["phone_match"][2] == 0
    assert f["addr_score"][2] == 0.0 and f["dob_match"][2] == 0
    assert f["year_match"][2] == 0


def test_name_cosine_feature():
    """Embedding-cosine feature (north-star scorer: JW/Lev + embedding
    cosine): 1.0 for identical names, high for a 1-typo name, low for
    unrelated names, 0.0 when a side is empty; matches a scalar
    shingle-set feature-hash oracle."""
    import numpy as np

    from aml_entity_resolution_assignment_ray.functions.embed import (
        DEFAULT_DIM, cosine_pairs_batch, hashed_embedding_batch)
    from aml_entity_resolution_assignment_ray.functions.minhash import shingle_hashes

    a = ["anna kowalska", "anna kowalska", "", "jan nowak", "maria garcia"]
    b = ["anna kowalska", "anna kowalsk",  "anna", "zzzz qqqq", "maria garcia lopez"]
    cos = cosine_pairs_batch(a, b)
    assert cos[0] == pytest.approx(1.0)
    assert cos[1] > 0.8
    assert cos[2] == 0.0
    assert cos[3] < 0.3
    assert 0.5 < cos[4] < 1.0

    # scalar oracle: per-string feature hashing from raw shingle hashes
    def scalar_embed(s):
        v = np.zeros(DEFAULT_DIM)
        for h in shingle_hashes(s):
            sign = 1.0 if int(h) & 1 else -1.0
            v[(int(h) >> 1) % DEFAULT_DIM] += sign
        n = np.linalg.norm(v)
        return v / n if n else v

    batch = hashed_embedding_batch(a)
    for i, s in enumerate(a):
        assert np.allclose(batch[i], scalar_embed(s), atol=1e-6)


def test_name_cosine_in_scored_output():
    """compute_pair_features emits name_cosine alongside the reference's
    features and the cascade decisions are untouched by it."""
    import pandas as pd

    df = pd.DataFrame({
        "id_a": ["a"], "id_b": ["b"],
        "norm_first_name_a": ["anna"], "norm_first_name_b": ["anna"],
        "norm_last_name_a": ["kowalska"], "norm_last_name_b": ["kowalska"],
        "norm_nid_a": [""], "norm_nid_b": [""],
        "norm_email_a": [""], "norm_email_b": [""],
        "norm_phone_a": [""], "norm_phone_b": [""],
        "norm_address_a": [""], "norm_address_b": [""],
        "norm_dob_a": [""], "norm_dob_b": [""],
        "norm_dob_year_a": [""], "norm_dob_year_b": [""],
    })
    feats = compute_pair_features(df)
    assert feats["name_cosine"].iloc[0] == pytest.approx(1.0)
    assert set(FEATURE_OUTPUT_COLS) <= set(feats.columns)
