"""MinHash / LSH banding kernels: determinism, estimate accuracy, and the
banding recall property (candidates ⊇ pairs with Jaccard ≥ threshold,
SURVEY §7.4 'LSH parity')."""

import itertools
import random

import numpy as np

from aml_entity_resolution_assignment_ray.functions import minhash as mh


def true_jaccard(a: str, b: str) -> float:
    A = set(mh.shingle_hashes(a).tolist())
    B = set(mh.shingle_hashes(b).tolist())
    return len(A & B) / max(1, len(A | B))


def test_determinism_across_calls():
    texts = ["john smith", "maria garcia", "hans müller"]
    s1 = mh.minhash_batch(texts, 128)
    s2 = mh.minhash_batch(texts, 128)
    assert np.array_equal(s1, s2)


def test_signature_estimates_jaccard():
    rng = random.Random(3)
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    pairs = []
    for _ in range(60):
        cut = rng.randint(10, len(base))
        a = base[:cut]
        b = base[rng.randint(0, 10):cut + rng.randint(0, 10)]
        pairs.append((a, b))
    sigs_a = mh.minhash_batch([p[0] for p in pairs], 256)
    sigs_b = mh.minhash_batch([p[1] for p in pairs], 256)
    est = (sigs_a == sigs_b).mean(axis=1)
    for i, (a, b) in enumerate(pairs):
        assert abs(est[i] - true_jaccard(a, b)) < 0.22


def test_optimal_param_is_valid():
    b, r = mh.optimal_param(0.7, 128)
    assert b * r <= 128
    assert b >= 1 and r >= 1
    # near the threshold the S-curve should be steep: collision probability
    # 1-(1-s^r)^b should be low well below and high well above threshold
    def p_collide(s):
        return 1 - (1 - s ** r) ** b
    assert p_collide(0.4) < 0.25
    assert p_collide(0.9) > 0.95


def test_banding_recall_property():
    """Pairs with true Jaccard >= threshold must collide in >=1 band with
    high probability — checked exhaustively over a noisy name corpus."""
    rng = random.Random(5)
    names = []
    for base in ["agnieszka maria kowalska nowakowska", "jonathan alexander richardson smith",
                 "maria fernanda lopez garcia perez", "wolfgang sebastian schneider weber"]:
        names.append(base)
        for _ in range(8):
            chars = list(base)
            if rng.random() < 0.3:  # exact duplicate
                names.append(base)
                continue
            idx = rng.randrange(len(chars))
            chars[idx] = rng.choice("abcdefghij")
            names.append("".join(chars))
    sigs = mh.minhash_batch(names, 128)
    b, r = mh.optimal_param(0.7, 128)
    keys = mh.band_keys(sigs, b, r)
    missed = total = 0
    for i, j in itertools.combinations(range(len(names)), 2):
        tj = true_jaccard(names[i], names[j])
        if tj >= 0.75:  # comfortably above threshold
            total += 1
            if not (keys[i] == keys[j]).any():
                missed += 1
    assert total > 20
    assert missed / total <= 0.05, f"banding missed {missed}/{total} similar pairs"


def test_band_keys_deterministic_and_shaped():
    sigs = mh.minhash_batch(["abcdef", "abcdeg"], 128)
    b, r = mh.optimal_param(0.7, 128)
    k1 = mh.band_keys(sigs, b, r)
    k2 = mh.band_keys(sigs, b, r)
    assert np.array_equal(k1, k2)
    assert k1.shape == (2, b)
