"""Unit + property tests for the vectorized similarity kernels.

DuckDB ships reference implementations of jaro_winkler_similarity /
levenshtein / damerau_levenshtein with the same conventions as the
jellyfish functions the reference engine calls (empty -> 0.0, winkler
boost above 0.7, unrestricted DL), so it serves as the oracle here.
"""

import random

import duckdb
import numpy as np
import pytest

from aml_entity_resolution_assignment_ray.functions.strsim import (
    damerau_levenshtein_batch,
    jaro_winkler_batch,
    levenshtein_batch,
    osa_batch,
)


def test_hand_checked_values():
    # classic textbook pairs
    assert abs(jaro_winkler_batch(["martha"], ["marhta"])[0] - 0.9611111111111111) < 1e-12
    assert levenshtein_batch(["kitten"], ["sitting"])[0] == 3
    # transposition counts as one edit (reference matching.py:329-343: "81" -> "18")
    assert damerau_levenshtein_batch(["81"], ["18"])[0] == 1
    assert osa_batch(["81"], ["18"])[0] == 1
    # unrestricted vs OSA divergence case
    assert damerau_levenshtein_batch(["ca"], ["abc"])[0] == 2
    assert osa_batch(["ca"], ["abc"])[0] == 3


def test_empty_string_conventions():
    # jellyfish/DuckDB: either side empty -> jw 0.0 (SURVEY §2.6: empty emails score 0)
    jw = jaro_winkler_batch(["", "a", ""], ["", "", "b"])
    assert (jw == 0.0).all()
    assert levenshtein_batch([""], ["abc"])[0] == 3
    assert damerau_levenshtein_batch(["abc"], [""])[0] == 3


@pytest.mark.parametrize("alphabet", ["abcdefgxyz ", "ab", "0123456789-"])
def test_matches_duckdb_oracle(alphabet):
    rng = random.Random(hash(alphabet) & 0xFFFF)
    pairs = []
    for _ in range(300):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14)))
        pairs.append((a, b))
    A = [p[0] for p in pairs]
    B = [p[1] for p in pairs]
    jw = jaro_winkler_batch(A, B)
    lev = levenshtein_batch(A, B)
    dl = damerau_levenshtein_batch(A, B)
    con = duckdb.connect()
    for i, (a, b) in enumerate(pairs):
        djw, dlev, ddl = con.execute(
            "select jaro_winkler_similarity(?,?), levenshtein(?,?), damerau_levenshtein(?,?)",
            [a, b, a, b, a, b],
        ).fetchone()
        assert abs(jw[i] - djw) < 1e-9, (a, b, jw[i], djw)
        assert lev[i] == dlev, (a, b)
        assert dl[i] == ddl, (a, b)


def test_unicode_pairs():
    jw = jaro_winkler_batch(["żółć"], ["żółć"])
    assert jw[0] == 1.0
    assert levenshtein_batch(["żółć"], ["zolc"])[0] == 4  # every code point differs
    assert levenshtein_batch(["żółć"], ["żolć"])[0] == 2


def test_batch_shapes_and_determinism():
    a = ["alpha", "beta", "gamma"] * 10
    b = ["alpah", "betta", "gamma"] * 10
    r1 = jaro_winkler_batch(a, b)
    r2 = jaro_winkler_batch(a, b)
    assert np.array_equal(r1, r2)
    assert r1.shape == (30,)
