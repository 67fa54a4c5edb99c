"""Scale-contract tests for the dedup family:

* NO driver-side whole-dataset materialization: every dedup op runs to
  completion with ``Dataset.to_pandas`` forbidden (verify state travels
  as object-store block refs or hash joins, never a driver dict);
* broadcast and join verify strategies agree;
* simhash banding is lossless for ANY requested hamming distance;
* exact_dedup shuffles a fixed-width digest, not text;
* prefix-filter ngram Jaccard is exact vs a brute-force oracle;
* exact_cosine_pairs is exact vs a numpy oracle.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from aml_entity_resolution_assignment_ray.config import EngineConfig
from aml_entity_resolution_assignment_ray.functions import minhash as mh
from aml_entity_resolution_assignment_ray.ops import dedup

CFG = EngineConfig(model_path="", join_num_partitions=4)


def _corpus(n=60, seed=9):
    """Random word-salad docs with planted near-dup groups."""
    rng = np.random.RandomState(seed)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]
    texts = []
    for i in range(n):
        base = " ".join(rng.choice(words, size=12))
        texts.append(base)
        if i % 5 == 0:  # plant a near dup
            texts.append(base.replace("alpha", "omega", 1) + " x")
    return texts


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
    }))


@pytest.fixture
def no_to_pandas(monkeypatch):
    """Forbid Dataset.to_pandas inside the op under test."""
    import ray.data

    def boom(self, *a, **k):
        raise AssertionError("driver-side to_pandas() inside a dedup op")

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", boom)
    yield


def test_dedup_ops_no_driver_materialization(ray_session, no_to_pandas):
    texts = _corpus()
    # force the distributed CC path too (the driver-DSU path is a
    # documented small-graph optimization, not the scale path)
    cfg = EngineConfig(model_path="", join_num_partitions=4,
                       cc_driver_max_edges=0)
    assert dedup.minhash_lsh_dup_pairs(_docs_ds(texts), threshold=0.5,
                                       cfg=cfg).count() > 0
    assert dedup.minhash_dedup(_docs_ds(texts), threshold=0.5,
                               cfg=cfg).count() == len(texts)
    assert dedup.simhash_dup_pairs(_docs_ds(texts), max_hamming=6,
                                   cfg=cfg).count() > 0
    assert dedup.ngram_jaccard_pairs(_docs_ds(texts), threshold=0.6,
                                     cfg=cfg).count() > 0
    assert dedup.exact_dedup(_docs_ds(texts + [texts[0]]),
                             cfg=cfg).count() == len(texts)


def test_verify_join_strategy_agrees_with_broadcast(ray_session):
    texts = _corpus(40)
    ds = _docs_ds(texts)
    bc = EngineConfig(model_path="", join_num_partitions=4,
                      hydrate_strategy="broadcast")
    jn = EngineConfig(model_path="", join_num_partitions=4,
                      hydrate_strategy="join")
    for fn in (
        lambda cfg: dedup.minhash_lsh_dup_pairs(ds, threshold=0.5, cfg=cfg),
        lambda cfg: dedup.simhash_dup_pairs(ds, max_hamming=6, cfg=cfg),
        lambda cfg: dedup.ngram_jaccard_pairs(ds, threshold=0.6, cfg=cfg),
    ):
        a = fn(bc).to_pandas()[["id_a", "id_b"]]
        b = fn(jn).to_pandas()[["id_a", "id_b"]]
        key = lambda df: sorted(map(tuple, df.values.tolist()))
        assert key(a) == key(b)


def test_verify_prefilter_agrees(ray_session):
    """The referenced-payload prefilter (forced on with a zero-ish
    threshold) yields exactly the unfiltered result, on both hydration
    strategies and with the pair-id broadcast gate forced past (the
    skip branch)."""
    texts = _corpus(50)
    ds = _docs_ds(texts)
    base = dedup.minhash_lsh_dup_pairs(ds, threshold=0.5, cfg=CFG) \
        .to_pandas()[["id_a", "id_b"]]
    key = lambda df: sorted(map(tuple, df.values.tolist()))
    for kw in (
        {"verify_prefilter_min_docs": 1},
        {"verify_prefilter_min_docs": 1, "hydrate_strategy": "join"},
        {"verify_prefilter_min_docs": 1, "broadcast_max_rows": 0,
         "hydrate_strategy": "join"},          # id set > gate: skip branch
    ):
        cfg = EngineConfig(model_path="", join_num_partitions=4, **kw)
        got = dedup.minhash_lsh_dup_pairs(ds, threshold=0.5, cfg=cfg) \
            .to_pandas()[["id_a", "id_b"]]
        assert key(got) == key(base), kw


def test_simhash_banding_lossless_any_hamming(ray_session):
    """Pigeonhole recall: every pair within max_hamming=6 must surface
    (the old fixed 4x16 layout silently lost hamming 4-6 pairs)."""
    texts = _corpus(50, seed=3)
    ds = _docs_ds(texts)
    got = dedup.simhash_dup_pairs(ds, max_hamming=6, cfg=CFG).to_pandas()
    got_pairs = set(zip(got["id_a"].astype(int), got["id_b"].astype(int)))
    sims = dedup.simhash_batch(np.array(texts, dtype=object))
    want = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            x = np.array([sims[i] ^ sims[j]], dtype=np.uint64)
            if dedup._popcount64(x)[0] <= 6:
                want.add((i, j))
    assert want, "corpus must contain close simhash pairs"
    assert want <= got_pairs
    assert got_pairs == want  # verify step keeps exactly the close ones


def test_exact_dedup_digest_key_width(ray_session):
    """The shuffle key is a fixed-width uint64 digest (equal texts
    co-locate), never the document text; a forced digest collision is
    still separated by the per-block value groupby."""
    t = pd.util.hash_array(np.array(["hello", "hello", "world"], dtype=object))
    assert t.dtype == np.uint64
    assert t[0] == t[1] and t[0] != t[2]
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([3, 1, 2, 4], pa.int64()),
        "text": pa.array(["hello", "hello", "world", "hello"]),
    }))
    out = dedup.exact_dedup(ds, cfg=CFG).to_pandas()
    assert sorted(map(tuple, out[["text", "doc_id"]].values.tolist())) == \
        [("hello", 1), ("world", 2)]


def _brute_jaccard_pairs(texts, q, thr):
    grams = []
    for t in texts:
        t = t.lower()
        g = {t[i:i + q] for i in range(max(len(t) - q + 1, 0))} or {t}
        grams.append(g)
    out = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(grams[i] & grams[j])
            union = len(grams[i]) + len(grams[j]) - inter
            if union and inter / union >= thr:
                # engine canonicalizes id_a < id_b as STRINGS
                out.add(tuple(sorted((str(i), str(j)))))
    return out


def test_prefix_filter_ngram_exact(ray_session):
    """candidates='prefix' is LOSSLESS: output == brute-force all-pairs
    q-gram Jaccard (the LSH net is approximate; this path is the oracle
    the green correctness row rides on)."""
    texts = _corpus(45, seed=21)
    got = dedup.ngram_jaccard_pairs(_docs_ds(texts), threshold=0.5,
                                    cfg=CFG, candidates="prefix").to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    want = _brute_jaccard_pairs(texts, 3, 0.5)
    assert got_pairs == want


def test_window_hash_kernels():
    texts = ["abcdef", "ab", "", "abcabc"]
    flat, counts = mh.batch_window_hashes(texts, 3)
    assert counts.tolist() == [4, 1, 0, 4]
    # reference per-string loop
    base = 1_000_003
    def poly(s):
        h = 0
        for ch in s:
            h = (h * base + ord(ch)) % (1 << 64)
        return h
    assert flat[0] == poly("abc") and flat[3] == poly("def")
    assert flat[4] == poly("ab")
    uf, uc = mh.unique_per_doc(flat, counts)
    assert uc.tolist() == [4, 1, 0, 3]  # "abc" appears twice in abcabc
    s = np.cumsum(uc) - uc
    assert list(uf[s[3]:s[3] + uc[3]]) == sorted(set(
        [poly("abc"), poly("bca"), poly("cab")]))


def test_exact_cosine_pairs(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(4)
    V = rng.randn(80, 12)
    V[11] = V[3] + rng.randn(12) * 0.05
    V[50] = V[20] + rng.randn(12) * 0.05
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(list(range(len(V))), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float32())),
    }))
    got = dedup.exact_cosine_pairs(ds, threshold=0.9, cfg=CFG).to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    V = V.astype(np.float32).astype(np.float64)  # storage precision
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    want = {(i, j) for i in range(len(V)) for j in range(i + 1, len(V))
            if S[i, j] >= 0.9}
    assert got_pairs == want and (3, 11) in want
