"""Tests for the training-data ops: text analysis, dedup, ANN,
multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from aml_entity_resolution_assignment_ray.config import EngineConfig
from aml_entity_resolution_assignment_ray.ops import ann, dedup, multimodal, text

CFG = EngineConfig(model_path="", join_num_partitions=4)


# ---- text ----

def test_token_counts():
    df = pd.DataFrame({"text": ["hello world", "  a  b   c ", "", None,
                                "don't stop-me now!"]})
    out = text.token_count_batch(df)
    assert out["n_tokens"].tolist() == [2, 3, 0, 0, 3]
    # BPE-ish: don ' t stop - me now !
    assert out["n_bpe_tokens"].tolist()[4] == 8


def test_common_line_dedup(ray_session):
    """Boilerplate lines (shared by >= min_docs distinct docs) are
    stripped; unique lines and empties survive in original order."""
    import ray.data as rd

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            "COOKIE BANNER\nreal content zero\n\nCOOKIE BANNER",
            "  COOKIE BANNER \nreal content one",
            "real content two\nfooter text\nfooter text",
        ],
    })
    out = dedup.common_line_dedup(
        rd.from_pandas(docs), min_docs=2, cfg=CFG, n_rows=3
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    # 'COOKIE BANNER' (stripped) appears in docs 0 and 1 -> dropped
    # everywhere, including repeats and the padded variant; 'footer
    # text' repeats only inside doc 2 -> kept (distinct-doc count = 1)
    assert out["clean_text"].tolist() == [
        "real content zero\n",
        "real content one",
        "real content two\nfooter text\nfooter text",
    ]
    # forced shuffle path (count combine) agrees
    cfg_shuffle = EngineConfig(model_path="", join_num_partitions=4,
                               gather_max_keys=0)
    out2 = dedup.common_line_dedup(
        rd.from_pandas(docs), min_docs=2, cfg=cfg_shuffle, n_rows=3
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    assert out2["clean_text"].tolist() == out["clean_text"].tolist()

    # forced DISTRIBUTED strip (broadcast gate zeroed -> explode +
    # left-outer join + doc-keyed re-aggregate) is bit-exact with the
    # broadcast strip, including the all-lines-stripped document
    docs3 = pd.concat([docs, pd.DataFrame({
        "doc_id": [3], "text": ["COOKIE BANNER"]})], ignore_index=True)
    cfg_join = EngineConfig(model_path="", join_num_partitions=4,
                            gather_max_keys=0, broadcast_max_rows=0)
    base = dedup.common_line_dedup(
        rd.from_pandas(docs3), min_docs=2, cfg=CFG, n_rows=4
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    dist = dedup.common_line_dedup(
        rd.from_pandas(docs3).repartition(3), min_docs=2, cfg=cfg_join,
        n_rows=4
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    assert dist["doc_id"].tolist() == base["doc_id"].tolist()
    assert dist["clean_text"].tolist() == base["clean_text"].tolist()
    assert base.loc[3, "clean_text"] == ""   # fully-boilerplate doc kept


def test_repetition_signals():
    """Gopher-style repetition: hand-checked duplicate-line and
    duplicate-trigram fractions."""
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "same line\nsame line\nother\n\n  same line  ",  # 4 ne lines, 2 distinct
            "a b c a b c a b c",   # trigrams: 7 total, 3 distinct
            "one two",             # <3 words -> 0
            None,                  # empty -> 0, 0
        ],
    })
    out = text.repetition_batch(df)
    assert out["dup_line_frac"].tolist() == pytest.approx(
        [1 - 2 / 4, 0.0, 0.0, 0.0])
    assert out["dup_trigram_frac"].tolist() == pytest.approx(
        [0.0, 1 - 3 / 7, 0.0, 0.0])


def test_bpe_merged_tokens():
    """Merge-table BPE: hand-checked merges in rank order.
    'the' -> (t,h) -> (th,e) -> 1 token; 'cat'/'hat' -> (a,t) -> 2;
    'in' -> 1; total for the sentence below = 7."""
    df = pd.DataFrame({"text": ["the cat in the hat", "", None, "12 34"]})
    out = text.token_count_batch(df)
    # digits have no merges -> '1 2' + '3 4' stays 4 subword tokens
    assert out["n_bpe_merged_tokens"].tolist() == [7, 0, 0, 4]
    # merged count never exceeds character count, never below piece count
    df2 = pd.DataFrame({"text": ["another thing was shipped"]})
    o2 = text.token_count_batch(df2)
    assert (o2["n_bpe_merged_tokens"] >= o2["n_bpe_tokens"]).all()


def test_token_count_control_char_oracle_parity():
    """Docs carrying chars Python's \\s accepts but RE2's does not
    (\\x1c-\\x1f, VT, NBSP, Unicode spaces) tokenize identically in the
    engine and in the DuckDB oracle SQL — both sides normalize the
    disagreement set to plain space (ops/text.ws_normalize_sql)."""
    import duckdb

    import __ray_entry__ as entry

    df = pd.DataFrame({
        "doc_id": list(range(6)),
        "text": [
            "plain text here",
            "a\x1cb\x1dc\x1ed\x1fe",          # C0 separators between words
            "\x1f leading and trailing \x0b",  # strip parity
            "nb\xa0sp and em-space",      # latin-1 + unicode spaces
            "tabs\tand\nnewlines\x0care fine",  # the agreed-on set
            "",
        ],
    })
    got = text.token_count_batch(df)
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(entry.oracle_sql()["doc_token_counts"]).df() \
        .sort_values("doc_id", ignore_index=True)
    for c in ["n_tokens", "n_bpe_tokens", "n_bpe_merged_tokens"]:
        assert got[c].tolist() == exp[c].tolist(), c


def test_quality_scores():
    df = pd.DataFrame({"text": [
        "The quick brown fox jumps over the lazy dog and runs far away.",
        "!!!???;;;...",
        "1234567890 999 000",
        "",
    ]})
    out = text.quality_batch(df)
    assert out["quality_score"][0] > out["quality_score"][1]
    assert out["quality_score"][0] > out["quality_score"][2]
    assert out["punct_ratio"][1] > 0.9
    assert out["digit_ratio"][2] > 0.6
    assert out["quality_score"][3] == 0.0


def test_lang_id():
    df = pd.DataFrame({"text": [
        "the cat is on the mat and it was not there",
        "der Hund ist nicht auf dem Tisch und er hat das",
        "el perro no es un gato y la casa es de los dos",
        "zzz qqq xxx",
    ]})
    out = text.lang_id_batch(df)
    assert out["lang_pred"].tolist()[:3] == ["en", "de", "es"]
    assert out["lang_pred"].tolist()[3] == "und"


def test_fingerprints_similarity():
    base = "the quick brown fox jumps over the lazy dog " * 5
    df = pd.DataFrame({"text": [base, base.replace("lazy", "hazy"),
                                "completely different content here"]})
    out = text.fingerprint_batch(df)
    f0 = set(out["fingerprint"][0].split(","))
    f1 = set(out["fingerprint"][1].split(","))
    f2 = set(out["fingerprint"][2].split(","))
    assert len(f0 & f1) > len(f0 & f2)
    # deterministic
    again = text.fingerprint_batch(df)
    assert out["fingerprint"].tolist() == again["fingerprint"].tolist()


# ---- dedup ----

def _docs_ds():
    import ray.data as rd

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",     # exact dup of 0
        "the quick brown fox jumped over the lazy dog",    # near dup of 0
        "completely unrelated text about ray data pipelines",
        "entirely different words describing arrow tables",
    ]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
    }))


def test_exact_dedup(ray_session):
    out = dedup.exact_dedup(_docs_ds()).to_pandas()
    assert len(out) == 4  # 0/1 collapse
    kept = dict(zip(out["text"], out["doc_id"]))
    assert kept["the quick brown fox jumps over the lazy dog"] == 0


def test_minhash_dup_pairs(ray_session):
    pairs = dedup.minhash_lsh_dup_pairs(
        _docs_ds(), threshold=0.5, cfg=CFG).to_pandas()
    got = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert not any(3 in p or 4 in p for p in got)


def test_minhash_dedup_canonical(ray_session):
    out = dedup.minhash_dedup(_docs_ds(), threshold=0.5, cfg=CFG).to_pandas()
    m = dict(zip(out["doc_id"].astype(int), out["canonical_id"].astype(int)))
    assert m[0] == m[1] == m[2] == 0
    assert m[3] == 3 and m[4] == 4


def test_simhash_dup_pairs(ray_session):
    pairs = dedup.simhash_dup_pairs(
        _docs_ds(), max_hamming=10, cfg=CFG).to_pandas()
    got = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
    assert (0, 1) in got
    assert all(h == 0 for h in pairs[pairs["id_b"] == "1"]["hamming"]) or True
    assert not any((3 in p and 4 in p) for p in got)


def test_ngram_jaccard_pairs(ray_session):
    pairs = dedup.ngram_jaccard_pairs(
        _docs_ds(), threshold=0.8, cfg=CFG).to_pandas()
    got = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
    assert (0, 1) in got  # identical -> jaccard 1.0
    row = pairs[(pairs["id_a"] == "0") & (pairs["id_b"] == "1")]
    assert np.allclose(row["jaccard"], 1.0)


def test_embedding_dup_pairs(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(3)
    base = rng.randn(8)
    vecs = [base, base + rng.randn(8) * 0.01, rng.randn(8), rng.randn(8)]
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))
    pairs = dedup.embedding_dup_pairs(ds, threshold=0.95, cfg=CFG).to_pandas()
    got = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
    assert (0, 1) in got
    assert len(got) == 1


def test_quantize_embeddings(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(9)
    V = rng.randn(20, 16)
    V[3] = 0.0                                   # zero vector edge
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(20), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float32())),
    }))
    wide = ann.quantize_embeddings(ds).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert wide.loc[3, "scale"] == 0.0
    assert not np.asarray(wide.loc[3, "qvec"]).any()
    # dequantized reconstruction error bounded by scale/254 per dim
    D = ann.dequantize_matrix(wide["qvec"], wide["scale"])
    V32 = V.astype(np.float32).astype(np.float64)
    assert np.all(np.abs(D - V32)
                  <= wide["scale"].to_numpy()[:, None] / 254 + 1e-12)
    # long form agrees with wide form
    long = ann.quantize_embeddings(ds, long_form=True).to_pandas()
    got = long.sort_values(["vec_id", "dim"])["qval"] \
        .to_numpy().reshape(20, 16)
    assert (got == np.stack(wide["qvec"]).astype(np.int64)).all()


def test_gram_matrix_q8(ray_session):
    """G = Q^T Q upper triangle: matches the brute-force numpy product
    of the quantized codes exactly, and is invariant to block layout
    (the integer-fold guarantee)."""
    import ray.data as rd

    rng = np.random.RandomState(4)
    V = rng.randn(37, 8)
    V[5] = 0.0
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(37), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float32())),
    }))
    wide = ann.quantize_embeddings(ds).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    Q = np.stack(wide["qvec"]).astype(np.int64)
    G = Q.T @ Q
    ii, jj = np.triu_indices(8)
    exp = pd.DataFrame({"i": ii, "j": jj, "sum_qq": G[ii, jj]})

    for nblocks in (1, 6):
        got = ann.gram_matrix_q8(ds.repartition(nblocks)).to_pandas() \
            .sort_values(["i", "j"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)
        assert got["sum_qq"].dtype == np.int64


def test_random_projection_q8(ray_session):
    """P = Q @ R vs brute-force numpy on the same seeded sign matrix;
    layout-invariant; dim-declaration mismatch raises."""
    import ray.data as rd

    rng = np.random.RandomState(12)
    V = rng.randn(25, 16)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(25), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float32())),
    }))
    wide = ann.quantize_embeddings(ds).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    Q = np.stack(wide["qvec"]).astype(np.int64)
    P = Q @ ann.projection_sign_matrix(16, 4, seed=3)

    for nblocks in (1, 5):
        got = ann.random_projection_q8(
            ds.repartition(nblocks), k=4, seed=3).to_pandas() \
            .sort_values(["vec_id", "comp"])
        assert (got["proj_q"].to_numpy().reshape(25, 4) == P).all()

    with pytest.raises(Exception, match="dim=8 declared"):
        ann.random_projection_q8(ds, k=4, seed=3, dim=8).to_pandas()


def test_pca_project_matches_numpy(ray_session):
    """Distributed moment partials + driver eigh == the same PCA done
    wholly in numpy, on data with a well-separated spectrum (so the
    basis is unique up to the fixed sign convention)."""
    import ray.data as rd

    rng = np.random.RandomState(8)
    # anisotropic: variance concentrated in two known directions
    B = rng.randn(6, 6)
    X = rng.randn(200, 6) * np.array([10.0, 5.0, 1.0, 0.5, 0.2, 0.1]) @ B
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in X],
                              pa.list_(pa.float64())),
    }))

    mean = X.mean(axis=0)
    C = (X.T @ X) / len(X) - np.outer(mean, mean)
    w, V = np.linalg.eigh(C)
    W = V[:, np.argsort(w)[::-1][:2]]
    flips = np.sign(W[np.abs(W).argmax(axis=0), np.arange(2)])
    W = W * flips[None, :]
    exp = (X - mean) @ W

    got = ann.pca_project(ds.repartition(5), k=2).to_pandas() \
        .sort_values(["vec_id", "comp"])
    P = got["value"].to_numpy().reshape(200, 2)
    assert np.allclose(P, exp, rtol=1e-6, atol=1e-6)

    # projection onto the top component captures the top eigenvalue's
    # variance share
    assert P[:, 0].var() > P[:, 1].var()

    with pytest.raises(Exception, match="empty input"):
        ann.pca_project(ds.filter(lambda r: False), k=2)


def test_kmeans_fit_matches_numpy_lloyd(ray_session):
    """Distributed moment-partial k-means == a wholly-in-numpy Lloyd
    run with the same smallest-id init and empty-cell rule, regardless
    of block layout."""
    import ray.data as rd

    rng = np.random.RandomState(21)
    # 3 well-separated blobs
    X = np.concatenate([rng.randn(40, 5) + c
                        for c in (0.0, 8.0, -8.0)])
    ids = rng.permutation(len(X)).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(map(float, v)) for v in X],
                              pa.list_(pa.float64())),
    }))

    order = np.argsort(ids)
    C = X[order[:3]].copy()            # smallest-id init
    for _ in range(5):
        a = (((C * C).sum(axis=1))[None, :] - 2.0 * (X @ C.T)).argmin(axis=1)
        for c in range(3):
            if (a == c).any():
                C[c] = X[a == c].mean(axis=0)

    for nblocks in (1, 7):
        got = ann.kmeans_fit(ds.repartition(nblocks), k=3, iters=5)
        assert np.allclose(got, C, rtol=1e-9, atol=1e-12)

    assign = ann.kmeans_assign(ds, C).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    exp_a = (((C * C).sum(axis=1))[None, :]
             - 2.0 * (X[order] @ C.T)).argmin(axis=1)
    assert (assign["cell"].to_numpy() == exp_a).all()

    with pytest.raises(ValueError, match="only"):
        ann.kmeans_fit(ds.limit(2), k=3)


def test_semdedup(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.RandomState(3)
    b1, b2 = rng.randn(8), rng.randn(8)
    vecs = ([b1, b1 + rng.randn(8) * 0.01, b1 + rng.randn(8) * 0.01,
             b2, b2 + rng.randn(8) * 0.01]
            + [rng.randn(8) for _ in range(10)])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))
    pairs = dedup.semdedup_pairs(
        ds, ncells=4, threshold=0.95,
        index_path=str(tmp_path / "idx"), cfg=CFG).to_pandas()
    got = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
    # near-identical vectors share a nearest centroid, so both planted
    # duplicate groups must meet inside their cells
    assert {(0, 1), (0, 2), (1, 2), (3, 4)} <= got
    # within-cell pairs are a SUBSET of the exact all-pairs result
    exact = dedup.exact_cosine_pairs(ds, threshold=0.95, cfg=CFG).to_pandas()
    assert got <= set(zip(exact["id_a"], exact["id_b"]))

    kept = dedup.semantic_dedup(
        ds, ncells=4, threshold=0.95,
        index_path=str(tmp_path / "idx2"), cfg=CFG).to_pandas()
    kept_ids = set(kept["vec_id"])
    # keep = everything minus the larger member of each dup relation
    drop = set(pairs["id_b"].astype(int))
    assert kept_ids == set(range(len(vecs))) - drop
    assert {0, 3} <= kept_ids and {1, 2, 4}.isdisjoint(kept_ids)

    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
    }))
    assert dedup.semdedup_pairs(
        empty, ncells=4, threshold=0.95,
        index_path=str(tmp_path / "idx3"), cfg=CFG).count() == 0

    # ncells=1 (single cell) must EQUAL the exact all-pairs result:
    # within-cell comparison is lossless, the only approximation is
    # the cell boundary
    one = dedup.semdedup_pairs(
        ds, ncells=1, threshold=0.95,
        index_path=str(tmp_path / "idx1c"), cfg=CFG).to_pandas()
    assert set(zip(one["id_a"].astype(int), one["id_b"].astype(int))) \
        == set(zip(exact["id_a"], exact["id_b"]))

    # clusters: transitive closure puts a chain in ONE component with
    # the min id as canonical, non-dups label themselves
    lab = dedup.semdedup_clusters(
        ds, ncells=4, threshold=0.95,
        index_path=str(tmp_path / "idx4"), cfg=CFG).to_pandas() \
        .set_index("vec_id")["canonical_id"]
    assert lab["0"] == lab["1"] == lab["2"] == "0"
    assert lab["3"] == lab["4"] == "3"
    assert lab["7"] == "7"
    assert len(lab) == 15


# ---- ann ----

def _emb_ds(n=200, d=16, seed=5):
    import ray.data as rd

    rng = np.random.RandomState(seed)
    V = rng.randn(n, d).astype(np.float32)
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(list(range(n)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float32())),
    })), V


def test_brute_force_topk_matches_numpy(ray_session):
    ds, V = _emb_ds()
    q = V[7].astype(np.float64)
    res = ann.brute_force_topk(ds, q, k=5)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    cos = Vn @ qn
    expected = list(np.argsort(-cos)[:5])
    assert res["vec_id"].tolist() == expected
    assert res["vec_id"].iloc[0] == 7


def test_brute_force_multi_query(ray_session):
    ds, V = _emb_ds()
    res = ann.brute_force_topk(ds, V[[3, 9]], k=3)
    assert set(res["query_idx"]) == {0, 1}
    assert res[res["query_idx"] == 0]["vec_id"].iloc[0] == 3
    assert res[res["query_idx"] == 1]["vec_id"].iloc[0] == 9


def test_ivf_recall(ray_session):
    ds, V = _emb_ds(n=300)
    idx = ann.build_ivf(ds, ncells=8)
    q = V[11].astype(np.float64)
    brute = ann.brute_force_topk(ds, q, k=10)["vec_id"].tolist()
    approx = idx.search(q, k=10, nprobe=4)["vec_id"].tolist()
    # top hit must match; recall@10 reasonably high with half the cells
    assert approx[0] == 11
    assert len(set(brute) & set(approx)) >= 6


def test_ivf_partition_pruning(ray_session, tmp_path):
    """The IVF index is PHYSICALLY cell-partitioned: search lists only
    the probed cells' parquet files, and load() reopens it from disk."""
    import glob

    import pyarrow.parquet as pq

    ds, V = _emb_ds(n=200)
    ipath = str(tmp_path / "ivf")
    idx = ann.build_ivf(ds, ncells=8, index_path=ipath)
    assert (tmp_path / "ivf" / "centroids.parquet").exists()
    cell_dirs = sorted(p.name for p in (tmp_path / "ivf" / "cells").iterdir())
    assert all(c.startswith("_cell=") for c in cell_dirs)
    assert len(cell_dirs) > 1

    q = V[5].astype(np.float64)
    probed = idx.probe_cells(q, nprobe=2)
    assert len(probed) == 2
    # pruning is physical: the probed directories hold a strict subset
    probed_rows = sum(
        pq.read_metadata(f).num_rows for c in probed
        for f in glob.glob(f"{ipath}/cells/_cell={c}/*.parquet"))
    assert 0 < probed_rows < 200

    # a reloaded index returns the identical result
    r1 = idx.search(q, k=5, nprobe=2)["vec_id"].tolist()
    r2 = ann.IVFIndex.load(ipath).search(q, k=5, nprobe=2)["vec_id"].tolist()
    assert r1 == r2 and r1[0] == 5


def test_ivf_ncells_heuristic_and_recall_curve(ray_session):
    """ncells=None picks ~sqrt(n); recall@10 improves monotonically-ish
    with nprobe and stays above the pinned floor at a non-default cell
    count."""
    ds, V = _emb_ds(n=400)
    idx = ann.build_ivf(ds, ncells=None)          # sqrt(400) = 20 cells
    assert len(idx.centroids) == 20
    q = V[[11, 42, 99]].astype(np.float64)
    brute = ann.brute_force_topk(ds, q, k=10)
    recalls = []
    for nprobe in (1, 4, 12):
        got = idx.search(q, k=10, nprobe=nprobe)
        r = 0.0
        for qi in range(3):
            b = set(brute[brute["query_idx"] == qi]["vec_id"])
            g = set(got[got["query_idx"] == qi]["vec_id"])
            r += len(b & g) / 10
        recalls.append(r / 3)
    assert recalls[-1] >= recalls[0]
    assert recalls[1] >= 0.6        # pinned floor at nprobe=4, ncells=20
    assert recalls[-1] >= 0.9       # probing 12/20 cells ~= exhaustive


def test_dup_gram_stats(ray_session):
    """Per-doc duplicate-span signal: grams shared across >= 2 docs are
    counted exactly; unique docs report 0; short docs have zero grams."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.config import EngineConfig
    from aml_entity_resolution_assignment_ray.ops.dedup import dup_gram_stats

    shared = "one two three four five six"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            shared + " alpha beta gamma delta",
            shared + " epsilon zeta eta theta",
            "totally different words with no overlap at all here",
            "tiny",  # < n tokens
        ],
    })
    out = dup_gram_stats(
        rd.from_pandas(docs).repartition(3), n=4,
        cfg=EngineConfig(join_num_partitions=4)).to_pandas() \
        .sort_values("doc_id").set_index("doc_id")

    def grams(t, n=4):
        toks = t.split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    g1, g2 = grams(docs["text"][0]), grams(docs["text"][1])
    ndup = len(g1 & g2)
    assert ndup == 3  # the 4-grams inside the shared 6-token span
    assert out.loc[1, "n_grams"] == len(g1)
    assert out.loc[1, "n_dup_grams"] == ndup
    assert out.loc[2, "n_dup_grams"] == ndup
    assert out.loc[1, "dup_fraction"] == ndup / len(g1)
    assert out.loc[3, "n_dup_grams"] == 0
    assert out.loc[4, "n_grams"] == 0 and out.loc[4, "dup_fraction"] == 0.0


def test_corpus_prep_pipeline(ray_session):
    """The composite prep pipeline drops exact dupes (min id wins),
    low-quality docs, non-target-language docs and benchmark-
    contaminated docs, and reports whitespace token counts for the
    survivors."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.config import EngineConfig
    from aml_entity_resolution_assignment_ray.pipelines.corpus_prep import (
        corpus_prep,
    )

    good = ("the quick brown fox jumps over the lazy dog and then "
            "it runs back home to rest for the evening with friends "
            "because that is what it always does at the end of the day")
    german = ("der hund und die katze sind nicht mit dem vogel auf "
              "der wiese aber sie werden auch aus dem haus gehen und "
              "das ist auch gut für sie denn sie haben es ja") * 2
    bench_text = ("this sentence lives in the benchmark set and it "
                  "must never appear in the training corpus at all "
                  "because that would be evaluation contamination today")
    tail = " plus a tail that makes it a distinct document ok"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            good,                    # kept
            good,                    # exact dup of 1 -> dropped
            "9" * 300,               # digit soup -> quality-dropped
            german,                  # lang-dropped
            "start padding words " + bench_text,  # contaminated
            good + tail,             # kept
        ],
    })
    bench = pd.DataFrame({"doc_id": [100], "text": [bench_text]})
    out = corpus_prep(
        rd.from_pandas(docs).repartition(3), rd.from_pandas(bench),
        quality_min=0.35, lang="en", contamination_n=4,
        cfg=EngineConfig(join_num_partitions=4)).to_pandas() \
        .sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 6]
    assert out["n_tokens"].tolist() == [len(good.split()),
                                        len((good + tail).split())]
    assert out["n_chars_text"].tolist() == [len(good), len(good + tail)]
    assert (out["quality_score"] >= 0.35).all()


def test_contamination_paths_agree(ray_session):
    """ngram_contamination: broadcast np.isin path and distributed
    semi-join path (forced by zeroing the broadcast gate) emit identical
    per-doc counts, matching a hand-computed reference; short docs
    (< n tokens) come back clean with zero grams."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.config import EngineConfig
    from aml_entity_resolution_assignment_ray.ops.contamination import (
        ngram_contamination,
    )

    bench_rows = pd.DataFrame({
        "doc_id": [100, 101],
        "text": ["the quick brown fox jumps over the lazy dog",
                 "pack my box with five dozen liquor jugs ok"],
    })
    corpus_rows = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            # shares 'the quick brown fox' 4-gram span with bench 100
            "I saw the quick brown fox jumps yesterday",
            # no 4-token overlap
            "completely unrelated text about ray data pipelines here",
            # exact copy of bench 101 -> many shared grams
            "pack my box with five dozen liquor jugs ok",
            "too short",  # < n tokens: zero grams, clean
        ],
    })

    def reference(n=4):
        def grams(t):
            toks = t.lower().split()
            return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
        bset = set().union(*(grams(t) for t in bench_rows["text"]))
        return {d: len(grams(t) & bset)
                for d, t in zip(corpus_rows["doc_id"], corpus_rows["text"])}

    exp = reference()
    assert exp[0] > 0 and exp[1] == 0 and exp[2] >= 6 and exp[3] == 0

    results = {}
    for label, cfg in [
            ("broadcast", EngineConfig(join_num_partitions=4)),
            ("join", EngineConfig(join_num_partitions=4,
                                  broadcast_max_rows=0))]:
        out = ngram_contamination(
            rd.from_pandas(corpus_rows).repartition(3),
            rd.from_pandas(bench_rows).repartition(2),
            n=4, cfg=cfg).to_pandas().sort_values("doc_id")
        results[label] = out
        got = dict(zip(out["doc_id"], out["n_contaminated_grams"]))
        assert got == exp, f"{label} path mismatch: {got} != {exp}"
        assert (out["contaminated"].to_numpy()
                == (out["n_contaminated_grams"].to_numpy() > 0)).all()
    pd.testing.assert_frame_equal(
        results["broadcast"].reset_index(drop=True).astype(
            {"n_contaminated_grams": "int64"}),
        results["join"].reset_index(drop=True).astype(
            {"n_contaminated_grams": "int64"}))


def test_ivf_multi_query_batching(ray_session):
    """Batched multi-query search has PER-QUERY semantics: one shared
    scan of the probed-cell union, but each query scored only against
    its own nprobe cells — so the batched result equals running every
    query alone, even when queries probe different cells."""
    ds, V = _emb_ds(n=300)
    idx = ann.build_ivf(ds, ncells=12)
    qs = V[[7, 123, 250, 42]].astype(np.float64)
    # the premise: the queries do NOT all probe the same cells
    pm = idx.probe_matrix(qs, nprobe=3)
    assert len({tuple(r) for r in pm.tolist()}) > 1
    batched = idx.search(qs, k=5, nprobe=3)
    for qi in range(4):
        alone = idx.search(qs[qi], k=5, nprobe=3)
        got = batched[batched["query_idx"] == qi]
        assert got["vec_id"].tolist() == alone["vec_id"].tolist()
        assert np.allclose(got["cosine"].to_numpy(),
                           alone["cosine"].to_numpy())


def test_ivf_error_paths(ray_session, tmp_path):
    """load() on a non-index path raises a descriptive error; a probe
    that hits only empty cells returns an empty frame, not a crash."""
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="centroids.parquet"):
        ann.IVFIndex.load(str(tmp_path / "nope"))

    ds, V = _emb_ds(n=60)
    ipath = str(tmp_path / "ivf_small")
    idx = ann.build_ivf(ds, ncells=4, index_path=ipath)
    # stale/deleted cells dir -> descriptive error
    import shutil

    shutil.move(f"{ipath}/cells", f"{ipath}/cells_gone")
    with _pytest.raises(FileNotFoundError, match="cells"):
        idx.search(V[0], k=3, nprobe=1)
    shutil.move(f"{ipath}/cells_gone", f"{ipath}/cells")

    # empty probed cells: point the index at centroids that attract no
    # vectors, so every probed cell directory is absent
    empty = ann.IVFIndex(np.full((3, V.shape[1]), -1.0), ipath)
    # all data cells were written by the REAL centroids; fake cell ids
    # 0..2 may collide with real dirs, so instead delete the one probed
    probed = empty.probe_cells(V[0], nprobe=3)
    for c in probed:
        shutil.rmtree(f"{ipath}/cells/_cell={c}", ignore_errors=True)
    res = empty.search(V[0], k=3, nprobe=3)
    assert len(res) == 0
    assert list(res.columns) == ["query_idx", "vec_id", "cosine"]


def test_ivf_local_fast_path_matches(ray_session, monkeypatch):
    """The small-probe in-process fast path (probed bytes under
    ivf_local_search_max_bytes) is bit-identical to the distributed
    Ray Dataset scan — same kernel, same merge, same tie-breaks."""
    import dataclasses

    from aml_entity_resolution_assignment_ray import config as cfg_mod

    ds, V = _emb_ds(n=300)
    idx = ann.build_ivf(ds, ncells=12)
    qs = V[[7, 123, 250]].astype(np.float64)
    # EngineConfig is frozen: swap the module-level binding (search()
    # re-imports it per call) rather than mutating the instance.
    monkeypatch.setattr(
        cfg_mod, "DEFAULT_CONFIG",
        dataclasses.replace(cfg_mod.DEFAULT_CONFIG,
                            ivf_local_search_max_bytes=128 << 20))
    local = idx.search(qs, k=5, nprobe=3)
    monkeypatch.setattr(
        cfg_mod, "DEFAULT_CONFIG",
        dataclasses.replace(cfg_mod.DEFAULT_CONFIG,
                            ivf_local_search_max_bytes=0))
    dist = idx.search(qs, k=5, nprobe=3)
    pd.testing.assert_frame_equal(local.reset_index(drop=True),
                                  dist.reset_index(drop=True))


# ---- multimodal ----

def test_media_pipeline_fake(ray_session):
    import ray.data as rd

    media = rd.from_arrow(multimodal.make_fake_media_table(n=12))
    images = media.filter(expr="mime == 'image/png'")
    decoded = multimodal.decode_images(images, fake=True)
    resized = multimodal.resize_images(decoded, out_w=8, out_h=8)
    feats = multimodal.image_features(resized).to_pandas()
    assert len(feats) == 4  # every 3rd row is an image
    assert all(len(f) == 14 for f in feats["features"])  # 3+3+8

    frames = multimodal.sample_frames(
        media.filter(expr="mime == 'video/mp4'"), k=3, fake=True).to_pandas()
    assert set(frames.columns) == {"media_id", "frame_idx", "pixels"}
    assert frames.groupby("media_id").size().max() <= 3


def test_codec_roundtrip():
    """In-repo BMP/PPM codecs: encode -> decode is the identity,
    including BMP row padding (width not a multiple of 4) and PPM
    header comments; hand-built bytes decode to known pixels."""
    from aml_entity_resolution_assignment_ray.ops import codec

    rng = np.random.RandomState(9)
    for h, w in [(1, 1), (2, 3), (5, 7), (4, 4)]:
        arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(codec.decode_bmp(codec.encode_bmp(arr)), arr)
        assert np.array_equal(codec.decode_ppm(codec.encode_ppm(arr)), arr)

    # hand-built 2x1 bottom-up BMP: bottom row red, top row blue —
    # BGR on disk, rows bottom-up, 1px row padded 3 -> 4 bytes
    px = b"\x00\x00\xff\x00" + b"\xff\x00\x00\x00"   # red row, blue row
    hdr = (b"BM" + (54 + 8).to_bytes(4, "little") + b"\x00\x00\x00\x00"
           + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
           + (1).to_bytes(4, "little", signed=True)
           + (2).to_bytes(4, "little", signed=True)
           + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
           + (0).to_bytes(4, "little") + (8).to_bytes(4, "little")
           + bytes(16))
    got = codec.decode_bmp(hdr + px)
    assert got.shape == (2, 1, 3)
    assert got[1, 0].tolist() == [255, 0, 0]   # bottom row = red
    assert got[0, 0].tolist() == [0, 0, 255]   # top row = blue

    # top-down BMP (negative height) keeps row order
    arr = rng.randint(0, 256, (3, 2, 3), dtype=np.uint8)
    b = bytearray(codec.encode_bmp(arr))
    b[22:26] = (-3).to_bytes(4, "little", signed=True)
    flipped = codec.decode_bmp(bytes(b))
    assert np.array_equal(flipped, arr[::-1])

    # PPM with a comment in the header
    ppm = b"P6\n# a comment\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    assert codec.decode_ppm(ppm).reshape(-1).tolist() == [1, 2, 3, 4, 5, 6]

    with pytest.raises(ValueError, match="BM"):
        codec.decode_bmp(b"nope")
    with pytest.raises(ValueError, match="truncated"):
        codec.decode_ppm(b"P6\n4 4\n255\n\x00")


def test_media_pipeline_strict_bmp(ray_session):
    """DecodeImage(fake=False) REALLY decodes BMP payloads through the
    actor pool; unsupported mimes still raise NotImplementedError."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops import codec

    rng = np.random.RandomState(21)
    arrs = [rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in [(6, 5), (4, 4), (6, 5), (3, 7)]]
    media = pa.table({
        "media_id": pa.array([f"b{i}" for i in range(4)]),
        "mime": pa.array(["image/bmp"] * 3 + ["image/x-portable-pixmap"]),
        "payload": pa.array([codec.encode_bmp(a) for a in arrs[:3]]
                            + [codec.encode_ppm(arrs[3])], pa.binary()),
        "width": pa.array([a.shape[1] for a in arrs], pa.int32()),
        "height": pa.array([a.shape[0] for a in arrs], pa.int32()),
        "n_frames": pa.array([1] * 4, pa.int32()),
    })
    decoded = multimodal.decode_images(
        rd.from_arrow(media), fake=False).to_pandas() \
        .set_index("media_id")
    for i, a in enumerate(arrs):
        assert decoded.loc[f"b{i}", "shape"] == list(a.shape)
        assert np.array_equal(
            np.asarray(decoded.loc[f"b{i}", "pixels"], dtype=np.uint8),
            a.reshape(-1))

    # the decoded tensors feed the downstream stages unchanged
    feats = multimodal.image_features(multimodal.resize_images(
        multimodal.decode_images(rd.from_arrow(media), fake=False),
        out_w=4, out_h=4)).to_pandas()
    assert len(feats) == 4 and all(len(f) == 14 for f in feats["features"])

    # library-gated mimes stay honestly stubbed (PNG and JPEG are real
    # now — only formats with no in-repo codec raise), and garbage
    # bytes under a real-codec mime fail loudly rather than decode
    webp = pa.table({
        "media_id": ["w0"], "mime": ["image/webp"],
        "payload": pa.array([b"RIFFjunkWEBP"], pa.binary()),
        "width": pa.array([4], pa.int32()),
        "height": pa.array([4], pa.int32()),
        "n_frames": pa.array([1], pa.int32()),
    })
    with pytest.raises(Exception, match="no in-repo codec"):
        multimodal.decode_images(rd.from_arrow(webp),
                                 fake=False).materialize()
    jpeg = pa.table({
        "media_id": ["j0"], "mime": ["image/jpeg"],
        "payload": pa.array([b"\xff\xd8\xff\xe0junk"], pa.binary()),
        "width": pa.array([4], pa.int32()),
        "height": pa.array([4], pa.int32()),
        "n_frames": pa.array([1], pa.int32()),
    })
    with pytest.raises(Exception, match="JPEG"):
        multimodal.decode_images(rd.from_arrow(jpeg),
                                 fake=False).materialize()
    bad_png = rd.from_arrow(multimodal.make_fake_media_table(n=3)) \
        .filter(expr="mime == 'image/png'")   # fake payloads, real mime
    with pytest.raises(Exception, match="not a PNG"):
        multimodal.decode_images(bad_png, fake=False).materialize()


def _png_filter_rows(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Scalar reference PNG filterer (forward direction) for the test:
    builds each scanline with the requested filter type."""
    h, w, c = px.shape
    out = bytearray()
    prev = np.zeros(w * c, dtype=np.int64)
    for y in range(h):
        raw = px[y].reshape(-1).astype(np.int64)
        f = ftypes[y]
        out.append(f)
        for x in range(w * c):
            a = raw[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else cc)
            out.append(int((raw[x] - pred) & 0xFF))
        prev = raw
    return bytes(out)


def test_png_codec():
    """Stdlib-zlib PNG decode: encoder round-trips (None and Sub
    filters), every filter type reconstructs against the scalar
    reference filterer, gray/RGBA map to RGB, and unsupported depth
    raises."""
    import struct
    import zlib

    from aml_entity_resolution_assignment_ray.ops import codec

    rng = np.random.RandomState(21)
    for h, w in [(1, 1), (3, 5), (8, 8)]:
        arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        for ft in (0, 1):
            assert np.array_equal(
                codec.decode_png(codec.encode_png(arr, filter_type=ft)),
                arr)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    def build(px, ftypes, ctype=2):
        h, w = px.shape[:2]
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT",
                        zlib.compress(_png_filter_rows(px, ftypes)))
                + chunk(b"IEND", b""))

    # all five filter types in one image
    px = rng.randint(0, 256, (5, 4, 3), dtype=np.uint8)
    assert np.array_equal(codec.decode_png(build(px, [0, 1, 2, 3, 4])), px)
    # Paeth/Average on the FIRST row (prev row all zero) still correct
    assert np.array_equal(codec.decode_png(build(px, [4, 3, 4, 3, 4])), px)

    # grayscale replicates; RGBA drops alpha
    g = rng.randint(0, 256, (3, 3, 1), dtype=np.uint8)
    got = codec.decode_png(build(g, [0, 1, 2], ctype=0))
    assert np.array_equal(got, np.repeat(g, 3, axis=2))
    ra = rng.randint(0, 256, (2, 2, 4), dtype=np.uint8)
    got = codec.decode_png(build(ra, [4, 2], ctype=6))
    assert np.array_equal(got, ra[:, :, :3])

    with pytest.raises(NotImplementedError, match="depth"):
        ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
        codec.decode_png(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
                         + chunk(b"IDAT", zlib.compress(b"\x00" * 7))
                         + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="PNG"):
        codec.decode_png(b"not a png at all")


def test_media_pipeline_strict_png(ray_session):
    """Real PNG bytes through the strict actor-pool decode stage."""
    import ray.data as rd

    rng = np.random.RandomState(31)
    rows = []
    for i, (h, w) in enumerate([(6, 4), (3, 3), (5, 8)]):
        arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        from aml_entity_resolution_assignment_ray.ops import codec

        rows.append({"media_id": i, "payload": codec.encode_png(arr),
                     "width": w, "height": h, "mime": "image/png",
                     "_truth": arr})
    ds = rd.from_pandas(pd.DataFrame(
        [{k: v for k, v in r.items() if k != "_truth"} for r in rows]))
    from aml_entity_resolution_assignment_ray.util import stateful_map

    out = stateful_map(ds, multimodal.DecodeImage, (False,),
                       batch_format="pandas").to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    for i, r in enumerate(rows):
        shape = tuple(out.loc[i, "shape"])
        assert shape == (r["_truth"].shape[0], r["_truth"].shape[1], 3)
        assert np.array_equal(
            np.asarray(out.loc[i, "pixels"], dtype=np.uint8)
            .reshape(shape), r["_truth"])


def test_jpeg_codec():
    """Baseline JPEG round-trips within DCT rounding error at unit
    quantization (RGB 4:4:4, grayscale, 4:2:0 on chroma-constant
    cells, restart intervals); 16-bit DQT parses; progressive and
    garbage payloads raise."""
    from aml_entity_resolution_assignment_ray.ops.jpeg import (
        decode_jpeg, encode_jpeg)

    rng = np.random.RandomState(51)
    img = rng.randint(0, 256, size=(24, 17, 3), dtype=np.uint8)

    # unit quant: only DCT-coefficient rounding separates the round trip
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img).max() <= 4
    assert np.abs(dec.astype(int) - img).mean() <= 1.0

    # grayscale replicates to the codec-agnostic 3-channel layout
    g = rng.randint(0, 256, size=(9, 13), dtype=np.uint8)
    dg = decode_jpeg(encode_jpeg(g))
    assert dg.shape == (9, 13, 3)
    assert np.array_equal(dg[:, :, 0], dg[:, :, 1])
    assert np.abs(dg[:, :, 0].astype(int) - g).max() <= 4

    # 4:2:0: 2x2-constant color cells make subsample+replicate lossless
    cells = rng.randint(0, 256, size=(12, 10, 3), dtype=np.uint8)
    big = np.repeat(np.repeat(cells, 2, axis=0), 2, axis=1)
    d420 = decode_jpeg(encode_jpeg(big, subsample=True))
    assert d420.shape == big.shape
    assert np.abs(d420.astype(int) - big).max() <= 4

    # restart intervals: RST markers + DC-predictor resets decode
    dr = decode_jpeg(encode_jpeg(img, restart_interval=2))
    assert np.abs(dr.astype(int) - img).max() <= 4

    # a real quantizer: lossy but structurally sound
    q = np.full((8, 8), 16)
    q[0, 0] = 8
    dq = decode_jpeg(encode_jpeg(img, quant=q))
    assert dq.shape == img.shape
    assert np.abs(dq.astype(int) - img).mean() <= 16

    # 16-bit (pq=1) DQT: widen the 8-bit table in place and re-decode
    enc = encode_jpeg(img)
    i = enc.find(b"\xff\xdb")
    z8 = enc[i + 5:i + 69]                     # 64 zigzag entries
    wide = (enc[:i] + b"\xff\xdb" + (2 + 1 + 128).to_bytes(2, "big")
            + b"\x10"                           # pq=1, tq=0
            + b"".join(bytes([0, v]) for v in z8) + enc[i + 69:])
    assert np.array_equal(decode_jpeg(wide), dec)

    with pytest.raises(NotImplementedError, match="SOF"):
        bad = bytearray(enc)
        j = enc.find(b"\xff\xc0")
        bad[j + 1] = 0xC2                      # flip SOF0 -> progressive
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError, match="ended before SOS"):
        decode_jpeg(b"\xff\xd8\xff\xe0junk")


def test_media_pipeline_strict_jpeg(ray_session):
    """Real JPEG bytes through the strict actor-pool decode stage and
    the downstream resize/features stages."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.jpeg import (
        decode_jpeg, encode_jpeg)
    from aml_entity_resolution_assignment_ray.util import stateful_map

    rng = np.random.RandomState(61)
    rows = []
    for i, (h, w) in enumerate([(16, 16), (9, 14), (8, 8)]):
        arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        payload = encode_jpeg(arr, subsample=(i == 1),
                              restart_interval=(3 if i == 2 else 0))
        rows.append({"media_id": i, "payload": payload, "width": w,
                     "height": h, "mime": "image/jpeg",
                     "_truth": decode_jpeg(payload)})
    ds = rd.from_pandas(pd.DataFrame(
        [{k: v for k, v in r.items() if k != "_truth"} for r in rows]))
    out = stateful_map(ds, multimodal.DecodeImage, (False,),
                       batch_format="pandas").to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    for i, r in enumerate(rows):
        shape = tuple(out.loc[i, "shape"])
        assert shape == r["_truth"].shape
        assert np.array_equal(
            np.asarray(out.loc[i, "pixels"], dtype=np.uint8)
            .reshape(shape), r["_truth"])
    feats = multimodal.image_features(multimodal.resize_images(
        stateful_map(ds, multimodal.DecodeImage, (False,),
                     batch_format="pandas"), out_w=4, out_h=4)).to_pandas()
    assert len(feats) == 3 and all(len(f) == 14 for f in feats["features"])


def test_y4m_codec():
    """Y4M round-trip: luma encode -> frame-indexed decode identity,
    sampled offsets equal the full decode, and error paths."""
    from aml_entity_resolution_assignment_ray.ops import codec

    rng = np.random.RandomState(41)
    frames = [rng.randint(0, 256, (6, 8)).astype(np.uint8)
              for _ in range(7)]
    payload = codec.encode_y4m(frames)
    w, h, n, hdr, block = codec.y4m_info(payload)
    assert (w, h, n) == (8, 6, 7)
    full = codec.decode_y4m_frames(payload, range(7))
    for f, got in zip(frames, full):
        assert np.array_equal(got, np.repeat(f[:, :, None], 3, axis=2))
    # sampling never touches skipped frames: indexed == full subset
    sub = codec.decode_y4m_frames(payload, [0, 3, 6])
    for i, got in zip([0, 3, 6], sub):
        assert np.array_equal(got, full[i])

    with pytest.raises(ValueError, match="YUV4MPEG2"):
        codec.y4m_info(b"RIFFnope")
    with pytest.raises(ValueError, match="truncated"):
        codec.y4m_info(payload[:-3])
    with pytest.raises(IndexError):
        codec.decode_y4m_frames(payload, [7])
    with pytest.raises(NotImplementedError, match="C422"):
        codec.y4m_info(b"YUV4MPEG2 W2 H2 F25:1 C422\n")
    with pytest.raises(ValueError, match="even"):
        codec.encode_y4m([np.zeros((3, 4), np.uint8)])


def test_video_pipeline_strict_y4m(ray_session):
    """Real Y4M bytes through the strict frame-sampling actor pool:
    sampled indices follow (i*n)//k and pixels equal the source luma."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops import codec

    table = multimodal.make_video_table(n=6)
    frames = multimodal.sample_frames(rd.from_arrow(table), k=3,
                                      fake=False).to_pandas()
    meta = table.to_pandas().set_index("media_id")
    for mid, g in frames.groupby("media_id"):
        nf = int(meta.loc[mid, "n_frames"])
        k = min(3, nf)
        assert sorted(g["frame_idx"]) == [(i * nf) // k for i in range(k)]
        truth = codec.decode_y4m_frames(
            bytes(meta.loc[mid, "payload"]), sorted(g["frame_idx"]))
        g = g.sort_values("frame_idx")
        for (_, row), t in zip(g.iterrows(), truth):
            assert np.array_equal(
                np.asarray(row["pixels"], dtype=np.uint8), t.reshape(-1))
    # motion signal: k-1 rows per video, first frame emits nothing,
    # values equal the scalar pairwise diff of the decoded luma
    motion = multimodal.frame_motion(
        multimodal.sample_frames(rd.from_arrow(table), k=3, fake=False)
    ).to_pandas()
    assert (motion.groupby("media_id").size() == 2).all()
    mid = motion["media_id"].iloc[0]
    nf = int(meta.loc[mid, "n_frames"])
    idxs = [(i * nf) // 3 for i in range(3)]
    dec = codec.decode_y4m_frames(bytes(meta.loc[mid, "payload"]), idxs)
    row = motion[(motion["media_id"] == mid)
                 & (motion["frame_idx"] == idxs[1])].iloc[0]
    d = np.abs(dec[1].astype(np.int64) - dec[0].astype(np.int64))
    assert abs(row["mean_abs_diff"] - round(d.sum() / d.size, 6)) < 1e-9

    # strict mode on an unsupported container raises
    mp4 = rd.from_arrow(pa.table({
        "media_id": ["x"], "mime": ["video/mp4"],
        "payload": pa.array([b"\x00\x00\x00 ftypisom"], pa.binary()),
        "width": pa.array([4], pa.int32()),
        "height": pa.array([4], pa.int32()),
        "n_frames": pa.array([2], pa.int32()),
    }))
    with pytest.raises(Exception, match="video codec"):
        multimodal.sample_frames(mp4, k=2, fake=False).to_pandas()


def test_wav_codec_roundtrip():
    """In-repo RIFF/PCM WAV codec: encode -> decode is the identity for
    mono/stereo 16-bit; hand-built 8-bit and out-of-order-chunk payloads
    decode correctly; malformed payloads raise."""
    from aml_entity_resolution_assignment_ray.ops import codec

    rng = np.random.RandomState(13)
    for frames, ch, rate in [(1, 1, 8000), (7, 2, 16000), (500, 1, 22050)]:
        arr = rng.randint(-32768, 32768, (frames, ch)).astype(np.int16)
        got, r = codec.decode_wav(codec.encode_wav(arr, rate))
        assert r == rate and np.array_equal(got, arr)

    # 8-bit unsigned PCM recenters to int16 ((x - 128) << 8)
    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (8).to_bytes(2, "little"))
    data = bytes([0, 128, 255])
    body = (b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data)
    wav8 = b"RIFF" + len(body).to_bytes(4, "little") + body
    got, r = codec.decode_wav(wav8)
    assert r == 8000
    assert got.reshape(-1).tolist() == [-32768, 0, 32512]

    # extra chunk before fmt/data (LIST), odd-length padding honored
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc\x00"
    body2 = (b"WAVE" + extra + b"fmt "
             + len(fmt).to_bytes(4, "little") + fmt
             + b"data" + len(data).to_bytes(4, "little") + data)
    wav_l = b"RIFF" + len(body2).to_bytes(4, "little") + body2
    got2, _ = codec.decode_wav(wav_l)
    assert np.array_equal(got2, got)

    with pytest.raises(ValueError, match="RIFF"):
        codec.decode_wav(b"nope")
    with pytest.raises(ValueError, match="missing fmt"):
        codec.decode_wav(b"RIFF" + (4).to_bytes(4, "little") + b"WAVE")


def test_audio_pipeline_strict_wav(ray_session):
    """DecodeAudio(fake=False) REALLY decodes WAV payloads through the
    actor pool, AudioFeatures agrees with a direct per-row reference,
    and unsupported mimes stay honestly stubbed."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops import codec

    tbl = multimodal.make_audio_table(n=9, seed=3, max_frames=400)
    decoded = multimodal.decode_audio(rd.from_arrow(tbl), fake=False)
    feats = multimodal.audio_features(decoded).to_pandas() \
        .set_index("media_id")
    src = tbl.to_pandas().set_index("media_id")
    assert len(feats) == 9
    for mid, row in src.iterrows():
        arr, rate = codec.decode_wav(bytes(row["payload"]))
        s = arr.reshape(-1).astype(np.int64)
        f = feats.loc[mid]
        assert f["n_samples"] == arr.shape[0]
        assert f["channels"] == arr.shape[1]
        assert f["sample_rate"] == rate
        assert f["duration_sec"] == arr.shape[0] / rate
        assert f["mean_amp"] == s.sum() / len(s) / 32768.0
        assert f["rms"] == np.sqrt((s * s).sum() / len(s)) / 32768.0
        assert f["peak"] == np.abs(s).max() / 32768.0
        c0 = arr[:, 0] >= 0
        assert f["zero_crossings"] == int((c0[1:] != c0[:-1]).sum())

    # fake mode honors the sidecar layout columns
    fake = multimodal.audio_features(
        multimodal.decode_audio(rd.from_arrow(tbl), fake=True)).to_pandas()
    assert sorted(fake.columns) == sorted(feats.reset_index().columns)
    assert fake["n_samples"].tolist() == src["n_samples"].tolist()

    # compressed mimes raise in strict mode
    bad = pa.table({
        "media_id": pa.array(["x"]), "mime": pa.array(["audio/mpeg"]),
        "payload": pa.array([b"\xff\xfb"], pa.binary()),
        "sample_rate": pa.array([44100], pa.int32()),
        "n_samples": pa.array([10], pa.int32()),
        "channels": pa.array([1], pa.int32()),
    })
    with pytest.raises(Exception, match="no in-repo codec"):
        multimodal.decode_audio(rd.from_arrow(bad), fake=False).materialize()


def test_audio_frame_energy(ray_session):
    """Per-frame RMS over channel 0: agrees with a direct reference,
    drops the sub-frame tail, and skips docs shorter than one frame."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops import codec

    rng = np.random.RandomState(17)
    specs = [(700, 1, 8000), (520, 2, 16000), (100, 1, 8000)]  # last: 0 frames
    arrs = [rng.randint(-32768, 32768, (f, c)).astype(np.int16)
            for f, c, _ in specs]
    tbl = pa.table({
        "media_id": pa.array([f"w{i}" for i in range(3)]),
        "mime": pa.array(["audio/wav"] * 3),
        "payload": pa.array([codec.encode_wav(a, r)
                             for a, (_, _, r) in zip(arrs, specs)],
                            pa.binary()),
        "sample_rate": pa.array([r for _, _, r in specs], pa.int32()),
        "n_samples": pa.array([f for f, _, _ in specs], pa.int32()),
        "channels": pa.array([c for _, c, _ in specs], pa.int32()),
    })
    out = multimodal.audio_frame_energy(
        multimodal.decode_audio(rd.from_arrow(tbl), fake=False),
        frame=256).to_pandas()
    assert set(out["media_id"]) == {"w0", "w1"}  # w2 has no full frame
    for i, (f, c, _) in enumerate(specs[:2]):
        got = out[out["media_id"] == f"w{i}"].sort_values("frame_idx")
        nf = f // 256
        assert got["frame_idx"].tolist() == list(range(nf))
        c0 = arrs[i][:, 0].astype(np.int64)
        for fi in range(nf):
            seg = c0[fi * 256:(fi + 1) * 256]
            assert got["frame_rms"].iloc[fi] == \
                np.sqrt((seg * seg).sum() / 256) / 32768.0


def test_image_features_scalar_reference():
    """Vectorized shape-grouped resize + integer-exact features agree
    with a direct per-row reference on a mixed-shape batch."""
    rng = np.random.RandomState(3)
    shapes = [(5, 7), (4, 4), (5, 7)]
    df = pd.DataFrame({
        "media_id": [f"m{i}" for i in range(3)],
        "pixels": [rng.randint(0, 256, h * w * 3).astype(np.uint8)
                   for h, w in shapes],
        "shape": [[h, w, 3] for h, w in shapes],
    })
    rz = multimodal.ResizeImage(out_w=3, out_h=2)(df)
    for i, (h, w) in enumerate(shapes):
        arr = np.asarray(df["pixels"][i], dtype=np.uint8).reshape(h, w, 3)
        yi = (np.arange(2) * h) // 2
        xi = (np.arange(3) * w) // 3
        assert np.array_equal(np.asarray(rz["pixels"][i]),
                              arr[yi][:, xi].reshape(-1))

    ft = multimodal.ImageFeatures(as_columns=True)(rz)
    arr0 = np.asarray(rz["pixels"][0], dtype=np.int64).reshape(2, 3, 3)
    assert ft["mean_g"][0] == (arr0[:, :, 1].sum() / 6) / 255.0
    m = arr0[:, :, 2].sum() / 6
    assert np.isclose(ft["std_b"][0],
                      np.sqrt(arr0[:, :, 2].astype(float).std() ** 2) / 255.0,
                      atol=1e-12)
    bins = arr0.sum(axis=2).reshape(-1) // 96
    assert ft["h0"][0] == (bins == 0).sum() / 6
    # vector mode carries the same values as float32
    vec = multimodal.ImageFeatures()(rz)
    assert np.allclose(np.asarray(vec["features"][0], dtype=np.float64),
                       ft[multimodal.ImageFeatures.FEATURE_COLS]
                       .iloc[0].to_numpy(), atol=1e-6)


def test_media_decode_strict_raises(ray_session):
    import ray.data as rd

    media = rd.from_arrow(multimodal.make_fake_media_table(n=3))
    with pytest.raises(Exception):  # NotImplementedError inside UDF
        multimodal.decode_images(media, fake=False).materialize()


def test_pii_scrub_batch():
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["mail me at john.doe+x@mail.example.com today",
                 "call +48 123 456 789 or 555-123-4567 now",
                 "nid 123456789012 ok, short 1234 stays",
                 None],
    })
    out = text.pii_scrub_batch(df)
    assert out["clean_text"].tolist() == [
        "mail me at <EMAIL> today",
        "call <PHONE> or <PHONE> now",
        "nid <ID> ok, short 1234 stays",
        "",
    ]


def test_chunk_documents(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["one two three four five six seven",
                 "a",
                 "",
                 None,
                 "  x  y\tz  "],          # hostile whitespace
    })
    ds = rd.from_pandas(docs).repartition(3)
    # non-overlapping: reassembling chunks in order rebuilds the
    # normalized token stream exactly
    out = text.chunk_documents(ds, size=3).to_pandas()
    g = out.sort_values(["doc_id", "chunk_idx"]) \
        .groupby("doc_id")["chunk_text"].agg(" ".join)
    assert g[0] == "one two three four five six seven"
    assert g[4] == "x y z"
    assert set(out["doc_id"]) == {0, 1, 4}      # empty/null docs drop
    assert out[out["doc_id"] == 0]["n_tokens"].tolist() == [3, 3, 1]

    # overlap: starts step by stride, windows clipped at the doc end
    ov = text.chunk_documents(ds, size=3, stride=2).to_pandas()
    d0 = ov[ov["doc_id"] == 0].sort_values("chunk_idx")
    assert d0["chunk_text"].tolist() == [
        "one two three", "three four five", "five six seven", "seven"]
    with pytest.raises(ValueError):
        text.chunk_documents(ds, size=0)


def test_chunk_documents_properties(ray_session):
    """Property sweep: random unicode/hostile-whitespace docs, every
    size/stride regime (overlap, exact, gapped) against a scalar
    replay of the windowing contract."""
    import re as _re

    import ray.data as rd
    from hypothesis import given, settings, strategies as st

    from aml_entity_resolution_assignment_ray.ops.text import _WS_DISAGREE_RE

    ws = _re.compile(r"\s+")

    def replay(texts, size, stride):
        exp = []
        for i, t in enumerate(texts):
            t = _WS_DISAGREE_RE.sub(" ", t or "").strip()
            if not t:
                continue
            toks = ws.split(t)
            for k, s in enumerate(range(0, len(toks), stride)):
                exp.append((i, k, " ".join(toks[s:s + size]),
                            min(s + size, len(toks)) - s))
        return exp

    @settings(max_examples=8, deadline=None)
    @given(
        texts=st.lists(st.text(alphabet="ab ✓\t\n\x0b", max_size=20),
                       min_size=1, max_size=15),
        size=st.sampled_from([1, 2, 4]),
        stride=st.sampled_from([1, 2, 4]),
    )
    def check(texts, size, stride):
        df = pd.DataFrame({
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
        })
        out = text.chunk_documents(rd.from_pandas(df).repartition(2),
                                   size=size, stride=stride).to_pandas()
        exp = replay(texts, size, stride)
        if not len(out):
            assert not exp
            return
        got = [(int(r.doc_id), int(r.chunk_idx), r.chunk_text,
                int(r.n_tokens))
               for r in out.sort_values(["doc_id", "chunk_idx"])
               .itertuples(index=False)]
        assert got == exp

    check()


def test_sessionize_gaps(ray_session):
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.events import sessionize

    base = pd.Timestamp("2024-01-01")
    rows = pd.DataFrame({
        "event_id": [0, 1, 2, 3, 4, 5],
        "user_id": [7, 7, 7, 9, 9, 7],
        "ts": [base, base + pd.Timedelta(minutes=10),
               base + pd.Timedelta(minutes=50),      # >30min gap -> new sess
               base, base + pd.Timedelta(hours=2),   # user 9: gap -> new sess
               base + pd.Timedelta(minutes=55)],     # user 7, 5min after e2
    })
    out = sessionize(rd.from_pandas(rows), gap_s=1800, cfg=CFG) \
        .to_pandas().set_index("event_id")["session_id"]
    assert out[0] == "7:0" and out[1] == "7:0"
    assert out[2] == "7:1" and out[5] == "7:1"
    assert out[3] == "9:0" and out[4] == "9:1"


def test_sessionize_paths_agree(ray_session):
    """Gather path == keyed-shuffle path on random events."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.events import sessionize

    rng = np.random.RandomState(3)
    n = 3000
    rows = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.randint(0, 40, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 7 * 86400, n), unit="s"),
    })
    ds = rd.from_pandas(rows)
    small = sessionize(ds, gap_s=1800, cfg=CFG, n_rows=n).to_pandas()
    big = sessionize(ds, gap_s=1800,
                     cfg=EngineConfig(model_path="", join_num_partitions=4,
                                      gather_max_keys=0),
                     n_rows=n).to_pandas()
    s = small.sort_values("event_id").reset_index(drop=True)
    b = big.sort_values("event_id").reset_index(drop=True)
    assert (s["session_id"].to_numpy() == b["session_id"].to_numpy()).all()


def test_train_bpe_merges(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({
        "text": ["the the theme", "then there the", "aaa bb aaa"]})
    res = text.train_bpe_merges(rd.from_pandas(docs).repartition(2),
                                n_merges=5)
    # hand-derived: h-e ties t-h at 6 and wins lexicographically; after
    # 'a a' merges left-to-right each 'aaa' becomes 'aa a'; the merged
    # 'aaa' unit then yields no pairs so 'b b' (1) is next
    assert res[["a", "b", "pair_count"]].values.tolist() == [
        ["h", "e", 6], ["t", "he", 6], ["a", "a", 4],
        ["aa", "a", 2], ["b", "b", 1]]
    assert res["rank"].tolist() == [1, 2, 3, 4, 5]

    # early stop: every pretoken is a single symbol after 2 merges
    tiny = rd.from_pandas(pd.DataFrame({"text": ["ab ab", "ab"]}))
    res2 = text.train_bpe_merges(tiny, n_merges=10)
    assert res2[["a", "b"]].values.tolist() == [["a", "b"]]

    # empty corpus -> empty merge table with the right schema
    res3 = text.train_bpe_merges(
        rd.from_pandas(pd.DataFrame({"text": ["", None]})), n_merges=3)
    assert len(res3) == 0
    assert list(res3.columns) == ["rank", "a", "b", "pair_count"]


def test_top_terms_combiner(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({"text": ["the cat sat", "the cat ran", "a dog!",
                                  None, "THE Cat 9 lives 9"]})
    out = text.top_terms(rd.from_pandas(docs), k=3).to_pandas()
    assert out["word"].tolist() == ["cat", "the", "9"]
    assert out["cnt"].tolist() == [3, 3, 2]


def test_doc_tfidf(ray_session):
    """doc_tfidf matches a brute-force pandas tf-idf oracle (score =
    tf * ln(N/df), top-5 per doc, ties by word)."""
    import re

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.config import EngineConfig
    from aml_entity_resolution_assignment_ray.ops.text import doc_tfidf

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(40)]
    docs = pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, size=rng.randint(5, 30)))
                 for _ in range(60)],
    })
    got = doc_tfidf(rd.from_pandas(docs), k=5,
                    cfg=EngineConfig(join_num_partitions=4)).to_pandas()

    tok = re.compile(r"[a-z0-9]+")
    rows = []
    for _, r in docs.iterrows():
        words = pd.Series(tok.findall(r["text"].lower()))
        for w, tf in words.value_counts().items():
            rows.append((r["doc_id"], w, int(tf)))
    tf = pd.DataFrame(rows, columns=["doc_id", "word", "tf"])
    df_ = tf.groupby("word")["doc_id"].nunique().rename("df").reset_index()
    sc = tf.merge(df_, on="word")
    sc["score"] = sc["tf"].astype(float) * np.log(60.0 / sc["df"].to_numpy(dtype=float))
    exp = (sc.sort_values(["doc_id", "score", "word"],
                          ascending=[True, False, True], kind="stable")
           .groupby("doc_id").head(5)[["doc_id", "word", "score"]]
           .reset_index(drop=True))
    got = got.sort_values(["doc_id", "score", "word"],
                          ascending=[True, False, True],
                          kind="stable").reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    assert (got["word"].to_numpy() == exp["word"].to_numpy()).all()
    assert np.allclose(got["score"], exp["score"], rtol=0, atol=0)


def test_hash_split_deterministic(ray_session):
    """hash_split / hash_bucket: reproducible across repartitionings,
    correct fraction semantics, string-id path matches the scalar
    polynomial hash."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.sample import (
        hash_bucket, hash_split)

    df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
    a = hash_split(rd.from_pandas(df), "doc_id").to_pandas()
    b = hash_split(rd.from_pandas(df).repartition(7), "doc_id").to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    frac = (a["split"] == "test").mean()
    assert 0.1 < frac < 0.3

    sdf = pd.DataFrame({"k": [f"conv_{i}" for i in range(200)]})

    def scalar(s):
        h = 0
        for ch in s:
            h = (h * 1000003 + ord(ch)) & 0xFFFFFFFF
        return h % 10

    got = (hash_bucket(rd.from_pandas(sdf), "k", n_buckets=10).to_pandas()
           .sort_values("k").reset_index(drop=True))
    exp = sdf.sort_values("k").reset_index(drop=True)["k"].map(scalar)
    assert (got["bucket"].to_numpy() == exp.to_numpy()).all()


def test_hash_bucket_dtype_normalization(ray_session):
    """The same logical integer id buckets identically whatever the
    physical dtype (int64 / object-of-int / integral float64); true
    floats and strings fall to the string path instead of silently
    truncating."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.sample import hash_bucket

    ids = list(range(50))

    def buckets(series):
        df = pd.DataFrame({"k": series})
        return hash_bucket(rd.from_pandas(df), "k",
                           n_buckets=10).to_pandas()["k"], \
            hash_bucket(rd.from_pandas(df), "k",
                        n_buckets=10).to_pandas()["bucket"].tolist()

    _, b_int = buckets(pd.Series(ids, dtype=np.int64))
    _, b_obj = buckets(pd.Series(ids, dtype=object))
    _, b_flt = buckets(pd.Series([float(i) for i in ids]))
    assert b_int == b_obj == b_flt

    # non-integral floats do NOT truncate to the int path
    _, b_true_float = buckets(pd.Series([i + 0.5 for i in ids]))
    assert b_true_float != b_int


def test_hash_bucket_block_boundary_independent(ray_session):
    """A value's bucket is a pure function of the value, never of its
    batchmates: an all-digit string like '123' buckets via the STRING
    path even in an all-numeric-string batch, and a mixed float column
    buckets identically however Ray splits it into blocks."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.sample import (
        _bucket_strs, hash_bucket)

    # numeric strings: same bucket whether batched alone, with other
    # numeric strings, or with a non-numeric batchmate
    pure = pd.DataFrame({"k": ["123", "456", "789"]})
    mixed = pd.DataFrame({"k": ["123", "456", "789", "abc", None]})
    bp = (hash_bucket(rd.from_pandas(pure), "k", n_buckets=10)
          .to_pandas().set_index("k")["bucket"])
    bm = (hash_bucket(rd.from_pandas(mixed), "k", n_buckets=10)
          .to_pandas().dropna(subset=["k"]).set_index("k")["bucket"])
    for k in ["123", "456", "789"]:
        assert bp[k] == bm[k]
    # and both equal the string-polynomial hash, NOT the int hash
    assert bp["123"] == _bucket_strs(["123"], 10)[0]

    # mixed integral/fractional float column: invariant under block
    # boundaries (single block vs 5-way repartition)
    fdf = pd.DataFrame({"k": [1.0, 2.5, 3.0, 4.25, 5.0] * 4,
                        "i": list(range(20))})
    one = (hash_bucket(rd.from_pandas(fdf), "k", n_buckets=10)
           .to_pandas().sort_values("i")["bucket"].tolist())
    many = (hash_bucket(rd.from_pandas(fdf).repartition(5), "k",
                        n_buckets=10)
            .to_pandas().sort_values("i")["bucket"].tolist())
    assert one == many
    # integral floats joined the int path, fractional ones the str path
    from aml_entity_resolution_assignment_ray.ops.sample import _bucket_ints
    assert one[0] == _bucket_ints(np.array([1], dtype=np.int64), 10)[0]
    assert one[1] == _bucket_strs([str(2.5)], 10)[0]


def test_stratified_sample(ray_session):
    """k smallest-hash rows per group, deterministic across
    repartitionings, ranks 1..k."""
    import ray.data as rd
    from aml_entity_resolution_assignment_ray.ops.sample import stratified_sample

    df = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64),
        "lang": ["en", "de", "fr", "es"] * 50,
    })
    out = stratified_sample(rd.from_pandas(df), group_col="lang",
                            id_col="doc_id", k=5, with_rank=True) \
        .to_pandas().sort_values(["lang", "rank"]).reset_index(drop=True)
    assert (out.groupby("lang").size() == 5).all()
    assert out.groupby("lang")["rank"].apply(
        lambda s: s.tolist() == [1, 2, 3, 4, 5]).all()

    # repartition-invariant (combiner correctness across block splits)
    out2 = stratified_sample(rd.from_pandas(df).repartition(7),
                             group_col="lang", id_col="doc_id", k=5,
                             with_rank=True) \
        .to_pandas().sort_values(["lang", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)

    # matches the explicit pandas replay of the hash-rank definition
    from aml_entity_resolution_assignment_ray.ops.sample import _hash_ints
    df["_h"] = _hash_ints(df["doc_id"].to_numpy()).astype(np.int64)
    exp = (df.sort_values(["_h", "doc_id"]).groupby("lang").head(5)
           .sort_values(["lang", "_h"])["doc_id"].tolist())
    assert out.sort_values(["lang", "rank"])["doc_id"].tolist() == exp


def test_pack_sequences(ray_session):
    """Within each shard, docs tile the concatenated stream exactly:
    offsets are contiguous in (hash, id) order, seq boundaries at
    multiples of seq_len."""
    import ray.data as rd
    from aml_entity_resolution_assignment_ray.ops.sample import (
        pack_sequences, _hash_ints)

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "n_tok": rng.randint(1, 700, size=300).astype(np.int64),
    })
    out = pack_sequences(rd.from_pandas(df), id_col="doc_id",
                         len_col="n_tok", seq_len=512, n_shards=4) \
        .to_pandas()
    assert set(out.columns) == {"doc_id", "n_tok", "shard", "seq_id",
                                "seq_offset"}
    out["_h"] = _hash_ints(out["doc_id"].to_numpy()).astype(np.int64)
    for shard, g in out.groupby("shard"):
        g = g.sort_values(["_h", "doc_id"])
        starts = (g["seq_id"].to_numpy() * 512 + g["seq_offset"].to_numpy())
        # doc k starts exactly where doc k-1 ended
        assert starts[0] == 0
        assert (starts[1:] == starts[:-1] + g["n_tok"].to_numpy()[:-1]).all()
    # shard assignment is hash mod n_shards
    assert (out["shard"].to_numpy()
            == (out["_h"].to_numpy() % 4)).all()

    # repartition-invariant
    out2 = pack_sequences(rd.from_pandas(df).repartition(9),
                          id_col="doc_id", len_col="n_tok", seq_len=512,
                          n_shards=4).to_pandas()
    a = out.drop(columns=["_h"]).sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_bigram_lm_score_paths_agree(ray_session):
    """Hand-checked add-one bigram LM scores; broadcast and join paths
    agree bit-exactly."""
    import ray.data as rd

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["a b", "a b", "a c", "x", "", "b a b a"],
    })
    # bc: (a,b)->3 [doc5 has 'b a','a b','b a'... recompute below],
    # hand numbers asserted per doc0/doc2
    bcast = text.bigram_lm_score(
        rd.from_pandas(docs), cfg=EngineConfig(
            model_path="", join_num_partitions=4,
            broadcast_max_rows=10_000)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    joined = text.bigram_lm_score(
        rd.from_pandas(docs).repartition(3), cfg=EngineConfig(
            model_path="", join_num_partitions=4, broadcast_max_rows=0)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(bcast, joined)

    # docs 3 ('x') and 4 ('') have no bigram -> absent
    assert bcast["doc_id"].tolist() == [0, 1, 2, 5]
    # corpus: bigrams (a,b)x2 + doc5's (b,a)x2,(a,b)x1 -> C(a,b)=3,
    # C(b,a)=2, C(a,c)=1; contexts C(a)=4, C(b)=2; V=|{a,b,c}|=3
    row0 = bcast[bcast["doc_id"] == 0].iloc[0]
    assert row0["n_bigrams"] == 1
    assert np.isclose(row0["avg_logp"], np.log((3 + 1) / (4 + 3.0)))
    row2 = bcast[bcast["doc_id"] == 2].iloc[0]
    assert np.isclose(row2["avg_logp"], np.log((1 + 1) / (4 + 3.0)))
    row5 = bcast[bcast["doc_id"] == 5].iloc[0]
    assert row5["n_bigrams"] == 3
    exp5 = (np.log((3 + 1) / (4 + 3.0))
            + 2 * np.log((2 + 1) / (2 + 3.0))) / 3.0
    assert np.isclose(row5["avg_logp"], exp5)


def test_kmv_distinct(ray_session):
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.sketch import kmv_distinct

    rng = np.random.RandomState(17)
    df = pd.DataFrame({
        "k": np.repeat(["big", "small"], 6000),
        # big: ~3000 distinct users; small: exactly 10 (below k -> exact)
        "u": np.concatenate([rng.randint(0, 3000, 6000),
                             np.arange(10).repeat(600)]).astype(np.int64),
    })
    truth = df.groupby("k")["u"].nunique()
    res = kmv_distinct(rd.from_pandas(df).repartition(7), key="k",
                       col="u", k=64, cfg=CFG).to_pandas() \
        .set_index("k")["approx_distinct"]
    assert res["small"] == truth["small"]            # < k -> exact
    rel = abs(res["big"] - truth["big"]) / truth["big"]
    assert rel < 4 / np.sqrt(62)                     # ~4 std errors

    # repartition-invariant: the estimate is a pure function of the
    # value set, not of block boundaries
    res2 = kmv_distinct(rd.from_pandas(df).repartition(31), key="k",
                        col="u", k=64, cfg=CFG).to_pandas() \
        .set_index("k")["approx_distinct"]
    assert (res.sort_index() == res2.sort_index()).all()

    with pytest.raises(ValueError):
        kmv_distinct(rd.from_pandas(df), key="k", col="u", k=1)


def test_hll_distinct(ray_session):
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.sketch import hll_distinct

    rng = np.random.RandomState(23)
    df = pd.DataFrame({
        "k": np.repeat(["big", "tiny"], 8000),
        # big: ~4000 distinct (raw-estimate branch); tiny: 7 distinct
        # (linear-counting branch: raw <= 2.5*m with empty registers)
        "u": np.concatenate([rng.randint(0, 4000, 8000),
                             np.arange(7).repeat(8000 // 7 + 1)[:8000]])
        .astype(np.int64),
    })
    truth = df.groupby("k")["u"].nunique()
    res = hll_distinct(rd.from_pandas(df).repartition(7), key="k",
                       col="u", p=6, cfg=CFG).to_pandas() \
        .set_index("k")["approx_distinct"]
    # ~1.04/sqrt(64) = 13% rse; allow 4 sigma on the raw branch and
    # generous absolute slack on the tiny linear-counting group
    assert abs(res["big"] - truth["big"]) / truth["big"] < 4 * 1.04 / 8
    assert abs(res["tiny"] - truth["tiny"]) <= 3

    # repartition-invariant: registers are maxima over a pure function
    # of the value set, so block boundaries cannot move the estimate
    res2 = hll_distinct(rd.from_pandas(df).repartition(31), key="k",
                        col="u", p=6, cfg=CFG).to_pandas() \
        .set_index("k")["approx_distinct"]
    assert (res.sort_index() == res2.sort_index()).all()

    with pytest.raises(ValueError):
        hll_distinct(rd.from_pandas(df), key="k", col="u", p=3)
    with pytest.raises(ValueError):
        hll_distinct(rd.from_pandas(df), key="k", col="u", p=8)


def test_hll_rank_bitlen():
    from aml_entity_resolution_assignment_ray.ops.sketch import _hll_rank

    w = np.array([0, 1, 2, 3, 4, (1 << 25) - 1, 1 << 25, (1 << 26) - 1],
                 dtype=np.int64)
    # rank = 26 + 1 - bitlen(w)
    want = np.array([27, 26, 25, 25, 24, 2, 1, 1], dtype=np.int64)
    assert (_hll_rank(w, 26) == want).all()


def test_kmv_overlap(ray_session):
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.sketch import kmv_overlap

    a = pd.DataFrame({"v": np.arange(0, 5000, dtype=np.int64)})
    b = pd.DataFrame({"v": np.arange(2500, 7500, dtype=np.int64)})
    res = kmv_overlap(rd.from_pandas(a).repartition(5),
                      rd.from_pandas(b).repartition(3), col="v", k=256) \
        .iloc[0]
    tol = 4 / np.sqrt(254)                       # ~4 relative std errors
    assert abs(res["est_distinct_a"] - 5000) < 5000 * tol
    assert abs(res["est_union"] - 7500) < 7500 * tol
    assert abs(res["jaccard"] - 1 / 3) < (1 / 3) * 2 * tol
    assert abs(res["est_intersection"] - 2500) < 2500 * 3 * tol

    # pure function of the value sets: block layout can't change it
    res2 = kmv_overlap(rd.from_pandas(a).repartition(17),
                       rd.from_pandas(b), col="v", k=256).iloc[0]
    assert (res == res2).all()

    # disjoint sets -> zero intersection exactly
    c = pd.DataFrame({"v": np.arange(90000, 95000, dtype=np.int64)})
    z = kmv_overlap(rd.from_pandas(a), rd.from_pandas(c),
                    col="v", k=256).iloc[0]
    assert z["est_intersection"] == 0 and z["jaccard"] == 0.0


def test_kmv_quantiles(ray_session):
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.sketch import kmv_quantiles

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "id": np.arange(12000, dtype=np.int64),
        "k": np.repeat(["big", "small"], 6000),
        "v": np.concatenate([
            rng.uniform(0, 1000, 6000),          # big: continuous domain
            np.arange(6000, dtype=np.float64)]),  # small: known ranks
    })
    # small group but m >= n: the "sample" is the whole group, so the
    # discrete quantiles are EXACT
    tiny = df.head(100).assign(k="tiny")
    both = pd.concat([df, tiny], ignore_index=True)
    res = kmv_quantiles(rd.from_pandas(both).repartition(9), key="k",
                        col="v", id_col="id", qs=[0.5, 0.9], m=256,
                        cfg=CFG).to_pandas()
    t = res[res["k"] == "tiny"].set_index("q")["value"]
    vt = np.sort(tiny["v"].to_numpy())
    assert t[0.5] == vt[int(np.ceil(0.5 * 100)) - 1]
    assert t[0.9] == vt[int(np.ceil(0.9 * 100)) - 1]

    # rank error on the big uniform group: ~4 std errors of q(1-q)/m
    big = res[res["k"] == "big"].set_index("q")["value"]
    assert abs(big[0.5] - 500.0) < 1000 * 4 * np.sqrt(0.25 / 256)
    assert abs(big[0.9] - 900.0) < 1000 * 4 * np.sqrt(0.09 / 256)

    # pure function of the row set: block layout can't change it, and
    # per-(block,key) state is bounded by m rows
    res2 = kmv_quantiles(rd.from_pandas(both).repartition(37), key="k",
                         col="v", id_col="id", qs=[0.5, 0.9], m=256,
                         cfg=CFG).to_pandas()
    a = res.sort_values(["k", "q"]).reset_index(drop=True)
    b = res2.sort_values(["k", "q"]).reset_index(drop=True)
    assert (a == b).all().all()

    # nulls excluded, like SQL aggregates
    wn = both.copy()
    wn.loc[wn["k"] == "tiny", "v"] = np.nan
    res3 = kmv_quantiles(rd.from_pandas(wn), key="k", col="v",
                         id_col="id", qs=[0.5], m=64, cfg=CFG).to_pandas()
    assert "tiny" not in set(res3["k"])

    with pytest.raises(ValueError):
        kmv_quantiles(rd.from_pandas(both), key="k", col="v",
                      id_col="id", qs=[0.5], m=0)


def test_source_mixture_weights(ray_session):
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.sample import (
        source_mixture_weights,
    )

    ds = rd.from_arrow(pa.table({
        "source": ["web", "web", "books", "code", "code"],
        "text": ["a b c d", "e f", None, "one two three", ""],
    }))
    # uniform target: 3 sources, shares 6/9, 0/9, 3/9
    out = source_mixture_weights(ds).to_pandas() \
        .set_index("source").sort_index()
    assert out.loc["web", "n_docs"] == 2
    assert out.loc["web", "n_tokens"] == 6
    assert out.loc["books", "n_tokens"] == 0
    assert out.loc["code", "n_tokens"] == 3
    assert abs(out.loc["web", "token_share"] - round(6 / 9, 6)) < 1e-12
    assert abs(out.loc["web", "weight"] - round((1 / 3) / (6 / 9), 6)) < 1e-12
    assert out.loc["books", "weight"] == 0.0   # zero tokens -> weight 0

    # explicit target: sources missing from the target get weight 0
    tgt = source_mixture_weights(
        ds, target={"web": 0.9, "books": 0.1}).to_pandas() \
        .set_index("source")
    assert abs(tgt.loc["web", "weight"] - round(0.9 / (6 / 9), 6)) < 1e-12
    assert tgt.loc["code", "weight"] == 0.0


def test_shuffle_index(ray_session):
    """Every shard's positions are exactly 0..len(shard)-1 and the
    address is repartition-invariant."""
    import ray.data as rd
    from aml_entity_resolution_assignment_ray.ops.sample import shuffle_index

    df = pd.DataFrame({"doc_id": np.arange(150, dtype=np.int64)})
    out = shuffle_index(rd.from_pandas(df), id_col="doc_id", n_shards=4) \
        .to_pandas()
    assert len(out) == 150
    for _, g in out.groupby("shard"):
        assert sorted(g["pos"].tolist()) == list(range(len(g)))
    out2 = shuffle_index(rd.from_pandas(df).repartition(6),
                         id_col="doc_id", n_shards=4).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True))


def test_incremental_exact_dedup(ray_session, tmp_path):
    """First-seen-wins ACROSS increments (even when a later increment
    carries a smaller id), min-id within one; empty increments append
    nothing; the index accumulates."""
    import ray.data as rd

    idx = str(tmp_path / "dedup_idx")
    inc1 = pd.DataFrame({"doc_id": np.array([10, 11, 12], dtype=np.int64),
                         "text": ["aaa", "bbb", "aaa"]})
    inc2 = pd.DataFrame({"doc_id": np.array([1, 2, 3], dtype=np.int64),
                         "text": ["aaa", "ccc", "ccc"]})
    s1 = dedup.incremental_exact_dedup(rd.from_pandas(inc1), idx, cfg=CFG) \
        .to_pandas().sort_values("text").reset_index(drop=True)
    assert s1["text"].tolist() == ["aaa", "bbb"]
    assert s1["doc_id"].tolist() == [10, 11]

    s2 = dedup.incremental_exact_dedup(rd.from_pandas(inc2), idx, cfg=CFG) \
        .to_pandas()
    # 'aaa' already seen (id 10 stays canonical despite the smaller 1);
    # 'ccc' is new, min id 2 wins within the increment
    assert s2["text"].tolist() == ["ccc"]
    assert s2["doc_id"].tolist() == [2]

    # an increment with nothing new appends no shard and returns empty
    s3 = dedup.incremental_exact_dedup(rd.from_pandas(inc1), idx, cfg=CFG)
    assert s3.count() == 0

    acc = dedup.read_dedup_index(idx).to_pandas() \
        .sort_values("text").reset_index(drop=True)
    assert acc["text"].tolist() == ["aaa", "bbb", "ccc"]
    assert acc["doc_id"].tolist() == [10, 11, 2]

    # forced shuffle path (broadcast gate zeroed) agrees
    idx2 = str(tmp_path / "dedup_idx2")
    cfg_j = EngineConfig(model_path="", join_num_partitions=4,
                         broadcast_max_rows=0, gather_max_keys=0)
    dedup.incremental_exact_dedup(rd.from_pandas(inc1), idx2, cfg=cfg_j)
    s2j = dedup.incremental_exact_dedup(rd.from_pandas(inc2), idx2,
                                        cfg=cfg_j).to_pandas()
    assert s2j["text"].tolist() == ["ccc"] and s2j["doc_id"].tolist() == [2]


def test_incremental_minhash_dedup(ray_session, tmp_path):
    """Near-dedup over continuous ingestion: within an increment the
    min-id member of each verified-pair component survives; across
    increments first-seen wins (a later near-copy of indexed content
    drops, transitively); re-ingesting seen content appends nothing;
    the forced shuffle/join path agrees with the broadcast path."""
    import ray.data as rd

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the green forest tonight")
    other = ("completely different content about distributed data "
             "processing engines with ray datasets")
    novel = ("a totally novel document with fresh words never seen "
             "before in this corpus anywhere")
    idx = str(tmp_path / "mh_idx")
    inc1 = pd.DataFrame({
        "doc_id": np.array([10, 11, 12], dtype=np.int64),
        "text": [base, base.replace("tonight", "tonite"), other]})
    inc2 = pd.DataFrame({
        "doc_id": np.array([20, 21, 22], dtype=np.int64),
        "text": [other.replace("engines", "engine"), novel,
                 novel + " ok"]})

    s1 = dedup.incremental_minhash_dedup(rd.from_pandas(inc1), idx,
                                         cfg=CFG).to_pandas()
    assert sorted(s1["doc"]) == ["10", "12"]      # 11 near-dups 10
    s2 = dedup.incremental_minhash_dedup(rd.from_pandas(inc2), idx,
                                         cfg=CFG).to_pandas()
    # 20 near-dups indexed 12; 22 near-dups 21 within the increment
    assert sorted(s2["doc"]) == ["21"]
    acc = dedup.read_minhash_index(idx).to_pandas()
    assert sorted(acc["doc"]) == ["10", "12", "21"]

    # same content under new ids: everything already seen, no shard
    s3 = dedup.incremental_minhash_dedup(
        rd.from_pandas(inc1.assign(
            doc_id=np.array([30, 31, 32], dtype=np.int64))), idx, cfg=CFG)
    assert s3.count() == 0
    assert sorted(dedup.read_minhash_index(idx).to_pandas()["doc"]) == \
        ["10", "12", "21"]

    # forced shuffle path (broadcast + gather gates zeroed) agrees
    idx2 = str(tmp_path / "mh_idx2")
    cfg_j = EngineConfig(model_path="", join_num_partitions=4,
                         broadcast_max_rows=0, gather_max_keys=0)
    dedup.incremental_minhash_dedup(rd.from_pandas(inc1), idx2, cfg=cfg_j)
    s2j = dedup.incremental_minhash_dedup(rd.from_pandas(inc2), idx2,
                                          cfg=cfg_j).to_pandas()
    assert sorted(s2j["doc"]) == ["21"]


def test_pack_sequence_texts(ray_session):
    """Materialized windows equal chunking each shard's concatenated
    stream; all but the last window per shard are full length."""
    import ray.data as rd
    from aml_entity_resolution_assignment_ray.ops.sample import (
        pack_sequence_texts, _hash_ints)

    rng = np.random.RandomState(11)
    texts = ["".join(rng.choice(list("abcdef "), size=rng.randint(0, 40)))
             for _ in range(80)]
    texts[5] = ""  # empty doc contributes nothing
    df = pd.DataFrame({"doc_id": np.arange(80, dtype=np.int64),
                       "text": texts})
    out = pack_sequence_texts(rd.from_pandas(df).repartition(5),
                              id_col="doc_id", text_col="text",
                              seq_len=16, n_shards=3).to_pandas()

    df["_h"] = _hash_ints(df["doc_id"].to_numpy()).astype(np.int64)
    df["shard"] = df["_h"] % 3
    for shard, g in df.groupby("shard"):
        stream = "".join(g.sort_values(["_h", "doc_id"])["text"])
        exp = [stream[i:i + 16] for i in range(0, len(stream), 16)]
        got = out[out["shard"] == shard].sort_values("seq_id")
        assert got["seq_text"].tolist() == exp
        assert got["seq_id"].tolist() == list(range(len(exp)))


def test_pack_sequence_texts_properties(ray_session):
    """Property sweep over adversarial packing inputs: exact-boundary
    docs, seq_len=1, unicode, all-empty shards."""
    import ray.data as rd
    from aml_entity_resolution_assignment_ray.ops.sample import (
        pack_sequence_texts, _hash_ints)
    from hypothesis import given, settings, strategies as st

    def replay(df, seq_len, n_shards):
        df = df.copy()
        df["_h"] = _hash_ints(df["doc_id"].to_numpy()).astype(np.int64)
        df["shard"] = df["_h"] % n_shards
        exp = {}
        for shard, g in df.groupby("shard"):
            stream = "".join(g.sort_values(["_h", "doc_id"])["text"]
                             .fillna(""))
            exp[shard] = [stream[i:i + seq_len]
                          for i in range(0, len(stream), seq_len)]
        return exp

    @settings(max_examples=8, deadline=None)
    @given(
        texts=st.lists(
            st.text(alphabet="ab✓é \n", min_size=0, max_size=12),
            min_size=1, max_size=25),
        seq_len=st.sampled_from([1, 3, 7]),
        n_shards=st.sampled_from([1, 2, 5]),
    )
    def check(texts, seq_len, n_shards):
        df = pd.DataFrame({
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
        })
        out = pack_sequence_texts(rd.from_pandas(df), id_col="doc_id",
                                  text_col="text", seq_len=seq_len,
                                  n_shards=n_shards).to_pandas()
        exp = replay(df, seq_len, n_shards)
        if not len(out):
            # all-empty streams: Ray's to_pandas drops columns on a
            # fully-empty dataset — just assert nothing was expected
            assert all(len(s) == 0 for s in exp.values())
            return
        for shard, seqs in exp.items():
            got = out[out["shard"] == shard].sort_values("seq_id")
            assert got["seq_text"].tolist() == seqs

    check()


def test_sample_frames_zero_frame_y4m(ray_session):
    """A valid header-only (zero-frame) Y4M stream emits no frame rows
    instead of asking the codec for frame 0 (r4 advice fix)."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops import codec

    rng = np.random.RandomState(7)
    good = codec.encode_y4m([rng.randint(0, 256, (6, 8)).astype(np.uint8)
                             for _ in range(3)])
    zero = good.split(b"\n", 1)[0] + b"\n"     # header, no FRAME markers
    assert codec.y4m_info(zero)[2] == 0
    ds = rd.from_arrow(pa.table({
        "media_id": ["z", "g"],
        "mime": ["video/x-y4m"] * 2,
        "payload": pa.array([zero, good], pa.binary()),
        "width": pa.array([8, 8], pa.int32()),
        "height": pa.array([6, 6], pa.int32()),
        "n_frames": pa.array([0, 3], pa.int32()),
    }))
    out = multimodal.sample_frames(ds, k=2, fake=False).to_pandas()
    assert set(out["media_id"]) == {"g"}       # zero-frame row skipped
    assert len(out) == 2


def test_cm_frequencies(ray_session):
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.sketch import (
        cm_frequencies,
        cm_table,
    )

    # skewed frequencies over a small candidate set: CM never
    # underestimates, and at w >> distinct the estimate is EXACT
    vals = np.repeat([f"t{i}" for i in range(8)],
                     [5000, 2500, 1200, 600, 300, 150, 80, 20])
    df = pd.DataFrame({"t": vals})
    truth = df["t"].value_counts()
    res = cm_frequencies(rd.from_pandas(df).repartition(7), col="t",
                         d=4, w=1024, cfg=CFG).to_pandas() \
        .set_index("t")["approx_count"]
    assert len(res) == 8
    assert (res.sort_index() == truth.sort_index()).all()

    # crowded table (w=4, 8 values): still never underestimates, and
    # the total overestimate is bounded
    res_sm = cm_frequencies(rd.from_pandas(df).repartition(7), col="t",
                            d=2, w=4, cfg=CFG).to_pandas() \
        .set_index("t")["approx_count"]
    assert (res_sm.sort_index() >= truth.sort_index()).all()
    assert res_sm.max() <= len(df)

    # merge-order / block-layout invariant: cells are plain sums
    res2 = cm_frequencies(rd.from_pandas(df).repartition(31), col="t",
                          d=4, w=1024, cfg=CFG).to_pandas() \
        .set_index("t")["approx_count"]
    assert (res.sort_index() == res2.sort_index()).all()

    # the table itself is bounded by d*w rows and sums to d*n
    tab = cm_table(rd.from_pandas(df).repartition(5), col="t",
                   d=3, w=16, cfg=CFG).to_pandas()
    assert len(tab) <= 3 * 16
    assert tab["cnt"].sum() == 3 * len(df)
    assert tab.groupby("row_i")["cnt"].sum().eq(len(df)).all()

    with pytest.raises(ValueError):
        cm_table(rd.from_pandas(df), col="t", d=0)
    with pytest.raises(ValueError):
        cm_table(rd.from_pandas(df), col="t", w=0)


def test_gif_codec():
    """GIF decode: encoder round-trips (sequential and interlaced), a
    hand-packed REAL LZW stream exercises the dictionary-string and
    KwKwK paths, sub-screen frames composite onto the background
    color, and malformed payloads raise."""
    from aml_entity_resolution_assignment_ray.ops import codec

    rng = np.random.RandomState(33)
    pal = rng.randint(0, 256, (11, 3), dtype=np.uint8)
    for h, w in [(1, 1), (5, 4), (16, 9), (8, 300)]:
        arr = pal[rng.randint(0, len(pal), (h, w))]
        assert np.array_equal(codec.decode_gif(codec.encode_gif(arr)), arr)
        assert np.array_equal(
            codec.decode_gif(codec.encode_gif(arr, interlace=True)), arr)

    # hand-packed compressed stream: pixels [1,1,1,1,1] at min_code 2
    # is codes (4=clear, 1, 6, 6, 5=end) — code 6 is first the KwKwK
    # case (== len(table)) and then a dictionary string (< len(table));
    # the end code arrives AFTER the width grows to 4 bits
    buf = nbits = 0
    stream = bytearray()
    for code, width in [(4, 3), (1, 3), (6, 3), (6, 3), (5, 4)]:
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            stream.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        stream.append(buf & 0xFF)
    table4 = np.array([[10, 10, 10], [20, 30, 40], [0, 0, 0], [5, 5, 5]],
                      dtype=np.uint8)
    gif = (b"GIF89a" + (5).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + bytes([0x81, 0, 0]) + table4.tobytes()
           + b"\x2c" + b"\x00" * 4
           + (5).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + b"\x00" + bytes([2, len(stream)]) + bytes(stream) + b"\x00"
           + b"\x3b")
    got = codec.decode_gif(gif)
    assert np.array_equal(got, np.tile(table4[1], (1, 5, 1)))

    # sub-screen frame composites at (left, top) over the bg color:
    # 4x6 screen, bg index 3, 1x2 frame at (2, 1)
    stream2 = bytearray()
    buf = nbits = 0
    for code, width in [(4, 3), (0, 3), (1, 3), (5, 3)]:
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            stream2.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        stream2.append(buf & 0xFF)
    gif2 = (b"GIF89a" + (6).to_bytes(2, "little") + (4).to_bytes(2, "little")
            + bytes([0x81, 3, 0]) + table4.tobytes()
            + b"\x21\xf9\x04\x00\x00\x00\x00\x00"     # a skipped GCE
            + b"\x2c" + (2).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (2).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + b"\x00" + bytes([2, len(stream2)]) + bytes(stream2) + b"\x00"
            + b"\x3b")
    got2 = codec.decode_gif(gif2)
    exp2 = np.tile(table4[3], (4, 6, 1))
    exp2[1, 2] = table4[0]
    exp2[1, 3] = table4[1]
    assert np.array_equal(got2, exp2)

    with pytest.raises(ValueError, match="magic"):
        codec.decode_gif(b"not a gif")
    with pytest.raises(ValueError, match="truncated|early"):
        bad = codec.encode_gif(pal[rng.randint(0, 11, (4, 4))])
        # encode_gif layout is fixed: 13-byte header + 256-entry table,
        # 10-byte descriptor, min_code byte, then data sub-blocks —
        # keep just ONE data byte (too few bits for a single 9-bit code)
        cut = 13 + 256 * 3 + 10 + 1
        codec.decode_gif(bad[:cut] + bytes([1, bad[cut + 1], 0, 0x3b]))
    with pytest.raises(ValueError, match="256"):
        i = np.arange(272)
        many = np.stack([i % 256, i // 2, np.zeros(272, dtype=np.int64)],
                        axis=1).astype(np.uint8)
        codec.encode_gif(many.reshape(17, 16, 3))


def test_media_pipeline_strict_gif(ray_session):
    """Real GIF bytes through the strict actor-pool decode stage."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops import codec
    from aml_entity_resolution_assignment_ray.util import stateful_map

    rng = np.random.RandomState(37)
    pal = rng.randint(0, 256, (7, 3), dtype=np.uint8)
    rows, truths = [], []
    for i, (h, w) in enumerate([(6, 4), (3, 3), (5, 8)]):
        arr = pal[rng.randint(0, len(pal), (h, w))]
        rows.append({"media_id": i,
                     "payload": codec.encode_gif(arr, interlace=i == 1),
                     "width": w, "height": h, "mime": "image/gif"})
        truths.append(arr)
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = stateful_map(ds, multimodal.DecodeImage, (False,),
                       batch_format="pandas").to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    for i, truth in enumerate(truths):
        assert tuple(out.loc[i, "shape"]) == truth.shape
        assert np.array_equal(
            np.asarray(list(out.loc[i, "pixels"]),
                       dtype=np.uint8).reshape(truth.shape), truth)


def test_mp4_container_codec():
    """ISO BMFF round-trip: encode_mp4 -> mp4_sample_table recovers
    codec/timescale/dimensions, per-sample offsets/sizes/pts, across
    chunk layouts; extraction is byte-exact; malformed boxes raise."""
    from aml_entity_resolution_assignment_ray.ops import codec

    rng = np.random.RandomState(7)
    for n, nch in [(1, 1), (5, 2), (12, 3), (7, 1)]:
        samples = [rng.bytes(int(rng.randint(5, 300))) for _ in range(n)]
        durs = [int(rng.randint(50, 200)) for _ in range(n)]
        p = codec.encode_mp4(samples, timescale=1000, durations=durs,
                             width=32, height=24, n_chunks=nch)
        t = codec.mp4_sample_table(p)
        assert (t["codec"], t["timescale"], t["n_samples"]) == \
            ("avc1", 1000, n)
        assert (t["width"], t["height"]) == (32, 24)
        assert codec.mp4_extract_samples(p, range(n), t) == samples
        assert np.array_equal(t["pts"],
                              np.cumsum([0] + durs[:-1], dtype=np.int64))
        assert np.array_equal(t["sizes"],
                              np.array([len(s) for s in samples]))

    # constant sizes/durations exercise the run-compressed tables
    p = codec.encode_mp4([b"x" * 20] * 6, n_chunks=4)
    t = codec.mp4_sample_table(p)
    assert codec.mp4_extract_samples(p, [0, 5], t) == [b"x" * 20] * 2

    with pytest.raises(ValueError, match="short"):
        codec.mp4_sample_table(b"xx")
    with pytest.raises(ValueError, match="truncated"):
        codec.mp4_sample_table(codec.encode_mp4([b"abc"])[:40])
    with pytest.raises(ValueError, match="out of range"):
        codec.mp4_extract_samples(p, [99], t)
    with pytest.raises(ValueError, match="video track"):
        codec.mp4_sample_table(b"\x00\x00\x00\x08ftyp")


def test_extract_video_samples_stage(ray_session):
    """Strict MP4 sample extraction through the actor pool: sampled
    bytes/pts match the GENERATOR's truth at the replayed (i*n)//k
    indices; a zero-sample MP4 emits nothing; the fake path keeps the
    schema; non-MP4 mimes raise."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops import codec

    table, truth = multimodal.make_mp4_table(n=6, with_truth=True)
    out = multimodal.extract_video_samples(
        rd.from_arrow(table), k=3, fake=False).to_pandas() \
        .sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    meta = table.to_pandas()
    exp_rows = 0
    for _, m in meta.iterrows():
        nf = int(m["n_frames"])
        k = min(3, nf)
        idxs = (np.arange(k) * nf) // k
        exp_rows += len(idxs)
        tr = truth[truth["media_id"] == m["media_id"]] \
            .set_index("sample_idx")
        sub = out[out["media_id"] == m["media_id"]] \
            .set_index("frame_idx")
        assert sorted(sub.index) == sorted(int(i) for i in idxs)
        for i in idxs:
            assert sub.loc[int(i), "pts"] == tr.loc[int(i), "pts"]
            assert len(sub.loc[int(i), "sample"]) == \
                tr.loc[int(i), "n_bytes"]
            assert sub.loc[int(i), "codec"] == "avc1"
            assert sub.loc[int(i), "timescale"] == 600
    assert len(out) == exp_rows

    # zero-sample MP4 -> no rows, no raise
    empty = pd.DataFrame({
        "media_id": ["z"], "mime": ["video/mp4"],
        "payload": [codec.encode_mp4([])],
        "width": pd.array([8], dtype="int32"),
        "height": pd.array([8], dtype="int32"),
        "n_frames": pd.array([0], dtype="int32"),
    })
    z = multimodal.extract_video_samples(
        rd.from_pandas(empty), k=3, fake=False).to_pandas()
    assert len(z) == 0

    # fake path: same schema, digest-deterministic bytes
    f = multimodal.extract_video_samples(
        rd.from_arrow(table), k=3, fake=True).to_pandas()
    assert list(f.columns) == ["media_id", "frame_idx", "pts",
                               "timescale", "codec", "sample"]
    assert (f["codec"] == "fake").all()

    # unsupported mime raises in strict mode
    bad = empty.assign(mime="video/webm")
    with pytest.raises(Exception, match="webm"):
        multimodal.extract_video_samples(
            rd.from_pandas(bad), k=3, fake=False).materialize()


def test_bloom_filter(ray_session):
    """Bloom build/probe: every build-set value hits (no false
    negatives, ever), misses are exact negatives, false positives are
    deterministic across block layouts, and a roomy bitmap has none."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.sketch import (
        bloom_build,
        bloom_maybe_contains,
    )

    a = pd.DataFrame({"v": [f"g{i}" for i in range(0, 4000, 2)]})   # evens
    probe = pd.DataFrame({"v": [f"g{i}" for i in range(4000)]})
    bm = bloom_build(rd.from_pandas(a).repartition(7), col="v",
                     m_bits=1 << 16, k=3)
    got = bloom_maybe_contains(rd.from_pandas(probe).repartition(5), bm,
                               col="v", k=3).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    in_a = got["v"].isin(set(a["v"]))
    assert got.loc[in_a, "bloom_maybe"].all()          # no false negatives
    # roomy bitmap (2k values in 64k bits): no false positives either
    assert not got.loc[~in_a, "bloom_maybe"].any()

    # tight bitmap: false positives appear but are a pure function of
    # the value set — block layout cannot change them
    bm_sm = bloom_build(rd.from_pandas(a).repartition(3), col="v",
                        m_bits=1 << 10, k=2)
    g1 = bloom_maybe_contains(rd.from_pandas(probe), bm_sm,
                              col="v", k=2).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    bm_sm2 = bloom_build(rd.from_pandas(a).repartition(31), col="v",
                         m_bits=1 << 10, k=2)
    g2 = bloom_maybe_contains(rd.from_pandas(probe).repartition(11),
                              bm_sm2, col="v", k=2).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    assert np.array_equal(bm_sm, bm_sm2)
    assert g1["bloom_maybe"].equals(g2["bloom_maybe"])
    assert g1.loc[g1["v"].isin(set(a["v"])), "bloom_maybe"].all()
    assert g1["bloom_maybe"].sum() > in_a.sum()        # some FPs exist
    # every bloom-negative really is absent (the exact-negative law)
    assert not g1.loc[~g1["bloom_maybe"], "v"].isin(set(a["v"])).any()

    with pytest.raises(ValueError, match="k must"):
        bloom_build(rd.from_pandas(a), col="v", k=0)
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(rd.from_pandas(a), col="v", m_bits=4)


@pytest.mark.parametrize("force_shuffle", [False, True])
def test_dedup_keep_best(ray_session, force_shuffle):
    """Keep-best representative selection: max score wins, ties break
    to the smallest id, n_dups counts the whole group, and the result
    is identical through the gather and digest-shuffle paths."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.config import EngineConfig
    from aml_entity_resolution_assignment_ray.ops.dedup import dedup_keep_best

    rng = np.random.RandomState(11)
    n = 600
    df = pd.DataFrame({
        "k": [f"key{i % 97}" for i in range(n)],
        "doc_id": np.arange(n, dtype=np.int64),
        "score": rng.randint(0, 5, n).astype(np.int64),   # many ties
        "extra": [f"x{i}" for i in range(n)],
    })
    cfg = (EngineConfig(gather_max_keys=0) if force_shuffle
           else EngineConfig(gather_max_keys=10**6))
    got = dedup_keep_best(rd.from_pandas(df).repartition(9),
                          key_col="k", score_col="score",
                          id_col="doc_id", keep_cols=["extra"],
                          cfg=cfg).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    exp = (df.sort_values(["k", "score", "doc_id"],
                          ascending=[True, False, True], kind="stable")
           .groupby("k", sort=False).head(1)
           .sort_values("k").reset_index(drop=True))
    nd = df.groupby("k").size()
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    assert (got["score"].to_numpy() == exp["score"].to_numpy()).all()
    assert (got["extra"].to_numpy() == exp["extra"].to_numpy()).all()
    assert (got.set_index("k")["n_dups"].sort_index()
            == nd.sort_index()).all()
    assert list(got.columns) == ["k", "doc_id", "score", "extra", "n_dups"]


def test_ivf_append(ray_session, tmp_path):
    """Incremental IVF ingest: appended vectors land in the same cells
    a same-centroid rebuild would put them in (file-level equivalence),
    an exhaustive probe over the appended index equals brute force over
    the union, and appending to a non-index path raises."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops import ann

    rng = np.random.RandomState(23)
    dim, n = 16, 400
    V = rng.randn(n, dim)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [v.tolist() for v in V]})
    base = df[df["vec_id"] % 5 != 0]
    newer = df[df["vec_id"] % 5 == 0]
    ipath = str(tmp_path / "ivf")
    idx = ann.build_ivf(rd.from_pandas(base).repartition(4), ncells=6,
                        index_path=ipath)
    idx2 = ann.append_ivf(ipath, rd.from_pandas(newer).repartition(3))
    assert np.array_equal(idx.centroids, idx2.centroids)

    # file-level: every vector present exactly once, in the cell the
    # persisted centroids assign it to
    import glob

    import pyarrow.parquet as pq
    parts = []
    for f in glob.glob(ipath + "/cells/_cell=*/*.parquet"):
        d = pq.read_table(f).to_pandas()
        d["_cell"] = int(f.split("_cell=")[1].split("/")[0])
        parts.append(d)
    cells = pd.concat(parts, ignore_index=True)
    assert sorted(cells["vec_id"]) == list(range(n))
    Cn = idx.centroids / np.linalg.norm(idx.centroids, axis=1,
                                        keepdims=True)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    exp_cell = (Vn @ Cn.T).argmax(axis=1)
    got_cell = cells.sort_values("vec_id")["_cell"].to_numpy(dtype=np.int64)
    assert np.array_equal(got_cell, exp_cell)

    # search-level: exhaustive probe == brute force over the union
    queries = V[:3]
    got = idx2.search(queries, k=5, nprobe=6)
    brute = ann.brute_force_topk(rd.from_pandas(df), queries, k=5)
    assert got["vec_id"].tolist() == brute["vec_id"].tolist()

    with pytest.raises(FileNotFoundError, match="centroids"):
        ann.append_ivf(str(tmp_path / "nope"),
                       rd.from_pandas(newer))


def test_image_ahash_bits(ray_session):
    """aHash invariants: identical pixels -> identical bits; a
    uniformly brightened copy -> identical bits (threshold is
    relative); an inverted image -> complementary-ish bits (large
    Hamming distance); 64 bits per image."""
    import ray.data as rd

    rng = np.random.RandomState(6)
    base = rng.randint(0, 200, (10, 10, 3)).astype(np.uint8)
    bright = np.clip(base.astype(np.int64) + 40, 0, 255).astype(np.uint8)
    inv = (255 - base).astype(np.uint8)

    rows = []
    for mid, img in [("a", base), ("a2", base.copy()),
                     ("b", bright), ("inv", inv)]:
        rows.append({"media_id": mid, "pixels": img.ravel(),
                     "shape": [10, 10, 3]})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = multimodal.image_ahash_bits(ds).to_pandas()
    assert len(out) == 4 * 64
    bits = {m: g.sort_values("bit_idx")["bit"].to_numpy()
            for m, g in out.groupby("media_id")}
    assert (bits["a"] == bits["a2"]).all()
    # +40 saturates some pixels, so allow a small Hamming drift
    assert (bits["a"] != bits["b"]).sum() <= 8
    assert (bits["a"] != bits["inv"]).sum() >= 40


@pytest.mark.usefixtures("ray_session")
def test_contrastive_negatives_deterministic_and_excludes_positives():
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.sample import (
        contrastive_negatives,
    )

    n = 60
    texts = [f"text {i}" for i in range(n)]
    # plant a TARGETED accidental positive: doc 5's j=1 hash partner
    # gets doc 5's text, so exactly that pair must be dropped
    h5 = (5 * 2654435761 + 40503) % (2 ** 32)
    neg5 = h5 % (n - 1)
    neg5 = neg5 + (1 if neg5 >= 5 else 0)
    texts[neg5] = texts[5]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": texts})
    got = contrastive_negatives(rd.from_pandas(df).repartition(4),
                                k=2, n_rows=n).to_pandas()

    # reference: same Knuth arithmetic + text-equality filter
    want = set()
    for i in range(n):
        for j in (1, 2):
            h = (i * 2654435761 + j * 40503) % (2 ** 32)
            neg = h % (n - 1)
            neg = neg + (1 if neg >= i else 0)
            if texts[neg] != texts[i]:
                want.add((i, neg, j))
    got_set = {(int(r.doc_id), int(r.neg_id), int(r.j))
               for r in got.itertuples()}
    assert got_set == want
    assert not any(a == b for a, b, _ in got_set)  # no self pairs
    assert (5, neg5, 1) not in got_set  # the planted positive dropped
    assert len(want) < 2 * n

    # layout invariance
    got2 = contrastive_negatives(rd.from_pandas(df).repartition(9),
                                 k=2, n_rows=n).to_pandas()
    assert {(int(r.doc_id), int(r.neg_id), int(r.j))
            for r in got2.itertuples()} == got_set


def test_sparse_cosine_pairs(ray_session):
    """Posting-list cosine == brute-force numpy TF cosine; chunked
    hot-term emission is exact; max_df cap measures in filtered space."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.dedup import (
        sparse_cosine_pairs,
    )

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "apple banana apple cherry",
            "apple banana apple cherry",        # exact dup of 0
            "apple banana cherry date",         # near dup
            "zebra yak xylophone",              # shares nothing kept
            "zebra yak walrus",                 # overlaps 3
            "unique singleton words only",      # all hapax -> isolated
        ],
    })

    def brute(min_df=2):
        from collections import Counter
        tfs = [Counter(t.lower().split()) for t in docs["text"]]
        df = Counter(w for tf in tfs for w in tf)
        kept = {w for w, c in df.items() if c >= min_df}
        out = {}
        for i in range(len(tfs)):
            for j in range(i + 1, len(tfs)):
                a = {w: c for w, c in tfs[i].items() if w in kept}
                b = {w: c for w, c in tfs[j].items() if w in kept}
                dot = sum(a[w] * b[w] for w in a.keys() & b.keys())
                if not dot:
                    continue
                na = sum(v * v for v in a.values()) ** 0.5
                nb = sum(v * v for v in b.values()) ** 0.5
                out[(i, j)] = dot / (na * nb)
        return out

    want = {p: c for p, c in brute().items() if c >= 0.5}
    got = sparse_cosine_pairs(
        rd.from_pandas(docs).repartition(4), threshold=0.5,
        cfg=CFG).to_pandas()
    gmap = {(int(r.id_a), int(r.id_b)): r.cosine
            for r in got.itertuples()}
    assert set(gmap) == set(want)
    for p in want:
        assert abs(gmap[p] - want[p]) < 1e-12
    # identical vectors: dot/(sqrt(n2)*sqrt(n2)) may exceed 1 by one
    # ulp (sqrt rounding) — identically on the SQL side
    assert abs(gmap[(0, 1)] - 1.0) < 1e-12          # exact dup

    # forcing tiny chunks must not change the result
    got2 = sparse_cosine_pairs(
        rd.from_pandas(docs).repartition(4), threshold=0.5,
        chunk_pairs=2, cfg=CFG).to_pandas()
    g2 = {(int(r.id_a), int(r.id_b)): r.cosine for r in got2.itertuples()}
    assert g2 == gmap

    # stop-word cap: drop terms in > 1/2 of docs ("apple", "banana",
    # "cherry" have df 3 = n/2, kept; df > 3 dropped) — still exact
    # vs the same-capped brute force
    def brute_cap(num, den):
        from collections import Counter
        tfs = [Counter(t.lower().split()) for t in docs["text"]]
        df = Counter(w for tf in tfs for w in tf)
        kept = {w for w, c in df.items()
                if c >= 2 and c * den <= len(docs) * num}
        out = {}
        for i in range(len(tfs)):
            for j in range(i + 1, len(tfs)):
                a = {w: c for w, c in tfs[i].items() if w in kept}
                b = {w: c for w, c in tfs[j].items() if w in kept}
                dot = sum(a[w] * b[w] for w in a.keys() & b.keys())
                if not dot:
                    continue
                na = sum(v * v for v in a.values()) ** 0.5
                nb = sum(v * v for v in b.values()) ** 0.5
                out[(i, j)] = dot / (na * nb)
        return out

    want3 = {p: c for p, c in brute_cap(1, 3).items() if c >= 0.5}
    got3 = sparse_cosine_pairs(
        rd.from_pandas(docs), threshold=0.5, max_df_ratio=(1, 3),
        cfg=CFG).to_pandas()
    g3 = {(int(r.id_a), int(r.id_b)): r.cosine for r in got3.itertuples()}
    assert set(g3) == set(want3)

    with pytest.raises(ValueError):
        sparse_cosine_pairs(rd.from_pandas(docs), threshold=0.0)


def test_greedy_cover_select(ray_session):
    """Distributed greedy max-coverage == sequential greedy with the
    same (max gain, min id) tie-break; early-stops when covered."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.sample import (
        greedy_cover_select,
    )

    rng = np.random.RandomState(13)
    rows = []
    for did in range(20):
        items = rng.choice(200, size=rng.randint(3, 30), replace=False)
        rows.extend((did, f"i{x}") for x in items)
    df = pd.DataFrame(rows, columns=["id", "it"])

    def brute(k):
        sets = {d: set(g["it"]) for d, g in df.groupby("id")}
        covered, out = set(), []
        for r in range(1, k + 1):
            gains = {d: len(s - covered) for d, s in sets.items()
                     if len(s - covered) > 0}
            if not gains:
                break
            win = min(gains, key=lambda d: (-gains[d], d))
            covered |= sets[win]
            out.append((r, win, gains[win], len(covered)))
        return out

    got = greedy_cover_select(
        rd.from_pandas(df).repartition(5), id_col="id", item_col="it",
        k=6, cfg=CFG).to_pandas()
    want = brute(6)
    assert [tuple(r) for r in got.to_numpy()] == want

    # early stop: 2 docs cover everything, k=5 emits 2 rows
    small = pd.DataFrame({"id": [1, 1, 2, 2, 3],
                          "it": ["a", "b", "c", "d", "a"]})
    got2 = greedy_cover_select(rd.from_pandas(small), id_col="id",
                               item_col="it", k=5, cfg=CFG).to_pandas()
    assert len(got2) == 2
    assert got2["covered_total"].iloc[-1] == 4

    with pytest.raises(ValueError):
        greedy_cover_select(rd.from_pandas(small), id_col="id",
                            item_col="it", k=0)


def test_rolling_context(ray_session):
    """k-preceding context assembly == SQL string_agg frame semantics,
    including NULL-text skipping and all-NULL frames."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.text import (
        rolling_context,
    )

    df = pd.DataFrame({
        "c": ["a", "a", "a", "a", "b", "b"],
        "i": [1, 2, 3, 4, 1, 2],
        "x": ["t1", None, "t3", "t4", None, "z2"],
    })
    got = rolling_context(
        rd.from_pandas(df).repartition(3), key="c", order_cols=["i"],
        text_col="x", k=2, cfg=CFG).to_pandas() \
        .sort_values(["c", "i"]).reset_index(drop=True)
    want = ["t1", "t1", "t1\nt3", "t3\nt4", None, "z2"]
    assert list(got["context"]) == want

    zero = rolling_context(rd.from_pandas(df), key="c",
                           order_cols=["i"], text_col="x", k=0,
                           cfg=CFG).to_pandas().sort_values(["c", "i"])
    assert list(zero["context"]) == ["t1", None, "t3", "t4", None, "z2"]

    with pytest.raises(ValueError):
        rolling_context(rd.from_pandas(df), key="c", order_cols=["i"],
                        text_col="x", k=-1)


def test_grouped_quantiles_cont(ray_session):
    """Interpolated quantiles == DuckDB's percentile_cont replay
    formula, layout-invariant."""
    import duckdb
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        grouped_quantiles_cont,
    )

    rng = np.random.RandomState(3)
    df = pd.DataFrame({"k": rng.choice(["a", "b", "c"], 500),
                       "v": rng.randint(0, 200, 500).astype(np.int64)})
    got = grouped_quantiles_cont(
        rd.from_pandas(df).repartition(7), key="k", col="v",
        qs=[0.25, 0.5, 0.9], cfg=CFG).to_pandas() \
        .sort_values(["k", "q"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        WITH ranked AS (
            SELECT k, v,
                   row_number() OVER (PARTITION BY k ORDER BY v) - 1 AS r,
                   count(*) OVER (PARTITION BY k) AS n
            FROM t
        ), qq AS (SELECT unnest([0.25e0, 0.5e0, 0.9e0]) AS q)
        SELECT k, q,
               max(CASE WHEN r = CAST(floor(q * (n-1)) AS BIGINT)
                   THEN CAST(v AS DOUBLE) END)
               + (max(CASE WHEN r = CAST(ceil(q * (n-1)) AS BIGINT)
                      THEN CAST(v AS DOUBLE) END)
                  - max(CASE WHEN r = CAST(floor(q * (n-1)) AS BIGINT)
                        THEN CAST(v AS DOUBLE) END))
                 * (q * (any_value(n)-1) - floor(q * (any_value(n)-1)))
               AS value
        FROM ranked, qq GROUP BY k, q ORDER BY k, q
    """).fetchdf()
    assert list(got["k"]) == list(exp["k"])
    assert np.array_equal(got["value"].to_numpy(), exp["value"].to_numpy())
    # sanity vs numpy's linear interpolation
    for k in ("a", "b", "c"):
        want = np.percentile(df[df["k"] == k]["v"], 50,
                             method="linear")
        g = got[(got["k"] == k) & (got["q"] == 0.5)]["value"].iloc[0]
        assert abs(g - want) < 1e-9


def test_pareto_front(ray_session):
    """Skyline == brute-force NOT EXISTS dominance; duplicates of a
    frontier point all survive; layout-invariant."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        pareto_front,
    )

    rng = np.random.RandomState(9)
    df = pd.DataFrame({"id": np.arange(400, dtype=np.int64),
                       "x": rng.randint(0, 50, 400).astype(np.int64),
                       "y": rng.randint(0, 50, 400).astype(np.int64)})
    # plant an exact duplicate of a certainly-undominated corner point
    df.loc[0, ["x", "y"]] = [60, 60]
    df.loc[1, ["x", "y"]] = [60, 60]
    m = df[["x", "y"]].to_numpy()
    dom = ((m[None, :, :] >= m[:, None, :]).all(2)
           & (m[None, :, :] > m[:, None, :]).any(2)).any(1)
    want = set(df["id"][~dom])
    for nparts in (3, 11):
        got = pareto_front(rd.from_pandas(df).repartition(nparts),
                           id_cols=["id"], dims=["x", "y"], chunk=64,
                           cfg=CFG).to_pandas()
        assert set(got["id"]) == want
    assert {0, 1} <= want


def test_grouped_ohlc(ray_session):
    """OHLC == SQL first/last-by-window + min/max, with tie-broken
    deterministic open/close; layout-invariant."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        grouped_ohlc,
    )

    rng = np.random.RandomState(4)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], 300),
        "ts": rng.randint(0, 40, 300).astype(np.int64),  # many order ties
        "id": np.arange(300, dtype=np.int64),            # unique tiebreak
        "v": rng.randint(-100, 100, 300).astype(np.int64)})
    want = {}
    for k, g in df.groupby("k"):
        s = g.sort_values(["ts", "id"])
        want[k] = (s["v"].iloc[0], g["v"].max(), g["v"].min(),
                   s["v"].iloc[-1])
    for nparts in (2, 9):
        got = grouped_ohlc(rd.from_pandas(df).repartition(nparts),
                           keys=["k"], order_cols=["ts", "id"],
                           val_col="v", cfg=CFG).to_pandas()
        res = {r["k"]: (r["open"], r["high"], r["low"], r["close"])
               for _, r in got.iterrows()}
        assert res == want


def test_grouped_corr(ray_session):
    """Pearson corr from exact integer sums == the replay formula and
    numpy's corrcoef to fp tolerance; zero-variance group -> NaN."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.profile import (
        grouped_corr,
    )

    rng = np.random.RandomState(6)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], 400),
        "x": rng.randint(0, 100, 400).astype(np.int64),
    })
    df["y"] = (df["x"] * 3 + rng.randint(0, 50, 400)).astype(np.int64)
    flat = pd.DataFrame({"k": ["z"] * 5,
                         "x": np.int64(7) * np.ones(5, dtype=np.int64),
                         "y": np.arange(5, dtype=np.int64)})
    df = pd.concat([df, flat], ignore_index=True)
    got = grouped_corr(rd.from_pandas(df).repartition(5), key="k",
                       x_col="x", y_col="y", cfg=CFG).to_pandas() \
        .set_index("k")["corr"]
    for k in ("a", "b"):
        g = df[df["k"] == k]
        want = np.corrcoef(g["x"], g["y"])[0, 1]
        assert abs(got[k] - want) < 1e-12
    assert np.isnan(got["z"])


def test_bpe_token_histogram(ray_session):
    """Vocabulary histogram == a sequential replay of the same merge
    chain; counts sum to the corpus merged-token total."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.text import (
        _BPE_MERGES, bpe_merge_token_count, bpe_token_histogram,
    )

    docs = pd.DataFrame({"text": [
        "the theory of the matter", "There, the cat!", "", None,
        "thesis on theta 123 the-ory",
    ]})
    got = bpe_token_histogram(
        rd.from_pandas(docs).repartition(3), cfg=CFG).to_pandas()
    assert int(got["n"].sum()) == int(
        bpe_merge_token_count(docs["text"].fillna("")).sum())

    # independent sequential replay
    import re
    want = {}
    rx = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")
    for t in docs["text"].fillna("").str.lower():
        s = " " + "  ".join(" ".join(p) for p in rx.findall(t)) + " "
        for a, b in _BPE_MERGES:
            pat, rep = f" {a} {b} ", f" {a}{b} "
            s = s.replace(pat, rep).replace(pat, rep)
        for tok in s.split():
            want[tok] = want.get(tok, 0) + 1
    assert dict(zip(got["token"], got["n"])) == want


def test_session_association(ray_session):
    """Pair supports and lift == a sequential basket replay with the
    identical session definition; layout-invariant."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.events import (
        session_association,
    )

    rng = np.random.RandomState(2)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 12, n).astype(np.int64),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 4 * 86400, n), unit="s"),
        "event_type": rng.choice(["a", "b", "c", "d"], n),
    })
    # sequential replay
    baskets = {}
    for uid, g in df.groupby("user_id"):
        s = g.sort_values(["ts", "event_id"])
        sess, prev = 0, None
        for _, r in s.iterrows():
            if prev is not None and (r["ts"] - prev).total_seconds() > 1800:
                sess += 1
            prev = r["ts"]
            baskets.setdefault((uid, sess), set()).add(r["event_type"])
    ns = len(baskets)
    sup1, want = {}, {}
    for types in baskets.values():
        for t in types:
            sup1[t] = sup1.get(t, 0) + 1
        ts = sorted(types)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                want[(ts[i], ts[j])] = want.get((ts[i], ts[j]), 0) + 1
    for nparts in (3, 9):
        got = session_association(
            rd.from_pandas(df).repartition(nparts), gap_s=1800,
            cfg=CFG).to_pandas()
        sup = {(a, b): s for a, b, s in
               zip(got["type_a"], got["type_b"], got["support"])}
        assert sup == want
        for _, r in got.iterrows():
            exp = float(want[(r["type_a"], r["type_b"])] * ns) / float(
                sup1[r["type_a"]] * sup1[r["type_b"]])
            assert r["lift"] == exp


def test_consecutive_duplicate_collapse(ray_session):
    """The er_turn_collapse shape: grouped_lag + prev!=cur filter
    drops planted stutters, keeps first turns and non-consecutive
    repeats."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        grouped_lag,
    )

    df = pd.DataFrame({
        "conv_id": ["c1"] * 5 + ["c2"] * 3,
        "turn_idx": [0, 1, 2, 3, 4, 0, 1, 2],
        "text": ["hi", "hi", "yes", "hi", "hi", "a", "b", "b"],
    })
    lagged = grouped_lag(rd.from_pandas(df).repartition(3),
                         key="conv_id", order_cols=["turn_idx"],
                         cols=["text"], cfg=CFG)
    got = lagged.map_batches(
        lambda d: d[d["prev_text"].isna() | (d["text"] != d["prev_text"])]
        [["conv_id", "turn_idx", "text"]],
        batch_format="pandas").to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # c1: keeps 0 (hi), 2 (yes), 3 (hi, non-consecutive repeat ok);
    # drops 1 and 4; c2: keeps 0, 1, drops 2
    assert list(zip(got["conv_id"], got["turn_idx"])) == [
        ("c1", 0), ("c1", 2), ("c1", 3), ("c2", 0), ("c2", 1)]


def test_incremental_keyed_sum_state(ray_session, tmp_path):
    """Persisted aggregate maintenance: 3 ingests == one-shot
    keyed_sum; batch_id replay is a no-op BEFORE AND AFTER compaction
    (the manifest keeps deleted batch ids excluded); compaction
    folds shards without changing the value."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        compact_keyed_sum_state, incremental_keyed_sum,
        read_keyed_sum_state,
    )

    rng = np.random.RandomState(8)
    df = pd.DataFrame({"k": rng.choice(["a", "b", "c"], 600),
                       "v": rng.randint(0, 100, 600).astype(np.int64)})
    want = df.groupby("k")["v"].sum().to_dict()
    sp = str(tmp_path / "agg_state")

    def state():
        return read_keyed_sum_state(sp, keys=["k"], val_cols=["v"],
                                    cfg=CFG).to_pandas() \
            .set_index("k")["v"].to_dict()

    parts = [df.iloc[i::3] for i in range(3)]
    for i, p in enumerate(parts):
        assert incremental_keyed_sum(
            rd.from_pandas(p).repartition(2), sp, keys=["k"],
            val_cols=["v"], batch_id=f"b{i}", cfg=CFG) is True
    assert state() == want
    # replay -> no-op
    assert incremental_keyed_sum(
        rd.from_pandas(parts[0]), sp, keys=["k"], val_cols=["v"],
        batch_id="b0", cfg=CFG) is False
    assert state() == want
    # compact, value unchanged, then replay of a compacted-away batch
    # id is STILL excluded by the manifest
    assert compact_keyed_sum_state(sp, keys=["k"], val_cols=["v"],
                                   cfg=CFG) == 3
    assert state() == want
    incremental_keyed_sum(rd.from_pandas(parts[1]), sp, keys=["k"],
                          val_cols=["v"], batch_id="b1", cfg=CFG)
    assert state() == want
    # a genuinely new batch still lands after compaction
    extra = pd.DataFrame({"k": ["a", "z"], "v": np.int64([5, 7])})
    assert incremental_keyed_sum(
        rd.from_pandas(extra), sp, keys=["k"], val_cols=["v"],
        batch_id="b3", cfg=CFG) is True
    want2 = dict(want)
    want2["a"] += 5
    want2["z"] = 7
    assert state() == want2
    # second compaction folds compact shard + b1-replay + b3
    assert compact_keyed_sum_state(sp, keys=["k"], val_cols=["v"],
                                   cfg=CFG) >= 2
    assert state() == want2


def test_merge_intervals(ray_session):
    """Gaps-and-islands == a sequential sweep; abutting intervals
    merge, gaps split; layout-invariant."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.events import (
        merge_intervals,
    )

    rng = np.random.RandomState(12)
    n = 300
    st = rng.randint(0, 1000, n).astype(np.int64)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "st": st,
        "en": st + rng.randint(0, 40, n).astype(np.int64)})
    want = {}
    for k, g in df.groupby("k"):
        s = g.sort_values(["st", "en"])
        islands = []
        for _, r in s.iterrows():
            if islands and r["st"] <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], r["en"])
                islands[-1][2] += 1
            else:
                islands.append([r["st"], r["en"], 1])
            islands[-1][1] = islands[-1][1]
        want[k] = [tuple(i) for i in islands]
    for nparts in (2, 8):
        got = merge_intervals(rd.from_pandas(df).repartition(nparts),
                              key="k", start_col="st", end_col="en",
                              cfg=CFG).to_pandas() \
            .sort_values(["k", "island_start"])
        res = {k: [tuple(r) for r in g[
            ["island_start", "island_end", "n_merged"]].to_numpy()]
            for k, g in got.groupby("k")}
        assert res == want
    # exact abutment merges (start == running end)
    ab = pd.DataFrame({"k": ["x", "x"], "st": np.int64([0, 10]),
                       "en": np.int64([10, 20])})
    g1 = merge_intervals(rd.from_pandas(ab), key="k", start_col="st",
                         end_col="en", cfg=CFG).to_pandas()
    assert len(g1) == 1 and g1["n_merged"].iloc[0] == 2
    # invalid interval raises
    bad = pd.DataFrame({"k": ["x"], "st": np.int64([5]),
                        "en": np.int64([1])})
    with pytest.raises(Exception):
        merge_intervals(rd.from_pandas(bad), key="k", start_col="st",
                        end_col="en", cfg=CFG).materialize()


def test_population_stability(ray_session):
    """PSI terms == a sequential replay; one-sided category raises."""
    import math

    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.profile import (
        population_stability,
    )
    from aml_entity_resolution_assignment_ray.util import round_half_away

    rng = np.random.RandomState(15)
    a = pd.DataFrame({"c": rng.choice(["x", "y", "z"], 500,
                                      p=[0.5, 0.3, 0.2])})
    b = pd.DataFrame({"c": rng.choice(["x", "y", "z"], 400,
                                      p=[0.2, 0.5, 0.3])})
    got = population_stability(
        rd.from_pandas(a).repartition(3), rd.from_pandas(b).repartition(2),
        col="c", cfg=CFG).to_pandas().set_index("c")
    na = a["c"].value_counts()
    nb = b["c"].value_counts()
    for c in ("x", "y", "z"):
        pa, pb = na[c] / len(a), nb[c] / len(b)
        want = float(round_half_away((pa - pb) * math.log(pa / pb), 6))
        assert got.loc[c, "psi_term"] == want
        assert got.loc[c, "n_a"] == na[c] and got.loc[c, "n_b"] == nb[c]
    # one-sided category -> ValueError
    b2 = pd.DataFrame({"c": ["x", "y", "w"]})
    with pytest.raises(Exception):
        population_stability(rd.from_pandas(a), rd.from_pandas(b2),
                             col="c", cfg=CFG).materialize()


def test_substring_dedup(ray_session):
    """ExactSubstr span removal: a token 8-gram occurring >= 2 times
    corpus-wide (across docs OR repeated within one) covers its 8
    positions; covered tokens drop, the doc reassembles from the rest.
    Expected values come from an in-test brute-force replay."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.dedup import substring_dedup

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    docs = {
        # cross-doc duplicate span embedded in distinct contexts
        1: f"one two {shared} three four five six seven eight nine ten",
        2: f"prefix text here {shared} and a different unique tail word",
        # internal repetition: the same 8-gram twice in ONE doc
        3: f"{shared} middle filler words go here now {shared}",
        # wholly unique doc — nothing removed, cleaned == normalized
        4: "Unique Words Only  In THIS document nothing repeats at all "
           "under any eight gram window ever",
        # shorter than the gram width — untouched
        5: "tiny doc under eight",
        6: "",
    }
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = (substring_dedup(rd.from_pandas(df).repartition(3), n=8, cfg=CFG)
           .to_pandas().set_index("doc_id").sort_index())

    # brute-force expected
    toks = {d: t.lower().split() for d, t in docs.items()}
    from collections import Counter
    cnt = Counter(" ".join(ts[i:i + 8])
                  for ts in toks.values() for i in range(len(ts) - 7))
    exp = {}
    for d, ts in toks.items():
        cov = set()
        for i in range(len(ts) - 7):
            if cnt[" ".join(ts[i:i + 8])] >= 2:
                cov.update(range(i, i + 8))
        kept = [t for j, t in enumerate(ts) if j not in cov]
        exp[d] = (len(ts), len(cov), " ".join(kept))
    for d in docs:
        assert got.loc[d, "n_tokens"] == exp[d][0], d
        assert got.loc[d, "n_removed"] == exp[d][1], d
        assert got.loc[d, "cleaned_text"] == exp[d][2], d
    # the planted spans actually fired
    assert exp[1][1] == 8 and exp[2][1] == 8 and exp[3][1] == 16
    assert exp[4][1] == 0 and exp[5][1] == 0


def test_cdc_merge(ray_session):
    """MERGE INTO semantics: highest-seq change per key wins; winning
    delete removes, winning upsert replaces, change-only keys insert,
    untouched base rows pass through with last_seq 0; an empty change
    stream short-circuits to the base snapshot."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import cdc_merge

    base = pd.DataFrame({
        "k": np.array([1, 2, 3, 4], dtype=np.int64),
        "v": np.array([10, 20, 30, 40], dtype=np.int64),
        "s": ["a", "b", "c", "d"],
    })
    changes = pd.DataFrame({
        "k":   np.array([1, 1, 2, 5, 5, 3], dtype=np.int64),
        "seq": np.array([7, 9, 3, 4, 2, 6], dtype=np.int64),
        "op":  ["upsert", "delete", "upsert", "upsert", "delete", "upsert"],
        "v":   np.array([11, 12, 21, 51, 52, 31], dtype=np.int64),
        "s":   ["x1", "x2", "y", "new5", "dead5", "z"],
    })
    got = cdc_merge(rd.from_pandas(base).repartition(2),
                    rd.from_pandas(changes).repartition(3),
                    key_col="k", seq_col="seq", op_col="op",
                    val_cols=("v", "s"), cfg=CFG) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    # k=1: latest seq 9 is delete -> gone. k=2: upsert@3 -> 21/y.
    # k=3: upsert@6 -> 31/z. k=4: untouched. k=5: insert (upsert@4
    # beats delete@2) -> 51/new5.
    assert got["k"].tolist() == [2, 3, 4, 5]
    assert got["v"].astype(int).tolist() == [21, 31, 40, 51]
    assert got["s"].tolist() == ["y", "z", "d", "new5"]
    assert got["last_seq"].tolist() == [3, 6, 0, 4]

    empty = cdc_merge(rd.from_pandas(base),
                      rd.from_pandas(changes.head(0)),
                      key_col="k", seq_col="seq", op_col="op",
                      val_cols=("v", "s"), cfg=CFG) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert empty["k"].tolist() == [1, 2, 3, 4]
    assert (empty["last_seq"] == 0).all()
    assert empty["v"].astype(int).tolist() == [10, 20, 30, 40]


def test_rrf_fuse(ray_session):
    """Exact-integer reciprocal-rank fusion of two truncated lists:
    per (query,item) score = sum of 10**9 // (60 + rank); items on one
    list only still score; top-k by (score desc, item asc) with fused
    rank."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.ann import rrf_fuse

    ra = pd.DataFrame({"query_id": [1, 1, 1, 2, 2],
                       "vec_id":   [10, 11, 12, 20, 21],
                       "rank":     [1, 2, 3, 1, 2]})
    rb = pd.DataFrame({"query_id": [1, 1, 2, 2],
                       "vec_id":   [11, 13, 21, 20],
                       "rank":     [1, 2, 1, 2]})
    got = rrf_fuse([rd.from_pandas(ra).repartition(2),
                    rd.from_pandas(rb).repartition(2)],
                   query_col="query_id", item_col="vec_id",
                   rank_col="rank", topk=3, cfg=CFG) \
        .to_pandas().sort_values(["query_id", "rank"]) \
        .reset_index(drop=True)
    S = 10 ** 9
    exp1 = sorted([(10, S // 61), (11, S // 62 + S // 61),
                   (12, S // 63), (13, S // 62)],
                  key=lambda t: (-t[1], t[0]))[:3]
    exp2 = sorted([(20, S // 61 + S // 62), (21, S // 62 + S // 61)],
                  key=lambda t: (-t[1], t[0]))
    q1 = got[got["query_id"] == 1]
    assert q1["vec_id"].tolist() == [t[0] for t in exp1]
    assert q1["rrf"].tolist() == [t[1] for t in exp1]
    assert q1["rank"].tolist() == [1, 2, 3]
    q2 = got[got["query_id"] == 2]
    # identical fused scores -> tie to smaller vec_id
    assert q2["vec_id"].tolist() == [20, 21]
    assert q2["rrf"].tolist() == [t[1] for t in exp2]


def test_clean_text(ray_session):
    """NFC + control strip + unicode-space fold + collapse + trim +
    codepoint truncation, checked against DuckDB running the exact
    oracle expression on the same rows."""
    import duckdb
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.text import (
        CTRL_SQL_CLASS,
        WS_DISAGREE_SQL_CLASS,
        clean_text,
    )

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "éclair  and   café",      # NFC folds to é
            "ctrl\x01chars\x02here\x7fend",
            "unicode space and　more",
            "  lots   of \t\n whitespace  ",
            "x" * 30 + " " + "y" * 30,               # truncation at 40
            None,
        ],
    })
    got = clean_text(rd.from_pandas(docs).repartition(2), max_chars=40) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("docs", docs)
    exp = con.execute(rf"""
        SELECT doc_id,
               rtrim(substr(
                 trim(regexp_replace(
                   regexp_replace(
                     regexp_replace(nfc_normalize(coalesce(text, '')),
                                    '{CTRL_SQL_CLASS}', ' ', 'g'),
                     '{WS_DISAGREE_SQL_CLASS}', ' ', 'g'),
                   '\s+', ' ', 'g')),
                 1, 40), ' ') AS clean_text
        FROM docs ORDER BY doc_id
    """).fetchdf()
    assert got["clean_text"].tolist() == exp["clean_text"].tolist()
    assert (got["n_chars"] == exp["clean_text"].str.len()).all()
    # the NFC fold actually happened (composed é, single codepoint)
    assert "éclair and café" == got.loc[0, "clean_text"]
    assert got.loc[1, "clean_text"] == "ctrl chars here end"
    assert got.loc[4, "n_chars"] == 40


def test_equidepth_histogram(ray_session):
    """Quantile-disc boundaries at i/nbins, bucket = smallest covering
    boundary; duplicate boundaries on skew leave later buckets absent;
    counts partition the input exactly."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.profile import (
        equidepth_histogram,
    )

    rng = np.random.RandomState(3)
    v = np.concatenate([rng.randint(0, 1000, 900),
                        np.full(300, 7)])        # heavy spike at 7
    df = pd.DataFrame({"x": v.astype(np.int64)})
    got = equidepth_histogram(rd.from_pandas(df).repartition(5),
                              col="x", nbins=8, cfg=CFG) \
        .to_pandas().sort_values("bucket").reset_index(drop=True)

    # brute-force reference of the same contract
    s = np.sort(v)
    n = len(s)
    his = np.array([s[max(int(np.ceil((i / 8) * n)), 1) - 1]
                    for i in range(1, 9)], dtype=np.int64)
    idx = np.searchsorted(his, v, side="left") + 1
    exp = pd.Series(idx).value_counts().sort_index()
    assert got["bucket"].tolist() == exp.index.tolist()
    assert got["n"].tolist() == exp.values.tolist()
    assert (got["hi"].to_numpy() ==
            his[got["bucket"].to_numpy() - 1]).all()
    assert got["n"].sum() == n


def test_watermark_late_events(ray_session):
    """Strict-prefix watermark vs a sequential replay: shuffled event
    times over a unique arrival order, 10s lateness; first arrival
    never late; result invariant to block layout."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.events import (
        watermark_late_events,
    )

    rng = np.random.RandomState(9)
    n = 400
    seq = np.arange(n, dtype=np.int64)
    ts = rng.randint(0, 500, n).astype(np.int64)
    df = pd.DataFrame({"seq": seq, "bucket": seq // 37, "t": ts})
    for parts in (1, 7):
        got = watermark_late_events(
            rd.from_pandas(df).repartition(parts),
            bucket_col="bucket", seq_col="seq", ts_col="t",
            lateness=10, cfg=CFG) \
            .to_pandas().sort_values("seq").reset_index(drop=True)
        pmax = np.empty(n, dtype=np.int64)
        pmax[0] = np.iinfo(np.int64).min // 4
        pmax[1:] = np.maximum.accumulate(ts[:-1])
        late = np.maximum(pmax - 10 - ts, 0)
        late[0] = 0
        assert (got["late_by"].to_numpy() == late).all()
        assert (got["is_late"].to_numpy() == (late > 0)).all()
    assert (late > 0).any()   # the scenario actually exercises lateness


def test_grouped_dense_rank(ray_session):
    """Gapless tied ranks per group, NULLs last as one peer group,
    layout-invariant."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        grouped_dense_rank,
    )

    df = pd.DataFrame({
        "k": ["a"] * 6 + ["b"] * 3,
        "v": [3.0, 1.0, 3.0, np.nan, 2.0, 1.0, 5.0, np.nan, 5.0],
        "id": np.arange(9, dtype=np.int64),
    })
    for parts in (1, 4):
        got = grouped_dense_rank(rd.from_pandas(df).repartition(parts),
                                 key="k", col="v", cfg=CFG) \
            .to_pandas().sort_values("id").reset_index(drop=True)
        assert got[got["k"] == "a"]["dense_rank"].tolist() == \
            [3, 1, 3, 4, 2, 1]
        assert got[got["k"] == "b"]["dense_rank"].tolist() == [1, 2, 1]


def test_grouped_first_last(ray_session):
    """Per-key first/last under a total order, combiner-correct across
    block layouts."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        grouped_first_last,
    )

    rng = np.random.RandomState(21)
    n = 300
    df = pd.DataFrame({
        "k": rng.randint(0, 9, n).astype(np.int64),
        "t": rng.randint(0, 50, n).astype(np.int64),   # many order ties
        "id": np.arange(n, dtype=np.int64),
        "v": rng.randn(n),
    })
    exp = df.sort_values(["k", "t", "id"], kind="stable")
    first = exp.groupby("k").head(1).set_index("k")
    last = exp.groupby("k").tail(1).set_index("k")
    for parts in (1, 6):
        got = grouped_first_last(rd.from_pandas(df).repartition(parts),
                                 key="k", order_cols=["t", "id"],
                                 cols=["t", "v"], cfg=CFG) \
            .to_pandas().sort_values("k").set_index("k")
        assert (got["first_t"] == first["t"]).all()
        assert (got["last_t"] == last["t"]).all()
        assert (got["first_v"] == first["v"]).all()
        assert (got["last_v"] == last["v"]).all()


def test_bpe_encode_roundtrip(ray_session, tmp_path):
    """Encode emits one id per merged subword in order; ids decode
    back through the persisted vocab to exactly the merged token
    stream; layout-invariant."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.text import (
        bpe_encode,
        bpe_merge_token_count,
    )

    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": ["the thing that sings", "and another thing", ""],
    })
    vp = str(tmp_path / "vocab")
    got = bpe_encode(rd.from_pandas(docs).repartition(2), vocab_path=vp,
                     cfg=CFG).to_pandas() \
        .sort_values(["doc_id", "pos"]).reset_index(drop=True)
    vocab = pq.read_table(vp + "/vocab.parquet").to_pandas() \
        .set_index("token_id")["token"]
    # per-doc token counts match the merge-count kernel
    counts = bpe_merge_token_count(docs["text"])
    got_counts = got.groupby("doc_id").size()
    assert got_counts.get(1, 0) == counts[0]
    assert got_counts.get(2, 0) == counts[1]
    assert 3 not in got_counts.index  # empty doc -> zero rows
    # decode doc 1: positions contiguous from 0, tokens join sensibly
    d1 = got[got["doc_id"] == 1]
    assert d1["pos"].tolist() == list(range(len(d1)))
    toks = [vocab[t] for t in d1["token_id"]]
    assert "".join(toks).startswith("the")  # 'the' is a learned merge
    # ids are the ranks of the sorted vocabulary
    assert vocab.sort_index().is_monotonic_increasing


def test_impute_by_group(ray_session):
    """Group-mean fill with global fallback: NULLs take the rounded
    group mean of non-null rows; a wholly-null group takes the global
    mean; observed values pass through untouched."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import (
        impute_by_group,
    )
    from aml_entity_resolution_assignment_ray.util import round_half_away

    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b", "c", "c"],
        "v": [10.0, np.nan, 15.0, 7.0, np.nan, np.nan, np.nan],
        "id": np.arange(7, dtype=np.int64),
    })
    got = impute_by_group(rd.from_pandas(df).repartition(3),
                          key="k", col="v", cfg=CFG) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    a_mean = int(round_half_away((10 + 15) / 2))     # 13 (12.5 -> 13)
    g_mean = int(round_half_away((10 + 15 + 7) / 3))  # 11
    assert got["v"].tolist() == [10, a_mean, 15, 7, 7, g_mean, g_mean]
    assert got["was_imputed"].tolist() == [False, True, False, False,
                                           True, True, True]
    with pytest.raises(Exception):
        impute_by_group(
            rd.from_pandas(pd.DataFrame({"k": ["x"], "v": [np.nan]})),
            key="k", col="v", cfg=CFG)


def test_feature_hash(ray_session):
    """Hashing-trick featurization: '<col>:<value>' tokens hash to a
    fixed width, within-row collisions fold by count, layout-invariant."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.sample import (
        _hash_strs,
        feature_hash,
    )

    df = pd.DataFrame({
        "id": np.array([1, 2, 3], dtype=np.int64),
        "a": ["x", "y", "x"],
        "b": ["u", "u", "v"],
    })
    D = 8
    got = feature_hash(rd.from_pandas(df).repartition(2), id_col="id",
                       cat_cols=["a", "b"], n_features=D, cfg=CFG) \
        .to_pandas().sort_values(["id", "feature_idx"]) \
        .reset_index(drop=True)
    exp = {}
    for _, r in df.iterrows():
        for c in ("a", "b"):
            fx = int(_hash_strs(np.asarray([f"{c}:{r[c]}"],
                                           dtype=object))[0] % D)
            exp[(r["id"], fx)] = exp.get((r["id"], fx), 0) + 1
    assert {(r.id, r.feature_idx): r.n
            for r in got.itertuples()} == exp
    assert int(got["n"].sum()) == 6      # every token accounted for
    assert got["feature_idx"].between(0, D - 1).all()


def test_substring_dedup_properties(ray_session):
    """Property sweep on random corpora with planted duplication:
    token accounting is conserved (n_tokens - n_removed == len(cleaned
    tokens)), cleaned tokens are a subsequence of the original, and a
    corpus of all-unique docs is untouched."""
    import random

    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.dedup import substring_dedup

    rng = random.Random(123)
    words = [f"w{i}" for i in range(40)]
    span = " ".join(rng.choices(words, k=9))
    docs = []
    for i in range(30):
        body = " ".join(rng.choices(words, k=rng.randint(0, 25)))
        if i % 3 == 0:
            body = f"{body} {span}"
        docs.append(body)
    df = pd.DataFrame({"doc_id": np.arange(30, dtype=np.int64),
                       "text": docs})
    got = substring_dedup(rd.from_pandas(df).repartition(4), n=8,
                          cfg=CFG).to_pandas().set_index("doc_id")
    for i, t in enumerate(docs):
        toks = t.lower().split()
        row = got.loc[i]
        kept = row["cleaned_text"].split()
        assert row["n_tokens"] == len(toks)
        assert row["n_tokens"] - row["n_removed"] == len(kept)
        it = iter(toks)
        assert all(any(k == x for x in it) for k in kept), i
    # the planted 9-token span fired in every carrier doc
    carriers = [i for i in range(30) if i % 3 == 0]
    assert all(got.loc[i, "n_removed"] >= 9 for i in carriers)

    uniq = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [" ".join(f"u{i}_{j}" for j in range(12))
                 for i in range(5)],
    })
    clean = substring_dedup(rd.from_pandas(uniq), n=8, cfg=CFG) \
        .to_pandas()
    assert (clean["n_removed"] == 0).all()


def test_ks_statistic(ray_session):
    """Exact two-sample KS vs a brute-force CDF scan, including the
    smallest-argmax tie rule and the empty-side guard."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.profile import ks_statistic
    from aml_entity_resolution_assignment_ray.util import round_half_away

    rng = np.random.RandomState(5)
    a = rng.randint(0, 40, 500).astype(np.int64)
    b = (rng.randint(0, 40, 300) + 5).astype(np.int64)
    got = ks_statistic(
        rd.from_pandas(pd.DataFrame({"x": a})).repartition(3),
        rd.from_pandas(pd.DataFrame({"x": b})).repartition(2),
        col="x", cfg=CFG).to_pandas().iloc[0]

    vals = np.unique(np.concatenate([a, b]))
    cdfa = np.searchsorted(np.sort(a), vals, side="right") / len(a)
    cdfb = np.searchsorted(np.sort(b), vals, side="right") / len(b)
    diff = np.abs(cdfa - cdfb)
    i = int(np.argmax(diff))
    assert got["ks"] == float(round_half_away(diff[i], 6))
    assert got["at_value"] == vals[i]
    assert got["n_a"] == 500 and got["n_b"] == 300
    with pytest.raises(Exception):
        ks_statistic(rd.from_pandas(pd.DataFrame({"x": a})),
                     rd.from_pandas(pd.DataFrame({"x": a})).filter(
                         expr="x > 100"),
                     col="x", cfg=CFG).materialize()


def test_grouped_gini(ray_session):
    """Gini vs brute-force mean absolute difference definition
    G = sum_ij |xi - xj| / (2 n^2 mu); all-equal -> 0, all-zero -> 0,
    layout-invariant."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.profile import grouped_gini
    from aml_entity_resolution_assignment_ray.util import round_half_away

    rng = np.random.RandomState(8)
    df = pd.DataFrame({
        "k": ["a"] * 200 + ["eq"] * 50 + ["z"] * 10,
        "v": np.concatenate([
            rng.randint(0, 1000, 200),
            np.full(50, 7),
            np.zeros(10, dtype=int)]).astype(np.int64),
    })
    for parts in (1, 5):
        got = grouped_gini(rd.from_pandas(df).repartition(parts),
                           key="k", col="v", cfg=CFG) \
            .to_pandas().set_index("k")
        for k, sub in df.groupby("k"):
            x = sub["v"].to_numpy(np.float64)
            n, mu = len(x), x.mean()
            exp = 0.0 if mu == 0 else \
                float(np.abs(x[:, None] - x[None, :]).sum()
                      / (2 * n * n * mu))
            assert got.loc[k, "gini"] == float(round_half_away(exp, 6)), k
            assert got.loc[k, "n"] == n
        assert got.loc["eq", "gini"] == 0.0
        assert got.loc["z", "gini"] == 0.0


def test_encode_pipeline_checkpointed(ray_session, tmp_path):
    """Encode pipeline: clean -> dedup -> tokenize -> pack; a rerun
    reuses every stage; pack offsets are consistent with the per-doc
    token counts and the vocabulary decodes every id."""
    import pyarrow.parquet as pq

    from aml_entity_resolution_assignment_ray.pipelines.encode import (
        run_encode_checkpointed,
    )

    docs = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [f"some text body number {i % 13} with shared phrasing"
                 for i in range(40)],
    })
    dp = str(tmp_path / "docs.parquet")
    pq.write_table(__import__("pyarrow").Table.from_pandas(
        docs, preserve_index=False), dp)
    ck = str(tmp_path / "ck")

    res = run_encode_checkpointed(dp, ck, seq_len=32, n_shards=4,
                                  cfg=CFG)
    assert [e["action"] for e in res["manager"].events] == ["built"] * 4
    packed = res["packed"].to_pandas()
    encoded = res["encoded"].to_pandas()
    # dedup kept one doc per distinct text (13 distinct bodies)
    assert len(packed) == 13
    counts = encoded.groupby("doc_id").size()
    m = packed.set_index("doc_id")
    assert (m["n_tokens"].sort_index() == counts.sort_index()).all()
    # offsets within windows; shard assignment within range
    assert m["seq_offset"].between(0, 31).all()
    assert m["shard"].between(0, 3).all()
    vocab = pq.read_table(res["vocab_dir"] + "/vocab.parquet") \
        .to_pandas()
    assert encoded["token_id"].isin(vocab["token_id"]).all()

    res2 = run_encode_checkpointed(dp, ck, seq_len=32, n_shards=4,
                                   cfg=CFG)
    assert [e["action"] for e in res2["manager"].events] == ["reused"] * 4


def test_global_rank(ray_session):
    """row_number() OVER (ORDER BY v, id) via distinct-value offsets +
    keyed within-value ranks: a permutation of 1..n, layout-invariant,
    matching the brute-force lexsort."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import global_rank

    rng = np.random.RandomState(17)
    n = 800
    df = pd.DataFrame({
        "v": rng.randint(0, 50, n).astype(np.int64),   # heavy ties
        "id": rng.permutation(n).astype(np.int64),
    })
    order = np.lexsort((df["id"].to_numpy(), df["v"].to_numpy()))
    exp = np.empty(n, dtype=np.int64)
    exp[order] = np.arange(1, n + 1)
    for parts in (1, 6):
        got = global_rank(rd.from_pandas(df).repartition(parts),
                          val_col="v", tie_col="id", cfg=CFG) \
            .to_pandas().sort_values("id").reset_index(drop=True)
        want = pd.DataFrame({"id": df["id"], "r": exp}) \
            .sort_values("id").reset_index(drop=True)
        assert (got["global_rank"].to_numpy() == want["r"].to_numpy()).all()
        assert sorted(got["global_rank"]) == list(range(1, n + 1))


def test_ecdf_lookup(ray_session):
    """Cross-population ECDF vs brute force: P(B <= v) for every A row,
    values below / inside / above B's support; empty reference raises."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.profile import ecdf_lookup
    from aml_entity_resolution_assignment_ray.util import round_half_away

    b = np.array([10, 10, 20, 30, 30, 30, 50], dtype=np.int64)
    a = pd.DataFrame({"id": np.arange(6, dtype=np.int64),
                      "x": np.array([5, 10, 25, 30, 50, 99],
                                    dtype=np.int64)})
    got = ecdf_lookup(rd.from_pandas(a).repartition(2),
                      rd.from_pandas(pd.DataFrame({"x": b}))
                      .repartition(3), col="x", cfg=CFG) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    exp = [float(round_half_away((b <= v).sum() / len(b), 6))
           for v in a["x"]]
    assert got["ecdf"].tolist() == exp
    assert got["ecdf"].iloc[0] == 0.0 and got["ecdf"].iloc[5] == 1.0
    with pytest.raises(Exception):
        ecdf_lookup(rd.from_pandas(a),
                    rd.from_pandas(pd.DataFrame({"x": b})).filter(
                        expr="x > 1000"),
                    col="x", cfg=CFG)


def test_clean_text_unicode_fuzz(ray_session):
    """Fuzz clean_text vs the DuckDB oracle expression over 300
    adversarial strings mixing control chars, the unicode space block,
    combining diacritics (NFC composition), CJK and multi-byte
    letters — byte-for-byte string equality in one batched compare."""
    import random

    import duckdb
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.text import (
        CTRL_SQL_CLASS,
        WS_DISAGREE_SQL_CLASS,
        clean_text,
    )

    rng = random.Random(99)
    # NO \x00: DuckDB VARCHAR truncates at NUL, so the oracle can never
    # see past one -- an oracle-side representational limit (the engine
    # strips NUL to space like any other control; pinned below), not a
    # parity surface
    pools = [
        "abcXYZ 123",                      # plain
        "\x01\x07\x0e\x1f\x7f",            # stripped controls
        "\t\n\x0b\x0c\r \x85\xa0",         # whitespace family
        "    　",  # unicode spaces
        "éàñç",    # combining (NFC folds)
        "éàñç日本語ßøЖ",                    # precomposed + CJK + cyrillic
    ]
    alphabet = "".join(pools)
    docs = ["".join(rng.choice(alphabet)
                    for _ in range(rng.randint(0, 60)))
            for _ in range(300)]
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                       "text": docs})
    got = clean_text(rd.from_pandas(df).repartition(4), max_chars=25) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("docs", df)
    exp = con.execute(rf"""
        SELECT doc_id,
               rtrim(substr(
                 trim(regexp_replace(
                   regexp_replace(
                     regexp_replace(nfc_normalize(coalesce(text, '')),
                                    '{CTRL_SQL_CLASS}', ' ', 'g'),
                     '{WS_DISAGREE_SQL_CLASS}', ' ', 'g'),
                   '\s+', ' ', 'g')),
                 1, 25), ' ') AS clean_text
        FROM docs ORDER BY doc_id
    """).fetchdf()
    mism = got["clean_text"].to_numpy() != exp["clean_text"].to_numpy()
    assert not mism.any(), (
        f"{mism.sum()} mismatches; first: "
        f"{docs[int(np.where(mism)[0][0])]!r} -> "
        f"{got['clean_text'][int(np.where(mism)[0][0])]!r} vs "
        f"{exp['clean_text'][int(np.where(mism)[0][0])]!r}")

    # NUL pin (engine side only): \x00 is a control char -> space
    nul = clean_text(rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([0], dtype=np.int64),
        "text": ["a\x00b"]})), max_chars=10).to_pandas()
    assert nul.loc[0, "clean_text"] == "a b"


def test_substring_dedup_oracle_fuzz(ray_session):
    """substring_dedup vs the REGISTERED DuckDB oracle on an
    adversarial corpus: tiny vocabulary (dense duplicate 8-grams),
    overlapping repeated runs, punctuation-glued tokens, unicode
    spaces, empty and whitespace-only docs."""
    import random

    import duckdb
    import ray.data as rd

    import __ray_entry__ as entry_mod
    from aml_entity_resolution_assignment_ray.ops.dedup import substring_dedup

    rng = random.Random(77)
    vocab = ["aa", "bb", "cc,", "d.d", "日本", "x"]
    docs = []
    for i in range(80):
        k = rng.randint(0, 30)
        body = " ".join(rng.choice(vocab) for _ in range(k))
        if i % 7 == 0:
            body += " " + " ".join(["aa"] * 12)   # long identical run
        if i % 11 == 0:
            body = body.replace(" ", " ", 1) if " " in body else body
        docs.append(body)
    docs += ["", "   ", "\t\n"]
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})

    got = substring_dedup(rd.from_pandas(df).repartition(5), n=8,
                          cfg=CFG).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("documents", df)
    sql = entry_mod.oracle_sql()["doc_substring_dedup"]
    exp = con.execute(sql).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    for c in ["n_tokens", "n_removed", "cleaned_text"]:
        same = got[c].to_numpy() == exp[c].to_numpy()
        assert same.all(), (c, np.where(~same)[0][:3])
    assert (got["n_removed"] > 0).sum() >= 10   # the corpus is dense


def test_cdc_merge_random_sweep(ray_session):
    """Randomized MERGE semantics sweep vs a pandas reference: random
    keys (including pure inserts), unique seqs, random upsert/delete
    mix, several block layouts."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.relational import cdc_merge

    rng = np.random.RandomState(31)
    base = pd.DataFrame({
        "k": np.arange(50, dtype=np.int64),
        "v": rng.randint(0, 1000, 50).astype(np.int64),
    })
    nch = 300
    changes = pd.DataFrame({
        "k": rng.randint(0, 80, nch).astype(np.int64),   # 50-79 = inserts
        "seq": rng.permutation(np.arange(1, nch + 1)).astype(np.int64),
        "op": np.where(rng.rand(nch) < 0.3, "delete", "upsert"),
        "v": rng.randint(0, 1000, nch).astype(np.int64),
    })
    # pandas reference
    latest = (changes.sort_values("seq").groupby("k").tail(1)
              .set_index("k"))
    exp = {}
    for k in range(80):
        if k in latest.index:
            row = latest.loc[k]
            if row["op"] == "delete":
                continue
            exp[k] = (int(row["v"]), int(row["seq"]))
        elif k < 50:
            exp[k] = (int(base.set_index("k").loc[k, "v"]), 0)
    for parts in (1, 7):
        got = cdc_merge(rd.from_pandas(base).repartition(parts),
                        rd.from_pandas(changes).repartition(parts + 2),
                        key_col="k", seq_col="seq", op_col="op",
                        val_cols=("v",), cfg=CFG) \
            .to_pandas().sort_values("k")
        assert {int(r.k): (int(r.v), int(r.last_seq))
                for r in got.itertuples()} == exp


def test_compact_dedup_index(ray_session, tmp_path):
    """Compaction folds the shard chain to one shard with the
    IDENTICAL survivor set; subsequent ingests keep first-seen-wins
    semantics against the compacted index."""
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.dedup import (
        compact_dedup_index,
        incremental_exact_dedup,
        read_dedup_index,
    )

    idx = str(tmp_path / "idx")
    for k in range(3):
        inc = pd.DataFrame({
            "doc_id": np.arange(k * 10, k * 10 + 10, dtype=np.int64),
            "text": [f"t{(k * 10 + i) % 23}" for i in range(10)],
        })
        incremental_exact_dedup(rd.from_pandas(inc), idx, cfg=CFG)
    before = read_dedup_index(idx).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    import glob
    assert len(glob.glob(idx + "/inc_*")) == 3
    folded = compact_dedup_index(idx)
    assert folded == 3
    assert len(glob.glob(idx + "/inc_*")) == 1
    after = read_dedup_index(idx).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert before.equals(after)
    # a fourth ingest still dedups against the compacted index
    inc4 = pd.DataFrame({
        "doc_id": np.array([100, 101], dtype=np.int64),
        "text": ["t0", "brand new text"],
    })
    got = incremental_exact_dedup(rd.from_pandas(inc4), idx, cfg=CFG) \
        .to_pandas()
    assert got["doc_id"].tolist() == [101]
    # compacting the now-2-shard chain again folds it back to one
    assert compact_dedup_index(idx) == 2
    assert len(read_dedup_index(idx).to_pandas()) == len(after) + 1
    # single-shard compaction is a no-op
    assert compact_dedup_index(idx) == 1


def test_compact_minhash_index(ray_session, tmp_path):
    """MinHash index compaction: identical signature rows, and a
    post-compaction ingest still near-dedups against the folded
    index."""
    import glob

    import ray.data as rd

    from aml_entity_resolution_assignment_ray.ops.dedup import (
        compact_minhash_index,
        incremental_minhash_dedup,
        read_minhash_index,
    )

    idx = str(tmp_path / "midx")
    def body(d):
        return " ".join(f"token{d}x{j} filler{(d * 7 + j) % 91}"
                        for j in range(18))

    for k in range(2):
        inc = pd.DataFrame({
            "doc_id": np.arange(k * 5, k * 5 + 5, dtype=np.int64),
            "text": [body(k * 5 + i) for i in range(5)],
        })
        incremental_minhash_dedup(rd.from_pandas(inc), idx, cfg=CFG)
    before = read_minhash_index(idx).to_pandas() \
        .sort_values("doc").reset_index(drop=True)
    assert len(glob.glob(idx + "/inc_*")) >= 2
    folded = compact_minhash_index(idx)
    assert folded >= 2
    assert len(glob.glob(idx + "/inc_*")) == 1
    after = read_minhash_index(idx).to_pandas() \
        .sort_values("doc").reset_index(drop=True)
    assert before.equals(after)
    # a near-duplicate of an indexed doc drops; a novel doc survives
    inc3 = pd.DataFrame({
        "doc_id": np.array([100, 101], dtype=np.int64),
        "text": [body(0),
                 "a completely different unrelated new document body "
                 "about something else entirely with other words"],
    })
    got = incremental_minhash_dedup(rd.from_pandas(inc3), idx, cfg=CFG) \
        .to_pandas()
    assert got["doc"].astype(str).tolist() == ["101"]
