"""Large-corpus throughput evidence for the document ops.

The driver testdata documents table tops out at 5,000 rows — three
orders of magnitude below where the ops' shuffle/combiner shapes start
to matter.  This script synthesizes a deterministic N-doc corpus
(default 500k docs, ~45 words each, 10% planted exact duplicates,
sharded parquet) and times the headline document ops over it at full
parallelism, printing one JSON line per op with wall seconds and
docs/sec.  Results are recorded in BASELINE.md ("large-corpus
evidence").

A matching N-vector embedding table (planted near-dup clusters, same
group geometry as the text duplicates) evidences the vector ops at the
same scale: build_ivf at the ~sqrt(n) cell heuristic (plus the cell-
balance distribution the probe cost depends on), semdedup_pairs end to
end, and a batched IVF search.

Usage: python scripts/big_corpus_bench.py [n_docs] [num_cpus] [mode]
       mode: all (default) | docs | vectors
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
MODE = sys.argv[3] if len(sys.argv) > 3 else "all"
CORPUS = f"/tmp/er_bigdocs_{N_DOCS}"
VECS = f"/tmp/er_bigvecs_{N_DOCS}"
DIM = 32
SHARDS = 64

# vocab large enough that independent random docs are NOT near-dups
# (a tiny vocab makes every doc pair share most 3-shingles)
_VOCAB = [f"w{i:04d}" for i in range(4980)] + [
    "the", "data", "stream", "merge", "sort", "join", "filter", "batch",
    "window", "key", "hash", "shard", "spill", "scan", "group", "agg",
    "row", "column", "table", "query"]


def _write_corpus():
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(CORPUS) and len(os.listdir(CORPUS)) == SHARDS:
        return
    os.makedirs(CORPUS, exist_ok=True)
    per = N_DOCS // SHARDS
    vocab = np.array(_VOCAB, dtype=object)
    for s in range(SHARDS):
        rng = np.random.RandomState(1000 + s)
        n_words = rng.randint(30, 61, per)
        total = int(n_words.sum())
        words = vocab[rng.randint(0, len(vocab), total)]
        bounds = np.cumsum(n_words)
        texts = np.array(
            [" ".join(words[a:b]) for a, b in
             zip(np.concatenate([[0], bounds[:-1]]), bounds)],
            dtype=object)
        # 10% exact duplicates in SMALL groups (~10 members each, keyed
        # by id // 100): real dedup work without a degenerate single
        # 50k-member group whose within-bucket pair count would be
        # quadratic by definition, not by engine choice
        ids = np.arange(s * per, s * per + per, dtype=np.int64)
        dup = ids % 10 == 7
        group_text = {}

        def _gtext(g: int) -> str:
            if g not in group_text:
                gr = np.random.RandomState(77_000 + g)
                group_text[g] = " ".join(
                    vocab[gr.randint(0, len(vocab), 40)])
            return group_text[g]

        texts[dup] = np.array(
            [_gtext(int(i) // 100) for i in ids[dup]], dtype=object)
        pq.write_table(pa.table({
            "doc_id": pa.array(ids),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(np.take(np.array(["en", "de", "es", "fr"]),
                                     ids % 4)),
            "source": pa.array([f"s{int(i) % 20:02d}" for i in ids]),
        }), os.path.join(CORPUS, f"part_{s:04d}.parquet"))


def _write_vectors():
    """N unit-scale float32 vectors, 10% in planted near-dup clusters
    (~10 members each, base + 1% noise -> pairwise cosine ~0.999) —
    the same group geometry as the planted text duplicates."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(VECS) and len(os.listdir(VECS)) == SHARDS:
        return
    os.makedirs(VECS, exist_ok=True)
    per = N_DOCS // SHARDS
    for s in range(SHARDS):
        rng = np.random.RandomState(5000 + s)
        V = rng.randn(per, DIM).astype(np.float32)
        ids = np.arange(s * per, s * per + per, dtype=np.int64)
        dup = ids % 10 == 7
        bases = {}
        for row in np.where(dup)[0]:
            g = int(ids[row]) // 100
            if g not in bases:
                gr = np.random.RandomState(88_000 + g)
                bases[g] = gr.randn(DIM).astype(np.float32)
            V[row] = bases[g] + 0.01 * np.random.RandomState(
                int(ids[row])).randn(DIM).astype(np.float32)
        pq.write_table(pa.table({
            "vec_id": pa.array(ids),
            "embedding": pa.array([list(map(float, v)) for v in V],
                                  pa.list_(pa.float32())),
        }), os.path.join(VECS, f"part-{s:03d}.parquet"))


N_EDGES = 4 * N_DOCS
N_NODES = N_DOCS // 2
EDGES = f"/tmp/er_bigedges_{N_EDGES}"


def _write_edges():
    """Power-law directed graph: zipf out-degrees (hot hubs — the skew
    case the degree-ordered triangle direction and PageRank's
    contribution split are designed for), uniform destinations."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(EDGES) and len(os.listdir(EDGES)) == SHARDS:
        return
    os.makedirs(EDGES, exist_ok=True)
    per = N_EDGES // SHARDS
    for s in range(SHARDS):
        rng = np.random.RandomState(7000 + s)
        src = rng.zipf(1.3, per) % N_NODES
        dst = rng.randint(0, N_NODES, per)
        pq.write_table(pa.table({
            "src": pa.array([f"n{v}" for v in src], pa.string()),
            "dst": pa.array([f"n{v}" for v in dst], pa.string()),
        }), os.path.join(EDGES, f"part-{s:03d}.parquet"))


def _cell_balance(index_path: str) -> dict:
    """Cell-size distribution from the partitioned index's parquet
    metadata only (no data read)."""
    import glob

    import pyarrow.parquet as pq

    sizes = []
    for d in sorted(glob.glob(os.path.join(index_path, "cells",
                                           "_cell=*"))):
        sizes.append(sum(pq.read_metadata(f).num_rows for f in
                         glob.glob(os.path.join(d, "*.parquet"))))
    a = np.array(sizes, dtype=np.int64)
    return {"ncells": len(a), "mean": round(float(a.mean()), 1),
            "p50": int(np.percentile(a, 50)),
            "p99": int(np.percentile(a, 99)), "max": int(a.max()),
            "max_over_mean": round(float(a.max() / a.mean()), 2)}


def main():
    _write_corpus()
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.config import EngineConfig
    from aml_entity_resolution_assignment_ray.ops import dedup, text
    from aml_entity_resolution_assignment_ray.ops.sample import (
        source_mixture_weights,
    )
    from aml_entity_resolution_assignment_ray.util import tune_context

    tune_context(nparts=max(8, min(256, N_DOCS // 20_000)))
    cfg = EngineConfig()

    def read():
        return rd.read_parquet(CORPUS, columns=["doc_id", "text"])

    results = {}

    def timed(name, fn):
        t0 = time.time()
        n = fn()
        wall = time.time() - t0
        results[name] = {"sec": round(wall, 2),
                         "docs_per_sec": round(N_DOCS / wall),
                         "out_rows": int(n)}
        print(json.dumps({"op": name, **results[name]}), flush=True)

    if MODE in ("all", "docs"):
        timed("token_stats", lambda: text.token_stats(read()).count())
        timed("quality", lambda: text.quality(read()).count())
        timed("doc_chunks", lambda: text.chunk_documents(
            read(), size=32, stride=24).count())
        timed("exact_dedup", lambda: dedup.exact_dedup(
            read(), cfg=cfg, n_rows=N_DOCS).count())
        timed("substring_dedup", lambda: dedup.substring_dedup(
            read(), n=8, cfg=cfg).count())
        timed("minhash_dup_pairs", lambda: dedup.minhash_lsh_dup_pairs(
            read(), threshold=0.8, cfg=cfg).count())
        timed("lm_score", lambda: text.bigram_lm_score(
            read(), cfg=cfg).count())
        timed("source_mixture", lambda: source_mixture_weights(
            rd.read_parquet(CORPUS, columns=["source", "text"])).count())

    if MODE in ("all", "vectors"):
        import shutil

        from aml_entity_resolution_assignment_ray.ops.ann import (
            IVFIndex, build_ivf)

        _write_vectors()

        def vread():
            return rd.read_parquet(VECS)

        ivf_path = f"/tmp/er_bigvecs_ivf_{N_DOCS}"
        shutil.rmtree(ivf_path, ignore_errors=True)
        timed("build_ivf_sqrt_n", lambda: len(build_ivf(
            vread(), ncells=None, index_path=ivf_path).centroids))
        results["build_ivf_sqrt_n"]["cell_balance"] = \
            _cell_balance(ivf_path)
        print(json.dumps({"op": "cell_balance",
                          **results["build_ivf_sqrt_n"]["cell_balance"]}),
              flush=True)

        def _search():
            idx = IVFIndex.load(ivf_path)
            q = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                          for r in vread().take(64)])
            return len(idx.search(q, k=10, nprobe=4))

        timed("ivf_search_64q", _search)
        # default (bounded ~256-row cells => LINEAR candidate volume)
        sd_path = f"/tmp/er_bigvecs_sd_{N_DOCS}"
        shutil.rmtree(sd_path, ignore_errors=True)
        timed("semdedup_pairs_cell256", lambda: dedup.semdedup_pairs(
            vread(), ncells=None, threshold=0.9, index_path=sd_path,
            cfg=cfg).count())
        results["semdedup_pairs_cell256"]["cell_balance"] = \
            _cell_balance(sd_path)
        # sqrt(n) cells for comparison: candidate volume n^1.5 — at
        # 500k that is ~177M hydrated pairs (a ~90 GB verify shuffle),
        # which is exactly the blow-up the cell~256 default avoids, so
        # the comparison leg only runs where it stays tractable
        if N_DOCS <= 100_000:
            sd_path2 = f"/tmp/er_bigvecs_sd_sqrtn_{N_DOCS}"
            shutil.rmtree(sd_path2, ignore_errors=True)
            timed("semdedup_pairs_sqrtn", lambda: dedup.semdedup_pairs(
                vread(), ncells=int(N_DOCS ** 0.5), threshold=0.9,
                index_path=sd_path2, cfg=cfg).count())

    if MODE in ("all", "graph"):
        from aml_entity_resolution_assignment_ray.ops.graph import (
            pagerank, triangle_counts)

        _write_edges()

        def eread():
            return rd.read_parquet(EDGES)

        n_edges = N_EDGES

        def timed_g(name, fn):
            t0 = time.time()
            n = fn()
            wall = time.time() - t0
            results[name] = {"sec": round(wall, 2),
                             "edges_per_sec": round(n_edges / wall),
                             "out_rows": int(n)}
            print(json.dumps({"op": name, **results[name]}), flush=True)

        timed_g("pagerank_3iter", lambda: pagerank(
            eread(), iterations=3, cfg=cfg).count())
        timed_g("triangle_counts", lambda: triangle_counts(
            eread(), a="src", b="dst", cfg=cfg).count())

    print(json.dumps({"metric": "big_corpus_docs_ops", "n_docs": N_DOCS,
                      "num_cpus": NUM_CPUS, "mode": MODE,
                      "load_avg": list(os.getloadavg()),
                      "ops": results}), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
