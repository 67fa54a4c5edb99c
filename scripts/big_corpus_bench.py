"""Large-corpus throughput evidence for the document ops.

The driver testdata documents table tops out at 5,000 rows — three
orders of magnitude below where the ops' shuffle/combiner shapes start
to matter.  This script synthesizes a deterministic N-doc corpus
(default 500k docs, ~45 words each, 10% planted exact duplicates,
sharded parquet) and times the headline document ops over it at full
parallelism, printing one JSON line per op with wall seconds and
docs/sec.  Results are recorded in BASELINE.md ("large-corpus
evidence").

Usage: python scripts/big_corpus_bench.py [n_docs] [num_cpus]
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
CORPUS = f"/tmp/er_bigdocs_{N_DOCS}"
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

    timed("token_stats", lambda: text.token_stats(read()).count())
    timed("quality", lambda: text.quality(read()).count())
    timed("doc_chunks", lambda: text.chunk_documents(
        read(), size=32, stride=24).count())
    timed("exact_dedup", lambda: dedup.exact_dedup(
        read(), cfg=cfg, n_rows=N_DOCS).count())
    timed("minhash_dup_pairs", lambda: dedup.minhash_lsh_dup_pairs(
        read(), threshold=0.8, cfg=cfg).count())
    timed("lm_score", lambda: text.bigram_lm_score(
        read(), cfg=cfg).count())
    timed("source_mixture", lambda: source_mixture_weights(
        rd.read_parquet(CORPUS, columns=["source", "text"])).count())
    print(json.dumps({"metric": "big_corpus_docs_ops", "n_docs": N_DOCS,
                      "num_cpus": NUM_CPUS, "load_avg": list(os.getloadavg()),
                      "ops": results}), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
