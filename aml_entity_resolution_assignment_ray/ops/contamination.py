"""Benchmark decontamination: flag corpus documents sharing token
n-grams with a benchmark/eval set (the GPT-3/PaLM-style exact-overlap
check a training-data pipeline runs before every release).

Scale design (the benchmark side is small, the corpus side is 100 TB):

* Both sides explode to per-doc DISTINCT token n-grams.  Gram identity
  travels as a uint64 digest (``pd.util.hash_array``) — 8 bytes per
  gram instead of the string (collision odds at 2^64 are negligible
  and deterministic for a fixed corpus).
* Benchmark grams are counted first.  Under ``cfg.broadcast_max_rows``
  the distinct digest set is broadcast (``ray.put`` of one sorted
  uint64 array, fetched once per worker) and every corpus task counts
  its docs' contaminated grams with one vectorized ``np.isin`` —
  ZERO shuffles over the corpus.
* Above the gate the check degrades to a distributed semi-join: the
  corpus gram table hash-joins the benchmark gram table on the digest
  and re-aggregates hits per doc — two keyed shuffles of 16-byte rows,
  never the documents themselves.

Both paths emit identical results (pinned by
tests/test_ops.py::test_contamination_paths_agree).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from ..config import DEFAULT_CONFIG, EngineConfig
from .text import _WS_DISAGREE_RE


def _norm_tokens(text: pd.Series) -> list[list[str]]:
    """Whitespace tokens of lowercased, ws-normalized text — the same
    normalization contract as token_count_batch, so the DuckDB oracle
    (lower + RE2 ``\\s+`` collapse + split on ' ') tokenizes
    identically."""
    t = (text.fillna("").astype(str)
         .str.replace(_WS_DISAGREE_RE, " ", regex=True).str.lower())
    return [s.split() for s in t]


def _doc_gram_digests(df: pd.DataFrame, col: str, id_col: str,
                      n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_ids, per-doc gram counts, concatenated DISTINCT gram digests).

    Gram generation is inherently per-row (ragged token lists), but the
    expensive part — hashing every gram — is ONE vectorized
    ``pd.util.hash_array`` over the exploded gram column."""
    ids, grams, counts = [], [], []
    for doc, toks in zip(df[id_col], _norm_tokens(df[col])):
        gs = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
        ids.append(doc)
        counts.append(len(gs))
        grams.extend(gs)
    digests = pd.util.hash_array(np.asarray(grams, dtype=object))
    return (np.asarray(ids), np.asarray(counts, dtype=np.int64), digests)


def _bench_grams_batch(df: pd.DataFrame, col: str, id_col: str,
                       n: int) -> pd.DataFrame:
    _, _, digests = _doc_gram_digests(df, col, id_col, n)
    return pd.DataFrame({"gram_h": np.unique(digests)})


class _BroadcastCount:
    """Stateful counter: the sorted benchmark digest array is fetched
    once per worker; each batch counts contaminated grams per doc with
    one np.isin over its exploded digests."""

    def __init__(self, bench_ref, col: str, id_col: str, n: int,
                 keep_cols: tuple = ()):
        self.bench = ray.get(bench_ref)  # sorted uint64 array
        self.col = col
        self.id_col = id_col
        self.n = n
        self.keep_cols = keep_cols

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, counts, digests = _doc_gram_digests(
            df, self.col, self.id_col, self.n)
        hit = np.isin(digests, self.bench, assume_unique=False)
        # per-doc hit counts over the ragged digest layout via cumsum
        # differences (reduceat mishandles zero-length segments)
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
        csum = np.concatenate([[0], np.cumsum(hit.astype(np.int64))])
        nhits = csum[np.cumsum(counts)] - csum[offs]
        out = pd.DataFrame({
            self.id_col: ids,
            "n_contaminated_grams": nhits.astype(np.int64),
            "contaminated": nhits > 0,
        })
        for c in self.keep_cols:  # rows align with the input batch order
            out[c] = df[c].to_numpy()
        return out


def _corpus_grams_batch(df: pd.DataFrame, col: str, id_col: str,
                        n: int) -> pd.DataFrame:
    ids, counts, digests = _doc_gram_digests(df, col, id_col, n)
    return pd.DataFrame({
        id_col: np.repeat(ids, counts),
        "gram_h": digests,
    })


def ngram_contamination(corpus, benchmark, n: int = 8, col: str = "text",
                        id_col: str = "doc_id",
                        keep_cols: tuple = (),
                        cfg: EngineConfig = DEFAULT_CONFIG):
    """Per corpus doc: how many of its DISTINCT token ``n``-grams appear
    anywhere in ``benchmark``, plus the boolean flag.  Docs with fewer
    than ``n`` tokens have zero grams and are clean by definition.

    Returns a Dataset (id_col, n_contaminated_grams:int64,
    contaminated:bool, *keep_cols passed through) with one row per
    corpus doc — ``keep_cols`` lets a pipeline keep filtering inline
    (flag -> filter -> next stage) without a join back to the corpus."""
    from ..util import safe_join, stateful_map

    bench_grams = (
        benchmark.map_batches(
            _bench_grams_batch, fn_kwargs={"col": col, "id_col": id_col,
                                           "n": n},
            batch_format="pandas")
    )
    nparts = cfg.resolve_join_partitions()
    # global distinct: hash-partition by digest, per-block exact distinct
    # (per-batch unique already shrank the exploded volume)
    bench_grams = (
        bench_grams.repartition(nparts, keys=["gram_h"])
        .map_batches(lambda d: d.drop_duplicates("gram_h"),
                     batch_format="pandas", batch_size=None)
        .materialize())
    n_grams = bench_grams.count()
    if n_grams <= cfg.broadcast_max_rows:
        arr = np.sort(bench_grams.to_pandas()["gram_h"].to_numpy()
                      .astype(np.uint64)) if n_grams else \
            np.array([], dtype=np.uint64)
        ref = ray.put(arr)
        return stateful_map(corpus, _BroadcastCount,
                            (ref, col, id_col, n, keep_cols),
                            batch_format="pandas")
    # distributed semi-join path: corpus gram digests x benchmark digests
    corp = corpus.map_batches(
        _corpus_grams_batch, fn_kwargs={"col": col, "id_col": id_col,
                                        "n": n},
        batch_format="pandas")
    hits = safe_join(corp, bench_grams, "inner", nparts, ("gram_h",))
    # re-key by doc and count per block (doc-complete after the shuffle)
    counts = (
        hits.repartition(nparts, keys=[id_col])
        .map_batches(
            lambda d: d.groupby(id_col, sort=False).size()
            .reset_index(name="n_contaminated_grams"),
            batch_format="pandas", batch_size=None))
    all_ids = corpus.select_columns([id_col, *keep_cols])
    out = safe_join(all_ids, counts, "left_outer", nparts, (id_col,))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        c = (df["n_contaminated_grams"].fillna(0).astype(np.int64)
             if "n_contaminated_grams" in df.columns
             else pd.Series(np.zeros(len(df), dtype=np.int64)))
        res = pd.DataFrame({
            id_col: df[id_col],
            "n_contaminated_grams": c,
            "contaminated": c > 0,
        })
        for kc in keep_cols:
            res[kc] = df[kc].to_numpy()
        return res

    return out.map_batches(finalize, batch_format="pandas")
