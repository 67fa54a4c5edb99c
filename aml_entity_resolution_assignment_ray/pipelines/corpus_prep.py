"""Composite LLM training-data preparation pipeline.

The end-to-end chain a pretraining corpus actually runs, expressed as
one streaming Dataset composition (every stage is a transform from the
ops library — no driver-side loops, no full materialization except the
stage-boundary ones the underlying ops already make):

    exact dedup  ->  quality score + language ID  ->  filter
      ->  benchmark n-gram decontamination (inline flag + filter)
      ->  token counting  ->  (doc_id, n_chars_text, n_tokens,
                               quality_score)

Scale shape: exact_dedup is one digest-keyed shuffle with a per-block
combiner; quality/LID/token stats are stateless vectorized maps; the
decontamination flag is a broadcast np.isin (zero corpus shuffles)
below the gate and a digest semi-join above it, with the survivor
columns passed through inline (``keep_cols``) so no join back to the
corpus is ever needed.  Every filter drops rows as the stream flows —
the full corpus is never resident.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..ops.contamination import ngram_contamination
from ..ops.dedup import exact_dedup
from ..ops.text import _WS_DISAGREE_RE, _WS_RE, lang_id_batch, quality_batch


def _enrich_filter(df: pd.DataFrame, col: str, id_col: str,
                   quality_min: float, lang: str) -> pd.DataFrame:
    df = lang_id_batch(quality_batch(df, col=col), col=col)
    keep = (df["quality_score"] >= quality_min) & (df["lang_pred"] == lang)
    return df.loc[keep, [id_col, col, "quality_score"]]


def _finalize_prep(df: pd.DataFrame, col: str, id_col: str) -> pd.DataFrame:
    df = df.loc[~df["contaminated"]]
    # whitespace token count only (token_count_batch's BPE columns
    # are 40 merge passes this pipeline doesn't need)
    text = (df[col].fillna("").astype(str)
            .str.replace(_WS_DISAGREE_RE, " ", regex=True))
    stripped = text.str.strip()
    n_tokens = np.where(stripped.str.len() == 0, 0,
                        stripped.str.split(_WS_RE).str.len())
    return pd.DataFrame({
        id_col: df[id_col],
        "n_chars_text": df[col].fillna("").astype(str).str.len()
        .astype(np.int64),
        "n_tokens": n_tokens.astype(np.int64),
        "quality_score": df["quality_score"].astype(np.float64),
    })


def _decontaminate(kept, benchmark, contamination_n: int, col: str,
                   id_col: str, cfg: EngineConfig):
    flagged = ngram_contamination(
        kept, benchmark, n=contamination_n, col=col, id_col=id_col,
        keep_cols=(col, "quality_score"), cfg=cfg)
    return flagged.map_batches(
        _finalize_prep, fn_kwargs={"col": col, "id_col": id_col},
        batch_format="pandas")


def corpus_prep(docs, benchmark, quality_min: float = 0.35,
                lang: str = "en", contamination_n: int = 4,
                col: str = "text", id_col: str = "doc_id",
                cfg: EngineConfig = DEFAULT_CONFIG,
                n_rows: int | None = None):
    """Prepare ``docs`` for training against a held-out ``benchmark``.

    Returns a Dataset (id_col, n_chars_text:int64, n_tokens:int64,
    quality_score:float64) — one row per surviving doc: exact-unique
    text (smallest id wins), quality_score >= ``quality_min``,
    language == ``lang``, and sharing no ``contamination_n``-gram with
    the benchmark."""
    deduped = exact_dedup(docs, col=col, id_col=id_col, cfg=cfg,
                          n_rows=n_rows)
    kept = deduped.map_batches(
        _enrich_filter,
        fn_kwargs={"col": col, "id_col": id_col,
                   "quality_min": quality_min, "lang": lang},
        batch_format="pandas")
    return _decontaminate(kept, benchmark, contamination_n, col, id_col, cfg)


def run_corpus_prep_checkpointed(docs_path: str, benchmark_path: str,
                                 checkpoint_root: str,
                                 quality_min: float = 0.35,
                                 lang: str = "en", contamination_n: int = 4,
                                 col: str = "text", id_col: str = "doc_id",
                                 cfg: EngineConfig = DEFAULT_CONFIG,
                                 run_id: str = "corpus_prep"):
    """Checkpointed corpus prep (north_rule resumability applied to the
    data-prep axis): each stage is a Parquet checkpoint with lineage +
    per-partition metrics, so a killed prep run resumes at the last
    completed stage — and reruns nothing when inputs and config are
    unchanged.  The benchmark fingerprint participates in the lineage,
    so swapping the eval set invalidates exactly the decontamination
    stage (and nothing upstream of it).

    Stage graph:  deduped <- exact dedup of the docs parquet
                  filtered <- quality + language gate       (deps: deduped)
                  prepped <- decontaminate + token counts   (deps: filtered)
    """
    import ray.data as rd

    from ..state.checkpoint import CheckpointManager

    mgr = CheckpointManager(
        checkpoint_root, run_id=run_id,
        config={**cfg.to_dict(), "quality_min": quality_min, "lang": lang,
                "contamination_n": contamination_n},
        input_path=docs_path)
    mgr.register_input("benchmark", benchmark_path)

    deduped = mgr.stage(
        "deduped",
        lambda: exact_dedup(rd.read_parquet(docs_path), col=col,
                            id_col=id_col, cfg=cfg))
    filtered = mgr.stage(
        "filtered",
        lambda: deduped.map_batches(
            _enrich_filter,
            fn_kwargs={"col": col, "id_col": id_col,
                       "quality_min": quality_min, "lang": lang},
            batch_format="pandas"),
        deps=["deduped"])
    prepped = mgr.stage(
        "prepped",
        lambda: _decontaminate(filtered, rd.read_parquet(benchmark_path),
                               contamination_n, col, id_col, cfg),
        deps=["filtered", "benchmark"])
    return {"deduped": deduped, "filtered": filtered, "prepped": prepped,
            "manager": mgr}
