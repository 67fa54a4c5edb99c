"""Corpus ENCODE pipeline: clean text -> exact dedup -> tokenize to
ids against a corpus-learned vocabulary -> pack into fixed-length
training sequences — the artifact-producing half of training-data
prep (corpus_prep.py is the filtering half), checkpointed per stage so
a killed encode run resumes and an unchanged config reruns nothing.

Stage graph:  cleaned <- ops/text.clean_text of the docs parquet
              deduped <- exact dedup ON THE CLEANED TEXT (deps: cleaned)
              encoded <- bpe_encode long-form (doc_id, pos, token_id),
                         vocabulary persisted under the checkpoint root
                         (deps: deduped)
              packed  <- pack_sequences shard/seq/offset assignment from
                         the per-doc token counts (deps: encoded)

Scale shape: every stage is a transform from the ops library — the
clean is stateless, dedup is one digest shuffle, encode is a stateless
map against the broadcast vocab (vocab itself comes from the
distinct-subword combiner), packing is one keyed shuffle on the shard.
"""

from __future__ import annotations

import os

import pandas as pd

from ..config import DEFAULT_CONFIG, EngineConfig


def run_encode_checkpointed(docs_path: str, checkpoint_root: str,
                            max_chars: int = 2000, seq_len: int = 256,
                            n_shards: int = 8,
                            cfg: EngineConfig = DEFAULT_CONFIG,
                            run_id: str = "encode"):
    import numpy as np
    import ray.data as rd

    from ..ops.dedup import exact_dedup
    from ..ops.relational import keyed_sum
    from ..ops.sample import pack_sequences
    from ..ops.text import bpe_encode, clean_text
    from ..state.checkpoint import CheckpointManager

    mgr = CheckpointManager(
        checkpoint_root, run_id=run_id,
        config={**cfg.to_dict(), "max_chars": max_chars,
                "seq_len": seq_len, "n_shards": n_shards},
        input_path=docs_path)
    vocab_dir = os.path.join(checkpoint_root, run_id, "vocab")

    cleaned = mgr.stage(
        "cleaned",
        lambda: clean_text(rd.read_parquet(docs_path),
                           max_chars=max_chars))
    deduped = mgr.stage(
        "deduped",
        lambda: exact_dedup(cleaned, col="clean_text",
                            id_col="doc_id", cfg=cfg),
        deps=["cleaned"])
    encoded = mgr.stage(
        "encoded",
        lambda: bpe_encode(deduped, col="clean_text", id_col="doc_id",
                           vocab_path=vocab_dir, cfg=cfg),
        deps=["deduped"])

    def _pack():
        lengths = keyed_sum(
            encoded.map_batches(
                lambda d: pd.DataFrame({
                    "doc_id": d["doc_id"],
                    "n_tokens": np.ones(len(d), dtype=np.int64)}),
                batch_format="pandas"),
            ["doc_id"], ["n_tokens"], cfg)
        return pack_sequences(lengths, id_col="doc_id",
                              len_col="n_tokens", seq_len=seq_len,
                              n_shards=n_shards, cfg=cfg)

    packed = mgr.stage("packed", _pack, deps=["encoded"])
    return {"cleaned": cleaned, "deduped": deduped, "encoded": encoded,
            "packed": packed, "vocab_dir": vocab_dir, "manager": mgr}
