"""Checkpoint / resume tests (north_rule: killed runs resume; stale
configs invalidate)."""

import json
import os
import shutil

import pytest

from aml_entity_resolution_assignment_ray.config import EngineConfig
from aml_entity_resolution_assignment_ray.pipelines.checkpointed import (
    run_flagship_checkpointed,
)
from aml_entity_resolution_assignment_ray.sources.synth import write_corpus
from aml_entity_resolution_assignment_ray.state.checkpoint import CheckpointManager


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpt_corpus"))
    write_corpus(d, shards=4, n_entities=120, seed=43, doppelganger_rate=0.0)
    return os.path.join(d, "transcripts")


def test_checkpointed_run_and_resume(ray_session, corpus_dir, tmp_path):
    root = str(tmp_path / "ckpts")
    cfg = EngineConfig(join_num_partitions=4)

    res1 = run_flagship_checkpointed(corpus_dir, root, cfg)
    ev1 = {e["stage"]: e["action"] for e in res1["manager"].events}
    assert ev1 == {"profiles": "built", "pairs": "built",
                   "classified": "built", "clusters": "built"}
    pred1 = res1["predictions"].to_pandas().sort_values("conv_id") \
        .reset_index(drop=True)

    # resume: everything reused, identical output
    res2 = run_flagship_checkpointed(corpus_dir, root, cfg)
    ev2 = {e["stage"]: e["action"] for e in res2["manager"].events}
    assert ev2 == {"profiles": "reused", "pairs": "reused",
                   "classified": "reused", "clusters": "reused"}
    pred2 = res2["predictions"].to_pandas().sort_values("conv_id") \
        .reset_index(drop=True)
    assert pred1.equals(pred2)

    # kill-after-stage-k: drop the classified+clusters checkpoints;
    # profiles/pairs must be reused, later stages rebuilt, output equal
    for name in ("classified", "clusters"):
        shutil.rmtree(os.path.join(root, "flagship", name))
        os.remove(os.path.join(root, "flagship", f"{name}.manifest.json"))
    res3 = run_flagship_checkpointed(corpus_dir, root, cfg)
    ev3 = {e["stage"]: e["action"] for e in res3["manager"].events}
    assert ev3 == {"profiles": "reused", "pairs": "reused",
                   "classified": "built", "clusters": "built"}
    pred3 = res3["predictions"].to_pandas().sort_values("conv_id") \
        .reset_index(drop=True)
    assert pred1.equals(pred3)


def test_checkpointed_join_strategy(ray_session, corpus_dir, tmp_path):
    """The checkpointed pipeline honors the hydrate-strategy gate: a
    forced join path (what 'auto' picks when profiles exceed
    broadcast_max_rows) builds, resumes, and matches the broadcast run."""
    cfg_b = EngineConfig(join_num_partitions=4, hydrate_strategy="broadcast")
    cfg_j = EngineConfig(join_num_partitions=4, hydrate_strategy="join")

    res_b = run_flagship_checkpointed(corpus_dir, str(tmp_path / "b"), cfg_b)
    pred_b = res_b["predictions"].to_pandas().sort_values("conv_id") \
        .reset_index(drop=True)

    res_j = run_flagship_checkpointed(corpus_dir, str(tmp_path / "j"), cfg_j)
    pred_j = res_j["predictions"].to_pandas().sort_values("conv_id") \
        .reset_index(drop=True)
    assert pred_b.equals(pred_j)

    # join-path resume: all four stages reused, identical predictions
    res_j2 = run_flagship_checkpointed(corpus_dir, str(tmp_path / "j"), cfg_j)
    ev = {e["stage"]: e["action"] for e in res_j2["manager"].events}
    assert set(ev.values()) == {"reused"}
    pred_j2 = res_j2["predictions"].to_pandas().sort_values("conv_id") \
        .reset_index(drop=True)
    assert pred_j.equals(pred_j2)


def test_manifest_contents(ray_session, corpus_dir, tmp_path):
    root = str(tmp_path / "ck2")
    cfg = EngineConfig(join_num_partitions=4)
    run_flagship_checkpointed(corpus_dir, root, cfg)
    with open(os.path.join(root, "flagship", "pairs.manifest.json")) as f:
        m = json.load(f)
    assert m["stage"] == "pairs"
    assert m["deps"] == ["profiles"]
    assert m["rows"] > 0 and m["wall_s"] > 0
    assert m["n_partitions"] == len(m["partitions"]) >= 1
    assert sum(p["rows"] for p in m["partitions"]) == m["rows"]
    assert all(p["bytes"] > 0 for p in m["partitions"])


def test_config_change_invalidates(ray_session, corpus_dir, tmp_path):
    root = str(tmp_path / "ck3")
    res1 = run_flagship_checkpointed(
        corpus_dir, root, EngineConfig(join_num_partitions=4))
    assert all(e["action"] == "built" for e in res1["manager"].events)
    # different blocking config -> different lineage -> full rebuild
    res2 = run_flagship_checkpointed(
        corpus_dir, root,
        EngineConfig(join_num_partitions=4, max_block_records=500))
    assert all(e["action"] == "built" for e in res2["manager"].events)


def test_dependency_ordering_enforced(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck4"))
    with pytest.raises(ValueError):
        mgr.lineage_hash("b", ["never_built"])


def test_input_change_invalidates(ray_session, tmp_path):
    """ADVICE: rerunning `match` against a DIFFERENT corpus but the same
    checkpoint dir must rebuild, not silently reuse stale results."""
    from aml_entity_resolution_assignment_ray.config import EngineConfig
    from aml_entity_resolution_assignment_ray.pipelines.checkpointed import (
        run_flagship_checkpointed,
    )
    from aml_entity_resolution_assignment_ray.sources.synth import write_corpus

    cfg = EngineConfig(join_num_partitions=4)
    ck = str(tmp_path / "ck")
    c1 = str(tmp_path / "corpus1")
    c2 = str(tmp_path / "corpus2")
    write_corpus(c1, shards=2, n_entities=30, seed=1, doppelganger_rate=0.0)
    write_corpus(c2, shards=2, n_entities=40, seed=2, doppelganger_rate=0.0)
    import os

    r1 = run_flagship_checkpointed(os.path.join(c1, "transcripts"), ck, cfg)
    assert all(e["action"] == "built" for e in r1["manager"].events)
    n1 = r1["predictions"].count()
    # same corpus -> full reuse
    r1b = run_flagship_checkpointed(os.path.join(c1, "transcripts"), ck, cfg)
    assert all(e["action"] == "reused" for e in r1b["manager"].events)
    # different corpus, same checkpoint dir -> rebuild
    r2 = run_flagship_checkpointed(os.path.join(c2, "transcripts"), ck, cfg)
    assert all(e["action"] == "built" for e in r2["manager"].events)
    assert r2["predictions"].count() != n1


def test_corpus_prep_checkpointed(ray_session, tmp_path):
    """Checkpointed data prep: build -> full reuse -> touching the
    BENCHMARK rebuilds only the decontamination stage (benchmark is a
    registered input dep of `prepped`, not a config entry), while
    touching the DOCS rebuilds everything."""
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aml_entity_resolution_assignment_ray.pipelines.corpus_prep import (
        run_corpus_prep_checkpointed,
    )

    good = ("the quick brown fox jumps over the lazy dog and then it "
            "runs back home to rest for the evening with friends and "
            "that is what it always does at the end of the day")
    docs_p = str(tmp_path / "docs.parquet")
    bench_p = str(tmp_path / "bench.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [good, good, good + " with a distinct suffix here ok"],
    })), docs_p)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": [9], "text": ["nothing shared with the corpus docs"],
    })), bench_p)
    root = str(tmp_path / "prep_ck")
    cfg = EngineConfig(join_num_partitions=4)

    def actions(res):
        return {e["stage"]: e["action"] for e in res["manager"].events}

    r1 = run_corpus_prep_checkpointed(docs_p, bench_p, root, cfg=cfg)
    assert actions(r1) == {"deduped": "built", "filtered": "built",
                           "prepped": "built"}
    out1 = r1["prepped"].to_pandas().sort_values("doc_id")
    assert out1["doc_id"].tolist() == [1, 3]  # doc 2 is an exact dup

    r2 = run_corpus_prep_checkpointed(docs_p, bench_p, root, cfg=cfg)
    assert actions(r2) == {"deduped": "reused", "filtered": "reused",
                           "prepped": "reused"}

    # new benchmark content -> ONLY the decontamination stage rebuilds,
    # and a doc sharing its grams is now dropped
    time.sleep(0.01)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": [9], "text": [good],
    })), bench_p)
    r3 = run_corpus_prep_checkpointed(docs_p, bench_p, root, cfg=cfg)
    assert actions(r3) == {"deduped": "reused", "filtered": "reused",
                           "prepped": "built"}
    assert r3["prepped"].count() == 0
    # the empty checkpoint still carries the stage schema on disk
    import glob

    import pyarrow.parquet as _pq

    files = glob.glob(os.path.join(root, "corpus_prep", "prepped",
                                   "*.parquet"))
    assert files and _pq.read_table(files[0]).schema.names == [
        "doc_id", "n_chars_text", "n_tokens", "quality_score"]

    # docs change -> root stage (and the chain) rebuilds
    time.sleep(0.01)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": [1], "text": [good],
    })), docs_p)
    r4 = run_corpus_prep_checkpointed(docs_p, bench_p, root, cfg=cfg)
    assert actions(r4) == {"deduped": "built", "filtered": "built",
                           "prepped": "built"}
