"""Two identical runs must produce identical outputs (SURVEY §5: fixed
minhash permutation seed, canonical pair order, no time/random in
kernels — required for resume correctness)."""

import pandas as pd
import pytest

from aml_entity_resolution_assignment_ray.config import EngineConfig
from aml_entity_resolution_assignment_ray.pipelines.flagship import run_flagship
from aml_entity_resolution_assignment_ray.sources.synth import generate_corpus


def _run():
    import ray.data as rd

    transcripts, _, _ = generate_corpus(
        n_entities=100, seed=44, doppelganger_rate=0.0)
    cfg = EngineConfig(join_num_partitions=4)
    res = run_flagship(rd.from_arrow(transcripts), cfg)
    cls = res["classified"].to_pandas()[
        ["id_a", "id_b", "match_type", "confidence_score", "is_match"]
    ].sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pred = res["predictions"].to_pandas().sort_values("conv_id") \
        .reset_index(drop=True)
    return cls, pred


def test_two_runs_identical(ray_session):
    cls1, pred1 = _run()
    cls2, pred2 = _run()
    pd.testing.assert_frame_equal(cls1, cls2)
    pd.testing.assert_frame_equal(pred1, pred2)
