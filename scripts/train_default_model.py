"""Train and save the package's default match-probability model.

Reference analog: ``python -m src.train_model`` (train_model.py:123-133).
Trains the numpy GBDT (reference XGBoost hyperparameters) on the seeded
synthetic transcript corpus WITH 5% doppelgangers (hard negatives, the
reference generator's design intent, generation.py:153-166) and writes
``aml_entity_resolution_assignment_ray/models/default_model.json``.

Run: python scripts/train_default_model.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from aml_entity_resolution_assignment_ray.config import EngineConfig
    from aml_entity_resolution_assignment_ray.pipelines.train import train_model
    from aml_entity_resolution_assignment_ray.sources.synth import generate_corpus

    out = os.path.join(os.path.dirname(__file__), "..",
                       "aml_entity_resolution_assignment_ray", "models",
                       "default_model.json")
    transcripts, truth, _ = generate_corpus(
        n_entities=1500, seed=7, doppelganger_rate=0.05)
    t0 = time.time()
    model, report = train_model(
        rd.from_arrow(transcripts), rd.from_arrow(truth),
        EngineConfig(model_path=""), save_path=os.path.abspath(out))
    print("trained in %.1fs -> %s" % (time.time() - t0, out))
    print(report)
    ray.shutdown()


if __name__ == "__main__":
    main()
