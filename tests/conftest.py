import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole test run (driver contract: library
    code never calls ray.init itself)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from aml_entity_resolution_assignment_ray.util import tune_context

    # test corpora are tiny: the default 200-way shuffle parallelism
    # drowns them in per-task overhead
    tune_context(nparts=8)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """Seeded synthetic transcript corpus shared by pipeline tests."""
    from aml_entity_resolution_assignment_ray.sources.synth import generate_corpus

    transcripts, truth, records = generate_corpus(n_entities=150, seed=42)
    return {"transcripts": transcripts, "truth": truth, "records": records}


SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
