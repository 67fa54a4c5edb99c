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
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # test corpora are tiny: the default 200-way shuffle parallelism
    # drowns them in per-task overhead
    ctx.min_parallelism = 8
    ctx.default_hash_shuffle_parallelism = 8
    ctx.read_op_min_num_blocks = 8
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """Seeded synthetic transcript corpus shared by pipeline tests."""
    from aml_entity_resolution_assignment_ray.sources.synth import generate_corpus

    transcripts, truth, records = generate_corpus(n_entities=150, seed=42)
    return {"transcripts": transcripts, "truth": truth, "records": records}


SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
