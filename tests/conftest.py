import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """One Ray session for the whole pytest run (TESTDATA.md contract)."""
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
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """Small planted corpus shared by linkage tests (seed-fixed)."""
    from biomedical_entity_linking_ray.config import SynthConfig
    from biomedical_entity_linking_ray.synth import generate_corpus

    return generate_corpus(SynthConfig().scaled(0.08))


@pytest.fixture(scope="module")
def linkage_result(small_corpus):
    """One full pipeline run shared by the assertion tests (module-scoped so
    its pinned object-store datasets release before later test modules)."""
    import ray.data as rd

    from biomedical_entity_linking_ray.config import LinkageConfig
    from biomedical_entity_linking_ray.pipelines.linkage import run_linkage

    files = rd.from_arrow(small_corpus.files)
    cfg = LinkageConfig(salt_cap=32, join_partitions=4, scorer_concurrency=2)
    return cfg, run_linkage(files, cfg, feature_concurrency=2)


SF_DIR = "/root/testdata/sf0.001"
