import os

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def mid_corpus(tmp_path_factory):
    """134-doc corpus (mirrors demo130 scale), 4 shards."""
    from datacapsule_ray.fixtures import write_corpus

    d = str(tmp_path_factory.mktemp("corpus_mid"))
    files = write_corpus(d, n_docs=134, seed=42, docs_per_file=34)
    return d, files


SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
