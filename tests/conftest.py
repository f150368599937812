import pytest
import ray
import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """FIXTURES.md sf=tiny corpus: 300 docs, 6 shards, seed 42."""
    from recursive_pdf_extraction_and_rag_ray.sources.pages_gen import synthesize_corpus
    out = str(tmp_path_factory.mktemp("pages"))
    paths = synthesize_corpus(out, n_docs=300, n_shards=6, seed=42)
    return out, paths
