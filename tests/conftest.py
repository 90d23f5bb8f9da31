import pytest

from colbert_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("colbert_spark_tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_corpus():
    """1k-row deterministic web_pages corpus (FIXTURES.md t1 scale)."""
    from colbert_spark.sources.synth import synth_web_pages

    return synth_web_pages(1000)


@pytest.fixture(scope="session")
def tiny_queries():
    from colbert_spark.sources.synth import synth_queries

    return synth_queries(50)
