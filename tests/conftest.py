from __future__ import annotations

import pytest

from torspider_spark.sources.corpus import CorpusSpec, build_corpus_local


@pytest.fixture(scope="session")
def spark():
    from torspider_spark.session import get_spark

    return get_spark(app_name="torspider_tests", master="local[8]",
                     shuffle_partitions=8)


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory) -> tuple[str, CorpusSpec]:
    spec = CorpusSpec(n_hosts=25, pages_per_host=12, n_hot_hosts=2,
                      hot_multiplier=10, n_seeds=4)
    out = str(tmp_path_factory.mktemp("corpus"))
    build_corpus_local(spec, out)
    return out, spec
