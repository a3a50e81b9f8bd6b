from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from index_search_monorepo_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    from index_search_monorepo_spark.sources.synthetic import generate_corpus

    out = tmp_path_factory.mktemp("corpus")
    return str(
        generate_corpus(
            out,
            n_docs=40,
            n_poison=4,
            min_pages=1,
            max_pages=12,
            skew_fraction=0.1,
            skew_pages=30,
        )
    )


@pytest.fixture(scope="session")
def tables(spark, corpus_dir):
    from index_search_monorepo_spark.plans.pipeline import load_corpus

    return load_corpus(spark, corpus_dir)
