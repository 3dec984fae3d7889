import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawl4ai_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="crawl4ai_spark_tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def corpus():
    from crawl4ai_spark.sources.corpus import generate_corpus

    return generate_corpus(seed=42, n_hosts=4, pages_per_host=15)


@pytest.fixture(scope="session")
def corpus_spark(spark, corpus):
    return {name: spark.createDataFrame(pdf) for name, pdf in corpus.items() if name != "images"}
