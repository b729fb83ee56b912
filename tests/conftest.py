import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from horus_ner_spark.session import get_spark

    s = get_spark("horus-tests", cores=os.environ.get("SPARK_TEST_CPUS", "8"),
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf001_index(spark, tmp_path_factory):
    """Build the sf0.001 corpus + index once per test session."""
    from horus_ner_spark.corpus import write_corpus
    from horus_ner_spark.index.build import build_index

    root = tmp_path_factory.mktemp("sf001")
    corpus_path = write_corpus(spark, str(root), sf=0.001)
    paths = build_index(spark, corpus_path, str(root / "index"))
    return corpus_path, paths
