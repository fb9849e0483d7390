import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mel_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mel_spark_tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_tables():
    """Deterministic tiny synthetic repos corpus (FIXTURES.md scale 'tiny')."""
    from mel_spark.datagen import GenConfig, generate_repos

    return generate_repos(GenConfig(n_files=300, seed=42))


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("MEL_TEST_SF_DIR", "/root/testdata/sf0.001")
