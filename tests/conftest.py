import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_automation_system_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="pytest", master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def corpus_path(tmp_path_factory):
    """Small deterministic synthetic corpus written once per test session."""
    from ocr_automation_system_spark.corpus import write_corpus

    path = str(tmp_path_factory.mktemp("corpus") / "documents.parquet")
    write_corpus(path, n_rows=300, seed=42)
    return path
