from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("VSE_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = os.environ.get("VSE_TEST_SF_DIR_MED", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from vector_search_engine_spark.session import get_spark

    s = get_spark("vse-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def sf_dir_med() -> str:
    return SF_DIR_MED


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    from vector_search_engine_spark import load_table

    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="session")
def embeddings_np(embeddings):
    """(ids, matrix) NumPy view of the embeddings fixture for oracles."""
    import numpy as np

    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    V = np.array([r.embedding for r in rows], dtype=np.float32)
    return ids, V
