from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_model_vectorsearch_spark import get_spark, load_tables  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"  # t1: every operator executes
SF_CORRECT = "/root/testdata/sf0.01"  # t2: oracle hash-match


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_SMOKE)


@pytest.fixture(scope="session")
def tables_sf001(spark):
    return load_tables(spark, SF_CORRECT)
