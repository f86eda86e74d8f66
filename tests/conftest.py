"""Shared fixtures: one SparkSession for the whole test run (JVM startup
is ~15 s), plus tiny deterministic corpora."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finddup_spark.corpus import write_pages_parquet  # noqa: E402
from finddup_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="finddup-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """(pages_path, truth_path) for a 500-row seeded corpus."""
    d = tmp_path_factory.mktemp("corpus")
    return write_pages_parquet(str(d), n_rows=500, seed=42)


@pytest.fixture(scope="session")
def sf0001():
    return os.path.join(TESTDATA, "sf0.001")


@pytest.fixture(scope="session")
def sf001():
    return os.path.join(TESTDATA, "sf0.01")
