from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from ingest_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ingest-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
