from __future__ import annotations

import pytest

from chomper_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("chomper-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_table(tmp_path):
    return str(tmp_path / "table")
