from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from kafka_dead_letter_analyzer_spark import get_spark

    s = get_spark(app_name="kdla-tests", shuffle_partitions=4)
    yield s
    s.stop()
