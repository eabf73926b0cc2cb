from __future__ import annotations

import pytest

from benthos_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app="benthos-spark-tests",
        cores=4,
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.streaming.statefulOperator.checkCorrectness.enabled": "false",
            "spark.driver.memory": "4g",
        },
    )
    yield s
