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
            # Spark 4.1's BatchCommitTracker can mis-fire on a batch whose
            # query was deliberately killed mid-commit (the kill/resume
            # tests do exactly that); the ledger sink asserts the real
            # exactly-once property, so the internal validation is noise
            # here. Seen as STATE_STORE_COMMIT_VALIDATION_FAILED under
            # suite load; passes standalone.
            "spark.sql.streaming.stateStore.commitValidation.enabled": "false",
            "spark.driver.memory": "4g",
        },
    )
    yield s
