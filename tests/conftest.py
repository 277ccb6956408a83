from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from anomalydetection_spark import get_spark

    s = get_spark(
        "pytest",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
