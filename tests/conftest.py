from __future__ import annotations

import pytest

from deepblocker_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="deepblocker-tests",
        master="local[4]",
        shuffle_partitions=4,
        arrow_max_records=2_000,
    )
    yield s
    s.stop()
