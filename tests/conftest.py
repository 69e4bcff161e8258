from __future__ import annotations

import pytest

from osmi_water_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="osmi-water-tests", master="local[4]", shuffle_partitions=4)
    yield s
