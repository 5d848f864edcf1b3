from __future__ import annotations

import pytest

from aqi_featurestore_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("aqi-featurestore-tests", shuffle_partitions=8)
    yield s
    s.stop()
