from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from gdal_spark.session import get_spark

    s = get_spark(app_name="gdal_spark-tests", cores=8, shuffle_partitions=8)
    yield s
