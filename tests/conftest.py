from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from smartglass_ocr_spark.session import get_spark

    s = get_spark("smartglass-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()
