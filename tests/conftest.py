from __future__ import annotations

import pytest

from slowly_changing_dimensions_data_engineering_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sds-tests", cpus=4, shuffle_partitions=4)
    yield s
