from __future__ import annotations

import pytest

from kinesis_to_opensearch_lambda_spark.session import get_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="engine-tests", cpus=8)
    yield s
