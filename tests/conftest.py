from __future__ import annotations

import pytest

from kinesis_to_opensearch_lambda_spark.session import get_session

# The driver's correctness gate runs at sf0.01 — the local parity tests
# match it exactly (sf0.001 let data-dependent filters pass trivially on
# empty result sets).
SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="engine-tests", cpus=8)
    yield s
