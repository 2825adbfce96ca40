"""Every registered query hash-matches its DuckDB oracle at sf0.001 —
the local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from kinesis_to_opensearch_lambda_spark.queries import REGISTRY

from .conftest import SF_DIR
from .oracle_compare import assert_parity


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_parity(spark, name):
    assert_parity(spark, name, SF_DIR)
