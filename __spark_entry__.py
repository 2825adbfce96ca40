"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in
``kinesis_to_opensearch_lambda_spark.queries`` — one registered entry
per operator from SURVEY.md §2 (each with its DuckDB oracle unless the
operator is not SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kinesis_to_opensearch_lambda_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference-parity
    pipeline chain (Kinesis envelope decode → normalize → daily index
    routing → per-index counts)."""
    return REGISTRY["pipeline_daily_index"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query (omitted -> rows-only check)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
