"""Parquet table sink, daily-partitioned.

The analytical materialization of the reference's daily index routing
(lambda_function.py:80): rows land under ``event_date=yyyy-MM-dd/``
partitions, so downstream reads get partition pruning for free — the
query-side equivalent of OpenSearch's per-day indexes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ParquetSink:
    path: str
    datetime_col: str = "datetime"
    mode: str = "append"
    name: str = "parquet"
    last_success: int = field(default=0, init=False)
    last_total: int = field(default=0, init=False)

    def write(self, df: DataFrame) -> tuple[int, int]:
        out = df.withColumn(
            "event_date",
            F.date_format(F.to_timestamp(F.col(self.datetime_col)), "yyyy-MM-dd"),
        )
        out.write.mode(self.mode).partitionBy("event_date").parquet(self.path)
        n = df.count()
        self.last_success = self.last_total = n
        return n, n
