"""OpenSearch-bulk-shaped sink (reference elasticsearch_handler,
lambda_function.py:56-88).

Reproduces the action shape and semantics:

- daily index routing: ``index_prefix + yyyy-MM-dd(datetime)``
  (lambda_function.py:80);
- deterministic doc id = ``random_id`` → idempotent replays
  (lambda_function.py:81);
- bulk chunks with ``max_retries=3`` and error containment
  (lambda_function.py:84-86);
- null records skipped (the :78-79 None-guard; unlike the reference's
  reporting quirk they are not counted in the delivered total).

Each delivered line is one bulk action serialized JVM-side as
``{"_index": ..., "_id": ..., "_source": {...}}``; a production
transport would emit the two-line bulk wire format from it.  With the
opensearch-hadoop connector available this whole class collapses to
connector options (``es.mapping.id=random_id``,
``es.batch.write.retry.count=3``) — the sink exists so the engine has
reference-shaped semantics without a non-hermetic dependency.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.pipeline import daily_index_col, project_es
from .base import ChunkedTransportSink


@dataclass
class OpenSearchBulkSink(ChunkedTransportSink):
    name: str = "opensearch"
    index_prefix: str = "logs-"
    id_col: str = "random_id"
    datetime_col: str = "datetime"
    project: bool = True  # apply the ES allowlist (lambda_function.py:144)

    def serialize(self, df: DataFrame) -> DataFrame:
        doc = project_es(df) if self.project else df
        # to_json drops null fields -> dict-key-absence parity with the
        # reference's popped keys (SURVEY.md §7 "absent-vs-null").
        action = F.to_json(
            F.struct(
                daily_index_col(self.index_prefix, self.datetime_col).alias("_index"),
                F.col(self.id_col).alias("_id"),
                F.struct(*[doc[c] for c in doc.columns]).alias("_source"),
            )
        )
        return df.filter(F.col(self.id_col).isNotNull()).select(
            action.alias("payload")
        )
