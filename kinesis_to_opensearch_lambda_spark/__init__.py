"""PySpark-native analytics engine with the query/data-processing
capabilities of ``app-sre/kinesis-to-opensearch-lambda``.

The reference (read-only snapshot at ``/root/reference``) is a single-file
AWS Lambda ETL: Kinesis batch in, base64+JSON decode, normalize, then
fan-out to an OpenSearch bulk sink (projected record, daily index,
deterministic doc id) and a Splunk HEC sink (full record, 500-chunked
HTTP POST).  See ``SURVEY.md`` for the full inventory with citations.

This engine re-expresses that surface Spark-first:

- ``operators.pipeline``  — decode/normalize/project/route transforms
  (reference ``lambda_function.py:43-54,80-81``) as composable DataFrame
  functions driven by Catalyst, not per-row Python.
- ``sources``             — batch Parquet table loaders + a Kinesis-envelope
  emulation source for streaming tests.
- ``sinks``               — pluggable sink protocol: collecting (tests),
  parquet (daily-partitioned), OpenSearch-bulk-shaped and Splunk-HEC-shaped
  adapters with the reference's chunking/retry/error-containment semantics.
- ``streaming``           — Structured Streaming wiring: foreachBatch
  dual-sink fan-out, replay dedup, watermarks, event-time windows.
- ``operators.relational / dedup / similarity / text / multimodal`` —
  the batch-analytics extension surface (joins, aggs, windows, exact +
  MinHash/SimHash dedup, ANN similarity search, text analysis, multimodal
  binary column plumbing) designed for 100 TB scale.
"""

__version__ = "0.1.0"
