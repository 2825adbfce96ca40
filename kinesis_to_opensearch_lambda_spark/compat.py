"""Drop-in compatibility facade for the reference's Lambda entry point.

A user of ``app-sre/kinesis-to-opensearch-lambda`` invokes
``handler(event, context)`` with the AWS Kinesis event envelope
(lambda_function.py:140-148).  This module accepts the *same* event
dict, runs the engine's DataFrame pipeline over it, and fans out to the
same two sinks — so switching repos is changing an import.

The sinks are injected (defaults come from :class:`config.EngineConfig`)
and the SparkSession is reused across invocations; for real streams use
``streaming.dual_sink_fanout`` instead — this shim exists for
batch-shaped, Lambda-style invocation parity.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from .config import EngineConfig
from .operators import pipeline as P
from .sinks import OpenSearchBulkSink, SplunkHECSink
from .sinks.splunk import is_disabled


def records_to_envelope_df(spark: SparkSession, event: dict[str, Any]):
    """AWS event dict -> one-column envelope frame
    (``record["kinesis"]["data"]``, lambda_function.py:44-45).

    Driver-side by construction AND bounded by construction: the input
    is a Lambda event — a dict AWS materialized in the function's
    memory, capped by the service at 10,000 records / 6 MB per
    invocation — so building rows on the driver is inherent to the
    shim's contract, not a scale leak.  Unbounded sources (real
    streams, files) never pass through here; they enter via
    ``sources.kinesis`` / ``sources.batch`` as distributed reads."""
    rows = [(r["kinesis"]["data"],) for r in event.get("Records", [])]
    return spark.createDataFrame(rows, "kinesis_data: string")


def handler(
    event: dict[str, Any],
    context: Any = None,
    *,
    spark: SparkSession | None = None,
    config: EngineConfig | None = None,
    es_sink: OpenSearchBulkSink | None = None,
    splunk_sink: SplunkHECSink | None = None,
) -> dict[str, int]:
    """Reference-parity handler: decode -> normalize -> ES branch
    (projected) + Splunk branch (full record).

    Returns per-sink delivered counts plus the reference's ``total``
    denominator.  Counter quirk carried over exactly: the reference
    prints ``success/total`` where ``total = len(processed_records)``
    for BOTH branches (lambda_function.py:87-88,137-138) — the
    denominator counts records the ES branch skipped for a missing
    ``random_id`` (the ``None``-guard at :78-79), so a run that skips
    one record reports ``1/2``, not ``1/1``.
    """
    if spark is None:
        from .session import get_session

        spark = get_session(app_name="lambda-compat")
    config = config or EngineConfig()

    env = records_to_envelope_df(spark, event)
    df = P.decode_kinesis(env)
    df = P.with_event_timestamp(df)
    df = P.nullify_empty_ip(df)
    df.persist()  # one decode, two sinks (lambda_function.py:141,144,148)
    try:
        total = df.count()  # the reference's shared denominator
        result = {"elasticsearch": 0, "splunk": 0, "total": total}
        if es_sink is not None:
            # The None/null-key guard applies ONLY to the ES branch
            # (lambda_function.py:78-79 skips, :81 keys on random_id);
            # the Splunk branch receives every successfully parsed
            # record regardless of random_id (:117-126,148).  The sink
            # itself filters null ids (sinks/opensearch.py serialize).
            ok, _ = es_sink.write(P.drop_null_records(df))
            result["elasticsearch"] = ok
            print(f"Successfully processed {ok}/{total} items for opensearch")
        if splunk_sink is not None and not is_disabled(config.splunk_disabled):
            ok, _ = splunk_sink.write(df)
            result["splunk"] = ok
            print(f"Successfully processed {ok}/{total} items to Splunk")
        return result
    finally:
        df.unpersist()
