"""Kinesis-envelope source emulation.

The reference consumes AWS-pushed Kinesis batches: ``event["Records"]``,
payload base64-encoded JSON at ``record["kinesis"]["data"]``
(lambda_function.py:44-45,140-141; envelope reproduced by the test
helper test_lambda_function.py:64-67).

In production the engine would bind ``spark.readStream.format("kinesis")``
(the Structured Streaming Kinesis connector); that jar is not in this
image, so the source is pluggable:

- :func:`audit_events_from_events` — deterministic mapping of the driver's
  ``events`` table into audit-shaped records (fixture generator).
- :func:`kinesis_envelope` — wraps any frame into the one-column
  base64(JSON) stream shape.
- :func:`read_envelope_stream` — file-based streaming source emitting the
  same envelope, used by streaming tests with Trigger.AvailableNow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.pipeline import encode_kinesis

ENVELOPE_SCHEMA = T.StructType([T.StructField("kinesis_data", T.StringType())])

# ISO-8601 with microseconds, no tz — the reference's datetime shape
# (test_lambda_function.py:27, parsed by fromisoformat at lambda_function.py:80).
ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def audit_events_from_events(events: DataFrame) -> DataFrame:
    """Deterministically reshape the driver ``events`` table into the
    reference's audit-event record (FIXTURES.md §1.2).

    ``event_type='error'`` rows get an empty ``ip`` so the R5
    empty-ip-drop path is exercised on real data.
    """
    return events.select(
        F.date_format("ts", ISO_FMT).alias("datetime"),
        F.concat(F.lit("ev-"), F.col("event_id").cast("string")).alias("random_id"),
        (F.col("user_id") % 10).alias("kind_id"),
        F.col("user_id").alias("account_id"),
        (F.col("user_id") * 100).alias("performer_id"),
        (F.col("event_id") % 1000).alias("repository_id"),
        F.when(F.col("event_type") == "error", F.lit("")).otherwise(
            F.concat(F.lit("10.0.0."), (F.col("user_id") % 256).cast("string"))
        ).alias("ip"),
        F.create_map(
            F.lit("k"), F.get_json_object("props", "$.k")
        ).alias("metadata"),
        F.col("event_type").alias("performer_kind"),
        F.concat(F.lit("/api/"), F.col("event_type")).alias("request_url"),
    )


def kinesis_envelope(audit_df: DataFrame) -> DataFrame:
    """Wrap audit records into the base64(JSON) Kinesis payload column."""
    return encode_kinesis(audit_df)


def read_kinesis_stream(
    spark: SparkSession,
    stream_name: str,
    region: str,
    endpoint_url: str | None = None,
    initial_position: str = "LATEST",
    source_format: str = "aws-kinesis",
) -> DataFrame:
    """Bind the real Structured Streaming Kinesis connector
    (``spark-sql-kinesis``; the production R1 source).  The connector
    jar is not in this image, so this raises a clear error locally —
    tests and local runs use :func:`read_envelope_stream` instead.

    The returned stream carries the connector's ``data`` binary column;
    select ``base64(data) AS kinesis_data`` to feed the same decode
    chain the envelope emulation uses.
    """
    reader = (
        spark.readStream.format(source_format)
        .option("streamName", stream_name)
        .option("region", region)
        .option("initialPosition", initial_position)
    )
    if endpoint_url:
        reader = reader.option("endpointUrl", endpoint_url)
    try:
        stream = reader.load()
    except Exception as exc:  # pragma: no cover - depends on jars
        raise RuntimeError(
            f"Kinesis connector '{source_format}' is not on the classpath; "
            "add the spark-sql-kinesis connector jar, or use "
            "read_envelope_stream() for file-based emulation"
        ) from exc
    return stream.select(F.base64(F.col("data")).alias("kinesis_data"))


def read_envelope_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming source over envelope Parquet files (test stand-in for
    the Kinesis connector; one file ≈ one Kinesis batch)."""
    reader = spark.readStream.schema(ENVELOPE_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
