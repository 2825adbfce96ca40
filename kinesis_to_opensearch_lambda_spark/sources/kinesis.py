"""Kinesis-envelope source emulation.

The reference consumes AWS-pushed Kinesis batches: ``event["Records"]``,
payload base64-encoded JSON at ``record["kinesis"]["data"]``
(lambda_function.py:44-45,140-141; envelope reproduced by the test
helper test_lambda_function.py:64-67).

In production the engine binds ``spark.readStream.format("aws-kinesis")``
(the Structured Streaming Kinesis connector) — :func:`open_audit_stream`
probes the session's DataSource registry and uses the real connector
whenever its jar is on the classpath, falling back to file-based
envelope emulation otherwise (this image has no connector jar, so CI
exercises the fallback branch and the probe's False path):

- :func:`kinesis_connector_available` — classpath capability probe.
- :func:`open_audit_stream` — probe-and-bind R1 source; both branches
  emit the same one-column base64(JSON) ``kinesis_data`` shape.
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


def kinesis_connector_available(
    spark: SparkSession, source_format: str = "aws-kinesis"
) -> bool:
    """Capability probe: is the Structured Streaming Kinesis connector
    registered on this session's classpath?

    Asks Spark's own DataSource registry (the exact lookup
    ``readStream.format(...)`` performs) instead of guessing class
    names — connector distributions register different provider
    classes under the same short name.  No stream is opened; the probe
    is a metadata lookup.
    """
    try:
        jvm = spark._jvm
        jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            source_format, jvm.org.apache.spark.sql.internal.SQLConf.get()
        )
        return True
    except Exception:
        return False


def open_audit_stream(
    spark: SparkSession,
    *,
    stream_name: str | None = None,
    region: str | None = None,
    fallback_path: str | None = None,
    source_format: str = "aws-kinesis",
    endpoint_url: str | None = None,
    initial_position: str = "LATEST",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The R1 source with a capability probe (lambda_function.py:140-141
    is the consumed Kinesis envelope): bind the REAL connector when its
    jar is on the classpath and a ``stream_name`` is configured, else
    fall back to the file-based envelope emulation at ``fallback_path``.

    Both branches emit the identical one-column ``kinesis_data``
    base64(JSON) shape, so the downstream decode chain
    (operators.pipeline.decode_kinesis) is source-agnostic — swapping
    emulation for the live stream is a config change, not a code
    change.
    """
    if stream_name is not None and kinesis_connector_available(spark, source_format):
        return read_kinesis_stream(
            spark,
            stream_name,
            region or "us-east-1",
            endpoint_url=endpoint_url,
            initial_position=initial_position,
            source_format=source_format,
        )
    if fallback_path is None:
        raise ValueError(
            f"Kinesis connector '{source_format}' unavailable (or no "
            "stream_name configured) and no fallback_path given"
        )
    return read_envelope_stream(
        spark, fallback_path, max_files_per_trigger=max_files_per_trigger
    )


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
