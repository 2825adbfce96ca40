"""R17 observability (plan-side counters, streaming listener) and the
custom stateful streaming operator (applyInPandasWithState)."""

from __future__ import annotations

import time

import pyspark.sql.functions as F

from kinesis_to_opensearch_lambda_spark.sinks import SplunkHECSink, SpoolDirTransport
from kinesis_to_opensearch_lambda_spark.sources.batch import load_table
from kinesis_to_opensearch_lambda_spark.streaming.observe import (
    BatchProgressListener,
    observed,
)
from kinesis_to_opensearch_lambda_spark.streaming.stateful import running_user_totals

from .test_transforms import FULL_RECORD, decoded


def test_observed_counts_ride_the_write(spark, tmp_path):
    records = [dict(FULL_RECORD, random_id=f"o-{i}") for i in range(9)]
    df = decoded(spark, records)
    df_obs, obs = observed(df, "sinkpass")
    df_obs.write.parquet(str(tmp_path / "out"))  # counters ride this pass
    assert obs.get == {"n_rows": 9, "n_null_key": 0}


def test_sink_accumulator_counters(spark, tmp_path):
    # foreachPartition sinks count via accumulators (R17), not Observation
    records = [dict(FULL_RECORD, random_id=f"o-{i}") for i in range(9)]
    sink = SplunkHECSink(
        transport_factory=lambda: SpoolDirTransport(str(tmp_path / "s"))
    )
    ok, total = sink.write(decoded(spark, records))
    assert (ok, total) == (9, 9)
    assert (sink.last_success, sink.last_total) == (9, 9)


def test_streaming_listener_counts_rows(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "src")
    events.limit(100).write.parquet(src)
    listener = BatchProgressListener()
    spark.streams.addListener(listener)
    try:
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            stream.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered asynchronously
        deadline = time.time() + 30
        while listener.total_rows < 100 and time.time() < deadline:
            time.sleep(0.5)
        assert listener.total_rows == 100
    finally:
        spark.streams.removeListener(listener)


def test_stateful_running_totals_across_batches(spark, tmp_path):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "src")
    # two files -> with maxFilesPerTrigger=1, two micro-batches
    events.limit(400).repartition(2).write.parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    totals = running_user_totals(stream)
    q = (
        totals.writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # last emitted row per user must equal the batch ground truth
    got = spark.sql(
        """
        SELECT user_id, total_events, round(total_value, 2) AS total_value
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY total_events DESC
          ) AS rn FROM user_totals
        ) WHERE rn = 1
        """
    )
    expected = (
        spark.read.parquet(src)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("total_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    assert got.subtract(expected).count() == 0
    assert expected.subtract(got).count() == 0
    # state genuinely crossed batches: some user got rows in both files
    n_batches = spark.sql(
        "SELECT count(*) c FROM user_totals"
    ).collect()[0].c
    assert n_batches > expected.count()  # updates emitted per batch
