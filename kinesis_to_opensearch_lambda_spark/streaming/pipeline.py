"""Streaming pipeline wiring (SURVEY.md §3.1 Spark mapping).

The reference's whole lifecycle — Kinesis batch in, decode, fan-out to
two sinks (lambda_function.py:140-148) — is one streaming query here:

    readStream (envelope) -> decode/normalize (operators.pipeline)
      -> writeStream.foreachBatch(fan-out)

Inside ``foreachBatch`` the micro-batch is persisted once and written
to both sinks — one source read, two writes, exactly the reference's
shape (the two-`writeStream` alternative would read the source twice;
SURVEY.md §2A R16).

Delivery semantics: checkpointed offsets + at-least-once sinks; the ES
path is made effectively idempotent by the deterministic doc id
(lambda_function.py:81), whose streaming twin here is
``dropDuplicatesWithinWatermark`` on ``random_id``; the Splunk path
duplicates on redelivery, identical to the reference.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import pipeline as P


def decode_stream(envelope_stream: DataFrame, tolerant: bool = False) -> DataFrame:
    """R2-R5+R7 over a streaming envelope frame (narrow ops only — the
    streaming plan stays stateless and shuffle-free).

    ``tolerant=True`` keeps undecodable records in the frame as NULL-key
    rows (use :func:`split_dead_letters` to route them); the default
    strict mode fails the batch on structurally invalid base64, matching
    the reference's redelivery semantics.
    """
    df = P.decode_kinesis(envelope_stream, tolerant=tolerant)
    df = P.with_event_timestamp(df)
    df = P.nullify_empty_ip(df)
    if tolerant:
        return df  # caller splits dead letters; don't drop them silently
    return P.drop_null_records(df)


def split_dead_letters(decoded: DataFrame, key_col: str = "random_id"):
    """Route a tolerant-mode stream into (good, dead) frames.

    Dead letters keep only the raw payload + a reason tag — enough to
    replay after a fix.  Both frames derive from one decode (the
    generator barrier in decode_kinesis guarantees single evaluation per
    consumer branch inside the same foreachBatch pass when the batch is
    persisted).
    """
    from pyspark.sql import functions as F

    good = decoded.filter(F.col(key_col).isNotNull())
    dead = decoded.filter(F.col(key_col).isNull()).select(
        F.col("_raw").alias("raw_payload"),
        F.lit("decode_or_parse_failure").alias("reason"),
    )
    return good, dead


def replay_dedup(decoded: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """R9 streaming flavour: drop redelivered doc ids within the
    watermark horizon — state-store-backed, bounded memory (the
    reference delegates this dedup to the ES ``_id`` upsert)."""
    return decoded.withColumn(
        "event_time", F.to_timestamp("datetime")
    ).withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["random_id"]
    )


def dual_sink_fanout(
    decoded: DataFrame,
    es_sink,
    splunk_sink,
    checkpoint_dir: str,
    available_now: bool = True,
    dedup_watermark: str | None = None,
    on_batch: Callable[[int, int], None] | None = None,
) -> StreamingQuery:
    """R16: one micro-batch, two sinks, single source read.

    ``available_now=True`` drains everything currently in the source
    and stops — the test/batch-replay trigger; production uses the
    default micro-batch trigger.
    """
    stream = decoded
    if dedup_watermark is not None:
        stream = replay_dedup(stream, dedup_watermark)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()  # decode once, write twice (SURVEY §4)
        try:
            _, es_total = es_sink.write(batch_df)      # projected (R6)
            _, sp_total = splunk_sink.write(batch_df)  # full record (R13/R14)
            if on_batch is not None:
                # Row count comes from the sinks' write-job accumulators —
                # no extra job per micro-batch.  Both sinks see every batch
                # row, so max() covers a disabled sink (reports 0); the
                # count() fallback fires only when both are disabled.
                n = max(es_total, sp_total)
                on_batch(epoch_id, n if n else batch_df.count())
        finally:
            batch_df.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update" if dedup_watermark else "append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- event-time windowed aggregations (reference has none; SURVEY §2B) --

def hourly_counts(
    events: DataFrame, ts_col: str = "ts", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1h window counts with late-data watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n")
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window counts (overlapping windows)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), F.col("w.end").alias("win_end"), "n")
    )


def session_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native streaming sessionization (session_window) — the streaming
    twin of operators.relational.sessionize."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(F.count("*").alias("n_events"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
