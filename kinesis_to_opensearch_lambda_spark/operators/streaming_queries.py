"""Oracle-checked streaming query: the full reference lifecycle —
envelope source -> decode -> foreachBatch dual-sink fan-out — driven to
completion with Trigger.AvailableNow, with delivered counts compared to
the batch ground truth.

This is the one `queries()` entry that runs an actual StreamingQuery;
its oracle is exact because the availableNow drain is deterministic and
both sinks count via accumulators (R17).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..queries import register
from ..sinks import OpenSearchBulkSink, SplunkHECSink, SpoolDirTransport
from ..sources.batch import fan_out, load_table
from ..sources.kinesis import audit_events_from_events, kinesis_envelope, read_envelope_stream
from ..streaming.pipeline import decode_stream, dual_sink_fanout


@register(
    "streaming_fanout_counts",
    oracle="""
    SELECT 'opensearch' AS sink, count(*) AS n_delivered FROM events
    UNION ALL
    SELECT 'splunk' AS sink, count(*) AS n_delivered FROM events
    """,
    doc="End-to-end Structured Streaming run (R1/R16): events -> Kinesis "
    "envelope parquet -> readStream -> decode -> foreachBatch dual sink "
    "(availableNow). Both sinks must deliver every event exactly once.",
)
def streaming_fanout_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tempfile.mkdtemp(prefix="stream_fanout_")
    try:
        events = fan_out(load_table(spark, sf_dir, "events"))
        env = kinesis_envelope(audit_events_from_events(events))
        env.write.mode("overwrite").parquet(f"{d}/src")

        es = OpenSearchBulkSink(
            transport_factory=lambda: SpoolDirTransport(f"{d}/es")
        )
        hec = SplunkHECSink(
            transport_factory=lambda: SpoolDirTransport(f"{d}/hec")
        )
        stream = decode_stream(read_envelope_stream(spark, f"{d}/src"))
        q = dual_sink_fanout(stream, es, hec, f"{d}/ckpt")
        q.awaitTermination(600)
        rows = [
            ("opensearch", es.last_success),
            ("splunk", hec.last_success),
        ]
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(rows, "sink: string, n_delivered: bigint")
