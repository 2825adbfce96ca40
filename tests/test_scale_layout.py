"""Storage-layout scale evidence: daily partition pruning on the
parquet sink's output, and bucketed tables co-locating joins without a
shuffle — the two on-disk layouts a 100 TB deployment relies on."""

from __future__ import annotations

import pyspark.sql.functions as F

from kinesis_to_opensearch_lambda_spark.plans import (
    plan_string,
    shuffle_exchange_count,
)
from kinesis_to_opensearch_lambda_spark.sinks import ParquetSink

from .test_transforms import FULL_RECORD, decoded


def test_parquet_sink_daily_partition_pruning(spark, tmp_path):
    records = [
        dict(FULL_RECORD, random_id=f"p-{i}", datetime=f"2026-02-{10 + i % 5}T10:00:00")
        for i in range(25)
    ]
    sink = ParquetSink(path=str(tmp_path / "tbl"))
    sink.write(decoded(spark, records))

    back = spark.read.parquet(str(tmp_path / "tbl"))
    one_day = back.filter(F.col("event_date") == "2026-02-12")
    assert one_day.count() == 5
    plan = plan_string(one_day, "formatted")
    # partition filter applied at scan planning: only one directory read
    # (inputFiles() lists the unpruned relation, so the plan is the evidence)
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    orders = spark.range(0, 1000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_val")
    )
    lines = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("l_key"), (F.col("id") % 13).alias("l_val")
    )
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lines")
    orders.write.bucketBy(8, "o_key").sortBy("o_key").saveAsTable("bt_orders")
    lines.write.bucketBy(8, "l_key").sortBy("l_key").saveAsTable("bt_lines")
    try:
        a = spark.table("bt_orders")
        b = spark.table("bt_lines")
        joined = a.join(
            b.hint("merge"), a.o_key == b.l_key
        ).groupBy("o_val").agg(F.count("*").alias("n"))
        # bucketed layout co-locates both sides: zero shuffles before the
        # join (only the final agg exchanges)
        n_shuffles = shuffle_exchange_count(joined)
        assert n_shuffles <= 1, plan_string(joined, "simple")
        assert joined.count() == 7
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_lines")
