"""Bucketed (co-located) join: the shuffle-elimination strategy for
repeated large-to-large joins at 100 TB.

Both join sides are written once, bucketed by the join key into the
same bucket count; every later join on that key then reads co-located
buckets and skips the exchange entirely — the physical plan contains a
SortMergeJoin with NO Exchange on either side (asserted in
tests/test_plans.py).  Amortized over the many queries a curation
pipeline runs against the same fact tables, this converts the dominant
per-query shuffle into a one-time layout cost.

Reference parity: the reference (a 148-line Lambda,
lambda_function.py:140-148) has no join surface; this is the
engine-side extension mandated by the driver (SURVEY.md §2B joins).
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import register
from ..sources.batch import load_table

N_BUCKETS = 8


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Co-located bucketed join: orders and customer each written "
    "bucketed 8 ways on custkey, then sort-merge-joined with zero "
    "exchanges (bucketed scans already satisfy the join distribution; "
    "plan asserted shuffle-free in tests/test_plans.py). The MERGE "
    "hint keeps Catalyst from broadcasting the small test-scale "
    "customer table — at 100 TB both sides are large and SMJ over "
    "buckets is the target plan. The tiny grouped result is collected "
    "and rebuilt as a fresh local DataFrame so the returned frame has "
    "NO lineage into the scratch tables (a localCheckpoint would pin "
    "blocks on executors and fail on any recompute after the tables "
    "are dropped).",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tempfile.mkdtemp(prefix="bucketed_")
    tag = uuid.uuid4().hex[:12]
    t_orders, t_cust = f"orders_bkt_{tag}", f"customer_bkt_{tag}"
    try:
        (
            load_table(spark, sf_dir, "orders")
            .select(
                "o_custkey",
                F.round(F.col("o_totalprice") * 100)
                .cast("bigint")
                .alias("price_cents"),
            )
            .write.bucketBy(N_BUCKETS, "o_custkey")
            .sortBy("o_custkey")
            .option("path", f"{d}/orders")
            .saveAsTable(t_orders)
        )
        (
            load_table(spark, sf_dir, "customer")
            .select("c_custkey", "c_mktsegment")
            .write.bucketBy(N_BUCKETS, "c_custkey")
            .sortBy("c_custkey")
            .option("path", f"{d}/customer")
            .saveAsTable(t_cust)
        )
        orders = spark.table(t_orders)
        cust = spark.table(t_cust)
        result = (
            orders.join(
                cust.hint("merge"),
                orders.o_custkey == cust.c_custkey,
            )
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum("price_cents").alias("total_cents"),
            )
        )
        # Materialize the (tiny) grouped result and rebuild it from
        # local rows: the returned DataFrame must survive recompute
        # (executor loss, cache eviction) after the scratch tables are
        # dropped, which checkpoint blocks would not.
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_cust}")
        shutil.rmtree(d, ignore_errors=True)


def bucketed_join_plan(spark: SparkSession, sf_dir: str) -> str:
    """The physical plan of the bucketed join BEFORE materialization —
    used by the plan test to assert the exchange-free SortMergeJoin
    (the registered query eagerly checkpoints, which hides the join
    plan). Drops its scratch tables before returning."""
    from ..plans import plan_string

    d = tempfile.mkdtemp(prefix="bucketed_plan_")
    tag = uuid.uuid4().hex[:12]
    t_orders, t_cust = f"orders_bkt_{tag}", f"customer_bkt_{tag}"
    try:
        (
            load_table(spark, sf_dir, "orders")
            .select("o_custkey", "o_totalprice")
            .write.bucketBy(N_BUCKETS, "o_custkey")
            .sortBy("o_custkey")
            .option("path", f"{d}/orders")
            .saveAsTable(t_orders)
        )
        (
            load_table(spark, sf_dir, "customer")
            .select("c_custkey", "c_mktsegment")
            .write.bucketBy(N_BUCKETS, "c_custkey")
            .sortBy("c_custkey")
            .option("path", f"{d}/customer")
            .saveAsTable(t_cust)
        )
        orders = spark.table(t_orders)
        cust = spark.table(t_cust)
        joined = orders.join(
            cust.hint("merge"), orders.o_custkey == cust.c_custkey
        ).groupBy("c_mktsegment").agg(F.count("*").alias("n"))
        return plan_string(joined)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_cust}")
        shutil.rmtree(d, ignore_errors=True)
