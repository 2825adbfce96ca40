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


def _ann_index_oracle() -> str:
    """DuckDB twin of the persisted ANN index cells: the EXACT capped
    CTE chain of the kNN-family oracles (adaptive nb, 16-plane mask,
    windowed per-bucket sub-split)."""
    from . import similarity as S
    from .similarity_queries import _KNN_BUCKET_TARGET, _KNN_MAX_PLANES

    return f"""
    WITH nbits AS MATERIALIZED (
      SELECT LEAST({_KNN_MAX_PLANES}, MIN(t.nb)) AS nb
      FROM (SELECT count(*) AS n FROM embeddings) c,
           range(8, {_KNN_MAX_PLANES + 1}) t(nb)
      WHERE c.n <= {_KNN_BUCKET_TARGET} * (1 << t.nb)
         OR t.nb = {_KNN_MAX_PLANES}
    ), bucketed AS MATERIALIZED (
      SELECT vec_id,
             ({S.sql_srp_bits('embedding', _KNN_MAX_PLANES)})
               % (1 << (SELECT nb FROM nbits)) AS bucket
      FROM embeddings
    ), capped AS (
      SELECT vec_id, bucket,
             vec_id % ((count(*) OVER (PARTITION BY bucket)
                        + {_KNN_BUCKET_TARGET - 1}) // {_KNN_BUCKET_TARGET})
               AS sub
      FROM bucketed
    ), cells AS (
      SELECT bucket, sub, count(*) AS n_members,
             (count(*) * (count(*) - 1)) // 2 AS n_pairs
      FROM capped GROUP BY bucket, sub
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, CAST(sub AS BIGINT) AS sub,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(n_pairs AS BIGINT) AS n_pairs
    FROM cells
    QUALIFY row_number() OVER (ORDER BY n_pairs DESC, bucket, sub) <= 10
    """


@register(
    "ann_index_bucketed_build",
    oracle=_ann_index_oracle(),
    doc="The session-scoped capped-SRP index made DURABLE: the exact "
    "index frame every kNN-family query shares in-session "
    "(_capped_srp_table — AB_KNN_MEMO_r12 measured the in-memory form "
    "at 0.73x family cost) is written ONCE as a bucketed table on "
    "BOTH join keys (bucket, sub) — Spark's co-partition rule "
    "(requireAllClusterKeysForCoPartition) demands the bucket spec "
    "cover the full key set — and the candidate self-join then reads "
    "co-located buckets with ZERO exchange (plan asserted "
    "exchange-free in tests/test_plans.py).  This is "
    "the claim the kNN docstrings make about 100 TB — 'in one "
    "session the cache IS that index; in production it is a bucketed "
    "table written once and served to every query' — executed: "
    "build -> persist layout -> shuffle-free candidate generation "
    "across restarts.  Output: the 10 heaviest (bucket, sub) cells "
    "with member and directed-pair counts — the quantity the bucket "
    "cap bounds (<= C(64,2) pairs per cell under ANY skew), so the "
    "top cell doubles as a live assertion of the cap.",
)
def ann_index_bucketed_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity_queries import _capped_srp_table

    # r13: this entry no longer writes its own copy — it reads the SAME
    # session-scoped bucketed table every production kNN-family query
    # consumes (_capped_srp_table writes through bucketBy(8, bucket,
    # sub) since r13), so the "written once, served to every query"
    # claim is now literally the production path, and this entry is its
    # live audit.  The embedding column is pruned at the parquet scan
    # (this consumer reads only ids/buckets).
    # join on the RAW bucket/sub columns (a cast on the join key would
    # hide the bucketing spec from the planner and re-introduce the
    # exchange); cast to bigint only in the output projection
    idx = _capped_srp_table(spark, sf_dir, 0).select("vec_id", "bucket", "sub")
    a, b = idx.alias("a"), idx.alias("b")
    pairs = a.join(
        b.hint("merge"),
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.sub") == F.col("b.sub"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).groupBy(F.col("a.bucket").alias("bucket"), F.col("a.sub").alias("sub"))
    members = idx.groupBy("bucket", "sub").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    return (
        members.join(
            pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs")),
            ["bucket", "sub"],
            "left",
        )
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            F.col("sub").cast("bigint").alias("sub"),
            "n_members",
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
        )
        .orderBy(F.col("n_pairs").desc(), "bucket", "sub")
        .limit(10)
    )


def ann_index_join_plan(spark: SparkSession, sf_dir: str) -> str:
    """Physical plan of the bucketed-index candidate self-join BEFORE
    materialization — the plan test asserts the join side reads
    co-located buckets with no exchange."""
    from ..plans import plan_string
    from .similarity_queries import _capped_srp_table

    # r13: the shared session index IS the bucketed table now
    idx = _capped_srp_table(spark, sf_dir, 0).select("vec_id", "bucket", "sub")
    a, b = idx.alias("a"), idx.alias("b")
    joined = a.join(
        b.hint("merge"),
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.sub") == F.col("b.sub"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    return plan_string(joined)
