"""Batch Parquet sources for the driver-generated tables (TESTDATA.md).

Parquet is the engine's canonical batch format: columnar, predicate
pushdown, partition pruning, vectorized reads — all free via the
DataSource V2 scan.  At 100 TB these would be partitioned/bucketed
table roots; the loader API is path-based so the same code serves both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The testdata parquet stores timestamps as TIMESTAMP(NANOS); Spark's
# TimestampType is microseconds, so the session reads nanos as long
# (spark.sql.legacy.parquet.nanosAsLong) and the loader converts with
# integer division (truncation — identical to the Arrow/DuckDB µs cast).
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def _ensure_session_conf(spark: SparkSession) -> None:
    """Defensive runtime confs for externally-created sessions (the
    driver constructs its own SparkSession): nanos-timestamp parquet
    reads and UTC temporal semantics are required for correctness."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down — session factory defaults already apply


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Column pruning + filter pushdown reach the scan."""
    _ensure_session_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANO_TS_COLS.get(name, ()):
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


_SIZE_SUFFIX = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_bytes(v: str) -> int:
    """Parse a Spark byte-size conf value ('134217728', '134217728b', '128m', '128MB')."""
    s = str(v).strip().lower().removesuffix("b")
    if s and s[-1] in _SIZE_SUFFIX:
        return int(float(s[:-1]) * _SIZE_SUFFIX[s[-1]])
    return int(s)


def fan_out(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Spread a parallelism-starved scan across the cluster.

    Parquet scans parallelize at row-group granularity; a source laid
    out as few large row groups (the test tables are single-row-group
    files) binds CPU-heavy per-row operators (md5 shingling, vector
    folds) to a handful of tasks.  When the scan has at most
    ``cores / min_factor`` partitions, one cheap round-robin shuffle of
    the (narrow) input unlocks full-width execution.  Already-wide scans
    — the 100 TB case, thousands of row groups — pass through untouched,
    so this never adds a shuffle where the source is properly laid out.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    # Estimate the scan's task count from file-listing metadata instead of
    # df.rdd.getNumPartitions() — the RDD probe forces a full plan
    # conversion per call.  Spark splits parquet scans into
    # ceil(size / maxPartitionBytes) tasks per file (modulo openCostInBytes
    # packing, which only merges *small* files and so can only lower the
    # estimate — conservative in the right direction for the pass-through
    # branch).
    max_bytes = _parse_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    est = 0
    for uri in df.inputFiles():
        path = uri[len("file:"):] if uri.startswith("file:") else uri
        try:
            size = os.path.getsize(path)
        except OSError:
            return df  # non-local source: trust the scan's own layout
        est += max(1, -(-size // max_bytes))
    if est * min_factor <= target:
        return df.repartition(target)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
