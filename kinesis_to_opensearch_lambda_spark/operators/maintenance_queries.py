"""Table-maintenance operators: small-file compaction and multi-dim
clustering (z-order) data-skipping — the background jobs that keep a
100 TB lake queryable.

The reference appends to OpenSearch/Splunk and never manages storage
(lambda_function.py has no compaction surface); these are the
warehouse-side extensions a Spark lake needs: streaming ingest creates
small files (every micro-batch is >=1 file per partition), and
compaction + clustered layout are what keep scan counts and data
skipping healthy afterwards.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import register
from ..sources.batch import load_table

_COMPACT_TARGET = 4
_SMALL_FILES = 40


@register(
    "maintenance_compact_small_files",
    oracle=f"""
    SELECT 'before' AS phase, {_SMALL_FILES}::BIGINT AS n_files,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM events
    UNION ALL
    SELECT 'after', {_COMPACT_TARGET}::BIGINT, CAST(count(*) AS BIGINT)
    FROM events
    """,
    doc="Small-file compaction (the OPTIMIZE job every streaming lake "
    f"runs): {_SMALL_FILES} micro-batch-sized files are rewritten into "
    f"{_COMPACT_TARGET} right-sized files via repartition — row "
    "conservation and the exact file counts are both asserted (the "
    "oracle pins them; repartition(n) writes exactly n files).  Why it "
    "matters at 100 TB: every query pays per-file open/footer costs "
    "and the driver pays per-file listing/planning memory, so a "
    "million tiny files from availableNow micro-batches can cost more "
    "than the scan itself; compaction amortizes them into "
    "maxPartitionBytes-aligned files.  The engine-side read path "
    "(sources.batch.fan_out) models the same economics with "
    "openCostInBytes bin-packing.",
)
def maintenance_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    d = tempfile.mkdtemp(prefix="compact_")
    try:
        ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
        ev.repartition(_SMALL_FILES).write.mode("overwrite").parquet(f"{d}/small")
        small = spark.read.parquet(f"{d}/small")
        n_small = len(
            [f for f in os.listdir(f"{d}/small") if f.startswith("part-")]
        )
        small.repartition(_COMPACT_TARGET).write.mode("overwrite").parquet(
            f"{d}/compact"
        )
        compact = spark.read.parquet(f"{d}/compact")
        n_compact = len(
            [f for f in os.listdir(f"{d}/compact") if f.startswith("part-")]
        )
        rows = [
            ("before", n_small, small.count()),
            ("after", n_compact, compact.count()),
        ]
        return spark.createDataFrame(
            rows, "phase string, n_files bigint, n_rows bigint"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


_Z_BITS = 10
_Z_BUCKETS = 64
# the 2-d box probe, in normalized 10-bit rank units: a quarter of the
# customer range and an eighth of the time range
_BOX_CUST = (256, 511)
_BOX_DAY = (512, 639)


def _sql_interleave(x: str, y: str, bits: int = _Z_BITS) -> str:
    """Bit-interleave two non-negative ints into a z-curve key (SQL)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


@register(
    "maintenance_zorder_skipping",
    oracle=f"""
    WITH raw AS (
      -- deterministic md5-ordered sample caps the planner input at any
      -- scale factor (the decision procedure runs on a sample, never
      -- the full fact table)
      SELECT o_custkey AS ck0,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS dy0,
             o_orderkey AS uid
      FROM orders
      ORDER BY md5(o_orderkey::VARCHAR) LIMIT 20000
    ), base AS (
      -- normalize both dims to exact 10-bit rank units so the
      -- interleave never truncates, at any scale factor
      SELECT CAST(ntile(1024) OVER (ORDER BY ck0, uid) - 1 AS BIGINT) AS ck,
             CAST(ntile(1024) OVER (ORDER BY dy0, uid) - 1 AS BIGINT) AS dy,
             uid
      FROM raw
    ), keyed AS (
      SELECT ck, dy,
             {_sql_interleave('ck', 'dy')} AS zkey,
             uid
      FROM base
    ), layouts AS (
      SELECT ck, dy, 'zorder' AS layout,
             ntile({_Z_BUCKETS}) OVER (ORDER BY zkey, uid) AS bucket
      FROM keyed
      UNION ALL
      SELECT ck, dy, 'linear' AS layout,
             ntile({_Z_BUCKETS}) OVER (ORDER BY dy, uid) AS bucket
      FROM keyed
    ), stats AS (
      SELECT layout, bucket,
             min(ck) AS ck_lo, max(ck) AS ck_hi,
             min(dy) AS dy_lo, max(dy) AS dy_hi
      FROM layouts GROUP BY layout, bucket
    )
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(CASE WHEN ck_hi >= {_BOX_CUST[0]} AND ck_lo <= {_BOX_CUST[1]}
                          AND dy_hi >= {_BOX_DAY[0]} AND dy_lo <= {_BOX_DAY[1]}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_buckets_touched
    FROM stats
    GROUP BY layout
    """,
    doc="Z-order clustering as measurable data skipping: orders are "
    f"assigned to {_Z_BUCKETS} equal 'files' two ways — sorted by a "
    f"{_Z_BITS}-bit interleaved (custkey, order-day) z-curve key vs "
    "sorted by date alone — and for each layout the per-bucket min/max "
    "column stats (exactly what parquet row-group footers store) are "
    "checked against a 2-d box predicate.  The output is the number of "
    "buckets a stats-pruning scanner must open: the z-order layout "
    "bounds BOTH dimensions per bucket so the box touches few buckets, "
    "while the linear layout leaves the second dimension unsorted and "
    "the probe touches ~all buckets that match the first.  All-integer "
    "(bit ops + ntile with a unique tie-break), so both engines agree "
    "exactly.  This is the OPTIMIZE ZORDER BY decision procedure a "
    "100 TB lake runs before committing to a layout; in production the "
    "bucket assignment becomes repartitionByRange(zkey) + sortWithin"
    "Partitions at write time and the skipping is free at read time.",
)
def maintenance_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 fan_out audit: the md5 sample feeds TakeOrdered (per-partition
    # heads merged on the driver) — widening the scan shuffles the whole
    # table to speed a 20k-row head selection (A/B 0.85->0.68s at sf0.1,
    # sweeps/FANOUT_AB_r13.json).
    orders = load_table(spark, sf_dir, "orders")
    # md5-ordered deterministic sample: TakeOrdered (per-partition heads
    # merged on the driver, no full sort shuffle) bounds the planner
    # input at 20k rows regardless of table size — the single-partition
    # rank windows below are therefore bounded BY CONSTRUCTION, not by
    # luck of the scale factor
    raw = (
        orders.select(
            F.col("o_custkey").alias("ck0"),
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("dy0"),
            F.col("o_orderkey").alias("uid"),
            F.md5(F.col("o_orderkey").cast("string")).alias("_smp"),
        )
        .orderBy("_smp")
        .limit(20000)
        .drop("_smp")
    )
    wc = Window.orderBy("ck0", "uid")
    wd = Window.orderBy("dy0", "uid")
    base = raw.select(
        (F.ntile(1024).over(wc) - 1).cast("bigint").alias("ck"),
        (F.ntile(1024).over(wd) - 1).cast("bigint").alias("dy"),
        "uid",
    )
    keyed = base.select(
        "ck", "dy", "uid", F.expr(_sql_interleave("ck", "dy")).alias("zkey")
    )
    wz = Window.orderBy("zkey", "uid")
    wl = Window.orderBy("dy", "uid")
    layouts = keyed.select(
        "ck", "dy", F.lit("zorder").alias("layout"), F.ntile(_Z_BUCKETS).over(wz).alias("bucket")
    ).unionByName(
        keyed.select(
            "ck", "dy", F.lit("linear").alias("layout"), F.ntile(_Z_BUCKETS).over(wl).alias("bucket")
        )
    )
    stats = layouts.groupBy("layout", "bucket").agg(
        F.min("ck").alias("ck_lo"),
        F.max("ck").alias("ck_hi"),
        F.min("dy").alias("dy_lo"),
        F.max("dy").alias("dy_hi"),
    )
    touched = (
        (F.col("ck_hi") >= _BOX_CUST[0])
        & (F.col("ck_lo") <= _BOX_CUST[1])
        & (F.col("dy_hi") >= _BOX_DAY[0])
        & (F.col("dy_lo") <= _BOX_DAY[1])
    )
    return stats.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum(F.when(touched, 1).otherwise(0))
        .cast("bigint")
        .alias("n_buckets_touched"),
    )


def _rewrite_victim_days(
    spark: SparkSession, table_root: str, hit_days: list[str], rw_dir: str
) -> None:
    """Copy-on-write delete of `event_id % 977 == 0` rows from exactly
    the ``hit_days`` partitions of a day-partitioned table — as ONE
    partition-pruned read + ONE partitionBy write (r13, guide §2.4/§6):
    the pre-r13 per-day Python loop ran 2 tiny single-task jobs per
    victim day (~90 sequential jobs at sf0.1, 17.5 s of almost pure
    scheduler latency).  The isin filter prunes the scan to exactly the
    victim directories (PartitionFilters: day INSET ...), the write
    emits one dir per rewritten day, and the swap stays driver-side
    file moves — untouched partitions are never read, written, or even
    stat'd.  A day whose rows were ALL victims yields no output dir and
    its partition is dropped outright — same post-delete rows.

    Deployment seam (r13 verdict): the driver-side ``os.replace`` swap
    is correct here because the table root is this operator's own
    local tempdir lake (single writer, POSIX rename).  A real
    deployment replaces exactly this step with its table format's
    commit protocol — Iceberg/Delta ``overwritePartitions`` /
    ``replaceWhere`` (an atomic metadata swap), or an HDFS
    rename-based output committer — and keeps the read/write shape
    above unchanged; object stores without atomic rename must not use
    bare directory swaps."""
    import os

    back = spark.read.parquet(table_root)
    (
        back.filter(F.col("day").isin(hit_days))
        .filter(F.col("event_id") % 977 != 0)
        .withColumn("day", F.col("day").cast("string"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(rw_dir)
    )
    for day in hit_days:
        part_dir = f"{table_root}/day={day}"
        shutil.rmtree(part_dir)
        src_dir = f"{rw_dir}/day={day}"
        if os.path.isdir(src_dir):
            os.replace(src_dir, part_dir)


@register(
    "maintenance_targeted_delete",
    oracle="""
    WITH victims AS (
      SELECT event_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
      FROM events WHERE event_id % 977 = 0
    )
    SELECT (SELECT CAST(count(DISTINCT strftime(CAST(ts AS DATE), '%Y-%m-%d'))
                   AS BIGINT) FROM events) AS n_partitions,
           (SELECT CAST(count(DISTINCT day) AS BIGINT) FROM victims)
             AS n_partitions_rewritten,
           (SELECT CAST(count(*) AS BIGINT) FROM events) AS rows_before,
           (SELECT CAST(count(*) AS BIGINT) FROM events
            WHERE event_id % 977 != 0) AS rows_after
    """,
    doc="Targeted delete (GDPR / right-to-be-forgotten) on a "
    "hive-partitioned table WITHOUT a table format: victims are "
    "located, ONLY the day-partitions containing them are rewritten "
    "with an anti-join (untouched partitions are never read or "
    "written — partition pruning scopes both the read and the "
    "rewrite), and the report carries the audit numbers: partitions "
    "total vs rewritten, rows before vs after.  This is the copy-on-"
    "write delete Delta/Iceberg automate, shown at the layout level "
    "so the cost model is visible: delete cost scales with the "
    "victims' partition footprint, not table size.  The rewritten "
    "table is re-read and counted, so the oracle checks the actual "
    "post-delete state, not the plan.",
)
def maintenance_targeted_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tempfile.mkdtemp(prefix="tdel_")
    try:
        # cluster the setup write by the partition key (guide §6: a
        # round-robin-fed partitionBy write emits one file per task per
        # day — ~2,900 tiny files at sf0.1 — and every later step of
        # the delete pays the listing + open cost; hash-distributing by
        # day first yields exactly one file per partition, the
        # write.distribution-mode=hash shape of a real lake write)
        ev = (
            load_table(spark, sf_dir, "events")
            .select("event_id", F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .repartition("day")
        )
        ev.write.mode("overwrite").partitionBy("day").parquet(f"{d}/t")
        back = spark.read.parquet(f"{d}/t")
        rows_before = back.count()
        n_partitions = back.select("day").distinct().count()
        victims = back.filter(F.col("event_id") % 977 == 0)
        hit_days = [
            str(r["day"]) for r in victims.select("day").distinct().collect()
        ]
        _rewrite_victim_days(spark, f"{d}/t", hit_days, f"{d}/rw")
        after = spark.read.parquet(f"{d}/t")
        rows_after = after.count()
        rows = [
            (
                int(n_partitions),
                len(hit_days),
                int(rows_before),
                int(rows_after),
            )
        ]
        return spark.createDataFrame(
            rows,
            "n_partitions bigint, n_partitions_rewritten bigint, "
            "rows_before bigint, rows_after bigint",
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
