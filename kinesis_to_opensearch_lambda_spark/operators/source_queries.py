"""Source-format breadth: JSON-lines and CSV scan paths.

The engine's canonical batch format is parquet (sources/batch.py), but
real ingest surfaces hand you text formats first — the reference itself
consumes JSON payloads (lambda_function.py:45).  These queries exercise
Spark's native json/csv DataSources end-to-end: events are serialized
to a temp directory by one Spark job, read back with an EXPLICIT schema
(schema inference is a full extra pass at 100 TB — never rely on it in
production paths), and aggregated; the DuckDB oracle computes the same
result straight from the parquet table, so the whole
serialize -> scan -> parse roundtrip is verified.

Scale notes: text sources are splittable (json-lines by newline, csv
without embedded newlines), so they parallelize like parquet minus
column pruning and predicate pushdown — the queries project early so
the parser still drops unused fields; PERMISSIVE mode routes malformed
lines to nulls rather than failing the scan (same containment stance
as pipeline_dlq_stats).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import register
from ..sources.batch import fan_out, load_table

_EVENT_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, cents bigint"
)


def _events_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fan_out(load_table(spark, sf_dir, "events")).select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )


_ORACLE_BY_TYPE = """
    SELECT event_type,
           count(*) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events
    GROUP BY event_type
"""


@register(
    "source_jsonl_scan",
    oracle=_ORACLE_BY_TYPE,
    doc="JSON-lines source path: events serialized to .jsonl by one "
    "Spark job, read back via spark.read.schema(...).json (explicit "
    "schema — inference is an extra full pass at scale; PERMISSIVE "
    "parse), aggregated per event_type with exact integer cents.  The "
    "oracle computes the same aggregate from the parquet table, so "
    "the serialize->scan->parse roundtrip is what's verified.",
)
def source_jsonl_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tempfile.mkdtemp(prefix="src_jsonl_")
    try:
        _events_cents(spark, sf_dir).write.mode("overwrite").json(f"{d}/ev")
        df = spark.read.schema(_EVENT_SCHEMA).json(f"{d}/ev")
        return _materialized(spark, _agg_by_type(df))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "source_csv_scan",
    oracle=_ORACLE_BY_TYPE,
    doc="CSV source path: events serialized with a header by one Spark "
    "job, read back via spark.read.schema(...).csv(header=True) — "
    "explicit schema again, and the projection still prunes parse "
    "work per line.  Same oracle as source_jsonl_scan: the roundtrip "
    "is the test.",
)
def source_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tempfile.mkdtemp(prefix="src_csv_")
    try:
        _events_cents(spark, sf_dir).write.mode("overwrite").option(
            "header", True
        ).csv(f"{d}/ev")
        df = spark.read.schema(_EVENT_SCHEMA).option("header", True).csv(f"{d}/ev")
        return _materialized(spark, _agg_by_type(df))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _materialized(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Execute the tiny aggregate NOW and rebuild it as a local frame —
    the returned DataFrame must stay valid after the temp source dir is
    deleted (lazy lineage over a dropped path fails on recompute; same
    recompute-safety fix as bucketed_queries.join_bucketed_colocated)."""
    return spark.createDataFrame(df.collect(), df.schema)


def _agg_by_type(df: DataFrame) -> DataFrame:
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )


@register(
    "source_partitioned_pruning",
    oracle="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE CAST(ts AS DATE) = (SELECT min(CAST(ts AS DATE)) FROM events)
    GROUP BY 1, 2
    """,
    doc="Hive-partitioned output layout + partition pruning, end to "
    "end: events are written partitioned by day "
    "(write.partitionBy('day')), read back with a single-day filter, "
    "and the scan must touch ONLY that day's directory — Catalyst "
    "turns the filter into a PartitionFilter resolved against the "
    "file listing, so unselected partitions are never opened (the "
    "plan-level assertion lives in tests/test_plans.py).  This is THE "
    "dominant cost lever on a 100 TB time-series lake: a day filter "
    "over a year of data prunes ~99.7% of bytes before any IO, and "
    "the same mechanism serves the daily-index routing the reference "
    "does per-record (lambda_function.py:117) as a storage layout.  "
    "The pruned day is chosen with a tiny min() subquery (1-row "
    "driver value), mirrored exactly in the oracle.",
)
def source_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tempfile.mkdtemp(prefix="part_layout_")
    try:
        ev = fan_out(load_table(spark, sf_dir, "events")).select(
            "event_id",
            "event_type",
            "ts",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
        )
        ev.write.mode("overwrite").partitionBy("day").parquet(f"{d}/events")
        back = spark.read.parquet(f"{d}/events")
        min_day = (
            back.agg(F.min("day").alias("m")).collect()[0]["m"]
        )  # 1-row driver value: the partition predicate must be a literal
        pruned = back.filter(F.col("day") == min_day)
        out = pruned.groupBy(
            # partition-column type inference may surface `day` as DATE;
            # pin the output dtype to the oracle's string form
            F.col("day").cast("string").alias("day"),
            "event_type",
        ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        # materialize before the temp dir disappears (recompute-safe)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "source_python_datasource",
    oracle="""
    SELECT event_type AS performer_kind, CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1
    """,
    doc="Custom Python DataSource (Spark 4 pyspark.sql.datasource API) "
    "reading the reference's Kinesis-envelope JSONL shape "
    "({'kinesis': {'data': base64(json)}} — lambda_function.py:140-141) "
    "with NO JVM connector jar: one InputPartition per envelope file, "
    "the per-partition generator runs ON EXECUTORS and rows cross via "
    "Arrow batches (sanctioned batched Python at the ingest edge only); "
    "everything after the scan — unbase64, get_json_object, the count "
    "aggregate — is codegen'd JVM DataFrame ops.  Roundtrip verified: "
    "events are serialized to AWS-event JSONL by one Spark job, read "
    "back through the custom source, decoded, and the per-kind counts "
    "must equal the batch ground truth.  This is the production answer "
    "for a niche source with no connector distribution "
    "(sources/python_datasource.py).",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.kinesis import audit_events_from_events, kinesis_envelope
    from ..sources.python_datasource import KinesisEnvelopeJsonlSource

    try:
        spark.dataSource.register(KinesisEnvelopeJsonlSource)
    except Exception:  # already registered in this session
        pass
    d = tempfile.mkdtemp(prefix="pyds_")
    try:
        env = kinesis_envelope(
            audit_events_from_events(fan_out(load_table(spark, sf_dir, "events")))
        )
        env.select(
            F.to_json(
                F.struct(
                    F.struct(F.col("kinesis_data").alias("data")).alias("kinesis")
                )
            ).alias("value")
        ).write.mode("overwrite").text(f"{d}/env")
        back = (
            spark.read.format("kinesis_envelope_jsonl")
            .option("path", f"{d}/env")
            .load()
        )
        decoded = back.select(
            F.unbase64(F.col("kinesis_data")).cast("string").alias("payload")
        ).select(
            F.get_json_object("payload", "$.performer_kind").alias(
                "performer_kind"
            )
        )
        out = decoded.groupBy("performer_kind").agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        )
        rows = out.collect()  # materialize before the temp dir disappears
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "source_corrupt_file_skip",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    """,
    doc="Corrupt-input resilience at the scan layer: the events table "
    "is written as clean parquet, a garbage file wearing a .parquet "
    "name is dropped into the same directory (the torn-upload / "
    "truncated-object failure every object-store lake eventually "
    "sees), and the read proceeds with ignoreCorruptFiles=true — the "
    "scan skips the unreadable file instead of failing the job, and "
    "the aggregate equals the clean ground truth.  Same containment "
    "stance as the sink side's error handling (R11, "
    "lambda_function.py:84-86: log, don't raise) applied to the "
    "source side.  At 100 TB this is a per-read option, not a session "
    "default — silent skipping is only safe when a reconciliation "
    "count (exactly this query's shape) runs alongside.",
)
def source_corrupt_file_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tempfile.mkdtemp(prefix="src_corrupt_")
    try:
        ev = fan_out(load_table(spark, sf_dir, "events")).select(
            "event_id", "event_type"
        )
        ev.write.mode("overwrite").parquet(f"{d}/ev")
        with open(f"{d}/ev/part-corrupt.parquet", "wb") as fh:
            fh.write(b"PAR1 this is not a parquet file, it is a torn upload")
        df = (
            spark.read.option("ignoreCorruptFiles", "true")
            .parquet(f"{d}/ev")
        )
        out = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("event_type").cast("bigint").alias("n_types"),
        )
        rows = out.collect()  # materialize before the temp dir disappears
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "source_schema_evolution",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_region,
           CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_region
    FROM events
    """,
    doc="Schema evolution on read: an OLD batch written before a "
    "`region` column existed and a NEW batch written after are read "
    "together with mergeSchema=true — the unified schema carries the "
    "superset and old rows surface NULL for the added column (the "
    "additive-evolution contract; renames/type-changes are NOT safe "
    "this way and need a real table format).  The audit aggregate "
    "counts rows with and without the evolved column.  At 100 TB "
    "mergeSchema is a FOOTER-LISTING cost over every file — which is "
    "why production lakes pin the merged schema in a catalog and "
    "pass it explicitly; the per-read option here is the migration-"
    "window shape.",
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tempfile.mkdtemp(prefix="src_evo_")
    try:
        ev = fan_out(load_table(spark, sf_dir, "events")).select(
            "event_id", "event_type"
        )
        old = ev.filter(F.col("event_id") % 2 == 0)
        new = ev.filter(F.col("event_id") % 2 == 1).withColumn(
            "region", F.concat(F.lit("r"), (F.col("event_id") % 5).cast("string"))
        )
        old.write.mode("overwrite").parquet(f"{d}/t/batch=old")
        new.write.mode("overwrite").parquet(f"{d}/t/batch=new")
        merged = spark.read.option("mergeSchema", "true").parquet(f"{d}/t")
        out = merged.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("region").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_with_region"),
            F.sum(F.when(F.col("region").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null_region"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "join_dynamic_partition_pruning",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
      FROM events
      ORDER BY day LIMIT 3
    )
    SELECT e.day, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                 event_id FROM events) e
    JOIN dim ON e.day = dim.day
    GROUP BY e.day
    """,
    doc="Dynamic partition pruning (DPP) — the star-join flagship: the "
    "fact table is laid out partitioned by day, the dimension (a "
    "3-day calendar slice, written as its OWN parquet table so the "
    "filter is not constant-foldable) is filtered at runtime, and "
    "Catalyst injects a dynamicpruning subquery that evaluates the "
    "dim filter FIRST and prunes fact partitions before the scan — "
    "static pruning's runtime twin, and the reason partitioned "
    "layouts pay off on joins, not just literal filters.  The plan "
    "assertion (tests/test_plans.py) requires the dynamicpruning "
    "expression on the fact scan; the aggregate is oracle-checked.  "
    "At 100 TB this is the difference between scanning 3 days and "
    "scanning a year when the date slice comes from a dimension "
    "lookup the optimizer cannot see statically.",
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tempfile.mkdtemp(prefix="dpp_")
    try:
        # cluster the fact write by the partition key (r13, guide §6):
        # a round-robin-fed partitionBy write emits one file per task
        # per day (~2,900 tiny files at sf0.1) and the pruned probe
        # still pays their listing; hash-distributing by day yields one
        # file per partition — the real lake layout DPP runs against
        ev = (
            load_table(spark, sf_dir, "events")
            .select("event_id", F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .repartition("day")
        )
        ev.write.mode("overwrite").partitionBy("day").parquet(f"{d}/fact")
        dim = (
            ev.select("day").distinct().orderBy("day").limit(3)
            .withColumn("flag", F.lit(1))
        )
        dim.write.mode("overwrite").parquet(f"{d}/dim")
        fact = spark.read.parquet(f"{d}/fact")
        dim_back = spark.read.parquet(f"{d}/dim").filter(F.col("flag") == 1)
        out = (
            fact.join(dim_back, "day")
            .groupBy(F.col("day").cast("string").alias("day"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        rows = out.collect()  # materialize before the temp dir disappears
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)
