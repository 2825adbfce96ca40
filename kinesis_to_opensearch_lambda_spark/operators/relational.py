"""Relational extension operators (SURVEY.md §2B).

The reference has no joins/aggregations/windows — this module is the
engine's batch-analytics surface, built entirely from Catalyst-planned
DataFrame primitives.  Reusable operators that Spark lacks as built-ins
(as-of join, sessionization, per-group top-k) are expressed as
compositions of built-ins so they stay inside whole-stage codegen and
scale: no Python in the hot path, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame, part_cols: list[str], order_cols: list, k: int, rank_col: str = "rnk"
) -> DataFrame:
    """Top-k rows per group via ``row_number`` over a window.

    Scale: one shuffle on ``part_cols``; AQE handles skewed groups.  For
    large k-small-group workloads this beats a global sort by never
    materializing a total order.
    """
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """As-of (backward) join: for each left row, the latest right values
    with ``right_time <= left_time``, matched on the equi-key ``on``.

    Spark has no native as-of join.  The naive non-equi join
    (``l.on = r.on AND r.t <= l.t`` + max) degenerates to O(n·m) per
    key; instead both sides are UNIONed into one time-ordered stream and
    a ``last(value, ignorenulls)`` running window carries the most
    recent right-side values forward — one shuffle on the key, linear
    work, no non-equi join.  (Same trick pandas' ``merge_asof`` uses
    after its sort, re-expressed as Catalyst window evaluation.)

    Right-side ties on (key, time) resolve to any of the tied rows;
    callers needing full determinism should pre-aggregate the right side
    to unique (key, time).
    """
    r = right.select(
        F.col(on),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.col(c) for c in value_cols],
    )
    l = left.select(
        F.col(on),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(c) for c in left.columns if c != on],
    )
    merged = r.unionByName(l, allowMissingColumns=True)
    # Right rows sort before left rows at equal timestamps (asof is
    # inclusive: a right row AT the left time is visible to it).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    keep = [c for c in left.columns]
    return (
        carried.filter(F.col("_is_left") == 1)
        .select(*keep, *[F.col(f"_asof_{c}").alias(c) for c in value_cols])
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same user exceeds ``gap_seconds``.

    lag + conditional flag + running sum — two window passes over ONE
    shuffle on ``user_col`` (both windows share the partitioning, so
    Catalyst plans a single exchange).  Gap math is integer microseconds
    for engine-portable determinism.
    """
    order_cols = [F.col(ts_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    new_sess = F.when(
        prev_us.isNull()
        | ((F.unix_micros(F.col(ts_col)) - prev_us) > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    return df.withColumn("_new_session", new_sess).withColumn(
        "session_id", F.sum("_new_session").over(w)
    ).drop("_new_session")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    salt_buckets: int,
    sum_cols: dict[str, str] | None = None,
    count_alias: str | None = "n",
):
    """Two-phase aggregation for skewed keys.

    Phase 1 groups on (keys + random-ish salt) so a hot key's rows
    spread over ``salt_buckets`` reducers; phase 2 merges the partials
    on the true keys.  The salt derives from a hash of the full row
    position via ``spark_partition_id``+monotonic id — cheap, no RNG
    state, and the final merge is exact regardless of salt distribution.

    AQE's skew handling covers joins; skewed *aggregations* still
    benefit from explicit salting when one key dominates (the classic
    null-key / power-law case at 100 TB).
    """
    from pyspark.sql import functions as F

    sum_cols = sum_cols or {}
    salt = (F.monotonically_increasing_id() % salt_buckets).alias("_salt")
    partial_aggs = [F.count("*").alias("_pn")] + [
        F.sum(c).alias(f"_ps_{a}") for c, a in sum_cols.items()
    ]
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_aggs)
    final_aggs = []
    if count_alias:
        final_aggs.append(F.sum("_pn").alias(count_alias))
    final_aggs += [F.sum(f"_ps_{a}").alias(a) for a in sum_cols.values()]
    return partial.groupBy(*keys).agg(*final_aggs)
