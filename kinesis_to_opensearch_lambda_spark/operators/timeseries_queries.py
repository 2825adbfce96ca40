"""Time-series warehouse operators over the events stream: hypertable-style
multi-resolution rollups, robust (IQR) outlier detection, and a
bidirectional nearest-in-time as-of join.

These extend the reference's daily-index bucketing (lambda_function.py:117
builds one `%Y.%m.%d` grain) to the full continuous-aggregate family a
time-series warehouse needs: several grains from ONE scan, per-series
robust bounds, and nearest-event alignment between two unsynchronized
streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import register
from ..sources.batch import load_table


@register(
    "rollup_time_hierarchy",
    headline=True,
    oracle="""
    WITH base AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(extract(hour FROM ts) AS BIGINT) AS hh,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT CASE WHEN hh IS NOT NULL THEN 'hour'
                WHEN day IS NOT NULL THEN 'day'
                ELSE 'total' END AS grain,
           day, hh,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM base
    GROUP BY GROUPING SETS ((day, hh), (day), ())
    """,
    doc="Hypertable-style continuous-aggregate rollup: hourly, daily, and "
    "grand-total grains materialized from ONE scan via GROUPING SETS — "
    "the multi-resolution downsampling pattern (TimescaleDB continuous "
    "aggregates / Druid rollup) the reference's single `%Y.%m.%d` index "
    "grain (lambda_function.py:117) is a special case of.  Catalyst "
    "expands the sets AFTER partial aggregation on the finest grain, so "
    "the scan happens once and only pre-aggregated partials shuffle; "
    "money is summed as integer cents so every grain is bit-exact and "
    "summation-order independent.  At 100 TB this replaces three "
    "separate scan+agg jobs with one, and the coarser grains ride the "
    "finest grain's exchange.",
)
def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").cast("bigint").alias("hh"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    base.createOrReplaceTempView("ts_rollup_base")
    return spark.sql(
        """
        SELECT CASE WHEN hh IS NOT NULL THEN 'hour'
                    WHEN day IS NOT NULL THEN 'day'
                    ELSE 'total' END AS grain,
               day, hh,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM ts_rollup_base
        GROUP BY GROUPING SETS ((day, hh), (day), ())
        """
    )


@register(
    "anomaly_iqr_outliers",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), rk AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents) AS r,
             count(*)     OVER (PARTITION BY event_type) AS n
      FROM c
    ), pos AS (
      SELECT *,
             (n - 1) // 4 AS lo25, (n - 1) % 4 AS f25,
             (3 * (n - 1)) // 4 AS lo75, (3 * (n - 1)) % 4 AS f75
      FROM rk
    ), q AS (
      SELECT *,
             max(CASE WHEN r = lo25 + 1 THEN cents END)
               OVER (PARTITION BY event_type) AS a25,
             max(CASE WHEN r = lo25 + 2 THEN cents END)
               OVER (PARTITION BY event_type) AS b25,
             max(CASE WHEN r = lo75 + 1 THEN cents END)
               OVER (PARTITION BY event_type) AS a75,
             max(CASE WHEN r = lo75 + 2 THEN cents END)
               OVER (PARTITION BY event_type) AS b75
      FROM pos
    ), f AS (
      SELECT event_type, cents, n,
             (4 - f25) * a25 + f25 * coalesce(b25, a25) AS q25q,
             (4 - f75) * a75 + f75 * coalesce(b75, a75) AS q75q
      FROM q
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST(sum(CASE WHEN 8 * cents < 2 * q25q - 3 * (q75q - q25q)
                           OR 8 * cents > 2 * q75q + 3 * (q75q - q25q)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(max(q25q) AS BIGINT) AS p25_quarter_cents,
           CAST(max(q75q) AS BIGINT) AS p75_quarter_cents
    FROM f
    GROUP BY event_type
    """,
    doc="Robust per-series outlier detection: Tukey 1.5x-IQR fences from "
    "exact linear-interpolated quartiles — computed with PURE INTEGER "
    "rank arithmetic (row_number at position (n-1)*p, quarter-cent "
    "interpolation (4-f)*a + f*b, fences compared as 8*cents vs "
    "2*q1 - 3*IQR) because Spark `percentile` and DuckDB `quantile_cont` "
    "disagree on interpolation convention at sub-half positions; no "
    "float ever enters the comparison, so the flag set is engine-exact "
    "by construction.  Complements anomaly_hourly_zscore: IQR fences "
    "are insensitive to the very outliers they flag, where mean/std "
    "fences are not.  Plan shape: ONE exchange on event_type serves the "
    "rank window, the quartile-lookup window, and the final groupBy "
    "(same hash partitioning throughout); event_type cardinality is "
    "tiny so per-partition sort state is bounded.  At 100 TB swap the "
    "exact rank for approx_percentile when a single series outgrows a "
    "task's sort budget.",
)
def anomaly_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    wp = Window.partitionBy("event_type")
    wr = wp.orderBy("cents")
    rk = events.select("event_type", cents.alias("cents")).select(
        "event_type",
        "cents",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    pos = rk.select(
        "*",
        F.expr("(n - 1) DIV 4").alias("lo25"),
        ((F.col("n") - 1) % 4).alias("f25"),
        F.expr("(3 * (n - 1)) DIV 4").alias("lo75"),
        ((3 * (F.col("n") - 1)) % 4).alias("f75"),
    )
    q = pos.select(
        "*",
        F.max(F.when(F.col("r") == F.col("lo25") + 1, F.col("cents"))).over(wp).alias("a25"),
        F.max(F.when(F.col("r") == F.col("lo25") + 2, F.col("cents"))).over(wp).alias("b25"),
        F.max(F.when(F.col("r") == F.col("lo75") + 1, F.col("cents"))).over(wp).alias("a75"),
        F.max(F.when(F.col("r") == F.col("lo75") + 2, F.col("cents"))).over(wp).alias("b75"),
    )
    fr = q.select(
        "event_type",
        "cents",
        "n",
        (
            (4 - F.col("f25")) * F.col("a25")
            + F.col("f25") * F.coalesce("b25", "a25")
        ).alias("q25q"),
        (
            (4 - F.col("f75")) * F.col("a75")
            + F.col("f75") * F.coalesce("b75", "a75")
        ).alias("q75q"),
    )
    iqrq = F.col("q75q") - F.col("q25q")
    is_out = (8 * F.col("cents") < 2 * F.col("q25q") - 3 * iqrq) | (
        8 * F.col("cents") > 2 * F.col("q75q") + 3 * iqrq
    )
    return fr.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(F.when(is_out, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
        F.max("q25q").cast("bigint").alias("p25_quarter_cents"),
        F.max("q75q").cast("bigint").alias("p75_quarter_cents"),
    )


_NEAREST_TOL_DAYS = 120


@register(
    "join_asof_nearest",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey AS uid, o_orderdate + INTERVAL 9500 DAY AS od
      FROM orders
    ), b AS (
      SELECT e.event_id, max(o.od) AS pd
      FROM events e LEFT JOIN o ON o.uid = e.user_id AND o.od <= e.ts
      GROUP BY e.event_id
    ), f AS (
      SELECT e.event_id, min(o.od) AS nd
      FROM events e LEFT JOIN o ON o.uid = e.user_id AND o.od >= e.ts
      GROUP BY e.event_id
    ), g AS (
      SELECT e.event_id, b.pd, f.nd,
             date_diff('day', b.pd, CAST(e.ts AS DATE)) AS bg,
             date_diff('day', CAST(e.ts AS DATE), f.nd) AS fg
      FROM events e
      JOIN b ON b.event_id = e.event_id
      JOIN f ON f.event_id = e.event_id
    )
    SELECT event_id,
           CASE WHEN bg IS NOT NULL AND bg <= {_NEAREST_TOL_DAYS}
                     AND (fg IS NULL OR fg > {_NEAREST_TOL_DAYS} OR bg <= fg)
                THEN strftime(pd, '%Y-%m-%d')
                WHEN fg IS NOT NULL AND fg <= {_NEAREST_TOL_DAYS}
                THEN strftime(nd, '%Y-%m-%d') END AS nearest_order_date,
           CASE WHEN bg IS NOT NULL AND bg <= {_NEAREST_TOL_DAYS}
                     AND (fg IS NULL OR fg > {_NEAREST_TOL_DAYS} OR bg <= fg)
                THEN CAST(bg AS BIGINT)
                WHEN fg IS NOT NULL AND fg <= {_NEAREST_TOL_DAYS}
                THEN CAST(fg AS BIGINT) END AS day_gap,
           CASE WHEN bg IS NOT NULL AND bg <= {_NEAREST_TOL_DAYS}
                     AND (fg IS NULL OR fg > {_NEAREST_TOL_DAYS} OR bg <= fg)
                THEN 'back'
                WHEN fg IS NOT NULL AND fg <= {_NEAREST_TOL_DAYS}
                THEN 'fwd' END AS direction
    FROM g
    """,
    doc="Nearest-in-time as-of join (pandas merge_asof direction='nearest'): "
    "for each event, the closest order in EITHER direction within a "
    f"{_NEAREST_TOL_DAYS}-day tolerance, ties resolved backward.  Both "
    "directions come from ONE union + ONE exchange on user_id: the "
    "backward carry is the usual ascending running last(ignorenulls) "
    "window, the forward carry the same window over descending time — "
    "two sorts, one shuffle, no non-equi join blowup (the naive "
    "abs-difference range join is O(n*m) per key).  Order dates are "
    "shifted +9500 days so the 1995-2001 order range overlaps the 2024 "
    "events and BOTH match directions plus the no-match path are "
    "genuinely exercised (the join_asof_tolerance lesson).  Calendar-day "
    "gap semantics on both engines (datediff / date_diff('day', ...)).",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.date_add("o_orderdate", 9500).cast("timestamp").alias("od"),
    )
    r = orders.select(
        "user_id",
        F.col("od").alias("_t"),
        F.lit(0).alias("_is_left"),
        F.col("od"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    l = events.select(
        "user_id",
        F.col("ts").alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast("timestamp").alias("od"),
        "event_id",
    )
    merged = r.unionByName(l)
    # Backward: latest order at-or-before; right rows sort first at ties so
    # an order AT the event instant is visible (inclusive asof).
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward: earliest order at-or-after; descending time, right-first at
    # ties — same partitioning, so Catalyst adds a sort but NO new exchange.
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_t").desc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        merged.withColumn("pd", F.last("od", ignorenulls=True).over(wb))
        .withColumn("nd", F.last("od", ignorenulls=True).over(wf))
        .filter(F.col("_is_left") == 1)
    )
    bg = F.datediff(F.col("_t"), F.col("pd"))
    fg = F.datediff(F.col("nd"), F.col("_t"))
    tol = F.lit(_NEAREST_TOL_DAYS)
    use_back = bg.isNotNull() & (bg <= tol) & (
        fg.isNull() | (fg > tol) | (bg <= fg)
    )
    use_fwd = fg.isNotNull() & (fg <= tol)
    return carried.select(
        "event_id",
        F.when(use_back, F.date_format("pd", "yyyy-MM-dd"))
        .when(use_fwd, F.date_format("nd", "yyyy-MM-dd"))
        .alias("nearest_order_date"),
        F.when(use_back, bg)
        .when(use_fwd, fg)
        .cast("bigint")
        .alias("day_gap"),
        F.when(use_back, F.lit("back"))
        .when(use_fwd, F.lit("fwd"))
        .alias("direction"),
    )


@register(
    "window_time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(epoch_us(lead(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                           - ts) // 1000000 AS BIGINT) AS dur_s
      FROM events
    )
    SELECT user_id,
           CAST(sum(dur_s) AS BIGINT) AS total_s,
           CAST(sum(cents * dur_s) AS BIGINT) AS weighted_sum,
           CAST(sum(cents * dur_s) // sum(dur_s) AS BIGINT) AS twa_cents
    FROM seg
    WHERE dur_s IS NOT NULL AND dur_s > 0
    GROUP BY user_id
    """,
    doc="Time-weighted average (the metric a last-observation-carried-"
    "forward series needs — plain avg() over-weights chatty periods): "
    "each observation holds until the next one (lead() over the "
    "user's timeline, unique event_id tie-break), segments weight "
    "value by their INTEGER duration in seconds, and the average is "
    "an exact integer quotient (sum(cents*dur) DIV sum(dur) — no "
    "float accumulation, so summation order cannot matter).  The "
    "trailing open-ended segment is excluded (no end observation), "
    "as is any zero-length segment from equal timestamps.  One "
    "exchange on user_id serves the lead window; the rollup reuses "
    "the same partitioning.  This is the TimescaleDB "
    "time_weight('LOCF') operator re-expressed as window + integer "
    "aggregation.",
)
def window_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = events.select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.expr(
            "CAST((unix_micros(lead(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id)) "
            "- unix_micros(ts)) DIV 1000000 AS BIGINT)"
        ).alias("dur_s"),
    )
    return (
        seg.filter(F.col("dur_s").isNotNull() & (F.col("dur_s") > 0))
        .groupBy("user_id")
        .agg(
            F.sum("dur_s").cast("bigint").alias("total_s"),
            F.sum(F.col("cents") * F.col("dur_s"))
            .cast("bigint")
            .alias("weighted_sum"),
            F.expr("sum(cents * dur_s) DIV sum(dur_s)")
            .cast("bigint")
            .alias("twa_cents"),
        )
    )


@register(
    "window_ewma_finite",
    oracle="""
    SELECT event_id,
           user_id,
           round(
             list_sum(list_transform(generate_series(1, len(l)),
                                     i -> l[i] * pow(0.5, len(l) - i)))
             / (2.0 - pow(0.5, len(l) - 1)),
             4) AS ewma
    FROM (
      SELECT event_id, user_id,
             list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
             ) AS l
      FROM events
      WHERE user_id < 50
    )
    """,
    doc="Finite-horizon EWMA smoothing (alpha=0.5 over the trailing 10 "
    "observations, pandas adjust=True normalization): the standard "
    "online feature for time-decayed user activity.  The recursive "
    "EWMA definition doesn't window-ize, but the finite-horizon form "
    "is a weighted dot product over a bounded ROWS frame — collect the "
    "frame (<=10 values), weight by exact powers of two (alpha=0.5 "
    "makes every weight a dyadic rational, so the weighted sum is "
    "FP-exact and engine-identical), normalize by the closed-form "
    "geometric sum.  One shuffle on the series key; per-row work is "
    "O(horizon).  Engine trap handled: Spark element_at and DuckDB "
    "list indexing are both 1-based here, with the index sequence "
    "generated explicitly on both sides (functions like "
    "filter/transform bind 0-based in Spark but 1-based in DuckDB "
    "lambdas — avoided by indexing, not enumerating).",
)
def window_ewma_finite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    vals = F.collect_list("value").over(w)
    rows = ev.select("event_id", "user_id", vals.alias("l"))
    L = F.size("l")
    idx = F.sequence(F.lit(1), L)
    terms = F.transform(
        idx,
        lambda i: F.element_at(F.col("l"), i)
        * F.pow(F.lit(0.5), (L - i).cast("double")),
    )
    num = F.aggregate(terms, F.lit(0.0), lambda a, x: a + x)
    den = F.lit(2.0) - F.pow(F.lit(0.5), (L - 1).cast("double"))
    return rows.select(
        "event_id", "user_id", F.round(num / den, 4).alias("ewma")
    )


@register(
    "anomaly_cusum_drift",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 100) AS BIGINT) - 5000 AS dev
      FROM events WHERE user_id < 50
    ), pre AS (
      SELECT event_id, user_id, ts,
             sum(dev) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS prefix
      FROM s
    ), p AS (
      SELECT event_id, user_id, prefix,
             min(prefix) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS min_prefix_ne
      FROM pre
    )
    SELECT event_id, user_id,
           CAST(prefix - least(0, min_prefix_ne) AS BIGINT) AS cusum_cents,
           CAST(prefix - least(0, min_prefix_ne) > 20000 AS VARCHAR) AS alarm
    FROM p
    """,
    doc="CUSUM drift detection as pure window functions: the textbook "
    "recursion S_t = max(0, S_(t-1) + x_t - k) looks un-window-izable, "
    "but expands to the closed form S_t = P_t - min_(0<=i<=t) P_i with "
    "P_0 = 0 (the running min must INCLUDE the empty prefix — "
    "least(0, ...) — else a series drifting from its very first "
    "observation under-detects; caught by the property test "
    "tests/test_properties.py::test_cusum_closed_form_equals_recursion) "
    "where P is the prefix sum of deviations — so the per-series state "
    "machine becomes a running sum plus a running min over the SAME "
    "window partitioning: one shuffle on the series key, no recursion, "
    "no stateful UDF.  All-integer cents arithmetic (reference level "
    "50.00, alarm threshold 200.00 cumulative) keeps both engines "
    "bit-identical.  The streaming-shaped change-point primitive "
    "(data-drift alarms on a metric stream) in one batch window pass.",
)
def anomaly_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    dev = (F.round(F.col("value") * 100).cast("bigint") - 5000).alias("dev")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = ev.select("event_id", "user_id", "ts", dev).select(
        "event_id",
        "user_id",
        "ts",
        F.sum("dev").over(w).alias("prefix"),
    )
    rows = p.select(
        "event_id",
        "user_id",
        "prefix",
        F.min("prefix").over(w).alias("min_prefix_ne"),
    )
    cusum = (
        F.col("prefix") - F.least(F.lit(0), F.col("min_prefix_ne"))
    ).cast("bigint")
    return rows.select(
        "event_id",
        "user_id",
        cusum.alias("cusum_cents"),
        (cusum > 20000).cast("string").alias("alarm"),
    )


@register(
    "anomaly_cusum_drift_blocked",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 100) AS BIGINT) - 5000 AS dev
      FROM events WHERE user_id < 50
    ), pre AS (
      SELECT event_id, user_id, ts,
             sum(dev) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS prefix
      FROM s
    ), p AS (
      SELECT event_id, user_id, prefix,
             min(prefix) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS min_prefix_ne
      FROM pre
    )
    SELECT event_id, user_id,
           CAST(prefix - least(0, min_prefix_ne) AS BIGINT) AS cusum_cents,
           CAST(prefix - least(0, min_prefix_ne) > 20000 AS VARCHAR) AS alarm
    FROM p
    """,
    doc="Skew-safe CUSUM (r6 verdict task 4): identical semantics to "
    "anomaly_cusum_drift — S_t = P_t - min(0, min_(i<=t) P_i) — but the "
    "per-key window never sorts one key's full history in a single "
    "partition.  Each series is cut into TIME BLOCKS (calendar days); "
    "per (key, block) a local prefix sum and local running min run in "
    "parallel across blocks, then a per-key pass over the TINY block "
    "summary table (rows = keys x days, not events) computes each "
    "block's additive offset (exclusive prefix of block sums) and "
    "carry-in minimum min_(b'<b)(off_b' + min local prefix of b'), "
    "broadcast back.  Global prefix = off + local prefix; global "
    "running min = min(0, carry, off + local running min) — exact by "
    "prefix-scan decomposition (property-tested against the direct "
    "recursion in tests/test_properties.py::"
    "test_blocked_cusum_equals_recursion).  Under the 95%%-one-key skew "
    "stress the 950k-row key becomes ~30 day blocks of ~32k rows; the "
    "widest single window partition shrinks by the block count, and "
    "the only full-key-ordered pass runs over day summaries.  The "
    "oracle is deliberately the NON-blocked closed form, so parity "
    "cross-checks the decomposition itself.",
)
def anomaly_cusum_drift_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    dev = (F.round(F.col("value") * 100).cast("bigint") - 5000).alias("dev")
    blk = F.to_date("ts").alias("blk")
    w_local = (
        Window.partitionBy("user_id", "blk")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = (
        ev.select("event_id", "user_id", "ts", dev, blk)
        .select(
            "event_id",
            "user_id",
            "blk",
            "ts",
            "dev",
            F.sum("dev").over(w_local).alias("lp"),
        )
        .select(
            "event_id",
            "user_id",
            "blk",
            "dev",
            "lp",
            F.min("lp").over(w_local).alias("lmin"),
        )
    )
    # Block summary: rows = |keys| x |days| — tiny relative to events.
    blocks = local.groupBy("user_id", "blk").agg(
        F.sum("dev").alias("bsum"), F.min("lp").alias("bmin")
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = blocks.select(
        "user_id",
        "blk",
        "bmin",
        F.coalesce(F.sum("bsum").over(w_prev), F.lit(0)).alias("off"),
    )
    carry = offs.select(
        "user_id",
        "blk",
        "off",
        F.min(F.col("off") + F.col("bmin")).over(w_prev).alias("carry"),
    )
    joined = local.join(F.broadcast(carry), ["user_id", "blk"])
    gp = F.col("off") + F.col("lp")
    runmin = F.least(
        F.lit(0).cast("bigint"),
        F.coalesce(F.col("carry"), F.lit(0)),
        F.col("off") + F.col("lmin"),
    )
    cusum = (gp - runmin).cast("bigint")
    return joined.select(
        "event_id",
        "user_id",
        cusum.alias("cusum_cents"),
        (cusum > 20000).cast("string").alias("alarm"),
    )
