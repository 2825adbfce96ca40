"""Oracle-checked relational queries (SURVEY.md §2B extension surface):
joins (broadcast/sort-merge/semi/anti), aggregations (hash agg, distinct,
rollup/cube), window functions, sorts/limits/top-k, set ops, scalar
functions, as-of join, sessionization, pivot, JSON extraction,
event-time tumbling windows.

Numeric convention: computed double aggregates are rounded identically
on both sides; raw column values pass through unrounded (bit-identical
in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import register
from ..sources.batch import load_table
from .relational import asof_join, sessionize, topk_per_group


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------

@register(
    "tpch_q1_pricing_summary",
    oracle="""
    WITH li AS (
        SELECT CAST(l_quantity AS BIGINT)                 AS qty_i,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
               CAST(round(l_discount * 100) AS BIGINT)    AS disc_c,
               CAST(round(l_tax * 100) AS BIGINT)         AS tax_c,
               l_returnflag, l_linestatus
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(sum(qty_i) AS DOUBLE)                        AS sum_qty,
           CAST(sum(price_c) AS DOUBLE) / 100.0              AS sum_base_price,
           CAST(sum(price_c * (100 - disc_c)) AS DOUBLE) / 10000.0 AS sum_disc_price,
           CAST(sum(price_c * (100 - disc_c) * (100 + tax_c)) AS DOUBLE) / 1000000.0
                                                             AS sum_charge,
           CAST(sum(qty_i) AS DOUBLE) / count(*)             AS avg_qty,
           CAST(sum(price_c) AS DOUBLE) / count(*) / 100.0   AS avg_price,
           CAST(sum(disc_c) AS DOUBLE) / count(*) / 100.0    AS avg_disc,
           count(*) AS count_order
    FROM li
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
    doc="TPC-H Q1 shape: scan-filter-hash-agg, 8 aggregates. Partial+final "
    "agg under AQE; filter pushed to parquet scan. Money columns are "
    "fixed-point 2-decimal in the data, so sums run on exact scaled "
    "integers (cents / e4 / e6 units) with decimal(38,0) accumulators: "
    "order-independent and overflow-proof at any scale.  The sf10 sweep "
    "caught the double-sum version drifting past the 2-dp rounding at "
    "~30M rows/group (parallel partial sums reassociate); the exact "
    "formulation is the one a 100 TB engine needs.  Outputs are "
    "deterministic IEEE doubles with NO round() calls (Spark's "
    "string-based HALF_UP vs DuckDB's binary round diverge on halves).",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qty_i = F.col("l_quantity").cast("bigint")
    price_c = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    disc_c = F.round(F.col("l_discount") * 100, 0).cast("bigint")
    tax_c = F.round(F.col("l_tax") * 100, 0).cast("bigint")
    # products stay in int64 (<= ~1.2e11 per element).  Elements are cast
    # to decimal(18,0) — precision <= 18 keeps Spark on the long-backed
    # compact-decimal fast path — and Sum auto-widens its accumulator to
    # decimal(28,0), so group sums never wrap (int64 sums would overflow
    # near sf100 for sum_charge; DuckDB's HUGEINT does this implicitly)
    dec = "decimal(18,0)"
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            qty_i.alias("qty_i"),
            price_c.alias("price_c"),
            (price_c * (100 - disc_c)).alias("disc_e4"),
            (price_c * (100 - disc_c) * (100 + tax_c)).alias("charge_e6"),
            disc_c.alias("disc_c"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("qty_i").cast(dec)).cast("double").alias("sum_qty"),
            (F.sum(F.col("price_c").cast(dec)).cast("double") / 100.0).alias("sum_base_price"),
            (F.sum(F.col("disc_e4").cast(dec)).cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(F.col("charge_e6").cast(dec)).cast("double") / 1000000.0).alias("sum_charge"),
            (F.sum(F.col("qty_i").cast(dec)).cast("double") / n).alias("avg_qty"),
            (F.sum(F.col("price_c").cast(dec)).cast("double") / n / 100.0).alias("avg_price"),
            (F.sum(F.col("disc_c").cast(dec)).cast("double") / n / 100.0).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="Hierarchical totals via ROLLUP: (flag,status), (flag), () grouping sets.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_price,
           count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets over orders.  The () grouping set sums the "
    "whole table into one group, so the money sum runs on exact cents "
    "with a decimal accumulator (order-independent at any scale) rather "
    "than drift-prone double addition.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    price_c = F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("decimal(18,0)")
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority", price_c.alias("price_c"))
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            (F.sum("price_c").cast("double") / 100.0).alias("sum_price"),
            F.count("*").alias("n"),
        )
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM events
    GROUP BY event_type
    """,
    doc="Exact distinct aggregation (expand+two-phase agg in Spark). "
    "events.value is fixed-point 2-decimal, so the per-type sum runs on "
    "exact cents with a decimal accumulator (r8 forward-hardening against "
    "the q1 sf10 failure class: coarse groups sum ~all rows, and parallel "
    "double partial sums reassociate past the 2-dp rounding).",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    value_c = F.round(F.col("value") * 100, 0).cast("bigint").cast("decimal(18,0)")
    return (
        _t(spark, sf_dir, "events")
        .select("event_type", "user_id", value_c.alias("value_c"))
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
            (F.sum("value_c").cast("double") / 100.0).alias("sum_value"),
        )
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           true AS approx_ok,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    doc="approx_count_distinct (HyperLogLog++) — the 100 TB path for distinct "
    "counts: constant memory, no expand. Oracle-checkable form: the exact "
    "distinct count plus a boolean asserting the HLL estimate is within 5% "
    "of it (HLL is deterministic for fixed data, so the bound is stable).",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                < 0.05
            ).alias("approx_ok"),
            "n_events",
        )
    )


@register(
    "agg_stats",
    oracle="""
    SELECT event_type,
           round(avg(value), 4)         AS avg_value,
           round(stddev_samp(value), 4) AS sd_value,
           round(min(value), 2)         AS min_value,
           round(max(value), 2)         AS max_value,
           round(median(value), 2)      AS median_value
    FROM events
    GROUP BY event_type
    """,
    doc="Statistical aggregates incl. exact median (percentile).",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.stddev_samp("value"), 4).alias("sd_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
            F.round(F.expr("percentile(value, 0.5)"), 2).alias("median_value"),
        )
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_orderkey, orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    headline=True,
    doc="TPC-H Q3 shape: 3-way join + agg + global top-10. Customer side "
    "broadcast; deterministic tiebreak on l_orderkey.",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1996-01-01 00:00:00").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    )


@register(
    "tpch_q5_local_supplier",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    headline=True,
    doc="TPC-H Q5 shape: 6-way star join. Dims broadcast, fact joins planned "
    "by Catalyst/AQE.",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    """,
    doc="Left-semi join (EXISTS): customers with a recent order.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
    )
    """,
    doc="Left-anti join (NOT EXISTS): customers with no pending ('P') orders.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@register(
    "join_outer_null_handling",
    oracle="""
    SELECT c_custkey,
           coalesce(n_orders, 0) AS n_orders,
           round(coalesce(total_spend, 0), 2) AS total_spend
    FROM customer
    LEFT JOIN (
      SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS total_spend
      FROM orders GROUP BY o_custkey
    ) o ON c_custkey = o_custkey
    """,
    doc="Left-outer join against a pre-aggregated side (agg pushed below the "
    "join — at scale this shrinks the shuffle by |orders|/|customers|).",
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("total_spend"))
    )
    return cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.round(F.coalesce("total_spend", F.lit(0.0)), 2).alias("total_spend"),
    )


@register(
    "join_asof_last_order",
    oracle="""
    SELECT e.event_id,
           strftime(max(o.o_orderdate), '%Y-%m-%d') AS last_order_date
    FROM events e
    LEFT JOIN orders o
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    GROUP BY e.event_id
    """,
    headline=True,
    doc="As-of (backward) join: latest order at each event time. Implemented "
    "as union + running last() window over one key shuffle (operators."
    "relational.asof_join) — O(n log n), no non-equi join blowup.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events").select(
        "event_id", F.col("user_id"), "ts"
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    joined = asof_join(
        events,
        orders,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["o_orderdate"],
    )
    return joined.select(
        "event_id",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_order_date"),
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

@register(
    "window_topk_per_group",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rnk
    FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (
               PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
             ) AS rnk
      FROM lineitem
    )
    WHERE rnk <= 3
    """,
    doc="Per-group top-k via row_number window — one shuffle, no global sort.",
)
def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk_per_group(
        _t(spark, sf_dir, "lineitem").select(
            "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"
        ),
        part_cols=["l_suppkey"],
        order_cols=[
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        ],
        k=3,
    )


@register(
    "window_running_lag",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_value,
           lag(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_type,
           rank() OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS rnk
    FROM events
    """,
    doc="Running sum + lag + rank sharing one window partitioning (single "
    "exchange in the physical plan).",
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_value"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.rank().over(w).alias("rnk"),
    )


@register(
    "window_sessionization",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessioned AS (
      SELECT user_id,
             sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM marked
    )
    SELECT user_id,
           count(DISTINCT session_id) AS n_sessions,
           count(*) AS n_events
    FROM sessioned
    GROUP BY user_id
    """,
    headline=True,
    doc="Sessionization: 30-min inactivity gap → new session (lag + running "
    "sum, integer-µs gap math). Streaming twin: session_window in "
    "streaming.pipeline.",
)
def window_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = sessionize(
        _t(spark, sf_dir, "events"),
        user_col="user_id",
        ts_col="ts",
        gap_seconds=1800,
        order_tiebreak="event_id",
    )
    return df.groupBy("user_id").agg(
        F.count_distinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@register(
    "window_tumbling_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Event-time tumbling window (batch twin of the streaming hourly agg).",
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# Sorts / limits / set ops / pivot / scalar functions / JSON
# --------------------------------------------------------------------------

@register(
    "sort_limit_topn",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="Global top-N: Spark plans TakeOrderedAndProject (per-partition heap + "
    "driver merge of N) — no full sort at any scale.",
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "setop_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    doc="INTERSECT (distinct) — users who both clicked and purchased.",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@register(
    "setop_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click' AND value > 180
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 180
    """,
    doc="EXCEPT (distinct) — high-value clickers with no high-value purchase.",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(
        (F.col("event_type") == "click") & (F.col("value") > 180)
    ).select("user_id")
    buys = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 180)
    ).select("user_id")
    return clicks.subtract(buys)  # EXCEPT DISTINCT


@register(
    "setop_union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'signup'
    UNION
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    doc="UNION (distinct).",
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "signup").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.union(b).distinct()


@register(
    "pivot_linestatus",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pivot: one column per linestatus value (explicit value list — no "
    "extra distinct-values job at scale).",
)
def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@register(
    "scalar_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_mktsegment) AS seg_u,
           length(c_name) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg_nb,
           round(c_acctbal, 0) AS bal_r,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band
    FROM customer
    """,
    doc="Scalar function coverage: string ops, nullif/coalesce, CASE bands "
    "(reference scalar surface: concat/date/nullif — lambda_function.py:46-49,80).",
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_u"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("(none)")).alias(
            "seg_nb"
        ),
        F.round("c_acctbal", 0).alias("bal_r"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
    )


@register(
    "json_extraction",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="Semi-structured JSON column extraction + agg (reference's JSON parse "
    "surface, lambda_function.py:45, over the dynamic props column).",
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
            F.count("*").alias("n"),
        )
    )


@register(
    "window_sliding_15min",
    oracle="""
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n,
           CAST(sum(value_c) AS DOUBLE) / 100.0 AS sum_value
    FROM (
      SELECT make_timestamp(CAST(((epoch_us(ts) // 900000000) - k.k) * 900000000 AS BIGINT))
               AS win_start,
             CAST(round(value * 100) AS BIGINT) AS value_c
      FROM events, (SELECT unnest(range(4)) AS k) k
    )
    GROUP BY 1
    """,
    doc="Sliding event-time windows (1h window, 15min slide): each event "
    "lands in 4 overlapping windows. Batch twin of streaming.sliding_counts; "
    "the oracle expands the window set arithmetically. Per-window money "
    "sums run on exact cents with a decimal accumulator (r8 "
    "forward-hardening: 15-min windows at 100 TB hold millions of rows, "
    "the scale where double partial-sum reassociation drifted q1 at sf10).",
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    value_c = F.round(F.col("value") * 100, 0).cast("bigint").cast("decimal(18,0)")
    return (
        _t(spark, sf_dir, "events")
        .select("ts", value_c.alias("value_c"))
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            (F.sum("value_c").cast("double") / 100.0).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n",
            "sum_value",
        )
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT event_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ), 2) AS rolling_1h_value,
           lead(event_type) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
           ) AS next_type,
           dense_rank() OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
           ) AS drnk
    FROM events
    """,
    doc="RANGE-framed window (rolling 1h sum keyed on event-time micros) + "
    "lead + dense_rank sharing one partitioning/exchange.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("ts_us")
    return ev.select(
        "event_id",
        F.round(
            F.sum("value").over(w.rangeBetween(-3_600_000_000, 0)), 2
        ).alias("rolling_1h_value"),
        F.lead("event_type").over(w).alias("next_type"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "setop_except_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    doc="EXCEPT ALL (multiset difference, preserves multiplicity).",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.exceptAll(buys)


@register(
    "dynamic_map_allowlist",
    oracle="""
    SELECT event_id,
           2 AS n_kept_keys,
           json_extract_string(props, '$.k') || '|' || event_type AS kept_values
    FROM events
    """,
    doc="Dynamic-schema projection on map columns: map_filter allowlist over "
    "a runtime-built map — the MapType twin of the ES field allowlist "
    "(reference _filter_for_es, lambda_function.py:52-54; SURVEY §2B "
    "'map_filter ≅ allowlist projection on dynamic maps').",
)
def dynamic_map_allowlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("k"), F.get_json_object("props", "$.k"),
        F.lit("type"), F.col("event_type"),
        F.lit("dropme"), F.lit("x"),
    )
    kept = F.map_filter(m, lambda k, v: k.isin("k", "type"))
    return ev.withColumn("_kept", kept).select(
        "event_id",
        F.size("_kept").alias("n_kept_keys"),
        F.concat_ws(
            "|", F.element_at("_kept", "k"), F.element_at("_kept", "type")
        ).alias("kept_values"),
    )


@register(
    "join_sortmerge_hint",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_lines,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Fact-to-fact equi-join forced to sort-merge via MERGE hint — the "
    "join strategy two 100 TB tables actually get (broadcast is off the "
    "table); locally AQE would broadcast, so the hint pins the SMJ plan "
    "shape the scale case exercises.",
)
def join_sortmerge_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").hint("merge")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) s
      ON c.c_nationkey = s.s_nationkey
    """,
    doc="Full-outer join of pre-aggregated sides: nations with customers "
    "and/or suppliers, nulls filled on the missing side.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, c.c_nationkey == s.s_nationkey, "full_outer").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    doc="Explicit GROUPING SETS via the SQL API (spark.sql over a temp "
    "view) — same Catalyst plan as the DataFrame path; demonstrates the "
    "engine's SQL entry point.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "cross_join_grid",
    oracle="""
    SELECT r.r_name, f.l_returnflag, coalesce(x.n, 0) AS n
    FROM region r
    CROSS JOIN (SELECT DISTINCT l_returnflag FROM lineitem) f
    LEFT JOIN (
      SELECT n_regionkey, l_returnflag, count(*) AS n
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      GROUP BY 1, 2
    ) x ON x.n_regionkey = r.r_regionkey AND x.l_returnflag = f.l_returnflag
    """,
    doc="Cross join building a dense dimension grid, left-filled from a "
    "fact aggregate — the sparse-to-dense reporting pattern (cross join of "
    "two tiny dims is driver-free and broadcastable).",
)
def cross_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    flags = _t(spark, sf_dir, "lineitem").select("l_returnflag").distinct()
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    fact = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey", "l_returnflag")
        .agg(F.count("*").alias("n"))
    )
    grid = region.crossJoin(flags)
    return grid.join(
        fact,
        (fact.n_regionkey == region.r_regionkey)
        & (fact.l_returnflag == grid.l_returnflag),
        "left",
    ).select(
        "r_name",
        grid.l_returnflag,
        F.coalesce("n", F.lit(0)).alias("n"),
    )


@register(
    "join_range_interval",
    oracle="""
    WITH priced AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    )
    SELECT tier, count(*) AS n_items,
           round(sum(cents) / 100.0, 2) AS revenue
    FROM priced
    JOIN (VALUES ('budget',   0,        2000000),
                 ('standard', 2000000,  6000000),
                 ('premium',  6000000,  20000000)) tiers(tier, lo, hi)
      ON cents >= lo AND cents < hi
    GROUP BY tier
    """,
    doc="Range/interval (band) join: facts matched to a banded dimension "
    "on lo <= v < hi — no equi-key, so Spark plans a "
    "BroadcastNestedLoopJoin with the 3-row band table broadcast "
    "(asserted in tests/test_plans.py). The scale rule for banded "
    "dims: broadcast the bands and keep the fact side streaming; only "
    "if BOTH sides are large does this need binning to an equi-join "
    "(band id = v / width) — documented escape hatch, not needed for "
    "dimension-sized band tables. Prices in integer cents so band "
    "membership is exact at the boundaries.",
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    priced = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents")
    )
    tiers = spark.createDataFrame(
        [("budget", 0, 2_000_000), ("standard", 2_000_000, 6_000_000),
         ("premium", 6_000_000, 20_000_000)],
        "tier: string, lo: bigint, hi: bigint",
    )
    return (
        priced.join(
            F.broadcast(tiers),
            (priced.cents >= tiers.lo) & (priced.cents < tiers.hi),
        )
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
        )
    )


@register(
    "agg_salted_skew",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM events
    GROUP BY event_type
    """,
    doc="Skew-salted two-phase aggregation (operators.relational."
    "salted_aggregate): partials on (key, salt) then exact merge on the "
    "key — result identical to the plain GROUP BY oracle, plan spreads "
    "a hot key over 16 reducers.  The summed column is pre-projected to "
    "exact cents (decimal accumulator), so the two-phase salted sum is "
    "bit-identical to the one-phase oracle at any scale — double partials "
    "would make the salted/unsalted results drift apart as groups grow.",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .relational import salted_aggregate

    events = _t(spark, sf_dir, "events").withColumn(
        "value_c", F.round(F.col("value") * 100, 0).cast("bigint").cast("decimal(18,0)")
    )
    out = salted_aggregate(
        events,
        keys=["event_type"],
        salt_buckets=16,
        sum_cols={"value_c": "sum_value_c"},
        count_alias="n",
    )
    return out.select(
        "event_type",
        "n",
        (F.col("sum_value_c").cast("double") / 100.0).alias("sum_value"),
    )


@register(
    "grouped_map_regression",
    oracle="""
    SELECT user_id,
           round(regr_slope(value, epoch(ts) - 1704067200), 6) + 0.0 AS slope,
           count(*) AS n
    FROM events
    GROUP BY user_id
    """,
    doc="Per-group OLS slope via applyInPandas (Arrow grouped-map) — the "
    "sanctioned pandas path for per-group model fitting; closed-form "
    "sums on centered x so float64 stays exact, checked against DuckDB's "
    "regr_slope.",
)
def grouped_map_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        # centered integer seconds -> sums are exact in float64
        x = (pdf["ts"].astype("int64") // 1_000_000_000) - 1_704_067_200
        y = pdf["value"]
        n = len(pdf)
        sx, sy = float(x.sum()), float(y.sum())
        sxx = float((x * x).sum())
        sxy = float((x * y).sum())
        denom = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / denom if denom != 0 else float("nan")
        return pd.DataFrame(
            {"user_id": [pdf["user_id"].iloc[0]], "slope": [round(slope, 6) + 0.0], "n": [n]}
        )

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    return ev.groupBy("user_id").applyInPandas(
        fit, schema="user_id bigint, slope double, n bigint"
    )


@register(
    "scalar_date_functions",
    oracle="""
    SELECT o_orderkey,
           extract(year FROM o_orderdate)    AS yr,
           extract(month FROM o_orderdate)   AS mo,
           extract(day FROM o_orderdate)     AS dy,
           extract(quarter FROM o_orderdate) AS qtr,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
           strftime(o_orderdate + INTERVAL 7 DAY, '%Y-%m-%d') AS week_later,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
    FROM orders
    WHERE o_orderkey < 500
    """,
    doc="Temporal scalar coverage: extract parts, day arithmetic, interval "
    "add, month truncation (reference temporal surface: fromisoformat + "
    "date(), lambda_function.py:80).",
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dy"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.datediff(
            F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("bigint").alias("days_to_y2k"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 7), "yyyy-MM-dd").alias(
            "week_later"
        ),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
    )


@register(
    "scalar_string_functions",
    oracle="""
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           replace(c_name, '#', '-') AS renamed,
           trim('  ' || c_mktsegment || ' ') AS trimmed,
           reverse(c_mktsegment) AS rev_seg,
           repeat('*', c_custkey % 4) AS stars,
           left(c_name, 4) AS name_left,
           right(c_name, 3) AS name_right,
           strpos(c_name, '#') AS hash_pos,
           concat_ws('/', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_path
    FROM customer
    WHERE c_custkey < 400
    """,
    doc="String scalar coverage: pad/replace/trim/reverse/repeat/slice/"
    "position/concat_ws.",
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 400)
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("renamed"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "trimmed"
        ),
        F.reverse("c_mktsegment").alias("rev_seg"),
        F.repeat(F.lit("*"), (F.col("c_custkey") % 4).cast("int")).alias("stars"),
        F.substring("c_name", 1, 4).alias("name_left"),
        F.substring(F.col("c_name"), -3, 3).alias("name_right"),
        F.instr("c_name", "#").cast("bigint").alias("hash_pos"),
        F.concat_ws(
            "/", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("seg_path"),
    )


@register(
    "scalar_null_semantics",
    oracle="""
    SELECT c_custkey,
           nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'fallback') AS with_fallback,
           (nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL) AS is_building,
           CASE WHEN c_acctbal IS NULL THEN -1 ELSE 1 END AS null_flag,
           ifnull(NULL, c_custkey) AS ifnulled
    FROM customer
    WHERE c_custkey < 300
    """,
    doc="NULL-semantics coverage: nullif/coalesce/null-safe comparison/"
    "ifnull — the engine-wide absent-vs-null discipline (SURVEY §7).",
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg_or_null.alias("seg_or_null"),
        F.coalesce(seg_or_null, F.lit("fallback")).alias("with_fallback"),
        seg_or_null.eqNullSafe(F.lit(None).cast("string")).alias("is_building"),
        F.when(F.col("c_acctbal").isNull(), -1).otherwise(1).alias("null_flag"),
        F.ifnull(F.lit(None).cast("long"), F.col("c_custkey")).alias("ifnulled"),
    )


@register(
    "array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(embedding[1]::DOUBLE, 6) AS first_val,
           round(list_max(list_transform(embedding, x -> x::DOUBLE)), 6) AS max_val,
           round(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(embedding[1:8], x -> x::DOUBLE)),
                 (a, x) -> a + x), 6) AS head8_sum,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    WHERE vec_id < 200
    """,
    doc="Array / higher-order function coverage over the embedding column: "
    "size, element access, transform+max, sequential slice fold, filter "
    "count — the primitives the dedup/similarity operators build on.",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import seq_sum

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.array_max(F.transform(emb, lambda x: x.cast("double"))), 6
        ).alias("max_val"),
        F.round(
            seq_sum(F.transform(F.slice(emb, 1, 8), lambda x: x.cast("double"))), 6
        ).alias("head8_sum"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("bigint").alias("n_positive"),
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
           / 10000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: multi-predicate scan + single agg — pure pushdown "
    "+ whole-stage-codegen sum, the fastest possible plan class.  The "
    "single-group revenue sum runs on exact e4-scaled integers (cents x "
    "discount-cents) with a decimal accumulator: a grand-total double sum "
    "is the worst case for parallel-reassociation drift (the sf10 sweep "
    "caught exactly this on q1), and fixed-point data makes exactness free.",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rev_e4 = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
        * F.round(F.col("l_discount") * 100, 0).cast("bigint")
    ).cast("decimal(18,0)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(rev_e4).cast("double") / 10000.0).alias("revenue")
        )
    )


@register(
    "tpch_q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS -> left-semi join, then agg.",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "tpch_q12_priority_shipmode",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 shape: join + conditional CASE aggregation (returnflag "
    "substitutes for the reference schema's missing shipmode).",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_share",
    oracle="""
    SELECT round(
             100.00 * sum(CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: broadcast dim join + conditional revenue share.",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q18_large_volume",
    oracle="""
    SELECT c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(total_qty, 2) AS total_qty
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 95
    ) big ON big.l_orderkey = o_orderkey
    """,
    doc="TPC-H Q18 shape: HAVING subquery (pre-aggregated fact) joined back "
    "to orders/customer — the agg runs before the join, shrinking the "
    "shuffle to qualifying keys only.",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 95)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


@register(
    "unpivot_stack",
    oracle="""
    SELECT c_custkey, metric, round(val, 2) AS val
    FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    )
    WHERE c_custkey < 200
    """,
    doc="Unpivot (wide -> long) via stack — the inverse of pivot; planned as "
    "an Expand node, no shuffle.",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return c.selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) "
        "AS (metric, val)",
    ).select("c_custkey", "metric", F.round("val", 2).alias("val"))


@register(
    "agg_advanced",
    oracle="""
    SELECT event_type,
           round(corr(value, epoch_us(ts) / 1000000.0), 6) + 0.0 AS corr_vt,
           round(covar_samp(value, user_id::DOUBLE), 4) + 0.0 AS covar_vu,
           bit_or(user_id) AS users_bit_or,
           bit_and(user_id % 16) AS low_bits_and,
           array_to_string(list_sort(list_distinct(array_agg(user_id % 25))), ',')
             AS user_buckets
    FROM events
    GROUP BY event_type
    """,
    doc="Advanced aggregates: Pearson correlation, sample covariance, "
    "bitwise OR/AND, and order-normalized collect_set (deterministic "
    "string form for hashing).",
)
def agg_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            (F.round(F.corr("value", F.unix_micros("ts") / 1_000_000.0), 6) + 0.0).alias(
                "corr_vt"
            ),
            (F.round(F.covar_samp("value", F.col("user_id").cast("double")), 4) + 0.0).alias(
                "covar_vu"
            ),
            F.bit_or("user_id").alias("users_bit_or"),
            F.bit_and(F.col("user_id") % 16).alias("low_bits_and"),
            F.array_join(
                F.sort_array(F.collect_set(F.col("user_id") % 25)), ","
            ).alias("user_buckets"),
        )
    )


@register(
    "gap_fill_daily",
    oracle="""
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
    ), spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day, t.event_type,
           coalesce(d.n, 0) AS n
    FROM spine s CROSS JOIN types t
    LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type
    """,
    doc="Time-series gap filling: dense (day x type) spine generated from the "
    "data's own bounds, left-filled with zeros — the hypertable-rollup "
    "pattern; spine generation is a broadcastable scalar-driven sequence.",
)
def gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    types = ev.select("event_type").distinct()
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    grid = spine.crossJoin(types)
    return grid.join(daily, ["day", "event_type"], "left").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        F.coalesce("n", F.lit(0)).alias("n"),
    )


@register(
    "tpch_q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, yr,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             extract(year FROM l_shipdate) AS yr,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        AND n2.n_name IN ('NATION_1', 'NATION_2')
        AND n1.n_name != n2.n_name
    )
    GROUP BY supp_nation, cust_nation, yr
    """,
    doc="TPC-H Q7 shape: bilateral nation-pair shipping volume by year — "
    "double dimension join with asymmetric pair filter.",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    both = F.col("supp_nation").isin("NATION_1", "NATION_2") & F.col(
        "cust_nation"
    ).isin("NATION_1", "NATION_2")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.s_nkey)
        .join(F.broadcast(n2), cust.c_nationkey == n2.c_nkey)
        .filter(both & (F.col("supp_nation") != F.col("cust_nation")))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("yr"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q9_product_profit",
    headline=True,
    oracle="""
    SELECT n_name AS nation, yr,
           round(sum(amount_cents) / 100.0, 2) AS profit
    FROM (
      SELECT n_name,
             extract(year FROM o_orderdate) AS yr,
             CAST(round((l_extendedprice * (1 - l_discount)
               - 0.6 * p_retailprice * l_quantity) * 100.0) AS BIGINT) AS amount_cents
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%'
    )
    GROUP BY n_name, yr
    """,
    doc="TPC-H Q9 shape: product profit by nation/year (supplycost stand-in: "
    "0.6 x retail price); LIKE-filtered part dim broadcast into the fact "
    "join chain.",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nat = _t(spark, sf_dir, "nation")
    # exact integer-cents accumulation: the subtraction makes group sums
    # land on rounding boundaries, so per-item cent rounding (identical
    # doubles in both engines) + BIGINT sum keeps the result order-proof
    amount_cents = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100.0,
        0,
    ).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(F.round(F.sum(amount_cents) / 100.0, 2).alias("profit"))
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer, top-20 with "
    "deterministic tiebreak.",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@register(
    "tpch_q19_disjunctive",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 30)
    """,
    doc="TPC-H Q19 shape: disjunctive multi-branch predicate across the "
    "join — tests OR-predicate planning (join-level filter, no pushdown "
    "split).",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") >= 10)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & (F.col("l_quantity") >= 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & (F.col("l_quantity") >= 30)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "agg_histogram",
    oracle="""
    SELECT CASE WHEN value < 0.0 THEN 0
                WHEN value >= 200.0 THEN 11
                ELSE CAST(floor(value / 20.0) AS BIGINT) + 1 END AS bucket,
           count(*) AS n,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi
    FROM events
    GROUP BY 1
    """,
    doc="Equi-width histogram via width_bucket — single hash agg, the "
    "profiling primitive for numeric columns.",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.width_bucket("value", F.lit(0.0), F.lit(200.0), F.lit(10)).alias(
                "bucket"
            )
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


@register(
    "window_ntile_quartiles",
    oracle="""
    SELECT event_type, quartile,
           count(*) AS n,
           round(avg(value), 4) AS avg_value
    FROM (
      SELECT event_type, value,
             ntile(4) OVER (
               PARTITION BY event_type ORDER BY value, event_id
             ) AS quartile
      FROM events
    )
    GROUP BY event_type, quartile
    """,
    doc="ntile window bucketing into per-type quartiles (deterministic "
    "tiebreak), aggregated to quartile profiles.",
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ev = _t(spark, sf_dir, "events").withColumn("quartile", F.ntile(4).over(w))
    return ev.groupBy("event_type", "quartile").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


@register(
    "cdc_merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, c_name, c_nationkey,
             round(c_acctbal + 100.0, 2) AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey < 100
      UNION ALL
      SELECT 900000 + r.range, 'new_customer', 0, 0.0, 'BUILDING'
      FROM range(5) r
    ), merged AS (
      SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS c_acctbal,
             c_mktsegment, false AS from_update
      FROM customer
      WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2), c_mktsegment,
             true
      FROM updates
    )
    SELECT c_custkey, c_name, c_acctbal, from_update FROM merged
    """,
    doc="MERGE/upsert emulation without a table format: target anti-join "
    "updates + union (the guide's CDC/SCD2 pattern; with Delta/Iceberg on "
    "the classpath this becomes MERGE INTO with the same join plan "
    "underneath). One shuffle on the merge key.",
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    target = _t(spark, sf_dir, "customer")
    updates = target.filter(F.col("c_custkey") < 100).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        "c_mktsegment",
    ).unionByName(
        spark.range(5).select(
            (F.col("id") + 900000).alias("c_custkey"),
            F.lit("new_customer").alias("c_name"),
            F.lit(0).cast("int").alias("c_nationkey"),
            F.lit(0.0).alias("c_acctbal"),
            F.lit("BUILDING").alias("c_mktsegment"),
        )
    )
    kept = target.join(updates, "c_custkey", "left_anti").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
        F.lit(False).alias("from_update"),
    )
    merged = kept.unionByName(
        updates.withColumn("from_update", F.lit(True))
    )
    return merged.select("c_custkey", "c_name", "c_acctbal", "from_update")


@register(
    "tpch_q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(extract(year FROM o_orderdate) AS INTEGER) AS o_year,
             CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
               AS vol_cents,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n1.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'ASIA'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol_cents
                          ELSE 0 END) * 1.0 / sum(vol_cents), 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: national market share inside a region by year — "
    "a 6-table snowflake join where every dimension (nation x2, region, "
    "supplier, customer) broadcasts, so the only shuffle is the final "
    "tiny per-year aggregation. Share is a ratio of exact integer-cent "
    "sums: order-independent across engines.",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
            .alias("vol_cents"),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_2", F.col("vol_cents")).otherwise(0)
            )
            * 1.0
            / F.sum("vol_cents"),
            6,
        ).alias("mkt_share")
    )


_SKEW_SALT = 8


@register(
    "join_salted_skew",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2)
             AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Skew-mitigated (salted) shuffle join: the probe side tags each "
    "row with a deterministic salt (l_linenumber % 8) and the build side "
    "is replicated 8x via explode(sequence(0,7)), so the join key becomes "
    "(orderkey, salt) and a single hot orderkey fans out over 8 reducer "
    "partitions instead of melting one. The oracle is the plain unsalted "
    "join — salting must be semantics-preserving. This is the manual "
    "escape hatch for skew that AQE's skewJoin handles adaptively; at "
    "100 TB you reach for it when the skew is known ahead of time (a "
    "power-law key like a null-bucket or a mega-customer) and the build "
    "side is small enough that 8x replication is cheaper than a stalled "
    "straggler. Revenue accumulates in integer cents for exactness.",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    salted_orders = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.explode(F.sequence(F.lit(0), F.lit(_SKEW_SALT - 1))).alias("salt"),
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_linenumber") % _SKEW_SALT).alias("salt"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    return (
        li.join(
            salted_orders,
            (li.l_orderkey == salted_orders.o_orderkey)
            & (li.salt == salted_orders.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
        )
    )


@register(
    "join_shuffled_hash_hint",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_lines,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_acctbal > 0
    GROUP BY l_returnflag
    """,
    doc="Equi-join pinned to shuffled-hash via the SHUFFLE_HASH hint: "
    "the third join strategy (beside broadcast and sort-merge) — right "
    "when both sides are too big to broadcast but one side's "
    "PER-PARTITION hash table fits in memory, because it skips the "
    "sort phase entirely.  At 100 TB the supplier side partitions hash "
    "small, so SHJ beats SMJ on this shape; plan-asserted in "
    "tests/test_plans.py.",
)
def join_shuffled_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 0).hint(
        "shuffle_hash"
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "join_asof_tolerance",
    oracle="""
    WITH o AS (
        SELECT o_custkey AS user_id,
               o_orderdate + INTERVAL 9500 DAY AS o_orderdate
        FROM orders
    ),
    m AS (
        SELECT e.event_id, e.ts, max(o.o_orderdate) AS last_dt
        FROM events e
        LEFT JOIN o ON o.user_id = e.user_id AND o.o_orderdate <= e.ts
        GROUP BY e.event_id, e.ts
    )
    SELECT event_id,
           CASE WHEN date_diff('day', last_dt, ts) <= 90
                THEN strftime(last_dt, '%Y-%m-%d') END AS last_order_date,
           CASE WHEN date_diff('day', last_dt, ts) <= 90
                THEN CAST(date_diff('day', last_dt, ts) AS BIGINT) END
             AS staleness_days
    FROM m
    """,
    doc="As-of join with a staleness tolerance (the market-data "
    "semantics: a quote older than the bound is no match at all): the "
    "same union + running-last() single-shuffle plan as "
    "join_asof_last_order, then matches farther than 90 days back are "
    "nulled — correct because the unconstrained latest match IS the "
    "max of the tolerance-constrained set whenever one exists.  No "
    "second join, no non-equi blowup; the tolerance is a per-row "
    "filter on the carried timestamp.  Tolerance is CALENDAR-DAY on "
    "both engines (datediff / date_diff('day', ...) — both cast the "
    "timestamp to its date before differencing), so an order exactly "
    "90 days before the event's date matches regardless of the "
    "event's time-of-day.  Order dates are shifted by a fixed +9500 "
    "days (exact day arithmetic, no month-length ambiguity) so the "
    "1995-2001 order range overlaps the 2024 event range and the "
    "in-tolerance path is genuinely exercised, not vacuously green.",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events").select("event_id", F.col("user_id"), "ts")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.date_add("o_orderdate", 9500).alias("o_orderdate"),
    )
    joined = asof_join(
        events,
        orders,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["o_orderdate"],
    )
    in_tol = F.datediff(F.col("ts"), F.col("o_orderdate")) <= 90
    return joined.select(
        "event_id",
        F.when(in_tol, F.date_format("o_orderdate", "yyyy-MM-dd")).alias(
            "last_order_date"
        ),
        F.when(in_tol, F.datediff(F.col("ts"), F.col("o_orderdate")))
        .cast("bigint")
        .alias("staleness_days"),
    )


@register(
    "agg_boolean_conditional",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT)
             AS n_big,
           CAST(bool_and(o_totalprice > 0) AS VARCHAR) AS all_positive,
           CAST(bool_or(o_orderpriority = '1-URGENT') AS VARCHAR) AS any_urgent,
           CAST(min(o_orderkey) AS BIGINT) AS exemplar_key
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Boolean/conditional aggregate surface: count_if (FILTER "
    "clause), every/bool_and, some/bool_or, and a DETERMINISTIC "
    "exemplar via min() — any_value() is explicitly avoided because "
    "its result is partition-order dependent and would never survive "
    "an engine-parity hash (the same discipline as the deterministic "
    "mode() tie-break).  Booleans are cast to strings for a stable "
    "cross-engine dtype.  All four ride the table's one aggregation "
    "exchange.",
)
def agg_boolean_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 100000).cast("bigint").alias("n_big"),
        F.every(F.col("o_totalprice") > 0).cast("string").alias("all_positive"),
        F.some(F.col("o_orderpriority") == "1-URGENT")
        .cast("string")
        .alias("any_urgent"),
        F.min("o_orderkey").cast("bigint").alias("exemplar_key"),
    )


@register(
    "variant_typed_extract",
    oracle="""
    SELECT event_type AS etype,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           round(sum(value), 2) AS sum_v,
           CAST(count(TRY_CAST(event_type AS BIGINT)) AS BIGINT) AS n_bad_cast,
           count(*) AS n
    FROM events
    GROUP BY 1
    """,
    doc="Spark 4 VARIANT semi-structured analytics: each event is packed "
    "into a nested JSON document, parsed to the binary VARIANT type "
    "(parse_json), and fields are extracted with TYPED paths — "
    "variant_get('$.k','bigint'), a nested '$.meta.v' double, and a "
    "deliberately mistyped try_variant_get('$.t','bigint') that must "
    "yield NULL (n_bad_cast = 0) instead of failing the query.  VARIANT "
    "keeps the parse tree in a shredded binary encoding so repeated "
    "path accesses don't re-parse the string — the schema-on-read "
    "answer for heterogeneous event payloads at 100 TB, superseding "
    "per-access get_json_object string parsing (json_extraction).  The "
    "oracle recomputes the aggregates from the base columns, verifying "
    "the variant round-trip is lossless and the type discipline of "
    "try_variant_get.",
)
def variant_typed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
            F.struct(F.col("value").alias("v")).alias("meta"),
        )
    )
    v = F.parse_json(doc)
    rows = ev.select(
        F.variant_get(v, "$.t", "string").alias("etype"),
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.variant_get(v, "$.meta.v", "double").alias("val"),
        F.try_variant_get(v, "$.t", "bigint").alias("bad"),
    )
    return rows.groupBy("etype").agg(
        F.sum("k").cast("bigint").alias("sum_k"),
        F.round(F.sum("val"), 2).alias("sum_v"),
        F.count("bad").cast("bigint").alias("n_bad_cast"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "scalar_sql_udf_inlined",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(max(CASE WHEN l_discount >= 0.05
                         THEN CAST(round(l_extendedprice * (1 - l_discount) * 100)
                              AS BIGINT) END) AS BIGINT) AS max_discounted_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="SQL-language UDF (Spark 4 CREATE FUNCTION ... RETURN expr): "
    "the discounted-revenue formula is declared ONCE as a named "
    "function and reused in two aggregate contexts.  Unlike "
    "Python/Scala UDFs, Catalyst INLINES the SQL function body into "
    "the plan before optimization — the executed plan contains plain "
    "arithmetic (no UDF call node, plan-asserted), so it stays inside "
    "whole-stage codegen, predicates through it stay pushable, and it "
    "costs nothing at 100 TB.  The shareable-business-logic answer "
    "that keeps the engine's no-row-Python discipline.  The oracle "
    "inlines the identical expression by hand.",
)
def scalar_sql_udf_inlined(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION discounted_cents(
            ep DOUBLE, disc DOUBLE) RETURNS BIGINT
        RETURN CAST(round(ep * (1 - disc) * 100) AS BIGINT)
        """
    )
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_udf")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(sum(discounted_cents(l_extendedprice, l_discount))
                    AS BIGINT) AS revenue_cents,
               max(CASE WHEN l_discount >= 0.05
                        THEN discounted_cents(l_extendedprice, l_discount)
                   END) AS max_discounted_cents
        FROM li_udf
        GROUP BY l_returnflag
        """
    )


@register(
    "agg_corr_exact_moments",
    oracle="""
    WITH m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(q) AS DOUBLE) AS sq, CAST(sum(p) AS DOUBLE) AS sp,
             CAST(sum(d) AS DOUBLE) AS sd,
             CAST(sum(q * q) AS DOUBLE) AS sqq,
             CAST(sum(p * p) AS DOUBLE) AS spp,
             CAST(sum(d * d) AS DOUBLE) AS sdd,
             CAST(sum(q * p) AS DOUBLE) AS sqp,
             CAST(sum(q * d) AS DOUBLE) AS sqd,
             CAST(sum(p * d) AS DOUBLE) AS spd
      FROM (
        SELECT CAST(round(l_quantity) AS BIGINT) AS q,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
               CAST(round(l_discount * 10000) AS BIGINT) AS d
        FROM lineitem
      )
    )
    SELECT pair, CAST(n AS BIGINT) AS n, round(r, 6) AS corr
    FROM (
      SELECT 'qty_price' AS pair, n,
             (n * sqp - sq * sp)
               / (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)) AS r
      FROM m
      UNION ALL
      SELECT 'qty_discount', n,
             (n * sqd - sq * sd)
               / (sqrt(n * sqq - sq * sq) * sqrt(n * sdd - sd * sd))
      FROM m
      UNION ALL
      SELECT 'price_discount', n,
             (n * spd - sp * sd)
               / (sqrt(n * spp - sp * sp) * sqrt(n * sdd - sd * sd))
      FROM m
    )
    """,
    doc="Pairwise Pearson correlation from EXACT integer moments: the "
    "built-in corr() accumulates doubles in partition order, so its "
    "low bits — and a 6-dp rounding — are not reproducible across "
    "engines or even runs; instead all 10 moments (n, sums, squares, "
    "cross products) are summed as exact integers over integer-unit "
    "columns (qty, price cents, discount basis points) in ONE scan / "
    "ONE global aggregate, then each correlation is a fixed double "
    "expression over those exact moments — bit-identical on both "
    "engines.  Spark sums in decimal(38,0) (sum of price-cents "
    "squares exceeds int64 at sf0.1: ~6.6e19), DuckDB in int128.  "
    "The 3x3 feature-correlation profile is the standard first look "
    "before training-feature selection; map-side partial aggregation "
    "makes it one reduce of 10 numbers at any scale.",
)
def agg_corr_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_quantity")).cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("p"),
        F.round(F.col("l_discount") * 10000).cast("bigint").alias("d"),
    )
    dec = "decimal(38,0)"
    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        *[
            F.sum(expr.cast(dec)).cast("double").alias(name)
            for name, expr in [
                ("sq", F.col("q")),
                ("sp", F.col("p")),
                ("sd", F.col("d")),
                ("sqq", F.col("q") * F.col("q")),
                ("spp", F.col("p") * F.col("p")),
                ("sdd", F.col("d") * F.col("d")),
                ("sqp", F.col("q") * F.col("p")),
                ("sqd", F.col("q") * F.col("d")),
                ("spd", F.col("p") * F.col("d")),
            ]
        ],
    )

    def r(sxy: str, x: str, y: str, sxx: str, syy: str) -> F.Column:
        n = F.col("n")
        return (n * F.col(sxy) - F.col(x) * F.col(y)) / (
            F.sqrt(n * F.col(sxx) - F.col(x) * F.col(x))
            * F.sqrt(n * F.col(syy) - F.col(y) * F.col(y))
        )

    return m.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("qty_price").alias("pair"),
                    F.col("n").cast("bigint").alias("n"),
                    F.round(r("sqp", "sq", "sp", "sqq", "spp"), 6).alias("corr"),
                ),
                F.struct(
                    F.lit("qty_discount").alias("pair"),
                    F.col("n").cast("bigint").alias("n"),
                    F.round(r("sqd", "sq", "sd", "sqq", "sdd"), 6).alias("corr"),
                ),
                F.struct(
                    F.lit("price_discount").alias("pair"),
                    F.col("n").cast("bigint").alias("n"),
                    F.round(r("spd", "sp", "sd", "spp", "sdd"), 6).alias("corr"),
                ),
            )
        ).alias("row")
    ).select("row.pair", "row.n", "row.corr")


@register(
    "agg_mutual_information",
    oracle="""
    WITH joint AS (
      SELECT event_type AS x, user_id % 10 AS y, count(*) AS nxy
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(sum(nxy) AS DOUBLE) AS n FROM joint
    ), marg AS (
      SELECT j.x, j.y, CAST(j.nxy AS DOUBLE) AS nxy,
             CAST(sum(j.nxy) OVER (PARTITION BY j.x) AS DOUBLE) AS nx,
             CAST(sum(j.nxy) OVER (PARTITION BY j.y) AS DOUBLE) AS ny
      FROM joint j
    )
    SELECT x AS event_type,
           CAST(count(*) AS BIGINT) AS n_cells,
           round(sum(CAST(round(
             (nxy / n) * ln(nxy * n / (nx * ny)) / ln(2.0) * 1000000000
           ) AS BIGINT)) / 1000000000.0, 6) AS mi_bits_contrib
    FROM marg, tot
    GROUP BY x
    """,
    doc="Mutual information I(event_type; user bucket) from EXACT "
    "joint counts, reported as per-event-type contributions: the "
    "feature-selection / leakage-detection primitive (a near-zero MI "
    "column carries no signal; a suspiciously high MI against the "
    "label is leakage).  Same determinism discipline as "
    "agg_corr_exact_moments: the only aggregation is integer counting "
    "(one shuffle on the tiny joint-cell grid), marginals come from "
    "window sums over the 50-cell contingency table (no second scan), "
    "and the p*log(p) arithmetic is a fixed double expression over "
    "exact integers — engine-identical.  At 100 TB the contingency "
    "table is |X|x|Y| cells regardless of row count.",
)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    joint = ev.groupBy(
        F.col("event_type").alias("x"), (F.col("user_id") % 10).alias("y")
    ).agg(F.count(F.lit(1)).alias("nxy"))
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    wall = Window.partitionBy()
    m = joint.select(
        "x",
        F.col("nxy").cast("double").alias("nxy"),
        F.sum("nxy").over(wx).cast("double").alias("nx"),
        F.sum("nxy").over(wy).cast("double").alias("ny"),
        F.sum("nxy").over(wall).cast("double").alias("n"),
    )
    term = (F.col("nxy") / F.col("n")) * (
        F.log(F.col("nxy") * F.col("n") / (F.col("nx") * F.col("ny")))
        / F.log(F.lit(2.0))
    )
    # each cell's term is a fixed double expression over exact integer
    # counts (deterministic); rounding it to integer nano-bits BEFORE
    # the sum makes the aggregation order-independent (repo convention:
    # never sum raw doubles into a hash-compared value)
    term_nano = F.round(term * 1_000_000_000).cast("bigint")
    return m.groupBy(F.col("x").alias("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.round(F.sum(term_nano) / 1_000_000_000.0, 6).alias("mi_bits_contrib"),
    )
