"""Warehouse-operations operators: data-quality constraint auditing,
join-key skew diagnostics, and SCD2 history construction.

These are the operational layer a 100 TB lakehouse needs around the
analytics surface (reference parity: none — the reference pipeline,
lambda_function.py:140-148, trusts its input and keeps no history):

- ``dq_constraints`` — Deequ-style constraint suite: every check is
  either a conditional aggregation riding a single table scan or a
  keys-only shuffled-hash anti-join (referenced-key sets are
  fact-sized at 100 TB — never broadcast them), so the full audit
  costs one pass per fact table regardless of how many checks share
  it.
- ``diag_key_skew`` — heavy-hitter profile of a join key.  At scale
  you run this BEFORE the big join: the output decides between plain
  shuffle join, AQE skew handling, and explicit salting
  (relational_queries.join_salted_skew is the remediation twin).
- ``scd2_customer_history`` — slowly-changing-dimension (type 2)
  intervals derived with one partitioned window pass; the shuffle key
  is the dimension key, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import register
from ..sources.batch import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # r13 fan_out audit: every consumer in this module feeds the scan
    # into an aggregate or a join whose own exchange redistributes, and
    # the pre-exchange per-row work is cheap column arithmetic — the
    # round-robin widening shuffle was pure waste.  Interleaved
    # same-session A/B at sf0.1 (5 iters, noop sink): diag_key_skew
    # 0.96->0.26s, join_scd2_point_in_time 1.24->0.77s,
    # incremental_agg_merge 0.92->0.40s, quality_ks_two_sample
    # 0.65->0.34s, scd2_customer_history 1.02->0.60s, snapshot_diff
    # 1.23->0.85s, diag_observe_metrics 0.83->0.66s — all winners
    # (sweeps/FANOUT_AB_r13.json).
    return load_table(spark, sf_dir, name)


@register(
    "dq_constraints",
    headline=True,
    oracle="""
    SELECT tbl, chk, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_violations AS BIGINT) AS n_violations
    FROM (
      SELECT 'orders' AS tbl, 'null_custkey' AS chk,
             count(*) AS n_rows,
             coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 END), 0) AS n_violations
      FROM orders
      UNION ALL
      SELECT 'orders', 'fk_customer_orphan', (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
      UNION ALL
      SELECT 'orders', 'nonpositive_totalprice', count(*),
             coalesce(sum(CASE WHEN o_totalprice <= 0 THEN 1 END), 0)
      FROM orders
      UNION ALL
      SELECT 'lineitem', 'nonpositive_quantity', count(*),
             coalesce(sum(CASE WHEN l_quantity <= 0 THEN 1 END), 0)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem', 'discount_out_of_range', count(*),
             coalesce(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END), 0)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem', 'fk_orders_orphan', (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
      UNION ALL
      SELECT 'customer', 'duplicate_custkey', count(*),
             count(*) - count(DISTINCT c_custkey)
      FROM customer
      UNION ALL
      SELECT 'documents', 'empty_text', count(*),
             coalesce(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 END), 0)
      FROM documents
    )
    """,
    doc="Deequ-style data-quality constraint suite: completeness "
    "(null keys), referential integrity (FK orphans via shuffled-hash "
    "anti-join on the distinct referenced keys — orders/customer key "
    "sets are fact-sized at 100 TB, so no broadcast; each task's hash "
    "table holds keys/n_partitions), range checks, uniqueness, and "
    "emptiness, each expressed "
    "as a conditional aggregation so every check on the same table "
    "rides ONE scan.  Output is the audit report: (table, check, "
    "n_rows, n_violations).  At 100 TB this is the pre-ingest gate a "
    "training-data pipeline runs before promoting a partition.",
)
def dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plain load_table, NO fan_out (r13 optimization): every branch of
    # the audit is either a conditional aggregation (partial agg rides
    # the scan; a round-robin pre-shuffle of the full table just to
    # count it is a pure extra exchange) or a shuffled-hash anti-join
    # (whose own exchange already redistributes both sides at full
    # width).  Dropping fan_out removed 8 Exchange nodes from the plan
    # and none of the branches lost parallelism where it matters — the
    # joins still shuffle to spark.sql.shuffle.partitions.
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    documents = load_table(spark, sf_dir, "documents")

    def one_pass(df: DataFrame, tbl: str, checks: dict[str, F.Column]) -> DataFrame:
        """All conditional checks on one table in a single agg pass,
        unpivoted to (tbl, chk, n_rows, n_violations) rows via an
        explode of check structs — the aggregation subtree executes
        ONCE per table (a per-check union would re-run the scan)."""
        agg = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.coalesce(F.sum(F.when(cond, 1)), F.lit(0)).alias(name)
                for name, cond in checks.items()
            ],
        )
        return agg.select(
            F.lit(tbl).alias("tbl"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("chk"),
                            F.col(name).cast("long").alias("n_violations"),
                        )
                        for name in checks
                    ]
                )
            ).alias("c"),
        ).select("tbl", "c.chk", "n_rows", "c.n_violations")

    def orphans(fact: DataFrame, key: str, dim: DataFrame, dim_key: str,
                tbl: str, chk: str, broadcast_dim: bool = False) -> DataFrame:
        """Referential-integrity check: fact keys missing from the
        referenced table, via left-anti join.  Default is a SHUFFLED
        HASH anti-join: the build side is the referenced table's
        distinct keys (8 bytes/row), hash-partitioned so each task's
        hash table holds keys/n_partitions — this is the shape that
        holds when the referenced side is itself fact-sized (orders,
        customer at 100 TB are billions of keys; their distinct-key
        set does NOT fit in a broadcast).  A Bloom filter can't
        replace the anti-join here — 'maybe present' cannot prove an
        orphan.  Pass ``broadcast_dim=True`` only for genuinely
        dimension-sized sides (region/nation scale)."""
        dim_keys = dim.select(dim_key).distinct()
        dim_keys = (
            F.broadcast(dim_keys) if broadcast_dim else dim_keys.hint("shuffle_hash")
        )
        n_all = fact.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        n_orphan = (
            fact.join(
                dim_keys,
                F.col(key) == F.col(dim_key),
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        )
        return n_all.crossJoin(n_orphan).select(
            F.lit(tbl).alias("tbl"),
            F.lit(chk).alias("chk"),
            "n_rows",
            "n_violations",
        )

    parts = [
        one_pass(
            orders,
            "orders",
            {
                "null_custkey": F.col("o_custkey").isNull(),
                "nonpositive_totalprice": F.col("o_totalprice") <= 0,
            },
        ),
        orphans(orders, "o_custkey", customer, "c_custkey",
                "orders", "fk_customer_orphan"),
        one_pass(
            lineitem,
            "lineitem",
            {
                "nonpositive_quantity": F.col("l_quantity") <= 0,
                "discount_out_of_range": (F.col("l_discount") < 0)
                | (F.col("l_discount") > 1),
            },
        ),
        orphans(lineitem, "l_orderkey", orders, "o_orderkey",
                "lineitem", "fk_orders_orphan"),
        customer.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.count(F.lit(1)) - F.count_distinct(F.col("c_custkey")))
            .cast("long")
            .alias("n_violations"),
        ).select(
            F.lit("customer").alias("tbl"),
            F.lit("duplicate_custkey").alias("chk"),
            "n_rows",
            "n_violations",
        ),
        one_pass(
            documents,
            "documents",
            {"empty_text": F.col("text").isNull() | (F.length("text") == 0)},
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@register(
    "diag_key_skew",
    oracle="""
    WITH counts AS (
      SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey
    ), tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n_total,
             CAST(count(*) AS BIGINT) AS n_keys
      FROM counts
    )
    SELECT rnk, l_suppkey, cnt,
           CAST((cnt * 1000000) // n_total AS BIGINT) AS share_ppm,
           round(cnt::DOUBLE * n_keys::DOUBLE / n_total::DOUBLE, 6) AS skew_ratio
    FROM (
      SELECT l_suppkey, CAST(cnt AS BIGINT) AS cnt,
             row_number() OVER (ORDER BY cnt DESC, l_suppkey) AS rnk
      FROM counts
    ) CROSS JOIN tot
    WHERE rnk <= 10
    """,
    doc="Join-key heavy-hitter profile: per-key counts (map-side partial "
    "agg), 1-row corpus totals broadcast, top-10 keys with parts-per-"
    "million share and ratio-to-mean.  skew_ratio >> 1 on the head key "
    "is the signal to salt (join_salted_skew) or rely on AQE skew "
    "splitting before running the real join; the profile itself is one "
    "aggregation plus a driver-free top-k.",
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    tot = counts.agg(
        F.sum("cnt").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("l_suppkey"))
    top = (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
    )
    return top.crossJoin(F.broadcast(tot)).select(
        "rnk",
        "l_suppkey",
        F.col("cnt").cast("long").alias("cnt"),
        F.expr("(cnt * 1000000) div n_total").cast("long").alias("share_ppm"),
        F.round(
            F.col("cnt").cast("double")
            * F.col("n_keys").cast("double")
            / F.col("n_total").cast("double"),
            6,
        ).alias("skew_ratio"),
    )


@register(
    "scd2_customer_history",
    oracle="""
    SELECT o_custkey AS custkey,
           row_number() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS version,
           o_orderkey,
           round(o_totalprice, 2) AS totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
           strftime(
             lead(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ), '%Y-%m-%d') AS valid_to,
           CASE WHEN lead(o_orderkey) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ) IS NULL THEN 1 ELSE 0 END AS is_current
    FROM orders
    """,
    doc="SCD type-2 history build: each order event becomes a versioned "
    "validity interval per customer — version via row_number, valid_to "
    "via lead (NULL = open interval), is_current flag.  One window pass "
    "partitioned by the dimension key: the shuffle moves each "
    "customer's rows once and there is no global sort, so the build "
    "scales linearly with customers.  The standard warehouse pattern "
    "for dimension snapshots the reference never kept.",
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.row_number().over(w).alias("version"),
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.date_format(F.lead("o_orderdate").over(w), "yyyy-MM-dd").alias("valid_to"),
        F.when(F.lead("o_orderkey").over(w).isNull(), 1).otherwise(0).alias("is_current"),
    )


# ---- snapshot reconciliation + incremental MV maintenance ------------
#
# Two warehouse patterns the reference never had but every production
# table needs: diffing two snapshots of the same table (audit after a
# backfill / replication check) and merging a new partition's partial
# aggregates into a stored rollup without rescanning history.

_SNAP_KEY = "o_orderkey::VARCHAR"
_SQL_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


def _sql_pct(salt: str) -> str:
    from ..functions import SQL_MD5_LONG

    return f"({SQL_MD5_LONG.format(x=_SNAP_KEY + f' || {salt!r}')} % 100)"


def _pct(salt: str) -> F.Column:
    from ..functions import md5_long

    return md5_long(F.concat(F.col("o_orderkey").cast("string"), F.lit(salt))) % 100


@register(
    "snapshot_diff",
    oracle=f"""
    WITH old AS (
      SELECT o_orderkey, {_SQL_CENTS} AS cents FROM orders
      WHERE {_sql_pct(":snapold")} < 95
    ), new AS (
      SELECT o_orderkey,
             {_SQL_CENTS}
               + CASE WHEN {_sql_pct(":snapchg")} < 10 THEN 500 ELSE 0 END AS cents
      FROM orders
      WHERE {_sql_pct(":snapnew")} < 95
    )
    SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.cents <> n.cents THEN 'changed'
                ELSE 'unchanged' END AS change_class,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(coalesce(o.o_orderkey, n.o_orderkey)) AS BIGINT) AS key_checksum
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    GROUP BY change_class
    """,
    doc="Snapshot reconciliation: FULL OUTER join of two table versions "
    "on the primary key, every row classified added / removed / "
    "changed / unchanged, rolled up to per-class counts plus a key "
    "checksum — the audit you run after a backfill, a replication "
    "cutover, or a CDC resync.  The two versions are derived "
    "deterministically from orders via salted md5 keep/mutate rules "
    "(engine-portable, so the oracle builds bit-identical snapshots). "
    "One shuffle each side on the join key, then a 4-group rollup; at "
    "100 TB both sides hash-partition by key and the diff streams — "
    "no driver state, no collect.  Spark-side the FULL OUTER is a "
    "SortMergeJoin on fixed-width keys; AQE handles the residual "
    "skew.",
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    old = orders.filter(_pct(":snapold") < 95).select(
        F.col("o_orderkey").alias("ok"), cents.alias("old_cents")
    )
    new = orders.filter(_pct(":snapnew") < 95).select(
        F.col("o_orderkey").alias("nk"),
        (cents + F.when(_pct(":snapchg") < 10, 500).otherwise(0)).alias("new_cents"),
    )
    j = old.join(new, old.ok == new.nk, "full_outer")
    cls = (
        F.when(F.col("ok").isNull(), "added")
        .when(F.col("nk").isNull(), "removed")
        .when(F.col("old_cents") != F.col("new_cents"), "changed")
        .otherwise("unchanged")
    )
    return j.groupBy(cls.alias("change_class")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.coalesce(F.col("ok"), F.col("nk"))).cast("bigint").alias("key_checksum"),
    )


_MV_CUTOFF = "1999-01-01"


@register(
    "incremental_agg_merge",
    oracle=f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum({_SQL_CENTS}) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY order_month, o_orderpriority
    """,
    doc="Incremental materialized-view maintenance: the stored rollup "
    f"(orders before {_MV_CUTOFF}, pre-aggregated to partial states) "
    "is merged with the new partition's partials by RE-AGGREGATING THE "
    "PARTIALS — sum of counts, sum of sums — never rescanning history. "
    "The oracle computes the same rollup directly from all raw rows, "
    "so parity PROVES the partial-merge identity the pattern depends "
    "on (count and integer-cents sum are commutative monoids; avg/"
    "percentiles would need their decomposed states).  At 100 TB this "
    "is the nightly-refresh pattern: the history scan is O(groups), "
    "only the delta partition is read at full width.  Integer cents "
    "keep the merged sum bit-exact regardless of partial order.",
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("order_month")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(month, "o_orderpriority").agg(
            F.count(F.lit(1)).alias("pn"), F.sum(cents).alias("ps")
        )

    base = partials(orders.filter(F.col("o_orderdate") < _MV_CUTOFF))
    delta = partials(orders.filter(F.col("o_orderdate") >= _MV_CUTOFF))
    return (
        base.unionAll(delta)
        .groupBy("order_month", "o_orderpriority")
        .agg(
            F.sum("pn").cast("bigint").alias("n_orders"),
            F.sum("ps").cast("bigint").alias("total_cents"),
        )
    )


@register(
    "diag_column_profile",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_status,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custkey,
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_price,
           CAST(min(round(o_totalprice * 100)) AS BIGINT) AS min_cents,
           CAST(max(round(o_totalprice * 100)) AS BIGINT) AS max_cents,
           strftime(min(o_orderdate), '%Y-%m-%d') AS min_date,
           strftime(max(o_orderdate), '%Y-%m-%d') AS max_date
    FROM orders
    """,
    doc="One-scan column profile (the data-catalog summary every "
    "warehouse ingests before query planning): several exact "
    "count(DISTINCT) columns, an empty/null audit, and min/max bounds "
    "computed together.  Catalyst compiles multi-distinct into a "
    "single Expand + two-phase aggregate — ONE pass over the table "
    "instead of one job per column (the naive profiler).  At 100 TB "
    "high-cardinality columns swap to approx_count_distinct partials "
    "per column while low-cardinality dictionary columns stay exact; "
    "the single-scan Expand shape is identical.",
)
def diag_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("o_orderstatus").cast("bigint").alias("n_status"),
        F.countDistinct("o_orderpriority").cast("bigint").alias("n_priority"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_custkey"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_price"),
        F.min(F.round(F.col("o_totalprice") * 100, 0))
        .cast("bigint")
        .alias("min_cents"),
        F.max(F.round(F.col("o_totalprice") * 100, 0))
        .cast("bigint")
        .alias("max_cents"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("min_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("max_date"),
    )


@register(
    "quality_psi_drift",
    oracle="""
    WITH snap AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS snap,
             least(CAST(round(value * 100) AS BIGINT) // 2000, 9) AS bin
      FROM events
    ), counts AS (
      SELECT bin,
             CAST(sum(CASE WHEN snap = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN snap = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM snap GROUP BY bin
    ), tot AS (
      SELECT bin, n_a, n_b,
             sum(n_a) OVER () AS ta, sum(n_b) OVER () AS tb
      FROM counts
    )
    SELECT bin, n_a, n_b,
           round(((n_a + 1)::DOUBLE / (ta + 10) - (n_b + 1)::DOUBLE / (tb + 10))
                 * ln(((n_a + 1)::DOUBLE / (ta + 10))
                      / ((n_b + 1)::DOUBLE / (tb + 10))), 6) AS psi_term
    FROM tot
    """,
    doc="Population-stability-index drift detection (the ML-ops check "
    "run before every model refresh and training-data cut): the value "
    "distribution is binned into 10 fixed-width buckets, two "
    "deterministic snapshots (event_id parity stands in for "
    "week-over-week) are compared per bin, and each bin reports its "
    "Laplace-smoothed PSI term (p-q)*ln(p/q) — sum > 0.2 is the "
    "conventional 'significant drift' alarm.  Fixed bin edges (never "
    "quantile edges) are what make PSI mergeable and comparable across "
    "runs; counts are exact integers, the only floats are the final "
    "smoothed ratios, and both engines evaluate ln on identical "
    "rationals so round(6) is stable (same discipline as the TF-IDF "
    "ln).  One scan, one tiny aggregate; snapshots at 100 TB come from "
    "partition pruning, not a second pass.",
)
def quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    snap = events.select(
        F.when(F.col("event_id") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("snap"),
        F.least(
            F.expr("CAST(round(value * 100) AS BIGINT) DIV 2000"), F.lit(9)
        ).alias("bin"),
    )
    counts = snap.groupBy("bin").agg(
        F.sum(F.when(F.col("snap") == "a", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("snap") == "b", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    # totals via a window over the 10-row bin table: ONE lineage, so
    # the events scan happens once (a separate agg + crossJoin branch
    # would re-scan the table for the totals)
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tot = counts.select(
        "bin",
        "n_a",
        "n_b",
        F.sum("n_a").over(w).alias("ta"),
        F.sum("n_b").over(w).alias("tb"),
    )
    p = (F.col("n_a") + 1).cast("double") / (F.col("ta") + 10)
    q = (F.col("n_b") + 1).cast("double") / (F.col("tb") + 10)
    return tot.select(
        "bin",
        "n_a",
        "n_b",
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    )


@register(
    "join_scd2_point_in_time",
    headline=True,
    oracle="""
    WITH h0 AS (
      SELECT o_custkey AS user_id,
             o_orderdate + INTERVAL 9500 DAY AS vf,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS version,
             round(o_totalprice, 2) AS totalprice,
             lead(o_orderdate + INTERVAL 9500 DAY) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS vt
      FROM orders
    ), h AS (
      -- zero-width same-day superseded versions can never satisfy
      -- half-open containment; dropping them makes vf unique per user
      -- and the containment join a backward as-of join (gapless
      -- intervals: vt = next vf), which DuckDB executes natively --
      -- the generic mixed-condition LEFT JOIN is quadratic there and
      -- took >400s at sf1 where this form takes seconds
      SELECT * FROM h0 WHERE vt IS NULL OR vt <> vf
    )
    SELECT e.event_id,
           CAST(h.version AS BIGINT) AS version,
           h.totalprice,
           strftime(h.vf, '%Y-%m-%d') AS valid_from
    FROM events e
    ASOF LEFT JOIN h
      ON h.user_id = e.user_id AND h.vf <= e.ts
    """,
    doc="Point-in-time lookup against an SCD2 dimension (the "
    "scd2_customer_history build, order dates shifted +9500 days so "
    "validity intervals genuinely overlap the 2024 events): each event "
    "resolves to the dimension version whose [valid_from, valid_to) "
    "interval contains its timestamp.  The scale insight: because SCD2 "
    "intervals are NON-OVERLAPPING per key, the interval-containment "
    "join IS an as-of join on valid_from — so this reuses the union + "
    "running-last single-shuffle plan (operators.relational.asof_join) "
    "instead of a non-equi range join that degenerates to O(n*m) per "
    "key.  Same-day superseded versions (zero-width intervals, which "
    "the oracle's half-open containment can never match) are dropped "
    "before the as-of so both engines resolve to the LAST version of "
    "the day.  The standard feature-store / backtest primitive: "
    "training features must join dimension state as-of the event time, "
    "never current state.",
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .relational import asof_join

    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead(F.date_add("o_orderdate", 9500)).over(w)
    hist = (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("user_id"),
            F.date_add("o_orderdate", 9500).alias("vf"),
            F.row_number().over(w).cast("bigint").alias("version"),
            F.round("o_totalprice", 2).alias("totalprice"),
            # last version per (key, day) rides the SAME window pass
            # (lead over the identical partitioning — no second
            # exchange): zero-width same-day intervals are superseded
            # and unmatchable under half-open containment
            (nxt.isNull() | (nxt != F.date_add("o_orderdate", 9500))).alias(
                "is_last_of_day"
            ),
        )
        .filter("is_last_of_day")
        .select(
            "user_id",
            F.col("vf").cast("timestamp").alias("vf_ts"),
            "version",
            "totalprice",
            F.date_format("vf", "yyyy-MM-dd").alias("valid_from"),
        )
    )
    joined = asof_join(
        events,
        hist,
        on="user_id",
        left_time="ts",
        right_time="vf_ts",
        value_cols=["version", "totalprice", "valid_from"],
    )
    return joined.select("event_id", "version", "totalprice", "valid_from")


@register(
    "diag_observe_metrics",
    oracle="""
    WITH tot AS (
      SELECT count(*) AS obs_rows,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS obs_cents
      FROM orders
    )
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(tot.obs_rows AS BIGINT) AS obs_rows,
           tot.obs_cents AS obs_cents
    FROM orders, tot
    GROUP BY o_orderstatus, tot.obs_rows, tot.obs_cents
    """,
    doc="Batch df.observe() metrics (the batch twin of "
    "streaming/observe.py's per-micro-batch listener, and the same "
    "mechanism dedup.connected_components uses for convergence "
    "counts): global row-count and checksum metrics are aggregated "
    "EXECUTOR-SIDE inside the same job as the per-group aggregate — "
    "the audit numbers a 100 TB pipeline wants on every write without "
    "paying a second scan for them.  The observed values are attached "
    "to each output group and must equal the oracle's independently "
    "computed totals, proving the piggybacked metrics see every row "
    "exactly once.  The final collect is a <=3-row aggregate (the "
    "established recompute-safe pattern) — Observation.get requires "
    "an action on the observed frame.",
)
def diag_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    obs = Observation()
    orders = _t(spark, sf_dir, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("obs_rows"),
        F.sum(cents).alias("obs_cents"),
    )
    groups = (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("sum_cents"),
        )
        .collect()
    )
    m = obs.get
    rows = [
        (r["o_orderstatus"], r["n"], r["sum_cents"], m["obs_rows"], m["obs_cents"])
        for r in groups
    ]
    return spark.createDataFrame(
        rows,
        "o_orderstatus string, n bigint, sum_cents bigint, "
        "obs_rows bigint, obs_cents bigint",
    )


@register(
    "quality_ks_two_sample",
    oracle="""
    WITH s AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS b
      FROM events WHERE event_type IN ('click', 'error')
    ), g AS (
      SELECT v, sum(a) AS na_v, sum(b) AS nb_v FROM s GROUP BY v
    ), c AS (
      SELECT v,
             sum(na_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
             sum(nb_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb
      FROM g
    ), t AS (SELECT sum(a) AS na, sum(b) AS nb FROM s)
    SELECT CAST(t.na AS BIGINT) AS n_a,
           CAST(t.nb AS BIGINT) AS n_b,
           CAST(max((abs(c.ca * t.nb - c.cb * t.na) * 1000000)
                    // (t.na * t.nb)) AS BIGINT) AS d_ppm
    FROM c, t
    GROUP BY t.na, t.nb
    """,
    doc="Exact two-sample Kolmogorov-Smirnov statistic between the "
    "'click' and 'error' value distributions — the "
    "distribution-equality gate behind drift monitors "
    "(quality_psi_drift is the binned sibling; KS is bin-free).  "
    "D = max_v |ECDF_a(v) - ECDF_b(v)| evaluated at distinct values "
    "only (ties collapse in a pre-aggregation, so the sup is taken "
    "after each tied block — the mathematically correct ECDF), in "
    "ALL-INTEGER arithmetic: |ca*nb - cb*na|*1e6 // (na*nb) "
    "parts-per-million, no FP anywhere.  Plan: one groupBy to the "
    "distinct-cents dictionary (<=10001 rows, value range is "
    "bounded), then one unpartitioned running sum over that bounded "
    "dictionary — the same audited single-partition-is-bounded shape "
    "as the Zipf fit.",
)
def quality_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error")
    )
    s = ev.select(
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("b"),
    )
    g = s.groupBy("v").agg(
        F.sum("a").alias("na_v"), F.sum("b").alias("nb_v")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = g.select(
        F.sum("na_v").over(w).alias("ca"),
        F.sum("nb_v").over(w).alias("cb"),
    )
    t = s.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    joined = c.crossJoin(F.broadcast(t))
    d = F.expr("(abs(ca * nb - cb * na) * 1000000) div (na * nb)")
    return joined.groupBy(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
    ).agg(F.max(d).cast("bigint").alias("d_ppm"))
