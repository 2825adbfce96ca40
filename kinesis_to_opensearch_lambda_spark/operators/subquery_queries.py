"""TPC-H subquery shapes (scalar, correlated, NOT IN / NOT EXISTS) adapted
to the synthetic star schema (no partsupp table in the testdata).

These exercise the decorrelation strategies a 100 TB engine needs:

- correlated aggregate subqueries -> groupBy + equi-join (Q2, Q17);
- scalar subqueries -> 1-row aggregate broadcast-cross-joined (Q11, Q22);
- NOT IN / NOT EXISTS -> left-anti join (Q16, Q22);
- LEFT OUTER with a join-side predicate, then re-aggregation (Q13).

Numeric convention: any float that feeds a *comparison* or an
order-sensitive sum is first converted to exact integer cents at row
level (deterministic), so the equality/threshold semantics and the
value hash are identical across Spark and DuckDB regardless of
partial-aggregation order.  See BASELINE.md's correctness gate.

Reference parity: the reference engine has no relational query surface
(it is an ETL lambda, lambda_function.py:140-148); these queries are the
engine-side analytics extension mandated by BASELINE.json's north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import register
from ..sources.batch import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _cents(col: F.Column) -> F.Column:
    """Row-level exact integer cents: deterministic before any shuffle."""
    return F.round(col * 100).cast("bigint")


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT) AS unit_cents
      FROM lineitem
    ), mins AS (
      SELECT l_partkey, min(unit_cents) AS min_cents FROM unit GROUP BY l_partkey
    )
    SELECT DISTINCT p_partkey, p_name, s_name,
           round(min_cents / 100.0, 2) AS min_unit_price
    FROM unit
    JOIN mins ON unit.l_partkey = mins.l_partkey AND unit_cents = min_cents
    JOIN part ON p_partkey = unit.l_partkey
    JOIN supplier ON s_suppkey = unit.l_suppkey
    WHERE p_size < 10
    """,
    doc="TPC-H Q2 shape: correlated MIN subquery decorrelated to a "
    "groupBy(min) + equi-join back on (key, min_value). Unit price in "
    "integer cents so min-equality is engine-exact. At scale: the mins "
    "aggregate is tiny (|parts|) and broadcast; no correlated re-scan.",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    supp = _t(spark, sf_dir, "supplier")
    unit = li.select(
        "l_partkey",
        "l_suppkey",
        _cents(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cents"),
    )
    mins = unit.groupBy("l_partkey").agg(F.min("unit_cents").alias("min_cents"))
    return (
        unit.join(
            F.broadcast(mins),
            (unit.l_partkey == mins.l_partkey) & (F.col("unit_cents") == F.col("min_cents")),
        )
        .drop(mins.l_partkey)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round(F.col("min_cents") / 100.0, 2).alias("min_unit_price"),
        )
        .distinct()
    )


@register(
    "tpch_q11_important_value",
    oracle="""
    WITH nation_value AS (
      SELECT s_nationkey,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS value_cents
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      GROUP BY s_nationkey
    )
    SELECT n_name, round(value_cents / 100.0, 2) AS value
    FROM nation_value
    JOIN nation ON n_nationkey = s_nationkey
    WHERE value_cents > (SELECT 0.03 * sum(value_cents) FROM nation_value)
    """,
    doc="TPC-H Q11 shape: HAVING against a global scalar subquery. The "
    "scalar is re-aggregated from the grouped result (no second base-table "
    "scan) and cross-joined as a 1-row broadcast. Integer-cent sums keep "
    "the threshold comparison exact.",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    nation_value = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("value_cents")
        )
    )
    total = nation_value.agg(
        (F.lit(0.03) * F.sum("value_cents")).alias("threshold")
    )
    return (
        nation_value.join(F.broadcast(total))
        .filter(F.col("value_cents") > F.col("threshold"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("n_name", F.round(F.col("value_cents") / 100.0, 2).alias("value"))
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders ON c_custkey = o_custkey
        AND o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: left outer join with an extra join-side predicate "
    "(not a WHERE filter -- empty customers must survive), count of "
    "non-null keys, then a second re-aggregation over the counts. Two "
    "shuffles; the second input is |customers| rows, already small.",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy(cust.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(rev_cents / 100.0, 2) AS total_revenue
    FROM revenue JOIN supplier ON s_suppkey = l_suppkey
    WHERE rev_cents = (SELECT max(rev_cents) FROM revenue)
    """,
    doc="TPC-H Q15 shape: view + scalar MAX subquery over the same view. "
    "The revenue aggregate is computed once and reused for both the max "
    "and the final join (Spark reuses the cached logical subtree; at scale "
    "the 1-row max broadcasts). Integer cents make revenue equality exact.",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("rev_cents")
        )
    )
    max_rev = revenue.agg(F.max("rev_cents").alias("max_cents"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("rev_cents") == F.col("max_cents"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_cents") / 100.0, 2).alias("total_revenue"),
        )
    )


@register(
    "tpch_q16_supplier_count",
    oracle="""
    SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type
    """,
    doc="TPC-H Q16 shape: NOT IN on a non-nullable key -> left-anti join "
    "against the (tiny, broadcast) excluded-supplier set, then "
    "count(DISTINCT). The distinct count shuffles on (brand, type) with "
    "partial distinct aggregation map-side.",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (~F.col("p_type").like("PROMO%"))
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17_small_quantity",
    oracle="""
    SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 700.0, 2)
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
    doc="TPC-H Q17 shape: correlated AVG subquery decorrelated to a "
    "per-part groupBy(avg) joined back on partkey. l_quantity is "
    "integer-valued so the avg (exact integer sum / count) is "
    "order-independent; the final revenue sum uses integer cents. At "
    "scale the per-part avg table is |parts| rows -> broadcast.",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    per_part_avg = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    avgs = per_part_avg.withColumnRenamed("l_partkey", "avg_partkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avgs), F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(_cents(F.col("l_extendedprice"))) / 700.0, 2
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q22_idle_customers",
    oracle="""
    WITH bal AS (
      SELECT c_custkey, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer
    )
    SELECT c_nationkey AS cntrycode, count(*) AS numcust,
           round(sum(bal_cents) / 100.0, 2) AS totacctbal
    FROM bal
    WHERE bal_cents > (SELECT avg(bal_cents) FROM bal WHERE bal_cents > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 shape: scalar AVG subquery threshold + NOT EXISTS -> "
    "left-anti join against recent orders (nation key substitutes for the "
    "reference schema's missing phone prefix). Balances in integer cents "
    "so the avg threshold comparison cannot flip on float summation order.",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    bal = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", _cents(F.col("c_acctbal")).alias("bal_cents")
    )
    avg_bal = bal.filter(F.col("bal_cents") > 0).agg(
        F.avg("bal_cents").alias("avg_cents")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        bal.join(F.broadcast(avg_bal))
        .filter(F.col("bal_cents") > F.col("avg_cents"))
        .join(recent, bal.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("bal_cents") / 100.0, 2).alias("totacctbal"),
        )
    )


@register(
    "tpch_q20_excess_supply",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(l_quantity) AS BIGINT) AS supp_qty
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), demand AS (
      SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS part_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey < 5
      AND s_suppkey IN (
        SELECT ps.l_suppkey
        FROM ps
        JOIN demand ON demand.l_partkey = ps.l_partkey
        JOIN part   ON p_partkey = ps.l_partkey
        WHERE p_name LIKE 'small%'
          AND 2 * ps.supp_qty > part_qty
      )
    """,
    doc="TPC-H Q20 shape (potential part promotion): nested IN subqueries "
    "over partsupp/part/lineitem become two aggregates at different "
    "grains — per-(part,supplier) shipped qty standing in for "
    "partsupp.availqty (no partsupp in the testdata) and per-part 1996 "
    "demand — joined on partkey, then a left-semi join into supplier. "
    "The availqty > 0.5*demand threshold is 2*supp_qty > part_qty in "
    "exact integer units (l_quantity is integral) so it cannot flip on "
    "float order. At scale: both aggregates shuffle on l_partkey (one "
    "exchange reused), the qualifying-supplier set is tiny -> the semi "
    "join broadcasts; supplier is never shuffled.",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    supp = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").cast("bigint").alias("supp_qty")
    )
    demand = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_partkey").alias("d_partkey"))
        .agg(F.sum("l_quantity").cast("bigint").alias("part_qty"))
    )
    excess = (
        ps.join(demand, ps.l_partkey == demand.d_partkey)
        .join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .filter(2 * F.col("supp_qty") > F.col("part_qty"))
        .select("l_suppkey")
    )
    return supp.join(
        F.broadcast(excess), supp.s_suppkey == excess.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@register(
    "tpch_q21_waiting_supplier",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape: the sole-late-supplier query — correlated EXISTS "
    "(another supplier touched the order) AND NOT EXISTS (no other "
    "supplier was also late), with ship-90-days-after-order standing in "
    "for the reference schema's missing receipt/commit dates. Decorrelates "
    "to a left-semi then left-anti self-join, both co-partitioned on "
    "l_orderkey — Spark plans all three as one shuffle key.",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = late.select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    kept = l1.join(
        l2, (l1.l_orderkey == l2.k2) & (l1.l_suppkey != l2.s2), "left_semi"
    ).join(l3, (l1.l_orderkey == l3.k3) & (l1.l_suppkey != l3.s3), "left_anti")
    return (
        kept.join(F.broadcast(supp), kept.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "lateral_topk_per_nation",
    oracle="""
    SELECT n_name, t.c_name, t.c_acctbal_cents
    FROM nation, LATERAL (
      SELECT c_name,
             CAST(round(c_acctbal * 100) AS BIGINT) AS c_acctbal_cents
      FROM customer
      WHERE c_nationkey = n_nationkey
      ORDER BY round(c_acctbal * 100) DESC, c_name
      LIMIT 3
    ) t
    """,
    doc="Correlated LATERAL subquery (SQL:1999 lateral derived table, "
    "Spark 4 SQL support): top-3 customers by balance per nation, "
    "written as the per-row correlated form users port from "
    "Postgres/DuckDB.  Catalyst decorrelates it into the same "
    "partitioned window top-k a hand-written row_number() plan "
    "produces — asserted by result parity with the oracle running the "
    "IDENTICAL lateral text — so the ergonomic form costs nothing at "
    "scale.  Balances compared as exact integer cents.",
)
def lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql("""
      SELECT n_name, t.c_name, t.c_acctbal_cents
      FROM nation_lat, LATERAL (
        SELECT c_name,
               CAST(round(c_acctbal * 100) AS BIGINT) AS c_acctbal_cents
        FROM customer_lat
        WHERE c_nationkey = n_nationkey
        ORDER BY round(c_acctbal * 100) DESC, c_name
        LIMIT 3
      ) t
    """)


@register(
    "sql_recursive_cte_reachability",
    oracle="""
    WITH RECURSIVE
    edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
        AND a.l_partkey < 2000 AND b.l_partkey < 2000
    ),
    reach(node, depth) AS (
      SELECT CAST(x AS BIGINT) AS node, 0 AS depth
      FROM (VALUES (1), (2), (3)) s(x)
      UNION ALL
      SELECT e.dst, r.depth + 1
      FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.depth < 2
    )
    SELECT node,
           CAST(min(depth) AS BIGINT) AS min_depth,
           CAST(count(*) AS BIGINT) AS n_paths
    FROM reach
    GROUP BY node
    """,
    doc="Recursive CTE (Spark 4's WITH RECURSIVE, SPARK-24497): "
    "bounded-depth transitive closure over the co-order part graph "
    "from 3 seed parts — per reached node, its BFS depth (min over "
    "path multiplicity) and path count.  UNION ALL + an explicit "
    "depth bound gives identical multiplicity semantics on both "
    "engines (DuckDB's recursive UNION would dedup rows per "
    "iteration; UNION ALL sidesteps the divergence).  This is the "
    "SQL-native twin of graph_bfs_reachability's DataFrame loop: "
    "Catalyst's UnionLoop manages the iteration, so the frontier "
    "expansion is planned per step like the hand-rolled loop — each "
    "round one equi-join shuffle — but without driver-side loop code "
    "or manual lineage checkpointing.",
)
def sql_recursive_cte_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_rec")
    return spark.sql(
        """
        WITH RECURSIVE
        edges AS (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM li_rec a JOIN li_rec b ON a.l_orderkey = b.l_orderkey
          WHERE a.l_partkey <> b.l_partkey
            AND a.l_partkey < 2000 AND b.l_partkey < 2000
        ),
        reach(node, depth) AS (
          SELECT CAST(x AS BIGINT) AS node, 0 AS depth
          FROM (VALUES (1), (2), (3)) s(x)
          UNION ALL
          SELECT e.dst, r.depth + 1
          FROM reach r JOIN edges e ON e.src = r.node
          WHERE r.depth < 2
        )
        SELECT node,
               CAST(min(depth) AS BIGINT) AS min_depth,
               CAST(count(*) AS BIGINT) AS n_paths
        FROM reach
        GROUP BY node
        """
    )
