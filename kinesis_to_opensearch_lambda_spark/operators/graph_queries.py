"""Oracle-checked graph queries: random-walk importance (PageRank) over
the bipartite user-item interaction graph derived from the events table.

The oracle unrolls the same fixed number of integer-exact iterations as
CTE stages, so Spark and DuckDB agree bit-for-bit (see operators.graph
for the micro-unit arithmetic argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import register
from ..sources.batch import fan_out, load_table
from . import graph as G

_PR_ITERS = 5


def _pagerank_oracle(iters: int) -> str:
    """Unroll the integer PageRank fixed-point as sequential CTEs."""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(
            f"""r{i} AS (
      SELECT e.dst AS node,
             CAST({G.TELEPORT_I} + ({G.DAMPING_PCT} * sum(r.rank_i // e.deg)) // 100
                  AS BIGINT) AS rank_i
      FROM ew e JOIN r{i - 1} r ON e.src = r.node
      GROUP BY e.dst
    )"""
        )
    joined = ",\n    ".join(rounds)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT 'u:' || user_id::VARCHAR AS u,
             'i:' || json_extract_string(props, '$.k') AS i
      FROM events
      WHERE json_extract_string(props, '$.k') IS NOT NULL
    ), edges AS (
      SELECT u AS src, i AS dst FROM pairs
      UNION ALL
      SELECT i AS src, u AS dst FROM pairs
    ), deg AS (
      SELECT src, count(*) AS deg FROM edges GROUP BY src
    ), ew AS (
      SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)
    ), r0 AS (
      SELECT src AS node, {G.RANK_UNIT}::BIGINT AS rank_i FROM deg
    ),
    {joined}
    SELECT r.node, d.deg AS degree, r.rank_i
    FROM r{iters} r JOIN deg d ON d.src = r.node
    """


@register(
    "graph_pagerank_items",
    oracle=_pagerank_oracle(_PR_ITERS),
    doc="PageRank-style random-walk importance over the bipartite "
    "user-item graph from events (user -> props.k item, both edge "
    "directions so the walk is on the undirected graph and no node "
    "dangles). Integer micro-unit ranks with DIV-based damping make "
    f"all {_PR_ITERS} fixed-point rounds engine-exact and summation-"
    "order independent; per round the plan is one join + one groupBy "
    "shuffle with lineage truncated by localCheckpoint — the same "
    "iterative-operator discipline as connected_components "
    "(operators.graph.pagerank). At 100 TB the edge list shuffles on "
    "fixed-width node keys and rounds are O(E) each, O(iters) total.",
)
def graph_pagerank_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf_dir, "events"))
    item = F.get_json_object("props", "$.k")
    pairs = (
        ev.filter(item.isNotNull())
        .select(
            F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
            F.concat(F.lit("i:"), item).alias("i"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("u").alias("src"), F.col("i").alias("dst")).unionAll(
        pairs.select(F.col("i").alias("src"), F.col("u").alias("dst"))
    )
    return G.pagerank(edges, iters=_PR_ITERS)


_LPA_ITERS = 3


def _lpa_oracle(iters: int) -> str:
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(
            f"""l{i} AS (
      SELECT node, lbl FROM (
        SELECT e.dst AS node, l.lbl AS lbl,
               row_number() OVER (
                 PARTITION BY e.dst ORDER BY count(*) DESC, l.lbl
               ) AS rn
        FROM edges e JOIN l{i - 1} l ON e.src = l.node
        GROUP BY e.dst, l.lbl
      ) WHERE rn = 1
    )"""
        )
    joined = ",\n    ".join(rounds)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT 'u:' || user_id::VARCHAR AS u,
             'i:' || json_extract_string(props, '$.k') AS i
      FROM events
      WHERE json_extract_string(props, '$.k') IS NOT NULL
    ), edges AS (
      SELECT u AS src, i AS dst FROM pairs
      UNION ALL
      SELECT i AS src, u AS dst FROM pairs
    ), l0 AS (
      SELECT DISTINCT src AS node, src AS lbl FROM edges
    ),
    {joined}
    SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members,
           min(node) AS exemplar
    FROM l{iters}
    GROUP BY lbl
    """


@register(
    "graph_lpa_communities",
    oracle=_lpa_oracle(_LPA_ITERS),
    doc="Community detection by synchronous label propagation (Raghavan "
    "et al. 2007) on the bipartite user-item graph: each round every "
    "node adopts its neighbors' most frequent label, ties to the "
    "lexicographically smallest — the determinism rule that lets the "
    f"oracle unroll the same {_LPA_ITERS} rounds as CTE stages and "
    "match bit-for-bit (random-order LPA would be irreproducible). "
    "Complements connected_components (structural reachability) with "
    "density-sensitive grouping; per round one join + one shuffle on "
    "fixed-width node keys, O(E) per round regardless of corpus size "
    "(operators.graph.label_propagation).",
)
def graph_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf_dir, "events"))
    item = F.get_json_object("props", "$.k")
    pairs = (
        ev.filter(item.isNotNull())
        .select(
            F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
            F.concat(F.lit("i:"), item).alias("i"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("u").alias("src"), F.col("i").alias("dst")).unionAll(
        pairs.select(F.col("i").alias("src"), F.col("u").alias("dst"))
    )
    labels = G.label_propagation(edges, iters=_LPA_ITERS)
    return labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min("node").alias("exemplar"),
    )
