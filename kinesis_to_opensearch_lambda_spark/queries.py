"""Query catalog: every operator from SURVEY.md §2 as a named query.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with the equivalent ANSI SQL for the DuckDB oracle (``None`` for
non-SQL-expressible operators — the driver then records a rows-only
check).  ``__spark_entry__.py`` exposes this registry to the driver.

Conventions (driver contract, see /root/repo/__spark_entry__.py):

- every computed column is aliased identically in Spark and SQL;
- double aggregates are ``round()``-ed on BOTH sides so the
  order-insensitive value hash is stable across summation orders;
- timestamps/dates in outputs are formatted to canonical strings so the
  hash does not depend on engine-specific temporal rendering.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Q:
    name: str
    spark: SparkQuery
    oracle: str | None
    headline: bool = False  # included in bench.py's timed set
    doc: str = ""


REGISTRY: dict[str, Q] = {}


def register(
    name: str, oracle: str | None, headline: bool = False, doc: str = ""
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = Q(name=name, spark=fn, oracle=oracle, headline=headline, doc=doc)
        return fn

    return deco


# Import for side effects: each module registers its queries.
from .operators import (  # noqa: E402,F401
    pipeline_queries,
    relational_queries,
    dedup_queries,
    similarity_queries,
    text_queries,
    multimodal_queries,
    streaming_queries,
    subquery_queries,
    analytic_queries,
    corpus_queries,
    training_queries,
    bucketed_queries,
    graph_queries,
    quality_queries,
    source_queries,
    timeseries_queries,
    maintenance_queries,
)

# ---------------------------------------------------------------------------
# Driver verification window — round 6 rotation.
#
# The driver's CORRECTNESS gate checks the FIRST 50 registry entries in
# iteration order.  Rounds 1/2/4/5 drove 146 distinct queries green
# (CORRECTNESS_r01/r02/r04/r05.json, 146/146 passing); this window is
# drawn ENTIRELY from the 76 entries that have never had a driver
# CORRECTNESS row (r5 verdict task 1: "prioritize the 13 r4-era
# deferrals, then the oldest r5 families") plus the one new entry this
# round (window_sliding_distinct_users_hll — verdict task 3; registry
# growth is otherwise FROZEN per task 2).  Every entry keeps full local
# parity coverage via tests/test_oracle_parity.py regardless of window
# membership.  After this window the never-verified debt is 27 entries
# (list pinned in tests/test_harness_integrity.py), which fits round
# 7's single 50-slot window — driver coverage completes next round.
# ---------------------------------------------------------------------------
DRIVER_WINDOW: tuple[str, ...] = (
    # --- the 13 r4-era deferrals (oldest debt first) ---
    "agg_histogram",
    "window_ntile_quartiles",
    "cdc_merge_upsert",
    "join_salted_skew",
    "join_shuffled_hash_hint",
    "dedup_containment",
    "dedup_chunk_exact",
    "emb_normalize",
    "ann_topk_ivf_multiprobe",
    "emb_intra_inter_cosine",
    "ivf_kmeans_lloyd_step",
    "emb_quantize_int8",
    "emb_gram_matrix",
    # --- sketch trio ---
    "agg_hll_partial_merge",
    "agg_countmin_heavy_hitters",
    "agg_quantile_sketch_tolerance",
    # --- time-series warehouse ---
    "rollup_time_hierarchy",
    "anomaly_iqr_outliers",
    "join_asof_nearest",
    "window_time_weighted_avg",
    "window_ewma_finite",
    "anomaly_cusum_drift",
    # --- graph family ---
    "graph_triangle_count",
    "graph_degree_distribution",
    "graph_common_neighbors",
    "graph_kcore_peel",
    "graph_bfs_reachability",
    "graph_random_walk_deterministic",
    # --- storage maintenance ---
    "maintenance_compact_small_files",
    "maintenance_targeted_delete",
    "maintenance_zorder_skipping",
    # --- sources ---
    "source_corrupt_file_skip",
    "source_partitioned_pruning",
    "source_python_datasource",
    "source_schema_evolution",
    # --- round-5 streaming lifecycles ---
    "streaming_incremental_mv",
    "streaming_python_datasource",
    "streaming_session_windows",
    "streaming_sketch_distinct",
    "streaming_static_enrich",
    # --- VARIANT / recursive CTE / SQL UDF ---
    "variant_typed_extract",
    "sql_recursive_cte_reachability",
    "scalar_sql_udf_inlined",
    # --- window extensions incl. the new scale-safe distinct ---
    "window_event_transitions",
    "window_sliding_distinct_users",
    "window_sliding_distinct_users_hll",
    # --- join extensions ---
    "join_dynamic_partition_pruning",
    "join_scd2_point_in_time",
    # --- data-quality drift ---
    "quality_ks_two_sample",
    "quality_psi_drift",
)


def _reorder_registry() -> None:
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise KeyError(f"DRIVER_WINDOW names not registered: {missing}")
    front = set(DRIVER_WINDOW)
    ordered = [*DRIVER_WINDOW, *[n for n in REGISTRY if n not in front]]
    snapshot = dict(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update({n: snapshot[n] for n in ordered})


_reorder_registry()
