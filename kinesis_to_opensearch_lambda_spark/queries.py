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
# Driver verification window — round 7 rotation (coverage-completing).
#
# The driver's CORRECTNESS gate checks the FIRST 50 registry entries in
# iteration order.  Rounds 1/2/4/5/6 drove 196 distinct queries green
# (CORRECTNESS_r0{1,2,4,5,6}.json, 196/196 passing).  This window:
#   - the 27 never-verified entries (the exact R7_DEBT pinned in
#     tests/test_harness_integrity.py — r6 verdict task 1), completing
#     driver verification of the WHOLE registry;
#   - the 7 queries materially rewritten in round 6 whose only driver
#     rows predate their rewrites (r6 verdict: re-verify the shipped
#     code, not the r4-era version);
#   - 1 new entry, anomaly_cusum_drift_blocked (r6 verdict task 4 —
#     the skew-safe blocked CUSUM; post-freeze rule: every new entry
#     enters the next window, so it carries no debt);
#   - 15 re-verification slots spent on the OLDEST driver rows
#     (r1/r2-era): session conf and comparator details have drifted
#     over five rounds and those rows predate all of it.
# Every entry keeps full local parity coverage via
# tests/test_oracle_parity.py regardless of window membership.
# ---------------------------------------------------------------------------
DRIVER_WINDOW: tuple[str, ...] = (
    # --- the 27-entry R7_DEBT (never driver-verified) ---
    "agg_boolean_conditional",
    "agg_corr_exact_moments",
    "agg_mutual_information",
    "ann_knn_graph_mutual",
    "ann_range_search",
    "ann_topk_ivf_pq",
    "corpus_ngram_lm_counts",
    "curation_ablation_curve",
    "curation_dataset_card",
    "curation_rejection_funnel",
    "dedup_lsh_length_prune",
    "dedup_lsh_planner",
    "dedup_lsh_recall",
    "dedup_prefix_cluster",
    "diag_column_profile",
    "diag_observe_metrics",
    "incremental_agg_merge",
    "mm_av_sync_join",
    "mm_scene_change",
    "sample_bottom_k_per_key",
    "sample_poisson_bootstrap",
    "sample_weighted_bernoulli",
    "snapshot_diff",
    "split_leakage_safe_groups",
    "text_bpe_token_estimate",
    "text_cooccurrence_pmi",
    "text_mojibake_stats",
    # --- r6-rewritten queries whose driver rows predate the rewrite ---
    "decontam_ngram_overlap",
    "dedup_simhash_near",
    "dedup_simhash",
    "dedup_duplicate_clusters",
    "curation_pipeline",
    "dedup_semantic_keep_best",
    "quality_percentile_filter",
    # --- new this round (skew-safe CUSUM, r6 verdict task 4) ---
    "anomaly_cusum_drift_blocked",
    # --- oldest-row re-verification (latest driver row is r1/r2) ---
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q18_large_volume",
    "window_sessionization",
    "window_topk_per_group",
    "agg_cube",
    "agg_grouping_sets",
    "agg_salted_skew",
    "join_range_interval",
    "join_asof_last_order",
    "setop_except_all",
    "scalar_null_semantics",
    "json_extraction",
    "gap_fill_daily",
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
