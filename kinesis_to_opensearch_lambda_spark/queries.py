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
# Driver verification window.
#
# The driver's CORRECTNESS gate checks the FIRST 50 registry entries in
# iteration order.  Rounds 1/2/4 drove 96 distinct queries green
# (CORRECTNESS_r01/r02/r04.json); this round the window rotates to 50
# of the 63 entries that have NEVER had a driver CORRECTNESS row, per
# the round-4 verdict ("swap out the r4-greens, keep 0") — cumulative
# driver coverage across rounds is the bar, and every entry keeps full
# local parity coverage via tests/test_oracle_parity.py (all entries,
# same compare) regardless of window membership.  After this window
# the never-verified debt is the 13 r4-era deferrals (agg_histogram,
# window_ntile_quartiles, cdc_merge_upsert, join_salted_skew,
# join_shuffled_hash_hint, dedup_containment, dedup_chunk_exact,
# emb_normalize, ann_topk_ivf_multiprobe, emb_intra_inter_cosine,
# ivf_kmeans_lloyd_step, emb_quantize_int8, emb_gram_matrix) plus the
# queries added during round 5 — 76 entries, which fit the two
# remaining 50-slot windows (rounds 6-7 complete driver coverage;
# tests/test_harness_integrity.py pins the <=100 budget).
# ---------------------------------------------------------------------------
DRIVER_WINDOW: tuple[str, ...] = (
    # late TPC-H (never driver-verified)
    "tpch_q2_min_cost_supplier",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q11_important_value",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_count",
    "tpch_q17_small_quantity",
    "tpch_q19_disjunctive",
    "tpch_q20_excess_supply",
    "tpch_q21_waiting_supplier",
    "tpch_q22_idle_customers",
    # graph
    "graph_pagerank_items",
    "graph_lpa_communities",
    # warehouse ops / diagnostics
    "diag_key_skew",
    "scd2_customer_history",
    # source scans
    "source_jsonl_scan",
    "source_csv_scan",
    # aggregation / anomaly extensions
    "agg_decimal_money",
    "anomaly_hourly_zscore",
    # PQ sub-steps + filtered ANN
    "emb_pq_assign",
    "ann_pq_recall",
    "ann_topk_rerank",
    "ann_filtered_topk",
    # as-of tolerance join (oracle aligned to calendar-day this round)
    "join_asof_tolerance",
    # streaming (real StreamingQuery lifecycle)
    "streaming_dlq_split",
    "streaming_sliding_counts",
    # text analysis extensions
    "text_regex_stats",
    "text_unigram_logprob",
    "text_gopher_filter",
    "text_unigram_entropy",
    # corpus statistics
    "corpus_dup_rate_by_source",
    "corpus_zipf_fit",
    "curation_source_cap",
    "corpus_mixture_weights",
    "corpus_quality_vs_dup",
    # analytic / window extensions
    "lateral_topk_per_nation",
    "agg_percentiles",
    "agg_mode_deterministic",
    "agg_listagg",
    "lateral_posexplode",
    "window_value_functions",
    "window_rank_distribution",
    "funnel_stages",
    "cohort_retention",
    "agg_conditional",
    "window_session_builtin",
    "window_gap_islands",
    "window_percent_of_total",
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
