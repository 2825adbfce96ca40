"""Guards on the verification harness itself: no trivially-empty
oracle matches, and the comparator genuinely detects mismatches."""

from __future__ import annotations

import pandas as pd
import pytest

from kinesis_to_opensearch_lambda_spark.queries import REGISTRY

from .conftest import SF_DIR
from .oracle_compare import _rows


@pytest.mark.parametrize(
    "name", sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
)
def test_oracle_checked_queries_non_empty(spark, name):
    """An empty result matches an empty oracle trivially (the q7 nation
    mismatch hid exactly this way) — every oracle-checked query must
    produce rows at the driver's gate scale."""
    n = REGISTRY[name].spark(spark, SF_DIR).count()
    assert n > 0, f"{name} returns no rows at {SF_DIR} — trivial oracle match"


def test_comparator_detects_value_mismatch():
    a = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]})
    b = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.6]})
    assert _rows(a) != _rows(b)


def test_comparator_detects_row_swap_insensitively():
    a = pd.DataFrame({"k": [1, 2], "v": ["x", "y"]})
    b = pd.DataFrame({"k": [2, 1], "v": ["y", "x"]})
    assert _rows(a) == _rows(b)  # order-insensitive by design


def test_comparator_is_dtype_faithful():
    """The driver hashes values as materialized: an int64 3 and a float64
    3.0 hash differently (the round-1 HUGEINT drift). The local gate must
    be at least as strict — `3.0` vs `3` MUST fail."""
    a = pd.DataFrame({"v": [3.0]})
    b = pd.DataFrame({"v": [3]})
    assert _rows(a) != _rows(b)


def test_comparator_still_normalizes_nulls():
    a = pd.DataFrame({"v": [None]}, dtype="float64")
    b = pd.DataFrame({"v": [float("nan")]})
    assert _rows(a) == _rows(b)


def test_comparator_detects_negative_zero():
    a = pd.DataFrame({"v": [0.0]})
    b = pd.DataFrame({"v": [-0.0]})
    assert _rows(a) != _rows(b)


# The exact never-driver-verified debt remaining AFTER the round-6
# window: these 27 entries (plus nothing else) must lead round 7's
# window, completing driver coverage of the whole registry.
R7_DEBT = frozenset(
    {
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
    }
)


# Queries materially rewritten in round 6 whose only driver rows
# predate the rewrite — the r7 window must re-verify the shipped code.
R6_REWRITTEN = frozenset(
    {
        "decontam_ngram_overlap",
        "dedup_simhash_near",
        "dedup_simhash",
        "dedup_duplicate_clusters",
        "curation_pipeline",
        "dedup_semantic_keep_best",
        "quality_percentile_filter",
    }
)


def test_driver_window_completes_coverage():
    """Round-7 rotation (r6 verdict tasks 1-2): the window must contain
    the ENTIRE 27-entry R7_DEBT plus the 7 r6-rewritten queries, and
    every registry entry not in this window must already hold a driver
    CORRECTNESS row from rounds 1-6 — i.e. after this window runs,
    driver coverage of the whole registry is complete.  New entries
    (no prior row, not in R7_DEBT) must ALL sit in the window — the
    post-freeze growth rule: every new query enters the next window,
    never accruing silent debt."""
    import json
    from pathlib import Path

    from kinesis_to_opensearch_lambda_spark.queries import DRIVER_WINDOW

    first50 = list(REGISTRY)[:50]
    assert len(DRIVER_WINDOW) == 50
    assert first50 == list(DRIVER_WINDOW)

    window = set(DRIVER_WINDOW)
    assert R7_DEBT <= window, sorted(R7_DEBT - window)
    assert R6_REWRITTEN <= window, sorted(R6_REWRITTEN - window)

    root = Path(__file__).resolve().parent.parent
    prior = set()
    for f in sorted(root.glob("CORRECTNESS_r0[12456].json")):
        prior |= set(json.loads(f.read_text()).keys())
    assert prior, "prior CORRECTNESS files missing"

    uncovered = set(REGISTRY) - prior - window
    # streaming_stateful_highwater is capability-probed (registers only
    # where protobuf exists) — exclude it from the rotation budget
    uncovered.discard("streaming_stateful_highwater")
    assert not uncovered, (
        f"entries with no driver row and no window slot: {sorted(uncovered)}"
    )
