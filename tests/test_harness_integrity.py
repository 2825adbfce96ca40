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
# window: these 27 entries (plus nothing else) must fill round 7's
# window, completing driver coverage of the whole registry.  Pinned so
# any registry growth or window edit that pushes coverage past round 7
# fails loudly (r5 verdict task 2: registry growth is FROZEN until
# driver coverage completes).
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


def test_driver_window_is_the_never_verified_rotation():
    """The driver's CORRECTNESS gate checks the first 50 registry entries
    in iteration order.  Rounds 1/2/4/5 drove 146 distinct queries
    green; the round-6 window must be drawn ENTIRELY from entries with
    no driver row in any prior round (the 76-entry debt plus this
    round's single mandated addition, window_sliding_distinct_users_hll),
    leaving EXACTLY the pinned 27-entry R7_DEBT for the final rotation."""
    import json
    from pathlib import Path

    from kinesis_to_opensearch_lambda_spark.queries import DRIVER_WINDOW

    first50 = list(REGISTRY)[:50]
    assert len(DRIVER_WINDOW) == 50
    assert first50 == list(DRIVER_WINDOW)

    root = Path(__file__).resolve().parent.parent
    prior = set()
    for f in sorted(root.glob("CORRECTNESS_r0[1245].json")):
        prior |= set(json.loads(f.read_text()).keys())
    assert prior, "prior CORRECTNESS files missing"
    already = set(DRIVER_WINDOW) & prior
    assert not already, f"window wastes slots on already-verified: {sorted(already)}"
    never_left = set(REGISTRY) - prior - set(DRIVER_WINDOW)
    # streaming_stateful_highwater is capability-probed (registers only
    # where protobuf exists) — exclude it from the rotation budget
    never_left.discard("streaming_stateful_highwater")
    assert never_left == set(R7_DEBT), sorted(
        never_left.symmetric_difference(R7_DEBT)
    )
