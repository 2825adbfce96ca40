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


def test_driver_window_covers_every_category():
    """The driver's CORRECTNESS gate checks the first 50 registry entries
    in iteration order — that window must stay a cross-section of every
    SURVEY.md §2 category (round-2 verdict: 67 queries, including every
    dedup/ANN/text/multimodal/streaming entry, had never been
    driver-verified because registration order front-loaded relational)."""
    from kinesis_to_opensearch_lambda_spark.queries import DRIVER_WINDOW

    first50 = list(REGISTRY)[:50]
    assert len(DRIVER_WINDOW) == 50
    assert first50 == list(DRIVER_WINDOW)
    for prefix in (
        "pipeline_",
        "dedup_",
        "ann_",
        "emb_",
        "text_",
        "split_",
        "token_",
        "mm_",
        "streaming_",
        "join_bucketed",
        "tpch_",
    ):
        assert any(n.startswith(prefix) for n in first50), prefix
