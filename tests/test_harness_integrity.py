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


def test_driver_window_is_the_never_verified_rotation():
    """The driver's CORRECTNESS gate checks the first 50 registry entries
    in iteration order.  Rounds 1/2/4 drove 96 distinct queries green;
    the round-5 window must be drawn ENTIRELY from the 63 entries with
    no driver row in any prior round (round-4 verdict: 'swap out the
    r4-greens, keep 0'), leaving at most 13 never-verified entries for
    the round-6 rotation."""
    import json
    from pathlib import Path

    from kinesis_to_opensearch_lambda_spark.queries import DRIVER_WINDOW

    first50 = list(REGISTRY)[:50]
    assert len(DRIVER_WINDOW) == 50
    assert first50 == list(DRIVER_WINDOW)

    root = Path(__file__).resolve().parent.parent
    prior = set()
    for f in sorted(root.glob("CORRECTNESS_r0[124].json")):
        prior |= set(json.loads(f.read_text()).keys())
    assert prior, "prior CORRECTNESS files missing"
    already = set(DRIVER_WINDOW) & prior
    assert not already, f"window wastes slots on already-verified: {sorted(already)}"
    never_left = set(REGISTRY) - prior - set(DRIVER_WINDOW)
    # streaming_stateful_highwater is capability-probed (registers only
    # where protobuf exists) — exclude it from the rotation budget
    never_left.discard("streaming_stateful_highwater")
    # 13 r4-era entries deferred to round 6 + the ~40 queries newly
    # added in round 5; the debt must fit in TWO more 50-slot windows
    # so rounds 6-7 complete driver coverage of the whole registry
    assert len(never_left) <= 100, sorted(never_left)
