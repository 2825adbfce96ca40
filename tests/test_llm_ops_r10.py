"""Semantic pins for the four r10-late LLM-pipeline operators (their
value-level correctness is oracle-gated in test_oracle_parity.py; these
pin the properties the oracle comparison alone cannot express)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    from kinesis_to_opensearch_lambda_spark.queries import REGISTRY

    return REGISTRY[name].spark(spark, SF).collect()


def test_source_jsd_bounds_and_pair_count(spark):
    """JSD in bits is bounded [0, 1]; every unordered source pair
    appears exactly once; shared words never exceed the union; the
    integer micro-bit sum and the double quotient agree exactly."""
    rows = _run(spark, "corpus_source_jsd")
    n_src = len({r.s1 for r in rows} | {r.s2 for r in rows})
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert r.s1 < r.s2
        # micro-bit rounding can push a hair past the analytic bound
        assert -1e-5 <= r.jsd_bits <= 1 + 1e-5
        assert 0 <= r.n_shared <= r.n_words_union
        assert r.jsd_bits == r.jsd_microbits / 2_000_000.0


def test_matryoshka_recall_bounds(spark):
    """recall@5 = n_hits/5 with n_hits in [0, 5], one row per query."""
    rows = _run(spark, "ann_matryoshka_recall")
    assert len(rows) == len({r.q_id for r in rows})
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert r.recall_at_5 == round(r.n_hits / 5.0, 6)


def test_hard_negative_margin_consistency(spark):
    """One row per anchor; positive/negative are distinct vectors, never
    the anchor itself; margin is exactly pos_cos - neg_cos after the
    shared rounding; cosines are in [-1, 1]."""
    rows = _run(spark, "emb_hard_negative_mining")
    assert rows and len(rows) == len({r.q_id for r in rows})
    for r in rows:
        # A singleton-label anchor would yield NULL pos_id/pos_cos/
        # margin, passing `pos_id != q_id` vacuously and crashing the
        # margin arithmetic with TypeError instead of a legible
        # assertion (r10 ADVICE) — require completeness explicitly.
        assert None not in (r.pos_id, r.neg_id, r.pos_cos, r.neg_cos, r.margin), (
            f"anchor {r.q_id}: incomplete pos/neg row {r}"
        )
        assert r.pos_id != r.q_id and r.neg_id != r.q_id
        assert r.pos_id != r.neg_id
        assert -1.000001 <= r.neg_cos <= 1.000001
        assert -1.000001 <= r.pos_cos <= 1.000001
        assert abs(r.margin - (r.pos_cos - r.neg_cos)) <= 2e-6
