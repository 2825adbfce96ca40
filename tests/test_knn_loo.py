"""Pins for the leave-one-out kNN label eval (emb_knn_loo_label_eval)
and the directed_knn_topk extraction it is built on."""

from __future__ import annotations

from kinesis_to_opensearch_lambda_spark.queries import REGISTRY

from .conftest import SF_DIR


def test_loo_output_shape_and_bounds(spark):
    """One row per label, counts consistent, accuracy in [0, 1] and
    equal to the count quotient."""
    rows = REGISTRY["emb_knn_loo_label_eval"].spark(spark, SF_DIR).collect()
    assert len(rows) == 10  # the corpus's 10 label cells
    for r in rows:
        assert 0 < r.n_eval
        assert 0 <= r.n_correct <= r.n_eval
        assert abs(r.acc - round(r.n_correct / r.n_eval, 6)) < 1e-9


def test_directed_knn_topk_matches_mutual_builder(spark):
    """knn_graph_mutual is now a thin consumer of directed_knn_topk
    (pure code motion): every mutual edge must appear in BOTH
    directions of the directed graph with the recorded ranks."""
    from kinesis_to_opensearch_lambda_spark.operators.similarity_queries import (
        _KNN_TABLES,
        directed_knn_topk,
        knn_graph_mutual,
    )

    directed = {
        (r.src, r.dst): r.rnk
        for r in directed_knn_topk(spark, SF_DIR, _KNN_TABLES).collect()
    }
    mutual = knn_graph_mutual(spark, SF_DIR, _KNN_TABLES).collect()
    assert mutual
    for e in mutual:
        assert directed.get((e.src, e.dst)) == e.rnk_fwd, (e.src, e.dst)
        assert directed.get((e.dst, e.src)) == e.rnk_rev, (e.dst, e.src)
