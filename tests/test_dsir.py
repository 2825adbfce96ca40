"""Pins for DSIR importance selection (corpus_dsir_selection): output
shape, rank monotonicity, and the WindowGroupLimit plan shape."""

from __future__ import annotations

from collections import defaultdict

from kinesis_to_opensearch_lambda_spark.queries import REGISTRY

from .conftest import SF_DIR


def test_dsir_output_shape_and_monotonic_ranks(spark):
    """Exactly top-5 per raw source (the target source is excluded),
    ranks 1..5, importance non-increasing with rank."""
    rows = REGISTRY["corpus_dsir_selection"].spark(spark, SF_DIR).collect()
    by_src = defaultdict(list)
    for r in rows:
        assert r.source != "src0", "target source must never be selected"
        by_src[r.source].append(r)
    assert len(by_src) == 19  # 20 sources minus the target
    for src, grp in by_src.items():
        grp.sort(key=lambda r: r.sel_rank)
        assert [r.sel_rank for r in grp] == [1, 2, 3, 4, 5]
        imps = [r.imp_micro for r in grp]
        assert imps == sorted(imps, reverse=True), f"{src}: {imps}"


def test_dsir_plan_pushes_window_group_limit(spark):
    """The top-k rank filter uses a LITERAL k, so Catalyst must push
    WindowGroupLimit below the rank shuffle — at 100 TB no task may
    forward more than k rows per source."""
    df = REGISTRY["corpus_dsir_selection"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
