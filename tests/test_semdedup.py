"""Pins for SemDeDup semantic cluster dedup (dedup_semdedup_prune):
planted-signal recall, output semantics, and the bounded-pair-mass
plan shape (no cartesian/theta pair stage)."""

from __future__ import annotations

from kinesis_to_opensearch_lambda_spark.queries import REGISTRY

from .conftest import SF_DIR

PLANTED_OFFSET = 1_000_000_000_000


def _rows(spark):
    return REGISTRY["dedup_semdedup_prune"].spark(spark, SF_DIR).collect()


def test_semdedup_planted_recall_floor(spark):
    """Every 20th vector gets a perturbed copy at cos~0.999 — far above
    tau=0.95 while the organic corpus tops out near 0.5 — so pruned
    rows are exactly one per planted pair, minus windowed-LSH misses.
    Measured: 24 of 25 planted pairs pruned at sf0.01 (the windowed
    chunk join trades a bounded miss rate for linear pair mass, like
    simhash's W=256 mode); pin a 0.85 floor so a recall regression in
    the bucketing/window fails loudly."""
    rows = _rows(spark)
    import duckdb

    n_planted = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/embeddings.parquet') "
        "WHERE vec_id % 20 = 0"
    ).fetchone()[0]
    assert n_planted >= 20
    # one prune per planted pair: either the copy or (rarely, when the
    # copy out-ranks it) the original is removed
    pruned_pair_ids = {
        r.vec_id % PLANTED_OFFSET if r.vec_id >= PLANTED_OFFSET else r.vec_id
        for r in rows
    }
    planted_ids = set(range(0, n_planted * 20, 20))
    hit = len(pruned_pair_ids & planted_ids)
    assert hit >= 0.85 * n_planted, f"recall {hit}/{n_planted} below floor"


def test_semdedup_output_semantics(spark):
    """One row per pruned item; the best prior is a different vector,
    its cosine clears tau, clusters are valid cells, and candidate
    counts are positive."""
    rows = _rows(spark)
    assert rows and len(rows) == len({r.vec_id for r in rows})
    for r in rows:
        assert None not in (
            r.cluster,
            r.n_dup_candidates,
            r.best_prior_id,
            r.best_prior_cos,
        ), f"incomplete row {r}"
        assert r.best_prior_id != r.vec_id
        assert r.best_prior_cos >= 0.95
        assert 0 <= r.cluster <= 9
        assert r.n_dup_candidates >= 1


def test_semdedup_prior_outranks_pruned(spark):
    """'Keep hard': the surviving best prior must hold strictly better
    keep-priority — (cent_cos, vec_id) lexicographically SMALLER — than
    the item it prunes.  Re-derived independently: centroids and
    centroid-cosines recomputed in DuckDB from the raw corpus, then the
    priority order checked for every (pruned, prior) pair the engine
    emitted."""
    import duckdb

    rows = _rows(spark)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    oracle = REGISTRY["dedup_semdedup_prune"].oracle
    # reuse the oracle's own CTE chain but project the RANK table, so
    # the priority check shares no Spark-side code with the engine
    prefix = oracle[: oracle.index("), slim AS (")] + ")"
    ranked = con.execute(
        prefix + " SELECT vec_id, cluster, cent_cos_i FROM ranked"
    ).fetchdf()
    prio = {
        int(v): (int(c), int(cc), int(v))
        for v, c, cc in zip(
            ranked["vec_id"], ranked["cluster"], ranked["cent_cos_i"]
        )
    }
    for r in rows:
        pv, pp = prio[r.vec_id], prio[r.best_prior_id]
        assert pv[0] == pp[0], "prior must share the pruned item's cluster"
        assert (pp[1], pp[2]) < (pv[1], pv[2]), (
            f"prior {r.best_prior_id} does not outrank pruned {r.vec_id}"
        )


def test_semdedup_plan_has_no_cartesian_pair_stage(spark):
    """The pair stage must be an equi-join on (cluster, table, bits,
    chunk) — never a cartesian or non-broadcast nested-loop over the
    corpus.  (BroadcastNestedLoopJoin appears only for the tiny
    centroid/scalar broadcasts, which is the intended shape.)"""
    df = REGISTRY["dedup_semdedup_prune"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
