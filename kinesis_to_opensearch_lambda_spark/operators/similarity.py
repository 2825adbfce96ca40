"""Similarity search over embedding columns (array<float>).

Two physical strategies:

- **Brute-force top-k** (:func:`brute_force_topk`): broadcast the query
  set, crossJoin against the corpus, sequential-fold cosine
  (functions.cosine — pure codegen, no Python), per-query
  ``row_number() <= k``.  Exact; O(|Q|·|corpus|·d).  The right baseline
  whenever |Q| is small: the corpus is scanned once, embarrassingly
  parallel, zero shuffle on the corpus side (queries are broadcast).
- **IVF-style bucketed** (:func:`ivf_topk`): restrict candidates to the
  query's coarse cell and search only there — the 100 TB path: the
  corpus is hash-partitioned (or bucketed on disk) by cell id, so a
  probe touches 1/n_cells of the data.  Cell assignment is pluggable;
  the test tables use the ``label`` column as the cell id (stand-in for
  a k-means coarse quantizer; swapping in learned centroids is a
  broadcast join against a centroid table, same plan shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cosine


def srp_bucket(
    vec: Column, n_planes: int = 8, dim: int = 64, plane_offset: int = 0
) -> Column:
    """Signed-random-projection LSH bucket id for an embedding column.

    Bit *i* of the bucket is the sign of ``dot(vec, plane_{offset+i})``
    where the hyperplane components come from a deterministic integer
    hash (Knuth multiplicative) in [-0.5, 0.5) — identical in every
    engine, no RNG.  Pure per-row fold work (zero shuffle); the bucket
    id is the shuffle/bucketing key that turns all-pairs similarity
    into an equi-join.  ``plane_offset`` selects a disjoint plane set,
    giving an INDEPENDENT hash table — the OR-amplification recall
    knob (table t of L uses ``plane_offset=t*n_planes``).  DuckDB
    twin: :func:`sql_srp_bits`.
    """
    terms = None
    for i in range(n_planes):
        p = plane_offset + i
        prods = F.zip_with(
            vec,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            # plain closure over the loop var is safe: PySpark consumes
            # the lambda eagerly at expression-build time, and a default
            # arg would change the lambda's arity (HOFs inspect it).
            lambda x, j: x.cast("double")
            * (((((F.lit(p) * dim + j) * 2654435761) % 1000 + 1000) % 1000) / 1000.0 - 0.5),
        )
        dot_i = F.aggregate(prods, F.lit(0.0), lambda a, x: a + x)
        term = F.when(dot_i >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        terms = term if terms is None else terms + term
    return terms


def sql_srp_bits(vec: str, n_planes: int = 8, dim: int = 64, plane_offset: int = 0) -> str:
    """DuckDB twin of :func:`srp_bucket` (same fold order, same integer
    hyperplane components, same plane_offset table-selection rule)."""
    terms = []
    for i in range(n_planes):
        p = plane_offset + i
        dot = (
            "list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(list_zip({vec}, range(0, {dim})), "
            f"z -> z[1]::DOUBLE * (((((({p} * {dim} + (z[2])) * 2654435761) % 1000) + 1000) % 1000) / 1000.0 - 0.5))), "
            "(a, x) -> a + x)"
        )
        terms.append(f"CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def windowed_topk(
    scored: DataFrame,
    key: str,
    score: str,
    tiebreak: str,
    k: int,
    ascending: bool = False,
) -> DataFrame:
    """Exact per-key top-k: ``row_number() over (partition by key order
    by score, tiebreak) <= k``.

    Scale note — the exchange this plans is BOUNDED, not the scored
    corpus: because the rank filter sits directly on the window,
    Catalyst's rank-limit pushdown (InferWindowGroupLimit,
    SPARK-37099) inserts a ``WindowGroupLimit … Partial`` node BELOW
    the shuffle, so each map task forwards at most k rows per key and
    the exchange carries ≤ n_partitions × n_keys × k rows — the
    per-partition combine the 100 TB shape needs, entirely JVM-side
    (no Python, no extra exchange).  tests/test_plans.py::
    test_ann_topk_partial_limit_below_exchange pins this: if a future
    refactor breaks the pushdown precondition (e.g. a projection
    between window and filter), the plan test fails loudly.

    The (score, tiebreak) pair must be a strict total order or top-k
    membership is nondeterministic across partitions."""
    order = F.col(score).asc() if ascending else F.col(score).desc()
    w = Window.partitionBy(key).orderBy(order, F.col(tiebreak))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus scan + window
    top-k (see :func:`windowed_topk` for why the window's exchange is
    bounded at n_partitions×k rows, not the scored corpus)."""
    pairs = corpus.join(F.broadcast(queries), F.col(c_id) != F.col(q_id))
    scored = pairs.select(
        F.col(q_id),
        F.col(c_id),
        cosine(F.col(q_vec), F.col(c_vec)).alias("cos"),
    )
    return windowed_topk(scored, q_id, "cos", c_id, k, ascending=False)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    cell_col: str = "label",
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """IVF(nprobe=1)-style ANN: equi-join on the coarse cell, then exact
    cosine within the cell. The cell equi-join replaces the cross join —
    candidate count drops by ~n_cells and the join is hash-partitioned."""
    pairs = corpus.join(
        F.broadcast(queries),
        (F.col(f"q_{cell_col}") == F.col(cell_col)) & (F.col(c_id) != F.col(q_id)),
    )
    scored = pairs.select(
        F.col(q_id),
        F.col(c_id),
        cosine(F.col(q_vec), F.col(c_vec)).alias("cos"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cos").desc(), F.col(c_id))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
