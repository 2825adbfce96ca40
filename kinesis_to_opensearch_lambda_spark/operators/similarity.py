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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cosine


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus scan + window."""
    pairs = corpus.join(F.broadcast(queries), F.col(c_id) != F.col(q_id))
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
