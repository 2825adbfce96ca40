"""Oracle-checked similarity-search queries (driver mandate: ANN over
the embeddings table — brute-force baseline + bucketed scale path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import sql_cosine
from ..queries import register
from ..sources.batch import fan_out, load_table
from . import similarity as S

_N_QUERIES = 20


@register(
    "ann_topk_bruteforce",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS q_vec
      FROM embeddings WHERE vec_id < {_N_QUERIES}
    ), scored AS (
      SELECT q.q_id, e.vec_id,
             {sql_cosine('q.q_vec', 'e.embedding')} AS cos
      FROM q JOIN embeddings e ON e.vec_id != q.q_id
    )
    SELECT q_id, vec_id, round(cos, 6) AS cos, rnk
    FROM (
      SELECT q_id, vec_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
      FROM scored
    )
    WHERE rnk <= 5
    """,
    headline=True,
    doc="Exact cosine top-5 for 20 query vectors: broadcast queries, one "
    "corpus scan, window top-k (operators.similarity.brute_force_topk).",
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = S.brute_force_topk(q, emb.select("vec_id", "embedding"), k=5)
    return out.select("q_id", "vec_id", F.round("cos", 6).alias("cos"), "rnk")


@register(
    "ann_topk_ivf_bucketed",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
      FROM embeddings WHERE vec_id < {_N_QUERIES}
    ), scored AS (
      SELECT q.q_id, e.vec_id,
             {sql_cosine('q.q_vec', 'e.embedding')} AS cos
      FROM q JOIN embeddings e
        ON e.label = q.q_label AND e.vec_id != q.q_id
    )
    SELECT q_id, vec_id, round(cos, 6) AS cos, rnk
    FROM (
      SELECT q_id, vec_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
      FROM scored
    )
    WHERE rnk <= 3
    """,
    doc="IVF(nprobe=1)-style ANN: candidates restricted to the query's coarse "
    "cell (label column as cell id) — the equi-join scale path "
    "(operators.similarity.ivf_topk).",
)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    out = S.ivf_topk(q, emb.select("vec_id", "embedding", "label"), k=3)
    return out.select("q_id", "vec_id", F.round("cos", 6).alias("cos"), "rnk")
