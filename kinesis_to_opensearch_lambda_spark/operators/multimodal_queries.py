"""Oracle-checked multimodal queries (driver mandate: opaque binary
columns + typed metadata; decode plumbing via Arrow-batched UDFs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import register
from ..sources.batch import fan_out, load_table
from . import multimodal as MM


@register(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           lower(hex(encode(substr(text, 1, 4)))) AS header_hex,
           md5(text) AS checksum,
           octet_length(encode(text)) % 64 + 16 AS fake_width,
           (octet_length(encode(text)) // 7) % 64 + 16 AS fake_height
    FROM documents
    """,
    doc="Binary payload + typed metadata extraction: byte length, header "
    "bytes, checksum, deterministic fake decode dims (operators.multimodal."
    "attach_binary_payload / fake_decode_meta). Metadata-only plans never "
    "read the blob pages.",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    out = MM.attach_binary_payload(docs)
    return out.select(
        "doc_id",
        "n_bytes",
        "header_hex",
        "checksum",
        (F.col("n_bytes") % 64 + 16).alias("fake_width"),
        (F.expr("n_bytes div 7") % 64 + 16).alias("fake_height"),
    )


@register(
    "mm_frame_extract",
    oracle="""
    SELECT doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(frame_idx AS BIGINT) * 4096 AS byte_offset
    FROM (
      SELECT doc_id,
             unnest(range(octet_length(encode(text)) % 5 + 1)) AS frame_idx
      FROM documents
    )
    """,
    doc="Frame-sampling over binary payloads via Arrow-batched mapInPandas "
    "fan-out (operators.multimodal.extract_frames) — deterministic fake "
    "keyframe index, real UDF batch plumbing.",
)
def mm_frame_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    payload = MM.attach_binary_payload(docs)
    return MM.extract_frames(payload)
