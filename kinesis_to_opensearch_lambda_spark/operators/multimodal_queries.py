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


@register(
    "mm_audio_windows",
    oracle="""
    SELECT doc_id,
           CAST(win_idx AS INT) AS win_idx,
           CAST(win_idx AS BIGINT) * 512 AS start_byte,
           least(CAST(win_idx AS BIGINT) * 512 + 1024, n_bytes) AS end_byte
    FROM (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             unnest(range((octet_length(encode(text)) + 511) // 512)) AS win_idx
      FROM documents
    )
    WHERE CAST(win_idx AS BIGINT) * 512 < n_bytes
    """,
    doc="Audio-style overlapping byte windows (1024-byte frames, 512-byte "
    "hop) over opaque payloads via Arrow mapInPandas fan-out — the "
    "windowed-feature-extraction plumbing; a real DSP kernel drops into "
    "the same batch loop.",
)
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    payload = MM.attach_binary_payload(docs).select("doc_id", "n_bytes")

    def windows(batch_iter):
        for pdf in batch_iter:
            n_wins = (pdf["n_bytes"].to_numpy() + 511) // 512
            doc_ids = pdf["doc_id"].to_numpy().repeat(n_wins)
            n_bytes = pdf["n_bytes"].to_numpy().repeat(n_wins)
            win_idx = [i for n in n_wins for i in range(n)]
            out = pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "win_idx": pd.array(win_idx, dtype="int32"),
                    "n_bytes": n_bytes,
                }
            )
            out["start_byte"] = out["win_idx"].astype("int64") * 512
            out["end_byte"] = (out["start_byte"] + 1024).clip(upper=out["n_bytes"])
            yield out[["doc_id", "win_idx", "start_byte", "end_byte"]]

    return payload.mapInPandas(
        windows, "doc_id bigint, win_idx int, start_byte bigint, end_byte bigint"
    )
