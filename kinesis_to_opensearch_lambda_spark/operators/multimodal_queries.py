"""Oracle-checked multimodal queries (driver mandate: opaque binary
columns + typed metadata; decode plumbing via Arrow-batched UDFs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import REGISTRY, register
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


# --- payload near-dup via parity sketch --------------------------------

_SQL_SKETCH = """
    SELECT doc_id,
           CAST(coalesce(sum(CASE WHEN cnt % 2 = 1
                             THEN (1::BIGINT << bucket) ELSE 0 END), 0)
                AS BIGINT) AS phash
    FROM (
      SELECT doc_id,
             (('0x' || substr(md5(w), 1, 15))::BIGINT) % 60 AS bucket,
             count(*) AS cnt
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM corpus)
      GROUP BY doc_id, bucket
    )
    GROUP BY doc_id
"""


@register(
    "mm_phash_neardup",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000000000 AS doc_id,
             array_to_string((string_split(text, ' '))[2:], ' ') AS text
      FROM documents WHERE doc_id < 50
    ), sigs AS (
      {_SQL_SKETCH}
    ), buckets AS (
      SELECT doc_id, phash, b AS band_idx,
             (phash >> (b * 30)) & 1073741823 AS band_val
      FROM sigs, range(2) t(b)
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
      FROM buckets a JOIN buckets b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.phash, b.phash)) <= 1
    )
    SELECT hamming, count(*) AS n_pairs,
           coalesce(sum(CASE WHEN doc_b - doc_a = 1000000000000 THEN 1 ELSE 0 END), 0)::BIGINT
             AS n_mutation_pairs
    FROM pairs GROUP BY hamming
    """,
    doc="Binary-payload near-dup via the mapInPandas parity sketch "
    "(operators.multimodal.payload_parity_sketch — the perceptual-hash "
    "analogue computable without codec libraries; a DCT pHash slots "
    "into the same Arrow seam).  Drop-one-chunk mutants sit at hamming "
    "exactly 1, so 2 bands x 30 bits pigeonhole-guarantee candidate "
    "recall at the hamming<=1 radius while 30-bit band values keep "
    "buckets collision-free (expected bucket size ~ n/2^30 — no "
    "mega-bucket pair blowup at any realistic corpus size; wider "
    "payload classes would move to 4 x 15-bit bands plus the "
    "dedup_lsh_bucket_cap guard).  Candidate generation is the banded "
    "equi-join; the exact bit_count verify runs on candidates only.",
)
def mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup_queries import _mutated

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    corpus = docs.union(_mutated(docs))
    payload = corpus.select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    sigs = MM.payload_parity_sketch(payload)
    buckets = sigs.select(
        "doc_id",
        "phash",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("band_idx"),
    ).withColumn(
        "band_val",
        F.when(
            F.col("band_idx") == 0, F.col("phash").bitwiseAND(F.lit(1073741823))
        ).otherwise(
            F.shiftright(F.col("phash"), 30).bitwiseAND(F.lit(1073741823))
        ),
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= 1)
        .distinct()
    )
    return pairs.groupBy("hamming").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(
            F.sum(F.when(F.col("doc_b") - F.col("doc_a") == 1000000000000, 1).otherwise(0)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_mutation_pairs"),
    )


@register(
    "mm_av_sync_join",
    oracle="""
    WITH frames AS (
      SELECT doc_id,
             CAST(frame_idx AS INT) AS frame_idx,
             CAST(frame_idx AS BIGINT) * 4096 AS byte_offset
      FROM (
        SELECT doc_id,
               unnest(range(octet_length(encode(text)) % 5 + 1)) AS frame_idx
        FROM documents
      )
    ), wins AS (
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
    )
    SELECT f.doc_id, f.frame_idx, w.win_idx,
           f.byte_offset - w.start_byte AS offset_in_win
    FROM frames f JOIN wins w
      ON f.doc_id = w.doc_id
     AND f.byte_offset >= w.start_byte
     AND f.byte_offset < w.start_byte + 1024
    """,
    doc="Cross-modal alignment: every sampled video frame joined to the "
    "audio window(s) covering its byte position — the A/V "
    "synchronization primitive a multimodal training pipeline needs "
    "before pairing frame features with audio features.  Both sides "
    "come from the same Arrow-batched fan-outs as mm_frame_extract / "
    "mm_audio_windows; the join is an EQUI-join on doc_id with the "
    "byte-interval predicate as a post-join filter (never a "
    "nested-loop interval join), and the 1024/512 overlap bounds "
    "matches at <=2 windows per frame.  At 100 TB alignment stays "
    "per-document local — co-partitioning frames and windows by "
    "doc_id makes the join shuffle-free after one exchange each side.",
)
def mm_av_sync_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    payload = MM.attach_binary_payload(docs)
    frames = MM.extract_frames(payload).select(
        F.col("doc_id").alias("f_doc"), "frame_idx", "byte_offset"
    )
    wins = REGISTRY["mm_audio_windows"].spark(spark, sf_dir).select(
        F.col("doc_id").alias("w_doc"), "win_idx", "start_byte"
    )
    return (
        frames.join(
            wins,
            (F.col("f_doc") == F.col("w_doc"))
            & (F.col("byte_offset") >= F.col("start_byte"))
            & (F.col("byte_offset") < F.col("start_byte") + 1024),
        )
        .select(
            F.col("f_doc").alias("doc_id"),
            "frame_idx",
            "win_idx",
            (F.col("byte_offset") - F.col("start_byte")).alias("offset_in_win"),
        )
    )


@register(
    "mm_scene_change",
    oracle=f"""
    WITH frames AS (
      SELECT doc_id,
             CAST(frame_idx AS INT) AS frame_idx,
             ('0x' || substr(md5(substr(text, CAST(frame_idx AS INT) * 113 + 1, 113)),
                             1, 15))::BIGINT % 65536 AS sig
      FROM (
        SELECT doc_id, text,
               unnest(range(octet_length(encode(text)) % 5 + 1)) AS frame_idx
        FROM documents
      )
    ), deltas AS (
      SELECT doc_id, frame_idx, sig,
             lag(sig) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev_sig
      FROM frames
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(CASE WHEN prev_sig IS NOT NULL
                          AND bit_count(xor(sig, prev_sig)) >= 6
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_scene_changes
    FROM deltas
    GROUP BY doc_id
    """,
    doc="Scene-change detection over sampled frames: each frame gets a "
    "16-bit content sketch (stand-in for a perceptual hash — the real "
    "pHash drops into the same column), consecutive frames are "
    "compared by Hamming distance via lag() over the frame timeline, "
    "and a distance >= 6 marks a cut — the shot-boundary primitive a "
    "video curation pipeline runs before frame-dedup and caption "
    "alignment.  Plan: frame fan-out pipelines in the scan, ONE "
    "exchange on doc_id serves both the lag window and the per-doc "
    "rollup.  At 100 TB the sketch column is 2 bytes/frame and the "
    "temporal comparison never shuffles frame payloads — only "
    "(doc_id, idx, sig) triples.",
)
def mm_scene_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions import md5_long

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    payload = MM.attach_binary_payload(docs)
    frames = payload.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(0), (F.col("n_bytes") % 5 + 1) - 1)
        ).alias("frame_idx"),
    ).select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (
            md5_long(F.substring(F.col("text"), F.col("frame_idx") * 113 + 1, 113))
            % 65536
        ).alias("sig"),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    deltas = frames.withColumn("prev_sig", F.lag("sig").over(w))
    cut = F.col("prev_sig").isNotNull() & (
        F.bit_count(F.col("sig").bitwiseXOR(F.col("prev_sig"))) >= 6
    )
    return deltas.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum(F.when(cut, 1).otherwise(0)).cast("bigint").alias("n_scene_changes"),
    )
