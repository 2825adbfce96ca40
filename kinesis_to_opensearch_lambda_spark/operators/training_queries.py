"""Training-data curation operators a large-scale LLM pipeline needs
beyond dedup/similarity/text-stats: deterministic dataset splits,
stratified sampling, benchmark decontamination, quality-percentile
filtering, and context-window token packing.

All randomness is hash-derived (md5 of a salted key) so every operator
is reproducible run-to-run, engine-portable (the DuckDB oracle computes
the identical md5), and — critically for 100 TB — embarrassingly
parallel: split/sample decisions are per-row expressions with no
shuffle, and the only exchanges are the final small aggregations.

Reference parity: the reference (lambda_function.py:140-148) has no
curation surface; these are the driver-mandated LLM-data-pipeline
extension (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import SQL_MD5_LONG, md5_long, sql_word_shingles, word_shingles, words
from ..queries import register
from ..sources.batch import fan_out, load_table

# ---- shared: hash-bucket expression (Spark + DuckDB twins) -----------


def _hash_bucket(key: F.Column, salt: str, mod: int) -> F.Column:
    """Deterministic bucket in [0, mod): md5 of the salted key.

    Per-row expression — no shuffle, no RNG state; re-running the
    pipeline on new data never reassigns old rows (the property that
    makes hash splits the standard for training corpora).
    """
    return md5_long(F.concat(key.cast("string"), F.lit(salt))) % mod


def _sql_hash_bucket(key: str, salt: str, mod: int) -> str:
    salted = f"({key})::VARCHAR || '{salt}'"
    return f"({SQL_MD5_LONG.format(x=salted)} % {mod})"


# ---- quality score (mirrors operators.text.quality_features) ---------

_SQL_WORDS = "string_split(text, ' ')"
_SQL_SCORE_I = f"""
  CAST(round((
    0.5 * (1.0 - len(list_filter({_SQL_WORDS}, x -> x = 'the' OR x = 'a'))::DOUBLE
                 / len({_SQL_WORDS})::DOUBLE)
    + 0.3 * (len(list_filter({_SQL_WORDS}, t -> length(t) > 4))::DOUBLE
                 / len({_SQL_WORDS})::DOUBLE)
    + 0.2 * least(len({_SQL_WORDS})::DOUBLE / 200.0, 1.0)
  ) * 1000000) AS BIGINT)
"""


def _score_i() -> F.Column:
    """Blended [0,1] quality score scaled to exact integer millionths.

    Same formula as text.quality_features / the curation_pipeline
    oracle; the integer scaling makes every downstream comparison,
    ranking, and sum order-independent and engine-exact.
    """
    w = words(F.col("text"))
    n = F.size(w).cast("double")
    stop = F.size(F.filter(w, lambda t: (t == "the") | (t == "a"))).cast("double")
    long_ = F.size(F.filter(w, lambda t: F.length(t) > 4)).cast("double")
    score = (
        0.5 * (F.lit(1.0) - stop / n)
        + 0.3 * (long_ / n)
        + 0.2 * F.least(n / F.lit(200.0), F.lit(1.0))
    )
    return F.round(score * 1_000_000).cast("bigint")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fan_out(load_table(spark, sf_dir, "documents"))


# ---- queries ----------------------------------------------------------


@register(
    "split_train_test_hash",
    oracle=f"""
    WITH assigned AS (
      SELECT n_chars,
             {_sql_hash_bucket('doc_id', ':split', 100)} AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY 1
    """,
    doc="Deterministic 80/10/10 train/val/test split: bucket = "
    "md5(doc_id || salt) % 100. Hash-based (not rand()) so membership "
    "is stable under re-runs and appends — the training-corpus "
    "requirement. Per-row expression, zero shuffle before the 3-group "
    "final agg; at 100 TB the split column is computed inline during "
    "the write, never materialized separately.",
)
def split_train_test_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bucket = _hash_bucket(F.col("doc_id"), ":split", 100)
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "sample_stratified_deterministic",
    oracle=f"""
    SELECT lang, count(*) AS n_sampled, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE {_sql_hash_bucket("doc_id::VARCHAR || ':' || lang", ':sample', 1000)}
          < CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 250 ELSE 100 END
    GROUP BY lang
    """,
    doc="Deterministic stratified sampling: per-language keep rates "
    "(en 50%, zh 25%, rest 10%) applied via a salted hash threshold "
    "instead of sampleBy()'s RNG — reproducible across runs/engines "
    "and exactly expressible in the oracle. The language-rebalance "
    "primitive for corpus mixing. Per-row filter, zero shuffle before "
    "the per-lang agg; filter is pushdown-eligible.",
)
def sample_stratified_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    key = F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("lang"))
    rate = (
        F.when(F.col("lang") == "en", 500)
        .when(F.col("lang") == "zh", 250)
        .otherwise(100)
    )
    return (
        docs.filter(_hash_bucket(key, ":sample", 1000) < rate)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "decontam_ngram_overlap",
    oracle=f"""
    WITH bench AS (
      SELECT doc_id + 1000000000000 AS doc_id,
             array_to_string((string_split(text, ' '))[2:], ' ') AS text
      FROM documents WHERE doc_id < 50
    ), bench_shingles AS (
      SELECT DISTINCT
             unnest({sql_word_shingles("string_split(text, ' ')")}) AS shingle
      FROM bench
    ), train_lists AS (
      -- materialize the shingle list ONCE per row: DuckDB does not CSE
      -- the repeated list_transform between unnest() and len() in one
      -- SELECT, and the duplicated evaluation turned this oracle
      -- quadratic-ish at sf1 (>550s; this form is 11s)
      SELECT doc_id, {sql_word_shingles(_SQL_WORDS)} AS shingles
      FROM documents
    ), train_shingles AS (
      SELECT doc_id,
             unnest(shingles) AS shingle,
             len(shingles) AS n_shingles
      FROM train_lists
    )
    SELECT doc_id,
           count(DISTINCT t.shingle) AS n_matched,
           any_value(n_shingles) AS n_shingles,
           round(count(DISTINCT t.shingle) / any_value(n_shingles)::DOUBLE, 4)
             AS contamination
    FROM train_shingles t
    JOIN bench_shingles b ON t.shingle = b.shingle
    GROUP BY doc_id
    HAVING count(DISTINCT t.shingle) >= 3
    """,
    doc="Benchmark decontamination: flag training documents sharing >= 3 "
    "distinct 3-gram shingles with a held-out benchmark set (here a "
    "deterministic drop-first-word mutation of docs 0-49, the same "
    "synthetic near-dup corpus the dedup family uses). The benchmark "
    "shingle set is DISTINCT-ed and broadcast — real benchmarks are "
    "thousands of docs, so at 100 TB the train side stays shuffle-free "
    "until the per-doc match count (one exchange on doc_id). Shingles "
    "compare as strings; the contamination ratio is int/int, exact.",
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    w = words(F.col("text"))
    bench = docs.filter(F.col("doc_id") < 50).select(
        F.explode(
            word_shingles(F.slice(w, 2, F.size(w) - 1))
        ).alias("b_shingle")
    ).distinct()
    # Materialize the words array ONCE before shingling.  Two optimizer
    # behaviors otherwise multiply the expensive part (split of the
    # full text) per row: InferFiltersFromGenerate duplicates the
    # entire generator expression into a `size(...) > 0` pre-filter,
    # and every element_at inside the transform lambda re-evaluates
    # its argument (lambda variables defeat codegen subexpression
    # elimination) — the optimized plan carried 25 split() calls and
    # this query spent 148s of its 153s at sf1 re-splitting text.
    # With `w` a materialized column the duplicated expressions are
    # O(shingles) concats, not O(shingles) re-splits; CollapseProject
    # keeps the projection because `w` is referenced many times and
    # split is not a cheap expression.  sf1: 153s -> 13s.
    wordsd = docs.select("doc_id", w.alias("w"))
    lists = wordsd.select(
        "doc_id", word_shingles(F.col("w")).alias("shingles")
    ).select("doc_id", "shingles", F.size("shingles").alias("n_shingles"))
    train = lists.select(
        "doc_id",
        F.explode("shingles").alias("shingle"),
        "n_shingles",
    )
    return (
        train.join(F.broadcast(bench), train.shingle == bench.b_shingle)
        .groupBy("doc_id")
        .agg(
            F.count_distinct("shingle").alias("n_matched"),
            F.any_value("n_shingles").alias("n_shingles"),
            F.round(
                F.count_distinct("shingle")
                / F.any_value("n_shingles").cast("double"),
                4,
            ).alias("contamination"),
        )
        .filter(F.col("n_matched") >= 3)
    )


@register(
    "quality_percentile_filter",
    oracle=f"""
    WITH scored AS (
      SELECT lang, {_SQL_SCORE_I} AS score_i FROM documents
    ), ranked AS (
      SELECT lang, score_i,
             percent_rank() OVER (ORDER BY score_i) AS pr
      FROM scored
    )
    SELECT lang, count(*) AS n_kept,
           round(sum(score_i) / 1000000.0 / count(*), 4) AS avg_score
    FROM ranked WHERE pr >= 0.25
    GROUP BY lang
    """,
    doc="Corpus-relative quality filtering: drop the bottom quartile by "
    "blended quality score, then report the surviving per-language mix "
    "— the standard quality-threshold pass before training. Scores are "
    "exact integer millionths so ranking and averages are "
    "order-independent.  The oracle states the spec as a corpus-wide "
    "percent_rank, but the engine NEVER sorts the corpus globally "
    "(the r5 WARN-site audit found this was the one remaining "
    "unbounded global window): percent_rank >= 0.25 with min-rank tie "
    "semantics is exactly `4*(rows with smaller score) >= n-1` — "
    "dyadic, so integer-exact — and rows-with-smaller-score is "
    "monotone in score, so the filter is a score THRESHOLD derived "
    "from the bounded per-score dictionary (groupBy score_i + "
    "cumulative window over distinct scores, the quality_ks_two_sample "
    "pattern), broadcast back as a scalar.  At 100 TB the dictionary "
    "aggregate is map-side combinable and the only global window runs "
    "over |distinct scores| rows, not |docs|.",
)
def quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _docs(spark, sf_dir).select("lang", _score_i().alias("score_i"))
    dist = scored.groupBy("score_i").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("score_i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    # cum_lt = rank()-1 for every row carrying this score value
    cum = dist.select(
        "score_i",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_lt"),
        F.sum("cnt").over(wall).alias("n"),
    )
    # n > 1 guards the degenerate single-document corpus (r6 ADVICE):
    # percent_rank of the only row is 0.0 (dropped by >= 0.25) but
    # 4*cum_lt >= n-1 is 0 >= 0 (kept) — with the guard the threshold
    # set is empty and the broadcast join keeps nothing, matching the
    # oracle exactly; the dyadic identity is unchanged for n > 1.
    thr = cum.filter(
        (4 * F.col("cum_lt") >= F.col("n") - 1) & (F.col("n") > 1)
    ).agg(F.min("score_i").alias("thr"))
    return (
        scored.join(F.broadcast(thr))
        .filter(F.col("score_i") >= F.col("thr"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(F.sum("score_i") / 1_000_000.0 / F.count("*"), 4).alias(
                "avg_score"
            ),
        )
    )


@register(
    "token_budget_pack",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             {_sql_hash_bucket('doc_id', ':shard', 8)} AS shard,
             len({_SQL_WORDS}) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT shard, n_tokens,
             CAST(COALESCE(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) // 2048 AS bin
      FROM toks
    )
    SELECT shard, bin, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM packed GROUP BY shard, bin
    """,
    doc="Context-window packing: assign documents to 2048-token bins by "
    "exclusive running token count, sharded 8 ways by doc-id hash so "
    "the running sum is a PARTITIONED window — the trick that keeps "
    "sequence packing distributed at 100 TB (a global ORDER BY window "
    "would serialize on one task; per-shard packing loses nothing "
    "because bins never span shards). Integer token counts -> exact.",
)
def token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _docs(spark, sf_dir).select(
        "doc_id",
        _hash_bucket(F.col("doc_id"), ":shard", 8).alias("shard"),
        F.size(words(F.col("text"))).alias("n_tokens"),
    )
    win = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.select(
        "shard",
        "n_tokens",
        F.floor(F.coalesce(F.sum("n_tokens").over(win), F.lit(0)) / 2048).alias(
            "bin"
        ),
    )
    return packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )


_SOURCE_CAP = 15


@register(
    "curation_source_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(doc_id::VARCHAR || ':cap'), doc_id
             ) AS rk
      FROM documents
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN rk <= {_SOURCE_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN rk > {_SOURCE_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped
    FROM ranked GROUP BY source
    """,
    doc="Per-source document cap (the per-domain/host page cap every "
    "web-scale curation pipeline applies, C4/CCNet-style): rank docs "
    "within each source by a deterministic hash order (md5, not rand() "
    "— reproducible and engine-portable) and keep the first "
    f"{_SOURCE_CAP}. The window is PARTITIONED by source, so at 100 TB "
    "this is one shuffle on the source key with per-partition sorts — "
    "no global order, and skewed mega-sources sort locally.",
)
def curation_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("source", "doc_id")
    order = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":cap")))
    w = Window.partitionBy("source").orderBy(order, "doc_id")
    ranked = docs.select("source", F.row_number().over(w).alias("rk"))
    return ranked.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("rk") <= _SOURCE_CAP, 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(F.col("rk") > _SOURCE_CAP, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dropped"),
    )


@register(
    "corpus_mixture_weights",
    oracle=f"""
    WITH per_source AS (
      SELECT source, CAST(sum(len({_SQL_WORDS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), scaled AS (
      SELECT source, n_tokens,
             CAST(round(sqrt(n_tokens::DOUBLE) * 1000000) AS BIGINT) AS sq_i
      FROM per_source
    ), z AS (
      SELECT CAST(sum(sq_i) AS BIGINT) AS z FROM scaled
    )
    SELECT source, n_tokens,
           round(sq_i::DOUBLE / z::DOUBLE, 6) AS weight
    FROM scaled, z
    """,
    doc="Temperature-scaled corpus mixture weights (alpha = 0.5): per-"
    "source token totals t_s -> sampling weight sqrt(t_s) / Z — the "
    "standard up/down-sampling rebalance when composing a training mix "
    "from skewed sources. The per-source sqrt is scaled to exact "
    "integer millionths BEFORE the normalizer sum, so Z is an integer "
    "and the result is engine-exact regardless of summation order. "
    "Shape at 100 TB: map-side-combine token agg (one shuffle on "
    "source), then a broadcast 1-row normalizer — no second pass over "
    "the corpus.",
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_source = (
        _docs(spark, sf_dir)
        .select("source", F.size(words(F.col("text"))).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").cast("bigint").alias("n_tokens"))
    )
    scaled = per_source.withColumn(
        "sq_i",
        F.round(F.sqrt(F.col("n_tokens").cast("double")) * 1_000_000).cast("bigint"),
    )
    z = scaled.agg(F.sum("sq_i").cast("bigint").alias("z"))
    return scaled.crossJoin(F.broadcast(z)).select(
        "source",
        "n_tokens",
        F.round(F.col("sq_i").cast("double") / F.col("z").cast("double"), 6).alias(
            "weight"
        ),
    )


# --- CCNet-style perplexity bucketing + mixture sampling ---------------

# Bucket thresholds in bits-per-token.  CCNet (Wenzek et al. 2020)
# derives these from a held-out reference model/corpus and ships them as
# constants — which is exactly what keeps the operator scale-free: the
# bucket decision is a per-row comparison, no global percentile pass
# over 100 TB at run time.
_PPL_HEAD_MAX = 4.905
_PPL_MID_MAX = 4.915
# Per-bucket keep rates for the training mixture (head kept whole,
# middle half, tail decimated), applied via the same deterministic
# md5 sampling used by split_train_test_hash.
_PPL_RATES = {"head": 100, "middle": 50, "tail": 10}
_PPL_SALT = "ppl-v1"

# text_queries registers before training_queries (queries.py import order),
# so its oracle SQL is available for composition here.
from ..queries import REGISTRY as _REGISTRY  # noqa: E402

_TEXT_REGISTRY_UNIGRAM_ORACLE = _REGISTRY["text_unigram_logprob"].oracle


@register(
    "curation_perplexity_buckets",
    oracle=f"""
    WITH bpt AS (
      {{unigram}}
    ), bucketed AS (
      SELECT doc_id, n_tokens, bits_per_token,
             CASE WHEN bits_per_token < {_PPL_HEAD_MAX} THEN 'head'
                  WHEN bits_per_token < {_PPL_MID_MAX} THEN 'middle'
                  ELSE 'tail' END AS bucket,
             CAST(round(bits_per_token * 1000000) AS BIGINT) AS bpt_i,
             {{hash_bucket}} AS h
      FROM bpt
    )
    SELECT bucket,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN (CASE bucket WHEN 'head' THEN {_PPL_RATES["head"]}
                               WHEN 'middle' THEN {_PPL_RATES["middle"]}
                               ELSE {_PPL_RATES["tail"]} END) > h
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN (CASE bucket WHEN 'head' THEN {_PPL_RATES["head"]}
                               WHEN 'middle' THEN {_PPL_RATES["middle"]}
                               ELSE {_PPL_RATES["tail"]} END) > h
                    THEN n_tokens ELSE 0 END) AS BIGINT) AS n_tokens_kept,
           round(sum(bpt_i)::DOUBLE / count(*)::DOUBLE / 1000000.0, 6) AS avg_bpt
    FROM bucketed
    GROUP BY bucket
    """.format(
        unigram=_TEXT_REGISTRY_UNIGRAM_ORACLE,
        hash_bucket=_sql_hash_bucket("doc_id", _PPL_SALT, 100),
    ),
    doc="CCNet-style perplexity bucketing + mixture sampling (Wenzek et "
    "al. 2020): unigram bits-per-token (text_unigram_logprob) buckets "
    "every document into head/middle/tail against fixed precomputed "
    "thresholds, then a deterministic md5 sample keeps 100%/50%/10% "
    "per bucket — the standard quality-mixture knob for web-scale "
    "pretraining corpora.  Per-row decisions only (threshold compare + "
    "hash), so the curation pass adds zero shuffles beyond the scoring "
    "aggregation; avg bits-per-token is summed as exact integer "
    "micro-bits so the report is independent of summation order.",
)
def curation_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text_queries import text_unigram_logprob

    bpt = text_unigram_logprob(spark, sf_dir)
    rate = (
        F.when(F.col("bucket") == "head", F.lit(_PPL_RATES["head"]))
        .when(F.col("bucket") == "middle", F.lit(_PPL_RATES["middle"]))
        .otherwise(F.lit(_PPL_RATES["tail"]))
    )
    bucketed = bpt.select(
        "doc_id",
        "n_tokens",
        F.when(F.col("bits_per_token") < _PPL_HEAD_MAX, "head")
        .when(F.col("bits_per_token") < _PPL_MID_MAX, "middle")
        .otherwise("tail")
        .alias("bucket"),
        F.round(F.col("bits_per_token") * 1_000_000)
        .cast("bigint")
        .alias("bpt_i"),
        _hash_bucket(F.col("doc_id"), _PPL_SALT, 100).alias("h"),
    )
    kept = rate > F.col("h")
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("n_tokens_kept"),
        F.round(
            F.sum("bpt_i").cast("double") / F.count(F.lit(1)).cast("double") / 1e6, 6
        ).alias("avg_bpt"),
    )


@register(
    "sample_bottom_k_per_key",
    oracle=f"""
    SELECT event_type, event_id, CAST(rn AS BIGINT) AS sample_rank
    FROM (
      SELECT event_type, event_id,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY {SQL_MD5_LONG.format(x="event_id::VARCHAR || ':bk'")}, event_id
             ) AS rn
      FROM events
    ) WHERE rn <= 10
    """,
    doc="Per-key uniform sample of k=10 rows via the bottom-k (KMV) "
    "technique: rank rows inside each key by a salted md5 of their id "
    "and keep the k smallest.  This is the DISTRIBUTED, MERGEABLE "
    "replacement for driver-side reservoir sampling — bottom-k sets "
    "from disjoint partitions merge by just re-taking the k smallest, "
    "so map-side partial limits apply: Spark plans a WindowGroupLimit "
    "Partial below the key exchange (SPARK-37099) and each task "
    "forwards at most k rows per key, never the full key group.  "
    "Deterministic (salted-hash order, id tiebreak) hence engine-"
    "portable and reproducible across reruns — the property that "
    "makes the sample auditable in a training-data pipeline.",
)
def sample_bottom_k_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf_dir, "events"))
    h = md5_long(F.concat(F.col("event_id").cast("string"), F.lit(":bk")))
    w = Window.partitionBy("event_type").orderBy(h, "event_id")
    return (
        ev.select("event_type", "event_id", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= 10)
        .select("event_type", "event_id", F.col("sample_rank").cast("bigint"))
    )


@register(
    "sample_weighted_bernoulli",
    oracle=f"""
    WITH kept AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      WHERE {SQL_MD5_LONG.format(x="o_orderkey::VARCHAR || ':wb'")} % 1000000
            < least(CAST(round(o_totalprice * 100) AS BIGINT) / 100, 1000000)
    )
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(sum(cents) AS BIGINT) AS sampled_cents
    FROM kept GROUP BY o_orderpriority
    """,
    doc="Weighted Bernoulli sampling: each order's inclusion "
    "probability is proportional to its value (min(cents/100, 1e6) "
    "out of 1e6), decided by a salted md5 threshold — all-integer "
    "arithmetic, so the oracle reproduces the exact sample.  The "
    "size-biased sampling primitive behind importance-weighted "
    "corpus subsets (sample big documents proportionally to token "
    "count); per-row filter with zero shuffle before the per-group "
    "rollup, embarrassingly parallel at any scale, and re-running "
    "on appended data never reassigns old rows (hash, not RNG).",
)
def sample_weighted_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 fan_out audit: one md5 per row then a ~5-group aggregate — the
    # map-side partial agg rides the scan and the widening shuffle
    # measured pure overhead (A/B 0.48->0.36s at sf0.1,
    # sweeps/FANOUT_AB_r13.json).  Contrast sample_poisson_bootstrap
    # below, where the 20x explode makes fan_out a 3.5x WIN — the dial
    # is per-row work downstream of the scan, and these two entries are
    # its measured endpoints.
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    h = md5_long(F.concat(F.col("o_orderkey").cast("string"), F.lit(":wb")))
    kept = orders.filter(
        (h % 1000000) < F.least(cents / 100, F.lit(1000000))
    ).select("o_orderpriority", cents.alias("cents"))
    return kept.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.sum("cents").cast("bigint").alias("sampled_cents"),
    )


@register(
    "split_leakage_safe_groups",
    oracle=f"""
    WITH g AS (
      SELECT md5(substr(text, 1, 64)) AS gk, n_chars,
             {_sql_hash_bucket("md5(substr(text, 1, 64))", ':gsplit', 100)}
               AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 90 THEN 'train' ELSE 'test' END AS split,
           CAST(count(DISTINCT gk) AS BIGINT) AS n_groups,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM g GROUP BY 1
    """,
    doc="Leakage-safe train/test split: the split is assigned from a "
    "hash of the DUPLICATE-GROUP key (here the 64-char prefix blocking "
    "key; in production the connected-component id from "
    "dedup_duplicate_clusters), not the document id — so near-duplicate "
    "documents can never straddle the train/test boundary, the "
    "contamination mode a doc-id hash split (split_train_test_hash) "
    "cannot prevent.  Because the group key is CONTENT-derived, the "
    "assignment stays a per-row expression: no join against a group "
    "table, no shuffle before the final 2-group agg — group-consistent "
    "by construction since every member hashes the same prefix to the "
    "same bucket.  At 100 TB this is computed inline during the corpus "
    "write, exactly like the doc-id split.",
)
def split_leakage_safe_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    gk = F.md5(F.substring(F.col("text"), 1, 64))
    bucket = _hash_bucket(gk, ":gsplit", 100)
    split = F.when(bucket < 90, "train").otherwise("test")
    return (
        docs.select(split.alias("split"), gk.alias("gk"), "n_chars")
        .groupBy("split")
        .agg(
            F.count_distinct("gk").cast("bigint").alias("n_groups"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


_POISSON1_CUTS_2POW60 = [
    424136118829305329,   # P(X<=0)
    848272237658610659,   # P(X<=1)
    1060340297073263324,  # P(X<=2)
    1131029650211480879,  # P(X<=3)
    1148701988496035267,  # P(X<=4)
]


@register(
    "sample_poisson_bootstrap",
    oracle=f"""
    WITH reps AS (
      SELECT e.event_type,
             CAST(round(e.value * 100) AS BIGINT) AS cents,
             b.b,
             {SQL_MD5_LONG.format(x="e.event_id::VARCHAR || ':boot' || b.b::VARCHAR")} AS h
      FROM events e, (SELECT unnest(range(20)) AS b) b
    ), weighted AS (
      SELECT event_type, b,
             CASE WHEN h < {_POISSON1_CUTS_2POW60[0]} THEN 0
                  WHEN h < {_POISSON1_CUTS_2POW60[1]} THEN 1
                  WHEN h < {_POISSON1_CUTS_2POW60[2]} THEN 2
                  WHEN h < {_POISSON1_CUTS_2POW60[3]} THEN 3
                  WHEN h < {_POISSON1_CUTS_2POW60[4]} THEN 4
                  ELSE 5 END AS w,
             cents
      FROM reps
    ), means AS (
      SELECT event_type, b,
             round(sum(w * cents)::DOUBLE / sum(w)::DOUBLE, 4) AS boot_mean
      FROM weighted GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_replicates,
           round(min(boot_mean), 4) AS boot_cents_min,
           round(max(boot_mean), 4) AS boot_cents_max
    FROM means GROUP BY 1
    """,
    doc="Deterministic Poisson bootstrap (the online-bootstrap of "
    "Oza/Russell, the standard way to bootstrap a dataset too large "
    "to resample by index): each of 20 replicates gives every row a "
    "Poisson(1) weight drawn by inverting the exact CDF against a "
    "60-bit md5 hash of (row id, replicate) — integer threshold "
    "comparisons against 2^60-scaled cutoffs, zero floating point, so "
    "both engines produce the identical resample.  Replicate means "
    "use exact integer weighted sums (one double division at the "
    "end); the replicate-spread summary uses only min/max, which are "
    "summation-order-independent.  Per-row expressions + two "
    "aggregations — embarrassingly parallel, no RNG state, stable "
    "under re-runs and appends like every sampler in this module.  "
    "The uncertainty-quantification primitive for metric CIs over a "
    "100 TB corpus.",
)
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf_dir, "events"))
    B = 20
    rows = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.col("event_id"),
        F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("b"),
    )
    h = md5_long(
        F.concat(
            F.col("event_id").cast("string"), F.lit(":boot"), F.col("b").cast("string")
        )
    )
    w = (
        F.when(h < _POISSON1_CUTS_2POW60[0], 0)
        .when(h < _POISSON1_CUTS_2POW60[1], 1)
        .when(h < _POISSON1_CUTS_2POW60[2], 2)
        .when(h < _POISSON1_CUTS_2POW60[3], 3)
        .when(h < _POISSON1_CUTS_2POW60[4], 4)
        .otherwise(5)
    )
    means = (
        rows.select("event_type", "b", w.alias("w"), "cents")
        .groupBy("event_type", "b")
        .agg(
            F.round(
                F.sum(F.col("w") * F.col("cents")).cast("double")
                / F.sum("w").cast("double"),
                4,
            ).alias("boot_mean")
        )
    )
    return means.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_replicates"),
        F.round(F.min("boot_mean"), 4).alias("boot_cents_min"),
        F.round(F.max("boot_mean"), 4).alias("boot_cents_max"),
    )


@register(
    "curation_rejection_funnel",
    oracle=f"""
    WITH tagged AS (
      SELECT CASE
               WHEN lang NOT IN ('en', 'zh') THEN '1_lang_other'
               WHEN len({_SQL_WORDS}) < 50 THEN '2_too_short'
               WHEN {_SQL_SCORE_I} < 500000 THEN '3_low_quality'
               ELSE '4_kept'
             END AS reason,
             n_chars
      FROM documents
    ), tot AS (SELECT count(*) AS n FROM tagged)
    SELECT reason,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST((count(*) * 1000000) // max(tot.n) AS BIGINT) AS share_ppm
    FROM tagged, tot
    GROUP BY reason
    """,
    doc="Rejection-funnel attribution: every document is charged to "
    "the FIRST filter that rejects it (language allowlist -> length "
    "floor -> quality floor, the standard curation cascade order), so "
    "the report decomposes corpus loss by cause without "
    "double-counting — the observability any production filter "
    "cascade needs before anyone tightens a threshold.  First-match "
    "semantics is a single CASE expression per row (filters share the "
    "one scan; adding a filter adds zero passes); shares are integer "
    "parts-per-million.  Reuses the exact quality-score expression "
    "from curation_pipeline so both engines agree bit-for-bit.",
)
def curation_rejection_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    w = words(F.col("text"))
    reason = (
        F.when(~F.col("lang").isin("en", "zh"), "1_lang_other")
        .when(F.size(w) < 50, "2_too_short")
        .when(_score_i() < 500_000, "3_low_quality")
        .otherwise("4_kept")
    )
    tagged = docs.select(reason.alias("reason"), "n_chars")
    tot = tagged.select(F.count(F.lit(1)).alias("n"))
    return (
        tagged.groupBy("reason")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "reason",
            "n_docs",
            "total_chars",
            F.expr("(n_docs * 1000000) div n").cast("bigint").alias("share_ppm"),
        )
    )
