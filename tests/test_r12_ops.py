"""Pins for the r12 new operators: Bloom corpus membership
(sketch_bloom_membership), BM25 retrieval (text_bm25_topk), and the
streaming rejection funnel (streaming_quality_funnel)."""

from __future__ import annotations

import duckdb

from kinesis_to_opensearch_lambda_spark.queries import REGISTRY

from .conftest import SF_DIR


def test_bloom_no_false_negatives(spark):
    """The (bloom_hit=false, true_member=true) cell is structurally
    impossible — a Bloom filter never misses a real member.  The
    planted re-keyed copies guarantee the true-member class is
    populated, so this asserts on real rows, not vacuously."""
    rows = REGISTRY["sketch_bloom_membership"].spark(spark, SF_DIR).collect()
    cells = {(r.bloom_hit, r.true_member): r.n_docs for r in rows}
    assert ("false", "true") not in cells, cells
    assert cells.get(("true", "true"), 0) > 0, (
        f"planted members missing from output: {cells}"
    )
    # the true-member count must equal the planted re-keyed copies plus
    # any held-out docs whose text coincides with an existing doc's
    n_planted = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet') "
        "WHERE doc_id % 5 != 0 AND doc_id % 7 = 0"
    ).fetchone()[0]
    n_members = sum(n for (h, m), n in cells.items() if m == "true")
    assert n_members >= n_planted


def test_bloom_fp_rate_bounded(spark):
    """32 bits/doc at k=4 gives a theoretical FP rate ~0.02%; pin a
    loose 2% ceiling so a sizing-rule regression (m no longer scaling
    with n) fails loudly before it saturates at a larger SF."""
    rows = REGISTRY["sketch_bloom_membership"].spark(spark, SF_DIR).collect()
    cells = {(r.bloom_hit, r.true_member): r.n_docs for r in rows}
    fp = cells.get(("true", "false"), 0)
    tn = cells.get(("false", "false"), 0)
    assert fp + tn > 0  # non-member class populated
    assert fp <= 0.02 * (fp + tn), f"false-positive rate too high: {cells}"


def test_bm25_ranks_rare_term_docs_first(spark):
    """'dup' is ~20x rarer than 'merge'/'query' in the corpus, so its
    IDF dominates: every doc containing 'dup' must outrank every doc
    without it in the top-k (score gap >> tf/length variation)."""
    rows = REGISTRY["text_bm25_topk"].spark(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 15
    # ranking is dense, 1-based, and follows (bm25 desc, doc_id)
    ranked = sorted(rows, key=lambda r: r.rnk)
    assert [r.rnk for r in ranked] == list(range(1, len(rows) + 1))
    scores = [r.bm25 for r in ranked]
    assert scores == sorted(scores, reverse=True)
    dup_docs = set(
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet') "
            "WHERE len(list_filter(string_split(text, ' '), x -> x = 'dup')) > 0"
        ).fetchall()
    )
    if dup_docs:
        with_dup = [r.rnk for r in ranked if r.doc_id in dup_docs]
        without = [r.rnk for r in ranked if r.doc_id not in dup_docs]
        if with_dup and without:
            assert max(with_dup) < min(without), (
                "a doc without the rare term outranked one with it"
            )


def test_streaming_funnel_matches_batch_cascade(spark):
    """The streaming funnel's per-reason totals (summed over batches)
    must equal the batch curation_rejection_funnel's counts — same
    cascade expression, so any drift means the streaming path broke."""
    stream_rows = (
        REGISTRY["streaming_quality_funnel"].spark(spark, SF_DIR).collect()
    )
    batch_rows = (
        REGISTRY["curation_rejection_funnel"].spark(spark, SF_DIR).collect()
    )
    stream_by_reason: dict[str, int] = {}
    for r in stream_rows:
        stream_by_reason[r.reason] = stream_by_reason.get(r.reason, 0) + r.n_docs
    batch_by_reason = {r.reason: r.n_docs for r in batch_rows}
    assert stream_by_reason == batch_by_reason
    # each (batch, reason) key appears exactly once in the drained sink
    keys = [(r.batch, r.reason) for r in stream_rows]
    assert len(keys) == len(set(keys))


def test_streaming_ann_probe_finds_originals(spark):
    """Each probe is a tiny polynomial perturbation of a corpus vector
    (cos ~ 0.999), so its best match must be its own original for the
    overwhelming share of probes — hamming-1 multiprobe bounds the LSH
    miss rate to ~5% at this cosine (dedup_embedding_near's bound), so
    pin 90%."""
    from kinesis_to_opensearch_lambda_spark.operators.dedup_queries import (
        SYNTH_ID_OFFSET,
    )

    rows = REGISTRY["streaming_ann_probe"].spark(spark, SF_DIR).collect()
    assert rows
    hits = [r for r in rows if r.best_match == r.dup_id - SYNTH_ID_OFFSET]
    assert len(hits) >= 0.9 * len(rows), (len(hits), len(rows))
    assert all(r.best_cos >= 0.99 for r in hits)
    assert all(r.n_matches >= 1 for r in rows)


def test_chunk_windows_arithmetic(spark):
    """Chunk count and word coverage recomputed in plain Python from
    the raw text must match the operator's integer arithmetic — the
    boundary-off-by-one class the hash signature alone would conflate
    with content drift."""
    import duckdb as _d

    rows = {
        r.doc_id: r
        for r in REGISTRY["corpus_chunk_windows"].spark(spark, SF_DIR).collect()
    }
    texts = _d.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet') "
        "ORDER BY doc_id LIMIT 50"
    ).fetchall()
    size, stride = 32, 24
    for doc_id, text in texts:
        dl = len(text.split(" "))
        n_chunks = 1 if dl <= size else -(-(dl - size) // stride) + 1
        chunk_words = sum(min(dl - i * stride, size) for i in range(n_chunks))
        r = rows[doc_id]
        assert r.n_chunks == n_chunks, (doc_id, dl)
        assert r.chunk_words == chunk_words, (doc_id, dl)
        # the final chunk must reach the end of the document
        assert (n_chunks - 1) * stride + size >= dl


def test_inverted_postings_invariants(spark):
    """Structural pins: df <= cf, the head docs are distinct, and the
    most frequent corpus word's df matches an independent DuckDB
    count."""
    import duckdb as _d

    rows = REGISTRY["text_inverted_postings"].spark(spark, SF_DIR).collect()
    assert rows
    by_term = {r.term: r for r in rows}
    for r in rows:
        assert 1 <= r.df <= r.cf
        assert r.top1_tf >= 1
        heads = [d for d in (r.top1_doc, r.top2_doc, r.top3_doc) if d is not None]
        assert len(heads) == len(set(heads))
        assert len(heads) == min(r.df, 3)
    term, df = _d.sql(
        "SELECT w, count(DISTINCT doc_id) AS df FROM ("
        f"  SELECT doc_id, unnest(string_split(text, ' ')) AS w"
        f"  FROM read_parquet('{SF_DIR}/documents.parquet')"
        ") GROUP BY w ORDER BY df DESC, w LIMIT 1"
    ).fetchone()
    assert by_term[term].df == df
