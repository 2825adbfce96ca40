"""Pins for the r8 Manku-style windowed simhash pairing
(operators/dedup.py::simhash_near_pairs and the dedup_simhash_near
oracle's identical SQL rule).

The chunked rank join is pure integer arithmetic with an off-by-one
hazard at every boundary, so the identity it implements is verified in
pure Python (house rule: closed-form identities are checked outside
both engines):

    chunk(r) = (r - 1) div W;  the join emits (a, b) iff
    b.chunk in {a.chunk, a.chunk + 1} and 1 <= b.rn - a.rn <= W

    == the intended rule:  1 <= b.rn - a.rn <= W   (for ALL pairs)

i.e. probing only two chunks loses nothing and adds nothing.

The Spark test pins the fix's reason for existing: a pathological
bucket of IDENTICAL fingerprints (the sf10 shape — 25,761 members in
one 15-bit band bucket) must produce at most W pairs per member and
complete without materializing C(n, 2) structs in one row."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

W = 256  # keep in sync with simhash_near_pairs(window=256) and the oracle


def _window_pairs_direct(n: int, w: int) -> set[tuple[int, int]]:
    return {(i, j) for i in range(1, n + 1) for j in range(i + 1, min(i + w, n) + 1)}


def _window_pairs_chunked(n: int, w: int) -> set[tuple[int, int]]:
    chunk = lambda r: (r - 1) // w
    out = set()
    for a in range(1, n + 1):
        for probe in (chunk(a), chunk(a) + 1):
            for b in range(1, n + 1):
                if chunk(b) == probe and 1 <= b - a <= w:
                    out.add((a, b))
    return out


@settings(max_examples=60, deadline=None)
@given(n=st.integers(min_value=0, max_value=300), w=st.integers(min_value=1, max_value=70))
def test_chunked_probe_equals_direct_window(n: int, w: int) -> None:
    """Two-chunk probing is exactly the W-window rule — no boundary pair
    lost (a successor within W rows is always in chunk or chunk+1) and
    none invented (the rank filter is still applied)."""
    assert _window_pairs_chunked(n, w) == _window_pairs_direct(n, w)


def test_identical_fingerprint_bucket_is_bounded(spark):
    """The sf10 failure shape: one band bucket holding the whole input
    (identical fingerprints collide in EVERY band).  The windowed join
    must return exactly the within-W pairs — n*W - W*(W+1)/2 of them —
    instead of C(n,2), and run without a single wide row."""
    from pyspark.sql import functions as F

    from kinesis_to_opensearch_lambda_spark.operators.dedup import (
        simhash_near_pairs,
    )

    n = 1000
    fp = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(12345).cast("long").alias("simhash")
    )
    pairs = simhash_near_pairs(fp, band_bits=15, hamming_max=3, window=W)
    got = pairs.count()
    # every pair is hamming 0; rank order within the single bucket is by
    # (sh, id) = by id, so the windowed rule keeps exactly j - i <= W
    expected = n * W - W * (W + 1) // 2
    assert got == expected
    assert pairs.filter(F.col("hamming") != 0).count() == 0


def test_window_none_is_exhaustive_and_a_superset(spark):
    """window=None (r8 ADVICE: restore the pre-r8 exhaustive contract
    for small corpora) must return EVERY within-bucket pair — C(n,2)
    on an identical-fingerprint bucket — and be a superset of any
    windowed run on the same input."""
    from pyspark.sql import functions as F

    from kinesis_to_opensearch_lambda_spark.operators.dedup import (
        simhash_near_pairs,
    )

    n = 120
    fp = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(777).cast("long").alias("simhash")
    )
    full = simhash_near_pairs(fp, band_bits=15, hamming_max=3, window=None)
    assert full.count() == n * (n - 1) // 2
    windowed = simhash_near_pairs(fp, band_bits=15, hamming_max=3, window=16)
    got_w = {(r.doc_a, r.doc_b) for r in windowed.collect()}
    got_f = {(r.doc_a, r.doc_b) for r in full.collect()}
    assert got_w <= got_f and len(got_w) == n * 16 - 16 * 17 // 2


def _window_recall_on_planted(spark, sf_dir: str) -> tuple[int, int]:
    """(planted pairs with hamming<=3, windowed pairs found) — the
    denominator is computed DIRECTLY (one O(n) id-offset join on the
    fingerprints), no LSH, so it is exact ground truth."""
    from pyspark.sql import functions as F

    import kinesis_to_opensearch_lambda_spark.queries  # noqa: F401 - break the
    # operators circular import (dedup_queries <-> similarity_queries) by
    # letting the package module drive the import order
    from kinesis_to_opensearch_lambda_spark.operators import dedup as D
    from kinesis_to_opensearch_lambda_spark.operators.dedup_queries import (
        SYNTH_ID_OFFSET,
        _corpus,
    )

    fp = D.simhash60(_corpus(spark, sf_dir)).select("doc_id", "simhash")
    o, m = fp.alias("o"), fp.alias("m")
    planted = (
        o.join(m, F.col("m.doc_id") == F.col("o.doc_id") + F.lit(SYNTH_ID_OFFSET))
        .select(
            F.bit_count(F.col("o.simhash").bitwiseXOR(F.col("m.simhash"))).alias("h")
        )
        .filter(F.col("h") <= 3)
        .count()
    )
    found = (
        D.simhash_near_pairs(fp, band_bits=15, hamming_max=3)
        .filter(F.col("doc_b") - F.col("doc_a") == SYNTH_ID_OFFSET)
        .count()
    )
    return planted, found


# W=256 recall floor (r8 verdict task 6): the window is a recall dial,
# and the measured curve (sweeps/SIMHASH_WINDOW_RECALL_r08.json) is
# data-dependent — a future corpus/data shift that degrades windowed
# recall on the planted-mutation set must fail LOUDLY here instead of
# silently keeping more duplicates.  Measured r9: 43/43 = 1.0 at both
# sf0.1 and sf1 (buckets only get crowded enough to cost recall at
# sf10, where the measured figure is 0.93); floor 0.9 leaves margin
# for benign drift while still catching a real degradation.
RECALL_FLOOR = 0.9


def test_window_recall_floor_sf01(spark):
    planted, found = _window_recall_on_planted(spark, "/root/testdata/sf0.1")
    assert planted > 0
    assert found / planted >= RECALL_FLOOR, (planted, found)


def test_window_recall_floor_sf1(spark):
    import os

    import pytest

    sf1 = "/root/repo/.scratch/sf1"
    if not os.path.isdir(sf1):
        pytest.skip(
            "sf1 scratch tiling not generated (python tools/gen_sf.py 10 .scratch/sf1)"
        )
    planted, found = _window_recall_on_planted(spark, sf1)
    assert planted > 0
    assert found / planted >= RECALL_FLOOR, (planted, found)


def test_connected_components_rejects_nonpositive_max_iter(spark):
    """max_iter < 1 must raise ValueError up front (r8 ADVICE: the
    for/else previously dereferenced a never-bound `obs` -> NameError)."""
    import pytest
    from pyspark.sql import functions as F

    from kinesis_to_opensearch_lambda_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.range(1).select(
        F.lit(1).alias("doc_a"), F.lit(2).alias("doc_b")
    )
    with pytest.raises(ValueError, match="max_iter"):
        connected_components(pairs, max_iter=0)


def test_knn_graph_mutual_rejects_nonpositive_n_tables(spark):
    """knn_graph_mutual(n_tables<1) must fail fast, mirroring the
    connected_components max_iter guard."""
    import pytest

    import kinesis_to_opensearch_lambda_spark.queries  # noqa: F401
    from kinesis_to_opensearch_lambda_spark.operators.similarity_queries import (
        knn_graph_mutual,
    )

    with pytest.raises(ValueError, match="n_tables"):
        knn_graph_mutual(spark, "/root/testdata/sf0.001", n_tables=0)


def test_simhash_near_pairs_rejects_nonpositive_window(spark):
    """window < 1 must fail fast: -k silently returned zero pairs and 0
    died with a deep ANSI divide-by-zero (r9 self-review find)."""
    import pytest
    from pyspark.sql import functions as F

    from kinesis_to_opensearch_lambda_spark.operators.dedup import (
        simhash_near_pairs,
    )

    fp = spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit(1).cast("long").alias("simhash")
    )
    for w in (0, -5):
        with pytest.raises(ValueError, match="window"):
            simhash_near_pairs(fp, window=w)


def test_exhaustive_bucket_cap_guard(spark):
    """window=None is quadratic in the largest band bucket; the r9
    ADVICE hardening demands an early, explainable failure instead of
    an unbounded join.  The guard is plan-side (assert_true over the
    bucket-size window max): over-cap buckets kill the job with the
    cap named in the message; under-cap corpora run exhaustively."""
    import pytest
    from pyspark.sql import functions as F

    from kinesis_to_opensearch_lambda_spark.operators.dedup import (
        simhash_near_pairs,
    )

    # 8 identical fingerprints -> every band bucket has 8 members.
    fp = spark.range(8).select(
        F.col("id").alias("doc_id"), F.lit(7).cast("long").alias("simhash")
    )
    with pytest.raises(Exception, match="exhaustive_bucket_cap=4"):
        simhash_near_pairs(
            fp, band_bits=15, window=None, exhaustive_bucket_cap=4
        ).count()
    # Cap at the bucket size: all C(8,2)=28 hamming-0 pairs survive.
    ok = simhash_near_pairs(
        fp, band_bits=15, window=None, exhaustive_bucket_cap=8
    )
    assert ok.count() == 28


def test_packed_counter_fold_matches_per_bit_reference(spark):
    """r13 rewrote simhash_bits' n_bits per-bit sign folds as packed
    21-bit counter folds (3 bit positions per 64-bit accumulator).  Pin
    the rewrite to the original semantics: an independent per-bit
    formulation (count ones at bit b; set iff 2*count > n_tokens, the
    exact sign rule) must agree on every fingerprint — including docs
    with repeated tokens, a single token, and bit-count ties (the
    strict > boundary)."""
    from pyspark.sql import functions as F

    from kinesis_to_opensearch_lambda_spark.functions import md5_long
    from kinesis_to_opensearch_lambda_spark.operators.dedup import (
        simhash_bits,
        words,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha alpha alpha beta"),  # repeated tokens
            (3, "solo"),  # n=1: every bit is the token's bit
            (4, "x y"),  # n=2: ties (count=1) must NOT set the bit
            (5, "the quick brown fox jumps over the lazy dog again"),
        ],
        "doc_id int, text string",
    )
    for n_bits in (16, 60):
        got = {
            r["doc_id"]: r["simhash"]
            for r in simhash_bits(docs, n_bits).select("doc_id", "simhash").collect()
        }
        hs = F.transform(words(F.col("text")), lambda w: md5_long(w))

        def _cnt(b: int):
            # strictly two-parameter merge lambda via a factory (the
            # default-arg form is read as a 3-arg (acc, elem, index)
            # lambda by PySpark's HOF binding)
            return lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(
                F.lit(1)
            ).cast("int")

        ref_df = docs.select(
            "doc_id",
            F.size(hs).alias("n"),
            *[
                F.aggregate(hs, F.lit(0), _cnt(b)).alias(f"c{b}")
                for b in range(n_bits)
            ],
        ).collect()
        for r in ref_df:
            ref = sum(
                (1 << b) for b in range(n_bits) if 2 * r[f"c{b}"] > r["n"]
            )
            assert got[r["doc_id"]] == ref, (n_bits, r["doc_id"])
