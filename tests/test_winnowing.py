"""Pins for winnowing fingerprint selection
(operators/text.py::winnow_fingerprints and the
text_winnowing_fingerprints oracle's identical list program).

House rule: the index arithmetic (rightmost-argmin via
reverse + first-position) is verified against a direct Python
reference in pure math, outside both engines; the Spark tests pin the
guarantee the operator exists for — shared runs >= k + w - 1 words
always share a fingerprint — plus the short-doc edge paths.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

K = 4
W = 8


def _select_positions_formula(hashes: list[int], w: int) -> set[int]:
    """The engine's formula (operators/text.py): encode
    key_i = h_i * 2^B + (2^B - 1 - i); the window MIN of the encoded
    keys is the rightmost minimum hash (equal hashes compare by
    inverted position), and gram_pos decodes as 2^B - (min %% 2^B)."""
    POS_MOD = 1 << 20
    keys = [h * POS_MOD + (POS_MOD - 1 - i) for i, h in enumerate(hashes)]
    m = len(hashes)
    eff_w = min(w, m)
    out = set()
    for p in range(1, m - eff_w + 2):
        mn = min(keys[p - 1 : p - 1 + eff_w])
        out.add(POS_MOD - (mn % POS_MOD))
    return out


def _select_positions_reference(hashes: list[int], w: int) -> set[int]:
    """Textbook robust winnowing: rightmost minimum of each window."""
    m = len(hashes)
    eff_w = min(w, m)
    out = set()
    for p in range(0, m - eff_w + 1):
        win = hashes[p : p + eff_w]
        mn = min(win)
        rightmost = max(i for i, h in enumerate(win) if h == mn)
        out.add(p + rightmost + 1)  # 1-based
    return out


@settings(max_examples=200, deadline=None)
@given(
    hashes=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=60),
    w=st.integers(min_value=1, max_value=12),
)
def test_rightmost_argmin_formula(hashes: list[int], w: int) -> None:
    """reverse + first-position IS rightmost-argmin, off-by-one free,
    including duplicate hash values and the eff_w whole-doc window."""
    assert _select_positions_formula(hashes, w) == _select_positions_reference(
        hashes, w
    )


def _planted_docs(spark):
    # 11 = K + W - 1 shared words => the winnowing guarantee applies.
    shared = " ".join(f"s{i}" for i in range(K + W - 1))
    rows = [
        (1, "alpha beta gamma " + shared + " delta epsilon zeta"),
        (2, shared + " omicron pi rho sigma tau upsilon phi chi"),
        (3, "unrelated words only here nothing shared at all today friend"),
        (4, "tiny doc of five words"),  # 5 words -> 2 grams < W: one window
        (5, "too short"),  # < K words -> zero fingerprints
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_winnowing_guarantee_shared_run(spark):
    """Docs 1 and 2 share an 11-word run: the run contains a full
    W-window of shared 4-gram hashes, so its minimum is selected on
    BOTH sides — at least one common fingerprint, guaranteed; the
    unrelated doc 3 shares none."""
    from kinesis_to_opensearch_lambda_spark.operators.text import winnow_fingerprints

    fps = winnow_fingerprints(_planted_docs(spark), k=K, w=W).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared 11-word run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_winnowing_short_doc_paths(spark):
    """< W grams winnows one whole-doc window (exactly 1 fingerprint);
    < K words yields no rows; positions are in-range and fp equals the
    hash at the selected gram."""
    from kinesis_to_opensearch_lambda_spark.operators.text import winnow_fingerprints

    fps = winnow_fingerprints(_planted_docs(spark), k=K, w=W).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[4]) == 1  # 2 grams -> single eff_w=2 window
    assert 5 not in by_doc  # 2 words -> no 4-grams
    for rows in by_doc.values():
        for r in rows:
            assert r.gram_pos >= 1 and r.fp >= 0


def test_winnowing_density_bound(spark):
    """Selected fingerprints never exceed the window count (one
    selection per window, deduped) — the density contract ~2/(w+1)
    stays bounded above by n_windows."""
    from pyspark.sql import functions as F

    from kinesis_to_opensearch_lambda_spark.operators.text import winnow_fingerprints
    from kinesis_to_opensearch_lambda_spark.sources.batch import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    n_grams = docs.select(
        "doc_id",
        (F.size(F.split("text", " ")) - K + 1).alias("m"),
    ).filter(F.col("m") >= 1)
    counts = (
        winnow_fingerprints(docs, k=K, w=W)
        .groupBy("doc_id")
        .count()
        .join(n_grams, "doc_id")
        .collect()
    )
    assert counts
    for r in counts:
        n_windows = max(r.m - W + 1, 1)
        assert 1 <= r["count"] <= n_windows


def test_oracle_gram_cap_mirrors_engine_guard():
    """The engine raises on docs over 2^20 grams (the encoded-key argmin
    only fits POS_BITS positions; assert_true in text.py).  The DuckDB
    twin must fail IDENTICALLY rather than silently computing (r10
    ADVICE: a one-sided mismatch would misread as an engine bug).  The
    full-CTE path is md5-bound (~minutes for a 1M-gram doc), so pin it
    in two cheap halves: (1) the guard text is present in _SQL_WINNOW,
    (2) the exact CASE/error() form raises in DuckDB on an over-cap
    list and stays lazy on an in-cap one."""
    import duckdb
    import pytest

    import kinesis_to_opensearch_lambda_spark.queries  # noqa: F401 - registration order
    from kinesis_to_opensearch_lambda_spark.operators.text_queries import (
        _SQL_WINNOW,
    )

    cap = 1 << 20
    assert f"len(hashed) > {cap}" in _SQL_WINNOW
    assert "error(" in _SQL_WINNOW

    con = duckdb.connect()
    guard = (
        f"CASE WHEN len(l) > {cap} THEN error('winnow: doc exceeds ' "
        f"|| {cap} || ' grams') ELSE len(l) END"
    )
    with pytest.raises(Exception, match="exceeds 1048576 grams"):
        con.execute(f"SELECT {guard} FROM (SELECT range(1, {cap + 2}) AS l)")
    ok = con.execute(f"SELECT {guard} FROM (SELECT [1, 2, 3] AS l)").fetchone()
    assert ok == (3,)
