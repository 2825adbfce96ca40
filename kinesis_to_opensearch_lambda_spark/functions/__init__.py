"""Engine scalar-function library.

Helpers shared by the dedup / similarity / text operators.  Two design
rules make these safe at 100 TB AND verifiable against the DuckDB
oracle:

1. **JVM-side only** — everything composes built-in Spark SQL
   expressions (split / transform / aggregate / zip_with / md5 / conv),
   so the hot path stays inside whole-stage codegen; no Python UDFs.
2. **Engine-portable determinism** — hashes derive from md5 (identical
   hex in every engine, unlike xxhash64/murmur which are Spark-specific),
   and float folds are explicit sequential reductions so DuckDB's
   ``list_reduce`` reproduces the exact same IEEE-754 result.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^31 - 1 (Mersenne prime) — modulus for rolling/polynomial hashes:
# keeps every intermediate within 2^36 so ANSI-mode overflow checks
# never fire and DuckDB BIGINT math agrees bit-for-bit.
HASH_PRIME = 2_147_483_647


def words(text: Column | str) -> Column:
    """Whitespace tokenization (single-space corpus)."""
    return F.split(text, " ")


def word_shingles(words_col: Column, n: int = 3) -> Column:
    """n-word shingles: ["a","b","c","d"] -> ["a b c", "b c d"].

    Built from sequence+transform+element_at (1-based).  Documents
    shorter than n words yield an empty array (guarded so the ANSI-mode
    sequence bounds never invert).

    The input array is BOUND ONCE via a single-element ``transform``
    before the per-gram lambda touches it: HOF lambdas re-evaluate
    every expression they close over per element, so the natural form
    (``element_at(words_col, ...)`` inside the lambda, where
    ``words_col`` is typically the unevaluated ``split(text)``) re-ran
    the split n times per gram — O(words x grams) per document.  Fixed
    in r10 after profiling winnowing at sf1: shingling 50k docs cost
    48s of a 90s query; binding cuts the whole shingle family
    (minhash / containment / spans / boilerplate / decontam) to
    per-gram constant work.
    """

    def _shingles_of(wa: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(wa) - n)
        shingle = lambda i: F.concat_ws(
            " ", *[F.element_at(wa, i + j + 1) for j in range(n)]
        )
        return F.when(F.size(wa) >= n, F.transform(idx, shingle)).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(F.transform(F.array(words_col), _shingles_of), 1)


def md5_long(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of md5.

    15 (not 16) hex digits keeps the value inside a signed 64-bit range
    in every engine.  DuckDB twin: ``('0x' || substr(md5(x),1,15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# Affine-permutation coefficients for integer MinHash: small odd
# multipliers/offsets; every (a*h+b) stays far below 2^63 with h < P.
MINHASH_A = (17, 31, 47, 61, 89, 107, 127, 151, 179, 199, 223, 241)
MINHASH_B = (3, 11, 29, 43, 59, 73, 97, 113, 131, 157, 173, 193)


def shingle_hashes(shingles_col: Column) -> Column:
    """Each shingle hashed once: md5 -> 60-bit int mod HASH_PRIME.
    Callers must materialize this as a projected column before feeding
    it to :func:`minhash_values` (HOFs are interpreted; an inline
    expression would recompute the md5s per permutation)."""
    return F.transform(shingles_col, lambda s: md5_long(s) % HASH_PRIME)


def minhash_values(hashed_col: Column, num_hashes: int) -> list[Column]:
    """MinHash signature as ``num_hashes`` integer columns over a
    pre-hashed shingle array (:func:`shingle_hashes`).

    Classic affine-permutation min-hash: permutation *i* is
    ``min((a_i*h + b_i) mod P)`` — integer ops only, so the per-shingle
    cost is one md5 regardless of k.  Scale: per-row array work, zero
    shuffle.

    DuckDB twin of column ``mh_i``::

        list_min(list_transform(<hashed>, h -> (a_i * h + b_i) % P))
    """
    assert num_hashes <= len(MINHASH_A)

    def _perm(i: int):
        a, b = MINHASH_A[i], MINHASH_B[i]
        return lambda h: (h * a + b) % HASH_PRIME

    return [
        F.array_min(F.transform(hashed_col, _perm(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]


def seq_sum(arr: Column) -> Column:
    """Strictly sequential left fold sum over array<double>.

    ``F.aggregate`` folds left-to-right; the DuckDB twin
    ``list_reduce(list_prepend(0.0, arr), (a,b) -> a+b)`` applies the
    same order, so float results are bit-identical.
    """
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    """Dot product over array<float|double> with double accumulation."""
    return seq_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; engine-portable (same fold order both sides)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def rolling_hash(words_col: Column) -> Column:
    """Polynomial (Rabin-Karp style) document fingerprint over word
    hashes, mod ``HASH_PRIME``: h := (h*31 + md5_60(w) % P) % P."""
    hashed = F.transform(words_col, lambda w: md5_long(w) % HASH_PRIME)
    return F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % HASH_PRIME,
    )


# --- DuckDB SQL twins (kept adjacent so drift is visible in review) ----
SQL_MD5_LONG = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"
SQL_DOT = (
    "list_reduce(list_prepend(0.0::DOUBLE, "
    "list_transform(list_zip({a}, {b}), z -> z[1]::DOUBLE * z[2]::DOUBLE)), "
    "(acc, x) -> acc + x)"
)


def sql_cosine(a: str, b: str) -> str:
    """DuckDB cosine twin of :func:`cosine` (same sequential folds)."""
    return (
        f"({SQL_DOT.format(a=a, b=b)} / "
        f"(sqrt({SQL_DOT.format(a=a, b=a)}) * sqrt({SQL_DOT.format(a=b, b=b)})))"
    )


def sql_word_shingles(words_expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`word_shingles` (1-based list indexing;
    ``range`` is empty when the doc has fewer than ``n`` words, matching
    the Spark-side guard)."""
    parts = " || ' ' || ".join(f"({words_expr})[i + {j}]" for j in range(n))
    return f"list_transform(range(1, len({words_expr}) - {n - 2}), i -> {parts})"
