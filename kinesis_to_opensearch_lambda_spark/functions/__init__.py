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

    Built from sequence+transform+element_at (1-based) — pure codegen.
    Documents shorter than n words yield an empty array (guarded so the
    ANSI-mode sequence bounds never invert).
    """
    idx = F.sequence(F.lit(0), F.size(words_col) - n)
    shingle = lambda i: F.concat_ws(
        " ", *[F.element_at(words_col, i + j + 1) for j in range(n)]
    )
    return F.when(F.size(words_col) >= n, F.transform(idx, shingle)).otherwise(
        F.array().cast("array<string>")
    )


def md5_long(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of md5.

    15 (not 16) hex digits keeps the value inside a signed 64-bit range
    in every engine.  DuckDB twin: ``('0x' || substr(md5(x),1,15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_values(shingles_col: Column, num_hashes: int) -> list[Column]:
    """MinHash signature as ``num_hashes`` columns.

    Permutation *i* is simulated by salting: ``min(md5(i || ':' || s))``
    over the shingle set — the lexicographic min of a salted md5 is an
    order-statistic min-hash, and md5 hex compares identically across
    engines.  Scale: per-row array work, embarrassingly parallel,
    O(|shingles| * k) with no shuffle.
    """
    # NB: single-parameter lambda built by a factory — a default-arg
    # closure (lambda s, i=i) would make PySpark bind the array index as
    # a second lambda argument and corrupt the salt.
    def _salted(i: int):
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    return [
        F.array_min(F.transform(shingles_col, _salted(i))).alias(f"mh_{i}")
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
